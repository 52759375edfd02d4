package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global dense row numbering without a single-task global window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY funnels the
  * whole table through one task — correct at test scale, dead at 3·10⁸
  * rows (the reference's latest_account_states design size, §1.4). The
  * scale shape is zipWithIndex: range-repartition on the sort key (the
  * one shuffle a global order needs anyway), sort within partitions,
  * then assign ids as partition-offset + local index, where the offsets
  * come from an O(numPartitions) count job.
  *
  * This MUST run as `RDD.zipWithIndex` on a single RDD instance, not as
  * two DataFrame jobs over the same plan: a SQL range exchange re-samples
  * its boundaries per job with an RDD-id-derived seed, so two separate
  * jobs can place rows differently and the offsets silently drift (found
  * empirically — ~1% of ids shifted at 5k rows). zipWithIndex's internal
  * count job runs over the same ShuffleDependency, so the shuffle files
  * are written once and placement is identical. The only driver-side
  * materialization is the per-partition count array, bounded by the
  * partition count, never by data size.
  */
object GlobalIndex {

  /** Append a 1-based dense global row number `idCol` ordered by
    * `sortCols` (must be a total order for deterministic numbering). */
  def globalRowNumber(df: DataFrame, idCol: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = ranged.schema.add(idCol, LongType, nullable = false)
    val rows = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rows, schema)
  }
}
