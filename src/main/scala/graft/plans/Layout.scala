package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical table layout for the 100 TB deployment (SURVEY §4: the
  * reference's covering/composite indexes become partition + bucket +
  * sort-order decisions that Catalyst cannot invent — they are table
  * design).
  *
  * Layout contract for the big fact tables:
  *  - `transactions`, `messages`: partitioned by mc_seqno bucket (time
  *    pruning), bucketed by the join/filter key (`account` resp.
  *    `msg_hash`), sorted within buckets by (account, lt) — the analogue
  *    of the reference's `transactions_3 (account, lt)` composite index.
  *  - bucketed writes make account-scoped queries and tx⋈msg joins
  *    shuffle-free: both sides hash-partition identically at WRITE time.
  */
object Layout {

  /** Write a DataFrame as a bucketed, sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      sortCols: Seq[String], buckets: Int = 32): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two identically-bucketed tables on the bucket key — planner
    * must produce a shuffle-free SortMergeJoin. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
