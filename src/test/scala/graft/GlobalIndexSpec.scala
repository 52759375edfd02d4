package graft

import graft.operators.GlobalIndex
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The zipWithIndex-shaped global row number: equal to the single-task
  * window's answer, without the single task. */
class GlobalIndexSpec extends SparkSpec {

  test("globalRowNumber equals row_number over the same total order") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i * 7919 % 4096, s"k$i"))
      .toDF("v", "k").repartition(16)
    val got = GlobalIndex.globalRowNumber(df, "id", col("v"), col("k"))
      .select("k", "id")
    val want = df.withColumn("id",
      row_number().over(Window.orderBy("v", "k")).cast("long"))
      .select("k", "id")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("globalRowNumber handles empty input and single rows") {
    import spark.implicits._
    val empty = Seq.empty[(Int, String)].toDF("v", "k")
    assert(GlobalIndex.globalRowNumber(empty, "id", col("v")).count() == 0)
    val one = Seq((42, "x")).toDF("v", "k")
    val r = GlobalIndex.globalRowNumber(one, "id", col("v")).collect()
    assert(r.length == 1 && r.head.getAs[Long]("id") == 1L)
  }

  test("b03 surrogate id has no single-task global window in its plan") {
    val df = graft.plans.SilverLayer.b03.fn(spark, sf)
    val globalWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"b03 must not funnel the latest-states table through one task:\n" +
        globalWindows.mkString("\n"))
  }
}
