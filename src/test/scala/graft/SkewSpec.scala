package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted sum equals direct aggregation on a skewed key") {
    import spark.implicits._
    // 90% of rows share one key — the shape that melts a single reducer
    val df = ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong)))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedSum(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val fact = ((1 to 5000).map(_ => "hot") ++ Seq("a", "b"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("c", "C")).toDF("k", "tag")
    val direct = fact.join(dim, "k").groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k").groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
