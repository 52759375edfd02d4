package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._

class CosineExprSpec extends SparkSpec {

  test("native expression agrees with the compositional column form") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    def asD(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))
    val compositional = pairs.withColumn("s",
      aggregate(zip_with(asD(col("ea")), asD(col("eb")), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate(asD(col("ea")), lit(0.0), (acc, x) => acc + x * x)) *
          sqrt(aggregate(asD(col("eb")), lit(0.0), (acc, x) => acc + x * x))))
    val native = pairs.withColumn("s",
      CosineSimilarity.cosine_sim(asD(col("ea")), asD(col("eb"))))
    val c = compositional.select("ia", "ib", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val n = native.select("ia", "ib", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c.keySet == n.keySet)
    assert(c.forall { case (k, v) => math.abs(n(k) - v) < 1e-12 })
  }

  test("works directly on float arrays and via SQL registration") {
    CosineSimilarity.register(spark)
    Tables.embeddings(spark, sf).limit(10).createOrReplaceTempView("emb_cos")
    val rows = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS s
        |FROM emb_cos a JOIN emb_cos b ON a.vec_id <> b.vec_id""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
    val self = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS s FROM emb_cos").collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-6))
  }

  test("null inputs yield null, zero vectors yield 0") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(cast(NULL as array<double>), array(1.0d)) AS a,
        |  cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS b""".stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.getDouble(1) == 0.0)
  }
}
