package graft

import org.apache.spark.sql.functions._

/** Pins the fixture cache's staleness contract (r14 advisor): a corpus
  * dir regenerated IN PLACE with a different doc_id set must invalidate
  * the cached payload table without a manual version bump, and a cache
  * hit against an unchanged corpus must serve the stored bytes. */
class MediaFixturesSpec extends SparkSpec {

  private def writeDocs(dir: java.io.File, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("doc_id").withColumn("text", concat(lit("doc "), col("doc_id")))
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").toString)
  }

  test("cache hit serves stored payloads; in-place corpus regeneration " +
      "with a different doc_id set triggers a rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mf-spec").toFile
    writeDocs(dir, 1L to 10L)
    var builds = 0
    def gen(): org.apache.spark.sql.DataFrame = {
      builds += 1
      spark.read.parquet(new java.io.File(dir, "documents.parquet").toString)
        .select(col("doc_id").as("media_id"))
        .withColumn("payload", col("media_id") * lit(builds))
    }
    // unique generator name per test run: the cache is cross-session
    val name = s"spec-${System.nanoTime()}"
    val first = graft.plans.MediaFixtures
      .table(spark, dir.toString, name, 1)(gen())
      .as[(Long, Long)].collect().sorted
    assert(builds == 1 && first.map(_._1).toSeq == (1L to 10L))
    // second call: same corpus → served from cache, generator NOT run
    val second = graft.plans.MediaFixtures
      .table(spark, dir.toString, name, 1)(gen())
      .as[(Long, Long)].collect().sorted
    assert(builds == 1, "cache hit must not re-run the generator")
    assert(second.toSeq == first.toSeq)
    // regenerate the corpus in place with a shifted id set: the stale
    // payloads must NOT be served (payload column proves a fresh build)
    writeDocs(dir, 11L to 25L)
    val third = graft.plans.MediaFixtures
      .table(spark, dir.toString, name, 1)(gen())
      .as[(Long, Long)].collect().sorted
    assert(builds == 2, "changed doc_id set must invalidate the cache")
    assert(third.map(_._1).toSeq == (11L to 25L))
    assert(third.forall { case (id, p) => p == id * 2 })
  }
}
