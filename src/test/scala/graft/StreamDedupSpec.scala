package graft

import graft.operators.Dedup
import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.{BandRow, CandPair, DedupMark, HashedDoc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental dedup: the stateful-stream operators must equal
  * their batch programs regardless of how the input is split into
  * micro-batches — THE invariant that makes an online dedup index
  * trustworthy (a document's dedup verdict cannot depend on ingest
  * batching). */
class StreamDedupSpec extends SparkSpec {

  /** documents ∪ a copied slice (same text, shifted ids) so the corpus
    * is guaranteed to contain exact duplicates. */
  private lazy val hashedDocs: Seq[HashedDoc] = {
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val dups = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        md5(col("text").cast("binary")).as("h"))
    base.union(dups).collect()
      .map(r => HashedDoc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)
  }

  private def runExact(batches: Seq[Seq[HashedDoc]]): Seq[DedupMark] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[HashedDoc]
    val name = s"exact_${batches.size}_${hashedDocs.size}"
    val q = StreamDedup.markDuplicates(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => DedupMark(r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
  }

  test("exact dedup stream equals the batch min-per-hash program, any batching") {
    val docs = hashedDocs
    val byHash = docs.groupBy(_.h)
    val expect = docs.map { d =>
      val canon = byHash(d.h).map(_.doc_id).min
      DedupMark(d.doc_id, canon, d.doc_id != canon)
    }.toSet
    assert(expect.exists(_.is_dup), "fixture must contain duplicates")

    val oneShot = runExact(Seq(docs))
    assert(oneShot.toSet == expect)
    assert(oneShot.size == docs.size, "exactly one verdict per document")

    val third = docs.size / 3
    val split = runExact(Seq(docs.take(third),
      docs.slice(third, 2 * third), docs.drop(2 * third)))
    assert(split.toSet == expect, "verdicts must not depend on batching")
  }

  test("duplicates arriving in a later batch point at the earlier canonical") {
    val d = Seq(HashedDoc(1L, "AA"), HashedDoc(2L, "BB"))
    val later = Seq(HashedDoc(3L, "AA"), HashedDoc(4L, "CC"))
    val out = runExact(Seq(d, later))
    assert(out.toSet == Set(
      DedupMark(1L, 1L, is_dup = false), DedupMark(2L, 2L, is_dup = false),
      DedupMark(3L, 1L, is_dup = true), DedupMark(4L, 4L, is_dup = false)))
  }

  /** Batch LSH banding over the spec corpus, via the SAME shared helpers
    * the streaming index uses. */
  private lazy val bandRows: Seq[BandRow] = {
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    Dedup.bandKeyRows(Dedup.signaturesOf(base)).collect()
      .map(r => BandRow(r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_.doc_id)
  }

  test("online LSH index emits exactly the batch banding candidate pairs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val expect = bandRows.groupBy(r => (r.band, r.bkey)).values
      .flatMap { bucket =>
        val ids = bucket.map(_.doc_id).distinct.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size)
          yield CandPair(ids(i), ids(j))
      }.toSet

    val input = MemoryStream[BandRow]
    val q = StreamDedup.candidatePairs(input.toDS())
      .writeStream.format("memory").queryName("lsh_cands")
      .outputMode("append").start()
    try {
      val third = bandRows.size / 3
      Seq(bandRows.take(third), bandRows.slice(third, 2 * third),
        bandRows.drop(2 * third)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("lsh_cands").collect()
      .map(r => CandPair(r.getLong(0), r.getLong(1))).toSet
    assert(got == expect,
      s"streaming candidates diverge: +${(got -- expect).size} -${(expect -- got).size}")
    assert(expect.nonEmpty, "fixture should produce at least one candidate")
  }

  test("online LSH hot-bucket cap bounds state and emission, keeps coverage") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // one saturated bucket: 300 docs landing in the same (band, bkey),
    // arriving across three micro-batches
    val n = 300
    val rows = (0 until n).map(i => BandRow(i.toLong, 0, 42L))
    val input = MemoryStream[BandRow]
    val q = StreamDedup.candidatePairs(input.toDS(), bucketCap = 50)
      .writeStream.format("memory").queryName("lsh_capped")
      .outputMode("append").start()
    try {
      Seq(rows.take(100), rows.slice(100, 200), rows.drop(200)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("lsh_capped").collect()
      .map(r => CandPair(r.getLong(0), r.getLong(1))).toSet
    // below saturation: exact all-pairs among the first 50 arrivals;
    // above: one star pair per arrival against the bucket minimum
    val exactPart = for (i <- 0 until 50; j <- (i + 1) until 50)
      yield CandPair(i.toLong, j.toLong)
    val starPart = (50 until n).map(i => CandPair(0L, i.toLong))
    assert(got == (exactPart ++ starPart).toSet,
      s"capped emission diverges (got ${got.size})")
    // every doc surfaces in at least one pair — nothing silently dropped
    val covered = got.flatMap(p => Seq(p.doc_a, p.doc_b))
    assert((0 until n).forall(i => covered.contains(i.toLong)))
  }

  test("streaming candidates feed the batch verify join unchanged") {
    import spark.implicits._
    // verification path: candidates (as the stream would emit them) joined
    // against the shingle silver must reproduce minhashPairsFrom exactly
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .localCheckpoint()
    val expect = Dedup.minhashPairsFrom(base, 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = bandRows.groupBy(r => (r.band, r.bkey)).values
      .flatMap { bucket =>
        val ids = bucket.map(_.doc_id).distinct.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size)
          yield (ids(i), ids(j))
      }.toSeq.distinct.toDF("doc_a", "doc_b")
    val verified = Dedup.verifyPairs(streamed, base, 7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == expect)
  }
}
