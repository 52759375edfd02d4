package graft

import graft.streaming.{CurationVerdict, DocRow, StreamCuration}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming curation composite (scrub → token gate → first-seen
  * dedup) must equal the batch composite no matter how the (doc_id-
  * ordered) input splits into micro-batches, and a gated-out fragment
  * must never claim a canonical. */
class StreamCurationSpec extends SparkSpec {

  private val MinTokens = 40

  private lazy val rows: Seq[DocRow] = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text")).collect()
    .map(r => DocRow(r.getLong(0), r.getString(1)))
    .sortBy(_.doc_id)

  private lazy val batchExpected: Map[Long, (Int, Boolean, Boolean, Boolean)] =
    graft.streaming.StreamQueries.s08.fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap

  private def runStream(batches: Seq[Seq[DocRow]], name: String)
      : Map[Long, (Int, Boolean, Boolean, Boolean)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[DocRow]
    val q = StreamCuration
      .verdicts(input.toDS(), graft.operators.Curation.Blocklist, MinTokens)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[CurationVerdict].collect()
      .map(v => v.doc_id -> ((v.n_tokens, v.passed_gate, v.is_dup, v.kept)))
      .toMap
  }

  test("one mega-batch equals the batch composite") {
    val got = runStream(Seq(rows), "cur_one")
    assert(got == batchExpected)
    assert(batchExpected.values.exists(!_._2), "fixture should gate docs out")
    assert(batchExpected.values.exists(v => v._2 && v._4),
      "fixture should keep gated docs")
    // gated DUPLICATES don't occur in the sf0.001 spec corpus (its
    // planted dup texts sit under the gate); the constructed edge test
    // below pins the dup path, and the sf0.01 oracle gate covers it.
  }

  test("micro-batch splits leave the verdicts invariant") {
    for (n <- Seq(4, 19)) {
      val size = math.max(1, rows.length / n)
      assert(runStream(rows.grouped(size).toSeq, s"cur_split_$n")
        == batchExpected, s"split $n diverged")
    }
  }

  test("a gated-out fragment never claims the canonical; scrubbed-equal " +
      "texts dedup across the redaction") {
    val terms = "customer"
    val docs = Seq(
      DocRow(1L, "short text"),                           // gated out
      DocRow(2L, Seq.fill(MinTokens)("w").mkString(" ")), // canonical
      DocRow(3L, Seq.fill(MinTokens)("w").mkString(" ")), // dup of 2
      // same as 2 after scrubbing 'customer' -> [REDACTED]? No: build a
      // pair equal only post-redaction:
      DocRow(4L, (Seq.fill(MinTokens - 1)("w") :+ terms).mkString(" ")),
      DocRow(5L, (Seq.fill(MinTokens - 1)("w") :+ "[REDACTED]").mkString(" ")))
    val got = runStream(docs.map(Seq(_)), "cur_edge")
    assert(got(1L) == ((2, false, false, false)), "gated doc: plain verdict")
    assert(got(2L)._4 && !got(2L)._3, "first gated occurrence kept")
    assert(got(3L)._3 && !got(3L)._4, "second occurrence is a dup")
    // 4 scrubs to the same text as 5's literal: first-seen (4) keeps
    assert(got(4L)._4, "post-redaction canonical keeps")
    assert(got(5L)._3, "literal [REDACTED] twin is a dup of the scrubbed 4")
  }
}
