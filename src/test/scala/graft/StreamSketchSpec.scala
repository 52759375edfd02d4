package graft

import graft.streaming.{GramEvent, SketchRow, StreamSketch}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming HLL sketch must emit EXACTLY the batch prefix-sketch
  * rows (s09) for any phase-aligned micro-batching, its per-event Scala
  * hash must agree with the batch column program, and its estimate must
  * grow monotonically (registers only grow). */
class StreamSketchSpec extends SparkSpec {

  private case class Doc(id: Long, lang: String, text: String)

  private lazy val docRows: Seq[Doc] = Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang"), col("text")).collect()
    .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2)))
    .sortBy(_.id)

  private lazy val events: Seq[GramEvent] = {
    val n = docRows.map(_.id).max + 1
    def phaseOf(id: Long): Int =
      if (id * 4 < n) 1 else if (id * 4 < n * 2) 2
      else if (id * 4 < n * 3) 3 else 4
    docRows.flatMap { d =>
      val toks = d.text.trim.split("\\s+")
      val grams =
        if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
        else Seq.empty
      val ph = phaseOf(d.id)
      grams.flatMap(g =>
        Seq(GramEvent(d.lang, g, ph), GramEvent("ALL", g, ph)))
    }
  }

  private type Key = (Int, String)
  private type Val = (Int, Long, Double)

  private lazy val batchExpected: Map[Key, Val] =
    graft.streaming.StreamQueries.s09.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getInt(2), r.getLong(3), r.getDouble(4))))
      .toMap

  private def runStream(batches: Seq[Seq[GramEvent]], name: String)
      : Map[Key, Val] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[GramEvent]
    val q = StreamSketch.prefixSketch(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[SketchRow].collect()
      .map(r => (r.phase, r.scope) -> ((r.n_hit_regs, r.s_num, r.est)))
      .toMap
  }

  test("per-event hash mirrors the batch column hash bit-for-bit") {
    val sample = events.map(_.gram).distinct.take(50)
    import spark.implicits._
    val colHashes = sample.toDF("gram")
      .select(col("gram"), graft.operators.CorpusOps.h52(col("gram")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sample.foreach { g =>
      assert(StreamSketch.hash52(g) == colHashes(g), s"hash diverged on '$g'")
    }
  }

  test("one batch per phase unifies bitwise with the s09 batch twin") {
    val byPhase = events.groupBy(_.phase).toSeq.sortBy(_._1).map(_._2)
    assert(byPhase.size == 4, "fixture should populate all 4 phases")
    assert(runStream(byPhase, "sk_aligned") == batchExpected)
  }

  test("coarser phase-aligned splits leave the rows invariant") {
    val byPhase = events.groupBy(_.phase)
    val twoByTwo = Seq(byPhase(1) ++ byPhase(2), byPhase(3) ++ byPhase(4))
    assert(runStream(twoByTwo, "sk_2x2") == batchExpected)
    assert(runStream(Seq(events), "sk_mega") == batchExpected)
  }

  test("estimates grow monotonically per scope (registers only grow)") {
    val byScope = batchExpected.toSeq.groupBy(_._1._2)
    assert(byScope.contains("ALL"))
    byScope.foreach { case (scope, rows) =>
      val ests = rows.sortBy(_._1._1).map(_._2._3)
      assert(ests.zip(ests.tail).forall { case (a, b) => b >= a },
        s"$scope estimate not monotone: $ests")
    }
  }
}
