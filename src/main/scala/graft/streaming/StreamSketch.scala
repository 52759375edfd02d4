package graft.streaming

import graft.operators.CorpusOps
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One bigram occurrence entering the streaming sketch, stamped with its
  * event-time phase (ingestion epoch). Scope is the sketch key — a
  * language, or the duplicated "ALL" row. */
case class GramEvent(scope: String, gram: String, phase: Int)

/** Running sketch emission: the scope's register summary AFTER all events
  * of `phase` were absorbed. */
case class SketchRow(phase: Int, scope: String, n_hit_regs: Int,
    s_num: Long, est: Double)

/** HLL register state per scope: 256 rho maxima. Registers only grow, so
  * the state is O(1) per key forever — the streaming-native cardinality
  * telemetry a 100 TB ingest wants (exact streaming distinct would be
  * O(distinct) state, the thing the sketch exists to avoid). */
case class SketchState(regs: Array[Int])

/** STREAMING twin of CorpusOps.distinctSketch: per-scope HLL registers
  * carried in mapGroupsWithState, one SketchRow emitted per (scope, phase)
  * the batch touches. The per-event hash/register/rho math is a per-row
  * Scala mirror of the batch column program (same md5-first-13-hex hash,
  * same 8/44 bit split, same exact integer numerators, same fixed-order
  * double estimate), so a phase-aligned replay unifies BITWISE with the
  * batch prefix query (s09's oracle proves it in DuckDB).
  *
  * Emission contract: one row per phase present in the batch, phases
  * processed in ascending order with updates applied cumulatively —
  * so any split of the stream into batches ALONG phase boundaries yields
  * the identical row set (StreamSketchSpec pins split invariance), and a
  * scope absent from a phase emits nothing (its registers simply carry).
  */
object StreamSketch {

  private[graft] def hash52(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  private[graft] def rhoOf(h: Long): (Int, Int) = {
    val reg = (h >>> CorpusOps.WBits).toInt
    val w = h & CorpusOps.WMask
    val rho =
      if (w == 0) CorpusOps.WBits + 1
      else CorpusOps.WBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (reg, rho)
  }

  /** Summarize a register array exactly as the batch program does:
    * exact integer numerator, then the fixed-literal-order estimate. */
  private[graft] def summarize(phase: Int, scope: String,
      regs: Array[Int]): SketchRow = {
    var nHit = 0
    var sHit = 0L
    var i = 0
    while (i < regs.length) {
      if (regs(i) > 0) {
        nHit += 1
        sHit += 1L << (CorpusOps.WBits + 1 - regs(i))
      }
      i += 1
    }
    val sNum = sHit + (256L - nHit) * CorpusOps.Pow2W
    val est = ((CorpusOps.Alpha * 65536.0) * CorpusOps.Pow2W.toDouble) /
      sNum.toDouble
    SketchRow(phase, scope, nHit, sNum, est)
  }

  def prefixSketch(events: Dataset[GramEvent]): Dataset[SketchRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.scope)
      .flatMapGroupsWithState[SketchState, SketchRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (scope: String, it: Iterator[GramEvent],
            state: GroupState[SketchState]) =>
          val st = state.getOption.getOrElse(SketchState(Array.fill(256)(0)))
          val regs = st.regs.clone()
          val byPhase = it.toSeq.groupBy(_.phase).toSeq.sortBy(_._1)
          val out = byPhase.map { case (phase, evs) =>
            evs.foreach { e =>
              val (reg, rho) = rhoOf(hash52(e.gram))
              if (rho > regs(reg)) regs(reg) = rho
            }
            summarize(phase, scope, regs)
          }
          state.update(SketchState(regs))
          out.iterator
      }
  }
}
