package graft.plans

import graft.{Q, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftFreshStats.{checkpointFresh, unpersistCheckpoints}
import org.apache.spark.sql.functions._

/** Distributed forest root-propagation — the batch form of the reference's
  * incremental trace assembly (connected components over the message
  * graph, ton-index-worker/tondb-scanner/src/TraceAssembler.cpp:285-412).
  *
  * Because every transaction has exactly one in-edge, the message graph is
  * a forest: connected component id == root id, and root propagation by
  * pointer doubling converges in O(log depth) self-joins instead of
  * O(depth). Each iteration halves the pointer distance to the root; with
  * `localCheckpoint` truncating lineage, the plan stays constant-size.
  * At 100 TB this is shuffle-bound on the (id, anc) join — both sides are
  * hash-partitioned on the join key each round, and AQE handles the
  * shrinking frontier.
  */
object GraphOps {

  // event-chain roots: g01/g02 run forestRoots over the same edge set —
  // one Parquet silver table per (session, dir), the silver-table
  // analogue of the materialized trace_id column.
  private def eventChainRoots(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    // the fixpoint's final checkpoint is dead once the silver table is
    // written — release it (only set when the build lambda actually ran)
    var fixpoint: DataFrame = null
    val out = SilverStore.table(s, dir, "event_chain_roots") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val edges = T.events(s, dir)
        .withColumn("parent", lag(col("event_id"), 1).over(w))
        .select(col("event_id").as("id"), col("parent"), col("ts"))
      fixpoint = forestRoots(edges.select("id", "parent"))
      fixpoint.join(edges.select(col("id"), col("ts")), Seq("id"))
    }
    if (fixpoint != null) unpersistCheckpoints(fixpoint)
    out
  }

  /** nodes: (id, parent) with parent null for roots (or absent ids treated
    * as roots). Returns (id, root).
    *
    * Physical shape per round: TWO pointer hops through the round-start
    * jump table (ancestor distance grows 3^k per round vs 2^k — fewer
    * materialization/convergence jobs for the same join count), and the
    * jump table is broadcast when the node set is small enough (an
    * (id, anc) pair table broadcasts comfortably into the millions of
    * rows; past the threshold the joins fall back to the shuffle path —
    * the 100 TB shape, hash-partitioned on the join key under AQE). */
  def forestRoots(nodes: DataFrame, maxIters: Int = 30): DataFrame = {
    // anc = current known ancestor (self for roots); done = anc is a root
    var cur = checkpointFresh(nodes
      .select(col("id"), coalesce(col("parent"), col("id")).as("anc")))
    val useBroadcast = cur.count() <= 3000000L
    // hops per round through the round-start jump table: ancestor distance
    // grows ×(hops+1) per round. Under a broadcast jump table extra hops
    // are nearly free (one more broadcast hash join in the same codegen
    // pipeline), so go wide — depth 10⁴ converges in 4 rounds at ×9.
    // 16 hops was tried in r16 and measured SLOWER (7.6 vs 5.9 s on the
    // depth-99 bench chain: the longer codegen pipeline costs more than
    // the round it saves), so 8 stays. On the shuffle path (the 100 TB
    // shape) each hop is a shuffle join, so stay at 2 hops (×3) —
    // fewer, cheaper rounds dominate there.
    val hops = if (useBroadcast) 8 else 2
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val jt0 = cur.select(col("id").as("anc"), col("anc").as("anc2"))
      val jt = if (useBroadcast) broadcast(jt0) else jt0
      // anc0 tracks the value BEFORE THE FINAL HOP, not the round start:
      // the final hop moves nothing ⟺ every anc was already a root when
      // it ran (jt(x) = x only for roots), which is the fixpoint — so
      // convergence is detected IN the round that finishes the work
      // instead of costing one extra full no-op round (r16; with ×9
      // rounds and depth ~100 that extra round was 1/4 of every
      // forestRoots call — chain/event roots, every dupClusters round).
      var hopped = cur.select(col("id"), col("anc").as("anc0"), col("anc"))
      for (i <- 1 to hops)
        hopped = hopped
          .join(jt, Seq("anc"), "left")
          .select(col("id"),
            (if (i == hops) col("anc") else col("anc0")).as("anc0"),
            coalesce(col("anc2"), col("anc")).as("anc"))
      // checkpointFresh, not plain localCheckpoint: a checkpoint
      // truncates the plan but FORWARDS the computed stats
      // (LogicalRDD.originStats), and Catalyst's size-only stats visitor
      // multiplies join children's sizeInBytes — so the estimate
      // compounds ×9 per 8-hop round, bits(round N) ≈ 9^N × 63, and
      // with an outer loop nesting forestRoots calls (d14 dupClusters)
      // the driver ends up in Toom-Cook multiplications on
      // million-digit numbers for HOURS before any task runs (observed
      // live at sf1). The firewall drops originStats so each round
      // plans from the default size; the jump-table broadcast is an
      // explicit hint and AQE re-plans shuffles from runtime sizes.
      val stepped = checkpointFresh(hopped
        .withColumn("moved", col("anc") =!= col("anc0")))
      val changed = stepped.filter(col("moved")).count()
      // release the superseded round's blocks: stepped is already
      // materialized, so cur's checkpoint can never be read again.
      // Without this every round of every fixpoint in a session stays
      // pinned in the block store — measured as a 3-8× slowdown of
      // LATER unrelated queries from GC pressure alone.
      unpersistCheckpoints(cur)
      cur = stepped.drop("anc0", "moved")
      iter += 1
      converged = changed == 0
    }
    require(converged, s"forestRoots did not converge in $maxIters iterations")
    cur.select(col("id"), col("anc").as("root"))
  }

  /** G1-analog query on the events table: each user's events form a chain
    * (edge to the previous event of the same user); the trace id of an
    * event is its chain root. The oracle states the same semantics
    * directly (first event per user) — the fixpoint must agree. */
  val g01 = Q("g01_forest_trace_ids",
    """SELECT event_id, min(event_id) OVER (PARTITION BY user_id) AS trace_id
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    eventChainRoots(s, dir)
      .select(col("id").as("event_id"), col("root").as("trace_id"))
      .orderBy("event_id")
  }

  /** Trace metadata aggregation over assembled components (A4-A6:
    * nodes_, start/end bounds — TraceAssembler.cpp:329-391). */
  val g02 = Q("g02_trace_meta",
    """SELECT min(event_id) AS trace_id, count(*) AS nodes,
      |  min(event_id) AS start_id, max(event_id) AS end_id,
      |  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
      |FROM events GROUP BY user_id ORDER BY trace_id""".stripMargin) { (s, dir) =>
    eventChainRoots(s, dir)
      .groupBy(col("root").as("trace_id"))
      .agg(count(lit(1)).as("nodes"), min("id").as("start_id"),
        max("id").as("end_id"),
        // µs, not raw ns: DuckDB truncates TIMESTAMP_NS to µs on read
        min(expr("ts div 1000")).as("start_us"),
        max(expr("ts div 1000")).as("end_us"))
      .orderBy("trace_id")
  }

  val all: Seq[Q] = Seq(g01, g02)
}
