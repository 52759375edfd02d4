package graft

import graft.plans.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  test("forestRoots resolves a hand-built multi-level forest") {
    import spark.implicits._
    // forest: 1 -> 2 -> 3 -> 4 (root 1), 10 -> 11 (root 10), 20 isolated
    val nodes = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(2L)), (4L, Some(3L)),
      (10L, None), (11L, Some(10L)), (20L, None))
      .toDF("id", "parent")
    val roots = GraphOps.forestRoots(nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("forestRoots handles a deep chain in O(log n) iterations") {
    import spark.implicits._
    val n = 200
    val nodes = (1 to n).map(i => (i.toLong, if (i == 1) None else Some(i - 1L)))
      .toDF("id", "parent")
    val roots = GraphOps.forestRoots(nodes, maxIters = 12).collect()
    assert(roots.length == n && roots.forall(_.getLong(1) == 1L))
  }

  test("forestRoots converges at round-boundary depths (r16 " +
      "finishing-round detection: the final hop of a round moving " +
      "nothing IS the fixpoint)") {
    import spark.implicits._
    // depths straddling the ×9-per-round boundaries (hops = 8 on the
    // broadcast path): 9/10 around round 1's reach, 81/82 around
    // round 2's — off-by-one in the final-hop test would either stop
    // early (wrong roots) or fail the maxIters require
    for (n <- Seq(2, 9, 10, 81, 82)) {
      val nodes = (1 to n)
        .map(i => (i.toLong, if (i == 1) None else Some(i - 1L)))
        .toDF("id", "parent")
      val roots = GraphOps.forestRoots(nodes, maxIters = 6).collect()
      assert(roots.length == n && roots.forall(_.getLong(1) == 1L),
        s"depth $n")
    }
  }

  test("g01 trace ids agree with per-user first-event semantics") {
    val got = GraphOps.g01.fn(spark, sf)
    val events = Tables.events(spark, sf)
    val expected = events.select(col("event_id"),
      min("event_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id"))
        .as("trace_id"))
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
  }
}
