package graft.operators

import graft.Q
import graft.classifier.ClassifyJob
import graft.plans.{ChainSim, TraceAssembly}
import org.apache.spark.sql.functions._

/** Driver-visible instantiations of the M3 query layer over the simulated
  * chain: the reference's API contracts (O2 sort-key selection, O3 clamps,
  * O4 four-key action ordering, P8 suppression, J11 hydration) checked
  * against by-construction oracles.
  */
object ApiQueries {

  /** /transactions by account + time window: exercises the O2 branch
    * (account, now, lt, hash) desc + limit clamp. */
  val a01 = Q("a01_tx_by_account",
    """SELECT concat('T', event_id) AS hash, concat('0:', user_id) AS account,
      |  event_id AS lt, event_id AS now
      |FROM events
      |WHERE user_id = 7 AND event_id BETWEEN 100 AND 100000
      |ORDER BY now DESC, lt DESC, hash DESC LIMIT 100""".stripMargin) { (s, dir) =>
    val (txs, _) = ChainSim.simulate(s, dir)
    QueryLayer.transactions(txs, QueryLayer.TxRequest(
        account = Some("0:7"), utimeMin = Some(100L), utimeMax = Some(100000L),
        limit = 100))
      .select("hash", "account", "lt", "now")
  }

  /** /transactions hydrated with nested messages (J11/O5), flattened to an
    * order-stable projection for the compare. */
  val a02 = Q("a02_tx_hydrated",
    """SELECT concat('T', event_id) AS hash,
      |  concat('m', event_id) AS in_msg_hash,
      |  coalesce('m' || cast(lead(event_id) OVER
      |    (PARTITION BY user_id ORDER BY event_id) AS varchar), '') AS out_msg_hashes
      |FROM events WHERE user_id = 3
      |ORDER BY hash""".stripMargin) { (s, dir) =>
    val (txs, msgs) = ChainSim.simulate(s, dir)
    val mine = txs.filter(col("account") === "0:3")
    QueryLayer.hydrate(mine, msgs)
      .select(col("hash"),
        col("in_msg.msg_hash").as("in_msg_hash"),
        coalesce(array_join(transform(col("out_msgs"), x => x("msg_hash")), ","),
          lit("")).as("out_msg_hashes"))
      .orderBy("hash")
  }

  /** /actions with hierarchical type filter (P8) and the O4 sort contract:
    * client understands {call_contract, contract_deploy}. Every non-root
    * action's ancestor chain contains the trace's root call_contract, so
    * suppression reduces each trace to exactly its root action — the
    * reference's "highest understood action" semantics. */
  val a03 = Q("a03_actions_suppressed",
    """WITH bounds AS (SELECT user_id, min(event_id) AS fid,
      |                 max(event_id) AS mx FROM events GROUP BY user_id)
      |SELECT concat('T', fid) AS trace_id, 'call_contract' AS type,
      |  fid AS end_utime
      |FROM bounds
      |ORDER BY mx, trace_id, end_utime LIMIT 100""".stripMargin) { (s, dir) =>
    // trace_end_utime is denormalized into the silver actions table at
    // materialization (ChainSim.classified) — no query-time window here,
    // mirroring the reference's denormalized trace columns (SURVEY §1.4)
    QueryLayer.actions(ChainSim.classified(s, dir),
        Seq("call_contract", "contract_deploy"), 100)
      .select("trace_id", "type", "end_utime")
  }

  val all: Seq[Q] = Seq(a01, a02, a03)
}
