package graft.plans

import graft.Q
import graft.functions.Interfaces
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver-layer materializations over the simulated chain: the mutable
  * "latest state" tables, the balance-changes walk, and the address-book
  * decoration — each the Spark-first form of a reference dataflow, each
  * checked against a by-construction oracle.
  */
object SilverLayer {

  /** S4/W2/A9: latest_account_states — keep the max-lt row per account
    * (ON CONFLICT ... WHERE last_trans_lt < EXCLUDED.last_trans_lt,
    * InsertManagerPostgres.cpp:2423-2431) + the §1.4 deterministic
    * surrogate id (rank by (last_trans_lt, account), NOT a task id). */
  val b03 = Q("b03_latest_states",
    """SELECT concat('0:', user_id) AS account,
      |  max(event_id) AS last_trans_lt,
      |  concat('T', max(event_id)) AS last_trans_hash,
      |  row_number() OVER (ORDER BY max(event_id), concat('0:', user_id)) AS id
      |FROM events GROUP BY user_id ORDER BY account""".stripMargin) { (s, dir) =>
    val (txs, _) = ChainSim.simulate(s, dir)
    // the dedup definition is shared with the incremental refresh path
    // (IncrementalSilver.refreshLatestStates) so full recompute and
    // delta merge can never drift
    val latest = IncrementalSilver.latestStates(txs)
    // §1.4 surrogate id: global dense rank by (last_trans_lt, account)
    // WITHOUT a single-task global window — the zipWithIndex shape
    // (range-repartition + local index + broadcast offsets) survives the
    // design-size 3·10⁸-row latest-states table.
    graft.operators.GlobalIndex
      .globalRowNumber(latest, "id", col("last_trans_lt"), col("account"))
      .withColumn("id", col("id").cast("int"))
      .orderBy("account")
  }

  /** G10/A7: balance-changes walk — explode per-message deltas (+value to
    * destination, −value to source), aggregate exactly per account. The
    * reference walks the trace graph in Go (balances.go:147-350); the
    * Spark form is a flat explode + groupBy that scales without per-trace
    * iteration. */
  val b04 = Q("b04_balance_changes",
    """SELECT concat('0:', user_id) AS account,
      |  cast(sum(cast(trunc(value * 100) AS BIGINT)) -
      |       sum(CASE WHEN rn > 1 THEN cast(trunc(value * 100) AS BIGINT)
      |                ELSE 0 END) AS BIGINT) AS balance_delta
      |FROM (SELECT user_id, value,
      |        row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |      FROM events) t
      |GROUP BY user_id ORDER BY account""".stripMargin) { (s, dir) =>
    val (_, msgs) = ChainSim.simulate(s, dir)
    // credits: every in-message credits its destination;
    // debits: every out-message debits its source
    val credits = msgs.filter(col("direction") === "in")
      .select(col("destination").as("account"), col("value").as("delta"))
    val debits = msgs.filter(col("direction") === "out")
      .select(col("source").as("account"), (-col("value")).as("delta"))
    credits.unionByName(debits)
      .groupBy("account")
      .agg(sum("delta").as("balance_delta"))
      .orderBy("account")
  }

  /** G10 full form: per-ACTION balance changes (balances.go:147-350).
    * Node deltas come from each tx's in-message (+value to destination,
    * −value from source; externals carry no value); jetton transfer
    * calls (0x0f8a7ea5) additionally decode the TEP-74 body and move
    * `amount` of the wallet's MASTER between the owner accounts — the
    * wallet→master dim resolves via a shuffle join on the wallet
    * address, the Spark form of the reference's checkJettonWallets
    * round-trip (the dim is ≤10⁹ rows, so never broadcast). Each action merges the
    * deltas of its tx_hashes EXCLUDING the earliest tx when it was
    * triggered by an internal message (balances.go:322-339 — that value
    * belongs to the parent action); contract_deploy actions carry none.
    * Flat explode + window + groupBy: no per-trace iteration, scales by
    * partitioning on the action key. */
  def actionBalanceChanges(actions: DataFrame, txs: DataFrame,
      msgs: DataFrame, jettonWallets: DataFrame): DataFrame = {
    val inMsgs = msgs.filter(col("direction") === "in")
    val ton = inMsgs.filter(col("source").isNotNull)
      .select(col("tx_hash"), explode(array(
        struct(col("destination").as("account"), col("value").as("delta")),
        struct(col("source").as("account"), (-col("value")).as("delta"))))
        .as("d"))
      .select(col("tx_hash"), col("d.account").as("account"),
        lit("TON").as("asset"), col("d.delta").as("delta"))
    val dec = udf { (b64: String) =>
      try {
        val d = graft.functions.TlbDecoders.jettonTransfer(b64)
        Some((d.amount.toLong, d.destination.orNull))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    val jt = inMsgs
      .filter(col("opcode") === 0x0f8a7ea5L && col("body").isNotNull)
      .withColumn("dec", dec(col("body")))
      .filter(col("dec").isNotNull)
      // jettonWallets is a ≤10⁹-row dim (LAYOUT.md) — too big to
      // broadcast at design scale. Shuffle join on the wallet address
      // (uniform hash key); AQE may still broadcast at small SF.
      .join(jettonWallets,
        col("destination") === col("wallet"))
      .select(col("tx_hash"), col("source"), col("master"),
        col("dec._1").as("amount"), col("dec._2").as("receiver"))
    val jtRecv = jt.filter(col("receiver").isNotNull)
      .select(col("tx_hash"), col("receiver").as("account"),
        col("master").as("asset"), col("amount").as("delta"))
    val jtSend = jt.filter(col("source").isNotNull)
      .select(col("tx_hash"), col("source").as("account"),
        col("master").as("asset"), (-col("amount")).as("delta"))
    val deltas = ton.unionByName(jtRecv).unionByName(jtSend)

    val slice = actions.filter(col("type") =!= "contract_deploy")
      .select(col("trace_id"), col("start_lt"),
        explode(col("tx_hashes")).as("tx_hash"))
    val txLts = txs.select(col("hash").as("tx_hash"), col("lt"))
    val internal = inMsgs.select(col("tx_hash"),
      col("source").isNotNull.as("internal"))
    val w = Window.partitionBy("trace_id", "start_lt")
    val kept = slice.join(txLts, "tx_hash")
      .join(internal, Seq("tx_hash"), "left")
      .withColumn("min_lt", min("lt").over(w))
      .filter(!(col("lt") === col("min_lt") &&
        coalesce(col("internal"), lit(false))))
    kept.join(deltas, "tx_hash")
      .groupBy("trace_id", "start_lt", "account", "asset")
      .agg(sum(col("delta")).as("delta"))
  }

  /** J9/F7: address book — latest states joined to contract methods and
    * run through interface detection (broadcast code-hash map + method-id
    * subset fallback; crud.go:247-250, detect/interfaces.go:891-930).
    * Simulated: code_hash = 'code_<user_id % 4>'; hashes 0/1 resolve via
    * the exact map, 2 via the method-subset fallback, 3 stays null. */
  val b05 = Q("b05_address_book",
    """SELECT concat('0:', user_id) AS account,
      |  CASE cast(user_id % 6 AS INT)
      |    WHEN 4 THEN 'rNK47E23QUOW+lNphlPswEpBbuNknY9bILQfF2rYM/A='
      |    WHEN 5 THEN 'Q9RHFtMmqDLO1WprYKAstnYw4E9Xhf6J+HhKEQzzYVE='
      |    ELSE concat('code_', cast(user_id % 6 AS VARCHAR)) END AS code_hash,
      |  CASE cast(user_id % 6 AS INT)
      |    WHEN 0 THEN 'wallet_v4' WHEN 1 THEN 'jetton_master'
      |    WHEN 2 THEN 'nft_item'
      |    WHEN 4 THEN 'airdrop_interlocker_v1'
      |    WHEN 5 THEN 'x1000_wallet_v1'
      |    ELSE NULL END AS detected_interface
      |FROM (SELECT DISTINCT user_id FROM events) u
      |ORDER BY account""".stripMargin) { (s, dir) =>
    // hash classes 4/5 carry REAL public code hashes resolved through the
    // transcribed reference catalog (detect/interfaces.go) — airdrop
    // interlocker v1 and x1000 wallet v1
    val realHashA = "rNK47E23QUOW+lNphlPswEpBbuNknY9bILQfF2rYM/A="
    val realHashB = "Q9RHFtMmqDLO1WprYKAstnYw4E9Xhf6J+HhKEQzzYVE="
    val accounts = graft.Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .select(concat(lit("0:"), col("user_id").cast("string")).as("account"),
        when(pmod(col("user_id"), lit(6)) === 4, lit(realHashA))
          .when(pmod(col("user_id"), lit(6)) === 5, lit(realHashB))
          .otherwise(concat(lit("code_"),
            pmod(col("user_id"), lit(6)).cast("string")))
          .as("code_hash"),
        // extracted get-method ids (parse_contract_methods analogue):
        // hash class 2 exposes the nft_item method set
        when(pmod(col("user_id"), lit(6)) === 2,
          array(lit(102351L), lit(999L)))
          .otherwise(array(lit(999L))).as("method_ids"))
    val codeHashTable =
      Map("code_0" -> "wallet_v4", "code_1" -> "jetton_master") ++
        Interfaces.publicCodeHashTable
    accounts
      .withColumn("detected_interface",
        Interfaces.detectColumn(s, codeHashTable,
          col("code_hash"), col("method_ids")))
      .select("account", "code_hash", "detected_interface")
      .orderBy("account")
  }

  /** §1.4 denormalized (account × action) pagination fact through the
    * gate: every classified action explodes to its distinct non-null
    * endpoint accounts carrying the trace-level sort columns
    * (action_accounts, migrate.cpp:589-599). The oracle restates the
    * fact by construction: one row per event action (+ one per signup
    * deploy), account = the user, trace_end = the chain's last event.
    * Deploy rows duplicate their seed row in every selected column, so
    * ordering between them is value-stable for the hash compare. */
  val b08 = Q("b08_action_accounts",
    """WITH bounds AS (SELECT user_id, min(event_id) AS fid,
      |                 max(event_id) AS mx FROM events GROUP BY user_id),
      |acts AS (
      |  SELECT f.fid, e.user_id, e.event_id, f.mx
      |  FROM events e JOIN bounds f ON e.user_id = f.user_id
      |  UNION ALL
      |  SELECT f.fid, e.user_id, e.event_id, f.mx
      |  FROM events e JOIN bounds f ON e.user_id = f.user_id
      |  WHERE e.event_type = 'signup')
      |SELECT concat('T', fid) AS trace_id, concat('0:', user_id) AS account,
      |  event_id AS action_end_lt, mx AS trace_end_lt
      |FROM acts ORDER BY action_end_lt, account""".stripMargin) { (s, dir) =>
    graft.classifier.ClassifyJob.actionAccounts(s, ChainSim.classified(s, dir))
      .select("trace_id", "account", "action_end_lt", "trace_end_lt")
      .orderBy("action_end_lt", "account")
  }

  val all: Seq[Q] = Seq(b03, b04, b05, b08)
}
