package graft.plans

import graft.{Q, Tables => T}
import graft.classifier.ClassifyJob
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic blockchain-shaped projection of the `events` table, used
  * to drive the full ingest pipeline (trace assembly → classification)
  * through the driver's gate: each user's event stream becomes a message
  * chain (first event = external message, later events = internal
  * messages from the previous transaction), so every pipeline output is
  * independently derivable in SQL — the oracle states the expected result
  * by construction, the engine must reproduce it through the real
  * assembler + classifier code path.
  *
  * Event-type mapping: purchase/signup → comment-less transfer (opcode
  * null); click/view/error → contract calls (opcodes 1/2/3); signup
  * additionally deploys (orig_status uninit → active).
  */
object ChainSim {

  // silver-table store: the simulated chain and its assembly are reused
  // by every pipeline query in a session — each is materialized ONCE as
  // a Parquet silver table and re-read (SilverStore), exactly as a
  // cluster deployment materializes its silver layer at ingest.

  /** Shared base projection: events + per-user chain lag + account —
    * one materialization reused by both the standard and the protocol
    * simulation (they differ only in opcode mapping). */
  private def chainedEvents(spark: SparkSession, dir: String): DataFrame =
    SilverStore.table(spark, dir, "chained_events") {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      T.events(spark, dir)
        .withColumn("prev_id", lag(col("event_id"), 1).over(w))
        .withColumn("acct", concat(lit("0:"), col("user_id").cast("string")))
    }

  def simulate(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    lazy val built = simulateUncached(spark, dir)
    (SilverStore.table(spark, dir, "sim_txs")(built._1),
      SilverStore.table(spark, dir, "sim_msgs")(
        // decode-once-at-write: persist the resolver address keys next
        // to each body so every classify over this silver skips the
        // dims-branch decode pass (ClassifyJob.bodyKeysCol)
        built._2.withColumn("body_keys",
          graft.classifier.ClassifyJob.bodyKeysCol(
            col("opcode"), col("body")))))
  }

  /** Trace roots over the simulated chain topology, computed ONCE per
    * (session, dir). Every simulated variant (standard a/b pipeline, b06,
    * b09) shares the same tx hashes and parent edges — only message
    * opcodes differ — so the forest fixpoint over that topology is a
    * single silver-layer materialization reused by all of them, exactly
    * as production materializes trace_id at ingest rather than re-running
    * connected components per downstream job. */
  // profiling accessors (Profile15) — not part of the query surface
  def chainRootsPublic(spark: SparkSession, dir: String): DataFrame =
    chainRoots(spark, dir)
  def b15SimPublic(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    protocolSim(spark, dir, b15Opcodes, b15Bodies)
  def b15WalletDimPublic(spark: SparkSession, dir: String): DataFrame =
    b15WalletDim(spark, dir)

  private def chainRoots(spark: SparkSession, dir: String): DataFrame = {
    // the fixpoint's final checkpoint is dead once the silver table is
    // written — release it (only set when the build lambda actually ran)
    var fixpoint: DataFrame = null
    val out = SilverStore.table(spark, dir, "chain_roots") {
      val ev = chainedEvents(spark, dir)
      val nodes = ev.select(
        concat(lit("T"), col("event_id").cast("string")).as("id"),
        when(col("prev_id").isNotNull,
          concat(lit("T"), col("prev_id").cast("string"))).as("parent"))
      fixpoint = GraphOps.forestRoots(nodes)
      fixpoint.select(col("id").as("hash"), col("root").as("trace_id"))
    }
    if (fixpoint != null)
      org.apache.spark.sql.GraftFreshStats.unpersistCheckpoints(fixpoint)
    out
  }

  /** Memoized classifier output over the assembled chain — shared by every
    * action-level query (a03/b02); the silver `actions` table. Carries the
    * §1.4 denormalized trace_end_utime (joined once from trace meta at
    * materialization, the way production denormalizes trace columns into
    * `actions` at write time) so pagination sorts never need a query-time
    * window over the whole actions set. */
  def classified(spark: SparkSession, dir: String): DataFrame =
    SilverStore.table(spark, dir, "silver_actions") {
      val (_, msgs) = simulate(spark, dir)
      val (traces, _, txsWithTrace) = assembled(spark, dir)
      val meta = traces.select(col("trace_id"),
        col("end_utime").cast("long").as("trace_end_utime"))
      // prune to the columns its consumers (a03/b02/b07/b08, Silver)
      // read BEFORE writing — the unread wide detail structs would
      // otherwise bloat the silver files
      // chainShape: simulate's frames guarantee the ChainInputRow
      // constants (end_status 'active', aborted false, no codes/fees,
      // bounce/bounced false, no init_state/msg_seq/created_at) —
      // the narrow 15-field group encoder applies (r17, guide §4)
      ClassifyJob.runProjected(spark, txsWithTrace, msgs,
          graft.classifier.ClassifyDims(),
          Seq("trace_id", "action_id", "type", "start_lt", "end_lt",
            "start_utime", "end_utime", "source", "destination", "success",
            "ancestor_type", "ton_transfer_data", "accounts",
            "classification_state"),
          chainShape = true)
        .join(meta, Seq("trace_id"), "left") // traces is a fact table — shuffle join, never broadcast
    }

  /** Traces silver with the post-classify classification_state written
    * back (unclassified → ok/failed/broken, event_classifier.py:334-343)
    * — the states ride the actions silver (one value replicated per
    * action row; distinct per trace recovers the writeback frame), so
    * no second classify sweep runs. */
  def tracesClassified(spark: SparkSession, dir: String): DataFrame =
    SilverStore.table(spark, dir, "silver_traces_classified") {
      val (traces, _, _) = assembled(spark, dir)
      TraceAssembly.withClassificationState(traces,
        classified(spark, dir))
    }

  /** Trace assembly over the simulated chain, silver-materialized. The
    * traces summary derives from the PERSISTED txsWithTrace table (plus
    * the edges plan), so the assembly joins execute once, not once per
    * materialized output. */
  def assembled(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    lazy val built = {
      val (txs, msgs) = simulate(spark, dir)
      TraceAssembly.assemble(txs, msgs, Some(chainRoots(spark, dir)))
    }
    val txw = SilverStore.table(spark, dir, "asm_txw")(built._3)
    val traces = SilverStore.table(spark, dir, "asm_traces")(
      TraceAssembly.traceSummaries(txw, built._2))
    (traces, built._2, txw)
  }

  /** Real TEP text-comment body (op 0x00000000 + snake UTF-8) built with
    * the engine's own BOC writer — attached to transfer in-messages so
    * the classifier's F5 decode path runs through the driver gate. */
  private val commentBocUdf = udf { (s: String) =>
    graft.functions.Boc.serializeBase64(
      new graft.functions.Boc.Builder()
        .storeUint(BigInt(0), 32)
        .storeBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .build())
  }

  /** events → (transactions, messages) in the blockchain schema subset the
    * assembler/classifier consume. */
  private def simulateUncached(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = chainedEvents(spark, dir)

    val txs = ev.select(
      concat(lit("T"), col("event_id").cast("string")).as("hash"),
      col("acct").as("account"),
      col("event_id").as("lt"),
      col("event_id").cast("int").as("now"),
      expr("CAST(event_id DIV 50 + 1 AS INT)").as("mc_block_seqno"),
      when(col("event_type") === "signup", "uninit").otherwise("active")
        .as("orig_status"),
      lit("active").as("end_status"),
      lit(false).as("aborted"),
      lit(null).cast("int").as("compute_exit_code"),
      lit(null).cast("int").as("action_result_code"),
      lit(0L).as("total_fees"),
      lit("ord").as("descr"))

    val opcode = when(col("event_type") === "click", 1L)
      .when(col("event_type") === "view", 2L)
      .when(col("event_type") === "error", 3L)
      .otherwise(lit(null).cast("long"))

    // transfers (purchase/signup) carry a REAL text-comment BOC body:
    // op 0 + "note <event_id>" — decoded back by the classifier (F5)
    val body = when(col("event_type").isin("purchase", "signup"),
      commentBocUdf(concat(lit("note "), col("event_id").cast("string"))))
      .otherwise(lit(null).cast("string"))

    // one scan + one comment-BOC build per event (r17 — see
    // explodeInOutMsgs); bodyOnOut = false keeps the out copy body-less
    // (only IN-message bodies are ever decoded — Seeder reads the
    // consuming side). The repartition spreads the comment-BOC build and
    // the sim_msgs body_keys decode across the configured parallelism —
    // chained_events is a KB-scale parquet (one scan split), so without
    // it the whole synthesis stage runs on one core (see protocolSim).
    (txs, explodeInOutMsgs(ev
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("event_id"))
      .select(
        col("event_id"), col("prev_id"), col("value"),
        col("acct").as("dest"), col("acct").as("src"),
        opcode.as("op"), body.as("b")), bodyOnOut = false))
  }

  /** Full pipeline stage 1: trace assembly over the simulated chain.
    * The oracle derives every trace column from the chain construction. */
  val b01 = Q("b01_trace_assembly",
    """SELECT concat('T', min(event_id)) AS trace_id, count(*) AS nodes_,
      |  count(*) AS edges_, 0 AS pending_edges_, 'complete' AS state,
      |  min(event_id) AS start_lt, max(event_id) AS end_lt,
      |  concat('m', min(event_id)) AS external_hash
      |FROM events GROUP BY user_id ORDER BY trace_id""".stripMargin) { (s, dir) =>
    val (traces, _, _) = assembled(s, dir)
    traces.select(
        col("trace_id"), col("nodes_"), col("edges_"),
        col("pending_edges_").cast("int").as("pending_edges_"), col("state"),
        col("start_lt"), col("end_lt"), col("external_hash"))
      .orderBy("trace_id")
  }

  /** Full pipeline stage 2: assembly + classification; expected actions
    * are stated by construction in the oracle. */
  val b02 = Q("b02_classify_actions",
    """WITH firsts AS (SELECT user_id, min(event_id) AS fid
      |               FROM events GROUP BY user_id)
      |SELECT concat('T', fid) AS trace_id,
      |  CASE WHEN e.event_id = fid THEN 'call_contract'
      |       WHEN e.event_type IN ('purchase', 'signup') THEN 'ton_transfer'
      |       ELSE 'call_contract' END AS type,
      |  e.event_id AS start_lt, true AS success,
      |  CASE WHEN e.event_id = fid THEN NULL
      |       ELSE concat('0:', e.user_id) END AS source,
      |  concat('0:', e.user_id) AS destination
      |FROM events e JOIN firsts f ON e.user_id = f.user_id
      |UNION ALL
      |SELECT concat('T', fid), 'contract_deploy', e.event_id, true,
      |  NULL, concat('0:', e.user_id)
      |FROM events e JOIN firsts f ON e.user_id = f.user_id
      |WHERE e.event_type = 'signup'
      |ORDER BY start_lt, type""".stripMargin) { (s, dir) =>
    classified(s, dir)
      .select(col("trace_id"), col("type"), col("start_lt"), col("success"),
        col("source"), col("destination"))
      .orderBy("start_lt", "type")
  }

  // ------------------------------------------------- protocol-opcode chain


  /** Same chain topology, but event types map to REAL protocol opcodes so
    * the protocol matcher registry is exercised through the driver gate:
    * click → StonFi swap 0x25938561, view → StonFi payment 0xf93bb43f
    * (a click immediately followed by a view in the user's chain is a
    * swap→payment parent/child edge ⇒ one jetton_swap action),
    * purchase → TONStakers deposit 0x47d54391 (stake_deposit),
    * signup → multisig new-order 0xf718510f (multisig_create_order),
    * error → DNS change-record 0x4eb1f0f9 (change_dns). */
  private def protocolSim(spark: SparkSession, dir: String,
      opcodeOf: Column,
      bodyOf: Column = null): (DataFrame, DataFrame) = {
    val ev0 = chainedEvents(spark, dir).withColumn("pos",
      row_number().over(Window.partitionBy("user_id").orderBy("event_id")))
    // BODIED variants: spread the BOC-synthesis stage explicitly. AQE
    // coalesces the pos-window's shuffle read by BYTES, and a KB-scale
    // sim collapses to ONE partition — which serializes the per-message
    // body UDF (and, for persisted variants, the body_keys decode) onto
    // a single core. The stage's cost is CPU-per-row, not bytes, so pin
    // its width to the configured shuffle parallelism (cpus locally;
    // sized to the cluster in a deployment — an explicit N is exempt
    // from AQE coalescing). Body-less variants skip the exchange.
    val ev =
      if (bodyOf == null) ev0
      else ev0.repartition(
        spark.sessionState.conf.numShufflePartitions, col("event_id"))
    val body = if (bodyOf == null) lit(null).cast("string") else bodyOf
    val txs = ev0.select(
      concat(lit("T"), col("event_id").cast("string")).as("hash"),
      col("acct").as("account"),
      col("event_id").as("lt"),
      col("event_id").cast("int").as("now"),
      expr("CAST(event_id DIV 50 + 1 AS INT)").as("mc_block_seqno"),
      lit("active").as("orig_status"), lit("active").as("end_status"),
      lit(false).as("aborted"),
      lit(null).cast("int").as("compute_exit_code"),
      lit(null).cast("int").as("action_result_code"),
      lit(0L).as("total_fees"), lit("ord").as("descr"))
    // ONE scan + ONE body/opcode evaluation per event (r17, guide §6/§4):
    // the previous in/out unionByName was two scans of chained_events,
    // each paying the pos-window AND the per-message BOC body-synthesis
    // UDF — the body built TWICE per event (measured 1.5-2.0 s of each
    // bodied variant's classify stage at sf0.1 vs 0.33 s body-less).
    // Here body/opcode are computed in their own projection (CollapseProject
    // will not inline a non-cheap expression referenced by both structs)
    // and the in/out copies explode from the same row. Within-group msg
    // order is free — TxTree.build sorts by (lt, account)/seqNo/createdLt.
    (txs, explodeInOutMsgs(ev.select(
      col("event_id"), col("prev_id"), col("value"),
      col("acct").as("dest"), col("acct").as("src"),
      opcodeOf.as("op"), body.as("b"))))
  }

  /** (event_id, prev_id, value, dest, src, op, b) → the message frame:
    * every event's in-copy, plus — when the event has a parent — the
    * out-copy attached to the parent tx, both sharing the ONE computed
    * body/opcode. `src` is the source an event with a parent reports
    * (the in-copy of a root keeps source NULL). Row set identical to
    * the former inMsgs.unionByName(outMsgs) two-scan form.
    *
    * Layout matters (measured): the copy-INVARIANT columns — above all
    * the UDF-synthesized body — stay TOP-LEVEL in the Generate's child,
    * and only the tiny per-copy (tx_hash, direction, source, has_body)
    * struct explodes. Packing body inside the exploded structs defeated
    * column pruning (nested-field pruning does not reach through the
    * CaseWhen-of-arrays generator input), so body-LESS consumers — the
    * dims candidate branch, count probes — paid the full BOC synthesis:
    * the body-less msgs scan measured 1.60 s that way vs 0.33 s with the
    * body as a prunable top-level column. */
  private def explodeInOutMsgs(withCols: DataFrame,
      bodyOnOut: Boolean = true): DataFrame = {
    def copyStruct(dirLit: String, txCol: Column, srcCol: Column,
        hasBody: Boolean): Column =
      struct(txCol.as("tx_hash"), lit(dirLit).as("direction"),
        srcCol.as("source"), lit(hasBody).as("has_body"))
    val inS = copyStruct("in",
      concat(lit("T"), col("event_id").cast("string")),
      when(col("prev_id").isNull, lit(null).cast("string"))
        .otherwise(col("src")),
      hasBody = true)
    val outS = copyStruct("out",
      concat(lit("T"), col("prev_id").cast("string")),
      col("src"),
      hasBody = bodyOnOut)
    withCols
      .select(
        concat(lit("m"), col("event_id").cast("string")).as("msg_hash"),
        col("dest").as("destination"),
        (col("value") * 100).cast("long").as("value"),
        col("op").as("opcode"),
        lit(false).as("bounce"), lit(false).as("bounced"),
        col("event_id").as("created_lt"),
        col("b").as("body0"),
        explode(when(col("prev_id").isNull, array(inS))
          .otherwise(array(inS, outS))).as("m"))
      .select(col("msg_hash"), col("m.tx_hash").as("tx_hash"),
        col("m.direction").as("direction"), col("m.source").as("source"),
        col("destination"), col("value"), col("opcode"),
        col("bounce"), col("bounced"), col("created_lt"),
        when(col("m.has_body"), col("body0")).as("body"))
  }

  /** Columns every protocol-variant query reads. */
  private val protoBaseCols = Seq("trace_id", "type", "start_lt", "end_lt",
    "source", "destination", "success")

  private def protocolClassified(spark: SparkSession, dir: String,
      variant: String, opcodeOf: => Column,
      // null (not a null LITERAL column) = body-less variant — the
      // distinction drives protocolSim's bodied-stage repartition
      bodyOf: => Column = null,
      dims: => graft.classifier.ClassifyDims = graft.classifier.ClassifyDims(),
      keep: Seq[String] = Nil,
      persistMsgs: Boolean = false): DataFrame =
    SilverStore.table(spark, dir, s"proto_$variant") {
      val (txs, msgs0) = protocolSim(spark, dir, opcodeOf, bodyOf)
      val d = dims
      // BODIED dims variants evaluate the messages frame TWICE (the
      // classify branch and the traceDims branch) — including the
      // per-message body synthesis UDF and, in traceDims, the
      // body→resolver-key BOC decode. Persist the variant's messages
      // ONCE with the decoded body_keys column (the ChainSim.simulate
      // sim_msgs pattern): bodies build once, the decode runs once at
      // write, and the dims branch reads a narrow array column instead
      // of re-parsing BOCs (r16; ClassifyJob.traceDims consumes
      // body_keys when present). Opt-in per variant: for body-less
      // variants (b19) and dim-less variants the silver write is pure
      // added IO — measured a small net LOSS at sf0.1 when applied to
      // b19 — so only bodied dims variants (b15) pass persistMsgs.
      val msgs =
        if (!persistMsgs || d.isEmpty) msgs0
        else SilverStore.table(spark, dir, s"proto_${variant}_msgs")(
          msgs0.withColumn("body_keys",
            ClassifyJob.bodyKeysCol(col("opcode"), col("body"))))
      val (_, _, txsWithTrace) =
        TraceAssembly.assemble(txs, msgs0, Some(chainRoots(spark, dir)))
      // txsWithTrace = txs ⋈ roots — both identical across every
      // protocol variant (only the MESSAGE opcodes/bodies differ), so
      // one shared silver table serves all ~11 variant pipelines
      // instead of a write+read per variant
      val txw = SilverStore.table(spark, dir, "proto_txw")(
        txsWithTrace)
      // narrow-output classify: only the columns the variant's queries
      // read materialize through the encoder — the wide 60-field
      // ActionRow encoder was HALF the classify cost (Profile15)
      // chainShape: protocolSim constructs exactly the ChainInputRow
      // constants — the narrow group encoder (r17, guide §4)
      ClassifyJob.runProjected(spark, txw, msgs, d,
        (protoBaseCols ++ keep).distinct, chainShape = true)
    }

  /** b06 opcode mapping (see protocolSim doc). */
  private def b06Opcodes: Column =
    when(col("event_type") === "click",
        lit(graft.classifier.Opcodes.StonfiSwap))
      .when(col("event_type") === "view",
        lit(graft.classifier.Opcodes.StonfiPayment))
      .when(col("event_type") === "purchase",
        lit(graft.classifier.Opcodes.TonstakersDeposit))
      .when(col("event_type") === "signup",
        lit(graft.classifier.Opcodes.MultisigNewOrder))
      .otherwise(lit(graft.classifier.Opcodes.ChangeDnsRecord))

  /** b09 opcode mapping — exercises auxiliary-chain consumption and a
    * required-child pair on different matcher families: click → DeDust
    * swap 0xea06185d (whose auxiliary set consumes the CONTIGUOUS run of
    * following views mapped to DeDust payout 0x474f86cf), purchase →
    * subscription payment-response 0xf06c7567 (subscribe ONLY when the
    * immediately-next event is a signup → payment 0x73756273), error →
    * vesting send-message 0xa7733acd. */
  private def b09Opcodes: Column =
    when(col("event_type") === "click",
        lit(graft.classifier.Opcodes.DedustSwap))
      .when(col("event_type") === "view",
        lit(graft.classifier.Opcodes.DedustPayout))
      .when(col("event_type") === "purchase",
        lit(graft.classifier.Opcodes.SubscriptionPaymentRequestResponse))
      .when(col("event_type") === "signup",
        lit(graft.classifier.Opcodes.SubscriptionPayment))
      .otherwise(lit(graft.classifier.Opcodes.VestingSendMessage))

  /** Protocol matcher sweep through the full pipeline: the oracle states
    * every matched action by construction (swap pairs via lead/lag). */
  val b06 = Q("b06_protocol_actions",
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |    lag(event_type)  OVER w AS prev_type,
      |    lead(event_type) OVER w AS next_type,
      |    lead(event_id)   OVER w AS next_id,
      |    row_number()     OVER w AS rn,
      |    min(event_id)    OVER (PARTITION BY user_id) AS fid
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |)
      |SELECT concat('T', fid) AS trace_id,
      |  CASE WHEN event_type = 'click' AND next_type = 'view' THEN 'jetton_swap'
      |       WHEN event_type = 'purchase' THEN 'stake_deposit'
      |       WHEN event_type = 'signup' THEN 'multisig_create_order'
      |       WHEN event_type = 'error' THEN 'change_dns'
      |       ELSE 'call_contract' END AS type,
      |  event_id AS start_lt,
      |  CASE WHEN event_type = 'click' AND next_type = 'view' THEN next_id
      |       ELSE event_id END AS end_lt,
      |  CASE WHEN rn = 1 THEN NULL
      |       ELSE concat('0:', user_id) END AS source,
      |  concat('0:', user_id) AS destination,
      |  -- a TONStakers deposit WITHOUT the MintJettons transfer leg is
      |  -- failed (reference staking.py:157-160) — the sim never mints
      |  CASE WHEN event_type = 'purchase' THEN false ELSE true END AS success
      |FROM ordered
      |WHERE NOT (event_type = 'view' AND coalesce(prev_type, '') = 'click')
      |ORDER BY start_lt, type""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b06", b06Opcodes)
      .select(col("trace_id"), col("type"), col("start_lt"), col("end_lt"),
        col("source"), col("destination"), col("success"))
      .orderBy("start_lt", "type")
  }

  /** Auxiliary-chain consumption + required-child pairing through the full
    * pipeline on a second opcode mapping (b09Opcodes): a click's swap
    * absorbs the contiguous run of following views (DeDust auxiliary
    * descent), purchase+signup pairs merge into `subscribe`, errors emit
    * vesting_send_message — every expected action stated by construction
    * via segment windows. */
  val b09 = Q("b09_aux_consumption",
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |    lead(event_type) OVER w AS next_type,
      |    lead(event_id)   OVER w AS next_id,
      |    lag(event_type)  OVER w AS prev_type,
      |    row_number()     OVER w AS rn,
      |    min(event_id)    OVER (PARTITION BY user_id) AS fid
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
      |seg AS (
      |  SELECT *, sum(CASE WHEN event_type <> 'view' THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY event_id) AS seg_id
      |  FROM ordered),
      |segext AS (
      |  SELECT *,
      |    first_value(event_type)
      |      OVER (PARTITION BY user_id, seg_id ORDER BY event_id) AS head_type,
      |    max(event_id) OVER (PARTITION BY user_id, seg_id) AS seg_end
      |  FROM seg)
      |SELECT concat('T', fid) AS trace_id,
      |  CASE WHEN event_type = 'click' THEN 'jetton_swap'
      |       WHEN event_type = 'purchase' AND next_type = 'signup'
      |         THEN 'subscribe'
      |       WHEN event_type = 'error' THEN 'vesting_send_message'
      |       ELSE 'call_contract' END AS type,
      |  event_id AS start_lt,
      |  CASE WHEN event_type = 'click' THEN seg_end
      |       WHEN event_type = 'purchase' AND next_type = 'signup'
      |         THEN next_id
      |       ELSE event_id END AS end_lt,
      |  CASE WHEN rn = 1 THEN NULL
      |       ELSE concat('0:', user_id) END AS source,
      |  concat('0:', user_id) AS destination, true AS success
      |FROM segext
      |WHERE NOT (event_type = 'view' AND head_type = 'click')
      |  AND NOT (event_type = 'signup' AND coalesce(prev_type, '') = 'purchase')
      |ORDER BY start_lt, type""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b09", b09Opcodes)
      .select(col("trace_id"), col("type"), col("start_lt"), col("end_lt"),
        col("source"), col("destination"), col("success"))
      .orderBy("start_lt", "type")
  }

  /** b10 opcode mapping — the NFT/auction matcher family: click → NFT
    * transfer 0x5fcc3d14 (consumes an immediately-following view mapped
    * to ownership_assigned 0x05138d91), purchase → auction fill-up
    * 0x370fec51 (auction_bid), signup → opcode-null TON transfer carrying
    * the canonical outbid comment (merged into auction_outbid when its
    * parent chain is an auction_bid — the advisor-flagged second-pass
    * path, blocks/auction.py:133-171), error → teleitem start-auction
    * 0x487a8e81 (nft_put_on_auction). */
  private def b10Opcodes: Column =
    when(col("event_type") === "click",
        lit(graft.classifier.Opcodes.NftTransfer))
      .when(col("event_type") === "view",
        lit(graft.classifier.Opcodes.NftOwnershipAssigned))
      .when(col("event_type") === "purchase",
        lit(graft.classifier.Opcodes.AuctionFillUp))
      .when(col("event_type") === "signup", lit(null).cast("long"))
      .otherwise(lit(graft.classifier.Opcodes.TeleitemStartAuction))

  /** signup transfers carry the canonical getgems outbid comment as a
    * real TEP text cell, so the refund detection exercises the full BOC
    * decode path, not a pre-decoded string. */
  private def b10Bodies: Column =
    when(col("event_type") === "signup",
      lit(graft.functions.Boc.serializeBase64(
        new graft.functions.Boc.Builder()
          .storeUint(BigInt(0), 32)
          .storeBytes("Your bid has been outbid by another user".getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          .build())))
      .otherwise(lit(null).cast("string"))

  /** NFT/auction family through the full pipeline: nft_transfer child
    * consumption (one ownership_assigned merged, later ones kept),
    * auction_bid, the outbid second pass (bid SURVIVES, refund becomes
    * auction_outbid — every signup in a contiguous run after a purchase
    * is consumed round-by-round), teleitem put-on-auction. The oracle
    * states each expected action by construction. */
  val b10 = Q("b10_nft_auction_actions",
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |    lag(event_type)  OVER w AS prev_type,
      |    lead(event_type) OVER w AS next_type,
      |    lead(event_id)   OVER w AS next_id,
      |    min(event_id)    OVER (PARTITION BY user_id) AS fid
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
      |seg AS (
      |  SELECT *, sum(CASE WHEN event_type <> 'signup' THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY event_id) AS seg_id
      |  FROM ordered),
      |segext AS (
      |  SELECT *, first_value(event_type)
      |    OVER (PARTITION BY user_id, seg_id ORDER BY event_id) AS run_head
      |  FROM seg),
      |typed AS (
      |  SELECT concat('T', fid) AS trace_id,
      |    CASE WHEN event_type = 'click' THEN 'nft_transfer'
      |         WHEN event_type = 'view' AND coalesce(prev_type, '') = 'click'
      |           THEN NULL
      |         WHEN event_type = 'view' THEN 'call_contract'
      |         WHEN event_type = 'purchase' THEN 'auction_bid'
      |         WHEN event_type = 'signup' AND event_id = fid
      |           THEN 'call_contract'
      |         WHEN event_type = 'signup' AND run_head = 'purchase'
      |           THEN 'auction_outbid'
      |         WHEN event_type = 'signup' THEN 'ton_transfer'
      |         ELSE 'nft_put_on_auction' END AS type,
      |    event_id AS start_lt,
      |    CASE WHEN event_type = 'click' AND coalesce(next_type, '') = 'view'
      |         THEN next_id ELSE event_id END AS end_lt,
      |    true AS success
      |  FROM segext)
      |SELECT * FROM typed WHERE type IS NOT NULL
      |ORDER BY start_lt, type""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b10", b10Opcodes, b10Bodies)
      .select(col("trace_id"), col("type"), col("start_lt"), col("end_lt"),
        col("success"))
      .orderBy("start_lt", "type")
  }

  /** b11 opcode mapping — the DeDust multi-hop swap detail path: click →
    * DeDust swap 0xea06185d, view → swap notification 0x9c610de3 whose
    * body is a REAL BOC (asset_in/out, amount_in/out per hop, reference
    * messages/swaps.py:81-94) built with the engine's writer and decoded
    * back inside the matcher into jetton_swap_data.peer_swaps. */
  private def b11Opcodes: Column =
    when(col("event_type") === "click",
        lit(graft.classifier.Opcodes.DedustSwap))
      .when(col("event_type") === "view",
        lit(graft.classifier.Opcodes.DedustSwapNotification))
      .otherwise(lit(1L))

  /** swap#9c610de3 asset_in:TON asset_out:jetton(0, user_id)
    * amount_in:event_id amount_out:2*event_id ^[addr_none addr_none 0 0]
    * — every field independently derivable by the oracle. */
  private val dedustNotifyBocUdf = udf { (userId: Long, eventId: Long) =>
    import graft.functions.Boc
    val refCell = new Boc.Builder()
      .storeUint(BigInt(0), 2).storeUint(BigInt(0), 2) // addr_none ×2
      .storeCoins(BigInt(0)).storeCoins(BigInt(0)).build()
    val raw = BigInt(userId).toByteArray.dropWhile(_ == 0)
    val acct = Array.fill[Byte](32 - raw.length)(0) ++ raw
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x9c610de3L), 32)
      .storeUint(BigInt(0), 4) // asset_in: native (TON)
      .storeUint(BigInt(1), 4).storeUint(BigInt(0), 8).storeBytes(acct)
      .storeCoins(BigInt(eventId))
      .storeCoins(BigInt(2 * eventId))
      .storeRef(refCell)
      .build())
  }

  private def b11Bodies: Column =
    when(col("event_type") === "view",
      dedustNotifyBocUdf(col("user_id").cast("long"),
        col("event_id").cast("long")))
      .otherwise(lit(null).cast("string"))

  /** Shared DuckDB CTE: segments = each non-view event plus its contiguous
    * run of following views (the notification hops its swap consumes). */
  private val dedustSegSql =
    """WITH seg AS (
      |  SELECT user_id, event_id, event_type,
      |    min(event_id) OVER (PARTITION BY user_id) AS fid,
      |    sum(CASE WHEN event_type <> 'view' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS seg_id
      |  FROM events),
      |runs AS (
      |  SELECT user_id, seg_id, min(fid) AS fid,
      |    min(event_id) AS head_id, max(event_id) AS seg_end,
      |    arg_min(event_type, event_id) AS head_type,
      |    count(*) FILTER (WHERE event_type = 'view') AS nviews,
      |    min(event_id) FILTER (WHERE event_type = 'view') AS first_view,
      |    max(event_id) FILTER (WHERE event_type = 'view') AS last_view
      |  FROM seg GROUP BY user_id, seg_id)""".stripMargin

  /** Swap-level DeDust detail: dex_incoming_transfer = first hop's `in`,
    * dex_outgoing_transfer = last hop's `out`, peer_swaps only for
    * multi-pool routes (blocks/swaps.py:655-677) — every amount decoded
    * from the notification BOCs by the matcher. */
  val b11 = Q("b11_dedust_swap_amounts",
    dedustSegSql +
    """
      |SELECT concat('T', fid) AS trace_id, head_id AS start_lt,
      |  seg_end AS end_lt, first_view AS in_amount, 2 * last_view AS out_amount,
      |  CASE WHEN nviews > 0 THEN 'TON' END AS asset_in,
      |  CASE WHEN nviews > 0
      |       THEN concat('0:', lpad(hex(user_id), 64, '0')) END AS asset_out,
      |  CASE WHEN nviews > 1 THEN nviews ELSE 0 END AS n_hops
      |FROM runs WHERE head_type = 'click'
      |ORDER BY start_lt""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b11", b11Opcodes, b11Bodies,
      keep = Seq("jetton_swap_data"))
      .filter(col("type") === "jetton_swap")
      .select(col("trace_id"), col("start_lt"), col("end_lt"),
        col("jetton_swap_data.dex_incoming_transfer.amount").cast("long")
          .as("in_amount"),
        col("jetton_swap_data.dex_outgoing_transfer.amount").cast("long")
          .as("out_amount"),
        col("jetton_swap_data.dex_incoming_transfer.asset").as("asset_in"),
        col("jetton_swap_data.dex_outgoing_transfer.asset").as("asset_out"),
        size(col("jetton_swap_data.peer_swaps")).cast("long").as("n_hops"))
      .orderBy("start_lt")
  }

  /** Hop-level DeDust detail: peer_swaps exploded — one row per pool
    * notification in lt order, amounts/assets decoded from the BOC. */
  val b12 = Q("b12_dedust_peer_swaps",
    dedustSegSql +
    """
      |SELECT concat('T', r.fid) AS trace_id, r.head_id AS swap_lt,
      |  row_number() OVER (PARTITION BY s.user_id, s.seg_id
      |                     ORDER BY s.event_id) AS hop,
      |  'TON' AS asset_in, s.event_id AS amount_in,
      |  concat('0:', lpad(hex(s.user_id), 64, '0')) AS asset_out,
      |  2 * s.event_id AS amount_out
      |FROM seg s JOIN runs r
      |  ON s.user_id = r.user_id AND s.seg_id = r.seg_id
      |WHERE r.head_type = 'click' AND r.nviews > 1 AND s.event_type = 'view'
      |ORDER BY swap_lt, hop""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b11", b11Opcodes, b11Bodies,
      keep = Seq("jetton_swap_data"))
      .filter(col("type") === "jetton_swap")
      .select(col("trace_id"), col("start_lt").as("swap_lt"),
        posexplode(col("jetton_swap_data.peer_swaps")))
      .select(col("trace_id"), col("swap_lt"),
        (col("pos") + 1).cast("long").as("hop"),
        col("col.asset_in").as("asset_in"),
        col("col.amount_in").cast("long").as("amount_in"),
        col("col.asset_out").as("asset_out"),
        col("col.amount_out").cast("long").as("amount_out"))
      .orderBy("swap_lt", "hop")
  }

  // -------------------------------------------------- detail structs (b13+)

  /** b13 opcode mapping — the multisig/DNS/vesting DETAIL path: click →
    * approve 0xa762230f (contiguous views are its accepted children),
    * purchase → execute 0x75097f5d, signup → change-DNS 0x4eb1f0f9,
    * error → vesting add-whitelist 0x7258a69b. Every struct field is
    * decoded from a REAL BOC body built by the engine's writer and
    * independently restated by the oracle. */
  private def b13Opcodes: Column =
    when(col("event_type") === "click",
        lit(graft.classifier.Opcodes.MultisigApprove))
      .when(col("event_type") === "view",
        lit(graft.classifier.Opcodes.MultisigApproveAccepted))
      .when(col("event_type") === "purchase",
        lit(graft.classifier.Opcodes.MultisigExecute))
      .when(col("event_type") === "signup",
        lit(graft.classifier.Opcodes.ChangeDnsRecord))
      .otherwise(lit(graft.classifier.Opcodes.VestingAddWhitelist))

  private def acct64(userId: Long): String = "0:" + f"$userId%064X"

  private val b13BodyUdf = udf { (eventType: String, eventId: Long, userId: Long) =>
    import graft.functions.Boc
    eventType match {
      case "click" => // approve#a762230f query_id signer_index
        Boc.serializeBase64(new Boc.Builder()
          .storeUint(BigInt(0xa762230fL), 32)
          .storeUint(BigInt(eventId), 64)
          .storeUint(BigInt(userId % 250), 8).build())
      case "purchase" => // execute#75097f5d
        val raw = BigInt(userId).toByteArray.dropWhile(_ == 0)
        val hash = Array.fill[Byte](32 - raw.length)(0) ++ raw
        Boc.serializeBase64(new Boc.Builder()
          .storeUint(BigInt(0x75097f5dL), 32)
          .storeUint(BigInt(eventId), 64)
          .storeUint(BigInt(userId), 256)
          .storeUint(BigInt(eventId + 1000), 48)
          .storeUint(BigInt(userId % 250), 8)
          .storeBytes(hash)
          .storeRef(new Boc.Builder().storeUint(BigInt(0xdeadL), 32).build())
          .build())
      case "signup" => // change_dns_record with a DNSSmcAddress value
        Boc.serializeBase64(new Boc.Builder()
          .storeUint(BigInt(0x4eb1f0f9L), 32)
          .storeUint(BigInt(1), 64)
          .storeUint(BigInt(userId), 256)
          .storeRef(new Boc.Builder()
            .storeUint(BigInt(0x9fd3L), 16)
            .storeAddress(Some(acct64(userId)))
            .storeUint(BigInt(userId % 2), 8).build())
          .build())
      case "error" => // vesting add_whitelist, one address
        Boc.serializeBase64(new Boc.Builder()
          .storeUint(BigInt(0x7258a69bL), 32)
          .storeUint(BigInt(eventId), 64)
          .storeAddress(Some(acct64(userId))).build())
      case _ => null // view: bare approve_accepted child
    }
  }

  private def b13Bodies: Column =
    b13BodyUdf(col("event_type"), col("event_id").cast("long"),
      col("user_id").cast("long"))

  /** Detail structs through the full pipeline: every multisig_approve /
    * multisig_execute / change_dns / vesting_add_whitelist field the
    * matcher decodes is restated by the oracle from the event row that
    * generated the body. Views are consumed as accepted children only
    * when their contiguous segment head is a click. */
  val b13 = Q("b13_action_details",
    """WITH seg AS (
      |  SELECT user_id, event_id, event_type,
      |    min(event_id) OVER (PARTITION BY user_id) AS fid,
      |    lead(event_type) OVER
      |      (PARTITION BY user_id ORDER BY event_id) AS next_type,
      |    sum(CASE WHEN event_type <> 'view' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS seg_id
      |  FROM events),
      |ext AS (
      |  SELECT *, first_value(event_type) OVER
      |    (PARTITION BY user_id, seg_id ORDER BY event_id) AS head_type
      |  FROM seg)
      |SELECT concat('T', fid) AS trace_id, event_id AS start_lt,
      |  CASE WHEN event_type='click' THEN 'multisig_approve'
      |       WHEN event_type='purchase' THEN 'multisig_execute'
      |       WHEN event_type='signup' THEN 'change_dns'
      |       WHEN event_type='error' THEN 'vesting_add_whitelist'
      |       ELSE 'call_contract' END AS type,
      |  CASE WHEN event_type='click' THEN user_id % 250 END AS signer_index,
      |  CASE WHEN event_type='click' AND coalesce(next_type,'')='view'
      |       THEN 0 END AS exit_code,
      |  CASE WHEN event_type IN ('purchase', 'error')
      |       THEN cast(event_id AS varchar) END AS query_id,
      |  CASE WHEN event_type='purchase'
      |       THEN cast(user_id AS varchar) END AS order_seqno,
      |  CASE WHEN event_type='purchase' THEN event_id + 1000
      |       END AS expiration_date,
      |  CASE WHEN event_type='purchase' THEN user_id % 250
      |       END AS approvals_num,
      |  CASE WHEN event_type='purchase'
      |       THEN to_base64(unhex(lpad(hex(user_id), 64, '0')))
      |       END AS signers_hash,
      |  CASE WHEN event_type='signup'
      |       THEN lower(lpad(hex(user_id), 64, '0')) END AS dns_key,
      |  CASE WHEN event_type='signup' THEN 'DNSSmcAddress'
      |       END AS value_schema,
      |  CASE WHEN event_type='signup'
      |       THEN concat('0:', lpad(hex(user_id), 64, '0')) END AS dns_value,
      |  CASE WHEN event_type='signup' THEN user_id % 2 END AS dns_flags,
      |  CASE WHEN event_type='error'
      |       THEN concat('0:', lpad(hex(user_id), 64, '0'))
      |       END AS account_added
      |FROM ext
      |WHERE NOT (event_type = 'view' AND head_type = 'click')
      |ORDER BY start_lt, type""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b13", b13Opcodes, b13Bodies,
      keep = Seq("multisig_approve_data", "multisig_execute_data",
        "change_dns_record_data", "vesting_add_whitelist_data"))
      .select(col("trace_id"), col("start_lt"), col("type"),
        col("multisig_approve_data.signer_index").cast("long")
          .as("signer_index"),
        col("multisig_approve_data.exit_code").cast("long").as("exit_code"),
        coalesce(col("multisig_execute_data.query_id"),
          col("vesting_add_whitelist_data.query_id")).as("query_id"),
        col("multisig_execute_data.order_seqno").as("order_seqno"),
        col("multisig_execute_data.expiration_date").cast("long")
          .as("expiration_date"),
        col("multisig_execute_data.approvals_num").cast("long")
          .as("approvals_num"),
        col("multisig_execute_data.signers_hash").as("signers_hash"),
        col("change_dns_record_data.key").as("dns_key"),
        col("change_dns_record_data.value_schema").as("value_schema"),
        col("change_dns_record_data.value").as("dns_value"),
        col("change_dns_record_data.flags").cast("long").as("dns_flags"),
        element_at(col("vesting_add_whitelist_data.accounts_added"), 1)
          .as("account_added"))
      .orderBy("start_lt", "type")
  }

  /** b14 opcode mapping — multisig CREATE-ORDER detail: signup →
    * new_order 0xf718510f whose contiguous error children are init-order
    * 0x9c73fba2 deploys; everything else is inert. */
  private def b14Opcodes: Column =
    when(col("event_type") === "signup",
        lit(graft.classifier.Opcodes.MultisigNewOrder))
      .when(col("event_type") === "error",
        lit(graft.classifier.Opcodes.MultisigInitOrder))
      .otherwise(lit(1L))

  private val b14BodyUdf = udf { (eventType: String, eventId: Long, userId: Long) =>
    import graft.functions.Boc
    eventType match {
      case "signup" => // new_order#f718510f
        Boc.serializeBase64(new Boc.Builder()
          .storeUint(BigInt(0xf718510fL), 32)
          .storeUint(BigInt(eventId), 64)
          .storeUint(BigInt(userId), 256)
          .storeBit(userId % 2 == 0)
          .storeUint(BigInt(userId % 250), 8)
          .storeUint(BigInt(eventId + 1000), 48)
          .storeRef(new Boc.Builder().storeUint(BigInt(0xdeadL), 32).build())
          .build())
      case "error" => // init#9c73fba2
        val b = new Boc.Builder()
          .storeUint(BigInt(0x9c73fba2L), 32)
          .storeUint(BigInt(eventId), 64)
          .storeUint(BigInt(2), 8)
          .storeRef(new Boc.Builder().storeUint(BigInt(0), 1).build())
          .storeUint(BigInt(eventId + 1000), 48)
          .storeRef(new Boc.Builder().storeUint(BigInt(0xdeadL), 32).build())
          .storeBit(userId % 3 == 0)
        if (userId % 3 == 0) b.storeUint(BigInt(0), 8)
        Boc.serializeBase64(b.build())
      case _ => null
    }
  }

  private def b14Bodies: Column =
    b14BodyUdf(col("event_type"), col("event_id").cast("long"),
      col("user_id").cast("long"))

  /** multisig_create_order_data through the pipeline: the init child (a
    * contiguous following error event) contributes is_signed_by_creator
    * and the order contract address; a signup with no init child keeps
    * those fields null — exactly the reference's optional deploy leg. */
  val b14 = Q("b14_multisig_create_order",
    """WITH seg AS (
      |  SELECT user_id, event_id, event_type,
      |    min(event_id) OVER (PARTITION BY user_id) AS fid,
      |    lead(event_type) OVER
      |      (PARTITION BY user_id ORDER BY event_id) AS next_type,
      |    sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS seg_id
      |  FROM events),
      |ext AS (
      |  SELECT *, first_value(event_type) OVER
      |    (PARTITION BY user_id, seg_id ORDER BY event_id) AS head_type
      |  FROM seg)
      |SELECT concat('T', fid) AS trace_id, event_id AS start_lt,
      |  CASE WHEN event_type='signup' THEN 'multisig_create_order'
      |       ELSE 'call_contract' END AS type,
      |  CASE WHEN event_type='signup'
      |       THEN cast(event_id AS varchar) END AS query_id,
      |  CASE WHEN event_type='signup'
      |       THEN cast(user_id AS varchar) END AS order_seqno,
      |  CASE WHEN event_type='signup' THEN user_id % 2 = 0
      |       END AS is_created_by_signer,
      |  CASE WHEN event_type='signup' AND coalesce(next_type,'')='error'
      |       THEN user_id % 3 = 0 END AS is_signed_by_creator,
      |  CASE WHEN event_type='signup' THEN user_id % 250 END AS creator_index,
      |  CASE WHEN event_type='signup' THEN event_id + 1000
      |       END AS expiration_date,
      |  CASE WHEN event_type='signup' AND coalesce(next_type,'')='error'
      |       THEN concat('0:', user_id) END AS order_contract
      |FROM ext
      |WHERE NOT (event_type = 'error' AND head_type = 'signup')
      |ORDER BY start_lt, type""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b14", b14Opcodes, b14Bodies,
      keep = Seq("multisig_create_order_data", "destination_secondary"))
      .select(col("trace_id"), col("start_lt"), col("type"),
        col("multisig_create_order_data.query_id").as("query_id"),
        col("multisig_create_order_data.order_seqno").as("order_seqno"),
        col("multisig_create_order_data.is_created_by_signer")
          .as("is_created_by_signer"),
        col("multisig_create_order_data.is_signed_by_creator")
          .as("is_signed_by_creator"),
        col("multisig_create_order_data.creator_index").cast("long")
          .as("creator_index"),
        col("multisig_create_order_data.expiration_date").cast("long")
          .as("expiration_date"),
        col("destination_secondary").as("order_contract"))
      .orderBy("start_lt", "type")
  }

  /** b15 opcode mapping — StonFi v2 multi-hop swap with ASSET RESOLUTION
    * through the jetton-wallet repository: click → swap 0x6664de2a,
    * view → pay_to 0x657b54f5 whose body names the pool's jetton WALLET;
    * the classifier must surface the MASTER address in peer_swaps. */
  private def b15Opcodes: Column =
    when(col("event_type") === "click",
        lit(graft.classifier.Opcodes.StonfiV2Swap))
      .when(col("event_type") === "view",
        lit(graft.classifier.Opcodes.StonfiV2PayTo))
      .otherwise(lit(1L))

  /** The b15 corpus (txs, msgs) pre-classify, exposed for the
    * decode-share micro-benchmark (graft.DecodeShareBench → SCALING.md):
    * how much of b15's wall time is ONE pass of the full decode surface
    * over its message bodies. */
  private[graft] def b15Corpus(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) =
    protocolSim(spark, dir, b15Opcodes, b15Bodies)

  private def b15Wallet(userId: Long): String = "0:" + f"$userId%064X"
  private def b15Master(userId: Long): String =
    "0:" + f"${userId + 5000000L}%064X"

  private val b15BodyUdf = udf { (eventType: String, eventId: Long, userId: Long) =>
    import graft.functions.Boc
    if (eventType != "view") null
    else {
      val w = b15Wallet(userId)
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0x657b54f5L), 32)
        .storeUint(BigInt(1), 64)
        .storeAddress(Some("0:" + "01" * 32))
        .storeAddress(Some("0:" + "02" * 32))
        .storeAddress(Some("0:" + "03" * 32))
        .storeUint(BigInt(graft.functions.TlbDecoders.StonfiV2SwapOkCode), 32)
        .storeBit(false)
        .storeRef(new Boc.Builder()
          .storeCoins(BigInt(0))
          .storeCoins(BigInt(eventId)).storeAddress(Some(w))
          .storeCoins(BigInt(0)).storeAddress(Some(w))
          .build())
        .build())
    }
  }

  private def b15Bodies: Column =
    b15BodyUdf(col("event_type"), col("event_id").cast("long"),
      col("user_id").cast("long"))

  /** The jetton-wallet dim table for the b15 corpus: every user's pool
    * wallet maps to a distinct master address. A real DataFrame dim —
    * pre-joined per trace inside ClassifyJob (never collected to the
    * driver), exactly the cluster feed shape. Column formulas mirror
    * b15Wallet/b15Master (hex is uppercase in both). */
  private def b15WalletDim(spark: SparkSession, dir: String): DataFrame =
    chainedEvents(spark, dir)
      .select(col("user_id").cast("long").as("user_id")).distinct()
      .select(
        concat(lit("0:"), lpad(hex(col("user_id")), 64, "0")).as("account"),
        concat(lit("0:"), lpad(hex(col("user_id") + 5000000L), 64, "0"))
          .as("master"))

  /** Hop-level StonFi v2 peer swaps with repository-resolved assets: the
    * oracle states the MASTER address (wallet + 5,000,000 by fixture
    * construction) — a pool-wallet fallback would hash-mismatch. Run
    * anchor: the first swap whose immediate child is a pay_to; the whole
    * contiguous click/view run below it is one multi-hop route. */
  val b15 = Q("b15_stonfi_v2_asset_resolution",
    """WITH base AS (
      |  SELECT user_id, event_id, event_type,
      |    min(event_id) OVER (PARTITION BY user_id) AS fid,
      |    sum(CASE WHEN event_type NOT IN ('click','view') THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS seg_id
      |  FROM events),
      |sw AS (
      |  SELECT *, lead(event_type) OVER
      |    (PARTITION BY user_id, seg_id ORDER BY event_id) AS nxt
      |  FROM base WHERE event_type IN ('click','view')),
      |anch AS (
      |  SELECT user_id, seg_id, min(event_id) AS anchor_id
      |  FROM sw WHERE event_type = 'click' AND nxt = 'view'
      |  GROUP BY user_id, seg_id),
      |views AS (
      |  SELECT s.user_id, s.fid, a.anchor_id, s.event_id,
      |    row_number() OVER (PARTITION BY s.user_id, s.seg_id
      |                       ORDER BY s.event_id) AS hop,
      |    lag(s.event_id) OVER (PARTITION BY s.user_id, s.seg_id
      |                          ORDER BY s.event_id) AS prev_v,
      |    count(*) OVER (PARTITION BY s.user_id, s.seg_id) AS nv
      |  FROM sw s JOIN anch a
      |    ON s.user_id = a.user_id AND s.seg_id = a.seg_id
      |  WHERE s.event_type = 'view' AND s.event_id > a.anchor_id)
      |SELECT concat('T', fid) AS trace_id, anchor_id AS swap_lt, hop,
      |  CASE WHEN hop > 1
      |       THEN concat('0:', lpad(hex(user_id + 5000000), 64, '0'))
      |       END AS asset_in,
      |  CASE WHEN hop > 1 THEN prev_v END AS amount_in,
      |  concat('0:', lpad(hex(user_id + 5000000), 64, '0')) AS asset_out,
      |  event_id AS amount_out
      |FROM views WHERE nv >= 2
      |ORDER BY swap_lt, hop""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b15", b15Opcodes, b15Bodies,
      graft.classifier.ClassifyDims(jettonWallets = Some(b15WalletDim(s, dir))),
      keep = Seq("jetton_swap_data"), persistMsgs = true)
      .filter(col("type") === "jetton_swap")
      .select(col("trace_id"), col("start_lt").as("swap_lt"),
        posexplode(col("jetton_swap_data.peer_swaps")))
      .select(col("trace_id"), col("swap_lt"),
        (col("pos") + 1).cast("long").as("hop"),
        col("col.asset_in").as("asset_in"),
        col("col.amount_in").cast("long").as("amount_in"),
        col("col.asset_out").as("asset_out"),
        col("col.amount_out").cast("long").as("amount_out"))
      .orderBy("swap_lt", "hop")
  }

  // ------------------------------------- per-action balance changes (b16)

  /** b16 sim — like protocolSim but with CROSS-ACCOUNT edges (tx account
    * alternates by event-id parity) so value actually moves between
    * accounts: click → StonFi swap, view → payment (2-tx jetton_swap),
    * purchase → TEP-74 jetton transfer with a real body, signup →
    * internal_transfer (2-tx jetton_transfer). */
  private def b16JettonBodyUdf = udf { (eventId: Long, userId: Long) =>
    import graft.functions.Boc
    Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(0x0f8a7ea5L), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(eventId))
      .storeAddress(Some(acct64(userId)))
      .storeAddress(None)
      .storeBit(false)
      .storeCoins(BigInt(0))
      .storeBit(false)
      .build())
  }

  /** b16 silver tables: txw and msgs persist first; the classify pass
    * reads them back, so assembly runs once and the classifier consumes
    * the columnar silver files. */
  private def b16Parts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    lazy val built = b16Build(spark, dir)
    val txw = SilverStore.table(spark, dir, "b16_txw")(built._1)
    val msgs = SilverStore.table(spark, dir, "b16_msgs")(built._2)
    // narrow-output classify: only these 4 columns materialize through
    // the encoder — the full 60-field ActionRow encoder measured 2× on
    // the sweep (Profile15)
    val acts = SilverStore.table(spark, dir, "b16_acts")(
      // chainShape: b16Build mirrors protocolSim's constant columns
      ClassifyJob.runProjected(spark, txw, msgs,
        graft.classifier.ClassifyDims(),
        Seq("trace_id", "start_lt", "type", "tx_hashes"),
        chainShape = true))
    (acts, txw, msgs)
  }

  private def b16Build(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
      val ev = chainedEvents(spark, dir)
      def acctOf(id: Column) = concat(pmod(id, lit(2)).cast("string"),
        lit(":"), col("user_id").cast("string"))
      val opcode =
        when(col("event_type") === "click",
            lit(graft.classifier.Opcodes.StonfiSwap))
          .when(col("event_type") === "view",
            lit(graft.classifier.Opcodes.StonfiPayment))
          .when(col("event_type") === "purchase",
            lit(graft.classifier.Opcodes.JettonTransfer))
          .when(col("event_type") === "signup",
            lit(graft.classifier.Opcodes.JettonInternalTransfer))
          .otherwise(lit(1L))
      val body = when(col("event_type") === "purchase",
        b16JettonBodyUdf(col("event_id").cast("long"),
          col("user_id").cast("long")))
        .otherwise(lit(null).cast("string"))
      val txs = ev.select(
        concat(lit("T"), col("event_id").cast("string")).as("hash"),
        acctOf(col("event_id")).as("account"),
        col("event_id").as("lt"),
        col("event_id").cast("int").as("now"),
        expr("CAST(event_id DIV 50 + 1 AS INT)").as("mc_block_seqno"),
        lit("active").as("orig_status"), lit("active").as("end_status"),
        lit(false).as("aborted"),
        lit(null).cast("int").as("compute_exit_code"),
        lit(null).cast("int").as("action_result_code"),
        lit(0L).as("total_fees"), lit("ord").as("descr"))
      // one scan + one jetton-BOC build per event (r17 — see
      // explodeInOutMsgs); b16's endpoints are parity accounts, so dest/
      // src are the acctOf projections of this/parent event; the
      // repartition spreads the jetton-BOC build (see protocolSim)
      val msgs = explodeInOutMsgs(ev
        .repartition(spark.sessionState.conf.numShufflePartitions,
          col("event_id"))
        .select(
          col("event_id"), col("prev_id"), col("value"),
          acctOf(col("event_id")).as("dest"),
          acctOf(col("prev_id")).as("src"),
          opcode.as("op"), body.as("b")))
      val (_, _, txsWithTrace) =
        TraceAssembly.assemble(txs, msgs, Some(chainRoots(spark, dir)))
      (txsWithTrace, msgs)
    }

  /** Per-action (account, asset, delta) rows. Action tx_hashes carry the
    * INITIATING tx (block_tree_serializer.py:1469-1478), and the balance
    * walk drops the earliest tx only when it is internally triggered
    * (balances.go:322-339). By construction that means: a pair/single
    * action with an internal parent keeps ALL its member txs (the parent
    * absorbs the exclusion); an action whose parent is the external root
    * keeps the root too (root contributes no TON delta, but a root
    * PURCHASE contributes its TEP-74 jetton rows); the trace-root action
    * itself keeps everything (its earliest tx is external). Same-parity
    * pairs collapse to a single zero-delta row. */
  val b16 = Q("b16_action_balance_changes",
    """WITH chained AS (
      |  SELECT user_id, event_id, event_type, value,
      |    min(event_id) OVER (PARTITION BY user_id) AS fid,
      |    lag(event_id) OVER w AS prev_id,
      |    lag(event_type) OVER w AS prev_type,
      |    lead(event_type) OVER w AS next_type,
      |    lead(event_id) OVER w AS next_id
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
      |roles AS (
      |  SELECT *,
      |    CASE WHEN (event_type = 'click' AND next_type = 'view')
      |           OR (event_type = 'purchase' AND next_type = 'signup')
      |         THEN 'head'
      |         WHEN (prev_type = 'click' AND event_type = 'view')
      |           OR (prev_type = 'purchase' AND event_type = 'signup')
      |         THEN 'tail'
      |         ELSE 'single' END AS role
      |  FROM chained),
      |kept AS (
      |  SELECT user_id, fid, event_id AS start_lt, event_id AS t,
      |    prev_id AS t_prev, event_type AS t_type, value AS t_val
      |  FROM roles WHERE role = 'head'
      |  UNION ALL
      |  SELECT user_id, fid, prev_id, event_id, prev_id, event_type, value
      |  FROM roles WHERE role = 'tail'
      |  UNION ALL
      |  SELECT r.user_id, r.fid, r.event_id, p.event_id, p.prev_id,
      |    p.event_type, p.value
      |  FROM roles r JOIN roles p
      |    ON p.user_id = r.user_id AND p.event_id = r.prev_id
      |  WHERE r.role IN ('head', 'single') AND r.prev_id = r.fid
      |  UNION ALL
      |  SELECT user_id, fid, event_id, event_id, prev_id, event_type, value
      |  FROM roles WHERE role = 'single'),
      |rows_ AS (
      |  SELECT fid, start_lt, concat(t % 2, ':', user_id) AS account,
      |    'TON' AS asset, cast(trunc(t_val * 100) AS BIGINT) AS delta
      |  FROM kept WHERE t_prev IS NOT NULL
      |  UNION ALL
      |  SELECT fid, start_lt, concat(t_prev % 2, ':', user_id),
      |    'TON', -cast(trunc(t_val * 100) AS BIGINT)
      |  FROM kept WHERE t_prev IS NOT NULL
      |  UNION ALL
      |  SELECT fid, start_lt, concat('0:', lpad(hex(user_id), 64, '0')),
      |    concat('0:', lpad(hex(user_id + 7000000), 64, '0')), t
      |  FROM kept WHERE t_type = 'purchase'
      |  UNION ALL
      |  SELECT fid, start_lt, concat(t_prev % 2, ':', user_id),
      |    concat('0:', lpad(hex(user_id + 7000000), 64, '0')), -t
      |  FROM kept WHERE t_type = 'purchase' AND t_prev IS NOT NULL)
      |SELECT concat('T', fid) AS trace_id, start_lt, account, asset,
      |  cast(sum(delta) AS BIGINT) AS delta
      |FROM rows_
      |GROUP BY fid, start_lt, account, asset
      |ORDER BY trace_id, start_lt, account, asset""".stripMargin) { (s, dir) =>
    // the balance walk is deterministic per corpus, so its OUTPUT is a
    // silver table too (r15 verdict item 8): the one b1x entry with real
    // per-query work (~2.2 s — the per-action slice explode) becomes
    // ingest-shaped like its siblings, and repeat queries are a
    // columnar read + sort. The group keys are unique, so the final
    // orderBy restores a byte-identical dump after the parquet
    // round-trip.
    val bal = SilverStore.table(s, dir, "b16_balance") {
      val (acts, txs, msgs) = b16Parts(s, dir)
      val wallets = chainedEvents(s, dir)
        .select(col("user_id").cast("long").as("user_id")).distinct()
        .select(explode(array(
          concat(lit("0:"), col("user_id").cast("string")),
          concat(lit("1:"), col("user_id").cast("string")))).as("wallet"),
          concat(lit("0:"), lpad(hex(col("user_id") + 7000000L), 64, "0"))
            .as("master"))
      SilverLayer.actionBalanceChanges(acts, txs, msgs, wallets)
        .select(col("trace_id"), col("start_lt"), col("account"),
          col("asset"), col("delta").cast("long").as("delta"))
    }
    bal.orderBy("trace_id", "start_lt", "account", "asset")
  }

  /** b17 opcode mapping — the cocoon detail family: click → proxy charge
    * 0xbb63ff93, view → unregister proxy 0x6d49eaf2, purchase → client
    * increase-stake 0x6a1f6a60, signup → change-secret-hash 0xa9357034,
    * error → ext proxy payout request 0x7610e6eb; every struct field
    * decodes from a real body and is restated by the oracle. */
  private def b17Opcodes: Column =
    when(col("event_type") === "click",
        lit(graft.classifier.Opcodes.CocoonChargePayload))
      .when(col("event_type") === "view",
        lit(graft.classifier.Opcodes.CocoonUnregisterProxy))
      .when(col("event_type") === "purchase",
        lit(graft.classifier.Opcodes.CocoonClientIncreaseStake))
      .when(col("event_type") === "signup",
        lit(graft.classifier.Opcodes.CocoonClientChangeSecretHash))
      .otherwise(lit(graft.classifier.Opcodes.CocoonExtProxyPayoutRequest))

  private val b17BodyUdf = udf { (eventType: String, eventId: Long, userId: Long) =>
    import graft.functions.Boc
    def b(op: Long) = new Boc.Builder()
      .storeUint(BigInt(op), 32).storeUint(BigInt(eventId), 64)
    eventType match {
      case "click" => Boc.serializeBase64(
        b(0xbb63ff93L).storeUint(BigInt(2 * eventId), 64)
          .storeAddress(Some(acct64(userId))).build())
      case "view" => Boc.serializeBase64(
        b(0x6d49eaf2L).storeUint(BigInt(userId % 100000), 32).build())
      case "purchase" => Boc.serializeBase64(
        b(0x6a1f6a60L).storeCoins(BigInt(3 * eventId))
          .storeAddress(Some(acct64(userId))).build())
      case "signup" => Boc.serializeBase64(
        b(0xa9357034L).storeUint(BigInt(userId), 256)
          .storeAddress(Some(acct64(userId))).build())
      case _ => Boc.serializeBase64(
        b(0x7610e6ebL).storeAddress(Some(acct64(userId))).build())
    }
  }

  private def b17Bodies: Column =
    b17BodyUdf(col("event_type"), col("event_id").cast("long"),
      col("user_id").cast("long"))

  /** Cocoon detail structs through the pipeline: the shared query_id
    * prefix plus each op's specific payload (charge tokens + expected
    * address, unregister seqno, stake coins, secret hash hex). */
  val b17 = Q("b17_cocoon_details",
    """WITH base AS (
      |  SELECT user_id, event_id, event_type,
      |    min(event_id) OVER (PARTITION BY user_id) AS fid
      |  FROM events)
      |SELECT concat('T', fid) AS trace_id, event_id AS start_lt,
      |  CASE event_type
      |    WHEN 'click' THEN 'cocoon_proxy_charge'
      |    WHEN 'view' THEN 'cocoon_unregister_proxy'
      |    WHEN 'purchase' THEN 'cocoon_client_increase_stake'
      |    WHEN 'signup' THEN 'cocoon_client_change_secret_hash'
      |    ELSE 'cocoon_proxy_payout' END AS type,
      |  cast(event_id AS varchar) AS query_id,
      |  CASE WHEN event_type = 'click' THEN 2 * event_id
      |       END AS new_tokens_used,
      |  CASE WHEN event_type = 'click'
      |       THEN concat('0:', lpad(hex(user_id), 64, '0'))
      |       END AS expected_address,
      |  CASE WHEN event_type = 'view' THEN user_id % 100000 END AS seqno,
      |  CASE WHEN event_type = 'purchase' THEN 3 * event_id END AS new_stake,
      |  CASE WHEN event_type = 'signup' THEN lower(hex(user_id))
      |       END AS new_secret_hash
      |FROM base
      |ORDER BY start_lt""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b17", b17Opcodes, b17Bodies,
      keep = Seq("cocoon_proxy_charge_data", "cocoon_unregister_proxy_data",
        "cocoon_client_increase_stake_data",
        "cocoon_client_change_secret_hash_data", "cocoon_proxy_payout_data"))
      .select(col("trace_id"), col("start_lt"), col("type"),
        coalesce(col("cocoon_proxy_charge_data.query_id"),
          col("cocoon_unregister_proxy_data.query_id"),
          col("cocoon_client_increase_stake_data.query_id"),
          col("cocoon_client_change_secret_hash_data.query_id"),
          col("cocoon_proxy_payout_data.query_id")).as("query_id"),
        col("cocoon_proxy_charge_data.new_tokens_used").cast("long")
          .as("new_tokens_used"),
        col("cocoon_proxy_charge_data.expected_address")
          .as("expected_address"),
        col("cocoon_unregister_proxy_data.seqno").cast("long").as("seqno"),
        col("cocoon_client_increase_stake_data.new_stake").cast("long")
          .as("new_stake"),
        col("cocoon_client_change_secret_hash_data.new_secret_hash")
          .as("new_secret_hash"))
      .orderBy("start_lt")
  }

  /** F5 decode through the hash gate: transfer actions must carry the
    * decoded TEP text comment in ton_transfer_data.content — the oracle
    * states the comment by construction (the body was built by the
    * engine's BOC writer, decoded by its BOC reader inside the
    * classifier; first events are externals → call_contract, not here). */
  val b07 = Q("b07_comment_decode",
    """WITH firsts AS (SELECT user_id, min(event_id) AS fid
      |               FROM events GROUP BY user_id)
      |SELECT concat('T', f.fid) AS trace_id, e.event_id AS start_lt,
      |  concat('note ', e.event_id) AS content
      |FROM events e JOIN firsts f ON e.user_id = f.user_id
      |WHERE e.event_type IN ('purchase', 'signup') AND e.event_id <> f.fid
      |ORDER BY start_lt""".stripMargin) { (s, dir) =>
    classified(s, dir)
      .filter(col("type") === "ton_transfer")
      .select(col("trace_id"), col("start_lt"),
        col("ton_transfer_data.content").as("content"))
      .orderBy("start_lt")
  }

  /** b18 opcode mapping — the LayerZero DVN-verify chain laid out by
    * CHAIN POSITION: every complete run of five consecutive events forms
    * exactly one dvn → proxy → uln → uln-connection → verify-callback
    * match (the matcher's findCall order on a linear chain), so the
    * expected actions are floor(len/5) per chain purely by construction
    * and the trailing partial block never classifies. */
  private def b18Slot: Column = (col("pos") - 1) % 5
  private def b18Opcodes: Column =
    when(b18Slot === 0, lit(graft.classifier.Opcodes.LayerZeroDvnVerify))
      .when(b18Slot === 1, lit(graft.classifier.Opcodes.LayerZeroProxyCall))
      .when(b18Slot === 2, lit(graft.classifier.Opcodes.LayerZeroUlnVerify))
      .when(b18Slot === 3,
        lit(graft.classifier.Opcodes.LayerZeroUlnConnectionVerify))
      .otherwise(lit(graft.classifier.Opcodes.LayerZeroUlnVerifyCallback))

  private val b18BodyUdf = udf { (slot: Int, eventId: Long, userId: Long) =>
    if (slot != 4) null
    else {
      import graft.functions.Boc
      // md::VerificationStatus(nonce, status) wrapped in md::MdObj
      // (messages/layerzero.py:925-960)
      val code = (userId % 4) match {
        case 0 => 0x3bbc306bL // succeeded
        case 1 => 0x7fcbb4acL // nonce_out_of_range
        case 2 => 0x29c53fabL // dvn_not_configured
        case _ => 99L
      }
      Boc.serializeBase64(new Boc.Builder()
        .storeUint(BigInt(0x3cb38090L), 32)
        .storeRef(new Boc.Builder().storeRef(new Boc.Builder()
          .storeUint(BigInt("38421788582694199859296615363593851"), 116)
          .storeUint((BigInt(1) << 234) - 1, 234)
          .storeUint(BigInt(eventId), 64)
          .storeUint(BigInt(code), 32)
          .build()).build())
        .build())
    }
  }
  private def b18Bodies: Column =
    b18BodyUdf(b18Slot.cast("int"), col("event_id").cast("long"),
      col("user_id").cast("long"))

  /** LayerZero dvn-verify details through the full pipeline: the
    * callback's nonce/status plus the four chain addresses, one action
    * per complete 5-node block. */
  val b18 = Q("b18_layerzero_dvn",
    """WITH ordered AS (
      |  SELECT user_id, event_id,
      |    row_number() OVER w AS rn,
      |    min(event_id) OVER (PARTITION BY user_id) AS fid
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |), agg AS (
      |  SELECT user_id, fid, (rn - 1) // 5 AS blk, count(*) AS n,
      |    min(event_id) AS start_lt, max(event_id) AS end_lt,
      |    min(rn) AS rn_head
      |  FROM ordered GROUP BY 1, 2, 3
      |)
      |SELECT concat('T', fid) AS trace_id, start_lt, end_lt,
      |  cast(end_lt AS bigint) AS nonce,
      |  CASE user_id % 4 WHEN 0 THEN 'succeeded'
      |    WHEN 1 THEN 'nonce_out_of_range'
      |    WHEN 2 THEN 'dvn_not_configured'
      |    ELSE 'unknown_99' END AS status,
      |  concat('0:', user_id) AS dvn,
      |  concat('0:', user_id) AS proxy,
      |  concat('0:', user_id) AS uln,
      |  concat('0:', user_id) AS uln_connection,
      |  CASE WHEN rn_head = 1 THEN NULL
      |    ELSE concat('0:', user_id) END AS source
      |FROM agg WHERE n = 5
      |ORDER BY start_lt""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b18", b18Opcodes, b18Bodies,
      keep = Seq("layerzero_dvn_verify_data"))
      .filter(col("type") === "layerzero_dvn_verify")
      .select(col("trace_id"), col("start_lt"), col("end_lt"),
        col("layerzero_dvn_verify_data.nonce").cast("long").as("nonce"),
        col("layerzero_dvn_verify_data.status").as("status"),
        col("layerzero_dvn_verify_data.dvn").as("dvn"),
        col("layerzero_dvn_verify_data.proxy").as("proxy"),
        col("layerzero_dvn_verify_data.uln").as("uln"),
        col("layerzero_dvn_verify_data.uln_connection").as("uln_connection"),
        col("source"))
      .orderBy("start_lt")
  }

  /** b19 opcode mapping — NFT transfers resolved through the nft_items
    * dim: every click is a transfer into the user's item account; index
    * and collection come from the dim table (a real DataFrame pre-joined
    * per trace inside ClassifyJob, never collected), so the oracle
    * states them purely by construction. */
  private def b19Opcodes: Column =
    when(col("event_type") === "click",
      lit(graft.classifier.Opcodes.NftTransfer)).otherwise(lit(5L))

  private def b19ItemDim(spark: SparkSession, dir: String): DataFrame =
    chainedEvents(spark, dir)
      .select(col("user_id").cast("long").as("user_id")).distinct()
      .select(
        concat(lit("0:"), col("user_id").cast("string")).as("account"),
        (col("user_id") * 7).cast("string").as("item_index"),
        concat(lit("0:C"), col("user_id").cast("string")).as("collection"))

  val b19 = Q("b19_nft_items_dim",
    """WITH base AS (
      |  SELECT user_id, event_id, event_type,
      |    min(event_id) OVER (PARTITION BY user_id) AS fid
      |  FROM events)
      |SELECT concat('T', fid) AS trace_id, event_id AS start_lt,
      |  concat('0:C', user_id) AS asset,
      |  concat('0:', user_id) AS asset_secondary,
      |  cast(user_id * 7 AS varchar) AS nft_item_index
      |FROM base WHERE event_type = 'click'
      |ORDER BY start_lt""".stripMargin) { (s, dir) =>
    protocolClassified(s, dir, "b19", b19Opcodes,
      dims = graft.classifier.ClassifyDims(
        nftItems = Some(b19ItemDim(s, dir))),
      keep = Seq("asset", "asset_secondary", "nft_transfer_data"))
      .filter(col("type") === "nft_transfer")
      .select(col("trace_id"), col("start_lt"),
        col("asset"), col("asset_secondary"),
        col("nft_transfer_data.nft_item_index").as("nft_item_index"))
      .orderBy("start_lt")
  }

  /** F5 standalone decode surface (GET/POST /api/v3/decode,
    * ton-index-go/main.go:1897-1978): bodies built by the engine's BOC
    * writer for five opcode families are dispatched through
    * Decode.decode and must identify the type and every asserted field —
    * the oracle restates name/query_id/amount/endpoint by the same
    * formula that built the body. */
  val b20 = Q("b20_decode_dispatch",
    """SELECT event_id AS lt,
      |  CASE cast(user_id % 5 AS int)
      |    WHEN 0 THEN 'jetton_transfer' WHEN 1 THEN 'jetton_burn'
      |    WHEN 2 THEN 'nft_transfer' WHEN 3 THEN 'multisig_approve'
      |    ELSE 'text_comment' END AS op_name,
      |  CASE WHEN user_id % 5 <> 4
      |    THEN cast(event_id AS varchar) END AS query_id,
      |  CASE cast(user_id % 5 AS int)
      |    WHEN 0 THEN cast(event_id * 2 AS varchar)
      |    WHEN 1 THEN cast(event_id AS varchar) END AS amount,
      |  CASE WHEN user_id % 5 IN (0, 2) THEN concat('0:',
      |    repeat(substr('0123456789ABCDEF',
      |                  cast(user_id % 16 AS int) + 1, 1), 64))
      |    END AS dest,
      |  CASE WHEN user_id % 5 = 4
      |    THEN concat('note ', event_id) END AS text
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY lt""".stripMargin) { (s, dir) =>
    val bodyUdf = udf { (uid: Long, eid: Long) =>
      import graft.functions.Boc
      val ch = "0123456789ABCDEF"((uid % 16).toInt)
      val addr = s"0:${ch.toString * 64}"
      val b = new Boc.Builder()
      (uid % 5).toInt match {
        case 0 => b.storeUint(BigInt(0x0f8a7ea5L), 32)
          .storeUint(BigInt(eid), 64).storeCoins(BigInt(eid * 2))
          .storeAddress(Some(addr)).storeAddress(None)
          .storeBit(false).storeCoins(BigInt(1)).storeBit(false)
        case 1 => b.storeUint(BigInt(0x595f07bcL), 32)
          .storeUint(BigInt(eid), 64).storeCoins(BigInt(eid))
          .storeAddress(None)
        case 2 => b.storeUint(BigInt(0x5fcc3d14L), 32)
          .storeUint(BigInt(eid), 64).storeAddress(Some(addr))
          .storeAddress(None).storeBit(false).storeCoins(BigInt(0))
          .storeBit(false)
        case 3 => b.storeUint(BigInt(0xa762230fL), 32)
          .storeUint(BigInt(eid), 64).storeUint(BigInt(uid % 10), 8)
        case _ => b.storeUint(BigInt(0), 32)
          .storeBytes(s"note $eid".getBytes("UTF-8"))
      }
      Boc.serializeBase64(b.build())
    }
    val decUdf = udf { (b64: String) =>
      graft.functions.Decode.decode(b64).map(d => (d.name, d.fields))
    }
    T.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").cast("long").as("lt"),
        pmod(col("user_id"), lit(5)).cast("int").as("cls"),
        decUdf(bodyUdf(col("user_id").cast("long"),
          col("event_id").cast("long"))).as("d"))
      .select(col("lt"),
        col("d._1").as("op_name"),
        element_at(col("d._2"), "query_id").as("query_id"),
        element_at(col("d._2"), "amount").as("amount"),
        when(col("cls") === 0, element_at(col("d._2"), "destination"))
          .when(col("cls") === 2, element_at(col("d._2"), "new_owner"))
          .as("dest"),
        element_at(col("d._2"), "text").as("text"))
      .orderBy("lt")
  }

  /** Decode-dispatch breadth (the round-7 extension): five of the
    * NEWLY-wired families — EVAA supply_master, TONCO pay_to, tgBTC
    * mint event, cocoon ext top-up, coffee swap event — round-trip
    * through Decode.decode with every asserted field restated by the
    * oracle from the body-construction formula. */
  val b21 = Q("b21_decode_long_tail",
    """SELECT event_id AS lt,
      |  CASE cast(user_id % 5 AS int)
      |    WHEN 0 THEN 'evaa_supply_master' WHEN 1 THEN 'tonco_pay_to'
      |    WHEN 2 THEN 'tgbtc_mint_event'
      |    WHEN 3 THEN 'cocoon_ext_client_top_up'
      |    ELSE 'coffee_swap_successful_event' END AS op_name,
      |  CASE WHEN user_id % 5 IN (0, 1, 3)
      |    THEN cast(event_id AS varchar) END AS query_id,
      |  CASE cast(user_id % 5 AS int)
      |    WHEN 0 THEN cast(event_id * 3 AS varchar)
      |    WHEN 1 THEN cast(event_id AS varchar)
      |    WHEN 2 THEN cast(event_id AS varchar)
      |    WHEN 3 THEN cast(event_id * 2 AS varchar)
      |    ELSE cast(event_id * 5 AS varchar) END AS amount,
      |  concat('0:', repeat(substr('0123456789ABCDEF',
      |                cast(user_id % 16 AS int) + 1, 1), 64)) AS addr
      |FROM events WHERE event_type = 'signup'
      |ORDER BY lt""".stripMargin) { (s, dir) =>
    val bodyUdf = udf { (uid: Long, eid: Long) =>
      import graft.functions.Boc
      val ch = "0123456789ABCDEF"((uid % 16).toInt)
      val addr = s"0:${ch.toString * 64}"
      val b = new Boc.Builder()
      (uid % 5).toInt match {
        case 0 => b.storeUint(BigInt(1), 32).storeUint(BigInt(eid), 64)
          .storeInt(BigInt(-1), 2).storeUint(BigInt(eid * 3), 64)
          .storeAddress(Some(addr))
        case 1 => b.storeUint(BigInt(0xa1daa96dL), 32)
          .storeUint(BigInt(eid), 64)
          .storeAddress(Some(addr)).storeAddress(None)
          .storeUint(BigInt(200), 32).storeUint(BigInt(7), 64)
          .storeBit(true)
          .storeRef(new Boc.Builder()
            .storeCoins(BigInt(eid)).storeAddress(Some(addr))
            .storeCoins(BigInt(0)).storeAddress(None).build())
        case 2 => b.storeUint(BigInt(0x77a80ef3L), 32)
          .storeCoins(BigInt(eid)).storeAddress(Some(addr))
          .storeUint(BigInt(eid), 256)
        case 3 => b.storeUint(BigInt(0xf172e6c2L), 32)
          .storeUint(BigInt(eid), 64).storeCoins(BigInt(eid * 2))
          .storeAddress(Some(addr))
        case _ =>
          val Array(wc, hex) = addr.split(":")
          b.storeUint(BigInt(0xc0ffee30L), 32).storeUint(BigInt(eid), 64)
            .storeUint(BigInt(1), 2).storeUint(BigInt(wc.toInt), 8)
            .storeUint(BigInt(hex, 16), 256)
            .storeCoins(BigInt(eid)).storeCoins(BigInt(eid * 5))
      }
      Boc.serializeBase64(b.build())
    }
    val decUdf = udf { (b64: String) =>
      graft.functions.Decode.decode(b64).map(d => (d.name, d.fields))
    }
    T.events(s, dir)
      .filter(col("event_type") === "signup")
      .select(col("event_id").cast("long").as("lt"),
        pmod(col("user_id"), lit(5)).cast("int").as("cls"),
        decUdf(bodyUdf(col("user_id").cast("long"),
          col("event_id").cast("long"))).as("d"))
      .select(col("lt"),
        col("d._1").as("op_name"),
        element_at(col("d._2"), "query_id").as("query_id"),
        coalesce(
          element_at(col("d._2"), "supply_amount"),
          element_at(col("d._2"), "amount0"),
          element_at(col("d._2"), "top_up_amount"),
          element_at(col("d._2"), "output_amount"),
          element_at(col("d._2"), "amount")).as("amount"),
        coalesce(
          element_at(col("d._2"), "recipient_address"),
          element_at(col("d._2"), "jetton0_address"),
          element_at(col("d._2"), "recipient"),
          element_at(col("d._2"), "send_excesses_to"),
          element_at(col("d._2"), "input_asset")).as("addr"))
      .orderBy("lt")
  }

  /** Second decode-tranche oracle: ten of the round-9 decoder families
    * (evaa user-protocol legs, TONCO v3 management, coffee internals,
    * cocoon admin ops, getgems sale update) built as real BOCs by
    * construction and pushed through the full Decode dispatch — the
    * driver's DuckDB oracle states every field by the same construction.
    * Extends b21's five families; field lists cite
    * messages/{evaa,liquidity,coffee,cocoon,getgems}.py. */
  val b23 = Q("b23_decode_tranche2",
    """SELECT event_id AS lt,
      |  CASE cast(user_id % 10 AS int)
      |    WHEN 0 THEN 'evaa_liquidate_master'
      |    WHEN 1 THEN 'evaa_withdraw_success'
      |    WHEN 2 THEN 'tonco_pool_v3_set_fee'
      |    WHEN 3 THEN 'tonco_pool_v3_burn'
      |    WHEN 4 THEN 'coffee_withdraw_internal'
      |    WHEN 5 THEN 'coffee_staking_deposit'
      |    WHEN 6 THEN 'cocoon_change_params'
      |    WHEN 7 THEN 'sale_update'
      |    WHEN 8 THEN 'cocoon_worker_proxy_payout_request'
      |    ELSE 'evaa_supply_user' END AS op_name,
      |  CASE WHEN user_id % 10 <> 8
      |    THEN cast(event_id AS varchar) END AS query_id,
      |  CASE cast(user_id % 10 AS int)
      |    WHEN 0 THEN cast(event_id * 2 AS varchar)
      |    WHEN 1 THEN cast(event_id * 3 AS varchar)
      |    WHEN 2 THEN '300'
      |    WHEN 3 THEN cast(event_id AS varchar)
      |    WHEN 4 THEN cast(event_id AS varchar)
      |    WHEN 5 THEN cast(event_id * 4 AS varchar)
      |    WHEN 6 THEN cast(event_id * 6 AS varchar)
      |    WHEN 7 THEN cast(event_id * 5 AS varchar)
      |    WHEN 8 THEN cast(event_id * 2 AS varchar)
      |    ELSE cast(event_id * 7 AS varchar) END AS amount,
      |  CASE cast(user_id % 10 AS int)
      |    WHEN 1 THEN concat('0x', lower(to_hex(user_id)))
      |    WHEN 9 THEN concat('0x', lower(to_hex(user_id)))
      |    WHEN 2 THEN NULL WHEN 6 THEN NULL WHEN 7 THEN NULL
      |    ELSE concat('0:', repeat(substr('0123456789ABCDEF',
      |      cast(user_id % 16 AS int) + 1, 1), 64)) END AS addr
      |FROM events WHERE event_type = 'signup'
      |ORDER BY lt""".stripMargin) { (s, dir) =>
    val bodyUdf = udf { (uid: Long, eid: Long) =>
      import graft.functions.Boc
      val ch = "0123456789ABCDEF"((uid % 16).toInt)
      val addr = s"0:${ch.toString * 64}"
      val b = new Boc.Builder()
      (uid % 10).toInt match {
        case 0 => // liquidate_master#3 (messages/evaa.py:257-283)
          b.storeUint(BigInt(3), 32).storeUint(BigInt(eid), 64)
            .storeAddress(Some(addr)).storeAddress(Some(addr))
            .storeUint(BigInt(uid), 256).storeUint(BigInt(1), 64)
            .storeInt(BigInt(-1), 2).storeUint(BigInt(eid * 2), 64)
        case 1 => // withdraw_success#211a (evaa.py:192-209)
          b.storeUint(BigInt(0x211a), 32).storeUint(BigInt(eid), 64)
            .storeUint(BigInt(uid), 256).storeInt(BigInt(eid * 3), 64)
        case 2 => // POOLV3_SET_FEE (liquidity.py)
          b.storeUint(BigInt(0x6bdcbeb8L), 32).storeUint(BigInt(eid), 64)
            .storeUint(BigInt(100), 16).storeUint(BigInt(200), 16)
            .storeUint(BigInt(300), 16)
        case 3 => // POOLV3_BURN (liquidity.py)
          b.storeUint(BigInt(0xd73ac09dL), 32).storeUint(BigInt(eid), 64)
            .storeAddress(Some(addr)).storeUint(BigInt(uid), 64)
            .storeUint(BigInt(eid), 128)
            .storeInt(BigInt(-100), 24).storeInt(BigInt(200), 24)
            .storeUint(BigInt(eid), 128)
            .storeRef(new Boc.Builder().storeUint(BigInt(0), 256)
              .storeUint(BigInt(0), 256).build())
            .storeRef(new Boc.Builder().storeUint(BigInt(0), 256)
              .storeUint(BigInt(0), 256).build())
        case 4 => // withdraw_internal#c0ffee2d (coffee.py)
          val Array(wc, hex) = addr.split(":")
          b.storeUint(BigInt(0xc0ffee2dL), 32).storeUint(BigInt(eid), 64)
            .storeUint(BigInt(1), 2).storeUint(BigInt(wc.toInt), 8)
            .storeUint(BigInt(hex, 16), 256)
            .storeCoins(BigInt(eid)).storeAddress(Some(addr))
        case 5 => // staking_deposit#f9471134 (coffee.py)
          b.storeUint(BigInt(0xf9471134L), 32).storeUint(BigInt(eid), 64)
            .storeAddress(Some(addr)).storeCoins(BigInt(eid * 4))
            .storeAddress(Some(addr)).storeUint(BigInt(7), 32)
        case 6 => // change_params#022fa189 (cocoon.py)
          b.storeUint(BigInt(0x022fa189L), 32).storeUint(BigInt(eid), 64)
            .storeCoins(BigInt(eid)).storeCoins(BigInt(2))
            .storeUint(BigInt(3), 32).storeUint(BigInt(4), 32)
            .storeCoins(BigInt(5)).storeCoins(BigInt(eid * 6))
        case 7 => // sale_update#6c6c2080 (getgems.py)
          b.storeUint(BigInt(0x6c6c2080L), 32).storeUint(BigInt(eid), 64)
            .storeCoins(BigInt(eid * 5)).storeCoins(BigInt(1))
            .storeCoins(BigInt(2))
        case 8 => // worker_proxy_payout_request#08e7d036 (cocoon.py)
          b.storeUint(BigInt(0x08e7d036L), 32)
            .storeCoins(BigInt(eid)).storeCoins(BigInt(eid * 2))
            .storeAddress(Some(addr))
        case _ => // supply_user#11 (evaa.py:52-73)
          b.storeUint(BigInt(0x11), 32).storeUint(BigInt(eid), 64)
            .storeUint(BigInt(uid), 256).storeUint(BigInt(eid * 7), 64)
      }
      Boc.serializeBase64(b.build())
    }
    val decUdf = udf { (b64: String) =>
      graft.functions.Decode.decode(b64).map(d => (d.name, d.fields))
    }
    T.events(s, dir)
      .filter(col("event_type") === "signup")
      .select(col("event_id").cast("long").as("lt"),
        decUdf(bodyUdf(col("user_id").cast("long"),
          col("event_id").cast("long"))).as("d"))
      .select(col("lt"),
        col("d._1").as("op_name"),
        element_at(col("d._2"), "query_id").as("query_id"),
        coalesce(
          element_at(col("d._2"), "liquidate_incoming_amount"),
          element_at(col("d._2"), "principal_amount"),
          element_at(col("d._2"), "lp_fee_current"),
          element_at(col("d._2"), "liquidity_to_burn"),
          element_at(col("d._2"), "jetton_amount"),
          element_at(col("d._2"), "min_client_stake"),
          element_at(col("d._2"), "new_full_price"),
          element_at(col("d._2"), "proxy_part"),
          element_at(col("d._2"), "supply_amount_current"),
          element_at(col("d._2"), "amount")).as("amount"),
        coalesce(
          element_at(col("d._2"), "borrower_address"),
          element_at(col("d._2"), "recipient"),
          element_at(col("d._2"), "asset"),
          element_at(col("d._2"), "sender"),
          element_at(col("d._2"), "send_excesses_to"),
          element_at(col("d._2"), "asset_id")).as("addr"))
      .orderBy("lt")
  }

  /** Post-classify traces writeback: classification_state moves off its
    * assembly-time 'unclassified' once the classify sweep has answered
    * (event_classifier.py:334-343; states enum database.py:203). The sim
    * chain classifies cleanly, so the oracle states 'ok' for every trace
    * by construction — the query validates the writeback PLUMBING
    * end-to-end (states ride the actions silver, distinct per trace,
    * left-joined over the traces frame); the broken/failed arms are
    * pinned by ClassifierSpec (synthetic owner-mismatch) where the
    * oracle can't reach. */
  val b22 = Q("b22_classification_state",
    """SELECT concat('T', min(event_id)) AS trace_id,
      |  count(*) AS nodes_, 'ok' AS classification_state
      |FROM events GROUP BY user_id ORDER BY trace_id""".stripMargin) {
    (s, dir) =>
      tracesClassified(s, dir)
        .select(col("trace_id"), col("nodes_"), col("classification_state"))
        .orderBy("trace_id")
  }

  val all: Seq[Q] = Seq(b01, b02, b06, b07, b09, b10, b11, b12, b13, b14, b15,
    b16, b17, b18, b19, b20, b21, b22, b23)
}
