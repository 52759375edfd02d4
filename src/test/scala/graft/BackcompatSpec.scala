package graft

import graft.operators.QueryLayer
import graft.operators.QueryLayer.TxRequest
import graft.plans.ChainSim

import scala.util.Random

/** §5 backcompat differential runner: the reference validates its API by
  * replaying generated requests against two deployments and diffing JSON
  * (tests/backcompat/test_backcompat.py:13-33). Spark analogue: draw
  * randomized TxRequest parameter vectors (seeded), compile each BOTH
  * ways — through the QueryLayer DataFrame program and through
  * reference-shaped SQL text (string-built WHERE/ORDER BY/LIMIT like
  * crud_transactions.go:15-158) — and require row-identical results,
  * including the O2 sort-key selection and O3 clamps. */
class BackcompatSpec extends SparkSpec {

  private def sqlOf(r: TxRequest): String = {
    val conds = Seq(
      r.account.map(a => s"account = '$a'"),
      if (r.hashes.nonEmpty)
        Some(r.hashes.map(h => s"'$h'").mkString("hash IN (", ", ", ")"))
      else None,
      r.ltMin.map(v => s"lt >= $v"), r.ltMax.map(v => s"lt <= $v"),
      r.utimeMin.map(v => s"now >= $v"), r.utimeMax.map(v => s"now <= $v"),
      r.mcSeqno.map(v => s"mc_block_seqno = $v")).flatten
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    val dir = if (r.descending) "DESC" else "ASC"
    // O2 decision tree, restated independently (crud_transactions.go:70-113)
    val sortCols =
      if (r.hashes.nonEmpty) Seq("hash")
      else if (r.mcSeqno.isDefined) Seq("lt", "hash")
      else if (r.account.isDefined && (r.utimeMin.isDefined || r.utimeMax.isDefined))
        Seq("account", "now", "lt", "hash")
      else if (r.account.isDefined) Seq("account", "lt", "hash")
      else if (r.utimeMin.isDefined || r.utimeMax.isDefined) Seq("now", "lt", "hash")
      else Seq("lt", "hash")
    val order = sortCols.map(c => s"$c $dir").mkString(" ORDER BY ", ", ", "")
    val lim = math.min(math.max(r.limit, 1), QueryLayer.MaxLimit)
    val limit = if (r.limit <= 0) QueryLayer.DefaultLimit else lim
    s"SELECT * FROM sim_txs$where$order LIMIT $limit OFFSET ${math.max(r.offset, 0)}"
  }

  test("randomized TxRequest draws: QueryLayer == reference-shaped SQL") {
    val (txs, _) = ChainSim.simulate(spark, sf)
    txs.createOrReplaceTempView("sim_txs")
    val accounts = txs.select("account").distinct().limit(20)
      .collect().map(_.getString(0))
    val hashes = txs.select("hash").limit(10).collect().map(_.getString(0))
    val rnd = new Random(20260812L)
    def draw(): TxRequest = TxRequest(
      account = if (rnd.nextBoolean()) Some(accounts(rnd.nextInt(accounts.length))) else None,
      hashes = if (rnd.nextInt(5) == 0) hashes.take(1 + rnd.nextInt(3)).toSeq else Nil,
      ltMin = if (rnd.nextBoolean()) Some(rnd.nextInt(800).toLong) else None,
      ltMax = if (rnd.nextBoolean()) Some((200 + rnd.nextInt(800)).toLong) else None,
      utimeMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(500).toLong) else None,
      utimeMax = if (rnd.nextInt(3) == 0) Some((100 + rnd.nextInt(900)).toLong) else None,
      mcSeqno = if (rnd.nextInt(6) == 0) Some(100) else None,
      descending = rnd.nextBoolean(),
      limit = rnd.nextInt(1200) - 50, // exercises the clamps
      offset = rnd.nextInt(30) - 5)
    var nonEmpty = 0
    (1 to 40).foreach { i =>
      val r = draw()
      val viaLayer = QueryLayer.transactions(txs, r)
        .select("hash").collect().map(_.getString(0)).toSeq
      val viaSql = spark.sql(sqlOf(r))
        .select("hash").collect().map(_.getString(0)).toSeq
      assert(viaLayer == viaSql, s"draw $i diverged for $r")
      if (viaLayer.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 10, s"fuzz draws too empty ($nonEmpty/40) — widen ranges")
  }

  test("randomized jettonWallets draws: QueryLayer == reference-shaped SQL") {
    import spark.implicits._
    val rnd = new Random(424242L)
    val wallets = (1 to 400).map { i =>
      (s"w$i", s"0:${rnd.nextInt(12)}", s"j${rnd.nextInt(5)}",
        (rnd.nextInt(5) match { case 0 => 0L; case _ => rnd.nextInt(100000).toLong }),
        i.toLong)
    }.toDF("address", "owner", "jetton", "balance", "id")
    val mintless = Seq(("j1", 50L), ("j3", 7L)).toDF("address", "mintless_amount")
    wallets.createOrReplaceTempView("jw")
    mintless.createOrReplaceTempView("mm")

    def sqlOf(owners: Seq[String], jettons: Seq[String], nz: Boolean,
        sortDesc: Option[Boolean], limit: Int): String = {
      val conds = Seq(
        if (owners.nonEmpty)
          Some(owners.map(o => s"'$o'").mkString("owner IN (", ",", ")")) else None,
        if (jettons.nonEmpty)
          Some(jettons.map(j => s"'$j'").mkString("jetton IN (", ",", ")")) else None,
        if (nz) Some("balance + coalesce(mintless_amount, 0) > 0") else None).flatten
      val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
      val order = sortDesc match {
        case Some(d) =>
          val dir = if (d) "DESC" else "ASC"
          // reference shape: prefix columns plain ASC, direction applies
          // to balance only; id ASC is the shared deterministic tie-break
          val prefix = (if (owners.nonEmpty) Seq("owner") else Nil) ++
            (if (jettons.size == 1) Seq("jetton") else Nil)
          (prefix ++ Seq(s"balance $dir", "id"))
            .mkString(" ORDER BY ", ", ", "")
        case None => " ORDER BY id"
      }
      s"""SELECT address FROM (
         |  SELECT jw.*, mm.mintless_amount FROM jw
         |  LEFT JOIN mm ON jw.jetton = mm.address) t
         |$where$order LIMIT ${math.min(math.max(limit, 1), 1000)}""".stripMargin
    }

    (1 to 25).foreach { i =>
      val owners = if (rnd.nextBoolean()) Seq(s"0:${rnd.nextInt(12)}") else Nil
      val jettons = if (rnd.nextInt(3) == 0) Seq(s"j${rnd.nextInt(5)}") else Nil
      val nz = rnd.nextBoolean()
      val sortDesc = rnd.nextInt(3) match {
        case 0 => Some(true); case 1 => Some(false); case _ => None
      }
      val limit = 1 + rnd.nextInt(300)
      val viaLayer = QueryLayer.jettonWallets(wallets, mintless,
          owners, jettons, nz, sortDesc, limit = limit)
        .select("address").collect().map(_.getString(0)).toSeq
      val viaSql = spark.sql(sqlOf(owners, jettons, nz, sortDesc, limit))
        .collect().map(_.getString(0)).toSeq
      assert(viaLayer == viaSql,
        s"draw $i diverged (owners=$owners jettons=$jettons nz=$nz sort=$sortDesc limit=$limit)")
    }
  }

  test("randomized jetton-transfer draws: QueryLayer == reference-shaped SQL") {
    import spark.implicits._
    import QueryLayer.TokenEventRequest
    val rnd = new Random(1337L)
    val transfers = (1 to 500).map { i =>
      (s"T$i", (i * 7 % 900).toLong, i * 3 % 800, rnd.nextInt(10) == 0,
        s"0:${rnd.nextInt(10)}", s"0:${rnd.nextInt(10)}",
        s"w${rnd.nextInt(8)}", s"j${rnd.nextInt(4)}")
    }.toDF("tx_hash", "tx_lt", "tx_now", "tx_aborted", "source",
      "destination", "jetton_wallet_address", "jetton_master_address")
    transfers.createOrReplaceTempView("jt")

    // reference WHERE/ORDER BY shape (crud_jettons.go:117-199) + the
    // tx_hash tie-break both sides share for determinism
    def sqlOf(r: TokenEventRequest): String = {
      val ownerCond =
        if (r.owner.isEmpty) None
        else {
          val ins = r.owner.map(o => s"'$o'").mkString("(", ",", ")")
          r.direction match {
            case Some("in") => Some(s"destination IN $ins")
            case Some(_) => Some(s"source IN $ins")
            case None => Some(s"(source IN $ins OR destination IN $ins)")
          }
        }
      val conds = Seq(Some("tx_aborted = false"), ownerCond,
        if (r.wallet.nonEmpty)
          Some(r.wallet.map(w => s"'$w'")
            .mkString("jetton_wallet_address IN (", ",", ")")) else None,
        r.master.map(m => s"jetton_master_address = '$m'"),
        r.utimeMin.map(v => s"tx_now >= $v"),
        r.utimeMax.map(v => s"tx_now <= $v"),
        r.ltMin.map(v => s"tx_lt >= $v"),
        r.ltMax.map(v => s"tx_lt <= $v")).flatten
      val orderCol =
        if (r.utimeMin.isDefined || r.utimeMax.isDefined) "tx_now" else "tx_lt"
      val dir = if (r.descending) "DESC" else "ASC"
      val lim = if (r.limit <= 0) QueryLayer.DefaultLimit
        else math.min(r.limit, QueryLayer.MaxLimit)
      s"""SELECT tx_hash FROM jt WHERE ${conds.mkString(" AND ")}
         |ORDER BY $orderCol $dir, tx_hash $dir
         |LIMIT $lim OFFSET ${math.max(r.offset, 0)}""".stripMargin
    }

    var nonEmpty = 0
    (1 to 30).foreach { i =>
      val r = TokenEventRequest(
        owner = if (rnd.nextBoolean()) Seq(s"0:${rnd.nextInt(10)}") else Nil,
        direction = rnd.nextInt(3) match {
          case 0 => Some("in"); case 1 => Some("out"); case _ => None
        },
        wallet = if (rnd.nextInt(4) == 0) Seq(s"w${rnd.nextInt(8)}") else Nil,
        master = if (rnd.nextInt(3) == 0) Some(s"j${rnd.nextInt(4)}") else None,
        utimeMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(400).toLong) else None,
        utimeMax = if (rnd.nextInt(3) == 0) Some((200 + rnd.nextInt(600)).toLong) else None,
        ltMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(500).toLong) else None,
        ltMax = if (rnd.nextInt(3) == 0) Some((100 + rnd.nextInt(800)).toLong) else None,
        descending = rnd.nextBoolean(),
        limit = rnd.nextInt(700) - 50,
        offset = rnd.nextInt(20) - 3)
      val viaLayer = QueryLayer.jettonTransfers(transfers, r)
        .select("tx_hash").collect().map(_.getString(0)).toSeq
      val viaSql = spark.sql(sqlOf(r)).collect().map(_.getString(0)).toSeq
      assert(viaLayer == viaSql, s"draw $i diverged for $r")
      if (viaLayer.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 8, s"fuzz draws too empty ($nonEmpty/30) — widen ranges")
  }

  test("randomized nft-transfer draws: QueryLayer == reference-shaped SQL " +
      "(direction over new/old owner, no aborted filter)") {
    import spark.implicits._
    import QueryLayer.TokenEventRequest
    val rnd = new Random(777L)
    val transfers = (1 to 400).map { i =>
      (s"N$i", (i * 11 % 700).toLong, i * 5 % 600,
        s"0:${rnd.nextInt(8)}", s"0:${rnd.nextInt(8)}",
        s"item${rnd.nextInt(12)}", s"col${rnd.nextInt(4)}")
    }.toDF("tx_hash", "tx_lt", "tx_now", "new_owner", "old_owner",
      "nft_item_address", "nft_collection_address")
    transfers.createOrReplaceTempView("nt")

    // reference WHERE/ORDER BY shape (crud_nft.go:134-215) restated
    def sqlOf(r: TokenEventRequest): String = {
      val ownerCond =
        if (r.owner.isEmpty) None
        else {
          val ins = r.owner.map(o => s"'$o'").mkString("(", ",", ")")
          r.direction match {
            case Some("in") => Some(s"new_owner IN $ins")
            case Some(_) => Some(s"old_owner IN $ins")
            case None => Some(s"(new_owner IN $ins OR old_owner IN $ins)")
          }
        }
      val conds = Seq(ownerCond,
        if (r.wallet.nonEmpty)
          Some(r.wallet.map(w => s"'$w'")
            .mkString("nft_item_address IN (", ",", ")")) else None,
        r.master.map(m => s"nft_collection_address = '$m'"),
        r.utimeMin.map(v => s"tx_now >= $v"),
        r.utimeMax.map(v => s"tx_now <= $v"),
        r.ltMin.map(v => s"tx_lt >= $v"),
        r.ltMax.map(v => s"tx_lt <= $v")).flatten
      val where =
        if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
      val orderCol =
        if (r.utimeMin.isDefined || r.utimeMax.isDefined) "tx_now" else "tx_lt"
      val dir = if (r.descending) "DESC" else "ASC"
      val lim = if (r.limit <= 0) QueryLayer.DefaultLimit
        else math.min(r.limit, QueryLayer.MaxLimit)
      s"""SELECT tx_hash FROM nt$where
         |ORDER BY $orderCol $dir, tx_hash $dir
         |LIMIT $lim OFFSET ${math.max(r.offset, 0)}""".stripMargin
    }

    var nonEmpty = 0
    (1 to 30).foreach { i =>
      val r = TokenEventRequest(
        owner = if (rnd.nextBoolean()) Seq(s"0:${rnd.nextInt(8)}") else Nil,
        direction = rnd.nextInt(3) match {
          case 0 => Some("in"); case 1 => Some("out"); case _ => None
        },
        wallet = if (rnd.nextInt(4) == 0) Seq(s"item${rnd.nextInt(12)}") else Nil,
        master = if (rnd.nextInt(3) == 0) Some(s"col${rnd.nextInt(4)}") else None,
        utimeMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(300).toLong) else None,
        utimeMax = if (rnd.nextInt(3) == 0) Some((150 + rnd.nextInt(450)).toLong) else None,
        ltMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(400).toLong) else None,
        ltMax = if (rnd.nextInt(3) == 0) Some((100 + rnd.nextInt(600)).toLong) else None,
        descending = rnd.nextBoolean(),
        limit = rnd.nextInt(600) - 40,
        offset = rnd.nextInt(15) - 2)
      val viaLayer = QueryLayer.nftTransfers(transfers, r)
        .select("tx_hash").collect().map(_.getString(0)).toSeq
      val viaSql = spark.sql(sqlOf(r)).collect().map(_.getString(0)).toSeq
      assert(viaLayer == viaSql, s"draw $i diverged for $r")
      if (viaLayer.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 8, s"fuzz draws too empty ($nonEmpty/30) — widen ranges")
  }

  // ------------------------------------------------------------ actions

  import QueryLayer.ActionsRequest

  /** Synthetic actions + action_accounts bridge with denormalized copies
    * — ties planted on every sort key so a wrong key order misorders. */
  private def actionsFixture(): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val rnd = new Random(99L)
    val acts = (1 to 300).map { i =>
      val traceLt = (i % 40) * 10L            // ties across traces
      val traceUtime = (i % 25) * 7L          // DIFFERENT tie structure
      (s"tr${i % 60}", s"a$i", s"t${rnd.nextInt(6)}",
        traceUtime, traceLt, traceUtime + i % 3, traceLt + i % 5)
    }.toDF("trace_id", "action_id", "type",
      "trace_end_utime", "trace_end_lt", "end_utime", "end_lt")
    val accounts = (1 to 300).flatMap { i =>
      val traceLt = (i % 40) * 10L
      val traceUtime = (i % 25) * 7L
      (0 until 1 + rnd.nextInt(3)).map { a =>
        (s"0:${(i + a) % 15}", s"tr${i % 60}", s"a$i",
          traceUtime, traceLt, traceUtime + i % 3, traceLt + i % 5)
      }
    }.toDF("account", "trace_id", "action_id",
      "trace_end_utime", "trace_end_lt", "action_end_utime", "action_end_lt")
    (acts, accounts)
  }

  /** The reference orderby decision restated (crud_actions.go:85-105
    * order_by_now, 184-198 four-key switch). `mutateClock` flips the
    * switch — used by the canary below to prove the fuzz would catch a
    * sort-contract regression. */
  private def actionsSqlOf(r: ActionsRequest,
      mutateClock: Boolean = false): String = {
    val joinAccounts = r.account.isDefined
    val orderByNow =
      (r.utimeMin.isDefined || r.utimeMax.isDefined) != mutateClock
    val from =
      if (joinAccounts)
        """(SELECT AA.account, AA.trace_id, AA.action_id,
          |  AA.trace_end_utime, AA.trace_end_lt,
          |  AA.action_end_utime AS end_utime,
          |  AA.action_end_lt AS end_lt, A.type
          |  FROM aa_view AA JOIN act_view A
          |  ON A.trace_id = AA.trace_id AND A.action_id = AA.action_id)
          |  t""".stripMargin
      else "act_view"
    val conds = Seq(
      r.account.map(a => s"account = '$a'"),
      r.utimeMin.map(v => s"trace_end_utime >= $v"),
      r.utimeMax.map(v => s"trace_end_utime <= $v"),
      r.ltMin.map(v => s"trace_end_lt >= $v"),
      r.ltMax.map(v => s"trace_end_lt <= $v"),
      if (r.includeTypes.nonEmpty)
        Some(r.includeTypes.map(t => s"'$t'").mkString("type IN (", ",", ")"))
      else None,
      if (r.excludeTypes.nonEmpty)
        Some(r.excludeTypes.map(t => s"'$t'")
          .mkString("type NOT IN (", ",", ")"))
      else None,
      Some("end_lt IS NOT NULL")).flatten
    val dir = if (r.descending) "DESC" else "ASC"
    val keys =
      if (orderByNow) Seq("trace_end_utime", "trace_id", "end_utime", "action_id")
      else Seq("trace_end_lt", "trace_id", "end_lt", "action_id")
    val order = keys.map(k => s"$k $dir").mkString(" ORDER BY ", ", ", "")
    val lim = if (r.limit <= 0) QueryLayer.DefaultLimit
      else math.min(r.limit, QueryLayer.MaxLimit)
    if (joinAccounts)
      // postgres DISTINCT ON (k1..k4) with action_id inside the key:
      // WHERE over every bridge copy, then one row per distinct active
      // 4-tuple — DISTINCT over exactly those four columns
      s"""SELECT action_id FROM (
         |  SELECT DISTINCT ${keys.mkString(", ")}
         |  FROM $from WHERE ${conds.mkString(" AND ")})
         |$order LIMIT $lim OFFSET ${math.max(r.offset, 0)}""".stripMargin
    else
      s"""SELECT action_id FROM $from WHERE ${conds.mkString(" AND ")}
         |$order LIMIT $lim OFFSET ${math.max(r.offset, 0)}""".stripMargin
  }

  private def actionsDraw(rnd: Random): ActionsRequest = ActionsRequest(
    account = if (rnd.nextBoolean()) Some(s"0:${rnd.nextInt(15)}") else None,
    utimeMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(100).toLong) else None,
    utimeMax = if (rnd.nextInt(3) == 0) Some((40 + rnd.nextInt(140)).toLong) else None,
    ltMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(250).toLong) else None,
    ltMax = if (rnd.nextInt(3) == 0) Some((100 + rnd.nextInt(300)).toLong) else None,
    includeTypes = if (rnd.nextInt(3) == 0)
      (0 until 1 + rnd.nextInt(3)).map(_ => s"t${rnd.nextInt(6)}").distinct
    else Nil,
    excludeTypes = if (rnd.nextInt(4) == 0) Seq(s"t${rnd.nextInt(6)}") else Nil,
    descending = rnd.nextBoolean(),
    limit = rnd.nextInt(400) - 30,
    offset = rnd.nextInt(12) - 2)

  test("randomized actions draws: QueryLayer == reference-shaped SQL " +
      "(order_by_now clock switch + action_accounts site switch)") {
    val (acts, accounts) = actionsFixture()
    acts.createOrReplaceTempView("act_view")
    accounts.createOrReplaceTempView("aa_view")
    val rnd = new Random(20260816L)
    var nonEmpty = 0
    var clockSwitched = 0
    (1 to 40).foreach { i =>
      val r = actionsDraw(rnd)
      val viaLayer = QueryLayer.actionsByRequest(acts, accounts, r)
        .select("action_id").collect().map(_.getString(0)).toSeq
      val viaSql = spark.sql(actionsSqlOf(r))
        .collect().map(_.getString(0)).toSeq
      assert(viaLayer == viaSql, s"draw $i diverged for $r")
      if (viaLayer.nonEmpty) nonEmpty += 1
      if (r.utimeMin.isDefined || r.utimeMax.isDefined) clockSwitched += 1
    }
    assert(nonEmpty > 12, s"fuzz draws too empty ($nonEmpty/40)")
    assert(clockSwitched > 5 && clockSwitched < 35,
      "draws must exercise both sides of the order_by_now switch")
  }

  test("bridge DISTINCT ON: the WHERE applies to every bridge copy, and " +
      "the key is the full active 4-tuple (crud_actions.go:127-129) — " +
      "stamp-divergent copies ALL survive as their own groups") {
    import spark.implicits._
    val acts = Seq(("tr1", "a1", "t0", 0L, 0L, 0L, 5L),
      ("tr2", "a2", "t0", 0L, 0L, 0L, 6L))
      .toDF("trace_id", "action_id", "type",
        "trace_end_utime", "trace_end_lt", "end_utime", "end_lt")
    // three copies of (acc, tr1, a1) with DIVERGENT denormalized stamps:
    // utime 10 (fails the filter), 30 and 50 (both pass); one copy of
    // (acc, tr2, a2) at utime 40
    val bridge = Seq(
      ("0:1", "tr1", "a1", 10L, 1L, 10L, 1L),
      ("0:1", "tr1", "a1", 30L, 3L, 30L, 3L),
      ("0:1", "tr1", "a1", 50L, 5L, 50L, 5L),
      ("0:1", "tr2", "a2", 40L, 4L, 40L, 4L))
      .toDF("account", "trace_id", "action_id",
        "trace_end_utime", "trace_end_lt", "action_end_utime",
        "action_end_lt")
    val got = QueryLayer.actionsByRequest(acts, bridge,
      ActionsRequest(account = Some("0:1"), utimeMin = Some(20L),
        descending = true))
      .select("action_id", "s_trace_end_utime").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // the 10-stamp copy fails the WHERE (dedup-before-filter could have
    // kept it and suppressed a1 entirely); the 30- and 50-stamp copies
    // are DISTINCT 4-tuples, so BOTH survive — the reference returns the
    // action once per divergent stamp copy; DESC order: 50, 40, 30
    assert(got == Seq(("a1", 50L), ("a2", 40L), ("a1", 30L)), s"got $got")
    // ascending flips only the output order
    val asc = QueryLayer.actionsByRequest(acts, bridge,
      ActionsRequest(account = Some("0:1"), utimeMin = Some(20L),
        descending = false))
      .select("action_id", "s_trace_end_utime").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(asc == Seq(("a1", 30L), ("a2", 40L), ("a1", 50L)), s"got $asc")
    // 4-tuple-equal copies DO collapse: duplicate the 30-stamp row
    // byte-identically and the output must not change
    val dupBridge = bridge.unionAll(bridge.filter(
      org.apache.spark.sql.functions.col("trace_end_utime") === 30L))
    val dedup = QueryLayer.actionsByRequest(acts, dupBridge,
      ActionsRequest(account = Some("0:1"), utimeMin = Some(20L),
        descending = true))
      .select("action_id", "s_trace_end_utime").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(dedup == got, s"got $dedup")
  }

  // ------------------------------------------------------------- traces

  import QueryLayer.TraceRequest

  /** traces + transactions + messages with ties on both sort clocks,
    * NULL end stamps on pending traces, and msg_hash/norm aliasing. */
  private def tracesFixture(): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val rnd = new Random(7L)
    val traces = (1 to 240).map { i =>
      val pending = i % 11 == 0
      (f"tr$i%03d",
        if (pending) None else Some((i % 30) * 10L),
        if (pending) None else Some((i % 17) * 7L),
        if (pending) "pending" else "complete",
        (i % 9).toLong)
    }.toDF("trace_id", "end_lt", "end_utime", "state", "mc_seqno_end")
    val txs = (1 to 240).flatMap { i =>
      (0 until 1 + rnd.nextInt(2)).map(t =>
        (f"tr$i%03d", s"0:${(i + t) % 12}", s"h${i}_$t"))
    }.toDF("trace_id", "account", "hash")
    val msgs = (1 to 240).map { i =>
      (f"tr$i%03d", s"m$i", s"n${i % 50}")
    }.toDF("trace_id", "msg_hash", "msg_hash_norm")
    (traces, txs, msgs)
  }

  /** crud_traces.go:13-115 restated; `mutateClock` flips order_by_now. */
  private def tracesSqlOf(r: TraceRequest,
      mutateClock: Boolean = false): String = {
    val orderByNow =
      (r.utimeMin.isDefined || r.utimeMax.isDefined) != mutateClock
    def inList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("(", ",", ")")
    val conds = Seq(
      r.utimeMin.map(v => s"end_utime >= $v"),
      r.utimeMax.map(v => s"end_utime <= $v"),
      r.ltMin.map(v => s"end_lt >= $v"),
      r.ltMax.map(v => s"end_lt <= $v"),
      r.account.map(a => s"""EXISTS (SELECT 1 FROM trtx_view T
        WHERE T.trace_id = E.trace_id AND T.account = '$a')"""),
      if (r.txHashes.nonEmpty) Some(s"""EXISTS (SELECT 1 FROM trtx_view T
        WHERE T.trace_id = E.trace_id AND T.hash IN ${inList(r.txHashes)})""")
      else None,
      if (r.msgHashes.nonEmpty) Some(s"""EXISTS (SELECT 1 FROM trmsg_view M
        WHERE M.trace_id = E.trace_id AND (M.msg_hash IN ${inList(r.msgHashes)}
        OR M.msg_hash_norm IN ${inList(r.msgHashes)}))""")
      else None,
      if (r.traceIds.nonEmpty) Some(s"trace_id IN ${inList(r.traceIds)}")
      else None,
      r.mcSeqno.map(v => s"state = 'complete' AND mc_seqno_end = $v")
    ).flatten
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    val (d, n) = if (r.descending) ("DESC", "NULLS FIRST")
      else ("ASC", "NULLS LAST")
    val key = if (orderByNow) "end_utime" else "end_lt"
    val lim = if (r.limit <= 0) QueryLayer.DefaultLimit
      else math.min(r.limit, QueryLayer.MaxLimit)
    s"""SELECT trace_id FROM tr_view E$where
       |ORDER BY $key $d $n, trace_id $d
       |LIMIT $lim OFFSET ${math.max(r.offset, 0)}""".stripMargin
  }

  private def tracesDraw(rnd: Random): TraceRequest = TraceRequest(
    account = if (rnd.nextInt(3) == 0) Some(s"0:${rnd.nextInt(12)}") else None,
    txHashes = if (rnd.nextInt(4) == 0)
      (0 until 1 + rnd.nextInt(3)).map(_ => s"h${1 + rnd.nextInt(240)}_0")
    else Nil,
    msgHashes = if (rnd.nextInt(4) == 0) {
      // half the draws hit the NORMALIZED hash alias
      if (rnd.nextBoolean()) Seq(s"m${1 + rnd.nextInt(240)}")
      else Seq(s"n${rnd.nextInt(50)}")
    } else Nil,
    traceIds = if (rnd.nextInt(5) == 0)
      (0 until 2).map(_ => f"tr${1 + rnd.nextInt(240)}%03d")
    else Nil,
    mcSeqno = if (rnd.nextInt(4) == 0) Some(rnd.nextInt(9).toLong) else None,
    utimeMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(80).toLong) else None,
    utimeMax = if (rnd.nextInt(3) == 0) Some((30 + rnd.nextInt(90)).toLong) else None,
    ltMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(200).toLong) else None,
    ltMax = if (rnd.nextInt(3) == 0) Some((80 + rnd.nextInt(250)).toLong) else None,
    descending = rnd.nextBoolean(),
    limit = rnd.nextInt(300) - 20,
    offset = rnd.nextInt(10) - 2)

  test("randomized traces draws: QueryLayer == reference-shaped SQL " +
      "(EXISTS filter surface + order_by_now clock + NULL end stamps)") {
    val (traces, txs, msgs) = tracesFixture()
    traces.createOrReplaceTempView("tr_view")
    txs.createOrReplaceTempView("trtx_view")
    msgs.createOrReplaceTempView("trmsg_view")
    val rnd = new Random(20260817L)
    var nonEmpty = 0
    (1 to 40).foreach { i =>
      val r = tracesDraw(rnd)
      val viaLayer = QueryLayer.tracesByRequest(traces, txs, msgs, r)
        .select("trace_id").collect().map(_.getString(0)).toSeq
      val viaSql = spark.sql(tracesSqlOf(r))
        .collect().map(_.getString(0)).toSeq
      assert(viaLayer == viaSql, s"draw $i diverged for $r")
      if (viaLayer.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 12, s"fuzz draws too empty ($nonEmpty/40)")
  }

  test("mutation canary: a flipped traces order_by_now contract is " +
      "CAUGHT by the traces fuzz") {
    val (traces, txs, msgs) = tracesFixture()
    traces.createOrReplaceTempView("tr_view")
    txs.createOrReplaceTempView("trtx_view")
    msgs.createOrReplaceTempView("trmsg_view")
    val rnd = new Random(20260817L) // same seed → same draws
    val diverged = (1 to 40).count { _ =>
      val r = tracesDraw(rnd)
      val viaLayer = QueryLayer.tracesByRequest(traces, txs, msgs, r)
        .select("trace_id").collect().map(_.getString(0)).toSeq
      val mutated = spark.sql(tracesSqlOf(r, mutateClock = true))
        .collect().map(_.getString(0)).toSeq
      viaLayer != mutated
    }
    assert(diverged > 0, "traces fixture ties too weak to catch a " +
      "sort-contract mutation")
  }

  // ----------------------------------------------------------- messages

  import QueryLayer.MessageRequest

  /** in/out message copies with msg_hash/norm aliasing, NULL clock
    * stamps on externals, and ties on both clock columns. */
  private def messagesFixture(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (1 to 200).flatMap { i =>
      val external = i % 7 == 0
      val lt: Option[Long] = if (external) None else Some((i % 25) * 4L)
      val at: Option[Long] = if (external) None else Some((i % 13) * 9L)
      val row = (f"m$i%03d", s"n${i % 40}",
        if (i % 5 == 0) None else Some(s"0:${i % 8}"),
        Some(s"0:${(i + 3) % 8}"), (i % 50).toLong,
        (i % 6).toLong, lt, at, s"b${i % 30}")
      Seq(("in", s"ti$i") -> row) ++
        (if (external) Nil else Seq(("out", s"to$i") -> row))
    }.map { case ((d, tx), (mh, mhn, src, dst, v, op, lt, at, bh)) =>
      (mh, mhn, src, dst, v, op, lt, at, bh, d, tx)
    }.toDF("msg_hash", "msg_hash_norm", "source", "destination", "value",
      "opcode", "created_lt", "created_at", "body_hash", "direction",
      "tx_hash")
  }

  /** crud_messages.go:14-105 restated: the group-by dedup, the
    * clock-switching order column AND the clock-switching externals
    * NULL test; `mutateClock` flips the switch. */
  private def messagesSqlOf(r: MessageRequest,
      mutateClock: Boolean = false): String = {
    val orderCol0 =
      if (r.utimeMin.isDefined || r.utimeMax.isDefined) "created_at"
      else "created_lt"
    val orderCol = if (!mutateClock) orderCol0
      else if (orderCol0 == "created_at") "created_lt" else "created_at"
    val conds = Seq(
      r.direction.map(v => s"direction = '$v'"),
      r.source.map(v =>
        if (v == "null") "source IS NULL" else s"source = '$v'"),
      r.destination.map(v =>
        if (v == "null") "destination IS NULL" else s"destination = '$v'"),
      r.opcode.map(v => s"opcode = $v"),
      if (r.msgHashes.nonEmpty) {
        val in = r.msgHashes.map(x => s"'$x'").mkString("(", ",", ")")
        Some(s"(msg_hash IN $in OR msg_hash_norm IN $in)")
      } else None,
      r.bodyHash.map(v => s"body_hash = '$v'"),
      r.utimeMin.map(v => s"created_at >= $v"),
      r.utimeMax.map(v => s"created_at <= $v"),
      r.ltMin.map(v => s"created_lt >= $v"),
      r.ltMax.map(v => s"created_lt <= $v"),
      if (r.excludeExternals) Some(s"$orderCol0 IS NOT NULL") else None,
      if (r.onlyExternals) Some(s"$orderCol0 IS NULL") else None).flatten
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    val (d, n) = if (r.descending) ("DESC", "NULLS FIRST")
      else ("ASC", "NULLS LAST")
    val lim = if (r.limit <= 0) QueryLayer.DefaultLimit
      else math.min(r.limit, QueryLayer.MaxLimit)
    s"""SELECT msg_hash,
       |  max(CASE WHEN direction = 'in' THEN tx_hash END) AS in_tx_hash,
       |  max(CASE WHEN direction = 'out' THEN tx_hash END) AS out_tx_hash
       |FROM msg_view$where
       |GROUP BY msg_hash, msg_hash_norm, source, destination, value,
       |  opcode, created_lt, created_at, body_hash
       |ORDER BY $orderCol $d $n, msg_hash $d
       |LIMIT $lim""".stripMargin
  }

  private def messagesDraw(rnd: Random): MessageRequest = MessageRequest(
    direction = if (rnd.nextInt(4) == 0)
      Some(if (rnd.nextBoolean()) "in" else "out") else None,
    source = if (rnd.nextInt(4) == 0)
      Some(if (rnd.nextInt(4) == 0) "null" else s"0:${rnd.nextInt(8)}")
    else None,
    destination = if (rnd.nextInt(4) == 0) Some(s"0:${rnd.nextInt(8)}")
    else None,
    opcode = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(6).toLong) else None,
    msgHashes = if (rnd.nextInt(4) == 0) {
      if (rnd.nextBoolean()) Seq(f"m${1 + rnd.nextInt(200)}%03d")
      else Seq(s"n${rnd.nextInt(40)}")
    } else Nil,
    bodyHash = if (rnd.nextInt(5) == 0) Some(s"b${rnd.nextInt(30)}") else None,
    utimeMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(60).toLong) else None,
    utimeMax = if (rnd.nextInt(3) == 0) Some((20 + rnd.nextInt(100)).toLong)
    else None,
    ltMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(60).toLong) else None,
    ltMax = if (rnd.nextInt(3) == 0) Some((20 + rnd.nextInt(80)).toLong)
    else None,
    excludeExternals = rnd.nextInt(5) == 0,
    onlyExternals = rnd.nextInt(8) == 0,
    descending = rnd.nextBoolean(),
    limit = rnd.nextInt(300) - 20)

  test("randomized messages draws: QueryLayer == reference-shaped SQL " +
      "(group-by dedup + clock-switching order col + externals NULL " +
      "test on the ACTIVE clock)") {
    val msgs = messagesFixture()
    msgs.createOrReplaceTempView("msg_view")
    val rnd = new Random(20260818L)
    var nonEmpty = 0
    (1 to 40).foreach { i =>
      val r = messagesDraw(rnd)
      val viaLayer = QueryLayer.messages(msgs, r)
        .select("msg_hash", "in_tx_hash", "out_tx_hash").collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSeq
      val viaSql = spark.sql(messagesSqlOf(r)).collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSeq
      assert(viaLayer == viaSql, s"draw $i diverged for $r")
      if (viaLayer.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 12, s"fuzz draws too empty ($nonEmpty/40)")
  }

  test("mutation canary: a flipped messages clock contract is CAUGHT " +
      "by the messages fuzz") {
    val msgs = messagesFixture()
    msgs.createOrReplaceTempView("msg_view")
    val rnd = new Random(20260818L) // same seed → same draws
    val diverged = (1 to 40).count { _ =>
      val r = messagesDraw(rnd)
      val viaLayer = QueryLayer.messages(msgs, r)
        .select("msg_hash", "in_tx_hash", "out_tx_hash").collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSeq
      val mutated = spark.sql(messagesSqlOf(r, mutateClock = true))
        .collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSeq
      viaLayer != mutated
    }
    assert(diverged > 0, "messages fixture ties too weak to catch a " +
      "clock mutation")
  }

  // ------------------------------------------------------------- blocks

  import QueryLayer.BlockRequest

  private def blocksFixture(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (1 to 250).map { i =>
      ((i % 3), (i % 10).toLong, i.toLong, (i % 20).toLong,
        (i % 15) * 6L, (i % 22) * 11L)
    }.toDF("workchain", "shard", "seqno", "mc_block_seqno",
      "gen_utime", "start_lt")
  }

  /** crud_blocks.go:14-80 restated (order col gen_utime; the seqno +
    * workchain tie keys are the engine's documented determinism
    * extension, mirrored here so the compare is total). `mutateKey`
    * swaps the order column for start_lt — the canary. */
  private def blocksSqlOf(r: BlockRequest,
      mutateKey: Boolean = false): String = {
    val conds = Seq(
      r.workchain.map(v => s"workchain = $v"),
      r.shard.map(v => s"shard = $v"),
      r.seqno.map(v => s"seqno = $v"),
      r.mcSeqno.map(v => s"mc_block_seqno = $v"),
      r.utimeMin.map(v => s"gen_utime >= $v"),
      r.utimeMax.map(v => s"gen_utime <= $v"),
      r.ltMin.map(v => s"start_lt >= $v"),
      r.ltMax.map(v => s"start_lt <= $v")).flatten
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    val d = if (r.descending) "DESC" else "ASC"
    val key = if (mutateKey) "start_lt" else "gen_utime"
    val lim = if (r.limit <= 0) QueryLayer.DefaultLimit
      else math.min(r.limit, QueryLayer.MaxLimit)
    s"""SELECT seqno FROM blk_view$where
       |ORDER BY $key $d, seqno $d, workchain $d LIMIT $lim""".stripMargin
  }

  private def blocksDraw(rnd: Random): BlockRequest = BlockRequest(
    workchain = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(3)) else None,
    shard = if (rnd.nextInt(4) == 0) Some(rnd.nextInt(10).toLong) else None,
    seqno = if (rnd.nextInt(6) == 0) Some((1 + rnd.nextInt(250)).toLong)
    else None,
    mcSeqno = if (rnd.nextInt(5) == 0) Some(rnd.nextInt(20).toLong) else None,
    utimeMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(50).toLong) else None,
    utimeMax = if (rnd.nextInt(3) == 0) Some((20 + rnd.nextInt(80)).toLong)
    else None,
    ltMin = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(120).toLong) else None,
    ltMax = if (rnd.nextInt(3) == 0) Some((60 + rnd.nextInt(200)).toLong)
    else None,
    descending = rnd.nextBoolean(),
    limit = rnd.nextInt(300) - 20)

  test("randomized blocks draws: QueryLayer == reference-shaped SQL") {
    val blks = blocksFixture()
    blks.createOrReplaceTempView("blk_view")
    val rnd = new Random(20260819L)
    var nonEmpty = 0
    (1 to 40).foreach { i =>
      val r = blocksDraw(rnd)
      val viaLayer = QueryLayer.blocks(blks, r)
        .select("seqno").collect().map(_.getLong(0)).toSeq
      val viaSql = spark.sql(blocksSqlOf(r))
        .collect().map(_.getLong(0)).toSeq
      assert(viaLayer == viaSql, s"draw $i diverged for $r")
      if (viaLayer.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 12, s"fuzz draws too empty ($nonEmpty/40)")
  }

  test("mutation canary: a swapped blocks order column is CAUGHT by " +
      "the blocks fuzz") {
    val blks = blocksFixture()
    blks.createOrReplaceTempView("blk_view")
    val rnd = new Random(20260819L) // same seed → same draws
    val diverged = (1 to 40).count { _ =>
      val r = blocksDraw(rnd)
      val viaLayer = QueryLayer.blocks(blks, r)
        .select("seqno").collect().map(_.getLong(0)).toSeq
      val mutated = spark.sql(blocksSqlOf(r, mutateKey = true))
        .collect().map(_.getLong(0)).toSeq
      viaLayer != mutated
    }
    assert(diverged > 0, "blocks fixture ties too weak to catch an " +
      "order-column mutation")
  }

  test("mutation canary: a flipped order_by_now sort contract is CAUGHT " +
      "by the actions fuzz") {
    val (acts, accounts) = actionsFixture()
    acts.createOrReplaceTempView("act_view")
    accounts.createOrReplaceTempView("aa_view")
    val rnd = new Random(20260816L) // same seed → same draws as above
    val diverged = (1 to 40).count { _ =>
      val r = actionsDraw(rnd)
      val viaLayer = QueryLayer.actionsByRequest(acts, accounts, r)
        .select("action_id").collect().map(_.getString(0)).toSeq
      val mutated = spark.sql(actionsSqlOf(r, mutateClock = true))
        .collect().map(_.getString(0)).toSeq
      viaLayer != mutated
    }
    assert(diverged > 0,
      "the fuzz must be able to catch a sort-contract mutation — " +
        "fixture ties are too weak if every mutated draw still matches")
  }
}
