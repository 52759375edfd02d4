package graft.streaming

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Driver-visible instantiation of the streaming aggregation plan shape:
  * `StreamOps.windowedCounts` runs the identical plan over the batch
  * events table (Structured Streaming batch/stream unification), checked
  * against epoch-aligned bucket arithmetic in the oracle.
  */
object StreamQueries {

  /** 5-minute tumbling-window counts per event type. Spark's window()
    * aligns to the epoch, so bucket_start_us = floor(us / 300e6) * 300e6. */
  val s01 = Q("s01_windowed_counts",
    """SELECT (epoch_us(ts) // 300000000) * 300000000 AS bucket_start_us,
      |  event_type, count(*) AS n,
      |  cast(sum(cast(trunc(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM events GROUP BY 1, 2
      |ORDER BY bucket_start_us, event_type""".stripMargin) { (s, dir) =>
    StreamOps.windowedCounts(T.events(s, dir), "ts")
      .select(unix_micros(col("window.start")).as("bucket_start_us"),
        col("event_type"), col("n"), col("total_cents"))
      .orderBy("bucket_start_us", "event_type")
  }

  /** Gap-based sessionization (session_window): events of a user belong
    * to one session while consecutive gaps stay under 30 minutes. The
    * oracle derives identical sessions with a lag + running-sum — session
    * starts where the gap reaches the timeout (Spark merges only on
    * strict overlap, hence `>=` in the oracle). */
  val s02 = Q("s02_sessionize",
    """WITH o AS (SELECT user_id, epoch_us(ts) AS us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events),
      |m AS (SELECT user_id, us,
      |    CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM o),
      |s AS (SELECT user_id, us, sum(new_s) OVER (PARTITION BY user_id
      |    ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      |SELECT user_id, min(us) AS session_start_us, count(*) AS n
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
    T.events(s, dir)
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window(col("ts_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n"))
      .orderBy("user_id", "session_start_us")
  }

  /** Pending/emulated context merge (crud/pending.go:200-243): per user
    * chain, the first 60% of txs are confirmed; the emulated batch
    * re-emulates the last two confirmed txs plus the tail. Precedence:
    * short traces (≤4 txs) are marked complete → their emulated rows
    * drop entirely; re-emulated rows drop because their in-msg is
    * already confirmed; only the genuine tail survives as pending. */
  val s03 = Q("s03_pending_merge",
    """WITH r AS (
      |  SELECT user_id, event_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS cnt
      |  FROM events)
      |SELECT concat('T', event_id) AS hash, 'confirmed' AS finality
      |FROM r WHERE rn <= greatest((cnt * 3) // 5, 1)
      |UNION ALL
      |SELECT concat('T', event_id), 'pending'
      |FROM r WHERE rn > greatest((cnt * 3) // 5, 1) AND cnt > 4
      |ORDER BY hash, finality""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val r = T.events(s, dir).select(col("user_id"), col("event_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("event_id")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("user_id")))
      .withColumn("cut",
        greatest(floor(col("cnt") * 3 / 5).cast("long"), lit(1L)))
    val base = r.select(
      concat(lit("T"), col("event_id").cast("string")).as("hash"),
      concat(lit("m"), col("event_id").cast("string")).as("in_msg_hash"),
      concat(lit("x"), col("user_id").cast("string"))
        .as("trace_external_hash"),
      col("rn"), col("cut"), col("cnt"))
    val confirmed = base.filter(col("rn") <= col("cut"))
      .drop("rn", "cut", "cnt")
    val emulated = base.filter(col("rn") > col("cut") - 2)
      .drop("rn", "cut", "cnt")
    val completed = base.filter(col("cnt") <= 4)
      .select("trace_external_hash").distinct()
    StreamOps.mergePending(confirmed, emulated, completed)
      .select("hash", "finality").orderBy("hash", "finality")
  }

  /** Batch unification of `StreamDedup.markDuplicates` (first-seen exact
    * dedup): when documents arrive in doc_id order the streaming canonical
    * is exactly `min(doc_id) OVER (PARTITION BY content hash)` — the spec
    * (StreamDedupSpec) proves the stateful-stream side equals this program
    * across micro-batch splits and restarts; the oracle pins the program. */
  val s04 = Q("s04_first_seen_dedup",
    """SELECT doc_id,
      |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
      |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val canon = min(col("doc_id"))
      .over(Window.partitionBy(md5(col("text").cast("binary"))))
    T.documents(s, dir)
      .select(col("doc_id"), canon.as("canonical_id"),
        (col("doc_id") =!= canon).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Batch unification of `StreamAsOf.latestStateMatches` (streaming
    * as-of): EVERY event gets the user's latest purchase at-or-before
    * its own timestamp — a purchase is both state and probe, and matches
    * itself (the inclusive bound). The batch program is the registered
    * as-of operator with left = all events and right = purchases; the
    * spec (StreamAsOfSpec) proves the stateful-stream side equals it
    * across micro-batch splits; the oracle is DuckDB's native ASOF. */
  val s05 = Q("s05_stream_asof_state",
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events),
      |p AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT e.event_id, e.user_id, e.ts_us,
      |  p.ts_us AS asof_ts_us, p.value AS asof_value
      |FROM e ASOF LEFT JOIN p
      |  ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
      |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
    val ev = T.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    graft.operators.AsOf.asofJoin(
        ev.drop("event_type", "value"),
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts_us", "value"),
        Seq("user_id"), "ts_us")
      .select("event_id", "user_id", "ts_us", "asof_ts_us", "asof_value")
      .orderBy("event_id")
  }

  /** Batch unification of `StreamAsOf.windowAggMatches` (streaming
    * interval aggregate): clicks in the day strictly before each
    * purchase — count, cent-exact sum, and the gap to the most recent
    * one. The batch program is the bucketed interval join; the spec
    * (StreamIntervalSpec) proves the ring-buffer stream side equals it
    * across micro-batch splits. Distinct from q32 by the gap column,
    * which exercises the buffer's ordering, not just its membership. */
  val s06 = Q("s06_stream_interval",
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts_us,
      |  count(c.ts_us) AS n_clicks,
      |  coalesce(CAST(sum(CAST(trunc(c.value * 100) AS BIGINT)) AS BIGINT),
      |           0) AS click_cents,
      |  p.ts_us - max(c.ts_us) AS last_gap_us
      |FROM p LEFT JOIN c ON c.user_id = p.user_id
      |  AND c.ts_us >= p.ts_us - 86400000000 AND c.ts_us < p.ts_us
      |GROUP BY 1, 2, 3
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val ev = T.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    val c = ev.filter(col("event_type") === "click")
      .select("user_id", "ts_us", "value")
    val agg = graft.operators.AsOf
      .intervalPairs(p, c, Seq("user_id"), "ts_us", lookback = 86400000000L)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_clicks"),
        sum(expr("CAST(r_value * 100 AS BIGINT)")).as("click_cents"),
        max(col("__rts")).as("last_rts"))
    p.join(agg, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_cents"), lit(0L)).as("click_cents"),
        (col("ts_us") - col("last_rts")).as("last_gap_us"))
      .orderBy("event_id")
  }

  /** Batch unification of `StreamAsOf.latestStateMatchesTolerance` (the
    * staleness-gated streaming as-of): every event answered with the
    * latest at-or-before purchase ONLY if it is at most an hour old —
    * the "state must be fresh" serving rule. The batch program is
    * asofJoinTolerance; StreamAsOfSpec proves the streaming side equals
    * it across micro-batch splits. */
  val s07 = Q("s07_stream_asof_tolerance",
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events),
      |p AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT event_id, user_id, ts_us,
      |  CASE WHEN gap <= 3600000000 THEN a_ts END AS asof_ts_us,
      |  CASE WHEN gap <= 3600000000 THEN a_val END AS asof_value
      |FROM (
      |  SELECT e.event_id, e.user_id, e.ts_us,
      |    p.ts_us AS a_ts, p.value AS a_val, e.ts_us - p.ts_us AS gap
      |  FROM e ASOF LEFT JOIN p
      |    ON e.user_id = p.user_id AND e.ts_us >= p.ts_us) t
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = T.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    graft.operators.AsOf.asofJoinTolerance(
        ev.drop("event_type", "value"),
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts_us", "value"),
        Seq("user_id"), "ts_us", tolerance = 3600000000L)
      .select("event_id", "user_id", "ts_us", "asof_ts_us", "asof_value")
      .orderBy("event_id")
  }

  /** Batch unification of `StreamCuration.verdicts` (the streaming
    * scrub → token-gate → first-seen-dedup composite): dedup key = md5
    * of the SCRUBBED text, canonical = min doc_id among GATED members
    * only (a short fragment never shadows the full document), every
    * document verdicted. StreamCurationSpec proves the stateful stream
    * equals this across micro-batch splits. */
  val s08 = Q("s08_stream_curation", {
    val bl = graft.operators.Curation.Blocklist
      .map(t => s"'$t'").mkString(", ")
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)
       |      AS n_tokens,
       |    md5(array_to_string(list_transform(
       |      string_split_regex(trim(text), '\\s+'),
       |      t -> CASE WHEN t IN ($bl) THEN '[REDACTED]' ELSE t END), ' '))
       |      AS h
       |  FROM documents),
       |canon AS (
       |  SELECT h, min(doc_id) AS canonical FROM s
       |  WHERE n_tokens >= 40 GROUP BY h)
       |SELECT s.doc_id, s.n_tokens,
       |  s.n_tokens >= 40 AS passed_gate,
       |  s.n_tokens >= 40 AND s.doc_id <> canon.canonical AS is_dup,
       |  s.n_tokens >= 40 AND s.doc_id = canon.canonical AS kept
       |FROM s LEFT JOIN canon ON s.h = canon.h
       |ORDER BY s.doc_id""".stripMargin
  }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val terms = graft.operators.Curation.Blocklist
    val scrubbed = array_join(transform(split(trim(col("text")), "\\s+"),
      t => when(t.isin(terms.map(lit(_)): _*), "[REDACTED]").otherwise(t)),
      " ")
    val base = T.documents(s, dir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("int").as("n_tokens"),
      md5(scrubbed.cast("binary")).as("h"))
    val canon = min(when(col("n_tokens") >= 40, col("doc_id")))
      .over(Window.partitionBy("h"))
    base.select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") >= 40).as("passed_gate"),
        (col("n_tokens") >= 40 && col("doc_id") =!= canon).as("is_dup"),
        (col("n_tokens") >= 40 && col("doc_id") === canon).as("kept"))
      .orderBy("doc_id")
  }

  /** Batch twin of StreamSketch.prefixSketch: the corpus is phase-labeled
    * into 4 event-time ingestion epochs (doc_id quartiles — phase p is
    * `doc_id * 4 < p * (max_id + 1)`, exact integer math), and the sketch
    * is reported per (phase, scope) as it would be emitted by the stream:
    * registers accumulate across phases, a scope emits only in phases it
    * appears in, and the ALL row is the scope-duplicated merge. The
    * estimate column is the same fixed-order double program as d37, so
    * the whole prefix-growth table is oracle-exact — and StreamSketchSpec
    * proves the streaming run produces these exact rows.
    *
    * Scale shape: everything after the per-gram map is bounded by
    * registers (≤ scopes × 4 × 256 rows); the one unbounded aggregate is
    * the exact-audit column, which production drops. */
  val s09 = Q("s09_stream_sketch",
    s"""WITH d AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |mxn AS (SELECT max(doc_id) + 1 AS n FROM documents),
       |g AS (
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM d),
       |ph AS (
       |  SELECT lang, gram,
       |    CASE WHEN doc_id * 4 < n THEN 1
       |         WHEN doc_id * 4 < n * 2 THEN 2
       |         WHEN doc_id * 4 < n * 3 THEN 3 ELSE 4 END AS phase
       |  FROM g, mxn),
       |sc AS (
       |  SELECT lang AS scope, gram, phase FROM ph
       |  UNION ALL SELECT 'ALL', gram, phase FROM ph),
       |r AS (
       |  SELECT scope, phase, hv >> ${graft.operators.CorpusOps.WBits} AS reg,
       |    CASE WHEN (hv & ${graft.operators.CorpusOps.WMask}) = 0
       |         THEN ${graft.operators.CorpusOps.WBits + 1}
       |         ELSE ${graft.operators.CorpusOps.WBits + 1}
       |           - length(bin(hv & ${graft.operators.CorpusOps.WMask}))
       |    END AS rho
       |  FROM (SELECT scope, phase,
       |    ('0x' || substr(md5(gram), 1, 13))::UBIGINT::BIGINT AS hv
       |    FROM sc)),
       |rmax AS (
       |  SELECT scope, phase, reg, max(rho) AS mx FROM r
       |  GROUP BY scope, phase, reg),
       |present AS (SELECT DISTINCT scope, phase FROM r),
       |cum AS (
       |  SELECT p.scope, p.phase, rm.reg, max(rm.mx) AS mx
       |  FROM present p JOIN rmax rm
       |    ON rm.scope = p.scope AND rm.phase <= p.phase
       |  GROUP BY p.scope, p.phase, rm.reg),
       |sk AS (
       |  SELECT scope, phase, CAST(count(*) AS INT) AS n_hit_regs,
       |    CAST(sum(1::BIGINT << (${graft.operators.CorpusOps.WBits + 1} - mx))
       |      + (256 - count(*)) * ${graft.operators.CorpusOps.Pow2W}
       |      AS BIGINT) AS s_num
       |  FROM cum GROUP BY scope, phase),
       |ex AS (
       |  SELECT p.scope, p.phase, count(DISTINCT s.gram) AS exact_distinct
       |  FROM present p JOIN sc s
       |    ON s.scope = p.scope AND s.phase <= p.phase
       |  GROUP BY p.scope, p.phase)
       |SELECT phase, scope, n_hit_regs, s_num,
       |  ((CAST(${graft.operators.CorpusOps.Alpha} AS DOUBLE) * 65536.0)
       |    * ${graft.operators.CorpusOps.Pow2W.toDouble})
       |    / CAST(s_num AS DOUBLE) AS est,
       |  exact_distinct
       |FROM sk JOIN ex USING (scope, phase)
       |ORDER BY phase, scope""".stripMargin) { (s, dir) =>
    import graft.operators.CorpusOps
    val docs = T.documents(s, dir)
    val n = docs.agg((max("doc_id") + 1).as("n"))
    val grams = docs
      .select(col("doc_id"), col("lang"), CorpusOps.toksOf(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        explode(CorpusOps.bigrams("toks")).as("gram"))
    val ph = grams.crossJoin(broadcast(n))
      .withColumn("phase",
        when(col("doc_id") * 4 < col("n"), 1)
          .when(col("doc_id") * 4 < col("n") * 2, 2)
          .when(col("doc_id") * 4 < col("n") * 3, 3)
          .otherwise(4))
      .select(col("lang"), col("gram"), col("phase"))
    val sc = ph.select(col("lang").as("scope"), col("gram"), col("phase"))
      .unionByName(ph.select(lit("ALL").as("scope"), col("gram"),
        col("phase")))
    val r = sc
      .withColumn("hv", CorpusOps.h52(col("gram")))
      .select(col("scope"), col("phase"),
        shiftright(col("hv"), CorpusOps.WBits).as("reg"),
        col("hv").bitwiseAND(lit(CorpusOps.WMask)).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(CorpusOps.WBits + 1))
          .otherwise(lit(CorpusOps.WBits + 1) - length(bin(col("w")))))
    val rmax = r.groupBy("scope", "phase", "reg").agg(max("rho").as("mx"))
    val present = r.select("scope", "phase").distinct()
    val cum = present
      .join(rmax.select(col("scope"), col("phase").as("rphase"),
        col("reg"), col("mx")), Seq("scope"))
      .filter(col("rphase") <= col("phase"))
      .groupBy("scope", "phase", "reg").agg(max("mx").as("mx"))
    val sk = cum.groupBy("scope", "phase")
      .agg(count(lit(1)).cast("int").as("n_hit_regs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${CorpusOps.WBits + 1} - mx)"))
          .as("s_hit"))
      .select(col("scope"), col("phase"), col("n_hit_regs"),
        (col("s_hit") + (lit(256L) - col("n_hit_regs")) * lit(CorpusOps.Pow2W))
          .as("s_num"))
    val ex = present
      .join(sc.select(col("scope"), col("phase").as("gphase"), col("gram")),
        Seq("scope"))
      .filter(col("gphase") <= col("phase"))
      .groupBy("scope", "phase")
      .agg(countDistinct(col("gram")).as("exact_distinct"))
    sk.join(ex, Seq("scope", "phase"))
      .withColumn("est",
        ((lit(CorpusOps.Alpha) * lit(65536.0)) * lit(CorpusOps.Pow2W.toDouble)) /
          col("s_num").cast("double"))
      .select(col("phase"), col("scope"), col("n_hit_regs"), col("s_num"),
        col("est"), col("exact_distinct"))
      .orderBy("phase", "scope")
  }

  /** Batch twin of StreamIncDedup: the snapshot-delta dedup verdicts
    * (same simulated v1/v2 as d41) summarized per arrival phase — the
    * progress report a streaming delta ingest emits: how many documents
    * per phase carried their group, joined a v1 group, or formed new
    * groups, and how many distinct groups each class touched.
    * StreamIncDedupSpec proves the stream (v1 index as INITIAL STATE,
    * phases as micro-batches) emits verdicts that aggregate to exactly
    * these rows. */
  val s10 = Q("s10_stream_inc_dedup",
    """WITH v1 AS (
      |  SELECT doc_id, md5(text) AS h FROM documents
      |  WHERE doc_id % 10 <> 0),
      |v2 AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END)
      |      AS h
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, md5(text) FROM documents
      |  WHERE doc_id % 50 = 3),
      |v1c AS (SELECT h, min(doc_id) AS v1_canonical FROM v1 GROUP BY h),
      |carried AS (
      |  SELECT v2.doc_id, v2.h FROM v2
      |  JOIN v1 ON v1.doc_id = v2.doc_id AND v1.h = v2.h),
      |delta AS (
      |  SELECT v2.doc_id, v2.h FROM v2
      |  ANTI JOIN v1 ON v1.doc_id = v2.doc_id AND v1.h = v2.h),
      |dc AS (SELECT h, min(doc_id) AS delta_min FROM delta GROUP BY h),
      |verdicts AS (
      |  SELECT c.doc_id, v1c.v1_canonical AS canonical, 'carried' AS src
      |  FROM carried c JOIN v1c USING (h)
      |  UNION ALL
      |  SELECT d.doc_id,
      |    COALESCE(v1c.v1_canonical, dc.delta_min) AS canonical,
      |    CASE WHEN v1c.v1_canonical IS NOT NULL THEN 'matched_v1'
      |         ELSE 'new_group' END AS src
      |  FROM delta d LEFT JOIN v1c USING (h) JOIN dc USING (h)),
      |mxn AS (SELECT max(doc_id) + 1 AS n FROM documents)
      |SELECT phase, src, count(*) AS n_docs,
      |  count(DISTINCT canonical) AS n_groups
      |FROM (
      |  SELECT v.*,
      |    CASE WHEN doc_id * 4 < n THEN 1
      |         WHEN doc_id * 4 < n * 2 THEN 2
      |         WHEN doc_id * 4 < n * 3 THEN 3 ELSE 4 END AS phase
      |  FROM verdicts v, mxn) t
      |GROUP BY phase, src ORDER BY phase, src""".stripMargin) { (s, dir) =>
    val docs = T.documents(s, dir)
    val n = docs.agg((max("doc_id") + 1).as("n"))
    graft.operators.CorpusOps.incrementalDedup(
        graft.operators.CorpusOps.simulatedV1(docs),
        graft.operators.CorpusOps.simulatedV2(docs))
      .crossJoin(broadcast(n))
      .withColumn("phase",
        when(col("doc_id") * 4 < col("n"), 1)
          .when(col("doc_id") * 4 < col("n") * 2, 2)
          .when(col("doc_id") * 4 < col("n") * 3, 3)
          .otherwise(4))
      .groupBy("phase", "src")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical")).as("n_groups"))
      .orderBy("phase", "src")
  }

  /** Batch unification of `StreamAsOf.latestStateMatchesHoldback` (the
    * CONTRACT-FREE streaming as-of, r13 verdict item 9): the hold-back
    * variant answers a probe only once a strictly-later row of its key
    * proves no equal-ts state row remains upstream, so without a
    * sentinel flush it emits exactly the FINALIZED PREFIX — every row
    * strictly below its key's frontier timestamp, matched at the
    * inclusive as-of bound. The batch program is s05's as-of join with
    * the per-key frontier rows filtered out (window max); the spec
    * (StreamAsOfSpec) proves the stream emits exactly this set across
    * arbitrary ts-ordered micro-batch splits WITHOUT the
    * rights-before-probes producer contract s05's operator needs. */
  val s11 = Q("s11_stream_asof_holdback",
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events),
      |p AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'purchase'),
      |aj AS (
      |  SELECT e.event_id, e.user_id, e.ts_us,
      |    p.ts_us AS asof_ts_us, p.value AS asof_value
      |  FROM e ASOF LEFT JOIN p
      |    ON e.user_id = p.user_id AND e.ts_us >= p.ts_us),
      |mx AS (SELECT user_id, max(ts_us) AS mx FROM e GROUP BY user_id)
      |SELECT aj.event_id, aj.user_id, aj.ts_us, aj.asof_ts_us,
      |  aj.asof_value
      |FROM aj JOIN mx ON mx.user_id = aj.user_id
      |WHERE aj.ts_us < mx.mx
      |ORDER BY aj.event_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = T.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    graft.operators.AsOf.asofJoin(
        ev.drop("event_type", "value"),
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts_us", "value"),
        Seq("user_id"), "ts_us")
      .withColumn("__mx",
        max(col("ts_us")).over(Window.partitionBy(col("user_id"))))
      .filter(col("ts_us") < col("__mx"))
      .select("event_id", "user_id", "ts_us", "asof_ts_us", "asof_value")
      .orderBy("event_id")
  }

  /** Batch unification of `StreamAsOf.latestStateMatchesHoldbackFlush`
    * (the watermark-flushed production mode of the contract-free as-of,
    * r14 verdict item 4): the EventTimeTimeout flush emits, beyond
    * s11's finalized prefix, every key's held frontier whose timeout
    * (frontier_ms + 1, Spark tracks watermarks in ms) sits STRICTLY
    * below the stream-end watermark (global max event-time ms − delay).
    * The emitted set is the finalized prefix ∪ the flushed frontiers,
    * each answered at the inclusive as-of bound — precisely this batch
    * program. Delay = 8 h: the fixture's per-key frontier lag straddles
    * it at every committed scale (median ≈ 7.2 h), so both the flushed
    * and the still-held sides are exercised. StreamAsOfSpec proves the
    * stream emits exactly this set across arbitrary ts-ordered splits,
    * including a frontier-only tail no sentinel ever advances. */
  val s12 = Q("s12_stream_asof_flush",
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events),
      |p AS (SELECT user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'purchase'),
      |aj AS (
      |  SELECT e.event_id, e.user_id, e.ts_us,
      |    p.ts_us AS asof_ts_us, p.value AS asof_value
      |  FROM e ASOF LEFT JOIN p
      |    ON e.user_id = p.user_id AND e.ts_us >= p.ts_us),
      |mx AS (SELECT user_id, max(ts_us) AS mx FROM e GROUP BY user_id),
      |g AS (SELECT max(ts_us) AS gmx FROM e)
      |SELECT aj.event_id, aj.user_id, aj.ts_us, aj.asof_ts_us,
      |  aj.asof_value
      |FROM aj JOIN mx ON mx.user_id = aj.user_id, g
      |WHERE aj.ts_us < mx.mx
      |   OR mx.mx // 1000 + 1 < g.gmx // 1000 - 28800000
      |ORDER BY aj.event_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = T.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"), col("event_type"))
    graft.operators.AsOf.asofJoin(
        ev.drop("event_type", "value"),
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts_us", "value"),
        Seq("user_id"), "ts_us")
      .withColumn("__fr",
        max(col("ts_us")).over(Window.partitionBy(col("user_id"))))
      .crossJoin(broadcast(
        T.events(s, dir).agg(expr("max(ts DIV 1000)").as("__gmx"))))
      .filter(col("ts_us") < col("__fr") ||
        expr("__fr DIV 1000 + 1 < __gmx DIV 1000 - 28800000"))
      .select("event_id", "user_id", "ts_us", "asof_ts_us", "asof_value")
      .orderBy("event_id")
  }

  val all: Seq[Q] =
    Seq(s01, s02, s03, s04, s05, s06, s07, s08, s09, s10, s11, s12)
}
