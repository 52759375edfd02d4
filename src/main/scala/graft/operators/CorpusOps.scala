package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-governance operators a 100 TB training-data pipeline needs around
  * the dedup/curation core: mergeable cardinality sketches for corpus
  * telemetry, snapshot-to-snapshot diffs for dataset versioning, and
  * deterministic probability-proportional-to-size sampling. No reference
  * analogue (builder brief: beyond-reference LLM-pipeline surface).
  *
  * All three are oracle-exact. The sketch is the interesting one: HLL's
  * usual implementation is approximate AND engine-specific; this one fixes
  * the hash (md5-derived 52-bit), the register math (exact integer
  * `2^(45-max)` numerators summed in int64) and the final estimate (a fixed
  * literal-order double program), so the ESTIMATE ITSELF is reproducible
  * bit-for-bit in DuckDB — an approximate data structure with an exact
  * oracle, same trick as the m08 perceptual hash.
  */
object CorpusOps {

  private[graft] def toksOf(c: Column): Column = split(trim(c), "\\s+")

  /** alpha_256 — computed (not hand-pasted) so Scala and the interpolated
    * SQL literal are the same IEEE double by construction. */
  private[graft] val Alpha: Double = 0.7213 / (1.0 + 1.079 / 256.0)

  private[graft] val RegBits = 8         // m = 256 registers
  private[graft] val WBits = 44          // 52-bit hash = 8 register + 44 rho bits
  private[graft] val WMask = (1L << WBits) - 1            // 17592186044415
  private[graft] val Pow2W = 1L << (WBits + 1)            // 2^45, the rho=0 numerator

  /** Token bigrams per row — engine-portable (1-based indexing both sides;
    * DuckDB mirror: list_transform(range(1, len(toks)), i -> ...)). */
  private[graft] def bigrams(toksCol: String): Column =
    when(size(col(toksCol)) >= 2,
      expr(s"transform(sequence(1, size($toksCol) - 1), " +
        s"i -> concat(element_at($toksCol, i), ' ', element_at($toksCol, i + 1)))"))
      .otherwise(typedLit(Seq.empty[String]))

  /** 52-bit hash = first 13 hex chars of md5 — exact in int64 AND in a
    * double mantissa, same basis as the SimHash token hash (Dedup). */
  private[graft] def h52(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 13), 16, 10).cast("long")

  /** Per-language HLL register relation (scope, reg, mx) — the mergeable
    * sub-sketch: merging = max per register, which [[distinctSketch]]
    * exercises structurally by deriving the ALL row from these rows
    * rather than from the grams. */
  private[graft] def hllRegisters(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), toksOf(col("text")).as("toks"))
      .select(col("lang"), explode(bigrams("toks")).as("gram"))
      .withColumn("hv", h52(col("gram")))
      .select(col("lang"),
        shiftright(col("hv"), WBits).as("reg"),
        col("hv").bitwiseAND(lit(WMask)).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(WBits + 1))
          .otherwise(lit(WBits + 1) - length(bin(col("w")))))
      .groupBy(col("lang").as("scope"), col("reg"))
      .agg(max("rho").as("mx"))

  /** Deterministic HLL over distinct token bigrams, per language plus a
    * merged ALL row (register merge = max of maxes — the mergeability that
    * makes the sketch a one-pass map-side-combinable aggregate at 100 TB;
    * the exact-distinct audit column is gate-scale-only luxury and would be
    * dropped in production, which is the sketch's whole point).
    *
    * No small/large-range corrections: both need `ln`, the one op that is
    * not exactly rounded across engines; raw-estimate bias at n >> m is
    * negligible and the audit column shows the real error as data. */
  def distinctSketch(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("lang"), toksOf(col("text")).as("toks"))
      .select(col("lang"), explode(bigrams("toks")).as("gram"))
    val perLang = hllRegisters(docs)
    // register merge: max of per-lang maxes == max over the raw stream
    val global = perLang.groupBy("reg").agg(max("mx").as("mx"))
      .select(lit("ALL").as("scope"), col("reg"), col("mx"))
    val sk = perLang.unionByName(global)
      .groupBy("scope")
      .agg(count(lit(1)).as("n_hit_regs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${WBits + 1} - mx)"))
          .as("s_hit"))
      .select(col("scope"), col("n_hit_regs"),
        (lit(256L) - col("n_hit_regs")).as("zero_regs"),
        (col("s_hit") + (lit(256L) - col("n_hit_regs")) * lit(Pow2W))
          .as("s_num"))
    val exact = grams.groupBy(col("lang").as("scope"))
      .agg(countDistinct(col("gram")).as("exact_distinct"))
      .unionByName(grams.agg(countDistinct(col("gram")).as("exact_distinct"))
        .select(lit("ALL").as("scope"), col("exact_distinct")))
    sk.join(exact, "scope")
      .withColumn("est",
        ((lit(Alpha) * lit(65536.0)) * lit(Pow2W.toDouble)) /
          col("s_num").cast("double"))
      .select(col("scope"), col("n_hit_regs"), col("zero_regs"),
        col("s_num"), col("est"), col("exact_distinct"),
        ((col("est") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double")).as("rel_err"))
  }

  val d37 = Q("d37_distinct_sketch",
    s"""WITH d AS (
       |  SELECT lang, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT lang, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM d),
       |r AS (
       |  SELECT lang, hv >> $WBits AS reg, (hv & $WMask) AS w,
       |    CASE WHEN (hv & $WMask) = 0 THEN ${WBits + 1}
       |         ELSE ${WBits + 1} - length(bin(hv & $WMask)) END AS rho
       |  FROM (SELECT lang,
       |    ('0x' || substr(md5(gram), 1, 13))::UBIGINT::BIGINT AS hv FROM g)),
       |regs AS (
       |  SELECT lang AS scope, reg, max(rho) AS mx FROM r GROUP BY lang, reg
       |  UNION ALL
       |  SELECT 'ALL', reg, max(rho) FROM r GROUP BY reg),
       |sk AS (
       |  SELECT scope, count(*) AS n_hit_regs, 256 - count(*) AS zero_regs,
       |    CAST(sum(1::BIGINT << (${WBits + 1} - mx))
       |      + (256 - count(*)) * $Pow2W AS BIGINT) AS s_num
       |  FROM regs GROUP BY scope),
       |ex AS (
       |  SELECT lang AS scope, count(DISTINCT gram) AS exact_distinct
       |  FROM g GROUP BY lang
       |  UNION ALL SELECT 'ALL', count(DISTINCT gram) FROM g),
       |est AS (
       |  SELECT sk.scope, n_hit_regs, zero_regs, s_num,
       |    ((CAST($Alpha AS DOUBLE) * 65536.0) * ${Pow2W.toDouble})
       |      / CAST(s_num AS DOUBLE)
       |      AS est,
       |    exact_distinct
       |  FROM sk JOIN ex USING (scope))
       |SELECT scope, n_hit_regs, zero_regs, s_num, est, exact_distinct,
       |  (est - CAST(exact_distinct AS DOUBLE))
       |    / CAST(exact_distinct AS DOUBLE) AS rel_err
       |FROM est ORDER BY scope""".stripMargin) { (s, dir) =>
    distinctSketch(T.documents(s, dir)).orderBy("scope")
  }

  /** Snapshot diff: content-hash full-outer join on the primary key.
    * Narrow from the scan on (key, md5(content)) — at 100 TB this is a
    * two-column co-partitionable join, and `unchanged` rows never leave
    * the join operator. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.select(col("doc_id"),
      md5(col("text").cast("binary")).as("old_hash"))
    val n = newDf.select(col("doc_id"),
      md5(col("text").cast("binary")).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
  }

  /** The simulated snapshot pair shared by d38/d41/s10: v1 drops
    * doc_id%10==0; v2 drops %13==0, revises %7==0, and RE-ADDS the
    * %50==3 survivors under shifted ids with identical text — so the
    * content-match path (an add whose text already exists in v1) is
    * exercised at gate scale, not just in constructed specs. */
  def simulatedV1(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 10 =!= 0)

  def simulatedV2(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 50 === 3)
        .withColumn("doc_id", col("doc_id") + 1000000))

  /** Registered diff over two deterministic simulated snapshots of the
    * documents table: v1 drops doc_id%10==0, v2 drops doc_id%13==0 and
    * revises doc_id%7==0, re-adds %50==3 under shifted ids — so every
    * verdict class including content-matching adds is populated. */
  val d38 = Q("d38_snapshot_diff",
    """WITH v1 AS (
      |  SELECT doc_id, md5(text) AS old_hash FROM documents
      |  WHERE doc_id % 10 <> 0),
      |v2 AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END)
      |      AS new_hash
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, md5(text) FROM documents
      |  WHERE doc_id % 50 = 3)
      |SELECT doc_id, status, old_hash, new_hash FROM (
      |  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
      |    CASE WHEN v1.doc_id IS NULL THEN 'added'
      |         WHEN v2.doc_id IS NULL THEN 'removed'
      |         WHEN old_hash <> new_hash THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    old_hash, new_hash
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id) t
      |WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      val docs = T.documents(s, dir)
      snapshotDiff(simulatedV1(docs), simulatedV2(docs))
        .filter(col("status") =!= "unchanged")
        .select("doc_id", "status", "old_hash", "new_hash")
        .orderBy("doc_id")
  }

  /** Sequential Poisson sampling (Ohlsson 1998): deterministic PPS without
    * replacement — priority xi_i = u_i / pi_i with pi_i = n*w_i/W and u_i a
    * deterministic md5-derived uniform; keep the n smallest priorities.
    * Chosen over Efraimidis-Spirakis (u^(1/w)) precisely because it needs
    * no pow/ln — every op is exactly rounded, so the sample is
    * engine-reproducible. The top-n compiles to TakeOrderedAndProject
    * (per-partition heap + driver merge of n·partitions rows) — the
    * scale-correct global top-k with no full sort. */
  def ppsSample(docs: DataFrame, n: Int, weightCol: String = "n_chars")
      : DataFrame = {
    require(n > 0, "sample size must be positive")
    val w = docs.agg(sum(col(weightCol)).as("w_total"))
    docs
      .select(col("doc_id"), col(weightCol).as("weight"),
        h52(col("doc_id").cast("string")).as("u_num"))
      .crossJoin(broadcast(w))
      .withColumn("priority",
        (col("u_num").cast("double") / lit(4503599627370496.0)) /
          ((lit(n.toDouble) * col("weight").cast("double")) /
            col("w_total").cast("double")))
      .orderBy(col("priority"), col("doc_id"))
      .limit(n)
      .select("doc_id", "weight", "u_num", "priority")
  }

  val d39 = Q("d39_weighted_sample",
    """WITH w AS (SELECT sum(n_chars) AS w_total FROM documents),
      |p AS (
      |  SELECT doc_id, n_chars AS weight,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
      |      ::UBIGINT::BIGINT AS u_num
      |  FROM documents),
      |pr AS (
      |  SELECT doc_id, weight, u_num,
      |    (CAST(u_num AS DOUBLE) / 4503599627370496.0)
      |      / ((64.0 * CAST(weight AS DOUBLE)) / CAST(w_total AS DOUBLE))
      |      AS priority
      |  FROM p, w)
      |SELECT doc_id, weight, u_num, priority FROM pr
      |ORDER BY priority, doc_id LIMIT 64""".stripMargin) { (s, dir) =>
    ppsSample(T.documents(s, dir), 64).orderBy("priority", "doc_id")
  }

  /** Incremental cross-snapshot dedup — the corpus-side analogue of the
    * chain side's IncrementalSilver: re-deduplicating 100 TB because 1%
    * changed is the thing a production pipeline must never do.
    *
    * Semantics (v1 canonicals are FROZEN — group identity is stable
    * across snapshots, even if the canonical doc was itself removed):
    *  - rows unchanged in v2 (same doc_id + content hash) carry their
    *    v1 group: a key-equi semi join, no re-hashing of content;
    *  - delta rows (new or changed) first probe v1's hash→canonical
    *    index — delta-sized build side, broadcastable;
    *  - delta rows matching nothing form new groups first-seen
    *    (min doc_id) WITHIN the delta.
    * Equivalent closed form (what the oracle recomputes):
    * canonical(h) = coalesce(min_v1(h), min_delta(h)). */
  def incrementalDedup(v1: DataFrame, v2: DataFrame): DataFrame = {
    val v1h = v1.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val v1canon = v1h.groupBy("h").agg(min("doc_id").as("v1_canonical"))
    val v2h = v2.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val carried = v2h.join(v1h, Seq("doc_id", "h"), "left_semi")
      .join(v1canon, "h")
      .select(col("doc_id"), col("h"),
        col("v1_canonical").as("canonical"), lit("carried").as("src"))
    val delta = v2h.join(v1h, Seq("doc_id", "h"), "left_anti")
    val deltaCanon = delta.groupBy("h").agg(min("doc_id").as("delta_min"))
    val deltaOut = delta
      .join(broadcast(v1canon), Seq("h"), "left")
      .join(broadcast(deltaCanon), "h")
      .select(col("doc_id"), col("h"),
        coalesce(col("v1_canonical"), col("delta_min")).as("canonical"),
        when(col("v1_canonical").isNotNull, "matched_v1")
          .otherwise("new_group").as("src"))
    carried.unionByName(deltaOut)
  }

  /** Registered over the same simulated snapshots as d38, so all four
    * verdict sources are populated (carried, matched_v1 via re-adds,
    * new_group via revisions and adds). */
  val d41 = Q("d41_incremental_dedup",
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
      |dc AS (SELECT h, min(doc_id) AS delta_min FROM delta GROUP BY h)
      |SELECT doc_id, h, canonical, src FROM (
      |  SELECT c.doc_id, c.h, v1c.v1_canonical AS canonical,
      |    'carried' AS src
      |  FROM carried c JOIN v1c USING (h)
      |  UNION ALL
      |  SELECT d.doc_id, d.h,
      |    COALESCE(v1c.v1_canonical, dc.delta_min) AS canonical,
      |    CASE WHEN v1c.v1_canonical IS NOT NULL THEN 'matched_v1'
      |         ELSE 'new_group' END AS src
      |  FROM delta d LEFT JOIN v1c USING (h) JOIN dc USING (h)) t
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = T.documents(s, dir)
    incrementalDedup(simulatedV1(docs), simulatedV2(docs))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(d37, d38, d39, d41)
}
