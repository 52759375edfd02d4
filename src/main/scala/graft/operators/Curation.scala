package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: benchmark
  * decontamination, deterministic stratified sampling, token-budget shard
  * packing, and blocklist/PII scrubbing. Like TextOps/Dedup this extends
  * the engine beyond toncenter/ton-indexer's surface (builder brief).
  *
  * Scale design notes per operator are on each method; the common themes:
  * the benchmark side of decontamination is small by nature (eval suites
  * are ≤10⁶ docs) and is BROADCAST, sampling is a pure map-side filter
  * with zero shuffle, and the shard-packing prefix sum is the classic
  * two-level scan (per-bucket window + tiny bucket-offset table) — never
  * a single-partition global window over the corpus.
  */
object Curation {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  // ---------------------------------------------------------------- d15

  /** Benchmark decontamination: for every corpus document, count its
    * distinct 3-word shingles that also appear anywhere in the benchmark
    * set, and flag documents whose overlap ratio ≥ 0.5 (integer math — no
    * float column, bit-exact against the oracle).
    *
    * `bench` is exploded to distinct 8-byte shingle hashes and broadcast:
    * the corpus side streams (doc_id, hash) rows through a broadcast
    * LEFT SEMI join — no shuffle of the 100-TB side at all, and the
    * benchmark fits executor memory by construction (a 10⁶-doc eval suite
    * is ~10⁸ hashes ≈ 1 GB; above that, swap the broadcast for a
    * bucketed shuffle join — the operator shape is unchanged). */
  def decontaminate(corpus: DataFrame, bench: DataFrame): DataFrame = {
    val benchSet = bench
      .select(explode(expr("transform(sh, x -> xxhash64(x))")).as("g"))
      .distinct()
    val hits = corpus
      .select(col("doc_id"), explode(expr("transform(sh, x -> xxhash64(x))")).as("g"))
      .join(broadcast(benchSet), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    corpus.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_shingles"),
        (coalesce(col("n_shared"), lit(0L)) * 2 >= col("n_shingles"))
          .as("contaminated"))
  }

  /** Decontamination against a held-out "benchmark" slice (doc_id ≡ 0
    * mod 17 stands in for the eval suite; the operator does not care
    * where the benchmark table comes from). */
  val d15 = Q("d15_decontamination",
    s"""${Dedup.shingleCte},
       |bench AS (
       |  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 17 = 0
       |),
       |corpus AS (
       |  SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 17 <> 0
       |),
       |hits AS (
       |  SELECT c.doc_id, count(*) AS n_shared
       |  FROM corpus c JOIN bench b ON c.g = b.g GROUP BY c.doc_id
       |)
       |SELECT s.doc_id, coalesce(h.n_shared, 0) AS n_shared,
       |  len(s.s) AS n_shingles,
       |  coalesce(h.n_shared, 0) * 2 >= len(s.s) AS contaminated
       |FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
       |WHERE s.doc_id % 17 <> 0
       |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
    val base = Dedup.shingled(s, dir)
    decontaminate(base.filter(col("doc_id") % 17 =!= 0),
        base.filter(col("doc_id") % 17 === 0))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- d16

  /** Per-stratum sampling rates in thousandths (lang → ‰ kept). */
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 500, "es" -> 250, "de" -> 250, "fr" -> 100, "zh" -> 100)

  /** Deterministic stratified sampling: keep a document iff a mixed
    * integer hash of its id lands below the stratum's rate. Pure
    * map-side filter — zero shuffle, trivially resumable/repeatable
    * (no RNG state), and expressible identically in any engine, so
    * corpus membership is reproducible across reruns and systems.
    * The hash is a 32-bit LCG step mapped onto [0, 1000). */
  def stratifiedSample(docs: DataFrame, rates: Seq[(String, Int)]): DataFrame = {
    val bucket = expr(
      "((doc_id * 2654435761 + 1013904223) % 4294967296) * 1000 DIV 4294967296")
    val rate = rates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, r).otherwise(acc) }
    docs.withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select("doc_id", "lang", "bucket")
  }

  val d16 = Q("d16_stratified_sample",
    s"""SELECT doc_id, lang,
       |  ((doc_id * 2654435761 + 1013904223) % 4294967296) * 1000 // 4294967296
       |    AS bucket
       |FROM documents
       |WHERE ((doc_id * 2654435761 + 1013904223) % 4294967296) * 1000 // 4294967296
       |  < CASE lang ${SampleRates.map { case (l, r) =>
             s"WHEN '$l' THEN $r" }.mkString(" ")} ELSE 0 END
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    stratifiedSample(T.documents(s, dir), SampleRates).orderBy("doc_id")
  }

  // ---------------------------------------------------------------- d17

  /** Token-budget shard packing: documents are laid out in doc_id order
    * and cut into shards of ~`budget` tokens — shard_id = the doc's START
    * offset DIV budget, i.e. a document begins a new shard when the
    * running total crosses the budget (greedy contiguous packing, the
    * layout step before tokenize-and-concat in a training pipeline).
    *
    * The running total is a two-level distributed prefix sum, NOT a
    * global single-partition window: (1) a per-bucket cumulative sum
    * windowed by `doc_id DIV 4096` — parallel across buckets; (2) bucket
    * totals (one row per 4096 docs — 100 TB ⇒ ~10⁶ rows) prefix-summed
    * in one tiny task and broadcast back. */
  def packShards(docs: DataFrame, budget: Long,
      bucketSize: Long = 4096L): DataFrame = {
    val bucketed = docs.withColumn("bucket", expr(s"doc_id DIV $bucketSize"))
    val local = bucketed.withColumn("local_cum",
      sum("n_tokens").over(Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = bucketed.groupBy("bucket")
      .agg(sum("n_tokens").as("btot"))
      .withColumn("offset",
        coalesce(sum("btot").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    local.join(broadcast(offsets), "bucket")
      .withColumn("cum_tokens", col("local_cum") + col("offset"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum_tokens - n_tokens) DIV $budget").as("shard_id"))
  }

  val d17 = Q("d17_pack_shards",
    """WITH d AS (
      |  SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |  FROM documents
      |)
      |SELECT doc_id, n_tokens,
      |  CAST(sum(n_tokens) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_tokens,
      |  CAST((sum(n_tokens) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 2000
      |    AS BIGINT) AS shard_id
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    packShards(
      T.documents(s, dir).select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens")),
      budget = 2000L)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- d18

  /** Blocklisted terms for the scrub demo. The synthetic corpus is word
    * salad with no real PII (zero digit characters), so a term blocklist
    * stands in for the email/phone/SSN regex set — the pipeline shape
    * (tokenize → match → redact → count) is identical; swapping the
    * membership test for `rlike` patterns changes one expression. */
  val Blocklist: Seq[String] = Seq("customer", "vector", "stream")

  /** Scrub blocklisted tokens to a redaction marker and count them.
    * Pure per-row column program — no shuffle, whole-stage codegen;
    * the rebuild goes through the same tokenizer as every other text
    * operator so redaction is exact, not regex-boundary-dependent. */
  def scrub(docs: DataFrame, terms: Seq[String]): DataFrame = {
    docs.select(col("doc_id"),
      size(filter(toks(col("text")),
        t => t.isin(terms.map(lit(_)): _*))).as("n_redacted"),
      array_join(transform(toks(col("text")),
        t => when(t.isin(terms.map(lit(_)): _*), "[REDACTED]").otherwise(t)),
        " ").as("scrubbed"))
  }

  val d18 = Q("d18_blocklist_scrub",
    s"""SELECT doc_id,
       |  len(list_filter(string_split_regex(trim(text), '\\s+'),
       |    t -> t IN (${Blocklist.map(t => s"'$t'").mkString(", ")})))
       |    AS n_redacted,
       |  array_to_string(list_transform(string_split_regex(trim(text), '\\s+'),
       |    t -> CASE WHEN t IN (${Blocklist.map(t => s"'$t'").mkString(", ")})
       |         THEN '[REDACTED]' ELSE t END), ' ') AS scrubbed
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    scrub(T.documents(s, dir), Blocklist).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(d15, d16, d17, d18)
}
