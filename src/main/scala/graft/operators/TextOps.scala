package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting family a large-scale
  * training-data pipeline needs (builder brief; no reference analogue —
  * this extends the engine beyond toncenter/ton-indexer's surface).
  *
  * All are pure per-row column programs: no shuffle, fully pushed into
  * whole-stage codegen, trivially scalable to 100 TB (the only wide ops
  * are the final presentational ORDER BYs, which the oracle compare needs).
  */
object TextOps {

  /** Tokenizer shared by the pack: whitespace split of trimmed text.
    * DuckDB mirror: string_split_regex(trim(text), '\s+'). */
  private val toks = split(trim(col("text")), "\\s+")

  /** Token counting (whitespace tokenization). */
  val d01 = Q("d01_token_count",
    """SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |  length(text) AS n_chars_measured
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    T.documents(s, dir)
      .select(col("doc_id"), size(toks).as("n_tokens"),
        length(col("text")).as("n_chars_measured"))
      .orderBy("doc_id")
  }

  /** Quality scoring: stopword ratio + mean token length + length bucket.
    * The substring-count-by-replace trick is engine-portable and exact. */
  val d02 = Q("d02_quality_score",
    """SELECT doc_id,
      |  (length(text) - length(replace(text, 'the', ''))) // 3 AS n_the,
      |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |  cast((length(text) - length(replace(text, 'the', ''))) // 3 AS DOUBLE)
      |    / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio,
      |  CASE WHEN length(text) < 200 THEN 'short'
      |       WHEN length(text) < 400 THEN 'medium' ELSE 'long' END AS len_bucket
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val nThe = ((length(col("text")) -
      length(regexp_replace(col("text"), "the", ""))) / 3).cast("int")
    T.documents(s, dir)
      .select(col("doc_id"), nThe.as("n_the"), size(toks).as("n_tokens"),
        (nThe.cast("double") / size(toks)).as("stopword_ratio"),
        when(length(col("text")) < 200, "short")
          .when(length(col("text")) < 400, "medium")
          .otherwise("long").as("len_bucket"))
      .orderBy("doc_id")
  }

  /** Language ID by marker-word scoring (n-gram-heuristic shape): count a
    * distinctive marker per language, argmax with deterministic tie-break.
    * The corpus is synthetic word salad, so the markers are drawn from its
    * vocabulary — the operator shape (score → argmax) is what matters. */
  val d03 = Q("d03_lang_id",
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    (length(text) - length(replace(text, ' the ', ''))) // 5 AS s_en,
      |    (length(text) - length(replace(text, ' data ', ''))) // 6 AS s_es,
      |    (length(text) - length(replace(text, ' spark ', ''))) // 7 AS s_de,
      |    (length(text) - length(replace(text, ' join ', ''))) // 6 AS s_fr
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
      |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
      |FROM scored ORDER BY doc_id""".stripMargin) { (s, dir) =>
    def score(marker: String) =
      ((length(col("text")) - length(regexp_replace(col("text"),
        java.util.regex.Pattern.quote(marker), ""))) / marker.length).cast("int")
    T.documents(s, dir)
      .withColumn("s_en", score(" the "))
      .withColumn("s_es", score(" data "))
      .withColumn("s_de", score(" spark "))
      .withColumn("s_fr", score(" join "))
      .select(col("doc_id"), col("lang"),
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de")
          && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr").as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Content fingerprint (exact): md5 over UTF-8 bytes — the
    * document-identity hash used by exact dedup at scale. */
  val d04 = Q("d04_fingerprint",
    """SELECT doc_id, md5(text) AS fp FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    T.documents(s, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .orderBy("doc_id")
  }

  /** BPE-ish token counting: letter runs / digit runs / single symbols —
    * the pre-tokenizer split shape of byte-pair encoders. */
  val d05 = Q("d05_bpe_token_count",
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
      |    AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    T.documents(s, dir)
      .select(col("doc_id"),
        size(expr(
          """regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)"""))
          .as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- d25

  /** Per-language quality-score CALIBRATION: raw quality signals are not
    * comparable across languages (stopword ratios differ by language
    * structure), so production filters threshold on the score's
    * within-language percentile, not its raw value. Output per document:
    * the integer per-mille score, its dense 1-based rank within (lang)
    * by (score, doc_id), the per-mille percentile of that rank, and the
    * decile bucket — all integer math, bit-exact against the oracle.
    *
    * Scale shape: a per-LANGUAGE window is a skew trap (5 languages ⇒ 5
    * window partitions holding the whole corpus), so the rank is the
    * two-level decomposition: (1) docs-below = per-(lang, score) counts
    * running-summed over score — a ≤ |langs|·1001-row table at ANY
    * corpus size, broadcast; (2) the position among same-(lang, score)
    * docs = per-(lang, score, id-bucket) row_number plus broadcast
    * bucket offsets — the d17 prefix-sum shape. No corpus-wide window
    * partition anywhere. */
  def calibrateQuality(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nLang = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val below = docs.groupBy("lang", "score").agg(count(lit(1)).as("c"))
      .withColumn("n_below",
        coalesce(sum("c").over(Window.partitionBy("lang").orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("lang", "score", "n_below")
    val bucketed = docs.withColumn("bucket", expr("doc_id DIV 4096"))
    val local = bucketed.withColumn("pos",
      row_number().over(Window.partitionBy("lang", "score", "bucket")
        .orderBy("doc_id")))
    val boff = bucketed.groupBy("lang", "score", "bucket")
      .agg(count(lit(1)).as("bc"))
      .withColumn("boff",
        coalesce(sum("bc").over(Window.partitionBy("lang", "score")
          .orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("lang", "score", "bucket", "boff")
    local
      .join(broadcast(boff), Seq("lang", "score", "bucket"))
      .join(broadcast(below), Seq("lang", "score"))
      .join(broadcast(nLang), Seq("lang"))
      .withColumn("lang_rank", col("n_below") + col("boff") + col("pos"))
      .select(col("doc_id"), col("lang"), col("score"),
        col("lang_rank").cast("long").as("lang_rank"),
        expr("""CAST(CASE WHEN n_lang > 1
                  THEN (n_below + boff + pos - 1) * 1000 DIV (n_lang - 1)
                  ELSE 0 END AS BIGINT)""").as("pct_millis"),
        expr("CAST(least((n_below + boff + pos - 1) * 10 DIV n_lang, 9) AS BIGINT)")
          .as("decile"))
  }

  val d25 = Q("d25_quality_calibration",
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    ((length(text) - length(replace(text, 'the', ''))) // 3) * 1000
      |      // len(string_split_regex(trim(text), '\s+')) AS score
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, lang, score,
      |    row_number() OVER (PARTITION BY lang ORDER BY score, doc_id)
      |      AS lang_rank,
      |    count(*) OVER (PARTITION BY lang) AS n_lang
      |  FROM d
      |)
      |SELECT doc_id, lang, score, CAST(lang_rank AS BIGINT) AS lang_rank,
      |  CAST(CASE WHEN n_lang > 1
      |    THEN (lang_rank - 1) * 1000 // (n_lang - 1) ELSE 0 END AS BIGINT)
      |    AS pct_millis,
      |  CAST(least((lang_rank - 1) * 10 // n_lang, 9) AS BIGINT) AS decile
      |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val nThe = ((length(col("text")) -
      length(regexp_replace(col("text"), "the", ""))) / 3).cast("long")
    calibrateQuality(
      T.documents(s, dir).select(col("doc_id"), col("lang"),
        (nThe * 1000).cast("long").as("nt1000"),
        size(toks).cast("long").as("ntk"))
        .select(col("doc_id"), col("lang"),
          expr("nt1000 DIV ntk").as("score")))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(d01, d02, d03, d04, d05, d25)
}
