package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the `documents` table — the BM25 / inverted-index
  * family a training-data pipeline needs next to the ANN one (corpus search,
  * benchmark-query mining, lexical near-dup triage). No reference analogue
  * (toncenter/ton-indexer has no text search); this extends the engine the
  * same way the e-family does for embeddings.
  *
  * Everything is oracle-exact: BM25's IDF uses the raw Robertson odds ratio
  * `(N - df + 0.5) / (df + 0.5)` WITHOUT the log — `ln` is the one BM25 term
  * that is not IEEE-exactly-rounded across engines (JVM `Math.log` intrinsic
  * vs DuckDB libm), while +,-,*,/ are. Rank order per query is unchanged for
  * single-term queries and near-identical otherwise; determinism is what
  * buys the hash-exact oracle. Both sides compute every float op in the
  * same literal order.
  *
  * Scale shapes (the two plans are the two real deployments):
  *  - [[bm25ScanTopK]] (t01): a FIXED small query set → per-row codegen
  *    scoring (tf per term via array filter, no explode), one tiny
  *    broadcast stats row, then a two-level top-k (local rank per hash
  *    bucket, then global) so no single task sees a whole query partition.
  *  - [[bm25PostingsTopK]] (t02): the inverted-index form for when queries
  *    are a TABLE — explode to postings, hash-aggregate (doc, term) tf
  *    map-side, broadcast the query terms and df sides, and make the
  *    per-(query, doc) score sum DETERMINISTIC with an ordered fold over
  *    `sort_array(collect_list(struct(term_idx, s)))` instead of an
  *    order-undefined double `sum()`.
  */
object Retrieval {

  /** Fixed query set: one rare+common pair (the corpus's only rare token is
    * 'dup', df≈5%), one 3-term, one 2-term. Term order is load-bearing (the
    * score sum folds in this order). */
  val queryTerms: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("dup", "join"),
    2 -> Seq("scan", "filter", "merge"),
    3 -> Seq("window", "stream"))

  private def toksOf(c: Column): Column = split(trim(c), "\\s+")

  /** One BM25 term score; every literal and parenthesis mirrored in the
    * oracle SQL: idf * ((tf*2.2) / (tf + 1.2*(0.25 + 0.75*dlr))). */
  private def termScore(t: String): Column = {
    val tf = col(s"tf_$t").cast("double")
    val idf = ((col("n_docs") - col(s"df_$t")).cast("double") + lit(0.5)) /
      (col(s"df_$t").cast("double") + lit(0.5))
    idf * ((tf * lit(2.2)) /
      (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dlr"))))
  }

  private def termScoreSql(t: String): String =
    s"""(CAST(n_docs - df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5)
       | * ((CAST(tf_$t AS DOUBLE) * 2.2)
       |    / (CAST(tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * dlr)))""".stripMargin

  /** Scan-scoring BM25 for a fixed literal query set: tf per term is a
    * per-row array-filter count (no explode, no postings shuffle), corpus
    * stats (N, Σdl, df per term) are ONE broadcast row, and the top-k is
    * two-level so the per-query partitions never concentrate the corpus
    * on 3 tasks at 100 TB. */
  def bm25ScanTopK(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int, buckets: Int = 16): DataFrame = {
    val terms = queries.flatMap(_._2).distinct
    val base = docs
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val withTf = terms.foldLeft(base) { (df, t) =>
      df.withColumn(s"tf_$t", size(filter(col("toks"), x => x === lit(t))))
    }.drop("toks")
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).as(s"df_$t"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored0 = withTf
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("dlr", col("dl").cast("double") / col("avgdl"))
    // one scan for ALL queries: the per-query score expressions ride one
    // exploded struct array instead of a unionAll of per-query branches,
    // each of which re-ran the full scan + tokenize + tf pass (3 passes
    // over the corpus → 1; same rows, same per-branch double arithmetic)
    val perQuery = scored0.select(col("doc_id"),
        explode(array(queries.map { case (qid, ts) =>
          struct(lit(qid).as("query_id"),
            ts.map(termScore).reduce(_ + _).as("score"))
        }: _*)).as("q"))
      .select(col("q.query_id").as("query_id"), col("doc_id"),
        col("q.score").as("score"))
      .filter(col("score") > 0)
    val wLocal = Window
      .partitionBy(col("query_id"), pmod(col("doc_id"), lit(buckets)))
      .orderBy(col("score").desc, col("doc_id"))
    val wGlobal = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    perQuery
      .withColumn("lrk", row_number().over(wLocal)).filter(col("lrk") <= k)
      .withColumn("n_rank", row_number().over(wGlobal))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "doc_id", "score")
  }

  /** Inverted-index BM25 for query-as-a-table workloads: postings =
    * explode → (doc, term) hash agg with map-side combine; df and the
    * query-term relation broadcast; the cross-term sum is an ORDERED fold
    * (term_idx-sorted collect_list) so the double addition order is fixed
    * — `sum()` over doubles would be plan-order-dependent and break both
    * the oracle and run-to-run determinism. */
  def bm25PostingsTopK(docs: DataFrame, queryDf: DataFrame, k: Int)
      : DataFrame = {
    val terms = queryDf.select("term").distinct()
    val posts = docs
      .select(col("doc_id"), size(toksOf(col("text"))).as("dl"),
        explode(toksOf(col("text"))).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfs = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs
      .select(size(toksOf(col("text"))).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = col("tf").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val s = idf * ((tf * lit(2.2)) /
      (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dlr"))))
    posts
      .join(broadcast(queryDf), "term")
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("dlr", col("dl").cast("double") / col("avgdl"))
      .withColumn("s", s)
      .groupBy("query_id", "doc_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("term_idx").as("i"),
          col("s").as("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score"))
      .withColumn("n_rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "doc_id", "score")
  }

  private def queryDf(s: SparkSession): DataFrame = {
    import s.implicits._
    queryTerms.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i, t) }
    }.toDF("query_id", "term_idx", "term")
  }

  private val allTerms = queryTerms.flatMap(_._2).distinct

  private def tfSql(t: String): String =
    s"len(list_filter(toks, x -> x = '$t')) AS tf_$t"

  private def scoreSumSql(ts: Seq[String]): String =
    ts.map(termScoreSql).mkString("\n   + ")

  val t01 = Q("t01_bm25_topk",
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, len(toks) AS dl,
       |    ${allTerms.map(tfSql).mkString(",\n    ")}
       |  FROM d),
       |st AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
       |    ${allTerms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n    ")}
       |  FROM f),
       |sc0 AS (
       |  SELECT f.*, st.*,
       |    CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
       |  FROM f, st),
       |sc AS (SELECT *, CAST(dl AS DOUBLE) / avgdl AS dlr FROM sc0),
       |scored AS (
       |  ${queryTerms.map { case (qid, ts) =>
      s"""SELECT $qid AS query_id, doc_id,
         |   ${scoreSumSql(ts)} AS score FROM sc""".stripMargin }
      .mkString("\n  UNION ALL\n  ")})
       |SELECT query_id, n_rank, doc_id, score FROM (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS n_rank
       |  FROM scored WHERE score > 0) t
       |WHERE n_rank <= 10 ORDER BY query_id, n_rank""".stripMargin) {
    (s, dir) =>
      bm25ScanTopK(T.documents(s, dir), queryTerms, 10)
        .orderBy("query_id", "n_rank")
  }

  val t02 = Q("t02_bm25_postings",
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |dl AS (SELECT doc_id, len(toks) AS dl FROM d),
       |tp AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM d)
       |  WHERE term IN (${allTerms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY doc_id, term),
       |dfs AS (SELECT term, count(*) AS df FROM tp GROUP BY term),
       |qt(query_id, term_idx, term) AS (VALUES
       |  ${queryTerms.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => s"($qid, $i, '$t')" }
    }.mkString(", ")}),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
       |sc0 AS (
       |  SELECT qt.query_id, qt.term_idx, tp.doc_id, tp.tf, dfs.df, dl.dl,
       |    st.n_docs, st.sum_dl,
       |    CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE) AS avgdl
       |  FROM tp JOIN qt USING (term) JOIN dfs USING (term)
       |    JOIN dl USING (doc_id), st),
       |sc1 AS (SELECT *, CAST(dl AS DOUBLE) / avgdl AS dlr FROM sc0),
       |sterm AS (
       |  SELECT query_id, term_idx, doc_id,
       |    (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)
       |    * ((CAST(tf AS DOUBLE) * 2.2)
       |       / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dlr))) AS s
       |  FROM sc1),
       |agg AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list(s ORDER BY term_idx), (a, b) -> a + b) AS score
       |  FROM sterm GROUP BY query_id, doc_id)
       |SELECT query_id, n_rank, doc_id, score FROM (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS n_rank
       |  FROM agg) t
       |WHERE n_rank <= 10 ORDER BY query_id, n_rank""".stripMargin) {
    (s, dir) =>
      bm25PostingsTopK(T.documents(s, dir), queryDf(s), 10)
        .orderBy("query_id", "n_rank")
  }

  /** Hybrid retrieval: fuse the BM25 ranking with an exact-cosine vector
    * ranking by reciprocal-rank fusion (Cormack et al. 2009: score =
    * Σ 1/(60 + rank)). RRF is the production hybrid-search default
    * precisely because it consumes RANKS, not scores — integers survive
    * any engine bit-for-bit, so the fused ranking is oracle-exact even
    * though the two source scores live on incomparable scales.
    *
    * Scale shape: each side is its own top-poolK (lexical: the t01 plan;
    * vector: brute-force here, swap in the IVF/LSH scan at corpus scale —
    * fusion only sees ranks, so the swap is free); the fusion join and
    * re-rank touch ≤ 2·poolK rows per query. */
  def hybridRrf(docs: DataFrame, emb: DataFrame,
      queries: Seq[(Int, Seq[String])], k: Int, poolK: Int): DataFrame = {
    val qids = queries.map(_._1)
    val lex = bm25ScanTopK(docs, queries, poolK)
      .select(col("query_id"), col("doc_id"), col("n_rank").as("lex_rank"))
    val qv = emb.filter(col("vec_id").isin(qids.map(Integer.valueOf): _*))
      .select(col("vec_id").cast("int").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val cv = emb.select(col("vec_id").as("doc_id"),
      transform(col("embedding"), x => x.cast("double")).as("cv"))
    val wVec = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("doc_id"))
    val vec = cv.crossJoin(broadcast(qv))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("sim", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("vec_rank", row_number().over(wVec))
      .filter(col("vec_rank") <= poolK)
      .select("query_id", "doc_id", "vec_rank")
    fuseRrf(lex, vec, k)
  }

  /** RRF fusion proper: consumes two (query_id, doc_id, *_rank)
    * relations — ANY ranker slots in (t03 brute-force cosine, t05
    * trained-IVF) without touching the fusion or its oracle shape. */
  def fuseRrf(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val wFused = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rank").cast("double")),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rank").cast("double")),
            lit(0.0)))
      .withColumn("n_rank", row_number().over(wFused))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "doc_id", "rrf", "lex_rank", "vec_rank")
  }

  val t03 = Q("t03_hybrid_rrf",
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, len(toks) AS dl,
       |    ${allTerms.map(tfSql).mkString(",\n    ")}
       |  FROM d),
       |st AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
       |    ${allTerms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n    ")}
       |  FROM f),
       |sc0 AS (
       |  SELECT f.*, st.*,
       |    CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
       |  FROM f, st),
       |sc AS (SELECT *, CAST(dl AS DOUBLE) / avgdl AS dlr FROM sc0),
       |scored AS (
       |  ${queryTerms.map { case (qid, ts) =>
      s"""SELECT $qid AS query_id, doc_id,
         |   ${scoreSumSql(ts)} AS score FROM sc""".stripMargin }
      .mkString("\n  UNION ALL\n  ")}),
       |lex AS (
       |  SELECT query_id, doc_id, n_rank AS lex_rank FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS n_rank
       |    FROM scored WHERE score > 0) t
       |  WHERE n_rank <= 20),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings),
       |vec AS (
       |  SELECT query_id, doc_id, n_rank AS vec_rank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id)
       |        AS n_rank
       |    FROM e q JOIN e c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id IN (${queryTerms.map(_._1).mkString(", ")})) t
       |  WHERE n_rank <= 20),
       |fused AS (
       |  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
       |    COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank,
       |    COALESCE(1.0 / (60.0 + CAST(lex_rank AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / (60.0 + CAST(vec_rank AS DOUBLE)), 0.0) AS rrf
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id)
       |SELECT query_id, n_rank, doc_id, rrf, lex_rank, vec_rank FROM (
       |  SELECT query_id, doc_id, rrf, lex_rank, vec_rank,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, doc_id) AS n_rank
       |  FROM fused) t
       |WHERE n_rank <= 10 ORDER BY query_id, n_rank""".stripMargin) {
    (s, dir) =>
      hybridRrf(T.documents(s, dir), T.embeddings(s, dir), queryTerms,
        10, 20).orderBy("query_id", "n_rank")
  }

  /** Positional (phrase/proximity) retrieval: for a two-term query, per
    * document compute the exact-adjacency phrase count and the minimum
    * token distance between the terms — the positional signals a lexical
    * engine layers over BM25. Entirely per-row higher-order column
    * programs on integer positions (positions ≈ tf per doc, so the
    * nested transform is tf² ≈ tens of ops — no explode, no shuffle
    * before the top-k), and integer outputs make the ranking
    * engine-exact. */
  def phraseProximityTopK(docs: DataFrame,
      pairs: Seq[(Int, String, String)], k: Int): DataFrame = {
    val base = docs.select(col("doc_id"), toksOf(col("text")).as("toks"))
    // positions via the indexed lambda — O(dl) per doc. The obvious
    // alternative (filter a 1..dl sequence probing element_at) is O(dl²)
    // per doc per term and measured 45 s at sf1 vs ~6 s for this form.
    def posOf(t: String): Column =
      filter(transform(col("toks"),
          (x, i) => when(x === lit(t), i + 1).otherwise(0)),
        p => p > 0)
    // one scan for ALL query pairs (same move as bm25ScanTopK): position
    // arrays for every pair ride one exploded struct array instead of a
    // unionAll that re-scanned and re-tokenized the corpus per pair
    val perQuery = base.select(col("doc_id"),
        explode(array(pairs.map { case (qid, a, b) =>
          struct(lit(qid).as("query_id"), posOf(a).as("pa"),
            posOf(b).as("pb"))
        }: _*)).as("q"))
      .filter(size(col("q.pa")) > 0 && size(col("q.pb")) > 0)
      .select(col("q.query_id").as("query_id"), col("doc_id"),
        size(filter(col("q.pa"),
          x => array_contains(col("q.pb"), x + 1))).as("phrase_tf"),
        array_min(flatten(transform(col("q.pa"),
          x => transform(col("q.pb"), y => abs(x - y))))).as("min_dist"))
    perQuery
      .withColumn("n_rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("phrase_tf").desc, col("min_dist"), col("doc_id"))))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "doc_id", "phrase_tf", "min_dist")
  }

  /** The two leading terms of each BM25 query as phrase pairs. */
  val phrasePairs: Seq[(Int, String, String)] =
    queryTerms.map { case (qid, ts) => (qid, ts.head, ts(1)) }

  val t04 = Q("t04_phrase_proximity",
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |scored AS (
       |  ${phrasePairs.map { case (qid, a, b) =>
      s"""SELECT $qid AS query_id, doc_id,
         |    len(list_filter(pa, x -> list_contains(pb, x + 1)))
         |      AS phrase_tf,
         |    list_min(flatten(list_transform(pa,
         |      x -> list_transform(pb, y -> abs(x - y))))) AS min_dist
         |  FROM (
         |    SELECT doc_id,
         |      list_filter(list_transform(toks,
         |        (x, i) -> CASE WHEN x = '$a' THEN i ELSE 0 END),
         |        p -> p > 0) AS pa,
         |      list_filter(list_transform(toks,
         |        (x, i) -> CASE WHEN x = '$b' THEN i ELSE 0 END),
         |        p -> p > 0) AS pb
         |    FROM d) t
         |  WHERE len(pa) > 0 AND len(pb) > 0""".stripMargin }
      .mkString("\n  UNION ALL\n  ")})
       |SELECT query_id, n_rank, doc_id, phrase_tf, min_dist FROM (
       |  SELECT query_id, doc_id, phrase_tf, min_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY phrase_tf DESC, min_dist, doc_id) AS n_rank
       |  FROM scored) t
       |WHERE n_rank <= 10 ORDER BY query_id, n_rank""".stripMargin) {
    (s, dir) =>
      phraseProximityTopK(T.documents(s, dir), phrasePairs, 10)
        .orderBy("query_id", "n_rank")
  }

  /** Hybrid fusion with the PRODUCTION vector leg: the trained-IVF
    * probe scan (e07's machinery — shared k-means silver, nProbe=2)
    * replaces t03's brute-force cosine. Because RRF consumes only
    * ranks, the swap changes nothing in the fusion — this query IS the
    * 100 TB shape, and diffing it against t03 shows exactly which fused
    * results the approximate leg moved (recall trade as data).
    * Oracle scale contract: like e07/e08/e09, the SQL embeds the
    * sf0.01-derived k-means snapshot, so the oracle is exact AT THE
    * GATE CORPUS (sf0.1+ would need that scale's snapshot). */
  val t05 = Q("t05_hybrid_ivf",
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, len(toks) AS dl,
       |    ${allTerms.map(tfSql).mkString(",\n    ")}
       |  FROM d),
       |st AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
       |    ${allTerms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n    ")}
       |  FROM f),
       |sc0 AS (
       |  SELECT f.*, st.*,
       |    CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
       |  FROM f, st),
       |sc AS (SELECT *, CAST(dl AS DOUBLE) / avgdl AS dlr FROM sc0),
       |scored AS (
       |  ${queryTerms.map { case (qid, ts) =>
      s"""SELECT $qid AS query_id, doc_id,
         |   ${scoreSumSql(ts)} AS score FROM sc""".stripMargin }
      .mkString("\n  UNION ALL\n  ")}),
       |lex AS (
       |  SELECT query_id, doc_id, n_rank AS lex_rank FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS n_rank
       |    FROM scored WHERE score > 0) t
       |  WHERE n_rank <= 20),
       |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings),
       |${Similarity.gateKmeansCentsSql},
       |kprobes AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS query_id, k.cluster,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, k.centroid) DESC,
       |                 k.cluster) AS crank
       |    FROM c q, pcents k
       |    WHERE q.vec_id IN (${queryTerms.map(_._1).mkString(", ")})) t
       |  WHERE crank <= 2),
       |vec AS (
       |  SELECT query_id, doc_id, n_rank AS vec_rank FROM (
       |    SELECT p.query_id, a.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY list_cosine_similarity(qc.v, a.v) DESC, a.vec_id)
       |        AS n_rank
       |    FROM kprobes p JOIN assign a ON a.cluster = p.cluster
       |    JOIN c qc ON qc.vec_id = p.query_id
       |    WHERE a.vec_id <> p.query_id) t
       |  WHERE n_rank <= 20),
       |fused AS (
       |  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
       |    COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank,
       |    COALESCE(1.0 / (60.0 + CAST(lex_rank AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / (60.0 + CAST(vec_rank AS DOUBLE)), 0.0) AS rrf
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id)
       |SELECT query_id, n_rank, doc_id, rrf, lex_rank, vec_rank FROM (
       |  SELECT query_id, doc_id, rrf, lex_rank, vec_rank,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, doc_id) AS n_rank
       |  FROM fused) t
       |WHERE n_rank <= 10 ORDER BY query_id, n_rank""".stripMargin) {
    (s, dir) =>
      val lex = bm25ScanTopK(T.documents(s, dir), queryTerms, 20)
        .select(col("query_id"), col("doc_id"),
          col("n_rank").as("lex_rank"))
      val qids = queryTerms.map(_._1)
      val vec = Similarity.trainedIvfTopK(s, dir,
          T.embeddings(s, dir)
            .filter(col("vec_id").isin(qids.map(Integer.valueOf): _*)), 20)
        .select(col("query_id").cast("int").as("query_id"),
          col("neighbor_id").as("doc_id"),
          col("n_rank").as("vec_rank"))
      fuseRrf(lex, vec, 10).orderBy("query_id", "n_rank")
  }

  val all: Seq[Q] = Seq(t01, t02, t03, t04, t05)
}
