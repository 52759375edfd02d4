package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftFreshStats.{checkpointFresh, unpersistCheckpoints}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over the `embeddings` table (Array[Float], dim 64):
  * brute-force cosine top-k as the exact baseline, and two scale paths —
  * random-hyperplane LSH bucketing and an IVF-style partition search
  * keyed on the `label` cluster column.
  *
  * Scale design: the query set is broadcast (it is small by definition);
  * the corpus side is never shuffled for brute force — score+rank is a
  * map + per-query top-k (TakeOrdered shape). The LSH/IVF variants
  * turn the full scan into a bucket equi-join, which is the 100 TB path:
  * candidates shrink by ~bucket-count×, and the bucket keys are uniform
  * hashes so the join has no skew.
  */
object Similarity {

  /** Cast a float vector column to double for engine-stable arithmetic. */
  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Cosine similarity of two double-array columns — the native Catalyst
    * expression (fused single pass, whole-stage codegen). Numerically
    * identical to the compositional zip_with/aggregate form: same
    * left-to-right accumulation order. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine_sim(a, b)

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .withColumn("n_rank", row_number().over(w))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "neighbor_id")
  }

  /** Deterministic random hyperplanes: `tables` signature tables of
    * `bits` hyperplanes each, dim-dimensional, fixed seed. */
  private def planes(tables: Int, bits: Int, dim: Int): Seq[Seq[Array[Double]]] = {
    val rnd = new Random(20260812L)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Per-table LSH bucket keys: the native fused-pass expression packs
    * each table's hyperplane sign bits into one long; the bucket id is
    * (table << bits) | signWord — an 8-byte join key instead of a bit
    * string, computed without per-element lambda dispatch. */
  private def bucketsOf(v: Column, ps: Seq[Seq[Array[Double]]],
      bits: Int, dim: Int): Column = {
    val flat = ps.flatten.flatten.toArray
    val sigs = graft.functions.HashSketches.hyperplane_sig(
      v, flat, ps.size, bits, dim)
    transform(sigs, (sig, t) => shiftleft(t.cast("long"), bits) + sig)
  }

  /** ANN via multi-table hyperplane LSH: candidates = union over tables of
    * same-bucket vectors, then exact cosine re-rank, top-k per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 4, dim: Int = 64): DataFrame = {
    val ps = planes(tables, bits, dim)
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val cBuckets = c.select(col("neighbor_id"), col("cv"),
      explode(bucketsOf(col("cv"), ps, bits, dim)).as("bucket"))
    val qBuckets = q.select(col("query_id"), col("qv"),
      explode(bucketsOf(col("qv"), ps, bits, dim)).as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    cBuckets.join(broadcast(qBuckets), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()
      .withColumn("score", cosine(col("qv"), col("cv")))
      .withColumn("n_rank", row_number().over(w))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "neighbor_id")
  }

  /** IVF-style search: coarse quantizer = per-label centroid (the corpus
    * ships a cluster id); probe the nProbe nearest centroids, scan only
    * their partitions. NOTE: the synthetic corpus's labels are random, not
    * similarity clusters, so recall here is ~nProbe/K — on real data the
    * partition key would come from k-means and this is the 100 TB path
    * (scan nProbe/K of the corpus instead of all of it).
    *
    * Centroid direction = per-dimension SUM in Decimal, not a double avg:
    * cosine is scale-invariant (cos(q, Σv) == cos(q, v̄)), the decimal sum
    * is exact and order-independent (a parallel double sum is neither),
    * and the final decimal→double cast is correctly rounded on every
    * engine — so probe selection is deterministic and oracle-stable. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int = 2): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("label"),
      asDouble(col("embedding")).as("cv"))
    val centroids = c
      .select(col("label"), posexplode(col("cv")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(sum(col("x").cast("decimal(28,10)")).cast("double").as("x"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("i"), col("x")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p("x")).as("centroid"))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cscore").desc, col("label"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cscore", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select("query_id", "qv", "label")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    c.join(broadcast(probed), "label")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .withColumn("n_rank", row_number().over(w))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "neighbor_id")
  }

  // ------------------------------------------------------------- queries

  private def queriesOf(s: SparkSession, dir: String): DataFrame =
    T.embeddings(s, dir).filter(col("vec_id") < 8)

  /** The exact top-5 truth table, materialized once per (session, dir):
    * e01's own result AND the recall denominator every e08 leg compares
    * against — one brute-force scan instead of one per consumer. Ranks
    * and ids are integers, so the parquet round-trip is hash-exact. */
  /** Force-build every silver SHARED across e-family queries (each is
    * read by its own registered query AND by e08's recall rows). Called
    * from Bench's ingest phase so shared cost reports on the explicit
    * `ingest_silver` line instead of inflating whichever query runs
    * first — in the r11 driver round e08 absorbed ~55 s of builds that
    * belong to the ingest ledger. Verify is unaffected (silvers still
    * build lazily on first touch there). */
  /** The one-time ANN silver builds, NAMED so Bench can time each one
    * as its own ingest part (r13 verdict item 5 — the bundled `ann`
    * line hid which index build moved when training changed). Order
    * matters: `ann_kmeans_train` materializes the shared assignment
    * silver that `ann_ivf_kmeans` and the e09 semdedup silver read, so
    * the training pass and its consumers are attributed separately. */
  def sharedSilverParts: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "ann_truth" -> ((s, d) => { annTruthSilver(s, d).count(); () }),
    "ann_lsh" -> ((s, d) => { annLshSilver(s, d).count(); () }),
    "ann_ivf" -> ((s, d) => { annIvfLabelSilver(s, d).count(); () }),
    "ann_kmeans_train" ->
      ((s, d) => { kmeansAssignSilver(s, d).count(); () }),
    "ann_ivf_kmeans" -> ((s, d) => { annIvfKmeansSilver(s, d).count(); () }),
    "ann_quantize" -> ((s, d) => { annQuantSilver(s, d).count(); () }),
    "ann_exact_pairs" -> ((s, d) => { exactPairsSilver(s, d).count(); () }),
    "ann_semdedup" -> ((s, d) => { semdedupSilver(s, d).count(); () }))

  def buildSharedSilvers(s: SparkSession, dir: String): Unit =
    sharedSilverParts.foreach { case (_, f) => f(s, dir) }

  private def annTruthSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "ann_truth_top5") {
      bruteForceTopK(T.embeddings(s, dir), queriesOf(s, dir), 5)
    }

  /** Per-method ANN results, each materialized once per (session, dir)
    * and shared between its own registered query and e08's recall rows —
    * every column is integral, so the parquet round-trip is hash-exact
    * for the oracle gate. A production deployment persists exactly these
    * (the ANN index scan results ARE the serving tables); per-bench
    * recomputation measured the same constant twice. */
  private def annLshSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "ann_lsh_top5") {
      lshTopK(T.embeddings(s, dir), queriesOf(s, dir), 5)
    }

  private def annIvfLabelSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "ann_ivf_label_top5") {
      ivfTopK(T.embeddings(s, dir), queriesOf(s, dir), 5)
    }

  private def annIvfKmeansSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "ann_ivf_kmeans_top5") {
      val emb = T.embeddings(s, dir)
      val relabeled = emb.drop("label")
        .join(kmeansAssignSilver(s, dir)
          .withColumnRenamed("cluster", "label"), "vec_id")
      ivfTopK(relabeled, queriesOf(s, dir), 5)
    }

  private def annQuantSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "ann_quantized_top5") {
      quantizedTopKWith(quantizedSilver(s, dir), queriesOf(s, dir), 5)
    }

  private def semdedupSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "semdedup_canon") {
      semanticDedupProbed(T.embeddings(s, dir), dedupProbesSilver(s, dir),
        minCosine = 0.45)
    }

  /** The exact near-dup pair set on the e05 slice, materialized once per
    * (session, dir): e05's result and e08's near-dup/semdedup truth. */
  private def exactPairsSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "exact_pairs_2000_045") {
      exactPairsBuild(s, dir)
    }

  /** The pre-silver exact-pair computation — exposed so PlanSpec can
    * assert the broadcast shape of the BUILD (the registered query reads
    * the materialized table, whose plan is just a scan). */
  private[graft] def exactPairsBuild(s: SparkSession, dir: String): DataFrame = {
    val slice = T.embeddings(s, dir).filter(col("vec_id") < 2000)
      .select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val a = slice.select(col("vec_id").as("vec_a"), col("cv").as("cva"))
    val b = slice.select(col("vec_id").as("vec_b"), col("cv").as("cvb"))
    a.crossJoin(broadcast(b))
      .filter(col("vec_a") < col("vec_b"))
      .filter(cosine(col("cva"), col("cvb")) >= 0.45)
      .select("vec_a", "vec_b")
  }

  /** Brute-force exact cosine top-5 for 8 query vectors. Scores are
    * computed in double on both engines; ranks (not raw floats) are
    * compared, with neighbor_id tie-breaks. */
  val e01 = Q("e01_cosine_topk",
    """SELECT query_id, n_rank, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
      |               e.vec_id) AS n_rank
      |  FROM embeddings q, embeddings e
      |  WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
      |WHERE n_rank <= 5 ORDER BY query_id, n_rank""".stripMargin) { (s, dir) =>
    annTruthSilver(s, dir).orderBy("query_id", "n_rank")
  }

  /** Multi-table hyperplane-LSH ANN — oracle-exact: the hyperplanes are
    * deterministic constants, so the DuckDB mirror embeds all 8×4×64
    * plane weights as list literals, recomputes every sign bit with
    * `list_dot_product` (both engines accumulate the 64-term double dot
    * sequentially → identical IEEE result → identical sign), unions
    * same-bucket candidates across tables with one OR predicate, and
    * reranks by exact cosine. Recall vs e01 stays pinned by
    * SimilaritySpec. */
  /** DuckDB mirror of the `planes(8, 4, 64)` sign-bit signatures — the
    * 2048 plane weights embedded as list literals, one packed word per
    * table (`<prefix>0`..`<prefix>7`). Both engines accumulate the
    * 64-term double dot sequentially, so every sign matches bit-for-bit.
    * Shared by the e02 and e04 oracles (e04's adaptive nBits resolves
    * to 4 for corpora ≤ 2048 vectors — the gate runs 500, pinned by
    * OracleCapGuardSpec's sibling assumption checks). */
  private def sigSqlSelect(prefix: String): String =
    planes(8, 4, 64).zipWithIndex.map { case (tbl, t) =>
      tbl.zipWithIndex.map { case (plane, b) =>
        val lits = plane.map(java.lang.Double.toString).mkString(", ")
        s"(CASE WHEN list_dot_product(v, [$lits]) >= 0 THEN ${1 << b} ELSE 0 END)"
      }.mkString("(", " + ", s") AS $prefix$t")
    }.mkString(",\n    ")

  val e02 = Q("e02_ann_lsh", {
    def sigSelect(prefix: String): String = sigSqlSelect(prefix)
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sig AS (
       |  SELECT vec_id, v,
       |    ${sigSelect("s")}
       |  FROM c),
       |cand AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    q.v AS qv, e.v AS cv
       |  FROM sig q JOIN sig e
       |    ON (q.s0 = e.s0 OR q.s1 = e.s1 OR q.s2 = e.s2 OR q.s3 = e.s3
       |        OR q.s4 = e.s4 OR q.s5 = e.s5 OR q.s6 = e.s6 OR q.s7 = e.s7)
       |  WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id)
       |SELECT query_id, n_rank, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id)
       |      AS n_rank
       |  FROM cand) t
       |WHERE n_rank <= 5 ORDER BY query_id, n_rank""".stripMargin
  }) { (s, dir) =>
    annLshSilver(s, dir).orderBy("query_id", "n_rank")
  }

  /** IVF-style partition-probed ANN over the label clusters. Fully
    * deterministic (decimal-sum centroids, double cosine, unique
    * tie-breaks), so the whole probe-then-rank program is SQL-expressible
    * and oracle-checked — the DuckDB mirror recomputes centroids, probes
    * the top-2 labels, and ranks within the probed partitions. */
  val e03 = Q("e03_ann_ivf",
    """WITH dims AS (
      |  SELECT label, i,
      |    CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS c
      |  FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
      |          generate_subscripts(embedding, 1) AS i
      |        FROM embeddings) t
      |  GROUP BY label, i),
      |cents AS (
      |  SELECT label, list(c ORDER BY i) AS centroid FROM dims GROUP BY label),
      |probes AS (
      |  SELECT * FROM (
      |    SELECT q.vec_id AS query_id, c.label,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                        c.centroid) DESC,
      |                 c.label) AS crank
      |    FROM embeddings q, cents c WHERE q.vec_id < 8) p
      |  WHERE crank <= 2)
      |SELECT query_id, n_rank, neighbor_id FROM (
      |  SELECT p.query_id, e.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY p.query_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(e.embedding AS DOUBLE[])) DESC,
      |               e.vec_id) AS n_rank
      |  FROM probes p
      |  JOIN embeddings e ON e.label = p.label
      |  JOIN embeddings q ON q.vec_id = p.query_id
      |  WHERE e.vec_id <> p.query_id) t
      |WHERE n_rank <= 5 ORDER BY query_id, n_rank""".stripMargin) { (s, dir) =>
    annIvfLabelSilver(s, dir).orderBy("query_id", "n_rank")
  }

  /** Corpus-wide near-duplicate pairs above a cosine threshold: bucket by
    * LSH signature, generate pairs within buckets (no broadcast, no
    * quadratic scan — the 100 TB shape), verify with exact cosine.
    *
    * `bits = 0` (default) sizes the signature to the CORPUS: a fixed
    * bucket count makes in-bucket pair generation quadratic in corpus
    * size (an sf0.1→sf1 sweep measured 85× for 10× vectors at a pinned
    * bits=4), so the bucket count must grow with n — bits =
    * log2(n/128) targets ~128 vectors per bucket, which keeps the pair
    * stage linear at any scale. Wider signatures lower per-table
    * collision recall (p^bits, p = 1 − θ/π); for the near-dup regime
    * (cos ≥ 0.9, p ≈ 0.86) eight tables still catch ≥ 1 − (1−p^14)^8 ≈
    * 0.8 at billion-row bucket sizing — raise `tables` to buy recall
    * linearly, never the bucket width. */
  def nearDupPairs(corpus: DataFrame, minCosine: Double,
      tables: Int = 8, bits: Int = 0, dim: Int = 64): DataFrame = {
    val nBits =
      if (bits > 0) bits
      else math.max(4, (math.log(corpus.count().toDouble / 128.0) /
        math.log(2)).ceil.toInt)
    val ps = planes(tables, nBits, dim)
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val buckets = c.select(col("vec_id"), col("cv"),
      explode(bucketsOf(col("cv"), ps, nBits, dim)).as("bucket"))
      .groupBy("bucket")
      .agg(collect_list(struct(col("vec_id"), col("cv"))).as("xs"))
      .filter(size(col("xs")) > 1)
    // score and threshold INSIDE the bucket row, where both vectors are
    // local — the distinct then shuffles only surviving (vec_a, vec_b)
    // id pairs (16 bytes), not candidate pairs carrying two dim-sized
    // vectors each. A pair found in k bands is re-scored k times
    // (CPU-local) instead of shuffled k times — the right trade at scale.
    buckets
      .select(explode(expr(
        """flatten(transform(xs, a ->
             transform(filter(xs, b -> b.vec_id > a.vec_id),
                       b -> struct(a, b))))""")).as("p"))
      .filter(cosine(col("p.a.cv"), col("p.b.cv")) >= minCosine)
      .select(col("p.a.vec_id").as("vec_a"), col("p.b.vec_id").as("vec_b"))
      .distinct()
  }

  /** Embedding near-duplicate pairs (cosine ≥ 0.45 — calibrated to the
    * synthetic corpus, whose max pairwise cosine is ~0.51). Hyperplane-LSH
    * recall at this low a cosine is < 1 by design, but the whole pipeline
    * is DETERMINISTIC (fixed planes, exact-cosine verify), so the DuckDB
    * mirror recomputes the identical sign-bit signatures (same embedded
    * plane constants as e02 — the adaptive nBits resolves to 4 at any
    * corpus ≤ 2048 vectors, gate runs 500), unions same-bucket candidates
    * across tables with one OR predicate, and applies the same cosine
    * threshold — oracle-exact including every banding MISS. */
  val e04 = Q("e04_embed_neardup",
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sig AS (
       |  SELECT vec_id, v,
       |    ${sigSqlSelect("s")}
       |  FROM c)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |FROM sig a JOIN sig b
       |  ON a.vec_id < b.vec_id
       |  AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2 OR a.s3 = b.s3
       |       OR a.s4 = b.s4 OR a.s5 = b.s5 OR a.s6 = b.s6 OR a.s7 = b.s7)
       |WHERE list_cosine_similarity(a.v, b.v) >= 0.45
       |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
    nearDupPairs(T.embeddings(s, dir), 0.45).orderBy("vec_a", "vec_b")
  }

  /** Exact near-duplicate baseline over a bounded corpus slice
    * (vec_id < 2000 — the whole corpus at bench scale): all-pairs cosine
    * with one side broadcast. This is the exact counterpart of e04's LSH
    * path and the ground truth its recall is measured against; at 100 TB
    * the slice bound becomes a blocking key and e04 is the scale path. */
  val e05 = Q("e05_neardup_exact",
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |FROM embeddings a, embeddings b
      |WHERE a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000
      |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                             CAST(b.embedding AS DOUBLE[])) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
    exactPairsSilver(s, dir).orderBy("vec_a", "vec_b")
  }

  // --------------------------------------------------- k-means quantizer

  /** Deterministic distributed k-means (Lloyd, cosine assignment) — the
    * coarse-quantizer TRAINING step that turns ivfTopK from
    * "partition by whatever label the data came with" into a real IVF
    * index. Everything is order-independent: init takes the k smallest
    * vec_ids, assignment breaks score ties by cluster id, and new
    * centroids are per-dimension exact Decimal sums (cosine is
    * scale-invariant, so the un-normalized sum IS the centroid) — two
    * runs produce identical clusters on any partitioning.
    *
    * Scale: each iteration is one broadcast-join + one groupBy over
    * (cluster, dim) — the corpus is scanned, never shuffled by vector.
    * Centroids live in a DataFrame and reach the executors via
    * broadcast: for a 100-TB corpus the coarse book is k≈65k × dim
    * doubles ≈ 35 MB — broadcastable by design (IVF's whole point is a
    * small coarse book; a billion-centroid book would be a different
    * index). Iterations are a driver LOOP (k-means is inherently
    * round-synchronous), each materialized so lineage stays flat. */
  def kmeansAssign(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    // the registered paths (e07/e08/e09/t05 and their sf0.1
    // re-derivations) now train through the HASH sampler — the library
    // default users get (r15 verdict item 3). The committed sf0.01
    // oracle VALUES are sampler-agnostic (n=500 ≤ bound: both samplers
    // see the whole corpus — SimilaritySpec pins the coincidence); the
    // sf0.1 replicas (tools/derive_kmeans.py, patch_oracle_scale.py)
    // mirror the xxhash64 threshold bit-exactly, so the path the oracle
    // proves IS the production path at every recorded scale.
    kmeansAssignWith(corpus, kmeansTrain(corpus, k, iters))

  /** SAMPLE-TRAINED coarse-quantizer book (r12 verdict item 5): Lloyd
    * iterates over a bounded deterministic sample — the first
    * min(n, max(sampleN, 8k)) vectors by vec_id — instead of the full
    * corpus, the documented web-scale mitigation now built: training
    * cost is O(sample·k·iters) regardless of corpus size, and the full
    * corpus is touched exactly ONCE by the final assignment pass
    * ([[kmeansAssignWith]]). At the sf0.01 gate corpus (n=500 ≤ sample
    * bound) the sample IS the corpus, so the trained snapshot — and
    * every oracle that embeds it (e07/e08/e09/t05) — is unchanged from
    * the full-corpus trainer; SimilaritySpec pins that equivalence.
    *
    * Two deterministic samplers, `hashSample` selecting between them:
    *  - hash (DEFAULT — the production path, r14 verdict item 8):
    *    accept rows by xxhash64(vec_id) threshold sized to the corpus —
    *    content- and order-independent, ~bound rows in expectation at
    *    any id distribution (skewed, gappy, sparse), at the cost of one
    *    corpus count. When the corpus fits the bound, both samplers see
    *    the same rows and train the SAME book (SimilaritySpec pins it),
    *    which is why the gate snapshots are sampler-agnostic.
    *  - prefix (hashSample = false): vec_id < bound — a pure
    *    pushed-down filter, no pre-count. Kept as the cheap option for
    *    dense 0-based id spaces; since r16 the registered queries train
    *    through the hash default too ([[kmeansAssign]]), with the
    *    replicas (tools/derive_kmeans.py, patch_oracle_scale.py)
    *    mirroring the xxhash64 threshold bit-exactly (the Spark
    *    XxHash64 long path is a public, fixed algorithm).
    *
    * Returns the (cluster, centroid) book after iters-1 updates — the
    * book the final assignment pass scores against, identical to what
    * the previous full-loop implementation used for its last round. */
  def kmeansTrain(corpus: DataFrame, k: Int, iters: Int,
      sampleN: Int = 4096, hashSample: Boolean = true): DataFrame = {
    val bound = math.max(sampleN, 8 * k)
    val base = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val sampled =
      if (!hashSample) base.filter(col("vec_id") < bound)
      else {
        val n = corpus.count()
        if (n <= bound) base
        else base.filter(
          pmod(xxhash64(col("vec_id")), lit(1000000L)) <
            bound * 1000000L / n)
      }
    val c = checkpointFresh(sampled)
    val init = c.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("cv")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
    require(init.length == k,
      s"training sample (${init.length} rows under bound $bound) smaller " +
        s"than k=$k — widen sampleN")
    var cents = c.sparkSession.createDataFrame(
      c.sparkSession.sparkContext.parallelize(init.toSeq, 1)
        .map { case (i, v) => org.apache.spark.sql.Row(i, v) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    for (_ <- 0 until iters - 1) {
      val prevCents = cents
      // argmax via partial aggregate, not a window — kmeansAssignWith's
      // move applied to the training loop (cv rides the min struct;
      // (-score, cluster) is unique per vec_id so the array field is
      // never compared)
      val assign = checkpointFresh(c.crossJoin(broadcast(prevCents))
        .withColumn("score", cosine(col("cv"), col("centroid")))
        .groupBy("vec_id")
        .agg(min(struct(negate(col("score")).as("ns"),
          col("cluster").as("cluster"), col("cv").as("cv"))).as("best"))
        .select(col("best.cluster").as("cluster"), col("best.cv").as("cv")))
      unpersistCheckpoints(prevCents)
      cents = checkpointFresh(assign
        .select(col("cluster"), posexplode(col("cv")).as(Seq("i", "x")))
        .groupBy("cluster", "i")
        .agg(sum(col("x").cast("decimal(28,10)")).cast("double").as("x"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("i"), col("x")))).as("ps"))
        .select(col("cluster"),
          transform(col("ps"), p => p("x")).as("centroid")))
      // the new book is materialized; the round's assignment is dead
      unpersistCheckpoints(assign)
    }
    unpersistCheckpoints(c)
    val out = cents.localCheckpoint() // detach from the unpersisted chain
    unpersistCheckpoints(cents)
    out
  }

  /** The one full-corpus pass: nearest-centroid assignment against a
    * broadcast book — embarrassingly parallel, corpus never shuffled
    * (the irreducible O(n·k) scan every IVF/SemDeDup index pays).
    *
    * Argmax as a PARTIAL AGGREGATE, not a window (r16, guide §2.3): a
    * Window.partitionBy(vec_id) shuffles all n·k scored candidate rows
    * and sorts them per vector; min(struct(-score, cluster)) reduces
    * each vector's k candidates to one row MAP-SIDE (the broadcast
    * cross join keeps a vector's candidates in its own partition), so
    * only n narrow rows cross the exchange. Identical selection: the
    * struct order (-score asc, cluster asc) is exactly (score desc,
    * cluster asc), double negation is exact, and Spark's double
    * ordering treats -0.0 < 0.0 consistently on both paths.
    *
    * PRECONDITION (r16 advisor): scores must be NaN-free — under a NaN
    * score the two forms diverge (NaN sorts GREATEST, so a window on
    * score desc would pick it first while min(-score) picks it last).
    * Holds here unconditionally: cosine (CosineExpr) guards the
    * zero-denominator case and the embeddings fixtures are finite
    * doubles, so no score is ever NaN; a corpus with non-finite
    * embedding values must sanitize them upstream of every index
    * operator, not just this one. */
  def kmeansAssignWith(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
      .crossJoin(broadcast(cents))
      .withColumn("score", cosine(col("cv"), col("centroid")))
      .groupBy("vec_id")
      .agg(min(struct(negate(col("score")).as("ns"),
        col("cluster").as("cluster"))).as("best"))
      .select(col("vec_id"), col("best.cluster").as("cluster"))

  /** The 8×3 trained quantizer assignment over the gate corpus,
    * materialized ONCE per (session, dir): e07 (IVF) and e09 (semantic
    * dedup) share the same coarse book, exactly as a production corpus
    * trains its quantizer once and serves every consumer from the
    * persisted assignment. */
  /** Trained-quantizer IVF scan for arbitrary query sets — the e07
    * machinery (shared k-means assignment silver + decimal-sum
    * centroids) exposed for composites like the t05 hybrid fusion. */
  def trainedIvfTopK(s: SparkSession, dir: String, queries: DataFrame,
      k: Int): DataFrame = {
    val relabeled = T.embeddings(s, dir).drop("label")
      .join(kmeansAssignSilver(s, dir)
        .withColumnRenamed("cluster", "label"), "vec_id")
    ivfTopK(relabeled, queries, k)
  }

  private def kmeansAssignSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "kmeans_assign_8x3") {
      kmeansAssign(T.embeddings(s, dir), k = 8, iters = 3)
    }

  /** IVF probing COMPOSED with the int8 code scan — the 100 TB serving
    * shape: probe the nProbe nearest coarse centroids (full-precision,
    * decimal-sum deterministic, exactly ivfTopK's probe), then rank
    * ONLY the probed partitions by exact integer dot over the persisted
    * int8 codes — nProbe/K of the corpus touched, at 4× fewer bytes per
    * vector than float32. Both stages are deterministic, so the whole
    * composite is SQL-expressible and oracle-checked (e10). */
  def ivfQuantizedTopK(corpus: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("label"),
      asDouble(col("embedding")).as("cv"))
    val centroids = c
      .select(col("label"), posexplode(col("cv")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(sum(col("x").cast("decimal(28,10)")).cast("double").as("x"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("i"), col("x")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p("x")).as("centroid"))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"),
      quantize(asDouble(col("embedding"))).as("qq"),
      scaleOf(asDouble(col("embedding"))).as("qs"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cscore").desc, col("label"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cscore", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select("query_id", "qq", "qs", "label")
    val labeled = codes.join(
      corpus.select(col("vec_id").as("neighbor_id"), col("label")),
      "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    labeled.join(broadcast(probed), "label")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("int_dot", intDot(col("cq"), col("qq")))
      .withColumn("score", col("int_dot") * col("cs") * col("qs"))
      .withColumn("n_rank", row_number().over(w))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "neighbor_id", "int_dot")
  }

  /** IVF(label) + int8 code scan, oracle-exact: the DuckDB mirror
    * recomputes the decimal-sum centroids (e03's CTE), requantizes
    * (e06's CTE), probes the top-2 labels and ranks by integer dot
    * within the probed partitions. */
  val e10 = Q("e10_ann_ivf_quantized",
    """WITH dims AS (
      |  SELECT label, i,
      |    CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS c
      |  FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
      |          generate_subscripts(embedding, 1) AS i
      |        FROM embeddings) t
      |  GROUP BY label, i),
      |cents AS (
      |  SELECT label, list(c ORDER BY i) AS centroid FROM dims GROUP BY label),
      |probes AS (
      |  SELECT * FROM (
      |    SELECT q.vec_id AS query_id, c.label,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                        c.centroid) DESC,
      |                 c.label) AS crank
      |    FROM embeddings q, cents c WHERE q.vec_id < 8) p
      |  WHERE crank <= 2),
      |qv AS (
      |  SELECT vec_id, label,
      |    greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> abs(x))), 1e-30) / 127 AS s,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> floor(x / (greatest(list_max(list_transform(
      |        CAST(embedding AS DOUBLE[]), y -> abs(y))), 1e-30) / 127)
      |        + 0.5)) AS q
      |  FROM embeddings)
      |SELECT query_id, n_rank, neighbor_id, int_dot FROM (
      |  SELECT p.query_id, e.vec_id AS neighbor_id,
      |    CAST(list_dot_product(qq.q, e.q) AS BIGINT) AS int_dot,
      |    row_number() OVER (PARTITION BY p.query_id
      |      ORDER BY list_dot_product(qq.q, e.q) * e.s * qq.s DESC,
      |               e.vec_id) AS n_rank
      |  FROM probes p
      |  JOIN qv e ON e.label = p.label
      |  JOIN qv qq ON qq.vec_id = p.query_id
      |  WHERE e.vec_id <> p.query_id) t
      |WHERE n_rank <= 5 ORDER BY query_id, n_rank""".stripMargin) { (s, dir) =>
    graft.plans.SilverStore.table(s, dir, "ann_ivf_quantized_top5") {
      ivfQuantizedTopK(T.embeddings(s, dir), quantizedSilver(s, dir),
        queriesOf(s, dir), 5)
    }.orderBy("query_id", "n_rank")
  }

  /** The k-means snapshot that produced the gate corpus's final
    * assignment (centroids after two Lloyd updates), RE-DERIVED by an
    * independent plain-Python replica of the training loop (same
    * first-8 init, sequential-double cosine, decimal(28,10) half-up
    * sums) — not read back from the engine. Shared by the e07 and e09
    * oracles, which recompute assignment / probe book / probes / pairs
    * from it in pure SQL. Gate-corpus fixture, like d21/d27. */
  /** The gate snapshot's VALUES rows, shared by every book
    * instantiation; re-derived independently by tools/derive_kmeans.py
    * (bit-identical replica of the training loop). */
  private[operators] val gateKmeansRows: String =
    """  (0, [0.9360349355, -0.6114126122, 1.5805006658, -4.9146270851, 1.1040014253, -0.8657892853, -0.5169951985, 0.8476864698, 2.6286270587, -1.531626466, -0.3748599586, -0.1632450112, -1.9846122531, 0.0946878997, -0.4182212395, 0.075519233, 2.2948673913, 2.1221097316, 1.5383225352, 1.7593744344, -3.3665227261, 0.6266090727, -0.4629455042, -0.7238835444, 0.4058940447, 4.6770519644, 4.037820573, -0.2963702009, -1.2156546684, 3.3283148135, -0.7273127931, 3.6398631417, 0.1772991704, -2.6882500787, 0.9187568915, -2.8952277592, -0.6710692708, 0.3571531125, 0.7075018671, 0.5799332512, -0.069054826, 0.1596998935, -0.0212070955, 0.0946896069, 0.5805483788, 1.2350665853, 1.6770922467, -2.9561828656, 0.9724386322, -1.9586160826, 0.0546975241, 0.6479263614, 0.6023659376, -3.0175690481, 1.6362866017, 0.2508204048, -1.087320582, 0.4658641126, -2.5902983226, -1.5364553073, -0.5576365465, 1.5718542542, 2.0232032605, -2.67079559]),
      |  (1, [-1.150803794, -0.880336897, 0.0276532552, 0.1043944099, 0.0519283512, 1.7909676809, -5.4567478813, -0.8692347468, 0.0967980781, 0.4006045861, -3.3996070284, 2.7289332618, 3.9448823147, -4.2054885823, 2.1346700901, 0.1180477681, -0.0673056859, -0.6852271261, 1.9759987873, -2.974103757, 1.352510474, 1.8410362069, 0.4285351738, -2.3002656907, 2.1950388925, 3.6464967803, -0.9710631907, -1.6805831612, -1.0416540759, 1.4899221278, -1.4568111125, 0.5497903564, -0.3444339055, -0.3471158327, 0.4773893815, 0.151620241, -2.7976706377, 0.0738974748, 0.9004891772, -4.4088833759, -0.0106157612, -2.619022553, 1.8694005358, 1.1079401497, 1.5229926879, 0.8576541712, -1.8367924306, -0.484979851, -3.5790310227, -5.5436413072, -0.7278352969, 0.0898853479, -0.0190285398, 0.695612134, -1.2079052189, 2.6484688944, 2.4570122874, 0.1406425265, 2.3971162721, 0.837387255, -1.6901454733, -0.1267535906, -2.5051356268, -1.2043247597]),
      |  (2, [0.0150665901, 0.0934538947, -2.5488769231, 2.7678947378, 2.4084799539, -0.3095979437, -0.6140942124, 0.7382488084, -0.0390652535, -4.1970126063, -1.2948675669, -1.0799602893, -3.3490496206, 2.9478739802, 0.4235553114, 1.2422548933, -1.8005358778, 2.5567552444, -0.9559418671, -1.4793833999, 0.5152663447, -0.1568495557, 3.5425749089, -0.7953486928, 0.1114120413, -2.2456284274, -0.2720397482, 0.0003840225, 1.0708853813, 0.7561389738, -0.8807087073, -4.5151725562, 0.896199865, 0.2615665774, 0.5021355628, 0.2205062509, 1.1212335674, 3.594344977, 2.848754204, 2.8766083338, 0.0517284087, -0.594928615, 1.7684964209, 0.7867313524, -0.9271945165, -0.4777540664, -1.0200292651, -0.7118809471, 3.0524337794, 2.3641990943, 2.666206497, -3.2959971097, -0.6637426821, -2.195067761, 3.0523473353, 0.5204450321, 1.1142393195, -1.0234490994, 0.4332765016, 2.4634814517, 2.2761900273, 0.2375542488, 0.7265933511, 0.8638609915]),
      |  (3, [-1.9755098891, 2.4216360492, -0.3599034089, -0.3839707202, -0.6649842074, 0.8206217536, 1.5250682496, 0.6216186094, -2.1374308695, 0.364833435, -0.2478963196, 2.3232060314, 0.9033022481, 5.7426654328, 0.7662757068, 0.0195464013, -2.4285273583, -3.1331750766, 0.6979689471, 1.8948095896, 0.1689687458, -0.1645743653, -1.3593701554, 1.1681177705, -1.1771699933, 1.4537042086, -1.1207965582, -1.1341261003, -3.7295075892, -2.8696571313, -0.464602912, -1.1906526782, 4.676190604, 0.071462189, -0.2303166236, -0.9056877695, 0.6142013424, -1.698892044, -1.7829716913, -1.6648991214, -0.2362656348, -1.6822564737, -4.3568803535, -1.5581894044, -0.0317547193, 0.5134409319, -1.0788237782, -2.0302322391, 4.2758954631, -2.9950840233, 0.4381462619, -0.7230130409, 0.6735834608, 1.4661672425, -2.7041472812, -2.3309888716, 1.1489432628, -0.374315769, 1.4073593389, -3.0636778467, 1.3839707021, 0.1440784176, -0.3806827311, -3.3960823425]),
      |  (4, [1.2029934207, 0.2708192873, 3.1132755111, -1.3113443728, -2.1244226323, -3.9869951988, 2.0300756133, 0.3357377989, 0.6065918897, 0.8883146867, 0.8244837537, -3.1798783615, 1.442907395, -2.6692518918, 0.9708137943, -1.526665898, 2.393715945, 0.883483684, 0.2147887706, 1.0821277334, -0.438397786, 1.8832153992, -1.0697851543, 0.8699310841, -1.2437050099, -0.0180017397, 1.2799199663, -0.2198893798, 1.8619435503, -2.6881126408, 1.8362658735, -1.4784719519, 0.9295265743, 1.0104252583, 1.5856769319, -3.2638708412, 0.4580838869, -3.5165410921, -1.4472940177, 0.3190829001, 1.3328608833, -0.0482539339, -1.0073246891, 0.0445689453, -1.2766894418, -0.1946681196, -2.3874932895, 3.1712387483, -2.2584522427, -0.3395908202, -0.5620750859, -0.1471110856, 0.9755778629, 0.5638207466, 4.2207230061, -0.9638645075, 0.2823299908, -1.3144990093, 1.4058448605, -0.540497515, -3.0161117801, -0.1459579177, 1.8369929736, 0.294838912]),
      |  (5, [-1.8088420898, -1.461705086, 2.57241849, 0.2309065326, 3.902351056, -0.6234815288, -3.5344620263, 3.6722956839, -1.3482484502, 1.1489224417, 2.4365272272, -0.8406729364, 0.6832312825, 0.71938857, -1.5280941819, 0.0362155963, 0.2550203817, -3.1242943638, -0.8174541981, 2.5472082056, 0.7570085639, -1.2893984579, 1.9765375708, -0.7224064619, 1.8150334297, 2.2822020925, -1.2799671788, 0.9944727656, 0.7227662574, 1.4035768632, 1.0335467332, -2.371356927, 0.1835339204, -0.3216352844, 0.1870820467, 3.340516695, 0.9446369066, 3.9324358035, -1.8661698599, 0.8139908781, -3.6165768952, 3.5715813294, 0.3318285217, 1.5586618147, -5.3261535055, -3.1638017019, 0.9947793549, -1.7538903191, -1.100773579, 1.320692574, 2.6735639315, 2.8993965021, 0.3391890567, 2.4648906241, -2.3869372463, -5.0119244738, 1.6783428993, -2.8028307415, 0.35025805, 0.1554064678, 0.0376728695, 2.8177807701, -2.5851144, 2.2001742235]),
      |  (6, [-1.6850868656, -2.4639594239, -0.2576406837, -1.6084660832, 1.989154204, 5.0689878755, -1.7753491581, -3.5809673135, -0.0022271954, 3.837782666, 3.5897670002, 0.7868398618, 0.9791368497, 2.7189448501, -1.1205769187, 2.6602015974, 1.6657668969, 3.5273258765, -3.3455221037, -2.875016375, 0.326038381, -1.5315263878, -0.7625389378, -3.4315929532, -2.9951261065, -0.9380479702, -0.5342985178, 3.4385130834, 2.2462039697, -3.1152909206, -0.3698679748, 0.4010122278, -0.6798705029, -2.4890717172, -1.3194026567, 3.353281974, 1.3357427193, -0.7666740395, -0.3247259933, -0.3443972879, 3.2203522179, -3.3292113428, -0.1465214402, -1.3223263764, 0.181051384, 0.9484237262, 2.2488431637, 3.1819836463, 0.2632642402, 1.2567048296, -2.2155691891, 0.5887330727, 2.7957692094, -0.9135112171, 1.317871464, 2.3240414441, -3.8995330386, 3.3504257665, -1.8357646605, -1.8661718765, 1.0685620941, -0.5757413992, -0.2815087272, 1.3572436334]),
      |  (7, [5.5485026186, 0.357607612, -2.1623497148, 2.7186120519, -1.694969918, 1.9915531226, -0.7731732331, 2.8432922342, -1.0187469645, -1.2207583061, 1.6844919269, 1.1017838347, -3.9492438639, -4.3218044079, -1.335705678, 0.3300050304, -0.6458913598, 0.7660828687, 0.4612009444, 0.660841328, -1.2344415192, -0.0574198791, -0.2088753467, 1.9081554269, -0.0569600289, -2.4537055711, -1.9381078235, 4.2107623814, -0.4916211124, 1.8902906003, 3.8318516333, 2.0686456066, -1.6707956056, 1.1649289682, 0.4564923412, 0.5874509114, -3.6728242859, -2.7726224783, 0.4810654756, 1.258073455, -1.5445341464, -1.3746656862, 1.7189671994, -0.9936545714, -0.4830812807, 2.1979452272, 1.1033938445, 4.529092922, -3.5006058521, 0.7631334271, 2.3614415902, -0.8008161418, -0.8186929583, -1.023124362, -1.5733473533, 0.7743563623, 0.6929192848, 0.3229802624, -3.9900494925, -0.8100631071, 0.35691526, -1.4207224299, 0.5861206017, -4.0780263326])""".stripMargin

  /** One k-means snapshot CTE chain (cents/assign/dims/pcents), CTE
    * names prefixed with `p` so one oracle program can instantiate TWO
    * independently-sized books (e08 needs the 8x3 IVF book AND the
    * adaptiveK dedup book - identical at the gate corpus, different at
    * sf0.1+, which is what lets tools/patch_oracle_scale.py substitute
    * each block independently for larger-scale oracle runs). */
  private[operators] def kmeansSnapshotSql(p: String, rows: String): String =
    s"""${p}cents AS (SELECT * FROM (VALUES
      |$rows
      |) t(cluster, centroid)),
      |${p}assign AS (
      |  SELECT vec_id, v, cluster FROM (
      |    SELECT c.vec_id, c.v, k.cluster,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(c.v, k.centroid) DESC,
      |                 k.cluster) AS r
      |    FROM c, ${p}cents k) t WHERE r = 1),
      |${p}dims AS (
      |  SELECT cluster, i, CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE)
      |    AS cx
      |  FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS i
      |        FROM ${p}assign) t
      |  GROUP BY cluster, i),
      |${p}pcents AS (
      |  SELECT cluster, list(cx ORDER BY i) AS centroid
      |  FROM ${p}dims GROUP BY cluster)""".stripMargin

  private[operators] val gateKmeansCentsSql: String =
    kmeansSnapshotSql("", gateKmeansRows)

  /** Trained-quantizer IVF — oracle-exact via the independently derived
    * [[gateKmeansCentsSql]] snapshot: the oracle recomputes ASSIGNMENT,
    * probe centroids (decimal sums), 2-probe selection and the exact
    * rerank entirely in SQL, so a divergence anywhere in the k-means
    * loop, the relabel join, or the probe path fails the hash. */
  val e07 = Q("e07_ann_ivf_kmeans",
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$gateKmeansCentsSql,
       |probes AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS query_id, k.cluster,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, k.centroid) DESC,
       |                 k.cluster) AS crank
       |    FROM c q, pcents k WHERE q.vec_id < 8) t WHERE crank <= 2)
       |SELECT query_id, n_rank, neighbor_id FROM (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY list_cosine_similarity(qc.v, a.v) DESC, a.vec_id)
       |      AS n_rank
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  JOIN c qc ON qc.vec_id = p.query_id
       |  WHERE a.vec_id <> p.query_id) t WHERE n_rank <= 5
       |ORDER BY query_id, n_rank""".stripMargin) { (s, dir) =>
    annIvfKmeansSilver(s, dir).orderBy("query_id", "n_rank")
  }

  // ------------------------------------------------- int8 quantized scan

  /** Per-vector symmetric int8 quantization: scale s = max|x|/127,
    * q_i = floor(x_i/s + 0.5) ∈ [-127, 127]. floor(.. + 0.5) instead of
    * round(): IEEE divide/add/floor are bit-identical on every engine,
    * while round() half-cases differ (Java half-up vs DuckDB
    * half-away) — so quantized vectors, integer dots, and therefore
    * RANKS reproduce exactly everywhere. */
  private def quantize(v: Column): Column = {
    val s = scaleOf(v)
    transform(v, x => floor(x / s + 0.5d).cast("long"))
  }

  private def scaleOf(v: Column): Column =
    greatest(array_max(transform(v, abs(_))), lit(1e-30d)) / 127d

  /** Integer dot product of two quantized vectors — exact int64 math. */
  private def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Top-k by int8-quantized cosine: score = intDot(qa, qb)·sa·sb (the
    * norms are constants per ranking and cancel). This is the
    * memory-bandwidth scale path of the e-family: a 100 TB float32
    * corpus becomes 25 TB of int8 codes, the scan's inner loop is
    * integer multiply-add (SIMD-friendly, 4× fewer bytes moved), and
    * exact re-ranking of the short candidate list — bruteForceTopK over
    * k·few rows — happens after, reading full-precision vectors for
    * ~k rows per query instead of the whole corpus. Corpus is never
    * shuffled: quantization is a column program on the scan, queries
    * broadcast. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    quantizedTopKWith(quantizeCorpus(corpus), queries, k)

  /** (vec_id, embedding) → (neighbor_id, cq, cs): the int8 code table.
    * Materialized once per (session, dir) by `quantizedSilver` — the
    * codes ARE the silver a production deployment scans (4× fewer
    * bytes than float32); re-quantizing per query would re-read the
    * full-precision corpus every time. Parquet round-trips the codes
    * exactly (int64 arrays + IEEE doubles), so the oracle hash is
    * unchanged between the inline and materialized forms. */
  def quantizeCorpus(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id").as("neighbor_id"),
      quantize(asDouble(col("embedding"))).as("cq"),
      scaleOf(asDouble(col("embedding"))).as("cs"))

  private def quantizedSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "embeddings_int8") {
      quantizeCorpus(T.embeddings(s, dir))
    }

  /** Core scan over a PRE-QUANTIZED (neighbor_id, cq, cs) code table. */
  def quantizedTopKWith(c: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      quantize(asDouble(col("embedding"))).as("qq"),
      scaleOf(asDouble(col("embedding"))).as("qs"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("int_dot", intDot(col("cq"), col("qq")))
      .withColumn("score", col("int_dot") * col("cs") * col("qs"))
      .withColumn("n_rank", row_number().over(w))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "neighbor_id", "int_dot")
  }

  /** Quantized-scan ANN, oracle-exact: the DuckDB mirror requantizes and
    * ranks identically (integer dots ≤ 64·127² are exact in its double
    * list_dot_product), so ranks AND raw integer dots hash-compare. */
  val e06 = Q("e06_ann_quantized",
    """WITH qv AS (
      |  SELECT vec_id,
      |    greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> abs(x))), 1e-30) / 127 AS s,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> floor(x / (greatest(list_max(list_transform(
      |        CAST(embedding AS DOUBLE[]), y -> abs(y))), 1e-30) / 127)
      |        + 0.5)) AS q
      |  FROM embeddings)
      |SELECT query_id, n_rank, neighbor_id, int_dot FROM (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    CAST(list_dot_product(q.q, e.q) AS BIGINT) AS int_dot,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_dot_product(q.q, e.q) * e.s * q.s DESC,
      |               e.vec_id) AS n_rank
      |  FROM qv q, qv e
      |  WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
      |WHERE n_rank <= 5 ORDER BY query_id, n_rank""".stripMargin) { (s, dir) =>
    annQuantSilver(s, dir).orderBy("query_id", "n_rank")
  }

  /** The 16 PCA projection rows the trained-rerank audit leg uses,
    * RE-DERIVED by a line-by-line Python port of [[jacobiEig]] +
    * [[trainedRotation]] (same sequential float ops, same sign fix) —
    * bit-identical to the engine's rotation, independently produced.
    * Gate-corpus fixture like the k-means snapshot. */
  private val gateRerankProjSql: String =
    """[list_dot_product(v, [-0.2096393298887029, -0.12057271530460328, 0.03654785829099375, 0.01181956705207999, 0.07567008221654345, 0.013214628527288186, 0.09058411826856812, 0.2866187923432374, 0.04954696200812782, 0.4140565265568779, 0.0653049813495429, 0.18207885414308053, 0.06513224154456904, -0.03653205454058415, 0.17114897511870436, -0.18534977721254273, 0.08898987401709364, -0.1570265554534968, -0.030136686338868745, 0.03217896964106663, 0.06121320421931407, -0.11068832310461507, -0.08347512790974954, -0.05543746810299688, 0.01955001247293548, 0.199125429101352, -0.03751725273394648, 0.14950769890198098, -0.1728796307730548, -0.0061231136919325056, -0.05871572670446115, 0.06203771800325117, 0.29653854323357254, 0.10616457886972945, -0.03204193889844021, 0.10414385120144753, 0.04453875945639852, 0.06146405307635499, 0.013006697593051642, 0.0217712055199728, -0.11667898800999403, 0.0055245863932987666, -0.24083692018991473, 0.09570759089248622, -0.02830770871376086, -0.22512744449721753, 0.00873183574219243, -0.07903750844473234, -0.08368084425577953, -0.1184509112478963, 0.12045949856582461, 0.07248325171851451, -0.017186482327944893, 0.0816043743090242, -0.015031356046457896, -0.06676477470729585, -0.05565063579441348, -0.05137605787848301, 0.0601960176213444, -0.09113914308767156, 0.121986995952936, 0.05064983370857072, -0.21821146481626008, -0.10201388625038872]),
      |      list_dot_product(v, [-0.0038371279617273185, -0.0544302462823619, -0.012567933982260658, -0.08813365806325192, 0.17485769809344773, 0.02521436661842459, 0.07494656315169955, -0.06998070122115854, 0.07744817056372585, 0.0306960564936196, 0.10575814447888733, -0.017882871949512658, 0.012975656704351014, 0.13369681740864628, 0.014559198672458721, 0.041391918626085066, 0.14841100081548175, 0.3603098505373251, -0.05418865139534617, -0.050764776404989116, 0.03254316995693874, 0.03539112722241993, 0.06533467356515074, -0.30912280610523757, -0.2576821378373395, -0.23906586244665406, -0.020637632543040293, -0.00022331397267936454, -0.08628570417537818, -0.17453292264876824, -0.024067927535326557, -0.21754493564306318, 0.029463935901408604, 0.06153867869300636, 0.033753328092335666, 0.0792196747089228, 0.0594671001842065, 0.03649840314960093, 0.1821069815633818, 0.04667388411136273, 8.62660749631475e-06, 0.04698675544039907, -0.06276704708795283, -0.17918979603487012, 0.17268649054818383, -0.18883522299222677, -0.04694587122780484, 0.1457794818853693, 0.11292397747408493, -0.11328063295411481, -0.1574310439224033, -0.08197501102737904, 0.012979946675149045, -0.016092353814505328, 0.2380351499186687, 0.023384317110773288, -0.30282027565730096, 0.01638284028535263, 0.13543364401259417, -0.12158606640794313, -0.08367049587761356, 0.08483882960712978, -0.00044318531741244466, -0.07861587027401377]),
      |      list_dot_product(v, [-0.1480440376166867, -0.08512440683182432, -0.06394747392221323, -0.00045759766154713447, -0.20437466447815603, -0.043741735322772785, 0.11775529986009056, -0.28449785383575205, 0.04440239625350731, 0.023717337421497328, -0.05117952731173255, 0.035702032580539944, -0.06017956428660729, -0.03455060652140849, 0.009449519530006438, -0.23454575665525335, 0.17137352630281838, -0.08492758911964332, 0.11604706755579587, 0.07732840398964902, 0.013131627408544804, 0.17530755042876156, -0.10064801525288623, 0.05337470463075121, 0.09255730984555612, 0.10008395088098784, 0.09063736269590784, -0.13414209829345178, 0.01027769679436893, -0.10540482716914787, -0.1228596688774243, 0.09091210800723112, 0.04825216647449696, -0.1806613024742493, -0.029769890053288117, -0.10216258317025517, 0.139078499674634, -0.21255244137229035, -0.06345652317087329, -0.10392899552393761, 0.18947963438646775, 0.19011010093130634, -0.12585555780151772, -0.20893277847828234, 0.16586568212498556, 0.052836276545896566, 0.042797575089323976, 0.018020013799672673, -0.0683200926687484, -0.05127551197754947, -0.129498444617984, -0.10645450076880321, 0.22780031621678434, -0.15329476801869799, -0.17915209442332675, -0.0019200155656372096, -0.005381094449715372, 0.10972460046809979, 0.1827952418076938, -0.052685084379371146, -0.06955779264431118, 0.28843060606803783, -0.0900810775591765, -0.07553050152074066]),
      |      list_dot_product(v, [0.06808659617107013, 0.06269221034507544, 0.008780756291902829, 0.17252698629724822, -0.25796105142377507, 0.10712924678340989, -0.02320920865339409, 0.1775430920778206, -0.11522019032648376, 0.1362019581887693, 0.007640884616088507, 0.2019504752264874, -0.06077544603931797, -0.1402193530299735, -0.09311367930173033, 0.04930806442413942, 0.09682486376301348, 0.07142426922661867, -0.00931947753795057, -0.20316848738697266, -0.22547295142110013, 0.1576589824909524, -0.01185644101976479, 0.07323162442468027, 0.02747074840432716, -0.11908308279569853, 0.11645429190009153, -0.003835251879435034, 0.128924483280504, -0.10452312753727482, 0.15211656450619318, 0.20057539672429608, -0.08141318120622575, -0.01767747009308199, -0.11650295068092, 0.3161901219352154, -0.11671862126847647, -0.14843441785803368, -0.010252064972907794, -0.0482888647136251, -0.014507536911966358, -0.0001791954993268919, -0.08565322573537927, -0.017434762364318124, -0.07573379886438383, -0.041520825710729424, -0.013620430642481383, 0.36940447497223333, -0.10851089330440519, -0.15344609910846213, 0.06647233936408717, -0.019778009747410476, 0.009329624288528838, 0.005401021117891712, -0.02191754120141075, 0.10147291451921545, -0.17091025548621483, 0.09292951419066811, -0.1707204267750972, -0.07391767705582912, -0.1920604341731429, -0.09621918482076991, -0.08404634309155423, 0.026296885437333755]),
      |      list_dot_product(v, [-0.015085348120897488, 0.013517866322738688, -0.1738913215105934, 0.022537423699724543, 0.1689669835338632, 0.308663092373941, -0.25309505887395906, -0.10693042050185084, -0.017906201683455584, -0.06613281151068452, -0.1428483543962177, 0.36196189641526677, 0.1183037518455793, 0.11743309986423989, 0.11494380609248271, 0.055716543655892334, -0.11872343465207409, -0.11316167307071197, -0.019020534821124317, -0.24534483108957608, 0.03191823557688075, 0.03445191726855629, -0.011091879502073425, -0.1092700186485836, 0.1247495802276556, 0.1661688457648067, 0.035268547683974735, -0.14137833669818928, -0.026189293123713906, -0.18259915776827232, 0.04226625299184844, 0.01617219600339077, -0.062291916307996, -0.028462605745763862, -0.03986889430500577, -0.05384707971138738, -0.08802504523973873, 0.23525140078205894, 0.04905411909364538, -0.2630745915620057, -0.05655833960087571, -0.10089456889856754, -0.007513654901444103, -0.05056559020281365, 0.11724159660229803, 0.00909173231963109, -0.034998759630067135, -0.020604323600056505, 0.1029622744082804, -0.2123546020760255, -0.13375687582477258, -0.08333561323277253, -0.16669651241892552, 0.09694053178981965, -0.21787743523093225, -0.004216181382370467, -0.0056303030828844, 0.04229455916136345, 0.10565659774872106, -0.004698641778361815, 0.054063488227313584, 0.032495247709906444, 0.07261703283515797, 0.06545658210433099]),
      |      list_dot_product(v, [-0.08544207432204978, 0.011076242603358691, -0.17443305265590983, 0.19971582219041994, 0.008519457881276431, -0.02935471695924241, 0.1601854483282556, -0.013846588231743935, -0.11290145026925524, -0.04229772763615404, 0.02215837592954279, 0.03605046737492949, -0.18230215326263874, 0.47848072382344314, -0.0855178890359329, -0.01742052828909408, 0.02487550136526526, -0.19661496092675998, -0.2096973241956091, -0.1028900721601691, -0.06340424722110032, 0.03467842317456618, 0.16836503443235823, 0.034224946986031214, 0.006176513540205398, -0.022542978784031265, -0.18434962804948762, -0.025273527110866747, 0.012000127541373187, -0.05242866214814738, 0.16064800774641338, -0.1022565629201026, -0.15891143437992122, -0.18394127625248274, -0.09522292030690598, 0.01510491834256832, 0.17046990904157036, 0.05533662662323694, -0.07520278585507517, 0.20414407134629228, -0.04185251864322473, 0.2693909843068852, -0.17915567132796956, -0.04481312533100017, -0.03845338275380937, -0.11610530015711702, 0.12082475552926904, -0.007047024621070887, 0.03018452289435541, 0.04781309681074078, 0.16379575044319056, 0.014019727572107586, 0.06607626189729801, 0.11155759428852742, -0.09857967214015743, -0.09315850580605163, -0.08969349412055531, -0.10318157153595685, -0.017876518045730608, 0.13658262044638106, 0.07658137886368489, -0.0741629121973258, 0.07691180919317583, 0.01438097973016509]),
      |      list_dot_product(v, [-0.10467703292507023, 0.04334903504221634, 0.3308233470650587, 0.05281115184473054, 0.07154724205472202, -0.23957893360351684, -0.03597020654015932, -0.050250641132589514, 0.005446402804742112, 0.21559012668165944, -0.25725132561638314, 0.08007311442449916, 0.23352969284526776, 0.06344687098257198, 0.10695937191677082, 0.1955439817106363, 0.054971511275471986, -0.15899119512125737, -0.06773789116001962, 0.047291573436234725, -0.04121476186754304, -0.06668512581500982, -0.047789904603888364, 0.027070001394115525, -0.058880629419696254, 0.008833017756778553, -0.13899058812701734, -0.15865816065046964, 0.04030695091311882, -0.12584152749887786, 0.1536627623941165, -0.2258604132968827, -0.1118205963995829, 0.10493781265704775, 0.014503369082983258, -0.1889169071945566, 0.007213010192439393, -0.20401995155304276, -0.1325508587703797, -0.20449431805030832, 0.19571794539837029, 0.08722166916767601, 0.02497069736099032, -0.017672627704236707, -0.0660191626253017, -0.06466506782848237, -0.1365952505069631, 0.04433184641562781, -0.13211726964580775, -0.08608364415165777, -0.05007145762415633, 0.2181817858199934, 0.04603151283336087, 0.14948532624137512, 0.10036773938087057, 0.06536654155335096, -0.014218163474809297, -0.011947691048657918, -0.02457567329760616, 0.014622710123163086, -0.1582386980748425, -0.04525846368862706, 0.13015213654991284, -0.03712294567746925]),
      |      list_dot_product(v, [0.2805383455034073, -0.137159068274947, -0.04126691983842415, 0.07332610272758885, -0.01915856015041477, -0.1484889228798103, -0.11300436632177575, 0.08889731712752802, -0.01738314096039128, 0.09350298159624965, 0.15384331628023665, -0.09533876249483555, 0.10336994119057698, 0.022934883350988755, 0.07543842933934827, 0.1817821364596508, -0.16023107995157695, 0.02863289313541672, -0.05134798832161909, -0.01784053143187217, -0.009984333282282983, 0.16671736641528406, -0.003604162613596266, 0.25852724072784683, -0.15791550663271547, 0.056127394883355226, -0.09822172443260359, -0.04030024118148526, -0.014822405091699622, 0.04401133537695877, 0.048236812101427204, -0.08010611885247772, 0.02962548663678636, 0.04561400074531209, 0.10346268534199121, -0.20726140058828002, -0.1447950019983398, -0.11211549391802472, -0.032952267830433264, 0.027501797591824816, -0.10105638215459326, -0.1273095663983796, -0.1910163434443146, -0.08899294753872994, 0.11129272034438159, 0.06580293967408658, -0.14256338903430027, 0.21676374415790195, 0.14131254412166414, -0.018008175161939765, 0.23205685573787285, -0.1950872094033455, 0.010139005554459976, 0.016706225205014275, -0.18769487116240152, -0.0493111858663107, 0.012939834186746622, -0.045929943712831614, 0.31640769168013066, 0.13303036667096454, 0.003273279793939948, 0.05165375718695988, -0.15850982818782847, -0.20279568139216406]),
      |      list_dot_product(v, [-0.09400136406134635, -0.17858118026823094, -0.011990174422561898, 0.07855288335767155, 0.25745238779668916, 0.24111357070859718, -0.2370063927223251, -0.032416200048377676, 0.07439213289719844, 0.20916924037256493, 0.022606019693383883, -0.016031193470633837, -0.22230913787162276, -0.08487446828698016, -0.0188464150481108, 0.06048439349583417, 0.1806939397745643, -0.152059945711867, 0.12095737785505364, 0.021954344705071877, -0.10111875432768386, -0.1218700890795787, -0.029393583350761084, 0.20280486379521262, -0.17194991139378263, -0.12022886759734018, 0.075067414300294, 0.11793320902028198, 0.12779487223746278, -0.21596573220307994, 0.06635406584041018, 0.0016326354306457189, -0.08158196264898313, -0.03091910613214687, 0.17496070507544081, -0.14906364063458252, -0.11406843466361918, 0.0824168659991194, -0.11469069379838656, 0.16325478216602032, -0.11413046098876155, 0.11082464502198774, 0.18682363657071838, 0.14331843274791287, -0.05864357030559064, -0.10512099736626394, -0.09269594620154757, -0.045245927346829, -0.02160757996094417, 0.18362780431974673, -0.0006807095965764162, -0.14225924791260292, 0.20595752443822185, -0.05921109658737278, -0.03278848042257651, 0.03578540291816122, -0.06125576036431634, 0.1257410413083171, 0.0737185635350656, -0.02798548043569417, -0.06885857308792959, 0.10117540731846857, 0.019620996654309896, 0.14813583121822133]),
      |      list_dot_product(v, [-0.07769545710948746, -0.18127723002272458, 0.005521138596168852, -0.030542171595549547, 0.08165672799380982, -0.16634571681937174, -0.1363280277010479, -0.010566521998359257, 0.23758842834858857, -0.020841326036543047, -0.03948370321555947, -0.04029723087567861, -0.08440273356746149, -0.00817567111657084, -0.0853790959271549, 0.037111601070557464, -0.08828119708596073, 0.13326276894242708, -0.03431448888704631, -0.06565016468433305, -0.023746650381736185, 0.18625293929527814, 0.11630224564749535, -0.12101696891115782, -0.10599030714929376, 0.015834559794443943, -0.11129836309693665, -0.1886652621602717, -0.07751643786370158, -0.08841171240511599, -0.030380882866962913, 0.2767244756123536, 0.007948125205059374, -0.09277588279766351, -0.003658922812019594, 0.025162678996863422, 0.01049253586828065, 0.234368333669906, -0.14035268483713573, 0.03526081266322076, 0.05787658499801702, -0.09436182545392294, -0.05276382993392728, 0.34796973849820917, -0.02315627809811819, 0.2697525674300845, 0.2238036223739356, 0.0687069271315806, -0.17717108223484515, -0.10435054830887631, 0.021393367538072756, 0.2782403781539413, 0.1977892662585688, 0.0718263405759096, 0.053483343420581336, -0.02215041112870231, -0.0691851909071283, -0.03683910291256836, 0.2211365831970071, 0.011408861552017749, -0.09564106318238327, -0.03211374240474151, -0.053840881119338754, 0.018862317850668973]),
      |      list_dot_product(v, [-0.06632766747763331, 0.1313809180411261, -0.1108282606385717, 0.1208821284499155, -0.040673550967224394, -0.13403048976529447, -0.1591465143226239, 0.13238423886522546, -0.12661093786812277, 0.019641637496928727, -0.187481184240348, -0.12025880051969981, -0.09122186934339789, -0.18369213818587798, -0.036499629207933613, -0.05260571734753703, 0.1629095104594081, 0.1334442929845821, 0.2366917771877396, -0.033939710857111206, 0.11020713965984279, -0.11902636942988888, 0.2520208345768142, -0.06462929646705562, -0.02053808701978451, -0.13048901271567118, -0.09009929531130906, -0.027405256332144422, -0.10556763923873559, 0.1196632605210045, -0.026363044844634826, 0.08079795677915748, -0.02450307421625312, 0.034922303555901014, 0.04961726094071068, -0.11035955569850758, -0.053621583402698084, 0.0908383040613553, 0.08541741384469925, -0.062103760575860485, -0.12120336981768148, 0.33071454713825027, -0.04093795544097512, -0.08300721638191355, -0.06098710451828418, -0.019199936069804243, -0.08211616349072666, -0.030916856023136177, -0.04491455292328511, -0.2213783364602069, 0.03307413385641652, 0.04985037788136047, -0.22148980788474032, 0.05465447895987568, -0.05788992279509937, -0.27222018764962747, 0.0865241705743037, 0.12489613659920981, 0.07917044827818082, 0.26825673282026485, -0.19023889820532391, 0.1241567888641089, -0.019627303432728196, 0.04102209833994513]),
      |      list_dot_product(v, [0.05003710591151538, 0.08726899861175451, -0.08660603989489009, 0.02928008028278539, -0.0792723604435672, -0.024337304437313367, -0.09379824927033316, -0.16079923892819165, -0.07827827416611104, 0.21953842684999467, 0.1603595017109873, 0.13075314296493537, 0.05044929338393101, 0.08115458007297398, 0.019616343590176645, 0.0928005528199348, -0.04549335164444196, 0.2615707764883349, 0.1791998012958293, -0.06490017702478365, -0.0035156404059955185, -0.15449151232275732, -0.14393405424422873, 0.02271702719119439, 0.1266812721126732, -0.2833765615179294, -0.17434870397924063, 0.16138383573791096, -0.15243906387024098, 0.03480087577584583, -0.05752965741751008, 0.02993948437269438, 0.07686295694498026, -0.1476665093323185, -0.12522941045618324, -0.15155252574098033, 0.11097281618348698, -0.06585287596661532, -0.12876287650123144, -0.10139964586094598, 0.08563219596761018, 0.031210127269826155, 0.06738638521596356, 0.05656899481507609, 0.0764804812281481, 0.04290494629751998, 0.04428952556500077, -0.030505309676842632, 0.09093067454643752, -0.09741919995029803, 0.24306615312347635, 0.12957385676679173, 0.08018285042893529, 0.03839579517201452, 0.03592750930270206, 0.24942474170820314, -0.01647887547160015, 0.22490456282933116, 0.014060078943620507, 0.0742957106975249, 0.3126180354195202, -0.004576143303239876, -0.008375018474654414, 0.18819498652488204]),
      |      list_dot_product(v, [-0.10947141972764758, -0.0016952657300114864, 0.000626996665021595, -0.03165281682074804, 0.005428726496680334, -0.041084264407123046, 0.06070853947336476, 0.18211286013718747, -0.16469955253768886, 0.03432687837509851, -0.11228885349753219, 0.12116237851728424, -0.04961130136275198, 0.005339225046258029, -0.20885084892740377, 0.2897206386904462, -0.2124482891499997, 0.04215025813125414, 0.1915150976015177, 0.052840027578610525, 0.026816366077064495, 0.0022051078124579603, 0.004420278143045, -0.001713470617042255, -0.18874270691886016, 0.04311013295471919, -0.13709798748907248, -0.1614390647959489, 0.10462007109311422, -0.13921350577805455, -0.08694611848009885, -0.037111533281235044, 0.15170978790351589, 0.12840345209754347, 0.005550688956452556, 0.18472028215579905, 0.21366004094817198, -0.018179941827563526, 0.016073734193005708, -0.06651371393882569, 0.2196624273186203, -0.0859846734944447, 0.10505554349601193, -0.08457265824213005, -0.09786783371839984, -0.06922148126876126, 0.1172038002186873, -0.11187878318343811, 0.2921442966823453, 0.07689978727529719, 0.04018507906003979, -0.08344126726994357, 0.13979364549617979, -0.04516800105388613, -0.15324638877470337, -0.20352606840626164, 0.03713433298650906, -0.00024769397832989887, -0.0406311730028915, -0.027043131646227174, -0.0622778737911749, 0.07333479790138524, -0.2346911335276097, 0.24671597769197454]),
      |      list_dot_product(v, [-0.19689398700817617, 0.0025371265311852037, 0.12186596636562562, 0.10240890271650518, 0.07814494185798103, 0.008582810626444505, -0.03697645974550576, -0.06542231481390687, -0.13586728357179953, 0.07388908722530156, 0.0053049650856987155, 0.12485301168515417, -0.22373664591493303, -0.15186166219383734, -0.07588235160813901, -0.2510961326103161, -0.18454397247066281, 0.02371067027644102, -0.027515992176765793, -0.011616456010000067, 0.14755753465981772, 0.20478934859439513, -0.10973315083024392, -0.06187125616612763, -0.05170370408961863, -0.21094539091596812, 0.03796198170997332, -0.11524746696834422, 0.1860915666231519, 0.22845919235057127, 0.04409500845940704, -0.23515698676318694, 0.019183069651032975, 0.23805100751094244, 0.08483299521194985, -0.06620368351607497, 0.13600230087898052, 0.17937914789543769, -0.08327560009515234, -0.004914166516078895, -0.07491932266068634, -0.14202782144180975, -0.03459721559610937, -0.04370438083793603, 0.0949722260805846, 0.0014658976480054497, -0.005785214062767768, 0.12656036964071243, -0.13852383554749412, -0.018141171208210956, 0.016382282072574843, 0.04937033474995374, 0.01226451153669905, -0.07142289534469688, -0.1239580105464764, 0.20032238156421311, -0.06539487513671083, -0.1701408667969809, -0.13580431328684425, 0.278936821127855, 0.09043245503619458, 0.14260758019106298, 0.010443358104778675, 0.016220262121011023]),
      |      list_dot_product(v, [-0.051457827187467636, 0.15977307622921563, 0.005756379682962818, -0.024866621886749204, 0.09828342600326256, -0.11045200384249787, -0.04182570577877159, 0.0248257694806527, 0.17485497509427303, -0.14678199656786461, 0.06339335923327208, -0.15941091133720964, -0.011650871116009393, -0.06738937790734327, 0.2810929865627124, 0.06449050274424478, 0.15898611034754725, -0.03437026177694379, -0.1119709725374098, 0.11317424559563329, 0.11887340567409645, -0.05994055125246724, -0.10192081326152708, 0.33293747966673937, -0.06916865567169937, -0.16351598856174918, -0.029357927565058985, -0.12018017094517029, 0.1855956013679997, -0.0628269855268284, -0.2203059528362397, 0.0376608736924009, 0.008169536317786573, 0.020932417915671662, -0.16789153074873198, 0.03721068409538705, 0.1738990731357094, 0.22704470721575384, -0.18137821205386248, -0.046314938701612365, -0.0775938734653261, -0.03697600293689926, -0.2795463539912775, -0.04790387432448614, -0.022600304153480397, -0.02663371368761775, 0.03306528595295859, 0.005796771381911172, 0.1308185746798335, -0.2665705927832332, 0.021535267609141144, -0.08729660337506741, -0.04329823454430094, -0.10654810092471605, -0.08474862676900095, 0.030074852245366584, -0.03435788332325232, 0.061078988114918284, -0.14061497892028935, -0.13650280777663373, -0.0626195021217009, -0.15662391819533206, 0.07477946763477863, 0.1399787178894721]),
      |      list_dot_product(v, [-0.02562159860751807, -0.03026644306349051, 0.21928698265730043, 0.19162058497071055, 0.0612241612451374, -0.09679150549103827, 0.06952195725926845, -0.060029967911578185, -0.08105065132517715, -0.2151250390930884, 0.2527628596078477, 0.04331942362595786, -0.038379079729809994, -0.15035564753567526, -0.10899873017506238, -0.031525266632877955, -0.001985081069268935, -0.07803740414904776, 0.009312608151338829, -0.19909958593543262, -0.05433438324156491, -0.070065751851181, -0.09127304781842052, -0.10606251337303402, -0.04624308235077267, 0.2141619993182913, 0.01435486772971217, 0.001001830191205151, 0.24532941231054645, 0.061228950167275864, -0.13122543152011298, -0.1803968195625525, -0.016117885487245836, -0.03272180143509729, -0.21598382318578094, -0.236483044120189, -0.15459605783656527, 0.09896183894508379, 0.2070939513578071, 0.04122284108075342, 0.13982556607190855, 0.0533675005465786, -0.12637116797948914, 0.03367387771684497, -0.10357330337966286, -0.05124726133679262, 0.05414001474884274, 0.13333565804872652, -0.09150752762630167, -0.0049295351594076916, 0.11552794886512475, -0.001926532779859254, -0.07437573824616812, 0.06809734800999229, 0.15273402230606176, -0.09299799431814602, 0.03211690532028537, 0.1955858069110934, 0.17594911357045132, -0.1594144732475997, 0.083246099941025, 0.047234444675553086, -0.08211948990579204, 0.2648077971350644])]""".stripMargin

  /** The 24-row extension of the same derivation (rows 1-16 are
    * identical to [[gateRerankProjSql]] by construction - one
    * eigendecomposition, larger prefix), for the second trained-rerank
    * audit row. Re-derived by tools/derive_rot.py. */
  private val gateRerankProj24Sql: String =
    """[list_dot_product(v, [-0.2096393298887029, -0.12057271530460328, 0.03654785829099375, 0.01181956705207999, 0.07567008221654345, 0.013214628527288186, 0.09058411826856812, 0.2866187923432374, 0.04954696200812782, 0.4140565265568779, 0.0653049813495429, 0.18207885414308053, 0.06513224154456904, -0.03653205454058415, 0.17114897511870436, -0.18534977721254273, 0.08898987401709364, -0.1570265554534968, -0.030136686338868745, 0.03217896964106663, 0.06121320421931407, -0.11068832310461507, -0.08347512790974954, -0.05543746810299688, 0.01955001247293548, 0.199125429101352, -0.03751725273394648, 0.14950769890198098, -0.1728796307730548, -0.0061231136919325056, -0.05871572670446115, 0.06203771800325117, 0.29653854323357254, 0.10616457886972945, -0.03204193889844021, 0.10414385120144753, 0.04453875945639852, 0.06146405307635499, 0.013006697593051642, 0.0217712055199728, -0.11667898800999403, 0.0055245863932987666, -0.24083692018991473, 0.09570759089248622, -0.02830770871376086, -0.22512744449721753, 0.00873183574219243, -0.07903750844473234, -0.08368084425577953, -0.1184509112478963, 0.12045949856582461, 0.07248325171851451, -0.017186482327944893, 0.0816043743090242, -0.015031356046457896, -0.06676477470729585, -0.05565063579441348, -0.05137605787848301, 0.0601960176213444, -0.09113914308767156, 0.121986995952936, 0.05064983370857072, -0.21821146481626008, -0.10201388625038872]),
      |      list_dot_product(v, [-0.0038371279617273185, -0.0544302462823619, -0.012567933982260658, -0.08813365806325192, 0.17485769809344773, 0.02521436661842459, 0.07494656315169955, -0.06998070122115854, 0.07744817056372585, 0.0306960564936196, 0.10575814447888733, -0.017882871949512658, 0.012975656704351014, 0.13369681740864628, 0.014559198672458721, 0.041391918626085066, 0.14841100081548175, 0.3603098505373251, -0.05418865139534617, -0.050764776404989116, 0.03254316995693874, 0.03539112722241993, 0.06533467356515074, -0.30912280610523757, -0.2576821378373395, -0.23906586244665406, -0.020637632543040293, -0.00022331397267936454, -0.08628570417537818, -0.17453292264876824, -0.024067927535326557, -0.21754493564306318, 0.029463935901408604, 0.06153867869300636, 0.033753328092335666, 0.0792196747089228, 0.0594671001842065, 0.03649840314960093, 0.1821069815633818, 0.04667388411136273, 8.62660749631475e-06, 0.04698675544039907, -0.06276704708795283, -0.17918979603487012, 0.17268649054818383, -0.18883522299222677, -0.04694587122780484, 0.1457794818853693, 0.11292397747408493, -0.11328063295411481, -0.1574310439224033, -0.08197501102737904, 0.012979946675149045, -0.016092353814505328, 0.2380351499186687, 0.023384317110773288, -0.30282027565730096, 0.01638284028535263, 0.13543364401259417, -0.12158606640794313, -0.08367049587761356, 0.08483882960712978, -0.00044318531741244466, -0.07861587027401377]),
      |      list_dot_product(v, [-0.1480440376166867, -0.08512440683182432, -0.06394747392221323, -0.00045759766154713447, -0.20437466447815603, -0.043741735322772785, 0.11775529986009056, -0.28449785383575205, 0.04440239625350731, 0.023717337421497328, -0.05117952731173255, 0.035702032580539944, -0.06017956428660729, -0.03455060652140849, 0.009449519530006438, -0.23454575665525335, 0.17137352630281838, -0.08492758911964332, 0.11604706755579587, 0.07732840398964902, 0.013131627408544804, 0.17530755042876156, -0.10064801525288623, 0.05337470463075121, 0.09255730984555612, 0.10008395088098784, 0.09063736269590784, -0.13414209829345178, 0.01027769679436893, -0.10540482716914787, -0.1228596688774243, 0.09091210800723112, 0.04825216647449696, -0.1806613024742493, -0.029769890053288117, -0.10216258317025517, 0.139078499674634, -0.21255244137229035, -0.06345652317087329, -0.10392899552393761, 0.18947963438646775, 0.19011010093130634, -0.12585555780151772, -0.20893277847828234, 0.16586568212498556, 0.052836276545896566, 0.042797575089323976, 0.018020013799672673, -0.0683200926687484, -0.05127551197754947, -0.129498444617984, -0.10645450076880321, 0.22780031621678434, -0.15329476801869799, -0.17915209442332675, -0.0019200155656372096, -0.005381094449715372, 0.10972460046809979, 0.1827952418076938, -0.052685084379371146, -0.06955779264431118, 0.28843060606803783, -0.0900810775591765, -0.07553050152074066]),
      |      list_dot_product(v, [0.06808659617107013, 0.06269221034507544, 0.008780756291902829, 0.17252698629724822, -0.25796105142377507, 0.10712924678340989, -0.02320920865339409, 0.1775430920778206, -0.11522019032648376, 0.1362019581887693, 0.007640884616088507, 0.2019504752264874, -0.06077544603931797, -0.1402193530299735, -0.09311367930173033, 0.04930806442413942, 0.09682486376301348, 0.07142426922661867, -0.00931947753795057, -0.20316848738697266, -0.22547295142110013, 0.1576589824909524, -0.01185644101976479, 0.07323162442468027, 0.02747074840432716, -0.11908308279569853, 0.11645429190009153, -0.003835251879435034, 0.128924483280504, -0.10452312753727482, 0.15211656450619318, 0.20057539672429608, -0.08141318120622575, -0.01767747009308199, -0.11650295068092, 0.3161901219352154, -0.11671862126847647, -0.14843441785803368, -0.010252064972907794, -0.0482888647136251, -0.014507536911966358, -0.0001791954993268919, -0.08565322573537927, -0.017434762364318124, -0.07573379886438383, -0.041520825710729424, -0.013620430642481383, 0.36940447497223333, -0.10851089330440519, -0.15344609910846213, 0.06647233936408717, -0.019778009747410476, 0.009329624288528838, 0.005401021117891712, -0.02191754120141075, 0.10147291451921545, -0.17091025548621483, 0.09292951419066811, -0.1707204267750972, -0.07391767705582912, -0.1920604341731429, -0.09621918482076991, -0.08404634309155423, 0.026296885437333755]),
      |      list_dot_product(v, [-0.015085348120897488, 0.013517866322738688, -0.1738913215105934, 0.022537423699724543, 0.1689669835338632, 0.308663092373941, -0.25309505887395906, -0.10693042050185084, -0.017906201683455584, -0.06613281151068452, -0.1428483543962177, 0.36196189641526677, 0.1183037518455793, 0.11743309986423989, 0.11494380609248271, 0.055716543655892334, -0.11872343465207409, -0.11316167307071197, -0.019020534821124317, -0.24534483108957608, 0.03191823557688075, 0.03445191726855629, -0.011091879502073425, -0.1092700186485836, 0.1247495802276556, 0.1661688457648067, 0.035268547683974735, -0.14137833669818928, -0.026189293123713906, -0.18259915776827232, 0.04226625299184844, 0.01617219600339077, -0.062291916307996, -0.028462605745763862, -0.03986889430500577, -0.05384707971138738, -0.08802504523973873, 0.23525140078205894, 0.04905411909364538, -0.2630745915620057, -0.05655833960087571, -0.10089456889856754, -0.007513654901444103, -0.05056559020281365, 0.11724159660229803, 0.00909173231963109, -0.034998759630067135, -0.020604323600056505, 0.1029622744082804, -0.2123546020760255, -0.13375687582477258, -0.08333561323277253, -0.16669651241892552, 0.09694053178981965, -0.21787743523093225, -0.004216181382370467, -0.0056303030828844, 0.04229455916136345, 0.10565659774872106, -0.004698641778361815, 0.054063488227313584, 0.032495247709906444, 0.07261703283515797, 0.06545658210433099]),
      |      list_dot_product(v, [-0.08544207432204978, 0.011076242603358691, -0.17443305265590983, 0.19971582219041994, 0.008519457881276431, -0.02935471695924241, 0.1601854483282556, -0.013846588231743935, -0.11290145026925524, -0.04229772763615404, 0.02215837592954279, 0.03605046737492949, -0.18230215326263874, 0.47848072382344314, -0.0855178890359329, -0.01742052828909408, 0.02487550136526526, -0.19661496092675998, -0.2096973241956091, -0.1028900721601691, -0.06340424722110032, 0.03467842317456618, 0.16836503443235823, 0.034224946986031214, 0.006176513540205398, -0.022542978784031265, -0.18434962804948762, -0.025273527110866747, 0.012000127541373187, -0.05242866214814738, 0.16064800774641338, -0.1022565629201026, -0.15891143437992122, -0.18394127625248274, -0.09522292030690598, 0.01510491834256832, 0.17046990904157036, 0.05533662662323694, -0.07520278585507517, 0.20414407134629228, -0.04185251864322473, 0.2693909843068852, -0.17915567132796956, -0.04481312533100017, -0.03845338275380937, -0.11610530015711702, 0.12082475552926904, -0.007047024621070887, 0.03018452289435541, 0.04781309681074078, 0.16379575044319056, 0.014019727572107586, 0.06607626189729801, 0.11155759428852742, -0.09857967214015743, -0.09315850580605163, -0.08969349412055531, -0.10318157153595685, -0.017876518045730608, 0.13658262044638106, 0.07658137886368489, -0.0741629121973258, 0.07691180919317583, 0.01438097973016509]),
      |      list_dot_product(v, [-0.10467703292507023, 0.04334903504221634, 0.3308233470650587, 0.05281115184473054, 0.07154724205472202, -0.23957893360351684, -0.03597020654015932, -0.050250641132589514, 0.005446402804742112, 0.21559012668165944, -0.25725132561638314, 0.08007311442449916, 0.23352969284526776, 0.06344687098257198, 0.10695937191677082, 0.1955439817106363, 0.054971511275471986, -0.15899119512125737, -0.06773789116001962, 0.047291573436234725, -0.04121476186754304, -0.06668512581500982, -0.047789904603888364, 0.027070001394115525, -0.058880629419696254, 0.008833017756778553, -0.13899058812701734, -0.15865816065046964, 0.04030695091311882, -0.12584152749887786, 0.1536627623941165, -0.2258604132968827, -0.1118205963995829, 0.10493781265704775, 0.014503369082983258, -0.1889169071945566, 0.007213010192439393, -0.20401995155304276, -0.1325508587703797, -0.20449431805030832, 0.19571794539837029, 0.08722166916767601, 0.02497069736099032, -0.017672627704236707, -0.0660191626253017, -0.06466506782848237, -0.1365952505069631, 0.04433184641562781, -0.13211726964580775, -0.08608364415165777, -0.05007145762415633, 0.2181817858199934, 0.04603151283336087, 0.14948532624137512, 0.10036773938087057, 0.06536654155335096, -0.014218163474809297, -0.011947691048657918, -0.02457567329760616, 0.014622710123163086, -0.1582386980748425, -0.04525846368862706, 0.13015213654991284, -0.03712294567746925]),
      |      list_dot_product(v, [0.2805383455034073, -0.137159068274947, -0.04126691983842415, 0.07332610272758885, -0.01915856015041477, -0.1484889228798103, -0.11300436632177575, 0.08889731712752802, -0.01738314096039128, 0.09350298159624965, 0.15384331628023665, -0.09533876249483555, 0.10336994119057698, 0.022934883350988755, 0.07543842933934827, 0.1817821364596508, -0.16023107995157695, 0.02863289313541672, -0.05134798832161909, -0.01784053143187217, -0.009984333282282983, 0.16671736641528406, -0.003604162613596266, 0.25852724072784683, -0.15791550663271547, 0.056127394883355226, -0.09822172443260359, -0.04030024118148526, -0.014822405091699622, 0.04401133537695877, 0.048236812101427204, -0.08010611885247772, 0.02962548663678636, 0.04561400074531209, 0.10346268534199121, -0.20726140058828002, -0.1447950019983398, -0.11211549391802472, -0.032952267830433264, 0.027501797591824816, -0.10105638215459326, -0.1273095663983796, -0.1910163434443146, -0.08899294753872994, 0.11129272034438159, 0.06580293967408658, -0.14256338903430027, 0.21676374415790195, 0.14131254412166414, -0.018008175161939765, 0.23205685573787285, -0.1950872094033455, 0.010139005554459976, 0.016706225205014275, -0.18769487116240152, -0.0493111858663107, 0.012939834186746622, -0.045929943712831614, 0.31640769168013066, 0.13303036667096454, 0.003273279793939948, 0.05165375718695988, -0.15850982818782847, -0.20279568139216406]),
      |      list_dot_product(v, [-0.09400136406134635, -0.17858118026823094, -0.011990174422561898, 0.07855288335767155, 0.25745238779668916, 0.24111357070859718, -0.2370063927223251, -0.032416200048377676, 0.07439213289719844, 0.20916924037256493, 0.022606019693383883, -0.016031193470633837, -0.22230913787162276, -0.08487446828698016, -0.0188464150481108, 0.06048439349583417, 0.1806939397745643, -0.152059945711867, 0.12095737785505364, 0.021954344705071877, -0.10111875432768386, -0.1218700890795787, -0.029393583350761084, 0.20280486379521262, -0.17194991139378263, -0.12022886759734018, 0.075067414300294, 0.11793320902028198, 0.12779487223746278, -0.21596573220307994, 0.06635406584041018, 0.0016326354306457189, -0.08158196264898313, -0.03091910613214687, 0.17496070507544081, -0.14906364063458252, -0.11406843466361918, 0.0824168659991194, -0.11469069379838656, 0.16325478216602032, -0.11413046098876155, 0.11082464502198774, 0.18682363657071838, 0.14331843274791287, -0.05864357030559064, -0.10512099736626394, -0.09269594620154757, -0.045245927346829, -0.02160757996094417, 0.18362780431974673, -0.0006807095965764162, -0.14225924791260292, 0.20595752443822185, -0.05921109658737278, -0.03278848042257651, 0.03578540291816122, -0.06125576036431634, 0.1257410413083171, 0.0737185635350656, -0.02798548043569417, -0.06885857308792959, 0.10117540731846857, 0.019620996654309896, 0.14813583121822133]),
      |      list_dot_product(v, [-0.07769545710948746, -0.18127723002272458, 0.005521138596168852, -0.030542171595549547, 0.08165672799380982, -0.16634571681937174, -0.1363280277010479, -0.010566521998359257, 0.23758842834858857, -0.020841326036543047, -0.03948370321555947, -0.04029723087567861, -0.08440273356746149, -0.00817567111657084, -0.0853790959271549, 0.037111601070557464, -0.08828119708596073, 0.13326276894242708, -0.03431448888704631, -0.06565016468433305, -0.023746650381736185, 0.18625293929527814, 0.11630224564749535, -0.12101696891115782, -0.10599030714929376, 0.015834559794443943, -0.11129836309693665, -0.1886652621602717, -0.07751643786370158, -0.08841171240511599, -0.030380882866962913, 0.2767244756123536, 0.007948125205059374, -0.09277588279766351, -0.003658922812019594, 0.025162678996863422, 0.01049253586828065, 0.234368333669906, -0.14035268483713573, 0.03526081266322076, 0.05787658499801702, -0.09436182545392294, -0.05276382993392728, 0.34796973849820917, -0.02315627809811819, 0.2697525674300845, 0.2238036223739356, 0.0687069271315806, -0.17717108223484515, -0.10435054830887631, 0.021393367538072756, 0.2782403781539413, 0.1977892662585688, 0.0718263405759096, 0.053483343420581336, -0.02215041112870231, -0.0691851909071283, -0.03683910291256836, 0.2211365831970071, 0.011408861552017749, -0.09564106318238327, -0.03211374240474151, -0.053840881119338754, 0.018862317850668973]),
      |      list_dot_product(v, [-0.06632766747763331, 0.1313809180411261, -0.1108282606385717, 0.1208821284499155, -0.040673550967224394, -0.13403048976529447, -0.1591465143226239, 0.13238423886522546, -0.12661093786812277, 0.019641637496928727, -0.187481184240348, -0.12025880051969981, -0.09122186934339789, -0.18369213818587798, -0.036499629207933613, -0.05260571734753703, 0.1629095104594081, 0.1334442929845821, 0.2366917771877396, -0.033939710857111206, 0.11020713965984279, -0.11902636942988888, 0.2520208345768142, -0.06462929646705562, -0.02053808701978451, -0.13048901271567118, -0.09009929531130906, -0.027405256332144422, -0.10556763923873559, 0.1196632605210045, -0.026363044844634826, 0.08079795677915748, -0.02450307421625312, 0.034922303555901014, 0.04961726094071068, -0.11035955569850758, -0.053621583402698084, 0.0908383040613553, 0.08541741384469925, -0.062103760575860485, -0.12120336981768148, 0.33071454713825027, -0.04093795544097512, -0.08300721638191355, -0.06098710451828418, -0.019199936069804243, -0.08211616349072666, -0.030916856023136177, -0.04491455292328511, -0.2213783364602069, 0.03307413385641652, 0.04985037788136047, -0.22148980788474032, 0.05465447895987568, -0.05788992279509937, -0.27222018764962747, 0.0865241705743037, 0.12489613659920981, 0.07917044827818082, 0.26825673282026485, -0.19023889820532391, 0.1241567888641089, -0.019627303432728196, 0.04102209833994513]),
      |      list_dot_product(v, [0.05003710591151538, 0.08726899861175451, -0.08660603989489009, 0.02928008028278539, -0.0792723604435672, -0.024337304437313367, -0.09379824927033316, -0.16079923892819165, -0.07827827416611104, 0.21953842684999467, 0.1603595017109873, 0.13075314296493537, 0.05044929338393101, 0.08115458007297398, 0.019616343590176645, 0.0928005528199348, -0.04549335164444196, 0.2615707764883349, 0.1791998012958293, -0.06490017702478365, -0.0035156404059955185, -0.15449151232275732, -0.14393405424422873, 0.02271702719119439, 0.1266812721126732, -0.2833765615179294, -0.17434870397924063, 0.16138383573791096, -0.15243906387024098, 0.03480087577584583, -0.05752965741751008, 0.02993948437269438, 0.07686295694498026, -0.1476665093323185, -0.12522941045618324, -0.15155252574098033, 0.11097281618348698, -0.06585287596661532, -0.12876287650123144, -0.10139964586094598, 0.08563219596761018, 0.031210127269826155, 0.06738638521596356, 0.05656899481507609, 0.0764804812281481, 0.04290494629751998, 0.04428952556500077, -0.030505309676842632, 0.09093067454643752, -0.09741919995029803, 0.24306615312347635, 0.12957385676679173, 0.08018285042893529, 0.03839579517201452, 0.03592750930270206, 0.24942474170820314, -0.01647887547160015, 0.22490456282933116, 0.014060078943620507, 0.0742957106975249, 0.3126180354195202, -0.004576143303239876, -0.008375018474654414, 0.18819498652488204]),
      |      list_dot_product(v, [-0.10947141972764758, -0.0016952657300114864, 0.000626996665021595, -0.03165281682074804, 0.005428726496680334, -0.041084264407123046, 0.06070853947336476, 0.18211286013718747, -0.16469955253768886, 0.03432687837509851, -0.11228885349753219, 0.12116237851728424, -0.04961130136275198, 0.005339225046258029, -0.20885084892740377, 0.2897206386904462, -0.2124482891499997, 0.04215025813125414, 0.1915150976015177, 0.052840027578610525, 0.026816366077064495, 0.0022051078124579603, 0.004420278143045, -0.001713470617042255, -0.18874270691886016, 0.04311013295471919, -0.13709798748907248, -0.1614390647959489, 0.10462007109311422, -0.13921350577805455, -0.08694611848009885, -0.037111533281235044, 0.15170978790351589, 0.12840345209754347, 0.005550688956452556, 0.18472028215579905, 0.21366004094817198, -0.018179941827563526, 0.016073734193005708, -0.06651371393882569, 0.2196624273186203, -0.0859846734944447, 0.10505554349601193, -0.08457265824213005, -0.09786783371839984, -0.06922148126876126, 0.1172038002186873, -0.11187878318343811, 0.2921442966823453, 0.07689978727529719, 0.04018507906003979, -0.08344126726994357, 0.13979364549617979, -0.04516800105388613, -0.15324638877470337, -0.20352606840626164, 0.03713433298650906, -0.00024769397832989887, -0.0406311730028915, -0.027043131646227174, -0.0622778737911749, 0.07333479790138524, -0.2346911335276097, 0.24671597769197454]),
      |      list_dot_product(v, [-0.19689398700817617, 0.0025371265311852037, 0.12186596636562562, 0.10240890271650518, 0.07814494185798103, 0.008582810626444505, -0.03697645974550576, -0.06542231481390687, -0.13586728357179953, 0.07388908722530156, 0.0053049650856987155, 0.12485301168515417, -0.22373664591493303, -0.15186166219383734, -0.07588235160813901, -0.2510961326103161, -0.18454397247066281, 0.02371067027644102, -0.027515992176765793, -0.011616456010000067, 0.14755753465981772, 0.20478934859439513, -0.10973315083024392, -0.06187125616612763, -0.05170370408961863, -0.21094539091596812, 0.03796198170997332, -0.11524746696834422, 0.1860915666231519, 0.22845919235057127, 0.04409500845940704, -0.23515698676318694, 0.019183069651032975, 0.23805100751094244, 0.08483299521194985, -0.06620368351607497, 0.13600230087898052, 0.17937914789543769, -0.08327560009515234, -0.004914166516078895, -0.07491932266068634, -0.14202782144180975, -0.03459721559610937, -0.04370438083793603, 0.0949722260805846, 0.0014658976480054497, -0.005785214062767768, 0.12656036964071243, -0.13852383554749412, -0.018141171208210956, 0.016382282072574843, 0.04937033474995374, 0.01226451153669905, -0.07142289534469688, -0.1239580105464764, 0.20032238156421311, -0.06539487513671083, -0.1701408667969809, -0.13580431328684425, 0.278936821127855, 0.09043245503619458, 0.14260758019106298, 0.010443358104778675, 0.016220262121011023]),
      |      list_dot_product(v, [-0.051457827187467636, 0.15977307622921563, 0.005756379682962818, -0.024866621886749204, 0.09828342600326256, -0.11045200384249787, -0.04182570577877159, 0.0248257694806527, 0.17485497509427303, -0.14678199656786461, 0.06339335923327208, -0.15941091133720964, -0.011650871116009393, -0.06738937790734327, 0.2810929865627124, 0.06449050274424478, 0.15898611034754725, -0.03437026177694379, -0.1119709725374098, 0.11317424559563329, 0.11887340567409645, -0.05994055125246724, -0.10192081326152708, 0.33293747966673937, -0.06916865567169937, -0.16351598856174918, -0.029357927565058985, -0.12018017094517029, 0.1855956013679997, -0.0628269855268284, -0.2203059528362397, 0.0376608736924009, 0.008169536317786573, 0.020932417915671662, -0.16789153074873198, 0.03721068409538705, 0.1738990731357094, 0.22704470721575384, -0.18137821205386248, -0.046314938701612365, -0.0775938734653261, -0.03697600293689926, -0.2795463539912775, -0.04790387432448614, -0.022600304153480397, -0.02663371368761775, 0.03306528595295859, 0.005796771381911172, 0.1308185746798335, -0.2665705927832332, 0.021535267609141144, -0.08729660337506741, -0.04329823454430094, -0.10654810092471605, -0.08474862676900095, 0.030074852245366584, -0.03435788332325232, 0.061078988114918284, -0.14061497892028935, -0.13650280777663373, -0.0626195021217009, -0.15662391819533206, 0.07477946763477863, 0.1399787178894721]),
      |      list_dot_product(v, [-0.02562159860751807, -0.03026644306349051, 0.21928698265730043, 0.19162058497071055, 0.0612241612451374, -0.09679150549103827, 0.06952195725926845, -0.060029967911578185, -0.08105065132517715, -0.2151250390930884, 0.2527628596078477, 0.04331942362595786, -0.038379079729809994, -0.15035564753567526, -0.10899873017506238, -0.031525266632877955, -0.001985081069268935, -0.07803740414904776, 0.009312608151338829, -0.19909958593543262, -0.05433438324156491, -0.070065751851181, -0.09127304781842052, -0.10606251337303402, -0.04624308235077267, 0.2141619993182913, 0.01435486772971217, 0.001001830191205151, 0.24532941231054645, 0.061228950167275864, -0.13122543152011298, -0.1803968195625525, -0.016117885487245836, -0.03272180143509729, -0.21598382318578094, -0.236483044120189, -0.15459605783656527, 0.09896183894508379, 0.2070939513578071, 0.04122284108075342, 0.13982556607190855, 0.0533675005465786, -0.12637116797948914, 0.03367387771684497, -0.10357330337966286, -0.05124726133679262, 0.05414001474884274, 0.13333565804872652, -0.09150752762630167, -0.0049295351594076916, 0.11552794886512475, -0.001926532779859254, -0.07437573824616812, 0.06809734800999229, 0.15273402230606176, -0.09299799431814602, 0.03211690532028537, 0.1955858069110934, 0.17594911357045132, -0.1594144732475997, 0.083246099941025, 0.047234444675553086, -0.08211948990579204, 0.2648077971350644]),
      |      list_dot_product(v, [0.06805053117751811, -0.11544219185568803, 0.1369320923478017, -0.13797092922024232, 0.01772194461626603, -0.2699616226934985, -0.2092998988605669, 0.06919396892744023, -0.0756992056626217, -0.08538622435548314, 0.030461799759204, 0.11407006770401505, 0.04084957887645519, 0.07285466672361647, -0.1648661122119325, -0.03938052327807341, 0.015228307881569321, 0.030689635366171867, 0.02334160238346561, 0.14278097908914214, -0.24903013429175722, 0.028249056210067444, 0.06499874811871446, 0.16213192417715008, 0.1312054893934375, -0.10886499645434544, 0.02592014627135319, -0.015061100785358961, 0.028074228211359926, 0.0900586312249159, 0.06271000204826531, -0.002150303763967744, -0.04551478869597588, 0.040095341036132354, -0.013385959518167035, 0.0721590915159958, -0.2169046709675678, 0.07798069826951307, 0.21259048331102529, -0.11199238903367968, -0.1244399594543401, 0.17451512421349424, -0.0712102625365952, 0.010607975296832283, 0.06361611142388608, 0.01089710012583785, 0.012100804909140513, -0.22569238474254832, 0.07442909700243833, -0.17911932415437826, 0.029376049063303045, 0.001291914065959066, 0.19540107197635223, 0.012134039437372115, -0.046129258717065295, 0.012980874711973088, -0.10819733036519928, -0.25964510101019356, -0.10827075985035066, -0.25732582858340597, 0.16530644682554924, 0.30977479011388653, 0.11051022895212165, 0.05990892315815736]),
      |      list_dot_product(v, [0.052593493667023095, 0.11360631704425828, -0.07402780062272511, -0.08575965496948756, 0.16487536921068857, 0.05464093824537975, 0.3124373426219571, 0.08313727093473652, -0.06718331519681303, 0.05533107314034348, 0.009527109830763951, 0.048950985789187385, -0.1414328447324759, -0.03009417934037621, 0.03557309306180405, 0.041102711468380806, -0.012777629821550555, 0.11708177093062253, 0.15709247591531245, -0.0025429036986065437, -0.1643581282499366, -0.2428784421010984, -0.10541014723809111, 0.024090747286022486, -0.14439440070143408, 0.00534492999430136, 0.0840302418169494, -0.22789054933063987, 0.03755322115747772, 0.05934380526369349, 0.3734428609036541, 0.04084657183219356, 0.12366182609983982, -0.05399494425015901, 0.015517577881241076, -0.26589091567301193, -0.07889074955484389, 0.016816722274819115, 0.03431183917665056, -0.06007585240003902, -0.025299072224203085, 0.06558988667435407, -0.06647966070029221, 0.101217930744492, 0.31659480007428875, 0.031879233247107175, 0.22407305996776966, 0.079185817318645, -0.040549881385763445, -0.06095174210558638, -0.036029040060733, 0.0807349281305109, 0.014222503027202084, -0.19013365723135564, -0.0846961920242704, -0.11944484626298738, 0.15613712945980296, -0.052377058413183596, -0.09387359787024506, -0.13640681000306695, 0.0055040211596505, -0.15186482589880815, 0.04468346668890832, -0.11094926024697088]),
      |      list_dot_product(v, [-0.10787103982484096, -0.03250233166150209, -0.08832367289534691, 0.06619382025178297, -0.041586956106049, 0.08909548077590371, -0.03886721246171471, 0.09351235175208178, -0.06386701772036543, -0.05185927948529816, 0.21863027747715905, -0.17058898090717695, 0.1016718402946563, -0.2309943501653401, -0.08296533639681315, -0.17665597265890504, -0.0991158772841154, -0.056717705792772674, -0.227244033929629, 0.057998799307976835, -0.045022523725664176, -0.1156086740987907, 0.10560002950674684, -0.06851579153493845, 0.18648167058598825, -0.15593255365371436, -0.06118082673743356, -0.0483825654405542, -0.10990405698358488, -0.14427273520977218, 0.28232479572539093, -0.23428069121122724, 0.34440726124655946, -0.09489044697697041, 0.020858363843744364, 0.05801766901116757, -0.004186226730627027, 0.004667291393547143, -0.1472601302922624, -0.2074956103264373, 0.0891018171868308, 0.027494355392110294, -0.06950349141108483, 0.03620645476332798, -0.0846931200239981, 0.22393161110340107, -0.203600084041873, 0.05195029587397822, 0.07192513747674555, 0.0364638221234156, -0.08531356048589943, -0.07017623595013768, 0.12942736689672668, -0.02633435362498124, -0.009666488690266413, -0.17792423410787211, -0.06961127284007429, -0.0018506564719176037, 0.07997575492366175, -0.030962440002029145, -0.01019816144319695, -0.07535838423232324, 0.12860638444889355, 0.1512177243910959]),
      |      list_dot_product(v, [-0.11908276955939832, 0.1544533491643649, 0.19015600071424077, -0.05645122767481035, 0.09382814861545302, 0.15814948661609468, -0.2020729993528114, -0.09216812257718851, -0.013059014390418287, 0.17620246718570748, -0.008733715329563616, -0.1362421836469, 0.08346561014875438, -0.01573691458329522, -0.13120812833892762, 0.09466328179955039, 0.049902602980613, 0.04734032752763539, -0.20012358648512948, -0.009944496381128065, -0.014774642931970084, 0.030586321258019133, -0.04273912094281035, 0.0033210747408777383, -0.03525469569927321, 0.10083683460145339, 0.35896631354138314, -0.1730899738063606, -0.07682328556064964, 0.2156287396565476, 0.02794412048536156, -0.010673910251098786, 0.182693394619778, -0.14899722267994386, -0.15881995472914767, 0.03698484915877048, 0.12229599501591266, -0.06845905324850808, 0.317851932849784, 0.13987760124078197, 0.01955012735780476, 0.09301085098928061, 0.004147180393234246, 0.07165875384306658, -0.08361568209836, -0.01915872460553624, 0.08654690737298298, -0.06989197155960546, 0.19123034845052025, -0.12499926389646382, 0.13754202993022918, -0.06696415772005425, 0.16763365331833388, 0.052961555483843105, -0.09192530415237876, 0.11740313585477188, 0.061024553691164815, 0.03397128345184025, 0.08684365422451663, 0.20300173837290733, -0.12817513038767434, -0.11037444852126525, 0.11931602818050635, -0.05741206633051526]),
      |      list_dot_product(v, [-0.05208839275281022, -0.13050253993046043, -0.07968820903330058, 0.055884795586629156, 0.06114093966690773, 0.013182343748192205, -0.1367078223338193, 0.04743323210339242, 0.013051104150672246, 0.024646472959109024, 0.1986133786002083, -0.2795035747960826, 0.02236565863498211, -0.19950067691377563, 0.13448742950362674, 0.0374939593009954, -0.11419727286197924, -0.008147344203780172, 0.03517582653440748, -0.2677372172495607, 0.3014287172971226, 0.03602252651668692, 0.08329559576200812, 0.15119310383221252, -0.023830203841039725, 0.17169018934644584, -0.20498751010812458, 0.0048135043196877204, -0.043868726115094264, -0.04345515405005485, 0.1377184142706809, 0.05589874636541001, -0.0068986282275238595, 0.009954886878367139, 0.03486398062530267, -0.040294524002889645, 0.002854504375469458, -0.1659066644142595, 0.1949186866414483, 0.020156989627387264, 0.12113881887447968, 0.16620270951041322, 0.12071307642537478, -0.15237542494606965, 0.07538154279652864, -0.03415232638488226, 0.28396184804442326, -0.025411473123384633, -0.09925282962428644, -0.06378172985966848, -0.16784824815887558, -0.010448286639952174, 0.05063298427567901, 0.1605590000935177, -0.0778751675099602, 0.17039792351616742, -0.14360229714537856, -0.11025604215849737, -0.27252180960575795, -0.06816093379112279, 0.06548773783136394, -0.02779115626877266, -0.01710079124875672, 0.04462230843036494]),
      |      list_dot_product(v, [-0.17568372254424677, -0.12211655429415227, -0.05258202170826292, -0.07469182489387761, -0.13818571750971798, 0.08703864764934836, 0.19953462933030242, -0.03454289344294349, -0.08331400494515803, -0.13168989885355412, 0.021298412076829587, 0.1482703274764822, -0.08822015569669531, 0.05028255849841164, 0.02306540592667673, -0.04838305249994385, 0.1542820605835008, 0.042277794199077914, -0.13280691250740143, -0.06051502502882461, 0.11353696157833121, -0.030351005158916, -0.10037434100316056, 0.3103784762147309, -0.10471414507076292, 0.010301742340461217, -0.1633615131147704, 0.13620270275480192, 0.04282819870306619, 0.08917892464120862, 0.05967293585681635, -0.0752911568872097, 0.07412226425541099, 0.07420067879427047, -0.023635308796836105, 0.050368117641390826, -0.254452322687109, -0.06788265350675221, 0.10068634274189199, -0.018296766341699577, 0.07829789720883772, -0.13797715708948055, 0.25731098748440373, 0.013471840241666599, -0.028912072976493435, 0.07420703775623749, 0.040623571468397776, -0.23003008572584985, 0.039787315171640955, -0.23214384466914736, 0.07981930184981281, 0.19076740386916746, -0.07002870442571285, -0.17243682269409263, -0.03352425007486669, -0.00872844626958117, -0.2242438031668938, -0.023233418265251292, 0.26912452799896186, 0.12399104994347232, -0.20296675304984746, -0.07563482608593802, 0.09834322332369218, 0.01342607651300232]),
      |      list_dot_product(v, [0.17412728361989077, -0.10213663389653538, -0.062253222117119526, 0.22137758354309814, 0.04033376531888296, 0.07702302601940562, 0.012136897746002928, -0.1633254837569183, 0.21696989447764625, 0.0140975407721971, -0.08110171573455087, 0.17458872129344713, -0.14982567982601308, -0.13468358481319712, -0.15086633923664533, 0.17027262285407602, -0.057661069247814785, -0.12178127295087818, -0.1416765766133739, 0.2587954047137041, 0.18400402865470905, -0.09587778641795196, -0.16581064738875942, -0.0878749539001395, -0.09293597087904658, -0.14924089035184407, -0.1259735774835687, 0.15539417877156703, 0.0720011852523835, 0.17441493935099403, 0.10632333522661636, -0.004500674004080613, 0.0400761020802268, 0.09784219420255738, -0.1597792263058883, 0.12636648688974308, 0.11318054348640731, -0.17692916497787495, 0.02364040488066004, -0.06637887088969631, -0.11747237836699484, 0.1487646330559176, 0.009713042373178786, 0.07340754076616385, -0.009947284972485667, 0.20225703782505097, 0.1884649971935993, 0.015556153486001527, 0.002736877722186056, -0.09607675438402159, -0.06364286461883206, -0.15107490627027378, -0.11375929952854565, 0.23376875466856176, 0.004867211591574048, -0.07269846436232745, 0.07204952536476941, 0.016171477462420814, 0.07918766930666771, -0.15483393622395594, -0.03634858607905077, 0.10734058613987904, 0.05544916213942951, -0.11585213202837708]),
      |      list_dot_product(v, [-0.19060229744532345, -0.0028391270831949894, -0.01265269380110024, -0.16591103851771347, -0.0293721923260438, -0.01594582044308896, 0.0743093288484112, -0.1300682450094597, -0.005232654309656512, 0.02135177290648818, 0.10969259130433198, -0.01892726022045898, -0.17253433764417567, -0.020000006456255694, 0.11672927277442384, -0.04794117040945936, -0.07718572249390072, 0.051189976699694315, 0.19677269376539466, -0.0485534188401776, -0.01640193121330505, 0.14602697357898048, -0.02198073751343474, 0.23434686469334176, 0.10293041354780037, -0.14446492855362425, 0.10388757957146263, -0.14500079606284375, -0.13519850771509076, -0.12059961376410842, 0.145295849716633, -0.1835621763355366, -0.19016002127295256, 0.12015879929913141, -0.1914207973740019, 0.03770162812581218, -0.049283886747923965, 0.03254419129307255, 0.08643018004800841, -0.22943885882322523, -0.038702067063482504, -0.0013759609549472177, -0.11083631000540405, 0.20058682228594366, -0.1488658335912809, 0.025838361993070536, 0.09085278438651948, -0.17705880553510342, 0.06963750171970075, 0.16987362167820294, 0.006595176089186593, -0.17281104488408383, -0.08251602035200378, 0.26915225160595174, 0.2047366919041596, -0.05352186913452125, 0.010894713064456454, 0.10978205326064054, 0.0031744075828747313, 0.06411724819241373, -0.04247395529006682, -0.0528454629218704, -0.2204493294655504, -0.2237048716489411])]""".stripMargin

  /** 32-row extension — third point of the trained-rerank capacity
    * curve (rows 1-24 identical to [[gateRerankProj24Sql]]). */
  private val gateRerankProj32Sql: String =
    """[list_dot_product(v, [-0.2096393298887029, -0.12057271530460328, 0.03654785829099375, 0.01181956705207999, 0.07567008221654345, 0.013214628527288186, 0.09058411826856812, 0.2866187923432374, 0.04954696200812782, 0.4140565265568779, 0.0653049813495429, 0.18207885414308053, 0.06513224154456904, -0.03653205454058415, 0.17114897511870436, -0.18534977721254273, 0.08898987401709364, -0.1570265554534968, -0.030136686338868745, 0.03217896964106663, 0.06121320421931407, -0.11068832310461507, -0.08347512790974954, -0.05543746810299688, 0.01955001247293548, 0.199125429101352, -0.03751725273394648, 0.14950769890198098, -0.1728796307730548, -0.0061231136919325056, -0.05871572670446115, 0.06203771800325117, 0.29653854323357254, 0.10616457886972945, -0.03204193889844021, 0.10414385120144753, 0.04453875945639852, 0.06146405307635499, 0.013006697593051642, 0.0217712055199728, -0.11667898800999403, 0.0055245863932987666, -0.24083692018991473, 0.09570759089248622, -0.02830770871376086, -0.22512744449721753, 0.00873183574219243, -0.07903750844473234, -0.08368084425577953, -0.1184509112478963, 0.12045949856582461, 0.07248325171851451, -0.017186482327944893, 0.0816043743090242, -0.015031356046457896, -0.06676477470729585, -0.05565063579441348, -0.05137605787848301, 0.0601960176213444, -0.09113914308767156, 0.121986995952936, 0.05064983370857072, -0.21821146481626008, -0.10201388625038872]),
      |      list_dot_product(v, [-0.0038371279617273185, -0.0544302462823619, -0.012567933982260658, -0.08813365806325192, 0.17485769809344773, 0.02521436661842459, 0.07494656315169955, -0.06998070122115854, 0.07744817056372585, 0.0306960564936196, 0.10575814447888733, -0.017882871949512658, 0.012975656704351014, 0.13369681740864628, 0.014559198672458721, 0.041391918626085066, 0.14841100081548175, 0.3603098505373251, -0.05418865139534617, -0.050764776404989116, 0.03254316995693874, 0.03539112722241993, 0.06533467356515074, -0.30912280610523757, -0.2576821378373395, -0.23906586244665406, -0.020637632543040293, -0.00022331397267936454, -0.08628570417537818, -0.17453292264876824, -0.024067927535326557, -0.21754493564306318, 0.029463935901408604, 0.06153867869300636, 0.033753328092335666, 0.0792196747089228, 0.0594671001842065, 0.03649840314960093, 0.1821069815633818, 0.04667388411136273, 8.62660749631475e-06, 0.04698675544039907, -0.06276704708795283, -0.17918979603487012, 0.17268649054818383, -0.18883522299222677, -0.04694587122780484, 0.1457794818853693, 0.11292397747408493, -0.11328063295411481, -0.1574310439224033, -0.08197501102737904, 0.012979946675149045, -0.016092353814505328, 0.2380351499186687, 0.023384317110773288, -0.30282027565730096, 0.01638284028535263, 0.13543364401259417, -0.12158606640794313, -0.08367049587761356, 0.08483882960712978, -0.00044318531741244466, -0.07861587027401377]),
      |      list_dot_product(v, [-0.1480440376166867, -0.08512440683182432, -0.06394747392221323, -0.00045759766154713447, -0.20437466447815603, -0.043741735322772785, 0.11775529986009056, -0.28449785383575205, 0.04440239625350731, 0.023717337421497328, -0.05117952731173255, 0.035702032580539944, -0.06017956428660729, -0.03455060652140849, 0.009449519530006438, -0.23454575665525335, 0.17137352630281838, -0.08492758911964332, 0.11604706755579587, 0.07732840398964902, 0.013131627408544804, 0.17530755042876156, -0.10064801525288623, 0.05337470463075121, 0.09255730984555612, 0.10008395088098784, 0.09063736269590784, -0.13414209829345178, 0.01027769679436893, -0.10540482716914787, -0.1228596688774243, 0.09091210800723112, 0.04825216647449696, -0.1806613024742493, -0.029769890053288117, -0.10216258317025517, 0.139078499674634, -0.21255244137229035, -0.06345652317087329, -0.10392899552393761, 0.18947963438646775, 0.19011010093130634, -0.12585555780151772, -0.20893277847828234, 0.16586568212498556, 0.052836276545896566, 0.042797575089323976, 0.018020013799672673, -0.0683200926687484, -0.05127551197754947, -0.129498444617984, -0.10645450076880321, 0.22780031621678434, -0.15329476801869799, -0.17915209442332675, -0.0019200155656372096, -0.005381094449715372, 0.10972460046809979, 0.1827952418076938, -0.052685084379371146, -0.06955779264431118, 0.28843060606803783, -0.0900810775591765, -0.07553050152074066]),
      |      list_dot_product(v, [0.06808659617107013, 0.06269221034507544, 0.008780756291902829, 0.17252698629724822, -0.25796105142377507, 0.10712924678340989, -0.02320920865339409, 0.1775430920778206, -0.11522019032648376, 0.1362019581887693, 0.007640884616088507, 0.2019504752264874, -0.06077544603931797, -0.1402193530299735, -0.09311367930173033, 0.04930806442413942, 0.09682486376301348, 0.07142426922661867, -0.00931947753795057, -0.20316848738697266, -0.22547295142110013, 0.1576589824909524, -0.01185644101976479, 0.07323162442468027, 0.02747074840432716, -0.11908308279569853, 0.11645429190009153, -0.003835251879435034, 0.128924483280504, -0.10452312753727482, 0.15211656450619318, 0.20057539672429608, -0.08141318120622575, -0.01767747009308199, -0.11650295068092, 0.3161901219352154, -0.11671862126847647, -0.14843441785803368, -0.010252064972907794, -0.0482888647136251, -0.014507536911966358, -0.0001791954993268919, -0.08565322573537927, -0.017434762364318124, -0.07573379886438383, -0.041520825710729424, -0.013620430642481383, 0.36940447497223333, -0.10851089330440519, -0.15344609910846213, 0.06647233936408717, -0.019778009747410476, 0.009329624288528838, 0.005401021117891712, -0.02191754120141075, 0.10147291451921545, -0.17091025548621483, 0.09292951419066811, -0.1707204267750972, -0.07391767705582912, -0.1920604341731429, -0.09621918482076991, -0.08404634309155423, 0.026296885437333755]),
      |      list_dot_product(v, [-0.015085348120897488, 0.013517866322738688, -0.1738913215105934, 0.022537423699724543, 0.1689669835338632, 0.308663092373941, -0.25309505887395906, -0.10693042050185084, -0.017906201683455584, -0.06613281151068452, -0.1428483543962177, 0.36196189641526677, 0.1183037518455793, 0.11743309986423989, 0.11494380609248271, 0.055716543655892334, -0.11872343465207409, -0.11316167307071197, -0.019020534821124317, -0.24534483108957608, 0.03191823557688075, 0.03445191726855629, -0.011091879502073425, -0.1092700186485836, 0.1247495802276556, 0.1661688457648067, 0.035268547683974735, -0.14137833669818928, -0.026189293123713906, -0.18259915776827232, 0.04226625299184844, 0.01617219600339077, -0.062291916307996, -0.028462605745763862, -0.03986889430500577, -0.05384707971138738, -0.08802504523973873, 0.23525140078205894, 0.04905411909364538, -0.2630745915620057, -0.05655833960087571, -0.10089456889856754, -0.007513654901444103, -0.05056559020281365, 0.11724159660229803, 0.00909173231963109, -0.034998759630067135, -0.020604323600056505, 0.1029622744082804, -0.2123546020760255, -0.13375687582477258, -0.08333561323277253, -0.16669651241892552, 0.09694053178981965, -0.21787743523093225, -0.004216181382370467, -0.0056303030828844, 0.04229455916136345, 0.10565659774872106, -0.004698641778361815, 0.054063488227313584, 0.032495247709906444, 0.07261703283515797, 0.06545658210433099]),
      |      list_dot_product(v, [-0.08544207432204978, 0.011076242603358691, -0.17443305265590983, 0.19971582219041994, 0.008519457881276431, -0.02935471695924241, 0.1601854483282556, -0.013846588231743935, -0.11290145026925524, -0.04229772763615404, 0.02215837592954279, 0.03605046737492949, -0.18230215326263874, 0.47848072382344314, -0.0855178890359329, -0.01742052828909408, 0.02487550136526526, -0.19661496092675998, -0.2096973241956091, -0.1028900721601691, -0.06340424722110032, 0.03467842317456618, 0.16836503443235823, 0.034224946986031214, 0.006176513540205398, -0.022542978784031265, -0.18434962804948762, -0.025273527110866747, 0.012000127541373187, -0.05242866214814738, 0.16064800774641338, -0.1022565629201026, -0.15891143437992122, -0.18394127625248274, -0.09522292030690598, 0.01510491834256832, 0.17046990904157036, 0.05533662662323694, -0.07520278585507517, 0.20414407134629228, -0.04185251864322473, 0.2693909843068852, -0.17915567132796956, -0.04481312533100017, -0.03845338275380937, -0.11610530015711702, 0.12082475552926904, -0.007047024621070887, 0.03018452289435541, 0.04781309681074078, 0.16379575044319056, 0.014019727572107586, 0.06607626189729801, 0.11155759428852742, -0.09857967214015743, -0.09315850580605163, -0.08969349412055531, -0.10318157153595685, -0.017876518045730608, 0.13658262044638106, 0.07658137886368489, -0.0741629121973258, 0.07691180919317583, 0.01438097973016509]),
      |      list_dot_product(v, [-0.10467703292507023, 0.04334903504221634, 0.3308233470650587, 0.05281115184473054, 0.07154724205472202, -0.23957893360351684, -0.03597020654015932, -0.050250641132589514, 0.005446402804742112, 0.21559012668165944, -0.25725132561638314, 0.08007311442449916, 0.23352969284526776, 0.06344687098257198, 0.10695937191677082, 0.1955439817106363, 0.054971511275471986, -0.15899119512125737, -0.06773789116001962, 0.047291573436234725, -0.04121476186754304, -0.06668512581500982, -0.047789904603888364, 0.027070001394115525, -0.058880629419696254, 0.008833017756778553, -0.13899058812701734, -0.15865816065046964, 0.04030695091311882, -0.12584152749887786, 0.1536627623941165, -0.2258604132968827, -0.1118205963995829, 0.10493781265704775, 0.014503369082983258, -0.1889169071945566, 0.007213010192439393, -0.20401995155304276, -0.1325508587703797, -0.20449431805030832, 0.19571794539837029, 0.08722166916767601, 0.02497069736099032, -0.017672627704236707, -0.0660191626253017, -0.06466506782848237, -0.1365952505069631, 0.04433184641562781, -0.13211726964580775, -0.08608364415165777, -0.05007145762415633, 0.2181817858199934, 0.04603151283336087, 0.14948532624137512, 0.10036773938087057, 0.06536654155335096, -0.014218163474809297, -0.011947691048657918, -0.02457567329760616, 0.014622710123163086, -0.1582386980748425, -0.04525846368862706, 0.13015213654991284, -0.03712294567746925]),
      |      list_dot_product(v, [0.2805383455034073, -0.137159068274947, -0.04126691983842415, 0.07332610272758885, -0.01915856015041477, -0.1484889228798103, -0.11300436632177575, 0.08889731712752802, -0.01738314096039128, 0.09350298159624965, 0.15384331628023665, -0.09533876249483555, 0.10336994119057698, 0.022934883350988755, 0.07543842933934827, 0.1817821364596508, -0.16023107995157695, 0.02863289313541672, -0.05134798832161909, -0.01784053143187217, -0.009984333282282983, 0.16671736641528406, -0.003604162613596266, 0.25852724072784683, -0.15791550663271547, 0.056127394883355226, -0.09822172443260359, -0.04030024118148526, -0.014822405091699622, 0.04401133537695877, 0.048236812101427204, -0.08010611885247772, 0.02962548663678636, 0.04561400074531209, 0.10346268534199121, -0.20726140058828002, -0.1447950019983398, -0.11211549391802472, -0.032952267830433264, 0.027501797591824816, -0.10105638215459326, -0.1273095663983796, -0.1910163434443146, -0.08899294753872994, 0.11129272034438159, 0.06580293967408658, -0.14256338903430027, 0.21676374415790195, 0.14131254412166414, -0.018008175161939765, 0.23205685573787285, -0.1950872094033455, 0.010139005554459976, 0.016706225205014275, -0.18769487116240152, -0.0493111858663107, 0.012939834186746622, -0.045929943712831614, 0.31640769168013066, 0.13303036667096454, 0.003273279793939948, 0.05165375718695988, -0.15850982818782847, -0.20279568139216406]),
      |      list_dot_product(v, [-0.09400136406134635, -0.17858118026823094, -0.011990174422561898, 0.07855288335767155, 0.25745238779668916, 0.24111357070859718, -0.2370063927223251, -0.032416200048377676, 0.07439213289719844, 0.20916924037256493, 0.022606019693383883, -0.016031193470633837, -0.22230913787162276, -0.08487446828698016, -0.0188464150481108, 0.06048439349583417, 0.1806939397745643, -0.152059945711867, 0.12095737785505364, 0.021954344705071877, -0.10111875432768386, -0.1218700890795787, -0.029393583350761084, 0.20280486379521262, -0.17194991139378263, -0.12022886759734018, 0.075067414300294, 0.11793320902028198, 0.12779487223746278, -0.21596573220307994, 0.06635406584041018, 0.0016326354306457189, -0.08158196264898313, -0.03091910613214687, 0.17496070507544081, -0.14906364063458252, -0.11406843466361918, 0.0824168659991194, -0.11469069379838656, 0.16325478216602032, -0.11413046098876155, 0.11082464502198774, 0.18682363657071838, 0.14331843274791287, -0.05864357030559064, -0.10512099736626394, -0.09269594620154757, -0.045245927346829, -0.02160757996094417, 0.18362780431974673, -0.0006807095965764162, -0.14225924791260292, 0.20595752443822185, -0.05921109658737278, -0.03278848042257651, 0.03578540291816122, -0.06125576036431634, 0.1257410413083171, 0.0737185635350656, -0.02798548043569417, -0.06885857308792959, 0.10117540731846857, 0.019620996654309896, 0.14813583121822133]),
      |      list_dot_product(v, [-0.07769545710948746, -0.18127723002272458, 0.005521138596168852, -0.030542171595549547, 0.08165672799380982, -0.16634571681937174, -0.1363280277010479, -0.010566521998359257, 0.23758842834858857, -0.020841326036543047, -0.03948370321555947, -0.04029723087567861, -0.08440273356746149, -0.00817567111657084, -0.0853790959271549, 0.037111601070557464, -0.08828119708596073, 0.13326276894242708, -0.03431448888704631, -0.06565016468433305, -0.023746650381736185, 0.18625293929527814, 0.11630224564749535, -0.12101696891115782, -0.10599030714929376, 0.015834559794443943, -0.11129836309693665, -0.1886652621602717, -0.07751643786370158, -0.08841171240511599, -0.030380882866962913, 0.2767244756123536, 0.007948125205059374, -0.09277588279766351, -0.003658922812019594, 0.025162678996863422, 0.01049253586828065, 0.234368333669906, -0.14035268483713573, 0.03526081266322076, 0.05787658499801702, -0.09436182545392294, -0.05276382993392728, 0.34796973849820917, -0.02315627809811819, 0.2697525674300845, 0.2238036223739356, 0.0687069271315806, -0.17717108223484515, -0.10435054830887631, 0.021393367538072756, 0.2782403781539413, 0.1977892662585688, 0.0718263405759096, 0.053483343420581336, -0.02215041112870231, -0.0691851909071283, -0.03683910291256836, 0.2211365831970071, 0.011408861552017749, -0.09564106318238327, -0.03211374240474151, -0.053840881119338754, 0.018862317850668973]),
      |      list_dot_product(v, [-0.06632766747763331, 0.1313809180411261, -0.1108282606385717, 0.1208821284499155, -0.040673550967224394, -0.13403048976529447, -0.1591465143226239, 0.13238423886522546, -0.12661093786812277, 0.019641637496928727, -0.187481184240348, -0.12025880051969981, -0.09122186934339789, -0.18369213818587798, -0.036499629207933613, -0.05260571734753703, 0.1629095104594081, 0.1334442929845821, 0.2366917771877396, -0.033939710857111206, 0.11020713965984279, -0.11902636942988888, 0.2520208345768142, -0.06462929646705562, -0.02053808701978451, -0.13048901271567118, -0.09009929531130906, -0.027405256332144422, -0.10556763923873559, 0.1196632605210045, -0.026363044844634826, 0.08079795677915748, -0.02450307421625312, 0.034922303555901014, 0.04961726094071068, -0.11035955569850758, -0.053621583402698084, 0.0908383040613553, 0.08541741384469925, -0.062103760575860485, -0.12120336981768148, 0.33071454713825027, -0.04093795544097512, -0.08300721638191355, -0.06098710451828418, -0.019199936069804243, -0.08211616349072666, -0.030916856023136177, -0.04491455292328511, -0.2213783364602069, 0.03307413385641652, 0.04985037788136047, -0.22148980788474032, 0.05465447895987568, -0.05788992279509937, -0.27222018764962747, 0.0865241705743037, 0.12489613659920981, 0.07917044827818082, 0.26825673282026485, -0.19023889820532391, 0.1241567888641089, -0.019627303432728196, 0.04102209833994513]),
      |      list_dot_product(v, [0.05003710591151538, 0.08726899861175451, -0.08660603989489009, 0.02928008028278539, -0.0792723604435672, -0.024337304437313367, -0.09379824927033316, -0.16079923892819165, -0.07827827416611104, 0.21953842684999467, 0.1603595017109873, 0.13075314296493537, 0.05044929338393101, 0.08115458007297398, 0.019616343590176645, 0.0928005528199348, -0.04549335164444196, 0.2615707764883349, 0.1791998012958293, -0.06490017702478365, -0.0035156404059955185, -0.15449151232275732, -0.14393405424422873, 0.02271702719119439, 0.1266812721126732, -0.2833765615179294, -0.17434870397924063, 0.16138383573791096, -0.15243906387024098, 0.03480087577584583, -0.05752965741751008, 0.02993948437269438, 0.07686295694498026, -0.1476665093323185, -0.12522941045618324, -0.15155252574098033, 0.11097281618348698, -0.06585287596661532, -0.12876287650123144, -0.10139964586094598, 0.08563219596761018, 0.031210127269826155, 0.06738638521596356, 0.05656899481507609, 0.0764804812281481, 0.04290494629751998, 0.04428952556500077, -0.030505309676842632, 0.09093067454643752, -0.09741919995029803, 0.24306615312347635, 0.12957385676679173, 0.08018285042893529, 0.03839579517201452, 0.03592750930270206, 0.24942474170820314, -0.01647887547160015, 0.22490456282933116, 0.014060078943620507, 0.0742957106975249, 0.3126180354195202, -0.004576143303239876, -0.008375018474654414, 0.18819498652488204]),
      |      list_dot_product(v, [-0.10947141972764758, -0.0016952657300114864, 0.000626996665021595, -0.03165281682074804, 0.005428726496680334, -0.041084264407123046, 0.06070853947336476, 0.18211286013718747, -0.16469955253768886, 0.03432687837509851, -0.11228885349753219, 0.12116237851728424, -0.04961130136275198, 0.005339225046258029, -0.20885084892740377, 0.2897206386904462, -0.2124482891499997, 0.04215025813125414, 0.1915150976015177, 0.052840027578610525, 0.026816366077064495, 0.0022051078124579603, 0.004420278143045, -0.001713470617042255, -0.18874270691886016, 0.04311013295471919, -0.13709798748907248, -0.1614390647959489, 0.10462007109311422, -0.13921350577805455, -0.08694611848009885, -0.037111533281235044, 0.15170978790351589, 0.12840345209754347, 0.005550688956452556, 0.18472028215579905, 0.21366004094817198, -0.018179941827563526, 0.016073734193005708, -0.06651371393882569, 0.2196624273186203, -0.0859846734944447, 0.10505554349601193, -0.08457265824213005, -0.09786783371839984, -0.06922148126876126, 0.1172038002186873, -0.11187878318343811, 0.2921442966823453, 0.07689978727529719, 0.04018507906003979, -0.08344126726994357, 0.13979364549617979, -0.04516800105388613, -0.15324638877470337, -0.20352606840626164, 0.03713433298650906, -0.00024769397832989887, -0.0406311730028915, -0.027043131646227174, -0.0622778737911749, 0.07333479790138524, -0.2346911335276097, 0.24671597769197454]),
      |      list_dot_product(v, [-0.19689398700817617, 0.0025371265311852037, 0.12186596636562562, 0.10240890271650518, 0.07814494185798103, 0.008582810626444505, -0.03697645974550576, -0.06542231481390687, -0.13586728357179953, 0.07388908722530156, 0.0053049650856987155, 0.12485301168515417, -0.22373664591493303, -0.15186166219383734, -0.07588235160813901, -0.2510961326103161, -0.18454397247066281, 0.02371067027644102, -0.027515992176765793, -0.011616456010000067, 0.14755753465981772, 0.20478934859439513, -0.10973315083024392, -0.06187125616612763, -0.05170370408961863, -0.21094539091596812, 0.03796198170997332, -0.11524746696834422, 0.1860915666231519, 0.22845919235057127, 0.04409500845940704, -0.23515698676318694, 0.019183069651032975, 0.23805100751094244, 0.08483299521194985, -0.06620368351607497, 0.13600230087898052, 0.17937914789543769, -0.08327560009515234, -0.004914166516078895, -0.07491932266068634, -0.14202782144180975, -0.03459721559610937, -0.04370438083793603, 0.0949722260805846, 0.0014658976480054497, -0.005785214062767768, 0.12656036964071243, -0.13852383554749412, -0.018141171208210956, 0.016382282072574843, 0.04937033474995374, 0.01226451153669905, -0.07142289534469688, -0.1239580105464764, 0.20032238156421311, -0.06539487513671083, -0.1701408667969809, -0.13580431328684425, 0.278936821127855, 0.09043245503619458, 0.14260758019106298, 0.010443358104778675, 0.016220262121011023]),
      |      list_dot_product(v, [-0.051457827187467636, 0.15977307622921563, 0.005756379682962818, -0.024866621886749204, 0.09828342600326256, -0.11045200384249787, -0.04182570577877159, 0.0248257694806527, 0.17485497509427303, -0.14678199656786461, 0.06339335923327208, -0.15941091133720964, -0.011650871116009393, -0.06738937790734327, 0.2810929865627124, 0.06449050274424478, 0.15898611034754725, -0.03437026177694379, -0.1119709725374098, 0.11317424559563329, 0.11887340567409645, -0.05994055125246724, -0.10192081326152708, 0.33293747966673937, -0.06916865567169937, -0.16351598856174918, -0.029357927565058985, -0.12018017094517029, 0.1855956013679997, -0.0628269855268284, -0.2203059528362397, 0.0376608736924009, 0.008169536317786573, 0.020932417915671662, -0.16789153074873198, 0.03721068409538705, 0.1738990731357094, 0.22704470721575384, -0.18137821205386248, -0.046314938701612365, -0.0775938734653261, -0.03697600293689926, -0.2795463539912775, -0.04790387432448614, -0.022600304153480397, -0.02663371368761775, 0.03306528595295859, 0.005796771381911172, 0.1308185746798335, -0.2665705927832332, 0.021535267609141144, -0.08729660337506741, -0.04329823454430094, -0.10654810092471605, -0.08474862676900095, 0.030074852245366584, -0.03435788332325232, 0.061078988114918284, -0.14061497892028935, -0.13650280777663373, -0.0626195021217009, -0.15662391819533206, 0.07477946763477863, 0.1399787178894721]),
      |      list_dot_product(v, [-0.02562159860751807, -0.03026644306349051, 0.21928698265730043, 0.19162058497071055, 0.0612241612451374, -0.09679150549103827, 0.06952195725926845, -0.060029967911578185, -0.08105065132517715, -0.2151250390930884, 0.2527628596078477, 0.04331942362595786, -0.038379079729809994, -0.15035564753567526, -0.10899873017506238, -0.031525266632877955, -0.001985081069268935, -0.07803740414904776, 0.009312608151338829, -0.19909958593543262, -0.05433438324156491, -0.070065751851181, -0.09127304781842052, -0.10606251337303402, -0.04624308235077267, 0.2141619993182913, 0.01435486772971217, 0.001001830191205151, 0.24532941231054645, 0.061228950167275864, -0.13122543152011298, -0.1803968195625525, -0.016117885487245836, -0.03272180143509729, -0.21598382318578094, -0.236483044120189, -0.15459605783656527, 0.09896183894508379, 0.2070939513578071, 0.04122284108075342, 0.13982556607190855, 0.0533675005465786, -0.12637116797948914, 0.03367387771684497, -0.10357330337966286, -0.05124726133679262, 0.05414001474884274, 0.13333565804872652, -0.09150752762630167, -0.0049295351594076916, 0.11552794886512475, -0.001926532779859254, -0.07437573824616812, 0.06809734800999229, 0.15273402230606176, -0.09299799431814602, 0.03211690532028537, 0.1955858069110934, 0.17594911357045132, -0.1594144732475997, 0.083246099941025, 0.047234444675553086, -0.08211948990579204, 0.2648077971350644]),
      |      list_dot_product(v, [0.06805053117751811, -0.11544219185568803, 0.1369320923478017, -0.13797092922024232, 0.01772194461626603, -0.2699616226934985, -0.2092998988605669, 0.06919396892744023, -0.0756992056626217, -0.08538622435548314, 0.030461799759204, 0.11407006770401505, 0.04084957887645519, 0.07285466672361647, -0.1648661122119325, -0.03938052327807341, 0.015228307881569321, 0.030689635366171867, 0.02334160238346561, 0.14278097908914214, -0.24903013429175722, 0.028249056210067444, 0.06499874811871446, 0.16213192417715008, 0.1312054893934375, -0.10886499645434544, 0.02592014627135319, -0.015061100785358961, 0.028074228211359926, 0.0900586312249159, 0.06271000204826531, -0.002150303763967744, -0.04551478869597588, 0.040095341036132354, -0.013385959518167035, 0.0721590915159958, -0.2169046709675678, 0.07798069826951307, 0.21259048331102529, -0.11199238903367968, -0.1244399594543401, 0.17451512421349424, -0.0712102625365952, 0.010607975296832283, 0.06361611142388608, 0.01089710012583785, 0.012100804909140513, -0.22569238474254832, 0.07442909700243833, -0.17911932415437826, 0.029376049063303045, 0.001291914065959066, 0.19540107197635223, 0.012134039437372115, -0.046129258717065295, 0.012980874711973088, -0.10819733036519928, -0.25964510101019356, -0.10827075985035066, -0.25732582858340597, 0.16530644682554924, 0.30977479011388653, 0.11051022895212165, 0.05990892315815736]),
      |      list_dot_product(v, [0.052593493667023095, 0.11360631704425828, -0.07402780062272511, -0.08575965496948756, 0.16487536921068857, 0.05464093824537975, 0.3124373426219571, 0.08313727093473652, -0.06718331519681303, 0.05533107314034348, 0.009527109830763951, 0.048950985789187385, -0.1414328447324759, -0.03009417934037621, 0.03557309306180405, 0.041102711468380806, -0.012777629821550555, 0.11708177093062253, 0.15709247591531245, -0.0025429036986065437, -0.1643581282499366, -0.2428784421010984, -0.10541014723809111, 0.024090747286022486, -0.14439440070143408, 0.00534492999430136, 0.0840302418169494, -0.22789054933063987, 0.03755322115747772, 0.05934380526369349, 0.3734428609036541, 0.04084657183219356, 0.12366182609983982, -0.05399494425015901, 0.015517577881241076, -0.26589091567301193, -0.07889074955484389, 0.016816722274819115, 0.03431183917665056, -0.06007585240003902, -0.025299072224203085, 0.06558988667435407, -0.06647966070029221, 0.101217930744492, 0.31659480007428875, 0.031879233247107175, 0.22407305996776966, 0.079185817318645, -0.040549881385763445, -0.06095174210558638, -0.036029040060733, 0.0807349281305109, 0.014222503027202084, -0.19013365723135564, -0.0846961920242704, -0.11944484626298738, 0.15613712945980296, -0.052377058413183596, -0.09387359787024506, -0.13640681000306695, 0.0055040211596505, -0.15186482589880815, 0.04468346668890832, -0.11094926024697088]),
      |      list_dot_product(v, [-0.10787103982484096, -0.03250233166150209, -0.08832367289534691, 0.06619382025178297, -0.041586956106049, 0.08909548077590371, -0.03886721246171471, 0.09351235175208178, -0.06386701772036543, -0.05185927948529816, 0.21863027747715905, -0.17058898090717695, 0.1016718402946563, -0.2309943501653401, -0.08296533639681315, -0.17665597265890504, -0.0991158772841154, -0.056717705792772674, -0.227244033929629, 0.057998799307976835, -0.045022523725664176, -0.1156086740987907, 0.10560002950674684, -0.06851579153493845, 0.18648167058598825, -0.15593255365371436, -0.06118082673743356, -0.0483825654405542, -0.10990405698358488, -0.14427273520977218, 0.28232479572539093, -0.23428069121122724, 0.34440726124655946, -0.09489044697697041, 0.020858363843744364, 0.05801766901116757, -0.004186226730627027, 0.004667291393547143, -0.1472601302922624, -0.2074956103264373, 0.0891018171868308, 0.027494355392110294, -0.06950349141108483, 0.03620645476332798, -0.0846931200239981, 0.22393161110340107, -0.203600084041873, 0.05195029587397822, 0.07192513747674555, 0.0364638221234156, -0.08531356048589943, -0.07017623595013768, 0.12942736689672668, -0.02633435362498124, -0.009666488690266413, -0.17792423410787211, -0.06961127284007429, -0.0018506564719176037, 0.07997575492366175, -0.030962440002029145, -0.01019816144319695, -0.07535838423232324, 0.12860638444889355, 0.1512177243910959]),
      |      list_dot_product(v, [-0.11908276955939832, 0.1544533491643649, 0.19015600071424077, -0.05645122767481035, 0.09382814861545302, 0.15814948661609468, -0.2020729993528114, -0.09216812257718851, -0.013059014390418287, 0.17620246718570748, -0.008733715329563616, -0.1362421836469, 0.08346561014875438, -0.01573691458329522, -0.13120812833892762, 0.09466328179955039, 0.049902602980613, 0.04734032752763539, -0.20012358648512948, -0.009944496381128065, -0.014774642931970084, 0.030586321258019133, -0.04273912094281035, 0.0033210747408777383, -0.03525469569927321, 0.10083683460145339, 0.35896631354138314, -0.1730899738063606, -0.07682328556064964, 0.2156287396565476, 0.02794412048536156, -0.010673910251098786, 0.182693394619778, -0.14899722267994386, -0.15881995472914767, 0.03698484915877048, 0.12229599501591266, -0.06845905324850808, 0.317851932849784, 0.13987760124078197, 0.01955012735780476, 0.09301085098928061, 0.004147180393234246, 0.07165875384306658, -0.08361568209836, -0.01915872460553624, 0.08654690737298298, -0.06989197155960546, 0.19123034845052025, -0.12499926389646382, 0.13754202993022918, -0.06696415772005425, 0.16763365331833388, 0.052961555483843105, -0.09192530415237876, 0.11740313585477188, 0.061024553691164815, 0.03397128345184025, 0.08684365422451663, 0.20300173837290733, -0.12817513038767434, -0.11037444852126525, 0.11931602818050635, -0.05741206633051526]),
      |      list_dot_product(v, [-0.05208839275281022, -0.13050253993046043, -0.07968820903330058, 0.055884795586629156, 0.06114093966690773, 0.013182343748192205, -0.1367078223338193, 0.04743323210339242, 0.013051104150672246, 0.024646472959109024, 0.1986133786002083, -0.2795035747960826, 0.02236565863498211, -0.19950067691377563, 0.13448742950362674, 0.0374939593009954, -0.11419727286197924, -0.008147344203780172, 0.03517582653440748, -0.2677372172495607, 0.3014287172971226, 0.03602252651668692, 0.08329559576200812, 0.15119310383221252, -0.023830203841039725, 0.17169018934644584, -0.20498751010812458, 0.0048135043196877204, -0.043868726115094264, -0.04345515405005485, 0.1377184142706809, 0.05589874636541001, -0.0068986282275238595, 0.009954886878367139, 0.03486398062530267, -0.040294524002889645, 0.002854504375469458, -0.1659066644142595, 0.1949186866414483, 0.020156989627387264, 0.12113881887447968, 0.16620270951041322, 0.12071307642537478, -0.15237542494606965, 0.07538154279652864, -0.03415232638488226, 0.28396184804442326, -0.025411473123384633, -0.09925282962428644, -0.06378172985966848, -0.16784824815887558, -0.010448286639952174, 0.05063298427567901, 0.1605590000935177, -0.0778751675099602, 0.17039792351616742, -0.14360229714537856, -0.11025604215849737, -0.27252180960575795, -0.06816093379112279, 0.06548773783136394, -0.02779115626877266, -0.01710079124875672, 0.04462230843036494]),
      |      list_dot_product(v, [-0.17568372254424677, -0.12211655429415227, -0.05258202170826292, -0.07469182489387761, -0.13818571750971798, 0.08703864764934836, 0.19953462933030242, -0.03454289344294349, -0.08331400494515803, -0.13168989885355412, 0.021298412076829587, 0.1482703274764822, -0.08822015569669531, 0.05028255849841164, 0.02306540592667673, -0.04838305249994385, 0.1542820605835008, 0.042277794199077914, -0.13280691250740143, -0.06051502502882461, 0.11353696157833121, -0.030351005158916, -0.10037434100316056, 0.3103784762147309, -0.10471414507076292, 0.010301742340461217, -0.1633615131147704, 0.13620270275480192, 0.04282819870306619, 0.08917892464120862, 0.05967293585681635, -0.0752911568872097, 0.07412226425541099, 0.07420067879427047, -0.023635308796836105, 0.050368117641390826, -0.254452322687109, -0.06788265350675221, 0.10068634274189199, -0.018296766341699577, 0.07829789720883772, -0.13797715708948055, 0.25731098748440373, 0.013471840241666599, -0.028912072976493435, 0.07420703775623749, 0.040623571468397776, -0.23003008572584985, 0.039787315171640955, -0.23214384466914736, 0.07981930184981281, 0.19076740386916746, -0.07002870442571285, -0.17243682269409263, -0.03352425007486669, -0.00872844626958117, -0.2242438031668938, -0.023233418265251292, 0.26912452799896186, 0.12399104994347232, -0.20296675304984746, -0.07563482608593802, 0.09834322332369218, 0.01342607651300232]),
      |      list_dot_product(v, [0.17412728361989077, -0.10213663389653538, -0.062253222117119526, 0.22137758354309814, 0.04033376531888296, 0.07702302601940562, 0.012136897746002928, -0.1633254837569183, 0.21696989447764625, 0.0140975407721971, -0.08110171573455087, 0.17458872129344713, -0.14982567982601308, -0.13468358481319712, -0.15086633923664533, 0.17027262285407602, -0.057661069247814785, -0.12178127295087818, -0.1416765766133739, 0.2587954047137041, 0.18400402865470905, -0.09587778641795196, -0.16581064738875942, -0.0878749539001395, -0.09293597087904658, -0.14924089035184407, -0.1259735774835687, 0.15539417877156703, 0.0720011852523835, 0.17441493935099403, 0.10632333522661636, -0.004500674004080613, 0.0400761020802268, 0.09784219420255738, -0.1597792263058883, 0.12636648688974308, 0.11318054348640731, -0.17692916497787495, 0.02364040488066004, -0.06637887088969631, -0.11747237836699484, 0.1487646330559176, 0.009713042373178786, 0.07340754076616385, -0.009947284972485667, 0.20225703782505097, 0.1884649971935993, 0.015556153486001527, 0.002736877722186056, -0.09607675438402159, -0.06364286461883206, -0.15107490627027378, -0.11375929952854565, 0.23376875466856176, 0.004867211591574048, -0.07269846436232745, 0.07204952536476941, 0.016171477462420814, 0.07918766930666771, -0.15483393622395594, -0.03634858607905077, 0.10734058613987904, 0.05544916213942951, -0.11585213202837708]),
      |      list_dot_product(v, [-0.19060229744532345, -0.0028391270831949894, -0.01265269380110024, -0.16591103851771347, -0.0293721923260438, -0.01594582044308896, 0.0743093288484112, -0.1300682450094597, -0.005232654309656512, 0.02135177290648818, 0.10969259130433198, -0.01892726022045898, -0.17253433764417567, -0.020000006456255694, 0.11672927277442384, -0.04794117040945936, -0.07718572249390072, 0.051189976699694315, 0.19677269376539466, -0.0485534188401776, -0.01640193121330505, 0.14602697357898048, -0.02198073751343474, 0.23434686469334176, 0.10293041354780037, -0.14446492855362425, 0.10388757957146263, -0.14500079606284375, -0.13519850771509076, -0.12059961376410842, 0.145295849716633, -0.1835621763355366, -0.19016002127295256, 0.12015879929913141, -0.1914207973740019, 0.03770162812581218, -0.049283886747923965, 0.03254419129307255, 0.08643018004800841, -0.22943885882322523, -0.038702067063482504, -0.0013759609549472177, -0.11083631000540405, 0.20058682228594366, -0.1488658335912809, 0.025838361993070536, 0.09085278438651948, -0.17705880553510342, 0.06963750171970075, 0.16987362167820294, 0.006595176089186593, -0.17281104488408383, -0.08251602035200378, 0.26915225160595174, 0.2047366919041596, -0.05352186913452125, 0.010894713064456454, 0.10978205326064054, 0.0031744075828747313, 0.06411724819241373, -0.04247395529006682, -0.0528454629218704, -0.2204493294655504, -0.2237048716489411]),
      |      list_dot_product(v, [0.2444244873764672, -0.08220661591095899, 0.10862244743647519, 0.026619353319951924, 0.04973662244662739, -0.11982936171573996, 0.11001213696834004, 0.0283553081720156, -0.07984506637196806, 0.17151701063376243, -0.18621153014601985, -0.03599071186452033, -0.2142318789339354, -0.135088147376485, -0.07684542241165063, -0.16275139898006247, 0.05849946476790447, -0.16096746880304783, -0.21986459531135527, 0.026531788628114214, 0.12514905129152432, 0.08639641947947571, 0.01351247123149385, 0.06332642321776501, 0.13132205175023712, -0.012479816750905768, -0.041125980623181735, 0.008188929546522724, -0.09149462995083862, -0.2629011247533472, -0.05379117861198717, -0.024286352051663004, -0.11245437650882738, -0.020840565215078464, 0.2591533172521671, 0.06737161053886953, 0.0687819050107759, 0.14370705034598247, 0.31541509353444097, -0.17931415279583687, -0.005666132571594147, 0.05166964711152843, 0.04265342274601771, -0.02378007145197643, 0.1883909827391054, 0.074956376691299, 0.0839728477731171, 0.0604241134141576, 0.2248329068943772, 0.021633880673971227, 0.17020680187015214, 0.10553885881221978, -0.02993290956975034, -0.09552280872098963, 0.10419368928627122, 0.1282183014830906, 0.14052951099925554, 0.15765007120810798, 0.04862739632044867, -0.032082514753062064, 0.036928084232444834, -0.18136566508797625, -0.017636944167217516, 0.0861055640171929]),
      |      list_dot_product(v, [-0.010416286706607974, -0.18093068066620066, -0.054364041438023925, 0.14070873966359168, 0.20616921565628485, -0.15348867396638793, -0.01992895452068485, -0.10158894594859752, -0.26183327351159263, 0.06761770799969462, 0.05239190069631168, -0.0952904156860961, -0.0826826411258552, 0.030312813119843234, 0.09565910069190144, -0.10000861364498807, 0.12599919228208306, 0.21146484668901058, -0.14289988970355672, 0.08775662418041577, -0.050418173483145645, -0.09313523206223837, 0.017433014026972178, -0.025053613480393203, 0.05827649259159987, 0.19188618321363346, 0.07778765267317944, -0.030035688196639387, 0.07441981845669128, 0.10699625738149916, 0.06876446082957448, 0.06938383927602747, -0.09771911494092343, 0.09808676816762889, -0.12189987809171182, 0.21994363086799942, -0.14861360742245347, -0.059661290225716375, -0.2910893304034758, 0.052178690986834, 0.13815529233597176, 0.0795291996042814, 0.033386642425683774, 0.12656941606607053, 0.09483536422235844, -0.03632150797051608, -0.05757290397281288, 0.03947850079873428, 0.33426652481930336, -0.02822649951053893, -0.27293094907356535, 0.06813634119916522, -0.12218612933262803, 0.07558993028353414, -0.03728010236779328, 0.16892639220275002, 0.1852836509095603, -0.041240778623649464, 0.06374659092835355, 0.047599715772663094, -0.0036396865948091065, 0.020826922743636234, -0.1846441006544324, 0.0939327517970931]),
      |      list_dot_product(v, [0.07659205877227288, 0.08828667953868814, -0.013438731579867741, 0.19186130514671287, -0.05854392674929725, -0.021724572839792382, 0.02536976271519518, -0.01851662915120975, 0.13065500818737008, -0.20848118010443936, -0.23318201007353262, -0.09239836161077321, -0.012720711360963593, 0.08161625854826719, 0.04623950927832745, -0.1019409410886137, -0.11135898866281095, 0.04860073065312569, 0.14266858802471147, -0.1337757391405497, -0.07960760637972489, 0.07703624494844336, -0.1256599284587522, 0.12662380986850194, 0.11963322666121101, 0.05654859467277879, 0.13014556246408102, -0.04565964815738436, -0.14244492520598204, -0.05039218182321032, -0.004518967217593921, -0.15703519677363062, 0.1862990167054435, 0.28044206990440806, 0.0931434990426939, 0.09027233157035316, 0.056807398150377705, -0.19712864028468693, -0.08838626435969212, 0.1284554622396086, -0.23023771836197987, 0.08174251601376788, 0.09248186981416112, 0.12690733350555825, 0.20447558727029072, -0.16839577899704025, 0.027817609431539173, -0.0115409210991307, -0.09194395569521036, -0.17181756273905646, -0.0008778962809145156, -0.0826975169341758, 0.15456476601344837, 0.1195181105692871, 0.1396901765681837, -0.023627929650565916, 0.044827655294687054, -0.06514703240328072, 0.18466222448729847, -0.012801847708489184, 0.0168632349079748, -0.14292574951261952, -0.012626578919638486, 0.32257777125104775]),
      |      list_dot_product(v, [0.10693871889434925, 0.015276268785640503, -0.05319884217031299, 0.2671451169485218, 0.013433953756114255, -0.04165864275144235, -0.11927030977473049, 0.037128003935288846, 0.056677124263260825, -0.06802718738539475, -0.15107142112197033, 0.18670939362154113, -0.06140901397226743, -0.2107483889912893, 0.1870510592186833, -0.23223220075309448, -0.1324993983707927, 0.039941287086645606, -0.023594957191351608, 0.02581445422147362, -0.15149359605507248, 0.0031026307547429148, 0.06436451632831651, 0.029991619993889006, -0.2125654278415903, -0.08006025177257137, -0.10969418496737084, -0.2534139026370306, -0.20807029791845016, 0.14882058386805905, -0.04124324932744845, -0.12094185676297846, -0.041927328818269806, -0.11854359523583366, -0.09138641870871862, 0.10021428632801559, -0.056770299548142424, 0.07654317002893915, -0.0020653574372284573, 0.20215268949989454, 0.23536743452594275, 0.01714455882652576, 0.1633474361197346, -0.11203312478619382, -0.06662815193642146, -0.10501284866922651, -0.11315051225246564, -0.19834195048601622, -0.015997295323482045, 0.01957764230837355, 0.04660429433384599, -0.03169897836207041, 0.08376499458733153, -0.04960291513339238, -0.05520798698337496, 0.036036984286431574, -0.006295896366793376, 0.14090015209626464, 0.008727143378303914, -0.2149946606218417, 0.12548282780052405, -0.17014021883567143, -0.01986984395514703, -0.24573111182589966]),
      |      list_dot_product(v, [0.24017223564588613, 0.0036533550866186602, -0.013009099069123271, 0.02269719303526065, 0.24134276732167848, -0.04175479215601547, 0.08993570582676055, 0.18179627894431424, -0.0650123587090974, -0.08894402343145581, -0.03610272076705571, 0.07981840077281019, -0.0757782838900414, -0.011461436245615512, 0.3452477777812953, 0.007150838681042602, 0.16679874662221014, -0.13902181836010463, 0.09635763236437704, -0.1944462323647225, 0.10366508125226262, 0.12503153868365335, -0.07873850224016396, -0.0672381478550166, 0.1806440234456739, -0.2740731125810573, 0.0050354141900984814, 0.008413329889138238, 0.05123381753526669, 0.06777272024773634, 0.12121108720974952, 0.2034596702128077, 0.08787665125011698, -0.035853624573338766, -0.06255104383391356, -0.014492937497175428, 0.0867836173117376, -0.06714853037615635, 0.12666456384788133, 0.04109721782372483, 0.2887318233900466, -0.11358640354240084, -0.001973261093284916, 0.06972871449004885, -0.17854574088625605, -0.04145546465807622, -0.03483189597489059, 0.010103843091148392, 0.06059298953966982, 0.011279492918855553, -0.016406241641612015, -0.09717119069820948, 0.16373721912894834, -0.0035241742277993984, 0.15106628444345718, -0.04545229500222999, 0.11174124595101799, -0.21774311829878654, 0.13236052580684993, 0.13327925354963316, -0.01694326573694344, 0.19126748921549824, 0.12580058875856692, 0.031914848739978165]),
      |      list_dot_product(v, [-0.2331668724455825, 0.032200321588134226, -0.15196719463357478, -0.10494070269291861, -0.15045763848808275, -0.17676017022513335, 0.07753365589303494, -0.013299657072211866, 0.24288398817716061, 0.09348044108282197, -0.08449145042489135, 0.09269523508866379, -0.17578859734115496, 0.005394635571864005, 0.24858020526815583, -0.012913629524001501, -0.11324274040824504, 0.03941657369603356, -0.12366381294236621, -0.06325896609616843, -0.1456641526944805, -0.07168619977634964, 0.1047685726062981, -0.06284517635258224, 0.09519532787147536, 0.12616038427577222, -0.13431991535772023, -0.026147458640243062, -0.04540947692928395, 0.1321087046060969, -0.07171505252185888, -0.048469466630471365, 0.10708783643195419, -0.01952244330500109, -0.033742260040432334, -0.14735493995257384, -0.07982362807488881, 0.05615369065686223, 0.06837032149181878, -0.020087997701606904, -0.12239584700304057, 0.042256090747243395, 0.259447822663882, 0.025415968497802602, -0.10648325203340582, 0.012492662401929656, 0.00928919994776607, 0.34014425573358165, 0.2335853521449206, 0.08570026330858474, 0.12602465353350759, -0.1808047365406378, 0.013124997033984103, 0.007987154768575628, 0.04218095276569692, 0.14754546944785474, 0.06860562667828965, -0.08647440558350933, -0.11239809076398029, -0.105484254215172, -0.21346846286630133, 0.18015641107891506, 0.09739258223594285, 0.0968168828283392]),
      |      list_dot_product(v, [-0.14620857410755564, 0.13496323017792067, -0.12569282984443533, 0.1457404060538402, 0.09877835101795454, -0.033558501848163926, 0.05065941098599951, -0.1370173649492731, -0.23131138261391648, 0.033048978798853997, -0.008819505976475317, -0.07966545967760758, 0.1540489614778576, 0.10020830559879479, 0.15990225367601824, -0.07816487919545559, -0.06799789588850004, 0.08862466158172765, -0.0840875783055038, 0.03087809682990439, 0.004208224429432348, -0.11332208968898991, -0.015500762806232873, 0.08317383512223664, -0.20864783316642568, -0.14586857160924904, 0.002061630884520172, 0.03443480299966427, 0.052408362901001634, -0.2431742074884484, -0.20329659747060955, -0.11198726842066432, -0.01926042034186358, -0.20808417531385015, 0.08902820668657367, 0.2212775410676141, -0.0763633983395489, -0.1080537432887597, 0.257517730205964, -0.01691644735314649, -0.05761912176304789, -0.11691060665405242, 0.06403072989952803, 0.190230235039136, -0.03607456931003682, 0.1452100249615331, -0.003224571998280011, 0.08744566613302249, -0.29232513195930543, -0.07889337398976878, 0.05974934787738988, -0.03589893878688266, 0.016451253198033568, 0.051518632731348254, -0.10800882679508556, -0.027762682238195016, 0.3145628089960259, -0.14912875626675573, -0.03986598838152908, -0.054644636991821954, 0.013483401244356152, 0.1694861566503457, -0.06175143917020527, -0.005336112794623202]),
      |      list_dot_product(v, [-0.08390340094113034, -0.2267371496857079, 0.0012822070433701834, 0.01025920204138206, -0.04549901930434793, 0.04500101997470544, 0.036578477500159925, 0.211093996906551, -0.15386832672653858, -0.13777419100253258, -0.06456177499808981, -0.12055530988844483, -0.02210936948174555, 0.11612852257192131, -0.019599041269722162, -0.001611366290142894, -0.10967981740767738, -0.29660605719409905, -0.04303674313261721, 0.046641150846948025, -0.07272062304611687, -0.13678494071547803, 0.013333780781951033, -0.005150269352692955, -0.11615690582960839, -0.13507930712600094, 0.085584360608796, -0.018996658055993293, -0.15819287332885154, 0.1626030447127311, -0.20360704460378076, 0.09308191906845281, -0.043290090654983085, -0.05712367384780884, -0.06870870086671729, -0.11455011946433671, 0.05704830561481602, -0.051397831616099225, 0.045788236442677425, -0.05863925552560958, 0.17545477895402026, -0.10484647031993924, 0.04277838922118694, 0.26164558845890723, 0.40367380860628554, 0.023294577246180517, -0.1366501907535222, 0.0545215512618137, 0.01649853286664688, -0.12890530245181875, -0.01657936308844695, -0.1542608997335158, -0.02141759878138973, 0.15478585365816055, 0.0885854210062148, 0.01861099968062397, -0.20992671853323733, 0.17519333260847292, -0.20336091621242003, 0.08290540032698242, -0.10635747912867029, 0.07331954942134844, -0.040214232267793026, -0.0005389169067859228])]""".stripMargin

  /** ANN recall AS DATA — now ORACLE-EXACT end to end: every leg of
    * the audit table (exact truth, hyperplane-LSH, label-IVF,
    * trained-k-means IVF, int8 scan, identity-prefix rerank,
    * PCA-trained rerank, near-dup LSH vs the exact pair set, and the
    * semantic-dedup group closure) recomputes in one DuckDB program
    * from the raw embeddings plus the independently derived constants
    * (embedded planes, the k-means snapshot, the Python-ported Jacobi
    * rotation). A recall change anywhere — banding recall, probe
    * selection, quantization, shortlist, clustering — is a hash
    * mismatch, not a passed floor. SimilaritySpec still pins the
    * sf0.001 values for fast in-suite regression.
    *
    * Scale shape: truth is k·|queries| narrow rows per method (a
    * left-semi join against each candidate set), and each count is a
    * single tiny agg — the expensive inputs are the ANN scans
    * themselves, read from their shared silvers. */
  val e08 = Q("e08_ann_recall",
    s"""WITH RECURSIVE c AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |truth AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, e.v) DESC, e.vec_id) AS n_rank
       |    FROM c q, c e WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
       |  WHERE n_rank <= 5),
       |sig AS (
       |  SELECT vec_id, v,
       |    ${sigSqlSelect("s")}
       |  FROM c),
       |lsh5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, e.v) DESC, e.vec_id) AS n_rank
       |    FROM sig q JOIN sig e
       |      ON (q.s0 = e.s0 OR q.s1 = e.s1 OR q.s2 = e.s2 OR q.s3 = e.s3
       |          OR q.s4 = e.s4 OR q.s5 = e.s5 OR q.s6 = e.s6 OR q.s7 = e.s7)
       |    WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
       |  WHERE n_rank <= 5),
       |ldims AS (
       |  SELECT label, i, CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS cx
       |  FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM c) t
       |  GROUP BY label, i),
       |lcents AS (SELECT label, list(cx ORDER BY i) AS centroid
       |  FROM ldims GROUP BY label),
       |lprobes AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS query_id, k.label,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, k.centroid) DESC,
       |                 k.label) AS crank
       |    FROM c q, lcents k WHERE q.vec_id < 8) t WHERE crank <= 2),
       |ivf5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT p.query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY list_cosine_similarity(qc.v, e.v) DESC, e.vec_id)
       |        AS n_rank
       |    FROM lprobes p JOIN c e ON e.label = p.label
       |    JOIN c qc ON qc.vec_id = p.query_id
       |    WHERE e.vec_id <> p.query_id) t WHERE n_rank <= 5),
       |$gateKmeansCentsSql,
       |kprobes AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS query_id, k.cluster,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, k.centroid) DESC, k.cluster) AS crank
       |    FROM c q, pcents k WHERE q.vec_id < 8) t WHERE crank <= 2),
       |kivf5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT p.query_id, a.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY list_cosine_similarity(qc.v, a.v) DESC, a.vec_id) AS n_rank
       |    FROM kprobes p JOIN assign a ON a.cluster = p.cluster
       |    JOIN c qc ON qc.vec_id = p.query_id
       |    WHERE a.vec_id <> p.query_id) t WHERE n_rank <= 5),
       |qv AS (
       |  SELECT vec_id,
       |    greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127 AS s,
       |    list_transform(v, x -> floor(x / (greatest(list_max(list_transform(v,
       |      y -> abs(y))), 1e-30) / 127) + 0.5)) AS q
       |  FROM c),
       |qz5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.q, e.q) * e.s * q.s DESC, e.vec_id) AS n_rank
       |    FROM qv q, qv e WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
       |  WHERE n_rank <= 5),
       |rshort AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v[1:16], e.v[1:16]) DESC, e.vec_id) AS c_rank
       |    FROM c q, c e WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
       |  WHERE c_rank <= 20),
       |rt5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT s.query_id, s.neighbor_id,
       |      row_number() OVER (PARTITION BY s.query_id
       |        ORDER BY list_cosine_similarity(qc.v, e.v) DESC, s.neighbor_id) AS n_rank
       |    FROM rshort s JOIN c e ON e.vec_id = s.neighbor_id
       |    JOIN c qc ON qc.vec_id = s.query_id) t WHERE n_rank <= 5),
       |cproj AS (SELECT vec_id, v, $gateRerankProjSql AS pv FROM c),
       |trshort AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.pv, e.pv) DESC, e.vec_id) AS c_rank
       |    FROM cproj q, cproj e WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
       |  WHERE c_rank <= 20),
       |tr5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT s.query_id, s.neighbor_id,
       |      row_number() OVER (PARTITION BY s.query_id
       |        ORDER BY list_cosine_similarity(qc.v, e.v) DESC, s.neighbor_id) AS n_rank
       |    FROM trshort s JOIN c e ON e.vec_id = s.neighbor_id
       |    JOIN c qc ON qc.vec_id = s.query_id) t WHERE n_rank <= 5),
       |cproj24 AS (SELECT vec_id, v, $gateRerankProj24Sql AS pv FROM c),
       |trshort24 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.pv, e.pv) DESC, e.vec_id) AS c_rank
       |    FROM cproj24 q, cproj24 e WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
       |  WHERE c_rank <= 20),
       |tr24 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT s.query_id, s.neighbor_id,
       |      row_number() OVER (PARTITION BY s.query_id
       |        ORDER BY list_cosine_similarity(qc.v, e.v) DESC, s.neighbor_id) AS n_rank
       |    FROM trshort24 s JOIN c e ON e.vec_id = s.neighbor_id
       |    JOIN c qc ON qc.vec_id = s.query_id) t WHERE n_rank <= 5),
       |cproj32 AS (SELECT vec_id, v, $gateRerankProj32Sql AS pv FROM c),
       |trshort32 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.pv, e.pv) DESC, e.vec_id) AS c_rank
       |    FROM cproj32 q, cproj32 e WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id) t
       |  WHERE c_rank <= 20),
       |tr32 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT s.query_id, s.neighbor_id,
       |      row_number() OVER (PARTITION BY s.query_id
       |        ORDER BY list_cosine_similarity(qc.v, e.v) DESC, s.neighbor_id) AS n_rank
       |    FROM trshort32 s JOIN c e ON e.vec_id = s.neighbor_id
       |    JOIN c qc ON qc.vec_id = s.query_id) t WHERE n_rank <= 5),
       |ep AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM c a, c b
       |  WHERE a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000
       |    AND list_cosine_similarity(a.v, b.v) >= 0.45),
       |ndp AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM sig a JOIN sig b
       |    ON a.vec_id < b.vec_id
       |    AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2 OR a.s3 = b.s3
       |         OR a.s4 = b.s4 OR a.s5 = b.s5 OR a.s6 = b.s6 OR a.s7 = b.s7)
       |  WHERE a.vec_id < 2000 AND b.vec_id < 2000
       |    AND list_cosine_similarity(a.v, b.v) >= 0.45),
       |${kmeansSnapshotSql("d", gateKmeansRows)},
       |sprobes AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT c.vec_id, k.cluster,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_cosine_similarity(c.v, k.centroid) DESC, k.cluster) AS r
       |    FROM c, dpcents k) t WHERE r <= 3
       |  UNION SELECT vec_id, cluster FROM dassign),
       |spairs AS (
       |  SELECT DISTINCT a.vec_id AS u, b.vec_id AS w
       |  FROM sprobes pa JOIN sprobes pb ON pa.cluster = pb.cluster
       |  JOIN c a ON a.vec_id = pa.vec_id JOIN c b ON b.vec_id = pb.vec_id
       |  WHERE a.vec_id < b.vec_id
       |    AND list_cosine_similarity(a.v, b.v) >= 0.45),
       |sedges AS (SELECT u, w FROM spairs UNION SELECT w, u FROM spairs),
       |reach(a, b) AS (
       |  SELECT u, u FROM sedges
       |  UNION
       |  SELECT r.a, e.w FROM reach r JOIN sedges e ON r.b = e.u),
       |canon AS (SELECT a AS vec_id, min(b) AS canonical_id FROM reach GROUP BY a),
       |tt AS (SELECT count(*) AS total FROM truth),
       |et AS (SELECT count(*) AS total FROM ep)
       |SELECT method, config, hits, total,
       |  CAST(hits AS DOUBLE) / CAST(total AS DOUBLE) AS recall
       |FROM (
       |  SELECT 'lsh' AS method, 'tables=8,bits=4,k=5' AS config,
       |    (SELECT count(*) FROM truth t JOIN lsh5 m USING (query_id, neighbor_id)) AS hits,
       |    (SELECT total FROM tt) AS total
       |  UNION ALL SELECT 'ivf_label', 'nProbe=2,k=5',
       |    (SELECT count(*) FROM truth t JOIN ivf5 m USING (query_id, neighbor_id)),
       |    (SELECT total FROM tt)
       |  UNION ALL SELECT 'ivf_kmeans', 'kmeans=8x3,nProbe=2,k=5',
       |    (SELECT count(*) FROM truth t JOIN kivf5 m USING (query_id, neighbor_id)),
       |    (SELECT total FROM tt)
       |  UNION ALL SELECT 'quantized_int8', 'k=5',
       |    (SELECT count(*) FROM truth t JOIN qz5 m USING (query_id, neighbor_id)),
       |    (SELECT total FROM tt)
       |  UNION ALL SELECT 'rerank_trunc', 'prefix=16,shortlist=20,k=5',
       |    (SELECT count(*) FROM truth t JOIN rt5 m USING (query_id, neighbor_id)),
       |    (SELECT total FROM tt)
       |  UNION ALL SELECT 'rerank_trained', 'pca-rot16,shortlist=20,k=5',
       |    (SELECT count(*) FROM truth t JOIN tr5 m USING (query_id, neighbor_id)),
       |    (SELECT total FROM tt)
       |  UNION ALL SELECT 'rerank_trained24', 'pca-rot24,shortlist=20,k=5',
       |    (SELECT count(*) FROM truth t JOIN tr24 m USING (query_id, neighbor_id)),
       |    (SELECT total FROM tt)
       |  UNION ALL SELECT 'rerank_trained32', 'pca-rot32,shortlist=20,k=5',
       |    (SELECT count(*) FROM truth t JOIN tr32 m USING (query_id, neighbor_id)),
       |    (SELECT total FROM tt)
       |  UNION ALL SELECT 'neardup_lsh', 'minCosine=0.45,adaptive-bits',
       |    (SELECT count(*) FROM ep JOIN ndp USING (vec_a, vec_b)),
       |    (SELECT total FROM et)
       |  UNION ALL SELECT 'semdedup_group', 'adaptiveK-x3,probes=3,minCosine=0.45',
       |    (SELECT count(*) FROM ep
       |     JOIN canon ca ON ca.vec_id = ep.vec_a
       |     JOIN canon cb ON cb.vec_id = ep.vec_b
       |     WHERE ca.canonical_id = cb.canonical_id),
       |    (SELECT total FROM et)
       |) rows
       |ORDER BY method""".stripMargin) { (s, dir) =>
    val emb = T.embeddings(s, dir)
    val q = queriesOf(s, dir)
    val truth = annTruthSilver(s, dir)
      .select("query_id", "neighbor_id")
    def recallRow(method: String, config: String,
        approx: DataFrame): DataFrame = {
      val hits = truth.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      val total = truth.agg(count(lit(1)).as("total"))
      hits.crossJoin(total).select(
        lit(method).as("method"), lit(config).as("config"),
        col("hits"), col("total"),
        (col("hits").cast("double") / col("total")).as("recall"))
    }
    // near-dup recall on the e05 slice: exact pairs vs banded-LSH pairs
    // (the exact set is the shared persisted truth silver, not a
    // recomputed quadratic scan per bench run)
    val exactPairs = exactPairsSilver(s, dir)
    val lshPairs = nearDupPairs(emb.filter(col("vec_id") < 2000), 0.45)
      .select("vec_a", "vec_b")
    val ndHits = exactPairs.join(lshPairs, Seq("vec_a", "vec_b"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val ndTotal = exactPairs.agg(count(lit(1)).as("total"))
    val ndRow = ndHits.crossJoin(ndTotal).select(
      lit("neardup_lsh").as("method"),
      lit("minCosine=0.45,adaptive-bits").as("config"),
      col("hits"), col("total"),
      (col("hits").cast("double") / col("total")).as("recall"))
    // semantic-dedup GROUP coverage: fraction of exact near-dup pairs
    // whose two vectors land in the same duplicate group — the
    // cross-cluster miss mode of the SemDeDup trade, surfaced as data
    val canon = semdedupSilver(s, dir)
      .select(col("vec_id"), col("canonical_id"))
    val sdHits = exactPairs
      .join(canon.select(col("vec_id").as("vec_a"),
        col("canonical_id").as("ca")), "vec_a")
      .join(canon.select(col("vec_id").as("vec_b"),
        col("canonical_id").as("cb")), "vec_b")
      .filter(col("ca") === col("cb"))
      .agg(count(lit(1)).as("hits"))
    val sdRow = sdHits.crossJoin(ndTotal).select(
      lit("semdedup_group").as("method"),
      lit("adaptiveK-x3,probes=3,minCosine=0.45").as("config"),
      col("hits"), col("total"),
      (col("hits").cast("double") / col("total")).as("recall"))
    recallRow("lsh", "tables=8,bits=4,k=5", annLshSilver(s, dir))
      .unionAll(recallRow("ivf_label", "nProbe=2,k=5",
        annIvfLabelSilver(s, dir)))
      .unionAll(recallRow("ivf_kmeans", "kmeans=8x3,nProbe=2,k=5",
        annIvfKmeansSilver(s, dir)))
      .unionAll(recallRow("quantized_int8", "k=5", annQuantSilver(s, dir)))
      .unionAll(recallRow("rerank_trunc", "prefix=16,shortlist=20,k=5",
        rerankTopK(emb, q, 5, prefixDim = 16, shortlist = 20)))
      .unionAll({
        // one Gramian + eigendecomposition for the whole capacity curve:
        // rot32's leading 16/24 rows are exactly rot16/rot24
        val rot32 = trainedRotation(emb, 32)
        recallRow("rerank_trained", "pca-rot16,shortlist=20,k=5",
            rerankTopKTrainedWith(emb, q, 5, rot32.take(16), shortlist = 20))
          .unionAll(recallRow("rerank_trained24", "pca-rot24,shortlist=20,k=5",
            rerankTopKTrainedWith(emb, q, 5, rot32.take(24), shortlist = 20)))
          .unionAll(recallRow("rerank_trained32", "pca-rot32,shortlist=20,k=5",
            rerankTopKTrainedWith(emb, q, 5, rot32, shortlist = 20)))
      })
      .unionAll(ndRow)
      .unionAll(sdRow)
      .orderBy("method")
  }

  // ----------------------------------------------------- semantic dedup

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * "SemDeDup: Data-Efficient Learning at Web-Scale Through Semantic
    * Deduplication"): k-means-cluster the embedding corpus, find
    * within-cluster pairs above a cosine threshold, contract them to
    * duplicate groups, and keep ONE canonical document per group — the
    * step that removes semantically-redundant documents (not just
    * near-identical text) from a training corpus.
    *
    * Scale shape, mirroring the paper's own trade: pair search runs
    * ONLY within a k-means cluster (cross-cluster near-dups are the
    * documented miss mode), so k is sized to the corpus — k ∝ n keeps
    * expected cluster size constant and the per-cluster pair stage
    * linear overall, exactly like nearDupPairs' adaptive LSH bits.
    * Scoring happens inside the bucket row where both vectors are
    * local (collect_list per cluster, in-row pairing); only surviving
    * (vec_a, vec_b) id pairs shuffle into the cluster contraction.
    * Everything downstream reuses the scale-correct pieces:
    * kmeansAssign (broadcast centroid book, corpus never shuffled by
    * vector) and Dedup.dupClusters (log-round contraction).
    *
    * Returns (vec_id, canonical_id, keep): canonical_id = the group's
    * minimum vec_id (itself for singletons), keep = this row is the
    * group's survivor. */
  def semanticDedup(corpus: DataFrame, k: Int, iters: Int,
      minCosine: Double): DataFrame =
    semanticDedupWith(corpus, kmeansAssign(corpus, k, iters), minCosine)

  /** k sized to the corpus for semantic dedup: ~`target` vectors per
    * cluster. A PINNED k is the same trap as pinned LSH bits (e04's
    * round-9 quadratic): cluster population grows with n and the
    * within-cluster pair stage goes quadratic — measured 82 s at sf1
    * (20k vectors, k=8 → ~2.5k-vector clusters → 25M scored pairs)
    * vs linear behavior at k = n/256. SemDeDup itself scales k with
    * the corpus (50k clusters for web scale) for exactly this reason.
    * The residual cost is the assignment scan, O(n·k) = O(n²/target):
    * that is the algorithm's irreducible centroid-nearest pass
    * (embarrassingly parallel, broadcast book, corpus never shuffled);
    * at true web scale the book is trained on a SAMPLE and k is capped
    * by the broadcast budget (~65k × dim doubles ≈ 35 MB), exactly as
    * in kmeansAssign's scale note. */
  def adaptiveK(n: Long, target: Int = 256): Int =
    math.max(8, (n / target).toInt)

  /** Core semantic dedup over a PRE-TRAINED (vec_id, cluster)
    * assignment — the production entry point, fed from the persisted
    * quantizer silver. */
  def semanticDedupWith(corpus: DataFrame, assign: DataFrame,
      minCosine: Double): DataFrame =
    dedupFromPairs(corpus,
      withinClusterPairs(corpus, assign, minCosine))

  /** Multi-probe semantic dedup: pairing runs within the UNION of each
    * vector's probe clusters (probeRows may carry several rows per
    * vec_id — see [[probeAssign]]) instead of its single nearest
    * cluster, recovering the cross-cluster near-dup pairs that sit on
    * a k-means boundary — SemDeDup's documented miss mode. The pair
    * set is a strict superset of the single-assignment search whenever
    * probeRows contains the assignment rows (probeAssign guarantees
    * it), pairs surfacing from several shared probes dedup before the
    * contraction, and the canonical/keep semantics are unchanged. Cost:
    * each vector is scored in p buckets, so the pairing stage is ~p×
    * (still linear in n for corpus-sized k); the assignment SILVER
    * stays single — only the transient pairing working set fans out. */
  def semanticDedupProbed(corpus: DataFrame, probeRows: DataFrame,
      minCosine: Double): DataFrame =
    dedupFromPairs(corpus,
      withinClusterPairs(corpus, probeRows, minCosine).distinct())

  /** Within-bucket exact-cosine pairing. `rows` = (vec_id, cluster) —
    * one row per probe. Candidate id pairs come from a narrow self-join
    * of the probe rows on cluster, de-duplicated BEFORE scoring (a pair
    * sharing p probe clusters would otherwise pay its 64-dim cosine p
    * times), then vectors attach through two equi-joins and the cosine
    * filter runs per pair row, spread over ordinary shuffle partitions.
    *
    * This replaces a collect_list-per-cluster + in-row nested-transform
    * pair expansion, which materialized the full m²/2 array of
    * struct(vec, vec) pairs (each struct a BYTE COPY of both 64-double
    * vectors in Tungsten) inside ONE row per cluster — ~280 MB of
    * transient allocation per 750-member cluster, one task per cluster
    * (parallelism = k, a straggler cliff at bench scale and a per-task
    * memory cliff at any scale), and GC pauses that Bench's 1-min
    * periodic-GC turned into 2-3× swings on this stage (measured:
    * ann_semdedup 7.7 s quiet / 16.9-24 s with the GC tick landing in
    * it). The join form shuffles only (cluster, vec_id) probe rows plus
    * the corpus once (guide §2.3 "shuffle keys, not payloads"; §8) —
    * identical output pair set. */
  private def withinClusterPairs(corpus: DataFrame, rows: DataFrame,
      minCosine: Double): DataFrame = {
    val ids = rows.select("vec_id", "cluster")
    val cand = ids.select(col("cluster"), col("vec_id").as("doc_a"))
      .join(ids.select(col("cluster"), col("vec_id").as("doc_b")), "cluster")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val vecs = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    cand
      .join(vecs.select(col("vec_id").as("doc_a"), col("cv").as("cva")), "doc_a")
      .join(vecs.select(col("vec_id").as("doc_b"), col("cv").as("cvb")), "doc_b")
      .filter(cosine(col("cva"), col("cvb")) >= minCosine)
      .select("doc_a", "doc_b")
  }

  private def dedupFromPairs(corpus: DataFrame,
      pairs: DataFrame): DataFrame = {
    val groups = Dedup.dupClusters(pairs)
      .withColumnRenamed("doc_id", "vec_id")
    corpus.select(col("vec_id"))
      .join(groups, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("canonical_id"), col("vec_id")).as("canonical_id"))
      .withColumn("keep", col("canonical_id") === col("vec_id"))
  }

  /** Probe rows for multi-probe pairing: the centroid book is
    * recomputed from the single assignment (sum centroids — cosine is
    * scale-invariant, the same convention as the training loop), each
    * vector takes its `probes` nearest clusters under that book, and
    * the top-1 ASSIGNMENT rows are unioned in so the probe set always
    * contains the cluster the silver assigns — making multi-probe
    * pairing a guaranteed superset of single-assignment pairing even
    * where the post-update book ranks clusters differently than the
    * book that produced the assignment. One extra O(n·k) broadcast
    * scan — the same irreducible shape as the assignment pass. */
  def probeAssign(corpus: DataFrame, assign: DataFrame,
      probes: Int): DataFrame = {
    val withVec = corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val cents = withVec.join(assign.select("vec_id", "cluster"), "vec_id")
      .select(col("cluster"), posexplode(col("cv")).as(Seq("i", "x")))
      .groupBy("cluster", "i")
      .agg(sum(col("x").cast("decimal(28,10)")).cast("double").as("x"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("i"), col("x")))).as("ps"))
      .select(col("cluster"),
        transform(col("ps"), p => p("x")).as("centroid"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("score").desc, col("cluster"))
    withVec.crossJoin(broadcast(cents))
      .withColumn("score", cosine(col("cv"), col("centroid")))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= probes)
      .select(col("vec_id"), col("cluster"))
      .unionByName(assign.select("vec_id", "cluster"))
      .distinct()
  }

  /** The corpus-sized dedup quantizer assignment, materialized once per
    * (session, dir). Coincides with e07's 8×3 book at gate scale
    * (n ≤ 2048 → k = 8) but grows k with the corpus — see adaptiveK. */
  private def dedupAssignSilver(s: SparkSession, dir: String): DataFrame = {
    val emb = T.embeddings(s, dir)
    val k = adaptiveK(emb.count())
    if (k == 8) kmeansAssignSilver(s, dir) // e07's book — train once
    else graft.plans.SilverStore.table(s, dir, s"kmeans_assign_dedup_$k") {
      kmeansAssign(emb, k = k, iters = 3)
    }
  }

  /** Multi-probe rows (top-3 clusters per vector ∪ the assignment) for
    * the dedup pairing stage, materialized once per (session, dir). */
  private def dedupProbesSilver(s: SparkSession, dir: String): DataFrame =
    graft.plans.SilverStore.table(s, dir, "kmeans_probes_dedup_3") {
      probeAssign(T.embeddings(s, dir), dedupAssignSilver(s, dir),
        probes = 3)
    }

  /** Semantic dedup over the gate corpus — oracle-exact via the same
    * independently derived centroid snapshot: the SQL recomputes the
    * single assignment, the post-update probe book, the top-3 probe
    * rows ∪ assignment, the within-probe-cluster cosine ≥ 0.45 pairs,
    * and the connected-components closure (recursive CTE), then keeps
    * the min-id canonical per group — the full SemDeDup composite
    * checked end to end. SimilaritySpec still pins determinism and the
    * one-keeper contract. */
  val e09 = Q("e09_semantic_dedup",
    s"""WITH RECURSIVE c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$gateKmeansCentsSql,
       |probes AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT c.vec_id, k.cluster,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_cosine_similarity(c.v, k.centroid) DESC,
       |                 k.cluster) AS r
       |    FROM c, pcents k) t WHERE r <= 3
       |  UNION SELECT vec_id, cluster FROM assign),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS u, b.vec_id AS w
       |  FROM probes pa JOIN probes pb ON pa.cluster = pb.cluster
       |  JOIN c a ON a.vec_id = pa.vec_id JOIN c b ON b.vec_id = pb.vec_id
       |  WHERE a.vec_id < b.vec_id
       |    AND list_cosine_similarity(a.v, b.v) >= 0.45),
       |edges AS (SELECT u, w FROM pairs UNION SELECT w, u FROM pairs),
       |reach(a, b) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT r.a, e.w FROM reach r JOIN edges e ON r.b = e.u),
       |cl AS (SELECT a AS vec_id, min(b) AS canonical_id FROM reach GROUP BY a)
       |SELECT c.vec_id, coalesce(cl.canonical_id, c.vec_id) AS canonical_id,
       |  coalesce(cl.canonical_id, c.vec_id) = c.vec_id AS keep
       |FROM c LEFT JOIN cl ON cl.vec_id = c.vec_id
       |ORDER BY c.vec_id""".stripMargin) { (s, dir) =>
    semdedupSilver(s, dir).orderBy("vec_id")
  }

  /** Two-stage retrieval: a cheap coarse scan over a PREFIX of each
    * vector (the matryoshka/MRL layout, where the first dimensions carry
    * a usable coarse embedding) shortlists `shortlist` candidates per
    * query, then ONLY those rows are re-scored at full dimension for the
    * final top-k — the standard production rerank shape (coarse pass
    * touches prefixDim/dim of the bytes; the full-precision fetch is
    * |queries|·shortlist rows, not the corpus).
    *
    * The shortlist stage deliberately carries only (query_id,
    * neighbor_id, c_rank) — full vectors are re-joined for the rerank,
    * exactly as a cluster deployment would fetch them from the vector
    * store, so the wide rows never pass through the coarse window. */
  def rerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      prefixDim: Int, shortlist: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
    val wCoarse = Window.partitionBy("query_id")
      .orderBy(col("coarse").desc, col("neighbor_id"))
    val short = c
      .select(col("neighbor_id"), slice(col("cv"), 1, prefixDim).as("cp"))
      .crossJoin(broadcast(q.select(col("query_id"),
        slice(col("qv"), 1, prefixDim).as("qp"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("coarse", cosine(col("qp"), col("cp")))
      .withColumn("c_rank", row_number().over(wCoarse))
      .filter(col("c_rank") <= shortlist)
      .select("query_id", "neighbor_id", "c_rank")
    val wFine = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    short.join(c, "neighbor_id").join(broadcast(q), "query_id")
      .withColumn("score", cosine(col("qv"), col("cv")))
      .withColumn("n_rank", row_number().over(wFine))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "neighbor_id", "c_rank")
  }

  /** Deterministic symmetric eigensolver (cyclic Jacobi sweeps) for the
    * d×d covariance — driver-side, O(d³) with d = embedding dim, no
    * data-size dependence. Returns (eigenvalues, eigenvector COLUMNS),
    * unsorted. */
  private[graft] def jacobiEig(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-18) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) { // column rotation of A and the accumulator
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
            k = 0
            while (k < d) { // matching row rotation keeps A symmetric
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** TRAINED matryoshka rotation: top-`m` principal directions of the
    * embedding covariance, learned from a bounded deterministic sample
    * (vec_id < sampleN). Returns `m` projection rows of length d. The
    * fixture is near-isotropic by construction, so dimension SELECTION
    * cannot help (top-16-by-variance carries 27% of energy vs 25%
    * uniform — measured WORSE than the identity prefix); a learned
    * ROTATION concentrates energy the way real MRL training front-loads
    * it.
    *
    * DISTRIBUTED GRAMIAN (r12 verdict item 4, replacing the 4096-row
    * driver collect): the first and second moments are computed in the
    * cluster — per-element double products cast to decimal(28,10)
    * (half-up) and summed EXACTLY, so the sums are order-independent
    * and any partitioning yields the same bits — and only the d sums
    * plus the d(d+1)/2 upper-triangle Gramian cells reach the driver
    * (the same driver-bounded contract as the k-means init; a
    * treeAggregate of raw doubles would be partition-order-dependent,
    * which is why the decimal hash-aggregate is the right distributed
    * form). cov_ij := G_ij/n − mean_i·mean_j by definition; the
    * dim-sized Jacobi eigensolve stays on the driver. Sign-fixed
    * (largest-|component| positive) so the rotation is unique, not just
    * the subspace. Re-derived independently by tools/derive_rot.py
    * (same decimal math in plain Python) for the e08 oracle. */
  private[graft] def trainedRotation(corpus: DataFrame, m: Int,
      sampleN: Int = 4096): Array[Array[Double]] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus.filter(col("vec_id") < sampleN)
      .select(asDouble(col("embedding")).as("v")).as[Array[Double]]
    // Per-partition moment accumulation — the classic one-pass Gramian
    // shape (cf. RowMatrix.computeGramianMatrix's treeAggregate), with
    // decimal(28,10) accumulators instead of BLAS doubles because the
    // result must be ORDER-INDEPENDENT: each element rounds to decimal
    // exactly as Spark's Cast would (BigDecimal.valueOf + HALF_UP),
    // decimal addition is exact and associative, so any partitioning —
    // and the driver-side partial merge in any order — yields the same
    // bits. No row inflation: one (count, d sums, d(d+1)/2 cells)
    // partial per partition, serialized as plain decimal strings.
    // mapPartitions is deliberate here (not a column program): the
    // d²-per-row fan-out through higher-order lambdas measured ~4x the
    // whole e08 query at sf0.1, while this pass is one multiply + one
    // BigDecimal add per cell.
    val partials = sample.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val d = first.length
        var cnt = 0L
        val acc = new Array[JBD](d + d * (d + 1) / 2)
        java.util.Arrays.fill(acc.asInstanceOf[Array[AnyRef]], JBD.ZERO)
        def add(r: Array[Double]): Unit = {
          cnt += 1
          var i = 0
          var cell = d
          while (i < d) {
            acc(i) = acc(i).add(
              JBD.valueOf(r(i)).setScale(10, RoundingMode.HALF_UP))
            var j = i
            while (j < d) {
              acc(cell) = acc(cell).add(JBD.valueOf(r(i) * r(j))
                .setScale(10, RoundingMode.HALF_UP))
              cell += 1; j += 1
            }
            i += 1
          }
        }
        add(first)
        it.foreach(add)
        Iterator.single((cnt, d, acc.map(_.toPlainString)))
      }
    }.collect()
    require(partials.nonEmpty, "empty training sample for the rotation")
    val d = partials.head._2
    val n = partials.map(_._1).sum
    val total = Array.fill(d + d * (d + 1) / 2)(JBD.ZERO)
    partials.foreach { case (_, pd, cells) =>
      require(pd == d, "ragged embedding dimensions in the sample")
      var c = 0
      while (c < total.length) {
        total(c) = total(c).add(new JBD(cells(c))); c += 1
      }
    }
    val mean = Array.tabulate(d)(i => total(i).doubleValue() / n)
    val gram = {
      val m = collection.mutable.Map.empty[(Int, Int), Double]
      var cell = d
      for (i <- 0 until d; j <- i until d) {
        m((i, j)) = total(cell).doubleValue(); cell += 1
      }
      m
    }
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = gram((i, j)) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    val (w, v) = jacobiEig(cov)
    (0 until d).sortBy(c => (-w(c), c)).take(m).toArray.map { c =>
      val row = Array.tabulate(d)(r => v(r)(c))
      val pivot = row.indices.maxBy(r => (math.abs(row(r)), -r))
      if (row(pivot) < 0) row.map(x => -x) else row
    }
  }

  /** Project an array<double> column onto literal rotation rows — a
    * higher-order column program (deterministic sequential folds), no
    * UDF. */
  private def projectCol(v: Column, rot: Array[Array[Double]]): Column =
    array(rot.map { row =>
      aggregate(zip_with(v, typedLit(row.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  /** rerankTopK with a TRAINED coarse stage: the shortlist scan scores
    * cosine over the top-`prefixDim` principal components instead of the
    * raw first-dims prefix. Used by e08's rerank audit row — on the
    * near-isotropic fixture the identity prefix is recall-floor-bound
    * (15/40); the trained rotation lifts it with the identical coarse
    * budget (prefixDim of dim floats per row). */
  def rerankTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int,
      prefixDim: Int, shortlist: Int): DataFrame =
    rerankTopKTrainedWith(corpus, queries, k,
      trainedRotation(corpus, prefixDim), shortlist)

  /** Same scan with a PRE-TRAINED rotation: one eigendecomposition
    * serves every prefix budget (rot32's first 16/24 rows ARE rot16/
    * rot24 by construction — one sort order, larger prefix), so a
    * capacity-curve audit like e08 trains ONCE and slices instead of
    * re-running the Gramian per budget. */
  def rerankTopKTrainedWith(corpus: DataFrame, queries: DataFrame, k: Int,
      rot: Array[Array[Double]], shortlist: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
    val wCoarse = Window.partitionBy("query_id")
      .orderBy(col("coarse").desc, col("neighbor_id"))
    val short = c
      .select(col("neighbor_id"), projectCol(col("cv"), rot).as("cp"))
      .crossJoin(broadcast(q.select(col("query_id"),
        projectCol(col("qv"), rot).as("qp"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("coarse", cosine(col("qp"), col("cp")))
      .withColumn("c_rank", row_number().over(wCoarse))
      .filter(col("c_rank") <= shortlist)
      .select("query_id", "neighbor_id", "c_rank")
    val wFine = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    short.join(c, "neighbor_id").join(broadcast(q), "query_id")
      .withColumn("score", cosine(col("qv"), col("cv")))
      .withColumn("n_rank", row_number().over(wFine))
      .filter(col("n_rank") <= k)
      .select("query_id", "n_rank", "neighbor_id", "c_rank")
  }

  /** Matryoshka-prefix coarse scan (first 16 of 64 dims) + exact rerank
    * of the 20-candidate shortlist. Fully deterministic (double cosine,
    * unique tie-breaks) → the DuckDB mirror recomputes both stages with
    * list slicing and is an exact oracle; output carries the coarse rank
    * alongside the final rank so reranking movement is visible as data. */
  val e11 = Q("e11_rerank_truncated",
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id < 8
      |), c AS (
      |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings
      |), short AS (
      |  SELECT query_id, neighbor_id, c_rank FROM (
      |    SELECT q.query_id, c.neighbor_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(q.qv[1:16], c.cv[1:16]) DESC,
      |                 c.neighbor_id) AS c_rank
      |    FROM q, c WHERE c.neighbor_id <> q.query_id) t
      |  WHERE c_rank <= 20
      |)
      |SELECT query_id, n_rank, neighbor_id, c_rank FROM (
      |  SELECT s.query_id, s.neighbor_id, s.c_rank,
      |    row_number() OVER (PARTITION BY s.query_id
      |      ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
      |               s.neighbor_id) AS n_rank
      |  FROM short s
      |  JOIN q ON s.query_id = q.query_id
      |  JOIN c ON s.neighbor_id = c.neighbor_id) t
      |WHERE n_rank <= 5 ORDER BY query_id, n_rank""".stripMargin) { (s, dir) =>
    rerankTopK(T.embeddings(s, dir), queriesOf(s, dir), 5,
        prefixDim = 16, shortlist = 20)
      .orderBy("query_id", "n_rank")
  }

  val all: Seq[Q] = Seq(e01, e02, e03, e04, e05, e06, e07, e08, e09, e10, e11)
}
