package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact (hash groupBy),
  * MinHash+LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: signatures are computed per-row with higher-order column
  * functions (no UDFs, no shuffle); the only shuffles are the LSH
  * band-bucket groupBys, which are uniform by construction (band keys are
  * 64-bit hashes — no skew), and candidate pairs are verified with an
  * equi-join on doc_id. At 100 TB the band explode multiplies rows by
  * NUM_BANDS, so bands are kept narrow (doc_id + 1 hash column) before the
  * shuffle — the full shingle sets are re-joined only for the (tiny)
  * candidate set.
  */
object Dedup {

  private val NUM_HASHES = 64
  private val BANDS = 16
  private val ROWS_PER_BAND = NUM_HASHES / BANDS // r=4 → s-curve ~0.5 @ j=0.7

  /** Word tokens of trimmed text. */
  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct 3-word shingles. */
  def shingles(c: Column): Column = {
    val t = tokens(c)
    array_distinct(
      when(size(t) >= 3,
        expr("""transform(sequence(0, size(split(trim(text), '\\s+')) - 3),
                i -> concat_ws(' ', element_at(split(trim(text), '\\s+'), i + 1),
                               element_at(split(trim(text), '\\s+'), i + 2),
                               element_at(split(trim(text), '\\s+'), i + 3)))"""))
        .otherwise(array(trim(c))))
  }

  /** 64-slot MinHash signature over PRE-HASHED shingles: slot j = min over
    * shingle hashes h of xxhash64(h, j). Pure column math, codegen-friendly. */
  def minhashSig(hashesCol: String): Column =
    expr(s"""transform(sequence(0, ${NUM_HASHES - 1}),
             j -> array_min(transform($hashesCol, h -> xxhash64(h, j))))""")

  /** docs(doc_id, text) → near-dup pairs (doc_a < doc_b, jaccard ≥ minJaccard)
    * via MinHash banding + exact shingle-Jaccard verification.
    *
    * Each stage is materialized (localCheckpoint): otherwise Catalyst's
    * CollapseProject inlines the tokenizer into all 64 signature slots and
    * then the signature into all 16 band keys — thousands of regex splits
    * per row. At cluster scale these materializations are the silver
    * signature tables you would persist anyway. */
  def minhashPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val base = docs
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .localCheckpoint()
    val withSig = base
      .select(col("doc_id"), col("sh"),
        expr("transform(sh, s -> xxhash64(s))").as("shl"))
      .withColumn("sig", minhashSig("shl"))
      .select("doc_id", "sig")
      .localCheckpoint()
    val shingleSets = base
    // band key = hash of the band's signature slice; explode to
    // (band, key, doc_id) — narrow row before the shuffle.
    val bands = withSig.select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, ${BANDS - 1}),
              b -> xxhash64(b, ${(0 until ROWS_PER_BAND).map(i =>
                s"element_at(sig, b * $ROWS_PER_BAND + ${i + 1})").mkString(", ")}))"""))
          .as(Seq("band", "bkey")))
    val buckets = bands.groupBy("band", "bkey")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val candidates = buckets
      .select(explode(expr(
        """filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))),
           p -> p.a < p.b)""")).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    val ja = shingleSets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val jb = shingleSets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    candidates.join(ja, "doc_a").join(jb, "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact all-pairs shingle Jaccard (quadratic — test oracle only). */
  def bruteForcePairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sets = docs.withColumn("sh", shingles(col("text")))
      .select(col("doc_id"), col("sh"))
    val a = sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash over word tokens (frequency-weighted). Bitwise
    * OR/shift assembly — arithmetic accumulation overflows the sign bit
    * under ANSI mode. */
  def simhash(c: Column): Column =
    expr("""aggregate(sequence(0, 63), cast(0 as bigint),
            (acc, j) -> acc | shiftleft(cast(if(
              aggregate(split(trim(text), '\\s+'), 0,
                (s, w) -> s + if((shiftright(xxhash64(w), 63 - j) & 1) = 1, 1, -1))
              > 0, 1, 0) as bigint), 63 - j))""")

  /** SimHash near-dup pairs: 4×16-bit chunk banding then exact Hamming
    * distance ≤ maxHamming via bit_count(xor). */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = docs.withColumn("sim", simhash(col("text")))
      .select(col("doc_id"), col("sim"))
    val chunks = sigs.select(col("doc_id"), col("sim"),
      posexplode(expr(
        "transform(sequence(0, 3), i -> shiftright(sim, i * 16) & 65535)"))
        .as(Seq("chunk", "ckey")))
    val buckets = chunks.groupBy("chunk", "ckey")
      .agg(collect_list(struct(col("doc_id"), col("sim"))).as("xs"))
      .filter(size(col("xs")) > 1)
    buckets
      .select(explode(expr(
        """filter(flatten(transform(xs, a -> transform(xs, b -> struct(a, b)))),
           p -> p.a.doc_id < p.b.doc_id)""")).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        expr("bit_count(p.a.sim ^ p.b.sim)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------------- queries

  /** Exact dedup: keep the lowest doc_id per identical text
    * (hash-groupBy; at scale: groupBy(md5) to avoid wide-key shuffle). */
  val d10 = Q("d10_exact_dedup",
    """SELECT min(doc_id) AS keep_id, count(*) AS dup_count
      |FROM documents GROUP BY md5(text)
      |ORDER BY keep_id""".stripMargin) { (s, dir) =>
    T.documents(s, dir)
      .groupBy(md5(col("text").cast("binary")))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select("keep_id", "dup_count")
      .orderBy("keep_id")
  }

  /** MinHash+LSH near-dup candidate pairs, verified at jaccard ≥ 0.7.
    * Approximate candidate generation isn't SQL-expressible → rows-only
    * driver check; recall/precision pinned by DedupSpec instead. */
  val d11 = Q.noOracle("d11_minhash_lsh_pairs") { (s, dir) =>
    minhashPairs(T.documents(s, dir), 0.7).orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup pairs at Hamming ≤ 6. */
  val d12 = Q.noOracle("d12_simhash_pairs") { (s, dir) =>
    simhashPairs(T.documents(s, dir), 6).orderBy("doc_a", "doc_b")
  }

  /** N-gram (3-shingle) Jaccard on LSH candidates — the verification join
    * output with scores, thresholded low to expose the score distribution. */
  val d13 = Q.noOracle("d13_ngram_jaccard_pairs") { (s, dir) =>
    minhashPairs(T.documents(s, dir), 0.3)
      .withColumn("jaccard_pct", round(col("jaccard") * 100).cast("int"))
      .select("doc_a", "doc_b", "jaccard_pct")
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[Q] = Seq(d10, d11, d12, d13)
}
