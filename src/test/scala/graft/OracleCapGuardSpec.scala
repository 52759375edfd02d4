package graft

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The banded pair generators (d12 chunks, d26 permuted prefixes, m08
  * image bands) star-contract buckets above DefaultBucketCap, but their
  * DuckDB oracles brute-force ALL qualifying pairs — oracle equality
  * therefore assumes no bucket at the correctness-gate corpus (sf0.01)
  * ever exceeds the cap. This suite pins that assumption AT the gate
  * corpus, so a fixture change that saturates a bucket fails loudly here
  * instead of silently desyncing the oracle (the no-silent-caps
  * contract, applied to the gate itself).
  */
class OracleCapGuardSpec extends SparkSpec {

  private val gate = "/root/testdata/sf0.01"

  private def maxBucket(rows: DataFrame, keys: Seq[String]): Long =
    rows.groupBy(keys.map(col): _*).count()
      .agg(max("count")).head().getLong(0)

  test("d12 chunk buckets at gate scale stay far below the cap") {
    val toks = Dedup.shingled(spark, gate).select("doc_id", "toks")
    val m = maxBucket(Dedup.simhashChunkRows(toks), Seq("chunk", "ckey"))
    assert(m <= Dedup.DefaultBucketCap,
      s"saturated simhash chunk bucket ($m) desyncs the d12 oracle")
  }

  test("d26 permuted-prefix buckets at gate scale stay below the cap " +
      "and the oracle's hardcoded prefixBits=4 matches the corpus size") {
    val toks = Dedup.shingled(spark, gate).select("doc_id", "toks")
    val n = toks.count()
    val bits = math.min(28, math.max(4,
      (math.log(n.toDouble / 128.0) / math.log(2)).ceil.toInt))
    assert(bits == 4,
      s"adaptive prefixBits=$bits at n=$n — the d26 oracle hardcodes 4")
    val m = maxBucket(Dedup.simhashPermutedKeyRows(toks, 8, bits),
      Seq("tk.tbl", "tk.key"))
    assert(m <= Dedup.DefaultBucketCap,
      s"saturated permuted bucket ($m) desyncs the d26 oracle")
  }

  test("m08 image band buckets at gate scale stay below the cap") {
    val hashes = Multimodal.perceptualHash(
      Multimodal.imagesFromDocuments(spark, gate)).toDF()
    val m = maxBucket(Multimodal.imageBandRows(hashes),
      Seq("gw", "gh", "band", "bkey"))
    assert(m <= Dedup.DefaultBucketCap,
      s"saturated image band bucket ($m) desyncs the m08 oracle")
  }

  test("m10 audio band buckets at gate scale stay below the cap") {
    val fps = Multimodal.audioFingerprint(
      Multimodal.audioGroupsFromDocuments(spark, gate)).toDF()
    val m = maxBucket(Multimodal.audioBandRows(fps),
      Seq("n_frames", "band", "bkey"))
    assert(m <= Dedup.DefaultBucketCap,
      s"saturated audio band bucket ($m) desyncs the m10 oracle")
  }

  // m10/m11's contracted reports band over class REPRESENTATIVES, a
  // subset of the full fingerprint relation — the fps-level bounds above
  // and below therefore imply the rep-level no-contraction assumption
  // their 'near' oracles rely on.
  test("m11 video band buckets at gate scale stay below the cap") {
    val fps = Multimodal.videoFingerprint(
      Multimodal.videoGroupsFromDocuments(spark, gate), stride = 2).toDF()
    val m = maxBucket(Multimodal.imageBandRows(fps),
      Seq("gw", "gh", "band", "bkey"))
    assert(m <= Dedup.DefaultBucketCap,
      s"saturated video band bucket ($m) desyncs the m11 oracle")
  }
}
