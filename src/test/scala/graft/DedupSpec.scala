package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("minhash LSH finds planted near-dups with high recall, verified precision") {
    val truth = Dedup.bruteForcePairs(docs, 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minhashPairs(docs, 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus should contain planted near-dup pairs")
    // precision is exact by construction (candidates are re-verified)
    assert(found.subsetOf(truth))
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (found ${found.size} of ${truth.size})")
  }

  test("minhash pairs are deterministic across runs") {
    val a = Dedup.minhashPairs(docs, 0.7).orderBy("doc_a", "doc_b").collect().toSeq
    val b = Dedup.minhashPairs(docs, 0.7).orderBy("doc_a", "doc_b").collect().toSeq
    assert(a == b)
  }

  test("simhash near-dup pairs include the highest-jaccard planted dups") {
    val strong = Dedup.bruteForcePairs(docs, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty)
    val recall = strong.count(sim.contains).toDouble / strong.size
    assert(recall >= 0.8, s"simhash recall on strong dups $recall < 0.8")
  }

  test("simhash is a pure function of text") {
    val sigs = docs.withColumn("sim", Dedup.simhash(col("text")))
      .select("doc_id", "sim").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = docs.withColumn("sim", Dedup.simhash(col("text")))
      .select("doc_id", "sim").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == again)
    assert(sigs.values.toSet.size > 1, "signatures should not be constant")
  }
}
