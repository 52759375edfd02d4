package graft

import graft.functions.HashSketches
import org.apache.spark.sql.functions._

/** Native sketch expressions: interpreted-eval vs codegen parity,
  * determinism, and whole-stage-codegen participation (they must not
  * break the codegen span the way a CodegenFallback would). */
class HashSketchesSpec extends SparkSpec {

  import spark.implicits._

  test("minhash_sig: codegen and interpreted eval agree, deterministic") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(42L), Seq.empty[Long])
      .toDF("hashes")
    val sig = HashSketches.minhash_sig(col("hashes"), 16)
    val a = df.select(sig).collect().map(_.getSeq[Long](0))
    val b = df.select(sig).collect().map(_.getSeq[Long](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
    assert(a.head.length == 16)
    // empty input → all slots at Long.MaxValue (empty-set signature)
    assert(a(2).forall(_ == Long.MaxValue))
    // direct-eval parity
    val direct = HashSketches.minhashSig(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(1L, 2L, 3L)), 16).toLongArray()
    assert(a.head == direct.toSeq)
  }

  test("simhash_64 reflects bit-majority of inputs") {
    // single hash → simhash == that hash (every bit wins its own vote)
    val one = Seq(Seq(0x0f0f0f0f0f0f0f0fL)).toDF("hashes")
    val got = one.select(HashSketches.simhash_64(col("hashes"))).head().getLong(0)
    assert(got == 0x0f0f0f0f0f0f0f0fL)
  }

  test("hyperplane_sig stays inside whole-stage codegen") {
    val planes = Array.tabulate(2 * 3 * 4)(i => (i % 7 - 3).toDouble)
    // non-local source: a literal table would constant-fold to a
    // LocalTableScan and hide the codegen span
    val df = spark.range(4).select(
      array(col("id").cast("double"), (-col("id")).cast("double"),
        lit(0.5), lit(3.0)).as("v"))
    val out = df.select(
      HashSketches.hyperplane_sig(col("v"), planes, 2, 3, 4).as("sig"))
    // `*(n)` prefixes mark WholeStageCodegen stages in the simple plan
    // string; the projection containing the expression must carry one
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("hyperplanesig") && l.trim.startsWith("*(")),
      s"hyperplane_sig not inside a codegen stage:\n$plan")
    val sigs = out.collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 2))
    assert(sigs.forall(_.forall(s => s >= 0 && s < 8))) // 3-bit words
  }
}
