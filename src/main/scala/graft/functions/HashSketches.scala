package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup hash sketches (SURVEY §2.11
  * preference order: Expression with doGenCode > UDF > anything).
  *
  * The compositional higher-order-function forms
  * (`transform(sequence(0,63), j -> array_min(transform(...)))`) evaluate
  * one interpreted lambda dispatch per (element × slot) — ~100M dispatches
  * over the bench corpus. These expressions do the same math in one fused
  * primitive loop per row and stay inside whole-stage codegen via a
  * static-call doGenCode.
  */
object HashSketches {

  /** splitmix64 finalizer — a full-avalanche 64-bit mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: slot j = min over input hashes h of
    * mix64(h ^ (j · φ64)). Called from generated code. */
  def minhashSig(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = mix64(h ^ (j.toLong * 0x9e3779b97f4a7c15L))
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Frequency-weighted 64-bit SimHash over input hashes: bit k of the
    * result is set iff Σ over hashes of (±1 by bit k of the hash) > 0. */
  def simhash64(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) out |= (1L << k)
      k += 1
    }
    out
  }

  /** Hyperplane LSH signatures: one packed sign-bit word per table.
    * planes is laid out [(table·bits + bit)·dim + i]; bit b of word t is
    * set iff dot(vec, plane[t][b]) ≥ 0, dot accumulated left-to-right
    * (matching the compositional zip_with/aggregate form bit-for-bit). */
  def hyperplaneSig(vec: ArrayData, planes: Array[Double],
      tables: Int, bits: Int, dim: Int): ArrayData = {
    val v = vec.toDoubleArray()
    val n = math.min(v.length, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var word = 0L
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v(i) * planes(off + i); i += 1 }
        if (dot >= 0.0) word |= (1L << b)
        b += 1
      }
      out(t) = word
      t += 1
    }
    new GenericArrayData(out)
  }

  def minhash_sig(hashes: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(hashes), numHashes))

  def simhash_64(hashes: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(hashes)))

  def hyperplane_sig(vec: Column, planes: Array[Double], tables: Int,
      bits: Int, dim: Int): Column =
    GraftSqlBridge.column(HyperplaneSig(
      GraftSqlBridge.expression(vec), planes.toSeq, tables, bits, dim))
}

/** array<long> of element hashes → array<long> MinHash signature. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    HashSketches.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashSketches.minhashSig($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** array<double> vector → array<long> of per-table packed hyperplane
  * sign bits (random-hyperplane LSH bucket keys, one fused pass). */
case class HyperplaneSig(child: Expression, planes: Seq[Double],
    tables: Int, bits: Int, dim: Int) extends UnaryExpression {

  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig expects array<double>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    HashSketches.hyperplaneSig(input.asInstanceOf[ArrayData], planesArr,
      tables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashSketches.hyperplaneSig($a, $ref, $tables, $bits, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** array<long> of element hashes → 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_64 expects array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    HashSketches.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashSketches.simhash64($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
