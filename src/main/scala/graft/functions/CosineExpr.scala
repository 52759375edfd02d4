package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two float/double
  * array columns — the hot inner loop of the similarity operators
  * (SURVEY §2.11 preference order: Expression with doGenCode > UDF).
  *
  * Compared to the compositional form
  * (`aggregate(zip_with(a,b,*),...)/sqrt(..)*sqrt(..)`), this evaluates in
  * one fused pass over the primitive arrays with no per-element lambda
  * dispatch, and participates in whole-stage codegen via a static-call
  * doGenCode (no CodegenFallback — the codegen'd form stays inside the
  * generated loop).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = extract(a.asInstanceOf[ArrayData], isFloat(left))
    val ys = extract(b.asInstanceOf[ArrayData], isFloat(right))
    CosineSimilarity.compute(xs, ys)
  }

  private def extract(a: ArrayData, float: Boolean): Array[Double] =
    if (float) {
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i); i += 1 }
      out
    } else a.toDoubleArray()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = if (isFloat(left)) "true" else "false"
      val rf = if (isFloat(right)) "true" else "false"
      s"""${ev.value} = graft.functions.CosineSimilarity.computeFromArrayData(
         |  $a, $b, $lf, $rf);""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Fused dot + norms in one pass (called from generated code). */
  def compute(xs: Array[Double], ys: Array[Double]): Double = {
    val n = math.min(xs.length, ys.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += xs(i) * ys(i); na += xs(i) * xs(i); nb += ys(i) * ys(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def computeFromArrayData(a: ArrayData, b: ArrayData,
      leftFloat: Boolean, rightFloat: Boolean): Double = {
    def arr(x: ArrayData, f: Boolean): Array[Double] =
      if (f) { val ff = x.toFloatArray(); val o = new Array[Double](ff.length)
        var i = 0; while (i < ff.length) { o(i) = ff(i); i += 1 }; o }
      else x.toDoubleArray()
    compute(arr(a, leftFloat), arr(b, rightFloat))
  }

  /** Column API. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** SQL registration: cosine_sim(a, b). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
}
