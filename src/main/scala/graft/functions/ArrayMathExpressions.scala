package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the dense-vector hot path.
  *
  * The higher-order-function composition `aggregate(zip_with(a, b, *),
  * 0.0, +)` is semantically a sequential left-fold dot product, but HOFs
  * are CodegenFallback: every row pays interpreted lambda dispatch plus a
  * zipped intermediate array, and the enclosing projection falls out of
  * whole-stage codegen. These fused loops evaluate the same left fold
  * (bit-identical result — multiplication/addition in index order) in one
  * pass over the unsafe array data with real `doGenCode`, so ANN scoring
  * (q40/q46/q65/q66 shapes) stays inside the codegen'd stage at scale.
  *
  * Inputs are analysis-checked to `array<double>` (these expressions are
  * SQL-visible via `register`, so arbitrary `array_dot(array(1,2), ...)`
  * calls reach them): `ImplicitCastInputTypes` coerces e.g. array<int>
  * to array<double> for free and rejects non-array inputs at analysis
  * time — without it, `ArrayData.getDouble` on an int-backed UnsafeArray
  * would reinterpret bytes and return silently wrong doubles. Elements
  * must be non-null; unequal lengths fold over the common prefix.
  */
abstract class ArrayFoldExpression extends BinaryExpression with ImplicitCastInputTypes {
  // inferred Seq[ArrayType] — AbstractDataType is private[sql] in Spark 4,
  // so the signature can't be named outside org.apache.spark.sql
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java source for one accumulation step given element exprs `x`, `y`. */
  protected def stepJava(x: String, y: String): String
  protected def stepEval(x: Double, y: Double): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += stepEval(a.getDouble(i), b.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += ${stepJava(s"$a.getDouble($i)", s"$b.getDouble($i)")};
        }
        ${ev.value} = $s;
      """
    })
}

/** Σ aᵢ·bᵢ — dense dot product. */
case class ArrayDot(left: Expression, right: Expression) extends ArrayFoldExpression {
  override protected def stepJava(x: String, y: String): String = s"$x * $y"
  override protected def stepEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_dot"
}

/** Σ (aᵢ−bᵢ)² — squared euclidean distance (IVF cell assignment). */
case class ArraySqDist(left: Expression, right: Expression) extends ArrayFoldExpression {
  override protected def stepJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def stepEval(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySqDist =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_sqdist"
}

object ArrayMath {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArraySqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register SQL-visible forms on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_sqdist", exprs => ArraySqDist(exprs(0), exprs(1)), "built-in")
  }
}
