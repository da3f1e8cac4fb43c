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
  * would reinterpret bytes and return silently wrong doubles. Unequal
  * lengths fold over the common prefix — NOTE this deliberately differs
  * from the `zip_with` form, which null-pads the shorter side and so
  * returns NULL for a ragged pair; the ops layer fails loudly on ragged
  * corpora before these expressions ever see one, and the prefix rule
  * is what [[NearestCell]]/[[graft.ops.Similarity]] specify for
  * truncated-dimension index probes.
  *
  * Null ELEMENTS propagate to a NULL result — matching the HOF
  * compositions these replace (`aggregate` over a null element is null),
  * so dirty data surfaces as null scores (which every ranker here
  * filters) instead of silently folding a garbage 0.0. The per-element
  * `isNullAt` probe is emitted ONLY when the input schema admits null
  * elements (`containsNull`); arrays declared element-non-null keep the
  * branch-free loop. */
object ArrayFoldExpression {
  private[functions] def mayHaveNullElems(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
}

abstract class ArrayFoldExpression extends BinaryExpression with ImplicitCastInputTypes {
  import ArrayFoldExpression.mayHaveNullElems
  // inferred Seq[ArrayType] — AbstractDataType is private[sql] in Spark 4,
  // so the signature can't be named outside org.apache.spark.sql
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected lazy val chkA: Boolean = mayHaveNullElems(left)
  protected lazy val chkB: Boolean = mayHaveNullElems(right)
  override def nullable: Boolean = super.nullable || chkA || chkB

  /** Java source for one accumulation step given element exprs `x`, `y`. */
  protected def stepJava(x: String, y: String): String
  protected def stepEval(x: Double, y: Double): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if ((chkA && a.isNullAt(i)) || (chkB && b.isNullAt(i))) return null
      s += stepEval(a.getDouble(i), b.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      val step = s"$s += ${stepJava(s"$a.getDouble($i)", s"$b.getDouble($i)")};"
      if (chkA || chkB) {
        // nullable is true here, so ev.isNull is a real assignable local
        val probe = Seq(
          if (chkA) Some(s"$a.isNullAt($i)") else None,
          if (chkB) Some(s"$b.isNullAt($i)") else None).flatten.mkString(" || ")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $s = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($probe) { $bad = true; break; }
            $step
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
        """
      } else {
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $step
          }
          ${ev.value} = $s;
        """
      }
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

/** Fused cosine similarity: Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) in ONE pass over the
  * arrays — the rerank hot loop of every ANN query. Bit-identical to the
  * three-ArrayDot composition it replaces (independent accumulators in
  * the same index order; the dot runs over the common prefix while each
  * norm runs over its own full array, exactly like the composition),
  * but one array traversal per row instead of three. */
case class ArrayCosineSim(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  import ArrayFoldExpression.mayHaveNullElems
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_cosine_sim"
  private lazy val chkA: Boolean = mayHaveNullElems(left)
  private lazy val chkB: Boolean = mayHaveNullElems(right)
  override def nullable: Boolean = super.nullable || chkA || chkB

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if ((chkA && a.isNullAt(i)) || (chkB && b.isNullAt(i))) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    while (i < na) {
      if (chkA && a.isNullAt(i)) return null
      val x = a.getDouble(i); aa += x * x; i += 1
    }
    var j = n
    while (j < nb) {
      if (chkB && b.isNullAt(j)) return null
      val y = b.getDouble(j); bb += y * y; j += 1
    }
    ab / (java.lang.Math.sqrt(aa) * java.lang.Math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      if (chkA || chkB) {
        // null element → null result (ev.isNull is a real local: see
        // the nullable override). Probes emitted only for the sides
        // whose schema admits null elements.
        val probeBoth = Seq(
          if (chkA) Some(s"$a.isNullAt($i)") else None,
          if (chkB) Some(s"$b.isNullAt($i)") else None).flatten.mkString(" || ")
        val probeTailA =
          if (chkA) s"if ($a.isNullAt($i)) { $bad = true; break; }" else ""
        val probeTailB =
          if (chkB) s"if ($b.isNullAt($j)) { $bad = true; break; }" else ""
        s"""
          int $na = $a.numElements();
          int $nb = $b.numElements();
          int $n = java.lang.Math.min($na, $nb);
          double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
          boolean $bad = false;
          int $i = 0;
          for (; $i < $n; $i++) {
            if ($probeBoth) { $bad = true; break; }
            double $x = $a.getDouble($i);
            double $y = $b.getDouble($i);
            $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
          }
          if (!$bad) {
            for (; $i < $na; $i++) {
              $probeTailA
              double $x = $a.getDouble($i); $aa += $x * $x;
            }
          }
          if (!$bad) {
            for (int $j = $n; $j < $nb; $j++) {
              $probeTailB
              double $y = $b.getDouble($j); $bb += $y * $y;
            }
          }
          if ($bad) { ${ev.isNull} = true; }
          else { ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb)); }
        """
      } else {
        s"""
          int $na = $a.numElements();
          int $nb = $b.numElements();
          int $n = java.lang.Math.min($na, $nb);
          double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
          int $i = 0;
          for (; $i < $n; $i++) {
            double $x = $a.getDouble($i);
            double $y = $b.getDouble($i);
            $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
          }
          for (; $i < $na; $i++) { double $x = $a.getDouble($i); $aa += $x * $x; }
          for (int $j = $n; $j < $nb; $j++) { double $y = $b.getDouble($j); $bb += $y * $y; }
          ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
        """
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosineSim =
    copy(left = newLeft, right = newRight)
}

/** Fused int8 scalar quantization: ONE pass finds the max-abs scale,
  * a second emits codes floor(x·127/scale + 0.5) — O(2d) per row. The
  * Column-level composition (`transform` with the O(d) scale expression
  * referenced inside the lambda) re-evaluates the scale PER ELEMENT
  * under interpreted HOF evaluation: O(d²) per row, the jaccardVerify
  * pitfall. Identical arithmetic to the composed form (same max
  * comparison order, same floor/divide), floor(1e-30) floor as the
  * zero-vector guard. Returns struct(codes array<int>, scale double). */
case class QuantizeInt8Expr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("scale", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_int8"
  private lazy val chkNull: Boolean = ArrayFoldExpression.mayHaveNullElems(child)
  override def nullable: Boolean = super.nullable || chkNull

  /** Null element → null row (the `transform` composition this replaces
    * propagated element nulls); probe skipped when the schema says
    * elements are non-null. Returns null for that case — the codegen
    * below branches on it. */
  def compute(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (chkNull && v.isNullAt(i)) return null
      val a = math.abs(v.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = math.max(maxAbs, 1e-30)
    val codes = new Array[Int](n)
    i = 0
    while (i < n) {
      codes(i) = math.floor(v.getDouble(i) * 127 / scale + 0.5).toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(codes),
        scale))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("quantInt8", this, classOf[QuantizeInt8Expr].getName)
      if (chkNull) {
        // compute() returns null on a null element (nullable is true
        // here, so ev.isNull is a real local)
        val r = ctx.freshName("r")
        s"""
          InternalRow $r = $ref.compute($v);
          if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
        """
      } else {
        s"${ev.value} = $ref.compute($v);"
      }
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Expr =
    copy(child = newChild)
}

object ArrayMath {
  def quantizeInt8(v: Column): Column =
    ColumnBridge.column(QuantizeInt8Expr(ColumnBridge.expression(v)))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayCosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArraySqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact-arity SQL builder: without the guard, `array_dot(a, b, w)`
    * would silently drop `w` (a user expecting a weighted dot gets
    * dot(a, b) with no error) and `array_dot(a)` would die with a bare
    * IndexOutOfBoundsException at plan time. Shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  private[graft] def binaryBuilder(name: String,
      f: (Expression, Expression) => Expression): Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$name(a, b) takes exactly 2 arguments, got ${exprs.length}")
  }

  private[graft] val arrayDotBuilder = binaryBuilder("array_dot", ArrayDot)
  private[graft] val arraySqDistBuilder = binaryBuilder("array_sqdist", ArraySqDist)
  private[graft] val arrayCosineSimBuilder =
    binaryBuilder("array_cosine_sim", ArrayCosineSim)

  /** Register SQL-visible forms on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", arrayDotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_sqdist", arraySqDistBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_cosine_sim", arrayCosineSimBuilder, "built-in")
  }
}
