package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** ANN index-state expressions: nearest-cell / PQ-code / ADC / LSH
  * signature computation against BROADCAST index tables.
  *
  * The first-cut forms built these as expression trees over literal
  * arrays (`least(struct(sqdist(v, typedLit(c_i)), i))` over k cells).
  * That is fine at toy k, but the serialized plan grows O(k·d): at a
  * production quantizer (k = 2^16 cells, d = 1024) the plan is hundreds
  * of MB, analysis walks 2^16 expression nodes per query, and every task
  * binary re-ships the whole codebook. Here the index state rides a
  * `Broadcast` handle instead — the plan and task binaries stay O(1) in
  * k·d (gated by PlanSpec), executors fetch the table once via torrent
  * broadcast, and the per-row work is one fused loop.
  *
  * Numeric contract (cross-engine oracle exactness — the DuckDB oracles
  * recompute these in SQL): identical to the literal forms —
  *  - distances accumulate in index order, `(x−y)²` / `x·y` per step
  *    (the [[ArrayFoldExpression]] fold, bit-identical);
  *  - `roundDp ≥ 0` rounds HALF_UP on the shortest decimal
  *    representation before any comparison (Spark `round` semantics), so
  *    a last-ulp wobble cannot flip an argmin or a sign;
  *  - argmin ties break to the LOWEST id (strict `<`, the
  *    `least(struct(d, id))` lexicographic rule), and multi-probe cell
  *    lists order by (d, id) ascending (stable sort ≙ `array_sort` on
  *    `struct(d, cell)`).
  *
  * Codegen: each expression stays inside whole-stage codegen by emitting
  * a call to its own `compute` via `addReferenceObj` — the O(k·d) inner
  * loop is a plain JVM method the JIT compiles once, and the row loop
  * around it stays fused (no CodegenFallback interpretation).
  */
object IndexExpressions {

  /** Spark `round(col, dp)` semantics for doubles (RoundBase): HALF_UP
    * on `BigDecimal.valueOf`'s shortest-decimal form; NaN/Inf pass
    * through; negative dp = identity (matches the literal forms'
    * "roundDp = -1 disables rounding" convention). */
  def roundTo(dp: Int, d: Double): Double =
    if (dp < 0 || java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(dp, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Squared L2 between an ArrayData vector (from offset `off`) and a
    * codeword, over `len` components — the ArraySqDist fold. */
  @inline private[functions] def sqDistFrom(
      v: ArrayData, off: Int, cw: Array[Double], len: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < len) { val t = v.getDouble(off + i) - cw(i); s += t * t; i += 1 }
    s
  }

  /** Shared per-subspace nearest-codeword encode (the PQ quantizer):
    * rounded-distance argmin per subspace, ties to the lowest code id,
    * vectors shorter than m·dsub fold over their truncated tail. Both
    * the codegen'd [[PqEncodeExpr]] and OPQ training's driver-side
    * reconstruction ([[graft.ops.Similarity.trainOpqRotation]]) call
    * THIS — a rounding/tie-rule change in one place cannot silently
    * make training optimize against a different quantizer than queries
    * use. */
  private[graft] def pqEncode(cbs: Array[Array[Array[Double]]],
      v: ArrayData, roundDp: Int): Array[Int] =
    pqEncodeImpl(cbs, v.numElements(), v.getDouble, roundDp)

  /** [[pqEncode]] over a plain Array — the OPQ-training hot loop calls
    * this per corpus row per iteration, so it must not pay an
    * UnsafeArrayData copy just to satisfy the ArrayData signature. */
  private[graft] def pqEncode(cbs: Array[Array[Array[Double]]],
      v: Array[Double], roundDp: Int): Array[Int] =
    pqEncodeImpl(cbs, v.length, v(_), roundDp)

  /** Fail fast on a degenerate codebook table. Similarity's builders
    * validate too, but [[PqEncodeExpr]]/[[AdcDistExpr]] are public
    * extension surfaces: an empty table would die with a bare
    * ArrayIndexOutOfBoundsException mid-job, and an empty SUBSPACE would
    * silently emit code 0 for every row (the argmin loop never runs) — a
    * persisted codes table full of garbage, not an error. */
  private[functions] def requireCodebooks(
      cbs: Array[Array[Array[Double]]], what: String): Unit = {
    if (cbs.isEmpty)
      throw new IllegalArgumentException(
        s"$what: empty codebook table — train or load codebooks first")
    var s = 0
    while (s < cbs.length) {
      if (cbs(s).isEmpty || cbs(s)(0).isEmpty)
        throw new IllegalArgumentException(
          s"$what: subspace $s has no codewords — codebook table is corrupt")
      s += 1
    }
  }

  // Int => Double is @specialized, so the accessor indirection costs a
  // (bimorphic) call, not boxing; both public forms reduce through THIS
  // loop — one argmin implementation, one set of rounding/tie rules.
  private def pqEncodeImpl(cbs: Array[Array[Array[Double]]],
      n: Int, elem: Int => Double, roundDp: Int): Array[Int] = {
    requireCodebooks(cbs, "pq_codes")
    val dsub = cbs(0)(0).length
    val out = new Array[Int](cbs.length)
    var s = 0
    while (s < cbs.length) {
      val cb = cbs(s)
      val off = s * dsub
      // clamp to the elements that exist: an unclamped read past the
      // array end reads garbage bytes (ArrayData) or throws (Array)
      val len = math.min(dsub, math.max(0, n - off))
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var d = 0.0
        var i = 0
        while (i < len) { val t = elem(off + i) - cw(i); d += t * t; i += 1 }
        val rd = roundTo(roundDp, d)
        if (rd < bestD) { bestD = rd; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }

  /** Fail fast on a NULL element. These kernels compute INDEX STATE
    * (cells, codes, signatures): `getDouble` on a null slot reads a
    * garbage 0.0, which would silently misassign the row (e.g. to
    * whatever cell is nearest the zero-patched vector) rather than
    * surface as a filterable null score the way the similarity folds do.
    * Callers skip the probe statically when the input schema declares
    * elements non-null ([[ArrayFoldExpression.mayHaveNullElems]]). */
  private[functions] def requireNoNullElems(v: ArrayData, what: String): Unit = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"$what: input array has a NULL element at index $i — index " +
            "expressions require dense non-null vectors (filter or impute " +
            "upstream)")
      i += 1
    }
  }
}

/** Index of the nearest centroid (rounded-distance argmin, ties to the
  * lowest cell id) against a broadcast centroid table. */
case class NearestCell(
    child: Expression,
    bc: Broadcast[Array[Array[Double]]],
    roundDp: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivf_cell"
  private lazy val chkNull = ArrayFoldExpression.mayHaveNullElems(child)

  def compute(v: ArrayData): Int = {
    val cs = bc.value
    // Similarity.ivfCell guards this too, but the expression is a public
    // extension surface: an argmin over zero cells would silently emit
    // cell 0 for every row (a degenerate full-bucket join downstream)
    if (cs.isEmpty)
      throw new IllegalArgumentException(
        "ivf_cell: empty centroid table — train or load centroids first")
    if (chkNull) IndexExpressions.requireNoNullElems(v, prettyName)
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val cw = cs(c)
      val d = IndexExpressions.roundTo(roundDp,
        IndexExpressions.sqDistFrom(v, 0, cw, math.min(v.numElements(), cw.length)))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** The `nprobe` nearest centroid cells, nearest first (ties by lowest
  * cell id) — the multi-probe companion of [[NearestCell]]. */
case class NearestCells(
    child: Expression,
    bc: Broadcast[Array[Array[Double]]],
    nprobe: Int,
    roundDp: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivf_cells"
  private lazy val chkNull = ArrayFoldExpression.mayHaveNullElems(child)

  def compute(v: ArrayData): ArrayData = {
    val cs = bc.value
    val k = cs.length
    // Similarity.ivfCells guards this, but the expression is a public
    // extension surface: copyOf past k would zero-pad, silently
    // reporting cell 0 as the extra probes instead of failing
    if (nprobe < 1 || nprobe > k)
      throw new IllegalArgumentException(
        s"nprobe $nprobe out of range [1, $k] for a $k-cell centroid table")
    if (chkNull) IndexExpressions.requireNoNullElems(v, prettyName)
    // bounded selection: a size-nprobe insertion buffer ordered by
    // (distance, cell id) ascending — O(k·nprobe) primitive work per row
    // instead of a full boxed O(k log k) sort (at production k = 2^16
    // the sort dominated the multi-probe hot path). Double.compare gives
    // the same total order as Ordering.Double.TotalOrdering (NaN last,
    // -0.0 < 0.0); scanning cells in ascending id order and inserting
    // strictly-before-greater keeps equal distances in id order — the
    // array_sort(struct(d, cell)) lexicographic rule, exactly.
    val dist = new Array[Double](nprobe)
    val ids = new Array[Int](nprobe)
    var filled = 0
    var c = 0
    while (c < k) {
      val cw = cs(c)
      val d = IndexExpressions.roundTo(roundDp,
        IndexExpressions.sqDistFrom(v, 0, cw, math.min(v.numElements(), cw.length)))
      if (filled < nprobe || java.lang.Double.compare(d, dist(filled - 1)) < 0) {
        var p = if (filled < nprobe) filled else nprobe - 1
        while (p > 0 && java.lang.Double.compare(dist(p - 1), d) > 0) {
          dist(p) = dist(p - 1); ids(p) = ids(p - 1); p -= 1
        }
        dist(p) = d; ids(p) = c
        if (filled < nprobe) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(ids)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** PQ encoding: per-subspace rounded-distance argmin (ties to the lowest
  * code id) against broadcast codebooks — m small ints per vector. */
case class PqEncodeExpr(
    child: Expression,
    bc: Broadcast[Array[Array[Array[Double]]]],
    roundDp: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_codes"
  private lazy val chkNull = ArrayFoldExpression.mayHaveNullElems(child)

  def compute(v: ArrayData): ArrayData = {
    if (chkNull) IndexExpressions.requireNoNullElems(v, prettyName)
    UnsafeArrayData.fromPrimitiveArray(
      IndexExpressions.pqEncode(bc.value, v, roundDp))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Asymmetric distance (ADC): Σ over subspaces of the rounded exact
  * distance from the raw query subvector to the encoded row's codeword,
  * terms summed in subspace order, total rounded — identical to the
  * literal `element_at` + sqDist + round composition. */
case class AdcDistExpr(
    left: Expression,  // raw query vector, array<double>
    right: Expression, // corpus row codes, array<int>
    bc: Broadcast[Array[Array[Array[Double]]]],
    roundDp: Int)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_distance"
  private lazy val chkQ = ArrayFoldExpression.mayHaveNullElems(left)
  private lazy val chkC = ArrayFoldExpression.mayHaveNullElems(right)

  def compute(qv: ArrayData, codes: ArrayData): Double = {
    val cbs = bc.value
    IndexExpressions.requireCodebooks(cbs, prettyName)
    val dsub = cbs(0)(0).length
    if (chkQ) IndexExpressions.requireNoNullElems(qv, prettyName)
    if (chkC) IndexExpressions.requireNoNullElems(codes, prettyName)
    // fail fast on an index/codebook mismatch: a codes table encoded
    // with a different m or ksub would otherwise read past the codes
    // array or out of the codebook — garbage distances, not an error
    if (codes.numElements() != cbs.length)
      throw new IllegalArgumentException(
        s"codes length ${codes.numElements()} != ${cbs.length} subspaces — " +
          "codes table was encoded with different codebooks")
    var total = 0.0
    var s = 0
    while (s < cbs.length) {
      val code = codes.getInt(s)
      if (code < 0 || code >= cbs(s).length)
        throw new IllegalArgumentException(
          s"code $code out of range [0, ${cbs(s).length}) in subspace $s — " +
            "codes table was encoded with different codebooks")
      val cw = cbs(s)(code)
      val off = s * dsub
      val len = math.min(dsub, math.max(0, qv.numElements() - off))
      total += IndexExpressions.roundTo(roundDp,
        IndexExpressions.sqDistFrom(qv, off, cw, len))
      s += 1
    }
    IndexExpressions.roundTo(roundDp, total)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val ref = ctx.addReferenceObj("adcDist", this, classOf[AdcDistExpr].getName)
      s"${ev.value} = $ref.compute($q, $c);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistExpr =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: bit j = sign of the (6-dp-rounded)
  * projection onto broadcast plane j — the whole nBits-bit bucket id in
  * one loop instead of nBits literal-plane dot expressions. */
case class LshSignature(
    child: Expression,
    bc: Broadcast[Array[Array[Double]]])
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_signature"
  private lazy val chkNull = ArrayFoldExpression.mayHaveNullElems(child)

  def compute(v: ArrayData): Int = {
    val planes = bc.value
    // Similarity.lshBucket enforces nBits ≤ 32 too, but the expression is
    // a public extension surface: Java masks `1 << j` to 5 bits, so plane
    // 32 would silently OR into bit 0 (corrupted buckets, no error), and
    // an empty plane table would emit signature 0 for every row — a
    // degenerate single-bucket join
    if (planes.isEmpty)
      throw new IllegalArgumentException(
        "lsh_signature: empty plane table — generate or load planes first")
    if (planes.length > 32)
      throw new IllegalArgumentException(
        s"lsh_signature: ${planes.length} planes exceed the 32-bit " +
          "signature width — use at most 32 planes per table")
    if (chkNull) IndexExpressions.requireNoNullElems(v, prettyName)
    var sig = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var proj = 0.0
      var i = 0
      while (i < n) { proj += v.getDouble(i) * p(i); i += 1 }
      if (IndexExpressions.roundTo(6, proj) > 0) sig |= (1 << j)
      j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("lshSig", this, classOf[LshSignature].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

/** Dense projection against a broadcast plane table: output component j
  * = round(Σ_i v_i · planes(j)(i), roundDp) — the Johnson–Lindenstrauss
  * dimensionality-reduction kernel (and, with learned planes, a PCA/OPQ
  * rotation apply step). One fused toDim×fromDim loop per row; the plan
  * stays O(1) in the matrix size (same contract as [[LshSignature]],
  * which is this expression's sign-only specialization). */
case class ProjectVec(
    child: Expression,
    bc: Broadcast[Array[Array[Double]]],
    roundDp: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "project_vec"
  private lazy val chkNull = ArrayFoldExpression.mayHaveNullElems(child)

  def compute(v: ArrayData): ArrayData = {
    val planes = bc.value
    if (chkNull) IndexExpressions.requireNoNullElems(v, prettyName)
    val out = new Array[Double](planes.length)
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
      out(j) = IndexExpressions.roundTo(roundDp, s)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("projVec", this, classOf[ProjectVec].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): ProjectVec =
    copy(child = newChild)
}

/** Column builders over already-created broadcast handles (one broadcast
  * per operator invocation — [[graft.ops.Similarity]] shares a handle
  * across the corpus and query sides of a join). */
object IndexExpr {
  def ivfCell(v: Column, bc: Broadcast[Array[Array[Double]]], roundDp: Int): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(v), bc, roundDp))

  def ivfCells(v: Column, bc: Broadcast[Array[Array[Double]]], nprobe: Int,
      roundDp: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(v), bc, nprobe, roundDp))

  def pqCodes(v: Column, bc: Broadcast[Array[Array[Array[Double]]]],
      roundDp: Int): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(v), bc, roundDp))

  def adcDistance(qv: Column, codes: Column,
      bc: Broadcast[Array[Array[Array[Double]]]], roundDp: Int): Column =
    ColumnBridge.column(AdcDistExpr(
      ColumnBridge.expression(qv), ColumnBridge.expression(codes), bc, roundDp))

  def lshSignature(v: Column, bc: Broadcast[Array[Array[Double]]]): Column =
    ColumnBridge.column(LshSignature(ColumnBridge.expression(v), bc))

  def projectVec(v: Column, bc: Broadcast[Array[Array[Double]]],
      roundDp: Int): Column =
    ColumnBridge.column(ProjectVec(ColumnBridge.expression(v), bc, roundDp))
}
