package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram language-model kernels for perplexity-based quality
  * filtering (the CC-Net / "train a LM on a clean slice, keep documents
  * the model finds unsurprising" recipe — Wenzek et al. 2019,
  * arXiv:1911.00359; dask-glm has no text surface, this is north-star
  * scope beyond the reference).
  *
  * Two expressions share one codepoint walk:
  *
  *  - [[CharNgrams]] — the training-side extractor: every n-codepoint
  *    window of a string as an array of strings. Used once per model fit
  *    (explode → count → bounded top-K), so the explode amplification is
  *    paid on the TRAIN slice only, with map-side partial aggregation
  *    bounding what shuffles to the distinct-trigram vocabulary.
  *  - [[CharLmScore]] — the scoring-side kernel: one fused pass per
  *    document summing fixed-point (nano-scaled) trigram log-probs from a
  *    broadcast model. No explode, no shuffle, no join at score time —
  *    scoring 100 TB is a single embarrassingly-parallel projection.
  *
  * Windows are CODEPOINT windows (`substr`/`LENGTH` semantics in both
  * Spark and DuckDB), not Java char windows — a supplementary-plane
  * character counts once, so the oracle's `substr(text, i, 3)` replay
  * sees byte-identical trigrams.
  *
  * Determinism contract with the DuckDB oracle: per-trigram log-probs are
  * rounded HALF-AWAY-FROM-ZERO to integer nanonats on the driver (matching
  * `CAST(ROUND(LN(...) * 1e9) AS BIGINT)`), and documents sum LONGS —
  * integer addition is associative-commutative, so partition order can
  * never move a hash-checked result, unlike summing raw doubles.
  */
private[graft] object CharLmKernels {

  /** Char-index boundaries of each codepoint in `s` (length cpCount+1,
    * last element = s.length). One linear walk. */
  def codepointBounds(s: String): Array[Int] = {
    val n = s.length
    val bounds = new Array[Int](s.codePointCount(0, n) + 1)
    var ci = 0
    var k = 0
    while (ci < n) {
      bounds(k) = ci
      k += 1
      ci += Character.charCount(s.codePointAt(ci))
    }
    bounds(k) = n
    bounds
  }
}

/** Every `n`-codepoint window of a string, in order, as `array<string>`.
  * `char_ngrams('abcd', 3)` = `['abc','bcd']`; strings shorter than `n`
  * codepoints yield an empty array. Bit-compatible with the oracle's
  * `substr(text, i, n) FOR i IN 1..LENGTH(text)-n+1` replay. */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1 && n <= 16,
    s"char_ngrams: order must be in [1, 16], got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeTris(input: UTF8String): ArrayData = {
    val s = input.toString
    val bounds = CharLmKernels.codepointBounds(s)
    val cpn = bounds.length - 1
    val out = new Array[AnyRef](math.max(cpn - n + 1, 0))
    var j = 0
    while (j + n <= cpn) {
      out(j) = UTF8String.fromString(s.substring(bounds(j), bounds(j + n)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeTris(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgrams", this, classOf[CharNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeTris($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
  override def prettyName: String = "char_ngrams"
}

/** Sum over a document's codepoint n-grams (window width = the model's
  * `order`) of the model's nano-scaled log-probability (unseen grams
  * take the model's smoothed floor), as ONE signed 64-bit long. Strings
  * shorter than `order` codepoints sum to 0; the caller derives
  * `n_tri = greatest(length(text) - order + 1, 0)` and the average NLL
  * from the pair, keeping this kernel a pure fold.
  *
  * The model rides an explicit torrent [[Broadcast]] handle — plan size
  * stays O(1) in vocabulary size (the index-state rule from
  * [[graft.functions.IndexExpressions]]; PlanSpec gates the same property
  * there). Overflow headroom: |logp| < 40 nats ⇒ ≤ 4e10 nanonats per
  * trigram ⇒ a document needs ~2.3e8 codepoints (~hundreds of MB of
  * text) to approach Long range — far beyond any row Spark can hold. */
case class CharLmScore(child: Expression, bc: Broadcast[CharLmModel])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeSum(input: UTF8String): Long = {
    val m = bc.value
    val n = m.order
    val s = input.toString
    val bounds = CharLmKernels.codepointBounds(s)
    val cpn = bounds.length - 1
    var sum = 0L
    var j = 0
    while (j + n <= cpn) {
      val v = m.nanoLogp.get(s.substring(bounds(j), bounds(j + n)))
      sum += (if (v == null) m.unseenNano else v.longValue())
      j += 1
    }
    sum
  }

  override def nullSafeEval(input: Any): Any =
    computeSum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charLmScore", this, classOf[CharLmScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeSum($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharLmScore =
    copy(child = newChild)
  override def prettyName: String = "charlm_score"
}

/** Fitted character-n-gram model (`order` = window width, inferred and
  * width-validated from the counts table at fit): gram → nanonat
  * log-prob plus the smoothed floor for unseen grams. Add-one smoothing
  * over the KEPT
  * vocabulary: p(t) = (c_t + 1) / (T + V + 1), p(unseen) = 1 / (T + V + 1)
  * where T = Σ kept counts, V = kept vocabulary size. Values are
  * `round(ln(p) * 1e9)` half-away-from-zero — the exact
  * `CAST(ROUND(LN(...) * 1e9) AS BIGINT)` the oracle computes.
  *
  * Size is bounded by the fit's `maxVocab` (driver collect and broadcast
  * are O(maxVocab), the same bounded-index-state discipline as
  * [[graft.ops.Similarity]] codebook loads). */
final class CharLmModel(
    val order: Int,
    val nanoLogp: java.util.HashMap[String, java.lang.Long],
    val unseenNano: Long) extends Serializable {
  def vocabSize: Int = nanoLogp.size
}

/** Per-model nanonat log-prob sums under SEVERAL broadcast char-LM
  * models in ONE codepoint walk — the kernel behind LM-based language
  * ID ([[graft.ops.CharLm.langId]]): K models (one per language) score
  * each document simultaneously, K map lookups per gram instead of K
  * full passes. All models must share one gram order (validated by the
  * caller); returns `array<long>` aligned with the broadcast array. */
case class CharLmScoreMulti(child: Expression, bc: Broadcast[Array[CharLmModel]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeSums(input: UTF8String): ArrayData = {
    val ms = bc.value
    val k = ms.length
    val n = ms(0).order
    val s = input.toString
    val bounds = CharLmKernels.codepointBounds(s)
    val cpn = bounds.length - 1
    val sums = new Array[Long](k)
    var j = 0
    while (j + n <= cpn) {
      val g = s.substring(bounds(j), bounds(j + n))
      var i = 0
      while (i < k) {
        val v = ms(i).nanoLogp.get(g)
        sums(i) += (if (v == null) ms(i).unseenNano else v.longValue())
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sums)
  }

  override def nullSafeEval(input: Any): Any =
    computeSums(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charLmScoreMulti", this,
      classOf[CharLmScoreMulti].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeSums($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharLmScoreMulti =
    copy(child = newChild)
  override def prettyName: String = "charlm_score_multi"
}

/** Fitted token-n-gram model — the word-level sibling of
  * [[CharLmModel]] (CC-Net's production filter is a word 5-gram LM).
  * Keys are RAW space-joined token grams (matching the
  * `split(" +")`-derived grams both engines compute identically);
  * `order` rides the model explicitly because a raw-gram key's width
  * cannot be inferred safely (tokens may be empty at string edges).
  * Same nanonat add-one smoothing contract as [[CharLmModel]]. */
final class TokenLmModel(
    val order: Int,
    val nanoLogp: java.util.HashMap[String, java.lang.Long],
    val unseenNano: Long) extends Serializable {
  def vocabSize: Int = nanoLogp.size
}

/** Every `n`-token window of a string (tokens = `split(" +")`,
  * space-joined), in order, as `array<string>` — the word-level sibling
  * of [[CharNgrams]] and the training-side extractor behind
  * [[graft.ops.TokenLm.tokenNgrams]]. Strings with fewer than `n`
  * tokens yield an empty array.
  *
  * Exists for the same reason the jaccardVerify scaladoc documents: the
  * composed `transform(sequence(...), i => array_join(slice(split(...),
  * ...), " "))` form is INTERPRETED (no codegen for higher-order
  * functions) and interpretation does no common-subexpression
  * elimination, so the `split` re-runs for every window — O(tokens²)
  * regex work per document (~7× measured on the q129 bigram scan). One
  * fused pass here: one split, one StringBuilder walk, real codegen. */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1 && n <= 16, s"token_ngrams: order must be in [1, 16], got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeGrams(input: UTF8String): ArrayData = {
    val toks = TextHashKernels.splitter.split(input.toString, -1)
    val count = math.max(toks.length - n + 1, 0)
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeGrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenNgrams", this, classOf[TokenNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeGrams($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
  override def prettyName: String = "token_ngrams"
}

/** Sum over a document's token n-grams (windows of `order` tokens from
  * the `split(" +")` stream, space-joined) of the broadcast model's
  * nanonat log-prob — the word-level sibling of [[CharLmScore]]: one
  * fused pass, no explode, no join, no shuffle at score time. Documents
  * with fewer than `order` tokens sum to 0. */
case class TokenLmScore(child: Expression, bc: Broadcast[TokenLmModel])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeSum(input: UTF8String): Long = {
    val m = bc.value
    val n = m.order
    val toks = TextHashKernels.splitter.split(input.toString, -1)
    var sum = 0L
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i + n <= toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val v = m.nanoLogp.get(sb.toString)
      sum += (if (v == null) m.unseenNano else v.longValue())
      i += 1
    }
    sum
  }

  override def nullSafeEval(input: Any): Any =
    computeSum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenLmScore", this, classOf[TokenLmScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeSum($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenLmScore =
    copy(child = newChild)
  override def prettyName: String = "tokenlm_score"
}

object CharLmFunctions {

  /** Codepoint `n`-gram windows of a text Column. */
  def charNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(text), n))

  /** `char_trigrams(text)` as a Column (the default order-3 windows). */
  def charTrigrams(text: Column): Column = charNgrams(text, 3)

  /** `char_trigrams(text)` SQL builder — shared by the temp-function
    * path and [[graft.GraftExtensions]] (the scoring kernel is NOT
    * SQL-registrable: it closes over a broadcast model handle). */
  private[graft] val charTrigramsBuilder: Seq[Expression] => Expression = {
    case Seq(text) => CharNgrams(text, 3)
    case exprs => throw new IllegalArgumentException(
      s"char_trigrams(text) takes exactly 1 argument, got ${exprs.length}")
  }

  /** `char_ngrams(text, n)` SQL builder; `n` must be a foldable integer
    * literal (it sizes the window at plan time). */
  private[graft] val charNgramsBuilder: Seq[Expression] => Expression = {
    case Seq(text, nExpr) =>
      require(nExpr.foldable, "char_ngrams: n must be a literal")
      nExpr.eval() match {
        case null => throw new IllegalArgumentException(
          "char_ngrams: n must be a non-NULL integer literal")
        case num: Number => CharNgrams(text, num.intValue())
        case other => throw new IllegalArgumentException(
          s"char_ngrams: n must be an integer literal, got '$other'")
      }
    case exprs => throw new IllegalArgumentException(
      s"char_ngrams(text, n) takes exactly 2 arguments, got ${exprs.length}")
  }

  private[graft] val tokenNgramsBuilder: Seq[Expression] => Expression = {
    case Seq(text, nExpr) =>
      require(nExpr.foldable, "token_ngrams: n must be a literal")
      nExpr.eval() match {
        case null => throw new IllegalArgumentException(
          "token_ngrams: n must be a non-NULL integer literal")
        case num: Number => TokenNgrams(text, num.intValue())
        case other => throw new IllegalArgumentException(
          s"token_ngrams: n must be an integer literal, got '$other'")
      }
    case exprs => throw new IllegalArgumentException(
      s"token_ngrams(text, n) takes exactly 2 arguments, got ${exprs.length}")
  }

  /** Register SQL-visible functions on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_trigrams", charTrigramsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams", charNgramsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_ngrams", tokenNgramsBuilder, "built-in")
  }

  /** Nano-scaled trigram log-prob sum of `text` under a broadcast model. */
  def charLmScore(text: Column, bc: Broadcast[CharLmModel]): Column =
    ColumnBridge.column(CharLmScore(ColumnBridge.expression(text), bc))

  /** Nano-scaled token-gram log-prob sum under a broadcast token model. */
  def tokenLmScore(text: Column, bc: Broadcast[TokenLmModel]): Column =
    ColumnBridge.column(TokenLmScore(ColumnBridge.expression(text), bc))

  /** Per-model nanonat sums under K broadcast models, one text walk. */
  def charLmScoreMulti(text: Column, bc: Broadcast[Array[CharLmModel]]): Column =
    ColumnBridge.column(CharLmScoreMulti(ColumnBridge.expression(text), bc))
}
