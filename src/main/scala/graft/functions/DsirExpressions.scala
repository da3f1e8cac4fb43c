package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-n-gram feature kernels for DSIR-style importance resampling
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169): documents are bags of word unigrams +
  * bigrams hashed into a fixed bucket space; two bucket-multinomial
  * models (target vs raw) yield a per-document log importance ratio that
  * upweights raw documents resembling the target domain. dask-glm has no
  * text surface — north-star pipeline scope (SURVEY §2 addendum).
  *
  * Two expressions share one tokenize + hash walk:
  *
  *  - [[HashedNgramBuckets]] — the training-side extractor: the bucket id
  *    of every unigram and bigram feature, as `array<int>`. Used per model
  *    fit (explode → count → O(numBuckets)-bounded aggregation), so the
  *    explode amplification is paid on the two counting scans only, with
  *    map-side partial aggregation bounding the shuffle at `numBuckets`
  *    rows — corpus size never reaches the wire.
  *  - [[DsirScore]] — the scoring-side kernel: one fused pass per document
  *    summing fixed-point (nano-scaled) per-bucket log ratios from a
  *    broadcast table. No explode, no shuffle, no join at score time —
  *    scoring 100 TB is a single embarrassingly-parallel projection (the
  *    [[CharLmScore]] contract).
  *
  * Feature definition (replayed verbatim by the DuckDB oracle, which is
  * why every step is an established cross-engine-exact primitive):
  * tokens = the input string split on runs of spaces
  * ([[TextHashKernels.splitter]] = `REGEXP_SPLIT_TO_ARRAY(s, ' +')`,
  * trailing empties kept — the q117 precedent); case folding is the
  * CALLER's job (compose with `lower()` so both engines use their own
  * locale-independent SQL lowercase, not the JVM default locale); feature
  * strings are `"u:" + tok` and `"b:" + tok1 + " " + tok2`; bucket =
  * first 4 md5 bytes as unsigned 32-bit mod `numBuckets`
  * (`('0x' || SUBSTRING(MD5(f), 1, 8))::BIGINT % B` — the
  * [[graft.ops.Sampling.hashU32]] idiom).
  */
private[graft] object DsirKernels {

  /** Bucket ids of all unigram + bigram features of `text`, in walk order
    * (all n unigrams, then all n-1 bigrams). `split(" +", -1)` never
    * returns an empty array (worst case `[""]`), so the output has
    * `2·n - 1 >= 1` entries for non-null input. One md5 per feature. */
  def featureBuckets(text: String, numBuckets: Int): Array[Int] = {
    val toks = TextHashKernels.splitter.split(text, -1)
    val n = toks.length
    val out = new Array[Int](2 * n - 1)
    val md = TextHashKernels.digest.get()
    var i = 0
    while (i < n) {
      out(i) = bucketOf(md, "u:" + toks(i), numBuckets)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      out(n + i) = bucketOf(md, "b:" + toks(i) + " " + toks(i + 1), numBuckets)
      i += 1
    }
    out
  }

  private def bucketOf(md: java.security.MessageDigest, feature: String,
      numBuckets: Int): Int = {
    md.reset()
    val d = md.digest(feature.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (TextHashKernels.unsignedInt(d, 0) % numBuckets).toInt
  }

  def requireBuckets(numBuckets: Int): Unit =
    require(numBuckets >= 2 && numBuckets <= (1 << 24),
      s"numBuckets must be in [2, 2^24], got $numBuckets")
}

/** Bucket ids of every hashed unigram + bigram feature of a string, as
  * `array<int>` — the training-side extractor of the DSIR pair (see
  * [[DsirKernels]] for the exact feature definition). */
case class HashedNgramBuckets(child: Expression, numBuckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  DsirKernels.requireBuckets(numBuckets)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeBuckets(input: UTF8String): ArrayData = {
    val bs = DsirKernels.featureBuckets(input.toString, numBuckets)
    val out = new Array[Any](bs.length)
    var i = 0
    while (i < bs.length) { out(i) = bs(i); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeBuckets(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedNgramBuckets", this,
      classOf[HashedNgramBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeBuckets($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramBuckets =
    copy(child = newChild)
  override def prettyName: String = "hashed_ngram_buckets"
}

/** Per-document log importance ratio in integer NANONATS: the sum over
  * the document's hashed n-gram features of the broadcast per-bucket
  * ratio table (`round(ln p̂_target(b)·1e9) - round(ln p̂_raw(b)·1e9)`,
  * each term rounded half-away-from-zero on the driver — the
  * [[CharLmScore]] fixed-point contract, so documents sum `long`s and
  * partition order can never move a hash-checked result).
  *
  * The table rides an explicit torrent [[Broadcast]] handle — plan size
  * stays O(1) in `numBuckets` (the index-state rule from
  * [[IndexExpressions]]). Overflow headroom: |ratio| < 80 nats ⇒ ≤ 8e10
  * nanonats per feature ⇒ a document needs ~10^8 tokens to approach Long
  * range — far beyond any row Spark can hold. */
case class DsirScore(child: Expression, bc: Broadcast[Array[Long]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeSum(input: UTF8String): Long = {
    val table = bc.value
    val bs = DsirKernels.featureBuckets(input.toString, table.length)
    var sum = 0L
    var i = 0
    while (i < bs.length) { sum += table(bs(i)); i += 1 }
    sum
  }

  override def nullSafeEval(input: Any): Any =
    computeSum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeSum($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
  override def prettyName: String = "dsir_score"
}

/** Hashed n-gram bucket COUNT VECTOR of a string, as a dense
  * `array<double>` of length `numBuckets` — the fastText-style bag
  * featurization (the same walk as [[HashedNgramBuckets]], accumulated
  * instead of listed), shaped for [[graft.estimators]]' GLM feature
  * column. Dense because the GLM kernels take `array<double>` rows and
  * a classifier bucket space is small (256–4096); the DSIR counting
  * path (bucket explode → aggregate) remains the sparse/statistics
  * form. */
case class HashedNgramCounts(child: Expression, numBuckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  DsirKernels.requireBuckets(numBuckets)
  require(numBuckets <= 65536,
    s"hashed_ngram_counts: dense output capped at 2^16 buckets, got $numBuckets")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeCounts(input: UTF8String): ArrayData = {
    val bs = DsirKernels.featureBuckets(input.toString, numBuckets)
    val out = new Array[Double](numBuckets)
    var i = 0
    while (i < bs.length) { out(bs(i)) += 1.0; i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedNgramCounts", this,
      classOf[HashedNgramCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeCounts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramCounts =
    copy(child = newChild)
  override def prettyName: String = "hashed_ngram_counts"
}

object DsirFunctions {

  /** `hashed_ngram_buckets(text, numBuckets)` SQL builder — the DSIR
    * training-side feature extractor, SQL-visible for ad-hoc bucket
    * counting; same literal-argument discipline as `minhash_sig`. */
  private[graft] val hashedNgramBucketsBuilder: Seq[Expression] => Expression = {
    case Seq(text, bExpr) =>
      require(bExpr.foldable, "hashed_ngram_buckets: numBuckets must be a literal")
      bExpr.eval() match {
        case null => throw new IllegalArgumentException(
          "hashed_ngram_buckets: numBuckets must be a non-NULL integer literal")
        case num: Number => HashedNgramBuckets(text, num.intValue())
        case other => throw new IllegalArgumentException(
          s"hashed_ngram_buckets: numBuckets must be an integer literal, got '$other'")
      }
    case exprs => throw new IllegalArgumentException(
      s"hashed_ngram_buckets(text, numBuckets) takes exactly 2 arguments, got ${exprs.length}")
  }

  /** Register SQL-visible functions on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hashed_ngram_buckets", hashedNgramBucketsBuilder, "built-in")
}
