package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{CharLmFunctions, TokenLmModel}

/** Word-n-gram LM perplexity scoring — the token-level sibling of
  * [[CharLm]] and the shape CC-Net actually ships (Wenzek et al. 2019:
  * a word 5-gram LM trained on the trusted slice). Same three-stage
  * split (lazy bounded trainCounts → O(vocab) driver fit → shuffle-free
  * broadcast scoring via the fused
  * [[graft.functions.TokenLmScore]] kernel), same integer-nanonat
  * determinism contract, same `avg_nll` output columns — a pipeline can
  * swap char- and token-level models without touching anything
  * downstream. Grams are windows of the `split(" +")` token stream
  * joined with single spaces, the exact token semantics every other
  * text operator here (and the DuckDB oracle) uses.
  *
  * Unlike [[CharLm]], the gram order cannot be inferred from key width
  * (tokens vary in length and may be empty at string edges), so the
  * counts table carries an explicit `n` column, whole-table-validated
  * at [[fit]] — the same self-describing-artifact rule as
  * [[Boilerplate.writeCommonGrams]] and the signature tables. */
object TokenLm {

  /** Default vocabulary cap, matching [[CharLm.DefaultMaxVocab]]. */
  val DefaultMaxVocab: Int = 65536

  /** Windows of `n` consecutive tokens, space-joined, in order; docs
    * with fewer than `n` tokens — and NULL docs, matching the historical
    * composed form where `when(size(null) >= n)` fell to the empty
    * branch — yield an empty array. One fused codegen pass
    * ([[graft.functions.TokenNgrams]]); the previous
    * transform/slice/array_join composition re-ran the `split` regex
    * per window (interpreted HOFs do no CSE — the jaccardVerify
    * lesson), ~7× slower on the q129 bigram scan. */
  def tokenNgrams(textCol: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    coalesce(
      ColumnBridge.column(graft.functions.TokenNgrams(
        ColumnBridge.expression(textCol), n)),
      array().cast("array<string>"))
  }

  /** Token-gram counts of the training slice, capped to the `maxVocab`
    * most frequent (ties by gram ascending), carrying the gram order as
    * a column. Lazy; one scan; distributed top-K. */
  def trainCounts(
      train: DataFrame, textCol: String = "text",
      maxVocab: Int = DefaultMaxVocab, order: Int = 2): DataFrame = {
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    train
      .select(explode(tokenNgrams(col(textCol), order)).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tri").asc)
      .limit(maxVocab)
      .withColumn("n", lit(order))
  }

  /** Materialize a counts plan (or a persisted counts table) into a
    * scoring model; the order is read from the table's `n` column and
    * must be uniform. */
  def fit(counts: DataFrame): TokenLmModel = {
    val rows = counts
      .select(col("tri").cast("string"), col("c").cast("long"), col("n").cast("int"))
      .collect()
    require(rows.nonEmpty,
      "TokenLm.fit: no gram counts — the training slice is empty or all " +
        "its documents have fewer tokens than the gram order")
    rows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && r.getLong(1) >= 1 && !r.isNullAt(2),
        "TokenLm.fit: counts table has a NULL gram/count/order or a " +
          "count < 1 — not a trainCounts (or persisted trainCounts) output")
    }
    val orders = rows.map(_.getInt(2)).distinct
    require(orders.length == 1,
      s"TokenLm.fit: counts table mixes gram orders " +
        s"[${orders.sorted.mkString(", ")}] — corrupt or concatenated tables")
    var t = 0L
    rows.foreach(r => t += r.getLong(1))
    val denom = (t + rows.length + 1).toDouble
    val m = new java.util.HashMap[String, java.lang.Long](rows.length * 2)
    rows.foreach { r =>
      m.put(r.getString(0), java.lang.Long.valueOf(nanoLn((r.getLong(1) + 1.0) / denom)))
    }
    new TokenLmModel(orders.head, m, nanoLn(1.0 / denom))
  }

  private def nanoLn(x: Double): Long = {
    val y = math.log(x) * 1e9
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
  }

  /** Score every document with the [[CharLm.score]] output contract:
    * `n_tri` (token-gram count), `nll_nano`, `avg_nll` (NULL when the
    * doc has fewer tokens than the order). One projection, no shuffle. */
  def score(
      docs: DataFrame, model: TokenLmModel, textCol: String = "text"): DataFrame =
    score(docs, bcOf(model), textCol)

  /** [[score]] against an already-broadcast model. */
  def score(
      docs: DataFrame, bc: Broadcast[TokenLmModel], textCol: String): DataFrame = {
    val clash = docs.columns.filter(Set("n_tri", "nll_nano", "avg_nll"))
    require(clash.isEmpty,
      s"TokenLm.score: input already has column(s) ${clash.mkString(", ")} — " +
        "these are the score output columns; rename them first")
    val nTri = greatest(
      size(split(col(textCol), " +")) - (bc.value.order - 1), lit(0)).cast("int")
    docs
      .withColumn("n_tri", nTri)
      .withColumn("nll_nano", -CharLmFunctions.tokenLmScore(col(textCol), bc))
      .withColumn("avg_nll", CharLm.avgNll(col("nll_nano"), col("n_tri")))
  }

  /** STREAMING token-LM quality filter — the word-level twin of
    * [[CharLm.qualityCleanStream]] (same contract: stateless
    * projection+filter, verdicts bit-equal to batch [[score]]+cut,
    * docs with fewer tokens than the order are dropped as
    * evidence-free, every admitted doc keeps all its columns). */
  def qualityCleanStream(
      newStream: DataFrame, bc: Broadcast[TokenLmModel], maxAvgNll: Double,
      textCol: String = "text"): DataFrame = {
    val reserved = Seq("__n_tri", "__avg_nll")
    val clash = newStream.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"qualityCleanStream: input already has column(s) ${clash.mkString(", ")} — " +
        "these names are reserved scratch columns here; rename them first")
    newStream
      .withColumn("__n_tri", greatest(
        size(split(col(textCol), " +")) - (bc.value.order - 1), lit(0)).cast("int"))
      .withColumn("__avg_nll",
        CharLm.avgNll(-CharLmFunctions.tokenLmScore(col(textCol), bc), col("__n_tri")))
      .filter(col("__n_tri") > 0 && col("__avg_nll") <= maxAvgNll)
      .drop(reserved: _*)
  }

  private def bcOf[T](v: T)(implicit ct: scala.reflect.ClassTag[T])
      : Broadcast[T] =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(v)
}
