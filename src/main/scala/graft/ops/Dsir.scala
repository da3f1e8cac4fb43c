package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{DsirKernels, DsirScore, HashedNgramBuckets}

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents that LOOK like a trusted
  * target domain, by the likelihood ratio of two hashed-n-gram bag
  * models. The pretraining-mixture sibling of [[CharLm]]'s quality
  * filter — CC-Net asks "is this fluent text?", DSIR asks "is this text
  * from the distribution I want to train on?". dask-glm has no text
  * surface; north-star pipeline scope (SURVEY §2 addendum).
  *
  * Stages, split exactly where a 100 TB run wants the boundaries:
  *
  *  1. [[featureCounts]] — LAZY plan, one scan per corpus: hashed
  *     unigram+bigram bucket ids ([[graft.functions.HashedNgramBuckets]],
  *     one fused codegen pass per document), exploded and counted.
  *     Map-side partial aggregation bounds the shuffle at `numBuckets`
  *     rows — the bucket space, not the corpus, is what moves.
  *  2. [[fit]] — the bounded model build: collect ≤ `numBuckets` rows per
  *     side (the [[CharLm.fit]] O(model) discipline), add-one smoothing
  *     over the bucket space on each side, per-bucket log ratio fixed to
  *     integer nanonats (each `ln` term rounded half-away-from-zero
  *     separately, so the DuckDB oracle's two `CAST(ROUND(LN(..)*1e9) AS
  *     BIGINT)` terms reproduce the table bit-for-bit).
  *  3. [[score]] — LAZY: one embarrassingly-parallel projection; the
  *     ratio table rides ONE torrent broadcast into the fused
  *     [[graft.functions.DsirScore]] kernel. No explode, no join, no
  *     shuffle at score time.
  *  4. [[selectTopK]] / [[gumbelTopK]] — selection: deterministic top-k
  *     by ratio (the paper's "top-k heuristic" baseline), or Gumbel
  *     top-k sampling without replacement (the paper's actual sampler)
  *     made rerun-stable by driving the Gumbel noise from the
  *     [[Sampling.hashU32]] keyed coin instead of an RNG. Both are
  *     `TakeOrderedAndProject` — per-partition top-k heads merged on the
  *     driver, never a single-partition global sort.
  *
  * Determinism: bucket ids are md5-derived (engine-independent), counts
  * are exact longs, the ratio table is integer nanonats, and scores are
  * long sums — every deterministic output here is hash-checked against a
  * DuckDB replay (q125/q126). Only [[gumbelTopK]]'s key needs per-row
  * floating transcendentals, so it is spec-pinned rather than
  * oracle-hashed (the selection, not the key, is its contract).
  */
object Dsir {

  /** Default bucket-space size — the paper's 10^4-bucket regime rounded
    * to a power of two; collisions are part of the method (hashing is
    * the dimensionality reduction), more buckets = finer ratios. */
  val DefaultNumBuckets: Int = 8192

  /** Fitted per-bucket log importance ratio table in integer nanonats;
    * index = bucket id, length = the bucket space. */
  final case class Model(ratioNano: Array[Long]) {
    require(ratioNano.nonEmpty, "Dsir.Model: empty ratio table")
    def numBuckets: Int = ratioNano.length
  }

  /** Per-bucket feature counts of a corpus slice: `(bucket int, c long)`,
    * at most `numBuckets` rows. Lazy; one scan, shuffle bounded at the
    * bucket space by map-side partial aggregation. Case folding applies
    * SQL `lower()` (locale-independent in both engines) before the
    * hashing kernel — the feature definition in [[graft.functions
    * .DsirKernels]]. */
  def featureCounts(df: DataFrame, textCol: String = "text",
      numBuckets: Int = DefaultNumBuckets): DataFrame = {
    DsirKernels.requireBuckets(numBuckets)
    val buckets = ColumnBridge.column(HashedNgramBuckets(
      ColumnBridge.expression(lower(col(textCol))), numBuckets))
    df.select(explode(buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
  }

  /** Materialize the two counts plans (from [[featureCounts]], or
    * persisted counts tables re-read from parquet) into a scoring model:
    * ratio(b) = round(ln((ct_b+1)/(Tt+B))·1e9) - round(ln((cr_b+1)/(Tr+B))·1e9)
    * with B = `numBuckets`, T = the side's total feature count. Both
    * collects are bounded by B. An EMPTY side is permitted (every bucket
    * smooths to 1/(0+B)) — a filter that matched nothing yields a
    * constant-per-feature ratio rather than a crash, and the score
    * ordering degrades to document length; callers that consider that a
    * config error should check their slice row count. */
  def fit(targetCounts: DataFrame, rawCounts: DataFrame,
      numBuckets: Int = DefaultNumBuckets): Model = {
    DsirKernels.requireBuckets(numBuckets)
    val ct = collectCounts(targetCounts, numBuckets, "targetCounts")
    val cr = collectCounts(rawCounts, numBuckets, "rawCounts")
    fitLocal(ct, cr, numBuckets)
  }

  /** The driver-side ratio build shared by [[fit]] and [[fitOnCorpus]]. */
  private def fitLocal(ct: Array[Long], cr: Array[Long],
      numBuckets: Int): Model = {
    var tt = 0L; var tr = 0L
    ct.foreach(tt += _); cr.foreach(tr += _)
    val dt = (tt + numBuckets).toDouble
    val dr = (tr + numBuckets).toDouble
    Model(Array.tabulate(numBuckets)(b =>
      nanoLn((ct(b) + 1.0) / dt) - nanoLn((cr(b) + 1.0) / dr)))
  }

  /** [[fit]] when the target is a PREDICATE over the raw corpus — the
    * common case (score a crawl against its own trusted slice). ONE
    * counting scan serves both sides: buckets are counted with and
    * without the target flag in the same bounded aggregation, so the
    * corpus is read once instead of twice. Identical model to
    * `fit(featureCounts(df.filter(target)), featureCounts(df))` —
    * DsirSpec pins the equivalence. */
  def fitOnCorpus(df: DataFrame, targetCond: Column, textCol: String = "text",
      numBuckets: Int = DefaultNumBuckets): Model = {
    DsirKernels.requireBuckets(numBuckets)
    val buckets = ColumnBridge.column(HashedNgramBuckets(
      ColumnBridge.expression(lower(col(textCol))), numBuckets))
    val counts = df
      .select(explode(buckets).as("bucket"),
        when(targetCond, lit(1L)).otherwise(lit(0L)).as("__tgt"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("c_raw"), sum(col("__tgt")).as("c_tgt"))
      .collect()
    val cr = new Array[Long](numBuckets)
    val ct = new Array[Long](numBuckets)
    counts.foreach { r =>
      val b = r.getInt(0)
      require(b >= 0 && b < numBuckets,
        s"Dsir.fitOnCorpus: bucket $b outside [0, $numBuckets)")
      cr(b) = r.getLong(1); ct(b) = r.getLong(2)
    }
    fitLocal(ct, cr, numBuckets)
  }

  private def collectCounts(counts: DataFrame, numBuckets: Int,
      what: String): Array[Long] = {
    val out = new Array[Long](numBuckets)
    counts.select(col("bucket").cast("int"), col("c").cast("long")).collect()
      .foreach { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1), s"Dsir.fit: $what has a " +
          "NULL bucket/count — not a featureCounts (or persisted " +
          "featureCounts) output")
        val b = r.getInt(0); val c = r.getLong(1)
        require(b >= 0 && b < numBuckets,
          s"Dsir.fit: $what bucket $b outside [0, $numBuckets) — counts " +
            "were built with a different numBuckets")
        require(c >= 1, s"Dsir.fit: $what count $c < 1")
        require(out(b) == 0L, s"Dsir.fit: $what has duplicate bucket $b")
        out(b) = c
      }
    out
  }

  /** `round(ln(x)·1e9)` half-away-from-zero — the oracle's
    * `CAST(ROUND(LN(x) * 1e9) AS BIGINT)` (the [[CharLm]] contract). */
  private def nanoLn(x: Double): Long = {
    val y = math.log(x) * 1e9
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
  }

  /** Score every document: `n_feats` (unigram + bigram feature count,
    * `2·tokens - 1`) and `lr_nano` (log importance ratio in integer
    * nanonats — exact, orderable, thresholdable without any float).
    * Higher = more target-like. One projection, no shuffle. */
  def score(docs: DataFrame, model: Model, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    score(docs, bcOf(model.ratioNano), idCol, textCol)

  /** [[score]] against an already-broadcast ratio table — the reuse
    * overload for scoring many batches without re-shipping the model. */
  def score(docs: DataFrame, bc: Broadcast[Array[Long]], idCol: String,
      textCol: String): DataFrame = {
    require(!docs.columns.contains("n_feats") && !docs.columns.contains("lr_nano"),
      "Dsir.score: input already has an n_feats/lr_nano column")
    val lowered = lower(col(textCol))
    docs
      .withColumn("n_feats",
        (size(split(lowered, " +")) * 2 - 1).cast("int"))
      .withColumn("lr_nano",
        ColumnBridge.column(DsirScore(ColumnBridge.expression(lowered), bc)))
  }

  /** The k most target-like documents (the paper's top-k heuristic):
    * total order (lr_nano DESC, id ASC), distributed
    * `TakeOrderedAndProject` — never a global single-partition sort. */
  def selectTopK(scored: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    scored.orderBy(col("lr_nano").desc, col(idCol).asc).limit(k)
  }

  /** Gumbel top-k sampling without replacement, ∝ exp(lr/temperature) —
    * the paper's sampler (importance resampling): key_i = lr_i/τ + g_i
    * with g_i standard Gumbel, take the k largest keys. The Gumbel noise
    * is derived from the [[Sampling.hashU32]] keyed coin
    * (u = (h + 0.5)/2^32, g = -ln(-ln u)) — a pure function of (seed,
    * id), so reruns and backfills draw the SAME sample, and different
    * seeds give independent samples. Spec-pinned (the key is
    * transcendental; membership, determinism, and the τ→0 limit →
    * [[selectTopK]] are the contract). */
  def gumbelTopK(scored: DataFrame, k: Int, idCol: String = "doc_id",
      temperature: Double = 1.0, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    require(!scored.columns.contains("__gumbel"),
      "gumbelTopK: input already has a __gumbel column — that name is a " +
        "reserved scratch column here; rename it first")
    val u = (Sampling.hashU32(col(idCol), seed).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val key = col("lr_nano").cast("double") / lit(1e9) / lit(temperature) -
      log(-log(u))
    scored.withColumn("__gumbel", key)
      .orderBy(col("__gumbel").desc, col(idCol).asc).limit(k)
      .drop("__gumbel")
  }

  /** STREAMING domain-relevance filter — the DSIR cell of the streaming
    * filter family ([[Dedup.exactCleanStream]] /
    * [[Dedup.minhashCleanStream]] / [[Dedup.simhashCleanStream]] /
    * [[Dedup.cosineCleanStream]] / [[CharLm.qualityCleanStream]]): pass
    * through only the docs of a micro-batch stream whose log importance
    * ratio clears `minLrNano`. The verdict compares the same integer
    * nanonat sum [[score]] publishes — no float, no rounding — so the
    * stream's admissions are bit-equal to a batch score+filter (q130
    * oracle-checks exactly that twin). Stateless projection + filter:
    * no join, no watermark, no state store; every admitted doc keeps
    * all its columns. */
  def qualityCleanStream(newStream: DataFrame, bc: Broadcast[Array[Long]],
      minLrNano: Long, textCol: String = "text"): DataFrame = {
    val reserved = "__lr_nano"
    require(!newStream.columns.contains(reserved),
      s"qualityCleanStream: input already has a $reserved column — " +
        "that name is a reserved scratch column here; rename it first")
    newStream
      .withColumn(reserved, ColumnBridge.column(DsirScore(
        ColumnBridge.expression(lower(col(textCol))), bc)))
      .filter(col(reserved) >= minLrNano)
      .drop(reserved)
  }

  private def bcOf[T](v: T)(implicit ct: scala.reflect.ClassTag[T])
      : Broadcast[T] =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(v)
}
