package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-balancing sampling operators. A training-data pipeline rarely
  * wants uniform random rows — it wants "at most k documents per source/
  * language/domain", deterministically, so reruns and backfills pick the
  * SAME rows.
  */
object Sampling {

  /** Uniform u32 in [0, 2^32) derived from md5 of `"<seed>:<key>"` — the
    * deterministic coin every sampling operator here flips. md5 (not
    * xxhash64) so an external system — or the DuckDB oracle — reproduces
    * the exact sample: `('0x' || SUBSTRING(MD5(s), 1, 8))::BIGINT`. One
    * codegen'd projection per row; no shuffle, no RNG state. */
  def hashU32(key: Column, seed: Long): Column =
    conv(substring(md5(concat(lit(s"$seed:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  private def thresholdOf(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0, 1], got $rate")
    math.round(rate * 4294967296.0) // rate 1.0 → 2^32 keeps every row
  }

  /** Deterministic Bernoulli(rate) sample keyed on `keyCol`: a row is
    * kept iff hash(seed, key) < rate·2^32. Unlike `df.sample()` (whose
    * selection depends on Spark's partition-seeded RNG and row order),
    * the decision is a pure function of the KEY — reruns, backfills, and
    * other engines pick the same rows, and a doc keeps one fate even if
    * it appears in several shards. Different seeds give independent
    * samples (e.g. train/holdout splits that never collide). */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double,
      seed: Long = 42L): DataFrame =
    df.filter(hashU32(keyCol, seed) < lit(thresholdOf(rate)))

  /** Deterministic n-way split — the twin of `DataFrame.randomSplit`
    * (the reference's `random_split`, docs/examples/basic_api.ipynb)
    * with the partition-RNG replaced by the keyed hash coin: row → split
    * i iff cum(i) ≤ hash(seed, key)/2^32 < cum(i+1), with weights
    * normalized like `randomSplit`. Unlike `randomSplit` the assignment
    * is a pure function of the KEY — splits are disjoint and exhaustive
    * BY CONSTRUCTION (randomSplit re-samples per split and only the
    * cached path guarantees disjointness), reruns/backfills land every
    * row in the same split, and an external engine (or the DuckDB
    * oracle) reproduces the exact membership. One codegen'd filter per
    * split; no shuffle, no materialization. */
  def hashSplit(df: DataFrame, weights: Array[Double], keyCol: Column,
      seed: Long = 42L): Array[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0.0),
      s"weights must be positive, got ${weights.mkString(",")}")
    val total = weights.sum
    val bounds = weights.scanLeft(0.0)(_ + _)
      .map(c => math.round(c / total * 4294967296.0))
    bounds(bounds.length - 1) = 4294967296L // exhaustive despite rounding
    val u = hashU32(keyCol, seed)
    Array.tabulate(weights.length)(i =>
      df.filter(u >= lit(bounds(i)) && u < lit(bounds(i + 1))))
  }

  /** Per-stratum deterministic sampling — the "source mixing" step of a
    * training pipeline (upweight curated sources, downsample crawl):
    * stratum s keeps its rows at `rates(s)` (or `defaultRate` when
    * unlisted), decided by the same keyed hash coin as [[hashSample]].
    * One codegen'd CASE per row; no shuffle, no per-stratum passes. */
  def stratifiedHashSample(df: DataFrame, strataCol: Column, keyCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      seed: Long = 42L): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(thresholdOf(defaultRate))) { case (acc, (s, r)) =>
        when(strataCol === lit(s), lit(thresholdOf(r))).otherwise(acc)
      }
    df.filter(hashU32(keyCol, seed) < thr)
  }

  /** Concat-and-chop sequence packing: lay the corpus out as `shards`
    * independent token streams and record, for each document, the
    * half-open token span it occupies in its shard's stream — from which
    * the training-context assignment falls out as pack ids
    * floor(start/ctxLen) .. floor((end−1)/ctxLen) (a doc straddling a
    * boundary is split across those contexts, the standard chop). The
    * layout is a pure function of (seed, id): shard by hash, order within
    * a shard by (hash, id) — so reruns produce byte-identical shards.
    *
    * 100 TB shape: ONE hash shuffle into `shards` groups, and the only
    * per-group serial state is a running-sum window — Spark externalizes
    * the sort, and `shards` (thousands in production) bounds each
    * group to corpus/shards tokens. A single global stream (shards = 1)
    * would serialize the whole corpus through one partition — that is the
    * caller's explicit, small-corpus-only choice.
    *
    * Returns the input columns plus (shard, start_off, end_off,
    * first_pack, last_pack). */
  def packSequences(df: DataFrame, idCol: String, tokenCol: Column,
      ctxLen: Int, shards: Int, seed: Long = 42L): DataFrame = {
    require(ctxLen >= 1, s"ctxLen must be >= 1, got $ctxLen")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val h = hashU32(col(idCol), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(shards)).cast("int"))
      .withColumn("end_off", sum(tokenCol).over(w))
      .withColumn("start_off", col("end_off") - tokenCol)
      .withColumn("first_pack", floor(col("start_off") / ctxLen))
      .withColumn("last_pack",
        floor((col("end_off") - 1) / ctxLen))
      .drop("__h")
  }

  /** Per-stratum TOKEN-budget sampling — the "give source s exactly B
    * training tokens" step of a data-mixing recipe (doc-count caps
    * over-weight short documents; budgets are set in tokens). A row is
    * kept iff the total `tokenCol` of rows ordered BEFORE it — by
    * (hash(seed, key), key) within its stratum — is `< budget`, i.e. the
    * stratum takes documents in deterministic pseudo-random order until
    * the budget is spent (one straddling doc may overshoot; a zero
    * budget keeps nothing). A pure function of (seed, key) — reruns,
    * backfills, and other engines keep the same rows — PROVIDED `keyCol`
    * uniquely identifies rows: duplicate keys tie on the (hash, key)
    * order and take arrival-order-dependent running sums at a budget
    * edge (the same reason `hashSample` keys on a doc identity). Rows
    * with a NULL stratum form their own stratum at `defaultBudget`
    * (matching [[stratifiedHashSample]]'s null handling); rows with a
    * NULL key are dropped (a null coin fails every comparison — the
    * behavior every keyed operator here shares).
    *
    * 100 TB shape — the naive form is a running-sum window over each
    * stratum, and a handful of source strata would each funnel through
    * one sorted partition. Instead: bucket the 32-bit hash into
    * `2^binBits` ordered bins, aggregate token sums per (stratum, bin)
    * (ONE map-side-combined shuffle of counts, no rows — a pruned
    * second scan), prefix-sum that tiny frame per stratum, and
    * broadcast-join each bin's tokens-before-this-bin offset back. The
    * per-row before-sum is then the bin offset plus a running sum
    * WITHIN the row's (stratum, bin) window — so the fine window
    * partitions on (stratum, bin): 2^binBits-way parallel per stratum,
    * each partition ~corpus/(strata·2^binBits) rows, no serial stratum
    * sort anywhere. Row-for-row identical to the naive window: bins
    * are ordered hash prefixes, so bin order extends row order, and
    * the offset makes every row's test exact (boundary ties, including
    * zero-token rows at an exact budget edge, included). */
  def tokenBudgetCap(df: DataFrame, strataCol: Column, keyCol: Column,
      tokenCol: Column, budgets: Map[String, Long], defaultBudget: Long,
      seed: Long = 42L, binBits: Int = 12): DataFrame = {
    require(binBits >= 1 && binBits <= 20,
      s"binBits must be in [1, 20], got $binBits")
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be >= 0")
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(
      lit(defaultBudget)) { case (acc, (s, b)) =>
        when(strataCol === lit(s), lit(b)).otherwise(acc)
      }
    val cols = df.columns
    // null-safe stratum key: equi-joins never match NULL = NULL, so a
    // bare cast would silently DROP every null-stratum row at the bin
    // join. Prefix real values (collision-free vs the null token) and
    // give null its own stratum — budgetCol's when-chain already routes
    // null to defaultBudget.
    val strataKey = when(strataCol.isNull, lit("\u0000"))
      .otherwise(concat(lit("v:"), strataCol.cast("string")))
    val t = df
      .withColumn("__tbc_s", strataKey)
      .withColumn("__tbc_h", hashU32(keyCol, seed))
      .withColumn("__tbc_k", keyCol.cast("string"))
      .withColumn("__tbc_tok", tokenCol.cast("long"))
      .withColumn("__tbc_b", budgetCol)
      .withColumn("__tbc_bin",
        shiftright(col("__tbc_h"), 32 - binBits).cast("int"))
      // dropped means GONE: a null-key row has no coin, and letting it
      // reach phase 1 would pour its tokens into a null bin that sorts
      // FIRST in the prefix window — silently eating the stratum's
      // budget for rows that can never be emitted
      .filter(col("__tbc_h").isNotNull)
    // phase 1: tokens-before-each-bin — a frame of at most
    // nStrata·2^binBits COUNT rows, never corpus rows
    val binW = Window.partitionBy(col("__tbc_s")).orderBy(col("__tbc_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bins = t.groupBy(col("__tbc_s"), col("__tbc_bin"))
      .agg(sum(col("__tbc_tok")).as("__tbc_btok"))
      .withColumn("__tbc_cb",
        sum(col("__tbc_btok")).over(binW) - col("__tbc_btok"))
      .select(col("__tbc_s"), col("__tbc_bin"), col("__tbc_cb"))
    // phase 2: before-sum = bin offset + running sum within the bin;
    // one (stratum, bin)-keyed shuffle of the corpus, fully parallel
    val fineW = Window.partitionBy(col("__tbc_s"), col("__tbc_bin"))
      .orderBy(col("__tbc_h"), col("__tbc_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(broadcast(bins), Seq("__tbc_s", "__tbc_bin"))
      .withColumn("__tbc_fine",
        col("__tbc_cb") + sum(col("__tbc_tok")).over(fineW) - col("__tbc_tok"))
      .filter(col("__tbc_fine") < col("__tbc_b"))
      .select(cols.map(col): _*)
  }

  /** Keep at most `k` rows per key group, selected deterministically by
    * `orderBy` (ties broken by every following column). Content-hash
    * ordering (e.g. `md5(text)`) gives a stable pseudo-random pick that
    * is reproducible across runs, engines, and partitionings — unlike
    * `sample()`, whose selection depends on Spark's RNG and row order.
    *
    * 100 TB shape: one hash shuffle on the key columns; Spark's
    * WindowGroupLimit pushes the `rn <= k` bound into the sort on each
    * side of the exchange, so no group is fully sorted or materialized
    * beyond its top-k. */
  /** Temperature-scaled mixing rates — the multilingual/multi-source
    * α-sampling recipe (sample stratum s ∝ p_s^α, α ∈ (0, 1] flattens
    * the mix toward uniform; α = 1 keeps natural proportions): given
    * per-stratum sizes, returns the per-stratum KEEP RATES that realize
    * the α-scaled target distribution at the largest total size that
    * needs no upsampling (rates ≤ 1 — the stratum whose share GROWS
    * most under flattening keeps everything, every other stratum
    * downsamples). Feed the result to [[stratifiedHashSample]]. Driver
    * arithmetic over the O(#strata) size map — pair it with a
    * `groupBy(strata).count()` (bounded aggregation) for the sizes. */
  def temperatureRates(sizes: Map[String, Long],
      alpha: Double): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(sizes.nonEmpty, "temperatureRates: empty size map")
    require(sizes.values.forall(_ >= 1),
      s"temperatureRates: non-positive stratum size in $sizes")
    val total = sizes.values.map(_.toDouble).sum
    // target share q_s ∝ (n_s/N)^α; keep rate r_s ∝ q_s/n_s, scaled so
    // max r_s = 1 (no stratum is asked to upsample)
    val unscaled = sizes.map { case (s, n) =>
      s -> math.pow(n / total, alpha) / n
    }
    val m = unscaled.values.max
    unscaled.map { case (s, r) => s -> r / m }
  }

  /** Deterministic global shuffle into training shards — the "randomize
    * example order before writing the training set" step every epoch-0
    * pipeline runs. Each row gets `shard = hash(seed, key) % numShards`
    * and `pos` = its rank within the shard by (hash, key); reading
    * shards in order visits the corpus in a pseudo-random order that is
    * a PURE FUNCTION of (seed, key) — reruns, backfills, and other
    * engines produce the identical order (unlike `orderBy(rand())`,
    * whose RNG is partition-seeded), and a different seed gives an
    * independent permutation per epoch. `keyCol` must uniquely identify
    * rows (duplicate keys tie on (hash, key) and take arbitrary ranks —
    * the [[tokenBudgetCap]] caveat); NULL keys are dropped (a null coin
    * fails every comparison — the keyed-operator convention here).
    *
    * 100 TB shape: ONE hash shuffle on the shard id, then per-shard
    * sorts in parallel. Each shard is a single sort partition — that is
    * the POINT (a shard becomes one training file), so size `numShards`
    * to the target file size, not to the cluster: corpus/numShards
    * must fit a task. The window is per-shard, so WindowGroupLimit-free
    * full materialization is exactly one shard's rows. */
  def deterministicShuffle(df: DataFrame, keyCol: Column, numShards: Int,
      seed: Long = 42L): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "deterministicShuffle: input already has a shard/pos column")
    val rn = Iterator.from(0).map(i => s"__dsh$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(col("shard")).orderBy(col(rn), keyCol)
    df.filter(keyCol.isNotNull)
      .withColumn(rn, hashU32(keyCol, seed))
      .withColumn("shard", pmod(col(rn), lit(numShards)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop(rn)
  }

  def stratifiedCap(df: DataFrame, keyCols: Seq[String], k: Int,
      orderBy: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(orderBy.nonEmpty, "orderBy must be non-empty (determinism)")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    // collision-proof temp name: a caller's own "__rn" column must
    // survive untouched
    val rn = Iterator.from(0).map(i => s"__rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }
}
