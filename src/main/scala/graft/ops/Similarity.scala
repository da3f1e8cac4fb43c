package graft.ops

import graft.functions.MathFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north star #2).
  *
  * Three tiers, by corpus size:
  *  1. `bruteForceTopK` — exact: broadcast the (small) query set against
  *     one corpus scan. O(|Q|·n), zero corpus shuffle. The baseline.
  *  2. `lshTopK` / `lshTopKMultiTable` — approximate: random-hyperplane
  *     buckets on both sides, candidates share a bucket; rerank exactly
  *     within buckets. Recall levers: bit-flip multi-probe
  *     (`probeHamming`) and OR-amplified independent tables (`nTables`).
  *  3. `ivfTopK` — approximate: k-means coarse quantizer with `nprobe`
  *     cells per query and save/load centroid persistence; the 100 TB
  *     shape where bucket skew matters.
  */
object Similarity {

  /** Index state (centroids, codebooks, hyperplanes) rides a broadcast
    * variable read by the native index expressions
    * ([[graft.functions.IndexExpr]]), NOT plan literals: a literal
    * centroid table serializes O(k·d) into the plan AND every task
    * binary — at a production quantizer (k = 2^16, d = 1024) that is
    * hundreds of MB of plan for every query. The broadcast handle keeps
    * plans O(1) in k·d (PlanSpec gates this) and ships the table to each
    * executor once. One broadcast per operator invocation, shared across
    * the corpus and query sides of the join.
    *
    * Lifecycle: each builder call creates a fresh broadcast whose
    * executor-side blocks are reclaimed by the ContextCleaner once the
    * returned plan (which holds the only reference) is garbage-collected
    * — the same deferred-release contract as the dedup band caches. The
    * builder cannot unpersist eagerly: the DataFrame it returns is lazy
    * and may be acted on any number of times. A long-lived session
    * constructing MANY index queries against the SAME index state should
    * instead create one handle (`spark.sparkContext.broadcast(state)`),
    * build columns via [[graft.functions.IndexExpr]] directly, and
    * `destroy()` it when done — that is exactly the seam these builders
    * compose from. */
  private def bcOf[T](v: T)(implicit ct: scala.reflect.ClassTag[T])
      : org.apache.spark.broadcast.Broadcast[T] =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(v)

  /** Exact top-k: queries broadcast against a single corpus scan. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"), cosineSim(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    // a zero-norm vector yields cos = 0/0 = NaN, and NaN sorts FIRST in
    // descending order — one degenerate row would outrank every true
    // neighbor for every query. Exclude NaN scores from the ranking.
    scored.filter(!isnan(col("cos")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic random-hyperplane bucket id (nBits-bit signature).
    *
    * Two hyperplane families, both deterministic:
    *  - `seed = None` (default): component i of plane j = sin(i·131 +
    *    j·523) — seedless and SQL-expressible, so cross-engine oracles
    *    can recompute the identical buckets (q42/q46/q65).
    *  - `seed = Some(s)`: i.i.d. gaussians from `java.util.Random(s)`
    *    (nextGaussian is algorithm-specified in its javadoc, so the same
    *    seed yields bit-identical planes on any JVM) — the production
    *    choice: true spherically-symmetric projections, and distinct
    *    seeds give independent hash tables for multi-table LSH.
    *
    * The hyperplanes are computed on the driver and ship via a broadcast
    * read by the native [[graft.functions.LshSignature]] expression, so
    * the per-row work is one fused nBits×dim loop inside codegen and the
    * plan stays O(1) in the plane count — either family ships the same
    * way. The projection is rounded to 6 dp before the sign test so an
    * engine-dependent last-ulp wobble cannot flip a bucket bit
    * (cross-engine oracle exactness). */
  def lshBucket(vecCol: Column, dim: Int, nBits: Int = 8,
      seed: Option[Long] = None, planeOffset: Int = 0): Column = {
    // the signature packs bits into an Int and Java's << masks the shift
    // to 5 bits — nBits > 32 would silently alias plane j onto j-32
    require(nBits >= 1 && nBits <= 32,
      s"nBits must be in [1, 32] (Int signature), got $nBits")
    val rng = seed.map(s => new java.util.Random(s))
    val planes: Array[Array[Double]] = Array.tabulate(nBits) { j =>
      rng match {
        case Some(r) => Array.fill(dim)(r.nextGaussian())
        // planeOffset shifts the seedless family to a disjoint plane set
        // (plane j' = j + offset) — how multi-table LSH gets independent
        // tables while staying SQL-expressible for cross-engine oracles
        case None =>
          Array.tabulate(dim)(i => math.sin(i * 131.0 + (j + planeOffset) * 523.0))
      }
    }
    graft.functions.IndexExpr.lshSignature(
      vecCol.cast("array<double>"), bcOf(planes))
  }

  /** Johnson–Lindenstrauss random projection: map a `fromDim` embedding
    * to `toDim` components y_j = Σ_i v_i · P(j)(i) / √toDim — the
    * standard embedding-compression step before ANN at scale (JL: for
    * toDim = O(log n / ε²) pairwise distances are preserved within
    * 1 ± ε, so a 1024-dim corpus can rank candidates on a 64-dim shadow
    * at 1/16 the scan bytes and rerank survivors on the full vectors).
    *
    * The plane families mirror [[lshBucket]] (this is its raw-valued
    * generalization — lshBucket keeps only the projection SIGNS):
    * seedless sin(i·131 + j·523) planes are SQL-expressible for
    * cross-engine oracles; `seed = Some(s)` gives i.i.d. gaussians
    * (java.util.Random.nextGaussian, algorithm-specified — bit-identical
    * planes on any JVM). Planes ship via ONE broadcast read by the
    * native [[graft.functions.ProjectVec]] (fused toDim×fromDim loop in
    * codegen, plan O(1) in the matrix size). Components are rounded to
    * `roundDp` (cross-engine exactness rule). */
  def randomProject(vecCol: Column, fromDim: Int, toDim: Int,
      seed: Option[Long] = None, roundDp: Int = 6): Column = {
    require(fromDim >= 1 && toDim >= 1,
      s"dims must be >= 1, got fromDim=$fromDim toDim=$toDim")
    val rng = seed.map(s => new java.util.Random(s))
    val scale = 1.0 / math.sqrt(toDim.toDouble)
    val planes: Array[Array[Double]] = Array.tabulate(toDim) { j =>
      rng match {
        case Some(r) => Array.fill(fromDim)(r.nextGaussian() * scale)
        case None =>
          Array.tabulate(fromDim)(i => math.sin(i * 131.0 + j * 523.0) * scale)
      }
    }
    graft.functions.IndexExpr.projectVec(
      vecCol.cast("array<double>"), bcOf(planes), roundDp)
  }

  /** Approximate top-k via shared LSH buckets + exact rerank.
    *
    * `probeHamming = 1` turns on bit-flip multi-probe: each query also
    * probes the `nBits` buckets at hamming distance 1 from its own (a
    * near-miss on one hyperplane's sign is the dominant LSH failure mode,
    * so these are exactly the buckets holding the lost neighbors). Only
    * the broadcast-small QUERY side fans out (×(nBits+1)); the corpus
    * keeps one bucket per row, so the plan stays a single bucket join and
    * no (q, c) pair can duplicate. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nBits: Int = 8, probeHamming: Int = 0,
      seed: Option[Long] = None): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 1,
      s"probeHamming must be 0 or 1, got $probeHamming")
    val bucket = lshBucket(col(vecCol), dim, nBits, seed)
    val c = corpus.select(col(idCol).as("c_id"),
      col(vecCol).cast("array<double>").as("cv"), bucket.as("bk"))
    val probes =
      if (probeHamming == 0) array(bucket)
      else array(bucket +: (0 until nBits).map(j =>
        bucket.bitwiseXOR(lit(1 << j))): _*)
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"), explode(probes).as("bk"))
    val scored = c.join(broadcast(q), "bk")
      .select(col("q_id"), col("c_id"), cosineSim(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    // a zero-norm vector yields cos = 0/0 = NaN, and NaN sorts FIRST in
    // descending order — one degenerate row would outrank every true
    // neighbor for every query. Exclude NaN scores from the ranking.
    scored.filter(!isnan(col("cos")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Production IVF cell-count discipline: hold POINTS PER CELL roughly
    * constant as the corpus grows (k ≈ n / targetPerCell), so the
    * within-cell pairwise stage of [[graft.ops.Dedup.semDedup]] — and
    * every IVF probe — stays O(n · targetPerCell) total instead of
    * O(n²/k) with a frozen k. This is the knob `SPARK_GRAFT_SEMDEDUP_K`
    * set manually in scale runs, computed from the corpus size instead:
    * at 10× the data the cell count grows 10×, cell occupancy stays
    * flat, and both index-build and query cost scale linearly.
    *
    * Bounds: at least 1 (an empty/tiny corpus degrades to one cell,
    * i.e. exact all-pairs — correct, just not accelerated), at most `n`
    * (trainIvfCentroids requires k ≤ corpus rows). For n ≥ 2 ·
    * targetPerCell the realized density n/k lands within a factor 2 of
    * `targetPerCell` (SemDedupOracleSpec pins the density/bounds). */
  def autoCellCount(n: Long, targetPerCell: Int = 256): Int = {
    require(targetPerCell >= 1, s"targetPerCell must be >= 1, got $targetPerCell")
    require(n >= 0, s"n must be >= 0, got $n")
    val k = math.round(n.toDouble / targetPerCell)
    math.max(1L, math.min(n, k)).toInt
  }

  /** Scale-adaptive LSH signature width: the smallest `b ≥ 1` with
    * `targetPerBucket · 2^b ≥ n`, i.e. expected bucket occupancy stays
    * at or under `targetPerBucket` as the corpus grows — the log(n)
    * discipline the IVF cell count (autoCellCount) already follows,
    * applied to hyperplane signatures (VERDICT r12 #8: a FIXED width
    * saturates at scale — q65's 4-bit/16-bucket config packs sf1's 20k
    * vectors at ~1.2k per bucket and degrades hot buckets to recall-
    * losing stars; at 100× every bucket is hot). Integer arithmetic on
    * both engines (no log/ceil float boundary): DuckDB replays it as
    * MIN(b) WHERE target·(1<<b) ≥ COUNT(*). Capped at 30 so the packed
    * Int signature never reaches the sign bit. */
  def autoLshBits(n: Long, targetPerBucket: Int = 512): Int = {
    require(targetPerBucket >= 1,
      s"targetPerBucket must be >= 1, got $targetPerBucket")
    require(n >= 0, s"n must be >= 0, got $n")
    var b = 1
    while (b < 30 && (targetPerBucket.toLong << b) < n) b += 1
    b
  }

  /** IVF: Lloyd k-means coarse quantizer trained distributed (seeded
    * uniform-sample init — unbiased on sorted/clustered input, unlike a
    * first-partition prefix — and deterministic for a fixed seed), then
    * assign each corpus vector to its nearest centroid cell; queries
    * probe `nprobe` cells. Centroids are O(k·d) driver state.
    *
    * `maxTrainPoints` caps the TRAINING set (seeded Bernoulli sample) —
    * the FAISS discipline: Lloyd needs only a few dozen points per
    * centroid to place cells (clustering_parameters guidance: ~39+),
    * while the full-corpus pass costs O(n·k·d·iters), which at the
    * auto-scaled k ≈ n/256 is O(n²·d/256) — QUADRATIC in the corpus.
    * The -1 default trains on the FULL corpus (the historical behavior
    * — every trained-model spec and recorded fixture stays
    * byte-identical); pass 0 for the auto cap (64·kCells) or an
    * explicit cap for scale runs. Assignment cost (one O(n·k·d) pass
    * per downstream query) is unchanged — this bounds only the
    * iterated training phase. */
  def trainIvfCentroids(
      corpus: DataFrame, vecCol: String, kCells: Int, iters: Int = 5,
      seed: Long = 42L, maxTrainPoints: Long = -1L): Array[Array[Double]] = {
    val full = corpus.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    full.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap =
      if (maxTrainPoints == 0L) 64L * kCells
      else if (maxTrainPoints < 0L) Long.MaxValue
      else maxTrainPoints
    require(cap >= kCells,
      s"maxTrainPoints=$cap smaller than kCells=$kCells")
    val n = full.count()
    // sample only when the corpus exceeds the cap: the sampled path and
    // the full path are IDENTICAL below it, and the sample is seeded so
    // training stays deterministic per fixture
    val rdd =
      if (n > cap) {
        val s = full.sample(withReplacement = false,
          fraction = cap.toDouble / n, seed = seed ^ 0x5eed5eedL)
        s.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        s.count() // materialize so iterations scan the cached sample
        s
      } else full
    var centroids = rdd.takeSample(withReplacement = false, kCells, seed)
    // a corpus smaller than kCells would silently train a smaller
    // quantizer (takeSample returns what exists) — fail fast instead:
    // every consumer sizes nprobe/codes against the REQUESTED k
    require(centroids.length == kCells,
      s"corpus has only ${centroids.length} rows, fewer than kCells=$kCells")
    var iter = 0
    while (iter < iters) {
      val bc = rdd.sparkContext.broadcast(centroids)
      val d0 = centroids(0).length
      val k0 = centroids.length
      // Per-partition partials combined in PARTITION-INDEX ORDER — the
      // Kernels.partitionAggregate discipline, not treeAggregate:
      // treeAggregate's combOp merges in task-completion order, which
      // varies run-to-run, and float addition is non-associative, so the
      // trained centroids drifted in the last ulp across identical-seed
      // runs (caught as a flake by HierIvfSpec's determinism pin, r15 —
      // latent since r12). Empty partitions emit nothing (allocation is
      // first-use inside the partition, so no k·d zero matrix rides the
      // task binary); Kernels.orderedPartialFold folds contiguous runs
      // of 64 in index order, recursing, so no single holder (driver or
      // reducer) ever sees more than 64 of the k·d-sized partials, and
      // the combine tree is a pure function of the partition count —
      // bit-identical run-to-run.
      val partials = rdd.mapPartitionsWithIndex { (idx, it) =>
        val cs = bc.value
        var sums: Array[Array[Double]] = null
        var counts: Array[Long] = null
        while (it.hasNext) {
          val v = it.next()
          if (sums == null) {
            sums = Array.fill(k0)(new Array[Double](d0))
            counts = new Array[Long](k0)
          }
          // a ragged corpus must fail loudly here, not AIOOBE on a
          // shorter row or silently truncate a longer one into skewed
          // centroids (loadCentroids enforces the same uniformity)
          if (v.length != d0)
            throw new IllegalArgumentException(
              s"ragged corpus: vector of dim ${v.length}, expected $d0")
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            var dist = 0.0; var i = 0
            while (i < d0) { val t = v(i) - cs(c)(i); dist += t * t; i += 1 }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          var i = 0
          while (i < d0) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        if (sums == null) Iterator.empty
        else Iterator.single((idx, (sums, counts)))
      }
      def merge(a: (Array[Array[Double]], Array[Long]),
          b: (Array[Array[Double]], Array[Long])) = {
        var c = 0
        while (c < a._2.length) {
          var i = 0
          while (i < a._1(c).length) { a._1(c)(i) += b._1(c)(i); i += 1 }
          a._2(c) += b._2(c); c += 1
        }
        a
      }
      // k·d partials are MBs each, so the flat-collect bound must be
      // tight: Kernels.orderedPartialFold recurses in runs of 64, so
      // neither the driver nor any reducer ever holds more than 64
      // partials (the r15 single-level form collected up to 1024 ≈ 4 GB
      // on the driver — ADVICE r15 / VERDICT r15 what's-wrong #2).
      // Same bit-determinism: the combine tree is a pure function of
      // the partition count. Unchanged bits at ≤ 64 partitions (every
      // gate/test fixture) — above that the tree SHAPE differs from
      // r15's, which only moves last-ulp float association, re-anchored
      // by the oracle replay protocol.
      val folded = graft.linalg.Kernels.orderedPartialFold(
        partials, rdd.getNumPartitions, merge)
      centroids = folded match {
        case None => centroids // empty training set: keep init
        case Some(f) => centroids.indices.map { c =>
          if (f._2(c) == 0) centroids(c)
          else f._1(c).map(_ / f._2(c))
        }.toArray
      }
      bc.destroy()
      iter += 1
    }
    if (!(rdd eq full)) rdd.unpersist(false)
    full.unpersist(false)
    centroids
  }

  // ---- two-level coarse quantizer (VERDICT r14 #6) ---------------------
  //
  // The flat trainer above holds the full k·d centroid matrix on the
  // driver and assignment is one O(n·k·d) pass — fine to k ~ 10⁵, but at
  // the autoCellCount discipline (k ≈ n/256) a 10¹⁰-vector corpus wants
  // k ≈ 4·10⁷: ~20 GB of driver state and an impractical scan. The
  // standard fix (FAISS IVF_HNSW/IMI lineage) is hierarchical routing:
  // √k SUPER-cells trained flat (driver state √k·d — 3 MB at the 10¹⁰
  // target), then ≈√k SUB-centroids per super-cell trained DISTRIBUTED —
  // the leaf table lives as a DataFrame keyed by super-cell and is never
  // collected. Routing a vector costs √k·d (broadcast super argmin) +
  // (k/√k)·d (argmin within one super-cell's sub-list), i.e.
  // O(√k·d) per vector instead of O(k·d); driver state is
  // O(√k·d + (k/√k)·d) — the super table plus ONE cell's sub-list in
  // flight — instead of O(k·d).

  /** Handle for a trained two-level quantizer: `supers` is the flat
    * √k-sized coarse table (driver/broadcast state), `leaves` the
    * distributed sub-centroid table `(superId, subId, centroid)` —
    * leafId (superId, subId) is the routed cell identity. */
  final case class HierIndex(
      supers: Array[Array[Double]], leaves: DataFrame) {
    /** Leaf count (≈ the requested kCells; proportional occupancy
      * allocation rounds per super-cell). Runs a small agg job. */
    def leafCount(): Long = leaves.count()
    /** The flattened leaf table, ordered by (superId, subId) — for
      * small-k compatibility and the route-equivalence spec ONLY; at
      * the 10¹⁰-scale k this is the exact O(k·d) driver materialization
      * the two-level design exists to avoid. */
    def collectLeaves(): Array[Array[Double]] =
      leaves.orderBy(col("superId"), col("subId"))
        .select(col("centroid")).collect()
        .map(_.getSeq[Double](0).toArray)
  }

  /** Squared L2 distance between two array<double> columns via
    * higher-order functions (codegen'd, no UDF). */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Train a two-level quantizer with ≈`kCells` leaves. Super-cells:
    * `ceil(√kCells)`, trained with the flat [[trainIvfCentroids]] (same
    * seed/iters/maxTrainPoints semantics — driver state √k·d). Sub-
    * centroids: allocated per super-cell PROPORTIONALLY to training
    * occupancy (≥1 each; an empty super-cell keeps its super centroid
    * as its single leaf so routing is total), initialized from a seeded
    * hash order, refined with `iters` distributed Lloyd rounds — each
    * round is one shuffle of the (capped) training set joined to the
    * per-super sub-lists, one groupBy mean update. The driver never
    * holds the leaf table.
    *
    * Training cost per round: O(t·(√k + k/√k)·d) for t training points
    * — at k = n/256 that is O(n·√k·d/256) vs the flat trainer's
    * O(n·k·d/256): a √k speedup with the same broadcast discipline. */
  def trainIvfCentroidsTwoLevel(
      corpus: DataFrame, vecCol: String, kCells: Int, iters: Int = 5,
      seed: Long = 42L, maxTrainPoints: Long = 0L): HierIndex = {
    require(kCells >= 1, s"kCells must be >= 1, got $kCells")
    // This trainer REQUIRES a finite training cap (ADVICE r15): the
    // deterministic Lloyd mean below materializes each sub-cell's
    // training points in one sort_array(collect_list) aggregation
    // buffer, so its memory bound IS the cap — the flat trainer's
    // "<0 = full corpus" mode would let one hot cell buffer the corpus
    // and OOM an executor where a streaming avg() could not. Default 0
    // = the auto 64·kCells cap (the flat trainer's own auto rule).
    require(maxTrainPoints >= 0L,
      "trainIvfCentroidsTwoLevel needs a finite training cap: pass " +
        "maxTrainPoints > 0, or 0 for the auto 64*kCells cap " +
        "(the full-corpus <0 mode would unbound the per-cell " +
        "deterministic-mean aggregation buffer)")
    val kSuper = math.max(1, math.ceil(math.sqrt(kCells.toDouble)).toInt)
    val supers = trainIvfCentroids(corpus, vecCol, kSuper, iters, seed,
      maxTrainPoints)
    val spark = corpus.sparkSession

    // Training set for the sub level: same cap semantics as the flat
    // trainer (0 = auto 64·kCells, >0 = explicit).
    val cap = if (maxTrainPoints == 0L) 64L * kCells else maxTrainPoints
    val base = corpus.select(col(vecCol).cast("array<double>").as("v"))
    val nAll = base.count()
    val train0 =
      if (nAll > cap) base.sample(withReplacement = false,
        fraction = cap.toDouble / nAll, seed = seed ^ 0x5eed5eedL)
      else base
    // Route every training point to its super-cell once (broadcast
    // argmin, √k·d per row) and persist: every Lloyd round below and
    // the occupancy counts scan this, not the corpus.
    val routed = train0
      .withColumn("superId", ivfCell(col("v"), supers))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = math.max(1L, routed.count())

    // Proportional leaf allocation: super-cell s gets
    // max(1, round(kCells·occupancy_s/total)) sub-centroids, clamped to
    // its occupancy (Lloyd cannot place more centroids than points).
    val alloc = routed.groupBy("superId")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("kSub", greatest(lit(1L), least(col("cnt"),
        round(col("cnt") * lit(kCells.toDouble) / lit(total.toDouble)))))
      .select(col("superId"), col("kSub"))

    // Init: the kSub_s points with the smallest seeded hash per
    // super-cell (deterministic, uniform over the training sample).
    val w = Window.partitionBy(col("superId"))
      .orderBy(xxhash64(col("v").cast("string"), lit(seed)), col("v").cast("string"))
    var subs = routed
      .withColumn("rn", row_number().over(w))
      .join(alloc, "superId")
      .filter(col("rn") <= col("kSub"))
      .select(col("superId"), (col("rn") - 1).cast("int").as("subId"),
        col("v").as("centroid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    subs.count()

    // Distributed Lloyd on the sub level: join each training point with
    // its super-cell's sub-list (one shuffle on superId), argmin inside
    // the list (k/√k·d per row, higher-order fold — no UDF), mean
    // update via groupBy. Empty sub-cells keep their previous centroid
    // (left join below), matching the flat trainer's empty-cell rule.
    val dim = supers(0).length
    var it = 0
    while (it < iters) {
      // sort_array: fixes the in-row argmin fold order so a distance
      // tie resolves to the lowest subId deterministically (collect_list
      // order is task-completion-dependent)
      val lists = subs.groupBy("superId")
        .agg(sort_array(
          collect_list(struct(col("subId"), col("centroid")))).as("subs"))
      val assigned = routed.join(lists, "superId")
        .withColumn("best", aggregate(col("subs"),
          struct(lit(Double.MaxValue).as("d"), lit(-1).as("subId")),
          (acc, s) => {
            val d = sqDist(col("v"), s.getField("centroid"))
            when(d < acc.getField("d"),
              struct(d.as("d"), s.getField("subId").as("subId")))
              .otherwise(acc)
          }))
        .select(col("superId"), col("best.subId").as("subId"), col("v"))
      // Mean update with a DETERMINISTIC summation order: a plain avg()
      // folds partial aggregates in shuffle-fetch order, which varies
      // run-to-run and drifts the centroid's last ulp — enough to flip
      // boundary points and break the fixed-seed bit-determinism the
      // rest of the dedup stack keeps (caught as a flake by
      // HierIvfSpec's determinism pin, r15). Sorting each cell's
      // (capped) training points first makes the fold order total;
      // payload is bounded by the training cap, not the corpus.
      val means = assigned.groupBy("superId", "subId")
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .select(col("superId"), col("subId"),
          transform(
            aggregate(col("vs"),
              array_repeat(lit(0.0), dim),
              (acc, x) => zip_with(acc, x, (a, b) => a + b)),
            s => s / size(col("vs"))).as("newCentroid"))
      val next = subs.join(means, Seq("superId", "subId"), "left")
        .select(col("superId"), col("subId"),
          coalesce(col("newCentroid"), col("centroid")).as("centroid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count()
      subs.unpersist(false)
      subs = next
      it += 1
    }

    // Zero-occupancy super-cells (possible when the flat super trainer
    // kept an empty cell's init centroid): their super centroid becomes
    // their single leaf so downstream routing is total over superIds.
    val present = subs.select(col("superId")).distinct()
      .collect().map(_.getInt(0)).toSet
    val missing = supers.indices.filterNot(present)
    val leaves =
      if (missing.isEmpty) subs
      else subs.unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(missing.map(s =>
          org.apache.spark.sql.Row(s, 0, supers(s).toSeq)), 1),
        subs.schema))
    routed.unpersist(false)
    HierIndex(supers, leaves)
  }

  /** Routed cell assignment under a two-level quantizer: stage 1 is the
    * broadcast super argmin (√k·d per row), stage 2 a join on superId
    * against the per-super sub-lists and an in-row argmin (k/√k·d per
    * row). Returns `df` plus `superId`/`subId` columns — (superId,
    * subId) is the leaf cell identity. The join side carries kSuper
    * rows of (k/√k)·d each; Spark broadcasts it while it stays under
    * the broadcast threshold and shuffle-joins beyond — either way the
    * DRIVER never materializes the leaf table.
    *
    * `superProbe` (default 1): route via the TOP-P super-cells and take
    * the global (distance, superId, subId) argmin over their sub-lists.
    * P = 1 is the pure greedy route; it is route-equivalent to the flat
    * argmin only for well-separated clusters — on the realistic σ=0.7
    * clustered 2M fixture it loses ~35% of planted pairs to super-cell
    * BOUNDARY STRADDLES (measured r15: pair recall 0.647 vs flat 0.995).
    * Multi-probing the super level is the standard fix (FAISS IMI
    * lineage): cost grows to O((√k + P·k/√k)·d) per row — still ~k/(P·√k)
    * cheaper than flat — and P = kSuper degenerates to EXACTLY the flat
    * argmin over the leaf set (HierIvfSpec pins this identity on
    * arbitrary data, plus P=1 ≡ the greedy path). */
  def assignCellsTwoLevel(df: DataFrame, vecCol: String,
      hier: HierIndex, superProbe: Int = 1): DataFrame = {
    val kSuper = hier.supers.length
    require(superProbe >= 1 && superProbe <= kSuper,
      s"superProbe must be in [1, $kSuper], got $superProbe")
    val v = col(vecCol).cast("array<double>")
    // sort_array fixes the in-row fold order (collect_list order is
    // task-completion-dependent): struct sort is lexicographic on the
    // unique subId, so a DISTANCE tie inside one super resolves to the
    // lowest subId deterministically — the flat argmin's own tie rule.
    val lists = hier.leaves.groupBy("superId")
      .agg(sort_array(
        collect_list(struct(col("subId"), col("centroid")))).as("__subs"))
    if (superProbe == 1) {
      df.withColumn("superId", ivfCell(v, hier.supers))
        .join(lists, "superId")
        .withColumn("__best", aggregate(col("__subs"),
          struct(lit(Double.MaxValue).as("d"), lit(-1).as("subId")),
          (acc, s) => {
            val d = sqDist(v, s.getField("centroid"))
            when(d < acc.getField("d"),
              struct(d.as("d"), s.getField("subId").as("subId")))
              .otherwise(acc)
          }))
        .withColumn("subId", col("__best.subId"))
        .drop("__subs", "__best")
    } else {
      // Scale-safe multi-probe (VERDICT r15 what's-wrong #1): the r15
      // form ran P separate broadcast()-hinted joins against renamed
      // copies of `lists`, forcing FULL driver materialization of the
      // O(k·d) leaf table — exactly the state the two-level design
      // exists to avoid (~20 GB at the 10¹⁰-vector / k = 4·10⁷ target).
      // This form EXPLODES the P probe candidates to rows under a
      // synthetic row id and shuffle-joins ONCE against the distributed
      // lists table — no broadcast hint; AQE may still pick a broadcast
      // join when lists is genuinely small, which is a size-based
      // runtime decision, not a forced driver materialization
      // (HierIvfSpec pins hint-freedom on the plan). Each candidate
      // super's sub-list folds to its local argmin in-row, then one
      // groupBy on the row id takes the global min(d, superId, subId) —
      // which on exact-distance ties resolves to the LOWEST (superId,
      // subId), the flat argmin's own tie rule (the old concat-fold
      // kept probe order instead). Per-row distance work is unchanged:
      // O((√k + P·k/√k)·d).
      //
      // The original columns ride through as ONE packed struct and come
      // back via first() per group (all P exploded copies are
      // identical), so no self-join on the synthetic id is needed — the
      // id only has to be unique within this single evaluation, which
      // monotonically_increasing_id guarantees — and duplicate input
      // rows keep their multiplicity.
      val rowCols = df.columns.toSeq
      val exploded = df
        .withColumn("__row", struct(rowCols.map(col): _*))
        .withColumn("__rowId", monotonically_increasing_id())
        .select(col("__rowId"), col("__row"), v.as("__vec"),
          explode(ivfCells(v, hier.supers, superProbe)).as("superId"))
      // left join + empty-array coalesce: a probe hitting a superId
      // absent from lists cannot happen (the trainer makes leaves total
      // over superIds) but keeps the fold well-defined rather than
      // dropping the row.
      val localBest = exploded.join(lists, Seq("superId"), "left")
        .withColumn("__cand", aggregate(
          coalesce(col("__subs"),
            array().cast("array<struct<subId:int,centroid:array<double>>>")),
          struct(lit(Double.MaxValue).as("d"), lit(-1).as("subId")),
          (acc, s) => {
            val d = sqDist(col("__vec"), s.getField("centroid"))
            when(d < acc.getField("d"),
              struct(d.as("d"), s.getField("subId").as("subId")))
              .otherwise(acc)
          }))
        .select(col("__rowId"), col("__row"),
          struct(col("__cand").getField("d").as("d"), col("superId"),
            col("__cand").getField("subId").as("subId")).as("__c"))
      val best = localBest.groupBy("__rowId")
        .agg(min(col("__c")).as("__best"), first(col("__row")).as("__row"))
      best.select(rowCols.map(c => col("__row").getField(c).as(c)) ++
        Seq(col("__best").getField("superId").as("superId"),
          col("__best").getField("subId").as("subId")): _*)
    }
  }

  /** Nearest-centroid cell id for a vector column (broadcast centroid
    * table + native argmin, [[graft.functions.NearestCell]]). When
    * `roundDp >= 0` the squared distance is rounded before the argmin so
    * a last-ulp fold wobble cannot flip a cell assignment (cross-engine
    * oracle exactness — same rule as lshBucket). Ties break to the
    * lowest cell id on both engines (struct (d, cell) lexicographic). */
  def ivfCell(vecCol: Column, centroids: Array[Array[Double]],
      roundDp: Int = -1): Column = {
    // NearestCell's argmin over zero cells would emit cell 0 for every
    // row — a degenerate full-bucket join downstream, not an error
    require(centroids.nonEmpty, "centroids must be non-empty")
    graft.functions.IndexExpr.ivfCell(
      vecCol.cast("array<double>"), bcOf(centroids), roundDp)
  }

  /** Multi-table LSH top-k: OR-amplification across `nTables` independent
    * hash tables (seeded gaussian hyperplanes, table t seeded `seed + t`),
    * the standard production recall lever — a neighbor is lost only if it
    * mismatches the query in EVERY table, so miss probability decays
    * exponentially in `nTables` while each table keeps its n/2^nBits
    * bucket sizes.
    *
    * 100 TB shape: the corpus is scanned once and hashed to `nTables`
    * (table, bucket) keys per row via one projection (a ×nTables key
    * fan-out of ids + vectors, NOT a corpus duplication on disk); the
    * broadcast-small query side fans out identically; one equi-join on
    * (table, bucket), exact rerank, per-query top-k. Pairs sharing
    * several tables are collapsed to one scored row by a groupBy on the
    * pair key BEFORE the rank window (see the in-body note on why the
    * score is computed pre-collapse). */
  def lshTopKMultiTable(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nBits: Int = 8, nTables: Int = 4,
      seed: Option[Long] = Some(42L), roundDp: Int = -1): DataFrame = {
    require(nTables >= 1, s"nTables must be >= 1, got $nTables")
    // build each table's bucket Column ONCE and reuse it on both sides
    // of the join: one broadcast plane table per LSH table (the file's
    // one-handle-per-invocation contract), not 2·nTables, and corpus and
    // query provably hash against the identical planes
    val tables = (0 until nTables).map { t =>
      // table t: gaussian planes from seed+t, or (seedless) the
      // disjoint sin-family planes [t·nBits, (t+1)·nBits)
      val bk = seed match {
        case Some(s) => lshBucket(col(vecCol), dim, nBits, Some(s + t))
        case None => lshBucket(col(vecCol), dim, nBits, None, t * nBits)
      }
      struct(lit(t).as("tbl"), bk.as("bk"))
    }
    def keyed(df: DataFrame, idAs: String, vecAs: String) = {
      df.select(col(idCol).as(idAs),
        col(vecCol).cast("array<double>").as(vecAs),
        explode(array(tables: _*)).as("tb"))
    }
    val c = keyed(corpus, "c_id", "cv")
    val q = keyed(queries, "q_id", "qv")
    // a (q, c) pair that shares several tables would rank several times;
    // score INSIDE the join projection (d multiply-adds in codegen — cheap
    // to repeat per shared table), then collapse to one row per pair so
    // the dedup shuffle carries a single double, not two d-dim vectors.
    // cos is identical across a pair's tables, so max() is deterministic.
    val rawCos = cosineSim(col("q.qv"), col("c.cv"))
    val pairs = c.as("c").join(broadcast(q.as("q")), col("c.tb") === col("q.tb"))
      .select(col("q.q_id").as("q_id"), col("c.c_id").as("c_id"),
        (if (roundDp >= 0) round(rawCos, roundDp) else rawCos).as("cos"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    // a zero-norm vector yields cos = 0/0 = NaN, and NaN sorts FIRST in
    // descending order — one degenerate row would outrank every true
    // neighbor for every query. Exclude NaN scores from the ranking.
    pairs.filter(!isnan(col("cos")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Persist trained IVF centroids as a tiny (cell, centroid) parquet
    * table — the index-build-once shape: at 100 TB the k-means training
    * pass is the expensive step, so the quantizer is written next to the
    * corpus and every subsequent query job [[loadCentroids]] instead of
    * retraining. Cell ids are the array index; the loader restores order
    * by the cell column, so assignments are reproducible across jobs. */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path)
      .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(rows.nonEmpty, s"no centroids at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"centroid cells at $path are not a dense 0..${rows.length - 1} range")
    // uniform dimensionality, same rule as loadCodebooks: NearestCell
    // folds over min(vec, centroid) lengths, so a ragged table would
    // silently assign wrong cells instead of failing here
    val d = rows.head._2.length
    require(d >= 1 && rows.forall(_._2.length == d),
      s"ragged centroid table at $path: expected uniform dimension $d")
    rows.map(_._2)
  }

  /** The query's `nprobe` nearest centroid cells, nearest first (the
    * multi-probe companion of [[ivfCell]], same rounding/tie rules:
    * `array_sort` on struct(d, cell) orders by distance then lowest cell
    * id). */
  def ivfCells(vecCol: Column, centroids: Array[Array[Double]], nprobe: Int,
      roundDp: Int = -1): Column = {
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe must be in [1, ${centroids.length}], got $nprobe")
    graft.functions.IndexExpr.ivfCells(
      vecCol.cast("array<double>"), bcOf(centroids), nprobe, roundDp)
  }

  /** IVF approximate top-k: each query probes its `nprobe` nearest cells.
    * Corpus rows keep exactly ONE cell, so fanning out only the
    * broadcast-small query side widens recall without duplicating any
    * (q, c) pair or touching the corpus-side plan. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], k: Int, roundDp: Int = -1,
      nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe must be in [1, ${centroids.length}], got $nprobe")
    val bc = bcOf(centroids) // ONE handle for both sides of the join
    val c = corpus.select(col(idCol).as("c_id"),
      col(vecCol).cast("array<double>").as("cv"),
      graft.functions.IndexExpr.ivfCell(
        col(vecCol).cast("array<double>"), bc, roundDp).as("cell"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"),
      explode(graft.functions.IndexExpr.ivfCells(
        col(vecCol).cast("array<double>"), bc, nprobe, roundDp)).as("cell"))
    val rawCos = cosineSim(col("qv"), col("cv"))
    val scored = c.join(broadcast(q), "cell")
      .select(col("q_id"), col("c_id"),
        (if (roundDp >= 0) round(rawCos, roundDp) else rawCos).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    // a zero-norm vector yields cos = 0/0 = NaN, and NaN sorts FIRST in
    // descending order — one degenerate row would outrank every true
    // neighbor for every query. Exclude NaN scores from the ranking.
    scored.filter(!isnan(col("cos")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Product-quantization codes: the vector is split into `m` equal
    * subvectors and each is replaced by the id of its nearest codeword in
    * that subspace's codebook — `m` small ints instead of `dim` doubles
    * (64-dim float → 4 bytes at m=4/ksub≤256, a 64× compression). The
    * memory-resident-index shape for 100 TB ANN: the codes table fits in
    * RAM where the raw vectors never would. `codebooks(s)(c)` is codeword
    * `c` of subspace `s`; all codebooks ship via ONE broadcast read by
    * the native [[graft.functions.PqEncodeExpr]], so encoding is one
    * codegen'd projection and the plan stays O(1) in m·ksub·dsub (same
    * argmin/round/tie rules as [[ivfCell]]: round before the argmin so a
    * last-ulp wobble cannot flip a code, ties to the lowest code id). */
  def pqCodes(vecCol: Column, codebooks: Array[Array[Array[Double]]],
      roundDp: Int = -1): Column = {
    validateCodebooks(codebooks)
    graft.functions.IndexExpr.pqCodes(
      vecCol.cast("array<double>"), bcOf(codebooks), roundDp)
  }

  /** Structural invariants every codebook consumer assumes: at least one
    * subspace, uniform ksub >= 1 across subspaces, uniform codeword
    * dimensionality everywhere (dsub is derived from codebooks(0)(0), so
    * a ragged table would silently compute wrong distances instead of
    * failing here). */
  private[ops] def validateCodebooks(cbs: Array[Array[Array[Double]]]): Unit = {
    require(cbs.nonEmpty && cbs.forall(_.nonEmpty), "empty codebooks")
    val ksub = cbs(0).length
    require(cbs.forall(_.length == ksub),
      s"ragged codebooks: subspace ksub counts ${cbs.map(_.length).mkString(",")}")
    val dsub = cbs(0)(0).length
    require(dsub >= 1 && cbs.forall(_.forall(_.length == dsub)),
      s"ragged codebooks: expected uniform codeword length $dsub")
  }

  /** Asymmetric-distance computation (ADC): approximate squared L2
    * between a RAW query vector and an ENCODED corpus row = the sum over
    * subspaces of the exact distance from the query subvector to the
    * corpus row's codeword. The query side never quantizes (that would
    * double the quantization error for free). One broadcast-codebook
    * lookup + fused loop per row ([[graft.functions.AdcDistExpr]]);
    * terms are rounded before the sum so the m-addend total is
    * cross-engine exact. */
  def adcDistance(queryVec: Column, codesCol: Column,
      codebooks: Array[Array[Array[Double]]], roundDp: Int = -1): Column = {
    validateCodebooks(codebooks)
    graft.functions.IndexExpr.adcDistance(
      queryVec.cast("array<double>"), codesCol, bcOf(codebooks), roundDp)
  }

  /** PQ approximate top-k by ADC distance (ascending). The corpus scan
    * carries only (id, m-byte codes); the broadcast-small query side
    * carries raw vectors. At scale the encoded corpus comes from a
    * persisted codes table (encode once with [[pqCodes]], write next to
    * the corpus like the IVF centroid table) so query jobs never touch
    * the raw vectors at all. */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int,
      roundDp: Int = -1): DataFrame = {
    validateCodebooks(codebooks)
    val bc = bcOf(codebooks) // ONE handle for encode + ADC
    val c = corpus.select(col(idCol).as("c_id"),
      graft.functions.IndexExpr.pqCodes(
        col(vecCol).cast("array<double>"), bc, roundDp).as("codes"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"),
        graft.functions.IndexExpr.adcDistance(
          col("qv"), col("codes"), bc, roundDp).as("adist"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** IVF-PQ: the production 100 TB ANN composition — IVF cells prune the
    * corpus to `nprobe` cells per query, PQ codes make the within-cell
    * scan byte-sized. Corpus rows keep ONE (cell, codes) pair; only the
    * broadcast-small query side fans out, so no (q, c) pair duplicates
    * (same invariant as [[ivfTopK]]). */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      k: Int, nprobe: Int = 1, roundDp: Int = -1): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe must be in [1, ${centroids.length}], got $nprobe")
    validateCodebooks(codebooks)
    val bcC = bcOf(centroids)
    val bcB = bcOf(codebooks)
    val c = corpus.select(col(idCol).as("c_id"),
      graft.functions.IndexExpr.ivfCell(
        col(vecCol).cast("array<double>"), bcC, roundDp).as("cell"),
      graft.functions.IndexExpr.pqCodes(
        col(vecCol).cast("array<double>"), bcB, roundDp).as("codes"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"),
      explode(graft.functions.IndexExpr.ivfCells(
        col(vecCol).cast("array<double>"), bcC, nprobe, roundDp)).as("cell"))
    val scored = c.join(broadcast(q), "cell")
      .select(col("q_id"), col("c_id"),
        graft.functions.IndexExpr.adcDistance(
          col("qv"), col("codes"), bcB, roundDp).as("adist"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Encode a corpus to its persisted PQ codes table — the index-build
    * step: one codegen'd pass over the raw vectors, written next to the
    * corpus as (id, codes). Query jobs then use [[pqTopKOnCodes]] and
    * never touch the raw vectors again (the codes table is dim/m·8×
    * smaller, so at 100 TB of embeddings the scannable index is
    * RAM-cacheable). */
  /** Content hash of index state (codebooks / centroids), written into
    * every codes table as a constant column and re-checked at query
    * time: `Double.hashCode` is bit-based and the nested-array walk is
    * order-defined, so the value is deterministic across JVMs/runs for
    * identical state and differs for any retrain. */
  private def stateHash(a: Array[_]): Int =
    java.util.Arrays.deepHashCode(a.asInstanceOf[Array[AnyRef]])

  private def pqCodesFrame(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]], roundDp: Int): DataFrame =
    corpus.select(col(idCol),
      pqCodes(col(vecCol), codebooks, roundDp).as("codes"),
      // self-describing metadata (the writeBandedSignatures pattern —
      // RLE constant columns, free in parquet): an append under
      // retrained codebooks or a different roundDp would produce codes
      // that index the WRONG codewords — silently wrong neighbors, with
      // nothing else to catch it. Query paths validate these against
      // the caller's state before ranking.
      lit(codebooks.length).as("m"),
      lit(codebooks(0).length).as("ksub"),
      lit(roundDp).as("round_dp"),
      lit(stateHash(codebooks)).as("cb_hash"))

  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]], path: String,
      roundDp: Int = -1): Unit =
    pqCodesFrame(corpus, idCol, vecCol, codebooks, roundDp)
      .write.mode("overwrite").parquet(path)

  /** Append a NEW batch to an existing [[pqEncode]] codes table — the
    * daily-ingest step of the PQ index lifecycle: encode ONLY the batch
    * with the SAME frozen codebooks and parquet-append; queries keep
    * running [[pqTopKOnCodes]] over the grown table unchanged. Codes are
    * comparable across writes ONLY under the original build's codebooks
    * and roundDp — load them back via [[loadCodebooks]] rather than
    * retraining (a retrain renumbers centroids, silently corrupting ADC
    * distances on every previously-written row). */
  def pqEncodeAppend(newBatch: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]], path: String,
      roundDp: Int = -1): Unit =
    pqCodesFrame(newBatch, idCol, vecCol, codebooks, roundDp)
      .write.mode("append").parquet(path)

  /** Validate a persisted codes table's self-describing metadata against
    * the caller's index state — whole-table min/max probe over the RLE
    * constant columns (the bands-table pattern in [[graft.ops.Dedup]]):
    * a mixed or stale table (an append under retrained codebooks, a
    * different roundDp, or a pre-metadata write) fails loudly HERE
    * instead of silently ranking with codes that index the wrong
    * codewords. One extra two-to-five-column scan per query call — the
    * ranking below scans the same table anyway. */
  private def validateCodesTable(codes: DataFrame, what: String,
      codebooks: Array[Array[Array[Double]]], roundDp: Int,
      centroids: Option[Array[Array[Double]]]): Unit = {
    val expected: Seq[(String, Int)] = Seq(
      "m" -> codebooks.length, "ksub" -> codebooks(0).length,
      "round_dp" -> roundDp, "cb_hash" -> stateHash(codebooks)) ++
      centroids.map(c => "cent_hash" -> stateHash(c))
    val missing = expected.map(_._1).filterNot(codes.columns.contains)
    require(missing.isEmpty,
      s"$what: codes table lacks metadata column(s) ${missing.mkString(", ")}" +
        " — re-encode with pqEncode/ivfPqEncode (tables written before " +
        "the self-describing format must be rebuilt)")
    val aggs = expected.flatMap { case (c, _) => Seq(
      min(col(c).cast("int")), max(col(c).cast("int")),
      count(col(c).cast("int"))) }
    val r = codes.agg(count(lit(1)), aggs: _*).head()
    val total = r.getLong(0)
    if (total > 0) expected.zipWithIndex.foreach { case ((name, want), i) =>
      val mn = r.get(1 + i * 3)
      val mx = r.get(2 + i * 3)
      val cnt = r.getLong(3 + i * 3)
      require(cnt == total && mn == want && mx == want,
        s"$what: codes table $name is $mn..$mx over $cnt/$total rows but " +
          s"the caller's index state expects $want — the table mixes " +
          "writes from different index builds, or the caller loaded the " +
          "wrong codebooks/centroids; rebuild or load the matching state")
    }
  }

  /** [[pqTopK]] against an already-encoded corpus (a [[pqEncode]] codes
    * table): identical ranking, zero raw-vector reads. The table's
    * metadata is validated against `codebooks`/`roundDp` first —
    * rankings computed under mismatched index state are silently wrong,
    * never cheap. */
  def pqTopKOnCodes(
      codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int,
      roundDp: Int = -1): DataFrame = {
    validateCodesTable(codes, "pqTopKOnCodes", codebooks, roundDp, None)
    val c = codes.select(col(idCol).as("c_id"), col("codes"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"),
        adcDistance(col("qv"), col("codes"), codebooks, roundDp).as("adist"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Encode a corpus to its persisted IVF-PQ index table — (id, cell,
    * codes), the full production index-build step: one codegen'd pass
    * assigns every vector its coarse cell AND its PQ codes, written next
    * to the corpus. Query jobs then run [[ivfPqTopKOnCodes]] and never
    * read a raw vector: at 100 TB of embeddings the scannable index is
    * m bytes + an int per row. */
  def ivfPqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      path: String, roundDp: Int = -1): Unit =
    ivfPqCodesFrame(corpus, idCol, vecCol, centroids, codebooks, roundDp)
      .write.mode("overwrite").parquet(path)

  /** [[pqEncodeAppend]]'s IVF-PQ twin: encode ONLY the new batch (cell
    * assignment + codes, same frozen centroids/codebooks/roundDp as the
    * original [[ivfPqEncode]] build) and parquet-append to the index
    * table. Same freshness contract as pqEncodeAppend: retrained
    * centroids or codebooks renumber cells/codes and corrupt every
    * previously-written row — persist them with [[saveCentroids]] /
    * [[saveCodebooks]] at build time and load them back here. */
  def ivfPqEncodeAppend(newBatch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      path: String, roundDp: Int = -1): Unit =
    ivfPqCodesFrame(newBatch, idCol, vecCol, centroids, codebooks, roundDp)
      .write.mode("append").parquet(path)

  private def ivfPqCodesFrame(corpus: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], roundDp: Int): DataFrame = {
    validateCodebooks(codebooks)
    val bcC = bcOf(centroids)
    val bcB = bcOf(codebooks)
    corpus.select(col(idCol),
      graft.functions.IndexExpr.ivfCell(
        col(vecCol).cast("array<double>"), bcC, roundDp).as("cell"),
      graft.functions.IndexExpr.pqCodes(
        col(vecCol).cast("array<double>"), bcB, roundDp).as("codes"),
      // same self-describing contract as [[pqCodesFrame]], plus the
      // centroid hash: a retrained coarse quantizer renumbers cells,
      // which silently mis-probes every previously-written row
      lit(codebooks.length).as("m"),
      lit(codebooks(0).length).as("ksub"),
      lit(roundDp).as("round_dp"),
      lit(stateHash(codebooks)).as("cb_hash"),
      lit(stateHash(centroids)).as("cent_hash"))
  }

  /** [[ivfPqTopK]] against an already-encoded (id, cell, codes) index
    * table: identical ranking, zero raw-vector reads on the corpus side.
    * Only the broadcast-small query side carries raw vectors (cell
    * probes + ADC are query-side work against the broadcast index
    * state). */
  def ivfPqTopKOnCodes(
      codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      k: Int, nprobe: Int = 1, roundDp: Int = -1): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe must be in [1, ${centroids.length}], got $nprobe")
    validateCodebooks(codebooks)
    validateCodesTable(codes, "ivfPqTopKOnCodes", codebooks, roundDp,
      Some(centroids))
    val bcC = bcOf(centroids)
    val bcB = bcOf(codebooks)
    val c = codes.select(col(idCol).as("c_id"), col("cell"), col("codes"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"),
      explode(graft.functions.IndexExpr.ivfCells(
        col(vecCol).cast("array<double>"), bcC, nprobe, roundDp)).as("cell"))
    val scored = c.join(broadcast(q), "cell")
      .select(col("q_id"), col("c_id"),
        graft.functions.IndexExpr.adcDistance(
          col("qv"), col("codes"), bcB, roundDp).as("adist"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Persist trained PQ codebooks as a tiny (s, code, codeword) parquet
    * table (the [[saveCentroids]] pattern); [[loadCodebooks]] restores
    * the dense (m, ksub) layout and validates it. */
  def saveCodebooks(spark: org.apache.spark.sql.SparkSession,
      codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    (for { s <- codebooks.indices; c <- codebooks(s).indices }
      yield (s, c, codebooks(s)(c).toSeq)).toDF("s", "code", "codeword")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path)
      .select(col("s").cast("int"), col("code").cast("int"),
        col("codeword").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"no codebooks at $path")
    val bySub = rows.groupBy(_._1)
    require(bySub.keySet == bySub.keySet.min.to(bySub.keySet.max).toSet &&
      bySub.keySet.min == 0,
      s"codebook subspaces at $path are not a dense 0..${bySub.size - 1} range")
    val out = (0 until bySub.size).map { s =>
      val cws = bySub(s).sortBy(_._2)
      require(cws.map(_._2).toSeq == cws.indices.toSeq,
        s"subspace $s codes at $path are not a dense 0..${cws.length - 1} range")
      cws.map(_._3)
    }.toArray
    // a corrupt table with ragged codewords or uneven ksub would
    // otherwise silently compute wrong distances (dsub derives from
    // codebooks(0)(0) alone)
    validateCodebooks(out)
    out
  }

  /** Symmetric per-vector int8 scalar quantization: codes[i] =
    * round(v[i]·127/scale) with scale = max|v[i]| — 8× smaller than
    * float64 components with bounded error (|recon−x| ≤ scale/254), the
    * standard compression for RAM-resident exact-rerank tables when PQ's
    * loss is too coarse. Rounding is floor(x+0.5) (round-half-up) rather
    * than ROUND so both JVM and SQL engines agree on every half-step
    * boundary. Returns struct(codes array<int>, scale double). */
  def quantizeInt8(vecCol: Column): Column =
    graft.functions.ArrayMath.quantizeInt8(vecCol.cast("array<double>"))

  /** Inverse of [[quantizeInt8]]: recon[i] = codes[i]·scale/127. */
  def dequantizeInt8(quantCol: Column): Column =
    transform(quantCol.getField("codes"),
      c => c * quantCol.getField("scale") / 127)

  /** Two-phase int8 ANN: rank by the QUANTIZED cosine first (pure
    * integer corpus-side arithmetic — the per-vector scale cancels out
    * of cosine, so the prefilter never touches a corpus double), keep
    * the top `mult·k` per query, then exact-rerank only those survivors
    * with the fused [[graft.functions.MathFunctions.cosineSim]].
    *
    * 100 TB shape: the phase-1 scan reads d bytes/row instead of 8d
    * (the int8 codes table is the RAM-resident index; at production the
    * codes come from a persisted table like [[pqEncode]]'s) and the
    * expensive exact cosine runs on mult·k rows per query, not n. The
    * approximate score is rounded to `roundDp` before ranking (ties to
    * lowest id) so the candidate CUT is cross-engine exact — making the
    * whole two-phase ranking DuckDB-reproducible (q102). */
  def int8TopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, mult: Int = 4, roundDp: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(mult >= 1, s"mult must be >= 1, got $mult")
    val cv = col(vecCol).cast("array<double>")
    val c = corpus.select(col(idCol).as("c_id"), cv.as("cv"),
      quantizeInt8(cv).getField("codes").cast("array<double>").as("codes"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
    import graft.functions.ArrayMath
    // cos(q, dequant(c)) = Σqᵢcᵢ·(s/127) / (|q| · (s/127)·√Σcᵢ²): the
    // scale cancels — quantized cosine needs only the integer codes.
    // The divisor is guarded (null for a zero-norm side): under ANSI
    // mode (Spark 4 default) a bare `/` THROWS on 0/0 instead of
    // producing the NaN the filter below would catch.
    val denom = sqrt(ArrayMath.dot(col("qv"), col("qv"))) *
      sqrt(ArrayMath.dot(col("codes"), col("codes")))
    val approx = round(
      when(denom =!= 0.0,
        ArrayMath.dot(col("qv"), col("codes")) / denom), roundDp)
    val w1 = Window.partitionBy(col("q_id")).orderBy(col("acos").desc, col("c_id").asc)
    val cands = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"), col("qv"), col("cv"), approx.as("acos"))
      .filter(col("acos").isNotNull && !isnan(col("acos"))) // zero-norm guard
      .withColumn("ark", row_number().over(w1)).filter(col("ark") <= mult * k)
    val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    cands
      .select(col("q_id"), col("c_id"),
        // rank on the ROUNDED exact cosine (ties to lowest id) so the
        // final cut is cross-engine exact too — same rule as phase 1
        round(graft.functions.MathFunctions.cosineSim(col("qv"), col("cv")),
          roundDp).as("cos"))
      .filter(!isnan(col("cos"))) // NaN sorts first in DESC — zero-norm guard
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("c_id"), col("cos"))
  }

  /** Two-phase JL-projected ANN: rank every (query, corpus) pair on the
    * cosine of their [[randomProject]] shadows (toDim components instead
    * of dim — the phase-1 scan reads/computes toDim/dim of the work),
    * keep the top `mult`·k per query, then rerank survivors on the exact
    * full-dimension cosine.
    *
    * Regime honesty — when the shadow prefilter works: JL preserves
    * distances within 1±ε for ε ≈ √(log n / toDim), so the shadow can
    * only separate neighbors whose cosine GAPS exceed ε. Real embedding
    * corpora (low intrinsic dimension, cluster structure) clear that
    * bar at toDim 8–32 — the recall spec measures ≥0.9 on clustered
    * data. An ISOTROPIC corpus (uniform random directions, all pairwise
    * cosines ≈ 0 ± 1/√dim) is the worst case: no projection can rank
    * what full precision barely separates, and recall degrades to the
    * candidate-pool fraction. Size toDim to the corpus, not the table.
    * Same zero-norm and rounded-tie discipline as [[int8TopK]] — both
    * phases cross-engine exact at fixed planes. */
  def jlTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      fromDim: Int, toDim: Int, k: Int, mult: Int = 4,
      seed: Option[Long] = None, roundDp: Int = 6): DataFrame =
    shadowTopK(corpus, queries, idCol, vecCol,
      randomProject(col(vecCol), fromDim, toDim, seed, roundDp), k, mult, roundDp)

  /** The shared two-phase shadow pipeline behind [[jlTopK]] and
    * [[pcaTopK]]: rank on the cosine of a cheap projection, keep
    * `mult`·k per query, rerank survivors on the exact full-dimension
    * cosine. `proj` must be the SAME column expression for both sides
    * (one broadcast plane/rotation handle). */
  private def shadowTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      proj: Column, k: Int, mult: Int, roundDp: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(mult >= 1, s"mult must be >= 1, got $mult")
    val c = corpus.select(col(idCol).as("c_id"),
      col(vecCol).cast("array<double>").as("cv"), proj.as("cp"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"), proj.as("qp"))
    import graft.functions.MathFunctions.cosineSim
    val w1 = Window.partitionBy(col("q_id")).orderBy(col("acos").desc, col("c_id").asc)
    val cands = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"), col("qv"), col("cv"),
        round(cosineSim(col("qp"), col("cp")), roundDp).as("acos"))
      .filter(!isnan(col("acos"))) // zero-norm shadow guard
      .withColumn("ark", row_number().over(w1)).filter(col("ark") <= mult * k)
    val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    cands
      .select(col("q_id"), col("c_id"),
        round(cosineSim(col("qv"), col("cv")), roundDp).as("cos"))
      .filter(!isnan(col("cos")))
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("c_id"), col("cos"))
  }

  /** Train a PCA projection: the top-`toDim` principal directions of
    * the corpus embedding distribution, as a toDim×dim rotation for
    * [[graft.functions.IndexExpr.projectVec]] / [[pcaTopK]]. Where
    * [[randomProject]] is DATA-OBLIVIOUS (JL: any toDim that beats the
    * log n / ε² bound), PCA spends one training pass to align the
    * shadow with the directions the corpus actually varies in — on
    * low-intrinsic-dimension embedding corpora that buys the same
    * recall at a smaller toDim (the PcaSpec comparison measures it).
    *
    * 100 TB shape: ONE pass accumulating n, Σx, and the upper triangle
    * of Σxxᵀ — O(d²) state (d = embedding width, so ~MB for d ≤ 1024,
    * the [[trainOpqRotation]] discipline); the eigendecomposition is a
    * driver-side Breeze `eigSym` on the d×d covariance. Determinism:
    * partials combine in PARTITION-INDEX ORDER
    * ([[graft.linalg.Kernels.orderedRddAggregate]] — r15's
    * `treeAggregate` merged in task-completion order, the same
    * last-ulp seed-determinism gap the IVF trainer carried until its
    * r15 fix; VERDICT r15 #1 ported this trainer to the ordered fold,
    * pinned by TrainerDeterminismSpec), and eigenvector SIGNS are
    * pinned by convention (largest-|component| coordinate made
    * positive, first index on ties).
    *
    * `center = false` (default) computes directions of raw second
    * moments — the right choice when the projection feeds COSINE
    * ranking, which is origin-anchored (centering would shift vectors
    * off the unit sphere and break cosine comparability between shadow
    * and full space). `center = true` gives textbook covariance PCA for
    * feature-analysis uses. */
  def trainPcaProjection(corpus: DataFrame, vecCol: String, dim: Int,
      toDim: Int, center: Boolean = false): Array[Array[Double]] = {
    require(dim >= 1 && toDim >= 1 && toDim <= dim,
      s"need 1 <= toDim <= dim, got toDim=$toDim dim=$dim")
    val tri = dim * (dim + 1) / 2
    val acc = graft.linalg.Kernels.orderedRddAggregate(
      corpus.select(col(vecCol).cast("array<double>").as("__v"))
        .rdd.map(_.getSeq[Double](0)))(
        () => new Array[Double](1 + dim + tri))(
        (a, xs) => {
          if (xs == null || xs.length != dim)
            throw new IllegalArgumentException(
              "trainPcaProjection: expected dense length-" + dim +
                " vectors, got " + (if (xs == null) "null" else s"length ${xs.length}"))
          val x = xs.toArray
          a(0) += 1.0
          var i = 0
          while (i < dim) { a(1 + i) += x(i); i += 1 }
          i = 0
          while (i < dim) {
            val xi = x(i)
            // upper-tri offset of (i, i): rows 0..i-1 contribute
            // (dim - r) entries each
            var o = 1 + dim + i * dim - i * (i - 1) / 2
            var j = i
            while (j < dim) { a(o) += xi * x(j); j += 1; o += 1 }
            i += 1
          }
          a
        },
        (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        }).getOrElse(new Array[Double](1 + dim + tri))
    val n = acc(0)
    require(n >= 2.0,
      s"trainPcaProjection: need >= 2 training vectors, got ${n.toLong}")
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var o = 1 + dim + i * dim - i * (i - 1) / 2
      var j = i
      while (j < dim) {
        var v = acc(o) / n
        if (center) v -= (acc(1 + i) / n) * (acc(1 + j) / n)
        cov(i, j) = v; cov(j, i) = v
        j += 1; o += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    Array.tabulate(toDim) { r =>
      val colIdx = dim - 1 - r // r-th largest eigenvalue
      val v = Array.tabulate(dim)(d => es.eigenvectors(d, colIdx))
      // sign convention: the largest-|component| coordinate (first index
      // on ties) is made positive, so the rotation is a pure function of
      // the covariance
      var best = 0
      var d = 1
      while (d < dim) { if (math.abs(v(d)) > math.abs(v(best))) best = d; d += 1 }
      if (v(best) < 0) v.map(-_) else v
    }
  }

  /** [[jlTopK]] with a LEARNED shadow: phase 1 ranks on the cosine of
    * the [[trainPcaProjection]] rotation's output (via the broadcast
    * [[graft.functions.ProjectVec]] kernel, plan O(1) in toDim·dim),
    * phase 2 reranks the `mult`·k survivors exactly. Same regime
    * honesty as jlTopK — PCA only moves the toDim-vs-recall tradeoff,
    * it cannot rank what full precision barely separates. */
  def pcaTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      rotation: Array[Array[Double]], k: Int, mult: Int = 4,
      roundDp: Int = 6): DataFrame = {
    require(rotation.nonEmpty && rotation.forall(_.length == rotation.head.length),
      "pcaTopK: rotation must be a non-empty rectangular matrix")
    shadowTopK(corpus, queries, idCol, vecCol,
      graft.functions.IndexExpr.projectVec(
        col(vecCol).cast("array<double>"), bcOf(rotation), roundDp),
      k, mult, roundDp)
  }

  /** Train per-subspace PQ codebooks: Lloyd k-means on each of the `m`
    * subvector slices, reusing [[trainIvfCentroids]]'s seeded
    * ordered-fold trainer (bit-deterministic per seed since the r15
    * IVF fix — this trainer inherited it transitively; subspace `s`
    * seeds `seed + s` so subspaces are independent). `m` passes over the
    * corpus — acceptable because m is small (4–16) and training happens
    * once per index build; the per-pass reduction state is O(ksub·dsub)
    * driver-held, like the IVF trainer. */
  def trainPqCodebooks(corpus: DataFrame, vecCol: String, dim: Int,
      m: Int, ksub: Int, iters: Int = 5,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = corpus.select(
        slice(col(vecCol).cast("array<double>"), s * dsub + 1, dsub).as("__sv"))
      trainIvfCentroids(sub, "__sv", ksub, iters, seed + s)
    }.toArray
  }

  /** Apply a learned d×d rotation to an embedding column: out = R·v,
    * with `rotation(j)` the j-th OUTPUT component's weights — exactly
    * [[graft.functions.ProjectVec]]'s plane layout (its scaladoc already
    * positions it as the rotation-apply step), so the rotation ships as
    * ONE broadcast and the projection is a fused codegen'd loop with an
    * O(1) plan. */
  def rotateVec(vecCol: Column, rotation: Array[Array[Double]],
      roundDp: Int = -1): Column = {
    require(rotation.nonEmpty, "empty rotation matrix")
    graft.functions.IndexExpr.projectVec(
      vecCol.cast("array<double>"), bcOf(rotation), roundDp)
  }

  /** OPQ-style learned rotation for PQ (Ge et al., CVPR 2013, "Optimized
    * Product Quantization" — the non-parametric alternation): PQ's
    * subspace independence assumption fails when variance is unevenly
    * spread across the fixed coordinate split (a clustered corpus
    * concentrates energy in a few directions, so some subspaces carry
    * everything and quantize poorly). OPQ learns an orthogonal R and
    * quantizes R·x instead, alternating:
    *
    *  (a) train PQ codebooks on the rotated corpus ([[trainPqCodebooks]]);
    *  (b) with codes fixed, the optimal rotation is the orthogonal
    *      Procrustes solution min_R Σ‖R·xᵢ − yᵢ‖² (yᵢ = the quantized
    *      reconstruction of R·xᵢ): R = V·Uᵀ from the SVD U·S·Vᵀ of the
    *      correlation M = Σ xᵢ·yᵢᵀ.
    *
    * 100 TB shape: step (b)'s only distributed work is M — one
    * ordered-fold pass accumulating a d×d outer product per row (the
    * [[trainIvfCentroids]] pattern; driver state is O(d²), never O(n));
    * the SVD runs driver-side on the d×d matrix (breeze, shipped with
    * Spark). Training is the amortized index-build step; per-query cost
    * of [[opqTopK]] is plain PQ plus one broadcast-rotation projection.
    *
    * Returns (rotation, codebooks) trained AS A PAIR — the final
    * codebooks are fit to the final rotation (the loop ends on (a), not
    * (b), so the pair is never stale). Deterministic for a fixed seed.
    *
    * Pass the SAME `roundDp` you will query with ([[opqTopK]]'s): the
    * reconstruction step encodes through the shared quantizer at this
    * roundDp, so training optimizes against exactly the codes the query
    * path will assign (a near-tie subspace can encode differently under
    * rounded vs unrounded argmin). */
  def trainOpqRotation(
      corpus: DataFrame, vecCol: String, dim: Int, m: Int, ksub: Int,
      iters: Int = 5, opqIters: Int = 3, seed: Long = 42L,
      roundDp: Int = -1)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(opqIters >= 1, s"opqIters must be >= 1, got $opqIters")
    val raw = corpus.select(col(vecCol).cast("array<double>").as("__v"))
    raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var rot = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
      var cbs: Array[Array[Array[Double]]] = null
      var it = 0
      while (it < opqIters) {
        val rotated = raw.select(rotateVec(col("__v"), rot, roundDp).as("__rv"))
        cbs = trainPqCodebooks(rotated, "__rv", dim, m, ksub, iters, seed)
        if (it < opqIters - 1)
          rot = procrustes(correlation(raw, rot, cbs, dim, roundDp))
        it += 1
      }
      (rot, cbs)
    } finally { raw.unpersist(false); () }
  }

  /** [[pqTopK]] in the learned rotated space: both sides rotate through
    * the shared broadcast R (rotation is an isometry, so ADC in rotated
    * coordinates approximates the ORIGINAL squared L2), then the
    * standard codes-scan ranking. */
  def opqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      rotation: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      k: Int, roundDp: Int = -1): DataFrame = {
    validateCodebooks(codebooks)
    val bcR = bcOf(rotation) // ONE handle for both sides
    def rotated(df: DataFrame): DataFrame =
      df.select(col(idCol), graft.functions.IndexExpr.projectVec(
        col(vecCol).cast("array<double>"), bcR, roundDp).as("__opq_rv"))
    pqTopK(rotated(corpus), rotated(queries), idCol, "__opq_rv",
      codebooks, k, roundDp)
  }

  /** The OPQ correlation M = Σ xᵢ·yᵢᵀ (x = raw row, y = quantized
    * reconstruction of R·x): one pass with O(d²) state, partials
    * combined in partition-index order
    * ([[graft.linalg.Kernels.orderedRddAggregate]] — the r15
    * `treeAggregate` merged in task-completion order, so same-seed
    * rotations drifted in the last ulp; VERDICT r15 #1, pinned by
    * TrainerDeterminismSpec). */
  private def correlation(raw: DataFrame, rot: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]], dim: Int,
      roundDp: Int): Array[Array[Double]] = {
    val sc = raw.sparkSession.sparkContext
    val bcR = sc.broadcast(rot)
    val bcB = sc.broadcast(cbs)
    val flat = graft.linalg.Kernels.orderedRddAggregate(
      raw.rdd.map(_.getSeq[Double](0).toArray))(
        () => Array.ofDim[Double](dim * dim))(
        (acc, x) => {
          // round each rotated COMPONENT exactly as the query path does
          // (rotateVec → ProjectVec rounds before encoding): a near-tie
          // subspace must encode to the same codeword here as in
          // opqTopK, or Procrustes optimizes against codes the query
          // path never assigns
          val rx = applyRotation(bcR.value, x)
          var r = 0
          while (r < rx.length) {
            rx(r) = graft.functions.IndexExpressions.roundTo(roundDp, rx(r))
            r += 1
          }
          val y = reconstructRotated(bcB.value, rx, roundDp)
          var i = 0
          while (i < dim && i < x.length) {
            val xi = x(i); var j = 0
            while (j < dim) { acc(i * dim + j) += xi * y(j); j += 1 }
            i += 1
          }
          acc
        },
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
      .getOrElse(Array.ofDim[Double](dim * dim))
    bcR.destroy(); bcB.destroy()
    Array.tabulate(dim, dim)((i, j) => flat(i * dim + j))
  }

  /** Driver/executor-side R·x (same layout as [[rotateVec]]). */
  private def applyRotation(rot: Array[Array[Double]],
      x: Array[Double]): Array[Double] = {
    val out = new Array[Double](rot.length)
    var j = 0
    while (j < rot.length) {
      val row = rot(j); val n = math.min(row.length, x.length)
      var s = 0.0; var i = 0
      while (i < n) { s += row(i) * x(i); i += 1 }
      out(j) = s; j += 1
    }
    out
  }

  /** Quantized reconstruction in rotated space: encode through the SAME
    * quantizer the query path uses ([[graft.functions.IndexExpressions
    * .pqEncode]] — one argmin implementation, shared so training cannot
    * diverge from [[opqTopK]]'s codes — at the caller's `roundDp`, via
    * the Array overload: no per-row ArrayData copy in the hot loop),
    * then place each codeword. */
  private def reconstructRotated(cbs: Array[Array[Array[Double]]],
      rx: Array[Double], roundDp: Int): Array[Double] = {
    val codes = graft.functions.IndexExpressions.pqEncode(cbs, rx, roundDp)
    val dsub = cbs(0)(0).length
    val out = new Array[Double](rx.length)
    var s = 0
    while (s < codes.length && s * dsub < rx.length) {
      val cw = cbs(s)(codes(s))
      val off = s * dsub
      val n = math.min(dsub, rx.length - off)
      var i = 0
      while (i < n) { out(off + i) = cw(i); i += 1 }
      s += 1
    }
    out
  }

  /** Orthogonal Procrustes: R = V·Uᵀ for M = U·S·Vᵀ — the rotation
    * maximizing tr(R·M), i.e. minimizing Σ‖R·x − y‖² over orthogonal R.
    * d×d driver-side SVD (breeze ships on Spark's classpath). */
  private def procrustes(mMat: Array[Array[Double]]): Array[Array[Double]] = {
    val d = mMat.length
    val bm = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => mMat(i)(j))
    val s = breeze.linalg.svd(bm)
    val r = s.Vt.t * s.U.t
    Array.tabulate(d, d)((i, j) => r(i, j))
  }

  /** One Lloyd refinement step over an existing centroid table, in the
    * DataFrame plane: assign each corpus vector to its nearest cell
    * ([[ivfCell]] — the codegen'd literal-table argmin), then recompute
    * each cell's mean via [[groupCentroids]] (decimal-exact sums, no
    * driver aggregation beyond collecting the k·d result). Cells that
    * captured no vectors keep their old centroid — same rule as
    * [[trainIvfCentroids]]. The maintenance path for a long-lived IVF
    * index: cheaper than retraining (`treeAggregate` from scratch) when
    * the corpus drifts incrementally, and usable at any cadence because
    * each call is a single pass. */
  def refineCentroids(corpus: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): Array[Array[Double]] = {
    require(centroids.nonEmpty, "empty centroid table")
    val assigned = corpus.select(
      ivfCell(col(vecCol), centroids).as("__cell"),
      col(vecCol).cast("array<double>").as("__v"))
    val means = groupCentroids(assigned, col("__cell"), col("__v"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .toMap
    centroids.indices.map(c => means.getOrElse(c, centroids(c))).toArray
  }

  /** Per-group mean embedding, fully distributed — the centroid refresh
    * for IVF cell maintenance, cluster summaries, and per-source
    * embedding drift monitoring. Unlike [[trainIvfCentroids]] (whose
    * k·d centroid matrix is driver-held by design), nothing here touches
    * the driver: posexplode to (group, pos, value), component sums in
    * exact decimal (order-independent, so the result is deterministic
    * under any partitioning and bit-identical cross-engine), mean via a
    * single IEEE division, arrays reassembled in position order.
    *
    * 100 TB shape: two key-grouped shuffles of SCALAR components (never
    * whole vectors); intermediate cardinality is |groups|·dim.
    * `sumScale` trades digits for headroom: the decimal sum converts to
    * double exactly while its unscaled value stays under 2^53, i.e.
    * while the largest group holds < 2^53/10^sumScale ≈ 9·10^8 rows of
    * |value| ≤ 1 at the default 7; lower `sumScale` for larger groups
    * (each step of 1 buys 10× the rows at one fewer exact digit). */
  def groupCentroids(emb: DataFrame, groupCol: Column,
      vecCol: Column, sumScale: Int = 7): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = emb.select(groupCol.as("group"),
        posexplode(vecCol.cast("array<double>")).as(Seq("pos", "v")))
    e.groupBy(col("group"), col("pos"))
      // count(v), not count(lit(1)): sum() skips NULL elements, so a
      // row-count denominator silently deflates the mean on any corpus
      // with null vector elements — AVG semantics (skip nulls on both
      // sides of the division) is what every SQL engine computes
      .agg(sum(col("v").cast(DecimalType(38, sumScale))).cast("double").as("s"),
        count(col("v")).as("n"))
      .select(col("group"), col("pos"), (col("s") / col("n")).as("m"))
      .groupBy(col("group"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("centroid"))
  }
}
