package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Realistic-τ semantic-dedup fixture family (VERDICT r11 #3).
  *
  * Every recorded semdedup scale row runs the dense τ=0.3 synthetic
  * (~26 candidate edges per vector — 52.1M edges at sf100); SemDeDup's
  * operating point is τ≈0.95 over a CLUSTERED embedding corpus
  * (arXiv:2303.09540 §3 — k-means cells, dedup within cells). This
  * generator plants ground truth the engine must recover:
  *
  *  - CLUSTERED background: `G = autoCellCount(n)` unit cluster centers
  *    (matching the production cell-count discipline so trained cells
  *    align ≈1:1 with true clusters); point i = normalize(center(i%G) +
  *    σ·g_i) with σ=0.7 — measured max within-cluster background cosine
  *    ≈0.89 over 8M sampled pairs, comfortably BELOW τ=0.95, so the
  *    background contributes ZERO candidate edges.
  *  - PLANTED duplicates: ids [0, m) are perturbed copies of ids
  *    [m, 2m) at EXACT cosine 0.97 (orthogonalized noise: v′ =
  *    normalize(v + δ·u⊥), cos(v′,v) = 1/√(1+δ²)) — comfortably ABOVE
  *    τ, so the candidate set must be exactly the planted pairs that
  *    share a trained cell (measured co-assignment ≈99% at 256/cell).
  *
  * Everything is a pure deterministic function of (seed, id) — no
  * state, no shuffle: generation is one `spark.range(n)` projection,
  * so a 2M-vector sf100-shape fixture is a single linear pass.
  *
  * Usage:
  *   sbt "runMain graft.examples.SemDedupFixture gen <outDir> <n> <m> [seed]"
  *   SPARK_GRAFT_SEMDEDUP_TAU=0.95 \
  *     sbt "runMain graft.examples.SemDedupFixture check <dir>"
  *
  * `gen` writes embeddings.parquet (vec_id, embedding float[64], label)
  * and planted_pairs.parquet (id1, id2). `check` materializes the
  * q143/q144 sidecars at the CURRENT τ (set the env!) and gates, in
  * one pass: zero false-positive candidates (every candidate edge is a
  * planted pair), zero same-cell planted pairs missed (the exact-regime
  * invariant on the ground truth), and reports recall = recovered/m
  * (the shortfall is exactly the cell-straddle count — a geometry
  * property of coarse quantization, not a candidate-generation bug;
  * SemDedupFixtureSpec pins it ≥ 0.9 at spec scale — the enforced
  * gate; measured single-probe recall at 2M vectors is 0.99536,
  * ROUND12.md §3). */
object SemDedupFixture {

  val Dim = 64
  val Sigma = 0.7
  val PlantedCos = 0.97

  private def rng(seed: Long, tag: Long, i: Long): java.util.SplittableRandom =
    new java.util.SplittableRandom(
      java.lang.Long.rotateLeft(seed, 17)
        ^ (tag * 0x9E3779B97F4A7C15L) ^ (i * 0xBF58476D1CE4E5B9L))

  private def gauss(r: java.util.SplittableRandom): Array[Double] =
    Array.fill(Dim)(r.nextGaussian())

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < Dim) { s += v(i) * v(i); i += 1 }
    val inv = 1.0 / math.sqrt(s)
    v.map(_ * inv)
  }

  private def axpy(a: Array[Double], t: Double, b: Array[Double]): Array[Double] = {
    val out = new Array[Double](Dim)
    var i = 0
    while (i < Dim) { out(i) = a(i) + t * b(i); i += 1 }
    out
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < Dim) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Background point: unit cluster center + σ·noise, renormalized.
    * Noise components are N(0, 1/Dim) so E‖noise‖ ≈ 1 and σ is the
    * relative spread — the knob the 0.89-max measurement fixed. */
  private def basePoint(id: Long, nClusters: Int, seed: Long): Array[Double] = {
    val c = normalize(gauss(rng(seed, 1L, id % nClusters)))
    val g = gauss(rng(seed, 2L, id)).map(_ / math.sqrt(Dim.toDouble))
    normalize(axpy(c, Sigma, g))
  }

  /** The deterministic per-id vector. ids [0,m): planted duplicate of
    * partner m+id at exact cosine [[PlantedCos]]; ids [m,n): background. */
  def vectorFor(id: Long, m: Long, nClusters: Int, seed: Long): Array[Float] = {
    val v =
      if (id < m) {
        val b = basePoint(m + id, nClusters, seed)
        val u = gauss(rng(seed, 3L, id))
        val uperp = axpy(u, -dot(u, b), b)
        // δ: cos(normalize(b + δ·û⊥), b) = 1/√(1+δ²) = PlantedCos exactly
        val delta = math.sqrt(1.0 / (PlantedCos * PlantedCos) - 1.0)
        normalize(axpy(b, delta, normalize(uperp)))
      } else basePoint(id, nClusters, seed)
    v.map(_.toFloat)
  }

  def generate(spark: SparkSession, outDir: String, n: Long, m: Long,
      seed: Long): Unit = {
    require(2 * m <= n, s"need 2m <= n (m=$m pairs over n=$n vectors)")
    val nClusters = graft.ops.Similarity.autoCellCount(n)
    import spark.implicits._
    spark.range(0, n, 1, 32)
      .map { id =>
        (id, vectorFor(id, m, nClusters, seed), if (id < m) 1 else 0)
      }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    spark.range(0, m)
      .select(col("id").as("id1"), (col("id") + m).as("id2"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/planted_pairs.parquet")
  }

  /** Ground-truth gate over a generated fixture dir at the current
    * SPARK_GRAFT_SEMDEDUP_TAU. Returns (falsePositives, missedSameCell,
    * recovered, planted) and prints one JSON line. */
  def check(spark: SparkSession, dir: String): (Long, Long, Long, Long) = {
    import graft.queries.SimilarityQueries
    require(SimilarityQueries.SemDedupTau > 0.9,
      s"check expects the realistic-τ regime (SPARK_GRAFT_SEMDEDUP_TAU≈0.95, " +
        s"got ${SimilarityQueries.SemDedupTau}): at the dense default the " +
        "background itself legitimately produces edges and the planted set " +
        "is not the ground truth")
    SimilarityQueries.semDedupSidecars(spark, dir)
    val base = SimilarityQueries.sidecarBase(dir)
    val cand = spark.read.parquet(s"$base/q143_candidates.parquet")
    val cents = graft.ops.Similarity.loadCentroids(
      spark, s"$base/q143_centroids.parquet")
    val planted = spark.read.parquet(s"$dir/planted_pairs.parquet")
    val cellOf = graft.ops.Similarity.ivfCell(
      col("embedding").cast("array<double>"), cents, roundDp = 6)
    val cells = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), cellOf.as("cell"))
    val plantedCells = planted
      .join(cells.withColumnRenamed("vec_id", "id1")
        .withColumnRenamed("cell", "c1"), "id1")
      .join(cells.withColumnRenamed("vec_id", "id2")
        .withColumnRenamed("cell", "c2"), "id2")
    val sameCell = plantedCells.filter(col("c1") === col("c2"))
      .select("id1", "id2")
    val fp = cand.join(planted, Seq("id1", "id2"), "left_anti").count()
    val missed = sameCell.join(cand, Seq("id1", "id2"), "left_anti").count()
    val recovered = cand.join(planted, Seq("id1", "id2"), "left_semi").count()
    val nPlanted = planted.count()
    println(
      s"""{"fixture": "$dir", "tau": ${SimilarityQueries.SemDedupTau}, """ +
        s""""planted": $nPlanted, "recovered": $recovered, """ +
        s""""false_positives": $fp, "missed_same_cell": $missed, """ +
        s""""recall": ${recovered.toDouble / math.max(1L, nPlanted)}}""")
    (fp, missed, recovered, nPlanted)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0) match {
      case "gen" =>
        val seed = if (args.length > 4) args(4).toLong else 7L
        generate(spark, args(1), args(2).toLong, args(3).toLong, seed)
      case "check" =>
        val (fp, missed, _, _) = check(spark, args(1))
        if (fp != 0 || missed != 0) sys.exit(1)
      case other => sys.error(s"unknown mode '$other' (gen|check)")
    }
    spark.stop()
  }
}
