package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline (bench-flagged) queries against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A GLM fit benchmark is
  * included as `glm_fit` — the reference's headline number (BASELINE.md:
  * 57.7 s admm logistic fit at ~6×10⁵ rows) maps to the same row count
  * at sf0.1. */
object Bench {

  /** Selection predicate for SPARK_GRAFT_BENCH_ONLY. Exact-name match by
    * default; a trailing `*` opts into prefix matching (`glm_fit*` runs
    * glm_fit AND glm_fit_sparse; bare `glm_fit` runs only glm_fit —
    * plain prefixing made `--only glm_fit` silently time two fits).
    * None (env unset) selects everything. Pure — BenchOnlySpec pins it. */
  def onlyMatches(name: String, only: Option[Seq[String]]): Boolean =
    only.forall(_.exists { pat =>
      if (pat.endsWith("*")) name.startsWith(pat.dropRight(1))
      else name == pat
    })

  /** Every bench row that is NOT a registry query — the single source
    * for (a) the empty-filter guard, (b) its "valid rows" error listing,
    * and (c) the headline-total exclusion set [[extraRows]]. One list so
    * adding a row can't desynchronize the three (ADVICE r11); must match
    * the onlyMatches if-blocks in main. BenchOnlySpec pins the set. */
  val nonRegistryRows: Seq[String] = Seq("semdedup_k64", "charlm_score",
    "bpe_encode", "gopher_gate", "glm_fit", "glm_fit_sparse")

  /** Rows excluded from the headline total: everything added AFTER the
    * r5/r6 baseline totals, so the total stays comparable round-over-
    * round. glm_fit is NOT a registry query but is grandfathered in —
    * part of every recorded total since r1. */
  val extraRows: Set[String] = nonRegistryRows.toSet - "glm_fit"

  /** 1-minute system load average (or -1 when the JVM can't read it).
    * Recorded at bench start/end (VERDICT r11 #6): the r10→r11 total
    * drifted +11.7% with zero timed-path changes — a loaded co-tenant
    * box. With load in the JSON, a drifted run identifies itself. */
  def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg()
    // threshold 1.0, not 4.0: BENCH_r12 started at load 2.2 — under the
    // old gate — and drifted +20-35% on a third of its rows vs the
    // same-tree quiet-box run (VERDICT r12 #1). On a 32-core box ANY
    // standing load means a co-tenant; flag it and force per-row re-runs.
    val loaded = loadStart > 1.0
    if (loaded)
      System.err.println(f"[bench] WARNING: 1-min load average $loadStart%.1f " +
        "at start — timings will be contaminated; prefer a quiet box " +
        "(every row will be re-sampled once and ship both rep arrays)")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      // the dedup paths persist their band frames (keyed by plan in the
      // cache manager), so a second rep of the same query would read the
      // first rep's cache and time only the warm path — clear between
      // samples so every rep pays the full cost it claims to measure
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(100)
      val t0 = System.nanoTime()
      // a failing query must FAIL the bench (non-zero exit, no JSON), not
      // record its elapsed-to-failure as a timing — a swallowed error
      // here reads as a speedup in the round-over-round comparison
      f
      (System.nanoTime() - t0) / 1e9
    }

    // Median-of-N plus min plus the RAW samples in run order: the median
    // absorbs one bad sample; the min is the contamination-free floor
    // (closest to what an isolated run measures); the run-order samples
    // make contamination self-evident without a re-run — a [4.5, 14.9,
    // 15.1] row says "the first rep was clean and the JVM then degraded",
    // where a bare median 14.9 reads as a regression.
    def timeStats(reps: Int)(f: => Unit): (Double, Double, Array[Double]) = {
      require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
      // Settle ONCE per query, before its rep sequence: collect the
      // previous QUERY's garbage so a heavy neighbor (q87's propagation
      // rounds, q80's band frames) doesn't bill its young-gen debt to
      // this query's samples — r5 showed 3-5x phantom "regressions" on
      // sub-second queries from exactly that cross-query contamination.
      // Deliberately NOT per rep: a full GC also drops warm JVM state
      // (JIT profiles / soft-referenced scan machinery), and per-rep GC
      // made every rep pay a ~0.3s cold-start tax on q01 (measured r7:
      // 1.33s median per-rep-GC vs 0.97s steady-state, both isolated).
      // The post-GC re-warm decays over ~2-3 reps, so one DISCARDED warm
      // rep runs first (same clearCache path as a timed rep) and the
      // reported samples measure steady state only. Reps of the SAME
      // query generate symmetric garbage, so timed samples stay
      // comparable; GC sits OUTSIDE every timed region either way.
      System.gc()
      time(f) // discarded warm rep
      val samples = Array.fill(reps)(time(f))
      val sorted = samples.sorted
      (sorted(reps / 2), sorted(0), samples)
    }

    // SPARK_GRAFT_BENCH_ONLY=q87,q80 restricts the run to the named
    // prefixes (local iteration on one hot query); unset = full set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val headline = graft.queries.Queries.all.filter(_.bench)
      .filter(q => onlyMatches(q.name, only))
    // Fail fast when a filter is set but selects NOTHING (registry rows
    // and non-registry bench rows alike): a typo'd row name must not
    // produce a silently empty BENCH json that reads as a clean run
    // (ADVICE r10). Env unset still means "run everything".
    if (only.isDefined && headline.isEmpty &&
        !nonRegistryRows.exists(onlyMatches(_, only))) {
      System.err.println(
        s"SPARK_GRAFT_BENCH_ONLY=${sys.env("SPARK_GRAFT_BENCH_ONLY")} " +
          "selects zero bench rows (check spelling; exact-name match, " +
          "trailing * for prefix). Valid rows: " +
          (graft.queries.Queries.all.filter(_.bench).map(_.name) ++
            nonRegistryRows).mkString(", "))
      sys.exit(2)
    }
    // JIT/codegen warmup on the smallest SF (different data dir, so no
    // page-cache advantage for the timed runs), then touch the timed dir's
    // parquet footers once
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      headline.foreach { q =>
        try q.spark(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    // touch EVERY table the headline set scans (not just lineitem) so
    // first-open parquet footer/metadata reads never land in a timed rep
    for (t <- Seq("lineitem", "documents", "embeddings", "events",
        "orders", "customer", "nation", "region", "supplier", "part"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () } // optional table absent at this SF

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    val raw = scala.collection.mutable.LinkedHashMap[String, Array[Double]]()
    def record(name: String, stats: (Double, Double, Array[Double])): Unit = {
      results(name) = stats._1; mins(name) = stats._2; raw(name) = stats._3
    }
    // Contamination guard: a sample spread beyond 3x the rep minimum
    // means some reps were billed for a neighbor (GC debt, co-tenant
    // CPU, cold page cache) — the median of such an array is noise, not
    // a measurement. Re-run the whole rep sequence once and report the
    // RE-RUN's median unconditionally (not the lower of the two — the
    // min-selection biased recorded medians downward vs the fixed-reps
    // methodology of earlier rounds). BOTH raw arrays ship in `samples`
    // and `reruns` names the queries where the guard fired, so the
    // re-run stays self-diagnosing rather than silently laundering the
    // noisy first pass.
    val reruns = scala.collection.mutable.ArrayBuffer[String]()
    def recordAdaptive(name: String, reps: Int)(f: => Unit): Unit = {
      val first = timeStats(reps)(f)
      // On a loaded box every row re-runs unconditionally (the spread
      // guard alone missed BENCH_r12's +20-35% drift — contamination can
      // inflate ALL reps uniformly, which spread can't see); the reported
      // median is the re-run's, both arrays ship, and `reruns` names it.
      if (!loaded && first._3.max <= 3.0 * first._3.min) record(name, first)
      else {
        reruns += name
        val second = timeStats(reps)(f)
        record(name, (second._1, math.min(first._2, second._2),
          first._3 ++ second._3))
      }
    }
    // Heavy multi-job queries (iterative component formation, the dedup
    // pipeline, the production semDedup shape) show occasional 3-6x
    // outlier reps from in-JVM neighbors; a median-of-3 lets ONE such rep
    // own the reported number, so they get the glm_fit treatment
    // (median-of-at-least-5). Cheap sub-second queries stay at `reps`.
    val heavy = Set("q87_dedup_clusters", "q80_curation_pipeline",
      "semdedup_k64")
    def repsFor(name: String): Int =
      if (heavy(name)) math.max(reps, 5) else reps
    headline.foreach { q =>
      recordAdaptive(q.name, repsFor(q.name)) {
        q.spark(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }

    // Production-shape semantic dedup: the oracle-checked q104 pins k=4
    // centroids (cell assignment must be SQL-replayable), which says
    // nothing about the path's real cost — at scale k grows with the
    // corpus like an IVF cell count. Bench the shape a pipeline runs:
    // k=64 TRAINED centroids over the full sf embeddings, threshold 0.3.
    // Training is the amortized index-build step (one-time per corpus) —
    // kept OUTSIDE the timed region, which measures cell assignment +
    // within-cell pairs + component formation + the keep-one anti-join.
    if (onlyMatches("semdedup_k64", only)) {
      // JIT warmup for the path's codegen (ivfCell argmin, cosine fold,
      // clusterPairs rounds) on the small dir — q104 is not in the
      // headline set, so the headline warmup never touches these classes
      if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
        try {
          val we = spark.read.parquet(s"$warmDir/embeddings.parquet")
          val wc = graft.ops.Similarity.trainIvfCentroids(
            we, "embedding", kCells = 16, iters = 2, seed = 7L)
          graft.ops.Dedup.semDedup(we, "vec_id", "embedding", wc,
              threshold = 0.3)
            .write.format("noop").mode("overwrite").save()
          spark.sharedState.cacheManager.clearCache()
        } catch { case _: Throwable => () }
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // k scales with the corpus in production (it is the IVF cell-count
      // knob: ~constant vectors per cell keeps the within-cell pair
      // stage linear in n). DEFAULT is computed from the corpus —
      // autoCellCount holds ~32 points per cell, giving k=63 at sf0.1
      // (n=2000): a DELIBERATE config change from the row's historical
      // fixed k=64 (documented in docs/ROUND10.md; the row keeps its
      // name for baseline-series continuity — one cell of 63 is
      // timing-immaterial) that makes the decade runs scale k
      // automatically. The env var remains as an explicit override.
      val kCells = sys.env.get("SPARK_GRAFT_SEMDEDUP_K").map(_.toInt)
        .getOrElse(graft.ops.Similarity.autoCellCount(
          emb.count(), targetPerCell = 32))
      // auto train-cap (sample to 64·k training points): engages when k
      // is SMALL relative to n (n > 64·k) — a no-op at the row's ~32
      // points/cell default (n = 32·k), but it keeps the index build
      // linear when the env var pins a small fixed k on a big corpus
      val cents = graft.ops.Similarity.trainIvfCentroids(
        emb, "embedding", kCells = kCells, iters = 5, seed = 7L,
        maxTrainPoints = 0L)
      recordAdaptive("semdedup_k64", repsFor("semdedup_k64")) {
        graft.ops.Dedup.semDedup(emb, "vec_id", "embedding", cents,
            threshold = 0.3)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // Production-shape perplexity scoring: q115's oracle config is
    // exercised at sf0.01 for correctness; this row times the scale
    // path at sf0.1 — model fit on the lang='en' slice (the amortized
    // one-time build, OUTSIDE the timed region like semdedup_k64's
    // centroid training), then the timed region is pure scoring: one
    // shuffle-free broadcast projection over every document.
    if (onlyMatches("charlm_score", only)) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val model = graft.ops.CharLm.fit(graft.ops.CharLm.trainCounts(
        docs.filter(org.apache.spark.sql.functions.col("lang") === "en")))
      val bc = spark.sparkContext.broadcast(model)
      recordAdaptive("charlm_score", repsFor("charlm_score")) {
        graft.ops.CharLm.score(docs, bc, "text")
          .write.format("noop").mode("overwrite").save()
      }
    }

    // Production tokenizer throughput: encode the full corpus under a
    // 200-merge trained BPE model (training is the amortized build step,
    // OUTSIDE the timed region like the other model rows) — the hottest
    // per-byte kernel of a tokenizing pipeline, one broadcast projection.
    if (onlyMatches("bpe_encode", only)) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val model = graft.ops.Bpe.trainMerges(
        graft.ops.Bpe.wordCounts(docs), numMerges = 200)
      val bc = spark.sparkContext.broadcast(model)
      recordAdaptive("bpe_encode", repsFor("bpe_encode")) {
        graft.ops.Bpe.encode(docs, bc, "text")
          .write.format("noop").mode("overwrite").save()
      }
    }

    // Gopher gate throughput: the heuristic rule battery every crawl doc
    // passes through FIRST in a curation pipeline — one fused GopherStats
    // scan per row (multi-line derivation applied so the line rules do
    // real work). Pure projection: the number IS the kernel.
    if (onlyMatches("gopher_gate", only)) {
      import org.apache.spark.sql.functions.{col, regexp_replace}
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("text",
          regexp_replace(col("text"), "((?:\\S+ ){1}\\S+) ", "$1\n"))
      recordAdaptive("gopher_gate", repsFor("gopher_gate")) {
        graft.ops.Quality.gopherQuality(docs, "text", minWords = 30,
            stopWords = graft.ops.Quality.GopherStopWords :+ "a")
          .write.format("noop").mode("overwrite").save()
      }
    }

    // GLM fit benchmark: the baseline-comparable fit (admm logistic,
    // ~6×10⁵ rows at sf0.1, 5 features + intercept). Median-of-5 (vs 3
    // elsewhere): this is the headline number against BASELINE.md and
    // drifted ±7% round-over-round on unchanged code — two extra samples
    // tighten the median enough to tell real regressions from noise.
    if (onlyMatches("glm_fit", only))
      recordAdaptive("glm_fit", math.max(reps, 5)) {
        import graft.estimators.{GlmParams, LogisticRegression}
        import org.apache.spark.sql.functions._
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val df = li.select(
          array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax"), col("l_linenumber").cast("double")).as("features"),
          (col("l_returnflag") === "R").cast("double").as("label"))
        new LogisticRegression(GlmParams(solver = "admm", maxIter = 20,
          nPartitions = cpus.toInt, admmWarmStart = true)).fit(df)
      }

    // Wide-SPARSE GLM fit: hashed bag-of-words over the documents table
    // (p = 8192 murmur3 buckets, ~tokens-per-doc nonzeros per row — the
    // reference's sparse path, estimators.py:82-84, at production text
    // width) fit with L-BFGS + L2. Exercises the sparse kernels —
    // foreachActive gradient accumulation, no densify anywhere, O(p)
    // driver state — at bench scale for the first time; the dense
    // glm_fit row cannot see a sparse regression. Featurization is part
    // of the timed region deliberately: a real text-classifier job pays
    // tokenize+hash every fit.
    if (onlyMatches("glm_fit_sparse", only)) {
      recordAdaptive("glm_fit_sparse", reps) {
        import graft.estimators.{GlmParams, LogisticRegression}
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val df = graft.datasets.Datasets.hashedBow(docs, "text", 8192)
          .select(col("features"),
            (col("lang") === "en").cast("double").as("label"))
        new LogisticRegression(GlmParams(solver = "lbfgs",
          regularizer = "l2", lamduh = 0.01, maxIter = 20,
          normalize = false, nPartitions = cpus.toInt)).fit(df)
      }
    }

    // Locale.ROOT: the f-interpolator is locale-sensitive — a
    // comma-decimal JVM locale would print invalid JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    def jsamples(m: scala.collection.Map[String, Array[Double]]): String =
      m.map { case (k, vs) =>
        "\"" + k + "\":" + vs.map(num).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val total = results.collect {
      case (k, v) if !extraRows(k) => v
    }.sum
    val loadEnd = loadAvg()
    val json = s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":${jmap(results)},"queries_min":${jmap(mins)},"samples":${jsamples(raw)},"reruns":${reruns.map("\"" + _ + "\"").mkString("[", ",", "]")},"load_avg_start":${num(loadStart)},"load_avg_end":${num(loadEnd)},"sf":"$sfDir"}"""
    println(json)
    // Machine-readable artifact: the driver's BENCH_r*.json wrapper clips
    // long stdout, so the medians dict was unreadable as data. Persist
    // the full result object where the wrapper (and the judge) can load
    // it verbatim instead of regex-mining a truncated tail.
    val outDir = new java.io.File("tmp")
    outDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get("tmp/bench_result.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
