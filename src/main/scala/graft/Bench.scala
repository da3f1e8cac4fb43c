package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline (bench-flagged) queries against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A GLM fit benchmark is
  * included as `glm_fit` — the reference's headline number (BASELINE.md:
  * 57.7 s admm logistic fit at ~6×10⁵ rows) maps to the same row count
  * at sf0.1.
  *
  * Sampling methodology (VERDICT r13 #3): reps are INTERLEAVED — the
  * run executes rounds of one-sample-per-row in a fixed row order
  * (A,B,C,A,B,C, not AAA,BBB), so drift that arrives mid-run (a
  * co-tenant, thermal state, page-cache pressure) spreads across every
  * row's sample set instead of contaminating whole rows; the r13
  * quiet-vs-quiet +23–74% per-row swings on UNCHANGED code were the
  * block design concentrating exactly that. Rows whose median lands
  * under 1 s get boosted to ≥ SPARK_GRAFT_BENCH_SUBSEC_REPS samples
  * (default 7) — single-digit-rep sub-second rows were below the noise
  * floor the round-over-round gate tries to resolve. */
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
  val nonRegistryRows: Seq[String] = Seq("semdedup_k64", "semdedup_np2",
    "charlm_score", "bpe_encode", "gopher_gate", "glm_fit",
    "glm_fit_sparse")

  /** Rows excluded from the headline total: everything added AFTER the
    * r5/r6 baseline totals, so the total stays comparable round-over-
    * round. glm_fit is NOT a registry query but is grandfathered in —
    * part of every recorded total since r1. */
  val extraRows: Set[String] = nonRegistryRows.toSet - "glm_fit"

  /** Median matching the historical timeStats convention: element at
    * index n/2 of the sorted samples (upper median for even n). */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty sample set")
    val s = xs.sorted
    s(xs.size / 2)
  }

  /** 1-minute system load average (or -1 when the JVM can't read it).
    * Recorded at bench start/end for context only — the GATE uses
    * [[foreignCores]]: loadavg cannot distinguish a co-tenant from the
    * bench's own local[32] work (any mid-run sample reads ~30 and would
    * self-flag every run), and it decays over minutes after our own
    * fixture builds, stalling a genuinely quiet box at the gate. */
  def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Busy jiffies summed across all CPUs from a `/proc/stat` "cpu " line:
    * user+nice+system+irq+softirq+steal (idle and iowait are the idle
    * states). Pure — BenchLoadSpec pins it. */
  def parseProcStatBusy(cpuLine: String): Long = {
    val f = cpuLine.trim.split("\\s+")
    require(f(0) == "cpu", s"not an aggregate cpu line: $cpuLine")
    // fields: cpu user nice system idle iowait irq softirq steal ...
    Seq(1, 2, 3, 6, 7, 8).filter(_ < f.length).map(i => f(i).toLong).sum
  }

  /** utime+stime jiffies of this process from a `/proc/<pid>/stat` line.
    * The comm field (2nd) may contain spaces/parens, so fields are
    * counted from AFTER the last ')': utime/stime are stat fields 14/15,
    * i.e. indices 11/12 of the post-comm split. Pure — BenchLoadSpec. */
  def parseSelfStatJiffies(statLine: String): Long = {
    val rest = statLine.substring(statLine.lastIndexOf(')') + 1).trim
    val f = rest.split("\\s+")
    f(11).toLong + f(12).toLong
  }

  // ---- host-speed calibration (VERDICT r14 #2) -------------------------
  //
  // The foreign-CPU gate catches CONTENTION (another process burning
  // cores) but is blind to host STARVATION: r14's two degraded runs
  // showed 9–75 s whole-round stalls with ZERO foreign cores and still
  // self-labeled authoritative; the builder had to hand-assemble an
  // engine-independent DuckDB-replay yardstick (+43% that boot) to prove
  // the box was at fault. This fixed pure-JVM kernel is that yardstick,
  // mechanized: single-threaded, deterministic, memory-latency + ALU
  // bound (the two resources a starved/thermally-degraded host loses),
  // zero Spark/graft code in the path. It runs before and after the
  // timed rounds; `authoritative` additionally requires both samples
  // within CalTolerance of the committed best-known-host value
  // (docs/artifacts/calibration_best.json), so a slow boot can never
  // self-label comparable again.

  /** Size of the calibration working set in longs (2^24 = 128 MiB —
    * far past every cache level, so the strided pass measures real
    * memory latency, not L3). */
  val CalSizeLongs: Int = 1 << 24

  /** Strided passes over the working set per measurement. */
  val CalPasses: Int = 3

  /** One calibration measurement: xorshift-fill a 128 MiB long array,
    * then [[CalPasses]] full traversals at a coprime stride of 65 longs
    * (520 B — every load a fresh cache line, and gcd(65, 2^24) = 1 walks
    * ALL 2^24 slots each pass rather than a cache-resident subset).
    * Returns (seconds, checksum); the checksum defeats dead-code
    * elimination and pins kernel determinism in BenchOnlySpec. */
  def calibrationRun(): (Double, Long) = {
    val n = CalSizeLongs
    val a = new Array[Long](n)
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      a(i) = x
      i += 1
    }
    var sum = 0L
    var p = 0
    while (p < CalPasses) {
      var j = 0
      var k = 0
      while (j < n) {
        sum += a(k) * 0x100000001b3L + j
        k = (k + 65) & (n - 1)
        j += 1
      }
      p += 1
    }
    ((System.nanoTime() - t0) / 1e9, sum)
  }

  /** Host-speed measurement: one UNTIMED warmup run (the first
    * invocation in a fresh JVM pays C2 compilation of the kernel loops
    * — measured ~10% on the start sample of the first r15 run, half
    * the tolerance band spent on JIT state), then min of `reps` timed
    * runs (min is the capability statistic — any interference only
    * ever ADDS time). */
  def measureCalibration(reps: Int = 3): (Double, Long) = {
    require(reps >= 1)
    calibrationRun() // warmup, discarded
    var best = Double.MaxValue
    var sum = 0L
    var r = 0
    while (r < reps) {
      val (s, c) = calibrationRun()
      if (s < best) best = s
      sum = c
      r += 1
    }
    (best, sum)
  }

  /** Parallel-calibration thread count. The single-threaded kernel
    * catches a host whose CORES are slow (the r14 degraded boot); it is
    * blind to a host whose SCHEDULING CAPACITY is cut — a cgroup
    * cpu.max quota, or heavy oversubscription — because one thread on
    * an otherwise-idle box still gets a full core (measured: a 2-core
    * quota left the scalar samples at 0.32 s while the timed rounds ran
    * 16× degraded). Eight concurrent kernels expose exactly that: wall
    * time ≈ the scalar time on a healthy ≥8-core box, ~4× under a
    * 2-core cap. */
  val CalParThreads: Int = 8

  /** Per-thread working-set size for the parallel kernel: 2^23 longs
    * (64 MiB × 8 threads = 512 MiB total — past L3 even summed, so the
    * measurement stays memory-bound like the scalar kernel). */
  val CalParSizeLongs: Int = 1 << 23

  /** One parallel calibration measurement: [[CalParThreads]] threads
    * each run the strided kernel on a private array; the sample is the
    * wall time from release to last-finish. Checksum XORs the
    * per-thread sums (deterministic — BenchOnlySpec pins it). */
  def calibrationRunParallel(): (Double, Long) = {
    val t = CalParThreads
    val n = CalParSizeLongs
    val sums = new Array[Long](t)
    val ready = new java.util.concurrent.CountDownLatch(t)
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(t)
    val threads = (0 until t).map { ti =>
      val th = new Thread(() => {
        val a = new Array[Long](n)
        var x = 0x9E3779B97F4A7C15L + ti * 0xD1B54A32D192ED03L
        var i = 0
        while (i < n) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          a(i) = x
          i += 1
        }
        ready.countDown()
        start.await()
        var sum = 0L
        var p = 0
        while (p < CalPasses) {
          var j = 0
          var k = 0
          while (j < n) {
            sum += a(k) * 0x100000001b3L + j
            k = (k + 65) & (n - 1)
            j += 1
          }
          p += 1
        }
        sums(ti) = sum
        done.countDown()
      })
      th.setDaemon(true)
      th.start()
      th
    }
    // fills complete before the timed window opens: every thread counts
    // `ready` down after its fill, so the measurement is pure strided
    // traversal on all threads at once
    ready.await()
    val t0 = System.nanoTime()
    start.countDown()
    done.await()
    val wall = (System.nanoTime() - t0) / 1e9
    (wall, sums.reduce(_ ^ _))
  }

  /** Parallel-capability measurement: warmup + min-of-reps, same
    * statistic discipline as [[measureCalibration]]. */
  def measureCalibrationParallel(reps: Int = 3): (Double, Long) = {
    require(reps >= 1)
    calibrationRunParallel() // warmup, discarded
    var best = Double.MaxValue
    var sum = 0L
    var r = 0
    while (r < reps) {
      val (s, c) = calibrationRunParallel()
      if (s < best) best = s
      sum = c
      r += 1
    }
    (best, sum)
  }

  /** Tolerance band: a calibration sample within tol× the committed
    * best-known-host value counts as "this host is at recorded speed".
    * 1.15 resolves the observed failure modes (the r14 starved boot
    * measured +43% on the engine-independent yardstick; the residual
    * drift boot +16.4% on timed rows) while sitting far above the
    * kernel's own run-to-run jitter (single-threaded, min-of-3: <5%). */
  val CalTolerance: Double =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_CAL_TOL", "1.15").toDouble

  /** The committed best-known-host calibration, if any: env override
    * first (tests), else docs/artifacts/calibration_best.json's
    * `calibration_best_s`. None = no reference yet (first round on a
    * host) — the gate then passes vacuously and the run's own number
    * becomes the candidate to commit. */
  private def jsonNum(j: org.json4s.JValue): Option[Double] = j match {
    case org.json4s.JDouble(d) => Some(d)
    case org.json4s.JDecimal(d) => Some(d.toDouble)
    case org.json4s.JInt(i) => Some(i.toDouble)
    case _ => None
  }

  /** (scalar best, parallel best), each env-overridable
    * (SPARK_GRAFT_BENCH_CAL_BEST / _CAL_PAR_BEST) else read from
    * docs/artifacts/calibration_best.json. None = no reference yet. */
  def loadCalibrationBest(): (Option[Double], Option[Double]) = {
    val fromFile: (Option[Double], Option[Double]) =
      try {
        val p = java.nio.file.Paths.get("docs/artifacts/calibration_best.json")
        if (!java.nio.file.Files.exists(p)) (None, None)
        else {
          val j = org.json4s.jackson.JsonMethods.parse(
            java.nio.file.Files.readString(p))
          (jsonNum(j \ "calibration_best_s"),
            jsonNum(j \ "calibration_par_best_s"))
        }
      } catch { case _: Throwable => (None, None) }
    (sys.env.get("SPARK_GRAFT_BENCH_CAL_BEST").map(_.toDouble)
       .orElse(fromFile._1),
     sys.env.get("SPARK_GRAFT_BENCH_CAL_PAR_BEST").map(_.toDouble)
       .orElse(fromFile._2))
  }

  /** The calibration gate predicate (pure — BenchOnlySpec pins it):
    * ok iff no committed best exists yet, or `sample ≤ best·tol`.
    * A sample FASTER than best always passes (it's a new record to
    * commit, not a degradation). */
  def calibrationOk(sample: Double, best: Option[Double], tol: Double): Boolean =
    best.forall(b => sample <= b * tol)

  /** (box busy jiffies, self jiffies, wall nanos) — None off-Linux. */
  def cpuSnap(): Option[(Long, Long, Long)] = try {
    val stat = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("/proc/stat")).get(0)
    val self = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/self/stat"))
    Some((parseProcStatBusy(stat), parseSelfStatJiffies(self),
      System.nanoTime()))
  } catch { case _: Throwable => None }

  /** Foreign CPU over the window [a, b], in cores: busy jiffies that did
    * NOT belong to this JVM, divided by wall time. This is the co-tenant
    * gauge the load gate needs — Bench runs as one dedicated JVM
    * (tools/jrun.sh), so /proc/self covers every Spark thread it owns,
    * and a measured 1.0 means a full foreign core ran for the whole
    * window. USER_HZ is 100 on every Linux this runs on. */
  def foreignCores(a: (Long, Long, Long), b: (Long, Long, Long)): Double = {
    val wallSec = (b._3 - a._3) / 1e9
    if (wallSec <= 0) 0.0
    else math.max(0L, (b._1 - a._1) - (b._2 - a._2)) / (100.0 * wallSec)
  }

  /** Round-over-round comparability (VERDICT r13 #1): the previous
    * committed bench artifact, located mechanically —
    * SPARK_GRAFT_BENCH_PREV when set, else the highest-round
    * `docs/artifacts/r<N>/bench*result*.json`. Returns (path,
    * queries-median map, queries-min map) when one parses. Reading uses
    * json4s (on the Spark classpath) — the artifact is our own format. */
  def loadPrevArtifact(): Option[(String, Map[String, Double], Map[String, Double])] = {
    import org.json4s._
    def numMap(v: JValue): Map[String, Double] = v match {
      case JObject(fields) => fields.collect {
        case (k, JDouble(d)) => k -> d
        case (k, JDecimal(d)) => k -> d.toDouble
        case (k, JInt(i)) => k -> i.toDouble
        case (k, JLong(l)) => k -> l.toDouble
      }.toMap
      case _ => Map.empty[String, Double]
    }
    val explicit = sys.env.get("SPARK_GRAFT_BENCH_PREV").map(new java.io.File(_))
    val discovered: Seq[java.io.File] = {
      val base = new java.io.File("docs/artifacts")
      val rounds = Option(base.listFiles()).getOrElse(Array.empty).toSeq
        .filter(d => d.isDirectory && d.getName.matches("r\\d+"))
        .sortBy(-_.getName.drop(1).toInt)
      rounds.flatMap { d =>
        Option(d.listFiles()).getOrElse(Array.empty).toSeq
          .filter(f => f.getName.startsWith("bench") &&
            f.getName.endsWith(".json")).sortBy(_.getName)
      }
    }
    (explicit.toSeq ++ discovered).view.flatMap { f =>
      try {
        val j = org.json4s.jackson.JsonMethods.parse(
          java.nio.file.Files.readString(f.toPath))
        val med = numMap(j \ "queries")
        val mn = numMap(j \ "queries_min")
        if (med.nonEmpty) Some((f.getPath, med, mn)) else None
      } catch { case _: Throwable => None }
    }.headOption
  }

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg()
    // threshold 1.0 FOREIGN cores, not loadavg (see foreignCores): a full
    // standing core that isn't ours means a co-tenant; flag it and force
    // per-row re-runs. BENCH_r12 started at load 2.2 — under the old 4.0
    // loadavg gate — and drifted +20-35% on a third of its rows vs the
    // same-tree quiet-box run (VERDICT r12 #1). Measured over a 1 s
    // window at start; off-Linux falls back to the loadavg gate.
    var lastSnap = cpuSnap()
    val foreignStart = lastSnap match {
      case Some(s0) =>
        Thread.sleep(1000)
        val s1 = cpuSnap()
        lastSnap = s1
        s1.map(foreignCores(s0, _)).getOrElse(-1.0)
      case None => -1.0
    }
    def contaminated(foreign: Double): Boolean =
      if (foreign >= 0) foreign > 1.0 else loadAvg() > 1.0
    if (contaminated(foreignStart))
      System.err.println(f"[bench] WARNING: $foreignStart%.1f foreign CPU " +
        "cores busy at start — timings will be contaminated; prefer a " +
        "quiet box (every row will be re-sampled and the artifact " +
        "self-labels non-authoritative)")
    // Host-speed calibration sample #1: BEFORE the Spark session exists,
    // so the kernel shares the box with nothing of ours. Two components:
    // scalar (is a single core at recorded speed — catches a slow boot)
    // and parallel (can 8 threads run at once — catches a scheduling-
    // capacity cut: cgroup quota, oversubscription).
    val (calBest, calParBest) = loadCalibrationBest()
    val (calStart, _) = measureCalibration()
    val (calParStart, _) = measureCalibrationParallel()
    if (!calibrationOk(calStart, calBest, CalTolerance) ||
        !calibrationOk(calParStart, calParBest, CalTolerance))
      System.err.println(f"[bench] WARNING: calibration $calStart%.3f s " +
        f"(par $calParStart%.3f s) vs best-known " +
        f"${calBest.getOrElse(Double.NaN)}%.3f/" +
        f"${calParBest.getOrElse(Double.NaN)}%.3f s exceeds tolerance " +
        f"×$CalTolerance%.2f — host is slower than the recorded state " +
        "(starved/degraded); artifact self-labels non-authoritative")
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

    // ---- row assembly: every timed row becomes (name, thunk) with its
    // model/setup cost paid HERE, before any timed round (training is
    // the amortized index/model-build step of each production shape) ----
    val rows = scala.collection.mutable.ArrayBuffer[(String, () => Unit)]()
    headline.foreach { q =>
      rows += q.name -> (() =>
        q.spark(spark, sfDir).write.format("noop").mode("overwrite").save())
    }

    // Production-shape semantic dedup: the oracle-checked q104 pins k=4
    // centroids (cell assignment must be SQL-replayable), which says
    // nothing about the path's real cost — at scale k grows with the
    // corpus like an IVF cell count. Bench the shape a pipeline runs:
    // trained centroids over the full sf embeddings, threshold 0.3.
    // Training is the amortized index-build step (one-time per corpus) —
    // kept OUTSIDE the timed region, which measures cell assignment +
    // within-cell pairs + component formation + the keep-one anti-join.
    // `semdedup_np2` is the same pipeline at nprobe=2 — the recommended
    // production setting after the r13/r14 recall curve (multi-probe
    // closes the cell-straddle gap at ×(nprobe−1) straddle-stage cost);
    // its delta vs semdedup_k64 IS the measured cost of that recall.
    val wantSemK64 = onlyMatches("semdedup_k64", only)
    val wantSemNp2 = onlyMatches("semdedup_np2", only)
    if (wantSemK64 || wantSemNp2) {
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
      if (wantSemK64) rows += "semdedup_k64" -> (() =>
        graft.ops.Dedup.semDedup(emb, "vec_id", "embedding", cents,
            threshold = 0.3)
          .write.format("noop").mode("overwrite").save())
      if (wantSemNp2) rows += "semdedup_np2" -> (() =>
        graft.ops.Dedup.semDedup(emb, "vec_id", "embedding", cents,
            threshold = 0.3, nprobe = 2)
          .write.format("noop").mode("overwrite").save())
    }

    // Production-shape perplexity scoring: q115's oracle config is
    // exercised at sf0.01 for correctness; this row times the scale
    // path at sf0.1 — model fit on the lang='en' slice (the amortized
    // one-time build), then the timed region is pure scoring: one
    // shuffle-free broadcast projection over every document.
    if (onlyMatches("charlm_score", only)) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val model = graft.ops.CharLm.fit(graft.ops.CharLm.trainCounts(
        docs.filter(org.apache.spark.sql.functions.col("lang") === "en")))
      val bc = spark.sparkContext.broadcast(model)
      rows += "charlm_score" -> (() =>
        graft.ops.CharLm.score(docs, bc, "text")
          .write.format("noop").mode("overwrite").save())
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
      rows += "bpe_encode" -> (() =>
        graft.ops.Bpe.encode(docs, bc, "text")
          .write.format("noop").mode("overwrite").save())
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
      rows += "gopher_gate" -> (() =>
        graft.ops.Quality.gopherQuality(docs, "text", minWords = 30,
            stopWords = graft.ops.Quality.GopherStopWords :+ "a")
          .write.format("noop").mode("overwrite").save())
    }

    // GLM fit benchmark: the baseline-comparable fit (admm logistic,
    // ~6×10⁵ rows at sf0.1, 5 features + intercept). Min 5 samples (vs 3
    // elsewhere): this is the headline number against BASELINE.md and
    // drifted ±7% round-over-round on unchanged code — two extra samples
    // tighten the median enough to tell real regressions from noise.
    if (onlyMatches("glm_fit", only))
      rows += "glm_fit" -> (() => {
        import graft.estimators.{GlmParams, LogisticRegression}
        import org.apache.spark.sql.functions._
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val df = li.select(
          array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax"), col("l_linenumber").cast("double")).as("features"),
          (col("l_returnflag") === "R").cast("double").as("label"))
        new LogisticRegression(GlmParams(solver = "admm", maxIter = 20,
          nPartitions = cpus.toInt, admmWarmStart = true)).fit(df)
        ()
      })

    // Wide-SPARSE GLM fit: hashed bag-of-words over the documents table
    // (p = 8192 murmur3 buckets, ~tokens-per-doc nonzeros per row — the
    // reference's sparse path, estimators.py:82-84, at production text
    // width) fit with L-BFGS + L2. Exercises the sparse kernels —
    // foreachActive gradient accumulation, no densify anywhere, O(p)
    // driver state — at bench scale; the dense glm_fit row cannot see a
    // sparse regression. Featurization is part of the timed region
    // deliberately: a real text-classifier job pays tokenize+hash every
    // fit.
    if (onlyMatches("glm_fit_sparse", only))
      rows += "glm_fit_sparse" -> (() => {
        import graft.estimators.{GlmParams, LogisticRegression}
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val df = graft.datasets.Datasets.hashedBow(docs, "text", 8192)
          .select(col("features"),
            (col("lang") === "en").cast("double").as("label"))
        new LogisticRegression(GlmParams(solver = "lbfgs",
          regularizer = "l2", lamduh = 0.01, maxIter = 20,
          normalize = false, nPartitions = cpus.toInt)).fit(df)
        ()
      })

    // ---- interleaved sampling ----
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    // Sub-second rows get boosted to this many samples (VERDICT r13 #3:
    // 3 samples on a 0.3 s row cannot resolve the ±30% drift the gate
    // exists to detect; more samples is the only lever left once load
    // gating and interleaving are in place).
    val subsecReps = math.max(reps,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SUBSEC_REPS", "7").toInt)
    // Heavy multi-job queries (iterative component formation, the dedup
    // pipeline, the production semDedup shape, the baseline-facing fit)
    // show occasional 3-6x outlier reps from in-JVM neighbors; a
    // median-of-3 lets ONE such rep own the reported number, so they
    // sample at least 5 rounds — in the DEFAULT regime. An EXPLICIT
    // SPARK_GRAFT_BENCH_REPS is honored exactly (a decade run pins
    // reps=1 on a row whose single sample is minutes; silently
    // quintupling it made q87-at-sf100 unaffordable to measure).
    val heavy = Set("q87_dedup_clusters", "q80_curation_pipeline",
      "semdedup_k64", "semdedup_np2", "glm_fit")
    val repsExplicit = sys.env.contains("SPARK_GRAFT_BENCH_REPS")
    def baseTarget(name: String): Int =
      if (heavy(name) && !repsExplicit) math.max(reps, 5) else reps

    val samples = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    rows.foreach { case (n, _) => samples(n) =
      scala.collection.mutable.ArrayBuffer[Double]() }
    val loadRounds = scala.collection.mutable.ArrayBuffer[Double]()
    // One GC per ROUND, not per sample: a full GC before every sample
    // drops warm JIT/soft-ref state and taxed q01 ~0.35 s per rep when
    // measured in r7; per-round GC keeps garbage attribution bounded
    // (each row always follows the same predecessor in the fixed round
    // order, so whatever young-gen debt a neighbor leaves is CONSTANT
    // across that row's samples — comparable samples, low spread —
    // rather than absent-but-expensive).
    def runRound(sel: Seq[(String, () => Unit)], timed: Boolean): Unit = {
      // foreign cores over the window since the PREVIOUS sample — i.e.
      // the whole previous round's wall time, self-CPU excluded (ADVICE
      // r13: start-only sampling missed mid-run arrivals; raw loadavg
      // here would read our own local[32] work and self-flag every run)
      val now = cpuSnap()
      (lastSnap, now) match {
        case (Some(a), Some(b)) => loadRounds += foreignCores(a, b)
        case _ => loadRounds += (if (loadAvg() > 1.0) 2.0 else 0.0)
      }
      lastSnap = now
      System.gc()
      sel.foreach { case (name, f) =>
        val t = time(f())
        if (timed) samples(name) += t
      }
    }
    // one discarded warm round over every row (same clearCache path as a
    // timed sample): the post-GC/post-setup first pass pays JIT re-warm
    // and first-open costs that belong to no steady-state sample
    runRound(rows.toSeq, timed = false)
    // phase 1: base rounds until every row has baseTarget samples
    while (rows.exists { case (n, _) => samples(n).size < baseTarget(n) })
      runRound(rows.toSeq.filter { case (n, _) =>
        samples(n).size < baseTarget(n) }, timed = true)
    // phase 2: sub-second boost — rows whose base median is under 1 s
    // get interleaved extra rounds up to subsecReps samples
    val subsec = rows.toSeq.filter { case (n, _) =>
      median(samples(n).toSeq) < 1.0 }
    while (subsec.exists { case (n, _) => samples(n).size < subsecReps })
      runRound(subsec.filter { case (n, _) =>
        samples(n).size < subsecReps }, timed = true)
    // phase 3: contamination guard. A row re-runs a full rep sequence
    // when (a) the box showed standing load at start OR during any round
    // (ADVICE r13: the start-only flag missed mid-run arrivals), or
    // (b) its sample spread exceeds 3× its min — some samples were
    // billed for a neighbor. The reported median for a flagged row comes
    // from the GUARD-phase samples only (the re-run medians; not the
    // lower of the two passes — min-selection biased the recorded
    // medians downward vs the fixed-reps methodology), both sample sets
    // ship in `samples`, and `reruns` names the flagged rows.
    val loadedEver = contaminated(foreignStart) || loadRounds.exists(_ > 1.0)
    val flagged = rows.toSeq.filter { case (n, _) =>
      val s = samples(n)
      loadedEver || s.max > 3.0 * s.min
    }
    val guardStart: Map[String, Int] =
      flagged.map { case (n, _) => n -> samples(n).size }.toMap
    val guardTarget: Map[String, Int] =
      flagged.map { case (n, _) => n -> (samples(n).size + baseTarget(n)) }.toMap
    while (flagged.exists { case (n, _) => samples(n).size < guardTarget(n) })
      runRound(flagged.filter { case (n, _) =>
        samples(n).size < guardTarget(n) }, timed = true)
    val reruns = flagged.map(_._1)

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    rows.foreach { case (name, _) =>
      val all = samples(name).toSeq
      val forMedian = guardStart.get(name) match {
        case Some(k) => all.drop(k) // guard-phase samples only
        case None => all
      }
      results(name) = median(forMedian)
      mins(name) = all.min
    }

    // Locale.ROOT: the f-interpolator is locale-sensitive — a
    // comma-decimal JVM locale would print invalid JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    def jsamples(m: scala.collection.Map[String, Seq[Double]]): String =
      m.map { case (k, vs) =>
        "\"" + k + "\":" + vs.map(num).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    // Headline totals, BOTH metrics, computed here so round docs copy
    // them instead of assembling min-vs-median comparisons by hand
    // (VERDICT r13 #1 — ROUND13 §5 compared r13's min against r12's
    // median and called it a record).
    val headlineMedianTotal = results.collect {
      case (k, v) if !extraRows(k) => v }.sum
    val headlineMinTotal = mins.collect {
      case (k, v) if !extraRows(k) => v }.sum
    // Mechanical deltas vs the previous committed artifact, on the
    // SHARED non-extra row set (a row added or removed this round must
    // not masquerade as a speed change).
    val prev = loadPrevArtifact()
    val deltaJson = prev match {
      case Some((path, pmed, pmin)) =>
        val sharedMed = results.keys.filter(k => !extraRows(k) && pmed.contains(k)).toSeq
        val sharedMin = mins.keys.filter(k => !extraRows(k) && pmin.contains(k)).toSeq
        def pct(cur: Double, old: Double): String =
          if (old <= 0) "null" else num((cur - old) / old * 100.0)
        val cm = sharedMed.map(results).sum
        val om = sharedMed.map(pmed).sum
        val cn = sharedMin.map(mins).sum
        val on = sharedMin.map(pmin).sum
        s""","prev_artifact":${"\"" + path + "\""}""" +
          s""","prev_headline_median_total":${num(om)}""" +
          s""","prev_headline_min_total":${num(on)}""" +
          s""","delta_median_total_pct":${pct(cm, om)}""" +
          s""","delta_min_total_pct":${pct(cn, on)}""" +
          s""","delta_shared_rows":${sharedMed.size}"""
      case None => ""
    }
    val loadEnd = loadAvg()
    // final window: last round's work up to now, self-CPU excluded
    val foreignEnd = (lastSnap, cpuSnap()) match {
      case (Some(a), Some(b)) => foreignCores(a, b)
      case _ => -1.0
    }
    // Calibration sample #2: AFTER the timed rounds (Spark still up but
    // idle). The gate compares min(start, end) against the committed
    // best: the min is the capability statistic (matching the
    // min-of-reps inside each measurement), and the failure mode this
    // row exists for — a starved/degraded BOOT state — elevates both
    // samples, so the min catches it; transient mid-run arrivals are
    // the foreign-core gate's and spread-guard's job. Gating each
    // sample separately would false-flag healthy runs: the start
    // sample consistently reads ~10% above the end one (JIT/frequency
    // settling right after JVM start — measured 0.31 vs 0.28 s on the
    // first two r15 runs), half the ×1.15 band on state noise.
    val (calEnd, _) = measureCalibration()
    val (calParEnd, _) = measureCalibrationParallel()
    val calOk =
      calibrationOk(math.min(calStart, calEnd), calBest, CalTolerance) &&
        calibrationOk(math.min(calParStart, calParEnd), calParBest,
          CalTolerance)
    if (calBest.exists(b => math.min(calStart, calEnd) < b) ||
        calParBest.exists(b => math.min(calParStart, calParEnd) < b))
      System.err.println(f"[bench] note: calibration " +
        f"${math.min(calStart, calEnd)}%.3f s (par " +
        f"${math.min(calParStart, calParEnd)}%.3f s) beats the committed " +
        "best — update docs/artifacts/calibration_best.json")
    // The artifact SELF-LABELS whether its numbers are authoritative
    // (VERDICT r13 #2: r13 shipped a loaded official run and a quiet run
    // with no marker, and the round doc cherry-picked per metric):
    // foreign CPU observed at start, at end, or during any round
    // disqualifies it — and so does a calibration sample outside the
    // best-known-host band (VERDICT r14 #2: starvation is invisible to
    // the foreign-core gate; the r14 degraded runs self-labeled true).
    val authoritative = !loadedEver && !contaminated(foreignEnd) && calOk
    val calJson = s""","calibration_s_start":${num(calStart)}""" +
      s""","calibration_s_end":${num(calEnd)}""" +
      s""","calibration_par_s_start":${num(calParStart)}""" +
      s""","calibration_par_s_end":${num(calParEnd)}""" +
      s""","calibration_best_s":${calBest.map(num).getOrElse("null")}""" +
      s""","calibration_par_best_s":${calParBest.map(num).getOrElse("null")}""" +
      s""","calibration_tol":${num(CalTolerance)}""" +
      s""","calibration_ok":$calOk"""
    // Two emissions, one truth: the STDOUT line is the driver's record
    // and the driver clips long stdout (BENCH_r13/r14 carried
    // parsed:null with the medians lost in a truncated tail — VERDICT
    // r14 #4), so it carries every scalar plus the per-query medians but
    // NOT the bulky sample arrays; the tmp/bench_result.json artifact is
    // the superset with samples/mins/round-by-round foreign cores.
    val scalars = s""""metric":"total","value":${num(headlineMedianTotal)},"unit":"sec","headline_median_total":${num(headlineMedianTotal)},"headline_min_total":${num(headlineMinTotal)}$deltaJson$calJson,"authoritative":$authoritative,"interleaved":true,"load_avg_start":${num(loadStart)},"load_avg_end":${num(loadEnd)},"foreign_cores_start":${num(foreignStart)},"foreign_cores_end":${num(foreignEnd)}"""
    val compactJson =
      s"""{$scalars,"queries":${jmap(results)},"sf":"$sfDir"}"""
    val fullJson = s"""{$scalars,"queries":${jmap(results)},"queries_min":${jmap(mins)},"samples":${jsamples(samples.map { case (k, v) => k -> v.toSeq })},"reruns":${reruns.map("\"" + _ + "\"").mkString("[", ",", "]")},"foreign_cores_rounds":${loadRounds.map(num).mkString("[", ",", "]")},"sf":"$sfDir"}"""
    println(compactJson)
    val outDir = new java.io.File("tmp")
    outDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get("tmp/bench_result.json"),
      (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
