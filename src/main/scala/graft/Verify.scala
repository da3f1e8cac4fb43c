package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query-name filter (dev only)]
    val sfDir = args(0); val outDir = args(1)
    val nameFilter: String => Boolean =
      if (args.length > 2) {
        val wanted = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
        // a typo'd name must not read as a clean (empty) verify run
        val unknown = wanted -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"unknown query name(s) in filter: ${unknown.mkString(", ")}")
        wanted
      } else (_: String) => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL (or a quote/backslash in a
    // caller-supplied path) would otherwise make the driver's json.load
    // fail and silently zero the round's correctness (ADVICE r12: the
    // run-registry entry below interpolated paths raw).
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Run registry (VERDICT r11 #8): long verifies (sf100 ≈ hours) have
    // been orphaned past session end with nothing on disk naming them.
    // Record pid + args at start, delete on clean exit — a later session
    // lists tmp/verify_runs/ and adopts or kills deliberately. Stale
    // entries (pid no longer alive) just mean an unclean death.
    val runReg = Paths.get("/root/repo/tmp/verify_runs")
    Files.createDirectories(runReg)
    val pid = ProcessHandle.current.pid
    val regEntry = runReg.resolve(s"$pid.json")
    Files.writeString(regEntry,
      s"""{"pid": $pid, "sf_dir": ${q(sfDir)}, "out_dir": ${q(outDir)},
         | "started_epoch_s": ${System.currentTimeMillis() / 1000}}""".stripMargin)
    sys.addShutdownHook(Files.deleteIfExists(regEntry))
    // a flaky operator must not hide behind the retry: every first-attempt
    // failure is recorded in a sidecar (retries.json), empty on a clean run
    val retried = scala.collection.mutable.LinkedHashMap[String, String]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    // Dump-file parallelism. Default 1 = the historical single-file dump
    // (what the driver's gate has always read). Decade sweeps set 32:
    // the compare replays `read_parquet('<dir>/*.parquet')` and sorts
    // rows before hashing, so part count is invisible to the check —
    // but a coalesce(1) write of a 20M-row sf100 result is one thread
    // encoding parquet for ~40 minutes (measured r14) while 31 cores
    // idle; at 32 parts the same dump is minutes.
    val dumpParts = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PARTS", "1").toInt
    require(dumpParts >= 1, s"SPARK_GRAFT_VERIFY_PARTS must be >= 1, got $dumpParts")
    SparkEntry.queries.filter(kv => nameFilter(kv._1)).foreach { case (name, fn) =>
      // one retry: a transiently failed query (executor memory spike, temp
      // file race) would otherwise silently zero this round's correctness
      // row — the driver runs this dump exactly once per round
      // per-query engine wall (stderr, greppable): the decade-sweep
      // tables report engine-side cost per row, which was previously
      // only recoverable from Spark INFO logs
      val t0 = System.nanoTime()
      def attempt(): Unit = fn(spark, sfDir).coalesce(dumpParts)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      try attempt()
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed (${e.getMessage}); retrying once")
        retried(name) = String.valueOf(e.getMessage)
        try attempt()
        catch { case e2: Throwable =>
          System.err.println(s"[verify] $name failed twice: ${e2.getMessage}")
          failed(name) = String.valueOf(e2.getMessage)
        }
      }
      System.err.println(f"[verify] $name done ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // sidecar-backed oracles (q143/q144) embed a namespace token in their
    // static SQL; rewrite it to THIS run's per-fixture namespace so the
    // replay reads the artifacts this pass wrote (never another run's)
    val ns = graft.queries.SimilarityQueries.sidecarNs(sfDir)
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.queries.SimilarityQueries.SidecarNsToken, ns))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    def obj(m: scala.collection.Map[String, String]): String =
      m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/retries.json"),
      s"""{"retried": ${obj(retried)}, "failed_twice": ${obj(failed)}}""")
    spark.stop()
  }
}
