package graft

import graft.queries.SimilarityQueries
import org.scalatest.funsuite.AnyFunSuite

/** Executes GENERATED oracle SQL on the gate's actual DuckDB (VERDICT
  * r11 item #2). Round 10's q143 oracle rewrite was correct SQL that
  * DuckDB 1.0.0 could not physically run (plain multiply-referenced
  * CTEs are inlined — 24 label-prop rounds tripled the plan each and
  * exhausted the fd limit), and nothing in `sbt test` ever executed an
  * oracle string, so the flagship correctness row was red for a whole
  * round. This spec closes that hole for the three builder-generated
  * oracles (q143 label-prop + sidecars, q144 probe, q87 recursive
  * closure) and proves the check has teeth: the exact r10 regression —
  * removing AS MATERIALIZED — must be caught.
  *
  * Skips (cancels) when python3+duckdb are absent: the oracle replay is
  * a driver-side capability, present on the gate/judge box but not
  * guaranteed everywhere this suite compiles. */
class OracleSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private val repo = "/root/repo"

  private lazy val haveDuck: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start().waitFor() == 0
    } catch { case _: Exception => false }

  /** JSON-escape matching Verify's dump (quote/backslash/control). */
  private def js(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Write `entries` as an oracle_sql.json and run tools/oracle_smoke.py
    * over the sf0.001 fixture. Returns the tool's exit code; prints its
    * output so a failure names the query and mode (fail vs timeout). */
  private def smoke(entries: Map[String, String], perQueryTimeoutS: Int): Int = {
    val json = entries.map { case (k, v) => s"${js(k)}: ${js(v)}" }
      .mkString("{", ",", "}")
    val f = java.nio.file.Files.createTempFile("oracle_smoke_", ".json")
    java.nio.file.Files.writeString(f, json)
    val pb = new ProcessBuilder(
      "python3", s"$repo/tools/oracle_smoke.py", f.toString, sf)
    pb.environment().put("ORACLE_SMOKE_TIMEOUT_S", perQueryTimeoutS.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val outText = new String(p.getInputStream.readAllBytes())
    // generous outer bound: per-query caps are enforced inside the tool
    val done = p.waitFor(
      (perQueryTimeoutS * entries.size + 60).toLong,
      java.util.concurrent.TimeUnit.SECONDS)
    if (!done) p.destroyForcibly()
    java.nio.file.Files.deleteIfExists(f)
    println(s"[oracle_smoke]\n$outText")
    if (done) p.exitValue() else 255
  }

  private def nsSql(name: String): String =
    SparkEntry.oracleSql(name).replace(
      SimilarityQueries.SidecarNsToken, SimilarityQueries.sidecarNs(sf))

  /** Load-adaptive per-query cap (VERDICT r16 #2). The r16 gate failed
    * this suite on q145's DuckDB replay exceeding a fixed 90 s cap
    * purely from host load — the SAME oracle executed in 24.8 s in the
    * same gate's sweep. A fixed wall-clock cap on a shared box gates the
    * box, not the SQL. Scale the base cap by the measured host-speed
    * factor: Bench's engine-independent scalar calibration kernel,
    * sampled HERE (so it sees exactly the contention the DuckDB child
    * will see), divided by the committed best-known-host value. The cap
    * is never deleted — a hung or fd-exploding oracle (the r10
    * regression this spec exists for) still dies within a bounded
    * multiple (≤8×) of the quiet-box budget. */
  private def loadScaledCap(baseS: Int): Int = {
    val (best, _) = Bench.loadCalibrationBest()
    val (sample, _) = Bench.measureCalibration(reps = 2)
    val factor = best.fold(1.0)(b => math.min(math.max(1.0, sample / b), 8.0))
    val cap = math.ceil(baseS * factor).toInt
    println(f"[oracle_smoke] cal sample=$sample%.3f s best=${best.getOrElse(-1.0)}%.3f s -> cap ${baseS}s x $factor%.2f = ${cap}s")
    cap
  }

  test("generated oracle SQL executes on the gate's DuckDB (r10 regression)") {
    assume(haveDuck, "python3+duckdb unavailable — smoke replay skipped")
    SimilarityQueries.semDedupSidecars(spark, sf)
    val names = Seq(
      "q143_semdedup_scaled", "q144_semdedup_probe", "q87_dedup_clusters",
      "q140_bpe_encode", "q145_bpe_train_prefix")
    val entries = names.map(n => n -> nsSql(n)).toMap
    // The env knob exists so round_gate.sh can widen the cap on a box
    // running concurrent sweeps (ADVICE r15: the gate's previous
    // ORACLE_SMOKE_TIMEOUT_S export was a NO-OP — smoke() overwrites
    // the child env with its own per-test value, so the cap has to be
    // read HERE, as the default for this load-sensitive test; the
    // teeth test below keeps its deliberate low cap explicit).
    val baseS = sys.env.get("ORACLE_SMOKE_TIMEOUT_S")
      .flatMap(_.toIntOption).getOrElse(60)
    val capS = loadScaledCap(baseS)
    assert(smoke(entries, perQueryTimeoutS = capS) == 0,
      "a generated oracle failed to EXECUTE on DuckDB — the gate's replay " +
        "would be red regardless of engine correctness (the r10 failure mode)")
  }

  test("the check has teeth: AS MATERIALIZED removal is caught") {
    assume(haveDuck, "python3+duckdb unavailable — smoke replay skipped")
    SimilarityQueries.semDedupSidecars(spark, sf)
    val broken = nsSql("q143_semdedup_scaled").replace("AS MATERIALIZED", "AS")
    assert(broken != nsSql("q143_semdedup_scaled"),
      "q143 oracle no longer contains AS MATERIALIZED — update this control")
    // the r10 regression dies in ~4s with fd exhaustion at sf0.001; the
    // cap also catches a variant that hangs instead of erroring
    assert(smoke(Map("q143_broken" -> broken), perQueryTimeoutS = 20) != 0,
      "the smoke check PASSED the exact r10 regression — it gates nothing")
  }
}
