package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SPARK_GRAFT_BENCH_ONLY selection predicate (VERDICT r9 #6):
  * the old plain-prefix gate made `--only glm_fit` also time
  * glm_fit_sparse, silently doubling the row under measurement. The
  * contract is exact-name by default with an explicit trailing `*` for
  * prefix selection. */
class BenchOnlySpec extends AnyFunSuite {
  import Bench.onlyMatches

  test("unset env selects everything") {
    assert(onlyMatches("glm_fit", None))
    assert(onlyMatches("anything_at_all", None))
  }

  test("bare name is an EXACT match — glm_fit does not select glm_fit_sparse") {
    val only = Some(Seq("glm_fit"))
    assert(onlyMatches("glm_fit", only))
    assert(!onlyMatches("glm_fit_sparse", only))
    assert(!onlyMatches("glm", only))
  }

  test("trailing * opts into prefix matching") {
    val only = Some(Seq("glm_fit*"))
    assert(onlyMatches("glm_fit", only))
    assert(onlyMatches("glm_fit_sparse", only))
    assert(!onlyMatches("q01_agg", only))
  }

  test("comma-list semantics: any pattern may select") {
    val only = Some(Seq("q87_dedup_clusters", "semdedup*"))
    assert(onlyMatches("q87_dedup_clusters", only))
    assert(onlyMatches("semdedup_k64", only))
    assert(!onlyMatches("q87_dedup_clusters_extra", only))
    assert(!onlyMatches("q80_curation_pipeline", only))
  }

  test("bare * selects everything; empty pattern list selects nothing") {
    assert(onlyMatches("any", Some(Seq("*"))))
    assert(!onlyMatches("any", Some(Seq.empty)))
  }

  test("nonRegistryRows == the onlyMatches if-block literals (ADVICE r11)") {
    // the empty-filter guard, its error listing, and the headline-total
    // exclusion all derive from Bench.nonRegistryRows; the if-blocks in
    // main are the ground truth — scan the source so a new row added to
    // one side without the other fails here instead of drifting
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala"))
    val literals = """onlyMatches\("([a-z0-9_]+)"""".r
      .findAllMatchIn(src).map(_.group(1)).toSet
    assert(literals == Bench.nonRegistryRows.toSet,
      s"drift: if-blocks=$literals vs nonRegistryRows=${Bench.nonRegistryRows}")
    assert(Bench.extraRows == Bench.nonRegistryRows.toSet - "glm_fit",
      "extraRows must be nonRegistryRows minus the grandfathered glm_fit")
  }

  // ---- foreign-CPU gauge (the co-tenant gate; raw loadavg reads the
  // bench's own local[32] work and would self-flag every run) ----

  test("parseProcStatBusy sums user+nice+system+irq+softirq+steal") {
    // user nice system idle iowait irq softirq steal guest guest_nice
    val line = "cpu  100 2 30 5000 40 5 6 7 0 0"
    assert(Bench.parseProcStatBusy(line) == 100L + 2 + 30 + 5 + 6 + 7)
    // short line (old kernels without steal) must not throw
    assert(Bench.parseProcStatBusy("cpu 10 0 5 100") == 15L)
  }

  test("parseSelfStatJiffies reads utime+stime after the comm field") {
    // comm may contain spaces AND parens — fields count from the LAST ')'
    val line = "1234 (java) S " + (4 to 13).mkString(" ") +
      " 700 42 0 0 20 0 33 0"
    assert(Bench.parseSelfStatJiffies(line) == 742L)
    val evil = "99 (a b) c) R " + (4 to 13).mkString(" ") + " 10 5 0 0"
    assert(Bench.parseSelfStatJiffies(evil) == 15L)
  }

  test("foreignCores: self-CPU excluded, clamped at 0, per-core units") {
    // 10 s window, 2000 busy jiffies box-wide, 1500 of them ours
    // -> (2000-1500)/(100 Hz * 10 s) = 0.5 foreign cores
    val a = (10000L, 8000L, 0L)
    val b = (12000L, 9500L, 10L * 1000 * 1000 * 1000)
    assert(math.abs(Bench.foreignCores(a, b) - 0.5) < 1e-9)
    // self can exceed box delta transiently (tick granularity): clamp 0
    val c = (12000L, 9700L, 20L * 1000 * 1000 * 1000)
    assert(Bench.foreignCores(b, c) == 0.0)
    // zero/negative wall -> 0, no division blowup
    assert(Bench.foreignCores(a, (11000L, 8000L, 0L)) == 0.0)
  }

  test("live cpuSnap parses this box's /proc (Linux CI)") {
    val s = Bench.cpuSnap()
    assume(s.isDefined) // skip off-Linux
    val Some((busy, self, _)) = s
    assert(busy > 0L)
    assert(self >= 0L && self <= busy)
  }

  // ---- host-speed calibration (VERDICT r14 #2) ----

  test("calibration kernel is deterministic and visits the full set") {
    // Identical checksum on every run (same fill, same stride walk) —
    // the kernel's work cannot silently change between rounds, so its
    // TIME is comparable across artifacts.
    val (s1, c1) = Bench.calibrationRun()
    val (_, c2) = Bench.calibrationRun()
    assert(c1 == c2)
    assert(s1 > 0.0)
    // stride 65 is coprime to the power-of-two size: the walk returns
    // to slot 0 only after exactly CalSizeLongs steps (full coverage,
    // not a cache-resident subset)
    val n = Bench.CalSizeLongs
    var k = 0
    var steps = 0
    do { k = (k + 65) & (n - 1); steps += 1 } while (k != 0)
    assert(steps == n)
  }

  test("calibrationOk: no best = vacuous pass; band edges; faster passes") {
    assert(Bench.calibrationOk(99.0, None, 1.15)) // first round on a host
    assert(Bench.calibrationOk(1.15, Some(1.0), 1.15)) // at the edge
    assert(!Bench.calibrationOk(1.16, Some(1.0), 1.15)) // past it
    assert(Bench.calibrationOk(0.5, Some(1.0), 1.15)) // new record passes
  }

  test("parallel calibration kernel is deterministic and runs 8 threads") {
    val (s1, c1) = Bench.calibrationRunParallel()
    val (_, c2) = Bench.calibrationRunParallel()
    assert(c1 == c2) // per-thread seeded fills + fixed walk: same XOR
    assert(s1 > 0.0)
    assert(Bench.CalParThreads == 8)
    // per-thread working set stays a power of two so the &-mask walk
    // visits the full array (same coprime-stride argument as scalar)
    assert(Integer.bitCount(Bench.CalParSizeLongs) == 1)
  }

  test("measureCalibration returns the min of its reps") {
    val (best, _) = Bench.measureCalibration(reps = 2)
    val (single, _) = Bench.calibrationRun()
    // min-of-2 can't exceed a fresh single sample by more than jitter;
    // the real assertion is it parses, runs, and is positive/finite
    assert(best > 0.0 && java.lang.Double.isFinite(best) && single > 0.0)
  }
}
