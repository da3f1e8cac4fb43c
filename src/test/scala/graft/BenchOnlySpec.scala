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
}
