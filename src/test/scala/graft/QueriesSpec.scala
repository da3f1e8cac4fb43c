package graft

import graft.queries.Queries
import org.scalatest.funsuite.AnyFunSuite

/** Registry-level checks: every query runs at sf0.001 and returns a
  * deterministic result (same plan run twice ⇒ identical collected rows).
  * Exact-value validation against DuckDB happens in the driver's t2 gate
  * (tools/check_correctness.py locally). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  Queries.all.foreach { q =>
    test(s"${q.name} runs and is deterministic") {
      val a = q.spark(spark, TestSpark.sf0001)
      val n = a.count()
      assert(n >= 0)
      if (q.name != "q28_random_split") {
        val r1 = q.spark(spark, TestSpark.sf0001).collect().map(_.toString)
        val r2 = q.spark(spark, TestSpark.sf0001).collect().map(_.toString)
        assert(r1.sameElements(r2), s"${q.name} nondeterministic")
      }
    }
  }

  test("every query has oracle SQL (q123's iterative BPE trainer is the one documented exception)") {
    // q123's BPE merge loop is data-dependent iteration (each merge
    // changes the pair statistics of the next round) — not expressible
    // as one SQL statement. It takes the driver's rows-only check and is
    // exactness-pinned by BpeSpec instead (see README oracle-coverage
    // note). Everything else must carry a DuckDB oracle.
    val noOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == Set("q123_bpe_tokens"), s"unexpected rows-only: $noOracle")
  }

  test("oracle SQL references only harness table names") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    Queries.all.flatMap(_.oracle).foreach { sql =>
      val froms = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val known = tables ++ Set("read_parquet") // CTE names resolved first by duckdb
      // golden-constant oracles (pure VALUES, e.g. q51 image decode) read
      // no table by design; everything else must hit a harness table
      val isGolden = sql.contains("VALUES") && !froms.exists(tables.contains)
      assert(isGolden || froms.exists(tables.contains), s"no known table in: ${froms}")
    }
  }
}
