package graft

import graft.queries.Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the decade-sweep sample pin (VERDICT r13 #1): the env knob's
  * default keeps every gate plan byte-identical, the engine predicate
  * realizes exactly the documented multiplicative-hash arithmetic, and
  * the SQL fragment evaluates to the SAME kept-key set on the gate's
  * actual DuckDB — the cross-engine agreement the sweep hash-compare
  * rests on, pinned at spec scale before a decade run depends on it. */
class SweepSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("knob default is OFF: identity frame, TRUE fragment") {
    assert(Queries.SweepSampleMod == 1L,
      "specs must run with SPARK_GRAFT_SWEEP_SAMPLE_MOD unset")
    val df = spark.range(10).toDF("k")
    assert(Queries.sweepSampled(df, "k") eq df,
      "mod=1 must not add a Filter node to gate plans")
    assert(Queries.sweepSampleSql("k") == "TRUE")
    assert(Queries.sweepSampleSqlWith("k", 1L) == "TRUE")
  }

  test("engine predicate == the documented arithmetic (mod 7, keys 0..9999)") {
    val df = spark.range(10000).toDF("k")
    val kept = Queries.sweepSampledWith(df, "k", 7L)
      .collect().map(_.getLong(0)).toSet
    val expected = (0L until 10000L)
      .filter(k => (k * 2654435761L) % 7L == 0L).toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < 10000,
      "a useful sample keeps some keys and drops some")
  }

  test("integer-typed keys sample identically to long keys (the cast)") {
    import spark.implicits._
    val ints = (0 until 1000).toDF("k")
    val longs = (0L until 1000L).toDF("k")
    val a = Queries.sweepSampledWith(ints, "k", 13L)
      .collect().map(_.getInt(0).toLong).toSet
    val b = Queries.sweepSampledWith(longs, "k", 13L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("sf1000-regime keys (> 2^63/c): engines agree, no overflow") {
    // raw key·2654435761 overflows signed 64-bit above ~3.5e9 — Java
    // would wrap while DuckDB raises; the reduce-before-multiply form
    // must keep both engines on the true modular value for keys an
    // order of magnitude past the overflow line (sf1000's ~6e9 ids).
    import spark.implicits._
    val keys = Seq(3_470_000_000L, 3_500_000_001L, 5_999_999_990L,
      5_999_999_999L, 6_000_000_000L, 9_223_372_036L * 1000L,
      Long.MaxValue / 2)
    val kept = Queries.sweepSampledWith(keys.toDF("k"), "k", 97L)
      .collect().map(_.getLong(0)).toSet
    val expected = keys.filter { k =>
      (BigInt(k) * BigInt(2654435761L)) % 97 == 0
    }.toSet
    assert(expected.nonEmpty, "fixture must keep at least one key (5999999990 = 97*61855670)")
    assert(kept == expected, "engine must realize the exact BigInt modular value")
    val haveDuck =
      try new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start().waitFor() == 0
      catch { case _: Exception => false }
    assume(haveDuck, "python3+duckdb unavailable — cross-engine pin skipped")
    val frag = Queries.sweepSampleSqlWith("k", 97L)
    val vals = keys.mkString("(", "), (", ")")
    val py =
      s"""import duckdb
         |r = duckdb.sql("SELECT k FROM (VALUES $vals) t(k) WHERE $frag ORDER BY k").fetchall()
         |print(",".join(str(x[0]) for x in r))""".stripMargin
    val p = new ProcessBuilder("python3", "-c", py)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes()).trim
    assert(p.waitFor() == 0, s"duckdb probe failed (overflow?): $out")
    val duck = out.split(",").filter(_.nonEmpty).map(_.toLong).toSet
    assert(duck == expected)
  }

  test("DuckDB evaluates the SQL fragment to the same kept-key set") {
    val haveDuck =
      try new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start().waitFor() == 0
      catch { case _: Exception => false }
    assume(haveDuck, "python3+duckdb unavailable — cross-engine pin skipped")
    val frag = Queries.sweepSampleSqlWith("k", 7L)
    val py =
      s"""import duckdb
         |r = duckdb.sql("SELECT k FROM range(0, 10000) t(k) WHERE $frag ORDER BY k").fetchall()
         |print(",".join(str(x[0]) for x in r))""".stripMargin
    val p = new ProcessBuilder("python3", "-c", py)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes()).trim
    assert(p.waitFor() == 0, s"duckdb probe failed: $out")
    val duck = out.split(",").filter(_.nonEmpty).map(_.toLong).toSet
    val engine = Queries.sweepSampledWith(
        spark.range(10000).toDF("k"), "k", 7L)
      .collect().map(_.getLong(0)).toSet
    assert(duck == engine,
      "DuckDB and Spark disagree on the sample predicate — every " +
        "decade-sweep hash compare under the knob would be vacuously red")
  }
}
