package graft

import graft.ops.Boilerplate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Repeated-n-gram (boilerplate) detection semantics: document frequency
  * counts DISTINCT docs, short docs survive with zero counts, and the
  * per-doc occurrence accounting is positional. */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val footer = "all rights reserved by the site owner"

  test("shared footer grams are flagged; unique text is not") {
    import spark.implicits._
    // 4 docs share a 7-token footer; each body token is doc-unique so
    // only grams fully inside the footer can be cross-doc common
    val docs = (0 until 4).map { i =>
      (i.toLong, s"body$i words$i number$i here$i now$i $footer")
    } :+ (9L, "totally unrelated text with no shared passage at all")
    val df = docs.toDF("doc_id", "text")
    val out = Boilerplate.repeatedNgramStats(df, "doc_id", "text", n = 5, minDf = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // each footer doc: 12 tokens → 8 positional 5-grams; the 3 grams fully
    // inside the footer are shared by all 4 docs → common
    (0 until 4).foreach { i =>
      val (n, c) = out(i.toLong)
      assert(n == 8, s"doc $i n_grams=$n")
      assert(c == 3, s"doc $i n_common=$c")
    }
    assert(out(9L) == ((5, 0)))
  }

  test("document frequency is distinct-doc: self-repetition is not boilerplate") {
    import spark.implicits._
    // one doc repeats its own phrase 5 times — df(gram) is still 1 doc
    val df = Seq(
      (1L, Seq.fill(5)("my very own special phrase").mkString(" ")),
      (2L, "some other words entirely different from that one"))
      .toDF("doc_id", "text")
    val out = Boilerplate.repeatedNgramStats(df, "doc_id", "text", n = 5, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(1L) == 0)
    assert(out(2L) == 0)
  }

  test("docs shorter than n tokens surface with (0, 0), not dropped") {
    import spark.implicits._
    val df = Seq((1L, "too short"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val out = Boilerplate.repeatedNgramStats(df, "doc_id", "text", n = 5, minDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((0, 0)))
    assert(out(2L) == ((2, 0)))
  }

  test("minDf is a distinct-doc threshold: 2 docs < minDf=3 stays uncommon") {
    import spark.implicits._
    val shared = "this exact phrase appears twice only"
    val df = Seq(
      (1L, s"$shared padding one two three"),
      (2L, s"$shared other tail words here"),
      (3L, "nothing in common with the others at all"))
      .toDF("doc_id", "text")
    val two = Boilerplate.repeatedNgramStats(df, "doc_id", "text", n = 6, minDf = 3)
      .filter(col("n_common") > 0).count()
    assert(two == 0)
    val relaxed = Boilerplate.repeatedNgramStats(df, "doc_id", "text", n = 6, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(relaxed(1L) == 1 && relaxed(2L) == 1 && relaxed(3L) == 0)
  }

  test("repeatedSpans: hand-computed islands, adjacency merge, 0-based ends") {
    import spark.implicits._
    // common 2-grams (df >= 2): "a b" (1,2,3,4), "b b" (4,5,6),
    // "b q" (2,4); "b r", "x a", "b y", "y a", "b z" stay unique
    val df = Seq(
      (1L, "x a b y a b z"), // common pos {1, 4}: gap 3 > n=2 -> two spans
      (2L, "a b q"),         // common pos {0, 1}: adjacent -> ONE span [0,2]
      (3L, "a b r"),         // only pos 0 common -> span [0,1]
      (4L, "a b b q"),       // pos {0, 1, 2} all common -> ONE span [0,3]
      (5L, "b b s"),
      (6L, "b b t"),
      (7L, "nothing shared here")).toDF("doc_id", "text")
    val spans = Boilerplate.repeatedSpans(df, "doc_id", "text", n = 2, minDf = 2)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.toSeq == Seq(
      (1L, 1, 2, 2), (1L, 4, 5, 2),
      (2L, 0, 2, 3), (3L, 0, 1, 2),
      (4L, 0, 3, 4),
      (5L, 0, 1, 2), (6L, 0, 1, 2)))
  }

  test("persisted gram table round-trips; width mismatch fails loudly") {
    import spark.implicits._
    val ref = Seq(
      (1L, "x a b y"), (2L, "a b q"), (3L, "a b r")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "z a b w"), (11L, "none of these match")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("grams").toString
    Boilerplate.writeCommonGrams(ref, "doc_id", "text", n = 2, minDf = 2, dir)
    val grams = spark.read.parquet(dir)
    val spans = Boilerplate.repeatedSpansAgainstGrams(batch, grams,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.toSeq == Seq((10L, 1, 2))) // "a b" at pos 1 in doc 10
    // the incremental result equals spans computed against the same
    // gram set directly
    val direct = Boilerplate.repeatedSpansAgainstGrams(batch,
        Boilerplate.commonGrams(ref, "doc_id", "text", 2, 2)
          .withColumn("n", org.apache.spark.sql.functions.lit(2)),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(direct.toSeq == spans.toSeq)
    // a table mixing widths (corrupt or concatenated) is rejected
    val mixed = grams.unionByName(
      grams.withColumn("n", org.apache.spark.sql.functions.lit(3)))
    val e = intercept[IllegalArgumentException] {
      Boilerplate.repeatedSpansAgainstGrams(batch, mixed, "doc_id", "text")
    }
    assert(e.getMessage.contains("exactly one gram width"))
  }

  test("stripRepeatedSpans: removes spans, keeps clean docs, empties full coverage") {
    import spark.implicits._
    val df = Seq(
      (1L, "x a b y a b z"),
      (2L, "a b"),           // fully covered -> empty string
      (3L, "a b r"),
      (4L, "untouched words stay exactly as they were")).toDF("doc_id", "text")
    // make "a b" common across 1, 2, 3
    val spans = Boilerplate.repeatedSpans(df, "doc_id", "text", n = 2, minDf = 2)
    val out = Boilerplate.stripRepeatedSpans(df, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "x y z")
    assert(out(2L) == "")
    assert(out(3L) == "r")
    assert(out(4L) == "untouched words stay exactly as they were")
    // all original columns survive, text replaced in place
    val cols = Boilerplate.stripRepeatedSpans(df, spans, "doc_id", "text").columns
    assert(cols.toSeq == Seq("doc_id", "text"))
    // the scratch column name is reserved, not silently clobbered
    val clash = df.withColumn("__spans", lit(1))
    val e = intercept[IllegalArgumentException] {
      Boilerplate.stripRepeatedSpans(clash, spans, "doc_id", "text")
    }
    assert(e.getMessage.contains("reserved scratch column"))
  }

  test("commonLines/stripCommonLines: distinct-doc df, order-exact rewrite, all-boilerplate doc") {
    import spark.implicits._
    val nav = "home | products | contact"
    val docs = Seq(
      (1L, s"$nav\nunique alpha line\nmore body text\n$nav"), // nav twice: counts ONCE for df
      (2L, s"$nav\nsecond doc body"),
      (3L, s"intro line\n$nav\noutro line"),
      (4L, nav),                                    // fully boilerplate
      (5L, "no shared lines at all\njust body")
    ).toDF("doc_id", "text")
    val common = Boilerplate.commonLines(docs, "doc_id", "text", minDf = 3)
    // only the nav line reaches df=4 >= 3; every other line is unique
    assert(common.count() === 1)
    val out = Boilerplate.stripCommonLines(docs, common, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Int]("n_dropped_lines"))).toMap
    assert(out(1L) === (("unique alpha line\nmore body text", 2))) // both copies dropped
    assert(out(2L) === (("second doc body", 1)))
    assert(out(3L) === (("intro line\noutro line", 1)))
    assert(out(4L) === (("", 1)))                  // survives as empty, counted
    assert(out(5L) === (("no shared lines at all\njust body", 0)))
    // a doc repeating its own line cannot promote it to common
    val selfRep = Seq(
      (1L, "me\nme\nme"), (2L, "you"), (3L, "them")).toDF("doc_id", "text")
    assert(Boilerplate.commonLines(selfRep, "doc_id", "text", minDf = 2)
      .count() === 0)
    // reserved scratch names fail fast
    intercept[IllegalArgumentException] {
      Boilerplate.stripCommonLines(
        docs.withColumn("__drop", lit(1)), common, "doc_id", "text")
    }
    // persisted artifact round-trips; mixed-threshold tables rejected
    val dir = java.nio.file.Files.createTempDirectory("common_lines").toString
    Boilerplate.writeCommonLines(docs, "doc_id", "text", minDf = 3, s"$dir/cl")
    val loaded = Boilerplate.loadCommonLines(spark, s"$dir/cl")
    val viaLoaded = Boilerplate.stripCommonLines(docs, loaded, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(viaLoaded === out.view.mapValues(_._1).toMap)
    Boilerplate.commonLines(docs, "doc_id", "text", 2)
      .withColumn("min_df", lit(2))
      .write.mode("append").parquet(s"$dir/cl")
    val e2 = intercept[IllegalArgumentException] {
      Boilerplate.loadCommonLines(spark, s"$dir/cl")
    }
    assert(e2.getMessage.contains("exactly one min_df"))
  }
}
