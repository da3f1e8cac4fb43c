package graft

import graft.ops.Quality
import org.scalatest.funsuite.AnyFunSuite

/** Gopher quality gates (ops.Quality): each rule isolated on a
  * hand-built document that fails EXACTLY that rule, boundary
  * arithmetic, parameter validation, and the filter form. Cross-engine
  * exactness is q132's oracle. */
class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodWords =
    // 12 words, all alphabetic, mean length in [3,10], two stop words
    "the quick brown fox jumps over two lazy dogs with great energy"

  private def flags(text: String, minWords: Int = 10): Map[String, Boolean] = {
    val r = Quality.gopherQuality(
      Seq((1L, text)).toDF("doc_id", "text"), "text", minWords = minWords)
      .collect().head
    Seq("wc_ok", "mwl_ok", "symbol_ok", "bullet_ok", "alpha_ok",
      "stopword_ok", "gopher_keep")
      .map(c => c -> r.getAs[Boolean](c)).toMap
  }

  test("a clean document passes every gate") {
    val f = flags(goodWords)
    assert(f.values.forall(identity), f.toString)
  }

  test("each rule fails in isolation") {
    // too few words
    assert(!flags("the fox with fur")("wc_ok"))
    // mean word length < 3 (all 1-char words, stopwords included via 'a'... keep 'to' 'of')
    val short = ("a b c d e f g h i j to of " * 2).trim
    val fShort = flags(short)
    assert(!fShort("mwl_ok") && fShort("wc_ok"))
    // mean word length > 10
    val long = (Seq.fill(12)("extraordinarily") ++ Seq("the", "with")).mkString(" ")
    assert(!flags(long)("mwl_ok"))
    // symbol density: a '#' per word
    val hashy = goodWords.split(" ").map(_ + " #").mkString(" ")
    assert(!flags(hashy)("symbol_ok"))
    // ellipsis symbols count too
    val dotty = goodWords.split(" ").map(_ + " ...").mkString(" ")
    assert(!flags(dotty)("symbol_ok"))
    // bullets: every line starts with one
    val bullets = (1 to 12).map(i => s"- the item $i with text").mkString("\n")
    assert(!flags(bullets)("bullet_ok"))
    // ellipsis-ended lines: every line
    val ells = (1 to 12).map(i => s"the line $i with trailing...").mkString("\n")
    assert(!flags(ells)("bullet_ok"))
    // alphabetic fraction: half the words are numbers
    val nums = "the fox with " + (1 to 9).map(_.toString).mkString(" ")
    assert(!flags(nums)("alpha_ok"))
    // stop words: none of the evidence set present
    val noStops = Seq.fill(12)("zebra").mkString(" ")
    assert(!flags(noStops)("stopword_ok"))
  }

  test("words tokenize on ANY whitespace: newlines separate words") {
    // the same 12 words, space- vs newline-separated every 2 words —
    // a space-only split would merge 'dogs\nwith' into one 9-char token
    // (wrong count, wrong lengths, missed stop word)
    val spaced = flags(goodWords)
    val lined = flags(goodWords.split(" ").grouped(2)
      .map(_.mkString(" ")).mkString("\n"))
    assert(lined === spaced, s"lined=$lined spaced=$spaced")
  }

  test("symbol gates are PER-SYMBOL (Gopher A1.1), not summed") {
    // 40 words + 3 '#' + 3 '...': each symbol at 3/46 < 0.1 passes;
    // the old summed gate would have charged 6/46 > 0.1 and failed
    val base = Seq.fill(20)("the and").mkString(" ") // 40 words
    val both = base + " # # # ... ... ..."
    assert(flags(both)("symbol_ok"))
    // either symbol alone above 0.1 per word fails
    assert(!flags(base + " # # # # # #")("symbol_ok"))
    // the single-codepoint U+2026 ellipsis counts toward the ellipsis gate
    assert(!flags(base + " … … … … … …")("symbol_ok"))
  }

  test("boundary arithmetic: mean word length exactly 3 and exactly 10 pass") {
    // 12 words of exactly 3 chars, incl. 'the' twice (stop evidence needs
    // two DISTINCT entries: 'the' + 'and')
    val exactly3 = "the and abc def ghi jkl mno pqr stu vwx yza bcd"
    assert(flags(exactly3)("mwl_ok"))
    val exactly10 = (Seq.fill(10)("abcdefghij") ++ Seq("the", "and"))
      .map(w => if (w.length < 10) w + "x" * (10 - w.length) else w)
      .mkString(" ")
    assert(flags(exactly10)("mwl_ok"))
  }

  test("stopword evidence counts DISTINCT entries, not occurrences") {
    val repeated = Seq.fill(12)("the").mkString(" ")
    assert(!flags(repeated)("stopword_ok"))
  }

  test("duplicateLineStats: exact counts and the 30%/20% gates on hand-built docs") {
    // doc 1: 5 lines, 'nav bar' twice (4 dup lines? no — 2 occurrences
    // of one line text) => dup_lines = 2, dup chars = 2*7
    val d1 = Seq("nav bar", "unique one", "nav bar", "unique two", "unique three")
      .mkString("\n")
    // doc 2: all lines distinct
    val d2 = Seq("alpha", "beta", "gamma").mkString("\n")
    // doc 3: 10 lines, 9 copies of a long line => fails both gates
    val d3 = (Seq.fill(9)("repeated boilerplate line") :+ "x").mkString("\n")
    val out = Quality.duplicateLineStats(
      Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("dup_lines"),
          r.getAs[Long]("dup_line_chars"), r.getAs[Boolean]("dup_line_ok")))
      .toMap
    assert(out(1L) === ((5L, 2L, 14L, false))) // 2/5 = 40% > 30% lines
    assert(out(2L) === ((3L, 0L, 0L, true)))
    assert(out(3L)._2 === 9L && !out(3L)._4)
  }

  test("c4Clean: line rules, page rules, and the rewritten text") {
    val page = Seq(
      "this line ends properly enough.",     // kept (5 words)
      "short one.",                          // dropped: 2 words < 5
      "no terminal punctuation on this line", // dropped: no . ! ? \"
      "does it end with a question?",        // kept
      "enable JavaScript to continue reading now.", // dropped: javascript
      "a quoted line ends right here\"",     // kept
      "an exclaimed line ends right here!"   // kept
    ).mkString("\n")
    val docs = Seq(
      (1L, page),
      (2L, page + "\nsome Lorem Ipsum filler."),        // page drop
      (3L, page + "\nif (x) { return; } and more."),    // page drop: brace
      (4L, "one good line ends right here.\nanother good line ends here.") // < 3 kept
    ).toDF("doc_id", "text")
    val out = Quality.c4Clean(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("n_kept_lines"), r.getString(1)))
      .toMap
    assert(out.keySet === Set(1L))
    assert(out(1L)._1 === 4)
    assert(out(1L)._2 === Seq(
      "this line ends properly enough.",
      "does it end with a question?",
      "a quoted line ends right here\"",
      "an exclaimed line ends right here!").mkString("\n"))
    intercept[IllegalArgumentException] { Quality.c4Clean(docs, minLines = 0) }
    intercept[IllegalArgumentException] {
      Quality.c4Clean(docs.withColumn("n_kept_lines",
        org.apache.spark.sql.functions.lit(1)))
    }
  }

  test("gopherFilter and c4Clean are stream-composable: micro-batches equal batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .filter($"doc_id" < 150).select("doc_id", "text")
    val stops = Quality.GopherStopWords :+ "a"
    val batchKeep = Quality.gopherFilter(docs, minWords = 30, stopWords = stops)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKeep.nonEmpty && batchKeep.size < 150)
    val in = MemoryStream[(Long, String)]
    val q = Quality.gopherFilter(in.toDF().toDF("doc_id", "text"),
        minWords = 30, stopWords = stops)
      .writeStream.outputMode("append").format("memory")
      .queryName("gopher_stream_out").start()
    try {
      val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      in.addData(rows.take(70).toSeq: _*)
      q.processAllAvailable()
      in.addData(rows.drop(70).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("gopher_stream_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === batchKeep)
    } finally q.stop()
    // c4Clean: same stateless contract, rewritten text included
    val lined = docs.withColumn("text", org.apache.spark.sql.functions
      .regexp_replace($"text", "((?:\\S+ ){4}\\S+) ", "$1.\n"))
    val batchC4 = Quality.c4Clean(lined).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val in2 = MemoryStream[(Long, String)]
    val q2 = Quality.c4Clean(in2.toDF().toDF("doc_id", "text"))
      .select("doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("c4_stream_out").start()
    try {
      in2.addData(lined.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q2.processAllAvailable()
      val streamed = spark.table("c4_stream_out")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed === batchC4)
    } finally q2.stop()
  }

  test("gopherFilter keeps passers with the original schema; validation fails fast") {
    val df = Seq((1L, goodWords), (2L, "tiny")).toDF("doc_id", "text")
    val kept = Quality.gopherFilter(df, "text", minWords = 10)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.collect().map(_.getLong(0)).toSeq === Seq(1L))
    intercept[IllegalArgumentException] {
      Quality.gopherQuality(df, "text", minWords = 0)
    }
    intercept[IllegalArgumentException] {
      Quality.gopherQuality(df, "text", stopWords = Seq("the"))
    }
    intercept[IllegalArgumentException] {
      Quality.gopherQuality(df.withColumn("wc_ok",
        org.apache.spark.sql.functions.lit(true)), "text")
    }
  }
}
