package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.GopherStats]] bit-compatibility: the fused kernel
  * must equal the raw Column composition it replaced (split("\s+") +
  * aggregate/filter HOFs + regexp length-diffs) counter-for-counter on
  * adversarial and randomized inputs — Java split(-1) empty-element
  * semantics, codepoint counting, non-overlapping dot runs, Java-\s
  * line anchors, list-entry stopword counting. */
class QualityKernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stops = Seq("the", "a", "of", "the") // duplicate on purpose

  private def compareOn(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .withColumn("toks", split(col("text"), "\\s+"))
      .withColumn("lines", split(col("text"), "\n"))
    val expected = df.select(col("id"),
        size(col("toks")).as("n"),
        aggregate(col("toks"), lit(0L), (acc, w) => acc + length(w)).as("tot_len"),
        (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
          .as("hash_cnt"),
        ((length(col("text")) -
          length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
          .cast("int").as("ell3_cnt"),
        (length(col("text")) - length(regexp_replace(col("text"), "…", "")))
          .as("uni_ell_cnt"),
        size(col("lines")).as("n_lines"),
        size(filter(col("lines"), l => l.rlike("^\\s*[-*•]"))).as("bullet_cnt"),
        size(filter(col("lines"), l => l.rlike("\\.\\.\\.\\s*$"))).as("ell_end_cnt"),
        size(filter(col("toks"), w => w.rlike("[A-Za-z]"))).as("alpha_cnt"),
        size(filter(array(stops.map(lit): _*),
          s => array_contains(col("toks"), s))).as("stop_cnt"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val got = df.select(col("id"),
        graft.functions.QualityFunctions.gopherStats(col("text"), stops).as("g"))
      .select(col("id"), col("g.n"), col("g.tot_len"), col("g.hash_cnt"),
        col("g.ell3_cnt"), col("g.uni_ell_cnt"), col("g.n_lines"),
        col("g.bullet_cnt"), col("g.ell_end_cnt"), col("g.alpha_cnt"),
        col("g.stop_cnt"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    for ((id, exp) <- expected)
      assert(got(id) === exp,
        s"counter mismatch on ${texts(id.toInt).replace("\n", "\\n")}")
  }

  test("adversarial fixtures: split edges, dot runs, unicode, line anchors") {
    compareOn(Seq(
      "the quick brown fox",
      "  leading and   multiple   spaces  ",
      "tabs\tand\u000Bvt\fand\rcr separators",
      "", " ", "\n", "a\n\nb\n",
      ". .. ... .... ..... ...... .......",
      "dots...inside and trailing...",
      "u2026 … here …… and mixed ...…",
      "# one # two ## three #…#",
      "- bullet line\n  * indented\n\t• tab bullet\nplain line\n-joined",
      "ends with dots...\nends with dots...  \nends with dots... x\n...",
      "emoji 😀 token and 123 456 mixed a1b",
      "the the the a of of stopwords",
      "NBSP is not java whitespace",
      "CRLF line one\r\nline two",   // \r is \s: token break, not a line
      "x" * 500 + " " + "." * 9))
  }

  test("randomized parity: 300 strings over a hostile alphabet") {
    val alphabet = "ab.# …\n\t-*•ZZ  ....の😀\r"
    val rnd = new scala.util.Random(29)
    val texts = (0 until 300).map { _ =>
      val n = rnd.nextInt(80)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        val c = alphabet.charAt(rnd.nextInt(alphabet.length))
        // keep surrogate pairs intact: the emoji occupies two chars
        if (Character.isHighSurrogate(c)) sb.append("😀") else sb.append(c)
      }
      sb.toString
    }
    compareOn(texts)
  }

  test("C4KeptLines parity: kernel equals the Column filter composition") {
    def expectKept(texts: Seq[String], minWords: Int): Map[Long, Seq[String]] =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), filter(split(col("text"), "\n"), l =>
          l.rlike("[.!?\"]\\s*$") &&
            size(split(l, "\\s+")) >= minWords &&
            !lower(l).contains("javascript")).as("kept"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    def gotKept(texts: Seq[String], minWords: Int): Map[Long, Seq[String]] =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), graft.functions.QualityFunctions
          .c4KeptLines(col("text"), minWords).as("kept"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val fixtures = Seq(
      "good five word line here.\nshort one.\nno punct line at all",
      "ends bang with five words!\nends q with five words?\nquoted five word line here\"",
      "enable JAVASCRIPT to continue now.\njavascript lowercase sentence keeps going.",
      "trailing spaces after punct five.   \n\ttab lead five word line.",
      "", "\n", "only.\n.\n. . . . .",
      "JAVASCRİPT dotted capital keeps five.", // Turkish İ must not fold to ascii i+dot match
      "line with… unicode five words.")
    for (mw <- Seq(1, 3, 5))
      assert(gotKept(fixtures, mw) === expectKept(fixtures, mw), s"minWords=$mw")
    val alphabet = "word. !?\"\n\t javascript J 五"
    val rnd = new scala.util.Random(31)
    val rand = (0 until 200).map { _ =>
      (0 until rnd.nextInt(60)).map(_ =>
        alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    }
    assert(gotKept(rand, 3) === expectKept(rand, 3))
  }

  test("SQL-visible registrations: gopher_stats / c4_kept_lines / strip_lines_by_key") {
    graft.functions.QualityFunctions.register(spark)
    Seq((1L, "the good line ends here.\nbad")).toDF("id", "text")
      .createOrReplaceTempView("qk_docs")
    val r = spark.sql(
      """SELECT gopher_stats(text, array('the', 'a')).n AS n,
        |  size(c4_kept_lines(text, 3)) AS kept,
        |  strip_lines_by_key(text, array(md5('bad'))).n_dropped AS dropped
        |FROM qk_docs""".stripMargin).collect().head
    assert(r.getInt(0) === 6 && r.getInt(1) === 1 && r.getInt(2) === 1)
    // literal-argument validation fails at analysis, not mid-job
    intercept[Exception] {
      spark.sql("SELECT gopher_stats(text, id) FROM qk_docs").collect()
    }
  }

  test("gopherQuality end-to-end flags unchanged by the kernel swap (fixture)") {
    // the q132 fixture shape at sf0.001: multi-line + symbol injections —
    // flags must match a hand-built Column-composition replica
    val ml = concat(
      regexp_replace(col("text"), "((?:\\S+ ){1}\\S+) ", "$1\n"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        lit("\n# # # # # # # # big sale")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        lit("\nwait... … … … … … … more")).otherwise(lit("")))
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .withColumn("text", ml)
    val viaKernel = graft.ops.Quality.gopherQuality(docs, "text",
        minWords = 30, stopWords = graft.ops.Quality.GopherStopWords :+ "a")
      .select("doc_id", "wc_ok", "mwl_ok", "symbol_ok", "bullet_ok",
        "alpha_ok", "stopword_ok", "gopher_keep")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // raw Column replica of the pre-kernel formulas
    val t = col("text")
    val toks = split(t, "\\s+")
    val lines = split(t, "\n")
    val n = size(col("__toks"))
    val nLines = size(col("__lines"))
    val totLen = aggregate(col("__toks"), lit(0), (acc, w) => acc + length(w))
    val hashCnt = length(t) - length(regexp_replace(t, "#", ""))
    val ellLenDiff = length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))
    val uniEllCnt = length(t) - length(regexp_replace(t, "…", ""))
    val bulletCnt = size(filter(col("__lines"), l => l.rlike("^\\s*[-*•]")))
    val ellEndCnt = size(filter(col("__lines"), l => l.rlike("\\.\\.\\.\\s*$")))
    val alphaCnt = size(filter(col("__toks"), w => w.rlike("[A-Za-z]")))
    val stopW = graft.ops.Quality.GopherStopWords :+ "a"
    val stopCnt = size(filter(array(stopW.map(lit): _*),
      s => array_contains(col("__toks"), s)))
    val viaColumns = docs
      .withColumn("__toks", toks).withColumn("__lines", lines)
      .select(col("doc_id"),
        (n >= 30 && n <= 100000).as("wc_ok"),
        (lit(3) * n <= totLen && totLen <= lit(10) * n).as("mwl_ok"),
        (hashCnt * lit(10) <= n &&
          (ellLenDiff + lit(3) * uniEllCnt) * lit(10) <= lit(3) * n).as("symbol_ok"),
        (bulletCnt * lit(10) <= nLines &&
          ellEndCnt * lit(10) <= lit(3) * nLines).as("bullet_ok"),
        (alphaCnt * lit(10) >= lit(8) * n).as("alpha_ok"),
        (stopCnt >= 2).as("stopword_ok"))
      .withColumn("gopher_keep",
        col("wc_ok") && col("mwl_ok") && col("symbol_ok") &&
          col("bullet_ok") && col("alpha_ok") && col("stopword_ok"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(viaKernel === viaColumns)
  }
}
