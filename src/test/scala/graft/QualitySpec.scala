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
