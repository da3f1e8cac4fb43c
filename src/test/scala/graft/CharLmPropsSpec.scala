package graft

import graft.ops.CharLm
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property suite for the char-trigram LM: the native codegen kernels
  * (codepoint-window extraction, broadcast-model nanonat summing) are
  * pinned to a plain driver-side reimplementation over random unicode
  * strings — including multibyte and supplementary-plane codepoints,
  * where a bytes-vs-chars-vs-codepoints slip would silently change
  * trigram identity. */
object CharLmPropsSpec extends Properties("CharLm") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  /** Driver-side n-gram extraction by codepoints. */
  private def bruteTris(s: String, n: Int = 3): Seq[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < n) Seq.empty
    else (0 to cps.length - n).map(i => new String(cps, i, n))
  }

  // ascii, accents, CJK, and a supplementary-plane char (U+1D11E)
  private val charGen = Gen.oneOf(
    "a", "b", " ", "é", "ß", "好", new String(Character.toChars(0x1D11E)))
  private val textGen = for {
    len <- Gen.choose(0, 12)
    cs <- Gen.listOfN(len, charGen)
  } yield cs.mkString

  private val corpusGen = for {
    n <- Gen.choose(1, 6)
    texts <- Gen.listOfN(n, textGen)
  } yield texts

  property("char_ngrams equals codepoint-window extraction for n in 2..5") =
    forAll(corpusGen, Gen.choose(2, 5)) { (texts, n) =>
      import spark.implicits._
      val got = texts.toDF("text")
        .select(graft.functions.CharLmFunctions.charNgrams(
          org.apache.spark.sql.functions.col("text"), n).as("t"))
        .as[Seq[String]].collect().toSeq
      got == texts.map(t => bruteTris(t, n))
    }

  property("score equals the driver-side nanonat fold for any corpus and order") =
    forAll(corpusGen, corpusGen, Gen.choose(2, 4)) {
      (docTexts, trainTexts, order) =>
        import spark.implicits._
        val train = trainTexts.toDF("text")
        val hasTris = trainTexts.exists(t => t.codePointCount(0, t.length) >= order)
        if (!hasTris) true // fit correctly rejects empty slices (spec'd)
        else {
          val model = CharLm.fit(CharLm.trainCounts(train, order = order))
          val docs = docTexts.zipWithIndex
            .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
          val got = CharLm.score(docs, model)
            .select("doc_id", "nll_nano").as[(Long, Long)].collect().toMap
          // brute: counts -> add-one logp -> nanonat round -> per-doc sum
          val counts = trainTexts.flatMap(t => bruteTris(t, order))
            .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
          val t = counts.values.sum
          val denom = (t + counts.size + 1).toDouble
          def nano(x: Double): Long = {
            val y = math.log(x) * 1e9
            (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
          }
          val unseen = nano(1.0 / denom)
          val want = docTexts.zipWithIndex.map { case (txt, i) =>
            i.toLong -> -bruteTris(txt, order).map(g =>
              counts.get(g).map(c => nano((c + 1.0) / denom)).getOrElse(unseen)).sum
          }.toMap
          got == want
        }
    }
}
