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

  /** Driver-side trigram extraction by codepoints. */
  private def bruteTris(s: String): Seq[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < 3) Seq.empty
    else (0 to cps.length - 3).map(i => new String(cps, i, 3))
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

  property("char_trigrams equals codepoint-window extraction") =
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val got = texts.toDF("text")
        .select(graft.functions.CharLmFunctions.charTrigrams(
          org.apache.spark.sql.functions.col("text")).as("t"))
        .as[Seq[String]].collect().toSeq
      got == texts.map(bruteTris)
    }

  property("score equals the driver-side nanonat fold for any corpus") =
    forAll(corpusGen, corpusGen) {
      (docTexts, trainTexts) =>
        import spark.implicits._
        val train = trainTexts.toDF("text")
        val hasTris = trainTexts.exists(t => t.codePointCount(0, t.length) >= 3)
        if (!hasTris) true // fit correctly rejects empty slices (spec'd)
        else {
          val model = CharLm.fit(CharLm.trainCounts(train))
          val docs = docTexts.zipWithIndex
            .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
          val got = CharLm.score(docs, model)
            .select("doc_id", "nll_nano").as[(Long, Long)].collect().toMap
          // brute: counts -> add-one logp -> nanonat round -> per-doc sum
          val counts = trainTexts.flatMap(bruteTris)
            .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
          val t = counts.values.sum
          val denom = (t + counts.size + 1).toDouble
          def nano(x: Double): Long = {
            val y = math.log(x) * 1e9
            (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
          }
          val unseen = nano(1.0 / denom)
          val want = docTexts.zipWithIndex.map { case (txt, i) =>
            i.toLong -> -bruteTris(txt).map(g =>
              counts.get(g).map(c => nano((c + 1.0) / denom)).getOrElse(unseen)).sum
          }.toMap
          got == want
        }
    }
}
