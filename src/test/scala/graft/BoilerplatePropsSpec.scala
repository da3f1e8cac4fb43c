package graft

import graft.ops.Boilerplate
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property suite for repeated-span extraction: the Spark pipeline
  * (positional md5 grams → df threshold → semi-join → gaps-and-islands
  * window) is pinned to a straightforward driver-side reimplementation
  * over randomly generated corpora from a tiny token alphabet (so
  * cross-document common grams actually arise), catching off-by-one
  * drift in window ends, merge adjacency, or df accounting that a
  * single hand case could miss. */
object BoilerplatePropsSpec extends Properties("Boilerplate") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  /** Driver-side reference: positions of n-grams whose distinct-doc
    * frequency >= minDf, merged into maximal spans (merge iff the next
    * common position starts within n tokens of the previous). */
  private def bruteSpans(docs: Seq[(Long, String)], n: Int, minDf: Int)
      : Set[(Long, Int, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" +", -1).toSeq }.toMap
    def grams(id: Long): Seq[(Int, String)] = {
      val ts = toks(id)
      if (ts.length < n) Seq.empty
      else (0 to ts.length - n).map(i => i -> ts.slice(i, i + n).mkString(" "))
    }
    val df = docs.flatMap { case (id, _) => grams(id).map(_._2).distinct }
      .groupBy(identity).map { case (g, occ) => g -> occ.size }
    val common = df.filter(_._2 >= minDf).keySet
    docs.flatMap { case (id, _) =>
      val pos = grams(id).collect { case (p, g) if common(g) => p }.sorted
      if (pos.isEmpty) Seq.empty
      else {
        val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
        var (s, e) = (pos.head, pos.head + n - 1)
        for (p <- pos.tail) {
          if (p - (e - n + 1) <= n) e = p + n - 1 // merges iff gap <= n
          else { spans += ((s, e)); s = p; e = p + n - 1 }
        }
        spans += ((s, e))
        spans.map { case (a, b) => (id, a, b) }
      }
    }.toSet
  }

  /** Driver-side strip: drop tokens covered by any brute span. */
  private def bruteStrip(docs: Seq[(Long, String)], spans: Set[(Long, Int, Int)])
      : Map[Long, String] =
    docs.map { case (id, t) =>
      val ts = t.split(" +", -1)
      id -> ts.zipWithIndex.collect {
        case (tok, i) if !spans.exists(s => s._1 == id && i >= s._2 && i <= s._3) => tok
      }.mkString(" ")
    }.toMap

  private val tokenGen = Gen.oneOf("a", "b", "c", "d", "e")
  private val docGen = for {
    len <- Gen.choose(0, 14)
    toks <- Gen.listOfN(len, tokenGen)
  } yield toks.mkString(" ")
  private val corpusGen = for {
    nDocs <- Gen.choose(2, 8)
    texts <- Gen.listOfN(nDocs, docGen)
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("repeatedSpans equals the brute-force reference") =
    forAll(corpusGen, Gen.choose(2, 3), Gen.choose(2, 3)) { (docs, n, minDf) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val got = Boilerplate.repeatedSpans(df, "doc_id", "text", n, minDf)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      val want = bruteSpans(docs, n, minDf)
      spark.catalog.clearCache() // release the per-call occurrence frame
      got == want
    }

  property("stripRepeatedSpans equals the brute-force strip") =
    forAll(corpusGen, Gen.choose(2, 3)) { (docs, n) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val spans = Boilerplate.repeatedSpans(df, "doc_id", "text", n, minDf = 2)
      val got = Boilerplate.stripRepeatedSpans(df, spans, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = bruteStrip(docs, bruteSpans(docs, n, 2))
      spark.catalog.clearCache()
      got == want
    }
}
