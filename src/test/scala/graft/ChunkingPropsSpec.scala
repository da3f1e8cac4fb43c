package graft

import graft.ops.Chunking
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Chunking invariants over generated documents and window geometries:
  * dropping each chunk's overlap prefix and concatenating rebuilds the
  * document exactly (no token lost, duplicated, or reordered), chunk
  * counts match the closed form, and every chunk except the last is
  * full-width. */
object ChunkingPropsSpec extends Properties("Chunking") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private case class Case(nTok: Int, chunkSize: Int, overlap: Int)
  private val caseGen: Gen[Case] = for {
    n <- Gen.choose(1, 400)
    size <- Gen.choose(2, 64)
    ov <- Gen.choose(0, size - 1)
  } yield Case(n, size, ov)

  property("drop-overlap concatenation rebuilds the document") =
    forAll(caseGen) { c =>
      import spark.implicits._
      val text = (1 to c.nTok).map(i => s"t$i").mkString(" ")
      val rows = Chunking.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", c.chunkSize, c.overlap)
        .orderBy("chunk_id").collect()
      val step = c.chunkSize - c.overlap
      val expectChunks =
        if (c.nTok <= c.chunkSize) 1
        else 1 + (c.nTok - c.chunkSize + step - 1) / step
      val rebuilt = rows.zipWithIndex.flatMap { case (r, i) =>
        val ts = r.getString(3).split(" ")
        if (i == 0) ts else ts.drop(c.overlap)
      }.toSeq
      val widthsOk = rows.dropRight(1).forall(_.getInt(4) == c.chunkSize)
      rows.length == expectChunks &&
        rows.forall(_.getInt(1) == expectChunks) &&
        widthsOk &&
        rebuilt == (1 to c.nTok).map(i => s"t$i")
    }
}
