package graft

import graft.functions.BpeModel
import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer + encoder: the classic textbook merge sequence, the
  * lossless-reconstruction invariant (tokens always reassemble the
  * exact word stream, for ANY merge table), monotone compression, and
  * partitioning-independence. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("trainMerges reproduces the Sennrich low/lower/newest/widest sequence") {
    import spark.implicits._
    val corpus =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.map(Tuple1(_)).toDF("text")
    val model = Bpe.trainMerges(Bpe.wordCounts(df), numMerges = 5)
    // hand-derived: es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7),
    // ties broken pair-lexicographically ascending
    assert(model.merges.toSeq == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    val toks = Bpe.encode(Seq((1L, "lowest low")).toDF("doc_id", "text"), model)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(toks == Seq("low", "est</w>", "low", "</w>"))
  }

  test("tie-break uses code-point order, not UTF-16 code-unit order") {
    // U+1F600 (supplementary, UTF-16 lead unit 0xD83D) vs U+F000 (BMP
    // private use): Java String order sorts the emoji FIRST (0xD83D <
    // 0xF000); code-point order — Spark UTF8String binary, DuckDB
    // default collation, and the q145 oracle's ORDER BY — sorts it
    // LAST (0x1F600 > 0xF000). A tied pair count must pick U+F000.
    val emoji = new String(Character.toChars(0x1F600))
    val bmp = "\uF000"
    assert(Bpe.cpCompare(bmp, emoji) < 0 && bmp.compareTo(emoji) > 0,
      "fixture must sit exactly where the two orders diverge")
    // two words, equal count -> step 1 pairs (emoji,</w>) and (bmp,</w>)
    // tie at 2; code-point order merges (bmp,</w>) first
    val model = graft.ops.Bpe.trainLocal(
      Seq(emoji -> 2L, bmp -> 2L), numMerges = 1)
    assert(model.merges.toSeq == Seq((bmp, "</w>")))
  }

  test("lossless: tokens reassemble the word stream under any merge table") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(120)
    val model = Bpe.trainMerges(Bpe.wordCounts(docs), numMerges = 100)
    val rows = Bpe.encode(docs, model)
      .select(col("text"), col("bpe_tokens")).collect()
    rows.foreach { r =>
      val expect = r.getString(0).split(" +", -1).filter(_.nonEmpty)
        .map(_ + "</w>").mkString("")
      assert(r.getSeq[String](1).mkString("") == expect)
    }
  }

  test("more merges never inflate the token count; zero merges = codepoints") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(80).select("doc_id", "text")
    val wc = Bpe.wordCounts(docs)
    val m0 = Bpe.trainMerges(wc, 0)
    val m50 = Bpe.trainMerges(wc, 50)
    val m200 = Bpe.trainMerges(wc, 200)
    def counts(m: graft.functions.BpeModel) =
      Bpe.encode(docs, m).select("doc_id", "n_bpe")
        .as[(Long, Int)].collect().toMap
    val (c0, c50, c200) = (counts(m0), counts(m50), counts(m200))
    c0.keys.foreach { id =>
      assert(c50(id) <= c0(id) && c200(id) <= c50(id),
        s"doc $id: ${c0(id)} -> ${c50(id)} -> ${c200(id)}")
    }
    // zero merges: every codepoint is a token plus one </w> per word
    val raw = docs.select(col("doc_id"),
      aggregate(
        filter(split(col("text"), " +"), w => w =!= ""),
        lit(0),
        (acc, w) => acc + length(w) + 1).as("expect"))
      .as[(Long, Int)].collect().toMap
    c0.keys.foreach(id => assert(c0(id) == raw(id)))
  }

  test("training and encoding are partitioning-independent") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(100).select("doc_id", "text")
    val a = Bpe.trainMerges(Bpe.wordCounts(docs.repartition(7)), 60)
    val b = Bpe.trainMerges(Bpe.wordCounts(docs.repartition(2)), 60)
    assert(a.merges.toSeq == b.merges.toSeq,
      "merge sequence must not depend on partitioning")
    val ea = Bpe.encode(docs.repartition(5), a).select("doc_id", "n_bpe")
      .as[(Long, Int)].collect().toMap
    val eb = Bpe.encode(docs.repartition(3), b).select("doc_id", "n_bpe")
      .as[(Long, Int)].collect().toMap
    assert(ea == eb)
  }

  test("merge table round-trips; corrupt rank sequences are rejected") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(60)
    val model = Bpe.trainMerges(Bpe.wordCounts(docs), 40)
    val dir = java.nio.file.Files.createTempDirectory("bpe_merges").toString
    Bpe.saveMerges(spark, model, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded.merges.toSeq == model.merges.toSeq)
    val ea = Bpe.encode(docs, model).select("doc_id", "n_bpe")
      .as[(Long, Int)].collect().toMap
    val eb = Bpe.encode(docs, loaded).select("doc_id", "n_bpe")
      .as[(Long, Int)].collect().toMap
    assert(ea == eb)
    // a truncated table (rank gap) must fail loudly, not re-rank
    val dir2 = java.nio.file.Files.createTempDirectory("bpe_bad").toString
    spark.read.parquet(dir).filter(col("rank") =!= 1)
      .write.mode("overwrite").parquet(dir2)
    val e = intercept[IllegalArgumentException](Bpe.loadMerges(spark, dir2))
    assert(e.getMessage.contains("truncated or"))
  }

  test("baseSymbols: codepoint alphabet with the end-of-word marker") {
    assert(BpeModel.baseSymbols("héllo").toSeq ==
      Seq("h", "é", "l", "l", "o", "</w>"))
    val supp = new String(Character.toChars(0x1D11E))
    assert(BpeModel.baseSymbols("a" + supp).toSeq == Seq("a", supp, "</w>"))
  }
}
