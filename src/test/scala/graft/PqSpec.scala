package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization + int8 scalar-quantization behavior: exact ADC
  * when the codebooks contain the true subvectors, trained-codebook
  * determinism and recall against the brute-force baseline, the
  * IVF-PQ full-probe ≡ plain-PQ identity, and the int8 reconstruction
  * error bound. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Codebooks whose subspace-s codewords are exactly the corpus's
    * subvectors: encoding is then lossless, so ADC equals the true
    * squared L2 distance. */
  private def losslessCodebooks(vecs: Seq[Array[Double]], m: Int)
      : Array[Array[Array[Double]]] = {
    val dsub = vecs.head.length / m
    Array.tabulate(m)(s => vecs.map(_.slice(s * dsub, (s + 1) * dsub)).toArray)
  }

  test("ADC is exact when codebooks contain the true subvectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(12)(Array.fill(8)(rnd.nextDouble() - 0.5))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
    val cbs = losslessCodebooks(vecs, m = 2)
    val corpus = df.filter(col("vec_id") >= 2)
    val queries = df.filter(col("vec_id") < 2)
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", cbs, k = 3)
      .select("q_id", "rk", "c_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // exact L2 ranking computed directly
    val exact = (for {
      (q, qi) <- vecs.zipWithIndex.take(2)
    } yield {
      val byDist = vecs.zipWithIndex.drop(2)
        .map { case (c, ci) =>
          (c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, ci.toLong) }
        .sortBy(identity).take(3)
      byDist.zipWithIndex.map { case ((_, ci), rk) => (qi.toLong, rk + 1, ci) }
    }).flatten.toSet
    assert(pq == exact, s"pq=$pq exact=$exact")
  }

  test("trained PQ codebooks are deterministic per seed and shaped (m, ksub, dsub)") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val a = Similarity.trainPqCodebooks(e, "embedding", dim = 64, m = 4, ksub = 8,
      iters = 2, seed = 11L)
    val b = Similarity.trainPqCodebooks(e, "embedding", dim = 64, m = 4, ksub = 8,
      iters = 2, seed = 11L)
    assert(a.length == 4 && a.forall(_.length == 8) &&
      a.forall(_.forall(_.length == 16)))
    assert(a.zip(b).forall { case (sa, sb) =>
      sa.zip(sb).forall { case (ca, cb) => ca.sameElements(cb) } })
  }

  test("PQ ADC top-k recalls a reasonable fraction of the exact neighbors") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    // embeddings are unit-norm, so exact-cosine and exact-L2 rankings agree
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cbs = Similarity.trainPqCodebooks(corpus, "embedding", dim = 64, m = 4,
      ksub = 16, iters = 5)
    // the operator contract is candidate PRE-ranking: fetch a wider PQ
    // top-k, then exact-rerank. Measure how much of the exact top-5 the
    // PQ top-25 candidate set recovers (the rerank can only keep what PQ
    // surfaced). Chance level for 25 of 490 candidates is ~5%.
    val cands = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", cbs, k = 25)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candRecall = (exact intersect cands).size.toDouble / exact.size
    assert(candRecall >= 0.3, s"candidate recall@25=$candRecall")
    // and the direct top-5 must beat chance (5/490 ≈ 1%) clearly — these
    // near-random 64-dim embeddings are the hard case for 4×16 codebooks
    val approx = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", cbs, k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.06, s"recall=$recall")
  }

  test("IVF-PQ with full probe equals plain PQ; nprobe=1 stays bounded") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val corpus = e.filter(col("vec_id") >= 5)
    val cents = Similarity.trainIvfCentroids(corpus, "embedding", kCells = 4, iters = 3)
    val cbs = Similarity.trainPqCodebooks(corpus, "embedding", dim = 64, m = 4,
      ksub = 8, iters = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rk", "c_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // probing every cell scores every (q, c) pair → identical to plain PQ
    val full = rows(Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      cents, cbs, k = 3, nprobe = 4))
    val plain = rows(Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
      cbs, k = 3))
    assert(full == plain)
    // single probe: ≤ k rows per query, no duplicate (q, c) pairs
    val one = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      cents, cbs, k = 3, nprobe = 1)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.length == one.toSet.size)
    assert(one.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("encoded codes table reproduces pqTopK without touching raw vectors") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val corpus = e.filter(col("vec_id") >= 5)
    val cbs = Similarity.trainPqCodebooks(corpus, "embedding", dim = 64, m = 4,
      ksub = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("pq_codes").toString
    Similarity.pqEncode(corpus, "vec_id", "embedding", cbs, dir)
    val codes = spark.read.parquet(dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rk", "c_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val onCodes = rows(Similarity.pqTopKOnCodes(codes, queries, "vec_id",
      "embedding", cbs, k = 3))
    val direct = rows(Similarity.pqTopK(corpus, queries, "vec_id",
      "embedding", cbs, k = 3))
    assert(onCodes == direct)
  }

  test("appended codes tables reproduce the one-shot encode (daily-ingest path)") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val corpus = e.filter(col("vec_id") >= 5)
    val base = corpus.filter(col("vec_id") < 300)
    val batch = corpus.filter(col("vec_id") >= 300)
    val cbs = Similarity.trainPqCodebooks(corpus, "embedding", dim = 64, m = 4,
      ksub = 8, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rk", "c_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // PQ: build on the base, append the batch, query the grown table
    val dir = java.nio.file.Files.createTempDirectory("pq_append").toString
    Similarity.pqEncode(base, "vec_id", "embedding", cbs, dir)
    Similarity.pqEncodeAppend(batch, "vec_id", "embedding", cbs, dir)
    val grown = rows(Similarity.pqTopKOnCodes(spark.read.parquet(dir),
      queries, "vec_id", "embedding", cbs, k = 3))
    val oneShot = rows(Similarity.pqTopK(corpus, queries, "vec_id",
      "embedding", cbs, k = 3))
    assert(grown == oneShot)
    // IVF-PQ: same lifecycle over the (id, cell, codes) index table
    val cents = Similarity.trainIvfCentroids(corpus, "embedding", kCells = 4,
      iters = 3, seed = 7L)
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpq_append").toString
    Similarity.ivfPqEncode(base, "vec_id", "embedding", cents, cbs, dir2)
    Similarity.ivfPqEncodeAppend(batch, "vec_id", "embedding", cents, cbs, dir2)
    val grown2 = rows(Similarity.ivfPqTopKOnCodes(spark.read.parquet(dir2),
      queries, "vec_id", "embedding", cents, cbs, k = 3, nprobe = 2))
    val oneShot2 = rows(Similarity.ivfPqTopK(corpus, queries, "vec_id",
      "embedding", cents, cbs, k = 3, nprobe = 2))
    assert(grown2 == oneShot2)
  }

  test("codes-table metadata rejects mismatched or mixed index state") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val corpus = e.filter(col("vec_id") >= 5)
    val cbs = Similarity.trainPqCodebooks(corpus, "embedding", dim = 64,
      m = 4, ksub = 8, iters = 2, seed = 1L)
    val retrained = Similarity.trainPqCodebooks(corpus, "embedding", dim = 64,
      m = 4, ksub = 8, iters = 2, seed = 2L)
    val dir = java.nio.file.Files.createTempDirectory("pq_meta").toString
    Similarity.pqEncode(corpus, "vec_id", "embedding", cbs, dir)
    val codes = spark.read.parquet(dir)
    // querying under retrained codebooks would rank with codes that
    // index the wrong codewords — the metadata hash fails it loudly
    val err = intercept[IllegalArgumentException] {
      Similarity.pqTopKOnCodes(codes, queries, "vec_id", "embedding",
        retrained, k = 3)
    }
    assert(err.getMessage.contains("index"), err.getMessage)
    // a mismatched roundDp is the same corruption class
    val err2 = intercept[IllegalArgumentException] {
      Similarity.pqTopKOnCodes(codes, queries, "vec_id", "embedding",
        cbs, k = 3, roundDp = 6)
    }
    assert(err2.getMessage.contains("round_dp"), err2.getMessage)
    // an append under retrained codebooks makes a MIXED table: the
    // min/max probe rejects it for EITHER caller state
    Similarity.pqEncodeAppend(corpus.limit(10), "vec_id", "embedding",
      retrained, dir)
    val mixed = spark.read.parquet(dir)
    val err3 = intercept[IllegalArgumentException] {
      Similarity.pqTopKOnCodes(mixed, queries, "vec_id", "embedding",
        cbs, k = 3)
    }
    assert(err3.getMessage.contains("mixes"), err3.getMessage)
    // pre-metadata tables are rejected with a rebuild pointer
    val err4 = intercept[IllegalArgumentException] {
      Similarity.pqTopKOnCodes(codes.drop("cb_hash"), queries, "vec_id",
        "embedding", cbs, k = 3)
    }
    assert(err4.getMessage.contains("metadata"), err4.getMessage)
  }

  test("persisted IVF-PQ index table reproduces ivfPqTopK (build-once query path)") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val corpus = e.filter(col("vec_id") >= 5)
    val cents = Similarity.trainIvfCentroids(corpus.select("embedding"),
      "embedding", kCells = 4, iters = 2)
    val cbs = Similarity.trainPqCodebooks(corpus, "embedding", dim = 64, m = 4,
      ksub = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_codes").toString
    Similarity.ivfPqEncode(corpus, "vec_id", "embedding", cents, cbs, dir,
      roundDp = 6)
    val codes = spark.read.parquet(dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rk", "c_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    for (nprobe <- Seq(1, 2, 4)) {
      val onCodes = rows(Similarity.ivfPqTopKOnCodes(codes, queries, "vec_id",
        "embedding", cents, cbs, k = 3, nprobe = nprobe, roundDp = 6))
      val direct = rows(Similarity.ivfPqTopK(corpus, queries, "vec_id",
        "embedding", cents, cbs, k = 3, nprobe = nprobe, roundDp = 6))
      assert(onCodes == direct, s"nprobe=$nprobe")
    }
  }

  test("codebook save/load round-trips and rejects a sparse code range") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val cbs = Similarity.trainPqCodebooks(e, "embedding", dim = 64, m = 2,
      ksub = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("pq_cbs").toString
    Similarity.saveCodebooks(spark, cbs, dir)
    val back = Similarity.loadCodebooks(spark, dir)
    assert(back.length == cbs.length)
    assert(back.zip(cbs).forall { case (sa, sb) =>
      sa.zip(sb).forall { case (ca, cb) => ca.sameElements(cb) } })
    // corrupt: drop one codeword of subspace 0 → dense-range check fires
    val dir2 = java.nio.file.Files.createTempDirectory("pq_cbs_bad").toString
    spark.read.parquet(dir)
      .filter(!(col("s") === 0 && col("code") === 2))
      .write.mode("overwrite").parquet(dir2)
    val err = intercept[IllegalArgumentException] {
      Similarity.loadCodebooks(spark, dir2)
    }
    assert(err.getMessage.contains("dense"))
  }

  test("int8 two-phase rerank recalls nearly all exact neighbors") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 5))
    val approx = pairs(Similarity.int8TopK(corpus, queries,
      "vec_id", "embedding", k = 5, mult = 4))
    // int8 quantization error is ~scale/254 per component — the approx
    // ranking tracks the exact one closely, so a 4x candidate pool
    // recovers nearly everything (deterministic data, fixed threshold)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("JL two-phase rerank: >=0.9 recall on clustered data, honest on isotropic") {
    import spark.implicits._
    // clustered corpus — the real-embedding regime the jlTopK scaladoc
    // claims: 10 well-separated unit centers, members = center + small
    // noise, so exact top-5 are cluster-mates and an 8-dim shadow must
    // keep clusters apart (JL gap >> eps)
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(10)(unit())
    val rows = for (i <- 0 until 200) yield {
      val c = centers(i % 10)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.05).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 10)
    val corpus = df.filter(col("vec_id") >= 10)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 5))
    val approx = pairs(Similarity.jlTopK(corpus, queries,
      "vec_id", "embedding", fromDim = 64, toDim = 8, k = 5, mult = 4,
      seed = Some(42L)))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered recall $recall")
    // isotropic corpus (the parquet table): all cosines ~0 +- 1/sqrt(64),
    // gaps below any shadow's resolution — the documented worst case.
    // Assert the op still returns exactly k valid rows per query (the
    // contract that survives) rather than pretending recall does.
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val iso = Similarity.jlTopK(e.filter(col("vec_id") >= 10),
      e.filter(col("vec_id") < 10), "vec_id", "embedding",
      fromDim = 64, toDim = 8, k = 5, mult = 4, seed = Some(42L))
    val perQ = iso.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(perQ.length == 10 && perQ.forall(_ == 5))
  }

  test("OPQ learned rotation beats plain PQ on subspace-misaligned clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 10 cluster centers whose variance lives ENTIRELY in the first 16
    // coordinates — i.e. inside subspace 0 of the m=4 split. Plain PQ
    // must then encode all cluster identity with ONE ksub=4 codebook
    // (4 codewords < 10 centers → forced collisions) while subspaces
    // 1-3 quantize pure noise; a learned rotation spreads the center
    // variance across all four codebooks (4^4 = 256 product cells).
    // This is exactly the misalignment OPQ (Ge et al. 2013) targets.
    def unit16() = {
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(10)(unit16() ++ Array.fill(48)(0.0))
    val rows = for (i <- 0 until 300) yield {
      val c = centers(i % 10)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.03).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 20)
    val corpus = df.filter(col("vec_id") >= 20)
    // exact L2 top-10 (the metric ADC approximates), computed directly
    val vecs = rows.toMap.map { case (i, v) => i -> v.toArray }
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 20L).map { q =>
      q -> vecs.keys.filter(_ >= 20L).toSeq
        .sortBy(c => (l2(vecs(q), vecs(c)), c)).take(10).toSet
    }.toMap
    def recallOf(ranked: org.apache.spark.sql.DataFrame): Double = {
      val got = ranked.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
      exact.map { case (q, ex) =>
        (ex intersect got.getOrElse(q, Set.empty)).size.toDouble / ex.size
      }.sum / exact.size
    }
    val cbs = Similarity.trainPqCodebooks(corpus, "embedding", dim = 64,
      m = 4, ksub = 4, iters = 3, seed = 5L)
    val (rot, ocbs) = Similarity.trainOpqRotation(corpus, "embedding",
      dim = 64, m = 4, ksub = 4, iters = 3, opqIters = 3, seed = 5L)
    val pqRecall = recallOf(Similarity.pqTopK(corpus, queries,
      "vec_id", "embedding", cbs, k = 10))
    val opqRecall = recallOf(Similarity.opqTopK(corpus, queries,
      "vec_id", "embedding", rot, ocbs, k = 10))
    info(s"recall@10: pq=$pqRecall opq=$opqRecall")
    // the rotation is orthogonal (R·Rᵀ = I)
    val d = rot.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => rot(i)(k) * rot(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8,
        s"R·Rᵀ[$i][$j]=$dot")
    }
    // deterministic fixture + seeds: measured 0.21 vs 0.34 — gate a
    // real margin, not a tie-break (wobble room left below the measured
    // 0.13 gap)
    assert(opqRecall >= pqRecall + 0.05,
      s"OPQ recall $opqRecall should beat plain PQ $pqRecall by >= 0.05")
  }

  test("trainOpqRotation is deterministic per seed") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    def run() = Similarity.trainOpqRotation(e, "embedding", dim = 64,
      m = 4, ksub = 4, iters = 2, opqIters = 2, seed = 9L)
    val (r1, c1) = run(); val (r2, c2) = run()
    assert(r1.zip(r2).forall { case (a, b) => a.sameElements(b) })
    assert(c1.zip(c2).forall { case (sa, sb) =>
      sa.zip(sb).forall { case (ca, cb) => ca.sameElements(cb) } })
  }

  test("zero-norm corpus rows never outrank true neighbors (NaN guard)") {
    // cos(q, 0) = 0/0 = NaN, and NaN sorts FIRST under DESC ordering —
    // without the guard one all-zero embedding would take rank 1 for
    // every query in every cosine ranker
    import spark.implicits._
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 3)
    val zeroRow = Seq((100000L, Seq.fill(64)(0.0), 0))
      .toDF("vec_id", "embedding", "label")
    val corpus = e.filter(col("vec_id") >= 3).unionByName(
      zeroRow.select(col("vec_id"), col("embedding"), col("label")))
    val rankers = Seq[org.apache.spark.sql.DataFrame](
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 3),
      Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
        dim = 64, k = 3, nBits = 2),
      Similarity.int8TopK(corpus, queries, "vec_id", "embedding", k = 3),
      Similarity.jlTopK(corpus, queries, "vec_id", "embedding",
        fromDim = 64, toDim = 8, k = 3))
    rankers.foreach { df =>
      val ids = df.select("c_id").collect().map(_.getLong(0)).toSet
      assert(!ids.contains(100000L), s"zero vector ranked: $ids")
      assert(ids.nonEmpty)
    }
  }

  test("int8 quantization: codes in range, reconstruction within scale/254") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(50)(Array.fill(16)((rnd.nextDouble() - 0.5) * 4)) :+
      Array.fill(16)(0.0) // all-zero vector must not divide by zero
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "v")
    val q = Similarity.quantizeInt8(col("v"))
    val out = df.select(col("vec_id"), q.as("q"), col("v"))
      .select(col("vec_id"), col("q.codes").as("codes"), col("q.scale").as("scale"),
        Similarity.dequantizeInt8(col("q")).as("recon"), col("v"))
      .collect()
    out.foreach { r =>
      val codes = r.getSeq[Int](1)
      val scale = r.getDouble(2)
      val recon = r.getSeq[Double](3)
      val v = r.getSeq[Double](4)
      assert(codes.forall(c => c >= -127 && c <= 127), s"codes out of range: $codes")
      val maxErr = recon.zip(v).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= scale / 254 * 1.0000001, s"err=$maxErr scale=$scale")
    }
  }
}
