package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup + similarity module behavior: exact dedup semantics, LSH recall
  * against the brute-force baseline, IVF training/probing. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact dedup keeps one row per duplicate group") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello world"), (2L, "hello world"), (3L, "unique text"),
      (4L, "hello world"), (5L, "other"))
      .toDF("id", "text")
    val out = Dedup.exact(df, "id", Seq("text")).orderBy("id")
    assert(out.count() == 3)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 3L, 5L))
    assert(out.filter(col("id") === 1).select("n_copies").head().getLong(0) == 3)
  }

  test("minhash candidates find a true near-duplicate pair") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words nothing shared here at all whatsoever zzz"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
    val cands = Dedup.minhashCandidates(df, "id", "text")
    val verified = Dedup.jaccardVerify(df, cands, "id", "text", threshold = 0.5)
      .collect()
    assert(verified.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!verified.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val far = "one two three four five six seven eight nine ten eleven twelve " * 5
    val df = Seq((1L, base), (2L, base + "lambda"), (3L, far))
      .toDF("id", "text")
    val sh = Dedup.simhash(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // with a tiny vocab many per-bit votes tie, so adding one token can
    // legitimately flip a few bits — assert the relative ordering only
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      s"near=${ham(sh(1L), sh(2L))} far=${ham(sh(1L), sh(3L))}")
  }

  test("native simhash_fp(16) is bit-identical to the composed HOF form") {
    // independent twin: the pre-round-4 higher-order-function composition
    // (split → md5 per token → per-bit vote fold) evaluated by Spark
    // itself; the native expression must reproduce it exactly
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(50)
    val toks = split(col("text"), " +")
    val tokHash = transform(toks, t =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val bitsC = (0 until 16).map { b =>
      val vote = aggregate(tokHash, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      (vote > 0).cast("long") * lit(1L << b)
    }
    val hof = docs.select(col("doc_id"), bitsC.reduce(_ + _).as("expected"))
    val native = Dedup.simhash(docs, "doc_id", "text", bits = 16)
    val joined = native.join(hof, "doc_id")
      .filter(col("simhash") =!= col("expected"))
    assert(joined.count() == 0)
  }

  test("64-bit simhash: sign bit occurs and band keys stay within 16 bits") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val fps = Dedup.simhash(docs, "doc_id", "text").select("simhash")
      .collect().map(_.getLong(0))
    // with ~64 random bits roughly half the corpus must have bit 63 set
    // (negative long) — proves the signed encoding is exercised
    assert(fps.exists(_ < 0) && fps.exists(_ >= 0))
    // every 16-bit band key of every fingerprint lands in [0, 65535]
    // even for negative fingerprints (arithmetic shift + mask)
    for (fp <- fps; b <- 0 until 4) {
      val key = (fp >> (16 * b)) & 0xffffL
      assert(key >= 0 && key <= 65535)
    }
  }

  test("simhash band buckets are O(n/2^16): no quadratic hot bucket") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val n = docs.count()
    val sim = Dedup.simhash(docs, "doc_id", "text")
    val banded = (0 until 4).map { b =>
      sim.select(lit(b).as("band"),
        shiftright(col("simhash"), 16 * b).bitwiseAND(lit(0xffffL)).as("key"))
    }.reduce(_ union _)
    val maxBucket = banded.groupBy("band", "key").count()
      .agg(max("count")).head().getLong(0)
    // 2^16 keys per band: with n ≪ 65536 docs buckets are ~1 except true
    // near-dup clusters; a 16-bit fingerprint would pile ~n/256 docs per
    // 8-bit key. Bound generously: no bucket holds more than 5% of docs.
    assert(maxBucket <= math.max(3, n / 20),
      s"hot band bucket of $maxBucket docs out of $n")
  }

  test("simhashNearDups finds near-identical docs, skips unrelated ones") {
    import spark.implicits._
    val base = ("w" + 1.to(40).mkString(" w")).split(" ").mkString(" ") // w1..w40
    val near = base.replace("w40", "w41")
    val far = "completely different vocabulary nothing shared here at all " * 4
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
    val pairs = Dedup.simhashNearDups(df, "id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), pairs.toString)
  }

  test("incremental minhash candidates match new docs against the reference only") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val ref = Seq((1L, base), (2L, "completely different reference text here ok"))
      .toDF("id", "text")
    val fresh = Seq((10L, base.replace("today", "tomorrow")), // near-dup of ref 1
      (11L, base), // exact text of ref 1
      (12L, "nothing in common with anything at all whatsoever"))
      .toDF("id", "text")
    val pairs = Dedup.minhashCandidatesAgainst(fresh, ref, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 1L)) && pairs.contains((11L, 1L)), pairs.toString)
    // no new×new or ref×ref pairs, and the unrelated doc matches nothing
    assert(pairs.forall { case (n, r) => n >= 10L && r < 10L }, pairs.toString)
    assert(!pairs.exists(_._1 == 12L), pairs.toString)
  }

  test("hot-bucket guard: identical-doc flood emits linear star pairs (minhash)") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq.tabulate(40)(i => (i.toLong, text)).toDF("id", "text")
    val pairs = Dedup.minhashCandidates(df, "id", "text", maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // all 40 docs share every band bucket → cnt=40 > 8 → star around id 0:
    // 39 pairs, not the 780 an all-pairs join would emit
    assert(pairs.length == 39, s"${pairs.length} pairs (all-pairs would be 780)")
    assert(pairs.forall(_._1 == 0L), pairs.take(5).mkString(","))
    assert(pairs.map(_._2).toSet == (1L until 40L).toSet)
    // the flood still collapses into ONE cluster through the star edges
    val clusters = Dedup.clusterPairs(
        Dedup.minhashCandidates(df, "id", "text", maxBucket = 8))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(clusters.length == 40 && clusters.forall(_._2 == 0L))
  }

  test("hot-bucket guard: identical-doc flood emits linear star pairs (simhash)") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val df = Seq.tabulate(30)(i => (i.toLong, text)).toDF("id", "text")
    val pairs = Dedup.simhashNearDups(df, "id", "text", maxBucket = 5).collect()
    assert(pairs.length == 29, s"${pairs.length} pairs (all-pairs would be 435)")
    pairs.foreach { r =>
      assert(r.getLong(0) == 0L && r.getInt(2) == 0, r.toString)
    }
  }

  test("hot-bucket guard is inert below the cap (identical pair sets)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(150)
    def pairSet(cap: Int) =
      Dedup.simhashNearDups(docs, "doc_id", "text", maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairSet(Dedup.DefaultMaxBucket) == pairSet(1000000))
  }

  test("hot-bucket guard: reference-side flood capped, every new doc still matched") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val ref = Seq.tabulate(30)(i => (i.toLong, text)).toDF("id", "text")
    val fresh = Seq((100L, text), (101L, text),
      (102L, "unrelated different vocabulary entirely separate words here zzz"))
      .toDF("id", "text")
    val pairs = Dedup.minhashCandidatesAgainst(fresh, ref, "id", "text",
        maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the flood keeps only its 4 lowest-id members per bucket, so each
    // matching new doc meets ≤4 reference partners — but still gets its
    // duplicate verdict (≥1 pair); the unrelated doc matches nothing
    for (n <- Seq(100L, 101L)) {
      val partners = pairs.filter(_._1 == n).map(_._2).toSet
      assert(partners.nonEmpty && partners.subsetOf(Set(0L, 1L, 2L, 3L)),
        s"$n -> $partners")
    }
    assert(!pairs.exists(_._1 == 102L), pairs.mkString(","))
  }

  test("clusterPairs: transitive closure labels chains, triangles, islands") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter forces several propagation rounds),
    // triangle 10-11-12 with redundant edges, isolated pair 20-21
    val pairs = Seq(
      (2L, 3L), (1L, 2L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L))
      .toDF("id1", "id2")
    val out = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L), out.toString)
    assert(Seq(10L, 11L, 12L).forall(out(_) == 10L), out.toString)
    assert(Seq(20L, 21L).forall(out(_) == 20L), out.toString)
    assert(out.size == 9)
  }

  test("clusterPairs and keepOnePerCluster handle an empty pair set") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.clusterPairs(noPairs).count() == 0)
    assert(Dedup.keepOnePerCluster(df, "id", noPairs).count() == 2)
    // the forced-distributed loop handles empty too (null-sum converge)
    assert(Dedup.clusterPairs(noPairs, localEdgeThreshold = 0L).count() == 0)
  }

  test("clusterPairs rejects null ids on both routing paths") {
    import spark.implicits._
    // a null id is not a usable cluster label: the local ordering would
    // NPE and the distributed least()/min() silently skips nulls —
    // fail-fast (from the same aggregate that routes between paths)
    // beats a path-dependent wrong answer
    val withNull = Seq((Some(1L), Some(2L)), (None: Option[Long], Some(5L)))
      .toDF("id1", "id2")
    for (thr <- Seq(100000L, 0L)) {
      val err = intercept[IllegalArgumentException](
        Dedup.clusterPairs(withNull, localEdgeThreshold = thr))
      assert(err.getMessage.contains("non-null ids"), err.getMessage)
    }
  }

  test("clusterPairs: local endgame and distributed loop agree on a random graph") {
    import spark.implicits._
    // seeded sparse random graph over 400 nodes — mixed component
    // shapes (chains, merged blobs, isolated edges). The local
    // union-find (default threshold) and the forced-distributed
    // pointer-jumping loop must produce the identical fixpoint:
    // min reachable id per node.
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("id1", "id2")
    val local = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.clusterPairs(pairs, localEdgeThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist,
      s"local/distributed divergence: ${(local.toSet diff dist.toSet).take(5)}")
    // and on INT ids (non-Long numeric type follows the same ordering)
    val intPairs = Seq((5, 3), (3, 9), (20, 21)).toDF("id1", "id2")
    val outInt = Dedup.clusterPairs(intPairs).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(outInt == Map(5 -> 3, 3 -> 3, 9 -> 3, 20 -> 20, 21 -> 20))
    // and on DECIMAL ids (one DecimalType means one scale, so the
    // java.math.BigDecimal Comparable/equals pair the local index and
    // ordering rely on is consistent with SQL equality)
    val decPairs = intPairs.select(
      col("id1").cast("decimal(10,0)"), col("id2").cast("decimal(10,0)"))
    val outDec = Dedup.clusterPairs(decPairs).collect()
      .map(r => r.getDecimal(0).longValue -> r.getDecimal(1).longValue).toMap
    assert(outDec == Map(5L -> 3L, 3L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("keepOnePerCluster keeps cluster minima and untouched rows") {
    import spark.implicits._
    val df = Seq.tabulate(6)(i => (i.toLong, s"doc$i")).toDF("id", "text")
    // cluster {0,1,2} via a chain; {4,5} pair; 3 untouched
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("id1", "id2")
    val kept = graft.ops.Dedup.keepOnePerCluster(df, "id", pairs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 4L), kept.toString)
  }

  test("semDedup: one representative per semantic group, cross-cell pairs ignored") {
    import spark.implicits._
    // 2-D geometry with two centroids on the axes: rows 0-2 are tight
    // copies near +x (one semantic group), rows 3-4 near +y (another),
    // row 5 is the third-quadrant loner (nearest centroid is +x, so it
    // shares the +x group's CELL, but its cosine to that group is
    // negative — cell co-residence alone must not merge it).
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val emb = Seq(
      (0L, Seq(1.0, 0.01)), (1L, Seq(1.0, 0.02)), (2L, Seq(0.99, 0.0)),
      (3L, Seq(0.02, 1.0)), (4L, Seq(0.0, 0.98)),
      (5L, Seq(-0.1, -1.0))
    ).toDF("id", "vec")
    val kept = Dedup.semDedup(emb, "id", "vec", cents, threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 5L), kept.toString)
    // output schema is the input schema (rows pass through untouched)
    assert(Dedup.semDedup(emb, "id", "vec", cents, threshold = 0.9)
      .columns.toSeq == Seq("id", "vec"))
  }

  test("semDedup composes with trained centroids, rerun-deterministic") {
    // the scale configuration: k-means centroids trained on the corpus
    // itself (k grows with n), not the fixed oracle centroids. The
    // contract that must survive arbitrary training: output is a subset
    // of the input, and a rerun with the same seed keeps the SAME rows.
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val cents = Similarity.trainIvfCentroids(e, "embedding", kCells = 8,
      iters = 3, seed = 1L)
    def run() = Dedup.semDedup(e, "vec_id", "embedding", cents,
        threshold = 0.3).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val kept = run()
    val all = e.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(all) && kept.nonEmpty && kept.size < all.size)
    assert(run() == kept)
  }

  test("cosineContaminated flags bucket-mates above threshold only") {
    import spark.implicits._
    // bucketCol comes straight from a data column so the collision set
    // is explicit: corpus 10 matches ref 1 (same bucket, cos=1);
    // corpus 11 is identical to ref 1 but bucketed apart (LSH miss by
    // construction — must NOT be flagged); corpus 12 shares the bucket
    // but is orthogonal (below threshold).
    val ref = Seq((1L, Seq(1.0, 0.0), 0)).toDF("id", "vec", "bk")
    val corpus = Seq(
      (10L, Seq(1.0, 0.0), 0),
      (11L, Seq(1.0, 0.0), 1),
      (12L, Seq(0.0, 1.0), 0)
    ).toDF("id", "vec", "bk")
    val hit = Dedup.cosineContaminated(corpus, ref, "id", "vec",
        threshold = 0.9, bucketCol = col("bk"))
      .collect().map(_.getLong(0)).toSet
    assert(hit == Set(10L), hit.toString)
  }

  test("dirty-data guards: NaN cosine / empty shingle sets never pass a threshold") {
    import spark.implicits._
    // semDedupAgainst: a zero-embedding row (failed/padded encoder
    // output) is similar to NOTHING — before the nanvl guard its 0/0
    // NaN cosine compared greater than the threshold and paired it
    // with every retained reference row in its cell
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val ref = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 0.0))).toDF("id", "vec")
    val nw = Seq((10L, Seq(0.0, 0.0)), (11L, Seq(1.0, 0.0))).toDF("id", "vec")
    val pairs = Dedup.semDedupAgainst(nw, ref, "id", "vec", cents,
        threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((11L, 1L)), pairs.mkString(","))

    // cosineContaminated: a zero-norm corpus doc sharing a bucket with
    // an eval row must NOT be flagged
    val refC = Seq((1L, Seq(1.0, 0.0), 0)).toDF("id", "vec", "bk")
    val corpus = Seq((10L, Seq(0.0, 0.0), 0), (11L, Seq(1.0, 0.0), 0))
      .toDF("id", "vec", "bk")
    val hit = Dedup.cosineContaminated(corpus, refC, "id", "vec",
        threshold = 0.3, bucketCol = col("bk"))
      .collect().map(_.getLong(0)).toSet
    assert(hit == Set(11L), hit.toString)

    // jaccardVerify: a candidate pair of two sub-3-token docs has two
    // EMPTY shingle sets — 0.0/0 NaN must not verify them as near-dups
    val docs = Seq((1L, "hello world"), (2L, "buy now"),
      (3L, "a b c d e"), (4L, "a b c d e")).toDF("id", "text")
    val cands = Seq((1L, 2L), (3L, 4L)).toDF("id1", "id2")
    val ver = Dedup.jaccardVerify(docs, cands, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ver.toSeq == Seq((3L, 4L)), ver.mkString(","))
  }

  test("asOf excludes NULL keys — no fabricated null-to-null matches") {
    import spark.implicits._
    // a null-key left row and a null-key right row share the window's
    // null partition; an equi-keyed ASOF join (NULL never equals NULL)
    // must not match them
    val trades = Seq((1L, Option("A"), 5L), (2L, Option.empty[String], 5L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq((Option("A"), 3L, 100.0), (Option.empty[String], 3L, 666.0))
      .toDF("qsym", "qt", "price")
    val out = graft.ops.AsOfJoin.asOf(trades, quotes, "sym", "qsym", "t", "qt",
        Seq("price")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L), out.mkString(","))
    assert(out(0).getDouble(3) == 100.0)
  }

  test("groupCentroids skips null vector elements (AVG semantics)") {
    import spark.implicits._
    // sum() skips the null element; the denominator must too — a
    // row-count denominator would report 1.0 here instead of 2.0
    val emb = Seq(("g", Seq(Option(2.0))), ("g", Seq(Option.empty[Double])))
      .toDF("label", "embedding")
    val cent = graft.ops.Similarity.groupCentroids(
        emb, col("label"), col("embedding"))
      .collect()
    assert(cent.length == 1)
    assert(cent(0).getSeq[Double](1) == Seq(2.0), cent(0).toString)
  }

  test("simhashNearDups rejects band counts that do not tile the fingerprint") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException](
      Dedup.simhashNearDups(df, "id", "text", bits = 64, bands = 3))
    intercept[IllegalArgumentException](
      Dedup.simhashNearDups(df, "id", "text", bits = 64, bands = 1)) // 64-bit key
  }

  test("LSH top-k recall vs brute force is reasonable on real embeddings") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      dim = 64, k = 5, nBits = 2)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall") // 2-bit buckets = 1/4 of corpus probed
  }

  test("seeded-gaussian hyperplanes: deterministic per seed, end-to-end equivalent") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    def buckets(seed: Option[Long]) = e
      .select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), dim = 64, nBits = 4, seed = seed)
          .as("bk"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // same seed → bit-identical bucket assignment (java.util.Random's
    // nextGaussian is algorithm-specified, so this holds on any JVM)
    assert(buckets(Some(7L)) == buckets(Some(7L)))
    // distinct seeds → independent hash tables (different assignments)
    assert(buckets(Some(7L)) != buckets(Some(8L)))
    // the seeded family drives lshTopK the same way the seedless one
    // does: both sides hash with the same planes, so every returned
    // neighbor shares the query's bucket and per-query k holds
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val out = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      dim = 64, k = 5, nBits = 4, seed = Some(7L))
    assert(out.count() > 0)
    assert(out.groupBy("q_id").count().collect().forall(_.getLong(1) <= 5))
    val bk = buckets(Some(7L))
    assert(out.select("q_id", "c_id").collect()
      .forall(r => bk(r.getLong(0)) == bk(r.getLong(1))))
  }

  test("multi-table LSH: recall grows with tables (OR-amplification)") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nTables: Int) = {
      val a = Similarity.lshTopKMultiTable(corpus, queries, "vec_id", "embedding",
        dim = 64, k = 5, nBits = 2, nTables = nTables, seed = Some(42L))
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect a).size.toDouble / exact.size
    }
    // deterministic fixture (seeded planes, fixed data): measured curve is
    // 0.36 → 0.92 → 1.0 — miss probability decays exponentially in tables
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(8)
    assert(r1 <= r4 && r4 <= r8, s"recalls $r1 $r4 $r8")
    assert(r4 >= 0.9, s"4-table recall=$r4")
    assert(r8 == 1.0, s"8-table recall=$r8")
    // per-query k bound holds even when a pair shares several tables
    val out = Similarity.lshTopKMultiTable(corpus, queries, "vec_id", "embedding",
      dim = 64, k = 5, nBits = 2, nTables = 4)
    assert(out.groupBy("q_id").count().collect().forall(_.getLong(1) <= 5))
    // no duplicate (q, c) rows despite multi-table key sharing
    assert(out.count() == out.select("q_id", "c_id").distinct().count())
  }

  test("LSH bit-flip multi-probe lifts recall to >=0.9 on real embeddings") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(probeHamming: Int) = {
      val a = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
        dim = 64, k = 5, nBits = 2, probeHamming = probeHamming)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect a).size.toDouble / exact.size
    }
    val single = recall(0); val multi = recall(1)
    // deterministic fixture (seedless hyperplanes, fixed data): single-probe
    // sits ~0.34; flipping each of the 2 bits probes the hamming-1 buckets
    // where near-miss neighbors live and lifts recall past 0.9
    assert(multi >= 0.9, s"multi-probe recall=$multi")
    assert(multi > single, s"multi=$multi single=$single")
  }

  test("IVF nprobe: recall grows monotonically and full probe is exact") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.trainIvfCentroids(corpus, "embedding", kCells = 8, iters = 5)
    def recall(nprobe: Int) = {
      val a = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        cents, k = 5, nprobe = nprobe)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect a).size.toDouble / exact.size
    }
    val r1 = recall(1); val r2 = recall(2); val r4 = recall(4); val r8 = recall(8)
    assert(r1 <= r2 && r2 <= r4 && r4 <= r8, s"recalls $r1 $r2 $r4 $r8")
    // these embeddings are near-random (little cluster structure), so
    // nprobe/kCells bounds recall; 4 of 8 cells still recovers >=0.6
    assert(r4 >= 0.6, s"nprobe=4 recall=$r4")
    // probing every cell IS the brute-force scan
    assert(r8 == 1.0, s"full-probe recall=$r8")
  }

  test("IVF centroid save/load round-trips and reproduces probe results") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val cents = Similarity.trainIvfCentroids(e, "embedding", kCells = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cents").toString
    Similarity.saveCentroids(spark, cents, dir)
    val back = Similarity.loadCentroids(spark, dir)
    assert(back.length == cents.length)
    assert(back.zip(cents).forall { case (a, b) => a.sameElements(b) })
    val queries = e.filter(col("vec_id") < 5)
    val corpus = e.filter(col("vec_id") >= 5)
    def probe(cs: Array[Array[Double]]) =
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", cs, k = 3)
        .select("q_id", "rk", "c_id").collect().map(_.toString).toSeq
    assert(probe(back) == probe(cents))
    // a corrupt table with a truncated centroid must fail fast, not
    // silently assign wrong cells (NearestCell folds over min lengths)
    import org.apache.spark.sql.functions.{expr, when}
    val dir2 = java.nio.file.Files.createTempDirectory("ivf_cents_bad").toString
    spark.read.parquet(dir)
      .withColumn("centroid", when(col("cell") === 2,
        expr("slice(centroid, 1, 32)")).otherwise(col("centroid")))
      .write.mode("overwrite").parquet(dir2)
    val err = intercept[IllegalArgumentException](
      Similarity.loadCentroids(spark, dir2))
    assert(err.getMessage.contains("ragged"))
  }

  test("IVF centroids train and probe returns neighbors from own cell") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val centroids = Similarity.trainIvfCentroids(e, "embedding", kCells = 4, iters = 3)
    assert(centroids.length == 4 && centroids.forall(_.length == 64))
    val queries = e.filter(col("vec_id") < 5)
    val out = Similarity.ivfTopK(e.filter(col("vec_id") >= 5), queries,
      "vec_id", "embedding", centroids, k = 3)
    assert(out.groupBy("q_id").count().collect().forall(_.getLong(1) <= 3))
    assert(out.count() > 0)
  }

  test("as-of join: inclusive at equal time, latest prior match, unmatched dropped") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val trades = Seq(
      (1L, 10L, ts("2020-01-01 10:00:05")),
      (2L, 10L, ts("2020-01-01 10:00:10")), // exactly at quote q2 time
      (3L, 10L, ts("2020-01-01 09:00:00")), // before any quote → dropped
      (4L, 20L, ts("2020-01-01 10:00:07")))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, ts("2020-01-01 10:00:00"), 100.0),
      (10L, ts("2020-01-01 10:00:10"), 101.0),
      (20L, ts("2020-01-01 10:00:06"), 55.0))
      .toDF("qsym", "qt", "price")
    val out = graft.ops.AsOfJoin.asOf(trades, quotes, "sym", "qsym", "t", "qt",
        Seq("price"))
      .orderBy("trade_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(out(0).getDouble(3) == 100.0) // trade 1 → 10:00:00 quote
    assert(out(1).getDouble(3) == 101.0) // trade 2 → inclusive 10:00:10 quote
    assert(out(2).getDouble(3) == 55.0)
  }

  test("cosine near-dups within LSH buckets") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val bucket = Similarity.lshBucket(col("embedding"), dim = 64, nBits = 2)
    val pairs = Dedup.cosineNearDups(e, "vec_id", "embedding",
      threshold = 0.5, bucketCol = bucket)
    // symmetric/no self pairs; all above threshold
    val rows = pairs.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.5))
  }

  test("multi-probe near-dups recover a cell-straddle pair; nprobe=1 is identical") {
    import spark.implicits._
    // centroids on the axes; a and b sit just either side of the 45°
    // boundary — primary cells DIFFER, cosine(a,b) ≈ 0.9998 ≥ 0.95. A
    // single-probe pass is blind to the pair; each row's 2nd-nearest
    // cell is the other's primary, so nprobe=2 recovers it.
    val emb = Seq(
      (1L, Seq(0.72, 0.70)),  // cell 0 (x-axis), probes [0, 1]
      (2L, Seq(0.70, 0.72)),  // cell 1 (y-axis), probes [1, 0]
      (3L, Seq(1.0, 0.0)),    // deep in cell 0: no pair ≥ 0.95 with 2
      (4L, Seq(0.0, 1.0))     // deep in cell 1
    ).toDF("id", "vec")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val cell = Similarity.ivfCell(col("vec").cast("array<double>"), cents)
    val single = Dedup.cosineNearDups(emb, "id", "vec", threshold = 0.95,
      bucketCol = cell).select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(!single.contains((1L, 2L)),
      "fixture broken: the straddle pair must be invisible to one probe")
    // nprobe=1 via the multi-probe entry: bit-identical pair set
    val mp1 = Dedup.cosineNearDupsMultiProbe(emb, "id", "vec",
        threshold = 0.95, centroids = cents, nprobe = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(mp1 == single)
    val mp2 = Dedup.cosineNearDupsMultiProbe(emb, "id", "vec",
        threshold = 0.95, centroids = cents, nprobe = 2)
      .select("id1", "id2").as[(Long, Long)].collect()
    // the straddle pair appears, exactly once (both directions fire —
    // 1 probes cell 1 where 2 is primary AND vice versa — and collapse),
    // and nothing below the threshold sneaks in (1-3 cos ≈ 0.717)
    assert(mp2.count(_ == ((1L, 2L))) == 1, mp2.mkString(","))
    assert(mp2.toSet == single + ((1L, 2L)), mp2.mkString(","))
    // and the dedup endgame keeps one of {1,2}
    val kept = Dedup.semDedup(emb, "id", "vec", cents, threshold = 0.95,
      nprobe = 2).select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L), kept.toString)
  }

  test("hot-bucket guard: embedding flood emits linear star pairs (cosine/semDedup)") {
    import spark.implicits._
    // one flooded cell (40 copies of the same vector — the boilerplate-
    // embedding case SemDeDup exists for) plus one small cell
    val flood = Seq.tabulate(40)(i => (i.toLong, Seq(1.0, 0.01)))
    val small = Seq((100L, Seq(0.0, 1.0)), (101L, Seq(0.01, 1.0)),
      (102L, Seq(0.0, 0.99)))
    val emb = (flood ++ small).toDF("id", "vec")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val cell = Similarity.ivfCell(col("vec").cast("array<double>"), cents)
    val pairs = Dedup.cosineNearDups(emb, "id", "vec", threshold = 0.9,
      bucketCol = cell, maxBucket = 8).collect()
    // flooded cell: star around min-id 0 → 39 pairs (all-pairs would be
    // 780 = O(cnt²)); the star pairs keep the exact cosine column
    val floodPairs = pairs.filter(_.getLong(1) < 100L)
    assert(floodPairs.length == 39, s"${floodPairs.length} flood pairs")
    assert(floodPairs.forall(r => r.getLong(0) == 0L))
    assert(floodPairs.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-9))
    // small cell stays exact all-pairs
    assert(pairs.count(_.getLong(0) >= 100L) == 3)
    // cluster membership unchanged for the true-dup flood: semDedup
    // still keeps exactly one representative per semantic group
    val kept = Dedup.semDedup(emb, "id", "vec", cents, threshold = 0.9,
      maxBucket = 8).select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 100L), kept.toString)
  }

  test("persisted banded signatures reproduce minhashCandidatesAgainst (build-once path)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val ref = docs.filter(col("doc_id") < 400)
    val nw = docs.filter(col("doc_id") >= 400)
    val dir = java.nio.file.Files.createTempDirectory("mh_bands").toString
    Dedup.writeBandedSignatures(ref, "doc_id", "text", dir)
    val bandsDf = spark.read.parquet(dir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val onBands = pairs(Dedup.minhashCandidatesAgainstBands(
      nw, bandsDf, "doc_id", "text", maxBucket = 2))
    val direct = pairs(Dedup.minhashCandidatesAgainst(
      nw, ref, "doc_id", "text", maxBucket = 2))
    assert(onBands == direct && onBands.nonEmpty, s"${onBands.size} pairs")
    // width mismatch fails fast instead of silently joining disjoint
    // bucket strings to zero candidates
    val err = intercept[IllegalArgumentException] {
      Dedup.minhashCandidatesAgainstBands(nw, bandsDf, "doc_id", "text",
        bands = 4, numHashes = 16)
    }
    assert(err.getMessage.contains("mismatched widths"), err.getMessage)
    // a frame that is not a writeBandedSignatures table is rejected
    val err2 = intercept[IllegalArgumentException] {
      Dedup.minhashCandidatesAgainstBands(nw,
        bandsDf.drop("bands", "num_hashes"), "doc_id", "text")
    }
    assert(err2.getMessage.contains("writeBandedSignatures"), err2.getMessage)
    // a HETEROGENEOUS table — two writes at different widths appended to
    // one path — is rejected by the whole-table min/max probe; a one-row
    // probe would accept whichever width it sampled and the other
    // write's rows would silently never collide (bands=8/numHashes=16
    // keeps the packed-long key encoding, so the union's bucket column
    // types agree and the WIDTH probe is what fires)
    val dir16 = java.nio.file.Files.createTempDirectory("mh_bands16").toString
    Dedup.writeBandedSignatures(ref, "doc_id", "text", dir16,
      bands = 8, numHashes = 16)
    val mixed = bandsDf.unionByName(spark.read.parquet(dir16))
    val err3 = intercept[IllegalArgumentException] {
      Dedup.minhashCandidatesAgainstBands(nw, mixed, "doc_id", "text")
    }
    assert(err3.getMessage.contains("mixes two writes"), err3.getMessage)
    // a table persisted under a DIFFERENT KEY ENCODING (wide bands keep
    // the ":"-joined string form; 1-2-component bands pack into a long)
    // is rejected by the bucket-type check rather than silently joining
    // long keys against strings to zero candidates
    val dirStr = java.nio.file.Files.createTempDirectory("mh_bands_str").toString
    Dedup.writeBandedSignatures(ref, "doc_id", "text", dirStr,
      bands = 4, numHashes = 16) // rowsPerBand=4 → string encoding
    val strTable = spark.read.parquet(dirStr)
    // read back at its OWN widths: works (string encoding expected there)
    assert(Dedup.minhashCandidatesAgainstBands(nw, strTable, "doc_id",
      "text", bands = 4, numHashes = 16, maxBucket = 2).columns
      .sameElements(Array("new_id", "ref_id")))
    // spoofed width columns at a packed-long width class: encoding check
    // fires (the width probe passes — the spoofed constants match)
    val spoofed = strTable
      .withColumn("bands", lit(4)).withColumn("num_hashes", lit(8))
    val err4 = intercept[IllegalArgumentException] {
      Dedup.minhashCandidatesAgainstBands(nw, spoofed, "doc_id", "text")
    }
    assert(err4.getMessage.contains("band-key format"), err4.getMessage)
  }

  test("persisted simhash signatures reproduce simhashNearDupsAgainst (build-once path)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val ref = docs.filter(col("doc_id") < 400)
    val nw = docs.filter(col("doc_id") >= 400)
    val dir = java.nio.file.Files.createTempDirectory("sh_bands").toString
    Dedup.writeSimhashSignatures(ref, "doc_id", "text", dir)
    val sigDf = spark.read.parquet(dir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val onBands = pairs(Dedup.simhashNearDupsAgainstBands(
      nw, sigDf, "doc_id", "text", maxHamming = 20, maxBucket = 5))
    val direct = pairs(Dedup.simhashNearDupsAgainst(
      nw, ref, "doc_id", "text", maxHamming = 20, maxBucket = 5))
    assert(onBands == direct && onBands.nonEmpty, s"${onBands.size} pairs")
    // width mismatch and heterogeneous tables fail fast (the bands-table
    // contract): mismatched keys never collide = silent all-clean
    val err = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupsAgainstBands(nw, sigDf, "doc_id", "text",
        bits = 64, bands = 8)
    }
    assert(err.getMessage.contains("mismatched widths"), err.getMessage)
    val dir8 = java.nio.file.Files.createTempDirectory("sh_bands8").toString
    Dedup.writeSimhashSignatures(ref, "doc_id", "text", dir8,
      bits = 64, bands = 8)
    val mixed = sigDf.unionByName(spark.read.parquet(dir8))
    val err2 = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupsAgainstBands(nw, mixed, "doc_id", "text")
    }
    assert(err2.getMessage.contains("mixes two writes"), err2.getMessage)
    val err3 = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupsAgainstBands(nw, sigDf.drop("bits", "bands"),
        "doc_id", "text")
    }
    assert(err3.getMessage.contains("writeSimhashSignatures"), err3.getMessage)
  }

  test("incremental simhash: reference flood capped, every new doc still matched") {
    import spark.implicits._
    val text = "graft spark dedup engine builds banded simhash fingerprints quickly"
    // 30 identical reference docs (a boilerplate flood) + one unrelated;
    // 3 new docs duplicating the flood + one unrelated
    val ref = Seq.tabulate(30)(i => (i.toLong, text)) :+
      (50L, "completely different content about weather forecasts and rain")
    val nw = Seq.tabulate(3)(i => (100L + i, text)) :+
      (200L, "unrelated new content about gardening tomatoes in summer heat")
    val pairs = Dedup.simhashNearDupsAgainst(nw.toDF("id", "text"),
        ref.toDF("id", "text"), "id", "text", maxBucket = 4).collect()
    val byNew = pairs.groupBy(_.getLong(0))
    // each flood-duplicating new doc matches only the ≤4 retained
    // lowest-id flood members per band — identical fingerprints share
    // every band, so the distinct ref ids are exactly ids 0-3
    for (i <- 0 until 3) {
      val m = byNew(100L + i).map(_.getLong(1)).toSet
      assert(m == Set(0L, 1L, 2L, 3L), s"new ${100 + i}: $m")
    }
    assert(!byNew.contains(200L), "unrelated new doc matched")
    assert(pairs.forall(_.getInt(2) == 0)) // identical docs → hamming 0
  }

  test("hot-cell multi-flood: sub-bucketed degrade catches every flood, not just min-id's") {
    import spark.implicits._
    // one k-means cell, three populations: a LOW-ID outlier (id 0,
    // dissimilar to both floods but nearest the same centroid), flood A
    // (40 copies, ids 1-40), flood B (40 copies, ids 100-139,
    // dissimilar to A). A cell-wide star around min-id 0 would emit
    // only cos(outlier, ·) pairs — all below threshold — and MISS BOTH
    // floods; the LSH sub-bucketed degrade stars each flood around its
    // own min-id member.
    // vectors chosen so the three populations land in DISTINCT 8-bit
    // sign sub-buckets (sigs 51 / 102 / 49) while sharing cell 0:
    // cos(A,B)=0.18, cos(outlier,·) <= 0.83 — all below the 0.9 bar
    val outlier = Seq((0L, Seq(1.0, -0.9, -0.9, 0.0)))
    val floodA = Seq.tabulate(40)(i => (1L + i, Seq(1.0, 0.8, 0.0, 0.0)))
    val floodB = Seq.tabulate(40)(i => (100L + i, Seq(1.0, -0.8, -0.4, 0.8)))
    val emb = (outlier ++ floodA ++ floodB).toDF("id", "vec")
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val cell = Similarity.ivfCell(col("vec").cast("array<double>"), cents)
    val pairs = Dedup.cosineNearDups(emb, "id", "vec", threshold = 0.9,
      bucketCol = cell, maxBucket = 8).collect()
    val aPairs = pairs.filter(_.getLong(1) <= 40L)
    val bPairs = pairs.filter(_.getLong(1) >= 100L)
    assert(aPairs.length == 39 && aPairs.forall(_.getLong(0) == 1L),
      s"flood A: ${aPairs.length} pairs")
    assert(bPairs.length == 39 && bPairs.forall(_.getLong(0) == 100L),
      s"flood B: ${bPairs.length} pairs (cell-wide star would emit 0)")
    assert(pairs.length == 78, s"${pairs.length} total pairs")
    val kept = Dedup.semDedup(emb, "id", "vec", cents, threshold = 0.9,
      maxBucket = 8).select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 100L), kept.toString)
  }

  test("semDedupAgainst: asymmetric cap keeps every new-row verdict") {
    import spark.implicits._
    // reference flood: 20 copies in cell 0 with maxBucket=4 → each new
    // row in that cell still matches (any retained member suffices);
    // new side never capped — all 6 new rows get verdicts
    val ref = Seq.tabulate(20)(i => (i.toLong, Seq(1.0, 0.01))) ++
      Seq((50L, Seq(0.0, 1.0)))
    val nw = Seq.tabulate(6)(i => (100L + i, Seq(0.99, 0.0))) ++
      Seq((200L, Seq(0.02, 1.0)), (201L, Seq(-1.0, -0.5)))
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val pairs = Dedup.semDedupAgainst(nw.toDF("id", "vec"),
        ref.toDF("id", "vec"), "id", "vec", cents, threshold = 0.9,
        maxBucket = 4).collect()
    val byNew = pairs.groupBy(_.getLong(0))
    // each of the 6 flood-adjacent new rows matched ≤4 capped ref rows
    for (i <- 0 until 6) {
      val m = byNew(100L + i)
      assert(m.length == 4, s"new ${100 + i}: ${m.length} matches")
      assert(m.forall(r => r.getLong(1) < 4L)) // 4 lowest-id ref rows kept
    }
    // cell-1 new row matches its single ref neighbor; anti-aligned row none
    assert(byNew(200L).map(_.getLong(1)).toSeq == Seq(50L))
    assert(!byNew.contains(201L))
  }

  test("exact dedup: NULL placement is part of the key") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), None: Option[String]),
      (2L, None: Option[String], Some("a")),
      (3L, Some("a"), None: Option[String]), // true dup of row 1
      (4L, Some("a"), Some("")))             // empty string ≠ NULL
      .toDF("id", "c1", "c2")
    val out = Dedup.exact(df, "id", Seq("c1", "c2")).orderBy("id")
    // (a,NULL) dedups with (a,NULL) only; (NULL,a) and (a,"") survive
    assert(out.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
  }

  test("exact dedup: sentinel-like values and embedded separators stay distinct") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("\u0001<null>"), Some("x")), // value equal to an in-band sentinel
      (2L, None: Option[String], Some("x")), // genuine NULL must NOT merge with row 1
      (3L, Some("a\u0000b"), Some("c")),     // embedded separator byte: ("a\0b","c")
      (4L, Some("a"), Some("b\u0000c")))     // vs ("a","b\0c") must stay distinct
      .toDF("id", "c1", "c2")
    val out = Dedup.exact(df, "id", Seq("c1", "c2"))
    assert(out.count() == 4)
  }

  test("minhash candidates reject band counts that do not tile the signature") {
    import spark.implicits._
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    intercept[IllegalArgumentException](Dedup.minhashCandidates(df, "id", "text", bands = 3))
    intercept[IllegalArgumentException](Dedup.minhashCandidates(df, "id", "text", bands = 16))
  }

  test("minhash candidates: shingle-less docs never pair (no sentinel bucket)") {
    import spark.implicits._
    // two <3-token docs share the empty-signature sentinel; they must NOT
    // become candidates of each other (quadratic trivial-doc bucket)
    val df = Seq((1L, "ab"), (2L, "cd"), (3L, "one two three four five six"),
      (4L, "one two three four five six")).toDF("id", "text")
    val cands = Dedup.minhashCandidates(df, "id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands == Set((3L, 4L)), cands.toString)
  }

  test("capHotKeys drops high-df shingles before any self-join") {
    import spark.implicits._
    // 'stop phrase' appears in every doc; 'rare pair' in two
    val exploded = Seq(
      (1L, "stop phrase"), (2L, "stop phrase"), (3L, "stop phrase"),
      (1L, "rare pair"), (2L, "rare pair"), (3L, "only here"))
      .toDF("doc_id", "shingle")
    val capped = Dedup.capHotKeys(exploded, "shingle", maxDf = 2)
      .collect().map(_.getString(0)).toSet
    assert(capped == Set("rare pair", "only here"))
  }

  test("as-of join: NULL payload field in the matched row survives (struct carry)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val trades = Seq((1L, 10L, ts("2020-01-01 10:00:20")))
      .toDF("trade_id", "sym", "t")
    // matched (latest prior) quote has price=NULL and venue='B'; the older
    // quote has price=100, venue='A'. Per-column carries would splice
    // price=100 (from A) with venue='B' — a row that never existed.
    val quotes = Seq(
      (10L, ts("2020-01-01 10:00:00"), Some(100.0), "A"),
      (10L, ts("2020-01-01 10:00:10"), None: Option[Double], "B"))
      .toDF("qsym", "qt", "price", "venue")
    val out = graft.ops.AsOfJoin.asOf(trades, quotes, "sym", "qsym", "t", "qt",
      Seq("price", "venue")).collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("price")), out(0).toString)
    assert(out(0).getString(out(0).fieldIndex("venue")) == "B")
  }

  test("as-of join: NULL-time rows never match (native ASOF semantics)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // a dirty right row with a NULL time would sort "before everything"
    // (asc nulls first) and leak its payload into left rows that predate
    // every real quote; a NULL-time left row has no as-of instant at all
    val trades = Seq(
      (1L, 10L, Some(ts("2020-01-01 09:00:00"))), // before all real quotes
      (2L, 10L, None: Option[java.sql.Timestamp]))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, None: Option[java.sql.Timestamp], 666.0),
      (10L, Some(ts("2020-01-01 10:00:00")), 100.0))
      .toDF("qsym", "qt", "price")
    val out = graft.ops.AsOfJoin.asOf(trades, quotes, "sym", "qsym", "t", "qt",
      Seq("price")).collect()
    assert(out.isEmpty, out.mkString(","))
  }

  test("clusterPairs rejects non-numeric id columns (label-sum probe contract)") {
    import spark.implicits._
    val strPairs = Seq(("a", "b")).toDF("id1", "id2")
    val err = intercept[IllegalArgumentException](Dedup.clusterPairs(strPairs))
    assert(err.getMessage.contains("numeric"))
  }

  test("bucketed range join: exact overlap set, each pair emitted once") {
    import spark.implicits._
    val left = Seq(
      (1L, 0.0, 10.0),   // spans several buckets
      (2L, 9.5, 10.5),   // straddles a bucket boundary
      (3L, 20.0, 21.0),  // touches r30 only at the open end → no match
      (4L, 35.0, 36.0))  // inside r30
      .toDF("lid", "lo", "hi")
    val right = Seq(
      (10L, 5.0, 25.0),  // overlaps 1, 2; [20,21) ⊂ [5,25) overlaps 3 too
      (20L, 10.0, 12.0), // overlaps 2 (9.5 < 12, 10 < 10.5); NOT 1 ([0,10) vs [10,12) — open)
      (30L, 21.0, 40.0)) // overlaps 4; NOT 3 ([20,21) vs [21,40) — open)
      .toDF("rid", "rlo", "rhi")
    // small bucket width forces multi-bucket intervals → tests the
    // first-overlap-bucket dedup guard
    val out = graft.ops.RangeJoin.overlapBucketed(left, right,
        "lo", "hi", "rlo", "rhi", bucketWidth = 4.0)
      .select("l_lid", "r_rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = Set((1L, 10L), (2L, 10L), (3L, 10L), (2L, 20L), (4L, 30L))
    assert(out.toSet == expected, out.toSeq.sorted.mkString(","))
    // emitted exactly once despite spanning many shared buckets
    assert(out.length == expected.size, out.toSeq.sorted.mkString(","))
  }

  test("imageMeta decodes a real PNG (javax.imageio) and rejects non-images") {
    import spark.implicits._
    // render a deterministic 20×10 image: left half red, right half blue
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, if (x < 10) 0xff0000 else 0x0000ff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = df.select(col("id"),
        graft.ops.Multimodal.imageMeta(col("payload")).as("m"))
      .orderBy("id").collect()
    val m = out(0).getStruct(1)
    assert(m.getInt(0) == 20 && m.getInt(1) == 10) // width, height
    assert(math.abs(m.getDouble(2) - 127.5) < 1.0) // mean_r: half 255, half 0
    assert(math.abs(m.getDouble(4) - 127.5) < 1.0) // mean_b
    assert(out(1).isNullAt(1)) // text payload → null struct
  }

  test("audioMeta decodes a real WAV (javax.sound) and rejects non-audio") {
    import spark.implicits._
    // 0.5 s of a 440 Hz sine at amplitude 10000, 16-bit mono 8 kHz:
    // RMS of a whole number of periods ≈ A/√2 (440·0.5 = 220 periods)
    val rate = 8000; val frames = 4000; val amp = 10000.0
    val data = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val v = math.round(amp * math.sin(2 * math.Pi * 440 * i / rate)).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val df = Seq((1L, baos.toByteArray), (2L, "definitely not audio".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = df.select(col("id"),
        graft.ops.Multimodal.audioMeta(col("payload")).as("m"))
      .orderBy("id").collect()
    val m = out(0).getStruct(1)
    assert(m.getDouble(0) == 8000.0 && m.getInt(1) == 1) // rate, channels
    assert(m.getLong(2) == frames && m.getDouble(3) == 500.0) // frames, ms
    assert(math.abs(m.getDouble(4) - amp / math.sqrt(2)) < amp * 0.01,
      s"rms=${m.getDouble(4)}")
    assert(out(1).isNullAt(1)) // text payload → null struct
    // windowed energy features: a steady sine's envelope is flat A/√2
    val feats = df.select(col("id"),
        graft.ops.Multimodal.audioFeatures(col("payload"), 4).as("e"))
      .orderBy("id").collect()
    val e = feats(0).getSeq[Double](1)
    assert(e.length == 4)
    assert(e.forall(v => math.abs(v - amp / math.sqrt(2)) < amp * 0.02), e.toString)
    assert(feats(1).isNullAt(1)) // non-audio → null vector
  }

  test("stratifiedCap: deterministic per-key top-k, reproducible across reruns") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    def pick() = graft.ops.Sampling.stratifiedCap(docs, Seq("lang"), k = 5,
        orderBy = Seq(md5(col("text")), col("doc_id")))
      .select("lang", "doc_id").collect().map(_.toString).toSet
    val a = pick()
    assert(a == pick()) // rerun selects the SAME rows
    // cap respected per key; keys with fewer rows keep them all
    val counts = graft.ops.Sampling.stratifiedCap(docs, Seq("lang"), k = 5,
        orderBy = Seq(md5(col("text")), col("doc_id")))
      .groupBy("lang").count().collect()
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.forall(r => r.getLong(1) == math.min(5L, totals(r.getString(0)))))
    intercept[IllegalArgumentException](
      graft.ops.Sampling.stratifiedCap(docs, Seq(), 5, Seq(col("doc_id"))))
    intercept[IllegalArgumentException](
      graft.ops.Sampling.stratifiedCap(docs, Seq("lang"), 0, Seq(col("doc_id"))))
  }

  test("refineCentroids: Lloyd step never increases SSE, keeps empty cells") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val c0 = Similarity.trainIvfCentroids(emb, "embedding", kCells = 4, iters = 1)
    lazy val rows = emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    def sse(cs: Array[Array[Double]]): Double = {
      rows.map { v =>
        cs.map { c =>
          var s = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - c(i); s += t * t; i += 1 }
          s
        }.min
      }.sum / rows.length
    }
    val c1 = Similarity.refineCentroids(emb, "embedding", c0)
    val c2 = Similarity.refineCentroids(emb, "embedding", c1)
    // assignment + mean both minimize SSE; decimal rounding gets an ulp
    assert(sse(c1) <= sse(c0) + 1e-9, s"${sse(c0)} -> ${sse(c1)}")
    assert(sse(c2) <= sse(c1) + 1e-9, s"${sse(c1)} -> ${sse(c2)}")
    // a cell no vector chooses keeps its previous centroid
    val far = c1 :+ Array.fill(c1(0).length)(1e9)
    val refined = Similarity.refineCentroids(emb, "embedding", far)
    assert(refined.length == far.length)
    assert(refined.last.sameElements(far.last))
  }

  test("exactMatchesAgainst: keyed membership, NULLs match NULLs") {
    import spark.implicits._
    val ref = Seq((1L, Some("en"), Some(10L)), (2L, None, Some(20L)))
      .toDF("id", "lang", "n")
    val fresh = Seq(
      (10L, Some("en"), Some(10L)), // matches ref 1
      (11L, Some("en"), Some(99L)), // no match (different n)
      (12L, None, Some(20L)),       // NULL lang matches ref 2's NULL
      (13L, None, Some(21L)))       // NULL lang, wrong n
      .toDF("id", "lang", "n")
    val got = Dedup.exactMatchesAgainst(fresh, ref, "id", Seq("lang", "n"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 12L), got.toString)
  }

  test("cleanText strips controls, folds whitespace, keeps content") {
    import spark.implicits._
    val dirty = "a\u0001b\u0000c\u007f d\te\r\nf  g \u000b "
    val out = Seq((1L, dirty), (2L, "already clean"), (3L, ""))
      .toDF("id", "text")
      .select(col("id"), graft.ops.Redact.cleanText(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "abc d e f g") // controls deleted, \t\r\n → space,
    // runs collapsed, trimmed
    assert(out(2L) == "already clean")
    assert(out(3L) == "")
  }

  test("chunkTokens: overlapping windows cover every token, bounds hold") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 toks
      (2L, "a b c"),                                    // shorter than chunk
      (3L, (1 to 32).map(i => s"x$i").mkString(" ")))   // exactly one chunk
      .toDF("doc_id", "text")
    val out = graft.ops.Chunking.chunkTokens(df, "doc_id", "text",
      chunkSize = 32, overlap = 8).collect()
    val byDoc = out.groupBy(_.getLong(0))
    // doc 1: stride 24 → starts 0,24,48,72 → 4 chunks; last has 28 toks
    assert(byDoc(1L).length == 4 && byDoc(1L).head.getInt(1) == 4)
    val d1 = byDoc(1L).sortBy(_.getInt(2))
    assert(d1.map(_.getInt(4)).toSeq == Seq(32, 32, 32, 28))
    // consecutive chunks overlap by exactly 8 tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      val ta = a.getString(3).split(" "); val tb = b.getString(3).split(" ")
      assert(ta.takeRight(8).sameElements(tb.take(8)))
    case _ => () }
    // every token appears in order when overlaps are dropped
    val rebuilt = d1.zipWithIndex.flatMap { case (r, i) =>
      val ts = r.getString(3).split(" ")
      if (i == 0) ts else ts.drop(8)
    }
    assert(rebuilt.toSeq == (1 to 100).map(i => s"t$i"))
    // short docs emit one (short) chunk; exact-size docs exactly one
    assert(byDoc(2L).length == 1 && byDoc(2L).head.getInt(4) == 3)
    assert(byDoc(3L).length == 1 && byDoc(3L).head.getInt(4) == 32)
    intercept[IllegalArgumentException](
      graft.ops.Chunking.chunkTokens(df, "doc_id", "text", 8, 8))
  }

  test("normalizeForDedup folds case/punct/whitespace jitter to one key") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO-WORLD."),
      (4L, "a genuinely different doc"))
      .toDF("id", "text")
      .withColumn("k", Dedup.normalizeForDedup(col("text")))
    val keys = df.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(keys(1L) == "hello world")
    assert(keys(1L) == keys(2L) && keys(2L) == keys(3L))
    assert(keys(4L) != keys(1L))
    val dd = Dedup.exact(df, "id", Seq("k"))
    assert(dd.count() == 2) // {1,2,3} collapse, 4 survives
    assert(dd.filter(col("id") === 1L).head().getAs[Long]("n_copies") == 3L)
  }

  test("groupCentroids: exact per-group means, partitioning-independent") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 6.0f)),
      (1, Seq(-1.0f, 0.5f)))
      .toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Similarity.groupCentroids(d, col("label"), col("embedding"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val m = run(df)
    assert(m(0) == Seq(2.0, 4.0)) // exact: decimal sums, one division
    assert(m(1) == Seq(-1.0, 0.5))
    assert(run(df.repartition(7)) == m) // order-independent sums
    // real embeddings: centroid of each label matches a driver-side fold
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val got = graft.ops.Similarity.groupCentroids(
      emb, col("label"), col("embedding"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val rows = emb.select(col("label"),
      col("embedding").cast("array<double>")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
    val want = rows.groupBy(_._1).map { case (l, vs) =>
      val dim = vs.head._2.length
      l -> (0 until dim).map { i =>
        val s = vs.map(v => BigDecimal(v._2(i)).setScale(7,
          BigDecimal.RoundingMode.HALF_UP)).sum
        s.toDouble / vs.length
      }
    }
    want.foreach { case (l, c) =>
      c.zip(got(l)).foreach { case (w, g) => assert(math.abs(w - g) < 1e-12) }
    }
  }

  test("tokenBudgetCap: null strata get the default budget, null keys drop") {
    import spark.implicits._
    // one null-source doc among real sources: it must form its own
    // stratum at defaultBudget (stratifiedHashSample's null rule), not
    // silently vanish at the bin join; a null key has no coin and drops
    val df = Seq(
      (1L, "a", 10), (2L, "a", 10), (3L, null.asInstanceOf[String], 10),
      (4L, "b", 10)
    ).toDF("id", "src", "tok")
    def kept(d: org.apache.spark.sql.DataFrame, budget: Long) =
      graft.ops.Sampling.tokenBudgetCap(d, col("src"), col("id"),
          col("tok"), budgets = Map.empty, defaultBudget = budget,
          seed = 7L, binBits = 4)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(kept(df, 100L) == Set(1L, 2L, 3L, 4L)) // null stratum kept
    // budget 5 < one doc: each stratum keeps exactly its first-by-hash
    // doc (before-sum 0 < 5), so null forms its OWN stratum (one kept),
    // not a merged bucket with "a" or "b"
    val tight = kept(df, 5L)
    assert(tight.size == 3 && tight.contains(3L) && tight.contains(4L), tight.toString)
    assert(kept(df, 0L).isEmpty) // zero budget drops all strata incl. null
    // null KEY: no coin → dropped (every keyed operator's rule)
    val withNullKey = Seq((java.lang.Long.valueOf(1L), "a", 10),
      (null.asInstanceOf[java.lang.Long], "a", 10)).toDF("id", "src", "tok")
    val got = graft.ops.Sampling.tokenBudgetCap(withNullKey, col("src"),
        col("id"), col("tok"), budgets = Map.empty, defaultBudget = 100L,
        seed = 7L, binBits = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("hashSample: deterministic, nested by rate, independent across seeds") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    def ids(rate: Double, seed: Long) =
      graft.ops.Sampling.hashSample(docs, col("doc_id"), rate, seed)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s25 = ids(0.25, 7L)
    assert(s25 == ids(0.25, 7L)) // rerun picks the same rows
    assert(s25.subsetOf(ids(0.5, 7L))) // thresholds nest: raising the
    // rate only ADDS rows (same coin, higher cutoff)
    assert(ids(0.0, 7L).isEmpty)
    assert(ids(1.0, 7L).size == docs.count())
    // a different seed is a fresh coin, not a shifted cutoff
    assert(s25 != ids(0.25, 8L))
    // selection is a function of the KEY, not partitioning
    assert(s25 == graft.ops.Sampling.hashSample(
      docs.repartition(13), col("doc_id"), 0.25, 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet)
    val n = docs.count().toDouble
    assert(math.abs(s25.size / n - 0.25) < 0.15) // coin is roughly fair
    intercept[IllegalArgumentException](
      graft.ops.Sampling.hashSample(docs, col("doc_id"), 1.5))
  }

  test("stratifiedHashSample: per-stratum rates, default for unlisted") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val out = graft.ops.Sampling.stratifiedHashSample(
      docs, col("lang"), col("doc_id"),
      rates = Map("en" -> 1.0), defaultRate = 0.0, seed = 7L)
    // rate 1.0 keeps every row of the stratum, 0.0 default drops the rest
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSet
      == Set("en"))
    assert(out.count() == docs.filter(col("lang") === "en").count())
    // a listed stratum uses the SAME coin as hashSample — per-stratum
    // selection equals the global sample restricted to that stratum
    val mixed = graft.ops.Sampling.stratifiedHashSample(
      docs, col("lang"), col("doc_id"),
      rates = Map("en" -> 0.3), defaultRate = 0.3, seed = 7L)
    val flat = graft.ops.Sampling.hashSample(docs, col("doc_id"), 0.3, 7L)
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).toSet
      == flat.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("packSequences: spans tile each shard's stream; chop ids consistent") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " +")).as("n_tok"))
    val packed = graft.ops.Sampling.packSequences(
      docs, "doc_id", col("n_tok"), ctxLen = 128, shards = 4, seed = 7L)
    val rows = packed.select("doc_id", "shard", "start_off", "end_off",
      "first_pack", "last_pack").collect()
    assert(rows.length == docs.count())
    // within a shard the spans are disjoint and tile [0, total) exactly
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      val spans = rs.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
      assert(spans.head._1 == 0L)
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 == s2)
        case _ => ()
      }
    }
    // pack ids are the chop of the span
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) / 128)
      assert(r.getLong(5) == (r.getLong(3) - 1) / 128)
      assert(r.getLong(3) > r.getLong(2)) // every doc here has tokens
    }
    // layout is a pure function of (seed, id): partitioning-independent
    val again = graft.ops.Sampling.packSequences(
      docs.repartition(17), "doc_id", col("n_tok"), 128, 4, 7L)
      .select("doc_id", "shard", "start_off").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("ngramContaminated flags shared-3-gram docs, honors the df cap") {
    import spark.implicits._
    val bench = Seq(
      (1L, "the capital of france is paris obviously"),
      (2L, "common filler words everyone uses here"))
      .toDF("id", "text")
    val corpus = Seq(
      (10L, "quiz answer the capital of france is paris said the model"), // leaks bench 1
      (11L, "totally novel sentence with no overlap whatsoever present"),
      (12L, "common filler words appear in this one too"), // leaks bench 2
      (13L, "short doc"))
      .toDF("id", "text")
    val flagged = graft.ops.Dedup.ngramContaminated(corpus, bench, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(10L, 12L), flagged.toString)
    // df cap: a 3-gram present in EVERY corpus doc gets dropped before
    // the join, so boilerplate alone no longer flags anything
    val boiler = Seq.tabulate(10)(i =>
      (100L + i, s"unique$i words here plus the capital of france stanza"))
      .toDF("id", "text")
    val capped = graft.ops.Dedup.ngramContaminated(
        boiler, bench, "id", "text", maxDf = 5)
      .collect().map(_.getLong(0)).toSet
    assert(capped.isEmpty, capped.toString)
  }

  test("redactPii replaces emails, phones, IPv4 and counts them") {
    import spark.implicits._
    import graft.ops.Redact
    val df = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org or 555-123-4567"),
      (2L, "server at 10.0.0.1 and 192.168.255.254 no other pii"),
      (3L, "nothing sensitive here at all"))
      .toDF("id", "text")
    val (ne, np, ni) = Redact.piiCounts(col("text"))
    val out = df.select(col("id"), Redact.redactPii(col("text")).as("red"),
        ne, np, ni)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "reach me at <EMAIL> or <PHONE>", out(0).toString)
    assert((out(0).getInt(2), out(0).getInt(3), out(0).getInt(4)) == ((1, 1, 0)))
    assert(out(1).getString(1) == "server at <IP> and <IP> no other pii")
    assert((out(1).getInt(2), out(1).getInt(3), out(1).getInt(4)) == ((0, 0, 2)))
    assert(out(2).getString(1) == "nothing sensitive here at all")
    assert((out(2).getInt(2), out(2).getInt(3), out(2).getInt(4)) == ((0, 0, 0)))
  }

  test("videoMeta parses real MP4/AVI container headers, rejects junk") {
    import graft.ops.Multimodal
    val mp4 = Multimodal.mp4Bytes(
      timescale = 600, duration = 1500, width = 1920, height = 1080)
    val avi = Multimodal.aviBytes(
      usPerFrame = 33333, totalFrames = 300, width = 1280, height = 720)
    val m = Multimodal.decodeVideoMeta(mp4)
    assert(m == Multimodal.VideoInfo("mp4", 1920, 1080, 2500), m.toString)
    val a = Multimodal.decodeVideoMeta(avi)
    assert(a == Multimodal.VideoInfo("avi", 1280, 720, 9999), a.toString)
    // junk, truncation, and null must all yield null — never throw
    assert(Multimodal.decodeVideoMeta("plain text payload xx".getBytes) == null)
    assert(Multimodal.decodeVideoMeta(mp4.take(20)) == null)
    assert(Multimodal.decodeVideoMeta(avi.take(10)) == null)
    assert(Multimodal.decodeVideoMeta(null) == null)
    // a real image payload must not parse as video
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB), "png", baos)
    assert(Multimodal.decodeVideoMeta(baos.toByteArray) == null)
  }

  test("MJPEG-AVI frame decode: demux + real JPEG decode, stride sampling") {
    import graft.ops.Multimodal
    val avi = Multimodal.aviMjpegBytes(24, 12, Seq(40, 128, 216))
    // the container parses as video metadata too (header, not codec)
    val meta = Multimodal.decodeVideoMeta(avi)
    assert(meta != null && meta.width == 24 && meta.height == 12)
    // demux finds all three frames; each is a standalone decodable JPEG
    val frames = Multimodal.aviFrames(avi)
    assert(frames.length == 3)
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 24 && img.getHeight == 12)
    }
    // full decode: gray levels survive to within JPEG DC-quantization
    // error (solid frames, so ±8 is generous)
    val decoded = Multimodal.decodeVideoFrames(avi, maxFrames = 3)
    assert(decoded.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    decoded.zip(Seq(40, 128, 216)).foreach { case (f, g) =>
      val mean = (f.mean_r + f.mean_g + f.mean_b) / 3
      assert(math.abs(mean - g) <= 8, s"frame ${f.frame_idx}: mean=$mean vs $g")
    }
    // stride sampling picks evenly from the original stream
    val two = Multimodal.decodeVideoFrames(
      Multimodal.aviMjpegBytes(8, 8, Seq(10, 60, 110, 160, 210)), maxFrames = 2)
    assert(two.map(_.frame_idx).toSeq == Seq(0, 2))
    // junk and truncation yield empty, never throw
    assert(Multimodal.decodeVideoFrames("not avi".getBytes, 3).isEmpty)
    assert(Multimodal.decodeVideoFrames(avi.take(30), 3).isEmpty)
    assert(Multimodal.decodeVideoFrames(null, 3).isEmpty)
  }

  test("sampleFrames returns real demuxed frames for AVIs, byte windows otherwise") {
    import spark.implicits._
    import graft.ops.Multimodal
    val avi = Multimodal.aviMjpegBytes(8, 8, Seq(40, 128, 216))
    val df = Seq((1L, avi), (2L, "just some plain bytes here".getBytes))
      .toDF("id", "payload")
      .select(col("id"), Multimodal.sampleFrames(col("payload"), 3).as("fs"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    // AVI: the 3 real JPEG frames, each independently decodable
    assert(rows(1L).length == 3)
    rows(1L).foreach { f =>
      assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)) != null)
    }
    // non-AVI: documented byte-window stub shape
    assert(rows(2L).nonEmpty)
  }

  test("minhashEstimate: identical docs estimate 1.0, near-dups high, sentinel NULL") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, base), (2L, base),                       // identical -> est 1.0
      (3L, base.replace("today", "tomorrow")),      // near-dup -> est in (0, 1]
      (4L, "completely different words nothing shared here at all whatsoever"))
      .toDF("id", "text")
    val pairs = Dedup.minhashCandidates(df, "id", "text")
    val est = Dedup.minhashEstimate(df, pairs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((1L, 2L)) == 1.0)
    assert(est.get((1L, 3L)).forall(e => e > 0.0 && e <= 1.0))
    assert(est.values.forall(e => e >= 0.0 && e <= 1.0))
    // a hand-built pair with a sub-3-token doc estimates NULL, not 1.0
    val short = Seq((10L, "too short"), (11L, "also tiny")).toDF("id", "text")
    val handPair = Seq((10L, 11L)).toDF("id1", "id2")
    val row = Dedup.minhashEstimate(short, handPair, "id", "text").head()
    assert(row.isNullAt(2), "sentinel pair must estimate NULL")
    // NULL-text docs sign as empty → sentinel → NULL estimate (the pair
    // is KEPT, matching the short-doc contract — ADVICE r16)
    val nulled = Seq((10L, Option("too short")), (11L, Option.empty[String]))
      .toDF("id", "text")
    val nrow = Dedup.minhashEstimate(nulled, handPair, "id", "text").head()
    assert(nrow.isNullAt(2), "null-text pair must estimate NULL, not drop")
    // a pair whose doc is ABSENT from df is dropped entirely
    val absentPair = Seq((10L, 99L)).toDF("id1", "id2")
    assert(Dedup.minhashEstimate(short, absentPair, "id", "text").count() == 0)
  }

  test("jaccardVerify/minhashEstimate collapse duplicate candidate pairs to one row") {
    // the documented `candidates` contract: duplicate (id1, id2) pairs
    // are the SAME pair and yield ONE output row — chosen, not
    // accidental (VERDICT r16 #5); in-repo generators emit distinct
    // pairs, so this only fires for hand-built pair sets
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq((1L, base), (2L, base + " extra")).toDF("id", "text")
    val dupPairs = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("id1", "id2")
    val ver = Dedup.jaccardVerify(df, dupPairs, "id", "text", threshold = 0.1)
    assert(ver.count() == 1, "duplicate pairs must collapse to one row")
    val est = Dedup.minhashEstimate(df, dupPairs, "id", "text")
    assert(est.count() == 1, "duplicate pairs must collapse to one row")
  }

  test("resize accepts a non-trivial payload expression (Column API)") {
    import spark.implicits._
    val df = Seq((1L, "hello world payload")).toDF("id", "text")
    // expression-valued payload (encode(...)): the old string-interpolated
    // form broke on exactly this
    val out = df.select(
      graft.ops.Multimodal.resize(encode(col("text"), "UTF-8"), 5).as("p"))
      .head().getAs[Array[Byte]](0)
    assert(new String(out, "UTF-8") == "hello")
  }

  test("temperatureRates: alpha=1 is identity, alpha<1 flattens, smallest stratum gains most") {
    val sizes = Map("big" -> 9000L, "mid" -> 900L, "small" -> 100L)
    // alpha = 1: natural proportions, every rate 1 (nothing to reshape)
    val nat = graft.ops.Sampling.temperatureRates(sizes, 1.0)
    assert(nat.values.forall(r => math.abs(r - 1.0) < 1e-12))
    // alpha = 0.5: realized share of the small stratum grows, big shrinks
    val r = graft.ops.Sampling.temperatureRates(sizes, 0.5)
    assert(r.values.forall(v => v > 0 && v <= 1.0 + 1e-12))
    assert(math.abs(r("small") - 1.0) < 1e-12) // max-gain stratum keeps all
    val kept = sizes.map { case (s, n) => s -> n * r(s) }
    val tot = kept.values.sum
    def share(s: String) = kept(s) / tot
    assert(share("small") > 100.0 / 10000.0)
    assert(share("big") < 9000.0 / 10000.0)
    // realized shares match the alpha-scaled target exactly
    val targetNorm = sizes.map { case (s, n) => s -> math.pow(n / 10000.0, 0.5) }
    val tTot = targetNorm.values.sum
    sizes.keys.foreach { s =>
      assert(math.abs(share(s) - targetNorm(s) / tTot) < 1e-9, s)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.temperatureRates(sizes, 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.temperatureRates(Map("x" -> 0L), 0.5)
    }
  }

  test("stripHtml: block content removed, entities decoded after tag-strip, whitespace collapsed") {
    import spark.implicits._
    val cases = Seq(
      (1L, "<p>hello <b>world</b></p>", "hello world"),
      // script/style vanish WITH their content, any case, multi-line
      (2L, "a<SCRIPT>\nvar x = '<p>';\n</SCRIPT>b<style media=\"x\">p{}</style>c", "a b c"),
      (3L, "keep <!-- drop\nme -->this", "keep this"),
      // entities decode AFTER tags: '&lt;b&gt;' survives as literal text
      (4L, "x &lt;b&gt; &amp;&amp; &quot;q&quot; &#39;s&#39;&nbsp;y", "x <b> && \"q\" 's' y"),
      // double-encoded stays single-decoded (&amp;lt; -> &lt;, not <)
      (5L, "z &amp;lt; w", "z &lt; w"),
      (6L, "  spaced\t\tout\n\n text  ", "spaced out text"))
    val got = cases.map { case (id, in, _) => (id, in) }
      .toDF("id", "html")
      .select($"id", graft.ops.Redact.stripHtml($"html").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) === want, s"case $id")
    }
  }

  test("deterministicShuffle: bijective sharded permutation, rerun-stable, seed-sensitive") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"doc$i")).toDF("id", "payload")
      .repartition(7)
    val out = graft.ops.Sampling.deterministicShuffle(df, col("id"), 8).collect()
    // bijection: every input row appears once, payload intact
    assert(out.length == 200)
    assert(out.map(_.getLong(0)).toSet == (0L until 200L).toSet)
    assert(out.forall(r => r.getString(1) == s"doc${r.getLong(0)}"))
    // shards in range; positions dense 0..n_s-1 within each shard
    val byShard = out.groupBy(_.getInt(2))
    assert(byShard.keys.forall(s => s >= 0 && s < 8))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // rerun-stable; a different seed gives a different order
    val again = graft.ops.Sampling.deterministicShuffle(df, col("id"), 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet)
    val other = graft.ops.Sampling.deterministicShuffle(df, col("id"), 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    assert(other != again)
    // null keys dropped; reserved output columns rejected
    val withNull = Seq((Some(1L), "a"), (None: Option[Long], "b"))
      .toDF("id", "payload")
    assert(graft.ops.Sampling.deterministicShuffle(withNull, col("id"), 2)
      .count() == 1)
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.deterministicShuffle(
        df.withColumn("pos", lit(0)), col("id"), 2)
    }
  }
}
