package graft

import graft.examples.ScaleReplicate
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-up fixtures' ISOMORPHISM claim (docs/ROUND8.md leans on
  * it): a `factor`× replica corpus must carry exactly `factor`× the
  * duplicate/near-duplicate structure — within-replica structure
  * bit-preserved, cross-replica leakage zero — so any super-linear
  * bench growth measured on it is attributable to the algorithm, not
  * the fixture. */
class ScaleReplicateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet")
    .filter(col("doc_id") < 200)
  private def emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    .filter(col("vec_id") < 200)

  test("exact-dup structure scales exactly linearly; zero cross-replica dups") {
    val factor = 3
    val reps = ScaleReplicate.docReplicas(docs, factor, nDoc = 200L)
    val scaled = reps.reduce(_ unionAll _)
    val baseSurv = Dedup.exact(docs, "doc_id", Seq("text")).count()
    val scaledSurv = Dedup.exact(scaled, "doc_id", Seq("text")).count()
    assert(scaledSurv === factor * baseSurv,
      s"exact-dup survivors $scaledSurv != $factor x $baseSurv — " +
        "cross-replica texts collide or within-replica structure drifted")
  }

  private def replicaOf(c: org.apache.spark.sql.Column) =
    floor(c / 200).cast("long")

  test("minhash structure scales linearly; cross-replica VERIFIED near-dups are zero") {
    val factor = 3
    val scaled = ScaleReplicate.docReplicas(docs, factor, nDoc = 200L)
      .reduce(_ unionAll _)
    val basePairs = Dedup.minhashCandidates(docs, "doc_id", "text").count()
    val pairs = Dedup.minhashCandidates(scaled, "doc_id", "text")
      .persist()
    val within = pairs
      .filter(replicaOf(col("id1")) === replicaOf(col("id2"))).count()
    // banding is HASH-dependent: renamed shingles draw fresh minhashes,
    // so borderline-Jaccard pairs collide in one replica and not
    // another — candidate counts are preserved statistically, not
    // exactly (exact Jaccard IS preserved; the q44-family verification
    // step makes the final structure exact). The allowed wobble is
    // DERIVED from the banding S-curve, not a constant: a pair with
    // Jaccard J collides with p(J) = 1 − (1 − J^r)^b (r = 2 rows/band,
    // b = 4 bands — minhashCandidates' 8-hash/4-band default), so the
    // per-replica candidate count is a sum of Bernoullis with variance
    // Σ p(1−p) over all doc pairs — only BORDERLINE pairs (p strictly
    // inside (0,1)) contribute. within − factor·basePairs spans
    // factor−1 fresh hash draws plus factor−1 copies of the base
    // draw's own noise, so its variance is ≤ factor·(factor+1)·Σp(1−p);
    // gate at 6σ (+4 absolute floor for the pair-level dependence the
    // shared-doc signatures introduce). A future signature-width change
    // reshapes p(J) and the tolerance FOLLOWS — it cannot silently
    // widen relative to the hash geometry.
    val rRows = 2
    val bBands = 4
    val sh = docs.select(col("doc_id"),
      array_distinct(graft.ops.TokenLm.tokenNgrams(col("text"), 3)).as("sh"))
    val pStats = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(
        when(size(array_union(col("a.sh"), col("b.sh"))) === 0, 0.0)
          .otherwise(
            size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
              size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .select((lit(1.0) - pow(lit(1.0) - pow(col("j"), rRows), bBands)).as("p"))
      .agg(sum(col("p")).as("mu"),
        sum(col("p") * (lit(1.0) - col("p"))).as("v"))
      .collect().head
    val varSum = pStats.getDouble(1)
    val tol = math.ceil(
      6.0 * math.sqrt(factor.toDouble * (factor + 1) * varSum)).toLong + 4L
    val lo = factor * basePairs - tol
    val hi = factor * basePairs + tol
    assert(within >= lo && within <= hi,
      s"within-replica candidate pairs $within outside [$lo, $hi] " +
        s"(= $factor x $basePairs ± banding wobble) — the bijective " +
        "renaming did not preserve shingle structure")
    // cross-replica CANDIDATES can occur (preserved-stopword shingles +
    // 2-row band collisions at low Jaccard); their RATE must stay at or
    // below the corpus's own candidate rate, and NONE may survive exact
    // verification — that is the property the scaling table needs
    val cross = pairs
      .filter(replicaOf(col("id1")) =!= replicaOf(col("id2")))
    val baseRate = basePairs.toDouble / (200L * 199L / 2L)
    val crossRate = cross.count().toDouble /
      (factor.toLong * (factor - 1L) / 2L * 200L * 200L)
    assert(crossRate <= 2.0 * baseRate,
      f"cross-replica candidate rate $crossRate%.5f exceeds 2x the " +
        f"corpus's own rate $baseRate%.5f")
    val crossVerified = Dedup.jaccardVerify(scaled, cross,
      "doc_id", "text", threshold = 0.5).count()
    assert(crossVerified === 0L,
      s"$crossVerified cross-replica pairs passed Jaccard 0.5 — replicas " +
        "are not textually independent")
    spark.sharedState.cacheManager.clearCache() // band frames persist per plan
  }

  test("embedding shifts are isometries: cosine pairs scale linearly, cross-replica ~none") {
    val factor = 3
    val scaled = ScaleReplicate.embReplicas(emb, factor, nVec = 200L)
      .reduce(_ unionAll _)
    // a CONSTANT bucket isolates the isometry claim: LSH bucketing is
    // deliberately NOT permutation-invariant (each replica buckets
    // differently), but pairwise cosines are — so all-pairs within one
    // bucket must reproduce the base structure exactly per replica
    val basePairs = Dedup.cosineNearDups(emb, "vec_id", "embedding",
      threshold = 0.3, bucketCol = lit(0)).count()
    val pairs = Dedup.cosineNearDups(scaled, "vec_id", "embedding",
      threshold = 0.3, bucketCol = lit(0)).persist()
    val within = pairs
      .filter(replicaOf(col("id1")) === replicaOf(col("id2"))).count()
    val cross = pairs
      .filter(replicaOf(col("id1")) =!= replicaOf(col("id2"))).count()
    assert(within === factor * basePairs,
      s"within-replica cosine pairs $within != $factor x $basePairs")
    // at threshold 0.3 over 64 dims even UNRELATED vectors pass at a
    // base rate (~1/√d cosine spread), so zero cross-replica pairs is
    // the wrong claim — the right one is that the cross-replica RATE
    // matches the corpus's own pair rate (shifted replicas look like
    // unrelated corpus vectors). A naive copy fails instantly: its 200
    // cos-1.0 diagonal pairs alone put the rate far above 2x.
    val baseRate = basePairs.toDouble / (200L * 199L / 2L)
    val crossRate = cross.toDouble /
      (factor.toLong * (factor - 1L) / 2L * 200L * 200L)
    assert(crossRate <= 2.0 * baseRate,
      f"cross-replica pair rate $crossRate%.5f exceeds 2x the corpus's " +
        f"own rate $baseRate%.5f — shifts are not decorrelating")
    spark.sharedState.cacheManager.clearCache()
  }

  test("signed-permutation replicas (r >= 128) are isometries too") {
    // the past-factor-128 family (seeded Fisher–Yates + sign vector):
    // same exactness bar as the shift family — within-replica rounded
    // cosine pairs reproduce the base count EXACTLY per replica, and
    // cross-replica pairs stay at the unrelated-corpus base rate. Uses
    // replicas {0, 129, 130}: one identity + two permutation draws.
    val all = ScaleReplicate.embReplicas(emb, 131, nVec = 200L)
    val scaled = Seq(all(0), all(129), all(130)).reduce(_ unionAll _)
    val basePairs = Dedup.cosineNearDups(emb, "vec_id", "embedding",
      threshold = 0.3, bucketCol = lit(0)).count()
    val pairs = Dedup.cosineNearDups(scaled, "vec_id", "embedding",
      threshold = 0.3, bucketCol = lit(0)).persist()
    val within = pairs
      .filter(replicaOf(col("id1")) === replicaOf(col("id2"))).count()
    val cross = pairs
      .filter(replicaOf(col("id1")) =!= replicaOf(col("id2"))).count()
    assert(within === 3 * basePairs,
      s"within-replica cosine pairs $within != 3 x $basePairs — the " +
        "signed permutation is not an exact isometry under 6dp rounding")
    val baseRate = basePairs.toDouble / (200L * 199L / 2L)
    val crossRate = cross.toDouble / (3L * 200L * 200L)
    assert(crossRate <= 2.0 * baseRate,
      f"cross-replica pair rate $crossRate%.5f exceeds 2x the corpus's " +
        f"own rate $baseRate%.5f — sign-permutations are not decorrelating")
    spark.sharedState.cacheManager.clearCache()
  }

  test("relational key-offset replicas preserve join multiplicity exactly") {
    // the relational analog of the isomorphism claim: a factor× corpus
    // must produce factor× join rows (plain copies would produce
    // factor²× — every orders copy matching every lineitem copy of the
    // same key). Built exactly as main() builds them: shared strides
    // from the parent tables.
    val factor = 3
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val c = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
    val oStride = o.agg(max("o_orderkey")).head().getLong(0) + 1L
    val cStride = c.agg(max("c_custkey")).head().getLong(0) + 1L
    val liR = ScaleReplicate.keyOffsetReplicas(li, factor,
      Map("l_orderkey" -> oStride)).reduce(_ unionAll _)
    val oR = ScaleReplicate.keyOffsetReplicas(o, factor,
      Map("o_orderkey" -> oStride, "o_custkey" -> cStride)).reduce(_ unionAll _)
    val cR = ScaleReplicate.keyOffsetReplicas(c, factor,
      Map("c_custkey" -> cStride)).reduce(_ unionAll _)
    val base = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")).count()
    val scaled = liR.join(oR, liR("l_orderkey") === oR("o_orderkey"))
      .join(cR, oR("o_custkey") === cR("c_custkey")).count()
    assert(scaled === factor * base,
      s"3-way join rows $scaled != $factor x $base — key offsets are " +
        "not replica-disjoint or foreign keys drifted out of alignment")
    // replica disjointness of the primary keys themselves
    assert(oR.select("o_orderkey").distinct().count() ===
      factor * o.select("o_orderkey").distinct().count())
  }

  test("exploded single-plan builders == the Seq/union builders, row for row (r16)") {
    // docReplicasExploded / keyOffsetExploded rebuild the same replica
    // families through ONE plan (replica index as a joined column) —
    // the fourth-decade fixture path. Multiset equality against the
    // historical builders is the whole contract: same rows, any order,
    // any file layout. exceptAll both ways = exact multiset compare
    // (duplicates counted).
    val factor = 5
    val seqDocs = ScaleReplicate.docReplicas(docs, factor, nDoc = 200L, suffix = "y")
      .reduce(_ unionAll _)
    val expDocs = ScaleReplicate.docReplicasExploded(docs, factor, nDoc = 200L,
      suffix = "y", rParts = 3)
    assert(expDocs.exceptAll(seqDocs).isEmpty && seqDocs.exceptAll(expDocs).isEmpty,
      "exploded docs replica multiset drifted from the Seq builder's")
    assert(expDocs.columns.toSeq === seqDocs.columns.toSeq)

    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .filter(col("l_orderkey") < 400)
    val seqLi = ScaleReplicate.keyOffsetReplicas(li, factor,
      Map("l_orderkey" -> 6001L)).reduce(_ unionAll _)
    val expLi = ScaleReplicate.keyOffsetExploded(li, factor,
      Map("l_orderkey" -> 6001L), rParts = 3)
    assert(expLi.exceptAll(seqLi).isEmpty && seqLi.exceptAll(expLi).isEmpty,
      "exploded key-offset replica multiset drifted from the Seq builder's")
    assert(expLi.columns.toSeq === seqLi.columns.toSeq)
  }

  test("event replicas: per-user streams disjoint, window grid unchanged") {
    val ev = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
    val factor = 3
    val eStride = ev.agg(max("event_id")).head().getLong(0) + 1L
    val uStride = ev.agg(max("user_id")).head().getLong(0) + 1L
    val evR = ScaleReplicate.keyOffsetReplicas(ev, factor,
        Map("event_id" -> eStride, "user_id" -> uStride))
      .reduce(_ unionAll _)
    // factor× users, each stream an exact copy of its base shape
    assert(evR.select("user_id").distinct().count() ===
      factor * ev.select("user_id").distinct().count())
    // the tumbling grid (bucket, type) is time-keyed, so the grid rows
    // are UNCHANGED while each count grows exactly ×factor
    val grid = ev.groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val gridR = evR.groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(gridR.count() === grid.count())
    assert(gridR.agg(max("n")).head().getLong(0) ===
      factor * grid.agg(max("n")).head().getLong(0))
  }
}
