package graft

import graft.ops.{Dedup, Similarity}
import graft.queries.{Queries, SimilarityQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the q143/q144 scale-proof semantic-dedup oracle (r8 verdict
  * item #1) and the auto-scaled cell-count discipline (item #4).
  *
  * The q144 probe's cross-engine hash match only proves both engines
  * AGREE on (n_probed, n_violations) — a candidate generator that
  * silently dropped an edge would make both engines agree on a nonzero
  * violation count. THIS spec is the gate that makes that a build
  * failure: n_violations must be zero. */
class SemDedupOracleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q144 completeness probe: zero violations at sf0.01, nonzero sample") {
    val row = Queries.byName("q144_semdedup_probe")
      .spark(spark, TestSpark.sf001).collect().head
    val probed = row.getLong(row.fieldIndex("n_probed"))
    val viol = row.getLong(row.fieldIndex("n_violations"))
    assert(probed > 0, "probe sampled no pairs — the gate is vacuous")
    assert(viol == 0L,
      s"$viol sampled same-cell pairs with cosine >= threshold are missing " +
        "from the persisted candidate set — candidate generation is " +
        "INCOMPLETE and the q143 oracle would silently verify the smaller graph")
  }

  test("q143 survivors == production semDedup on the same trained centroids") {
    // q143 routes through the persisted sidecar (write → read-back →
    // keepOnePerCluster); the production entry point is Dedup.semDedup
    // in one piece. The two must be the same set, or the oracle is
    // checking a path users don't run.
    val viaSidecar = Queries.byName("q143_semdedup_scaled")
      .spark(spark, TestSpark.sf001).collect().map(_.getLong(0)).toSet
    val emb = spark.read.parquet(s"${TestSpark.sf001}/embeddings.parquet")
    val cents = Similarity.loadCentroids(
      spark, s"${SimilarityQueries.sidecarBase(TestSpark.sf001)}/q143_centroids.parquet")
    val direct = Dedup.semDedup(emb, "vec_id", "embedding", cents,
        threshold = SimilarityQueries.SemDedupTau, roundDp = 6,
        maxBucket = 1 << 20,
        nprobe = SimilarityQueries.effectiveNprobe(cents.length))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(viaSidecar == direct,
      s"sidecar-path survivors diverge from Dedup.semDedup: " +
        s"only-sidecar=${(viaSidecar -- direct).take(5)} " +
        s"only-direct=${(direct -- viaSidecar).take(5)}")
  }

  test("sidecar build: manifest-matched skip, config-change rebuild (r11 #1)") {
    import java.nio.file.{Files, Paths}
    val base = Paths.get(SimilarityQueries.sidecarBase(TestSpark.sf0001))
    val manifest = base.resolve("manifest.json")
    // first call ensures the artifacts exist for this fixture
    SimilarityQueries.semDedupSidecars(spark, TestSpark.sf0001)
    assert(Files.exists(manifest), "build produced no manifest")
    // normalize to the CURRENT manifest format before byte-comparing:
    // an on-disk manifest from an older format would match on config
    // (skip) yet differ byte-wise from what a rebuild writes, failing
    // the equality below once per format change — force one rebuild
    Files.writeString(manifest,
      Files.readString(manifest)
        .replaceFirst(""""config":\s*"[^"]*"""", "\"config\": \"NORMALIZE\""))
    SimilarityQueries.semDedupSidecars(spark, TestSpark.sf0001)
    val t1 = Files.getLastModifiedTime(manifest)
    val body1 = Files.readString(manifest)
    // matched manifest -> the second call must NOT rebuild (at sf100 a
    // redundant rebuild is ~50 min of wasted candidate materialization)
    SimilarityQueries.semDedupSidecars(spark, TestSpark.sf0001)
    assert(Files.getLastModifiedTime(manifest) == t1 && Files.readString(manifest) == body1,
      "second same-config call rewrote the sidecars — the manifest skip is dead")
    // a config drift (any knob change) must force a rebuild: simulate by
    // corrupting the recorded fingerprint
    Files.writeString(manifest,
      body1.replaceFirst(""""config":\s*"[^"]*"""", "\"config\": \"STALE\""))
    SimilarityQueries.semDedupSidecars(spark, TestSpark.sf0001)
    val body2 = Files.readString(manifest)
    assert(body2 == body1,
      "rebuild after config drift did not restore the deterministic manifest")
  }

  test("autoCellCount: density within 2x of target once n >= 2*target") {
    for (t <- Seq(8, 64, 256, 1024); n <- Seq(2L * t, 10L * t, 1000L * t, 12345L)) {
      if (n >= 2L * t) {
        val k = Similarity.autoCellCount(n, t)
        val density = n.toDouble / k
        assert(density >= t / 2.0 && density <= 2.0 * t,
          s"n=$n target=$t -> k=$k density=$density outside [t/2, 2t]")
      }
    }
  }

  test("autoCellCount: bounds and monotonicity") {
    assert(Similarity.autoCellCount(0) == 1)   // degenerate: one cell
    assert(Similarity.autoCellCount(1) == 1)
    assert(Similarity.autoCellCount(100, 256) == 1) // tiny corpus: exact all-pairs
    // k never exceeds n (trainIvfCentroids requires k <= corpus rows)
    for (n <- Seq(1L, 3L, 200L, 255L, 257L, 100000L))
      assert(Similarity.autoCellCount(n) <= n)
    // nondecreasing in n: growing a corpus never shrinks the quantizer
    val ks = Seq(1L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(Similarity.autoCellCount(_))
    assert(ks == ks.sorted, s"autoCellCount not monotone: $ks")
  }

  test("autoLshBits: smallest width with target·2^b >= n; bounds; monotone") {
    // exact boundary semantics (integer arithmetic — no float ceil/log
    // wobble): 512·2^b >= n, smallest b >= 1
    assert(Similarity.autoLshBits(0) == 1)
    assert(Similarity.autoLshBits(1024) == 1)   // 512·2 = 1024 >= n
    assert(Similarity.autoLshBits(1025) == 2)   // first n past the b=1 cap
    assert(Similarity.autoLshBits(2000) == 2)   // sf0.1 embeddings
    assert(Similarity.autoLshBits(20000) == 6)  // sf1: 512·64 = 32768
    assert(Similarity.autoLshBits(200000) == 9) // sf10: 512·512 = 262144
    // cap: the packed Int signature must never reach the sign bit, and
    // the width stays disjoint from the offset-32 sub-key planes
    assert(Similarity.autoLshBits(Long.MaxValue) == 30)
    // expected occupancy n/2^b stays within [target/2, target] once
    // n > 2·target (below that b floors at 1)
    for (n <- Seq(3000L, 50000L, 1234567L, 99999999L)) {
      val b = Similarity.autoLshBits(n)
      val occ = n.toDouble / (1L << b)
      assert(occ <= 512.0 && occ > 256.0, s"n=$n b=$b occ=$occ")
    }
    val bs = Seq(100L, 5000L, 100000L, 10000000L).map(Similarity.autoLshBits(_))
    assert(bs == bs.sorted, s"autoLshBits not monotone: $bs")
  }
}
