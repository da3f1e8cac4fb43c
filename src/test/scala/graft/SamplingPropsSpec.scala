package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property suite for the deterministic sampling/packing operators: the
  * md5-u32 coin is pinned to a driver-side reimplementation (so the
  * Spark expression can never drift from the documented formula), and
  * the set-level invariants — rate nesting, stratified≡flat degeneracy,
  * threshold exactness, pack-span tiling — are checked over generated
  * rates, seeds, and corpora. The coin column is collected ONCE per
  * seed; rate properties are then pure set algebra (no Spark job per
  * case). */
object SamplingPropsSpec extends Properties("Sampling") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  /** Driver-side twin of Sampling.hashU32: first 8 hex chars of
    * md5("<seed>:<key>") as an unsigned 32-bit value. */
  private def coinLocal(key: String, seed: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$key".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private def coins(seed: Long): Map[Long, Long] = {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    docs.select(col("doc_id"), Sampling.hashU32(col("doc_id"), seed).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }
  private lazy val coin7 = coins(7L)

  property("hashU32 equals the driver-side md5 formula for any seed") =
    forAll(Gen.choose(-1000L, 1000L)) { seed =>
      val got = coins(seed)
      got.forall { case (id, h) => h == coinLocal(id.toString, seed) }
    }

  property("rate nesting: every kept key at r1 is kept at r2 >= r1") =
    forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, b) =>
      val (r1, r2) = (math.min(a, b), math.max(a, b))
      def kept(r: Double) =
        coin7.filter(_._2 < math.round(r * 4294967296.0)).keySet
      kept(r1).subsetOf(kept(r2))
    }

  property("threshold exactness: kept iff coin < round(rate*2^32)") =
    forAll(Gen.choose(0.0, 1.0)) { rate =>
      val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      val got = Sampling.hashSample(docs, col("doc_id"), rate, 7L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val thr = math.round(rate * 4294967296.0)
      got == coin7.filter(_._2 < thr).keySet
    }

  property("stratified at uniform rates degenerates to the flat sample") =
    forAll(Gen.choose(0.0, 1.0)) { rate =>
      val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      val strat = Sampling.stratifiedHashSample(docs, col("lang"),
        col("doc_id"), rates = Map("en" -> rate, "fr" -> rate),
        defaultRate = rate, seed = 7L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val thr = math.round(rate * 4294967296.0)
      strat == coin7.filter(_._2 < thr).keySet
    }

  private case class Corpus(toks: Seq[(Long, Int)], ctxLen: Int, shards: Int)
  private val corpusGen: Gen[Corpus] = for {
    n <- Gen.choose(1, 40)
    toks <- Gen.listOfN(n, Gen.choose(1, 300))
    ctxLen <- Gen.choose(16, 512)
    shards <- Gen.choose(1, 6)
  } yield Corpus(toks.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    ctxLen, shards)

  property("packSequences matches a serial driver-side layout") =
    forAll(corpusGen) { c =>
      import spark.implicits._
      val df = c.toks.toDF("doc_id", "n_tok")
      val got = Sampling.packSequences(df, "doc_id", col("n_tok"),
          c.ctxLen, c.shards, seed = 7L)
        .select("doc_id", "shard", "start_off", "end_off",
          "first_pack", "last_pack")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      // serial reference: shard by coin, order by (coin, id), run the sum
      val want = c.toks
        .map { case (id, t) => (id, t, coinLocal(id.toString, 7L)) }
        .groupBy { case (id, _, h) => (h % c.shards).toInt }
        .flatMap { case (shard, rows) =>
          var off = 0L
          rows.sortBy { case (id, _, h) => (h, id) }.map { case (id, t, _) =>
            val start = off; off += t
            id -> ((shard, start, off,
              start / c.ctxLen, (off - 1) / c.ctxLen))
          }
        }
      got == want
    }

  private case class BudgetCase(budget0: Long, defBudget: Long,
      binBits: Int, seed: Long)
  private val budgetGen: Gen[BudgetCase] = for {
    b0 <- Gen.oneOf(Gen.const(0L), Gen.choose(0L, 3000L))
    bd <- Gen.choose(0L, 1500L)
    bits <- Gen.choose(1, 12) // tiny bins force multi-row cut bins
    seed <- Gen.choose(-1000L, 1000L)
  } yield BudgetCase(b0, bd, bits, seed)

  property("tokenBudgetCap (binned) equals the naive running-sum rule") =
    forAll(budgetGen) { c =>
      val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " +")).as("n_tok"))
      val rows = docs.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      val firstSrc = rows.map(_._2).min
      def budgetOf(s: String) = if (s == firstSrc) c.budget0 else c.defBudget
      // serial reference: per stratum, take docs in (coin, key) order
      // while the running before-sum stays under the budget. The
      // product tiebreaks hash collisions on the key's STRING form
      // (keyCol.cast("string"), same as the q105 oracle's CAST) — the
      // reference must sort "10" < "2", not 2 < 10
      val want = rows.groupBy(_._2).iterator.flatMap { case (src, rs) =>
        var cum = 0L
        rs.sortBy { case (id, _, _) =>
            (coinLocal(id.toString, c.seed), id.toString) }
          .flatMap { case (id, _, t) =>
            val keep = cum < budgetOf(src); cum += t
            if (keep) Some(id) else None
          }
      }.toSet
      val got = Sampling.tokenBudgetCap(docs, col("source"), col("doc_id"),
          col("n_tok"), budgets = Map(firstSrc -> c.budget0),
          defaultBudget = c.defBudget, seed = c.seed, binBits = c.binBits)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      got == want
    }

  private val weightsGen: Gen[Array[Double]] =
    Gen.choose(2, 5).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0.01, 10.0)).map(_.toArray))

  property("hashSplit is a disjoint, exhaustive, threshold-exact partition") =
    forAll(weightsGen, Gen.choose(-1000L, 1000L)) { (w, seed) =>
      val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
      val splits = Sampling.hashSplit(docs, w, col("doc_id"), seed)
        .map(_.select("doc_id").collect().map(_.getLong(0)).toSet)
      // exhaustive + disjoint set algebra
      val union = splits.reduce(_ union _)
      val disjoint = splits.combinations(2).forall {
        case Array(a, b) => (a intersect b).isEmpty
      }
      // threshold-exact vs the driver-side coin + the documented rounding
      val total = w.sum
      val bounds = w.scanLeft(0.0)(_ + _)
        .map(c => math.round(c / total * 4294967296.0))
      bounds(bounds.length - 1) = 4294967296L
      val exact = splits.zipWithIndex.forall { case (s, i) =>
        s == all.filter { id =>
          val h = coinLocal(id.toString, seed)
          h >= bounds(i) && h < bounds(i + 1)
        }
      }
      union == all && disjoint && exact
    }
}
