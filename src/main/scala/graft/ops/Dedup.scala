package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (north star #1) as DataFrame transformers.
  * Every variant follows the same 100 TB shape: one narrow projection
  * pass to a compact key (hash / signature / band bucket), then a
  * key-grouped shuffle of keys only — the corpus itself is never
  * re-shuffled or pairwise-joined.
  */
object Dedup {

  /** Exact dedup on chosen columns: keeps the min-`idCol` row per group.
    * (hash-groupBy; at scale this is a single shuffle of md5 keys).
    *
    * Key encoding is collision-free by construction: each column
    * contributes a fixed-width token -- a 1-char null flag plus the md5
    * of its string form -- so no value string can collide with a NULL
    * sentinel, and no embedded separator byte can make two distinct
    * column tuples concatenate identically (in-band sentinels would
    * conflate a genuine value equal to the sentinel with NULL and drop
    * a non-duplicate row). */
  def exact(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    val key = md5(concat(cols.flatMap(c => Seq(
      when(col(c).isNull, lit("0")).otherwise(lit("1")),
      md5(coalesce(col(c).cast("string"), lit(""))))): _*))
    val keepers = df.groupBy(key.as("__dupkey"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
    df.join(keepers.select(col(idCol), col("n_copies")), Seq(idCol), "inner")
  }

  /** MinHash near-dup candidate pairs over a text column via banded LSH.
    * Returns (id1, id2) candidates; follow with `jaccardVerify` to filter
    * to true near-dups.
    *
    * `numHashes` is the signature width (8 = the oracle-checked default;
    * 128 = the typical production width — more hashes sharpen the
    * banding S-curve, so recall at the target jaccard rises while chance
    * collisions fall). `bands` must tile the signature exactly or hashes
    * would be silently dropped / buckets degenerate to a single empty
    * string = full O(n²) cross-product. */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String, bands: Int = 4,
      numHashes: Int = 8): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands must tile the $numHashes-hash signature exactly, got $bands")
    val b = banded(df, idCol, textCol, bands, numHashes)
    val l = b.as("l"); val r = b.as("r")
    l.join(r, col("l.__band") === col("r.__band")
        && col("l.__bucket") === col("r.__bucket")
        && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id1"), col("r.__id").as("id2"))
      .distinct()
  }

  /** Incremental (asymmetric) MinHash candidates: match a NEW batch
    * against an existing REFERENCE corpus — the daily-ingest shape, where
    * the reference side's signatures are computed once (or read from a
    * signature table) and each incoming batch only hashes itself. Returns
    * (new_id, ref_id) pairs sharing any band; no id ordering constraint
    * (the sides are distinct corpora). Same banding, sentinel, and width
    * rules as [[minhashCandidates]]. */
  def minhashCandidatesAgainst(
      newDf: DataFrame, refDf: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, numHashes: Int = 8): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands must tile the $numHashes-hash signature exactly, got $bands")
    val n = banded(newDf, idCol, textCol, bands, numHashes).as("n")
    val r = banded(refDf, idCol, textCol, bands, numHashes).as("r")
    n.join(r, col("n.__band") === col("r.__band")
        && col("n.__bucket") === col("r.__bucket"))
      .select(col("n.__id").as("new_id"), col("r.__id").as("ref_id"))
      .distinct()
  }

  /** Shared banded-signature frame: ONE native-MinHashSig projection (an
    * explode fan-out, not a union of per-band selects that would re-plan
    * the scan + shingle hashing per band), with the short-doc sentinel
    * filter — docs too short to shingle (<3 tokens) all share the
    * Long.MaxValue empty-signature minima and would collide into ONE
    * quadratic bucket; they have no shingles to match on, so they are
    * dropped from candidate generation entirely. */
  private def banded(df: DataFrame, idCol: String, textCol: String,
      bands: Int, numHashes: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sig = ColumnBridge.column(graft.functions.MinHashSig(
      ColumnBridge.expression(col(textCol)), numHashes))
    val sigd = df.select(col(idCol).as("__id"), sig.as("__sig"))
      .filter(element_at(col("__sig"), 1) =!= Long.MaxValue)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":", (0 until rowsPerBand).map(r =>
          element_at(col("__sig"), b * rowsPerBand + r + 1).cast("string")): _*)
          .as("bucket"))
    }
    sigd.select(col("__id"), explode(array(bandStructs: _*)).as("__bk"))
      .select(col("__id"), col("__bk.band").as("__band"),
        col("__bk.bucket").as("__bucket"))
  }

  /** Exact Jaccard over token 3-shingles for candidate verification. */
  def jaccardVerify(
      df: DataFrame, candidates: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val toks = split(col(textCol), " +")
    val shingles = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3))))).otherwise(array().cast("array<string>"))
    val sh = df.select(col(idCol).as("__id"), shingles.as("__sh"))
    candidates
      .join(sh.withColumnRenamed("__id", "id1").withColumnRenamed("__sh", "__sh1"), "id1")
      .join(sh.withColumnRenamed("__id", "id2").withColumnRenamed("__sh", "__sh2"), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("__sh1"), col("__sh2"))).cast("double") /
          size(array_union(col("__sh1"), col("__sh2"))))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** SimHash fingerprints (native codegen'd expression, one md5 pass per
    * token for all `bits` votes). `bits = 64` is the production width —
    * a signed long whose bit 63 is the sign bit; shift/xor/popcount all
    * operate on the two's-complement pattern identically across engines.
    * `bits = 16` reproduces the historical narrow fingerprint bit-for-bit
    * (oracle continuity for q43). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // Column-API construction (not expr(s"simhash_fp($textCol)")) so any
    // column name — spaces, dots, backticks — resolves like col() does
    val fp = ColumnBridge.column(graft.functions.SimHashFp(
      ColumnBridge.expression(col(textCol)), bits))
    df.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash near-dup pairs via hamming bands: the fingerprint is split
    * into `bands` equal bit-chunks; docs sharing ANY band key are
    * candidates (pigeonhole: guaranteed recall for hamming < bands), then
    * the exact popcount(xor) filter keeps hamming <= `maxHamming`.
    *
    * 100 TB shape: `bands` narrow (band, key) shuffles of FINGERPRINTS
    * (never text), pairwise only within band buckets. With the default
    * 64-bit / 4-band split each band key has 2^16 values, so buckets hold
    * ~n/65536 docs — the within-bucket join stays linear at corpus scale
    * (the old 16-bit/8-bit-key form went quadratic past ~10^6 docs). */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String, bits: Int = 64,
      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(bands >= 1 && bands <= bits && bits % bands == 0,
      s"bands must tile the $bits-bit fingerprint exactly, got $bands")
    val bandBits = bits / bands
    require(bandBits <= 32, s"band keys must fit 32 bits, got $bandBits")
    val mask = (1L << bandBits) - 1
    val sim = simhash(df, idCol, textCol, bits)
      .select(col(idCol).as("__id"), col("simhash"))
    // ONE fingerprint projection then an explode fan-out (a union of
    // per-band selects would re-plan the scan + per-token md5 once per
    // band — 4× the text I/O for the default split). Arithmetic shift +
    // mask extracts each band identically on any engine (sign-extension
    // bits die under the mask).
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("key"))
    }
    val banded = sim
      .select(col("__id"), col("simhash"),
        explode(array(bandStructs: _*)).as("__bk"))
      .select(col("__id"), col("simhash"),
        col("__bk.band").as("__band"), col("__bk.key").as("__key"))
    val a = banded.as("a"); val b2 = banded.as("b")
    a.join(b2, col("a.__band") === col("b.__band")
        && col("a.__key") === col("b.__key")
        && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over a near-dup PAIR set: each node's cluster
    * id is the minimum id reachable through pair edges (min-label
    * propagation to fixpoint). This is the step that turns pairwise
    * near-dup evidence into dedup GROUPS — transitively: if a~b and b~c,
    * then {a,b,c} is one cluster with representative min(a,b,c) — so a
    * pipeline keeps exactly one doc per cluster instead of dropping one
    * side of each pair (which can over- or under-delete on chains).
    *
    * 100 TB shape: iterates over the PAIR graph only (candidates after
    * banding/verification — orders of magnitude smaller than the corpus);
    * each round is one join + one min-aggregate over a persisted label
    * table, with the superseded round's cache explicitly released (at
    * most two label copies live at any moment). Near-dup clusters are
    * small and shallow, so the label diameter — and the round count — is
    * tiny; raise `maxIter` for pathological chain-shaped corpora. The
    * fixpoint is unique, hence deterministic under any execution order.
    * Returns (node, cluster), persisted and materialized — callers may
    * `.unpersist()` it when done. */
  def clusterPairs(pairs: DataFrame, idCol1: String = "id1",
      idCol2: String = "id2", maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col(idCol1).as("a"), col(idCol2).as("b"))
      .union(pairs.select(col(idCol2).as("a"), col(idCol1).as("b")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("cluster", col("node"))
      .persist(MEMORY_AND_DISK)
    labels.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // each node offers its label to every neighbor; keep the min of
      // (own label, offered labels)
      val next = edges
        .join(labels.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node"), col("cluster"))
        .union(labels)
        .groupBy("node").agg(min("cluster").as("cluster"))
        .persist(MEMORY_AND_DISK)
      // FULLY materialize next's cache BEFORE dropping the parent's: a
      // short-circuiting probe (limit+count) would cache only some
      // partitions, and completing them later would recompute through
      // the by-then-unpersisted previous rounds — a cascade that deepens
      // every iteration
      next.count()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.cluster") =!= col("o.cluster"))
        .limit(1).count()
      labels.unpersist(false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    require(converged, s"clusterPairs did not converge in $maxIter rounds")
    edges.unpersist(false)
    labels
  }

  /** Keep one representative per near-dup cluster: computes the
    * transitive clusters of `pairs` ([[clusterPairs]]) and anti-joins the
    * non-representative ids out of `df`. Rows in no pair survive
    * untouched — the end-to-end "pairs in, deduplicated corpus out"
    * composition every curation pipeline runs. */
  def keepOnePerCluster(df: DataFrame, idCol: String, pairs: DataFrame,
      idCol1: String = "id1", idCol2: String = "id2",
      maxIter: Int = 25): DataFrame = {
    val drops = clusterPairs(pairs, idCol1, idCol2, maxIter)
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-dup pairs above `threshold`, restricted to a
    * candidate set (e.g. LSH buckets from Similarity.lshBuckets) so the
    * pairwise work stays bounded.
    *
    * The cosine is rounded to `roundDp` decimals BEFORE the threshold
    * test: the dot product is a sequential fold of doubles, and a
    * last-ulp wobble at the threshold boundary must not flip membership
    * (the same rule every cross-engine-checked similarity query uses). */
  def cosineNearDups(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      bucketCol: Column, roundDp: Int = 6): DataFrame = {
    import graft.functions.MathFunctions.cosineSim
    val e = emb.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"), bucketCol.as("__bk"))
    val l = e.as("l"); val r = e.as("r")
    l.join(r, col("l.__bk") === col("r.__bk") && col("l.__id") < col("r.__id"))
      .withColumn("cos", round(cosineSim(col("l.__v"), col("r.__v")), roundDp))
      .filter(col("cos") >= threshold)
      .select(col("l.__id").as("id1"), col("r.__id").as("id2"), col("cos"))
  }

  /** Document frequency of each value in an exploded key column — the
    * hot-key guard for shingle-bucketed joins: drop shingles whose df
    * exceeds `maxDf` BEFORE any self-join (a stop-phrase shingle shared
    * by 1% of a 100 TB corpus otherwise produces a quadratic pair
    * blow-up in one bucket). The MinHash-LSH path (minhashCandidates)
    * is the blessed scale path and does not need this; raw shingle
    * joins (q35-style) do. */
  def capHotKeys(exploded: DataFrame, keyCol: String, maxDf: Long): DataFrame = {
    val dfreq = exploded.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col(keyCol))
    exploded.join(dfreq, Seq(keyCol), "left_semi")
  }
}
