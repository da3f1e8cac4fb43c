package graft.examples

import graft.ops.{Bpe, CharLm, Chunking, Dedup, Dsir, Frequent, Multimodal, Quality, Redact, Sampling, Similarity, TokenLm, Urls}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable tour of the training-data-pipeline surface (the north-star
  * operators beyond the reference's GLM scope): corpus curation —
  * heuristic quality gate → CC-Net LM perplexity tiers (drop the tail)
  * → exact dedup → MinHash-LSH near-dup removal → SimHash fingerprints
  * → n-gram + embedding-cosine decontamination → boilerplate span
  * stripping → SemDeDup semantic dedup → source mixing with per-source
  * budgets in REAL trained-BPE tokens → sequence packing — then
  * embedding similarity (brute force vs multi-table LSH vs IVF with
  * persisted centroids) and multimodal decode.
  *
  * Run: sbt "runMain graft.examples.CurationPipeline [sfDir]"
  */
object CurationPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-curation-pipeline")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // 1. hygiene + quality gate: strip control bytes / fold whitespace,
    // then min length + type-token ratio
    val cleaned = docs.withColumn("text", Redact.cleanText(col("text")))
    val toks = split(col("text"), " +")
    val kept0 = cleaned.filter(size(toks) >= 5 &&
      size(array_distinct(toks)).cast("double") / size(toks) >= 0.3)
    println(s"[curate] hygiene + quality gate: ${docs.count()} -> ${kept0.count()} docs")

    // 1a'. the named rule batteries as a data-card report: Gopher
    // document gates (per-rule flags) and C4 line cleaning — thresholds
    // tuned to the fixture's ~50-token single-line docs
    val gq = Quality.gopherQuality(kept0, minWords = 30,
      stopWords = Quality.GopherStopWords :+ "a")
    val c4 = Quality.c4Clean(kept0.withColumn("text",
      regexp_replace(col("text"), "((?:\\S+ ){4}\\S+) ", "$1.\n")))
    println(s"[curate] gopher gates pass ${gq.filter(col("gopher_keep")).count()} " +
      s"of ${kept0.count()}; c4 line-clean keeps ${c4.count()} pages")

    // 1b. CC-Net LM pass: perplexity-score every doc under a trigram LM
    // fit on the trusted (labeled-en) slice, split head/middle/tail by
    // the bounded-histogram tiers, and drop the tail tier
    val lm = CharLm.fit(CharLm.trainCounts(
      kept0.filter(col("lang") === "en"), maxVocab = 512))
    val tiered = CharLm.perplexityBuckets(CharLm.score(kept0, lm))
    val kept = tiered.filter(col("ppl_bucket") <= 2)
      .drop("n_tri", "nll_nano", "avg_nll", "ppl_bucket")
    println(s"[curate] LM perplexity tiers: kept head+middle = " +
      s"${kept.count()} of ${kept0.count()} docs")

    // 1c. crawl hygiene on the (stand-in) source URLs: canonicalize,
    // drop blocklisted domains, cap any one domain's share — the
    // C4/RefinedWeb anti-domination cut. URLs are synthesized from the
    // source column (the fixture has no crawl metadata), exactly like
    // the media stand-ins in step 6.
    val withUrl = kept.withColumn("url", Urls.normalizeUrl(
      concat(lit("HTTP://"), upper(col("source")), lit(".COM:80/d/"),
        col("doc_id").cast("string"), lit("?utm_source=crawl"))))
    val domKept = Urls.perDomainCap(
        Urls.dropBlockedDomains(withUrl, col("url"), Seq("src9.com")),
        col("url"), k = 40, keyCol = col("doc_id"))
      .drop("url")
    println(s"[curate] domain blocklist + 40/domain cap: " +
      s"${kept.count()} -> ${domKept.count()} docs")

    // 1d. DSIR domain selection (target = the src3 slice): hashed-n-gram
    // target-vs-raw models, keep the most target-like half — the
    // "make the mix look like the trusted domain" cut
    val dsirModel = Dsir.fit(
      Dsir.featureCounts(domKept.filter(col("source") === "src3")),
      Dsir.featureCounts(domKept))
    val dsirPicked = Dsir.selectTopK(
        Dsir.score(domKept, dsirModel),
        k = (domKept.count() / 2).toInt.max(1))
      .drop("n_feats", "lr_nano")
    println(s"[curate] DSIR top-half selection: -> ${dsirPicked.count()} docs")

    // 2. exact dedup (min-doc_id keeper per identical text). Persist the
    // survivor set: three downstream consumers (candidate generation,
    // verification, anti-join) would otherwise each recompute the
    // gate+dedup lineage from the scan.
    val exact = Dedup.exact(dsirPicked, "doc_id", Seq("text")).drop("n_copies")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[curate] exact dedup: -> ${exact.count()} docs")

    // 3. MinHash-LSH near-dup candidates + exact Jaccard verification,
    // then TRANSITIVE clusters (clusterPairs) so each near-dup group
    // keeps exactly one representative — dropping one side of each pair
    // over-keeps when docs connect only through an intermediate (q87
    // checks the closure cross-engine). Persist the curated survivors:
    // the banded self-join + verification is the costliest stage, and
    // three downstream actions (simhash, ANN prep, media) consume
    // `curated`.
    val cands = Dedup.minhashCandidates(exact, "doc_id", "text")
    // persist the verified pairs: cluster formation reads them per
    // propagation round and the count below reads them again — without
    // this the banded self-join + verification (the costliest stage)
    // re-executes each time
    val nearDups = Dedup.jaccardVerify(exact, cands, "doc_id", "text", 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val curated = Dedup.keepOnePerCluster(exact, "doc_id", nearDups)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[curate] near-dup removal: ${nearDups.count()} pairs -> ${curated.count()} docs")

    // 4. 64-bit SimHash fingerprints + banded near-dup pairs
    val simPairs = Dedup.simhashNearDups(curated, "doc_id", "text")
    println(s"[curate] simhash(64) hamming<=3 pairs: ${simPairs.count()}")

    // 4b. benchmark decontamination: drop curated docs sharing any token
    // 3-gram with the held-out "benchmark" slice (first 20 doc_ids stand
    // in for an eval set), then PII-redact the survivors
    val bench = docs.filter(col("doc_id") < 20)
    val leaked = Dedup.ngramContaminated(
      curated.filter(col("doc_id") >= 20), bench, "doc_id", "text")
    val clean0 = curated.filter(col("doc_id") >= 20)
      .join(leaked, Seq("doc_id"), "left_anti")
      .withColumn("text", Redact.redactPii(col("text")))
    // strip cross-document boilerplate passages (repeated 3-gram spans
    // shared by >= 3 docs) from the survivors' token streams
    val spans = graft.ops.Boilerplate.repeatedSpans(
      clean0, "doc_id", "text", n = 3, minDf = 3)
    val clean = graft.ops.Boilerplate.stripRepeatedSpans(
      clean0, spans, "doc_id", "text")
    println(s"[curate] decontaminate: ${leaked.count()} leaked -> " +
      s"${clean.count()} clean redacted docs (${spans.count()} boilerplate " +
      "spans stripped)")

    // 4b'. SEMANTIC passes over the embedding space: SemDeDup-style
    // dedup (k-means cells bound the pairwise stage, one representative
    // per cosine-component) and embedding decontamination (cosine
    // against the eval slice catches PARAPHRASED leaks no 3-gram sees)
    val cents = Similarity.trainIvfCentroids(emb, "embedding", kCells = 4, iters = 3)
    val semKept = Dedup.semDedup(emb, "vec_id", "embedding", cents, threshold = 0.3)
    val semLeaked = Dedup.cosineContaminated(
      emb.filter(col("vec_id") >= 20), emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", threshold = 0.3,
      bucketCol = Similarity.lshBucket(col("embedding"), dim = 64, nBits = 2))
    println(s"[curate] semantic: semdedup ${emb.count()} -> ${semKept.count()} " +
      s"embeddings, cosine-decontaminate flags ${semLeaked.count()}")

    // 4c. corpus assembly: reweight sources (keep all of src0, half of
    // src1, 30% of the rest) AND cap every source at a token budget —
    // docs taken in keyed-hash order until the budget is spent; then lay
    // the mix out as 4 packed token streams — every selection keyed on
    // doc_id so a rerun ships byte-identical shards
    val mixed0 = Sampling.stratifiedHashSample(clean, col("source"),
      col("doc_id"), rates = Map("src0" -> 1.0, "src1" -> 0.5),
      defaultRate = 0.3, seed = 7L)
    // budgets count REAL BPE tokens (the trained tokenizer from the
    // clean corpus), not whitespace tokens — what a training run pays
    val bpe = Bpe.trainMerges(Bpe.wordCounts(clean), numMerges = 200)
    val mixed = Sampling.tokenBudgetCap(
      Bpe.encode(mixed0, bpe).drop("bpe_tokens"),
      col("source"), col("doc_id"), col("n_bpe"),
      budgets = Map.empty, defaultBudget = 120L, seed = 7L, binBits = 4)
      .drop("n_bpe")
    println(s"[assemble] BPE-token budget (120/source): ${mixed0.count()} -> ${mixed.count()} docs")
    val packed = Sampling.packSequences(
      mixed.withColumn("n_tok", size(split(col("text"), " +"))),
      "doc_id", col("n_tok"), ctxLen = 512, shards = 4, seed = 7L)
    val packStats = packed.agg(
      count(lit(1)).as("docs"), sum(col("n_tok")).as("tokens"),
      (max(col("last_pack")) + 1).as("max_packs_per_shard")).head()
    println(s"[assemble] mix -> ${packStats.getLong(0)} docs, " +
      s"${packStats.getLong(1)} tokens into 4 shards " +
      s"(<=${packStats.getLong(2)} ctx-512 packs/shard)")

    // 4c'. corpus stats + training order: exact heavy hitters over token
    // bigrams at sketch cost (the boilerplate/fad report a data card
    // wants), then the deterministic epoch-0 shuffle — shard + in-shard
    // rank as a pure function of (seed, doc_id), so a rerun ships the
    // identical training order
    val hot = Frequent.frequentItems(
      mixed.select(explode(TokenLm.tokenNgrams(col("text"), 2)).as("bg")),
      col("bg"), num = 1, den = 100)
    val shuffled = Sampling.deterministicShuffle(mixed, col("doc_id"),
      numShards = 4, seed = 11L)
    println(s"[assemble] ${hot.count()} bigrams above 1% support; " +
      s"epoch-0 shuffle -> ${shuffled.select("shard").distinct().count()} shards")

    // 4d. retrieval prep: overlapping token chunks (one embedding per
    // CHUNK downstream, not per doc)
    val chunks = Chunking.chunkTokens(mixed, "doc_id", "text",
      chunkSize = 32, overlap = 8)
    println(s"[assemble] chunking: ${chunks.count()} ctx-32 chunks " +
      s"from ${packStats.getLong(0)} docs")

    // 5. similarity: exact baseline vs multi-table LSH vs IVF (persisted)
    val queries = emb.filter(col("vec_id") < 5)
    val corpus = emb.filter(col("vec_id") >= 5)
    val exactNN = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 3)
    val lshNN = Similarity.lshTopKMultiTable(corpus, queries, "vec_id", "embedding",
      dim = 64, k = 3, nBits = 2, nTables = 4, seed = Some(42L))
    val centDir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    Similarity.saveCentroids(spark,
      Similarity.trainIvfCentroids(corpus, "embedding", kCells = 4, iters = 3), centDir)
    // index maintenance: one distributed Lloyd step refreshes the saved
    // centroids against the (drifted) corpus without retraining
    val refreshed = Similarity.refineCentroids(corpus, "embedding",
      Similarity.loadCentroids(spark, centDir))
    val ivfNN = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      refreshed, k = 3, nprobe = 2)
    println(s"[ann] exact=${exactNN.count()} lsh=${lshNN.count()} ivf=${ivfNN.count()} rows")

    // 6. multimodal: payload plumbing + real image/audio decode attempts
    val media = Multimodal.mediaFromDocuments(curated.limit(20))
      .withColumn("img", Multimodal.imageMeta(col("payload")))
      .withColumn("audio", Multimodal.audioMeta(col("payload")))
    val decoded = media.select(
      count(lit(1)).as("n"),
      count(col("img")).as("n_images"),
      count(col("audio")).as("n_audio")).head()
    println(s"[media] payloads=${decoded.getLong(0)} decoded images=${decoded.getLong(1)} audio=${decoded.getLong(2)} (text stand-ins: 0/0 expected)")

    spark.stop()
  }
}
