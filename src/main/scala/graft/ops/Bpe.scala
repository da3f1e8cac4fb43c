package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeFunctions, BpeModel}

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
  * 2016, arXiv:1508.07909) — REAL subword token accounting for the
  * budget/packing operators (`Sampling.tokenBudgetCap`,
  * `packSequences`), which otherwise count whitespace or regex tokens
  * (q30/q68). dask-glm has no text surface; north-star pipeline scope.
  *
  * The 100 TB shape is the one production trainers use: BPE never
  * iterates over the corpus — it iterates over the WORD FREQUENCY
  * table, which is vocabulary-bounded, not corpus-bounded.
  *
  *  1. [[wordCounts]] — the only distributed stage: one scan, word
  *     count aggregation (map-side partial combine), deterministic
  *     distributed top-K cap (count DESC, word ASC).
  *  2. [[trainMerges]] — driver-side merge loop over the collected
  *     (word, count) table: repeatedly merge the most frequent adjacent
  *     symbol pair (ties broken by pair lexicographically — every step
  *     is a total order, so training is deterministic). O(maxWords ·
  *     numMerges) driver work, no cluster involvement.
  *  3. [[encode]] — stateless broadcast projection: the merge ranks
  *     ride one broadcast and each document is tokenized by the fused
  *     [[graft.functions.BpeEncode]] kernel (greedy lowest-rank-first
  *     merge application, the standard BPE encode), no shuffle.
  *
  * Word symbols are Unicode codepoints with a trailing `</w>`
  * end-of-word marker (the original formulation — merges crossing the
  * marker encode word-final units distinctly).
  *
  * The merge loop is inherently sequential, so unlike the LM scorers
  * there is no whole-query DuckDB oracle: correctness is pinned by a
  * driver-side reference implementation (BpeSpec property suite:
  * train+encode parity on random corpora) and the registry entry takes
  * the rows-only check the driver records for non-SQL-expressible ops.
  */
object Bpe {

  /** Default word-vocabulary cap for training: the merge loop's input
    * is at most this many (word, count) rows on the driver. */
  val DefaultMaxWords: Int = 65536

  /** Distributed word frequencies of the training slice, capped to the
    * `maxWords` most frequent (ties by word ASC — deterministic cut). */
  def wordCounts(
      train: DataFrame, textCol: String = "text",
      maxWords: Int = DefaultMaxWords): DataFrame = {
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    train
      .select(explode(split(col(textCol), " +")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word").asc)
      .limit(maxWords)
  }

  /** Driver-side merge training over a (word, c) counts table (from
    * [[wordCounts]] or its persisted parquet). Returns the learned
    * model: merges in rank order. Stops early if no pair occurs twice. */
  def trainMerges(counts: DataFrame, numMerges: Int): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val rows = counts.select(col("word").cast("string"), col("c").cast("long"))
      .collect()
    require(rows.nonEmpty, "Bpe.trainMerges: empty word-counts table")
    rows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && r.getLong(1) >= 1,
        "Bpe.trainMerges: NULL word/count or count < 1 in the counts table")
    }
    trainLocal(rows.map(r => (r.getString(0), r.getLong(1))).toSeq, numMerges)
  }

  /** Code-point-order string comparison for the trainer tie-break.
    * Java's natural String order compares UTF-16 code UNITS, which
    * diverges from Unicode code-point order exactly where supplementary-
    * plane symbols (surrogate pairs, sorted low by their 0xD800-range
    * lead unit) meet chars in U+E000–U+FFFF. Spark's UTF8String binary
    * order and DuckDB's default collation are both UTF-8 byte order ==
    * code-point order, so the q145 trainer-prefix oracle (ORDER BY a, b)
    * only agrees with the engine on tied pair counts if the trainer
    * breaks ties the same way (ADVICE r12). BpeSpec pins the divergent
    * case. */
  private[graft] def cpCompare(x: String, y: String): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(i)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
    }
    Integer.compare(x.length, y.length)
  }
  private val cpOrd: Ordering[String] = (x, y) => cpCompare(x, y)
  private val tieOrd: Ordering[(Long, String, String)] =
    Ordering.Tuple3(Ordering.Long, cpOrd, cpOrd)

  /** The reference merge loop (public within the package for the spec's
    * brute-force parity check). */
  private[graft] def trainLocal(
      wordFreq: Seq[(String, Long)], numMerges: Int): BpeModel = {
    // words as mutable symbol sequences; frequency never changes
    val words = wordFreq.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer.from(BpeModel.baseSymbols(w)), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      // pair frequencies across the word table (per OCCURRENCE, weighted
      // by word count — the Sennrich formulation)
      val pc = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pc.update(p, pc.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      // a merge that occurs once compresses nothing — standard stop
      val best = pc.filter(_._2 >= 2)
      if (best.isEmpty) done = true
      else {
        // total order: max count, then pair lexicographic ascending in
        // CODE-POINT order (== Spark/DuckDB binary order, see cpCompare)
        val (pair, _) =
          best.minBy { case ((a, b), c) => (-c, a, b) }(tieOrd)
        merges += pair
        val joined = pair._1 + pair._2
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == pair._1 && syms(i + 1) == pair._2) {
              syms.update(i, joined)
              syms.remove(i + 1)
              // a new merge may butt against the previous symbol; the
              // standard left-to-right pass does NOT back up (matches
              // the greedy re-scan semantics of the reference trainer)
            } else i += 1
          }
        }
        step += 1
      }
    }
    new BpeModel(merges.toArray)
  }

  /** Persist a trained merge table — the tokenizer IS a build-once
    * artifact in production (retraining renumbers every token, the same
    * way retraining PQ codebooks corrupts a codes table): (rank, left,
    * right) rows, reloadable by [[loadMerges]]. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession, model: BpeModel,
      path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }.toSeq
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveMerges]] table. Whole-table validation: ranks must be
    * exactly 0..n−1 with no NULL symbols — a truncated or concatenated
    * merge table would otherwise silently re-rank merges and tokenize
    * every document differently. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): BpeModel = {
    val rows = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("left").cast("string"),
        col("right").cast("string"))
      .collect()
    rows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
        s"Bpe.loadMerges: NULL rank/symbol in $path")
    }
    val sorted = rows.sortBy(_.getInt(0))
    sorted.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i,
        s"Bpe.loadMerges: ranks are not exactly 0..${rows.length - 1} in " +
          s"$path (found ${r.getInt(0)} at position $i) — truncated or " +
          "concatenated merge table")
    }
    new BpeModel(sorted.map(r => (r.getString(1), r.getString(2))))
  }

  /** Tokenize every document under a trained model: adds `bpe_tokens`
    * (`array<string>`) and `n_bpe` (token count). Stateless broadcast
    * projection, no shuffle. */
  def encode(
      docs: DataFrame, model: BpeModel, textCol: String = "text"): DataFrame =
    encode(docs, bcOf(model), textCol)

  /** [[encode]] against an already-broadcast model. */
  def encode(
      docs: DataFrame, bc: Broadcast[BpeModel], textCol: String): DataFrame = {
    val clash = docs.columns.filter(Set("bpe_tokens", "n_bpe"))
    require(clash.isEmpty,
      s"Bpe.encode: input already has column(s) ${clash.mkString(", ")} — " +
        "these are the encode output columns; rename them first")
    docs
      .withColumn("bpe_tokens", BpeFunctions.bpeEncode(col(textCol), bc))
      .withColumn("n_bpe", size(col("bpe_tokens")))
  }

  private def bcOf[T](v: T)(implicit ct: scala.reflect.ClassTag[T])
      : Broadcast[T] =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(v)
}
