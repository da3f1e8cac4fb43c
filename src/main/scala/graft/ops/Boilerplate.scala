package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide repeated-passage (boilerplate) detection: find token
  * n-grams shared by many documents and score each document by how much
  * of it is made of those shared passages — the passage-level complement
  * of whole-document dedup ([[Dedup]]), used to drop navigation chrome,
  * license headers, and templated spam that near-dup methods miss
  * because the SURROUNDING text differs per page.
  *
  * 100 TB shape: one codegen'd projection fans each doc out to its
  * n-gram md5 keys (32-byte keys, never gram text), then a linear
  * three-shuffle pipeline — (doc, gram) occurrence counts, a per-gram
  * document-frequency WINDOW over those, and the per-doc rollup. The
  * occurrence stream feeds exactly one consumer, so each doc is
  * tokenized and hashed ONCE with no persist (an earlier shape cached
  * the occurrence frame to feed a df-agg + join-back pair, which leaked
  * the cache into the caller's session); the df window is a plain
  * unbounded count — no per-gram set materialization, so a viral gram
  * spills instead of OOMing. At corpus scale you would still write the
  * (doc, gram) table next to the corpus and reuse it across pipeline
  * runs, exactly like the MinHash signature table.
  */
object Boilerplate {

  /** Positional n-gram md5 keys of a whitespace-tokenized text column.
    * Docs shorter than `n` tokens yield an empty array (they contain no
    * n-gram, so they can neither contribute to nor carry boilerplate). */
  def ngramKeys(textCol: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = split(textCol, " +")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => md5(array_join(slice(toks, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document repeated-n-gram stats: `n_grams` (total positional
    * n-grams in the doc) and `n_common` (how many of those occurrences
    * are grams appearing in >= `minDf` DISTINCT documents). A doc whose
    * `n_common / n_grams` is high is boilerplate-dominated.
    *
    * Document frequency counts distinct docs (not occurrences), so a
    * single doc repeating its own phrase cannot promote that phrase to
    * "common" — the signal is cross-document repetition only. */
  def repeatedNgramStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // explode_outer keeps too-short docs as one null-key row so they
    // surface with (n_grams, n_common) = (0, 0) instead of vanishing
    val occ = docs.select(col(idCol).as("doc_id"),
      explode_outer(ngramKeys(col(textCol), n)).as("__gk"))
    // (doc, gram) occurrence counts: after this, one row per distinct
    // (doc, gram), so a per-gram COUNT window IS the distinct-doc
    // frequency — a doc repeating its own phrase still counts once
    val perDocGram = occ.groupBy(col("doc_id"), col("__gk"))
      .agg(count(col("__gk")).as("__cnt")) // 0 for the null too-short row
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy(col("__gk"))
    perDocGram
      .withColumn("__df", count(col("__gk")).over(byGram))
      .groupBy(col("doc_id"))
      .agg(sum(col("__cnt")).cast("int").as("n_grams"),
        sum(when(col("__gk").isNotNull && col("__df") >= minDf, col("__cnt"))
          .otherwise(lit(0))).cast("int").as("n_common"))
  }
}
