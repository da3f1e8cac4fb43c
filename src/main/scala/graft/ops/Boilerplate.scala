package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Corpus-wide repeated-passage (boilerplate) detection: find token
  * n-grams shared by many documents and score each document by how much
  * of it is made of those shared passages — the passage-level complement
  * of whole-document dedup ([[Dedup]]), used to drop navigation chrome,
  * license headers, and templated spam that near-dup methods miss
  * because the SURROUNDING text differs per page.
  *
  * 100 TB shape: one codegen'd projection fans each doc out to its
  * n-gram md5 keys (32-byte keys, never gram text), then two key-grouped
  * shuffles — a distinct-doc-count per gram and a key join back to the
  * occurrence stream. The occurrence frame is persisted because it feeds
  * both (each doc is tokenized and hashed ONCE); at corpus scale you
  * would write it as a gram table next to the corpus and reuse it across
  * pipeline runs, exactly like the MinHash signature table.
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
      .persist(MEMORY_AND_DISK)
    val common = occ.filter(col("__gk").isNotNull)
      .groupBy(col("__gk"))
      .agg(countDistinct(col("doc_id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__gk"), lit(1).as("__is_common"))
    occ.join(common, Seq("__gk"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("__gk")).cast("int").as("n_grams"),
        sum(coalesce(col("__is_common"), lit(0))).cast("int").as("n_common"))
  }
}
