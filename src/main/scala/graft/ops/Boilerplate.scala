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
    * n-gram, so they can neither contribute to nor carry boilerplate).
    * The gram windows come from the fused [[graft.ops.TokenLm
    * .tokenNgrams]] kernel as the transform's INPUT — the previous form
    * closed over `split(...)` inside the lambda, re-running the regex
    * per window (interpreted HOFs do no CSE — the jaccardVerify
    * lesson); only the md5 stays in the lambda. */
  def ngramKeys(textCol: Column, n: Int): Column = {
    require(n >= 1 && n <= 16,
      s"n must be in [1, 16] (the token_ngrams kernel bound), got $n")
    transform(TokenLm.tokenNgrams(textCol, n), g => md5(g))
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

  /** MAXIMAL repeated-passage spans per document — the span-extraction
    * step of exact-substring dedup (Lee et al. 2022, arXiv:2107.06499
    * §4.1: report the actual repeated ranges, not just a per-doc
    * score): every token range covered by n-grams that appear in >=
    * `minDf` distinct documents, with overlapping/adjacent gram windows
    * merged into one span. Returns (doc_id, span_start, span_end,
    * span_tokens) with 0-based inclusive token positions; docs with no
    * common gram emit no row.
    *
    * 100 TB shape: the common-gram set is one bounded aggregation (one
    * row per distinct gram, never per occurrence), positions reach it
    * through a semi-join on the md5 key, and span merging is a per-doc
    * ordered window over only the COMMON positions (gaps-and-islands —
    * all gram windows have length n, so position order is end order and
    * a running island counter merges `pos - prev <= n`). No
    * per-gram position lists are ever materialized. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // the positional occurrence frame feeds BOTH the common-gram
    // derivation and the span semi-join: persist it (compact scalars —
    // id, pos, 32-char key; never corpus text) so the corpus is
    // tokenized and hashed ONCE, the cached-band-frame discipline from
    // Dedup.minhashCandidates. Lifecycle: lives in the session cache
    // manager until the caller clears it (see the Dedup object doc).
    val occ = positions(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = occ.select("doc_id", "gk").distinct()
      .groupBy("gk").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select("gk")
    spansFromPositions(occ.join(grams, Seq("gk"), "left_semi"), n)
  }

  /** The distinct n-gram md5 keys appearing in >= `minDf` distinct
    * documents — the reusable reference artifact behind
    * [[repeatedSpans]]. One bounded aggregation: one row per distinct
    * gram (never per occurrence). */
  def commonGrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    docs.select(col(idCol).as("doc_id"),
        explode(ngramKeys(col(textCol), n)).as("__gk"))
      .select("doc_id", "__gk").distinct()
      .groupBy("__gk").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__gk").as("gk"))
  }

  /** Persist [[commonGrams]] as the build-once reference artifact for
    * incremental span extraction (the span-family analog of the MinHash
    * signature table): the table carries its gram width so a mismatched
    * reader fails loudly instead of silently matching nothing. */
  def writeCommonGrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Int, path: String): Unit =
    commonGrams(docs, idCol, textCol, n, minDf)
      .withColumn("n", lit(n)).withColumn("min_df", lit(minDf))
      .write.mode("overwrite").parquet(path)

  /** [[repeatedSpans]] of a NEW batch against an already-built common-
    * gram table (from [[writeCommonGrams]], or [[commonGrams]] output
    * with `n`/`min_df` columns attached) — the daily-ingest twin:
    * reference text is never re-read, the batch semi-joins the bounded
    * gram table and runs the per-doc island merge on its own positions
    * only. The gram width rides the TABLE (whole-table-validated, the
    * mixed-width lesson from the signature tables). */
  def repeatedSpansAgainstGrams(newDocs: DataFrame, grams: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val widths = grams.select(col("n").cast("int")).distinct().collect()
      .map(_.getInt(0))
    require(widths.length == 1,
      s"common-gram table must carry exactly one gram width, found " +
        s"[${widths.sorted.mkString(", ")}] — was it written by writeCommonGrams?")
    val n = widths.head
    // single consumer of the batch positions — no persist needed here
    spansFromPositions(
      positions(newDocs, idCol, textCol, n)
        .join(grams.select("gk"), Seq("gk"), "left_semi"), n)
  }

  /** LINE-level cross-document boilerplate: the md5 keys of lines
    * occurring in >= `minDf` DISTINCT documents — the RefinedWeb /
    * CCNet line-dedup artifact (navigation items, cookie banners, and
    * footer lines repeat VERBATIM as whole lines across pages, which
    * the n-gram span machinery only catches when they are long enough
    * to carry an n-gram). Distinct-doc counting, so a page repeating
    * its own line cannot promote it. One bounded aggregation keyed on
    * 32-char hashes — line TEXT never shuffles. Pre-normalize the text
    * (e.g. [[Redact.cleanText]]) if near-identical line variants should
    * collapse; the key here is exact. */
  def commonLines(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(col("doc_id"), md5(col("__line")).as("lk"))
      .distinct()
      .groupBy("lk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
  }

  /** Persist [[commonLines]] as the build-once line-dedup artifact
    * (the [[writeCommonGrams]] pattern): the table carries its `min_df`
    * so a reader can FAIL FAST on a threshold mismatch instead of
    * silently stripping against the wrong boilerplate set. Rebuilding
    * the table per batch would re-scan the reference corpus; a daily
    * ingest loads this and [[stripCommonLines]] the new batch only. */
  def writeCommonLines(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int, path: String): Unit =
    commonLines(docs, idCol, textCol, minDf)
      .withColumn("min_df", lit(minDf))
      .write.mode("overwrite").parquet(path)

  /** Load a [[writeCommonLines]] table, whole-table-validating that it
    * carries exactly one `min_df` (a concatenation of two builds at
    * different thresholds is the corruption this catches). */
  def loadCommonLines(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val t = spark.read.parquet(path)
    val dfs = t.select(col("min_df").cast("int")).distinct().collect()
      .map(_.getInt(0))
    require(dfs.length == 1,
      s"common-lines table must carry exactly one min_df, found " +
        s"[${dfs.sorted.mkString(", ")}] — was it written by writeCommonLines?")
    t.select("lk", "df")
  }

  /** Remove every [[commonLines]] line from each document, preserving
    * the order of the surviving lines, and report `n_dropped_lines`.
    * Every input doc survives (a fully-boilerplate page comes back as
    * the empty string with the count telling why).
    *
    * 100 TB shape (the [[stripRepeatedSpans]] pattern): explode to
    * (doc, line-key), semi-join the bounded common set, collect each
    * doc's (usually tiny) dropped key set, then one per-row projection
    * filters the materialized line array against it. Every LINE-level
    * exchange carries only (id, 32-char key) — line text never
    * shuffles, and the rewrite is order-exact because lines never
    * leave their row (PlanSpec gates this). The final join-back
    * broadcasts while the dropped-doc set fits (only docs that drop
    * something appear in it); past that it degrades to ONE id-keyed
    * corpus join — the same cost class as writing the rewritten corpus
    * out. Build the `common` table once with a persisted write (the
    * [[writeCommonGrams]] pattern) so repeat runs skip its scan.
    *
    * Accepted risk — hash-keyed equality: lines match by md5 of the
    * exact line bytes (the same contract as [[graft.ops.Dedup.exact]]'s
    * digest keys). An md5 collision between a document line and a
    * common-line key would silently delete a non-boilerplate line; at
    * 2^64 lines the birthday bound on a 128-bit digest keeps that
    * probability below ~1e-20, which this pipeline (like every
    * hash-keyed dedup in the literature) accepts by design. Note also
    * that PlanSpec's no-text-in-shuffle gate covers the (id, key)
    * exchanges; the final join-back of dropped-key sets broadcasts
    * while small and degrades to one id-keyed shuffle past the
    * broadcast threshold, at which point doc TEXT does shuffle once —
    * unavoidable for any rewrite that must emit the text. */
  def stripCommonLines(docs: DataFrame, common: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val reserved = Seq("__drop", "__stripped", "n_dropped_lines")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"stripCommonLines: input already has column(s) ${clash.mkString(", ")}")
    val dropped = docs.select(col(idCol),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(col(idCol), md5(col("__line")).as("__lk"))
      .join(common.select(col("lk").as("__lk")), Seq("__lk"), "left_semi")
      .groupBy(idCol).agg(collect_set(col("__lk")).as("__drop"))
    // the rewrite + count run in the fused StripLinesByKey kernel —
    // one pass, one md5 per line (the composed form re-hashed every
    // line in TWO interpreted filter HOFs)
    docs.join(dropped, Seq(idCol), "left")
      .withColumn("__stripped",
        graft.functions.QualityFunctions.stripLinesByKey(col(textCol),
          coalesce(col("__drop"), array().cast("array<string>"))))
      .withColumn(textCol, col("__stripped.text"))
      .withColumn("n_dropped_lines", col("__stripped.n_dropped"))
      .drop("__drop", "__stripped")
  }

  /** Positional n-gram occurrence frame: (doc_id, pos, gk). */
  private def positions(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(ngramKeys(col(textCol), n)))
      .toDF("doc_id", "pos", "gk")

  /** Shared core: common positions merged into maximal spans
    * (gaps-and-islands per doc). */
  private def spansFromPositions(commonPos: DataFrame, n: Int): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    commonPos
      // a window starting within n tokens of the previous one overlaps
      // or touches it; the first position of a doc starts island 0
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > n, 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(byDoc))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("pos")).cast("int").as("span_start"),
        (max(col("pos")) + n - 1).cast("int").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Remove every [[repeatedSpans]] range from each document's token
    * stream and re-join the survivors with single spaces (whitespace is
    * normalized — the span positions index the `split(" +")` token
    * stream, so only that stream can be faithfully reassembled). Docs
    * fully covered by boilerplate come back as the empty string; docs
    * with no common span keep all their tokens. One broadcast-free
    * join of the span table grouped per doc, then a per-row HOF filter
    * over the (pre-materialized) token array — no second corpus scan
    * beyond the one `spans` already took. */
  def stripRepeatedSpans(docs: DataFrame, spans: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    require(!docs.columns.contains("__spans"),
      "stripRepeatedSpans: input already has column __spans — this name " +
        "is a reserved scratch column here; rename it first")
    val spanList = spans.groupBy(col("doc_id").as(idCol))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    val toks = split(col(textCol), " +")
    docs.join(spanList, Seq(idCol), "left")
      .withColumn("__spans", coalesce(col("__spans"),
        array().cast("array<struct<s:int,e:int>>")))
      .withColumn(textCol,
        array_join(
          // zip each token with its 0-based position, keep it iff no
          // span covers that position, then drop the position again
          transform(
            filter(
              zip_with(toks, sequence(lit(0), size(toks) - 1),
                (t, i) => struct(t.as("t"), i.as("i"))),
              p => !exists(col("__spans"),
                s => p("i") >= s("s") && p("i") <= s("e"))),
            p => p("t")),
          " "))
      .drop("__spans")
  }
}
