package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality gates (Rae et al. 2021,
  * arXiv:2112.11446 Appendix A1.1) — the heuristic rule battery run
  * BEFORE any model-based filter: word-count bounds, mean word length,
  * symbol density, bullet/ellipsis line structure, alphabetic-word
  * fraction, and the stop-word evidence check. Emits one boolean per
  * rule plus the conjunction, so a pipeline can report WHY documents
  * were dropped (the data-card view), not just how many.
  *
  * Every rule is INTEGER arithmetic over token/line counts — divisions
  * are cleared by cross-multiplication (`3·n ≤ totLen` instead of
  * `totLen/n ≥ 3`), so the flags are hash-exact across engines (q132's
  * DuckDB oracle replays them bit-for-bit). One projection, no shuffle,
  * no UDF; every counter comes from ONE fused scan of the string
  * ([[graft.functions.GopherStats]] — the former split + four
  * interpreted-HOF passes were the q129 no-CSE trap, ~5× slower).
  */
object Quality {

  /** Gopher's stop-word evidence set (A1.1: "contains at least two of"). */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Append the Gopher rule flags and the conjunction `gopher_keep` to
    * `df`. Thresholds follow the paper; `minWords`/`maxWords` are the
    * only knobs a corpus realistically re-tunes. Rules:
    *
    *  - `wc_ok`       — word count in [minWords, maxWords]
    *  - `mwl_ok`      — mean word length in [3, 10] chars
    *  - `symbol_ok`   — `#` density ≤ 0.1 per word AND ellipsis
    *                    (`...` or `…`) density ≤ 0.1 per word — the
    *                    paper gates EACH symbol separately, not their sum
    *  - `bullet_ok`   — ≤ 10% of lines start with a bullet AND ≤ 30%
    *                    end with an ellipsis
    *  - `alpha_ok`    — ≥ 80% of words contain an alphabetic character
    *  - `stopword_ok` — ≥ 2 distinct [[GopherStopWords]] present
    *
    * Words are tokenized on ANY whitespace run (`\s+`) — Gopher's rules
    * are defined over whitespace-tokenized words, and a space-only split
    * would merge tokens across line boundaries in multi-line documents
    * (undercounting words and inflating word lengths). Line rules keep
    * the `\n` split.
    */
  def gopherQuality(df: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      stopWords: Seq[String] = GopherStopWords): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got $minWords..$maxWords")
    require(stopWords.size >= 2 && stopWords.size <= 64,
      "stopWords must hold 2..64 entries (the >= 2 evidence rule needs " +
        s"at least two candidates; a large list belongs in a join), got " +
        stopWords.size)
    val reserved = Seq("__gs", "wc_ok", "mwl_ok", "symbol_ok",
      "bullet_ok", "alpha_ok", "stopword_ok", "gopher_keep")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"gopherQuality: input already has column(s) ${clash.mkString(", ")}")
    // ALL counters come from one fused scan of the string
    // ([[graft.functions.GopherStats]] — the token_ngrams treatment for
    // the interpreted-HOF composition this used to be; the kernel's
    // scaladoc states the bit-compat contract, QualityKernelSpec pins
    // it); the gates below are plain codegen'd integer arithmetic
    val n = col("__gs.n")
    val nLines = col("__gs.n_lines")
    val totLen = col("__gs.tot_len")
    val hashCnt = col("__gs.hash_cnt")
    // ell3_cnt counts '...' occurrences (the Column form's length-diff
    // over 3); uni_ell_cnt counts the single-codepoint U+2026 form
    val ell3Cnt = col("__gs.ell3_cnt")
    val uniEllCnt = col("__gs.uni_ell_cnt")
    val bulletCnt = col("__gs.bullet_cnt")
    val ellEndCnt = col("__gs.ell_end_cnt")
    val alphaCnt = col("__gs.alpha_cnt")
    val stopCnt = col("__gs.stop_cnt")
    df.withColumn("__gs",
        graft.functions.QualityFunctions.gopherStats(col(textCol), stopWords))
      .withColumn("wc_ok", n >= minWords && n <= maxWords)
      .withColumn("mwl_ok", lit(3) * n <= totLen && totLen <= lit(10) * n)
      // per-symbol gates (A1.1 applies 0.1 to EACH symbol, not the sum)
      .withColumn("symbol_ok",
        hashCnt * lit(10) <= n &&
          (ell3Cnt + uniEllCnt) * lit(10) <= n)
      .withColumn("bullet_ok",
        bulletCnt * lit(10) <= nLines && ellEndCnt * lit(10) <= lit(3) * nLines)
      .withColumn("alpha_ok", alphaCnt * lit(10) >= lit(8) * n)
      .withColumn("stopword_ok", stopCnt >= 2)
      .withColumn("gopher_keep",
        col("wc_ok") && col("mwl_ok") && col("symbol_ok") &&
          col("bullet_ok") && col("alpha_ok") && col("stopword_ok"))
      .drop("__gs")
  }

  /** Gopher's repetition rules (A1.1 second half): per-document
    * duplicate-LINE statistics — `n_lines`, `dup_lines` (lines whose
    * text occurs more than once in the SAME document, counting every
    * occurrence), `dup_line_chars` / `line_chars` (the character-mass
    * view), and the integer-exact gate `dup_line_ok` (duplicate-line
    * fraction ≤ 30% AND duplicate-line character fraction ≤ 20% — the
    * paper's thresholds). The q85/q98 n-gram repetition ops measure
    * WITHIN-line boilerplate; this measures whole-line repetition
    * (navigation bars, headers, chat scaffolding).
    *
    * 100 TB shape: a WITHIN-document statistic needs no cross-row data,
    * so it takes ZERO shuffles — one fused pass per row
    * ([[graft.functions.DupLineStats]]; hash-map bounded by the doc's
    * own line count, never O(lines²)). The previous explode→count→
    * rollup form moved the corpus's line text through two exchanges to
    * compute something each row already contains. Parity detail: a doc
    * with NULL text emitted no exploded rows before and emits none now
    * (the isNotNull filter replicates the vanish-from-groupBy shape). */
  def duplicateLineStats(df: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.functions.QualityFunctions.dupLineStats(col(textCol)).as("__dl"))
      .select(col(idCol),
        col("__dl.n_lines").as("n_lines"),
        col("__dl.dup_lines").as("dup_lines"),
        col("__dl.dup_line_chars").as("dup_line_chars"),
        col("__dl.line_chars").as("line_chars"))
      .withColumn("dup_line_ok",
        col("dup_lines") * lit(10) <= lit(3) * col("n_lines") &&
          col("dup_line_chars") * lit(10) <= lit(2) * col("line_chars"))

  /** C4-style page cleaning (Raffel et al. 2020 §2.2) — the LINE-level
    * sibling of the Gopher document gates: keep only lines that end in
    * terminal punctuation (`.` `!` `?` `"`), carry at least
    * `minLineWords` words, and do not mention "javascript"
    * (case-insensitive); then drop whole pages containing "lorem ipsum"
    * or a curly brace (code), or retaining fewer than `minLines` lines.
    * Returns the surviving docs with `textCol` REWRITTEN to the joined
    * kept lines plus `n_kept_lines`.
    *
    * Deliberate proxy, documented: C4's "at least 3 sentences" page
    * rule is applied as ≥ `minLines` KEPT lines — every kept line ends
    * in terminal punctuation, so kept lines lower-bound sentences
    * (C4's own sentence splitter is a language-specific model; a
    * deterministic line proxy is cross-engine exact). One projection +
    * filter, no shuffle, no UDF; the line rules run in one fused pass
    * per document ([[graft.functions.C4KeptLines]]). */
  def c4Clean(df: DataFrame, textCol: String = "text",
      minLineWords: Int = 5, minLines: Int = 3): DataFrame = {
    require(minLineWords >= 1, s"minLineWords must be >= 1, got $minLineWords")
    require(minLines >= 1, s"minLines must be >= 1, got $minLines")
    val reserved = Seq("__kept", "n_kept_lines")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"c4Clean: input already has column(s) ${clash.mkString(", ")}")
    val t = col(textCol)
    // the per-line rules run in the fused [[graft.functions.C4KeptLines]]
    // kernel (one pass; the former filter lambda ran an interpreted
    // rlike + split + lower-contains per line — QualityKernelSpec pins
    // the parity); page gates + rewrite stay native Column code
    df.withColumn("__kept",
        graft.functions.QualityFunctions.c4KeptLines(t, minLineWords))
      .filter(!lower(t).contains("lorem ipsum") && !t.contains("{") &&
        size(col("__kept")) >= minLines)
      .withColumn(textCol, array_join(col("__kept"), "\n"))
      .withColumn("n_kept_lines", size(col("__kept")))
      .drop("__kept")
  }

  /** [[gopherQuality]] then keep only passing docs, flags dropped —
    * the filter form a pipeline composes. */
  def gopherFilter(df: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      stopWords: Seq[String] = GopherStopWords): DataFrame =
    gopherQuality(df, textCol, minWords, maxWords, stopWords)
      .filter(col("gopher_keep"))
      .drop("wc_ok", "mwl_ok", "symbol_ok", "bullet_ok", "alpha_ok",
        "stopword_ok", "gopher_keep")
}
