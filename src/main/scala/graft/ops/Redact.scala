package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for text curation pipelines: replace emails, US-style
  * phone numbers, and IPv4 addresses with typed placeholder tokens, and
  * count what was replaced (the audit trail a compliance pass needs).
  *
  * The patterns deliberately use only the regex subset whose match
  * semantics agree between Java's engine (Spark) and RE2 (DuckDB, Go
  * tooling): character classes, bounded/unbounded repetition, and ASCII
  * word boundaries — no backreferences or lookaround — so redacted
  * output is byte-identical cross-engine and oracle-checkable (q89).
  *
  * 100 TB shape: pure per-row projection (codegen'd `regexp_replace`),
  * no shuffle, no UDF.
  */
object Redact {

  /** local@domain.tld — local part with common specials, dotted domain,
    * alpha TLD of 2+. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NNN-NNN-NNNN / NNN.NNN.NNNN with word boundaries. */
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Dotted-quad IPv4 (syntactic — 999.0.0.1 matches; curation wants
    * recall over strict RFC validity). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redaction order matters: emails first (their local/domain parts
    * contain digit runs a later pass must not see), then phones (dashed
    * digits), then IPv4 (dotted digits — phone dots are already gone). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** C0/C1 control characters (minus \t \n \r) plus DEL — the bytes that
    * corrupt downstream tokenizers and TSV/JSONL serialization. */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Text hygiene for ingestion: strip control characters, normalize
    * \t \r \n to spaces, collapse runs, trim — the standard cleanup
    * between a raw scrape and tokenization. Same Java/RE2-agreeing
    * regex subset and per-row codegen'd shape as [[redactPii]]. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(c, ControlRe, ""),
        "[\\t\\r\\n]", " "),
      "  +", " "))

  /** Per-kind match counts over the ORIGINAL text (what redactPii will
    * replace), as integer columns for exact cross-engine comparison. */
  /** HTML → text extraction, the deterministic core of a crawl
    * text-extraction pass (the trafilatura/jusText heavy lifting —
    * boilerplate block CLASSIFICATION — is model/DOM territory; this is
    * the exact-stripping layer a pipeline still needs after it):
    * script/style blocks and comments removed WITH their content, tags
    * removed, the common HTML entities decoded, whitespace collapsed.
    * Every pattern sits in the Java∩RE2 subset — RE2 has no pattern
    * backreferences, so script and style close-tags are separate
    * literal patterns, and lazy `.*?` + inline `(?is)` flags carry the
    * block semantics. q137 hash-checks the extracted STRING against a
    * DuckDB replay.
    *
    * Contract caveats (the standard regex-extractor trade-offs, stated
    * rather than hidden): a bare `<`…`>` pair in NON-markup text ("a <
    * b and c > d") is eaten like a tag — feed this HTML, not prose; and
    * the pass is deliberately NOT idempotent: entities decode AFTER
    * tag-stripping precisely so `&lt;b&gt;` survives as the literal
    * text `<b>`, which a second pass would then strip. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (ent, rep)) =>
        regexp_replace(col0, ent, rep)
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  def piiCounts(c: Column): (Column, Column, Column) = (
    regexp_count(c, lit(EmailRe)).cast("int").as("n_emails"),
    regexp_count(regexp_replace(c, EmailRe, "<EMAIL>"), lit(PhoneRe))
      .cast("int").as("n_phones"),
    regexp_count(
      regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"),
      lit(Ipv4Re)).cast("int").as("n_ips"))
}
