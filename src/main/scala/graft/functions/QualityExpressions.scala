package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document counters for the Gopher quality gates
  * ([[graft.ops.Quality.gopherQuality]], Rae et al. 2021 A1.1).
  *
  * The composed Column form needs a `split("\s+")` materialization plus
  * FOUR interpreted higher-order passes over it (aggregate for lengths,
  * filter×2 for lines, filter for alpha, filter-over-stopwords) — the
  * same no-CSE interpreted-HOF trap that cost q129 8× before the fused
  * `token_ngrams` kernel. This expression computes every counter in ONE
  * scan of the string with zero array materialization; the boolean
  * gates stay plain codegen'd integer arithmetic over the returned
  * struct.
  *
  * Bit-compatible with the Column/oracle form (QualityKernelSpec pins
  * it against the raw-Column composition on adversarial inputs):
  *
  *  - tokens are `\s+` split elements with Java `split(-1)` semantics:
  *    `n` = separator-run count + 1 (a leading/trailing run contributes
  *    an empty element exactly like the SQL form);
  *  - `tot_len`/`hash_cnt`/`uni_ell_cnt` count CODEPOINTS (Spark's
  *    `length`), not UTF-16 units;
  *  - `ell3_cnt` counts non-overlapping left-to-right `...` (a run of
  *    r dots yields r/3 — the `regexp_replace` length-diff over 3);
  *  - line rules replicate `^\s*[-*•]` / `\.\.\.\s*$` with Java's `\s`
  *    class `[ \t\n\x0B\f\r]` (NOT Unicode whitespace);
  *  - `stop_cnt` counts stopword-LIST entries present among the tokens
  *    (duplicates in the list each count — `size(filter(list, ...))`
  *    semantics).
  *
  * NULL text → NULL struct (`nullIntolerant`), so every gate and the
  * conjunction come out NULL and a `gopher_keep` filter drops the doc —
  * the same disposition the composed form gave it. */
case class GopherStats(child: Expression, stopWords: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("tot_len", LongType, nullable = false),
    StructField("hash_cnt", IntegerType, nullable = false),
    StructField("ell3_cnt", IntegerType, nullable = false),
    StructField("uni_ell_cnt", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("bullet_cnt", IntegerType, nullable = false),
    StructField("ell_end_cnt", IntegerType, nullable = false),
    StructField("alpha_cnt", IntegerType, nullable = false),
    StructField("stop_cnt", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true

  // Java \s — the exact class regex split/rlike use (not Unicode spaces)
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Line-local `^\s*[-*•]` / `\.\.\.\s*$` over [from, to). */
  private def lineFlags(s: String, from: Int, to: Int): (Boolean, Boolean) = {
    var i = from
    while (i < to && isWs(s.charAt(i))) i += 1
    val bullet = i < to && {
      val c = s.charAt(i); c == '-' || c == '*' || c == '•'
    }
    var j = to
    while (j > from && isWs(s.charAt(j - 1))) j -= 1
    val ellEnd = j - from >= 3 && s.charAt(j - 1) == '.' &&
      s.charAt(j - 2) == '.' && s.charAt(j - 3) == '.'
    (bullet, ellEnd)
  }

  /** The fused kernel; public so generated code can call it. */
  def computeStats(input: UTF8String): InternalRow = {
    val s = input.toString
    val len = s.length
    var totLen = 0L
    var hashCnt = 0; var uniEll = 0; var ell3 = 0
    var nLines = 1; var bullets = 0; var ellEnds = 0
    var sepRuns = 0; var alphaCnt = 0
    var tokens: scala.collection.mutable.HashSet[String] = null
    if (stopWords.nonEmpty) tokens = new scala.collection.mutable.HashSet[String]
    var i = 0
    var lineStart = 0
    var tokStart = -1        // char index where the current token began
    var tokHasAlpha = false
    var dotRun = 0
    @inline def closeToken(end: Int): Unit = {
      if (tokStart >= 0) {
        if (tokHasAlpha) alphaCnt += 1
        if (tokens != null) tokens.add(s.substring(tokStart, end))
        tokStart = -1; tokHasAlpha = false
      }
    }
    @inline def closeDots(): Unit = { ell3 += dotRun / 3; dotRun = 0 }
    var inSep = false
    while (i < len) {
      val c = s.charAt(i)
      val cp = if (Character.isHighSurrogate(c) && i + 1 < len &&
        Character.isLowSurrogate(s.charAt(i + 1))) s.codePointAt(i) else c.toInt
      val cw = Character.charCount(cp)
      if (isWs(c)) {
        closeToken(i); closeDots()
        if (!inSep) { sepRuns += 1; inSep = true }
        if (c == '\n') {
          val (b, e) = lineFlags(s, lineStart, i)
          if (b) bullets += 1
          if (e) ellEnds += 1
          nLines += 1
          lineStart = i + 1
        }
      } else {
        inSep = false
        totLen += 1
        if (tokStart < 0) tokStart = i
        if (cp == '#') hashCnt += 1
        if (cp == '…') uniEll += 1
        if (cp == '.') dotRun += 1 else closeDots()
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z'))
          tokHasAlpha = true
      }
      i += cw
    }
    closeToken(len); closeDots()
    val (b, e) = lineFlags(s, lineStart, len)
    if (b) bullets += 1
    if (e) ellEnds += 1
    var stopCnt = 0
    if (tokens != null) {
      val it = stopWords.iterator
      while (it.hasNext) if (tokens.contains(it.next())) stopCnt += 1
    }
    new GenericInternalRow(Array[Any](
      sepRuns + 1, totLen, hashCnt, ell3, uniEll,
      nLines, bullets, ellEnds, alphaCnt, stopCnt))
  }

  override def nullSafeEval(input: Any): Any =
    computeStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherStats", this, classOf[GopherStats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (InternalRow) $ref.computeStats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
  override def prettyName: String = "gopher_stats"
}

/** Fused C4 line filter ([[graft.ops.Quality.c4Clean]], Raffel et al.
  * 2020 §2.2): the kept lines of a page in one pass — each `\n`-split
  * line survives iff it ends in terminal punctuation (`.` `!` `?` `"`
  * after trailing Java-`\s`), carries ≥ `minLineWords` `\s+`-split
  * words (Java `split(-1)` semantics), and does not mention
  * "javascript" case-insensitively. The composed form ran an
  * interpreted filter lambda with an rlike + a split + a lower-contains
  * per LINE; here the page gates and the rewrite stay native Column
  * code over the returned array.
  *
  * Case folding for the javascript rule goes through
  * `UTF8String.toLowerCase` — definitionally the SAME folding
  * `lower(col)` applies, so locale-edge codepoints (dotted capital I
  * and friends) cannot diverge from the Column form. */
case class C4KeptLines(child: Expression, minLineWords: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(minLineWords >= 1, s"minLineWords must be >= 1, got $minLineWords")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private val needle = UTF8String.fromString("javascript")

  private def keepLine(s: String, from: Int, to: Int): Boolean = {
    // terminal punctuation after trailing whitespace
    var j = to
    while (j > from && isWs(s.charAt(j - 1))) j -= 1
    if (j == from) return false
    val last = s.charAt(j - 1)
    if (last != '.' && last != '!' && last != '?' && last != '"') return false
    // word count: separator-run count + 1 (Java split(-1))
    var sepRuns = 0
    var inSep = false
    var i = from
    while (i < to) {
      if (isWs(s.charAt(i))) { if (!inSep) { sepRuns += 1; inSep = true } }
      else inSep = false
      i += 1
    }
    if (sepRuns + 1 < minLineWords) return false
    !UTF8String.fromString(s.substring(from, to)).toLowerCase.contains(needle)
  }

  /** The fused kernel; public so generated code can call it. */
  def computeKept(input: UTF8String): ArrayData = {
    val s = input.toString
    val out = scala.collection.mutable.ArrayBuffer[AnyRef]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == '\n') {
        if (keepLine(s, start, i))
          out += UTF8String.fromString(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    computeKept(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("c4KeptLines", this, classOf[C4KeptLines].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (ArrayData) $ref.computeKept($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): C4KeptLines =
    copy(child = newChild)
  override def prettyName: String = "c4_kept_lines"
}

/** Fused line-strip for cross-document line dedup
  * ([[graft.ops.Boilerplate.stripCommonLines]]): given a document and
  * its per-doc dropped-key array (lowercase md5 hex, the join-collected
  * subset of the corpus-wide common-line table), rebuild the text minus
  * the dropped lines and count them — ONE pass, one md5 per line. The
  * composed form ran TWO interpreted filter HOFs (count + rewrite),
  * each re-hashing every line. Key equality is on the exact lowercase
  * hex Spark's `md5()` emits (same MessageDigest bytes, same hex
  * alphabet — the md5Hex helper is shared with the oracle contract). */
case class StripLinesByKey(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true

  private def md5Hex(s: String): String = {
    val d = TextHashKernels.digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = Character.forDigit((bytes(i) >> 4) & 0xf, 16)
      hex(2 * i + 1) = Character.forDigit(bytes(i) & 0xf, 16)
      i += 1
    }
    new String(hex)
  }

  /** The fused kernel; public so generated code can call it. */
  def computeStripped(text: UTF8String, keys: ArrayData): InternalRow = {
    val drop = new java.util.HashSet[String]()
    var k = 0
    while (k < keys.numElements()) {
      val e = keys.getUTF8String(k)
      if (e != null) drop.add(e.toString)
      k += 1
    }
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var dropped = 0
    var kept = 0
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == '\n') {
        val line = s.substring(start, i)
        if (drop.isEmpty || !drop.contains(md5Hex(line))) {
          if (kept > 0) sb.append('\n')
          sb.append(line)
          kept += 1
        } else dropped += 1
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), dropped))
  }

  override def nullSafeEval(t: Any, ks: Any): Any =
    computeStripped(t.asInstanceOf[UTF8String], ks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stripLines", this, classOf[StripLinesByKey].getName)
    nullSafeCodeGen(ctx, ev, (t, ks) =>
      s"${ev.value} = (InternalRow) $ref.computeStripped($t, $ks);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripLinesByKey =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "strip_lines_by_key"
}

/** Fused per-document duplicate-LINE statistics
  * ([[graft.ops.Quality.duplicateLineStats]], Gopher A1.1 second
  * half): a WITHIN-document statistic needs no cross-row data, so it
  * needs no shuffle — the former explode → (doc, line) count →
  * per-doc rollup shape moved the corpus's line TEXT through two
  * exchanges to compute something each row already contains. One
  * HashMap pass per row; line lengths in CODEPOINTS (Spark `length`).
  * Counting semantics identical to the grouped form: every occurrence
  * of a line whose per-doc count exceeds one is a duplicate. */
case class DupLineStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_lines", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeStats(input: UTF8String): InternalRow = {
    val s = input.toString
    val counts = new java.util.HashMap[String, Long]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == '\n') {
        val line = s.substring(start, i)
        counts.merge(line, 1L, (a, b) => a + b)
        start = i + 1
      }
      i += 1
    }
    var nLines = 0L; var dupLines = 0L
    var dupChars = 0L; var lineChars = 0L
    counts.forEach { (line, c) =>
      val len = line.codePointCount(0, line.length).toLong
      nLines += c
      lineChars += c * len
      if (c > 1) { dupLines += c; dupChars += c * len }
    }
    new GenericInternalRow(Array[Any](nLines, dupLines, dupChars, lineChars))
  }

  override def nullSafeEval(input: Any): Any =
    computeStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dupLineStats", this, classOf[DupLineStats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (InternalRow) $ref.computeStats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DupLineStats =
    copy(child = newChild)
  override def prettyName: String = "dup_line_stats"
}

object QualityFunctions {
  /** Fused Gopher counters struct of a text column. */
  def gopherStats(text: Column, stopWords: Seq[String]): Column =
    ColumnBridge.column(GopherStats(ColumnBridge.expression(text), stopWords))

  /** Fused duplicate-line statistics struct of a text column. */
  def dupLineStats(text: Column): Column =
    ColumnBridge.column(DupLineStats(ColumnBridge.expression(text)))

  /** Fused C4 kept-lines array of a text column. */
  def c4KeptLines(text: Column, minLineWords: Int): Column =
    ColumnBridge.column(C4KeptLines(ColumnBridge.expression(text), minLineWords))

  /** Fused strip-by-md5-key struct(text, n_dropped) of a text column. */
  def stripLinesByKey(text: Column, dropKeys: Column): Column =
    ColumnBridge.column(StripLinesByKey(
      ColumnBridge.expression(text), ColumnBridge.expression(dropKeys)))

  private def intLiteral(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private def stringArrayLiteral(e: Expression, what: String): Seq[String] = {
    require(e.foldable, s"$what must be a literal array of strings")
    e.eval() match {
      case a: ArrayData =>
        (0 until a.numElements()).map { i =>
          val v = a.getUTF8String(i)
          require(v != null, s"$what must not contain NULL entries")
          v.toString
        }
      case other => throw new IllegalArgumentException(
        s"$what must be an array literal, got $other")
    }
  }

  /** `gopher_stats(text, array('the', ...))` — the stop-word evidence
    * set must be a foldable array-of-string literal. */
  private[graft] val gopherStatsBuilder: Seq[Expression] => Expression = {
    case Seq(text, stops) =>
      GopherStats(text, stringArrayLiteral(stops, "gopher_stats: stopWords"))
    case exprs => throw new IllegalArgumentException(
      s"gopher_stats(text, stopWords) takes 2 arguments, got ${exprs.length}")
  }

  /** `c4_kept_lines(text[, minLineWords])` — word floor defaults to the
    * paper's 5; must be a literal >= 1. */
  private[graft] val c4KeptLinesBuilder: Seq[Expression] => Expression = {
    case Seq(text) => C4KeptLines(text, 5)
    case Seq(text, n) =>
      C4KeptLines(text, intLiteral(n, "c4_kept_lines: minLineWords"))
    case exprs => throw new IllegalArgumentException(
      s"c4_kept_lines(text[, minLineWords]) takes 1 or 2 arguments, got ${exprs.length}")
  }

  /** `strip_lines_by_key(text, dropKeys)` — dropKeys is any
    * array<string> expression (typically a join-collected column). */
  private[graft] val stripLinesByKeyBuilder: Seq[Expression] => Expression = {
    case Seq(text, keys) => StripLinesByKey(text, keys)
    case exprs => throw new IllegalArgumentException(
      s"strip_lines_by_key(text, dropKeys) takes 2 arguments, got ${exprs.length}")
  }

  /** Register SQL-visible functions on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gopher_stats", gopherStatsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "c4_kept_lines", c4KeptLinesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_lines_by_key", stripLinesByKeyBuilder, "built-in")
  }
}
