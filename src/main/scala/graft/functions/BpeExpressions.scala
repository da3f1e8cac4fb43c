package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trained BPE merge table ([[graft.ops.Bpe]]): merges in rank order.
  * The encode-side rank map is rebuilt lazily per executor (transient —
  * only the compact merge array ships in the broadcast). */
final class BpeModel(val merges: Array[(String, String)]) extends Serializable {

  @transient lazy val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // first rank wins if a pair somehow repeats
      if (!m.containsKey(merges(i))) m.put(merges(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  def numMerges: Int = merges.length
}

object BpeModel {
  /** A word's base symbol sequence: one symbol per codepoint plus the
    * `</w>` end-of-word marker (Sennrich et al. 2016 formulation — the
    * SAME function drives training and encoding, so the two can never
    * disagree on the alphabet). */
  def baseSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val out = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      out(i) = new String(cps, i, 1)
      i += 1
    }
    out(cps.length) = "</w>"
    out
  }
}

/** Greedy BPE encode of a text column under a broadcast merge table:
  * per `split(" +")` word, repeatedly apply the PRESENT pair with the
  * lowest merge rank (all left-to-right occurrences per application —
  * the standard encode loop) until no adjacent pair is in the table;
  * emit the concatenated symbol stream as `array<string>`. Empty words
  * (string-edge split artifacts) emit nothing. One fused pass per row;
  * no explode, no join, no shuffle. */
case class BpeEncode(child: Expression, bc: Broadcast[BpeModel])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** The fused kernel; public so generated code can call it. */
  def computeTokens(input: UTF8String): ArrayData = {
    val m = bc.value
    val ranks = m.ranks
    val words = TextHashKernels.splitter.split(input.toString, -1)
    val out = scala.collection.mutable.ArrayBuffer[AnyRef]()
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        var syms = scala.collection.mutable.ArrayBuffer.from(
          BpeModel.baseSymbols(words(w)))
        var continue = m.numMerges > 0
        while (continue && syms.length > 1) {
          // lowest-rank adjacent pair present in the table
          var bestRank = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = ranks.get((syms(i), syms(i + 1)))
            if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
            i += 1
          }
          if (bestRank == Int.MaxValue) continue = false
          else {
            val (a, b) = m.merges(bestRank)
            val joined = a + b
            var j = 0
            while (j < syms.length - 1) {
              if (syms(j) == a && syms(j + 1) == b) {
                syms.update(j, joined)
                syms.remove(j + 1)
              } else j += 1
            }
          }
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    computeTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}

object BpeFunctions {
  /** BPE tokens of `text` under a broadcast merge table. */
  def bpeEncode(text: Column, bc: Broadcast[BpeModel]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), bc))
}
