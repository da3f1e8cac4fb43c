package graft

import graft.functions.{ArrayDot, ArraySqDist, MinHashSig, SimHashFp, TextHashFunctions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers graft's native expressions so any
  * session started with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) can call them from SQL:
  *
  * {{{ SELECT doc_id, minhash_sig(text) FROM documents }}}
  * {{{ SELECT array_dot(embedding, embedding) FROM embeddings }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      TextHashFunctions.minhashSigBuilder))
    e.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFp].getName, "simhash_fp"),
      TextHashFunctions.simhashFpBuilder))
    e.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("array_sqdist"),
      new ExpressionInfo(classOf[ArraySqDist].getName, "array_sqdist"),
      (exprs: Seq[Expression]) => ArraySqDist(exprs(0), exprs(1))))
  }
}
