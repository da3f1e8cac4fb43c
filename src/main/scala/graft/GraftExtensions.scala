package graft

import graft.functions.{ArrayCosineSim, ArrayDot, ArrayMath, ArraySqDist, C4KeptLines, CharLmFunctions, CharNgrams, DsirFunctions, GopherStats, HashedNgramBuckets, MinHashSig, QualityFunctions, SimHashFp, StripLinesByKey, TextHashFunctions, TokenNgrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
      ArrayMath.arrayDotBuilder))
    e.injectFunction((
      new FunctionIdentifier("array_sqdist"),
      new ExpressionInfo(classOf[ArraySqDist].getName, "array_sqdist"),
      ArrayMath.arraySqDistBuilder))
    e.injectFunction((
      new FunctionIdentifier("array_cosine_sim"),
      new ExpressionInfo(classOf[ArrayCosineSim].getName, "array_cosine_sim"),
      ArrayMath.arrayCosineSimBuilder))
    e.injectFunction((
      new FunctionIdentifier("char_trigrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_trigrams"),
      CharLmFunctions.charTrigramsBuilder))
    e.injectFunction((
      new FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      CharLmFunctions.charNgramsBuilder))
    e.injectFunction((
      new FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[TokenNgrams].getName, "token_ngrams"),
      CharLmFunctions.tokenNgramsBuilder))
    e.injectFunction((
      new FunctionIdentifier("hashed_ngram_buckets"),
      new ExpressionInfo(classOf[HashedNgramBuckets].getName, "hashed_ngram_buckets"),
      DsirFunctions.hashedNgramBucketsBuilder))
    e.injectFunction((
      new FunctionIdentifier("gopher_stats"),
      new ExpressionInfo(classOf[GopherStats].getName, "gopher_stats"),
      QualityFunctions.gopherStatsBuilder))
    e.injectFunction((
      new FunctionIdentifier("c4_kept_lines"),
      new ExpressionInfo(classOf[C4KeptLines].getName, "c4_kept_lines"),
      QualityFunctions.c4KeptLinesBuilder))
    e.injectFunction((
      new FunctionIdentifier("strip_lines_by_key"),
      new ExpressionInfo(classOf[StripLinesByKey].getName, "strip_lines_by_key"),
      QualityFunctions.stripLinesByKeyBuilder))
  }
}
