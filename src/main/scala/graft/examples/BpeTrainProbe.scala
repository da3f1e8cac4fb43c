package graft.examples

import org.apache.spark.sql.SparkSession

/** Measures the REALIZED merge count of the q123 trainer config at a
  * fixture (VERDICT r13 #6): `trainMerges(wordCounts(documents), 200)`
  * early-stops when no pair occurs twice, so the number of merges the
  * oracle-covered prefix (q145's BpeTrainPrefixK) must reach to leave
  * q123's rows-only tail EMPTY is a property of the data, not the cap.
  * Prints one JSON line: realized merges, the stop reason, vocab size,
  * and train wall.
  *
  * Run: tools/jrun.sh graft.examples.BpeTrainProbe <sfDir> [numMerges]
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numMerges = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val counts = graft.ops.Bpe.wordCounts(docs)
    val nVocab = counts.count()
    val t0 = System.nanoTime()
    val model = graft.ops.Bpe.trainMerges(counts, numMerges)
    val secs = (System.nanoTime() - t0) / 1e9
    val realized = model.merges.length
    val stop = if (realized < numMerges) "early_stop_no_pair_twice" else "cap"
    println(
      s"""{"dir": "$dir", "num_merges_cap": $numMerges, """ +
        s""""realized_merges": $realized, "stop": "$stop", """ +
        s""""vocab_rows": $nVocab, "train_secs": ${f"$secs%.1f"}}""")
    spark.stop()
  }
}
