package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named registry
  * queries (`runMain graft.Explain <sfDir> <q1,q2,...>`; no names =
  * every query). The per-operator review loop the build follows —
  * check PushedFilters/ReadSchema on scans, WholeStageCodegen spans,
  * broadcast vs shuffle joins — without running anything. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)
           if only.isEmpty || only.contains(name)) {
        println(s"\n===== $name =====")
        try q(spark, dir).explain("formatted")
        catch { case e: Exception =>
          println(s"[explain failed: ${e.getClass.getSimpleName}: ${e.getMessage}]")
        }
      }
    } finally spark.stop()
  }
}
