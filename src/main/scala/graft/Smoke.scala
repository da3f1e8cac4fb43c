package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: exercises the driver contract (`SparkEntry.entry`)
  * exactly the way the external harness does — fit + score on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = SparkEntry.entry(spark)
    val n = out.count()
    println(s"[smoke] entry rows=$n")
    out.show(5, truncate = false)
    val acc = out.selectExpr("avg(cast(cast(label as boolean) = prediction as double)) as acc")
    acc.show()
    spark.stop()
  }
}
