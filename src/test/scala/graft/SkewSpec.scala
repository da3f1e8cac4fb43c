package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted aggregation equals plain aggregation on skewed keys") {
    import spark.implicits._
    // 90% of rows share one hot key
    val rows = (0 until 5000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
    }
    val df = rows.toDF("k", "v").repartition(8)
    val plain = df.groupBy(col("k")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("total"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedAgg(df, col("k"), col("v"), nSalts = 8)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(plain == salted)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val left = (0 until 2000).map(i => (if (i % 5 == 0) i % 3 else 1, i))
      .toDF("k", "v").repartition(8)
    val right = (0 until 3).map(k => (k, s"dim$k")).toDF("rk", "name")
    val plain = left.join(right, left("k") === right("rk"))
      .select("v", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, "k", "rk", nSalts = 4)
      .select("v", "name").collect().map(_.toString).sorted
    assert(plain.sameElements(salted))
  }
}
