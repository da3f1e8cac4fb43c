package graft.examples

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-level-vs-flat coarse quantizer comparison (VERDICT r14 #6): on
  * the 2M planted SemDedup fixture ([[SemDedupFixture]]), train both
  * quantizers at the SAME leaf budget (autoCellCount discipline), then
  * measure per quantizer: train wall, full-corpus assignment wall, and
  * planted-pair recall — the fraction of ground-truth duplicate pairs
  * whose two sides land in the same (routed) cell, which upper-bounds
  * what any within-cell dedup stage can recover at nprobe=1.
  *
  * The flat path holds k·d on the driver and assigns at O(n·k·d); the
  * two-level path holds √k·d and assigns at O(n·√k·d) — this probe
  * prices the recall cost of that √k routing saving on real planted
  * structure (route-equivalence is exact only for well-separated
  * clusters; the fixture's σ=0.7 clustered background is the honest
  * case).
  *
  * Usage: sbt "runMain graft.examples.HierIvfProbe <fixtureDir> [kOverride]"
  * (generate the fixture first:
  *   sbt "runMain graft.examples.SemDedupFixture gen <dir> 2000000 50000") */
object HierIvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-hier-ivf-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val pairs = spark.read.parquet(s"$dir/planted_pairs.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val k = if (args.length > 1) args(1).toInt
      else Similarity.autoCellCount(n, targetPerCell = 256)
    System.err.println(s"[hier-probe] n=$n pairs=$nPairs k=$k")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- flat IVF: train (auto cap 64k points), assign, pair recall
    val (flatCents, flatTrainS) = timed(Similarity.trainIvfCentroids(
      emb, "embedding", kCells = k, iters = 5, seed = 7L,
      maxTrainPoints = 0L))
    val flatAssigned = emb.select(col("vec_id"),
      Similarity.ivfCell(col("embedding"), flatCents).as("cell"))
    val (_, flatAssignS) = timed(
      flatAssigned.write.format("noop").mode("overwrite").save())
    val fa = flatAssigned
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val flatCoCell = pairs
      .join(fa.withColumnRenamed("vec_id", "id1")
        .withColumnRenamed("cell", "c1"), "id1")
      .join(fa.withColumnRenamed("vec_id", "id2")
        .withColumnRenamed("cell", "c2"), "id2")
      .filter(col("c1") === col("c2")).count()

    // ---- two-level: same leaf budget, same train cap semantics.
    // superProbe curve: P=1 is the pure greedy route (route-equivalent
    // to flat only on separated clusters — the realistic fixture puts a
    // number on the boundary-straddle loss); P>1 multi-probes the super
    // level, converging to the flat argmin over the SAME leaf set.
    val (hier, hierTrainS) = timed(Similarity.trainIvfCentroidsTwoLevel(
      emb, "embedding", kCells = k, iters = 5, seed = 7L,
      maxTrainPoints = 0L))
    val leafCount = hier.leafCount()
    val kSuper = hier.supers.length
    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val probes = Seq(1, 2, 4, 8).filter(_ <= kSuper)
    val curve = probes.map { p =>
      val hierAssigned = Similarity
        .assignCellsTwoLevel(emb, "embedding", hier, superProbe = p)
        .select(col("vec_id"), col("superId"), col("subId"))
      val (_, assignS) = timed(
        hierAssigned.write.format("noop").mode("overwrite").save())
      val ha = hierAssigned
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val coCell = pairs
        .join(ha.withColumnRenamed("vec_id", "id1")
          .withColumnRenamed("superId", "s1").withColumnRenamed("subId", "b1"),
          "id1")
        .join(ha.withColumnRenamed("vec_id", "id2")
          .withColumnRenamed("superId", "s2").withColumnRenamed("subId", "b2"),
          "id2")
        .filter(col("s1") === col("s2") && col("b1") === col("b2")).count()
      ha.unpersist(false)
      System.err.println(s"[hier-probe] P=$p assign=${num(assignS)}s " +
        s"co_cell=$coCell recall=${num(coCell.toDouble / nPairs)}")
      s"""{"super_probe":$p,"assign_s":${num(assignS)},""" +
        s""""co_cell_pairs":$coCell,"recall":${num(coCell.toDouble / nPairs)}}"""
    }

    println(s"""{"n":$n,"planted_pairs":$nPairs,"k_requested":$k,""" +
      s""""flat":{"train_s":${num(flatTrainS)},"assign_s":${num(flatAssignS)},""" +
      s""""co_cell_pairs":$flatCoCell,"recall":${num(flatCoCell.toDouble / nPairs)},""" +
      s""""driver_state_doubles":${k * 64}},""" +
      s""""two_level":{"train_s":${num(hierTrainS)},"leaf_count":$leafCount,""" +
      s""""k_super":$kSuper,"driver_state_doubles":${kSuper * 64},""" +
      s""""probe_curve":[${curve.mkString(",")}]}}""")
    spark.stop()
  }
}
