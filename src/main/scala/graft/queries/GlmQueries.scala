package graft.queries

import org.apache.spark.sql.functions._
import Queries._

/** The GLM math plane as DuckDB-verifiable queries: each distributed
  * kernel (A1 mat-vec, A2 gradient, A4 stats, loss sums — SURVEY §2.A)
  * evaluated at a FIXED β so the computation is a deterministic
  * one-pass dataflow, not an iterative fit. Iterative solver outputs are
  * validated by the statistical oracles in the test suite instead
  * (fit results are not bit-reproducible across engines).
  *
  * Feature vector: lineitem [l_quantity, l_extendedprice/1e5, l_discount],
  * label: l_returnflag == 'R'. β fixed at (0.8, -1.3, 2.1, intercept 0.25).
  */
object GlmQueries {

  private val b = Array(0.8, -1.3, 2.1, 0.25)

  // per-row margin, same association order both sides:
  // ((b0*q + b1*p) + b2*d) + b3
  private def marginSql =
    s"((${b(0)} * l_quantity + ${b(1)} * (l_extendedprice / 100000.0)) + ${b(2)} * l_discount) + ${b(3)}"

  private def marginCol =
    ((lit(b(0)) * col("l_quantity") + lit(b(1)) * (col("l_extendedprice") / lit(100000.0)))
      + lit(b(2)) * col("l_discount")) + lit(b(3))

  private def labelCol = (col("l_returnflag") === "R").cast("double")
  private def labelSql = "CAST(l_returnflag = 'R' AS DOUBLE)"

  val qs: Seq[Q] = Seq(
    // ---- A1: row-partitioned mat-vec (dot(X, beta)), per-row exact
    Q("q20_xbeta",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            marginCol.as("xbeta"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber, $marginSql AS xbeta
        FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
      bench = true),

    // ---- predict threshold counts (sigmoid(xb) > 0.5 ⟺ margin sign)
    Q("q21_predict_counts",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .select(col("l_returnflag"),
            (lit(1.0) / (lit(1.0) + exp(-marginCol)) > 0.5).cast("int").as("pred"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("pred")).cast("long").as("n_pos"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(1.0 / (1.0 + EXP(-($marginSql))) > 0.5 AS INTEGER)) AS BIGINT) AS n_pos
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- A4: colStats — mean/var through exact decimal sums
    Q("q22_colstats",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        li.agg(
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("s_q"),
            dsum(col("l_quantity") * col("l_quantity"), 30, 4).as("ss_q"),
            dsum(col("l_discount")).as("s_d"),
            dsum(col("l_discount") * col("l_discount"), 30, 8).as("ss_d"))
          .select(
            col("n"),
            (col("s_q") / col("n")).as("mean_qty"),
            (col("ss_q") / col("n") - (col("s_q") / col("n")) * (col("s_q") / col("n"))).as("var_qty"),
            (col("s_d") / col("n")).as("mean_disc"),
            (col("ss_d") / col("n") - (col("s_d") / col("n")) * (col("s_d") / col("n"))).as("var_disc"))
      },
      Some(s"""SELECT n, s_q / n AS mean_qty,
          ss_q / n - (s_q / n) * (s_q / n) AS var_qty,
          s_d / n AS mean_disc,
          ss_d / n - (s_d / n) * (s_d / n) AS var_disc
        FROM (SELECT COUNT(*) AS n,
          ${dsumSql("l_quantity")} AS s_q,
          ${dsumSql("l_quantity * l_quantity", 30, 4)} AS ss_q,
          ${dsumSql("l_discount")} AS s_d,
          ${dsumSql("l_discount * l_discount", 30, 8)} AS ss_d
        FROM lineitem)""")),

    // ---- A2 for the Normal family: gradient 2·Xᵀ(Xβ−y) at fixed β,
    // exact via per-row decimal cast (pure *,+ per row → bit-identical)
    Q("q23_normal_gradient",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val resid = marginCol - labelCol
        // outputs stay DECIMAL: a double conversion of a wide exact sum
        // rounds differently across engines (Java BigDecimal.doubleValue
        // is correctly rounded; DuckDB divides the int128 by 10^scale)
        def dsumDec(c: org.apache.spark.sql.Column) =
          sum(c.cast(org.apache.spark.sql.types.DecimalType(28, 10)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 10))
        li.agg(
          dsumDec(lit(2.0) * col("l_quantity") * resid).as("g_qty"),
          dsumDec(lit(2.0) * (col("l_extendedprice") / lit(100000.0)) * resid).as("g_price"),
          dsumDec(lit(2.0) * col("l_discount") * resid).as("g_disc"),
          dsumDec(lit(2.0) * resid).as("g_intercept"))
      },
      Some(s"""SELECT
          CAST(SUM(CAST(2.0 * l_quantity * (($marginSql) - $labelSql) AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS g_qty,
          CAST(SUM(CAST(2.0 * (l_extendedprice / 100000.0) * (($marginSql) - $labelSql) AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS g_price,
          CAST(SUM(CAST(2.0 * l_discount * (($marginSql) - $labelSql) AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS g_disc,
          CAST(SUM(CAST(2.0 * (($marginSql) - $labelSql) AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS g_intercept
        FROM lineitem""")),

    // ---- Normal loss (SSE, the reference's unscaled form) at fixed β
    Q("q24_sse_loss",
      (s, dir) => {
        val r = labelCol - marginCol
        tbl(s, dir, "lineitem").agg(dsum(r * r, 38, 6).as("sse"))
      },
      Some(s"""SELECT ${dsumSql(s"($labelSql - ($marginSql)) * ($labelSql - ($marginSql))", 38, 6)} AS sse
        FROM lineitem""")),

    // ---- Gram matrix XᵀX upper triangle at fixed features (A3 kernel,
    // β-independent — the Normal-family Hessian / 2)
    Q("q25_gram",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val q = col("l_quantity")
        val pr = col("l_extendedprice") / lit(100000.0)
        val d = col("l_discount")
        def dsumDec(c: org.apache.spark.sql.Column, sc: Int) =
          sum(c.cast(org.apache.spark.sql.types.DecimalType(28, sc)))
            .cast(org.apache.spark.sql.types.DecimalType(38, sc))
        li.agg(
          dsumDec(q * q, 8).as("g_qq"),
          dsumDec(q * pr, 10).as("g_qp"),
          dsumDec(q * d, 10).as("g_qd"),
          dsumDec(pr * pr, 12).as("g_pp"),
          dsumDec(pr * d, 12).as("g_pd"),
          dsumDec(d * d, 12).as("g_dd"))
      },
      Some(s"""SELECT
          CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DECIMAL(38,8)) AS g_qq,
          CAST(SUM(CAST(l_quantity * (l_extendedprice / 100000.0) AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS g_qp,
          CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS g_qd,
          CAST(SUM(CAST((l_extendedprice / 100000.0) * (l_extendedprice / 100000.0) AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS g_pp,
          CAST(SUM(CAST((l_extendedprice / 100000.0) * l_discount AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS g_pd,
          CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS g_dd
        FROM lineitem""")),

    // ---- logistic probability per row, rounded to absorb libm exp ulps
    Q("q26_proba",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            round(lit(1.0) / (lit(1.0) + exp(-marginCol)), 6).as("proba"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
          ROUND(1.0 / (1.0 + EXP(-($marginSql))), 6) AS proba
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- accuracy score (estimators.py:152-153) at fixed β: integer
    // agreement counts → exact double division
    Q("q27_accuracy",
      (s, dir) => {
        val pred = (lit(1.0) / (lit(1.0) + exp(-marginCol)) > 0.5).cast("double")
        tbl(s, dir, "lineitem")
          .agg(count(lit(1)).as("n"),
            sum((labelCol === pred).cast("long")).cast("long").as("n_correct"))
          .select(col("n"), col("n_correct"),
            (col("n_correct").cast("double") / col("n")).as("accuracy"))
      },
      Some(s"""SELECT n, n_correct, CAST(n_correct AS DOUBLE) / n AS accuracy
        FROM (SELECT COUNT(*) AS n,
          CAST(SUM(CAST($labelSql = CAST(1.0 / (1.0 + EXP(-($marginSql))) > 0.5 AS DOUBLE) AS INTEGER)) AS BIGINT) AS n_correct
        FROM lineitem)""")),

    // ---- random split counts (docs surface: random_split / randomSplit)
    // not SQL-expressible (engine-specific RNG) → rows-only check
    Q("q28_random_split",
      (s, dir) => {
        val Array(a, b2) = tbl(s, dir, "lineitem")
          .randomSplit(Array(0.05, 0.95), seed = 2)
        val na = a.count()
        val nb = b2.count()
        val spark = a.sparkSession
        import spark.implicits._
        Seq((na, nb, na + nb)).toDF("n_train", "n_test", "n_total")
      },
      None)
  )
}
