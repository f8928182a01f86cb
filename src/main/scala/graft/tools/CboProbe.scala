package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** STATS-DRIVEN PLANNING A/B — does the engine need ANALYZE + CBO, or
  * do AQE's runtime statistics cover it?
  *
  * Every small-side join in the engine hardcodes `broadcast()`; right at
  * these SFs, but at 100 TB dimension sizes shift and a wrong hardcoded
  * hint becomes an OOM (too big to broadcast) or a needless shuffle
  * (small side sort-merged). The two public mechanisms that would
  * replace the hint: catalog statistics + the cost-based optimizer
  * (`ANALYZE TABLE … COMPUTE STATISTICS`, `spark.sql.cbo.enabled`,
  * `spark.sql.cbo.joinReorder.enabled` — compile-time), and AQE's
  * runtime stage statistics (`spark.sql.adaptive.*` — re-plans joins
  * AFTER seeing real sizes, on by default in this engine).
  *
  * This probe runs the engine's two canonical star joins (q8's
  * orders⋈customer⋈nation⋈region, q138's TPC-H-Q10 shape) HINT-FREE
  * over catalog tables in three configurations — (a) no stats + AQE,
  * (b) ANALYZE'd + CBO + join reorder, (c) the engine's hardcoded
  * broadcasts — and reports each plan's join strategies plus
  * min-of-3 wall. Run:
  * `sbt "runMain graft.tools.CboProbe [sfDir]"`.
  * Findings land in SCALING.md §"Stats-driven planning".
  */
object CboProbe {

  private def joinMix(df: DataFrame): String = {
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    val shj = "ShuffledHashJoin".r.findAllIn(plan).size
    s"BHJ=$bhj SMJ=$smj SHJ=$shj"
  }

  private def wallMin3(body: => Unit): Double = {
    (1 to 3).map { _ =>
      val t0 = System.nanoTime
      body
      (System.nanoTime - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create("graft-cbo-probe", Some("local[16]"))

    // catalog tables: CBO reads CATALOG stats only (a parquet-path scan
    // has no stats entry to ANALYZE)
    for (t <- Seq("orders", "customer", "nation", "region", "lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS cbo_$t")
      val src = t match {
        case "orders" => Tables.orders(spark, dir)
        case "customer" => Tables.customer(spark, dir)
        case "nation" => Tables.nation(spark, dir)
        case "region" => Tables.region(spark, dir)
        case "lineitem" => Tables.lineitem(spark, dir)
      }
      src.write.mode("overwrite").saveAsTable(s"cbo_$t")
    }

    // hint-free formulations of the two star joins
    def q8Free(s: SparkSession): DataFrame =
      s.table("cbo_orders")
        .join(s.table("cbo_customer"), col("o_custkey") === col("c_custkey"))
        .join(s.table("cbo_nation"), col("c_nationkey") === col("n_nationkey"))
        .join(s.table("cbo_region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("n_name")
    def q138Free(s: SparkSession): DataFrame =
      s.table("cbo_lineitem").where(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_e4"))
        .join(s.table("cbo_orders")
          .where(col("o_orderdate") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
            col("o_orderdate") < lit(java.sql.Date.valueOf("1996-04-01")))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(s.table("cbo_customer"), col("o_custkey") === col("c_custkey"))
        .join(s.table("cbo_nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("n_name"))
        .agg(sum(col("rev_e4")).as("rev_e4"))
        .orderBy(col("rev_e4").desc, col("c_custkey")).limit(20)

    def phase(tag: String, session: SparkSession): Unit = {
      for ((name, q) <- Seq("q8" -> q8Free _, "q138" -> q138Free _)) {
        val df = q(session)
        val mix = joinMix(df)
        val w = wallMin3(q(session).queryExecution.toRdd.count())
        println(f"[cbo-probe] $tag%-22s $name%-5s $mix%-22s wall_min3=$w%.2fs")
      }
    }

    // (a) no stats, AQE on (the engine default)
    phase("no-stats+AQE", spark)

    // (a') no stats, AQE OFF — isolates WHERE the broadcast decision
    // comes from: if the plan is still all-BHJ here, the compile-time
    // file-size estimate alone picked it (AQE and CBO both unneeded
    // for these shapes)
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    phase("no-stats+noAQE", noAqe)

    // (b) ANALYZE + CBO + join reorder (AQE still on, as in production)
    for (t <- Seq("orders", "customer", "nation", "region", "lineitem"))
      spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
    val cboSession = spark.newSession()
    cboSession.conf.set("spark.sql.cbo.enabled", "true")
    cboSession.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    phase("analyzed+CBO+reorder", cboSession)

    // (c) the engine's shipped (hardcoded-broadcast) formulations —
    // rebuilt per run so the wall includes planning + execution, like
    // the phases above (a reused queryExecution would re-count a
    // materialized RDD and read ~0)
    for ((name, build) <- Seq[(String, () => DataFrame)](
        "q8" -> (() =>
          graft.operators.RelationalQueries.q8MultiJoin(spark, dir)),
        "q138" -> (() =>
          graft.operators.RelationalQueries.q138RevenueReport(spark, dir)))) {
      val mix = joinMix(build())
      val w = wallMin3(build().queryExecution.toRdd.count())
      println(f"[cbo-probe] ${"engine-hardcoded"}%-22s $name%-5s $mix%-22s wall_min3=$w%.2fs")
    }
    spark.stop()
  }
}
