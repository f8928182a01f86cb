package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SOURCE-AUTHORITY RANK — fixed-point PageRank (Page et al., 1999,
  * the public algorithm) over an aggregated entity graph, the signal
  * web-scale curation pipelines weight domains by (a crawl favors
  * documents from authoritative sources; the mixture sampler q73/q148
  * consumes exactly this kind of per-source weight).
  *
  * INTEGER-EXACT by construction, like every gated metric in this
  * engine: ranks live in fixed-point units of 1e-9 (seed = 1e9 per
  * node), each edge contribution is `(r·w) div W_out` in long floor
  * division, damping is `0.15·SCALE + (85·contrib) div 100` — no
  * float appears anywhere, so ten distributed iterations land on the
  * SAME longs as DuckDB's unrolled replay regardless of partitioning,
  * scheduling, or summation order. Overflow headroom: total mass stays
  * ≤ N·SCALE (damping only shrinks it), so r ≤ ~25e9 here and r·w ≤
  * ~1.5e15 ≪ 2^63.
  *
  * Scale shape: the EDGE AGGREGATION is the only corpus-sized work
  * (one shuffle building (src, dst, w)); every iteration then joins
  * node-sized relations (ranks ⋈ edges ⋈ out-weights, grouped by dst).
  * Each iteration ends in `localCheckpoint` — the lineage would
  * otherwise deepen by three joins per round and re-execute the whole
  * chain every action (at cluster scale: a reliable checkpoint, plus
  * edges pre-partitioned by src so the per-round join is exchange-free
  * on the big side). Dangling nodes (no out-edges) simply leak their
  * mass — the classic simplification, applied identically on both
  * engines so the gate holds.
  */
object GraphRank {

  /** 1e9 fixed-point rank units seeded per node. */
  val Scale = 1000000000L
  val Damping = 85 // percent
  val Iters = 10

  /** The trade graph: customer-nation → supplier-nation, weighted by
    * lineitem count — every lineitem is a shipment from the supplier's
    * nation to the ordering customer's nation. */
  def tradeEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey")
    val ord = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey")
    val cust = graft.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
    val supp = graft.Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
    val nat = graft.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name")
    li.join(broadcast(ord), li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat.withColumnRenamed("n_name", "src")),
        cust("c_nationkey") === col("n_nationkey"))
      .drop("n_nationkey")
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nat.withColumnRenamed("n_name", "dst")),
        supp("s_nationkey") === col("n_nationkey"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("w"))
  }

  /** `Iters` rounds of fixed-point PageRank over `(src, dst, w)`. */
  def pageRankExact(spark: SparkSession, edges: DataFrame): DataFrame = {
    val e = edges.localCheckpoint() // the one corpus-sized computation
    // the out-weight join is LOOP-INVARIANT: fold it into the edge
    // relation once, instead of re-running the groupBy + join inside
    // every round (10× the work for byte-identical longs — guide §2.4,
    // shared exchanges; at cluster scale this is also where edges get
    // pre-partitioned by src so the per-round join is exchange-free)
    val ew = e.join(e.groupBy("src").agg(sum("w").as("tw")), Seq("src"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    var ranks = nodes.withColumn("r", lit(Scale))
    for (_ <- 1 to Iters) {
      val contrib = ew
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("(r * w) div tw").as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(Scale * 15 / 100) +
            expr(s"($Damping * coalesce(c, 0L)) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** Q167: ten exact rounds over the trade graph, per-nation rank. */
  def q167SourceAuthorityRank(spark: SparkSession,
                              sfDir: String): DataFrame =
    pageRankExact(spark, tradeEdges(spark, sfDir))
      .select(col("node"), col("r").as("rank_fp"))
      .orderBy("node")

  /** The DuckDB twin: the same ten rounds UNROLLED (one CTE per
    * iteration — recursive CTEs can't aggregate over their own working
    * table), generated from the same constants so the two sides cannot
    * drift. */
  def q167OracleSql: String = {
    val seed = Scale
    val base = Scale * 15 / 100
    val steps = (1 to Iters).map { k =>
      s"""r$k AS (
         |  SELECT nd.node,
         |         ($base::BIGINT + ($Damping * COALESCE(s.c, 0)) // 100)
         |           ::BIGINT AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum((p.r * e.w) // o.tw)::BIGINT AS c
         |    FROM r${k - 1} p
         |    JOIN edges e ON e.src = p.node
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY e.dst) s ON s.node = nd.node)"""
        .stripMargin
    }
    s"""WITH edges AS (
       |  SELECT cn.n_name AS src, sn.n_name AS dst, count(*)::BIGINT AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |  GROUP BY 1, 2),
       |outw AS (SELECT src, sum(w)::BIGINT AS tw FROM edges GROUP BY 1),
       |nodes AS (SELECT src AS node FROM edges
       |          UNION SELECT dst FROM edges),
       |r0 AS (SELECT node, $seed::BIGINT AS r FROM nodes),
       |${steps.mkString(",\n")}
       |SELECT node, r AS rank_fp FROM r$Iters ORDER BY node""".stripMargin
  }
}
