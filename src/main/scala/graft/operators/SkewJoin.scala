package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling (on in GraftSession) splits oversized
  * post-shuffle partitions at runtime and is the first line of defense.
  * Salting is the explicit alternative when a key's rows must not land on
  * one reducer at all — e.g. a 100 TB fact table where one tenant is 30%
  * of the data:
  *
  *  - the big (skewed) side gets a uniform random-free salt derived from a
  *    row attribute (deterministic, no rand(): re-runs and retries stay
  *    stable);
  *  - the small side is replicated `buckets` times, once per salt value;
  *  - the join key becomes (key, salt), spreading each hot key over
  *    `buckets` reducers.
  *
  * Cost: small side inflates ×buckets — bounded, it is the non-skewed
  * side; correctness: every (key, salt) pair of the big side meets every
  * replica, so exactly the original matches are produced.
  */
object SkewJoin {

  /** Deterministic salt in [0, buckets) from arbitrary discriminator
    * columns (e.g. the fact table's primary key). */
  def salt(buckets: Int, discriminator: Column*): Column =
    pmod(hash(discriminator: _*), lit(buckets))

  /** Inner equi-join of `big` and `small` on `key`, spreading each big-side
    * key over `buckets` reducers. `bigSalt` must be a deterministic
    * expression over big-side columns. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, bigSalt: Column): DataFrame = {
    val salted = big.withColumn("__salt", bigSalt)
    val replicated = small.crossJoin(
      spark_range_df(small, buckets)) // one replica per salt value
    salted.join(replicated,
      salted("__salt") === replicated("__rep") &&
        salted(key) === replicated(key))
      .drop("__salt", "__rep")
      .drop(replicated(key))
  }

  private def spark_range_df(df: DataFrame, buckets: Int): DataFrame =
    df.sparkSession.range(buckets).select(col("id").cast("int").as("__rep"))

  /** Salt width for [[q81SkewJoin]]. */
  val SkewBuckets = 8

  /** The synthetically SKEWED fact table q81 joins: orders, plus every
    * third order re-pointed at one hot custkey (the smallest customer
    * key, derived in-plan so the oracle reproduces it) — the hot key ends
    * up ~25% of all rows, the "one tenant is 30% of the data" regime this
    * operator exists for. Replica orderkeys live in the negative
    * namespace (q79's trick) so they can never collide with a real order
    * at any scale. Deterministic end to end: re-runs, retries, and the
    * DuckDB twin all build the identical table. */
  def skewedOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val hot = Tables.customer(spark, sfDir)
      .agg(min("c_custkey").as("hot_key"))
    orders.unionByName(
      orders.where(col("o_orderkey") % 3 === 0)
        .crossJoin(broadcast(hot))
        .select((-(col("o_orderkey") + 1L)).as("o_orderkey"),
          col("hot_key").as("o_custkey"), col("o_totalprice")))
  }

  /** Q81: the SALTED JOIN run against a genuinely skewed key — the
    * verified-query face of [[saltedJoin]]: revenue per market segment
    * over [[skewedOrders]] ⨝ customer, with the hot key spread across
    * [[SkewBuckets]] reducers by an o_orderkey-derived salt. Without the
    * salt one reducer receives ~25% of the fact table (the straggler
    * that sets the stage's wall-clock at 100 TB); with it the hot key's
    * rows land on [[SkewBuckets]] partitions. The spec pins the salt
    * DISTRIBUTION (every bucket hit, no bucket above 2× fair share) and
    * the shuffle-mode plan's per-partition spread — the physical plan at
    * toy scale may broadcast the small side, but the salt key is what
    * partitions the hot key once the small side outgrows the broadcast
    * threshold. Oracle: the same aggregate over a plain SQL join. */
  def q81SkewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
    saltedJoin(skewedOrders(spark, sfDir), customer, "o_custkey",
      buckets = SkewBuckets,
      bigSalt = salt(SkewBuckets, col("o_orderkey")))
      .groupBy("c_mktsegment")
      .agg(round(sum("o_totalprice"), 2).as("total_revenue"),
        count(lit(1)).as("order_cnt"))
      .orderBy("c_mktsegment")
  }
}
