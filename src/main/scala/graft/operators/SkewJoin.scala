package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
