package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped MATERIALIZED ARTIFACTS — intermediate relations computed
  * once per (session, input dir) and persisted as bucketed tables that
  * every consumer query reads.
  *
  * Why this exists: AQE's ReuseExchange shares a subtree only WITHIN one
  * plan; across queries each consumer would recompute the full lineage
  * (round 3 measured the MinHash signature subtree running four times —
  * four full corpus passes for one logical artifact). At 100 TB a
  * production pipeline writes derived relations (shingles, signatures,
  * codebooks) as first-class catalog tables exactly once and feeds every
  * downstream stage from them; this registry is that story in miniature.
  *
  * Bucketed + sorted on the key column so key-keyed joins and aggregates
  * downstream skip their exchange (Spark reads bucket metadata as the
  * child's output partitioning).
  */
object Artifacts {
  /** Tables already materialized this JVM, keyed by (session, name). */
  private val built =
    scala.collection.mutable.Map.empty[(SparkSession, String), Unit]

  /** Run `build` once per (session, name), persist it bucketed on
    * `bucketCol`, and return the table. Assumes one active session per
    * JVM (true for Verify/Bench/tests): a second concurrent session
    * rebuilding the same table would delete files the first session's
    * plans still reference. Reentrant: a build may itself materialize
    * another artifact (signatures build reads the shingle artifact). */
  def materialize(spark: SparkSession, name: String, bucketCol: String,
                  buckets: Int = 8)(build: => DataFrame): DataFrame = {
    built.synchronized {
      if (!built.contains((spark, name))) {
        // the in-memory catalog resets per JVM but the warehouse dir
        // persists: clear both so saveAsTable never sees a stale location
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val dir = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
          name)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        if (dir.exists) rm(dir)
        build.write.bucketBy(buckets, bucketCol).sortBy(bucketCol)
          .mode("overwrite").saveAsTable(name)
        built.put((spark, name), ())
        ()
      }
    }
    spark.table(name)
  }
}
