package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one SparkContext). */
object SharedSpark {
  lazy val spark: SparkSession =
    GraftSession.create("graft-test", Some("local[4]"), shufflePartitions = 4)
}

/** Base class: every spec gets the shared session + the smallest test SF. */
abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val sfDir = "/root/testdata/sf0.001"
}
