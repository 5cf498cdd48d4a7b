package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session fixture: one SparkSession per suite, configured exactly
  * like the driver's Verify/Bench sessions (UTC, nanosAsLong, small
  * shuffle partitioning for local).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(4)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf001 = "/root/testdata/sf0.001"
}
