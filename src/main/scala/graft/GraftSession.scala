package graft

import org.apache.spark.sql.SparkSession

/** Single place the engine's session configuration lives. Every entry
  * point (Bench, Verify, Smoke, the test suites) builds through here so
  * required confs — UTC session time, the Parquet TIMESTAMP(NANOS)
  * legacy read (FIXTURES.md "GOTCHA"), shuffle partitioning sized to the
  * local core count — are set once at construction instead of being
  * mutated at query time by table loaders.
  */
object GraftSession {
  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
