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
    // Quiet the one benign ERROR-with-stack Spark emits under a
    // many-query single-JVM session: DAGScheduler.updateAccumulators
    // logs accessNonExistentAccumulatorError when a task-completion
    // event races ContextCleaner's GC of an already-finished query's
    // accumulators (observed intermittently under host contention;
    // rc=0 and results are unaffected — the job it belongs to has
    // already returned). A bench/verify log must not end in a stack
    // trace for a non-failure, so this logger is capped to FATAL;
    // real failures still propagate as exceptions to the caller.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.FATAL)
    // same race, WARN flavor ("Attempted to access garbage collected
    // accumulator N") — one line, no stack, still noise in a green tail
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.util.AccumulatorContext",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
