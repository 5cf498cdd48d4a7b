package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory)
  * and §7 (build order). Each module under graft.queries contributes its
  * declared query keys plus the DuckDB oracle SQL that pins its semantics.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The namesake operator: 6 h / 30 min sliding event-time windows.
    */
  def entry(spark: SparkSession): DataFrame =
    EventTime.wndSliding(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventTime.queries ++ Analytic.queries ++
      Pipeline.queries ++ Streaming.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx/streaming/ANN) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventTime.oracles ++ Analytic.oracles ++
      Pipeline.oracles ++ Streaming.oracles
}
