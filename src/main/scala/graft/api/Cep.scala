package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Complex-event-processing patterns (Flink CEP / SQL MATCH_RECOGNIZE),
  * rewritten as gaps-and-islands window/join shapes — no per-row NFA
  * state machine, so the pattern runs as ordinary distributed SQL and
  * replays exactly in any engine.
  */
object Cep {

  /** Greedy `A+ B` with a WITHIN bound and AFTER MATCH SKIP PAST LAST
    * ROW: a maximal run of consecutive `runType` events immediately
    * followed by a `finalType` event, keeping only run events within
    * `within` of the final event.
    *
    * Islands construction: a running count of non-`runType` events (the
    * block index) is constant across each run and increments on every
    * other event — so the run immediately preceding a `finalType` row is
    * exactly the rows whose block index is the final's minus one. Runs
    * never span a non-`runType` event (adjacency is structural, not
    * time-based), and the greedy/skip-past semantics fall out because
    * each maximal run pairs with at most the one final event that ends
    * it.
    *
    * Scale: one user-keyed running-count window + one user-keyed join —
    * per-key linear; nothing global.
    */
  def runThenFinal(df: DataFrame, keyCol: String, tsCol: String,
                   ordCol: String, typeCol: String,
                   runType: String, finalType: String,
                   within: Column): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy(col(tsCol), col(ordCol))
    val t = df.select(col(keyCol), col(tsCol), col(ordCol), col(typeCol))
      .withColumn("blk",
        sum(when(col(typeCol) =!= runType, 1).otherwise(0)).over(wOrd))
    val fin = t.filter(col(typeCol) === finalType)
      .select(col(keyCol), col(tsCol).as("final_ts"),
        col(ordCol).as("final_id"), (col("blk") - 1).as("pblk"))
    val run = t.filter(col(typeCol) === runType)
      .select(col(keyCol).as("__rk"), col("blk").as("rblk"), col(tsCol).as("rts"))
    fin.join(run, fin(keyCol) === col("__rk") && col("rblk") === col("pblk"))
      .filter(col("rts") >= col("final_ts") - within)
      .groupBy(fin(keyCol), col("final_id"), col("final_ts"))
      .agg(count(lit(1)).as("n_run"), min("rts").as("first_run_ts"))
      .select(col(keyCol), col("final_id"), col("final_ts"),
        col("n_run"), col("first_run_ts"))
  }
}
