package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-key timing (min of two runs, same methodology as Bench)
  * for iterating on individual operators without a full bench pass.
  * Usage: scripts/run.sh graft.TimeKeys <sfDir> <key> [key...]
  */
object TimeKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args.drop(1)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      def once(): (Double, Long) = {
        val t0 = System.nanoTime(); val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (t1, n) = once(); val (t2, _) = once()
      println(f"[time] $k%-24s ${math.min(t1, t2)}%7.2f s  rows=$n")
    }
    spark.stop()
  }
}
