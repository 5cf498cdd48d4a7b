package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke: SparkEntry.entry must return
  * >0 rows on sf0.001. Usage: scripts/run.sh graft.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n (${if (n > 0) "PASS" else "FAIL"})")
    spark.stop()
  }
}
