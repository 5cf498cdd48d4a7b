package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a single declared query.
  * Usage: scripts/run.sh graft.RunOne <key> <sfDir> [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    val df = SparkEntry.queries(key)(spark, dir)
    if (args.contains("explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[runone] $key: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // dump=<dir>: write the result like Verify does (for single-key
    // oracle_check.py replays without a full Verify run)
    args.find(_.startsWith("dump=")).map(_.stripPrefix("dump=")).foreach { out =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$key")
    }
    spark.stop()
  }
}
