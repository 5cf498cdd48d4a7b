package graft

/** SCRATCH (r17, not part of the declared surface): A/B harness for the
  * BSP-loop levers — blockSize and AQE-in-loop — over the isolated
  * pagerankConvergedWithRound loop (kNN build checkpointed out of the
  * timed region). Interleaved trials, min-of-2 per variant.
  * Usage: scripts/run.sh graft.XBlock
  */
object XBlock {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = Tables.embeddings(spark, d)
    val edges = graft.api.Similarity.knnGraphCapped(e, "vec_id", "embedding",
        5, tables = 8, bits = 6, cap = 16)
      .select("src_id", "neighbor_id").localCheckpoint()
    edges.count()
    val ids = e.select("vec_id")

    def run(bs: Int, aqe: Boolean): Double = {
      val saved = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t0 = System.nanoTime()
      try {
        val (r, round) = graft.api.Graphs.pagerankConvergedWithRound(
          ids, "vec_id", edges, "src_id", "neighbor_id", blockSize = bs)
        val n = r.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[xblock] bs=$bs%2d aqe=$aqe%5s round=$round%2d rows=$n $sec%6.2f s")
        sec
      } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
    }
    val variants = Seq((4, true), (8, true), (12, true), (4, false), (8, false))
    variants.foreach { case (b, a) => run(b, a) } // warm pass
    println("-- timed pass --")
    variants.foreach { case (b, a) => run(b, a) }
    spark.stop()
  }
}
