package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis over explicit edge lists (the graph layer next to
  * [[Dedup.clusters]]' connected components): corpus-curation ranking
  * over the kNN graph — SemDeDup-style cluster pruning keeps the
  * highest-CENTRALITY member, near-dup audit orders candidates by how
  * referenced they are, crawl frontiers prioritize by link rank.
  */
object Graphs {

  /** Distributed PageRank over a directed edge list, in EXACT
    * fixed-point integer arithmetic.
    *
    * Ranks live in integer `scale` units (default parts-per-trillion):
    * r_0 = scale div n, and each of the `iters` synchronous rounds is
    *
    *   r'(i) = (15 * (scale div n)) div 100
    *         + (85 * Σ_{j→i} (r(j) div out(j))) div 100
    *
    * i.e. the standard d = 0.85 update with every division an INTEGER
    * floor division and every sum an integer sum. That choice is what
    * makes the operator oracle-able: float PageRank depends on the
    * ORDER partial sums combine in (engine- and partitioning-specific),
    * while integer sums are associative — Spark and DuckDB agree
    * bit-for-bit at any parallelism. The sub-ulp mass lost to the
    * floors (and the dangling mass, which is NOT redistributed) makes
    * this a centrality SCORE, not a probability distribution — the
    * ranking use cases above never needed the simplex.
    *
    * Scale: per round, one (src-keyed) join of edges to ranks + one
    * dst-keyed partial-aggregated shuffle of the contributions + one
    * left join back to the node set — all key-partitioned, nothing
    * global; edges for a capped kNN graph are O(n·k). `iters` is fixed
    * (deterministic output), each round localCheckpointed so the plan
    * does not grow with the unroll. Overflow headroom: total rank mass
    * <= scale = 1e12, times 85 stays far inside Long.
    *
    * Output: (id, r) — node id and its integer rank in `scale` units.
    */
  def pagerank(nodes: DataFrame, idCol: String, edges: DataFrame,
               srcCol: String, dstCol: String, iters: Int = 8,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outd"))
    val eo = e.join(outdeg, "src").localCheckpoint() // edges are reused every round
    val n = ids.count() // bounded: one scalar to the driver
    require(n > 0, "pagerank over an empty node set")
    val r0 = scale / n
    val base = (15L * r0) / 100L
    var ranks = ids.select(col("id"), lit(r0).as("r"))
    for (_ <- 1 to iters) {
      val contribs = eo.join(ranks, eo("src") === ranks("id"))
        .select(col("dst").as("id"), expr("r div outd").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = ids.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks
  }
}
