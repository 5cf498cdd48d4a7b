package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * All vector math is native higher-order expressions — codegen'd
  * sequential folds, no UDFs, no serialization. Sequential fold order is
  * part of the contract (bit-stable across engines).
  */
object Similarity {

  /** Widen to double + precompute the L2 norm (cosine denominators). */
  private[api] def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("v", expr(s"transform($vecCol, x -> cast(x as double))"))
      .withColumn("nrm", sqrt(expr("aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x)")))

  private[api] def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  /** Brute-force cosine top-`k` neighbors for each probe. Probes are
    * broadcast; the corpus is scanned once map-side, then a tiny
    * (probe, k) shuffle ranks. This IS the 100 TB baseline shape.
    */
  def cosineTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val e = withNorm(corpus, vecCol)
    val p = withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col(idCol))
    e.join(broadcast(p), col(idCol) =!= col("probe_id"))
      .withColumn("cos", dot("pv", "v") / (col("pn") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col(idCol).as("neighbor_id"), col("cos"))
  }

  /** IVF-style partition-pruned ANN: `partCol` is the coarse centroid id
    * (any clustering/partitioning column); each probe searches only its
    * `nProbe` nearest partitions. The centroid table is tiny and
    * broadcast; the corpus is partition-pruned — the scale path for
    * billion-vector search.
    */
  def annTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, partCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    val e = withNorm(corpus, vecCol)
    val cent = e.select(col(partCol), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(partCol, "pos").agg(avg(col("x")).as("cx"))
      .groupBy(partCol)
      .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), p -> p.cx)").as("cv"))
      .withColumn("cnrm", sqrt(expr("aggregate(transform(cv, x -> x * x), 0D, (acc, x) -> acc + x)")))
    val p = withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val wl = Window.partitionBy(col("probe_id")).orderBy(col("lcos").desc, col(partCol))
    val topParts = p.crossJoin(broadcast(cent))
      .withColumn("lcos", dot("pv", "cv") / (col("pn") * col("cnrm")))
      .withColumn("lrnk", row_number().over(wl))
      .filter(col("lrnk") <= nProbe)
      .select(col("probe_id"), col("pv"), col("pn"), col(partCol).as("ppart"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col(idCol))
    e.join(broadcast(topParts), col(partCol) === col("ppart") && col(idCol) =!= col("probe_id"))
      .withColumn("cos", dot("pv", "v") / (col("pn") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col(idCol).as("neighbor_id"), col("cos"))
  }
}
