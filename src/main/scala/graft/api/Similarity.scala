package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{vec_dot, vec_norm}

/** Similarity search over an embedding column (Array[Float]).
  *
  * Vector math uses the engine's native `vec_dot` Catalyst expression
  * (graft.functions.VecDot): a single fused codegen loop, accumulating in
  * double in index order — bit-identical to the higher-order-function
  * fold it replaces, with no per-row intermediate arrays.
  */
object Similarity {

  /** Precompute the L2 norm (cosine denominator) on the raw vector. */
  private[api] def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("nrm", vec_norm(col(vecCol)))

  /** Brute-force cosine top-`k` neighbors for each probe. Probes are
    * broadcast; the corpus is scanned once map-side, then a tiny
    * (probe, k) shuffle ranks. This IS the 100 TB baseline shape.
    */
  def cosineTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val e = withNorm(corpus, vecCol)
    val p = withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("pv"), col("nrm").as("pn"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col(idCol))
    e.join(broadcast(p), col(idCol) =!= col("probe_id"))
      .withColumn("cos", vec_dot(col("pv"), col(vecCol)) / (col("pn") * col("nrm")))
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
    // Centroid components are exact-DECIMAL sums divided by the count:
    // order-independent (a double `avg` varies with partial-agg merge
    // order), so the centroid — and therefore the probe→partition routing
    // and the final result — is bit-deterministic and oracle-checkable.
    val cent = corpus
      .select(col(partCol), posexplode(expr(s"transform($vecCol, x -> cast(x as double))"))
        .as(Seq("pos", "x")))
      .groupBy(partCol, "pos")
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(30, 15)))
        .cast("double") / count(lit(1))).as("cx"))
      .groupBy(partCol)
      .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), p -> p.cx)").as("cv"))
      .withColumn("cnrm", vec_norm(col("cv")))
    val p = withNorm(probes, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("pv"), col("nrm").as("pn"))
    val wl = Window.partitionBy(col("probe_id")).orderBy(col("lcos").desc, col(partCol))
    val topParts = p.crossJoin(broadcast(cent))
      .withColumn("lcos", vec_dot(col("pv"), col("cv")) / (col("pn") * col("cnrm")))
      .withColumn("lrnk", row_number().over(wl))
      .filter(col("lrnk") <= nProbe)
      .select(col("probe_id"), col("pv"), col("pn"), col(partCol).as("ppart"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col(idCol))
    e.join(broadcast(topParts), col(partCol) === col("ppart") && col(idCol) =!= col("probe_id"))
      .withColumn("cos", vec_dot(col("pv"), col(vecCol)) / (col("pn") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col(idCol).as("neighbor_id"), col("cos"))
  }
}
