package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column utilities beyond similarity search: storage-oriented
  * transforms a large-scale vector pipeline runs before indexing.
  */
object Embeddings {

  /** Symmetric per-vector int8 scalar quantization — the standard 4x
    * storage/bandwidth reduction before ANN indexing. scale = max|x|/127,
    * code_i = round_half_up(x_i / scale), so codes span [-127, 127] and
    * dequantization error is bounded by scale/2 per component.
    *
    * Emits per-vector audit stats rather than the raw code array: the
    * quantization scale, code checksum + L2 norm (re-aggregable ints),
    * and the max absolute dequantization error. Purely per-row (narrow,
    * codegen'd, no shuffle) — scales linearly with the corpus.
    *
    * Determinism: rounding is the fixed `floor(x + 0.5)` IEEE-754 op
    * sequence (not engine `round()`, whose half-even/half-up convention
    * differs across engines), and all math is in double, so results are
    * bit-identical on any engine given the same floats.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.withColumn("v", expr(s"transform($vecCol, x -> cast(x as double))"))
      .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
      // zero vector -> scale 0 would divide by zero; quantize to all-zero
      // codes via a floor on the scale instead of a per-element branch.
      .withColumn("scale", greatest(col("amax"), lit(1e-30)) / 127.0)
      .withColumn("q", expr("transform(v, x -> cast(floor(x / scale + 0.5d) as int))"))
      .withColumn("q_sum", expr("aggregate(q, 0L, (s, x) -> s + x)"))
      .withColumn("q_norm", expr("aggregate(q, 0L, (s, x) -> s + cast(x as bigint) * x)"))
      .withColumn("max_err",
        expr("array_max(zip_with(v, q, (x, c) -> abs(x - c * scale)))"))
}
