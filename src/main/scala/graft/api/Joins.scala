package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skew. AQE's skew-join splitting (on by default)
  * handles most cases at runtime; explicit salting is the static escape
  * hatch when one key dominates so heavily that even split partitions
  * bottleneck — the classic 100 TB hot-key pattern.
  */
object Joins {

  /** Equi-join with the left side's hot keys spread over `factor` salt
    * buckets. The left row's bucket is derived deterministically from
    * `leftUniqueCol` (any unique column — keeps results reproducible);
    * the right side is replicated `factor` times so every (key, salt)
    * bucket can meet its match. Result rows are identical to the unsalted
    * join, in exchange for a `factor`x blow-up of the (usually small)
    * right side.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftUniqueCol: String, factor: Int): DataFrame = {
    val saltedL = left.withColumn("__salt",
      pmod(xxhash64(col(leftUniqueCol)), lit(factor)).cast("int"))
    val saltedR = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${factor - 1})")))
    saltedL.join(saltedR,
        saltedL(leftKey) === saltedR(rightKey) && saltedL("__salt") === saltedR("__salt"))
      .drop("__salt")
  }

  /** Scale-safe range join: point-in-interval matching via band
    * bucketing, instead of the BroadcastNestedLoopJoin a raw theta join
    * plans. Each point row gets one bucket (`floor(point/width)`); each
    * interval row explodes into the buckets its `[lo, hi]` span overlaps
    * (`ceil(span/width)+1` of them — keep `width >= typical span` so
    * that's ~2). The join is then a plain EQUI-join on the bucket id —
    * shuffle-partitioned, AQE-coalesced, no broadcast requirement, no
    * quadratic pairing — with the exact range predicate re-checked on
    * the paired rows. Output rows are identical to the naive theta join
    * (a point and an interval can only meet in the interval's buckets,
    * and they meet exactly once because the point's bucket is unique).
    *
    * This is the 100 TB shape for band/interval predicates: both sides
    * shuffle on `__bkt`, so a 1000-executor cluster partitions the work
    * by value band instead of replicating one side everywhere.
    */
  def bandedRangeJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    val pb = points.withColumn("__bkt",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__bkt",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, pb("__bkt") === ib("__bkt") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(pb("__bkt")).drop(ib("__bkt"))
  }

  /** Fuzzy SELF-join at edit distance ≤ 1 via the DELETION-NEIGHBORHOOD
    * signature (the SymSpell / FastSS scheme): each string emits itself
    * plus its `len` single-deletion variants, and two strings are within
    * Levenshtein 1 IFF they share a variant — equality shares the
    * identity variant; a substitution pair shares the deletion at the
    * differing position; an insert/delete pair shares the shorter
    * string itself. So the variant equi-join is a LOSSLESS candidate
    * generator and the final `levenshtein(a, b) <= 1` check only
    * removes the false positives (e.g. two deletions landing on the
    * same variant).
    *
    * 100 TB shape: candidates come from ONE shuffle on the variant hash
    * (len+1 rows per string — bounded by string length, never an
    * all-pairs stage or a broadcast of either side); the verify is a
    * per-pair O(len²) DP on matched candidates only. This is the
    * entity-resolution join (near-identical names/SKUs/URLs) that a
    * theta-join `levenshtein(a,b) <= 1` would plan as a quadratic
    * BroadcastNestedLoopJoin.
    */
  def fuzzyEditJoin(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val variants = df.select(col(idCol), col(strCol),
        explode(array_union(array(col(strCol)), expr(
          s"""transform(sequence(1, length($strCol)), i ->
             |  concat(substring($strCol, 1, i - 1),
             |         substring($strCol, i + 1, length($strCol))))""".stripMargin)))
          .as("variant"))
    val va = variants.select(col(idCol).as("id_a"), col(strCol).as("str_a"),
      col("variant"))
    val vb = variants.select(col(idCol).as("id_b"), col(strCol).as("str_b"),
      col("variant"))
    va.join(vb, "variant")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b")).distinct()
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
