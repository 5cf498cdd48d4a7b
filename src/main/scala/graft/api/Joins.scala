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

  /** Fuzzy SELF-join at edit distance ≤ `maxDist` (1 or 2) via the
    * DELETION-NEIGHBORHOOD signature (the SymSpell / FastSS scheme):
    * each string emits itself plus every variant obtained by deleting
    * up to `maxDist` characters, and any two strings within Levenshtein
    * `maxDist` share at least one variant (at d = 1: equality shares
    * the identity variant, a substitution pair shares the deletion at
    * the differing position, an insert/delete pair shares the shorter
    * string itself; at d = 2 the same alignment argument applies with
    * up to two deletions on each side). The variant equi-join is
    * therefore a LOSSLESS candidate generator and the exact
    * `levenshtein(a, b) <= maxDist` verify only removes false
    * positives (e.g. unrelated deletions landing on the same variant).
    *
    * 100 TB shape: candidates come from ONE shuffle keyed by the 60-BIT
    * md5 PREFIX of the variant (8-byte keys — the fleet's shingle
    * discipline; an md5 collision only adds a candidate the exact
    * verify removes). Per string that's len+1 keys at d = 1 and
    * O(len²/2) at d = 2 — bounded by string length, never an all-pairs
    * stage or a broadcast of either side. Candidate pairs are pruned by
    * the length-compatibility bound |lenA − lenB| ≤ maxDist BEFORE the
    * pair-level distinct, and the strings themselves rejoin BY ID only
    * for the final levenshtein verify, so the wide payload never rides
    * the candidate shuffle. Skew note: a hot variant (e.g. the empty
    * string shared by every length ≤ maxDist input, or a deletion
    * variant of a very common short token) makes the bucket self-join
    * O(occupancy²) — on real name/SKU data that bucket is a salting
    * candidate exactly like a hot LSH band bucket (see
    * [[Similarity.knnGraph]]'s occupancy-cap treatment).
    */
  def fuzzyEditJoin(df: DataFrame, idCol: String, strCol: String,
                    maxDist: Int = 1): DataFrame = {
    val cand = fuzzyCandidates(df, idCol, strCol, "a", maxDist)
      .join(fuzzyCandidates(df, idCol, strCol, "b", maxDist), "vh")
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .select(col("id_a"), col("id_b")).distinct()
    fuzzyVerify(cand, df, idCol, strCol, df, idCol, strCol, maxDist)
  }

  /** [[fuzzyEditJoin]] with the HOT-VARIANT treatment the scaladoc
    * above names (round-13 verdict item 3 — the same per-bucket
    * occupancy cap as [[Similarity.knnGraphCapped]]): the NEIGHBOR side
    * of each variant-hash bucket is restricted to its `cap`
    * smallest-md5(id) member strings before the candidate join, so a
    * hot variant (the empty string, a deletion of a very common short
    * token) contributes at most `occupancy × cap` candidate pairs
    * instead of occupancy². Candidate volume is then LINEAR in the
    * input at fixed cap — Σ variants × cap — killing the Σocc² term on
    * skewed name/SKU data (BENCH_SCALE measures the exponent drop on a
    * planted hot-token slice).
    *
    * The trade is RECALL, exactly [[Similarity.knnGraphCapped]]'s: a
    * true pair whose higher-id member is evicted from every shared
    * bucket is missed. Representatives are md5-deterministic, so the
    * output is reproducible and the DuckDB oracle replays the capped
    * candidate set bit-for-bit ([[graft.queries.Relational]]'s
    * join_fuzzy_edit_capped key pins it, and PipelineSpec-style recall
    * accounting lives in ApiSpec).
    */
  def fuzzyEditJoinCapped(df: DataFrame, idCol: String, strCol: String,
                          maxDist: Int = 1, cap: Int = 8): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("vh"))
      .orderBy(md5(col("id_b").cast("string")), col("id_b"))
    val capped = fuzzyCandidates(df, idCol, strCol, "b", maxDist)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
    val cand = fuzzyCandidates(df, idCol, strCol, "a", maxDist)
      .join(capped, "vh")
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .select(col("id_a"), col("id_b")).distinct()
    fuzzyVerify(cand, df, idCol, strCol, df, idCol, strCol, maxDist)
  }

  /** A-vs-B fuzzy join (catalog entity resolution: match each left
    * string against a reference catalog at edit distance ≤ `maxDist`).
    * Same deletion-neighborhood candidates, md5-prefix shuffle keys,
    * length-compatibility prune and exact verify as [[fuzzyEditJoin]];
    * output pairs (id_a from `left`, id_b from `right`, dist) keep
    * every match — no self-pair ordering filter.
    */
  def fuzzyEditJoinAB(left: DataFrame, leftId: String, leftStr: String,
                      right: DataFrame, rightId: String, rightStr: String,
                      maxDist: Int = 1): DataFrame = {
    val cand = fuzzyCandidates(left, leftId, leftStr, "a", maxDist)
      .join(fuzzyCandidates(right, rightId, rightStr, "b", maxDist), "vh")
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .select(col("id_a"), col("id_b")).distinct()
    fuzzyVerify(cand, left, leftId, leftStr, right, rightId, rightStr, maxDist)
  }

  /** One side's (id, len, 60-bit variant-hash) keys, deduped per side —
    * the narrow rows the candidate shuffle carries. Deletion variants
    * are generated positionally (ascending index sequences, guarded so
    * short strings emit no degenerate descending ranges) and deduped
    * per string before hashing.
    */
  private def fuzzyCandidates(df: DataFrame, idCol: String, strCol: String,
                              tag: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"fuzzy edit join supports maxDist 1 or 2 (got $maxDist)")
    val s = strCol
    val d1 = s"""if(length($s) < 1, array(),
                |  transform(sequence(1, length($s)), i ->
                |    concat(substring($s, 1, i - 1),
                |           substring($s, i + 1, length($s)))))""".stripMargin
    val d2 = s"""if(length($s) < 2, array(),
                |  flatten(transform(sequence(1, length($s) - 1), i ->
                |    transform(sequence(i + 1, length($s)), j ->
                |      concat(substring($s, 1, i - 1),
                |             substring($s, i + 1, j - i - 1),
                |             substring($s, j + 1, length($s)))))))""".stripMargin
    val all =
      if (maxDist == 1) s"array_distinct(concat(array($s), $d1))"
      else s"array_distinct(concat(array($s), $d1, $d2))"
    // r17: fan out the variant generation (guide §2.5 — the per-row
    // O(len) / O(len²) substring+md5 expansion otherwise runs in one
    // task over a single-split local scan; no-op at scale).
    Scale.fanout(df)
      .select(col(idCol).as(s"id_$tag"),
        length(col(strCol)).as(s"len_$tag"), explode(expr(all)).as("__v"))
      .select(col(s"id_$tag"), col(s"len_$tag"),
        conv(substring(md5(col("__v")), 1, 15), 16, 10).cast("long").as("vh"))
      .distinct()
  }

  /** Join the strings back BY ID onto the (id_a, id_b) candidate pairs
    * and keep exactly the pairs within `maxDist` — the only stage that
    * ever touches the wide string payload.
    */
  private def fuzzyVerify(cand: DataFrame,
                          left: DataFrame, leftId: String, leftStr: String,
                          right: DataFrame, rightId: String, rightStr: String,
                          maxDist: Int): DataFrame =
    cand
      .join(left.select(col(leftId).as("id_a"), col(leftStr).as("__sa")), "id_a")
      .join(right.select(col(rightId).as("id_b"), col(rightStr).as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
}
