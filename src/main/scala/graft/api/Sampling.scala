package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mix construction. Both
  * operators avoid `rand()` entirely: the "random" order is a content
  * hash (md5 of the id), so a sample is reproducible run-to-run and
  * engine-to-engine — the property that lets a 100 TB corpus rebuild
  * produce the identical training set, and lets the DuckDB oracle replay
  * the sample bit-for-bit.
  */
object Sampling {

  /** Exact per-stratum fraction sample: within each stratum, rank rows by
    * md5(id) (a fixed pseudo-random total order) and keep the first
    * ceil(frac * |stratum|).
    *
    * Scale shape: one tiny groupBy for the per-stratum counts (broadcast
    * back), one shuffle by stratum for the rank window — strata process in
    * parallel. A single mega-stratum serializes its own sort; when exact
    * per-stratum counts aren't required at that size, the constant-time
    * variant is a pure filter `md5(id) < frac` quantile with no window at
    * all (same hash, no sort) — this function keeps the exact-count
    * contract.
    */
  def stratified(df: DataFrame, idCol: String, strataCols: Seq[String],
                 frac: Double): DataFrame = {
    val counts = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_stratum"))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(counts), strataCols)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= ceil(col("n_stratum") * frac))
  }

  /** Token-budget corpus mix: per stratum, take rows in (score desc, id)
    * order until the running `tokCol` total reaches `budget` — the
    * "fill each language's share of the training mix with its best
    * documents" operator. A row is kept when the budget was not already
    * exhausted BEFORE it (so the first row over the line is kept and the
    * mix always reaches the budget).
    *
    * One shuffle by stratum; the running sum is a window cumsum with an
    * explicit ROWS frame over a unique order key (score, id), so the
    * result is deterministic on any engine.
    */
  def budgetMix(df: DataFrame, idCol: String, strataCols: Seq[String],
                tokCol: String, scoreCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tok", sum(col(tokCol).cast("long")).over(w))
      .filter(col("cum_tok") - col(tokCol) < budget)
  }

  /** Temperature-weighted corpus mix (the T5/mC4/Llama `p_s ∝ n_s^α`
    * language-balancing rule at α = 0.5): each stratum's share of the
    * `totalBudget` token budget is proportional to the SQUARE ROOT of
    * its total token mass, damping head languages and boosting the tail;
    * the share is then filled in md5(id) order (content-keyed — a
    * rebuild reproduces the identical mix).
    *
    * α is fixed at 0.5 deliberately: IEEE-754 requires sqrt to be
    * correctly rounded, so `sqrt(bigint)` is bit-identical on every
    * engine, while a general `pow(x, α)` is not — and this operator's
    * contract is an exactly replayable mix. The rounded weights become
    * integers (floor(sqrt * 1e6)) so the share arithmetic
    * (`totalBudget * w_s / Σw`) is exact integer math with no
    * summation-order sensitivity. The product is computed in
    * DECIMAL(38,0): w_s ≈ 1e6·sqrt(stratum tokens) is ~5e12 at 100 TB
    * scale, so `totalBudget * w_s` overflows a Long for any realistic
    * budget — a decimal intermediate keeps the division exact (the
    * quotient itself always fits a Long because it is ≤ totalBudget).
    *
    * Scale shape: one tiny per-stratum agg (weights, broadcast back) and
    * one shuffle by stratum for the fill window — same as [[budgetMix]].
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCols: Seq[String],
                     tokCol: String, totalBudget: Long): DataFrame = {
    val weights = df.groupBy(strataCols.map(col): _*)
      .agg(floor(sqrt(sum(col(tokCol).cast("long"))) * 1e6).cast("long").as("w_s"))
    val totW = weights.agg(sum(col("w_s")).as("w_tot"))
    val alloc = weights.crossJoin(broadcast(totW))
      .withColumn("alloc_tok",
        expr(s"(cast(${totalBudget} as decimal(38,0)) * w_s) div w_tot"))
      .select(strataCols.map(col) :+ col("alloc_tok"): _*)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(alloc), strataCols)
      .withColumn("cum_tok", sum(col(tokCol).cast("long")).over(w))
      .filter(col("cum_tok") - col(tokCol) < col("alloc_tok"))
  }

  /** Deterministic weighted sample WITHOUT replacement: top-`k` docs by
    * the Efraimidis–Spirakis A-ES key `u^(1/w)` (equivalently
    * Duffield–Lund–Thorup priority sampling under the monotone map
    * `w/(-ln u)`): inclusion probability rises with the integer weight
    * `w`, and the whole draw is a pure function of the ids — the
    * "sample 1M docs token-mass-proportionally from a 100 TB corpus,
    * reproducibly" operator (weight = token count here; any positive
    * integer weight column works).
    *
    * Determinism discipline (the [[Sampling]] header contract, plus the
    * float guard): `u = (h60 + 1) / 2^60` where h60 is the 60-bit md5
    * prefix of the id — the long→double cast rounds to nearest above
    * 2^53 and the power-of-two division is exact, and both engines
    * apply the IDENTICAL rounding, so `u` is bit-identical on every
    * engine (identically rounded, not exact);
    * `pow(u, 1/w)` is libm (engines may differ in the last ulp), so the
    * SORT KEY is the 8-decimal-rounded priority ([[graft.Det.round8]] —
    * 1e-8 granularity keeps weight fidelity near the key's u→1 ceiling
    * where 4 decimals would collapse high-weight docs into one bucket)
    * with the id as the unique tiebreak. A ≤1-ulp libm divergence flips
    * a rounding boundary with probability ~2^-26 per row — the same
    * accepted-risk envelope as every round4 guard in the fleet.
    * WEIGHT CEILING: keep weights below ~1e8 — beyond that the rounded
    * priority saturates at 1.0 (u^(1/w) > 1 − 5e-9 for any u), so
    * very-high-weight rows all tie and are selected by ascending id
    * rather than by weight. Token counts and document byte sizes sit
    * orders of magnitude under the ceiling; weights above it should be
    * rescaled (inclusion probabilities only depend on weight ratios).
    *
    * Scale shape: one narrow projection, then a global top-k that plans
    * as TakeOrderedAndProject — per-partition heaps of size k feeding
    * one k-row driver merge; NO global sort, NO window, NO shuffle of
    * the corpus. k rows is the only thing that ever leaves an executor.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int): DataFrame = {
    require(k >= 1, "weightedSample needs k >= 1")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + lit(1.0)) / lit(1.152921504606846976e18)
    df.withColumn("weight", weightCol.cast("long"))
      .filter(col("weight") >= 1)
      .withColumn("priority",
        graft.Det.round8(pow(u, lit(1.0) / col("weight").cast("double"))))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), col("priority"))
  }

  /** STRATIFIED weighted sample: [[weightedSample]]'s Efraimidis–
    * Spirakis draw run independently inside every stratum — k rows per
    * stratum, inclusion probability within a stratum rising with the
    * integer weight, the whole draw a pure function of the ids (the
    * `corpus_mix` sibling that SAMPLES each language's share instead of
    * budget-filling it with the best-scored docs).
    *
    * Same determinism discipline as [[weightedSample]] (md5 60-bit
    * uniform, round8-guarded A-ES priority, id tiebreak — and the same
    * ~1e8 weight ceiling). Scale shape: ONE shuffle keyed by the
    * stratum columns and a partitioned rank window — strata process in
    * parallel and nothing global is planned (vs [[weightedSample]]'s
    * TakeOrderedAndProject, which this can't use because k applies per
    * stratum, not globally; a mega-stratum serializes only its own
    * window sort, the standard salting candidate).
    */
  def weightedStratified(df: DataFrame, idCol: String, strataCols: Seq[String],
                         weightCol: Column, k: Int): DataFrame = {
    require(k >= 1, "weightedStratified needs k >= 1")
    require(strataCols.nonEmpty, "weightedStratified needs a stratum column")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + lit(1.0)) / lit(1.152921504606846976e18)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("priority").desc, col(idCol))
    df.withColumn("weight", weightCol.cast("long"))
      .filter(col("weight") >= 1)
      .withColumn("priority",
        graft.Det.round8(pow(u, lit(1.0) / col("weight").cast("double"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(strataCols.map(col) ++
        Seq(col("rn"), col(idCol), col("weight"), col("priority")): _*)
  }

  /** The TOKEN-BUDGET table a mixture plan starts from: per stratum,
    * document and whitespace-token totals, the stratum's share of the
    * corpus, and the big-strata-first CUMULATIVE share (rank order:
    * n_tokens desc, then the stratum columns — the "how many strata
    * cover 90% of tokens" read). Strata cardinality is BOUNDED
    * (lang × source — metadata, not content), so the cumulative sum is
    * a broadcast better-count self-join over the aggregated table, the
    * same zero-window idiom as the RRF ranks (Similarity.hybridRrf):
    * one corpus-wide aggregation shuffle, nothing global afterwards.
    * Shares divide exact longs, so the doubles are bit-identical
    * cross-engine before the round4 guard. */
  def tokenBudget(df: DataFrame, strataCols: Seq[String],
                  textCol: String): DataFrame = {
    require(strataCols.nonEmpty, "tokenBudget needs at least one stratum column")
    val g = df
      .withColumn("__nt",
        size(split(coalesce(col(textCol), lit("")), " ")).cast("long"))
      .groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
    val tot = g.agg(sum(col("n_tokens")).as("tot"))
    val other = g.select(strataCols.map(c => col(c).as(s"__o_$c")) :+
      col("n_tokens").as("__o_tokens"): _*)
    // b ranks before-or-equal a: more tokens, or equal tokens and
    // lexicographically <= on the stratum columns (self joins self, so
    // every stratum keeps a row and cum_tokens >= n_tokens)
    // null-safe lexicographic order (nulls first): a NULL stratum value
    // must still self-join, or its row vanishes and cum_share breaks
    def ltNf(a: Column, b: Column): Column =
      (a.isNull && b.isNotNull) || (a < b)
    val tieLe = strataCols.foldRight(lit(true)) { (c, rest) =>
      ltNf(col(s"__o_$c"), col(c)) ||
        (col(s"__o_$c") <=> col(c) && rest)
    }
    val before = (col("__o_tokens") > col("n_tokens")) ||
      (col("__o_tokens") === col("n_tokens") && tieLe)
    g.crossJoin(broadcast(tot))
      .join(broadcast(other), before)
      .groupBy((strataCols.map(col) :+ col("n_docs") :+ col("n_tokens") :+
        col("tot")): _*)
      .agg(sum(col("__o_tokens")).as("cum_tokens"))
      .select(strataCols.map(col) ++ Seq(col("n_docs"), col("n_tokens"),
        graft.Det.round4(col("n_tokens").cast("double") / col("tot")).as("token_share"),
        col("cum_tokens"),
        graft.Det.round4(col("cum_tokens").cast("double") / col("tot")).as("cum_share")): _*)
  }
}
