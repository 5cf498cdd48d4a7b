package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Intermediate state for [[FreqSketchAgg]]: at most `k` counters plus
  * the total item count. Kept as parallel Seqs so the buffer is
  * product-encodable (Tungsten row, no kryo).
  */
case class FreqSketchBuf(n: Long, keys: Seq[String], cnts: Seq[Long])

/** Final result: the surviving counters (term -> estimate) plus the
  * total item count the bound is stated against.
  */
case class FreqSketchOut(total: Long, terms: Seq[String], ests: Seq[Long])

/** Mergeable frequent-items sketch (Misra–Gries summary) — the third
  * classic bounded-state re-aggregable sketch next to HLL distinct
  * (`agg_hll_partial_union` / `agg_approx_distinct`) and Greenwald–Khanna
  * quantiles (`agg_approx_percentile`). At 100 TB this is how "top terms
  * per group" runs without materializing the full term histogram: each
  * partition keeps at most `k` counters, partials merge associatively at
  * the exchange, and the guarantee
  *
  *   true_count - n/(k+1) <= estimate <= true_count
  *
  * holds for every item (Misra–Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012: sum counters, then subtract the
  * (k+1)-th largest value and drop non-positive). Any item with true
  * frequency above n/(k+1) is guaranteed present. Estimates (not the
  * bound) depend on merge order, so the declared query is rows-only —
  * the bounds and completeness are property-tested instead
  * (FunctionsSpec).
  */
class FreqSketchAgg(k: Int) extends Aggregator[String, FreqSketchBuf, FreqSketchOut] {
  require(k > 0, s"k must be positive (got $k)")

  override def zero: FreqSketchBuf = FreqSketchBuf(0L, Nil, Nil)

  override def reduce(b: FreqSketchBuf, item: String): FreqSketchBuf = {
    val i = b.keys.indexOf(item)
    if (i >= 0)
      FreqSketchBuf(b.n + 1, b.keys, b.cnts.updated(i, b.cnts(i) + 1))
    else if (b.keys.size < k)
      FreqSketchBuf(b.n + 1, b.keys :+ item, b.cnts :+ 1L)
    else {
      // all k counters occupied: decrement everyone (the classic MG
      // step — equivalent to deleting k+1 distinct items at once)
      val dec = b.cnts.map(_ - 1)
      val kept = b.keys.zip(dec).filter(_._2 > 0)
      FreqSketchBuf(b.n + 1, kept.map(_._1), kept.map(_._2))
    }
  }

  override def merge(a: FreqSketchBuf, b: FreqSketchBuf): FreqSketchBuf = {
    val summed = (a.keys.zip(a.cnts) ++ b.keys.zip(b.cnts))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }.toSeq
    val trimmed =
      if (summed.size <= k) summed
      else {
        val cut = summed.map(_._2).sorted(Ordering[Long].reverse)(k)
        summed.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0)
      }
    // deterministic buffer layout: order never affects estimates, but a
    // canonical order keeps runs reproducible
    val sorted = trimmed.sortBy { case (t, c) => (-c, t) }
    FreqSketchBuf(a.n + b.n, sorted.map(_._1), sorted.map(_._2))
  }

  override def finish(b: FreqSketchBuf): FreqSketchOut =
    FreqSketchOut(b.n, b.keys, b.cnts)

  override def bufferEncoder: Encoder[FreqSketchBuf] = Encoders.product[FreqSketchBuf]
  override def outputEncoder: Encoder[FreqSketchOut] = Encoders.product[FreqSketchOut]
}
