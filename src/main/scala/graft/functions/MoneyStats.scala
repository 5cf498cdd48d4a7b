package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Intermediate state for [[MoneyStatsAgg]]. The sum is kept in exact
  * integer cents so that reduce/merge are associative and commutative —
  * the property that makes the aggregate re-aggregable (partial per
  * partition, merge at the exchange) with a bit-stable result regardless
  * of partitioning. A double-accumulating buffer would make the answer
  * depend on row order and partition count.
  */
case class MoneyStatsBuf(n: Long, sumCents: Long, mn: Double, mx: Double)

/** Final result of [[MoneyStatsAgg]], flattened into the output row. */
case class MoneyStatsOut(n_items: Long, sum_price: Double,
                         min_price: Double, max_price: Double)

/** Custom typed UDAF — the SURVEY §2.L `Aggregator` extension surface.
  *
  * Exact money statistics (count, sum, min, max) over a two-decimal
  * money-valued double column. Input values are converted to integer
  * cents with `rint(v*100)` — exact for any money value below 2^52
  * cents — mirroring the engine-wide DECIMAL(12,2) discipline
  * (`Det.sumMoney`), so the finished `sum_price` bit-matches DuckDB's
  * `CAST(sum(CAST(x AS DECIMAL(12,2))) AS DOUBLE)`: both sides correctly
  * round the exact rational sumCents/100 to the nearest double.
  *
  * Registered through `functions.udaf(...)` (Column API) and
  * `spark.udf.register` (SQL name `money_stats`) by the `agg_udaf` query.
  */
object MoneyStatsAgg extends Aggregator[Double, MoneyStatsBuf, MoneyStatsOut] {

  private def cents(v: Double): Long = math.rint(v * 100).toLong

  override def zero: MoneyStatsBuf =
    MoneyStatsBuf(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity)

  override def reduce(b: MoneyStatsBuf, v: Double): MoneyStatsBuf =
    MoneyStatsBuf(b.n + 1, b.sumCents + cents(v), math.min(b.mn, v), math.max(b.mx, v))

  override def merge(a: MoneyStatsBuf, b: MoneyStatsBuf): MoneyStatsBuf =
    MoneyStatsBuf(a.n + b.n, a.sumCents + b.sumCents,
      math.min(a.mn, b.mn), math.max(a.mx, b.mx))

  override def finish(b: MoneyStatsBuf): MoneyStatsOut =
    MoneyStatsOut(b.n, b.sumCents / 100.0, b.mn, b.mx)

  override def bufferEncoder: Encoder[MoneyStatsBuf] = Encoders.product[MoneyStatsBuf]
  override def outputEncoder: Encoder[MoneyStatsOut] = Encoders.product[MoneyStatsOut]
}
