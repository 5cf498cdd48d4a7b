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
}
