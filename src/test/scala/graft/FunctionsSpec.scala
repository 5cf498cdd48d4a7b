package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native VecDot Catalyst expression: bit-parity with the
  * higher-order-function fold it replaces, SQL registration, mixed
  * float/double inputs, and null/edge behavior.
  */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("vec_dot is bit-identical to the zip_with/aggregate fold on real embeddings") {
    val e = Tables.embeddings(spark, sf001).limit(100)
    val both = e.select(
      GraftFunctions.vec_dot(col("embedding"), col("embedding")).as("native"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, x) -> acc + x)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("vec_dot handles mixed float/double arrays and is registered for SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(cast(1.5 as float), cast(2.0 as float)), array(2.0D, 3.0D)) AS d")
      .as[Double].head()
    assert(r == 1.5 * 2.0 + 2.0 * 3.0)
  }

  test("vec_dot: null array yields null; unequal lengths use common prefix") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT vec_dot(cast(null as array<double>), array(1.0D)) AS a,
        |       vec_dot(array(2.0D, 5.0D, 7.0D), array(3.0D)) AS b""".stripMargin)
      .collect().head
    assert(rows.isNullAt(0))
    assert(rows.getDouble(1) == 6.0)
  }

  test("vec_norm matches sqrt of self-dot") {
    val e = Tables.embeddings(spark, sf001).limit(10)
    val bad = e.select((GraftFunctions.vec_norm(col("embedding")) -
      sqrt(GraftFunctions.vec_dot(col("embedding"), col("embedding")))).as("d"))
      .filter(col("d") =!= 0.0)
    assert(bad.count() == 0)
  }
}
