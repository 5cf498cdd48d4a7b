package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, expr,
  greatest, lit, max, min, shiftleft, shiftright, sum}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Source/sink surface (SURVEY §2.A): batch + streaming readers over the
  * lake formats and the sink shapes a pipeline needs. Thin by design —
  * Spark's DataSource V2 does the real work (vectorized parquet scan,
  * pushdown, partition pruning); these helpers pin the engine's
  * conventions (explicit schemas for streams, UTC, directory layout).
  */
object Sources {
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Unbounded file stream over a directory (new files picked up per
    * micro-batch). Streams require explicit schemas.
    */
  def parquetStream(spark: SparkSession, path: String, schema: StructType,
                    globFilter: Option[String] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    globFilter.fold(r)(g => r.option("pathGlobFilter", g)).parquet(path)
  }

  /** Synthetic benchmark stream (rowsPerSecond), Flink's datagen analog. */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
}

/** Sink shapes. Partitioned parquet is the 100 TB default: the partition
  * column prunes reads and bounds file sizes; for streams, exactly-once
  * via checkpointed file sink.
  */
object Sinks {
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table — the co-located-join layout. Two
    * tables bucketed by their join key with the same bucket count join
    * WITHOUT any exchange (each task zips bucket i with bucket i): at
    * 100 TB this turns the recurring fact-fact join from a full shuffle
    * of both sides into a local merge, the single biggest win for a
    * repeatedly-joined lakehouse layout. (ApiSpec asserts the plan is
    * exchange-free.)
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Deterministic compaction PLAN (round-12 item 8 — the
    * contract-gated sibling of [[compactParquet]]): per `prefixCols`
    * group, the row count, total content bytes, and the planned
    * rewrite file count `ceil(bytes / targetBytes)` (min 1) — PURE
    * INTEGER arithmetic over `bytesExpr` (e.g.
    * `octet_length(text) + overhead`), so the whole table replays
    * bit-exactly in DuckDB. [[compactParquet]] itself sizes from
    * engine statistics (fast, not replayable); a maintenance scheduler
    * plans from THIS table — which prefixes are worth rewriting, into
    * how many files — and the plan is what the correctness contract
    * gates. Scale shape: one hash aggregation on the prefix columns,
    * partial+final; no shuffle beyond the prefix-keyed exchange. */
  def compactPlan(df: DataFrame, prefixCols: Seq[String],
                  bytesExpr: Column, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    df.groupBy(prefixCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(bytesExpr.cast("long")).as("total_bytes"))
      .withColumn("n_files",
        greatest(lit(1L), expr(
          s"CAST((total_bytes + ${targetBytes - 1}) DIV $targetBytes AS BIGINT)")))
  }

  /** Z-ORDER layout PLAN (the multi-dimensional clustering sibling of
    * [[compactPlan]] — Delta/Iceberg `OPTIMIZE ZORDER BY (x, y)`):
    * each dimension is bucketed into `2^bits` equal-width ranges from
    * the global min/max (a tiny broadcast agg), the bucket bits are
    * interleaved into the Morton key `z`, and the output is the
    * per-z-cell file table — row count plus each dimension's min/max,
    * the exact column statistics a reader's file-skipping consults.
    * Laying files out by `z` makes a range predicate on EITHER
    * dimension prune ~sqrt of the files (versus pruning nothing on the
    * second dimension under a single-column sort) — the standard
    * two-predicate lakehouse layout win.
    *
    * Determinism: bucketing is pure OVERFLOW-FREE integer arithmetic —
    * bucket = `(x - min) div width` with `width = (max - min) div
    * 2^bits + 1` (for span = k·n + r, r < n: width = k+1 and
    * span div (k+1) = (kn+r) div (k+1) <= n-1, so the bucket never
    * reaches `2^bits` and no clamp is needed; crucially there is NO
    * `span * 2^bits` multiply, the overflow source a
    * multiply-then-divide formulation would add). PRECONDITION: each
    * dimension's value span `max - min` must itself fit a signed Long
    * (< 2^63) — the raw subtractions `x - min` / `max - min` wrap past
    * that, silently corrupting bucket assignment. That holds for every
    * realistic clustering dimension (ids, cents, epoch micros all live
    * far inside one sign's half-range); a dimension mixing values near
    * both Long extremes must be range-reduced by the caller first. The
    * interleave is shifts/ands — the whole table replays bit-exactly
    * in DuckDB. Scale shape: one broadcast min/max agg + one hash
    * aggregation keyed by the 2^(2*bits)-cell z value; the actual
    * rewrite this plan drives is a `repartitionByRange(z)` write,
    * never a global sort of the data here. */
  def zorderPlan(df: DataFrame, xCol: Column, yCol: Column,
                 bits: Int): DataFrame =
    withZ(df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y")),
        col("x"), col("y"), bits)
      .groupBy(col("z"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))

  /** The z-cell assignment shared by [[zorderPlan]] and [[zorderWrite]]:
    * appends `__zx`/`__zy` (the cast dimensions) and the Morton key `z`
    * to `df`'s rows — same overflow-free integer bucketing and shift/and
    * interleave, so the plan and the write can never disagree on a
    * row's cell. */
  private def withZ(df: DataFrame, xCol: Column, yCol: Column,
                    bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16]: $bits")
    val n = 1L << bits
    val d = df.withColumn("__zx", xCol.cast("long"))
      .withColumn("__zy", yCol.cast("long"))
    val mm = d.agg(min(col("__zx")).as("__mnx"), max(col("__zx")).as("__mxx"),
      min(col("__zy")).as("__mny"), max(col("__zy")).as("__mxy"))
    val b = d.crossJoin(broadcast(mm))
      .withColumn("__bx",
        expr(s"CAST((__zx - __mnx) DIV ((__mxx - __mnx) DIV $n + 1) AS BIGINT)"))
      .withColumn("__by",
        expr(s"CAST((__zy - __mny) DIV ((__mxy - __mny) DIV $n + 1) AS BIGINT)"))
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(col("__bx"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(col("__by"), i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
    b.withColumn("z", z)
      .drop("__mnx", "__mxx", "__mny", "__mxy", "__bx", "__by")
  }

  /** THREE-dimension [[zorderPlan]] (`OPTIMIZE ZORDER BY (x, y, w)` —
    * the common lakehouse shape clusters 2-4 columns): the same
    * overflow-free equal-width bucketing per dimension (same span
    * < 2^63 precondition), bits interleaved x→3i+2, y→3i+1, w→3i into
    * a Morton key of ≤ 2^(3·bits) cells, aggregated to the per-cell
    * file table with every dimension's min/max. A range predicate on
    * ANY ONE of the three dimensions prunes ~cells^(2/3) of the files
    * (vs nothing on the second and third under a single-column sort).
    * Same metadata-sized scale shape as [[zorderPlan]].
    */
  def zorderPlan3(df: DataFrame, xCol: Column, yCol: Column, wCol: Column,
                  bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 10, s"bits must be in [1,10]: $bits")
    val n = 1L << bits
    val d = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"),
      wCol.cast("long").as("w"))
    val mm = d.agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"),
      min(col("w")).as("mnw"), max(col("w")).as("mxw"))
    val b = d.crossJoin(broadcast(mm))
      .withColumn("bx",
        expr(s"CAST((x - mnx) DIV ((mxx - mnx) DIV $n + 1) AS BIGINT)"))
      .withColumn("by",
        expr(s"CAST((y - mny) DIV ((mxy - mny) DIV $n + 1) AS BIGINT)"))
      .withColumn("bw",
        expr(s"CAST((w - mnw) DIV ((mxw - mnw) DIV $n + 1) AS BIGINT)"))
    val z = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(col("bx"), i).bitwiseAND(lit(1L)), 3 * i + 2),
        shiftleft(shiftright(col("by"), i).bitwiseAND(lit(1L)), 3 * i + 1),
        shiftleft(shiftright(col("bw"), i).bitwiseAND(lit(1L)), 3 * i))
    }.reduce(_ + _)
    b.withColumn("z", z)
      .groupBy(col("z"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        min(col("w")).as("min_w"), max(col("w")).as("max_w"))
  }

  /** The DuckDB replay of [[zorderPlan3]] — same bucketing, same
    * 3-way shift/and interleave. */
  def zorderPlan3OracleSql(table: String, xSql: String, ySql: String,
                           wSql: String, bits: Int): String = {
    val n = 1L << bits
    val z = (0 until bits).flatMap(i => Seq(
      s"(((bx >> $i) & 1) << ${3 * i + 2})",
      s"(((b_y >> $i) & 1) << ${3 * i + 1})",
      s"(((bw >> $i) & 1) << ${3 * i})")).mkString(" + ")
    s"""WITH d AS (SELECT CAST($xSql AS BIGINT) AS x,
       |                  CAST($ySql AS BIGINT) AS y,
       |                  CAST($wSql AS BIGINT) AS w FROM $table),
       |mm AS (SELECT min(x) AS mnx, max(x) AS mxx,
       |              min(y) AS mny, max(y) AS mxy,
       |              min(w) AS mnw, max(w) AS mxw FROM d),
       |b AS (SELECT x, y, w,
       |        CAST((x - mnx) // ((mxx - mnx) // $n + 1) AS BIGINT) AS bx,
       |        CAST((y - mny) // ((mxy - mny) // $n + 1) AS BIGINT) AS b_y,
       |        CAST((w - mnw) // ((mxw - mnw) // $n + 1) AS BIGINT) AS bw
       |      FROM d CROSS JOIN mm)
       |SELECT CAST($z AS BIGINT) AS z, count(*) AS n_rows,
       |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
       |  min(w) AS min_w, max(w) AS max_w
       |FROM b GROUP BY 1 ORDER BY z""".stripMargin
  }

  /** EXECUTE the z-order layout end-to-end (the write [[zorderPlan]]
    * plans, round-12 verdict item 6): assign every row its Morton cell,
    * PACK cells (in z order) into files of ~`targetRows` rows with the
    * [[compactPlan]] cumulative arithmetic, physically write one
    * parquet file per planned file (`repartition(zfile)` +
    * `partitionBy(zfile)` — every zfile's rows land in exactly one
    * task, so each directory holds exactly one part-file), then read
    * the directory back and return the PER-FILE statistics table
    * (zfile, n_rows, min/max per dimension) — the column min/max a
    * footer-consulting reader's file-skip actually sees (ApiSpec
    * additionally re-reads the raw parquet FOOTERS and pins them equal
    * to this table, and that both range predicates prune files there).
    *
    * Determinism: cell assignment is [[withZ]]'s integer arithmetic;
    * the cell→file packing is a better-count broadcast join over the
    * ≤ 2^(2·bits) plan rows (cum_before DIV targetRows — no window, no
    * global sort); the row payload written is immaterial to the
    * returned stats. Scale shape: one broadcast min/max agg, one
    * metadata-sized packing join, ONE data shuffle (the repartition by
    * zfile — exactly the `repartitionByRange`-style clustered rewrite a
    * lakehouse OPTIMIZE runs), and a scan of the written files for the
    * stats read-back.
    */
  def zorderWrite(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
                  targetRows: Long, path: String): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val spark = df.sparkSession
    val zd = withZ(df, xCol, yCol, bits)
    val plan = zd.groupBy(col("z")).agg(count(lit(1)).as("n_rows"))
    val files = plan.as("a")
      .join(broadcast(plan.as("b")), col("b.z") < col("a.z"), "left_outer")
      .groupBy(col("a.z").as("z"))
      .agg(coalesce(sum(col("b.n_rows")), lit(0L)).as("cum_before"))
      .withColumn("zfile", expr(s"CAST(cum_before DIV $targetRows AS BIGINT)"))
      .select("z", "zfile")
    zd.join(broadcast(files), "z")
      .repartition(col("zfile"))
      .write.mode("overwrite").partitionBy("zfile").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("zfile").cast("long").as("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__zx")).as("min_x"), max(col("__zx")).as("max_x"),
        min(col("__zy")).as("min_y"), max(col("__zy")).as("max_y"))
  }

  /** The DuckDB replay of [[zorderWrite]]'s returned stats table: the
    * same cell assignment, the same better-count packing, the same
    * per-file aggregation — written-layout statistics predicted purely
    * from the data. */
  def zorderWriteOracleSql(table: String, xSql: String, ySql: String,
                           bits: Int, targetRows: Long): String = {
    val n = 1L << bits
    val z = (0 until bits).map(i =>
      s"(((bx >> $i) & 1) << ${2 * i + 1}) + (((b_y >> $i) & 1) << ${2 * i})")
      .mkString(" + ")
    s"""WITH d AS (SELECT CAST($xSql AS BIGINT) AS x,
       |                  CAST($ySql AS BIGINT) AS y FROM $table),
       |mm AS (SELECT min(x) AS mnx, max(x) AS mxx,
       |              min(y) AS mny, max(y) AS mxy FROM d),
       |b AS (SELECT x, y,
       |        CAST((x - mnx) // ((mxx - mnx) // $n + 1) AS BIGINT) AS bx,
       |        CAST((y - mny) // ((mxy - mny) // $n + 1) AS BIGINT) AS b_y
       |      FROM d CROSS JOIN mm),
       |zz AS (SELECT CAST($z AS BIGINT) AS z, x, y FROM b),
       |plan AS (SELECT z, count(*) AS n_rows FROM zz GROUP BY z),
       |cum AS (SELECT a.z, CAST(coalesce(sum(c.n_rows), 0) AS BIGINT) AS cum_before
       |        FROM plan a LEFT JOIN plan c ON c.z < a.z GROUP BY a.z),
       |f AS (SELECT z, CAST(cum_before // $targetRows AS BIGINT) AS zfile FROM cum)
       |SELECT f.zfile, count(*) AS n_rows,
       |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
       |FROM zz JOIN f USING (z) GROUP BY f.zfile ORDER BY zfile""".stripMargin
  }

  /** File-skip EFFECTIVENESS of a [[zorderPlan]] layout: for one range
    * predicate per dimension, the cells (= files) and rows a
    * min/max-consulting reader would scan — the measurement that
    * justifies the layout (each dimension's predicate should prune a
    * large fraction of cells; a single-column sort prunes only its own
    * column). A cell survives dimension d's predicate `[lo, hi]` iff
    * NOT (max_d < lo OR min_d > hi) — exactly parquet row-group /
    * manifest pruning arithmetic. Input is the (tiny) plan table, so
    * this is two scans of ≤ 2^(2*bits) rows. */
  def zorderPruneStats(plan: DataFrame, xLo: Long, xHi: Long,
                       yLo: Long, yHi: Long): DataFrame = {
    val tot = plan.agg(count(lit(1)).as("cells_total"),
      sum(col("n_rows")).as("rows_total"))
    def dim(name: String, mnC: String, mxC: String, lo: Long, hi: Long) =
      plan.filter(!(col(mxC) < lo || col(mnC) > hi))
        .agg(count(lit(1)).as("cells_scanned"),
          coalesce(sum(col("n_rows")), lit(0L)).as("rows_scanned"))
        .withColumn("dim", lit(name))
    dim("x", "min_x", "max_x", xLo, xHi)
      .unionByName(dim("y", "min_y", "max_y", yLo, yHi))
      .crossJoin(broadcast(tot))
      .select(col("dim"), col("cells_total"), col("cells_scanned"),
        col("rows_total"), col("rows_scanned"))
  }

  /** The DuckDB replay of [[zorderPlan]]: identical integer bucketing
    * and the same shift/and Morton interleave, generated from the same
    * `bits`. `xSql`/`ySql` must be integer-valued expressions over
    * `table` matching the Spark side's cast-to-long inputs. */
  def zorderPlanOracleSql(table: String, xSql: String, ySql: String,
                          bits: Int): String = {
    val n = 1L << bits
    val z = (0 until bits).map(i =>
      s"(((bx >> $i) & 1) << ${2 * i + 1}) + (((b_y >> $i) & 1) << ${2 * i})")
      .mkString(" + ")
    s"""WITH d AS (SELECT CAST($xSql AS BIGINT) AS x,
       |                  CAST($ySql AS BIGINT) AS y FROM $table),
       |mm AS (SELECT min(x) AS mnx, max(x) AS mxx,
       |              min(y) AS mny, max(y) AS mxy FROM d),
       |b AS (SELECT x, y,
       |        CAST((x - mnx) // ((mxx - mnx) // $n + 1) AS BIGINT) AS bx,
       |        CAST((y - mny) // ((mxy - mny) // $n + 1) AS BIGINT) AS b_y
       |      FROM d CROSS JOIN mm)
       |SELECT CAST($z AS BIGINT) AS z, count(*) AS n_rows,
       |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
       |FROM b GROUP BY 1 ORDER BY z""".stripMargin
  }

  /** The DuckDB replay of [[zorderPruneStats]] over [[zorderPlan]]'s
    * replay — same survive-iff-not-disjoint arithmetic per dimension. */
  def zorderPruneOracleSql(table: String, xSql: String, ySql: String,
                           bits: Int, xLo: Long, xHi: Long,
                           yLo: Long, yHi: Long): String = {
    val planSql = zorderPlanOracleSql(table, xSql, ySql, bits)
    s"""WITH plan AS (SELECT * FROM ($planSql)),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS cells_total,
       |               CAST(sum(n_rows) AS BIGINT) AS rows_total FROM plan),
       |dx AS (SELECT 'x' AS dim, CAST(count(*) AS BIGINT) AS cells_scanned,
       |         CAST(coalesce(sum(n_rows), 0) AS BIGINT) AS rows_scanned
       |       FROM plan WHERE NOT (max_x < $xLo OR min_x > $xHi)),
       |dy AS (SELECT 'y' AS dim, CAST(count(*) AS BIGINT) AS cells_scanned,
       |         CAST(coalesce(sum(n_rows), 0) AS BIGINT) AS rows_scanned
       |       FROM plan WHERE NOT (max_y < $yLo OR min_y > $yHi)),
       |u AS (SELECT * FROM dx UNION ALL SELECT * FROM dy)
       |SELECT dim, cells_total, cells_scanned, rows_total, rows_scanned
       |FROM u CROSS JOIN tot ORDER BY dim""".stripMargin
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files (min 1). The post-ingest
    * maintenance pass that keeps scan task count proportional to DATA
    * SIZE instead of ingest micro-batch count — after a month of
    * streaming appends, a 100 TB table is millions of KB-sized files and
    * every scan pays per-file open cost until this runs. Returns the
    * output file count.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (((bytes + targetBytes - 1) / targetBytes) max BigInt(1)).toInt
    df.repartition(n).write.mode("overwrite").parquet(outPath)
    n
  }

  /** Append-mode streaming parquet sink with checkpoint (exactly-once). */
  def streamToParquet(df: DataFrame, path: String,
                      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
