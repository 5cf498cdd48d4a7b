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

  test("GraftExtensions injects the native functions for pure-SQL sessions") {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.applyFunctionExtensions(spark, new GraftExtensions())
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       minhash_sig(array(7L, 8L))[0] AS m0,
        |       simhash_sig(array(5L)) AS sh,
        |       md5_prefix(array('a'), 8)[0] AS mp""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    // parity with the Column-API forms of the same expressions
    val expect = spark.range(1).select(
      graft.functions.Signatures.minhash_sig(array(lit(7L), lit(8L)), 64)(0).as("m0"),
      graft.functions.Signatures.simhash_sig(array(lit(5L))).as("sh"),
      graft.functions.Signatures.md5_prefix(array(lit("a")), 8)(0).as("mp"))
      .collect().head
    assert(r.getLong(1) == expect.getLong(0))
    assert(r.getLong(2) == expect.getLong(1))
    assert(r.getLong(3) == expect.getLong(2))
  }

  test("lsh_bucket_sig is bit-identical to the aggregate/zip_with fold") {
    import graft.api.Similarity
    import graft.functions.Signatures
    val (tables, bits, dim) = (8, 6, 64)
    val planes = Similarity.lshPlanes(tables, bits, dim)
    val e = Tables.embeddings(spark, sf001)
      .withColumn("q",
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000.0 + 0.5) as bigint))"))
    def hofBucket(t: Int) = (0 until bits).map { j =>
      val pl = planes(t * bits + j).mkString(",")
      when(expr(s"aggregate(zip_with(q, array($pl), (x, y) -> x * y), " +
        s"cast(0 as bigint), (a, x) -> a + x)") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val both = e.select(
      Signatures.lsh_bucket_sig(col("embedding"), planes, tables, bits).as("native"),
      array((0 until tables).map(hofBucket): _*).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("pq_code_sig / pq_adc_sig are bit-identical to the HOF formulation, codes = argmin of table") {
    import graft.api.Similarity
    import graft.functions.Signatures
    val (m, kc, sd) = (8, 16, 8)
    val cb = Similarity.pqCodebooks(m, kc, sd)
    val e = Tables.embeddings(spark, sf001)
      .withColumn("q",
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000.0 + 0.5) as bigint))"))
    // independent HOF reference: per (sub, cent) squared L2 on the
    // quantized ints, codes as strict-< argmin scan
    def hofDist(s: Int, c: Int) = {
      val cv = (0 until sd).map(d => cb((s * kc + c) * sd + d)).mkString(",")
      expr(s"aggregate(zip_with(slice(q, ${s * sd + 1}, $sd), array($cv), " +
        s"(x, y) -> (x - y) * (x - y)), cast(0 as bigint), (a, x) -> a + x)")
    }
    val adcRef = array((for (s <- 0 until m; c <- 0 until kc) yield hofDist(s, c)): _*)
    val both = e.select(
      Signatures.pq_code_sig(col("embedding"), cb, m, kc, sd).as("codes"),
      Signatures.pq_adc_sig(col("embedding"), cb, m, kc, sd).as("adc"),
      adcRef.as("adc_ref"))
    assert(both.filter(col("adc") =!= col("adc_ref")).count() == 0,
      "native ADC table diverged from the HOF fold")
    // codes must be the argmin (lowest index on ties) of the ADC table
    val codeCheck = both.withColumn("bad",
      (0 until m).map { s =>
        val want = expr(s"array_position(slice(adc, ${s * kc + 1}, $kc), " +
          s"array_min(slice(adc, ${s * kc + 1}, $kc))) - 1")
        when(element_at(col("codes"), s + 1) =!= want, lit(1)).otherwise(lit(0))
      }.reduce(_ + _))
    assert(codeCheck.filter(col("bad") > 0).count() == 0,
      "native codes diverged from the ADC argmin")
  }

  test("MoneyStatsAgg: partial/merge equals single-pass reduce, any split") {
    import graft.functions.MoneyStatsAgg
    val vs = Seq(12.34, 0.01, 999.99, 500.00, 3.30, 77.70, 12.34)
    val single = vs.foldLeft(MoneyStatsAgg.zero)(MoneyStatsAgg.reduce)
    for (cut <- 0 to vs.size) {
      val (l, r) = vs.splitAt(cut)
      val merged = MoneyStatsAgg.merge(
        l.foldLeft(MoneyStatsAgg.zero)(MoneyStatsAgg.reduce),
        r.foldLeft(MoneyStatsAgg.zero)(MoneyStatsAgg.reduce))
      assert(merged == single, s"split at $cut diverged")
    }
    val out = MoneyStatsAgg.finish(single)
    assert(out.n_items == 7 && out.sum_price == 1605.68 &&
      out.min_price == 0.01 && out.max_price == 999.99)
  }

  test("agg_udaf is partitioning-invariant and matches built-in aggregates") {
    import graft.functions.MoneyStatsAgg
    val ms = udaf(MoneyStatsAgg)
    val li = Tables.lineitem(spark, sf001)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag").agg(ms(col("l_extendedprice")).as("m"))
        .select(col("l_returnflag"), col("m.n_items"), col("m.sum_price"),
          col("m.min_price"), col("m.max_price"))
        .orderBy("l_returnflag").collect().toSeq
    assert(run(li.repartition(1)) == run(li.repartition(17)))
    val builtin = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), Det.sumMoney(col("l_extendedprice")).as("sum_price"),
        min(col("l_extendedprice")).as("min_price"), max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag").collect().toSeq
    assert(run(li) == builtin)
  }

  test("md5_prefix is bit-identical to conv(substring(md5)) on real shingles") {
    import graft.functions.Signatures
    val t = Tables.documents(spark, sf001).limit(100)
      .select(array_distinct(split(col("text"), " ")).as("toks"))
    for (nib <- Seq(8, 15)) {
      val bad = t.select(
          Signatures.md5_prefix(col("toks"), nib).as("native"),
          expr(s"transform(toks, t -> cast(conv(substring(md5(t), 1, $nib), 16, 10) as bigint))").as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(bad.count() == 0, s"md5_prefix($nib) diverged from conv/md5")
    }
  }

  test("minhash_sig_mod is bit-identical to the array_min(transform) formulation") {
    import graft.api.Dedup
    import graft.functions.Signatures
    val permMins = (0 until 64).map(i =>
      s"array_min(transform(hs, h -> (${Dedup.minhashA(i)}L * (h % ${Dedup.MinhashP}L) + ${Dedup.minhashB(i)}L) % ${Dedup.MinhashP}L))")
      .mkString("array(", ", ", ")")
    val t = Tables.documents(spark, sf001).limit(100)
      .select(Signatures.md5_prefix(array_distinct(split(col("text"), " ")), 8).as("hs"))
    val bad = t.select(
        Signatures.minhash_sig_mod(col("hs"), Dedup.minhashA, Dedup.minhashB,
          Dedup.MinhashP).as("native"),
        expr(permMins).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(bad.count() == 0)
  }

  test("simhash_sig_strict matches the interpreted majority fold (60-bit)") {
    import graft.functions.Signatures
    val t = Tables.documents(spark, sf001).limit(100)
      .select(Signatures.md5_prefix(array_distinct(split(col("text"), " ")), 15).as("hs"))
    val hof =
      """aggregate(hs, array_repeat(cast(0 as bigint), 60),
        |  (acc, h) -> zip_with(acc, sequence(0, 59),
        |    (c, b) -> c + case when (shiftright(h, b) & 1) = 1 then 1 else -1 end),
        |  acc -> aggregate(zip_with(acc, sequence(0, 59),
        |    (c, b) -> case when c > 0 then shiftleft(cast(1 as bigint), b)
        |              else cast(0 as bigint) end),
        |    cast(0 as bigint), (s, x) -> s + x))""".stripMargin
    val bad = t.select(
        Signatures.simhash_sig_strict(col("hs"), 60).as("native"),
        expr(hof).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(bad.count() == 0)
  }

  test("vec_norm matches sqrt of self-dot") {
    val e = Tables.embeddings(spark, sf001).limit(10)
    val bad = e.select((GraftFunctions.vec_norm(col("embedding")) -
      sqrt(GraftFunctions.vec_dot(col("embedding"), col("embedding")))).as("d"))
      .filter(col("d") =!= 0.0)
    assert(bad.count() == 0)
  }

  test("md5_prefix SQL builder rejects a non-literal nibbles argument clearly") {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.applyFunctionExtensions(spark, new GraftExtensions())
    val err = intercept[Exception] {
      spark.sql("SELECT md5_prefix(array('a'), cast(id as int)) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("integer literal"),
      s"expected the clear literal-required error, got: ${err.getMessage}")
  }

  test("FreqSketchAgg: MG error bound and heavy-hitter completeness vs exact counts") {
    import graft.functions.{FreqSketchAgg, FreqSketchOut}
    val k = 8
    val toks = Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("term"))
    val exact = toks.groupBy("term").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val mg = udaf(new FreqSketchAgg(k))
    val out = toks.agg(mg(col("term")).as("sk")).select("sk.*")
      .as[FreqSketchOut].head()
    assert(out.total == n, "total must count every item exactly")
    assert(out.terms.size <= k, "at most k counters survive")
    val est = out.terms.zip(out.ests).toMap
    // Misra-Gries guarantee: true - n/(k+1) <= est <= true
    est.foreach { case (t, e) =>
      val tr = exact(t)
      assert(e <= tr && tr - e <= n / (k + 1), s"term $t: est=$e true=$tr n=$n")
    }
    // completeness: anything above the n/(k+1) threshold must be present
    val missing = exact.filter(_._2 > n / (k + 1)).keySet -- est.keySet
    assert(missing.isEmpty, s"heavy hitters absent from sketch: $missing")
  }

  test("HLL partial-union: two-level merge equals one-level sketch, near exact distinct") {
    val ev = Tables.events(spark, sf001)
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("one_level"))
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("two_level"))
    val joined = direct.join(daily, "event_type")
    // register-max merging is associative: pre-aggregating by day then
    // unioning must give the identical estimate
    assert(joined.filter(col("one_level") =!= col("two_level")).count() == 0,
      "HLL union must be merge-order independent")
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("ex"))
    val offBy = direct.join(exact, "event_type")
      .select((abs(col("one_level") - col("ex")) / col("ex")).as("rel"))
      .agg(max("rel")).as[Double].head()
    assert(offBy <= 0.05, s"HLL estimate off by $offBy > 5%")
  }

  test("pqTrainCodebooks: deterministic, and beats the md5 stand-in on its training corpus") {
    import graft.api.Similarity
    import graft.functions.Signatures
    val (m, kc, sd) = (8, 16, 8)
    val e = Tables.embeddings(spark, sf001)
    val trained = Similarity.pqTrainCodebooks(e, "vec_id", "embedding", m, kc, sd)
    // determinism: seeded init + fixed rounds + exact integer means
    assert(trained === Similarity.pqTrainCodebooks(e, "vec_id", "embedding", m, kc, sd))
    // fit: total squared quantization error (sum over rows and subspaces
    // of the distance to the assigned centroid = min of the ADC table)
    // must beat the data-blind md5 codebooks on the training corpus
    def sqErr(cb: IndexedSeq[Long]): Long = {
      val minSum = (0 until m).map(s =>
        expr(s"array_min(slice(adc, ${s * kc + 1}, $kc))")).reduce(_ + _)
      e.select(Signatures.pq_adc_sig(col("embedding"), cb, m, kc, sd).as("adc"))
        .select(minSum.as("err")).agg(sum("err")).head().getLong(0)
    }
    val (errTrained, errStandin) = (sqErr(trained), sqErr(Similarity.pqCodebooks(m, kc, sd)))
    assert(errTrained < errStandin,
      s"k-means must fit its corpus better: trained=$errTrained standin=$errStandin")
    // three rounds must not be worse than one (Lloyd monotonicity on
    // the same init, exactly representable in integer arithmetic up to
    // the rounding of means -- allow equality)
    val one = Similarity.pqTrainCodebooks(e, "vec_id", "embedding", m, kc, sd, iters = 1)
    assert(sqErr(trained) <= sqErr(one),
      "more Lloyd rounds must not increase training error")
  }
}
