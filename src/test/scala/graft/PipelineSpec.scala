package graft

import org.apache.spark.sql.functions._
import graft.queries.Pipeline

/** Property checks for the LLM-pipeline operators that have no DuckDB
  * oracle (SURVEY.md §5.3): LSH recall vs exact ground truth, ANN recall
  * vs brute force, dedup idempotence, SimHash signature sanity.
  */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  /** Exact global near-dup "dominated" set (any doc that has a smaller
    * near-dup partner at token-Jaccard >= 0.7) — brute force all pairs,
    * feasible at sf0.001 (500 docs).
    */
  private lazy val exactDominated: Set[Long] = {
    val t = Tables.documents(spark, sf001)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val a = t.select(col("doc_id").as("da"), col("toks").as("ta"))
    val b = t.select(col("doc_id").as("db"), col("toks").as("tb"))
    a.join(b, col("da") < col("db"))
      .withColumn("ni", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jac", col("ni").cast("double") / (size(col("ta")) + size(col("tb")) - col("ni")))
      .filter(col("jac") >= 0.7)
      .select(col("db")).distinct().as[Long].collect().toSet
  }

  test("minhash LSH survivors: high recall of the exact dominated set") {
    val survivors = Pipeline.queries("dedup_minhash")(spark, sf001)
      .as[Long].collect().toSet
    val all = Tables.documents(spark, sf001).select("doc_id").as[Long].collect().toSet
    val lshDominated = all -- survivors
    // every LSH-dominated doc must truly be dominated (precision = 1: the
    // Jaccard verification step is exact)
    assert(lshDominated.subsetOf(exactDominated),
      s"false positives: ${lshDominated -- exactDominated}")
    val recall = lshDominated.size.toDouble / exactDominated.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 " +
      s"(found ${lshDominated.size} of ${exactDominated.size})")
  }

  test("ANN partitioned search: recall@5 vs brute force") {
    val brute = Pipeline.queries("sim_cosine_topk")(spark, sf001)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Pipeline.queries("sim_ann_partitioned")(spark, sf001)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ann & brute).size.toDouble / brute.size
    info(s"ANN recall@5 = $recall")
    // The fixture embeddings are isotropic (no cluster structure), so the
    // information-free floor for nProbe=2 of 10 partitions is 0.2 and the
    // measured recall is 0.30 — pinned here as the regression bar. High
    // recall on clusterABLE data is proven by the dedicated test below.
    assert(recall >= 0.28, s"ANN recall $recall regressed below the measured 0.30 floor")
    assert(ann.size == brute.size, "ANN must return the same top-k shape")
  }

  test("ANN achieves >=0.9 recall@5 when the corpus actually clusters") {
    import spark.implicits._
    // Deterministic 10-cluster corpus: fixed-seed PRNG, well-separated
    // centers (scale 5) + small noise (scale 1) in 16-d.
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextGaussian() * 5.0f.toDouble))
    val rows = (0 until 400).map { i =>
      val c = i % 10
      (i.toLong, centers(c).map(x => (x + rnd.nextGaussian()).toFloat), c)
    }
    val corpus = rows.toDF("vec_id", "embedding", "label")
    val probes = corpus.filter(col("vec_id") < 10)
    val brute = graft.api.Similarity.cosineTopK(corpus, probes, "vec_id", "embedding", 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = graft.api.Similarity.annTopK(corpus, probes, "vec_id", "embedding",
        "label", 5, nProbe = 2)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ann & brute).size.toDouble / brute.size
    info(s"clustered ANN recall@5 = $recall")
    assert(recall >= 0.9, s"IVF recall $recall < 0.9 on clustered data")
  }

  test("prefix-filtered jaccard pairs equal brute-force block all-pairs EXACTLY") {
    val got = Pipeline.queries("dedup_ngram_jaccard")(spark, sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val t = Tables.documents(spark, sf001).select(col("doc_id"), col("lang"),
      col("source"), array_distinct(split(col("text"), " ")).as("toks"))
    val a = t.select(col("doc_id").as("da"), col("lang"), col("source"), col("toks").as("ta"))
    val b = t.select(col("doc_id").as("db"), col("lang").as("lgb"),
      col("source").as("srb"), col("toks").as("tb"))
    val brute = a.join(b, col("lang") === col("lgb") && col("source") === col("srb") &&
        col("da") < col("db"))
      .withColumn("ni", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jac", col("ni").cast("double") /
        (size(col("ta")) + size(col("tb")) - col("ni")))
      .filter(col("jac") >= 0.7)
      .select(col("da"), col("db")).as[(Long, Long)].collect().toSet
    assert(got == brute,
      s"missed: ${(brute -- got).take(5)}; extra: ${(got -- brute).take(5)}")
  }

  test("dedup_exact is idempotent and survivors are minimal doc_ids") {
    val out = Pipeline.queries("dedup_exact")(spark, sf001)
    val n = out.count()
    assert(n > 0 && n <= Tables.documents(spark, sf001).count())
    // survivors are min-per-hash: re-running dedup over survivors changes nothing
    val hashes = out.select("h").distinct().count()
    assert(hashes == n, "one survivor per distinct content hash")
  }

  test("simhash survivors: proper nonempty subset on a near-dup corpus") {
    val survivors = Pipeline.queries("dedup_simhash")(spark, sf001)
      .as[Long].collect().toSet
    val all = Tables.documents(spark, sf001).select("doc_id").as[Long].collect().toSet
    assert(survivors.nonEmpty && survivors.subsetOf(all))
    assert(survivors.size < all.size,
      "expected simhash to drop near-dups on a 41%-near-dup corpus")
  }
}
