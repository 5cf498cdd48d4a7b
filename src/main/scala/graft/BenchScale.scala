package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence sweep (VERDICT r8 item 5): measures one DECADE of
  * scaling for the heavy-tail keys by generating a `factor`x slice of
  * the sf0.1 fixtures under /tmp and timing each key on both sizes.
  *
  * The slice is `factor` ISOLATED copies of the corpus, so the
  * workload characteristic per copy is identical to sf0.1 and the
  * expected cost model is linear (exponent ~1.0 in log10 time over
  * log10 volume). Isolation is what makes the probe honest:
  *
  *  - documents: non-stopword tokens get a copy-specific letter
  *    suffix, so copies share no shingles — near-dup candidate sets
  *    stay within-copy (verbatim copies would make every LSH/prefix
  *    bucket 10x denser and the PAIR OUTPUT quadratic, measuring an
  *    artifact, not the operator). Stopwords stay verbatim so the
  *    quality-gate ratios keep their sf0.1 distribution; n_chars is
  *    recomputed for the rewritten text.
  *  - events: user/event ids offset per copy — per-key CEP/window
  *    sequences replicate exactly.
  *  - embeddings: ids offset and dimensions ROTATED per copy (a
  *    norm-preserving decorrelation: rotated copies are no longer
  *    near-duplicates of their source, which would otherwise create
  *    cos~1 cross-copy pairs in every bucket).
  *  - lineitem/orders: join keys offset per copy, FKs preserved.
  *
  * Output: BENCH_SCALE.json in the cwd — per key t_small/t_big (min of
  * two interleaved passes each) and the scaling exponent
  * log10(t_big/t_small); plus the same as the final stdout line.
  */
object BenchScale {
  private val Factor = 10
  private val Stride = 100000000L // above any fixture id, small enough for composite-ordinal arithmetic

  private val keysUnderTest = Seq(
    "dedup_clusters", "dedup_containment", "dedup_ngram_jaccard",
    "dedup_minhash", "dedup_simhash", "text_tfidf", "q_composite_corpus",
    "event_cep", "event_cep_relaxed", "recursive_chain", "wnd_late_drop",
    "join_skew_salted", "sim_ann_partitioned",
    // round-9 additions: the trained-quantizer serving path (two
    // k-means passes + pruned ADC scan) and the CDC chunker
    "sim_ivfadc", "corpus_cdc_chunk",
    // round-10 additions: span-level dedup (span-hash shuffles; the
    // copy-suffix isolation keeps duplicated spans within-copy), the
    // BPE chunker (vocab train + merge-encode), and the ANN recall
    // audit (brute-force truth join + rerank on the rotated copies)
    "dedup_span", "corpus_chunk_bpe", "sim_recall_audit",
    // span REMOVAL: the span-hash shuffles of dedup_span plus the
    // removed-position explode and the doc-keyed reassembly join;
    // winnowing: doc-keyed window min + the sharing join
    "dedup_span_removal", "dedup_winnow",
    // round-11: maximal shared runs — fingerprint-anchored pair join +
    // diagonal extension over doc-keyed gram arrays (the copy-suffix
    // isolation keeps anchors within-copy, so candidates scale with
    // the corpus, not its square)
    "dedup_span_maxrun",
    // round-12 additions: ingest-order minhash dedup (bucket firsts +
    // estimator verify), the LSH k-NN graph (bucket self-join), the
    // A-ES weighted sample (TakeOrdered top-k), and the Morton layout
    // plan (two keyed aggs). join_fuzzy_edit is excluded: it reads
    // customer, which the slice generator does not write.
    "dedup_minhash_incr", "sim_knn_graph", "sample_weighted",
    "event_zorder_plan",
    // round-13: the dense-bucket treatment next to the key it fixes —
    // the capped neighbor side bounds candidate volume at tables·n·cap,
    // so the fixed-bits Σocc² term of sim_knn_graph (0.84/decade in
    // r12) should drop materially here
    "sim_knn_graph_capped",
    // and the stratified A-ES draw (stratum-keyed window vs
    // sample_weighted's TakeOrdered)
    "sample_weighted_stratified",
    // round-14 (VERDICT r13 item 8): the round-13 keys — SymSpell d<=2
    // self-join on supplier names (the slice now writes an
    // edit-isolated supplier copy: 6-char per-copy suffixes with
    // pairwise distance >= 3 > maxDist, so candidates stay
    // within-copy), kNN-graph + connected components, and the
    // streaming ANN serving batch replay (fixed copy-0 probe set over
    // a growing corpus — the serving shape, like sim_ivfadc)
    "join_fuzzy_edit2", "sim_knn_clusters", "stream_sim_topk",
    // round-14: PageRank over the capped kNN graph — 8 fixed
    // integer-arithmetic rounds of src-keyed join + dst-keyed combine
    // over O(n*k) capped edges; expected ~linear per decade (edge
    // volume), the iterative-loop shape audited like the converged
    // kNN family
    "graph_pagerank",
    // round-15 (VERDICT r14 item 8): the round-14 event-time keys —
    // per-user linear interpolation (partitioned windows, no global
    // sort), the temporal join's batch replay (strictly-preceding
    // window), the retract changelog fold (per-user max_by + grouped
    // sum) — plus the round-15 additions: the updating-table join
    // (two latest tables + key join) and the bottom-seeded converged
    // PageRank (auto-scaled since round 17: base stays in [15, 150]
    // at any n, so the round count is bounded ~31 across decades)
    "ts_interp_linear", "stream_temporal_join", "stream_retract_agg",
    "stream_retract_join", "graph_pagerank_converged",
    // ... and the round-15 late additions: the N:1 fanout join's batch
    // replay (two latest tables + key join) and the capped-graph
    // triangle count (wedge volume Σ deg² bounded by the cap)
    "stream_retract_join_fanout", "graph_triangles",
    // round-16: the N:M updating join's batch replay (two latest
    // tables inner-joined on the mutable attribute — the join OUTPUT
    // itself is the quadratic-risk term, bounded here by per-type
    // group sizes replicating per copy), the CUMULATE TVF batch twin
    // (slice panes + growing-window rollup), and dangling-mass
    // PageRank (adds one scalar aggregate + broadcast per round to
    // the fixed-round loop)
    "stream_retract_join_nm", "stream_cumulate", "graph_pagerank_dangling",
    // ... and multi-source BFS over the capped kNN graph: O(E) total
    // edge visits across all rounds, rounds bounded by the (slowly
    // growing) diameter — expected sub-linear wall per decade
    "graph_sssp",
    // ... and its weighted Bellman-Ford sibling, which adds the
    // per-round distance merge-fold (improvements re-open settled
    // nodes) — the term worth watching at 10x
    "graph_sssp_weighted",
    // round-16 late additions: the k-core onion peel (frontier-delta —
    // O(E) total edge discounts across all rounds; cascade depth is
    // the term worth watching as copies multiply), the retract Top-N's
    // batch replay (per-(type,user) pre-agg + rank fold — the
    // pre-aggregated update-stream shape), and the tombstone
    // changelog (user-keyed net fold + the sparse-marker anti-join).
    // stream_lookup_join is excluded like join_fuzzy_edit: it reads
    // customer, which the slice generator does not write.
    "graph_kcore", "stream_topn_retract", "stream_tombstone")

  /** Second measured decade (VERDICT r9 item 6): the STEEPEST keys of
    * the 10x sweep re-measured over a 100x slice, so their exponents
    * are confirmed once sf0.1's fixed costs stop dominating.
    * Exponents here are PER DECADE (log10(t_big/t_small) / 2 over the
    * two decades). dedup_clusters joined in round 11 (VERDICT r10
    * item 8); round 12 (VERDICT r11 item 7) adds the sketch/ANN
    * families — dedup_winnow, dedup_minhash, dedup_span_maxrun
    * (documents) and sim_ivfadc (embeddings; its probe set is the
    * fixed copy-0 slice because offset ids exceed the probe bound, so
    * the measurement is the serving shape: constant queries over a
    * 100x corpus). */
  private val keys100 = Seq("dedup_containment", "dedup_ngram_jaccard",
    "text_tfidf", "dedup_clusters",
    "dedup_winnow", "dedup_minhash", "dedup_span_maxrun", "sim_ivfadc",
    // round-13: confirm the cap's linear candidate bound over TWO
    // decades (the uncapped sibling measured 0.86/decade at 10x —
    // the deliberate fixed-bits quadratic term; capped read 0.39)
    "sim_knn_graph_capped",
    // round-14 (VERDICT r13 item 8): the round-13 keys over the second
    // decade — the 100x slice now writes supplier too
    "join_fuzzy_edit2", "sim_knn_clusters", "stream_sim_topk",
    // and the kNN-graph PageRank loop's second decade
    "graph_pagerank",
    // round-15 (VERDICT r14 item 8): the event-time keys over the
    // second decade — the 100x slice now writes events too (V4).
    "ts_interp_linear", "stream_temporal_join", "stream_retract_agg",
    // round-16 (VERDICT r15 item 8): the changelog joins' batch
    // replays over the second decade (per-user latest tables + key
    // join; per-copy group sizes replicate, so the join output is
    // linear in copies).
    "stream_retract_join", "stream_retract_join_fanout",
    // round-17 (VERDICT r16 item 4): the DECLARED converged-PageRank
    // key now auto-derives its scale from n (smallest power of ten >=
    // 100*n — Graphs.autoScale), so the 200k-node 100x slice is
    // ACCEPTED instead of rejected and the declared key itself is
    // measured across both decades; the dedicated fixed-scale block
    // below remains as the constant-units twin recording the round
    // counts.
    "graph_pagerank_converged",
    // round-16 late: the fused frontier loops over the second decade —
    // BFS and its weighted Bellman-Ford sibling (O(E)-total edge
    // visits vs the per-round merge-fold), and the k-core onion peel
    // (each edge discounted once per endpoint removal; the cascade
    // depth is per-copy topology, so the 100x max-over-copies term is
    // bounded)
    "graph_sssp", "graph_sssp_weighted", "graph_kcore")
  private val Factor100 = 100

  /** 100 isolated documents + embeddings copies — same isolation
    * scheme as [[gen]]: copy-specific token suffixes keep every
    * near-dup candidate set within-copy (stopwords verbatim), numeric
    * two-digit suffixes since 100 copies outgrow the letter table.
    * Embeddings decorrelate with only 64 distinct rotations available
    * in 64 dims, so copies 64..99 take the ANTIPODE of rotations
    * 0..35 (global negation — norm-preserving, cosine -1 to the
    * un-negated twin): all 100 transforms are distinct, so no
    * cross-copy cos~1 pair inflates a cluster.
    * Done-marker is versioned: _GEN_DONE_V2 invalidates round-11 dirs
    * that carry only the documents table. */
  private def gen100(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    // V3: round-14 adds the supplier table (join_fuzzy_edit2);
    // V4: round-15 adds events (ts_interp_linear / temporal / retract)
    val done = new java.io.File(s"$outDir/_GEN_DONE_V4")
    if (done.exists()) return
    val copies = spark.range(Factor100).select(col("id").cast("int").as("c"))
    val suffixed =
      """array_join(transform(split(text, ' '), t ->
        |  CASE WHEN c = 0 OR t IN ('the', 'a', 'of', 'and', 'to') THEN t
        |       ELSE concat(t, 'q', lpad(cast(c as string), 2, '0')) END), ' ')"""
        .stripMargin
    spark.read.parquet(s"$srcDir/documents.parquet").crossJoin(copies).select(
        (col("doc_id") + col("c") * Stride).as("doc_id"),
        expr(suffixed).as("text"), col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(64).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val rot100 = // rotation for c mod 64; antipode for the second lap
      """CASE WHEN c = 0 THEN embedding ELSE
        |  transform(
        |    concat(slice(embedding, pmod(c * 7, 64) + 1, 64 - pmod(c * 7, 64)),
        |           slice(embedding, 1, pmod(c * 7, 64))),
        |    x -> CASE WHEN c >= 64 THEN -x ELSE x END) END""".stripMargin
    spark.read.parquet(s"$srcDir/embeddings.parquet").crossJoin(copies).select(
        (col("vec_id") + col("c") * Stride).as("vec_id"),
        expr(rot100).as("embedding"), col("label"))
      .repartition(64).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    spark.read.parquet(s"$srcDir/supplier.parquet").crossJoin(copies).select(
        (col("s_suppkey") + col("c") * Stride).as("s_suppkey"),
        expr(supplierSuffixed).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))
      .repartition(64).write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    // events: ids offset per copy — per-key sequences replicate sf0.1's
    // exactly (the same isolation as the 10x slice)
    spark.read.parquet(s"$srcDir/events.parquet").crossJoin(copies).select(
        (col("event_id") + col("c") * Stride).as("event_id"), col("ts"),
        (col("user_id") + col("c") * Stride).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(64).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    done.createNewFile()
  }

  private def gen(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    // V2: round-14 adds the supplier table (join_fuzzy_edit2)
    val done = new java.io.File(s"$outDir/_GEN_DONE_V2")
    if (done.exists()) return
    val copies = spark.range(Factor).select(col("id").cast("int").as("c"))
    def src(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    val suffixed = // copy-0 verbatim; stopwords verbatim (gate ratios)
      """array_join(transform(split(text, ' '), t ->
        |  CASE WHEN c = 0 OR t IN ('the', 'a', 'of', 'and', 'to') THEN t
        |       ELSE concat(t, 'q', substring('abcdefghij', c + 1, 1)) END), ' ')"""
        .stripMargin
    write(src("documents").crossJoin(copies).select(
      (col("doc_id") + col("c") * Stride).as("doc_id"),
      expr(suffixed).as("text"), col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")

    write(src("events").crossJoin(copies).select(
      (col("event_id") + col("c") * Stride).as("event_id"), col("ts"),
      (col("user_id") + col("c") * Stride).as("user_id"),
      col("event_type"), col("value"), col("props")), "events")

    val rot = // norm-preserving per-copy dimension rotation
      """CASE WHEN c = 0 THEN embedding
        |     ELSE concat(slice(embedding, pmod(c * 7, 64) + 1, 64 - pmod(c * 7, 64)),
        |                 slice(embedding, 1, pmod(c * 7, 64))) END""".stripMargin
    write(src("embeddings").crossJoin(copies).select(
      (col("vec_id") + col("c") * Stride).as("vec_id"),
      expr(rot).as("embedding"), col("label")), "embeddings")

    write(src("lineitem").crossJoin(copies).select(
      (col("l_orderkey") + col("c") * Stride).as("l_orderkey"),
      (col("l_partkey") + col("c") * Stride).as("l_partkey"),
      col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), "lineitem")

    write(src("orders").crossJoin(copies).select(
      (col("o_orderkey") + col("c") * Stride).as("o_orderkey"),
      (col("o_custkey") + col("c") * Stride).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    write(src("supplier").crossJoin(copies).select(
      (col("s_suppkey") + col("c") * Stride).as("s_suppkey"),
      expr(supplierSuffixed).as("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier")

    done.createNewFile()
  }

  /** Edit-distance isolation for supplier names (join_fuzzy_edit2 runs
    * SymSpell at d <= 2): copy c > 0 appends a 6-char suffix of two
    * homogeneous 3-letter runs keyed on the copy digits, so any two
    * DISTINCT copies' suffixes differ in >= 3 positions (one whole
    * run) and copy 0's unsuffixed names sit >= 6 inserts away — every
    * cross-copy pair is > maxDist, so fuzzy candidates stay
    * within-copy and the expected cost model is linear, same stance as
    * the documents token suffixes. Within a copy all names share the
    * suffix, so per-copy match sets replicate sf0.1's exactly. */
  private val supplierSuffixed =
    """CASE WHEN c = 0 THEN s_name ELSE concat(s_name,
      |  repeat(substring('abcdefghij', c DIV 10 + 1, 1), 3),
      |  repeat(substring('abcdefghij', c % 10 + 1, 1), 3)) END""".stripMargin

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    gen(spark, srcDir, outDir)

    spark.range(1000000).selectExpr("sum(id)").collect() // JIT bring-up
    SparkEntry.entry(spark).count()
    def timeOne(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // two interleaved passes, min per (key, size) — same noise stance
    // as Bench's A-B ordering
    def pass(label: String): Map[(String, String), Double] =
      (for (name <- keysUnderTest; dir <- Seq(srcDir, outDir)) yield {
        System.err.println(s"[bench-scale] $label $name @ $dir")
        (name, dir) -> timeOne(name, dir)
      }).toMap
    val (a, b) = (pass("passA"), pass("passB"))
    val rows = keysUnderTest.map { name =>
      val tS = math.min(a((name, srcDir)), b((name, srcDir)))
      val tB = math.min(a((name, outDir)), b((name, outDir)))
      val exp = math.log10(tB / tS) // one decade of volume -> exponent
      (name, tS, tB, exp)
    }
    // second decade: the steepest documents-only keys at 100x, two
    // interleaved passes, PER-DECADE exponent over the two decades
    val outDir100 = sys.env.getOrElse("SPARK_GRAFT_SCALE100_DIR", "/tmp/graft_scale_sf10")
    gen100(spark, srcDir, outDir100)
    def pass100(label: String): Map[String, Double] =
      keys100.map { name =>
        System.err.println(s"[bench-scale] $label $name @ $outDir100")
        name -> timeOne(name, outDir100)
      }.toMap
    val (a100, b100) = (pass100("passA100"), pass100("passB100"))
    val rows100 = keys100.map { name =>
      val tS = math.min(a((name, srcDir)), b((name, srcDir)))
      val tB = math.min(a100(name), b100(name))
      val exp = math.log10(tB / tS) / 2.0
      (name, tS, tB, exp)
    }
    // Round-14 (VERDICT r13 item 3's measured-exponent leg): the
    // HOT-VARIANT skew probe for the capped fuzzy join. This slice is
    // deliberately NOT isolated — n VERBATIM copies of the supplier
    // names (ids offset) make every deletion-variant bucket's
    // occupancy grow n-fold: the Σocc² regime the cap exists for.
    // Uncapped candidates (and the true pair output itself) grow
    // quadratically — the DuckDB candidate replay (BENCH_SCALE.md)
    // measures 36,855 -> 3,730,500 pairs over 1x->10x (x101/decade),
    // putting the 100x point at ~3.7e8 — so the uncapped arm measures
    // one decade only: the blow-up is demonstrated by arithmetic, not
    // worth the wall-clock. The capped arm's candidates are occ·cap =
    // LINEAR in rows past the cap threshold (measured 4,606 -> 65,080
    // -> 647,713: x14 while the cap starts binding, then x10.0 exactly
    // linear); it measures BOTH decades — the 10x->100x decade is the
    // regime claim.
    def skewSupplier(n: Int): DataFrame =
      spark.read.parquet(s"$srcDir/supplier.parquet")
        .crossJoin(spark.range(n).select(col("id").cast("int").as("c")))
        .select((col("s_suppkey") + col("c") * Stride).as("s_suppkey"),
          col("s_name"))
    def fuzzySkew(n: Int, capped: Boolean): Double = {
      val df = skewSupplier(n)
      val q =
        if (capped) graft.api.Joins.fuzzyEditJoinCapped(
          df, "s_suppkey", "s_name", maxDist = 1, cap = 4)
        else graft.api.Joins.fuzzyEditJoin(df, "s_suppkey", "s_name", maxDist = 1)
      val t0 = System.nanoTime()
      q.count()
      (System.nanoTime() - t0) / 1e9
    }
    // min of TWO runs (by-name parameter evaluated twice — renamed per
    // the round-14 ADVICE: the old `best2(f) = math.min(f, f)` read as
    // a no-op and invited a refactor to a plain value)
    def minOf2Runs(trial: => Double): Double = math.min(trial, trial)
    // the 10x capped point is SHARED between the fuzzy_skew_capped
    // t_big and the decade-2 t_small (round-14 ADVICE: measuring it
    // twice made the committed artifact carry two different times for
    // the same nominal point, breaking the chained-decade reading)
    val capped10x = minOf2Runs(fuzzySkew(10, true))
    val skewRows = Seq(
      ("fuzzy_skew_uncapped", minOf2Runs(fuzzySkew(1, false)),
        minOf2Runs(fuzzySkew(10, false)), 1.0),
      ("fuzzy_skew_capped", minOf2Runs(fuzzySkew(1, true)), capped10x, 1.0),
      ("fuzzy_skew_capped_decade2", capped10x,
        minOf2Runs(fuzzySkew(100, true)), 1.0))
      .map { case (nm, tS, tB, dec) => (nm, tS, tB, math.log10(tB / tS) / dec) }
    // Round-16 (VERDICT r15 item 8): the converged PageRank loop's
    // second decade. The DECLARED key fixes scale = 1e6 (ppm), which
    // floors the per-node base to 0 past n ~ 1.4e5 nodes — the API
    // rejects the 100x slice (n = 200k) loudly by design, and
    // production raises scale with n. The scale-evidence question is
    // therefore measured here at a FIXED scale = 1e7 — the smallest
    // power of ten whose base survives 200k nodes (base =
    // 15*(1e7/2e5)/100 = 7) — across all three sizes, recording wall
    // time AND the certified convergence round per point. The design
    // claim under test: rounds ~ log_{100/85}(base) SHRINK one
    // decade's worth (~x0.6) per data decade while per-round edge
    // volume grows x10, so wall-clock per decade stays sub-linear.
    // (Round-16 measurement: wall-clock held sub-linear — 0.34 then
    // 0.29/decade — but rounds shrank only over decade 1 (81 -> 65)
    // and ROSE to 77 at 100x: the slice is 100 isolated copies and
    // the certified round is the MAX over copies, an extreme-value
    // term that offsets the log(base) shrink there. BENCH_SCALE.md
    // records the full reading.)
    def pagerankConvergedAt(dir: String): (Double, Int) = {
      System.err.println(s"[bench-scale] pagerank_converged_1e7 @ $dir")
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      val edges = graft.api.Similarity.knnGraphCapped(
        e, "vec_id", "embedding", 5, tables = 8, bits = 6, cap = 16)
      val (ranks, round) = graft.api.Graphs.pagerankConvergedWithRound(
        e.select("vec_id"), "vec_id", edges,
        srcCol = "src_id", dstCol = "neighbor_id", scale = 10000000L)
      ranks.count()
      ((System.nanoTime() - t0) / 1e9, round)
    }
    // min-of-2 wall time per point; the round is deterministic (same
    // data, same integer map) so either trial's value is THE value
    val prPoints = Seq("1x" -> srcDir, "10x" -> outDir, "100x" -> outDir100)
      .map { case (label, dir) =>
        val (tA, rA) = pagerankConvergedAt(dir)
        val (tB, rB) = pagerankConvergedAt(dir)
        require(rA == rB,
          s"pagerankConverged round must be deterministic: $rA vs $rB @ $dir")
        (label, math.min(tA, tB), rA)
      }
    val prJson = {
      val pts = prPoints.map { case (l, t, r) =>
        f""""$l":{"t":$t%.3f,"round":$r}""" }.mkString("{", ",", "}")
      val e1 = math.log10(prPoints(1)._2 / prPoints(0)._2)
      val e2 = math.log10(prPoints(2)._2 / prPoints(1)._2)
      f"""{"scale":10000000,"points":$pts,""" +
        f""""exponent_decade1":$e1%.3f,"exponent_decade2":$e2%.3f}"""
    }
    def block(rs: Seq[(String, Double, Double, Double)]): String =
      rs.map { case (n, tS, tB, e) =>
        f""""$n":{"t_small":$tS%.3f,"t_big":$tB%.3f,"exponent":$e%.3f}"""
      }.mkString("{", ",", "}")
    val json =
      s"""{"factor":$Factor,"src":"$srcDir","keys":${block(rows)},""" +
        s""""factor100":{"factor":$Factor100,"exponent_per_decade":true,""" +
        s""""keys":${block(rows100)}},""" +
        s""""fuzzy_skew":{"base_rows":1000,"cap":4,"maxDist":1,""" +
        s""""keys":${block(skewRows)}},""" +
        s""""pagerank_converged_fixed_scale":$prJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SCALE.json"),
      json.getBytes("UTF-8"))
    println(json)
  }
}
