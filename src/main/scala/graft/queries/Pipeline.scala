package graft.queries

import graft.{Det, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (SURVEY.md §2.K + the training-data ops the
  * task mandates): deduplication (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine), similarity search (brute-force top-k and an
  * IVF-style label-pruned variant), text analysis (stats, TF-IDF,
  * language-ID, quality, token counting, fingerprinting), and multimodal
  * struct columns.
  *
  * Scale design: every pairwise operator is *blocked* — LSH band buckets,
  * (lang, source) blocking keys, label partitions — so the shuffle key
  * bounds the quadratic blow-up; nothing ever compares all pairs globally.
  * All similarity math is native higher-order expressions (codegen'd, no
  * UDFs, no serialization).
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Documents with whitespace tokens + distinct token set. */
  private def toked(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("toks", array_distinct(col("tk")))

  /** Embeddings with double-widened vector and precomputed L2 norm.
    * Folds are sequential left-folds starting at 0.0 — DuckDB's
    * list_aggregate(...,'sum') matches bit-for-bit (verified).
    */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", sqrt(expr("aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x)")))

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  val queries: Map[String, Q] = Map(
    // Exact dedup: content-hash groupBy, survivor = min doc_id per hash.
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
        .select("doc_id", "h", "n_dups")
        .orderBy("doc_id")),

    // Exact near-dup ground truth: token-set Jaccard >= 0.7 within a
    // (lang, source) blocking key. The blocking key is what makes this
    // viable at 100 TB: the self-join shuffles on (lang, source) and each
    // block is small relative to the corpus.
    "dedup_ngram_jaccard" -> ((s, d) => {
      val t = toked(s, d).select(col("doc_id"), col("lang"), col("source"), col("toks"))
      val a = t.select(col("doc_id").as("doc_a"), col("lang"), col("source"), col("toks").as("toks_a"))
      val b = t.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("source").as("source_b"), col("toks").as("toks_b"))
      a.join(b, col("lang") === col("lang_b") && col("source") === col("source_b") &&
          col("doc_a") < col("doc_b"))
        .withColumn("ninter", size(array_intersect(col("toks_a"), col("toks_b"))))
        .withColumn("jac", col("ninter").cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - col("ninter")))
        .filter(col("jac") >= 0.7)
        .select(col("doc_a"), col("doc_b"), Det.round4(col("jac")).as("jac"))
        .orderBy("doc_a", "doc_b")
    }),

    // MinHash + LSH near-dup over token sets (the same universe the
    // Jaccard metric is defined on — word-shuffled near-dups keep their
    // token set but not their shingles): 64-perm signature (seed folded
    // into the hashed string — no long multiplication, ANSI-overflow
    // safe), 16 bands x 4 rows (recall ~0.99 at j=0.7), band-bucket
    // self-join for candidates, exact Jaccard >= 0.7 verification. The
    // band-hash groupBy IS the scale story: candidates only ever meet
    // inside a bucket. No oracle (LSH recall < 1 by construction); the
    // ScalaTest suite asserts recall against dedup_ngram_jaccard.
    "dedup_minhash" -> ((s, d) => {
      val t = toked(s, d).filter(size(col("tk")) >= 3)
        .withColumn("toksh", expr("transform(toks, t -> xxhash64(t))"))
      val sig = t.withColumn("sig",
          expr("""transform(sequence(0, 63), i ->
                 |  aggregate(toks, 9223372036854775807L,
                 |            (m, sh) -> least(m, xxhash64(concat(sh, '|', cast(i as string))))))""".stripMargin))
        .select(col("doc_id"), col("sig"))
      val bands = sig.select(col("doc_id"),
          explode(expr(
            """transform(sequence(0, 15), b ->
              |  struct(b as band, concat_ws(',', transform(slice(sig, b * 4 + 1, 4), x -> cast(x as string))) as bkey))""".stripMargin)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      // Candidate generation via STAR REDUCTION: each doc is paired only
      // with the minimum doc_id of its bucket — k-1 pairs per bucket
      // instead of k^2/2. On this corpus near-dup clusters reach ~1000
      // docs, so a full bucket self-join is quadratic inside single
      // buckets (measured 273 s at sf0.1; this shape runs in seconds) and
      // catastrophically skewed at 100 TB. With 16 bands every doc gets
      // 16 independent star checks, so dominated-set recall stays ~1
      // (asserted >= 0.9 by PipelineSpec). Pairs are bare ID pairs;
      // hashed token sets are re-attached afterwards (AQE broadcasts the
      // doc side locally, shuffle-joins at scale).
      val bmin = bands.groupBy("band", "bkey").agg(min(col("doc_id")).as("doc_a"))
      val cand = bands.join(bmin, Seq("band", "bkey"))
        .filter(col("doc_id") > col("doc_a"))
        .select(col("doc_a"), col("doc_id").as("doc_b")).distinct()
      val ta = t.select(col("doc_id").as("doc_a"), col("toksh").as("ha"), size(col("toks")).as("na"))
      val tb = t.select(col("doc_id").as("doc_b"), col("toksh").as("hb"), size(col("toks")).as("nb"))
      val dominated = cand.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn("ninter", size(array_intersect(col("ha"), col("hb"))))
        .withColumn("jac", col("ninter").cast("double") /
          (col("na") + col("nb") - col("ninter")))
        .filter(col("jac") >= 0.7)
        .select(col("doc_b").as("doc_id")).distinct()
      // Survivors (greedy min-id representative): every doc that is not
      // the larger side of any verified near-dup pair. Output is bounded
      // by |docs|, not |pairs| — essential on a 41%-near-duplicated
      // corpus where the pair set is quadratic.
      t.select("doc_id").join(dominated, Seq("doc_id"), "left_anti")
        .orderBy("doc_id")
    }),

    // SimHash near-dup: 64-bit signature (majority vote per bit over
    // token hashes), 4 x 16-bit band buckets for candidates, exact
    // hamming distance <= 12 verification via bit_count(xor), emitting
    // greedy min-id survivors. Bitwise ops only — no overflow. No oracle
    // (hash-function specific); ScalaTest asserts survivor properties.
    "dedup_simhash" -> ((s, d) => {
      val t = toked(s, d)
        .withColumn("toksh", expr("transform(toks, tok -> xxhash64(tok))"))
      val sig = t.withColumn("sig",
          expr("""aggregate(sequence(0, 63), 0L, (acc, k) ->
                 |  acc + shiftleft(CASE WHEN aggregate(toksh, 0L,
                 |        (a, h) -> a + CASE WHEN (shiftright(h, k) & 1) = 1
                 |                           THEN 1L ELSE -1L END) >= 0L
                 |      THEN 1L ELSE 0L END, k))""".stripMargin))
        .select(col("doc_id"), col("sig"))
      val bands = sig.select(col("doc_id"), col("sig"),
          explode(expr(
            "transform(sequence(0, 3), b -> struct(b as band, shiftright(sig, b * 16) & 65535 as bkey))")).as("bb"))
        .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      // Star reduction, same rationale as dedup_minhash: bucket self-join
      // is quadratic inside the giant near-dup clusters of this corpus.
      val bmin = bands.groupBy("band", "bkey").agg(min(col("doc_id")).as("doc_a"))
      val dominated = bands.join(bmin, Seq("band", "bkey"))
        .filter(col("doc_id") > col("doc_a"))
        .select(col("doc_a"), col("doc_id").as("doc_b")).distinct()
        .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= 12)
        .select(col("doc_b").as("doc_id")).distinct()
      t.select("doc_id").join(dominated, Seq("doc_id"), "left_anti")
        .orderBy("doc_id")
    }),

    // Embedding-cosine near-dup, blocked by label (cluster id) — the
    // same blocking discipline as the text dedups.
    "dedup_embed_cosine" -> ((s, d) => {
      val e = vecs(s, d)
      val a = e.select(col("vec_id").as("vec_a"), col("label"), col("v").as("va"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
        col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
        .withColumn("cos", dot("va", "vb") / (col("na") * col("nb")))
        .filter(col("cos") >= 0.3)
        .select(col("vec_a"), col("vec_b"), Det.round4(col("cos")).as("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    // Brute-force cosine top-k: 10 probe vectors (vec_id < 10) against
    // the whole corpus. The probe side is broadcast; at scale this is a
    // map-side pass over the corpus + a tiny top-k shuffle.
    "sim_cosine_topk" -> ((s, d) => {
      val e = vecs(s, d)
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
      e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .withColumn("cos", dot("pv", "v") / (col("pn") * col("nrm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("probe_id"), col("rnk"), col("vec_id").as("neighbor_id"),
          Det.round4(col("cos")).as("cos"))
        .orderBy("probe_id", "rnk")
    }),

    // IVF-style pruned search: label = coarse centroid id; probe scans
    // only its top-2 nearest label partitions instead of the full corpus.
    // Approximate → no oracle; ScalaTest asserts recall vs the brute
    // force. This is the 100 TB shape: centroid table is tiny and
    // broadcast, the corpus is partition-pruned by label.
    "sim_ann_partitioned" -> ((s, d) => {
      val e = vecs(s, d)
      val cent = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(avg(col("x")).as("cx"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), p -> p.cx)").as("cv"))
        .withColumn("cnrm", sqrt(expr("aggregate(transform(cv, x -> x * x), 0D, (acc, x) -> acc + x)")))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
      val wl = Window.partitionBy(col("probe_id")).orderBy(col("lcos").desc, col("label"))
      val top2 = probes.crossJoin(broadcast(cent))
        .withColumn("lcos", dot("pv", "cv") / (col("pn") * col("cnrm")))
        .withColumn("lrnk", row_number().over(wl))
        .filter(col("lrnk") <= 2)
        .select(col("probe_id"), col("pv"), col("pn"), col("label").as("plabel"))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
      e.join(broadcast(top2), col("label") === col("plabel") && col("vec_id") =!= col("probe_id"))
        .withColumn("cos", dot("pv", "v") / (col("pn") * col("nrm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("probe_id"), col("rnk"), col("vec_id").as("neighbor_id"),
          Det.round4(col("cos")).as("cos"))
        .orderBy("probe_id", "rnk")
    }),

    // Corpus stats per (lang, source): doc count, avg chars, token
    // totals, type/token ratio, top term (count desc, term asc).
    "text_stats" -> ((s, d) => {
      val docs = toked(s, d)
      val base = docs.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("totchars"),
          sum(size(col("tk"))).as("n_tokens"))
      val tc = docs.select(col("lang"), col("source"), explode(col("tk")).as("term"))
        .groupBy("lang", "source", "term").agg(count(lit(1)).as("cnt"))
      val nterms = tc.groupBy("lang", "source").agg(count(lit(1)).as("n_terms"))
      val wt = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("cnt").desc, col("term"))
      val top = tc.withColumn("rn", row_number().over(wt)).filter(col("rn") === 1)
        .select(col("lang"), col("source"), col("term").as("top_term"))
      base.join(nterms, Seq("lang", "source")).join(top, Seq("lang", "source"))
        .select(col("lang"), col("source"), col("n_docs"),
          Det.round2(col("totchars").cast("double") / col("n_docs")).as("avg_chars"),
          col("n_tokens"), col("n_terms"),
          Det.round4(col("n_terms").cast("double") / col("n_tokens")).as("ttr"),
          col("top_term"))
        .orderBy("lang", "source")
    }),

    // Top-3 TF-IDF terms per doc (tf raw count, idf = ln(N/df), tiebreak
    // term asc).
    "text_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfx = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("nd"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      tf.join(dfx, "term").crossJoin(broadcast(n))
        .withColumn("score", col("tf").cast("double") * log(col("nd").cast("double") / col("df")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), Det.round4(col("score")).as("score"))
        .orderBy("doc_id", "rnk")
    }),

    // Language-ID by stopword-profile hit ratio (n-gram heuristic shape;
    // argmax with fixed tie order en>de>fr>es>zh).
    "text_langid" -> ((s, d) => {
      def ratio(set: String): Column =
        expr(s"size(filter(tk, t -> array_contains(array($set), t)))").cast("double") / size(col("tk"))
      toked(s, d)
        .withColumn("s_en", ratio("'the','a','of','and','to'"))
        .withColumn("s_de", ratio("'der','die','das','und','ist'"))
        .withColumn("s_fr", ratio("'le','la','et','les','des'"))
        .withColumn("s_es", ratio("'el','los','las','y','es'"))
        .withColumn("s_zh", ratio("'de','shi','bu','wo','zhe'"))
        .withColumn("pred_lang",
          when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es"), col("s_zh")), "en")
            .when(col("s_de") >= greatest(col("s_fr"), col("s_es"), col("s_zh")), "de")
            .when(col("s_fr") >= greatest(col("s_es"), col("s_zh")), "fr")
            .when(col("s_es") >= col("s_zh"), "es")
            .otherwise("zh"))
        .select(col("doc_id"), col("pred_lang"), Det.round4(col("s_en")).as("score_en"))
        .orderBy("doc_id")
    }),

    // Quality scoring: length, token-length, stopword + alpha ratios,
    // fixed-formula composite. All IEEE op order pinned for the oracle.
    "text_quality" -> ((s, d) =>
      toked(s, d)
        .withColumn("n_tok", size(col("tk")))
        .withColumn("sumlen", expr("aggregate(tk, 0L, (a, t) -> a + length(t))"))
        .withColumn("nstop",
          expr("size(filter(tk, t -> array_contains(array('the','a','of','and','to'), t)))"))
        .withColumn("alpha", length(regexp_replace(col("text"), "[^a-z]", "")))
        .withColumn("stop_ratio", col("nstop").cast("double") / col("n_tok"))
        .withColumn("alpha_ratio", col("alpha").cast("double") / length(col("text")))
        .withColumn("score",
          least(lit(1.0), col("n_tok") / lit(100.0)) * 0.4 +
            col("stop_ratio") * 0.3 + col("alpha_ratio") * 0.3)
        .select(col("doc_id"), col("n_tok"),
          Det.round2(col("sumlen").cast("double") / col("n_tok")).as("avg_tok_len"),
          Det.round4(col("stop_ratio")).as("stop_ratio"),
          Det.round4(col("alpha_ratio")).as("alpha_ratio"),
          Det.round4(col("score")).as("quality"))
        .orderBy("doc_id")),

    // Token counting: whitespace tokens, alpha chars, and a
    // chars/4-style BPE-ish token estimate.
    "text_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("n_ws", size(split(col("text"), " ")))
        .withColumn("n_alpha", length(regexp_replace(col("text"), "[^a-z]", "")))
        .withColumn("approx_bpe", ceil(col("n_alpha") / lit(4.0)))
        .select("doc_id", "n_ws", "n_alpha", "approx_bpe")
        .orderBy("doc_id")),

    // Rolling-hash document fingerprint: sequential polynomial fold over
    // per-token codes mod 1e9+7 (exact integer arithmetic both engines).
    "text_fingerprint" -> ((s, d) =>
      toked(s, d)
        .withColumn("fp",
          expr("""aggregate(transform(tk, t -> cast(length(t) * 17 + ascii(t) as bigint)),
                 |          0L, (a, b) -> (a * 31 + b) % 1000000007L)""".stripMargin))
        .select(col("doc_id"), col("fp"))
        .orderBy("doc_id")),

    // Multimodal struct column: text payload as opaque binary + typed
    // metadata + embedding, projected/filtered through nested fields
    // (parquet-friendly: nested pruning keeps unused fields unread).
    "multimodal_cols" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val e = Tables.embeddings(s, d)
      docs.join(e, docs("doc_id") === e("vec_id"))
        .select(struct(col("doc_id"), col("lang"), col("n_chars"),
          col("embedding"), col("text").cast("binary").as("payload")).as("m"))
        .filter(col("m.lang").isin("en", "de") && col("m.n_chars") > 150)
        .select(col("m.doc_id").as("doc_id"), col("m.lang").as("lang"),
          length(col("m.payload")).as("payload_bytes"),
          size(col("m.embedding")).as("dim"),
          col("m.embedding").getItem(0).cast("double").as("e0"))
        .orderBy("doc_id")
    })
  )

  private val cosCte: String =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v,
      |         sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')) AS nrm
      |  FROM embeddings
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, sha256(text) AS h, count(*) AS n_dups
        |FROM documents GROUP BY sha256(text) ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, lang, source, list_distinct(str_split(text, ' ')) AS toks
        |           FROM documents)
        |SELECT doc_a, doc_b, floor(jac * 10000 + 0.5) / 10000 AS jac FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.toks, b.toks))::DOUBLE /
        |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jac
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
        |                   AND a.doc_id < b.doc_id
        |) WHERE jac >= 0.7 ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_embed_cosine" ->
      (cosCte + """
        |SELECT vec_a, vec_b, floor(cos * 10000 + 0.5) / 10000 AS cos FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_aggregate(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]), 'sum')
        |      / (a.nrm * b.nrm) AS cos
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |) WHERE cos >= 0.3 ORDER BY vec_a, vec_b""".stripMargin),

    "sim_cosine_topk" ->
      (cosCte + """
        |SELECT probe_id, rnk, neighbor_id, floor(cos * 10000 + 0.5) / 10000 AS cos FROM (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |    list_aggregate(list_transform(list_zip(p.v, c.v), x -> x[1] * x[2]), 'sum')
        |      / (p.nrm * c.nrm) AS cos,
        |    CAST(row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      list_aggregate(list_transform(list_zip(p.v, c.v), x -> x[1] * x[2]), 'sum')
        |        / (p.nrm * c.nrm) DESC, c.vec_id) AS INTEGER) AS rnk
        |  FROM (SELECT * FROM e WHERE vec_id < 10) p
        |  JOIN e c ON c.vec_id != p.vec_id
        |) WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin),

    "text_stats" ->
      """WITH docs AS (SELECT doc_id, lang, source, n_chars, str_split(text, ' ') AS tk
        |              FROM documents),
        |base AS (SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS totchars,
        |                sum(len(tk)) AS n_tokens
        |         FROM docs GROUP BY lang, source),
        |tc AS (SELECT lang, source, unnest(tk) AS term, doc_id FROM docs),
        |cnts AS (SELECT lang, source, term, count(*) AS cnt FROM tc GROUP BY 1, 2, 3),
        |nterms AS (SELECT lang, source, count(*) AS n_terms FROM cnts GROUP BY 1, 2),
        |top AS (SELECT lang, source, term AS top_term FROM (
        |          SELECT lang, source, term,
        |            row_number() OVER (PARTITION BY lang, source
        |                               ORDER BY cnt DESC, term) AS rn
        |          FROM cnts) WHERE rn = 1)
        |SELECT base.lang, base.source, n_docs,
        |  floor(totchars::DOUBLE / n_docs * 100 + 0.5) / 100 AS avg_chars,
        |  n_tokens, n_terms,
        |  floor(n_terms::DOUBLE / n_tokens * 10000 + 0.5) / 10000 AS ttr,
        |  top_term
        |FROM base JOIN nterms USING (lang, source) JOIN top USING (lang, source)
        |ORDER BY lang, source""".stripMargin,

    "text_tfidf" ->
      """WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |              SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents)
        |            GROUP BY doc_id, term),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS nd FROM documents),
        |sc AS (SELECT doc_id, term, tf::DOUBLE * ln(nd::DOUBLE / df) AS score
        |       FROM tf JOIN dfx USING (term) CROSS JOIN n)
        |SELECT doc_id, rnk, term, floor(score * 10000 + 0.5) / 10000 AS score FROM (
        |  SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, term) AS INTEGER) AS rnk
        |  FROM sc) WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "text_langid" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(tk, t -> list_contains(['the','a','of','and','to'], t)))::DOUBLE / len(tk) AS s_en,
        |  len(list_filter(tk, t -> list_contains(['der','die','das','und','ist'], t)))::DOUBLE / len(tk) AS s_de,
        |  len(list_filter(tk, t -> list_contains(['le','la','et','les','des'], t)))::DOUBLE / len(tk) AS s_fr,
        |  len(list_filter(tk, t -> list_contains(['el','los','las','y','es'], t)))::DOUBLE / len(tk) AS s_es,
        |  len(list_filter(tk, t -> list_contains(['de','shi','bu','wo','zhe'], t)))::DOUBLE / len(tk) AS s_zh
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
        |       WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
        |       WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
        |       WHEN s_es >= s_zh THEN 'es'
        |       ELSE 'zh' END AS pred_lang,
        |  floor(s_en * 10000 + 0.5) / 10000 AS score_en
        |FROM sc ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text, str_split(text, ' ') AS tk FROM documents),
        |b AS (SELECT doc_id, len(tk) AS n_tok,
        |  list_aggregate(list_transform(tk, tok -> length(tok)::BIGINT), 'sum') AS sumlen,
        |  len(list_filter(tk, tok -> list_contains(['the','a','of','and','to'], tok))) AS nstop,
        |  length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha,
        |  length(text) AS tlen
        |  FROM t),
        |r AS (SELECT doc_id, n_tok, sumlen,
        |  nstop::DOUBLE / n_tok AS stop_ratio, alpha::DOUBLE / tlen AS alpha_ratio
        |  FROM b)
        |SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok,
        |  floor(sumlen::DOUBLE / n_tok * 100 + 0.5) / 100 AS avg_tok_len,
        |  floor(stop_ratio * 10000 + 0.5) / 10000 AS stop_ratio,
        |  floor(alpha_ratio * 10000 + 0.5) / 10000 AS alpha_ratio,
        |  floor((least(1.0, n_tok / 100.0) * 0.4 + stop_ratio * 0.3 + alpha_ratio * 0.3)
        |        * 10000 + 0.5) / 10000 AS quality
        |FROM r ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(str_split(text, ' ')) AS INTEGER) AS n_ws,
        |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS INTEGER) AS n_alpha,
        |  CAST(ceil(length(regexp_replace(text, '[^a-z]', '', 'g')) / 4.0) AS BIGINT) AS approx_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(str_split(text, ' '), t -> (length(t) * 17 + ascii(t))::BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_cols" ->
      """WITH m AS (
        |  SELECT struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars,
        |                     embedding := embedding, payload := encode(text)) AS m
        |  FROM documents JOIN embeddings ON doc_id = vec_id
        |)
        |SELECT m['doc_id'] AS doc_id, m['lang'] AS lang,
        |  CAST(octet_length(m['payload']) AS INTEGER) AS payload_bytes,
        |  CAST(len(m['embedding']) AS INTEGER) AS dim,
        |  m['embedding'][1]::DOUBLE AS e0
        |FROM m WHERE m['lang'] IN ('en', 'de') AND m['n_chars'] > 150
        |ORDER BY doc_id""".stripMargin
  )
}
