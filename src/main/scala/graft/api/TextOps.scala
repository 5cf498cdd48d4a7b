package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det

/** Text analysis for training-data pipelines: corpus stats, TF-IDF,
  * language-ID, quality scoring, token counting, fingerprinting. All
  * arithmetic follows the Det discipline so results are bit-stable.
  */
object TextOps {

  /** Per-group corpus stats: doc count, avg chars, token totals,
    * type/token ratio, top term (count desc, term asc).
    */
  def stats(df: DataFrame, textCol: String, charsCol: String,
            groupCols: Seq[String]): DataFrame = {
    val docs = df.withColumn("tk", split(col(textCol), " "))
    val gc = groupCols.map(col)
    val base = docs.groupBy(gc: _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(charsCol)).as("totchars"),
        sum(size(col("tk"))).as("n_tokens"))
    val tc = docs.select(gc :+ explode(col("tk")).as("term"): _*)
      .groupBy(groupCols.head, groupCols.tail :+ "term": _*).agg(count(lit(1)).as("cnt"))
    val nterms = tc.groupBy(gc: _*).agg(count(lit(1)).as("n_terms"))
    val wt = Window.partitionBy(gc: _*).orderBy(col("cnt").desc, col("term"))
    val top = tc.withColumn("rn", row_number().over(wt)).filter(col("rn") === 1)
      .select(gc :+ col("term").as("top_term"): _*)
    base.join(nterms, groupCols).join(top, groupCols)
      .select(gc ++ Seq(col("n_docs"),
        Det.round2(col("totchars").cast("double") / col("n_docs")).as("avg_chars"),
        col("n_tokens"), col("n_terms"),
        Det.round4(col("n_terms").cast("double") / col("n_tokens")).as("ttr"),
        col("top_term")): _*)
  }

  /** Top-`topN` TF-IDF terms per document (tf = raw count,
    * idf = ln(N/df), tiebreak term asc).
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, topN: Int): DataFrame = {
    // r17: fan out the tokenize+explode (guide §2.5; no-op at scale)
    val tf = Scale.fanout(df)
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    tf.join(dfx, "term").crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") * log(col("nd").cast("double") / col("df")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col(idCol), col("rnk"), col("term"), col("score"))
  }

  /** Stopword-profile language-ID: hit ratio per language marker set,
    * argmax with a fixed tie order.
    */
  def langId(df: DataFrame, textCol: String,
             profiles: Seq[(String, Seq[String])]): DataFrame = {
    val t = df.withColumn("tk", split(col(textCol), " "))
    // Marker words are bound as literal Columns (never spliced into SQL
    // text) — a word containing a quote is data, not syntax.
    val scored = profiles.foldLeft(t) { case (acc, (lang, words)) =>
      val warr = array(words.map(lit): _*)
      acc.withColumn(s"s_$lang",
        size(filter(col("tk"), tk => array_contains(warr, tk))).cast("double") /
          size(col("tk")))
    }
    val pred = profiles.map(_._1).init.zipWithIndex.foldRight(lit(profiles.last._1)) {
      case ((lang, i), els) =>
        val rest = profiles.map(_._1).drop(i + 1).map(l => col(s"s_$l"))
        when(col(s"s_$lang") >= (if (rest.size == 1) rest.head else greatest(rest: _*)), lang)
          .otherwise(els)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Quality scoring: token stats, stopword + alpha ratios, and a
    * fixed-formula composite in [0, 1].
    */
  def quality(df: DataFrame, textCol: String, stopwords: Seq[String]): DataFrame = {
    val warr = array(stopwords.map(lit): _*) // literal Columns — see langId
    df.withColumn("tk", split(col(textCol), " "))
      .withColumn("n_tok", size(col("tk")))
      .withColumn("sumlen", expr("aggregate(tk, 0L, (a, t) -> a + length(t))"))
      .withColumn("nstop", size(filter(col("tk"), t => array_contains(warr, t))))
      .withColumn("alpha", length(regexp_replace(col(textCol), "[^a-z]", "")))
      .withColumn("stop_ratio", col("nstop").cast("double") / col("n_tok"))
      .withColumn("alpha_ratio", col("alpha").cast("double") / length(col(textCol)))
      .withColumn("score",
        least(lit(1.0), col("n_tok") / lit(100.0)) * 0.4 +
          col("stop_ratio") * 0.3 + col("alpha_ratio") * 0.3)
  }

  /** Corpus text normalization (the pass that runs before dedup/stats in
    * a real pipeline): lowercase, strip non-[a-z0-9 ], collapse runs of
    * spaces, trim. Pure per-row codegen'd string ops — no shuffle; the
    * regexes are deliberately ASCII-simple so they mean the same thing
    * in every regex dialect.
    */
  def normalize(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("norm_text",
      trim(regexp_replace(regexp_replace(lower(col(textCol)),
        "[^a-z0-9 ]", ""), "  +", " ")))

  /** Whitespace tokens, alpha char count, and a chars/4 BPE-ish token
    * estimate.
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws", size(split(col(textCol), " ")))
      .withColumn("n_alpha", length(regexp_replace(col(textCol), "[^a-z]", "")))
      .withColumn("approx_bpe", ceil(col("n_alpha") / lit(4.0)))

  /** PII patterns for [[piiRedact]]. Deliberately dialect-neutral regex
    * (character classes + bounded repetition only — no lookaround, no
    * backreferences) so Java's regex engine and DuckDB's RE2 match the
    * exact same spans.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** PII scrub pass (the redaction step a corpus runs before release):
    * replace email addresses with `<EMAIL>` and NNN-NNNN phone-like
    * tokens with `<PHONE>`, counting each. Emails are redacted FIRST so
    * digit runs inside an address are never double-counted as phones.
    * Pure per-row codegen'd regex ops — narrow, no shuffle, scales
    * linearly with the corpus.
    */
  def piiRedact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("__t1", regexp_replace(col(textCol), EmailRe, "<EMAIL>"))
      .withColumn("n_phones", regexp_count(col("__t1"), lit(PhoneRe)))
      .withColumn("redacted", regexp_replace(col("__t1"), PhoneRe, "<PHONE>"))
      .drop("__t1")

  /** Corpus-self-trained bigram language-model score per document (the
    * CCNet-style LM quality filter): avg log P(w_i | w_{i-1}) under
    * add-1 smoothing, with the bigram/unigram tables estimated from the
    * corpus itself. Low scores = improbable token sequences (boilerplate,
    * mangled text); the score ranks docs for quality filtering.
    *
    * Dataflow: positional explode → bigram join against the two count
    * tables (token-keyed shuffles; at 100 TB the count tables are the
    * only corpus-wide state and they are domain-bounded by vocabulary,
    * not corpus size) → per-doc logs re-assembled IN TOKEN ORDER
    * (sort_array of (pos, logp) structs) and summed by a sequential
    * left fold, so the float sum is bit-stable and replayable.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // r17: fan out the tokenize+explode (guide §2.5; no-op at scale)
    val toks = Scale.fanout(df).select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val big = toks.withColumn("prev",
        lag(col("tok"), 1).over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("prev").isNotNull)
    val c2 = big.groupBy("prev", "tok").agg(count(lit(1)).as("c2"))
    val c1 = toks.groupBy(col("tok").as("prev")).agg(count(lit(1)).as("c1"))
    val vocab = toks.agg(countDistinct("tok").as("v"))
    val scored = big.join(c2, Seq("prev", "tok"))
      .join(c1, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double")))
    scored.groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("pos"), col("logp")))).as("arr"))
      .withColumn("n_bigrams", size(col("arr")))
      .withColumn("sum_logp",
        expr("aggregate(arr, 0D, (a, x) -> a + x.logp)"))
      .withColumn("avg_logp", col("sum_logp") / col("n_bigrams"))
      .select(col(idCol), col("n_bigrams"), col("avg_logp"))
  }

  /** Order-sensitive rolling-hash fingerprint over tokens (polynomial
    * mod 1e9+7, exact integer arithmetic).
    */
  def fingerprint(textCol: String): Column =
    expr(s"""aggregate(transform(split($textCol, ' '), t -> cast(length(t) * 17 + ascii(t) as bigint)),
            |          0L, (a, b) -> (a * 31 + b) % 1000000007L)""".stripMargin)

  /** Gopher-style repetition signals per document: duplicate-token
    * fraction, most-frequent-token fraction, and most-frequent-bigram
    * fraction. High values flag boilerplate/looped text that a quality
    * gate drops before training.
    *
    * Dataflow: every groupBy is keyed by the document id, so the shuffles
    * are per-doc (never corpus-wide state) and the operator scales
    * linearly — a 100 TB corpus is just more doc-keyed partitions.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // r17: fan out the tokenize (guide §2.5; `t` feeds three consumers,
    // each exploding differently — parallel beats materialized here)
    val t = Scale.fanout(df).withColumn("tk", split(col(textCol), " "))
      .withColumn("n_tok", size(col("tk")))
      .withColumn("n_uniq", size(array_distinct(col("tk"))))
    val topTok = t.select(col(idCol), explode(col("tk")).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max(col("c")).as("top_tok_c"))
    val topBg = t.filter(col("n_tok") >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, n_tok - 1), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("bg"))
      .groupBy(idCol, "bg").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max(col("c")).as("top_bg_c"))
    t.join(topTok, Seq(idCol)).join(topBg, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        ((col("n_tok") - col("n_uniq")).cast("double") / col("n_tok")).as("dup_tok_frac"),
        (col("top_tok_c").cast("double") / col("n_tok")).as("top_tok_frac"),
        coalesce(col("top_bg_c").cast("double") / (col("n_tok") - 1), lit(0.0)).as("top_bigram_frac"))
  }

  /** Chunk-sharing boilerplate signal: split each doc into
    * non-overlapping `chunkTokens`-token chunks; a chunk appearing in
    * >= 2 distinct docs is shared, and the per-doc shared fraction
    * flags templated/partially-copied text (the overlap granularity
    * between whole-doc exact dedup and shingle near-dup). Chunks ride
    * the shuffle as 60-bit md5 hashes; both shuffles are chunk-hash /
    * doc-keyed — linear in the corpus, output O(docs). Exact-duplicate
    * docs share every chunk by construction (share_frac = 1).
    */
  def chunkShare(df: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int = 10): DataFrame = {
    // r17: fan out the chunk-hash derivation (guide §2.5)
    val ch = Scale.fanout(df).withColumn("tk", split(col(textCol), " "))
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, greatest(size(tk), 1), $chunkTokens), i -> concat_ws(' ', slice(tk, i, $chunkTokens)))")).as("chunk"))
      .withColumn("h", element_at(
        graft.functions.Signatures.md5_prefix(array(col("chunk")), 15), 1))
    val sharing = ch.groupBy("h").agg(countDistinct(idCol).as("ndocs"))
    ch.join(sharing, "h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("share_frac",
        col("n_shared").cast("double") / col("n_chunks"))
  }

  /** BM25 relevance of each document against a fixed query term set
    * (k1 = 1.2, b = 0.75 folded into literal constants so the float
    * arithmetic replays bit-identically cross-engine). The per-doc score
    * is assembled by a FIXED left-to-right addition over the query terms
    * (one pivoted column per term) — never a sum() aggregate, whose
    * accumulation order is engine-defined.
    *
    * Scale shape: the corpus is scanned once; the only corpus-wide state
    * is (N, sum dl) and per-term df — O(|query|) rows, broadcast. The
    * tf explode filters to query terms map-side, so the shuffle carries
    * only matching (doc, term) rows.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String]): DataFrame = {
    // r17: fan out the tokenize (guide §2.5)
    val t = Scale.fanout(df).withColumn("tk", split(col(textCol), " "))
      .withColumn("dl", size(col("tk")))
    val stats = t.agg(count(lit(1)).as("n"), sum(col("dl").cast("long")).as("sumdl"))
    val tf = t.select(col(idCol), col("dl"), explode(col("tk")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(idCol, "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5))) *
          (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl").cast("double") * col("n").cast("double") / col("sumdl").cast("double")))))
    val perDoc = scored.groupBy(idCol).pivot("term", terms).agg(first(col("s")))
    val score = terms.map(tm => coalesce(col(s"`$tm`"), lit(0.0))).reduceLeft(_ + _)
    perDoc.select(col(idCol) +: terms.map(tm => col(s"`$tm`")) :+ score.as("score"): _*)
  }

  /** Zipf rank-frequency fit per group: least-squares slope/intercept
    * of ln(freq) over ln(rank) across the group's `topR` most frequent
    * terms (count desc, term asc — deterministic ranking). Natural
    * corpora sit near slope -1; a flatter slope flags templated or
    * synthetic text, a steeper one a collapsed vocabulary — the
    * corpus-distribution health check that per-document signals
    * (text_quality, text_repetition) cannot see.
    *
    * Determinism: the four regression sums are SEQUENTIAL left folds
    * over the rank-sorted (rank, count) list — both engines fold the
    * identical sequence with identical IEEE op order, leaving only ln
    * ulp differences (~1e-13) under the callers' round4 guard. The
    * term count is the only corpus-sized shuffle (group+term keyed);
    * ranking is a group-keyed window over the bounded vocabulary and
    * the fold list holds at most `topR` entries per group. */
  def zipfFit(df: DataFrame, groupCol: String, textCol: String,
              topR: Int): DataFrame = {
    // r17: fan out the tokenize+explode (guide §2.5)
    val tc = Scale.fanout(df)
      .select(col(groupCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("cnt"))
    val wr = Window.partitionBy(col(groupCol)).orderBy(col("cnt").desc, col("term"))
    tc.withColumn("r", row_number().over(wr)).filter(col("r") <= topR)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_terms"),
        sort_array(collect_list(struct(col("r"), col("cnt")))).as("arr"))
      // a single-term group has only rank 1 (ln(1)=0), so the slope
      // denominator n*sx2 - sx² is exactly 0 — the fit is undefined.
      // Drop such degenerate groups deliberately (the oracle mirrors
      // this with HAVING count(*) >= 2) instead of emitting NaN rows.
      .filter(col("n_terms") >= 2)
      .withColumn("sx", expr("aggregate(arr, 0D, (a, e) -> a + ln(e.r))"))
      .withColumn("sy", expr("aggregate(arr, 0D, (a, e) -> a + ln(e.cnt))"))
      .withColumn("sxy", expr("aggregate(arr, 0D, (a, e) -> a + ln(e.r) * ln(e.cnt))"))
      .withColumn("sx2", expr("aggregate(arr, 0D, (a, e) -> a + ln(e.r) * ln(e.r))"))
      .withColumn("nd", col("n_terms").cast("double"))
      .withColumn("slope",
        (col("nd") * col("sxy") - col("sx") * col("sy")) /
          (col("nd") * col("sx2") - col("sx") * col("sx")))
      .select(col(groupCol), col("n_terms"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("nd")).as("intercept"))
  }

  /** Character-distribution signals (the gibberish / boilerplate
    * filter the length-and-stopword heuristics miss): per document,
    * the Shannon entropy of the CHARACTER distribution in bits
    * (`log2(n) - (Σ c·log2(c))/n` — low for repeated-character spam
    * and template boilerplate, ~4.1 for natural English) and the most
    * frequent character's share. Determinism follows the lmScore
    * discipline: the per-char term sum is a SEQUENTIAL left fold over
    * the counts sorted by character (both engines fold the identical
    * sequence; log2 ulp differences sit ~1e-13 under the round4 guard
    * the callers apply). Per-doc state is bounded by the character
    * set, and both shuffles — (doc, char) counts, then per-doc — are
    * doc-keyed; nothing global. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // r17: fan out the per-character explode (guide §2.5)
    val cc = Scale.fanout(df)
      .select(col(idCol), explode(split(col(textCol), "")).as("c"))
      .groupBy(col(idCol), col("c")).agg(count(lit(1)).as("cnt"))
    cc.groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n"), max(col("cnt")).as("max_cnt"),
        sort_array(collect_list(struct(col("c"), col("cnt")))).as("arr"))
      .withColumn("__s",
        expr("aggregate(arr, 0D, (a, x) -> a + x.cnt * log2(x.cnt))"))
      .select(col(idCol), col("n").as("n_chars_split"),
        (log2(col("n").cast("double")) - col("__s") / col("n")).as("char_entropy"),
        (col("max_cnt").cast("double") / col("n")).as("top_char_ratio"))
  }
}
