package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One learned BPE merge: at `rank`, the adjacent symbol pair
  * (`lft`, `rgt`) — selected with weighted frequency `cnt` — fuses
  * into `lft + rgt`. */
case class BpeMerge(rank: Int, lft: String, rgt: String, cnt: Long)

/** Deterministic byte-pair encoding (Sennrich et al. 2016 — the
  * subword tokenizer every modern training-data pipeline runs), built
  * so the ENTIRE algorithm — training and encoding — replays
  * bit-identically in the DuckDB oracle:
  *
  *  - **Training operates on the word-frequency table**, not the
  *    corpus: one corpus-wide shuffle aggregates words to (word, cnt),
  *    and every merge round then touches only the vocabulary — the
  *    standard scale shape (a 100 TB corpus has a bounded vocabulary;
  *    the loop's per-round shuffle is vocabulary-sized, and the only
  *    driver transfer is ONE winning-pair row per round, the same
  *    bound as Similarity.pqTrainCodebooks' per-round centroid stats).
  *  - **Symbol sequences are delimiter-wrapped strings**, one symbol
  *    as ` sym `, so applying a merge is ONE `replace()`
  *    call: SQL replace substitutes occurrences LEFT-TO-RIGHT
  *    NON-OVERLAPPING — exactly BPE's greedy merge application — and
  *    the two-sided delimiters make a pair pattern unambiguous (no
  *    substring of a longer symbol can match). Spark and DuckDB
  *    `replace` share these semantics, so both engines run the SAME
  *    algorithm rather than two implementations hoped equal.
  *  - **Pair counting is overlapping** (the zip convention: `aaa`
  *    counts (a,a) twice), weighted by word count, in exact integer
  *    arithmetic; ties break lexicographically on (lft, rgt) — both
  *    engines compare ASCII strings identically (the fixture corpus is
  *    ASCII; non-BMP text would need a codepoint-stable tokenizer
  *    before trusting `regexp_replace('(.)')` cross-engine).
  *  - **Encoding** replays the learned merges in rank order as a
  *    chain of `replace()` calls over each wrapped word — fully
  *    codegen'd column expressions, no UDF anywhere.
  */
object Bpe {

  private val US = "\u001F" // symbol-start delimiter (ASCII unit sep)
  private val RS = "\u001E" // symbol-end delimiter (ASCII record sep)

  /** The wrapped-encoding scheme reserves U+001E/U+001F as symbol
    * delimiters; input text containing either would corrupt symsOf's
    * split SILENTLY (mis-merged symbols, not an error). Guard every
    * entry point: a violating document fails the job loudly with this
    * message instead of breaking the bit-identical-replay guarantee. */
  private def guardDelims(text: Column): Column =
    when(text.contains(US) || text.contains(RS),
      raise_error(lit("BPE input contains a reserved delimiter code " +
        "point (U+001E/U+001F) — strip control characters before " +
        "training/encoding (the wrapped-symbol scheme reserves them)")))
      .otherwise(text)

  /** Corpus word-frequency table: whitespace tokens, empties dropped.
    * The ONE corpus-sized aggregation of the whole trainer. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    // r17: fan out the tokenize+explode (guide §2.5 — single-split local
    // scans otherwise run the corpus-sized pass in one task; no-op on a
    // production multi-file layout).
    Scale.fanout(docs)
      .select(explode(split(guardDelims(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** A word wrapped to its initial symbol sequence: each character as
    * ` c `. */
  private def wrap(word: Column): Column =
    regexp_replace(word, "(.)", US + "$1" + RS)

  /** The symbol list of a wrapped encoding (split on the end
    * delimiter, strip the start delimiter, drop the trailing empty). */
  private def symsOf(enc: Column): Column =
    filter(transform(split(enc, RS), x => x.substr(lit(2), lit(1 << 24))),
      x => x =!= "")

  private def mergeOnce(enc: Column, lft: String, rgt: String): Column =
    replace(enc, lit(US + lft + RS + US + rgt + RS), lit(US + lft + rgt + RS))

  /** Train `nMerges` merges on the corpus. Per round: overlapping
    * adjacent-pair counts over the CURRENT symbol sequences (weighted
    * by word count, exact longs), winner = max count with
    * lexicographic (lft, rgt) tie-break, applied greedily
    * left-to-right. Returns fewer merges only if the vocabulary fuses
    * completely first (never at any fixture SF — the 31-word corpus
    * supports 100+ merges). */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[BpeMerge] = {
    val wf = wordFreq(docs, textCol).cache()
    var enc: Column = wrap(col("word"))
    val out = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    try {
      for (r <- 0 until nMerges) {
        val best = wf.select(col("cnt"), symsOf(enc).as("syms"))
          .filter(size(col("syms")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(syms[i-1] AS lft, syms[i] AS rgt))")).as("p"))
          .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
          .agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("lft"), col("rgt"))
          .limit(1).collect()
        if (best.isEmpty) return out.toSeq
        val row = best.head
        out += BpeMerge(r, row.getString(0), row.getString(1), row.getLong(2))
        enc = mergeOnce(enc, row.getString(0), row.getString(1))
      }
      out.toSeq
    } finally wf.unpersist()
  }

  /** Sample-train / full-encode (round-13 verdict item 4 — the
    * standard corpus-scale BPE discipline): merges learned on a
    * DETERMINISTIC stratified sample ([[Sampling.stratified]]'s
    * md5-ranked per-stratum prefix, so the oracle replays the sample
    * bit-for-bit), then applied to the FULL corpus via
    * [[encodeWord]]/[[docTokens]]. At 100 TB this turns [[train]]'s
    * O(nMerges × corpus-aggregate) training term into O(nMerges ×
    * sample): every merge round's word-frequency pass sees only the
    * sample, and the full corpus is touched exactly once by the
    * codegen'd encode chain — BENCH_SCALE measures the training term
    * flat across the factor-100 sweep. */
  def trainSampled(docs: DataFrame, idCol: String, strataCols: Seq[String],
                   textCol: String, nMerges: Int,
                   frac: Double): Seq[BpeMerge] =
    train(Sampling.stratified(docs, idCol, strataCols, frac),
      textCol, nMerges)

  /** The learned merge table as a DataFrame — the `text_bpe_vocab`
    * shape: (rank, lft, rgt, merged, cnt). */
  def vocabDf(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    train(docs, textCol, nMerges)
      .map(m => (m.rank, m.lft, m.rgt, m.lft + m.rgt, m.cnt))
      .toDF("rank", "lft", "rgt", "merged", "cnt")
  }

  /** BPE token array of a word column: the merge chain in rank order —
    * `merges.size` codegen'd `replace()` calls — then the symbol
    * split. Usable inside higher-order lambdas (see [[docTokens]]). */
  def encodeWord(word: Column, merges: Seq[BpeMerge]): Column =
    symsOf(merges.foldLeft(wrap(word))((e, m) => mergeOnce(e, m.lft, m.rgt)))

  /** A document's BPE token stream: per whitespace word, the word's
    * BPE tokens, concatenated in document order. Pure column
    * expressions — flatten/transform/filter — no UDF, no shuffle. */
  def docTokens(text: Column, merges: Seq[BpeMerge]): Column =
    flatten(transform(filter(split(guardDelims(text), " "), w => w =!= ""),
      w => encodeWord(w, merges)))

  // ---------- DuckDB oracle generators ----------

  /** The training replay as a chained-CTE prefix (the
    * stream_delta_trigger / k-means unroll pattern): `wf` → `w0` and,
    * per round r, pair counts `p_r` (overlapping, weighted), winner
    * `b_r` (ORDER BY c DESC, lft, rgt LIMIT 1), and `w_{r+1}` (one
    * replace). Same algorithm, same tie-breaks, same delimiters as
    * [[train]]. */
  def trainOracleCtes(nMerges: Int, table: String = "documents",
                      textCol: String = "text"): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH wf AS MATERIALIZED (
         |  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split($textCol, ' ')) AS w FROM $table)
         |  WHERE w <> '' GROUP BY w),
         |w0 AS MATERIALIZED (SELECT word, cnt,
         |         regexp_replace(word, '(.)', chr(31) || '\\1' || chr(30), 'g') AS enc
         |       FROM wf)""".stripMargin)
    for (r <- 0 until nMerges) {
      sb.append(
        s""",
           |p$r AS MATERIALIZED (SELECT syms[i] AS lft, syms[i+1] AS rgt,
           |         CAST(sum(cnt) AS BIGINT) AS c
           |       FROM (SELECT cnt, list_filter(list_transform(
           |               string_split(enc, chr(30)), x -> x[2:]),
           |               x -> x <> '') AS syms FROM w$r),
           |            unnest(generate_series(1, len(syms) - 1)) AS u(i)
           |       GROUP BY 1, 2),
           |b$r AS MATERIALIZED (SELECT lft, rgt, c FROM p$r ORDER BY c DESC, lft, rgt LIMIT 1),
           |w${r + 1} AS MATERIALIZED (SELECT word, cnt,
           |         replace(enc, chr(31) || b.lft || chr(30) || chr(31) || b.rgt || chr(30),
           |                 chr(31) || b.lft || b.rgt || chr(30)) AS enc
           |       FROM w$r, b$r b)""".stripMargin)
    }
    sb.toString
  }

  /** Full `text_bpe_vocab` oracle: the training unroll, winners
    * union-ed in rank order. `table` may be any FROM-able SQL (a
    * parenthesized aliased subquery included) — the sample-trained
    * keys pass the deterministic stratified sample here. */
  def vocabOracleSql(nMerges: Int, table: String = "documents"): String = {
    val unions = (0 until nMerges).map(r =>
      s"SELECT CAST($r AS INTEGER) AS rank, lft, rgt, lft || rgt AS merged, c AS cnt FROM b$r")
      .mkString("\nUNION ALL\n")
    s"""${trainOracleCtes(nMerges, table)}
       |$unions
       |ORDER BY rank""".stripMargin
  }

  /** The encode expression over a word SQL expression: the merge chain
    * as nested replaces reading each round's winner from its
    * (cross-joined, single-row) `b_r` alias `m_r`. */
  private def encodeOracleExpr(wordSql: String, nMerges: Int): String =
    (0 until nMerges).foldLeft(
      s"regexp_replace($wordSql, '(.)', chr(31) || '\\1' || chr(30), 'g')") {
      (e, r) =>
        s"replace($e, chr(31) || m$r.lft || chr(30) || chr(31) || m$r.rgt || chr(30), " +
          s"chr(31) || m$r.lft || m$r.rgt || chr(30))"
    }

  /** The document BPE-token-stream list expression (list-level —
    * document word order preserved) over the cross-joined single-row
    * winner tables `m0..m{n-1}`. */
  private def docToksListSql(nMerges: Int): String = {
    val enc = encodeOracleExpr("w", nMerges)
    s"""flatten(list_transform(
       |          list_filter(string_split(text, ' '), w -> w <> ''),
       |          w -> list_filter(list_transform(
       |                 string_split($enc, chr(30)), x -> x[2:]),
       |               x -> x <> '')))""".stripMargin
  }

  private def winnerAliases(nMerges: Int): String =
    (0 until nMerges).map(r => s"b$r AS m$r").mkString(", ")

  /** `corpus_chunk_bpe` oracle: training unroll (over `trainTable` —
    * the FULL corpus or a deterministic sample), then each FULL-corpus
    * document's BPE token stream chunked exactly like corpus_chunk
    * (32-token chunks at stride 24). */
  def chunkOracleSql(nMerges: Int, chunk: Int, stride: Int,
                     trainTable: String = "documents"): String = {
    s"""${trainOracleCtes(nMerges, trainTable)},
       |d AS MATERIALIZED (SELECT doc_id,
       |        ${docToksListSql(nMerges)} AS toks
       |      FROM documents, ${winnerAliases(nMerges)}),
       |s AS (SELECT doc_id, toks,
       |             unnest(generate_series(0, greatest(len(toks) - 1, 0), $stride)) AS st
       |      FROM d)
       |SELECT doc_id, st // $stride AS chunk_id,
       |       CAST(len(toks[st + 1 : least(st + $chunk, len(toks))]) AS BIGINT) AS chunk_tok,
       |       array_to_string(toks[st + 1 : least(st + $chunk, len(toks))], ' ') AS chunk_text
       |FROM s ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** `corpus_pack_bpe` oracle: training unroll, then corpus_pack's
    * per-language head-to-tail packing over BPE token COUNTS. */
  def packOracleSql(nMerges: Int, packTokens: Int): String = {
    s"""${trainOracleCtes(nMerges)},
       |d AS MATERIALIZED (SELECT doc_id, lang,
       |        len(${docToksListSql(nMerges)}) AS n_tok
       |      FROM documents, ${winnerAliases(nMerges)}),
       |c AS (SELECT lang, doc_id, n_tok,
       |        sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM d)
       |SELECT lang, CAST((cum - n_tok) // $packTokens AS BIGINT) AS pack_id,
       |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens
       |FROM c GROUP BY lang, (cum - n_tok) // $packTokens
       |ORDER BY lang, pack_id""".stripMargin
  }
}
