package graft.api

import org.apache.spark.sql.{Column, DataFrame}

/** One parsed PATTERN element: a pattern variable with its quantifier.
  * `isGap` marks an UNDEFINED `var*` element — the MATCH_RECOGNIZE
  * idiom for relaxed contiguity (an undefined variable matches any
  * row, so `A g1* B` is exactly Flink CEP's `followedBy`: irrelevant
  * rows between the steps are skipped). Gap elements carry no step.
  * `altVars` non-empty marks a bounded ALTERNATION group `(a | b)` —
  * one step consuming exactly one row of ONE alternative; `variable`
  * then holds the first (preferred) alternative and the spec expands
  * to per-branch patterns ([[MrSpec.expandBranches]]).
  * `excluded` marks an element inside SQL:2016 exclusion `{- X -}` —
  * matched normally, omitted from ALL ROWS PER MATCH output
  * ([[MatchRecognize.run]]'s applyExclusion filter).
  */
case class MrElem(variable: String, minRep: Int, maxRep: Option[Int],
                  greedy: Boolean, negated: Boolean, isGap: Boolean,
                  altVars: Seq[String] = Nil, excluded: Boolean = false)

/** One MEASURES entry: verbatim expression text and its alias. */
case class MrMeasure(exprSql: String, alias: String)

/** One parsed DEFINE navigation call — `PREV(var.col [, n])` /
  * `NEXT(var.col [, n])` / `FIRST(var.col [, n])` /
  * `LAST(var.col [, n])` — SQL:2016 row-pattern navigation (all four
  * are standard; Flink SQL documents PREV/FIRST/LAST in DEFINE, so
  * NEXT here is standard-complete rather than Flink-mirrored).
  *  - `PREV`/`NEXT` navigate the PARTITION: the row `n` before/after
  *    the current row in (orderBy) order, whatever variable matched
  *    it — the standard's physical navigation (default n = 1). The
  *    variable only scopes the expression, exactly as in Flink.
  *  - `FIRST`/`LAST` navigate the MATCH: the (n+1)-th / n-th-from-last
  *    row CONSUMED by `variable` in the current attempt (default
  *    n = 0) — Flink `IterativeCondition.getEventsForPattern`.
  * A navigation whose target row does not (yet) exist evaluates to
  * SQL null, so its comparison is false — both engines agree. */
case class MrNav(fn: String, variable: String, colName: String, n: Int) {
  require(Set("PREV", "NEXT", "FIRST", "LAST")(fn), s"unknown navigation $fn")
  require(n >= 0, s"negative navigation offset $n")
}

/** One navigation conjunct of a DEFINE predicate, normalized to
  * `<current-row column> <op> <navigation>` (a nav-first conjunct is
  * stored with the comparison flipped; `<>` canonicalizes to `!=`).
  * Navigation columns are read as doubles — the engine's CEP value
  * model — so navigation comparisons are numeric. */
case class MrNavCond(leftCol: String, op: String, nav: MrNav)

/** One AGGREGATE conjunct of a DEFINE predicate (Flink SQL's
  * `SUM(A.price) < 100` — an aggregate over the rows a pattern
  * variable has consumed SO FAR in the current attempt, the
  * IterativeCondition surface), normalized to
  * `AGG(var.col) <op> <numeric literal>` (a literal-first conjunct is
  * stored flipped). SQL:2016 evaluates DEFINE aggregates with RUNNING
  * semantics: when the aggregate's variable IS the step being tested,
  * the current row is included tentatively. `colName` None is
  * `COUNT(var.*)`. Values compare as doubles; NULL columns are skipped
  * by the aggregate (SQL), and an empty scope makes SUM/AVG/MIN/MAX
  * NULL → comparison false. */
case class MrAggCond(func: String, variable: String, colName: Option[String],
                     op: String, rhs: Double) {
  require(Set("COUNT", "SUM", "AVG", "MIN", "MAX")(func),
    s"unknown DEFINE aggregate $func")
  require(colName.nonEmpty || func == "COUNT",
    s"DEFINE $func($variable.*): only COUNT takes *")
}

/** One prepared input row of the navigation executor
  * ([[MatchRecognize.run]] on a nav-bearing spec): the per-step
  * CONTEXT-FREE predicate results (`cf`, evaluated by Catalyst before
  * the per-key matcher — the declarative part stays codegen'd) plus the
  * navigation columns as doubles (`nv`, null → NaN → comparison false,
  * SQL's unknown). */
private[graft] case class MrIterRow(k: Long, ts: java.sql.Timestamp, ord: Long,
                                    cf: Seq[Boolean], nv: Seq[Double],
                                    vl: Double)

/** One resolved navigation condition of the executor: positions into
  * [[MrIterRow]].nv plus the navigated step's pattern index. */
private[graft] case class MrNavExec(leftIdx: Int, op: String, fn: String,
                                    navStepIdx: Int, navColIdx: Int, n: Int)

/** One resolved aggregate condition of the executor: the scoped
  * step's pattern index, the aggregated column's position into
  * [[MrIterRow]].nv (-1 = COUNT(var.*)), and the comparison. */
private[graft] case class MrAggExec(func: String, aggStepIdx: Int,
                                    colIdx: Int, op: String, rhs: Double)

/** A MEASURES entry resolved by the GENERAL measures routes (beyond
  * the single compiled `SUM(col) AS step_sums` form):
  * `MATCH_NUMBER()` (SQL:2016 — the match's 1-based sequence number
  * within its partition, in anchor order), `CLASSIFIER()` (the
  * consuming pattern variable — see [[MrClassifier]]), or
  * `[RUNNING|FINAL] AGG([var.]col | var.* | *)` with AGG one of
  * COUNT / SUM / AVG / MIN / MAX / FIRST / LAST.
  *  - `variable` scopes the aggregate to the rows CONSUMED BY that
  *    pattern variable (Flink/SQL:2016 `SUM(A.value)`); absent, it
  *    ranges over every consumed row of the match.
  *  - `running = None` means the mode default of SQL:2016 §R(7):
  *    RUNNING in ALL ROWS PER MATCH, FINAL in ONE ROW PER MATCH
  *    (where the two coincide anyway — the output row IS the final
  *    row). RUNNING aggregates range over consumed rows up to and
  *    including the current row; FINAL over the whole match.
  *  - `FIRST`/`LAST` return the named column of the scope's first /
  *    last consumed row; the optional offset (`FIRST(a.col, n)` —
  *    SQL:2016 logical navigation, also Flink's measure surface) moves
  *    n rows inward (FIRST: the (n+1)-th consumed row, LAST: the
  *    n-th from last). A scope with too few rows yields SQL null. */
sealed trait MrResolvedMeasure { def alias: String }
case class MrMatchNumber(alias: String) extends MrResolvedMeasure
/** SQL:2016 `CLASSIFIER()`: the pattern variable that consumed the
  * row — per consumed row in ALL ROWS PER MATCH, the LAST row's
  * variable in ONE ROW PER MATCH (the output row is the final row). */
case class MrClassifier(alias: String) extends MrResolvedMeasure
case class MrAggMeasure(func: String, variable: Option[String],
                        colName: Option[String], running: Option[Boolean],
                        alias: String, n: Int = 0) extends MrResolvedMeasure {
  require(Set("COUNT", "SUM", "AVG", "MIN", "MAX", "FIRST", "LAST")(func),
    s"unknown measure aggregate $func")
  require(n == 0 || func == "FIRST" || func == "LAST",
    s"measure offset is only meaningful for FIRST/LAST, got $func(..., $n)")
  require(n >= 0, s"negative measure offset $n")
}

/** A measure pre-resolved for the SEAL-AWARE STREAMING matcher
  * (StreamOps.cepPatternMeasures): plain serializable data the
  * executor evaluates per sealed match at emission.
  *  - `func`: COUNT/SUM/AVG/MIN/MAX/FIRST/LAST over the event `value`
  *    (the CEP event model's one numeric column), or MATCH_NUMBER /
  *    CLASSIFIER.
  *  - `scopeSteps`: the ORIGINAL-step indices the scope covers (a
  *    variable or SUBSET union), None = every consumed row.
  *  - `n`: the FIRST/LAST logical-navigation offset. */
case class MrStreamMeasure(func: String, scopeSteps: Option[Set[Int]],
                           alias: String, n: Int = 0)

/** A parsed MATCH_RECOGNIZE clause, resolved against this library's
  * CEP model ([[CepPattern]]/[[CepCondPattern]]).
  *
  *  - `strict` came from the gap analysis: a pattern whose consecutive
  *    defined steps are ALL separated by gap elements (or by negated
  *    steps, which constrain the gap they sit in) is relaxed
  *    contiguity; no separators anywhere is strict (the SQL:2016
  *    default); a mix is rejected at parse time.
  *  - `skip`'s target names the pattern VARIABLE; [[toSymbolic]] maps
  *    it to the step symbol when the defines are symbol equalities.
  */
case class MrSpec(partitionBy: Seq[String], orderBy: Seq[String],
                  measures: Seq[MrMeasure], allRows: Boolean,
                  skip: CepSkip, withinMinutes: Option[Int],
                  elems: Seq[MrElem], defines: Seq[(String, String)],
                  strict: Boolean, fromTable: Option[String],
                  navConds: Map[String, Seq[MrNavCond]] = Map.empty,
                  subsets: Seq[(String, Seq[String])] = Nil,
                  aggConds: Map[String, Seq[MrAggCond]] = Map.empty,
                  permute: Boolean = false,
                  anchorStart: Boolean = false,
                  anchorEnd: Boolean = false) {

  private[graft] def defMap = defines.toMap

  /** The defined elements, in pattern order — the steps. */
  def stepElems: Seq[MrElem] = elems.filterNot(_.isGap)

  /** Does the spec need the per-key ITERATIVE matcher — a DEFINE whose
    * predicate is match-relative (navigation) or attempt-relative
    * (aggregate condition)? Such specs have no compiled symbolic form. */
  def isIterative: Boolean = navConds.nonEmpty || aggConds.nonEmpty

  /** Does the pattern carry an alternation group `(a | b)` or a
    * `PERMUTE(...)`? Such a spec executes as the UNION of its expanded
    * branches. */
  def hasAlternation: Boolean = elems.exists(_.altVars.nonEmpty) || permute

  /** The per-branch single-variable specs of an alternation pattern:
    * the cross product of every group's alternatives, in LEFTMOST-
    * PREFERENCE order (branch 0 = every group's first alternative —
    * the regex alternation priority; the union dedupes overlapping
    * anchors by this order). Each branch keeps only the DEFINEs and
    * navigation conjuncts its own variables use, so per-branch
    * validation and resolution (symbolic / value-predicate) run
    * unchanged. A `PERMUTE(a, b, c)` pattern expands to the n!
    * orderings in LEXICOGRAPHIC order of the declared variable
    * positions (SQL:2016's specified expansion order — which thereby
    * also fixes the leftmost-preference dedup: the declared ordering
    * wins a contested anchor). Identity when no alternation is
    * present. */
  def expandBranches: Seq[MrSpec] = {
    if (permute) {
      // every branch uses every variable, so no per-branch DEFINE
      // filtering is needed; Seq.permutations of the declared order
      // yields the orderings lexicographically
      return elems.permutations.map(es =>
        copy(elems = es, permute = false)).toSeq
    }
    if (!hasAlternation) return Seq(this)
    val choices = elems.foldLeft(Seq(Seq.empty[MrElem])) { (acc, e) =>
      if (e.altVars.isEmpty) acc.map(_ :+ e)
      else acc.flatMap(pre => e.altVars.map(v =>
        pre :+ e.copy(variable = v, altVars = Nil)))
    }
    choices.map { es =>
      val usedVars = es.filterNot(_.isGap).map(_.variable).toSet
      copy(elems = es, defines = defines.filter(d => usedVars(d._1)),
        navConds = navConds.filter(c => usedVars(c._1)),
        aggConds = aggConds.filter(c => usedVars(c._1)))
    }
  }

  /** When every DEFINE is a bare symbol equality `col = 'lit'` on ONE
    * common column, the pattern is symbolic: returns (symbol column,
    * [[CepPattern]] over the literals). Otherwise None → [[toCond]].
    */
  def toSymbolic: Option[(String, CepPattern)] = {
    if (isIterative) return None // nav/agg DEFINEs are match-relative
    require(!hasAlternation,
      "an alternation pattern has no single compiled form — " +
        "MatchRecognize.run expands it to per-branch patterns " +
        "(expandBranches) and unions them")
    val SymEq = """^\s*([A-Za-z_]\w*)\s*=\s*'((?:[^']|'')*)'\s*$""".r
    val parsed = defines.map { case (v, p) =>
      p match {
        case SymEq(c, lit) => Some((v, c, lit.replace("''", "'")))
        case _ => None
      }
    }
    if (parsed.exists(_.isEmpty)) return None
    val cols = parsed.flatten.map(_._2).distinct
    if (cols.size != 1) return None
    val lit = parsed.flatten.map(t => t._1 -> t._3).toMap
    val steps = stepElems.map(e =>
      CepStep(lit(e.variable), e.minRep, e.maxRep, e.negated, e.greedy))
    val skipMapped = skip match {
      case SkipToFirst(v) => SkipToFirst(lit(v))
      case SkipToLast(v) => SkipToLast(lit(v))
      case s => s
    }
    Some((cols.head, CepPattern(steps, withinMinutes, skipMapped, strict)))
  }

  /** The value-predicate form: each step's DEFINE text becomes its
    * [[CepCondStep]] predicate verbatim (variable prefixes already
    * stripped by the parser) — [[Cep.compileWhere]]'s input. */
  def toCond: CepCondPattern = {
    require(!hasAlternation,
      "an alternation pattern has no single compiled form — " +
        "MatchRecognize.run expands it to per-branch patterns " +
        "(expandBranches) and unions them")
    require(!isIterative,
      "DEFINE navigation (PREV/FIRST/LAST) and aggregate conditions " +
        "are match-relative — no derived-symbol CASE can express them; " +
        "MatchRecognize.run routes such specs to the per-key iterative " +
        "matcher automatically")
    CepCondPattern(
      stepElems.map(e => CepCondStep(e.variable, defMap(e.variable),
        e.minRep, e.maxRep, e.negated, e.greedy)),
      withinMinutes, skip, strict)
  }

  /** The step variables a measure scope name covers: the SUBSET's
    * members when `v` names one (SQL:2016 union variables — measure
    * scopes only in this engine), else `v` itself. */
  def scopeMembers(v: String): Seq[String] =
    subsets.collectFirst { case (n, ms) if n == v => ms }.getOrElse(Seq(v))

  /** The compiled-MEASURES value column, when the MEASURES clause is
    * the one supported form `SUM(<col>) AS step_sums` (this library's
    * compiled MEASURES aggregate exact cents of ONE value column per
    * step into `step_sums` — see [[Cep.compileMeasures]]). */
  def measuresValCol: Option[String] = {
    if (measures.isEmpty) return None
    val Sum = """(?i)^\s*SUM\s*\(\s*(?:[A-Za-z_]\w*\s*\.\s*)?([A-Za-z_]\w*)\s*\)\s*$""".r
    measures match {
      case Seq(MrMeasure(Sum(c), "step_sums")) => Some(c)
      case _ => None
    }
  }

  /** Resolve ONE measure entry of the simple grammar —
    * `MATCH_NUMBER()`, `CLASSIFIER()`, or
    * `[RUNNING|FINAL] AGG([var.]col | var.* | *)` — to its
    * [[MrResolvedMeasure]]; None when the text is not one simple call
    * (the EXPRESSION decomposer then takes over —
    * [[MatchRecognize.resolveMeasuresWithExprs]]). Variable scopes
    * must be DEFINEd pattern steps (a gap consumes rows no measure
    * should see — it is not a variable the standard lets you
    * reference either). */
  private[graft] def resolveMeasureEntry(txt: String,
                                         alias: String): Option[MrResolvedMeasure] = {
    val MatchNum = """(?i)^\s*MATCH_NUMBER\s*\(\s*\)\s*$""".r
    val Classifier = """(?i)^\s*CLASSIFIER\s*\(\s*\)\s*$""".r
    val Agg = ("""(?i)^\s*(?:(RUNNING|FINAL)\s+)?""" +
      """(COUNT|SUM|AVG|MIN|MAX|FIRST|LAST)\s*\(\s*""" +
      """(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*|\*)""" +
      """(?:\s*,\s*(\d+))?\s*\)\s*$""").r
    // alternation alternatives are scopable too — a measure over `c`
    // in PATTERN (s (c | v) p) ranges over rows the winning branch's
    // c step consumed (null when the v branch won)
    val stepVars = stepElems.flatMap(e =>
      if (e.altVars.nonEmpty) e.altVars else Seq(e.variable)).toSet ++
      subsets.map(_._1)
    txt match {
      case MatchNum() => Some(MrMatchNumber(alias))
      case Classifier() => Some(MrClassifier(alias))
      case Agg(rf, fn, v, c, nOff) =>
        val func = fn.toUpperCase
        val variable = Option(v)
        val colName = if (c == "*") None else Some(c)
        val n = Option(nOff).map(_.toInt).getOrElse(0)
        variable.foreach(vv => require(stepVars(vv),
          s"MEASURES $func($vv.$c): '$vv' is not a defined pattern " +
            "step or SUBSET name"))
        require(colName.nonEmpty || func == "COUNT",
          s"MEASURES $func(${variable.map(_ + ".").getOrElse("")}*): " +
            "only COUNT takes *")
        Some(MrAggMeasure(func, variable, colName,
          Option(rf).map(_.equalsIgnoreCase("RUNNING")), alias, n))
      case _ => None
    }
  }

  /** The GENERAL measures resolution ([[MrResolvedMeasure]]) — every
    * MEASURES entry must be one SIMPLE call of the grammar above; an
    * entry that is an arithmetic EXPRESSION over such calls resolves
    * via [[MatchRecognize.resolveMeasuresWithExprs]] (the run()
    * routes use that), and anything else rejects with a pointer. */
  def resolveMeasures: Seq[MrResolvedMeasure] =
    measures.map(m => resolveMeasureEntry(m.exprSql, m.alias).getOrElse(
      throw new IllegalArgumentException(
        "unsupported MEASURES entry: expected MATCH_NUMBER(), " +
          "CLASSIFIER(), [RUNNING|FINAL] COUNT/SUM/AVG/MIN/MAX/" +
          "FIRST/LAST([var.]col), or an arithmetic expression over " +
          "those calls (run() resolves expressions; this simple " +
          "resolution does not), got: " + m.exprSql)))
}

/** SQL `MATCH_RECOGNIZE` front door for the CEP engine: parses the
  * standard clause text (SQL:2016 subset + Flink's `WITHIN`) into the
  * library's [[CepPattern]]/[[CepCondPattern]] model, so a Flink SQL
  * user ports their MATCH_RECOGNIZE query as TEXT instead of
  * hand-translating it to `CepStep(...)` calls. The matcher, compiler,
  * and generated DuckDB oracles are untouched — this is a front end.
  *
  * Supported surface:
  * {{{
  * [SELECT * FROM <table>]
  * MATCH_RECOGNIZE (
  *   PARTITION BY key
  *   ORDER BY ts, ord                      -- tiebreak column REQUIRED
  *   [MEASURES measure AS alias [, ...]]   -- see MEASURES forms below
  *   [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW
  *                     | TO FIRST var | TO LAST var]
  *   PATTERN ( elem... )
  *   [WITHIN INTERVAL 'n' MINUTE|HOUR|DAY]
  *   [SUBSET name = (var [, var...]) [, ...]]
  *   DEFINE var AS predicate [, ...]
  * )
  * }}}
  * MEASURES forms: exactly `SUM(<col>) AS step_sums` compiles the
  * per-step exact-cents sums INTO the gaps-and-islands plan
  * ([[Cep.compileMeasures]] — fully codegen'd, ONE ROW PER MATCH
  * only). Every other clause takes the GENERAL route: each entry is
  * `MATCH_NUMBER()`, `CLASSIFIER()`,
  * `[RUNNING|FINAL] AGG([var.]col | var.* | *)`
  * with AGG ∈ COUNT/SUM/AVG/MIN/MAX/FIRST/LAST (FIRST/LAST take an
  * optional SQL:2016 offset, `FIRST(a.col, n)`)
  * ([[MrSpec.resolveMeasureEntry]]; a scope may also name a SUBSET
  * union variable — the aggregate then ranges over the members'
  * combined consumed rows), OR a scalar EXPRESSION over such
  * calls — arithmetic (`LAST(a.v) - FIRST(a.v)`, `SUM(v) / COUNT(*)`),
  * comparisons, `CASE WHEN`, `||` concatenation (CLASSIFIER() may be a
  * sub-term), literals, and whitelisted deterministic scalar wrappers
  * (ABS/ROUND/FLOOR/CAST/COALESCE/CONCAT/...), with bare `[var.]col`
  * as SQL:2016's implicit LAST —
  * ([[resolveMeasuresWithExprs]]: hidden sub-measures + one
  * post-aggregation projection), executed over the matcher's
  * consumed-row projection by one per-match hash aggregation (ONE ROW
  * — [[runMeasures]]) or per-match windows (ALL ROWS —
  * [[runAllRowsMeasures]], where RUNNING is the default and frames
  * end at the current consumption position).
  *
  * Pattern elements: `var` with quantifier `+ * ? {m} {m,} {m,n}`,
  * each optionally reluctant (`+?`, `{m,n}?` — the SQL:2016
  * non-greedy marker); `!var` is this library's extension for Flink
  * CEP's `notFollowedBy` (absent from SQL MATCH_RECOGNIZE — Flink SQL
  * cannot express it either). An UNDEFINED variable with a greedy `*`
  * is a GAP marker: `A g* B` means relaxed contiguity (`followedBy`) —
  * the standard MATCH_RECOGNIZE idiom for "anything in between", and
  * the only role undefined variables may play here (contiguity is
  * pattern-global in [[CepPattern]], so gaps must separate either ALL
  * consecutive steps or none; negated steps count as separators since
  * they constrain the gap they sit in). `ALL ROWS PER MATCH` routes to
  * the per-key row-level executor (StreamOps.cepAllRowsPattern — one
  * output row per CONSUMED row; see [[runAllRows]] for its schema and
  * input requirements). Bounded alternation is the GROUP form
  * `(a | b)` over single DEFINEd variables (executed as the union of
  * expanded branches with leftmost-branch anchor dedup, SKIP TO NEXT
  * ROW only — see [[runAlternation]]; Flink SQL rejects alternation
  * entirely).
  *
  * COMPOSITION (round 11): the three match-relative DEFINE surfaces —
  * navigation (`PREV`/`NEXT`/`FIRST`/`LAST`), aggregate conditions
  * (`SUM(A.price) <= 100`, Flink's IterativeCondition), and
  * alternation — each compose with general MEASURES and with ALL ROWS
  * PER MATCH: every route produces the SAME consumed-row projection
  * (symbolic → [[consumedRows]], iterative → [[runIterConsumed]],
  * alternation → [[alternationConsumed]]) and the measures executors
  * run over whichever one the spec needs. The only excluded cross:
  * the compiled `SUM(col) AS step_sums` shape on the iterative /
  * alternation routes (its per-step semantics belong to the compiled
  * plan — rejected with the general-measures alternative named).
  *
  * Not supported, by documented design: top-level sequence
  * alternation, and `followedByAny` (no SQL surface exists); SQL:2016
  * exclusion `{- X -}` IS supported as an ALL-ROWS output filter (see
  * line ~724 and [[applyExclusion]]). [[render]] is the inverse
  * — it emits canonical
  * clause text from a DSL pattern, and round-tripping is
  * property-tested over every declared pattern in CepSqlSpec.
  */
object MatchRecognize {

  // ---------- tokenizer ----------

  private sealed trait Tok { def text: String; def a: Int; def b: Int }
  private case class TId(text: String, a: Int, b: Int) extends Tok
  private case class TNum(text: String, a: Int, b: Int) extends Tok
  private case class TStr(text: String, a: Int, b: Int) extends Tok
  private case class TSym(text: String, a: Int, b: Int) extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      // SQL comments: `--` to end of line, `/* */` block. Skipped like
      // whitespace, so MATCH_RECOGNIZE inside a comment neither diverts
      // the session parser nor reaches the clause parser.
      else if (c == '-' && i + 1 < s.length && s(i + 1) == '-') {
        while (i < s.length && s(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < s.length && s(i + 1) == '*') {
        val st = i
        i += 2
        while (i + 1 < s.length && !(s(i) == '*' && s(i + 1) == '/')) i += 1
        if (i + 1 >= s.length) throw new IllegalArgumentException(
          s"unterminated block comment at offset $st")
        i += 2
      } else if (c.isLetter || c == '_') {
        val st = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TId(s.substring(st, i), st, i)
      } else if (c.isDigit) {
        val st = i
        while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
        out += TNum(s.substring(st, i), st, i)
      } else if (c == '\'') {
        val st = i
        i += 1
        var done = false
        while (!done) {
          if (i >= s.length) throw new IllegalArgumentException(
            s"unterminated string literal at offset $st")
          if (s(i) == '\'') {
            if (i + 1 < s.length && s(i + 1) == '\'') i += 2 // '' escape
            else { i += 1; done = true }
          } else i += 1
        }
        out += TStr(s.substring(st, i), st, i)
      } else {
        out += TSym(c.toString, i, i + 1)
        i += 1
      }
    }
    out.result()
  }

  private def kw(t: Tok, w: String): Boolean =
    t.isInstanceOf[TId] && t.text.equalsIgnoreCase(w)

  // ---------- parser ----------

  /** Does the statement contain a MATCH_RECOGNIZE CLAUSE — the keyword
    * as a real token (not inside a string literal or comment — the
    * tokenizer skips both) immediately followed by `(`? The parser
    * front end's divert guard: `SELECT 'MATCH_RECOGNIZE'`, commented-out
    * clauses, and a column that merely NAMES match_recognize all stay
    * with the stock parser. Returns false (never throws) on text our
    * tokenizer cannot scan — such a statement belongs to the stock
    * parser by definition. */
  def hasClause(sql: String): Boolean =
    try {
      val ts = tokenize(sql)
      ts.indices.exists(i => kw(ts(i), "MATCH_RECOGNIZE") &&
        i + 1 < ts.length && ts(i + 1).text == "(")
    } catch { case _: Exception => false }

  /** Parse a MATCH_RECOGNIZE clause (bare, or embedded in a
    * `SELECT * FROM t MATCH_RECOGNIZE (...)` statement). */
  def parse(sql: String): MrSpec = {
    val toks = tokenize(sql)
    val mrIdx = toks.indexWhere(kw(_, "MATCH_RECOGNIZE"))
    require(mrIdx >= 0, "no MATCH_RECOGNIZE keyword in input")
    // The statement context must be EXACTLY `SELECT * FROM <tbl>` (or
    // nothing — the bare clause form). Anything else — a select list,
    // INSERT INTO prefix, WHERE/ORDER BY/LIMIT after the clause — would
    // be silently discarded if accepted, returning wrong rows/columns
    // with no error; reject with a pointer at the supported surface.
    val prefix = toks.take(mrIdx)
    val fromTable = prefix.map(_.text.toUpperCase) match {
      case Vector() => None
      case Vector("SELECT", "*", "FROM", _) =>
        prefix(3) match {
          case TId(t, _, _) => Some(t)
          case o => fail(s"FROM needs a table identifier, got '${o.text}'")
        }
      case _ => fail("unsupported statement shape before MATCH_RECOGNIZE: " +
        "this front end runs exactly `SELECT * FROM <table> " +
        "MATCH_RECOGNIZE (...)` (or the bare clause) — a select list, " +
        "INSERT context, or subquery prefix would be silently dropped. " +
        s"Got: ${prefix.map(_.text).mkString(" ")}")
    }
    require(mrIdx + 1 < toks.length && toks(mrIdx + 1).text == "(",
      "MATCH_RECOGNIZE must be followed by a parenthesized clause body")
    // body = tokens to the matching close paren
    var depth = 0
    var end = -1
    var j = mrIdx + 1
    while (end < 0 && j < toks.length) {
      toks(j).text match {
        case "(" => depth += 1
        case ")" => depth -= 1; if (depth == 0) end = j
        case _ =>
      }
      j += 1
    }
    require(end > 0, "unbalanced parens around MATCH_RECOGNIZE body")
    require(end == toks.length - 1,
      "unsupported tokens after the MATCH_RECOGNIZE clause (WHERE / " +
        "ORDER BY / LIMIT / aliases are not run by this front end — " +
        "apply them to the returned DataFrame instead): " +
        toks.drop(end + 1).map(_.text).mkString(" "))
    val body = toks.slice(mrIdx + 2, end)
    parseBody(sql, body, fromTable)
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def parseBody(src: String, ts: Vector[Tok],
                        fromTable: Option[String]): MrSpec = {
    var p = 0
    def peek: Option[Tok] = if (p < ts.length) Some(ts(p)) else None
    def at(w: String): Boolean = peek.exists(kw(_, w))
    def eatKw(w: String): Unit =
      if (at(w)) p += 1 else fail(s"expected $w, got ${peek.map(_.text).getOrElse("<end>")}")
    def eatSym(c: String): Unit =
      if (peek.exists(_.text == c)) p += 1
      else fail(s"expected '$c', got ${peek.map(_.text).getOrElse("<end>")}")
    def ident(): String = peek match {
      case Some(TId(t, _, _)) => p += 1; t
      case o => fail(s"expected identifier, got ${o.map(_.text).getOrElse("<end>")}")
    }

    // PARTITION BY col [, col...]
    eatKw("PARTITION"); eatKw("BY")
    val partition = Vector.newBuilder[String]
    partition += ident()
    while (peek.exists(_.text == ",") && p + 1 < ts.length &&
           !kw(ts(p + 1), "ORDER")) { p += 1; partition += ident() }

    // ORDER BY col [ASC] [, col [ASC]...]
    eatKw("ORDER"); eatKw("BY")
    val order = Vector.newBuilder[String]
    def orderItem(): Unit = { order += ident(); if (at("ASC")) p += 1 }
    orderItem()
    while (peek.exists(_.text == ",")) { p += 1; orderItem() }

    // A clause boundary, not just a keyword: ONE/ALL/AFTER/PATTERN/
    // WITHIN/DEFINE terminate MEASURES scanning only when they BEGIN a
    // syntactically valid clause (ONE ROW PER, AFTER MATCH SKIP,
    // PATTERN (, ...), so a measure referencing a column named e.g.
    // `pattern` or `all` does not mis-split the clause.
    def clauseStartAt(i: Int): Boolean = {
      def nx(j: Int, w: String) = j < ts.length && kw(ts(j), w)
      (kw(ts(i), "ONE") && nx(i + 1, "ROW") && nx(i + 2, "PER")) ||
      (kw(ts(i), "ALL") && nx(i + 1, "ROWS") && nx(i + 2, "PER")) ||
      (kw(ts(i), "AFTER") && nx(i + 1, "MATCH") && nx(i + 2, "SKIP")) ||
      (kw(ts(i), "PATTERN") && i + 1 < ts.length && ts(i + 1).text == "(") ||
      (kw(ts(i), "WITHIN") && nx(i + 1, "INTERVAL")) ||
      (kw(ts(i), "DEFINE") && i + 1 < ts.length &&
        ts(i + 1).isInstanceOf[TId] && nx(i + 2, "AS"))
    }

    // MEASURES expr AS alias [, ...]
    val measures = Vector.newBuilder[MrMeasure]
    if (at("MEASURES")) {
      p += 1
      var more = true
      while (more) {
        val st = p
        var d = 0
        while (p < ts.length &&
               !(d == 0 && (ts(p).text == "," || clauseStartAt(p)))) {
          if (ts(p).text == "(") d += 1
          if (ts(p).text == ")") d -= 1
          p += 1
        }
        val entry = ts.slice(st, p)
        require(entry.length >= 3 && kw(entry(entry.length - 2), "AS"),
          s"MEASURES entry needs `expr AS alias`: ${entry.map(_.text).mkString(" ")}")
        val alias = entry.last.text
        val exprTxt = src.substring(entry.head.a, entry(entry.length - 3).b)
        measures += MrMeasure(exprTxt, alias)
        if (peek.exists(_.text == ",")) p += 1 else more = false
      }
    }

    // ONE ROW PER MATCH | ALL ROWS PER MATCH
    var allRows = false
    if (at("ONE")) { p += 1; eatKw("ROW"); eatKw("PER"); eatKw("MATCH") }
    else if (at("ALL")) { p += 1; eatKw("ROWS"); eatKw("PER"); eatKw("MATCH"); allRows = true }

    // AFTER MATCH SKIP ...
    var skip: CepSkip = SkipPastLastRow
    if (at("AFTER")) {
      p += 1; eatKw("MATCH"); eatKw("SKIP")
      if (at("PAST")) { p += 1; eatKw("LAST"); eatKw("ROW") }
      else {
        eatKw("TO")
        if (at("NEXT")) { p += 1; eatKw("ROW"); skip = SkipToNextRow }
        else if (at("FIRST")) { p += 1; skip = SkipToFirst(ident()) }
        else if (at("LAST")) { p += 1; skip = SkipToLast(ident()) }
        else fail("AFTER MATCH SKIP TO needs NEXT ROW | FIRST var | LAST var")
      }
    }

    // PATTERN ( elem... )
    eatKw("PATTERN"); eatSym("(")
    val elems = scala.collection.mutable.ArrayBuffer.empty[MrElem]
    var permute = false
    // SQL:2016 anchors: `^` pins the match start to the PARTITION's
    // first row, `$` the match end to its last (Flink SQL rejects both
    // — a beyond-Flink completion). Anchors consume no rows and do not
    // change matching — they are a match-level filter (applyAnchors).
    var anchorStart = false
    var anchorEnd = false
    if (peek.exists(_.text == "^")) { p += 1; anchorStart = true }
    // SQL:2016 PERMUTE(a, b, c) — must be the WHOLE pattern: it
    // expands to the n! orderings (bounded alternation — Flink SQL
    // rejects PERMUTE entirely, so this is a beyond-Flink completion),
    // n capped at 4 because the branch count is factorial.
    if (peek.exists(t => kw(t, "PERMUTE")) &&
        p + 1 < ts.length && ts(p + 1).text == "(") {
      p += 1; eatSym("(")
      val vs = Vector.newBuilder[String]
      vs += ident()
      while (peek.exists(_.text == ",")) { p += 1; vs += ident() }
      eatSym(")")
      // the consume-nothing '$' anchor may follow (PERMUTE(...) $) —
      // it pins ends, never multiplies branches
      require(peek.exists(t => t.text == ")" || t.text == "$"),
        "PERMUTE(...) must be the whole PATTERN — composing it with " +
          "other elements would multiply the factorial branch count; " +
          "restructure the pattern (the '$' anchor is the one allowed " +
          "suffix)")
      val perm = vs.result()
      require(perm.size >= 2, "PERMUTE needs at least two variables")
      require(perm.size <= 4,
        s"PERMUTE over ${perm.size} variables expands to " +
          s"${(1 to perm.size).product} branches — capped at 4 " +
          "variables (24 branches); restructure the pattern")
      require(perm.distinct.size == perm.size,
        s"duplicate variable in PERMUTE: ${perm.mkString(", ")}")
      perm.foreach(v => elems += MrElem(v, 1, Some(1), greedy = true,
        negated = false, isGap = false))
      permute = true
    }
    // bounded alternation group `(a | b [| c...])` — single variables,
    // one row each, no group quantifier (each branch is one expanded
    // pattern; a quantified or nested group multiplies branches
    // without a distinct-symbol compiled form)
    def parseOneElem(): Unit = {
      if (peek.exists(_.text == "(")) {
        p += 1
        val vs = Vector.newBuilder[String]
        vs += ident()
        while (peek.exists(_.text == "|")) { p += 1; vs += ident() }
        eatSym(")")
        val alts = vs.result()
        require(alts.size >= 2,
          "a parenthesized PATTERN group must be an alternation " +
            "`(a | b)` — a single-variable group is redundant")
        require(alts.distinct.size == alts.size,
          s"duplicate variable in alternation: ${alts.mkString(" | ")}")
        if (peek.exists(t => Set("+", "*", "?", "{")(t.text))) fail(
          "a quantifier on an alternation group is not supported — " +
            "each group consumes exactly one row of one alternative")
        elems += MrElem(alts.head, 1, Some(1), greedy = true,
          negated = false, isGap = false, altVars = alts)
      } else {
        val negated = peek.exists(_.text == "!")
        if (negated) p += 1
        val v = ident()
        // quantifier
        var (mn, mx): (Int, Option[Int]) = (1, Some(1))
        var greedy = true
        var sawQuant = false
        peek.map(_.text) match {
          case Some("+") => p += 1; mn = 1; mx = None; sawQuant = true
          case Some("*") => p += 1; mn = 0; mx = None; sawQuant = true
          case Some("?") => p += 1; mn = 0; mx = Some(1); sawQuant = true
          case Some("{") =>
            p += 1; sawQuant = true
            def num(): Int = peek match {
              case Some(TNum(t, _, _)) => p += 1; t.toInt
              case o => fail(s"expected number in quantifier, got ${o.map(_.text).getOrElse("<end>")}")
            }
            val lo = num()
            if (peek.exists(_.text == ",")) {
              p += 1
              if (peek.exists(_.text == "}")) { mn = lo; mx = None }
              else { mn = lo; mx = Some(num()) }
            } else { mn = lo; mx = Some(lo) }
            eatSym("}")
          case _ =>
        }
        if (sawQuant && peek.exists(_.text == "?")) { p += 1; greedy = false }
        require(!negated || (!sawQuant),
          s"!$v: a negated step (notFollowedBy) takes no quantifier")
        elems += MrElem(v, mn, mx, greedy, negated, isGap = false)
      }
    }
    while (peek.exists(_.text != ")")) {
      // SQL:2016 exclusion `{- elems -}`: matched normally, omitted
      // from ALL ROWS PER MATCH output (Flink SQL rejects exclusion —
      // a beyond-Flink completion; see applyExclusion)
      if (peek.exists(_.text == "{") &&
          p + 1 < ts.length && ts(p + 1).text == "-") {
        p += 2
        val start = elems.size
        var closed = false
        while (!closed) {
          if (peek.forall(_.text == ")"))
            fail("unterminated exclusion {- ... -} in PATTERN")
          if (peek.exists(_.text == "-") &&
              p + 1 < ts.length && ts(p + 1).text == "}") { p += 2; closed = true }
          else parseOneElem()
        }
        require(elems.size > start, "empty exclusion {- -} in PATTERN")
        for (i <- start until elems.size)
          elems(i) = elems(i).copy(excluded = true)
      } else if (peek.exists(_.text == "$")) {
        p += 1
        require(peek.exists(_.text == ")"),
          "'$' anchor must be the LAST element of PATTERN")
        anchorEnd = true
      } else if (peek.exists(_.text == "^")) fail(
        "'^' anchor must be the FIRST element of PATTERN")
      else if (peek.exists(t => t.text == "{" || t.text == "|")) fail(
        s"'${peek.get.text}' in PATTERN: top-level sequence alternation " +
          "is not supported (bounded alternation is the GROUP form " +
          "`(a | b)` over single variables) and a bare '{' is only a " +
          "quantifier after a variable or the exclusion opener '{-'")
      else parseOneElem()
    }
    eatSym(")")

    // SUBSET name = (var [, var...]) [, ...] — SQL:2016 union
    // variables; this engine resolves them as MEASURES scopes
    // (`SUM(u.col)` over the union's consumed rows). Accepted before
    // or after WITHIN (the standard places SUBSET directly after
    // PATTERN; Flink's WITHIN extension sits between).
    val subsets = Vector.newBuilder[(String, Seq[String])]
    def parseSubsets(): Unit = if (at("SUBSET")) {
      p += 1
      var more = true
      while (more) {
        val name = ident()
        eatSym("=")
        eatSym("(")
        val ms = Vector.newBuilder[String]
        ms += ident()
        while (peek.exists(_.text == ",")) { p += 1; ms += ident() }
        eatSym(")")
        subsets += ((name, ms.result()))
        if (peek.exists(_.text == ",")) p += 1 else more = false
      }
    }
    parseSubsets()

    // WITHIN INTERVAL 'n' unit
    var within: Option[Int] = None
    if (at("WITHIN")) {
      p += 1; eatKw("INTERVAL")
      val n = peek match {
        case Some(TStr(t, _, _)) => p += 1; t.stripPrefix("'").stripSuffix("'").trim.toInt
        case Some(TNum(t, _, _)) => p += 1; t.toInt
        case o => fail(s"expected INTERVAL value, got ${o.map(_.text).getOrElse("<end>")}")
      }
      val unit = ident().toUpperCase
      within = Some(unit match {
        case "MINUTE" | "MINUTES" => n
        case "HOUR" | "HOURS" => n * 60
        case "DAY" | "DAYS" => n * 1440
        case u => fail(s"unsupported WITHIN unit $u (MINUTE/HOUR/DAY)")
      })
    }

    parseSubsets()

    // DEFINE var AS predicate [, ...]  — context-free predicates kept
    // verbatim; navigation conjuncts (PREV/FIRST/LAST) parsed to
    // structured [[MrNavCond]]s, the rest re-joined as the variable's
    // context-free part
    val defines = Vector.newBuilder[(String, String)]
    val navByVar = Map.newBuilder[String, Seq[MrNavCond]]
    val aggByVar = Map.newBuilder[String, Seq[MrAggCond]]
    if (at("DEFINE")) {
      p += 1
      var more = true
      while (more) {
        val v = ident()
        eatKw("AS")
        val st = p
        var d = 0
        while (p < ts.length && !(d == 0 && ts(p).text == ",")) {
          if (ts(p).text == "(") d += 1
          if (ts(p).text == ")") d -= 1
          p += 1
        }
        require(p > st, s"empty DEFINE predicate for $v")
        val (cfSql, navs, aggs) = splitNavDefine(src, ts.slice(st, p))
        defines += ((v, cfSql))
        if (navs.nonEmpty) navByVar += ((v, navs))
        if (aggs.nonEmpty) aggByVar += ((v, aggs))
        if (peek.exists(_.text == ",")) p += 1 else more = false
      }
    }
    require(p == ts.length,
      s"unexpected trailing tokens: ${ts.drop(p).map(_.text).mkString(" ")}")

    finish(partition.result(), order.result(), measures.result(), allRows,
      skip, within, elems.toVector, defines.result(), fromTable,
      navByVar.result(), subsets.result(), aggByVar.result(), permute,
      anchorStart, anchorEnd)
  }

  private val NavFns = Set("PREV", "NEXT", "FIRST", "LAST")
  private val AggFns = Set("COUNT", "SUM", "AVG", "MIN", "MAX")

  /** Split a DEFINE predicate into its context-free SQL (var prefixes
    * stripped, kept verbatim when no navigation/aggregate is present),
    * its parsed navigation conjuncts, and its parsed AGGREGATE
    * conjuncts (Flink's IterativeCondition surface, `SUM(A.price) <
    * 100`). The supported match-relative surface is a top-level AND of
    * conjuncts, each either plain SQL, exactly
    * `[var.]col <op> NAV(var.col [, n])`, or exactly
    * `AGG(var.col | var.*) <op> <number>` (either side — a call-first
    * conjunct stores the flipped comparison). A navigation/aggregate
    * call nested anywhere else is rejected with the grammar spelled
    * out. A DEFINE with only such conjuncts gets context-free part
    * `TRUE`. */
  private def splitNavDefine(
      src: String,
      toks: Vector[Tok]): (String, Seq[MrNavCond], Seq[MrAggCond]) = {
    def isCall(fns: Set[String])(p: Vector[Tok], i: Int): Boolean =
      p(i).isInstanceOf[TId] && fns(p(i).text.toUpperCase) &&
        i + 1 < p.length && p(i + 1).text == "("
    val isNavCall = isCall(NavFns) _
    val isAggCall = isCall(AggFns) _
    if (!toks.indices.exists(i => isNavCall(toks, i) || isAggCall(toks, i)))
      return (stripVarPrefixes(src, toks), Nil, Nil)
    // A top-level OR would make the AND-conjunct split silently
    // reassociate SQL's precedence (`x OR y AND PREV(v) < 3` is
    // `x OR (y AND ...)`, not `(x OR y) AND ...`) — reject loudly,
    // like every other unsupported navigation shape. Parenthesized
    // ORs inside a navigation-free conjunct stay supported (depth>0).
    var dOr = 0
    for (t <- toks) {
      if (t.text == "(") dOr += 1
      if (t.text == ")") dOr -= 1
      if (dOr == 0 && kw(t, "OR")) fail(
        "top-level OR in a navigation/aggregate-bearing DEFINE is not " +
          "supported — the match-relative grammar is a top-level AND of " +
          "conjuncts (parenthesize the OR inside one plain conjunct, " +
          s"or split the pattern): ${toks.map(_.text).mkString(" ")}")
    }
    // split on top-level AND
    val parts = Vector.newBuilder[Vector[Tok]]
    var cur = Vector.newBuilder[Tok]
    var d = 0
    for (t <- toks) {
      if (t.text == "(") d += 1
      if (t.text == ")") d -= 1
      if (d == 0 && kw(t, "AND")) { parts += cur.result(); cur = Vector.newBuilder[Tok] }
      else cur += t
    }
    parts += cur.result()
    val all = parts.result()
    all.foreach(c => require(c.nonEmpty, "empty AND conjunct in DEFINE"))
    val navs = Vector.newBuilder[MrNavCond]
    val aggs = Vector.newBuilder[MrAggCond]
    val cfParts = Vector.newBuilder[Vector[Tok]]
    for (c <- all) {
      val hasNav = c.indices.exists(isNavCall(c, _))
      val hasAgg = c.indices.exists(isAggCall(c, _))
      if (hasNav && hasAgg) fail(
        "a DEFINE conjunct mixing navigation and an aggregate call is " +
          "not supported — split it into separate AND conjuncts: " +
          c.map(_.text).mkString(" "))
      if (hasNav) navs += parseNavConjunct(c)
      else if (hasAgg) aggs += parseAggConjunct(c)
      else cfParts += c
    }
    val cfs = cfParts.result()
    val cf =
      if (cfs.isEmpty) "TRUE"
      else if (cfs.size == 1) stripVarPrefixes(src, cfs.head)
      else cfs.map(c => stripVarPrefixes(src, c)).mkString("(", ") AND (", ")")
    (cf, navs.result(), aggs.result())
  }

  /** Parse one aggregate conjunct — grammar in [[splitNavDefine]]. */
  private def parseAggConjunct(toks: Vector[Tok]): MrAggCond = {
    val grammar = "supported DEFINE aggregate conjunct grammar is " +
      "exactly `COUNT|SUM|AVG|MIN|MAX(var.col | var.*) <op> <number>` " +
      s"(either side) under a top-level AND; got: ${toks.map(_.text).mkString(" ")}"
    var i = 0
    def more = i < toks.length
    def ident(): String = toks(i) match {
      case TId(t, _, _) => i += 1; t
      case _ => fail(grammar)
    }
    def op(): String = {
      require(more && toks(i).isInstanceOf[TSym], grammar)
      val a = toks(i).text; i += 1
      val b = if (more && toks(i).isInstanceOf[TSym]) toks(i).text else ""
      (a, b) match {
        case ("<", "=") => i += 1; "<="
        case (">", "=") => i += 1; ">="
        case ("!", "=") => i += 1; "!="
        case ("<", ">") => i += 1; "!="
        case ("=", _) => "="
        case ("<", _) => "<"
        case (">", _) => ">"
        case _ => fail(grammar)
      }
    }
    def num(): Double = {
      val neg = more && toks(i).text == "-"
      if (neg) i += 1
      require(more, grammar)
      toks(i) match {
        case TNum(t, _, _) => i += 1; val v = t.toDouble; if (neg) -v else v
        case _ => fail(grammar)
      }
    }
    def aggCall(): (String, String, Option[String]) = {
      val fn = ident().toUpperCase
      require(AggFns(fn), grammar)
      require(more && toks(i).text == "(", grammar); i += 1
      val v = ident()
      require(more && toks(i).text == ".", grammar); i += 1
      val c = if (more && toks(i).text == "*") { i += 1; None }
              else Some(ident())
      require(more && toks(i).text == ")", grammar); i += 1
      (fn, v, c)
    }
    def flip(o: String): String = o match {
      case "<" => ">"
      case ">" => "<"
      case "<=" => ">="
      case ">=" => "<="
      case other => other
    }
    val callFirst = toks.head.isInstanceOf[TId] &&
      AggFns(toks.head.text.toUpperCase) &&
      toks.length > 1 && toks(1).text == "("
    val out =
      if (callFirst) {
        val (fn, v, c) = aggCall(); val o = op(); MrAggCond(fn, v, c, o, num())
      } else {
        val n = num(); val o = op(); val (fn, v, c) = aggCall()
        MrAggCond(fn, v, c, flip(o), n)
      }
    require(i == toks.length, grammar)
    out
  }

  /** Parse one navigation conjunct — see [[splitNavDefine]] for the
    * grammar. */
  private def parseNavConjunct(toks: Vector[Tok]): MrNavCond = {
    val grammar = "supported navigation conjunct grammar is exactly " +
      "`[var.]col <op> PREV|NEXT|FIRST|LAST(var.col [, n])` (either side) " +
      s"under a top-level AND; got: ${toks.map(_.text).mkString(" ")}"
    var i = 0
    def more = i < toks.length
    def ident(): String = toks(i) match {
      case TId(t, _, _) => i += 1; t
      case _ => fail(grammar)
    }
    // current-row reference: one or two dotted identifiers -> bare col
    def curRef(): String = {
      val a = ident()
      if (more && toks(i).text == ".") { i += 1; ident() } else a
    }
    def op(): String = {
      require(more && toks(i).isInstanceOf[TSym], grammar)
      val a = toks(i).text; i += 1
      val b = if (more && toks(i).isInstanceOf[TSym]) toks(i).text else ""
      (a, b) match {
        case ("<", "=") => i += 1; "<="
        case (">", "=") => i += 1; ">="
        case ("!", "=") => i += 1; "!="
        case ("<", ">") => i += 1; "!="
        case ("=", _) => "="
        case ("<", _) => "<"
        case (">", _) => ">"
        case _ => fail(grammar)
      }
    }
    def nav(): MrNav = {
      val fn = ident().toUpperCase
      require(NavFns(fn), grammar)
      require(more && toks(i).text == "(", grammar); i += 1
      val v = ident()
      require(more && toks(i).text == ".", grammar); i += 1
      val c = ident()
      val n = if (more && toks(i).text == ",") {
        i += 1
        require(more, grammar)
        toks(i) match {
          case TNum(t, _, _) if !t.contains(".") => i += 1; t.toInt
          case _ => fail(grammar)
        }
      } else if (fn == "PREV" || fn == "NEXT") 1 else 0
      require(more && toks(i).text == ")", grammar); i += 1
      MrNav(fn, v, c, n)
    }
    def flip(o: String): String = o match {
      case "<" => ">"
      case ">" => "<"
      case "<=" => ">="
      case ">=" => "<="
      case other => other
    }
    val navFirst = toks.head.isInstanceOf[TId] &&
      NavFns(toks.head.text.toUpperCase) &&
      toks.length > 1 && toks(1).text == "("
    val out =
      if (navFirst) { val nv = nav(); val o = op(); MrNavCond(curRef(), flip(o), nv) }
      else { val l = curRef(); val o = op(); MrNavCond(l, o, nav()) }
    require(i == toks.length, grammar)
    out
  }

  /** Rewrite `var.col` to `col` in a predicate, VERBATIM otherwise —
    * this model has no per-variable row references beyond the current
    * row, and both engines then read the bare column. Token-guided
    * splicing, so dots inside string literals are untouched. */
  private def stripVarPrefixes(src: String, toks: Vector[Tok]): String = {
    if (toks.isEmpty) return ""
    val cuts = toks.indices.dropRight(2).collect {
      case i if toks(i).isInstanceOf[TId] && toks(i + 1).text == "." &&
                toks(i + 2).isInstanceOf[TId] =>
        (toks(i).a, toks(i + 1).b)
    }
    val lo = toks.head.a
    val hi = toks.last.b
    val sb = new StringBuilder
    var pos = lo
    for ((a, b) <- cuts) { sb.append(src.substring(pos, a)); pos = b }
    sb.append(src.substring(pos, hi))
    sb.toString.trim
  }

  private def finish(partition: Seq[String], order: Seq[String],
                     measures: Seq[MrMeasure], allRows: Boolean, skip: CepSkip,
                     within: Option[Int], elems: Seq[MrElem],
                     defines: Seq[(String, String)],
                     fromTable: Option[String],
                     navConds: Map[String, Seq[MrNavCond]] = Map.empty,
                     subsets: Seq[(String, Seq[String])] = Nil,
                     aggConds: Map[String, Seq[MrAggCond]] = Map.empty,
                     permute: Boolean = false,
                     anchorStart: Boolean = false,
                     anchorEnd: Boolean = false): MrSpec = {
    val dupDefs = defines.map(_._1).groupBy(identity).collect {
      case (v, occ) if occ.size > 1 => v
    }
    require(dupDefs.isEmpty,
      s"variable DEFINEd more than once: ${dupDefs.mkString(", ")}")
    val defined = defines.map(_._1).toSet
    // PERMUTE: every variable must be DEFINEd (an undefined one would
    // be gap-classified with a misleading error), anchors must emit
    // independently for the per-anchor leftmost dedup, and the
    // match-relative DEFINE surfaces have no cross-ordering alignment
    if (permute) {
      for (e <- elems) require(defined(e.variable),
        s"PERMUTE variable ${e.variable} must be DEFINEd")
      require(skip == SkipToNextRow,
        "PERMUTE requires AFTER MATCH SKIP TO NEXT ROW (same rule as " +
          "alternation: per-anchor emission makes the declared-order " +
          "branch dedup exact)")
      require(navConds.isEmpty && aggConds.isEmpty,
        "PERMUTE with DEFINE navigation / aggregate conditions is not " +
          "supported — expand the orderings by hand")
    }
    // alternation groups: every alternative must be a DEFINEd step, and
    // the expansion must stay bounded; overlap-dedup (leftmost branch
    // preference at one anchor) is only well-defined when every anchor
    // emits independently — SKIP TO NEXT ROW (PAST LAST ROW's
    // cross-branch greedy chain would need a sequential walk)
    val nBranches = elems.map(e => math.max(e.altVars.size, 1)).product
    require(nBranches <= 16,
      s"alternation expands to $nBranches branches (cap 16 — bounded " +
        "alternation only; restructure the pattern)")
    for (e <- elems if e.altVars.nonEmpty; v <- e.altVars)
      require(defined(v),
        s"alternation variable $v must be DEFINEd (a gap cannot be an " +
          "alternative — it matches every row)")
    require(elems.forall(_.altVars.isEmpty) || skip == SkipToNextRow,
      "alternation requires AFTER MATCH SKIP TO NEXT ROW (per-anchor " +
        "emission makes the union's leftmost-branch dedup exact; a " +
        "cross-branch PAST-LAST-ROW chain would be a sequential scan)")
    // classify gaps: undefined vars are legal ONLY as greedy `*` gaps
    val tagged = elems.map { e =>
      if (defined(e.variable)) e
      else {
        require(!e.negated, s"!${e.variable}: a negated variable must be DEFINEd")
        require(e.minRep == 0 && e.maxRep.isEmpty && e.greedy,
          s"undefined variable ${e.variable} matches every row — only the " +
            s"relaxed-gap form `${e.variable}*` is meaningful (DEFINE it, " +
            "or quantify it with *)")
        e.copy(isGap = true)
      }
    }
    require(tagged.exists(!_.isGap), "PATTERN has no defined steps")
    require(!tagged.head.isGap && !tagged.last.isGap,
      "a gap variable cannot lead or trail the pattern (drop it — " +
        "matches are anchored at the first and last steps)")
    // Negated-step placement, validated BEFORE the contiguity analysis
    // (mirroring CepPattern's constructor) — otherwise e.g. `a g* !b`
    // reaches the gap analysis with no positive step pair and surfaces
    // an internal-invariant error instead of this message.
    require(!tagged.head.negated && !tagged.last.negated,
      "a negated step (!var) must sit between two positive steps " +
        "(Flink's notFollowedBy cannot start or end a pattern either)")
    // contiguity: consecutive POSITIVE steps are separated iff a gap or
    // a negated step lies between them; all separated -> relaxed,
    // none -> strict, mixed -> reject (contiguity is pattern-global)
    val posIdx = tagged.indices.filter(i => !tagged(i).isGap && !tagged(i).negated)
    val pairSep = posIdx.zip(posIdx.tail).map { case (a, b) =>
      (a + 1 until b).exists(i => tagged(i).isGap || tagged(i).negated)
    }
    val strict =
      if (pairSep.isEmpty || pairSep.forall(!_)) true
      else if (pairSep.forall(identity)) false
      else fail("mixed contiguity: gap variables separate some step " +
        "pairs but not others — CepPattern contiguity is pattern-global " +
        "(put a gap `g*` between EVERY pair of steps, or none)")
    require(!tagged.exists(t => t.isGap && strict),
      "internal: gap implies relaxed") // unreachable; documents intent
    // unknown DEFINEs (defined but never used in PATTERN) are an error —
    // catches typos between DEFINE and PATTERN
    val used = tagged.filterNot(_.isGap)
      .flatMap(e => if (e.altVars.nonEmpty) e.altVars else Seq(e.variable)).toSet
    val unused = defines.map(_._1).filterNot(used)
    require(unused.isEmpty, s"DEFINEd but not in PATTERN: ${unused.mkString(", ")}")
    skip match {
      case SkipToFirst(v) => require(used(v), s"SKIP TO FIRST $v: unknown variable")
      case SkipToLast(v) => require(used(v), s"SKIP TO LAST $v: unknown variable")
      case _ =>
    }
    // navigation targets must be DEFINEd pattern steps (a gap variable
    // consumes no rows FIRST/LAST could navigate to)
    for ((onVar, ncs) <- navConds; nc <- ncs)
      require(used(nc.nav.variable),
        s"DEFINE $onVar navigates ${nc.nav.fn}(${nc.nav.variable}.…) but " +
          s"'${nc.nav.variable}' is not a defined pattern step")
    // aggregate-condition scopes must be DEFINEd pattern steps too (a
    // gap consumes rows no condition should aggregate over)
    for ((onVar, acs) <- aggConds; ac <- acs)
      require(used(ac.variable),
        s"DEFINE $onVar aggregates ${ac.func}(${ac.variable}.…) but " +
          s"'${ac.variable}' is not a defined pattern step")
    require(aggConds.isEmpty || elems.forall(_.altVars.isEmpty),
      "aggregate conditions in DEFINE combined with alternation are " +
        "not supported — expand the branches by hand")
    // SUBSET union variables: names distinct and disjoint from the
    // DEFINEd variables, members DEFINEd pattern steps (a gap consumes
    // rows no scope should see; duplicates would double-scope)
    val subsetNames = subsets.map(_._1)
    require(subsetNames.distinct.size == subsetNames.size,
      s"SUBSET name declared more than once: " +
        subsetNames.diff(subsetNames.distinct).mkString(", "))
    for ((n, ms) <- subsets) {
      require(!defined(n) && !used(n),
        s"SUBSET $n collides with a pattern variable")
      require(ms.distinct.size == ms.size, s"duplicate member in SUBSET $n")
      for (m <- ms) require(used(m),
        s"SUBSET $n member '$m' is not a defined pattern step")
    }
    val spec = MrSpec(partition, order, measures, allRows, skip, within,
      tagged, defines, strict, fromTable, navConds, subsets, aggConds,
      permute, anchorStart, anchorEnd)
    // The `$` anchor executes either as a MATCH FILTER (applyAnchors —
    // exact for STRICT all-greedy specs, whose maximal-munch end is
    // the latest any resolution of an anchor can reach) or through the
    // per-key ANCHORED matchers (everything else — ends pinned inside
    // the search; see [[anchoredNeedsMatcher]]'s support-matrix
    // scaladoc; as of round 15 no `$` shape rejects at parse time).
    // `^` needs no restriction: the match START equals the anchor
    // position on every route, so filtering on it never discards a
    // re-derivable match.
    spec
  }

  // ---------- executor ----------

  /** Run a MATCH_RECOGNIZE text against a DataFrame: parses, resolves
    * to the symbolic or value-predicate compiled form, and dispatches
    * to the existing distributed plans ([[Cep.compile]] /
    * [[Cep.compileWhere]], `...Measures` with the supported MEASURES
    * clause). Output schema is the compiler's: key, start/end row ids
    * and timestamps, n_rows, step_counts [, step_sums].
    */
  def run(df: DataFrame, sql: String): DataFrame = {
    val spec = parse(sql)
    require(spec.partitionBy.size == 1,
      s"PARTITION BY must name exactly one key column, got ${spec.partitionBy}")
    require(spec.orderBy.size == 2,
      "ORDER BY must name the event-time column AND a deterministic " +
        s"tiebreak column (e.g. `ORDER BY ts, event_id`), got ${spec.orderBy}")
    applyAnchors(df, applyExclusion(dispatch(df, spec), spec), spec)
  }

  /** SQL:2016 pattern anchors `^` / `$` (Flink SQL rejects both): keep
    * only matches whose start row is the partition's FIRST row (`^`)
    * and/or whose end row is its LAST row (`$`). Anchors consume no
    * rows, so matching itself is untouched — this is a match-level
    * filter against per-key bounds: one map-side-combining min_by /
    * max_by aggregation on the partition key (a row per key, not per
    * event) and one key-equi join — both distributed, nothing global. */
  private def applyAnchors(in: DataFrame, out: DataFrame,
                           spec: MrSpec): DataFrame = {
    import org.apache.spark.sql.functions.{col, max_by, min_by, struct}
    if (!spec.anchorStart && !spec.anchorEnd) return out
    val (key, tsC, ordC) = (spec.partitionBy.head, spec.orderBy(0), spec.orderBy(1))
    require(!spec.anchorStart || out.columns.contains("start_id"),
      "'^' anchor needs the match's start_id in the output — this " +
        "route does not emit the match span")
    require(!spec.anchorEnd || out.columns.contains("end_id"),
      "'$' anchor needs the match's end_id in the output — this " +
        "route does not emit the match span")
    val bounds = in.groupBy(col(key)).agg(
      min_by(col(ordC), struct(col(tsC), col(ordC))).as("__first_ord"),
      max_by(col(ordC), struct(col(tsC), col(ordC))).as("__last_ord"))
    var res = out.join(bounds, key)
    if (spec.anchorStart) res = res.filter(col("start_id") === col("__first_ord"))
    if (spec.anchorEnd) res = res.filter(col("end_id") === col("__last_ord"))
    res.drop("__first_ord", "__last_ord")
  }

  /** SQL:2016 pattern exclusion `{- X -}` (Flink SQL rejects it — a
    * beyond-Flink completion): the excluded variables' CONSUMED rows
    * are omitted from ALL ROWS PER MATCH output. Matching, MEASURES,
    * and the ONE-ROW match summary are UNAFFECTED — the standard's
    * semantics make exclusion an output filter, not a matching change —
    * so n_rows / RUNNING frames still count excluded rows and `pos`
    * keeps the original consumption numbering. Applied uniformly after
    * every ALL-ROWS route: the row's step label is the consuming
    * SYMBOL on the plain compiled symbolic route and the pattern
    * VARIABLE name on the value-predicate / measures / iterative /
    * alternation routes, so excluded variables map through the same
    * labeling the route emits. */
  private def applyExclusion(out: DataFrame, spec: MrSpec): DataFrame = {
    import org.apache.spark.sql.functions.col
    val exVars = spec.elems.filter(e => e.excluded && !e.isGap)
      .flatMap(e => if (e.altVars.nonEmpty) e.altVars else Seq(e.variable))
    if (exVars.isEmpty || !spec.allRows) return out
    // symbolicPlain must mirror dispatch's routing exactly: a plain
    // symbolic ALL-ROWS spec runs runAllRows (SYMBOL step labels)
    // EXCEPT the shapes needing TRUE anchored matching
    // ([[anchoredNeedsMatcher]] — reluctant or relaxed under '$'),
    // which route through the anchored consumed-row projection
    // (VARIABLE-NAME labels) — the exclusion filter must use the
    // labels the route actually emits (round-14 review fix; divergence
    // only when a variable name differs from its DEFINE literal).
    val symbolicPlain = !spec.isIterative && !spec.hasAlternation &&
      spec.measures.isEmpty && spec.toSymbolic.isDefined &&
      !anchoredNeedsMatcher(spec)
    val labelByVar: Map[String, String] =
      if (symbolicPlain) {
        val (_, pat) = spec.toSymbolic.get
        spec.stepElems.map(_.variable).zip(pat.steps.map(_.symbol)).toMap
      } else exVars.map(v => v -> v).toMap
    out.filter(!col("step").isin(exVars.map(labelByVar): _*))
  }

  /** The consumed-row projections emit the matcher's fixed column
    * names (user_id / event_id / ts); rename them back to the caller's
    * key / ord / ts columns — one helper, one place to follow a schema
    * change. */
  private def renameConsumed(df: DataFrame, key: String, tsC: String,
                             ordC: String): DataFrame =
    df.withColumnRenamed("user_id", key)
      .withColumnRenamed("event_id", ordC)
      .withColumnRenamed("ts", tsC)

  /** The compiled `SUM(col) AS step_sums` summary rebuilt from a
    * CONSUMED-ROW projection (round-15 lift of the last rejected cell
    * of the anchored-`$` matrix): the anchored matchers already emit
    * each match's true consumed rows ([[runIterConsumed]]'s anchored
    * mode / [[alternationConsumed]]'s per-branch dispatch), so the
    * per-step exact-cents sums are ONE ordinary hash aggregation over
    * them — `groupBy(key, start_id, end_id)` with per-step scoped
    * conditional sums of `round(col*100)::long`, comma-joined exactly
    * like [[Cep.compileMeasures]]'s output (steps a match never
    * consumed report 0, matching the compiled absent-step convention).
    * Output schema is the compiled forms': key, start_id/start_ts,
    * end_id/end_ts, n_rows, step_counts, step_sums. An alternation
    * element scopes over its alternatives' COMBINED labels (the
    * winning branch's rows carry only its own variable, so the union
    * scope reads the branch sums exactly); scopes must be pairwise
    * disjoint — the same precondition as the compiled route's
    * pairwise-distinct symbols. Placement: key-partitioned groupBy on
    * the matcher's own shuffle keys — nothing global. */
  private def stepSumsFromConsumed(df: DataFrame, spec: MrSpec,
                                   consumed: DataFrame, key: String,
                                   tsC: String, ordC: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, concat_ws, count,
      lit, max_by, min_by, round, sum, when}
    val v = spec.measuresValCol.get
    val scopes = spec.stepElems.map(e =>
      if (e.altVars.nonEmpty) e.altVars else Seq(e.variable))
    val flat = scopes.flatten
    require(flat.distinct.size == flat.size,
      "the compiled `SUM(col) AS step_sums` summary needs pairwise-" +
        "distinct step variables (the per-step fold credits each " +
        "consumed row to exactly one step — the same precondition as " +
        "the compiled route's distinct symbols)")
    // recover the measured column when it is not in the matcher's own
    // projection — the same (key, ord) equi-join as joinMeasuredCols,
    // key-partitioned like every other stage
    val withVal =
      if (v == "value" || v == tsC || v == ordC) consumed
      else {
        require(df.columns.contains(v),
          s"MEASURES SUM($v): the input DataFrame has no column '$v'")
        consumed.join(df.select(col(key).cast("long").as("user_id"),
          col(ordC).cast("long").as("event_id"), col(v)),
          Seq("user_id", "event_id"))
      }
    val cents = round(measureColRef(v, tsC, ordC) * 100).cast("long")
    val aggs = scopes.zipWithIndex.flatMap { case (ms, i) =>
      val inScope =
        if (ms.size == 1) col("step") === ms.head
        else col("step").isin(ms.map(x => x: Any): _*)
      Seq(count(when(inScope, 1)).as(s"__c_$i"),
        coalesce(sum(when(inScope, cents)), lit(0L)).as(s"__s_$i"))
    } ++ Seq(
      min_by(col("ts"), col("pos")).as("start_ts"),
      max_by(col("ts"), col("pos")).as("end_ts"))
    withVal.groupBy(col("user_id"), col("start_id"), col("end_id"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("user_id").as(key), col("start_id"), col("start_ts"),
        col("end_id"), col("end_ts"), col("n_rows"),
        concat_ws(",",
          scopes.indices.map(i => col(s"__c_$i").cast("string")): _*)
          .as("step_counts"),
        concat_ws(",",
          scopes.indices.map(i => col(s"__s_$i").cast("string")): _*)
          .as("step_sums"))
  }

  /** PERMUTE × the compiled `SUM(col) AS step_sums` summary, BRANCH-
    * TAGGED (round 16 — closes the last matrix cell, which rounds
    * 12-15 REJECTED): permute branches consume the steps in different
    * ORDERS, so no single cross-branch per-step alignment exists — but
    * per MATCH the alignment is well-defined: the winning branch's
    * order. Output therefore carries `step_counts` / `step_sums` IN
    * THE MATCHED BRANCH'S step order plus a `branch` column (the
    * branch's index in [[MrSpec.expandBranches]]'s lexicographic
    * expansion — the same index the generated per-branch oracle
    * unions under), so two matches over the same rows that bound in
    * different orders are distinguishable.
    *
    * Mechanics: [[alternationConsumed]] with the winning branch kept
    * through the leftmost dedup, then ONE hash aggregation of
    * per-VARIABLE exact-cents folds (PERMUTE variables are pairwise
    * distinct by parse), and the output strings assembled per branch
    * by a compile-time `when` chain over the branch index — pure
    * projection, no extra shuffle beyond the matcher's own. Placement
    * identical to [[stepSumsFromConsumed]]: key-partitioned groupBy on
    * the matcher's shuffle keys, nothing global. */
  private def permuteStepSums(df: DataFrame, spec: MrSpec, key: String,
                              tsC: String, ordC: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, concat_ws, count,
      lit, max_by, min_by, round, sum, when}
    val v = spec.measuresValCol.get
    val vars = spec.stepElems.map(_.variable)
    require(vars.distinct.size == vars.size,
      "PERMUTE variables must be pairwise distinct (parse enforces this)")
    val orders = spec.expandBranches.map(_.stepElems.map(_.variable))
    val varIdx = vars.zipWithIndex.toMap
    val consumed = alternationConsumed(df, spec, key, tsC, ordC,
      keepBranch = true)
    val withVal =
      if (v == "value" || v == tsC || v == ordC) consumed
      else {
        require(df.columns.contains(v),
          s"MEASURES SUM($v): the input DataFrame has no column '$v'")
        consumed.join(df.select(col(key).cast("long").as("user_id"),
          col(ordC).cast("long").as("event_id"), col(v)),
          Seq("user_id", "event_id"))
      }
    val cents = round(measureColRef(v, tsC, ordC) * 100).cast("long")
    val aggs = vars.zipWithIndex.flatMap { case (vr, i) =>
      Seq(count(when(col("step") === vr, 1)).as(s"__c_$i"),
        coalesce(sum(when(col("step") === vr, cents)), lit(0L)).as(s"__s_$i"))
    } ++ Seq(
      min_by(col("ts"), col("pos")).as("start_ts"),
      max_by(col("ts"), col("pos")).as("end_ts"))
    // per-branch output order as a compile-time when chain over the
    // kept branch index (n! branches, parse-capped — a projection,
    // not a plan blowup)
    def inOrder(pfx: String): org.apache.spark.sql.Column = {
      def cat(o: Seq[String]) =
        concat_ws(",", o.map(x => col(s"$pfx${varIdx(x)}").cast("string")): _*)
      orders.zipWithIndex.tail.foldLeft(cat(orders.head)) {
        case (acc, (o, i)) => when(col("__br") === i, cat(o)).otherwise(acc)
      }
    }
    withVal.groupBy(col("user_id"), col("start_id"), col("end_id"),
        col("__br"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("user_id").as(key), col("start_id"), col("start_ts"),
        col("end_id"), col("end_ts"), col("n_rows"),
        inOrder("__c_").as("step_counts"),
        inOrder("__s_").as("step_sums"),
        col("__br").cast("int").as("branch"))
  }

  /** Does the '$' anchor require TRUE anchored matching (the per-key
    * anchored matcher) instead of the compiled-plan + post-filter
    * equivalence?
    *
    * The `$` anchor's SUPPORT MATRIX is COMPLETE as of round 15 —
    * every parseable spec carries true anchored matching (the round
    * 12-14 rejections are all lifted); this predicate picks the
    * mechanism at dispatch:
    *
    *  - STRICT all-greedy specs (no alternation): the compiled plans +
    *    the match filter ([[applyAnchors]]) — exact because the last
    *    step's maximal-munch prefix is the latest end any resolution
    *    of an anchor can reach (this predicate returns false).
    *  - STRICT specs with RELUCTANT quantifiers, or iterative
    *    conditions: the per-key anchored BACKTRACKING matcher
    *    ([[Cep.matchCoreAnchoredEnd]]) explores candidate counts in
    *    preference order (the consumption context threads through —
    *    prefix-closed acceptance keeps truncation consistent) until a
    *    resolution ends at the partition's last row.
    *  - RELAXED specs — general quantifiers and negated steps included
    *    (round-15; previously all-{1,1} only): the preference-ordered
    *    pinned-final DFS (alignments earliest-first, counts
    *    greedy-descending, the final step landing exactly on the last
    *    row — Cep.tryRelaxedAnchoredAlt).
    *  - ALTERNATION / PERMUTE: the mechanisms above apply PER BRANCH
    *    before the leftmost-branch dedup ([[runAlternation]] /
    *    [[alternationConsumed]]): strict all-greedy branches pin by
    *    filter (forced decomposition), everything else runs the
    *    anchored matcher.
    *  - MEASURES (general, the compiled `step_sums` fold
    *    [[stepSumsFromConsumed]], and the branch-tagged PERMUTE form
    *    [[permuteStepSums]] — round 16) and ALL ROWS ride the anchored
    *    consumed-row projections on every route.
    *
    * Mechanism choice: exactly when the spec's committed ends are not
    * its only candidate ends — any RELUCTANT quantifier (minimal-end
    * commitment) or RELAXED contiguity (first-qualifying alignment
    * commitment — round-15; a deviating later alignment can reach the
    * last row, e.g. `a g* b` on A B B, where the committed walk binds
    * b to the first B and the filter would drop the anchored match).
    * STRICT all-greedy specs keep the filter: the last step's
    * maximal-munch prefix is the latest end any resolution of that
    * anchor can reach (its run is contiguous), so end == last-row
    * survives the filter iff ANY resolution ends there. */
  private def anchoredNeedsMatcher(spec: MrSpec): Boolean =
    spec.anchorEnd && (!spec.strict || spec.stepElems.exists(!_.greedy))

  private def dispatch(df: DataFrame, spec: MrSpec): DataFrame = {
    val (key, tsC, ordC) = (spec.partitionBy.head, spec.orderBy(0), spec.orderBy(1))
    if (spec.hasAlternation) return runAlternation(df, spec, key, tsC, ordC)
    if (spec.isIterative) {
      // nav/agg DEFINEs run on the per-key iterative matcher; its
      // consumed-row projection ([[runIterConsumed]]) feeds the SAME
      // general MEASURES executors as the symbolic route, so MEASURES /
      // ALL ROWS PER MATCH compose with navigation and aggregate
      // conditions instead of being rejected.
      if (spec.measures.nonEmpty) {
        // '$' + step_sums (round-15 lift): the anchored matcher's
        // consumed rows carry the per-step fold — one scoped hash
        // aggregation rebuilds the compiled summary exactly
        // ([[stepSumsFromConsumed]]).
        if (spec.measuresValCol.nonEmpty && !spec.allRows && spec.anchorEnd)
          return stepSumsFromConsumed(df, spec,
            runIterConsumed(df, spec, key, tsC, ordC, anchoredEnd = true),
            key, tsC, ordC)
        require(spec.measuresValCol.isEmpty,
          "`SUM(col) AS step_sums` is the compiled PER-STEP summary — " +
            "the iterative route's general MEASURES aggregate the whole " +
            "match (alias differently, e.g. SUM(value) AS total_v, or " +
            "scope per variable: SUM(a.value) AS a_sum; under the '$' " +
            "anchor the per-step summary IS offered, ONE ROW)")
        val (resolved, projs) = resolveMeasuresWithExprs(spec)
        // '$': the consumed rows come from the ANCHORED matcher
        // (pinned-final DFS for relaxed all-{1,1}, backtracking for
        // strict) — a post-filter over the unanchored matches would
        // under-match. ONE ROW and ALL ROWS both flow through here
        // (round-14: validateAnchorEnd admits ALL ROWS too).
        val consumed = runIterConsumed(df, spec, key, tsC, ordC,
          anchoredEnd = spec.anchorEnd)
        return applyMeasureExprs(
          if (spec.allRows)
            runAllRowsMeasures(df, spec, resolved, key, tsC, ordC, consumed)
          else runMeasures(df, spec, resolved, key, tsC, ordC, consumed),
          projs)
      }
      if (spec.allRows)
        // '$' (round-14): consumed rows from the anchored matcher
        // (pinned-final DFS / strict backtracking), never a filter
        return renameConsumed(runIterConsumed(df, spec, key, tsC, ordC,
          anchoredEnd = spec.anchorEnd), key, tsC, ordC)
      return runIter(df, spec, key, tsC, ordC)
    }
    // GENERAL MEASURES route: any MEASURES clause beyond the compiled
    // `SUM(col) AS step_sums` form (and every MEASURES clause under ALL
    // ROWS PER MATCH, where the compiled per-step-sums summary does not
    // apply) resolves to [[MrResolvedMeasure]]s and executes over the
    // matcher's consumed-row projection with ordinary Spark aggregation
    // (ONE ROW: groupBy per match) or windows (ALL ROWS: running/final
    // frames) — see [[runMeasures]] / [[runAllRowsMeasures]].
    if (spec.measures.nonEmpty && (spec.allRows || spec.measuresValCol.isEmpty)) {
      val (resolved, projs) = resolveMeasuresWithExprs(spec)
      // '$' × RELUCTANT or RELAXED (rounds 14/15): the consumed rows
      // must come from the anchored matcher — the unanchored matcher
      // commits to minimal ends (reluctant) or first-qualifying
      // alignments (relaxed) and the anchor post-filter would silently
      // drop matches whose anchored resolution differs
      // ([[anchoredNeedsMatcher]]); the iterative per-key executor
      // (raw DEFINE predicates — identical to the no-measures anchored
      // route at the symbolic dispatch below) carries the search.
      // Strict all-greedy specs keep the cheaper post-filter
      // equivalence (applyAnchors).
      val consumed =
        if (anchoredNeedsMatcher(spec))
          runIterConsumed(df, spec, key, tsC, ordC, anchoredEnd = true)
        else consumedRows(df, spec, key, tsC, ordC)
      return applyMeasureExprs(
        if (spec.allRows)
          runAllRowsMeasures(df, spec, resolved, key, tsC, ordC, consumed)
        else runMeasures(df, spec, resolved, key, tsC, ordC, consumed),
        projs)
    }
    // '$' × (RELUCTANT or RELAXED) × ALL ROWS (rounds 14/15): the
    // row-level output must come from the anchored matcher's
    // consumed-row projection — runAllRows' post-anchor filter would
    // drop matches whose anchored resolution differs from the
    // committed one (the same argument as the ONE-ROW route). Strict
    // all-greedy specs keep runAllRows + the documented filter
    // equivalence.
    if (spec.allRows && anchoredNeedsMatcher(spec))
      return renameConsumed(
        runIterConsumed(df, spec, key, tsC, ordC, anchoredEnd = true),
        key, tsC, ordC)
    if (spec.allRows) return runAllRows(df, spec, key, tsC, ordC)
    // '$' × (RELUCTANT or RELAXED) × compiled step_sums (round-15
    // lift): the compiled measures plans commit their ends, so the
    // anchor post-filter would under-match — the anchored matcher's
    // consumed rows carry the per-step fold instead. Strict all-greedy
    // specs keep the compiled plans + the documented post-filter
    // equivalence below.
    if (spec.measuresValCol.nonEmpty && anchoredNeedsMatcher(spec))
      return stepSumsFromConsumed(df, spec,
        runIterConsumed(df, spec, key, tsC, ordC, anchoredEnd = true),
        key, tsC, ordC)
    (spec.toSymbolic, spec.measuresValCol) match {
      case (Some((symCol, pat)), None) =>
        if (anchoredNeedsMatcher(spec))
          // reluctant or relaxed + '$': the per-key anchored matcher
          // (ends pinned INSIDE the search — a post-filter over the
          // committed ends would under-match); runIter's per-key
          // executor drives Cep.matchCoreAnchoredEnd (backtracking for
          // strict, the general pinned-final DFS for relaxed)
          runIter(df, spec, key, tsC, ordC)
        else Cep.compile(df, key, tsC, ordC, symCol, pat)
      case (Some((symCol, pat)), Some(v)) =>
        Cep.compileMeasures(df, key, tsC, ordC, symCol, v, pat)
      case (None, None) =>
        if (anchoredNeedsMatcher(spec))
          // the value-predicate twin of the case above — compileWhere's
          // committed ends have the same under-match (round-15: this
          // route previously post-filtered)
          runIter(df, spec, key, tsC, ordC)
        else Cep.compileWhere(df, key, tsC, ordC, spec.toCond)
      case (None, Some(v)) =>
        Cep.compileWhereMeasures(df, key, tsC, ordC, v, spec.toCond)
    }
  }

  /** `ALL ROWS PER MATCH` execution: the per-key sequential matcher
    * with its consumption context snapshotted at emission
    * (StreamOps.cepAllRowsPattern), one row per CONSUMED row. Output
    * columns: key, start_id/end_id (match identity — start_id unique
    * per match under every skip strategy), pos (1-based consumption
    * position), ordCol, tsCol, step (the consuming step's symbol —
    * pattern-variable name on the value-predicate route), value.
    * Value-predicate DEFINEs route through the same first-match-wins
    * derived-symbol CASE as the ONE-ROW compiled path, so both DEFINE
    * forms execute. The key and ord columns must be integral and the
    * input must carry a numeric `value` column to project (the engine's
    * CEP event model — absent one, 0.0 is carried). */
  private def runAllRows(df: DataFrame, spec: MrSpec, key: String,
                         tsC: String, ordC: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(spec.measures.isEmpty,
      "internal: ALL ROWS PER MATCH with a MEASURES clause routes to " +
        "runAllRowsMeasures") // unreachable — run() dispatches it there
    val (symExpr, pat) = spec.toSymbolic match {
      case Some((symCol, p)) => (col(symCol), p)
      case None =>
        (org.apache.spark.sql.functions.expr(spec.toCond.caseSql),
          spec.toCond.symbolic)
    }
    val sp = df.sparkSession
    import sp.implicits._
    val valueCol =
      if (df.columns.contains("value")) col("value").cast("double")
      else lit(0.0)
    val ev = df.select(col(ordC).cast("long").as("event_id"), col(tsC).as("ts"),
        col(key).cast("long").as("user_id"), symExpr.as("event_type"),
        valueCol.as("value"))
      .as[graft.streaming.Ev]
    graft.streaming.StreamOps.cepAllRowsPattern(ev, pat).toDF()
      .withColumnRenamed("user_id", key)
      .withColumnRenamed("event_id", ordC)
      .withColumnRenamed("ts", tsC)
  }

  /** The consumed-rows projection shared by the general MEASURES
    * executors: the per-key sequential matcher's row-level output
    * (StreamOps.cepAllRowsPattern) on the VALUE-PREDICATE compiled form
    * — [[MrSpec.toCond]] works for both DEFINE shapes (a symbol
    * equality is just a predicate), and its first-match-wins derived
    * CASE labels each consumed row's `step` with the PATTERN VARIABLE
    * name, which is exactly the scope `SUM(var.col)` aggregates over.
    * Columns: user_id (the key, cast long), start_id/end_id (match
    * identity), pos (1-based consumption position), event_id (the ord
    * column, cast long), ts, step, value. */
  private def consumedRows(df: DataFrame, spec: MrSpec, key: String,
                           tsC: String, ordC: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val sp = df.sparkSession
    import sp.implicits._
    val cond = spec.toCond
    val valueCol =
      if (df.columns.contains("value")) col("value").cast("double") else lit(0.0)
    val ev = df.select(col(ordC).cast("long").as("event_id"), col(tsC).as("ts"),
        col(key).cast("long").as("user_id"), expr(cond.caseSql).as("event_type"),
        valueCol.as("value"))
      .as[graft.streaming.Ev]
    graft.streaming.StreamOps.cepAllRowsPattern(ev, cond.symbolic).toDF()
  }

  /** Measured columns beyond the matcher's own projection (anything
    * other than `value`, the ord column, and the ts column) are
    * recovered by an equi-join back to the input on (key, ord) — the
    * join is key-partitioned like every other stage of the plan, and a
    * row consumed by several overlapping matches fans out exactly as
    * the match projection did (many-to-one on the input side). */
  private def joinMeasuredCols(df: DataFrame, consumed: DataFrame,
                               resolved: Seq[MrResolvedMeasure], key: String,
                               tsC: String, ordC: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val measured = resolved.collect {
      case MrAggMeasure(_, _, Some(c), _, _, _) => c
    }.distinct
    // every measured column must EXIST on the input — the matcher's
    // `value` projection substitutes 0.0 when the input has no value
    // column (the CEP event model), and a measure silently aggregating
    // that placeholder would be a wrong result, not a convenience
    val missing = measured.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"MEASURES reference column(s) ${missing.mkString(", ")} that the " +
        "input DataFrame does not have")
    val extra = measured.filterNot(c => c == "value" || c == tsC || c == ordC)
    if (extra.isEmpty) return consumed
    val clash = extra.filter(consumed.columns.contains)
    require(clash.isEmpty,
      s"measured column(s) ${clash.mkString(", ")} collide with the " +
        "match projection's own columns (user_id, start_id, end_id, pos, " +
        "event_id, ts, step, value) — alias them in the input first")
    val sideCols = Seq(col(key).cast("long").as("user_id"),
      col(ordC).cast("long").as("event_id")) ++ extra.map(col)
    val side = df.select(sideCols: _*)
    consumed.join(side, Seq("user_id", "event_id"))
  }

  /** A measured column reference inside the consumed-row projection:
    * the ord / ts columns live under the matcher's fixed names. */
  private def measureColRef(c: String, tsC: String,
                            ordC: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    if (c == ordC) col("event_id") else if (c == tsC) col("ts") else col(c)
  }

  /** Scope a measured column to a pattern variable (or SUBSET union —
    * the aggregate then ranges over the members' combined rows): rows
    * outside the scope become null, which every aggregate here skips.
    * Shared by the ONE ROW and ALL ROWS routes so scope resolution can
    * never diverge between them. */
  private def scopedCol(spec: MrSpec, v: Option[String],
                        c: Column): Column = {
    import org.apache.spark.sql.functions.{col, when}
    v.map { vv =>
      spec.scopeMembers(vv) match {
        case Seq(one) => when(col("step") === one, c)
        case ms => when(col("step").isin(ms.map(x => x: Any): _*), c)
      }
    }.getOrElse(c)
  }

  private def checkMeasureAliases(resolved: Seq[MrResolvedMeasure],
                                  reserved: Seq[String]): Unit = {
    val aliases = resolved.map(_.alias)
    require(aliases.distinct.size == aliases.size,
      s"duplicate MEASURES alias: ${aliases.diff(aliases.distinct).mkString(", ")}")
    val clash = aliases.filter(a => reserved.exists(_.equalsIgnoreCase(a)))
    require(clash.isEmpty,
      s"MEASURES alias(es) ${clash.mkString(", ")} collide with the " +
        s"output's own columns (${reserved.mkString(", ")})")
  }

  /** General MEASURES under ONE ROW PER MATCH: the matcher emits each
    * match's consumed rows ([[consumedRows]]), and the measures are
    * ONE ordinary hash aggregation per match — `groupBy(key, start_id)`
    * with conditional aggregates (`SUM(var.col)` =
    * `sum(when(step = var, col))`, `FIRST`/`LAST` = `min_by`/`max_by`
    * on the variable-scoped consumption position; a scope the match
    * never consumed yields SQL null). RUNNING and FINAL coincide in
    * this mode (the output row IS the final row — SQL:2016), so the
    * modifier is accepted and ignored. `MATCH_NUMBER()` is a
    * key-partitioned row_number over anchor order (start_ts, start_id)
    * added after the aggregation. Output: key, start_id, start_ts,
    * end_id, end_ts, n_rows, then one column per measure in declared
    * order. Scale: matcher shuffle + one co-partitioned aggregation +
    * (only if MATCH_NUMBER is asked for) one key-partitioned window —
    * nothing global, nothing driver-side. */
  private def runMeasures(df: DataFrame, spec: MrSpec,
                          resolved: Seq[MrResolvedMeasure], key: String,
                          tsC: String, ordC: String,
                          consumedRaw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // reserve the output names AND the internal projection names — a
    // MATCH_NUMBER alias of e.g. "user_id" would otherwise overwrite
    // the internal group-key column via withColumn before the rename
    val meta = Seq(key, "user_id", "start_id", "start_ts", "end_id",
      "end_ts", "n_rows", "pos", "event_id", "ts", "step", "value")
    checkMeasureAliases(resolved, meta)
    val consumed = joinMeasuredCols(df, consumedRaw, resolved, key, tsC, ordC)
    def scoped(v: Option[String], c: Column): Column = scopedCol(spec, v, c)
    val aggs = resolved.collect {
      case MrClassifier(a) =>
        // ONE ROW PER MATCH: the final row's consuming variable
        max_by(col("step"), col("pos")).as(a)
      case m: MrAggMeasure =>
        val cRef = m.colName.map(measureColRef(_, tsC, ordC))
        val e = m.func match {
          case "COUNT" => count(scoped(m.variable, cRef.getOrElse(lit(1))))
          case "SUM" => sum(scoped(m.variable, cRef.get))
          case "AVG" => avg(scoped(m.variable, cRef.get))
          case "MIN" => min(scoped(m.variable, cRef.get))
          case "MAX" => max(scoped(m.variable, cRef.get))
          // FIRST/LAST: the scope's first/last consumed row — min_by/
          // max_by on the SCOPED position (rows outside the scope carry a
          // null ordering value, which both engines' arg-extremes skip)
          case "FIRST" if m.n == 0 =>
            min_by(cRef.get, scoped(m.variable, col("pos")))
          case "LAST" if m.n == 0 =>
            max_by(cRef.get, scoped(m.variable, col("pos")))
          // offset form (SQL:2016 logical navigation): the scope's rows
          // in consumption order as a sorted (pos, value) array; `get`
          // is null on out-of-range (too few scoped rows → SQL null).
          // Match sizes bound the array — the per-key matcher already
          // holds a match in memory, so this adds no new scale risk.
          case f =>
            val arr = sort_array(collect_list(scoped(m.variable,
              struct(col("pos").as("p"), cRef.get.as("v")))))
            val idx = if (f == "FIRST") lit(m.n)
                      else size(arr) - 1 - lit(m.n)
            get(arr, idx).getField("v")
        }
        e.as(m.alias)
    }
    val metaAggs = Seq(min(col("ts")).as("start_ts"),
      max(col("end_id")).as("end_id"), max(col("ts")).as("end_ts"),
      count(lit(1)).as("n_rows"))
    val all = metaAggs ++ aggs
    val grouped = consumed.groupBy(col("user_id"), col("start_id"))
      .agg(all.head, all.tail: _*)
    val wMn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("start_ts"), col("start_id"))
    val withMn = resolved.foldLeft(grouped) {
      case (d, MrMatchNumber(a)) =>
        d.withColumn(a, row_number().over(wMn).cast("long"))
      case (d, _) => d
    }
    withMn.select((Seq("user_id", "start_id", "start_ts", "end_id", "end_ts",
        "n_rows") ++ resolved.map(_.alias)).map(col): _*)
      .withColumnRenamed("user_id", key)
  }

  /** General MEASURES under ALL ROWS PER MATCH: every consumed row,
    * with each measure a WINDOW over the match — RUNNING (the mode's
    * default) aggregates the frame up to and including the current
    * consumption position, FINAL the whole match
    * (`rowsBetween(unboundedPreceding, unboundedFollowing)`); both
    * windows are (key, start_id)-partitioned, so nothing beyond the
    * matcher's own key partitioning is shuffled. `FIRST`/`LAST` are
    * ignore-nulls first/last over the variable-scoped column.
    * `MATCH_NUMBER()` is a dense_rank over anchor order. Output: the
    * consumed-row projection (key, start_id, end_id, pos, ordC, tsC,
    * step, value) plus one column per measure. */
  private def runAllRowsMeasures(df: DataFrame, spec: MrSpec,
                                 resolved: Seq[MrResolvedMeasure], key: String,
                                 tsC: String, ordC: String,
                                 consumedRaw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val base = Seq(key, "start_id", "end_id", "pos", ordC, tsC, "step", "value")
    checkMeasureAliases(resolved, base)
    val consumed = joinMeasuredCols(df, consumedRaw, resolved, key, tsC, ordC)
    // the ALL ROWS output carries the joined measured columns too — an
    // alias equal to one would silently overwrite it via withColumn
    checkMeasureAliases(resolved, consumed.columns.toSeq)
    val wMatch = Window.partitionBy(col("user_id"), col("start_id"))
    val wRun = wMatch.orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFin = wMatch.orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def scoped(v: Option[String], c: Column): Column = scopedCol(spec, v, c)
    val withMeasures = resolved.foldLeft(consumed) {
      case (d, MrClassifier(a)) =>
        // ALL ROWS PER MATCH: the current row's consuming variable
        d.withColumn(a, col("step"))
      case (d, MrMatchNumber(a)) =>
        // anchor order: first consumed ts, then the anchor row id —
        // dense_rank numbers the matches 1..n per key in that order
        d.withColumn("__mts", min(col("ts")).over(wMatch))
          .withColumn(a, dense_rank().over(Window.partitionBy(col("user_id"))
            .orderBy(col("__mts"), col("start_id"))).cast("long"))
          .drop("__mts")
      case (d, m: MrAggMeasure) =>
        val cRef = m.colName.map(measureColRef(_, tsC, ordC))
        val w = if (m.running.getOrElse(true)) wRun else wFin
        val e = m.func match {
          case "COUNT" => count(scoped(m.variable, cRef.getOrElse(lit(1)))).over(w)
          case "SUM" => sum(scoped(m.variable, cRef.get)).over(w)
          case "AVG" => avg(scoped(m.variable, cRef.get)).over(w)
          case "MIN" => min(scoped(m.variable, cRef.get)).over(w)
          case "MAX" => max(scoped(m.variable, cRef.get)).over(w)
          // FIRST/LAST: scope via a (pos, value) sentinel struct and
          // take the value field of the frame's min/max scoped pos —
          // out-of-scope rows are skipped (their struct is null) but an
          // in-scope row whose measured value is NULL is returned as
          // that null, matching SQL:2016 and the ONE ROW route's
          // min_by/max_by (ignore-nulls first/last over the scoped
          // column would skip in-scope nulls instead).
          case "FIRST" if m.n == 0 =>
            min(scoped(m.variable, struct(col("pos").as("p"),
              cRef.get.as("v")))).over(w).getField("v")
          case "LAST" if m.n == 0 =>
            max(scoped(m.variable, struct(col("pos").as("p"),
              cRef.get.as("v")))).over(w).getField("v")
          // offset form over the frame (RUNNING: rows so far; FINAL:
          // the whole match): sorted (pos, value) array of the scope's
          // frame rows, `get` null on out-of-range
          case f =>
            val arr = sort_array(collect_list(scoped(m.variable,
              struct(col("pos").as("p"), cRef.get.as("v")))).over(w))
            val idx = if (f == "FIRST") lit(m.n)
                      else size(arr) - 1 - lit(m.n)
            get(arr, idx).getField("v")
        }
        d.withColumn(m.alias, e)
    }
    withMeasures
      .withColumnRenamed("user_id", key)
      .withColumnRenamed("event_id", ordC)
      .withColumnRenamed("ts", tsC)
  }

  private val MeasureCallFns = Set("MATCH_NUMBER", "CLASSIFIER", "COUNT",
    "SUM", "AVG", "MIN", "MAX", "FIRST", "LAST")

  /** Identifier KEYWORDS allowed verbatim inside a MEASURES expression:
    * CASE branching, the boolean connectives, null/boolean literals,
    * IS (for `IS [NOT] NULL`), and CAST's `AS <type>` target names.
    * Checked before the bare-column rule, so a column that shares one
    * of these names cannot be referenced bare — wrap it as
    * `LAST(col)` explicitly. */
  private val ExprKeywords = Set(
    "CASE", "WHEN", "THEN", "ELSE", "END", "AND", "OR", "NOT", "IS",
    "NULL", "TRUE", "FALSE", "AS",
    "DOUBLE", "INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT",
    "FLOAT", "REAL", "STRING", "VARCHAR", "BOOLEAN", "DECIMAL", "LONG")

  /** Deterministic SCALAR functions allowed to wrap sub-terms in a
    * MEASURES expression (evaluated post-aggregation by Catalyst —
    * every one is a pure, codegen'd builtin). An identifier followed
    * by `(` that is neither a simple-call aggregate nor on this list
    * rejects loudly — an unknown call must not silently decompose as
    * a bare-column reference. */
  private val ExprScalarFns = Set(
    "ABS", "ROUND", "FLOOR", "CEIL", "CEILING", "SQRT", "POWER", "POW",
    "LN", "LOG", "EXP", "SIGN", "MOD", "LEAST", "GREATEST", "COALESCE",
    "NULLIF", "CONCAT", "UPPER", "LOWER", "LENGTH", "SUBSTRING",
    "SUBSTR", "TRIM", "CAST")

  /** Symbols allowed in a MEASURES expression: arithmetic, parens and
    * argument commas, the comparison operators (`>= <= <> !=` arrive
    * as adjacent single-char tokens), and `|` so `||` concatenation
    * works. Everything is validated again by Catalyst's parser when
    * the projection is spliced with `expr()`. */
  private val ExprSyms = Set(
    "+", "-", "*", "/", "%", "(", ")", ",", ">", "<", "=", "!", "|")

  /** GENERAL MEASURES with scalar EXPRESSIONS (Flink SQL allows an
    * arbitrary expression such as `LAST(A.price) - FIRST(A.price)` or
    * `CASE WHEN SUM(A.v) > 100 THEN 'hot' END`): decompose every
    * MEASURES entry into SIMPLE resolved sub-measures (hidden `__mxN`
    * aliases) plus a post-aggregation projection. An entry that is one
    * simple call passes through unchanged (projection None). Inside an
    * expression: the simple calls (including `CLASSIFIER()` /
    * `MATCH_NUMBER()` as sub-terms) resolve recursively, a bare
    * `var.col` reference is SQL:2016's implicit `LAST(var.col)` (the
    * last row of the scope — Flink's `A.price`), a bare un-prefixed
    * column is the implicit `LAST(col)` over the universal row
    * variable, and the surrounding expression may use arithmetic,
    * comparisons, `||` concatenation, string/number literals,
    * `CASE WHEN`/boolean connectives, and the whitelisted
    * deterministic scalar wrappers ([[ExprScalarFns]]) — any other
    * token or unknown function call rejects loudly. The projection is
    * ordinary Catalyst `expr()` over the aggregated hidden columns, so
    * the plan gains NO extra aggregation or shuffle. */
  private[graft] def resolveMeasuresWithExprs(
      spec: MrSpec): (Seq[MrResolvedMeasure], Seq[(String, Option[String])]) = {
    spec.measures.foreach(m => require(!m.alias.startsWith("__mx"),
      s"MEASURES alias ${m.alias}: the __mx prefix is reserved for " +
        "hidden expression sub-measures"))
    var hi = -1
    def nextAlias(): String = { hi += 1; s"__mx$hi" }
    val hidden = Vector.newBuilder[MrResolvedMeasure]
    val projs = spec.measures.map { m =>
      spec.resolveMeasureEntry(m.exprSql, m.alias) match {
        case Some(r) => hidden += r; (m.alias, None)
        case None =>
          val src = m.exprSql
          val toks = tokenize(src)
          require(toks.nonEmpty, "empty MEASURES expression")
          val repl = Vector.newBuilder[(Int, Int, String)]
          var i = 0
          while (i < toks.length) {
            toks(i) match {
              case TId(txt, a, _) if MeasureCallFns(txt.toUpperCase) &&
                  i + 1 < toks.length && toks(i + 1).text == "(" =>
                var d = 0
                var j = i + 1
                var end = -1
                while (end < 0 && j < toks.length) {
                  if (toks(j).text == "(") d += 1
                  if (toks(j).text == ")") { d -= 1; if (d == 0) end = j }
                  j += 1
                }
                require(end > 0,
                  s"unbalanced parens in MEASURES expression: $src")
                val sub = src.substring(a, toks(end).b)
                val h = nextAlias()
                hidden += spec.resolveMeasureEntry(sub, h).getOrElse(fail(
                  s"unsupported call inside MEASURES expression: $sub — " +
                    "expected MATCH_NUMBER() / CLASSIFIER() / " +
                    "[RUNNING|FINAL] AGG([var.]col | var.* | *)"))
                repl += ((a, toks(end).b, h))
                i = end + 1
              case TId(txt, _, _) if ExprScalarFns(txt.toUpperCase) &&
                  i + 1 < toks.length && toks(i + 1).text == "(" =>
                // whitelisted scalar wrapper — its parens/args are
                // scanned by this same loop, so call leaves inside the
                // arguments still decompose
                i += 1
              case TId(txt, _, _) if ExprKeywords(txt.toUpperCase) =>
                i += 1
              case TId(txt, _, _) if i + 1 < toks.length &&
                  toks(i + 1).text == "(" => fail(
                s"unsupported function in MEASURES expression: $txt(...) " +
                  "— allowed calls are MATCH_NUMBER/CLASSIFIER, the " +
                  "aggregates COUNT/SUM/AVG/MIN/MAX/FIRST/LAST, and the " +
                  "deterministic scalar wrappers " +
                  ExprScalarFns.toSeq.sorted.mkString(" ") + s"; in: $src")
              case TId(v, a, _) if i + 2 < toks.length &&
                  toks(i + 1).text == "." && toks(i + 2).isInstanceOf[TId] =>
                // bare var.col — SQL:2016 implicit LAST(var.col)
                val c = toks(i + 2).text
                val h = nextAlias()
                hidden += spec.resolveMeasureEntry(s"LAST($v.$c)", h)
                  .getOrElse(fail(s"cannot resolve bare reference $v.$c " +
                    "in MEASURES expression (implicit LAST): " + src))
                repl += ((a, toks(i + 2).b, h))
                i += 3
              case TId(id, a, b) =>
                // bare un-prefixed column — SQL:2016's universal row
                // variable, implicit LAST over the whole match
                val h = nextAlias()
                hidden += spec.resolveMeasureEntry(s"LAST($id)", h)
                  .getOrElse(fail(s"cannot resolve bare column $id in " +
                    "MEASURES expression (implicit LAST): " + src))
                repl += ((a, b, h))
                i += 1
              case TNum(_, _, _) => i += 1
              case TStr(_, _, _) => i += 1
              case TSym(s2, _, _) if ExprSyms(s2) => i += 1
              case other => fail(
                "unsupported token in MEASURES expression (allowed: the " +
                  "simple calls, bare [var.]col — implicit LAST —, " +
                  "number/string literals, CASE WHEN / boolean keywords, " +
                  "whitelisted scalar wrappers, and the operator symbols " +
                  s"+ - * / % || comparisons parens commas): " +
                  s"'${other.text}' in: $src")
            }
          }
          val sb = new StringBuilder
          var p = toks.head.a
          for ((a, b, h) <- repl.result()) {
            sb.append(src.substring(p, a)); sb.append(h); p = b
          }
          sb.append(src.substring(p, toks.last.b))
          (m.alias, Some(sb.toString))
      }
    }
    (hidden.result(), projs)
  }

  /** Apply the expression projections of [[resolveMeasuresWithExprs]]
    * over an aggregated measures output and drop the hidden sub-measure
    * columns. Identity when every entry was a simple call. */
  private def applyMeasureExprs(base: DataFrame,
                                projs: Seq[(String, Option[String])]): DataFrame = {
    import org.apache.spark.sql.functions.expr
    if (projs.forall(_._2.isEmpty)) return base
    val withExprs = projs.foldLeft(base) { case (d, (alias, sqlOpt)) =>
      sqlOpt.map(sq => d.withColumn(alias, expr(sq))).getOrElse(d)
    }
    withExprs.drop(withExprs.columns.filter(_.startsWith("__mx")).toIndexedSeq: _*)
  }

  /** Resolve a parsed spec's MEASURES for the SEAL-AWARE STREAMING
    * matcher (StreamOps.cepPatternMeasures — general measures computed
    * at each sealed match's emission, so the aggregates flow
    * incrementally instead of needing a second stateful stage). The
    * streaming surface is the STRICT symbolic subset: a strict match's
    * consumed rows are exactly its span, so the sealed match +
    * step_counts determine every scope without a re-walk; measures
    * aggregate the event `value` column (the CEP event model). Every
    * violation rejects loudly with the batch alternative named. */
  def streamMeasures(spec: MrSpec): Seq[MrStreamMeasure] =
    streamMeasuresPlan(spec)._1

  /** [[streamMeasures]] plus the expression projections — MEASURES
    * EXPRESSIONS work on the streaming route exactly as on batch: the
    * matcher evaluates the hidden simple sub-measures at emission and
    * [[streamMeasuresSelect]] applies the arithmetic projection. */
  private[graft] def streamMeasuresPlan(
      spec: MrSpec): (Seq[MrStreamMeasure], Seq[(String, Option[String])]) = {
    require(!spec.allRows,
      "streaming general MEASURES are ONE ROW PER MATCH (per-match " +
        "emission); use the batch route for ALL ROWS")
    require(!spec.hasAlternation && !spec.isIterative,
      "streaming general MEASURES cover plain strict patterns — " +
        "alternation / navigation / aggregate conditions run on the " +
        "batch routes")
    require(spec.strict,
      "streaming general MEASURES need STRICT contiguity (the sealed " +
        "match's consumed rows are exactly its span); relaxed patterns " +
        "run on the batch route")
    require(spec.stepElems.forall(!_.negated),
      "streaming general MEASURES do not cover negated steps")
    val stepIdxByVar = spec.stepElems.map(_.variable).zipWithIndex.toMap
    val (resolved, projs) = resolveMeasuresWithExprs(spec)
    checkMeasureAliases(resolved, Seq("user_id", "start_id", "start_ts",
      "end_id", "end_ts", "n_rows", "longs", "nums", "strs") ++
      spec.partitionBy)
    val sms = resolved.map {
      case MrMatchNumber(a) => MrStreamMeasure("MATCH_NUMBER", None, a)
      case MrClassifier(a) => MrStreamMeasure("CLASSIFIER", None, a)
      case m: MrAggMeasure =>
        require(m.colName.forall(_ == "value"),
          s"streaming MEASURES aggregate the event `value` column only " +
            s"(the CEP event model), got ${m.func}(${m.colName.get}) — " +
            "use the batch route for other columns")
        val scope = m.variable.map(v =>
          spec.scopeMembers(v).map(stepIdxByVar).toSet)
        MrStreamMeasure(m.func, scope, m.alias, m.n)
    }
    (sms, projs)
  }

  /** Project the streaming measures matcher's generic emission
    * (longs/nums/strs maps) to the declared column-per-measure schema —
    * the same output shape as [[runMeasures]]: key, start_id, start_ts,
    * end_id, end_ts, n_rows, then one typed column per measure in
    * declared order (COUNT/MATCH_NUMBER long, value aggregates double,
    * CLASSIFIER string; an absent map key — e.g. an out-of-range
    * FIRST/LAST offset — selects as SQL null). */
  def streamMeasuresSelect(df: DataFrame, spec: MrSpec,
                           key: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (sms, projs) = streamMeasuresPlan(spec)
    val cols = sms.map { m =>
      val src = m.func match {
        case "MATCH_NUMBER" | "COUNT" => col("longs")
        case "CLASSIFIER" => col("strs")
        case _ => col("nums")
      }
      src.getItem(m.alias).as(m.alias)
    }
    val base = df.select(Seq(col("user_id").as(key), col("start_id"),
      col("start_ts"), col("end_id"), col("end_ts"), col("n_rows")) ++
      cols: _*)
    applyMeasureExprs(base, projs)
      .select((Seq(key, "start_id", "start_ts", "end_id", "end_ts",
        "n_rows") ++ spec.measures.map(_.alias)).map(col): _*)
  }

  /** Bounded alternation `(a | b)` execution: the UNION of the
    * expanded per-branch compiled plans ([[MrSpec.expandBranches]] —
    * each branch is an ordinary single-variable pattern planned by the
    * same gaps-and-islands compilers), deduplicated per anchor by
    * LEFTMOST BRANCH PREFERENCE (the regex alternation priority): a
    * (key, start_id) window keeps the lowest branch index. Exact under
    * SKIP TO NEXT ROW because every anchor emits independently —
    * enforced at parse. Scale: each branch is the usual key-partitioned
    * compiled plan; the dedup window is key+anchor-partitioned, so
    * nothing global is added. */
  private def runAlternation(df: DataFrame, spec: MrSpec, key: String,
                             tsC: String, ordC: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, row_number}
    require(spec.navConds.isEmpty,
      "alternation with DEFINE navigation is not supported — expand the " +
        "branches by hand (Cep.matchSequenceIter per branch)")
    // MEASURES / ALL ROWS PER MATCH compose with alternation through
    // the consumed-row projection: per-branch consumed rows, the same
    // leftmost-branch anchor dedup as the match-level union
    // ([[alternationConsumed]]), then the SAME general MEASURES
    // executors as every other route.
    if (spec.measures.nonEmpty) {
      // PERMUTE × step_sums (round-16 — the matrix cell rounds 12-15
      // rejected): branches consume the steps in different ORDERS, so
      // no single cross-branch alignment exists, but per MATCH the
      // winning branch's order is well-defined — emit the per-step
      // fold IN THAT ORDER plus a `branch` tag ([[permuteStepSums]];
      // anchored or not — alternationConsumed pins per branch).
      if (spec.measuresValCol.nonEmpty && !spec.allRows && spec.permute)
        return permuteStepSums(df, spec, key, tsC, ordC)
      // '$' + step_sums (round-15 lift): the pinned per-branch
      // consumed rows ([[alternationConsumed]]) carry the per-step
      // fold — an alternation ELEMENT scopes over its alternatives'
      // combined labels, which reads the winning branch's sums
      // exactly (branches share the element order, so the per-step
      // alignment that does not exist cross-branch in the compiled
      // plans DOES exist element-wise).
      if (spec.measuresValCol.nonEmpty && !spec.allRows && spec.anchorEnd)
        return stepSumsFromConsumed(df, spec,
          alternationConsumed(df, spec, key, tsC, ordC), key, tsC, ordC)
      require(spec.measuresValCol.isEmpty,
        "alternation with the compiled `SUM(col) AS step_sums` MEASURES " +
          "is not supported without the '$' anchor — branch step_sums " +
          "have no single cross-branch alignment; use general measures " +
          "(e.g. SUM(value) AS total_v, SUM(c.value) AS c_sum) instead " +
          "(under the '$' anchor the per-step summary IS offered for " +
          "alternation groups, and PERMUTE carries the branch-tagged " +
          "form anchored or not, ONE ROW)")
      val (resolved, projs) = resolveMeasuresWithExprs(spec)
      val consumed = alternationConsumed(df, spec, key, tsC, ordC)
      return applyMeasureExprs(
        if (spec.allRows)
          runAllRowsMeasures(df, spec, resolved, key, tsC, ordC, consumed)
        else runMeasures(df, spec, resolved, key, tsC, ordC, consumed),
        projs)
    }
    if (spec.allRows)
      return renameConsumed(alternationConsumed(df, spec, key, tsC, ordC),
        key, tsC, ordC)
    // '$': the end pin applies PER BRANCH before the leftmost-branch
    // preference — filtering after the dedup would let a preferred
    // branch that does not end at the last row shadow a less-preferred
    // branch that does. Pin-by-filter is exact only where the branch
    // matcher's committed end is the branch's sole candidate end:
    // strict ALL-GREEDY branches (the segment decomposition is forced
    // by the symbol runs). A branch carrying a RELUCTANT quantifier
    // commits to MINIMAL ends, so the pin over its committed ends
    // would silently under-match (the round-13 ADVICE finding) — such
    // branches get TRUE anchored matching instead (round-14 lift): the
    // per-key anchored backtracking matcher ([[runIter]] →
    // Cep.matchCoreAnchoredEnd), exactly the non-alternation
    // reluctant-'$' mechanism, whose every emitted end IS the last
    // row, so no pin applies.
    import org.apache.spark.sql.functions.{max_by, struct}
    lazy val bounds = df.groupBy(col(key)).agg(
      max_by(col(ordC), struct(col(tsC), col(ordC))).as("__last_ord"))
    def pinToLast(r: DataFrame): DataFrame =
      r.join(bounds, key)
        .filter(col("end_id") === col("__last_ord"))
        .drop("__last_ord")
    val parts = spec.expandBranches.zipWithIndex.map { case (b, i) =>
      // '$' routes OFF the committed-end pin per branch: RELUCTANT
      // branches backtrack, RELAXED branches take the general
      // pinned-final DFS (round-15: quantified relaxed included);
      // both commit to ends the pin cannot recover, so only strict
      // all-greedy branches (forced decomposition) keep the cheap
      // pin-by-filter
      val r =
        if (anchoredNeedsMatcher(b))
          runIter(df, b, key, tsC, ordC)
        else {
          val c = b.toSymbolic match {
            case Some((symCol, pat)) => Cep.compile(df, key, tsC, ordC, symCol, pat)
            case None => Cep.compileWhere(df, key, tsC, ordC, b.toCond)
          }
          if (spec.anchorEnd) pinToLast(c) else c
        }
      r.withColumn("__br", lit(i))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key), col("start_id")).orderBy(col("__br"))
    parts.reduce(_.unionByName(_))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__br", "__rn")
  }

  /** Per-branch consumed rows, unioned and deduplicated per anchor by
    * LEFTMOST BRANCH PREFERENCE — the same rule as the match-level
    * union, applied to whole matches: every row of the winning
    * branch's match survives, every row of a losing branch's match at
    * the same anchor drops. Exact under SKIP TO NEXT ROW (one match
    * per anchor per branch). The dedup window is key+anchor
    * partitioned — nothing global. */
  private def alternationConsumed(df: DataFrame, spec: MrSpec, key: String,
                                  tsC: String, ordC: String,
                                  keepBranch: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, max_by, min, struct}
    // '$' (round-14 MEASURES lift): the end pin applies PER BRANCH
    // BEFORE the leftmost-branch dedup — the same order as
    // runAlternation's pinned union (a post-dedup filter would let a
    // preferred branch that does not end at the last row shadow a
    // less-preferred branch that does). The pin is exact only for
    // strict ALL-GREEDY branches; a branch carrying a RELUCTANT
    // quantifier routes through the anchored backtracking matcher's
    // consumed-row projection instead ([[runIterConsumed]]'s anchored
    // mode — true anchored matches, never a post-filter), mirroring
    // runAlternation branch for branch.
    lazy val bounds = df.groupBy(col(key).cast("long").as("user_id")).agg(
      max_by(col(ordC).cast("long"),
        struct(col(tsC), col(ordC))).as("__last_ord"))
    def pinToLast(r: DataFrame): DataFrame =
      r.join(bounds, "user_id")
        .filter(col("end_id") === col("__last_ord"))
        .drop("__last_ord")
    val parts = spec.expandBranches.zipWithIndex.map { case (b, i) =>
      val r =
        if (anchoredNeedsMatcher(b))
          runIterConsumed(df, b, key, tsC, ordC, anchoredEnd = true)
        else if (spec.anchorEnd) pinToLast(consumedRows(df, b, key, tsC, ordC))
        else consumedRows(df, b, key, tsC, ordC)
      r.withColumn("__br", lit(i))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("start_id"))
    val deduped = parts.reduce(_.unionByName(_))
      .withColumn("__minbr", min(col("__br")).over(w))
      .filter(col("__br") === col("__minbr"))
      .drop("__minbr")
    // keepBranch (round-16 PERMUTE × step_sums): the winning branch
    // index survives the dedup so the per-step fold can order its
    // output by the MATCHED branch's step order
    if (keepBranch) deduped else deduped.drop("__br")
  }

  private def tsUs(t: java.sql.Timestamp): Long =
    (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000

  /** DEFINE-navigation execution (`PREV`/`NEXT`/`FIRST`/`LAST` — see
    * [[MrNav]]): the per-key generalized sequential matcher
    * ([[Cep.matchCore]]) with a step-satisfaction oracle combining
    *  - the CONTEXT-FREE part of each DEFINE, evaluated by Catalyst as
    *    a boolean column BEFORE the shuffle (the declarative predicate
    *    stays whole-stage-codegen'd; the matcher only reads bits), and
    *  - the navigation conjuncts, evaluated in the matcher against the
    *    partition (`PREV`) or the attempt's consumption context
    *    (`FIRST`/`LAST` — Flink `IterativeCondition`, the
    *    event_cep_iterative machinery).
    * One flatMapGroups per key, per-key linear in events × pattern —
    * the same placement and 100 TB cost shape as every other per-key
    * CEP path here. Output schema is the compiled forms' (key,
    * start_id/start_ts, end_id/end_ts, n_rows, step_counts). A
    * navigation to a row that does not (yet) exist is false; navigation
    * columns compare as doubles (null → NaN → false). */
  /** The iterative matcher's shared preparation: the Catalyst-side
    * input projection (context-free bits codegen'd BEFORE the shuffle,
    * nav/agg columns as doubles, the event's `value` for row-level
    * output), the compiled pattern, and a per-key step-satisfaction
    * oracle builder closing over the sorted event array. */
  private case class IterPrep(pat: CepPattern,
                              rows: org.apache.spark.sql.Dataset[MrIterRow],
                              satFor: IndexedSeq[MrIterRow] => Cep.CepSat,
                              stepNames: IndexedSeq[String])

  private def cmpD(op: String, l: Double, r: Double): Boolean =
    if (l.isNaN || r.isNaN) false
    else op match {
      case "=" => l == r
      case "!=" => l != r
      case "<" => l < r
      case ">" => l > r
      case "<=" => l <= r
      case _ => l >= r
    }

  private def iterPrep(df: DataFrame, spec: MrSpec, key: String,
                       tsC: String, ordC: String): IterPrep = {
    import org.apache.spark.sql.functions.{array, coalesce, col, expr, lit}
    val sp = df.sparkSession
    import sp.implicits._
    val steps = spec.stepElems
    val defMap = spec.defMap
    val pat = CepPattern(
      steps.map(e => CepStep(e.variable, e.minRep, e.maxRep, e.negated, e.greedy)),
      spec.withinMinutes, spec.skip, spec.strict)
    val navCols = (spec.navConds.values.flatten.toSeq
        .flatMap(nc => Seq(nc.leftCol, nc.nav.colName)) ++
      spec.aggConds.values.flatten.toSeq.flatMap(_.colName)).distinct
    val colIdx = navCols.zipWithIndex.toMap
    val stepIdxByVar = steps.map(_.variable).zipWithIndex.toMap
    val stepNavs: IndexedSeq[IndexedSeq[MrNavExec]] = steps.map(e =>
      spec.navConds.getOrElse(e.variable, Nil).map(nc =>
        MrNavExec(colIdx(nc.leftCol), nc.op, nc.nav.fn,
          stepIdxByVar(nc.nav.variable), colIdx(nc.nav.colName),
          nc.nav.n)).toIndexedSeq).toIndexedSeq
    val stepAggs: IndexedSeq[IndexedSeq[MrAggExec]] = steps.map(e =>
      spec.aggConds.getOrElse(e.variable, Nil).map(ac =>
        MrAggExec(ac.func, stepIdxByVar(ac.variable),
          ac.colName.map(colIdx).getOrElse(-1), ac.op,
          ac.rhs)).toIndexedSeq).toIndexedSeq
    val cfArr = array(steps.map(e =>
      coalesce(expr(defMap(e.variable)).cast("boolean"), lit(false))): _*)
    val nvArr = array(navCols.map(c =>
      coalesce(col(c).cast("double"), lit(Double.NaN))): _*)
    // A NULL `value` must fail LOUDLY, mirroring the symbolic route
    // (whose non-nullable Ev encoder rejects NULLs): silently
    // coalescing to 0.0 would let COUNT/AVG count the row and MIN
    // return 0.0 — a silent SQL-null divergence between routes
    // (round-12 ADVICE fix). coalesce short-circuits, so the
    // raise_error branch only evaluates on an actual NULL.
    val valueCol =
      if (df.columns.contains("value"))
        coalesce(col("value").cast("double"),
          org.apache.spark.sql.functions.raise_error(lit(
            "iterative MATCH_RECOGNIZE route: NULL in the `value` " +
              "column — the CEP event model needs a non-null numeric " +
              "value (the symbolic route rejects NULLs the same way); " +
              "filter or coalesce upstream")).cast("double"))
      else lit(0.0)
    val rows = df.select(col(key).cast("long").as("k"), col(tsC).as("ts"),
        col(ordC).cast("long").as("ord"), cfArr.as("cf"), nvArr.as("nv"),
        valueCol.as("vl"))
      .as[MrIterRow]
    def satFor(evs: IndexedSeq[MrIterRow]): Cep.CepSat = (si, ei, ctx) =>
      evs(ei).cf(si) && stepNavs(si).forall { ne =>
        val left = evs(ei).nv(ne.leftIdx)
        val right: Double = ne.fn match {
          case "PREV" =>
            if (ei - ne.n >= 0) evs(ei - ne.n).nv(ne.navColIdx) else Double.NaN
          case "NEXT" =>
            if (ei + ne.n < evs.size) evs(ei + ne.n).nv(ne.navColIdx) else Double.NaN
          case "FIRST" =>
            val c = ctx(ne.navStepIdx)
            if (c.size > ne.n) evs(c(ne.n)).nv(ne.navColIdx) else Double.NaN
          case _ => // LAST
            val c = ctx(ne.navStepIdx)
            if (c.size > ne.n) evs(c(c.size - 1 - ne.n)).nv(ne.navColIdx)
            else Double.NaN
        }
        cmpD(ne.op, left, right)
      } && stepAggs(si).forall { ae =>
        // SQL:2016 RUNNING semantics: the aggregate ranges over the rows
        // the scoped variable has consumed SO FAR in this attempt, plus
        // the current row when it is being tested FOR that variable
        // (Flink IterativeCondition + the current event). NULL column
        // values (NaN here) are skipped; an empty scope makes
        // SUM/AVG/MIN/MAX NULL → comparison false.
        val sofar = ctx(ae.aggStepIdx)
        val withCur = ae.aggStepIdx == si
        val lhs: Double =
          if (ae.colIdx < 0) { // COUNT(var.*): every scoped row counts
            sofar.size + (if (withCur) 1 else 0)
          } else {
            var n = 0
            var sum = 0.0
            var mn = Double.PositiveInfinity
            var mx = Double.NegativeInfinity
            def add(v: Double): Unit = if (!v.isNaN) {
              n += 1; sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            sofar.foreach(i => add(evs(i).nv(ae.colIdx)))
            if (withCur) add(evs(ei).nv(ae.colIdx))
            ae.func match {
              case "COUNT" => n
              case _ if n == 0 => Double.NaN // empty scope → SQL null
              case "SUM" => sum
              case "AVG" => sum / n
              case "MIN" => mn
              case _ => mx
            }
          }
        cmpD(ae.op, lhs, ae.rhs)
      }
    IterPrep(pat, rows, satFor, steps.map(_.variable).toIndexedSeq)
  }

  private def runIter(df: DataFrame, spec: MrSpec, key: String,
                      tsC: String, ordC: String): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val prep = iterPrep(df, spec, key, tsC, ordC)
    prep.rows.groupByKey(_.k).flatMapGroups { (user: Long, it: Iterator[MrIterRow]) =>
      val evs = it.toIndexedSeq.sortBy(r => (tsUs(r.ts), r.ord))
      val tsArr = evs.map(r => tsUs(r.ts))
      val sat = prep.satFor(evs)
      // '$' pins candidate ends to the partition's last row INSIDE the
      // matcher (validateAnchorEnd scoped the shapes); unanchored specs
      // run the plain reference matcher
      val ms =
        if (spec.anchorEnd)
          Cep.matchCoreAnchoredEnd(evs.size, i => tsArr(i), prep.pat, sat)
        else Cep.matchCore(evs.size, i => tsArr(i), prep.pat, sat)
      ms.iterator.map { m =>
        graft.streaming.CepPatMatch(user, evs(m.startIdx).ord, evs(m.startIdx).ts,
          evs(m.endIdx).ord, evs(m.endIdx).ts, m.nRows.toLong,
          m.stepCounts.mkString(","))
      }
    }.toDF().withColumnRenamed("user_id", key)
  }

  /** The iterative matcher's CONSUMED-ROW projection — the same
    * columns as [[consumedRows]] (user_id, start_id, end_id, pos,
    * event_id, ts, step, value), so nav/agg-bearing specs feed the
    * SAME general MEASURES executors and ALL ROWS output path as the
    * symbolic route. `pos` follows the cepAllRowsPattern convention:
    * steps in pattern order, each step's rows in consumption order
    * (equal to event order — steps consume sequentially). Placement:
    * one flatMapGroups per key, identical shuffle shape to
    * [[runIter]]. With `anchoredEnd`, candidate ends are pinned to the
    * partition's last row INSIDE the matcher (matchCoreRows'
    * requiredEnd) — the consumed-row sets of TRUE anchored matches,
    * never a post-filter over committed unanchored ends. */
  private def runIterConsumed(df: DataFrame, spec: MrSpec, key: String,
                              tsC: String, ordC: String,
                              anchoredEnd: Boolean = false): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val prep = iterPrep(df, spec, key, tsC, ordC)
    prep.rows.groupByKey(_.k).flatMapGroups { (user: Long, it: Iterator[MrIterRow]) =>
      val evs = it.toIndexedSeq.sortBy(r => (tsUs(r.ts), r.ord))
      val tsArr = evs.map(r => tsUs(r.ts))
      val sat = prep.satFor(evs)
      val reqEnd = if (anchoredEnd) evs.size - 1 else -1
      Cep.matchCoreRows(evs.size, i => tsArr(i), prep.pat, sat,
          requiredEnd = reqEnd)
        .iterator.flatMap { case (m, consumed) =>
          val startId = evs(m.startIdx).ord
          val endId = evs(m.endIdx).ord
          var pos = 0L
          for (si <- consumed.indices.iterator; i <- consumed(si).iterator) yield {
            pos += 1
            val r = evs(i)
            graft.streaming.CepAllRow(user, startId, endId, pos, r.ord, r.ts,
              prep.stepNames(si), r.vl)
          }
        }
    }.toDF()
  }

  /** The DuckDB replay of [[run]] on the same text — generated from
    * the SAME parsed spec via the existing oracle generators, so the
    * parse itself is pinned cross-engine. `table` overrides the
    * statement's `FROM` table (default `events`). */
  def oracleFor(sql: String, table: String = ""): String = {
    val spec = parse(sql)
    require(!spec.isIterative,
      "no generated oracle for DEFINE navigation / aggregate " +
        "conditions — the predicate is match-relative, so the " +
        "derivation route cannot express it; hand-formulate the " +
        "semantics independently (see the event_cep_iterative oracle's " +
        "row_number-first-successor shape)")
    require(spec.measures.isEmpty || (!spec.allRows && spec.measuresValCol.nonEmpty),
      "no generated oracle for the general MEASURES route — " +
        "hand-formulate it over an independent consumed-rows rewrite " +
        "(see the event_cep_sql_agg / event_cep_sql_runagg oracles, " +
        "which aggregate / window the AllRowsOracle islands CTEs)")
    val t = if (table.nonEmpty) table else spec.fromTable.getOrElse("events")
    if (spec.hasAlternation) {
      // the same branch expansion + leftmost-preference dedup as
      // runAlternation, each branch replayed by its own generated
      // oracle; under '$' the end pin filters each branch BEFORE the
      // dedup, mirroring runAlternation's pinned union exactly
      val keyCol = spec.partitionBy.head
      val (tsC, ordC) = (spec.orderBy(0), spec.orderBy(1))
      // under '$' the generated per-branch replay is the COMMITTED
      // (greedy, first-qualifying) walk + an end pin — exact only for
      // strict all-greedy branches (forced decomposition); reluctant
      // or relaxed branches anchor via backtracking / pinned-final
      // search the replay cannot express, so their oracles must be
      // hand-formulated (or generated from the greedy twin, as the
      // declared _alt_reluctant / _alt_sums keys do)
      require(!spec.anchorEnd || spec.expandBranches.forall(b =>
          b.strict && b.stepElems.forall(_.greedy)),
        "no generated oracle for reluctant or relaxed branches under " +
          "the '$' anchor — the pinned replay under-matches the " +
          "anchored search; hand-formulate, or generate from the " +
          "all-greedy strict twin where the decomposition-forcing " +
          "argument applies")
      val bs = spec.expandBranches.map(b => oracleForSpec(b, t))
      val bd =
        if (!spec.anchorEnd) ""
        else s""",
                |__bd AS (SELECT $keyCol AS __k, $ordC AS __last FROM (
                |  SELECT $keyCol, $ordC, row_number() OVER (PARTITION BY $keyCol
                |    ORDER BY $tsC DESC, $ordC DESC) AS __rn FROM $t) WHERE __rn = 1)""".stripMargin
      val ctes = bs.zipWithIndex
        .map { case (q, i) => s"__alt$i AS (\n$q)" }
        .mkString("WITH ", ",\n", "") + bd
      val unions = bs.indices
        .map(i => s"SELECT *, $i AS __br FROM __alt$i")
        .mkString("\n      UNION ALL\n      ")
      val pinned =
        if (!spec.anchorEnd) s"($unions)"
        else s"""(SELECT u.* FROM ($unions) u
                |       JOIN __bd ON u.$keyCol = __bd.__k
                |                AND u.end_id = __bd.__last)""".stripMargin
      // branches share the element order (each group picks one
      // variable in place), so the winning branch's per-step sums ARE
      // the element-wise step_sums — carry them through when the spec
      // declares the compiled measures form. PERMUTE branches order
      // the steps differently, so its per-branch replay already emits
      // step_counts/step_sums in that branch's order — the engine's
      // branch-tagged form (round 16) additionally reports the branch
      // index, which the union's __br IS (both sides expand branches
      // in the same lexicographic order).
      val sumsCol = if (spec.measuresValCol.isEmpty) "" else ", step_sums"
      val brCol = if (spec.permute && spec.measuresValCol.nonEmpty)
        ", __br AS branch" else ""
      return s"""$ctes
                |SELECT $keyCol, start_id, start_ts, end_id, end_ts,
                |       n_rows, step_counts$sumsCol$brCol
                |FROM (SELECT *, row_number() OVER (PARTITION BY $keyCol,
                |        start_id ORDER BY __br) AS __rn
                |      FROM $pinned)
                |WHERE __rn = 1 ORDER BY $keyCol, start_id""".stripMargin
    }
    oracleForSpec(spec, t)
  }

  private def oracleForSpec(spec: MrSpec, t: String): String = {
    val (key, tsC, ordC) = (spec.partitionBy.head, spec.orderBy(0), spec.orderBy(1))
    (spec.toSymbolic, spec.measuresValCol) match {
      case (Some((symCol, pat)), None) => Cep.oracleSql(pat, t, key, tsC, ordC, symCol)
      case (Some((symCol, pat)), Some(v)) =>
        Cep.oracleSqlMeasures(pat, v, t, key, tsC, ordC, symCol)
      case (None, None) => Cep.oracleSqlWhere(spec.toCond, t, key, tsC, ordC)
      case (None, Some(v)) =>
        Cep.oracleSqlWhereMeasures(spec.toCond, v, t, key, tsC, ordC)
    }
  }

  // ---------- renderer (canonical text from the DSL) ----------

  private def quantTxt(mn: Int, mx: Option[Int], greedy: Boolean): String = {
    val q = (mn, mx) match {
      // a reluctant exactly-one step must NOT render as a bare `?`
      // (that's the optional quantifier) — spell the bounds out
      case (1, Some(1)) => if (greedy) "" else "{1,1}"
      case (1, None) => "+"
      case (0, None) => "*"
      case (0, Some(1)) => "?"
      case (m, Some(n)) if m == n => s"{$m}"
      case (m, None) => s"{$m,}"
      case (m, Some(n)) => s"{$m,$n}"
    }
    if (greedy) q else q + "?"
  }

  private def renderClauses(keyCol: String, tsCol: String, ordCol: String,
                            skip: CepSkip, within: Option[Int],
                            patternTxt: String, defineTxt: String,
                            measuresValCol: Option[String],
                            skipName: String => String): String = {
    val skipTxt = skip match {
      case SkipPastLastRow => "PAST LAST ROW"
      case SkipToNextRow => "TO NEXT ROW"
      case SkipToFirst(s) => s"TO FIRST ${skipName(s)}"
      case SkipToLast(s) => s"TO LAST ${skipName(s)}"
    }
    val measuresTxt = measuresValCol
      .map(v => s"\n  MEASURES SUM($v) AS step_sums").getOrElse("")
    val withinTxt = within.map(m => s"\n  WITHIN INTERVAL '$m' MINUTE").getOrElse("")
    s"""MATCH_RECOGNIZE (
       |  PARTITION BY $keyCol
       |  ORDER BY $tsCol, $ordCol$measuresTxt
       |  ONE ROW PER MATCH
       |  AFTER MATCH SKIP $skipTxt
       |  PATTERN ($patternTxt)$withinTxt
       |  DEFINE $defineTxt
       |)""".stripMargin
  }

  private def requireRenderable(anyMatch: Boolean): Unit =
    require(!anyMatch,
      "followedByAny has no MATCH_RECOGNIZE surface (Flink SQL cannot " +
        "express it either) — use the CepPattern DSL")

  /** Canonical MATCH_RECOGNIZE text for a symbolic pattern: variables
    * are the step symbols, DEFINEs are `symCol = 'symbol'` equalities
    * (deduplicated — the same symbol may repeat in PATTERN), relaxed
    * contiguity renders gap variables `__g<i>*` between step pairs not
    * already separated by a negated step. `parse(render(p))` recovers
    * `p` exactly (CepSqlSpec round-trips every declared pattern). */
  def render(pattern: CepPattern, keyCol: String = "user_id",
             tsCol: String = "ts", ordCol: String = "event_id",
             symCol: String = "event_type",
             measuresValCol: Option[String] = None): String = {
    requireRenderable(pattern.anyMatch)
    pattern.steps.foreach(s => require(s.symbol.matches("[A-Za-z_]\\w*"),
      s"symbol '${s.symbol}' is not renderable as a pattern variable"))
    val parts = Vector.newBuilder[String]
    var g = 0
    for (i <- pattern.steps.indices) {
      val s = pattern.steps(i)
      parts += (if (s.negated) s"!${s.symbol}"
                else s.symbol + quantTxt(s.minRep, s.maxRep, s.greedy))
      val needGap = !pattern.strict && i + 1 < pattern.steps.size &&
        !s.negated && !pattern.steps(i + 1).negated
      if (needGap) { g += 1; parts += s"__g$g*" }
    }
    val defs = pattern.steps.map(_.symbol).distinct.map(sym =>
      s"$sym AS $symCol = '${sym.replace("'", "''")}'")
    renderClauses(keyCol, tsCol, ordCol, pattern.skip, pattern.withinMinutes,
      parts.result().mkString(" "), defs.mkString(",\n         "),
      measuresValCol, identity)
  }

  /** Canonical text for a value-predicate pattern: variables are the
    * step names, DEFINEs carry each step's EFFECTIVE predicate (the
    * until() stop fold `(accept) AND NOT (stop)` — [[CepCondStep
    * .effectiveSql]]), so `parse(render(p)).toCond.caseSql ==
    * p.caseSql` and the compiled plans and generated oracles are
    * bit-identical even though the parsed form carries no separate
    * untilSql. */
  def render(pattern: CepCondPattern, keyCol: String, tsCol: String,
             ordCol: String, measuresValCol: Option[String]): String = {
    requireRenderable(pattern.anyMatch)
    val parts = Vector.newBuilder[String]
    var g = 0
    for (i <- pattern.steps.indices) {
      val s = pattern.steps(i)
      parts += (if (s.negated) s"!${s.name}"
                else s.name + quantTxt(s.minRep, s.maxRep, s.greedy))
      val needGap = !pattern.strict && i + 1 < pattern.steps.size &&
        !s.negated && !pattern.steps(i + 1).negated
      if (needGap) { g += 1; parts += s"__g$g*" }
    }
    val defs = pattern.steps.map(s => s"${s.name} AS ${s.effectiveSql}")
    renderClauses(keyCol, tsCol, ordCol, pattern.skip, pattern.withinMinutes,
      parts.result().mkString(" "), defs.mkString(",\n         "),
      measuresValCol, identity)
  }

  def render(pattern: CepCondPattern): String =
    render(pattern, "user_id", "ts", "event_id", None)
}
