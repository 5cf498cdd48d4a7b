package graft

import graft.api._
import org.apache.spark.sql.functions._

/** The CEP compiler's ground-truth gate: on random patterns (quantifiers
  * incl. optionals and bounds, WITHIN on/off, both skip strategies) and
  * random multi-key event sequences, the distributed gaps-and-islands
  * plan from Cep.compile must reproduce Cep.matchSequence — the
  * sequential executable semantics — match for match, measure for
  * measure.
  */
class CepSpec extends SparkSuite {
  import spark.implicits._

  private val symbols = Vector("A", "B", "C", "D")

  /** Random pattern over distinct symbols (the compiler's domain).
    * Steps randomly flip to reluctant (greedy = false) — under strict
    * contiguity with distinct symbols only the last step's flag can
    * change results, but the matcher must honor every flag.
    */
  private def randomPattern(rnd: scala.util.Random): CepPattern = {
    val nSteps = 2 + rnd.nextInt(2)
    val syms = rnd.shuffle(symbols).take(nSteps)
    val steps = syms.zipWithIndex.map { case (s, i) =>
      val edge = i == 0 || i == nSteps - 1
      val mn = if (edge) 1 + rnd.nextInt(2) else rnd.nextInt(3)
      val mx = rnd.nextInt(3) match {
        case 0 => None
        case _ => Some(math.max(math.max(mn, 1), 1 + rnd.nextInt(3)))
      }
      CepStep(s, mn, mx, greedy = rnd.nextBoolean())
    }
    val within = if (rnd.nextBoolean()) Some(5 + rnd.nextInt(30)) else None
    val skip = if (rnd.nextBoolean()) SkipPastLastRow else SkipToNextRow
    CepPattern(steps, within, skip)
  }

  /** Relaxed-contiguity variant: compile supports SKIP TO NEXT ROW only.
    * Half the time a notFollowedBy step (unused symbol) is inserted into
    * a random gap (negation excludes optionals, so those are stripped).
    */
  private def randomRelaxedPattern(rnd: scala.util.Random): CepPattern = {
    val p0 = randomPattern(rnd)
    // relaxed modes are greedy-only (CepPattern require)
    val p = p0.copy(steps = p0.steps.map(_.copy(greedy = true)))
    val base = p.copy(skip = SkipToNextRow, strict = false,
      // always bounded, with a longer horizon: relaxed chains span gaps
      // (tiny withins match nothing), and an unbounded relaxed pattern
      // legitimately waits forever on a never-arriving symbol — the
      // incremental-scan property test needs every anchor resolvable
      withinMinutes = Some(p.withinMinutes.getOrElse(20) * 20))
    val unused = symbols.filterNot(base.steps.map(_.symbol).contains)
    if (unused.isEmpty || rnd.nextBoolean()) base
    else {
      val solid = base.steps.map(s => if (s.minRep == 0) s.copy(minRep = 1) else s)
      val at = 1 + rnd.nextInt(solid.size - 1)
      base.copy(steps = solid.take(at) ++
        Seq(CepStep(unused(rnd.nextInt(unused.size)), negated = true)) ++
        solid.drop(at))
    }
  }

  /** Random keyed sequences: symbols from the alphabet plus a noise
    * symbol X, timestamps strictly increasing with random minute gaps
    * (so WITHIN bites), run-heavy (repeat probability) so quantifiers
    * exercise.
    */
  private def randomEvents(rnd: scala.util.Random, nKeys: Int): Seq[(Long, String, Long, Long)] = {
    var ord = 0L
    (0 until nKeys).flatMap { k =>
      var tsUs = 0L
      val n = 20 + rnd.nextInt(60)
      var last = "X"
      (0 until n).map { _ =>
        val sym = if (rnd.nextInt(100) < 45) last
                  else (symbols :+ "X")(rnd.nextInt(5))
        last = sym
        tsUs += (1 + rnd.nextInt(12)) * 60L * 1000000L
        ord += 1
        (k.toLong, sym, tsUs, ord)
      }
    }
  }

  private def referenceSet(evs: Seq[(Long, String, Long, Long)],
                           pat: CepPattern): Set[(Long, Long, Long, Long, String)] =
    evs.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4))
        .map(r => CepEvent(r._2, r._3, r._4)).toIndexedSeq
      Cep.matchSequence(sorted, pat).map { m =>
        (k, sorted(m.startIdx).ord, sorted(m.endIdx).ord,
          m.nRows.toLong, m.stepCounts.mkString(","))
      }
    }.toSet

  private def compiledSet(evs: Seq[(Long, String, Long, Long)],
                          pat: CepPattern): Set[(Long, Long, Long, Long, String)] = {
    val df = evs.toDF("k", "sym", "ts_us", "ord")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    Cep.compile(df, "k", "ts", "ord", "sym", pat)
      .select(col("k"), col("start_id"), col("end_id"), col("n_rows"), col("step_counts"))
      .as[(Long, Long, Long, Long, String)].collect().toSet
  }

  test("compiled plan == sequential reference on random patterns and sequences") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 25) {
      val pat = randomPattern(rnd)
      val evs = randomEvents(rnd, 4)
      val (got, want) = (compiledSet(evs, pat), referenceSet(evs, pat))
      assert(got == want,
        s"trial $trial pattern $pat:\n missing=${(want -- got).take(5)}\n extra=${(got -- want).take(5)}")
    }
  }

  test("relaxed-contiguity compiled plan == sequential reference on random patterns") {
    val rnd = new scala.util.Random(7)
    var nonEmpty = 0
    for (trial <- 0 until 25) {
      val pat = randomRelaxedPattern(rnd)
      val evs = randomEvents(rnd, 4)
      val (got, want) = (compiledSet(evs, pat), referenceSet(evs, pat))
      if (want.nonEmpty) nonEmpty += 1
      assert(got == want,
        s"trial $trial pattern $pat:\n missing=${(want -- got).take(5)}\n extra=${(got -- want).take(5)}")
    }
    assert(nonEmpty >= 10, s"only $nonEmpty/25 relaxed trials produced matches")
  }

  /** Random relaxed pattern eligible for the SKIP TO FIRST/LAST compile:
    * optionals solidified (single alternative) and the target a random
    * non-first positive step. */
  private def randomSkipPattern(rnd: scala.util.Random): CepPattern = {
    val base = randomRelaxedPattern(rnd)
    val p = base.copy(steps = base.steps.map(s =>
      if (!s.negated && s.minRep == 0) s.copy(minRep = 1) else s))
    val targets = p.steps.drop(1).filterNot(_.negated)
    val t = targets(rnd.nextInt(targets.size)).symbol
    p.copy(skip = if (rnd.nextBoolean()) SkipToFirst(t) else SkipToLast(t))
  }

  /** Strict variant (optionals and reluctant flags kept — only the
    * target must be a non-first minRep>=1 step; randomPattern's edge
    * steps always qualify). Exercises the sealing matcher's contiguous
    * prefix-sum resume path; compile normalizes these to PAST LAST ROW
    * (the strict theorem). */
  private def randomStrictSkipPattern(rnd: scala.util.Random): CepPattern = {
    val p = randomPattern(rnd)
    val targets = p.steps.drop(1).filter(_.minRep >= 1)
    val t = targets(rnd.nextInt(targets.size)).symbol
    p.copy(skip = if (rnd.nextBoolean()) SkipToFirst(t) else SkipToLast(t))
  }

  test("SKIP TO FIRST/LAST compiled chain == sequential reference, and the chain bites") {
    val rnd = new scala.util.Random(13)
    var nonEmpty = 0
    var thinned = 0
    for (trial <- 0 until 25) {
      val pat = randomSkipPattern(rnd)
      val evs = randomEvents(rnd, 4)
      val (got, want) = (compiledSet(evs, pat), referenceSet(evs, pat))
      assert(got == want,
        s"trial $trial pattern $pat:\n missing=${(want -- got).take(5)}\n extra=${(got -- want).take(5)}")
      if (want.nonEmpty) nonEmpty += 1
      // non-vacuity of the strategy itself: across the trials the skip
      // chain must actually differ from BOTH neighbouring strategies
      // (TO NEXT ROW's full overlap set and PAST LAST ROW's
      // non-overlapping set — the sequential matcher runs all three)
      val next = referenceSet(evs, pat.copy(skip = SkipToNextRow))
      val past = referenceSet(evs, pat.copy(skip = SkipPastLastRow))
      if (want != next && want != past) thinned += 1
    }
    assert(nonEmpty >= 10, s"only $nonEmpty/25 skip trials produced matches")
    assert(thinned >= 1,
      s"skip chain never sat strictly between TO NEXT and PAST LAST ($thinned/25)")
  }

  test("SKIP TO FIRST/LAST sits strictly between TO NEXT and PAST LAST (deterministic)") {
    // A A B A B C on one key, relaxed A -> B -> C unbounded greedy:
    //   PAST LAST ROW: one match {A1 A2 B3 _ _ C6}, resume past row 6.
    //   TO NEXT ROW: three matches (anchors 1, 2, 4).
    //   TO FIRST/LAST "B": resume AT B3 -> the gap row A4 anchors the
    //   overlap {A4 B5 C6}, but the anchor-2 overlap is suppressed ->
    //   exactly two matches. B runs have length 1 here, so FIRST and
    //   LAST coincide (they always do under the compiler's distinct-
    //   symbols precondition: rows between a run's first and last
    //   consumed row are all the target symbol, never an anchor).
    val evs = Seq("A", "A", "B", "A", "B", "C").zipWithIndex.map {
      case (s, i) => (1L, s, (i + 1) * 60L * 1000000L, (i + 1).toLong)
    }
    val base = CepPattern(Seq(CepStep("A", 1, None), CepStep("B", 1, None),
      CepStep("C", 1, None)), None, SkipToNextRow, strict = false)
    val next = referenceSet(evs, base)
    val past = referenceSet(evs, base.copy(skip = SkipPastLastRow))
    assert(past.size == 1 && next.size == 3, s"scenario drifted: $past / $next")
    for (sk <- Seq(SkipToFirst("B"), SkipToLast("B"))) {
      val pat = base.copy(skip = sk)
      val want = referenceSet(evs, pat)
      assert(want.size == 2 && past.subsetOf(want) && want.subsetOf(next),
        s"$sk chain not strictly between: $want")
      assert(compiledSet(evs, pat) == want, s"compiled $sk diverged")
    }
  }

  test("strict SKIP TO FIRST/LAST == SKIP PAST LAST ROW (the scaladoc theorem)") {
    val rnd = new scala.util.Random(99)
    var checked = 0
    for (_ <- 0 until 20) {
      val pat0 = randomPattern(rnd)
      val targets = pat0.steps.drop(1).filter(_.minRep >= 1)
      if (targets.nonEmpty) {
        val t = targets(rnd.nextInt(targets.size)).symbol
        val evs = randomEvents(rnd, 3)
        val past = referenceSet(evs, pat0.copy(skip = SkipPastLastRow))
        for (sk <- Seq(SkipToFirst(t), SkipToLast(t))) {
          val pat = pat0.copy(skip = sk)
          assert(referenceSet(evs, pat) == past,
            s"sequential strict $sk diverged from PAST LAST ROW on $pat0")
          assert(compiledSet(evs, pat) == past,
            s"compiled strict $sk diverged from PAST LAST ROW on $pat0")
        }
        checked += 1
      }
    }
    assert(checked >= 10, s"only $checked/20 strict-theorem trials eligible")
  }

  test("strict reference matcher == java.util.regex greedy semantics (repeated symbols too)") {
    // an INDEPENDENT implementation of the strict semantics: map symbols
    // to chars, compile greedy quantifier groups, scan with Matcher —
    // leftmost-find is the anchor scan, find-from-match-end is SKIP PAST
    // LAST ROW, group lengths are the per-step counts. Patterns here MAY
    // repeat symbols (beyond the compiler's domain — the sequential
    // matcher's own contract).
    val rnd = new scala.util.Random(11)
    val charOf = Map("A" -> 'a', "B" -> 'b', "C" -> 'c', "D" -> 'd', "X" -> 'x')
    var nonEmpty = 0
    for (trial <- 0 until 40) {
      val nSteps = 2 + rnd.nextInt(3)
      val steps = (0 until nSteps).map { i =>
        val edge = i == 0 || i == nSteps - 1
        val mn = if (edge) 1 else rnd.nextInt(2)
        val mx = rnd.nextInt(3) match {
          case 0 => None
          case _ => Some(math.max(math.max(mn, 1), 1 + rnd.nextInt(3)))
        }
        // repeats allowed; random greedy/reluctant per step — with
        // repeated symbols EVERY step's mode can change results, and
        // java regex pins both via its greedy vs non-greedy quantifiers
        CepStep(symbols(rnd.nextInt(symbols.size)), mn, mx,
          greedy = rnd.nextBoolean())
      }
      val skip = if (rnd.nextBoolean()) SkipPastLastRow else SkipToNextRow
      val within = if (rnd.nextBoolean()) Some(5 + rnd.nextInt(40)) else None
      val pat = CepPattern(steps, within, skip)
      val evs = randomEvents(rnd, 3)
      val byKey = evs.groupBy(_._1)
      val rx = java.util.regex.Pattern.compile(steps.map { s =>
        val q = s.maxRep.map(m => s"{${s.minRep},$m}").getOrElse(s"{${s.minRep},}") +
          (if (s.greedy) "" else "?")
        s"(${charOf(s.symbol)}$q)"
      }.mkString)
      byKey.foreach { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._4))
        val seq = sorted.map(r => CepEvent(r._2, r._3, r._4)).toIndexedSeq
        val str = sorted.map(r => charOf(r._2)).mkString
        val wantBuf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Seq[Int])]
        val m = rx.matcher(str)
        var from = 0
        while (from <= str.length && m.find(from)) {
          val (s0, e0) = (m.start, m.end - 1)
          val ok = within.forall(w =>
            seq(e0).tsUs - seq(s0).tsUs <= w * 60L * 1000000L)
          if (ok) {
            wantBuf += ((s0, e0,
              (1 to nSteps).map(g => Option(m.group(g)).map(_.length).getOrElse(0))))
            from = skip match {
              case SkipPastLastRow => e0 + 1
              case SkipToNextRow => s0 + 1
            }
          } else from = s0 + 1
        }
        val got = Cep.matchSequence(seq, pat)
          .map(mm => (mm.startIdx, mm.endIdx, mm.stepCounts.toSeq))
        if (got.nonEmpty) nonEmpty += 1
        assert(got == wantBuf.toSeq,
          s"trial $trial key $k pattern $pat:\n got=$got\n want=${wantBuf.toSeq}\n str=$str")
      }
    }
    assert(nonEmpty >= 20, s"only $nonEmpty key-sequences produced matches")
  }

  test("anchored-end STRICT matcher == java.util.regex with '$' (greedy and reluctant)") {
    // the independent reference for round-13's true anchored matching:
    // the same char-mapped regex as the unanchored cross-validation,
    // SUFFIXED '$' — java regex backtracks candidate counts until a
    // resolution ends at the last char, exactly what matchCoreRows'
    // requiredEnd pruning must reproduce, for greedy AND reluctant
    // quantifiers
    val rnd = new scala.util.Random(1300)
    val charOf = Map("A" -> 'a', "B" -> 'b', "C" -> 'c', "D" -> 'd', "X" -> 'x')
    var nonEmpty = 0
    for (trial <- 0 until 40) {
      val nSteps = 2 + rnd.nextInt(3)
      val steps = (0 until nSteps).map { i =>
        val edge = i == 0 || i == nSteps - 1
        val mn = if (edge) 1 else rnd.nextInt(2)
        val mx = rnd.nextInt(3) match {
          case 0 => None
          case _ => Some(math.max(math.max(mn, 1), 1 + rnd.nextInt(3)))
        }
        CepStep(symbols(rnd.nextInt(symbols.size)), mn, mx,
          greedy = rnd.nextBoolean())
      }
      val skip = if (rnd.nextBoolean()) SkipPastLastRow else SkipToNextRow
      val within = if (rnd.nextBoolean()) Some(60 + rnd.nextInt(200)) else None
      val pat = CepPattern(steps, within, skip)
      val rx = java.util.regex.Pattern.compile(steps.map { s =>
        val q = s.maxRep.map(m => s"{${s.minRep},$m}").getOrElse(s"{${s.minRep},}") +
          (if (s.greedy) "" else "?")
        s"(${charOf(s.symbol)}$q)"
      }.mkString + "$")
      randomEvents(rnd, 3).groupBy(_._1).foreach { case (k, rows) =>
        val base = rows.sortBy(r => (r._3, r._4))
        // anchored matches need the SEQUENCE TAIL to fit the pattern —
        // vanishingly rare on pure noise, so half the keys get a
        // pattern-shaped suffix appended (minRep-or-1 rows per step);
        // the other half stay adversarial (empty want-sets must agree
        // too)
        val sorted =
          if (rnd.nextBoolean()) base
          else {
            var t = base.last._3
            var o = base.last._4
            base ++ steps.flatMap { st =>
              (0 until math.max(st.minRep, 1)).map { _ =>
                t += (1 + rnd.nextInt(5)) * 60L * 1000000L
                o += 1
                (k, st.symbol, t, o)
              }
            }
          }
        val seq = sorted.map(r => CepEvent(r._2, r._3, r._4)).toIndexedSeq
        val str = sorted.map(r => charOf(r._2)).mkString
        val wantBuf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Seq[Int])]
        val m = rx.matcher(str)
        var from = 0
        while (from <= str.length && m.find(from)) {
          val (s0, e0) = (m.start, m.end - 1)
          val ok = within.forall(w =>
            seq(e0).tsUs - seq(s0).tsUs <= w * 60L * 1000000L)
          if (ok) {
            wantBuf += ((s0, e0,
              (1 to nSteps).map(g => Option(m.group(g)).map(_.length).getOrElse(0))))
            from = skip match {
              case SkipPastLastRow => e0 + 1
              case SkipToNextRow => s0 + 1
            }
          } else from = s0 + 1
        }
        val got = Cep.matchCoreAnchoredEnd(seq.size, i => seq(i).tsUs, pat,
            (si, ei, _) => seq(ei).sym == pat.steps(si).symbol)
          .map(mm => (mm.startIdx, mm.endIdx, mm.stepCounts.toSeq))
        if (got.nonEmpty) nonEmpty += 1
        assert(got == wantBuf.toSeq,
          s"trial $trial key $k pattern $pat:\n got=$got\n want=${wantBuf.toSeq}\n str=$str")
      }
    }
    assert(nonEmpty >= 15, s"only $nonEmpty key-sequences produced anchored matches")
  }

  test("anchored-end RELAXED {1,1} matcher == java.util.regex lazy-gap form with '$'") {
    // independent reference for the pinned-final DFS: relaxed {1,1}
    // steps with gap rows are the regex `s0(?:.*?)s1(?:.*?)...sk$` —
    // lazy gaps prefer the earliest next step (first-qualifying) and
    // regex backtracking grows them until the final symbol sits on the
    // last char, exactly the anchored search order
    val rnd = new scala.util.Random(1301)
    val charOf = Map("A" -> 'a', "B" -> 'b', "C" -> 'c', "D" -> 'd', "X" -> 'x')
    var nonEmpty = 0
    for (trial <- 0 until 40) {
      val nSteps = 2 + rnd.nextInt(3)
      val steps = (0 until nSteps).map(_ =>
        CepStep(symbols(rnd.nextInt(symbols.size)), 1, Some(1)))
      val within = if (rnd.nextBoolean()) Some(120 + rnd.nextInt(300)) else None
      val pat = CepPattern(steps, within, SkipToNextRow, strict = false)
      val rx = java.util.regex.Pattern.compile(
        steps.map(s => s"${charOf(s.symbol)}").mkString("(?:.*?)") + "$")
      randomEvents(rnd, 3).groupBy(_._1).foreach { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._4))
        val seq = sorted.map(r => CepEvent(r._2, r._3, r._4)).toIndexedSeq
        val str = sorted.map(r => charOf(r._2)).mkString
        val wantBuf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        val m = rx.matcher(str)
        var from = 0
        while (from <= str.length && m.find(from)) {
          val (s0, e0) = (m.start, m.end - 1)
          val ok = within.forall(w =>
            seq(e0).tsUs - seq(s0).tsUs <= w * 60L * 1000000L)
          if (ok) wantBuf += ((s0, e0))
          from = s0 + 1
        }
        val got = Cep.matchCoreAnchoredEnd(seq.size, i => seq(i).tsUs, pat,
            (si, ei, _) => seq(ei).sym == pat.steps(si).symbol)
          .map(mm => (mm.startIdx, mm.endIdx))
        if (got.nonEmpty) nonEmpty += 1
        assert(got == wantBuf.toSeq,
          s"trial $trial key $k pattern $pat:\n got=$got\n want=${wantBuf.toSeq}\n str=$str")
      }
    }
    assert(nonEmpty >= 15, s"only $nonEmpty key-sequences produced anchored matches")
  }

  test("CepPattern.repeat: unrolled group == java.util.regex GROUP-form repetition") {
    // validates the unroll IDENTITY, not just the matcher: the regex is
    // written in group form `(?:g){n}` (java.util.regex implements true
    // group repetition) while the matcher runs CepPattern.repeat's
    // unrolled steps — agreement on random groups/counts/sequences pins
    // (A B){n} == A B A B … under greedy AND reluctant inner
    // quantifiers, WITHIN, and both skip strategies.
    val rnd = new scala.util.Random(29)
    val charOf = Map("A" -> 'a', "B" -> 'b', "C" -> 'c', "D" -> 'd', "X" -> 'x')
    var nonEmpty = 0
    for (trial <- 0 until 40) {
      val gSize = 1 + rnd.nextInt(3)
      val group = (0 until gSize).map { i =>
        // group head/tail stay non-optional so every copy boundary is
        // solid (the unrolled pattern's own head/tail rule)
        val edge = i == 0 || i == gSize - 1
        val mn = if (edge) 1 else rnd.nextInt(2)
        val mx = rnd.nextInt(3) match {
          case 0 => None
          case _ => Some(math.max(math.max(mn, 1), 1 + rnd.nextInt(3)))
        }
        CepStep(symbols(rnd.nextInt(symbols.size)), mn, mx,
          greedy = rnd.nextBoolean())
      }
      val n = 1 + rnd.nextInt(3)
      if (gSize * n >= 2) {
        val skip = if (rnd.nextBoolean()) SkipPastLastRow else SkipToNextRow
        val within = if (rnd.nextBoolean()) Some(5 + rnd.nextInt(40)) else None
        val pat = CepPattern.repeat(group, n, within, skip)
        assert(pat.steps.size == gSize * n, "unroll must concatenate n copies")
        val groupRx = group.map { s =>
          val q = s.maxRep.map(m => s"{${s.minRep},$m}").getOrElse(s"{${s.minRep},}") +
            (if (s.greedy) "" else "?")
          s"${charOf(s.symbol)}$q"
        }.mkString
        val rx = java.util.regex.Pattern.compile(s"(?:$groupRx){$n}")
        randomEvents(rnd, 3).groupBy(_._1).foreach { case (k, rows) =>
          val sorted = rows.sortBy(r => (r._3, r._4))
          val seq = sorted.map(r => CepEvent(r._2, r._3, r._4)).toIndexedSeq
          val str = sorted.map(r => charOf(r._2)).mkString
          val wantBuf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          val m = rx.matcher(str)
          var from = 0
          while (from <= str.length && m.find(from)) {
            val (s0, e0) = (m.start, m.end - 1)
            val ok = within.forall(w =>
              seq(e0).tsUs - seq(s0).tsUs <= w * 60L * 1000000L)
            if (ok) {
              wantBuf += ((s0, e0))
              from = skip match {
                case SkipPastLastRow => e0 + 1
                case SkipToNextRow => s0 + 1
              }
            } else from = s0 + 1
          }
          val got = Cep.matchSequence(seq, pat)
          if (got.nonEmpty) nonEmpty += 1
          assert(got.map(mm => (mm.startIdx, mm.endIdx)) == wantBuf.toSeq,
            s"trial $trial key $k group $group n=$n:\n got=$got\n want=${wantBuf.toSeq}\n str=$str")
          // strict contiguity: per-unrolled-step counts tile the span
          got.foreach(mm => assert(mm.nRows == mm.endIdx - mm.startIdx + 1,
            s"counts must tile the span: $mm"))
        }
      }
    }
    assert(nonEmpty >= 20, s"only $nonEmpty key-sequences produced matches")
  }

  test("CepPattern.repeat validates its inputs") {
    val g = Seq(CepStep("A"), CepStep("B"))
    intercept[IllegalArgumentException](CepPattern.repeat(g, 0))
    intercept[IllegalArgumentException](CepPattern.repeat(Seq.empty, 2))
    // an optional group head is the unrolled pattern's optional head —
    // rejected by the CepPattern invariant itself
    intercept[IllegalArgumentException](
      CepPattern.repeat(Seq(CepStep("A", minRep = 0), CepStep("B")), 2))
    assert(CepPattern.repeat(g, 3).steps.map(_.symbol) ==
      Seq("A", "B", "A", "B", "A", "B"))
  }

  test("SKIP TO FIRST/LAST target validation mirrors Flink's construction guards") {
    def mk(steps: Seq[CepStep], sk: CepSkip) =
      CepPattern(steps, None, sk, strict = false)
    val ab = Seq(CepStep("A"), CepStep("B"), CepStep("C"))
    // fine: unique, non-first, positive target
    mk(ab, SkipToFirst("B")); mk(ab, SkipToLast("C"))
    // unknown symbol
    intercept[IllegalArgumentException](mk(ab, SkipToFirst("Z")))
    // the first step (re-anchoring the match start would loop)
    intercept[IllegalArgumentException](mk(ab, SkipToFirst("A")))
    // an optional step (no guaranteed consumed row to resume at)
    intercept[IllegalArgumentException](mk(
      Seq(CepStep("A"), CepStep("B", minRep = 0), CepStep("C")), SkipToLast("B")))
    // a negated step (forbidden rows are never consumed)
    intercept[IllegalArgumentException](mk(
      Seq(CepStep("A"), CepStep("X", negated = true), CepStep("C")), SkipToFirst("X")))
    // a repeated symbol (ambiguous target) — legal pattern, illegal target
    intercept[IllegalArgumentException](CepPattern(
      Seq(CepStep("A"), CepStep("B"), CepStep("A"), CepStep("C")),
      None, SkipToFirst("A"), strict = true))
  }

  test("seal-aware incremental scan == batch reference over random batch splits") {
    // simulate StreamOps.cepPattern's state loop (buffer tail carry +
    // sealedScan per batch) over random in-order batch splits; with a
    // final sealing sentinel the accumulated emissions must equal the
    // batch matcher on the full stream — for strict AND relaxed
    // patterns, all four skip strategies (every third trial a relaxed
    // SKIP TO FIRST/LAST pattern, the strategies whose resume point is
    // carried inside each Sealed result)
    val rnd = new scala.util.Random(23)
    var nonEmpty = 0
    for (trial <- 0 until 60) {
      val pat =
        if (trial % 6 == 2) randomStrictSkipPattern(rnd)
        else if (trial % 3 == 2) randomSkipPattern(rnd)
        else if (trial % 2 == 0) randomPattern(rnd)
        else randomRelaxedPattern(rnd)
      val evs = randomEvents(rnd, 2)
      evs.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._4))
          .map(r => CepEvent(r._2, r._3, r._4)).toIndexedSeq
        // sealing sentinel: unmatched symbol far beyond every WITHIN
        // horizon (48 h), so run-open anchors seal and needs-future
        // alternatives go dead
        val sentinel = CepEvent("Z", sorted.last.tsUs + 48L * 3600L * 1000000L,
          sorted.last.ord + 1000000L)
        val full = sorted :+ sentinel
        // random in-order batch split points
        val cuts = (0 until 3).map(_ => rnd.nextInt(full.size)).sorted.distinct
        val batches = (Seq(0) ++ cuts ++ Seq(full.size)).distinct.sliding(2)
          .map { case Seq(a, b) => full.slice(a, b) }.filter(_.nonEmpty).toSeq
        var buf = IndexedSeq.empty[CepEvent]
        val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Int])]
        for (b <- batches) {
          val cur = (buf ++ b).sortBy(e => (e.tsUs, e.ord)).toIndexedSeq
          val (ms, resume) = graft.streaming.StreamOps.sealedScan(cur, pat)
          ms.foreach(m => got += ((cur(m.startIdx).ord, cur(m.endIdx).ord,
            m.stepCounts.toSeq)))
          buf = cur.drop(resume)
        }
        val want = Cep.matchSequence(full, pat)
          .map(m => (full(m.startIdx).ord, full(m.endIdx).ord, m.stepCounts.toSeq))
        if (want.nonEmpty) nonEmpty += 1
        assert(got.toSeq == want,
          s"trial $trial pattern $pat batches=${batches.map(_.size)}:\n got=${got.toSeq}\n want=$want")
      }
    }
    assert(nonEmpty >= 15, s"only $nonEmpty key-streams produced matches")
  }

  test("followedByAny compiled plan == sequential reference (multiset, duplicates legit)") {
    // anyMatch emits one match per qualifying RUN COMBINATION; two
    // combinations differing only in an unrecorded middle run produce
    // identical output rows, so the comparison is multiset, not set
    val rnd = new scala.util.Random(61)
    var nonEmpty = 0
    var dupSeen = 0
    for (trial <- 0 until 20) {
      val pat = randomRelaxedPattern(rnd).copy(anyMatch = true)
      val evs = randomEvents(rnd, 3)
      val df = evs.toDF("k", "sym", "ts_us", "ord")
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val got = Cep.compile(df, "k", "ts", "ord", "sym", pat)
        .select(col("k"), col("start_id"), col("end_id"), col("n_rows"), col("step_counts"))
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sorted
      val want = evs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._4))
          .map(r => CepEvent(r._2, r._3, r._4)).toIndexedSeq
        Cep.matchSequence(sorted, pat).map(m =>
          (k, sorted(m.startIdx).ord, sorted(m.endIdx).ord,
            m.nRows.toLong, m.stepCounts.mkString(",")))
      }.sorted
      if (want.nonEmpty) nonEmpty += 1
      if (want.size != want.distinct.size) dupSeen += 1
      assert(got == want,
        s"trial $trial pattern $pat:\n missing=${(want.diff(got)).take(5)}\n extra=${(got.diff(want)).take(5)}")
    }
    assert(nonEmpty >= 8, s"only $nonEmpty/20 any-mode trials produced matches")
  }

  test("value-predicate compile (derived symbol) == direct per-step condition evaluation") {
    // mutually exclusive random predicates (value buckets): the CASE
    // derivation + symbolic compile must equal evaluating each step's
    // predicate independently (matchSequenceIter) — the equivalence the
    // compileWhere contract claims for exclusive conditions
    val rnd = new scala.util.Random(83)
    var nonEmpty = 0
    for (trial <- 0 until 20) {
      val t1 = 20 + rnd.nextInt(30)
      val t2 = t1 + 10 + rnd.nextInt(30)
      val bands = Vector(
        ("lo", s"value < $t1", (v: Int) => v < t1),
        ("mid", s"value >= $t1 AND value < $t2", (v: Int) => v >= t1 && v < t2),
        ("hi", s"value >= $t2", (v: Int) => v >= t2))
      val nSteps = 2 + rnd.nextInt(2)
      val chosen = rnd.shuffle(bands).take(nSteps)
      val steps = chosen.zipWithIndex.map { case ((nm, sql, _), i) =>
        val edge = i == 0 || i == nSteps - 1
        val mn = if (edge) 1 else 1 + rnd.nextInt(2)
        val mx = if (rnd.nextBoolean()) None else Some(mn + rnd.nextInt(2))
        CepCondStep(nm, sql, mn, mx)
      }
      val strict = rnd.nextBoolean()
      val skip = if (strict && rnd.nextBoolean()) SkipPastLastRow else SkipToNextRow
      val anyMode = !strict && rnd.nextBoolean() // predicates + followedByAny compose
      val pat = CepCondPattern(steps, Some(200 + rnd.nextInt(300)), skip, strict,
        anyMatch = anyMode)
      // events with a value column driving the predicates
      var ord = 0L
      val evs = (0 until 3).flatMap { k =>
        var tsUs = 0L
        (0 until 30 + rnd.nextInt(40)).map { _ =>
          tsUs += (1 + rnd.nextInt(12)) * 60L * 1000000L
          ord += 1
          (k.toLong, rnd.nextInt(100), tsUs, ord)
        }
      }
      val df = evs.toDF("k", "value", "ts_us", "ord")
        .withColumn("ts", timestamp_micros(col("ts_us")))
      // multiset compare: any-mode legitimately emits duplicate rows
      val got = Cep.compileWhere(df, "k", "ts", "ord", pat)
        .select(col("k"), col("start_id"), col("end_id"), col("n_rows"), col("step_counts"))
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sorted
      val conds = chosen.map { case (_, _, f) =>
        (e: (Long, Int, Long, Long), _: IndexedSeq[Seq[(Long, Int, Long, Long)]]) => f(e._2)
      }.toIndexedSeq
      val want = evs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._4)).toIndexedSeq
        Cep.matchSequenceIter(sorted, (e: (Long, Int, Long, Long)) => e._3,
            pat.symbolic, conds)
          .map(m => (k, sorted(m.startIdx)._4, sorted(m.endIdx)._4,
            m.nRows.toLong, m.stepCounts.mkString(",")))
      }.sorted
      if (want.nonEmpty) nonEmpty += 1
      assert(got == want,
        s"trial $trial pattern $pat:\n missing=${(want.diff(got)).take(5)}\n extra=${(got.diff(want)).take(5)}")
    }
    assert(nonEmpty >= 8, s"only $nonEmpty/20 predicate trials produced matches")
  }

  test("until() stop condition == stop-first sequential evaluation, and the stop bites") {
    // random accept band with an OVERLAPPING stop threshold on the
    // looping step: the stop-gated derivation (compileWhere over
    // effectiveSql) must equal a sequential reference that implements
    // Flink's evaluation ORDER literally — stop checked FIRST, a row
    // satisfying it never enters the loop even when the accept band
    // matches. A vacuity guard requires the stop to change the output
    // vs the ungated pattern on most trials.
    val rnd = new scala.util.Random(211)
    var nonEmpty = 0
    var differs = 0
    for (trial <- 0 until 20) {
      val t1 = 30 + rnd.nextInt(30) // loop accepts value < t1
      val stop = 5 + rnd.nextInt(t1 - 5) // stop at value >= stop — inside the band
      val finCap = 1 + rnd.nextInt(2)
      val mkSteps = (u: Option[String]) => Seq(
        CepCondStep("run", s"value < $t1", 1, None, untilSql = u),
        CepCondStep("fin", s"value >= $t1", 1, Some(finCap)))
      val strict = rnd.nextBoolean()
      val skip = if (strict && rnd.nextBoolean()) SkipPastLastRow else SkipToNextRow
      val within = Some(200 + rnd.nextInt(300))
      val pat = CepCondPattern(mkSteps(Some(s"value >= $stop")), within, skip, strict)
      var ord = 0L
      val evs = (0 until 3).flatMap { k =>
        var tsUs = 0L
        (0 until 30 + rnd.nextInt(40)).map { _ =>
          tsUs += (1 + rnd.nextInt(12)) * 60L * 1000000L
          ord += 1
          (k.toLong, rnd.nextInt(100), tsUs, ord)
        }
      }
      val df = evs.toDF("k", "value", "ts_us", "ord")
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val got = Cep.compileWhere(df, "k", "ts", "ord", pat)
        .select(col("k"), col("start_id"), col("end_id"), col("n_rows"), col("step_counts"))
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sorted
      // stop-FIRST reference: mirror Flink's order structurally, not
      // the rewrite — if the stop condition holds, refuse before the
      // accept condition is even consulted
      type E = (Long, Int, Long, Long)
      val stopFirst: (E, IndexedSeq[Seq[E]]) => Boolean =
        (e, _) => if (e._2 >= stop) false else e._2 < t1
      val conds = IndexedSeq[(E, IndexedSeq[Seq[E]]) => Boolean](
        stopFirst, (e, _) => e._2 >= t1)
      def seqMatches(cs: IndexedSeq[(E, IndexedSeq[Seq[E]]) => Boolean],
                     p: CepCondPattern): Seq[(Long, Long, Long, Long, String)] =
        evs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
          val sorted = rows.sortBy(r => (r._3, r._4)).toIndexedSeq
          Cep.matchSequenceIter(sorted, (e: E) => e._3, p.symbolic, cs)
            .map(m => (k, sorted(m.startIdx)._4, sorted(m.endIdx)._4,
              m.nRows.toLong, m.stepCounts.mkString(",")))
        }.sorted.toSeq
      val want = seqMatches(conds, pat)
      if (want.nonEmpty) nonEmpty += 1
      assert(got == want,
        s"trial $trial pattern $pat:\n missing=${(want.diff(got)).take(5)}\n extra=${(got.diff(want)).take(5)}")
      // vacuity guard: the ungated pattern must disagree somewhere
      val patNo = CepCondPattern(mkSteps(None), within, skip, strict)
      val condsNo = IndexedSeq[(E, IndexedSeq[Seq[E]]) => Boolean](
        (e, _) => e._2 < t1, (e, _) => e._2 >= t1)
      if (want != seqMatches(condsNo, patNo)) differs += 1
    }
    assert(nonEmpty >= 8, s"only $nonEmpty/20 until trials produced matches")
    assert(differs >= 5, s"the stop condition changed output on only $differs/20 trials")
  }

  test("iterative condition matcher == independent brute force (next-higher-value shape)") {
    // the declared event_cep_iterative semantics, reimplemented from
    // scratch: every anchor row A satisfying p0; B = FIRST later row
    // satisfying "p0-ish AND value > A.value"; WITHIN filters the
    // completed pair. An independent pin for matchSequenceIter's
    // context threading (the matcher never sees this code path).
    val rnd = new scala.util.Random(97)
    val withinUs = 300L * 60L * 1000000L
    val pat = CepPattern(
      Seq(CepStep("a", 1, Some(1)), CepStep("b", 1, Some(1))),
      Some(300), SkipToNextRow, strict = false)
    val conds: IndexedSeq[((Long, Int, Long, Long), IndexedSeq[Seq[(Long, Int, Long, Long)]]) => Boolean] =
      IndexedSeq(
        (e, _) => e._2 % 3 == 0,
        (e, ctx) => e._2 % 3 == 0 && ctx(0).nonEmpty && e._2 > ctx(0).head._2)
    var nonEmpty = 0
    for (trial <- 0 until 20) {
      var ord = 0L
      val evs = (0 until 3).flatMap { k =>
        var tsUs = 0L
        (0 until 40).map { _ =>
          tsUs += (1 + rnd.nextInt(20)) * 60L * 1000000L
          ord += 1
          (k.toLong, rnd.nextInt(60), tsUs, ord)
        }
      }
      val want = evs.groupBy(_._1).flatMap { case (k, rows) =>
        val s = rows.sortBy(r => (r._3, r._4)).toIndexedSeq
        s.indices.flatMap { i =>
          if (s(i)._2 % 3 != 0) None
          else s.indices.drop(i + 1)
            .find(j => s(j)._2 % 3 == 0 && s(j)._2 > s(i)._2)
            .filter(j => s(j)._3 - s(i)._3 <= withinUs)
            .map(j => (k, s(i)._4, s(j)._4))
        }
      }.toSet
      val got = evs.groupBy(_._1).flatMap { case (k, rows) =>
        val s = rows.sortBy(r => (r._3, r._4)).toIndexedSeq
        Cep.matchSequenceIter(s, (e: (Long, Int, Long, Long)) => e._3, pat, conds)
          .map(m => (k, s(m.startIdx)._4, s(m.endIdx)._4))
      }.toSet
      if (want.nonEmpty) nonEmpty += 1
      assert(got == want,
        s"trial $trial:\n missing=${(want -- got).take(5)}\n extra=${(got -- want).take(5)}")
    }
    assert(nonEmpty >= 15, s"only $nonEmpty/20 iterative trials produced matches")
  }

  test("compiled MEASURES == sequential reference per-step cents sums on random strict patterns") {
    // compileMeasures' three value paths (suffix group-sum / scum for
    // the first step, lead-aligned run sums for middles, prefix pcum
    // for the last) against matchSequenceMeasures' consumption
    // snapshots — both skip strategies, reluctant tails included.
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.timestamp_micros
    val rnd = new scala.util.Random(211)
    for (trial <- 0 until 6) {
      val pat = randomPattern(rnd)
      val evs = randomEvents(rnd, 3)
      val withVal = evs.map { case (k, sym, ts, ord) =>
        (k, sym, ts, ord, ((ord * 37) % 9999).toDouble / 100.0) }
      val df = withVal.toDF("k", "sym", "ts_us", "ord", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val got = Cep.compileMeasures(df, "k", "ts", "ord", "sym", "value", pat)
        .select(col("k"), col("start_id"), col("end_id"),
          col("step_counts"), col("step_sums"))
        .as[(Long, Long, Long, String, String)].collect().toSet
      val want = withVal.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._4)).toIndexedSeq
        Cep.matchSequenceMeasures[(Long, String, Long, Long, Double)](
          sorted, _._3, _._2, pat).map { case (m, stepRows) =>
          (k, sorted(m.startIdx)._4, sorted(m.endIdx)._4,
            m.stepCounts.mkString(","),
            stepRows.map(_.map(r => math.round(r._5 * 100)).sum).mkString(","))
        }
      }.toSet
      assert(got == want,
        s"trial $trial pattern $pat:\n missing=${(want -- got).take(3)}\n extra=${(got -- want).take(3)}")
    }
  }

  test("consumption snapshots are consistent across ALL matcher modes (strict/relaxed/any)") {
    // matchCoreRows' snapshot must agree with the match it annotates on
    // every code path — the measures key only exercises strict C+ P, so
    // this pins the relaxed, optional-alternative, negated, and any-run
    // snapshot paths on random patterns: per-step row counts equal
    // stepCounts, every consumed row carries its step's symbol, rows
    // are in (ts, ord) consumption order, the first/last consumed rows
    // are the match boundaries, and under STRICT contiguity the
    // concatenation is exactly the contiguous block startIdx..endIdx.
    val rnd = new scala.util.Random(173)
    for (trial <- 0 until 40) {
      val strictMode = trial % 3 == 0
      val pat0 =
        if (strictMode) randomPattern(rnd)
        else if (trial % 3 == 1) randomRelaxedPattern(rnd)
        else randomRelaxedPattern(rnd) match { // any-run flavor
          case p if p.steps.exists(_.negated) => p.copy(anyMatch = true)
          case p => p.copy(anyMatch = true)
        }
      val evs = randomEvents(rnd, 3)
      evs.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._4))
          .map(r => CepEvent(r._2, r._3, r._4)).toIndexedSeq
        val plain = Cep.matchSequence(sorted, pat0)
        val withRows = Cep.matchSequenceMeasures[CepEvent](
          sorted, _.tsUs, _.sym, pat0)
        assert(withRows.map(_._1) == plain,
          s"trial $trial: rows variant changed the match list")
        withRows.foreach { case (m, stepRows) =>
          m.stepCounts.indices.foreach { si =>
            assert(stepRows(si).size == m.stepCounts(si),
              s"trial $trial: step $si rows ${stepRows(si).size} != count ${m.stepCounts(si)}")
            assert(stepRows(si).forall(_.sym == pat0.steps(si).symbol),
              s"trial $trial: step $si snapshot has foreign symbols")
          }
          val flat = stepRows.flatten
          assert(flat == flat.sortBy(e => (e.tsUs, e.ord)),
            s"trial $trial: consumption order broken")
          assert(flat.head == sorted(m.startIdx) && flat.last == sorted(m.endIdx),
            s"trial $trial: snapshot boundaries disagree with the match")
          if (pat0.strict)
            assert(flat == sorted.slice(m.startIdx, m.endIdx + 1),
              s"trial $trial: strict consumption not the contiguous block")
        }
      }
    }
  }

  test("MEASURES projection == independent run fold (C+ P WITHIN, per-step row aggregates)") {
    // event_cep_measures' semantics reimplemented from scratch: scan in
    // (ts, ord) order keeping the current contiguous click run; at a
    // purchase, the qualifying suffix is the run rows within the bound,
    // and the measures are computed DIRECTLY from that filter — never
    // via the matcher's consumption context, which is what this pins
    // (matchSequenceMeasures must consume exactly those rows).
    val rnd = new scala.util.Random(131)
    val withinUs = 10L * 60L * 1000000L
    val pat = CepPattern(
      Seq(CepStep("click", 1, None), CepStep("purchase", 1, Some(1))),
      Some(10), SkipPastLastRow, strict = true)
    val syms = Vector("click", "click", "click", "purchase", "view")
    type E = (String, Long, Long, Double) // sym, tsUs, ord, value
    def meas(k: Long, clicks: Seq[E], p: E) = {
      val cents = clicks.map(c => math.round(c._4 * 100))
      val sc = cents.sum
      (k, p._3, clicks.size, clicks.head._2, clicks.last._2,
        sc, sc.toDouble / (100.0 * clicks.size), cents.max, p._4)
    }
    var nonEmpty = 0
    for (trial <- 0 until 30) {
      var ord = 0L
      val byKey = (0 until 3).map { k =>
        var tsUs = 0L
        k.toLong -> (0 until 50).map { _ =>
          tsUs += (1 + rnd.nextInt(8)) * 60L * 1000000L // some clicks age out of the bound
          ord += 1
          (syms(rnd.nextInt(syms.size)), tsUs, ord, rnd.nextInt(10000) / 100.0)
        }.toIndexedSeq
      }
      val want = byKey.flatMap { case (k, rows) =>
        var run = Vector.empty[E]
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Int, Long, Long, Long, Double, Long, Double)]
        rows.foreach { e =>
          e._1 match {
            case "click" => run :+= e
            case "purchase" =>
              val hits = run.filter(c => c._2 >= e._2 - withinUs)
              if (hits.nonEmpty) out += meas(k, hits, e)
              run = Vector.empty
            case _ => run = Vector.empty
          }
        }
        out
      }.toSet
      val got = byKey.flatMap { case (k, rows) =>
        Cep.matchSequenceMeasures[E](rows, _._2, _._1, pat).map { case (_, stepRows) =>
          meas(k, stepRows(0), stepRows(1).head)
        }
      }.toSet
      if (want.nonEmpty) nonEmpty += 1
      assert(got == want,
        s"trial $trial:\n missing=${(want -- got).take(3)}\n extra=${(got -- want).take(3)}")
    }
    assert(nonEmpty >= 25, s"only $nonEmpty/30 measure trials produced matches")
  }

  test("declared event_cep_* patterns match the reference on the sf0.001 fixture") {
    val ev = Tables.events(spark, sf001)
    val raw = ev.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val pats = graft.queries.Analytic.CepPatterns
    for (pat <- Seq(pats.quant, pats.optional, pats.tonext, pats.relaxed,
        pats.negated, pats.skipFirst, pats.skipLast)) {
      val got = Cep.compile(ev, "user_id", "ts", "event_id", "event_type", pat)
        .select(col("user_id"), col("start_id"), col("end_id"), col("n_rows"), col("step_counts"))
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val want = referenceSet(raw.toSeq, pat)
      assert(got == want, s"pattern $pat diverged on fixture")
    }
  }

}
