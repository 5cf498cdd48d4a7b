package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Deterministic per-perm multipliers/addends (splitmix64 stream) for the
  * universal-hash family h_i(x) = A_i * x + B_i (mod 2^64). Shared by
  * eval and codegen so results are identical on both paths.
  */
object SigConstants {
  private def splitmix(seed0: Long): Iterator[Long] = new Iterator[Long] {
    private var s = seed0
    def hasNext = true
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }
  def multipliers(n: Int): Array[Long] =
    splitmix(0x5851F42D4C957F2DL).map(_ | 1L).take(n).toArray // odd
  def addends(n: Int): Array[Long] =
    splitmix(0x2545F4914F6CDD1DL).take(n).toArray
}

/** 64-perm MinHash signature over an array<bigint> of element hashes:
  * sig[i] = min over elements of (A_i * h + B_i), wrapping 2^64
  * arithmetic (manual codegen — Java semantics, no ANSI overflow check).
  * One fused pass; replaces a 64-lambda nested-aggregate expression whose
  * janino compile + per-element lambda dispatch dominated dedup_minhash.
  */
case class MinHashSig(child: Expression, numPerms: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val as = SigConstants.multipliers(numPerms)
  @transient private lazy val bs = SigConstants.addends(numPerms)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var i = 0
        while (i < numPerms) {
          val v = as(i) * h + bs(i)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.addReferenceObj("mhMul", as, "long[]")
      val b = ctx.addReferenceObj("mhAdd", bs, "long[]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numPerms];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if ($c.isNullAt($j)) continue;
         |  final long $h = $c.getLong($j);
         |  for (int $i = 0; $i < $numPerms; $i++) {
         |    final long $v = $a[$i] * $h + $b[$i];
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash from an array<bigint> of element hashes: bit k of the
  * result is set iff the majority of elements have bit k set. One fused
  * pass with a 64-counter register file.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) >= 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[64];
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if ($c.isNullAt($j)) continue;
         |  final long $h = $c.getLong($j);
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ((($h >>> $k) & 1L) == 1L) $counts[$k]++; else $counts[$k]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($counts[$k] >= 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

/** Shared eval/codegen runtime for the md5-based signatures (the
  * generated Java calls these statics, so interpreted and codegen paths
  * are one implementation).
  */
object SigRuntime {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nibbles` hex chars of md5(utf8 bytes) as an unsigned long —
    * exactly DuckDB's `CAST(concat('0x', substr(md5(s), 1, nibbles)) AS
    * BIGINT)` and Spark's `conv(substring(md5(s), 1, nibbles), 16, 10)`.
    */
  def md5Prefix(s: org.apache.spark.unsafe.types.UTF8String, nibbles: Int): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = d(i / 2) & 0xff
      val nib = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** array<string> -> array<long>: md5 prefix hash of each element (see
  * SigRuntime.md5Prefix). The engine-independent token hash for the
  * oracle-replayable dedup keys — one fused pass instead of an
  * interpreted `transform(toks, t -> conv(substring(md5(t)...)))` lambda.
  */
case class Md5PrefixHash(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 16)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // Null elements (array<string> with containsNull=true) hash nothing:
    // they are skipped, so the output array may be shorter than the input.
    val out = new Array[Long](arr.numElements())
    var n = 0
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        out(n) = SigRuntime.md5Prefix(arr.getUTF8String(j), nibbles)
        n += 1
      }
      j += 1
    }
    new GenericArrayData(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |long[] $out = new long[$c.numElements()];
         |int $n = 0;
         |for (int $j = 0; $j < $out.length; $j++) {
         |  if ($c.isNullAt($j)) continue;
         |  $out[$n++] = graft.functions.SigRuntime.md5Prefix($c.getUTF8String($j), $nibbles);
         |}
         |if ($n != $out.length) $out = java.util.Arrays.copyOf($out, $n);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixHash =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix"
}

/** MinHash over an EXPLICIT universal-hash family mod a prime:
  * sig[i] = min over elements of (a_i * (h mod p) + b_i) mod p. With
  * h mod p < p <= 2^31-1 the product stays under 2^62 — exact in 64-bit
  * on every engine, which is what lets the DuckDB oracle replay the
  * signature bit-for-bit (unlike MinHashSig's wrapping 2^64 family).
  * Fused codegen pass; replaces 64 interpreted `array_min(transform(...))`
  * lambdas that dominated dedup_minhash_pairs.
  */
case class MinHashSigMod(child: Expression, as: IndexedSeq[Long],
                         bs: IndexedSeq[Long], p: Long) extends UnaryExpression {
  require(as.length == bs.length)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_mod expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = aArr.length
    val sig = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j) % p
        var i = 0
        while (i < n) {
          val v = (aArr(i) * h + bArr(i)) % p
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.addReferenceObj("mhmA", aArr, "long[]")
      val b = ctx.addReferenceObj("mhmB", bArr, "long[]")
      val n = aArr.length
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$n];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if ($c.isNullAt($j)) continue;
         |  final long $h = $c.getLong($j) % ${p}L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $v = ($a[$i] * $h + $b[$i]) % ${p}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigMod =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig_mod"
}

/** SimHash over the low `bits` bits with a STRICT majority (count > 0
  * sets the bit — matching the oracle's `CASE WHEN s > 0` exactly, where
  * SimHashSig uses >= 0). Fused pass; replaces the interpreted
  * 60-counter aggregate fold that dominated dedup_simhash_pairs.
  */
case class SimHashSigStrict(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig_strict expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](bits)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var k = 0
        while (k < bits) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var k = 0
    while (k < bits) {
      if (counts(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[$bits];
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if ($c.isNullAt($j)) continue;
         |  final long $h = $c.getLong($j);
         |  for (int $k = 0; $k < $bits; $k++) {
         |    if ((($h >>> $k) & 1L) == 1L) $counts[$k]++; else $counts[$k]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < $bits; $k++) {
         |  if ($counts[$k] > 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSigStrict =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig_strict"
}

/** `tables * bits` random-hyperplane LSH bucket ids from a raw
  * float/double vector, one fused pass: q_i = round(x_i * 1000) as long
  * (engine-exact quantization), bit j of table t's bucket =
  * sign(q . plane(t*bits+j)) over pure 64-bit integer dots. Output is
  * array<long> of length `tables`. Replaces tables*bits interpreted
  * `aggregate(zip_with(...))` lambdas (janino compile + per-element
  * lambda dispatch dominated sim_lsh_bucketed's 1.4 s at sf0.1).
  */
case class LshBucketSig(child: Expression, planes: IndexedSeq[IndexedSeq[Long]],
                        tables: Int, bits: Int) extends UnaryExpression {
  require(planes.length == tables * bits && bits <= 63)
  private val dim = planes.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket_sig expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val flat: Array[Long] = planes.flatten.toArray
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val q = new Array[Long](n)
    var j = 0
    while (j < n) {
      // A null component contributes 0 to every plane dot (same as a
      // zero component) — no NPE on containsNull=true inputs.
      val x = if (arr.isNullAt(j)) 0.0
        else if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      q(j) = math.floor(x * 1000.0 + 0.5).toLong
      j += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var dot = 0L
        var i = 0
        while (i < n) { dot += flat(base + i) * q(i); i += 1 }
        if (dot > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val pl = ctx.addReferenceObj("lshPlanes", flat, "long[]")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val base = ctx.freshName("base")
      val get = if (isFloat) s"(double) $c.getFloat($j)" else s"$c.getDouble($j)"
      s"""
         |final int $n = Math.min($c.numElements(), $dim);
         |long[] $q = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  $q[$j] = $c.isNullAt($j) ? 0L : (long) Math.floor($get * 1000.0 + 0.5);
         |}
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    final int $base = ($t * $bits + $b) * $dim;
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $n; $i++) { $dot += $pl[$base + $i] * $q[$i]; }
         |    if ($dot > 0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucketSig =
    copy(child = newChild)

  override def prettyName: String = "lsh_bucket_sig"
}

/** Product-quantization distances against a fixed integer codebook:
  * the vector quantizes to q[j] = floor(x*1000+0.5) (the LshBucketSig
  * idiom — exact 64-bit arithmetic from here on), splits into `m`
  * subvectors of `subDim` components, and for each (subspace, centroid)
  * the squared L2 distance to the codebook entry is summed in longs.
  *
  * `codesOnly = true` (the corpus-encode path): output is the `m`
  * argmin centroid indices — the PQ code, ties to the LOWEST index
  * (strict `<` scan order), 8 longs replacing the 64-float vector.
  * `codesOnly = false` (the probe path): output is the full `m*k`
  * asymmetric-distance table, laid out [sub*k + cent], against which
  * a corpus code scores as sum over subs of adc[sub*k + code[sub]].
  * One fused pass, identical eval/codegen, exact on both engines.
  */
case class PqDistSig(child: Expression, codebook: IndexedSeq[Long],
                     m: Int, k: Int, subDim: Int,
                     codesOnly: Boolean) extends UnaryExpression {
  require(codebook.length == m * k * subDim, "codebook size mismatch")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_dist_sig expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val cb: Array[Long] = codebook.toArray
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = m * subDim
    val q = new Array[Long](dim)
    val n = math.min(arr.numElements(), dim)
    var j = 0
    while (j < n) {
      val x = if (arr.isNullAt(j)) 0.0
        else if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      q(j) = math.floor(x * 1000.0 + 0.5).toLong
      j += 1
    }
    val out = new Array[Long](if (codesOnly) m else m * k)
    var s = 0
    while (s < m) {
      var best = Long.MaxValue
      var bestC = 0L
      var c = 0
      while (c < k) {
        var dist = 0L
        var d = 0
        while (d < subDim) {
          val diff = q(s * subDim + d) - cb((s * k + c) * subDim + d)
          dist += diff * diff
          d += 1
        }
        if (codesOnly) {
          if (dist < best) { best = dist; bestC = c.toLong }
        } else out(s * k + c) = dist
        c += 1
      }
      if (codesOnly) out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cIn => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "long[]")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val dim = m * subDim
      val get = if (isFloat) s"(double) $cIn.getFloat($j)" else s"$cIn.getDouble($j)"
      val inner =
        if (codesOnly)
          s"if ($dist < $best) { $best = $dist; $bestC = (long) $c; }"
        else s"$out[$s * $k + $c] = $dist;"
      val after = if (codesOnly) s"$out[$s] = $bestC;" else ""
      s"""
         |final int $n = Math.min($cIn.numElements(), $dim);
         |long[] $q = new long[$dim];
         |for (int $j = 0; $j < $n; $j++) {
         |  $q[$j] = $cIn.isNullAt($j) ? 0L : (long) Math.floor($get * 1000.0 + 0.5);
         |}
         |long[] $out = new long[${if (codesOnly) m else m * k}];
         |for (int $s = 0; $s < $m; $s++) {
         |  long $best = Long.MAX_VALUE; long $bestC = 0L;
         |  for (int $c = 0; $c < $k; $c++) {
         |    long $dist = 0L;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      final long $diff = $q[$s * $subDim + $d] - $cbRef[($s * $k + $c) * $subDim + $d];
         |      $dist += $diff * $diff;
         |    }
         |    $inner
         |  }
         |  $after
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqDistSig =
    copy(child = newChild)

  override def prettyName: String =
    if (codesOnly) "pq_code_sig" else "pq_adc_sig"
}

object Signatures {
  def minhash_sig(hashes: Column, numPerms: Int = 64): Column =
    Bridge.toCol(MinHashSig(Bridge.toExpr(hashes), numPerms))
  def simhash_sig(hashes: Column): Column =
    Bridge.toCol(SimHashSig(Bridge.toExpr(hashes)))
  def md5_prefix(strings: Column, nibbles: Int): Column =
    Bridge.toCol(Md5PrefixHash(Bridge.toExpr(strings), nibbles))
  def minhash_sig_mod(hashes: Column, as: IndexedSeq[Long], bs: IndexedSeq[Long],
                      p: Long): Column =
    Bridge.toCol(MinHashSigMod(Bridge.toExpr(hashes), as, bs, p))
  def simhash_sig_strict(hashes: Column, bits: Int): Column =
    Bridge.toCol(SimHashSigStrict(Bridge.toExpr(hashes), bits))
  def lsh_bucket_sig(vec: Column, planes: IndexedSeq[IndexedSeq[Long]],
                     tables: Int, bits: Int): Column =
    Bridge.toCol(LshBucketSig(Bridge.toExpr(vec), planes, tables, bits))
  def pq_code_sig(vec: Column, codebook: IndexedSeq[Long],
                  m: Int, k: Int, subDim: Int): Column =
    Bridge.toCol(PqDistSig(Bridge.toExpr(vec), codebook, m, k, subDim, codesOnly = true))
  def pq_adc_sig(vec: Column, codebook: IndexedSeq[Long],
                 m: Int, k: Int, subDim: Int): Column =
    Bridge.toCol(PqDistSig(Bridge.toExpr(vec), codebook, m, k, subDim, codesOnly = false))
}
