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
      val h = arr.getLong(j)
      var i = 0
      while (i < numPerms) {
        val v = as(i) * h + bs(i)
        if (v < sig(i)) sig(i) = v
        i += 1
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
      val h = arr.getLong(j)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
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

object Signatures {
  def minhash_sig(hashes: Column, numPerms: Int = 64): Column =
    Bridge.toCol(MinHashSig(Bridge.toExpr(hashes), numPerms))
  def simhash_sig(hashes: Column): Column =
    Bridge.toCol(SimHashSig(Bridge.toExpr(hashes)))
}
