package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** The engine's Spark extension entry point (SURVEY §2.L "Catalyst
  * extension point"): cluster deploys configure
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * once, and EVERY session (including thriftserver/connect sessions the
  * library code never touches) resolves the native expressions in SQL —
  * unlike `GraftFunctions.register`, which is per-session and post-hoc.
  * Function injection is the only extension surface this engine needs:
  * plans stay stock Catalyst on purpose (SURVEY §4.3 — the optimizer
  * already does every rewrite we rely on, and a custom rule we don't
  * need is a compatibility liability we'd carry across Spark upgrades).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info(classOf[VecDot], "vec_dot"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashSig], "minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es(0), 64)))
    ext.injectFunction((FunctionIdentifier("simhash_sig"),
      info(classOf[SimHashSig], "simhash_sig"),
      (es: Seq[Expression]) => SimHashSig(es(0))))
    // md5_prefix(strings, nibbles): nibbles must be a foldable int literal
    ext.injectFunction((FunctionIdentifier("md5_prefix"),
      info(classOf[Md5PrefixHash], "md5_prefix"),
      (es: Seq[Expression]) => {
        if (es.length != 2 || !es(1).foldable)
          throw new IllegalArgumentException(
            "md5_prefix(strings, nibbles): nibbles must be an integer literal")
        es(1).eval() match {
          case n: Number => Md5PrefixHash(es(0), n.intValue())
          case other => throw new IllegalArgumentException(
            s"md5_prefix nibbles must be an integer literal, got $other")
        }
      }))
  }
}
