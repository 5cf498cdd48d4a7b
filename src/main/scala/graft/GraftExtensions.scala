package graft


import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}
import graft.functions._

/** Parser front end for SQL `MATCH_RECOGNIZE`: statements containing
  * the keyword route through [[graft.api.MatchRecognize]] (parse →
  * resolve to the compiled CEP plans over the statement's FROM table);
  * everything else — including every expression/identifier parse the
  * resolved plans themselves trigger — delegates verbatim. This is a
  * FRONT END, not a plan rewrite: the logical plan returned is exactly
  * the one the DataFrame API route builds, so stock Catalyst sees
  * nothing new.
  */
class MatchRecognizeSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    if (graft.api.MatchRecognize.hasClause(sqlText)) {
      val spec = graft.api.MatchRecognize.parse(sqlText)
      val tbl = spec.fromTable.getOrElse(throw new IllegalArgumentException(
        "MATCH_RECOGNIZE via spark.sql needs `SELECT * FROM <table> " +
          "MATCH_RECOGNIZE (...)` — the clause body alone has no input table"))
      graft.api.MatchRecognize.run(session.table(tbl), sqlText)
        .queryExecution.logical
    } else delegate.parsePlan(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** The engine's Spark extension entry point (SURVEY §2.L "Catalyst
  * extension point"): cluster deploys configure
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * once, and EVERY session (including thriftserver/connect sessions the
  * library code never touches) resolves the native expressions in SQL —
  * unlike `GraftFunctions.register`, which is per-session and post-hoc.
  * Two extension surfaces only: function injection, and the
  * [[MatchRecognizeSqlParser]] FRONT END (text in, the DataFrame
  * route's own logical plan out). Plans still stay stock Catalyst on
  * purpose (SURVEY §4.3 — the optimizer already does every rewrite we
  * rely on, and a custom rule we don't need is a compatibility
  * liability we'd carry across Spark upgrades).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) =>
      new MatchRecognizeSqlParser(session, delegate))
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
