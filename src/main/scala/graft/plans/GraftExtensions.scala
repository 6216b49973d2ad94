package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT simhash64(text) ...")` works next to the Column API.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the SparkSessionExtensions path, SURVEY §4);
  *  - `GraftFunctions.register(spark)` on an existing session (temp
  *    functions via the FunctionRegistry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // inert unless spark.graft.rangejoin.bucketwidth > 0 (see the rule)
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    // the GRAFT_ADVISE surface: the hint rule must run in the analyzer's
    // HINT batch (RemoveAllHints would otherwise warn-drop the unknown
    // hint), the rewrite in the operator-optimization fixed point; both
    // inert unless a query hints GRAFT_ADVISE or the session sets
    // spark.graft.advisor.sql
    e.injectHintResolutionRule(_ => GraftAdviseHintRule)
    e.injectOptimizerRule(_ => AdvisedEquiJoinRewrite)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64Expr(es.head)),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimExpr(es(0), es(1))),
    ("jaccard_sorted",
      new ExpressionInfo(classOf[JaccardSortedExpr].getName, "jaccard_sorted"),
      (es: Seq[Expression]) => JaccardSortedExpr(es(0), es(1))),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_signature"),
      (es: Seq[Expression]) => MinHashSigExpr(es(0), intArg(es(1), "numHashes"))),
    ("shingle_stats",
      new ExpressionInfo(classOf[ShingleStatsExpr].getName, "shingle_stats"),
      (es: Seq[Expression]) => ShingleStatsExpr(es(0), intArg(es(1), "n"))),
    ("repetition_stats",
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "repetition_stats"),
      (es: Seq[Expression]) => RepetitionStatsExpr(es(0), intArg(es(1), "n"))),
    ("winnow_fingerprints",
      new ExpressionInfo(classOf[WinnowFingerprintsExpr].getName, "winnow_fingerprints"),
      (es: Seq[Expression]) =>
        WinnowFingerprintsExpr(es(0), intArg(es(1), "k"), intArg(es(2), "window"))),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalizeExpr(es.head)),
    // aggregates: the builder returns the bare AggregateFunction — the
    // analyzer wraps it in an AggregateExpression when it appears in an
    // aggregate context, same as the built-in SQL aggregates
    ("kmv_minima",
      new ExpressionInfo(classOf[KmvMinimaAgg].getName, "kmv_minima"),
      (es: Seq[Expression]) => KmvMinimaAgg(es(0), intArg(es(1), "k"))),
    ("misra_gries",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (es: Seq[Expression]) => MisraGriesAgg(es(0), intArg(es(1), "capacity"))))

  /** Register all engine functions as temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
