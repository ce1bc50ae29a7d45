package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.LongType
import graft.functions.{HammingDistance, JsonFlatten}

/** SparkSessionExtensions entry point: lets a user enable the graft
  * function surface with
  *   spark.sql.extensions=graft.GraftExtensions
  * (no code changes) — the injection path SURVEY §2.11 calls for. The
  * UDAF-backed functions (bitmaps, funnel) need a live session and are
  * registered by GraftFunctions.register(spark) instead; everything
  * injected here is a pure Expression and therefore serializable into
  * any session, including connect-style ones.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(e: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      new FunctionBuilder { def apply(args: Seq[Expression]): Expression = builder(args) }))

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "hamming64", args =>
      HammingDistance(Cast(args.head, LongType), Cast(args(1), LongType)))
    inject(e, "flatten_json", args => JsonFlatten(args.head, recursive = false))
    inject(e, "flatten_json_recursive", args => JsonFlatten(args.head, recursive = true))
    // a few reference-name aliases usable without GraftFunctions.register
    inject(e, "to_year", args => UnresolvedFunction("year", args, isDistinct = false))
    inject(e, "to_day_of_month", args => UnresolvedFunction("dayofmonth", args, isDistinct = false))
    inject(e, "to_start_of_month",
      args => UnresolvedFunction("date_trunc", Literal("month") +: args, isDistinct = false))
    inject(e, "uniq", args => UnresolvedFunction("approx_count_distinct", args, isDistinct = false))
  }
}
