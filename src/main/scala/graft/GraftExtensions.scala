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
    // the full expression-level surface from GraftFunctions: every
    // alias spelling plus every rewrite (hamming64, flatten_json,
    // keypath gets, yyyymm shorthands, ...)
    for ((name, target) <- graft.functions.GraftFunctions.aliases if name != target)
      inject(e, name, args => UnresolvedFunction(target, args, isDistinct = false))
    for ((name, builder) <- graft.functions.GraftFunctions.rewrites)
      inject(e, name, builder)
    // rounds 3-4 expression-tier expansions (MoreAliases / MoreAliases2);
    // their UDF tiers (Jackson JSON edits, array stats, hashes) need a
    // live session — GraftFunctions.register(spark) adds those
    for ((name, target) <- graft.functions.MoreAliases.aliases if name != target)
      inject(e, name, args => UnresolvedFunction(target, args, isDistinct = false))
    for ((name, builder) <- graft.functions.MoreAliases.rewrites)
      inject(e, name, builder)
    for ((name, builder) <- graft.functions.MoreAliases2.rewrites
         if !graft.functions.MoreAliases2.udfBacked(name))
      inject(e, name, builder)
    // round-5 expression tier: numeric obfuscator
    for ((name, builder) <- graft.functions.Obfuscator.rewrites)
      inject(e, name, builder)
    // reference datetime coercion semantics (int<->date/timestamp
    // casts, date-date INT days, ts-ts BIGINT micros)
    e.injectResolutionRule(session => new graft.functions.DatetimeCoercionRule(session))
    for ((name, builder) <- graft.functions.DatetimeSemantics.rewrites)
      inject(e, name, builder)
    // aggregating-index rewrite (no-op until AggIndex.register is called)
    e.injectOptimizerRule(session => new graft.plans.AggIndexRule(session))
    // virtual-column rewrite: get_json_object over declared paths ->
    // the materialized __virt_* column (no-op without such columns)
    e.injectOptimizerRule(session => new graft.plans.VirtualColumnRule(session))
    // SQL-declared python scalar UDFs -> Arrow batch engine (no-op
    // without registered python functions)
    e.injectOptimizerRule(session => new graft.plans.PyUdfBatchRule(session))
  }
}
