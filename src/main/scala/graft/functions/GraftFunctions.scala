package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Explode, Expression, Literal}
import org.apache.spark.sql.functions.udf

/** The databend-name function surface (SURVEY.md §2.9; alias table
  * reference src/query/functions/tests/it/scalars/testdata/
  * function_list.txt:1-121). Spark already implements the semantics;
  * this registry maps the reference's names onto Spark expressions so
  * `spark.sql` accepts databend spellings. Aliases resolve to
  * UnresolvedFunction and are folded by the analyzer — zero runtime
  * cost, fully codegen'd.
  */
object GraftFunctions {

  /** aggregate-function names, for SHOW FUNCTIONS' is_aggregate flag
    * (reference aggregates/aggregator.rs:73-187 registration list)
    */
  val aggregateNames: Set[String] = Set(
    "sum", "sum0", "sum_zero", "count", "avg", "min", "max", "any",
    "any_value", "arg_min", "arg_max", "min_by", "max_by", "bool_and",
    "bool_or", "covar_samp", "covar_pop", "var_samp", "var_pop", "stddev",
    "stddev_samp", "stddev_pop", "std", "kurtosis", "skewness", "median",
    "median_tdigest", "mode", "quantile", "quantile_cont", "quantile_disc",
    "quantile_tdigest", "quantile_tdigest_weighted", "approx_count_distinct",
    "uniq", "array_agg", "list", "listagg", "string_agg", "group_concat",
    "collect_list", "collect_set", "json_agg", "json_array_agg",
    "json_object_agg", "histogram", "histogram_numeric", "window_funnel",
    "retention", "bitmap_agg", "bitmap_union", "bitmap_intersect",
    "group_bitmap", "bitmap_construct_agg", "intersect_count",
    "markov_train", "st_collect", "st_union_agg", "st_intersection_agg",
    "st_envelope_agg", "count_if", "sum_if", "avg_if", "min_if", "max_if",
    "first", "first_value", "last", "last_value", "percentile",
    "percentile_approx", "count_distinct", "group_array_moving_avg",
    "group_array_moving_sum", "grouping", "grouping_id")

  /** databend name -> spark builtin name (1:1 argument passthrough) */
  val aliases: Seq[(String, String)] = Seq(
    // datetime family (function_list.txt:11-32 style to_* names)
    "to_year" -> "year",
    "to_month" -> "month",
    "to_day_of_month" -> "dayofmonth",
    "to_day_of_year" -> "dayofyear",
    "to_hour" -> "hour",
    "to_minute" -> "minute",
    "to_second" -> "second",
    "to_quarter" -> "quarter",
    "to_week_of_year" -> "weekofyear",
    "date_sub_alias" -> "date_sub",
    // aggregate-ish / misc
    "uniq" -> "approx_count_distinct",
    "arg_min" -> "min_by",
    "arg_max" -> "max_by",
    "group_array" -> "collect_list",
    "group_concat" -> "listagg",
    // aggregate name surface (reference aggregates/aggregator.rs:71-192)
    "list" -> "collect_list",
    "string_agg" -> "listagg",
    "variance_samp" -> "var_samp",
    "variance_pop" -> "var_pop",
    // reference maps std to the POPULATION stddev (aggregator.rs:102),
    // unlike Spark's builtin std = stddev_samp — databend spelling wins
    "std" -> "stddev_pop",
    "bitmap_or_agg" -> "bitmap_union_agg",
    "bitmap_union" -> "bitmap_union_agg",
    "bitmap_and_agg" -> "bitmap_intersect_agg",
    "bitmap_intersect" -> "bitmap_intersect_agg",
    "bitmap_construct_agg" -> "bitmap_agg",
    "group_bitmap" -> "bitmap_agg",
    // string family
    "lcase" -> "lower",
    "ucase" -> "upper",
    "char_length" -> "char_length",
    "character_length" -> "character_length",
    "mid" -> "substring",
    "locate" -> "locate",
    "regexp_like" -> "regexp_like",
    "rlike" -> "rlike",
    // math family
    "ceiling" -> "ceil",
    "power" -> "power",
    "rand_alias" -> "rand",
    "intdiv" -> "div",
    "plus" -> "try_add",
    "minus" -> "try_subtract",
    "multiply" -> "try_multiply",
    "divide" -> "try_divide",
    // json / variant — parse_json is NOT aliased: Spark 4's native
    // parse_json already returns VARIANT, matching the reference's
    // parse_json -> Variant (scalars/variant.rs)
    "json_to_string" -> "to_json",
    // arithmetic spellings (function_list.txt:2,56-59,104)
    "add" -> "try_add",
    "subtract" -> "try_subtract",
    "neg" -> "negative",
    "negate" -> "negative",
    "modulo" -> "mod",
    "pow" -> "pow",
    // array spellings (function_list.txt:3-7)
    "array_length" -> "size",
    "array_size" -> "size",
    "array_slice" -> "slice",
    "array_intersection" -> "array_intersect",
    "array_overlap" -> "arrays_overlap",
    "unnest" -> "explode",
    // binary/encoding (function_list.txt:8-9,33-34,107-108)
    "base64_encode" -> "base64",
    "base64_decode_binary" -> "unbase64",
    "hex_encode" -> "hex",
    "hex_decode_binary" -> "unhex",
    "chr" -> "char",
    // datetime spellings (function_list.txt:21-31,89-91,119-121)
    "today" -> "current_date",
    "to_datetime" -> "to_timestamp",
    "str_to_timestamp" -> "to_timestamp",
    "try_to_datetime" -> "try_to_timestamp",
    "to_week" -> "weekofyear",
    "week" -> "weekofyear",
    "to_unix_timestamp" -> "unix_timestamp",
    "from_unixtime_alias" -> "from_unixtime",
    // string spellings (function_list.txt:53,92-96)
    "length_utf8" -> "length",
    "substr_utf8" -> "substr",
    "substring_utf8" -> "substr",
    "sha" -> "sha1",
    "regexp" -> "rlike",
    // json (Spark ships these under the same semantics)
    "json_object_keys" -> "json_object_keys",
    "json_array_length" -> "json_array_length",
    "json_array_distinct" -> "array_distinct",
    // date/timestamp constructors now live in TimestampTz (reference
    // normalize_date_parts overflow-rolling semantics)
    "date" -> "to_date",
    // encoding spellings (function_list.txt:9-10,33-34,107-113)
    "to_hex" -> "hex",
    "from_hex" -> "unhex",
    "try_from_hex" -> "unhex",
    "try_hex_decode_binary" -> "unhex",
    "to_base64" -> "base64",
    "from_base64" -> "unbase64",
    "try_base64_decode_binary" -> "unbase64",
    // misc (function_list.txt:118)
    "gen_random_uuid" -> "uuid")

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toSeq, isDistinct = false)

  private def objConstruct(keepNull: Boolean, tryMode: Boolean)
      : Seq[Expression] => Expression = args => {
    import org.apache.spark.sql.catalyst.expressions._
    if (args.isEmpty) fn("parse_json", Literal("{}"))
    else if (args.length % 2 != 0) {
      if (tryMode) fn("parse_json", Literal(null, org.apache.spark.sql.types.StringType))
      else throw new IllegalArgumentException(
        "1006: object_construct requires an even number of arguments")
    } else {
      val m = UnresolvedFunction("map", varObjArgs(args), isDistinct = false)
      val filtered =
        if (keepNull) m
        else {
          val k = UnresolvedNamedLambdaVariable(Seq("__ok"))
          val v = UnresolvedNamedLambdaVariable(Seq("__ov"))
          UnresolvedFunction("map_filter", Seq(m,
            LambdaFunction(And(IsNotNull(v),
              Not(EqualTo(UnresolvedFunction("to_json", Seq(v), isDistinct = false),
                Literal("null")))), Seq(k, v))), isDistinct = false)
        }
      // VARIANT result (parse_json of the rendered text): constructors
      // nest (object_construct('a', object_construct(...))) and feed
      // jsonb operators, matching the reference's VARIANT return type
      fn("parse_json", fn("to_json", filtered))
    }
  }

  /** object-constructor args (k1, v1, k2, v2, ...): keys cast to
    * string, values to variant, so mixed-type objects build
    */
  private def varObjArgs(args: Seq[Expression]): Seq[Expression] =
    args.grouped(2).flatMap {
      case Seq(k, v) => Seq(
        org.apache.spark.sql.catalyst.expressions.Cast(
          k, org.apache.spark.sql.types.StringType),
        fn("to_variant", v))
      case other => other
    }.toSeq

  /** quantile/quantile_disc: scalar keeps the double-returning pick
    * UDF; the multi-level form picks sorted elements type-preserving
    * via element_at(sort_array(collect_list(x)), floor((n-1)*q)+1).
    */
  private def quantileDisc(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    if (args.length <= 2)
      fn("quantile_disc_pick", fn("collect_list", castD(args.head)), castD(args(1)))
    else {
      def sortedArr = fn("sort_array", fn("collect_list", args.head))
      // empty collect_list (all-NULL group / zero rows) would feed
      // element_at index 0 and throw — the reference returns NULL
      CreateArray(args.tail.map { q =>
        val n = Cast(fn("size", sortedArr), DoubleType)
        val idx = Cast(Floor(Multiply(Subtract(n, Literal(1.0)), castD(q))), IntegerType)
        fn("if", GreaterThan(fn("size", sortedArr), Literal(0)),
          ElementAt(sortedArr, Add(idx, Literal(1))),
          Literal(null, org.apache.spark.sql.types.NullType))
      })
    }
  }
  private def castD(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.DoubleType)
  private def castL(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.LongType)

  private def unresolved(name: String, args: Seq[Expression], distinct: Boolean = false,
                         filter: Option[Expression] = None,
                         ignoreNulls: Boolean = false): Expression =
    new UnresolvedFunction(Seq(name), args.toSeq, distinct, filter, ignoreNulls, Nil, false)

  /** the reference's aggregate suffix combinators
    * (aggregate_combinator.rs): every aggregate spawns `<agg>_if(args...,
    * cond)` (rows where cond holds) and `<agg>_distinct(args...)`.
    * Spark spells these FILTER (WHERE ...) and DISTINCT; the rewrites
    * below make the databend spellings resolve to exactly those forms
    * (codegen'd, no UDFs). Bases that are themselves databend names
    * (uniq, arg_min...) resolve recursively through this registry.
    */
  private val combinatorBases: Seq[(String, String, Boolean)] = Seq(
    // (databend base, spark function, ignoreNulls) — spark names
    // directly: a recursive databend-name base would drop the outer
    // filter/distinct flags when the analyzer re-resolves it
    ("sum", "sum", false), ("count", "count", false), ("avg", "avg", false),
    ("min", "min", false), ("max", "max", false),
    ("any", "any_value", true),
    ("uniq", "approx_count_distinct", false),
    ("arg_min", "min_by", false), ("arg_max", "max_by", false),
    ("stddev_pop", "stddev_pop", false), ("stddev_samp", "stddev_samp", false),
    ("var_pop", "var_pop", false), ("var_samp", "var_samp", false),
    ("median", "median", false), ("array_agg", "collect_list", false))

  private val combinators: Map[String, Seq[Expression] => Expression] =
    combinatorBases.flatMap { case (b, sparkName, ign) =>
      Seq(
        // single-value bases spell the condition as CASE WHEN instead
        // of FILTER: Spark rejects a NON-DETERMINISTIC filter
        // (count_if(length(uuid()) = 36) is legal in the reference),
        // and agg(CASE WHEN c THEN x END) is value-identical
        s"${b}_if" -> ((a: Seq[Expression]) => {
          def caseWhen(v: Expression) =
            org.apache.spark.sql.catalyst.expressions.CaseWhen(
              Seq(org.apache.spark.sql.catalyst.expressions.Cast(a.last,
                org.apache.spark.sql.types.BooleanType) -> v), None)
          if (a.length == 2)
            unresolved(sparkName, Seq(caseWhen(a.head)), ignoreNulls = ign)
          else if (a.length == 1 && b == "count")
            unresolved("count", Seq(caseWhen(Literal(1))))
          else unresolved(sparkName, a.init, filter = Some(a.last), ignoreNulls = ign)
        }),
        s"${b}_distinct" -> ((a: Seq[Expression]) =>
          unresolved(sparkName, a, distinct = true, ignoreNulls = ign)))
    }.toMap

  /** names needing argument rewriting */
  val rewrites: Map[String, Seq[Expression] => Expression] = combinators ++ Map(
    // databend `any` takes the first NON-NULL value (its min_max_any
    // slt: any over (null,1,...) = 1); Spark's any_value keeps nulls
    // unless ignoreNulls is set
    "any" -> (args => unresolved("any_value", args, ignoreNulls = true)),
    // 1-arg ifnull/nvl degenerate to the argument (reference accepts
    // them; 02_0058/02_0070 suites). 2-arg form = coalesce — spelled
    // so because a same-name unresolved target would re-enter this
    // rewrite and never resolve.
    "ifnull" -> (args =>
      if (args.length == 1) args.head else unresolved("coalesce", args)),
    "nvl" -> (args =>
      if (args.length == 1) args.head else unresolved("coalesce", args)),
    // variadic if(c1,v1, c2,v2, ..., else) — a CASE WHEN chain in the
    // reference (expr.rs maps multi-branch IF to if with odd arity;
    // even arity is error 1065)
    "if" -> (args =>
      if (args.length == 3)
        org.apache.spark.sql.catalyst.expressions.If(
          org.apache.spark.sql.catalyst.expressions.Cast(args.head,
            org.apache.spark.sql.types.BooleanType), args(1), args(2))
      else if (args.length >= 5 && args.length % 2 == 1)
        org.apache.spark.sql.catalyst.expressions.CaseWhen(
          args.dropRight(1).grouped(2).map(p =>
            (org.apache.spark.sql.catalyst.expressions.Cast(p.head,
              org.apache.spark.sql.types.BooleanType), p(1))).toSeq,
          Some(args.last))
      else throw new IllegalArgumentException(
        s"1065: if expects an odd argument count >= 3, got ${args.length}")),
    // count_if is both Spark's 1-arg builtin (count rows where pred)
    // and databend's 2-arg combinator (count x where cond). CASE WHEN,
    // not FILTER: Spark rejects a non-deterministic FILTER
    // (count_if(length(uuid()) = 36) is legal in the reference)
    "count_if" -> (args => {
      val cond = org.apache.spark.sql.catalyst.expressions.Cast(
        args.last, org.apache.spark.sql.types.BooleanType)
      val v = if (args.length <= 1) Literal(1) else args.head
      unresolved("count", Seq(
        org.apache.spark.sql.catalyst.expressions.CaseWhen(Seq(cond -> v), None)))
    }),
    // ---- aggregate surface (reference aggregates/aggregator.rs) ------
    // count_distinct(x, ...) = count(DISTINCT x, ...) — an identity
    // alias cannot express the DISTINCT flag, so it is a rewrite
    // (was silently unregistered before round 6)
    "count_distinct" -> (args =>
      UnresolvedFunction("count", args, isDistinct = true)),
    // sum0 / sum_zero: 0 instead of NULL on empty input
    "sum0" -> (args => fn("coalesce", fn("sum", args.head), Literal(0))),
    "sum_zero" -> (args => fn("coalesce", fn("sum", args.head), Literal(0))),
    // array_get/get are 1-BASED in the reference (array.rs:404-412;
    // index 0 yields NULL) — Spark's builtin get is 0-based
    "array_get" -> (args => fn("try_element_at", args.head,
      fn("nullif", args(1), Literal(0)))),
    // get(): type-dispatched by GraftCoercionRule — VARIANT navigates
    // 0-based/case-sensitive (VariantGetDyn), arrays stay 1-based
    "get" -> (args => GetMarker(args.head, args(1))),
    "get_string" -> (args => VariantGetDyn(args.head, args(1), asText = true)),
    "get_ignore_case" -> (args =>
      VariantGetDyn(args.head, args(1), asText = false, ignoreCase = true)),
    "variant_get_dyn" -> (args => VariantGetDyn(args.head, args(1), asText = false)),
    "variant_get_text" -> (args => VariantGetDyn(args.head, args(1), asText = true)),
    "variant_path" -> (args =>
      VariantGetPath(args.head, args(1), asText = false, dotted = false)),
    "variant_path_text" -> (args =>
      VariantGetPath(args.head, args(1), asText = true, dotted = false)),
    // quantile_cont: exact continuous-interpolation percentile
    // (1-arg form = median, reference aggregate_quantile_cont.rs)
    // multi-quantile forms (reference aggregate_quantile_*.rs: N
    // levels -> Array result) lower onto Spark's array-percentile /
    // per-level picks; identical aggregate subtrees are computed once
    // (PhysicalAggregation dedups equal AggregateExpressions)
    "quantile_cont" -> (args =>
      if (args.length > 2)
        fn("percentile", castD(args.head),
          org.apache.spark.sql.catalyst.expressions.CreateArray(args.tail.map(castD)))
      else fn("percentile", castD(args.head),
        if (args.length > 1) args(1) else Literal(0.5))),
    // quantile / quantile_disc: sorted element at floor((n-1)*q)
    // (reference aggregate_quantile_disc.rs:185). Collect-based — the
    // scale path for hot groups is operators/Quantiles. The multi form
    // picks elements type-preserving (int input renders int levels,
    // decimal keeps scale — the reference's own mix.test vectors).
    "quantile" -> (args => quantileDisc(args)),
    "quantile_disc" -> (args => quantileDisc(args)),
    // t-digest spellings over the registered sketch UDAFs
    "median_tdigest" -> (args =>
      fn("tdigest_quantile", fn("tdigest_agg", castD(args.head)), Literal(0.5))),
    "quantile_tdigest" -> (args =>
      if (args.length > 2)
        org.apache.spark.sql.catalyst.expressions.CreateArray(args.tail.map(q =>
          fn("tdigest_quantile", fn("tdigest_agg", castD(args.head)), castD(q))))
      else fn("tdigest_quantile", fn("tdigest_agg", castD(args.head)), castD(args(1)))),
    "quantile_tdigest_weighted" -> (args =>
      if (args.length > 3)
        org.apache.spark.sql.catalyst.expressions.CreateArray(args.drop(2).map(q =>
          fn("tdigest_quantile",
            fn("tdigest_weighted_agg", castD(args.head), castL(args(1))), castD(q))))
      else fn("tdigest_quantile",
        fn("tdigest_weighted_agg", castD(args.head), castL(args(1))), castD(args(2)))),
    "median_tdigest_weighted" -> (args =>
      fn("tdigest_quantile",
        fn("tdigest_weighted_agg", castD(args.head), castL(args(1))), Literal(0.5))),
    // VARIANT aggregation (reference aggregate_json_*.rs): the variant
    // model is JSON text, so the aggregate is a JSON-encoded collect
    "json_agg" -> (args => fn("to_json", fn("collect_list", args.head))),
    "json_array_agg" -> (args => fn("to_json", fn("collect_list", args.head))),
    "json_object_agg" -> (args =>
      fn("to_json", fn("map_from_entries",
        fn("collect_list", fn("struct", args.head, args(1)))))),
    // bitmap count spellings = cardinality of the corresponding fold
    "bitmap_or_count" -> (args => fn("bitmap_count", fn("bitmap_union_agg", args.head))),
    "bitmap_and_count" -> (args => fn("bitmap_count", fn("bitmap_intersect_agg", args.head))),
    "bitmap_xor_count" -> (args => fn("bitmap_count", fn("bitmap_xor_agg", args.head))),
    "bitmap_not_count" -> (args => fn("bitmap_count", fn("bitmap_andnot_agg", args.head))),
    // intersect_count(bm, tag, v1..vN) — flat spelling of the
    // reference's INTERSECT_COUNT(v1..vN)(bm, tag): one FILTER'd
    // bitmap union per tag value (distributed, merge-combined), then a
    // scalar AND+count over the per-tag unions; absent tags are
    // skipped per the reference's own slt vectors
    "intersect_count" -> (args => {
      val bm = args.head
      val tag = args(1)
      val unions = args.drop(2).map(v => UnresolvedFunction(
        Seq("bitmap_union_agg"), Seq(bm), isDistinct = false,
        filter = Some(org.apache.spark.sql.catalyst.expressions.EqualNullSafe(tag, v))))
      fn("bitmap_intersect_count_merge",
        org.apache.spark.sql.catalyst.expressions.CreateArray(unions))
    }),
    // ClickHouse-lineage moving arrays (reference aggregate_array_moving.rs):
    // collect in group order, post-process into the running window array
    "group_array_moving_sum" -> (args =>
      fn("moving_sum_arr", fn("collect_list", castD(args.head)),
        if (args.length > 1) args(1) else Literal(0))),
    "group_array_moving_avg" -> (args =>
      fn("moving_avg_arr", fn("collect_list", castD(args.head)),
        if (args.length > 1) args(1) else Literal(0))),
    // equi-height histogram (reference aggregate_histogram.rs), JSON
    // bucket list [{lower,upper,ndv,count,pre_sum}...]. Values travel
    // as strings so every input type keeps its native rendering
    // (decimal scale, date text, float shortest-form); the UDF sorts
    // numerically when every value parses as a number, else
    // lexicographically with databend's quoted display
    "histogram" -> (args =>
      fn("histogram_buckets",
        fn("collect_list", org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.StringType)),
        if (args.length > 1) args(1) else Literal(128))),
    // retention(c1..cN) (reference aggregate_retention.rs): r[0] =
    // any(c1); r[i] = any(c1) AND any(c_i) — conditions may fire on
    // different rows, so each is an independent boolean-max fold
    "retention" -> (args => {
      def toInt(e: Expression) = org.apache.spark.sql.catalyst.expressions
        .Cast(e, org.apache.spark.sql.types.IntegerType)
      val anyFirst = fn("max", args.head)
      fn("array", toInt(anyFirst) +: args.tail.map(c =>
        toInt(org.apache.spark.sql.catalyst.expressions.And(
          anyFirst, fn("max", c)))): _*)
    }),
    // window_funnel(window, time, c1..cN) — flat spelling of the
    // reference's window_funnel(window)(time, conds...) parameterized
    // call (Spark SQL cannot parse that form). `time` must be numeric
    // (unix_micros(ts) for timestamps); the DP is the Aggregator's
    // (functions/WindowFunnel.maxLevel), run over the collected
    // per-group events.
    "window_funnel" -> (args =>
      fn("funnel_eval",
        fn("collect_list",
          fn("struct", NumifyTemporal(args(1)), fn("array", args.drop(2): _*))),
        castD(args.head))),
    // ISO day-of-week, Monday=1..Sunday=7 (reference date_helper.rs
    // ToDayOfWeek uses to_monday_one_offset); Spark's dayofweek is
    // Sunday=1, so rewrite to weekday()+1 (weekday is Monday=0).
    // NOTE: the bare name `dayofweek` stays Spark's builtin
    // (Sunday=1..Saturday=7); the reference's `dayofweek` is
    // Sunday=0..Saturday=6 (date_helper.rs DayOfWeek) — overriding a
    // Spark builtin would silently break stock-Spark callers, so only
    // the databend-specific spelling gets databend semantics.
    "to_day_of_week" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Add(
        UnresolvedFunction("weekday", args, isDistinct = false),
        Literal(1))),
    // 2-arg date_add/date_sub take any integer width in the reference
    // (UInt64 days); Spark's builtins insist on INT — cast through
    "date_add" -> (args =>
      if (args.length != 2) UnresolvedFunction("timestampadd", args, isDistinct = false)
      else org.apache.spark.sql.catalyst.expressions.DateAdd(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType))),
    "date_sub" -> (args =>
      if (args.length != 2)
        UnresolvedFunction("timestampadd",
          Seq(args.head, org.apache.spark.sql.catalyst.expressions.UnaryMinus(args(1)), args(2)),
          isDistinct = false)
      else org.apache.spark.sql.catalyst.expressions.DateSub(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType))),
    // to_start_of_{year,quarter,month,week,monday}: DATE result
    // (reference date_helper.rs rounders return Date; sub-day units
    // keep the Timestamp result)
    "to_start_of_month" -> (args =>
      org.apache.spark.sql.catalyst.expressions.TruncDate(
        org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DateType), Literal("month"))),
    "to_start_of_year" -> (args =>
      org.apache.spark.sql.catalyst.expressions.TruncDate(
        org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DateType), Literal("year"))),
    "to_start_of_day" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        UnresolvedFunction("date_trunc", Seq(Literal("day")) ++ args,
          isDistinct = false),
        org.apache.spark.sql.types.TimestampType)),
    "to_string" -> (args =>
      if (args.length >= 2) fmtOrNumeric(args)
      else ToStringDispatch(args.head)),
    // the reference formats with strftime specifiers (datetime.rs
    // prepare_format_string; to_string/date_format/strftime aliases);
    // translate literal %-patterns to Java DateTimeFormatter
    "date_format" -> (args => fmtDate(args)),
    // str_to_date is the reference's to_date alias (datetime.rs:386):
    // literal formats go through the chrono-style Strptime (the
    // DatetimeCoercionRule fills in the session zone)
    "str_to_date" -> (args => args(1) match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s != null =>
        Strptime(args.head, pgToStrftime(s.toString), forDate = true, zoneId = null)
      case _ =>
        new org.apache.spark.sql.catalyst.expressions.ParseToDate(
          args.head, translateFmt(args(1)))
    }),
    // to_string spellings (function_list.txt:100-106)
    "to_char" -> (args =>
      if (args.length >= 2) fmtOrNumeric(args)
      else org.apache.spark.sql.catalyst.expressions.Cast(args.head,
        org.apache.spark.sql.types.StringType)),
    "to_text" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(args.head,
        org.apache.spark.sql.types.StringType)),
    "to_varchar" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(args.head,
        org.apache.spark.sql.types.StringType)),
    // str_to_year (function_list.txt:92)
    "str_to_year" -> (args =>
      UnresolvedFunction("year",
        Seq(UnresolvedFunction("to_date", args, isDistinct = false)),
        isDistinct = false)),
    // databend range/array_generate_range is end-EXCLUSIVE; Spark
    // sequence is inclusive (function_list.txt:3)
    "array_generate_range" -> (args =>
      UnresolvedFunction("sequence", Seq(args.head,
        org.apache.spark.sql.catalyst.expressions.Subtract(args(1), Literal(1))),
        isDistinct = false)),
    // assume_not_null / remove_nullable (function_list.txt:63):
    // nullability assertion via KnownNotNull — a pure planner fact
    "assume_not_null" -> (args =>
      org.apache.spark.sql.catalyst.expressions.KnownNotNull(args.head)),
    "remove_nullable" -> (args =>
      org.apache.spark.sql.catalyst.expressions.KnownNotNull(args.head)),
    // diff_* family (reference datetime.rs:1482-1631; arg order is
    // (end, start); units truncate each operand then subtract —
    // EvalTimesImpl::eval_timestamp_diff, date_helper.rs:1002)
    "diff_years" -> (args => GraftFunctions.diffByField("year", args)),
    "diff_months" -> (args => {
      import org.apache.spark.sql.catalyst.expressions.{Add, Multiply, Subtract}
      def ym(e: Expression) = Add(
        Multiply(UnresolvedFunction("year", Seq(e), isDistinct = false), Literal(12)),
        UnresolvedFunction("month", Seq(e), isDistinct = false))
      org.apache.spark.sql.catalyst.expressions.Cast(
        Subtract(ym(args.head), ym(args(1))),
        org.apache.spark.sql.types.LongType)
    }),
    "diff_days" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        UnresolvedFunction("datediff", args, isDistinct = false),
        org.apache.spark.sql.types.LongType)),
    "between_days" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        UnresolvedFunction("datediff", args, isDistinct = false),
        org.apache.spark.sql.types.LongType)),
    "diff_hours" -> (args => GraftFunctions.diffBySeconds(3600L, args)),
    "diff_minutes" -> (args => GraftFunctions.diffBySeconds(60L, args)),
    "diff_seconds" -> (args => GraftFunctions.diffBySeconds(1L, args)),
    "diff_epochs" -> (args => GraftFunctions.diffBySeconds(1L, args)),
    // variant type predicates (reference scalars/variant.rs is_* fns;
    // aliases is_double/is_real -> is_float, function_list.txt:38-39):
    // dispatch on schema_of_variant's type string
    "is_array" -> (args => GraftFunctions.variantKind(args, Seq("ARRAY"))),
    "is_object" -> (args => GraftFunctions.variantKind(args, Seq("OBJECT"))),
    "is_string" -> (args => GraftFunctions.variantKind(args, Seq("STRING"))),
    "is_boolean" -> (args => GraftFunctions.variantKind(args, Seq("BOOLEAN"))),
    "is_integer" -> (args =>
      GraftFunctions.variantKind(args, Seq("BIGINT", "INT", "SMALLINT", "TINYINT"))),
    "is_float" -> (args =>
      GraftFunctions.variantKind(args, Seq("DECIMAL", "DOUBLE", "FLOAT"))),
    "is_double" -> (args =>
      GraftFunctions.variantKind(args, Seq("DECIMAL", "DOUBLE", "FLOAT"))),
    "is_real" -> (args =>
      GraftFunctions.variantKind(args, Seq("DECIMAL", "DOUBLE", "FLOAT"))),
    "is_null_value" -> (args => GraftFunctions.variantKind(args, Seq("VOID"))),
    "hamming64" -> (args => HammingDistance(
      org.apache.spark.sql.catalyst.expressions.Cast(args.head, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(args(1), org.apache.spark.sql.types.LongType))),
    // Snowflake/databend-style lateral FLATTEN (custom Generator)
    "flatten_json" -> (args => JsonFlatten(args.head, recursive = false)),
    "flatten_json_recursive" -> (args => JsonFlatten(args.head, recursive = true)),
    // VARIANT-typed flatten: the FROM-clause `LATERAL FLATTEN(...)`
    // table factor (GraftSql rewrites onto this generator)
    "flatten_variant" -> (args => {
      def lit(i: Int, dflt: String): String = args.lift(i) match {
        case Some(Literal(s, _)) if s != null => s.toString
        case _ => dflt
      }
      VariantFlatten(args.head, lit(1, ""),
        recursive = lit(2, "false").equalsIgnoreCase("true"),
        mode = lit(3, "both").toLowerCase)
    }),
    // more to_start_of_* units (reference scalars/timestamp family)
    "to_start_of_quarter" -> (args =>
      org.apache.spark.sql.catalyst.expressions.TruncDate(
        org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DateType), Literal("quarter"))),
    "to_start_of_hour" -> (args =>
      UnresolvedFunction("date_trunc", Seq(Literal("hour")) ++ args, isDistinct = false)),
    "to_start_of_minute" -> (args =>
      UnresolvedFunction("date_trunc", Seq(Literal("minute")) ++ args, isDistinct = false)),
    "to_start_of_second" -> (args =>
      UnresolvedFunction("date_trunc", Seq(Literal("second")) ++ args, isDistinct = false)),
    "to_monday" -> (args =>
      org.apache.spark.sql.catalyst.expressions.TruncDate(
        org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DateType), Literal("week"))),
    "to_start_of_iso_week" -> (args =>
      org.apache.spark.sql.catalyst.expressions.TruncDate(
        org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DateType), Literal("week"))),
    // ClickHouse-style yyyymm shorthands (reference scalars/timestamp).
    // Built on DateFormatClass DIRECTLY: the registry's date_format
    // applies the Oracle-style PG-token pass, which would read the
    // Java patterns here differently (mm = month there, HH literal)
    "to_yyyymm" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          args.head, Literal("yyyyMM")),
        org.apache.spark.sql.types.IntegerType)),
    "to_yyyymmdd" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          args.head, Literal("yyyyMMdd")),
        org.apache.spark.sql.types.IntegerType)),
    "to_yyyymmddhhmmss" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          args.head, Literal("yyyyMMddHHmmss")),
        org.apache.spark.sql.types.LongType)),
    // variadic object/array constructors -> JSON text (variant analog).
    // Values go through to_variant so heterogeneous types build (the
    // reference's constructors return VARIANT; Spark's map()/array()
    // would demand one common type)
    // reference semantics (variant.rs object_construct): odd arg count
    // errors (NULL in try_ mode), no args -> {}, plain form DROPS null
    // values, *_keep_null keeps them
    "json_object" -> objConstruct(keepNull = false, tryMode = false),
    "object_construct" -> objConstruct(keepNull = false, tryMode = false),
    "try_json_object" -> objConstruct(keepNull = false, tryMode = true),
    "try_object_construct" -> objConstruct(keepNull = false, tryMode = true),
    "json_object_keep_null" -> objConstruct(keepNull = true, tryMode = false),
    "object_construct_keep_null" -> objConstruct(keepNull = true, tryMode = false),
    "try_json_object_keep_null" -> objConstruct(keepNull = true, tryMode = true),
    "try_object_construct_keep_null" -> objConstruct(keepNull = true, tryMode = true),
    "json_array" -> (args =>
      UnresolvedFunction("to_json",
        Seq(UnresolvedFunction("array",
          args.map(v => fn("to_variant", v)), isDistinct = false)),
        isDistinct = false)),
    // databend keypath get (reference scalars/variant.rs; SURVEY
    // known-hard #6): '{a,b,0}' translates at bind time to the
    // JSONPath '$.a.b[0]' of Spark's get_json_object. Digit segments
    // index arrays; quoted segments are literal keys.
    "get_by_keypath" -> (args => {
      val path = args(1) match {
        case Literal(s, _) if s != null =>
          val inner = s.toString.trim.stripPrefix("{").stripSuffix("}")
          val segs = if (inner.isEmpty) Seq.empty else inner.split(',').toSeq
          segs.map(_.trim.stripPrefix("\"").stripSuffix("\"")).map { seg =>
            if (seg.nonEmpty && seg.forall(_.isDigit)) s"[$seg]" else s".$seg"
          }.mkString("$", "", "")
        case other =>
          throw new IllegalArgumentException(
            s"get_by_keypath requires a literal keypath, got $other")
      }
      UnresolvedFunction("get_json_object",
        Seq(args.head, Literal(path)), isDistinct = false)
    }),
    "get_by_keypath_string" -> (args => {
      val inner = UnresolvedFunction("get_by_keypath", args, isDistinct = false)
      inner // get_json_object already yields unquoted strings
    }),
    // geo distances (reference geographic/geo.rs:119-143, arg order
    // lon1,lat1,lon2,lat2) — haversine built from codegen'd trig
    // builtins, no UDF in the scan path
    "great_circle_distance" -> (args => GraftFunctions.haversineMeters(args)),
    "geo_distance" -> (args => GraftFunctions.haversineMeters(args)),
    "great_circle_angle" -> (args =>
      UnresolvedFunction("degrees", Seq(
        org.apache.spark.sql.catalyst.expressions.Divide(
          GraftFunctions.haversineMeters(args),
          Literal(graft.functions.Geo.EarthRadius))), isDistinct = false)))

  /** variant type predicate: schema_of_variant(v) starts with one of
    * `kinds` (ARRAY<...>, OBJECT<...>, DECIMAL(p,s) carry payloads, so
    * prefix match; scalar kinds match exactly by the same test)
    */
  private def variantKind(args: Seq[Expression], kinds: Seq[String]): Expression = {
    val schema = UnresolvedFunction("schema_of_variant", args, isDistinct = false)
    kinds.map[Expression] { k =>
      UnresolvedFunction("startswith", Seq(schema, Literal(k)), isDistinct = false)
    }.reduce(org.apache.spark.sql.catalyst.expressions.Or(_, _))
  }

  /** diff by calendar field: field(end) - field(start), as long */
  private def diffByField(field: String, args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Subtract
    org.apache.spark.sql.catalyst.expressions.Cast(
      Subtract(
        UnresolvedFunction(field, Seq(args.head), isDistinct = false),
        UnresolvedFunction(field, Seq(args(1)), isDistinct = false)),
      org.apache.spark.sql.types.LongType)
  }

  /** diff by time unit: floor(epoch/unit) per operand, then subtract
    * (reference truncates each side before differencing)
    */
  private def diffBySeconds(unit: Long, args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Subtract}
    def bucket(e: Expression) =
      org.apache.spark.sql.catalyst.expressions.Cast(
        UnresolvedFunction("floor", Seq(Divide(
          UnresolvedFunction("unix_seconds",
            Seq(org.apache.spark.sql.catalyst.expressions.Cast(e,
              org.apache.spark.sql.types.TimestampType)), isDistinct = false),
          Literal(unit.toDouble))), isDistinct = false),
        org.apache.spark.sql.types.LongType)
    Subtract(bucket(args.head), bucket(args(1)))
  }

  /** haversine great-circle distance in meters as an expression tree
    * over builtin trig (reference GeoMethod::SphereMeters, geo.rs:727;
    * EARTH_RADIUS geo.rs:69)
    */
  private def haversineMeters(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Multiply, Subtract}
    require(args.length == 4, "great_circle_distance(lon1, lat1, lon2, lat2)")
    def f(name: String, as: Expression*) =
      UnresolvedFunction(name, as.toSeq, isDistinct = false)
    val Seq(lon1, lat1, lon2, lat2) = args
    val dLat = Divide(f("radians", Subtract(lat2, lat1)), Literal(2.0))
    val dLon = Divide(f("radians", Subtract(lon2, lon1)), Literal(2.0))
    val a = Add(
      f("pow", f("sin", dLat), Literal(2.0)),
      Multiply(
        Multiply(f("cos", f("radians", lat1)), f("cos", f("radians", lat2))),
        f("pow", f("sin", dLon), Literal(2.0))))
    Multiply(
      Literal(2.0 * graft.functions.Geo.EarthRadius),
      f("asin", f("least", Literal(1.0), f("sqrt", a))))
  }

  /** chrono/strftime format -> Java DateTimeFormatter pattern (the
    * reference's default date_format_style formats with strftime
    * specifiers — datetime.rs prepare_format_string — while Spark
    * expects Java patterns). Literal letters are quoted so they stay
    * literal; unknown specifiers pass through quoted.
    */
  /** PostgreSQL/Oracle-style format tokens -> strftime (reference
    * date_helper.rs pg_format_to_strftime; date_format_style defaults
    * to Oracle so this pass ALWAYS runs before the %-translator).
    * Case-insensitive PG tokens, longest-first; %-tokens pass through
    * verbatim; MON only matches at word boundaries (so a literal
    * "month" after MM stays text — the reference's own vector).
    */
  private val PgStrftime: Seq[(String, String)] = Seq(
    "YYYY" -> "%Y", "YY" -> "%y", "MMMM" -> "%B", "MON" -> "%b",
    "MM" -> "%m", "DD" -> "%d", "DY" -> "%a",
    "HH24" -> "%H", "HH12" -> "%I", "AM" -> "%p", "PM" -> "%p",
    "MI" -> "%M", "SS" -> "%S", "FF" -> "%f",
    "UUUU" -> "%G", "TZHTZM" -> "%z", "TZH:TZM" -> "%z", "TZH" -> "%:::z"
  ).sortBy(-_._1.length)

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private[graft] def pgToStrftime(fmt: String): String = {
    val sb = new StringBuilder(fmt.length + 16)
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        // case-sensitive strftime token passes through
        sb.append(fmt.charAt(i)).append(fmt.charAt(i + 1)); i += 2
      } else {
        val rest = fmt.substring(i)
        PgStrftime.find { case (k, _) =>
          rest.length >= k.length &&
            rest.substring(0, k.length).equalsIgnoreCase(k) && {
              !k.equalsIgnoreCase("MON") || {
                val prevOk = i == 0 || !isWordChar(fmt.charAt(i - 1))
                val nextOk = i + k.length >= fmt.length ||
                  !isWordChar(fmt.charAt(i + k.length))
                prevOk && nextOk
              }
            }
        } match {
          case Some((k, v)) => sb.append(v); i += k.length
          case None => sb.append(fmt.charAt(i)); i += 1
        }
      }
    }
    sb.toString
  }

  private[graft] def strftimeToJava(fmt0: String): String = {
    // reference replace_time_format: %c = "%x %X", %x = %F, %X = %T;
    // %:::z = offset hour (Java "x"), via sentinel so the literal
    // quoting below can't touch it
    val fmt = fmt0.replace("%c", "%x %X").replace("%x", "%F")
      .replace("%X", "%T").replace("%:::z", "")
    val map = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
      'H' -> "HH", 'k' -> "H", 'I' -> "hh", 'l' -> "h", 'M' -> "mm",
      'S' -> "ss", 'f' -> "SSSSSS", 'p' -> "a", 'a' -> "EEE", 'A' -> "EEEE",
      'b' -> "MMM", 'h' -> "MMM", 'B' -> "MMMM", 'j' -> "DDD",
      'T' -> "HH:mm:ss", 'F' -> "yyyy-MM-dd", 'D' -> "MM/dd/yy",
      'R' -> "HH:mm", 'G' -> "YYYY", 'V' -> "ww", 'z' -> "xx", 'Z' -> "zz",
      '%' -> "%")
    val sb = new StringBuilder
    val lit = new StringBuilder // pending literal run (letters/quotes)
    def flushLit(): Unit = if (lit.nonEmpty) {
      // ONE quoted run: per-char quoting would put '' between
      // adjacent letters, which Java patterns read as a literal
      // apostrophe
      sb.append('\'').append(lit.toString.replace("'", "''")).append('\'')
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        flushLit()
        val n = fmt.charAt(i + 1)
        // the reference rejects specifiers outside its strftime set
        // (date_format '%i' is error 1006)
        if (!map.contains(n) && n.isLetter)
          throw new IllegalArgumentException(
            s"1006: unsupported format specifier %$n")
        sb.append(map.getOrElse(n, "'" + n + "'")); i += 2
      } else if (c.isLetter || c == '\'') { lit.append(c); i += 1 }
      else { flushLit(); sb.append(c); i += 1 }
    }
    flushLit()
    sb.toString.replace("", "x")
  }

  /** translate a literal strftime pattern argument; non-% literals and
    * non-literal expressions pass through untouched
    */
  private def translateFmt(e: Expression): Expression = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s != null =>
      val pg = pgToStrftime(s.toString)
      if (pg.contains("%")) Literal(strftimeToJava(pg)) else e
    case other => other
  }

  /** to_char/to_string with a format: a PostgreSQL numeric mask
    * (digit slots only) formats numbers; anything else is the
    * datetime tier — decidable from the literal alone
    */
  private def fmtOrNumeric(args: Seq[Expression]): Expression = args(1) match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _)
        if s != null && PgNumericFormat.isNumericMask(s.toString) =>
      PgNumericFormat(args.head, s.toString)
    case _ => fmtDate(args)
  }

  private def fmtDate(args: Seq[Expression]): Expression = args(1) match {
    case Literal(s0: org.apache.spark.unsafe.types.UTF8String, t0)
        if s0 != null && {
          val pg = pgToStrftime(s0.toString)
          pg.contains("%G") || pg.contains("%V")
        } =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(
        pgToStrftime(s0.toString))
      // ISO week-based fields: Spark 3+ date_format rejects the
      // week-based pattern letters (Y, w) under the default formatter
      // policy, so lower %G/%V to date_part expressions concatenated
      // with the formatted remainder
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.StringType
      val fmt = s.toString
      val ts = args.head
      def fn(name: String, as: Expression*) =
        UnresolvedFunction(name, as.toSeq, isDistinct = false)
      val out = scala.collection.mutable.ArrayBuffer[Expression]()
      def seg(str: String): Unit = if (str.nonEmpty)
        out += org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          ts, Literal(strftimeToJava(str)))
      var i = 0; var start = 0
      while (i < fmt.length) {
        if (fmt.charAt(i) == '%' && i + 1 < fmt.length &&
            (fmt.charAt(i + 1) == 'G' || fmt.charAt(i + 1) == 'V')) {
          seg(fmt.substring(start, i))
          out += (if (fmt.charAt(i + 1) == 'G')
            Cast(fn("date_part", Literal("YEAROFWEEK"), ts), StringType)
          else
            fn("lpad", Cast(fn("date_part", Literal("WEEK"), ts), StringType),
               Literal(2), Literal("0")))
          i += 2; start = i
        } else if (fmt.charAt(i) == '%' && i + 1 < fmt.length) i += 2
        else i += 1
      }
      seg(fmt.substring(start))
      if (out.length == 1) out.head else fn("concat", out.toSeq: _*)
    case _ =>
      org.apache.spark.sql.catalyst.expressions.DateFormatClass(
        args.head, translateFmt(args(1)))
  }

  def register(spark: SparkSession): Unit = {
    // once per session: query fns defensively call register() on every
    // build, so the bench paid the full ~700-function re-registration
    // (registry churn + UDF encoder construction) on every sample.
    // Registration is idempotent, so skipping repeats changes nothing
    // (round-13; driver-side overhead, guide §1.2 step 2).
    if (spark.conf.getOption("spark.graft.functionsRegistered").contains("true")) return
    val reg = spark.sessionState.functionRegistry
    for ((name, target) <- aliases if name != target) {
      reg.createOrReplaceTempFunction(
        name,
        args => UnresolvedFunction(target, args, isDistinct = false),
        "scala_udf")
    }
    for ((name, builder) <- rewrites) {
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    // typed aggregators exposed as SQL-callable UDAFs
    spark.udf.register("bitmap_agg",
      org.apache.spark.sql.functions.udaf(new BitmapAggs.BitmapAgg, org.apache.spark.sql.Encoders.scalaInt))
    spark.udf.register("bitmap_union_agg",
      org.apache.spark.sql.functions.udaf(new BitmapAggs.BitmapUnionAgg, org.apache.spark.sql.Encoders.BINARY))
    spark.udf.register("bitmap_intersect_agg",
      org.apache.spark.sql.functions.udaf(new BitmapAggs.BitmapIntersectAgg, org.apache.spark.sql.Encoders.BINARY))
    spark.udf.register("bitmap_count",
      udf((b: Array[Byte]) => if (b == null) 0L else BitmapAggs.deser(b).getLongCardinality))
    spark.udf.register("bitmap_contains",
      udf((b: Array[Byte], v: Int) => if (b == null) false else BitmapAggs.deser(b).contains(v)))
    // t-digest quantile sketch, `_state`-combinator style (reference:
    // quantile_tdigest aggregator.rs:106-119, `_state` :196)
    spark.udf.register("tdigest_agg",
      org.apache.spark.sql.functions.udaf(new TDigest.TDigestAgg,
        org.apache.spark.sql.Encoders.scalaDouble))
    spark.udf.register("tdigest_merge_agg",
      org.apache.spark.sql.functions.udaf(new TDigest.TDigestMergeAgg,
        org.apache.spark.sql.Encoders.BINARY))
    spark.udf.register("tdigest_quantile",
      udf((state: Array[Byte], q: Double) => TDigest.quantile(TDigest.deser(state), q)))
    // round-6 aggregate name surface (reference aggregator.rs:71-192)
    spark.udf.register("tdigest_weighted_agg",
      org.apache.spark.sql.functions.udaf(new TDigest.TDigestWeightedAgg,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong)))
    spark.udf.register("bitmap_xor_agg",
      org.apache.spark.sql.functions.udaf(new BitmapAggs.BitmapXorAgg,
        org.apache.spark.sql.Encoders.BINARY))
    spark.udf.register("bitmap_andnot_agg",
      org.apache.spark.sql.functions.udaf(new BitmapAggs.BitmapAndNotAgg,
        org.apache.spark.sql.Encoders.BINARY))
    // quantile_disc post-pick: sorted element at floor((n-1)*q)
    // (reference aggregate_quantile_disc.rs:185)
    spark.udf.register("quantile_disc_pick", udf((xs: Seq[Double], q: Double) =>
      if (xs == null || xs.isEmpty) None
      else {
        val s = xs.sorted
        val idx = math.min(s.length - 1,
          math.max(0, math.floor((s.length - 1) * q).toInt))
        Some(s(idx))
      }))
    // moving window arrays (reference aggregate_array_moving.rs;
    // window <= 0 means unbounded running sum)
    def movingSums(xs: Seq[Double], w: Int): Seq[Double] =
      if (xs == null) Seq.empty
      else {
        val out = new Array[Double](xs.length)
        var acc = 0.0
        var i = 0
        while (i < xs.length) {
          acc += xs(i)
          if (w > 0 && i >= w) acc -= xs(i - w)
          out(i) = acc
          i += 1
        }
        out.toSeq
      }
    spark.udf.register("bitmap_intersect_count_merge",
      udf((blobs: Seq[Array[Byte]]) => BitmapAggs.intersectNonEmpty(blobs)))
    // window_funnel post-eval: (time, per-step condition flags) rows
    // collected per group; each true flag k becomes a (t, k+1) event
    spark.udf.register("funnel_eval", udf((xs: Seq[(Double, Seq[Boolean])], w: Double) =>
      if (xs == null || xs.isEmpty) 0
      else {
        val nSteps = xs.head._2.length
        val events = xs.flatMap { case (t, conds) =>
          conds.zipWithIndex.collect { case (true, i) => (t, i + 1) }
        }
        WindowFunnel.maxLevel(events, w, nSteps)
      }))
    // MySQL-style soundex (reference string.rs soundex; its own slt
    // 02_0039 vectors): unbounded code length (Spark's builtin
    // truncates to 4), leading non-letters skipped, a non-ASCII lead
    // character is kept verbatim, vowels never reset the dup check.
    spark.udf.register("soundex", udf((s: String) =>
      if (s == null) null
      else {
        val cps = s.codePoints().toArray
        def code(c: Int): Int = Character.toUpperCase(c) match {
          case 'B' | 'F' | 'P' | 'V' => 1
          case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => 2
          case 'D' | 'T' => 3
          case 'L' => 4
          case 'M' | 'N' => 5
          case 'R' => 6
          case _ => 0
        }
        def leadOk(c: Int) = c >= 128 || Character.isLetter(c)
        var i = 0
        while (i < cps.length && !leadOk(cps(i))) i += 1
        if (i >= cps.length) ""
        else {
          val sb = new StringBuilder
          val first = cps(i)
          sb.appendAll(Character.toChars(
            if (first < 128) Character.toUpperCase(first) else first))
          var last = code(first)
          var n = 1 // emitted length in code points
          i += 1
          while (i < cps.length) {
            val cd = code(cps(i))
            if (cd != 0) {
              if (cd != last) { sb.append(('0' + cd).toChar); n += 1 }
              last = cd
            }
            i += 1
          }
          while (n < 4) { sb.append('0'); n += 1 }
          sb.toString
        }
      }))
    // HEX_DECODE_STRING (reference string.rs): unhex straight to text
    spark.udf.register("hex_decode_string", udf((s: String) =>
      if (s == null) null
      else new String(
        s.sliding(2, 2).map(h => Integer.parseInt(h, 16).toByte).toArray, "UTF-8")))
    spark.udf.register("moving_sum_arr", udf((xs: Seq[Double], w: Int) => movingSums(xs, w)))
    spark.udf.register("moving_avg_arr", udf((xs: Seq[Double], w: Int) =>
      movingSums(xs, w).zipWithIndex.map { case (s, i) =>
        val denom = if (w > 0) math.min(i + 1, w) else i + 1
        s / denom
      }))
    // equi-height histogram (reference aggregate_histogram.rs:113-130,
    // 298-301): JSON [{lower,upper,ndv,count,pre_sum}...], pre_sum =
    // rows before the bucket. The reference buckets over DISTINCT
    // values — ceil(ndv / max_buckets) distinct values per bucket, so
    // equal values never split across buckets (its own slt:
    // histogram(c_id) over 2 ids x 6 rows = 2 buckets of count 6).
    spark.udf.register("histogram_buckets", udf((xs: Seq[String], maxBuckets: Int) =>
      if (xs == null || xs.isEmpty) "[]"
      else {
        // numeric when every value parses (ints/floats/decimals);
        // dates/strings sort lexicographically and display quoted —
        // the reference's own per-type slt renderings
        val parsed = xs.map(s =>
          try Some(scala.math.BigDecimal(s)) catch { case _: NumberFormatException => None })
        val numeric = parsed.forall(_.isDefined)
        def fmt(s0: String): String = {
          // Spark's timestamp->string drops zero micros; the reference
          // displays all six digits
          val s =
            if (!numeric && s0.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?""")) {
              val dot = s0.indexOf('.')
              if (dot < 0) s0 + ".000000"
              else s0 + "0" * (7 + dot - s0.length)
            } else s0
          if (!numeric) "'" + s + "'"
          // Spark renders integral doubles "1.0"; the reference's Rust
          // f64 display drops the fraction. Decimal columns keep their
          // declared scale (two-plus digits), so only a single ".0"
          // tail strips.
          else if (s.endsWith(".0")) s.dropRight(2)
          else s
        }
        require(maxBuckets >= 1, s"1006: histogram bucket count must be >= 1, got $maxBuckets")
        val sorted: Seq[(String, scala.math.BigDecimal)] =
          if (numeric) xs.zip(parsed.map(_.get)).sortBy(_._2)
          else xs.sorted.map(s => (s, scala.math.BigDecimal(0)))
        def sameVal(a: (String, scala.math.BigDecimal), b: (String, scala.math.BigDecimal)) =
          if (numeric) a._2 == b._2 else a._1 == b._1
        // sorted distinct runs: (display value, occurrences)
        val runs = sorted.foldLeft(List.empty[((String, scala.math.BigDecimal), Int)]) {
          case ((v, c) :: tail, x) if sameVal(v, x) => (v, c + 1) :: tail
          case (acc, x) => (x, 1) :: acc
        }.reverse.map { case (v, c) => (v._1, c) }.toArray
        val ndv = runs.length
        val b = math.max(1, math.min(maxBuckets, ndv))
        val per = math.ceil(ndv.toDouble / b).toInt
        val sb = new StringBuilder("[")
        var start = 0
        var preSum = 0
        var first = true
        while (start < ndv) {
          val end = math.min(ndv, start + per)
          var cnt = 0
          var i = start
          while (i < end) { cnt += runs(i)._2; i += 1 }
          if (!first) sb.append(',')
          first = false
          sb.append(s"""{"lower":"${fmt(runs(start)._1)}","upper":"${fmt(runs(end - 1)._1)}",""")
          sb.append(s""""ndv":${end - start},"count":$cnt,"pre_sum":$preSum}""")
          preSum += cnt
          start = end
        }
        sb.append(']').toString
      }))
    // scalar bitmap ops — the reference's full scalars/bitmap.rs name
    // set (bitmap_and/or/xor/not, subsets, min/max, conversions)
    spark.udf.register("build_bitmap", udf((xs: Seq[Int]) => BitmapAggs.buildBitmap(xs)))
    spark.udf.register("to_bitmap", udf((s: String) => BitmapAggs.parseBitmap(s)))
    spark.udf.register("bitmap_and", udf((a: Array[Byte], b: Array[Byte]) => BitmapAggs.and(a, b)))
    spark.udf.register("bitmap_or", udf((a: Array[Byte], b: Array[Byte]) => BitmapAggs.or(a, b)))
    spark.udf.register("bitmap_xor", udf((a: Array[Byte], b: Array[Byte]) => BitmapAggs.xor(a, b)))
    spark.udf.register("bitmap_not", udf((a: Array[Byte], b: Array[Byte]) => BitmapAggs.andNot(a, b)))
    spark.udf.register("bitmap_and_not", udf((a: Array[Byte], b: Array[Byte]) => BitmapAggs.andNot(a, b)))
    spark.udf.register("bitmap_has_any", udf((a: Array[Byte], b: Array[Byte]) => BitmapAggs.hasAny(a, b)))
    spark.udf.register("bitmap_has_all", udf((a: Array[Byte], b: Array[Byte]) => BitmapAggs.hasAll(a, b)))
    spark.udf.register("bitmap_min", udf((a: Array[Byte]) => BitmapAggs.bmMin(a)))
    spark.udf.register("bitmap_max", udf((a: Array[Byte]) => BitmapAggs.bmMax(a)))
    spark.udf.register("bitmap_to_array", udf((a: Array[Byte]) => BitmapAggs.toArray(a)))
    spark.udf.register("bitmap_to_string", udf((a: Array[Byte]) => BitmapAggs.toStr(a)))
    // order-preserving VARIANT sort key (GraftCoercionRule min/max/
    // ORDER BY/array_sort over variant; reference jsonb compare)
    spark.udf.register("variant_rank_key", udf((s: String) => VariantRank.key(s)))
    // the reference's PERMISSIVE json text grammar (strict fast path
    // first; see LenientJson) — try_ form nulls instead of erroring
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("parse_json",
      a => LenientParseJson(
        org.apache.spark.sql.catalyst.expressions.Cast(
          a.head, org.apache.spark.sql.types.StringType), tryMode = false),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("try_parse_json",
      a => LenientParseJson(
        org.apache.spark.sql.catalyst.expressions.Cast(
          a.head, org.apache.spark.sql.types.StringType), tryMode = true),
      "scala_udf")
    // json text of a plain string scalar (rank-key lifting of a
    // non-variant comparison operand: 'ab' -> "\"ab\"")
    spark.udf.register("json_quote_str", udf((s: String) =>
      if (s == null) null else JsonFlatten.mapper.writeValueAsString(s)))
    // reference variant LIKE (comparison.rs variant like; VariantLike)
    spark.udf.register("variant_like_impl",
      udf((j: String, p: String, e: String) => VariantLike.like(j, p, e)))
    spark.udf.register("sub_bitmap",
      udf((a: Array[Byte], off: Int, len: Int) => BitmapAggs.subBitmap(a, off, len)))
    spark.udf.register("bitmap_subset_in_range",
      udf((a: Array[Byte], s: Long, e: Long) => BitmapAggs.subsetInRange(a, s, e)))
    spark.udf.register("bitmap_subset_limit",
      udf((a: Array[Byte], s: Long, n: Int) => BitmapAggs.subsetLimit(a, s, n)))
    spark.udf.register("bitmap_cardinality",
      udf((b: Array[Byte]) => if (b == null) 0L else BitmapAggs.deser(b).getLongCardinality))
    // IPv4 conversions (reference scalars: inet_aton/inet_ntoa,
    // function_list.txt:36-37) — tiny non-hot-path UDFs
    // *_impl stays permissive (NULL on malformed) for the try_ aliases;
    // the bare names are STRICT like the reference (error 1006)
    spark.udf.register("inet_aton_impl", udf((s: String) =>
      if (s == null) None
      else {
        val p = s.split('.')
        if (p.length != 4) None
        else try Some(p.foldLeft(0L)((acc, o) => acc * 256 + o.toInt))
        catch { case _: NumberFormatException => None }
      }))
    for (strict <- Seq("inet_aton", "ipv4_string_to_num"))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(strict,
        args => {
          def impl = UnresolvedFunction("inet_aton_impl", args, isDistinct = false)
          ErrIf(org.apache.spark.sql.catalyst.expressions.And(
            org.apache.spark.sql.catalyst.expressions.IsNotNull(
              org.apache.spark.sql.catalyst.expressions.Cast(
                args.head, org.apache.spark.sql.types.StringType)),
            org.apache.spark.sql.catalyst.expressions.IsNull(impl)),
            impl, s"1006: invalid IPv4 address for $strict")
        }, "scala_udf")
    spark.udf.register("inet_ntoa", udf((n: Long) =>
      s"${(n >> 24) & 255}.${(n >> 16) & 255}.${(n >> 8) & 255}.${n & 255}"))
    spark.udf.register("ipv4_num_to_string", udf((n: Long) =>
      s"${(n >> 24) & 255}.${(n >> 16) & 255}.${(n >> 8) & 255}.${n & 255}"))
    // geohash (reference geographic/geo.rs:145-196)
    Geo.register(spark)
    // round-4 name-surface expansion (~140 more reference names)
    MoreAliases.register(spark)
    MoreAliases2.register(spark)
    // round-5 st_* geometry surface (62 names over the EWKB engine)
    GeometryFunctions.register(spark)
    // round-6 GEOGRAPHY tier (SRID-4326-tagged EWKB, spherical meters)
    Geography.register(spark)
    // round-5 numeric obfuscator (expression tier)
    for ((name, builder) <- Obfuscator.rewrites)
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    // round-5 geometry aggregates
    GeoAggs.register(spark)
    // round-5 markov masking pair (train aggregate + generate scalar)
    Markov.register(spark)
    // round-5 TIMESTAMP_TZ tier (offset-preserving struct model)
    TimestampTz.register(spark)
    // round-6 h3 index-math tier (19 names; geo_h3.rs)
    H3.register(spark)
    // round-9 reference datetime semantics: databend-spelled typeof
    // (the coercion rule itself is wired by GraftSession at build time)
    DatetimeSemantics.register(spark)
    DatetimeMore.register(spark)
    // jq subset SRF (reference srfs/variant.rs:439 via jaq): rows of
    // canonical JSON per produced value
    spark.udf.register("jq_impl",
      udf((f: String, j: String) => Jq(f, j)))
    reg.createOrReplaceTempFunction("jq",
      (args: Seq[Expression]) => {
        val rows = UnresolvedFunction("jq_impl",
          Seq(args.head, JsonTextDispatch(args(1))), isDistinct = false)
        // VARIANT rows, so jq output composes with variant navigation
        val x = org.apache.spark.sql.catalyst.expressions
          .UnresolvedNamedLambdaVariable(Seq("__jq"))
        Explode(org.apache.spark.sql.catalyst.expressions.ArrayTransform(rows,
          org.apache.spark.sql.catalyst.expressions.LambdaFunction(
            UnresolvedFunction("parse_json", Seq(x), isDistinct = false), Seq(x))))
      },
      "scala_udf")
    // json text of any value (variant-aware) — used by textual
    // rewrites that cannot build a JsonTextDispatch node directly
    reg.createOrReplaceTempFunction("graft_json_text",
      (args: Seq[Expression]) => JsonTextDispatch(args.head), "scala_udf")
    // sleep (reference other.rs:123 — 3s cap, returns 0) and glob
    // (comparison.rs:1969 — unix shell pattern match; * crosses
    // separators like the rust glob crate's default MatchOptions,
    // malformed patterns return false)
    spark.udf.register("sleep", udf((secs: Double) => {
      require(secs >= 0 && secs <= 3.0,
        s"The maximum sleep time is 3 seconds. Requested: ${secs}s")
      Thread.sleep((secs * 1000).toLong)
      0.toShort
    }))
    spark.udf.register("glob", udf((s: String, pattern: String) =>
      if (s == null || pattern == null) null
      else try {
        val sb = new StringBuilder
        var i = 0
        while (i < pattern.length) {
          pattern.charAt(i) match {
            case '*' => sb.append(".*")
            case '?' => sb.append('.')
            case '[' =>
              // a leading ! negates; a ] right after [ (or [!) is literal
              var k = i + 1
              if (k < pattern.length && pattern.charAt(k) == '!') k += 1
              if (k < pattern.length && pattern.charAt(k) == ']') k += 1
              val j = pattern.indexOf(']', k)
              if (j < 0) throw new IllegalArgumentException("unclosed [")
              var cls = pattern.substring(i + 1, j)
              if (cls.startsWith("!")) cls = "^" + cls.substring(1)
              sb.append('[').append(cls.replace("\\", "\\\\")).append(']')
              i = j
            case c => sb.append(java.util.regex.Pattern.quote(c.toString))
          }
          i += 1
        }
        Some(s.matches(sb.toString))
      } catch { case _: Exception => Some(false) }))
    spark.conf.set("spark.graft.functionsRegistered", "true")
  }

  /** true if the alias layer is active in this session */
  def isRegistered(spark: SparkSession): Boolean =
    spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("to_day_of_month"))
}
