package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Reference coercion/navigation semantics beyond the datetime tier
  * (see [[DatetimeCoercionRule]]):
  *
  *  - `get(x, k)` dispatch: VARIANT/STRING input → [[VariantGetDyn]]
  *    (0-based, case-sensitive); ARRAY/MAP input → try_element_at
  *    (the reference's array get is 1-based) — variant.rs / array.rs.
  *  - `v[i]` / `v['k']` subscripts over VARIANT (Spark has no
  *    ExtractValue for VariantType) → [[VariantGetDyn]].
  *  - MySQL-style numeric↔boolean coercion (expression.rs casts):
  *    `WHERE <int>`, `<int> AND/OR/NOT`, `bool = <num>` comparisons.
  *  - ORDER BY a VARIANT column: Spark rejects VariantType ordering;
  *    sort on the canonical JSON rendering (variant.rs compare is
  *    type-then-value; JSON text agrees on the homogeneous columns
  *    the suites exercise).
  */
object GraftCoercionRule {
  /** functions whose unit/weekday argument may be a bare keyword */
  private[functions] val unitArgFns = Set(
    "date_diff", "datediff", "date_between", "datebetween", "date_trunc", "trunc",
    "time_slice", "previous_day", "next_day", "last_day",
    "to_start_of_week", "date_part", "datepart")

  /** resolved array builtins that accept a VARIANT array operand */
  private[functions] val variantArrayClasses = Set(
    "ArrayInsert", "ArrayDistinct", "ArrayExcept", "ArrayIntersect",
    "ArrayRemove", "ArrayContains", "ArraysOverlap", "ArrayPosition",
    "ArrayCompact", "Flatten", "Slice", "SortArray", "ArraySort",
    "ArrayMax", "ArrayMin", "ArrayJoin", "ArraysZip", "ArrayUnion",
    "ArrayAppend", "ArrayPrepend", "Size", "Reverse",
    "Explode", "PosExplode")

  private[functions] val unitWords = Set(
    "year", "years", "isoyear", "quarter", "quarters", "month", "months",
    "week", "weeks", "yearweek", "isoweek", "iw", "day", "days", "dow",
    "doy", "isodow", "hour", "hours", "minute", "minutes", "second",
    "seconds", "millisecond", "milliseconds", "microsecond",
    "microseconds", "millennium", "millenniums", "millennia", "century",
    "centuries", "decade", "decades", "epoch",
    "monday", "tuesday", "wednesday", "thursday", "friday", "saturday",
    "sunday", "mon", "tue", "wed", "thu", "fri", "sat", "sun")
}

class GraftCoercionRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isNum(e: Expression): Boolean = e.resolved && (e.dataType match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  })

  private def isBool(e: Expression): Boolean =
    e.resolved && e.dataType == BooleanType

  private def isStr(e: Expression): Boolean =
    e.resolved && e.dataType == StringType

  /** unwrap an ANALYZER-INSERTED cast hiding a string/bool operand
    * (in-batch race: TypeCoercion may coerce a comparison before this
    * rule sees it); user-written casts stay
    */
  private def deCast(e: Expression): Expression = e match {
    // never unwrap TRY casts: try_cast(s AS t) >= 0 must compare the
    // CAST result (NULL-on-malformed), not re-coerce the raw string
    case c @ Cast(ch, _, _, mode)
        if mode != EvalMode.TRY &&
          c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty && ch.resolved &&
          (ch.dataType == StringType || ch.dataType == BooleanType) => ch
    case other => other
  }

  /** SQL LIKE pattern -> java regex honoring an arbitrary escape char
    * (the reference accepts `esc`+ANY char as that literal char; Spark
    * rejects escape before anything but %, _ or the escape itself)
    */
  private def likeToRegex(pat: String, esc: Char): String = {
    val sb = new StringBuilder("(?s)^")
    var i = 0
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (c == esc && i + 1 < pat.length) {
        sb.append(java.util.regex.Pattern.quote(pat.charAt(i + 1).toString))
        i += 2
      } else {
        c match {
          case '%' => sb.append(".*")
          case '_' => sb.append(".")
          case ch => sb.append(java.util.regex.Pattern.quote(ch.toString))
        }
        i += 1
      }
    }
    sb.append("$").toString
  }

  private def isVariantish(e: Expression): Boolean =
    e.resolved && (e.dataType == VariantType || e.dataType == NullType)

  private def isVariantAt(e: Expression): Boolean =
    e.resolved && e.dataType == VariantType

  private def truthy(e: Expression): Expression =
    Not(EqualTo(e, Cast(Literal(0), e.dataType)))

  /** order-preserving binary key for a VARIANT (reference jsonb
    * type-then-value compare; see [[VariantRank]]). The key is built
    * over the CANONICAL JSON text ([[JsonTextDispatch]]): a plain
    * string cast of a variant unquotes strings and maps json null to
    * SQL NULL, which would collapse every non-numeric string to the
    * number-rank/0.0 key and break ORDER BY/min/max over variant.
    */
  private def rankKey(e: Expression): Expression =
    UnresolvedFunction("variant_rank_key", Seq(JsonTextDispatch(e)),
      isDistinct = false)

  /** BAG except/intersect for native arrays (the reference's array.rs
    * semantics: one occurrence subtracted/kept per occurrence in the
    * other side) — Spark's builtins deduplicate, so run the jsonb bag
    * op and come back through from_json at the original element type.
    */
  private def bagArrayOp(fn: String, l: Expression, r: Expression): Expression =
    UnresolvedFunction("from_json", Seq(
      UnresolvedFunction(fn, Seq(
        UnresolvedFunction("to_json", Seq(l), isDistinct = false),
        UnresolvedFunction("to_json", Seq(r), isDistinct = false)),
        isDistinct = false),
      Literal(l.dataType.catalogString)), isDistinct = false)

  /** the variant expression under an ANALYZER-INSERTED implicit cast,
    * if any. A user-written `CAST(v AS STRING) || 'x'` (tagged
    * USER_SPECIFIED_CAST by the parser/Column API) is string
    * concatenation in the reference and must NOT be hijacked into
    * jsonb concat.
    */
  private def unwrapToVariant(e: Expression): Option[Expression] = e match {
    case v if v.resolved && v.dataType == VariantType => Some(v)
    case c0 @ Cast(c, _, _, _)
        if c0.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty &&
          c.resolved && c.dataType == VariantType => Some(c)
    case _ => None
  }

  /** strips the parse_json/cast wrap an earlier iteration may have put
    * around a non-variant operand of a variant binary op
    */
  private def unwrapVariantWrap(e: Expression): Expression = e match {
    case u: UnresolvedFunction
        if u.nameParts.length == 1 &&
          u.nameParts.head.equalsIgnoreCase("parse_json") &&
          u.arguments.length >= 1 => u.arguments.head
    case pj: org.apache.spark.sql.catalyst.expressions.variant.ParseJson =>
      pj.children.head
    case Cast(c, VariantType, _, _) => c
    case other => other
  }

  private def isVariantArray(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case ArrayType(VariantType, _) => true
      case _ => false
    })

  /** sort an array<variant> by rank key: decorate-sort-undecorate via
    * struct whose FIRST field is the key (struct ordering is
    * field-by-field, so sort_array orders by the key)
    */
  private def sortVariantArray(arr: Expression, asc: Expression): Expression = {
    val v = UnresolvedNamedLambdaVariable(Seq("__sv"))
    val deco = ArrayTransform(arr,
      LambdaFunction(CreateNamedStruct(Seq(
        Literal("k"), rankKey(v), Literal("v"), v)), Seq(v)))
    val s = UnresolvedNamedLambdaVariable(Seq("__ss"))
    ArrayTransform(
      UnresolvedFunction("sort_array", Seq(deco, asc), isDistinct = false),
      LambdaFunction(UnresolvedExtractValue(s, Literal("v")), Seq(s)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val p1 = plan.resolveOperatorsUp {
      case f @ Filter(cond, child) if isNum(cond) =>
        Filter(truthy(cond), child)
      // Spark rejects NON-DETERMINISTIC expressions inside aggregate
      // arguments (uniq(gen_random_uuid())); the reference evaluates
      // them per input row — hoist them into a pre-aggregation Project
      case agg: Aggregate
          if agg.resolved && agg.aggregateExpressions.exists(_.exists {
            case ae: AggregateExpression =>
              ae.aggregateFunction.children.exists(c => !c.deterministic)
            case _ => false
          }) =>
        val pulled = mutable.Buffer[NamedExpression]()
        val newAggs = agg.aggregateExpressions.map(_.transformUp {
          case ae: AggregateExpression
              if ae.aggregateFunction.children.exists(c => !c.deterministic) =>
            val fn2 = ae.aggregateFunction.withNewChildren(
              ae.aggregateFunction.children.map {
                case c if !c.deterministic =>
                  val al = Alias(c, s"__nondet${pulled.size}")()
                  pulled += al
                  al.toAttribute
                case c => c
              })
            ae.copy(aggregateFunction =
              fn2.asInstanceOf[AggregateFunction])
        }.asInstanceOf[NamedExpression])
        if (pulled.isEmpty) agg
        else agg.copy(aggregateExpressions = newAggs,
          child = Project(agg.child.output ++ pulled, agg.child))
      // GROUP BY a VARIANT expression: Spark rejects VariantType
      // grouping (not orderable); the reference groups jsonb values by
      // equality (group_by suites). Group on the CANONICAL JSON text
      // and re-parse the key for the output column, keeping the
      // original exprIds so parents' references stay valid.
      case agg: Aggregate if agg.resolved &&
          agg.groupingExpressions.exists(g => g.dataType == VariantType) =>
        val vges = agg.groupingExpressions.filter(_.dataType == VariantType)
        def reparse(g: Expression): Expression =
          UnresolvedFunction("parse_json", Seq(JsonTextDispatch(g)),
            isDistinct = false)
        val newGes = agg.groupingExpressions.map {
          case g if g.dataType == VariantType => JsonTextDispatch(g)
          case g => g
        }
        def fix(e: Expression): Expression = e match {
          case ae: AggregateExpression => ae
          case x if vges.exists(_.semanticEquals(x)) => reparse(x)
          case other => other.mapChildren(fix)
        }
        val newAes = agg.aggregateExpressions.map {
          case a: AttributeReference if vges.exists(_.semanticEquals(a)) =>
            Alias(reparse(a), a.name)(exprId = a.exprId,
              qualifier = a.qualifier)
          case ne => fix(ne).asInstanceOf[NamedExpression]
        }
        agg.copy(groupingExpressions = newGes,
          aggregateExpressions = newAes)
      case s @ Sort(orders, global, child, hint)
          if orders.exists(o => o.child.resolved && o.child.dataType == VariantType) =>
        val fixed = orders.map { o =>
          if (o.child.resolved && o.child.dataType == VariantType)
            o.copy(child = rankKey(o.child))
          else o
        }
        Sort(fixed, global, child, hint)
    }
    p1.resolveOperatorsUp {
      case q => q.transformExpressionsUp {
        // VARIANT inside an ordering aggregate: the reference orders
        // variants (type-then-value; variant.rs compare) — order by
        // the canonical JSON text here, keeping the variant payload
        // (max(v) -> max_by(v, v::string); orderings in min_by/max_by
        // cast in place). Homogeneous columns — the suites' shape —
        // agree with JSON-text order.
        case u: UnresolvedFunction
            if u.nameParts.length == 1 &&
              Set("max", "min")(u.nameParts.head.toLowerCase) &&
              u.arguments.length == 1 && isVariantAt(u.arguments.head) =>
          u.copy(
            nameParts = Seq(u.nameParts.head.toLowerCase + "_by"),
            arguments = Seq(u.arguments.head, rankKey(u.arguments.head)))
        case u: UnresolvedFunction
            if u.nameParts.length == 1 &&
              Set("max_by", "min_by")(u.nameParts.head.toLowerCase) &&
              u.arguments.length == 2 && isVariantAt(u.arguments(1)) =>
          u.copy(arguments = Seq(u.arguments.head, rankKey(u.arguments(1))))
        // ResolveFunctions can win the race within one pass — rewrite
        // the RESOLVED ordering aggregate over VARIANT too
        case Max(e) if e.resolved && e.dataType == VariantType =>
          MaxBy(e, rankKey(e))
        case Min(e) if e.resolved && e.dataType == VariantType =>
          MinBy(e, rankKey(e))
        // databend array_sort(arr, 'ASC'|'DESC' [, 'NULLS FIRST'...])
        // (array.rs array_sort): direction is a STRING, Spark's is a
        // comparator lambda — lower onto sort_array(arr, bool)
        case u: UnresolvedFunction
            if u.nameParts.length == 1 &&
              Set("array_sort", "sort_array")(u.nameParts.head.toLowerCase) &&
              u.arguments.length >= 2 && (u.arguments(1) match {
                case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
                    if s != null =>
                  Set("asc", "desc")(s.toString.toLowerCase)
                case _ => false
              }) =>
          val asc = Literal(u.arguments(1).asInstanceOf[Literal]
            .value.toString.equalsIgnoreCase("asc"))
          if (isVariantArray(u.arguments.head))
            sortVariantArray(u.arguments.head, asc)
          else UnresolvedFunction("sort_array",
            Seq(u.arguments.head, asc), isDistinct = false)
        // sort_array over array<variant>: Spark rejects variant
        // ordering — decorate with the rank key
        case SortArray(arr, asc) if isVariantArray(arr) =>
          sortVariantArray(arr, asc)
        // `variant || x` is jsonb concatenation in the reference, not
        // string concat; `variant - x` is jsonb deletion. Implicit
        // casts may already have hidden the variant operand — unwrap.
        case u: UnresolvedFunction
            if u.nameParts.length == 1 &&
              u.nameParts.head.equalsIgnoreCase("concat") &&
              u.arguments.length == 2 && u.arguments.forall(_.resolved) &&
              u.arguments.exists(a => unwrapToVariant(a).isDefined) =>
          UnresolvedFunction("json_concat_impl",
            u.arguments.map(a => JsonTextDispatch(unwrapToVariant(a).getOrElse(a))),
            isDistinct = false)
        case c: Concat
            if c.children.length == 2 && c.children.forall(_.resolved) &&
              c.children.exists(a => unwrapToVariant(a).isDefined) =>
          UnresolvedFunction("json_concat_impl",
            c.children.map(a => JsonTextDispatch(unwrapToVariant(a).getOrElse(a))),
            isDistinct = false)
        case s @ Subtract(l, r, _)
            if l.resolved && r.resolved && l.dataType == VariantType =>
          val jl = JsonTextDispatch(l)
          val rhs = unwrapVariantWrap(r)
          rhs.dataType match {
            case NullType => Literal(null, StringType)
            case StringType =>
              UnresolvedFunction("json_minus_str_impl",
                Seq(jl, rhs), isDistinct = false)
            case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
              UnresolvedFunction("json_minus_int_impl",
                Seq(jl, Cast(rhs, IntegerType)), isDistinct = false)
            case VariantType =>
              UnresolvedFunction("json_minus_str_impl",
                Seq(jl, Cast(rhs, StringType)), isDistinct = false)
            case _ => s
          }
        // array functions accept VARIANT arrays in the reference
        // (array.rs auto-casts jsonb arrays). ResolveFunctions builds
        // the concrete expression before we can see the name, so match
        // the RESOLVED nodes: lift variant array operands to
        // array<variant> and scalar item operands to variant.
        // native array_except/array_intersect are MULTISET ops in the
        // reference (array.rs: duplicates in `a` survive); Spark's
        // builtins deduplicate — lower onto filter/exists
        // the reference spells array_prepend(element, array); Spark's
        // builtin wants (array, element)
        case ArrayPrepend(l, r)
            if l.resolved && r.resolved &&
              !l.dataType.isInstanceOf[ArrayType] &&
              l.dataType != VariantType &&
              r.dataType.isInstanceOf[ArrayType] =>
          ArrayPrepend(r, l)
        case ArrayExcept(l, r)
            if l.resolved && r.resolved &&
              l.dataType != VariantType && r.dataType != VariantType =>
          bagArrayOp("jarr_except", l, r)
        case ArrayIntersect(l, r)
            if l.resolved && r.resolved &&
              l.dataType != VariantType && r.dataType != VariantType =>
          bagArrayOp("jarr_intersect", l, r)
        case e: Expression
            if GraftCoercionRule.variantArrayClasses(e.getClass.getSimpleName) &&
              e.children.nonEmpty && e.children.forall(_.resolved) &&
              e.children.exists(_.dataType == VariantType) =>
          def toArr(c: Expression) = UnresolvedFunction("try_variant_get",
            Seq(c, Literal("$"), Literal("array<variant>")), isDistinct = false)
          def jtext(c: Expression) =
            if (c.dataType == VariantType) JsonTextDispatch(c)
            else JsonTextDispatch(
              UnresolvedFunction("to_variant", Seq(c), isDistinct = false))
          def fv(name: String, args: Expression*) = UnresolvedFunction(
            "parse_json", Seq(UnresolvedFunction(name, args.toSeq,
              isDistinct = false)), isDistinct = false)
          def fb(name: String, args: Expression*) =
            UnresolvedFunction(name, args.toSeq, isDistinct = false)
          val cs = e.children
          e.getClass.getSimpleName match {
            case "ArrayDistinct" => fv("jarr_distinct", jtext(cs.head))
            case "ArrayCompact" => fv("jarr_compact", jtext(cs.head))
            case "Flatten" => fv("jarr_flatten", jtext(cs.head))
            case "ArrayExcept" => fv("jarr_except", jtext(cs.head), jtext(cs(1)))
            case "ArrayIntersect" => fv("jarr_intersect", jtext(cs.head), jtext(cs(1)))
            case "ArrayUnion" => fv("jarr_union", jtext(cs.head), jtext(cs(1)))
            case "ArraysOverlap" => fb("jarr_overlap", jtext(cs.head), jtext(cs(1)))
            case "ArrayContains" => fb("jarr_contains", jtext(cs.head), jtext(cs(1)))
            case "ArrayRemove" => fv("jarr_remove", jtext(cs.head), jtext(cs(1)))
            case "ArrayInsert" =>
              fv("jarr_insert", jtext(cs.head), Cast(cs(1), IntegerType), jtext(cs(2)))
            case "Slice" =>
              fv("jarr_slice", jtext(cs.head), Cast(cs(1), IntegerType),
                Cast(cs(2), IntegerType))
            case "ArrayMax" => fv("jarr_max", jtext(cs.head))
            case "ArrayMin" => fv("jarr_min", jtext(cs.head))
            case "Size" => fb("jarr_size", jtext(cs.head))
            case "Reverse" => fv("jarr_reverse", jtext(cs.head))
            case "ArrayAppend" =>
              fv("jarr_insert", jtext(cs.head),
                Literal(Int.MaxValue), jtext(cs(1)))
            case "ArrayPrepend" =>
              // the reference spells array_prepend(element, array) —
              // whichever operand is the variant is the array
              val (arr0, item0) =
                if (cs.head.dataType == VariantType) (cs.head, cs(1))
                else (cs(1), cs.head)
              fv("jarr_insert", jtext(arr0), Literal(0), jtext(item0))
            // sort/explode keep the native path over array<variant>
            case _ => e.withNewChildren(cs.map(c =>
              if (c.dataType == VariantType) toArr(c) else c))
          }
        // heterogeneous array/map literals build VARIANT collections
        // in the reference ([true, 1, 'x'] — jsonb values); Spark's
        // array()/map() demand one common type, so lift elements to
        // variant exactly when common-type resolution fails
        case ca: CreateArray
            if ca.children.nonEmpty && ca.children.forall(_.resolved) &&
              !ca.children.exists(_.dataType == VariantType) &&
              ca.checkInputDataTypes().isFailure =>
          CreateArray(ca.children.map(c =>
            UnresolvedFunction("to_variant", Seq(c), isDistinct = false)))
        case cm: CreateMap
            if cm.children.nonEmpty && cm.children.forall(_.resolved) &&
              cm.children.length % 2 == 0 &&
              !cm.values.exists(_.dataType == VariantType) &&
              cm.checkInputDataTypes().isFailure =>
          CreateMap(cm.children.grouped(2).flatMap {
            case Seq(k, v) => Seq(
              Cast(k, StringType),
              UnresolvedFunction("to_variant", Seq(v), isDistinct = false))
            case other => other
          }.toSeq)
        // multi-column approx_count_distinct (the reference hashes the
        // tuple); Spark's 2nd parameter slot is rsd, so pack columns
        // into a struct
        case u: UnresolvedFunction
            if u.nameParts.length == 1 &&
              u.nameParts.head.equalsIgnoreCase("approx_count_distinct") &&
              u.arguments.length > 1 && u.arguments.forall(_.resolved) &&
              !(u.arguments.length == 2 &&
                u.arguments(1).dataType.isInstanceOf[DoubleType]) =>
          u.copy(arguments = Seq(CreateStruct(u.arguments)))
        // bare-keyword unit/weekday args (databend grammar:
        // `date_trunc(week, x)`, `previous_day(d, monday)`) arrive as
        // UnresolvedAttribute and would block function resolution
        // (ResolveFunctions needs childrenResolved) — literalize them
        // so the registered builders see strings
        case u: UnresolvedFunction
            if u.nameParts.length == 1 &&
              GraftCoercionRule.unitArgFns.contains(u.nameParts.head.toLowerCase) &&
              u.arguments.exists {
                case UnresolvedAttribute(Seq(p)) =>
                  GraftCoercionRule.unitWords.contains(p.toLowerCase)
                case _ => false
              } =>
          u.copy(arguments = u.arguments.map {
            case UnresolvedAttribute(Seq(p))
                if GraftCoercionRule.unitWords.contains(p.toLowerCase) =>
              Literal(p.toLowerCase)
            case other => other
          })
        case GetMarker(l, r) if l.resolved && r.resolved =>
          l.dataType match {
            case _: ArrayType =>
              // reference array get is 1-based; index 0 yields NULL
              UnresolvedFunction("try_element_at",
                Seq(l, UnresolvedFunction("nullif", Seq(r, Literal(0)),
                  isDistinct = false)), isDistinct = false)
            case _: MapType =>
              UnresolvedFunction("try_element_at", Seq(l, r), isDistinct = false)
            case _ => VariantGetDyn(l, r, asText = false)
          }
        case UnresolvedExtractValue(c, k) if isVariantish(c) && k.resolved =>
          VariantGetDyn(c, k, asText = false)
        // `'...'::json` parses in the reference (variant.rs cast);
        // Spark's string→variant cast wraps the text as a variant
        // string scalar instead. USER casts only: an ANALYZER-inserted
        // string→variant cast is comparison lifting, where the
        // reference wraps the string as a variant string scalar
        // (parse_json('"ab"') = 'ab' is true) — exactly Spark's native
        // cast, so it passes through. (DML variant columns parse
        // explicitly in GraftSql.alignCast.)
        case c0 @ Cast(child, VariantType, tz, mode) if child.resolved &&
            child.dataType == StringType &&
            (c0.getTagValue(Cast.USER_SPECIFIED_CAST).isDefined ||
             c0.getTagValue(Cast.BY_TABLE_INSERTION).isDefined) =>
          UnresolvedFunction("parse_json", Seq(child), isDistinct = false)
        case And(l, r) if isNum(l) => And(truthy(l), r)
        case And(l, r) if isNum(r) => And(l, truthy(r))
        case Or(l, r) if isNum(l) => Or(truthy(l), r)
        case Or(l, r) if isNum(r) => Or(l, truthy(r))
        case Not(c) if isNum(c) => Not(truthy(c))
        // Spark rejects a NON-DETERMINISTIC aggregate FILTER
        // (`count(*) FILTER (WHERE length(uuid()) = 36)`); the
        // reference evaluates it per-row — equivalent CASE WHEN form
        case ae @ AggregateExpression(fn, _, isDistinct, Some(filt), _)
            if filt.resolved && !filt.deterministic &&
              fn.children.length == 1 && !isDistinct =>
          ae.copy(aggregateFunction = fn.withNewChildren(Seq(
            CaseWhen(Seq(filt -> fn.children.head), None)))
            .asInstanceOf[AggregateFunction],
            filter = None)
        // VARIANT comparison (reference jsonb type-then-value compare,
        // variant.rs register_comparison): both sides lower onto the
        // order-preserving rank key; a non-variant side lifts through
        // to_variant first (parse_json('2') > 1 is true; variants of
        // different jsonb types order by type rank)
        case cmp: BinaryComparison
            if cmp.left.resolved && cmp.right.resolved &&
              (cmp.left.dataType == VariantType ||
               cmp.right.dataType == VariantType) &&
              Seq(cmp.left, cmp.right).forall(e => e.dataType match {
                case VariantType | StringType | BooleanType | NullType => true
                case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
                     _: FloatType | _: DoubleType | _: DecimalType => true
                case _ => false
              }) =>
          def key(e: Expression): Expression = {
            val txt = e.dataType match {
              case VariantType => JsonTextDispatch(e)
              // plain string lifts to a variant STRING scalar — its
              // json text is the QUOTED form (to_variant would
              // parse_json and reject non-json text)
              case StringType =>
                UnresolvedFunction("json_quote_str", Seq(e), isDistinct = false)
              // numbers/bools/null: the cast text IS the json text
              case _ => Cast(e, StringType)
            }
            UnresolvedFunction("variant_rank_key", Seq(txt), isDistinct = false)
          }
          cmp.withNewChildren(Seq(key(cmp.left), key(cmp.right)))
        // numeric vs BOOLEAN comparison: the reference converts the
        // NUMBER to a boolean (nonzero test) and compares booleans —
        // `10 = true` is true, `number = true` matches every nonzero
        // row (02_0005_function_compare) — not MySQL's bool-to-1 cast.
        // deCast: TypeCoercion may win the in-batch race and hide the
        // string/bool side under an implicit cast — unwrap it (user
        // casts carry USER_SPECIFIED_CAST and stay).
        case cmp0: BinaryComparison
            if cmp0.left.resolved && cmp0.right.resolved && {
              val (l, r) = (deCast(cmp0.left), deCast(cmp0.right))
              (isBool(l) && isNum(r)) || (isNum(l) && isBool(r)) ||
                (isNum(l) && isStr(r)) || (isStr(l) && isNum(r))
            } =>
          val cmp = cmp0.withNewChildren(
            Seq(deCast(cmp0.left), deCast(cmp0.right)))
            .asInstanceOf[BinaryComparison]
          def integral(e: Expression) = e.dataType match {
            case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
            case _ => false
          }
          // STRING vs numeric: the reference compares numerically as
          // float64 ('3.0' = 3 true, '3.1' = 3 false); an integral
          // literal against an integral side keeps the exact
          // (pushdown-friendly) typed-literal form
          def fix(s: Expression, other: Expression): Expression = s match {
            case Literal(v, StringType) if v != null && integral(other) &&
                scala.util.Try(v.toString.trim.toLong).isSuccess =>
              Literal(v.toString.trim.toLong)
            case _ => Cast(s, DoubleType)
          }
          (cmp.left, cmp.right) match {
            case (l, r) if isBool(l) && isNum(r) =>
              cmp.withNewChildren(Seq(l, truthy(r)))
            case (l, r) if isNum(l) && isBool(r) =>
              cmp.withNewChildren(Seq(truthy(l), r))
            case (l, r) if isStr(l) =>
              cmp.withNewChildren(Seq(fix(l, r), r))
            case (l, r) =>
              cmp.withNewChildren(Seq(l, fix(r, l)))
          }
        // VARIANT input to LIKE: complex patterns traverse nested
        // string values, simple ones match a string scalar's unquoted
        // text (comparison.rs variant like — see [[VariantLike]])
        case lk: Like
            if lk.left.resolved && unwrapToVariant(lk.left).isDefined =>
          UnresolvedFunction("variant_like_impl",
            Seq(JsonTextDispatch(unwrapToVariant(lk.left).get), lk.right,
              Literal(lk.escapeChar.toString)), isDistinct = false)
        // BINARY -> STRING casts dispatch through the display helper so
        // a roaring-bitmap payload renders as its value list (the
        // reference's bitmap::string); plain utf8 bytes are unchanged
        case c0 @ Cast(child, StringType, _, mode)
            if mode != EvalMode.TRY && child.resolved &&
              child.dataType == BinaryType &&
              !child.isInstanceOf[ToStringDispatch] =>
          ToStringDispatch(child)
        // lag/lead DEFAULT coerces to the value type in the reference
        // (Spark demands an exact match: lag(arr, 8, [123]) rejects)
        case l @ Lag(in, off, d, ig)
            if in.resolved && d.resolved && d.dataType != in.dataType &&
              d.dataType != NullType &&
              Cast.canCast(d.dataType, in.dataType) =>
          Lag(in, off, Cast(d, in.dataType), ig)
        case l @ Lead(in, off, d, ig)
            if in.resolved && d.resolved && d.dataType != in.dataType &&
              d.dataType != NullType &&
              Cast.canCast(d.dataType, in.dataType) =>
          Lead(in, off, Cast(d, in.dataType), ig)
        // databend length()/size over containers and VARIANT arrays
        // (array.rs length; Spark's Length is string/binary-only)
        case Length(c) if c.resolved &&
            (c.dataType.isInstanceOf[ArrayType] ||
             c.dataType.isInstanceOf[MapType]) =>
          Size(c)
        case Length(c) if c.resolved && c.dataType == VariantType =>
          UnresolvedFunction("jarr_size", Seq(JsonTextDispatch(c)),
            isDistinct = false)
        // sum/avg over VARIANT: jsonb numbers aggregate as float64
        case s: org.apache.spark.sql.catalyst.expressions.aggregate.Sum
            if s.child.resolved && s.child.dataType == VariantType =>
          s.withNewChildren(Seq(Cast(s.child, DoubleType)))
            .asInstanceOf[Expression]
        case a: org.apache.spark.sql.catalyst.expressions.aggregate.Average
            if a.child.resolved && a.child.dataType == VariantType =>
          a.withNewChildren(Seq(Cast(a.child, DoubleType)))
            .asInstanceOf[Expression]
        // VARIANT operand in arithmetic: the reference runs jsonb
        // numbers as float64 (parse_json('1') + 1 = 2)
        case ba: BinaryArithmetic
            if ba.left.resolved && ba.right.resolved &&
              (ba.left.dataType == VariantType ||
               ba.right.dataType == VariantType) &&
              Seq(ba.left, ba.right).forall(e => e.dataType match {
                case VariantType | _: ByteType | _: ShortType |
                     _: IntegerType | _: LongType | _: FloatType |
                     _: DoubleType | _: DecimalType => true
                case _ => false
              }) =>
          ba.withNewChildren(Seq(ba.left, ba.right).map(e =>
            if (e.dataType == VariantType) Cast(e, DoubleType) else e))
        // databend's contains() over ARRAY/MAP is membership (array.rs
        // contains); Spark's builtin is string-only and ResolveFunctions
        // may already have built it with an implicit string cast on the
        // probe side
        case c @ Contains(l, r)
            if l.resolved && l.dataType.isInstanceOf[ArrayType] =>
          // unwrap the implicit to-string cast ResolveFunctions put on
          // the probe side (user casts stay)
          val probe = r match {
            case c2 @ Cast(ch, _, _, mode)
                if mode != EvalMode.TRY &&
                  c2.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty &&
                  ch.resolved => ch
            case other => other
          }
          ArrayContains(l, probe)
        case u: UnresolvedFunction
            if u.nameParts.length == 1 &&
              u.nameParts.head.equalsIgnoreCase("contains") &&
              u.arguments.length == 2 && u.arguments.head.resolved &&
              (u.arguments.head.dataType.isInstanceOf[ArrayType] ||
               u.arguments.head.dataType.isInstanceOf[MapType]) =>
          if (u.arguments.head.dataType.isInstanceOf[ArrayType])
            ArrayContains(u.arguments.head, u.arguments(1))
          else UnresolvedFunction("map_contains_key",
            u.arguments, isDistinct = false)
        // LIKE whose literal pattern escapes a char Spark rejects
        // (escape before anything but % _ or the escape itself): the
        // reference treats esc+ANY as that literal char — lower onto
        // an equivalent anchored regex
        case lk @ Like(l, Literal(p, StringType), esc)
            if p != null && {
              val s = p.toString
              var i = 0; var bad = false
              while (i < s.length - 1) {
                if (s.charAt(i) == esc) {
                  val n = s.charAt(i + 1)
                  if (n != '%' && n != '_' && n != esc) bad = true
                  i += 2
                } else i += 1
              }
              bad
            } =>
          RLike(l, Literal(likeToRegex(p.toString, esc)))
      }
    }
  }
}
