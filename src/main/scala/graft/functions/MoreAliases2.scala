package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.udf

/** Round-4 second expansion of the databend-name surface: array
  * aggregates-as-scalars, JSON object editing, variant accessors,
  * variadic predicate sugar, and the remaining hash/vector names
  * (reference registry function_list.txt; family semantics from
  * src/query/functions/src/scalars/{array.rs,variant.rs,string.rs}).
  *
  * Same tiering as `MoreAliases`: bind-time Catalyst rewrites where a
  * Spark builtin expresses the semantics (codegen'd, zero cost), small
  * driver-registered UDFs for the genuinely-new scalars. JSON editing
  * UDFs run on the JSON text form (Jackson, already on Spark's
  * classpath) — the variant column type casts to/from string at the
  * boundary, matching the reference's jsonb in/out conversions.
  *
  * Round 6 closes the previously-skipped trio: running_difference is
  * a stateful Nondeterministic expression (RunningDifference.scala),
  * and is_interval/is_timestamp_tz dispatch on the string payload the
  * reference itself uses as the variant repr for those tiers.
  * The json_path_* family runs on the full SQL/JSON path
  * evaluator in JsonPath.scala (filters, index lists, `last`
  * arithmetic, wildcards) rather than get_json_object's dialect.
  */
object MoreAliases2 {

  private def f(name: String, as: Expression*): Expression =
    UnresolvedFunction(name, as.toSeq, isDistinct = false)
  private def cast(e: Expression, t: DataType): Expression = Cast(e, t)
  // json text, json-null-preserving (variant null -> the text "null",
  // not SQL NULL; see JsonTextDispatch)
  private def jstr(e: Expression): Expression = JsonTextDispatch(e)

  /** DFHash byte encoding with the reference's literal typing: an int
    * literal hashes at its narrowest width (u8/u16/u32/u64 when >=0,
    * i8/i16/i32/i64 below; Spark types every int literal INT so the
    * width must be recovered here), a fractional literal as Float64
    * bits. Columns encode by their declared type (DfHashEncode).
    */
  private def henc(e: Expression): Expression = e match {
    case Literal(null, _) => Literal(null, BinaryType)
    case Literal(v: Int, IntegerType) => narrowIntBytes(v.toLong)
    case Literal(v: Long, LongType) => narrowIntBytes(v)
    case Literal(d: Decimal, _: DecimalType) if d.scale <= 0 =>
      narrowIntBytes(d.toLong)
    case other => DfHashEncode(other)
  }

  private def narrowIntBytes(v: Long): Expression = {
    val n =
      if (v >= 0) { if (v < 256L) 1 else if (v < 65536L) 2
        else if (v < 4294967296L) 4 else 8 }
      else { if (v >= -128L) 1 else if (v >= -32768L) 2
        else if (v >= -2147483648L) 4 else 8 }
    Literal(Array.tabulate[Byte](n)(i => ((v >>> (8 * i)) & 0xff).toByte),
      BinaryType)
  }

  /** u64-returning hash: impl gives the unsigned digits as a string,
    * surfaced as DECIMAL(20,0) — the engine's u64 convention.
    */
  private def uhash(impl: String, arg: Expression): Expression =
    cast(f(impl, henc(arg)), DecimalType(20, 0))

  private def lambda1(body: NamedExpression => Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    LambdaFunction(body(x), Seq(x))
  }
  private def lambda2(body: (NamedExpression, NamedExpression) => Expression): Expression = {
    val k = UnresolvedNamedLambdaVariable(Seq("k"))
    val v = UnresolvedNamedLambdaVariable(Seq("v"))
    LambdaFunction(body(k, v), Seq(k, v))
  }

  /** rewrite names whose expansion calls a session-registered `_impl`
    * UDF — unusable from the code-free extensions injection path
    */
  def udfBacked(name: String): Boolean =
    Set("json_object_delete", "object_delete", "json_object_pick",
      "object_pick", "json_object_insert", "object_insert",
      "json_strip_nulls", "strip_null_value", "json_pretty",
      "json_contains_in_right", "json_contains_in_left",
      "delete_by_keypath", "xxhash32",
      "as_timestamp_tz", "is_timestamp_tz",
      "to_uuid", "siphash", "siphash64", "xxhash64", "city64withseed", "blake3",
      "json_path_query", "json_path_query_array", "json_path_query_first",
      "json_path_exists", "json_path_match")(name)

  val rewrites: Map[String, Seq[Expression] => Expression] = Map[String, Seq[Expression] => Expression](
    // variadic boolean sugar (reference and_filters/or_filters) —
    // FILTER semantics: a NULL operand counts as false (the reference
    // returns false, not NULL, for or_filters(false, false, null))
    "and_filters" -> (a => a.map(x =>
      Coalesce(Seq(cast(x, BooleanType), Literal(false))): Expression)
      .reduce(And(_, _))),
    "or_filters" -> (a => a.map(x =>
      Coalesce(Seq(cast(x, BooleanType), Literal(false))): Expression)
      .reduce(Or(_, _))),

    // benchmark sink: evaluates to constant FALSE whatever the args
    // (reference scalars/other.rs:199-215 FunctionFactory "ignore")
    "ignore" -> (_ => Literal(false)),

    // ClickHouse-style per-block running difference
    // (reference scalars/other.rs:330-380); block == partition here
    "running_difference" -> (a => RunningDifference(a.head)),

    // array "any" aggregate = first non-NULL element (reference
    // scalars/array.rs:97 maps array_any -> the ANY aggregate)
    "array_any" -> (a =>
      f("element_at", f("filter", a.head, lambda1(x => IsNotNull(x))), Literal(1))),

    // variant accessors for the INTERVAL / TIMESTAMP_TZ tiers
    // (reference scalars/variant.rs:859-957). The variant payload for
    // both is their string repr (02_0056_function_semi_structureds_as
    // .test:77-94), so accessor == parse-from-string here.
    "as_interval" -> (a => Cast(
      f("try_variant_get", a.head, Literal("$"), Literal("string")),
      CalendarIntervalType, None, EvalMode.TRY)),
    "is_interval" -> (a => If(IsNull(a.head), Literal(null, BooleanType),
      IsNotNull(Cast(
        f("try_variant_get", a.head, Literal("$"), Literal("string")),
        CalendarIntervalType, None, EvalMode.TRY)))),
    // tz::variant here is the struct's object form {us, offset_minutes}
    // (TimestampTz.scala model); a string payload with an explicit
    // offset is accepted too (the reference's own variant repr)
    "as_timestamp_tz" -> (a => {
      val us = Cast(f("try_variant_get", a.head, Literal("$.us"), Literal("bigint")), LongType)
      val om = Cast(f("try_variant_get", a.head, Literal("$.offset_minutes"), Literal("int")), IntegerType)
      If(And(IsNotNull(us), IsNotNull(om)),
        CreateNamedStruct(Seq(Literal("us"), us, Literal("offset_minutes"), om)),
        f("try_to_timestamp_tz", f("try_variant_get", a.head, Literal("$"), Literal("string"))))
    }),
    "is_timestamp_tz" -> (a => If(IsNull(a.head), Literal(null, BooleanType), {
      val us = f("try_variant_get", a.head, Literal("$.us"), Literal("bigint"))
      val om = f("try_variant_get", a.head, Literal("$.offset_minutes"), Literal("int"))
      val s = f("try_variant_get", a.head, Literal("$"), Literal("string"))
      Or(And(IsNotNull(us), IsNotNull(om)),
        And(
          // an explicit numeric offset is what makes it tz (not a bare ts)
          f("rlike", s, Literal("[+-][0-9]{2}:?[0-9]{2}\\s*$")),
          IsNotNull(f("try_to_timestamp_tz", s))))
    })),

    // array constructors / set-cardinality
    // the reference's array_construct returns a VARIANT array — each
    // element goes through to_variant so mixed types build and render
    // json-style ([1,"a"])
    "array_construct" -> (a =>
      if (a.isEmpty) f("parse_json", Literal("[]"))
      else f("parse_json", f("to_json",
        CreateArray(a.map(v => f("to_variant", v)))))),
    "array_approx_count_distinct" -> (a =>
      cast(Size(f("array_distinct", a.head)), LongType)),

    // scalar generate_series = sequence (the TVF form lives in
    // operators.TableFunctions)
    "generate_series" -> (a => f("sequence", a: _*)),

    "tuple" -> (a => CreateStruct(a)),

    // variadic LIKE families (ilike itself is Spark-native)
    "like_any" -> (a => a.tail.map[Expression](p => f("like", a.head, p)).reduce(Or(_, _))),
    "ilike_any" -> (a => a.tail.map[Expression](p =>
      f("like", f("lower", a.head), f("lower", p))).reduce(Or(_, _))),

    // SQL single-quote escaping (reference string.rs quote)
    "quote" -> (a => f("replace", f("replace", a.head,
      Literal("\\"), Literal("\\\\")), Literal("'"), Literal("\\'"))),

    // decimal/number/interval casts (factory: optional precision/scale)
    "to_decimal" -> (a => castDecimal(a, EvalMode.LEGACY)),
    "try_to_decimal" -> (a => castDecimal(a, EvalMode.TRY)),
    // MoreAliases.builtinFn, NOT f: these bodies call their own
    // registered name (f would resolve back into this builder forever)
    "to_number" -> (a =>
      if (a.length >= 2) MoreAliases.builtinFn("to_number", a: _*)
      else cast(a.head, DecimalType(38, 10))),
    "try_to_number" -> (a =>
      if (a.length >= 2) MoreAliases.builtinFn("try_to_number", a: _*)
      else Cast(a.head, DecimalType(38, 10), None, EvalMode.TRY)),
    "to_interval" -> (a => cast(a.head, CalendarIntervalType)),
    "try_to_interval" -> (a => Cast(a.head, CalendarIntervalType, None, EvalMode.TRY)),

    // variant accessors (Spark 4 native VARIANT); a SQL NULL input
    // yields SQL NULL (variant.rs to_variant), not a json-null variant
    "to_variant" -> (a => CaseWhen(
      Seq((IsNull(a.head), Literal.create(null, VariantType))),
      // ToVariantJsonText, not plain to_json: a roaring-bitmap BINARY
      // becomes its value array (reference bitmap->variant cast)
      f("variant_get", f("parse_json", ToVariantJsonText(a.head)),
        Literal("$[0]"), Literal("variant")))),
    "as_object" -> (a => CaseWhen(Seq((
      f("startswith", f("schema_of_variant", a.head), Literal("OBJECT")),
      a.head)), None)),
    "as_binary" -> (a => cast(
      f("try_variant_get", a.head, Literal("$"), Literal("string")), BinaryType)),
    "as_decimal" -> (a =>
      f("try_variant_get", a.head, Literal("$"),
        Literal(if (a.length >= 3) s"decimal(${lit(a(1))},${lit(a(2))})" else "decimal(38,10)"))),
    "to_jsonb_binary" -> (a => cast(jstr(a.head), BinaryType)),
    // 1-arg to_binary is UTF-8 bytes in the reference (binary.rs),
    // not Spark's hex default; explicit-format form keeps the builtin
    "to_binary" -> (a =>
      if (a.length >= 2) MoreAliases.builtinFn("to_binary", a: _*)
      else ToBinaryDispatch(a.head)),
    "try_to_binary" -> (a =>
      if (a.length >= 2) MoreAliases.builtinFn("try_to_binary", a: _*)
      else ToBinaryDispatch(a.head)),
    "strip_null_value" -> (a => f("json_strip_nulls_impl", jstr(a.head))),
    "is_not_error" -> (a => IsNotNull(a.head)),
    // the TRY-tier error predicates (reference expression.rs): a
    // TRY-evaluated error surfaces as NULL here, so error-ness tests
    // lower onto null tests and error_or onto coalesce
    "is_error" -> (a => IsNull(a.head)),
    "error_or" -> (a => Coalesce(a)),

    // SQL/JSON path family on the full evaluator (JsonPath.scala):
    // member / wildcard / subscript-list / `last` arithmetic / filter
    // dialect per the reference's 02_0051 slt corpus; the *_match
    // predicate grammar (`$.a == 1`) per variant.txt:4864-4903.
    // json_path_query is the SRF form: one row per match, as VARIANT.
    "json_path_query" -> (a => Explode(f("transform",
      f("json_path_query_impl", jstr(a.head), jstr(a(1))),
      lambda1(x => f("try_parse_json", x))))),
    "json_path_query_array" -> (a => f("try_parse_json",
      f("concat", Literal("["),
        f("array_join",
          f("json_path_query_impl", jstr(a.head), jstr(a(1))), Literal(",")),
        Literal("]")))),
    "json_path_query_first" -> (a => f("try_parse_json",
      f("try_element_at", f("json_path_query_impl", jstr(a.head), jstr(a(1))), Literal(1)))),
    "json_path_exists" -> (a => GreaterThan(
      f("size", f("json_path_query_impl", jstr(a.head), jstr(a(1)))),
      Literal(0))),
    "json_path_match" -> (a =>
      f("json_path_match_impl", jstr(a.head), jstr(a(1)))),

    // set-returning JSON/regexp helpers expressed through explode
    // json_each: (key, value) rows of an object's fields, value kept
    // as VARIANT (reference variant.rs json_each SRF)
    // one (key, value) TUPLE column per field (reference renders
    // ("a",1) rows); the FROM-position form (two columns) is a
    // GraftSql table-factor rewrite
    "json_each" -> (a => Explode(f("map_entries",
      f("from_json", jstr(a.head), Literal("map<string,variant>"))))),

    // time_slice(ts, n, unit[, 'START'|'END']) — Snowflake-compatible
    // epoch-aligned n-unit buckets (reference datetime time_slice)
    "time_slice" -> (a => {
      val n = lit(a(1)).toString.toInt
      require(n > 0, s"time_slice width must be positive, got $n")
      val unit = lit(a(2)).toString.toLowerCase
      val side = if (a.length >= 4) lit(a(3)).toString.toUpperCase else "START"
      require(side == "START" || side == "END",
        s"time_slice kind must be START|END, got $side")
      val secsOf = Map("second" -> 1L, "minute" -> 60L, "hour" -> 3600L,
        "day" -> 86400L, "week" -> 604800L)
      if (secsOf.contains(unit)) {
        val w = secsOf(unit) * n
        // week slices anchor at 1969-12-29, the Monday BEFORE epoch
        // (Snowflake semantics, verified against the reference's
        // 02_0083_function_time_slice vectors); every other unit
        // anchors at the epoch itself
        val off = if (unit == "week") -3L * 86400L else 0L
        val b = Add(Multiply(cast(f("floor", Divide(
          Subtract(f("unix_seconds", cast(a.head, TimestampType)), Literal(off)),
          Literal(w.toDouble))), LongType), Literal(w)), Literal(off))
        f("timestamp_seconds", if (side == "START") b else Add(b, Literal(w)))
      } else {
        val monthsOf = Map("month" -> 1, "quarter" -> 3, "year" -> 12)
        require(monthsOf.contains(unit), s"time_slice unit '$unit' unsupported")
        val w = monthsOf(unit) * n
        // months since epoch, floored to the bucket
        val m = Add(Multiply(Subtract(f("year", a.head), Literal(1970)), Literal(12)),
          Subtract(f("month", a.head), Literal(1)))
        val b0 = Multiply(cast(f("floor", Divide(cast(m, DoubleType),
          Literal(w.toDouble))), IntegerType), Literal(w))
        val b = if (side == "START") b0 else Add(b0, Literal(w))
        cast(f("add_months", Literal(java.sql.Date.valueOf("1970-01-01")), b),
          TimestampType)
      }
    }),

    // SipHash-1-3 with a zero key over the value's DFHash bytes —
    // reference hash.rs siphash64 (siphasher::SipHasher13, keys 0,0;
    // strings hash raw UTF-8 bytes, integers fixed-width LE, floats
    // their bit pattern). u64 results surface as DECIMAL(20,0), the
    // engine's unsigned-64 convention. Goldens: the reference's own
    // 02_0009_function_hashes suite, bit-exact.
    "siphash64" -> (a => uhash("siphash64_impl", a.head)),
    "siphash" -> (a => uhash("siphash64_impl", a.head)),

    // XXH64 seed 0 over DFHash bytes (reference hash.rs xxhash64 via
    // twox-hash XxHash64::default) — NOT Spark's xxhash64 (seed 42,
    // different per-type protocol); internal operators that only need
    // a fast partitioner keep the codegen'd Spark builtin under the
    // xxh64_long spelling.
    // 1-arg only: the reference's xxhash64 is unary. Spark 4 routes
    // the scala-dsl functions.xxhash64(cols*) through the registry
    // (Column.fn), so multi-arg calls MUST fall back to the builtin —
    // the override once silently dropped RandomTable's seed argument.
    "xxhash64" -> (a =>
      if (a.length == 1) uhash("xxhash64_impl", a.head)
      else new XxHash64(a)),
    // internal spelling of Spark's builtin xxhash64 (seed 42): a fast
    // codegen'd partitioner for minhash/LSH internals, unaffected by
    // the databend-exact xxhash64 override above
    "xxh64_long" -> (a => new XxHash64(a)),

    // CityHash64 v1.0.2 with seed — the reference's city64withseed
    // (hash.rs:444 via naive-cityhash, the ClickHouse-compatible
    // CityHash revision), over DFHash bytes, u64-rendered. Seed is
    // any numeric (truncating cast, matching the reference's
    // 256.3 -> 256 golden).
    "city64withseed" -> (a =>
      cast(f("city64withseed_impl", henc(a.head), cast(a(1), LongType)),
        DecimalType(20, 0))),

    // BLAKE3 256-bit hex (functions/Blake3.scala; reference hash.rs
    // blake3, goldens hash.txt:81-109 + official test vectors)
    "blake3" -> (a => f("blake3_impl", jstr(a.head))),

    "json_array_elements" -> (a => Explode(
      f("try_variant_get", a.head, Literal("$"), Literal("array<variant>")))),
    "regexp_split_to_table" -> (a => Explode(PgRegexpSplit(a.head, a(1),
      if (a.length >= 3) a(2) else Literal("")))),

    // map edits via map_filter lambdas (codegen'd, no UDF)
    // the key list is either variadic scalars or ONE array argument
    // (map.rs map_pick/map_delete accept both spellings)
    "map_pick" -> (a => f("map_filter", a.head,
      lambda2((k, v) => KeyInList(MapKeysArg(a.tail), k)))),
    "map_delete" -> (a => f("map_filter", a.head,
      lambda2((k, v) => Not(KeyInList(MapKeysArg(a.tail), k))))),

    // vectors
    "vector_dims" -> (a => Size(a.head)),
    "vector_norm" -> (a => f("sqrt", f("aggregate", a.head, Literal(0.0),
      lambda2((acc, x) => Add(acc, Multiply(cast(x, DoubleType), cast(x, DoubleType))))))),

    // JSON object edits: public names pack variadic keys into the
    // Jackson _impl UDFs; object_* spellings share them
    "json_object_delete" -> (a =>
      f("json_object_delete_impl", jstr(a.head), CreateArray(a.tail.map(jstr)))),
    "object_delete" -> (a =>
      f("json_object_delete_impl", jstr(a.head), CreateArray(a.tail.map(jstr)))),
    "json_object_pick" -> (a =>
      f("json_object_pick_impl", jstr(a.head), CreateArray(a.tail.map(jstr)))),
    "object_pick" -> (a =>
      f("json_object_pick_impl", jstr(a.head), CreateArray(a.tail.map(jstr)))),
    "json_object_insert" -> (a =>
      f("json_object_insert_impl", jstr(a.head), jstr(a(1)), jstr(a(2)),
        if (a.length >= 4) cast(a(3), BooleanType) else Literal(false))),
    "object_insert" -> (a =>
      f("json_object_insert_impl", jstr(a.head), jstr(a(1)), jstr(a(2)),
        if (a.length >= 4) cast(a(3), BooleanType) else Literal(false))),
    "json_strip_nulls" -> (a => f("json_strip_nulls_impl", jstr(a.head))),
    // databend json_typeof names (jsonb type_of): NULL_VALUE/BOOLEAN/
    // STRING/INTEGER/DECIMAL/DOUBLE/ARRAY/OBJECT, classified from the
    // canonical json text (int syntax / '.' form / exponent form)
    "json_typeof" -> (a => f("json_typeof_impl", jstr(a.head))),
    "json_pretty" -> (a => f("json_pretty_impl", jstr(a.head))),
    "json_contains_in_right" -> (a =>
      f("json_contains_in_right_impl", jstr(a.head), jstr(a(1)))),
    "json_contains_in_left" -> (a =>
      f("json_contains_in_right_impl", jstr(a(1)), jstr(a.head))),
    // get_ignore_case lives in GraftFunctions (VariantGetDyn: exact
    // match wins before the case-insensitive scan, VARIANT output)
    "delete_by_keypath" -> (a => f("delete_by_keypath_impl", jstr(a.head), a(1))),
    "xxhash32" -> (a => f("xxhash32_impl", jstr(a.head))),
    "to_uuid" -> (a => f("to_uuid_impl", jstr(a.head))))

  private def lit(e: Expression): Any = e match {
    case Literal(v, _) => v
    case other => throw new IllegalArgumentException(s"literal expected, got $other")
  }

  private def castDecimal(a: Seq[Expression], mode: EvalMode.Value): Expression = {
    val t = if (a.length >= 3)
      DecimalType(lit(a(1)).toString.toInt, lit(a(2)).toString.toInt)
    else if (a.length == 2) DecimalType(lit(a(1)).toString.toInt, 0)
    else DecimalType(38, 10)
    Cast(a.head, t, None, mode)
  }

  // ---- UDF tier -------------------------------------------------------

  /** jsonb ?/?|/?& membership: key in an object, string element in an
    * array (object-level so udf closures stay serializable)
    */
  private def jsonHas(j: String, k: String): Boolean = parse(j) match {
    case o: ObjectNode => o.has(k)
    case a: ArrayNode =>
      var found = false
      val it = a.elements()
      while (it.hasNext && !found) {
        val e = it.next()
        if (e.isTextual && e.asText == k) found = true
      }
      found
    case _ => false
  }

  // ---- variant-array helpers (object-level: udf closures referencing
  // method-local defs capture a non-serializable frame) ---------------
  private def jarr(j: String): ArrayNode = parse(j) match {
    case a: ArrayNode => a
    case o => val a = mapper.createArrayNode(); a.add(o); a
  }
  private def jout(a: ArrayNode): String = mapper.writeValueAsString(a)
  private def nodes(a: ArrayNode): Vector[JsonNode] = {
    val b = Vector.newBuilder[JsonNode]; a.forEach(b += _); b.result()
  }
  private def fromNodes(xs: Seq[JsonNode]): String = {
    val a = mapper.createArrayNode(); xs.foreach(a.add); jout(a)
  }
  private def ns1(g: String => String) = udf((j: String) => Option(j).map(g))
  private def ns2(g: (String, String) => String) =
    udf((a: String, b: String) =>
      if (a == null || b == null) None else Some(g(a, b)))
  // rank-key bytes as ISO-8859-1 chars: lexicographic string order
  // == unsigned byte order
  private def rk(n: JsonNode): String = new String(
    VariantRank.key(mapper.writeValueAsString(n)),
    java.nio.charset.StandardCharsets.ISO_8859_1)

  /** canonical jsonb object order: keys sorted, recursively */
  private def sortKeys(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      o.fieldNames().forEachRemaining(k => names += k)
      val m = mapper.createObjectNode()
      names.sorted.foreach(k => m.set[JsonNode](k, sortKeys(o.get(k))))
      m
    case a: ArrayNode =>
      val r = mapper.createArrayNode()
      a.forEach(e => r.add(sortKeys(e)))
      r
    case other => other
  }

  private val mapper = new ObjectMapper()

  private def parse(s: String): JsonNode = mapper.readTree(s)

  private def stripNulls(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      o.properties().forEach { e =>
        if (!e.getValue.isNull) out.set[JsonNode](e.getKey, stripNulls(e.getValue))
      }
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.forEach(x => out.add(stripNulls(x)))
      out
    case other => other
  }

  /** jsonb containment (reference json_contains_in_right = PG @>):
    * objects contain subsets recursively, arrays contain every element
    * of the needle, scalars compare equal.
    */
  /** jsonb containment (@>), PostgreSQL rules the reference mirrors:
    * object keys/values recurse; array needles match element-by-element
    * with NO descent into nested arrays ([1,2,[1,3]] @> [1,3] is
    * false, @> [[1,3]] is true); an array contains a bare primitive
    * only at the TOP level.
    */
  private def contains(hay: JsonNode, needle: JsonNode, top: Boolean = true): Boolean = {
    def elemMatch(y: JsonNode, x: JsonNode): Boolean =
      if (!x.isContainerNode) !y.isContainerNode && y == x
      else if (x.isObject) y.isObject && contains(y, x, top = false)
      else y.isArray && contains(y, x, top = false)
    (hay, needle) match {
      case (h: ObjectNode, n: ObjectNode) =>
        var ok = true
        n.properties().forEach { e =>
          ok = ok && h.has(e.getKey) &&
            contains(h.get(e.getKey), e.getValue, top = false)
        }
        ok
      case (h: ArrayNode, n: ArrayNode) =>
        var ok = true
        n.forEach { x =>
          var found = false
          h.forEach(y => found = found || elemMatch(y, x))
          ok = ok && found
        }
        ok
      case (h: ArrayNode, n) if top && !n.isContainerNode =>
        var found = false
        h.forEach(y => found = found || (!y.isContainerNode && y == n))
        found
      case (h, n) => h == n
    }
  }

  private def nullSafe1(g: String => String) =
    udf((s: String) => Option(s).map(g))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    for ((name, builder) <- rewrites) {
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }

    // array aggregates-as-scalars (reference array.rs array_* FACTORY;
    // null elements are ignored like their aggregate counterparts)
    def nums(a: Seq[java.lang.Double]): Seq[Double] =
      Option(a).getOrElse(Seq.empty).filter(_ != null).map(_.doubleValue())
    spark.udf.register("array_sum", udf((a: Seq[java.lang.Double]) => {
      val xs = nums(a); if (xs.isEmpty) None else Some(xs.sum) }))
    spark.udf.register("array_avg", udf((a: Seq[java.lang.Double]) => {
      val xs = nums(a); if (xs.isEmpty) None else Some(xs.sum / xs.length) }))
    spark.udf.register("array_count", udf((a: Seq[java.lang.Double]) =>
      nums(a).length.toLong))
    spark.udf.register("array_median", udf((a: Seq[java.lang.Double]) => {
      val xs = nums(a).sorted
      if (xs.isEmpty) None
      else if (xs.length % 2 == 1) Some(xs(xs.length / 2))
      else Some((xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2.0) }))
    def variance(xs: Seq[Double], sample: Boolean): Option[Double] = {
      val n = xs.length
      if (n == 0 || (sample && n < 2)) None
      else {
        val m = xs.sum / n
        Some(xs.map(x => (x - m) * (x - m)).sum / (if (sample) n - 1 else n))
      }
    }
    spark.udf.register("array_stddev_samp", udf((a: Seq[java.lang.Double]) =>
      variance(nums(a), sample = true).map(math.sqrt)))
    spark.udf.register("array_stddev_pop", udf((a: Seq[java.lang.Double]) =>
      variance(nums(a), sample = false).map(math.sqrt)))
    spark.udf.register("array_stddev", udf((a: Seq[java.lang.Double]) =>
      variance(nums(a), sample = true).map(math.sqrt)))
    spark.udf.register("array_std", udf((a: Seq[java.lang.Double]) =>
      variance(nums(a), sample = true).map(math.sqrt)))
    // sample skewness / excess kurtosis with the standard bias
    // corrections (the reference's skew/kurt family conventions)
    spark.udf.register("array_skewness", udf((a: Seq[java.lang.Double]) => {
      val xs = nums(a); val n = xs.length
      if (n < 3) None
      else {
        val m = xs.sum / n
        val m2 = xs.map(x => math.pow(x - m, 2)).sum / n
        val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
        if (m2 == 0) None
        else Some(math.sqrt(n.toDouble * (n - 1)) / (n - 2) * m3 / math.pow(m2, 1.5))
      } }))
    spark.udf.register("array_kurtosis", udf((a: Seq[java.lang.Double]) => {
      val xs = nums(a); val n = xs.length
      if (n < 4) None
      else {
        val m = xs.sum / n
        val m2 = xs.map(x => math.pow(x - m, 2)).sum / n
        val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
        if (m2 == 0) None
        else Some(((n + 1.0) * n / ((n - 1.0) * (n - 2) * (n - 3))) *
          (n * m4 / (m2 * m2)) - 3.0 * (n - 1.0) * (n - 1) / ((n - 2.0) * (n - 3)))
      } }))

    // JSON object editing on the text form (Jackson). Outputs render
    // with SORTED keys — jsonb's canonical object order, which the
    // reference displays (parse_json-built variants already sort via
    // the variant dictionary; only these text-path editors must).
    spark.udf.register("json_object_delete_impl",
      udf((s: String, keys: Seq[String]) => Option(s).map { j =>
        parse(j) match {
          case o: ObjectNode =>
            keys.filter(_ != null).foreach(o.remove)
            mapper.writeValueAsString(sortKeys(o))
          case _ => throw new IllegalArgumentException(
            "1006: object_delete requires an OBJECT input")
        }
      }))
    spark.udf.register("json_object_pick_impl",
      udf((s: String, keys: Seq[String]) => Option(s).map { j =>
        parse(j) match {
          case o: ObjectNode =>
            val out = mapper.createObjectNode()
            keys.filter(_ != null).foreach(k =>
              if (o.has(k)) out.set[JsonNode](k, o.get(k)))
            mapper.writeValueAsString(sortKeys(out))
          case _ => throw new IllegalArgumentException(
            "1006: object_pick requires an OBJECT input")
        }
      }))
    // reference object_insert semantics (variant.rs): existing key
    // without update=true errors 1006; a SQL-NULL value deletes on
    // update, no-ops on plain insert; non-objects error
    spark.udf.register("json_object_insert_impl",
      udf((s: String, key: String, value: String, update: Boolean) =>
        Option(s).map { j =>
          parse(j) match {
            case o: ObjectNode =>
              if (value == null) {
                if (update) o.remove(key)
              } else if (o.has(key) && !update) {
                throw new IllegalArgumentException(
                  s"1006: object_insert key '$key' already exists (use update)")
              } else {
                val v = try parse(value) catch {
                  case _: Exception => mapper.getNodeFactory.textNode(value)
                }
                o.set[JsonNode](key, v)
              }
              mapper.writeValueAsString(sortKeys(o))
            case _ => throw new IllegalArgumentException(
              "1006: object_insert requires an OBJECT input")
          }
        }))
    spark.udf.register("json_strip_nulls_impl", nullSafe1 { j =>
      mapper.writeValueAsString(stripNulls(parse(j))) })
    // jsonb || concatenation (pg rules the reference mirrors):
    // object||object merges (right wins), otherwise both sides coerce
    // to arrays and concatenate
    spark.udf.register("json_concat_impl", udf((a: String, b: String) =>
      if (a == null || b == null) None
      else Some {
        (parse(a), parse(b)) match {
          case (x: ObjectNode, y: ObjectNode) =>
            val m = x.deepCopy[ObjectNode]()
            m.setAll[ObjectNode](y)
            mapper.writeValueAsString(sortKeys(m))
          case (x, y) =>
            val arr = mapper.createArrayNode()
            x match { case xa: ArrayNode => arr.addAll(xa); case o => arr.add(o) }
            y match { case ya: ArrayNode => arr.addAll(ya); case o => arr.add(o) }
            mapper.writeValueAsString(arr)
        }
      }))
    // ---- variant-array function family (reference array.rs over
    // jsonb arrays; GraftCoercionRule routes resolved Array* nodes
    // here when the operand is VARIANT). All work on json text; a
    // non-array target wraps as a one-element array (jsonb rules).
    spark.udf.register("jarr_distinct", ns1(j => fromNodes(nodes(jarr(j)).distinct)))
    spark.udf.register("jarr_compact", ns1(j =>
      fromNodes(nodes(jarr(j)).filterNot(_.isNull))))
    spark.udf.register("jarr_flatten", ns1(j =>
      fromNodes(nodes(jarr(j)).flatMap {
        case a: ArrayNode => nodes(a)
        case o => Seq(o)
      })))
    // BAG semantics (reference array.rs): except subtracts one
    // occurrence per occurrence in b; intersect keeps min(count) copies
    spark.udf.register("jarr_except", ns2((a, b) => {
      val cnt = scala.collection.mutable.Map.empty[JsonNode, Int]
      nodes(jarr(b)).foreach(n => cnt(n) = cnt.getOrElse(n, 0) + 1)
      fromNodes(nodes(jarr(a)).filter { n =>
        val c = cnt.getOrElse(n, 0)
        if (c > 0) { cnt(n) = c - 1; false } else true
      })
    }))
    spark.udf.register("jarr_intersect", ns2((a, b) => {
      val cnt = scala.collection.mutable.Map.empty[JsonNode, Int]
      nodes(jarr(b)).foreach(n => cnt(n) = cnt.getOrElse(n, 0) + 1)
      fromNodes(nodes(jarr(a)).filter { n =>
        val c = cnt.getOrElse(n, 0)
        if (c > 0) { cnt(n) = c - 1; true } else false
      })
    }))
    spark.udf.register("jarr_union", ns2((a, b) =>
      fromNodes((nodes(jarr(a)) ++ nodes(jarr(b))).distinct)))
    spark.udf.register("jarr_remove", ns2((a, x) => {
      val n = parse(x)
      fromNodes(nodes(jarr(a)).filterNot(_ == n))
    }))
    spark.udf.register("jarr_overlap", udf((a: String, b: String) =>
      if (a == null || b == null) None
      else Some {
        val bs = nodes(jarr(b)).toSet
        nodes(jarr(a)).exists(bs)
      }))
    spark.udf.register("jarr_contains", udf((a: String, x: String) =>
      if (a == null || x == null) None
      else Some(nodes(jarr(a)).contains(parse(x)))))
    spark.udf.register("jarr_max", ns1(j =>
      nodes(jarr(j)).filterNot(_.isNull) match {
        case xs if xs.isEmpty => "null"
        case xs => mapper.writeValueAsString(xs.maxBy(rk))
      }))
    spark.udf.register("jarr_min", ns1(j =>
      nodes(jarr(j)).filterNot(_.isNull) match {
        case xs if xs.isEmpty => "null"
        case xs => mapper.writeValueAsString(xs.minBy(rk))
      }))
    // jsonb array insert: 0-based, negative from the end, clamped (no
    // null padding); non-array targets wrap first
    spark.udf.register("jarr_insert", udf((j: String, pos: java.lang.Integer, x: String) =>
      if (j == null || pos == null || x == null) None
      else Some {
        val xs = nodes(jarr(j))
        val i0 = if (pos >= 0) pos.intValue else xs.size + pos.intValue
        val i = math.max(0, math.min(xs.size, i0))
        fromNodes((xs.take(i) :+ parse(x)) ++ xs.drop(i))
      }))
    spark.udf.register("jarr_size", udf((j: String) =>
      Option(j).map(x => nodes(jarr(x)).size)))
    spark.udf.register("jarr_reverse", ns1(j => fromNodes(nodes(jarr(j)).reverse)))
    spark.udf.register("jarr_slice", udf((j: String, start: java.lang.Integer, len: java.lang.Integer) =>
      if (j == null || start == null || len == null) None
      else Some {
        val xs = nodes(jarr(j))
        val s0 = if (start > 0) start - 1 else xs.size + start.intValue
        fromNodes(xs.slice(math.max(0, s0), math.max(0, s0) + len))
      }))
    // jsonb `-` deletion: string removes matching array elements / an
    // object key; int removes the array element at that index
    // (negative counts from the end) — pg rules the reference mirrors
    spark.udf.register("json_minus_str_impl", udf((j: String, k: String) =>
      if (j == null || k == null) None
      else Some(parse(j) match {
        case o: ObjectNode =>
          val m = o.deepCopy[ObjectNode]()
          m.remove(k.stripPrefix("\"").stripSuffix("\""))
          mapper.writeValueAsString(m)
        case a: ArrayNode =>
          val k2 = k.stripPrefix("\"").stripSuffix("\"")
          val arr = mapper.createArrayNode()
          a.forEach(e => if (!(e.isTextual && e.asText == k2)) arr.add(e))
          mapper.writeValueAsString(arr)
        case other => mapper.writeValueAsString(other)
      })))
    spark.udf.register("json_minus_int_impl", udf((j: String, i: java.lang.Integer) =>
      if (j == null || i == null) None
      else Some(parse(j) match {
        case a: ArrayNode =>
          val idx = if (i >= 0) i.intValue else a.size + i.intValue
          val arr = mapper.createArrayNode()
          var p = 0
          a.forEach { e => if (p != idx) arr.add(e); p += 1 }
          mapper.writeValueAsString(arr)
        case other => mapper.writeValueAsString(other)
      })))
    spark.udf.register("json_has_impl", udf((j: String, k: String) =>
      if (j == null || k == null) None else Some(jsonHas(j, k))))
    spark.udf.register("json_has_any_impl", udf((j: String, ks: Seq[String]) =>
      if (j == null || ks == null) None else Some(ks.exists(k => k != null && jsonHas(j, k)))))
    spark.udf.register("json_has_all_impl", udf((j: String, ks: Seq[String]) =>
      if (j == null || ks == null) None else Some(ks.forall(k => k != null && jsonHas(j, k)))))
    spark.udf.register("json_typeof_impl", nullSafe1 { j =>
      val s = j.trim
      if (s == "null") "NULL_VALUE"
      else if (s == "true" || s == "false") "BOOLEAN"
      else if (s.startsWith("\"")) "STRING"
      else if (s.startsWith("[")) "ARRAY"
      else if (s.startsWith("{")) "OBJECT"
      else if (s.contains("e") || s.contains("E")) "DOUBLE"
      else if (s.contains(".")) "DECIMAL"
      else "INTEGER"
    })
    spark.udf.register("json_pretty_impl", nullSafe1 { j =>
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(parse(j)) })
    spark.udf.register("json_contains_in_right_impl",
      udf((hay: String, needle: String) =>
        if (hay == null || needle == null) None
        else Some(contains(parse(hay), parse(needle)))))
    spark.udf.register("get_ignore_case_impl",
      udf((s: String, key: String) =>
        if (s == null || key == null) None
        else parse(s) match {
          case o: ObjectNode =>
            val it = o.properties().iterator()
            var found: Option[String] = None
            while (it.hasNext && found.isEmpty) {
              val e = it.next()
              if (e.getKey.equalsIgnoreCase(key))
                found = Some(mapper.writeValueAsString(e.getValue))
            }
            found
          case _ => None
        }))
    spark.udf.register("delete_by_keypath_impl",
      udf((s: String, path: String) =>
        if (s == null || path == null) None
        else {
          // keypath dialect: {a, b, 0} (reference variant.rs keypath)
          val parts = path.stripPrefix("{").stripSuffix("}").split(",")
            .map(_.trim).filter(_.nonEmpty)
          // negative indices count from the end (pg jsonb #- rules)
          def idx(ar: ArrayNode, k: String): Int = {
            val i0 = k.toInt
            if (i0 < 0) ar.size + i0 else i0
          }
          val root = parse(s)
          var cur: JsonNode = root
          var i = 0
          while (i < parts.length - 1 && cur != null) {
            cur = cur match {
              case o: ObjectNode => o.get(parts(i))
              case ar: ArrayNode => try ar.get(idx(ar, parts(i))) catch { case _: Exception => null }
              case _ => null
            }
            i += 1
          }
          (cur, if (parts.nonEmpty) parts.last else "") match {
            case (o: ObjectNode, k) => o.remove(k)
            case (ar: ArrayNode, k) =>
              try { val j = idx(ar, k); if (j >= 0 && j < ar.size) ar.remove(j) }
              catch { case _: Exception => () }
            case _ => ()
          }
          Some(mapper.writeValueAsString(root))
        }))

    // geometry point tests (reference geo.rs point_in_*)
    spark.udf.register("point_in_polygon",
      udf((px: Double, py: Double, poly: Seq[Seq[Double]]) => {
        // ray casting; polygon as [[x1,y1],[x2,y2],...]
        var inside = false
        val n = poly.length
        var i = 0
        var j = n - 1
        while (i < n) {
          val (xi, yi) = (poly(i)(0), poly(i)(1))
          val (xj, yj) = (poly(j)(0), poly(j)(1))
          if (((yi > py) != (yj > py)) &&
            (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) inside = !inside
          j = i; i += 1
        }
        inside
      }))
    spark.udf.register("point_in_ellipses",
      udf((px: Double, py: Double, es: Seq[Double]) => {
        // flat [cx, cy, a, b, ...] quadruples; true if inside ANY
        var inside = false
        var i = 0
        while (i + 3 < es.length && !inside) {
          val dx = (px - es(i)) / es(i + 2)
          val dy = (py - es(i + 1)) / es(i + 3)
          inside = dx * dx + dy * dy <= 1.0
          i += 4
        }
        inside
      }))

    // xxhash32 over the string form (lz4-java's XXHash32, seed 0 —
    // engine-specific values like the reference's own)
    spark.udf.register("xxhash32_impl", udf((s: String) =>
      Option(s).map { x =>
        val bytes = x.getBytes("UTF-8")
        net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()
          .hash32().hash(bytes, 0, bytes.length, 0).toLong & 0xffffffffL
      }))
    spark.udf.register("to_uuid_impl", udf((s: String) =>
      Option(s).flatMap { x =>
        try Some(java.util.UUID.fromString(x.trim).toString)
        catch { case _: IllegalArgumentException => None }
      }))
    spark.udf.register("siphash64_impl", udf((b: Array[Byte]) =>
      Option(b).map(x => DfHash.unsigned(Obfuscator.sipHash13(0L, 0L, x)))))
    spark.udf.register("xxhash64_impl", udf((b: Array[Byte]) =>
      Option(b).map(x => DfHash.unsigned(DfHash.xxh64(x)))))
    spark.udf.register("city64withseed_impl", udf((b: Array[Byte], seed: Long) =>
      Option(b).map(x => DfHash.unsigned(cityHash64WithSeed(x, seed)))))
    spark.udf.register("blake3_impl", udf((s: String) =>
      Option(s).map(x => Blake3.hex(x.getBytes("UTF-8")))))
    spark.udf.register("json_path_query_impl", udf((s: String, p: String) =>
      for { x <- Option(s); q <- Option(p) } yield JsonPath.eval(x, q)))
    spark.udf.register("json_path_match_impl", udf((s: String, p: String) =>
      for { x <- Option(s); q <- Option(p); r <- JsonPath.pathMatch(x, q) } yield r))
  }

  /** CityHash64 v1.0.2 (Pike & Alakuijala, Google; the revision with
    * the k3 constant, as used by ClickHouse and the reference's
    * naive-cityhash dependency). All u64 arithmetic is two's-complement
    * Long; only logical shifts are used so signedness never leaks.
    * Validated against the reference's city64withseed golden vectors
    * in MoreAliases2Spec.
    */
  private[graft] def cityHash64WithSeed(data: Array[Byte], seed: Long): Long =
    hashLen16(cityHash64(data) - K2, seed)

  private val K0 = 0xc3a5c85c97cb3127L
  private val K1 = 0xb492b66fbe98f273L
  private val K2 = 0x9ae16a3b2f90404fL
  private val K3 = 0xc949d7c7509e6557L
  private val KMul = 0x9ddfea08eb382d69L

  @inline private def fetch64(s: Array[Byte], i: Int): Long = {
    var m = 0L
    var j = 7
    while (j >= 0) { m = (m << 8) | (s(i + j) & 0xffL); j -= 1 }
    m
  }
  @inline private def fetch32(s: Array[Byte], i: Int): Long =
    (s(i) & 0xffL) | ((s(i + 1) & 0xffL) << 8) |
      ((s(i + 2) & 0xffL) << 16) | ((s(i + 3) & 0xffL) << 24)
  @inline private def rot(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  private def hashLen16(u: Long, v: Long): Long = {
    // Hash128to64 on the pair (u = low, v = high)
    var a = (u ^ v) * KMul
    a ^= (a >>> 47)
    var b = (v ^ a) * KMul
    b ^= (b >>> 47)
    b * KMul
  }

  private def hashLen0to16(s: Array[Byte], len: Int): Long = {
    if (len > 8) {
      val a = fetch64(s, 0)
      val b = fetch64(s, len - 8)
      // RotateByAtLeast1(b + len, len); len is in [9,16] so never 0
      hashLen16(a, rot(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, 0)
      hashLen16(len + (a << 3), fetch32(s, len - 4))
    } else if (len > 0) {
      val a = s(0) & 0xffL
      val b = s(len >> 1) & 0xffL
      val c = s(len - 1) & 0xffL
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * K2 ^ z * K3) * K2
    } else K2
  }

  private def hashLen17to32(s: Array[Byte], len: Int): Long = {
    val a = fetch64(s, 0) * K1
    val b = fetch64(s, 8)
    val c = fetch64(s, len - 8) * K2
    val d = fetch64(s, len - 16) * K0
    hashLen16(rot(a - b, 43) + rot(c, 30) + d,
      a + rot(b ^ K3, 20) - c + len)
  }

  private def hashLen33to64(s: Array[Byte], len: Int): Long = {
    var z = fetch64(s, 24)
    var a = fetch64(s, 0) + (len + fetch64(s, len - 16)) * K0
    var b = rot(a + z, 52)
    var c = rot(a, 37)
    a += fetch64(s, 8)
    c += rot(a, 7)
    a += fetch64(s, 16)
    val vf = a + z
    val vs = b + rot(a, 31) + c
    a = fetch64(s, 16) + fetch64(s, len - 32)
    z = fetch64(s, len - 8)
    b = rot(a + z, 52)
    c = rot(a, 37)
    a += fetch64(s, len - 24)
    c += rot(a, 7)
    a += fetch64(s, len - 16)
    val wf = a + z
    val ws = b + rot(a, 31) + c
    val r = shiftMix((vf + ws) * K2 + (wf + vs) * K0)
    shiftMix(r * K0 + vs) * K2
  }

  // (first, second) accumulator pair for the long-input loop
  private def weakHashLen32WithSeeds(
      w: Long, x: Long, y: Long, z: Long, a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rot(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rot(a, 44)
    (a + z, b + c)
  }
  private def weakHashLen32WithSeeds(s: Array[Byte], i: Int, a: Long, b: Long): (Long, Long) =
    weakHashLen32WithSeeds(fetch64(s, i), fetch64(s, i + 8),
      fetch64(s, i + 16), fetch64(s, i + 24), a, b)

  private[graft] def cityHash64(s: Array[Byte]): Long = {
    val n = s.length
    if (n <= 32) {
      if (n <= 16) hashLen0to16(s, n) else hashLen17to32(s, n)
    } else if (n <= 64) {
      hashLen33to64(s, n)
    } else {
      var x = fetch64(s, 0)
      var y = fetch64(s, n - 16) ^ K1
      var z = fetch64(s, n - 56) ^ K0
      var v = weakHashLen32WithSeeds(s, n - 64, n.toLong, y)
      var w = weakHashLen32WithSeeds(s, n - 32, n.toLong * K1, K0)
      z += shiftMix(v._2) * K1
      x = rot(z + x, 39) * K1
      y = rot(y, 33) * K1
      var len = (n - 1) & ~63
      var p = 0
      while (len != 0) {
        x = rot(x + y + v._1 + fetch64(s, p + 16), 37) * K1
        y = rot(y + v._2 + fetch64(s, p + 48), 42) * K1
        x ^= w._2
        y ^= v._1
        z = rot(z ^ w._1, 33)
        v = weakHashLen32WithSeeds(s, p, v._2 * K1, x + w._1)
        w = weakHashLen32WithSeeds(s, p + 32, z + w._2, y)
        val t = z; z = x; x = t
        p += 64
        len -= 64
      }
      hashLen16(hashLen16(v._1, w._1) + shiftMix(y) * K1 + z,
        hashLen16(v._2, w._2) + x)
    }
  }

}
