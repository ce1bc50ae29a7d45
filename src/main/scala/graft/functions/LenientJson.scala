package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, VariantType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's jsonb text parser is PERMISSIVE (jsonb crate parse_value,
  * exercised by 02_0048_function_semi_structureds_parse_json): leading `+`,
  * leading zeros, `1.` / `.2`, missing array elements (`[1,,4]` -> nulls),
  * trailing commas, single-quoted strings, unquoted object keys,
  * case-insensitive `null`/`true`/`false`, `nan`/`infinity` -> json null,
  * whole-scalar hex numbers (`0x123`, `0xABC.DEF`), and empty input ->
  * json null. Strict RFC text parses on Spark's native fast path first;
  * only a strict-parse FAILURE pays the jackson lenient re-parse.
  */
object LenientJson {
  private val factory = {
    import com.fasterxml.jackson.core.json.JsonReadFeature._
    new com.fasterxml.jackson.core.JsonFactoryBuilder()
      .enable(ALLOW_SINGLE_QUOTES)
      .enable(ALLOW_UNQUOTED_FIELD_NAMES)
      .enable(ALLOW_MISSING_VALUES)
      .enable(ALLOW_NON_NUMERIC_NUMBERS)
      .enable(ALLOW_LEADING_ZEROS_FOR_NUMBERS)
      .enable(ALLOW_LEADING_PLUS_SIGN_FOR_NUMBERS)
      .enable(ALLOW_LEADING_DECIMAL_POINT_FOR_NUMBERS)
      .enable(ALLOW_TRAILING_DECIMAL_POINT_FOR_NUMBERS)
      // no ALLOW_TRAILING_COMMA: the reference reads `[1,]` as a
      // MISSING element ([1,null]), which ALLOW_MISSING_VALUES gives
      .build()
  }
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper(factory)
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS)
    m
  }

  private val HexRe = """(?i)^([+-]?)0x([0-9a-f]+)(?:\.([0-9a-f]+))?$""".r

  /** strict JSON text equivalent of the lenient input, or null if the
    * input is unparseable even leniently
    */
  def normalize(s0: String): String = {
    if (s0 == null) return null
    val s = s0.trim
    if (s.isEmpty) return "null"
    s.toLowerCase match {
      case "null" | "nan" | "infinity" | "+infinity" | "-infinity" => return "null"
      case "true" => return "true"
      case "false" => return "false"
      case _ =>
    }
    HexRe.findFirstMatchIn(s).foreach { m =>
      val sign = if (m.group(1) == "-") -1.0 else 1.0
      // BigInteger, not Long.parseLong: hex scalars above Long.MaxValue
      // (0xffffffffffffffff) must degrade to a lossy double, not throw
      // an NFE that escapes the lenient-parse contract
      val whole = new java.math.BigInteger(m.group(2), 16).doubleValue
      val frac = Option(m.group(3)).map { f =>
        new java.math.BigInteger(f, 16).doubleValue / math.pow(16, f.length)
      }.getOrElse(0.0)
      val v = sign * (whole + frac)
      return if (v == math.rint(v) && math.abs(v) < 1e15)
        v.toLong.toString
      else v.toString
    }
    try {
      val node = mapper.readTree(s)
      // jackson renders NaN as a non-standard token — map to null
      def clean(n: com.fasterxml.jackson.databind.JsonNode)
          : com.fasterxml.jackson.databind.JsonNode = n match {
        case d: com.fasterxml.jackson.databind.node.DoubleNode
            if d.doubleValue.isNaN || d.doubleValue.isInfinite =>
          com.fasterxml.jackson.databind.node.NullNode.getInstance
        case o: com.fasterxml.jackson.databind.node.ObjectNode =>
          val it = o.fields()
          while (it.hasNext) { val e = it.next(); o.set(e.getKey, clean(e.getValue)) }
          o
        case a: com.fasterxml.jackson.databind.node.ArrayNode =>
          var i = 0
          while (i < a.size) { a.set(i, clean(a.get(i))); i += 1 }
          a
        case other => other
      }
      mapper.writeValueAsString(clean(node))
    } catch { case _: Exception => null }
  }
}

/** parse_json with the reference's permissive text grammar: Spark's
  * native strict parse runs first (fast path); a failure re-parses
  * through [[LenientJson.normalize]]. tryMode maps a doubly-unparseable
  * input to SQL NULL instead of the error.
  */
case class LenientParseJson(child: Expression, tryMode: Boolean)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.expressions.variant.VariantExpressionEvalUtils

  override def dataType: DataType = VariantType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    try VariantExpressionEvalUtils.parseJson(u, false, true)
    catch {
      case e: Throwable =>
        val fixed = LenientJson.normalize(u.toString)
        if (fixed == null) {
          if (tryMode) null
          else throw new IllegalArgumentException(
            s"1006: invalid JSON text for parse_json: ${u.toString.take(80)}")
        } else VariantExpressionEvalUtils.parseJson(
          UTF8String.fromString(fixed), false, true)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): LenientParseJson =
    copy(child = newChild)
}
