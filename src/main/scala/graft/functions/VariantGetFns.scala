package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Unevaluable}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.variant.VariantExpressionEvalUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}
import scala.jdk.CollectionConverters._

/** One-step VARIANT navigation with a runtime key — the reference's
  * `get(variant, index_or_key)` / `->` and `get_string` / `->>`
  * (src/query/functions/src/scalars/variant.rs). Spark's own
  * variant_get needs a FOLDABLE path, hence this expression.
  *
  *   - integer key: 0-based array element (NULL on non-array /
  *     out-of-range)
  *   - string key: object field, case-sensitive (`ignoreCase` gives
  *     the reference's get_ignore_case: exact match wins, otherwise
  *     the first case-insensitive hit in key order)
  *   - `asText`: unquote the result to STRING; a JSON null becomes a
  *     SQL NULL (the reference's get_string)
  *
  * Navigation goes through the same Jackson tree the VariantFlatten
  * generator uses; a VARIANT input renders to canonical JSON first, so
  * nested values round-trip exactly.
  */
case class VariantGetDyn(left: Expression, right: Expression,
                         asText: Boolean, ignoreCase: Boolean = false)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = if (asText) StringType else VariantType
  override def nullable: Boolean = true

  override def nullSafeEval(j: Any, k: Any): Any = {
    val root = VariantGetFns.readTree(j)
    if (root == null) return null
    val node: JsonNode = k match {
      case s: UTF8String =>
        val key = s.toString
        if (!root.isObject) null
        else if (root.has(key)) root.get(key)
        else if (ignoreCase)
          root.fields().asScala.find(_.getKey.equalsIgnoreCase(key))
            .map(_.getValue).orNull
        else null
      case n: Number => if (root.isArray) root.get(n.intValue) else null
      case _ => null
    }
    VariantGetFns.out(node, asText)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariantGetDyn =
    copy(left = newLeft, right = newRight)
}

/** Path navigation into VARIANT:
  *   - `#>` / `#>>`: the jsonb path-array form `'{seg, seg, ...}'`
  *     (each segment an object key or a 0-based array index)
  *   - get_path / `v:a.b[0]`-style dotted paths when `dotted` is set
  *     (segments split on `.`, `[n]`, and `["quoted"]`)
  */
case class VariantGetPath(left: Expression, right: Expression,
                          asText: Boolean, dotted: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = if (asText) StringType else VariantType
  override def nullable: Boolean = true

  override def nullSafeEval(j: Any, p: Any): Any = {
    var node = VariantGetFns.readTree(j)
    if (node == null) return null
    // tolerate a JSONPath-style `$`/`$.` prefix (get_json_object
    // spelling); a literal "$" key remains addressable as ["$"]
    val raw0 = p.toString
    val raw =
      if (dotted && raw0.startsWith("$"))
        raw0.stripPrefix("$").stripPrefix(".")
      else raw0
    val segs: Seq[String] =
      if (dotted) {
        """\[\s*"([^"]*)"\s*\]|\[\s*'([^']*)'\s*\]|\[(\d+)\]|([^.\[\]]+)""".r
          .findAllMatchIn(raw).map { m =>
            Seq(m.group(1), m.group(2), m.group(3), m.group(4))
              .find(_ != null).get
          }.toSeq
      } else raw.stripPrefix("{").stripSuffix("}").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\""))
    for (seg <- segs) {
      if (node == null) return null
      node =
        if (node.isArray && seg.matches("-?\\d+")) node.get(seg.toInt)
        else if (node.isObject) node.get(seg)
        else null
    }
    VariantGetFns.out(node, asText)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariantGetPath =
    copy(left = newLeft, right = newRight)
}

/** `get(x, k)` before the input type is known: the GraftCoercionRule
  * resolves it to VariantGetDyn (VARIANT/STRING input) or 1-based
  * try_element_at (ARRAY/MAP input — the reference's array get is
  * 1-based).
  */
case class GetMarker(left: Expression, right: Expression)
    extends BinaryExpression with Unevaluable {
  override def dataType: DataType = VariantType
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GetMarker =
    copy(left = newLeft, right = newRight)
}

object VariantGetFns {
  private[functions] def readTree(v: Any): JsonNode = {
    val json = v match {
      case vv: VariantVal => vv.toString
      case s => s.toString
    }
    try JsonFlatten.mapper.readTree(json)
    catch { case _: Exception => null }
  }

  private[functions] def out(node: JsonNode, asText: Boolean): Any = {
    if (node == null) return null
    if (asText) {
      if (node.isNull) null
      else if (node.isTextual) UTF8String.fromString(node.asText)
      else UTF8String.fromString(node.toString)
    } else {
      VariantExpressionEvalUtils.parseJson(
        UTF8String.fromString(node.toString), false, true)
    }
  }
}

/** Order-preserving sort key for VARIANT values (reference jsonb
  * compare: type rank then value; databend's own mix.test sorts
  * [true, 10, "abcd", {"k":"v"}, [1,2,3], null] ascending in exactly
  * that order). Input is the canonical JSON text (cast variant ->
  * string); output is a BinaryType key whose bytewise order matches:
  *   bool(false<true) < number < string < object < array < json-null
  * Numbers use the IEEE total-order trick (flip sign bit for
  * positives, all bits for negatives) so the 8-byte big-endian image
  * sorts numerically.
  */
object VariantRank {
  def key(json: String): Array[Byte] = {
    if (json == null) return null
    val s = json.trim
    val out = new java.io.ByteArrayOutputStream()
    def rank(b: Int): Unit = out.write(b)
    if (s == "true" || s == "false") {
      rank(0); out.write(if (s == "true") 1 else 0)
    } else if (s.startsWith("\"")) {
      rank(2)
      out.write(s.substring(1, math.max(1, s.length - 1))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } else if (s.startsWith("{")) {
      rank(3); out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } else if (s.startsWith("[")) {
      rank(4); out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } else if (s == "null") {
      rank(5)
    } else {
      rank(1)
      val d = try s.toDouble catch { case _: NumberFormatException => 0.0 }
      var bits = java.lang.Double.doubleToLongBits(d)
      bits = if (bits < 0) ~bits else bits ^ Long.MinValue
      var i = 56
      while (i >= 0) { out.write(((bits >>> i) & 0xff).toInt); i -= 8 }
    }
    out.toByteArray
  }
}

/** Reference variant LIKE (comparison.rs variant_vectorize_like_jsonb):
  * a COMPLEX pattern (any unescaped `_`, a mid-string `%`, or any
  * escaped wildcard) traverses every nested STRING value and matches
  * if any does; a SIMPLE pattern (exact / prefix% / %suffix /
  * %infix%... no — infix is complex too, see
  * variant_like_requires_traversal) matches only a top-level string
  * scalar's unquoted text (a non-string variant is false). A custom
  * ESCAPE char is normalized to backslash first
  * (convert_escape_pattern).
  */
object VariantLike {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def normalizeEscape(pat: String, esc: String): String =
    if (esc == null || esc.isEmpty || esc == "\\") pat
    else {
      val e = esc.charAt(0)
      val sb = new StringBuilder
      var i = 0
      while (i < pat.length) {
        val c = pat.charAt(i)
        if (c == e && i + 1 < pat.length) {
          sb.append('\\').append(pat.charAt(i + 1)); i += 2
        } else if (c == '\\') { sb.append("\\\\"); i += 1 }
        else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  /** comparison.rs variant_like_requires_traversal: true unless the
    * pattern is exact / starts-with / ends-with / surround-by-percent
    * with NO escaped wildcards... the reference additionally keeps
    * traversal for escaped exact/prefix/suffix forms.
    */
  private def requiresTraversal(p: String): Boolean = {
    // any escaped wildcard forces traversal
    if (p.sliding(2).exists(w => w.length == 2 && w(0) == '\\' &&
      (w(1) == '%' || w(1) == '_' || w(1) == '\\'))) return true
    // simple (string-scalar-only) patterns: constant, 'xxx%', '%xxx' —
    // no `_`, and `%` only at exactly one boundary; everything else
    // (mid-string %, both-end %, any _) traverses nested strings
    if (p.contains('_')) return true
    val lead = p.startsWith("%")
    val trail = p.endsWith("%") && !p.endsWith("\\%")
    val inner = p.substring(if (lead) 1 else 0,
      p.length - (if (trail && p.length > (if (lead) 1 else 0)) 1 else 0))
    inner.contains('%') || (lead && trail)
  }

  private def likeRegex(p: String): java.util.regex.Pattern = {
    val sb = new StringBuilder("(?s)^")
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length) {
        sb.append(java.util.regex.Pattern.quote(p.charAt(i + 1).toString)); i += 2
      } else {
        c match {
          case '%' => sb.append(".*")
          case '_' => sb.append(".")
          case ch => sb.append(java.util.regex.Pattern.quote(ch.toString))
        }
        i += 1
      }
    }
    java.util.regex.Pattern.compile(sb.append("$").toString)
  }

  private def anyString(n: com.fasterxml.jackson.databind.JsonNode,
      p: java.util.regex.Pattern): Boolean = {
    import scala.jdk.CollectionConverters._
    if (n.isTextual) p.matcher(n.asText).matches()
    else if (n.isArray || n.isObject) n.elements().asScala.exists(anyString(_, p))
    else false
  }

  def like(jsonText: String, pat0: String, esc: String): java.lang.Boolean = {
    if (jsonText == null || pat0 == null) return null
    val pat = normalizeEscape(pat0, esc)
    val rx = likeRegex(pat)
    val node = try mapper.readTree(jsonText)
               catch { case _: Exception => return rx.matcher(jsonText).matches() }
    if (requiresTraversal(pat)) anyString(node, rx)
    else if (node.isTextual) rx.matcher(node.asText).matches()
    else false
  }
}

/** key-list argument of map_pick/map_delete: variadic scalars OR one
  * array argument (dispatch on the resolved type)
  */
case class MapKeysArg(keys: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override def children: Seq[Expression] = keys
  override lazy val replacement: Expression = keys match {
    case Seq(one) if one.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType] => one
    case _ => org.apache.spark.sql.catalyst.expressions.CreateArray(keys)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MapKeysArg = copy(keys = cs)
}

/** array_contains with the probe cast to the list's element type —
  * an EMPTY map's NullType key lambda var would otherwise fail
  * analysis (map_delete({}, 'k'))
  */
case class KeyInList(arr: Expression, k: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override def left: Expression = arr
  override def right: Expression = k
  override lazy val replacement: Expression = {
    val et = arr.dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    org.apache.spark.sql.catalyst.expressions.ArrayContains(arr,
      if (k.dataType == et) k
      else org.apache.spark.sql.catalyst.expressions.Cast(k, et))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KeyInList = copy(arr = l, k = r)
}
