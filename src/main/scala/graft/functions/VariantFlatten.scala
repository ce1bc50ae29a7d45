package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.variant.VariantExpressionEvalUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}
import scala.jdk.CollectionConverters._

/** The reference's FLATTEN table function over VARIANT documents
  * (Snowflake shape; tests/sqllogictests/suites/query/lateral.test,
  * binder src/query/sql/src/planner/binder/table.rs flatten): one row
  * per element/field of the input, with
  *   key   STRING  — object key, NULL for array elements
  *   path  STRING  — path from the flatten root (e.g. `[0]`, `a.b`)
  *   index INT     — array position, NULL for object fields
  *   value VARIANT — the element itself
  *   this  VARIANT — the document being flattened
  *
  * Differs from [[JsonFlatten]] (the json-text SRF surface) by typing
  * value/this as Spark-native VARIANT, so databend's `f.value:path`
  * accessor and `f.value::STRING` cast semantics carry over exactly:
  * a variant renders as canonical JSON (strings quoted) and casts to
  * STRING unquoted — the reference's display/cast pair.
  *
  * `pathPrefix` carries FLATTEN's `path => '...'` argument into the
  * emitted path column. `recursive => true` expands nested containers
  * depth-first after their parent row (nested rows carry the
  * immediate parent as `this`); `mode` gates which container types
  * expand — 'object' / 'array' / 'both' — including the root
  * (02_0068: mode => 'array' over an object root yields no rows).
  */
case class VariantFlatten(child: Expression, pathPrefix: String,
    recursive: Boolean = false, mode: String = "both")
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("path", StringType),
    StructField("index", IntegerType),
    StructField("value", VariantType),
    StructField("this", VariantType)))

  private def toVariant(node: JsonNode): VariantVal =
    VariantExpressionEvalUtils.parseJson(
      UTF8String.fromString(node.toString), false, true)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val json = raw match {
      case v: VariantVal => v.toString
      case s => s.toString
    }
    val root =
      try JsonFlatten.mapper.readTree(json)
      catch { case _: Exception => return Iterator.empty }
    val out = Vector.newBuilder[InternalRow]
    def expandable(n: JsonNode): Boolean =
      (n.isObject && mode != "array") || (n.isArray && mode != "object")
    def walk(node: JsonNode, prefix: String): Unit = {
      val doc = toVariant(node)
      if (node.isObject && mode != "array") {
        node.fields().asScala.foreach { e =>
          val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
          out += InternalRow(UTF8String.fromString(e.getKey),
            UTF8String.fromString(p), null, toVariant(e.getValue), doc)
          if (recursive && expandable(e.getValue)) walk(e.getValue, p)
        }
      } else if (node.isArray && mode != "object") {
        var i = 0
        node.elements().asScala.foreach { v =>
          val p = s"$prefix[$i]"
          out += InternalRow(null, UTF8String.fromString(p), i, toVariant(v), doc)
          if (recursive && expandable(v)) walk(v, p)
          i += 1
        }
      }
    }
    walk(root, pathPrefix)
    out.result()
  }

  override protected def withNewChildInternal(newChild: Expression): VariantFlatten =
    copy(child = newChild)
}
