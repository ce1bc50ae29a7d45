package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** flatten(json [, recursive]): Snowflake-style lateral flatten over a
  * JSON document — the reference's FLATTEN table function
  * (binder project_set.rs; tests/sqllogictests/suites/query/lateral.test).
  *
  * Spark has explode/posexplode for typed arrays/maps but nothing that
  * walks heterogeneous JSON with (key, path, index, value) output —
  * this is the SURVEY §2.11 custom `Generator` case. Output schema:
  *   key   STRING  — object key, NULL for array elements
  *   path  STRING  — dotted/bracketed path from the root
  *   index INT     — array position, NULL for object fields
  *   value STRING  — the element as compact JSON text
  *
  * Jackson (already on Spark's classpath) does the parsing; rows are
  * generated lazily per input row, so memory is bounded by one
  * document regardless of fan-out.
  */
case class JsonFlatten(child: Expression, recursive: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("path", StringType),
    StructField("index", IntegerType),
    StructField("value", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val json = raw.toString
    val root =
      try JsonFlatten.mapper.readTree(json)
      catch { case _: Exception => return Iterator.empty }
    val out = Vector.newBuilder[InternalRow]

    def emit(key: String, path: String, index: java.lang.Integer, value: JsonNode): Unit = {
      out += InternalRow(
        if (key == null) null else UTF8String.fromString(key),
        UTF8String.fromString(path),
        if (index == null) null else index.intValue(),
        UTF8String.fromString(value.toString))
      if (recursive) walk(value, path)
    }

    def walk(node: JsonNode, prefix: String): Unit = {
      if (node.isObject) {
        node.fields().asScala.foreach { e =>
          val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
          emit(e.getKey, p, null, e.getValue)
        }
      } else if (node.isArray) {
        var i = 0
        node.elements().asScala.foreach { v =>
          emit(null, s"$prefix[$i]", Int.box(i), v); i += 1
        }
      }
    }

    walk(root, "")
    out.result()
  }

  override protected def withNewChildInternal(newChild: Expression): JsonFlatten =
    copy(child = newChild)
}

object JsonFlatten {
  private[graft] val mapper = new ObjectMapper()
}
