package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.GetJsonObject
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.GraftTable

/** Rewrites `get_json_object(col, 'path')` to the materialized
  * `__virt_*` column when the scan provides one (reference: fuse
  * virtual-column read path, virtual_column_reader_parquet.rs — path
  * access over a declared virtual column never parses JSON at read).
  *
  * Soundness: GraftTable only materializes the columns when they are
  * declared BEFORE the first write, so an attribute named
  * `virtName(col, path)` in scope is always the stored value of that
  * exact expression over the sibling column. After the rewrite,
  * Catalyst column pruning drops the raw JSON column from the scan
  * entirely and filters on the path push down to parquet (stats + row
  * group pruning on the virtual column) — the same wins the reference's
  * virtual-column pruner provides.
  */
class VirtualColumnRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case node if node.children.nonEmpty =>
      val childOut = node.children.flatMap(_.output)
      if (!childOut.exists(_.name.startsWith("__virt_"))) node
      else node.transformExpressionsUp {
        case g @ GetJsonObject(a: AttributeReference, Literal(p: UTF8String, StringType)) =>
          childOut.find(_.name == GraftTable.virtName(a.name, p.toString)) match {
            case Some(virt) if sameLeaf(node, a, virt) => virt
            case _ => g
          }
      }
  }

  /** The stored value is only the truth for the SCANNED json column: if
    * an intermediate projection re-derived the json attribute (alias =
    * new exprId), or the virt attribute was itself re-derived, the
    * by-name match would silently read stale data. Require both
    * attributes to reach `node` unchanged from the same leaf relation.
    */
  private def sameLeaf(node: LogicalPlan, json: AttributeReference,
      virt: org.apache.spark.sql.catalyst.expressions.Attribute): Boolean =
    node.collectLeaves().exists { leaf =>
      leaf.output.exists(_.exprId == json.exprId) &&
        leaf.output.exists(_.exprId == virt.exprId)
    }
}
