package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Literal}
import org.apache.spark.sql.catalyst.expressions.GetJsonObject
import org.apache.spark.sql.catalyst.optimizer.{CollapseProject, ColumnPruning, RemoveNoopOperators}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
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
  * `virtName(col, path)` stored at the leaf is always the value of
  * that exact expression over the sibling column. The rewrite requires
  * BOTH the json attribute and the virt attribute to trace by exprId
  * to the same leaf relation — a re-derived json column (alias = new
  * exprId) is never rewritten to the stale stored value.
  *
  * Since `GraftTable.read()` hides `__virt_*` from the user-visible
  * schema (a Project over the scan, matching the reference where
  * virtual columns are internal to the read path), the virt attribute
  * is usually NOT in scope at the use site. The rule "resurrects" it
  * by threading the leaf's attribute through intervening Project/
  * Filter/SubqueryAlias chains; after substitution a ColumnPruning +
  * CollapseProject pass re-prunes whatever the rewrite made dead (the
  * raw JSON column, when every path over it was rewritten), so the
  * parquet scan reads only the narrow stored columns and path filters
  * push down — the same wins the reference's virtual-column pruner
  * provides.
  */
class VirtualColumnRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    var changed = false
    val rewritten = plan transformUp {
      case node if node.children.nonEmpty =>
        val cands = node.expressions.flatMap(_.collect {
          case GetJsonObject(a: AttributeReference, Literal(p: UTF8String, StringType)) =>
            (a, p.toString)
        }).distinct
        if (cands.isEmpty) node
        else {
          var children = node.children
          val subs = scala.collection.mutable.Map.empty[(ExprId, String), Attribute]
          for ((a, p) <- cands if !subs.contains((a.exprId, p))) {
            val vname = GraftTable.virtName(a.name, p)
            var idx = 0
            while (idx < children.length && !subs.contains((a.exprId, p))) {
              val ch = children(idx)
              leafVirtAttr(ch, a, vname).foreach { virt =>
                resurrect(ch, virt).foreach { nc =>
                  children = children.updated(idx, nc)
                  subs((a.exprId, p)) = virt
                }
              }
              idx += 1
            }
          }
          if (subs.isEmpty) node
          else {
            changed = true
            node.withNewChildren(children).transformExpressionsUp {
              case g @ GetJsonObject(a: AttributeReference, Literal(p: UTF8String, StringType)) =>
                subs.getOrElse((a.exprId, p.toString), g)
            }
          }
        }
    }
    // the substitution can leave the raw JSON attribute dead in the
    // pass-through Projects (column pruning already ran before this
    // rule); re-prune so the scan narrows to the stored columns
    if (!changed) plan
    else RemoveNoopOperators(CollapseProject(ColumnPruning(rewritten)))
  }

  /** The virt attribute of `vname` at the leaf that produced `json` —
    * requiring the json attribute to reach the use site UNCHANGED
    * (same exprId as at the leaf) keeps the stale-value guard.
    */
  private def leafVirtAttr(ch: LogicalPlan, json: AttributeReference,
      vname: String): Option[Attribute] =
    ch.collectLeaves().iterator
      .filter(_.output.exists(_.exprId == json.exprId))
      .flatMap(_.output.find(_.name == vname))
      .nextOption()

  /** Thread `virt` from its leaf up through `plan` so it is in scope
    * at the parent: append through Projects, pass through Filter/
    * SubqueryAlias. Any other operator in the way (join, aggregate,
    * generate, ...) aborts the rewrite for this candidate — sound,
    * just not accelerated.
    */
  private def resurrect(plan: LogicalPlan, virt: Attribute): Option[LogicalPlan] = {
    if (plan.outputSet.exists(_.exprId == virt.exprId)) return Some(plan)
    plan match {
      case p: Project =>
        resurrect(p.child, virt).map { c =>
          if (p.projectList.exists(_.exprId == virt.exprId)) p.copy(child = c)
          else p.copy(projectList = p.projectList :+ virt, child = c)
        }
      case f: Filter        => resurrect(f.child, virt).map(c => f.copy(child = c))
      case s: SubqueryAlias => resurrect(s.child, virt).map(c => s.copy(child = c))
      case _                => None
    }
  }
}
