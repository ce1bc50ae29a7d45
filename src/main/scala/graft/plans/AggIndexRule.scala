package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Aggregating-index rewrite (reference: EE "aggregating index",
  * rule_try_apply_agg_index.rs / optimizers/rule/agg_rules/agg_index/):
  * an `Aggregate` whose grouping keys are a subset of a registered
  * index's keys, with re-aggregable measures (SUM/MIN/MAX/COUNT), is
  * rewritten to scan the pre-materialized summary table instead of the
  * base relation — at 100 TB this turns a full-table aggregate into a
  * scan of a few thousand summary rows.
  *
  * Correctness rests on re-aggregability: SUM re-sums partial sums,
  * COUNT re-sums partial counts, MIN/MAX re-min/max partial extremes.
  * Summary column naming contract: key columns keep their names;
  * measures are `sum_<col>`, `min_<col>`, `max_<col>`, and `cnt`.
  */
object AggIndex {
  /** A registered index. `coveredFiles`, when present, pins the index
    * to one exact file set (= one table version): only a scan of
    * precisely those files is rewritten. Without it, only a scan whose
    * root IS the registered directory matches. Prefix/subset matching
    * is deliberately absent — a scan of a SUBSET of a table's files
    * (time travel, CDC delta, post-compaction leftovers) must never be
    * served the full summary.
    */
  final case class Entry(sourcePath: String, keys: Set[String],
      summaryPath: String, coveredFiles: Option[Set[String]])

  private val entries = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Register for a static parquet directory: matches scans rooted at
    * exactly this directory.
    */
  def register(sourcePath: String, keys: Seq[String], summaryPath: String): Unit =
    entries.put(sourcePath, Entry(sourcePath, keys.toSet, summaryPath, None))

  /** Register for a versioned table: the summary covers exactly
    * `files` (one snapshot's file list). Re-register after each
    * refresh so the index tracks the version it summarizes.
    */
  def registerFiles(sourcePath: String, keys: Seq[String], summaryPath: String,
      files: Seq[String]): Unit =
    entries.put(sourcePath,
      Entry(sourcePath, keys.toSet, summaryPath, Some(files.map(normalize).toSet)))

  def clear(): Unit = entries.clear()

  /** drop the registration covering `sourcePath` (DROP AGGREGATING
    * INDEX DDL)
    */
  def deregister(sourcePath: String): Unit = entries.remove(sourcePath)

  /** registered indexes, for system_indexes introspection */
  def list: Seq[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.values.asScala.toSeq.sortBy(_.sourcePath)
  }

  /** Strip URI scheme and trailing slashes so `file:/data/x` and
    * `/data/x/` compare equal.
    */
  private def normalize(p: String): String = {
    val noScheme = p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "")
    val trimmed = noScheme.replaceAll("/+$", "")
    if (trimmed.isEmpty) "/" else trimmed
  }

  private[plans] def lookup(paths: Seq[String]): Option[Entry] = {
    import scala.jdk.CollectionConverters._
    val scanned = paths.map(normalize).toSet
    entries.values.asScala.find { e =>
      e.coveredFiles match {
        case Some(covered) => scanned == covered
        case None => scanned == Set(normalize(e.sourcePath))
      }
    }
  }
}

class AggIndexRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, _) =>
      rewrite(agg, groupings, aggExprs, child).getOrElse(agg)
  }

  /** Unwrap alias/attribute-only projections down to the file relation. */
  private def sourcePaths(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case SubqueryAlias(_, c) => sourcePaths(c)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => sourcePaths(c)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some(fs.location.rootPaths.map(_.toString))
    case _ => None
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    val entry = sourcePaths(child).flatMap(AggIndex.lookup).getOrElse(return None)

    val groupAttrs = groupings.map {
      case a: AttributeReference if entry.keys.contains(a.name) => a
      case _ => return None
    }

    // the summary relation, resolved fresh
    val summary = spark.read.parquet(entry.summaryPath).queryExecution.analyzed
    val byName = summary.output.map(a => a.name -> a).toMap

    val newGroupings = groupAttrs.map(a => byName.getOrElse(a.name, return None))

    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if entry.keys.contains(a.name) =>
        Alias(byName.getOrElse(a.name, return None), a.name)(exprId = a.exprId)
      case al @ Alias(AggregateExpression(fn, Complete, false, None, _), name) =>
        val rewritten: Option[Expression] = fn match {
          case Sum(e: AttributeReference, _) =>
            byName.get(s"sum_${e.name}").map(c => Sum(c).toAggregateExpression())
          case Min(e: AttributeReference) =>
            byName.get(s"min_${e.name}").map(c => Min(c).toAggregateExpression())
          case Max(e: AttributeReference) =>
            byName.get(s"max_${e.name}").map(c => Max(c).toAggregateExpression())
          case Count(Seq(Literal(_, _))) =>
            byName.get("cnt").map(c => Sum(c).toAggregateExpression())
          case _ => None
        }
        rewritten match {
          case Some(e) => Alias(e, name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }

    logInfo(s"AggIndex: rewriting aggregate over ${entry.sourcePath} " +
      s"to summary ${entry.summaryPath}")
    Some(Aggregate(newGroupings, newAggExprs, summary))
  }
}
