package graft.plans

import org.apache.spark.sql.{GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Expression, NamedExpression, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.{PyScalarUdf, PythonScriptUdf}

/** Lowers SQL-declared Python scalar UDF calls (`CREATE FUNCTION ...
  * LANGUAGE python`, registered by [[graft.functions.PyScalarUdf]])
  * onto the Arrow batch engine ([[graft.functions.PythonScriptUdf
  * .applyRows]]).
  *
  * Why: a registered scalar UDF is invoked row-at-a-time by Spark, so
  * the per-call worker hop (JSON over stdin/stdout) happens once per
  * ROW — the reference executes script UDFs over whole blocks
  * (src/query/script_udf_support/src/transform_udf_script.rs:55-93,
  * one handler call per DataBlock as Arrow data). This rule restores
  * the per-BATCH shape: a `Project`/`Filter` whose expressions contain
  * python-UDF calls is rewritten so each call runs through the
  * persistent Arrow worker (one IPC round-trip per 8192-row batch),
  * and the surrounding expressions evaluate natively against the
  * appended output column.
  *
  * Correctness envelope: only calls whose argument and return types
  * fit the Arrow lane (int/bigint/float/double/string/boolean) are
  * lowered; anything else (arrays, other plan positions such as
  * aggregate buffers or join keys) keeps the row-at-a-time fallback,
  * which is semantically identical. Output attribute ids of the
  * rewritten node are preserved (aliases reuse the original exprIds),
  * so parent operators are untouched.
  */
class PyUdfBatchRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val arrowOk: Set[DataType] =
    Set(IntegerType, LongType, FloatType, DoubleType, StringType, BooleanType)

  private def asPyCall(e: Expression): Option[(ScalaUDF, PyScalarUdf.PyFn)] =
    e match {
      case u: ScalaUDF =>
        u.udfName.flatMap(PyScalarUdf.lookup).filter { fn =>
          arrowOk.contains(fn.ret) && u.dataType == fn.ret &&
            u.children.forall(c => arrowOk.contains(c.dataType)) &&
            u.children.length == fn.argTypes.length
        }.map(fn => (u, fn))
      case _ => None
    }

  private def hasPyCall(exprs: Seq[Expression], child: LogicalPlan): Boolean = {
    lazy val ids = child.outputSet
    exprs.exists(_.exists(e =>
      asPyCall(e).exists(_._1.references.subsetOf(ids))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case p @ Project(list, child)
        if p.resolved && child.resolved && hasPyCall(list, child) =>
      val (newChild, remap, callOut) = lowerCalls(list, child)
      val newList = list.map(ne => substitute(ne, remap, callOut)
        .asInstanceOf[NamedExpression])
      Project(newList, newChild)

    case f @ Filter(cond, child)
        if f.resolved && child.resolved && hasPyCall(Seq(cond), child) =>
      val (newChild, remap, callOut) = lowerCalls(Seq(cond), child)
      val newCond = substitute(cond, remap, callOut)
      // restore the original output (names AND exprIds) and drop the
      // appended arg/out columns
      val restore = child.output.map { a =>
        Alias(remap.getOrElse(a.exprId, a), a.name)(exprId = a.exprId)
      }
      Project(restore, Filter(newCond, newChild))
  }

  /** Thread `child` through one applyRows stage per distinct python
    * call found in `exprs`. Returns (new child plan, old->new attribute
    * map for the original child's output, call->output-attribute map).
    */
  private def lowerCalls(
      exprs: Seq[Expression],
      child: LogicalPlan)
      : (LogicalPlan, Map[org.apache.spark.sql.catalyst.expressions.ExprId, Attribute],
         Seq[(ScalaUDF, Attribute)]) = {
    val origPos: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Int] =
      child.output.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
    val calls = {
      val found = scala.collection.mutable.ArrayBuffer.empty[(ScalaUDF, PyScalarUdf.PyFn)]
      exprs.foreach(_.foreach { e =>
        asPyCall(e).foreach { c =>
          // only lower calls whose references all resolve in the child
          // (an outer/correlated reference keeps the per-row fallback)
          if (c._1.references.forall(r => origPos.contains(r.exprId)) &&
              !found.exists(_._1.semanticEquals(c._1))) found += c
        }
      })
      found.toSeq
    }
    val n = child.output.length
    var cur: LogicalPlan = child
    for (((call, fn), i) <- calls.zipWithIndex) {
      // map the call's arguments onto `cur`: the original child's i-th
      // output is always `cur`'s i-th output (every stage appends at
      // the end), so original attribute references map by position;
      // non-attribute args are evaluated natively in a pre-projection
      // rewritten onto `cur`'s attributes
      val argCols = scala.collection.mutable.ArrayBuffer.empty[Int]
      val extraAliases = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
      call.children.zipWithIndex.foreach { case (arg, j) =>
        arg match {
          case a: AttributeReference if origPos.contains(a.exprId) =>
            argCols += origPos(a.exprId)
          case other =>
            val onCur = other.transform {
              case att: AttributeReference if origPos.contains(att.exprId) =>
                cur.output(origPos(att.exprId))
            }
            extraAliases += Alias(onCur, s"__pyarg_${i}_$j")()
            argCols += (cur.output.length + extraAliases.length - 1)
        }
      }
      if (extraAliases.nonEmpty)
        cur = Project(cur.output ++ extraAliases, cur)
      val outName = s"__pyout_$i"
      val lowered = PythonScriptUdf.applyRows(
        GraftPlanBridge.ofRows(spark, cur),
        StructType(Seq(StructField(outName, fn.ret, nullable = true))),
        fn.handler, fn.source, argIdx = argCols.toSeq, label = fn.name)
      cur = lowered.queryExecution.analyzed
    }
    // resolve output attributes against the FINAL plan: a later stage's
    // analysis can re-create an earlier stage's serializer attributes
    // (fresh exprIds), so per-stage captures would dangle
    val byName = cur.output.map(a => a.name -> a).toMap
    val callOutResolved = calls.zipWithIndex.map { case ((call, _), i) =>
      (call, byName(s"__pyout_$i"))
    }
    // positional remap: applyRows preserves input column order, so the
    // original child's i-th output is the new plan's i-th output
    val remap = child.output.map(_.exprId).zip(cur.output.take(n)).toMap
    (cur, remap, callOutResolved)
  }

  private def substitute(
      e: Expression,
      remap: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Attribute],
      callOut: Seq[(ScalaUDF, Attribute)]): Expression = e match {
    case a @ Alias(inner, name) =>
      Alias(substitute(inner, remap, callOut), name)(
        exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = a.explicitMetadata)
    case a: AttributeReference if remap.contains(a.exprId) =>
      // a bare column in a select list: keep its public identity
      Alias(remap(a.exprId), a.name)(exprId = a.exprId)
    case other => substituteInner(other, remap, callOut)
  }

  private def substituteInner(
      e: Expression,
      remap: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Attribute],
      callOut: Seq[(ScalaUDF, Attribute)]): Expression =
    callOut.find(_._1.semanticEquals(e)) match {
      case Some((_, attr)) => attr
      case None => e match {
        case a: AttributeReference => remap.getOrElse(a.exprId, a)
        case _ =>
          e.withNewChildren(e.children.map(substituteInner(_, remap, callOut)))
      }
    }
}
