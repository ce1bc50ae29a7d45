package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import java.nio.file.{Files, Paths}

/** Named CDC cursor over a [[GraftTable]] — the reference's STREAM
  * object (src/query/storages/stream/src/stream_table.rs; modes
  * Standard / AppendOnly at
  * src/query/storages/fuse/src/operations/changes.rs:131-168).
  *
  * A stream is just a persisted version offset: reading shows the
  * table's changes SINCE the offset, and `consume` advances the offset
  * to the version that was read (the reference advances on use inside
  * a transaction; here the consume callback is the transaction). The
  * cursor is metadata-only — no data is copied, which is what makes
  * streams free at 100 TB.
  */
final class GraftStream private (
    val table: GraftTable,
    val name: String,
    val mode: GraftStream.Mode) {
  import GraftStream._

  private def cursorFile =
    Paths.get(table.path, s"_graft_stream_$name.json")

  /** Last consumed version; changes are reported AFTER this. */
  def offset: Long = {
    val s = Files.readString(cursorFile)
    "\"offset\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(s).get.group(1).toLong
  }

  private[graft] def setOffset(v: Long): Unit =
    Files.writeString(cursorFile, s"""{"offset": $v}""")

  /** reference: `stream_has_data` in CREATE TASK ... WHEN */
  def hasData: Boolean = table.currentVersion > offset

  /** Changes since the offset, without advancing it. */
  def read(): DataFrame = readUpTo(table.currentVersion)

  private def readUpTo(v: Long): DataFrame = {
    // change$is_update: the reference pairs UPDATE halves via row
    // lineage ids; the snapshot-diff feed has no lineage, so plain
    // INSERT/DELETE is reported (false) — UPDATEs appear as their two
    // halves un-paired (divergence documented in COVERAGE.md)
    val df = table.changes(offset, v)
      .withColumn("change$is_update", lit(false))
    mode match {
      case Standard   => df
      case AppendOnly => df.filter(col("change$action") === "INSERT")
    }
  }

  /** Run `f` over the pending changes, then advance the offset to the
    * version that was read (exactly-once consumption, assuming `f`
    * itself is idempotent/transactional like the reference's task).
    */
  def consume[T](f: DataFrame => T): T = {
    val upTo = table.currentVersion
    val result = f(readUpTo(upTo))
    setOffset(upTo)
    result
  }
}

object GraftStream {
  sealed trait Mode
  case object Standard extends Mode
  case object AppendOnly extends Mode

  /** CREATE STREAM ON TABLE — cursor starts at the current version, so
    * only subsequent changes are visible.
    */
  def create(table: GraftTable, name: String, mode: Mode = Standard): GraftStream = {
    val s = new GraftStream(table, name, mode)
    s.setOffset(table.currentVersion)
    s
  }

  /** Re-open an existing stream cursor by name. */
  def open(table: GraftTable, name: String, mode: Mode = Standard): GraftStream =
    new GraftStream(table, name, mode)
}

/** Multi-table INSERT (reference: INSERT ALL / INSERT FIRST,
  * src/query/sql/src/planner/plans/insert_multi_table.rs): one source
  * scan fans out into per-branch appends.
  */
object MultiInsert {

  /** INSERT ALL: every branch whose condition matches receives the row. */
  def insertAll(source: DataFrame,
                branches: Seq[(org.apache.spark.sql.Column, GraftTable)]): Unit = {
    val cached = source.cache()
    try branches.foreach { case (cond, t) => t.append(cached.filter(cond)) }
    finally cached.unpersist()
  }

  /** INSERT FIRST: each row goes only to the first branch whose
    * condition matches (reference semantics: WHEN clauses evaluated in
    * order).
    */
  def insertFirst(source: DataFrame,
                  branches: Seq[(org.apache.spark.sql.Column, GraftTable)]): Unit = {
    val cached = source.cache()
    try {
      var notPrior: org.apache.spark.sql.Column = org.apache.spark.sql.functions.lit(true)
      branches.foreach { case (cond, t) =>
        // WHEN semantics: a NULL condition is "did not match", so the row
        // must stay eligible for later branches — null-safe the
        // accumulator with <=> (plain `&& !cond` turns NULL into NULL and
        // drops the row from every subsequent filter)
        val matched = cond <=> org.apache.spark.sql.functions.lit(true)
        t.append(cached.filter(notPrior && matched))
        notPrior = notPrior && !matched
      }
    } finally cached.unpersist()
  }
}
