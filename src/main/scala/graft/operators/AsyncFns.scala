package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The reference's async scalar functions
  * (src/query/sql/src/planner/plans/scalar_expr.rs:1296-1311)
  * re-expressed Spark-first:
  *
  *  - `nextval(sequence)` — cluster-unique id assignment backed by a
  *    persisted high-water mark. Uniqueness and monotonicity above the
  *    mark are guaranteed; density is NOT (the reference's sequences
  *    allow gaps too), which is what makes assignment a pure map-side
  *    operation at 100 TB — no global ordering shuffle.
  *  - `dict_get(dim, key)` — dimension lookup as a broadcast join of a
  *    dictionary snapshot (the reference calls out to redis/mysql per
  *    batch; a snapshot join is the Spark-shaped equivalent).
  */
object AsyncFns {

  /** CREATE SEQUENCE: a named, persisted high-water mark.
    *
    * Single-writer per sequence within one JVM: reserve/advance is
    * serialized through a process-wide lock per sequence file, and the
    * hwm write is an atomic tmp-file rename so a concurrent reader never
    * observes a torn file. Cross-process writers need external
    * coordination (same caveat as GraftTable's single-writer contract).
    */
  final class GraftSequence private[AsyncFns] (dir: String, val name: String) {
    private def file = Paths.get(dir, s"_graft_seq_$name.json")
    private def lock = AsyncFns.lockFor(file.toString)

    def highWaterMark: Long = {
      val s = Files.readString(file)
      "\"hwm\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(s).get.group(1).toLong
    }

    private[AsyncFns] def setHwm(v: Long): Unit = {
      val tmp = Paths.get(dir, s"_graft_seq_$name.json.tmp")
      Files.writeString(tmp, s"""{"hwm": $v}""")
      Files.move(tmp, file,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    /** nextval over a whole DataFrame: adds `colName` with ids strictly
      * above the high-water mark, unique across partitions
      * (monotonically_increasing_id packs partition id in the high
      * bits — no shuffle, no driver round-trip per row). Advances the
      * mark past everything assigned.
      *
      * localCheckpoint (not cache) pins the assigned ids: a cached plan
      * could be evicted and recomputed with different partition layouts,
      * letting downstream reads observe ids that were never reserved.
      */
    def nextval(df: DataFrame, colName: String): DataFrame = lock.synchronized {
      val start = highWaterMark + 1
      val out = df.withColumn(colName, monotonically_increasing_id() + lit(start))
        .localCheckpoint()
      val maxRow = out.agg(max(col(colName))).collect()(0)
      // empty input: nothing assigned, leave the mark untouched
      if (!maxRow.isNullAt(0)) setHwm(maxRow.getLong(0))
      out
    }
  }

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    locks.computeIfAbsent(key, _ => new Object)

  /** keys of every driver-side lock ever taken (system.locks view) */
  def lockKeys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    locks.keySet().asScala.toSeq.sorted
  }

  def createSequence(dir: String, name: String): GraftSequence = {
    Files.createDirectories(Paths.get(dir))
    val s = new GraftSequence(dir, name)
    s.setHwm(0L)
    s
  }

  def openSequence(dir: String, name: String): GraftSequence =
    new GraftSequence(dir, name)

  /** dict_get: enrich `df` with `dict`'s value for `key`, falling back
    * to `default` on a miss — a broadcast left join, so the dictionary
    * ships once per executor instead of one lookup RPC per row.
    */
  def dictGet(df: DataFrame, dict: DataFrame, key: String,
              valueCol: String, default: Column): DataFrame = {
    val d = dict.select(col(key).as(s"__dict_$key"), col(valueCol).as(s"__dict_$valueCol"))
    df.join(broadcast(d), col(key) === col(s"__dict_$key"), "left")
      .withColumn(valueCol, coalesce(col(s"__dict_$valueCol"), default))
      .drop(s"__dict_$key", s"__dict_$valueCol")
  }

  /** dict_get by name: resolve a dictionary registered in
    * `SystemTables.Dictionaries` (CREATE DICTIONARY metadata — source
    * path + key/value columns) and apply the same broadcast lookup.
    */
  def dictGet(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
              dictName: String, default: Column): DataFrame = {
    val d = SystemTables.Dictionaries.list.find(_.name == dictName).getOrElse(
      throw new IllegalArgumentException(s"unknown dictionary $dictName"))
    val src = spark.read.parquet(d.source.stripPrefix("file://"))
    dictGet(df, src, d.keyCol, d.valueCol, default)
  }
}
