package graft

import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Storage semantics: snapshots, time travel, file-granular DML,
  * CDC change feed, COPY INTO idempotence.
  */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-storage-test")
  private def tmp(): String = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "gt").toString
  }

  test("append / overwrite / time travel") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, Seq((1, "a"), (2, "b")).toDF("k", "v"))
    assert(t.currentVersion == 0)
    assert(t.read().count() == 2)

    t.append(Seq((3, "c")).toDF("k", "v"))
    assert(t.currentVersion == 1)
    assert(t.read().count() == 3)
    assert(t.readAt(0).count() == 2)                   // AT (SNAPSHOT => 0)

    val ts0 = t.snapshot(0).timestampMs
    assert(t.readAsOf(ts0).count() == 2)               // AT (TIMESTAMP => ...)

    t.overwrite(Seq((9, "z")).toDF("k", "v"))
    assert(t.read().count() == 1)
    assert(t.readAt(1).count() == 3)                   // history preserved
  }

  test("delete / update rewrite only touched files") {
    import spark.implicits._
    val dir = tmp()
    // two separate appends => at least two files; delete touches one
    val t = GraftTable.create(spark, dir, (1 to 10).map(i => (i, "lo")).toDF("k", "v"))
    t.append((11 to 20).map(i => (i, "hi")).toDF("k", "v"))
    val filesBefore = t.snapshot(t.currentVersion).files.toSet

    t.delete(col("k") === 15)
    assert(t.read().count() == 19)
    val filesAfter = t.snapshot(t.currentVersion).files.toSet
    // files holding only k=1..10 survive untouched
    assert(filesBefore.intersect(filesAfter).nonEmpty)

    t.update(col("k") <= 2, Map("v" -> lit("XX")))
    val got = t.read().filter(col("v") === "XX").count()
    assert(got == 2)
  }

  test("merge upserts by key") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.mergeByKey(Seq((2, "B2"), (5, "E")).toDF("k", "v"), "k")
    val rows = t.read().orderBy("k").as[(Int, String)].collect().toSeq
    assert(rows == Seq((1, "a"), (2, "B2"), (5, "E")))
  }

  test("changes: append-only fast path and row-diff path") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"))
    val cdc01 = t.changes(0, 1)
    assert(cdc01.count() == 1)
    assert(cdc01.select("change$action").head().getString(0) == "INSERT")

    t.delete(col("k") === 1)
    val cdc12 = t.changes(1, 2).orderBy("k")
    val acts = cdc12.select(col("k"), col("change$action")).as[(Int, String)].collect().toSeq
    assert(acts == Seq((1, "DELETE")))
  }

  test("changesAsOf resolves the version pair by timestamp (fuse CHANGES AT)") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), Seq((1, "a")).toDF("k", "v"))
    Thread.sleep(5)
    val midTs = System.currentTimeMillis()
    Thread.sleep(5)
    t.append(Seq((2, "b")).toDF("k", "v"))
    t.append(Seq((3, "c")).toDF("k", "v"))
    // as of midTs only version 0 existed -> changes since then = rows 2,3
    assert(t.versionAsOf(midTs) == 0)
    val rows = t.changesAsOf(midTs).orderBy("k")
      .select(col("k"), col("change$action")).as[(Int, String)].collect().toSeq
    assert(rows == Seq((2, "INSERT"), (3, "INSERT")))
    // offset form: everything within the last hour = same interval or more
    assert(t.changesOffset(3600).count() >= 2)
    // before the table existed -> error
    intercept[IllegalArgumentException](t.versionAsOf(0L))
  }

  test("copy into is idempotent per file") {
    import spark.implicits._
    val dir = tmp()
    val stage = tmp()
    Seq((1, "x")).toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage + "/f1")
    Seq((2, "y")).toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage + "/f2")
    // flatten stage: move part files up with stable names
    val s = Paths.get(stage)
    Seq("f1", "f2").foreach { d =>
      val part = Files.list(s.resolve(d)).iterator()
      var moved = false
      while (part.hasNext) {
        val f = part.next()
        if (f.toString.endsWith(".parquet")) { Files.move(f, s.resolve(d + ".parquet")); moved = true }
      }
      assert(moved)
    }

    val t = GraftTable.create(spark, tmp(), Seq.empty[(Int, String)].toDF("k", "v"))
    val (loaded1, skipped1) = t.copyInto(stage)
    assert(loaded1.size == 2 && skipped1.isEmpty)
    assert(t.read().count() == 2)

    val (loaded2, skipped2) = t.copyInto(stage)     // rerun: all skipped
    assert(loaded2.isEmpty && skipped2.size == 2)
    assert(t.read().count() == 2)

    Seq((3, "z")).toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage + "/f3")
    val part3 = Files.list(s.resolve("f3")).iterator()
    while (part3.hasNext) {
      val f = part3.next()
      if (f.toString.endsWith(".parquet")) Files.move(f, s.resolve("f3.parquet"))
    }
    val (loaded3, skipped3) = t.copyInto(stage)     // only the new file
    assert(loaded3 == Seq("f3.parquet") && skipped3.size == 2)
    assert(t.read().count() == 3)
  }

  test("named STREAM cursor: hasData, consume advances, append-only mode") {
    import spark.implicits._
    import graft.sources.GraftStream
    val t = GraftTable.create(spark, tmp(), Seq((1, "a")).toDF("k", "v"))
    val s = GraftStream.create(t, "s1")                     // CREATE STREAM
    assert(!s.hasData)                                      // starts empty

    t.append(Seq((2, "b"), (3, "c")).toDF("k", "v"))
    assert(s.hasData)
    assert(s.read().count() == 2)                           // peek, no advance
    assert(s.read().count() == 2)

    val n = s.consume(_.count())                            // task consumes
    assert(n == 2 && !s.hasData)
    assert(s.read().count() == 0)

    // re-open by name: offset persisted
    val s2 = GraftStream.open(t, "s1")
    assert(s2.offset == s.offset)

    // append-only stream ignores the DELETE half of a rewrite
    val ao = GraftStream.create(t, "ao", GraftStream.AppendOnly)
    t.update(col("k") === 2, Map("v" -> lit("B")))
    val acts = ao.read().select("change$action").distinct().as[String].collect()
    assert(acts.toSet == Set("INSERT"))
  }

  test("changesByKey pairs UPDATE halves with change$is_update") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(),
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    val v0 = t.currentVersion
    t.update(col("k") === 2, Map("v" -> lit("B")))
    t.append(Seq((4, "d")).toDF("k", "v"))
    val ch = t.changesByKey(v0, t.currentVersion, "k")
      .select(col("k"), col("change$action"), col("change$is_update"))
      .as[(Int, String, Boolean)].collect().toSet
    assert(ch.contains((2, "INSERT", true)) && ch.contains((2, "DELETE", true)))
    assert(ch.contains((4, "INSERT", false)))
    assert(!ch.exists { case (k, _, upd) => k != 2 && upd })
  }

  test("analyze persists ndv/min/max stats; fastCount answers from metadata") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(),
      (1 to 1000).map(i => (i.toLong, s"v${i % 10}")).toDF("k", "v"))
    assert(t.fastCount().isEmpty)            // no stats yet

    val st = t.analyze()
    assert(st.rowCount == 1000)
    assert(st.cols("v").ndv >= 9 && st.cols("v").ndv <= 11)   // approx NDV
    assert(st.cols("k").min == "1" && st.cols("k").max == "1000")
    assert(st.cols("k").nullCount == 0)

    // reopen: stats survive and fastCount uses them
    val t2 = GraftTable.open(spark, t.path)
    assert(t2.fastCount().contains(1000L))
    assert(t2.stats().get.cols("v").ndv == st.cols("v").ndv)

    // stale after a write: fastCount refuses, stats() still available
    t2.append(Seq((1001L, "x")).toDF("k", "v"))
    assert(t2.fastCount().isEmpty)
    assert(t2.stats().nonEmpty)
  }

  test("compact merges small files; vacuum drops unreferenced history") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(spark, dir, (1 to 100).toDF("x").repartition(8))
    t.append((101 to 200).toDF("x").repartition(8))
    val before = t.snapshot(t.currentVersion).files.size
    assert(before > 4)

    t.compact(targetFiles = 2)
    assert(t.snapshot(t.currentVersion).files.size <= 2)
    assert(t.read().count() == 200)
    // history still time-travels to the uncompacted snapshot
    assert(t.readAt(1).count() == 200)

    val onDiskBefore = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    val deleted = t.vacuum(keepVersions = 1)
    assert(deleted.nonEmpty)
    val onDiskAfter = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    assert(onDiskAfter == onDiskBefore - deleted.size)
    assert(t.read().count() == 200)          // current version intact
    assert(t.versions == Seq(t.currentVersion)) // old log entries gone
  }

  test("TASK-style incremental pipeline: stream feeds a derived table") {
    import spark.implicits._
    import graft.sources.GraftStream
    // reference: CREATE TASK ... WHEN stream_has_data — consume the
    // stream's pending changes into a running per-key aggregate table
    val src = GraftTable.create(spark, tmp(), Seq(("a", 1)).toDF("k", "v"))
    val feed = GraftStream.create(src, "task_feed", GraftStream.AppendOnly)
    val agg = GraftTable.create(spark, tmp(), Seq.empty[(String, Long)].toDF("k", "n"))

    def runTask(): Boolean =
      feed.hasData && feed.consume { ch =>
        agg.append(ch.groupBy("k").count().select(col("k"), col("count").as("n")))
        true
      }

    src.append(Seq(("a", 2), ("b", 3)).toDF("k", "v"))
    assert(runTask())                             // consumes batch 1
    src.append(Seq(("b", 4)).toDF("k", "v"))
    assert(runTask())                             // consumes batch 2
    assert(!runTask())                            // nothing pending -> no-op

    // the derived table's re-aggregation equals a full recompute of
    // everything that flowed through the stream (initial row predates
    // the cursor, so it is not part of the feed)
    val derived = agg.read().groupBy("k").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toSet
    assert(derived == Set(("a", 1L), ("b", 2L)))
  }

  test("multi-table INSERT ALL / INSERT FIRST") {
    import spark.implicits._
    import graft.sources.MultiInsert
    val src = Seq((1, 10), (2, 150), (3, 250)).toDF("k", "amt")

    val lo = GraftTable.create(spark, tmp(), Seq.empty[(Int, Int)].toDF("k", "amt"))
    val hi = GraftTable.create(spark, tmp(), Seq.empty[(Int, Int)].toDF("k", "amt"))
    MultiInsert.insertAll(src, Seq(
      (col("amt") < 200) -> lo,                   // rows 1,2
      (col("amt") > 100) -> hi))                  // rows 2,3 (overlap OK)
    assert(lo.read().count() == 2 && hi.read().count() == 2)

    val first = GraftTable.create(spark, tmp(), Seq.empty[(Int, Int)].toDF("k", "amt"))
    val rest = GraftTable.create(spark, tmp(), Seq.empty[(Int, Int)].toDF("k", "amt"))
    MultiInsert.insertFirst(src, Seq(
      (col("amt") < 200) -> first,                // rows 1,2
      (col("amt") > 100) -> rest))                // only row 3 (2 already taken)
    assert(first.read().count() == 2)
    assert(rest.read().as[(Int, Int)].collect().toSeq == Seq((3, 250)))
  }

  test("bloom-indexed columns write parquet bloom filters") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile

    val dir = tmp()
    val t = GraftTable.create(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    t.setBloomColumns(Seq("k"))
    t.append((1L to 5000L).map(i => (i, s"v$i")).toDF("k", "v"))
    assert(t.bloomColumns == Seq("k"))

    // the appended files carry a bloom filter for k and none for v
    val files = t.snapshot(t.currentVersion).files.map(f => s"$dir/$f")
    val conf = spark.sparkContext.hadoopConfiguration
    val withBloom = files.exists { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val rg = reader.getRowGroups.get(0)
        val kCol = rg.getColumns.asScala.find(_.getPath.toDotString == "k").get
        val vCol = rg.getColumns.asScala.find(_.getPath.toDotString == "v").get
        val bloomK = reader.getBloomFilterDataReader(rg).readBloomFilter(kCol)
        val bloomV = reader.getBloomFilterDataReader(rg).readBloomFilter(vCol)
        bloomK != null && bloomV == null
      } finally reader.close()
    }
    assert(withBloom, "expected at least one appended file with a bloom filter on k only")

    // reads with an equality probe still return correct results
    assert(t.read().filter(col("k") === 4321L).count() == 1)
  }

  test("INSERT FIRST: NULL branch condition means no-match, row falls through") {
    import spark.implicits._
    import graft.sources.MultiInsert
    // amt NULL -> branch-1 condition evaluates to SQL NULL: WHEN
    // semantics treat that as false, so the row must reach branch 2's
    // catch-all instead of vanishing
    val src = Seq((1, Integer.valueOf(10)), (2, null.asInstanceOf[Integer]))
      .toDF("k", "amt")
    val a = GraftTable.create(spark, tmp(), Seq.empty[(Int, Integer)].toDF("k", "amt"))
    val b = GraftTable.create(spark, tmp(), Seq.empty[(Int, Integer)].toDF("k", "amt"))
    MultiInsert.insertFirst(src, Seq(
      (col("amt") < 200) -> a,                    // row 1 only (NULL skips)
      lit(true) -> b))                            // row 2 lands here
    assert(a.read().select("k").as[Int].collect().toSeq == Seq(1))
    assert(b.read().select("k").as[Int].collect().toSeq == Seq(2))
  }
}
