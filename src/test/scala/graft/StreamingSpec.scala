package graft

import graft.streaming.GraftStreams
import graft.streaming.GraftStreams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming: file-source windowed aggregation matches the
  * batch computation; stateful sessionization (flatMapGroupsWithState)
  * closes sessions across micro-batches.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-streaming-test")
  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts == batch windowed counts") {
    val batchEvents = Tables(spark, sf).events
    // file source needs a directory: stage the single parquet file
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target", "tmp", "stream_events"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val tsFix =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts").cast("timestamp")
    val streamEvents = spark.readStream.schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", tsFix)

    val q = GraftStreams.windowedCounts(streamEvents)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_counts").orderBy("ws", "event_type").collect()
    val batch = GraftStreams.windowedCounts(batchEvents).orderBy("ws", "event_type").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch))
    assert(streamed.nonEmpty)
  }

  test("stateful sessionization across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val gap = 1000L

    val sessions = GraftStreams.sessionize(mem.toDS(), gap)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess").start()

    // batch 1: user 1 two events in one session; user 2 one event
    mem.addData(Ev(1, 100), Ev(1, 600), Ev(2, 50))
    q.processAllAvailable()
    // batch 2: user 1 far-future event -> closes first session
    mem.addData(Ev(1, 10000))
    q.processAllAvailable()
    // batch 3: user 2 close event (same session), then far event -> closes
    mem.addData(Ev(2, 800), Ev(2, 99999))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sess").as[GraftStreams.SessionOut]
      .collect().map(s => (s.user_id, s.session_start, s.n_events)).toSet
    assert(closed.contains((1L, 100L, 2)))   // user 1 first session closed with 2 events
    assert(closed.contains((2L, 50L, 2)))    // user 2 session (50, 800) closed
  }

  test("stream-stream interval join attributes clicks within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L // away from epoch 0 so watermark math is sane
    def ts(s: Long) = new java.sql.Timestamp((base + s) * 1000L)

    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = GraftStreams.attributeClicks(
      imps.toDF().toDF("user_id", "ts"),
      clicks.toDF().toDF("user_id", "ts"),
      within = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()

    imps.addData((1L, ts(0)), (2L, ts(0)))
    clicks.addData((1L, ts(600)))            // within 30 min -> attributed
    q.processAllAvailable()
    clicks.addData((2L, ts(3600)))           // 1h later -> NOT attributed
    clicks.addData((1L, ts(1200)))           // second click, also within
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib")
      .select("user_id", "click_ts").as[(Long, java.sql.Timestamp)]
      .collect().map { case (u, c) => (u, c.getTime / 1000 - 1700000000L) }.toSet
    assert(rows == Set((1L, 600L), (1L, 1200L)))

    // identical transform over batch frames gives the same answer
    val bImps = Seq((1L, ts(0)), (2L, ts(0))).toDF("user_id", "ts")
    val bClicks = Seq((1L, ts(600)), (2L, ts(3600)), (1L, ts(1200))).toDF("user_id", "ts")
    val batch = GraftStreams.attributeClicks(bImps, bClicks)
      .select("user_id", "click_ts").as[(Long, java.sql.Timestamp)]
      .collect().map { case (u, c) => (u, c.getTime / 1000 - 1700000000L) }.toSet
    assert(batch == rows)
  }

  test("open-session flush matches batch sessionize semantics") {
    import spark.implicits._
    val evs = Seq(Ev(7, 0), Ev(7, 500), Ev(7, 5000), Ev(8, 10)).toDS()
    val out = GraftStreams.openSessions(evs, 1000L).collect()
      .map(s => (s.user_id, s.session_start, s.n_events)).toSet
    assert(out == Set((7L, 0L, 2), (7L, 5000L, 1), (8L, 10L, 1)))
  }
}
