package graft.functions

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ArrayBlockingQueue
import scala.jdk.CollectionConverters._

/** External UDF-server client (reference: databend's UDFServer transform,
  * src/query/service/src/pipelines/processors/transforms/transform_udf_server.rs
  * — each input block goes to a user-operated server as an Arrow
  * RecordBatch and an output batch comes back).
  *
  * Transport note: the reference speaks Arrow Flight (gRPC). This build
  * has no Flight/gRPC jars (offline, fixed dependency set), so the
  * client speaks the SAME data plane — an Arrow IPC stream each way,
  * batch-per-block, preceded by one JSON header line naming the
  * function — over a plain TCP socket. Every operator-level property of
  * the reference's UDFServer holds: the server is external and
  * long-lived, one connection per partition task (the reference pools
  * connections per pipeline), batches stream without buffering the
  * partition, and a server failure fails only that task. Swapping the
  * socket for a Flight DoExchange when the jars exist is a transport
  * change, not an operator change.
  *
  * Protocol: client sends
  *   `{"fn": <name>, "outputs": [[name, type], ...]}\n`
  * then an Arrow IPC stream of input batches; server replies with an
  * Arrow IPC stream of output batches, row counts matching 1:1.
  */
object UdfServer {

  def applyRows(
      df: DataFrame,
      outputs: StructType,
      fn: String,
      host: String,
      port: Int,
      batchSize: Int = 8192,
      connectTimeoutMs: Int = 10000): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ outputs.fields)
    (inSchema.fields ++ outputs.fields).foreach(f => ScriptUdf.arrowType(f.dataType))
    val enc = Encoders.row(outSchema)
    val header = {
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val outs = outputs.fields
        .map(f => s"[${q(f.name)},${q(f.dataType.simpleString)}]").mkString(",")
      s"""{"fn":${q(fn)},"outputs":[$outs]}\n"""
    }
    val inFields = inSchema.fields
    val nIn = inFields.length

    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else new Iterator[Row] {
        private val sock = new Socket()
        sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
        sock.setTcpNoDelay(true)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => { try sock.close() catch { case _: Exception => () }; () }))
        private val out = sock.getOutputStream
        out.write(header.getBytes(StandardCharsets.UTF_8))
        out.flush()

        private val inflight = new ArrayBlockingQueue[Seq[Row]](4)
        private val alloc = new RootAllocator(Long.MaxValue)
        @volatile private var writeErr: Throwable = null
        private val writer = {
          val t = new Thread(() => {
            val root = VectorSchemaRoot.create(
              new ArrowSchema(inFields.map(f => new Field(f.name,
                new FieldType(true, ScriptUdf.arrowType(f.dataType), null), null)).toSeq.asJava),
              alloc)
            val w = new ArrowStreamWriter(root, null, out)
            try {
              w.start()
              rows.grouped(batchSize).foreach { batch =>
                root.allocateNew()
                batch.zipWithIndex.foreach { case (row, i) =>
                  var c = 0
                  while (c < nIn) {
                    ScriptUdf.writeCell(root.getVector(c), i,
                      if (row.isNullAt(c)) null else row.get(c))
                    c += 1
                  }
                }
                root.setRowCount(batch.size)
                inflight.put(batch)
                w.writeBatch()
              }
              w.end()
            } catch { case e: Throwable => writeErr = e }
            finally {
              try sock.shutdownOutput() catch { case _: Exception => () }
              root.close()
            }
          }, "udf-server-writer")
          t.setDaemon(true); t.start(); t
        }

        private val reader = new ArrowStreamReader(sock.getInputStream, alloc)
        private var pending: Iterator[Row] = Iterator.empty
        private var done = false

        private def fail(cause: Throwable): Nothing = {
          try sock.close() catch { case _: Exception => () }
          throw new RuntimeException(
            s"UDF server $host:$port failed for function '$fn'", cause)
        }

        private def advance(): Unit = {
          if (done || pending.hasNext) return
          val more =
            try reader.loadNextBatch()
            catch { case e: Throwable => if (writeErr != null) fail(writeErr) else fail(e) }
          if (!more) {
            done = true
            if (writeErr != null) fail(writeErr)
            reader.close(); alloc.close()
            try sock.close() catch { case _: Exception => () }
          } else {
            val o = reader.getVectorSchemaRoot
            val inRows = inflight.take()
            require(o.getRowCount == inRows.size,
              s"UDF server returned ${o.getRowCount} rows for a ${inRows.size}-row batch")
            val nOut = o.getFieldVectors.size()
            pending = inRows.iterator.zipWithIndex.map { case (in, i) =>
              Row.fromSeq(in.toSeq ++ (0 until nOut).map(c => ScriptUdf.readCell(o.getVector(c), i)))
            }
          }
        }

        override def hasNext: Boolean = { advance(); pending.hasNext }
        override def next(): Row = { advance(); pending.next() }
      }
    }(enc)
  }
}
