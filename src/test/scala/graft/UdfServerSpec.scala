package graft

import graft.functions.UdfServer
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** External UDF-server operator (reference transform_udf_server.rs,
  * Arrow-Flight in the reference; plain-socket Arrow IPC here — the
  * transport substitution is documented in UdfServer's scaladoc). The
  * spec runs a real external server process (python3 + pyarrow) and
  * drives multi-partition batches through it.
  */
class UdfServerSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-udfserver-test")

  private val serverPy =
    """import json, socketserver, sys, threading
      |import pyarrow as pa
      |
      |class H(socketserver.StreamRequestHandler):
      |    def handle(self):
      |        hdr = json.loads(self.rfile.readline().decode())
      |        rdr = pa.ipc.open_stream(self.rfile)
      |        wtr = None
      |        for b in rdr:
      |            ids = b.column(0).to_pylist()
      |            xs = b.column(1).to_pylist()
      |            if hdr["fn"] == "affine":
      |                ys = [None if (i is None or x is None) else 2.0 * x + i
      |                      for i, x in zip(ids, xs)]
      |            else:
      |                raise ValueError("unknown fn " + hdr["fn"])
      |            ob = pa.record_batch(
      |                [pa.array(ys, type=pa.float64())],
      |                names=[hdr["outputs"][0][0]])
      |            if wtr is None:
      |                wtr = pa.ipc.new_stream(self.wfile, ob.schema)
      |            wtr.write_batch(ob)
      |            self.wfile.flush()
      |        if wtr is not None:
      |            wtr.close()
      |            self.wfile.flush()
      |
      |srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), H)
      |print("PORT=%d" % srv.server_address[1], flush=True)
      |srv.serve_forever()
      |""".stripMargin

  test("external server transforms multi-partition Arrow batches") {
    assume(graft.functions.PythonScriptUdf.available, "python3+pyarrow not on this host")
    val proc = new ProcessBuilder("python3", "-c", serverPy)
      .redirectErrorStream(false).start()
    try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val portLine = r.readLine()
      assert(portLine != null && portLine.startsWith("PORT="), s"server did not start: $portLine")
      val port = portLine.stripPrefix("PORT=").toInt

      import spark.implicits._
      val in = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
        .toDF("id", "x").repartition(2)
      val out = UdfServer.applyRows(in,
        StructType(Seq(StructField("y", DoubleType))), "affine", "127.0.0.1", port)
        .orderBy("id").collect()
      assert(out.map(r0 => (r0.getLong(0), r0.getDouble(2))).toSeq ==
        Seq((1L, 21.0), (2L, 42.0), (3L, 63.0), (4L, 84.0)))
    } finally proc.destroyForcibly()
  }

  test("unknown function fails the task with the server error surfaced") {
    assume(graft.functions.PythonScriptUdf.available, "python3+pyarrow not on this host")
    val proc = new ProcessBuilder("python3", "-c", serverPy).start()
    try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val port = r.readLine().stripPrefix("PORT=").toInt
      import spark.implicits._
      val in = Seq((1L, 1.0)).toDF("id", "x")
      val ex = intercept[Exception] {
        UdfServer.applyRows(in,
          StructType(Seq(StructField("y", DoubleType))), "nope", "127.0.0.1", port)
          .collect()
      }
      def chain(e: Throwable): String =
        if (e == null) "" else e.getMessage + "|" + chain(e.getCause)
      assert(chain(ex).contains("UDF server"))
    } finally proc.destroyForcibly()
  }
}
