package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF0, UDF1, UDF2, UDF3, UDF4}
import org.apache.spark.sql.types._

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Scalar Python UDFs registered into Spark's function registry, so
  * `CREATE FUNCTION ... LANGUAGE python` (reference UDF DDL,
  * src/query/ast/src/ast/statements/udf.rs) is callable anywhere a SQL
  * scalar can appear — Catalyst sees an ordinary registered UDF.
  *
  * Execution model: a pool of persistent python3 workers per JVM (one
  * is created per concurrently-executing task the first time it needs
  * one, then reused), speaking newline-delimited JSON request/response
  * over stdin/stdout. This is the scalar row-at-a-time path — the hop
  * per row is what the reference's UDFServer pays per batch; for bulk
  * columns use [[PythonScriptUdf.applyRows]] (Arrow batches) instead.
  * JSON covers the scalar types a SQL function signature declares:
  * int/bigint/float/double/string/boolean plus arrays of them.
  */
object PyScalarUdf {

  final case class PyFn(name: String, argTypes: Seq[DataType], ret: DataType,
                        handler: String, source: String)

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, PyFn]()

  def registered: Seq[PyFn] = registry.values.asScala.toSeq.sortBy(_.name)

  /** Lookup for the batch-lowering rule ([[graft.plans.PyUdfBatchRule]]). */
  def lookup(name: String): Option[PyFn] =
    Option(registry.get(name)).orElse(Option(registry.get(name.toLowerCase)))

  /** Rows evaluated through the per-row JSON fallback path — the batch
    * rule's spec asserts this stays 0 when the plan was lowered to the
    * Arrow engine.
    */
  val rowCalls = new java.util.concurrent.atomic.AtomicLong(0)

  private final class Worker(fn: PyFn) {
    private val program = {
      val srcLit = "\"\"\"" + fn.source.replace("\\", "\\\\").replace("\"", "\\\"") + "\"\"\""
      s"""import sys, json
         |ns = {}
         |exec(compile($srcLit, '<udf>', 'exec'), ns)
         |fn = ns['${fn.handler}']
         |for line in sys.stdin:
         |    req = json.loads(line)
         |    try:
         |        out = {"v": fn(*req)}
         |    except Exception as e:
         |        out = {"e": type(e).__name__ + ": " + str(e)}
         |    sys.stdout.write(json.dumps(out) + "\\n")
         |    sys.stdout.flush()
         |""".stripMargin
    }
    private val proc = new ProcessBuilder("python3", "-c", program)
      .redirectErrorStream(true).start()
    private val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
    private val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))

    def call(args: Seq[Any]): Any = {
      out.write(toJson(args)); out.write("\n"); out.flush()
      val line = in.readLine()
      if (line == null)
        throw new RuntimeException(s"python UDF worker for '${fn.name}' died")
      val r = parse(line)
      r match {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          mm.get("e").foreach(e => throw new RuntimeException(
            s"python UDF '${fn.name}' raised $e"))
          coerce(mm.getOrElse("v", null), fn.ret)
        case _ => throw new RuntimeException(s"bad worker reply: $line")
      }
    }
    def alive: Boolean = proc.isAlive
    def close(): Unit = proc.destroyForcibly()
  }

  private val pools =
    new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[Worker]]()

  private def withWorker[T](fn: PyFn)(f: Worker => T): T = {
    val pool = pools.computeIfAbsent(fn.name, _ => new ConcurrentLinkedQueue[Worker]())
    val w0 = Option(pool.poll()).filter(_.alive).getOrElse(new Worker(fn))
    try { val r = f(w0); pool.add(w0); r }
    catch { case e: Throwable => w0.close(); throw e }
  }

  /** Register (or replace) the function in `spark`'s UDF registry. */
  def register(spark: SparkSession, fn: PyFn): Unit = {
    require(fn.argTypes.length <= 4, "python scalar UDFs support up to 4 arguments")
    fn.argTypes.foreach(jsonable); jsonable(fn.ret)
    registry.put(fn.name, fn)
    pools.remove(fn.name) // drop workers compiled against an old body
    fn.argTypes.length match {
      case 0 => spark.udf.register(fn.name, new UDF0[Any] { def call(): Any = callFn(fn, Nil) }, fn.ret)
      case 1 => spark.udf.register(fn.name, new UDF1[Any, Any] { def call(a: Any): Any = callFn(fn, Seq(a)) }, fn.ret)
      case 2 => spark.udf.register(fn.name, new UDF2[Any, Any, Any] { def call(a: Any, b: Any): Any = callFn(fn, Seq(a, b)) }, fn.ret)
      case 3 => spark.udf.register(fn.name, new UDF3[Any, Any, Any, Any] { def call(a: Any, b: Any, c: Any): Any = callFn(fn, Seq(a, b, c)) }, fn.ret)
      case 4 => spark.udf.register(fn.name, new UDF4[Any, Any, Any, Any, Any] { def call(a: Any, b: Any, c: Any, d: Any): Any = callFn(fn, Seq(a, b, c, d)) }, fn.ret)
    }
  }

  private def callFn(fn: PyFn, args: Seq[Any]): Any = {
    rowCalls.incrementAndGet()
    withWorker(fn)(_.call(args.map(fromSpark)))
  }

  def drop(spark: SparkSession, name: String): Boolean = {
    Option(pools.remove(name)).foreach(_.asScala.foreach(_.close()))
    registry.remove(name) != null
  }

  // ---- JSON (self-contained; values limited to jsonable types) --------

  private def jsonable(dt: DataType): Unit = dt match {
    case IntegerType | LongType | FloatType | DoubleType | StringType | BooleanType => ()
    case ArrayType(e, _) => jsonable(e)
    case other => throw new IllegalArgumentException(
      s"python scalar UDFs support int/bigint/float/double/string/boolean/arrays, got $other")
  }

  private def fromSpark(v: Any): Any = v match {
    case s: scala.collection.Seq[_] => s.map(fromSpark)
    case a: Array[_]                => a.toSeq.map(fromSpark)
    case other                      => other
  }

  private def toJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case n: Number => n.toString
    case s: scala.collection.Seq[_] => s.map(toJson).mkString("[", ",", "]")
    case other => throw new IllegalArgumentException(s"not JSON-able: ${other.getClass}")
  }

  /** tiny recursive-descent JSON reader (objects/arrays/strings/
    * numbers/bool/null — exactly what the worker emits)
    */
  private def parse(s: String): Any = {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def value(): Any = {
      ws()
      s(i) match {
        case '{' =>
          i += 1; val m = scala.collection.mutable.Map.empty[String, Any]
          ws()
          if (s(i) == '}') { i += 1; return m.toMap }
          while ({
            ws(); val k = value().asInstanceOf[String]; ws()
            require(s(i) == ':'); i += 1
            m(k) = value(); ws()
            if (s(i) == ',') { i += 1; true } else false
          }) ()
          require(s(i) == '}'); i += 1; m.toMap
        case '[' =>
          i += 1; val b = scala.collection.mutable.Buffer.empty[Any]
          ws()
          if (s(i) == ']') { i += 1; return b.toSeq }
          while ({ b += value(); ws(); if (s(i) == ',') { i += 1; true } else false }) ()
          require(s(i) == ']'); i += 1; b.toSeq
        case '"' =>
          i += 1; val sb = new StringBuilder
          while (s(i) != '"') {
            if (s(i) == '\\') {
              i += 1
              s(i) match {
                case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
                case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
                case c => sb += c
              }
            } else sb += s(i)
            i += 1
          }
          i += 1; sb.toString
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ =>
          val st = i
          while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
          val t = s.substring(st, i)
          if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble else t.toLong
      }
    }
    value()
  }

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (n: Long, IntegerType) => n.toInt
    case (n: Long, LongType) => n
    case (n: Long, DoubleType) => n.toDouble
    case (n: Long, FloatType) => n.toFloat
    case (n: Double, DoubleType) => n
    case (n: Double, FloatType) => n.toFloat
    case (n: Double, IntegerType) => n.toInt
    case (n: Double, LongType) => n.toLong
    case (s: String, StringType) => s
    case (b: Boolean, BooleanType) => b
    case (xs: Seq[_], ArrayType(e, _)) => xs.map(coerce(_, e))
    case (other, t) => throw new IllegalArgumentException(
      s"python UDF returned ${other.getClass.getSimpleName}, expected $t")
  }
}
