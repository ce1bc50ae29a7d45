package graft

import org.apache.spark.sql.SparkSession
import scala.io.StdIn

/** Thin SQL driver — the "protocol head" of SURVEY §3 reduced to its
  * Spark-native shape: a session with the graft surface registered,
  * tables from a data directory as views, SQL in, rows out.
  *
  * Usage:
  *   runMain graft.Sql <dataDir> "<sql>"    — run one statement
  *   runMain graft.Sql <dataDir>            — REPL (semicolon-terminated)
  */
object Sql {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-sql")
    graft.functions.GraftFunctions.register(spark)
    Tables(spark, dataDir).registerAll()

    def run(sql: String): Unit =
      try {
        val t = sql.trim
        // procedural scripts route to the script interpreter
        val isScript = t.startsWith("$$") ||
          t.toUpperCase.startsWith("BEGIN") ||
          t.toUpperCase.startsWith("EXECUTE IMMEDIATE")
        val df =
          if (isScript)
            graft.operators.SqlScript.executeImmediate(spark,
              t.replaceAll("(?i)^EXECUTE\\s+IMMEDIATE\\s*", ""))
          else spark.sql(sql)
        df.show(100, truncate = false)
      } catch { case e: Exception => System.err.println(s"error: ${e.getMessage}") }

    if (args.length > 1) args.drop(1).foreach(run)
    else {
      System.err.println(s"graft sql — tables from $dataDir; end statements with ';'")
      val buf = new StringBuilder
      var line = StdIn.readLine("graft> ")
      while (line != null) {
        buf.append(line).append('\n')
        if (line.trim.endsWith(";")) {
          val sql = buf.toString.trim.stripSuffix(";")
          buf.clear()
          if (sql.nonEmpty) run(sql)
        }
        line = StdIn.readLine(if (buf.isEmpty) "graft> " else "    -> ")
      }
    }
    spark.stop()
  }
}
