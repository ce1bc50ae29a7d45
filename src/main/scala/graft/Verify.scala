package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.{col, to_json}
  import org.apache.spark.sql.types._

  private def hasVariant(dt: DataType): Boolean = dt match {
    case _: VariantType => true
    case a: ArrayType   => hasVariant(a.elementType)
    case m: MapType     => hasVariant(m.keyType) || hasVariant(m.valueType)
    case s: StructType  => s.fields.exists(f => hasVariant(f.dataType))
    case _              => false
  }

  /** Spark writes VARIANT columns with a parquet logical type the
    * driver's pyarrow reader can't parse; render them as canonical
    * JSON text (what the DuckDB oracle produces anyway) before dumping.
    */
  private def dumpable(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(f => hasVariant(f.dataType))) df
    else df.select(df.schema.fields.toSeq.map { f =>
      if (hasVariant(f.dataType)) to_json(col(s"`${f.name}`")).as(f.name)
      else col(s"`${f.name}`")
    }: _*)

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: only dump these queries (oracle_sql.json
    // still covers everything so partial runs stay checkable)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession(cpus, "graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try dumpable(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
