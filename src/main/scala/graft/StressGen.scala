package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 stress corpus builder (round-7 verdict ask #7): upsample the
  * driver's sf0.1 parquet 10x by unioning key-shifted copies — every
  * key/FK column in a copy shifts by the same offset, so referential
  * integrity and join selectivities are preserved while row counts,
  * shuffle sizes, and aggregation cardinalities scale 10x. Dimension
  * tables (region/nation) stay single-copy, like a real scale-up.
  * TPC-DS and ClickBench data generate themselves from the target dir
  * name (`sf1`), so only the TPC-H-ish base tables need staging.
  *
  * Usage: runMain graft.StressGen [outDir=/tmp/graft_stress/sf1]
  */
object StressGen {

  val DefaultOut = "/tmp/graft_stress/sf1"
  private val Copies = 10
  private val Shift = 100000000L // far above any sf0.1 key

  /** key columns to shift per table; everything else passes through */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def ensure(spark: SparkSession, srcDir: String = "/root/testdata/sf0.1",
             outDir: String = DefaultOut): String = synchronized {
    val marker = java.nio.file.Paths.get(outDir, "_GRAFT_OK")
    if (java.nio.file.Files.exists(marker)) return outDir
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$srcDir/$t.parquet")
      val copies: Seq[DataFrame] = (0 until Copies).map { i =>
        keys.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * Shift))
        }
      }
      copies.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    java.nio.file.Files.write(marker, "graft-stress-v1".getBytes)
    outDir
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(DefaultOut)
    val spark = GraftSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-stressgen")
    ensure(spark, outDir = out)
    println(s"STRESS_DIR=$out")
    spark.stop()
  }
}
