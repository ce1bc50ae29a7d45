package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RANDOM table engine (reference:
  * src/query/storages/factory/src/storage_factory.rs:116-185 registers
  * RANDOM; storages/random generates rows on scan for testing).
  * Spark-first: `spark.range(n)` plus hash-derived columns — fully
  * distributed, no driver-side data, and DETERMINISTIC in the seed, so
  * generated fixtures are reproducible across runs and cluster sizes
  * (unlike `rand()`, whose draw depends on partitioning).
  */
object RandomTable {

  /** Generate `rows` rows for `schema`. Column values derive from
    * xxhash64(id, seed, column-name) — uniform, reproducible.
    */
  def generate(spark: SparkSession, schema: StructType, rows: Long,
               seed: Long = 42L): DataFrame = {
    val base = spark.range(rows)
    val cols = schema.fields.map { f =>
      val h = abs(xxhash64(col("id"), lit(seed), lit(f.name)))
      val c = f.dataType match {
        case LongType => h
        case IntegerType => (h % Int.MaxValue).cast("int")
        case ShortType => (h % 32767).cast("short")
        case DoubleType => (h % 1000000L).cast("double") / 1000.0
        case FloatType => ((h % 1000000L).cast("double") / 1000.0).cast("float")
        case BooleanType => (h % 2 === 0)
        case StringType => concat(lit("s_"), conv(h.cast("string"), 10, 36))
        case DateType => date_add(lit(java.sql.Date.valueOf("2020-01-01")), (h % 2000).cast("int"))
        case TimestampType =>
          timestamp_seconds(lit(1577836800L) + (h % 86400000L)) // 2020-01-01 + offset
        case d: DecimalType => (h % 1000000L).cast(d)
        case other =>
          throw new IllegalArgumentException(s"RandomTable: unsupported type $other")
      }
      (if (f.nullable) when(h % 97 === 0, lit(null)).otherwise(c) else c).as(f.name)
    }
    base.select(cols.toIndexedSeq: _*)
  }
}
