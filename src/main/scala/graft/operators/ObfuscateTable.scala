package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's `OBFUSCATE(t)` table flow (binder
  * bind_obfuscate.rs): one pass trains a markov model per string
  * column, then every row is rewritten — string columns through
  * `markov_generate` (order 5, sliding window 8), numeric columns
  * through `feistel_obfuscate`, everything else passed through. Seeds
  * increment per transformed column from the caller's base seed, so
  * the whole table masks deterministically and re-runs reproduce the
  * same output.
  *
  * Spark shape: the trained models are ONE aggregate row, broadcast
  * into a literal cross join — the mask itself stays a narrow per-row
  * projection (no shuffle beyond the training aggregate).
  */
object ObfuscateTable {

  private val GenParams = "{\"order\":5,\"sliding_window_size\":8}"

  def apply(spark: SparkSession, df: DataFrame, seed: Long): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    var s = seed
    def nextSeed(): Long = { val x = s; s += 1; x }

    def isNumber(t: DataType): Boolean = t match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType => true
      case _ => false
    }

    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.isEmpty) {
      // numbers-only: no model needed
      return df.select(df.schema.fields.map { f =>
        if (isNumber(f.dataType))
          call_udf("feistel_obfuscate", col(f.name), lit(nextSeed())).as(f.name)
        else col(f.name)
      }.toSeq: _*)
    }

    // persist: the size guard below and the broadcast cross join must
    // not each re-run the training aggregate (one corpus pass total)
    val model = df.agg(
      call_udf("markov_train", col(stringCols.head)).as(s"__m_${stringCols.head}"),
      stringCols.tail.map(c => call_udf("markov_train", col(c)).as(s"__m_$c")).toSeq: _*)
      .persist()

    // The trained models broadcast as ONE row (the reference also
    // driver-materializes them, obfuscator.rs), but model size scales
    // with corpus VOCABULARY, not corpus size — a web-scale text
    // column can produce a multi-GB model. Guard before broadcasting:
    // ~24B + map entries per context row; cap at 512 MB estimated.
    val contextRows = model.select(
      stringCols.map(c => size(col(s"__m_$c")).cast("long")).reduce(_ + _)).head().getLong(0)
    val estBytes = contextRows * 96L // hash/total/end + avg map payload
    require(estBytes < (512L << 20),
      s"OBFUSCATE model too large to broadcast: ~${estBytes >> 20} MB across " +
        s"${stringCols.length} column(s); reduce distinct contexts (sample the " +
        "training input or split columns)")

    val masked = df.crossJoin(broadcast(model)).select(df.schema.fields.map { f =>
      f.dataType match {
        case StringType =>
          call_udf("markov_generate", col(s"__m_${f.name}"), lit(GenParams),
            lit(nextSeed()), col(f.name)).as(f.name)
        case t if isNumber(t) =>
          call_udf("feistel_obfuscate", col(f.name), lit(nextSeed())).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
    masked
  }
}
