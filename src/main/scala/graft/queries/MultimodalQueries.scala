package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.functions.{Multimodal, ScriptUdf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal pipeline queries: binary payload columns derived from the
  * documents table (UTF-8 bytes standing in for image/video payloads),
  * run through the per-partition decode/feature path. The stub decoder
  * is pure byte arithmetic, so the oracle can replay it in SQL — the
  * Spark-side plumbing (binary columns, mapPartitions, schema) is
  * fully exercised and value-checked.
  */
object MultimodalQueries extends QueryModule {

  private val mmFeatures = Q(
    (spark, dir) => {
      val x = Tables(spark, dir)
      val bin = x.documents.filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.extractFeatures(spark, bin)
        .withColumn("mean_byte", round(col("mean_byte"), 6))
        .orderBy(col("doc_id"))
    },
    // documents are ASCII, so byte arithmetic == codepoint arithmetic
    Some("""SELECT doc_id,
      |  CAST(32 + (octet_length(CAST(text AS BLOB)) % 224) AS INT) AS width,
      |  CAST(32 + ((octet_length(CAST(text AS BLOB)) * 7) % 224) AS INT) AS height,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      |  round(list_sum(list_transform(range(1, length(text) + 1),
      |      i -> ascii(substring(text, i, 1)))) * 1.0 / length(text), 6) AS mean_byte,
      |  CAST(ceil(ceil(octet_length(CAST(text AS BLOB)) / 64.0) / 4.0) AS INT) AS n_frames
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin))

  // Arrow-batch script UDF (reference transform_udf_script.rs): the
  // "script" computes a token count + shout-cased language tag against
  // raw Arrow vectors; the oracle replays it in SQL.
  private val udfScript = Q(
    (spark, dir) => {
      import org.apache.arrow.vector.{BigIntVector, VarCharVector}
      import org.apache.spark.sql.types._
      val x = Tables(spark, dir)
      val in = x.documents.filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"), col("lang"))
      ScriptUdf.applyBatches(in,
        StructType(Seq(StructField("n_tokens", LongType),
          StructField("lang_tag", StringType)))) { root =>
        val txt = root.getVector("text").asInstanceOf[VarCharVector]
        val lang = root.getVector("lang").asInstanceOf[VarCharVector]
        val nTok = root.getVector("n_tokens").asInstanceOf[BigIntVector]
        val tag = root.getVector("lang_tag").asInstanceOf[VarCharVector]
        for (i <- 0 until root.getRowCount) {
          val t = new String(txt.get(i), "UTF-8")
          nTok.setSafe(i, t.split("\\s+").count(_.nonEmpty).toLong)
          val l = new String(lang.get(i), "UTF-8").toUpperCase
          tag.setSafe(i, s"[$l]".getBytes("UTF-8"))
        }
      }.select("doc_id", "n_tokens", "lang_tag").orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      |  CAST(length(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> t <> '')) AS BIGINT) AS n_tokens,
      |  '[' || upper(lang) || ']' AS lang_tag
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))

  // Embedded-Python script UDF (reference transform_udf_script.rs:55-93):
  // one python3 worker per partition, Arrow IPC both ways. The handler
  // is ordinary per-row Python; the oracle replays it in SQL. Outputs
  // are integers/strings only so the cross-engine hash is float-free.
  private val udfScriptPython = Q(
    (spark, dir) => {
      import org.apache.spark.sql.types._
      val x = Tables(spark, dir)
      val in = x.documents.filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"), col("lang"))
      graft.functions.PythonScriptUdf.applyRows(in,
        StructType(Seq(
          StructField("n_tokens", LongType),
          StructField("n_chars", LongType),
          StructField("n_vowels", LongType),
          StructField("lang_tag", StringType))),
        handler = "feat",
        source =
          """def feat(doc_id, text, lang):
            |    toks = [t for t in text.split() if t]
            |    v = sum(1 for c in text.lower() if c in 'aeiou')
            |    return (len(toks), len(text), v, '[' + lang.upper() + ']')
            |""".stripMargin)
        .select("doc_id", "n_tokens", "n_chars", "n_vowels", "lang_tag")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      |  CAST(length(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> t <> '')) AS BIGINT) AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT) AS n_vowels,
      |  '[' || upper(lang) || ']' AS lang_tag
      |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin))

  // real header decode (round 6): payloads are synthesized with genuine
  // PNG/JPEG/GIF/BMP container headers (dimensions derived from doc_id)
  // + the text bytes as body; decodeHeader must recover format and
  // dimensions from the magic alone. The oracle recomputes the expected
  // values from the same doc_id arithmetic + the builders' fixed header
  // sizes — a construct->parse round trip checked cross-engine.
  private val mmDecode = Q(
    (spark, dir) => {
      import graft.functions.Multimodal._
      val x = Tables(spark, dir)
      val build = udf((id: Long, text: String) => {
        val body = text.getBytes("UTF-8")
        val w = 16 + (id * 3 % 1000).toInt
        val h = 16 + (id * 7 % 1000).toInt
        (id % 4) match {
          case 0 => pngBytes(w, h, body)
          case 1 => jpegBytes(w, h, body)
          case 2 => gifBytes(w, h, body)
          case _ => bmpBytes(w, h, body)
        }
      })
      val bin = x.documents.filter(col("doc_id") < 200)
        .select(col("doc_id"), build(col("doc_id"), col("text")).as("payload"))
      Multimodal.probeHeaders(spark, bin).orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |       WHEN 2 THEN 'gif' ELSE 'bmp' END AS format,
      |  CAST(16 + (doc_id * 3) % 1000 AS INT) AS width,
      |  CAST(16 + (doc_id * 7) % 1000 AS INT) AS height,
      |  CAST(octet_length(CAST(text AS BLOB)) +
      |       CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 33 WHEN 1 THEN 33
      |            WHEN 2 THEN 13 ELSE 54 END AS INT) AS n_bytes
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "mm_features" -> mmFeatures,
    "mm_decode" -> mmDecode,
    "udf_script_arrow" -> udfScript,
    "udf_script_python" -> udfScriptPython)
}
