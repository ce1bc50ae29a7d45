package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication as a library surface (the training-data ops the
  * reference-scale pipelines need; same algorithms as the benchmarked
  * `txt_*` queries, packaged for reuse).
  *
  * Scale notes: every method is shuffle-bounded — exact dedup is one
  * hash aggregate; MinHash-LSH only compares documents that share a
  * band bucket; SimHash only compares documents that share one 16-bit
  * chunk (pigeonhole for hamming <= 3). Nothing is O(n^2) globally.
  */
object Dedup {

  /** Exact duplicate groups by content hash. Returns `df` plus a
    * `dup_group_keeper` column: the minimum `idCol` among identical
    * `textCol` values (rows where keeper != id are droppable copies).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("dup_group_keeper",
      min(col(idCol)).over(Window.partitionBy(md5(col(textCol).cast("binary")))))
  }

  /** Drop exact duplicates, keeping the smallest id per content group. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df, idCol, textCol)
      .filter(col(idCol) === col("dup_group_keeper"))
      .drop("dup_group_keeper")

  /** MinHash-LSH near-duplicate candidate pairs above `threshold`
    * estimated Jaccard similarity. Output: (id_a, id_b, est_sim) with
    * id_a < id_b. `nHash` permutations via the double-hashing
    * construction (2 hashes per shingle, the i-th permutation is a
    * codegen MIN aggregate), banded into `bands` buckets.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.5, nHash: Int = 32, bands: Int = 8): DataFrame = {
    require(nHash % bands == 0, "bands must divide nHash")
    val rows = nHash / bands
    val shingled = df
      .select(col(idCol).as("__id"), split(lower(col(textCol)), " ").as("tk"))
      .select(col("__id"),
        array_distinct(expr(
          """transform(
               sequence(1, greatest(size(tk) - 2, 1)),
               i -> concat_ws(' ', slice(tk, i, 3)))""")).as("sh"))
    val exploded = shingled
      .select(col("__id"), explode(col("sh")).as("s"))
      .select(col("__id"),
        pmod(xxhash64(col("s")), lit(2147483647L)).as("h1"),
        (pmod(xxhash64(concat(lit("graft-salt:"), col("s"))), lit(2147483629L)) + 1L).as("h2"))
    val minAggs = (0 until nHash).map(i =>
      min(pmod(col("h1") + lit(i.toLong) * col("h2"), lit(2147483647L))).as(s"mh_$i"))
    val mh = exploded.groupBy(col("__id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("__id"), array((0 until nHash).map(i => col(s"mh_$i")): _*).as("mh"))
    val banded = mh.select(col("__id"), col("mh"),
        posexplode(expr(s"""transform(sequence(0, ${bands - 1}),
          b -> xxhash64(concat_ws(',', transform(slice(mh, b * $rows + 1, $rows), v -> CAST(v AS STRING)))))""")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("band"), col("bucket"), col("__id").as("id_a"), col("mh").as("mh_a"))
    val r = banded.select(col("band"), col("bucket"), col("__id").as("id_b"), col("mh").as("mh_b"))
    l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(expr("filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v)")).cast("double") / nHash).as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= threshold)
  }

  /** 64-bit SimHash per document (token-hash sign aggregation). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol))
      .withColumn("simhash", expr(
        s"""aggregate(
             transform(split(lower(`$textCol`), ' '), tk -> xxhash64(tk)),
             CAST(array_repeat(0, 64) AS ARRAY<INT>),
             (acc, h) -> zip_with(acc, sequence(0, 63),
               (a, b) -> a + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END),
             acc -> aggregate(zip_with(acc, sequence(0, 63),
               (v, b) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END),
               CAST(0 AS BIGINT), (s, x) -> s + x))"""))

  /** SimHash near-duplicate pairs with hamming distance <= maxHamming
    * (must be <= 3 for the 4-chunk pigeonhole bucketing to be exact).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole is exact only for hamming <= 3")
    val sim = simhash(df, idCol, textCol).select(col(idCol).as("__id"), col("simhash"))
    val chunked = sim.select(col("__id"), col("simhash"),
        posexplode(expr("transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval")
    val a = chunked.select(col("chunk"), col("cval"), col("__id").as("id_a"), col("simhash").as("h_a"))
    val b = chunked.select(col("chunk"), col("cval"), col("__id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk", "cval")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), expr(
        "size(filter(transform(sequence(0, 63), b -> (shiftright(h_a, b) & 1) = (shiftright(h_b, b) & 1)), v -> NOT v))").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
