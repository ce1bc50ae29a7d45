package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF (inverted-file) vector index (reference: the vector
  * index role of src/query/storages/common/index/src/hnsw_index/hnsw.rs
  * — re-expressed as IVF because a partition-pruned posting-list scan is
  * the batch-engine shape of "visit few candidates"). Like
  * InvertedIndex and the bloom/agg indexes, the index is BUILT ONCE and
  * persisted, then every query is probe-only:
  *
  *  - `assignments/` — (id, cid, v) parquet, partitioned BY cid, so a
  *    probe of nProbe lists is directory-level partition pruning: at
  *    100 TB a query reads nProbe/k of the corpus, never the whole scan.
  *  - `centroids/`   — k rows (cid, cv); read to the driver per query
  *    (k is small by construction).
  *  - `meta/`        — the exact source file set the index was trained
  *    on (same version-pinning rule as AggIndex.registerFiles): if the
  *    table's files changed, the index is stale and `isFresh` is false.
  *
  * Training is distributed Lloyd: assignment = broadcast centroids +
  * min_by, update = posexplode + groupBy mean. Only the k centroid
  * means cross the driver per iteration.
  *
  * Recall envelope vs the reference's HNSW: IVF recall is tuned by
  * nProbe — cost grows linearly (nProbe/k of the corpus scanned) and
  * recall reaches 1.0 at nProbe = k because the probe degenerates to
  * the exhaustive scan (VectorSpec measures the envelope: monotone in
  * nProbe, >= 0.6 recall@10 at nProbe = k/4 on the gate corpus). HNSW
  * reaches the same recall with polylog visit counts per query but
  * needs a mutable neighbor graph — the wrong shape for an immutable
  * batch index; at 100 TB the IVF probe is partition pruning, which
  * Spark executes natively.
  */
object VectorIndex {

  /** Train k-means and persist the index. `vecCol` must be an array
    * column (any numeric element type; stored as double).
    */
  def build(df: DataFrame, idCol: String, vecCol: String, indexPath: String,
            k: Int = 16, iters: Int = 2): Unit = {
    rmrf(indexPath)
    val spark = df.sparkSession
    val src = df.select(col(idCol).as("id"),
      expr(s"transform(`$vecCol`, e -> CAST(e AS DOUBLE))").as("v"))
    val sourceFiles = df.inputFiles.sorted
    val dbl = src.cache()
    try {
      // deterministic seeds: the k smallest ids
      var cents: Array[Array[Double]] = dbl.orderBy(col("id")).limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
      var assigned: DataFrame = null
      for (_ <- 1 to iters) {
        val cdf = broadcast(
          spark.createDataFrame(cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
            .toDF("cid", "cv"))
        assigned = dbl.crossJoin(cdf)
          .withColumn("d",
            expr("aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (s, e) -> s + e)"))
          .groupBy(col("id"))
          .agg(min_by(col("cid"), col("d")).as("cid"), first(col("v")).as("v"))
        val means = assigned
          .select(col("cid"), posexplode(col("v")))
          .groupBy(col("cid"), col("pos"))
          .agg(avg(col("col")).as("m"))
          .collect()
        val byCid = means.groupBy(_.getInt(0))
        cents = cents.indices.map { i =>
          byCid.get(i) match {
            case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
            case None       => cents(i) // empty list keeps its centroid
          }
        }.toArray
      }
      assigned.select(col("id"), col("cid"), col("v"), lit(0L).as("gen"))
        .write.mode("overwrite").partitionBy("gen", "cid")
        .parquet(s"$indexPath/assignments")
      spark.createDataFrame(cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
        .toDF("cid", "cv")
        .write.mode("overwrite").parquet(s"$indexPath/centroids")
      spark.createDataFrame(Seq((sourceFiles.toSeq, 0L)))
        .toDF("source_files", "gen")
        .write.mode("overwrite").partitionBy("gen").parquet(s"$indexPath/meta")
    } finally dbl.unpersist()
  }

  /** True iff the index exists and was built from exactly the files the
    * source currently scans (AggIndex's exact file-set rule — prefix or
    * subset matches are NOT fresh; see the round-2 delta-rewrite bug).
    */
  def isFresh(spark: SparkSession, indexPath: String, source: DataFrame): Boolean = {
    val pinned = genFiles(spark, indexPath).values.flatten.toSet
    pinned.nonEmpty && pinned == source.inputFiles.toSet
  }

  /** Probe the nProbe nearest lists for the query vector; cosine top-k
    * over candidates only. The `cid IN (...)` filter prunes at the
    * partition-directory level.
    */
  def search(spark: SparkSession, indexPath: String, qv: Array[Double],
             nProbe: Int = 4, k: Int = 10,
             excludeIds: Seq[Long] = Nil): DataFrame = {
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // mtime-keyed MetaCache: k<=16 rows, but the collect() was a
    // driver-blocking job on EVERY probe (round-13)
    val cents = MetaCache.cached(
        s"ivf-cent:$indexPath:" + MetaCache.dirSignature(s"$indexPath/centroids")) {
      spark.read.parquet(s"$indexPath/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    }
    val probe = cents.sortBy { case (_, c) => l2sq(c, qv) }.take(nProbe).map(_._1)
    val q = broadcast(
      spark.createDataFrame(Seq(Tuple1(qv.toSeq))).toDF("qv"))
    val cand0 = spark.read.parquet(s"$indexPath/assignments")
      .filter(col("cid").isin(probe.toIndexedSeq: _*))
    val cand = if (excludeIds.isEmpty) cand0
               else cand0.filter(!col("id").isin(excludeIds: _*))
    cand.crossJoin(q)
      .select(col("id"),
        expr("""aggregate(zip_with(v, qv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, e) -> a + e)""").as("dp"),
        expr("""aggregate(v, CAST(0.0 AS DOUBLE), (a, e) -> a + e * e)""").as("n1"),
        expr("""aggregate(qv, CAST(0.0 AS DOUBLE), (a, e) -> a + e * e)""").as("n2"))
      .select(col("id"), round(col("dp") / sqrt(col("n1") * col("n2")), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  private def rmrf(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val w = java.nio.file.Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally w.close()
    }
  }

  /** generation -> pinned source files, from the gen-partitioned meta
    * (empty for no index OR the pre-generational r8 layout, which then
    * rebuilds clean)
    */
  private def genFiles(spark: SparkSession, indexPath: String): Map[Long, Seq[String]] =
    // catch OUTSIDE cached(): a transient read failure must not be
    // memoized as 'no generations' (r13 advisory)
    try MetaCache.cached(
        s"ivf-gens:$indexPath:" + MetaCache.dirSignature(s"$indexPath/meta")) {
      val meta = spark.read.parquet(s"$indexPath/meta")
      if (!meta.columns.contains("gen")) Map.empty[Long, Seq[String]]
      else meta.select(col("gen").cast("long"), col("source_files")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    } catch { case _: Exception => Map.empty[Long, Seq[String]] }

  /** Generation-local maintenance (reference indexes per-block at
    * write — fuse_pruner.rs:88-93): each `ensure` sync is a file-set
    * diff per generation. Generations whose files all survive are KEPT
    * (their `gen=`/`cid=` partition directories are never rewritten);
    * generations touched by a compaction/DELETE drop their directories
    * only; uncovered files — appends and compaction survivors alike —
    * assign to the PINNED centroids as one new generation (standard
    * IVF practice: no re-train on maintenance; recall drifts only if
    * the data distribution shifts, at which point dropping every
    * generation triggers the full retrain path).
    */
  def ensure(df: DataFrame, idCol: String, vecCol: String, indexPath: String,
             k: Int = 16, iters: Int = 2): String = synchronized {
    val spark = df.sparkSession
    val current = df.inputFiles.toSet
    val gens = genFiles(spark, indexPath)
    val (keep, drop) = gens.partition { case (_, fs) =>
      fs.nonEmpty && fs.toSet.subsetOf(current)
    }
    val covered = keep.values.flatten.toSet
    if (gens.nonEmpty && covered == current && drop.isEmpty) return indexPath
    if (keep.isEmpty) { build(df, idCol, vecCol, indexPath, k, iters); return indexPath }
    drop.keys.foreach { g =>
      rmrf(s"$indexPath/meta/gen=$g")
      rmrf(s"$indexPath/assignments/gen=$g")
    }
    val orphan = (current -- covered).toSeq.sorted
    if (orphan.nonEmpty) {
      val genId = gens.keys.max + 1
      val cents = spark.read.parquet(s"$indexPath/centroids")
      val fresh = spark.read.parquet(orphan: _*)
        .select(col(idCol).as("id"),
          expr(s"transform(`$vecCol`, e -> CAST(e AS DOUBLE))").as("v"))
      fresh.crossJoin(broadcast(cents))
        .withColumn("d",
          expr("aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (s, e) -> s + e)"))
        .groupBy(col("id"))
        .agg(min_by(col("cid"), col("d")).as("cid"), first(col("v")).as("v"))
        .select(col("id"), col("cid"), col("v"), lit(genId).as("gen"))
        .write.mode("append").partitionBy("gen", "cid")
        .parquet(s"$indexPath/assignments")
      spark.createDataFrame(Seq((orphan, genId))).toDF("source_files", "gen")
        .write.mode("append").partitionBy("gen").parquet(s"$indexPath/meta")
    }
    indexPath
  }
}
