package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent HNSW graph index (reference: src/query/storages/common/
  * index/src/hnsw_index/{hnsw.rs,graph_layers_builder.rs,
  * graph_links/serializer.rs} — qdrant-lineage per-block graphs,
  * serialized at build and memory-mapped at search). The Spark shape
  * is the same decomposition the reference uses across blocks:
  *
  *  - the corpus is hash-split into `numBuckets` buckets; each bucket
  *    gets an independent in-memory HNSW graph built in one task
  *    (`mapPartitions`, no shuffle after the split);
  *  - each graph is serialized to one compact binary row
  *    (`graph/` parquet: bucket, n, blob) — the analogue of the
  *    reference's graph-links blob per block;
  *  - a query deserializes every bucket's graph in parallel (one task
  *    per bucket, polylog node visits per graph — not a corpus scan)
  *    and merges the per-bucket top-k, exactly how the reference
  *    merges per-block HNSW results;
  *  - `meta/` pins the exact source file set (AggIndex freshness
  *    rule): any change to the table's files invalidates the index.
  *
  * At 100 TB: buckets bound the per-task graph to what one executor
  * holds (size `numBuckets` so corpus/numBuckets fits in executor
  * memory — the same sizing rule as the reference's block size);
  * build is embarrassingly parallel after one repartition; search
  * cost is numBuckets * O(ef * log n) distance evaluations instead of
  * a corpus scan, and the only data movement is numBuckets rows of
  * top-k candidates.
  *
  * Algorithm per bucket: Malkov & Yashunin 2016 (the public HNSW
  * paper the reference's implementation also follows): exponential
  * layer assignment with mL = 1/ln(M), greedy descent from the entry
  * point through upper layers, beam search of width efConstruction at
  * insertion, bidirectional links trimmed to M (2M at layer 0).
  * Vectors are L2-normalized at build so cosine similarity is a plain
  * dot product in the scorer (reference point_scorer.rs does the
  * same for cosine spaces).
  *
  * Determinism: layer levels derive from splitmix64(id), insertion
  * order is the parquet row order of the pinned file set — a rebuilt
  * index over identical files is byte-identical.
  */
object HnswIndex {

  // ---- tiny deterministic RNG for layer assignment --------------------
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D9ECA592B4C593L
    x ^ (x >>> 31)
  }

  private def levelFor(id: Long, mL: Double): Int = {
    // uniform in (0,1) from the top 53 bits; never exactly 0
    val u = ((splitmix64(id) >>> 11) + 1).toDouble / (1L << 53).toDouble
    (-math.log(u) * mL).toInt
  }

  // ---- in-memory graph -------------------------------------------------
  private final class Graph(val dim: Int, val m: Int, val efC: Int) {
    val ids = mutable.ArrayBuffer.empty[Long]
    val vecs = mutable.ArrayBuffer.empty[Array[Double]]
    val levels = mutable.ArrayBuffer.empty[Int]
    /** adj(node)(layer) = neighbor local indices */
    val adj = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    var entry: Int = -1
    var maxLayer: Int = -1
    private val mL = 1.0 / math.log(m.toDouble)

    private def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    /** distance = 1 - cosine (vectors pre-normalized) */
    private def dist(a: Array[Double], b: Array[Double]): Double = 1.0 - dot(a, b)

    private def capAt(layer: Int): Int = if (layer == 0) 2 * m else m

    /** best-first beam search at one layer; returns up to ef (dist, idx)
      * sorted ascending by distance
      */
    def searchLayer(q: Array[Double], entries: Seq[Int], ef: Int,
                    layer: Int): mutable.ArrayBuffer[(Double, Int)] = {
      val visited = new java.util.BitSet(ids.length)
      // candidates: nearest first; results: farthest first for trimming
      val cand = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1).reverse)
      val res = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1))
      for (e <- entries) if (!visited.get(e)) {
        visited.set(e)
        val d = dist(q, vecs(e))
        cand.enqueue((d, e)); res.enqueue((d, e))
      }
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (dc > res.head._1 && res.size >= ef) {
          cand.clear() // every remaining candidate is farther
        } else {
          val nbrs = adj(c)
          if (layer < nbrs.length) {
            val layerNbrs = nbrs(layer)
            var i = 0
            while (i < layerNbrs.length) {
              val nb = layerNbrs(i)
              if (!visited.get(nb)) {
                visited.set(nb)
                val d = dist(q, vecs(nb))
                if (res.size < ef || d < res.head._1) {
                  cand.enqueue((d, nb)); res.enqueue((d, nb))
                  if (res.size > ef) res.dequeue()
                }
              }
              i += 1
            }
          }
        }
      }
      val out = mutable.ArrayBuffer.empty[(Double, Int)]
      while (res.nonEmpty) out += res.dequeue()
      out.sortInPlaceBy(_._1)
      out
    }

    private def greedyDescend(q: Array[Double], from: Int, fromLayer: Int,
                              toLayer: Int): Int = {
      var cur = from
      var curDist = dist(q, vecs(cur))
      var layer = fromLayer
      while (layer > toLayer) {
        var improved = true
        while (improved) {
          improved = false
          val nbrs = adj(cur)
          if (layer < nbrs.length) {
            val layerNbrs = nbrs(layer)
            var i = 0
            while (i < layerNbrs.length) {
              val nb = layerNbrs(i)
              val d = dist(q, vecs(nb))
              if (d < curDist) { cur = nb; curDist = d; improved = true }
              i += 1
            }
          }
        }
        layer -= 1
      }
      cur
    }

    def insert(id: Long, v: Array[Double]): Unit = {
      val level = levelFor(id, mL)
      val idx = ids.length
      ids += id; vecs += v; levels += level
      adj += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = idx; maxLayer = level; return }

      var cur = greedyDescend(v, entry, maxLayer, math.min(level, maxLayer))
      var layer = math.min(level, maxLayer)
      while (layer >= 0) {
        val w = searchLayer(v, Seq(cur), efC, layer)
        val selected = w.take(m)
        for ((_, nb) <- selected) {
          adj(idx)(layer) += nb
          val back = adj(nb)(layer)
          back += idx
          val cap = capAt(layer)
          if (back.length > cap) {
            // trim to the cap nearest (simple selection, as Mmax shrink)
            val trimmed = back.map(x => (dist(vecs(nb), vecs(x)), x))
              .sortBy(_._1).take(cap).map(_._2)
            back.clear(); back ++= trimmed
          }
        }
        if (w.nonEmpty) cur = w.head._2
        layer -= 1
      }
      if (level > maxLayer) { entry = idx; maxLayer = level }
    }

    def searchTop(q: Array[Double], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      val start = greedyDescend(q, entry, maxLayer, 0)
      val w = searchLayer(q, Seq(start), math.max(ef, k), 0)
      w.take(k).map { case (d, i) => (ids(i), 1.0 - d) }.toSeq
    }

    def serialize(): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(ids.length); out.writeInt(dim)
      out.writeInt(entry); out.writeInt(maxLayer)
      var i = 0
      while (i < ids.length) {
        out.writeLong(ids(i))
        val v = vecs(i); var d = 0
        while (d < dim) { out.writeDouble(v(d)); d += 1 }
        val layers = adj(i)
        out.writeInt(layers.length)
        for (layerNbrs <- layers) {
          out.writeInt(layerNbrs.length)
          layerNbrs.foreach(out.writeInt)
        }
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  private def deserialize(bytes: Array[Byte], m: Int, efC: Int): Graph = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt(); val dim = in.readInt()
    val g = new Graph(dim, m, efC)
    g.entry = in.readInt(); g.maxLayer = in.readInt()
    var i = 0
    while (i < n) {
      g.ids += in.readLong()
      val v = new Array[Double](dim)
      var d = 0
      while (d < dim) { v(d) = in.readDouble(); d += 1 }
      g.vecs += v
      val nLayers = in.readInt()
      val layers = Array.fill(nLayers) {
        val cnt = in.readInt()
        val buf = new mutable.ArrayBuffer[Int](cnt)
        var j = 0
        while (j < cnt) { buf += in.readInt(); j += 1 }
        buf
      }
      g.adj += layers
      g.levels += (nLayers - 1)
      i += 1
    }
    g
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Build the per-bucket graphs and persist. `vecCol` must be an
    * array column (any numeric element type).
    */
  def build(df: DataFrame, idCol: String, vecCol: String, indexPath: String,
            m: Int = 16, efConstruction: Int = 100, numBuckets: Int = 8): Unit = {
    rmrf(indexPath)
    val spark = df.sparkSession
    import spark.implicits._
    val sourceFiles = df.inputFiles.sorted
    val graphDs = df.select(col(idCol).cast("long").as("id"),
      expr(s"transform(`$vecCol`, e -> CAST(e AS DOUBLE))").as("v"))
      .repartition(numBuckets, col("id"))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        var graph: Graph = null
        rows.foreach { case (id, vec) =>
          val arr = vec.toArray
          if (graph == null) graph = new Graph(arr.length, m, efConstruction)
          graph.insert(id, normalize(arr))
        }
        if (graph == null) Iterator.empty
        else Iterator((TaskContext.getPartitionId(), graph.ids.length,
          graph.serialize()))
      }
    graphDs.toDF("bucket", "n", "blob")
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").partitionBy("gen").parquet(s"$indexPath/graph")
    spark.createDataFrame(Seq((sourceFiles.toSeq, m, efConstruction, numBuckets, 0L)))
      .toDF("source_files", "m", "ef_construction", "num_buckets", "gen")
      .write.mode("overwrite").partitionBy("gen").parquet(s"$indexPath/meta")
  }

  /** AggIndex freshness rule: exact source file set match (union of
    * every generation's pin).
    */
  def isFresh(spark: SparkSession, indexPath: String, source: DataFrame): Boolean = {
    val pinned = genFiles(spark, indexPath).values.flatten.toSet
    pinned.nonEmpty && pinned == source.inputFiles.toSet
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

  /** generation -> pinned source files (empty when absent or on the
    * pre-generational r8 layout, which rebuilds clean)
    */
  private def genFiles(spark: SparkSession, indexPath: String): Map[Long, Seq[String]] =
    // catch OUTSIDE cached(): a transient read failure must not be
    // memoized as 'no generations' (r13 advisory)
    try MetaCache.cached(
        s"hnsw-gens:$indexPath:" + MetaCache.dirSignature(s"$indexPath/meta")) {
      val meta = spark.read.parquet(s"$indexPath/meta")
      if (!meta.columns.contains("gen")) Map.empty[Long, Seq[String]]
      else meta.select(col("gen").cast("long"), col("source_files")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    } catch { case _: Exception => Map.empty[Long, Seq[String]] }

  /** Search every bucket graph in parallel (one task per bucket, beam
    * width ef) and merge the per-bucket top-k. Returns (id, cos).
    */
  def search(spark: SparkSession, indexPath: String, qv: Array[Double],
             k: Int = 10, ef: Int = 64,
             excludeIds: Seq[Long] = Nil): DataFrame = {
    // mtime-keyed MetaCache: one row, but the head() was a
    // driver-blocking job on EVERY probe (round-13)
    val (m, efC) = MetaCache.cached(
        s"hnsw-meta:$indexPath:" + MetaCache.dirSignature(s"$indexPath/meta")) {
      val meta = spark.read.parquet(s"$indexPath/meta").head()
      (meta.getAs[Int]("m"), meta.getAs[Int]("ef_construction"))
    }
    val qn = normalize(qv.clone())
    val excl = excludeIds.toSet
    val bq = spark.sparkContext.broadcast((qn, excl))
    import spark.implicits._
    val perBucket = spark.read.parquet(s"$indexPath/graph")
      .select(col("blob")).as[Array[Byte]]
      .mapPartitions { blobs =>
        val (q, ex) = bq.value
        blobs.flatMap { blob =>
          val g = deserialize(blob, m, efC)
          // over-fetch so exclusions don't shrink the candidate pool
          g.searchTop(q, k + ex.size, ef).filterNot(t => ex.contains(t._1))
        }
      }
      .toDF("id", "cos")
    perBucket
      .select(col("id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Generation-local maintenance (reference builds per-block HNSW
    * graphs at write — hnsw_index/, fuse_pruner.rs:88-93): each
    * `ensure` sync diffs the source file set per generation.
    * Generations whose files all survive KEEP their `graph/gen=`
    * partition untouched; generations hit by a compaction/DELETE drop
    * their partition directories only; uncovered files — appends and
    * compaction survivors alike — build subgraphs as one new
    * generation. [[search]] already deserializes every blob and merges
    * per-graph top-k, so generation graphs need no probe change — the
    * exact analogue of the reference's per-block graphs merged at
    * query time.
    */
  def ensure(df: DataFrame, idCol: String, vecCol: String, indexPath: String,
             m: Int = 16, efConstruction: Int = 100, numBuckets: Int = 8): String =
    synchronized {
      val spark = df.sparkSession
      import spark.implicits._
      val current = df.inputFiles.toSet
      val gens = genFiles(spark, indexPath)
      val (keep, drop) = gens.partition { case (_, fs) =>
        fs.nonEmpty && fs.toSet.subsetOf(current)
      }
      val covered = keep.values.flatten.toSet
      if (gens.nonEmpty && covered == current && drop.isEmpty) return indexPath
      if (keep.isEmpty) {
        build(df, idCol, vecCol, indexPath, m, efConstruction, numBuckets)
        return indexPath
      }
      drop.keys.foreach { g =>
        rmrf(s"$indexPath/meta/gen=$g")
        rmrf(s"$indexPath/graph/gen=$g")
      }
      val orphan = (current -- covered).toSeq.sorted
      if (orphan.nonEmpty) {
        val meta0 = spark.read.parquet(s"$indexPath/meta").head()
        val mP = meta0.getAs[Int]("m")
        val efC = meta0.getAs[Int]("ef_construction")
        val nB = meta0.getAs[Int]("num_buckets")
        val genId = gens.keys.max + 1
        spark.read.parquet(orphan: _*)
          .select(col(idCol).cast("long").as("id"),
            expr(s"transform(`$vecCol`, e -> CAST(e AS DOUBLE))").as("v"))
          .repartition(nB, col("id"))
          .as[(Long, Seq[Double])]
          .mapPartitions { rows =>
            var graph: Graph = null
            rows.foreach { case (id, vec) =>
              val arr = vec.toArray
              if (graph == null) graph = new Graph(arr.length, mP, efC)
              graph.insert(id, normalize(arr))
            }
            if (graph == null) Iterator.empty
            else Iterator((TaskContext.getPartitionId(), graph.ids.length,
              graph.serialize()))
          }
          .toDF("bucket", "n", "blob")
          .withColumn("gen", lit(genId))
          .write.mode("append").partitionBy("gen").parquet(s"$indexPath/graph")
        spark.createDataFrame(Seq((orphan, mP, efC, nB, genId)))
          .toDF("source_files", "m", "ef_construction", "num_buckets", "gen")
          .write.mode("append").partitionBy("gen").parquet(s"$indexPath/meta")
      }
      indexPath
    }
}
