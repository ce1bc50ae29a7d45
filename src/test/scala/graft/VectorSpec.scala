package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gates the DuckDB oracle can't express: the approximate
  * indexes (IVF, LSH) must actually find most of the true neighbors the
  * brute-force scan finds.
  */
class VectorSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-vector-test")
  private val sf = "/root/testdata/sf0.01"

  private def topIds(name: String): Seq[Long] = {
    val df = SparkEntry.all(name).fn(spark, sf)
    df.select("vec_id").collect().map(_.getLong(0)).toSeq
  }

  test("IVF probe recall@10 vs brute force >= 0.6") {
    val exact = topIds("vec_knn_brute").take(10).toSet
    val ivf = topIds("vec_knn_ivf").toSet
    val recall = exact.intersect(ivf).size.toDouble / 10.0
    assert(recall >= 0.6, s"IVF recall@10 = $recall")
  }

  test("IVF probes a strict subset of the lists (not a full scan)") {
    // 16 lists, 4 probed: the candidate set must be well under the corpus
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val candidates = SparkEntry.all("vec_knn_ivf").fn(spark, sf)
    assert(candidates.count() <= 10)
    assert(n == 500) // fixture sanity
  }

  test("IVF recall envelope vs nProbe: monotone, exact at full probe") {
    // The documented IVF-vs-graph-index (HNSW) tradeoff: recall is
    // tunable by nProbe and reaches 1.0 when every list is probed
    // (the probe degenerates to the exhaustive scan) — the envelope a
    // user trades against the reference's HNSW.
    import graft.operators.VectorIndex
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivfenv").toString
    VectorIndex.ensure(emb, "vec_id", "embedding", idx, k = 16, iters = 2)
    val qv = emb.orderBy(col("vec_id")).limit(1)
      .selectExpr("transform(embedding, e -> CAST(e AS DOUBLE))")
      .head().getSeq[Double](0).toArray
    def recallAt(nProbe: Int, exact: Set[Long]): Double = {
      val got = VectorIndex.search(spark, idx, qv, nProbe = nProbe, k = 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val exact = VectorIndex.search(spark, idx, qv, nProbe = 16, k = 10)
      .collect().map(_.getLong(0)).toSet // all lists = exhaustive truth
    val env = Seq(1, 2, 4, 8, 16).map(p => p -> recallAt(p, exact))
    // full probe is exact by construction
    assert(env.last._2 == 1.0)
    // envelope is (weakly) monotone in nProbe
    env.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1 - 1e-9, s"recall dropped from nProbe=$p1 ($r1) to nProbe=$p2 ($r2)")
    }
    // probing a quarter of the lists already finds most true neighbors
    assert(env.find(_._1 == 4).get._2 >= 0.6, s"envelope: $env")
  }

  test("IVF index persists: second query is probe-only, stale pin rebuilds") {
    import graft.operators.VectorIndex
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivfidx").toString
    VectorIndex.ensure(emb, "vec_id", "embedding", idx, k = 8, iters = 1)
    assert(VectorIndex.isFresh(spark, idx, emb))
    val assignFile = java.nio.file.Files.walk(java.nio.file.Paths.get(idx, "assignments"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val mtime = java.nio.file.Files.getLastModifiedTime(assignFile)
    // ensure() again must NOT retrain (same file set)
    VectorIndex.ensure(emb, "vec_id", "embedding", idx, k = 8, iters = 1)
    assert(java.nio.file.Files.getLastModifiedTime(assignFile) == mtime)
    // a different source file set must read as stale (exact-set pin)
    val other = spark.read.parquet(s"$sf/documents.parquet")
      .limit(10).select(col("doc_id").as("vec_id"), expr("array(1.0, 2.0)").as("embedding"))
    assert(!VectorIndex.isFresh(spark, idx, other))
  }

  test("HNSW recall@10 vs brute force >= 0.9") {
    val exact = topIds("vec_knn_brute").take(10).toSet
    val hnsw = topIds("vec_knn_hnsw").toSet
    val recall = exact.intersect(hnsw).size.toDouble / 10.0
    assert(recall >= 0.9, s"HNSW recall@10 = $recall")
  }

  test("HNSW self-hit, ef envelope, and freshness pin") {
    import graft.operators.HnswIndex
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("hnswidx").toString
    HnswIndex.ensure(emb, "vec_id", "embedding", idx,
      m = 8, efConstruction = 64, numBuckets = 8)
    assert(HnswIndex.isFresh(spark, idx, emb))
    val qv = emb.filter(col("vec_id") === 7)
      .selectExpr("transform(embedding, e -> CAST(e AS DOUBLE))")
      .head().getSeq[Double](0).toArray
    // the query vector itself is in the index: exact self-hit at cos 1
    val top = HnswIndex.search(spark, idx, qv, k = 3, ef = 32).collect()
    assert(top.head.getLong(0) == 7L, s"self-hit: ${top.mkString(",")}")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
    // wider beams cannot lose recall on the gate corpus
    val exact = topIds("vec_knn_brute").take(10).toSet
    def recallAt(ef: Int): Double = {
      val got = HnswIndex.search(spark, idx, qv, k = 10, ef = ef,
        excludeIds = Seq(7L)).collect().map(_.getLong(0)).toSet
      // truth for THIS query vector: brute cosine over the corpus
      val brute = emb.filter(col("vec_id") =!= 7)
        .crossJoin(broadcast(spark.createDataFrame(Seq(Tuple1(qv.toSeq))).toDF("qv")))
        .select(col("vec_id"),
          expr("""aggregate(zip_with(embedding, qv, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (a, v) -> a + v) /
                 (sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) *
                  sqrt(aggregate(qv, CAST(0.0 AS DOUBLE), (a, v) -> a + v * v)))""").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val r8 = recallAt(8)
    val r64 = recallAt(64)
    assert(r64 >= 0.9, s"HNSW ef=64 recall = $r64")
    assert(r64 >= r8 - 1e-9, s"recall dropped ef=8 ($r8) -> ef=64 ($r64)")
    // freshness: a different source file set reads as stale
    val other = spark.read.parquet(s"$sf/documents.parquet")
      .limit(10).select(col("doc_id").as("vec_id"), expr("array(1.0, 2.0)").as("embedding"))
    assert(!HnswIndex.isFresh(spark, idx, other))
    // second ensure() must not rebuild (same file set)
    val graphFile = java.nio.file.Files.walk(java.nio.file.Paths.get(idx, "graph"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val mtime = java.nio.file.Files.getLastModifiedTime(graphFile)
    HnswIndex.ensure(emb, "vec_id", "embedding", idx,
      m = 8, efConstruction = 64, numBuckets = 8)
    assert(java.nio.file.Files.getLastModifiedTime(graphFile) == mtime)
  }
}
