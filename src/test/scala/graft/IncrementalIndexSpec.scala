package graft

import java.nio.file.{Files, Path, Paths}

import graft.operators.{HnswIndex, InvertedIndex, VectorIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental index maintenance (round-7 verdict ask #5; reference
  * indexes per-block at write — fuse_pruner.rs:88-93, hnsw_index/):
  * an append-only source growth delta-indexes ONLY the new files —
  * existing index data files are never rewritten — and probes merge
  * the generations. Any non-append change still rebuilds wholesale.
  */
class IncrementalIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-incr-index-test")

  private def tmp(prefix: String): Path = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix)
  }

  /** data files currently in a directory tree (ignores _SUCCESS/meta) */
  private def dataFiles(dir: String): Set[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Set.empty
    else {
      val s = Files.walk(root)
      try s.filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .map[String](_.toString).toArray.map(_.asInstanceOf[String]).toSet
      finally s.close()
    }
  }

  private def srcScan(dir: Path): DataFrame = spark.read.parquet(dir.toString)

  // ---- shared source staging -------------------------------------------

  /** gen-0: embeddings vec_id < 60; appended file: 60 <= vec_id < 80 */
  private def stageVectors(): Path = {
    val dir = tmp("vecsrc")
    Tables(spark, "/root/testdata/sf0.001").embeddings
      .filter(col("vec_id") > 0 && col("vec_id") < 60)
      .coalesce(1).write.mode("append").parquet(dir.toString)
    dir
  }

  private def appendVectors(dir: Path): Unit =
    Tables(spark, "/root/testdata/sf0.001").embeddings
      .filter(col("vec_id") >= 60 && col("vec_id") < 80)
      .coalesce(1).write.mode("append").parquet(dir.toString)

  test("IVF refresh indexes only appended files; probe sees both generations") {
    val src = stageVectors()
    val idx = tmp("ivfidx").toString
    VectorIndex.ensure(srcScan(src), "vec_id", "embedding", idx, k = 4, iters = 1)
    val before = dataFiles(s"$idx/assignments")
    assert(before.nonEmpty)

    appendVectors(src)
    VectorIndex.ensure(srcScan(src), "vec_id", "embedding", idx, k = 4, iters = 1)
    val after = dataFiles(s"$idx/assignments")
    // delta: every gen-0 assignment file is still there, new ones added
    assert(before.subsetOf(after), "refresh must not rewrite existing assignment files")
    assert(after.size > before.size, "refresh must add assignment files for the new rows")
    assert(VectorIndex.isFresh(spark, idx, srcScan(src)))

    // a probe at full width finds an appended row by its own vector
    val qv = srcScan(src).filter(col("vec_id") === 70)
      .select(expr("transform(embedding, e -> CAST(e AS DOUBLE))"))
      .head().getSeq[Double](0).toArray
    val top = VectorIndex.search(spark, idx, qv, nProbe = 4, k = 1)
      .head().getLong(0)
    assert(top == 70L, s"expected appended vec 70 as its own nearest, got $top")
  }

  test("IVF non-append change (shrunk source) falls back to full rebuild") {
    val src = stageVectors()
    appendVectors(src) // second file, so a delete leaves a readable scan
    val idx = tmp("ivfidx").toString
    VectorIndex.ensure(srcScan(src), "vec_id", "embedding", idx, k = 4, iters = 1)
    // delete one source file -> pinned set is no longer a subset
    val f = dataFiles(src.toString).head
    Files.delete(Paths.get(f))
    VectorIndex.ensure(srcScan(src), "vec_id", "embedding", idx, k = 4, iters = 1)
    assert(VectorIndex.isFresh(spark, idx, srcScan(src)))
  }

  test("IVF compaction re-indexes ONLY the touched generation") {
    val src = stageVectors()
    val idx = tmp("ivfidx3").toString
    VectorIndex.ensure(srcScan(src), "vec_id", "embedding", idx, k = 4, iters = 1)
    val before = dataFiles(src.toString)
    appendVectors(src)
    val fileB = (dataFiles(src.toString) -- before).head
    VectorIndex.ensure(srcScan(src), "vec_id", "embedding", idx, k = 4, iters = 1)
    val gen0 = dataFiles(s"$idx/assignments/gen=0")
    assert(gen0.nonEmpty)
    // compact the appended file: rewrite its rows into a fresh file
    Files.delete(Paths.get(fileB))
    appendVectors(src)
    VectorIndex.ensure(srcScan(src), "vec_id", "embedding", idx, k = 4, iters = 1)
    assert(dataFiles(s"$idx/assignments/gen=0") == gen0,
      "compaction of another generation must not touch gen=0 assignments")
    assert(VectorIndex.isFresh(spark, idx, srcScan(src)))
    val qv = srcScan(src).filter(col("vec_id") === 70)
      .select(expr("transform(embedding, e -> CAST(e AS DOUBLE))"))
      .head().getSeq[Double](0).toArray
    assert(VectorIndex.search(spark, idx, qv, nProbe = 4, k = 1).head().getLong(0) == 70L)
  }

  test("HNSW compaction re-indexes ONLY the touched generation") {
    val src = stageVectors()
    val idx = tmp("hnswidx3").toString
    HnswIndex.ensure(srcScan(src), "vec_id", "embedding", idx, numBuckets = 2)
    val before = dataFiles(src.toString)
    appendVectors(src)
    val fileB = (dataFiles(src.toString) -- before).head
    HnswIndex.ensure(srcScan(src), "vec_id", "embedding", idx, numBuckets = 2)
    val gen0 = dataFiles(s"$idx/graph/gen=0")
    assert(gen0.nonEmpty)
    Files.delete(Paths.get(fileB))
    appendVectors(src)
    HnswIndex.ensure(srcScan(src), "vec_id", "embedding", idx, numBuckets = 2)
    assert(dataFiles(s"$idx/graph/gen=0") == gen0,
      "compaction of another generation must not touch gen=0 graphs")
    assert(HnswIndex.isFresh(spark, idx, srcScan(src)))
    val qv = srcScan(src).filter(col("vec_id") === 70)
      .select(expr("transform(embedding, e -> CAST(e AS DOUBLE))"))
      .head().getSeq[Double](0).toArray
    val ids = HnswIndex.search(spark, idx, qv, k = 3, ef = 64)
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(70L), s"got $ids")
  }

  test("HNSW refresh appends generation subgraphs; merged probe covers both") {
    val src = stageVectors()
    val idx = tmp("hnswidx").toString
    HnswIndex.ensure(srcScan(src), "vec_id", "embedding", idx, numBuckets = 2)
    val before = dataFiles(s"$idx/graph")
    val nBlobsBefore = spark.read.parquet(s"$idx/graph").count()

    appendVectors(src)
    HnswIndex.ensure(srcScan(src), "vec_id", "embedding", idx, numBuckets = 2)
    assert(before.subsetOf(dataFiles(s"$idx/graph")),
      "refresh must not rewrite existing graph blobs")
    assert(spark.read.parquet(s"$idx/graph").count() > nBlobsBefore,
      "refresh must append generation subgraphs")
    assert(HnswIndex.isFresh(spark, idx, srcScan(src)))

    val qv = srcScan(src).filter(col("vec_id") === 70)
      .select(expr("transform(embedding, e -> CAST(e AS DOUBLE))"))
      .head().getSeq[Double](0).toArray
    val ids = HnswIndex.search(spark, idx, qv, k = 3, ef = 64)
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(70L), s"appended vec 70 must be findable, got $ids")
  }

  test("inverted refresh appends a generation; BM25 stats merge exactly") {
    import spark.implicits._
    val src = tmp("docsrc")
    Seq((1L, "spark shuffles data"), (2L, "spark prunes partitions"),
      (3L, "ducks eat bread"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src.toString)
    val idx = tmp("invidx").toString
    InvertedIndex.ensure(srcScan(src), "doc_id", "text", idx)
    val before = dataFiles(idx)

    Seq((4L, "spark broadcasts small tables"), (5L, "bread rises slowly"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src.toString)
    InvertedIndex.ensure(srcScan(src), "doc_id", "text", idx)
    assert(before.subsetOf(dataFiles(idx)),
      "refresh must not rewrite existing postings files")
    assert(InvertedIndex.isFresh(spark, idx, srcScan(src)))

    // term 'spark' now spans generations: df = 3 across 1,2,4
    val hits = InvertedIndex.search(spark, idx, Seq("spark"), all = true, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L, 4L), s"got $hits")

    // merged stats equal a from-scratch single-generation build
    val rebuilt = tmp("invidx2").toString
    InvertedIndex.build(srcScan(src), "doc_id", "text", rebuilt)
    val a = InvertedIndex.search(spark, idx, Seq("spark", "bread"), all = false, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = InvertedIndex.search(spark, rebuilt, Seq("spark", "bread"), all = false, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, s"generational scores $a != single-build scores $b")
  }

  test("inverted compaction re-indexes ONLY the touched generation") {
    import spark.implicits._
    val src = tmp("docsrc2")
    Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src.toString)
    val idx = tmp("invidx3").toString
    InvertedIndex.ensure(srcScan(src), "doc_id", "text", idx)          // gen-0
    Seq((3L, "gamma delta"), (4L, "delta epsilon"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src.toString)
    InvertedIndex.ensure(srcScan(src), "doc_id", "text", idx)          // gen-1
    val gen0 = dataFiles(s"$idx/gen-00000")
    assert(gen0.nonEmpty && Files.exists(Paths.get(idx, "gen-00001")))

    // compact gen-1's source file: rewrite docs 3-4 into a fresh file
    val gen1Src = spark.read.parquet(s"$idx/gen-00001/meta")
      .select("source_files").head().getSeq[String](0)
    val survivors = spark.read.parquet(gen1Src: _*).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    gen1Src.foreach(f => Files.delete(Paths.get(f.stripPrefix("file:"))))
    survivors.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src.toString)

    InvertedIndex.ensure(srcScan(src), "doc_id", "text", idx)
    // the untouched generation is byte-identical; the touched one is
    // dropped and its survivors re-indexed as a replacement generation
    // covering ONLY the compacted file
    assert(dataFiles(s"$idx/gen-00000") == gen0,
      "compaction of another bucket must not touch gen-0")
    val gen1SrcAfter = spark.read.parquet(s"$idx/gen-00001/meta")
      .select("source_files").head().getSeq[String](0).toSet
    assert(gen1SrcAfter != gen1Src.toSet && gen1SrcAfter.size == 1,
      s"touched gen must be re-created over the compacted file, covers $gen1SrcAfter")
    assert(InvertedIndex.isFresh(spark, idx, srcScan(src)))
    val beta = InvertedIndex.search(spark, idx, Seq("beta"), all = true, k = 10)
      .collect().map(_.getLong(0)).toSet
    val delta = InvertedIndex.search(spark, idx, Seq("delta"), all = true, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(beta == Set(1L, 2L) && delta == Set(3L, 4L), s"$beta / $delta")
    // scores equal a from-scratch build (BM25 stats merge exactly)
    val rebuilt = tmp("invidx4").toString
    InvertedIndex.build(srcScan(src), "doc_id", "text", rebuilt)
    val a = InvertedIndex.search(spark, idx, Seq("beta", "delta"), all = false, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = InvertedIndex.search(spark, rebuilt, Seq("beta", "delta"), all = false, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, s"$a != $b")
  }
}
