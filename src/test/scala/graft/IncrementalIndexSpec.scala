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
    val before = dataFiles(s"$idx/postings")

    Seq((4L, "spark broadcasts small tables"), (5L, "bread rises slowly"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src.toString)
    InvertedIndex.ensure(srcScan(src), "doc_id", "text", idx)
    assert(before.subsetOf(dataFiles(s"$idx/postings")),
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
}
