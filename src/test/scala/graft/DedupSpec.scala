package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Library dedup surface: planted-duplicate recall on the documents
  * table (the same quality bar as the benchmarked txt_* queries).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-dedup-test")
  private lazy val docs = Tables(spark, "/root/testdata/sf0.01").documents
    .select(col("doc_id"), col("text"))

  // plant 50 exact copies and 50 first-word-dropped near-copies
  private lazy val withExact = docs.union(
    docs.filter(col("doc_id") < 50).select(col("doc_id") + 100000, col("text")))
  private lazy val withNear = docs.union(
    docs.filter(col("doc_id") < 50).select(col("doc_id") + 100000,
      expr("substring(text, instr(text, ' ') + 1)")))

  test("dropExactDuplicates removes exactly the planted copies") {
    val n = docs.count()
    val kept = Dedup.dropExactDuplicates(withExact, "doc_id", "text")
    assert(kept.count() == n)
    // keeper is always the original, never the +100000 replant
    assert(kept.filter(col("doc_id") >= 100000).count() == 0)
  }

  test("minhashLsh finds the planted near-duplicates (recall >= 0.9)") {
    val pairs = Dedup.minhashLsh(withNear, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0L until 50L).count(i => pairs.contains((i, i + 100000)))
    assert(found >= 45, s"recall ${found}/50")
    // no candidate explosion: the corpus has some naturally-similar
    // doc pairs beyond the 50 planted ones, but the LSH bucket join
    // must stay far from O(n^2) (500 docs -> ~125k possible pairs)
    assert(pairs.size <= 200, s"${pairs.size} pairs reported")
  }

  test("simhashPairs finds planted near-duplicates within hamming 3") {
    val pairs = Dedup.simhashPairs(withNear, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0L until 50L).count(i => pairs.contains((i, i + 100000)))
    assert(found >= 40, s"recall ${found}/50")
  }

  test("simhashPairs hot-bucket refinement is exact (same pairs either path)") {
    // hotBucket = 0 forces EVERY bucket through the secondary 12-bit
    // subchunk pigeonhole; for hamming <= 3 that path must lose nothing
    val normal = Dedup.simhashPairs(withNear, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Dedup.simhashPairs(withNear, "doc_id", "text", hotBucket = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined == normal, s"refined path lost ${(normal -- refined).take(5)}")
  }

  test("connected components collapse chains, keep singletons, drop by cluster") {
    import spark.implicits._
    // a 6-long chain (multiple propagation rounds), a pair, a triangle
    // with a redundant edge, and two singletons
    val vertices = (1L to 13L).toDF("id")
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // chain
      (8L, 9L), // pair
      (10L, 11L), (11L, 12L), (10L, 12L) // triangle
    ).toDF("a", "b")
    val cc = Dedup.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(cc(_) == 1L))
    assert(cc(7L) == 7L && cc(13L) == 13L)
    assert(cc(8L) == 8L && cc(9L) == 8L)
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))

    val docs = (1L to 13L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val clusters = Dedup.connectedComponents(vertices, edges)
    val kept = Dedup.dropByClusters(docs, "doc_id", clusters)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 7L, 8L, 10L, 13L))

    // edge direction doesn't matter
    val ccRev = Dedup.connectedComponents(vertices,
      edges.select(col("b").as("a"), col("a").as("b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccRev == cc)
  }
}
