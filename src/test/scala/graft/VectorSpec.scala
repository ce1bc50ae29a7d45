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
}
