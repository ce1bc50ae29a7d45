package graft

import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Inverted full-text index (SURVEY §4.2 pruning-stack extra):
  * build → AND/OR search → TF-IDF ranking.
  */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-ftidx-test")

  private def tmp(): String = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "ftidx").toString
  }

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark sql engine for big data"),
      (2L, "data data data everywhere"),
      (3L, "vector search over embeddings"),
      (4L, "big data and vector search together"),
      (5L, "Unrelated! Text; with PUNCTUATION.")
    ).toDF("doc_id", "text")
  }

  test("AND search returns only docs with every term") {
    val idx = tmp()
    InvertedIndex.build(corpus, "doc_id", "text", idx)
    val hits = InvertedIndex.search(spark, idx, Seq("data", "vector"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(4L))
  }

  test("OR search unions matches; higher tf ranks first") {
    val idx = tmp()
    InvertedIndex.build(corpus, "doc_id", "text", idx)
    val rows = InvertedIndex.search(spark, idx, Seq("data"), all = false)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    // doc 2 has tf=3 for "data" -> must rank first
    assert(rows.head.getLong(0) == 2L)
  }

  test("tokenizer is case/punctuation-insensitive") {
    val idx = tmp()
    InvertedIndex.build(corpus, "doc_id", "text", idx)
    val hits = InvertedIndex.search(spark, idx, Seq("PUNCTUATION"), all = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(5L))
  }

  test("term scan is a pushed-down filter on the postings parquet") {
    val idx = tmp()
    InvertedIndex.build(corpus, "doc_id", "text", idx)
    val plan = InvertedIndex.search(spark, idx, Seq("data", "vector"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("token"), plan)
  }

  test("BM25 scores match a hand-computed golden (tantivy formula)") {
    // corpus stats by hand: doc lengths 6,4,4,6,4 -> avgdl = 24/5 = 4.8
    // df(data)=3 over n=5, df(vector)=2; doc 4 has tf=1 for both, dl=6
    //   idf(t)   = ln(1 + (5 - df + 0.5) / (df + 0.5))
    //   norm     = tf + 1.2 * (0.25 + 0.75 * 6 / 4.8) = 2.425
    //   score(4) = (ln(1 + 2.5/3.5) + ln(1 + 3.5/2.5)) * 2.2 * 1 / 2.425
    val idx = tmp()
    InvertedIndex.build(corpus, "doc_id", "text", idx)
    val row = InvertedIndex.search(spark, idx, Seq("data", "vector"))
      .collect().head
    assert(row.getLong(0) == 4L)
    val expected = (math.log(1 + 2.5 / 3.5) + math.log(1 + 3.5 / 2.5)) * 2.2 / 2.425
    assert(math.abs(row.getDouble(1) - expected) < 1e-6,
      s"got ${row.getDouble(1)}, hand-computed $expected")
    // length norm: same tf, shorter doc scores higher (single-term OR)
    val or = InvertedIndex.search(spark, idx, Seq("big"), all = false).collect()
    assert(or.map(_.getLong(0)).toSet == Set(1L, 4L))
    // docs 1 and 4 both have tf=1, dl=6 -> identical scores
    assert(or(0).getDouble(1) == or(1).getDouble(1))
  }

  test("ensure builds once per corpus file set; stale pin rebuilds") {
    val dir = tmp()
    val corpusPath = s"$dir/corpus"
    corpus.write.parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    val idx = s"$dir/idx"
    InvertedIndex.ensure(docs, "doc_id", "text", idx)
    assert(InvertedIndex.isFresh(spark, idx, docs))
    val metaFile = Files.walk(Paths.get(idx, "gen-00000", "meta"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val mtime = Files.getLastModifiedTime(metaFile)
    InvertedIndex.ensure(docs, "doc_id", "text", idx) // no rebuild
    assert(Files.getLastModifiedTime(metaFile) == mtime)
    // appending a file to the corpus makes the pin stale
    corpus.limit(1).write.mode("append").parquet(corpusPath)
    val grown = spark.read.parquet(corpusPath)
    assert(!InvertedIndex.isFresh(spark, idx, grown))
  }

  test("phrase search matches consecutive tokens only, in order") {
    val idx = tmp()
    InvertedIndex.build(corpus, "doc_id", "text", idx)
    def hits(p: String) = InvertedIndex.phraseSearch(spark, idx, p, k = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits("big data") == Map(1L -> 1L, 4L -> 1L))
    assert(hits("vector search") == Map(3L -> 1L, 4L -> 1L))
    // present as words but never consecutive in this order
    assert(hits("data big").isEmpty)
    // repeated term: only doc 2 has data immediately followed by data
    assert(hits("data data") == Map(2L -> 2L)) // positions 0-1 and 1-2
    // single-term phrase: occurrences = tf
    assert(hits("data") == Map(1L -> 1L, 2L -> 3L, 4L -> 1L))
    // case/punctuation-insensitive like the term search
    assert(hits("BIG, Data!") == Map(1L -> 1L, 4L -> 1L))
    assert(hits("nonexistent phrase").isEmpty)
  }
}
