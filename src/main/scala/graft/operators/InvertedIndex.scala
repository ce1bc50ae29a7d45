package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text inverted index (reference: tantivy-backed inverted index
  * in the fuse pruning stack, src/query/storages/common/index/src/
  * inverted_index.rs:70 — SURVEY §4.2 "hard extras"), re-expressed
  * Spark-first: the index IS a parquet postings table
  * `(token, doc_id, tf)` written sorted by token, so a term lookup is
  * a pushed-down `token IN (...)` scan that row-group-prunes on the
  * token min/max — at 100 TB a query touches only the row groups whose
  * token range intersects the query terms, never the corpus.
  *
  * Search is relational: term filter → per-doc AND/OR semantics via a
  * grouped distinct-term count → TF-IDF score → top-k. No driver-side
  * state; the index is rebuildable incrementally by appending postings
  * for new docs and re-sorting (recluster).
  */
object InvertedIndex {

  /** lowercase alpha-numeric tokens, same rule everywhere (and cheap to
    * replay in another engine for oracle checks)
    */
  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** tantivy's BM25 constants (reference inverted_index.rs:89-90
    * Bm25Weight; tantivy bm25.rs K1 = 1.2, B = 0.75)
    */
  val K1 = 1.2
  val B = 0.75

  /** Build (or rebuild) the index from scratch: wipe every generation
    * and write the full corpus as gen-0.
    */
  def build(docs: DataFrame, idCol: String, textCol: String, indexPath: String): Unit = {
    rmrf(indexPath)
    writeGeneration(docs, idCol, textCol, indexPath, docs.inputFiles.sorted.toSeq)
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

  /** One index GENERATION = its own directory `gen-<n>/` holding
    * postings + per-generation term dfs + one meta row with the
    * generation's exact integer totals and the source files it covers.
    * The read side merges generations by glob (df-sums and avgdl from
    * summed totals), so maintenance is directory-local: an append
    * writes a new generation, a compaction/DELETE drops ONLY the
    * generations whose files changed — the reference indexes per-block
    * at write (fuse_pruner.rs:88-93) and merges per-block indexes at
    * query time the same way. Positions make phrase queries a
    * relational join (tantivy records positions for its phrase
    * scorer); each posting denormalizes the document's token count
    * (`dl`) so BM25's length norm needs NO corpus-sized doc-length
    * join at query time — a term lookup stays one IN-pruned scan at
    * 100 TB (+8 bytes/row).
    */
  private def writeGeneration(docs: DataFrame, idCol: String, textCol: String,
                              indexPath: String, files: Seq[String]): Unit = {
    val genId = generations(indexPath)
      .map(_.getName.stripPrefix("gen-").toLong).foldLeft(-1L)(_ max _) + 1
    val genPath = f"$indexPath/gen-$genId%05d"
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val postings = docs
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("dl", sum(col("tf")).over(byDoc))
      .cache()
    try {
      postings
        .repartitionByRange(col("token"))
        .sortWithinPartitions(col("token"))
        .write.mode("overwrite").parquet(s"$genPath/postings")
      val stats = postings.groupBy(col("token"))
        .agg(countDistinct(col("doc_id")).as("df"))
      stats.repartitionByRange(col("token")).sortWithinPartitions(col("token"))
        .write.mode("overwrite").parquet(s"$genPath/stats")
      // exact integer totals so the merged avgdl is reproducible
      // bit-for-bit by an oracle (sum of tf = total tokens)
      val t = postings.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
        .agg(sum(col("dl")).as("total"), count(lit(1)).as("n")).head()
      val (totalDl, nDlDocs) =
        if (t.isNullAt(0)) (0L, 0L) else (t.getLong(0), t.getLong(1))
      val nDocs = docs.count()
      docs.sparkSession
        .createDataFrame(Seq((nDocs, totalDl, nDlDocs, files)))
        .toDF("n_docs", "total_dl", "n_dl_docs", "source_files")
        .write.mode("overwrite").parquet(s"$genPath/meta")
    } finally postings.unpersist()
  }

  /** generation directories, oldest first */
  private def generations(indexPath: String): Seq[java.io.File] =
    Option(new java.io.File(indexPath).listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .sortBy(_.getName).toSeq

  /** the file set a generation covers (empty on unreadable meta);
    * mtime-keyed MetaCache — this ran a collect() job per generation
    * on EVERY probe (round-13)
    */
  private def genSourceFiles(spark: SparkSession, genDir: String): Set[String] =
    // catch OUTSIDE cached(): a transient read failure must not be
    // memoized as 'no files' until the signature changes (r13 advisory)
    try MetaCache.cached(s"ii-files:$genDir:" + MetaCache.dirSignature(s"$genDir/meta")) {
      spark.read.parquet(s"$genDir/meta")
        .select(col("source_files"), col("total_dl"))
        .collect().flatMap(_.getSeq[String](0)).toSet
    } catch { case _: Exception => Set.empty[String] }

  /** Union of every generation's pinned files (empty if no index). */
  private def pinnedFiles(spark: SparkSession, indexPath: String): Set[String] =
    generations(indexPath).flatMap(g => genSourceFiles(spark, g.getPath)).toSet

  /** True iff the index exists and its generations together cover
    * exactly the files the corpus currently scans (VectorIndex/
    * AggIndex's exact file-set rule — prefix/subset matches are NOT
    * fresh).
    */
  def isFresh(spark: SparkSession, indexPath: String, docs: DataFrame): Boolean = {
    val pinned = pinnedFiles(spark, indexPath)
    pinned.nonEmpty && pinned == docs.inputFiles.toSet
  }

  /** Build-if-stale, generation-local: the index is built ONCE per
    * corpus file set and every subsequent query is probe-only — the
    * production shape (a 100 TB corpus is indexed at ingest, not per
    * query). Maintenance is a file-set diff against each generation:
    * generations whose files all survive are KEPT untouched;
    * generations touched by a compaction/DELETE are dropped (their
    * directory only); files not covered by a kept generation — new
    * appends and compaction survivors alike — are indexed as one new
    * generation. Append-only growth therefore writes one delta
    * generation, and a single-bucket compaction re-indexes only that
    * bucket's files.
    */
  def ensure(docs: DataFrame, idCol: String, textCol: String,
             indexPath: String): String = synchronized {
    val spark = docs.sparkSession
    val current = docs.inputFiles.toSet
    val gens = generations(indexPath)
      .map(g => g.getPath -> genSourceFiles(spark, g.getPath))
    if (gens.isEmpty &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$indexPath/meta")))
      rmrf(indexPath) // pre-generational (r8) layout: rebuild clean
    val (keep, drop) = gens.partition { case (_, fs) =>
      fs.nonEmpty && fs.subsetOf(current)
    }
    val covered = keep.flatMap(_._2).toSet
    if (covered == current && drop.isEmpty && gens.nonEmpty) return indexPath
    drop.foreach { case (dir, _) => rmrf(dir) }
    val orphan = (current -- covered).toSeq.sorted
    if (orphan.nonEmpty)
      writeGeneration(spark.read.parquet(orphan: _*), idCol, textCol,
        indexPath, orphan)
    else if (keep.isEmpty)
      build(docs, idCol, textCol, indexPath)
    indexPath
  }

  /** Search: docs containing terms (`all = true` → every term, AND;
    * false → any term, OR), ranked by BM25 with tantivy's formula
    * (reference inverted_index.rs Bm25Weight):
    *   idf    = ln(1 + (n_docs - df + 0.5) / (df + 0.5))
    *   score += idf * (k1+1) * tf / (tf + k1 * (1 - b + b * dl/avgdl))
    * Term filter is a pushed-down IN list.
    */
  def search(spark: SparkSession, indexPath: String, terms: Seq[String],
             all: Boolean = true, k: Int = 10): DataFrame = {
    val normTerms = terms.map(_.toLowerCase).distinct
    // merge generations: integer totals sum exactly, so avgdl over the
    // merged corpus is the same double a single-generation build yields.
    // mtime-keyed MetaCache: this agg was a driver-blocking head() job
    // on EVERY probe (round-13)
    val metaSig = generations(indexPath)
      .map(g => MetaCache.dirSignature(g.getPath + "/meta")).mkString("|")
    val (nDocs, avgdl) = MetaCache.cached(s"ii-meta:$indexPath:$metaSig") {
      val meta = spark.read.parquet(s"$indexPath/gen-*/meta")
        .agg(sum(col("n_docs")), sum(col("total_dl")), sum(col("n_dl_docs"))).head()
      val n = meta.getLong(0)
      val a = if (meta.getLong(2) == 0L) 0.0
              else meta.getLong(1).toDouble / meta.getLong(2)
      (n, a)
    }
    val post = spark.read.parquet(s"$indexPath/gen-*/postings")
      .filter(col("token").isin(normTerms: _*))
    val stats = spark.read.parquet(s"$indexPath/gen-*/stats")
      .filter(col("token").isin(normTerms: _*))
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
    val scored = post.join(broadcast(stats), "token")
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        // literal 2.2 / 0.25, not K1+1.0 / 1.0-B: an oracle replaying
        // "2.2" must get the same double bit pattern
        col("idf") * lit(2.2) * col("tf") /
          (col("tf") + lit(K1) * (lit(0.25) + lit(B) * col("dl") / lit(avgdl))))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("token")).as("n_terms"), sum(col("w")).as("score"))
    val hits = if (all) scored.filter(col("n_terms") === normTerms.length) else scored
    hits.select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Phrase search: documents containing the query tokens CONSECUTIVELY
    * in order, ranked by occurrence count. Classic positional
    * alignment, kept relational: every query term contributes its
    * positions shifted back by its phrase offset; a (doc, base
    * position) that collects every distinct offset is one phrase
    * occurrence. One IN-pruned postings scan + one shuffle — duplicate
    * terms in the phrase work because matching is per (token, offset)
    * pair.
    */
  def phraseSearch(spark: SparkSession, indexPath: String, phrase: String,
                   k: Int = 10): DataFrame = {
    import spark.implicits._
    val terms = phrase.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "empty phrase")
    val offsets = terms.zipWithIndex.toDF("token", "qoff")
    val post = spark.read.parquet(s"$indexPath/gen-*/postings")
      .filter(col("token").isin(terms.distinct: _*))
    post.join(broadcast(offsets), "token")
      .select(col("doc_id"), col("qoff"), explode(col("positions")).as("pos"))
      .withColumn("base", col("pos") - col("qoff"))
      .groupBy(col("doc_id"), col("base"))
      .agg(countDistinct(col("qoff")).as("nmatch"))
      .filter(col("nmatch") === terms.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("doc_id"))
      .limit(k)
  }
}
