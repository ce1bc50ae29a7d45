package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-pipeline operators over the documents table — the
  * training-data-preparation surface a 100 TB corpus pipeline needs:
  * exact dedup, MinHash-LSH near-dup, SimHash, exact n-gram Jaccard,
  * language scoring, quality scoring, token counting, fingerprinting.
  *
  * Scale design: every operator is a hash-shuffle over doc or bucket
  * keys — no driver-side loops, no pairwise O(n^2) joins except within
  * LSH buckets (bounded by band width).
  */
object TextQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private def toks(c: Column): Column = split(lower(c), " ")

  /** The synthetic corpus has no duplicates, so dedup queries plant
    * them deterministically: docs with doc_id < 50 are re-keyed
    * (+100000) and appended — exact copies for exact dedup, first-word-
    * dropped copies for near-dup detection.
    */
  private def withExactDups(x: Tables): DataFrame =
    x.documents.select(col("doc_id"), col("text"), col("source"))
      .union(x.documents.filter(col("doc_id") < 50)
        .select(col("doc_id") + 100000, col("text"), col("source")))

  private def withNearDups(x: Tables): DataFrame =
    x.documents.select(col("doc_id"), col("text"), col("source"))
      .union(x.documents.filter(col("doc_id") < 50)
        .select(col("doc_id") + 100000,
          expr("substring(text, instr(text, ' ') + 1)"), col("source")))

  // ---- exact dedup: content hash, keep min doc_id ---------------------
  private val dedupExact = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      withExactDups(x)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy(col("keeper"))
        .select(col("keeper"), col("n_copies"), col("h"))
    },
    Some("""WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50)
      |SELECT keeper, n_copies, h FROM (
      |  SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
      |  FROM d GROUP BY md5(text))
      |WHERE n_copies > 1 ORDER BY keeper""".stripMargin),
    headline = true)

  // ---- token count + quality scores (SQL-exact in both engines) -------
  private val quality = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val tok = toks(col("text"))
      x.documents.filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          size(tok).as("n_tokens"),
          size(array_distinct(tok)).as("n_uniq_tokens"),
          length(col("text")).as("n_chars"),
          round(length(col("text")).cast("double") / size(tok), 6).as("avg_tok_len"),
          round(size(expr("filter(split(lower(text), ' '), x -> x IN ('the','a','of','to','and','in','is'))"))
            .cast("double") / size(tok), 6).as("stopword_ratio"),
          round((length(col("text")) - length(regexp_replace(col("text"), "[aeiou]", "")))
            .cast("double") / length(col("text")), 6).as("vowel_ratio"),
          round(size(array_distinct(tok)).cast("double") / size(tok), 6).as("ttr"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(lower(text), ' '))) AS INT) AS n_uniq_tokens,
      |  length(text) AS n_chars,
      |  round(CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')), 6) AS avg_tok_len,
      |  round(CAST(len(list_filter(string_split(lower(text), ' '),
      |      x -> x IN ('the','a','of','to','and','in','is'))) AS DOUBLE)
      |    / len(string_split(lower(text), ' ')), 6) AS stopword_ratio,
      |  round(CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
      |    / length(text), 6) AS vowel_ratio,
      |  round(CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
      |    / len(string_split(lower(text), ' ')), 6) AS ttr
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),
    headline = true)

  // ---- language scoring: per-language stopword hit counts -------------
  private val langScore = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      def hits(words: String): Column =
        size(expr(s"filter(split(lower(text), ' '), x -> x IN ($words))"))
      x.documents.filter(col("doc_id") < 200)
        .select(
          col("doc_id"), col("lang"),
          hits("'the','a','of','and','is'").as("en_hits"),
          hits("'el','la','de','y','es'").as("es_hits"),
          hits("'le','la','de','et','est'").as("fr_hits"),
          hits("'der','die','das','und','ist'").as("de_hits"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang,
      |  CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ('the','a','of','and','is'))) AS INT) AS en_hits,
      |  CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ('el','la','de','y','es'))) AS INT) AS es_hits,
      |  CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ('le','la','de','et','est'))) AS INT) AS fr_hits,
      |  CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ('der','die','das','und','ist'))) AS INT) AS de_hits
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))

  // ---- document fingerprint: polynomial rolling hash over tokens ------
  private val fingerprint = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.documents.filter(col("doc_id") < 100)
        .select(col("doc_id"),
          expr("""aggregate(
            transform(split(lower(text), ' '), x -> CAST(ascii(x) + length(x) * 7 AS BIGINT)),
            CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 1000000007)""").as("fp"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(lower(text), ' '), x -> CAST(ascii(x) + length(x) * 7 AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin))

  // ---- exact n-gram Jaccard near-dup (within source buckets) ----------
  // Candidate generation is bucketed by `source` so the pairwise join is
  // bounded per bucket — the exact-verification stage of a dedup
  // pipeline. Token sets via 3-gram shingles.
  private val jaccard = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      // tokens materialized once per row (an attribute, not re-split
      // inside the lambda — that would be O(tokens^2) per doc)
      val shingles = withNearDups(x).filter(col("doc_id") % 100000 < 120)
        .select(col("doc_id"), col("source"), toks(col("text")).as("tk"))
        .select(col("doc_id"), col("source"),
          array_distinct(expr(
            """transform(
                 sequence(1, greatest(size(tk) - 2, 1)),
                 i -> concat_ws(' ', slice(tk, i, 3)))""")).as("sh"))
        // both self-join sides read the staged frame instead of
        // re-shingling the corpus (round-13, guide §2.4; round-14:
        // Ckpt.stage picks localCheckpoint locally, reliable/persist
        // on a cluster — guide §5)
        .transform(graft.operators.Ckpt.stage)
      val a = shingles.select(col("source"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = shingles.select(col("source"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, Seq("source")).filter(col("id_a") < col("id_b"))
        .select(col("source"), col("id_a"), col("id_b"),
          round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH d AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, substring(text, strpos(text, ' ') + 1), source
      |  FROM documents WHERE doc_id < 50),
      |sh AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(string_split(lower(text), ' ')) - 2, 1) + 1),
      |      i -> array_to_string(list_slice(string_split(lower(text), ' '), i, i + 2), ' '))) AS s
      |  FROM d WHERE doc_id % 100000 < 120)
      |SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |    len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
      |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |    len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin))

  // ---- MinHash + LSH near-dup (engine-deterministic; rows-only) -------
  // shingle -> 2 base hashes -> 32 minhash permutations via the
  // double-hashing construction h_i = h1 + i*h2 (2 xxhash64 calls per
  // shingle instead of 32; the i-th permutation min is a codegen'd MIN
  // aggregate over the exploded shingles) -> 8 bands of 4 ->
  // band-bucket join -> candidates -> est. similarity. The only
  // pairwise work happens inside identical-band buckets.
  private def minhashDF(spark: SparkSession, dir: String): DataFrame = {
    val x = t(spark, dir)
    val nHash = 32
    val bands = 8
    val rows = nHash / bands
    // the corpus parquet is ONE small file -> the scan stage gets ~2
    // tasks, serializing all shingling+hashing on 2 cores; one cheap
    // row-level repartition spreads the map work across the cluster
    // (at 100 TB the scan has thousands of splits and this is a no-op
    // cost — maxPartitionBytes already yields full parallelism)
    val shingled = withNearDups(x)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"),
        array_distinct(expr(
          """transform(
               sequence(1, greatest(size(tk) - 2, 1)),
               i -> concat_ws(' ', slice(tk, i, 3)))""")).as("sh"))
    // pmod into 31-bit range: i*h2 + h1 stays far below 2^63, so the
    // combination is ANSI-overflow-safe. Shape note (round 8): an
    // explode-free variant computing signatures map-side with nested
    // transform()/array_min() was measured 8x SLOWER (24s vs 3s at
    // sf0.1) — higher-order functions evaluate interpreted, while this
    // explode + 32 min-aggregates pipeline stays inside whole-stage
    // codegen with map-side partial aggregation (the shuffle carries
    // one 32-value row per doc, not per shingle).
    // explode_OUTER, deliberately: for plain explode the optimizer
    // infers `size(sh) > 0` and pushes the whole interpreted shingle
    // expression into the 2-task scan stage (measured 1.5s of the
    // query); sh is never empty (greatest(..., 1)), so outer semantics
    // are identical and the inferred filter disappears
    val exploded = shingled
      .select(col("doc_id"), explode_outer(col("sh")).as("s"))
      .select(col("doc_id"),
        pmod(org.apache.spark.sql.GraftHashShim.xxh64(col("s")), lit(2147483647L)).as("h1"),
        // second hash family from murmur3 (`hash`) — one string scan,
        // no salted concat allocation (measured ~15% of query time)
        (pmod(hash(col("s")).cast("long"), lit(2147483629L)) + 1L).as("h2"))
    val minAggs = (0 until nHash).map(i =>
      min(pmod(col("h1") + lit(i.toLong) * col("h2"), lit(2147483647L))).as(s"mh_$i"))
    val mh = exploded.groupBy(col("doc_id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until nHash).map(i => col(s"mh_$i")): _*).as("mh"))
    val banded = mh.select(col("doc_id"), col("mh"),
        posexplode(expr(s"""transform(sequence(0, ${bands - 1}),
          b -> xxh64_long(concat_ws(',', transform(slice(mh, b * $rows + 1, $rows), v -> CAST(v AS STRING)))))""")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      // materialized ONCE: the planner broadcasts one side of the
      // self-join (no exchange to reuse), which would otherwise replay
      // the whole signature pipeline for each side (Ckpt.stage =
      // scale-mode materialization policy, round-14, guide §5)
      .transform(graft.operators.Ckpt.stage)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(filter(zip_with(col("a.mh"), col("b.mh"), (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("double") / nHash).as("est_sim"))
      .filter(col("est_sim") >= 0.5)
      // one aggregate replaces distinct (a pair matching in k bands
      // collapses to one row) and the sort rides the same exchange
      .groupBy(col("id_a"), col("id_b")).agg(first(col("est_sim")).as("est_sim"))
      .orderBy(col("id_a"), col("id_b"))
  }
  private val minhash = Q((spark, dir) => minhashDF(spark, dir), None, headline = true)

  // ---- SimHash near-dup (rows-only: engine-specific hash) -------------
  // 64-bit simhash; candidates must share one of 4 16-bit chunks
  // (pigeonhole: hamming <= 3 over 64 bits => >= 1 identical chunk), so
  // the pairwise work is bucket-local — no O(n^2) cross join at scale.
  private val simhash = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val sim = withNearDups(x).select(col("doc_id"),
        expr("""aggregate(
             transform(split(lower(text), ' '), tk -> xxh64_long(tk)),
             CAST(array_repeat(0, 64) AS ARRAY<INT>),
             (acc, h) -> zip_with(acc, sequence(0, 63),
               (a, b) -> a + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END),
             acc -> aggregate(zip_with(acc, sequence(0, 63),
               (v, b) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END),
               CAST(0 AS BIGINT), (s, x) -> s + x))""").as("simhash"))
      val chunked = sim.select(col("doc_id"), col("simhash"),
          posexplode(expr(
            "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)")))
        .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval")
      val a = chunked.select(col("chunk"), col("cval"), col("doc_id").as("id_a"), col("simhash").as("h_a"))
      val b = chunked.select(col("chunk"), col("cval"), col("doc_id").as("id_b"), col("simhash").as("h_b"))
      a.join(b, Seq("chunk", "cval")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), expr(
          "size(filter(transform(sequence(0, 63), b -> (shiftright(h_a, b) & 1) = (shiftright(h_b, b) & 1)), v -> NOT v))").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy(col("id_a"), col("id_b"))
    },
    None)

  // ---- composed corpus pipeline: dedup -> quality gate -> budget ------
  // The end-to-end shape of a training-data preparation job: exact
  // dedup (keep lowest doc_id), quality filters, then admit documents
  // per source until a token budget is hit (running-sum window). Every
  // stage is a hash shuffle or a window — the whole pipeline is one
  // Catalyst plan, no materialization between stages.
  private val pipeline = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val x = t(spark, dir)
      val tok = toks(col("text"))
      val deduped = withExactDups(x)
        .withColumn("keeper",
          min(col("doc_id")).over(Window.partitionBy(md5(col("text").cast("binary")))))
        .filter(col("doc_id") === col("keeper"))
      val scored = deduped.select(col("doc_id"), col("source"),
          size(tok).as("n_tokens"),
          (size(expr("filter(split(lower(text), ' '), x -> x IN ('the','a','of','to','and','in','is'))"))
            .cast("double") / size(tok)).as("stop_ratio"))
        .filter(col("n_tokens") >= 20 && col("stop_ratio") > 0.0)
      scored
        .withColumn("cum_tokens",
          sum(col("n_tokens")).over(
            Window.partitionBy(col("source")).orderBy(col("doc_id"))))
        .filter(col("cum_tokens") <= 20000)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, source FROM documents WHERE doc_id < 50),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT doc_id, text, source,
      |      min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      |    FROM d) WHERE doc_id = keeper),
      |scored AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |    CAST(len(list_filter(string_split(lower(text), ' '),
      |        x -> x IN ('the','a','of','to','and','in','is'))) AS DOUBLE)
      |      / len(string_split(lower(text), ' ')) AS stop_ratio
      |  FROM dedup),
      |gated AS (
      |  SELECT * FROM scored WHERE n_tokens >= 20 AND stop_ratio > 0.0),
      |budgeted AS (
      |  SELECT doc_id, source, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum_tokens
      |  FROM gated)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  max(doc_id) AS last_doc
      |FROM budgeted WHERE cum_tokens <= 20000
      |GROUP BY source ORDER BY source""".stripMargin),
    headline = true)

  // ---- deterministic keyed sampling (operators.Sampling) --------------
  // md5-keyed membership is engine-portable, so the oracle can replay it
  // exactly; fraction filter is map-side, budget is one shuffle.
  private val detSample = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val sampled = graft.operators.Sampling.hashSample(
        x.documents, col("doc_id"), 0.25)
      graft.operators.Sampling.stratifiedBudget(
          sampled, Seq(col("source")), col("doc_id"), 5)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("source"), col("doc_id"))
    },
    Some("""WITH sampled AS (
      |  SELECT * FROM documents
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'),
      |ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM sampled)
      |SELECT doc_id, source, n_chars FROM ranked WHERE rk <= 5
      |ORDER BY source, doc_id""".stripMargin))

  // ---- inverted full-text index (operators.InvertedIndex) -------------
  // build postings (sorted parquet) then AND-search two terms with
  // BM25 scores (tantivy's formula, k1=1.2 b=0.75 — reference
  // inverted_index.rs Bm25Weight); the oracle replays tokenization +
  // the full BM25 arithmetic in SQL with identical operation order.
  // The result set is the (deterministic) match set ordered by doc_id
  // — ranking itself is covered in InvertedIndexSpec.
  private val fulltext = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val idx = s"/tmp/graft_stage/${new java.io.File(dir).getName}/ftidx"
      graft.operators.InvertedIndex.ensure(x.documents, "doc_id", "text", idx)
      graft.operators.InvertedIndex
        .search(spark, idx, Seq("data", "vector"), all = true, k = 1000000)
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
      |  SELECT doc_id, u.t AS token
      |  FROM documents,
      |    unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
      |  WHERE u.t <> ''),
      |doclen AS (
      |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      |avgd AS (
      |  SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM doclen),
      |post AS (
      |  SELECT token, doc_id, count(*) AS tf
      |  FROM tok WHERE token IN ('data', 'vector')
      |  GROUP BY token, doc_id),
      |stats AS (
      |  SELECT token, count(DISTINCT doc_id) AS df FROM post GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT p.doc_id, count(DISTINCT p.token) AS n_terms,
      |    sum(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
      |        * 2.2 * p.tf / (p.tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
      |  FROM post p JOIN stats USING (token)
      |       JOIN doclen USING (doc_id) CROSS JOIN n CROSS JOIN avgd
      |  GROUP BY p.doc_id)
      |SELECT doc_id, round(s, 6) AS score FROM scored
      |WHERE n_terms = 2 ORDER BY doc_id""".stripMargin))

  // ---- phrase search over the positional index -----------------------
  // (reference: tantivy phrase scorer via recorded positions) — all
  // docs whose token stream contains the exact consecutive phrase,
  // with occurrence counts; the oracle replays positional alignment
  // with a LATERAL slice scan over the same tokenization
  private val phrase = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      // same persisted index as txt_fulltext: built once per corpus
      // file set, probe-only afterwards
      val idx = s"/tmp/graft_stage/${new java.io.File(dir).getName}/ftidx"
      graft.operators.InvertedIndex.ensure(x.documents, "doc_id", "text", idx)
      graft.operators.InvertedIndex
        .phraseSearch(spark, idx, "table part", k = 1000000)
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                x -> len(x) > 0) AS tk
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS occurrences
      |  FROM toks, LATERAL unnest(range(1, greatest(len(tk) - 1, 0) + 1)) AS u(i)
      |  WHERE list_slice(tk, i, i + 1) = ['table', 'part']
      |  GROUP BY doc_id)
      |SELECT doc_id, occurrences FROM occ ORDER BY doc_id""".stripMargin))

  // ---- near-dup clustering: connected components over pairs ----------
  // The transitive-closure step after pair verification (A~B, B~C =>
  // one cluster even when A!~C). Spark side: Dedup.connectedComponents
  // min-label propagation (one shuffle per round, localCheckpoint-
  // truncated lineage). Oracle: DuckDB recursive CTE spreading labels
  // over the same deterministic jaccard>=0.35 pairs, then min per id.
  private val dedupClusters = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val shingles = withNearDups(x).filter(col("doc_id") % 100000 < 120)
        .select(col("doc_id"), col("source"), toks(col("text")).as("tk"))
        .select(col("doc_id"), col("source"),
          array_distinct(expr(
            """transform(
                 sequence(1, greatest(size(tk) - 2, 1)),
                 i -> concat_ws(' ', slice(tk, i, 3)))""")).as("sh"))
        // feeds BOTH self-join sides and the vertex set: without the
        // checkpoint the scan + shingling subtree ran three times
        // (round-13, guide §2.4; same pattern as minhashLsh; round-14:
        // Ckpt.stage scale-mode policy, guide §5)
        .transform(graft.operators.Ckpt.stage)
      val a = shingles.select(col("source"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = shingles.select(col("source"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
      val pairs = a.join(b, Seq("source")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("j"))
        .filter(col("j") >= 0.35)
      val vertices = shingles.select(col("doc_id").as("id")).distinct()
      val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      val clusters = graft.operators.Dedup.connectedComponents(vertices, edges)
      clusters.groupBy(col("cluster"))
        .agg(count(lit(1)).cast("long").as("cluster_size"),
          min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
        .orderBy(col("cluster"))
    },
    Some("""WITH RECURSIVE d AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, substring(text, strpos(text, ' ') + 1), source
      |  FROM documents WHERE doc_id < 50),
      |sh AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(string_split(lower(text), ' ')) - 2, 1) + 1),
      |      i -> array_to_string(list_slice(string_split(lower(text), ' '), i, i + 2), ' '))) AS s
      |  FROM d WHERE doc_id % 100000 < 120),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |        len(list_distinct(list_concat(a.s, b.s))) >= 0.35),
      |und AS (SELECT id_a AS a, id_b AS b FROM pairs
      |        UNION SELECT id_b, id_a FROM pairs),
      |reach(id, lbl) AS (
      |  SELECT doc_id, doc_id FROM sh
      |  UNION
      |  SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.id),
      |labels AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id)
      |SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size,
      |  min(id) AS min_doc, max(id) AS max_doc
      |FROM labels GROUP BY cluster ORDER BY cluster""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "txt_dedup_clusters" -> dedupClusters.copy(headline = true),
    "txt_phrase" -> phrase.copy(headline = true),
    "txt_fulltext" -> fulltext.copy(headline = true),
    "txt_pipeline" -> pipeline,
    "txt_dedup_exact" -> dedupExact,
    "txt_quality" -> quality,
    "txt_lang_score" -> langScore,
    "txt_fingerprint" -> fingerprint,
    "txt_jaccard_pairs" -> jaccard,
    "txt_minhash_lsh" -> minhash,
    "txt_simhash" -> simhash,
    "txt_det_sample" -> detSample)
}
