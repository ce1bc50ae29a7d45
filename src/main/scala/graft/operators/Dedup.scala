package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication as a library surface (the training-data ops the
  * reference-scale pipelines need; same algorithms as the benchmarked
  * `txt_*` queries, packaged for reuse).
  *
  * Scale notes: every method is shuffle-bounded — exact dedup is one
  * hash aggregate; MinHash-LSH only compares documents that share a
  * band bucket; SimHash only compares documents that share one 16-bit
  * chunk (pigeonhole for hamming <= 3). Nothing is O(n^2) globally.
  */
object Dedup {

  /** Exact duplicate groups by content hash. Returns `df` plus a
    * `dup_group_keeper` column: the minimum `idCol` among identical
    * `textCol` values (rows where keeper != id are droppable copies).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("dup_group_keeper",
      min(col(idCol)).over(Window.partitionBy(md5(col(textCol).cast("binary")))))
  }

  /** Drop exact duplicates, keeping the smallest id per content group. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df, idCol, textCol)
      .filter(col(idCol) === col("dup_group_keeper"))
      .drop("dup_group_keeper")

  /** MinHash-LSH near-duplicate candidate pairs above `threshold`
    * estimated Jaccard similarity. Output: (id_a, id_b, est_sim) with
    * id_a < id_b. `nHash` permutations via the double-hashing
    * construction (2 hashes per shingle, the i-th permutation is a
    * codegen MIN aggregate), banded into `bands` buckets.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.5, nHash: Int = 32, bands: Int = 8): DataFrame = {
    require(nHash % bands == 0, "bands must divide nHash")
    val rows = nHash / bands
    val shingled = df
      .select(col(idCol).as("__id"), split(lower(col(textCol)), " ").as("tk"))
      .select(col("__id"),
        array_distinct(expr(
          """transform(
               sequence(1, greatest(size(tk) - 2, 1)),
               i -> concat_ws(' ', slice(tk, i, 3)))""")).as("sh"))
    // explode + codegen'd min-aggregates (NOT a transform()/array_min()
    // HOF pass: interpreted HOFs measured 8x slower at sf0.1); map-side
    // partial aggregation keeps the shuffle at one 32-value row per doc
    val exploded = shingled
      .select(col("__id"), explode_outer(col("sh")).as("s"))
      .select(col("__id"),
        pmod(org.apache.spark.sql.GraftHashShim.xxh64(col("s")), lit(2147483647L)).as("h1"),
        (pmod(org.apache.spark.sql.GraftHashShim.xxh64(concat(lit("graft-salt:"), col("s"))), lit(2147483629L)) + 1L).as("h2"))
    val minAggs = (0 until nHash).map(i =>
      min(pmod(col("h1") + lit(i.toLong) * col("h2"), lit(2147483647L))).as(s"mh_$i"))
    val mh = exploded.groupBy(col("__id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("__id"), array((0 until nHash).map(i => col(s"mh_$i")): _*).as("mh"))
    // materialize the signature frame ONCE: the bucket self-join below
    // references it on both sides, and without a checkpoint each side
    // replays the full shingle -> 32-way min-agg pipeline (ReuseExchange
    // does not fire across the differing join-side aliases).
    // Ckpt.stage = localCheckpoint locally, reliable/persist on a
    // cluster (round-14 scale-mode policy, guide §5)
    val banded = Ckpt.stage(mh.select(col("__id"), col("mh"),
        posexplode(expr(s"""transform(sequence(0, ${bands - 1}),
          b -> xxh64_long(concat_ws(',', transform(slice(mh, b * $rows + 1, $rows), v -> CAST(v AS STRING)))))""")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket"))
    val l = banded.select(col("band"), col("bucket"), col("__id").as("id_a"), col("mh").as("mh_a"))
    val r = banded.select(col("band"), col("bucket"), col("__id").as("id_b"), col("mh").as("mh_b"))
    l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(expr("filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v)")).cast("double") / nHash).as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= threshold)
  }

  /** 64-bit SimHash per document (token-hash sign aggregation). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol))
      .withColumn("simhash", expr(
        s"""aggregate(
             transform(split(lower(`$textCol`), ' '), tk -> xxh64_long(tk)),
             CAST(array_repeat(0, 64) AS ARRAY<INT>),
             (acc, h) -> zip_with(acc, sequence(0, 63),
               (a, b) -> a + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END),
             acc -> aggregate(zip_with(acc, sequence(0, 63),
               (v, b) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END),
               CAST(0 AS BIGINT), (s, x) -> s + x))"""))

  /** SimHash near-duplicate pairs with hamming distance <= maxHamming
    * (must be <= 3 for the 4-chunk pigeonhole bucketing to be exact).
    *
    * Two-level pigeonhole for scale: the primary bucketing is on one of
    * four 16-bit chunks (any pair with hamming <= 3 shares at least one
    * chunk). A 16-bit key gives at most 65536 buckets per chunk, so at
    * billion-doc scale a bucket holds ~n/65536 docs and the bucket-local
    * self-join explodes quadratically. Buckets larger than `hotBucket`
    * are therefore refined by a secondary pigeonhole that is also exact:
    * inside a shared-chunk bucket the remaining 48 bits differ by <= 3,
    * so splitting them into four 12-bit subchunks guarantees at least
    * one equal subchunk. The hot-bucket join key becomes
    * (chunk, cval, sub, subval) — each hot bucket shatters into up to
    * 4x4096 sub-buckets.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, hotBucket: Int = 4096): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole is exact only for hamming <= 3")
    val sim = simhash(df, idCol, textCol).select(col(idCol).as("__id"), col("simhash"))
    val chunked = sim.select(col("__id"), col("simhash"),
        posexplode(expr("transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval")
    // bucket sizes decide which buckets take the refined path; the join
    // back is on the same (chunk, cval) key so the exchange is reused
    val sized = chunked.join(
      chunked.groupBy(col("chunk"), col("cval")).agg(count(lit(1)).as("__n")),
      Seq("chunk", "cval"))
    def pairsOf(src: DataFrame, keys: Seq[String]): DataFrame = {
      val a = src.select(keys.map(col) :+ col("__id").as("id_a") :+ col("simhash").as("h_a"): _*)
      val b = src.select(keys.map(col) :+ col("__id").as("id_b") :+ col("simhash").as("h_b"): _*)
      a.join(b, keys).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), expr(
          "size(filter(transform(sequence(0, 63), b -> (shiftright(h_a, b) & 1) = (shiftright(h_b, b) & 1)), v -> NOT v))").as("hamming"))
    }
    val cold = pairsOf(sized.filter(col("__n") <= hotBucket), Seq("chunk", "cval"))
    // remaining 48 bits (the three chunks != this one, low-to-high) as a
    // 48-bit value, split into four 12-bit subchunks
    val hot = sized.filter(col("__n") > hotBucket)
      .withColumn("rem", expr(
        """aggregate(
             filter(sequence(0, 3), k -> k != chunk),
             named_struct('acc', CAST(0 AS BIGINT), 'i', 0),
             (st, k) -> named_struct(
               'acc', st.acc + shiftleft(shiftright(simhash, k * 16) & 65535, st.i * 16),
               'i', st.i + 1),
             st -> st.acc)"""))
      .select(col("__id"), col("simhash"), col("chunk"), col("cval"),
        posexplode(expr("transform(sequence(0, 3), s -> shiftright(rem, s * 12) & 4095)")))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "subval")
    val hotPairs = pairsOf(hot, Seq("chunk", "cval", "sub", "subval"))
    cold.unionByName(hotPairs)
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over near-dup pairs — the transitive-closure
    * step a corpus dedup needs after candidate verification (A~B and
    * B~C must collapse into ONE keep-group even when A!~C directly).
    * Min-label propagation: every vertex starts as its own label, each
    * round takes the min of its neighbors' labels, fixpoint = the
    * component's min id. O(component diameter) rounds, each one shuffle
    * by id; `localCheckpoint` truncates the growing lineage so round N
    * doesn't replan rounds 1..N-1 (same pattern as RecursiveCte).
    *
    * @param vertices one column `id`
    * @param edges    columns `a`, `b` (undirected pairs, either order)
    * @return (id, cluster) where cluster = min id reachable
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val und = Ckpt.stage(edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct())
    var labels = Ckpt.stage(vertices.select(col("id"), col("id").as("cluster")))
    // Convergence check, NUMERIC ids only: min-label propagation only
    // ever DECREASES a label, so sum(cluster) strictly decreases on any
    // change and stays equal exactly at the fixpoint. Comparing sums is
    // one tiny aggregate per round over the already-checkpointed frame;
    // the join-based shape (next vs labels, count differences) is a
    // full extra join per round (round-13, guide §2.4). DECIMAL(38,0)
    // keeps the sum exact for any numeric id domain. For NON-numeric
    // ids the cast would yield null and the sum would 'converge'
    // immediately with wrong clusters (round-13 advisory), so those
    // fall back to the join-based changed-row check.
    val numericId = labels.schema("cluster").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("cluster").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum = if (numericId) labelSum(labels) else null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val prop = labels.join(und, labels("id") === und("a"))
        .select(und("b").as("id"), labels("cluster"))
      val next = Ckpt.stage(labels.select(col("id"), col("cluster")).union(prop)
        .groupBy("id").agg(org.apache.spark.sql.functions.min("cluster").as("cluster")))
      if (numericId) {
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
      } else {
        converged = next.as("n")
          .join(labels.as("p"), col("n.id") === col("p.id"))
          .filter(!(col("n.cluster") <=> col("p.cluster")))
          .isEmpty
      }
      labels = next
      iter += 1
    }
    labels
  }

  /** One keeper per near-dup cluster: the row whose id IS the cluster
    * label (the min id), plus every unclustered row.
    */
  def dropByClusters(df: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    df.join(clusters.filter(col("id") === col("cluster")).select(col("id")),
      df(idCol) === col("id"), "left_semi")
}
