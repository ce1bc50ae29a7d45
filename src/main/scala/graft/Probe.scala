package graft

import org.apache.spark.sql.functions._

/** Scratch benchmarking probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession(32, "graft-probe")
    val x = Tables(spark, sfDir)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val nHash = 32
    val bands = 8
    val rows = nHash / bands
    def toks(c: org.apache.spark.sql.Column) = split(lower(c), " ")
    def nearDups = x.documents.select(col("doc_id"), col("text"), col("source"))
      .union(x.documents.filter(col("doc_id") < 50)
        .select(col("doc_id") + 100000,
          expr("substring(text, instr(text, ' ') + 1)"), col("source")))

    def shingled = nearDups
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"),
        array_distinct(expr(
          """transform(
               sequence(1, greatest(size(tk) - 2, 1)),
               i -> concat_ws(' ', slice(tk, i, 3)))""")).as("sh"))
    def exploded = shingled
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"),
        pmod(xxhash64(col("s")), lit(2147483647L)).as("h1"),
        (pmod(xxhash64(concat(lit("graft-salt:"), col("s"))), lit(2147483629L)) + 1L).as("h2"))
    val minAggs = (0 until nHash).map(i =>
      min(pmod(col("h1") + lit(i.toLong) * col("h2"), lit(2147483647L))).as(s"mh_$i"))
    def mh = exploded.groupBy(col("doc_id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until nHash).map(i => col(s"mh_$i")): _*).as("mh"))
    def banded = mh.select(col("doc_id"), col("mh"),
        posexplode(expr(s"""transform(sequence(0, ${bands - 1}),
          b -> xxh64_long(concat_ws(',', transform(slice(mh, b * $rows + 1, $rows), v -> CAST(v AS STRING)))))""")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    def full = {
      val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("mh").as("mh_a"))
      val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("mh").as("mh_b"))
      l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(expr("filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v)")).cast("double") / nHash).as("est_sim"))
        .distinct()
        .filter(col("est_sim") >= 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }

    def fullReuse = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(filter(zip_with(col("a.mh"), col("b.mh"), (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("double") / nHash).as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= 0.5)
      .orderBy(col("id_a"), col("id_b"))

    time("warmup")(x.documents.count())
    time("full-1")(full.write.format("noop").mode("overwrite").save())
    time("full-2")(full.write.format("noop").mode("overwrite").save())
    time("reuse-1")(fullReuse.write.format("noop").mode("overwrite").save())
    time("reuse-2")(fullReuse.write.format("noop").mode("overwrite").save())
    println("REUSE-PLAN-HAS-REUSEDEXCHANGE=" +
      fullReuse.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    println("rows-old=" + full.count() + " rows-new=" + fullReuse.count())
    spark.stop()
  }
}
