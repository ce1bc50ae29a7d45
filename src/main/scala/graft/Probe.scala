package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

    // current: built-in exact percentile
    def current() = x.lineitem.groupBy(col("l_linestatus"))
      .agg(
        expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("qs"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
      .select(col("l_linestatus"),
        round(col("qs")(0), 6).as("q25"),
        round(col("qs")(1), 6).as("q50"),
        round(col("qs")(2), 6).as("q75"),
        col("p90_price"),
        round(col("qs")(1), 6).as("med_qty"))
      .orderBy(col("l_linestatus"))

    // sort-based: row_number window + interpolation
    def sorted(valueCol: String, qs: Seq[Double]) = {
      val w = Window.partitionBy(col("l_linestatus")).orderBy(col(valueCol))
      val ranked = x.lineitem.select(col("l_linestatus"), col(valueCol))
        .withColumn("i", row_number().over(w) - 1)
      val counts = x.lineitem.groupBy(col("l_linestatus")).agg(count(col(valueCol)).as("n"))
      val j = ranked.join(broadcast(counts), "l_linestatus")
      val keep = qs.map { q =>
        val p = (col("n") - 1) * q
        (col("i") === floor(p)) || (col("i") === ceil(p))
      }.reduce(_ || _)
      val kept = j.filter(keep)
      val aggs = qs.zipWithIndex.flatMap { case (q, k) =>
        val p = (col("n") - 1) * q
        val frac = p - floor(p)
        Seq(
          sum(when(col("i") === floor(p), col(valueCol) * (lit(1.0) - frac)).otherwise(0.0)).as(s"lo_$k"),
          sum(when((col("i") === ceil(p)) && (ceil(p) =!= floor(p)), col(valueCol) * frac).otherwise(0.0)).as(s"hi_$k"))
      }
      kept.groupBy(col("l_linestatus")).agg(aggs.head, aggs.tail: _*)
        .select(col("l_linestatus") +: qs.indices.map(k => (col(s"lo_$k") + col(s"hi_$k")).as(s"q_$k")): _*)
    }

    time("warmup")(x.lineitem.count())
    time("current-1")(current().write.format("noop").mode("overwrite").save())
    time("current-2")(current().write.format("noop").mode("overwrite").save())
    time("sorted-qty-1")(sorted("l_quantity", Seq(0.25, 0.5, 0.75)).write.format("noop").mode("overwrite").save())
    time("sorted-qty-2")(sorted("l_quantity", Seq(0.25, 0.5, 0.75)).write.format("noop").mode("overwrite").save())
    time("sorted-price")(sorted("l_extendedprice", Seq(0.9)).write.format("noop").mode("overwrite").save())
    sorted("l_quantity", Seq(0.25, 0.5, 0.75)).show()
    sorted("l_extendedprice", Seq(0.9)).show()
    current().show()
    spark.stop()
  }
}
