package graft

import graft.sources.RandomTable
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** RANDOM table engine analog: deterministic in seed, distributed. */
class RandomTableSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-random-test")

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("n", IntegerType, nullable = true),
    StructField("x", DoubleType, nullable = false),
    StructField("s", StringType, nullable = false),
    StructField("b", BooleanType, nullable = false),
    StructField("d", DateType, nullable = false)))

  test("same seed reproduces identical data; different seed differs") {
    val a = RandomTable.generate(spark, schema, 1000, seed = 7).collect()
    val b = RandomTable.generate(spark, schema, 1000, seed = 7).collect()
    val c = RandomTable.generate(spark, schema, 1000, seed = 8).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.length == 1000)
  }

  test("schema respected; nullable columns get some nulls, others none") {
    val df = RandomTable.generate(spark, schema, 5000)
    assert(df.schema.fields.map(_.name).toSeq == schema.fields.map(_.name).toSeq)
    assert(df.filter(df("n").isNull).count() > 0)   // nullable: ~1/97 nulls
    assert(df.filter(df("k").isNull).count() == 0)  // non-nullable: none
    // values spread out (not constant)
    assert(df.select("s").distinct().count() > 4000)
  }
}
