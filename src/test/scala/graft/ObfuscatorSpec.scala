package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Obfuscator

/** feistel_obfuscate golden vectors from the reference's own test data
  * (tests/it/scalars/testdata/obfuscator.txt) plus invariants: the
  * permutation preserves sign and log2 class, and is seed-sensitive.
  */
class ObfuscatorSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-obfuscator-test")

  private def one(expr: String): Any = {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(s"SELECT $expr AS v").head().get(0)
  }

  test("reference golden vectors, seed 0 (i64)") {
    assert(Obfuscator.transformLong(0L, 0L) == 0L)
    assert(Obfuscator.transformLong(1L, 0L) == 1L)
    assert(Obfuscator.transformLong(-30L, 0L) == -19L)
    assert(Obfuscator.transformLong(30L, 0L) == 19L)
    assert(Obfuscator.transformLong(1024L, 0L) == 1849L)
    assert(Obfuscator.transformLong(10000L, 0L) == 11497L)
    assert(Obfuscator.transformLong(9223372036854775807L, 0L) == 5870161182470017466L)
    assert(Obfuscator.transformLong(Long.MinValue, 0L) == Long.MinValue)
  }

  test("sign and log2 class are preserved; seeds diverge") {
    val xs = Seq(5L, 100L, 4095L, 4096L, 123456789L, -7L, -1000000L)
    for (x <- xs; seed <- Seq(0L, 1L, 42L, -1L)) {
      val y = Obfuscator.transformLong(x, seed)
      assert((x > 0) == (y > 0), s"sign flip x=$x seed=$seed -> $y")
      assert(java.lang.Long.numberOfLeadingZeros(math.abs(x)) ==
        java.lang.Long.numberOfLeadingZeros(math.abs(y)),
        s"log2 class changed x=$x seed=$seed -> $y")
    }
    assert(Obfuscator.transformLong(10000L, 1L) != Obfuscator.transformLong(10000L, 2L))
    // 2..3 permute pairwise by seed parity
    assert(Obfuscator.transformLong(2L, 1L) == 3L)
    assert(Obfuscator.transformLong(3L, 1L) == 2L)
    assert(Obfuscator.transformLong(2L, 2L) == 2L)
    assert(Obfuscator.transformLong(-2L, 1L) == -3L)
  }

  test("doubles keep sign and exponent") {
    for (x <- Seq(3.14159, 2.5e10, -1.25e-3, 1.0); seed <- Seq(0L, 7L)) {
      val y = Obfuscator.transformDouble(x, seed)
      assert(math.getExponent(y) == math.getExponent(x), s"exponent moved: $x -> $y")
      assert((y < 0) == (x < 0))
    }
  }

  test("SQL surface dispatches on input type") {
    assert(one("feistel_obfuscate(1024L, 0)") == 1849L)
    assert(one("feistel_obfuscate(CAST(1024 AS INT), 0)") == 1849)
    assert(one("feistel_obfuscate(CAST(-30 AS SMALLINT), 0)") == (-19).toShort)
    assert(one("feistel_obfuscate(CAST(NULL AS BIGINT), 0)") == null)
    assert(one("feistel_obfuscate(CAST(-2147483648 AS INT), 5)") == Int.MinValue)
    val d = one("feistel_obfuscate(3.14159D, 7)").asInstanceOf[Double]
    assert(d >= 2.0 && d < 4.0) // same binary exponent as pi
  }
}
