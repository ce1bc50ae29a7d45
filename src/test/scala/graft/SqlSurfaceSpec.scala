package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The SQL-text statement surface (GraftSql): every user-facing verb of
  * the reference's statement grammar driven as SQL text end-to-end —
  * CREATE / INSERT / UPDATE / DELETE / MERGE INTO / COPY INTO / STREAM
  * DDL / time travel AT / CHANGES / ALTER ... RECLUSTER / OPTIMIZE /
  * multi-table INSERT (reference:
  * src/query/ast/src/ast/statements/statement.rs:49).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-sqlsurface-test")

  private def tmp(): String = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "sqls").toString
  }

  private def sqlHead(): GraftSql = GraftSql(spark, tmp())

  test("CREATE TABLE (ddl + AS SELECT), INSERT INTO/OVERWRITE, VALUES") {
    val g = sqlHead()
    g.execute("CREATE TABLE t1 (k INT, v STRING)")
    g.execute("INSERT INTO t1 VALUES (1, 'a'), (2, 'b')")
    g.execute("INSERT INTO t1 SELECT 3, 'c'")
    assert(g.execute("SELECT count(*) AS n FROM t1").head.getLong(0) == 3)

    g.execute("CREATE TABLE t2 AS SELECT k, upper(v) AS v FROM t1")
    assert(g.execute("SELECT count(*) AS n FROM t2 WHERE v = 'A'").head.getLong(0) == 1)

    g.execute("INSERT OVERWRITE t2 SELECT 9 AS k, 'z' AS v")
    assert(g.execute("SELECT count(*) AS n FROM t2").head.getLong(0) == 1)

    // column-list insert fills the missing column with NULL
    g.execute("INSERT INTO t1 (k) VALUES (42)")
    assert(g.execute("SELECT v FROM t1 WHERE k = 42").head.isNullAt(0))
  }

  test("UPDATE / DELETE / TRUNCATE") {
    val g = sqlHead()
    g.execute("CREATE TABLE u AS SELECT id AS k, CAST(id * 10 AS INT) AS v FROM range(10) r(id)")
    g.execute("UPDATE u SET v = v + 1 WHERE k >= 5")
    assert(g.execute("SELECT sum(v) AS s FROM u").head.getLong(0) ==
      (0 until 10).map(i => if (i >= 5) i * 10 + 1 else i * 10).sum)
    g.execute("DELETE FROM u WHERE k < 3")
    assert(g.execute("SELECT count(*) AS n FROM u").head.getLong(0) == 7)
    g.execute("TRUNCATE TABLE u")
    assert(g.execute("SELECT count(*) AS n FROM u").head.getLong(0) == 0)
    // schema survives truncation
    g.execute("INSERT INTO u VALUES (CAST(1 AS BIGINT), CAST(2 AS INT))")
    assert(g.execute("SELECT count(*) AS n FROM u").head.getLong(0) == 1)
  }

  test("MERGE INTO: matched update / matched-and delete / not matched insert") {
    val g = sqlHead()
    g.execute("CREATE TABLE tgt AS SELECT id AS k, CAST(id AS DOUBLE) AS bal FROM range(5) r(id)")
    g.execute("CREATE TABLE src AS SELECT id + 3 AS k, CAST(100 AS DOUBLE) AS bal FROM range(4) r(id)")
    // k: tgt 0..4, src 3..6. matched: 3,4 (3 deleted by AND clause), insert 5,6
    g.execute("""MERGE INTO tgt USING (SELECT * FROM src) AS s ON tgt.k = s.k
      WHEN MATCHED AND tgt.k = 3 THEN DELETE
      WHEN MATCHED THEN UPDATE SET bal = s.bal + tgt.bal
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = g.execute("SELECT k, bal FROM tgt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((0L, 0.0), (1L, 1.0), (2L, 2.0), (4L, 104.0),
      (5L, 100.0), (6L, 100.0)))
  }

  test("MERGE INTO: UPDATE * and INSERT (cols) VALUES (exprs)") {
    val g = sqlHead()
    g.execute("CREATE TABLE t AS SELECT id AS k, 'old' AS tag FROM range(3) r(id)")
    g.execute("""MERGE INTO t USING (SELECT id + 2 AS k, 'new' AS tag FROM range(2) r(id)) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE *
      WHEN NOT MATCHED THEN INSERT (k, tag) VALUES (s.k, concat(s.tag, '!'))""")
    val rows = g.execute("SELECT k, tag FROM t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((0L, "old"), (1L, "old"), (2L, "new"), (3L, "new!")))
  }

  test("MERGE INTO: a target row matching multiple source rows raises") {
    val g = sqlHead()
    g.execute("CREATE TABLE mt AS SELECT id AS k, CAST(0 AS DOUBLE) AS bal FROM range(3) r(id)")
    // source has k=1 twice — the reference errors on the ambiguous match
    val ex = intercept[Exception] {
      g.execute("""MERGE INTO mt USING
        (SELECT CAST(1 AS BIGINT) AS k, CAST(10 AS DOUBLE) AS bal
         UNION ALL SELECT CAST(1 AS BIGINT), CAST(20 AS DOUBLE)) AS s
        ON mt.k = s.k
        WHEN MATCHED THEN UPDATE SET bal = mt.bal + s.bal""")
    }
    def chain(e: Throwable): String =
      if (e == null) "" else e.getMessage + "|" + chain(e.getCause)
    assert(chain(ex).toLowerCase.contains("multiple source rows"))
    // target unchanged — the failed merge committed nothing
    assert(g.execute("SELECT sum(bal) AS s FROM mt").head.getDouble(0) == 0.0)
  }

  test("CREATE FUNCTION ... LANGUAGE python registers a SQL-callable scalar") {
    assume(graft.functions.PythonScriptUdf.available, "python3 not on this host")
    val g = sqlHead()
    g.execute("""CREATE OR REPLACE FUNCTION py_gcd (BIGINT, BIGINT) RETURNS BIGINT
      LANGUAGE python HANDLER = 'gcd' AS $$
import math
def gcd(a, b):
    if a is None or b is None:
        return None
    return math.gcd(a, b)
$$""")
    val rows = g.execute(
      "SELECT id, py_gcd(id * 6, 4) AS g FROM range(4) r(id) ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((0L, 4L), (1L, 2L), (2L, 4L), (3L, 2L)))
    // python exceptions surface with the function name
    g.execute("""CREATE FUNCTION py_boom (BIGINT) RETURNS BIGINT
      LANGUAGE python HANDLER = 'f' AS $$
def f(x):
    raise ValueError("nope")
$$""")
    val ex = intercept[Exception](g.execute("SELECT py_boom(1) AS x").collect())
    def chain(e: Throwable): String =
      if (e == null) "" else e.getMessage + "|" + chain(e.getCause)
    assert(chain(ex).contains("py_boom"))
    g.execute("DROP FUNCTION py_boom")
    g.execute("DROP FUNCTION IF EXISTS py_gcd")
  }

  test("COPY INTO from a stage is idempotent per file") {
    val g = sqlHead()
    val stage = tmp()
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(stage + "/batch1")
    // flatten: move parquet part into the stage root
    val part = Files.list(Paths.get(stage, "batch1")).iterator()
    import scala.jdk.CollectionConverters._
    part.asScala.filter(_.toString.endsWith(".parquet")).zipWithIndex.foreach {
      case (p, i) => Files.move(p, Paths.get(stage, s"f$i.parquet"))
    }
    g.execute("CREATE TABLE c (k INT, v STRING)")
    g.execute(s"CREATE STAGE st URL = '$stage'")
    val r1 = g.execute("COPY INTO c FROM @st FILE_FORMAT = (TYPE = PARQUET)").head
    assert(r1.getString(2).toInt == 1 && r1.getString(3).toInt == 0)
    val r2 = g.execute("COPY INTO c FROM @st").head
    assert(r2.getString(2).toInt == 0 && r2.getString(3).toInt == 1) // dedup by ledger
    assert(g.execute("SELECT count(*) AS n FROM c").head.getLong(0) == 2)
  }

  test("time travel AT (SNAPSHOT | OFFSET) and CHANGES") {
    val g = sqlHead()
    g.execute("CREATE TABLE tt AS SELECT id AS k FROM range(10) r(id)")
    g.execute("DELETE FROM tt WHERE k < 4")
    g.execute("INSERT INTO tt SELECT id + 100 FROM range(3) r(id)")
    assert(g.execute("SELECT count(*) AS n FROM tt AT (SNAPSHOT => 0)").head.getLong(0) == 10)
    assert(g.execute("SELECT count(*) AS n FROM tt AT (SNAPSHOT => 1)").head.getLong(0) == 6)
    assert(g.execute("SELECT count(*) AS n FROM tt").head.getLong(0) == 9)
    // OFFSET => 0 seconds back resolves to the current version
    assert(g.execute("SELECT count(*) AS n FROM tt AT (OFFSET => 0)").head.getLong(0) == 9)
    val feed = g.execute(
      """SELECT `change$action` AS a, count(*) AS n
         FROM tt CHANGES (INFORMATION => DEFAULT) AT (SNAPSHOT => 0) END (SNAPSHOT => 1)
         GROUP BY 1 ORDER BY 1""").collect()
    assert(feed.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("DELETE", 4L)))
    val appended = g.execute(
      """SELECT count(*) AS n FROM tt CHANGES (INFORMATION => APPEND_ONLY)
         AT (SNAPSHOT => 0)""").head.getLong(0)
    assert(appended == 3)
  }

  test("CREATE STREAM / consume via INSERT / SHOW STREAMS") {
    val g = sqlHead()
    g.execute("CREATE TABLE base AS SELECT id AS k FROM range(5) r(id)")
    g.execute("CREATE TABLE sink (k BIGINT)")
    g.execute("CREATE STREAM s1 ON TABLE base")
    assert(g.execute("SELECT count(*) AS n FROM s1").head.getLong(0) == 0)
    g.execute("INSERT INTO base SELECT id + 10 FROM range(4) r(id)")
    assert(g.execute("SELECT count(*) AS n FROM s1").head.getLong(0) == 4)
    // consuming DML advances the cursor
    g.execute("INSERT INTO sink SELECT k FROM s1")
    assert(g.execute("SELECT count(*) AS n FROM sink").head.getLong(0) == 4)
    assert(g.execute("SELECT count(*) AS n FROM s1").head.getLong(0) == 0)
    assert(g.execute("SHOW STREAMS").collect().map(_.getString(0)).toSeq == Seq("s1"))
    g.execute("DROP STREAM s1")
    assert(g.execute("SHOW STREAMS").count() == 0)
  }

  test("multi-table INSERT FIRST / ALL") {
    val g = sqlHead()
    g.execute("CREATE TABLE lo (k BIGINT)")
    g.execute("CREATE TABLE hi (k BIGINT)")
    g.execute("CREATE TABLE everything (k BIGINT)")
    g.execute("""INSERT FIRST
      WHEN k < 5 THEN INTO lo
      ELSE INTO hi
      SELECT id AS k FROM range(10) r(id)""")
    assert(g.execute("SELECT count(*) AS n FROM lo").head.getLong(0) == 5)
    assert(g.execute("SELECT count(*) AS n FROM hi").head.getLong(0) == 5)
    g.execute("INSERT ALL INTO everything INTO everything SELECT id AS k FROM range(3) r(id)")
    assert(g.execute("SELECT count(*) AS n FROM everything").head.getLong(0) == 6)
  }

  test("ALTER TABLE CLUSTER BY + RECLUSTER, OPTIMIZE COMPACT, ANALYZE, VACUUM") {
    val g = sqlHead()
    g.execute("CREATE TABLE m AS SELECT id AS a, id % 7 AS b FROM range(100) r(id)")
    g.execute("INSERT INTO m SELECT id + 100, id % 5 FROM range(100) r(id)")
    g.execute("ALTER TABLE m CLUSTER BY (a, b)")
    g.execute("ALTER TABLE m RECLUSTER FINAL")
    assert(g.execute("SELECT count(*) AS n FROM m").head.getLong(0) == 200)
    g.execute("OPTIMIZE TABLE m COMPACT")
    assert(g.execute("SELECT count(*) AS n FROM m").head.getLong(0) == 200)
    val st = g.execute("ANALYZE TABLE m").head
    assert(st.getString(2).toLong == 200)
    g.execute("VACUUM TABLE m")
    assert(g.execute("SELECT count(*) AS n FROM m").head.getLong(0) == 200)
  }

  test("DROP TABLE removes registry entry and data") {
    val g = sqlHead()
    g.execute("CREATE TABLE d AS SELECT 1 AS x")
    val path = g.table("d").path
    g.execute("DROP TABLE d")
    assert(!Files.exists(Paths.get(path)))
    intercept[IllegalArgumentException](g.table("d"))
  }
}
