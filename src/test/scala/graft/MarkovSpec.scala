package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Markov

/** markov_train + markov_generate against the reference's OWN slt
  * goldens (tests/sqllogictests/suites/query/functions/
  * 02_0000_function_markov.test): the 50-row users corpus, seed 0,
  * params {"order":5,"sliding_window_size":8}. Passing these verbatim
  * proves bit-exactness of the crc32 context hashing, the DefaultHasher
  * (SipHash-1-3) determinator stream, the u32-truncating sampler, and
  * the train finalize semantics.
  */
class MarkovSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-markov-test")

  private val users = Seq(
    ("James Smith", "james.smith@gmail.com"),
    ("Mary Johnson", "mary.johnson@yahoo.com"),
    ("John Williams", "john.williams@outlook.com"),
    ("Patricia Brown", "patricia.brown@hotmail.com"),
    ("Robert Jones", "robert.jones@example.com"),
    ("Jennifer Garcia", "jennifer.garcia@gmail.com"),
    ("Michael Miller", "michael.miller@yahoo.com"),
    ("Linda Davis", "linda.davis@outlook.com"),
    ("William Rodriguez", "william.rodriguez@hotmail.com"),
    ("Elizabeth Martinez", "elizabeth.martinez@example.com"),
    ("James Johnson", "james.johnson@gmail.com"),
    ("Mary Williams", "mary.williams@yahoo.com"),
    ("John Brown", "john.brown@outlook.com"),
    ("Patricia Jones", "patricia.jones@hotmail.com"),
    ("Robert Garcia", "robert.garcia@example.com"),
    ("Jennifer Miller", "jennifer.miller@gmail.com"),
    ("Michael Davis", "michael.davis@yahoo.com"),
    ("Linda Rodriguez", "linda.rodriguez@outlook.com"),
    ("William Martinez", "william.martinez@hotmail.com"),
    ("Elizabeth Smith", "elizabeth.smith@example.com"),
    ("James Williams", "james.williams@gmail.com"),
    ("Mary Brown", "mary.brown@yahoo.com"),
    ("John Jones", "john.jones@outlook.com"),
    ("Patricia Garcia", "patricia.garcia@hotmail.com"),
    ("Robert Miller", "robert.miller@example.com"),
    ("Jennifer Davis", "jennifer.davis@gmail.com"),
    ("Michael Rodriguez", "michael.rodriguez@yahoo.com"),
    ("Linda Martinez", "linda.martinez@outlook.com"),
    ("William Smith", "william.smith@hotmail.com"),
    ("Elizabeth Johnson", "elizabeth.johnson@example.com"),
    ("James Brown", "james.brown@gmail.com"),
    ("Mary Jones", "mary.jones@yahoo.com"),
    ("John Garcia", "john.garcia@outlook.com"),
    ("Patricia Miller", "patricia.miller@hotmail.com"),
    ("Robert Davis", "robert.davis@example.com"),
    ("Jennifer Rodriguez", "jennifer.rodriguez@gmail.com"),
    ("Michael Martinez", "michael.martinez@yahoo.com"),
    ("Linda Smith", "linda.smith@outlook.com"),
    ("William Johnson", "william.johnson@hotmail.com"),
    ("Elizabeth Williams", "elizabeth.williams@example.com"),
    ("James Jones", "james.jones@gmail.com"),
    ("Mary Garcia", "mary.garcia@yahoo.com"),
    ("John Miller", "john.miller@outlook.com"),
    ("Patricia Davis", "patricia.davis@hotmail.com"),
    ("Robert Rodriguez", "robert.rodriguez@example.com"),
    ("Jennifer Martinez", "jennifer.martinez@gmail.com"),
    ("Michael Smith", "michael.smith@yahoo.com"),
    ("Linda Johnson", "linda.johnson@outlook.com"),
    ("William Williams", "william.williams@hotmail.com"),
    ("Elizabeth Brown", "elizabeth.brown@example.com"))

  private val expectedNames = Seq(
    "John Garcia", "Mary Johnson", "Robert Jones", "Jennifer Martinez",
    "Michael Martinez", "Patricia Brown", "Linda Martinez", "Mary Garcia",
    "Elizabeth Brown", "William Martinez", "Jennifer Martinez", "John Miller",
    "Robert Davis", "Jennifer Garcia", "Elizabeth Brown", "Patricia Brown",
    "Linda Davis", "Patricia Garcia", "Elizabeth Smith", "Williams")

  private val expectedEmails = Seq(
    "mary.johnson@example.com", "patricia.davis@gmail.com",
    "jennifer.martinez@hotmail", "robert.davis@outlook.com",
    "elizabeth.brown@gmail.com", "patricia.johnson@example.com",
    "michael.martinez@gmail.com", "linda.martinez@hotmail.com",
    "jennifer.garcia@outlook.com", "patricia.garcia@hotmail.com",
    "elizabeth.brown@gmail.com", "robert.jones@hotmail.com",
    "james.john.miller@gmail", "robert.davis@example.com",
    "robert.davis@example.com", "patricia.garcia@gmail.com",
    "michael.martinez@outlook", "james.smith@gmail.com",
    "james.johnson@outlook.com", "patricia.johnson@example.com")

  test("markov_generate reproduces the reference slt goldens (names)") {
    Markov.register(spark)
    import spark.implicits._
    val df = users.toDF("name", "email")
    df.createOrReplaceTempView("markov_users")
    val model = spark.sql("SELECT markov_train(name) AS m FROM markov_users")
    model.createOrReplaceTempView("markov_users_model")
    val out = spark.sql("""
      SELECT markov_generate(m.m, '{"order":5,"sliding_window_size":8}',
                             CAST(0 AS BIGINT), u.name) AS g
      FROM (SELECT name, monotonically_increasing_id() AS rid
            FROM markov_users LIMIT 20) u
      CROSS JOIN markov_users_model m
      ORDER BY u.rid""").collect().map(_.getString(0)).toSeq
    assert(out == expectedNames)
  }

  test("markov_generate reproduces the reference slt goldens (emails)") {
    Markov.register(spark)
    import spark.implicits._
    val df = users.toDF("name", "email")
    df.createOrReplaceTempView("markov_users")
    val model = spark.sql("SELECT markov_train(email) AS m FROM markov_users")
    model.createOrReplaceTempView("markov_email_model")
    val out = spark.sql("""
      SELECT markov_generate(m.m, '{"order":5,"sliding_window_size":8}',
                             CAST(0 AS BIGINT), u.email) AS g
      FROM (SELECT email, monotonically_increasing_id() AS rid
            FROM markov_users LIMIT 20) u
      CROSS JOIN markov_email_model m
      ORDER BY u.rid""").collect().map(_.getString(0)).toSeq
    assert(out == expectedEmails)
  }

  test("model shape and determinism properties") {
    Markov.register(spark)
    import spark.implicits._
    Seq("aba", "abb", "aba").toDF("s").createOrReplaceTempView("markov_tiny")
    val model = spark.sql("SELECT markov_train(s) AS m FROM markov_tiny").collect()(0)
    val rows = model.getSeq[org.apache.spark.sql.Row](0)
    assert(rows.nonEmpty)
    // hashes ascending (u32 order), buckets are maps with positive counts
    val hashes = rows.map(_.getLong(0))
    assert(hashes == hashes.sorted)
    assert(rows.forall(r => r.getMap[Long, Long](3).forall(_._2 > 0) || r.getLong(2) > 0))
    // same seed -> same output; different seed -> (here) different output
    spark.sql("SELECT markov_train(s) AS m FROM markov_tiny")
      .createOrReplaceTempView("markov_tiny_model")
    def gen(seed: Long) = spark.sql(
      s"""SELECT markov_generate(m, '{"order":5,"sliding_window_size":8}',
         |CAST($seed AS BIGINT), 'aba') FROM markov_tiny_model""".stripMargin)
      .collect()(0).getString(0)
    assert(gen(7L) == gen(7L))
    assert(gen(0L).forall(c => c == 'a' || c == 'b')) // alphabet closed
  }

  test("multibyte UTF-8 corpora round-trip through code points") {
    Markov.register(spark)
    import spark.implicits._
    val corpus = Seq("café au lait", "café noir", "北京 上海", "北京 咖啡",
      "résumé café", "上海 café")
    corpus.toDF("s").createOrReplaceTempView("markov_utf8")
    spark.sql("SELECT markov_train(s) AS m FROM markov_utf8")
      .createOrReplaceTempView("markov_utf8_model")
    val out = (0 until 8).map { seed =>
      spark.sql(
        s"""SELECT markov_generate(m, '{"order":5,"sliding_window_size":8}',
           |CAST($seed AS BIGINT), 'café 北京') FROM markov_utf8_model""".stripMargin)
        .collect()(0).getString(0)
    }
    // every output is valid UTF-8 drawn from the training alphabet
    val alphabet = corpus.flatMap(_.toCharArray).toSet
    out.foreach { s =>
      assert(s.getBytes("UTF-8").length > 0)
      assert(new String(s.getBytes("UTF-8"), "UTF-8") == s) // round-trips
      assert(s.forall(alphabet.contains), s"alien chars in '$s'")
    }
  }

  test("OBFUSCATE(t) table flow: markov strings + feistel numbers, deterministic") {
    import spark.implicits._
    val df = users.take(10).zipWithIndex
      .map { case ((n, e), i) => (i.toLong * 512 + 1024, n, e) }
      .toDF("uid", "name", "email")
    val m1 = graft.operators.ObfuscateTable(spark, df, seed = 0L).orderBy("uid").collect()
    val m2 = graft.operators.ObfuscateTable(spark, df, seed = 0L).orderBy("uid").collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq) // deterministic
    // numbers go through feistel: golden feistel_obfuscate(1024, 0) = 1849
    // (uid is the first transformed column -> seed 0); ordering is by
    // the MASKED uid, so check membership
    assert(m1.map(_.getLong(0)).contains(1849L))
    // strings are masked but corpus-shaped (alphabet from training data)
    val names = m1.map(_.getString(1)).toSeq
    assert(names.exists(n => !users.take(10).map(_._1).contains(n)) ||
      names.toSet.size < 10) // at least some masking happened
    assert(names.forall(_.forall(c => c.isLetter || c == ' ' || c == '.' || c == '@')))
    // different seed -> different mask
    val m3 = graft.operators.ObfuscateTable(spark, df, seed = 99L).orderBy("uid").collect()
    assert(m3.map(_.getLong(0)).toSet != m1.map(_.getLong(0)).toSet)
  }
}
