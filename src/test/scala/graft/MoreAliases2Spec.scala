package graft

import org.scalatest.funsuite.AnyFunSuite

/** Names from functions.MoreAliases2 with no DuckDB-expressible oracle
  * (reg_alias_names4 covers the rest): map edits, quote, pretty-print,
  * keypath delete, array skew/kurt, xxhash32 determinism, to_uuid
  * failure mode, SRF rewrites.
  */
class MoreAliases2Spec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-alias2-test")

  private def one(expr: String): Any = {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(s"SELECT $expr AS v").head().get(0)
  }

  test("map_pick / map_delete filter by key") {
    assert(one("map_pick(map('a', 1, 'b', 2, 'c', 3), 'a', 'c')")
      .asInstanceOf[Map[String, Int]] == Map("a" -> 1, "c" -> 3))
    assert(one("map_delete(map('a', 1, 'b', 2), 'a')")
      .asInstanceOf[Map[String, Int]] == Map("b" -> 2))
  }

  test("quote escapes quotes and backslashes") {
    assert(one("""quote('it''s a \\ test')""") == """it\'s a \\ test""")
  }

  test("json_pretty / delete_by_keypath / json_object_insert update flag") {
    assert(one("json_pretty('{\"a\":1}')").toString.contains("\n"))
    assert(one("delete_by_keypath('{\"a\":{\"b\":1,\"c\":2}}', '{a, b}')")
      == """{"a":{"c":2}}""")
    // update=false leaves an existing key; update=true replaces it
    // reference semantics: existing key without the update flag errors
    intercept[Exception](one("json_object_insert('{\"a\":1}', 'a', '9')"))
    assert(one("json_object_insert('{\"a\":1}', 'a', '9', true)") == """{"a":9}""")
  }

  test("array skewness/kurtosis match hand-computed values") {
    // xs = [1,2,4,8]: sample-corrected skewness/excess kurtosis
    val xs = Seq(1.0, 2.0, 4.0, 8.0)
    val n = xs.length
    val m = xs.sum / n
    val m2 = xs.map(x => math.pow(x - m, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
    val skew = math.sqrt(n.toDouble * (n - 1)) / (n - 2) * m3 / math.pow(m2, 1.5)
    val kurt = ((n + 1.0) * n / ((n - 1.0) * (n - 2) * (n - 3))) *
      (n * m4 / (m2 * m2)) - 3.0 * (n - 1.0) * (n - 1) / ((n - 2.0) * (n - 3))
    assert(math.abs(one("array_skewness(array(1.0, 2.0, 4.0, 8.0))")
      .asInstanceOf[Double] - skew) < 1e-12)
    assert(math.abs(one("array_kurtosis(array(1.0, 2.0, 4.0, 8.0))")
      .asInstanceOf[Double] - kurt) < 1e-12)
  }

  test("xxhash32 is deterministic and 32-bit") {
    val a = one("xxhash32('hello')").asInstanceOf[Long]
    val b = one("xxhash32('hello')").asInstanceOf[Long]
    assert(a == b && a >= 0 && a <= 0xffffffffL)
    assert(one("xxhash32('hellp')").asInstanceOf[Long] != a)
  }

  test("to_uuid returns NULL on malformed input") {
    assert(one("to_uuid('not-a-uuid')") == null)
    assert(one("to_uuid('550E8400-E29B-41D4-A716-446655440000')")
      == "550e8400-e29b-41d4-a716-446655440000")
  }

  test("siphash64 is zero-keyed SipHash-1-3 over DFHash bytes") {
    // reference hash.rs siphash64 (SipHasher13, keys 0,0); the u64
    // surfaces as DECIMAL(20,0). bucket_hash_v1 test vector: the
    // empty payload hashes 15130871412783076140 (hash.rs tests).
    assert(one("CAST(siphash64('abc') AS STRING)") == "13851880170939887858")
    assert(one("siphash64('abc')") == one("siphash('abc')"))
    assert(one("siphash64('abc')") != one("siphash64('abd')"))
    // integer literals hash at the reference's narrowest literal width
    assert(one("CAST(siphash64(1) AS STRING)") == "4952851536318644461")
    // fractional literals hash as scale-prefixed Decimal128
    assert(one("CAST(siphash64(1.2) AS STRING)") == "17113433499147459995")
  }

  test("xxhash64 is seed-0 XXH64 over DFHash bytes") {
    // reference hash.rs xxhash64 (twox-hash XxHash64::default), NOT
    // Spark's seed-42 builtin (internally kept as xxh64_long)
    assert(one("CAST(xxhash64('1234567890') AS STRING)") == "12237639266330420150")
    assert(one("CAST(xxhash64('1') AS STRING)") == "13237225503670494420")
  }

  test("city64withseed matches the reference's golden vectors") {
    // reference hash.txt:171-196 (CityHash64 v1.0.2 with seed)
    assert(one("CAST(city64withseed('Abc', 0) AS STRING)")
      == "8309941215813243361")
    assert(one("CAST(city64withseed('Abc', 256) AS STRING)")
      == "10246934130793054423")
    // fractional seeds truncate (reference golden: 256.3 == 256)
    assert(one("city64withseed('Abc', 256.3)") == one("city64withseed('Abc', 256)"))
    // CityHash64 of the empty string is the k2 constant
    import graft.functions.MoreAliases2.cityHash64
    assert(cityHash64(Array.emptyByteArray) == 0x9ae16a3b2f90404fL)
    // every length bracket is deterministic and spread (regression lock
    // for the 4-16 / 17-32 / 33-64 / 65+ code paths)
    val hs = Seq(1, 7, 12, 24, 48, 100, 300).map { n =>
      cityHash64(Array.tabulate[Byte](n)(i => (i * 131 + 7).toByte))
    }
    assert(hs.distinct.size == hs.size)
    assert(hs == hs) // stable across calls (pure function of bytes)
  }

  test("blake3 matches reference goldens and official test vectors") {
    // reference hash.txt:81-109
    assert(one("blake3('Abc')")
      == "1f7aa3978949c4275797ac6056c0108e852a5d07c49838a00799194957b82111")
    assert(one("blake3('Dobrý den')")
      == "0b449419834e5d285d3b95f892b5494db8d7798c11602ccde1f51c33a159677f")
    assert(one("blake3(NULL)") == null)
    // official test vectors (empty; 1024 B and 1025 B of the repeating
    // 0..250 byte pattern — multi-block and parent/tree code paths)
    import graft.functions.Blake3
    assert(Blake3.hex(Array.emptyByteArray)
      == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
    def pat(n: Int): Array[Byte] = Array.tabulate[Byte](n)(i => (i % 251).toByte)
    assert(Blake3.hex(pat(1024))
      == "42214739f095a406f3fc83deb889744ac00df831c10daa55189b5d121c855af7")
    assert(Blake3.hex(pat(1025))
      == "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444")
  }

  test("time_slice buckets epoch-aligned, START and END") {
    assert(one("CAST(time_slice(TIMESTAMP '2024-03-07 10:47:12', 15, 'minute') AS STRING)")
      == "2024-03-07 10:45:00")
    assert(one("CAST(time_slice(TIMESTAMP '2024-03-07 10:47:12', 15, 'minute', 'END') AS STRING)")
      == "2024-03-07 11:00:00")
    assert(one("CAST(time_slice(TIMESTAMP '2024-03-07 10:47:12', 2, 'hour') AS STRING)")
      == "2024-03-07 10:00:00")
    assert(one("CAST(time_slice(TIMESTAMP '2024-05-07 10:47:12', 3, 'month') AS STRING)")
      == "2024-04-01 00:00:00")
    assert(one("CAST(time_slice(TIMESTAMP '2024-05-07 10:47:12', 1, 'year', 'END') AS STRING)")
      == "2025-01-01 00:00:00")
  }

  test("json_each yields (key, value) tuple rows") {
    graft.functions.GraftFunctions.register(spark)
    // scalar position: one TUPLE column per field (reference renders
    // ("a",1) rows); the two-column TVF form is FROM json_each(...)
    val rows = spark.sql(
      """SELECT kv.key AS key, CAST(kv.value AS STRING) AS v
        |FROM (SELECT json_each(parse_json('{"a":1,"b":[2,3]}')) AS kv)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows == Map("a" -> "1", "b" -> "[2,3]"))
  }

  test("json_path_query matches the reference 02_0051 slt rows") {
    graft.functions.GraftFunctions.register(spark)
    def rows(expr: String): Seq[String] =
      spark.sql(s"SELECT to_json(v) AS v FROM (SELECT $expr AS v)")
        .collect().map(_.getString(0)).toSeq
    val arr = """parse_json('[1,2,3,["a","b","c"]]')"""
    val obj = """parse_json('{"a": 1,"b":{"c": 2}}')"""
    // index lists with `last` arithmetic: rows 3, 2, 3
    assert(rows(s"json_path_query($arr, '$$[2, 1 to last -1]')") == Seq("3", "2", "3"))
    // filters on the element itself
    assert(rows(s"json_path_query($arr, '$$[*]?(@ > 1 && @ <= 3)')") == Seq("2", "3"))
    // nested subscript + starts with
    assert(rows(s"""json_path_query($arr, '$$[3][*]?(@ starts with "a")')""") == Seq("\"a\""))
    // subscript over mixed elements: only the nested array has [1]
    assert(rows(s"json_path_query($arr, '$$[*][1]')") == Seq("\"b\""))
    // member paths and object filters
    assert(rows(s"json_path_query($obj, '$$.b.c')") == Seq("2"))
    assert(rows(s"json_path_query($obj, '$$.b?(@.c == 2)')") == Seq("{\"c\":2}"))
    assert(rows(s"json_path_query($obj, '$$.b?(@.c > 2)')") == Seq.empty)
    // NULL input yields no rows; malformed path raises
    assert(rows("json_path_query(CAST(NULL AS STRING), '$.a')") == Seq.empty)
    intercept[Exception] { rows(s"json_path_query($obj, '--')") }
  }

  test("json_path_query_array / _first / exists / match") {
    graft.functions.GraftFunctions.register(spark)
    def s1(expr: String): Any = one(expr)
    val arr = """parse_json('[1,2,3,["a","b","c"]]')"""
    val obj = """parse_json('{"a": 1,"b":{"c": 2}}')"""
    assert(s1(s"to_json(json_path_query_array($arr, '$$[2, 1 to last -1]'))") == "[3,2,3]")
    assert(s1(s"to_json(json_path_query_array($obj, '$$.b?(@.c > 2)'))") == "[]")
    assert(s1(s"to_json(json_path_query_first($arr, '$$[2, 1 to last -1]'))") == "3")
    assert(s1(s"json_path_query_first($obj, '$$.zzz')") == null)
    assert(s1(s"json_path_exists($obj, '$$.b?(@.c == 2)')") == true)
    assert(s1(s"json_path_exists($obj, '$$.b?(@.c > 2)')") == false)
    // variant.txt:4864-4903 predicate grammar
    assert(s1("""json_path_match(parse_json('{"a":1,"b":2}'), '$.a == 1')""") == true)
    assert(s1("""json_path_match(parse_json('{"a":1,"b":2}'), '$.a > 1')""") == false)
    assert(s1("""json_path_match(parse_json('{"a":1,"b":2}'), '$.c > 0')""") == false)
    assert(s1("""json_path_match(parse_json('{"a":1,"b":[1,2,3]}'), '$.b[0] == 1')""") == true)
    assert(s1("json_path_match(CAST(NULL AS STRING), '$.a == 1')") == null)
  }

  test("set-returning rewrites explode") {
    graft.functions.GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT regexp_split_to_table('a,b,c', ',') AS v").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("a", "b", "c"))
    val els = spark.sql(
      "SELECT CAST(v AS STRING) AS v FROM (SELECT json_array_elements(parse_json('[1,2,3]')) AS v)")
      .collect().map(_.getString(0))
    assert(els.toSeq == Seq("1", "2", "3"))
  }
}
