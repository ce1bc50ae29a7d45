package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Jq

/** jq subset vs the reference's OWN slt goldens
  * (02_0065_function_json.test jq section) plus the SQL surface.
  */
class JqSpec extends AnyFunSuite {

  test("reference slt goldens") {
    // SELECT * FROM jq('.[] | .', {"k1":"v1","k2":"v2"})
    assert(Jq(".[] | .", """{"k1":"v1","k2":"v2"}""") == Seq("\"v1\"", "\"v2\""))
    // jq('[.[] | .]', obj) -> one array row
    assert(Jq("[.[] | .]", """{"k1":"v1","k2":"v2"}""") == Seq("""["v1","v2"]"""))
    // array input
    assert(Jq(".[]", "[1,2,3]") == Seq("1", "2", "3"))
    // nested objects
    assert(Jq(".a.b", """{"a":{"b":"nested_value"}}""") == Seq("\"nested_value\""))
    // array of objects
    assert(Jq(".[].name", """[{"name":"Alice"},{"name":"Bob"}]""") ==
      Seq("\"Alice\"", "\"Bob\""))
    // select with comparison; canonical (sorted-key) object output
    assert(Jq(".[] | select(.age > 30)",
      """[{"name":"Alice","age":25},{"name":"Bob","age":35}]""") ==
      Seq("""{"age":35,"name":"Bob"}"""))
    // multiple outputs per element
    assert(Jq(".[] | .name, .age",
      """[{"name":"Alice","age":25},{"name":"Bob","age":35}]""") ==
      Seq("\"Alice\"", "25", "\"Bob\"", "35"))
    // NULL input -> no rows; empty containers
    assert(Jq(".", null).isEmpty)
    assert(Jq(".", "{}") == Seq("{}"))
    assert(Jq(".[]", "[]").isEmpty)
  }

  test("indexing, missing fields, invalid filters") {
    assert(Jq(".[1]", """["a","b","c"]""") == Seq("\"b\""))
    assert(Jq(".[-1]", """["a","b","c"]""") == Seq("\"c\""))
    assert(Jq(".missing", """{"a":1}""") == Seq("null"))
    intercept[IllegalArgumentException](Jq("garbage!", "{}"))
    intercept[IllegalArgumentException](Jq(".[]", "42")) // cannot iterate scalar
  }

  test("SQL surface: jq(filter, json) explodes to rows") {
    val spark = GraftSession(cpus = 2, appName = "graft-jq-test")
    graft.functions.GraftFunctions.register(spark)
    // jq rows are VARIANT (reference jq TVF output type); render to
    // json text outside the generator for the assertion
    val rows = spark.sql(
      """SELECT to_json(v) AS v FROM
        |(SELECT jq('.[] | .name', '[{"name":"Alice"},{"name":"Bob"}]') AS v)""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("\"Alice\"", "\"Bob\""))
  }
}
