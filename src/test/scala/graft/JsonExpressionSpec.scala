package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Native JSON long-field extraction ([[graft.plans.JsonGetLong]]):
  * value parity with from_json on the shared semantic surface, the
  * expression's own documented edges, and the codegen plan shape. */
class JsonExpressionSpec extends SparkSuite {
  import spark.implicits._

  private def native(c: Column): Column =
    graft.plans.JsonFns.jsonGetLong(c, "k")
  private def viaFromJson(c: Column): Column =
    from_json(c, StructType.fromDDL("k LONG")).getField("k")

  test("value parity with from_json('k LONG') across the semantic " +
    "battery: plain/negative/whitespace, nested-only misses, escaped-" +
    "quote traps, float/string/bool/null values, malformed docs") {
    val docs = Seq(
      """{"k": 76}""",
      """{"k":0}""",
      """{ "k" : -12 }""",
      """{"a": 1, "k": 5}""",
      """{"a": {"k": 9}}""",              // nested only → null
      """{"a": [{"k": 9}], "k": 3}""",    // nested skipped, top-level hits
      """{"s": "\"k\": 9", "k": 7}""",    // "k" inside a string value
      """{"s": "k", "k": 8}""",
      """{"deep": [[1, {"x": ["k", 2]}]], "k": 11}""",
      """{"k": 1.5}""",                   // float → null
      """{"k": "12"}""",                  // string → null
      """{"k": true}""",
      """{"k": null}""",
      """{"x": 2}""",                     // absent → null
      """{}""",
      """   {"k": 4}""",
      """{"k": 9223372036854775807}""",   // long max
      """{"k": -9223372036854775808}""",  // long min (negative-acc path)
      """{"k": 9223372036854775808}""",   // overflow → null both sides
      """{"k": 1, "k": 2}""",             // duplicate keys → LAST wins
      """{"k": 9, "a": 0, "k": -4}""",
      """{"k": 6, "k": 2.5}""",  // failed dup keeps earlier good value
      """{"k": 1.5, "k": 3}""",  // good dup overwrites failed earlier
      """not json""",
      """[1, 2]""",                       // non-object root
      """{"k": }""",                      // malformed value
      """{"k""",                          // truncated mid-key
      """{"k": 5""",                      // truncated after value: null
      null
    ).toDF("j")
    val rows = docs.select(native(col("j")).as("n"),
      viaFromJson(col("j")).as("f")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null parity broke at doc $i: native=${r.get(0)} fromJson=${r.get(1)}")
      if (!r.isNullAt(0))
        assert(r.getLong(0) == r.getLong(1),
          s"value parity broke at doc $i: ${r.getLong(0)} vs ${r.getLong(1)}")
    }
  }

  test("documented own-contract edges: trailing bytes after the " +
    "complete object are not rejected; escape-encoded keys do not " +
    "match") {
    val r = Seq(
      """{"k": 3} trailing""",
      // JSON-escaped key k ("k"): built by concatenation because
      // scalac itself decodes \uXXXX even inside triple quotes
      "{\"" + "\\" + "u006b\": 5}"
    ).toDF("j").select(native(col("j"))).collect()
    assert(!r(0).isNullAt(0) && r(0).getLong(0) == 3L)
    assert(r(1).isNullAt(0))
  }

  test("q26b plan: json_get_long lives INSIDE the whole-stage-codegen " +
    "span (starred projection) — the point of the native expression") {
    // AQE defers stage compilation, hiding the codegen stars from the
    // pre-execution plan string — switch it off for the shape assert
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = SparkEntry.queries("q26b_json_native")(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan
        .toString
      assert(plan.contains("json_get_long"))
      // the hosting Project is star-marked (codegen stage), tree-drawing
      // prefix ("+- ") notwithstanding
      assert(plan.linesIterator.exists(l =>
        l.contains("json_get_long") && l.contains("*(")),
        s"json_get_long projection not codegen'd:\n$plan")
      // and the expression type itself never falls back to interpreted
      assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen
        .CodegenFallback].isAssignableFrom(classOf[graft.plans.JsonGetLong]))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("null json column and null-key misses stay null-safe under " +
    "codegen and interpreted eval alike") {
    val df = Seq(Some("""{"k": 2}"""), None).toDF("j")
    val out = df.select(native(col("j"))).collect()
    assert(out(0).getLong(0) == 2L && out(1).isNullAt(0))
    // interpreted path (no codegen): same results
    val interp = graft.plans.JsonGetLong.extract(
      org.apache.spark.unsafe.types.UTF8String.fromString("""{"k": 2}"""),
      org.apache.spark.unsafe.types.UTF8String.fromString("k"))
    assert(interp == 2L)
  }
}
