package graft

import org.apache.spark.sql.functions._
import graft.functions.TextClean

class TextCleanSpec extends SparkSuite {
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("text").select(TextClean.scrub(col("text"))).head.getString(0)

  test("emails, urls, and phone numbers are replaced with placeholders") {
    assert(scrubOne("mail me at jane.doe+x@example.co.uk today") ==
      "mail me at <EMAIL> today")
    assert(scrubOne("see https://ex.com/a?b=1 and www.foo.org/x") ==
      "see <URL> and <URL>")
    assert(scrubOne("call +1 (555) 123-4567 now") == "call <PHONE> now")
    assert(scrubOne("call 555 123 4567 now") == "call <PHONE> now")
  }

  test("clean text passes through unchanged; years and small numbers " +
    "are NOT phone-scrubbed") {
    assert(scrubOne("born in 1984, moved in 2001") ==
      "born in 1984, moved in 2001")
    assert(scrubOne("a plain sentence") == "a plain sentence")
  }

  test("whitespace normalizes after scrubbing and counts see the " +
    "original text") {
    assert(scrubOne("  a@b.co   x  ") == "<EMAIL> x")
    val counts = Seq("a@b.co and c@d.org visit www.e.com")
      .toDF("text")
      .select(TextClean.emailCount(col("text")).as("e"),
        TextClean.urlCount(col("text")).as("u"))
      .as[(Long, Long)].head()
    assert(counts == ((2L, 1L)))
  }

  test("scrub over the corpus is a no-op on the PII-free fixture " +
    "except whitespace canonicalization") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val changed = docs.filter(
      TextClean.scrub(col("text")) =!= trim(regexp_replace(col("text"),
        "\\s+", " "))).count()
    assert(changed == 0)
  }

  test("canonicalize strips controls and zero-width marks, maps unicode " +
    "spaces, and counts the junk before cleaning") {
    def canonOne(s: String): (String, Long) =
      Seq(s).toDF("text")
        .select(TextClean.canonicalize(col("text")),
          TextClean.nonCanonicalCount(col("text")))
        .as[(String, Long)].head()
    // NBSP + zero-width space + BOM + C0 control + ideographic space
    val dirty = "a b\u00A0\u200Bc\uFEFF\u0001 de\u3000f"
    assert(canonOne(dirty) == (("a b c de f", 5L)))
    assert(canonOne("plain ascii text") == (("plain ascii text", 0L)))
    assert(canonOne("tabs\tand\nnewlines survive") ==
      (("tabs and newlines survive", 0L))) // collapsed, not stripped
    // identical-looking docs hash identically after canonicalization
    val a = canonOne("same​ doc")._1
    val b = canonOne("same doc")._1
    assert(a == b)
  }

  test("stripFrequentLines removes lines shared by >= minDocs docs, " +
    "preserves order, keeps rare lines, empties all-boilerplate docs") {
    import spark.implicits._
    val nav = "Home | About | Contact"
    val cookie = "This site uses cookies"
    val docs = Seq(
      (1L, s"$nav\nreal article text one\n$cookie"),
      (2L, s"$nav\ndifferent unique content\n$cookie"),
      (3L, s"$nav\nthird body paragraph here\n$cookie"),
      (4L, s"$nav\n$cookie"), // nothing but boilerplate
      (5L, "a fully unique document\nwith two lines")
    ).toDF("doc_id", "text")
    val out = graft.operators.Boilerplate
      .stripFrequentLines(docs, minDocs = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "real article text one"),
      (2L, "different unique content"),
      (3L, "third body paragraph here"),
      (4L, ""),
      (5L, "a fully unique document\nwith two lines")))
  }
}
