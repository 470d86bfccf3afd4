package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.DocumentSource

class DocumentSourceSpec extends SparkSuite {
  import spark.implicits._

  test("JSONL round-trips the corpus exactly (parquet -> jsonl -> " +
    "frame), with no schema inference pass") {
    val docs = DocumentSource.readParquet(spark,
      "/root/testdata/sf0.01/documents.parquet")
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/out"
    DocumentSource.writeJsonl(docs, dir)
    val back = DocumentSource.readJsonlClean(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.except(docs).count() == 0)
    assert(docs.except(back).count() == 0)
  }

  test("malformed lines land in quarantine instead of failing the job") {
    val dir = Files.createTempDirectory("graft_jsonl_bad")
    Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |this is not json
        |{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}
        |""".stripMargin)
    val all = DocumentSource.readJsonl(spark, dir.toString)
    assert(all.count() == 3)
    assert(DocumentSource.badRecordCount(spark, dir.toString) == 1)
    val clean = DocumentSource.readJsonlClean(spark, dir.toString)
    assert(clean.count() == 2)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
