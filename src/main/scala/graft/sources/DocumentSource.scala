package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Document-corpus IO: parquet for the warehouse, JSONL for exchange —
  * the interchange format training corpora actually ship in (one JSON
  * object per line; Spark's native `json` source IS line-delimited, so
  * reads split by line across executors and writes stay streamable).
  *
  * The schema is always DECLARED, never inferred: schema inference
  * reads the data twice and silently widens types on dirty corpora —
  * at 100 TB that is both a second full scan and a correctness trap.
  * `columnNameOfCorruptRecord` + PERMISSIVE keeps malformed lines as
  * quarantine rows instead of failing the job (badRecords gives the
  * count; filter `_corrupt IS NULL` for the clean frame).
  */
object DocumentSource {

  val schema: StructType = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
      "n_chars BIGINT")

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** JSONL read with quarantine column `_corrupt` (null = clean row,
    * else the raw line). Parsed as text + `from_json` rather than the
    * raw JSON source: same line-splittable scan, but the corrupt
    * column is an ordinary computed column — free of the SPARK-21610
    * restriction that forbids corrupt-only queries on raw JSON files. */
  def readJsonl(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val parseSchema = StructType.fromDDL(schema.toDDL + ", _corrupt STRING")
    spark.read.text(path)
      .select(from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt").asJava).as("_r"))
      .select(parseSchema.fieldNames.map(f => col(s"_r.$f")): _*)
  }

  /** Clean frame only (schema-conformant lines). */
  def readJsonlClean(spark: SparkSession, path: String): DataFrame =
    readJsonl(spark, path)
      .filter("_corrupt IS NULL").drop("_corrupt")

  def badRecordCount(spark: SparkSession, path: String): Long =
    readJsonl(spark, path).filter("_corrupt IS NOT NULL").count()

  def writeJsonl(df: DataFrame, path: String,
                 mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}
