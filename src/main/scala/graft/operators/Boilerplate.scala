package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal (the RefinedWeb/C4 line-dedup
  * pass): a line that appears verbatim in ≥ `minDocs` DISTINCT documents
  * is boilerplate (nav bars, cookie banners, license footers) and is
  * stripped from every document; document order of the surviving lines
  * is preserved.
  *
  * Scale shape: one shuffle keyed by line to count distinct docs — the
  * boilerplate SET is small by construction (only lines crossing the
  * threshold), so membership is a broadcast anti-join against the
  * exploded lines, and reassembly is one groupBy(doc). Everything is
  * linear in corpus lines; nothing pairs documents. At 100 TB, count
  * on a line HASH instead of the raw string to shrink the shuffle
  * (identical algebra, hash the join key too).
  */
object Boilerplate {

  /** Returns (idCol, text_clean): each doc's text with boilerplate
    * lines removed. Docs whose every line was boilerplate (or whose
    * text is null) come back with empty text — route them to a length
    * filter downstream. `splitPattern`/`joinWith` default to real line
    * semantics; tests and the fixture oracle exercise token granularity
    * with ("\\s+", " "). */
  def stripFrequentLines(docs: DataFrame, minDocs: Long,
                         splitPattern: String = "\\r?\\n",
                         joinWith: String = "\n",
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would strip every line")
    val lines = docs
      .select(col(idCol),
        posexplode(split(trim(col(textCol)), splitPattern))
          .as(Seq("pos", "line")))
    val boilerplate = lines
      .filter(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("_docs"))
      .filter(col("_docs") >= minDocs)
      .select("line")
    val kept = lines.join(broadcast(boilerplate), Seq("line"), "left_anti")
    val reassembled = kept
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")),
        joinWith).as("text_clean"))
    docs.select(col(idCol))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text_clean"), lit(""))
        .as("text_clean"))
  }
}
