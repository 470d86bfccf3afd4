package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns
import graft.operators.{Dedup, Multimodal, Similarity}

/** Training-data-pipeline operators (BASELINE.json north star): text
  * analysis, deduplication, similarity search over `documents` and
  * `embeddings`. Oracle twins where engine-portable (md5-based hashing,
  * double-precision vector math); LSH/simhash variants are Spark-side
  * scale paths checked by unit tests + rows-only.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private val TOKS =
    """WITH t AS (
         SELECT doc_id, text, lang, source, n_chars,
                regexp_split_to_array(trim(text), '\s+') AS w
         FROM documents)"""

  val queries: Map[String, Q] = Map(
    // token counting: whitespace tokens, char count, mean token length
    "q28_token_stats" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_measured"),
          round(TextFns.meanTokenLength(col("text")), 4).as("mean_tok_len"))
        .orderBy(col("doc_id"))),

    // quality scoring: stopword ratio, punctuation density, composite
    "q29_quality" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          round(TextFns.stopwordRatio(col("text")), 4).as("stop_ratio"),
          TextFns.punctCount(col("text")).cast("long").as("n_punct"),
          TextFns.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    // language ID: per-language stopword hits + argmax guess
    "q30_langid" -> ((s, d) => {
      val hits = TextFns.langHits(col("text"))
        .map { case (l, h) => h.cast("long").as(s"h_$l") }
      Tables.documents(s, d).select(
          (col("doc_id") +: hits :+
            TextFns.langId(col("text")).as("lang_guess")): _*)
        .orderBy(col("doc_id"))
    }),

    // exact dedup: hash-groupBy on content digest
    "q31_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d)).orderBy(col("content_hash"))),

    // fingerprint dedup key: md5 of sorted distinct token set
    "q32_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),

    // minhash signatures (md5-seeded, word-bigram shingles)
    "q33_minhash_sigs" -> ((s, d) =>
      Dedup.minhashSignatures(Tables.documents(s, d), k = 4, n = 2)
        .orderBy(col("doc_id"))),

    // exact n-gram jaccard pairs via inverted index (no cross join)
    "q34_jaccard_pairs" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), n = 1,
          threshold = 0.6)
        .orderBy(col("id_a"), col("id_b"))),

    // brute-force cosine top-k (exact ANN baseline), two-phase plan
    "q35_knn" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // embedding-cosine similar pairs above threshold (exact)
    "q36_cosine_pairs" -> ((s, d) =>
      Similarity.bruteForceSelfPairs(Tables.embeddings(s, d), 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    // vector column stats: norm + component mean
    "q37_embed_stats" -> ((s, d) => {
      val v = Similarity.asDouble(col("embedding"))
      Tables.embeddings(s, d).select(col("vec_id"), col("label"),
          round(Similarity.norm(v), 4).as("norm"),
          round(aggregate(v, lit(0.0), (a, x) => a + x) /
            nullif(size(v), lit(0)), 4).as("mean_val"))
        .orderBy(col("vec_id"))
    }),

    // SimHash fingerprints (Spark-side scale path; no oracle —
    // xxhash64-based). Pairing is covered by DedupSpec unit tests.
    "q38_simhash" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.simhash64(col("text")).as("simhash"))
        .orderBy(col("doc_id"))),

    // MinHash-LSH candidate pairs (banded bucketing; no oracle)
    "q39_minhash_lsh_pairs" -> ((s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), k = 8, bands = 4, n = 1)
        .orderBy(col("id_a"), col("id_b"))),

    // multimodal plumbing: binary payloads → partition-local decode
    // (decode itself is a deterministic stub; see Multimodal scaladoc)
    "q50_media_features" -> ((s, d) =>
      Multimodal.extractFeatures(
          Multimodal.asMedia(Tables.documents(s, d)))
        .select(col("doc_id"), col("media_type"),
          col("n_bytes").cast("long").as("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy(col("doc_id"))),

    // random-hyperplane LSH bucketed cosine pairs (ANN scale path)
    "q40_lsh_cosine_pairs" -> ((s, d) =>
      Similarity.cosineSelfPairs(Tables.embeddings(s, d), 0.3,
          planesPerBand = 6, bands = 8)
        .orderBy(col("id_a"), col("id_b"))),

    // MinHash-LSH dedup as linear cluster labeling (the scale-correct
    // output shape: one canonical id per doc, never pair enumeration)
    "q58_dedup_groups" -> ((s, d) =>
      Dedup.minhashDedupGroups(Tables.documents(s, d), k = 8, bands = 4,
          n = 2, iterations = 2)
        .orderBy(col("doc_id"))),

    // IVF ANN: k-means cells + nProbe search (exact when nProbe = cells;
    // approximate scale path otherwise — no SQL oracle, SimilaritySpec
    // pins the exactness property)
    "q57_ivf_knn" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), k = 10,
          nCentroids = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }))

  val oracle: Map[String, String] = Map(
    "q28_token_stats" -> (TOKS +
      """ SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
            CAST(length(text) AS BIGINT) AS n_chars_measured,
            round(CAST(list_aggregate(list_transform(w, x -> length(x)),
                       'sum') AS DOUBLE) / nullif(len(w), 0), 4)
              AS mean_tok_len
          FROM t ORDER BY doc_id"""),
    "q29_quality" -> (TOKS +
      """, q AS (
            SELECT doc_id, len(w) AS n_tok,
              CAST(len(list_filter(w, x -> x IN ('the','a','an','and','of',
                'to','in','is','it','that'))) AS DOUBLE)
                / nullif(len(w), 0) AS sr,
              length(text)
                - length(regexp_replace(text, '[.,!?;:''"()\[\]-]', '', 'g'))
                AS np,
              length(text) AS nc
            FROM t)
          SELECT doc_id, round(sr, 4) AS stop_ratio,
            CAST(np AS BIGINT) AS n_punct,
            round((CASE WHEN n_tok BETWEEN 10 AND 100000
                        THEN 0.4 ELSE 0.0 END)
              + (CASE WHEN sr > 0.05 THEN 0.3 ELSE 0.0 END)
              + (CASE WHEN CAST(np AS DOUBLE) / nullif(nc, 0) < 0.1
                      THEN 0.3 ELSE 0.0 END), 4) AS quality
          FROM q ORDER BY doc_id"""),
    "q30_langid" -> (TOKS +
      """, h AS (
            SELECT doc_id,
              CAST(len(list_filter(w, x -> x IN ('the','a','and','of','is',
                'to'))) AS BIGINT) AS h_en,
              CAST(len(list_filter(w, x -> x IN ('el','la','y','de','es',
                'que'))) AS BIGINT) AS h_es,
              CAST(len(list_filter(w, x -> x IN ('der','die','und','das',
                'ist','nicht'))) AS BIGINT) AS h_de,
              CAST(len(list_filter(w, x -> x IN ('le','la','et','les','est',
                'une'))) AS BIGINT) AS h_fr
            FROM t)
          SELECT doc_id, h_en, h_es, h_de, h_fr,
            CASE WHEN greatest(h_en, h_es, h_de, h_fr) <= 0 THEN 'und'
                 WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
                 WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
                 WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
                 WHEN h_fr = greatest(h_en, h_es, h_de, h_fr) THEN 'fr'
                 ELSE 'und' END AS lang_guess
          FROM h ORDER BY doc_id"""),
    "q31_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
         count(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q32_fingerprint" ->
      """SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
           regexp_split_to_array(trim(text), '\s+'))), ' ')) AS fingerprint
         FROM documents ORDER BY doc_id""",
    "q33_minhash_sigs" -> (TOKS +
      """, sh AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i+1])) AS sh
            FROM t)
          SELECT doc_id,
            list_aggregate(list_transform(sh, s -> md5('0|' || s)), 'min')
              AS sig_0,
            list_aggregate(list_transform(sh, s -> md5('1|' || s)), 'min')
              AS sig_1,
            list_aggregate(list_transform(sh, s -> md5('2|' || s)), 'min')
              AS sig_2,
            list_aggregate(list_transform(sh, s -> md5('3|' || s)), 'min')
              AS sig_3
          FROM sh ORDER BY doc_id"""),
    "q34_jaccard_pairs" -> (TOKS +
      """, sets AS (
            SELECT doc_id, list_distinct(w) AS sh FROM t),
          inv AS (
            SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM sets),
          p AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.sz AS sa, b.sz AS sb, count(*) AS inter
            FROM inv a JOIN inv b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4),
          j AS (
            SELECT id_a, id_b, inter,
                   round(inter / (sa + sb - inter), 6) AS jaccard
            FROM p)
          SELECT id_a, id_b, inter, jaccard FROM j
          WHERE jaccard >= 0.6 ORDER BY id_a, id_b"""),
    "q50_media_features" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(length(text) AS BIGINT) AS n_bytes,
         CAST(16 + (ascii(substr(text, 1, 1)) % 128) AS BIGINT) AS width,
         CAST(16 + (ascii(substr(text, length(text) // 2 + 1, 1)) % 128)
           AS BIGINT) AS height
         FROM documents ORDER BY doc_id""",
    "q58_dedup_groups" -> (TOKS +
      """, sh AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i+1])) AS sh
            FROM t),
          sig AS (
            SELECT doc_id,
              list_aggregate(list_transform(sh, s -> md5('0|' || s)),
                'min') AS s0,
              list_aggregate(list_transform(sh, s -> md5('1|' || s)),
                'min') AS s1,
              list_aggregate(list_transform(sh, s -> md5('2|' || s)),
                'min') AS s2,
              list_aggregate(list_transform(sh, s -> md5('3|' || s)),
                'min') AS s3,
              list_aggregate(list_transform(sh, s -> md5('4|' || s)),
                'min') AS s4,
              list_aggregate(list_transform(sh, s -> md5('5|' || s)),
                'min') AS s5,
              list_aggregate(list_transform(sh, s -> md5('6|' || s)),
                'min') AS s6,
              list_aggregate(list_transform(sh, s -> md5('7|' || s)),
                'min') AS s7
            FROM sh),
          banded AS (
            SELECT doc_id, md5('0|' || s0 || '|' || s1) AS bucket FROM sig
            UNION ALL
            SELECT doc_id, md5('1|' || s2 || '|' || s3) FROM sig
            UNION ALL
            SELECT doc_id, md5('2|' || s4 || '|' || s5) FROM sig
            UNION ALL
            SELECT doc_id, md5('3|' || s6 || '|' || s7) FROM sig),
          l1 AS (
            SELECT b.doc_id, min(bm.m) AS canonical
            FROM banded b JOIN (SELECT bucket, min(doc_id) AS m
                                FROM banded GROUP BY 1) bm
              USING (bucket)
            GROUP BY 1),
          l2 AS (
            SELECT b.doc_id, min(bm2.m) AS canonical
            FROM banded b JOIN (
              SELECT b2.bucket, min(l1.canonical) AS m
              FROM banded b2 JOIN l1 ON b2.doc_id = l1.doc_id
              GROUP BY 1) bm2
              USING (bucket)
            GROUP BY 1)
          SELECT s.doc_id, COALESCE(l2.canonical, s.doc_id) AS canonical
          FROM sig s LEFT JOIN l2 USING (doc_id) ORDER BY s.doc_id"""),
    "q35_knn" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv
                  FROM embeddings),
            s AS (SELECT qid, nid,
                         round(list_cosine_similarity(qv, cv), 4) AS sim
                  FROM q, c WHERE qid <> nid),
            r AS (SELECT qid AS query_id, nid AS neighbor_id, sim,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY sim DESC, nid) AS rank
                  FROM s)
         SELECT query_id, rank, neighbor_id, sim FROM r
         WHERE rank <= 10 ORDER BY query_id, rank""",
    "q36_cosine_pairs" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_cosine_similarity(a.e, b.e), 4) AS sim
         FROM v a JOIN v b ON a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(a.e, b.e), 4) >= 0.4
         ORDER BY id_a, id_b""",
    "q37_embed_stats" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
                    FROM embeddings)
         SELECT vec_id, label,
                round(sqrt(list_dot_product(e, e)), 4) AS norm,
                round(list_aggregate(e, 'sum') / nullif(len(e), 0), 4)
                  AS mean_val
         FROM v ORDER BY vec_id""")
}
