package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal surface: binary payload accounting (oracle-checked) and the
  * batch feature-extraction pipeline (stub decoder ⇒ structure-checked only).
  */
object MultimodalQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_binary_meta" -> ((s, dir) => {
      val media = Multimodal.fromText(Tables(s, dir, "documents"), "doc_id", "text")
      media.groupBy("media_type")
        .agg(count(lit(1)).as("n_media"),
          sum(octet_length(col("data"))).cast("long").as("total_bytes"),
          max(octet_length(col("data"))).cast("long").as("max_bytes"))
    }),

    // exact media dedup: payloads collide on the 12-token text prefix
    // (byte-identical re-crawls); same duplicate-stats contract as a11
    "m_media_dup" -> ((s, dir) => {
      val prefix = concat_ws(" ", slice(split(col("text"), " "), 1, 12))
      val media = Multimodal.fromText(
        Tables(s, dir, "documents").withColumn("text", prefix), "doc_id", "text")
      Multimodal.mediaDuplicateStats(media)
    }),

    // stub decoder is deterministic, so the mapPartitions pipeline's
    // observable outputs (format sniff, byte length, feature arity) are
    // value-checked; the oracle derives format independently from the text
    // prefix (jpeg/png magic bytes cannot begin valid text)
    "m_media_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.fromText(Tables(s, dir, "documents"), "doc_id", "text"))
        .select(col("media_id"), col("format"), col("n_bytes"),
          size(col("feature")).cast("long").as("feature_dim"))
        .orderBy("media_id"))
  )

  override val oracles: Map[String, String] = Map(
    "m_media_dup" ->
      """WITH p AS (SELECT md5(array_to_string(
        |  list_slice(string_split(text, ' '), 1, 12), ' ')) AS h FROM documents),
        |hc AS (SELECT h, count(*) AS c FROM p GROUP BY 1)
        |SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS duplicates,
        | CAST(sum(c) AS BIGINT) AS total,
        | count(CASE WHEN c > 1 THEN 1 END) AS uniq_duplicates,
        | count(*) AS uniq_total
        |FROM hc""".stripMargin,

    "m_binary_meta" ->
      """SELECT 'text/plain' AS media_type, count(*) AS n_media,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        |FROM documents""".stripMargin,

    "m_media_features" ->
      """SELECT doc_id AS media_id,
        | (CASE WHEN substring(text, 1, 4) = 'RIFF' THEN 'riff-av'
        |   WHEN substring(text, 5, 4) = 'ftyp' THEN 'mp4'
        |   ELSE 'unknown' END) AS format,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(16 AS BIGINT) AS feature_dim
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
