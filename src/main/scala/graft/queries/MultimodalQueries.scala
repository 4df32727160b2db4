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

    // stub decoder output: structure-checked (rows>0), not value-checked
    "m_media_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.fromText(Tables(s, dir, "documents"), "doc_id", "text"))
        .select(col("media_id"), col("format"), col("n_bytes"),
          size(col("feature")).as("feature_dim"))
        .orderBy("media_id"))
  )

  override val oracles: Map[String, String] = Map(
    "m_binary_meta" ->
      """SELECT 'text/plain' AS media_type, count(*) AS n_media,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        |FROM documents""".stripMargin
  )
}
