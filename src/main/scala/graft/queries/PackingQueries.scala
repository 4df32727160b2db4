package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence-packing surface: concat-and-chunk offsets/manifest under a
  * deterministic (optionally hash-shuffled) corpus order, and the
  * pad-or-truncate utilization accounting. The oracles replay the
  * distributed two-phase prefix sum as a plain DuckDB window cumsum —
  * bucket boundaries cancel out of the math, which is exactly the
  * invariant PackingSpec pins on the Spark side.
  */
object PackingQueries extends QueryPack {

  private val L = 512

  /** Shared oracle CTE: per-doc token count and stream start offset. */
  private def offsetsSql(order: String): String =
    s"""t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       | FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       | CAST(coalesce(sum(n_tokens) OVER (ORDER BY $order
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |  AS start_offset FROM t)""".stripMargin

  override val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
    "s12_pack_chunks" -> ((s, dir) =>
      Packing.packChunks(Tables(s, dir, "documents"), "doc_id", "text", L)),

    // hash-shuffled order: the epoch shuffle training runs actually use,
    // and the path that exercises range partitioning on a non-sequential key
    "s13_shuffle_pack" -> ((s, dir) =>
      Packing.packChunks(Tables(s, dir, "documents"), "doc_id", "text", L,
        orderBy = Some(md5(col("doc_id").cast("string"))))),

    "s14_packing_stats" -> ((s, dir) =>
      Packing.packingStats(Tables(s, dir, "documents"), "text", L, "source")),

    // short-to-long length curriculum (Shortformer-style): the epoch's
    // token stream orders docs by token count before chunking, so early
    // chunks hold many short docs and fragmentation concentrates late
    "s18_curriculum" -> ((s, dir) =>
      Packing.packChunks(Tables(s, dir, "documents"), "doc_id", "text", L,
        orderBy = Some(size(split(col("text"), " ")).cast("long")))),

    "s15_pack_manifest" -> ((s, dir) =>
      Packing.packManifest(Tables(s, dir, "documents"), "doc_id", "text", L)),

    // Chinchilla-style mixture cut: per-source TOKEN budgets, kept docs =
    // the md5(id)-ordered prefix that fits; src7's oversized budget keeps
    // its whole stratum, unbudgeted sources drop out
    "s19_token_budget" -> ((s, dir) =>
      Packing.tokenBudgetSample(Tables(s, dir, "documents"), "doc_id",
          "text", col("source"),
          Map("src1" -> 800L, "src2" -> 600L, "src7" -> 1000000L))
        .orderBy("stratum", "id")),

    // token-balanced output shards: per-shard doc/token totals
    "s16_token_shards" -> ((s, dir) =>
      Packing.assignShards(Tables(s, dir, "documents"), "doc_id", "text", 4096L)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .orderBy("shard")),

    // overlapping token windows (embedding/RAG chunking): 12-token windows
    // every 6 tokens
    "s17_sliding_windows" -> ((s, dir) =>
      Packing.slidingWindows(Tables(s, dir, "documents"), "doc_id", "text",
        size = 12, stride = 6).orderBy("id", "start"))
  )

  override val oracles = Map(
    "s17_sliding_windows" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t,
        |  len(string_split(text, ' ')) AS n FROM documents),
        |w AS (SELECT doc_id, unnest(list_transform(generate_series(0,
        |   CASE WHEN n <= 12 THEN 0
        |    ELSE CAST(ceil(CAST(n - 12 AS DOUBLE) / 6) AS INT) END),
        |  i -> {'start': CAST(i * 6 AS BIGINT),
        |        'chunk': array_to_string(list_slice(t, i * 6 + 1, i * 6 + 12), ' ')})) AS s
        | FROM t WHERE n > 0)
        |SELECT doc_id AS id, s['start'] AS start, s['chunk'] AS chunk FROM w
        |ORDER BY id, start""".stripMargin,

    "s12_pack_chunks" ->
      s"""WITH ${offsetsSql("doc_id")}
         |SELECT doc_id, n_tokens, start_offset,
         | start_offset // $L AS first_chunk,
         | (start_offset + n_tokens - 1) // $L AS last_chunk
         |FROM c""".stripMargin,

    "s13_shuffle_pack" ->
      s"""WITH ${offsetsSql("md5(CAST(doc_id AS VARCHAR)), doc_id")}
         |SELECT doc_id, n_tokens, start_offset,
         | start_offset // $L AS first_chunk,
         | (start_offset + n_tokens - 1) // $L AS last_chunk
         |FROM c""".stripMargin,

    "s18_curriculum" ->
      s"""WITH ${offsetsSql("n_tokens, doc_id")}
         |SELECT doc_id, n_tokens, start_offset,
         | start_offset // $L AS first_chunk,
         | (start_offset + n_tokens - 1) // $L AS last_chunk
         |FROM c""".stripMargin,

    "s19_token_budget" ->
      """WITH base AS (SELECT doc_id AS id, source AS stratum,
        |  md5(CAST(doc_id AS VARCHAR)) AS ord,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        | FROM documents WHERE source IN ('src1', 'src2', 'src7')),
        |c AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY stratum
        |  ORDER BY ord, id) AS BIGINT) AS cum_tokens FROM base)
        |SELECT id, stratum, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= (CASE stratum WHEN 'src1' THEN 800
        |  WHEN 'src2' THEN 600 ELSE 1000000 END)
        |ORDER BY stratum, id""".stripMargin,

    "s14_packing_stats" ->
      s"""SELECT source,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n) AS BIGINT) AS total_tokens,
         | CAST(sum(CASE WHEN n > $L THEN 1 ELSE 0 END) AS BIGINT) AS truncated_docs,
         | CAST(sum(greatest(n - $L, 0)) AS BIGINT) AS truncated_tokens,
         | CAST(sum($L - least(n, $L)) AS BIGINT) AS padding_tokens,
         | round(sum(least(n, $L)) / (count(*) * $L.0), 6) AS utilization
         |FROM (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |      FROM documents) GROUP BY source""".stripMargin,

    "s15_pack_manifest" ->
      s"""WITH ${offsetsSql("doc_id")},
         |ch AS (SELECT doc_id, n_tokens, start_offset,
         | unnest(generate_series(start_offset // $L,
         |   (start_offset + n_tokens - 1) // $L)) AS chunk_id FROM c)
         |SELECT doc_id, chunk_id,
         | CAST(least((chunk_id + 1) * $L, start_offset + n_tokens)
         |   - greatest(chunk_id * $L, start_offset) AS BIGINT) AS doc_tokens
         |FROM ch""".stripMargin,

    "s16_token_shards" ->
      s"""WITH ${offsetsSql("doc_id")}
         |SELECT start_offset // 4096 AS shard,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
