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

    // perceptual-hash dedup (dHash): the rung between exact payload md5
    // and embedding cosine — an 8×9 brightness grid, one bit per
    // adjacent-cell comparison, duplicate stats over the packed 64-bit
    // hash. Text payloads take the deterministic byte-grid arm, which
    // the oracle replays cell for cell (the corpus is ASCII-asserted, so
    // DuckDB char ops equal byte ops; the image arm is spec-tested on
    // real PNG rasters where SQL cannot follow)
    "m_dhash_dup" -> ((s, dir) =>
      Multimodal.perceptualDuplicateStats(
        Multimodal.fromText(Tables(s, dir, "documents"), "doc_id", "text"))),

    // perceptual NEAR-dup pairs (banded hamming blocking over dHash):
    // every doc paired with an in-place last-byte perturbation of itself
    // — length unchanged, so only the final grid cell's mean moves and
    // the pair lands within the hamming≤3 radius the 4-band blocking
    // GUARANTEES by pigeonhole (an append would shift every slice
    // boundary instead — that regime is the embedding rung's job)
    "m_dhash_neardup" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val twin = d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 1)"), lit("~"))
          .as("text"))
      Multimodal.perceptualNearDuplicates(
        Multimodal.fromText(d.select("doc_id", "text").union(twin),
          "doc_id", "text"), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // the corpus-scale composition of the perceptual rung (r18): near-dup
    // edges between HASH CLASSES (min-doc_id representative per distinct
    // dhash) — identical-hash mass stays with the stats rung, so the
    // asset-level quadratic blowup (measured 1.6e10 candidate pairs at
    // 5M low-entropy payloads) is removed structurally. Same twin
    // fixture as m_dhash_neardup; class pairs have hamming >= 1 by
    // construction (distinct hashes).
    "m_dhash_classes" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val twin = d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 1)"), lit("~"))
          .as("text"))
      Multimodal.perceptualNearDuplicateClasses(
        Multimodal.fromText(d.select("doc_id", "text").union(twin),
          "doc_id", "text"), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // resize planning (the metadata half of a real batch resize): synth
    // dims derived deterministically from the text so the aspect-ratio /
    // never-upscale / zero-dim-passthrough arithmetic is value-checked
    "m_resize_plan" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val feats = d.select(col("doc_id").as("media_id"),
        (size(split(col("text"), " ")) * 37 % 4000).cast("int").as("width"),
        (length(col("text")) % 3000).cast("int").as("height"))
      Multimodal.resizePlan(feats, maxW = 640, maxH = 480)
        .select(col("media_id"), col("width"), col("height"),
          col("out_width"), col("out_height"))
        .orderBy("media_id")
    }),

    // frame sampling (every-nth fixed-size byte chunks standing in for
    // video frames): the posexplode/partition shape is the real one; the
    // oracle replays chunk boundaries and keeps md5s of the bytes
    "m_frame_sample" -> ((s, dir) => {
      val media = Multimodal.fromText(Tables(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.sampleFrames(media, chunkBytes = 32, everyNth = 2)
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          md5(col("frame")).as("frame_md5"),
          octet_length(col("frame")).cast("long").as("frame_bytes"))
        .orderBy("media_id", "frame_idx")
    }),

    // the real imageio decode path rides along as an injected 8×5 PNG row
    // (media_id −1): its exact dimensions are value-checked by the oracle;
    // text payloads take the byte-histogram fallback (0×0 dims). format is
    // derived independently by the oracle from the text prefix (image
    // magic bytes cannot begin valid text).
    "m_media_features" -> ((s, dir) => {
      val textMedia = Multimodal.fromText(Tables(s, dir, "documents"), "doc_id", "text")
      val png = s.range(1).select(lit(-1L).as("media_id"),
        lit("image/png").as("media_type"),
        lit(Multimodal.tinyPngFixture).as("data"),
        map(lit("origin"), lit("fixture")).as("meta"))
      Multimodal.extractFeatures(textMedia.unionByName(png))
        .select(col("media_id"), col("format"), col("n_bytes"),
          col("width"), col("height"),
          size(col("feature")).cast("long").as("feature_dim"))
        .orderBy("media_id")
    })
  )

  /** The dHash byte-grid replay over the doc+perturbed-twin fixture —
    * the `hash` CTE both perceptual oracles build on (cell means, the
    * 8x9 adjacent comparisons, the bit-63 sign fold).
    */
  private lazy val dhashTwinHashCtes: String =
    """WITH base AS (SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 1000000,
      |   concat(substr(text, 1, length(text) - 1), '~') FROM documents),
      |b AS (SELECT doc_id, text, octet_length(encode(text)) AS L FROM base),
      |ch AS (SELECT doc_id, i - 1 AS pos, ord(substr(text, CAST(i AS INT), 1)) AS v, L
      |  FROM (SELECT doc_id, text, L, unnest(generate_series(1, L)) AS i FROM b WHERE L > 0)),
      |cells AS (SELECT doc_id, (pos * 72) // L AS j, avg(CAST(v AS DOUBLE)) AS cv
      |  FROM ch GROUP BY 1, 2),
      |grid AS (SELECT d.doc_id, g.j, coalesce(c.cv, 0.0) AS cv
      |  FROM (SELECT DISTINCT doc_id FROM b) d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 71)) AS j) g
      |  LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.j = g.j),
      |bits AS (SELECT l.doc_id, ((l.j // 9) * 8 + (l.j % 9)) AS bit,
      |    (r.cv > l.cv) AS s
      |  FROM grid l JOIN grid r ON r.doc_id = l.doc_id AND r.j = l.j + 1
      |  WHERE l.j % 9 < 8),
      |hash AS (SELECT doc_id,
      |  CAST(sum(CASE WHEN s AND bit < 63 THEN (1::BIGINT << CAST(bit AS INT))::HUGEINT ELSE 0::HUGEINT END)
      |   + sum(CASE WHEN s AND bit = 63 THEN (-9223372036854775808)::HUGEINT ELSE 0::HUGEINT END) AS BIGINT) AS dhash
      |  FROM bits GROUP BY 1)""".stripMargin

  override val oracles: Map[String, String] = Map(
    "m_resize_plan" ->
      """WITH feats AS (SELECT doc_id AS media_id,
        |  CAST((len(string_split(text, ' ')) * 37) % 4000 AS INT) AS width,
        |  CAST(length(text) % 3000 AS INT) AS height FROM documents),
        |r AS (SELECT media_id, width, height,
        |  CASE WHEN width > 0 AND height > 0
        |    THEN least(640.0 / width, 480.0 / height, 1.0) END AS scale
        | FROM feats)
        |SELECT media_id, width, height,
        |  CAST(CASE WHEN scale IS NULL THEN 0
        |    ELSE greatest(floor(width * scale), 1) END AS INT) AS out_width,
        |  CAST(CASE WHEN scale IS NULL THEN 0
        |    ELSE greatest(floor(height * scale), 1) END AS INT) AS out_height
        |FROM r ORDER BY media_id""".stripMargin,

    // ASCII corpus (asserted: octet_length == length at every SF), so
    // text substr chunks equal byte chunks and md5 agrees across engines
    "m_frame_sample" ->
      """WITH base AS (SELECT doc_id, text,
        |  greatest(CAST(floor((length(text) - 1) / 32.0) AS INT), 0) AS maxi
        | FROM documents),
        |ix AS (SELECT doc_id, text,
        |  unnest(generate_series(0, maxi)) AS i FROM base)
        |SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
        |  md5(substr(text, i * 32 + 1, 32)) AS frame_md5,
        |  CAST(octet_length(encode(substr(text, i * 32 + 1, 32))) AS BIGINT)
        |    AS frame_bytes
        |FROM ix WHERE i % 2 = 0
        |ORDER BY media_id, frame_idx""".stripMargin,

    // the dHash byte arm replayed cell for cell: per-byte cell index
    // pos*72//L, cell = avg byte, bit r*8+c set when right cell > left,
    // bit 63 contributing the two's-complement sign term (DuckDB's
    // BIGINT << 63 overflows, so the top bit adds -2^63 via HUGEINT)
    "m_dhash_dup" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS L FROM documents),
        |ch AS (SELECT doc_id, i - 1 AS pos, ord(substr(text, CAST(i AS INT), 1)) AS v, L
        |  FROM (SELECT doc_id, text, L, unnest(generate_series(1, L)) AS i FROM b WHERE L > 0)),
        |cells AS (SELECT doc_id, (pos * 72) // L AS j, avg(CAST(v AS DOUBLE)) AS cv
        |  FROM ch GROUP BY 1, 2),
        |grid AS (SELECT d.doc_id, g.j, coalesce(c.cv, 0.0) AS cv
        |  FROM (SELECT DISTINCT doc_id FROM b) d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 71)) AS j) g
        |  LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.j = g.j),
        |bits AS (SELECT l.doc_id, ((l.j // 9) * 8 + (l.j % 9)) AS bit,
        |    (r.cv > l.cv) AS s
        |  FROM grid l JOIN grid r ON r.doc_id = l.doc_id AND r.j = l.j + 1
        |  WHERE l.j % 9 < 8),
        |hash AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN s AND bit < 63 THEN (1::BIGINT << CAST(bit AS INT))::HUGEINT ELSE 0::HUGEINT END)
        |   + sum(CASE WHEN s AND bit = 63 THEN (-9223372036854775808)::HUGEINT ELSE 0::HUGEINT END) AS BIGINT) AS dhash
        |  FROM bits GROUP BY 1),
        |hc AS (SELECT dhash, count(*) AS c FROM hash GROUP BY 1)
        |SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS duplicates,
        | CAST(sum(c) AS BIGINT) AS total,
        | count(CASE WHEN c > 1 THEN 1 END) AS uniq_duplicates,
        | count(*) AS uniq_total
        |FROM hc""".stripMargin,

    // the near-dup replay: the m_dhash_dup grid/bits/hash CTEs over the
    // doc ∪ perturbed-twin set, then 16-bit band blocking (arithmetic
    // shift + mask agree with Java's >> on negatives — probed) and the
    // exact bit_count(xor) verify
    "m_dhash_neardup" ->
      s"""$dhashTwinHashCtes,
        |banded AS (SELECT doc_id, dhash, bd AS band,
        |   (dhash >> (bd * 16)) & 65535 AS key
        |  FROM (SELECT doc_id, dhash, unnest(generate_series(0, 3)) AS bd FROM hash)),
        |pairs AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b,
        |   bit_count(xor(a.dhash, bb.dhash)) AS hamming
        |  FROM banded a JOIN banded bb
        |   ON a.band = bb.band AND a.key = bb.key AND a.doc_id < bb.doc_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM pairs WHERE hamming <= 3 ORDER BY 1, 2""".stripMargin,

    // classes: one representative per distinct dhash (min doc_id), the
    // SAME banding/pairing over the class set
    "m_dhash_classes" ->
      s"""$dhashTwinHashCtes,
        |cls AS (SELECT dhash, min(doc_id) AS rep FROM hash GROUP BY 1),
        |banded AS (SELECT rep, dhash, bd AS band,
        |   (dhash >> (bd * 16)) & 65535 AS key
        |  FROM (SELECT rep, dhash, unnest(generate_series(0, 3)) AS bd FROM cls)),
        |pairs AS (SELECT DISTINCT a.rep AS id_a, bb.rep AS id_b,
        |   bit_count(xor(a.dhash, bb.dhash)) AS hamming
        |  FROM banded a JOIN banded bb
        |   ON a.band = bb.band AND a.key = bb.key AND a.rep < bb.rep)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM pairs WHERE hamming <= 3 ORDER BY 1, 2""".stripMargin,

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
        |   WHEN substring(text, 1, 4) = 'GIF8' THEN 'gif'
        |   WHEN substring(text, 1, 2) = 'BM' THEN 'bmp'
        |   WHEN substring(text, 5, 4) = 'ftyp' THEN 'mp4'
        |   ELSE 'unknown' END) AS format,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
        | CAST(16 AS BIGINT) AS feature_dim
        |FROM documents
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), 'png', CAST(170 AS BIGINT),
        | CAST(8 AS INTEGER), CAST(5 AS INTEGER), CAST(16 AS BIGINT)
        |ORDER BY media_id""".stripMargin
  )
}
