package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked STUB — no media libraries ship in
  * this container — but everything Spark-side is real and tested: the
  * schema, the mapPartitions batch shape (what a Pandas-UDF/Arrow bridge
  * would see), the partitioning, and the deterministic feature extraction
  * used as the fake decoder output.
  */
object Multimodal {

  /** Canonical media row: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("data", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Demo helper: wrap any text table into media rows (payload = UTF-8
    * bytes) so pipelines are runnable on the synthetic corpus.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit("text/plain").as("media_type"),
      encode(col(textCol), "UTF-8").as("data"),
      map(lit("origin"), lit("synthetic")).as("meta"))

  /** Sniff a container format from magic bytes — real logic, works on real
    * files when they arrive.
    */
  def sniffFormat(bytes: Array[Byte]): String = {
    def at(i: Int, v: Int): Boolean = bytes.length > i && (bytes(i) & 0xff) == v
    if (at(0, 0xff) && at(1, 0xd8)) "jpeg"
    else if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) "png"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F')) "riff-av"
    else if (at(4, 'f') && at(5, 't') && at(6, 'y') && at(7, 'p')) "mp4"
    else "unknown"
  }

  /** STUB decoder: where a real pipeline would decode pixels/samples, this
    * produces deterministic pseudo-dimensions and a normalized 16-bin byte
    * histogram as the "embedding". Deterministic ⇒ testable end-to-end.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    // ??? real decode goes here (e.g. javax.imageio / ffmpeg via Arrow batches)
    val w = if (bytes.isEmpty) 0 else ((bytes(0) & 0xff) + 1) * 8
    val h = if (bytes.length < 2) 0 else ((bytes(1) & 0xff) + 1) * 8
    val hist = new Array[Float](16)
    bytes.foreach(b => hist((b & 0xff) >> 4) += 1f)
    val n = math.max(1, bytes.length).toFloat
    (w, h, hist.map(_ / n))
  }

  /** Batch feature extraction over partitions — the exact shape an Arrow /
    * Pandas-UDF bridge consumes (an iterator of rows per partition; swap the
    * stub for a vectorized decode without touching the plan).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "data").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (w, h, feat) = decodeStub(bytes)
        Row(id, sniffFormat(bytes), bytes.length.toLong, w, h, feat.toSeq)
      }
    }(enc)
  }

  /** Resize planning: target dimensions fitting (maxW, maxH) with aspect
    * ratio preserved, never upscaling — the metadata half of a real resize
    * (the pixel half belongs to the decode stub). Zero/unknown input dims
    * pass through as 0×0.
    */
  def resizePlan(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val valid = col("width") > 0 && col("height") > 0
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    features
      .withColumn("out_width",
        when(valid, greatest(floor(col("width") * scale), lit(1))).otherwise(lit(0))
          .cast("int"))
      .withColumn("out_height",
        when(valid, greatest(floor(col("height") * scale), lit(1))).otherwise(lit(0))
          .cast("int"))
  }

  /** Frame sampling stub: every-nth-chunk byte slices standing in for video
    * frame extraction; the explode/partition shape is the real one.
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyNth: Int): DataFrame =
    media.select(col("media_id"),
        posexplode(split_part_bytes(col("data"), chunkBytes)).as(Seq("frame_idx", "frame")))
      .where(col("frame_idx") % everyNth === 0)

  /** Chunk a binary column into fixed-size slices (built-ins only). */
  private def split_part_bytes(data: org.apache.spark.sql.Column, n: Int) =
    transform(
      sequence(lit(0), greatest(floor((octet_length(data) - 1) / n).cast("int"), lit(0))),
      i => substring(data, (i * n + 1).cast("int"), lit(n)))

  // ---- media dedup ladder (the LAION-style pipeline: exact payload hash,
  // then feature-space near-dup over the decoded embeddings) ----

  /** Exact payload duplicate stats: md5 over the raw bytes — byte-identical
    * re-crawls and mirrored assets. Same partial-agg shape as text J1/A11.
    */
  def mediaDuplicateStats(media: DataFrame): DataFrame =
    Dedup.duplicateStats(media, md5(col("data")))

  /** Keep-first over exact payload duplicates (order: media_id). */
  def mediaKeepFirst(media: DataFrame): DataFrame =
    Dedup.keepFirst(media, md5(col("data")), Seq(col("media_id")))

  /** Feature-space near-duplicates: decode (stub) → embedding → pairwise
    * cosine ≥ threshold via [[Similarity.cosineNearDuplicates]] — catches
    * re-encodes and resizes that byte hashing cannot. With a real decoder
    * the embedding column is the only thing that changes; at billion-asset
    * scale compose with IVF bucketing exactly like text SemDeDup.
    */
  def mediaNearDuplicates(media: DataFrame, threshold: Double): DataFrame =
    Similarity.cosineNearDuplicates(
      extractFeatures(media).select(col("media_id"), col("feature")),
      "media_id", "feature", threshold)
}
