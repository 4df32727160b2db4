package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The IMAGE decode is real: `javax.imageio` (JDK-bundled, no external
  * dependency) turns PNG/JPEG/GIF/BMP payloads into exact dimensions and
  * a 16-bin luma histogram over a bounded downsampled grid. Payloads
  * imageio cannot decode — video/audio containers, text — fall back to a
  * deterministic byte histogram with 0×0 dims, so the pipeline stays
  * total on any corpus; video/audio decode would slot into the same
  * mapPartitions/Arrow seam.
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
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8')) "gif"
    else if (at(0, 'B') && at(1, 'M')) "bmp"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F')) "riff-av"
    else if (at(4, 'f') && at(5, 't') && at(6, 'y') && at(7, 'p')) "mp4"
    else "unknown"
  }

  private val ImageFormats = Set("jpeg", "png", "gif", "bmp")

  /** An untrusted web corpus can carry a decompression bomb: a few-KB file
    * whose header declares astronomical dimensions. Images above this pixel
    * count are never decoded — they take the byte-histogram fallback.
    */
  private val MaxDecodePixels = 64L * 1024 * 1024

  /** Per-dimension ceiling independent of the pixel-count cap: a crafted
    * header declaring e.g. 64M×1 passes the area check, but the decoder's
    * per-ROW buffer scales with width alone and can transiently allocate
    * hundreds of MB before subsampling applies. Either dimension above
    * this takes the byte-histogram fallback.
    */
  private val MaxDecodeDim = 1 << 16

  /** Decode a payload to (width, height, embedding). Image containers go
    * through `javax.imageio`; anything else (or a corrupt/oversized image)
    * takes the deterministic byte-histogram fallback with 0×0 dims.
    *
    * Bounded on hostile input two ways: dimensions come from the HEADER
    * before any pixel work (oversized images are skipped, see
    * [[MaxDecodePixels]]), and the actual decode uses source subsampling so
    * the allocated raster is ~64×64 regardless of the source resolution —
    * the full-size image is never materialized. Catches NonFatal, not just
    * IOException: ImageIO throws RuntimeExceptions (CMMException, negative
    * array sizes) on crafted payloads and the pipeline must stay total.
    */
  private def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    if (ImageFormats(sniffFormat(bytes))) {
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val w = reader.getWidth(0)
              val h = reader.getHeight(0)
              if (w > 0 && h > 0 && w <= MaxDecodeDim && h <= MaxDecodeDim &&
                  w.toLong * h <= MaxDecodePixels) {
                val p = reader.getDefaultReadParam
                // the same 0, sx, 2sx… grid the histogram used to walk
                // in-memory — identical sampled pixels, but the decoder now
                // only ever allocates the subsampled raster
                p.setSourceSubsampling(math.max(1, w / 64), math.max(1, h / 64), 0, 0)
                val img = reader.read(0, p)
                if (img != null) return decodeSampled(w, h, img)
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    byteHistogram(bytes)
  }

  /** Exact source dims + 16-bin luma histogram over the subsampled raster
    * (≤ ~64×64 pixels) — work per asset is bounded no matter how large the
    * source image is, and lossless formats make the embedding exactly
    * reproducible.
    */
  private def decodeSampled(srcW: Int, srcH: Int,
                            img: java.awt.image.BufferedImage): (Int, Int, Array[Float]) = {
    val hist = new Array[Float](16)
    var n = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        hist(luma >> 4) += 1f
        n += 1
        x += 1
      }
      y += 1
    }
    val d = math.max(1, n).toFloat
    (srcW, srcH, hist.map(_ / d))
  }

  /** Non-image fallback: normalized 16-bin byte histogram, 0×0 dims. */
  private def byteHistogram(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val hist = new Array[Float](16)
    bytes.foreach(b => hist((b & 0xff) >> 4) += 1f)
    val n = math.max(1, bytes.length).toFloat
    (0, 0, hist.map(_ / n))
  }

  /** A real 8×5 RGB PNG (170 bytes, generated with ImageIO, also committed
    * as fixtures/tiny_8x5.png) — lets queries and tests exercise the real
    * decode path without any filesystem dependency.
    */
  val tinyPngFixture: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0x00, 0x00, 0x00, 0x0d,
    0x49, 0x48, 0x44, 0x52, 0x00, 0x00, 0x00, 0x08, 0x00, 0x00, 0x00, 0x05,
    0x08, 0x02, 0x00, 0x00, 0x00, 0xf7, 0xf3, 0x3a, 0x02, 0x00, 0x00, 0x00,
    0x71, 0x49, 0x44, 0x41, 0x54, 0x78, 0x5e, 0x05, 0xc1, 0x31, 0x15, 0xc0,
    0x20, 0x0c, 0x05, 0xc0, 0xef, 0xa1, 0x06, 0x98, 0x30, 0x90, 0x89, 0x0d,
    0x01, 0xf1, 0x00, 0x53, 0x04, 0x44, 0x01, 0x0b, 0x1e, 0xc8, 0xc6, 0x8e,
    0x87, 0x3e, 0x04, 0x64, 0xa9, 0x83, 0x48, 0xe9, 0x1d, 0x00, 0x24, 0x3c,
    0x15, 0xb9, 0xa3, 0x0c, 0xf0, 0x46, 0xbb, 0xd0, 0xc0, 0x04, 0xe8, 0x49,
    0x94, 0x2b, 0x95, 0x4e, 0x3c, 0xa8, 0x6d, 0xd2, 0x4b, 0x33, 0x68, 0x01,
    0x92, 0x93, 0x94, 0x2a, 0xdc, 0xa5, 0x0d, 0xd1, 0x2d, 0xf3, 0xca, 0x0a,
    0x39, 0x80, 0x95, 0x64, 0x5c, 0xad, 0x75, 0xd3, 0x61, 0x73, 0xdb, 0xba,
    0x76, 0xc2, 0x5e, 0xc0, 0x39, 0x79, 0xab, 0xae, 0xdd, 0xe7, 0xf0, 0xb5,
    0xfd, 0x5c, 0x7f, 0xc3, 0xbf, 0x1f, 0x88, 0x28, 0x31, 0xc5, 0x20, 0x44,
    0x0f, 0x9f, 0x00, 0x00, 0x00, 0x00, 0x49, 0x45, 0x4e, 0x44, 0xae, 0x42,
    0x60, 0x82).map(_.toByte)

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
        val (w, h, feat) = decode(bytes)
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

  // ---- perceptual hashing (dHash) ----

  /** 64-bit difference hash (dHash — the standard perceptual image
    * fingerprint): an 8×9 brightness grid, one bit per horizontally
    * adjacent cell pair (`right > left`), packed as bit `r*8+c`. Image
    * payloads build the grid from the bounded subsampled luma raster —
    * resolution-invariant by construction, so re-encodes and resizes of
    * the same picture land on the same or a near-identical hash (hamming
    * distance measures "near"). Non-image payloads (and images smaller
    * than the grid) take a deterministic byte-value grid (cell = mean
    * byte of its slice, slice membership = `pos*72/len`), so the
    * pipeline stays total and SQL-replayable on any corpus.
    */
  private[graft] def dHashOf(bytes: Array[Byte]): Long = {
    val grid: Array[Double] =
      if (ImageFormats(sniffFormat(bytes)))
        imageGrid(bytes).getOrElse(byteGrid(bytes))
      else byteGrid(bytes)
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r * 9 + c + 1) > grid(r * 9 + c)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Mean byte value per grid cell; cells an under-72-byte payload never
    * reaches stay 0.0 (matching the SQL replay's coalesce).
    */
  private def byteGrid(bytes: Array[Byte]): Array[Double] = {
    val sums = new Array[Double](72)
    val cnts = new Array[Int](72)
    val n = bytes.length
    var pos = 0
    while (pos < n) {
      val j = (pos.toLong * 72 / n).toInt
      sums(j) += (bytes(pos) & 0xff)
      cnts(j) += 1
      pos += 1
    }
    Array.tabulate(72)(j => if (cnts(j) > 0) sums(j) / cnts(j) else 0.0)
  }

  /** Mean luma per grid cell over the subsampled raster — the same
    * bounded decode discipline as [[decode]] (header-checked dims,
    * subsampled read, NonFatal-total). None = not decodable or smaller
    * than the grid → the byte arm serves as the deterministic fallback.
    */
  private def imageGrid(bytes: Array[Byte]): Option[Array[Double]] = {
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w < 9 || h < 8 || w > MaxDecodeDim || h > MaxDecodeDim ||
              w.toLong * h > MaxDecodePixels) return None
          val p = reader.getDefaultReadParam
          p.setSourceSubsampling(math.max(1, w / 64), math.max(1, h / 64), 0, 0)
          val img = reader.read(0, p)
          if (img == null) return None
          val rw = img.getWidth
          val rh = img.getHeight
          if (rw < 9 || rh < 8) return None
          val sums = new Array[Double](72)
          val cnts = new Array[Int](72)
          var y = 0
          while (y < rh) {
            var x = 0
            while (x < rw) {
              val rgb = img.getRGB(x, y)
              val luma = (299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
              val j = (y.toLong * 8 / rh).toInt * 9 + (x.toLong * 9 / rw).toInt
              sums(j) += luma
              cnts(j) += 1
              x += 1
            }
            y += 1
          }
          Some(Array.tabulate(72)(j =>
            if (cnts(j) > 0) sums(j) / cnts(j) else 0.0))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-asset dHash — same partition-batch shape as [[extractFeatures]]. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false))))
    media.select("media_id", "data").mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        Row(r.getLong(0), dHashOf(bytes))
      }
    }(enc)
  }

  /** Perceptual NEAR-duplicate pairs: dHashes within `maxHamming` bits,
    * found by banded blocking — the 64-bit hash splits into `bands`
    * equal slices, candidates pair within equal (band, key) blocks, and
    * the exact hamming distance verifies. Pigeonhole guarantee: any pair
    * within `bands − 1` bits shares at least one band, so the default
    * (4 bands, maxHamming 3) is EXACT — no missed pairs; raise `bands`
    * to widen the guaranteed radius. The shuffle carries (id, hash,
    * band key) rows only — bands × corpus, never payloads; the pair join
    * is block-local, the SimHash/LSH shape. Output: (id_a, id_b,
    * hamming), id_a < id_b, each pair once however many bands it shares.
    */
  /** `maxBlock` (0 = off, the exact default): the hot-block guard for
    * corpus scale — a (band, key) block holding a heavy-hitter hash
    * pattern pairs quadratically (the LSH hot-bucket failure; a block of
    * 100k near-identical assets alone is 5e9 candidate pairs), so blocks
    * past the cap are SKIPPED in that band. A skipped pair is only LOST
    * if every band it shares is hot, and identical-hash mass (the usual
    * heavy hitter) belongs to the cheaper [[perceptualDuplicateStats]]
    * rung anyway — run the ladder in order (exact md5 → dhash stats →
    * this) and the cap rarely bites. With the guard on, the hash frame
    * is checkpointed (16 bytes/asset) so the hot-key census does not
    * re-scan the payloads.
    */
  def perceptualNearDuplicates(media: DataFrame, maxHamming: Int = 3,
                               bands: Int = 4, maxBlock: Int = 0): DataFrame =
    bandedHammingPairs(perceptualHash(media), "media_id", maxHamming,
      bands, maxBlock)

  /** ONE copy of the banded-blocking pipeline serving both the
    * asset-level and class-level operators: band the 64-bit hashes of
    * `hashed` (an (`idCol`, dhash) frame), optionally skip hot blocks,
    * pair within equal (band, key), verify exact hamming. With the
    * guard on, `hashed` is checkpointed (16 bytes/row) so the hot-key
    * census and the pairing join share one upstream computation — for
    * the asset operator that upstream is the payload hash SCAN, which
    * must not run twice.
    */
  private def bandedHammingPairs(hashed0: DataFrame, idCol: String,
                                 maxHamming: Int, bands: Int,
                                 maxBlock: Int): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    require(maxHamming < 64, s"maxHamming $maxHamming is the whole hash")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val h = if (maxBlock <= 0) hashed0 else hashed0.localCheckpoint(true)
    val banded0 = h.select(col(idCol), col("dhash"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("dhash"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "key")))
    val banded =
      if (maxBlock <= 0) banded0
      else {
        // hot-key census: map-side partial agg → (band, key, n) is tiny;
        // the over-cap set is heavy-hitter-sized and broadcast anti-joins
        val hot = banded0.groupBy("band", "key")
          .agg(count(lit(1)).as("__bn")).where(col("__bn") > maxBlock)
          .select("band", "key")
        banded0.join(broadcast(hot), Seq("band", "key"), "left_anti")
      }
    val a = banded.select(col("band"), col("key"),
      col(idCol).as("id_a"), col("dhash").as("ha"))
    val b = banded.select(col("band"), col("key"),
      col(idCol).as("id_b"), col("dhash").as("hb"))
    a.join(b, Seq("band", "key")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The corpus-scale composition of the perceptual rung: near-dup
    * edges between HASH CLASSES, not assets. Identical-hash mass is
    * [[perceptualDuplicateStats]]'s job (linear groupBy), and pairing
    * assets directly explodes exactly when that mass is large —
    * measured at 5M assets sharing 32k distinct hashes: 1.6×10¹⁰
    * asset-level candidate pairs vs ~10⁵ class-level ones through the
    * same banded blocking. Each class is represented by its min
    * media_id; output (id_a, id_b, hamming) pairs the representatives
    * (id_a < id_b by construction of the representative choice —
    * classes expand by joining [[perceptualHash]] on the hashes). Same
    * pigeonhole guarantee as [[perceptualNearDuplicates]] (over
    * classes), same optional `maxBlock` hot-block guard for the
    * all-distinct-hash regime where classes ARE assets.
    */
  def perceptualNearDuplicateClasses(media: DataFrame, maxHamming: Int = 3,
                                     bands: Int = 4,
                                     maxBlock: Int = 0): DataFrame =
    bandedHammingPairs(
      perceptualHash(media).groupBy("dhash")
        .agg(min("media_id").as("rep_id")),
      "rep_id", maxHamming, bands, maxBlock)

  /** Duplicate stats keyed on the perceptual hash — the rung between
    * exact payload md5 ([[mediaDuplicateStats]]) and embedding cosine
    * ([[mediaNearDuplicates]]) in the LAION-style dedup ladder: catches
    * lossless re-encodes and resizes that byte hashing cannot, cheaper
    * than pairwise cosine (an 8-byte groupBy key, the J1/A11 partial-agg
    * shape).
    */
  def perceptualDuplicateStats(media: DataFrame): DataFrame =
    Dedup.duplicateStats(perceptualHash(media), col("dhash"))

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

  /** Feature-space near-duplicates: decode → luma-histogram embedding →
    * pairwise cosine ≥ threshold via [[Similarity.cosineNearDuplicates]] —
    * catches re-encodes and resizes that byte hashing cannot (the
    * histogram is resolution-invariant by construction). At billion-asset
    * scale compose with IVF bucketing exactly like text SemDeDup.
    */
  def mediaNearDuplicates(media: DataFrame, threshold: Double): DataFrame =
    Similarity.cosineNearDuplicates(
      extractFeatures(media).select(col("media_id"), col("feature")),
      "media_id", "feature", threshold)
}
