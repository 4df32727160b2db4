package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "hello world"), (2L, ""), (3L, "spark at scale")).toDF("id", "txt"),
    "id", "txt")

  test("fromText produces the canonical media schema") {
    assert(media.schema.fieldNames.toSeq === Multimodal.mediaSchema.fieldNames.toSeq)
  }

  test("feature extraction: deterministic fallback features with real batch shape") {
    val f = Multimodal.extractFeatures(media).collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(f(1L).getAs[Long]("n_bytes") === 11L)
    assert(f(2L).getAs[Long]("n_bytes") === 0L)
    def feat(r: org.apache.spark.sql.Row): Seq[Float] = r.getSeq[Float](r.fieldIndex("feature"))
    assert(feat(f(1L)).length === 16)
    assert(math.abs(feat(f(1L)).sum - 1.0f) < 1e-5)
    // determinism
    val again = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> feat(r)).toMap
    assert(again(3L) === feat(f(3L)))
  }

  test("format sniffing recognizes magic bytes") {
    assert(Multimodal.sniffFormat(Array(0xff.toByte, 0xd8.toByte, 0x00)) === "jpeg")
    assert(Multimodal.sniffFormat(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)) === "png")
    assert(Multimodal.sniffFormat("GIF89a".getBytes) === "gif")
    assert(Multimodal.sniffFormat("BM1234".getBytes) === "bmp")
    assert(Multimodal.sniffFormat("hello".getBytes) === "unknown")
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** left half black, right half white — block pattern so every render
    * resolution yields the identical luma histogram
    */
  private def flagImage(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    pngBytes(img)
  }

  test("real imageio decode: exact dims + normalized luma histogram") {
    import spark.implicits._
    val media = Seq((1L, Multimodal.tinyPngFixture), (2L, flagImage(8, 4)))
      .toDF("media_id", "data")
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getString(1) === "png")
    assert(f(1L).getInt(3) === 8 && f(1L).getInt(4) === 5)
    val feat1 = f(1L).getSeq[Float](5)
    assert(feat1.length === 16 && math.abs(feat1.sum - 1.0f) < 1e-5)
    // the flag image: half the mass in luma bucket 0, half in bucket 15
    val feat2 = f(2L).getSeq[Float](5)
    assert(feat2(0) === 0.5f && feat2(15) === 0.5f)
  }

  test("hostile payloads: corrupt image and decompression-bomb header stay bounded") {
    import spark.implicits._
    // PNG magic followed by garbage: ImageIO throws (not always an
    // IOException) — must fall back, not kill the task
    val corrupt = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte) ++
      Array.fill[Byte](32)(0x41)
    // valid signature + IHDR (correct CRC) declaring 16384×16384 = 268M
    // pixels: the header parses, but pixel decode must be refused by the
    // MaxDecodePixels cap before any raster allocation
    val bomb = pngHeaderOnly(16384, 16384)
    val out = Multimodal.extractFeatures(
        Seq((1L, corrupt), (2L, bomb)).toDF("media_id", "data"))
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getString(1) === "png")
      // 0×0 dims = the deterministic byte-histogram fallback ran
      assert(out(id).getInt(3) === 0 && out(id).getInt(4) === 0)
      val feat = out(id).getSeq[Float](5)
      assert(feat.length === 16 && math.abs(feat.sum - 1.0f) < 1e-4)
    }
  }

  private def pngHeaderOnly(w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val chunk = ihdr.array()
    val crc = new java.util.zip.CRC32()
    crc.update(chunk)
    bos.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
    bos.write(chunk)
    bos.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    bos.toByteArray
  }

  test("near-dup catches the same image re-rendered at another resolution") {
    import spark.implicits._
    val media = Seq(
      (1L, "image/png", flagImage(8, 4), Map.empty[String, String]),
      (2L, "image/png", flagImage(64, 32), Map.empty[String, String]),
      (3L, "text/plain", "zzzz zzzz".getBytes("UTF-8"), Map.empty[String, String]))
      .toDF("media_id", "media_type", "data", "meta")
    val pairs = Multimodal.mediaNearDuplicates(media, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("frame sampling chunks the payload and keeps every nth") {
    val frames = Multimodal.sampleFrames(media.where(col("media_id") === 3), chunkBytes = 4, everyNth = 2)
      .collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2))
  }

  test("media dedup ladder: exact payload hash + feature-space near-dup") {
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((1L, "aaaa bbbb"), (2L, "aaaa bbbb"), (3L, "zzzz")).toDF("id", "text"),
      "id", "text")
    val stats = Multimodal.mediaDuplicateStats(media).head()
    assert(stats.getLong(0) === 2L && stats.getLong(1) === 3L) // 2 dup of 3
    assert(Multimodal.mediaKeepFirst(media).select("media_id")
      .as[Long].collect().toSet === Set(1L, 3L))
    // identical payloads have identical stub embeddings (cos 1); the
    // disjoint-byte payload shares no histogram mass with them
    val pairs = Multimodal.mediaNearDuplicates(media, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("resize plan preserves aspect, never upscales, passes 0x0 through") {
    import spark.implicits._
    val dims = Seq((1L, 1600, 800), (2L, 100, 50), (3L, 0, 0), (4L, 200, 800))
      .toDF("media_id", "width", "height")
    val out = Multimodal.resizePlan(dims, maxW = 400, maxH = 400)
      .orderBy("media_id")
      .select("out_width", "out_height").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(out === Seq((400, 200), (100, 50), (0, 0), (100, 400)))
  }

  /** Diagonal brightness gradient — smooth pattern whose 8x9 cell means
    * are resolution-invariant up to boundary rounding, exercising the
    * dHash image arm's perceptual property.
    */
  private def gradientImage(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = ((x * 255 / w) + (y * 255 / h)) / 2
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    pngBytes(img)
  }

  test("dHash: byte arm replays the SQL grid exactly; golden values pinned") {
    // the same vectors the m_dhash_dup oracle prototype was checked on —
    // pinned so the byte-grid arithmetic (pos*72/len cell mapping, mean
    // byte, strict right>left bits, bit 63 sign) can never drift
    def h(t: String) = Multimodal.dHashOf(t.getBytes("UTF-8"))
    assert(h("hello world this is a test of the perceptual hash machinery")
      === 7729961830188487786L)
    assert(h("zzzz " * 40) === 5353172790017673802L)
    assert(h("ab" * 200) === -3689348814741910324L) // bit-63 case
    assert(h("a") === 0L)
    assert(h("") === 0L)
    // perceptual, not avalanche: one byte changed in the middle touches
    // at most two grid cells -> at most 4 comparison bits
    val base = ("x" * 100 + "m" + "y" * 100).getBytes("UTF-8")
    val flip = ("x" * 100 + "Q" + "y" * 100).getBytes("UTF-8")
    val dist = java.lang.Long.bitCount(
      Multimodal.dHashOf(base) ^ Multimodal.dHashOf(flip))
    assert(dist <= 4, s"one-byte change moved $dist bits")
  }

  test("dHash image arm: deterministic, resolution-invariant, distinct from the byte arm") {
    val small = gradientImage(64, 48)
    val small2 = gradientImage(64, 48)
    val big = gradientImage(128, 96)
    val hSmall = Multimodal.dHashOf(small)
    // lossless PNG: identical raster -> identical hash
    assert(hSmall === Multimodal.dHashOf(small2))
    // the image arm actually ran (a byte-grid hash of the compressed PNG
    // stream would be unrelated to the raster)
    assert(Multimodal.perceptualHash(
      { import spark.implicits._
        Seq((1L, small)).toDF("media_id", "data") })
      .head().getLong(1) === hSmall)
    // the SAME picture at 2x resolution: near-identical cell means ->
    // small hamming distance (boundary rounding may flip a few bits)
    val dist = java.lang.Long.bitCount(hSmall ^ Multimodal.dHashOf(big))
    assert(dist <= 6, s"2x re-render moved $dist bits")
    // and a DIFFERENT picture is far away (flag vs gradient)
    val far = java.lang.Long.bitCount(
      hSmall ^ Multimodal.dHashOf(flagImage(64, 48)))
    assert(far > 16, s"distinct images only $far bits apart")
    // undecodable / smaller-than-grid images fall back to the byte arm
    assert(Multimodal.dHashOf(Multimodal.tinyPngFixture) ===
      Multimodal.dHashOf(Multimodal.tinyPngFixture))
  }

  test("perceptual near-dup: banded blocking finds exactly the brute-force pairs") {
    import spark.implicits._
    // payloads engineered for a mixed pairwise-hamming spectrum: one
    // exact twin (hamming 0), in-place single-char flips (small), and a
    // reversed pattern (far) — the operator must return EXACTLY the
    // brute-force pairs within the radius (pigeonhole: 4 bands catch
    // every pair within 3 bits), and none beyond it
    val base = "x" * 120 + "y" * 120
    val payloads: Seq[(Long, Array[Byte])] = Seq(
      0L -> base,
      1L -> base, // exact twin
      2L -> (base.substring(0, 60) + "Q" + base.substring(61)),
      3L -> (base.substring(0, 180) + "Q" + base.substring(181)),
      4L -> ("az" * 8 + "zzzz") * 12, // far (measured hamming ~36 from base)
      5L -> (0 until 240).map(i => ('a' + (i * 7) % 26).toChar).mkString
    ).map { case (i, t) => (i, t.getBytes("UTF-8")) }
    val expected = (for {
      (ia, ba) <- payloads; (ib, bb) <- payloads if ia < ib
      h = java.lang.Long.bitCount(
        Multimodal.dHashOf(ba) ^ Multimodal.dHashOf(bb))
      if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(expected.nonEmpty)
    // …and the spectrum really has excluded pairs (far side exercised)
    assert(expected.size < payloads.size * (payloads.size - 1) / 2)
    val df = payloads.toDF("media_id", "data")
    val got = Multimodal.perceptualNearDuplicates(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("perceptual near-dup classes: one edge per distinct-hash pair, reps = min ids") {
    import spark.implicits._
    // two identical-hash groups G0 (ids 0,1,2) and G1 (ids 10,11) whose
    // hashes are 1 bit apart, plus a far payload: asset-level pairing
    // yields 3+1+6 within/cross pairs; CLASS-level pairing yields exactly
    // one edge between the two groups' representatives (0, 10)
    val near = "x" * 120 + "y" * 120
    // single-char in-place flip: moves one grid cell mean → small hamming
    val nearTwin = near.substring(0, 60) + "Q" + near.substring(61)
    val far = (0 until 240).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val rows: Seq[(Long, Array[Byte])] = Seq(
      0L -> near, 1L -> near, 2L -> near,
      10L -> nearTwin, 11L -> nearTwin,
      20L -> far).map { case (i, t) => (i, t.getBytes("UTF-8")) }
    val hNear = Multimodal.dHashOf(near.getBytes("UTF-8"))
    val hTwin = Multimodal.dHashOf(nearTwin.getBytes("UTF-8"))
    val d = java.lang.Long.bitCount(hNear ^ hTwin)
    assert(d >= 1 && d <= 3, s"fixture hamming $d out of the radius")
    val df = rows.toDF("media_id", "data")
    val got = Multimodal.perceptualNearDuplicateClasses(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 10L, d.toLong)),
      s"expected one class edge (0,10,$d), got $got")
    // the asset-level operator on the same rows pairs within groups too
    val assets = Multimodal.perceptualNearDuplicates(df, maxHamming = 3)
      .count()
    assert(assets === 10L) // C(3,2) + C(2,2->1) + 3*2 cross = 3+1+6
  }

  test("perceptual near-dup hot-block guard: skips heavy-hitter blocks, keeps normal pairs") {
    import spark.implicits._
    // a heavy hitter: 50 byte-identical payloads (one dhash → every band
    // key shared → 1225 quadratic pairs), plus one normal near-pair far
    // from the hitter. With maxBlock below the hitter's 50, all four of
    // its bands are over-cap so its pairs vanish; the normal pair's
    // blocks stay under cap and survive — the documented approximation
    // ("lost only if EVERY shared band is hot").
    val hot = "x" * 120 + "y" * 120
    val norm = (0 until 240).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val normTwin = norm.substring(0, 60) + norm.charAt(60) + norm.substring(61)
    val rows: Seq[(Long, Array[Byte])] =
      (0L until 50L).map(i => i -> hot.getBytes("UTF-8")) ++
        Seq(100L -> norm.getBytes("UTF-8"),
          101L -> normTwin.getBytes("UTF-8"))
    // the "twin" here is byte-identical (substring splice) — hamming 0,
    // a normal two-row block in every band
    val df = rows.toDF("media_id", "data")
    val unguarded = Multimodal.perceptualNearDuplicates(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.contains((100L, 101L)))
    assert(unguarded.count { case (a, b) => a < 50 && b < 50 } === 49 * 50 / 2)
    val guarded = Multimodal.perceptualNearDuplicates(df, maxHamming = 3,
      maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded === Set((100L, 101L)),
      s"guard must keep exactly the normal pair, got $guarded")
    // cap above every block size = exact (guard engaged, nothing hot)
    val wide = Multimodal.perceptualNearDuplicates(df, maxHamming = 3,
      maxBlock = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide === unguarded)
  }
}
