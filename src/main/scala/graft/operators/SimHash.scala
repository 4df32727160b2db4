package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting: per bit j, sum ±1 votes from every
  * token's hash bit j; the sign pattern is the fingerprint. Near-dups have
  * small Hamming distance between fingerprints.
  *
  * The bit source is pluggable like MinHash's hash strategy:
  * [[xxhashBit]] (64-bit production default, pure long arithmetic) or
  * [[md5HexBit]] (≤32 bits, portable to any SQL engine for oracles).
  */
object SimHash {

  /** (token column, bit index) → ±1 vote column. */
  type BitFn = (Column, Int) => Column

  val xxhashBit: BitFn = (c, j) =>
    (shiftright(xxhash64(c), j).bitwiseAND(lit(1L)) * 2 - 1).cast("long")

  /** High bit of the j-th hex digit of md5 (digit ∈ 8..f ⇒ +1). */
  val md5HexBit: BitFn = (c, j) =>
    when(substring(md5(c), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
      .otherwise(-1L)

  /** Fingerprint as an nBits-char '0'/'1' string per doc (string form keeps
    * it portable; [[simhash64]] packs to a long).
    *
    * The two standard bit sources run INLINE — one codegen'd expression per
    * doc ([[graft.functions.expressions.SimHashFingerprint]], bit-identical
    * to the explode+sum formulation), so fingerprinting is a scan-fused
    * projection with no shuffle. A custom [[BitFn]] falls back to
    * explode + nBits sum aggregates.
    */
  def simhashBitString(docs: DataFrame, idCol: String, textCol: String,
                       nBits: Int, bit: BitFn = xxhashBit): DataFrame = {
    if ((bit eq xxhashBit) || (bit eq md5HexBit)) {
      val sig = org.apache.spark.sql.graft.Bridge.column(
        graft.functions.expressions.SimHashFingerprint(
          org.apache.spark.sql.graft.Bridge.expression(split(col(textCol), " ")),
          nBits, md5Parity = bit eq md5HexBit))
      // null-text docs emit no exploded rows in the groupBy formulation —
      // match that by dropping their null fingerprints
      return graft.Par.fanOut(docs).select(col(idCol).as("id"), sig.as("simhash"))
        .where(col("simhash").isNotNull)
    }
    val toks = graft.Par.fanOut(docs)
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
    val sums = toks.groupBy("id")
      .agg(sum(bit(col("w"), 0)).as("s0"),
        (1 until nBits).map(j => sum(bit(col("w"), j)).as(s"s$j")): _*)
    sums.select(col("id"),
      concat((0 until nBits).map(j => when(col(s"s$j") > 0, "1").otherwise("0")): _*)
        .as("simhash"))
  }

  /** 64-bit packed fingerprint (xxhash bit source). */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bits = simhashBitString(docs, idCol, textCol, 64, xxhashBit)
    bits.select(col("id"), conv(col("simhash"), 2, 10).cast("decimal(20,0)").as("simhash64"))
  }

  /** Near-dup pairs by Hamming distance ≤ maxHamming over the packed
    * fingerprint, using the pigeonhole band trick: split the bit string into
    * maxHamming+1 chunks — any pair within budget must agree exactly on at
    * least one chunk, so candidates come from equi-joins on chunks (no n²).
    */
  def nearDuplicates(fingerprints: DataFrame, nBits: Int, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val w = nBits / chunks
    val chunkRows = fingerprints.select(col("id"), col("simhash"),
        explode(array((0 until chunks).map { c =>
          struct(lit(c).as("chunk"), substring(col("simhash"), c * w + 1, w).as("key"))
        }: _*)).as("ck"))
      .select(col("id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val a = chunkRows.select(col("chunk"), col("key"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunkRows.select(col("chunk"), col("key"), col("id").as("id_b"), col("simhash").as("sh_b"))
    val hamming = size(filter(
      zip_with(split(col("sh_a"), ""), split(col("sh_b"), ""), (x, y) => x =!= y),
      x => x))
    a.join(b, Seq("chunk", "key")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming")).distinct()
      .where(col("hamming") <= maxHamming)
  }
}
