package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** P15: URL liveness probing (reference wimbd/link_exists/map_count.py:7-36
  * HTTP-GETs every url). Side-effecting I/O is deliberately outside
  * Catalyst: a mapPartitions pass with a pluggable prober so connections are
  * reused per partition and the engine never embeds network calls in an
  * optimizable expression. Zero-egress environments (like this one) inject a
  * deterministic stub prober; production injects an HTTP HEAD/GET client.
  */
object LinkProbe {

  val outSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("exists", BooleanType)))

  /** Deterministic offline prober: syntactic validity check only. */
  val stubProber: String => Boolean = url =>
    url != null && url.matches("^https?://[^/\\s]+\\.[^/\\s]+(/.*)?$")

  /** Probe each url once per partition-local prober instance.
    * `mkProber` is created per partition (connection pooling point).
    */
  def probe(df: DataFrame, urlCol: String,
            mkProber: () => (String => Boolean) = () => stubProber): DataFrame = {
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(urlCol).mapPartitions { rows =>
      val prober = mkProber() // one client per partition, like the
                              // reference's per-process session reuse
      rows.map { r =>
        val url = r.getString(0)
        Row(url, prober(url))
      }
    }(enc)
  }
}
