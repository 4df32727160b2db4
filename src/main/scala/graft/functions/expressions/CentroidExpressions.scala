package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid argmax against a BROADCAST centroid table, as one
  * codegen'd scan expression — the IVF assignment kernel.
  *
  * The declarative formulation (`corpus JOIN broadcast(centroids)` then
  * `groupBy(id).agg(max_by(...), first(vec))`) expands every row into
  * |centroids| joined rows and, worse, SHUFFLES the whole corpus — unit
  * vectors included — through the re-grouping aggregate. At 100 TB that
  * shuffle IS the assignment's cost; this expression computes the same
  * argmax per row inside the scan projection, so an IVF assignment plan
  * is a pure narrow projection with ZERO shuffle at any corpus size.
  *
  * Semantics mirror the aggregate it replaces exactly (and the DuckDB
  * oracle replay `row_number() OVER (ORDER BY d DESC, centroid_id)`):
  * centroids are probed in ascending id order with a strict `>`
  * comparison, so ties take the LOWEST centroid id; per-centroid dot
  * products use [[Vec.dot]]'s sequential arithmetic (bit-identical to the
  * join formulation); a centroid whose dot is null (dimension mismatch)
  * is skipped, matching max_by's null-smallest ordering. Output is
  * `struct<bucket: long, csim: double>`; null when the input vector is
  * null (a zero/NaN vector — no direction) or no centroid yields a
  * comparable similarity.
  *
  * `centIds` MUST be sorted ascending with `centVecs` aligned; equality /
  * canonicalization key on the broadcast id (the [[LongSetContains]]
  * pattern).
  */
case class BestCentroid(child: Expression,
                        centIds: org.apache.spark.broadcast.Broadcast[Array[Long]],
                        centVecs: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_best_centroid needs an array<double> vector, got ${other.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_best_centroid"

  def best(vec: ArrayData): InternalRow = {
    val ids = centIds.value
    val vecs = centVecs.value
    val n = vec.numElements()
    var bestI = -1
    var bestD = Double.NegativeInfinity
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      if (cv.length == n) {
        var i = 0
        var s = 0.0
        var ok = true
        while (ok && i < n) {
          if (vec.isNullAt(i)) ok = false
          else { s += vec.getDouble(i) * cv(i); i += 1 }
        }
        if (ok && s > bestD) { bestD = s; bestI = c }
      }
      c += 1
    }
    if (bestI < 0) null
    else new GenericInternalRow(Array[Any](ids(bestI), bestD))
  }

  protected override def nullSafeEval(input: Any): Any =
    best(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bestCentroid", this, classOf[BestCentroid].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("bestRow")
      s"""
         |InternalRow $r = $ref.best($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override def equals(other: Any): Boolean = other match {
    case e: BestCentroid =>
      (this eq e) || (child == e.child && centIds.id == e.centIds.id &&
        centVecs.id == e.centVecs.id)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[BestCentroid], child,
      java.lang.Long.valueOf(centIds.id), java.lang.Long.valueOf(centVecs.id))

  protected override def withNewChildInternal(newChild: Expression): BestCentroid =
    copy(child = newChild)
}
