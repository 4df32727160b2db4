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

/** Two-level nearest-centroid argmax — the coarse-quantizer composition
  * of [[BestCentroid]] for centroid tables too large to probe flat
  * (probing C centroids per row is the flat kernel's cost driver at
  * C ≫ 10⁴; this probes ~`coarseProbes`·√C): rank the `coarseIds`
  * cells by dot product, take the top `coarseProbes` cells, then argmax
  * over only THOSE cells' fine centroids (`fineIds`/`fineVecs`, grouped
  * contiguously with `cellOffsets(i)..cellOffsets(i+1)` holding coarse
  * cell i's members).
  *
  * Deterministic: coarse ties rank the lower-INDEX cell first (cells are
  * built in ascending coarse-id order), fine ties take the LOWEST fine
  * id regardless of probe order, per-pair dots are sequential — so with
  * `coarseProbes >= |coarse|` the result is bit-identical to the flat
  * [[BestCentroid]] over the same fine table (spec-pinned); smaller
  * probe counts trade recall for the √C probe cost, the standard IVF
  * coarse-quantizer deal. NULL input (no direction) returns NULL.
  */
case class BestCentroidNested(child: Expression,
                              coarseVecs: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
                              cellOffsets: org.apache.spark.broadcast.Broadcast[Array[Int]],
                              fineIds: org.apache.spark.broadcast.Broadcast[Array[Long]],
                              fineVecs: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
                              coarseProbes: Int)
    extends UnaryExpression {
  require(coarseProbes >= 1, s"need at least one coarse probe, got $coarseProbes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_best_centroid_nested needs an array<double> vector, got ${other.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_best_centroid_nested"

  private def dotOrNaN(vec: ArrayData, cv: Array[Double], n: Int): Double = {
    if (cv.length != n) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return Double.NaN
      s += vec.getDouble(i) * cv(i)
      i += 1
    }
    s
  }

  def best(vec: ArrayData): InternalRow = {
    val cvs = coarseVecs.value
    val offs = cellOffsets.value
    val fids = fineIds.value
    val fvs = fineVecs.value
    val n = vec.numElements()
    val p = math.min(coarseProbes, cvs.length)
    // top-p coarse cells by dot, ties to the lower cell index: a small
    // insertion-ranked selection (p is single digits in practice)
    val topIdx = new Array[Int](p)
    val topSim = new Array[Double](p)
    var filled = 0
    var c = 0
    while (c < cvs.length) {
      val s = dotOrNaN(vec, cvs(c), n)
      if (!s.isNaN) {
        // strictly-greater insertion keeps earlier (lower-index) cells
        // ahead on ties
        var pos = filled
        while (pos > 0 && s > topSim(pos - 1)) pos -= 1
        if (pos < p) {
          val last = math.min(filled, p - 1)
          var j = last
          while (j > pos) { topIdx(j) = topIdx(j - 1); topSim(j) = topSim(j - 1); j -= 1 }
          topIdx(pos) = c; topSim(pos) = s
          if (filled < p) filled += 1
        }
      }
      c += 1
    }
    var bestId = 0L
    var bestD = Double.NegativeInfinity
    var found = false
    var t = 0
    while (t < filled) {
      val cell = topIdx(t)
      var f = offs(cell)
      val end = offs(cell + 1)
      while (f < end) {
        val s = dotOrNaN(vec, fvs(f), n)
        if (!s.isNaN &&
          (s > bestD || (s == bestD && found && fids(f) < bestId))) {
          bestD = s; bestId = fids(f); found = true
        }
        f += 1
      }
      t += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestId, bestD))
  }

  protected override def nullSafeEval(input: Any): Any =
    best(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bestCentroidNested", this,
      classOf[BestCentroidNested].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("bestNestedRow")
      s"""
         |InternalRow $r = $ref.best($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override def equals(other: Any): Boolean = other match {
    case e: BestCentroidNested =>
      (this eq e) || (child == e.child && coarseProbes == e.coarseProbes &&
        coarseVecs.id == e.coarseVecs.id && cellOffsets.id == e.cellOffsets.id &&
        fineIds.id == e.fineIds.id && fineVecs.id == e.fineVecs.id)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[BestCentroidNested], child,
      Integer.valueOf(coarseProbes), java.lang.Long.valueOf(fineIds.id))

  protected override def withNewChildInternal(newChild: Expression): BestCentroidNested =
    copy(child = newChild)
}

/** Top-`p` centroids by cosine against a BROADCAST centroid table, as one
  * codegen'd scan expression — the query-side IVF PROBE kernel (r14).
  *
  * The declarative formulation (`queries JOIN broadcast(centroids)` then
  * `row_number() OVER (PARTITION BY query_id ORDER BY csim DESC,
  * centroid_id) <= nprobe`) expands every query into |centroids| rows and
  * SHUFFLES all Q×C of them through the window sort just to keep nprobe
  * per query — at a 10k-query × 10k-centroid batch that is 10⁸ rows of
  * pure probe-selection traffic. This expression computes the same top-p
  * selection per row inside the scan projection: probing becomes
  * `explode(graft_top_centroids(qv))`, a narrow plan with ZERO shuffle.
  *
  * Semantics mirror the window it replaces exactly: selection order is
  * (csim DESC, centroid_id ASC) — implemented as a strictly-greater
  * insertion rank over the ascending-id centroid array, the
  * [[BestCentroidNested]] coarse-stage selection — and a centroid whose
  * dot is incomparable (dimension mismatch / null element) is skipped,
  * matching the window's NULLS LAST ordering dropping it from the top-p
  * whenever ≥ p comparable centroids exist. Output is
  * `array<struct<bucket: long, csim: double>>` in rank order (the
  * exploded position IS the probe rank); null when the input vector is
  * null, EMPTY when no centroid is comparable — both explode to zero
  * probe rows, exactly the rows the window formulation's downstream
  * null-cos filter would discard.
  *
  * `centIds` MUST be sorted ascending with `centVecs` aligned.
  */
case class TopCentroids(child: Expression,
                        centIds: org.apache.spark.broadcast.Broadcast[Array[Long]],
                        centVecs: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
                        p: Int)
    extends UnaryExpression {
  require(p >= 1, s"need at least one probe, got $p")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_top_centroids needs an array<double> vector, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_centroids"

  def top(vec: ArrayData): ArrayData = {
    val ids = centIds.value
    val vecs = centVecs.value
    val n = vec.numElements()
    val cap = math.min(p, ids.length)
    val topIdx = new Array[Int](cap)
    val topSim = new Array[Double](cap)
    var filled = 0
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      if (cv.length == n) {
        var s = 0.0
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (vec.isNullAt(i)) ok = false
          else { s += vec.getDouble(i) * cv(i); i += 1 }
        }
        if (ok) {
          // strictly-greater insertion keeps earlier (lower-id) centroids
          // ahead on ties — the window's (csim DESC, centroid_id ASC)
          var pos = filled
          while (pos > 0 && s > topSim(pos - 1)) pos -= 1
          if (pos < cap) {
            val last = math.min(filled, cap - 1)
            var j = last
            while (j > pos) { topIdx(j) = topIdx(j - 1); topSim(j) = topSim(j - 1); j -= 1 }
            topIdx(pos) = c; topSim(pos) = s
            if (filled < cap) filled += 1
          }
        }
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var t = 0
    while (t < filled) {
      out(t) = new GenericInternalRow(Array[Any](ids(topIdx(t)), topSim(t)))
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  protected override def nullSafeEval(input: Any): Any =
    top(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCentroids", this, classOf[TopCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.top($c);")
  }

  override def equals(other: Any): Boolean = other match {
    case e: TopCentroids =>
      (this eq e) || (child == e.child && p == e.p &&
        centIds.id == e.centIds.id && centVecs.id == e.centVecs.id)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[TopCentroids], child, Integer.valueOf(p),
      java.lang.Long.valueOf(centIds.id))

  protected override def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}
