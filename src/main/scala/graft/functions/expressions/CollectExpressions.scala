package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, MapType}

/** `collect_set` with a hard cap on the number of DISTINCT elements held
  * per group — the single-pass skew guard for LSH band buckets.
  *
  * Motivation (MinHash.candidatesFromSignatures): a degenerate boilerplate
  * bucket with millions of members must be DISCARDED by the `maxBucket`
  * size filter, but plain `collect_set` materializes its full id set in
  * one aggregation buffer before the filter ever sees it. Pre-sizing the
  * buckets with a separate count pass keeps the buffers bounded but costs
  * a second shuffle over the band rows. This aggregate bounds the buffer
  * DURING collection instead: once a group holds `cap` distinct elements,
  * further distinct elements are dropped — both in `update` and in
  * partial-buffer `merge`, so no buffer (map-side or reduce-side) ever
  * exceeds `cap` entries.
  *
  * Contract: groups with ≤ `cap - 1` distinct elements return their exact,
  * complete set; a group returning exactly `cap` elements MAY be
  * saturated (true cardinality ≥ cap) and its retained subset is
  * arrival-order-dependent — callers must treat size == cap as "too big"
  * and discard (pass cap = threshold + 1). Nulls are skipped, as in
  * `collect_set`.
  */
case class BoundedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.HashSet[Any]] with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be positive, got $cap")

  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case org.apache.spark.sql.types.ArrayType(et, _) => containsMap(et)
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!containsMap(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot collect map-typed data")

  override def createAggregationBuffer(): mutable.HashSet[Any] = mutable.HashSet.empty

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(buffer: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    val value = child.eval(input)
    if (value != null && buffer.size < cap) buffer += convertToBufferElement(value)
    buffer
  }

  override def merge(buffer: mutable.HashSet[Any],
                     other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (buffer.size < cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.HashSet[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  override def prettyName: String = "graft_bounded_collect_set"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BoundedCollectSet =
    copy(child = newChild)
}
