package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Surgical span-decontamination rewrite as ONE codegen'd kernel: drop
  * from a token array every token covered by a k-token span whose
  * xxhash64 (seed 42 — bit-identical to the SQL `xxhash64` of the
  * space-joined span string, spec-pinned) is in the BROADCAST sorted
  * benchmark key set; return the survivors re-joined with single spaces.
  *
  * This is the scan-stage form of
  * [[graft.operators.Dedup.removeContaminatedSpans]]'s detection+rebuild:
  * the declarative formulations either shuffle the corpus TEXT through
  * the rewrite join (sort-merge payload — 0.48 GB at the 100× rehearsal)
  * or, expressed as higher-order functions, re-evaluate the span probe
  * per TOKEN once CollapseProject inlines the alias (a wedged rehearsal)
  * / pay interpreted per-element lambda boxing (5× CPU). The kernel runs
  * the whole thing in one tight loop per row: probe each span start,
  * mark covered positions, emit the kept text — zero joins, zero
  * shuffles, whole-stage codegen.
  *
  * Span strings are built with the same `UTF8String.concatWs` as
  * [[graft.functions.Tokenizer.ngramsJoinedUtf8]], so hashes agree with
  * the exploded formulation byte for byte. NULL token arrays return NULL
  * (callers fold to empty text, the concat_ws convention).
  */
case class CoveredSpanRemove(child: Expression, k: Int,
                             sorted: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression {
  require(k >= 1, s"span width must be positive, got $k")

  private val SPACE = UTF8String.fromString(" ")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_covered_span_remove needs array<string> tokens, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_covered_span_remove"

  def rewrite(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val set = sorted.value
    val covered = new Array[Boolean](n)
    if (n >= k && set.length > 0) {
      val window = new Array[UTF8String](k)
      var s = 0
      while (s <= n - k) {
        var j = 0
        while (j < k) { window(j) = toks.getUTF8String(s + j); j += 1 }
        val h = XXH64.hashUTF8String(UTF8String.concatWs(SPACE, window: _*), 42L)
        if (java.util.Arrays.binarySearch(set, h) >= 0) {
          var c = s
          while (c < s + k) { covered(c) = true; c += 1 }
        }
        s += 1
      }
    }
    var cnt = 0
    var i = 0
    while (i < n) { if (!covered(i)) cnt += 1; i += 1 }
    val kept = new Array[UTF8String](cnt)
    var o = 0
    i = 0
    while (i < n) {
      if (!covered(i)) { kept(o) = toks.getUTF8String(i); o += 1 }
      i += 1
    }
    UTF8String.concatWs(SPACE, kept: _*)
  }

  protected override def nullSafeEval(input: Any): Any =
    rewrite(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanRemove", this, classOf[CoveredSpanRemove].getName)
    defineCodeGen(ctx, ev, c => s"$ref.rewrite($c)")
  }

  override def equals(other: Any): Boolean = other match {
    case e: CoveredSpanRemove =>
      (this eq e) || (child == e.child && k == e.k && sorted.id == e.sorted.id)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[CoveredSpanRemove], child,
      Integer.valueOf(k), java.lang.Long.valueOf(sorted.id))

  protected override def withNewChildInternal(newChild: Expression): CoveredSpanRemove =
    copy(child = newChild)
}
