package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style per-document repetition signals (Rae et al. 2021, §A1.1 —
  * the standard pretraining quality filters), computed in ONE pass per doc
  * inside the scan, no explode and no shuffle:
  *
  *   [0] dup_line_frac        — fraction of '\n'-lines that repeat an
  *                              earlier line
  *   [1] dup_line_char_frac   — fraction of line characters in those
  *                              repeats
  *   [2..4] top{2,3,4}gram_char_frac — chars of the most frequent n-gram
  *                              (count × gram length; ties → smallest gram)
  *                              over total doc chars
  *   [5..10] dup{5..10}gram_char_frac — occurrence chars (count × length)
  *                              of n-grams appearing ≥ 2 times over total
  *                              doc chars (occurrence-based, so values may
  *                              exceed 1 on degenerate all-repeat docs)
  *
  * Tokens are space-split (empties kept), matching DuckDB's
  * `string_split(text, ' ')` so the whole contract is oracle-checkable.
  */
object RepetitionKernel {

  private def gramCounts(toks: Array[String], n: Int): java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        m.merge(sb.toString, 1, (a, b) => a + b)
        i += 1
      }
    }
    m
  }

  /** Code-point count, matching DuckDB/reference `length()` semantics (not
    * UTF-16 units — astral-plane chars like emoji count once).
    */
  private def cp(s: String): Int = s.codePointCount(0, s.length)

  def signals(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new Array[Any](11)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Double.valueOf(0.0))
    val chars = cp(s).toDouble
    if (chars > 0) {
      // lines
      val lines = s.split("\n", -1)
      val seen = new java.util.HashSet[String]()
      var dupLines = 0
      var dupLineChars = 0L
      var lineChars = 0L
      for (l <- lines) {
        val n = cp(l)
        lineChars += n
        if (!seen.add(l)) { dupLines += 1; dupLineChars += n }
      }
      out(0) = (dupLines.toDouble / lines.length)
      out(1) = (if (lineChars > 0) dupLineChars.toDouble / lineChars else 0.0)
      // n-grams
      val toks = s.split(" ", -1)
      var n = 2
      while (n <= 10) {
        val counts = gramCounts(toks, n)
        if (n <= 4) {
          var bestC = 0
          var bestG: String = null
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue > bestC ||
              (e.getValue == bestC && bestC > 0 && e.getKey.compareTo(bestG) < 0)) {
              bestC = e.getValue; bestG = e.getKey
            }
          }
          out(n) = (if (bestC > 0) bestC.toLong * cp(bestG) / chars else 0.0)
        } else {
          var dupChars = 0L
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue >= 2) dupChars += e.getValue.toLong * cp(e.getKey)
          }
          out(n) = (dupChars / chars)
        }
        n += 1
      }
    }
    new GenericArrayData(out)
  }
}

case class RepetitionSignals(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition needs string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_repetition"

  protected override def nullSafeEval(text: Any): Any =
    RepetitionKernel.signals(text.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.RepetitionKernel.signals($t)")

  protected override def withNewChildInternal(c: Expression): RepetitionSignals =
    copy(child = c)
}
