package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `array_mode_count(a)`: occurrence count of the most frequent element
  * of a string array, as a native Catalyst expression with whole-stage
  * codegen.
  *
  * This exists for the intra-doc repetition metric (q67/q72): "how often
  * does the most repeated bigram occur?" The composable alternatives are
  * both wrong at some scale:
  *  - explode → groupBy(doc, gram) → groupBy(doc) max: two shuffle
  *    stages whose first carries one row per DISTINCT (doc, gram) — fine,
  *    but it turns a per-row property into a cluster-wide aggregation;
  *  - an array-HOF fold counting each distinct element's occurrences is
  *    O(n²) per row — quadratic in document length.
  * This expression is one O(n) pass per row with a per-row hash map whose
  * size is bounded by the doc's own vocabulary: the metric stays a pure
  * projection (no exchange at all), which is the shape a per-document
  * quality signal should have at 100 TB.
  *
  * Semantics (pinned, mirroring the explode→count→max composition and
  * the DuckDB `max(c) ... GROUP BY element` oracle):
  *  - empty array -> 0 (no elements, no mode);
  *  - NULL array -> NULL (null-intolerant);
  *  - NULL elements count as a distinct value, like array_intersect's
  *    null handling (and jaccard_sim's).
  */
case class ArrayModeCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_mode_count requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "array_mode_count"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = new java.util.HashMap[Any, Integer]()
    var max = 0
    var i = 0
    while (i < x.numElements()) {
      val e = if (x.isNullAt(i)) null else x.getUTF8String(i)
      val c = m.get(e)
      val n = if (c == null) 1 else c.intValue() + 1
      m.put(e, n)
      if (n > max) max = n
      i += 1
    }
    max
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val e = ctx.freshName("e")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val max = ctx.freshName("max")
      s"""
        java.util.HashMap $m = new java.util.HashMap();
        int $max = 0;
        for (int $i = 0; $i < $a.numElements(); $i++) {
          Object $e = $a.isNullAt($i) ? null : $a.getUTF8String($i);
          Integer $c = (Integer) $m.get($e);
          int $n = ($c == null) ? 1 : $c.intValue() + 1;
          $m.put($e, java.lang.Integer.valueOf($n));
          if ($n > $max) $max = $n;
        }
        ${ev.value} = $max;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayModeCount =
    copy(child = newChild)
}
