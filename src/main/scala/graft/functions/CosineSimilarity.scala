package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `cosine_sim(a, b)`: cosine similarity of two numeric arrays as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why an Expression and not a UDF (SURVEY.md §7.3 decision table): a Scala
  * UDF boxes both arrays per row and is an optimizer black box; this
  * expression stays inside WholeStageCodegen — the generated loop reads
  * primitive floats/doubles straight out of the columnar batch with zero
  * allocation, which is the difference between memory-bandwidth-bound and
  * GC-bound at 100 TB.
  *
  * Semantics (pinned, and mirrored by the DuckDB oracle SQL):
  *  - floats are widened to double per element; accumulation is a single
  *    ascending-index pass (`dot`, `na`, `nb` in one loop);
  *  - result = dot / (sqrt(na) * sqrt(nb)) — NaN if either norm is 0;
  *  - arrays of different lengths compare over the common prefix;
  *  - NULL array -> NULL (null-intolerant); NULL elements are not
  *    expected (embedding columns are dense) and read as 0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okInput(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okInput(left.dataType) && okInput(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float>/array<double> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getX = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getY = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.$getX($i);
          double $yi = (double) $b.$getY($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-API facade for the graft custom expressions. */
object GraftFunctions {
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def arrayModeCount(a: Column): Column =
    ColumnBridge.column(ArrayModeCount(ColumnBridge.expression(a)))

  def mortonCode(a: Column, b: Column): Column =
    ColumnBridge.column(MortonCode(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nfcNormalize(a: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(a)))

  def minhashAgg(a: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(a), numHashes)
        .toAggregateExpression())
}
