package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayModeCount, CosineSimilarity, JaccardSimilarity, MinHashAgg, MortonCode, NfcNormalize}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions in the session FunctionRegistry, so SQL users get
  * `SELECT cosine_sim(a.embedding, b.embedding) ...` with the same
  * codegen'd implementation the Column API uses.
  *
  * Wire up with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "jaccard_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaccard_sim takes exactly 2 arguments")
        JaccardSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_mode_count"),
      new ExpressionInfo(classOf[ArrayModeCount].getName, "array_mode_count"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "array_mode_count takes exactly 1 argument")
        ArrayModeCount(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("morton_code"),
      new ExpressionInfo(classOf[MortonCode].getName, "morton_code"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "morton_code takes exactly 2 arguments")
        MortonCode(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "minhash_agg takes (shingle, numHashes) arguments")
        // accept any foldable integral literal (INT/BIGINT/SMALLINT/
        // TINYINT all parse from bare SQL literals depending on value),
        // and surface NULL as a type error up front — an unboxed null
        // would otherwise read as numHashes=0 and fail with a confusing
        // range message
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val k = children(1) match {
          case e if e.foldable && (e.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }) =>
            e.eval() match {
              case null => throw new IllegalArgumentException(
                "numHashes must be a non-NULL integer literal")
              case b: java.lang.Byte => b.toInt
              case s: java.lang.Short => s.toInt
              case i: java.lang.Integer => i.toInt
              case l: java.lang.Long =>
                require(l >= 1 && l <= 512,
                  s"numHashes must be in [1, 512], got $l")
                l.toInt
            }
          case other => throw new IllegalArgumentException(
            s"numHashes must be an integer literal, got $other")
        }
        MinHashAgg(children.head, k)
      }))
  }
}
