package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst MINHASH aggregate: the k-slot signature
  * `sig_i = min over shingles of (h1 + i·h2) mod P` with (h1, h2) the
  * two leading 32-bit halves of the shingle's md5 — EXACTLY the
  * arithmetic of q24's relational minhash (`DedupQueries`), so the two
  * paths are interchangeable and provably equal (`MinHashAggSpec`, and
  * q153's oracle recomputes the same signature in DuckDB).
  *
  * Why a TypedImperativeAggregate and not explode+groupBy+min: the
  * relational form multiplies the shuffle by |shingles| rows per doc
  * BEFORE the partial aggregate collapses them; this buffer form folds
  * each shingle into k longs AS IT IS SCANNED — the shuffle carries
  * exactly k·8 bytes per document per partition, the partial/merge
  * contract (`merge` = element-wise min, associative + commutative)
  * composes under any partitioning, and the buffer serializes as a
  * fixed-width byte array. At 100 TB this is the difference between
  * shuffling the corpus's shingle stream and shuffling its signatures.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes >= 1 && numHashes <= 512,
    s"numHashes must be in [1, 512], got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a STRING shingle, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val md = MinHashAgg.md5(bytes)
      // the two leading 32-bit halves of the md5, unsigned — identical
      // to conv(substring(hex, 1, 8), 16, 10) / (hex, 9, 8) in the
      // relational form
      val h1 = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
        ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
      val h2 = ((md(4) & 0xffL) << 24) | ((md(5) & 0xffL) << 16) |
        ((md(6) & 0xffL) << 8) | (md(7) & 0xffL)
      var i = 0
      while (i < numHashes) {
        val hv = (h1 + i.toLong * h2) % MinHashAgg.P
        if (hv < buffer(i)) buffer(i) = hv
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)

  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  /** Same Carter–Wegman modulus as the relational minhash
    * (`DedupQueries`): the largest prime below 2^32. */
  val P: Long = 4294967291L

  /** Per-thread digest instance: `MessageDigest.getInstance` does a
    * provider lookup and allocates engine state, and `update` runs once
    * per SHINGLE — at 100 TB that is billions of calls in the hottest
    * loop of the signature stage, so the instance is hoisted here and
    * reused (`digest(bytes)` resets the engine after each call, so no
    * state leaks between shingles). Thread-local rather than a field:
    * aggregate expression instances are not guaranteed thread-confined
    * across codegen'd tasks in one executor JVM.
    *
    * Isolated A/B (this JVM, 2M digests of a 25-byte shingle, after
    * warm-up): 199 ns/op with `getInstance` per call vs 104 ns/op
    * hoisted — 1.9x on the digest path. Whole-query q153 at sf0.01 is
    * unchanged within noise (warm 0.61 s vs 0.65 s across runs; the
    * scan + band join dominate at 60k docs) — the win is the
    * allocation/lookup rate once the shingle stream is billions of
    * rows, not this SF.
    */
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  def md5(bytes: Array[Byte]): Array[Byte] = localMd.get().digest(bytes)
}
