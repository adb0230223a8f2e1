package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (100 TB toolbox).
  *
  * AQE's skew-join splitting (on by default in Sessions) handles most
  * skew at runtime; explicit salting remains the tool of choice when one
  * side has a few known-hot keys and the other side is small enough to
  * replicate per salt — e.g. joining an events fact against a per-user
  * dimension where 0.1% of users produce 50% of events.
  */
object Skew {

  /** Inner equi-join, semantically identical to
    * `left.join(right, keys)`, but with the left (skewed) side spread
    * across `saltBuckets` shuffle keys per join key and the right side
    * replicated once per salt so every (key, salt) pair finds its match.
    * A hot key's rows land in `saltBuckets` tasks instead of one.
    *
    * The salt must spread EQUAL keys apart, so it cannot be derived from
    * the join key; a uniform per-row bucket over
    * `hash(monotonically_increasing_id())` does it without adding a
    * column dependency. The salt never reaches the output.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
