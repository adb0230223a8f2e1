package graft

import org.apache.spark.sql.types._

/** The driver-comparator type contract, as code.
  *
  * The driver loads each query's parquet output and the DuckDB oracle
  * result into pandas, sorts rows by all columns, and hashes typed
  * values. That comparator cannot sort/hash every Spark type:
  *
  *   - `binary` → pandas `sort_values` throws "unhashable type:
  *     bytearray" (this exact failure shipped as q65's red row in
  *     round 4 — invisible locally because scripts/check.py hex-
  *     normalizes bytes);
  *   - nested types (array/map/struct) → unhashable lists/dicts, plus
  *     arrow element-name/nullability noise that hash-differs even when
  *     every value matches (see q58's scalar-column oracle note);
  *   - timestamps/dates → tz/resolution conversion differences between
  *     the parquet reader and DuckDB arrow output (the Catalog
  *     determinism contract already mandates epoch-micros BIGINT or
  *     formatted strings).
  *
  * [[violations]] is the single source of the rule; it is enforced
  * build-time by ComparatorContractSpec over every declared query and
  * again at runtime by [[Verify]] before a result is written, so a
  * q65-class break fails loudly here instead of as an opaque driver err.
  */
object ComparatorContract {

  /** Column-level contract violations in `schema`; empty = safe. */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case BinaryType =>
          Some(s"${f.name}: binary (pandas cannot sort bytearray; emit md5/hex)")
        case _: ArrayType | _: MapType | _: StructType =>
          Some(s"${f.name}: nested ${f.dataType.simpleString} " +
            "(unhashable in pandas; emit scalar columns)")
        case _: TimestampType | _: TimestampNTZType | DateType =>
          Some(s"${f.name}: ${f.dataType.simpleString} " +
            "(emit epoch micros BIGINT or a formatted string)")
        // ALLOWLIST: the only types the pandas comparator is known to
        // sort/hash stably. Anything else — interval types, NullType
        // from a bare lit(null), future additions — is rejected by
        // default rather than silently passed through to an opaque
        // driver-side failure.
        case _: NumericType | _: StringType | BooleanType => None
        case other =>
          Some(s"${f.name}: ${other.simpleString} " +
            "(outside the comparator-safe allowlist: numeric, string, " +
            "boolean)")
      }
    }

  /** Throws with every offending column if `schema` breaks the contract. */
  def require(queryName: String, schema: StructType): Unit = {
    val v = violations(schema)
    if (v.nonEmpty) throw new IllegalStateException(
      s"$queryName output schema breaks the driver-comparator contract: " +
        v.mkString("; "))
  }
}
