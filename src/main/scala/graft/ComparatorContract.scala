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

  /** The q175 lesson as a STATIC plan check: multiply/divide where an
    * operand is a precision-SATURATED decimal (p >= 38 with fractional
    * scale — what any `sum(decimal(p>=28,s>0))` widens to). Those are
    * exactly the operations where Spark's precision-loss rules and a
    * DuckDB version's DOUBLE promotion can disagree (q175's
    * `cum * 2 >= tot` on DECIMAL(38,2) flipped an exact tie at the
    * driver while passing both local sweeps). NOT flagged, because both
    * engines are exact there: plain sums, same-type comparisons with no
    * intervening arithmetic (q174's binning), `round`-in-decimal then
    * cast-to-double (the sanctioned emit pattern), and scale-0
    * decimal(38,0) integer work mirrored by HUGEINT oracles (q89,
    * moment sums). Enforced over every declared query's analyzed plan
    * by DecimalDisciplineSpec.
    */
  def wideDecimalArithmetic(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply}
    def isSaturated(dt: DataType): Boolean = dt match {
      case d: DecimalType => d.precision >= 38 && d.scale > 0
      case _ => false
    }
    plan.collect { case node =>
      node.expressions.flatMap(e => e.collect {
        case m: Multiply
            if isSaturated(m.left.dataType) || isSaturated(m.right.dataType) =>
          s"multiply on ${m.dataType.simpleString}: " +
            m.toString.take(120)
        case d: Divide
            if isSaturated(d.left.dataType) || isSaturated(d.right.dataType) =>
          s"divide on ${d.dataType.simpleString}: " +
            d.toString.take(120)
      })
    }.flatten.distinct
  }
}
