package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Exact double→fixed-point(6) conversion, replicating Spark's
  * `CAST(double AS DECIMAL(18,6))` bit-for-bit (non-ANSI semantics:
  * NaN/Infinity/precision-overflow → null).
  *
  * Spark's cast route is `Double.toString` → BigDecimal parse →
  * `setScale(6, HALF_UP)` — i.e. the rounding applies to the double's
  * SHORTEST decimal representation, not its exact binary expansion, and
  * `java.math.BigDecimal.valueOf` is that exact construction. The cost is
  * the string round-trip (~200 ns/value), which is why `sum(cast(x))`
  * dominates the profile of a decimal aggregation over a double column.
  *
  * Two accelerations, neither changing a single output bit:
  *
  *  - **Round-trip fast path.** For |d| < 4.5e9, compute
  *    `r = Math.round(d·1e6)` and accept it iff `r/1e6` converts back to
  *    exactly `d`. Success proves d IS the double image of the 6-decimal
  *    value r·10⁻⁶, so d's shortest representation lies within half an
  *    ulp (≈|d|·1.1e-16 ≤ 5e-7) of that grid point and HALF_UP rounds it
  *    there — the slow path would return the same r. Business data
  *    (prices, quantities, rates with ≤6 decimals) hits this path almost
  *    always; full-precision products (price·(1-disc)) fall through to
  *    the exact slow path. The 4.5e9 bound keeps r < 2^52 so `r.toDouble`
  *    is exact and the round-trip test is meaningful.
  *  - **Per-thread memo of the last conversion.** A declarative
  *    aggregate's update expressions evaluate the conversion once per
  *    buffer slot (units, remainder, validity); the memo makes the 2nd
  *    and 3rd evaluations of the same input row a pointer-compare hit, so
  *    correctness does not depend on codegen subexpression elimination.
  */
object Micros {
  val Pow: Long = 1000000L

  final class Memo {
    var d: Double = Double.NaN
    var m: Long = 0L
    var valid: Boolean = false
  }

  private val memo = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo
  }

  private def lookup(d: Double): Memo = {
    val mm = memo.get()
    // IEEE ==: never true for NaN (recomputed, still invalid — cheap);
    // true for -0.0 vs 0.0 (both convert to 0 — same result)
    if (d == mm.d) return mm
    mm.d = d
    if (d != d || java.lang.Double.isInfinite(d)) { mm.valid = false; return mm }
    if (d > -4.5e9 && d < 4.5e9) {
      val r = Math.round(d * 1e6)
      if (r.toDouble / 1e6 == d) { mm.valid = true; mm.m = r; return mm }
    }
    val bd = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 18) { mm.valid = false; return mm }
    // precision ≤ 18 ⇒ |unscaled| < 10^18 < 2^63: longValue is exact
    mm.valid = true
    mm.m = bd.unscaledValue().longValue()
    mm
  }

  /** Whole units (floor of the value): floorDiv keeps the
    * units·10⁶ + rem decomposition exact for negatives (0 ≤ rem < 10⁶). */
  def unitsOf(d: Double): Long = {
    val mm = lookup(d)
    if (mm.valid) Math.floorDiv(mm.m, Pow) else 0L
  }

  /** Sub-unit micros remainder in [0, 10⁶). */
  def remOf(d: Double): Long = {
    val mm = lookup(d)
    if (mm.valid) Math.floorMod(mm.m, Pow) else 0L
  }

  /** True iff the cast produces a (non-null) decimal. */
  def validOf(d: Double): Boolean = lookup(d).valid

  /** Reassemble a (units, rem) buffer pair into the exact DECIMAL(28,6)
    * total — called once per output group from [[MicrosFinish]]. */
  def finish(u: Long, r: Long): Decimal =
    Decimal(scala.math.BigDecimal(
      java.math.BigDecimal.valueOf(u)
        .add(java.math.BigDecimal.valueOf(r, 6))
        .setScale(6)), 28, 6)
}

/** The three per-row projections of the exact micros conversion, as
  * non-nullable codegen leaves for [[MicrosSum]]'s update expressions.
  * `part`: 0 = whole units (floorDiv 10⁶), 1 = remainder micros
  * (floorMod 10⁶), each 0 when the input is null or the cast overflows —
  * slot 2 (validity) is [[MicrosValid]]. Sharing one memoized conversion
  * makes the trio cost one `toMicros` per input row regardless of how the
  * aggregate codegen orders or duplicates them. */
case class MicrosPart(child: Expression, part: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && (part == 0 || part == 1))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft micros part takes a DOUBLE child and part 0|1, " +
        s"got ${child.dataType.catalogString} / $part")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else if (part == 0) Micros.unitsOf(v.asInstanceOf[Double])
    else Micros.remOf(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val fn = if (part == 0) "unitsOf" else "remOf"
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.Micros.$fn(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Validity of the exact micros conversion (false for null input,
  * NaN/Infinity, or precision overflow) — [[MicrosSum]]'s "row
  * contributes" flag, mirroring how `sum(cast(x))` skips null casts. */
case class MicrosValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft micros validity takes a DOUBLE child, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && Micros.validOf(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !${c.isNull} &&
          graft.functions.Micros.validOf(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reassemble the (units, rem, seen) buffer into the DECIMAL(28,6) sum —
  * evaluated once per GROUP (a real doGenCode, not CodegenFallback: the
  * aggregate result projection runs inside whole-stage codegen where
  * `ctx.INPUT_ROW` can be null, which the fallback cannot handle). */
case class MicrosFinish(units: Expression, rem: Expression, seen: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(units, rem, seen)
  override def dataType: DataType = DecimalType(28, 6)
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (!seen.eval(input).asInstanceOf[Boolean]) null
    else Micros.finish(
      units.eval(input).asInstanceOf[Long],
      rem.eval(input).asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = units.genCode(ctx)
    val r = rem.genCode(ctx)
    val s = seen.genCode(ctx)
    ev.copy(code = code"""
      ${u.code}
      ${r.code}
      ${s.code}
      boolean ${ev.isNull} = !${s.value};
      org.apache.spark.sql.types.Decimal ${ev.value} = ${ev.isNull} ? null :
        graft.functions.Micros.finish(${u.value}, ${r.value});
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(units = newChildren(0), rem = newChildren(1), seen = newChildren(2))
}

/** `graft_dsum(x)` — exact decimal(6-scale) sum of a DOUBLE column,
  * value-identical to `sum(CAST(x AS DECIMAL(18,6)))` (non-ANSI cast
  * semantics: unconvertible inputs are skipped like the nulls the cast
  * would produce; all-null/empty group → null) and type-identical
  * (DECIMAL(28,6)), but ~4× cheaper per row: the buffer is a pair of
  * primitive longs (whole units + micros remainder, both summed by
  * codegen'd long adds) instead of a per-row BigDecimal accumulation, and
  * the double→fixed-point conversion runs once per row through
  * [[Micros]]'s exact fast path instead of Spark's
  * toString→parse→changePrecision cast machinery.
  *
  * The split accumulator keeps exactness with honest bounds: the units
  * sum overflows long only past |Σx| ≈ 9.2·10¹⁸ (the plain decimal sum
  * holds to 10²²; a money total past 9 quintillion is out of scope and
  * documented here rather than silently assumed), and the remainder sum
  * grows < 10⁶ per row, overflowing only past ~9·10¹² rows per group —
  * two orders beyond a 100 TB table's row count, and then only if a
  * single group holds the whole table. */
case class MicrosSum(child: Expression) extends DeclarativeAggregate {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DecimalType(28, 6)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dsum takes a DOUBLE column, got ${child.dataType.catalogString}")

  private lazy val units = AttributeReference("units", LongType, nullable = false)()
  private lazy val rem = AttributeReference("rem", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(units, rem, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    units + MicrosPart(child, 0),
    rem + MicrosPart(child, 1),
    seen || MicrosValid(child))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    units.left + units.right,
    rem.left + rem.right,
    seen.left || seen.right)

  override lazy val evaluateExpression: Expression =
    MicrosFinish(units, rem, seen)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
