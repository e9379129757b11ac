package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Primitive merge-intersection of two SORTED long arrays.
  *
  * The hot loop of intersection-based triangle counting: per oriented
  * edge (u,v), the triangles closed over that edge are exactly
  * `N⁺(u) ∩ N⁺(v)` of the degree-oriented out-neighbor lists — a single
  * linear merge over two pre-sorted arrays, replacing the wedge
  * self-join's materialization of every candidate wedge through join
  * machinery (row copies, hashing) with O(|a|+|b|) primitive compares.
  * Degree orientation bounds each out-list at O(√m), so per-row cost is
  * bounded and the output array holds only actual triangles.
  */
object SortedOps {
  /** Both inputs must be sorted ascending (sort_array contract upstream);
    * duplicates are kept pairwise (min of the two multiplicities), though
    * callers feed sets (distinct'd simple-graph adjacency). */
  def intersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val buf = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { buf(k) = x; k += 1; i += 1; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (k == buf.length) buf else java.util.Arrays.copyOf(buf, k))
  }
}

/** `graft_sorted_intersect(a, b)` — see [[SortedOps.intersect]]. Null
  * array → null; null elements are not expected (adjacency lists are
  * collect_list outputs) and would violate the sort contract upstream. */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect takes two ARRAY<BIGINT> columns, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedOps.intersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedOps.intersect($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
