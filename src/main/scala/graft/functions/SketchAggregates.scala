package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k sketch (KMV): per group, the k smallest DISTINCT values of a
  * string expression — graft's custom aggregate tier (SURVEY §4).
  *
  * Why an aggregate and not `sort_array(collect_set(...))[0:k]`:
  * collect_set materializes EVERY distinct value per group before the
  * slice — unbounded state. This aggregate keeps at most k values per
  * partition buffer, partials merge by set-union-and-trim, so the shuffle
  * carries k values per (group, partition) regardless of group size —
  * the mergeable-sketch property that makes distinct-counting and
  * uniform-by-hash sampling feasible at 100 TB.
  *
  * Fed with a hash (e.g. md5(token)) the result is the classic KMV
  * distinct-count sketch: estimate ≈ (k-1) / fraction(kth-min). The
  * output (sorted array of the k smallest distinct inputs) is fully
  * deterministic, so it is DuckDB-oracle-able.
  */
case class BottomK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[String]] {

  require(k > 0, s"bottom-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bottomk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bottomk requires a string child, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty[String]

  private def trim(buf: mutable.TreeSet[String]): Unit =
    while (buf.size > k) buf.remove(buf.last)

  override def update(buf: mutable.TreeSet[String], input: InternalRow): mutable.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      // skip values already >= current kth min: no insertion, no churn
      if (buf.size < k || s < buf.last) { buf.add(s); trim(buf) }
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[String],
                     other: mutable.TreeSet[String]): mutable.TreeSet[String] = {
    other.foreach { s => if (buf.size < k || s < buf.last) { buf.add(s); trim(buf) } }
    buf
  }

  override def eval(buf: mutable.TreeSet[String]): Any =
    new GenericArrayData(buf.toArray.sorted.map(UTF8String.fromString(_)))

  /** Length-prefixed encoding (count, then byte-length + raw UTF-8 per
    * value): delimiter-free, so values containing any byte — separators,
    * NULs, empty strings — round-trip exactly through partial-aggregate
    * shuffles. Raw int-prefixed bytes rather than writeUTF: modified
    * UTF-8 caps a value at 65535 encoded bytes, and graft_bottomk is a
    * general string aggregate (a ≥64 KB document must not crash the
    * shuffle). */
  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[String]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(new String(b, "UTF-8"))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomK =
    copy(child = newChildren.head)
}

object BottomK {
  /** KMV distinct-count estimate from a bottom-k-of-md5 sketch: with the
    * kth-smallest hash at fraction f of the hash space, distinct ≈ (k-1)/f.
    * Exact when the group has fewer than k distinct values. */
  def kmvEstimate(sketch: Seq[String], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else {
      val kth = BigInt(sketch.max.take(16), 16).toDouble
      val space = math.pow(16.0, 16)
      (k - 1) / (kth / space)
    }
}
