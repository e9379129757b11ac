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

/** Misra-Gries heavy-hitters summary: per group, a bounded set of at most
  * `m` candidate values whose retained counters under-count by at most
  * N/(m+1) — so every value with true frequency > N/(m+1) is GUARANTEED
  * to be in the candidate set. The mergeable variant (Agarwal et al.,
  * "Mergeable Summaries"): partials sum counters pointwise, then subtract
  * the (m+1)-th largest counter and drop the non-positives, which
  * preserves the error bound across arbitrary merge trees — the property
  * that makes the shuffle carry m counters per partition regardless of
  * group size, where `count(*) GROUP BY` carries every distinct value.
  *
  * The candidate SET can depend on merge order (ties decrement
  * differently), so the deterministic-op contract belongs to the
  * CONSUMER: the heavy-hitters operator re-counts candidates exactly and
  * publishes the exact top-k, which is deterministic whenever the true
  * top-k all clear the N/(m+1) retention bound (SketchSpec pins both the
  * bound and the operator's partition-invariance).
  *
  * Output: candidates sorted ascending (the exact-recount pass re-ranks).
  */
case class MisraGries(child: Expression, m: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(m > 0, s"misra-gries needs capacity > 0, got $m")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_mg_candidates"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg_candidates requires a string child, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < m => buf(s) = 1L
        case None =>
          // classic MG decrement-all: every counter down 1, zeros evicted
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val nc = buf(k) - 1
            if (nc <= 0) dead += k else buf(k) = nc
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Mergeable-summaries merge: pointwise counter sum, then subtract the
    * (m+1)-th largest combined counter (0 when ≤ m survive) and drop the
    * non-positives — each half's under-count bounds ADD, so the merged
    * summary keeps the N/(m+1) guarantee for the combined stream. */
  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    MisraGries.trimToCapacity(buf, m)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  /** Same delimiter-free framing as [[BottomK.serialize]], plus each
    * value's counter. */
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** The Mergeable-Summaries capacity trim shared by the aggregate's
    * merge and the streaming state operator (DocStreams S8): when over
    * capacity, subtract the (m+1)-th largest counter from every counter
    * and evict the non-positives. */
  def trimToCapacity(buf: mutable.HashMap[String, Long], m: Int): Unit =
    if (buf.size > m) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { k =>
        val nc = buf(k) - cut
        if (nc <= 0) dead += k else buf(k) = nc
      }
      dead.foreach(buf.remove)
    }
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
