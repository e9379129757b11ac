package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter membership sketch — graft's custom aggregate tier
  * (SURVEY §4), the broadcastable "have we seen this hash before?"
  * primitive a 100 TB incremental pipeline runs in front of every exact
  * join: build the filter ONCE over the indexed corpus (bounded state,
  * partial buffers OR-merge map-side, so the shuffle carries one bitset
  * per partition regardless of corpus size), broadcast the few-MB result,
  * and let each incoming batch drop its definitely-new rows with pure
  * per-row expression work — no shuffle, no join, no corpus scan. Only
  * possible members (true dups + the fpp sliver) proceed to the exact
  * verify join, whose output the filter can never change: a Bloom filter
  * has NO false negatives, so prefilter + exact verify ≡ exact join —
  * which is what makes the operator DuckDB-oracle-able even though the
  * oracle engine has no Bloom filter.
  *
  * Encoding (shared by [[BloomFilterAgg]] and [[BloomMightContain]]):
  * 4-byte big-endian hash count k, then the bit array as big-endian
  * longs; m = (len-4)*8 bits. Bit positions via Kirsch-Mitzenmacher
  * double hashing of the (already xxhash64'd) input: pos_i =
  * (h1 + i*h2) mod m with h2 forced odd — k indices from one 64-bit
  * value, deterministic across partitionings and engines.
  */
object BloomBits {
  /** Stafford variant-13 64-bit finalizer (public-domain SplitMix64 mix):
    * derives the second hash stream from the input's single long. */
  def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  def wordsFor(numBits: Int): Int = (numBits + 63) / 64

  /** Set the k double-hashed bit positions of `v` in `words` (m bits). */
  def set(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Unit = {
    val h2 = mix64(v) | 1L
    var i = 0
    var h = v
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h, numBits.toLong).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      h += h2
      i += 1
    }
  }

  /** Probe an encoded filter (header + bit array) for `v`. Validates the
    * encoding up front: `graft_bloom_contains` is registered as a general
    * SQL function, so arbitrary user binary reaches this path — without
    * the guard a 4-byte input floorMods by zero and a truncated array
    * indexes out of bounds, both surfacing as opaque task crashes. */
  def mightContain(enc: Array[Byte], v: Long): Boolean = {
    // length check FIRST: decoding the k header from a <4-byte input would
    // itself index out of bounds — the exact opaque crash this guard exists
    // to replace with a diagnosable error
    if (enc.length < 12 || (enc.length - 4) % 8 != 0)
      throw new IllegalArgumentException(
        s"graft_bloom_contains: malformed filter (len=${enc.length}); " +
          "expected 4-byte k in 1..16 then >=1 big-endian longs of bit " +
          "array, as produced by graft_bloom_agg")
    val numHashes = ((enc(0) & 0xff) << 24) | ((enc(1) & 0xff) << 16) |
      ((enc(2) & 0xff) << 8) | (enc(3) & 0xff)
    if (numHashes < 1 || numHashes > 16)
      throw new IllegalArgumentException(
        s"graft_bloom_contains: malformed filter (len=${enc.length}, " +
          s"k=$numHashes); expected 4-byte k in 1..16 then >=1 big-endian " +
          "longs of bit array, as produced by graft_bloom_agg")
    val numBits = (enc.length - 4) * 8
    val h2 = mix64(v) | 1L
    var i = 0
    var h = v
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h, numBits.toLong).toInt
      val byteIdx = 4 + (pos >>> 6) * 8 + 7 - ((pos & 63) >>> 3)
      if ((enc(byteIdx) & (1 << (pos & 7))) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  def encode(words: Array[Long], numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](4 + words.length * 8)
    out(0) = (numHashes >>> 24).toByte; out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte; out(3) = numHashes.toByte
    var w = 0
    while (w < words.length) {
      val v = words(w)
      var b = 0
      while (b < 8) { out(4 + w * 8 + b) = (v >>> (56 - 8 * b)).toByte; b += 1 }
      w += 1
    }
    out
  }

  def decodeWords(enc: Array[Byte]): Array[Long] = {
    val words = new Array[Long]((enc.length - 4) / 8)
    var w = 0
    while (w < words.length) {
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (enc(4 + w * 8 + b) & 0xffL); b += 1 }
      words(w) = v
      w += 1
    }
    words
  }
}

/** `graft_bloom_agg(hash, numBits, numHashes)`: aggregate a LONG hash
  * column into an encoded Bloom filter (BINARY). State is the fixed-size
  * bit array — numBits/8 bytes per partial buffer no matter how many rows
  * feed it; partials merge by OR, the mergeable-sketch property that
  * keeps the build one map-side pass at any scale. */
case class BloomFilterAgg(child: Expression, numBits: Int, numHashes: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"graft_bloom_agg needs numBits a positive multiple of 64, got $numBits")
  require(numHashes > 0 && numHashes <= 16,
    s"graft_bloom_agg needs 1..16 hashes, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg requires a bigint child (pre-hash with xxhash64), " +
        s"got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomBits.wordsFor(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBits.set(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomBits.encode(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomBits.encode(buf, numHashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomBits.decodeWords(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(filter, hash)`: probe an encoded filter for a
  * LONG hash. Codegen'd (stays inside WholeStageCodegen — the probe runs
  * per-row on the batch scan, graft's hottest prefilter path); the filter
  * operand is typically a broadcast one-row column, evaluated once per
  * row but dominated by the k cache-line bit tests. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires (binary, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(f: Any, v: Any): Any =
    BloomBits.mightContain(f.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, v) =>
      s"${ev.value} = graft.functions.BloomBits.mightContain($f, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** A broadcast byte array as a BINARY leaf expression — how a built Bloom
  * filter reaches [[BloomMightContain]] at scale. A `lit(bytes)` literal
  * rides the serialized plan of every task set of every stage that uses
  * it; at D11's own 100 TB sizing (~1.25 GB for 10⁹ distinct shingles at
  * 10 bits/key) that is a per-stage GB ship and a GB resident in every
  * plan copy the optimizer makes. A torrent broadcast ships the bytes to
  * each executor once, and the plan carries only this handle. Codegen
  * dereferences the broadcast once per task into a local field, so the
  * per-row probe cost is identical to the literal path. */
case class BroadcastBinary(bc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_broadcast_binary"
  // toString must NOT print the payload (plan strings would balloon);
  // the broadcast id identifies it
  override def toString: String = s"graft_broadcast_binary(#${bc.id})"

  override def eval(input: InternalRow): Any = bc.value

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val bcRef = ctx.addReferenceObj("graftBloomBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val bytes = ctx.addMutableState("byte[]", "graftBloomBytes",
      v => s"$v = (byte[]) $bcRef.value();")
    ev.copy(code = code"", isNull = FalseLiteral,
      value = JavaCode.variable(bytes, BinaryType))
  }
}
