package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Compact Bloom filter as a mergeable aggregate plus a codegen'd probe
  * scalar — the 100 TB blocklist primitive: build the filter over the SMALL
  * key set (partial aggregation ORs per-partition bitsets map-side),
  * broadcast the resulting byte blob once, and probe it inside whole-stage
  * codegen on the BIG side so the ~99% of rows that cannot match never
  * reach a shuffle. False positives are expected and must be confirmed by
  * an exact join on the survivors — see `operators/Blocklist`.
  *
  * Layout: byte 0 = numHashes, bytes 1.. = bitset longs little-endian, so
  * global byte index of bit `i` is `1 + (i >> 3)` on both sides. Double
  * hashing (Kirsch–Mitzenstadt): bit_j = (h1 + j·h2) mod numBits with two
  * seeded xxhash64 runs over the raw UTF-8 bytes.
  */
object BloomOps {
  private val Seed1 = 0x9E3779B185EBCA87L
  private val Seed2 = 0xC2B2AE3D27D4EB4FL

  /** Set the key's bits in a long-array bitset (build side). */
  def setBits(bits: Array[Long], value: UTF8String, numHashes: Int): Unit = {
    val numBits = bits.length.toLong * 64L
    val h1 = XXH64.hashUTF8String(value, Seed1)
    val h2 = XXH64.hashUTF8String(value, Seed2)
    var j = 0
    while (j < numHashes) {
      val idx = ((h1 + j.toLong * h2) & Long.MaxValue) % numBits
      bits((idx >> 6).toInt) |= 1L << (idx & 63L)
      j += 1
    }
  }

  /** Probe a serialized filter (hot path — called from generated code). */
  def mightContain(filter: Array[Byte], value: UTF8String): Boolean = {
    val k = filter(0) & 0xff
    val numBits = (filter.length - 1).toLong * 8L
    val h1 = XXH64.hashUTF8String(value, Seed1)
    val h2 = XXH64.hashUTF8String(value, Seed2)
    var j = 0
    while (j < k) {
      val idx = ((h1 + j.toLong * h2) & Long.MaxValue) % numBits
      if ((filter(1 + (idx >> 3).toInt) & (1 << (idx & 7L).toInt)) == 0) return false
      j += 1
    }
    true
  }

  /** Bitset longs → self-describing bytes (header + little-endian longs). */
  def serialize(bits: Array[Long], numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](1 + bits.length * 8)
    out(0) = numHashes.toByte
    var i = 0
    while (i < bits.length) {
      val v = bits(i)
      var b = 0
      while (b < 8) {
        out(1 + i * 8 + b) = ((v >>> (8 * b)) & 0xffL).toByte
        b += 1
      }
      i += 1
    }
    out
  }
}

/** Mergeable Bloom-build aggregate over string keys. `numBits` must be a
  * multiple of 64; size it at ~10 bits/expected key for ~1% false
  * positives. Null keys are skipped (a Bloom filter has no null slot). */
case class BloomAgg(numBits: Int, numHashes: Int)
  extends Aggregator[String, Array[Long], Array[Byte]] {
  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes must be in [1,16], got $numHashes")

  override def zero: Array[Long] = new Array[Long](numBits / 64)
  override def reduce(b: Array[Long], s: String): Array[Long] = {
    if (s != null) BloomOps.setBits(b, UTF8String.fromString(s), numHashes)
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Byte] = BloomOps.serialize(b, numHashes)
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  /** Untyped Column form for DataFrame `agg`. */
  def column(c: Column): Column = udaf(this).apply(c)
}

/** `bloom_might_contain(filterBytes, key)` — codegen'd probe; stays inside
  * whole-stage codegen so the big-side scan filters at full speed. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullSafeEval(f: Any, v: Any): Any =
    BloomOps.mightContain(f.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (f, v) => s"graft.functions.BloomOps.mightContain($f, $v)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
