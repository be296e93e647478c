package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal (Gopher/RedPajama-style): highly
  * repetitive machine-generated text deflates far below natural prose, so
  * `compressed_bytes / raw_bytes` is a cheap single-pass repetition
  * detector that catches patterns n-gram ratios miss (long-period loops,
  * template spam). Computed map-side inside whole-stage codegen — no
  * shuffle, no UDF serialization; ~raw-IO throughput at 100 TB.
  *
  * The exact DEFLATE byte count is an implementation detail of the JVM's
  * zlib, so this signal is spec-tested on relative behavior and
  * range-checked rather than oracle-hash-matched (no SQL engine can
  * reproduce it bit-for-bit — the driver records a rows-only check).
  */
object CompressionOps {

  private val deflaterLocal = new ThreadLocal[Deflater] {
    // raw deflate, no zlib header — measure content, not framing;
    // level 6 is the zlib default speed/ratio trade-off
    override def initialValue(): Deflater = new Deflater(6, true)
  }

  private val chunk = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** deflate(bytes).length / bytes.length; 1.0 for empty input. */
  def deflateRatio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.length == 0) return 1.0
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = chunk.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / raw.length.toDouble
  }
}

/** `deflate_ratio(text) -> double` — compressed/raw byte ratio. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"
  override def nullSafeEval(v: Any): Any =
    CompressionOps.deflateRatio(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressionOps.deflateRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
