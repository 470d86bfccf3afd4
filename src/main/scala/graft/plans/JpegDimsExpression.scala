package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** JPEG dimensions from the SOF frame header — real container parsing
  * (not a decode): JPEG has no fixed-offset dims like PNG/GIF, so the
  * marker chain is walked (skip-by-length) until a start-of-frame
  * marker (C0–CF minus C4/C8/CC) yields height/width. Returns the two
  * u16s packed as `(width << 16) | height`, or null when the payload
  * is not a well-formed JPEG header. One bounded scan over the first
  * bytes of the blob; the loop lives in a static helper both the
  * interpreted eval and the generated code call, so the projection
  * stays inside whole-stage codegen.
  */
case class JpegDims(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dims"

  override def nullSafeEval(v: Any): Any = {
    val r = JpegDims.parse(v.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val r = ctx.freshName("jpegDims")
    nullSafeCodeGen(ctx, ev, b => s"""
      |long $r = graft.plans.JpegDims$$.MODULE$$.parse($b);
      |if ($r < 0) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): JpegDims = copy(child = newChild)
}

object JpegDims {
  /** -1 when not a parseable JPEG frame header. */
  def parse(b: Array[Byte]): Long = {
    def u8(i: Int): Int = b(i) & 0xff
    val n = b.length
    if (n < 4 || u8(0) != 0xff || u8(1) != 0xd8) return -1L
    var i = 2
    while (i + 3 < n) {
      if (u8(i) != 0xff) return -1L // desynced marker chain
      var marker = u8(i + 1)
      // fill bytes: consecutive FFs pad between markers
      while (marker == 0xff && i + 2 < n) { i += 1; marker = u8(i + 1) }
      marker match {
        case m if m >= 0xd0 && m <= 0xd9 => i += 2 // standalone RST/EOI/SOI
        case 0x01 => i += 2                        // standalone TEM
        case m if (m >= 0xc0 && m <= 0xcf) &&
            m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOF: len(2) precision(1) height(2) width(2) — the declared
          // length must cover those 7 bytes or the "dims" would be read
          // from the NEXT segment's bytes
          if (i + 8 >= n) return -1L
          val len = (u8(i + 2) << 8) | u8(i + 3)
          if (len < 7) return -1L
          val height = (u8(i + 5) << 8) | u8(i + 6)
          val width = (u8(i + 7) << 8) | u8(i + 8)
          return (width.toLong << 16) | height.toLong
        case _ =>
          if (i + 3 >= n) return -1L
          val len = (u8(i + 2) << 8) | u8(i + 3)
          if (len < 2) return -1L
          i += 2 + len
      }
    }
    -1L
  }
}

object JpegDimsFns {
  def jpegDims(payload: Column): Column =
    Bridge.column(JpegDims(Bridge.expression(payload)))
}
