package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Drop-in md5 hex digest with a THREAD-LOCAL MessageDigest — Spark's
  * own `Md5` calls `DigestUtils.md5Hex`, which runs
  * `MessageDigest.getInstance("MD5")` (provider lookup + allocation)
  * per ROW, then hex-encodes through commons-codec char arrays. The
  * hash itself is md5 — value-identical lowercase 32-hex output by
  * definition, so every oracle that replays `md5(...)` in DuckDB is
  * unchanged; only the per-row constant factor moves (q31's exact
  * dedup, the fingerprint/sampling/decontamination gram paths).
  * Null → null like the builtin; strings cast to their UTF-8 bytes at
  * the factory exactly as the builtin's implicit cast does. */
case class FastMd5(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "fast_md5"

  override def nullSafeEval(input: Any): Any =
    FastMd5.md5hex(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.FastMd5.md5hex($v);")

  override protected def withNewChildInternal(
      newChild: Expression): FastMd5 = copy(child = newChild)
}

object FastMd5 {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")

  /** Lowercase 32-hex md5 of `bytes` as UTF8String (digest() leaves
    * the thread-local instance reset for reuse). */
  def md5hex(bytes: Array[Byte]): UTF8String = {
    val out = tl.get().digest(bytes)
    val cs = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      cs(2 * i) = Hex((out(i) >> 4) & 0xF)
      cs(2 * i + 1) = Hex(out(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  /** Column handle; strings hash their UTF-8 bytes (the builtin's
    * implicit cast). */
  def column(c: Column): Column =
    Bridge.column(FastMd5(Bridge.expression(c.cast("binary"))))
}
