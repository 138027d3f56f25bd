package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit integer view of an md5 digest: bytes [offset, offset+4) of
  * md5(utf8(input)) as an unsigned big-endian value in a long.
  *
  * This is exactly `conv(substr(md5(x), 8·offset/4+1, 8), 16, 10)` /
  * DuckDB `('0x' || substr(md5(x), 2·offset+1, 8))::BIGINT` — the
  * cross-engine replayable hash the sketch pipelines (minhash, simhash)
  * are built on — minus the 32-char hex string allocation, substring,
  * and base-16 string parse per call. The digest instance is
  * thread-local (MessageDigest.getInstance per row is the dominant cost
  * of the composed-expression formulation).
  */
case class Md5IntExpr(child: Expression, offset: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(offset >= 0 && offset <= 12, "offset must address 4 bytes of a 16-byte digest")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_int"

  override protected def nullSafeEval(input: Any): Any =
    Md5Int.compute(input.asInstanceOf[UTF8String], offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.Md5Int.compute($c, $offset);")

  override protected def withNewChildInternal(newChild: Expression): Md5IntExpr =
    copy(child = newChild)
}

object Md5Int {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Called from generated code. */
  def compute(s: UTF8String, offset: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(offset) & 0xffL) << 24) | ((d(offset + 1) & 0xffL) << 16) |
      ((d(offset + 2) & 0xffL) << 8) | (d(offset + 3) & 0xffL)
  }
}
