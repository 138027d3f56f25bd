package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}

/** `bloom_probe(bloomBytes, hash)` — membership test of a precomputed
  * xxhash64 against a SERIALIZED bloom filter carried in a column.
  * Spark's own [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * requires its bloom side to be a constant or scalar subquery (it
  * caches one deserialized filter per plan); the lake's bloom-sidecar
  * DISTRIBUTED gear probes a DIFFERENT filter per row (one per
  * (file, column) sidecar line), so deserializing per evaluation is
  * the honest cost — each filter is probed exactly once per term.
  * Null in either side answers null (unknown), which the consumer
  * treats as "maybe" — never a pruning decision. */
case class BloomProbeExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override protected def nullSafeEval(bloom: Any, hash: Any): Any = {
    val in = new java.io.ByteArrayInputStream(bloom.asInstanceOf[Array[Byte]])
    org.apache.spark.util.sketch.BloomFilter.readFrom(in)
      .mightContainLong(hash.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => {
      val bf = ctx.freshName("bf")
      s"""
         |org.apache.spark.util.sketch.BloomFilter $bf =
         |  org.apache.spark.util.sketch.BloomFilter.readFrom(
         |    new java.io.ByteArrayInputStream($b));
         |${ev.value} = $bf.mightContainLong($h);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
