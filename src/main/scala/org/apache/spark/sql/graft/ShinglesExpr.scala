package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column as one native call.
  *
  * The HOF formulation (`array_distinct(transform(sequence(...),
  * i -> array_join(slice(tokens, i, n))))`) evaluates interpreted, per
  * element, with O(n²) slice/join allocation. This expression runs one
  * tight JVM loop per row (generated code calls the static
  * [[Shingles.compute]], so the whole row stays inside codegen). Output
  * semantics match the HOF version exactly: distinct shingles in
  * first-occurrence order; texts shorter than n tokens yield the whole
  * text as a single shingle.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.Shingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object Shingles {
  /** Single-pass shingle construction; called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.split(' ')
    if (tokens.length < n) {
      return new GenericArrayData(Array[Any](UTF8String.fromString(tokens.mkString(" "))))
    }
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s => UTF8String.fromString(s): Any).toArray)
  }
}
