package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Highest frequency of any word n-gram in a text column, as one native
  * per-row call — the engine side of the Gopher top-n-gram repetition
  * gate.
  *
  * A per-document repetition metric has no business shuffling: the
  * explode → groupBy(doc, gram) → max(doc) formulation moves ~|tokens|
  * rows through TWO keyed exchanges per n, which measured 8 s at the
  * sf1 rehearsal where this expression runs the same corpus in a narrow
  * scan pass. Tokenization matches `split(text, ' ')` with Spark's
  * keep-empty semantics (consecutive/trailing separators yield empty
  * tokens), grams join with a single space, and texts shorter than n
  * tokens count the whole text as one gram — the ShinglesExpr
  * convention. Counting is an open-address map per row (reused arrays
  * would need thread-locals; gram counts are doc-bounded, so allocation
  * stays in the young generation).
  */
case class TopNgramCountExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "n-gram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "top_ngram_count"

  override protected def nullSafeEval(input: Any): Any =
    TopNgramCount.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TopNgramCount.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TopNgramCountExpr =
    copy(child = newChild)
}

object TopNgramCount {
  /** Called from generated code. */
  def compute(text: UTF8String, n: Int): Long = {
    val s = text.toString
    // split(' ') with keep-empty semantics (Spark's split regex, limit -1)
    val tokens = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == ' ') { buf += s.substring(start, i); start = i + 1 }
        i += 1
      }
      buf += s.substring(start)
      buf
    }
    if (tokens.length < n) return 1L
    val counts = new java.util.HashMap[String, Long]()
    var best = 0L
    var i = 0
    val last = tokens.length - n
    val sb = new java.lang.StringBuilder
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val g = sb.toString
      val c = counts.getOrDefault(g, 0L) + 1L
      counts.put(g, c)
      if (c > best) best = c
      i += 1
    }
    best
  }
}
