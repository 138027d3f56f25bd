package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom UDAF (SURVEY §2.9: `Aggregator[IN, BUF, OUT]` + `udaf`): the
  * full k-permutation MinHash signature in ONE aggregation buffer.
  *
  * Equivalent to k separate `min(xxhash64(h, i))` aggregates but with a
  * single long-array buffer per group instead of k aggregate slots —
  * the buffer updates in a tight loop, and the generated plan carries
  * one aggregate expression instead of k.
  *
  * Hash family is bit-compatible with the expression form: Spark's
  * `xxhash64(col, lit(i))` folds children left-to-right from seed 42,
  * i.e. `hashLong(i, hashLong(h, 42))` — replicated here so signatures
  * (and therefore LSH candidate sets) are identical whichever path
  * computes them (asserted in LlmSpec).
  */
object MinHashAgg {

  final class MinHashSig(numHashes: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val base = XXH64.hashLong(h, 42L)
      var i = 0
      while (i < numHashes) {
        // lit(i) is an INT literal, which Spark hashes with hashInt
        val v = XXH64.hashInt(i, base)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** DataFrame-usable UDAF: `df.groupBy(...).agg(minhashSig(32)(col("h")))`. */
  def minhashSig(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinHashSig(numHashes), Encoders.scalaLong)
}
