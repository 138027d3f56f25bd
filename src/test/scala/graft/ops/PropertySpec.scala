package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based laws from SURVEY §5.3: ScalaCheck-generated inputs,
  * invariants that must hold for ANY data, not just the fixtures.
  * (Raw ScalaCheck + fixed seeds: the scalatestplus bridge isn't in the
  * offline dependency cache.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 10): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rows = Gen.listOfN(30,
    Gen.zip(Gen.choose(0, 3), Gen.choose(-1000.0, 1000.0)))

  test("law: cumsum of grouped diff reconstructs the value for any data") {
    samples(rows).foreach { data =>
      val df = data.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
        .toDF("grp", "seq", "v")
      val diffed = Windows.groupedDiff(df, Seq("grp"), Seq(col("seq")), Seq("v"))
      val recon = Windows.groupedCumsum(
          diffed.withColumn("v2", col("diff_v")),
          Seq("grp"), Seq(col("seq")), Seq("v2"))
      val pairs = recon.select("v", "cumsum_v2").as[(Double, Double)].collect()
      pairs.foreach { case (v, r) => assert(math.abs(v - r) < 1e-6) }
    }
  }

  private val emails = Gen.zip(
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10)),
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10)))

  test("law: mask is idempotent for any local@domain") {
    samples(Gen.listOfN(10, emails)).foreach { data =>
      val df = data.map { case (l, d) => s"$l@$d.com" }.toDF("email")
      val once = df.select(Pii.maskEmail(col("email")).as("e"))
      val twice = once.select(Pii.maskEmail(col("e")).as("e"))
      assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
      once.as[String].collect().foreach(e => assert(e.startsWith("*****@")))
    }
  }

  private val messy = Gen.listOfN(20, Gen.oneOf(
    Gen.choose(-1e6, 1e6).map(_.toString),
    Gen.const(""),
    Gen.alphaStr.map(_.take(12)),
    Gen.const(null: String)))

  test("law: coerceNumeric never yields null/NaN for any messy input") {
    samples(messy).foreach { data =>
      val out = data.toDF("x")
        .select(Cleaning.coerceNumeric(col("x")).as("x")).as[Double].collect()
      assert(out.length == data.length)
      out.foreach(v => assert(!v.isNaN))
    }
  }

  test("law: melt then pivotFirst round-trips a wide frame with unique keys") {
    samples(Gen.listOfN(5, Gen.identifier.map(_.take(8).toLowerCase)), n = 5)
      .filter(_.nonEmpty).foreach { values =>
        val fields = values.indices.map(i => s"f$i")
        val cols = for (id <- Seq("1", "2"); f <- fields) yield s"$id.$f"
        val row = org.apache.spark.sql.Row((values ++ values).map(v => v: Any): _*)
        val wide = spark.createDataFrame(
          java.util.List.of(row),
          org.apache.spark.sql.types.StructType(cols.map(c =>
            org.apache.spark.sql.types.StructField(c,
              org.apache.spark.sql.types.StringType)).toSeq))
        val back = Reshape.meltSplitPivot(wide, fields)
        assert(back.count() == 2)
        val r1 = back.filter(col("crypto_id") === "1").drop("crypto_id")
          .collect().head.toSeq
        assert(r1 == values.map(v => v: Any))
      }
  }

  test("law: asofJoin equals the last(ignoreNulls) window formulation on random events") {
    import org.apache.spark.sql.expressions.Window
    val evGen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 1000)))
    samples(evGen, n = 5).foreach { data =>
      val events = data.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k.toLong, new java.sql.Timestamp(t * 60000L), i % 3 == 0)
      }.toDF("id", "k", "t", "is_ref")
      val refs = events.filter(col("is_ref"))
        .select(col("k"), col("t"), col("id").as("ref_id"))
      val viaAsof = TemporalJoins.asofJoin(events, refs, Seq("k"), "t", "t",
          Seq("ref_id"), strict = true)
        .select(col("id"), col("asof_ref_id")).as[(Long, Option[Long])]
        .collect().toMap
      val w = Window.partitionBy("k").orderBy(col("t"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val viaWindow = events
        .withColumn("prev", last(when(col("is_ref"), col("id")), ignoreNulls = true).over(w))
        .select(col("id"), col("prev")).as[(Long, Option[Long])].collect().toMap
      // identical timestamps: asof sorts right-before-left within a ts
      // only via the tag; the window formulation uses (t, id). Restrict
      // the law to unique (k, t) inputs to keep the order comparable.
      val uniq = data.map { case (k, t) => (k, t) }
      whenever2(uniq.distinct.size == uniq.size) {
        assert(viaAsof == viaWindow, s"asof=$viaAsof\nwindow=$viaWindow")
      }
    }
  }

  private def whenever2(cond: Boolean)(body: => Unit): Unit = if (cond) body

  test("law: banded rangeJoin equals the naive theta join on random events") {
    val evGen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 500)))
    samples(evGen, n = 5).foreach { data =>
      val a = data.zipWithIndex.map { case ((k, t), i) =>
        (k.toLong, i.toLong, new java.sql.Timestamp(t * 60000L))
      }.toDF("k", "id1", "t1")
      val b = data.zipWithIndex.map { case ((k, t), i) =>
        (k.toLong, i.toLong + 1000, new java.sql.Timestamp((t + 7) * 60000L))
      }.toDF("k", "id2", "t2")
      val windowMicros = 30L * 60 * 1000000 // 30 minutes
      val banded = TemporalJoins.rangeJoin(a, b, Seq("k"), "t1", "t2", windowMicros)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val naive = a.join(b, Seq("k"))
        .filter(abs(unix_micros(col("t1")) - unix_micros(col("t2"))) <= windowMicros)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(banded == naive)
    }
  }

  test("law: z-value interleave is order-preserving within each dimension") {
    // fixing one coordinate, z is strictly monotone in the other — the
    // property that makes z-ranges prunable rectangles
    val pairs = samples(Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L)), 20)
    val df = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.lake.Compaction.zValue(col("x"), col("y"), 8).as("z"))
    val rowsOut = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rowsOut.combinations(2).foreach { case Array((x1, y1, z1), (x2, y2, z2)) =>
      if (x1 == x2 && y1 < y2) assert(z1 < z2)
      if (y1 == y2 && x1 < x2) assert(z1 < z2)
    }
    // bijective on the 8-bit × 8-bit domain sample
    assert(rowsOut.map(_._3).distinct.length ==
      rowsOut.map(t => (t._1, t._2)).distinct.length)
  }

  test("law: sliding chunks cover every token and respect the stride geometry") {
    val texts = samples(Gen.choose(1, 200).map(n =>
      (0 until n).map(i => s"w$i").mkString(" ")), 8)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val chunks = graft.llm.TextAnalysis.chunk(df, window = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    texts.zipWithIndex.foreach { case (t, i) =>
      val n = t.split(" ").length
      val mine = chunks.filter(_._1 == i.toLong).sortBy(_._2)
      val expected = math.max(1, 1 + math.ceil((n - 64) / 48.0).toInt)
      assert(mine.length == expected)
      // chunks are dense 0..k-1 and sizes are full except possibly the tail
      assert(mine.map(_._2).toSeq == (0 until expected).map(_.toLong))
      mine.dropRight(1).foreach { case (_, _, sz) => assert(sz == 64) }
      // last chunk reaches the final token: (k-1)*48 + lastSize >= n
      val (_, lastIdx, lastSz) = mine.last
      assert(lastIdx * 48 + lastSz >= n)
    }
  }

  test("law: salted join equals the plain join for any salt count") {
    val data = samples(Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0.0, 10.0))), 5)
    data.zipWithIndex.foreach { case (rowsIn, run) =>
      val fact = rowsIn.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "rid")
      val dim = (0L to 5L).map(k => (k, s"d$k")).toDF("k", "label")
      Seq(1, 3, 8).foreach { salts =>
        val salted = Skew.saltedJoin(fact, dim, "k", salts, col("rid"))
          .select("rid", "label").as[(Long, String)].collect().toSet
        val plain = fact.join(dim, "k")
          .select("rid", "label").as[(Long, String)].collect().toSet
        assert(salted == plain, s"run=$run salts=$salts")
      }
    }
  }

  test("law: insert-only merge candidates are exactly source-minus-target keys") {
    val keyGen = Gen.listOfN(20, Gen.choose(0L, 30L))
    samples(Gen.zip(keyGen, keyGen), n = 5).foreach { case (srcKeys, tgtKeys) =>
      val src = srcKeys.distinct.toDF("id")
      val tgt = tgtKeys.distinct.toDF("id")
      val out = graft.lake.Merge.insertCandidates(src, tgt, Seq("id"))
        .as[Long].collect().toSet
      assert(out == (srcKeys.toSet -- tgtKeys.toSet))
    }
  }
}
