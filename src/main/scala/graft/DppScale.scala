package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the r18 pruning tranche:
  * `runMain graft.DppScale <sfDir> [replication]`
  *
  * Builds a PARTITIONED lake fact (lineitem at `sfDir`, replicated k×,
  * 64 synthetic `day` partitions) and a file-backed dim, then times
  * interleaved legs of the same star query / count / key-scoped join
  * with the r18 machinery ON and OFF:
  *
  *  - star join with DYNAMIC PARTITION PRUNING (the partition-aware
  *    index) vs the flat index (`spark.graft.lake.partitionedIndex`);
  *  - `count(*)` via the metadata-aggregate rule vs the full scan;
  *  - a key-range dim join via `readForKeys` (join-driven file
  *    pruning) vs the full-snapshot join.
  *
  * Legs are interleaved (median of 3 each) for the same reason DvScale
  * interleaves: a sequential run's later legs inherit GC/page-cache
  * pressure and read slow. One line per leg → SCALE.md.
  */
object DppScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rep = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = graft.lake.Scratch.dir("graft-dppscale")

    // fact: lineitem ×rep with a 64-value partition column
    val base = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val fact = (1 to rep).map(i =>
        base.withColumn("l_orderkey", col("l_orderkey") * rep + lit(i)))
      .reduce(_ unionByName _)
      .withColumn("day", pmod(col("l_orderkey"), lit(64)).cast("int"))
    val tPart = graft.lake.VersionedTable(spark, s"$scratch/fact_part")
    tPart.commitOverwritePartitioned(fact, Seq("day"))
    val nRows = tPart.rowCountAt(tPart.latestVersion().get)
    val nFiles = tPart.snapshotDataFiles().size
    println(s"DPPSCALE fact rows=$nRows files=$nFiles (64 partitions, rep=$rep)")

    // the same data range-clustered by key, UNPARTITIONED — the
    // readForKeys leg's layout
    val tFlat = graft.lake.VersionedTable(spark, s"$scratch/fact_flat")
    tFlat.commitOverwrite(fact.repartitionByRange(64, col("l_orderkey")))

    // file-backed dim: 64 days, 1 tagged 'keep'
    val dimPath = s"$scratch/dim"
    spark.range(0, 64).select(col("id").cast("int").as("dim_day"),
      when(col("id") === 7, "keep").otherwise("drop").as("tag"))
      .coalesce(1).write.parquet(dimPath)

    def median3(what: String)(body: => Long): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
      println(f"DPPSCALE $what%-34s ${ts.sorted.apply(1)}%8.3f s")
    }

    def starJoin(): Long = {
      val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
      tPart.read().join(dim, col("day") === col("dim_day"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .collect(); 1L
    }
    def scanCount(): Long =
      tPart.read().agg(count(lit(1))).head().getLong(0)
    def metaCount(): Long = {
      val agg = tPart.read().agg(count(lit(1)).as("n"))
      val out = org.apache.spark.sql.graft.GraftMetadataAggregates(spark)(
        agg.queryExecution.optimizedPlan)
      require(out.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        "metadata count declined")
      org.apache.spark.sql.GraftColumnBridge.ofRows(spark, out).head().getLong(0)
    }
    // key-scoped join: the newest ~0.3% of keys (range-correlated
    // slice, small enough that the FACT scan — not the key-frame
    // build — dominates the leg)
    val realMax = tFlat.read().agg(max("l_orderkey")).head().getLong(0)
    def keyedJoin(pruned: Boolean): Long = {
      val keys = spark.range((realMax * 0.997).toLong, realMax + 1)
        .select(col("id").as("l_orderkey"))
      val factSide =
        if (pruned) tFlat.readForKeys(keys, Seq("l_orderkey"))
        else tFlat.read()
      factSide.join(keys, Seq("l_orderkey"))
        .agg(sum("l_extendedprice")).collect(); 1L
    }

    // r19 AUTOMATIC DFP leg: the SAME keyed join written as a PLAIN
    // join in an extensions session — no readForKeys — must track the
    // explicit gear. File-backed filtered keys so the rule's
    // selectivity gate sees a real Filter (a driver Range would
    // rightly decline).
    val keysPath = s"$scratch/keys"
    spark.range((realMax * 0.99).toLong, realMax + 1)
      .select(col("id").as("k_orderkey")).coalesce(1).write.parquet(keysPath)
    val es = GraftSqlSessions.withDml(spark)
    val tFlatEs = graft.lake.VersionedTable(es, s"$scratch/fact_flat")
    def keyedJoinPlain(): Long = {
      val keys = es.read.parquet(keysPath)
        .filter(col("k_orderkey") >= (realMax * 0.997).toLong)
      tFlatEs.read().join(keys, col("l_orderkey") === col("k_orderkey"))
        .agg(sum("l_extendedprice")).collect(); 1L
    }
    // prove the rule fires before timing it
    {
      val keys = es.read.parquet(keysPath)
        .filter(col("k_orderkey") >= (realMax * 0.997).toLong)
      val j = tFlatEs.read().join(keys, col("l_orderkey") === col("k_orderkey"))
        .agg(sum("l_extendedprice"))
      val plan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      require(plan.collect {
        case e: org.apache.spark.sql.graft.GraftDynamicFileScanExec => e }.nonEmpty,
        "auto DFP rule declined the scale leg's join")
    }

    // interleaved legs
    (1 to 1).foreach { _ =>
      spark.conf.set("spark.graft.lake.partitionedIndex", "false")
      median3("star join, FLAT index (no DPP)")(starJoin())
      spark.conf.set("spark.graft.lake.partitionedIndex", "true")
      median3("star join, partitioned index+DPP")(starJoin())
      median3("count(*) full scan")(scanCount())
      median3("count(*) metadata rule")(metaCount())
      median3("keyed join, full snapshot")(keyedJoin(pruned = false))
      median3("keyed join, readForKeys (DFP)")(keyedJoin(pruned = true))
      // the explicit gear over the SAME parquet-backed keys the auto
      // legs read — the apples-to-apples control for rule overhead
      def keyedJoinExplicitParquet(): Long = {
        val keys = es.read.parquet(keysPath)
          .filter(col("k_orderkey") >= (realMax * 0.997).toLong)
          .select(col("k_orderkey").as("l_orderkey"))
        tFlatEs.readForKeys(keys, Seq("l_orderkey"))
          .join(keys, Seq("l_orderkey"))
          .agg(sum("l_extendedprice")).collect(); 1L
      }
      es.conf.set("spark.graft.lake.dfp.auto", "false")
      median3("keyed join, plain, auto rule OFF")(keyedJoinPlain())
      median3("keyed join, readForKeys, same keys")(keyedJoinExplicitParquet())
      es.conf.unset("spark.graft.lake.dfp.auto")
      median3("keyed join, plain, AUTO rule")(keyedJoinPlain())
    }

    // r19 BLOOM leg: the same fact HASH-distributed by key (min/max
    // prunes nothing by construction) with per-file blooms on the key;
    // point lookups with the bloom layer on vs off.
    val tHash = graft.lake.VersionedTable(spark, s"$scratch/fact_hash")
    spark.conf.set("spark.graft.lake.bloom.columns", "l_orderkey")
    spark.conf.set("spark.graft.lake.bloom.maxItems",
      math.max(1000L, nRows / 64).toString)
    try tHash.commitOverwrite(fact
      .select("l_orderkey", "l_extendedprice")
      .repartition(64, col("l_orderkey")))
    finally {
      spark.conf.unset("spark.graft.lake.bloom.columns")
      spark.conf.unset("spark.graft.lake.bloom.maxItems")
    }
    val probeKeys = (1 to 8).map(i => realMax / 11 * i)
    def pointLookups(): Long = probeKeys.map(k =>
      tHash.readWhere(col("l_orderkey") === k).count()).sum
    locally {
      spark.conf.set("spark.graft.lake.bloom.enabled", "false")
      val statsOnly = tHash.candidateFiles(col("l_orderkey") === probeKeys.head)
      spark.conf.unset("spark.graft.lake.bloom.enabled")
      val bloomed = tHash.candidateFiles(col("l_orderkey") === probeKeys.head)
      println(s"DPPSCALE bloom fixture: stats keep ${statsOnly.size}/64, " +
        s"bloom keeps ${bloomed.size}/64")
      require(bloomed.size < statsOnly.size, "bloom leg fixture failed to prune")
    }
    spark.conf.set("spark.graft.lake.bloom.enabled", "false")
    median3("8 point lookups, stats only (hash layout)")(pointLookups())
    spark.conf.unset("spark.graft.lake.bloom.enabled")
    median3("8 point lookups, bloom skipping")(pointLookups())
    require(metaCount() == scanCount(), "metadata count drifted from scan")
    spark.stop()
  }
}
