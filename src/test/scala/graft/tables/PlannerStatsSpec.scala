package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stamped statistics surfaced to the planner: while an ANALYZE stamp
  * is fresh, a table read carries CatalogStatistics (exact row count ×
  * in-memory row width + per-column NDVs) — so a broadcast decision
  * made from COMPRESSED parquet bytes flips to the truthful in-memory
  * estimate. Stale stats must leave plans exactly as before.
  */
class PlannerStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def broadcastJoins(df: org.apache.spark.sql.DataFrame): Int =
    // string-match: AQE wraps the physical plan (AdaptiveSparkPlanExec
    // holds the inner plan outside the children traversal)
    "BroadcastHashJoin".r.findAllIn(df.queryExecution.executedPlan.toString).size

  test("fresh ANALYZE stats flip a file-bytes broadcast decision; stale stats change nothing") {
    val dir = TestSpark.tmpDir("plannerstats")
    val t = new TxTable(spark, s"$dir/t")
    // highly compressible: a constant 48-char pad dictionary-encodes to
    // nearly nothing on disk, but occupies real memory per row
    val pad = "x" * 48
    t.create((0 until 120000).map(i => (i.toLong, pad)).toDF("id", "pad")
      .repartition(2))
    val fileBytes = t.snapshot.files.map(_.sizeBytes).sum
    // the probe estimates at 8 B/row = 16 MB — never broadcastable at
    // the threshold below, so the broadcast decision under test is the
    // TABLE side's
    val probe = spark.range(2000000).toDF("id")

    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(conf)
    try {
      // threshold sits ABOVE the compressed file size and BELOW the
      // truthful in-memory estimate (120k rows x ~28+ bytes)
      val threshold = fileBytes + 512 * 1024
      assert(threshold < 120000L * 28L,
        s"fixture drifted: files $fileBytes b must compress far below row bytes")
      spark.conf.set(conf, threshold.toString)

      // no stats: file bytes under the threshold -> broadcast the TABLE side
      val before = t.toDF.join(probe, "id")
      assert(broadcastJoins(before) > 0,
        s"compressed bytes should broadcast here\n${before.queryExecution.executedPlan}")

      // fresh stats: truthful size exceeds the threshold -> no broadcast
      ColumnStats.analyze(t, Seq("id"))
      val sized = t.toDF.join(probe, "id")
      assert(broadcastJoins(sized) == 0,
        s"row-count-based size must veto the broadcast\n${sized.queryExecution.executedPlan}")
      // the attached stats carry the exact row count + stamped NDV
      val lr = sized.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
            if l.catalogTable.exists(_.stats.isDefined) => l
      }
      assert(lr.nonEmpty, "relation must carry catalog statistics while fresh")
      val st = lr.head.catalogTable.get.stats.get
      assert(st.rowCount.contains(BigInt(120000)))
      // 120k distinct > k=4096: the stamped NDV is estimate-regime
      val dc = st.colStats.get("id").flatMap(_.distinctCount).get
      assert((dc - 120000).abs.toDouble / 120000 < 0.0625, s"ndv $dc")

      // append folds (stays fresh): still no broadcast, count maintained
      t.append(Seq((200000L, pad)).toDF("id", "pad"))
      val folded = t.toDF.join(probe, "id")
      assert(broadcastJoins(folded) == 0)

      // a provable copy-on-write DELETE folds (round 14): the truthful
      // sizing SURVIVES the retention delete — still no broadcast
      t.delete("id = 1")
      assert(ColumnStats.isFresh(t.snapshot), "delete fold must keep the stamp")
      val afterDelete = t.toDF.join(probe, "id")
      assert(broadcastJoins(afterDelete) == 0,
        "truthful sizing must survive a folded delete")

      // a CoW UPDATE now FOLDS (round 14): rows are preserved 1:1, so
      // the truthful row-count sizing survives an update of another
      // column — still no broadcast
      t.update("id = 0", Map("pad" -> "'y'"))
      assert(ColumnStats.isFresh(t.snapshot), "update fold must keep the stamp")
      val afterUpdate = t.toDF.join(probe, "id")
      assert(broadcastJoins(afterUpdate) == 0,
        "truthful sizing must survive a folded update")

      // a genuine rewrite (overwrite) invalidates: behavior reverts
      // EXACTLY to the no-stats plan — stale stats must never keep
      // steering the planner
      t.overwrite(t.toDF(t.version).limit(120000).cache())
      val stale = t.toDF.join(probe, "id")
      assert(broadcastJoins(stale) > 0,
        s"stale stats must not be served to the planner\n${stale.queryExecution.executedPlan}")
    } finally spark.conf.set(conf, old)
  }

  test("stats attach is advisory across every stamped type — reads never fail") {
    val dir = TestSpark.tmpDir("plannerstats-types")
    val t = new TxTable(spark, s"$dir/t")
    t.create(spark.range(50).toDF("id")
      .withColumn("d", expr("DATE'2024-01-02' + CAST(id AS INT)"))
      .withColumn("ts", expr("TIMESTAMP'2024-01-02 03:04:05' + make_interval(0,0,0,0,0,0,id)"))
      .withColumn("tn", expr("TIMESTAMP_NTZ'2024-01-02 03:04:05' + make_interval(0,0,0,0,0,0,id)"))
      .withColumn("dec", expr("CAST(id AS DECIMAL(12,2)) / 7"))
      .withColumn("f", col("id").cast("float"))
      .withColumn("s", concat(lit("v"), col("id")))
      .withColumn("b", (col("id") % 2 === 0)))
    ColumnStats.analyze(t, t.snapshot.schema.fieldNames.toSeq)
    assert(ColumnStats.isFresh(t.snapshot))
    // the read must work with the stats attached...
    val df = t.toDF
    assert(df.count() == 50)
    // ...and the CBO-estimable types must actually land as colStats
    val lr = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.catalogTable.exists(_.stats.isDefined) => l
    }
    assert(lr.nonEmpty, "fresh stamp must attach catalog statistics")
    val cs = lr.head.catalogTable.get.stats.get.colStats
    Seq("id", "d", "ts", "tn", "dec", "f").foreach { c =>
      assert(cs.get(c).exists(s0 => s0.min.isDefined && s0.max.isDefined),
        s"min/max missing for CBO-able column $c: ${cs.get(c)}")
      assert(cs(c).nullCount.contains(BigInt(0)), s"nullCount for $c")
    }
    // strings/booleans keep their extremes engine-internal (Spark's own
    // ANALYZE doesn't stat them either) but still carry NDV + nullCount
    Seq("s", "b").foreach { c =>
      assert(cs.get(c).exists(s0 => s0.min.isEmpty && s0.max.isEmpty &&
        s0.distinctCount.isDefined), s"string/bool colStat drifted for $c")
    }
  }

  test("CBO consumes stamped colStats: filter selectivity flips the join; stale reverts exactly") {
    val dir = TestSpark.tmpDir("plannerstats-cbo")
    val t = new TxTable(spark, s"$dir/t")
    // INCOMPRESSIBLE pads (sha2): file bytes ≈ memory bytes, so the
    // flip below is purely the colStats-driven filter ESTIMATE — no
    // compressed-size artifact can produce it. The FILTER column `k`
    // is deliberately NOT the join key: a key predicate would infer
    // onto the probe side, whose Range stats are exact with or without
    // our stamp, and the broadcast flip would stop isolating colStats.
    t.create(spark.range(200000).toDF("id")
      .withColumn("k", col("id"))
      .withColumn("pad", sha2(col("id").cast("string"), 256)).repartition(2))
    val fileBytes = t.snapshot.files.map(_.sizeBytes).sum
    val probe = spark.range(3000000).toDF("id") // 24 MB estimate: never broadcast
    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(conf)
    try {
      val threshold = 1024 * 1024
      assert(fileBytes > threshold * 4L,
        s"fixture drifted: files $fileBytes b must dwarf the $threshold threshold")
      spark.conf.set(conf, threshold.toString)
      def filtered = t.toDF.filter(col("k") < 2000).join(probe, "id")

      // no stats: the filter's estimate is the WHOLE (big) relation
      // size — shuffle join
      assert(broadcastJoins(filtered) == 0,
        s"size-only estimation must not broadcast\n${filtered.queryExecution.executedPlan}")

      ColumnStats.analyze(t, Seq("id", "k"))
      // fresh: FilterEstimation range math over the stamped min/max
      // shrinks `k < 2000` to ~1% of rows → the filtered side drops
      // under the threshold → THE JOIN FLIPS TO BROADCAST. This is the
      // decision that depends on colStats, not just sizeInBytes.
      val fresh = filtered
      assert(broadcastJoins(fresh) > 0,
        s"colStats range selectivity must broadcast the filtered side\n" +
          s"${fresh.queryExecution.optimizedPlan.stats}\n${fresh.queryExecution.executedPlan}")
      // the row estimates themselves: range predicate ≈ rows×(2000/200000),
      // equality ≈ rows/ndv ≈ 1 — both visible on the optimized plan
      val range = t.toDF.filter(col("k") < 2000).queryExecution.optimizedPlan.stats
      assert(range.rowCount.exists(rc => rc > BigInt(500) && rc < BigInt(10000)),
        s"range estimate drifted: $range")
      val eq = t.toDF.filter(col("k") === 42).queryExecution.optimizedPlan.stats
      assert(eq.rowCount.exists(_ < BigInt(50)), s"equality estimate drifted: $eq")
      // nullCount rides from the folded non-null count: zero nulls here
      val lr = fresh.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
            if l.catalogTable.exists(_.stats.isDefined) => l
      }
      val cs = lr.head.catalogTable.get.stats.get.colStats("id")
      assert(cs.nullCount.contains(BigInt(0)) && cs.min.contains("0") &&
        cs.max.contains("199999"), s"colStats drifted: $cs")

      // an UPDATE of the FILTER COLUMN ITSELF unsets exactly its
      // colStats — the selectivity evidence is honestly gone, so the
      // CBO plan reverts to the shuffle — while the row-preserving
      // fold keeps the OTHER column's colStats and the exact rowCount
      t.update("id = 0", Map("k" -> "k"))
      val unsetK = filtered
      assert(broadcastJoins(unsetK) == 0,
        s"unset colStats must not keep steering CBO\n${unsetK.queryExecution.executedPlan}")
      val lr2 = unsetK.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
            if l.catalogTable.exists(_.stats.isDefined) => l
      }
      val st2 = lr2.head.catalogTable.get.stats.get
      assert(!st2.colStats.contains("k"), "the assigned column's colStats must unset")
      assert(st2.colStats.contains("id") && st2.rowCount.contains(BigInt(200000)),
        "unassigned colStats and the exact rowCount must survive the update fold")
      // a genuine rewrite (overwrite) kills everything: the row
      // estimate disappears with the stamp
      t.overwrite(spark.range(200000).toDF("id")
        .withColumn("k", col("id"))
        .withColumn("pad", sha2(col("id").cast("string"), 256)).repartition(2))
      assert(t.toDF.filter(col("k") < 2000).queryExecution.optimizedPlan
        .stats.rowCount.isEmpty, "stale stats must drop the row estimate")
    } finally spark.conf.set(conf, old)
  }
}
