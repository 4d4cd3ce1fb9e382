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

      // a DELETE invalidates: behavior reverts EXACTLY to the
      // no-stats plan — stale stats must never keep steering the planner
      t.delete("id = 0")
      val stale = t.toDF.join(probe, "id")
      assert(broadcastJoins(stale) > 0,
        s"stale stats must not be served to the planner\n${stale.queryExecution.executedPlan}")
    } finally spark.conf.set(conf, old)
  }
}
