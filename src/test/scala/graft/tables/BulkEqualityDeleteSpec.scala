package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A BULK equality delete — the compliance-purge shape: one delete file
  * group carrying O(table keys) rows, not a Flink micro-batch. The three
  * victim joins (read-path bitmap fold, changelog delete feed, scan-time
  * anti-join) must leave the build-side choice to AQE: with the
  * broadcast threshold below the delete-key size, NONE of them may plan
  * a BroadcastHashJoin for the semi/anti join (a forced broadcast hint
  * would collect 10^7-10^8 purge keys onto the driver and every
  * executor). The metadata-sized path→sequence lookup joins still
  * broadcast — only the delete-row joins are pinned.
  */
class BulkEqualityDeleteSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def noBroadcastSemiOrAnti(plan: String, what: String): Unit = {
    val bad = plan.linesIterator.filter(l => l.contains("BroadcastHashJoin") &&
      (l.contains("LeftSemi") || l.contains("LeftAnti"))).toSeq
    assert(bad.isEmpty,
      s"$what must not broadcast the equality-delete rows above the AQE " +
        s"threshold; offending joins:\n${bad.mkString("\n")}\n\nfull plan:\n$plan")
  }

  test("bulk equality delete (1e5 keys, one group): correct and never force-broadcast") {
    import spark.implicits._
    val loc = graft.TestSpark.tmpDir("bulk-eqdel") + "/t"
    val n = 200000L
    val t = TxTable.forIceberg(spark, loc)
    t.create(spark.range(n).select(col("id"), (col("id") % 97).as("g"))
      .repartition(4))
    // ONE delete commit, one equality-ids group, 1e5 keys (even ids)
    IcebergWriter.equalityDelete(spark, loc, Seq("id"),
      spark.range(0L, n, 2L).toDF("id"))
    val deleteVersion = t.history.last

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
    try {
      // scan-time anti-join (applyEqualityDeletes inside the direct read)
      val direct = IcebergLog.toDF(spark, loc)
      assert(direct.count() == n / 2)
      assert(direct.agg(sum(col("id"))).as[Long].head() ==
        (1L until n by 2).sum)
      noBroadcastSemiOrAnti(direct.queryExecution.executedPlan.toString,
        "scan-time equality anti-join")

      // read-path victim scan (feeds the TxTable bitmap fold)
      val st = IcebergLog.state(spark, loc)
      val victims = IcebergLog.equalityVictimPositions(spark, st)
      assert(victims.count() == n / 2)
      noBroadcastSemiOrAnti(victims.queryExecution.executedPlan.toString,
        "bitmap-fold victim semi-join")

      // changelog delete feed (equalityDying)
      val ch = IcebergLog.tableChanges(spark, loc, deleteVersion, Some(deleteVersion))
      assert(ch.filter(col("_change_type") === "delete").count() == n / 2)
      noBroadcastSemiOrAnti(ch.queryExecution.executedPlan.toString,
        "changelog dying-rows semi-join")

      // the folded TxTable surface agrees (bitmaps built from the same scan)
      assert(t.toDF.count() == n / 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
