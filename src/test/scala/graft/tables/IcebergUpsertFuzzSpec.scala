package graft.tables

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Model-based fuzz of the Iceberg upsert lifecycle: random interleavings
  * of appends (duplicate keys allowed), equality deletes (kill every
  * EARLIER row with the key, spare later re-inserts), predicate deletes
  * (position files), and compaction — checked after every operation
  * against an in-memory model, through BOTH read paths (the direct
  * merge-on-read reader and the TxTable surface that folds deletes into
  * bitmaps), and at the end against the changelog's signed fold. The
  * deterministic seeds make a failure replayable.
  */
class IcebergUpsertFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runProgram(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val loc = TestSpark.tmpDir(s"ice-fuzz-$seed") + "/t"
    val t = TxTable.forIceberg(spark, loc)
    // model: one entry per LIVE row — (key, value); the sequence rule is
    // modeled by construction (an equality delete only sees rows already
    // appended, never later re-inserts)
    var model = Vector.empty[(Long, String)]
    var rowId = 0
    // round-16: the column-stats stamp must stay FRESH across the whole
    // upsert lifecycle (appends fold, predicate deletes fold, EQUALITY
    // deletes fold, compaction restamps) — the one legitimate bail is a
    // delete that empties the table (live==0: the NULL/0 boundary isn't
    // always provable, and a re-ANALYZE of nothing is free), after which
    // staleness is sticky until a re-ANALYZE the program never issues
    var expectFresh = true

    def appendBatch(): Unit = {
      val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
        rowId += 1
        (rnd.nextInt(8).toLong, s"v$rowId")
      }
      if (model.isEmpty && !TxLog.exists(spark, loc) &&
          !IcebergLog.isIcebergTable(spark, loc))
        t.create(rows.toDF("k", "v"))
      else t.append(rows.toDF("k", "v"))
      model ++= rows
    }
    appendBatch() // create
    ColumnStats.analyze(t, Seq("k"))

    def check(where: String): Unit = {
      val expected = model.sorted
      val direct = IcebergLog.toDF(spark, loc)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(direct == expected, s"[$seed/$where] direct read diverged")
      val folded = t.toDF
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(folded == expected, s"[$seed/$where] TxTable folded read diverged")
      val snap = t.snapshot
      if (expectFresh) {
        assert(ColumnStats.isFresh(snap),
          s"[$seed/$where] stamp must stay fresh across folds")
        assert(ColumnStats.currentSumBig(snap, "k")
          == Some(Some(model.map(r => BigInt(r._1)).sum)),
          s"[$seed/$where] folded SUM diverged from the model")
        assert(ColumnStats.currentCount(snap, "k") == Some(model.size.toLong),
          s"[$seed/$where] folded COUNT diverged from the model")
      } else if (ColumnStats.isFresh(snap)) {
        // staleness is the EXPECTED outcome but freshness is not a bug
        // per se — if a path restamps, its values must still be exact
        assert(ColumnStats.currentSumBig(snap, "k")
          == Some(Some(model.map(r => BigInt(r._1)).sum)),
          s"[$seed/$where] a restamped SUM must be exact")
      }
    }

    (1 to ops).foreach { op =>
      val wasEmpty = model.isEmpty
      rnd.nextInt(100) match {
        case n if n < 45 => appendBatch()
        case n if n < 75 =>
          val keys = (0 until 1 + rnd.nextInt(2)).map(_ => rnd.nextInt(8).toLong).distinct
          IcebergWriter.equalityDelete(spark, loc, Seq("k"), keys.toDF("k"))
          model = model.filterNot { case (k, _) => keys.contains(k) }
        case n if n < 90 =>
          val k = rnd.nextInt(8)
          t.delete(s"k = $k")
          model = model.filterNot(_._1 == k.toLong)
        case _ =>
          t.optimizeCompact(minFileBytes = 1L << 20)
      }
      // the one legitimate bail: a delete emptied the table
      if (model.isEmpty && !wasEmpty) expectFresh = false
      check(s"op$op")
    }

    // the signed changelog fold must converge to the final state
    val ch = IcebergLog.tableChanges(spark, loc, 1L)
    val folded = ch.groupBy("k", "v")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("_change_type") === "insert", 1L)
          .otherwise(-1L)).as("n"))
      .filter(org.apache.spark.sql.functions.col("n") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(folded == model.sorted, s"[$seed] changelog fold diverged")
  }

  test("random upsert programs agree with the model on both read paths and the changelog") {
    Seq(11L, 42L, 1337L).foreach(runProgram(_, ops = 10))
  }
}
