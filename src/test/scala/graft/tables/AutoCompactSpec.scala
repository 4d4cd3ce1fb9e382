package graft.tables

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Opt-in post-write auto-compaction: once a partition tuple accumulates
  * `graft.autoCompact.minFiles` sub-threshold files, the write that
  * crossed the line is followed by an incremental compaction commit —
  * debris never outlives the write that created it.
  */
class AutoCompactSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val props = Map(
    TxTable.AutoCompactEnabledProp -> "true",
    TxTable.AutoCompactMinFilesProp -> "4")

  test("appends past the file threshold trigger a follow-on compaction commit") {
    val loc = TestSpark.tmpDir("autocompact") + "/t"
    val t = new TxTable(spark, loc)
    t.create(Seq((1L, "a")).toDF("id", "s"), properties = props)
    (2L to 4L).foreach(i => t.append(Seq((i, "x")).toDF("id", "s")))
    // 4 single-file commits -> the 4th append crosses minFiles=4 and
    // compacts them into one file in a follow-on OPTIMIZE commit
    val snap = t.snapshot
    assert(snap.files.size == 1, s"expected 1 compacted file, got ${snap.files.size}")
    assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq == (1L to 4L))
    // the compaction is its own commit AFTER the triggering append
    assert(TxLog.commitsBetween(spark, loc, -1L, None).last.operation == "OPTIMIZE")
  }

  test("below the threshold and without the property, nothing compacts") {
    val loc = TestSpark.tmpDir("autocompact-off") + "/t"
    val t = new TxTable(spark, loc)
    t.create(Seq((1L, "a")).toDF("id", "s"), properties = props)
    t.append(Seq((2L, "b")).toDF("id", "s"))           // 2 files < minFiles
    assert(t.snapshot.files.size == 2)

    val loc2 = TestSpark.tmpDir("autocompact-off2") + "/t"
    val t2 = new TxTable(spark, loc2)
    t2.create(Seq((1L, "a")).toDF("id", "s"))          // property absent
    (2L to 8L).foreach(i => t2.append(Seq((i, "x")).toDF("id", "s")))
    assert(t2.snapshot.files.size == 8)
  }

  test("partitioned: only the tuple holding the debris is rewritten") {
    val loc = TestSpark.tmpDir("autocompact-part") + "/t"
    val t = new TxTable(spark, loc)
    t.create(Seq((0L, "keep", "p1"), (1L, "keep", "p2")).toDF("id", "s", "pt"),
      partitionColumns = Seq("pt"), properties = props)
    val p2Before = t.snapshot.files.filter(_.partitionValues.get("pt").contains("p2"))
    // create file + three appends = 4 files in p1 -> the 4th crosses the
    // threshold and folds them
    (2L to 4L).foreach(i => t.append(Seq((i, "x", "p1")).toDF("id", "s", "pt")))
    val snap = t.snapshot
    val p1 = snap.files.filter(_.partitionValues.get("pt").contains("p1"))
    val p2 = snap.files.filter(_.partitionValues.get("pt").contains("p2"))
    assert(p1.size == 1, s"p1 debris must fold to one file, got ${p1.size}")
    assert(p2.map(_.path) == p2Before.map(_.path), "untouched tuple must keep its file")
    assert(t.toDF.count() == 5)
  }
}
