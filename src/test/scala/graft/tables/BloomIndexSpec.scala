package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** File-level Bloom file-skipping index (BloomIndex): sidecar build,
  * incremental refresh, point-lookup pruning, conservatism on
  * unindexed files, and vacuum survival.
  */
class BloomIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** id-disjoint files so stats DON'T prune on `tag` (all files share
    * the same tag range) — any pruning on `tag` is the bloom's doing.
    */
  private def mkTable(loc: String, nFiles: Int = 8, rowsPerFile: Int = 500): TxTable = {
    val t = new TxTable(spark, loc)
    def batch(i: Int) = (0 until rowsPerFile)
      .map(j => (i.toLong * rowsPerFile + j, s"tag_${i}_$j", s"v$j"))
      .toDF("id", "tag", "v").repartition(1)
    t.create(batch(0))
    (1 until nFiles).foreach(i => t.append(batch(i)))
    t
  }

  test("point lookup reads only files that might contain the key") {
    val loc = TestSpark.tmpDir("bloomidx")
    val t = mkTable(loc)
    assert(t.snapshot.files.size == 8)
    // without the index: min/max on tag can't separate tag_3_7 (string
    // ranges overlap: every file spans tag_<i>_0..tag_<i>_999-ish)...
    // actually tag_ prefixes differ per file, so use a column stats CAN'T
    // prune: probe `v`, identical range in every file
    assert(t.filesAfterPruning("v = 'v250'") == 8)
    BloomIndex.enable(t, Seq("tag"))
    // tag_3_7 lives in exactly one file; fpp 1% over 8 files makes a
    // false positive unlikely but legal — assert "at most 2", and exact
    // results regardless
    val n = t.filesAfterPruning("tag = 'tag_3_7'")
    assert(n >= 1 && n <= 2, s"expected ~1 file after bloom pruning, got $n")
    assert(t.scan("tag = 'tag_3_7'").collect().map(_.getLong(0)).toSeq == Seq(3L * 500 + 7))
    // absent key: zero files (every filter proves absence)
    assert(t.filesAfterPruning("tag = 'nope'") <= 1)
    assert(t.scan("tag = 'nope'").count() == 0)
  }

  test("IN lists, reversed equality, AND conjuncts; non-equality untouched") {
    val loc = TestSpark.tmpDir("bloomidx2")
    val t = mkTable(loc)
    BloomIndex.enable(t, Seq("tag", "id"))
    // IN over two keys in two different files
    val n = t.filesAfterPruning("tag IN ('tag_0_1', 'tag_7_2')")
    assert(n >= 2 && n <= 3)
    assert(t.scan("tag IN ('tag_0_1', 'tag_7_2')").count() == 2)
    // literal-first equality; integral key rendering
    assert(t.filesAfterPruning("1503 = id") <= 2)
    assert(t.scan("1503 = id").collect().map(_.getString(1)).toSeq == Seq("tag_3_3"))
    // AND: bloom conjunct prunes even when the other conjunct can't
    assert(t.filesAfterPruning("tag = 'tag_2_9' AND length(v) > 0") <= 2)
    assert(t.scan("tag = 'tag_2_9' AND length(v) > 0").count() == 1)
    // range predicates don't consult the index (and don't mis-prune)
    assert(t.scan("id >= 3999").count() == 1)
  }

  test("refresh is incremental and new unindexed files stay conservative") {
    val loc = TestSpark.tmpDir("bloomidx3")
    val t = mkTable(loc, nFiles = 4)
    BloomIndex.enable(t, Seq("tag"))
    assert(BloomIndex.refresh(t) == 0) // index current -> no work
    // new file, not yet indexed: lookups keep it (conservative), old
    // files still prune
    t.append(Seq((99999L, "tag_new_0", "vx")).toDF("id", "tag", "v").repartition(1))
    assert(t.scan("tag = 'tag_new_0'").count() == 1)
    val before = t.filesAfterPruning("tag = 'tag_new_0'")
    assert(before >= 1 && before <= 2) // the new file + possible fp, old 4 pruned
    assert(BloomIndex.refresh(t) == 1) // exactly the one missing pair
    assert(t.scan("tag = 'tag_new_0'").count() == 1)
  }

  test("anti-join existing-pair probe (big-index path) makes identical build decisions") {
    // Force the executor-side anti-join path with a zero threshold and
    // assert refresh builds EXACTLY what the collect path would have:
    // 0 pairs when current, exactly the new (file, col) pairs after an
    // append, and lookups still prune afterwards.
    val loc = TestSpark.tmpDir("bloomidx-anti")
    val t = mkTable(loc, nFiles = 4)
    spark.conf.set(BloomIndex.CollectThresholdConf, "0")
    try {
      BloomIndex.enable(t, Seq("tag", "id")) // build runs through the anti-join probe
      assert(BloomIndex.refresh(t) == 0)     // current -> no work, same as collect path
      t.append(Seq((99999L, "tag_new_0", "vx")).toDF("id", "tag", "v").repartition(1))
      assert(BloomIndex.refresh(t) == 2)     // exactly the new file x 2 indexed cols
      assert(BloomIndex.refresh(t) == 0)
      val n = t.filesAfterPruning("tag = 'tag_1_3'")
      assert(n >= 1 && n <= 2, s"expected ~1 file after bloom pruning, got $n")
      assert(t.scan("tag = 'tag_new_0'").count() == 1)
    } finally spark.conf.unset(BloomIndex.CollectThresholdConf)
  }

  test("compaction drops dead-file rows once they outnumber live pairs") {
    val loc = TestSpark.tmpDir("bloomidx-cmp")
    val t = mkTable(loc, nFiles = 6)
    BloomIndex.enable(t, Seq("tag"))
    def sidecarRows() = spark.read
      .parquet(s"$loc/${BloomIndex.IndexRoot}/bloom").count()
    assert(sidecarRows() == 6L)
    // full overwrite retires every indexed file -> all 6 rows dead
    // (round-robin repartition may leave an empty partition file, which
    // correctly gets NO sidecar row — only non-empty files index)
    t.overwrite((0 until 2)
      .map(j => (j.toLong, s"tag_new_$j", "v")).toDF("id", "tag", "v").repartition(2))
    val liveIdx = t.snapshot.files.count(_.rows != 0L).toLong
    // refresh builds the live pairs AND compacts the 6 dead rows away
    assert(BloomIndex.refresh(t) == liveIdx)
    assert(sidecarRows() == liveIdx, "dead rows must compact away")
    // results stay exact and lookups still prune through the new rows
    assert(t.scan("tag = 'tag_new_1'").count() == 1)
    assert(t.scan("tag = 'tag_0_1'").count() == 0)
    // idempotent: nothing left to build or drop
    assert(BloomIndex.refresh(t) == 0)
    assert(sidecarRows() == liveIdx)
    // explicit compact on a current index is a no-op
    assert(BloomIndex.compact(t) == 0L)
  }

  test("leftover sweep is age-gated: young compact dirs survive, old ones go") {
    val loc = TestSpark.tmpDir("bloomidx-sweep")
    val t = mkTable(loc, nFiles = 3)
    BloomIndex.enable(t, Seq("tag"))
    val fs = TxLog.fs(spark, loc)
    val young = new org.apache.hadoop.fs.Path(
      s"$loc/${BloomIndex.IndexRoot}/bloom.compact-young")
    fs.mkdirs(young)
    // default gate (1 h): a freshly-created dir may be a CONCURRENT
    // compact's live tmp — the sweep must leave it alone
    BloomIndex.compact(t)
    assert(fs.exists(young), "young leftover must survive the sweep")
    // with the gate at zero the same dir is provably a crash leftover
    val prev = BloomIndex.SweepAgeMs
    try {
      BloomIndex.SweepAgeMs = -1L
      BloomIndex.compact(t)
      assert(!fs.exists(young), "aged leftover must be reclaimed")
    } finally BloomIndex.SweepAgeMs = prev
  }

  test("guards: partition column, unsupported type, renamed-history iceberg refused") {
    val locP = TestSpark.tmpDir("bloomidx4")
    val tp = new TxTable(spark, locP)
    tp.create(Seq((1L, "a", 0.5)).toDF("id", "p", "x"), partitionColumns = Seq("p"))
    intercept[graft.catalog.UnsupportedOperationError](BloomIndex.enable(tp, Seq("p")))
    intercept[graft.catalog.UnsupportedOperationError](BloomIndex.enable(tp, Seq("x")))
    intercept[graft.catalog.UnsupportedOperationError](BloomIndex.enable(tp, Seq("nope")))
    // an Iceberg table whose history already contains a rename: an old
    // file could bind the indexed name to a different field id — refused
    val locI = TestSpark.tmpDir("bloomidx5")
    val ti = TxTable.forIceberg(spark, locI)
    ti.create(Seq((1L, "a")).toDF("id", "s"))
    ti.renameColumn("s", "s2")
    intercept[graft.catalog.UnsupportedOperationError](BloomIndex.enable(ti, Seq("s2")))
  }

  test("iceberg: index builds, prunes, and pins indexed columns against rename/drop") {
    val loc = TestSpark.tmpDir("bloomidx8")
    val t = TxTable.forIceberg(spark, loc)
    // row-major key, file-suffix last: every file's [min,max] on k spans
    // the full lexicographic range, so stats alone CANNOT prune — any
    // pruning observed below is the bloom's
    def batch(i: Int) = (0 until 400)
      .map(j => (i.toLong * 400 + j, s"k_${j}_$i")).toDF("id", "k").repartition(1)
    t.create(batch(0))
    (1 until 6).foreach(i => t.append(batch(i)))
    assert(t.filesAfterPruning("k = 'k_4_3'") == 6, "fixture: stats must not prune")
    BloomIndex.enable(t, Seq("k"))
    assert(t.filesAfterPruning("k = 'k_4_3'") <= 2)
    assert(t.scan("k = 'k_4_3'").collect().map(_.getLong(0)).toSeq == Seq(3L * 400 + 4))
    assert(t.scan("k = 'absent'").count() == 0)
    // renaming or dropping the indexed column would re-bind the sidecar
    // key to different data later — pinned while the index exists
    intercept[graft.catalog.UnsupportedOperationError](t.renameColumn("k", "k2"))
    intercept[graft.catalog.UnsupportedOperationError](t.dropColumn("k"))
    // non-indexed columns stay renameable
    t.renameColumn("id", "id2")
    assert(t.scan("k = 'k_4_3'").select("id2").collect().map(_.getLong(0)).toSeq
      == Seq(3L * 400 + 4))
    // disable removes the sidecar, lifts the pin; scans stay exact
    BloomIndex.disable(t)
    assert(t.filesAfterPruning("k = 'k_4_3'") == 6)
    assert(t.scan("k = 'k_4_3'").count() == 1)
    t.renameColumn("k", "k2")
    assert(t.scan("k2 = 'k_4_3'").count() == 1)
  }

  test("index works on a foreign (real _delta_log) table and survives vacuum") {
    val loc = TestSpark.tmpDir("bloomidx6")
    val df0 = (0 until 400).map(j => (j.toLong, s"k$j")).toDF("id", "k").repartition(1)
    DeltaLogWriter.create(spark, loc, df0)
    val t = TxTable.forForeignDelta(spark, loc)
    t.append((400 until 800).map(j => (j.toLong, s"k$j")).toDF("id", "k").repartition(1))
    BloomIndex.enable(t, Seq("k"))
    assert(t.filesAfterPruning("k = 'k650'") <= 2)
    assert(t.scan("k = 'k650'").collect().map(_.getLong(0)).toSeq == Seq(650L))
    // a rewrite (delete) + vacuum must not delete the sidecar
    t.delete("id = 10")
    t.vacuum(retentionMs = 0L, force = true)
    assert(t.scan("k = 'k650'").collect().map(_.getLong(0)).toSeq == Seq(650L))
    // rewritten file is unindexed until refresh -> conservative, exact
    assert(t.scan("k = 'k11'").count() == 1)
    assert(BloomIndex.refresh(t) >= 1)
    assert(t.scan("k = 'k11'").count() == 1)
    assert(t.scan("k = 'k10'").count() == 0) // deleted row stays deleted
  }

  test("schema-evolved column: old files prune to zero for new-column keys") {
    val loc = TestSpark.tmpDir("bloomidx7")
    val t = new TxTable(spark, loc)
    t.create((0 until 300).map(j => Tuple1(j.toLong)).toDF("id").repartition(1))
    t.append((0 until 300).map(j => (j + 1000L, s"s$j")).toDF("id", "s").repartition(1),
      evolution = graft.catalog.SchemaEvolution.MERGE)
    BloomIndex.enable(t, Seq("s"))
    // the old file has no `s` values at all -> its bloom is empty ->
    // provably absent for every key
    assert(t.filesAfterPruning("s = 's250'") == 1)
    assert(t.scan("s = 's250'").collect().map(_.getLong(0)).toSeq == Seq(1250L))
  }
}
