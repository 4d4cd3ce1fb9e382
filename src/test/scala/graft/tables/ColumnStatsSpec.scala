package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge cases of the stamped-extremes codec and fold: SQL-NULL
  * extremes (empty/all-null columns), NaN ordering, non-BMP unicode
  * (UTF-8 binary vs UTF-16 code-unit order diverge exactly there), and
  * the append fold across all of them — each checked DIFFERENTIALLY
  * against a scan of the same session (the one authority on Spark's
  * own ordering semantics).
  */
class ColumnStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stampedVsScan(t: TxTable, colName: String): Unit = {
    val snap = t.snapshot
    val scan = t.toDF.agg(min(col(colName)), max(col(colName))).collect()(0)
    def ext(isMin: Boolean): Any =
      ColumnStats.currentMinMax(snap, colName, isMin) match {
        case Some(v) => v.map {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
          case other => other
        }.orNull
        case None => fail(s"stamp for $colName must be fresh and present")
      }
    def eqv(a: Any, b: Any): Boolean = (a, b) match {
      case (x: java.lang.Double, y: java.lang.Double) =>
        (x.isNaN && y.isNaN) || x == y
      case (x: java.lang.Float, y: java.lang.Float) =>
        (x.isNaN && y.isNaN) || x == y
      case _ => a == b
    }
    assert(eqv(ext(isMin = true), scan.get(0)),
      s"MIN($colName): stamp ${ext(isMin = true)} vs scan ${scan.get(0)}")
    assert(eqv(ext(isMin = false), scan.get(1)),
      s"MAX($colName): stamp ${ext(isMin = false)} vs scan ${scan.get(1)}")
  }

  test("empty and all-null columns stamp SQL NULL extremes") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-null") + "/t")
    t.create(Seq((1L, null: String), (2L, null: String)).toDF("id", "s"))
    ColumnStats.analyze(t, Seq("id", "s"))
    stampedVsScan(t, "s") // all-null -> both extremes NULL
    stampedVsScan(t, "id")
    // a fold of MORE nulls keeps NULL; a fold of a real value replaces it
    t.append(Seq((3L, null: String)).toDF("id", "s"))
    stampedVsScan(t, "s")
    t.append(Seq((4L, "zz")).toDF("id", "s"))
    stampedVsScan(t, "s")
    assert(ColumnStats.currentMinMax(t.snapshot, "s", isMin = true)
      .get.get.toString == "zz")
  }

  test("delete fold decides SUM's SQL NULL boundary from the folded non-null count") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-sumnull") + "/t")
    // k carries values ONLY on rows 10..19; elsewhere null
    t.create((0 until 30).map(i =>
      (i.toLong, if (i >= 10 && i < 20) java.lang.Long.valueOf(i) else null))
      .toDF("id", "k"))
    ColumnStats.analyze(t, Seq("id", "k"))
    assert(ColumnStats.currentSum(t.snapshot, "k").contains(Some((10L until 20L).sum)))
    // remove EVERY non-null k value: a scan now answers SUM(k) = NULL,
    // and the folded count (10 - 10 = 0) must stamp exactly that
    t.delete("k IS NOT NULL")
    assert(ColumnStats.isFresh(t.snapshot), "provable delete must fold")
    assert(ColumnStats.currentSum(t.snapshot, "k").contains(None),
      "zero non-null values remaining serves SQL NULL, never 0")
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((0L until 30L).sum - (10L until 20L).sum)))
    // deleting the LAST row leaves an empty table: un-stampable shapes
    // (COUNT semantics etc.) — honest bail to stale
    t.delete("id >= 0")
    assert(!ColumnStats.isFresh(t.snapshot),
      "an emptied table must go stale, not serve stamped shapes")
  }

  test("per-partition sketches: stamp, append fold, merge, cap") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-pkmv") + "/t")
    t.create((0 until 300).map(i => (i.toLong, s"p${i % 3}", i % 50))
      .toDF("id", "p", "k").repartition(2), partitionColumns = Seq("p"))
    ColumnStats.analyze(t, Seq("id", "k"))
    val snap = t.snapshot
    val tuples = ColumnStats.currentPartitionTuples(snap).get
    assert(tuples.toSet == Set(Seq("p0"), Seq("p1"), Seq("p2")))
    // exact regime: merged distinct counts equal true counts
    def ndvOf(parts: Set[String], c: String): Long = {
      val ts = ColumnStats.currentPartitionTuples(t.snapshot).get
      val keep = ts.zipWithIndex.collect { case (tp, i) if parts(tp.head) => i }
      ColumnStats.mergedPartitionNdv(t.snapshot, c, keep).get
    }
    assert(ndvOf(Set("p0"), "id") == 100L)
    assert(ndvOf(Set("p0", "p2"), "id") == 200L)
    // k's values repeat across partitions: the merge must DEDUP them
    // (50 distinct overall, ~17 per partition)
    assert(ndvOf(Set("p0", "p1", "p2"), "k") == 50L)
    // an append folds per partition AND extends the tuple list
    t.append(Seq((1000L, "p0", 999), (1001L, "p9", 999)).toDF("id", "p", "k"))
    assert(ColumnStats.isFresh(t.snapshot), "per-partition fold must stay fresh")
    assert(ColumnStats.currentPartitionTuples(t.snapshot).get.size == 4)
    assert(ndvOf(Set("p0"), "id") == 101L)
    assert(ndvOf(Set("p9"), "id") == 1L)
    assert(ndvOf(Set("p0", "p9"), "k") == 51L) // 999 planted in both
    // crossing the tuple cap drops ONLY the per-partition layer; the
    // table-wide stats keep folding
    t.append((0 until ColumnStats.MaxStampedPartitions + 5)
      .map(i => (2000L + i, s"q$i", 0)).toDF("id", "p", "k"))
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentPartitionTuples(t.snapshot).isEmpty,
      "beyond the cap the per-partition layer unsets")
    assert(ColumnStats.currentNdv(t.snapshot, "id").contains(
      300L + 2L + ColumnStats.MaxStampedPartitions + 5L))
  }

  test("a NULL partition value rides the per-partition layer as a null tuple") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-pnull") + "/t")
    t.create(Seq((1L, "a"), (2L, "a"), (3L, null: String))
      .toDF("id", "p"), partitionColumns = Seq("p"))
    ColumnStats.analyze(t, Seq("id"))
    val tuples = ColumnStats.currentPartitionTuples(t.snapshot).get
    assert(tuples.toSet == Set(Seq("a"), Seq(null)))
    val nullIdx = tuples.indexWhere(_.head == null)
    assert(ColumnStats.mergedPartitionNdv(t.snapshot, "id", Seq(nullIdx)).contains(1L))
    assert(ColumnStats.mergedPartitionNdv(t.snapshot, "id",
      tuples.indices).contains(3L))
  }

  test("an UNPAIRED stamped extreme (manual UNSET) aborts the fold, never re-freshens") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-unpair") + "/t")
    t.create(Seq((1L, "b"), (5L, "m")).toDF("id", "s"))
    ColumnStats.analyze(t, Seq("id", "s"))
    // simulate an operator unsetting ONE half of a pair
    t.setProperties(Map(ColumnStats.MaxPropPrefix + "s" -> null))
    assert(ColumnStats.isFresh(t.snapshot), "property-only commit keeps the stamp fresh")
    // the append fold must ABORT (stamp goes stale), not silently drop
    // the column and restamp the surviving un-folded min as fresh
    t.append(Seq((9L, "a")).toDF("id", "s")) // new MIN for s rides the batch
    assert(!ColumnStats.isFresh(t.snapshot),
      "fold with an unpaired extreme must leave the stamp stale")
    assert(ColumnStats.currentMinMax(t.snapshot, "s", isMin = true).isEmpty,
      "a stale stamp must never serve the un-folded extreme")
  }

  test("NaN and negative-zero doubles follow Spark's ordering through the fold") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-nan") + "/t")
    t.create(Seq((1L, 1.5), (2L, -3.25)).toDF("id", "d"))
    ColumnStats.analyze(t, Seq("d"))
    stampedVsScan(t, "d")
    // NaN arrives by append: Spark treats NaN as the LARGEST double —
    // the folded max must agree with the scan
    t.append(Seq((3L, Double.NaN), (4L, 99.0)).toDF("id", "d"))
    stampedVsScan(t, "d")
    assert(ColumnStats.currentMinMax(t.snapshot, "d", isMin = false)
      .get.get.asInstanceOf[Double].isNaN)
    // -0.0 == 0.0 in SQL: folding the other sign is NOT a new extreme
    t.append(Seq((5L, -0.0), (6L, 0.0)).toDF("id", "d"))
    stampedVsScan(t, "d")
  }

  test("non-BMP strings: stamped extremes use UTF-8 binary order like Spark") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-utf") + "/t")
    // U+FFFF (BMP, 3-byte UTF-8) vs U+1F600 (supplementary, 4-byte):
    // UTF-16 code-unit order puts the surrogate pair FIRST, UTF-8 byte
    // order puts it LAST — exactly the divergence that would break a
    // java.lang.String-compared fold
    val bmpMax = "\uFFFF"
    val emoji = new String(Character.toChars(0x1F600))
    t.create(Seq((1L, bmpMax), (2L, "a")).toDF("id", "s"))
    ColumnStats.analyze(t, Seq("s"))
    stampedVsScan(t, "s")
    t.append(Seq((3L, emoji)).toDF("id", "s"))
    stampedVsScan(t, "s")
    assert(ColumnStats.currentMinMax(t.snapshot, "s", isMin = false)
      .get.get.toString == emoji,
      "the 4-byte supplementary char must be the UTF-8-binary max")
  }

  test("auto-compacting analyzed table: fold + compaction restamp chain stays fresh") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-ac") + "/t")
    t.create((0 until 300).map(i => (i.toLong, s"v${i % 25}")).toDF("id", "s"),
      properties = Map(
        TxTable.AutoCompactEnabledProp -> "true",
        TxTable.AutoCompactMinFilesProp -> "2",
        TxTable.AutoCompactMinFileBytesProp -> (1024L * 1024L).toString))
    ColumnStats.analyze(t, Seq("id", "s"))
    // each append leaves >=2 sub-threshold files -> auto-compaction runs
    // right after it; the fold lands FIRST, the OPTIMIZE restamp then
    // carries the refreshed stamp through the rewrite
    t.append(Seq((1000L, "v_x")).toDF("id", "s"))
    t.append(Seq((1001L, "v_y")).toDF("id", "s"))
    assert(t.describeHistory.select("operation").collect()
      .exists(_.getString(0) == "OPTIMIZE"), "auto-compaction must have fired")
    assert(ColumnStats.isFresh(t.snapshot),
      "fold + restamp must survive the append->compact chain")
    assert(ColumnStats.currentNdv(t.snapshot, "id").contains(302L))
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((0L until 300L).sum + 1000L + 1001L)))
  }

  test("a pure partition-drop DELETE keeps the per-partition layer; partial deletes unset it") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-pdrop") + "/t")
    t.create((0 until 300).map(i => (i.toLong, s"p${i % 3}", (i % 50).toLong))
      .toDF("id", "p", "k").repartition(2), partitionColumns = Seq("p"))
    // p rides too: a PARTITION column's table-wide stats derive from the
    // surviving tuple values + file row counts on a drop
    ColumnStats.analyze(t, Seq("id", "k", "p"))
    // the retention shape: whole partition p1 drops, nothing rewritten
    t.delete("p = 'p1'")
    val snap = t.snapshot
    assert(ColumnStats.isFresh(snap), "the drop must fold and restamp")
    val tuples = ColumnStats.currentPartitionTuples(snap).get
    assert(tuples.toSet == Set(Seq("p0"), Seq("p2")),
      "removed tuple drops, survivors reindex")
    // the table-wide sketch honestly cannot un-see the removed values...
    assert(ColumnStats.currentNdv(snap, "id").isEmpty)
    // ...but the surviving partitions' sketches never saw them
    assert(ColumnStats.mergedPartitionNdv(snap, "id", tuples.indices)
      .contains(200L))
    // the scalar folds ride the same restamp — DERIVED by recombining
    // the survivors' per-partition scalars, zero data read
    assert(ColumnStats.currentSum(snap, "id").contains(Some(
      (0L until 300L).filterNot(_ % 3 == 1).sum)))
    // k's extremes (0 and 49) had holders INSIDE the dropped partition —
    // subtraction would tie-drop the pair; recombination keeps it exact
    assert(ColumnStats.currentMinMax(snap, "k", isMin = true).contains(Some(0L)))
    assert(ColumnStats.currentMinMax(snap, "k", isMin = false).contains(Some(49L)))
    // a PARTITION column's extremes derive from the surviving tuples
    assert(ColumnStats.currentMinMax(snap, "p", isMin = false).map(_.map(_.toString))
      .contains(Some("p2")))
    // per-partition scalars are themselves queryable per surviving tuple
    assert(ColumnStats.mergedPartitionSum(snap, "id", tuples.indices).contains(Some(
      (0L until 300L).filterNot(_ % 3 == 1).sum)))
    assert(ColumnStats.mergedPartitionCount(snap, "k", Seq(0)).contains(100L))
    // appends keep folding the kept layer
    t.append(Seq((5000L, "p0", 999L)).toDF("id", "p", "k"))
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.mergedPartitionNdv(t.snapshot, "id",
      ColumnStats.currentPartitionTuples(t.snapshot).get.indices).contains(201L))
    // a delete that touches only PART of a partition is never a drop:
    // the layer unsets (stale-never-wrong) while scalars still fold
    t.delete("k = 7")
    assert(ColumnStats.isFresh(t.snapshot), "scalar folds still restamp")
    assert(ColumnStats.currentPartitionTuples(t.snapshot).isEmpty,
      "a partial delete must unset the per-partition layer")
  }

  test("an insert-only MERGE folds like an append; a matched rewrite invalidates") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-mrg") + "/t")
    t.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    ColumnStats.analyze(t, Seq("k", "v"))
    // disjoint keys: no target file is touched, the commit is an append
    t.merge(Seq((10L, "x"), (11L, "y")).toDF("k", "v"), "s.k = t.k")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    assert(ColumnStats.isFresh(t.snapshot),
      "an insert-only merge must fold, not invalidate")
    assert(ColumnStats.currentNdv(t.snapshot, "k").contains(5L))
    assert(ColumnStats.currentSum(t.snapshot, "k").contains(Some(1L + 2L + 3L + 10L + 11L)))
    assert(ColumnStats.currentMinMax(t.snapshot, "v", isMin = false)
      .get.get.toString == "y")
    // a merge that MATCHES rewrites values — never derivable, stamp dies
    t.merge(Seq((10L, "zz")).toDF("k", "v"), "s.k = t.k")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    assert(!ColumnStats.isFresh(t.snapshot),
      "a matched merge must invalidate (values changed)")
  }

  test("second moment: stamps, folds both ways, overflows to 'of', recombines on drop") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-sq") + "/t")
    t.create((1L to 10L).map(i => (i, i * i)).toDF("id", "v"))
    ColumnStats.analyze(t, Seq("id", "v"))
    def sq(c: String): Option[Option[BigInt]] =
      ColumnStats.currentSumSqBig(t.snapshot, c)
    // Σid² for 1..10 = 385; Σ(i²)² = Σi⁴
    assert(sq("id") == Some(Some(BigInt(385))))
    assert(sq("v") == Some(Some((1L to 10L).map(i => BigInt(i * i) * (i * i)).sum)))
    // append folds by addition
    t.append(Seq((11L, 121L)).toDF("id", "v"))
    assert(sq("id") == Some(Some(BigInt(385 + 121))))
    // a provable delete subtracts
    t.delete("id = 11")
    assert(sq("id") == Some(Some(BigInt(385))))
    // all rows deleted for a value-set: boundary to "null" via cnt
    t.delete("id >= 1")
    assert(sq("id") == Some(Some(BigInt(0))) || sq("id").isEmpty ||
      ColumnStats.currentCount(t.snapshot, "id").contains(0L))

    // overflow: two near-max longs square-sum past decimal(38,0) — the
    // stamp records the honest "of" marker (never a silent null), AVG
    // still serves from sum+cnt, VAR refuses
    val big = 9000000000000000000L // 9e18, square 8.1e37; ×2 > 1e38
    val t2 = new TxTable(spark, TestSpark.tmpDir("cs-sq-of") + "/t")
    t2.create(Seq(big, big).toDF("x"))
    ColumnStats.analyze(t2, Seq("x"))
    assert(t2.snapshot.properties(ColumnStats.SqPropPrefix + "x") == "of")
    assert(ColumnStats.currentSumSqBig(t2.snapshot, "x").isEmpty)
    assert(ColumnStats.currentSumBig(t2.snapshot, "x")
      == Some(Some(BigInt(big) * 2)))
    // a fold into an "of" stamp stays "of" (sticky)
    t2.append(Seq(1L).toDF("x"))
    assert(t2.snapshot.properties(ColumnStats.SqPropPrefix + "x") == "of")
    assert(ColumnStats.isFresh(t2.snapshot), "the fold itself must still land")

    // partition-drop recombination carries the per-tuple sq cells
    val t3 = new TxTable(spark, TestSpark.tmpDir("cs-sq-drop") + "/t")
    t3.create(
      (1L to 12L).map(i => (i, if (i <= 6) "a" else "b")).toDF("v", "p"),
      partitionColumns = Seq("p"))
    ColumnStats.analyze(t3, Seq("v"))
    t3.delete("p = 'a'")
    assert(ColumnStats.isFresh(t3.snapshot),
      "a pure partition drop must restamp fresh")
    assert(ColumnStats.currentSumSqBig(t3.snapshot, "v")
      == Some(Some((7L to 12L).map(i => BigInt(i) * i).sum)),
      "table-wide sq must recombine from the surviving partitions")
  }

  test("streaming-shaped idempotent appends fold; a replayed batch no-ops the stamp") {
    // the streaming sink path: every micro-batch lands via
    // appendIdempotent — each commit must FOLD (stamp stays fresh,
    // scan-free serving across the whole stream), and a crash-replayed
    // batch must no-op BOTH the data and the stamp
    val t = new TxTable(spark, TestSpark.tmpDir("cs-stream") + "/t")
    t.create((1L to 100L).toDF("v"))
    ColumnStats.analyze(t, Seq("v"))
    (0L until 3L).foreach { b =>
      t.appendIdempotent((1L to 50L).map(_ + 100L * (b + 1)).toDF("v"), "streamapp", b)
      assert(ColumnStats.isFresh(t.snapshot), s"batch $b must fold, not invalidate")
    }
    val expect = BigInt((1L to 100L).sum) +
      (0L until 3L).map(b => BigInt((1L to 50L).map(_ + 100L * (b + 1)).sum)).sum
    assert(ColumnStats.currentSumBig(t.snapshot, "v") == Some(Some(expect)))
    // replay of an already-committed batch id: no data, no stamp drift
    t.appendIdempotent((9000L to 9050L).toDF("v"), "streamapp", 1L)
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentSumBig(t.snapshot, "v") == Some(Some(expect)),
      "a replayed batch must not re-fold")
  }

  test("update fold: assigned column's cells unset table-wide AND per-tuple") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-upd") + "/t")
    t.create((0 until 200).map(i =>
        (i.toLong, s"s$i", Seq("a", "b")(i % 2))).toDF("k", "s", "p"),
      partitionColumns = Seq("p"))
    ColumnStats.analyze(t, Seq("k", "s"))
    t.update("k = 7", Map("s" -> "'zz'"))
    val props = t.snapshot.properties
    assert(ColumnStats.isFresh(t.snapshot), "the update must fold")
    // table-wide: s gone, k kept
    assert(!props.contains(ColumnStats.NdvPropPrefix + "s"))
    assert(props.contains(ColumnStats.NdvPropPrefix + "k"))
    assert(ColumnStats.currentSumBig(t.snapshot, "k")
      .contains(Some(BigInt((0L until 200L).sum))))
    // per-tuple: s cells gone, k cells survive (rows never moved
    // between partitions — the multiset per tuple is invariant)
    assert(!props.keys.exists(_.startsWith(ColumnStats.PkmvPropPrefix + "s.")))
    assert(props.keys.count(_.startsWith(ColumnStats.PkmvPropPrefix + "k.")) == 2)
    assert(props.keys.count(_.startsWith(ColumnStats.PsumPropPrefix + "k.")) == 2)
    // assigning EVERY layer column removes the whole per-tuple layer
    // (pvals without cells would poison future folds), fingerprint
    // stays fresh for the COUNT(*)/planner surface
    ColumnStats.analyze(t, Seq("k", "s"))
    t.update("k = 9", Map("k" -> "k", "s" -> "s"))
    assert(ColumnStats.isFresh(t.snapshot))
    assert(!t.snapshot.properties.contains(ColumnStats.PvalsProp),
      "an all-columns update must not leave an orphaned pvals")
    // ...and a later append fold still lands (restamps cleanly)
    t.append(Seq((900L, "s900", "a")).toDF("k", "s", "p"))
    // assigning the PARTITION column itself bails: rows may move
    ColumnStats.analyze(t, Seq("k"))
    t.update("k = 8", Map("p" -> "'b'"))
    assert(!ColumnStats.isFresh(t.snapshot),
      "a partition-column assignment must leave the stamp stale")
  }

  test("a time-dependent DELETE predicate bails the fold — stale, never wrong") {
    // the fold re-evaluates the predicate in a FRESH query; Spark
    // freezes current_timestamp per query, so the fold's evaluation
    // could subtract a different row set than the rewrite removed —
    // the guard must leave the stamp stale instead
    val t = new TxTable(spark, TestSpark.tmpDir("cs-timedep") + "/t")
    t.create((1L to 100L).map(i =>
      (i, new java.sql.Timestamp(1600000000000L + i))).toDF("id", "ts"))
    ColumnStats.analyze(t, Seq("id"))
    t.delete("id < 50 AND ts < current_timestamp()")
    assert(!ColumnStats.isFresh(t.snapshot),
      "a current_timestamp predicate must not fold")
    // the deterministic twin folds fine
    ColumnStats.analyze(t, Seq("id"))
    t.delete("id = 60")
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentSumBig(t.snapshot, "id")
      .contains(Some(BigInt((50L to 100L).sum - 60L))))
    // zero-arg current-time functions parse as plain UnresolvedFunctions
    // that report deterministic=true — they must bail by NAME too
    for (pred <- Seq("id < 55 AND ts < timestamp_seconds(unix_timestamp())",
        "id >= 65 AND id < 70 AND date(ts) < curdate()")) {
      ColumnStats.analyze(t, Seq("id"))
      t.delete(pred)
      assert(!ColumnStats.isFresh(t.snapshot),
        s"zero-arg current-time predicate must not fold: $pred")
    }
    // ...but unix_timestamp(ts) WITH an argument is deterministic and folds
    ColumnStats.analyze(t, Seq("id"))
    t.delete("unix_timestamp(ts) < 1600000000 + 65 AND id >= 70 AND id < 75")
    assert(ColumnStats.isFresh(t.snapshot),
      "argful unix_timestamp is deterministic — the fold must land")
  }

  test("past 64 tuples the partition layer moves to a SIDECAR; serves and folds survive") {
    def inlined(t: TxTable) =
      ColumnStats.withLayer(spark, t.location, t.snapshot)
    val t = new TxTable(spark, TestSpark.tmpDir("cs-side") + "/t")
    val nPart = 80 // past MaxStampedPartitions=64, the old layer death line
    t.create((0L until 800L).map(i => (i, s"p${i % nPart}"))
      .toDF("v", "p").repartition(8), partitionColumns = Seq("p"))
    ColumnStats.analyze(t, Seq("v"))
    val real = t.snapshot.properties
    assert(real.contains(ColumnStats.PsidecarProp), "80 tuples must go sidecar")
    assert(!real.contains(ColumnStats.PvalsProp) &&
      !real.keys.exists(_.startsWith(ColumnStats.PkmvPropPrefix)),
      "sidecar storage must keep the cells OUT of table properties")
    val snap = inlined(t)
    val tuples = ColumnStats.currentPartitionTuples(snap).get
    assert(tuples.size == nPart)
    // filtered exact SUM from the sidecar cells: partitions p0..p9
    val keepIdx = tuples.zipWithIndex
      .filter { case (tp, _) => tp.head.stripPrefix("p").toInt < 10 }.map(_._2)
    val expSum = (0L until 800L).filter(i => (i % nPart) < 10).sum
    assert(ColumnStats.mergedPartitionSum(snap, "v", keepIdx)
      == Some(Some(expSum.longValue)))
    // APPEND fold: existing partitions + one brand-new tuple — the
    // sidecar is rewritten, stamp stays fresh
    t.append(Seq((10000L, "p3"), (10001L, s"p$nPart")).toDF("v", "p"))
    assert(ColumnStats.isFresh(t.snapshot), "append must fold the sidecar layer")
    val snap2 = inlined(t)
    assert(ColumnStats.currentPartitionTuples(snap2).get.size == nPart + 1)
    assert(ColumnStats.currentSumBig(snap2, "v")
      == Some(Some(BigInt((0L until 800L).sum + 10000L + 10001L))))
    // retention DROP: whole partitions p70..p80 removed — metadata-only
    // keep, table-wide sum recombines from the sidecar survivors
    t.delete(s"p IN (${(70 to nPart).map(i => s"'p$i'").mkString(",")})")
    assert(ColumnStats.isFresh(t.snapshot), "a pure drop must keep the sidecar layer")
    val live = (0L until 800L).filter(i => (i % nPart) < 70) :+ 10000L
    assert(ColumnStats.currentSumBig(t.snapshot, "v")
      == Some(Some(live.map(BigInt(_)).sum)),
      "table-wide SUM must recombine from sidecar survivors, zero data read")
    val snap3 = inlined(t)
    assert(ColumnStats.currentPartitionTuples(snap3).get.size == 70)
    // shrink BELOW the inline cap: the layer migrates home to properties
    t.delete(s"p IN (${(10 to 69).map(i => s"'p$i'").mkString(",")})")
    assert(ColumnStats.isFresh(t.snapshot))
    val real4 = t.snapshot.properties
    assert(!real4.contains(ColumnStats.PsidecarProp),
      "a layer back under 64 tuples must migrate inline")
    assert(real4.contains(ColumnStats.PvalsProp))
    assert(ColumnStats.currentPartitionTuples(t.snapshot).get.size == 10)
    assert(ColumnStats.currentSumBig(t.snapshot, "v")
      == Some(Some(live.filter(v => v == 10000L || (v % nPart) < 10).map(BigInt(_)).sum)))
  }

  test("UPDATE fold rewrites a sidecar layer: assigned column's cells die, others serve") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-sideu") + "/t")
    val nPart = 70
    t.create((0L until 700L).map(i => (i, i * 2, s"p${i % nPart}"))
      .toDF("v", "w", "p").repartition(4), partitionColumns = Seq("p"))
    ColumnStats.analyze(t, Seq("v", "w"))
    assert(t.snapshot.properties.contains(ColumnStats.PsidecarProp))
    t.update("v = 5", Map("w" -> "w + 1"))
    assert(ColumnStats.isFresh(t.snapshot), "the update fold must land")
    val snap = ColumnStats.withLayer(spark, t.location, t.snapshot)
    // the OLD sidecar must not be pointed anymore; the new one must not
    // carry any w cells (a stale w cell re-validated by the fresh
    // fingerprint would serve pre-update values)
    assert(!snap.properties.keys.exists(k =>
      k.startsWith(ColumnStats.PkmvPropPrefix + "w.") ||
      k.startsWith(ColumnStats.PsumPropPrefix + "w.")),
      "assigned column's sidecar cells must die with the update")
    val tuples = ColumnStats.currentPartitionTuples(snap).get
    assert(tuples.size == nPart)
    // v untouched by the update: its cells keep serving
    val keepIdx = tuples.indices
    assert(ColumnStats.mergedPartitionSum(snap, "v", keepIdx)
      == Some(Some((0L until 700L).sum)))
  }

  test("Iceberg MoR position delete FOLDS the stamp (pinned at metadataVersion+1)") {
    val t = TxTable.forIceberg(spark, TestSpark.tmpDir("cs-icemor") + "/t")
    t.create((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"))
    ColumnStats.analyze(t, Seq("id"))
    // a row-level predicate no partition tuple decides → the MoR
    // position-delete path, which now folds like the Delta DV path
    t.delete("id % 10 = 0")
    assert(ColumnStats.isFresh(t.snapshot),
      "the position delete must restamp fresh")
    val live = (1L to 100L).filterNot(_ % 10 == 0)
    assert(ColumnStats.currentSumBig(t.snapshot, "id")
      == Some(Some(live.map(BigInt(_)).sum)),
      "SUM must fold by subtracting exactly the deleted rows")
    assert(ColumnStats.currentCount(t.snapshot, "id") == Some(live.size.toLong))
    // a SECOND MoR delete folds again (old deletes applied at base)
    t.delete("id <= 5")
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentSumBig(t.snapshot, "id")
      == Some(Some(live.filter(_ > 5).map(BigInt(_)).sum)))
  }

  test("Iceberg EQUALITY delete FOLDS the stamp (Flink-upsert shape)") {
    val loc = TestSpark.tmpDir("cs-iceeq") + "/t"
    val t = TxTable.forIceberg(spark, loc)
    t.create((1L to 100L).map(i => (i, i * 2)).toDF("id", "v").repartition(3))
    ColumnStats.analyze(t, Seq("id", "v"))
    // the streaming-CDC shape: keys arrive as a content=2 delete file,
    // no predicate anywhere — pre-round-16 this invalidated the stamp
    IcebergWriter.equalityDelete(spark, loc, Seq("id"),
      (1L to 100L by 10L).toDF("id"))
    assert(ColumnStats.isFresh(t.snapshot),
      "the equality delete must fold, not invalidate")
    val live1 = (1L to 100L).filterNot(i => i % 10 == 1)
    assert(ColumnStats.currentSumBig(t.snapshot, "v")
      == Some(Some(live1.map(i => BigInt(i * 2)).sum)),
      "SUM must fold by subtracting exactly the keyed-out rows")
    assert(ColumnStats.currentCount(t.snapshot, "id") == Some(live1.size.toLong))
    // a SECOND equality delete folds again (prior victims applied at base)
    IcebergWriter.equalityDelete(spark, loc, Seq("id"), Seq(2L, 3L).toDF("id"))
    assert(ColumnStats.isFresh(t.snapshot))
    val live2 = live1.filterNot(i => i == 2L || i == 3L)
    assert(ColumnStats.currentSumBig(t.snapshot, "v")
      == Some(Some(live2.map(i => BigInt(i * 2)).sum)))
    // deleting keys that match NOTHING: no bitmap moves, the fingerprint
    // is literally unchanged — fresh without any fold work
    IcebergWriter.equalityDelete(spark, loc, Seq("id"), Seq(999999L).toDF("id"))
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentSumBig(t.snapshot, "v")
      == Some(Some(live2.map(i => BigInt(i * 2)).sum)))
  }

  test("equality-delete fold matches NULL keys null-safely (reader semantics)") {
    val loc = TestSpark.tmpDir("cs-iceeqnull") + "/t"
    val t = TxTable.forIceberg(spark, loc)
    val rows: Seq[(java.lang.Long, Long)] =
      Seq((1L: java.lang.Long, 10L), (2L: java.lang.Long, 20L),
        (null: java.lang.Long, 30L), (null: java.lang.Long, 40L),
        (3L: java.lang.Long, 50L))
    t.create(rows.toDF("k", "v"))
    ColumnStats.analyze(t, Seq("v"))
    // a NULL delete key kills the NULL-keyed rows — Iceberg equality is
    // null-safe (<=>), and the fold's subtraction must agree exactly
    IcebergWriter.equalityDelete(spark, loc, Seq("k"),
      Seq((null: java.lang.Long)).toDF("k"))
    assert(t.toDF.count() == 3L, "the reader kills both NULL-keyed rows")
    assert(ColumnStats.isFresh(t.snapshot), "the null-key delete must fold")
    assert(ColumnStats.currentSumBig(t.snapshot, "v")
      == Some(Some(BigInt(10L + 20L + 50L))))
  }

  test("partial-partition delete keeps the OTHER tuples' cells serving") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-partial") + "/t")
    val rows = (0L until 400L).map(i => (i, s"p${i % 4}"))
    t.create(rows.toDF("v", "p").repartition(4), partitionColumns = Seq("p"))
    ColumnStats.analyze(t, Seq("v"))
    // removes SOME rows of partition p1 only — not a pure drop (p1
    // keeps live rows), so pre-round-15 the whole layer died
    t.delete("p = 'p1' AND v < 100")
    assert(ColumnStats.isFresh(t.snapshot), "the delete must fold")
    val snap = t.snapshot
    val tuples = ColumnStats.currentPartitionTuples(snap).get
    assert(tuples.size == 4, "touched tuples stay LISTED (they hold live rows)")
    val idxOf = tuples.map(_.head).zipWithIndex.toMap
    // untouched tuples' cells serve exactly
    val keep02 = Seq(idxOf("p0"), idxOf("p2"))
    assert(ColumnStats.mergedPartitionSum(snap, "v", keep02)
      == Some(Some(rows.filter(r => r._2 == "p0" || r._2 == "p2").map(_._1).sum)))
    // the touched tuple's cells are honestly gone → unprovable → scan
    assert(ColumnStats.mergedPartitionSum(snap, "v", Seq(idxOf("p1"))).isEmpty,
      "touched tuple's cells must be unset, not stale")
    // table-wide SUM still folds via the subtraction arm
    val live = rows.filterNot(r => r._2 == "p1" && r._1 < 100)
    assert(ColumnStats.currentSumBig(snap, "v")
      == Some(Some(live.map(r => BigInt(r._1)).sum)))
    // a later append into an untouched partition still folds cell-wise:
    // p0 merges, p1 stays cell-less
    t.append(Seq((5000L, "p0"), (5001L, "p1")).toDF("v", "p"))
    assert(ColumnStats.isFresh(t.snapshot), "append must fold the partial layer")
    val snap2 = t.snapshot
    assert(ColumnStats.mergedPartitionSum(snap2, "v", Seq(idxOf("p0")))
      == Some(Some(rows.filter(_._2 == "p0").map(_._1).sum + 5000L)))
    assert(ColumnStats.mergedPartitionSum(snap2, "v", Seq(idxOf("p1"))).isEmpty,
      "a cell-less tuple must stay cell-less across folds (its older rows are unknown)")
    // a PURE drop of another partition (retention catching up) must not
    // kill the intact tuples' cells over the cell-less survivor p1:
    // survivors carry cell-wise, exactly the partial-keep's contract
    t.delete("p = 'p3'")
    assert(ColumnStats.isFresh(t.snapshot), "the pure drop must fold")
    val snap3 = t.snapshot
    val tuples3 = ColumnStats.currentPartitionTuples(snap3).get
    assert(tuples3.map(_.head).sorted == Seq("p0", "p1", "p2"),
      "dropped tuple delisted, cell-less survivor still listed")
    val idx3 = tuples3.map(_.head).zipWithIndex.toMap
    assert(ColumnStats.mergedPartitionSum(snap3, "v", Seq(idx3("p0")))
      == Some(Some(rows.filter(_._2 == "p0").map(_._1).sum + 5000L)),
      "intact tuples' cells must survive a pure drop over a cell-less peer")
    assert(ColumnStats.mergedPartitionSum(snap3, "v", Seq(idx3("p1"))).isEmpty,
      "the cell-less tuple stays cell-less (honest) across the drop")
    // table-wide SUM folds via the subtraction arm (the recombination
    // honestly bails on the cell-less survivor)
    val live3 = rows.filterNot(r => r._2 == "p1" && r._1 < 100)
      .filterNot(_._2 == "p3").map(r => BigInt(r._1)).sum + 5000L + 5001L
    assert(ColumnStats.currentSumBig(snap3, "v") == Some(Some(live3)))
  }

  test("vacuum reclaims orphaned sidecar files and keeps the pointed one") {
    val t = new TxTable(spark, TestSpark.tmpDir("cs-sweep") + "/t")
    t.create((0L until 700L).map(i => (i, s"p${i % 70}"))
      .toDF("v", "p").repartition(4), partitionColumns = Seq("p"))
    ColumnStats.analyze(t, Seq("v"))
    // a second analyze re-points; the first file becomes an orphan (the
    // in-writer sweep is age-gated, so both files exist right after)
    ColumnStats.analyze(t, Seq("v"))
    val pointed = t.snapshot.properties(ColumnStats.PsidecarProp)
    val fs = TxLog.fs(spark, t.location)
    val dir = new org.apache.hadoop.fs.Path(t.location, "_graft_stats")
    assert(fs.listStatus(dir).length >= 2, "both sidecar generations on disk")
    val planned = t.vacuumDryRun(retentionMs = 0L, force = true)
    assert(planned.exists(_.startsWith("_graft_stats/player-")),
      "vacuum must reclaim the orphaned sidecar")
    t.vacuum(retentionMs = 0L, force = true)
    val left = fs.listStatus(dir).map(_.getPath.getName).toSeq
    assert(left == Seq(pointed),
      s"only the pointed sidecar may survive, got $left")
    // the layer still serves after the vacuum
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentPartitionTuples(
      ColumnStats.withLayer(spark, t.location, t.snapshot)).get.size == 70)
  }

  test("timestamp and decimal extremes round-trip the stamp") {
    val ts1 = java.sql.Timestamp.valueOf("2001-02-03 04:05:06.789")
    val ts2 = java.sql.Timestamp.valueOf("2031-12-31 23:59:59.999999")
    val t = new TxTable(spark, TestSpark.tmpDir("cs-ts") + "/t")
    t.create(Seq((1L, ts1, BigDecimal("12.34")), (2L, ts2, BigDecimal("-99.99")))
      .toDF("id", "ts", "dec"))
    ColumnStats.analyze(t, Seq("ts", "dec"))
    val snap = t.snapshot
    assert(ColumnStats.currentMinMax(snap, "ts", isMin = false).get.isDefined)
    assert(ColumnStats.currentMinMax(snap, "dec", isMin = true)
      .get.get.asInstanceOf[org.apache.spark.sql.types.Decimal]
      .toJavaBigDecimal.compareTo(new java.math.BigDecimal("-99.99")) == 0)
  }
}
