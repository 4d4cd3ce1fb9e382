package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.FileType
import graft.client.LakehouseClient

/** Differential fuzz over the per-partition-sketch
  * APPROX_COUNT_DISTINCT rewrite: random partitioned tables × the
  * absorbed predicate family, every distinct set kept in the sketch's
  * EXACT regime (< pk per merged scope) so the served value must EQUAL
  * DuckDB-style COUNT(DISTINCT) recomputation — and the plan must be
  * scan-free. Non-absorbable predicates must keep the scan. Appends
  * fold the layer mid-stream; a table over the tuple cap pins the
  * honest bail (correct via scan).
  */
class PartitionNdvFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wherePool: Vector[(String, Boolean)] = Vector(
    // (predicate, absorbable)
    ("p = 'a'", true),
    ("p IN ('a', 'c')", true),
    ("p >= 'b'", true),
    ("p <> 'a'", true),
    ("p IS NULL", true),
    ("p IS NOT NULL", true),
    ("p LIKE 'a%'", true),
    ("p = 'a' OR p = 'b'", true),
    ("k > 5", false),           // non-partition: must scan
    ("p = 'a' AND k > 5", false))

  test("filtered APPROX_COUNT_DISTINCT == exact recomputation, scan-free under absorbed WHEREs") {
    val client = new LakehouseClient(spark)
    client.createCatalog("fuzzpndv")
    client.createSchema("fuzzpndv", "s")
    var rewritten = 0
    var total = 0
    (0 until 4).foreach { ti =>
      val rnd = new scala.util.Random(7000 + ti)
      val parts = Vector("a", "b", "c", null)
      val n = 40 + rnd.nextInt(200)
      val rows = (0 until n).map { i =>
        (i.toLong, parts(rnd.nextInt(parts.size)), rnd.nextInt(60).toLong)
      }
      val fileType = if (ti % 2 == 1) FileType.ICEBERG else FileType.DELTA
      val dir = TestSpark.tmpDir(s"fuzzpndv$ti")
      client.createAsTable(rows.toDF("id", "p", "k").repartition(1 + rnd.nextInt(3)),
        "fuzzpndv", "s", s"t$ti", fileType, s"$dir/t",
        partitionColumns = Seq("p"))
      spark.sql(s"ANALYZE TABLE fuzzpndv.s.t$ti COMPUTE STATISTICS FOR ALL COLUMNS")
      // half the tables append after the stamp: the layer must FOLD
      val extra =
        if (rnd.nextBoolean()) (0 until 1 + rnd.nextInt(40)).map { i =>
          ((n + i).toLong, parts(rnd.nextInt(parts.size)), (60 + rnd.nextInt(20)).toLong)
        } else Seq.empty
      if (extra.nonEmpty)
        client.getTxTable("fuzzpndv", "s", s"t$ti").append(extra.toDF("id", "p", "k"))
      // some tables then re-ANALYZE just k: over the FRESH stamp (the
      // append folded) the other columns' keys and layer cells MERGE
      // through, so the p/k serves below must keep answering scan-free
      // with unchanged values
      if (rnd.nextInt(3) == 0)
        spark.sql(s"ANALYZE TABLE fuzzpndv.s.t$ti COMPUTE STATISTICS FOR COLUMNS k")
      // a third of the tables then run a RETENTION delete (pure
      // partition drop) — BOTH backends take the whole-file fast path
      // now (Delta drops the files copy-on-write-free, Iceberg removes
      // them in a pinned metadata commit), so the layer must SURVIVE
      // and keep serving scan-free after the drop on either log
      val dropPred: Option[String] =
        if (rnd.nextInt(3) == 0) Some("p = 'b'")
        else None
      dropPred.foreach(pr => spark.sql(s"DELETE FROM fuzzpndv.s.t$ti WHERE $pr"))
      val all = (rows ++ extra).filterNot(r => dropPred.isDefined && r._2 == "b")
      all.toDF("id", "p", "k").createOrReplaceTempView(s"rawpndv$ti")
      (0 until 10).foreach { qi =>
        val (where, absorbable) = wherePool(rnd.nextInt(wherePool.size))
        val colName = if (rnd.nextBoolean()) "k" else "p"
        val q = spark.sql(
          s"SELECT APPROX_COUNT_DISTINCT(`$colName`) AS d FROM fuzzpndv.s.t$ti WHERE $where")
        val plan = q.queryExecution.executedPlan.toString
        total += 1
        // the SCALAR serves (SUM from per-partition sums; MIN of the
        // partition column via tuple values — footers refuse strings)
        // are EXACT whichever route executes: values must always match,
        // and an absorbable WHERE must serve them scan-free
        if (qi < 2) {
          val qs = spark.sql(s"""SELECT SUM(k) AS sk, MIN(p) AS mp, MAX(k) AS xk
            FROM fuzzpndv.s.t$ti WHERE $where""")
          val es = spark.sql(
            s"SELECT SUM(k), MIN(p), MAX(k) FROM rawpndv$ti WHERE $where")
          val got = qs.collect()(0)
          val want = es.collect()(0)
          (0 until 3).foreach { i =>
            assert(got.isNullAt(i) == want.isNullAt(i) &&
                (got.isNullAt(i) || got.get(i) == want.get(i)),
              s"scalar mismatch col $i for WHERE $where (drop=$dropPred): $got vs $want")
          }
          if (absorbable)
            assert(!qs.queryExecution.executedPlan.toString.contains("FileScan"),
              s"absorbed scalar aggregate must serve scan-free: WHERE $where")
        }
        if (absorbable) {
          // exact regime everywhere (<= 80 distinct values): the merged
          // sketch answer must EQUAL the exact filtered distinct count
          val exact = spark.sql(
            s"SELECT COUNT(DISTINCT `$colName`) FROM rawpndv$ti WHERE $where")
            .collect()(0).getLong(0)
          assert(q.collect()(0).getLong(0) == exact,
            s"value mismatch for WHERE $where on $colName (drop=$dropPred)\n$plan")
          assert(!plan.contains("FileScan"),
            s"absorbed predicate must serve scan-free: WHERE $where on $colName " +
              s"(drop=$dropPred)\n$plan")
          rewritten += 1
        } else {
          assert(plan.contains("FileScan"),
            s"non-absorbable predicate must keep the scan: WHERE $where\n$plan")
        }
        // the grouped rollup (GROUP BY the partition column): when it
        // serves from the sketches (scan-free) the exact-regime values
        // must EQUAL the recomputation; when it scans (null-keyed
        // groups, non-absorbable WHERE) the answer is Spark's own HLL++
        // ESTIMATE — group keys must match and values stay in its
        // documented error band
        if (qi == 0) {
          val g = spark.sql(
            s"""SELECT p, APPROX_COUNT_DISTINCT(k) AS d
               FROM fuzzpndv.s.t$ti WHERE $where GROUP BY p""")
          val servedMeta =
            !g.queryExecution.executedPlan.toString.contains("FileScan")
          val view = all.toDF("id", "p", "k")
          view.createOrReplaceTempView(s"rawpndv$ti")
          val exactG = spark.sql(
            s"SELECT p, COUNT(DISTINCT k) AS d FROM rawpndv$ti WHERE $where GROUP BY p")
          val got = g.collect().map(r =>
            (Option(r.get(0)), r.getLong(1))).toMap
          val want = exactG.collect().map(r =>
            (Option(r.get(0)), r.getLong(1))).toMap
          assert(got.keySet == want.keySet,
            s"grouped keys mismatch for WHERE $where (drop=$dropPred)")
          want.foreach { case (k2, exact) =>
            val v = got(k2)
            if (servedMeta)
              assert(v == exact,
                s"sketch-served group $k2 must be exact for WHERE $where " +
                  s"(drop=$dropPred): $v vs $exact")
            else
              assert(math.abs(v - exact) <= math.max(2L, (exact * 0.15).toLong),
                s"scanned HLL++ group $k2 out of band for WHERE $where: $v vs $exact")
          }
        }
      }
    }
    assert(rewritten >= total / 2, s"only $rewritten of $total served — generator drifted?")
  }

  test("past the inline cap the layer goes SIDECAR and keeps serving (fuzzed)") {
    // the shape the 64-tuple inline cap used to kill: 70-90 partition
    // tuples, random absorbed predicates, an append FOLD mid-stream
    // (sidecar rewritten), a third of runs a retention drop. Every
    // served value must equal exact recomputation (distinct counts kept
    // inside the sketch's exact regime) and the plan must be scan-free.
    val client = new LakehouseClient(spark)
    client.createCatalog("fuzzside")
    client.createSchema("fuzzside", "s")
    (0 until 3).foreach { ti =>
      val rnd = new scala.util.Random(9100 + ti)
      val m = 70 + rnd.nextInt(20)
      val rows = (0 until m * 6).map(i =>
        (i.toLong, f"p${i % m}%03d", (i % 9).toLong))
      val fileType = if (ti % 2 == 1) FileType.ICEBERG else FileType.DELTA
      val dir = TestSpark.tmpDir(s"fuzzside$ti")
      client.createAsTable(rows.toDF("id", "p", "k").repartition(2),
        "fuzzside", "s", s"t$ti", fileType, s"$dir/t", partitionColumns = Seq("p"))
      spark.sql(s"ANALYZE TABLE fuzzside.s.t$ti COMPUTE STATISTICS FOR ALL COLUMNS")
      val t = client.getTxTable("fuzzside", "s", s"t$ti")
      assert(t.snapshot.properties.contains(graft.tables.ColumnStats.PsidecarProp),
        s"$m tuples must stamp the sidecar layer")
      // append fold: existing + one new partition — sidecar rewritten
      val extra = (0 until 20).map(i =>
        ((m * 6 + i).toLong, if (i % 2 == 0) "p001" else f"p$m%03d", (9 + i % 3).toLong))
      t.append(extra.toDF("id", "p", "k"))
      assert(graft.tables.ColumnStats.isFresh(t.snapshot),
        "the append must fold the sidecar layer")
      // a third of runs a whole-partition retention drop; another third
      // a PARTIAL delete inside p005 — the other tuples' cells must
      // survive (scopes touching p005 honestly scan, values stay right)
      val arm = rnd.nextInt(3)
      val dropPred = if (arm == 0) Some("p >= 'p060'") else None
      val partial = arm == 1
      dropPred.foreach(pr => spark.sql(s"DELETE FROM fuzzside.s.t$ti WHERE $pr"))
      if (partial)
        spark.sql(s"DELETE FROM fuzzside.s.t$ti WHERE p = 'p005' AND id % 2 = 0")
      val all = (rows ++ extra)
        .filterNot(r => dropPred.isDefined && r._2 >= "p060")
        .filterNot(r => partial && r._2 == "p005" && r._1 % 2 == 0)
      val pool = Vector("p < 'p010'", "p IN ('p001','p037','p055')",
        "p >= 'p050'", "p IS NOT NULL", "p LIKE 'p01%'")
      val touchesPartial = Set("p < 'p010'", "p IS NOT NULL")
      (0 until 6).foreach { qi =>
        val where = pool((qi + rnd.nextInt(pool.size)) % pool.size)
        val q = spark.sql(s"""SELECT APPROX_COUNT_DISTINCT(k) AS d,
            SUM(k) AS sk FROM fuzzside.s.t$ti WHERE $where""")
        val plan = q.queryExecution.executedPlan.toString
        if (partial && touchesPartial(where))
          assert(plan.contains("FileScan"),
            s"a scope touching the partially-deleted tuple must scan [$where]")
        else
          assert(!plan.contains("FileScan"),
            s"sidecar layer must serve [$where]\n$plan")
        val kept = all.filter { r =>
          val p = r._2
          where match {
            case "p < 'p010'" => p < "p010"
            case "p IN ('p001','p037','p055')" => Set("p001", "p037", "p055")(p)
            case "p >= 'p050'" => p >= "p050"
            case "p IS NOT NULL" => true
            case _ => p.startsWith("p01")
          }
        }
        val r = q.collect()(0)
        assert(r.getLong(0) == kept.map(_._3).distinct.size.toLong,
          s"exact-regime sidecar NDV [$where]")
        assert(r.getLong(1) == kept.map(_._3).sum, s"sidecar SUM [$where]")
      }
    }
  }

  test("past the sidecar byte budget the layer bails honestly; correct via scan") {
    // 4 integral columns x >1024 tuples exceeds SidecarKmvBytes even at
    // the smallest candidate k — nothing per-partition may stamp, the
    // filtered serve keeps the scan, the answer stays right
    val client = new LakehouseClient(spark)
    client.createCatalog("fuzzsidecap")
    client.createSchema("fuzzsidecap", "s")
    val m = 1040
    val rows = (0 until m).map(i =>
      (i.toLong, (i % 7).toLong, (i % 5).toLong, (i % 3).toLong, f"p$i%04d"))
    val dir = TestSpark.tmpDir("fuzzside-cap")
    client.createAsTable(rows.toDF("a", "b", "c", "d", "p").repartition(1),
      "fuzzsidecap", "s", "t", FileType.DELTA, s"$dir/t", partitionColumns = Seq("p"))
    spark.sql("ANALYZE TABLE fuzzsidecap.s.t COMPUTE STATISTICS FOR ALL COLUMNS")
    val t = client.getTxTable("fuzzsidecap", "s", "t")
    assert(!t.snapshot.properties.contains(graft.tables.ColumnStats.PsidecarProp) &&
      !t.snapshot.properties.contains(graft.tables.ColumnStats.PvalsProp),
      "over the byte budget nothing per-partition may stamp")
    val q = spark.sql(
      "SELECT APPROX_COUNT_DISTINCT(b) AS d FROM fuzzsidecap.s.t WHERE p = 'p0001'")
    assert(q.queryExecution.executedPlan.toString.contains("FileScan"),
      "capped layer must fall back to the scan")
    assert(q.collect()(0).getLong(0) == 1L)
  }
}
