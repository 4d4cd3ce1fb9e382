package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.FileType
import graft.client.LakehouseClient

/** Differential fuzz over the metadata-only aggregate rewrites: random
  * partitioned tables × random aggregate/WHERE/GROUP BY combinations,
  * each query answered twice — through the catalog table (where the
  * MetadataOnlyCount rules may rewrite to a LocalRelation) and through a
  * plain temp view of the same rows (no tags, never rewritten). The two
  * must agree EXACTLY on every sample; additionally a healthy fraction
  * of the catalog-side plans must actually be scan-free, proving the
  * fuzz exercises the rewrite and not just its fallbacks.
  */
class MetadataAggFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // AVG rides the EXACT pool: both sides divide the same exactly-
  // representable integer sum (< 2^53 at fixture scale) by the same
  // count, so the doubles agree bit-for-bit
  private val aggPool = Vector(
    "COUNT(*)", "COUNT(k)", "COUNT(s)", "COUNT(p)", "MIN(id)", "MAX(id)",
    "MIN(k)", "MAX(k)", "MIN(s)", "SUM(id)", "SUM(k)", "AVG(k)", "AVG(id)",
    "COUNT(DISTINCT p)", // partition column: exact from the file list
    "COUNT(DISTINCT k)") // non-partition: must scan, stay exact
  private val wherePool = Vector(
    None,
    Some("p = 'a'"), Some("p IN ('a', 'c')"), Some("p >= 'b'"),
    Some("p BETWEEN 'a' AND 'b'"), Some("p = 'b' AND p <= 'c'"),
    Some("p < 'c'"), Some("'b' <= p"),
    Some("k > 5"),              // non-partition: must scan, stay exact
    Some("p = 'a' AND k > 5"),  // mixed: must scan, stay exact
    Some("p <> 'a'"),           // absorbed: nulls filtered, 'a' excluded
    Some("p <> 'a' AND p >= 'b'"),
    Some("p NOT IN ('a', 'd')"),
    Some("p IS NULL"),          // the one shape where null partitions are TRUE
    Some("p IS NOT NULL"),
    Some("p = 'a' OR p = 'b'"), // normalized to IN
    Some("p = 'a' OR p IN ('c', 'd')"),
    Some("p = 'a' OR k > 5"),   // mixed OR: must scan, stay exact
    Some("p LIKE 'a%'"),        // trailing-% prefix: absorbed
    Some("p NOT LIKE 'b%'"),
    Some("p LIKE '%a'"),        // leading %: must scan, stay exact
    Some("p LIKE 'a_'"),        // _ wildcard: must scan, stay exact
    // a REAL string value equal to the hive null-path sentinel must not
    // be conflated with SQL NULL by either side
    Some("p = '__HIVE_DEFAULT_PARTITION__'"))

  test("random tables x random aggregates: catalog answers == plain-view answers") {
    val client = new LakehouseClient(spark)
    client.createCatalog("fuzzmeta")
    client.createSchema("fuzzmeta", "s")
    var rewritten = 0
    var total = 0

    (0 until 6).foreach { ti =>
      val rnd = new scala.util.Random(1000 + ti)
      val n = rnd.nextInt(260) // 0-row tables included
      // p nullable: a null partition value lands in the hive default
      // partition on disk — three-valued logic + the sentinel handling
      // must agree exactly with the scan. Every third table ALSO plants
      // the sentinel as a REAL string value: hive-style storage cannot
      // represent it (Spark's own partition discovery reads the dir
      // back as NULL — the same conflation vanilla Spark has), so the
      // raw-view model applies the identical normalization below; the
      // metadata path must agree with the scan on those rows, whatever
      // route (decode or bail) it takes per backend.
      // (the sentinel REPLACES null in those pools: Spark's own dynamic
      // partition writer renders both to the same directory and a mixed
      // write collides — the conflation starts at write time)
      val parts =
        if (ti % 3 == 1) Vector("a", "b", "__HIVE_DEFAULT_PARTITION__", "d")
        else Vector("a", "b", "c", "d", null)
      val rows = (0 until n).map { i =>
        (i.toLong,
          parts(rnd.nextInt(parts.size)),
          rnd.nextInt(20),
          if (rnd.nextInt(5) == 0) null else s"s${rnd.nextInt(50)}")
      }
      val df = rows.toDF("id", "p", "k", "s")
      val dir = TestSpark.tmpDir(s"fuzzmeta$ti")
      // alternate backends: the same rules must hold over the native
      // log AND Iceberg manifests (different partition-value and path
      // renderings — exactly where a silent divergence hides)
      val fileType = if (ti % 3 == 2) FileType.ICEBERG else FileType.DELTA
      client.createAsTable(df.repartition(1 + rnd.nextInt(4)),
        "fuzzmeta", "s", s"t$ti", fileType, s"$dir/t",
        partitionColumns = Seq("p"))
      // half the tables get ANALYZE so SUM/APPROX serving paths engage
      if (ti % 2 == 0)
        spark.sql(s"ANALYZE TABLE fuzzmeta.s.t$ti COMPUTE STATISTICS FOR ALL COLUMNS")
      // ...and some of THOSE get post-ANALYZE appends: the stamp must
      // FOLD the batch (ColumnStats.foldAppend) and keep agreeing with
      // the scan exactly — the incremental-maintenance wrong-answer trap
      val extra =
        if (ti % 2 == 0 && rnd.nextBoolean()) (0 until 1 + rnd.nextInt(60)).map { i =>
          ((n + i).toLong,
            parts(rnd.nextInt(parts.size)),
            rnd.nextInt(20),
            if (rnd.nextInt(5) == 0) null else s"s${rnd.nextInt(50)}")
        } else Seq.empty
      if (extra.nonEmpty)
        client.getTxTable("fuzzmeta", "s", s"t$ti")
          .append(extra.toDF("id", "p", "k", "s").repartition(1 + rnd.nextInt(2)))
      // ...and sometimes OPTIMIZE on top: content-preserving, so a
      // folded stamp must survive via the fingerprint restamp and the
      // metadata answers must still agree exactly
      if (ti % 2 == 0 && rnd.nextBoolean())
        spark.sql(s"OPTIMIZE fuzzmeta.s.t$ti")
      // ...and some analyzed tables then take a DELETE: the delete fold
      // (SUM subtraction, tie-dropped extremes, honest NDV kill — since
      // round 15 on EVERY path incl. Iceberg MoR position deletes, with
      // partial-partition deletes keeping the untouched tuples' cells)
      // must keep agreeing with the scan EXACTLY — the fold wrong-answer
      // trap, delete form. Half the deletes are partition-scoped to
      // exercise the partial keep.
      val delK: Option[Int] =
        if (ti % 2 == 0 && rnd.nextBoolean()) Some(rnd.nextInt(20)) else None
      val delScoped = rnd.nextBoolean()
      val delPred = delK.map(kv =>
        if (delScoped) s"p = 'a' AND k = $kv" else s"k = $kv")
      delPred.foreach(pr =>
        client.getTxTable("fuzzmeta", "s", s"t$ti").delete(pr))
      // ...and sometimes an UPDATE on top: the round-14 update fold
      // unsets only the ASSIGNED column's stats while everything else
      // keeps serving — catalog answers must still equal the model's
      // EXACTLY across the s-column (reassigned) and every other
      val updK: Option[Int] =
        if (rnd.nextBoolean()) Some(rnd.nextInt(20)) else None
      updK.foreach(kv => client.getTxTable("fuzzmeta", "s", s"t$ti")
        .update(s"k = $kv", Map("s" -> "'upd'")))
      // the raw-view model applies the storage-level conflation: a REAL
      // sentinel-string partition value is unrepresentable in hive
      // layout and reads back as NULL (vanilla Spark behaves the same)
      val all = (rows ++ extra)
        .filterNot(r => delK.contains(r._3) && (!delScoped || r._2 == "a"))
        .map { case (id, p, k, s2) =>
          (id, if (p == "__HIVE_DEFAULT_PARTITION__") null else p, k,
            if (updK.contains(k)) "upd" else s2)
        }
      all.toDF("id", "p", "k", "s").createOrReplaceTempView(s"raw$ti")

      (0 until 14).foreach { qi =>
        val aggs = (0 to rnd.nextInt(2))
          .map(_ => aggPool(rnd.nextInt(aggPool.size))).distinct
          .zipWithIndex.map { case (a, j) => s"$a AS c$j" }.mkString(", ")
        val where = wherePool(rnd.nextInt(wherePool.size))
          .map(w => s" WHERE $w").getOrElse("")
        val group = if (rnd.nextInt(3) == 0) " GROUP BY p" else ""
        val select = if (group.nonEmpty) s"p, $aggs" else aggs
        val order = if (group.nonEmpty) " ORDER BY p" else ""
        val qCat = s"SELECT $select FROM fuzzmeta.s.t$ti$where$group$order"
        val qRaw = s"SELECT $select FROM raw$ti$where$group$order"
        val got = spark.sql(qCat)
        val want = spark.sql(qRaw).collect().map(_.toString).toSeq
        assert(got.collect().map(_.toString).toSeq == want,
          s"mismatch for: $qCat\nplan:\n${got.queryExecution.executedPlan}")
        total += 1
        val plan = got.queryExecution.executedPlan.toString
        if (!plan.contains("FileScan")) rewritten += 1
      }
    }
    // the fuzz must actually exercise the rewrite, not just fallbacks
    assert(rewritten >= total / 5,
      s"only $rewritten of $total plans were scan-free — generator drifted?")
  }

  // VAR/STDDEV live in their own loop: the served value is the exact
  // rational rounded once while the scan's Welford accumulation rounds
  // per row — equal only to ~1e-12 relative, so the compare is
  // tolerance-based instead of the exact row-string match above.
  test("variance fuzz: served central moments match the scan to rounding") {
    val client = new LakehouseClient(spark)
    client.createCatalog("fuzzvar")
    client.createSchema("fuzzvar", "s")
    val varPool = Vector("VAR_POP(k)", "VAR_SAMP(k)", "STDDEV_POP(k)",
      "STDDEV_SAMP(k)", "VAR_POP(id)", "STDDEV_SAMP(id)")
    var rewritten = 0
    var total = 0
    (0 until 4).foreach { ti =>
      val rnd = new scala.util.Random(7000 + ti)
      val n = rnd.nextInt(220) // includes 0- and 1-row shapes
      val parts = Vector("a", "b", "c", null)
      val rows = (0 until n).map { i =>
        (i.toLong, parts(rnd.nextInt(parts.size)), rnd.nextInt(40))
      }
      val df = rows.toDF("id", "p", "k")
      val dir = TestSpark.tmpDir(s"fuzzvar$ti")
      val fileType = if (ti % 2 == 1) FileType.ICEBERG else FileType.DELTA
      client.createAsTable(df.repartition(1 + rnd.nextInt(3)),
        "fuzzvar", "s", s"t$ti", fileType, s"$dir/t",
        partitionColumns = Seq("p"))
      spark.sql(s"ANALYZE TABLE fuzzvar.s.t$ti COMPUTE STATISTICS FOR ALL COLUMNS")
      // post-ANALYZE append: the sq fold must keep agreeing
      val extra = (0 until rnd.nextInt(40)).map { i =>
        ((n + i).toLong, parts(rnd.nextInt(parts.size)), rnd.nextInt(40))
      }
      if (extra.nonEmpty)
        client.getTxTable("fuzzvar", "s", s"t$ti").append(extra.toDF("id", "p", "k"))
      (rows ++ extra).toDF("id", "p", "k").createOrReplaceTempView(s"rawvar$ti")
      (0 until 10).foreach { qi =>
        val a = varPool(rnd.nextInt(varPool.size))
        val where = Vector("", " WHERE p = 'a'", " WHERE p >= 'b'",
          " WHERE p IS NULL", " WHERE k > 5")(rnd.nextInt(5))
        val group = if (rnd.nextInt(3) == 0) " GROUP BY p" else ""
        val select = if (group.nonEmpty) s"p, $a AS c0" else s"$a AS c0"
        val order = if (group.nonEmpty) " ORDER BY p" else ""
        val got = spark.sql(s"SELECT $select FROM fuzzvar.s.t$ti$where$group$order")
        val want = spark.sql(s"SELECT $select FROM rawvar$ti$where$group$order")
        def vals(r: Array[org.apache.spark.sql.Row]) = r.map { row =>
          val i = row.length - 1
          (if (group.nonEmpty) row.getString(0) else "",
            if (row.isNullAt(i)) null else java.lang.Double.valueOf(row.getDouble(i)))
        }.toSeq
        val g = vals(got.collect()); val w = vals(want.collect())
        assert(g.size == w.size, s"row count mismatch for $a$where$group")
        g.zip(w).foreach { case ((gk, gv), (wk, wv)) =>
          assert(gk == wk)
          (gv, wv) match {
            case (null, null) => ()
            case (x: java.lang.Double, y: java.lang.Double) =>
              assert(x.isNaN == y.isNaN)
              if (!x.isNaN)
                assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
                  s"value drift for $a$where$group: served $x vs scan $y")
            case other => fail(s"null/value mismatch for $a$where$group: $other")
          }
        }
        total += 1
        if (!got.queryExecution.executedPlan.toString.contains("FileScan"))
          rewritten += 1
      }
    }
    assert(rewritten >= total / 4,
      s"only $rewritten of $total variance plans were scan-free")
  }

  // APPROX_PERCENTILE fuzz: estimator-valued, so the oracle is the
  // deterministic GK rank guarantee itself — the served value must lie
  // between the EXACT order statistics at p ∓ (ε + slack), computed
  // scala-side from the raw rows (table-wide stamp ε=0.01, partition
  // layer ε=0.02 → slack 0.03 covers both plus discrete-tie wobble).
  // Unserved shapes (non-partition WHERE, deletes) scan and land inside
  // the envelope trivially, so every row is checked the same way.
  test("percentile fuzz: served quantiles stay inside the GK rank envelope") {
    val client = new LakehouseClient(spark)
    client.createCatalog("fuzzpct")
    client.createSchema("fuzzpct", "s")
    var rewritten = 0
    var total = 0
    def envelopeOk(vals: Seq[Long], p: Double, served: Long): Boolean = {
      if (vals.isEmpty) return false
      val sorted = vals.sorted
      val n = sorted.size
      val lo = sorted(math.max(0, math.floor(n * (p - 0.035)).toInt.min(n - 1)))
      val hi = sorted(math.min(n - 1, math.ceil(n * (p + 0.035)).toInt))
      served >= lo && served <= hi
    }
    (0 until 4).foreach { ti =>
      val rnd = new scala.util.Random(9100 + ti)
      val n = 40 + rnd.nextInt(300)
      val parts = Vector("a", "b", "c")
      val rows = (0 until n).map { i =>
        (i.toLong, parts(rnd.nextInt(parts.size)), rnd.nextInt(500).toLong)
      }
      val dir = TestSpark.tmpDir(s"fuzzpct$ti")
      val fileType = if (ti % 2 == 1) FileType.ICEBERG else FileType.DELTA
      client.createAsTable(rows.toDF("id", "p", "k").repartition(1 + rnd.nextInt(3)),
        "fuzzpct", "s", s"t$ti", fileType, s"$dir/t",
        partitionColumns = Seq("p"))
      spark.sql(s"ANALYZE TABLE fuzzpct.s.t$ti COMPUTE STATISTICS FOR ALL COLUMNS")
      val extra = (0 until rnd.nextInt(80)).map { i =>
        ((n + i).toLong, parts(rnd.nextInt(parts.size)), rnd.nextInt(500).toLong)
      }
      if (extra.nonEmpty)
        client.getTxTable("fuzzpct", "s", s"t$ti")
          .append(extra.toDF("id", "p", "k"))
      val all = rows ++ extra
      (0 until 8).foreach { qi =>
        val p = Vector(0.1, 0.25, 0.5, 0.9, 0.99)(rnd.nextInt(5))
        val (whereSql, pred) = Vector[(String, ((Long, String, Long)) => Boolean)](
          ("", _ => true),
          (" WHERE p = 'a'", _._2 == "a"),
          (" WHERE p >= 'b'", _._2 >= "b"),
          (" WHERE k > 100", _._3 > 100L))(rnd.nextInt(4))
        val grouped = rnd.nextInt(3) == 0
        val q =
          if (grouped) spark.sql(s"""SELECT p, APPROX_PERCENTILE(k, $p, 50) AS c0
            FROM fuzzpct.s.t$ti$whereSql GROUP BY p ORDER BY p""")
          else spark.sql(s"""SELECT APPROX_PERCENTILE(k, $p, 50) AS c0
            FROM fuzzpct.s.t$ti$whereSql""")
        val res = q.collect()
        if (grouped) {
          val byP = all.filter(pred).groupBy(_._2)
          res.foreach { r =>
            val vals = byP.getOrElse(r.getString(0), Seq.empty).map(_._3)
            assert(envelopeOk(vals, p, r.getLong(1)),
              s"group ${r.getString(0)} p=$p served ${r.getLong(1)} outside envelope" +
                s" (n=${vals.size}) for$whereSql")
          }
        } else {
          val vals = all.filter(pred).map(_._3)
          val r = res(0)
          if (vals.isEmpty) assert(r.isNullAt(0))
          else assert(envelopeOk(vals, p, r.getLong(0)),
            s"p=$p served ${r.getLong(0)} outside envelope (n=${vals.size})" +
              s" for$whereSql")
        }
        total += 1
        if (!q.queryExecution.executedPlan.toString.contains("FileScan"))
          rewritten += 1
      }
    }
    assert(rewritten >= total / 3,
      s"only $rewritten of $total percentile plans were scan-free")
  }
}
