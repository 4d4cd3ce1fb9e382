package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.FileType
import graft.client.LakehouseClient

/** SQL DML on 3-part names: INSERT INTO/OVERWRITE (positional, BY NAME,
  * static PARTITION), DELETE, UPDATE, MERGE INTO — each routed through the
  * same TxTable write surface as the programmatic API, on catalog tables.
  */
class GraftSqlDmlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(cat: String, ft: FileType = FileType.DELTA): LakehouseClient = {
    val client = new LakehouseClient(spark)
    client.createCatalog(cat)
    client.createSchema(cat, "s")
    val dir = TestSpark.tmpDir(s"dml-$cat")
    client.createAsTable(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v"),
      cat, "s", "t", ft, s"$dir/t")
    client
  }

  test("INSERT INTO appends; INSERT OVERWRITE replaces") {
    freshTable("dml1")
    spark.sql("INSERT INTO dml1.s.t VALUES (3, 'c', 30.0), (4, 'd', 40.0)")
    assert(spark.sql("SELECT COUNT(*) FROM dml1.s.t").collect()(0).getLong(0) == 4)

    spark.sql("INSERT OVERWRITE dml1.s.t SELECT id + 10, name, v FROM dml1.s.t WHERE id <= 2")
    val rows = spark.sql("SELECT id FROM dml1.s.t ORDER BY id").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(11L, 12L))
  }

  test("INSERT with a column list and BY NAME fill remaining columns") {
    freshTable("dml2")
    // positional against an explicit column list; v omitted -> null
    spark.sql("INSERT INTO dml2.s.t (id, name) VALUES (5, 'e')")
    val r = spark.sql("SELECT name, v FROM dml2.s.t WHERE id = 5").collect()(0)
    assert(r.getString(0) == "e" && r.isNullAt(1))

    spark.sql("INSERT INTO dml2.s.t BY NAME SELECT 'f' AS name, 60.0 AS v, 6 AS id")
    val r2 = spark.sql("SELECT name, v FROM dml2.s.t WHERE id = 6").collect()(0)
    assert(r2.getString(0) == "f" && r2.getDouble(1) == 60.0)
  }

  test("DELETE and UPDATE with and without a target alias") {
    freshTable("dml3")
    spark.sql("INSERT INTO dml3.s.t VALUES (3, 'c', 30.0)")
    spark.sql("DELETE FROM dml3.s.t WHERE id = 1")
    assert(spark.sql("SELECT COUNT(*) FROM dml3.s.t").collect()(0).getLong(0) == 2)
    spark.sql("DELETE FROM dml3.s.t x WHERE x.id = 2")
    assert(spark.sql("SELECT id FROM dml3.s.t").collect().map(_.getLong(0)).toSeq == Seq(3L))

    spark.sql("UPDATE dml3.s.t SET v = v * 2 WHERE id = 3")
    assert(spark.sql("SELECT v FROM dml3.s.t").collect()(0).getDouble(0) == 60.0)
    spark.sql("UPDATE dml3.s.t u SET u.name = 'renamed'")
    assert(spark.sql("SELECT name FROM dml3.s.t").collect()(0).getString(0) == "renamed")
  }

  test("MERGE INTO: update, delete, insert, and by-source clauses") {
    freshTable("dml4")
    spark.sql("INSERT INTO dml4.s.t VALUES (3, 'c', 30.0)")
    // source: update 1, delete 2, insert 9; row 3 untouched by source
    val updates = Seq((1L, "A", 100.0), (2L, "B", -1.0), (9L, "i", 90.0))
      .toDF("id", "name", "v")
    updates.createOrReplaceTempView("dml4_src")
    spark.sql("""MERGE INTO dml4.s.t AS t USING dml4_src AS s ON t.id = s.id
      WHEN MATCHED AND s.v < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.name = concat(t.name, '!')""")
    val out = spark.sql("SELECT id, name, v FROM dml4.s.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "A", 100.0), (3L, "c!", 30.0), (9L, "i", 90.0)))
  }

  test("MERGE with explicit SET/VALUES assignments") {
    freshTable("dml5")
    Seq((2L, 5.0), (7L, 70.0)).toDF("id", "bonus").createOrReplaceTempView("dml5_src")
    spark.sql("""MERGE INTO dml5.s.t AS t USING dml5_src AS s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = t.v + s.bonus
      WHEN NOT MATCHED THEN INSERT (id, name, v) VALUES (s.id, 'new', s.bonus)""")
    val out = spark.sql("SELECT id, name, v FROM dml5.s.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b", 25.0), (7L, "new", 70.0)))
  }

  test("INSERT OVERWRITE with a static PARTITION spec replaces only that partition") {
    val client = new LakehouseClient(spark)
    client.createCatalog("dml6")
    client.createSchema("dml6", "s")
    val dir = TestSpark.tmpDir("dml6")
    client.createAsTable(
      Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "p"),
      "dml6", "s", "t", FileType.DELTA, s"$dir/t", partitionColumns = Seq("p"))
    spark.sql("INSERT OVERWRITE dml6.s.t PARTITION (p = 'x') SELECT 99 AS id")
    val out = spark.sql("SELECT id, p FROM dml6.s.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((3L, "y"), (99L, "x")))
  }

  test("CREATE TABLE AS SELECT, REPLACE, CREATE empty, DROP on 3-part names") {
    val client = new LakehouseClient(spark)
    client.createCatalog("ddl1")
    client.createSchema("ddl1", "s")
    val dir = TestSpark.tmpDir("ddl1")

    spark.sql(s"""CREATE TABLE ddl1.s.t USING delta LOCATION '$dir/t'
      AS SELECT * FROM VALUES (1, 'a'), (2, 'b') AS v(id, name)""")
    assert(spark.sql("SELECT COUNT(*) FROM ddl1.s.t").collect()(0).getLong(0) == 2)
    assert(client.getTable("ddl1", "s", "t").fileType == FileType.DELTA)

    // IF NOT EXISTS: silently keeps the existing table
    spark.sql(s"""CREATE TABLE IF NOT EXISTS ddl1.s.t USING delta LOCATION '$dir/t2'
      AS SELECT 99 AS id, 'z' AS name""")
    assert(spark.sql("SELECT COUNT(*) FROM ddl1.s.t").collect()(0).getLong(0) == 2)
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE ddl1.s.t USING delta LOCATION '$dir/t3'
        AS SELECT 99 AS id, 'z' AS name""")
    }

    // OR REPLACE swaps data and registration
    spark.sql(s"""CREATE OR REPLACE TABLE ddl1.s.t USING delta LOCATION '$dir/t4'
      AS SELECT 7 AS id, 'r' AS name""")
    assert(spark.sql("SELECT id FROM ddl1.s.t").collect()(0).getInt(0) == 7)

    // empty CREATE TABLE with declared schema reads as zero rows
    spark.sql(s"""CREATE TABLE ddl1.s.empty (id BIGINT, v DOUBLE)
      USING iceberg LOCATION '$dir/empty'""")
    assert(spark.sql("SELECT COUNT(*) FROM ddl1.s.empty").collect()(0).getLong(0) == 0)
    spark.sql("INSERT INTO ddl1.s.empty VALUES (1, 1.5)")
    assert(spark.sql("SELECT COUNT(*) FROM ddl1.s.empty").collect()(0).getLong(0) == 1)

    spark.sql("DROP TABLE ddl1.s.t")
    intercept[Exception] { client.getTable("ddl1", "s", "t") }
    spark.sql("DROP TABLE IF EXISTS ddl1.s.t") // no-op, no error
  }

  test("CREATE TABLE AS SELECT with PARTITIONED BY lays out hive partitions") {
    val client = new LakehouseClient(spark)
    client.createCatalog("ddl2")
    client.createSchema("ddl2", "s")
    val dir = TestSpark.tmpDir("ddl2")
    spark.sql(s"""CREATE TABLE ddl2.s.t USING delta LOCATION '$dir/t'
      PARTITIONED BY (p)
      AS SELECT * FROM VALUES (1, 'x'), (2, 'y'), (3, 'x') AS v(id, p)""")
    val t = client.getTxTable("ddl2", "s", "t")
    assert(t.snapshot.partitionColumns == Seq("p"))
    assert(spark.sql("SELECT COUNT(*) FROM ddl2.s.t WHERE p = 'x'").collect()(0).getLong(0) == 2)
  }

  test("ALTER TABLE ADD COLUMNS / SET + UNSET TBLPROPERTIES") {
    val client = freshTable("ddl3")
    spark.sql("ALTER TABLE ddl3.s.t ADD COLUMNS (tag STRING, score DOUBLE)")
    // existing rows read the new columns as NULL; new writes can fill them
    val r = spark.sql("SELECT tag, score FROM ddl3.s.t WHERE id = 1").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    spark.sql("INSERT INTO ddl3.s.t VALUES (3, 'c', 30.0, 'fresh', 0.9)")
    assert(spark.sql("SELECT tag FROM ddl3.s.t WHERE id = 3").collect()(0).getString(0) == "fresh")
    // catalog schema followed the evolution (W10 push)
    assert(client.getTable("ddl3", "s", "t").columns.map(_.name)
      .containsSlice(Seq("tag", "score")))

    spark.sql("ALTER TABLE ddl3.s.t SET TBLPROPERTIES ('team' = 'data', 'tier' = 'gold')")
    spark.sql("ALTER TABLE ddl3.s.t UNSET TBLPROPERTIES ('tier')")
    val props = client.getTable("ddl3", "s", "t").properties
    assert(props.get("team").contains("data") && !props.contains("tier"))
    // the property must ALSO land in the transaction log — that is what
    // the write path and external engines read
    val logProps = client.getTxTable("ddl3", "s", "t").snapshot.properties
    assert(logProps.get("team").contains("data") && !logProps.contains("tier"))
    val rows = spark.sql("SHOW TABLES IN ddl3.s").collect()
    assert(rows.map(r2 => (r2.getString(0), r2.getString(1))).toSeq == Seq(("ddl3.s", "t")))
  }

  test("SHOW TABLES with pattern and catalog-wide; DESCRIBE TABLE") {
    val client = new LakehouseClient(spark)
    client.createCatalog("ddl4")
    client.createSchema("ddl4", "s1")
    client.createSchema("ddl4", "s2")
    val dir = TestSpark.tmpDir("ddl4")
    val df = Seq((1L, "x")).toDF("id", "p")
    client.createAsTable(df, "ddl4", "s1", "alpha", FileType.DELTA, s"$dir/a", Seq("p"))
    client.createAsTable(df, "ddl4", "s1", "beta", FileType.PARQUET, s"$dir/b")
    client.createAsTable(df, "ddl4", "s2", "gamma", FileType.DELTA, s"$dir/g")

    val all = spark.sql("SHOW TABLES IN ddl4").collect().map(_.getString(1)).toSeq
    assert(all == Seq("alpha", "beta", "gamma"))
    val pat = spark.sql("SHOW TABLES IN ddl4.s1 LIKE 'al*'").collect()
    assert(pat.map(_.getString(1)).toSeq == Seq("alpha"))

    val desc = spark.sql("DESCRIBE TABLE ddl4.s1.alpha").collect()
    val cols = desc.takeWhile(r => !r.getString(0).startsWith("#"))
      .map(r => (r.getString(0), r.getString(1)))
    assert(cols.toSeq == Seq(("id", "bigint"), ("p", "string")))
    assert(desc.exists(_.getString(0) == "# Partition Information"))
    assert(desc.exists(r => r.getString(0) == "Type" && r.getString(1) == "DELTA"))
  }

  test("OPTIMIZE and VACUUM maintenance statements") {
    val client = freshTable("mnt1")
    // small-file debris from trickle inserts
    (3 to 7).foreach(i => spark.sql(s"INSERT INTO mnt1.s.t VALUES ($i, 'r$i', $i.0)"))
    val t = client.getTxTable("mnt1", "s", "t")
    val filesBefore = t.snapshot.files.size
    assert(filesBefore >= 6)

    spark.sql("OPTIMIZE mnt1.s.t")
    assert(t.snapshot.files.size < filesBefore)
    assert(spark.sql("SELECT COUNT(*) FROM mnt1.s.t").collect()(0).getLong(0) == 7)

    spark.sql("OPTIMIZE mnt1.s.t ZORDER BY (id, v)")
    assert(spark.sql("SELECT COUNT(*) FROM mnt1.s.t").collect()(0).getLong(0) == 7)
    spark.sql("OPTIMIZE mnt1.s.t HILBERT BY (id, v)")
    assert(spark.sql("SELECT COUNT(*) FROM mnt1.s.t").collect()(0).getLong(0) == 7)

    // default retention: fresh files survive, the command reports a count
    val deleted = spark.sql("VACUUM mnt1.s.t").collect()(0).getInt(0)
    assert(deleted == 0)
    assert(spark.sql("SELECT COUNT(*) FROM mnt1.s.t").collect()(0).getLong(0) == 7)
    // sub-floor retention is refused (the safety floor needs force=true,
    // which SQL deliberately does not expose)
    intercept[Exception] { spark.sql("VACUUM mnt1.s.t RETAIN 1 HOURS") }
    // DRY RUN previews the candidates without deleting — sub-floor
    // retention is fine here (nothing is removed), and the compacted-away
    // small files from the OPTIMIZE above are exactly what it lists
    val preview = spark.sql("VACUUM mnt1.s.t RETAIN 0 HOURS DRY RUN").collect()
      .map(_.getString(0)).toSet
    assert(preview.nonEmpty, "OPTIMIZE left superseded files to preview")
    val t2 = client.getTxTable("mnt1", "s", "t")
    val live = t2.snapshot.files.map(_.path).toSet
    assert(preview.intersect(live).isEmpty, "a live file must never be a candidate")
    // nothing was deleted by the preview
    assert(spark.sql("SELECT COUNT(*) FROM mnt1.s.t VERSION AS OF 0").collect()(0)
      .getLong(0) >= 1, "time travel still works — no file was removed")
  }

  test("CREATE/REFRESH BLOOMFILTER INDEX through SQL builds and maintains the sidecar") {
    val client = new LakehouseClient(spark)
    client.createCatalog("bfi1")
    client.createSchema("bfi1", "s")
    val dir = TestSpark.tmpDir("dml-bfi1")
    // 6 hash-partitioned files, ids interleaved so min/max stats can't
    // separate any point lookup — pruning below is the bloom's doing
    client.createAsTable(
      (0 until 600).map(j => (j.toLong, s"u$j")).toDF("id", "u").repartition(6),
      "bfi1", "s", "t", FileType.DELTA, s"$dir/t")
    spark.sql("CREATE BLOOMFILTER INDEX ON TABLE bfi1.s.t FOR COLUMNS (u) OPTIONS (fpp = 0.005)")
    val t = client.getTxTable("bfi1", "s", "t")
    assert(t.snapshot.properties(graft.tables.BloomIndex.ColumnsProp) == "u")
    assert(t.snapshot.properties(graft.tables.BloomIndex.FppProp).toDouble == 0.005)
    assert(t.filesAfterPruning("u = 'u123'") <= 2)
    assert(t.scan("u = 'u123'").collect().map(_.getLong(0)).toSeq == Seq(123L))
    // append -> new file unindexed (conservative); REFRESH returns the
    // number of (file, column) pairs built — exactly 1
    spark.sql("INSERT INTO bfi1.s.t VALUES (9000, 'u9000')")
    assert(t.scan("u = 'u9000'").count() == 1)
    val built = spark.sql("REFRESH BLOOMFILTER INDEX ON bfi1.s.t")
    assert(built.columns.toSeq == Seq("pairs_built"))
    assert(built.collect()(0).getLong(0) == 1L)
    assert(spark.sql("REFRESH BLOOMFILTER INDEX ON bfi1.s.t").collect()(0).getLong(0) == 0L)
    // malformed column list still errors clearly through the SQL path
    intercept[Exception] {
      spark.sql("CREATE BLOOMFILTER INDEX ON bfi1.s.t FOR COLUMNS (nope)")
    }
    // DROP: lookups plan unpruned again, the rename-pin on the indexed
    // column lifts, and results stay exact throughout
    spark.sql("DROP BLOOMFILTER INDEX ON TABLE bfi1.s.t")
    assert(!t.snapshot.properties.contains(graft.tables.BloomIndex.ColumnsProp))
    // all 6 interleaved files come back (the u9000-only appended file
    // still min/max-stats-prunes — that's not the bloom's doing)
    assert(t.filesAfterPruning("u = 'u123'") >= 6)
    assert(t.scan("u = 'u123'").collect().map(_.getLong(0)).toSeq == Seq(123L))
    t.renameColumn("u", "u2") // pinned while indexed; allowed after DROP
    assert(t.snapshot.schema.fieldNames.contains("u2"))
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT: CHECK enforced on SQL and programmatic writes") {
    val client = freshTable("ctr1")
    spark.sql("ALTER TABLE ctr1.s.t ADD CONSTRAINT v_positive CHECK (v > 0)")
    val t = client.getTxTable("ctr1", "s", "t")
    assert(t.snapshot.properties.get("delta.constraints.v_positive").contains("v > 0"))
    // violating INSERT is rejected atomically — no partial commit
    intercept[Exception] {
      spark.sql("INSERT INTO ctr1.s.t VALUES (3, 'c', -1.0)")
    }
    assert(spark.sql("SELECT COUNT(*) FROM ctr1.s.t").collect()(0).getLong(0) == 2)
    spark.sql("INSERT INTO ctr1.s.t VALUES (3, 'c', 30.0)")
    assert(spark.sql("SELECT COUNT(*) FROM ctr1.s.t").collect()(0).getLong(0) == 3)
    // adding a constraint an existing row violates is refused
    intercept[Exception] {
      spark.sql("ALTER TABLE ctr1.s.t ADD CONSTRAINT v_small CHECK (v < 25)")
    }
    // nested parens in the expression parse fine
    spark.sql("ALTER TABLE ctr1.s.t ADD CONSTRAINT id_rng CHECK (id > 0 AND (id < 100))")
    spark.sql("ALTER TABLE ctr1.s.t DROP CONSTRAINT v_positive")
    spark.sql("INSERT INTO ctr1.s.t VALUES (4, 'd', -5.0)") // now allowed
    assert(spark.sql("SELECT COUNT(*) FROM ctr1.s.t").collect()(0).getLong(0) == 4)
    intercept[Exception] { // id_rng still enforced
      spark.sql("INSERT INTO ctr1.s.t VALUES (500, 'e', 1.0)")
    }
  }

  test("INSERT OVERWRITE under dynamic partitionOverwriteMode replaces only touched partitions") {
    val client = new LakehouseClient(spark)
    client.createCatalog("dml9")
    client.createSchema("dml9", "s")
    val dir = TestSpark.tmpDir("dml9")
    client.createAsTable(
      Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "p"),
      "dml9", "s", "t", FileType.DELTA, s"$dir/t", partitionColumns = Seq("p"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "static")
    try {
      spark.conf.set(key, "dynamic")
      // no PARTITION spec, data touches only p='x' — p='y' must survive
      spark.sql("INSERT OVERWRITE dml9.s.t SELECT 99 AS id, 'x' AS p")
      val out = spark.sql("SELECT id, p FROM dml9.s.t ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(out.toSeq == Seq((3L, "y"), (99L, "x")))
      // static mode (the default) keeps full-overwrite semantics
      spark.conf.set(key, "static")
      spark.sql("INSERT OVERWRITE dml9.s.t SELECT 7 AS id, 'z' AS p")
      assert(spark.sql("SELECT COUNT(*) FROM dml9.s.t").collect()(0).getLong(0) == 1)
    } finally spark.conf.set(key, prev)
  }

  test("nested-field assignment targets are rejected, not silently retargeted") {
    freshTable("dml10")
    // 'name.part' would otherwise collapse to top-level 'part'
    val e = intercept[Exception] {
      spark.sql("UPDATE dml10.s.t SET name.part = 'x' WHERE id = 1")
    }
    assert(e.getMessage.contains("nested field"))
    Seq((1L, 0.0)).toDF("id", "bonus").createOrReplaceTempView("dml10_src")
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO dml10.s.t AS t USING dml10_src AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET t.name.part = 'x'""")
    }
    assert(e2.getMessage.contains("nested field"))
  }

  test("ALTER TABLE ADD COLUMNS forces added columns nullable") {
    val client = freshTable("dml11")
    // NOT NULL on a table with existing rows would be inconsistent
    // metadata (existing rows read NULL) — the column lands nullable
    spark.sql("ALTER TABLE dml11.s.t ADD COLUMNS (tag STRING NOT NULL)")
    val f = client.readTable("dml11", "s", "t").schema.fields.find(_.name == "tag").get
    assert(f.nullable)
    assert(spark.sql("SELECT tag FROM dml11.s.t WHERE id = 1").collect()(0).isNullAt(0))
  }

  test("distinct statements on the same table produce non-equal command plans") {
    val client = freshTable("dml12")
    val sess = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val target = org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
      Seq("dml12", "s", "t"))
    def cond(s: String) = sess.sessionState.sqlParser.parseExpression(s)
    val c1 = GraftSqlDml.rewriteDelete(sess, client, target, cond("id = 1")).get
    val c2 = GraftSqlDml.rewriteDelete(sess, client, target, cond("id = 2")).get
    val c1b = GraftSqlDml.rewriteDelete(sess, client, target, cond("id = 1")).get
    assert(c1 != c2, "different predicates must not compare equal")
    assert(c1 == c1b, "identical statements still canonicalize together")
  }

  test("SQL DML works on Iceberg catalog tables too") {
    freshTable("dml7", FileType.ICEBERG)
    spark.sql("INSERT INTO dml7.s.t VALUES (3, 'c', 30.0)")
    spark.sql("DELETE FROM dml7.s.t WHERE id = 1")
    spark.sql("UPDATE dml7.s.t SET v = 0.0 WHERE id = 2")
    val out = spark.sql("SELECT id, v FROM dml7.s.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((2L, 0.0), (3L, 30.0)))
  }

  test("RESTORE TABLE TO VERSION AS OF rewinds in place") {
    freshTable("dml13", FileType.DELTA)                       // v0: ids 1,2
    spark.sql("INSERT INTO dml13.s.t VALUES (3, 'c', 30.0)")  // v1
    spark.sql("DELETE FROM dml13.s.t WHERE id = 1")           // v2
    assert(spark.sql("SELECT COUNT(*) FROM dml13.s.t").collect()(0).getLong(0) == 2)
    val restored = spark.sql("RESTORE TABLE dml13.s.t TO VERSION AS OF 1").collect()(0)
    assert(restored.getLong(0) == 3L, "restore itself commits a new version")
    assert(spark.sql("SELECT id FROM dml13.s.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("SHOW PARTITIONS reports metadata-only per-tuple stats") {
    val client = new LakehouseClient(spark)
    client.createCatalog("dml14")
    client.createSchema("dml14", "s")
    val dir = graft.TestSpark.tmpDir("sql-showparts")
    client.createAsTable(
      Seq((1L, "p1"), (2L, "p1"), (3L, "p2")).toDF("id", "pt"),
      "dml14", "s", "t", FileType.DELTA, s"$dir/t", partitionColumns = Seq("pt"))
    val rows = spark.sql("SHOW PARTITIONS dml14.s.t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("pt=p1", 2L), ("pt=p2", 1L)), rows.toString)
  }

  test("SQL write-audit-publish: branch DDL, staged INSERT, ref reads, FAST FORWARD") {
    val client = new LakehouseClient(spark)
    client.createCatalog("wap1")
    client.createSchema("wap1", "s")
    val dir = graft.TestSpark.tmpDir("sql-wap")
    client.createAsTable(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v"),
      "wap1", "s", "t", FileType.ICEBERG, s"$dir/t")

    spark.sql("ALTER TABLE wap1.s.t CREATE BRANCH audit")
    // staged write advances only the branch
    spark.sql("INSERT INTO wap1.s.t.branch_audit VALUES (3, 'c', 30.0)")
    assert(spark.sql("SELECT COUNT(*) FROM wap1.s.t").collect()(0).getLong(0) == 2)
    // audit reads: suffix syntax AND VERSION AS OF 'ref'
    assert(spark.sql("SELECT COUNT(*) FROM wap1.s.t.branch_audit")
      .collect()(0).getLong(0) == 3)
    assert(spark.sql("SELECT COUNT(*) FROM wap1.s.t VERSION AS OF 'audit'")
      .collect()(0).getLong(0) == 3)
    // publish
    spark.sql("ALTER TABLE wap1.s.t FAST FORWARD TO audit")
    assert(spark.sql("SELECT id FROM wap1.s.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // tag the published state, drop the work branch
    spark.sql("ALTER TABLE wap1.s.t CREATE TAG published")
    spark.sql("ALTER TABLE wap1.s.t DROP BRANCH audit")
    spark.sql("INSERT INTO wap1.s.t VALUES (4, 'd', 40.0)")
    assert(spark.sql("SELECT COUNT(*) FROM wap1.s.t.tag_published")
      .collect()(0).getLong(0) == 3, "tag stays pinned while main moves")
    // guards: branch DDL on a non-Iceberg table refuses
    val dir2 = graft.TestSpark.tmpDir("sql-wap-delta")
    client.createAsTable(Seq((1L, "x")).toDF("id", "s"),
      "wap1", "s", "d", FileType.DELTA, s"$dir2/d")
    intercept[Exception] { spark.sql("ALTER TABLE wap1.s.d CREATE BRANCH b") }
  }

  test("SHOW TBLPROPERTIES merges catalog and log properties") {
    val client = freshTable("stp1")
    spark.sql("ALTER TABLE stp1.s.t SET TBLPROPERTIES ('graft.autoCompact.enabled' = 'true')")
    val all = spark.sql("SHOW TBLPROPERTIES stp1.s.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(all.get("graft.autoCompact.enabled") == Some("true"))
    val one = spark.sql("SHOW TBLPROPERTIES stp1.s.t ('graft.autoCompact.enabled')")
      .collect()(0)
    assert(one.getString(1) == "true")
    val missing = spark.sql("SHOW TBLPROPERTIES stp1.s.t ('nope')").collect()(0)
    assert(missing.getString(1).contains("does not have property"))
  }

  test("DESCRIBE DETAIL returns one metadata-only summary row") {
    val client = new LakehouseClient(spark)
    client.createCatalog("dd1")
    client.createSchema("dd1", "s")
    val dir = graft.TestSpark.tmpDir("sql-detail")
    client.createAsTable(
      Seq((1L, "p1"), (2L, "p1"), (3L, "p2")).toDF("id", "pt"),
      "dd1", "s", "t", FileType.DELTA, s"$dir/t", partitionColumns = Seq("pt"))
    val r = spark.sql("DESCRIBE DETAIL dd1.s.t").collect()(0)
    assert(r.getString(0) == "graft")
    assert(r.getLong(3) >= 1L)                       // num_files
    assert(r.getLong(5) == 3L)                       // num_rows (metadata)
    assert(r.getString(6) == "pt")                   // partition_columns
  }

  test("REORG TABLE APPLY (PURGE) rewrites DV files through SQL") {
    val client = new LakehouseClient(spark)
    client.createCatalog("dml15")
    client.createSchema("dml15", "s")
    val loc = graft.TestSpark.tmpDir("sql-reorg") + "/t"
    graft.tables.DeltaLogWriter.create(spark, loc,
      (0 until 50).map(i => (i.toLong, s"r$i")).toDF("id", "name").repartition(3),
      properties = Map("delta.enableDeletionVectors" -> "true"))
    client.registerAsTable("dml15", "s", "t", FileType.DELTA, loc)
    spark.sql("DELETE FROM dml15.s.t WHERE id < 10")
    val t = client.getTxTable("dml15", "s", "t")
    assert(t.snapshot.files.exists(_.deletionVector.exists(_.cardinality > 0)),
      "DELETE on a DV table must commit bitmaps")
    assert(spark.sql("REORG TABLE dml15.s.t APPLY (PURGE)").collect()(0).getBoolean(0))
    assert(t.snapshot.files.forall(!_.deletionVector.exists(_.cardinality > 0)))
    assert(spark.sql("SELECT COUNT(*) FROM dml15.s.t").collect()(0).getLong(0) == 40)
    // idempotent: nothing left to purge
    assert(!spark.sql("REORG TABLE dml15.s.t APPLY (PURGE)").collect()(0).getBoolean(0))
  }
}
