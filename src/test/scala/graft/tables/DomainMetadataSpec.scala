package graft.tables

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Domain metadata (PROTOCOL.md "Domain Metadata"): another engine's
  * per-domain state must survive our replay AND our checkpoints — dropping
  * it would corrupt features (row tracking, clustering) that other writers
  * hang off it; preserving it is what allows this writer onto tables with
  * the domainMetadata writer feature.
  */
class DomainMetadataSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreign domain metadata survives our checkpoints after log cleanup") {
    val loc = TestSpark.tmpDir("dm") + "/t"
    DeltaLogWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"))
    // an action another engine committed, feature-gated at v7
    DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"SET","operationParameters":{}}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["domainMetadata"]}}""",
      """{"domainMetadata":{"domain":"delta.clustering","configuration":"{\"k\":4}","removed":false}}""",
      """{"domainMetadata":{"domain":"app.custom","configuration":"v1","removed":false}}""",
      """{"domainMetadata":{"domain":"app.custom","configuration":"","removed":true}}"""))
    val t = TxTable.forForeignDelta(spark, loc)
    // our writes are admitted (the feature is supported) and checkpoint
    (1 to DeltaLogWriter.CheckpointInterval + 1).foreach(i => t.append(Seq((i.toLong, "x")).toDF("id", "s")))

    // delete every JSON the checkpoint covers: the domains must come back
    // from the CHECKPOINT alone
    val f = TxLog.fs(spark, loc)
    val logDir = new org.apache.hadoop.fs.Path(loc, "_delta_log")
    val ckptV = f.listStatus(logDir).map(_.getPath.getName)
      .filter(_.contains(".checkpoint.")).flatMap(_.takeWhile(_ != '.').toLongOption)
      .maxOption.getOrElse(fail("no checkpoint written"))
    f.listStatus(logDir).map(_.getPath).filter { p =>
      p.getName.endsWith(".json") && !p.getName.startsWith(".") &&
        p.getName.stripSuffix(".json").toLongOption.exists(_ <= ckptV)
    }.foreach(p => f.delete(p, false))

    val (state, _) = DeltaLog.replayState(spark, loc, None)
    assert(state.domains.get("delta.clustering").contains(("""{"k":4}""", false)),
      s"domains=${state.domains}")
    // the removal tombstone is retained, still marked removed
    assert(state.domains.get("app.custom").exists(_._2 == true), s"domains=${state.domains}")
  }

  test("OPTIMIZE honors liquid-clustering columns from the delta.clustering domain") {
    val loc = TestSpark.tmpDir("dm-cluster") + "/t"
    // 16 files of (x, y) points; another engine declares CLUSTER BY (x, y)
    val df = spark.range(0, 4096).selectExpr("id % 64 AS x", "CAST(id / 64 AS LONG) AS y",
      "id AS payload").repartition(16)
    DeltaLogWriter.create(spark, loc, df)
    DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"CLUSTER BY","operationParameters":{}}}""",
      """{"domainMetadata":{"domain":"delta.clustering","configuration":"{\"clusteringColumns\":[[\"x\"],[\"y\"]]}","removed":false}}"""))
    val t = TxTable.forForeignDelta(spark, loc)
    assert(t.clusteringColumns == Seq("x", "y"))

    val before = DeltaLog.filesAfterPruning(spark, loc, "x >= 8 AND x < 16 AND y >= 8 AND y < 16")
    t.optimizeClustered(targetFileBytes = 16L * 1024)
    assert(t.toDF.count() == 4096) // data unchanged
    val after = DeltaLog.filesAfterPruning(spark, loc, "x >= 8 AND x < 16 AND y >= 8 AND y < 16")
    assert(after < before, s"rectangle pruning did not improve: before=$before after=$after")
  }

  test("replay keeps the latest action per domain in log order") {
    val loc = TestSpark.tmpDir("dm-order") + "/t"
    DeltaLogWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"))
    DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
      """{"domainMetadata":{"domain":"d1","configuration":"old","removed":false}}"""))
    DeltaLogWriter.writeCommit(spark, loc, 2L, Seq(
      """{"domainMetadata":{"domain":"d1","configuration":"new","removed":false}}"""))
    val (state, _) = DeltaLog.replayState(spark, loc, None)
    assert(state.domains("d1") == ("new", false))
    // time travel sees the older value
    val (stateV1, _) = DeltaLog.replayState(spark, loc, Some(1L))
    assert(stateV1.domains("d1") == ("old", false))
  }
}
