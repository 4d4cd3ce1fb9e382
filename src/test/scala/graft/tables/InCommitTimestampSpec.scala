package graft.tables

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** In-commit timestamps (PROTOCOL.md "In-Commit Timestamps"): when the
  * table enables them, commitInfo carries a monotonic inCommitTimestamp
  * and timestamp-based operations MUST read it instead of file mtimes
  * (which rewrites/copies can perturb).
  */
class InCommitTimestampSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writes on an ICT table emit monotonic inCommitTimestamps") {
    val loc = TestSpark.tmpDir("ict") + "/t"
    DeltaLogWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"),
      properties = Map("delta.enableInCommitTimestamps" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.append(Seq((2L, "b")).toDF("id", "s"))
    t.append(Seq((3L, "c")).toDF("id", "s"))

    val f = TxLog.fs(spark, loc)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val icts = (1 to 2).map { v =>
      val p = new org.apache.hadoop.fs.Path(loc, f"_delta_log/$v%020d.json")
      val txt = scala.io.Source.fromInputStream(f.open(p), "UTF-8").mkString
      val ci = org.json4s.jackson.JsonMethods.parse(txt.linesIterator.next()) \ "commitInfo"
      (ci \ "inCommitTimestamp").extract[Long]
    }
    assert(icts(0) > 0 && icts(1) > icts(0), icts.mkString(","))
  }

  test("a table born with ICT declares the feature and stamps version 0") {
    val loc = TestSpark.tmpDir("ict-born") + "/t"
    DeltaLogWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"),
      properties = Map("delta.enableInCommitTimestamps" -> "true"))
    val (state, _) = DeltaLog.replayState(spark, loc, None)
    // protocol: writer v7 with the feature (spec: the property requires it)
    assert(state.minWriter == 7 && state.writerFeatures.contains("inCommitTimestamp"),
      s"minWriter=${state.minWriter} features=${state.writerFeatures}")
    // version 0's commitInfo already carries the monotonic field
    val f = TxLog.fs(spark, loc)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val p = new org.apache.hadoop.fs.Path(loc, "_delta_log/00000000000000000000.json")
    val txt = scala.io.Source.fromInputStream(f.open(p), "UTF-8").mkString
    val ict = txt.linesIterator.map(org.json4s.jackson.JsonMethods.parse(_) \ "commitInfo")
      .collectFirst { case ci if ci != org.json4s.JNothing => (ci \ "inCommitTimestamp").extractOpt[Long] }
      .flatten
    assert(ict.exists(_ > 0), s"v0 commitInfo lacks inCommitTimestamp: $txt")
  }

  test("enabling ICT on an existing table records the enablement point") {
    val loc = TestSpark.tmpDir("ict-enable") + "/t"
    DeltaLogWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.append(Seq((2L, "b")).toDF("id", "s"))
    t.setProperties(Map("delta.enableInCommitTimestamps" -> "true"))
    val snap = DeltaLog.snapshot(spark, loc)
    // the enabling commit (v2) pins where the monotonic clock starts, so
    // spec readers split timestamp travel at that version
    assert(snap.properties.get("delta.inCommitTimestampEnablementVersion").contains("2"),
      snap.properties.toString)
    val ts = snap.properties.get("delta.inCommitTimestampEnablementTimestamp").map(_.toLong)
    assert(ts.exists(_ > 0), snap.properties.toString)
    // and the protocol now obliges writers to keep stamping
    val (state, _) = DeltaLog.replayState(spark, loc, None)
    assert(state.minWriter == 7 && state.writerFeatures.contains("inCommitTimestamp"))
    // subsequent commits stamp ICT
    t.append(Seq((3L, "c")).toDF("id", "s"))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val f = TxLog.fs(spark, loc)
    val p = new org.apache.hadoop.fs.Path(loc, "_delta_log/00000000000000000003.json")
    val txt = scala.io.Source.fromInputStream(f.open(p), "UTF-8").mkString
    val ci = org.json4s.jackson.JsonMethods.parse(txt.linesIterator.next()) \ "commitInfo"
    assert((ci \ "inCommitTimestamp").extractOpt[Long].exists(_ >= ts.get))
  }

  test("timestamp travel reads inCommitTimestamp over the wall-clock field") {
    val loc = TestSpark.tmpDir("ict-travel") + "/t"
    DeltaLogWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"))
    // a foreign writer whose ICTs disagree wildly with the timestamp field
    // (e.g. the log was copied and timestamps rewritten): ICT must win
    DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
      """{"commitInfo":{"timestamp":1,"inCommitTimestamp":5000000,"operation":"WRITE","operationParameters":{}}}""",
      """{"txn":{"appId":"x","version":1}}"""))
    DeltaLogWriter.writeCommit(spark, loc, 2L, Seq(
      """{"commitInfo":{"timestamp":2,"inCommitTimestamp":6000000,"operation":"WRITE","operationParameters":{}}}""",
      """{"txn":{"appId":"x","version":2}}"""))
    // as-of 5500000 must see version 1 (by ICT), not version 2 (whose
    // wall-clock field claims timestamp 2)
    assert(DeltaLog.versionAtTimestamp(spark, loc, 5500000L) == 1L)
    assert(DeltaLog.versionAtTimestamp(spark, loc, 6000000L) == 2L)
  }
}
