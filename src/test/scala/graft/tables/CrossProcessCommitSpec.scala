package graft.tables

import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-PROCESS writer concurrency: a second JVM appends to the same
  * table while this one does. The in-JVM race tests (TxTableSpec) cover
  * thread interleavings inside one process; this covers what the
  * optimistic protocol actually relies on between PROCESSES — the
  * no-replace atomicity of link(2)/rename(2) on the commit publish
  * (TxLog.atomicPublishNoOverwrite and the foreign-Delta equivalent).
  * Every commit must land at a distinct serialized version with none
  * lost: the reference's real-world analogue is delta-rs and
  * duckdb-delta writing one table from different processes.
  */
class CrossProcessCommitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // same JDK17 module opens the build forks Spark JVMs with
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def contend(backend: String): Unit = {
    val loc = TestSpark.tmpDir(s"xproc-$backend") + "/t"
    val n = 5
    if (backend == "delta")
      DeltaLogWriter.create(spark, loc, Seq(("init", 0)).toDF("writer", "i"))
    else
      TxTable.forLocation(spark, loc).create(Seq(("init", 0)).toDF("writer", "i"))

    val javaBin = sys.props("java.home") + "/bin/java"
    val log = java.nio.file.Files.createTempFile(s"xproc-$backend", ".log").toFile
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx3g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"), "graft.tables.CrossProcessWriterMain",
      loc, n.toString, "child")
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(log).start()
    try {
      // wait for the child's FIRST commit before appending from this
      // side, so the two processes genuinely overlap in the commit
      // window instead of running back-to-back
      val t = TxTable.forAnyLocation(spark, loc)
      val deadline = System.nanoTime() + 240L * 1000 * 1000 * 1000
      while (t.snapshot.version < 1 && proc.isAlive && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(t.snapshot.version >= 1,
        s"child never committed (alive=${proc.isAlive}); log:\n" +
          scala.io.Source.fromFile(log).getLines().take(40).mkString("\n"))
      (1 to n).foreach(i => t.append(Seq(("parent", i)).toDF("writer", "i")))
      assert(proc.waitFor(240, TimeUnit.SECONDS), "child did not exit in time")
      assert(proc.exitValue() == 0, s"child exited ${proc.exitValue()}; log:\n" +
        scala.io.Source.fromFile(log).getLines().take(40).mkString("\n"))

      val fin = TxTable.forAnyLocation(spark, loc)
      // no lost rows: every one of the 2n+1 single-row commits survived
      val byWriter = fin.toDF.groupBy($"writer").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byWriter == Map("init" -> 1L, "child" -> n.toLong, "parent" -> n.toLong))
      // serialized versions: 2n appends after v0 land at EXACTLY version
      // 2n — a publish that silently replaced a concurrent winner would
      // leave the version short (and a row missing above)
      assert(fin.snapshot.version == 2L * n,
        s"expected version ${2 * n}, got ${fin.snapshot.version}")
    } finally {
      if (proc.isAlive) proc.destroyForcibly()
      log.delete()
    }
  }

  test("two JVMs appending the native log concurrently lose no commits") {
    contend("native")
  }

  test("two JVMs appending a foreign _delta_log concurrently lose no commits") {
    contend("delta")
  }
}

/** Child-process entry: appends `n` single-row commits to the table at
  * `loc` through the auto-dispatched TxTable backend, then exits 0.
  * Launched by CrossProcessCommitSpec with the test classpath.
  */
object CrossProcessWriterMain {
  def main(args: Array[String]): Unit = {
    val Array(loc, n, id) = args
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("xproc-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val t = TxTable.forAnyLocation(s, loc)
    (1 to n.toInt).foreach(i => t.append(Seq((id, i)).toDF("writer", "i")))
    s.stop()
  }
}
