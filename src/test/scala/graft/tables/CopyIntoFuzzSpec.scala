package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Model-based fuzz of the COPY INTO exactly-once protocol: random
  * programs interleaving file drops, crashed runs (killed in the
  * intent→confirm window via the test hook), plain re-runs and
  * CONCURRENT runners, checked against the trivial model "the target
  * holds every dropped id exactly once" after a final clean run. The
  * protocol claim is exactly-once across ANY interleaving of crashes
  * and re-runs — a protocol-shaped claim, so a model fuzz (like the
  * MERGE and metadata-rewrite fuzzes) is the right oracle: a
  * double-load shows up as a duplicate id, a loss as a missing one.
  */
class CopyIntoFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("100 random drop/crash/re-run/concurrent programs: every file loads exactly once") {
    (0 until 100).foreach { pi =>
      val rnd = new scala.util.Random(4200 + pi)
      val root = TestSpark.tmpDir(s"cpfuzz$pi")
      val src = s"$root/drop"
      new java.io.File(src).mkdirs()
      val t = new TxTable(spark, s"$root/t")
      t.create(Seq.empty[(Long, String)].toDF("id", "v"))
      // a third of the programs run the transform surface end-to-end:
      // raw files carry DIFFERENT column names, every run (and every
      // crash REPLAY, which must use the RECORDED projection) maps them
      // back — the model stays "each id exactly once"
      val transformed = pi % 3 == 0
      val transform =
        if (transformed) Some("raw_id as id, upper(raw_v) as v") else None
      var nextId = 0L
      def drop(): Unit = {
        val k = 1 + rnd.nextInt(4)
        val rows = (nextId until nextId + k).map(i => (i, s"v$i"))
        (if (transformed) rows.toDF("raw_id", "raw_v") else rows.toDF("id", "v"))
          .repartition(1).write.mode("append").parquet(src)
        nextId += k
      }
      def runOk(): Unit = { CopyInto.run(t, src, transform = transform); () }
      def runCrash(): Unit = {
        CopyInto.onIntentRecorded = () => throw new RuntimeException("fuzz-crash")
        try {
          try { CopyInto.run(t, src, transform = transform); () }
          catch { case e: RuntimeException if e.getMessage == "fuzz-crash" => () }
        } finally CopyInto.onIntentRecorded = () => ()
      }
      def runConcurrent(): Unit = {
        val threads = (0 until 2).map(_ => new Thread(() =>
          try { CopyInto.run(t, src, transform = transform); () }
          catch {
            // losing the intent race repeatedly is a legal outcome for
            // one runner; the data invariant still must hold at the end
            case _: graft.catalog.UnsupportedOperationError => ()
          }))
        threads.foreach(_.start())
        threads.foreach(_.join())
      }
      drop()
      (0 until 3 + rnd.nextInt(4)).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 => drop()
          case 2 => runOk()
          case 3 => runCrash()
          case 4 => runConcurrent()
        }
      }
      runOk() // final clean run: recovers any crashed intent, loads stragglers
      val got = t.toDF.select("id").as[Long].collect().sorted.toSeq
      assert(got == (0L until nextId),
        s"program $pi: exactly-once violated — expected ids [0, $nextId), got " +
          s"${got.length} rows (dups: ${got.diff(got.distinct).distinct.take(5)}, " +
          s"missing: ${(0L until nextId).diff(got).take(5)})")
    }
  }
}
