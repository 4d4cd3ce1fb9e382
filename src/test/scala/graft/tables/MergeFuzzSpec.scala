package graft.tables

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Model-based fuzz of MERGE clause semantics: random clause sets
  * (conditional updates, deletes, inserts, by-source actions, in random
  * order) applied repeatedly against an in-memory model that replays the
  * documented rule — per category, the FIRST clause whose condition
  * passes wins; matched-but-no-clause keeps; unmatched-source rows with
  * no applicable insert drop. Deterministic seeds make failures
  * replayable. Complements the example-based merge matrix in
  * TxTableSpec with breadth.
  */
class MergeFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a condition usable in a clause: SQL text + the model's evaluation
  // (tv = target row's v, sv = matching source row's v; -1 when absent)
  private case class Cond(sql: String, eval: (Long, Long) => Boolean)
  private val matchedConds = Seq(
    None,
    Some(Cond("s.v % 2 = 0", (_, sv) => sv % 2 == 0)),
    Some(Cond("t.v % 3 = 0", (tv, _) => tv % 3 == 0)))
  private val insertConds = Seq(
    None,
    Some(Cond("s.v % 2 = 1", (_, sv) => sv % 2 == 1)))
  private val bySourceConds = Seq(
    None,
    Some(Cond("t.v % 2 = 0", (tv, _) => tv % 2 == 0)))

  private sealed trait MClause
  private case class MUpd(c: Option[Cond]) extends MClause
  private case class MDel(c: Option[Cond]) extends MClause
  private case class BUpd(c: Option[Cond]) extends MClause
  private case class BDel(c: Option[Cond]) extends MClause

  private def runProgram(seed: Long, merges: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val loc = TestSpark.tmpDir(s"merge-fuzz-$seed")
    val t = new TxTable(spark, loc)
    var model: Vector[(Long, Long)] =
      Vector.fill(8)((rnd.nextInt(8).toLong, rnd.nextInt(100).toLong))
    t.create(model.toDF("k", "v").repartition(2))

    (1 to merges).foreach { step =>
      val source = rnd.shuffle((0L to 9L).toList)
        .take(1 + rnd.nextInt(6)).map(k => (k, rnd.nextInt(100).toLong))
      val srcByK = source.toMap

      val matchedClauses: Seq[MClause] = rnd.shuffle(Seq(
        Option.when(rnd.nextBoolean())(MUpd(matchedConds(rnd.nextInt(matchedConds.size)).map(identity))),
        Option.when(rnd.nextBoolean())(MDel(matchedConds(rnd.nextInt(matchedConds.size)).map(identity)))
      ).flatten)
      val insertClause = Option.when(rnd.nextBoolean())(
        insertConds(rnd.nextInt(insertConds.size)))
      val bySourceClauses: Seq[MClause] = rnd.shuffle(Seq(
        Option.when(rnd.nextInt(3) == 0)(BUpd(bySourceConds(rnd.nextInt(bySourceConds.size)).map(identity))),
        Option.when(rnd.nextInt(3) == 0)(BDel(bySourceConds(rnd.nextInt(bySourceConds.size)).map(identity)))
      ).flatten)

      // build the real merge in the same clause order
      var m = t.merge(source.toDF("k", "v"), "s.k = t.k")
      matchedClauses.foreach {
        case MUpd(c) => m = m.whenMatchedUpdate(Map("v" -> "t.v + s.v"), c.map(_.sql))
        case MDel(c) => m = m.whenMatchedDelete(c.map(_.sql))
        case _ => ()
      }
      insertClause.foreach(c => m = m.whenNotMatchedInsert(
        Map("k" -> "s.k", "v" -> "s.v"), c.map(_.sql)))
      bySourceClauses.foreach {
        case BUpd(c) => m = m.whenNotMatchedBySourceUpdate(Map("v" -> "t.v + 1"), c.map(_.sql))
        case BDel(c) => m = m.whenNotMatchedBySourceDelete(c.map(_.sql))
        case _ => ()
      }
      m.execute()

      // replay on the model
      val matchedKeys = model.map(_._1).toSet
      val afterTarget = model.flatMap { case (k, v) =>
        srcByK.get(k) match {
          case Some(sv) =>
            matchedClauses.collectFirst {
              case MUpd(c) if c.forall(_.eval(v, sv)) => Some((k, v + sv))
              case MDel(c) if c.forall(_.eval(v, sv)) => None
            }.getOrElse(Some((k, v)))
          case None =>
            bySourceClauses.collectFirst {
              case BUpd(c) if c.forall(_.eval(v, -1L)) => Some((k, v + 1))
              case BDel(c) if c.forall(_.eval(v, -1L)) => None
            }.getOrElse(Some((k, v)))
        }
      }
      val inserts = source.collect {
        case (k, sv) if !matchedKeys.contains(k) &&
            insertClause.exists(_.forall(_.eval(-1L, sv))) => (k, sv)
      }
      model = afterTarget ++ inserts

      val got = t.toDF.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == model.sorted,
        s"[$seed/step$step] merge diverged\nclauses m=$matchedClauses i=$insertClause b=$bySourceClauses\nsrc=$source")
    }
  }

  test("random merge programs agree with the first-applicable-clause model") {
    Seq(7L, 23L, 4242L).foreach(runProgram(_, merges = 8))
  }
}
