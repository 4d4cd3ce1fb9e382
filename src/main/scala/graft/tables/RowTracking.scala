package graft.tables

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta row tracking (PROTOCOL.md "Row Tracking"): every physical row
  * gets a stable fresh row id `baseRowId + position` and the commit
  * version it was last written in, with the id space allocated from a
  * `rowIdHighWaterMark` kept in the `delta.rowTracking` metadata domain.
  *
  * Support here is the append side: commits that ADD files assign
  * baseRowId / defaultRowCommitVersion per add action and advance the
  * watermark via a domainMetadata action in the SAME commit (atomic, like
  * identity columns). Rewriting operations (UPDATE/DELETE/MERGE/OPTIMIZE)
  * on row-tracking tables are REFUSED: preserving row ids through a
  * rewrite requires materializing them into the rewritten files, which
  * this writer does not implement — refusal keeps us spec-compliant
  * rather than silently breaking other engines' row lineage.
  */
private[tables] object RowTracking {
  val Domain = "delta.rowTracking"
  val EnableProp = "delta.enableRowTracking"
  private implicit val formats: Formats = DefaultFormats

  def enabled(props: Map[String, String]): Boolean =
    props.get(EnableProp).exists(_.equalsIgnoreCase("true"))

  /** Current high watermark from the domain configuration (-1 = none). */
  def highWaterMark(domains: collection.Map[String, (String, Boolean)]): Long =
    domains.get(Domain).filterNot(_._2).flatMap { case (conf, _) =>
      try (JsonMethods.parse(conf) \ "rowIdHighWaterMark").extractOpt[Long]
      catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse(-1L)

  /** Assign baseRowId/defaultRowCommitVersion to `added` starting above
    * `hwm`, landing at `commitVersion`. Returns the stamped adds and the
    * domainMetadata action line advancing the watermark.
    */
  def stamp(added: Seq[TxLog.AddFile], hwm: Long,
      commitVersion: Long): (Seq[TxLog.AddFile], Option[String]) = {
    if (added.isEmpty) return (added, None)
    require(added.forall(_.rows >= 0),
      "row tracking requires per-file row counts on every staged add")
    var next = hwm + 1
    val stamped = added.map { a =>
      val s = a.copy(baseRowId = Some(next), defaultRowCommitVersion = Some(commitVersion))
      next += a.rows
      s
    }
    val action = JsonMethods.compact(JsonMethods.render(JObject(
      "domainMetadata" -> JObject(
        "domain" -> JString(Domain),
        "configuration" -> JString(s"""{"rowIdHighWaterMark":${next - 1}}"""),
        "removed" -> JBool(false)))))
    (stamped, Some(action))
  }
}
