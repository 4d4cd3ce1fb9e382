package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.catalog.UnsupportedOperationError

/** ANALYZE TABLE — persisted per-column NDV statistics.
  *
  * One scan computes a KMV distinct-count sketch per requested column
  * (all columns in the same pass — column-pruned, map-side combined,
  * k longs per partial) and stamps the estimates into table properties:
  *
  *   graft.stats.ndv.<col>   = the NDV estimate (long; EXACT when the
  *                             column's distinct count is below k)
  *   graft.stats.fingerprint = a hash of the analyzed snapshot's
  *                             (path, dvCardinality) set
  *
  * The fingerprint is what makes CONSUMING the stats sound: a reader
  * (the `APPROX_COUNT_DISTINCT` metadata-only rewrite, a join planner,
  * a dashboard) recomputes the fingerprint from the CURRENT snapshot —
  * O(metadata) — and uses the stats only on exact match. Any
  * data-changing commit (append, delete, merge, even OPTIMIZE) changes
  * the file set and silently invalidates; property-only commits
  * (including the stamping commit itself) don't touch it. Stale stats
  * are never silently served.
  *
  * Why NDV at 100 TB: distinct counts drive join-strategy and
  * aggregation-sizing decisions, and "how many distinct users/URLs does
  * this table hold" is a permanent dashboard fixture — one ANALYZE scan
  * amortizes over every later metadata-only answer.
  */
object ColumnStats {
  val NdvPropPrefix = "graft.stats.ndv."
  /** Exact column SUM (integral columns only), stamped by the same
    * ANALYZE scan as a decimal string ("null" for an empty or all-null
    * column, where SQL SUM answers NULL). Same fingerprint freshness
    * rule as NDV: any data commit silently invalidates. */
  val SumPropPrefix = "graft.stats.sum."
  val FingerprintProp = "graft.stats.fingerprint"
  val KProp = "graft.stats.k"

  /** Sketch size: exact below 4096 distinct, ~1.6% relative error above. */
  val K = 4096

  /** Order-insensitive fingerprint of a snapshot's live-data identity:
    * the sorted (path, DV cardinality) pairs. DV cardinality rides along
    * because a merge-on-read delete changes visible rows WITHOUT
    * changing the file list.
    */
  def fingerprint(snap: TxLog.Snapshot): Long = {
    val entries = snap.files
      .map(f => s"${f.path}#${f.deletionVector.map(_.cardinality).getOrElse(0L)}")
      .sorted
    // Two independently-seeded 32-bit Murmur hashes packed into 64 bits:
    // file-count-only collisions (two equal-size file sets) would pass a
    // 32-bit check with ~2^-32 probability; 64 bits makes a silent stale
    // serve astronomically unlikely.
    val lo = scala.util.hashing.MurmurHash3.orderedHash(entries).toLong & 0xffffffffL
    val hi = scala.util.hashing.MurmurHash3.orderedHash(entries, 0x9747b28c).toLong & 0xffffffffL
    (hi << 32) | lo
  }

  /** Compute NDV for `columns` in ONE scan and stamp the stats. Returns
    * (column, ndv) in the requested order.
    */
  def analyze(table: TxTable, columns: Seq[String]): Seq[(String, Long)] = {
    require(columns.nonEmpty, "ANALYZE: at least one column required")
    val snap = table.snapshot
    val known = snap.schema.fieldNames.toSet
    columns.foreach(c => if (!known.contains(c))
      throw UnsupportedOperationError(
        s"ANALYZE: column $c not found in ${snap.schema.fieldNames.mkString(", ")}"))
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = columns.filter(c =>
      snap.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    val aggs = columns.map(c => graft.functions.KmvFunctions
      .kmvSketch(col(s"`$c`").cast(StringType), K).as(c)) ++
      // exact sums ride the SAME scan: decimal(38,0) accumulation so a
      // 100 TB-scale sum cannot silently wrap
      integral.map(c => sum(col(s"`$c`").cast("decimal(38,0)")).as(s"__sum_$c"))
    // scan pinned at the fingerprinted version: a concurrent commit
    // between scan and stamp then simply invalidates (fingerprint
    // mismatch) instead of mislabeling the new state
    val row = table.toDF(snap.version).agg(aggs.head, aggs.tail: _*).collect()(0)
    val ndvs = columns.zipWithIndex.map { case (c, i) =>
      c -> math.round(graft.functions.KmvEstimate.cardinality(
        row.getSeq[Long](i).toArray, K))
    }
    val sums = integral.zipWithIndex.map { case (c, i) =>
      val v = row.get(columns.size + i)
      c -> (if (v == null) "null" else v.asInstanceOf[java.math.BigDecimal].toBigInteger.toString)
    }
    // A partial re-ANALYZE refreshes the ONE table-level fingerprint, so
    // any graft.stats.ndv.* key left over from a PREVIOUS analyze of other
    // columns would be re-validated against the new fingerprint and served
    // stale. Unset every prefixed key we are not restamping in the SAME
    // commit (setProperties treats null as delete).
    val stale = table.snapshot.properties.keys
      .filter(k =>
        (k.startsWith(NdvPropPrefix) && !columns.contains(k.stripPrefix(NdvPropPrefix))) ||
        (k.startsWith(SumPropPrefix) && !integral.contains(k.stripPrefix(SumPropPrefix))))
      .map(_ -> (null: String)).toMap
    table.setProperties(
      stale ++
        ndvs.map { case (c, n) => s"$NdvPropPrefix$c" -> n.toString }.toMap ++
        sums.map { case (c, v) => s"$SumPropPrefix$c" -> v }.toMap ++
        Map(FingerprintProp -> fingerprint(snap).toString, KProp -> K.toString))
    ndvs
  }

  /** The stamped NDV of `column` IF the stats still describe the
    * current snapshot (fingerprint match), else None.
    */
  def currentNdv(snap: TxLog.Snapshot, column: String): Option[Long] =
    for {
      fp <- snap.properties.get(FingerprintProp)
      if fp == fingerprint(snap).toString
      v <- snap.properties.get(s"$NdvPropPrefix$column")
      n <- v.toLongOption
    } yield n

  /** The stamped exact SUM of `column` IF the stats still describe the
    * current snapshot. Some(None) = a fresh stamp of an empty/all-null
    * column (SQL SUM answers NULL); values that no longer fit a Long
    * answer None (the scan's own Long accumulation is the engine's
    * semantics — never serve what a scan couldn't produce).
    */
  def currentSum(snap: TxLog.Snapshot, column: String): Option[Option[Long]] =
    for {
      fp <- snap.properties.get(FingerprintProp)
      if fp == fingerprint(snap).toString
      v <- snap.properties.get(s"$SumPropPrefix$column")
      parsed <- if (v == "null") Some(None)
        else v.toLongOption.map(n => Some(n))
    } yield parsed
}
