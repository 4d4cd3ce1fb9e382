package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.catalog.UnsupportedOperationError

/** ANALYZE TABLE — persisted, incrementally-maintained per-column
  * statistics.
  *
  * One scan computes a KMV distinct-count sketch per requested column
  * (all columns in the same pass — column-pruned, map-side combined,
  * k longs per partial) plus exact integral sums, and stamps them into
  * table properties:
  *
  *   graft.stats.ndv.<col>   = the NDV estimate (long; EXACT when the
  *                             column's distinct count is below k)
  *   graft.stats.kmv.<col>   = the SKETCH itself (base64 of the sorted
  *                             shifted hashes, ~8 bytes/entry) — what
  *                             makes the stat MAINTAINABLE: sketches
  *                             merge exactly, scalars don't
  *   graft.stats.sum.<col>   = exact SUM as a decimal string
  *   graft.stats.fingerprint = a hash of the analyzed snapshot's
  *                             (path, dvCardinality) set + schema shape
  *
  * The fingerprint is what makes CONSUMING the stats sound: a reader
  * (the `APPROX_COUNT_DISTINCT`/`SUM` metadata-only rewrites, the
  * planner-statistics surface, a dashboard) recomputes the fingerprint
  * from the CURRENT snapshot — O(metadata) — and uses the stats only on
  * exact match. Any commit that changes visible rows or the schema
  * shape silently invalidates; property-only commits (including the
  * stamping commit itself) don't touch it. Stale stats are never
  * silently served. The schema shape rides in the fingerprint because
  * metadata-only column DDL (DROP COLUMN c; ADD COLUMN c) can reuse a
  * name WITHOUT changing the file set — a file-only fingerprint would
  * re-validate the old column's stats for the new one.
  *
  * INCREMENTAL MAINTENANCE (the 100 TB production path): a COPY
  * INTO-fed table appends nightly, and a point-in-time stamp would die
  * on the first drop, forcing a full re-scan ANALYZE each morning.
  * Instead, every APPEND to a freshly-stamped table FOLDS the batch in
  * ([[foldAppend]], hooked from TxTable's append paths): one
  * column-pruned aggregate over JUST the appended files (data the
  * writer has hot anyway) merges the batch's sketch into the stamped
  * sketch — exact for KMV: the k smallest hashes of a union are the
  * k smallest of the parts' k-smallest — and adds the batch's sum, then
  * restamps under the post-commit fingerprint. Stats therefore stay
  * scan-free across any append chain at O(batch) maintenance cost,
  * while deletes/updates/overwrites/compaction still invalidate (their
  * row deltas are not derivable from an append-shaped fold). A fold
  * that fails or loses a race degrades to a stale stamp — never a
  * wrong answer.
  *
  * Why NDV at 100 TB: distinct counts drive join-strategy and
  * aggregation-sizing decisions, and "how many distinct users/URLs does
  * this table hold" is a permanent dashboard fixture — one ANALYZE scan
  * amortizes over every later metadata-only answer.
  */
object ColumnStats {
  val NdvPropPrefix = "graft.stats.ndv."
  /** The persisted KMV sketch per analyzed column (base64 longs). */
  val KmvPropPrefix = "graft.stats.kmv."
  /** Exact column SUM (integral columns only), stamped by the same
    * ANALYZE scan as a decimal string ("null" for an empty or all-null
    * column, where SQL SUM answers NULL). Same fingerprint freshness
    * rule as NDV: any non-append data commit silently invalidates. */
  val SumPropPrefix = "graft.stats.sum."
  /** EXACT column extremes from the same one ANALYZE scan, for every
    * orderable type — including the ones per-file footer stats can
    * NEVER soundly serve (strings truncate, floats have NaN/-0.0
    * hazards): the scan computes the true MIN/MAX with Spark's own
    * ordering, so there is nothing to distrust. Encoded "n" for SQL
    * NULL (empty/all-null) else "v" + a type-faithful rendering;
    * appends fold (min/max merge exactly), deletes invalidate. */
  val MinPropPrefix = "graft.stats.min."
  val MaxPropPrefix = "graft.stats.max."
  /** Exact NON-NULL count per analyzed column (decimal string). Folds
    * both ways (appends add, provable deletes subtract) and is what
    * makes two things decidable from the stamp alone: SUM's SQL
    * NULL-vs-0 boundary after a delete (zero non-null values remaining
    * → NULL), and the planner's CatalogColumnStat.nullCount
    * (rowCount − cnt). Absent on pre-r14 stamps — every consumer
    * treats absence as "unknown", never as zero. */
  val CntPropPrefix = "graft.stats.cnt."
  /** Per-PARTITION KMV sketches (partitioned tables only, bounded by
    * [[MaxStampedPartitions]]): pvals holds the ordered JSON list of
    * stamped partition tuples, pkmv.<col>.<i> the sketch of column
    * <col> restricted to tuple i. What makes APPROX_COUNT_DISTINCT
    * absorbable under a partition-only WHERE: KMV sketches merge
    * exactly, so the surviving partitions' sketches recombine into the
    * filtered answer at O(#partitions × k) driver cost. */
  val PkmvPropPrefix = "graft.stats.pkmv."
  val PvalsProp = "graft.stats.pvals"
  /** The snapshot version the stamp currently BINDS to (analyze scan /
    * latest fold / restamp target) — SHOW STATISTICS surfaces it so an
    * operator can judge the stamp's age at a glance. */
  val VersionProp = "graft.stats.version"
  val FingerprintProp = "graft.stats.fingerprint"
  val KProp = "graft.stats.k"

  /** Per-partition sketches are stamped only up to this many partition
    * tuples — each sketch is ~32 KB of property text, and table
    * properties ride every commit. Beyond the cap only the table-wide
    * sketch is stamped (filtered APPROX falls back to the scan). */
  val MaxStampedPartitions = 64

  /** Sketch size: exact below 4096 distinct, ~1.6% relative error above. */
  val K = 4096

  /** Order-insensitive fingerprint of a snapshot's live-data identity:
    * the sorted (path, DV cardinality) pairs plus the schema SHAPE
    * (name:type:nullable per field — not metadata, so identity-column
    * watermark bumps riding an append don't spuriously invalidate
    * between fold and read). DV cardinality rides along because a
    * merge-on-read delete changes visible rows WITHOUT changing the
    * file list; the schema rides along because column DDL can reuse a
    * name without changing it (see class doc).
    */
  def fingerprint(snap: TxLog.Snapshot): Long = {
    val entries = snap.files
      .map(f => s"${f.path}#${f.deletionVector.map(_.cardinality).getOrElse(0L)}")
      .sorted :+
      snap.schema.fields
        .map(f => s"${f.name}:${f.dataType.catalogString}:${f.nullable}")
        .mkString("schema|", "|", "")
    // Two independently-seeded 32-bit Murmur hashes packed into 64 bits:
    // file-count-only collisions (two equal-size file sets) would pass a
    // 32-bit check with ~2^-32 probability; 64 bits makes a silent stale
    // serve astronomically unlikely.
    val lo = scala.util.hashing.MurmurHash3.orderedHash(entries).toLong & 0xffffffffL
    val hi = scala.util.hashing.MurmurHash3.orderedHash(entries, 0x9747b28c).toLong & 0xffffffffL
    (hi << 32) | lo
  }

  /** Whether a fresh stamp exists for this snapshot (cheap pre-check:
    * no fingerprint property → no hashing at all). */
  def isFresh(snap: TxLog.Snapshot): Boolean =
    snap.properties.get(FingerprintProp).exists(_ == fingerprint(snap).toString)

  // ---- sketch property codec: sorted shifted hashes <-> base64 ----

  // leading "b" so the EMPTY sketch (an all-null column saw zero
  // distinct values) still encodes non-empty — setProperties treats an
  // empty value as an UNSET, which would silently drop the key and
  // disable the fold for that column
  private[tables] def encodeSketch(hashes: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(hashes.length * 8)
    hashes.foreach(bb.putLong)
    "b" + java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  private[tables] def decodeSketch(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s.stripPrefix("b"))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  /** Exact KMV merge of two sorted sketch arrays: k smallest DISTINCT
    * shifted hashes of the union (same math as the KmvMerge expression,
    * driver-side over metadata-sized arrays). */
  private[tables] def mergeSketches(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  private def integralColumns(snap: TxLog.Snapshot, columns: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    columns.filter(c =>
      snap.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
  }

  // ---- typed codec for stamped extremes (INTERNAL Catalyst values) ----

  import org.apache.spark.sql.types._

  /** Types whose exact extremes are stamp-able: a total SQL ordering
    * plus a round-trippable string rendering. */
  private[tables] def orderable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | StringType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Internal value -> round-trippable string. Float/Double toString
    * round-trips exactly (Java guarantee); decimals via plain string. */
  private[tables] def renderValue(dt: DataType, v: Any): String = dt match {
    case StringType => v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString
    case _ => v.toString
  }

  /** String -> internal Catalyst value of `dt`. */
  private[tables] def parseValue(dt: DataType, s: String): Any = dt match {
    case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case ByteType => s.toByte
    case ShortType => s.toShort
    case IntegerType | DateType => s.toInt
    case LongType | TimestampType | TimestampNTZType => s.toLong
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case BooleanType => s.toBoolean
    case d: DecimalType => Decimal(new java.math.BigDecimal(s), d.precision, d.scale)
    case other => throw new IllegalStateException(s"unstampable extreme type $other")
  }

  /** SQL ordering over internal values — strings binary (UTF8String,
    * Spark's default collation), floats with NaN greatest and
    * -0.0 == 0.0 (SQLOrderingUtil semantics), decimals numeric. */
  private def compareValues(dt: DataType, a: Any, b: Any): Int = dt match {
    case StringType =>
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    case FloatType =>
      val (x, y) = (a.asInstanceOf[Float], b.asInstanceOf[Float])
      if (x == y) 0 else java.lang.Float.compare(x, y)
    case DoubleType =>
      val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
      if (x == y) 0 else java.lang.Double.compare(x, y)
    case _: DecimalType => a.asInstanceOf[Decimal].compare(b.asInstanceOf[Decimal])
    case BooleanType =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case _ =>
      java.lang.Long.compare(a.asInstanceOf[Number].longValue(),
        b.asInstanceOf[Number].longValue())
  }

  /** Merge two encoded extremes ("n" | "v"+rendered) under `dt`'s
    * ordering; the OLD value wins ties (either is SQL-correct). */
  private def foldExtreme(dt: DataType, oldEnc: String, batchEnc: String,
      isMin: Boolean): String = {
    if (oldEnc == "n") return batchEnc
    if (batchEnc == "n") return oldEnc
    val o = parseValue(dt, oldEnc.drop(1))
    val b = parseValue(dt, batchEnc.drop(1))
    val c = compareValues(dt, b, o)
    val batchWins = if (isMin) c < 0 else c > 0
    if (batchWins) batchEnc else oldEnc
  }

  /** One column-pruned aggregate pass over `df`: KMV sketch per column,
    * decimal(38,0) sums for the integral subset, exact MIN/MAX for the
    * orderable subset — collected as INTERNAL rows so extremes keep
    * their Catalyst representations (UTF8String, days-int, micros-long,
    * Decimal). Returns (sketches aligned to `columns`, sums aligned to
    * `integral` as decimal strings with "null" for SQL NULL, encoded
    * (min, max) pairs aligned to `extremes`). */
  private def scanStats(df: org.apache.spark.sql.DataFrame, columns: Seq[String],
      integral: Seq[String], extremes: Seq[(String, DataType)], k: Int)
      : (Seq[Array[Long]], Seq[String], Seq[(String, String)]) = {
    val aggs = columns.map(c => graft.functions.KmvFunctions
      .kmvSketch(col(s"`$c`").cast(StringType), k).as(s"__kmv_$c")) ++
      // exact sums ride the SAME scan: decimal(38,0) accumulation so a
      // 100 TB-scale sum cannot silently wrap
      integral.map(c => sum(col(s"`$c`").cast("decimal(38,0)")).as(s"__sum_$c")) ++
      extremes.flatMap { case (c, _) =>
        Seq(min(col(s"`$c`")).as(s"__min_$c"), max(col(s"`$c`")).as(s"__max_$c")) }
    val plan = df.agg(aggs.head, aggs.tail: _*)
    val row = plan.queryExecution.executedPlan.executeCollect()(0)
    val sketches = columns.indices.map(i =>
      row.getArray(i).toLongArray())
    val sums = integral.indices.map { i =>
      val idx = columns.size + i
      if (row.isNullAt(idx)) "null"
      else row.getDecimal(idx, 38, 0).toJavaBigDecimal.toBigInteger.toString
    }
    val base = columns.size + integral.size
    val mms = extremes.zipWithIndex.map { case ((_, dt), i) =>
      def enc(idx: Int): String =
        if (row.isNullAt(idx)) "n" else "v" + renderValue(dt, row.get(idx, dt))
      (enc(base + 2 * i), enc(base + 2 * i + 1))
    }
    (sketches, sums, mms)
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
    val integral = integralColumns(snap, columns)
    val extremes = columns.filter(c => orderable(snap.schema(c).dataType))
      .map(c => c -> snap.schema(c).dataType)
    // scan pinned at the fingerprinted version: a concurrent commit
    // between scan and stamp then simply invalidates (fingerprint
    // mismatch) instead of mislabeling the new state
    val (sketches, sums, mms) =
      scanStats(table.toDF(snap.version), columns, integral, extremes, K)
    val ndvs = columns.zip(sketches).map { case (c, sk) =>
      c -> math.round(graft.functions.KmvEstimate.cardinality(sk, K))
    }
    // A partial re-ANALYZE refreshes the ONE table-level fingerprint, so
    // any graft.stats.* key left over from a PREVIOUS analyze of other
    // columns would be re-validated against the new fingerprint and served
    // stale. Unset every prefixed key we are not restamping in the SAME
    // commit (setProperties treats null as delete).
    val mmCols = extremes.map(_._1)
    val stale = table.snapshot.properties.keys
      .filter(k =>
        ((k.startsWith(NdvPropPrefix) && !columns.contains(k.stripPrefix(NdvPropPrefix))) ||
         (k.startsWith(KmvPropPrefix) && !columns.contains(k.stripPrefix(KmvPropPrefix))) ||
         (k.startsWith(SumPropPrefix) && !integral.contains(k.stripPrefix(SumPropPrefix))) ||
         (k.startsWith(MinPropPrefix) && !mmCols.contains(k.stripPrefix(MinPropPrefix))) ||
         (k.startsWith(MaxPropPrefix) && !mmCols.contains(k.stripPrefix(MaxPropPrefix)))))
      .map(_ -> (null: String)).toMap
    table.setProperties(
      stale ++
        ndvs.map { case (c, n) => s"$NdvPropPrefix$c" -> n.toString }.toMap ++
        columns.zip(sketches).map { case (c, sk) =>
          s"$KmvPropPrefix$c" -> encodeSketch(sk) }.toMap ++
        integral.zip(sums).map { case (c, v) => s"$SumPropPrefix$c" -> v }.toMap ++
        extremes.zip(mms).flatMap { case ((c, _), (mn, mx)) =>
          Seq(s"$MinPropPrefix$c" -> mn, s"$MaxPropPrefix$c" -> mx) }.toMap ++
        Map(FingerprintProp -> fingerprint(snap).toString, KProp -> K.toString))
    ndvs
  }

  /** Fold an APPEND batch into a stamp that was fresh when the append
    * was planned: one column-pruned aggregate over exactly the files
    * the commit added (O(batch), not O(table)), sketch-merged and
    * sum-added driver-side, restamped under the fingerprint of the
    * committed snapshot. Called by TxTable after a successful append
    * commit at `commitVersion` that added `addedPaths`.
    *
    * Any failure or missing piece (a stamp predating sketch
    * persistence, a stamped column gone from the schema, a concurrent
    * commit) just leaves the old stamp in place — its fingerprint no
    * longer matches, readers scan, nothing is ever wrong.
    */
  private[tables] def foldAppend(table: TxTable, commitVersion: Long,
      added: Seq[TxLog.AddFile]): Unit = {
    if (added.isEmpty) return // file set unchanged: stamp still fresh as-is
    try {
      val snap = table.snapshotAt(commitVersion)
      val props = snap.properties
      val k = props.get(KProp).flatMap(_.toIntOption).getOrElse(return)
      val ndvCols = props.keys.filter(_.startsWith(NdvPropPrefix))
        .map(_.stripPrefix(NdvPropPrefix)).toSeq.sorted
      val sumCols = props.keys.filter(_.startsWith(SumPropPrefix))
        .map(_.stripPrefix(SumPropPrefix)).toSeq.sorted
      val minCols = props.keys.filter(_.startsWith(MinPropPrefix))
        .map(_.stripPrefix(MinPropPrefix)).toSet
      val maxCols = props.keys.filter(_.startsWith(MaxPropPrefix))
        .map(_.stripPrefix(MaxPropPrefix)).toSet
      // an UNPAIRED extreme (min without max or vice versa — e.g. a
      // manual UNSET TBLPROPERTIES) means the stamp is no longer the
      // shape ANALYZE wrote: abort the WHOLE fold (stamp stays stale),
      // exactly like a missing sketch — silently dropping the column
      // would re-freshen the un-folded survivor as servable
      if (minCols != maxCols) return
      val mmCols = minCols.toSeq.sorted
      if (ndvCols.isEmpty && sumCols.isEmpty && mmCols.isEmpty) return
      val known = snap.schema.fieldNames.toSet
      if (!(ndvCols ++ sumCols ++ mmCols).forall(known.contains)) return
      val extremes = mmCols.map(c => c -> snap.schema(c).dataType)
      if (extremes.exists { case (_, dt) => !orderable(dt) }) return
      // every NDV column needs its persisted sketch — a scalar alone
      // cannot merge (pre-sketch stamps fall back to full re-ANALYZE)
      val oldSketches = ndvCols.map(c => props.get(KmvPropPrefix + c))
      if (oldSketches.exists(_.isEmpty)) return
      val scanCols = (ndvCols ++ sumCols ++ mmCols).distinct
      // identify the batch inside the COMMITTED snapshot by the files'
      // unique (uuid-bearing) final name segment — staged AddFile paths
      // and snapshot paths can render differently (Iceberg manifests
      // record absolute paths, stage returns names), and a silent
      // path-string mismatch here once stamped UNFOLDED values as fresh
      val names = added.map(_.path.split('/').last).toSet
      val committedAdds = snap.files.filter(f => names.contains(f.path.split('/').last))
      if (committedAdds.size != added.size) return // can't bind the batch -> stay stale
      val batchDf = table.dfForAddedFiles(snap, committedAdds)
        .select(scanCols.map(c => col(s"`$c`")): _*)
      // belt-and-braces for the same hazard: the batch the fold reads
      // must hold the rows the commit added (when the stats say so)
      val expectRows = added.map(_.rows)
      if (expectRows.forall(_ >= 0L) && expectRows.sum > 0L && batchDf.isEmpty)
        return
      val (batchSketches, batchSums, batchMms) =
        scanStats(batchDf, ndvCols, sumCols, extremes, k)
      val mergedSketches = ndvCols.indices.map { i =>
        mergeSketches(decodeSketch(oldSketches(i).get), batchSketches(i), k)
      }
      val newSums = sumCols.zip(batchSums).map { case (c, b) =>
        val old = props(SumPropPrefix + c)
        val v =
          if (old == "null" && b == "null") "null"
          else if (old == "null") b
          else if (b == "null") old
          else (BigInt(old) + BigInt(b)).toString
        c -> v
      }
      val newMms = extremes.zip(batchMms).flatMap { case ((c, dt), (bMin, bMax)) =>
        Seq(
          s"$MinPropPrefix$c" ->
            foldExtreme(dt, props(MinPropPrefix + c), bMin, isMin = true),
          s"$MaxPropPrefix$c" ->
            foldExtreme(dt, props(MaxPropPrefix + c), bMax, isMin = false))
      }
      table.setProperties(
        ndvCols.zip(mergedSketches).flatMap { case (c, sk) =>
          Seq(
            s"$NdvPropPrefix$c" ->
              math.round(graft.functions.KmvEstimate.cardinality(sk, k)).toString,
            s"$KmvPropPrefix$c" -> encodeSketch(sk))
        }.toMap ++
          newSums.map { case (c, v) => s"$SumPropPrefix$c" -> v }.toMap ++
          newMms.toMap ++
          Map(FingerprintProp -> fingerprint(snap).toString))
    } catch {
      // stats maintenance must never fail the append; a skipped fold
      // leaves a stale (fingerprint-mismatched) stamp -> readers scan
      case scala.util.control.NonFatal(e) =>
        if (sys.props.contains("graft.debugFold")) e.printStackTrace()
    }
  }

  /** Re-issue ONLY the fingerprint after a content-preserving rewrite
    * (OPTIMIZE/ZORDER/REORG, hooked from TxTable's commit path): the
    * visible rows — and therefore every stamped statistic — are
    * unchanged, only the file-set identity moved. Same failure
    * posture as the fold: any problem leaves a stale stamp, never a
    * wrong answer.
    */
  private[tables] def restampFingerprint(table: TxTable, commitVersion: Long): Unit =
    try {
      val snap = table.snapshotAt(commitVersion)
      if (snap.properties.contains(FingerprintProp))
        table.setProperties(Map(FingerprintProp -> fingerprint(snap).toString))
    } catch { case scala.util.control.NonFatal(_) => () }

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

  /** The stamped exact MIN/MAX of `column` as an INTERNAL Catalyst
    * value IF the stats still describe the current snapshot. Covers the
    * types per-file footer stats can never soundly answer (strings,
    * floats) because ANALYZE computed the true extreme with Spark's own
    * ordering. Some(None) = a fresh stamp of an empty/all-null column
    * (SQL answers NULL); outer None = stale/absent/undecodable → scan.
    */
  def currentMinMax(snap: TxLog.Snapshot, column: String,
      isMin: Boolean): Option[Option[Any]] =
    try {
      for {
        fp <- snap.properties.get(FingerprintProp)
        if fp == fingerprint(snap).toString
        field <- snap.schema.fields.find(_.name == column)
        enc <- snap.properties.get(
          (if (isMin) MinPropPrefix else MaxPropPrefix) + column)
        v <- if (enc == "n") Some(None)
          else Some(Some(parseValue(field.dataType, enc.drop(1))))
      } yield v
    } catch { case scala.util.control.NonFatal(_) => None }
}
