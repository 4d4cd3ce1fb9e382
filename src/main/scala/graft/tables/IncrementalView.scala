package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.catalog.UnsupportedOperationError

/** Incrementally-maintained aggregate materialized views — the lakehouse
  * answer to "this dashboard groupBy rescans 100 TB every hour".
  *
  * A view is an ordinary transactional table holding
  * `keys ++ n_rows ++ sum_<c>...` (averages are `sum_c / n_rows` on
  * read), refreshed from a source TxTable by folding only the rows that
  * CHANGED since the last refresh — O(changed rows + touched view
  * files), never O(source):
  *
  *   - first refresh ever ("initial"): fold the source's full
  *     state-at-version snapshot — never a history replay, which a log
  *     whose early commits were cleaned up after checkpointing would
  *     answer incompletely;
  *   - source commits since the watermark were append-only (the common
  *     ingest shape; `CommitLog.appendOnlyBetween` proves it from the
  *     log): aggregate just the new rows (`changesSince`) and MERGE the
  *     per-group deltas into the view — counts and sums are
  *     self-maintainable, so `t.n + s.dn` is exact;
  *   - a row-level feed is available — a foreign Delta source with
  *     Change Data Feed enabled, or ANY Iceberg source (the snapshot-diff
  *     changelog is always derivable): the exact feed (`tableChanges`)
  *     folds with sign — inserts and update postimages +1, deletes and
  *     preimages -1 — so DELETE / UPDATE / MERGE on the source stay
  *     incremental too, and a group whose count reaches zero is deleted
  *     from the view — the Iceberg changelog derives every data-changing
  *     snapshot shape (appends, position/equality deletes, AND
  *     overwrite-labeled commits like dynamic partition overwrite or a
  *     CoW MERGE, via file diffs); a genuinely underivable history
  *     raises and falls back to re-sync;
  *   - anything else (a non-append commit on a CDF-less source): fall
  *     back to one full re-sync MERGE that converges the view to the
  *     freshly-computed aggregate (matched update, unmatched insert,
  *     not-matched-by-source delete) — still one atomic commit.
  *
  * Exactly-once: every refresh MERGE carries a SetTransaction
  * (appId derived from the source location, version = the source version
  * the view now reflects) in the SAME commit as the row effects — the
  * Delta idempotent-writes contract. A crash between the merge commit
  * and anything else re-runs `refresh`, which reads the watermark back
  * from the view's log and skips the already-applied range; replaying
  * can never double-count. Concurrent refreshers serialize through the
  * optimistic commit (the loser replans, sees the watermark, no-ops).
  *
  * Sum semantics: `sum_<c>` is `COALESCE(SUM(c), 0)` — null-coalesced so
  * incremental addition is total, in the SUM result's own type (exact
  * long/decimal sums). Min/max columns (`min_<c>`/`max_<c>`) fold
  * exactly under appends (LEAST/GREATEST, null-skipping) and in the
  * initial/full modes; they are NOT maintainable under deletes
  * (removing the extremum needs the runner-up the view never kept), so
  * a view carrying them skips the CDF fast path and re-syncs on any
  * non-append source commit.
  *
  * Second moments (`cnt_<c>` + `sq_<c>`, declared as VAR_POP in the
  * SQL surface): per-group non-null count and exact decimal Σx² —
  * with `sum_<c>` these derive AVG/VAR_POP/STDDEV on read
  * ([[withVariances]], the same exact-integer-moments derivation the
  * table-level stats family serves). Unlike min/max/uniq, BOTH cells
  * are RETRACTABLE — the signed CDF fold subtracts them exactly — so
  * per-group variance stays fully incremental under source deletes
  * and updates, not just appends.
  *
  * Distinct counts (`uniq_<c>`): APPROX_COUNT_DISTINCT state as a KMV
  * sketch per group (array<long> of the [[KmvK]] smallest value
  * hashes) — incremental daily-uniques at 100 TB: each append batch
  * contributes its own sketch and `kmv_merge` folds it into the
  * group's state inside the refresh MERGE, as if built from scratch
  * (exact below KmvK distinct, ~1.6% relative error above). Like
  * min/max, a hash cannot be UN-inserted, so deletes force the full
  * re-sync path.
  */
object IncrementalView {

  /** Count column name in the view schema. */
  val CountCol = "n_rows"

  def sumCol(c: String): String = s"sum_$c"
  def minCol(c: String): String = s"min_$c"
  def maxCol(c: String): String = s"max_$c"
  def uniqCol(c: String): String = s"uniq_$c"
  def cntCol(c: String): String = s"cnt_$c"
  def sqCol(c: String): String = s"sq_$c"

  /** Sketch size for `uniq_<c>` columns (KMV k-smallest-hashes state):
    * exact below 4096 distinct per group, ~1.6% relative error above.
    * Part of the stored state's identity — the merge fold assumes every
    * batch sketch was built at the same k.
    */
  val KmvK = 4096

  /** View-definition properties the SQL surface stamps at CREATE so
    * REFRESH MATERIALIZED VIEW can re-derive the maintenance plan.
    */
  val SourceProp = "graft.mv.source"
  val KeysProp = "graft.mv.keys"
  val SumsProp = "graft.mv.sums"
  val MinsProp = "graft.mv.mins"
  val MaxsProp = "graft.mv.maxs"
  val UniqsProp = "graft.mv.uniqs"
  val MomentsProp = "graft.mv.moments"

  final case class Refresh(mode: String, fromVersion: Long, toVersion: Long)

  private def appIdFor(sourceLocation: String): String =
    "graft-mv-" + java.util.UUID.nameUUIDFromBytes(
      sourceLocation.getBytes("UTF-8")).toString

  /** The view-shaped aggregate of `rows`: keys, count, null-coalesced
    * sums. The same fold is used for full syncs (over the table) and
    * incremental deltas (over changed rows, possibly signed).
    */
  private def aggregate(rows: DataFrame, keys: Seq[String], sumCols: Seq[String],
      sign: Option[Column], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil, uniqCols: Seq[String] = Nil,
      momentCols: Seq[String] = Nil): DataFrame = {
    val s = sign.getOrElse(lit(1L))
    rows.groupBy(keys.map(col): _*).agg(
      sum(s).cast(LongType).as(CountCol),
      // the bare lit(0) coerces to the SUM's own result type, so integral
      // columns keep exact long/decimal sums (a double would silently
      // round past 2^53 and compound across refreshes)
      (sumCols.map(c => coalesce(sum(col(c) * s), lit(0)).as(sumCol(c))) ++
        minCols.map(c => min(col(c)).as(minCol(c))) ++
        maxCols.map(c => max(col(c)).as(maxCol(c))) ++
        // distinct-count state: a KMV sketch per group, hashed on the
        // value's string rendering (engine-stable). Folds under appends
        // via kmv_merge; like min/max, NOT maintainable under deletes
        uniqCols.map(c => graft.functions.KmvFunctions
          .kmvSketch(col(c).cast(org.apache.spark.sql.types.StringType), KmvK)
          .as(uniqCol(c))) ++
        // second-moment state (cnt_<c>, sq_<c>): per-group non-null
        // count and Σx² as exact decimal(38,0) — with sum_<c> these
        // derive AVG/VAR/STDDEV on read, and UNLIKE min/max/uniq both
        // are RETRACTABLE: the signed CDF fold subtracts exactly, so
        // per-group variance stays incremental under source deletes.
        // The null Σx² of an ALL-NULL group folds as 0 (cnt decides the
        // SQL NULL on read), but a null from decimal(38,0) OVERFLOW
        // (cnt > 0) is kept as a POISON null — it propagates through
        // every later `t.sq + s.sq` fold and the derived variance
        // answers NULL, never the silently-negative value a
        // coalesced 0 would produce
        momentCols.flatMap { c =>
          val cnt = sum(when(col(c).isNotNull, s).otherwise(lit(0L)))
            .cast(LongType)
          // the all-null-group coalesce must gate on the UNSIGNED
          // non-null input count: a value-changing UPDATE's signed CDF
          // delta has cnt = 0 (equal preimage/postimage non-null counts)
          // but a REAL Σx² delta (Σnew² − Σold²) that a cnt-gated 0
          // would silently drop, leaving sq stale forever
          val seen = count(col(c))
          Seq(
            cnt.as(cntCol(c)),
            // try_sum: decimal(38,0) overflow nulls in BOTH ANSI modes
            // (a plain sum would throw under ANSI, and a coalesced 0
            // would silently derive a NEGATIVE variance)
            when(seen === 0L, lit(0).cast("decimal(38,0)"))
              .otherwise(try_sum(col(c).cast("decimal(38,0)") *
                col(c).cast("decimal(38,0)") * s))
              .as(sqCol(c)))
        }): _*)
  }

  /** Refresh the view at `viewLocation` from `source`, creating it on
    * first use (with `createProperties` stamped into the new table —
    * the SQL surface records the view definition there). Returns what
    * happened (noop / incremental / cdf / full) and the source-version
    * range applied.
    */
  def refresh(source: TxTable, viewLocation: String, keys: Seq[String],
      sumCols: Seq[String],
      createProperties: Map[String, String] = Map.empty,
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      uniqCols: Seq[String] = Nil, momentCols: Seq[String] = Nil): Refresh = {
    val spark = source.spark
    val appId = appIdFor(source.location)
    val to = source.version
    val view: TxTable = {
      val existing = TxLog.exists(spark, viewLocation)
      val t = new TxTable(spark, viewLocation)
      if (!existing)
        // an empty view at the schema the merges expect; harmless on
        // concurrent/replayed creates (AlreadyExists loses the race).
        // Auto-compaction is on by default: every refresh merge writes
        // a small file, and a dashboard-read view should not accrete
        // one file per refresh forever (callers can override).
        try t.create(
          aggregate(source.toDF.limit(0), keys, sumCols, None, minCols, maxCols,
            uniqCols, momentCols),
          properties = Map(TxTable.AutoCompactEnabledProp -> "true") ++ createProperties)
        catch { case _: graft.catalog.AlreadyExistsError => () }
      t
    }
    // a STAMPED definition (SQL CREATE records it in the view's
    // properties) is authoritative: a maintainer passing a narrower list
    // — e.g. a streaming maintainView wired up before min/max columns
    // were added to the view — must not silently stop maintaining them
    val vSnap = view.snapshot
    def stampedList(p: String) = vSnap.properties.getOrElse(p, "")
      .split(",").toSeq.filter(_.nonEmpty)
    val (ks, sums, mins, maxs, uniqs, moments) =
      if (vSnap.properties.contains(KeysProp))
        (stampedList(KeysProp), stampedList(SumsProp),
          stampedList(MinsProp), stampedList(MaxsProp), stampedList(UniqsProp),
          stampedList(MomentsProp))
      else (keys, sumCols, minCols, maxCols, uniqCols, momentCols)
    // the moment state only derives VAR with the matching exact sum,
    // and the decimal Σx² fold assumes integral values (a double's
    // square would round); both are definition errors, not data errors
    moments.foreach { c =>
      if (!sums.contains(c))
        throw UnsupportedOperationError(
          s"moment column $c needs SUM($c) in the same view")
      source.snapshot.schema.fields.find(_.name == c).map(_.dataType) match {
        case Some(org.apache.spark.sql.types.ByteType |
            org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.LongType) => ()
        case other => throw UnsupportedOperationError(
          s"moment column $c must be integral, got $other")
      }
    }
    if (uniqs.nonEmpty) // kmv_merge must resolve in the MERGE SET clauses
      graft.functions.KmvFunctions.registerSql(spark)
    val from = vSnap.transactions.getOrElse(appId, -1L)
    if (to <= from) return Refresh("noop", from, to)

    val keyCond = ks.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
    def updateSet(dn: String) = Map(
      CountCol -> s"t.`$CountCol` + s.`$dn`") ++
      sums.map(c => sumCol(c) -> s"t.`${sumCol(c)}` + s.`${sumCol(c)}`") ++
      moments.flatMap(c => Seq(
        cntCol(c) -> s"t.`${cntCol(c)}` + s.`${cntCol(c)}`",
        sqCol(c) -> s"t.`${sqCol(c)}` + s.`${sqCol(c)}`")) ++
      // Spark's LEAST/GREATEST skip nulls, so these are null-safe folds
      mins.map(c => minCol(c) -> s"LEAST(t.`${minCol(c)}`, s.`${minCol(c)}`)") ++
      maxs.map(c => maxCol(c) -> s"GREATEST(t.`${maxCol(c)}`, s.`${maxCol(c)}`)") ++
      // sorted-merge of the group's sketch with the batch's (null-safe:
      // kmv_merge treats NULL as the empty sketch)
      uniqs.map(c => uniqCol(c) ->
        s"kmv_merge(t.`${uniqCol(c)}`, s.`${uniqCol(c)}`, $KmvK)")
    def insertVals = (ks.map(k => k -> s"s.`$k`") :+
      (CountCol -> s"s.`$CountCol`")) ++
      sums.map(c => sumCol(c) -> s"s.`${sumCol(c)}`") ++
      moments.flatMap(c => Seq(cntCol(c) -> s"s.`${cntCol(c)}`",
        sqCol(c) -> s"s.`${sqCol(c)}`")) ++
      mins.map(c => minCol(c) -> s"s.`${minCol(c)}`") ++
      maxs.map(c => maxCol(c) -> s"s.`${maxCol(c)}`") ++
      uniqs.map(c => uniqCol(c) -> s"s.`${uniqCol(c)}`")

    // a losing concurrent refresher is a NO-OP, not a crash: the winner's
    // merge rewrote view files, our replanned merge detects the conflict
    // — re-read the watermark, and if the winner covered our range we are
    // done (its commit carried the SetTransaction atomically)
    def committing(mode: String)(run: => Unit): Refresh =
      try { run; Refresh(mode, from, to) }
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (view.latestTxnVersion(appId).exists(_ >= to)) Refresh("noop", from, to)
          else throw e
      }

    // row-level feeds: Delta CDF when enabled, or the Iceberg
    // snapshot-diff changelog (derives appends, MoR deletes AND
    // overwrite commits; a raise on anything else falls back below)
    def fullResync(): Refresh = {
      // non-append history without a usable row feed: one full re-sync
      // merge converges the view to the fresh aggregate — O(source
      // scan), the price of a rewriting source without a row-level feed
      val fresh = aggregate(source.toDF(to), ks, sums, None, mins, maxs, uniqs,
        moments)
      committing("full") {
        view.merge(fresh, keyCond, "s", "t")
          .whenMatchedUpdateAll()
          .whenNotMatchedInsertAll()
          .whenNotMatchedBySourceDelete()
          .withTransaction(appId, to)
          .execute()
      }
    }

    val cdfSource = (source.log == ForeignDeltaCommitLog &&
      DeltaCdf.enabled(source.snapshot.properties)) ||
      source.log == IcebergCommitLog
    if (from < 0) {
      // FIRST fold: aggregate the source's full state-at-version rather
      // than replaying its commit history — a log whose early commits
      // were cleaned up after checkpointing (standard Delta retention)
      // replays incompletely but snapshots exactly
      val fresh = aggregate(source.toDF(to), ks, sums, None, mins, maxs, uniqs,
        moments)
      committing("initial") {
        view.merge(fresh, keyCond, "s", "t")
          .whenMatchedUpdateAll()
          .whenNotMatchedInsertAll()
          .whenNotMatchedBySourceDelete()
          .withTransaction(appId, to)
          .execute()
      }
    } else if (source.appendOnlySince(from, Some(to))) {
      // exact delta from the append feed; empty delta still needs the
      // watermark advanced (otherwise every later refresh re-walks the
      // range), and MERGE with zero source rows commits exactly that
      val delta = aggregate(
        source.changesSince(from, Some(to)).drop("_commit_version"),
        ks, sums, None, mins, maxs, uniqs, moments)
      committing("incremental") {
        view.merge(delta, keyCond, "s", "t")
          .whenMatchedUpdate(updateSet(CountCol))
          .whenNotMatchedInsert(insertVals.toMap)
          .withTransaction(appId, to)
          .execute()
      }
    } else if (cdfSource && mins.isEmpty && maxs.isEmpty && uniqs.isEmpty) {
      // min/max are NOT self-maintainable under deletes (removing the
      // current extremum needs the runner-up, which the view never kept),
      // and neither are distinct sketches (a deleted row's hash cannot be
      // un-inserted — the value may survive in other rows)
      // — views carrying them fall through to the full re-sync instead
      // exact signed delta from the row-level change feed — note
      // tableChanges is INCLUSIVE-from (CDF convention) where
      // changesSince is exclusive-from, so start one past the watermark.
      // A CoW rewrite surfaces carried rows as delete+insert pairs at
      // the same version; the signed fold nets them to zero, so the
      // merge below stays exact. A feed that RAISES (underivable
      // history) is recoverable: full re-sync.
      try {
        val ch = source.tableChanges(from + 1, Some(to))
        val sign = when(col(DeltaCdf.ChangeTypeCol)
          .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
        val delta = aggregate(
          ch.withColumn("__sign", sign), ks, sums, Some(col("__sign")),
          momentCols = moments)
        committing("cdf") {
          view.merge(delta, keyCond, "s", "t")
            // a group folded to zero rows leaves the view entirely
            .whenMatchedDelete(Some(s"t.`$CountCol` + s.`$CountCol` = 0"))
            .whenMatchedUpdate(updateSet(CountCol))
            .whenNotMatchedInsert(insertVals.toMap)
            .withTransaction(appId, to)
            .execute()
        }
      } catch {
        case _: graft.catalog.UnsupportedOperationError => fullResync()
      }
    } else fullResync()
  }

  /** Read helper: the view with `avg_<c>` columns derived on the fly. */
  def withAverages(view: DataFrame, sumCols: Seq[String]): DataFrame =
    sumCols.foldLeft(view)((d, c) =>
      d.withColumn(s"avg_$c", col(sumCol(c)) / col(CountCol)))

  /** Read helper: `approx_uniq_<c>` distinct-count estimates derived
    * from the stored sketch state (exact while a group's distinct count
    * stays under [[KmvK]]).
    */
  def withDistinctEstimates(view: DataFrame, uniqCols: Seq[String]): DataFrame =
    uniqCols.foldLeft(view)((d, c) =>
      d.withColumn(s"approx_uniq_$c",
        graft.functions.KmvFunctions.kmvCardinality(col(uniqCol(c)), KmvK)))

  /** Read helper: per-group `avg_<c>` / `var_pop_<c>` / `stddev_<c>`
    * derived from the stored moment state — exact integer moments with
    * ONE double division, the same derivation the table-level stats
    * family serves. A zero non-null count answers SQL NULL. */
  def withVariances(view: DataFrame, momentCols: Seq[String]): DataFrame =
    momentCols.foldLeft(view) { (d, c) =>
      val n = col(cntCol(c)).cast("double")
      val s = col(sumCol(c)).cast("decimal(38,0)")
      val q = col(sqCol(c))
      // n·Σx² and (Σx)² can exceed decimal(38,0) on perfectly healthy
      // state (values ~1e12 over ~1e9 rows): try_-family arithmetic
      // answers NULL there — consistent with the write path's poison
      // contract — instead of an ANSI throw at READ time
      val vp = try_subtract(
        try_multiply(col(cntCol(c)).cast("decimal(38,0)"), q),
        try_multiply(s, s)).cast("double") / (n * n)
      d.withColumn(s"avg_$c",
          when(col(cntCol(c)) === 0L, lit(null))
            .otherwise(s.cast("double") / n))
        .withColumn(s"var_pop_$c",
          when(col(cntCol(c)) === 0L, lit(null)).otherwise(vp))
        .withColumn(s"stddev_$c",
          when(col(cntCol(c)) === 0L, lit(null)).otherwise(sqrt(vp)))
    }
}
