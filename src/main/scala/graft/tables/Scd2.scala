package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType}

import graft.catalog.UnsupportedOperationError

/** Slowly-changing-dimension Type 2 maintenance over a transactional
  * table — the standard lakehouse recipe for keeping full attribute
  * history on a dimension (Kimball SCD2): every business key has at most
  * one CURRENT row (`is_current`, open-ended `valid_to`) plus closed-out
  * historical versions, and applying a batch of source rows closes the
  * changed keys' current versions and inserts their new ones — in ONE
  * MERGE commit, so readers never observe a key with zero or two current
  * rows.
  *
  * The single-MERGE shape is the classic "double-row source" trick: each
  * new-or-changed source row enters the merge twice — once keyed (to
  * MATCH and close the existing current version) and once with null merge
  * keys (to never match, and INSERT the new version). Brand-new keys get
  * only the insert row.
  *
  * Scale posture: one broadcast-or-shuffle join of the batch against the
  * CURRENT slice to find new-or-changed keys (the batch is typically tiny
  * next to the dimension — Catalyst broadcasts it), then one MERGE whose
  * copy-on-write rewrite is file-pruned to the files holding matched
  * keys. Unchanged keys are filtered out BEFORE the merge, so a
  * no-change batch rewrites nothing.
  */
object Scd2 {

  /** Columns `init` adds to a bare dimension. */
  val DefaultStartCol = "valid_from"
  val DefaultEndCol = "valid_to"
  val DefaultCurrentCol = "is_current"

  /** Stamp a bare dimension DataFrame with SCD2 bookkeeping columns:
    * every row becomes the current version as of `tsVersion`.
    */
  def init(df: DataFrame, tsVersion: Long,
      startCol: String = DefaultStartCol, endCol: String = DefaultEndCol,
      currentCol: String = DefaultCurrentCol): DataFrame =
    df.withColumn(startCol, lit(tsVersion).cast(LongType))
      .withColumn(endCol, lit(null).cast(LongType))
      .withColumn(currentCol, lit(true).cast(BooleanType))

  /** Apply `changes` (business columns, one row per key) to the SCD2
    * table as of `tsVersion`: changed keys' current rows are closed
    * (`valid_to = tsVersion`, `is_current = false`) and their new
    * versions inserted; brand-new keys just insert; identical rows are
    * no-ops.
    *
    * The batch must carry every key column but may carry only a SUBSET
    * of the attributes (the usual CDC shape — a feed that updates one
    * attribute should not have to re-source the rest): attributes absent
    * from the batch INHERIT the key's current value through the
    * already-joined current slice, count as unchanged in the change
    * test, and are null for brand-new keys (there is nothing to
    * inherit).
    */
  def applyChanges(table: TxTable, changes: DataFrame, keyCols: Seq[String],
      tsVersion: Long,
      startCol: String = DefaultStartCol, endCol: String = DefaultEndCol,
      currentCol: String = DefaultCurrentCol): Unit = {
    val schema = table.snapshot.schema
    val scdCols = Set(startCol, endCol, currentCol)
    scdCols.foreach { c =>
      if (!schema.fieldNames.contains(c))
        throw UnsupportedOperationError(
          s"SCD2 table is missing bookkeeping column $c (create it via Scd2.init)")
    }
    val businessCols = schema.fieldNames.filterNot(scdCols.contains).toSeq
    val attrCols = businessCols.filterNot(keyCols.contains)
    keyCols.foreach { k =>
      if (!changes.columns.contains(k))
        throw UnsupportedOperationError(s"changes batch is missing key column $k")
    }
    changes.columns.find(c => !businessCols.contains(c)).foreach { c =>
      throw UnsupportedOperationError(
        s"changes batch column $c is not a business column of the SCD2 table")
    }
    val provided = businessCols.filter(changes.columns.contains)
    val providedAttrs = attrCols.filter(provided.contains)

    // current slice, attribute columns renamed so the join carries both
    // versions of each attribute for the change test and inheritance
    val cur = table.toDF.filter(col(currentCol))
      .select(businessCols.map(c => col(c).as(s"__cur_$c")): _*)
    val joined = changes.select(provided.map(col): _*)
      .join(cur, keyCols.map(k => col(k) === col(s"__cur_$k")).reduce(_ && _), "left")
    val isNew = col(s"__cur_${keyCols.head}").isNull
    // null-safe difference on any PROVIDED non-key attribute (an
    // inherited attribute is equal by construction)
    val isChanged = providedAttrs.map(c => !(col(c) <=> col(s"__cur_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val pre = joined.filter(isNew || isChanged)

    // batch value when provided, inherited current value otherwise
    def full(c: String) =
      if (provided.contains(c)) col(c) else col(s"__cur_$c").as(c)
    val mk = keyCols.map(k => s"__mk_$k")
    // keyed copies: close the existing current version (changed keys only)
    val close = pre.filter(!isNew)
      .select(businessCols.map(full) ++ keyCols.map(k => col(k).as(s"__mk_$k")): _*)
    // null-keyed copies: never match -> insert the new version (all rows)
    val ins = pre.select(businessCols.map(full) ++
      keyCols.map(k => lit(null).cast(schema(k).dataType).as(s"__mk_$k")): _*)
    val source = close.unionByName(ins)

    val cond = mk.zip(keyCols).map { case (m, k) => s"t.`$k` = s.`$m`" }
      .mkString(" AND ") + s" AND t.`$currentCol`"
    table.merge(source, cond, "s", "t")
      .whenMatchedUpdate(Map(
        currentCol -> "false",
        endCol -> tsVersion.toString))
      .whenNotMatchedInsert((businessCols.map(c => c -> s"s.`$c`") ++ Seq(
        startCol -> tsVersion.toString,
        endCol -> "CAST(NULL AS BIGINT)",
        currentCol -> "true")).toMap)
      .execute()
  }
}
