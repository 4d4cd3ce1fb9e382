package org.apache.spark.sql

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics,
  CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.statsEstimation.EstimationUtils
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** Surfaces the engine's stamped table statistics to Catalyst's
  * planner (the `private[sql]` side of graft.tables.PlannerStats).
  *
  * A parquet-backed `LogicalRelation`'s default size estimate is the
  * COMPRESSED file byte count — at 100 TB a dictionary/RLE-compressed
  * dimension can be 20× smaller on disk than in memory, so
  * `autoBroadcastJoinThreshold` decisions made from file bytes will
  * happily broadcast something that explodes on the executors. When the
  * engine KNOWS the exact row count (per-file stats minus DV
  * cardinalities) it can hand the planner a truthful in-memory estimate
  * (rows × schema row width, Spark's own `getSizePerRow` arithmetic)
  * plus full per-column statistics — NDV, exact min/max, null count —
  * attached as `CatalogStatistics` on the relation, exactly where
  * `LogicalRelation.computeStats` looks first. With
  * `spark.sql.cbo.enabled` (the engine's sessions turn it on) those
  * colStats drive FilterEstimation selectivity and join-reorder
  * costing, so a selective filter's output estimate shrinks from
  * "whole table" to rows/ndv (or the min/max range fraction) — the
  * difference between broadcasting a filtered dimension and
  * shuffle-joining it at 100 TB.
  */
object GraftPlannerStats {

  /** Per-column statistics the engine can vouch for while the stamp is
    * fresh. `min`/`max` are INTERNAL Catalyst values (days-int, micros
    * long, Decimal) of a CBO-estimable type — the attach step renders
    * them with Spark's own external-string codec.
    */
  final case class ColHint(
      ndv: Option[Long] = None,
      min: Option[Any] = None,
      max: Option[Any] = None,
      nullCount: Option[Long] = None)

  /** `df` with `rowCount`/column stats attached to its (bare)
    * LogicalRelation as CatalogTable statistics. Leaves the plan
    * untouched when there is no LogicalRelation or it already carries
    * a catalog table.
    */
  def attach(df: DataFrame, name: String, schema: StructType,
      rowCount: Long, hints: Map[String, ColHint]): DataFrame = {
    var changed = false
    val newPlan = df.queryExecution.logical.transformUp {
      case lr: LogicalRelation if lr.catalogTable.isEmpty && !changed =>
        changed = true
        val sizePerRow = EstimationUtils.getSizePerRow(lr.output)
        val colStats = hints.flatMap { case (c, h) =>
          schema.fields.find(_.name == c).map { f =>
            def ext(v: Option[Any]): Option[String] =
              v.map(CatalogColumnStat.toExternalString(_, c, f.dataType))
            c -> CatalogColumnStat(
              distinctCount = h.ndv.map(BigInt(_)),
              min = ext(h.min),
              max = ext(h.max),
              nullCount = h.nullCount.map(BigInt(_)))
          }
        }
        val ct = CatalogTable(
          identifier = TableIdentifier(name),
          tableType = CatalogTableType.EXTERNAL,
          storage = CatalogStorageFormat.empty,
          schema = schema,
          stats = Some(CatalogStatistics(
            sizeInBytes = (BigInt(rowCount) * sizePerRow).max(1),
            rowCount = Some(BigInt(rowCount)),
            colStats = colStats)))
        lr.copy(catalogTable = Some(ct))
    }
    if (!changed) df
    else GraftColumnBridge.ofRows(df.sparkSession, newPlan)
  }
}
