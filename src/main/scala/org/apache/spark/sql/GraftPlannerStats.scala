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
  * plus per-column NDVs for CBO join estimation — attached as
  * `CatalogStatistics` on the relation, exactly where
  * `LogicalRelation.computeStats` looks first.
  */
object GraftPlannerStats {

  /** `df` with `rowCount`/`ndv` attached to its (bare) LogicalRelation
    * as CatalogTable statistics. Leaves the plan untouched when there
    * is no LogicalRelation or it already carries a catalog table.
    */
  def attach(df: DataFrame, name: String, schema: StructType,
      rowCount: Long, ndv: Map[String, Long]): DataFrame = {
    var changed = false
    val newPlan = df.queryExecution.logical.transformUp {
      case lr: LogicalRelation if lr.catalogTable.isEmpty && !changed =>
        changed = true
        val sizePerRow = EstimationUtils.getSizePerRow(lr.output)
        val colStats = ndv.map { case (c, n) =>
          c -> CatalogColumnStat(distinctCount = Some(BigInt(n)))
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
