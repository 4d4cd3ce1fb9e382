package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.catalog.UnsupportedOperationError

/** Delta CHECK constraints and legacy column invariants, ENFORCED on write
  * (reference path: delta-rs enforces `delta.constraints.*` on every
  * write_deltalake / merge — uchelper/dataframe.py routes all writes
  * through delta-rs, which refuses violating rows).
  *
  * Enforcement is a predicate wrapped around the staged DataFrame inside
  * the write job itself: `constraint OR raise_error(...)` — codegen'd,
  * short-circuit, zero extra scans, and distributed (each task checks its
  * own rows; the first violation fails the job before any commit). SQL
  * semantics: a CHECK passes when its expression is TRUE or NULL
  * (UNKNOWN), exactly like the standard and Delta OSS.
  *
  * Scale posture: cost is one boolean expression per row inside the
  * already-running write pass, and exactly zero when the table declares no
  * constraints — never a second pass over the input.
  */
private[graft] object Constraints {
  private implicit val formats: Formats = DefaultFormats

  val PropPrefix = "delta.constraints."
  val InvariantsKey = "delta.invariants"

  /** (name, sql) pairs in force on a table: CHECK constraints from
    * `delta.constraints.<name>` properties plus legacy writer-v2 column
    * invariants from `delta.invariants` field metadata (PROTOCOL.md
    * "Column Invariants": `{"expression":{"expression":"x > 3"}}`).
    */
  def of(props: Map[String, String], schema: StructType): Seq[(String, String)] = {
    val checks = props.toSeq.collect { case (k, v) if k.startsWith(PropPrefix) =>
      k.stripPrefix(PropPrefix) -> v
    }.sortBy(_._1)
    val invariants = schema.fields.toSeq.collect {
      case f if f.metadata.contains(InvariantsKey) =>
        val sql = JsonMethods.parse(f.metadata.getString(InvariantsKey)) \
          "expression" \ "expression" match {
          case JString(s) => s
          case other => throw UnsupportedOperationError(
            s"unparseable delta.invariants on column ${f.name}: $other")
        }
        s"invariant_${f.name}" -> sql
    }
    checks ++ invariants
  }

  /** TRUE-or-NULL-passes check column for one constraint. */
  private def checkCol(sql: String): Column =
    coalesce(expr(sql).cast(BooleanType), lit(true))

  /** Wrap `df` so its write enforces every constraint in force. A
    * constraint whose referenced columns are not all present in `df` is
    * checked as if those columns were NULL (a MERGE-evolution append may
    * legitimately omit old columns — absent means NULL, and NULL passes).
    */
  def enforce(df: DataFrame, props: Map[String, String], schema: StructType): DataFrame = {
    val cs = of(props, schema)
    if (cs.isEmpty) return df
    val present = df.schema.fieldNames.toSet
    cs.foldLeft(df) { case (d, (name, sql)) =>
      val refs = d.sparkSession.sessionState.sqlParser.parseExpression(sql)
        .references.map(_.name).toSet
      if (!refs.subsetOf(present)) d
      else d.filter(checkCol(sql) ||
        raise_error(concat(
          lit(s"CHECK constraint $name ($sql) violated by row "),
          to_json(struct(refs.toSeq.sorted.map(col): _*)))).cast(BooleanType))
    }
  }

  /** Violations of `sql` in existing data (ALTER TABLE ADD CONSTRAINT must
    * validate history-to-date, like Delta). Returns up to one example row.
    */
  def firstViolation(df: DataFrame, sql: String): Option[String] =
    df.filter(!checkCol(sql)).limit(1).toJSON.collect().headOption
}
