package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

/** Delta generated columns (PROTOCOL.md / delta-io "Generated Columns"):
  * a column whose value is defined by a SQL expression stored in the
  * field's `delta.generationExpression` metadata. Writer obligations, both
  * honored here:
  *
  *   - a write that OMITS the column gets it COMPUTED from the expression
  *     (`complete`, applied at every TxTable write entry point before
  *     schema validation);
  *   - a write that PROVIDES the column must provide values equal to the
  *     expression — enforced inside the write job like CHECK constraints
  *     (`validate`, applied where the staged data is constraint-checked),
  *     so a violating row aborts before any commit.
  *
  * Cost posture matches Constraints: one projected expression (compute) or
  * one boolean check (validate) per row inside the already-running write
  * pass; zero when the schema declares no generated columns.
  */
private[graft] object GeneratedColumns {
  val ExprKey = "delta.generationExpression"

  def of(schema: StructType): Seq[(StructField, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(ExprKey) => f -> f.metadata.getString(ExprKey)
    }

  private def generated(f: StructField, sql: String): Column =
    expr(sql).cast(f.dataType)

  /** Compute generated columns the incoming frame omits; validate the ones
    * it provides. Run BEFORE schema-evolution checks so that omitting a
    * generated column is legal (the computed column restores schema
    * equality), exactly like Delta-Spark's write path.
    */
  def complete(df: DataFrame, schema: StructType): DataFrame = {
    val gens = of(schema)
    if (gens.isEmpty) return df
    val present = df.schema.fieldNames.toSet
    val out = gens.foldLeft(df) { case (d, (f, sql)) =>
      if (present.contains(f.name)) checkOne(d, f, sql)
      else d.withColumn(f.name, generated(f, sql))
    }
    TableSchemas.inTableOrder(out, schema)
  }

  /** Validation-only pass for writes that always carry full rows (MERGE /
    * UPDATE rewrites, create): every present generated column must match
    * its expression. Columns absent from `df` are left alone — the
    * `complete` layer at the write entry points owns computing them.
    */
  def validate(df: DataFrame, schema: StructType): DataFrame = {
    val gens = of(schema)
    if (gens.isEmpty) return df
    val present = df.schema.fieldNames.toSet
    gens.foldLeft(df) { case (d, (f, sql)) =>
      if (present.contains(f.name)) checkOne(d, f, sql) else d
    }
  }

  private def checkOne(d: DataFrame, f: StructField, sql: String): DataFrame =
    d.filter((col(f.name) <=> generated(f, sql)) ||
      raise_error(concat(
        lit(s"generated column ${f.name} does not match $sql on row "),
        to_json(struct(col(f.name).as("provided"), generated(f, sql).as("expected")))))
        .cast(BooleanType))
}

/** Column-order helpers for computed write columns. */
private[tables] object TableSchemas {
  import org.apache.spark.sql.functions.col

  /** Reorder `df`'s columns to the table schema's order (schema equality
    * is order-sensitive; computed columns land appended otherwise).
    * Columns the table does not know (evolution) keep their relative order
    * at the end.
    */
  def inTableOrder(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.schema.fieldNames.toSet
    val known = schema.fieldNames.toSeq.filter(present.contains)
    val extras = df.schema.fieldNames.toSeq.filterNot(schema.fieldNames.toSet)
    if (known ++ extras == df.schema.fieldNames.toSeq) df
    else df.select((known ++ extras).map(col): _*)
  }
}
