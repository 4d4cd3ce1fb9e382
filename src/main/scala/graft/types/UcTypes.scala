package graft.types

import org.apache.spark.sql.types._

/** Catalog-level type system bridged to Spark SQL types.
  *
  * Mirrors the reference's `DataType` enum surface
  * (/root/reference/uchelper/models.py:41-88) re-expressed as a sealed ADT,
  * with the SQL-name rendering (`models.py:108-120`) and Spark-JSON
  * rendering (`models.py:122-134`). Unlike the reference — which cannot
  * round-trip MAP/INTERVAL (`dataframe.py:67-68,136-137`) — every type here
  * maps to a first-class Spark type.
  */
sealed abstract class UcType(val name: String) {
  /** SQL type text, e.g. LONG → "bigint" (reference models.py:108-120). */
  def typeText: String = name.toLowerCase
}

object UcType {
  case object BooleanT extends UcType("BOOLEAN")
  case object ByteT extends UcType("BYTE") { override def typeText = "tinyint" }
  case object ShortT extends UcType("SHORT") { override def typeText = "smallint" }
  case object IntT extends UcType("INT")
  case object LongT extends UcType("LONG") { override def typeText = "bigint" }
  case object FloatT extends UcType("FLOAT")
  case object DoubleT extends UcType("DOUBLE")
  case object DateT extends UcType("DATE")
  case object TimestampT extends UcType("TIMESTAMP")
  case object TimestampNtzT extends UcType("TIMESTAMP_NTZ")
  case object StringT extends UcType("STRING")
  case object CharT extends UcType("CHAR")
  case object BinaryT extends UcType("BINARY")
  final case class DecimalT(precision: Int, scale: Int) extends UcType("DECIMAL") {
    override def typeText = s"decimal($precision,$scale)"
  }
  final case class ArrayT(element: UcType) extends UcType("ARRAY") {
    override def typeText = s"array<${element.typeText}>"
  }
  final case class MapT(key: UcType, value: UcType) extends UcType("MAP") {
    override def typeText = s"map<${key.typeText},${value.typeText}>"
  }
  final case class StructT(fields: Seq[(String, UcType)]) extends UcType("STRUCT") {
    override def typeText =
      s"struct<${fields.map { case (n, t) => s"$n:${t.typeText}" }.mkString(",")}>"
  }
  /** INTERVAL with its unit qualifier (reference `type_interval_type`,
    * models.py:77,102) — e.g. "DAY TO SECOND", "HOUR", "YEAR TO MONTH".
    * Year/month qualifiers map to Spark's YearMonthIntervalType, day/time
    * qualifiers to DayTimeIntervalType — both first-class, storable types.
    */
  final case class IntervalT(qualifier: String) extends UcType("INTERVAL") {
    override def typeText = s"interval ${qualifier.toLowerCase}".trim
  }

  case object NullT extends UcType("NULL")

  private val YmFields = Map("YEAR" -> YearMonthIntervalType.YEAR, "MONTH" -> YearMonthIntervalType.MONTH)
  private val DtFields = Map(
    "DAY" -> DayTimeIntervalType.DAY, "HOUR" -> DayTimeIntervalType.HOUR,
    "MINUTE" -> DayTimeIntervalType.MINUTE, "SECOND" -> DayTimeIntervalType.SECOND)

  private def parseIntervalQualifier(q: String): DataType = {
    val parts = q.trim.toUpperCase.split("\\s+TO\\s+").map(_.trim).filter(_.nonEmpty)
    parts match {
      case Array(a) if YmFields.contains(a) =>
        YearMonthIntervalType(YmFields(a), YmFields(a))
      case Array(a) if DtFields.contains(a) =>
        DayTimeIntervalType(DtFields(a), DtFields(a))
      case Array(a, b) if YmFields.contains(a) && YmFields.contains(b) =>
        YearMonthIntervalType(YmFields(a), YmFields(b))
      case Array(a, b) if DtFields.contains(a) && DtFields.contains(b) =>
        DayTimeIntervalType(DtFields(a), DtFields(b))
      case _ =>
        throw graft.catalog.UnsupportedOperationError(
          s"unsupported INTERVAL qualifier '$q' (expected YEAR/MONTH or DAY/HOUR/MINUTE/SECOND[ TO ...])")
    }
  }

  /** UC → Spark (reference dataframe.py:100-137, extended to full fidelity:
    * ARRAY element / STRUCT fields / MAP are tracked, not lossy).
    */
  def toSpark(t: UcType): DataType = t match {
    case BooleanT => BooleanType
    case ByteT => ByteType
    case ShortT => ShortType
    case IntT => IntegerType
    case LongT => LongType
    case FloatT => FloatType
    case DoubleT => DoubleType
    case DateT => DateType
    case TimestampT => TimestampType
    case TimestampNtzT => TimestampNTZType
    case StringT | CharT => StringType
    case BinaryT => BinaryType
    case DecimalT(p, s) => DecimalType(p, s)
    case ArrayT(e) => ArrayType(toSpark(e))
    case MapT(k, v) => MapType(toSpark(k), toSpark(v))
    case StructT(fs) => StructType(fs.map { case (n, ft) => StructField(n, toSpark(ft)) })
    case IntervalT(q) => parseIntervalQualifier(q)
    case NullT => NullType
  }

  /** Spark → UC (reference polars_type_to_uc_type, dataframe.py:23-70). */
  def fromSpark(t: DataType): UcType = t match {
    case BooleanType => BooleanT
    case ByteType => ByteT
    case ShortType => ShortT
    case IntegerType => IntT
    case LongType => LongT
    case FloatType => FloatT
    case DoubleType => DoubleT
    case DateType => DateT
    case TimestampType => TimestampT
    case TimestampNTZType => TimestampNtzT
    case StringType => StringT
    case BinaryType => BinaryT
    case d: DecimalType => DecimalT(d.precision, d.scale)
    case a: ArrayType => ArrayT(fromSpark(a.elementType))
    case m: MapType => MapT(fromSpark(m.keyType), fromSpark(m.valueType))
    case s: StructType => StructT(s.fields.toSeq.map(f => f.name -> fromSpark(f.dataType)))
    case y: YearMonthIntervalType =>
      val names = Map(YearMonthIntervalType.YEAR -> "YEAR", YearMonthIntervalType.MONTH -> "MONTH")
      IntervalT(if (y.startField == y.endField) names(y.startField)
        else s"${names(y.startField)} TO ${names(y.endField)}")
    case d: DayTimeIntervalType =>
      val names = Map(DayTimeIntervalType.DAY -> "DAY", DayTimeIntervalType.HOUR -> "HOUR",
        DayTimeIntervalType.MINUTE -> "MINUTE", DayTimeIntervalType.SECOND -> "SECOND")
      IntervalT(if (d.startField == d.endField) names(d.startField)
        else s"${names(d.startField)} TO ${names(d.endField)}")
    case NullType => NullT
    case other =>
      throw graft.catalog.UnsupportedOperationError(
        s"Spark type $other has no catalog mapping")
  }

  def fromString(s: String): UcType = s.toUpperCase match {
    case "BOOLEAN" => BooleanT
    case "BYTE" => ByteT
    case "SHORT" => ShortT
    case "INT" => IntT
    case "LONG" => LongT
    case "FLOAT" => FloatT
    case "DOUBLE" => DoubleT
    case "DATE" => DateT
    case "TIMESTAMP" => TimestampT
    case "TIMESTAMP_NTZ" => TimestampNtzT
    case "STRING" => StringT
    case "CHAR" => CharT
    case "BINARY" => BinaryT
    case "NULL" => NullT
    case other if other.startsWith("INTERVAL") =>
      val q = other.stripPrefix("INTERVAL").trim
      // bare INTERVAL (the reference's enum value with the qualifier in a
      // separate field) defaults to the widest day-time span
      val t = IntervalT(if (q.isEmpty) "DAY TO SECOND" else q)
      parseIntervalQualifier(t.qualifier) // validate eagerly
      t
    case other => throw graft.catalog.UnsupportedOperationError(s"unknown UC type $other")
  }
}

/** Schema equality per the reference (`check_schema_equality`,
  * dataframe.py:144-159): order-, name-, type-, and decimal
  * precision/scale-sensitive; nullability-INsensitive.
  */
object SchemaEquality {
  def equal(a: StructType, b: StructType): Boolean =
    a.fields.length == b.fields.length &&
      a.fields.zip(b.fields).forall { case (fa, fb) =>
        fa.name == fb.name && typeEqual(fa.dataType, fb.dataType)
      }

  private def typeEqual(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: DecimalType, y: DecimalType) => x.precision == y.precision && x.scale == y.scale
    case (x: ArrayType, y: ArrayType) => typeEqual(x.elementType, y.elementType)
    case (x: MapType, y: MapType) =>
      typeEqual(x.keyType, y.keyType) && typeEqual(x.valueType, y.valueType)
    case (x: StructType, y: StructType) => equal(x, y)
    case _ => a == b
  }

  /** Raise a SchemaMismatchError on inequality (dataframe.py:162-169). */
  def requireEqual(expected: StructType, actual: StructType): Unit =
    if (!equal(expected, actual))
      throw graft.catalog.SchemaMismatchError(
        s"schema mismatch:\nexpected: ${expected.simpleString}\nactual:   ${actual.simpleString}")
}
