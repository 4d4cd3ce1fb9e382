package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.UnsupportedOperationError

class UcTypesSpec extends AnyFunSuite {

  test("primitive round-trips Spark -> UC -> Spark") {
    val types: Seq[DataType] = Seq(BooleanType, ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, DateType, TimestampType, TimestampNTZType, StringType,
      BinaryType, DecimalType(10, 5), NullType)
    types.foreach { t =>
      assert(UcType.toSpark(UcType.fromSpark(t)) == t, s"round-trip of $t")
    }
  }

  test("nested types round-trip with full fidelity (beyond reference parity)") {
    val t = StructType(Seq(
      StructField("arr", ArrayType(DecimalType(10, 2))),
      StructField("map", MapType(StringType, LongType)),
      StructField("nested", StructType(Seq(StructField("x", DoubleType))))))
    val uc = UcType.fromSpark(t)
    assert(UcType.toSpark(uc).asInstanceOf[StructType].map(f => (f.name, f.dataType)) ==
      t.map(f => (f.name, f.dataType)))
  }

  test("typeText matches reference SQL rendering (models.py:108-120)") {
    assert(UcType.LongT.typeText == "bigint")
    assert(UcType.ShortT.typeText == "smallint")
    assert(UcType.ByteT.typeText == "tinyint")
    assert(UcType.IntT.typeText == "int")
    assert(UcType.DecimalT(10, 5).typeText == "decimal(10,5)")
    assert(UcType.StringT.typeText == "string")
  }

  test("schema equality: order-, name-, type-, decimal-sensitive; nullability-insensitive") {
    val a = StructType(Seq(StructField("x", LongType, nullable = false), StructField("y", DecimalType(10, 5))))
    val nullDiff = StructType(Seq(StructField("x", LongType, nullable = true), StructField("y", DecimalType(10, 5))))
    val orderDiff = StructType(Seq(StructField("y", DecimalType(10, 5)), StructField("x", LongType)))
    val typeDiff = StructType(Seq(StructField("x", IntegerType), StructField("y", DecimalType(10, 5))))
    val decimalDiff = StructType(Seq(StructField("x", LongType), StructField("y", DecimalType(12, 5))))
    val nameDiff = StructType(Seq(StructField("x2", LongType), StructField("y", DecimalType(10, 5))))

    assert(SchemaEquality.equal(a, nullDiff))
    assert(!SchemaEquality.equal(a, orderDiff))
    assert(!SchemaEquality.equal(a, typeDiff))
    assert(!SchemaEquality.equal(a, decimalDiff))
    assert(!SchemaEquality.equal(a, nameDiff))
    intercept[graft.catalog.SchemaMismatchError] { SchemaEquality.requireEqual(a, typeDiff) }
  }

  test("fromString rejects unknown types") {
    intercept[UnsupportedOperationError] { UcType.fromString("VARIANT_NOPE") }
  }

  test("INTERVAL round-trips every qualifier span (reference models.py:77,102)") {
    // every legal Spark interval type survives Spark -> UC -> Spark
    val ymSpans = for {
      s <- Seq(YearMonthIntervalType.YEAR, YearMonthIntervalType.MONTH)
      e <- Seq(YearMonthIntervalType.YEAR, YearMonthIntervalType.MONTH) if s <= e
    } yield YearMonthIntervalType(s, e)
    val dtFields = Seq(DayTimeIntervalType.DAY, DayTimeIntervalType.HOUR,
      DayTimeIntervalType.MINUTE, DayTimeIntervalType.SECOND)
    val dtSpans = for { s <- dtFields; e <- dtFields if s <= e } yield DayTimeIntervalType(s, e)
    (ymSpans ++ dtSpans).foreach { t =>
      assert(UcType.toSpark(UcType.fromSpark(t)) == t, s"round-trip of $t")
    }
  }

  test("INTERVAL fromString, typeText, and bad qualifiers") {
    assert(UcType.fromString("INTERVAL") == UcType.IntervalT("DAY TO SECOND"))
    assert(UcType.fromString("INTERVAL HOUR TO SECOND") == UcType.IntervalT("HOUR TO SECOND"))
    assert(UcType.IntervalT("DAY TO SECOND").typeText == "interval day to second")
    assert(UcType.toSpark(UcType.IntervalT("YEAR TO MONTH")) ==
      YearMonthIntervalType(YearMonthIntervalType.YEAR, YearMonthIntervalType.MONTH))
    intercept[UnsupportedOperationError] { UcType.fromString("INTERVAL EON") }
    intercept[UnsupportedOperationError] { UcType.toSpark(UcType.IntervalT("YEAR TO SECOND")) }
  }
}
