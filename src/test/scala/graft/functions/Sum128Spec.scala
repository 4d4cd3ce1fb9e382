package graft.functions

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Sum128.dsum128

class Sum128Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Ground truth for the per-row kernel: exact-binary-value HALF_UP. */
  private def ref(x: Double): Long =
    new JBD(x).setScale(10, RoundingMode.HALF_UP).unscaledValue().longValueExact()

  test("scaled10 matches BigDecimal exact-binary HALF_UP across value classes") {
    val rng = new scala.util.Random(42)
    val values = Seq.newBuilder[Double]
    // grid-aligned (what real money-like columns hold)
    (1 to 2000).foreach(_ => values += math.round(rng.nextDouble() * 1e7) / 100.0)
    // full-precision random across magnitudes, both signs
    (1 to 2000).foreach { _ =>
      values += (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(18) - 9)
    }
    // boundaries and denormals
    values ++= Seq(0.0, -0.0, 1e-11, -1e-11, 4.9e-324, -4.9e-324, 0.5e-10, 1.5e-10,
      -0.5e-10, 123456789.9999999, -123456789.9999999, 9.2e8, -9.2e8)
    values.result().foreach { x =>
      assert(Kernels.scaled10(x) == ref(x), s"scaled10($x)")
    }
  }

  test("scaled10 raises on values whose fixed-point image exceeds a long") {
    intercept[ArithmeticException](Kernels.scaled10(1e10))
    intercept[ArithmeticException](Kernels.scaled10(-1e10))
    intercept[ArithmeticException](Kernels.scaled10(9.3e8))
  }

  test("combine128ToDouble reassembles signed 128-bit accumulations") {
    def viaBig(parts: Seq[Long]): Double = {
      val sum = parts.map(java.math.BigInteger.valueOf).reduce(_ add _)
      new JBD(sum, 10).doubleValue
    }
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val parts = Seq.fill(50)(rng.nextLong() / 64) // keep within per-row bounds
      var hi = 0L; var lo = 0L
      parts.foreach { v =>
        val nl = lo + v
        val c = ((lo & v) | ((lo | v) & ~nl)) >>> 63
        hi = hi + (v >> 63) + c
        lo = nl
      }
      assert(Kernels.combine128ToDouble(hi, lo) == viaBig(parts))
    }
  }

  test("dsum128 equals the decimal(38,10) sum route on real fixture columns") {
    val Dec = DecimalType(38, 10)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val both = li.groupBy($"l_returnflag")
      .agg(
        dsum128(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("fast"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec))
          .cast(DoubleType).as("slow"),
        dsum128(col("l_quantity")).as("fast_q"),
        sum(col("l_quantity").cast(Dec)).cast(DoubleType).as("slow_q"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"revenue mismatch: $r")
      assert(r.getDouble(3) == r.getDouble(4), s"quantity mismatch: $r")
    }
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val e = ev.agg(dsum128($"value").as("fast"),
      sum($"value".cast(Dec)).cast(DoubleType).as("slow")).collect()(0)
    assert(e.getDouble(0) == e.getDouble(1))
  }

  test("dsum128 null semantics match the decimal sum (nulls skipped, all-null -> null)") {
    val df = Seq[(Int, Option[Double])](
      (1, Some(1.5)), (1, None), (1, Some(2.25)),
      (2, None), (2, None)).toDF("k", "v")
    val out = df.groupBy($"k").agg(dsum128($"v").as("s")).orderBy($"k").collect()
    assert(out(0).getDouble(1) == 3.75)
    assert(out(1).isNullAt(1))
    // NaN behaves like the decimal cast: contributes null, not NaN
    val nan = Seq((1, 1.0), (1, Double.NaN)).toDF("k", "v")
      .groupBy($"k").agg(dsum128($"v").as("s")).collect()(0)
    assert(nan.getDouble(1) == 1.0)
  }

  test("dsum128 is an order-independent exact sum (adversarial cancellation)") {
    // doubles whose naive sum depends on order; fixed point must not
    val xs = Seq(1e8, 1e-8, -1e8, 2e-8, 1e8, -1e8, 3e-8)
    val expected = xs.map(ref).sum // exact in scaled space
    (0 until 10).foreach { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val got = shuffled.toDF("v").repartition(4)
        .agg(dsum128($"v")).collect()(0).getDouble(0)
      assert(got == new JBD(java.math.BigInteger.valueOf(expected), 10).doubleValue)
    }
  }

  test("sum128 runs inside HashAggregate with partial+final and codegen") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val df = li.groupBy($"l_returnflag").agg(dsum128($"l_extendedprice"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }
}
