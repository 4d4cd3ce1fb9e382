package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.TxTable

/** Hilbert-curve clustering: kernel properties (bijective, unit-step
  * locality — the defining property Z-order lacks) and the end-to-end
  * OPTIMIZE layout's pruning behavior.
  */
class HilbertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hilbertPos is a bijection onto [0, 2^(d*bits)) for d=2 and d=3") {
    for ((d, bits) <- Seq((2, 4), (3, 3))) {
      val side = 1 << bits
      val total = 1L << (d * bits)
      val seen = new java.util.BitSet(total.toInt)
      def cells(prefix: List[Int], dims: Int): Iterator[List[Int]] =
        if (dims == 0) Iterator(prefix)
        else (0 until side).iterator.flatMap(v => cells(v :: prefix, dims - 1))
      cells(Nil, d).foreach { cell =>
        val pos = HilbertKernels.hilbertPos(cell.toArray, bits)
        assert(pos >= 0 && pos < total, s"$cell -> $pos out of range")
        assert(!seen.get(pos.toInt), s"$cell -> $pos collides")
        seen.set(pos.toInt)
      }
      assert(seen.cardinality() == total)
    }
  }

  test("consecutive hilbert indices are one unit step apart in one dimension") {
    val bits = 4
    val side = 1 << bits
    // invert the curve by brute force: index -> cell
    val cellsByPos = new Array[(Int, Int)](side * side)
    for (x <- 0 until side; y <- 0 until side)
      cellsByPos(HilbertKernels.hilbertPos(Array(x, y), bits).toInt) = (x, y)
    for (p <- 1 until side * side) {
      val (x0, y0) = cellsByPos(p - 1)
      val (x1, y1) = cellsByPos(p)
      val manhattan = math.abs(x1 - x0) + math.abs(y1 - y0)
      assert(manhattan == 1,
        s"positions ${p - 1}->$p jump ($x0,$y0)->($x1,$y1), manhattan $manhattan")
    }
  }

  test("HilbertIndexExpr matches the kernel through codegen") {
    val df = (0 until 64).map(i => (i % 8, i / 8)).toDF("x", "y")
    val out = df.select(
      org.apache.spark.sql.GraftColumnBridge.toCol(HilbertIndexExpr(
        Seq(org.apache.spark.sql.GraftColumnBridge.toExpr(col("x")),
          org.apache.spark.sql.GraftColumnBridge.toExpr(col("y"))), 3)).as("h"),
      col("x"), col("y")).collect()
    out.foreach { r =>
      assert(r.getLong(0) ==
        HilbertKernels.hilbertPos(Array(r.getInt(1), r.getInt(2)), 3))
    }
    assert(out.map(_.getLong(0)).distinct.length == 64)
  }

  test("OPTIMIZE HILBERT: multi-column rectangle predicates prune most files") {
    val loc = TestSpark.tmpDir("hilbert")
    val t = new TxTable(spark, loc)
    val grid = (0 until 65536).map { i =>
      val shuffled = (i * 2654435761L) % 65536
      (shuffled % 256, shuffled / 256, i.toLong)
    }.toDF("a", "b", "id").repartition(16)
    t.create(grid)
    val rect = "a >= 0 AND a <= 63 AND b >= 0 AND b <= 63"
    val before = t.filesAfterPruning(rect)
    assert(before >= 12, s"random layout should leave most of 16 files unprunable, got $before")

    t.optimizeHilbert(Seq("a", "b"), targetFileBytes = 64L * 1024)
    val nFiles = t.snapshot.files.size
    val after = t.filesAfterPruning(rect)
    assert(t.toDF.filter(rect).count() == 64L * 64L) // data intact
    assert(after <= math.max(2, nFiles / 4),
      s"hilbert layout should prune the 1/16 rectangle to a few of $nFiles files, got $after")
  }
}
