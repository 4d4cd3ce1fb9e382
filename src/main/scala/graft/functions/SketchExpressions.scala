package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch/similarity hot paths.
  *
  * The pure-DataFrame formulations of MinHash/SimHash/dot products use
  * nested higher-order functions, which Spark evaluates interpreted
  * (HOFs are CodegenFallback) and re-evaluates per lambda binding — at
  * sf0.1 the minhash signature alone went quadratic-ish and dominated the
  * benchmark. These expressions do the same math in one tight JVM loop per
  * row (guide: "a native Catalyst Expression beats a Scala UDF beats
  * anything else"). Each is a deterministic function of its input — safe
  * under retries and speculative execution.
  */

/** array<string> shingles → array<long> MinHash signature.
  * Two XXH64 passes per element + Kirsch-Mitzenmacher double hashing
  * (h_i = h1 + i·h2) instead of `numHashes` independent passes.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        val h1 = XxHash64.hash(bytes, 0L)
        val h2 = XxHash64.hash(bytes, 1L) | 1L // odd => full-period stepping
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** array<string> shingles → array<long> of LSH band bucket ids: the full
  * MinHash signature AND its banding fused into one per-row evaluation.
  * Fusion matters: leaving signature and banding as separate projections
  * lets CollapseProject inline the signature expression into every band
  * lambda — re-evaluating the whole minhash `bands`× per row (observed 16×
  * blowup at sf0.1).
  */
case class MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        val h1 = XxHash64.hash(bytes, 0L)
        val h2 = XxHash64.hash(bytes, 1L) | 1L
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    val buf = new Array[Byte](8 * r)
    var b = 0
    while (b < bands) {
      var j = 0
      while (j < r) {
        val v = mins(b * r + j)
        var k = 0
        while (k < 8) { buf(j * 8 + k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
        j += 1
      }
      out(b) = XxHash64.hash(buf, b.toLong)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

/** array<string> tokens → 64-bit SimHash (long): per-bit weighted vote of
  * token hashes.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64.hash(arr.getUTF8String(i).getBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Dot product of two array<float> columns in one loop (double
  * accumulator). Codegen emits a static kernel call so the expression
  * stays inside WholeStageCodegen (no fallback break).
  */
case class FloatDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(Kernels.floatDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.floatDot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "float_dot"
}

/** array<float> × array<float> → the 2^-48-quantized EXACT dot product
  * (see Kernels.dotExact48 — value-identical to the zip_with/aggregate/
  * DECIMAL(38,0) formulation, evaluated in one codegen'd loop instead of
  * interpreted HOFs with per-element Decimal allocation).
  */
case class DotExact48Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(Kernels.dotExact48(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dotExact48($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_exact48"
}

/** Sign-random-projection LSH signature of an array<float> embedding:
  * `numPlanes` hyperplane sign bits packed into a long. Plane weights are
  * derived deterministically from XXH64(table, plane, dim) — identical on
  * every executor with zero shipped state.
  */
case class HyperplaneSigExpr(child: Expression, numPlanes: Int, table: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Kernels.hyperplaneSig(input.asInstanceOf[ArrayData], numPlanes, table))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.hyperplaneSig($c, $numPlanes, $table)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}

/** IVF coarse-quantizer cell assignment: array<float> embedding → cell id
  * (int) of the nearest centroid. The full (small) centroid table rides
  * inside the expression — an implicit broadcast — so assignment is a
  * map-only projection: no cartesian against the centroid table, no
  * row-number window, no shuffle (the round-1 formulation amplified the
  * corpus ×nlist through an Exchange). Codegen emits a static kernel call,
  * keeping the hot loop inside WholeStageCodegen.
  */
case class ArgminCellExpr(child: Expression, centroids: Array[Double], cellIds: Array[Int], dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      Kernels.argminCellId(input.asInstanceOf[ArrayData], centroids, cellIds, dims))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    val iRef = ctx.addReferenceObj("cellIds", cellIds, "int[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.argminCellId($c, $cRef, $iRef, $dims)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "argmin_cell"
}

/** Multi-probe variant: array<float> → array<int> of the `nprobe` nearest
  * cell ids, nearest first. Same implicit-broadcast, map-only shape.
  */
case class TopCellsExpr(child: Expression, centroids: Array[Double], cellIds: Array[Int],
    dims: Int, nprobe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Kernels.topCellIds(input.asInstanceOf[ArrayData], centroids, cellIds, dims, nprobe)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    val iRef = ctx.addReferenceObj("cellIds", cellIds, "int[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.topCellIds($c, $cRef, $iRef, $dims, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "top_cells"
}

/** Column-API wrappers + SQL registration. */
object SketchFunctions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  def minhashSig(shingles: Column, numHashes: Int): Column =
    toCol(MinHashSigExpr(toExpr(shingles), numHashes))

  def minhashBands(shingles: Column, numHashes: Int, bands: Int): Column =
    toCol(MinHashBandsExpr(toExpr(shingles), numHashes, bands))

  def simhash64(tokens: Column): Column = toCol(SimHash64Expr(toExpr(tokens)))

  def floatDot(a: Column, b: Column): Column = toCol(FloatDotExpr(toExpr(a), toExpr(b)))

  def dotExact48(a: Column, b: Column): Column = toCol(DotExact48Expr(toExpr(a), toExpr(b)))

  def hyperplaneSig(emb: Column, numPlanes: Int, table: Int = 0): Column =
    toCol(HyperplaneSigExpr(toExpr(emb), numPlanes, table))

  def argminCell(emb: Column, centroids: Array[Double], cellIds: Array[Int], dims: Int): Column =
    toCol(ArgminCellExpr(toExpr(emb), centroids, cellIds, dims))

  def topCells(emb: Column, centroids: Array[Double], cellIds: Array[Int], dims: Int, nprobe: Int): Column =
    toCol(TopCellsExpr(toExpr(emb), centroids, cellIds, dims, nprobe))

  /** Register SQL-callable versions (e.g. `SELECT simhash64(tokens) ...`). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSigExpr(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64Expr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("float_dot",
      exprs => FloatDotExpr(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      exprs => HyperplaneSigExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("classifier_score",
      exprs => ClassifierScoreGen(exprs.head), "scala_udf")
  }
}
