package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels callable from generated code (fully-qualified static
  * method calls keep the custom expressions inside WholeStageCodegen
  * instead of forcing a CodegenFallback break around them).
  */
object Kernels {

  def floatDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def simhashText(text: UTF8String): Long = {
    val toks = TokenizeUtil.tokens(text.toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XxHash64.hash(toks(i).getBytes("UTF-8"), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def shingleSet(text: UTF8String, k: Int): ArrayData = {
    val set = new java.util.LinkedHashSet[String]()
    TokenizeUtil.shingles(text.toString, k).foreach(set.add)
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct XXH64 hashes (sorted ascending) of the k-token shingles —
    * the set-equality proxy `verifyJaccard` intersects instead of the
    * shingle STRINGS: an 8-byte long per distinct shingle vs the ~k·token
    * string, with set sizes preserved exactly unless two distinct shingles
    * collide on 64 bits (~|S|²/2⁶⁵ expected pairs per document — zero at
    * any realistic document size; same accepted bound as the winnowing
    * fingerprint family). Hashes are computed over windows of one packed
    * token buffer — no per-shingle String/encode (see TokenizeUtil.packed).
    */
  def shingleHashSet(text: UTF8String, k: Int): ArrayData = {
    val p = TokenizeUtil.packed(text.toString)
    val nShingles = if (p.n < k) 1 else p.n - k + 1
    val hs = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      val off = if (p.n == 0) 0 else p.starts(i)
      val end =
        if (p.n == 0) 0
        else if (p.n < k) p.ends(p.n - 1)
        else p.ends(i + k - 1)
      hs(i) = XxHash64.hash(p.buf, off, end - off, 0L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < nShingles) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Word-token count in one scan (see TokenCountExpr). */
  def tokenCount(text: UTF8String): Long = {
    val s = text.toString.toLowerCase
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && !isTok(s.charAt(i))) i += 1
      if (i < len) { n += 1; while (i < len && isTok(s.charAt(i))) i += 1 }
    }
    n
  }

  @inline private def isTok(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\''

  /** The 2^-48-quantized exact dot product (EmbeddingQueries' determinism
    * contract) in one fused loop: per element t = floor(x·y·2^48) — an
    * exact int64 for |x·y| < 16 — summed in a long (exact: 64 dims ×
    * |t| < 2^52 stays under 2^58, far from overflow), then long→double
    * (round-to-nearest-even, identical to the DECIMAL(38,0)→VARCHAR→
    * DOUBLE route for integers) and unscaled by the exact power 2^48.
    * Value-identical to the zip_with/aggregate/decimal formulation it
    * replaces — which Spark evaluated INTERPRETED (higher-order functions
    * are CodegenFallback) with a per-element Decimal allocation.
    */
  def dotExact48(a: ArrayData, b: ArrayData): Double = {
    val P48 = 281474976710656.0 // 2^48
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * P48).toLong
      i += 1
    }
    sum.toDouble / P48
  }

  def hyperplaneSig(x: ArrayData, numPlanes: Int, table: Int): Long = {
    val n = x.numElements()
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val b = new Array[Byte](8)
        b(0) = (p & 0xff).toByte; b(1) = ((p >> 8) & 0xff).toByte
        b(2) = ((p >> 16) & 0xff).toByte; b(3) = ((p >> 24) & 0xff).toByte
        b(4) = (d & 0xff).toByte; b(5) = ((d >> 8) & 0xff).toByte
        b(6) = ((d >> 16) & 0xff).toByte; b(7) = ((d >> 24) & 0xff).toByte
        val h = XxHash64.hash(b, table.toLong)
        val w = (java.lang.Math.floorMod(h, 1000000L).toDouble / 1000000.0) - 0.5
        dot += x.getFloat(d).toDouble * w
        d += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Squared L2 distances from `x` to each of the `ids.length` centroids.
    * `centroids` is flattened row-major (`dims` doubles per centroid) —
    * small enough to ship inside the serialized expression (an implicit
    * broadcast). Vectors shorter than `dims` treat missing elements as 0.
    */
  private def cellDistances(x: ArrayData, centroids: Array[Double], dims: Int): Array[Double] = {
    val nlist = centroids.length / dims
    val n = math.min(dims, x.numElements())
    val d2s = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var d2 = 0.0
      val off = c * dims
      var i = 0
      while (i < n) {
        val diff = x.getFloat(i).toDouble - centroids(off + i)
        d2 += diff * diff
        i += 1
      }
      var j = n
      while (j < dims) { val v = centroids(off + j); d2 += v * v; j += 1 }
      d2s(c) = d2
      c += 1
    }
    d2s
  }

  /** Cell id of the nearest centroid by squared L2 distance; ties (and NaN
    * distances) resolve to the earliest centroid. `ids(i)` is the cell id
    * of the i-th flattened centroid (ids survive Lloyd iterations that
    * leave some cells empty).
    */
  def argminCellId(x: ArrayData, centroids: Array[Double], ids: Array[Int], dims: Int): Int = {
    require(dims > 0 && ids.length > 0 && centroids.length == ids.length * dims,
      s"bad quantizer shape: dims=$dims ids=${ids.length} flat=${centroids.length}")
    val d2s = cellDistances(x, centroids, dims)
    var best = 0
    var bestD = d2s(0)
    var c = 1
    while (c < d2s.length) {
      // strict < with a NaN guard: a NaN distance never displaces a real one
      if (d2s(c) < bestD || (bestD != bestD && d2s(c) == d2s(c))) { bestD = d2s(c); best = c }
      c += 1
    }
    ids(best)
  }

  /** Cell ids of the `nprobe` nearest centroids, nearest first (ties and
    * NaNs to the earliest centroid) — selection pass over nlist cells, fine
    * for the small nlist of a coarse quantizer.
    */
  def topCellIds(x: ArrayData, centroids: Array[Double], ids: Array[Int], dims: Int, nprobe: Int): ArrayData = {
    require(dims > 0 && ids.length > 0 && centroids.length == ids.length * dims,
      s"bad quantizer shape: dims=$dims ids=${ids.length} flat=${centroids.length}")
    val d2s = cellDistances(x, centroids, dims)
    val nlist = d2s.length
    val m = math.min(nprobe, nlist)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < m) {
      var best = -1
      var bestD = 0.0
      var j = 0
      while (j < nlist) {
        // first untaken cell always seeds `best`, so NaNs cannot leave -1
        if (!taken(j) && (best == -1 || d2s(j) < bestD)) { bestD = d2s(j); best = j }
        j += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Exact fixed-point conversion: round(x * 10^10) computed from the
    * EXACT binary value of x (x = m·2^e), rounding HALF_UP away from zero —
    * identical to `new java.math.BigDecimal(x).setScale(10, HALF_UP)
    * .longValueExact` but allocation-free pure integer arithmetic (a
    * 53×34-bit product held in two longs, then a rounding right-shift).
    * The scaled value must fit a signed long, i.e. |x| <~ 9.2e8 — callers
    * (Sum128) surface larger inputs as an error rather than wrong digits.
    * NaN/Infinity are the caller's job (the expression returns null first).
    */
  def scaled10(x: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(x)
    val neg = bits < 0
    val biasedExp = ((bits >>> 52) & 0x7ffL).toInt
    var m = bits & 0xfffffffffffffL
    var e = 0
    if (biasedExp == 0) e = -1074 // subnormal
    else { m |= (1L << 52); e = biasedExp - 1075 }
    if (m == 0) return 0L
    val Ten10 = 10000000000L
    val hi = Math.multiplyHigh(m, Ten10) // m, Ten10 > 0: true 128-bit product
    val lo = m * Ten10
    val mag: Long =
      if (e >= 0) {
        // x >= 2^52: far beyond the representable scaled range
        throw new ArithmeticException(s"scaled10 overflow: $x")
      } else {
        val s = -e
        if (s >= 128) 0L
        else if (s >= 64) {
          // P has <= 87 bits, so P >> s fits easily; round on bit (s-1)
          val v = if (s == 64) hi else hi >>> (s - 64)
          val round = if (s == 64) (lo >>> 63) & 1L else (hi >>> (s - 65)) & 1L
          v + round // HALF_UP: frac >= half  <=>  bit (s-1) of P is set
        } else if (s == 0) {
          if (hi != 0 || lo < 0) throw new ArithmeticException(s"scaled10 overflow: $x")
          lo
        } else {
          if ((hi >>> s) != 0) throw new ArithmeticException(s"scaled10 overflow: $x")
          val v = (lo >>> s) | (hi << (64 - s))
          val round = (lo >>> (s - 1)) & 1L
          val r = v + round
          if (r < 0) throw new ArithmeticException(s"scaled10 overflow: $x")
          r
        }
      }
    if (neg) -mag else mag
  }

  /** Reassemble a signed 128-bit accumulator (hi, unsigned lo) into the
    * double value of the scale-10 decimal it represents — the same final
    * conversion `sum(cast(x as decimal(38,10))).cast(double)` performs
    * (BigDecimal.doubleValue), evaluated once per GROUP, not per row.
    */
  def combine128ToDouble(hi: Long, lo: Long): Double = {
    val unsignedLo = java.math.BigInteger.valueOf(lo & Long.MaxValue)
      .add(if (lo < 0) java.math.BigInteger.ONE.shiftLeft(63) else java.math.BigInteger.ZERO)
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64).add(unsignedLo)
    new java.math.BigDecimal(bi, 10).doubleValue
  }

  def fingerprint(text: UTF8String, shingleK: Int, window: Int): ArrayData = {
    val shingles = TokenizeUtil.shingles(text.toString, shingleK)
    val hs = shingles.map(s => XxHash64.hash(s.getBytes("UTF-8"), 0L))
    val n = hs.length
    val out = new java.util.LinkedHashSet[Long]()
    if (n <= window) {
      if (n > 0) out.add(hs.min)
    } else {
      val deque = new java.util.ArrayDeque[Int]()
      var i = 0
      while (i < n) {
        while (!deque.isEmpty && hs(deque.peekLast()) >= hs(i)) deque.pollLast()
        deque.addLast(i)
        if (deque.peekFirst() <= i - window) deque.pollFirst()
        if (i >= window - 1) out.add(hs(deque.peekFirst()))
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}
