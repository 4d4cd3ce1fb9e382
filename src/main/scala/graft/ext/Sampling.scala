package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Unlike
  * `df.sample` (seeded per-partition RNG: resampling after a repartition
  * changes the selection), these operators decide membership from a
  * multiplicative hash of a STABLE id — the same rows are selected on any
  * cluster, any partitioning, any engine, which is what makes dataset
  * mixes reproducible and auditable.
  *
  * Hash: Knuth's multiplicative constant mod 2^32 scales the id into a
  * uniform 32-bit value; a row is kept when that value falls below
  * fraction * 2^32. Pure integer arithmetic — exactly reproducible in
  * SQL on any engine.
  */
object Sampling {

  private val Knuth = 2654435761L
  private val M32 = 4294967296L // 2^32
  private val M31 = 2147483648L // 2^31

  /** id folded to [0, 2^31) BEFORE the multiply: (2^31-1) * Knuth stays
    * under 2^63, so the arithmetic is overflow-free on every engine —
    * relying on silent Long wraparound would error on engines that check
    * BIGINT overflow (DuckDB) and diverge on ones that widen.
    */
  private def hash32(idCol: Column): Column =
    pmod(pmod(idCol.cast("long"), lit(M31)) * lit(Knuth), lit(M32))

  /** Membership column: keep iff hash32(id) < fraction * 2^32. */
  def keepExpr(idCol: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    hash32(idCol) < lit((fraction * M32).toLong)
  }

  /** Uniform deterministic sample of ~`fraction` of rows by stable id. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(keepExpr(col(idCol), fraction))

  /** Fold a STRING key to a stable long for the hash-keyed operators —
    * a 31-polynomial over UNICODE CODE POINTS, mod 2^31: overflow-free
    * (code point < 2^21, acc < 2^31, so acc*31 + cp < 2^37) and
    * replayable in SQL on any engine — the DuckDB replay is
    * `list_reduce(list_transform(string_split(k, ''), c -> unicode(c)),
    * (acc, x) -> (acc * 31 + x) % 2147483648)`.
    *
    * Code points, not bytes: `ascii()` returns the first UTF-8 BYTE of
    * a multi-byte character, which diverges from `unicode()` replays on
    * IDN domains and non-English source names. A BMP character encodes
    * to one UTF-16BE unit (= its code point); an astral character
    * arrives from split() as a surrogate-pair string (4 UTF-16BE bytes)
    * and decodes through the surrogate formula — emoji keys replay
    * exactly too.
    *
    * Use for KEYS (domains, URLs, cluster/source ids), never document
    * text: the fold is one lambda step per character, so a 100 KB
    * document key would burn 100k steps per row. [[stringKeyChecked]]
    * enforces that contract when inputs are untrusted.
    */
  def stringKey(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + codePoint(ch), lit(M31)))

  /** Code point of a one-character string; surrogate pairs decoded.
    * The empty string (split("") of "" yields one empty element) folds
    * as 0, like ascii('') — the seed value, so "" keys hash to 0.
    */
  private def codePoint(ch: Column): Column = {
    val b = encode(ch, "UTF-16BE")
    val v = coalesce(conv(hex(b), 16, 10).cast("long"), lit(0L))
    when(length(b) <= lit(2), v)
      .otherwise((shiftright(v, 16) - lit(0xD800L)) * lit(0x400L) +
        pmod(v, lit(0x10000L)) - lit(0xDC00L) + lit(0x10000L))
  }

  /** [[stringKey]] with an enforced length cap: raises when a key
    * exceeds `maxLen` characters, so an untrusted pipeline cannot
    * silently feed document-sized text into the per-character fold.
    */
  def stringKeyChecked(c: Column, maxLen: Int = 256): Column =
    when(length(c) <= lit(maxLen), stringKey(c))
      .otherwise(raise_error(concat(
        lit(s"stringKey: key longer than $maxLen chars — hash a key, not document text: '"),
        substring(c, 1, 40), lit("…'"))).cast("long"))

  /** Cut points of `splits` on the 32-bit hash line: cumulative weight
    * scaled to 2^32, rounded — exposed so an external replayer (the
    * DuckDB oracle, an audit notebook) can embed the EXACT integers this
    * assignment uses rather than re-deriving them through its own
    * floating-point accumulation order.
    */
  def splitCuts(splits: Seq[(String, Double)]): Seq[Long] = {
    val total = splits.map(_._2).sum
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(w => math.round(w / total * M32))
  }

  /** Leakage-safe deterministic dataset split: every row lands in exactly
    * one named split by the hash of a GROUP key — the URL domain, the
    * near-dup cluster survivor id, the source shard — rather than the
    * row id. All rows sharing the key land in the SAME split, so
    * near-duplicates that share a domain/cluster can never straddle
    * train and eval (the classic contamination leak a row-wise random
    * split produces). Pure map-side when-chain on the engine-portable
    * multiplicative hash; weights are normalized and cut into exact
    * integer thresholds ([[splitCuts]]). Pass [[stringKey]] for string
    * keys.
    */
  def splitAssign(df: DataFrame, keyCol: Column, splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0),
      "splitAssign needs at least one split with positive weight")
    val h = hash32(keyCol)
    val assign = splits.map(_._1).zip(splitCuts(splits)).init
      .foldRight(lit(splits.last._1): Column) { case ((name, cut), acc) =>
        when(h < lit(cut), lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, assign)
  }

  /** Stratified deterministic sample: per-stratum fractions (missing
    * strata default to `defaultFraction`). The standard "dataset mixture"
    * primitive — e.g. keep 100% of high-quality sources, 10% of crawl.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(hash32(col(idCol)) < floor(frac * lit(M32.toDouble)).cast("long"))
  }

  /** Corpus mixing under per-source TOKEN budgets — the "domain weights"
    * primitive of training-data curation (sample each source until its
    * token allowance is spent, taking documents in priority order): keep,
    * within each stratum, the prefix of documents — ordered by the
    * integral `orderCol`, unique across the table — whose running token
    * total stays within that stratum's budget. Emits the kept rows plus
    * `cumCol`, the running total (the audit trail of why a doc made the
    * cut). Strata absent from `budgets` are dropped.
    *
    * Scale shape: the running total is the two-phase distributed prefix
    * sum (same design as Packing.withRunningTotal), generalized per
    * stratum: arithmetic order-buckets (NOT sampled ranges), one window
    * pass partitioned by (bucket, stratum) — so a giant source still
    * splits across buckets instead of funneling through one task — then
    * one (#buckets × #strata)-row driver fold for the exclusive offsets,
    * broadcast back. No global sort, no single-partition window.
    */
  def tokenBudgetMix(df: DataFrame, strataCol: String, orderCol: String,
      tokensCol: String, budgets: Map[String, Long],
      cumCol: String = "cum_tokens"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nParts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val mm = df.agg(min(col(orderCol)).cast("long").as("lo"),
      max(col(orderCol)).cast("long").as("hi")).collect()(0)
    if (mm.isNullAt(0))
      return df.withColumn(cumCol, lit(null).cast("long")).limit(0)
    val lo = mm.getLong(0)
    // double conversion is monotone — any order-preserving bucket map works
    val span = math.max(1.0, (mm.getLong(1) - lo).toDouble + 1.0)
    val bucket = least(lit(nParts - 1), greatest(lit(0),
      floor((col(orderCol).cast("long") - lit(lo)).cast("double") / lit(span) * lit(nParts))
        .cast("int")))
    val local = df.withColumn("__pid", bucket)
      .withColumn("__lcum", sum(col(tokensCol)).over(
        Window.partitionBy(col("__pid"), col(strataCol)).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = local.groupBy(col("__pid"), col(strataCol))
      .agg(max(col("__lcum")).as("__ptotal"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (stratum, rows) =>
      var acc = 0L
      rows.sortBy(_._1).map { case (pid, _, tot) =>
        val o = (pid, stratum, acc); acc += tot; o
      }
    }
    val offsetsDf = spark.createDataFrame(offsets).toDF("__pid", strataCol, "__offset")
    val budgetsDf = spark.createDataFrame(budgets.toSeq).toDF(strataCol, "__budget")
    local.join(broadcast(offsetsDf), Seq("__pid", strataCol))
      .withColumn(cumCol, col("__lcum") + col("__offset"))
      .join(broadcast(budgetsDf), Seq(strataCol))
      .filter(col(cumCol) <= col("__budget"))
      .drop("__pid", "__lcum", "__offset", "__budget")
  }

  /** Deterministic fractional-epoch upsampling — the "2.7 epochs of
    * wikipedia, 0.4 of crawl" mixing primitive (domain weights above 1
    * mean REPEATS, not samples). Each doc emits floor(epochs) full
    * copies plus one more iff its hash falls under frac(epochs) — so a
    * source with epochs=2.7 replicates every doc 2 or 3 times and the
    * corpus-level expectation is exactly 2.7×, deterministically (same
    * ids selected for the extra copy on any engine/partitioning, and
    * the EXTRA-copy decision is hash-independent of `hashSample`'s keep
    * decision thanks to the epoch-salted id). Emitted `repeatCol`
    * (0-based copy index) lets downstream sharding treat copies as
    * distinct rows; sources absent from `epochs` pass through once.
    * Map-side explode of a tiny int range — no shuffle, no join.
    */
  def epochRepeat(df: DataFrame, strataCol: String, idCol: String,
      epochs: Map[String, Double], repeatCol: String = "repeat_idx"): DataFrame = {
    require(epochs.values.forall(e => e >= 0.0 && e < 1000.0),
      "epochs must be in [0, 1000)")
    val e = epochs.foldLeft(lit(1.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    val whole = floor(e).cast("long")
    // salt the id with the whole-epoch count so the fractional draw is
    // independent of the plain-id draws used by hashSample/shuffleShards.
    // The id folds to [0, 2^31) BEFORE the salt multiply (hash32's own
    // overflow-free discipline): folded * 1000003 + whole stays under
    // 2^51, so the arithmetic never wraps on any engine or ANSI mode.
    val salted = pmod(col(idCol).cast("long"), lit(M31)) * lit(1000003L) + whole
    val extra = (hash32(salted) <
      floor((e - whole.cast("double")) * lit(M32.toDouble)).cast("long")).cast("long")
    df.withColumn("__n", (whole + extra).cast("int"))
      .filter(col("__n") > 0)
      .withColumn(repeatCol, explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n")
  }

  /** Deterministic global corpus shuffle + fixed-size shard assignment —
    * the "shuffle the corpus, cut it into training shards" step every
    * epoch-0 data pipeline ends with. Training order must be (a) globally
    * shuffled (no source/time runs — loss curves degrade on clumped
    * data), (b) reproducible bit-for-bit (restarts, audits), and (c)
    * assigned WITHOUT a global sort bottleneck. The shuffle key is the
    * same multiplicative hash as `hashSample` — for distinct ids in
    * [0, 2^31) the map id→(id·K) mod 2^32 is INJECTIVE (multiplication
    * by an odd constant is a bijection mod 2^32, and the folded domain
    * is half of it), so the key is a total order with no ties and the
    * resulting permutation is pseudorandom but engine-portable.
    *
    * `shardCol` = rank div docsPerShard, `posCol` = rank mod
    * docsPerShard, where rank is the 0-based global rank by shuffle key —
    * computed with the two-phase distributed prefix sum (arithmetic
    * buckets over the key space + per-bucket window + O(#partitions)
    * driver fold), NOT `Window.orderBy` over everything (one-task
    * funnel) and NOT a global sort. Every shard except the last holds
    * exactly `docsPerShard` docs. Writing the physical shards is then
    * `df.repartition(col(shardCol)).write.partitionBy(shardCol)...` —
    * each shard's rows co-locate in one task.
    */
  def shuffleShards(df: DataFrame, idCol: String, docsPerShard: Long,
      shardCol: String = "shard_id", posCol: String = "pos_in_shard",
      keyCol: String = "shuffle_key"): DataFrame = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    val keyed = df.withColumn(keyCol, hash32(col(idCol)))
      .withColumn("__one", lit(1L))
    Packing.withRunningTotal(keyed, keyCol, "__one", "__rank")
      .withColumn(shardCol, expr(s"(__rank - 1) div $docsPerShard"))
      .withColumn(posCol, expr(s"(__rank - 1) % $docsPerShard"))
      .drop("__one", "__rank")
  }
}
