package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.UnsupportedOperationError
import graft.functions.{IcebergHashFunctions, IceMurmur}

/** Iceberg HIDDEN PARTITIONING (spec "Partition Transforms"): a partition
  * spec field derives its value from a source column through a transform —
  * `bucket[N]` (murmur3 hash bucket), `truncate[W]`, `year`/`month`/`day`/
  * `hour` (temporal binning), `identity`, `void`. Data files carry the
  * TRANSFORMED tuple in their manifest entries; queries filter on the raw
  * source column and the engine projects predicates through the transform
  * to prune files.
  *
  * This is the core Iceberg scan optimization at 100 TB — a table
  * bucket-partitioned on a join/lookup key or day-partitioned on an event
  * time answers point and range queries from a handful of files, with no
  * directory layout contract. Read side: `mightMatch` is the inclusive
  * projection (Iceberg's `Projections.inclusive`) — order-preserving
  * transforms (truncate, temporal) project range predicates, bucket
  * projects equality only; anything unprojectable keeps the file (safe).
  * Write side: `column` builds the transformed value as a codegen'd
  * Column (the murmur3 bucket via a native expression, temporal binning
  * via exact integer arithmetic — NO per-row UDF), so staging clusters
  * rows by partition at full scan speed.
  *
  * Reference behavior: iceberg spec §Partition Transforms + Appendix B
  * (hash vectors, verified in IcebergTransformsSpec).
  */
private[tables] object IceTransforms {

  sealed trait T {
    /** The metadata `transform` string (spec serialization). */
    def spec: String
  }
  case object Identity extends T { val spec = "identity" }
  case object VoidT extends T { val spec = "void" }
  final case class Bucket(n: Int) extends T { val spec = s"bucket[$n]" }
  final case class Truncate(w: Int) extends T { val spec = s"truncate[$w]" }
  case object Year extends T { val spec = "year" }
  case object Month extends T { val spec = "month" }
  case object Day extends T { val spec = "day" }
  case object Hour extends T { val spec = "hour" }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  /** Parse the metadata serialization ("bucket[16]"); None = unknown
    * transform (read side then never prunes on it — forward-compatible).
    */
  def parseSpec(s: String): Option[T] = s match {
    case "identity" => Some(Identity)
    case "void" => Some(VoidT)
    case "year" => Some(Year)
    case "month" => Some(Month)
    case "day" => Some(Day)
    case "hour" => Some(Hour)
    case BucketRe(n) => Some(Bucket(n.toInt))
    case TruncRe(w) => Some(Truncate(w.toInt))
    case _ => None
  }

  private val UserFnRe = """(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?([^)]+?)\s*\)""".r

  /** Parse the user-facing create syntax: a bare column name (identity) or
    * `bucket(16, col)` / `truncate(4, col)` / `year(col)` / `month(col)` /
    * `day(col)` / `hour(col)` / `void(col)`.
    */
  def parseUser(s: String): (String, T) = s.trim match {
    case UserFnRe("bucket", n, c) if n != null => (c, Bucket(n.toInt))
    case UserFnRe("truncate", w, c) if w != null => (c, Truncate(w.toInt))
    case UserFnRe("year", null, c) => (c, Year)
    case UserFnRe("month", null, c) => (c, Month)
    case UserFnRe("day", null, c) => (c, Day)
    case UserFnRe("hour", null, c) => (c, Hour)
    case UserFnRe("void", null, c) => (c, VoidT)
    case bare if !bare.contains("(") => (bare, Identity)
    case other => throw UnsupportedOperationError(s"iceberg: cannot parse partition field '$other'")
  }

  /** Iceberg-java's conventional spec field name for a transform. */
  def fieldName(source: String, t: T): String = t match {
    case Identity => source
    case VoidT => s"${source}_null"
    case Bucket(_) => s"${source}_bucket"
    case Truncate(_) => s"${source}_trunc"
    case Year => s"${source}_year"
    case Month => s"${source}_month"
    case Day => s"${source}_day"
    case Hour => s"${source}_hour"
  }

  /** Result type of the transformed value (spec table; `day` is `date`). */
  def resultType(t: T, src: DataType): DataType = t match {
    case Identity => src
    case VoidT => src
    case Bucket(_) => IntegerType
    case Truncate(_) => src
    case Day => DateType
    case _ => IntegerType
  }

  private val EpochLit = to_date(lit("1970-01-01"))
  private val DayMicros = 86400000000L
  private val HourMicros = 3600000000L

  /** Exact integral floorDiv as Columns: (c - pmod(c, d)) / d, the
    * division routed through decimal so 64-bit micros never round
    * through a double.
    */
  private def floorDivCol(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))).cast(DecimalType(28, 0)) / lit(d)).cast(LongType)

  private def utcDateOfTs(c: Column): Column =
    date_add(EpochLit, floorDivCol(unix_micros(c), DayMicros).cast(IntegerType))

  /** The transformed value as a codegen'd Column (write-side staging).
    * Throws for (transform, type) pairs the spec does not define or this
    * writer does not support — at CREATE time, not at read time.
    */
  def column(t: T, src: Column, dt: DataType): Column = (t, dt) match {
    case (Identity, _) => src
    case (VoidT, _) => lit(null).cast(resultType(t, dt))
    case (Bucket(n), IntegerType | LongType | ShortType | ByteType) =>
      IcebergHashFunctions.bucketLong(src.cast(LongType), n)
    case (Bucket(n), DateType) =>
      IcebergHashFunctions.bucketLong(datediff(src, EpochLit).cast(LongType), n)
    case (Bucket(n), TimestampType) =>
      IcebergHashFunctions.bucketLong(unix_micros(src), n)
    case (Bucket(n), StringType) => IcebergHashFunctions.bucketString(src, n)
    case (Truncate(w), IntegerType | LongType | ShortType | ByteType) =>
      (src.cast(LongType) - pmod(src.cast(LongType), lit(w.toLong))).cast(dt)
    case (Truncate(w), StringType) => substring(src, 1, w)
    case (Year, DateType) => (year(src) - lit(1970)).cast(IntegerType)
    case (Month, DateType) =>
      ((year(src) - lit(1970)) * lit(12) + month(src) - lit(1)).cast(IntegerType)
    case (Day, DateType) => src
    case (Year, TimestampType) => (year(utcDateOfTs(src)) - lit(1970)).cast(IntegerType)
    case (Month, TimestampType) =>
      ((year(utcDateOfTs(src)) - lit(1970)) * lit(12) + month(utcDateOfTs(src)) - lit(1))
        .cast(IntegerType)
    case (Day, TimestampType) => utcDateOfTs(src)
    case (Hour, TimestampType) =>
      floorDivCol(unix_micros(src), HourMicros).cast(IntegerType)
    // zone-less timestamps bin on their LOCAL calendar value (spec:
    // `timestamp` without zone) — to_date/year/month/hour read it directly
    case (Year, TimestampNTZType) => (year(to_date(src)) - lit(1970)).cast(IntegerType)
    case (Month, TimestampNTZType) =>
      ((year(to_date(src)) - lit(1970)) * lit(12) + month(to_date(src)) - lit(1))
        .cast(IntegerType)
    case (Day, TimestampNTZType) => to_date(src)
    case (Hour, TimestampNTZType) =>
      (datediff(to_date(src), EpochLit).cast(LongType) * lit(24L) +
        hour(src).cast(LongType)).cast(IntegerType)
    case _ =>
      throw UnsupportedOperationError(s"iceberg: transform ${t.spec} is not defined for type $dt")
  }

  // ---- literal projection (read-side pruning) ----

  /** Days-since-epoch of a stored partition value that may be an int
    * (manifest read-back) or an ISO date (hive staging dir).
    */
  private def parseDays(s: String): Long =
    s.toLongOption.getOrElse(java.time.LocalDate.parse(s).toEpochDay)

  /** Epoch micros of a timestamp literal: session zone for TIMESTAMP
    * (mirrors the runtime cast), UTC for zone-less TIMESTAMP_NTZ — the
    * same convention FileStats uses for footer-stats pruning.
    */
  private def tsMicros(s: String, ntz: Boolean): Long =
    s.toLongOption.getOrElse {
      val norm = s.trim.replace(' ', 'T')
      val ldt =
        try java.time.LocalDateTime.parse(norm)
        catch {
          case _: java.time.format.DateTimeParseException =>
            java.time.LocalDate.parse(norm).atStartOfDay()
        }
      val zone =
        if (ntz) java.time.ZoneOffset.UTC
        else java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      val inst = ldt.atZone(zone).toInstant
      Math.multiplyExact(inst.getEpochSecond, 1000000L) + inst.getNano / 1000L
    }

  /** Source value widened to the long space each temporal/bucket transform
    * hashes or bins (days for date, micros for timestamp, the value for
    * integers). None = literal does not parse / type unsupported.
    */
  private def widen(dt: DataType, lit: String): Option[Long] =
    try dt match {
      case IntegerType | LongType | ShortType | ByteType => Some(lit.toLong)
      case DateType => Some(parseDays(lit))
      case TimestampType => Some(tsMicros(lit, ntz = false))
      case TimestampNTZType => Some(tsMicros(lit, ntz = true))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The transformed long value of a literal under an order-preserving or
    * bucket transform (bucket → bucket id; temporal → bin ordinal;
    * truncate-numeric → floored value). None = cannot project.
    */
  private def projectLong(t: T, dt: DataType, litStr: String): Option[Long] = t match {
    case Bucket(n) => dt match {
      case StringType => Some((IceMurmur.bucketString(litStr, n)).toLong)
      case _ => widen(dt, litStr).map(v => IceMurmur.bucketLong(v, n).toLong)
    }
    case Truncate(w) => dt match {
      case IntegerType | LongType | ShortType | ByteType =>
        widen(dt, litStr).map(v => v - Math.floorMod(v, w.toLong))
      case _ => None
    }
    case Year => widen(dt, litStr).map { v =>
      val days = if (dt == DateType) v else Math.floorDiv(v, DayMicros)
      (java.time.LocalDate.ofEpochDay(days).getYear - 1970).toLong
    }
    case Month => widen(dt, litStr).map { v =>
      val days = if (dt == DateType) v else Math.floorDiv(v, DayMicros)
      val d = java.time.LocalDate.ofEpochDay(days)
      (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
    }
    case Day => widen(dt, litStr).map { v =>
      if (dt == DateType) v else Math.floorDiv(v, DayMicros)
    }
    case Hour => dt match {
      case TimestampType | TimestampNTZType =>
        widen(dt, litStr).map(v => Math.floorDiv(v, HourMicros))
      case _ => None
    }
    case _ => None
  }

  /** Inclusive projection: can a file whose transformed partition value is
    * `partVal` contain a row satisfying `<sourceCol> <op> <litStr>`?
    * Order-preserving transforms project every comparison; bucket projects
    * `=` only; missing/unparseable anything keeps the file.
    */
  def mightMatch(t: T, dt: DataType, partVal: String, op: String, litStr: String): Boolean = {
    if (partVal == null || partVal == "__HIVE_DEFAULT_PARTITION__") return true
    t match {
      case Identity | VoidT => true // identity prunes through FileStats; void never
      case Truncate(w) if dt == StringType =>
        // prefixW is order-preserving (non-strict) under lexicographic order
        val p = if (litStr.length > w) litStr.substring(0, w) else litStr
        op match {
          case "=" => partVal == p
          case "<" | "<=" => partVal <= p
          case ">" | ">=" => partVal >= p
          case _ => true
        }
      case Bucket(_) =>
        if (op != "=") true
        else projectLong(t, dt, litStr) match {
          case Some(b) => partVal.toLongOption.contains(b)
          case None => true
        }
      case _ =>
        // order-preserving long-valued transforms: part op t(lit), kept
        // inclusive at the boundary bin
        val stored =
          if (t == Day) try Some(parseDays(partVal)) catch { case scala.util.control.NonFatal(_) => None }
          else partVal.toLongOption
        (stored, projectLong(t, dt, litStr)) match {
          case (Some(pv), Some(tl)) => op match {
            case "=" => pv == tl
            case "<" | "<=" => pv <= tl
            case ">" | ">=" => pv >= tl
            case _ => true
          }
          case _ => true
        }
    }
  }
}
