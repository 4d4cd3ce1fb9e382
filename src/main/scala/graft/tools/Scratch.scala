package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq("1208925752731748967071744").toDF("s")
      .select(col("s").cast(DecimalType(38, 0)).as("d"))
      .select(
        col("d").cast(DoubleType).as("direct"),
        col("d").cast(StringType).cast(DoubleType).as("via_string"))
    val r = df.collect()(0)
    println("direct     = " + java.lang.Double.toHexString(r.getDouble(0) / math.pow(2, 80)))
    println("via_string = " + java.lang.Double.toHexString(r.getDouble(1) / math.pow(2, 80)))
    println("expect       0x1.fffffe24c4bfep-1")
    df.explain(true)
    spark.stop()
  }
}
