package graft
import org.apache.spark.sql.SparkSession
/** Manual smoke runner mirroring the driver's entry() check. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(false)
    println("ENTRY_ROWS=" + df.count())
    df.explain("formatted")
    spark.stop()
  }
}
