package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe: does a parquet bloom filter on a high-cardinality,
  * UNSORTED column buy row-group skipping for point lookups at sf0.1?
  * (Zone maps can't prune unsorted columns; blooms can.) */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val plain = "/tmp/bloom_probe/plain"
    val bloom = "/tmp/bloom_probe/bloom"
    // 8 row groups per file-ish: smallish rowgroups so skipping can show
    ev.repartition(4).write.mode("overwrite")
      .option("parquet.block.size", (1 << 20).toString)
      .parquet(plain)
    ev.repartition(4).write.mode("overwrite")
      .option("parquet.block.size", (1 << 20).toString)
      .option("parquet.bloom.filter.enabled#event_id", "true")
      .option("parquet.bloom.filter.expected.ndv#event_id", "600000")
      .parquet(bloom)
    def time(name: String, dir: String): Unit = {
      val ids = Seq(123L, 99999L, 444444L, 31337L)
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        ids.foreach { id =>
          spark.read.parquet(dir).filter(col("event_id") === id).count()
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-8s min=${runs.min}%.3f runs=${runs.map(t => f"$t%.3f").mkString(",")}")
    }
    time("plain", plain)
    time("bloom", bloom)
    time("plain2", plain)
    time("bloom2", bloom)
    spark.stop()
  }
}
