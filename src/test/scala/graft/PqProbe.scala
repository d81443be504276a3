package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual phase-timing probe for the PQ pipeline (not a test). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"$n%-10s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    e.count() // warm
    val cb = time("train") {
      val c = graft.llm.Quantization.pqTrain(e, "vec_id", "embedding", 64, 16, 16, 1)
      c.count(); c
    }
    val enc = time("encode") {
      val x = graft.llm.Quantization.pqEncode(e, "vec_id", "embedding", cb, 64, 16)
      x.count(); x
    }
    val q = e.filter(col("vec_id") < 8)
    time("search") {
      graft.llm.Quantization.pqSearch(enc, e, q, cb, "vec_id", "embedding", 64, 16, 10, 50).count()
    }
    time("search2") {
      graft.llm.Quantization.pqSearch(enc, e, q, cb, "vec_id", "embedding", 64, 16, 10, 50).count()
    }
    spark.stop()
  }
}
