package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup
object MinhashProbe {
  def time[T](n: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("count")(docs.count())
    val sh = docs.withColumn("_sh", Dedup.shingles(col("text"), 3))
    time("shingles-only")(sh.select(sum(size(col("_sh")))).head())
    val sigs = sh.select(col("doc_id"), Dedup.minhashSignature(col("_sh"), 64).as("sig"))
    time("signatures-64")(sigs.select(max(element_at(col("sig"),1))).head())
    val sigs16 = sh.select(col("doc_id"), Dedup.minhashSignature(col("_sh"), 16).as("sig"))
    time("signatures-16")(sigs16.select(max(element_at(col("sig"),1))).head())
    time("full-pairs")(println(Dedup.minhashPairs(docs, "doc_id", "text", 64, 16, 0.5).count()))
    spark.stop()
  }
}
