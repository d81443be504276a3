package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway local probe for classifier tuning (not part of the gate). */
object QcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dim = 32
      val u = Array.tabulate(dim)(i => (((i + 1) * 37) % 19 - 9).toDouble)
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("doc_id"),
          graft.llm.TextAnalysis.hashEmbedding(col("text"), dim).as("x"))
        .withColumn("y",
          (aggregate(zip_with(col("x").cast("array<double>"), lit(u),
            (a, b) => a * b), lit(0.0d), (acc, v) => acc + v) > 0)
            .cast("double"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val m = graft.llm.Classifier.lrFitNewton(docs, "y", "x", dim, iters = 6, l2 = 1e-4)
      val m2 = graft.llm.Classifier.lrFitNewton(docs.repartition(7), "y", "x", dim, iters = 6, l2 = 1e-4)
      val det = m.weights.sameElements(m2.weights) && m.bias == m2.bias
      val agr = graft.llm.Classifier.accuracy(docs, "y", "x", m)
      val bal = docs.agg(avg("y")).head().getDouble(0)
      println(f"$sf bal=$bal%.3f det=$det agr=$agr%.4f losses=${m.lossHistory.map(l => f"$l%.4f").mkString(",")} " +
        f"secs=${(System.nanoTime()-t0)/1e9}%.1f")
    }
    spark.stop()
  }
}
