package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]"), 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    var edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(eager = false)
    def signature(e: org.apache.spark.sql.DataFrame): Seq[Any] =
      e.agg(count(lit(1)), call_function("bit_xor", xxhash64(col("u"), col("v"))))
        .head().toSeq
    println(s"INIT sig=${signature(edges)}")
    for (iter <- 1 to 20) {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
      val dir = ls.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v")).filter(col("u") =!= col("v"))
      val ssMin = dir.groupBy("u").agg(min("v").as("m"))
      val ss = dir.join(ssMin, "u").select(col("v"), col("m"))
        .union(ssMin.select(col("u").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct().localCheckpoint(eager = false)
      println(s"ROUND $iter sig=${signature(ss)}")
      edges = ss
    }
    spark.stop()
  }
}
