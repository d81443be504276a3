package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("s1_scan_project", "j1_join_inner", "v1_vector_topk_l2sq", "a1_agg_groupby", "l3_topk")) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"\n===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    }
    spark.stop()
  }
}
