package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Glue
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val e = Glue.expression(col("a") >= 100L && col("a") < 110L)
    println(e.getClass.getName)
    println(e.treeString)
  }
}
