package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path needs its own SparkSession (extensions bind at
  * session build), so this suite doesn't share SparkSpec's session. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects SQL functions at session build") {
    // extensions apply only at session creation — stop any shared session
    // first (SparkSpec re-creates on demand)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val r = spark.sql(
        """SELECT l2sq(array(1.0F, 2.0F), array(1.0F, 4.0F)) AS d,
          |       inner_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS ip,
          |       simhash64(array('a', 'b')) AS sh,
          |       size(minhash_signature(array('a', 'b', 'c'), 16, 2)) AS mk
          |""".stripMargin).head()
      assert(r.getDouble(0) == 4.0)
      assert(r.getDouble(1) == 11.0)
      assert(r.getLong(2) != 0L)
      assert(r.getInt(3) == 16)
      // reference SQL name registered too
      assert(spark.sql("SELECT array_distance(array(0.0F), array(3.0F)) d")
        .head().getDouble(0) == 9.0)
    } finally spark.stop()
  }
}
