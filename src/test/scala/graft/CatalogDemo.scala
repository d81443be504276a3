package graft
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api._

/** Manual end-to-end drive of the catalog public API (verification runner). */
object CatalogDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val s = VastSession(spark, root)
    s.createBucket("demo")
    val schema = StructType(Seq(StructField("a", LongType), StructField("s", StringType)))
    s.transaction { tx =>
      val t = tx.bucket("demo").createSchema("main").createTable("t1", schema)
      val (lo, hi) = t.insert(spark.createDataFrame(java.util.List.of(
        Row(1L, "one"), Row(2L, "two"), Row(3L, "three")), schema))
      println(s"INSERTED ids [$lo,$hi)")
    }
    s.transaction { tx => tx.bucket("demo").createSnapshot("before") }
    s.transaction { tx =>
      val t = tx.bucket("demo").schema("main").table("t1")
      val vic = t.select(Seq("a"), col("a") === 2L, internalRowId = true).select("_row_id")
      t.delete(vic)
    }
    s.transaction { tx =>
      val t = tx.bucket("demo").schema("main").table("t1")
      println("AFTER DELETE:")
      t.select().orderBy("a").show(false)
      println("SNAPSHOT VIEW:")
      tx.bucket("demo").snapshot("before").schema("main").table("t1")
        .select().orderBy("a").show(false)
      println("CATALOG:")
      tx.catalog().show(false)
    }
    // probe: concurrent commit conflict
    val tx1 = s.beginTransaction(); val tx2 = s.beginTransaction()
    tx1.bucket("demo").schema("main").table("t1").insert(
      spark.createDataFrame(java.util.List.of(Row(9L, "nine")), schema))
    tx2.bucket("demo").schema("main").table("t1").insert(
      spark.createDataFrame(java.util.List.of(Row(8L, "eight")), schema))
    tx1.commit()
    try { tx2.commit(); println("PROBE-CONFLICT: NO ERROR (BAD)") }
    catch { case _: Conflict => println("PROBE-CONFLICT: Conflict raised (GOOD)") }
    // probe: missing table / inactive tx
    try { s.transaction(_.bucket("demo").schema("main").table("nope")) }
    catch { case e: MissingTable => println(s"PROBE-MISSING: ${e.getMessage}") }
    spark.stop()
  }
}
