package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api._

/** Bucketed export: the co-located-join posture. Two catalog tables exported
  * bucketed on their join key must sort-merge join with NO shuffle exchange
  * on either side — the plan shape that makes repeated fact-fact joins
  * affordable at scale. */
class BucketingSpec extends SparkSpec {

  test("bucketed exports join without shuffle exchanges") {
    val root = Files.createTempDirectory("graft-bkt").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    val schemaA = StructType(Seq(
      StructField("k", LongType), StructField("va", StringType)))
    val schemaB = StructType(Seq(
      StructField("k", LongType), StructField("vb", LongType)))
    s.transaction { tx =>
      val m = tx.bucket("b").createSchema("m")
      val rowsA = new java.util.ArrayList[Row]()
      val rowsB = new java.util.ArrayList[Row]()
      (0 until 2000).foreach { i =>
        rowsA.add(Row(i.toLong % 500, s"a$i"))
        rowsB.add(Row(i.toLong % 300, i.toLong))
      }
      m.createTable("ta", schemaA).insert(spark.createDataFrame(rowsA, schemaA))
      m.createTable("tb", schemaB).insert(spark.createDataFrame(rowsB, schemaB))
      m.table("ta").exportBucketed("bkt_a", 8, Seq("k"))
      m.table("tb").exportBucketed("bkt_b", 8, Seq("k"))
    }
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the exchange (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_a")
        .join(spark.table("bkt_b"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      val joinPlan = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        .queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin"), joinPlan)
      assert(!joinPlan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$joinPlan")
      // and it computes the right answer
      val expect = 2000L / 500 * (2000L / 300 + 1) // rough lower bound guard
      assert(j.agg(sum("n")).collect().head.getLong(0) >=  expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
