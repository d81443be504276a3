package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api._

/** Dynamic partition pruning on the SQL read path: when a catalog table is
  * the big side of a join whose dim side carries a selective filter, the
  * surviving join keys arrive at the scan as a runtime IN filter and the
  * manifest zone maps drop whole fact FILES before any byte is read —
  * static pruning can't help here because the predicate sits on the other
  * table. Also covers the exact (non-envelope) IN-set semantics of
  * `Table.pruneByInSet`: scattered keys keep ~|keys| files, not the range
  * between them. */
class RuntimeFilterSpec extends SparkSpec {

  private val factSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))
  private val dimSchema = StructType(Seq(
    StructField("k", LongType), StructField("attr", StringType)))

  test("join-key runtime filter prunes fact files through zone maps") {
    val root = Files.createTempDirectory("graft-dpp").toString
    val s = VastSession(spark, root)
    s.createBucket("bk")
    s.transaction { tx =>
      val m = tx.bucket("bk").createSchema("m")
      val fact = m.createTable("fact", factSchema)
      // 8 commits, each a single-partition frame over a DISJOINT key range
      // -> 8 files with tight, non-overlapping zone maps on k
      (0 until 8).foreach { i =>
        val rows = new java.util.ArrayList[Row]()
        (0 until 100).foreach(j => rows.add(Row(i * 100L + j, s"f$i-$j")))
        fact.insert(spark.createDataFrame(rows, factSchema).repartition(1))
      }
      assert(fact.manifest.files.size == 8,
        s"layout drifted: ${fact.manifest.files.size} files")
      val dim = m.createTable("dim", dimSchema)
      val dimRows = new java.util.ArrayList[Row]()
      // one dim row per fact file's range; exactly two carry attr='pick',
      // and their keys sit in files 1 and 6 — far apart, so envelope
      // pruning would keep 6 files while exact IN pruning keeps 2
      (0 until 8).foreach(i => dimRows.add(
        Row(i * 100L + 50L, if (i == 1 || i == 6) "pick" else "skip")))
      dim.insert(spark.createDataFrame(dimRows, dimSchema))
    }
    spark.conf.set("spark.sql.catalog.gdpp",
      "org.apache.spark.sql.graftglue.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gdpp.root", root)

    val df = spark.sql(
      """SELECT f.k, f.v FROM gdpp.bk.m.fact f
        |JOIN gdpp.bk.m.dim d ON f.k = d.k
        |WHERE d.attr = 'pick' ORDER BY f.k""".stripMargin)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((150L, "f1-50"), (650L, "f6-50")), s"wrong rows: $got")

    // the executed plan carries the runtime filter and the scan's
    // description records the file-level prune it performed
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"no runtime filter reached the scan:\n$plan")
    val pruned = "runtime-pruned (\\d+)->(\\d+) files".r
      .findFirstMatchIn(plan)
    assert(pruned.isDefined, s"no runtime prune recorded in:\n$plan")
    val (before, after) = (pruned.get.group(1).toInt, pruned.get.group(2).toInt)
    assert(before == 8 && after == 2,
      s"expected exact IN-set prune 8->2, got $before->$after")
  }

  test("column-pruned fact scan: unread stats columns don't break DPP") {
    // the fact carries a column the query never reads; filterAttributes
    // must not advertise it — the planner resolves advertised refs against
    // the PRUNED relation output and fails the whole query otherwise
    val wideSchema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("pad", LongType)))
    val root = Files.createTempDirectory("graft-dpp-prune").toString
    val s = VastSession(spark, root)
    s.createBucket("bk")
    s.transaction { tx =>
      val m = tx.bucket("bk").createSchema("m")
      val fact = m.createTable("fact", wideSchema)
      (0 until 4).foreach { i =>
        val rows = new java.util.ArrayList[Row]()
        (0 until 50).foreach(j =>
          rows.add(Row(i * 50L + j, s"f$i-$j", j * 2L)))
        fact.insert(spark.createDataFrame(rows, wideSchema).repartition(1))
      }
      val dim = m.createTable("dim", dimSchema)
      val dimRows = new java.util.ArrayList[Row]()
      (0 until 4).foreach(i => dimRows.add(
        Row(i * 50L + 10L, if (i == 2) "pick" else "skip")))
      dim.insert(spark.createDataFrame(dimRows, dimSchema))
    }
    spark.conf.set("spark.sql.catalog.gdppw",
      "org.apache.spark.sql.graftglue.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gdppw.root", root)
    val df = spark.sql(
      """SELECT f.k, f.v FROM gdppw.bk.m.fact f
        |JOIN gdppw.bk.m.dim d ON f.k = d.k
        |WHERE d.attr = 'pick'""".stripMargin)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((110L, "f2-10")), s"wrong rows: $got")
    val plan = df.queryExecution.executedPlan.toString
    val pruned = "runtime-pruned (\\d+)->(\\d+) files".r.findFirstMatchIn(plan)
    assert(pruned.isDefined, s"no runtime prune recorded in:\n$plan")
    assert(pruned.get.group(1).toInt == 4 && pruned.get.group(2).toInt == 1,
      s"expected 4->1, got ${pruned.get.group(1)}->${pruned.get.group(2)}")
  }

  test("shuffle-join DPP: a non-broadcastable dim still prunes fact files") {
    val root = Files.createTempDirectory("graft-dpp-smj").toString
    val s = VastSession(spark, root)
    s.createBucket("bk")
    s.transaction { tx =>
      val m = tx.bucket("bk").createSchema("m")
      val fact = m.createTable("fact", factSchema)
      (0 until 8).foreach { i =>
        val rows = new java.util.ArrayList[Row]()
        (0 until 100).foreach(j => rows.add(Row(i * 100L + j, s"f$i-$j")))
        fact.insert(spark.createDataFrame(rows, factSchema).repartition(1))
      }
      val dim = m.createTable("dim", dimSchema)
      val dimRows = new java.util.ArrayList[Row]()
      (0 until 8).foreach(i => dimRows.add(
        Row(i * 100L + 50L, if (i == 1 || i == 6) "pick" else "skip")))
      dim.insert(spark.createDataFrame(dimRows, dimSchema))
    }
    spark.conf.set("spark.sql.catalog.gdppsmj",
      "org.apache.spark.sql.graftglue.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gdppsmj.root", root)
    // force the shuffle-join path: no broadcast anywhere, and the
    // GraftSession.tune posture that lets DPP plan the dim filter as its
    // own subquery instead of requiring a broadcast to reuse
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevReuse = spark.conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val df = spark.sql(
        """SELECT f.k, f.v FROM gdppsmj.bk.m.fact f
          |JOIN gdppsmj.bk.m.dim d ON f.k = d.k
          |WHERE d.attr = 'pick' ORDER BY f.k""".stripMargin)
      val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((150L, "f1-50"), (650L, "f6-50")), s"wrong rows: $got")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"expected a shuffle join with broadcast disabled:\n$plan")
      val pruned = "runtime-pruned (\\d+)->(\\d+) files".r.findFirstMatchIn(plan)
      assert(pruned.isDefined, s"no runtime prune recorded in:\n$plan")
      assert(pruned.get.group(1).toInt == 8 && pruned.get.group(2).toInt == 2,
        s"expected 8->2, got ${pruned.get.group(1)}->${pruned.get.group(2)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      prevReuse.foreach(v => spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", v))
    }
  }

  test("pruneByInSet is exact per value, conservative on unknowns") {
    import graft.api.Manifest.{ColStat, FileEntry}
    def fe(path: String, lo: Long, hi: Long) = FileEntry(
      path, 1, 0, 0, colStats = Map("k" -> ColStat(lo.toString, hi.toString, "long")))
    val files = (0 until 10).map(i => fe(s"f$i", i * 10L, i * 10L + 9L))
    // scattered keys: exactly the two covering files survive — NOT the
    // seven files inside the [5, 95] envelope
    val kept = Table.pruneByInSet(files, "k", Seq(5L, 95L))
    assert(kept.map(_.path) == Seq("f0", "f9"), s"kept ${kept.map(_.path)}")
    // value off every range: nothing kept
    assert(Table.pruneByInSet(files, "k", Seq(1000L)).isEmpty)
    // missing stats keep the file; mixed/unknown value types keep the file
    val nostats = FileEntry("ns", 1, 0, 0)
    assert(Table.pruneByInSet(Seq(nostats), "k", Seq(5L)) == Seq(nostats))
    assert(Table.pruneByInSet(files, "k", Seq("oops")).size == 10)
    // string kind goes through UTF-8 order; maxUnbounded means +inf
    val sf = FileEntry("s1", 1, 0, 0, colStats = Map(
      "s" -> ColStat("m", "p", "string")))
    val su = FileEntry("s2", 1, 0, 0, colStats = Map(
      "s" -> ColStat("t", "t", "string", maxUnbounded = true)))
    assert(Table.pruneByInSet(Seq(sf, su), "s", Seq("n")).map(_.path) == Seq("s1"))
    assert(Table.pruneByInSet(Seq(sf, su), "s", Seq("z")).map(_.path) == Seq("s2"))
    // all-null IN-set: conservative keep-all
    assert(Table.pruneByInSet(files, "k", Seq(null)).size == 10)
    // datetime values normalize to the zone maps' long encoding (timestamps
    // as epoch micros, dates as epoch days) — the star-join-on-date DPP case
    val tsf = (0 until 4).map(i => fe(s"t$i", i * 1000000L, i * 1000000L + 999999L))
    val ts = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(2)) // 2e6 µs
    assert(Table.pruneByInSet(tsf, "k", Seq(ts)).map(_.path) == Seq("t2"))
    assert(Table.pruneByInSet(tsf, "k",
      Seq(java.time.Instant.ofEpochSecond(9))).isEmpty)
    assert(Table.pruneByInSet(tsf, "k",
      Seq(java.time.LocalDate.ofEpochDay(3))).map(_.path) == Seq("t0"))
  }
}
