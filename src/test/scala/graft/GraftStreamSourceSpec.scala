package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.api._

/**
 * The graft table changefeed: manifest versions stream as micro-batches
 * (offsets = versions, batch = files added between two versions), so a
 * continuously-loaded corpus table feeds downstream pipelines incrementally
 * — never a corpus rescan, restart resumes from the checkpointed version.
 */
class GraftStreamSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("s", StringType)))

  private def insert(s: VastSession, n: Int, tag: String): Unit =
    s.transaction { tx =>
      val t = tx.bucket("bk").schema("m").table("t")
      val l = new java.util.ArrayList[Row]()
      (0 until n).foreach(i => l.add(Row(i.toLong, s"$tag$i")))
      // one file per insert: the COW-rewrite assertions below need the
      // delete victim to share its file with surviving rows
      t.insert(spark.createDataFrame(l, schema).coalesce(1))
    }

  test("manifest versions stream as micro-batches; checkpoint resumes at the delta") {
    val root = Files.createTempDirectory("graft-stream").toString
    val s = VastSession(spark, root)
    s.createBucket("bk")
    s.transaction(tx => tx.bucket("bk").createSchema("m").createTable("t", schema))
    insert(s, 5, "one")   // v2
    insert(s, 3, "two")   // v3
    val tdir = Paths.get(root, "bk", "m", "t").toString
    val ckpt = Files.createTempDirectory("graft-stream-ck").toString
    val out = Files.createTempDirectory("graft-stream-out").toString + "/sink"

    def drain(ignoreChanges: Boolean = false): Unit = {
      val reader = spark.readStream.format("graft")
      val src = (if (ignoreChanges) reader.option("ignoreChanges", "true")
                 else reader).load(tdir)
      val q = src.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    def sink() = spark.read.parquet(out)

    // first run: everything committed so far arrives
    drain()
    assert(sink().count() == 8)

    // second run, SAME checkpoint: ONLY the new version's rows arrive —
    // without version-delta semantics this would re-deliver all 8
    insert(s, 2, "three") // v4
    drain()
    assert(sink().count() == 10)
    assert(sink().filter(col("s").startsWith("three")).count() == 2)
    assert(sink().filter(col("s").startsWith("one")).count() == 5,
      "resumed stream re-delivered already-processed files")

    // batch read through the same provider sees the current snapshot
    assert(spark.read.format("graft").load(tdir).count() == 10)
    // requested-column pruning flows through the streaming relation
    assert(spark.readStream.format("graft").load(tdir).select("a")
      .schema.fieldNames.toSeq == Seq("a"))

    // a COW delete breaks the append-only contract: the stream FAILS with a
    // clear error instead of silently re-delivering rewritten rows
    s.transaction { tx =>
      val t = tx.bucket("bk").schema("m").table("t")
      t.delete(t.select(Nil, col("s") === "one0", internalRowId = true)
        .select("_row_id"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val err = intercept[Exception] { drain() }
    assert(messages(err).exists(_.contains("append-only")),
      s"wrong failure: ${messages(err).take(3)}")

    // ignoreChanges opts into at-least-once over the rewritten group: the
    // rewritten file (4 surviving rows of the deleted group) re-emits
    drain(ignoreChanges = true)
    assert(sink().count() == 14)
    // non-rewritten groups are still not re-delivered
    assert(sink().filter(col("s").startsWith("three")).count() == 2)
  }

  test("incremental curation: changefeed -> quality gate -> transactional sink") {
    val root = Files.createTempDirectory("graft-pipe").toString
    val s = VastSession(spark, root)
    s.createBucket("bk")
    s.transaction { tx =>
      val m = tx.bucket("bk").createSchema("m")
      m.createTable("t", schema)       // raw ingest table (insert() targets it)
      m.createTable("curated", schema) // quality-gated output
    }
    def insertMixed(n: Int, tag: String): Unit = s.transaction { tx =>
      val t = tx.bucket("bk").schema("m").table("t")
      val l = new java.util.ArrayList[Row]()
      (0 until n).foreach(i => l.add(
        Row(i.toLong, if (i % 2 == 0) s"long_enough_$tag$i" else s"no$i")))
      t.insert(spark.createDataFrame(l, schema).coalesce(1))
    }
    insertMixed(4, "a")
    val tdir = Paths.get(root, "bk", "m", "t").toString
    val ckpt = Files.createTempDirectory("graft-pipe-ck").toString

    // the whole loop is engine-native: the changefeed reads only new files,
    // the gate is a map-side filter, and the sink commits through the
    // manifest CAS with batch-id dedup (exactly-once table contents)
    def runOnce(): Unit = {
      val gated = graft.llm.Curation.qualityGate(
        spark.readStream.format("graft").load(tdir).drop("_row_id"),
        length(col("s")).cast("double"), minScore = 6.0)
      val q = graft.streaming.Events.sinkToTable(
        gated, s, "bk", "m", "curated", ckpt)
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    s.transaction { tx =>
      val got = tx.bucket("bk").schema("m").table("curated")
        .select(Seq("s")).collect().map(_.getString(0)).sorted
      assert(got.toSeq == Seq("long_enough_a0", "long_enough_a2"))
    }
    // second ingest, new pipeline run, same checkpoint: only the delta flows
    insertMixed(4, "b")
    runOnce()
    s.transaction { tx =>
      val got = tx.bucket("bk").schema("m").table("curated")
        .select(Seq("s")).collect().map(_.getString(0)).sorted
      assert(got.toSeq == Seq("long_enough_a0", "long_enough_a2",
        "long_enough_b0", "long_enough_b2"),
        s"delta run produced ${got.toSeq}")
    }
  }

  test("startingVersion=latest tails new commits without replaying history") {
    val root = Files.createTempDirectory("graft-stream-sv").toString
    val s = VastSession(spark, root)
    s.createBucket("bk")
    s.transaction(tx => tx.bucket("bk").createSchema("m").createTable("t", schema))
    insert(s, 5, "old") // history that must NOT replay
    val tdir = Paths.get(root, "bk", "m", "t").toString
    val ckpt = Files.createTempDirectory("graft-sv-ck").toString
    val out = Files.createTempDirectory("graft-sv-out").toString + "/sink"
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "latest").load(tdir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain() // nothing yet: stream tails from the current version
    assert(!Files.isDirectory(Paths.get(out)) ||
      spark.read.parquet(out).count() == 0)
    insert(s, 2, "new")
    drain() // checkpointed restart picks up only the tail
    assert(spark.read.parquet(out).select("s").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("new0", "new1"))
    // version history pairs with the feed: every commit visible with a stamp
    s.transaction { tx =>
      val h = tx.bucket("bk").schema("m").table("t").history()
        .orderBy("version").collect()
      assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
      assert(h.last.getLong(3) == 7L) // n_rows at current version
      assert(h.forall(!_.isNullAt(1)))
    }
  }

  test("column DDL mid-stream fails clearly; rename-evolved batch read rejected") {
    val root = Files.createTempDirectory("graft-stream-ddl").toString
    val s = VastSession(spark, root)
    s.createBucket("bk")
    s.transaction(tx => tx.bucket("bk").createSchema("m").createTable("t", schema))
    insert(s, 2, "x")
    val tdir = Paths.get(root, "bk", "m", "t").toString
    val ckpt = Files.createTempDirectory("graft-ddl-ck").toString
    val out = Files.createTempDirectory("graft-ddl-out").toString + "/sink"
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(tdir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    assert(spark.read.parquet(out).count() == 2)
    // a query whose schema was PINNED before the rename must fail clearly:
    // the post-rename insert's file carries the new physical name with no
    // rename map, and reading it against the pinned schema would silently
    // null the column. (A restarted stream re-infers the schema and is
    // fine — that path is covered by the resume tests.)
    val pinned = spark.readStream.format("graft").load(tdir) // schema (a, s)
    s.transaction(tx => tx.bucket("bk").schema("m").table("t")
      .renameColumn("s", "label"))
    s.transaction { tx =>
      val t = tx.bucket("bk").schema("m").table("t")
      t.insert(spark.createDataFrame(java.util.List.of(Row(9L, "nine")),
        StructType(Seq(StructField("a", LongType),
          StructField("label", StringType)))).coalesce(1))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val err = intercept[Exception] {
      val q = pinned.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    assert(messages(err).exists(m => m.contains("no longer exist") ||
      m.contains("rename")), s"wrong failure: ${messages(err).take(3)}")
    // batch read through the provider is rejected too (the SQL catalog's
    // rename-union path is the correct reader for evolved tables)
    val berr = intercept[Exception] {
      spark.read.format("graft").load(tdir).collect()
    }
    assert(messages(berr).exists(_.contains("rename")),
      s"wrong batch failure: ${messages(berr).take(3)}")
    // a too-high startingVersion is a hard error, not a silent 'latest'
    val verr = intercept[Exception] {
      spark.readStream.format("graft").option("startingVersion", "99")
        .load(tdir).writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sv99").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination(60000)
    }
    assert(messages(verr).exists(_.contains("beyond the table's current")),
      s"wrong startingVersion failure: ${messages(verr).take(3)}")
  }

  test("fuzz: random insert/drain interleavings deliver every row exactly once") {
    val rnd = new scala.util.Random(7)
    for (seed <- 0 until 3) {
      val root = Files.createTempDirectory(s"graft-fuzz$seed").toString
      val s = VastSession(spark, root)
      s.createBucket("bk")
      s.transaction(tx => tx.bucket("bk").createSchema("m").createTable("t", schema))
      val tdir = Paths.get(root, "bk", "m", "t").toString
      val ckpt = Files.createTempDirectory(s"graft-fuzz-ck$seed").toString
      val out = Files.createTempDirectory(s"graft-fuzz-out$seed").toString + "/sink"
      var expected = List.empty[String]
      var batch = 0
      def drain(): Unit = {
        val q = spark.readStream.format("graft").load(tdir)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000)
      }
      for (_ <- 0 until 8) {
        if (rnd.nextBoolean()) {
          val n = 1 + rnd.nextInt(3)
          s.transaction { tx =>
            val t = tx.bucket("bk").schema("m").table("t")
            val l = new java.util.ArrayList[Row]()
            (0 until n).foreach(i => l.add(Row(i.toLong, s"b$batch-$i")))
            t.insert(spark.createDataFrame(l, schema).coalesce(1))
          }
          expected = expected ++ (0 until n).map(i => s"b$batch-$i")
          batch += 1
        } else drain()
      }
      drain() // final catch-up
      val got = spark.read.parquet(out).select("s").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(got == expected.sorted,
        s"seed $seed: exactly-once violated\n got=$got\n want=${expected.sorted}")
    }
  }

  test("maxFilesPerTrigger paces a backlog across micro-batches") {
    val root = Files.createTempDirectory("graft-stream-rate").toString
    val s = VastSession(spark, root)
    s.createBucket("bk")
    s.transaction(tx => tx.bucket("bk").createSchema("m").createTable("t", schema))
    insert(s, 2, "a") // three committed versions, one file each
    insert(s, 2, "b")
    insert(s, 2, "c")
    val tdir = Paths.get(root, "bk", "m", "t").toString
    val ckpt = Files.createTempDirectory("graft-rate-ck").toString
    val out = Files.createTempDirectory("graft-rate-out").toString + "/sink"
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1").load(tdir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // everything arrives, but paced: one version per batch -> 3 batches
    assert(spark.read.parquet(out).count() == 6)
    val batches = new java.io.File(ckpt + "/offsets").list()
      .count(!_.startsWith("."))
    assert(batches == 3, s"expected 3 paced micro-batches, got $batches")
  }
}
