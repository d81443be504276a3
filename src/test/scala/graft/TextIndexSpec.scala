package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api._

/** Persisted full-text (inverted) index: postings are computed ONCE per
  * immutable data file and BM25 search reads postings instead of
  * re-tokenizing the corpus — the property that makes repeated retrieval
  * affordable at 100 TB. Coverage is file-granular (same machinery as the
  * dedup index); the scorer is shared with `TextAnalysis.bm25Search`, so
  * index-backed search must match raw-text search EXACTLY. */
class TextIndexSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Overlapping vocabulary so query terms hit many docs with varying tf. */
  private def doc(id: Long): String = {
    val words = Seq("spark", "query", "vector", "table", "scan", "merge")
    val picks = (0 until 8).map(j => words(((id + j) % words.size).toInt))
    (picks :+ s"unique$id").mkString(" ")
  }

  private def insertBatch(t: Table, ids: Seq[Long]): Unit = {
    val l = new java.util.ArrayList[Row]()
    ids.foreach(i => l.add(Row(i, doc(i))))
    t.insert(spark.createDataFrame(l, schema).coalesce(1))
  }

  private def partState(idxDir: Path): Map[String, Set[(String, Long, Long)]] =
    Table.listDir(idxDir)
      .filter(_.getFileName.toString.startsWith("__src="))
      .map { p =>
        p.getFileName.toString ->
          Table.walkPaths(p).filter(Files.isRegularFile(_)).map(f =>
            (f.getFileName.toString, Files.size(f),
              Files.getLastModifiedTime(f).toMillis)).toSet
      }.toMap

  private val terms = Seq("spark", "vector", "unique7")

  /** Raw-text BM25 over the live table, keyed by row id — the ground truth
    * the index path must reproduce bit-for-bit. */
  private def rawScores(t: Table): Seq[(Long, Double)] =
    graft.llm.TextAnalysis.bm25Search(
        t.select(Seq("text"), lit(true), internalRowId = true),
        "_row_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def idxScores(t: Table): Seq[(Long, Double)] =
    t.textSearch("text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("text index: build, exact scorer parity, delta refresh, DML orphans") {
    val root = Files.createTempDirectory("graft-fts").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("d", schema)
      insertBatch(t, 0L until 40L)
      insertBatch(t, 40L until 80L)
      t.createTextIndex("text")
    }
    var postDir: Path = null
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      val meta = t.manifest.dedupIndexes.find(_.kind == "fts").get
      postDir = Paths.get(root, "b", "m", "d").resolve(meta.dir)
        .resolve("postings")
      assert(partState(postDir).size == t.manifest.files.size)
      val raw = rawScores(t)
      assert(raw.nonEmpty && raw == idxScores(t),
        "index-backed BM25 must equal raw-text BM25 exactly")
    }
    val afterCreate = partState(postDir)

    // delta insert: correct BEFORE refresh (fresh on-the-fly postings for
    // the uncovered file), refresh persists only the delta
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      insertBatch(t, 80L until 120L)
      assert(rawScores(t) == idxScores(t), "pre-refresh parity (fresh union)")
      t.refreshTextIndex("text")
    }
    val afterDelta = partState(postDir)
    assert(afterDelta.size == afterCreate.size + 1)
    afterCreate.foreach { case (part, files) =>
      assert(afterDelta(part) == files,
        s"refresh rewrote already-covered partition $part")
    }

    // COW delete rewrites a file: refresh drops orphaned partitions and
    // covers the rewritten file; parity still exact
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      t.deleteWhere(col("doc_id") === 7L)
      t.refreshTextIndex("text")
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      val live = partState(postDir).keySet.map(_.stripPrefix("__src="))
      val current = t.manifest.files
        .map(f => f.path.substring(f.path.lastIndexOf('/') + 1)).toSet
      assert(live == current, "postings partitions must track live files")
      val raw = rawScores(t)
      assert(raw == idxScores(t), "post-DML parity")
      assert(!raw.exists(_._2.isNaN))
      // the deleted doc's unique term no longer matches anything
      assert(t.textSearch("text", Seq("unique7"), k = 5).count() == 0)
    }
  }

  test("text index survives a column rename (content-derived postings)") {
    val root = Files.createTempDirectory("graft-fts3").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("d", schema)
      insertBatch(t, 0L until 30L)
      t.createTextIndex("text")
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      val before = t.textSearch("text", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      t.renameColumn("text", "body")
      // the index follows the new logical name with no rebuild: postings
      // are content-derived, and the on-the-fly path reads through the
      // per-file rename maps
      val after = t.textSearch("body", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(after == before)
      intercept[Exception] { t.textSearch("text", terms, k = 10) }
      // delta insert under the NEW name still refreshes incrementally
      val l = new java.util.ArrayList[Row]()
      (100L until 110L).foreach(i => l.add(Row(i, doc(i))))
      t.insert(spark.createDataFrame(l, StructType(Seq(
        StructField("doc_id", LongType),
        StructField("body", StringType)))).coalesce(1))
      t.refreshTextIndex("body")
      assert(t.textSearch("body", Seq("unique105"), k = 5).count() == 1)
    }
  }

  test("textSearch pushes the term filter into the postings parquet scan") {
    val root = Files.createTempDirectory("graft-ftsplan").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("d", schema)
      insertBatch(t, 0L until 40L)
      t.createTextIndex("text")
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      val plan = t.textSearch("text", Seq("spark", "vector"), k = 5)
        .queryExecution.executedPlan.toString
      // the covered path must read the postings files (identified by their
      // (_row_id, w, tf) read schema — the location string truncates the
      // dir name) with the term IN-filter PUSHED for row-group skipping,
      // never re-tokenizing text
      assert(plan.contains("ReadSchema: struct<_row_id:bigint,w:string,tf:bigint>"),
        s"no postings scan in:\n$plan")
      assert("PushedFilters: \\[In\\(w, \\[spark,vector\\]\\)".r
        .findFirstIn(plan).isDefined,
        s"term filter not pushed into the postings scan:\n$plan")
    }
  }

  test("fuzz: random DML churn keeps index-backed search equal to raw") {
    val root = Files.createTempDirectory("graft-ftsfuzz").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("d", schema)
      insertBatch(t, 0L until 30L)
      t.createTextIndex("text")
    }
    val rnd = new scala.util.Random(53)
    var nextId = 1000L
    (1 to 12).foreach { step =>
      s.transaction { tx =>
        val t = tx.bucket("b").schema("m").table("d")
        rnd.nextInt(4) match {
          case 0 => // insert a fresh batch
            insertBatch(t, nextId until nextId + 5); nextId += 5
          case 1 => // COW delete of a random band
            val lo = rnd.nextInt(30).toLong
            t.deleteWhere(col("doc_id").between(lo, lo + 3))
          case 2 => // COW update rewrites text under a live index
            val v = rnd.nextInt(30).toLong
            t.updateWhere(col("doc_id") === v,
              Map("text" -> concat(col("text"), lit(s" extra$step"))))
          case 3 =>
            t.refreshTextIndex("text")
        }
        val raw = rawScores(t)
        assert(raw == idxScores(t),
          s"step $step: index-backed BM25 diverged from raw text")
      }
    }
    // converge: refresh and confirm coverage tracks the live file set
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      t.refreshTextIndex("text")
      assert(rawScores(t) == idxScores(t))
    }
  }

  test("text index coexists with a dedup index on the same column") {
    val root = Files.createTempDirectory("graft-fts2").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("d", schema)
      insertBatch(t, 0L until 30L)
      t.createDedupIndex("text")
      t.createTextIndex("text")
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      assert(t.manifest.dedupIndexes.map(_.kind).sorted == Seq("fts", "text"))
      // both entry points serve from their own layout
      assert(t.textSearch("text", terms, k = 5).count() > 0)
      t.dedupMinhashPairs("text").count() // must not throw / mix layouts
      // re-creating the text index replaces ONLY the fts meta
      t.createTextIndex("text")
      assert(t.manifest.dedupIndexes.map(_.kind).sorted == Seq("fts", "text"))
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      assert(rawScores(t) == idxScores(t))
    }
  }
}
