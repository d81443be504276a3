package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api._

/** Persisted dedup-signature index: signatures are computed ONCE per
  * immutable data file and reused across dedup runs — the property that
  * makes incremental corpus dedup viable at 100 TB (recomputing minhash over
  * the whole corpus per run is the anti-pattern this index exists to kill).
  * Coverage is file-granular: refresh computes only uncovered files and
  * drops partitions orphaned by COW rewrites. */
class DedupIndexSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** ≥ shingleN tokens, unique per id unless planted as a duplicate. */
  private def doc(id: Long): String =
    s"document number $id carries its own distinct words w${id}a w${id}b w${id}c"

  private def insertBatch(t: Table, ids: Seq[(Long, String)]): Unit = {
    val l = new java.util.ArrayList[Row]()
    ids.foreach { case (i, txt) => l.add(Row(i, txt)) }
    t.insert(spark.createDataFrame(l, schema).coalesce(1))
  }

  /** Snapshot of every part file under the index dir: partition -> files
    * with sizes and mtimes. Byte-stable across a refresh ⇔ untouched. */
  private def partState(idxDir: Path): Map[String, Set[(String, Long, Long)]] =
    Table.listDir(idxDir)
      .filter(_.getFileName.toString.startsWith("__src="))
      .map { p =>
        p.getFileName.toString ->
          Table.walkPaths(p).filter(Files.isRegularFile(_)).map(f =>
            (f.getFileName.toString, Files.size(f),
              Files.getLastModifiedTime(f).toMillis)).toSet
      }.toMap

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("emb", ArrayType(FloatType, containsNull = false))))

  /** Deterministic 8-dim vector, unique well-separated direction per id
    * (seeded random, signed components — arithmetic patterns would make
    * many distinct ids near-parallel and drown the planted pair). */
  private def vec(id: Long): Seq[Float] = {
    val rnd = new scala.util.Random(id * 7919 + 13)
    (0 until 8).map(_ => rnd.nextFloat() * 2 - 1)
  }

  private def insertVecs(t: Table, ids: Seq[(Long, Seq[Float])]): Unit = {
    val l = new java.util.ArrayList[Row]()
    ids.foreach { case (i, v) => l.add(Row(i, v)) }
    t.insert(spark.createDataFrame(l, embSchema).coalesce(1))
  }

  test("embedding LSH index: persisted signatures, delta-only refresh") {
    val root = Files.createTempDirectory("graft-vidx").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    // 2 single-file batches; rows 3 and 120 share one vector (cross-file dup)
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("e", embSchema)
      insertVecs(t, (0L until 100L).map(i => (i, vec(i))))
      insertVecs(t, (100L until 200L).map(i =>
        (i, if (i == 120L) vec(3) else vec(i))))
      t.createEmbeddingDedupIndex("emb", dim = 8, planes = 12, tables = 4)
    }
    var idxDir: Path = null
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      val meta = t.manifest.dedupIndexes.head
      assert(meta.kind == "vector" && meta.dim == 8)
      idxDir = Paths.get(root, "b", "m", "e").resolve(meta.dir)
      assert(partState(idxDir).size == t.manifest.files.size)
      // identical vectors collide in every LSH table → deterministic pair
      assert(pairSet(t.dedupEmbeddingPairs("emb", 0.999)) == Set((3L, 120L)))
    }
    val afterCreate = partState(idxDir)
    assert(afterCreate.size == 2)

    // delta insert: current BEFORE refresh (on-the-fly signatures for the
    // uncovered file), and refresh persists ONLY the delta
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      insertVecs(t, (200L until 250L).map(i =>
        (i, if (i == 230L) vec(7) else vec(i))))
      assert(pairSet(t.dedupEmbeddingPairs("emb", 0.999)) ==
        Set((3L, 120L), (7L, 230L)))
      t.refreshDedupIndex("emb")
    }
    val afterDelta = partState(idxDir)
    assert(afterDelta.size == 3, s"want 3 partitions, got ${afterDelta.size}")
    afterCreate.foreach { case (part, files) =>
      assert(afterDelta(part) == files,
        s"refresh rewrote already-covered partition $part")
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      assert(pairSet(t.dedupEmbeddingPairs("emb", 0.999)) ==
        Set((3L, 120L), (7L, 230L)))
      // text-index entry points reject a vector index cleanly
      intercept[Exception] { t.dedupMinhashPairs("emb").collect() }
      // ingest probe, vector twin: an incoming copy of vec(7) attributes
      // to corpus row 7's and 230's row ids; a fresh vector matches nothing
      import spark.implicits._
      val hits = t.probeNearDups("emb",
          Seq((900L, vec(7)), (901L, vec(9999))).toDF("id", "emb"), "id",
          threshold = 0.999)
        .select("q_id", "similarity").collect()
      assert(hits.nonEmpty && hits.forall(r =>
        r.getLong(0) == 900L && r.getDouble(1) >= 0.999), hits.mkString(","))
    }
  }

  test("span index: persisted window hashes, ingest probe, delta refresh") {
    val root = Files.createTempDirectory("graft-sidx").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    val span = "alpha beta gamma delta epsilon"  // 5 tokens, spanTokens=4
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("d", schema)
      insertBatch(t, (0L until 50L).map(i =>
        (i, if (i == 7L) s"$span tail${i}" else doc(i))))
      insertBatch(t, (50L until 100L).map(i => (i, doc(i))))
      t.createSpanIndex("text", spanTokens = 4, stride = 1)
    }

    var idxDir: Path = null
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      val meta = t.manifest.dedupIndexes.find(_.kind == "span").get
      idxDir = Paths.get(root, "b", "m", "d").resolve(meta.dir)
      assert(partState(idxDir).size == t.manifest.files.size)
      // probe: an incoming doc CONTAINING the corpus span reports its
      // covered tokens; a clean doc reports 0; windows never cross the
      // probe rows
      val incoming = spark.createDataFrame(java.util.List.of(
        Row(901L, s"prefix $span suffix word"),
        Row(902L, "totally novel incoming text right here")), schema)
      val probe = t.probeDupSpans("text", incoming, "doc_id")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      // "prefix alpha beta gamma delta epsilon suffix word": the 5 span
      // tokens sit under corpus windows (alpha..delta, beta..epsilon)
      assert(probe(901L) == ((8L, 5L, 0.625)), s"got ${probe(901L)}")
      assert(probe(902L) == ((6L, 0L, 0.0)))
    }
    val afterCreate = partState(idxDir)
    assert(afterCreate.size == 2)

    // delta insert carrying the span: probe sees it BEFORE refresh (on-the-
    // fly hash of the uncovered file); refresh persists only the delta
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      insertBatch(t, Seq((100L, s"another copy $span lives here")))
      val probe = t.probeDupSpans("text",
        spark.createDataFrame(java.util.List.of(
          Row(903L, s"copy $span lives here too")), schema), "doc_id")
        .head()
      assert(probe.getLong(2) > 0L, "pre-refresh freshness")
      t.refreshDedupIndex("text")
    }
    val afterDelta = partState(idxDir)
    assert(afterDelta.size == 3)
    afterCreate.foreach { case (part, files) =>
      assert(afterDelta(part) == files,
        s"refresh rewrote already-covered partition $part")
    }

    // a text (minhash) index coexists on the same column and still serves
    // its own kind — neither shadows the other
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      t.createDedupIndex("text", k = 64, bands = 16)
      assert(pairSet(t.dedupMinhashPairs("text")).isEmpty)
      assert(t.probeDupSpans("text", spark.createDataFrame(
        java.util.List.of(Row(904L, s"x $span y")), schema), "doc_id")
        .head().getLong(2) == 5L)
    }

    // a file whose every row is shorter than spanTokens still gets a
    // coverage partition (sentinel row): a second refresh must be a no-op
    // — without the sentinel the file would re-run the build job forever
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      insertBatch(t, Seq((200L, "tiny"), (201L, "also tiny")))
      t.refreshDedupIndex("text")
    }
    val afterShort = partState(idxDir)
    assert(afterShort.size == afterDelta.size + 1,
      "zero-window file must still be covered")
    s.transaction { tx =>
      tx.bucket("b").schema("m").table("d").refreshDedupIndex("text")
    }
    assert(partState(idxDir) == afterShort,
      "second refresh must not rewrite any partition")
    // null-safe probe contract: null text reports (0, 0, 0.0)
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      val p = t.probeDupSpans("text", spark.createDataFrame(
        java.util.List.of(Row(905L, null)), schema), "doc_id").head()
      assert(p.getLong(1) == 0L && p.getLong(2) == 0L && p.getDouble(3) == 0.0)
    }

    // offline index-backed dedup equals the recompute-everything operator
    // (keyed by $row_id on both sides) — the covered files' window pass
    // reads the index instead of re-hashing
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      // plant a second copy of the span so the cut path is non-trivial
      insertBatch(t, Seq((300L, s"trailing copy of $span here")))
      val fromIndex = t.dedupSpans("text")
        .select(col("_row_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val recompute = graft.llm.Dedup.dedupSpansKeepFirst(
          t.select(Nil, internalRowId = true), "_row_id", "text",
          spanTokens = 4)
        .select(col("_row_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(fromIndex == recompute, "index-backed dedup must equal recompute")
      assert(fromIndex.values.count(_.contains(span)) == 1,
        "exactly one copy of the planted span survives")
    }
  }

  test("span index churn soak: probe always equals a from-scratch recompute") {
    // DmlFuzzSpec-style interleaving over the SPAN index lifecycle: a
    // seeded sequence of insert / update-by-rowid / delete-by-rowid ×
    // refresh, and after EVERY step probeDupSpans (covered files read
    // persisted windows, uncovered hash on the fly) must equal a probe
    // against windows recomputed from scratch over the current table —
    // the index is an optimization, never a semantic input
    import graft.types.TypeMapping.RowIdColumn
    val root = Files.createTempDirectory("graft-schurn").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    val spanA = "alpha beta gamma delta epsilon"
    val spanB = "zeta eta theta iota kappa"
    val k = 4
    val rnd = new scala.util.Random(7771)
    val incoming = spark.createDataFrame(java.util.List.of(
      Row(900L, s"carrier of $spanA today"),
      Row(901L, s"other text with $spanB inside"),
      Row(902L, "wholly original incoming words w900x w900y w900z")), schema)
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("d", schema)
      insertBatch(t, (0L until 30L).map(i =>
        (i, if (i == 3L) s"corpus seed $spanA here" else doc(i))))
      t.createSpanIndex("text", spanTokens = k, stride = 1)
    }
    var nextId = 30L
    var sawSpanBInsert = false
    for (step <- 1 to 12) {
      s.transaction { tx =>
        val t = tx.bucket("b").schema("m").table("d")
        rnd.nextInt(4) match {
          case 0 =>
            val n = rnd.nextInt(3) + 1
            insertBatch(t, (0 until n).map { j =>
              val id = nextId + j
              (id, rnd.nextInt(3) match {
                case 0 => s"inserted copy $spanA here t$id"
                case 1 => sawSpanBInsert = true; s"$spanB inserted t$id"
                case _ => doc(id)
              })
            })
            nextId += n
          case 1 =>
            val ids = t.select(Nil, internalRowId = true)
              .select(RowIdColumn).collect().map(_.getLong(0)).toSeq
            val pick = rnd.shuffle(ids).take(rnd.nextInt(2) + 1)
            val l = new java.util.ArrayList[Row]()
            pick.foreach(id => l.add(Row(id,
              if (rnd.nextBoolean()) s"updated now holds $spanA u$id"
              else s"updated clean text u$id unique words")))
            t.update(spark.createDataFrame(l, StructType(Seq(
              StructField(RowIdColumn, LongType),
              StructField("text", StringType)))))
          case 2 =>
            val ids = t.select(Nil, internalRowId = true)
              .select(RowIdColumn).collect().map(_.getLong(0)).toSeq
            val pick = rnd.shuffle(ids).take(rnd.nextInt(2) + 1)
            val l = new java.util.ArrayList[Row]()
            pick.foreach(id => l.add(Row(id)))
            t.delete(spark.createDataFrame(l, StructType(Seq(
              StructField(RowIdColumn, LongType)))))
          case 3 => t.refreshDedupIndex("text")
        }
      }
      s.transaction { tx =>
        val t = tx.bucket("b").schema("m").table("d")
        val got = t.probeDupSpans("text", incoming, "doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSet
        val scratch = t.select()
          .select(posexplode(graft.functions.TextHashes.windowHashPairs(
            split(col("text"), " "), k, 1)).as(Seq("_w", "_hp")))
          .select(col("_hp.h1").as("h1"), col("_hp.h2").as("h2"))
        val want = graft.llm.Dedup.spanProbeStats(incoming, "doc_id",
            "text", scratch, k, 1).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSet
        assert(got == want, s"step $step: index probe diverged from scratch")
        // the clean probe row never reports coverage
        assert(got.exists(r => r._1 == 902L && r._3 == 0L))
      }
    }
    assert(nextId > 30L && sawSpanBInsert,
      "seeded sequence must actually exercise inserts incl. a spanB copy")
  }

  test("incremental refresh: delta-only recompute, DML orphan cleanup") {
    val root = Files.createTempDirectory("graft-didx").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    // 3 single-file batches; ids 0 and 101 share one text (cross-file dup)
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("d", schema)
      insertBatch(t, (0L until 100L).map(i => (i, doc(i))))
      insertBatch(t, (100L until 200L).map(i =>
        (i, if (i == 101L) doc(0) else doc(i))))
      insertBatch(t, (200L until 300L).map(i => (i, doc(i))))
      t.createDedupIndex("text", k = 64, bands = 16)
    }

    var idxDir: Path = null
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      val meta = t.manifest.dedupIndexes.head
      idxDir = Paths.get(root, "b", "m", "d").resolve(meta.dir)
      assert(meta.column == "text")
      // one signature partition per data file, fully covered at create
      assert(partState(idxDir).size == t.manifest.files.size)
      assert(pairSet(t.dedupMinhashPairs("text")) == Set((0L, 101L)))
      assert(pairSet(t.dedupSimhashPairs("text")).contains((0L, 101L)))
    }
    val afterCreate = partState(idxDir)
    assert(afterCreate.size == 3)

    // delta insert: pairs are current BEFORE any refresh (on-the-fly union
    // for the uncovered file), and refresh then persists ONLY the delta —
    // the three existing partitions stay byte-identical
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      insertBatch(t, (300L until 350L).map(i =>
        (i, if (i == 307L) doc(42) else doc(i))))
      assert(pairSet(t.dedupMinhashPairs("text")) ==
        Set((0L, 101L), (42L, 307L)))
      t.refreshDedupIndex("text")
    }
    val afterDelta = partState(idxDir)
    assert(afterDelta.size == 4, s"want 4 partitions, got ${afterDelta.size}")
    afterCreate.foreach { case (part, files) =>
      assert(afterDelta(part) == files,
        s"refresh rewrote already-covered partition $part")
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      assert(pairSet(t.dedupMinhashPairs("text")) ==
        Set((0L, 101L), (42L, 307L)))
    }

    // COW delete of id 101 rewrites exactly the file holding it: refresh
    // drops that file's orphaned partition, computes one new one, and the
    // other covered partitions are again untouched
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      t.delete(t.select(Seq("doc_id"), col("doc_id") === 101L,
        internalRowId = true).select("_row_id"))
      // pre-refresh correctness over the mixed persisted/orphaned state
      assert(pairSet(t.dedupMinhashPairs("text")) == Set((42L, 307L)))
      t.refreshDedupIndex("text")
    }
    val afterDelete = partState(idxDir)
    assert(afterDelete.size == 4)
    val untouched = afterDelta.keySet.intersect(afterDelete.keySet)
    assert(untouched.size == 3, "exactly one partition should be replaced")
    untouched.foreach(p => assert(afterDelta(p) == afterDelete(p)))
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      assert(pairSet(t.dedupMinhashPairs("text")) == Set((42L, 307L)))
      assert(t.select().count() == 349)
      // maintain() compacts small files AND refreshes the index in one pass:
      // the index follows the (new, compacted) file set and stays correct
      t.maintain()
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("d")
      assert(partState(idxDir).keySet ==
        t.manifest.files.map(f => "__src=" +
          f.path.substring(f.path.lastIndexOf('/') + 1)).toSet)
      assert(pairSet(t.dedupMinhashPairs("text")) == Set((42L, 307L)))
    }
  }
}
