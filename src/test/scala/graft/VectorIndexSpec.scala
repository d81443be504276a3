package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api._
import graft.types.TypeMapping.RowIdColumn

/** Index-backed vector search: createVectorIndex builds a persisted IVF
  * structure, vectorSearch routes through it with static cell pruning,
  * full-probe equals exact brute force, predicates compose, and DML stales
  * the index (exact fallback) until refreshVectorIndex. */
class VectorIndexSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def exactTopK(t: Table, qvec: Seq[Float], k: Int,
                        pred: org.apache.spark.sql.Column = lit(true)): Seq[Long] =
    t.select(Nil, pred, internalRowId = true)
      .withColumn("_d", graft.functions.Distances.l2sq(col("embedding"),
        lit(qvec.toArray).cast("array<float>")))
      .orderBy(col("_d").asc, col(RowIdColumn).asc)
      .limit(k).select("vec_id").collect().map(_.getLong(0)).toSeq

  test("IVF-routed search: cell-pruned plan, exact at full probe, stale-safe") {
    val root = Files.createTempDirectory("graft-vidx").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("e", schema)
      t.insert(emb)
      t.createVectorIndex("embedding", "l2sq", nCentroids = 16, refineIters = 1)
    }
    val qvec: Seq[Float] =
      emb.filter(col("vec_id") === 0).collect().head.getSeq[Float](1)

    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      val exact = exactTopK(t, qvec, 10)
      // probing every cell must reproduce the exact result
      val full = t.vectorSearch("embedding", qvec, k = 10, nprobe = 16)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(full == exact, s"full-probe IVF != exact: $full vs $exact")
      // nprobe=4: the query's own vector (distance 0, same cell) must lead
      val ivf4 = t.vectorSearch("embedding", qvec, k = 10, nprobe = 4)
      val got4 = ivf4.select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got4.head == 0L && got4.size == 10)
      // the assignment scan is STATICALLY partition-pruned to probed cells
      // (asserted on the lazy top-k builder: vectorSearch itself runs it
      // eagerly so the row fetch can prune base files by the winners)
      val plan = t.ivfTopK("embedding", qvec, 10, lit(true), nprobe = 4)
        .get.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
        s"no static cell pruning in plan:\n$plan")
      // predicate composes (filtered search semantics: predicate BEFORE top-k)
      val pred = col("vec_id") >= 100
      val predGot = t.vectorSearch("embedding", qvec, 5, pred, nprobe = 16)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(predGot == exactTopK(t, qvec, 5, pred))
      assert(predGot.forall(_ >= 100))
    }

    // DML stales the index: search falls back to exact brute force (sees the
    // new row); refresh re-routes through a rebuilt index
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      val dup = new java.util.ArrayList[Row]()
      dup.add(Row(9999L, qvec))
      t.insert(spark.createDataFrame(dup, schema))
      assert(t.manifest.vectorIndexes.forall(_.stale))
      val top2 = t.vectorSearch("embedding", qvec, 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(top2 == Set(0L, 9999L), s"stale fallback missed new row: $top2")
      t.refreshVectorIndex("embedding")
      assert(t.manifest.vectorIndexes.forall(x => !x.stale && x.dir.nonEmpty))
      val top2b = t.vectorSearch("embedding", qvec, 2, nprobe = 16)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(top2b == Set(0L, 9999L))
    }

    // maintain() rebuilds everything stale in one pass under one commit
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      t.createProjection("pv", Seq("vec_id"), Seq("vec_id"))
      val extra = new java.util.ArrayList[Row]()
      extra.add(Row(10000L, qvec))
      t.insert(spark.createDataFrame(extra, schema)) // stales proj + index
      assert(t.manifest.projections.forall(_.stale))
      assert(t.manifest.vectorIndexes.forall(_.stale))
      t.maintain()
      assert(t.manifest.projections.forall(!_.stale))
      assert(t.manifest.vectorIndexes.forall(x => !x.stale && x.dir.nonEmpty))
      val top3 = t.vectorSearch("embedding", qvec, 3, nprobe = 16)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(top3 == Set(0L, 9999L, 10000L))
    }

    // renaming the indexed column moves the metadata to the new name but
    // stales the index (its data files carry the old physical name); search
    // under the new name stays correct via brute force until refresh
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      t.renameColumn("embedding", "vec")
      val meta = t.manifest.vectorIndexes.head
      assert(meta.column == "vec" && meta.stale)
      val top = t.vectorSearch("vec", qvec, 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(top == Set(0L, 9999L))
      t.refreshVectorIndex("vec")
      val topIdx = t.vectorSearch("vec", qvec, 2, nprobe = 16)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(topIdx == Set(0L, 9999L))
    }
  }

  test("refreshVectorIndex is file-granular: delta assigned, old cells untouched") {
    val root = Files.createTempDirectory("graft-vinc").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("e", schema)
      for (b <- 0 until 3) {
        val l = new java.util.ArrayList[Row]()
        for (i <- 0 until 40)
          l.add(Row((b * 40 + i).toLong, Seq((b * 100 + i).toFloat, 1f)))
        t.insert(spark.createDataFrame(l, schema).coalesce(1))
      }
      t.createVectorIndex("embedding", "l2sq", nCentroids = 4, refineIters = 1)
    }
    // snapshot the persisted assignment partitions (path -> mtime)
    def assignedParts(): Map[String, Long] = {
      var idxDir = ""
      s.transaction { tx =>
        idxDir = tx.bucket("b").schema("m").table("e").manifest
          .vectorIndexes.head.dir
      }
      val base = java.nio.file.Paths.get(root, "b", "m", "e", idxDir, "assigned")
      Table.walkPaths(base).filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    }
    val before = assignedParts()
    assert(before.nonEmpty)
    // insert a delta batch, refresh: index dir unchanged (no re-cluster),
    // the pre-existing assignment files byte-identical, a new __src added
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      val metaBefore = t.manifest.vectorIndexes.head
      val l = new java.util.ArrayList[Row]()
      for (i <- 0 until 20) l.add(Row((1000 + i).toLong, Seq(50f + i, 1f)))
      t.insert(spark.createDataFrame(l, schema).coalesce(1))
      assert(t.manifest.vectorIndexes.head.stale)
      t.refreshVectorIndex("embedding")
      val metaAfter = t.manifest.vectorIndexes.head
      assert(!metaAfter.stale)
      assert(metaAfter.dir == metaBefore.dir, "incremental refresh must not re-cluster")
      // search sees the delta rows through the refreshed index
      val top = t.vectorSearch("embedding", Seq(55f, 1f), k = 3, nprobe = 4)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(top.contains(1005L), s"delta row missing from indexed search: $top")
    }
    val after = assignedParts()
    before.foreach { case (p, mt) =>
      assert(after.get(p).contains(mt), s"pre-existing assignment rewritten: $p")
    }
    assert(after.size > before.size, "no delta partitions were added")
  }

  test("indexed search fetches full rows from winner files only") {
    val root = Files.createTempDirectory("graft-vfetch").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("e", schema)
      // 10 single-file batches, each a tight 1-D cluster far from the others
      for (b <- 0 until 10) {
        val l = new java.util.ArrayList[Row]()
        for (i <- 0 until 50)
          l.add(Row((b * 50 + i).toLong, Seq((b * 1000 + i).toFloat, 0f)))
        t.insert(spark.createDataFrame(l, schema).coalesce(1))
      }
      t.createVectorIndex("embedding", "l2sq", nCentroids = 10, refineIters = 2)
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      val nFiles = t.manifest.files.size
      assert(nFiles >= 10)
      val res = t.vectorSearch("embedding", Seq(0f, 0f), k = 5, nprobe = 10)
      assert(res.select("vec_id").collect().map(_.getLong(0)).toSeq ==
        (0L until 5L))
      // all 5 winners live in the first batch's file: the row fetch must
      // scan only the files whose row-id range contains a winner — never
      // the whole base table (the 100 TB margin this path exists for)
      val scanned = res.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }.sum
      assert(scanned == 1,
        s"fetch stage scanned $scanned of $nFiles files, want 1")
    }
  }
}
