package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api._

/** Persisted product-quantization index: the codebook trains ONCE at
  * create, codes are encoded per immutable data file and reused across
  * searches — at corpus scale the ADC pass reads 16-byte code rows, never
  * vectors, and refresh encodes only the delta against the frozen
  * codebook. */
class PqIndexSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("emb", ArrayType(FloatType, containsNull = false))))

  /** Clustered vectors: cluster c centered on axis c*2, wide noise. */
  private def vec(id: Long): Seq[Float] = {
    val rnd = new scala.util.Random(id * 7919 + 29)
    val c = (id % 8).toInt
    (0 until 16).map(j =>
      (if (j == c * 2) 10f else 0f) + rnd.nextFloat() * 2f - 1f)
  }

  private def insertVecs(t: Table, ids: Seq[(Long, Seq[Float])]): Unit = {
    val l = new java.util.ArrayList[Row]()
    ids.foreach { case (i, v) => l.add(Row(i, v)) }
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

  test("pq index: planted twin at rank 1, delta-only refresh, frozen codebook") {
    val root = Files.createTempDirectory("graft-pqidx").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("e", schema)
      insertVecs(t, (0L until 120L).map(i => (i, vec(i))))
      t.createPqIndex("emb", dim = 16, m = 4, k = 16)
    }
    var codesDir: Path = null
    var cbState: Set[(String, Long, Long)] = null
    def cbFiles(base: Path): Set[(String, Long, Long)] =
      Table.walkPaths(base.resolve("codebook"))
        .filter(Files.isRegularFile(_)).map(f =>
          (f.getFileName.toString, Files.size(f),
            Files.getLastModifiedTime(f).toMillis)).toSet
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      val meta = t.manifest.dedupIndexes.find(_.kind == "pq").get
      assert(meta.dim == 16 && meta.bands == 4 && meta.k == 16)
      val base = Paths.get(root, "b", "m", "e").resolve(meta.dir)
      codesDir = base.resolve("codes")
      cbState = cbFiles(base)
      assert(partState(codesDir).size == t.manifest.files.size)
      // a planted twin of row 7's vector must rank 1 for that query
      val top = t.vectorSearchPq("emb", vec(7), k = 3)
        .filter(col("knn_rank") === 1).head()
      // (query excludes nothing here: -1 query id never equals a row id,
      // and row 7 itself IS the nearest corpus row to its own vector)
      assert(top.getLong(0) == 7L, s"nearest to vec(7) was ${top.getLong(0)}")
    }
    val afterCreate = partState(codesDir)

    // search returns $row_id; hydrate back to vec_id through the table
    def topVecIds(t: Table, k: Int): Set[Long] =
      t.vectorSearchPq("emb", vec(7), k)
        .join(t.select(Seq("vec_id"), internalRowId = true), Seq("_row_id"))
        .collect().map(_.getAs[Long]("vec_id")).toSet

    // insert an EXACT copy of row 7 (new file), no refresh: the on-the-fly
    // path must encode the delta and the copy ties its twin at ADC-minimum,
    // reranking to distance 0
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      insertVecs(t, Seq((7000L, vec(7))))
      val ids = topVecIds(t, 2)
      assert(ids == Set(7L, 7000L), s"got $ids")
      t.refreshPqIndex("emb")
    }
    val afterDelta = partState(codesDir)
    assert(afterDelta.size == afterCreate.size + 1)
    afterCreate.foreach { case (part, files) =>
      assert(afterDelta(part) == files,
        s"refresh rewrote already-covered partition $part")
    }
    s.transaction { tx =>
      val t = tx.bucket("b").schema("m").table("e")
      val meta = t.manifest.dedupIndexes.find(_.kind == "pq").get
      val base = Paths.get(root, "b", "m", "e").resolve(meta.dir)
      assert(cbFiles(base) == cbState, "refresh must not retrain the codebook")
      assert(topVecIds(t, 2) == Set(7L, 7000L))
      // COW delete of the twin drops it from results after refresh
      t.deleteWhere(col("vec_id") === 7000L)
      t.refreshPqIndex("emb")
      val after = topVecIds(t, 2)
      assert(!after.contains(7000L))
      assert(after.contains(7L))
    }

    // SQL surface: CALL pq_search returns the same ids as the API
    spark.conf.set("spark.sql.catalog.graftpq",
      "org.apache.spark.sql.graftglue.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graftpq.root", root)
    val qv = vec(7).mkString(",")
    val sqlIds = spark.sql(
      s"CALL graftpq.system.pq_search('b.m.e', 'emb', '$qv', 3)")
      .collect().map(_.getLong(0)).toSeq
    val apiIds = s.transaction(tx =>
      tx.bucket("b").schema("m").table("e")
        .vectorSearchPq("emb", vec(7), 3)
        .collect().map(_.getLong(0)).toSeq)
    assert(sqlIds == apiIds, s"SQL $sqlIds != API $apiIds")
    intercept[Exception] { spark.sql(
      s"CALL graftpq.system.pq_search('b.m.e', 'emb', '$qv', 0)").collect() }
  }

  test("fuzz: DML churn keeps PQ search equal to a from-scratch encode") {
    val root = Files.createTempDirectory("graft-pqfuzz").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("e", schema)
      insertVecs(t, (0L until 100L).map(i => (i, vec(i))))
      t.createPqIndex("emb", dim = 16, m = 4, k = 16)
    }
    val rnd = new scala.util.Random(61)
    var nextId = 2000L
    def reference(t: Table): Seq[(Long, Int)] = {
      // ground truth: encode the CURRENT rows against the index's frozen
      // codebook and search directly through Quantization
      val meta = t.manifest.dedupIndexes.find(_.kind == "pq").get
      val cb = spark.read.parquet(Paths.get(root, "b", "m", "e")
        .resolve(meta.dir).resolve("codebook").toString)
      val cur = t.select(Seq("emb"), internalRowId = true)
        .select(col("_row_id"), col("emb"))
      val enc = graft.llm.Quantization.pqEncode(cur, "_row_id", "emb", cb,
        dim = 16, m = 4)
      val q = spark.createDataFrame(java.util.List.of(
        Row(-1L, vec(7))), StructType(Seq(
          StructField("_row_id", LongType, nullable = false),
          StructField("emb", ArrayType(FloatType)))))
      graft.llm.Quantization.pqSearch(enc, cur, q, cb, "_row_id", "emb",
          dim = 16, m = 4, k = 5, shortlist = 40)
        .collect().map(r => (r.getLong(2), r.getInt(1))).toSeq
    }
    (1 to 8).foreach { step =>
      s.transaction { tx =>
        val t = tx.bucket("b").schema("m").table("e")
        rnd.nextInt(3) match {
          case 0 => insertVecs(t, (nextId until nextId + 4)
            .map(i => (i, vec(i)))); nextId += 4
          case 1 =>
            val lo = rnd.nextInt(100).toLong
            t.deleteWhere(col("vec_id").between(lo, lo + 2))
          case 2 => t.refreshPqIndex("emb")
        }
        val got = t.vectorSearchPq("emb", vec(7), k = 5, shortlist = 40)
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
        assert(got == reference(t),
          s"step $step: index-backed PQ search diverged from reference")
      }
    }
  }

  test("pq/ivf winner elections plan as HashAggregate (packed key, no struct sort)") {
    import org.apache.spark.sql.functions._
    // r14: min(struct(d, code)) buffered a struct and planned as
    // SortAggregate — every task sorted its rows*k candidates before the
    // partial aggregate. The packed bits(d)*2^31+code DECIMAL key keeps the
    // election hash-based; parity with the struct ordering is the
    // DoubleSortBits contract (non-negative squared distances).
    val vecs = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cb = graft.llm.Quantization.pqTrain(vecs, "vec_id", "embedding",
      dim = 64, m = 8, k = 4, iters = 1)
    val encPlan = graft.llm.Quantization.pqEncode(vecs, "vec_id", "embedding",
      cb, dim = 64, m = 8).queryExecution.executedPlan.toString
    assert(!encPlan.contains("SortAggregate"), encPlan)
    val (_, assigned) = graft.llm.Similarity.ivfIndex(vecs, "vec_id",
      "embedding", nCentroids = 4)
    assert(!assigned.queryExecution.executedPlan.toString
      .contains("SortAggregate"), "ivfAssign regressed to SortAggregate")
  }
}
