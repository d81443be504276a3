package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 curation surface: deterministic shard export, temperature
  * domain mixing, corpus-wide keep-first line dedup, and the distributed
  * logistic-regression quality classifier. */
class TrainingExportSpec extends SparkSpec {
  import graft.llm.{Classifier, Curation, Dedup, TextAnalysis}

  private def docs(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"src${i % 7}")).toDF("id", "domain")
  }

  // ---- scalableRank ----

  test("scalableRank equals the naive global row_number on adversarial layouts") {
    val d = docs(3000)
      .withColumn("_k", md5(concat_ws(":", lit("s"), col("id"))))
      .repartition(13) // layout the rank must be independent of
    val ranked = Curation.scalableRank(d, Seq.empty, "_k", "id", hexPrefix = 2)
    val naive = d.withColumn("_naive",
      row_number().over(Window.orderBy(col("_k").asc, col("id").asc))
        .cast("long") - 1L)
    val joined = ranked.join(naive.select("id", "_naive"), "id")
    assert(joined.filter(col("_rank") =!= col("_naive")).count() === 0)
  }

  test("scalableRank partitioned: independent 0-based ranks per group") {
    val d = docs(2000)
      .withColumn("_k", md5(concat_ws(":", lit("x"), col("id"))))
    val ranked = Curation.scalableRank(d, Seq("domain"), "_k", "id")
    val naive = d.withColumn("_naive",
      row_number().over(Window.partitionBy("domain")
        .orderBy(col("_k").asc, col("id").asc)).cast("long") - 1L)
    assert(ranked.join(naive.select("id", "_naive"), "id")
      .filter(col("_rank") =!= col("_naive")).count() === 0)
  }

  test("scalableRank physical plan has no corpus-wide window partition") {
    val d = docs(100)
      .withColumn("_k", md5(concat_ws(":", lit("s"), col("id"))))
    val plan = Curation.scalableRank(d, Seq.empty, "_k", "id")
      .queryExecution.executedPlan.toString
    // every Window node must carry a non-empty partition spec: the data
    // window partitions by the range bucket, the offsets window by a
    // constant over ONE ROW PER BUCKET (metadata scale). A `Window [...],
    // [], [ordercol ASC]` node would be the single-partition corpus sort
    // this operator exists to avoid.
    val emptyPartWindow = "Window \\[[^\\]]*\\], \\[\\]".r
    assert(emptyPartWindow.findFirstIn(plan).isEmpty, plan)
  }

  // ---- shardForTraining ----

  test("shardForTraining: exact balance, contiguous positions, layout-independent") {
    val d = docs(1003)
    val sharded = Curation.shardForTraining(d, "id", numShards = 8, seed = "s1")
    val sizes = sharded.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === (0 until 8).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(sizes.values.sum === 1003L)
    // positions within each shard are exactly 0..size-1
    val posOk = sharded.groupBy("shard")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0L || col("mx") =!= col("n") - 1L)
    assert(posOk.count() === 0)
    // identical assignment from a different physical layout
    val again = Curation.shardForTraining(d.repartition(17), "id", 8, "s1")
      .withColumnRenamed("shard", "s2").withColumnRenamed("pos", "p2")
    assert(sharded.join(again, "id")
      .filter(col("shard") =!= col("s2") || col("pos") =!= col("p2"))
      .count() === 0)
    // a different seed is a different permutation
    val other = Curation.shardForTraining(d, "id", 8, "s2")
      .withColumnRenamed("pos", "p3").select("id", "p3")
    assert(sharded.join(other, "id")
      .filter(col("pos") =!= col("p3")).count() > 0)
  }

  test("shardByTokenBudget: weight balance within one max-document bound") {
    import spark.implicits._
    // heavy-tailed weights: a few huge docs among many small ones
    val d = (0 until 2000)
      .map(i => (i.toLong, if (i % 97 == 0) 5000L else 1L + i % 7))
      .toDF("id", "toks")
    val n = 8
    val sharded = Curation.shardByTokenBudget(d, "id", "toks", n, "b1")
    val weights = sharded.groupBy("shard").agg(sum("toks").as("w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(weights.keySet == (0 until n).toSet)
    val total = weights.values.sum
    val maxDoc = 5000L
    val ideal = total / n
    weights.values.foreach(w =>
      assert(math.abs(w - ideal) <= maxDoc + n,
        s"shard weight $w vs ideal $ideal exceeds the max-doc bound"))
    // layout-independent
    val again = Curation.shardByTokenBudget(d.repartition(13), "id", "toks",
      n, "b1").withColumnRenamed("shard", "s2")
    assert(sharded.join(again, "id")
      .filter(col("shard") =!= col("s2")).count() === 0)
    // no corpus-wide window partition in the plan
    val plan = sharded.queryExecution.executedPlan.toString
    assert("Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isEmpty, plan)
  }

  test("exportShards writes one directory per shard, readable and ordered") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val manifest = Curation.exportShards(docs(100), "id", numShards = 4,
      seed = "e", out).collect()
    assert(manifest.length === 4 && manifest.forall(r =>
      r.getLong(1) === 25L && r.getLong(2) === 0L && r.getLong(3) === 24L))
    val back = spark.read.parquet(out)
    assert(back.count() === 100)
    assert(back.select("shard").distinct().count() === 4)
    val expect = Curation.shardForTraining(docs(100), "id", 4, "e")
      .withColumnRenamed("pos", "p2")
    assert(back.join(expect, "id")
      .filter(col("pos") =!= col("p2")).count() === 0)
  }

  test("degenerate inputs: empty corpora and more shards than rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "domain")
    assert(Curation.shardForTraining(empty, "id", 4, "s").count() === 0)
    assert(Curation.domainMix(empty, "id", "domain", 10, "s").count() === 0)
    assert(Curation.shardByTokenBudget(
      empty.withColumn("w", lit(1L)), "id", "w", 4, "s").count() === 0)
    // 3 rows into 8 shards: shards 0..2 get one row each, rest are empty
    val tiny = Curation.shardForTraining(docs(3), "id", 8, "s")
    assert(tiny.count() === 3)
    assert(tiny.select("shard").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(0, 1, 2))
    assert(tiny.filter(col("pos") =!= 0L).count() === 0)
    // domainMix with target 0 keeps nothing
    assert(Curation.domainMix(docs(50), "id", "domain", 0, "s").count() === 0)
  }

  // ---- domainMix ----

  test("domainMix: integer-exact quotas, deterministic, never overshoots") {
    import spark.implicits._
    // skewed domains: 1000 / 100 / 10 rows
    val d = ((0 until 1000).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "mid")) ++
      (1100 until 1110).map(i => (i.toLong, "rare")))
      .toDF("id", "domain")
    val target = 500L
    val mixed = Curation.domainMix(d, "id", "domain", target, seed = "m")
    val got = mixed.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w = floor(sqrt(n)): big 31, mid 10, rare 3 → Σ 44
    assert(got("big") === 500L * 31 / 44)
    assert(got("mid") === math.min(100L, 500L * 10 / 44))
    assert(got("rare") === math.min(10L, 500L * 3 / 44))
    assert(got.values.sum <= target)
    // α=0.5 upweights the rare domain relative to its corpus share
    assert(got("rare").toDouble / got.values.sum > 10.0 / 1110.0)
    val again = Curation.domainMix(d.repartition(11), "id", "domain",
      target, "m").select("id")
    assert(mixed.select("id").except(again).count() === 0)
    assert(again.except(mixed.select("id")).count() === 0)
  }

  test("domainMixTokens: token quotas met-or-barely-exceeded, deterministic") {
    import spark.implicits._
    // heavy domain (many tokens) vs light domain
    val d = ((0 until 500).map(i => (i.toLong, "big", 100L)) ++
      (500 until 560).map(i => (i.toLong, "small", 10L)))
      .toDF("id", "domain", "toks")
    val target = 20000L
    val mixed = Curation.domainMixTokens(d, "id", "domain", "toks",
      target, "m")
    val kept = mixed.groupBy("domain")
      .agg(sum("toks").as("w"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // w = floor(sqrt(tokens)): big floor(sqrt(50000))=223, small
    // floor(sqrt(600))=24 -> quotas 20000*223/247=18056, 20000*24/247=1943
    val qBig = target * 223 / 247; val qSmall = target * 24 / 247
    assert(kept("big")._1 >= qBig && kept("big")._1 < qBig + 100,
      s"big kept ${kept("big")}")
    // small domain has only 600 tokens; quota 1943 > 600 keeps everything
    assert(kept("small") == ((600L, 60L)), s"small kept ${kept("small")}")
    val again = Curation.domainMixTokens(d.repartition(11), "id", "domain",
      "toks", target, "m").select("id")
    assert(mixed.select("id").exceptAll(again).count() === 0)
    assert(again.exceptAll(mixed.select("id")).count() === 0)
  }

  // ---- packTokenSequences ----

  test("packTokenSequences: hand-computed packing, determinism, roundtrip") {
    import spark.implicits._
    // docs 10/11/12 with 3/2/4 tokens (+1 EOS each) = 12-token stream;
    // seqLen 5 -> seqs [0..4],[5..9],[10..11]
    val d = Seq(
      (10L, Seq(1L, 2L, 3L)),
      (11L, Seq(4L, 5L)),
      (12L, Seq(6L, 7L, 8L, 9L))).toDF("id", "toks")
    val packed = Curation.packTokenSequences(d, "id", "toks",
      seqLen = 5, eosId = -1L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(packed(0L) == Seq(1L, 2L, 3L, -1L, 4L))
    assert(packed(1L) == Seq(5L, -1L, 6L, 7L, 8L))
    assert(packed(2L) == Seq(9L, -1L))
    // layout independence
    val again = Curation.packTokenSequences(d.repartition(7), "id", "toks",
      5, -1L).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == packed)
    // larger roundtrip: flattened output equals the flattened input stream
    val big = (0 until 500)
      .map(i => (i.toLong, (0 until (1 + i % 13)).map(j => (i * 100 + j).toLong)))
      .toDF("id", "toks")
    val out = Curation.packTokenSequences(big, "id", "toks", 128, -1L)
    val flatOut = out.orderBy("seq_id")
      .collect().flatMap(_.getSeq[Long](1))
    val flatIn = big.orderBy("id").collect()
      .flatMap(r => r.getSeq[Long](1) :+ -1L)
    assert(flatOut.toSeq == flatIn.toSeq, "packing must be lossless in order")
    val sizes = out.select(size(col("token_ids"))).collect().map(_.getInt(0))
    assert(sizes.count(_ != 128) <= 1 && sizes.sum == flatIn.length)
    // empty corpus
    assert(Curation.packTokenSequences(
      Seq.empty[(Long, Seq[Long])].toDF("id", "toks"), "id", "toks",
      128, -1L).count() === 0)
  }

  test("packTokenSequences / packByBudget plans: every Window has a partition spec") {
    import spark.implicits._
    val d = (0 until 200)
      .map(i => (i.toLong, (0 until (1 + i % 5)).map(_.toLong)))
      .toDF("id", "toks")
    val planPack = Curation.packTokenSequences(d, "id", "toks", 64, -1L)
      .queryExecution.executedPlan.toString
    val emptyPartWindow = "Window \\[[^\\]]*\\], \\[\\]".r
    assert(emptyPartWindow.findFirstIn(planPack).isEmpty, planPack)
    // bucket = id div 16: contiguous id ranges, a valid coarsening of the
    // leading order column
    val ch = d.select(col("id"),
      size(col("toks")).cast("long").as("n_tok"))
    val planBudget = Curation.packByBudget(ch, expr("id div 16"),
        Seq("id"), "n_tok", budget = 32)
      .queryExecution.executedPlan.toString
    assert(emptyPartWindow.findFirstIn(planBudget).isEmpty, planBudget)
  }

  test("packTokenSequences rejects null/non-numeric ids instead of dropping docs") {
    import spark.implicits._
    val bad = Seq(("a-uuid", Seq(1L, 2L)), ("7", Seq(3L)))
      .toDF("id", "toks")
    val e = intercept[IllegalArgumentException] {
      Curation.packTokenSequences(bad, "id", "toks", 16, -1L).count()
    }
    assert(e.getMessage.contains("null/non-numeric"))
    // numeric strings are fine (cast succeeds for every row)
    val ok = Seq(("1", Seq(1L, 2L)), ("2", Seq(3L))).toDF("id", "toks")
    assert(Curation.packTokenSequences(ok, "id", "toks", 16, -1L)
      .count() > 0)
  }

  // ---- domainMixEpochs ----

  test("domainMixEpochs: hand-computed quotas, epoch counts, partial-epoch membership") {
    import spark.implicits._
    // two domains: A = 4 docs x 25 tokens (n=100, w=10), B = 1 doc x 400
    // tokens (n=400, w=20). target=600, maxEpochs=3:
    //   A: ideal = 600*10/30 = 200 -> quota 200 (< 300 cap), full=2, rem=0
    //   B: ideal = 600*20/30 = 400 -> quota 400 (< 1200), full=1, rem=0
    val d = (Seq((1L, "A", 25L), (2L, "A", 25L), (3L, "A", 25L),
      (4L, "A", 25L), (10L, "B", 400L))).toDF("id", "dom", "nt")
    val out = Curation.domainMixEpochs(d, "id", "dom", "nt",
      targetTokens = 600L, maxEpochs = 3, seed = "s")
    val got = out.select("id", "epoch").as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 0), (2L, 0), (3L, 0), (4L, 0),
      (1L, 1), (2L, 1), (3L, 1), (4L, 1), (10L, 0)), got.toString)
    // partial epoch: target=350 -> A ideal = 116, full=1, rem=16: one
    // 25-token doc straddles (cumBefore 0 < 16) -> exactly 1 partial doc
    val out2 = Curation.domainMixEpochs(d, "id", "dom", "nt",
      targetTokens = 350L, maxEpochs = 3, seed = "s")
    val a2 = out2.filter(col("dom") === "A")
      .groupBy("epoch").count().as[(Int, Long)].collect().toMap
    assert(a2(0) == 4 && a2(1) == 1, a2.toString)
    // maxEpochs cap binds: huge target -> every domain at exactly 3 full
    // epochs, no partial (rem = 0)
    val out3 = Curation.domainMixEpochs(d, "id", "dom", "nt",
      targetTokens = 100000L, maxEpochs = 3, seed = "s")
    assert(out3.count() == 15, "5 docs x 3 epochs")
    assert(out3.agg(max(col("epoch"))).head().getInt(0) == 2)
    // deterministic under adversarial repartition
    val out2b = Curation.domainMixEpochs(d.repartition(7), "id", "dom",
      "nt", targetTokens = 350L, maxEpochs = 3, seed = "s")
    assert(out2.select("id", "epoch").exceptAll(
      out2b.select("id", "epoch")).count() == 0)
  }

  test("domain mixers keep NULL-domain documents (null-safe quota join)") {
    import spark.implicits._
    val d = Seq((1L, Some("A"), 10L), (2L, Some("A"), 10L),
      (3L, None, 10L), (4L, None, 10L)).toDF("id", "dom", "nt")
    // row mixer: generous target keeps everything, incl. the NULL group
    val rows = Curation.domainMix(d, "id", "dom", targetRows = 100L,
      seed = "n")
    assert(rows.count() == 4, "null-domain rows must not vanish")
    assert(rows.filter(col("dom").isNull).count() == 2)
    // token mixer
    val toks = Curation.domainMixTokens(d, "id", "dom", "nt",
      targetTokens = 1000L, seed = "n")
    assert(toks.filter(col("dom").isNull).count() == 2)
    // epoch mixer
    val ep = Curation.domainMixEpochs(d, "id", "dom", "nt",
      targetTokens = 1000L, maxEpochs = 2, seed = "n")
    assert(ep.filter(col("dom").isNull).count() == 4, "2 docs x 2 epochs")
  }

  // ---- dedupLinesKeepFirst ----

  test("dedupLinesKeepFirst: first occurrence survives, short lines exempt") {
    import spark.implicits._
    val d = Seq(
      (1L, "COOKIE BANNER\nunique alpha\nok"),
      (2L, "COOKIE BANNER\nunique beta\nok"),
      (3L, "unique gamma\nCOOKIE BANNER\nunique gamma")
    ).toDF("id", "text")
    val out = Dedup.dedupLinesKeepFirst(d, "id", "text", minChars = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 keeps the banner (first occurrence by (id, pos)); 2 and 3 lose it
    assert(out(1L) === "COOKIE BANNER\nunique alpha\nok")
    // "ok" (< 5 chars) is exempt even though it repeats
    assert(out(2L) === "unique beta\nok")
    // within-doc repetition collapses too ("unique gamma" twice in doc 3)
    assert(out(3L) === "unique gamma")
  }

  test("dedupLinesKeepFirst: a fully-stripped document becomes empty text") {
    import spark.implicits._
    val d = Seq((1L, "SHARED LINE"), (2L, "SHARED LINE")).toDF("id", "text")
    val out = Dedup.dedupLinesKeepFirst(d, "id", "text", minChars = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "SHARED LINE")
    assert(out(2L) === "")
  }

  // ---- dedupSpansKeepFirst (exact-substring removal) ----

  test("dedupSpansKeepFirst: first span occurrence survives, later ones cut") {
    import spark.implicits._
    // 4-token span "a b c d" duplicated across docs and within doc 3
    val d = Seq(
      (1L, "a b c d tail one"),
      (2L, "head two a b c d"),
      (3L, "a b c d mid a b c d")
    ).toDF("id", "text")
    val out = Dedup.dedupSpansKeepFirst(d, "id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the globally-first occurrence (id 1, pos 0) — intact
    assert(out(1L) === "a b c d tail one")
    // doc 2's copy is cut, the rest of the doc survives
    assert(out(2L) === "head two")
    // doc 3: BOTH its occurrences are non-first (doc 1 won), both cut
    assert(out(3L) === "mid")
  }

  test("dedupSpansKeepFirst: stride=1 tiles and cuts spans longer than the window") {
    import spark.implicits._
    // duplicated span of 6 tokens with spanTokens=4: every offset's window
    // duplicates, so the WHOLE span vanishes from the second doc
    val span = "w1 w2 w3 w4 w5 w6"
    val d = Seq(
      (1L, s"$span uniq1"),
      (2L, s"uniq2 $span")
    ).toDF("id", "text")
    val out = Dedup.dedupSpansKeepFirst(d, "id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === s"$span uniq1")
    assert(out(2L) === "uniq2")
  }

  test("dedupSpansKeepFirst: short documents and unique text pass through") {
    import spark.implicits._
    val d = Seq(
      (1L, "too short"),                 // < spanTokens tokens: no windows
      (2L, "all of these tokens differ entirely")
    ).toDF("id", "text")
    val out = Dedup.dedupSpansKeepFirst(d, "id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "too short")
    assert(out(2L) === "all of these tokens differ entirely")
  }

  test("dedupSpansKeepFirst: identical whole documents keep exactly one copy") {
    import spark.implicits._
    val d = Seq((2L, "x y z w"), (1L, "x y z w"), (3L, "x y z w"))
      .toDF("id", "text")
    val out = Dedup.dedupSpansKeepFirst(d, "id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "x y z w") // smallest id wins, not input order
    assert(out(2L) === "")
    assert(out(3L) === "")
  }

  test("curateCorpus spanDedupTokens stage cuts repeated spans before hashing") {
    import spark.implicits._
    val span = "p1 p2 p3 p4"
    def body(i: Int) =
      (0 until 60).map(j => s"doc${i}word$j").mkString(" ")
    // span planted into docs 1 and 2 — doc 2's copy must be cut by the
    // stage; all docs otherwise unique and high-quality enough to survive
    val d = Seq(
      (1L, s"$span ${body(1)}"),
      (2L, s"${body(2)} $span"),
      (3L, body(3))
    ).toDF("id", "text")
    val bench = Seq("zzz www").toDF("text")
    val (clean, rep) = Curation.curateCorpus(d, "id", "text", bench, "text",
      minQuality = 0.0, spanDedupTokens = 4)
    assert(rep.afterSpanDedup == 3, s"stage accounting: $rep")
    val out = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).contains(span), "keep-first copy survives")
    assert(!out(2L).contains(span), "later copy is cut in the pipeline")
    assert(out(3L) == body(3))
    // off by default: no accounting action spent
    val (_, repOff) = Curation.curateCorpus(d, "id", "text", bench, "text",
      minQuality = 0.0)
    assert(repOff.afterSpanDedup == -1L)
  }

  test("dedupSpansKeepFirst + spanDuplicationStats equal a naive reference on random corpora") {
    // tiny vocabulary forces heavy window duplication, so the keep-first
    // election, overlap handling, and within-doc repetition paths all
    // exercise far beyond the planted gate cases
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val L = 3
    for (trial <- 0 until 3) {
      val vocab = Array("a", "b", "c", "d")
      val docs = (0 until 40).map(i => (i.toLong,
        (0 until (3 + rnd.nextInt(12)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      // naive reference: enumerate windows, elect (id, pos)-first per
      // distinct window TEXT, cut covered positions of the rest
      case class Occ(id: Long, pos: Int)
      val wins = scala.collection.mutable.LinkedHashMap[String, Vector[Occ]]()
      for ((id, text) <- docs) {
        val toks = text.split(" ", -1)
        if (toks.length >= L) for (p <- 0 to toks.length - L)
          wins.updateWith(toks.slice(p, p + L).mkString(" "))(v =>
            Some(v.getOrElse(Vector.empty) :+ Occ(id, p)))
      }
      val cut = scala.collection.mutable.Set[(Long, Int)]()
      val dup = scala.collection.mutable.Set[(Long, Int)]()
      for ((_, occs) <- wins if occs.size >= 2) {
        val first = occs.minBy(o => (o.id, o.pos))
        for (o <- occs; k <- o.pos until o.pos + L) {
          dup += ((o.id, k))
          if (o != first) cut += ((o.id, k))
        }
      }
      val expectText = docs.map { case (id, text) =>
        val toks = text.split(" ", -1)
        id -> toks.zipWithIndex.collect {
          case (t, i) if !cut((id, i)) => t }.mkString(" ")
      }.toMap
      val df = docs.toDF("id", "text")
      val got = Dedup.dedupSpansKeepFirst(df, "id", "text", spanTokens = L)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expectText, s"trial $trial text mismatch")
      val gotStats = Dedup.spanDuplicationStats(df, "id", "text", spanTokens = L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val expectDup = docs.map { case (id, _) =>
        id -> dup.count(_._1 == id).toLong }.toMap
      assert(gotStats == expectDup, s"trial $trial stats mismatch")
    }
  }

  test("spanDuplicationStats counts both copies' covered tokens, 0 for unique") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d x1 x2"),   // 6 tokens, 4 under the shared span
      (2L, "y1 a b c d"),      // 5 tokens, 4 covered
      (3L, "all unique tokens here")
    ).toDF("id", "text")
    val out = Dedup.spanDuplicationStats(d, "id", "text", spanTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out(0) == ((1L, 6L, 4L, 0.666667)))
    assert(out(1) == ((2L, 5L, 4L, 0.8)))
    assert(out(2) == ((3L, 4L, 0L, 0.0)))
  }

  // ---- blocklist filters (URL domains, terms) ----

  test("urlBlocklistFilter: label-boundary suffix match, host normalization") {
    import spark.implicits._
    val d = Seq(
      (1L, "https://ads.example.com/banner"),       // under example.com
      (2L, "http://user:pw@EXAMPLE.COM:8080/x?q=1"), // equals, case+port+auth
      (3L, "https://notexample.com/ok"),            // suffix but NOT at label
      (4L, "example.com./trailing-dot"),            // scheme-less + root dot
      (5L, "https://safe.org/fine"),
      (6L, "https://ads.example.com/x\n")           // newline must NOT fail open
    ).toDF("id", "url")
    val bl = Seq("example.com").toDF("domain")
    val kept = Curation.urlBlocklistFilter(d, "id", "url", bl)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L), s"kept: $kept")
  }

  test("urlBlocklistFilter equals a naive suffix reference on random URLs") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val labels = Array("a", "bb", "ccc", "example", "com", "net", "org", "x")
    val urls = (0 until 200).map { i =>
      val h = (0 until 1 + rnd.nextInt(4))
        .map(_ => labels(rnd.nextInt(labels.length))).mkString(".")
      val scheme = if (rnd.nextBoolean()) "https://" else ""
      val user = if (rnd.nextInt(4) == 0) "u:p@" else ""
      val port = if (rnd.nextInt(3) == 0) ":8080" else ""
      val cased = if (rnd.nextBoolean()) h.toUpperCase else h
      (i.toLong, s"$scheme$user$cased$port/p$i", h)
    }
    val blocked = Set("example.com", "x.org", "bb")
    def naive(h: String) = blocked.exists(b => h == b || h.endsWith("." + b))
    val expect = urls.filterNot(u => naive(u._3)).map(_._1).toSet
    val got = Curation.urlBlocklistFilter(
        urls.map(u => (u._1, u._2)).toDF("id", "url"), "id", "url",
        blocked.toSeq.toDF("domain"))
      .select("id").as[Long].collect().toSet
    assert(got == expect,
      s"diff: ${(got diff expect) ++ (expect diff got)}")
  }

  test("termBlocklistFilter: case-folded exact-token match, any whitespace") {
    import spark.implicits._
    val d = Seq(
      (1L, "clean text entirely"),
      (2L, "contains BLOCKED token"),
      (3L, "substring blockedish is not a hit"),
      (4L, "line one\nBlocked\nline three")  // newline-adjacent must match
    ).toDF("id", "text")
    val terms = Seq("Blocked").toDF("term")
    val kept = Curation.termBlocklistFilter(d, "id", "text", terms)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"kept: $kept")
  }

  test("regexBlocklistFilter: phrases, confined (?i), null text, empty list") {
    import spark.implicits._
    val d = Seq(
      (1L, "clean text entirely"),
      (2L, "FREE    money across spaces"),      // (?i) + \s+ phrase hit
      (3L, "free lunch, money later"),           // words apart: no hit
      (4L, "mid-token unsubscribenow embedded"), // substring hit
      (5L, null.asInstanceOf[String]),           // null text survives
      (6L, "case UNSUBSCRIBE miss")              // (?i) confined to p1 only
    ).toDF("id", "text")
    val kept = Curation.regexBlocklistFilter(d, "text",
        Seq("(?i)free\\s+money", "unsubscribe"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L, 6L), s"kept: $kept")
    // empty / all-empty / null pattern lists keep everything
    assert(Curation.regexBlocklistFilter(d, "text", Nil).count() == 6)
    assert(Curation.regexBlocklistFilter(d, "text",
      Seq("", null)).count() == 6)
    // backreference patterns: combining would renumber capture groups and
    // silently never match — the gate must fall back to per-pattern evals
    val q = Seq((1L, "say \"spam\" now"), (2L, "no quotes here"),
      (3L, "an (aa) hit")).toDF("id", "text")
    val keptQ = Curation.regexBlocklistFilter(q, "text",
        Seq("(a)\\1", "(['\"]).*?\\1"))
      .select("id").as[Long].collect().toSet
    assert(keptQ == Set(2L), s"backref fallback kept: $keptQ")
  }

  // ---- ccnetBuckets (perplexity head/middle/tail) ----

  test("ccnetBuckets: thirds per group by rank arithmetic, repartition-stable") {
    import spark.implicits._
    val train = Seq((0L, "g", "the cat sat on the mat the cat sat"))
      .toDF("id", "lang", "text")
    // 6 scored docs in one group: fluent (training-like) text must land in
    // head, rare-bigram soup in tail; 6 rows → exactly 2 per bucket
    val score = Seq(
      (1L, "g", "the cat sat on the mat"),
      (2L, "g", "the cat sat on the mat the cat"),
      (3L, "g", "the cat zzz qqq"),
      (4L, "g", "qqq zzz vvv uuu"),
      (5L, "g", "on the mat"),
      (6L, "g", "zzz the cat")
    ).toDF("id", "lang", "text")
    val out = TextAnalysis.ccnetBuckets(train, score, "id",
      groupCol = Some("lang"))
    val buckets = out.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
    assert(buckets.size == 6)
    assert(Seq("head", "middle", "tail").forall(b =>
      buckets.values.count(_ == b) == 2), s"even thirds: $buckets")
    assert(buckets(1L) == "head")
    assert(buckets(4L) == "tail")
    // determinism: the bucketed result is identical under repartition
    val again = TextAnalysis.ccnetBuckets(train, score.repartition(7), "id",
      groupCol = Some("lang"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
    assert(again == buckets)
  }

  test("ccnetBuckets equals a naive reference LM + rank-thirds on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Array("the", "cat", "sat", "mat", "zz", "qq")
    def randDoc(len: Int) =
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    for (trial <- 0 until 2) {
      val train = (0 until 30).map(i => (1000L + i, randDoc(6 + rnd.nextInt(10))))
      val score = (0 until 40).map(i =>
        (i.toLong, s"g${i % 3}", randDoc(1 + rnd.nextInt(10))))
      // naive reference: full Stupid-Backoff LM + 6-dp decimal sums +
      // integer micro-nats + per-group (ppt, id) rank thirds
      val toks = train.flatMap(_._2.split(" ", -1))
      val c1 = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nCorpus = toks.size.toLong
      val c2 = train.flatMap { case (_, t) =>
        val a = t.split(" ", -1); a.zip(a.drop(1)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val scored = score.flatMap { case (id, grp, text) =>
        val a = text.split(" ", -1)
        val bgs = a.zip(a.drop(1))
        if (bgs.isEmpty) None
        else {
          val sum = bgs.map { case (w1, w2) =>
            val s = c2.get((w1, w2)) match {
              case Some(c) => c.toDouble / c1(w1)
              case None => 0.4 * c1.getOrElse(w2, 1L) / nCorpus
            }
            BigDecimal(-math.log(s))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          }.sum
          Some((id, grp, (sum * 1000000).toLongExact / bgs.length))
        }
      }
      val expect = scored.groupBy(_._2).flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._1))
        val m = sorted.size
        sorted.zipWithIndex.map { case ((id, _, _), i) =>
          id -> (((i.toLong * 3) / m) match {
            case 0 => "head"; case 1 => "middle"; case _ => "tail" })
        }
      }
      val got = TextAnalysis.ccnetBuckets(
          train.toDF("id", "text"), score.toDF("id", "grp", "text"),
          "id", groupCol = Some("grp"))
        .collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
      assert(got == expect, s"trial $trial: $got vs $expect")
    }
  }

  test("ccnetFilter keeps head+middle and drops tail and too-short docs") {
    import spark.implicits._
    val train = Seq((0L, "the cat sat on the mat")).toDF("id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "qqq zzz vvv"),
      (4L, "single")  // < 2 tokens: no LM evidence, dropped
    ).toDF("id", "text")
    val kept = TextAnalysis.ccnetFilter(train, docs, "id")
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(4L), "unscorable doc must not be kept")
    assert(kept.contains(1L), "most in-distribution doc must survive")
    assert(!kept.contains(3L), "the worst third is the tail")
  }

  // ---- Classifier ----

  test("Fixed128 accumulation equals an exact BigDecimal reference under any split") {
    // the determinism contract's foundation: quantized 128-bit sums must
    // equal exact integer arithmetic regardless of partition grouping or
    // merge order — including cancellation-heavy and large-magnitude mixes
    val rnd = new scala.util.Random(42)
    val values = Array.fill(5000)(rnd.nextInt(7) match {
      case 0 => (rnd.nextDouble() - 0.5) * 700.0  // loss-magnitude
      case 1 => rnd.nextGaussian() * 1e-9         // tiny
      case _ => rnd.nextDouble() * 2.0 - 1.0      // typical contribution
    })
    val expect = values.map(v =>
      java.math.BigInteger.valueOf(Math.round(v * graft.llm.Fixed128.Scale)))
      .reduce(_ add _)
    for (seed <- 1 to 5) {
      val r2 = new scala.util.Random(seed)
      val shuffled = r2.shuffle(values.toSeq)
      // random partition split, then random-order pairwise merges
      val parts = shuffled.grouped(1 + r2.nextInt(997)).map { chunk =>
        val buf = new Array[Long](2)
        chunk.foreach(v => graft.llm.Fixed128.add(buf, 0, v))
        buf
      }.toBuffer
      while (parts.size > 1) {
        val i = r2.nextInt(parts.size)
        val b = parts.remove(i)
        val j = r2.nextInt(parts.size)
        graft.llm.Fixed128.mergeInto(parts(j), b, 1)
      }
      val got = parts.head
      val gotBig = java.math.BigInteger.valueOf(got(0)).shiftLeft(64)
        .add(java.math.BigInteger.valueOf(got(1)).and(
          java.math.BigInteger.ONE.shiftLeft(64).subtract(java.math.BigInteger.ONE)))
      assert(gotBig == expect, s"split seed $seed diverged: $gotBig vs $expect")
    }
  }

  test("Fixed128 rejects out-of-range and NaN contributions instead of saturating") {
    val buf = new Array[Long](2)
    graft.llm.Fixed128.add(buf, 0, 8388607.0) // just inside 2^23
    intercept[IllegalArgumentException] {
      graft.llm.Fixed128.add(buf, 0, 8388608.0)
    }
    intercept[IllegalArgumentException] {
      graft.llm.Fixed128.add(buf, 0, -9e6)
    }
    intercept[IllegalArgumentException] {
      graft.llm.Fixed128.add(buf, 0, Double.NaN)
    }
  }

  test("lossHistory entries are f(w_it) at the evaluated weights (pre-step reg)") {
    // iter 0's loss must equal the loss at the INITIAL weights (all-zero):
    // n·ln 2 / n = ln 2 exactly, with zero reg — the post-step-reg bug this
    // pins against added ||w_1||² to iter 0's entry
    val d = teacherData(200, 8)
    val m = Classifier.lrFitNewton(d, "y", "x", dim = 8, iters = 3)
    assert(math.abs(m.lossHistory(0) - math.log(2.0)) < 1e-9,
      s"iter-0 loss ${m.lossHistory(0)} != ln 2")
    val g = Classifier.lrFit(d, "y", "x", dim = 8, iters = 3, lr = 0.5)
    assert(math.abs(g.lossHistory(0) - math.log(2.0)) < 1e-9)
  }

  test("dedupLinesKeepFirst absorbs a mega-duplicated line (skew)") {
    import spark.implicits._
    // one line duplicated across 20k documents — the nav-bar pathology;
    // the winner aggregate must combine map-side, not hot-spot one task
    val d = (0 until 20000)
      .map(i => (i.toLong, s"MEGA DUPLICATED NAVIGATION BAR\nunique line $i"))
      .toDF("id", "text").repartition(16)
    val out = Dedup.dedupLinesKeepFirst(d, "id", "text", minChars = 5)
    assert(out.count() === 20000)
    val keepers = out.filter(col("text").contains("MEGA DUPLICATED")).collect()
    assert(keepers.length === 1 && keepers.head.getLong(0) === 0L,
      s"winner should be doc 0, got ${keepers.map(_.getLong(0)).toSeq}")
    assert(out.filter(!col("text").contains("unique line")).count() === 0)
  }

  test("dedupSpansKeepFirst absorbs a mega-duplicated span (skew)") {
    import spark.implicits._
    // one 5-token license header shared by 20k documents — the hottest
    // window hash carries 20k occurrences; the winner aggregate must
    // combine map-side, not hot-spot one task
    val d = (0 until 20000)
      .map(i => (i.toLong, s"w1 w2 w3 w4 w5 unique$i trailing$i"))
      .toDF("id", "text").repartition(16)
    val out = Dedup.dedupSpansKeepFirst(d, "id", "text", spanTokens = 5)
    assert(out.count() === 20000)
    val keepers = out.filter(col("text").contains("w1 w2 w3 w4 w5")).collect()
    assert(keepers.length === 1 && keepers.head.getLong(0) === 0L,
      s"winner should be doc 0, got ${keepers.map(_.getLong(0)).toSeq}")
    // every doc keeps its unique tail (the cut never reaches past the span)
    assert(out.filter(!col("text").contains("unique")).count() === 0)
  }

  test("solveSymmetric solves a known SPD system") {
    val a = Array(Array(4.0, 1.0, 0.0), Array(1.0, 3.0, 1.0),
      Array(0.0, 1.0, 2.0))
    val x = Array(1.0, -2.0, 3.0)
    val b = Array(
      a(0)(0) * x(0) + a(0)(1) * x(1) + a(0)(2) * x(2),
      a(1)(0) * x(0) + a(1)(1) * x(1) + a(1)(2) * x(2),
      a(2)(0) * x(0) + a(2)(1) * x(1) + a(2)(2) * x(2))
    val got = Classifier.solveSymmetric(a, b)
    x.indices.foreach(i => assert(math.abs(got(i) - x(i)) < 1e-12))
  }

  private def teacherData(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    // deterministic pseudo-random features; label = sign of a fixed
    // teacher hyperplane → linearly separable by construction
    val u = Array.tabulate(dim)(i => math.sin(i + 1.0))
    (0 until n).map { r =>
      val x = Array.tabulate(dim)(j =>
        math.sin(r * 131.0 + j * 17.0)) // in [-1, 1], dense
      val y = if (x.zip(u).map { case (a, b) => a * b }.sum > 0) 1.0 else 0.0
      (r.toLong, x, y)
    }.toDF("id", "x", "y")
  }

  test("lrFitNewton recovers a planted teacher and is layout-deterministic") {
    val d = teacherData(600, 16)
    val m = Classifier.lrFitNewton(d, "y", "x", dim = 16, iters = 6, l2 = 1e-4)
    val m2 = Classifier.lrFitNewton(d.repartition(9), "y", "x", 16, 6, 1e-4)
    assert(m.weights.sameElements(m2.weights) && m.bias === m2.bias)
    assert(m.lossHistory.last < m.lossHistory.head)
    assert(Classifier.accuracy(d, "y", "x", m) >= 0.97)
  }

  test("lrFit (gradient descent) is monotone and deterministic") {
    val d = teacherData(300, 8)
    val m = Classifier.lrFit(d, "y", "x", dim = 8, iters = 15, lr = 2.0,
      l2 = 1e-5)
    val m2 = Classifier.lrFit(d.repartition(5), "y", "x", 8, 15, 2.0, 1e-5)
    assert(m.weights.sameElements(m2.weights) && m.bias === m2.bias)
    assert(m.lossHistory.sliding(2)
      .forall(p => p.length < 2 || p(1) <= p(0) + 1e-12))
  }

  test("softmaxFit recovers a planted argmax teacher; deterministic; probs sane") {
    import spark.implicits._
    val dim = 12; val numK = 4
    val u = Array.tabulate(numK, dim)((k, j) => math.sin(7.0 * k + j + 1.0))
    val d = (0 until 800).map { r =>
      val x = Array.tabulate(dim)(j => math.sin(r * 131.0 + j * 17.0))
      val scores = u.map(uk => uk.zip(x).map { case (a, c) => a * c }.sum)
      val y = scores.indexOf(scores.max).toDouble
      (r.toLong, x, y)
    }.toDF("id", "x", "y")
    val m = Classifier.softmaxFit(d, "y", "x", dim, numK, iters = 8)
    val m2 = Classifier.softmaxFit(d.repartition(9), "y", "x", dim, numK, 8)
    assert(m.weights.zip(m2.weights).forall(p => p._1.sameElements(p._2)) &&
      m.biases.sameElements(m2.biases), "softmax fit must be layout-deterministic")
    assert(m.lossHistory.last < m.lossHistory.head)
    assert(Classifier.softmaxAccuracy(d, "y", "x", m) >= 0.93,
      s"agreement ${Classifier.softmaxAccuracy(d, "y", "x", m)}")
    // probabilities are a distribution; prediction matches the max prob
    val row = d.limit(5).select(
      Classifier.softmaxProbs(col("x"), m).as("p"),
      Classifier.softmaxPredict(col("x"), m).as("c")).collect()
    row.foreach { r =>
      val p = r.getSeq[Double](0)
      assert(math.abs(p.sum - 1.0) < 1e-9 && p.forall(_ >= 0))
      assert(p(r.getInt(1)) == p.max)
    }
  }

  test("curateCorpus optional stages: line dedup and model quality gate") {
    import spark.implicits._
    // docs share a long boilerplate line; half carry a "spammarker" body
    // the model gate learns to reject via a planted-teacher-style label
    def body(i: Int) = if (i % 2 == 0) "the quick brown fox unique" + i
                       else "spammarker spammarker spammarker unique" + i
    val d = (0 until 40)
      .map(i => (i.toLong, s"SHARED PROMO BANNER LINE\n${body(i)} the of and"))
      .toDF("id", "text")
    val bench = Seq.empty[String].toDF("text")
    // fit the gate model on the same deterministic rule
    val labeled = d.select(col("id"),
        (col("id") % 2 === 0).cast("double").as("y"),
        graft.llm.TextAnalysis.hashEmbedding(col("text"), 16).as("x"))
    val m = Classifier.lrFitNewton(labeled, "y", "x", dim = 16, iters = 6)
    val (clean, rep) = Curation.curateCorpus(d, "id", "text", bench, "text",
      minQuality = 0.0, dedupLines = true,
      qualityModel = Some(m), minModelScore = 0.5)
    // line dedup ran: the banner survives in at most one document
    assert(rep.afterLineDedup == 40)
    val banners = clean.filter(col("text").contains("SHARED PROMO BANNER"))
      .count()
    assert(banners <= 1, s"banner in $banners docs after line dedup")
    // the model gate dropped (at least most of) the spam half
    assert(rep.afterClassifier >= 0 && rep.afterClassifier < 40)
    val spamKept = clean.filter(col("text").contains("spammarker")).count()
    assert(spamKept <= 2, s"model gate kept $spamKept spam docs")
    assert(clean.filter(col("id") % 2 === 0).count() >= 18)
    // default-off path reports -1 and is unchanged
    val (_, rep0) = Curation.curateCorpus(d, "id", "text", bench, "text")
    assert(rep0.afterLineDedup == -1L && rep0.afterClassifier == -1L)
    assert(rep0.afterGopher == -1L)
  }

  test("c4Filter: line rules, page drops, and the minLines floor") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good first sentence here.\nok\nthis line has javascript code." +
        "\nanother valid question line?\ntail words no punct"),
      (2L, "contains lorem ipsum filler.\nreal sentence stays here."),
      (3L, "some { braces } here.\nreal sentence stays here."),
      (4L, "only one good sentence."),
      (5L, "first good line.\nsecond good line!\nthird \"quoted line\""))
    val out = Curation.c4Filter(docs.toDF("id", "text"), minLines = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // lorem-ipsum and brace pages drop whole; doc 4 misses the line floor
    assert(out.keySet == Set(1L, 5L), s"survivors: ${out.keySet}")
    assert(out(1L) ==
      "good first sentence here.\nanother valid question line?")
    assert(out(5L) ==
      "first good line.\nsecond good line!\nthird \"quoted line\"")
  }

  test("curateCorpus c4 stage: page drops and line rewrite before dedup") {
    import spark.implicits._
    def page(i: Int) = {
      val s1 = (0 until 8).map(j => s"p${i}a$j").mkString(" ") + " the of."
      val s2 = (0 until 8).map(j => s"p${i}b$j").mkString(" ") + " and that!"
      s"$s1\nnoise no punct line\n$s2"
    }
    val d = ((0 until 10).map(i => (i.toLong, page(i)))
      ++ Seq((100L, page(100) + "\nbad { brace line.")))
      .toDF("id", "text")
    val bench = Seq.empty[String].toDF("text")
    val (clean, rep) = Curation.curateCorpus(d, "id", "text", bench, "text",
      minQuality = 0.0, c4Clean = true, c4MinLines = 2)
    assert(rep.afterC4 == 10, s"c4 stage count: ${rep.afterC4}")
    assert(clean.count() == 10, "brace page must drop")
    assert(clean.filter(col("text").contains("noise no punct")).count() == 0,
      "punctuation-less lines must be rewritten away")
    val (_, rep0) = Curation.curateCorpus(d, "id", "text", bench, "text",
      minQuality = 0.0)
    assert(rep0.afterC4 == -1L)
  }

  test("curateCorpus gopher stage: rule violators drop before scoring") {
    import spark.implicits._
    // 30 clean 60-token docs (distinct vocab per doc, so the near-dup
    // stage keeps them apart) + 10 too-short docs (Gopher word-count rule)
    def goodDoc(i: Int) = (0 until 54).map(j => s"w${i}x$j").mkString(" ") +
      " the of and with that have"
    val d = ((0 until 30).map(i => (i.toLong, goodDoc(i)))
      ++ (100 until 110).map(i => (i.toLong, s"the short one $i")))
      .toDF("id", "text")
    val bench = Seq.empty[String].toDF("text")
    val (clean, rep) = Curation.curateCorpus(d, "id", "text", bench, "text",
      minQuality = 0.0, gopherRules = true)
    assert(rep.afterGopher == 30, s"gopher stage count: ${rep.afterGopher}")
    assert(clean.filter(col("id") >= 100).count() == 0,
      "rule-violating docs must not survive")
    assert(clean.count() == 30)
    // monotone accounting: gopher sits between input and quality
    assert(rep.input == 40 && rep.afterQuality <= rep.afterGopher)
  }

  test("qualityClassifier scores every row map-side in (0,1)") {
    val d = teacherData(200, 8)
    val scored = Classifier.qualityClassifier(d, d, "y", "x", dim = 8)
    assert(scored.filter(col("quality_score") <= 0.0 ||
      col("quality_score") >= 1.0).count() === 0)
    // scoring adds no exchange: the plan after the checkpointed fit is a
    // pure projection over the input
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

}
