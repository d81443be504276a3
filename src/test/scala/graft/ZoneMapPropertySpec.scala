package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api._

/** Soundness property for zone-map pruning (incl. the OR/IN envelopes):
  * for ANY predicate tree, a pruned scan must return exactly the rows the
  * in-memory evaluation of the same tree selects — over-pruning silently
  * loses rows, which is the one failure mode this layer must never have. */
class ZoneMapPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", DoubleType)))

  // predicate AST mirrored between Column and in-memory evaluation
  private sealed trait P
  private case class Eq(v: Long) extends P
  private case class Gt(v: Long) extends P
  private case class Lt(v: Long) extends P
  private case class Between(lo: Long, hi: Long) extends P
  private case class IsIn(vs: Seq[Long]) extends P
  private case class BGt(v: Double) extends P // non-key column (also gets stats now)
  private case class AndP(l: P, r: P) extends P
  private case class OrP(l: P, r: P) extends P

  private def toColumn(p: P): Column = p match {
    case Eq(v) => col("a") === v
    case Gt(v) => col("a") > v
    case Lt(v) => col("a") < v
    case Between(lo, hi) => col("a").between(lo, hi)
    case IsIn(vs) => col("a").isin(vs: _*)
    case BGt(v) => col("b") > v
    case AndP(l, r) => toColumn(l) && toColumn(r)
    case OrP(l, r) => toColumn(l) || toColumn(r)
  }

  private def eval(p: P, a: Long, b: Double): Boolean = p match {
    case Eq(v) => a == v
    case Gt(v) => a > v
    case Lt(v) => a < v
    case Between(lo, hi) => a >= lo && a <= hi
    case IsIn(vs) => vs.contains(a)
    case BGt(v) => b > v
    case AndP(l, r) => eval(l, a, b) && eval(r, a, b)
    case OrP(l, r) => eval(l, a, b) || eval(r, a, b)
  }

  private def gen(rnd: scala.util.Random, depth: Int): P = {
    def v() = rnd.nextInt(320).toLong
    if (depth > 0 && rnd.nextInt(3) > 0) {
      if (rnd.nextBoolean()) AndP(gen(rnd, depth - 1), gen(rnd, depth - 1))
      else OrP(gen(rnd, depth - 1), gen(rnd, depth - 1))
    } else rnd.nextInt(6) match {
      case 0 => Eq(v())
      case 1 => Gt(v())
      case 2 => Lt(v())
      case 3 => { val lo = v(); Between(lo, lo + rnd.nextInt(50)) }
      case 4 => IsIn(Seq.fill(1 + rnd.nextInt(4))(v()))
      case _ => BGt(rnd.nextDouble() * 300)
    }
  }

  test("pruned scans equal in-memory evaluation for 120 random trees") {
    val root = Files.createTempDirectory("graft-zmp").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    val values = (0L until 10L) ++ (100L until 110L) ++ (200L until 210L) ++
      (300L until 310L)
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("t", schema)
      t.addSortingKey(Seq("a"))
      // four file batches with disjoint ranges => real pruning opportunities
      values.grouped(10).foreach { batch =>
        val l = new java.util.ArrayList[Row]()
        batch.foreach(a => l.add(Row(a, a * 1.5)))
        t.insert(spark.createDataFrame(l, schema))
      }
      val rnd = new scala.util.Random(7)
      (1 to 120).foreach { i =>
        val p = gen(rnd, 3)
        val want = values.filter(a => eval(p, a, a * 1.5)).toSet
        val got = t.select(Seq("a"), toColumn(p)).collect()
          .map(_.getLong(0)).toSet
        assert(got == want, s"tree #$i $p: got ${got.size}, want ${want.size} " +
          s"(missing ${want -- got}, extra ${got -- want})")
      }
    }
  }

  test("zone maps prune files on NON-sorting-key columns") {
    val root = Files.createTempDirectory("graft-zmp2").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      // no sorting key at all: stats are collected for every primitive
      // column at write, so ad-hoc predicates still prune
      val t = tx.bucket("b").createSchema("m").createTable("t", schema)
      (0 until 4).foreach { batch =>
        val l = new java.util.ArrayList[Row]()
        (0 until 10).foreach { i =>
          val a = batch * 100L + i
          l.add(Row(a, a * 1.5))
        }
        t.insert(spark.createDataFrame(l, schema).coalesce(1))
      }
      assert(t.manifest.files.size == 4)
      assert(t.manifest.sortingKeys.isEmpty)
      // predicate on the double column b — only the last batch qualifies
      val q = t.select(Seq("a"), col("b") > 400.0)
      assert(q.collect().map(_.getLong(0)).toSet == (300L until 310L).toSet)
      val scanned = q.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }.sum
      assert(scanned == 1, s"scanned $scanned of 4 files, want 1")
    }
  }

  test("float zone maps are exact: no pruning of files whose float widens past the bound") {
    val root = Files.createTempDirectory("graft-zmpf").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val sch = StructType(Seq(StructField("a", LongType), StructField("f", FloatType)))
      val t = tx.bucket("b").createSchema("m").createTable("t", sch)
      val l = new java.util.ArrayList[Row]()
      (0 until 5).foreach(i => l.add(Row(i.toLong, 0.1f)))
      t.insert(spark.createDataFrame(l, sch).coalesce(1))
      // 0.1f as a double is 0.100000001...: the predicate f > 0.1 (double)
      // MATCHES every row. A zone map that stored the float's shortest
      // string "0.1" would re-parse to exactly 0.1 and wrongly prune the
      // whole file; bounds are stored as the exact widened double instead.
      assert(t.select(Seq("a"), col("f") > lit(0.1)).count() == 5)
    }
  }

  test("long strings keep a truncated-min lower bound; truncated max never prunes") {
    val root = Files.createTempDirectory("graft-zmps").toString
    val s = VastSession(spark, root)
    s.createBucket("b")
    s.transaction { tx =>
      val sch = StructType(Seq(StructField("a", LongType), StructField("u", StringType)))
      val t = tx.bucket("b").createSchema("m").createTable("t", sch)
      def url(host: Char, i: Int) = s"https://$host.example.com/" + ("x" * 80) + i
      // two single-file batches, all values > 64 chars
      Seq('a', 'z').zipWithIndex.foreach { case (h, b) =>
        val l = new java.util.ArrayList[Row]()
        (0 until 10).foreach(i => l.add(Row(b * 10L + i, url(h, i))))
        t.insert(spark.createDataFrame(l, sch).coalesce(1))
      }
      assert(t.manifest.files.size == 2)
      // correctness: an upper-range predicate must NOT lose rows to a
      // truncated max (maxUnbounded keeps both files eligible)
      assert(t.select(Seq("a"), col("u") > "https://y").count() == 10)
      // effectiveness: the truncated-prefix MIN still prunes a lower-range
      // predicate down to the one matching file
      val q = t.select(Seq("a"), col("u") < "https://b")
      assert(q.collect().map(_.getLong(0)).toSet == (0L until 10L).toSet)
      val scanned = q.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }.sum
      assert(scanned == 1, s"scanned $scanned of 2 files, want 1")
    }
  }
}
