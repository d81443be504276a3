package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.scan.Pred
import graft.scan.Pred._

/**
 * Property-based dual-execution test (the reference's randomized-grid role,
 * vastdb/tests/test_fixed_list.py:20-78): random predicate trees are
 * evaluated BOTH by Spark (compile → Column → filter) and by a direct Scala
 * interpreter over the same rows; the surviving row-id sets must agree.
 */
class PredicatePropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("a", IntegerType, nullable = true),
    StructField("s", StringType, nullable = true)))

  private val rows: Seq[(Int, Option[Int], Option[String])] =
    (0 until 64).map { i =>
      val a = if (i % 13 == 0) None else Some(i % 7)
      val s = if (i % 11 == 0) None else Some(("ab" + (i % 5)) * (i % 3 + 1))
      (i, a, s)
    }

  private lazy val df = {
    val data = rows.map { case (i, a, s) =>
      Row(i, a.map(Int.box).orNull, s.orNull)
    }
    val l = new java.util.ArrayList[Row]()
    data.foreach(l.add)
    spark.createDataFrame(l, schema).cache()
  }

  // ---- direct Scala interpreter (SQL ternary logic) ----
  private def evalPred(p: Pred, a: Option[Int], s: Option[String]): Option[Boolean] = {
    def cmpA(v: Any, f: (Int, Int) => Boolean): Option[Boolean] =
      a.map(x => f(x, v.asInstanceOf[Int]))
    def cmpS(v: Any, f: (String, String) => Boolean): Option[Boolean] =
      s.map(x => f(x, v.asInstanceOf[String]))
    p match {
      case Eq(Ref(Seq("a")), v) => cmpA(v, _ == _)
      case Ne(Ref(Seq("a")), v) => cmpA(v, _ != _)
      case Lt(Ref(Seq("a")), v) => cmpA(v, _ < _)
      case Le(Ref(Seq("a")), v) => cmpA(v, _ <= _)
      case Gt(Ref(Seq("a")), v) => cmpA(v, _ > _)
      case Ge(Ref(Seq("a")), v) => cmpA(v, _ >= _)
      case Between(Ref(Seq("a")), lo, hi) =>
        a.map(x => x >= lo.asInstanceOf[Int] && x <= hi.asInstanceOf[Int])
      case IsIn(Ref(Seq("a")), vs) => a.map(x => vs.contains(x))
      case IsNull(Ref(Seq("a"))) => Some(a.isEmpty)
      case Eq(Ref(Seq("s")), v) => cmpS(v, _ == _)
      case StartsWith(Ref(Seq("s")), pre) => s.map(_.startsWith(pre))
      case Contains(Ref(Seq("s")), sub) => s.map(_.contains(sub))
      case IsNull(Ref(Seq("s"))) => Some(s.isEmpty)
      case Not(q) => evalPred(q, a, s).map(!_)
      case And(ps) =>
        val vs = ps.map(evalPred(_, a, s))
        if (vs.contains(Some(false))) Some(false)
        else if (vs.forall(_ == Some(true))) Some(true) else None
      case Or(ps) =>
        val vs = ps.map(evalPred(_, a, s))
        if (vs.contains(Some(true))) Some(true)
        else if (vs.forall(_ == Some(false))) Some(false) else None
      case True => Some(true)
      case False => Some(false)
      case other => throw new IllegalStateException(s"gen produced $other")
    }
  }

  // ---- generators ----
  private val genLeafA: Gen[Pred] = for {
    v <- Gen.choose(0, 7)
    p <- Gen.oneOf(
      Eq(Ref("a"), v), Ne(Ref("a"), v), Lt(Ref("a"), v), Le(Ref("a"), v),
      Gt(Ref("a"), v), Ge(Ref("a"), v), Between(Ref("a"), v, v + 2),
      IsIn(Ref("a"), Seq(v, v + 1)), IsNull(Ref("a")), Not(IsNull(Ref("a"))))
  } yield p

  private val genLeafS: Gen[Pred] = for {
    pre <- Gen.oneOf("ab", "ab0", "x", "")
    p <- Gen.oneOf(
      Eq(Ref("s"), "ab0"), StartsWith(Ref("s"), pre),
      Contains(Ref("s"), "b1"), IsNull(Ref("s")), Not(IsNull(Ref("s"))))
  } yield p

  private def genOrGroup: Gen[Pred] = for {
    onA <- Gen.oneOf(true, false)
    leafGen = if (onA) genLeafA else genLeafS
    n <- Gen.choose(1, 3)
    ls <- Gen.listOfN(n, leafGen)
    // keep the group reference-legal: no contains inside a multi-leaf OR
    legal = if (ls.size > 1) ls.filterNot(_.isInstanceOf[Contains]) else ls
    if legal.nonEmpty
  } yield if (legal.size == 1) legal.head else Or(legal)

  private val genPred: Gen[Pred] = for {
    n <- Gen.choose(1, 3)
    gs <- Gen.listOfN(n, genOrGroup)
  } yield if (gs.size == 1) gs.head else And(gs)

  test("random reference-legal predicates: Spark filter == direct evaluation") {
    val prop = Prop.forAll(genPred) { p =>
      Pred.validate(p) // must be accepted by the parity validator
      val sparkIds = df.filter(Pred.compile(p))
        .select("id").collect().map(_.getInt(0)).toSet
      val directIds = rows.collect {
        case (i, a, s) if evalPred(p, a, s).contains(true) => i
      }.toSet
      sparkIds == directIds
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.status.toString)
  }
}
