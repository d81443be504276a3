package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api._
import graft.types.TypeMapping._

/**
 * Reference fixtures F2/F3 territory (FIXTURES.md): all-scalar-type
 * round-trips through the logical-type mapping, nested struct round-trips
 * with exhaustive projection permutations, and struct sub-field predicates
 * (vastdb/tests/test_nested.py:159-307, test_tables.py:389-471).
 */
class NestedTypesSpec extends SparkSpec {

  private def freshSession(): VastSession =
    VastSession(spark, Files.createTempDirectory("graft-nested").toString)

  test("F2: all-scalar logical types round-trip with widening metadata") {
    val s = freshSession()
    s.createBucket("b")
    s.transaction { tx =>
      val sc = tx.bucket("b").createSchema("m")
      val t = sc.createTable("scalars", Seq(
        "tb" -> LBool, "a1" -> LInt8, "a2" -> LInt16, "a4" -> LInt64,
        "b" -> LFloat32, "s" -> LUtf8, "d" -> LDecimal(7, 3),
        "bin" -> LBinary, "date" -> LDate32,
        "t3" -> LTime("ms"), "ts6" -> LTimestamp("us", None),
        "u8" -> LUInt8, "u64" -> LUInt64))
      val sch = t.schema
      assert(sch("a1").dataType == ByteType)
      assert(sch("d").dataType == DecimalType(7, 3))
      assert(sch("t3").dataType == LongType)
      assert(sch("t3").metadata.getString(OriginalTypeKey) == "time[ms]")
      assert(sch("u8").dataType == ShortType)
      assert(sch("u64").dataType == DecimalType(20, 0))
      val row = Row(true, 1.toByte, 2.toShort, 3L, 0.5f, "x",
        new java.math.BigDecimal("1234.567"), Array[Byte](1, 2),
        java.sql.Date.valueOf("2020-01-02"), 86399999L,
        java.sql.Timestamp.valueOf("2020-01-02 03:04:05.123456"),
        250.toShort, new java.math.BigDecimal("18446744073709551615"))
      t.insert(spark.createDataFrame(java.util.List.of(row), sch))
      val got = t.select().head()
      assert(got == row)
    }
  }

  test("nested struct round-trip + all projection permutations + sub-field predicate") {
    val s = freshSession()
    s.createBucket("b")
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("x", StructType(Seq(
        StructField("q", StructType(Seq(StructField("q1", StringType)))),
        StructField("n", IntegerType)))),
      StructField("tags", ArrayType(StringType)),
      StructField("kv", MapType(StringType, IntegerType))))
    s.transaction { tx =>
      val t = tx.bucket("b").createSchema("m").createTable("n", nested)
      val rows = java.util.List.of(
        Row(1L, Row(Row("AAA"), 10), Seq("a", "b"), Map("k" -> 1)),
        Row(2L, Row(Row("BBB"), 20), Seq("c"), Map("k" -> 2)))
      t.insert(spark.createDataFrame(rows, nested))
      // exhaustive projection permutations (reference test_nested.py:179-183)
      val cols = Seq("id", "x", "tags", "kv")
      for (perm <- cols.permutations.take(24)) {
        val got = t.select(perm)
        assert(got.columns.toSeq == perm)
        assert(got.count() == 2)
      }
      // struct sub-field predicate at depth 2 (test_nested.py:250-307)
      val hit = t.select(Seq("id"), col("x.q.q1") === "AAA")
      assert(hit.collect().map(_.getLong(0)).toSeq == Seq(1L))
      // predicate on struct-mid-level field
      val hit2 = t.select(Seq("id"), col("x.n") >= 20)
      assert(hit2.collect().map(_.getLong(0)).toSeq == Seq(2L))
      // array + map access in projection expressions
      val expr = t.select(internalRowId = false)
        .select(col("id"), element_at(col("tags"), 1).as("t0"),
          element_at(col("kv"), "k").as("kv_k"))
        .orderBy("id").collect()
      assert(expr.map(_.getString(1)).toSeq == Seq("a", "c"))
      assert(expr.map(_.getInt(2)).toSeq == Seq(1, 2))
    }
  }

  test("randomized fixed-size-list grid: element types × null probability round-trip") {
    // reference: parametrized type × nullability grids with randomized data
    // (vastdb/tests/test_fixed_list.py:20-78,115-127)
    val s = freshSession()
    s.createBucket("b")
    val rnd = new scala.util.Random(5)
    val elemTypes: Seq[(LogicalType, () => Any)] = Seq(
      (LFloat32, () => rnd.nextFloat()),
      (LFloat64, () => rnd.nextDouble()),
      (LInt32, () => rnd.nextInt()),
      (LInt64, () => rnd.nextLong()))
    s.transaction { tx =>
      val sc = tx.bucket("b").createSchema("m")
      for (((et, gen), idx) <- elemTypes.zipWithIndex; nullP <- Seq(0.0, 0.3)) {
        val t = sc.createTable(s"fsl_${idx}_${(nullP * 10).toInt}", Seq(
          "id" -> LInt64, "v" -> LFixedSizeList(et, 4)))
        val rows = (0 until 20).map { i =>
          val arr = if (rnd.nextDouble() < nullP) null
            else (0 until 4).map(_ => gen()).toArray
          Row(i.toLong, arr)
        }
        val l = new java.util.ArrayList[Row](); rows.foreach(l.add)
        t.insert(spark.createDataFrame(l, t.schema))
        val got = t.select().orderBy("id").collect()
        assert(got.length == 20)
        rows.zip(got).foreach { case (want, g) =>
          val wv = want.get(1)
          if (wv == null) assert(g.isNullAt(1))
          else assert(g.getSeq[Any](1).toSeq == wv.asInstanceOf[Array[_]].toSeq)
        }
        // fixed-size metadata survives the round trip
        assert(t.schema("v").metadata.getLong(FixedSizeKey) == 4L)
      }
    }
  }

  test("rejected schemas: null type and invalid FSL element") {
    val s = freshSession()
    s.createBucket("b")
    s.transaction { tx =>
      val sc = tx.bucket("b").createSchema("m")
      intercept[NotSupportedSchema] {
        sc.createTable("bad1", StructType(Seq(StructField("n", NullType))))
      }
      intercept[UnsupportedTypeException] {
        sc.createTable("bad2", Seq("v" -> LFixedSizeList(LUtf8, 3)))
      }
      // a transaction that only hit errors still commits cleanly
    }
  }
}
