package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The relational layer the reference delegates to its post-processing engine
 * (DuckDB / PyArrow — vastdb README.md:230-246, tests/test_duckdb.py:12-29).
 * Its wire IR reserves the full algebra (Aggregate, Join, Limit, OrderBy,
 * Project, Filter, SetOperation, WindowCall — SURVEY §2.9); here each IR
 * relation maps onto the Spark operator that Catalyst already optimizes.
 *
 * These wrappers exist so the operator inventory is enumerable and uniformly
 * tested; they deliberately add nothing on top of Spark — partial aggregation,
 * join-strategy selection (broadcast vs sort-merge), AQE skew handling and
 * whole-stage codegen all come from the engine.
 */
object Relational {

  /** All seven wire-IR JoinKind values
    * (vast_flatbuf/.../JoinKind.py:5-13 → Spark join types). */
  val joinKinds: Map[String, String] = Map(
    "Inner" -> "inner",
    "LeftOuter" -> "left",
    "RightOuter" -> "right",
    "FullOuter" -> "full",
    "LeftSemi" -> "left_semi",
    "Anti" -> "left_anti",
    "Cross" -> "cross")

  def join(l: DataFrame, r: DataFrame, cond: Column, kind: String): DataFrame =
    joinKinds.get(kind) match {
      case Some("cross") => l.crossJoin(r)
      case Some(t) => l.join(r, cond, t)
      case None => l.join(r, cond, kind) // already a Spark join-type string
    }

  /** Broadcast-hinted join for dimension tables (explicit scale posture:
    * at 100 TB the fact side never shuffles for a small-dim join). */
  def broadcastJoin(fact: DataFrame, dim: DataFrame, cond: Column,
                    kind: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, joinKinds.getOrElse(kind, kind))

  /** IR SetOpKind = {Union, Intersection, Difference}
    * (vast_flatbuf/.../SetOpKind.py:6-9). */
  def union(l: DataFrame, r: DataFrame): DataFrame = l.union(r)
  def unionByName(l: DataFrame, r: DataFrame): DataFrame =
    l.unionByName(r, allowMissingColumns = true)
  def intersect(l: DataFrame, r: DataFrame): DataFrame = l.intersect(r)
  def except(l: DataFrame, r: DataFrame): DataFrame = l.except(r)

  /** Distributed top-k: orderBy+limit plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort) — the only ORDER BY the
    * reference system itself supports is exactly this shape
    * (vector search, vastdb/_adbc.py:133-159). */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
}
