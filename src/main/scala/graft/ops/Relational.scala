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

  /** Equi-join with explicit key salting — for EXTREME skew that AQE's
    * skew-join splitting can't fix: a hot key whose matching rows on the
    * other side form one indivisible build bucket, on a pair where the other
    * side is too large to broadcast. The skewed side gets a deterministic
    * per-row salt in [0, saltFactor); the other side is replicated once per
    * salt value, so the hot key's probe rows spread across saltFactor tasks.
    * Cost: the other side's shuffle volume × saltFactor — use it targeted,
    * not as a default (AQE handles moderate skew for free). Inner/left only:
    * an unmatched other-side row would otherwise surface once per salt. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int, kind: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter")(
      kind.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins, got $kind")
    require(saltFactor > 1, "saltFactor must be > 1")
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor.toLong)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i)): _*)))
    salted.join(replicated, Seq(key, "_salt"), kind).drop("_salt")
  }

  /** IR SetOpKind = {Union, Intersection, Difference}
    * (vast_flatbuf/.../SetOpKind.py:6-9). */
  def union(l: DataFrame, r: DataFrame): DataFrame = l.union(r)
  def unionByName(l: DataFrame, r: DataFrame): DataFrame =
    l.unionByName(r, allowMissingColumns = true)
  def intersect(l: DataFrame, r: DataFrame): DataFrame = l.intersect(r)
  def except(l: DataFrame, r: DataFrame): DataFrame = l.except(r)

  /**
   * Interval (range) join: each `points` row matched to the `intervals` rows
   * whose [loCol, hiCol] contain its `atCol`, both sides also equi-joined on
   * `key`. The naive plan is a theta join (O(n·m) comparisons in one task
   * per key); this formulation BUCKETS time into fixed granules so
   * candidates co-locate under a key-partitioned equi-join: every interval
   * explodes to the granules it spans, every point maps to its granule, the
   * join key is (key, granule), and the exact BETWEEN filter runs on the
   * bounded candidate set. `granule` trades interval replication (long
   * intervals span many granules) against candidate width — pick it near the
   * typical interval length. One shuffle each side, no cross product.
   */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                atCol: String, loCol: String, hiCol: String,
                granuleMicros: Long = 3600000000L): DataFrame = {
    require(granuleMicros > 0, "granuleMicros must be positive")
    def bucket(c: Column): Column = floor(unix_micros(c) / granuleMicros)
    val pts = points.withColumn("_g", bucket(col(atCol)))
    // an interval appears once per granule it spans; a point lives in exactly
    // one granule, so each (point, interval) candidate pair joins once —
    // no post-join dedup needed
    val ivs = intervals
      .withColumn("_gr", explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
      .withColumnRenamed(key, "__rkey")
    pts.join(ivs, col(key) === col("__rkey") && col("_g") === col("_gr"))
      .filter(col(atCol) >= col(loCol) && col(atCol) <= col(hiCol))
      .drop("_g", "_gr", "__rkey")
  }

  /**
   * As-of join (time-series point-in-time lookup): for each left row, the
   * latest right row with rightTime <= leftTime per key. Composed from
   * built-ins (preference (a) over a custom SparkPlan): union the two sides
   * tagged, sort within key by time, and carry the last seen right values
   * forward with a running window — one shuffle on (key), no range
   * explosion, scales as a single sort-based pass.
   *
   * `right` must be unique per (key, time); pre-dedupe if not.
   * `rightCols` are the right-side value columns to carry.
   */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftTagged = left.withColumn("_t", col(leftTime))
      .withColumn("_is_left", lit(1))
    val rightTagged = rightCols.foldLeft(
        right.select((key +: rightTime +: rightCols).distinct.map(col): _*)) {
        (d, c) => d.withColumnRenamed(c, s"_r_$c")
      }
      .withColumnRenamed(rightTime, "_t")
      .withColumn("_is_left", lit(0))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal time (asof is inclusive)
    val w = Window.partitionBy(key).orderBy(col("_t").asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"_asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("_is_left") === 1)
      .drop("_t", "_is_left")
    rightCols.foldLeft(out) { (d, c) =>
      d.drop(s"_r_$c").withColumnRenamed(s"_asof_$c", s"asof_$c")
    }
  }

  /** Distributed top-k: orderBy+limit plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort) — the only ORDER BY the
    * reference system itself supports is exactly this shape
    * (vector search, vastdb/_adbc.py:133-159). */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
}
