package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering support: maps a row's clustering-key
 * values to one interleaved `long` so that range-partitioning + sorting on
 * that single value co-locates rows that are close in EVERY key dimension.
 * Files written in z-order then carry tight per-file min/max zone maps on
 * ALL clustering keys simultaneously, and the existing
 * `Table.pruneByZoneMaps` file skipping starts working for multi-column
 * predicates — the layout lever a single-column sort cannot provide (a
 * sort gives tight ranges on the lead key only; every other key spans the
 * whole domain in every file).
 *
 * The reference's server keeps data semi-sorted per its internal layout
 * (vastdb/table.py:996-1008 exposes only the sorting-key form); z-order is
 * the standard open-format extension of the same idea to multi-key
 * predicates.
 *
 * Scale shape: boundary estimation is one job over a bounded sample
 * (`SampleTarget` rows collected to the driver regardless of table size);
 * the z-value itself is a static expression tree of built-in functions
 * (no UDF), so the rewrite plan is scan → project → range exchange →
 * local sort → write, identical in shape to `optimizeSort`.
 */
object Zorder {

  /** Quantile buckets per key = 2^Bits; 8 bits × up to 8 keys × 8 bits
    * fits a 64-bit z-value. */
  val Bits = 8
  val MaxKeys = 8

  /** Driver-side sample bound for boundary estimation. */
  val SampleTarget = 65536L

  /** Per-key quantile boundaries (at most 2^Bits - 1 values each, sorted
    * ascending) from ONE bounded-sample pass over `df`. Quantile — not
    * equi-width — bucketing keeps the curve balanced under skew: each
    * bucket holds ~1/256th of the rows, so no handful of buckets (and
    * thus files) absorbs a hot key range. */
  def boundaries(df: DataFrame, keys: Seq[String], totalRows: Long)
      : Map[String, Seq[Any]] = {
    val fraction =
      if (totalRows <= 0L) 1.0
      else math.min(1.0, SampleTarget.toDouble / totalRows)
    // fixed seed: the rewrite must be deterministic for a given table state
    val sampled = df.select(keys.map(col): _*)
      .sample(withReplacement = false, fraction, seed = 42L)
      .collect()
    keys.zipWithIndex.map { case (k, i) =>
      val vals = sampled.iterator.map(_.get(i)).filter(_ != null).toArray
      // per-column values share one runtime class; natural ordering covers
      // every zone-mappable type (boxed numerics, String, Timestamp, Date)
      java.util.Arrays.sort(vals.asInstanceOf[Array[AnyRef]])
      val n = vals.length
      val cuts =
        if (n == 0) Seq.empty[Any]
        else (1 until (1 << Bits)).map(b => vals((b * n) >> Bits).asInstanceOf[Any])
          .distinct
      k -> cuts
    }.toMap
  }

  /** Bucket index of `keyCol` in [0, 2^Bits): the number of boundaries at
    * or below the value. A null key compares null against every boundary,
    * the filter drops all of them, and the row lands in bucket 0 — nulls
    * cluster together at the low end, deterministically. */
  private def bucket(keyCol: Column, cuts: Seq[Any]): Column =
    if (cuts.isEmpty) lit(0L)
    else size(filter(array(cuts.map(lit(_)): _*), b => b <= keyCol)).cast("long")

  /** Interleave the keys' bucket bits into one Morton value: bit `b` of
    * key `j` lands at position `b * nKeys + j`, so truncating high bits of
    * the z-value truncates all keys' resolutions evenly — the property
    * that makes sorting by z cluster every dimension at once. */
  private def interleave(buckets: Seq[Column]): Column = {
    val n = buckets.size
    val terms = for {
      bit <- 0 until Bits
      j <- buckets.indices
    } yield shiftleft(
      shiftright(buckets(j), bit).bitwiseAND(lit(1L)), bit * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The z-value column for `keys` over `df`. One bounded-sample job runs
    * eagerly (boundary estimation); the returned column is a pure
    * built-in-function expression over the keys. */
  def zColumn(df: DataFrame, keys: Seq[String], totalRows: Long): Column = {
    require(keys.nonEmpty, "z-order needs at least one clustering key")
    require(keys.size <= MaxKeys,
      s"z-order supports at most $MaxKeys keys (${keys.size} given)")
    val bounds = boundaries(df, keys, totalRows)
    interleave(keys.map(k => bucket(col(k), bounds(k))))
  }
}
