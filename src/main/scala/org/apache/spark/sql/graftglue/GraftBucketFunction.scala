package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/**
 * The catalog-exposed `bucket` function that backs storage-partitioned
 * joins over graft bucket layouts. Spark resolves a scan-reported
 * `bucket(n, keys…)` transform through the table's `FunctionCatalog`
 * ([[GraftSqlCatalog.loadFunction]]) — without a loadable function the
 * reported partitioning is silently discarded and joins keep shuffling.
 *
 * Two co-bucketed scans compare partitionings by `canonicalName` (plus the
 * bucket count held in the transform), so the name encodes the KEY TYPES:
 * `hash(int 7)` and `hash(bigint 7)` differ in Spark's Murmur3, and letting
 * an int-keyed table match a bigint-keyed one would silently drop join
 * rows. Mismatched key types instead fall back to a plain shuffled join.
 *
 * `produceResult` replicates the assignment arithmetic of the write path
 * (`pmod(hash(keys…), n)` — [[graft.api.Table.optimizeBuckets]]): seed 42,
 * per-key Murmur3 fold truncated to int, nulls skipped, floor-mod at the
 * end. It is only ever EVALUATED if one side of a join needs an on-the-fly
 * shuffle into this partitioning (`spark.sql.sources.v2.bucketing.shuffle.
 * enabled`); matching the write path bit-for-bit keeps that mode correct
 * too, not just the both-sides-bucketed fast path.
 */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, keys…): graft hash-bucket id, pmod(murmur3(keys), n)"

  override def bind(inputType: StructType): BoundFunction = {
    val fields = inputType.fields
    if (fields.length < 2 || fields.head.dataType != IntegerType)
      throw new UnsupportedOperationException(
        s"bucket expects (int n, key…), got ${inputType.simpleString}")
    new Bound(fields.map(_.dataType))
  }

  private final class Bound(types: Array[DataType])
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = types
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${types.drop(1).map(_.catalogString).mkString(",")})"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = false

    override def produceResult(row: InternalRow): Integer = {
      val n = row.getInt(0)
      // the exact fold of Spark's hash(): int seed 42, each step's 64-bit
      // result truncated to int before seeding the next; null keys skipped
      var h = 42
      var i = 1
      while (i < types.length) {
        if (!row.isNullAt(i))
          h = Murmur3HashFunction.hash(row.get(i, types(i)), types(i), h).toInt
        i += 1
      }
      ((h % n) + n) % n
    }
  }
}
