package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The driver's correctness checker sorts result rows cell-wise in pandas
  * (`sort_values` → `factorize`), which CRASHES on array/map/struct cells
  * ("unhashable type: numpy.ndarray" — the one red row of round 12, gate
  * tp1_token_pack). Every gate output must therefore be scalar-typed at
  * the top level. This spec constructs every `SparkEntry.queries` frame at
  * sf0.001 and rejects any non-scalar column before the driver can.
  */
class GateSchemaSpec extends SparkSpec {

  test("every correctness-gate output schema is scalar-typed") {
    val dir = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, dir).schema
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-scalar gate columns (driver checker cannot sort these): " +
        offenders.mkString(", "))
  }
}
