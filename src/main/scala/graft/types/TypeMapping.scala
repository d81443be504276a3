package graft.types

import org.apache.spark.sql.types._

/**
 * Arrow-like logical type system → Spark SQL type mapping.
 *
 * Mirrors the reference SDK's supported-type list (vastdb docs/types.md:1-26,
 * serialization vastdb/_internal.py:2614-2765) with the widening rules from
 * SURVEY §1.3:
 *   - unsigned ints widen to the next signed Spark type (uint64 → Decimal(20,0))
 *   - float16 widens to FloatType
 *   - time32/time64 have no Spark analog → LongType + `vast.type` metadata tag
 *   - timestamp any-unit → TimestampType (µs); ns truncates (documented)
 *   - fixed_size_list<T,n> → ArrayType(T, containsNull=false) + `vast.fixedSize`
 *   - null / dictionary / union are rejected (reference rejects them too,
 *     vastdb/tests/test_tables.py:474-481)
 */
object TypeMapping {

  /** Metadata keys used to round-trip the original logical type. */
  val OriginalTypeKey = "vast.type"
  val FixedSizeKey = "vast.fixedSize"

  /** Logical (Arrow-like) types accepted by the engine's schema validator. */
  sealed trait LogicalType { def name: String }
  case object LBool extends LogicalType { val name = "bool" }
  case object LInt8 extends LogicalType { val name = "int8" }
  case object LInt16 extends LogicalType { val name = "int16" }
  case object LInt32 extends LogicalType { val name = "int32" }
  case object LInt64 extends LogicalType { val name = "int64" }
  case object LUInt8 extends LogicalType { val name = "uint8" }
  case object LUInt16 extends LogicalType { val name = "uint16" }
  case object LUInt32 extends LogicalType { val name = "uint32" }
  case object LUInt64 extends LogicalType { val name = "uint64" }
  case object LFloat16 extends LogicalType { val name = "float16" }
  case object LFloat32 extends LogicalType { val name = "float32" }
  case object LFloat64 extends LogicalType { val name = "float64" }
  case object LUtf8 extends LogicalType { val name = "utf8" }
  case object LBinary extends LogicalType { val name = "binary" }
  final case class LFixedSizeBinary(width: Int) extends LogicalType {
    val name = s"fixed_size_binary($width)"
  }
  final case class LDecimal(precision: Int, scale: Int) extends LogicalType {
    require(precision <= 38, "decimal precision must be <= 38")
    val name = s"decimal128($precision,$scale)"
  }
  case object LDate32 extends LogicalType { val name = "date32" }
  /** unit ∈ {s, ms, us, ns}; stored as LongType in that unit. */
  final case class LTime(unit: String) extends LogicalType {
    require(Set("s", "ms", "us", "ns")(unit), s"bad time unit $unit")
    val name = s"time[$unit]"
  }
  final case class LTimestamp(unit: String, tz: Option[String]) extends LogicalType {
    val name = s"timestamp[$unit${tz.fold("")("," + _)}]"
  }
  final case class LList(elem: LogicalType) extends LogicalType {
    val name = s"list<${elem.name}>"
  }
  final case class LFixedSizeList(elem: LogicalType, size: Int) extends LogicalType {
    val name = s"fixed_size_list<${elem.name},$size>"
  }
  final case class LStruct(fields: Seq[(String, LogicalType)]) extends LogicalType {
    val name = s"struct<${fields.map { case (n, t) => s"$n:${t.name}" }.mkString(",")}>"
  }
  final case class LMap(key: LogicalType, value: LogicalType) extends LogicalType {
    val name = s"map<${key.name},${value.name}>"
  }

  /** Types the reference rejects outright; we reject them too for parity. */
  final case class UnsupportedTypeException(msg: String)
    extends IllegalArgumentException(msg)

  /** Logical → Spark physical type. Tags metadata when lossy/widened. */
  def toSpark(t: LogicalType): (DataType, Metadata) = {
    def tag(dt: DataType): (DataType, Metadata) =
      (dt, new MetadataBuilder().putString(OriginalTypeKey, t.name).build())
    t match {
      case LBool => (BooleanType, Metadata.empty)
      case LInt8 => (ByteType, Metadata.empty)
      case LInt16 => (ShortType, Metadata.empty)
      case LInt32 => (IntegerType, Metadata.empty)
      case LInt64 => (LongType, Metadata.empty)
      case LUInt8 => tag(ShortType)
      case LUInt16 => tag(IntegerType)
      case LUInt32 => tag(LongType)
      case LUInt64 => tag(DecimalType(20, 0))
      case LFloat16 => tag(FloatType)
      case LFloat32 => (FloatType, Metadata.empty)
      case LFloat64 => (DoubleType, Metadata.empty)
      case LUtf8 => (StringType, Metadata.empty)
      case LBinary => (BinaryType, Metadata.empty)
      case LFixedSizeBinary(_) => tag(BinaryType)
      case LDecimal(p, s) => (DecimalType(p, s), Metadata.empty)
      case LDate32 => (DateType, Metadata.empty)
      case LTime(_) => tag(LongType)
      case LTimestamp(_, _) => tag(TimestampType)
      case LList(e) =>
        val (et, _) = toSpark(e)
        (ArrayType(et, containsNull = true), Metadata.empty)
      case LFixedSizeList(e, n) =>
        val (et, _) = toSpark(e)
        (ArrayType(et, containsNull = false),
          new MetadataBuilder()
            .putString(OriginalTypeKey, t.name)
            .putLong(FixedSizeKey, n.toLong)
            .build())
      case LStruct(fs) =>
        val sf = fs.map { case (n, ft) =>
          val (dt, md) = toSpark(ft)
          StructField(n, dt, nullable = true, md)
        }
        (StructType(sf), Metadata.empty)
      case LMap(k, v) =>
        val (kt, _) = toSpark(k)
        val (vt, _) = toSpark(v)
        (MapType(kt, vt, valueContainsNull = true), Metadata.empty)
    }
  }

  /** Fixed-size-list element rule from the reference: element must be a
    * non-nullable numeric/decimal/date/time/timestamp
    * (vastdb/tests/test_fixed_list.py:20-78). */
  def validateFixedSizeListElem(e: LogicalType): Unit = e match {
    case LBool | LUtf8 | LBinary | _: LList | _: LStruct | _: LMap |
         _: LFixedSizeList | _: LFixedSizeBinary =>
      throw UnsupportedTypeException(
        s"fixed_size_list element ${e.name} not supported")
    case _ => ()
  }

  /** Schema validation entry point. */
  def toSparkSchema(fields: Seq[(String, LogicalType)]): StructType = {
    StructType(fields.map { case (n, t) =>
      t match {
        case LFixedSizeList(e, _) => validateFixedSizeListElem(e)
        case _ => ()
      }
      val (dt, md) = toSpark(t)
      StructField(n, dt, nullable = true, md)
    })
  }

  /** Name of the engine-managed internal row-id column
    * (reference `$row_id`, vastdb/table.py:41-44). `$` is not a legal
    * Spark identifier start, so we use an underscore. */
  val RowIdColumn = "_row_id"
}
