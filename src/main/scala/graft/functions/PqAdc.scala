package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._

/**
 * Asymmetric-distance computation (ADC) for product-quantized vectors:
 * `sum_m lut[m][codes[m]]` where `codes` is a row's per-subspace codebook
 * assignment and `lut` is the query's precomputed table of
 * ||q_m - centroid(m, c)||² distances.
 *
 * This is the inner loop of PQ search (Jégou et al., "Product Quantization
 * for Nearest Neighbor Search", TPAMI 2011): the corpus scan touches only
 * the M-byte code rows — never the original vectors — and each row costs M
 * table lookups. A native codegen expression keeps that loop inside
 * whole-stage codegen (an interpreted `aggregate(zip_with(...))` lambda
 * chain costs ~1µs/element, which at 10⁹ rows × M=16 is hours of pure
 * interpreter overhead).
 *
 * Out-of-range codes (code < 0 or ≥ lut[m] length) and null sub-arrays
 * contribute +Infinity, so malformed rows sink to the bottom of a
 * nearest-first ranking instead of silently winning.
 */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && lutOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<int>, array<array<double>>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), lut.numElements())
    var acc = 0.0
    var i = 0
    while (i < m) {
      if (lut.isNullAt(i)) acc += Double.PositiveInfinity
      else {
        val row = lut.getArray(i)
        val c = codes.getInt(i)
        if (c < 0 || c >= row.numElements()) acc += Double.PositiveInfinity
        else acc += row.getDouble(c)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $m = java.lang.Math.min($codes.numElements(), $lut.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($lut.isNullAt($i)) { $acc += Double.POSITIVE_INFINITY; continue; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $lut.getArray($i);
         |  int $c = $codes.getInt($i);
         |  if ($c < 0 || $c >= $row.numElements()) $acc += Double.POSITIVE_INFINITY;
         |  else $acc += $row.getDouble($c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object PqAdc {
  /** ADC distance of a PQ code row against a query lookup table. */
  def pqAdc(codes: Column, lut: Column): Column =
    Glue.column(PqAdcDistance(Glue.expression(codes), Glue.expression(lut)))
}
