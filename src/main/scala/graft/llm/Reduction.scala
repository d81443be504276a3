package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._

/**
 * Embedding dimensionality reduction — distributed PCA.
 *
 * Fitting is ONE corpus pass: each partition accumulates (n, Σx, upper
 * triangle of Σxxᵀ) into fixed dim-sized arrays (`treeAggregate`, the
 * documented per-partition-imperative RDD exception — a DataFrame explode
 * to (i, j, xᵢxⱼ) rows would blow the scan up by dim²). The dim×dim
 * covariance then eigendecomposes DRIVER-side (cyclic Jacobi — exact for
 * symmetric matrices, dim ≤ a few thousand is microseconds); that split
 * mirrors the BPE/tokenizer pattern: model fitting is small-data, model
 * APPLICATION is the corpus-scale pass, here a native codegen projection
 * expression carrying mean + components in the plan.
 *
 * Why it matters at 100 TB: 64→8-dim embeddings cut ANN index memory and
 * distance compute 8× with most variance retained — the standard pre-step
 * before IVF/PQ indexing of web-scale embedding corpora.
 */
object Reduction {

  /** Fitted model: per-dimension means, top-k orthonormal principal axes
    * (each `dim` long, variance-descending), and their eigenvalues. */
  case class PcaModel(mean: Array[Double],
                      components: Array[Array[Double]],
                      explainedVariance: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  /** Fit PCA on an `array<float|double>` column. One distributed pass +
    * driver-side eigendecomposition of the dim×dim covariance. */
  def pcaFit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    val tri = dim * (dim + 1) / 2
    val rows = df.select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .where(col("v").isNotNull)
      .rdd.map(_.getSeq[Double](0).toArray)
    val (n, sum, xx) = rows.treeAggregate(
      (0L, new Array[Double](dim), new Array[Double](tri)))(
      seqOp = { case ((n0, s, t), x) =>
        var i = 0
        var p = 0
        while (i < dim) {
          val xi = x(i)
          s(i) += xi
          var j = i
          while (j < dim) { t(p) += xi * x(j); j += 1; p += 1 }
          i += 1
        }
        (n0 + 1L, s, t)
      },
      combOp = { case ((na, sa, ta), (nb, sb, tb)) =>
        var i = 0
        while (i < dim) { sa(i) += sb(i); i += 1 }
        var p = 0
        while (p < tri) { ta(p) += tb(p); p += 1 }
        (na + nb, sa, ta)
      })
    require(n > 1, s"need at least 2 rows to fit PCA, got $n")
    val mean = sum.map(_ / n)
    // covariance (population): C(i,j) = E[x_i x_j] − µ_i µ_j
    val cov = Array.ofDim[Double](dim, dim)
    var p = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = xx(p) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; p += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    // top-k by eigenvalue desc, deterministic index tie-break
    val order = eigVals.indices.sortBy(ix => (-eigVals(ix), ix)).take(k)
    PcaModel(mean,
      order.map(ix => eigVecs.map(_(ix))).toArray,
      order.map(ix => math.max(eigVals(ix), 0.0)).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). O(dim³) per sweep, a few
    * sweeps to converge — driver-side microseconds at embedding dims. */
  def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sign(0) must be +1: equal diagonal entries need the full 45°
            // rotation, not a no-op
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project a vector column onto the model's principal axes:
    * `y_c = Σ_j (x_j − µ_j) V_c_j`, output `array<float>` of length k.
    * Native codegen expression — the corpus-scale pass stays map-side. */
  def pcaProject(vec: Column, model: PcaModel): Column =
    Glue.column(PcaProjectExpr(Glue.expression(vec), model))

  /** Mean reconstruction error (squared L2) of projecting to the model's
    * k axes and lifting back — the quality metric of a chosen k. */
  def reconstructionMse(df: DataFrame, vecCol: String,
                        model: PcaModel): Double = {
    val proj = pcaProject(col(vecCol), model)
    // ||x − µ||² − ||y||²: exact because V is orthonormal — no second pass
    // over components needed
    val centeredSq = graft.functions.Distances.l2sq(
      col(vecCol).cast(ArrayType(DoubleType)),
      lit(model.mean))
    val r = df.select(avg(centeredSq -
      graft.functions.Distances.ip(proj, proj)).as("mse"))
      .head()
    if (r.isNullAt(0)) 0.0 else math.max(r.getDouble(0), 0.0)
  }
}

/** Codegen'd PCA projection (reference-object pattern, like TokenStats). */
case class PcaProjectExpr(child: Expression, model: Reduction.PcaModel)
    extends UnaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pca_project requires array<float>/array<double>, got ${dt.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = math.min(arr.numElements(), model.dim)
    val out = new Array[Any](model.k)
    val f = isFloat
    var c = 0
    while (c < model.k) {
      val comp = model.components(c)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val xj = if (f) arr.getFloat(j).toDouble else arr.getDouble(j)
        acc += (xj - model.mean(j)) * comp(j)
        j += 1
      }
      out(c) = acc.toFloat
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcaProject", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
