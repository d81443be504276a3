package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._

/**
 * Model-based quality classification for training-data curation: a
 * distributed logistic-regression fit over a feature column (typically
 * [[TextAnalysis.hashEmbedding]] — the fasttext-style "train a cheap linear
 * classifier on hashed bag-of-words, score the whole corpus" recipe used by
 * web-corpus pipelines to keep "looks like a reference corpus" documents).
 *
 * Reference analog: the reference delegates post-scan analytics to an
 * external engine (`/root/reference/README.md:230-246`); a model-assisted
 * quality filter is exactly the kind of corpus-scale pass a training-data
 * user runs downstream, so it is first-class here.
 *
 * Scale shape — the same "fit is bounded, application is map-side" split
 * documented in LIMITS.md for BPE/PCA/LM, except the fit itself is ALSO
 * distributed: every iteration (GD or Newton) is one map-side pass over
 * the corpus through the fused [[LrNewtonStats]] aggregate, whose state is
 * O(dim) (GD) / O(dim²) (Newton) PER PARTITION. Nothing corpus-sized ever
 * reaches the driver; the only collect is the statistics vector per
 * iteration (metadata-scale, like the IVF centroid fetch). Scoring is a
 * pure codegen'd map-side column — zero shuffles at 100 TB.
 *
 * Determinism — every cross-row reduction is EXACT and therefore
 * layout-independent: fit statistics quantize per row to 2⁻⁴⁰ fixed point
 * and sum in 128-bit integer arithmetic (associative + commutative);
 * the accuracy metric stages through DECIMAL(38,18) like the gate's
 * `DSUM`. A plain double sum would make the learned weights
 * partition-order-dependent, and with them every downstream keep/drop
 * decision. Per-row arithmetic (sigmoid, dot) stays pure IEEE.
 */
object Classifier {

  /** A fitted linear model: `score(x) = sigmoid(w · x + b)`. */
  case class LrModel(weights: Array[Double], bias: Double,
                     lossHistory: Array[Double]) {
    def dim: Int = weights.length
  }

  private val SumType = DecimalType(38, 18)

  /** Order-independent exact sum of a double column (cross-row sums must
    * not depend on partition order — same contract as the gate's DSUM). */
  private def xsum(c: Column): Column = sum(c.cast(SumType)).cast("double")

  /** `w · x + b` over an `array<float|double>` column, as a left-to-right
    * codegen'd HOF fold (deterministic per row). */
  private def dotPlusBias(vec: Column, w: Array[Double], b: Double): Column =
    aggregate(
      zip_with(vec.cast("array<double>"), lit(w), (x, wi) => x * wi),
      lit(b), (acc, v) => acc + v)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** The iterated statistics passes are only as parallel as the feature
    * table's partitioning, and a small-file corpus (one parquet footer)
    * otherwise serializes every pass through one task — repartition up to
    * the cluster's parallelism before materializing. Round-robin
    * repartition is layout-dependent, but the fit stays bit-deterministic
    * regardless: all cross-row reductions are exact (fixed-point integer /
    * decimal), associative, and commutative, so row placement cannot
    * change them. */
  private def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /**
   * Full-batch gradient descent on L2-regularized logistic loss.
   *
   * @param df       corpus with a feature vector column and a 0/1 label
   * @param labelCol 0.0/1.0 double (or castable) label column name
   * @param vecCol   `array<float|double>` feature column name, fixed `dim`
   * @param dim      feature dimensionality (must match the arrays)
   * @param iters    gradient steps (each = one corpus pass)
   * @param lr       learning rate
   * @param l2       L2 penalty on weights (never on the bias)
   *
   * The feature/label projection is checkpointed once so the `iters`
   * passes re-read a materialized two-column table instead of re-running
   * upstream lineage (at real scale: persist to a catalog table instead).
   * Prefer [[lrFitNewton]] below dim ≈ a few hundred (quadratic
   * convergence); THIS path exists for large dim, where the Newton
   * Hessian's O(dim²)-per-row kernel stops paying.
   */
  def lrFit(df: DataFrame, labelCol: String, vecCol: String, dim: Int,
            iters: Int = 30, lr: Double = 0.5, l2: Double = 1e-4): LrModel = {
    require(dim > 0 && iters >= 1, "dim and iters must be positive")
    val data = widen(df.select(col(labelCol).cast("double").as("_y"),
        col(vecCol).cast("array<double>").as("_x")))
      .localCheckpoint(true)
    val n = data.count().toDouble
    require(n > 0, "lrFit needs a non-empty corpus")

    val w = new Array[Double](dim)
    var b = 0.0
    val losses = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      // One corpus pass computes loss, bias gradient, and all `dim` weight
      // gradients through the fused fixed-point aggregate (Hessian off —
      // O(dim) per-row state, the GD path's reason to exist at large dim).
      val agg = LrNewtonStats(
        Glue.expression(col("_x")), Glue.expression(col("_y")),
        w.clone(), b, withHessian = false)
      val flat = data
        .select(Glue.column(agg.toAggregateExpression()).as("s"))
        .head().getSeq[Double](0).toArray
      val loss = flat(0)
      var i = 0
      while (i < dim) {
        w(i) -= lr * (flat(1 + i) / n + l2 * w(i))
        i += 1
      }
      b -= lr * (flat(1 + dim) / n)
      losses(it) = loss / n +
        l2 / 2.0 * w.map(x => x * x).sum // reg term for monotonicity checks
      it += 1
    }
    LrModel(w, b, losses)
  }

  /**
   * Newton/IRLS fit — the fast path when `dim` is modest (≲ 256): each
   * iteration is ONE corpus pass computing loss, gradient, and the upper
   * triangle of the (dim+1)² Hessian via a native typed-imperative
   * aggregate (`LrNewtonStats` — one fused per-row kernel accumulating
   * ALL O(dim²) statistics into a per-partition buffer, so nothing
   * per-row ever enters a shuffle; the exploded-rows formulation this
   * replaced paid a hash-aggregation row per statistic per row and was
   * ~5× slower at 10× scale), then a DRIVER-side (dim+1)-square solve
   * (Gaussian elimination with partial pivoting — microseconds; the same
   * "fit math is small, data passes are distributed" split as the PCA
   * eigensolve). Quadratic convergence: ~5 iterations land where gradient
   * descent needs hundreds.
   *
   * Scale note: the aggregate state is O(dim²) per PARTITION (partial
   * aggregation merges map-side), so the shuffle is metadata-sized. The
   * per-row kernel is O(dim²) arithmetic; past dim ≈ a few hundred,
   * prefer [[lrFit]] (O(dim)/row) and spend iterations instead.
   *
   * Determinism: identical contract to [[lrFit]] by different means —
   * per-row contributions quantize to 2⁻⁴⁰ fixed point (a deterministic
   * map; ~1e-12 relative quantization is far below anything the solve can
   * feel) and accumulate in EXACT 128-bit integer sums — associative and
   * commutative, so partitioning cannot change the fit, and the driver
   * solve runs a fixed sequence of IEEE ops on identical inputs.
   */
  def lrFitNewton(df: DataFrame, labelCol: String, vecCol: String, dim: Int,
                  iters: Int = 6, l2: Double = 1e-4): LrModel = {
    require(dim > 0 && iters >= 1, "dim and iters must be positive")
    val data = widen(df.select(col(labelCol).cast("double").as("_y"),
        col(vecCol).cast("array<double>").as("_x")))
      .localCheckpoint(true)
    val n = data.count().toDouble
    require(n > 0, "lrFitNewton needs a non-empty corpus")
    val d1 = dim + 1 // weights + bias
    val w = new Array[Double](dim)
    var b = 0.0
    val losses = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      val agg = LrNewtonStats(
        Glue.expression(col("_x")).asInstanceOf[Expression],
        Glue.expression(col("_y")).asInstanceOf[Expression],
        w.clone(), b)
      val flat = data
        .select(Glue.column(agg.toAggregateExpression()).as("s"))
        .head().getSeq[Double](0).toArray
      val loss = flat(0) / n
      val g = new Array[Double](d1)
      var i = 0
      while (i < d1) {
        g(i) = flat(1 + i) / n + (if (i < dim) l2 * w(i) else 0.0)
        i += 1
      }
      val h = Array.ofDim[Double](d1, d1)
      var k = 1 + d1
      i = 0
      while (i < d1) {
        var j = i
        while (j < d1) {
          val v = flat(k) / n
          h(i)(j) = v; h(j)(i) = v
          k += 1; j += 1
        }
        // ridge on weight coords only (never the bias), plus a tiny
        // absolute jitter so a degenerate Hessian still solves
        h(i)(i) += (if (i < dim) l2 else 0.0) + 1e-12
        i += 1
      }
      val step = solveSymmetric(h, g)
      i = 0
      while (i < dim) { w(i) -= step(i); i += 1 }
      b -= step(dim)
      losses(it) = loss + l2 / 2.0 * w.map(x => x * x).sum
      it += 1
    }
    LrModel(w, b, losses)
  }

  /** In-place Gaussian elimination with partial pivoting — deterministic
    * (fixed operation order), adequate for the (dim+1)-sized IRLS solve. */
  private[graft] def solveSymmetric(aIn: Array[Array[Double]],
                                  bIn: Array[Double]): Array[Double] = {
    val n = bIn.length
    val a = aIn.map(_.clone())
    val x = bIn.clone()
    var col0 = 0
    while (col0 < n) {
      var piv = col0
      var r = col0 + 1
      while (r < n) {
        if (math.abs(a(r)(col0)) > math.abs(a(piv)(col0))) piv = r
        r += 1
      }
      if (piv != col0) {
        val tr = a(piv); a(piv) = a(col0); a(col0) = tr
        val tx = x(piv); x(piv) = x(col0); x(col0) = tx
      }
      val d = a(col0)(col0)
      r = col0 + 1
      while (r < n) {
        val f = a(r)(col0) / d
        if (f != 0.0) {
          var c = col0
          while (c < n) { a(r)(c) -= f * a(col0)(c); c += 1 }
          x(r) -= f * x(col0)
        }
        r += 1
      }
      col0 += 1
    }
    var i = n - 1
    while (i >= 0) {
      var s = x(i)
      var c = i + 1
      while (c < n) { s -= a(i)(c) * x(c); c += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Map-side scoring column: `sigmoid(w · vec + b)` — codegen'd HOFs,
    * zero shuffles, broadcastable weights (they ride the plan as a
    * literal array). */
  def lrScore(vec: Column, model: LrModel): Column =
    sigmoid(dotPlusBias(vec, model.weights, model.bias))

  /** Hard 0/1 prediction at threshold 0.5. */
  def lrPredict(vec: Column, model: LrModel): Column =
    (lrScore(vec, model) >= 0.5).cast("int")

  /** Fraction of rows where `lrPredict` equals the 0/1 label — one
    * aggregate pass (decimal-staged, order-independent). */
  def accuracy(df: DataFrame, labelCol: String, vecCol: String,
               model: LrModel): Double =
    df.agg((xsum(when(lrPredict(col(vecCol), model) ===
        col(labelCol).cast("int"), 1.0).otherwise(0.0)) /
      count(lit(1))).as("acc"))
      .head().getDouble(0)

  /** One-row DataFrame encoding of a fitted model — the persistence format
    * for "fit once, score everywhere" (batch re-scoring, ingest-time
    * scoring in the streaming sink, cross-session reuse): store it in a
    * catalog table, load it back with [[modelFromDf]]. */
  def modelToDf(spark: org.apache.spark.sql.SparkSession,
                m: LrModel): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      List(org.apache.spark.sql.Row(
        m.dim, m.weights.toSeq, m.bias, m.lossHistory.toSeq)).asJava,
      StructType(Seq(
        StructField("dim", IntegerType, nullable = false),
        StructField("weights", ArrayType(DoubleType, containsNull = false)),
        StructField("bias", DoubleType, nullable = false),
        StructField("loss_history",
          ArrayType(DoubleType, containsNull = false)))))
  }

  /** Inverse of [[modelToDf]] (reads the single model row; the collect is
    * one row of dim doubles — metadata-scale). */
  def modelFromDf(df: DataFrame): LrModel = {
    val r = df.select("dim", "weights", "bias", "loss_history").head()
    val dim = r.getInt(0)
    val w = r.getSeq[Double](1).toArray
    require(w.length == dim, s"model row has ${w.length} weights, dim=$dim")
    LrModel(w, r.getDouble(2), r.getSeq[Double](3).toArray)
  }

  /** The composed corpus operator: fit a quality model on labeled rows
    * (Newton — few passes), score EVERY row map-side, and return
    * `(df.*, quality_score)`. The label can cover a subset (e.g. a
    * hand-curated sample joined on id); unlabeled rows still get scored. */
  def qualityClassifier(df: DataFrame, labeled: DataFrame, labelCol: String,
                        vecCol: String, dim: Int, iters: Int = 6,
                        l2: Double = 1e-4): DataFrame = {
    val m = lrFitNewton(labeled, labelCol, vecCol, dim, iters, l2)
    df.withColumn("quality_score", lrScore(col(vecCol), m))
  }
}

/**
 * Fused IRLS statistics aggregate for [[Classifier.lrFitNewton]]: given
 * features x (array<double>, length dim) and label y, with the CURRENT
 * weights riding the plan as expression state, accumulates
 * `[Σ loss, Σ grad(dim+1), Σ upper-tri Hessian]` directly into a
 * per-partition buffer — the whole Newton pass is one kernel invocation
 * per row plus a metadata-sized partial-aggregate merge. Neither a
 * dim²-wide Catalyst tree (codegen blowup), nor exploded rows (a hash-
 * aggregation row per statistic per row — measured ~5× slower at 10×
 * scale), nor a treeAggregate (partition-order-dependent doubles).
 *
 * Exactness/determinism: each per-row contribution quantizes to
 * 2⁻⁴⁰ fixed point (`Math.round(v·2⁴⁰)` — a deterministic per-row map)
 * and sums in 128-bit two's-complement integer arithmetic (hi/lo long
 * pairs) — exact, associative, commutative, so any partitioning and any
 * merge order produce identical totals. `eval` converts each 128-bit sum
 * to double once (correctly-rounded BigInteger→double), then scales by
 * the exact power of two. Headroom: |contribution| ≤ ~750 (loss at
 * z≈±700 saturation), so a 128-bit sum overflows only past ~10²³
 * rows — no realizable corpus.
 */
case class LrNewtonStats(left: Expression, right: Expression,
                         weights: Array[Double], bias: Double,
                         withHessian: Boolean = true,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private def dim = weights.length
  private def d1 = dim + 1
  private def nStats = 1 + d1 + (if (withHessian) d1 * (d1 + 1) / 2 else 0)
  private final val Scale = 1099511627776.0 // 2^40

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lr_newton_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (xs, ys) => TypeCheckResult.TypeCheckFailure(
        s"lr_newton_stats requires (array<double>, double), got ($xs, $ys)")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * nStats)

  /** 128-bit accumulate: buf[2k]=hi, buf[2k+1]=lo (two's complement). */
  private def add128(buf: Array[Long], k: Int, q: Long): Unit = {
    val lo = buf(2 * k + 1)
    val newLo = lo + q
    // unsigned carry out of the low word
    val carry = ((lo & q) | ((lo | q) & ~newLo)) >>> 63
    buf(2 * k) += (q >> 63) + carry
    buf(2 * k + 1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xv = left.eval(input)
    val yv = right.eval(input)
    if (xv == null || yv == null) return buf
    val arr = xv.asInstanceOf[ArrayData]
    val label = yv.asInstanceOf[Double]
    val xb = new Array[Double](d1)
    var i = 0
    val nEl = math.min(arr.numElements(), dim)
    while (i < nEl) { xb(i) = arr.getDouble(i); i += 1 }
    xb(dim) = 1.0
    var z = bias
    i = 0
    while (i < dim) { z += weights(i) * xb(i); i += 1 }
    val p = 1.0 / (1.0 + math.exp(-z))
    val err = p - label
    val wt = p * (1.0 - p)
    // stable log-loss: log1p(exp(-|z|)) + max(z,0) − y·z
    val loss = math.log1p(math.exp(-math.abs(z))) +
      (if (z > 0) (1.0 - label) * z else -label * z)
    add128(buf, 0, Math.round(loss * Scale))
    i = 0
    while (i < d1) {
      add128(buf, 1 + i, Math.round(err * xb(i) * Scale))
      i += 1
    }
    if (withHessian) {
      var k = 1 + d1
      i = 0
      while (i < d1) {
        val wxi = wt * xb(i)
        var j = i
        while (j < d1) {
          add128(buf, k, Math.round(wxi * xb(j) * Scale))
          k += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < nStats) {
      // 128-bit add of b's (hi, lo) into a
      val lo = a(2 * k + 1)
      val q = b(2 * k + 1)
      val newLo = lo + q
      val carry = ((lo & q) | ((lo | q) & ~newLo)) >>> 63
      a(2 * k) += b(2 * k) + carry
      a(2 * k + 1) = newLo
      k += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val mask = java.math.BigInteger.ONE.shiftLeft(64)
      .subtract(java.math.BigInteger.ONE)
    val out = new Array[Any](nStats)
    var k = 0
    while (k < nStats) {
      val v = java.math.BigInteger.valueOf(buf(2 * k)).shiftLeft(64)
        .add(java.math.BigInteger.valueOf(buf(2 * k + 1)).and(mask))
      out(k) = v.doubleValue() / Scale // exact power-of-two scaling
      k += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LrNewtonStats =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LrNewtonStats =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression) =
    copy(left = newLeft, right = newRight)
}
