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
      // reg term from the SAME weights the aggregate pass used (pre-step),
      // so lossHistory entries are f(w_it) exactly and monotonicity checks
      // compare like with like
      losses(it) = loss / n + l2 / 2.0 * w.map(x => x * x).sum
      var i = 0
      while (i < dim) {
        w(i) -= lr * (flat(1 + i) / n + l2 * w(i))
        i += 1
      }
      b -= lr * (flat(1 + dim) / n)
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
      // loss at the weights the pass evaluated (pre-step) — see lrFit
      losses(it) = loss + l2 / 2.0 * w.map(x => x * x).sum
      val step = solveSymmetric(h, g)
      i = 0
      while (i < dim) { w(i) -= step(i); i += 1 }
      b -= step(dim)
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

  /** A fitted multiclass linear model: `probs(x) = softmax(Wx + b)`. */
  case class SoftmaxModel(weights: Array[Array[Double]],
                          biases: Array[Double],
                          lossHistory: Array[Double]) {
    def k: Int = weights.length
    def dim: Int = weights(0).length
  }

  /**
   * Multinomial (softmax) logistic regression by Newton/IRLS — the
   * MULTICLASS companion to [[lrFitNewton]] for domain/source
   * classification (the decision input for [[Curation.domainMix]]-style
   * weighting when domains are unlabeled). Each iteration is one corpus
   * pass through [[SoftmaxNewtonStats]] (fused kernel, Fixed128 exact
   * sums — bit-deterministic across layouts) followed by one driver-side
   * (K·(dim+1))-square solve. The block Hessian is PSD for softmax, made
   * definite by the L2 ridge (which also pins the softmax's shift
   * redundancy). Labels are 0-based class indexes in [0, numClasses);
   * out-of-range labels are skipped.
   *
   * The per-row kernel and driver solve are O((K·dim)²) — intended for
   * modest K·dim (a few hundred). Beyond that, run K one-vs-rest
   * [[lrFitNewton]] fits instead.
   */
  def softmaxFit(df: DataFrame, labelCol: String, vecCol: String, dim: Int,
                 numClasses: Int, iters: Int = 8,
                 l2: Double = 1e-4): SoftmaxModel = {
    require(dim > 0 && numClasses >= 2 && iters >= 1,
      "need dim > 0, numClasses >= 2, iters >= 1")
    val data = widen(df.select(col(labelCol).cast("double").as("_y"),
        col(vecCol).cast("array<double>").as("_x")))
      .localCheckpoint(true)
    val n = data.count().toDouble
    require(n > 0, "softmaxFit needs a non-empty corpus")
    val d1 = dim + 1
    val kd = numClasses * d1
    val w = Array.fill(numClasses)(new Array[Double](dim))
    val b = new Array[Double](numClasses)
    val losses = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      val agg = SoftmaxNewtonStats(
        Glue.expression(col("_x")), Glue.expression(col("_y")),
        w.map(_.clone()), b.clone())
      val flat = data
        .select(Glue.column(agg.toAggregateExpression()).as("s"))
        .head().getSeq[Double](0).toArray
      val g = new Array[Double](kd)
      var m = 0
      while (m < kd) {
        val i = m % d1
        g(m) = flat(1 + m) / n +
          (if (i < dim) l2 * w(m / d1)(i) else 0.0)
        m += 1
      }
      val h = Array.ofDim[Double](kd, kd)
      var off = 1 + kd
      var m1 = 0
      while (m1 < kd) {
        var m2 = m1
        while (m2 < kd) {
          val v = flat(off) / n
          h(m1)(m2) = v; h(m2)(m1) = v
          off += 1; m2 += 1
        }
        h(m1)(m1) += (if (m1 % d1 < dim) l2 else 0.0) + 1e-9
        m1 += 1
      }
      // loss at the weights the pass evaluated (pre-step) — see lrFit
      var reg = 0.0
      var k = 0
      while (k < numClasses) {
        var i = 0
        while (i < dim) { reg += w(k)(i) * w(k)(i); i += 1 }
        k += 1
      }
      losses(it) = flat(0) / n + l2 / 2.0 * reg
      val step = solveSymmetric(h, g)
      m = 0
      while (m < kd) {
        val kk = m / d1; val i = m % d1
        if (i < dim) w(kk)(i) -= step(m) else b(kk) -= step(m)
        m += 1
      }
      it += 1
    }
    SoftmaxModel(w, b, losses)
  }

  /** Map-side class probabilities over the model's K classes. */
  def softmaxProbs(vec: Column, m: SoftmaxModel): Column =
    Glue.column(SoftmaxProbsExpr(Glue.expression(vec), m))

  /** Hard 0-based class prediction (first argmax on ties). */
  def softmaxPredict(vec: Column, m: SoftmaxModel): Column = {
    val p = softmaxProbs(vec, m)
    (array_position(p, array_max(p)) - 1).cast("int")
  }

  /** Fraction of rows where [[softmaxPredict]] equals the class label —
    * decimal-staged, order-independent. */
  def softmaxAccuracy(df: DataFrame, labelCol: String, vecCol: String,
                      m: SoftmaxModel): Double =
    df.agg((xsum(when(softmaxPredict(col(vecCol), m) ===
        col(labelCol).cast("int"), 1.0).otherwise(0.0)) /
      count(lit(1))).as("acc"))
      .head().getDouble(0)

  /** K-row DataFrame encoding of a fitted softmax model (one row per
    * class: `(class, weights, bias)`), the multiclass analog of
    * [[modelToDf]] — persist to a catalog table, reload with
    * [[softmaxModelFromDf]]. Loss history rides on class 0's row. */
  def softmaxModelToDf(spark: org.apache.spark.sql.SparkSession,
                       m: SoftmaxModel): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      (0 until m.k).map(k => org.apache.spark.sql.Row(
        k, m.weights(k).toSeq, m.biases(k),
        if (k == 0) m.lossHistory.toSeq else Seq.empty[Double])).asJava,
      StructType(Seq(
        StructField("class", IntegerType, nullable = false),
        StructField("weights", ArrayType(DoubleType, containsNull = false)),
        StructField("bias", DoubleType, nullable = false),
        StructField("loss_history",
          ArrayType(DoubleType, containsNull = false)))))
  }

  /** Inverse of [[softmaxModelToDf]] (K rows — metadata-scale collect). */
  def softmaxModelFromDf(df: DataFrame): SoftmaxModel = {
    val rows = df.select("class", "weights", "bias", "loss_history")
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, "softmax model table is empty")
    require(rows.map(_.getInt(0)).toSeq == rows.indices,
      "softmax model rows must cover classes 0..K-1 exactly")
    val w = rows.map(_.getSeq[Double](1).toArray)
    require(w.forall(_.length == w.head.length),
      "softmax model rows disagree on dim")
    SoftmaxModel(w, rows.map(_.getDouble(2)),
      rows.head.getSeq[Double](3).toArray)
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


/** Shared exact fixed-point accumulation for the fit aggregates: per-row
  * doubles quantize to 2⁻⁴⁰ (`Math.round(v·2⁴⁰)` — deterministic) and sum
  * in 128-bit two's-complement integer arithmetic stored as (hi, lo) long
  * pairs — exact, associative, commutative, so totals are identical under
  * any partitioning and merge order. */
private[graft] object Fixed128 {
  final val Scale = 1099511627776.0 // 2^40

  /** Largest |contribution| whose 2⁴⁰-scaled quantization fits a long:
    * 2⁶³⁻⁴⁰ = 2²³ ≈ 8.4e6. Math.round would SATURATE (and map NaN to 0)
    * past this, silently corrupting the fit — so the quantizer throws
    * instead. L2-normalized features (hashEmbedding) sit orders of
    * magnitude below the bound; raw-count features must be scaled first. */
  final val MaxAbs = 8388608.0 // 2^23

  /** buf[2k]=hi, buf[2k+1]=lo. */
  def add(buf: Array[Long], k: Int, v: Double): Unit = {
    if (!(Math.abs(v) < MaxAbs)) // inverted compare also rejects NaN
      throw new IllegalArgumentException(
        s"Fixed128: |contribution| $v exceeds the 2^23 fixed-point range; " +
          "scale/normalize the feature vectors (e.g. L2-normalize) before fitting")
    val q = Math.round(v * Scale)
    val lo = buf(2 * k + 1)
    val newLo = lo + q
    val carry = ((lo & q) | ((lo | q) & ~newLo)) >>> 63
    buf(2 * k) += (q >> 63) + carry
    buf(2 * k + 1) = newLo
  }

  def mergeInto(a: Array[Long], b: Array[Long], nStats: Int): Unit = {
    var k = 0
    while (k < nStats) {
      val lo = a(2 * k + 1)
      val q = b(2 * k + 1)
      val newLo = lo + q
      val carry = ((lo & q) | ((lo | q) & ~newLo)) >>> 63
      a(2 * k) += b(2 * k) + carry
      a(2 * k + 1) = newLo
      k += 1
    }
  }

  /** Correctly-rounded double of each 128-bit sum, scaled back by 2⁻⁴⁰. */
  def toDoubles(buf: Array[Long], nStats: Int): Array[Any] = {
    val mask = java.math.BigInteger.ONE.shiftLeft(64)
      .subtract(java.math.BigInteger.ONE)
    val out = new Array[Any](nStats)
    var k = 0
    while (k < nStats) {
      val v = java.math.BigInteger.valueOf(buf(2 * k)).shiftLeft(64)
        .add(java.math.BigInteger.valueOf(buf(2 * k + 1)).and(mask))
      out(k) = v.doubleValue() / Scale
      k += 1
    }
    out
  }

  def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
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
    Fixed128.add(buf, 0, loss)
    i = 0
    while (i < d1) {
      Fixed128.add(buf, 1 + i, err * xb(i))
      i += 1
    }
    if (withHessian) {
      var k = 1 + d1
      i = 0
      while (i < d1) {
        val wxi = wt * xb(i)
        var j = i
        while (j < d1) {
          Fixed128.add(buf, k, wxi * xb(j))
          k += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    Fixed128.mergeInto(a, b, nStats); a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Fixed128.toDoubles(buf, nStats))

  override def serialize(buf: Array[Long]): Array[Byte] =
    Fixed128.serialize(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Fixed128.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): LrNewtonStats =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LrNewtonStats =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

/**
 * Fused multinomial (softmax) Newton statistics for
 * [[Classifier.softmaxFit]]: per row computes the stable softmax over
 * `z_k = W_k·x + b_k`, then accumulates `[−log p_y, gradient (K·(dim+1)),
 * upper-tri block Hessian ((δ_kl·p_k − p_k·p_l)·x_i·x_j)]` into the
 * shared [[Fixed128]] fixed-point buffer. Parameter index `m = k·(dim+1)
 * + i` (i = dim ⇒ the class bias). The per-row kernel is O((K·dim)²) —
 * multinomial IRLS is the modest-K/modest-dim fast path, exactly like the
 * binary Newton; at large K·dim use one-vs-rest binary fits instead.
 */
case class SoftmaxNewtonStats(left: Expression, right: Expression,
                              weights: Array[Array[Double]],
                              biases: Array[Double],
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private def numK = weights.length
  private def dim = weights(0).length
  private def d1 = dim + 1
  private def kd = numK * d1
  private def nStats = 1 + kd + kd * (kd + 1) / 2

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "softmax_newton_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (xs, ys) => TypeCheckResult.TypeCheckFailure(
        s"softmax_newton_stats requires (array<double>, double), got ($xs, $ys)")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * nStats)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xv = left.eval(input)
    val yv = right.eval(input)
    if (xv == null || yv == null) return buf
    val arr = xv.asInstanceOf[ArrayData]
    val label = yv.asInstanceOf[Double].toInt
    if (label < 0 || label >= numK) return buf // out-of-range label: skip
    val xb = new Array[Double](d1)
    var i = 0
    val nEl = math.min(arr.numElements(), dim)
    while (i < nEl) { xb(i) = arr.getDouble(i); i += 1 }
    xb(dim) = 1.0
    // stable softmax
    val z = new Array[Double](numK)
    var zMax = Double.NegativeInfinity
    var k = 0
    while (k < numK) {
      var acc = biases(k)
      val wk = weights(k)
      i = 0
      while (i < dim) { acc += wk(i) * xb(i); i += 1 }
      z(k) = acc
      if (acc > zMax) zMax = acc
      k += 1
    }
    var sumExp = 0.0
    k = 0
    while (k < numK) { z(k) = math.exp(z(k) - zMax); sumExp += z(k); k += 1 }
    val p = z // reuse: now probabilities
    k = 0
    while (k < numK) { p(k) /= sumExp; k += 1 }
    Fixed128.add(buf, 0, -math.log(math.max(p(label), 1e-300)))
    // gradient: (p_k − δ_ky)·xb_i at m = k·d1 + i
    val g = new Array[Double](kd)
    k = 0
    while (k < numK) {
      val e = p(k) - (if (k == label) 1.0 else 0.0)
      i = 0
      while (i < d1) { g(k * d1 + i) = e * xb(i); i += 1 }
      k += 1
    }
    var m = 0
    while (m < kd) { Fixed128.add(buf, 1 + m, g(m)); m += 1 }
    // block Hessian upper triangle: ((δ_kl·p_k − p_k·p_l)·xb_i·xb_j)
    var off = 1 + kd
    var m1 = 0
    while (m1 < kd) {
      val k1 = m1 / d1; val i1 = m1 % d1
      var m2 = m1
      while (m2 < kd) {
        val k2 = m2 / d1; val i2 = m2 % d1
        val pk = (if (k1 == k2) p(k1) else 0.0) - p(k1) * p(k2)
        Fixed128.add(buf, off, pk * xb(i1) * xb(i2))
        off += 1; m2 += 1
      }
      m1 += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    Fixed128.mergeInto(a, b, nStats); a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Fixed128.toDoubles(buf, nStats))

  override def serialize(buf: Array[Long]): Array[Byte] =
    Fixed128.serialize(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Fixed128.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SoftmaxNewtonStats =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SoftmaxNewtonStats =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd map-side softmax scoring: probabilities over the model's K
  * classes (reference-object pattern, like PcaProjectExpr). */
case class SoftmaxProbsExpr(child: Expression,
                            model: Classifier.SoftmaxModel)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "softmax_probs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"softmax_probs requires array<float>/array<double>, got ${dt.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val k = model.k
    val dim = model.dim
    val n = math.min(arr.numElements(), dim)
    val f = isFloat
    val z = new Array[Double](k)
    var zMax = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var acc = model.biases(c)
      val wc = model.weights(c)
      var j = 0
      while (j < n) {
        acc += wc(j) * (if (f) arr.getFloat(j).toDouble else arr.getDouble(j))
        j += 1
      }
      z(c) = acc
      if (acc > zMax) zMax = acc
      c += 1
    }
    var s = 0.0
    c = 0
    while (c < k) { z(c) = math.exp(z(c) - zMax); s += z(c); c += 1 }
    val out = new Array[Any](k)
    c = 0
    while (c < k) { out(c) = z(c) / s; c += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                         ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("softmaxProbs", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
