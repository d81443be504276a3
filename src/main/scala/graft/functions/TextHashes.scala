package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._

/**
 * Native signature expressions for the dedup operators.
 *
 * These exist for throughput: building signatures from SQL higher-order
 * functions (`transform`/`aggregate` lambdas) costs ~1µs per lambda
 * invocation interpreted — k=64 hashes × ~80 shingles × row count is tens of
 * millions of invocations per small corpus, hours at 100 TB. A single
 * expression call per row runs the whole k×n loop in Java at hash speed.
 *
 * MinHash uses the standard double-hashing construction
 * sig_i = min over shingles of (h1(s) + i·h2(s)) — two xxhash64 passes per
 * shingle instead of k.
 */
case class MinHashSignature(child: Expression, k: Int, shingleN: Int = 1)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  // reference-object call keeps the pipeline in one WholeStageCodegen stage
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  /** Input is the TOKEN array; shingles of `shingleN` consecutive tokens are
    * built inline (one reused buffer, no intermediate array column — the
    * HOF shingle pipeline costs ~µs per concat interpreted). Duplicated
    * shingles don't affect a min, so no distinct pass is needed. */
  def compute(arr: ArrayData): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    val last = math.max(0, n - shingleN)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= last) {
      sb.setLength(0)
      var m = 0
      while (m < shingleN && j + m < n) {
        if (m > 0) sb.append(' ')
        if (!arr.isNullAt(j + m)) sb.append(arr.getUTF8String(j + m).toString)
        m += 1
      }
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      val h1 = XxHash64Function.hash(s, StringType, 42L)
      val h2 = XxHash64Function.hash(s, StringType, 1000003L) | 1L // odd step
      var h = h1
      var i = 0
      while (i < k) {
        if (h < out(i)) out(i) = h
        h += h2
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * POSITIONAL window hash pairs of a token array: for each window of `n`
 * consecutive tokens starting at 0, stride, 2·stride, … (full windows
 * only — a document shorter than `n` tokens yields an empty array), the
 * xxhash64 of the space-joined window text under TWO independent seeds,
 * as one array<struct<h1,h2>> aligned with the window index. The
 * exact-substring span-dedup pass ([[graft.llm.Dedup.dedupSpansKeepFirst]])
 * shuffles on `h1` (8 bytes) and verifies winners on `h2` — 128 effective
 * identity bits, so a 64-bit birthday collision (expected at corpus
 * scale) degrades to a KEPT duplicate instead of deleted content.
 *
 * Exists for throughput, like [[ShingleHashes]]: the declarative
 * equivalent (`md5(concat_ws(' ', slice(toks, i+1, n)))` per window)
 * materializes a window string column and pays per-window digest cost
 * over n tokens — O(n·bytes) per token at stride 1. Here each token
 * hashes ONCE (two seeds) and windows combine token hashes with a
 * degree-n polynomial ROLLING hash in wrapping 64-bit arithmetic —
 * O(bytes) total, O(1) per window step. Window equality ⇔ equal token
 * hash sequences, so two windows collide only through a token-level or
 * polynomial 64-bit collision — the same 2⁻⁶⁴-per-pair class as direct
 * window hashing, and the independent h2 lane still catches h1
 * collisions (the caller's degrade contract).
 */
case class WindowHashPairs(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {
  require(n >= 1 && stride >= 1, "window size and stride must be positive")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "window_hash_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_hash_pairs requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("windowHashPairs", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  // odd multipliers (distinct per lane) — wrapping multiplication by an
  // odd constant is a bijection on Z/2^64, so no entropy is lost as the
  // window rolls; B^(n-1) is precomputed for the remove-leading-token step
  private val B1 = 0x9E3779B97F4A7C15L | 1L
  private val B2 = 0xC2B2AE3D27D4EB4FL | 1L
  private def pow(b: Long, e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r *= b; i += 1 }
    r
  }
  private val b1Top = pow(B1, n - 1)
  private val b2Top = pow(B2, n - 1)

  def compute(arr: ArrayData): ArrayData = {
    val nTok = arr.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    // per-token hashes, two independent seeds (null tokens — which
    // split() never produces — hash as a fixed sentinel)
    val t1 = new Array[Long](nTok)
    val t2 = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      if (arr.isNullAt(i)) { t1(i) = 0x5851F42DL; t2(i) = 0x14057B7EL }
      else {
        val s = arr.getUTF8String(i)
        t1(i) = XxHash64Function.hash(s, StringType, 42L)
        t2(i) = XxHash64Function.hash(s, StringType, 0x9E3779B97F4A7C15L)
      }
      i += 1
    }
    val nWin = (nTok - n) / stride + 1
    val out = new Array[Any](nWin)
    // rolling window hashes over every start position; grid positions
    // (0, stride, …) are emitted
    var h1 = 0L
    var h2 = 0L
    var m = 0
    while (m < n) { h1 = h1 * B1 + t1(m); h2 = h2 * B2 + t2(m); m += 1 }
    var j = 0
    var w = 0
    while (w < nWin) {
      if (j % stride == 0 && j / stride == w) {
        out(w) = org.apache.spark.sql.catalyst.InternalRow(h1, h2)
        w += 1
      }
      if (j + n < nTok) {
        h1 = (h1 - t1(j) * b1Top) * B1 + t1(j + n)
        h2 = (h2 - t2(j) * b2Top) * B2 + t2(j + n)
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * DISTINCT shingle hashes of a token array: the fused equivalent of
 * `array_distinct(transform(idx, i → concat_ws(' ', slice(toks, …))))`
 * followed by `xxhash64` — same windows (n consecutive tokens, short tail
 * window when the doc has fewer than n tokens), same separator, same
 * xxhash64(seed 42) values, but no intermediate shingle STRING column ever
 * materializes: one reused buffer per row, hashes deduped in place. Cuts
 * the decontamination scan's per-row cost to hashing only — at corpus
 * scale the string-building HOF chain was the dominant map-side cost.
 */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be positive, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  def compute(arr: ArrayData): ArrayData = {
    val nTok = arr.numElements()
    val last = math.max(0, nTok - n)
    val hashes = new Array[Long](last + 1)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= last) {
      sb.setLength(0)
      var m = 0
      var first = true
      while (m < n && j + m < nTok) {
        // concat_ws semantics: null elements are skipped entirely
        if (!arr.isNullAt(j + m)) {
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(j + m).toString)
          first = false
        }
        m += 1
      }
      hashes(j) = XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString),
        StringType, 42L)
      j += 1
    }
    // distinct via sort + squeeze (arrays are small — a doc's shingle count)
    java.util.Arrays.sort(hashes)
    var w = 0
    var r = 0
    while (r < hashes.length) {
      if (r == 0 || hashes(r) != hashes(r - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    val out = new Array[Any](w)
    var i = 0
    while (i < w) { out(i) = hashes(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit simhash of a word array: per-word xxhash64, bit voting, sign pack.
  * Multiset-invariant (word order doesn't matter). */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Count of positions where two equal-length long-array signatures agree —
  * the minhash jaccard estimator numerator. The HOF formulation
  * (`zip_with` + `aggregate`) costs ~2k interpreted lambda invocations per
  * candidate pair (k=64); this is one call running a tight primitive loop. */
case class SignatureMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "signature_match_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"signature_match_count requires two array<bigint>, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigMatch", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  def compute(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var matches = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) matches += 1
      i += 1
    }
    matches
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/**
 * Content-defined anchor positions for duplicate-passage detection: window
 * start offsets chosen by the TEXT CONTENT (a Karp-Rabin rolling hash over
 * `anchorGram`-char grams, position selected when `hash & (density-1) == 0`
 * — Manber's "approximate fingerprints" scheme, the alignment-robust
 * alternative to a fixed stride grid). The same passage selects the same
 * anchors relative to its own content wherever it appears in a document,
 * so duplicated spans produce identical windows in every occurrence —
 * which a fixed grid only does when the copies happen to align modulo the
 * stride. Expected anchor rate is 1/density positions (density must be a
 * power of two); anchors are dropped when a full `windowLen` window no
 * longer fits, and capped at 65536 per document as an adversarial-input
 * memory bound. One expression call per row runs the whole scan at hash
 * speed (the per-char lambda formulation would be ~µs/char interpreted).
 */
case class ContentAnchors(child: Expression, anchorGram: Int, density: Int,
                          windowLen: Int)
    extends UnaryExpression {
  require(anchorGram > 0 && windowLen >= anchorGram, "windowLen >= anchorGram > 0")
  require(density > 0 && (density & (density - 1)) == 0,
    "density must be a power of two")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "content_anchors"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"content_anchors requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("anchors", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    // per-CHAR positions (not bytes) so they compose with Column.substr
    val str = s.toString
    val len = str.length
    if (len < windowLen) return new GenericArrayData(Array.empty[Int])
    val mask = (density - 1).toLong
    val B = 1000003L
    var bPow = 1L // B^(anchorGram-1), for removing the outgoing char
    var i = 1
    while (i < anchorGram) { bPow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < anchorGram) { h = h * B + str.charAt(i); i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Int](64)
    val lastStart = len - windowLen
    var p = 0
    val lastGram = len - anchorGram
    while (p <= lastGram && out.size < 65536) {
      if ((h & mask) == 0L && p <= lastStart) out += p
      if (p < lastGram)
        h = (h - str.charAt(p) * bPow) * B + str.charAt(p + anchorGram)
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Hashing-trick text featurization (Weinberger et al. 2009): one pass over
 * the token array; token t adds sign(h(t)) to dimension |h(t)| mod dim —
 * a model-free bag-of-words embedding computable map-side at corpus scale.
 * Identical token MULTISETS (any order) produce identical vectors, which
 * is what plugs the text corpus into the whole vector stack (cosine
 * near-dup, kNN, PQ, clustering) without an external encoder. Output is
 * L2-normalized (zero vector for empty input) so cosine comparisons read
 * directly off inner products.
 */
case class HashEmbedding(child: Expression, dim: Int)
    extends UnaryExpression with Serializable {
  require(dim > 0, s"dim must be positive, got $dim")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hash_embedding"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_embedding requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashEmbedding", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  def compute(arr: ArrayData): ArrayData = {
    val acc = new Array[Double](dim)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
        val ix = ((h % dim) + dim) % dim
        acc(ix.toInt) += (if (h < 0) -1.0 else 1.0)
      }
      j += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Any](dim)
    i = 0
    while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Fused DSIR gram-bucket pass: unigram + space-joined-bigram xxhash64
 * buckets of a token array, WITH multiplicity and in gram order (all
 * unigrams in token order, then all bigrams) — element-for-element equal to
 * the declarative `transform(concat(toks, zip_with(...)), g =>
 * pmod(xxhash64(g), buckets))` pipeline `Selection.gramBuckets` builds, but
 * with no interpreted lambdas: the HOF spelling pays ~1µs per gram per
 * lambda (two lambdas deep) and re-evaluates `split()` up to six times
 * inside one Generate, which made the three corpus-wide gram passes the
 * dominant cost of the DSIR queries. Unlike [[ShingleHashes]] this keeps
 * duplicates (DSIR counts gram mass, not gram sets).
 *
 * Bigram hash input is `tok[i] + ' ' + tok[i+1]` — byte-identical to the
 * `concat(a, ' ', b)` strings of the HOF path. A null token (which split()
 * never produces) follows the declarative path exactly: `concat` nulls the
 * gram, and Spark's `xxhash64(NULL)` SKIPS the null input and returns the
 * seed (42) — never NULL — so the bucket is `pmod(42, buckets)` and no
 * element of the output is ever null (spec-pinned with null-element arrays
 * in SelectionSpec).
 */
case class GramBucketHashes(child: Expression, buckets: Long)
    extends UnaryExpression {
  require(buckets > 0, s"buckets must be positive, got $buckets")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_bucket_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_bucket_hashes requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramBucketHashes", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  // xxhash64 of a NULL gram: the null input is skipped, leaving the seed —
  // exactly what Spark's XxHash64 expression returns for xxhash64(NULL)
  private val nullBucket: Long = ((42L % buckets) + buckets) % buckets

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val nBi = math.max(0, n - 1)
    val out = new Array[Any](n + nBi)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) nullBucket
        else {
          val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
          ((h % buckets) + buckets) % buckets
        }
      i += 1
    }
    i = 0
    while (i < nBi) {
      out(n + i) =
        if (arr.isNullAt(i) || arr.isNullAt(i + 1)) nullBucket
        else {
          val g = org.apache.spark.unsafe.types.UTF8String.concat(
            arr.getUTF8String(i), SPACE, arr.getUTF8String(i + 1))
          val h = XxHash64Function.hash(g, StringType, 42L)
          ((h % buckets) + buckets) % buckets
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Fused DSIR model scoring: the [[GramBucketHashes]] gram/bucket pass and
 * the per-document exact-DECIMAL log-ratio fold in ONE expression call —
 * token array in, DECIMAL(28,6) weight out. Replaces the
 * `aggregate(gramBuckets(...), 0, (acc, b) => acc + element_at(lut, b+1))`
 * HOF spelling on `Selection.dsirScoreFromModel`'s default-hash path: the
 * fold lambda alone costs ~1µs per gram interpreted, which caps map-side
 * ingest scoring around a million grams per second per core — this runs at
 * hash speed and allocates nothing per gram (unscaled-long accumulation
 * with exact-overflow fallback to BigDecimal; both are the same exact sum
 * the DECIMAL fold computes, spec-pinned against the HOF spelling).
 *
 * `lut(b)` must be the model's log-ratio at bucket b with scale 6
 * (`buckets` = lut.length). Null tokens (which split() never produces)
 * follow [[GramBucketHashes]]' declarative-parity rule: `xxhash64(NULL)`
 * is the seed (42), never NULL, so a null gram contributes
 * `lut(pmod(42, buckets))` like the HOF fold does. Sums beyond
 * DECIMAL(28,6) would need |Σ| > 9.2e12 log-nats and cannot arise from a
 * real model; the BigDecimal fallback covers the arithmetic anyway.
 */
case class DsirModelScore(child: Expression, lut: Array[Decimal])
    extends UnaryExpression {
  require(lut.nonEmpty, "empty DSIR model LUT")
  private val buckets: Long = lut.length.toLong
  override def dataType: DataType = DecimalType(28, 6)
  override def prettyName: String = "dsir_model_score"
  // compute() can return null on a >28-digit BigDecimal sum (an extreme
  // caller-supplied LUT) even for a non-null child — declared nullability
  // must cover that or codegen consumers may elide the isNull check
  // (r15, ADVICE)
  override def nullable: Boolean = true
  // an Array field degrades case-class equality to reference equality,
  // defeating subexpression elimination / exchange reuse between two
  // semantically identical scorers — compare the LUT by content (r15,
  // ADVICE). hashCode mirrors equals per the contract.
  override def equals(other: Any): Boolean = other match {
    case DsirModelScore(c, l) =>
      c == child && java.util.Arrays.equals(
        l.asInstanceOf[Array[AnyRef]], lut.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(
      lut.asInstanceOf[Array[AnyRef]])

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_model_score requires array<string>, got ${other.simpleString}")
  }

  // unscaled micro-units (scale 6) of every LUT entry, for the fast path
  private val lutMicro: Array[Long] =
    lut.map(d => d.toJavaBigDecimal.setScale(6).unscaledValue().longValueExact())

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirModelScore", this)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = $ref.compute($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.types.Decimal) r; }""")
  }

  private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  private def bucketOf(h: Long): Int = (((h % buckets) + buckets) % buckets).toInt
  // xxhash64(NULL) skips the null input and returns the seed (HOF parity)
  private val nullBucket: Int = bucketOf(42L)

  def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    var sum = 0L
    var overflow = false
    var big: java.math.BigDecimal = null
    def add(micro: Long): Unit =
      if (!overflow) {
        try sum = Math.addExact(sum, micro)
        catch { case _: ArithmeticException =>
          overflow = true
          big = java.math.BigDecimal.valueOf(sum, 6)
            .add(java.math.BigDecimal.valueOf(micro, 6))
        }
      } else big = big.add(java.math.BigDecimal.valueOf(micro, 6))
    var i = 0
    while (i < n) {
      add(lutMicro(
        if (arr.isNullAt(i)) nullBucket
        else bucketOf(
          XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L))))
      i += 1
    }
    i = 0
    while (i < n - 1) {
      add(lutMicro(
        if (arr.isNullAt(i) || arr.isNullAt(i + 1)) nullBucket
        else {
          val g = org.apache.spark.unsafe.types.UTF8String.concat(
            arr.getUTF8String(i), SPACE, arr.getUTF8String(i + 1))
          bucketOf(XxHash64Function.hash(g, StringType, 42L))
        }))
      i += 1
    }
    if (!overflow) Decimal(sum, 28, 6)
    else if (big.precision <= 28) Decimal(big, 28, 6)
    else null
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextHashes {
  /** Signature over pre-built shingle strings (shingleN = 1). */
  def minhashSignature(shingles: Column, k: Int): Column =
    Glue.column(MinHashSignature(Glue.expression(shingles), k))
  /** Fused tokens→shingles→signature (preferred hot path). */
  def minhashFromTokens(tokens: Column, k: Int, shingleN: Int): Column =
    Glue.column(MinHashSignature(Glue.expression(tokens), k, shingleN))
  def simhash64(words: Column): Column =
    Glue.column(SimHash64(Glue.expression(words)))
  def signatureMatchCount(sigA: Column, sigB: Column): Column =
    Glue.column(SignatureMatchCount(Glue.expression(sigA), Glue.expression(sigB)))
  def contentAnchors(text: Column, anchorGram: Int, density: Int,
                     windowLen: Int): Column =
    Glue.column(ContentAnchors(Glue.expression(text), anchorGram, density,
      windowLen))
  /** Hashing-trick bag-of-words embedding of a token array, L2-normalized. */
  def hashEmbedding(tokens: Column, dim: Int): Column =
    Glue.column(HashEmbedding(Glue.expression(tokens), dim))
  /** Distinct xxhash64(seed 42) values of a token array's n-shingles. */
  def shingleHashes(tokens: Column, n: Int): Column =
    Glue.column(ShingleHashes(Glue.expression(tokens), n))
  /** Positional (h1, h2) hash pairs of n-token windows every `stride`. */
  def windowHashPairs(tokens: Column, n: Int, stride: Int): Column =
    Glue.column(WindowHashPairs(Glue.expression(tokens), n, stride))
  /** Unigram+bigram xxhash64 buckets of a token array, with multiplicity. */
  def gramBucketHashes(tokens: Column, buckets: Long): Column =
    Glue.column(GramBucketHashes(Glue.expression(tokens), buckets))
  /** Fused gram-bucket + exact-DECIMAL LUT fold (DSIR model scoring). */
  def dsirModelScore(tokens: Column,
                     lut: Array[org.apache.spark.sql.types.Decimal]): Column =
    Glue.column(DsirModelScore(Glue.expression(tokens), lut))
}
