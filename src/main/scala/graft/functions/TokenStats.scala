package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass text statistics: token count, POSIX-punct char count, stopword
 * count, stopword-profile language vote, and the order-sensitive rolling
 * fingerprint — one expression call per row instead of five interpreted
 * higher-order-function pipelines (each HOF lambda costs ~1µs interpreted;
 * tokens × languages × rows made `text_analyze` a 50s outlier at sf0.1).
 *
 * Every field is defined to be BIT-IDENTICAL to the column-formula it
 * replaces (graft/llm/TextAnalysis.scala), so the DuckDB-oracled queries
 * (`ta1`/`ta2`) keep hashing equal:
 *  - tokens = regex-split on " " with limit -1, exactly `split(text, ' ')`
 *    (delegates to UTF8String.split like Spark's StringSplit);
 *  - n_punct counts chars matching Java regex `\p{Punct}` (ASCII-only
 *    ranges), equal to `length(x) - length(regexp_replace(x,"[\\p{Punct}]",""))`;
 *  - n_stop counts case-sensitive members of the 10-word stopword list,
 *    equal to `size(filter(tokens, isin(...)))`;
 *  - fingerprint chains `acc = xxhash64(acc, word)` with seed 42, equal to
 *    `aggregate(tokens, 0L, (acc, w) => xxhash64(acc, w))`;
 *  - lang scores each profile by DISTINCT lowercase-token matches and picks
 *    the max with ties broken by lexicographically larger language code
 *    (the `sort_array(desc)` struct ordering it replaces), "und" on zero.
 */
case class TokenStats(child: Expression)
    extends UnaryExpression {
  import TokenStats._

  override def dataType: DataType = schema
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  /** Generated code calls `compute` on this instance directly (the standard
    * reference-object pattern, like Spark's own Invoke): the surrounding
    * pipeline stays inside ONE WholeStageCodegen stage — no CodegenFallback
    * interpreter boundary — while the per-row loop remains compiled Scala. */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  def compute(text: UTF8String): InternalRow = {
    val tokens = text.split(space, -1)

    // punct chars: single pass over UTF-8 bytes; \p{Punct} is ASCII-only and
    // UTF-8 continuation bytes are >= 0x80, so byte ranges are exact.
    var nPunct = 0
    val nBytes = text.numBytes()
    var b = 0
    while (b < nBytes) {
      val c = text.getByte(b) & 0xFF
      if ((c >= 0x21 && c <= 0x2F) || (c >= 0x3A && c <= 0x40) ||
          (c >= 0x5B && c <= 0x60) || (c >= 0x7B && c <= 0x7E)) nPunct += 1
      b += 1
    }

    var nStop = 0
    var fp = 0L
    val scores = new Array[Int](langNames.length)
    // distinct-match bitmap: profile word index -> already counted
    val seen = new Array[Boolean](profileWords.length)
    var j = 0
    while (j < tokens.length) {
      val w = tokens(j)
      if (w != null) {
        if (stopSet.contains(w)) nStop += 1
        // acc' = xxhash64(acc, w): children hashed in order with seed 42
        val h1 = XxHash64Function.hash(java.lang.Long.valueOf(fp), LongType, 42L)
        fp = XxHash64Function.hash(w, StringType, h1)
        val idx = profileIndex.get(w.toLowerCase)
        if (idx != null && !seen(idx.intValue())) {
          seen(idx.intValue()) = true
          val langs = profileLangs(idx.intValue())
          var m = 0
          while (m < langs.length) { scores(langs(m)) += 1; m += 1 }
        }
      }
      j += 1
    }

    var bestScore = -1
    var bestLang = ""
    var li = 0
    while (li < langNames.length) {
      if (scores(li) > bestScore ||
          (scores(li) == bestScore && langNames(li) > bestLang)) {
        bestScore = scores(li)
        bestLang = langNames(li)
      }
      li += 1
    }
    val lang = if (bestScore > 0) bestLang else "und"

    InternalRow(tokens.length, nPunct, nStop,
      UTF8String.fromString(lang), fp)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  /** Same list as TextAnalysis.stopwords (case-sensitive membership). */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Same profiles as TextAnalysis.langProfiles (distinct-token voting). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con", "para", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "个"))

  private val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  val langNames: Array[String] = langProfiles.map(_._1).toArray

  /** All distinct profile words; a word may vote for several languages. */
  private val profileWords: Array[UTF8String] =
    langProfiles.flatMap(_._2).distinct.map(UTF8String.fromString).toArray

  private val profileIndex: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    profileWords.zipWithIndex.foreach { case (w, i) => m.put(w, i) }
    m
  }

  private val profileLangs: Array[Array[Int]] =
    profileWords.map { w =>
      val s = w.toString
      langProfiles.zipWithIndex.collect {
        case ((_, words), li) if words.contains(s) => li
      }.toArray
    }

  def tokenStats(text: Column): Column =
    Glue.column(TokenStats(Glue.expression(text)))
}

/**
 * Single-pass repetition statistics for Gopher-style quality filtering:
 * token count, distinct-token count, the most frequent word-bigram's count
 * and the total bigram count — one compiled pass per row (same
 * reference-object codegen pattern as [[TokenStats]]; an explode + two-level
 * aggregation would shuffle every token of a 100 TB corpus instead).
 *
 * Bigram identity matches `concat_ws(" ", slice(tokens, i+1, 2))` over
 * `split(text, " ")` exactly — including the slice CAP at the last token
 * (a 1-token document yields one 1-word "bigram") — so a DuckDB oracle
 * recomputing the same windows hashes equal.
 */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  import RepetitionStats._

  override def dataType: DataType = schema
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionStats", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  def compute(text: UTF8String): InternalRow = {
    val tokens = text.split(space, -1)
    val m = tokens.length
    val distinct = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < m) { distinct.add(tokens(i)); i += 1 }
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var nbg = 0
    val last = math.max(m - 2, 0)
    i = 0
    while (i <= last) {
      val g = if (i + 1 < m) tokens(i).toString + " " + tokens(i + 1).toString
              else tokens(i).toString
      val c0 = counts.get(g)
      val c = if (c0 == null) 1 else c0.intValue() + 1
      counts.put(g, Integer.valueOf(c))
      if (c > top) top = c
      nbg += 1
      i += 1
    }
    InternalRow(m, distinct.size, top, nbg)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  def repetitionStats(text: Column): Column =
    Glue.column(RepetitionStats(Glue.expression(text)))
}

/**
 * Single-pass Gopher-rule statistics (Rae et al. 2021 §A1.1 inputs): token
 * count, summed token character lengths, `#` and ellipsis occurrence
 * counts, alphabetic-token count, distinct stop-set hits, and the line
 * counters (total / bullet-led / ellipsis-ended) — one compiled pass per
 * row (same reference-object codegen pattern as [[TokenStats]]) instead of
 * the four interpreted HOF token loops (aggregate + filter·rlike +
 * transform·lower + array_intersect) the column formulation costs.
 *
 * Every counter is defined to be BIT-IDENTICAL to the column formula it
 * replaces (TextAnalysis.gopherRules' original spelling, which the ta15
 * DuckDB oracle mirrors):
 *  - tokens = `split(text, " ")` (limit -1); token length counts
 *    CHARACTERS (`length(t)` / DuckDB `LEN`), not bytes;
 *  - n_hash = occurrences of `#`; n_ellipsis = non-overlapping
 *    left-to-right "..." occurrences (the `(len-len(replace))/3` count)
 *    plus '…' occurrences — summed, the rule tests them as ONE ellipsis
 *    symbol;
 *  - n_alpha_tokens counts tokens matching `rlike("[A-Za-z]")` (ASCII
 *    letters; UTF-8 continuation bytes can't false-positive a byte scan);
 *  - n_stop_hits counts DISTINCT stop-set members among lowercased
 *    tokens (`array_intersect(array_distinct(transform(lower)))` size);
 *  - lines = `split(text, "\n")` (limit -1 — trailing empties kept):
 *    bullet lines start with `-`/`*`/`•` after leading-space trim,
 *    ellipsis lines end with "..." or '…' after trailing-space trim.
 */
case class GopherStats(child: Expression) extends UnaryExpression {
  import GopherStats._

  override def dataType: DataType = schema
  override def prettyName: String = "gopher_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherStats", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  def compute(text: UTF8String): InternalRow = {
    // whole-text symbol scan: '#' directly; "..." via non-overlapping
    // left-to-right run counting (a 5-dot run counts once, like REPLACE);
    // '…' = U+2026 = E2 80 A6 in UTF-8
    var nHash = 0
    var nEllipsis = 0
    val nBytes = text.numBytes()
    var b = 0
    var dotRun = 0
    while (b < nBytes) {
      val c = text.getByte(b) & 0xFF
      if (c == '.') { dotRun += 1; if (dotRun == 3) { nEllipsis += 1; dotRun = 0 } }
      else dotRun = 0
      if (c == '#') nHash += 1
      if (c == 0xE2 && b + 2 < nBytes &&
          (text.getByte(b + 1) & 0xFF) == 0x80 &&
          (text.getByte(b + 2) & 0xFF) == 0xA6) nEllipsis += 1
      b += 1
    }

    val tokens = text.split(space, -1)
    var sumLen = 0L
    var nAlpha = 0
    var stopHits = 0
    val seen = new Array[Boolean](stopWords.length)
    var j = 0
    while (j < tokens.length) {
      val w = tokens(j)
      if (w != null) {
        sumLen += w.numChars()
        var alpha = false
        val wb = w.numBytes()
        var i = 0
        while (i < wb && !alpha) {
          val c = w.getByte(i) & 0xFF
          alpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
          i += 1
        }
        if (alpha) nAlpha += 1
        val idx = stopIndex.get(w.toLowerCase)
        if (idx != null && !seen(idx.intValue())) {
          seen(idx.intValue()) = true
          stopHits += 1
        }
      }
      j += 1
    }

    val lines = text.split(newline, -1)
    var nBullet = 0
    var nEllLines = 0
    var li = 0
    while (li < lines.length) {
      val l = lines(li)
      if (l != null) {
        val lb = l.numBytes()
        // leading-space trim (ltrim trims ' ' only), then first char
        var s = 0
        while (s < lb && l.getByte(s) == ' ') s += 1
        if (s < lb) {
          val c = l.getByte(s) & 0xFF
          if (c == '-' || c == '*' ||
              (c == 0xE2 && s + 2 < lb && (l.getByte(s + 1) & 0xFF) == 0x80 &&
                (l.getByte(s + 2) & 0xFF) == 0xA2)) nBullet += 1
        }
        // trailing-space trim, then suffix check
        var e = lb
        while (e > 0 && l.getByte(e - 1) == ' ') e -= 1
        val dots = e >= 3 && l.getByte(e - 1) == '.' &&
          l.getByte(e - 2) == '.' && l.getByte(e - 3) == '.'
        val hellip = e >= 3 && (l.getByte(e - 3) & 0xFF) == 0xE2 &&
          (l.getByte(e - 2) & 0xFF) == 0x80 && (l.getByte(e - 1) & 0xFF) == 0xA6
        if (dots || hellip) nEllLines += 1
      }
      li += 1
    }

    InternalRow(tokens.length, sumLen, nHash, nEllipsis, nAlpha, stopHits,
      lines.length, nBullet, nEllLines)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object GopherStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_token_chars", LongType, nullable = false),
    StructField("n_hash", IntegerType, nullable = false),
    StructField("n_ellipsis", IntegerType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false),
    StructField("n_stop_hits", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet_lines", IntegerType, nullable = false),
    StructField("n_ellipsis_lines", IntegerType, nullable = false)))

  private val space = UTF8String.fromString(" ")
  private val newline = UTF8String.fromString("\n")

  /** Same list as TextAnalysis.gopherStopSet (lowercased membership). */
  val stopWords: Array[UTF8String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(UTF8String.fromString)

  private val stopIndex: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    stopWords.zipWithIndex.foreach { case (w, i) => m.put(w, i) }
    m
  }

  def gopherStats(text: Column): Column =
    Glue.column(GopherStats(Glue.expression(text)))
}

/**
 * Single-pass Gopher REPETITION statistics (Rae et al. 2021 §A1.1, the
 * repetition-removal half): duplicate-line counts, the top n-gram
 * character masses (n = 2..4), and the duplicated-n-gram character
 * coverages (n = 5..10) — one compiled pass per row with per-document
 * hash maps (bounded by the document, never a shuffle; the explode +
 * self-join formulation would move every n-gram of a 100 TB corpus).
 *
 * All outputs are exact INTEGER numerators/denominators so the rule
 * ratios are integer/integer IEEE doubles any engine reproduces:
 *  - lines = `split(text, "\n")` (limit -1); `n_dup_lines` =
 *    n_lines − n_distinct_lines; `dup_line_chars` = Σ over distinct
 *    lines of (occurrences−1)·numChars(line); `line_chars` = Σ
 *    numChars(line) over all lines;
 *  - tokens = `split(text, " ")`; `token_chars` = Σ numChars(token);
 *  - `top{2,3,4}_chars` = for word n-grams (windows of n consecutive
 *    tokens; gram identity = tokens joined by one space; gram char
 *    length = Σ token numChars, NO separators — consistent with the
 *    `token_chars` denominator): max occurrence count, times the char
 *    length of the LONGEST gram attaining that count (deterministic
 *    tie-break both engines can express);
 *  - `dup{5..10}_chars` = Σ numChars of tokens at positions covered by
 *    at least one occurrence of an n-gram appearing ≥ 2 times
 *    (positions marked, overlaps counted once).
 */
case class GopherRepetition(child: Expression) extends UnaryExpression {
  import GopherRepetition._

  override def dataType: DataType = schema
  override def prettyName: String = "gopher_repetition"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherRepetition", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  def compute(text: UTF8String): InternalRow = {
    // lines
    val lines = text.split(newline, -1)
    var lineChars = 0L
    val lineCounts = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      val chars = if (l == null) 0L else l.numChars().toLong
      lineChars += chars
      val key = if (l == null) "" else l.toString
      val e = lineCounts.get(key)
      if (e == null) lineCounts.put(key, Array(1L, chars))
      else e(0) += 1
      i += 1
    }
    var dupLines = 0L
    var dupLineChars = 0L
    val it = lineCounts.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e(0) > 1) { dupLines += e(0) - 1; dupLineChars += (e(0) - 1) * e(1) }
    }

    // tokens
    val tokens = text.split(space, -1)
    val m = tokens.length
    val tokLen = new Array[Int](m)
    var tokenChars = 0L
    i = 0
    while (i < m) {
      tokLen(i) = if (tokens(i) == null) 0 else tokens(i).numChars()
      tokenChars += tokLen(i)
      i += 1
    }
    def gram(p: Int, n: Int): String = {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (tokens(p + j) != null) sb.append(tokens(p + j).toString)
        j += 1
      }
      sb.toString
    }
    // top n-gram char mass, n = 2..4: gram char length = Σ token chars
    // (no separators — consistent with the token_chars denominator);
    // max count, tie-broken toward the larger char length
    val top = new Array[Long](3)
    var ni = 0
    while (ni < 3) {
      val n = ni + 2
      if (m >= n) {
        val counts = new java.util.HashMap[String, Array[Long]]()
        var p = 0
        while (p <= m - n) {
          val g = gram(p, n)
          val e = counts.get(g)
          if (e == null) {
            var s = 0L
            var j = p
            while (j < p + n) { s += tokLen(j); j += 1 }
            counts.put(g, Array(1L, s))
          } else e(0) += 1
          p += 1
        }
        var bestCount = 0L
        var bestLen = 0L
        val gi = counts.values().iterator()
        while (gi.hasNext) {
          val e = gi.next()
          if (e(0) > bestCount || (e(0) == bestCount && e(1) > bestLen)) {
            bestCount = e(0); bestLen = e(1)
          }
        }
        top(ni) = bestCount * bestLen
      }
      ni += 1
    }
    // duplicated n-gram coverage, n = 5..10: mark token positions under
    // any occurrence of a gram appearing >= 2 times; overlaps count once
    val dup = new Array[Long](6)
    ni = 0
    while (ni < 6) {
      val n = ni + 5
      if (m >= n) {
        val counts = new java.util.HashMap[String, Integer]()
        var p = 0
        while (p <= m - n) {
          val g = gram(p, n)
          val c = counts.get(g)
          counts.put(g, if (c == null) 1 else c.intValue() + 1)
          p += 1
        }
        val marked = new Array[Boolean](m)
        p = 0
        while (p <= m - n) {
          if (counts.get(gram(p, n)).intValue() >= 2) {
            var j = p
            while (j < p + n) { marked(j) = true; j += 1 }
          }
          p += 1
        }
        var s = 0L
        var q = 0
        while (q < m) { if (marked(q)) s += tokLen(q); q += 1 }
        dup(ni) = s
      }
      ni += 1
    }

    InternalRow(lines.length, dupLines, lineChars, dupLineChars,
      m, tokenChars, top(0), top(1), top(2),
      dup(0), dup(1), dup(2), dup(3), dup(4), dup(5))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object GopherRepetition {
  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("token_chars", LongType, nullable = false),
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_chars", LongType, nullable = false),
    StructField("top4_chars", LongType, nullable = false),
    StructField("dup5_chars", LongType, nullable = false),
    StructField("dup6_chars", LongType, nullable = false),
    StructField("dup7_chars", LongType, nullable = false),
    StructField("dup8_chars", LongType, nullable = false),
    StructField("dup9_chars", LongType, nullable = false),
    StructField("dup10_chars", LongType, nullable = false)))

  private val space = UTF8String.fromString(" ")
  private val newline = UTF8String.fromString("\n")

  def gopherRepetition(text: Column): Column =
    Glue.column(GopherRepetition(Glue.expression(text)))
}
