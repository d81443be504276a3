package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding tokenizer (Sennrich et al. 2016): vocabulary TRAINING
 * runs driver-side over a bounded deterministic sample; ENCODING runs
 * distributed as a native codegen expression carrying the learned merge
 * table.
 *
 * That split is the scale-correct one, not a shortcut: production
 * tokenizers train on a few GB of sampled text regardless of corpus size
 * (the merge table converges long before that), while encoding must touch
 * every byte of the corpus. So the sample collect is O(sampleDocs) —
 * explicitly bounded, never corpus-scale — and the hot path is one
 * map-side expression per row with the ranks map broadcast inside the
 * serialized plan.
 *
 * Determinism: the sample is hash-ordered (no RNG), and merge selection
 * breaks count ties lexicographically, so the same corpus always yields
 * the same merge table on any cluster layout.
 */
object Bpe {

  type Merge = (String, String)

  /** Learn `numMerges` BPE merges from a deterministic hash-ordered sample
    * of `sampleDocs` documents. Words are whitespace pre-tokens; merges
    * never cross word boundaries. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            sampleDocs: Int = 1000): Seq[Merge] =
    trainLocal(sampleTexts(df, textCol, sampleDocs), numMerges)

  /** The bounded deterministic training sample BOTH trainers share —
    * driver collect BY DESIGN (see scaladoc): sampleDocs rows of text,
    * hash-ordered for determinism + corpus coverage. One definition, so
    * the whitespace and byte-level modes can never diverge on the
    * sampling contract. */
  private def sampleTexts(df: DataFrame, textCol: String,
                          sampleDocs: Int): Seq[String] =
    df.select(col(textCol).cast("string").as("t"))
      .where(col("t").isNotNull)
      .orderBy(xxhash64(col("t")), col("t"))
      .limit(sampleDocs)
      .collect().map(_.getString(0)).toIndexedSeq

  /** DataFrame encoding of a trained merge table (one row per merge, in
    * application order) — the persistence format that lets a tokenizer be
    * fit once (CALL bpe_fit) and reused across sessions, procedures, and
    * the packing pipeline. The PRE-TOKENIZATION MODE travels WITH the
    * table (`byte_level` column, constant per table): a merge table is
    * meaningless without the alphabet it was fit over, and persisting it
    * makes a fit/encode mode mismatch impossible instead of
    * caller-policed.
    *
    * `alphabet` (whitespace mode only) persists the fit sample's base
    * code-point symbols as NEGATIVE-rank rows — rank -(i+1) carries
    * alphabet slot i in `left`, `right` empty — which is what gives the
    * whitespace mode a DENSE invertible id space ([[whitespaceVocab]]):
    * unlike byte-level's fixed 256-byte base alphabet, the whitespace
    * base symbols are an open set, so the table must pin the observed
    * ones for ids to be stable across sessions. Tables written without
    * one (pre-alphabet fits, hand-built tables) still read fine: merges
    * are the rank ≥ 0 rows either way, and their encode path keeps the
    * legacy xxhash64 subword ids. */
  def mergesToDf(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], byteLevel: Boolean = false,
                 alphabet: Seq[String] = Nil): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(alphabet.isEmpty || !byteLevel,
      "alphabet rows are whitespace-mode only (byte-level's base alphabet " +
        "is the fixed 256-byte table)")
    val alphaRows = alphabet.zipWithIndex.map { case (s, i) =>
      org.apache.spark.sql.Row(-(i + 1), s, "", byteLevel) }
    val mergeRows = merges.zipWithIndex.map { case ((l, r), i) =>
      org.apache.spark.sql.Row(i, l, r, byteLevel) }
    spark.createDataFrame(
      (alphaRows ++ mergeRows).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("left",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("right",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("byte_level",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  /** Inverse of [[mergesToDf]] (merge tables are vocabulary-sized —
    * metadata-scale collect, same bound as training itself). Negative
    * ranks are alphabet rows, not merges — excluded here. */
  def mergesFromDf(df: DataFrame): Seq[Merge] =
    df.select("rank", "left", "right").where(col("rank") >= 0).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** The persisted whitespace-mode base alphabet of a merge table (the
    * negative-rank rows of [[mergesToDf]], in slot order), or empty for
    * tables written without one — the signal that a table predates dense
    * whitespace ids and its packed ids are legacy xxhash64 digests. */
  def alphabetFromDf(df: DataFrame): Seq[String] =
    df.select("rank", "left").where(col("rank") < 0).collect()
      .sortBy(r => -r.getInt(0))
      .map(_.getString(1)).toSeq

  /** The persisted pre-tokenization mode of a merge table, or `default`
    * for tables written before the `byte_level` column existed (or built
    * by hand without one). The mode is constant-per-table BY CONTRACT
    * ([[mergesToDf]] stamps one value): a hand-built/corrupted table with
    * MIXED byte_level values is an error here, not a nondeterministic
    * limit(1) pick — encoding half a merge table under the wrong alphabet
    * would silently corrupt every id. */
  def byteLevelFromDf(df: DataFrame, default: Boolean = false): Boolean =
    if (!df.columns.contains("byte_level")) default
    else {
      val modes = df.select("byte_level")
        .where(col("byte_level").isNotNull).distinct()
        .collect().map(_.getBoolean(0)).toSeq.sorted
      modes match {
        case Seq(m) => m
        case Seq() => default  // empty table / all-null: fall back to caller
        case _ => throw new IllegalArgumentException(
          "merge table mixes byte_level=true and byte_level=false rows — " +
            "the mode is constant per table (one alphabet per merge table)")
      }
    }

  /** The classic merge loop, exposed for spec-level parity testing. */
  def trainLocal(docs: Seq[String], numMerges: Int): Seq[Merge] = {
    // word -> frequency; each word as a mutable symbol sequence (words
    // beyond the encode cap chunk exactly like the encode path, so the
    // trainer never learns a merge the encoder cannot reach)
    val wordFreq = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    docs.foreach(_.split(' ').foreach { w =>
      if (w.nonEmpty) capChunks(w).foreach(c =>
        wordFreq.update(c, wordFreq.getOrElse(c, 0L) + 1L))
    })
    trainFromWordFreq(wordFreq, numMerges)
  }

  /** Base symbols of a word: one per Unicode CODE POINT, not per UTF-16
    * unit — a per-char split would make every astral char (emoji, rare
    * CJK) two lone-surrogate symbols that UTF8String corrupts to '?' on
    * emission. Byte-level mode never reaches this concern (its alphabet
    * is all BMP singles); whitespace mode and its trainer both use this,
    * so segmentation granularity cannot diverge between them. */
  private def codePointSymbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** The merge-selection loop shared by the whitespace and byte-level
    * trainers: greedy argmax pair count with the (count desc, pair asc)
    * deterministic tie-break. */
  private def trainFromWordFreq(
      wordFreq: scala.collection.mutable.LinkedHashMap[String, Long],
      numMerges: Int): Seq[Merge] = {
    var words: Vector[(Array[String], Long)] =
      wordFreq.toVector.map { case (w, f) =>
        (codePointSymbols(w), f)
      }
    val merges = Vector.newBuilder[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[Merge, Long]
      words.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax with (count desc, pair asc) total order — deterministic
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (mergeOnce(syms, best), f) }
        i += 1
      }
    }
    merges.result()
  }

  /** One left-to-right greedy merge pass of `pair` over a symbol array. */
  def mergeOnce(syms: Array[String], pair: Merge): Array[String] = {
    if (syms.length < 2) return syms
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += (pair._1 + pair._2); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Encode one word with a rank table: repeatedly merge the lowest-rank
    * adjacent pair present (the standard BPE inference order, which
    * reproduces training's merge sequence exactly). */
  def encodeWord(word: String,
                              ranks: Map[Merge, Int]): Array[String] = {
    var syms: Array[String] = codePointSymbols(word)
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: Merge = null
      var j = 0
      while (j < syms.length - 1) {
        ranks.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        }
        j += 1
      }
      if (bestPair == null) continue = false
      else syms = mergeOnce(syms, bestPair)
    }
    syms
  }

  /** Column of BPE subword tokens (array<string>) for whitespace-pre-
    * tokenized text, using a learned merge table. */
  def encode(text: Column, merges: Seq[Merge]): Column =
    Glue.column(BpeEncodeExpr(Glue.expression(text), merges))

  /** Exact subword count under a learned merge table (the real version of
    * `TextAnalysis.bpeTokenEstimate`). */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    size(encode(text, merges))

  // ------------------------------------------- whitespace-mode dense ids

  /** Reserved ids of the whitespace-mode dense vocabulary: the word
    * SEPARATOR (encode emits one between consecutive words; decodes to a
    * single space) and UNKNOWN (an alphabet miss — a code point the fit
    * sample never saw; decodes to U+FFFD). Byte-level mode needs neither:
    * its fixed 256-byte base alphabet makes every string encodable and
    * whitespace is just bytes, so its vocab starts at 0 with no reserved
    * slots ([[byteLevelVocab]]). */
  val WsSepId: Int = 0
  val WsUnkId: Int = 1

  /** Whitespace-mode fit that ALSO returns the base alphabet — the
    * distinct code-point symbols of the (capped) sample words, sorted —
    * which is the extra piece a DENSE id table needs beyond the merges.
    * Persist both via [[mergesToDf]] and the table becomes invertible:
    * `CALL detokenize` accepts its packed ids (up to the mode's inherent
    * whitespace normalization — see [[encodeWhitespaceIds]]). */
  def trainWithAlphabet(df: DataFrame, textCol: String, numMerges: Int,
                        sampleDocs: Int = 1000): (Seq[Merge], Seq[String]) =
    trainLocalWithAlphabet(sampleTexts(df, textCol, sampleDocs), numMerges)

  /** Local twin of [[trainWithAlphabet]] (spec parity, same contract as
    * [[trainLocal]]). */
  def trainLocalWithAlphabet(docs: Seq[String], numMerges: Int)
      : (Seq[Merge], Seq[String]) = {
    val alphabet = scala.collection.mutable.SortedSet.empty[String]
    docs.foreach(_.split(' ').foreach { w =>
      if (w.nonEmpty) capChunks(w).foreach(c =>
        codePointSymbols(c).foreach(alphabet += _))
    })
    (trainLocal(docs, numMerges), alphabet.toSeq)
  }

  /** Dense id table for the WHITESPACE mode — the [[byteLevelVocab]]
    * sibling: ids 0/1 are the reserved separator/unknown slots, the fit
    * alphabet takes 2..(2+|alphabet|) in persisted order, then each
    * merge's output string in rank order (first-occurrence-wins on
    * duplicate merged strings, same rule as byte-level). Deterministic
    * given the persisted table, so any session rebuilds identical ids. */
  def whitespaceVocab(merges: Seq[Merge],
                      alphabet: Seq[String]): Map[String, Int] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    alphabet.foreach(s => if (!m.contains(s)) m.update(s, m.size + 2))
    merges.foreach { case (l, r) =>
      val s = l + r
      if (!m.contains(s)) m.update(s, m.size + 2)
    }
    m.toMap
  }

  /** Column of DENSE whitespace-mode token ids (array<int>): per-word
    * subwords under the merge table, each mapped through
    * [[whitespaceVocab]] (alphabet miss → [[WsUnkId]]), with [[WsSepId]]
    * emitted between consecutive words. Invertibility contract: decoding
    * reproduces the text with every whitespace RUN collapsed to one
    * space (the split-on-space pre-tokenization is exactly that lossy —
    * single-space-separated text round-trips byte-exactly; byte-level
    * mode is the fully-lossless door). */
  def encodeWhitespaceIds(text: Column, merges: Seq[Merge],
                          alphabet: Seq[String]): Column =
    Glue.column(BpeEncodeWsIdsExpr(Glue.expression(text), merges, alphabet))

  /** Distributed inverse of [[encodeWhitespaceIds]] (array<int|long> —
    * packed shards store longs): separator ids become one space, unknown
    * ids U+FFFD, ids outside the vocab (the eos sentinel, foreign ids)
    * decode to nothing — same skip-not-crash contract as
    * [[decodeByteLevelIdsCol]], so any packed table detokenizes. */
  def decodeWhitespaceIdsCol(ids: Column, merges: Seq[Merge],
                             alphabet: Seq[String]): Column =
    Glue.column(BpeDecodeWsIdsExpr(Glue.expression(ids), merges, alphabet))

  /** Driver-side inverse for specs and exports (the whitespace sibling of
    * [[byteLevelDecodeIds]]). */
  def whitespaceDecodeIds(ids: Seq[Int], merges: Seq[Merge],
                          alphabet: Seq[String]): String = {
    val inv = whitespaceVocab(merges, alphabet).map(_.swap)
    val sb = new java.lang.StringBuilder
    ids.foreach {
      case WsSepId => sb.append(' ')
      case WsUnkId => sb.append('�')
      case i => inv.get(i).foreach(sb.append(_: String))
    }
    sb.toString
  }

  // ------------------------------------------------------------ byte level

  /** The GPT-2 pre-tokenization split (Radford et al. 2019, public in the
    * gpt-2 repo and every tiktoken port): contractions, optionally
    * space-prefixed letter/digit/punctuation runs, and a whitespace rule
    * whose lookahead leaves the last space attached to the next word.
    * Compiled with UNICODE_CHARACTER_CLASS so `\p{L}`/`\p{N}`/`\s` match
    * the same character classes the Python `regex` module uses. */
  private[llm] val ByteLevelPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
      java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** GPT-2's byte↔unicode table: the 188 printable latin-1 bytes map to
    * themselves; the other 68 (controls, space, DEL, …) map to 256+n so
    * every byte is a visible single char and merges stay string pairs
    * (space → 'Ġ' U+0120, newline → 'Ċ'). Bijective, so decoding is exact
    * byte recovery. */
  private[graft] val byteToUnicode: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      val printable = (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  private[graft] val unicodeToByte: Map[Char, Int] =
    byteToUnicode.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Regex pre-tokens of `text`, each re-expressed in the mapped byte
    * alphabet (UTF-8 bytes → single chars). Non-ASCII chars become
    * multi-symbol byte sequences — the byte-fallback property: every
    * string is encodable with no unknown-token escape hatch. */
  /** Encode-cost guard: [[encodeWord]] is O(len²·lookups) per pre-token
    * (each merge pass rescans all adjacent pairs), so ONE pathological
    * pre-token — a megabyte base64 blob, a DNA string, minified JS with
    * no separators, all real crawl content and all single letter-runs
    * under the GPT-2 regex — would burn 10¹⁰+ ops and hang its task at
    * corpus scale. Pre-tokens longer than this many mapped symbols split
    * into cap-sized chunks before encoding (merges never cross the cut,
    * same as a pre-token boundary; bytes concatenate, so decode stays
    * exact). 4096 bounds the worst chunk at ~16M pair-visits (~ms) while
    * being far beyond any natural-language pre-token. */
  private[graft] val MaxPretokenSymbols = 4096

  /** THE one cap implementation (trainer + both encode modes share it,
    * so the trainer-never-learns-an-unreachable-merge invariant cannot
    * drift): split `s` into ≤ cap-sized chunks, never cutting a
    * surrogate pair — a UTF-16 cut mid-astral-char would strand lone
    * surrogates that UTF8String later corrupts to '?'. (The byte-level
    * path's mapped alphabet is all BMP singles, so the guard is inert
    * there — but one shared helper beats three hand-rolled copies.) */
  private[graft] def capChunks(s: String): Seq[String] = {
    if (s.length <= MaxPretokenSymbols) return Seq(s)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      var end = math.min(i + MaxPretokenSymbols, s.length)
      if (end < s.length && Character.isHighSurrogate(s.charAt(end - 1)))
        end -= 1
      out += s.substring(i, end)
      i = end
    }
    out.result()
  }

  private def chunked(out: scala.collection.mutable.ArrayBuilder[String],
                      s: String): Unit =
    if (s.length <= MaxPretokenSymbols) out += s
    else capChunks(s).foreach(out += _)

  def byteLevelPretokens(text: String): Array[String] = {
    val m = ByteLevelPattern.matcher(text)
    val out = Array.newBuilder[String]
    while (m.find()) {
      val bytes = m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sb = new java.lang.StringBuilder(bytes.length)
      bytes.foreach(b => sb.append(byteToUnicode(b & 0xFF)))
      chunked(out, sb.toString)
    }
    out.result()
  }

  /** Exact inverse of the byte-level token alphabet: mapped chars → bytes
    * → UTF-8 string. Concatenating the decoded tokens of a document
    * reproduces it byte-for-byte (whitespace included — unlike the
    * whitespace mode, byte-level encoding is FULLY lossless). */
  def byteLevelDecode(tokens: Seq[String]): String = {
    val bytes = Array.newBuilder[Byte]
    tokens.foreach(_.foreach(c => bytes += unicodeToByte(c).toByte))
    new String(bytes.result(), java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Learn byte-level merges (GPT-2 style) from the same bounded
    * deterministic sample as [[train]]. Merges never cross pre-token
    * boundaries, matching the published tokenizers. */
  def trainByteLevel(df: DataFrame, textCol: String, numMerges: Int,
                     sampleDocs: Int = 1000): Seq[Merge] =
    trainLocalByteLevel(sampleTexts(df, textCol, sampleDocs), numMerges)

  /** Local byte-level trainer (spec parity twin of [[trainLocal]]). */
  def trainLocalByteLevel(docs: Seq[String], numMerges: Int): Seq[Merge] = {
    val wordFreq = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    docs.foreach(d => byteLevelPretokens(d).foreach { w =>
      if (w.nonEmpty) wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L)
    })
    trainFromWordFreq(wordFreq, numMerges)
  }

  /** Column of byte-level BPE tokens (array<string>, mapped-alphabet
    * strings like "Ġthe") — the tiktoken-shaped sibling of [[encode]]. */
  def encodeByteLevel(text: Column, merges: Seq[Merge]): Column =
    Glue.column(BpeEncodeExpr(Glue.expression(text), merges,
      byteLevel = true))

  /** Exact byte-level subword count. */
  def tokenCountByteLevel(text: Column, merges: Seq[Merge]): Column =
    size(encodeByteLevel(text, merges))

  /** GPT-2-style DENSE id table for the byte-level mode: ids 0-255 are
    * the single-byte symbols in byte order (so the id of a base token is
    * its byte value), then each merge in rank order contributes its
    * merged string at the next free id. Distinct merges can produce the
    * same string — e.g. (a,bc) and (ab,c) both yield "abc" — and the
    * FIRST occurrence wins, matching vocab-by-string semantics.
    * Total vocab ≤ 256 + numMerges; deterministic, engine-reproducible. */
  def byteLevelVocab(merges: Seq[Merge]): Map[String, Int] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    for (b <- 0 until 256) m.update(byteToUnicode(b).toString, b)
    merges.foreach { case (l, r) =>
      val s = l + r
      if (!m.contains(s)) m.update(s, m.size)
    }
    m.toMap
  }

  /** Column of DENSE byte-level token ids (array<int>) — the id stream
    * real pipelines persist, with no hash ids. Lookup can never miss:
    * every post-encode symbol is either a single mapped byte (a base id)
    * or the output string of some merge (in the vocab by construction).
    *
    * `specials` is the tiktoken `allowed_special` mechanism: each listed
    * string is recognized as an ATOMIC token wherever it occurs in the
    * text (longest-match when one special prefixes another), emitted as
    * its own id above the merge vocabulary — id = vocabSize + position in
    * `specials` (GPT-2's layout: <|endoftext|> = 256 + 50000 merges =
    * 50256). An UNLISTED special-looking string is plain text and round-
    * trips through the regex + byte alphabet like any other characters —
    * exactly tiktoken's allowed/disallowed split, minus the
    * raise-on-disallowed policy (a filter concern, not an encode one). */
  def encodeByteLevelIds(text: Column, merges: Seq[Merge],
                         specials: Seq[String] = Nil): Column =
    Glue.column(BpeEncodeIdsExpr(Glue.expression(text), merges, specials))

  /** The one normalization every specials consumer shares: empty strings
    * out (an empty special can never match), duplicates collapsed to the
    * FIRST occurrence — so id assignment and matching always agree on
    * the same effective list. */
  private[graft] def normalizeSpecials(specials: Seq[String]): Seq[String] =
    specials.filter(_.nonEmpty).distinct

  /** Id table of the special tokens: dense ids directly above the merge
    * vocabulary, in NORMALIZED `specials` order (empty entries dropped,
    * duplicates collapsed — otherwise a duplicate would silently shift
    * later ids and leave a hole no encode can emit). */
  def specialIds(merges: Seq[Merge], specials: Seq[String]): Map[String, Int] = {
    val base = byteLevelVocab(merges).size
    normalizeSpecials(specials).zipWithIndex
      .map { case (s, i) => s -> (base + i) }.toMap
  }

  /** Split `text` around occurrences of the allowed specials
    * (longest-match at each position), yielding Left(plain segment) /
    * Right(special) parts in order. */
  private[graft] def splitSpecials(text: String, specials: Seq[String])
      : Seq[Either[String, String]] =
    splitSpecialsSorted(text, normalizeSpecials(specials).sortBy(-_.length))

  /** The scan itself over a pre-normalized longest-first list — the
    * per-row hot path ([[BpeEncodeIdsExpr]] hoists the sort into a
    * transient lazy val so a billion-row encode sorts the list once per
    * executor, not once per row). */
  private[llm] def splitSpecialsSorted(text: String, byLen: Seq[String])
      : Seq[Either[String, String]] = {
    if (byLen.isEmpty) return Seq(Left(text))
    val out = Seq.newBuilder[Either[String, String]]
    val plain = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      byLen.find(s => text.startsWith(s, i)) match {
        case Some(s) =>
          if (plain.length > 0) { out += Left(plain.toString); plain.setLength(0) }
          out += Right(s)
          i += s.length
        case None =>
          plain.append(text.charAt(i)); i += 1
      }
    }
    if (plain.length > 0) out += Left(plain.toString)
    out.result()
  }

  /** DISTRIBUTED inverse of [[encodeByteLevelIds]]: a column of dense
    * byte-level ids (array<int> or array<long> — packed shards store
    * longs) decodes map-side back to text, the shard-audit tool that
    * makes packed training data human-readable in SQL. Ids outside the
    * vocab∪specials space (the `-1` eos sentinel, foreign ids) decode to
    * nothing — documented skip, never a crash, so any packed table
    * detokenizes. Whitespace-mode ids are xxhash64 digests and are NOT
    * invertible; this is a byte-level-only door. */
  def decodeByteLevelIdsCol(ids: Column, merges: Seq[Merge],
                            specials: Seq[String] = Nil): Column =
    Glue.column(BpeDecodeIdsExpr(Glue.expression(ids), merges, specials))

  /** EXACT distributed detokenization of packed shards — the cross-cut
    * upgrade of [[decodeByteLevelIdsCol]]: per-row decode renders a
    * multi-byte char whose byte-ids straddle a sequence cut as U+FFFD at
    * both edges, because neither row alone holds the full byte sequence.
    * This variant joins each row with the FIRST ≤3 ids of the NEXT row
    * (one hash equi-join on `seqCol`+1 — no window, no single partition,
    * broadcastable by AQE when the id frame is small) and decodes with
    * edge awareness: a char is emitted by exactly the row whose bytes it
    * STARTS in — leading continuation bytes defer to the previous row
    * (UTF-8 is self-synchronizing), trailing incomplete chars complete
    * from the neighbor's head bytes. Concatenating the per-row texts in
    * `seqCol` order is then byte-exact for any well-formed packed stream
    * with `seqLen ≥ 3` (below that a single char could span three rows;
    * real shards are 512+). Unknown ids (eos sentinels) skip without
    * breaking byte runs, and specials decode literally — both exactly as
    * the per-row decoder does. */
  def decodeShardsExact(packed: DataFrame, seqCol: String, idsCol: String,
                        merges: Seq[Merge], specials: Seq[String] = Nil,
                        textCol: String = "text"): DataFrame = {
    val heads = packed.select((col(seqCol) - 1).as("__seq_m1"),
      slice(col(idsCol), 1, 3).as("__next_head"))
    packed.join(heads, col(seqCol) === col("__seq_m1"), "left")
      .drop("__seq_m1")
      .withColumn(textCol, Glue.column(BpeDecodeIdsEdgeExpr(
        Glue.expression(col(idsCol)),
        // the LAST row has no successor: coalesce to an empty array OF
        // THE SAME ELEMENT TYPE (a zero-length slice of the ids column)
        // so the expression never sees a null child
        Glue.expression(coalesce(col("__next_head"),
          slice(col(idsCol), 1, 0))),
        merges, specials)))
      .drop("__next_head")
  }

  /** Exact inverse of [[encodeByteLevelIds]] given the same merge table
    * and specials: ids → vocab strings → bytes → UTF-8 (byte-exact,
    * whitespace included; special ids reproduce their literal string).
    * Consecutive non-special ids decode as ONE byte run — a multi-byte
    * char whose bytes landed in different tokens (é → 0xC3, 0xA9 as two
    * base ids) must reassemble before the UTF-8 decode, or each lone
    * byte turns into a replacement char. Driver-side helper for specs
    * and exports. */
  def byteLevelDecodeIds(ids: Seq[Int], merges: Seq[Merge],
                         specials: Seq[String] = Nil): String = {
    val inv = byteLevelVocab(merges).map(_.swap)
    val spInv = specialIds(merges, specials).map(_.swap)
    val sb = new java.lang.StringBuilder
    val run = Seq.newBuilder[String]
    def flush(): Unit = {
      val r = run.result()
      if (r.nonEmpty) { sb.append(byteLevelDecode(r)); run.clear() }
    }
    ids.foreach { i =>
      spInv.get(i) match {
        case Some(s) => flush(); sb.append(s)
        case None => run += inv(i)
      }
    }
    flush()
    sb.toString
  }
}

/**
 * Distributed BPE encoding: pre-tokenize (whitespace, or the GPT-2 regex
 * + byte→unicode alphabet when `byteLevel`), then merge-by-rank per
 * pre-token. The merge table rides in the serialized plan (a few thousand
 * short string pairs) and the per-row work is pure map-side compute —
 * whole-stage codegen calls straight into [[compute]] via the
 * reference-object pattern, same as TokenStats.
 */
case class BpeEncodeExpr(child: Expression, merges: Seq[Bpe.Merge],
                         byteLevel: Boolean = false)
    extends UnaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (byteLevel) "bpe_encode_bytes" else "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string input, got ${dt.simpleString}")
  }

  @transient private lazy val ranks: Map[Bpe.Merge, Int] =
    merges.zipWithIndex.toMap

  def compute(text: UTF8String): ArrayData = {
    val out = Array.newBuilder[UTF8String]
    val words =
      if (byteLevel) Bpe.byteLevelPretokens(text.toString)  // cap applied
      else text.toString.split(' ')
    words.foreach { w =>
      // whitespace mode caps here (byte-level pre-tokens arrive capped):
      // encodeWord is quadratic, so one unbounded blob-word would hang
      // the task — see Bpe.MaxPretokenSymbols
      if (w.nonEmpty) Bpe.capChunks(w).foreach(c =>
        Bpe.encodeWord(c, ranks).foreach(t => out += UTF8String.fromString(t)))
    }
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/**
 * Byte-level BPE encode straight to DENSE vocab ids (array<int>): the
 * GPT-2-shaped id stream — base ids 0-255 are byte values, merged symbols
 * take ids in merge-rank order ([[Bpe.byteLevelVocab]]), allowed special
 * tokens atomic ids above the vocabulary. Same reference-object codegen
 * shape as [[BpeEncodeExpr]]; the vocab map (≤ 256 + numMerges +
 * specials entries) rides in the serialized plan.
 */
case class BpeEncodeIdsExpr(child: Expression, merges: Seq[Bpe.Merge],
                            specials: Seq[String] = Nil)
    extends UnaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids requires string input, got ${dt.simpleString}")
  }

  @transient private lazy val ranks: Map[Bpe.Merge, Int] =
    merges.zipWithIndex.toMap
  @transient private lazy val vocab: Map[String, Int] =
    Bpe.byteLevelVocab(merges)
  @transient private lazy val spIds: Map[String, Int] =
    Bpe.specialIds(merges, specials)
  @transient private lazy val spByLen: Seq[String] =
    Bpe.normalizeSpecials(specials).sortBy(-_.length)

  def compute(text: UTF8String): ArrayData = {
    val out = Array.newBuilder[Int]
    Bpe.splitSpecialsSorted(text.toString, spByLen).foreach {
      case Right(sp) => out += spIds(sp)
      case Left(seg) =>
        Bpe.byteLevelPretokens(seg).foreach { w =>
          if (w.nonEmpty)
            Bpe.encodeWord(w, ranks).foreach(t => out += vocab(t))
        }
    }
    new GenericArrayData(out.result())
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/**
 * Distributed byte-level DETOKENIZER: dense id arrays (int or long
 * element type — packed shards store longs) decode map-side back to
 * UTF-8 text via the inverse vocab, specials to their literal string,
 * unknown ids (eos sentinels, foreign ids) skipped. Consecutive
 * non-special ids reassemble into one byte run before the UTF-8 decode
 * (the [[Bpe.byteLevelDecodeIds]] multi-byte-char contract). Same
 * reference-object codegen shape as the encoders.
 */
/**
 * Whitespace-mode BPE encode straight to DENSE vocab ids (array<int>):
 * per-word merge-by-rank subwords mapped through [[Bpe.whitespaceVocab]]
 * (reserved separator id between words, unknown id on an alphabet miss).
 * Same reference-object codegen shape as [[BpeEncodeIdsExpr]]; the vocab
 * (alphabet + merge outputs, metadata-scale) rides in the serialized plan.
 */
case class BpeEncodeWsIdsExpr(child: Expression, merges: Seq[Bpe.Merge],
                              alphabet: Seq[String])
    extends UnaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ws_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ws_ids requires string input, got ${dt.simpleString}")
  }

  @transient private lazy val ranks: Map[Bpe.Merge, Int] =
    merges.zipWithIndex.toMap
  @transient private lazy val vocab: Map[String, Int] =
    Bpe.whitespaceVocab(merges, alphabet)

  def compute(text: UTF8String): ArrayData = {
    val out = Array.newBuilder[Int]
    var first = true
    text.toString.split(' ').foreach { w =>
      if (w.nonEmpty) {
        if (!first) out += Bpe.WsSepId
        first = false
        // cap before encode, exactly like the string-token path: chunks
        // of one word concatenate with NO separator id between them
        Bpe.capChunks(w).foreach(c =>
          Bpe.encodeWord(c, ranks).foreach { t =>
            // an unmapped token is always a LONE unseen code point: merges
            // only produce fit-time strings (all in the vocab), so a miss
            // can never swallow more than one symbol
            out += vocab.getOrElse(t, Bpe.WsUnkId)
          })
      }
    }
    new GenericArrayData(out.result())
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeWsIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/**
 * Distributed whitespace-mode DETOKENIZER — [[BpeDecodeIdsExpr]]'s
 * sibling over the dense whitespace vocab: separator ids decode to one
 * space, unknown ids to U+FFFD, out-of-vocab ids (eos sentinels, foreign
 * ids) skip. No byte-run reassembly needed: whitespace-mode tokens are
 * already character strings, not mapped bytes.
 */
case class BpeDecodeWsIdsExpr(child: Expression, merges: Seq[Bpe.Merge],
                              alphabet: Seq[String])
    extends UnaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode_ws_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_ws_ids requires array<int|bigint> input, got ${dt.simpleString}")
  }

  @transient private lazy val elementIsLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  @transient private lazy val inv: Map[Int, String] =
    Bpe.whitespaceVocab(merges, alphabet).map(_.swap)

  def compute(ids: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      if (!ids.isNullAt(i)) {
        val raw = if (elementIsLong) ids.getLong(i) else ids.getInt(i).toLong
        if (raw >= Int.MinValue && raw <= Int.MaxValue) {
          val id = raw.toInt
          if (id == Bpe.WsSepId) sb.append(' ')
          else if (id == Bpe.WsUnkId) sb.append('�')
          else inv.get(id) match {
            case Some(tok) => sb.append(tok)
            case None => () // unknown id (eos sentinel, foreign): skip
          }
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecodeWsIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class BpeDecodeIdsExpr(child: Expression, merges: Seq[Bpe.Merge],
                            specials: Seq[String] = Nil)
    extends UnaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_ids requires array<int|bigint> input, got ${dt.simpleString}")
  }

  // lazy: reading child.dataType at construction would throw on a
  // not-yet-resolved child (withNewChildInternal runs pre-analysis)
  @transient private lazy val elementIsLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  @transient private lazy val inv: Map[Int, String] =
    Bpe.byteLevelVocab(merges).map(_.swap)
  @transient private lazy val spInv: Map[Int, String] =
    Bpe.specialIds(merges, specials).map(_.swap)

  def compute(ids: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    val run = Seq.newBuilder[String]
    def flush(): Unit = {
      val r = run.result()
      if (r.nonEmpty) { sb.append(Bpe.byteLevelDecode(r)); run.clear() }
    }
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      if (!ids.isNullAt(i)) {
        val raw = if (elementIsLong) ids.getLong(i) else ids.getInt(i).toLong
        // ids beyond Int range are definitionally foreign — skip
        if (raw >= Int.MinValue && raw <= Int.MaxValue) {
          val id = raw.toInt
          spInv.get(id) match {
            case Some(s) => flush(); sb.append(s)
            case None => inv.get(id) match {
              case Some(tok) => run += tok
              case None => () // unknown id (eos sentinel, foreign): skip
            }
          }
        }
      }
      i += 1
    }
    flush()
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecodeIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/**
 * Edge-aware shard detokenizer ([[Bpe.decodeShardsExact]]'s kernel): decodes
 * one packed row's ids given the first ≤3 ids of the NEXT row, emitting
 * exactly the characters that START in this row's bytes. Leading UTF-8
 * continuation bytes (≤3) are deferred — the previous row emits that char
 * using ITS neighbor head — and a trailing incomplete char completes from
 * the neighbor bytes. The byte walker is offset-aware by construction
 * (UTF-8 lead bytes carry their length), so ownership of a straddling char
 * is unambiguous. Invalid sequences render U+FFFD per byte, matching the
 * per-row decoder's behavior on corrupt input; exactness is guaranteed
 * only for well-formed streams, which is what the encoder produces.
 * Same reference-object codegen shape as the other decode expressions.
 */
case class BpeDecodeIdsEdgeExpr(ids: Expression, nextHead: Expression,
                                merges: Seq[Bpe.Merge],
                                specials: Seq[String] = Nil)
    extends BinaryExpression with Serializable {
  override def left: Expression = ids
  override def right: Expression = nextHead
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode_ids_edge"

  override def checkInputDataTypes(): TypeCheckResult =
    (ids.dataType, nextHead.dataType) match {
      case (ArrayType(IntegerType | LongType, _),
            ArrayType(IntegerType | LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_decode_ids_edge requires array<int|bigint> inputs, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  @transient private lazy val idsIsLong: Boolean = ids.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  @transient private lazy val headIsLong: Boolean = nextHead.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  @transient private lazy val inv: Map[Int, String] =
    Bpe.byteLevelVocab(merges).map(_.swap)
  @transient private lazy val spInv: Map[Int, String] =
    Bpe.specialIds(merges, specials).map(_.swap)

  /** Mapped-alphabet token string → raw bytes. */
  private def tokenBytes(tok: String, out: java.io.ByteArrayOutputStream)
      : Unit =
    tok.foreach(c => out.write(Bpe.unicodeToByte(c)))

  private def idAt(a: ArrayData, i: Int, isLong: Boolean): Option[Int] =
    if (a.isNullAt(i)) None
    else {
      val raw = if (isLong) a.getLong(i) else a.getInt(i).toLong
      if (raw >= Int.MinValue && raw <= Int.MaxValue) Some(raw.toInt)
      else None
    }

  /** Emit the chars of `own ++ ext` that START at byte offsets
    * [from, own.length): valid sequences as their code point (even when
    * they complete inside `ext`), invalid/incomplete ones as one U+FFFD
    * per lead byte — the same per-byte degradation the plain decoder's
    * java.lang.String fallback produces on corrupt input. */
  private def emitOwned(own: Array[Byte], ext: Array[Byte], from: Int,
                        sb: java.lang.StringBuilder): Unit = {
    val n = own.length
    val total = n + ext.length
    def byteAt(i: Int): Int =
      (if (i < n) own(i) else ext(i - n)) & 0xFF
    var pos = from
    while (pos < n) {
      val b = byteAt(pos)
      val len =
        if (b < 0x80) 1
        else if ((b & 0xE0) == 0xC0) 2
        else if ((b & 0xF0) == 0xE0) 3
        else if ((b & 0xF8) == 0xF0) 4
        else -1 // continuation or invalid lead byte
      var ok = len > 0 && pos + len <= total
      if (ok) {
        var j = 1
        while (j < len && ok) {
          ok = (byteAt(pos + j) & 0xC0) == 0x80
          j += 1
        }
      }
      if (!ok) { sb.append('�'); pos += 1 }
      else {
        var cp = len match {
          case 1 => b
          case 2 => b & 0x1F
          case 3 => b & 0x0F
          case _ => b & 0x07
        }
        var j = 1
        while (j < len) { cp = (cp << 6) | (byteAt(pos + j) & 0x3F); j += 1 }
        // overlong/surrogate/out-of-range code points are corrupt input:
        // degrade like the plain decoder (replacement), never crash
        if (cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) sb.append('�')
        else sb.appendCodePoint(cp)
        pos += len
      }
    }
  }

  def compute(own: ArrayData, head: ArrayData): UTF8String = {
    // neighbor context: bytes of the next row's LEADING byte tokens —
    // unknown ids skip without breaking the run (stream semantics), a
    // special stops the scan (it flushes the byte run in a full-stream
    // decode, so bytes beyond it can never complete this row's char)
    val nextBytes = {
      val out = new java.io.ByteArrayOutputStream(16)
      var i = 0
      var stop = false
      val n = head.numElements()
      while (i < n && !stop && out.size < 4) {
        idAt(head, i, headIsLong) match {
          case Some(id) if spInv.contains(id) => stop = true
          case Some(id) => inv.get(id).foreach(tokenBytes(_, out))
          case None => ()
        }
        i += 1
      }
      out.toByteArray
    }
    val sb = new java.lang.StringBuilder
    val run = new java.io.ByteArrayOutputStream(64)
    var firstRun = true // only the row-initial byte run defers its
                        // leading continuation bytes to the previous row
    var i = 0
    val n = own.numElements()
    def flush(isLast: Boolean): Unit = {
      if (run.size() > 0 || (isLast && firstRun)) {
        val bytes = run.toByteArray
        var from = 0
        if (firstRun) {
          // defer ≤3 leading continuation bytes (a char has at most 3);
          // a 4th is corrupt input and renders U+FFFD below
          while (from < bytes.length && from < 3 &&
            (bytes(from) & 0xC0) == 0x80) from += 1
        }
        emitOwned(bytes, if (isLast) nextBytes else Array.emptyByteArray,
          from, sb)
        run.reset()
      }
      firstRun = false
    }
    while (i < n) {
      idAt(own, i, idsIsLong) match {
        case Some(id) if spInv.contains(id) =>
          flush(isLast = false)
          sb.append(spInv(id))
        case Some(id) => inv.get(id).foreach(tokenBytes(_, run))
        case None => () // unknown id (eos sentinel, foreign): skip
      }
      i += 1
    }
    flush(isLast = true)
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecodeIdsEdge", this)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression) = copy(ids = newLeft, nextHead = newRight)
}
