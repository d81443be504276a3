package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Relational
import graft.functions.Distances
import graft.scan.Pred

/**
 * Driver contract: `queries` is the operator inventory (one entry per
 * implemented operator from SURVEY.md §2), `oracleSql` the DuckDB-equivalent
 * SQL the driver hash-compares against at sf0.01.
 *
 * Determinism rules used throughout:
 *  - every query ends in a total ORDER BY (ties broken by a key column) so
 *    row order is identical in Spark output and DuckDB output;
 *  - double aggregations go through exact decimal(38,6) summation on BOTH
 *    sides (`dsum`) — decimal addition is order-independent, so Spark's
 *    partial/final aggregation over an arbitrary partitioning matches
 *    DuckDB's single-threaded sum bit-for-bit after the final cast to double;
 *  - NULL sort position pinned with NULLS FIRST (Spark's ASC default).
 */
object SparkEntry {

  // ---------- helpers ----------

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) — which Spark can
      // only read as a raw int64 (legacy conf), truncated here ns → µs — and
      // as naive-µs TIMESTAMP, which Spark infers as TIMESTAMP_NTZ. Both
      // normalize to µs TimestampType: under the UTC session the NTZ cast is
      // wall-clock identity, exactly how DuckDB reads the same file (so
      // oracle values agree either way).
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else s.read.parquet(s"$dir/$name.parquet")

  /** Order-independent exact sum of a double expression → double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")
  /** Oracle-side spelling of `dsum`. */
  private def DSUM(sql: String): String =
    s"CAST(SUM(CAST(($sql) AS DECIMAL(38,6))) AS DOUBLE)"

  /** 60-bit md5-prefix token hash — the DUAL-ENGINE hash: Spark's
    * `conv(substr(md5(w),1,15),16,10)` equals DuckDB's
    * `('0x'||substr(md5(w),1,15))::BIGINT` value-for-value, so gates built
    * on it (classifier features, packing token ids) get value-exact DuckDB
    * oracles instead of self-certified booleans. Production paths keep the
    * faster codegen'd xxhash64 expressions; this spelling exists for the
    * dual-engine gate queries only. */
  private def md5Hash60(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** Hashing-trick bag-of-words features over `md5Hash60` buckets:
    * `x_j = Σ_tokens sign(w)·[bucket(w)=j]` with `bucket = h mod dim`
    * (dim a power of two) and `sign = 1-2·bit_{log2 dim}(h)` — SIGNED
    * INTEGER counts (exact in IEEE doubles), so dot products against
    * integer weight vectors are bit-exact in both engines and the oracle
    * can recompute teacher labels / logits with plain SQL sums. */
  private def md5BucketFeatures(textCol: Column, dim: Int): Column = {
    require((dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    val log2 = Integer.numberOfTrailingZeros(dim)
    val hs = transform(split(textCol, " "), w => md5Hash60(w))
    transform(sequence(lit(0), lit(dim - 1)), j =>
      aggregate(hs, lit(0L), (acc, h) =>
        acc + when(pmod(h, lit(dim.toLong)) === j.cast("long"),
          lit(1L) - shiftright(h, log2) % 2 * 2L).otherwise(0L))
        .cast("double"))
  }

  /** Exact dot product of an integer-valued double array column with an
    * integer weight vector (+bias): products and the left-fold sum stay in
    * the exact-integer range of IEEE doubles, so the result is bit-equal
    * in any engine and under any row order. */
  private def intDot(x: Column, u: Array[Long], bias: Double = 0.0): Column =
    aggregate(zip_with(x, lit(u.map(_.toDouble)), (a, b) => a * b),
      lit(bias), (acc, v) => acc + v)

  /** DuckDB spelling of the `md5BucketFeatures`+`intDot` pipeline: the
    * per-document sum `Σ_tokens u[h mod dim]·(1-2·bit(h))` over exploded
    * tokens — mathematically `u·x` without materializing the vector. */
  private def duckDot(u: Array[Long], dim: Int): String = {
    val log2 = Integer.numberOfTrailingZeros(dim)
    s"COALESCE(SUM(list_extract([${u.mkString(",")}], " +
      s"CAST(h % $dim AS INT) + 1) * (1 - 2 * ((h >> $log2) & 1))), 0)"
  }

  /** DuckDB token-explode CTE body shared by the dual-engine classifier
    * gates: one row per (doc_id, token-hash `h`). */
  private val duckTokenHashes =
    """SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
      |  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
      |        FROM documents)""".stripMargin

  /** DuckDB recomputation of the DSIR weight model used by the se* gates
    * (raw = all documents, target = doc_id < 120, 256 buckets, add-1
    * smoothing): gram explode → md5-bucket counts → 6-dp DECIMAL
    * log-ratio table over the full bucket domain → per-doc exact sum.
    * Ends with the `w(doc_id, n_grams, wdec)` CTE, no trailing comma. */
  private val duckDsirWeights =
    """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS l FROM documents),
      |g AS (
      |  SELECT doc_id, UNNEST(l) AS gram FROM d
      |  UNION ALL
      |  SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(l)),
      |    i -> l[i] || ' ' || l[i+1])) AS gram FROM d
      |), gb AS (
      |  SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT % 256 AS b
      |  FROM g
      |), rawc AS (SELECT b, COUNT(*) AS nr FROM gb GROUP BY b),
      |tgtc AS (SELECT b, COUNT(*) AS nt FROM gb WHERE doc_id < 120 GROUP BY b),
      |tots AS (SELECT (SELECT SUM(nr) FROM rawc) AS tr,
      |                (SELECT COALESCE(SUM(nt), 0) FROM tgtc) AS tt),
      |lrt AS (
      |  SELECT dom.b,
      |    CAST(ROUND(LN((COALESCE(nt, 0) + 1.0) / (tt + 256.0)), 6) AS DECIMAL(18,6))
      |    - CAST(ROUND(LN((COALESCE(nr, 0) + 1.0) / (tr + 256.0)), 6) AS DECIMAL(18,6)) AS lr
      |  FROM (SELECT UNNEST(RANGE(0, 256)) AS b) dom
      |  LEFT JOIN rawc ON dom.b = rawc.b
      |  LEFT JOIN tgtc ON dom.b = tgtc.b
      |  CROSS JOIN tots
      |), w AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, SUM(lr) AS wdec
      |  FROM gb JOIN lrt USING (b)
      |  GROUP BY doc_id
      |)
      |""".stripMargin

  private case class Q(name: String,
                       fn: (SparkSession, String) => DataFrame,
                       oracle: Option[String])

  /** A gate query whose Spark side and DuckDB oracle are the SAME ANSI SQL
    * text — the strongest parity statement the gate can make: both engines
    * parse, plan, and execute one query string over one set of parquet
    * tables and must agree bit-for-bit after the deterministic-sum spelling
    * (`DSUM`). Used for the TPC-H suite, where the interesting behavior is
    * in the PLAN (decorrelation, semi-join conversion, broadcast choice),
    * not in the API surface. */
  private def sqlQ(name: String, tables: Seq[String], sql: String): Q =
    Q(name, (s, dir) => {
      tables.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(sql)
    }, Some(sql))

  /** Deterministic solid-color 16×16 PNG — test input for the real
    * javax.imageio decode path (mm2): a solid image's channel means are
    * closed-form, so the DuckDB oracle can derive the expected features
    * arithmetically without decoding pixels. */
  def solidPng(r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 16-bit mono PCM square-wave WAV — test input for the
    * real `javax.sound.sampled` decode path (mm3). A square wave's samples
    * are all ±v, so RMS = peak = v/32768 and the zero-crossing count is an
    * integer closed form of the half-period — with v a multiple of 256 the
    * normalized amplitude is an exact binary fraction (v/32768 = k/128) and
    * every feature comes back bit-exact, derivable by the DuckDB oracle
    * without decoding audio. */
  def squareWav(v: Int, halfPeriod: Int, n: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = if ((i / halfPeriod) % 2 == 0) v else -v
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic animated GIF, one solid 8×8 frame per color — test
    * input for the real multi-frame `javax.imageio` decode path (mm4). A
    * solid frame survives GIF's palette quantization exactly (one color →
    * one palette entry), so per-frame channel means are closed-form. */
  def animatedGif(colors: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { img.setRGB(x, y, c); x += 1 }
          y += 1
        }
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    out.toByteArray
  }

  /** Deterministic minimal ISO-BMFF (mp4) box tree — test input for the
    * real box-structure parse (mm5): `ftyp` + `moov{ mvhd, trak{mdia{minf{
    * stbl{stsd}}}}×k }` built byte-for-byte from the public spec's box
    * layout, so duration/track-count/codec are closed-form functions of
    * the inputs and the DuckDB oracle derives them arithmetically. */
  def miniMp4(timescale: Long, duration: Long, codecs: Seq[String]): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(body.length + 8L) ++
        typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ body
    }
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes)
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0), // version 0 + flags
      be32(0), be32(0), be32(timescale), be32(duration))
    val traks = codecs.map { fmt =>
      val entry = be32(16) ++
        fmt.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        be32(0) ++ be32(0) // sample-entry reserved bytes
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
      box("trak", box("mdia", box("minf", box("stbl", stsd))))
    }
    ftyp ++ box("moov", (mvhd +: traks): _*)
  }

  /** Deterministic minimal AVI with uncompressed-DIB frames — test input
    * for the real RIFF demux + lossless BMP-wrapped frame decode (mm6/mm7):
    * one solid 4×4 24-bit BI_RGB frame per gray value, built byte-for-byte
    * from the public RIFF/AVI layout (`hdrl{avih, strl{strh,strf}}` +
    * `movi{00db…}`), so per-frame channel means and the header metadata
    * are closed-form functions of the inputs. */
  def miniAvi(grays: Seq[Int], usPerFrame: Long = 40000L): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def chunk(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      cc(typ) ++ le32(body.length) ++ padded
    }
    def list(listType: String, payload: Array[Byte]*): Array[Byte] =
      chunk("LIST", (cc(listType) +: payload): _*)
    val (w, h) = (4, 4) // 4·3 bytes/row — already 4-byte aligned, no pad
    val avih = chunk("avih", le32(usPerFrame), le32(0), le32(0), le32(0),
      le32(grays.size), le32(0), le32(1), le32(0), le32(w), le32(h),
      new Array[Byte](16))
    val strh = chunk("strh", cc("vids"), cc("DIB "), le32(0), le32(0),
      le32(0), le32(1), le32(1000000L / usPerFrame), le32(0),
      le32(grays.size), le32(0), le32(0xFFFFFFFFL), le32(0),
      new Array[Byte](8))
    val strf = chunk("strf", le32(40), le32(w), le32(h),
      Array[Byte](1, 0, 24, 0), // planes=1, bitCount=24
      le32(0), le32(w * h * 3), le32(0), le32(0), le32(0), le32(0))
    val frames = grays.map { g =>
      val px = new Array[Byte](w * h * 3)
      java.util.Arrays.fill(px, (g & 0xFF).toByte) // solid gray: B=G=R=g
      chunk("00db", px)
    }
    val body = list("hdrl", avih, list("strl", strh, strf)) ++
      list("movi", frames: _*)
    cc("RIFF") ++ le32(body.length + 4L) ++ cc("AVI ") ++ body
  }

  // ---------- operator inventory ----------

  private lazy val defs: Seq[Q] = Seq(

    // ---- S1/P1: scan with projection + filter pushdown (SURVEY §2.1 S1, §2.2 P1)
    Q("s1_scan_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_quantity") < 24 &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_quantity < 24 AND l_shipdate >= TIMESTAMP '1996-01-01'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- P3: all six comparison ops in one conjunction (SURVEY §2.2 P3)
    Q("p3_comparisons",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_linestatus") =!= "F" &&
          col("l_discount") > 0.02 && col("l_tax") <= 0.06 &&
          col("l_quantity") >= 10 && col("l_partkey") < 150)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_discount, l_tax
             |FROM lineitem
             |WHERE l_returnflag = 'R' AND l_linestatus <> 'F'
             |  AND l_discount > 0.02 AND l_tax <= 0.06
             |  AND l_quantity >= 10 AND l_partkey < 150
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- P4: isin (reference expands to OR-of-equals, vastdb/_internal.py:233-234)
    Q("p4_isin",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- P5: isnull / is_valid (vastdb/_internal.py:238-247); testdata has no
    //      physical nulls so nulls are derived with nullif to exercise the path
    Q("p5_isnull",
      (s, dir) => t(s, dir, "lineitem")
        .select(nullif(col("l_discount"), lit(0.0)).as("d"), col("l_orderkey"))
        .agg(count(when(col("d").isNull, 1)).as("n_null"),
             count(when(col("d").isNotNull, 1)).as("n_valid")),
      Some("""SELECT COUNT(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 END) AS n_null,
             |       COUNT(CASE WHEN NULLIF(l_discount, 0.0) IS NOT NULL THEN 1 END) AS n_valid
             |FROM lineitem""".stripMargin)),

    // ---- P6: between → >= AND <= (vastdb/_internal.py:594-599)
    Q("p6_between",
      (s, dir) => t(s, dir, "events")
        .filter(col("ts").between(lit("2024-01-05").cast("timestamp"),
                                  lit("2024-01-07").cast("timestamp")))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE ts BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-07'
             |ORDER BY event_id""".stripMargin)),

    // ---- P7: startswith → UTF-8 range rewrite (vastdb/util.py:162-169)
    Q("p7_startswith",
      (s, dir) => t(s, dir, "part")
        .filter(Pred.compileStrict(Pred.StartsWith(Pred.Ref("p_name"), "small")))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_name LIKE 'small%' ORDER BY p_partkey""".stripMargin)),

    // ---- P8: contains → match_substring (vastdb/_internal.py:591-592)
    Q("p8_contains",
      (s, dir) => t(s, dir, "part")
        .filter(Pred.compileStrict(Pred.Contains(Pred.Ref("p_name"), "wid")))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_name LIKE '%wid%' ORDER BY p_partkey""".stripMargin)),

    // ---- P9: struct sub-field predicate (vastdb/_internal.py:269-305) —
    //      struct built from the events.props JSON blob (blob-expansion shape,
    //      SURVEY §2.10 D11), then filtered on the sub-field
    Q("p9_struct_field",
      (s, dir) => t(s, dir, "events")
        .withColumn("p", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .filter(col("p.k") > 80)
        .select(col("event_id"), col("p.k").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events
             |WHERE CAST(props->>'$.k' AS INT) > 80
             |ORDER BY event_id""".stripMargin)),

    // ---- P10: fixed-size-list (vector column) element predicates
    //      (vastdb/_internal.py:293-300 re-types FSL as list; here element
    //      access composes freely)
    Q("p10_fsl_predicate",
      (s, dir) => t(s, dir, "embeddings")
        .filter(element_at(col("embedding"), 1) > 0.1f &&
          element_at(col("embedding"), 2) < 0.0f)
        .select(col("vec_id"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1
             |FROM embeddings
             |WHERE embedding[1] > 0.1 AND embedding[2] < 0.0
             |ORDER BY vec_id""".stripMargin)),

    // ---- P12: trivial predicate False → empty relation with correct schema
    //      (vastdb/table.py:485-489; Catalyst folds to empty LocalRelation)
    Q("p12_trivial_false",
      (s, dir) => t(s, dir, "region").filter(lit(false))
        .select("r_regionkey", "r_name"),
      Some("SELECT r_regionkey, r_name FROM region WHERE 1 = 0")),

    // ---- P13: predicate-only count (columns=[], vastdb/_internal.py:2590)
    Q("p13_count_only",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "A")
        .agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'A'")),

    // ---- L1/L3: top-k = ORDER BY + LIMIT → TakeOrderedAndProject
    Q("l3_topk",
      (s, dir) => Relational.topK(t(s, dir, "orders"), 25,
          col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin)),

    // ---- L4: data-at-rest ordering (Elysium sort, vastdb/table.py:996-1008):
    //      global range-partitioned sort — write path uses the same plan
    Q("l4_global_sort",
      (s, dir) => t(s, dir, "lineitem")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
             |FROM lineitem
             |ORDER BY l_shipdate, l_orderkey, l_linenumber""".stripMargin)),

    // ---- J*: all seven wire-IR JoinKind values (SURVEY §2.3) ----
    Q("j1_join_inner",
      (s, dir) => Relational.join(t(s, dir, "lineitem"), t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"), "Inner")
        .groupBy("o_orderstatus")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some(s"""SELECT o_orderstatus,
              |  ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue,
              |  COUNT(*) AS n
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("j2_join_left",
      (s, dir) => Relational.join(t(s, dir, "customer"), t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "LeftOuter")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    Q("j3_join_right",
      (s, dir) => Relational.join(t(s, dir, "orders"), t(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"), "RightOuter")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    Q("j4_join_full",
      (s, dir) => {
        val usedNations = t(s, dir, "customer").select(col("c_nationkey")).distinct()
        Relational.join(usedNations, t(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"), "FullOuter")
          .select(col("c_nationkey"), col("n_nationkey"), col("n_name"))
          .orderBy(asc_nulls_first("n_nationkey"), asc_nulls_first("c_nationkey"))
      },
      Some("""SELECT c_nationkey, n_nationkey, n_name
             |FROM (SELECT DISTINCT c_nationkey FROM customer) u
             |FULL JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY n_nationkey NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin)),

    Q("j5_join_semi",
      (s, dir) => Relational.join(t(s, dir, "customer"),
          t(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "LeftSemi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    Q("j6_join_anti",
      (s, dir) => Relational.join(t(s, dir, "customer"),
          t(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "Anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    Q("j7_join_cross",
      (s, dir) => Relational.join(t(s, dir, "region"),
          t(s, dir, "orders").select(col("o_orderstatus")).distinct(),
          lit(true), "Cross")
        .select("r_name", "o_orderstatus")
        .orderBy("r_name", "o_orderstatus"),
      Some("""SELECT r_name, o_orderstatus
             |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) o
             |ORDER BY r_name, o_orderstatus""".stripMargin)),

    // ---- A*: aggregation layer (SURVEY §2.4; delegated to DuckDB/PyArrow
    //      in the reference, native hash-agg here) ----
    Q("a1_agg_groupby",  // TPC-H Q1 shape
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
             dsum(col("l_extendedprice")).as("sum_base_price"),
             dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
             (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
             count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${DSUM("l_quantity")} AS sum_qty,
              |  ${DSUM("l_extendedprice")} AS sum_base_price,
              |  ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
              |  ${DSUM("l_quantity")} / COUNT(*) AS avg_qty,
              |  COUNT(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("a2_agg_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
             countDistinct(col("l_suppkey")).as("nd_supps"),
             min(col("l_quantity")).as("min_qty"),
             max(col("l_quantity")).as("max_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS nd_parts,
             |  COUNT(DISTINCT l_suppkey) AS nd_supps,
             |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("a3_agg_rollup",
      (s, dir) => t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              |  ${DSUM("o_totalprice")} AS total
              |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
              |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    Q("a4_agg_cube",
      (s, dir) => t(s, dir, "events")
        .cube(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("d")),
      Some(s"""SELECT event_type, DATE_TRUNC('day', ts) AS d, COUNT(*) AS n,
              |  ${DSUM("value")} AS v
              |FROM events GROUP BY CUBE (event_type, DATE_TRUNC('day', ts))
              |ORDER BY event_type NULLS FIRST, d NULLS FIRST""".stripMargin)),

    Q("a6_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
                |FROM orders_v
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    Q("a7_percentile",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
             round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS median_qty,
             |  ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("ap1_rollup_route",  // materialized rollup (aggregate projection)
      // through the SQL catalog: lineitem is loaded into a graft table, a
      // (l_returnflag, l_linestatus) rollup is built, and the GROUP BY —
      // over a strict SUBSET of the rollup dims, so partials provably
      // re-merge — must be ANSWERED FROM THE ROLLUP (the fn throws if the
      // optimized plan still reads base files) yet match DuckDB's answer
      // over the raw parquet bit-for-bit. Exact-typed aggregates only
      // (bigint sum, count, double min/max): no merge-order fuzz in the
      // hash. First gate query on the catalog READ stack end-to-end:
      // loadTable → AggProjectionRewrite → rollup parquet scan.
      (s, dir) => {
        val root = java.nio.file.Files.createTempDirectory("graft-ap1").toString
        val vs = graft.api.VastSession(s, root)
        vs.createBucket("b")
        val li = t(s, dir, "lineitem")
        vs.transaction { tx =>
          val t0 = tx.bucket("b").createSchema("m")
            .createTable("lineitem", li.schema)
          t0.insert(li)
          t0.createAggProjection("r1", Seq("l_returnflag", "l_linestatus"),
            Seq("l_partkey", "l_extendedprice"))
        }
        s.conf.set("spark.sql.catalog.gap1",
          "org.apache.spark.sql.graftglue.GraftSqlCatalog")
        s.conf.set("spark.sql.catalog.gap1.root", root)
        val df = s.sql(
          """SELECT l_returnflag, CAST(SUM(l_partkey) AS BIGINT) AS sum_pk,
            |  COUNT(*) AS n, MIN(l_extendedprice) AS min_price,
            |  MAX(l_extendedprice) AS max_price
            |FROM gap1.b.m.lineitem
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
        val routed = df.queryExecution.optimizedPlan.collect {
          case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
              if sr.relation.table.name.contains("$") => sr.relation.table.name
        }
        require(routed.nonEmpty,
          "ap1: aggregate was not routed to the rollup — plan reads base files")
        df
      },
      Some("""SELECT l_returnflag, CAST(SUM(l_partkey) AS BIGINT) AS sum_pk,
             |  COUNT(*) AS n, MIN(l_extendedprice) AS min_price,
             |  MAX(l_extendedprice) AS max_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("a5_approx_distinct",  // HLL sketch, self-oracled: the estimate itself
      // is engine-specific, but "within 3×rsd of the exact count" is a
      // machine-checkable bound DuckDB can assert (its side is always true,
      // so a bound violation on the Spark side flips the hash red)
      (s, dir) => t(s, dir, "lineitem")
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("_approx"),
             countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("exact_parts"),
          (abs(col("_approx") - col("exact_parts")).cast("double")
            / col("exact_parts") <= 0.15).as("within_rsd")),
      Some("""SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             |       true AS within_rsd FROM lineitem""".stripMargin)),

    // ---- W*: window functions (SURVEY §2.5, IR WindowCall) ----
    Q("w1_window_rank",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("rk", rank().over(w))
          .filter(col("rn") <= 5)
          .select("o_orderstatus", "rn", "rk", "o_orderkey", "o_totalprice")
          .orderBy("o_orderstatus", "rn")
      },
      Some("""SELECT o_orderstatus, rn, rk, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             |    RANK()       OVER (PARTITION BY o_orderstatus
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |  FROM orders) x
             |WHERE rn <= 5 ORDER BY o_orderstatus, rn""".stripMargin)),

    Q("w2_window_running_sum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") < 30)
          .withColumn("run_total",
            sum(col("o_totalprice").cast(DecimalType(38, 6))).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "run_total")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
             |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |    AS run_total
             |FROM orders WHERE o_custkey < 30
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("w3_window_lag_lead",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .filter(col("user_id") < 20)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .select("user_id", "event_id", "event_type", "prev_type", "next_type")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, event_type,
             |  LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
             |FROM events WHERE user_id < 20
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- SO*: set operations (SURVEY §2.7, IR SetOpKind) ----
    Q("so1_union_all",
      (s, dir) => Relational.union(
          t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select("o_orderkey", "o_totalprice"),
          t(s, dir, "orders").filter(col("o_totalprice") > 450000)
            .select("o_orderkey", "o_totalprice"))
        .orderBy("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
             |UNION ALL
             |SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000
             |ORDER BY o_orderkey, o_totalprice""".stripMargin)),

    Q("so2_intersect",
      (s, dir) => Relational.intersect(
          t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey"),
          t(s, dir, "orders").filter(col("o_orderpriority") === "5-LOW")
            .select("o_custkey"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
             |ORDER BY o_custkey""".stripMargin)),

    Q("so3_except",
      (s, dir) => Relational.except(
          t(s, dir, "customer").select("c_custkey"),
          t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |EXCEPT
             |SELECT o_custkey FROM orders
             |ORDER BY c_custkey""".stripMargin)),

    // ---- V*: vector search (SURVEY §2.8) — metric l2sq / ip over the
    //      embeddings table; query vector = row vec_id=0, joined in via
    //      broadcast (no driver-side collect)
    Q("v1_vector_topk_l2sq",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
        e.crossJoin(broadcast(q))
          .withColumn("d", round(Distances.l2sq(col("embedding"), col("qvec")), 2))
          .orderBy(col("d").asc, col("vec_id").asc)
          .limit(20)
          .select("vec_id", "d")
      },
      Some("""SELECT vec_id,
             |  ROUND(CAST(list_distance(embedding, q.qvec) AS DOUBLE)
             |        * CAST(list_distance(embedding, q.qvec) AS DOUBLE), 2) AS d
             |FROM embeddings
             |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
             |ORDER BY d, vec_id LIMIT 20""".stripMargin)),

    Q("v2_vector_topk_ip",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
        e.crossJoin(broadcast(q))
          .withColumn("ip", round(Distances.ip(col("embedding"), col("qvec")), 2))
          .orderBy(col("ip").desc, col("vec_id").asc)
          .limit(20)
          .select("vec_id", "ip")
      },
      Some("""SELECT vec_id,
             |  ROUND(CAST(list_inner_product(embedding, q.qvec) AS DOUBLE), 2) AS ip
             |FROM embeddings
             |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
             |ORDER BY ip DESC, vec_id LIMIT 20""".stripMargin)),

    // ---- D1-D3: DML semantics (SURVEY §2.10) as row-set transforms; the
    //      storage copy-on-write path is exercised in the catalog specs ----
    Q("d1_update_where",
      (s, dir) => graft.dml.Dml.updateWhere(t(s, dir, "lineitem"),
          col("l_returnflag") === "R",
          Map("l_discount" -> lit(0.0)))
        .select("l_orderkey", "l_linenumber", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_discount END AS l_discount,
             |  l_returnflag
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("d2_delete_where",
      (s, dir) => graft.dml.Dml.deleteWhere(t(s, dir, "orders"),
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderdate FROM orders
             |WHERE NOT COALESCE(o_orderdate < TIMESTAMP '1997-01-01', FALSE)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("d3_rowid_assignment",
      (s, dir) => graft.dml.Dml.withRowIds(t(s, dir, "documents"), Seq("doc_id"))
        .select("_row_id", "doc_id")
        .orderBy("_row_id"),
      Some("""SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS _row_id, doc_id
             |FROM documents ORDER BY _row_id""".stripMargin)),

    Q("cdc1_row_changes",  // row-level CDC between committed versions: a
      // graft table takes an UPDATE, a DELETE, and an INSERT commit; then
      // changes(v1) must reconstruct exactly which rows changed and how —
      // matched by stable _row_id across COW rewrites, no-op rows of
      // rewritten files suppressed by payload compare, preimages from the
      // FROM version. The oracle derives the same change set relationally.
      (s, dir) => {
        val root = java.nio.file.Files.createTempDirectory("graft-cdc1").toString
        val vs = graft.api.VastSession(s, root)
        vs.createBucket("b")
        val docs = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
        vs.transaction { tx =>   // v1: seed
          tx.bucket("b").createSchema("m").createTable("d", docs.schema)
            .insert(docs)
        }
        vs.transaction { tx =>   // v2: update
          tx.bucket("b").schema("m").table("d")
            .updateWhere(col("lang") === "en", Map("n_chars" -> lit(-1L)))
        }
        vs.transaction { tx =>   // v3: delete
          tx.bucket("b").schema("m").table("d")
            .deleteWhere(col("doc_id") % 100 === 0)
        }
        vs.transaction { tx =>   // v4: insert
          tx.bucket("b").schema("m").table("d").insert(
            docs.filter(col("doc_id") < 5)
              .withColumn("doc_id", col("doc_id") + 1000000L))
        }
        vs.transaction { tx =>
          tx.bucket("b").schema("m").table("d").changes(1L)
            .select("_change_type", "doc_id", "lang", "n_chars")
            .orderBy("doc_id", "_change_type")
        }
      },
      Some("""WITH base AS (SELECT doc_id, lang, n_chars FROM documents)
             |SELECT * FROM (
             |  SELECT 'insert' AS _change_type, doc_id + 1000000 AS doc_id,
             |         lang, n_chars FROM base WHERE doc_id < 5
             |  UNION ALL
             |  SELECT 'delete', doc_id, lang, n_chars FROM base
             |  WHERE doc_id % 100 = 0
             |  UNION ALL
             |  SELECT 'update_preimage', doc_id, lang, n_chars FROM base
             |  WHERE lang = 'en' AND doc_id % 100 <> 0
             |  UNION ALL
             |  SELECT 'update_postimage', doc_id, lang, CAST(-1 AS BIGINT)
             |  FROM base WHERE lang = 'en' AND doc_id % 100 <> 0
             |) ORDER BY doc_id, _change_type""".stripMargin)),

    Q("mm9_phash_pairs",  // perceptual image dedup: REAL decode + DCT
      // pHash over deterministic random-pattern images; a BMP re-encode of
      // image 3's pixels must hash identically (lossless container
      // invariance) and a one-pixel-nudged copy of image 7 lands within
      // the Hamming radius, while 40 distinct patterns pair with nothing —
      // the planted-twin set is the literal oracle
      (s, dir) => {
        import s.implicits._
        def img(seed: Long, fmt: String, noise: Boolean): Array[Byte] = {
          val rnd = new scala.util.Random(seed)
          val bi = new java.awt.image.BufferedImage(32, 32,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 32; x <- 0 until 32)
            bi.setRGB(x, y, rnd.nextInt(256) * 0x010101)
          if (noise) {
            val v = math.min(255, (bi.getRGB(5, 9) & 0xFF) + 2)
            bi.setRGB(5, 9, v * 0x010101)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(bi, fmt, bos)
          bos.toByteArray
        }
        val rows = (0L until 40L).map(i => (i, img(i, "png", false))) ++
          Seq((1000L, img(3, "bmp", false)), (1001L, img(7, "png", true)))
        graft.llm.Multimodal.imagePhashPairs(
            rows.toDF("img_id", "media"), "img_id", "media", maxHamming = 3)
          .select("id_a", "id_b").orderBy("id_a")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(3 AS BIGINT), CAST(1000 AS BIGINT)),
             |  (CAST(7 AS BIGINT), CAST(1001 AS BIGINT)))
             |AS t(id_a, id_b) ORDER BY id_a""".stripMargin)),

    Q("mm10_audio_fp_pairs",  // audio near-dup detection: REAL PCM decode +
      // Haitsma-Kalker-shape energy-difference fingerprint; a HALF-GAIN
      // copy of clip 3 must land within the Hamming radius (energy
      // comparisons are gain-invariant) while 30 distinct random-envelope
      // clips pair with nothing — the planted twin is the literal oracle
      (s, dir) => {
        import s.implicits._
        def clip(seed: Long, gain: Double): Array[Byte] = {
          val rnd = new scala.util.Random(seed)
          val amps = Array.fill(33)(0.1 + rnd.nextDouble() * 0.8)
          val samples = Array.tabulate(3300)(i =>
            gain * amps(i / 100) * (if (i % 7 < 3) 1.0 else -1.0))
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val raw = new Array[Byte](samples.length * 2)
          samples.zipWithIndex.foreach { case (v, i) =>
            val sv = math.max(-32768, math.min(32767, math.round(v * 32767))).toInt
            raw(2 * i) = (sv & 0xFF).toByte
            raw(2 * i + 1) = ((sv >> 8) & 0xFF).toByte
          }
          val in = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, samples.length)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(in,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        }
        val rows = (0L until 30L).map(i => (i, clip(i, 1.0))) :+
          (1000L, clip(3, 0.5))
        graft.llm.Multimodal.audioFingerprintPairs(
            rows.toDF("clip_id", "media"), "clip_id", "media", maxHamming = 3)
          .select("id_a", "id_b").orderBy("id_a")
      },
      Some("""SELECT CAST(3 AS BIGINT) AS id_a, CAST(1000 AS BIGINT) AS id_b
             |""".stripMargin)),

    // ---- TA*: text analysis for training-data pipelines ----
    Q("ta1_token_stats",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.llm.TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          graft.llm.TextAnalysis.regexTokenCount(col("text")).as("n_tokens_regex"),
          graft.llm.TextAnalysis.bpeTokenEstimate(col("text")).as("n_tokens_bpe_est"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             |  LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_tokens_regex,
             |  GREATEST(CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT),
             |           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT)) AS n_tokens_bpe_est
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("ta2_quality_score",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.llm.TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
          graft.llm.TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
          graft.llm.TextAnalysis.qualityScore(col("text")).as("quality_score"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g')))
             |        * 1.0 / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
             |  ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
             |          w -> w IN ('the','a','of','and','to','in','is','it','for','on')))
             |        * 1.0 / GREATEST(LEN(STRING_SPLIT(text, ' ')), 1), 6) AS stopword_ratio,
             |  CAST(CAST(LEAST(LENGTH(text), 500) / 500.0 AS DECIMAL(18,6)) * 0.3
             |    + CAST(1.0 - ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g')))
             |            * 1.0 / GREATEST(LENGTH(text), 1), 6) AS DECIMAL(18,6)) * 0.2
             |    + CAST(ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
             |          w -> w IN ('the','a','of','and','to','in','is','it','for','on')))
             |        * 1.0 / GREATEST(LEN(STRING_SPLIT(text, ' ')), 1), 6) AS DECIMAL(18,6)) * 0.5
             |    AS DOUBLE) AS quality_score
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("ta3_langid",  // accuracy-vs-label over a GENERATED stopword-profiled
      // corpus (the shipped synthetic corpus reuses one vocabulary for every
      // lang label, so it carries no language signal): 100 docs per language,
      // each mixing SIX distinct own-profile stopwords (deterministic
      // rotation — stride 3 is coprime to the 10-word profile, so indices
      // never collide) with neutral content tokens no profile contains.
      // Own-language distinct matches (6) always dominate cross-language
      // profile overlaps (≤2 words shared between any two profiles), so a
      // correct classifier must label every doc right — the oracle asserts
      // per-language accuracy 100/100, a label-accuracy gate rather than a
      // marker-text echo.
      (s, dir) => {
        import s.implicits._
        val profiles = Seq(
          "de" -> Seq("der","die","und","das","ist","nicht","ein","mit","auf","zu"),
          "en" -> Seq("the","of","and","to","in","is","that","it","for","with"),
          "es" -> Seq("el","la","de","que","los","una","por","con","para","es"),
          "fr" -> Seq("le","la","et","les","des","une","est","dans","pour","que"),
          "zh" -> Seq("的","是","在","了","和","有","我","不","这","个"))
        val docs = for {
          (lang, prof) <- profiles
          i <- 0 until 100
        } yield {
          val stops = (0 until 6).map(j => prof((i + j * 3) % 10))
          val content = (0 until 8).map(j => s"tok${i}x$j")
          (lang, (stops ++ content).mkString(" "))
        }
        docs.toDF("want", "text")
          .select(col("want"),
            graft.llm.TextAnalysis.langId(col("text")).as("lang_pred"))
          .groupBy("want")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("lang_pred") === col("want"), 1L).otherwise(0L))
              .as("n_correct"))
          .orderBy("want")
      },
      Some("""SELECT want, CAST(100 AS BIGINT) AS n_docs,
             |  CAST(100 AS BIGINT) AS n_correct
             |FROM (VALUES ('de'),('en'),('es'),('fr'),('zh')) AS t(want)
             |ORDER BY want""".stripMargin)),

    Q("ta4_fingerprint",  // self-oracled via determinism + discrimination:
      // the 64-bit value itself is engine-specific, but equal texts must
      // fingerprint equally (pure function) and the ~n²/2⁶⁴ collision chance
      // over distinct texts is zero on this corpus — so distinct-text count
      // must equal distinct-fingerprint count, which DuckDB can compute
      (s, dir) => t(s, dir, "documents")
        .select(col("text"),
          graft.llm.TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(countDistinct(col("text")).as("n_texts"),
             countDistinct(col("fp")).as("n_fingerprints")),
      Some("""SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_texts,
             |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_fingerprints
             |FROM documents""".stripMargin)),

    Q("ta5_repetition",  // Gopher-style repetition signals via the native
      // single-pass RepetitionStats expression; DuckDB recomputes the same
      // token windows (incl. the 1-token slice-cap "bigram") — exact parity
      (s, dir) => graft.llm.TextAnalysis.repetitionStats(
          t(s, dir, "documents").filter(col("doc_id") < 500), "doc_id")
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, STRING_SPLIT(text, ' ') AS l
             |  FROM documents WHERE doc_id < 500
             |), w AS (
             |  SELECT doc_id, LEN(l) AS n_words,
             |         LEN(LIST_DISTINCT(l)) AS n_distinct
             |  FROM d
             |), bg AS (
             |  SELECT doc_id, UNNEST(LIST_TRANSFORM(
             |    RANGE(1, GREATEST(LEN(l) - 2, 0) + 2),
             |    i -> ARRAY_TO_STRING(l[i:i+1], ' '))) AS g
             |  FROM d
             |), top AS (
             |  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM (
             |    SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g
             |  ) GROUP BY doc_id
             |)
             |SELECT w.doc_id, CAST(n_words AS INT) AS n_words,
             |  ROUND(1 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
             |  ROUND(CAST(top_c AS DOUBLE) / n_bg, 6) AS top_bigram_frac
             |FROM w JOIN top ON w.doc_id = top.doc_id
             |ORDER BY w.doc_id""".stripMargin)),

    Q("ta6_top_ngrams",  // corpus-wide top-k 3-grams by document frequency
      // (the boilerplate/contamination survey step); DuckDB recomputes the
      // identical per-doc distinct shingle set and the same (freq desc,
      // gram asc) total order — exact top-k parity incl. the cut boundary
      (s, dir) => graft.llm.TextAnalysis.topNgrams(
        t(s, dir, "documents"), "text", n = 3, k = 50),
      Some("""WITH d AS (
             |  SELECT doc_id, STRING_SPLIT(text, ' ') AS l FROM documents
             |), g AS (
             |  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
             |    RANGE(1, GREATEST(LEN(l) - 3, 0) + 2),
             |    i -> ARRAY_TO_STRING(l[i:i+2], ' ')))) AS gram
             |  FROM d
             |)
             |SELECT gram, COUNT(*) AS doc_freq FROM g GROUP BY gram
             |ORDER BY doc_freq DESC, gram LIMIT 50""".stripMargin)),

    Q("ta7_unigram_logprob",  // corpus-unigram-LM scoring (CCNet/KenLM
      // quality-filter shape); per-token -ln p rounds to 6dp into DECIMAL
      // before the per-doc sum, so the total is exact and partition-order
      // independent — DuckDB recomputes the identical staged formula
      (s, dir) => graft.llm.TextAnalysis.unigramLogProb(
          t(s, dir, "documents"), "doc_id")
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
             |  FROM documents
             |), tf AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
             |tot AS (SELECT SUM(c) AS s FROM tf)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |  CAST(SUM(CAST(ROUND(-LN(c * 1.0 / s), 6) AS DECIMAL(18,6)))
             |       AS DOUBLE) AS neg_logp_sum
             |FROM tok JOIN tf USING (w) CROSS JOIN tot
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("ta10_bigram_logprob",  // bigram LM with Stupid Backoff: counts
      // trained on docs < 400, docs >= 400 scored against them — the split
      // is what makes the backoff branch REAL (3 scored bigrams are unseen
      // in training at sf0.01 and take the α·c(w₂)/N path, which the
      // n_backoff column pins); per-bigram −ln S staged to 6dp DECIMAL
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.llm.TextAnalysis.bigramLogProb(
            d.filter(col("doc_id") < 400), d.filter(col("doc_id") >= 400),
            "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, STRING_SPLIT(text, ' ') AS l FROM documents
             |), c1 AS (
             |  SELECT w, COUNT(*) AS c1 FROM (
             |    SELECT UNNEST(l) AS w FROM d WHERE doc_id < 400
             |  ) GROUP BY w
             |), n AS (SELECT SUM(c1) AS n_corpus FROM c1),
             |c2 AS (
             |  SELECT g.w1 AS w1, g.w2 AS w2, COUNT(*) AS c2 FROM (
             |    SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(l)),
             |      i -> struct_pack(w1 := l[i], w2 := l[i+1]))) AS g
             |    FROM d WHERE doc_id < 400
             |  ) GROUP BY 1, 2
             |), bg AS (
             |  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM (
             |    SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(l)),
             |      i -> struct_pack(w1 := l[i], w2 := l[i+1]))) AS g
             |    FROM d WHERE doc_id >= 400
             |  )
             |), p AS (
             |  SELECT bg.doc_id, c2.c2,
             |    CAST(ROUND(-LN(CASE WHEN c2.c2 IS NOT NULL
             |      THEN c2.c2 * 1.0 / p1.c1
             |      ELSE 0.4 * COALESCE(p2.c1, 1) / n.n_corpus END), 6)
             |      AS DECIMAL(18,6)) AS nls
             |  FROM bg
             |  LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
             |  LEFT JOIN c1 p1 ON bg.w1 = p1.w
             |  LEFT JOIN c1 p2 ON bg.w2 = p2.w
             |  CROSS JOIN n
             |)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_backoff,
             |  CAST(SUM(nls) AS DOUBLE) AS neg_logp_sum
             |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("ta18_ccnet_buckets",  // CCNet perplexity bucketing: docs >= 400
      // scored against the LM of docs < 400, split per LANGUAGE into
      // head/middle/tail thirds by exact integer micro-nats-per-bigram with
      // RANK-arithmetic boundaries ((rank*3) div m — never an interpolated
      // quantile cut value); DuckDB rebuilds the whole LM (the ta10 CTEs)
      // plus the per-language ranking and must agree bucket-for-bucket
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.llm.TextAnalysis.ccnetBuckets(
            d.filter(col("doc_id") < 400), d.filter(col("doc_id") >= 400),
            "doc_id", groupCol = Some("lang"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS l FROM documents
             |), c1 AS (
             |  SELECT w, COUNT(*) AS c1 FROM (
             |    SELECT UNNEST(l) AS w FROM d WHERE doc_id < 400
             |  ) GROUP BY w
             |), n AS (SELECT SUM(c1) AS n_corpus FROM c1),
             |c2 AS (
             |  SELECT g.w1 AS w1, g.w2 AS w2, COUNT(*) AS c2 FROM (
             |    SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(l)),
             |      i -> struct_pack(w1 := l[i], w2 := l[i+1]))) AS g
             |    FROM d WHERE doc_id < 400
             |  ) GROUP BY 1, 2
             |), bg AS (
             |  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM (
             |    SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(l)),
             |      i -> struct_pack(w1 := l[i], w2 := l[i+1]))) AS g
             |    FROM d WHERE doc_id >= 400
             |  )
             |), p AS (
             |  SELECT bg.doc_id, c2.c2,
             |    CAST(ROUND(-LN(CASE WHEN c2.c2 IS NOT NULL
             |      THEN c2.c2 * 1.0 / p1.c1
             |      ELSE 0.4 * COALESCE(p2.c1, 1) / n.n_corpus END), 6)
             |      AS DECIMAL(18,6)) AS nls
             |  FROM bg
             |  LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
             |  LEFT JOIN c1 p1 ON bg.w1 = p1.w
             |  LEFT JOIN c1 p2 ON bg.w2 = p2.w
             |  CROSS JOIN n
             |), lm AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |    CAST(SUM(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_backoff,
             |    CAST(SUM(nls) AS DOUBLE) AS neg_logp_sum,
             |    CAST(SUM(nls) * 1000000 AS BIGINT)
             |      // CAST(COUNT(*) AS BIGINT) AS ppt_micro
             |  FROM p GROUP BY doc_id
             |), ranked AS (
             |  SELECT lm.*, d.lang AS "group",
             |    ROW_NUMBER() OVER (PARTITION BY d.lang
             |      ORDER BY ppt_micro, lm.doc_id) - 1 AS wr,
             |    COUNT(*) OVER (PARTITION BY d.lang) AS m
             |  FROM lm JOIN d ON lm.doc_id = d.doc_id
             |)
             |SELECT doc_id, "group", n_bigrams, n_backoff, neg_logp_sum,
             |  ppt_micro,
             |  CASE (wr * 3) // m WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
             |    ELSE 'tail' END AS bucket
             |FROM ranked ORDER BY doc_id""".stripMargin)),

    Q("ta11_heavy_hitters",  // count-min-sketch frequency estimates vs the
      // exact counts: seed-fixed CMS is fully deterministic, and on this
      // corpus's vocabulary the 2718-counter rows are collision-free, so
      // the estimate must EQUAL the exact count — DuckDB recomputes the
      // exact counts for both columns
      (s, dir) => graft.llm.TextAnalysis.heavyHitterEstimates(
        t(s, dir, "documents"), "text",
        terms = Seq("table", "vector", "spark", "query", "zzz_absent")),
      Some("""WITH tok AS (
             |  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
             |), probe(term) AS (VALUES
             |  ('table'), ('vector'), ('spark'), ('query'), ('zzz_absent')),
             |ex AS (
             |  SELECT term, CAST(COUNT(tok.w) AS BIGINT) AS c
             |  FROM probe LEFT JOIN tok ON tok.w = probe.term GROUP BY term
             |)
             |SELECT term, c AS exact_count, c AS cms_estimate FROM ex
             |ORDER BY term""".stripMargin)),

    Q("ta12_hash_embedding",  // hashing-trick text featurization feeding
      // the vector stack: cosine-1 pairs over the hashed embeddings must
      // be EXACTLY the equal-token-MULTISET pairs (the embedding is
      // order-invariant bag-of-words — a reordered copy of doc 3 is
      // planted to prove it), and no distinct-multiset pair may cross the
      // 0.9999 bar; DuckDB computes the multiset-equality ground truth
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val planted = docs.filter(col("doc_id") === 3)
          .select(lit(1000003L).as("doc_id"),
            array_join(reverse(split(col("text"), " ")), " ").as("text"))
        val emb = docs.union(planted).select(col("doc_id"),
          graft.llm.TextAnalysis.hashEmbedding(col("text"), 64).as("emb"))
        graft.llm.Dedup.embeddingCosinePairs(emb, "doc_id", "emb",
            threshold = 0.9999)
          .select("id_a", "id_b").orderBy("id_a", "id_b")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, LIST_SORT(STRING_SPLIT(text, ' ')) AS m
             |  FROM documents
             |  UNION ALL
             |  SELECT 1000003, LIST_SORT(STRING_SPLIT(text, ' '))
             |  FROM documents WHERE doc_id = 3
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |FROM d a JOIN d b ON a.m = b.m AND a.doc_id < b.doc_id
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("ta8_tfidf_topterms",  // per-doc top-3 terms by tf-idf (keyword
      // extraction); idf rounds to 6dp DECIMAL so tf*idf is exact and the
      // (score desc, term) ranking is total-ordered in both engines
      (s, dir) => graft.llm.TextAnalysis.tfIdfTopTerms(
          t(s, dir, "documents").filter(col("doc_id") < 200),
          "doc_id", "text", topK = 3)
        .orderBy("doc_id", "term_rank"),
      Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
             |tok AS (
             |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM d
             |), tfd AS (
             |  SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w
             |), dft AS (
             |  SELECT w, COUNT(*) AS df_t
             |  FROM (SELECT DISTINCT doc_id, w FROM tok) GROUP BY w
             |), n AS (SELECT COUNT(*) AS n_docs FROM d),
             |s AS (
             |  SELECT doc_id, w AS term,
             |    tf * CAST(ROUND(LN((n_docs + 1) * 1.0 / (df_t + 1)), 6)
             |              AS DECIMAL(18,6)) AS score
             |  FROM tfd JOIN dft USING (w) CROSS JOIN n
             |), r AS (
             |  SELECT doc_id, term, score, ROW_NUMBER() OVER (
             |    PARTITION BY doc_id ORDER BY score DESC, term) AS term_rank
             |  FROM s
             |)
             |SELECT doc_id, CAST(term_rank AS INT) AS term_rank, term,
             |  CAST(score AS DOUBLE) AS tfidf
             |FROM r WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin)),

    Q("fts1_bm25_search",  // Okapi BM25 ranked retrieval for a 3-term query
      // (k1=1.2, b=0.75): per-term partials round to 6dp DECIMAL before the
      // per-doc sum; per-row double arithmetic is pure IEEE so both engines
      // agree bit-for-bit, and (score desc, id) totally orders the top-20
      (s, dir) => graft.llm.TextAnalysis.bm25Search(
        t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("vector", "query", "stream"), k = 20),
      Some("""WITH d AS (SELECT doc_id, text FROM documents),
             |tok AS (
             |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM d
             |), dl AS (
             |  SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM d
             |), st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
             |q(w) AS (VALUES ('vector'), ('query'), ('stream')),
             |dft AS (
             |  SELECT w, COUNT(DISTINCT doc_id) AS df_t
             |  FROM tok JOIN q USING (w) GROUP BY w
             |), tf AS (
             |  SELECT doc_id, w, COUNT(*) AS tf
             |  FROM tok JOIN q USING (w) GROUP BY doc_id, w
             |), p AS (
             |  SELECT tf.doc_id,
             |    CAST(ROUND(
             |      CAST(CAST(ROUND(LN(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)), 6)
             |                AS DECIMAL(18,6)) AS DOUBLE)
             |      * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl * 1.0 / n_docs)))),
             |      6) AS DECIMAL(18,6)) AS s
             |  FROM tf JOIN dft USING (w) JOIN dl ON tf.doc_id = dl.doc_id
             |  CROSS JOIN st
             |)
             |SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS bm25
             |FROM p GROUP BY doc_id
             |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)),

    Q("fts2_index_search",  // the SAME retrieval as fts1 but served from a
      // persisted inverted index on a graft table: insert corpus, build
      // index, then search reads postings (term filter pushed to the
      // parquet scan) instead of re-tokenizing text. Shares fts1's scorer,
      // so it must reproduce the identical top-20 — the oracle recomputes
      // BM25 from raw text in DuckDB. Half the corpus is inserted AFTER
      // createTextIndex with no refresh, so the covered ∪ on-the-fly union
      // path is exercised, not just the fully-indexed case.
      (s, dir) => {
        val root = java.nio.file.Files.createTempDirectory("graft-fts2").toString
        val vs = graft.api.VastSession(s, root)
        vs.createBucket("b")
        val docs = t(s, dir, "documents").select("doc_id", "text")
          .orderBy("doc_id")
        vs.transaction { tx =>
          val tbl = tx.bucket("b").createSchema("m")
            .createTable("d", docs.schema)
          tbl.insert(docs.filter(col("doc_id") < 250).coalesce(1))
          tbl.createTextIndex("text")
          tbl.insert(docs.filter(col("doc_id") >= 250).coalesce(1))
        }
        vs.transaction { tx =>
          val tbl = tx.bucket("b").schema("m").table("d")
          val hits = tbl.textSearch("text",
            Seq("vector", "query", "stream"), k = 20)
          val ids = tbl.select(Seq("doc_id"), internalRowId = true)
          hits.join(ids, Seq("_row_id"))
            .select(col("doc_id"), col("bm25"))
            .orderBy(col("bm25").desc, col("doc_id").asc)
        }
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents),
             |tok AS (
             |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM d
             |), dl AS (
             |  SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM d
             |), st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
             |q(w) AS (VALUES ('vector'), ('query'), ('stream')),
             |dft AS (
             |  SELECT w, COUNT(DISTINCT doc_id) AS df_t
             |  FROM tok JOIN q USING (w) GROUP BY w
             |), tf AS (
             |  SELECT doc_id, w, COUNT(*) AS tf
             |  FROM tok JOIN q USING (w) GROUP BY doc_id, w
             |), p AS (
             |  SELECT tf.doc_id,
             |    CAST(ROUND(
             |      CAST(CAST(ROUND(LN(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)), 6)
             |                AS DECIMAL(18,6)) AS DOUBLE)
             |      * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl * 1.0 / n_docs)))),
             |      6) AS DECIMAL(18,6)) AS s
             |  FROM tf JOIN dft USING (w) JOIN dl ON tf.doc_id = dl.doc_id
             |  CROSS JOIN st
             |)
             |SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS bm25
             |FROM p GROUP BY doc_id
             |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)),

    Q("fts3_hybrid_rrf",  // hybrid retrieval: BM25 top-50 + exact dense
      // top-50 (query = embedding 0) fused by Reciprocal Rank Fusion
      // (k0=60). Ranks are ints and each doc gets ≤2 contributions, so the
      // fused doubles are bit-identical across engines; the oracle
      // recomputes both rankings (distances in DOUBLE on both sides so the
      // orderings agree exactly) and the same 1/(60+rank) sum
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
          .join(t(s, dir, "embeddings")
            .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
        val qv = t(s, dir, "embeddings").filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        graft.llm.Search.hybridSearch(docs, "doc_id", "text", "embedding",
          terms = Seq("vector", "query", "stream"), queryVec = qv, k = 20)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE doc_id IN (SELECT vec_id FROM embeddings)
             |), -- hybrid corpus = docs carrying BOTH text and an embedding
             |   -- (at some scale factors embeddings is a subset of docs)
             |tok AS (
             |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM d
             |), dl AS (
             |  SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM d
             |), st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
             |q(w) AS (VALUES ('vector'), ('query'), ('stream')),
             |dft AS (
             |  SELECT w, COUNT(DISTINCT doc_id) AS df_t
             |  FROM tok JOIN q USING (w) GROUP BY w
             |), tf AS (
             |  SELECT doc_id, w, COUNT(*) AS tf
             |  FROM tok JOIN q USING (w) GROUP BY doc_id, w
             |), p AS (
             |  SELECT tf.doc_id,
             |    CAST(ROUND(
             |      CAST(CAST(ROUND(LN(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)), 6)
             |                AS DECIMAL(18,6)) AS DOUBLE)
             |      * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl * 1.0 / n_docs)))),
             |      6) AS DECIMAL(18,6)) AS s
             |  FROM tf JOIN dft USING (w) JOIN dl ON tf.doc_id = dl.doc_id
             |  CROSS JOIN st
             |), bm AS (
             |  SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS score FROM p
             |  GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50
             |), bmr AS (
             |  SELECT doc_id AS id, ROW_NUMBER() OVER (
             |    ORDER BY score DESC, doc_id) AS rank FROM bm
             |), qv AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings
             |  WHERE vec_id = 0
             |), dn AS (
             |  SELECT e.vec_id AS id,
             |    LIST_DISTANCE(CAST(e.embedding AS DOUBLE[]), qv.q) AS dist
             |  FROM embeddings e CROSS JOIN qv
             |  WHERE e.vec_id IN (SELECT doc_id FROM documents)
             |  ORDER BY dist, id LIMIT 50
             |), dnr AS (
             |  SELECT id, ROW_NUMBER() OVER (ORDER BY dist, id) AS rank FROM dn
             |), u AS (
             |  SELECT id, 1.0 / (60 + rank) AS c FROM bmr
             |  UNION ALL
             |  SELECT id, 1.0 / (60 + rank) AS c FROM dnr
             |)
             |SELECT id, SUM(c) AS rrf_score FROM u GROUP BY id
             |ORDER BY rrf_score DESC, id LIMIT 20""".stripMargin)),

    Q("ta9_normalize",  // Unicode NFC + control/format-char strip over a
      // generated fixture (the shipped corpus is pure ASCII, which the
      // normalizer must pass through unchanged — doc 7 asserts that);
      // DuckDB applies nfc_normalize + the same RE2-safe pattern
      (s, dir) => {
        import s.implicits._
        val rows = Seq(
          (1L, "cafe\u0301 au lait"),        // e + combining acute
          (2L, "caf\u00e9 au lait"),         // precomposed é
          (3L, "A\u030a ring"),              // A + combining ring
          (4L, "zero\u200bwidth\u200djoin"), // format chars stripped
          (5L, "ctrl\u0001\u0002chars\tkeep"),
          (6L, "\ufeffbom prefix"),
          (7L, "plain ascii stays"))
          .toDF("id", "text")
        val clean = graft.llm.TextAnalysis.normalizeText($"text")
        rows.select($"id", clean.as("clean"), length(clean).as("n_chars"))
          .orderBy("id")
      },
      Some("""WITH v(id, text) AS (VALUES
             |  (1, 'cafe' || chr(769) || ' au lait'),
             |  (2, 'caf' || chr(233) || ' au lait'),
             |  (3, 'A' || chr(778) || ' ring'),
             |  (4, 'zero' || chr(8203) || 'width' || chr(8205) || 'join'),
             |  (5, 'ctrl' || chr(1) || chr(2) || 'chars' || chr(9) || 'keep'),
             |  (6, chr(65279) || 'bom prefix'),
             |  (7, 'plain ascii stays')),
             |c AS (
             |  SELECT id, REGEXP_REPLACE(NFC_NORMALIZE(text),
             |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]|\p{Cf}', '', 'g') AS clean
             |  FROM v
             |)
             |SELECT CAST(id AS BIGINT) AS id, clean,
             |  CAST(LENGTH(clean) AS INT) AS n_chars
             |FROM c ORDER BY id""".stripMargin)),

    Q("dr1_pca",  // distributed PCA over the embedding corpus, self-oracled
      // on the algebra any correct implementation must satisfy: the basis
      // is orthonormal, eigenvalues are variance-descending, the VARIANCE
      // OF THE ACTUAL PROJECTED DATA matches each eigenvalue (ties the
      // distributed projection pass to the driver-side eigensolve), and
      // the k=8 reconstruction error equals the tail eigenvalue mass of
      // the full k=64 decomposition (Parseval) — none of which hold for a
      // wrong covariance, eigensolver, or projection
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val m = graft.llm.Reduction.pcaFit(e, "embedding", dim = 64, k = 8)
        val full = graft.llm.Reduction.pcaFit(e, "embedding", dim = 64, k = 64)
        def dot(a: Array[Double], b: Array[Double]) =
          a.zip(b).map { case (x, y) => x * y }.sum
        val orthoOk = (0 until 8).forall(i => (i until 8).forall { j =>
          val want = if (i == j) 1.0 else 0.0
          math.abs(dot(m.components(i), m.components(j)) - want) < 1e-9
        })
        val eigsDesc = m.explainedVariance.sliding(2)
          .forall(p => p.length < 2 || p(0) >= p(1))
        val mse = graft.llm.Reduction.reconstructionMse(e, "embedding", m)
        val tail = full.explainedVariance.drop(8).sum
        val mseOk = math.abs(mse - tail) <= 1e-2 * math.max(tail, 1e-9)
        val projVarDev = e.select(posexplode(
            graft.llm.Reduction.pcaProject(col("embedding"), m))
            .as(Seq("pos", "y")))
          .groupBy("pos").agg(var_pop(col("y")).as("v"))
          .select(max(abs(col("v") -
            element_at(lit(m.explainedVariance), col("pos") + 1)) /
            greatest(element_at(lit(m.explainedVariance), col("pos") + 1),
              lit(1e-12))).as("dev"))
        e.agg(count(lit(1)).as("n_vecs")).crossJoin(projVarDev)
          .select(col("n_vecs"), lit(orthoOk).as("orthonormal"),
            lit(eigsDesc).as("eigs_descending"),
            (col("dev") < 1e-3).as("proj_var_matches"),
            lit(mseOk).as("mse_matches_tail"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
             |  true AS orthonormal, true AS eigs_descending,
             |  true AS proj_var_matches, true AS mse_matches_tail
             |FROM embeddings""".stripMargin)),

    Q("dd9_semantic_dedup",  // SemDeDup: cluster the embedding space, prune
      // cosine near-dups within clusters, keep min-id representatives.
      // Self-oracled by planted duplicates: an identical copy lands in its
      // twin's cluster (same argmin, same tie-break), similarity 1.0 beats
      // any threshold, and the copy's larger id loses representative
      // selection — so exactly the originals survive
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = e.filter(col("vec_id") < 5)
          .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
        graft.llm.Dedup.semanticDedup(e.union(planted), "vec_id",
            "embedding", nClusters = 16, threshold = 0.999)
          .agg(count(lit(1)).as("n_kept"),
            sum(when(col("vec_id") >= 1000000, 1L).otherwise(0L))
              .as("n_planted_kept"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
             |  CAST(0 AS BIGINT) AS n_planted_kept
             |FROM embeddings""".stripMargin)),

    Q("ss5_ivf_pq",  // IVF-PQ composition (FAISS IVFPQ shape): probe
      // nprobe coarse cells, ADC only within them, exact rerank. Planted
      // containment: an identical twin shares the query's argmin cell
      // (probed first) and its codes minimize the query's own LUT, so it
      // survives cell probing AND the ADC shortlist, reranking to 0
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val q = e.filter(col("vec_id") < 3)
        val planted = q.select((col("vec_id") + 1000000).as("vec_id"),
          col("embedding"))
        val corpus = e.union(planted)
        val (centroids, assigned) = graft.llm.Similarity.ivfIndex(
          corpus, "vec_id", "embedding", nCentroids = 16, refineIters = 1)
        val cb = graft.llm.Quantization.pqTrain(corpus, "vec_id",
          "embedding", dim = 64, m = 16, k = 16, iters = 1)
        val enc = graft.llm.Quantization.pqEncode(corpus, "vec_id",
          "embedding", cb, dim = 64, m = 16)
        graft.llm.Quantization.ivfPqSearch(
            assigned.select("vec_id", "centroid_id"), enc, centroids,
            corpus, q, cb, "vec_id", "embedding", dim = 64, m = 16,
            k = 10, nprobe = 4, shortlist = 50)
          .groupBy("q_id")
          .agg(max(when(col("n_id") === col("q_id") + 1000000, 1).otherwise(0))
            .as("planted_found"))
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, 1 AS planted_found FROM embeddings
             |WHERE vec_id < 3 ORDER BY q_id""".stripMargin)),

    Q("ss4_pq_index",  // the PERSISTED PQ index end-to-end (create → codes
      // at rest → ADC search over code rows): planted twins inserted AFTER
      // createPqIndex exercise the frozen-codebook on-the-fly path; an
      // identical vector's codes are the per-subspace argmins of the
      // query's LUT, so it cannot be cut by the shortlist and reranks to
      // distance 0 — planted containment is the oracle, as in ss3
      (s, dir) => {
        val root = java.nio.file.Files.createTempDirectory("graft-ss4").toString
        val vs = graft.api.VastSession(s, root)
        vs.createBucket("b")
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = e.filter(col("vec_id") < 2)
          .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
        vs.transaction { tx =>
          val tbl = tx.bucket("b").createSchema("m")
            .createTable("e", e.schema)
          tbl.insert(e.coalesce(1))
          tbl.createPqIndex("embedding", dim = 64, m = 16, k = 16)
          tbl.insert(planted.coalesce(1)) // uncovered -> on-the-fly encode
        }
        vs.transaction { tx =>
          val tbl = tx.bucket("b").schema("m").table("e")
          val ids = tbl.select(Seq("vec_id"), internalRowId = true)
          (0L until 2L).map { q =>
            val qv = e.filter(col("vec_id") === q)
              .head().getSeq[Float](1)
            tbl.vectorSearchPq("embedding", qv, k = 10)
              .join(ids, Seq("_row_id"))
              .agg(max(when(col("vec_id") === q + 1000000, 1).otherwise(0))
                .as("planted_found"))
              .select(lit(q).as("q_id"), col("planted_found"))
          }.reduce(_.unionByName(_)).orderBy("q_id")
        }
      },
      Some("""SELECT vec_id AS q_id, 1 AS planted_found FROM embeddings
             |WHERE vec_id < 2 ORDER BY q_id""".stripMargin)),

    Q("bpe1_tokenize",  // real BPE (Sennrich): merges learned from the
      // fixture itself, encode via the native expression; the oracle's
      // token strings are HAND-DERIVED from the algorithm — merge 1 (a,a)
      // by count 6, merge 2 (a,b) by count 3, merge 3 (aa,ab) over (aa,b)
      // by the lexicographic tie-break — so a wrong count, tie-break, or
      // inference order produces different subwords and fails the gate
      (s, dir) => {
        import s.implicits._
        val docs = Seq((1L, "aaab aaab"), (2L, "aab"), (3L, "ab b aab"))
          .toDF("id", "text")
        val merges = graft.llm.Bpe.train(docs, "text", numMerges = 3,
          sampleDocs = 10)
        docs.select($"id",
            array_join(graft.llm.Bpe.encode($"text", merges), "|").as("toks"),
            graft.llm.Bpe.tokenCount($"text", merges).as("n_tokens"))
          .orderBy("id")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'aaab|aaab', 2),
             |  (CAST(2 AS BIGINT), 'aa|b', 2),
             |  (CAST(3 AS BIGINT), 'ab|b|aa|b', 4)) AS t(id, toks, n_tokens)
             |ORDER BY id""".stripMargin)),

    Q("bpe2_corpus_roundtrip",  // BPE over the real corpus, self-oracled on
      // the algorithm's invariants: encoding is lossless (per-word concat
      // reconstructs the text) and 200 learned merges actually compress
      // (fewer subwords than characters corpus-wide) — both hold for any
      // correct BPE regardless of the engine's exact merge table
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val merges = graft.llm.Bpe.train(docs, "text", numMerges = 200,
          sampleDocs = 300)
        docs.select(col("doc_id"),
            graft.llm.Bpe.encode(col("text"), merges).as("toks"),
            regexp_replace(col("text"), " ", "").as("squashed"))
          .agg(count(lit(1)).as("n_docs"),
            // count, not boolean (same sharpening as bpe6): a lossy row
            // shows up as a nonzero count, not a whole-gate hash flip
            sum(when(concat_ws("", col("toks")) === col("squashed"), 0)
              .otherwise(1)).cast("long").as("n_lossy"),
            (sum(size(col("toks"))) < sum(length(col("squashed"))))
              .as("compressed"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(0 AS BIGINT) AS n_lossy, true AS compressed
             |FROM documents""".stripMargin)),

    Q("bpe3_byte_level",  // byte-level BPE (the GPT-2/tiktoken shape:
      // regex pre-tokenization + byte→unicode alphabet + byte fallback),
      // encoded with a PLANTED merge table so the oracle's token strings
      // are hand-derived from the published algorithm: "the theme" splits
      // ["the"," theme"], space maps to Ġ, merges (t,h)<(th,e) rebuild
      // "the" inside both pre-tokens; "don't" exercises the contraction
      // alternates ('t splits off); " 12" the digit branch; "café" the
      // byte fallback (é → 0xC3 0xA9 → "Ã©", rebuilt by the planted
      // (Ã,©) merge); "a  b" the \s+(?!\S) lookahead (first space alone,
      // second glued to "b"). A wrong regex branch, byte table entry, or
      // merge order changes the strings and fails the gate.
      (s, dir) => {
        import s.implicits._
        val docs = Seq((1L, "the theme"), (2L, "don't stop"),
          (3L, "ab 12x café"), (4L, "a  b")).toDF("id", "text")
        val merges: Seq[graft.llm.Bpe.Merge] =
          Seq(("t", "h"), ("th", "e"), ("Ġ", "s"), ("Ã", "©"))
        docs.select($"id",
            array_join(graft.llm.Bpe.encodeByteLevel($"text", merges), "|")
              .as("toks"),
            graft.llm.Bpe.tokenCountByteLevel($"text", merges).as("n_tokens"))
          .orderBy("id")
      },
      Some(("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'the|Ġ|the|m|e', 5),
             |  (CAST(2 AS BIGINT), 'd|o|n|''|t|Ġs|t|o|p', 9),
             |  (CAST(3 AS BIGINT), 'a|b|Ġ|1|2|x|Ġ|c|a|f|Ã©', 11),
             |  (CAST(4 AS BIGINT), 'a|Ġ|Ġ|b', 4)) AS t(id, toks, n_tokens)
             |ORDER BY id""").stripMargin)),

    Q("bpe6_byte_roundtrip",  // byte-level BPE over the REAL corpus,
      // self-oracled on the mode's defining invariants (bpe2's sibling,
      // but STRONGER: byte-level is fully lossless INCLUDING whitespace):
      // (a) merges never change the byte stream — the token concat under
      // the learned table equals the token concat under NO merges (the
      // raw mapped-alphabet text), row by row; (b) 200 learned merges
      // compress corpus-wide. Both hold for any correct byte-level BPE
      // regardless of the engine's exact merge table
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val merges = graft.llm.Bpe.trainByteLevel(docs, "text",
          numMerges = 200, sampleDocs = 300)
        val enc = graft.llm.Bpe.encodeByteLevel(col("text"), merges)
        val base = graft.llm.Bpe.encodeByteLevel(col("text"),
          Seq.empty[graft.llm.Bpe.Merge])
        docs.select(
            concat_ws("", enc).as("_joined"),
            concat_ws("", base).as("_raw"),
            size(enc).as("_n"), size(base).as("_nb"))
          .agg(count(lit(1)).as("n_docs"),
            // counts, not booleans, so a regression localizes to rows
            // instead of flipping a whole-gate hash: n_lossy = docs whose
            // token concat diverges from the raw byte stream, n_worse =
            // docs where merging INCREASED the token count (impossible
            // for a correct merge pass) — both invariantly 0
            sum(when(col("_joined") === col("_raw"), 0).otherwise(1))
              .cast("long").as("n_lossy"),
            sum(when(col("_n") > col("_nb"), 1).otherwise(0))
              .cast("long").as("n_worse"),
            (sum(col("_n")) < sum(col("_nb"))).as("compressed"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(0 AS BIGINT) AS n_lossy, CAST(0 AS BIGINT) AS n_worse,
             |  true AS compressed
             |FROM documents""".stripMargin)),

    Q("bpe4_byte_ids",  // DENSE byte-level vocab ids (GPT-2 id shape:
      // base ids = byte values 0-255, merged symbols take 256+rank in
      // merge order): same planted table and fixtures as bpe3, oracle ids
      // HAND-DERIVED — 'the'=257 (second merge), 'Ġs'=258, 'Ã©'=259,
      // base bytes t=116 h=104 e=101 Ġ=32 (space byte) '=39 etc. A wrong
      // base-id order, rank offset, or first-occurrence-wins rule shifts
      // every id and fails the gate
      (s, dir) => {
        import s.implicits._
        val docs = Seq((1L, "the theme"), (2L, "don't stop"),
          (3L, "ab 12x café"), (4L, "a  b")).toDF("id", "text")
        val merges: Seq[graft.llm.Bpe.Merge] =
          Seq(("t", "h"), ("th", "e"), ("Ġ", "s"), ("Ã", "©"))
        docs.select($"id",
            array_join(transform(
              graft.llm.Bpe.encodeByteLevelIds($"text", merges),
              i => i.cast("string")), ",").as("ids"),
            size(graft.llm.Bpe.encodeByteLevelIds($"text", merges))
              .as("n_tokens"))
          .orderBy("id")
      },
      Some(("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), '257,32,257,109,101', 5),
             |  (CAST(2 AS BIGINT), '100,111,110,39,116,258,116,111,112', 9),
             |  (CAST(3 AS BIGINT), '97,98,32,49,50,120,32,99,97,102,259', 11),
             |  (CAST(4 AS BIGINT), '97,32,32,98', 4)) AS t(id, ids, n_tokens)
             |ORDER BY id""").stripMargin)),

    Q("bpe5_special_tokens",  // tiktoken allowed_special semantics: a
      // LISTED special is atomic wherever it sits (id = vocabSize + slot:
      // 256 + 4 distinct merges → <|endoftext|> = 260, the GPT-2 layout
      // where 50256 = 256 + 50000), an UNLISTED special-looking string is
      // plain text — its bytes regex-split and MERGE like any others
      // ('other' rebuilds 'the' inside: o=111, the=257, r=114). Oracle ids
      // hand-derived; a wrong split order (regex before specials), a
      // missed longest-match, or a special id off-by-one fails the gate
      (s, dir) => {
        import s.implicits._
        val docs = Seq(
          (1L, "the<|endoftext|>don't"),
          (2L, "a<|endoftext|><|endoftext|> b"),
          (3L, "the theme"),
          (4L, "x<|other|>y")).toDF("id", "text")
        val merges: Seq[graft.llm.Bpe.Merge] =
          Seq(("t", "h"), ("th", "e"), ("Ġ", "s"), ("Ã", "©"))
        val specials = Seq("<|endoftext|>")
        docs.select($"id",
            array_join(transform(
              graft.llm.Bpe.encodeByteLevelIds($"text", merges, specials),
              i => i.cast("string")), ",").as("ids"),
            size(graft.llm.Bpe.encodeByteLevelIds($"text", merges, specials))
              .as("n_tokens"))
          .orderBy("id")
      },
      Some(("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), '257,260,100,111,110,39,116', 7),
             |  (CAST(2 AS BIGINT), '97,260,260,32,98', 5),
             |  (CAST(3 AS BIGINT), '257,32,257,109,101', 5),
             |  (CAST(4 AS BIGINT), '120,60,124,111,257,114,124,62,121', 9))
             |  AS t(id, ids, n_tokens)
             |ORDER BY id""").stripMargin)),

    Q("bpe7_ws_ids_roundtrip",  // DENSE whitespace-mode vocab ids + the
      // distributed detokenizer over them: same training fixture as bpe1
      // (merges (a,a),(a,b),(aa,ab) — hand-derived there), alphabet from
      // the fit sample {a,b} → vocab 0=SEP 1=UNK a=2 b=3 aa=4 ab=5
      // aaab=6. Oracle ids and decoded text HAND-DERIVED: doc1 'aaab' is
      // one full-merge token (6), words separated by SEP(0); doc4's 'c'
      // was never in the fit sample → UNK(1), decoding to U+FFFD while
      // the rest of the word survives. A wrong reserved-slot layout,
      // alphabet order, first-occurrence rule, or separator placement
      // shifts ids or breaks the roundtrip and fails the gate
      (s, dir) => {
        import s.implicits._
        val fit = Seq((1L, "aaab aaab"), (2L, "aab"), (3L, "ab b aab"))
          .toDF("id", "text")
        val docs = fit.union(Seq((4L, "ab cab")).toDF("id", "text"))
        val (merges, alphabet) = graft.llm.Bpe.trainWithAlphabet(
          fit, "text", numMerges = 3, sampleDocs = 10)
        val ids = graft.llm.Bpe.encodeWhitespaceIds($"text", merges, alphabet)
        docs.select($"id",
            array_join(transform(ids, i => i.cast("string")), ",").as("ids"),
            graft.llm.Bpe.decodeWhitespaceIdsCol(ids, merges, alphabet)
              .as("decoded"),
            size(ids).as("n_tokens"))
          .orderBy("id")
      },
      Some(("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), '6,0,6', 'aaab aaab', 3),
             |  (CAST(2 AS BIGINT), '4,3', 'aab', 2),
             |  (CAST(3 AS BIGINT), '5,0,3,0,4,3', 'ab b aab', 6),
             |  (CAST(4 AS BIGINT), '5,0,1,5', 'ab �ab', 4))
             |  AS t(id, ids, decoded, n_tokens)
             |ORDER BY id""").stripMargin)),

    Q("bpe8_exact_edges",  // EXACT cross-shard detokenization: the packed
      // stream of 'café'+eos+'naïve'+eos under NO merges (ids = raw byte
      // values) cut at seqLen 3 puts é's two bytes inside one shard but
      // splits ï (0xC3 0xAF = 195,175) across shards s2/s3. Oracle texts
      // HAND-DERIVED from the ownership rule (a char belongs to the shard
      // its FIRST byte is in): s2 completes 'ï' from s3's head bytes →
      // 'naï', s3 defers its leading continuation byte 175 → 've', the
      // eos-only tail shard decodes empty — so the concat is byte-exact
      // where the plain per-row decode would emit U+FFFD at both edges.
      // A wrong ownership rule, continuation-byte count, or neighbor-join
      // key shifts a char between rows and fails the gate
      (s, dir) => {
        import s.implicits._
        val shards = Seq(
          (0L, Seq(99, 97, 102)), (1L, Seq(195, 169, -1)),
          (2L, Seq(110, 97, 195)), (3L, Seq(175, 118, 101)),
          (4L, Seq(-1))).toDF("seq_id", "token_ids")
        graft.llm.Bpe.decodeShardsExact(shards, "seq_id", "token_ids",
            merges = Nil)
          .select($"seq_id", $"text")
          .orderBy("seq_id")
      },
      Some(("""SELECT * FROM (VALUES
             |  (CAST(0 AS BIGINT), 'caf'), (CAST(1 AS BIGINT), 'é'),
             |  (CAST(2 AS BIGINT), 'naï'), (CAST(3 AS BIGINT), 've'),
             |  (CAST(4 AS BIGINT), ''))
             |  AS t(seq_id, text)
             |ORDER BY seq_id""").stripMargin)),

    Q("ss3_ann_pq",  // product-quantized ANN (ADC shortlist + exact
      // rerank), self-oracled by planted-neighbor containment: an identical
      // planted vector's codes are the per-subspace argmins of the query's
      // own LUT, so its ADC distance is the global minimum — it cannot be
      // cut by the shortlist and reranks to distance 0; recall on
      // non-identical vectors is spec-tested (OperatorsSpec)
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val q = e.filter(col("vec_id") < 5)
        val planted = q.select((col("vec_id") + 1000000).as("vec_id"),
          col("embedding"))
        val corpus = e.union(planted)
        val cb = graft.llm.Quantization.pqTrain(corpus, "vec_id", "embedding",
          dim = 64, m = 16, k = 16, iters = 1)
        val enc = graft.llm.Quantization.pqEncode(corpus, "vec_id",
          "embedding", cb, dim = 64, m = 16)
        graft.llm.Quantization.pqSearch(enc, corpus, q, cb,
            "vec_id", "embedding", dim = 64, m = 16, k = 10, shortlist = 50)
          .groupBy("q_id")
          .agg(max(when(col("n_id") === col("q_id") + 1000000, 1).otherwise(0))
            .as("planted_found"))
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, 1 AS planted_found FROM embeddings
             |WHERE vec_id < 5 ORDER BY q_id""".stripMargin)),

    Q("cu4_curate_pipeline",  // the one-call curation pipeline (normalize →
      // quality gate → exact dedup → minhash near-dedup → decontaminate):
      // the SQL-expressible stage counts are cross-checked against DuckDB
      // exactly; the probabilistic near-dedup stage is gated on its
      // invariants — monotone accounting, zero exact dups and zero
      // benchmark contamination among survivors, and bit-identical
      // survivors on a re-run (every stage is hash-deterministic)
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val bench = docs.filter(col("doc_id").between(100, 110)).select("text")
        def run() = graft.llm.Curation.curateCorpus(docs, "doc_id", "text",
          bench, "text", minQuality = 0.3, nearDupThreshold = 0.7)
        val (clean, rep) = run()
        val cleanIds = clean.select("doc_id")
        val monotone = rep.input >= rep.afterQuality &&
          rep.afterQuality >= rep.afterExactDedup &&
          rep.afterExactDedup >= rep.afterNearDedup &&
          rep.afterNearDedup >= rep.afterDecontaminate
        val noExactDups = clean.select(countDistinct(col("text")))
          .head().getLong(0) == rep.afterDecontaminate
        val decontaminated = graft.llm.Curation.decontaminate(clean,
          "doc_id", "text", bench, "text", n = 5).count() ==
          rep.afterDecontaminate
        val (clean2, _) = run()
        val deterministic = cleanIds.exceptAll(clean2.select("doc_id"))
          .count() == 0 && clean2.count() == rep.afterDecontaminate
        Seq((rep.input, rep.afterQuality, rep.afterExactDedup, monotone,
          noExactDups, decontaminated, deterministic))
          .toDF("n_input", "n_after_quality", "n_after_exact", "monotone",
            "no_exact_dups", "decontaminated", "deterministic")
      },
      Some("""WITH q AS (
             |  SELECT doc_id, text,
             |    CAST(CAST(LEAST(LENGTH(text), 500) / 500.0 AS DECIMAL(18,6)) * 0.3
             |      + CAST(1.0 - ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g')))
             |              * 1.0 / GREATEST(LENGTH(text), 1), 6) AS DECIMAL(18,6)) * 0.2
             |      + CAST(ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
             |            w -> w IN ('the','a','of','and','to','in','is','it','for','on')))
             |          * 1.0 / GREATEST(LEN(STRING_SPLIT(text, ' ')), 1), 6) AS DECIMAL(18,6)) * 0.5
             |      AS DOUBLE) AS qs
             |  FROM documents
             |), k AS (SELECT * FROM q WHERE qs >= 0.3),
             |e AS (
             |  SELECT doc_id, ROW_NUMBER() OVER (
             |    PARTITION BY text ORDER BY doc_id) AS rn FROM k
             |)
             |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_input,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM k) AS n_after_quality,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e WHERE rn = 1) AS n_after_exact,
             |  true AS monotone, true AS no_exact_dups,
             |  true AS decontaminated, true AS deterministic""".stripMargin)),

    // ---- CU*: dataset-curation operators over `documents` ----
    Q("cu1_balanced_sample",
      // per-group cap (language balancing): first 20 docs per lang — exact,
      // one windowed pass, DuckDB computes the identical ROW_NUMBER
      (s, dir) => graft.llm.Curation.balancedSample(
          t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "doc_id", perGroup = 20)
        .orderBy("lang", "doc_id"),
      Some("""SELECT doc_id, lang, n_chars FROM (
             |  SELECT doc_id, lang, n_chars,
             |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents) x WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin)),

    Q("cu2_hash_split",  // deterministic train/test split, self-oracled on
      // its contract: re-computing yields identical assignments (no RNG
      // state), every row gets exactly one split, and the test fraction
      // lands near the requested 10%
      (s, dir) => {
        val ids = t(s, dir, "documents").select("doc_id")
        val a = graft.llm.Curation.hashSplit(ids, "doc_id", testPermille = 100)
        val b = graft.llm.Curation.hashSplit(ids, "doc_id", testPermille = 100)
          .withColumnRenamed("split", "split2")
        a.join(b, "doc_id")
          .agg(count(lit(1)).as("n_docs"),
            (sum(when(col("split") === col("split2"), 0).otherwise(1)) === 0)
              .as("deterministic"),
            (sum(when(col("split") === "test", 1).otherwise(0)).cast("double")
              / count(lit(1))).between(0.02, 0.25).as("test_frac_in_bounds"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  true AS deterministic, true AS test_frac_in_bounds
             |FROM documents""".stripMargin)),

    Q("cu3_decontaminate",  // eval-set decontamination: corpus docs sharing
      // any 5-gram with the "benchmark" slice are dropped; DuckDB recomputes
      // the identical shingle set (same split/slice/cap semantics) and takes
      // the NOT-EXISTS complement — exact parity, not containment
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val corpus = docs.filter(col("doc_id") < 500)
        val bench = docs.filter(col("doc_id").between(100, 120)).select("text")
        graft.llm.Curation.decontaminate(corpus, "doc_id", "text",
            bench, "text", n = 5)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, STRING_SPLIT(text, ' ') AS l
             |  FROM documents WHERE doc_id < 500
             |), bench AS (
             |  SELECT STRING_SPLIT(text, ' ') AS l
             |  FROM documents WHERE doc_id BETWEEN 100 AND 120
             |), cg AS (
             |  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
             |    RANGE(1, GREATEST(LEN(l) - 5, 0) + 2),
             |    i -> ARRAY_TO_STRING(l[i:i+4], ' ')))) AS g
             |  FROM corpus
             |), bg AS (
             |  SELECT DISTINCT UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
             |    RANGE(1, GREATEST(LEN(l) - 5, 0) + 2),
             |    i -> ARRAY_TO_STRING(l[i:i+4], ' ')))) AS g
             |  FROM bench
             |)
             |SELECT doc_id FROM corpus
             |WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM cg JOIN bg USING (g))
             |ORDER BY doc_id""".stripMargin)),

    Q("cu7_contamination_report",  // audit companion to decontaminate:
      // one row per (corpus doc, benchmark doc) pair sharing any 5-gram,
      // with the shared-gram count. DuckDB recomputes the same distinct
      // gram sets from strings and counts join matches — value-exact
      // attribution, validating the fused hash path end-to-end
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val bench = docs.filter(col("doc_id").between(100, 120))
        graft.llm.Curation.contaminationReport(docs, "doc_id", "text",
            bench, "doc_id", "text", n = 5)
          .orderBy("doc_id", "bench_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, STRING_SPLIT(text, ' ') AS l FROM documents
             |), bench AS (
             |  SELECT doc_id AS bench_id, STRING_SPLIT(text, ' ') AS l
             |  FROM documents WHERE doc_id BETWEEN 100 AND 120
             |), cg AS (
             |  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
             |    RANGE(1, GREATEST(LEN(l) - 5, 0) + 2),
             |    i -> ARRAY_TO_STRING(l[i:i+4], ' ')))) AS g
             |  FROM corpus
             |), bg AS (
             |  SELECT bench_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
             |    RANGE(1, GREATEST(LEN(l) - 5, 0) + 2),
             |    i -> ARRAY_TO_STRING(l[i:i+4], ' ')))) AS g
             |  FROM bench
             |)
             |SELECT cg.doc_id, bg.bench_id, COUNT(*) AS shared_grams
             |FROM cg JOIN bg USING (g)
             |GROUP BY cg.doc_id, bg.bench_id
             |ORDER BY cg.doc_id, bg.bench_id""".stripMargin)),

    Q("cu5_shard_export",  // training-shard export: deterministic global
      // shuffle (md5 order) dealt round-robin into 8 exactly balanced
      // shards. DuckDB recomputes the SAME order with a plain global
      // row_number; the Spark side uses the bucketed two-phase rank (no
      // single-partition window), so a value-exact match proves the
      // scale-correct rank equals the naive global one
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id")
        graft.llm.Curation.shardForTraining(docs, "doc_id",
            numShards = 8, seed = "r11")
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy("doc_id")
      },
      Some("""WITH k AS (
             |  SELECT doc_id, MD5('r11:' || CAST(doc_id AS VARCHAR)) AS sk
             |  FROM documents
             |), r AS (
             |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sk, doc_id) - 1 AS g
             |  FROM k
             |)
             |SELECT doc_id, CAST(g % 8 AS INT) AS shard,
             |       CAST(g // 8 AS BIGINT) AS pos
             |FROM r ORDER BY doc_id""".stripMargin)),

    Q("cu8_token_shards",  // token-budget-balanced sharding: weight
      // prefix-sums on the md5 order (bucketed two-phase, no global
      // window), shard = (prefixBefore·n) div total in BIGINT — DuckDB
      // recomputes the identical assignment with a plain global window sum
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "n_chars")
        graft.llm.Curation.shardByTokenBudget(docs, "doc_id", "n_chars",
            numShards = 8, seed = "tb")
          .select("doc_id", "shard").orderBy("doc_id")
      },
      Some("""WITH k AS (
             |  SELECT doc_id, n_chars AS w,
             |         MD5('tb:' || CAST(doc_id AS VARCHAR)) AS sk
             |  FROM documents
             |), c AS (
             |  SELECT doc_id, COALESCE(SUM(w) OVER (ORDER BY sk, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
             |    GREATEST(SUM(w) OVER (), 1) AS tot
             |  FROM k
             |)
             |SELECT doc_id, CAST(LEAST(7, (cb * 8) // tot) AS INT) AS shard
             |FROM c ORDER BY doc_id""".stripMargin)),

    Q("cu6_domain_mix",  // temperature-based domain mixing (integerized
      // α=0.5): per-source quota = (target · floor(sqrt(n_s))) div Σw in
      // pure BIGINT arithmetic, selection = smallest md5 keys per source —
      // DuckDB reproduces quotas and membership bit-for-bit, no float
      // summation anywhere
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "source")
        val target = docs.count() / 2
        graft.llm.Curation.domainMix(docs, "doc_id", "source",
            targetRows = target, seed = "mix")
          .select("doc_id", "source").orderBy("doc_id")
      },
      Some("""WITH n AS (
             |  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
             |), w AS (
             |  SELECT source, n_s, CAST(FLOOR(SQRT(n_s)) AS BIGINT) AS w_s FROM n
             |), tw AS (SELECT SUM(w_s) AS sw FROM w),
             |tgt AS (SELECT COUNT(*) // 2 AS t FROM documents),
             |q AS (
             |  SELECT source, LEAST(n_s, CAST((t * w_s) // sw AS BIGINT)) AS quota
             |  FROM w, tw, tgt
             |), r AS (
             |  SELECT doc_id, source,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY MD5('mix:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rk
             |  FROM documents
             |)
             |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
             |WHERE rk < quota ORDER BY doc_id""".stripMargin)),

    Q("cu9_domain_mix_tokens",  // token-budget domain mixing: per-domain
      // TOKEN quota (BIGINT-exact, integerized α=0.5 over token counts),
      // keep docs in md5 order while the domain's token prefix-sum stays
      // under quota — DuckDB reproduces quota and membership bit-for-bit
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "source", "n_chars")
        val target = docs.agg(sum(col("n_chars")).cast("long"))
          .head().getLong(0) / 2
        graft.llm.Curation.domainMixTokens(docs, "doc_id", "source",
            "n_chars", targetTokens = target, seed = "mt")
          .select("doc_id", "source").orderBy("doc_id")
      },
      Some("""WITH n AS (
             |  SELECT source, SUM(n_chars) AS n_s FROM documents GROUP BY source
             |), w AS (
             |  SELECT source, CAST(FLOOR(SQRT(n_s)) AS BIGINT) AS w_s FROM n
             |), tw AS (SELECT SUM(w_s) AS sw FROM w),
             |tgt AS (SELECT SUM(n_chars) // 2 AS t FROM documents),
             |q AS (
             |  SELECT source, CAST((t * w_s) // sw AS BIGINT) AS quota
             |  FROM w, tw, tgt
             |), r AS (
             |  SELECT doc_id, source,
             |    COALESCE(SUM(n_chars) OVER (PARTITION BY source
             |      ORDER BY MD5('mt:' || CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
             |  FROM documents
             |)
             |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
             |WHERE cb < quota ORDER BY doc_id""".stripMargin)),

    Q("cu10_epoch_mix",  // EPOCH-AWARE domain mixing (the data-recipe
      // "small domain × N epochs" move): target = 2× the corpus tokens
      // with maxEpochs=3, so every domain must repeat — full-corpus
      // copies at epochs 0..f-1 plus an md5-ordered partial epoch under
      // the BIGINT remainder quota. DuckDB recomputes quotas, epoch
      // counts, and partial-epoch membership bit-for-bit
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "source", "n_chars")
        val target = docs.agg(sum(col("n_chars")).cast("long"))
          .head().getLong(0) * 2
        graft.llm.Curation.domainMixEpochs(docs, "doc_id", "source",
            "n_chars", targetTokens = target, maxEpochs = 3, seed = "em")
          .select(col("doc_id"), col("source"), col("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some("""WITH n AS (
             |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_s
             |  FROM documents GROUP BY source
             |), w AS (
             |  SELECT source, n_s, CAST(FLOOR(SQRT(n_s)) AS BIGINT) AS w_s
             |  FROM n WHERE n_s > 0
             |), tw AS (SELECT SUM(w_s) AS sw FROM w),
             |tgt AS (SELECT CAST(SUM(n_chars) * 2 AS BIGINT) AS t FROM documents),
             |q AS (
             |  SELECT source, n_s,
             |    LEAST(CAST((t * w_s) // sw AS BIGINT), n_s * 3) AS quota
             |  FROM w, tw, tgt
             |), q2 AS (
             |  SELECT source, quota // n_s AS f,
             |         quota - (quota // n_s) * n_s AS rem
             |  FROM q
             |), r AS (
             |  SELECT doc_id, source,
             |    COALESCE(SUM(n_chars) OVER (PARTITION BY source
             |      ORDER BY MD5('em:' || CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
             |  FROM documents
             |), fe AS (
             |  SELECT r.doc_id, r.source, UNNEST(RANGE(0, f)) AS epoch
             |  FROM r JOIN q2 USING (source) WHERE f > 0
             |), pe AS (
             |  SELECT r.doc_id, r.source, f AS epoch
             |  FROM r JOIN q2 USING (source) WHERE cb < rem
             |)
             |SELECT doc_id, source, CAST(epoch AS INT) AS epoch FROM fe
             |UNION ALL
             |SELECT doc_id, source, CAST(epoch AS INT) AS epoch FROM pe
             |ORDER BY doc_id, epoch""".stripMargin)),

    Q("cu11_url_filter",  // URL-domain blocklist gate (RefinedWeb/UT1
      // mechanism): synthesized URLs with userinfo/port/mixed case; a row
      // drops iff its HOST equals or sits under a blocked domain (label-
      // boundary suffix). DuckDB rebuilds host extraction (same RE2
      // pattern), the suffix chain, and the anti-join value-exactly.
      (s, dir) => {
        import s.implicits._
        val hosts = array(lit("ads.example.com"), lit("Sub.Tracker.NET"),
          lit("good.org"), lit("shop.example.co.uk"), lit("news.site.io"))
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://user:p@"),
            element_at(hosts, (col("doc_id") % 5 + 1).cast("int")),
            lit(":8080/p/"), col("doc_id")).as("url"))
        val bl = Seq("example.com", "tracker.net").toDF("domain")
        graft.llm.Curation.urlBlocklistFilter(docs, "doc_id", "url", bl)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, 'https://user:p@' ||
             |    CASE doc_id % 5 WHEN 0 THEN 'ads.example.com'
             |      WHEN 1 THEN 'Sub.Tracker.NET' WHEN 2 THEN 'good.org'
             |      WHEN 3 THEN 'shop.example.co.uk'
             |      ELSE 'news.site.io' END || ':8080/p/' || doc_id AS url
             |  FROM documents
             |), h AS (
             |  SELECT doc_id, url,
             |    REGEXP_REPLACE(LOWER(REGEXP_EXTRACT(url,
             |      '^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]*)',
             |      1)), '\.$', '') AS host
             |  FROM d
             |), sfx AS (
             |  SELECT doc_id,
             |    UNNEST(LIST_TRANSFORM(
             |      RANGE(1, LEN(STRING_SPLIT(host, '.')) + 1),
             |      i -> ARRAY_TO_STRING(STRING_SPLIT(host, '.')[i:], '.')))
             |      AS s
             |  FROM h
             |)
             |SELECT doc_id, url FROM d
             |WHERE doc_id NOT IN (SELECT doc_id FROM sfx
             |  WHERE s IN ('example.com', 'tracker.net'))
             |ORDER BY doc_id""".stripMargin)),

    Q("cu12_badword_filter",  // term blocklist gate (C4 bad-words
      // mechanism, list caller-supplied): a planted case-variant token —
      // NEWLINE-adjacent on doc_id % 8 == 0, the line-boundary case a
      // single-space split would miss — drops its documents under
      // case-folded whitespace-token match; DuckDB recomputes the
      // survivor set with the same \s+ split
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 8 === 0, concat(col("text"), lit("\nBadWord1\nmore")))
            .when(col("doc_id") % 4 === 0, concat(col("text"), lit(" BadWord1")))
            .otherwise(col("text")).as("text"))
        val terms = Seq("badword1", "badword2").toDF("term")
        graft.llm.Curation.termBlocklistFilter(docs, "doc_id", "text", terms)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, CASE
             |    WHEN doc_id % 8 = 0 THEN text || CHR(10) || 'BadWord1' ||
             |      CHR(10) || 'more'
             |    WHEN doc_id % 4 = 0 THEN text || ' BadWord1'
             |    ELSE text END AS text
             |  FROM documents
             |)
             |SELECT doc_id FROM d
             |WHERE LEN(LIST_INTERSECT(
             |  REGEXP_SPLIT_TO_ARRAY(LOWER(text), '\s+'),
             |  ['badword1', 'badword2'])) = 0
             |ORDER BY doc_id""".stripMargin)),

    Q("cu13_sample_per_domain",  // stratified per-domain uniform sample
      // (the bounded eyeball export for the dataset-report path): ≤ 5 docs
      // from EVERY source, racing on the exact integer md5 hash of
      // `seed|id` — the same dyadic-u construction as se4 with no float in
      // the key at all — so DuckDB redraws every stratum rank-for-rank
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "source")
        graft.llm.Selection.samplePerDomain(docs, "doc_id", "source",
            k = 5, seed = 7L, hash = md5Hash60)
          .select(col("doc_id"), col("source"), col("sample_rank"))
          .orderBy("source", "sample_rank")
      },
      Some("""WITH r AS (
             |  SELECT doc_id, source,
             |    (('0x'||substr(md5('7|' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT
             |      % 4503599627370496) AS race
             |  FROM documents
             |), rk AS (
             |  SELECT doc_id, source,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |                       ORDER BY race, doc_id) - 1 AS r
             |  FROM r)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
             |  CAST(r AS BIGINT) AS sample_rank
             |FROM rk WHERE r < 5 ORDER BY source, sample_rank""".stripMargin)),

    Q("cu14_regex_filter",  // regex/phrase blocklist gate (the substring
      // sibling of cu12's exact-token gate — the "regex gate upstream"
      // LIMITS.md pointed to): multi-word phrase across whitespace
      // variations (\s+), case-insensitive via confined (?i), and a
      // substring hit inside a longer token; DuckDB recomputes survivors
      // with the same two patterns per-pattern (dialect-safe: both
      // engines confine inline flags to their group)
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 9 === 0,
            concat(col("text"), lit("\nFree   MONEY inside")))
            .when(col("doc_id") % 6 === 0,
              concat(col("text"), lit(" unsubscribenow!")))
            .otherwise(col("text")).as("text"))
        graft.llm.Curation.regexBlocklistFilter(docs, "text",
            Seq("(?i)free\\s+money", "unsubscribe"))
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, CASE
             |    WHEN doc_id % 9 = 0 THEN text || CHR(10) ||
             |      'Free   MONEY inside'
             |    WHEN doc_id % 6 = 0 THEN text || ' unsubscribenow!'
             |    ELSE text END AS text
             |  FROM documents
             |)
             |SELECT doc_id FROM d
             |WHERE NOT regexp_matches(text, '(?i)free\s+money')
             |  AND NOT regexp_matches(text, 'unsubscribe')
             |ORDER BY doc_id""".stripMargin)),

    Q("qc1_lr_quality",  // distributed quality classifier (fasttext
      // recipe: hashed bag-of-words → linear model), planted-teacher gate:
      // label every document by a KNOWN fixed hyperplane u in the hashed
      // feature space, then require the distributed Newton/IRLS fit to
      // (a) be BIT-IDENTICAL after an adversarial repartition (Fixed128
      // exact sums — a plain double reduction fails this), (b) reduce the
      // regularized loss from its iter-1 value, and (c) recover ≥ 95% of
      // the teacher's labels — guaranteed achievable because the classes
      // are linearly separable in exactly the space being fit.
      // DUAL-ENGINE PART: features are md5-bucket signed integer counts,
      // so the oracle recomputes every document's teacher label y
      // value-exactly (the whole tokenize→hash→bucket→dot pipeline runs
      // independently in DuckDB). The fit invariants themselves stay
      // Spark-side booleans — a Newton fit is not SQL-computable — which
      // is the documented residual trust (see qc3 for the value-exact
      // scoring-path check).
      (s, dir) => {
        val dim = 32
        val u = Array.tabulate(dim)(i => (((i + 1) * 37) % 19 - 9).toLong)
        // the FIT runs on x/64 (a power-of-two scale is exact in doubles
        // and sign-preserving, so the teacher label from the UNSCALED
        // integer dot is unchanged): raw counts would sit within
        // Fixed128's 2^23 contribution bound only until a pathological
        // mega-document concentrates ~3k tokens in one bucket — the
        // scaling buys 4096x headroom without touching the oracle's
        // token-level y recomputation. l2 scales by 1/64² in step (ridge
        // is NOT scale-invariant: optimal weights grow 64x, so the same
        // l2 would penalize 4096x harder and collapse recovery)
        val docs = t(s, dir, "documents").select(col("doc_id"),
          md5BucketFeatures(col("text"), dim).as("x"))
          .withColumn("y", (intDot(col("x"), u) > 0).cast("double"))
          .withColumn("x", transform(col("x"), v => v / 64.0d))
        def fit(d: org.apache.spark.sql.DataFrame) =
          graft.llm.Classifier.lrFitNewton(d, "y", "x", dim,
            iters = 6, l2 = 1e-4 / 4096)
        val m = fit(docs)
        val m2 = fit(docs.repartition(7))
        val deterministic = m.weights.sameElements(m2.weights) &&
          m.bias == m2.bias
        val lossDecreased = m.lossHistory.last < m.lossHistory.head
        val agreement = graft.llm.Classifier.accuracy(docs, "y", "x", m)
        docs.select(col("doc_id"), col("y"),
            lit(deterministic).as("fit_deterministic"),
            lit(lossDecreased).as("loss_decreased"),
            lit(agreement >= 0.95).as("recovers_teacher"))
          .orderBy("doc_id")
      },
      Some({
        val dim = 32
        val u = Array.tabulate(dim)(i => (((i + 1) * 37) % 19 - 9).toLong)
        s"""WITH tok AS ($duckTokenHashes)
           |SELECT doc_id,
           |  CAST(CASE WHEN ${duckDot(u, dim)} > 0 THEN 1 ELSE 0 END
           |       AS DOUBLE) AS y,
           |  true AS fit_deterministic, true AS loss_decreased,
           |  true AS recovers_teacher
           |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin
      })),

    Q("qc3_lr_score_parity",  // the SHIPPED scoring path (lrScore /
      // lrPredict — the map-side sigmoid(w·x+b) expression used by batch
      // re-scoring, CALL classifier_score, and the streaming scoreWith
      // sink) under a FIXED integer-weight model, dual-engine value-exact:
      // DuckDB independently recomputes each document's logit (exact — all
      // arithmetic stays in the integer-exact double range), its sigmoid
      // score rounded to 6 dp, and the hard prediction. This is the
      // value-exact complement to qc1's self-certified fit invariants:
      // together they pin fit determinism AND scoring semantics.
      (s, dir) => {
        val dim = 32
        val wFix = Array.tabulate(dim)(i => ((i * 7) % 13 - 6).toLong)
        val m = graft.llm.Classifier.LrModel(
          wFix.map(_.toDouble), -2.0, Array.empty)
        val docs = t(s, dir, "documents").select(col("doc_id"),
          md5BucketFeatures(col("text"), dim).as("x"))
        docs.select(col("doc_id"),
            intDot(col("x"), wFix, bias = -2.0).as("logit"),
            round(graft.llm.Classifier.lrScore(col("x"), m), 6).as("score6"),
            graft.llm.Classifier.lrPredict(col("x"), m).as("pred"))
          .orderBy("doc_id")
      },
      Some({
        val dim = 32
        val wFix = Array.tabulate(dim)(i => ((i * 7) % 13 - 6).toLong)
        s"""WITH tok AS ($duckTokenHashes),
           |  z AS (SELECT doc_id,
           |          CAST(${duckDot(wFix, dim)} AS DOUBLE) - 2.0 AS logit
           |        FROM tok GROUP BY doc_id)
           |SELECT doc_id, logit,
           |  ROUND(1.0 / (1.0 + EXP(-logit)), 6) AS score6,
           |  CAST(CASE WHEN 1.0 / (1.0 + EXP(-logit)) >= 0.5
           |       THEN 1 ELSE 0 END AS INT) AS pred
           |FROM z ORDER BY doc_id""".stripMargin
      })),

    Q("tp1_token_pack",  // tensor-ready sequence packing (concat-and-
      // chunk with EOS), dual-engine VALUE-EXACT: token ids are the
      // md5-prefix hash both engines compute identically, and DuckDB
      // independently rebuilds the entire packing — explode every doc's
      // tokens + EOS sentinel, global stream index via the naive global
      // window (the oracle AFFORDS the single-partition verifier the
      // operator itself must avoid — that asymmetry is the point), chunk
      // into ceil(stream/L) sequences — and value-matches every
      // sequence's full token stream. Subsumes the former self-oracled
      // invariants (count, lengths, order-exact roundtrip); the one
      // residual Spark-side boolean is layout determinism under an
      // adversarial repartition, which no single-engine recomputation can
      // witness. The gate output is deliberately SCALAR — the comma-joined
      // token stream plus its length — because the driver's checker sorts
      // result rows cell-wise and cannot hash/sort array cells (r12's one
      // red row); joining to CSV loses no value-exactness per sequence.
      (s, dir) => {
        val L = 256
        val docs = t(s, dir, "documents").select(col("doc_id"),
          transform(split(col("text"), " "), w => md5Hash60(w)).as("ids"))
        def pack(d: org.apache.spark.sql.DataFrame) =
          graft.llm.Curation.packTokenSequences(d, "doc_id", "ids", L, -1L)
        val packed = pack(docs).localCheckpoint(true)
        val packed2 = pack(docs.repartition(7))
        val assignDiff = packed.select("seq_id", "token_ids")
          .exceptAll(packed2.select("seq_id", "token_ids")).count()
        packed.select(col("seq_id"),
            array_join(transform(col("token_ids"),
              x => x.cast("string")), ",").as("token_csv"),
            size(col("token_ids")).as("n_tokens"),
            lit(assignDiff == 0).as("layout_deterministic"))
          .orderBy("seq_id")
      },
      Some("""WITH n AS (
             |  SELECT doc_id, text, LEN(STRING_SPLIT(text, ' ')) AS nt
             |  FROM documents
             |), tok AS (
             |  SELECT doc_id,
             |    UNNEST(RANGE(1, nt + 1)) AS pos,
             |    UNNEST(STRING_SPLIT(text, ' ')) AS w
             |  FROM n
             |), ids AS (
             |  SELECT doc_id, pos,
             |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS id
             |  FROM tok
             |  UNION ALL
             |  SELECT doc_id, nt + 1 AS pos, -1 AS id FROM n
             |), g AS (
             |  SELECT ROW_NUMBER() OVER (ORDER BY doc_id, pos) - 1 AS gidx,
             |         id
             |  FROM ids
             |)
             |SELECT (gidx // 256) AS seq_id,
             |  ARRAY_TO_STRING(LIST(id ORDER BY gidx), ',') AS token_csv,
             |  CAST(COUNT(id) AS INT) AS n_tokens,
             |  true AS layout_deterministic
             |FROM g GROUP BY 1 ORDER BY seq_id""".stripMargin)),

    Q("ta13_corpus_report",  // dataset-card summary: one integer-exact
      // aggregate pass (doc/token/char totals, exact-dup cardinality,
      // token-length envelope) — the release numbers of a corpus
      (s, dir) => graft.llm.TextAnalysis.corpusReport(
        t(s, dir, "documents"), "text"),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens,
             |  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
             |  CAST(COUNT(DISTINCT MD5(text)) AS BIGINT) AS distinct_docs,
             |  CAST(MAX(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS max_doc_tokens,
             |  CAST(MIN(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS min_doc_tokens
             |FROM documents""".stripMargin)),

    Q("ta14_corpus_report_by_source",  // per-source dataset-card rows
      // (the breakdown domainMix consumes): counts, token share of the
      // corpus, token-length envelope, and EXACT quality-score quartiles
      // (percentile over the 6-dp-quantized score — bounded domain, so
      // per-group state is bounded at any corpus size). Value-exact
      // DuckDB oracle recomputes every cell including the quartiles
      // (QUANTILE_CONT — same linear interpolation as Spark percentile).
      (s, dir) => graft.llm.TextAnalysis.corpusReportBySource(
          t(s, dir, "documents"), "source", "text")
        .orderBy("source"),
      Some({
        // ta2's proven quality-score spelling, quantized to 6 dp
        val q = """ROUND(CAST(CAST(LEAST(LENGTH(text), 500) / 500.0 AS DECIMAL(18,6)) * 0.3
                  |    + CAST(1.0 - ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g')))
                  |            * 1.0 / GREATEST(LENGTH(text), 1), 6) AS DECIMAL(18,6)) * 0.2
                  |    + CAST(ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                  |          w -> w IN ('the','a','of','and','to','in','is','it','for','on')))
                  |        * 1.0 / GREATEST(LEN(STRING_SPLIT(text, ' ')), 1), 6) AS DECIMAL(18,6)) * 0.5
                  |    AS DOUBLE), 6)""".stripMargin
        s"""WITH d AS (
           |  SELECT source, text,
           |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS nt,
           |    CAST(ROUND(($q) * 1000000) AS BIGINT) AS qi
           |  FROM documents
           |), per AS (
           |  SELECT source,
           |    CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(nt) AS BIGINT) AS total_tokens,
           |    CAST(COUNT(DISTINCT MD5(text)) AS BIGINT) AS distinct_docs,
           |    CAST(MAX(nt) AS BIGINT) AS max_doc_tokens,
           |    CAST(MIN(nt) AS BIGINT) AS min_doc_tokens,
           |    ROUND(QUANTILE_CONT(qi, 0.25) / 1000000.0, 6) AS q25_quality,
           |    ROUND(QUANTILE_CONT(qi, 0.50) / 1000000.0, 6) AS q50_quality,
           |    ROUND(QUANTILE_CONT(qi, 0.75) / 1000000.0, 6) AS q75_quality
           |  FROM d GROUP BY source
           |)
           |SELECT source, n_docs, total_tokens,
           |  ROUND(CAST(total_tokens AS DOUBLE)
           |        / SUM(total_tokens) OVER (), 6) AS token_share,
           |  distinct_docs, max_doc_tokens, min_doc_tokens,
           |  q25_quality, q50_quality, q75_quality
           |FROM per ORDER BY source""".stripMargin
      })),

    Q("ta15_gopher_rules",  // Gopher rule-based quality flags (Rae et
      // al. 2021 §A1.1): per-document named booleans for each published
      // rule plus the conjunction, all map-side integer/integer ratios —
      // DuckDB recomputes every rule from the raw text and must agree
      // flag-for-flag
      (s, dir) => {
        val g = graft.llm.TextAnalysis.gopherRules(col("text"))
        t(s, dir, "documents")
          .withColumn("g", g)
          .select(col("doc_id"), col("g.*"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text,
             |    STRING_SPLIT(text, ' ') AS toks,
             |    STRING_SPLIT(text, chr(10)) AS lns
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, LEN(toks) AS nt,
             |    LIST_SUM(LIST_TRANSFORM(toks, t -> LEN(t)))::DOUBLE
             |      / LEN(toks) AS mean_len,
             |    (LEN(text) - LEN(REPLACE(text, '#', '')))::DOUBLE
             |      / LEN(toks) AS hash_ratio,
             |    ((LEN(text) - LEN(REPLACE(text, '...', ''))) / 3
             |     + (LEN(text) - LEN(REPLACE(text, '…', ''))))::DOUBLE
             |      / LEN(toks) AS ell_sym_ratio,
             |    LEN(LIST_FILTER(lns, l -> starts_with(LTRIM(l), '-')
             |      OR starts_with(LTRIM(l), '*')
             |      OR starts_with(LTRIM(l), '•')))::DOUBLE
             |      / LEN(lns) AS bullet_ratio,
             |    LEN(LIST_FILTER(lns, l -> ends_with(RTRIM(l), '...')
             |      OR ends_with(RTRIM(l), '…')))::DOUBLE
             |      / LEN(lns) AS ell_ratio,
             |    LEN(LIST_FILTER(toks,
             |      t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
             |      / LEN(toks) AS alpha_ratio,
             |    LEN(LIST_INTERSECT(
             |      LIST_DISTINCT(LIST_TRANSFORM(toks, t -> LOWER(t))),
             |      ['the','be','to','of','and','that','have','with']))
             |      AS stop_hits
             |  FROM d
             |), r AS (
             |  SELECT doc_id,
             |    (nt BETWEEN 50 AND 100000) AS word_count_ok,
             |    (mean_len >= 3.0 AND mean_len <= 10.0) AS mean_word_len_ok,
             |    (hash_ratio <= 0.1 AND ell_sym_ratio <= 0.1)
             |      AS symbol_ratio_ok,
             |    (bullet_ratio <= 0.9) AS bullet_lines_ok,
             |    (ell_ratio <= 0.3) AS ellipsis_lines_ok,
             |    (alpha_ratio >= 0.8) AS alpha_word_ok,
             |    (stop_hits >= 2) AS has_stopwords
             |  FROM m)
             |SELECT doc_id, word_count_ok, mean_word_len_ok,
             |  symbol_ratio_ok, bullet_lines_ok, ellipsis_lines_ok,
             |  alpha_word_ok, has_stopwords,
             |  (word_count_ok AND mean_word_len_ok AND symbol_ratio_ok
             |   AND bullet_lines_ok AND ellipsis_lines_ok
             |   AND alpha_word_ok AND has_stopwords) AS passes
             |FROM r ORDER BY doc_id""".stripMargin)),

    Q("ta16_c4_clean",  // C4 corpus cleaning (Raffel et al. 2020 §2.2):
      // line structure is PLANTED deterministically from each document's
      // tokens (kept sentence-like lines, a too-short line, a javascript
      // line; every 10th doc gets a brace line, every 17th a lorem-ipsum
      // line) and DuckDB rebuilds the identical pages, applies the same
      // rules, and must match surviving doc set and cleaned text exactly
      (s, dir) => {
        val toks = split(col("text"), " ")
        val built = concat_ws("\n",
          concat(concat_ws(" ", slice(toks, 1, 5)), lit(".")),
          concat_ws(" ", slice(toks, 6, 2)),
          lit("please enable javascript to view."),
          concat(concat_ws(" ", slice(toks, 8, 6)), lit("?")),
          concat_ws(" ", slice(toks, 14, 4)))
        val planted = when(col("doc_id") % 10 === 0,
            concat(built, lit("\nbad { brace line.")))
          .when(col("doc_id") % 17 === 0,
            concat(built, lit("\nthis has lorem ipsum inside.")))
          .otherwise(built)
        graft.llm.Curation.c4Filter(
            t(s, dir, "documents").select(col("doc_id"),
              planted.as("text")),
            minLines = 2)
          .select(col("doc_id"), col("text").as("text_clean"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents
             |), built AS (
             |  SELECT doc_id, ARRAY_TO_STRING(LIST_VALUE(
             |      ARRAY_TO_STRING(tk[1:5], ' ') || '.',
             |      ARRAY_TO_STRING(tk[6:7], ' '),
             |      'please enable javascript to view.',
             |      ARRAY_TO_STRING(tk[8:13], ' ') || '?',
             |      ARRAY_TO_STRING(tk[14:17], ' ')), chr(10)) AS t0
             |  FROM d
             |), planted AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 0
             |           THEN t0 || chr(10) || 'bad { brace line.'
             |         WHEN doc_id % 17 = 0
             |           THEN t0 || chr(10) || 'this has lorem ipsum inside.'
             |         ELSE t0 END AS t
             |  FROM built
             |), cleaned AS (
             |  SELECT doc_id, t,
             |    LIST_FILTER(STRING_SPLIT(t, chr(10)), l ->
             |      (ends_with(RTRIM(l), '.') OR ends_with(RTRIM(l), '!')
             |       OR ends_with(RTRIM(l), '?') OR ends_with(RTRIM(l), '"'))
             |      AND LEN(STRING_SPLIT(l, ' ')) >= 3
             |      AND NOT contains(LOWER(l), 'javascript')) AS keep
             |  FROM planted)
             |SELECT doc_id, ARRAY_TO_STRING(keep, chr(10)) AS text_clean
             |FROM cleaned
             |WHERE NOT contains(LOWER(t), 'lorem ipsum')
             |  AND NOT contains(t, '{') AND LEN(keep) >= 2
             |ORDER BY doc_id""".stripMargin)),

    Q("ta17_gopher_repetition",  // Gopher repetition-removal flags (Rae
      // et al. 2021 §A1.1 second half): duplicate-line fractions, top
      // 2/3/4-gram char masses, duplicated 5..10-gram char coverages —
      // line structure planted (a banner line repeated 2×, 3× on every
      // 5th doc); DuckDB recomputes EVERY counter (line groups, gram
      // count/length maxima with the same tie-break, position-marked
      // duplicate coverage) and must agree flag-for-flag
      (s, dir) => {
        val toks = split(col("text"), " ")
        val base = concat_ws("\n", lit("repeated banner line"),
          concat_ws(" ", slice(toks, 1, 40)),
          lit("repeated banner line"),
          concat_ws(" ", slice(toks, 41, 60)))
        val planted = when(col("doc_id") % 5 === 0,
          concat(base, lit("\nrepeated banner line"))).otherwise(base)
        t(s, dir, "documents").select(col("doc_id"), planted.as("text"))
          .withColumn("g",
            graft.llm.TextAnalysis.gopherRepetitionRules(col("text")))
          .select(col("doc_id"), col("g.*"))
          .orderBy("doc_id")
      },
      Some {
        // per-n CTE blocks are generated: same window/count/tie-break
        // formulas for every n, only the threshold differs
        def topCte(n: Int) =
          s""", g$n AS (
             |  SELECT doc_id, UNNEST(LIST_TRANSFORM(
             |    RANGE(1, LEN(tk) - $n + 2),
             |    i -> ARRAY_TO_STRING(tk[i:i+${n - 1}], ' '))) AS gram
             |  FROM d WHERE LEN(tk) >= $n
             |), gc$n AS (
             |  SELECT doc_id, gram, COUNT(*) AS c,
             |    CAST(LEN(gram) - ${n - 1} AS BIGINT) AS glen
             |  FROM g$n GROUP BY doc_id, gram
             |), mx$n AS (
             |  SELECT doc_id, MAX(c) AS bc FROM gc$n GROUP BY doc_id
             |), top$n AS (
             |  SELECT g.doc_id, MAX(g.c * g.glen) AS mass
             |  FROM gc$n g JOIN mx$n m ON g.doc_id = m.doc_id AND g.c = m.bc
             |  GROUP BY g.doc_id
             |)""".stripMargin
        def dupCte(n: Int) =
          s""", gp$n AS (
             |  SELECT doc_id, i,
             |    ARRAY_TO_STRING(tk[i:i+${n - 1}], ' ') AS gram
             |  FROM (SELECT doc_id, tk, UNNEST(RANGE(1, LEN(tk) - $n + 2)) AS i
             |        FROM d WHERE LEN(tk) >= $n)
             |), dg$n AS (
             |  SELECT doc_id, gram FROM gp$n
             |  GROUP BY doc_id, gram HAVING COUNT(*) >= 2
             |), cov$n AS (
             |  SELECT DISTINCT doc_id, q FROM (
             |    SELECT g.doc_id AS doc_id, UNNEST(RANGE(g.i, g.i + $n)) AS q
             |    FROM gp$n g JOIN dg$n x
             |      ON g.doc_id = x.doc_id AND g.gram = x.gram)
             |), dc$n AS (
             |  SELECT c.doc_id,
             |    SUM(CAST(LEN(d.tk[CAST(c.q AS INT)]) AS BIGINT)) AS chars
             |  FROM cov$n c JOIN d ON c.doc_id = d.doc_id
             |  GROUP BY c.doc_id
             |)""".stripMargin
        val tops = Seq(2, 3, 4).map(topCte).mkString
        val dups = Seq(5, 6, 7, 8, 9, 10).map(dupCte).mkString
        val topRules = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16).map { case (n, t) =>
          s"""  (CASE WHEN token_chars = 0 THEN 0.0
             |    ELSE CAST(COALESCE(top$n.mass, 0) AS DOUBLE) / token_chars
             |   END <= $t) AS top${n}gram_ok,""".stripMargin
        }.mkString("\n")
        val dupRules = Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12,
          9 -> 0.11, 10 -> 0.10).map { case (n, t) =>
          s"""  (CASE WHEN token_chars = 0 THEN 0.0
             |    ELSE CAST(COALESCE(dc$n.chars, 0) AS DOUBLE) / token_chars
             |   END <= $t) AS dup${n}gram_ok,""".stripMargin
        }.mkString("\n")
        val joins = (Seq(2, 3, 4).map(n => s"LEFT JOIN top$n USING (doc_id)")
          ++ Seq(5, 6, 7, 8, 9, 10).map(n => s"LEFT JOIN dc$n USING (doc_id)"))
          .mkString("\n")
        s"""WITH d0 AS (
           |  SELECT doc_id, STRING_SPLIT(text, ' ') AS tk0 FROM documents
           |), built AS (
           |  -- COALESCE: a slice START beyond the list length is NULL in
           |  -- DuckDB (Spark's slice gives an empty array → '' line)
           |  SELECT doc_id,
           |    'repeated banner line' || chr(10) ||
           |    COALESCE(ARRAY_TO_STRING(tk0[1:40], ' '), '') || chr(10) ||
           |    'repeated banner line' || chr(10) ||
           |    COALESCE(ARRAY_TO_STRING(tk0[41:100], ' '), '') ||
           |    CASE WHEN doc_id % 5 = 0
           |         THEN chr(10) || 'repeated banner line' ELSE '' END AS t
           |  FROM d0
           |), d AS (
           |  SELECT doc_id, STRING_SPLIT(t, ' ') AS tk,
           |    STRING_SPLIT(t, chr(10)) AS lns
           |  FROM built
           |), lin AS (
           |  SELECT doc_id, LEN(lns) AS n_lines,
           |    LEN(lns) - LEN(LIST_DISTINCT(lns)) AS n_dup,
           |    LIST_SUM(LIST_TRANSFORM(lns,
           |      l -> CAST(LEN(l) AS BIGINT))) AS line_chars
           |  FROM d
           |), dlc AS (
           |  SELECT doc_id, SUM((cnt - 1) * len) AS dup_line_chars FROM (
           |    SELECT doc_id, COUNT(*) AS cnt,
           |      CAST(LEN(l) AS BIGINT) AS len
           |    FROM (SELECT doc_id, UNNEST(lns) AS l FROM d)
           |    GROUP BY doc_id, l)
           |  GROUP BY doc_id
           |), tc AS (
           |  SELECT doc_id, LIST_SUM(LIST_TRANSFORM(tk,
           |    x -> CAST(LEN(x) AS BIGINT))) AS token_chars
           |  FROM d
           |)$tops$dups
           |SELECT lin.doc_id,
           |  (CAST(n_dup AS DOUBLE) / n_lines <= 0.30) AS dup_line_frac_ok,
           |  (CASE WHEN line_chars = 0 THEN 0.0
           |    ELSE CAST(COALESCE(dup_line_chars, 0) AS DOUBLE) / line_chars
           |   END <= 0.20) AS dup_line_char_frac_ok,
           |$topRules
           |$dupRules
           |  (CAST(n_dup AS DOUBLE) / n_lines <= 0.30
           |   AND CASE WHEN line_chars = 0 THEN 0.0
           |     ELSE CAST(COALESCE(dup_line_chars, 0) AS DOUBLE) / line_chars
           |    END <= 0.20
           |${Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16).map { case (n, t) =>
               s"""   AND CASE WHEN token_chars = 0 THEN 0.0
                  |     ELSE CAST(COALESCE(top$n.mass, 0) AS DOUBLE) / token_chars
                  |    END <= $t""".stripMargin }.mkString("\n")}
           |${Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11,
               10 -> 0.10).map { case (n, t) =>
               s"""   AND CASE WHEN token_chars = 0 THEN 0.0
                  |     ELSE CAST(COALESCE(dc$n.chars, 0) AS DOUBLE) / token_chars
                  |    END <= $t""".stripMargin }.mkString("\n")}
           |  ) AS passes
           |FROM lin
           |LEFT JOIN dlc USING (doc_id)
           |JOIN tc USING (doc_id)
           |$joins
           |ORDER BY lin.doc_id""".stripMargin
      }),

    Q("qc2_softmax_domains",  // MULTICLASS classifier (multinomial
      // Newton/IRLS over hashed bag-of-words) with the same planted-
      // teacher gate as qc1, lifted to K=4: label = argmax of four fixed
      // hyperplanes in the feature space — exactly softmax-realizable, so
      // recovery is guaranteed-achievable. Invariants: bit-identical refit
      // after an adversarial repartition (Fixed128 exact sums), loss
      // decrease, ≥90% teacher recovery, and every class actually
      // predicted (a collapsed model recovers ~the majority share, never
      // per-class coverage). DUAL-ENGINE PART: md5-bucket integer features
      // make each document's teacher label y (argmax of four EXACT integer
      // dots, first-index tie-break) independently recomputable in DuckDB;
      // the fit invariants stay Spark-side booleans (see qc1/qc4).
      (s, dir) => {
        val dim = 16; val numK = 4
        val u = Array.tabulate(numK, dim)((k, j) =>
          (((j + 1) * (2 * k + 3)) % 17 - 8).toLong)
        val feats = t(s, dir, "documents").select(col("doc_id"),
          md5BucketFeatures(col("text"), dim).as("x"))
        val dots = array(u.map(uk => intDot(col("x"), uk)): _*)
        // fit on x/64 with l2/64² — see qc1 (label from the unscaled
        // exact dots; ridge rescaled in step)
        val docs = feats.withColumn("y",
            (array_position(dots, array_max(dots)) - 1).cast("double"))
          .withColumn("x", transform(col("x"), v => v / 64.0d))
        def fit(d: org.apache.spark.sql.DataFrame) =
          graft.llm.Classifier.softmaxFit(d, "y", "x", dim, numK,
            iters = 8, l2 = 1e-4 / 4096)
        val m = fit(docs)
        val m2 = fit(docs.repartition(7))
        val deterministic =
          m.weights.zip(m2.weights).forall(p => p._1.sameElements(p._2)) &&
            m.biases.sameElements(m2.biases)
        val lossDecreased = m.lossHistory.last < m.lossHistory.head
        val agreement = graft.llm.Classifier.softmaxAccuracy(docs, "y", "x", m)
        val classesPredicted = docs.select(
          graft.llm.Classifier.softmaxPredict(col("x"), m).as("c"))
          .distinct().count()
        docs.select(col("doc_id"), col("y"),
            lit(deterministic).as("fit_deterministic"),
            lit(lossDecreased).as("loss_decreased"),
            lit(agreement >= 0.90).as("recovers_teacher"),
            lit(classesPredicted == numK).as("all_classes_predicted"))
          .orderBy("doc_id")
      },
      Some({
        val dim = 16; val numK = 4
        val u = Array.tabulate(numK, dim)((k, j) =>
          (((j + 1) * (2 * k + 3)) % 17 - 8).toLong)
        val dots = (0 until numK)
          .map(k => s"${duckDot(u(k), dim)} AS s$k").mkString(", ")
        s"""WITH tok AS ($duckTokenHashes),
           |  d AS (SELECT doc_id, $dots
           |  FROM tok GROUP BY doc_id)
           |SELECT doc_id,
           |  CAST(CASE WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 THEN 0
           |            WHEN s1 >= s2 AND s1 >= s3 THEN 1
           |            WHEN s2 >= s3 THEN 2 ELSE 3 END AS DOUBLE) AS y,
           |  true AS fit_deterministic, true AS loss_decreased,
           |  true AS recovers_teacher, true AS all_classes_predicted
           |FROM d ORDER BY doc_id""".stripMargin
      })),

    Q("qc4_softmax_score_parity",  // the SHIPPED multiclass scoring path
      // (softmaxProbs / softmaxPredict — the stable-softmax native
      // expression used by CALL softmax_score and the streaming scoreWith
      // sink) under a FIXED integer-weight model, dual-engine: DuckDB
      // recomputes each document's four logits EXACTLY (integer-range
      // double arithmetic), the predicted class (argmax, first-index
      // ties), and the winning probability through the same stable-softmax
      // formula rounded to 6 dp. Value-exact complement to qc2's
      // self-certified fit invariants.
      (s, dir) => {
        val dim = 16; val numK = 4
        val wFix = Array.tabulate(numK, dim)((k, j) =>
          (((j + 2) * (3 * k + 5)) % 15 - 7).toLong)
        val biases = Array(1.0, -1.0, 0.0, 2.0)
        val m = graft.llm.Classifier.SoftmaxModel(
          wFix.map(_.map(_.toDouble)), biases, Array.empty)
        val docs = t(s, dir, "documents").select(col("doc_id"),
          md5BucketFeatures(col("text"), dim).as("x"))
        docs.select(col("doc_id") +:
            (0 until numK).map(k =>
              intDot(col("x"), wFix(k), biases(k)).as(s"z$k")) :+
            graft.llm.Classifier.softmaxPredict(col("x"), m).as("pred") :+
            round(array_max(
              graft.llm.Classifier.softmaxProbs(col("x"), m)), 6)
              .as("conf6"): _*)
          .orderBy("doc_id")
      },
      Some({
        val dim = 16; val numK = 4
        val wFix = Array.tabulate(numK, dim)((k, j) =>
          (((j + 2) * (3 * k + 5)) % 15 - 7).toLong)
        val biases = Array(1.0, -1.0, 0.0, 2.0)
        val zs = (0 until numK)
          .map(k => s"CAST(${duckDot(wFix(k), dim)} AS DOUBLE) + " +
            s"(${biases(k)}) AS z$k")
          .mkString(", ")
        s"""WITH tok AS ($duckTokenHashes),
           |  z AS (SELECT doc_id, $zs
           |  FROM tok GROUP BY doc_id),
           |  m AS (SELECT *,
           |          EXP(z0 - GREATEST(z0, z1, z2, z3)) +
           |          EXP(z1 - GREATEST(z0, z1, z2, z3)) +
           |          EXP(z2 - GREATEST(z0, z1, z2, z3)) +
           |          EXP(z3 - GREATEST(z0, z1, z2, z3)) AS denom
           |        FROM z)
           |SELECT doc_id, z0, z1, z2, z3,
           |  CAST(CASE WHEN z0 >= z1 AND z0 >= z2 AND z0 >= z3 THEN 0
           |            WHEN z1 >= z2 AND z1 >= z3 THEN 1
           |            WHEN z2 >= z3 THEN 2 ELSE 3 END AS INT) AS pred,
           |  ROUND(1.0 / denom, 6) AS conf6
           |FROM m ORDER BY doc_id""".stripMargin
      })),

    // ---- SE*: DSIR importance-resampling data selection ----
    Q("se1_dsir_weights",  // DSIR (Xie et al. 2023) hashed-ngram log
      // importance weights of every document against a target slice:
      // DuckDB rebuilds the ENTIRE model — unigram+bigram gram explode,
      // md5-bucket counts for raw and target, add-1 smoothing, 6-dp
      // DECIMAL log-ratio table over the full bucket domain, per-doc
      // exact sum — and must match weight-for-weight
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.llm.Selection.dsirWeights(d, d.filter(col("doc_id") < 120),
            "doc_id", buckets = 256, gramHash = md5Hash60)
          .select("doc_id", "n_grams", "dsir_logweight")
          .orderBy("doc_id")
      },
      Some(duckDsirWeights +
        """SELECT doc_id, n_grams, CAST(wdec AS DOUBLE) AS dsir_logweight
          |FROM w ORDER BY doc_id""".stripMargin)),

    Q("se2_dsir_select",  // deterministic DSIR top-k selection: the
      // range-bucketed two-phase rank (rankBySort — weights are NOT
      // md5-uniform, so the rank buckets come from engine range sampling)
      // must equal DuckDB's naive ROW_NUMBER over (weight DESC, id).
      // The top-k threshold is forced to 1 while BUILDING the plan so
      // this gate pins the LARGE-k rankBySort regime; se3/se4 cover the
      // default TakeOrderedAndProject regime
      (s, dir) => {
        val d = t(s, dir, "documents")
        val key = "spark.sql.execution.topKSortFallbackThreshold"
        val old = s.conf.get(key, "10000")
        s.conf.set(key, "1")
        try
          graft.llm.Selection.dsirSelect(d, d.filter(col("doc_id") < 120),
              "doc_id", k = 150, buckets = 256, gramHash = md5Hash60)
            .orderBy("sel_rank")
        finally s.conf.set(key, old)
      },
      Some(duckDsirWeights +
        """, sel AS (
          |  SELECT doc_id, n_grams, wdec,
          |    ROW_NUMBER() OVER (ORDER BY wdec DESC, doc_id) - 1 AS r
          |  FROM w)
          |SELECT doc_id, n_grams, CAST(wdec AS DOUBLE) AS dsir_logweight,
          |  CAST(r AS BIGINT) AS sel_rank
          |FROM sel WHERE r < 150 ORDER BY r""".stripMargin)),

    Q("se3_dsir_gumbel",  // seeded Gumbel-top-k RESAMPLING (the paper's
      // sampling mode, P(select) ∝ exp(weight)): the perturbation
      // −ln(−ln u) draws u = (2h+1)/2^53 from the md5 hash of seed|id —
      // an exact dyadic rational both engines agree on — and rounds to
      // 6-dp DECIMAL, so DuckDB recomputes the exact perturbed ranking
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.llm.Selection.dsirSelect(d, d.filter(col("doc_id") < 120),
            "doc_id", k = 150, buckets = 256, gumbelSeed = Some(42L),
            gramHash = md5Hash60)
          .orderBy("sel_rank")
      },
      Some(duckDsirWeights +
        """, gk AS (
          |  SELECT doc_id, n_grams, wdec,
          |    wdec + CAST(ROUND(-LN(-LN(
          |      (((('0x'||substr(md5('42|' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT
          |         % 4503599627370496) * 2.0 + 1.0) / 9007199254740992.0))), 6)
          |      AS DECIMAL(18,6)) AS gkey
          |  FROM w),
          |sel AS (
          |  SELECT doc_id, n_grams, wdec,
          |    ROW_NUMBER() OVER (ORDER BY gkey DESC, doc_id) - 1 AS r
          |  FROM gk)
          |SELECT doc_id, n_grams, CAST(wdec AS DOUBLE) AS dsir_logweight,
          |  CAST(r AS BIGINT) AS sel_rank
          |FROM sel WHERE r < 150 ORDER BY r""".stripMargin)),

    Q("se5_dsir_score_model",  // fit-once / score-anywhere parity: the
      // PERSISTED-model scoring path (dsirFit table → literal-LUT
      // map-side DECIMAL fold, no shuffle, no join — what an ingest
      // batch pays) must equal the corpus-weights path; DuckDB
      // recomputes every weight from scratch as in se1
      (s, dir) => {
        val d = t(s, dir, "documents")
        val model = graft.llm.Selection.dsirFit(d,
          d.filter(col("doc_id") < 120), buckets = 256,
          gramHash = md5Hash60)
        graft.llm.Selection.dsirScoreFromModel(
            d.select("doc_id", "text"), model, gramHash = md5Hash60)
          .select("doc_id", "dsir_logweight")
          .orderBy("doc_id")
      },
      Some(duckDsirWeights +
        """SELECT doc_id, CAST(wdec AS DOUBLE) AS dsir_logweight
          |FROM w ORDER BY doc_id""".stripMargin)),

    Q("se4_weighted_sample",  // Efraimidis-Spirakis weighted sampling
      // WITHOUT replacement (P ∝ token count): the race key ln(u)/w draws
      // u from the same exact dyadic construction as se3, so DuckDB
      // redraws the entire sample and must match rank-for-rank
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        graft.llm.Selection.weightedSample(d, "doc_id", col("n_tokens"),
            k = 200, seed = 7L, hash = md5Hash60)
          .select(col("doc_id"), col("n_tokens"), col("sample_rank"))
          .orderBy("sample_rank")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens
             |  FROM documents
             |), kd AS (
             |  SELECT doc_id, n_tokens,
             |    ROUND(LN(
             |      (((('0x'||substr(md5('7|' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT
             |         % 4503599627370496) * 2.0 + 1.0) / 9007199254740992.0))
             |      / n_tokens, 6) AS skey
             |  FROM d WHERE n_tokens > 0
             |), sel AS (
             |  SELECT doc_id, n_tokens,
             |    ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id) - 1 AS r
             |  FROM kd)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(r AS BIGINT) AS sample_rank
             |FROM sel WHERE r < 200 ORDER BY r""".stripMargin)),

    Q("dd11_keep_best",  // keep-BEST-per-cluster canonical selection:
      // same tripled corpus and jaccard edge set as dd6, but the survivor
      // maximizes LENGTH(text) (tie → smallest id) — DuckDB recomputes the
      // clusters via recursive CTE and the winner election per component
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "lang", "text")
        val base = docs.filter(col("doc_id") < 250)
          .unionByName(docs.filter(col("doc_id") < 20)
            .select((col("doc_id") + 1000000).as("doc_id"), col("lang"),
              col("text")))
          .unionByName(docs.filter(col("doc_id") < 20)
            .select((col("doc_id") + 2000000).as("doc_id"), col("lang"),
              concat(col("text"), lit(" padded tail")).as("text")))
        val pairs = graft.llm.Dedup.ngramJaccardPairs(base, "doc_id",
          "text", blockCol = "lang", threshold = 0.6)
        graft.llm.Dedup.keepBestInClusters(base, "doc_id", pairs,
            length(col("text")))
          .select(col("doc_id"),
            length(col("text")).cast("long").as("text_len"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id, lang, text FROM documents WHERE doc_id < 250
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id < 20
             |  UNION ALL
             |  SELECT doc_id + 2000000, lang, text || ' padded tail'
             |  FROM documents WHERE doc_id < 20
             |), sets AS (
             |  SELECT doc_id, lang, LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS st
             |  FROM base
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |  WHERE ROUND(CAST(LEN(LIST_INTERSECT(a.st, b.st)) AS DOUBLE)
             |      / (LEN(a.st) + LEN(b.st) - LEN(LIST_INTERSECT(a.st, b.st))), 6) >= 0.6
             |), edges AS (
             |  SELECT id_a AS u, id_b AS v FROM pairs
             |  UNION
             |  SELECT id_b, id_a FROM pairs
             |), reach(id, r) AS (
             |  SELECT u, v FROM edges
             |  UNION
             |  SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
             |), comp AS (
             |  SELECT id, MIN(LEAST(id, r)) AS component FROM reach GROUP BY id
             |), allc AS (
             |  SELECT b.doc_id AS id,
             |         COALESCE(c.component, b.doc_id) AS component,
             |         LENGTH(b.text) AS len
             |  FROM base b LEFT JOIN comp c ON b.doc_id = c.id
             |), win AS (
             |  SELECT id, len,
             |    ROW_NUMBER() OVER (PARTITION BY component
             |                       ORDER BY len DESC, id) AS rn
             |  FROM allc)
             |SELECT CAST(id AS BIGINT) AS doc_id, CAST(len AS BIGINT) AS text_len
             |FROM win WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // ---- DD*: deduplication suite over `documents` ----
    Q("dd10_line_dedup",  // corpus-wide keep-first line dedup
      // (RefinedWeb-style): planted boilerplate lines survive only in the
      // first document; DuckDB recomputes the identical keep set with a
      // global window over exploded lines — value-exact reassembled text
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat_ws("\n", lit("SUBSCRIBE TO OUR NEWSLETTER"), col("text"),
            lit("ALL RIGHTS RESERVED")).as("text"))
        graft.llm.Dedup.dedupLinesKeepFirst(docs, "doc_id", "text",
            minChars = 5)
          .select("doc_id", "text").orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, 'SUBSCRIBE TO OUR NEWSLETTER' || CHR(10) ||
             |         text || CHR(10) || 'ALL RIGHTS RESERVED' AS text
             |  FROM documents
             |), l AS (
             |  SELECT doc_id,
             |    UNNEST(STRING_SPLIT(text, CHR(10))) AS line,
             |    UNNEST(RANGE(1, LEN(STRING_SPLIT(text, CHR(10))) + 1)) AS pos
             |  FROM d
             |), k AS (
             |  SELECT doc_id, pos, line,
             |    ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
             |  FROM l WHERE LENGTH(line) >= 5
             |), kept AS (
             |  SELECT doc_id, pos, line FROM k WHERE rn = 1
             |  UNION ALL
             |  SELECT doc_id, pos, line FROM l WHERE LENGTH(line) < 5
             |), agg AS (
             |  SELECT doc_id, STRING_AGG(line, CHR(10) ORDER BY pos) AS t2
             |  FROM kept GROUP BY doc_id
             |)
             |SELECT d.doc_id, COALESCE(agg.t2, '') AS text
             |FROM d LEFT JOIN agg USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    Q("dd12_span_dedup",  // exact-substring span REMOVAL keep-first (Lee
      // et al. ExactSubstr): a 12-token license passage planted into every
      // doc_id % 5 == 0 document survives only at its globally-first
      // occurrence; natural 8-token repeats dedup too. DuckDB recomputes
      // the identical cut set by grouping windows on their TEXT (no hash
      // in the oracle, so the gate also witnesses that Spark's xxhash64
      // (h1, h2) window identity never cross-links distinct spans) and
      // value-matches the reassembled documents.
      (s, dir) => {
        val planted = lit("Licensed under the Apache License Version 2.0 " +
          "see the NOTICE file")
        val docs = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat_ws(" ", planted, col("text")))
            .otherwise(col("text")).as("text"))
        graft.llm.Dedup.dedupSpansKeepFirst(docs, "doc_id", "text",
            spanTokens = 8, stride = 1)
          .select("doc_id", "text").orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
             |    THEN 'Licensed under the Apache License Version 2.0 ' ||
             |         'see the NOTICE file ' || text
             |    ELSE text END AS text
             |  FROM documents
             |), toks AS (
             |  SELECT doc_id,
             |    UNNEST(STRING_SPLIT(text, ' ')) AS tok,
             |    UNNEST(RANGE(0, LEN(STRING_SPLIT(text, ' ')))) AS tp
             |  FROM d
             |), w AS (
             |  SELECT d.doc_id, p.p AS wp,
             |    ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(d.text, ' '),
             |      p.p + 1, p.p + 8), ' ') AS win
             |  FROM d, LATERAL (SELECT UNNEST(RANGE(0,
             |    LEN(STRING_SPLIT(d.text, ' ')) - 8 + 1)) AS p) p
             |  WHERE LEN(STRING_SPLIT(d.text, ' ')) >= 8
             |), ranked AS (
             |  SELECT doc_id, wp,
             |    ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, wp) AS rn,
             |    COUNT(*) OVER (PARTITION BY win) AS n
             |  FROM w
             |), cut AS (
             |  SELECT DISTINCT doc_id, wp + o.o AS tp
             |  FROM ranked, LATERAL (SELECT UNNEST(RANGE(0, 8)) AS o) o
             |  WHERE n >= 2 AND rn > 1
             |), kept AS (
             |  SELECT t.doc_id, t.tp, t.tok
             |  FROM toks t LEFT JOIN cut c
             |    ON t.doc_id = c.doc_id AND t.tp = c.tp
             |  WHERE c.doc_id IS NULL
             |), agg AS (
             |  SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY tp) AS t2
             |  FROM kept GROUP BY doc_id
             |)
             |SELECT d.doc_id, COALESCE(agg.t2, '') AS text
             |FROM d LEFT JOIN agg USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    Q("dd13_span_stats",  // per-document duplicated-text mass (the
      // ExactSubstr measurement pass): tokens under ANY >1x-occurring
      // 8-token window, both copies counted; same planted header as dd12
      // so every 5th doc carries a guaranteed duplicated span. DuckDB
      // recomputes window groups by TEXT and the distinct covered
      // positions per document.
      (s, dir) => {
        val planted = lit("Licensed under the Apache License Version 2.0 " +
          "see the NOTICE file")
        val docs = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat_ws(" ", planted, col("text")))
            .otherwise(col("text")).as("text"))
        graft.llm.Dedup.spanDuplicationStats(docs, "doc_id", "text",
            spanTokens = 8, stride = 1)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
             |    THEN 'Licensed under the Apache License Version 2.0 ' ||
             |         'see the NOTICE file ' || text
             |    ELSE text END AS text
             |  FROM documents
             |), w AS (
             |  SELECT d.doc_id, p.p AS wp,
             |    ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(d.text, ' '),
             |      p.p + 1, p.p + 8), ' ') AS win
             |  FROM d, LATERAL (SELECT UNNEST(RANGE(0,
             |    LEN(STRING_SPLIT(d.text, ' ')) - 8 + 1)) AS p) p
             |  WHERE LEN(STRING_SPLIT(d.text, ' ')) >= 8
             |), dupw AS (
             |  SELECT doc_id, wp FROM (
             |    SELECT doc_id, wp, COUNT(*) OVER (PARTITION BY win) AS n
             |    FROM w) WHERE n >= 2
             |), cov AS (
             |  SELECT doc_id, COUNT(*) AS dup_tokens FROM (
             |    SELECT DISTINCT doc_id, wp + o.o AS tp
             |    FROM dupw, LATERAL (SELECT UNNEST(RANGE(0, 8)) AS o) o
             |  ) GROUP BY doc_id
             |)
             |SELECT d.doc_id,
             |  CAST(LEN(STRING_SPLIT(d.text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(COALESCE(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
             |  ROUND(COALESCE(cov.dup_tokens, 0) * 1.0 /
             |    GREATEST(LEN(STRING_SPLIT(d.text, ' ')), 1), 6) AS dup_frac
             |FROM d LEFT JOIN cov USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    Q("dd1_exact_groups",
      (s, dir) => t(s, dir, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id"),
      Some("""SELECT MD5(text) AS content_hash, MIN(doc_id) AS keep_id,
             |       COUNT(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    Q("dd2_minhash_lsh",  // planted-duplicate containment, self-oracled:
      // identical texts have identical minhash signatures, so every band
      // collides and each planted pair MUST surface (deterministically, not
      // probabilistically) — a DuckDB-checkable guarantee of the LSH path
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val planted = docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        val pairs = graft.llm.Dedup.minhashPairs(docs.union(planted),
          "doc_id", "text", k = 64, bands = 16, threshold = 0.5)
        val found = pairs.filter(col("id_b") === col("id_a") + 1000000)
          .select(col("id_a").as("doc_id")).withColumn("_f", lit(true))
        docs.filter(col("doc_id") < 20).select("doc_id")
          .join(found, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("_f"), lit(false)).as("planted_pair_found"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, true AS planted_pair_found FROM documents
             |WHERE doc_id < 20 ORDER BY doc_id""".stripMargin)),

    Q("dd3_ngram_jaccard",
      (s, dir) => graft.llm.Dedup.ngramJaccardPairs(t(s, dir, "documents"),
          "doc_id", "text", blockCol = "lang", threshold = 0.6,
          leftFilter = col("doc_id") < 250)
        .orderBy("id_a", "id_b"),
      Some("""WITH s AS (SELECT doc_id, lang,
             |             LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS st
             |           FROM documents)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  ROUND(CAST(LEN(LIST_INTERSECT(a.st, b.st)) AS DOUBLE)
             |        / (LEN(a.st) + LEN(b.st) - LEN(LIST_INTERSECT(a.st, b.st))), 6)
             |    AS jaccard
             |FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |WHERE a.doc_id < 250
             |  AND ROUND(CAST(LEN(LIST_INTERSECT(a.st, b.st)) AS DOUBLE)
             |        / (LEN(a.st) + LEN(b.st) - LEN(LIST_INTERSECT(a.st, b.st))), 6) >= 0.6
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("dd8_dup_passages",  // exact duplicate-PASSAGE detection (Lee et al.
      // substring dedup, window-granular): 64-char windows every 32 chars,
      // hash-only candidate shuffle, output grouped by the TEXT itself so
      // 64-bit collisions can't merge passages — oracle recomputes the same
      // windows declaratively in DuckDB
      (s, dir) => graft.llm.Dedup.duplicateSpans(t(s, dir, "documents"),
          "doc_id", "text", windowLen = 64, stride = 32, minDocs = 2)
        .select(md5(col("dup_text")).as("win_md5"), col("n_docs"), col("n_occ"))
        .orderBy("win_md5"),
      Some("""WITH w AS (
             |  SELECT d.doc_id, substr(d.text, p.p + 1, 64) AS win
             |  FROM documents d,
             |       LATERAL (SELECT UNNEST(RANGE(0, LEN(d.text) - 64 + 1, 32)) AS p) p
             |  WHERE LEN(d.text) >= 64
             |)
             |SELECT MD5(win) AS win_md5,
             |  COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
             |FROM w GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2
             |ORDER BY win_md5""".stripMargin)),

    Q("dd4_simhash",  // planted-duplicate containment, self-oracled (same
      // argument as dd2: identical text → identical 64-bit simhash → every
      // 16-bit chunk collides and hamming = 0 ≤ maxHamming)
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val planted = docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        val pairs = graft.llm.Dedup.simhashPairs(docs.union(planted),
          "doc_id", "text", maxHamming = 3)
        val found = pairs.filter(col("id_b") === col("id_a") + 1000000)
          .select(col("id_a").as("doc_id")).withColumn("_f", lit(true))
        docs.filter(col("doc_id") < 20).select("doc_id")
          .join(found, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("_f"), lit(false)).as("planted_pair_found"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, true AS planted_pair_found FROM documents
             |WHERE doc_id < 20 ORDER BY doc_id""".stripMargin)),

    Q("dd6_cc_clusters",  // pairs → transitive CLUSTERS: the distributed
      // large-star/small-star connected components over the same ngram
      // jaccard edge set DuckDB recomputes, whose closure a recursive CTE
      // takes; planted triple-copies guarantee non-trivial components
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "lang", "text")
        val base = docs.filter(col("doc_id") < 250)
          .unionByName(docs.filter(col("doc_id") < 20)
            .select((col("doc_id") + 1000000).as("doc_id"), col("lang"), col("text")))
          .unionByName(docs.filter(col("doc_id") < 20)
            .select((col("doc_id") + 2000000).as("doc_id"), col("lang"), col("text")))
        val pairs = graft.llm.Dedup.ngramJaccardPairs(base, "doc_id", "text",
          blockCol = "lang", threshold = 0.6)
        graft.llm.Dedup.connectedComponents(pairs)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id, lang, text FROM documents WHERE doc_id < 250
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id < 20
             |  UNION ALL
             |  SELECT doc_id + 2000000, lang, text FROM documents WHERE doc_id < 20
             |), sets AS (
             |  SELECT doc_id, lang, LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS st
             |  FROM base
             |), pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |  WHERE ROUND(CAST(LEN(LIST_INTERSECT(a.st, b.st)) AS DOUBLE)
             |      / (LEN(a.st) + LEN(b.st) - LEN(LIST_INTERSECT(a.st, b.st))), 6) >= 0.6
             |), edges AS (
             |  SELECT id_a AS u, id_b AS v FROM pairs
             |  UNION
             |  SELECT id_b, id_a FROM pairs
             |), reach(id, r) AS (
             |  SELECT u, v FROM edges
             |  UNION
             |  SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
             |)
             |SELECT CAST(id AS BIGINT) AS id,
             |       CAST(MIN(LEAST(id, r)) AS BIGINT) AS component
             |FROM reach GROUP BY id ORDER BY id""".stripMargin)),

    Q("dd5_embed_cosine_pairs",
      (s, dir) => graft.llm.Dedup.embeddingCosinePairs(t(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4,
          leftFilter = col("vec_id") < 250)
        .orderBy("id_a", "id_b"),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
             |                               CAST(b.embedding AS DOUBLE[])), 6) AS cos
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE a.vec_id < 250
             |  AND ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
             |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("dd7_embed_lsh_pairs",  // planted-duplicate containment, self-oracled
      // (same argument as dd2/ss2: an identical planted vector shares every
      // LSH table signature, so the pair is ALWAYS a candidate and survives
      // the exact cosine verify at similarity 1.0 — deterministic)
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = e.filter(col("vec_id") < 20)
          .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
        val pairs = graft.llm.Dedup.embeddingLshPairs(e.union(planted),
          "vec_id", "embedding", dim = 64, threshold = 0.99,
          planes = 8, tables = 4)
        val found = pairs.filter(col("id_b") === col("id_a") + 1000000)
          .select(col("id_a").as("vec_id")).withColumn("_f", lit(true))
        e.filter(col("vec_id") < 20).select("vec_id")
          .join(found, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("_f"), lit(false)).as("planted_pair_found"))
          .orderBy("vec_id")
      },
      Some("""SELECT vec_id, true AS planted_pair_found FROM embeddings
             |WHERE vec_id < 20 ORDER BY vec_id""".stripMargin)),

    // ---- SS*: similarity search ----
    Q("ss1_knn_join",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        graft.llm.Similarity.knnJoin(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10)
          .orderBy("q_id", "knn_rank")
      },
      Some("""SELECT q_id, knn_rank, n_id FROM (
             |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY LIST_DISTANCE(CAST(c.embedding AS DOUBLE[]),
             |                             CAST(q.embedding AS DOUBLE[])), c.vec_id)
             |      AS knn_rank
             |  FROM embeddings c
             |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
             |  WHERE c.vec_id <> q.vec_id) x
             |WHERE knn_rank <= 10 ORDER BY q_id, knn_rank""".stripMargin)),

    Q("ss2_ann_lsh",  // planted-neighbor containment, self-oracled: an
      // identical planted vector shares every LSH table signature with its
      // query, so it is ALWAYS a candidate and ranks by distance 0 into the
      // top-k — deterministic; recall on non-identical vectors is spec-tested
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val q = e.filter(col("vec_id") < 5)
        val planted = q.select((col("vec_id") + 1000000).as("vec_id"),
          col("embedding"))
        val res = graft.llm.Similarity.annLsh(e.union(planted), q,
          "vec_id", "embedding", k = 10, dim = 64, planes = 8, tables = 8)
        res.groupBy("q_id")
          .agg(max(when(col("n_id") === col("q_id") + 1000000, 1).otherwise(0))
            .as("planted_found"))
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, 1 AS planted_found FROM embeddings
             |WHERE vec_id < 5 ORDER BY q_id""".stripMargin)),

    Q("v3_vector_ivf",  // IVF-routed ANN, self-oracled by planted-neighbor
      // containment: an identical planted vector lands in the same cell as
      // the query's nearest centroid (same argmin, same tie-break), which is
      // always the first probed cell, so it surfaces at distance 0
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val q = e.filter(col("vec_id") < 10)
        val planted = q.select((col("vec_id") + 1000000).as("vec_id"),
          col("embedding"))
        val (centroids, assigned) = graft.llm.Similarity.ivfIndex(
          e.union(planted), "vec_id", "embedding",
          nCentroids = 16, refineIters = 1)
        val res = graft.llm.Similarity.ivfSearch(assigned, centroids, q,
          "vec_id", "embedding", k = 10, nprobe = 4)
        res.groupBy("q_id")
          .agg(max(when(col("n_id") === col("q_id") + 1000000, 1).otherwise(0))
            .as("planted_found"))
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, 1 AS planted_found FROM embeddings
             |WHERE vec_id < 10 ORDER BY q_id""".stripMargin)),

    // ---- MM*: multimodal binary-column plumbing ----
    Q("mm1_binary_meta",
      (s, dir) => {
        val withBin = t(s, dir, "documents")
          .withColumn("media", col("text").cast("binary"))
        graft.llm.Multimodal.withMediaMeta(withBin, "media", "text/plain")
          .select(col("doc_id"),
            col("media_meta.n_bytes").as("n_bytes"),
            col("media_meta.checksum").as("checksum"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
             |  MD5(text) AS checksum
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("mm2_feature_extract",  // REAL image decode through javax.imageio:
      // each doc gets a deterministic solid-color 16×16 PNG (channels are
      // closed-form functions of doc_id), flows through the distributed
      // mapPartitions decode, and must come back with the exact channel
      // means the oracle derives arithmetically — an end-to-end proof that
      // real pixels (not stub bytes) produced the features.
      (s, dir) => {
        val png = udf((id: Long) => solidPng(
          (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt))
        graft.llm.Multimodal.extractFeatures(
            t(s, dir, "documents").filter(col("doc_id") < 200)
              .withColumn("media", png(col("doc_id"))),
            "doc_id", "media")
          .select(col("id"), size(col("features")).as("n_features"),
            round(element_at(col("features"), 1).cast("double"), 3).as("f_r"),
            round(element_at(col("features"), 2).cast("double"), 3).as("f_g"),
            round(element_at(col("features"), 3).cast("double"), 3).as("f_b"),
            round(element_at(col("features"), 4).cast("double"), 3).as("f_lum"),
            // solid color ⇒ every grid cell equals the global luminance
            (element_at(col("features"), 5) === element_at(col("features"), 8))
              .as("cells_uniform"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, 8 AS n_features,
             |  ROUND((doc_id % 256) / 255.0, 3) AS f_r,
             |  ROUND((doc_id * 7 % 256) / 255.0, 3) AS f_g,
             |  ROUND((doc_id * 13 % 256) / 255.0, 3) AS f_b,
             |  ROUND(((doc_id % 256) + (doc_id * 7 % 256) + (doc_id * 13 % 256))
             |    / 3.0 / 255.0, 3) AS f_lum,
             |  true AS cells_uniform
             |FROM documents WHERE doc_id < 200 ORDER BY id""".stripMargin)),

    Q("mm3_audio_features",  // REAL PCM-WAV decode through javax.sound.sampled:
      // each doc gets a deterministic square-wave WAV (amplitude and
      // half-period are closed-form functions of doc_id), flows through the
      // same distributed mapPartitions decode as images, and must come back
      // with the exact energy / zero-crossing / envelope features the
      // oracle derives arithmetically — an end-to-end proof that real PCM
      // frames (not stub bytes) produced the features. Amplitudes are
      // multiples of 256 so rms·128 and peak·128 are exact integers; 1680
      // samples divide evenly by TWICE every half-period in 4..8, so the
      // crossing count is exactly samples/halfPeriod − 1 AND the +v/−v
      // block counts balance (zero DC offset).
      (s, dir) => {
        val wav = udf((id: Long) => squareWav(
          ((id % 127).toInt + 1) * 256, 4 + (id % 5).toInt, 1680))
        graft.llm.Multimodal.extractFeatures(
            t(s, dir, "documents").filter(col("doc_id") < 200)
              .withColumn("media", wav(col("doc_id"))),
            "doc_id", "media")
          .select(col("id"), size(col("features")).as("n_features"),
            round(element_at(col("features"), 1).cast("double") * 128, 0)
              .cast("long").as("rms_q128"),
            element_at(col("features"), 2).cast("long").as("zero_crossings"),
            round(element_at(col("features"), 3).cast("double") * 128, 0)
              .cast("long").as("peak_q128"),
            round(element_at(col("features"), 4).cast("double") * 1000000, 0)
              .cast("long").as("dc_offset_ppm"),
            // constant envelope ⇒ every quarter's RMS equals the total RMS
            (element_at(col("features"), 5) === element_at(col("features"), 1) &&
              element_at(col("features"), 8) === element_at(col("features"), 1))
              .as("envelope_uniform"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, 8 AS n_features,
             |  doc_id % 127 + 1 AS rms_q128,
             |  1680 // (4 + doc_id % 5) - 1 AS zero_crossings,
             |  doc_id % 127 + 1 AS peak_q128,
             |  0 AS dc_offset_ppm,
             |  true AS envelope_uniform
             |FROM documents WHERE doc_id < 200 ORDER BY id""".stripMargin)),

    Q("mm4_frame_sample",  // REAL multi-frame decode through javax.imageio:
      // each doc gets a deterministic animated GIF (4-6 solid grayscale
      // frames, shade a closed-form function of (doc_id, frame)), flows
      // through the explode-shaped sampleFrameFeatures (every 2nd frame,
      // re-encoded PNG, re-decoded for features), and must come back with
      // exactly the sampled frame count and the exact per-frame gray the
      // oracle derives arithmetically — an end-to-end proof that real GIF
      // frames (not stub byte slices) flowed through the video pipeline.
      (s, dir) => {
        val gif = udf((id: Long) => animatedGif(
          (0 until (4 + (id % 3).toInt)).map { i =>
            val v = ((id * 3 + i) % 256).toInt
            (v << 16) | (v << 8) | v
          }))
        graft.llm.Multimodal.sampleFrameFeatures(
            t(s, dir, "documents").filter(col("doc_id") < 100)
              .withColumn("media", gif(col("doc_id"))),
            "doc_id", "media", everyN = 2)
          .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
            // solid gray frame: meanR·255 is the exact shade
            round(element_at(col("features"), 1).cast("double") * 255, 0)
              .cast("long").as("gray"))
          .orderBy("id", "frame_idx")
      },
      Some("""SELECT d.doc_id AS id, CAST(k.k AS BIGINT) AS frame_idx,
             |  CAST((d.doc_id*3 + 2*k.k) % 256 AS BIGINT) AS gray
             |FROM documents d JOIN (VALUES (0),(1),(2)) AS k(k)
             |  ON k.k <= (4 + d.doc_id % 3 + 1) // 2 - 1
             |WHERE d.doc_id < 100
             |ORDER BY id, frame_idx""".stripMargin)),

    Q("mm5_mp4_meta",  // REAL ISO-BMFF box parse: each doc gets a minimal
      // mp4 built byte-for-byte from the public spec's box layout
      // (timescale 600, duration 600·doc_id, 1+doc_id%3 tracks with
      // rotating codec fourccs), flows through the distributed
      // mapPartitions parse, and must come back with exactly the
      // duration/track-count/codec list the oracle derives arithmetically
      // — frame DECODE stays behind the documented stub (no JDK mp4
      // codec), but the metadata a pipeline filters and routes on comes
      // from the actual file structure.
      (s, dir) => {
        val codecNames = Seq("avc1", "mp4a", "mp4v")
        val mp4 = udf((id: Long) => miniMp4(600L, id * 600L,
          (0 until (1 + (id % 3).toInt)).map(t => codecNames(((id + t) % 3).toInt))))
        graft.llm.Multimodal.extractMp4Meta(
            t(s, dir, "documents").filter(col("doc_id") < 200)
              .withColumn("media", mp4(col("doc_id"))),
            "doc_id", "media")
          .select(col("id"), col("major_brand"),
            col("duration_ms"), col("track_count").cast("long").as("track_count"),
            array_join(col("codecs"), ",").as("codecs"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, 'isom' AS major_brand,
             |  CAST(doc_id * 1000 AS BIGINT) AS duration_ms,
             |  CAST(1 + doc_id % 3 AS BIGINT) AS track_count,
             |  ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(1 + doc_id % 3),
             |    t -> ['avc1','mp4a','mp4v'][CAST((doc_id + t) % 3 AS INT) + 1]),
             |    ',') AS codecs
             |FROM documents WHERE doc_id < 200 ORDER BY id""".stripMargin)),

    Q("mm8_audio_windows",  // REAL windowed audio decode: the same square-wave
      // WAVs as mm3 (amplitude and half-period closed-form in doc_id) split
      // into two 840-sample windows; every half-period H in 4..7 divides
      // 840 and 2H divides 840, so per-window RMS/peak/crossings/DC are the
      // same exact integers as the whole-clip features — proving the
      // windower slices real PCM, not bytes
      (s, dir) => {
        val wav = udf((id: Long) => squareWav(
          ((id % 127).toInt + 1) * 256, 4 + (id % 4).toInt, 1680))
        graft.llm.Multimodal.sampleAudioWindows(
            t(s, dir, "documents").filter(col("doc_id") < 200)
              .withColumn("media", wav(col("doc_id"))),
            "doc_id", "media", windowSamples = 840)
          .select(col("id"), col("window_idx").cast("long").as("window_idx"),
            col("n_samples").cast("long").as("n_samples"),
            round(element_at(col("features"), 1).cast("double") * 128, 0)
              .cast("long").as("rms_q128"),
            element_at(col("features"), 2).cast("long").as("zero_crossings"),
            round(element_at(col("features"), 4).cast("double") * 1000000, 0)
              .cast("long").as("dc_offset_ppm"))
          .orderBy("id", "window_idx")
      },
      Some("""SELECT d.doc_id AS id, CAST(k.k AS BIGINT) AS window_idx,
             |  CAST(840 AS BIGINT) AS n_samples,
             |  doc_id % 127 + 1 AS rms_q128,
             |  840 // (4 + doc_id % 4) - 1 AS zero_crossings,
             |  0 AS dc_offset_ppm
             |FROM documents d JOIN (VALUES (0),(1)) AS k(k) ON true
             |WHERE doc_id < 200 ORDER BY id, window_idx""".stripMargin)),

    Q("mm6_avi_frames",  // REAL video frame decode end-to-end: each doc gets
      // a deterministic AVI (3-5 solid-gray uncompressed-DIB frames, shade a
      // closed-form function of (doc_id, frame)), the RIFF demux extracts
      // every `00db` chunk and wraps it into a lossless BMP, the sampled
      // frames re-decode through javax.imageio, and the per-frame gray must
      // match the oracle EXACTLY (DIB→BMP is lossless, unlike MJPEG) — the
      // first non-stub frame path for a true video container.
      (s, dir) => {
        val avi = udf((id: Long) => miniAvi(
          (0 until (3 + (id % 3).toInt)).map(f => ((id * 3 + 5 * f) % 256).toInt)))
        graft.llm.Multimodal.sampleFrameFeatures(
            t(s, dir, "documents").filter(col("doc_id") < 100)
              .withColumn("media", avi(col("doc_id"))),
            "doc_id", "media", everyN = 2)
          .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
            round(element_at(col("features"), 1).cast("double") * 255, 0)
              .cast("long").as("gray"))
          .orderBy("id", "frame_idx")
      },
      Some("""SELECT d.doc_id AS id, CAST(k.k AS BIGINT) AS frame_idx,
             |  CAST((d.doc_id*3 + 10*k.k) % 256 AS BIGINT) AS gray
             |FROM documents d JOIN (VALUES (0),(1),(2)) AS k(k)
             |  ON k.k <= (3 + d.doc_id % 3 + 1) // 2 - 1
             |WHERE d.doc_id < 100
             |ORDER BY id, frame_idx""".stripMargin)),

    Q("mm7_avi_meta",  // REAL RIFF header parse: handler fourcc, duration,
      // dimensions and frame count from the avih/strh headers of the same
      // deterministic AVI — the route-and-filter metadata for video the way
      // mm5 is for ISO-BMFF.
      (s, dir) => {
        val avi = udf((id: Long) => miniAvi(
          (0 until (3 + (id % 3).toInt)).map(f => ((id * 3 + 5 * f) % 256).toInt)))
        graft.llm.Multimodal.extractAviMeta(
            t(s, dir, "documents").filter(col("doc_id") < 200)
              .withColumn("media", avi(col("doc_id"))),
            "doc_id", "media")
          .select(col("id"), col("handler"), col("duration_ms"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, 'DIB ' AS handler,
             |  CAST(40 * (3 + doc_id % 3) AS BIGINT) AS duration_ms,
             |  CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
             |  CAST(3 + doc_id % 3 AS BIGINT) AS n_frames
             |FROM documents WHERE doc_id < 200 ORDER BY id""".stripMargin)),

    // ---- EV*: event/streaming layer (batch-equivalent of the Structured
    //      Streaming transforms; streaming execution tested in specs) ----
    Q("ev1_tumbling_window",
      (s, dir) => graft.streaming.Events.tumblingStats(t(s, dir, "events"), "1 hour")
        .orderBy(col("window_start"), col("event_type")),
      Some(s"""SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS window_start,
              |  event_type, COUNT(*) AS n, ${DSUM("value")} AS total_value
              |FROM events GROUP BY 1, 2
              |ORDER BY window_start, event_type""".stripMargin)),

    Q("ev2_sessionize",
      (s, dir) => graft.streaming.Events.sessionizeBatch(t(s, dir, "events"), 30)
        .groupBy("user_id")
        .agg(max(col("session_seq")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id"),
      Some("""SELECT user_id, CAST(MAX(session_seq) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
             |FROM (
             |  SELECT user_id,
             |    SUM(CASE WHEN prev_ts IS NULL
             |             OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000
             |        THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS session_seq
             |  FROM (SELECT user_id, ts, event_id,
             |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |        FROM events) a) b
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("ev3_dedup_keep_first",
      (s, dir) => graft.streaming.Events.dedupKeepFirstBatch(
          t(s, dir, "events"), Seq("user_id", "event_type"))
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, event_id FROM (
             |  SELECT user_id, event_type, event_id,
             |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             |                       ORDER BY ts, event_id) AS rn
             |  FROM events) x
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    Q("ev6_range_join",
      // interval containment via granule bucketing (ops.Relational.rangeJoin)
      // — candidates co-locate under a (user, granule) equi-join, never a
      // theta/cross join; DuckDB computes the same containment directly
      (s, dir) => {
        val ev = t(s, dir, "events")
        val views = ev.filter(col("event_type") === "view" && col("user_id") < 50)
          .select(col("event_id").as("v_id"), col("user_id"), col("ts"))
        val windows = ev.filter(col("event_type") === "purchase" && col("user_id") < 50)
          .select(col("event_id").as("p_id"), col("user_id"),
            col("ts").as("lo"), (col("ts") + expr("INTERVAL 2 HOURS")).as("hi"))
        Relational.rangeJoin(views, windows, "user_id", "ts", "lo", "hi")
          .groupBy("p_id")
          .agg(count(lit(1)).as("n_views"), min(col("v_id")).as("first_view"))
          .orderBy("p_id")
      },
      Some("""WITH v AS (SELECT event_id AS v_id, user_id, ts FROM events
             |           WHERE event_type = 'view' AND user_id < 50),
             |     p AS (SELECT event_id AS p_id, user_id, ts AS lo,
             |                  ts + INTERVAL 2 HOUR AS hi FROM events
             |           WHERE event_type = 'purchase' AND user_id < 50)
             |SELECT p_id, CAST(COUNT(*) AS BIGINT) AS n_views,
             |       MIN(v_id) AS first_view
             |FROM v JOIN p ON v.user_id = p.user_id AND v.ts >= p.lo
             |  AND v.ts <= p.hi
             |GROUP BY p_id ORDER BY p_id""".stripMargin)),

    Q("ev4_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts")
          .agg(max(col("event_id")).as("v_event_id"))
        Relational.asOfJoin(purchases, views, "user_id", "ts", "ts",
            Seq("v_event_id"))
          .select("event_id", "user_id", "asof_v_event_id")
          .orderBy("event_id")
      },
      Some("""WITH v AS (SELECT user_id, ts, MAX(event_id) AS v_event_id
             |           FROM events WHERE event_type = 'view'
             |           GROUP BY user_id, ts),
             |     p AS (SELECT user_id, ts, event_id FROM events
             |           WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, v.v_event_id AS asof_v_event_id
             |FROM p ASOF LEFT JOIN v
             |  ON p.user_id = v.user_id AND v.ts <= p.ts
             |ORDER BY p.event_id""".stripMargin)),

    Q("ev5_sliding_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT ws AS window_start, event_type, COUNT(*) AS n FROM (
             |  SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS ws, event_type FROM events
             |  UNION ALL
             |  SELECT TIME_BUCKET(INTERVAL '1 hour', ts, INTERVAL '30 minutes') AS ws,
             |         event_type FROM events) x
             |GROUP BY ws, event_type ORDER BY window_start, event_type""".stripMargin)),

    Q("so4_union_by_name",
      (s, dir) => Relational.unionByName(
          t(s, dir, "customer").select(col("c_custkey").as("key"), col("c_name").as("name")),
          t(s, dir, "supplier").select(col("s_name").as("name"), col("s_suppkey").as("key"),
            col("s_acctbal").as("bal")))
        .orderBy(asc_nulls_first("key"), asc_nulls_first("name"), asc_nulls_first("bal")),
      Some("""SELECT * FROM (
             |  SELECT c_custkey AS key, c_name AS name, NULL::DOUBLE AS bal FROM customer
             |  UNION ALL BY NAME
             |  SELECT s_name AS name, s_suppkey AS key, s_acctbal AS bal FROM supplier)
             |ORDER BY key NULLS FIRST, name NULLS FIRST, bal NULLS FIRST""".stripMargin)),

    // ---- composite: TPC-H Q3/Q5 shapes (join trees + agg + top-k) ----
    Q("q_tpch_q5",
      (s, dir) => t(s, dir, "region").filter(col("r_name") === "ASIA")
        .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc),
      Some(s"""SELECT n_name,
              |  ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM region
              |JOIN nation ON n_regionkey = r_regionkey
              |JOIN customer ON c_nationkey = n_nationkey
              |JOIN orders ON o_custkey = c_custkey
              |JOIN lineitem ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
              |WHERE r_name = 'ASIA'
              |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    Q("q_tpch_q6",  // TPC-H Q6 shape: pure filter + ungrouped aggregate —
      // the plan must be scan (pushed range filters) -> partial+final agg,
      // no shuffle beyond the single-row exchange
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue")),
      Some(s"""SELECT ${DSUM("l_extendedprice * l_discount")} AS revenue
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |  AND l_shipdate < TIMESTAMP '1998-01-01'
              |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    Q("q_tpch_q12",  // TPC-H Q12 shape: join + CONDITIONAL aggregation
      // (CASE inside SUM) — priority-class line counts per return flag
      (s, dir) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-06-01'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q_tpch_q17",  // TPC-H Q17 shape: CORRELATED scalar subquery (per-part
      // 20%-of-average threshold) — Catalyst must decorrelate it into an
      // aggregate join, never a per-row re-execution or a cartesian. The
      // inner average is written sum/count through decimal so both engines
      // compute the identical double. (No p_container in the testdata part
      // table; brand alone plays its selective role.)
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        t(s, dir, "part").createOrReplaceTempView("part")
        s.sql("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
                |  AS avg_yearly
                |FROM lineitem JOIN part ON p_partkey = l_partkey
                |WHERE p_brand = 'Brand#13'
                |  AND l_quantity < (
                |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6)))
                |      AS DOUBLE) / COUNT(*))
                |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
             |  AS avg_yearly
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#13'
             |  AND l_quantity < (
             |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6)))
             |      AS DOUBLE) / COUNT(*))
             |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)),

    Q("q_tpch_q20",  // TPC-H Q20 shape: nested IN subqueries with a
      // correlated scalar aggregate at the core — decorrelation must turn
      // the INs into semi joins and the correlated average into an
      // aggregate join (adapted to the testdata: no partsupp table, so
      // lineitem plays the availability side keyed by (part, supplier))
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        t(s, dir, "part").createOrReplaceTempView("part")
        t(s, dir, "supplier").createOrReplaceTempView("supplier")
        t(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""SELECT s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
                |WHERE n_name IN ('NATION_3','NATION_8','NATION_12','NATION_13','NATION_15')
                |AND s_suppkey IN (
                |  SELECT l1.l_suppkey FROM lineitem l1
                |  WHERE l1.l_partkey IN
                |      (SELECT p_partkey FROM part WHERE p_name LIKE 'cold%')
                |    AND l1.l_quantity > (
                |      SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6)))
                |        AS DOUBLE) / COUNT(*))
                |      FROM lineitem l2
                |      WHERE l2.l_partkey = l1.l_partkey
                |        AND l2.l_suppkey = l1.l_suppkey))
                |ORDER BY s_name""".stripMargin)
      },
      Some("""SELECT s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name IN ('NATION_3','NATION_8','NATION_12','NATION_13','NATION_15')
             |AND s_suppkey IN (
             |  SELECT l1.l_suppkey FROM lineitem l1
             |  WHERE l1.l_partkey IN
             |      (SELECT p_partkey FROM part WHERE p_name LIKE 'cold%')
             |    AND l1.l_quantity > (
             |      SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6)))
             |        AS DOUBLE) / COUNT(*))
             |      FROM lineitem l2
             |      WHERE l2.l_partkey = l1.l_partkey
             |        AND l2.l_suppkey = l1.l_suppkey))
             |ORDER BY s_name""".stripMargin)),

    Q("q_tpch_q18",  // TPC-H Q18 shape: groupBy-HAVING subquery feeding an
      // IN — Catalyst must plan the HAVING aggregate once and semi-join it
      // into the 3-table join tree (never re-aggregate per probe row).
      // Threshold 250 keeps the filter selective but non-empty at every SF.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
                |FROM customer JOIN orders ON c_custkey = o_custkey
                |JOIN lineitem ON o_orderkey = l_orderkey
                |WHERE o_orderkey IN (
                |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250)
                |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
                |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
                |LIMIT 100""".stripMargin)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey IN (
             |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
             |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250)
             |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
             |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
             |LIMIT 100""".stripMargin)),

    Q("q_tpch_q21",  // TPC-H Q21 shape: correlated EXISTS + NOT EXISTS over
      // self-joined lineitem with a NON-EQUI residual (other supplier, same
      // order) — must decorrelate to a left-semi and a left-anti join on
      // l_orderkey, never a per-row subquery or cartesian. Adapted to the
      // testdata (no receipt/commit dates): "late" = l_returnflag 'R', so
      // the query finds suppliers who were the ONLY flagged supplier on a
      // multi-supplier finished order.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        t(s, dir, "supplier").createOrReplaceTempView("supplier")
        t(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""SELECT s_name, COUNT(*) AS numwait
                |FROM supplier
                |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                |JOIN orders ON o_orderkey = l1.l_orderkey
                |JOIN nation ON s_nationkey = n_nationkey
                |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
                |  AND EXISTS (SELECT 1 FROM lineitem l2
                |    WHERE l2.l_orderkey = l1.l_orderkey
                |      AND l2.l_suppkey <> l1.l_suppkey)
                |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                |    WHERE l3.l_orderkey = l1.l_orderkey
                |      AND l3.l_suppkey <> l1.l_suppkey
                |      AND l3.l_returnflag = 'R')
                |GROUP BY s_name
                |ORDER BY numwait DESC, s_name
                |LIMIT 100""".stripMargin)
      },
      Some("""SELECT s_name, COUNT(*) AS numwait
             |FROM supplier
             |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey
             |      AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |    WHERE l3.l_orderkey = l1.l_orderkey
             |      AND l3.l_suppkey <> l1.l_suppkey
             |      AND l3.l_returnflag = 'R')
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name
             |LIMIT 100""".stripMargin)),

    // ---- the rest of the TPC-H suite (q2..q22), adapted to the testdata
    //      schema: no partsupp table (lineitem plays the part↔supplier
    //      availability side, unit cost = l_extendedprice / l_quantity,
    //      supply cost proxy = p_retailprice), no receipt/commit dates
    //      ("late" = l_returnflag 'R'), no c_phone (c_nationkey plays the
    //      country code). Spark side and oracle are the SAME SQL text. ----

    sqlQ("q_tpch_q2",  // Q2 shape: correlated scalar MIN subquery over a
      // 5-table join — Catalyst must decorrelate into an aggregate join on
      // p_partkey (never per-row re-execution); both sides of the equality
      // are IEEE double division of identical inputs, so the match set is
      // engine-independent.
      Seq("part", "lineitem", "supplier", "nation", "region"),
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size <= 5 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        |  AND l_extendedprice / l_quantity = (
        |    SELECT MIN(l2.l_extendedprice / l2.l_quantity)
        |    FROM lineitem l2
        |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_name
        |LIMIT 100""".stripMargin),

    sqlQ("q_tpch_q4",  // Q4 shape: EXISTS over lineitem per order — must
      // plan as one left-semi join on l_orderkey, not a per-row probe.
      Seq("orders", "lineitem"),
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    sqlQ("q_tpch_q7",  // Q7 shape: two roles of the same dimension (nation
      // joined twice under different aliases) + disjunctive pair filter +
      // year extraction; the nation sides must both broadcast.
      Seq("supplier", "lineitem", "orders", "customer", "nation"),
      s"""SELECT supp_nation, cust_nation, l_year, ${DSUM("volume")} AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         |         l_extendedprice * (1.0 - l_discount) AS volume
         |  FROM supplier
         |  JOIN lineitem ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_9')
         |      OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_5'))
         |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
         |                       AND TIMESTAMP '1997-12-31'
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    sqlQ("q_tpch_q8",  // Q8 shape: market share — a ratio of two exact
      // conditional sums over an 8-table snowflake; nation appears twice
      // (customer region gate vs supplier attribution).
      Seq("part", "lineitem", "supplier", "orders", "customer", "nation",
        "region"),
      s"""SELECT o_year,
         |  ${DSUM("CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END")}
         |    / ${DSUM("volume")} AS mkt_share
         |FROM (
         |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         |         l_extendedprice * (1.0 - l_discount) AS volume,
         |         n2.n_name AS nation
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
         |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
         |                        AND TIMESTAMP '1997-12-31'
         |) all_nations
         |GROUP BY o_year ORDER BY o_year""".stripMargin),

    sqlQ("q_tpch_q9",  // Q9 shape: profit attribution by supplier nation ×
      // order year, part filtered by an infix LIKE (not prefix-rewritable —
      // must still prune columns and broadcast part). Supply cost proxied
      // by p_retailprice (no partsupp in the testdata).
      Seq("part", "lineitem", "supplier", "orders", "nation"),
      s"""SELECT nation, o_year, ${DSUM("amount")} AS sum_profit
         |FROM (
         |  SELECT n_name AS nation,
         |         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         |         l_extendedprice * (1.0 - l_discount)
         |           - 0.1 * p_retailprice * l_quantity AS amount
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%rod%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin),

    sqlQ("q_tpch_q10",  // Q10 shape: returned-item reporting — wide group
      // key (whole customer row) + revenue top-20; the group key includes
      // the unique c_custkey so the DESC-limit tiebreak is deterministic.
      Seq("customer", "orders", "lineitem", "nation"),
      s"""SELECT c_custkey, c_name,
         |  ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  c_acctbal, n_name
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),

    sqlQ("q_tpch_q11",  // Q11 shape: group-HAVING against a scalar subquery
      // that re-aggregates the SAME relation — the planner must evaluate
      // the global total once (one extra scan), never per group.
      Seq("lineitem", "supplier", "nation", "region"),
      s"""SELECT l_partkey AS ps_partkey,
         |  ${DSUM("l_extendedprice * l_quantity")} AS value
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY l_partkey
         |HAVING ${DSUM("l_extendedprice * l_quantity")} > (
         |  SELECT ${DSUM("l_extendedprice * l_quantity")} * 0.001
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA')
         |ORDER BY value DESC, ps_partkey""".stripMargin),

    sqlQ("q_tpch_q13",  // Q13 shape: LEFT OUTER join with an extra ON-side
      // filter (must stay in the join condition, not become a WHERE that
      // would turn the join inner) + double aggregation (per-customer count
      // → count histogram).
      Seq("customer", "orders"),
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    sqlQ("q_tpch_q14",  // Q14 shape: promo share — ratio of a conditional
      // sum to a total sum in one ungrouped aggregate over one scan.
      Seq("lineitem", "part"),
      s"""SELECT 100.00 *
         |  ${DSUM("CASE WHEN p_type = 'PROMO' " +
           "THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END")}
         |  / ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin),

    sqlQ("q_tpch_q15",  // Q15 shape: top supplier — the revenue aggregate
      // appears twice (once as the join input, once under MAX); equality on
      // doubles is safe because both instances are the same exact decimal
      // sum. (TPC-H's CREATE VIEW spelled as an inline subquery.)
      Seq("supplier", "lineitem"),
      s"""SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN (
         |  SELECT l_suppkey AS supplier_no,
         |    ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey) revenue0 ON s_suppkey = supplier_no
         |WHERE total_revenue = (
         |  SELECT MAX(total_revenue) FROM (
         |    SELECT l_suppkey AS supplier_no,
         |      ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |    FROM lineitem
         |    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |      AND l_shipdate < TIMESTAMP '1997-04-01'
         |    GROUP BY l_suppkey) r)
         |ORDER BY s_suppkey""".stripMargin),

    sqlQ("q_tpch_q16",  // Q16 shape: distinct-supplier counting per part
      // attribute bucket with a NOT IN anti-join on the supplier exclusion
      // list (null-free key, so a plain anti join is the right plan).
      Seq("lineitem", "part", "supplier"),
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),

    sqlQ("q_tpch_q19",  // Q19 shape: three disjunctive brand/size/quantity
      // branches — the part filter must still push into the join (Catalyst
      // extracts the common p_partkey equi-key; the OR residual evaluates
      // post-join), and the whole thing is one scan pair, no union.
      Seq("lineitem", "part"),
      s"""SELECT ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity >= 1 AND l_quantity <= 11)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity >= 10 AND l_quantity <= 20)
         |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin),

    sqlQ("q_tpch_q22",  // Q22 shape: anti-join (customers with no recent
      // orders) against a scalar average computed over a DIFFERENT slice of
      // the same table — both subqueries must plan once. c_nationkey plays
      // the country code (no c_phone in the testdata); "never ordered"
      // tightened to "not since 2001" because every generated customer has
      // at least one order.
      Seq("customer", "orders"),
      s"""SELECT cntrycode, COUNT(*) AS numcust,
         |  ${DSUM("c_acctbal")} AS totacctbal
         |FROM (
         |  SELECT c_nationkey AS cntrycode, c_acctbal
         |  FROM customer
         |  WHERE c_nationkey IN (3, 8, 12, 17, 21)
         |    AND c_acctbal > (
         |      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6)))
         |        AS DOUBLE) / COUNT(*)
         |      FROM customer c2
         |      WHERE c2.c_acctbal > 0.0
         |        AND c2.c_nationkey IN (3, 8, 12, 17, 21))
         |    AND NOT EXISTS (SELECT 1 FROM orders
         |      WHERE o_custkey = c_custkey
         |        AND o_orderdate >= TIMESTAMP '2001-01-01')
         |) custsale
         |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin),

    // ---- composite: TPC-H Q3 shape (join tree + agg + top-k) ----
    Q("q_tpch_q3",
      (s, dir) => t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10),
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
              |  ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |JOIN lineitem ON l_orderkey = o_orderkey
              |  AND l_shipdate > TIMESTAMP '1998-01-01'
              |WHERE c_mktsegment = 'BUILDING'
              |GROUP BY l_orderkey, o_orderdate, o_orderpriority
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // ---- X*: wire-IR expression vocabulary (SURVEY §2.9 — Cast, CaseWhen,
    //      ArraySubscript/Slice, MapKey, LiteralRelation) ----
    Q("x1_cast_case",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          // the arithmetic stays integral until it's decimal (floor of a
          // double < 2^53 is exact, long→decimal exact, decimal*0.01 exact),
          // and the COMPARED value is the decimal's canonical string: the
          // harness renders a parquet decimal as Decimal('230.50') but a
          // DuckDB DECIMAL as float 230.5, so equal decimal VALUES still
          // hash-diverge on trailing zeros. decimal→string keeps the scale
          // ("230.50") identically in both engines.
          (floor(col("o_totalprice") * 100).cast("decimal(18,0)")
            * lit(java.math.BigDecimal.valueOf(1L, 2)))
            .cast("decimal(18,2)").cast("string").as("price_dec"),
          col("o_orderkey").cast("string").as("key_str"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(CAST(CAST(FLOOR(o_totalprice * 100) AS DECIMAL(18,0)) * 0.01
             |       AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
             |  CAST(o_orderkey AS VARCHAR) AS key_str,
             |  CASE WHEN o_totalprice > 300000 THEN 'high'
             |       WHEN o_totalprice > 100000 THEN 'mid'
             |       ELSE 'low' END AS bucket
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("x2_array_ops",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          element_at(split(col("text"), " "), 1).as("first_word"),
          concat_ws(" ", slice(split(col("text"), " "), 2, 3)).as("words_2_to_4"),
          size(split(col("text"), " ")).as("n_words"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  STRING_SPLIT(text, ' ')[1] AS first_word,
             |  ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[2:4], ' ') AS words_2_to_4,
             |  LEN(STRING_SPLIT(text, ' ')) AS n_words
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("x3_map_key",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          element_at(from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType)), "k").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    Q("x5_string_funcs",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          trim(col("p_name")).as("tr"),
          substring(col("p_name"), 1, 4).as("sub4"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          length(col("p_type")).as("type_len"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_name) AS up, TRIM(p_name) AS tr,
             |  SUBSTRING(p_name, 1, 4) AS sub4,
             |  REPLACE(p_name, ' ', '_') AS snake,
             |  LPAD(p_brand, 12, '*') AS padded,
             |  LENGTH(p_type) AS type_len
             |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("x6_datetime_funcs",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).as("days_to_2002"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
             |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
             |  CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
             |  CAST(o_orderdate AS DATE) + 30 AS plus30,
             |  CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
             |    AS days_to_2002
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("x4_literal_relation",
      (s, _) => {
        import s.implicits._
        Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
          .toDF("id", "label").orderBy("id")
      },
      Some("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'alpha'),
             |  (CAST(2 AS BIGINT), 'beta'), (CAST(3 AS BIGINT), 'gamma'))
             |  t(id, label) ORDER BY id""".stripMargin)),

    // ---- PII*: detection/redaction (llm.Pii) — synthetic documents carry
    // no real PII, so both sides INJECT the same deterministic contact
    // strings (keyed off doc_id) and must then agree exactly on counts
    // (pii1) and on the redacted text (pii2). The oracle SQL is BUILT from
    // Pii.patterns, so pattern edits can't drift the two sides apart.
    Q("pii1_detect",
      (s, dir) => graft.llm.Pii.detect(
          piiInjected(t(s, dir, "documents").filter(col("doc_id") < 600)), "t")
        .filter(col("has_pii"))
        .select(Seq(col("doc_id")) ++
          graft.llm.Pii.patterns.map { case (k, _) =>
            col(s"n_$k").cast("long").as(s"n_$k") }: _*)
        .orderBy("doc_id"),
      Some {
        val counts = graft.llm.Pii.patterns.map { case (k, pat) =>
          s"LEN(regexp_extract_all(t, '$pat')) AS n_$k" }.mkString(",\n  ")
        val any = graft.llm.Pii.patterns.map(p => s"n_${p._1} > 0").mkString(" OR ")
        s"""WITH inj AS ($piiInjectSql),
           |c AS (SELECT doc_id,
           |  $counts
           |FROM inj)
           |SELECT * FROM c WHERE $any ORDER BY doc_id""".stripMargin
      }),

    Q("pii2_redact",
      (s, dir) => graft.llm.Pii.redact(
          piiInjected(t(s, dir, "documents").filter(col("doc_id") < 600)), "t")
        .filter(col("t") =!= col("text_redacted"))
        .select("doc_id", "text_redacted")
        .orderBy("doc_id"),
      Some {
        // nested regexp_replace in the SAME specific→general order as
        // Pii.redact's foldLeft ('g' = replace all, Spark's default)
        val replaced = graft.llm.Pii.patterns.foldLeft("t") {
          case (expr, (k, pat)) =>
            s"regexp_replace($expr, '$pat', '${graft.llm.Pii.placeholder(k)}', 'g')"
        }
        s"""WITH inj AS ($piiInjectSql)
           |SELECT doc_id, $replaced AS text_redacted
           |FROM inj WHERE t <> $replaced ORDER BY doc_id""".stripMargin
      }),

    // ---- BP/CH*: corpus cleaning + context-window prep (llm.Curation) ----
    Q("bp1_boilerplate",  // C4-style line removal: both sides append the
      // same newsletter/footer lines (newline-separated) to the single-line
      // synthetic docs, then lines in ≥ 50 distinct docs must vanish while
      // per-doc footer lines and the original text survive — exact parity
      (s, dir) => graft.llm.Curation.removeBoilerplateLines(
          bpInjected(t(s, dir, "documents").filter(col("doc_id") < 500))
            .select(col("doc_id"), col("t").as("text")),
          "doc_id", "text", minDocs = 50)
        .select(col("doc_id"), col("text").as("text_clean"))
        .orderBy("doc_id"),
      Some(s"""WITH inj AS ($bpInjectSql),
              |d AS (SELECT doc_id, STRING_SPLIT(t, chr(10)) AS l FROM inj),
              |ln AS (SELECT doc_id, l, UNNEST(RANGE(1, LEN(l) + 1)) AS pos FROM d),
              |lx AS (SELECT doc_id, pos, l[pos] AS line FROM ln),
              |boiler AS (SELECT line FROM (
              |  SELECT line, COUNT(DISTINCT doc_id) AS df FROM lx GROUP BY line
              |) WHERE df >= 50),
              |agg AS (SELECT doc_id, STRING_AGG(line, chr(10) ORDER BY pos) AS tc
              |        FROM lx WHERE line NOT IN (SELECT line FROM boiler)
              |        GROUP BY doc_id)
              |SELECT i.doc_id, COALESCE(tc, '') AS text_clean
              |FROM inj i LEFT JOIN agg USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    Q("ch1_chunking",  // token-window chunking: 32-token windows every 24
      // tokens (8-token overlap); DuckDB recomputes the same window starts
      // and list slices — exact chunk text, index, and length parity
      (s, dir) => graft.llm.Curation.chunkByTokens(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", chunkTokens = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH d AS (
             |  SELECT * FROM (
             |    SELECT doc_id, STRING_SPLIT(text, ' ') AS l
             |    FROM documents WHERE doc_id < 300)
             |  WHERE NOT (LEN(l) = 1 AND l[1] = '')  -- empty doc: no chunks
             |), s AS (
             |  SELECT doc_id, l,
             |    UNNEST(RANGE(0, GREATEST(LEN(l) - 1, 0) + 1, 24)) AS st
             |  FROM d
             |)
             |SELECT doc_id, st // 24 AS chunk_idx,
             |  CAST(LEAST(LEN(l) - st, 32) AS BIGINT) AS n_tokens,
             |  ARRAY_TO_STRING(l[st + 1 : st + 32], ' ') AS chunk_text
             |FROM s ORDER BY doc_id, chunk_idx""".stripMargin)),

    Q("ch2_packing",  // boundary packing of the ch1 chunks into 512-token
      // packs: pack = prefix-tokens-before div 512 over the (doc_id,
      // chunk_idx) order. Spark computes the prefix sum two-level (bucketed
      // window + per-bucket offsets); DuckDB's single global window must
      // produce the IDENTICAL assignment — the parity proves the
      // decomposition exact, not just plausible
      (s, dir) => {
        val chunks = graft.llm.Curation.chunkByTokens(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", chunkTokens = 32, stride = 24)
        graft.llm.Curation.packByBudget(chunks,
            expr("doc_id div 64"),
            Seq("doc_id", "chunk_idx"), "n_tokens", budget = 512)
          .groupBy("pack_id")
          .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("pack_tokens"))
          .orderBy("pack_id")
      },
      Some("""WITH d AS (
             |  SELECT * FROM (
             |    SELECT doc_id, STRING_SPLIT(text, ' ') AS l
             |    FROM documents WHERE doc_id < 300)
             |  WHERE NOT (LEN(l) = 1 AND l[1] = '')  -- empty doc: no chunks
             |), s AS (
             |  SELECT doc_id, l,
             |    UNNEST(RANGE(0, GREATEST(LEN(l) - 1, 0) + 1, 24)) AS st
             |  FROM d
             |), c AS (
             |  SELECT doc_id, st // 24 AS chunk_idx,
             |    CAST(LEAST(LEN(l) - st, 32) AS BIGINT) AS n_tokens
             |  FROM s
             |), p AS (
             |  SELECT n_tokens, CAST(COALESCE(SUM(n_tokens) OVER (
             |    ORDER BY doc_id, chunk_idx
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
             |    AS BIGINT) AS pack_id
             |  FROM c
             |)
             |SELECT pack_id, COUNT(*) AS n_chunks,
             |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
             |FROM p GROUP BY pack_id ORDER BY pack_id""".stripMargin))
  )

  /** Deterministic boilerplate injection for the bp1 gate: appends shared
    * newsletter/rights lines (≥ 50-doc frequency) and a unique per-doc
    * footer. MUST stay in lockstep with `bpInjectSql`. */
  private def bpInjected(d: DataFrame): DataFrame =
    d.withColumn("t", concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        lit("\nsubscribe to our newsletter today")).otherwise(""),
      when(col("doc_id") % 4 === 0,
        lit("\nall rights reserved")).otherwise(""),
      concat(lit("\ndoc footer "), col("doc_id").cast("string"))))

  /** DuckDB spelling of `bpInjected` (`||` at line end — see piiInjectSql). */
  private val bpInjectSql: String =
    "SELECT doc_id, text ||\n" +
    "  CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END ||\n" +
    "  CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'all rights reserved' ELSE '' END ||\n" +
    "  chr(10) || 'doc footer ' || CAST(doc_id AS VARCHAR) AS t\n" +
    "FROM documents WHERE doc_id < 500"

  /** Deterministic PII injection for the pii* gates: appends contact-shaped
    * strings keyed off doc_id (mod different primes, so kinds overlap on
    * some docs and miss on others). MUST stay in lockstep with
    * `piiInjectSql`. */
  private def piiInjected(d: DataFrame): DataFrame =
    d.withColumn("t", concat(
      col("text"),
      when(col("doc_id") % 5 === 0, concat(lit(" reach me at user"),
        col("doc_id").cast("string"), lit("@example.com"))).otherwise(""),
      when(col("doc_id") % 7 === 0, lit(" call 555-123-4567 now")).otherwise(""),
      when(col("doc_id") % 11 === 0, concat(lit(" host 192.168."),
        (col("doc_id") % 256).cast("string"), lit(".42"))).otherwise(""),
      when(col("doc_id") % 13 === 0, concat(lit(" ssn 123-45-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
      when(col("doc_id") % 17 === 0,
        lit(" card 4111 1111 1111 1111")).otherwise("")))

  /** DuckDB spelling of `piiInjected` (same doc set, same strings). Written
    * one-clause-per-line with `||` at LINE END — this string is interpolated
    * into templates that run `.stripMargin` afterwards, which would strip a
    * leading `||` down to `|`. */
  private val piiInjectSql: String =
    "SELECT doc_id, text ||\n" +
    "  CASE WHEN doc_id % 5 = 0 THEN ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||\n" +
    "  CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567 now' ELSE '' END ||\n" +
    "  CASE WHEN doc_id % 11 = 0 THEN ' host 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.42' ELSE '' END ||\n" +
    "  CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||\n" +
    "  CASE WHEN doc_id % 17 = 0 THEN ' card 4111 1111 1111 1111' ELSE '' END AS t\n" +
    "FROM documents WHERE doc_id < 600"

  // ---------- driver contract ----------

  /** Flagship query on sf=0.001 (driver smoke-checks rows > 0):
    * pricing-summary join of the three biggest tables. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("c_mktsegment")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
