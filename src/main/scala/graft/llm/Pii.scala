package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction for training-data pipelines (north-star
 * extension; the reference SDK stops at scan — cleaning happens client-side).
 *
 * Both operators are pure column expressions over codegen'd regexps, so they
 * run map-side in the same stage as the parquet scan: no shuffle, no UDF,
 * linear at 100 TB. The pattern set deliberately uses only portable regex
 * constructs (character classes, bounded repetition, non-capturing groups,
 * ASCII word boundaries) that mean the same thing in Java's engine (Spark)
 * and RE2 (DuckDB/Go scanners), so an oracle on another engine reproduces
 * the exact match set.
 *
 * Detection is count-based per kind (how many emails / phones / …), not a
 * boolean — downstream quality gates want densities ("drop docs with > k
 * emails per kB"), and counts compose into those for free.
 */
object Pii {

  /** Redaction placeholder for a pattern kind: `<EMAIL>`, `<PHONE>`, … */
  def placeholder(kind: String): String = s"<${kind.toUpperCase}>"

  /** Detection/redaction pattern set, in REDACTION ORDER: more specific
    * shapes first (credit card before phone, SSN before phone) so a longer
    * match is never partially consumed by a shorter pattern's placeholder.
    *
    *  - email: local@domain.tld (practical subset of RFC 5322)
    *  - ipv4:  dotted quad (no range check — 999.0.0.1 redacts too; at
    *           corpus scale over-redaction is the conservative direction)
    *  - cc:    16 digits in 4-groups with -/space separators
    *  - ssn:   ddd-dd-dddd
    *  - phone: ddd ddd dddd with -/./space separators
    */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4"  -> "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
    "cc"    -> "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b",
    "ssn"   -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "phone" -> "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b")

  /** Per-kind match count column (`n_email`, `n_ipv4`, …). */
  def countOf(text: Column, kind: String): Column = {
    val pat = patterns.toMap.getOrElse(kind,
      throw new IllegalArgumentException(s"unknown PII kind: $kind"))
    regexp_count(text, lit(pat))
  }

  /** Adds `n_<kind>` count columns for every pattern plus a `has_pii`
    * flag. One codegen stage, no shuffle. */
  def detect(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withCounts = patterns.foldLeft(df) { case (d, (kind, _)) =>
      d.withColumn(s"n_$kind", countOf(col(textCol), kind))
    }
    withCounts.withColumn("has_pii",
      patterns.map(p => col(s"n_${p._1}") > 0).reduce(_ || _))
  }

  /** Replaces every match of every pattern with its `<KIND>` placeholder,
    * in `patterns` order (specific → general, see there). The source column
    * is preserved; the cleaned text lands in `outCol`. */
  def redact(df: DataFrame, textCol: String = "text",
             outCol: String = "text_redacted"): DataFrame = {
    val redacted = patterns.foldLeft(col(textCol)) { case (c, (kind, pat)) =>
      regexp_replace(c, pat, placeholder(kind))
    }
    df.withColumn(outCol, redacted)
  }

  /** Quality-gate helper: PII matches per kilobyte of text — the density
    * downstream filters threshold on (docs that are mostly contact dumps
    * score high; one citation email scores near zero). Kilobyte means
    * BYTES: `octet_length` counts UTF-8 octets, so multi-byte text is not
    * overstated the way a char-count denominator would. */
  def piiDensityPerKb(df: DataFrame, textCol: String = "text"): Column = {
    val total = patterns.map(p => countOf(col(textCol), p._1))
      .reduce(_ + _).cast("double")
    round(total * 1024.0 / greatest(octet_length(col(textCol)), lit(1)), 6)
  }
}
