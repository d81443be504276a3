package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off parity probe: the native TokenStats fields must equal the HOF
  * formulas they replaced, row-for-row, on real documents data. */
object TokenStatsParityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("token-stats-parity")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    val langProfiles = graft.functions.TokenStats.langProfiles

    val t = col("text")
    val toks = split(t, " ")
    // legacy HOF formulas (pre-TokenStats)
    val oldStop = round(size(filter(toks, w => w.isin(stopwords.map(lit): _*))).cast("double")
      / greatest(size(toks), lit(1)), 6)
    val oldFp = aggregate(toks, lit(0L), (acc, w) => xxhash64(acc, w))
    val oldPunct = round(
      (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("double")
        / greatest(length(t), lit(1)), 6)
    val scored = langProfiles.map { case (lang, words) =>
      struct(
        size(array_intersect(array_distinct(split(lower(t), " ")),
          array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = element_at(sort_array(array(scored: _*), asc = false), 1)
    val oldLang = when(best.getField("score") > 0, best.getField("lang")).otherwise("und")

    val cmp = docs.select(
      col("doc_id"),
      oldStop.as("old_stop"), graft.llm.TextAnalysis.stopwordRatio(t).as("new_stop"),
      oldFp.as("old_fp"), graft.llm.TextAnalysis.fingerprint(t).as("new_fp"),
      oldPunct.as("old_punct"), graft.llm.TextAnalysis.punctRatio(t).as("new_punct"),
      oldLang.as("old_lang"), graft.llm.TextAnalysis.langId(t).as("new_lang"),
      size(toks).as("old_n"), graft.functions.TokenStats.tokenStats(t).getField("n_tokens").as("new_n"))

    val bad = cmp.where(
      !(col("old_stop") <=> col("new_stop")) ||
      !(col("old_fp") <=> col("new_fp")) ||
      !(col("old_punct") <=> col("new_punct")) ||
      !(col("old_lang") <=> col("new_lang")) ||
      !(col("old_n") <=> col("new_n")))
    val n = cmp.count()
    val nBad = bad.count()
    println(s"rows=$n mismatches=$nBad")
    if (nBad > 0) { bad.show(20, truncate = false); sys.exit(1) }
    println("PARITY OK")
    spark.stop()
  }
}
