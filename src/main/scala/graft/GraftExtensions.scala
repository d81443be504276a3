package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/**
 * SparkSessionExtensions entry point — the deployment shape for the engine's
 * custom expressions (`spark.sql.extensions=graft.GraftExtensions`, or
 * `SparkSession.builder().withExtensions(new GraftExtensions)`), so SQL-only
 * users get the vector/text functions without touching the Scala API.
 * `Distances.register` remains for imperative registration on an existing
 * session.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    // NOTE: the changefeed pushdown rule (GraftStreamFilterPushdown) is NOT
    // injected here — GraftStreamScan self-registers it at stream start,
    // which always precedes the first micro-batch's optimization, and a
    // second extension-injected copy would just walk every plan twice
    // (register() can only dedupe against experimental.extraOptimizations).

    def inject(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name, usage), b))

    inject("l2sq", "l2sq(a, b) - squared L2 distance between float arrays") {
      es => L2SquaredDistance(es(0), es(1))
    }
    inject("array_distance", "array_distance(a, b) - squared L2 distance (reference SQL name)") {
      es => L2SquaredDistance(es(0), es(1))
    }
    inject("inner_product", "inner_product(a, b) - dot product of float arrays") {
      es => InnerProduct(es(0), es(1))
    }
    inject("cosine_sim", "cosine_sim(a, b) - cosine similarity of float arrays") {
      es => CosineSimilarity(es(0), es(1))
    }
    inject("minhash_signature", "minhash_signature(tokens, k, n) - k-hash minhash over n-gram shingles") {
      es =>
        val k = es(1).eval().asInstanceOf[Int]
        val n = es(2).eval().asInstanceOf[Int]
        MinHashSignature(es(0), k, n)
    }
    inject("simhash64", "simhash64(tokens) - 64-bit simhash of a word array") {
      es => SimHash64(es(0))
    }

    // ---- text-analysis surface for SQL-only users: the same Catalyst
    // expression trees the Scala API composes, reachable from plain SQL.
    // Composed columns (quality_score & co) round-trip through Glue so the
    // injected function IS the API's tree — one implementation, two doors.
    import org.apache.spark.sql.graftglue.Glue
    def col(e: Expression) = Glue.column(e)

    inject("hash_embedding",
      "hash_embedding(tokens, dim) - L2-normalized hashing-trick bag-of-words embedding") {
      es => HashEmbedding(es(0), es(1).eval().asInstanceOf[Int])
    }
    inject("shingle_hashes",
      "shingle_hashes(tokens, n) - distinct xxhash64 values of the n-gram shingles") {
      es => ShingleHashes(es(0), es(1).eval().asInstanceOf[Int])
    }
    inject("quality_score",
      "quality_score(text) - composite [0,1] quality from length/punct/stopword signals") {
      es => Glue.resolvableExpression(graft.llm.TextAnalysis.qualityScore(col(es(0))))
    }
    inject("langid",
      "langid(text) - stopword-profile language id ('und' when undetermined)") {
      es => Glue.resolvableExpression(graft.llm.TextAnalysis.langId(col(es(0))))
    }
    inject("doc_fingerprint",
      "doc_fingerprint(text) - order-sensitive 64-bit rolling-hash fingerprint") {
      es => Glue.resolvableExpression(graft.llm.TextAnalysis.fingerprint(col(es(0))))
    }
    inject("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC normalization") {
      es => NfcNormalize(es(0))
    }
    inject("pq_adc",
      "pq_adc(codes, lut) - asymmetric-distance lookup of PQ codes against a query LUT") {
      es => PqAdcDistance(es(0), es(1))
    }
    inject("gopher_rules",
      "gopher_rules(text) - struct of Gopher quality-rule booleans + passes") {
      es => Glue.resolvableExpression(graft.llm.TextAnalysis.gopherRules(col(es(0))))
    }
    inject("gopher_repetition",
      "gopher_repetition(text) - struct of Gopher repetition-rule booleans + passes") {
      es => Glue.resolvableExpression(
        graft.llm.TextAnalysis.gopherRepetitionRules(col(es(0))))
    }
    inject("c4_clean",
      "c4_clean(text) - text rewritten to its C4-retained lines") {
      es => Glue.resolvableExpression(
        org.apache.spark.sql.functions.concat_ws("\n",
          graft.llm.Curation.c4KeptLines(col(es(0)))))
    }
    inject("window_hash_pairs",
      "window_hash_pairs(tokens, n, stride) - (h1, h2) rolling-hash pairs per n-token window") {
      es => WindowHashPairs(es(0), es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int])
    }
    inject("url_host",
      "url_host(url) - normalized host (scheme/userinfo/port/path stripped, case-folded)") {
      es => Glue.resolvableExpression(graft.llm.Curation.urlHost(col(es(0))))
    }
  }
}
