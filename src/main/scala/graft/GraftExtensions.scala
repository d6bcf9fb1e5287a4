package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** `SparkSessionExtensions` entry point: wire the engine's custom
  * expressions into any session via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — the standard deployment path
  * for a Spark-native library on a shared cluster (no code changes in
  * the user's jobs, functions visible from pure SQL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name, usage), b))

    inject("cosine_sim", "cosine similarity of two numeric arrays") {
      exprs => CosineSimExpr(exprs(0), exprs(1))
    }
    inject("shingles3", "distinct word 3-gram shingles") {
      exprs => ShinglesExpr(exprs.head, 3)
    }
    inject("hash60_array", "portable md5-based 60-bit hash per element") {
      exprs => Hash60ArrayExpr(exprs.head)
    }
    inject("doc_fingerprint", "md5 of the sorted shingle set") {
      exprs => FingerprintExpr(exprs.head)
    }
    inject("lsh_bucket8", "8-plane random-hyperplane LSH bucket") {
      exprs => LshBucketExpr(exprs.head, 8)
    }
    inject("json_explode", "explode a heterogeneous JSON cell") {
      exprs => JsonExplodeExpr(exprs.head)
    }
    inject("variant_explode", "explode a variant cell") {
      exprs => VariantExplodeExpr(exprs.head)
    }
    inject("minhash_sigs16", "16-component MinHash signature of a hash array") {
      exprs => MinHashSigsExpr(exprs.head, 16)
    }
    inject("minhash_buckets", "8 LSH band bucket hashes of a hash array") {
      exprs => MinHashBucketsExpr(exprs.head, numHashes = 16, bands = 8)
    }
    inject("simhash16", "16-bit SimHash of a hash array") {
      exprs => SimHashExpr(exprs.head, 16)
    }
    inject("simhash_bands", "SimHash band structs for inline()") {
      exprs => SimHashBandsExpr(exprs.head, bits = 16, bands = 4)
    }
    inject("token_stats", "whitespace/regex-class token counts in one scan") {
      exprs => TokenStatsExpr(exprs.head)
    }
    inject("image_dims",
      "struct(format,width,height) from PNG/JPEG/GIF/BMP header bytes") {
      exprs => ImageDimsExpr(exprs.head)
    }
    inject("lsh_probes8",
      "multi-probe LSH buckets: base + 2 lowest-margin bit flips") {
      exprs => LshProbesExpr(exprs.head, planes = 8, probes = 3)
    }
    inject("normalize_text",
      "NFD + strip combining marks + NFC + lowercase") {
      exprs => NormalizeTextExpr(exprs.head)
    }
    inject("char_shingles3", "distinct code-point 3-gram shingles") {
      exprs => CharShinglesExpr(exprs.head, 3)
    }
    inject("byte_shingle_hashes8",
      "fused 60-bit hashes of a payload's byte 8-gram shingles") {
      exprs => ByteShingleHashesExpr(exprs.head, 8)
    }
    inject("winnow7_4", "winnowing fingerprints (k=7, w=4)") {
      exprs => WinnowExpr(exprs.head, 7, 4)
    }
    inject("repetition_stats", "Gopher repetition-quality struct") {
      exprs => RepetitionStatsExpr(exprs.head)
    }
    inject("word_gram_hash60_12", "positional word 12-gram 60-bit hashes") {
      exprs => WordGramHash60Expr(exprs.head, 12)
    }
    inject("bpe_count_fixture", "BPE token count under the fixture vocab") {
      exprs => BpeTokenCountExpr(exprs.head, Bpe.fixtureMerges)
    }
    inject("bpe_ids_fixture", "BPE token ids under the fixture vocab") {
      exprs => BpeTokenIdsExpr(exprs.head, Bpe.fixtureMerges)
    }
    inject("word_gram_hash128_12",
      "positional word 12-gram full-md5 hashes (removal-grade keys)") {
      exprs => WordGramHash128Expr(exprs.head, 12)
    }
    inject("int_gram_hash128_40",
      "positional token-id 40-gram full-md5 hashes (removal-grade keys)") {
      exprs => IntGramHash128Expr(exprs.head, 40)
    }
    inject("bpe_token_remove_fixture40",
      "token-space substring-dedup rewrite under the fixture vocab (k=40)") {
      exprs => BpeTokenRemoveExpr(exprs(0), exprs(1), 40, Bpe.fixtureMerges)
    }
    inject("hashed_bag_score_fixture",
      "hashed-bag logistic score under the fixture weights (8 buckets)") {
      exprs => HashedBagScoreExpr(exprs.head,
        HashedBagScoreExpr.fixtureWeights, HashedBagScoreExpr.FixtureBuckets)
    }
    inject("hashed_bag_score_fixture_bi",
      "fixture hashed-bag score with adjacent-bigram features") {
      exprs => HashedBagScoreExpr(exprs.head,
        HashedBagScoreExpr.fixtureWeights, HashedBagScoreExpr.FixtureBuckets,
        ngrams = 2)
    }
    inject("langid_nb_score_fixture",
      "per-language smoothed NB trigram score under the fixture profile") {
      exprs => LangIdNbScoreExpr(exprs.head, LangIdNbScoreExpr.fixtureProfile)
    }
    inject("html_extract_text",
      "HTML -> text: strip script/style/comments/tags, decode entities," +
        " collapse whitespace (the Scala API's exact chain)") {
      exprs => TextFunctions.htmlExtractExpr(exprs.head)
    }
  }
}
