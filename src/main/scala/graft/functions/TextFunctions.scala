package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline
  * (tokenize, quality scoring, language-ID heuristic, fingerprinting).
  * Pure `Column` expressions — codegen'd, no UDFs — so they stay inside
  * whole-stage codegen and push down at 100 TB.
  *
  * Every function has a matching DuckDB SQL fragment in [[TextSql]] used
  * by the oracle queries; keep the two in sync.
  */
object TextFunctions {

  /** Whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length (chars), null on empty docs. */
  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Count of tokens in a fixed lexicon (for stopword ratio / lang-ID). */
  def lexiconHits(text: Column, lexicon: Seq[String]): Column =
    lexiconHitsA(tokens(text), lexicon)

  // `*A` variants take an already-computed token array column. Higher-
  // order functions are interpreted (no codegen, no common-subexpression
  // elimination), so queries using several token metrics should tokenize
  // ONCE into a column and derive metrics from it.
  def avgTokenLenA(ts: Column): Column =
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))

  def lexiconHitsA(ts: Column, lexicon: Seq[String]): Column =
    size(filter(ts, t => t.isin(lexicon.map(lit): _*)))

  /** Normalized-whitespace, lowercased document fingerprint (exact dedup
    * key). Ref model: content-defined fingerprinting; md5 is available
    * and identical in both engines.
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Word k-shingles as distinct strings ("a b c" 3-grams). */
  def shingles(text: Column, k: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      when(size(ts) >= k,
        transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", ts))))
  }

  /** Distinct 64-bit shingle-hash set, natively codegen'd (one pass,
    * no intermediate strings) — see [[graft.plans.ShingleHash]]. Use
    * when downstream only joins / counts shingles; use [[shingles]]
    * when the shingle TEXT itself is needed (MinHash's portable md5
    * lanes).
    */
  def shingleHashes(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.plans.ShingleHash(
        org.apache.spark.sql.GraftSql.expression(text), k))

  /** English-ish stopwords used for quality scoring. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "of", "and", "or", "in", "to")

  /** Tiny per-language lexicons for the lang-ID heuristic
    * (n-gram/stopword language ID, SURVEY training-data ops).
    */
  val LangLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "une"))
}

/** DuckDB-dialect fragments mirroring [[TextFunctions]]. */
object TextSql {
  def tokens(text: String): String =
    s"list_filter(string_split($text, ' '), t -> t <> '')"
  def tokenCount(text: String): String = s"len(${tokens(text)})"
  def distinctTokenCount(text: String): String =
    s"len(list_distinct(${tokens(text)}))"
  def avgTokenLen(text: String): String = {
    val ts = tokens(text)
    s"CASE WHEN len($ts) > 0 THEN " +
      s"CAST(list_sum(list_transform($ts, t -> length(t))) AS DOUBLE) / len($ts) END"
  }
  def lexiconHits(text: String, lexicon: Seq[String]): String = {
    val inList = lexicon.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(${tokens(text)}, t -> t IN ($inList)))"
  }
  def fingerprint(text: String): String =
    s"md5(lower(trim(regexp_replace($text, '\\s+', ' ', 'g'))))"
  def shingles(text: String, k: Int): String = {
    val ts = tokens(text)
    s"""list_distinct(CASE WHEN len($ts) >= $k
        THEN list_transform(range(0, len($ts) - $k + 1),
                            i -> array_to_string(list_slice($ts, i + 1, i + $k), ' '))
        ELSE [array_to_string($ts, ' ')] END)"""
  }
}

/** Cross-engine deterministic 32-bit hashing, built only from functions
  * both engines share (md5 + substring + string search + integer math).
  *
  * `hash32(s, seed)` = polynomial over the first 8 hex chars of
  * md5(s || '#' || seed): sum of digit_i * 16^(8-i) — order-free exact
  * integer arithmetic, bit-identical in Spark and DuckDB. One md5 yields
  * four independent 32-bit lanes (hex chars 1-8, 9-16, 17-24, 25-32).
  */
object PortableHash {
  private val HEX = "0123456789abcdef"

  /** Spark-dialect: hash of the `lane`-th 8-hex-char window of an md5
    * hex string expression `h` (lane 0..3). Single `conv` call — a
    * 16-lane signature stays a small expression tree (the earlier
    * digit-by-digit polynomial blew past janino's method-size limit and
    * dropped whole plans out of codegen).
    */
  def laneSpark(h: String, lane: Int): String =
    s"cast(conv(substring($h, ${lane * 8 + 1}, 8), 16, 10) as bigint)"

  /** DuckDB-dialect equivalent of [[laneSpark]]. */
  def laneDuck(h: String, lane: Int): String =
    s"CAST(('0x' || substring($h, ${lane * 8 + 1}, 8)) AS BIGINT)"

  /** Driver-side reference implementation (for plane generation and
    * tests): identical values to the SQL forms.
    */
  def hash32(s: String, seed: Int, lane: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$s#$seed".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (0 until 8).map { i =>
      val c = hex.charAt(lane * 8 + i)
      HEX.indexOf(c).toLong * math.pow(16, 7 - i).toLong
    }.sum
  }
}
