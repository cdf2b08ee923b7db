package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface.
  *
  * Everything here is composed from built-in `functions._` (codegen'd
  * or efficiently interpreted higher-order array functions) — no UDFs,
  * so plans stay inside Catalyst and distribute trivially: each
  * function is a per-row scalar computation with zero shuffle.
  */
object TextFunctions {

  /** Whitespace tokens. Single-space split (the corpus is single-space
    * delimited); `tokenCountRegex` handles arbitrary whitespace. */
  def words(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token estimate: word-piece heuristic — words plus an extra
    * token per 6 chars of word length beyond the first (rough subword
    * splitting), all integer math (floor division, oracle-replayable). */
  def tokenCountBpe(text: Column): Column =
    tokenCount(text) + aggregate(words(text), lit(0),
      (acc, w) => acc + floor((length(w) - lit(1)) / lit(6)).cast("int"))

  /** Distinct word k-shingles (k consecutive words joined by ' ').
    * Texts shorter than k words yield an EMPTY shingle set — they
    * cannot form a k-shingle, so they participate in no near-dup pair,
    * matching the oracle's list comprehension which yields [] for
    * them (a whole-text fallback shingle would make short docs
    * pairable in Spark but not in the oracle). */
  /** Let-bind `v` to a lambda variable so the consuming expression
    * references an EVALUATED value instead of re-evaluating the
    * producing tree at every occurrence. Interpreted expressions (all
    * higher-order functions) cache nothing: a producer referenced
    * inside a lambda is otherwise recomputed per ELEMENT — wordShingles
    * re-tokenized the document once per shingle (O(tokens²)) before
    * r15. Pure expression rewrite; values unchanged. */
  private def bind(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  def wordShingles(text: Column, k: Int): Column =
    bind(words(text)) { w =>
      when(size(w) >= k,
        array_distinct(transform(
          sequence(lit(0), size(w) - lit(k)),
          i => concat_ws(" ", slice(w, i + lit(1), lit(k))))))
        .otherwise(typedlit(Seq.empty[String]))
    }

  /** Character n-grams of the lowercased text (language-ID features). */
  def charNGrams(text: Column, n: Int): Column =
    bind(lower(text)) { t =>
      when(length(t) >= n,
        transform(sequence(lit(1), length(t) - lit(n - 1)),
          i => t.substr(i, lit(n))))
        .otherwise(array(t))
    }

  /** Jaccard similarity of two string arrays (exact, double). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Canonical text normalization used for exact dedup: lowercase,
    * trim, collapse runs of whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** 128-bit content fingerprint (hex) of the normalized text —
    * portable (md5 is bit-identical in any engine, used by the oracle). */
  def fingerprintMd5(text: Column): Column =
    md5(normalize(text).cast("binary"))

  /** 64-bit fast fingerprint for join keys (not portable across
    * engines; used where the oracle doesn't need to recompute it). */
  def fingerprint64(text: Column): Column = xxhash64(normalize(text))

  /** Stopword ratio against a fixed stopword set. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val w = words(text)
    size(filter(w, x => x.isin(stopwords: _*))).cast("double") / size(w)
  }

  /** Mean word length, exact arithmetic shared with the oracle:
    * (chars - separators) / words. */
  def avgWordLength(text: Column): Column =
    (length(text) - (size(words(text)) - lit(1))).cast("double") / size(words(text))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\.,!\\?;:]", ""))).cast("double") /
      length(text)

  /** Uppercase character ratio (quality signal: shouting / OCR junk). */
  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") /
      length(text)

  /** Composite quality score in [0,1]: favors mid-length documents with
    * a natural stopword rate and little punctuation/shouting. Formula is
    * deliberately simple arithmetic so the oracle can replay it. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / lit(400.0), lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * lit(5.0), lit(1.0))
    val punctPenalty = punctRatio(text) * lit(2.0)
    val upperPenalty = upperRatio(text)
    greatest(lit(0.0),
      least(lit(1.0),
        lenScore * lit(0.5) + stopScore * lit(0.5) - punctPenalty - upperPenalty))
  }

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Tiny closed sets — the realistic version would load
    * top-k wordlists; the mechanism (score per language, argmax) is
    * identical. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Language-ID: argmax of per-language stopword hit counts; 'und'
    * (undetermined) when nothing matches. Pure column expression —
    * a 5-way greatest/when cascade, no shuffle, no UDF. */
  def langId(text: Column): Column =
    // r15: the un-bound form re-evaluated normalize+split+filter up to
    // ~30× per row (each `when` arm re-derived both its score and the
    // 5-way `best`). Bind the token array, then bind the 5-score
    // array; the cascade then reads O(1) lambda variables. Same
    // scores, same first-match-in-profile-order tie rule.
    bind(words(normalize(text))) { w =>
      bind(array(langProfiles.map { case (_, stops) =>
        size(filter(w, x => x.isin(stops: _*)))
      }: _*)) { ss =>
        val best = array_max(ss)
        langProfiles.map(_._1).zipWithIndex
          .foldRight(lit("und"): Column) { case ((lang, i), acc) =>
            when(element_at(ss, i + 1) === best && best > 0, lit(lang))
              .otherwise(acc)
          }
      }
    }

  /** 64-bit SimHash over word unigrams: for each bit b the signature
    * bit is the majority vote of the words' xxhash64 bit b. Word
    * hashing uses the built-in codegen xxhash64; the 64-way majority
    * vote is one fused native pass (LongSimHash expression) instead of
    * 64 interpreted filtered counts. */
  def simhash64(text: Column): Column = {
    val hs = transform(words(normalize(text)), w => xxhash64(w))
    org.apache.spark.sql.GraftSql.column(
      LongSimHash(org.apache.spark.sql.GraftSql.expression(hs)))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Positional k-word shingle rows via the WordShingleGenerate
    * table-valued expression: select this column `.as(Seq("pos",
    * "shingle"))` and the analyzer plans a Generate node emitting one
    * row per shingle. Shared bridge for every positional-shingle
    * consumer (shingle index, duplicate-span stats). */
  def wordShingleRows(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftSql.column(WordShingleGenerate(
      org.apache.spark.sql.GraftSql.expression(words(text)), k))
}
