package graft.operators

import graft.Caching.CachingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.wordShingles
import graft.functions.Rounding.round4eps

/** Threshold set-similarity self-join via prefix filtering — the
  * AllPairs/PPJoin candidate-generation family (Bayardo et al., WWW'07;
  * Xiao et al., WWW'08): order each record's element set by ascending
  * global document frequency and index ONLY its prefix — the
  * (n - ceil(t*n) + 1) rarest elements. Two sets with Jaccard >= t must
  * share at least one prefix element under any fixed global order, so
  * candidates come from equality joins on rare elements whose postings
  * are short by construction, never from an all-pairs product.
  *
  * Set elements are distinct word 3-gram shingles, NOT raw words: the
  * prefix principle needs a long-tailed element space (rare elements
  * exist to index), and a word vocabulary can be tiny — this corpus has
  * 31 distinct words, making every word frequent and word-level
  * prefixes unselective (measured: 3.7 M candidates from 5 k docs),
  * while its 3-gram space is 27 k elements with max df 25 (measured:
  * 9 k candidates). Real web corpora have long-tailed word vocabularies
  * too, but shingles keep the guarantee even against degenerate ones.
  *
  * This complements the shingle-postings Jaccard operator
  * (Dedup.ngramJaccardWithinSource): that one expands pairs from EVERY
  * shingle's postings and scopes within source; prefix filtering is
  * globally scoped, and UNCAPPED it is exactly complete because
  * frequent shingles sort to the suffix and never generate candidates.
  * The registry default caps prefix postings ([[DefaultPrefixDfCap]])
  * because completeness-by-rarity breaks under heavy duplication:
  * cluster growth inflates every df, including the prefix's. 100 TB posture: candidate volume is
  * sum over prefix elements of C(df_prefix, 2), which the df-ascending
  * order keeps near-linear in corpus size for dedup thresholds
  * (t >= 0.7); the verification joins are plain hash joins on doc_id.
  *
  * The reference has no similarity operator at all (its only dedup is
  * none — `extract_bitcoin_prices.py` appends rows as-is), so this is
  * beyond-reference surface, gated by an exact all-pairs DuckDB oracle.
  */
object SetSimJoin {

  val JaccardThreshold = 0.9

  /** Pairs of documents whose distinct-3-gram-shingle Jaccard is >= t,
    * globally across sources. Exact output (prefix filter generates
    * candidates, full-array verification decides), columns
    * (doc_a, doc_b, jaccard).
    *
    * The float guards matter at the boundary: t*n is not exact in
    * binary for t = 0.9, and ceil(18.000000000000004) = 19 would
    * shorten the prefix below the completeness bound — the 1e-9 slack
    * keeps both the prefix length and the length filter on the
    * inclusive side, at worst admitting a few extra candidates that
    * exact verification then discards. */
  /** Prefix-postings cap, ON BY DEFAULT (same production lever as
    * Dedup.DefaultShingleDfCap): a prefix element on df docs expands
    * C(df,2) candidates, and under heavy duplication even RARE-by-rank
    * elements grow df linearly with cluster size — the measured 100x
    * ScaleSmoke worst case (805 s uncapped). Dropping posting lists
    * longer than the cap costs exactly the pairs whose rarest shared
    * element is still common — the candidates the df-ascending prefix
    * order already ranks least selective. The cap exceeds every df at
    * oracle scale (measured max 7 at sf0.01), so the exact all-pairs
    * DuckDB oracle stays the anchor; pass Int.MaxValue for the
    * uncapped, provably-complete variant. */
  val DefaultPrefixDfCap = 64

  def prefixFilteredJaccardJoin(s: SparkSession, dir: String,
      threshold: Double = JaccardThreshold,
      maxPrefixDf: Int = DefaultPrefixDfCap): DataFrame =
    joinOn(Tables.documents(s, dir), threshold, maxPrefixDf)

  /** Same join over any (doc_id, text) frame — the spec drives crafted
    * corpora (exact-boundary Jaccard, adversarial vocabularies) through
    * the identical plan. */
  private[graft] def joinOn(docs: DataFrame,
      threshold: Double = JaccardThreshold,
      maxPrefixDf: Int = Int.MaxValue): DataFrame = {
    val eps = 1e-9
    // Distinct word 3-grams as plain strings (portable to the oracle's
    // string_split formulation — no engine-specific hashing in the gate
    // path; the hashed-shingle family lives in Dedup).
    val toks = docs
      .select(col("doc_id"), explode(wordShingles(col("text"), 3)).as("tok"))
    // Global element order = (document frequency asc, shingle asc).
    // The df aggregate is corpus-wide but vocabulary-sized; joining it
    // back onto the token stream is left to AQE — small vocabularies
    // broadcast, a web-scale shingle vocabulary (too big for one
    // executor) falls back to a shuffle join on tok, which is the
    // correct plan there. No hint pins the wrong strategy at either
    // extreme.
    val df = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // Consumed three times (prefix index + both verification sides) —
    // persist, or the scan→shingle→df-join→sort pipeline runs 3x (and
    // df's aggregate with it). One row per doc, MEMORY_AND_DISK spills
    // at scale; lifecycle is caller-owned (Verify/Bench clearCache
    // between queries), same contract as Dedup.hashShingled.
    val ordered = toks.join(df, "tok")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ts"))
      .select(col("doc_id"),
        transform(col("ts"), x => x("tok")).as("toks"),
        size(col("ts")).as("n"))
      .persistMemDisk
    // Index the (n - ceil(t*n) + 1) rarest tokens of each set.
    val prefixLen = (col("n") - ceil(col("n") * lit(threshold) - lit(eps)) + lit(1))
      .cast("int")
    val prefix = ordered.select(col("doc_id"), col("n"),
      explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
    // Gather each prefix token's postings once and expand co-occurring
    // pairs in-row (the same idiom as the shingle postings join — a
    // self-join would re-run the scan+order pipeline for both sides).
    // Prefix postings are short by construction on long-tailed
    // corpora; maxPrefixDf bounds them under adversarial duplication
    // (see DefaultPrefixDfCap — Int.MaxValue restores the exact
    // completeness guarantee).
    val candidates = prefix
      .groupBy(col("tok"))
      .agg(collect_list(struct(col("doc_id").as("id"), col("n"))).as("postings"))
      .filter(size(col("postings")) >= 2 &&
        size(col("postings")) <= maxPrefixDf)
      .select(explode(flatten(transform(col("postings"), (x, i) =>
        transform(slice(col("postings"), i + lit(2), size(col("postings"))), y =>
          struct(least(x("id"), y("id")).as("doc_a"),
                 greatest(x("id"), y("id")).as("doc_b"),
                 least(x("n"), y("n")).as("n_small"),
                 greatest(x("n"), y("n")).as("n_big")))))).as("p"))
      // Length filter: j >= t forces t*|bigger| <= |smaller|.
      .filter(col("p.n_small") >= lit(threshold) * col("p.n_big") - lit(eps))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
    // Exact verification: re-attach both full token arrays (hash joins
    // keyed by doc_id) and decide on true Jaccard.
    val full = ordered.select(col("doc_id"), col("toks"), col("n"))
    candidates
      .join(full.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
        col("n").as("na")), "doc_a")
      .join(full.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
        col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("j",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), round4eps(col("j")).as("jaccard"))
  }
}
