package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Deduplication operators over the `documents` table — the core
  * LLM-training-data pipeline surface (exact, MinHash-LSH, SimHash,
  * n-gram Jaccard).
  *
  * 100 TB posture:
  *  - exact dedup is a hash groupBy on a 128-bit fingerprint — one
  *    shuffle keyed by fingerprint, partial-aggregated map-side;
  *  - MinHash-LSH is the scale path for near-dup: candidates come from
  *    equality joins on band keys (shuffle on band key, never all-pairs);
  *    bucket size is capped so a degenerate key cannot produce a
  *    quadratic task;
  *  - the only all-pairs work is *within* candidate verification,
  *    proportional to true-duplicate density, not corpus size.
  */
object Dedup {

  val JaccardThreshold = 0.8
  val NumHashes = 32        // minhash signature length
  val NumBands  = 16        // => r = 2 rows per band
  val MaxBucket = 64        // skew guard: ignore degenerate LSH buckets

  /** Exact dedup groups: one row per distinct normalized text, with the
    * surviving (minimum) doc_id and the duplicate count. */
  def exactGroups(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(fingerprintMd5(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))

  /** Exact dedup survivors via row_number — keeps the lowest doc_id per
    * fingerprint, returns the full surviving rows. */
  def exactSurvivors(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("fingerprint", fingerprintMd5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** (doc_id, shingles) projection shared by the near-dup operators. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), wordShingles(col("text"), 3).as("shingles"))

  /** Deterministic affine rehash constants for minhash (seeded). */
  private val affine: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(7L)
    Array.fill(NumHashes)((rnd.nextLong() | 1L, rnd.nextLong()))
  }

  /** MinHash signature: for each of NumHashes affine transforms of the
    * shingle xxhash64, take the min over shingles. Shingle hashing is
    * the built-in codegen xxhash64; the 32 affine minima are one fused
    * native pass (LongMinHashSig) instead of 32 interpreted
    * array_min(transform(...)) folds. */
  private def minhashSig(shingles: org.apache.spark.sql.Column) = {
    val hs = transform(shingles, sh => xxhash64(sh))
    org.apache.spark.sql.GraftSql.column(
      graft.functions.LongMinHashSig(
        org.apache.spark.sql.GraftSql.expression(hs),
        affine.map(_._1), affine.map(_._2)))
  }

  /** Near-duplicate pairs by MinHash-LSH with exact-Jaccard
    * verification: returns (doc_a < doc_b, jaccard) for every pair with
    * word-3-shingle Jaccard >= 0.8.
    *
    * Plan shape: shingle -> 32-hash signature (map-only), explode 16
    * band keys (16x row blowup of tiny rows), shuffle join on
    * (band, key) for candidates, distinct, then two doc_id joins to
    * re-attach shingle sets for exact verification. With r=2,b=16 the
    * probability of missing a pair at j>=0.8 is (1-j^2)^16 <= 4e-7, so
    * the verified output equals brute-force pairwise Jaccard (which is
    * exactly what the oracle computes). */
  def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = shingled(s, dir).withColumn("sig", minhashSig(col("shingles")))
    val bands = docs.select(
      col("doc_id"),
      posexplode(array((0 until NumBands).map { j =>
        xxhash64(element_at(col("sig"), 2 * j + 1),
                 element_at(col("sig"), 2 * j + 2), lit(j))
      }: _*)).as(Seq("band", "key")))

    // Skew guard: drop degenerate buckets (a pathological key shared by
    // thousands of docs would otherwise force a quadratic explosion).
    val bucketed = bands.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .filter(col("bucket_n") <= MaxBucket)

    val l = bucketed.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val r = bucketed.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    val candidates = l.join(r, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    val sa = shingled(s, dir).select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = shingled(s, dir).select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    candidates.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("j", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
  }

  /** Near-dup survivors: connected near-duplicates keep the lowest
    * doc_id. Single-hop propagation (keep a doc iff it is not the
    * greater side of any near-dup pair) — exact for pair clusters,
    * a fixpoint/connected-components pass is the general-graph path. */
  def nearDupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val dups = minhashPairs(s, dir).select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(s, dir)
      .join(dups, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** SimHash near-dup pairs: 64-bit signatures, banded into 4x16-bit
    * chunks for candidate generation (a pair within Hamming distance 3
    * must agree on at least one 16-bit chunk), verified by exact
    * Hamming distance. Same LSH join shape as minhashPairs. */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), simhash64(col("text")).as("sig"))
    val chunks = docs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map { j =>
        shiftright(col("sig"), 16 * j).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("chunk", "key")))
    val l = chunks.select(col("chunk"), col("key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = chunks.select(col("chunk"), col("key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs within each source, via an inverted
    * index instead of an all-pairs product: explode distinct shingles,
    * self-join on (source, shingle) so only pairs sharing >=1 shingle
    * ever materialize, count shared shingles per pair, and derive
    * |union| = |A| + |B| - shared. Bit-identical to brute-force pairwise
    * Jaccard for any threshold > 0 (a pair with j > 0 must share a
    * shingle), but the work is sum-over-shingles of df^2 instead of
    * n^2 array intersections.
    *
    * 100 TB posture: the shuffle is keyed by shingle; a stopword-like
    * shingle with document frequency f contributes f^2 candidate rows,
    * so at scale the standard mitigation is dropping ultra-common
    * shingles (they only occur in pairs that share many other
    * shingles). Left exact here because the oracle is exact. */
  def ngramJaccardWithinSource(s: SparkSession, dir: String,
      threshold: Double = JaccardThreshold): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), wordShingles(col("text"), 3).as("sh"))
      .withColumn("n", size(col("sh")))
    val ex = d.select(col("source"), col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
    val a = ex.select(col("source"), col("shingle"),
      col("doc_id").as("doc_a"), col("n").as("n_a"))
    val b = ex.select(col("source"), col("shingle"),
      col("doc_id").as("doc_b"), col("n").as("n_b"))
    a.join(b, Seq("source", "shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("source"), col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("j", col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("j") >= threshold)
      .select(col("source"), col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
  }
}
