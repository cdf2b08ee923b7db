package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Caching.CachingOps
import graft.Tables

/** Entity resolution by neighborhood-generation blocking — the
  * record-linkage primitive behind "are these two customer records the
  * same entity": candidate pairs come from EQUALITY joins on masked
  * keys, and an edit-distance verifier decides.
  *
  * Blocking scheme (FastSS / symmetric-delete family, Bocek et al.
  * 2007): every record emits one variant per maskable position with
  * that position wildcarded; two equal-length strings within Hamming
  * distance 1 share the variant masking their (single) differing
  * position, so the candidate set from a variant-keyed equality join
  * is EXACTLY complete for distance ≤ 1 — no similarity scan, no
  * all-pairs anywhere. For equal-length strings Levenshtein 1 ⟺
  * Hamming 1 (one substitution; an insert+delete pair already costs
  * 2), so the verifier is exact too.
  *
  * 100 TB posture: blocking emits a constant ×positions row blowup
  * (here ×9) into ONE variant-keyed shuffle; each variant's posting
  * list is bounded by the masked alphabet (≤10 digit values — the
  * blocks cannot go hot, unlike sorted-neighborhood or prefix
  * blocking), and pair expansion is the same in-row postings idiom as
  * the shingle joins. The verification join is gone entirely: the
  * candidate generator carries both names, and `levenshtein` (a
  * codegen'd builtin) filters in the same stage. */
object EntityResolution {

  /** Near-duplicate customer identities: pairs of customer names
    * within edit distance 1 (TPC-H names are `Customer#` + 9 digits —
    * the fixed-width id-like key this blocking is built for, and the
    * real-world shape of account numbers / SKUs / normalized phone
    * numbers). Output (custkey_a, custkey_b, name_a, name_b, dist),
    * key-ordered. */
  def customerNameDedup(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"))
    // variant i = name with digit position i wildcarded (name layout:
    // 9-char "Customer#" prefix + 9 digits)
    val variants = names.select(col("c_custkey"), col("c_name"),
      explode(expr(
        """transform(sequence(0, 8), i ->
          |  concat(substring(c_name, 1, 9 + i), '_',
          |         substring(c_name, 11 + i, 9 - i)))""".stripMargin))
        .as("variant"))
    variants
      .groupBy(col("variant"))
      .agg(collect_list(struct(col("c_custkey").as("k"),
        col("c_name").as("n"))).as("postings"))
      .filter(size(col("postings")) >= 2)
      .select(explode(flatten(transform(col("postings"), (x, i) =>
        transform(slice(col("postings"), i + lit(2), size(col("postings"))), y =>
          struct(least(x("k"), y("k")).as("ka"),
                 greatest(x("k"), y("k")).as("kb"),
                 when(x("k") < y("k"), x("n")).otherwise(y("n")).as("na"),
                 when(x("k") < y("k"), y("n")).otherwise(x("n")).as("nb"))))))
        .as("p"))
      .select(col("p.ka").as("custkey_a"), col("p.kb").as("custkey_b"),
        col("p.na").as("name_a"), col("p.nb").as("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
      .orderBy(col("custkey_a"), col("custkey_b"))
  }

  /** Shared blocked part-name candidate-pair frame: self-join on the
    * blocking key with key-ordered dedup. Blocking caps the quadratic —
    * pairs grow as Σ_block n_b², not N², and the block attributes are
    * low-cardinality dimensions, so block sizes stay uniform (no hot
    * key) as the corpus scales.
    *
    * The STRICT (brand, size, type) key is the DEFAULT — the same
    * cap-by-default discipline as Dedup.DefaultShingleDfCap and
    * SetSimJoin.DefaultPrefixDfCap: ScaleSmoke's ×100 replication
    * stress (100× the parts into the SAME blocks — occupancy
    * multiplies, where a real growing catalog also adds brands/types)
    * costs 102 s (JW) / 218 s (DL) on the loose (brand, size) key vs
    * 21.8 s / 53.8 s strict, because adding p_type divides occupancy
    * ~150×. The loose key stays available (`strictBlock = false`) as
    * the recall-anchor variant — at verify scale it exercises real
    * pair volume and oracle-gates the pair generator itself. */
  private def blockedPartPairs(s: SparkSession, dir: String,
      strictBlock: Boolean = true): DataFrame = {
    val blockCols =
      if (strictBlock) Seq("p_brand", "p_size", "p_type")
      else Seq("p_brand", "p_size")
    val p = Tables.part(s, dir)
      .select((Seq("p_partkey", "p_name") ++ blockCols)
        .distinct.map(col): _*)
    val a = p.select(blockCols.map(col) :+
      col("p_partkey").as("pk_a") :+ col("p_name").as("name_a"): _*)
    val b = p.select(blockCols.map(col) :+
      col("p_partkey").as("pk_b") :+ col("p_name").as("name_b"): _*)
    a.join(b, blockCols)
      .filter(col("pk_a") < col("pk_b"))
  }

  /** Fuzzy-match screen over blocked part-name pairs with the native
    * Jaro-Winkler expression (graft.functions.JaroWinklerSim — codegen
    * DP kernel, standard p=0.1 / prefix-4 / 0.7-boost semantics): the
    * top-k most-similar name pairs per the whole catalog, the
    * candidate list a human reviewer (or an LLM labeler) would
    * receive. Ranking is on the ROUNDED score with the key pair as
    * tie-break; top-k is TakeOrderedAndProject (distributed heap
    * top-k, no global sort materialized). */
  def fuzzyPartPairs(s: SparkSession, dir: String, k: Int = 20,
      strictBlock: Boolean = true): DataFrame = {
    import graft.functions.StringSimilarity.jaroWinkler
    blockedPartPairs(s, dir, strictBlock)
      .select(col("p_brand"), col("pk_a"), col("pk_b"),
        graft.functions.Rounding.round4eps(
          jaroWinkler(col("name_a"), col("name_b"))).as("jw"))
      .orderBy(col("jw").desc, col("pk_a"), col("pk_b"))
      .limit(k)
  }

  /** Typo-candidate screen over the same blocked pairs with the native
    * full Damerau-Levenshtein expression (transposition-aware — the
    * dominant human typo class): k pairs at the SMALLEST edit
    * distance. Integer distances make the ranking exact across
    * engines with no rounding discipline needed. */
  def typoPartPairs(s: SparkSession, dir: String, k: Int = 20,
      strictBlock: Boolean = true): DataFrame = {
    import graft.functions.StringSimilarity.damerauLevenshtein
    blockedPartPairs(s, dir, strictBlock)
      .select(col("p_brand"), col("pk_a"), col("pk_b"),
        damerauLevenshtein(col("name_a"), col("name_b")).as("dl"))
      .orderBy(col("dl"), col("pk_a"), col("pk_b"))
      .limit(k)
  }

  /** Fellegi-Sunter probabilistic record-linkage scores over blocked
    * part pairs — the decision-theoretic layer on top of the candidate
    * generators above: each pair gets a log-likelihood match weight
    * w = Σ_k agree_k ? ln(m_k/u_k) : ln((1−m_k)/(1−u_k)) over the
    * comparison vector (adjective word of the name, brand, type).
    *
    * u-probabilities (chance agreement between NON-matches) are
    * estimated from the field value distributions in the classic
    * closed form u_k = Σ_v (n_v/n)² — one tiny aggregate per field,
    * broadcast. m-probabilities (agreement among true matches) are the
    * standard fixed prior [[FsM]] = 0.95 (no labeled pairs exist; an
    * EM refinement would slot in here with the same plan shape).
    *
    * Blocking — strict (noun, p_size, p_brand) by DEFAULT (the same
    * cap-by-default discipline as [[blockedPartPairs]]): ScaleSmoke's
    * ×100 replication stress costs 279 s on the loose (noun, p_size)
    * key (occupancy-quadratic) vs seconds strict. Under the strict
    * key the brand field trivially agrees, so its weight term is the
    * constant ln(m/u_brand) and the output schema is unchanged; the
    * loose variant stays available (`strictBlock = false`, gate
    * q_fellegi_sunter_loose) as the recall anchor where brand
    * DISAGREEMENT can still score. Candidates grow as Σ_block n_b²,
    * never N²; one blocked self-join + one broadcast of three scalar
    * u's — no other shuffle. */
  val FsM = 0.95

  def fellegiSunterPairs(s: SparkSession, dir: String, k: Int = 20,
      strictBlock: Boolean = true): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"),
      split(col("p_name"), " ").getItem(0).as("adj"),
      split(col("p_name"), " ").getItem(1).as("noun"),
      col("p_brand"), col("p_type"), col("p_size"))
    // u_k = sum over values of (freq/n)^2, one scalar per field
    def uOf(c: String) = {
      val n = p.groupBy(col(c)).agg(count(lit(1)).as("f"))
      n.agg((sum(col("f") * col("f")).cast("double") /
        (sum(col("f")) * sum(col("f"))).cast("double")).as(s"u_$c"))
    }
    val us = uOf("adj").crossJoin(uOf("p_brand")).crossJoin(uOf("p_type"))
    val blockCols =
      if (strictBlock) Seq("noun", "p_size", "p_brand")
      else Seq("noun", "p_size")
    val a = p.select(blockCols.map(col) ++ Seq(
      col("p_partkey").as("pk_a"), col("adj").as("adj_a"),
      col("p_brand").as("brand_a"), col("p_type").as("type_a")): _*)
    val b = p.select(blockCols.map(col) ++ Seq(
      col("p_partkey").as("pk_b"), col("adj").as("adj_b"),
      col("p_brand").as("brand_b"), col("p_type").as("type_b")): _*)
    def term(agree: org.apache.spark.sql.Column, u: org.apache.spark.sql.Column) =
      when(agree, log(lit(FsM) / u)).otherwise(log(lit(1.0 - FsM) / (lit(1.0) - u)))
    a.join(b, blockCols).filter(col("pk_a") < col("pk_b"))
      .crossJoin(broadcast(us))
      .select(col("pk_a"), col("pk_b"),
        (col("adj_a") === col("adj_b")).cast("int").as("agree_adj"),
        (col("brand_a") === col("brand_b")).cast("int").as("agree_brand"),
        (col("type_a") === col("type_b")).cast("int").as("agree_type"),
        graft.functions.Rounding.round4eps(
          term(col("adj_a") === col("adj_b"), col("u_adj")) +
          term(col("brand_a") === col("brand_b"), col("u_p_brand")) +
          term(col("type_a") === col("type_b"), col("u_p_type"))).as("w"))
      .orderBy(col("w").desc, col("pk_a"), col("pk_b"))
      .limit(k)
  }

  /** SymSpell (symmetric-delete) edit-distance-1 pairs over the part
    * vocabulary: the spell-correction index at corpus scale. Each
    * DISTINCT word emits itself plus its |w| delete-1 variants; one
    * EQUALITY self-join on the variant key yields every candidate pair
    * (a shared variant ⇒ edit distance ≤ 2), and an exact
    * `levenshtein = 1` verifier keeps the true typo pairs. The
    * suggestion direction follows corpus frequency (typos are rare,
    * the intended word is common).
    *
    * 100 TB posture: the index is Σ|w| rows over the DISTINCT
    * vocabulary — replication never grows it (the vocab is fixed), so
    * the only fact-linear term is the frequency count; candidates come
    * from an equality join, never an all-pairs product. This is the
    * same FastSS blocking family as customerNameDedup, reduced to its
    * purest single-token form. */
  def symspellPairs(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.part(s, dir)
      .select(explode(split(col("p_name"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .persistMemDisk
    // w itself + every delete-1 variant (variant key, original word)
    val variants = words.select(col("w"),
        explode(array_union(array(col("w")),
          transform(sequence(lit(1), length(col("w"))), i =>
            concat(col("w").substr(lit(1), i - lit(1)),
              col("w").substr(i + lit(1), length(col("w")) - i))))).as("v"))
    val cands = variants.as("a")
      .join(variants.as("b"), col("a.v") === col("b.v") &&
        col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
      .distinct()
    cands.filter(levenshtein(col("w1"), col("w2")) === 1)
      .join(words.select(col("w").as("w1"), col("freq").as("f1")), "w1")
      .join(words.select(col("w").as("w2"), col("freq").as("f2")), "w2")
      .select(col("w1"), col("w2"), col("f1"), col("f2"),
        when(col("f1") >= col("f2"), col("w1")).otherwise(col("w2"))
          .as("suggestion"))
      .orderBy(col("w1"), col("w2"))
  }
}
