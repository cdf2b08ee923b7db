package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
}
