package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** All-pairs TF-IDF cosine similarity via an inverted-index join —
  * the weighted sibling of [[SetSimJoin]] (which joins on set overlap):
  * document-document similarity in the df-capped TF-IDF space,
  * the retrieval/near-dup primitive behind "find me documents like
  * this one" without embeddings.
  *
  * Metric (defined over the CAPPED vocabulary, not approximated):
  * terms with df > [[DfCap]] are stopwords by definition and excluded
  * from both the weights and the norms; within the remaining
  * vocabulary, w = tf·ln(N/df) and cos(a,b) = Σw_a·w_b /(‖a‖·‖b‖).
  * df = 1 terms stay in the norms (they shape ‖·‖) but are pruned
  * from the JOIN — they cannot co-occur, so that prune is a pure
  * cost optimization with zero effect on the result.
  *
  * Scale shape — the classic sparse APSS plan: tokenize (map-only) →
  * (doc, term) tf aggregate → term df aggregate → inverted-index
  * self-join keyed by term. Candidate volume is Σ_term df², and the
  * df-cap bounds every term's posting list, so candidates grow
  * linearly in corpus size at fixed cap — the same lever
  * (cap-by-default, documented) as Dedup.DefaultShingleDfCap; raising
  * the cap trades cost for recall on mid-frequency vocabulary. */
object TfIdfJoin {

  val DfCap = 64

  /** Top-k most-similar document pairs by df-capped TF-IDF cosine. */
  def tfidfCosinePairs(s: SparkSession, dir: String, k: Int = 20,
      dfCap: Int = DfCap): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(split(regexp_replace(
        lower(trim(col("text"))), "\\s+", " "), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("df"),
        (col("tf") * log(col("n_docs") / col("df").cast("double")))
          .as("w"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      .filter(col("nrm") > 0)
    val joinable = w.filter(col("df") >= 2)
      .select(col("term"), col("doc_id"), col("w"))
    val dots = joinable
      .join(joinable.select(col("term"), col("doc_id").as("doc_b"),
        col("w").as("w_b")), "term")
      .filter(col("doc_id") < col("doc_b"))
      .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
      .agg(sum(col("w") * col("w_b")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("nrm_a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nrm_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round4eps(col("dot") / (col("nrm_a") * col("nrm_b"))).as("cos"))
      .orderBy(col("cos").desc, col("doc_a"), col("doc_b"))
      .limit(k)
  }
}
