package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions over `array<float>` columns.
  *
  * All math is done in DOUBLE with left-to-right summation, which makes
  * results bit-identical to a single-node oracle computing the same
  * fold (DuckDB's `list_dot_product`) — float32 math or reassociated
  * SIMD sums would not be. float→double widening is exact.
  *
  * The kernels are native codegen Catalyst Expressions
  * (VecExpressions.scala) — a tight primitive loop inside whole-stage
  * codegen, replacing the interpreted `zip_with`+`aggregate`
  * higher-order-function formulation that dominated the benchmark
  * profile. Per-row scalar work only — no shuffle; distributes
  * trivially.
  */
object VectorFunctions {

  /** Sequential-fold dot product in double (native codegen kernel). */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(VecDot(GraftSql.expression(a), GraftSql.expression(b)))

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Element-wise vector SUM aggregate (TypedImperativeAggregate with
    * one primitive double[] buffer per group — see VecAggregates).
    * Mean = transform(vecSum(v), x -> x / count). */
  def vecSum(v: Column): Column =
    GraftSql.column(VecSumAgg(GraftSql.expression(v)).toAggregateExpression())

  /** Cosine similarity in double — fused one-pass dot + norms. */
  def cosine(a: Column, b: Column): Column =
    GraftSql.column(VecCosine(GraftSql.expression(a), GraftSql.expression(b)))

  /** Euclidean (L2) distance — fused one-pass kernel. */
  def l2Distance(a: Column, b: Column): Column =
    GraftSql.column(VecL2Dist(GraftSql.expression(a), GraftSql.expression(b)))

  /** SQUARED L2 distance — the exact left-to-right fold of
    * `aggregate(zip_with(a, b, (p,q) -> (p-q)^2), 0, +)` as one
    * codegen loop (no intermediate array). */
  def l2Sq(a: Column, b: Column): Column =
    GraftSql.column(VecL2Sq(GraftSql.expression(a), GraftSql.expression(b)))

  /** Deterministic random hyperplanes for cosine-LSH signatures:
    * `nPlanes` x `dim` Gaussian-ish components from a fixed seed.
    * Value-equality Seqs so plans embedding the same seed's planes
    * canonicalize equal (cache reuse across calls). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Signed-random-projection LSH bucket id: bit k = sign(v . plane_k)
    * against the deterministic [[hyperplanes]] matrix for `seed`.
    * Cosine-similar vectors collide with probability
    * (1 - angle/pi)^nPlanes per bucket. Returns an int in
    * [0, 2^nPlanes). Single fused codegen pass over the plane matrix;
    * only the three generator scalars ride the plan (see
    * VecSrpSignature). */
  def srpBucket(v: Column, nPlanes: Int, dim: Int, seed: Long): Column =
    GraftSql.column(VecSrpSignature(GraftSql.expression(v), nPlanes, dim, seed))

  /** All bucket ids within Hamming distance 1 of the base bucket
    * (multiprobe LSH): the bucket itself plus each single-bit flip. */
  def srpProbes(bucket: Column, nPlanes: Int): Column =
    array((bucket +: (0 until nPlanes).map(k => bucket.bitwiseXOR(lit(1 << k)))): _*)
}
