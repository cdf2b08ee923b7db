package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions over `array<float>` columns.
  *
  * All math is done in DOUBLE with left-to-right summation
  * (`aggregate` folds sequentially), which makes results bit-identical
  * to a single-node oracle computing the same fold — float32 math or
  * reassociated SIMD sums would not be. float→double widening is exact.
  *
  * Per-row scalar work only — no shuffle; distributes trivially. The
  * hot-path optimization (custom codegen Expression over the unsafe
  * array data) is the upgrade path if profiles demand it.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Deterministic random hyperplanes for cosine-LSH signatures:
    * `nPlanes` x `dim` Gaussian-ish components from a fixed seed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Signed-random-projection LSH bucket id: bit k = sign(v . plane_k).
    * Cosine-similar vectors collide with probability
    * (1 - angle/pi)^nPlanes per bucket. Returns an int in
    * [0, 2^nPlanes). */
  def srpBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, k) =>
      when(dot(v, typedlit(p.toSeq)) > 0, lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)

  /** All bucket ids within Hamming distance 1 of the base bucket
    * (multiprobe LSH): the bucket itself plus each single-bit flip. */
  def srpProbes(bucket: Column, nPlanes: Int): Column =
    array((bucket +: (0 until nPlanes).map(k => bucket.bitwiseXOR(lit(1 << k)))): _*)
}
