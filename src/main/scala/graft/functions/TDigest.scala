package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** t-digest (Dunning & Ertl, 2019) — the mergeable quantile sketch:
  * centroids sized by the scale bound 4·W·q(1−q)/δ, so resolution
  * concentrates at the TAILS (rank error ~ q(1−q)·4/δ — a p99 at
  * δ = 100 is ~4·10⁻⁴ rank error) where a fixed-width histogram or
  * GK sketch wastes its budget mid-distribution. This is the
  * third sketch face of the engine next to KMV (distinct counts,
  * FreqSketch.scala) and SimHash/MinHash signatures: bounded state
  * per group (≤ ~2δ centroids), associative partial merge, one
  * shuffle of KB-scale buffers at any data size.
  *
  * Mutable buffer: parallel mean/weight arrays kept SORTED between
  * compressions plus an unsorted append tail; compression sorts the
  * tail in, then one greedy left-to-right merge pass under the scale
  * bound. min/max ride the buffer so tail quantiles clamp exactly.
  * Like every mergeable quantile sketch (incl. Spark's builtin
  * approx_percentile), the estimate depends on merge order — gates
  * must assert rank-error BOUNDS, not exact values. */
final class TDigestBuf(
    var means: Array[Double],
    var weights: Array[Double],
    var n: Int,          // live centroids
    var tail: Int,       // unsorted entries appended after `n`
    var lo: Double,
    var hi: Double) {
  // set by compress(); a compacted buffer with an empty tail skips the
  // re-sort + re-merge pass entirely (eval over k probs used to pay
  // O(n log n) k times on an unchanged buffer)
  var compacted: Boolean = false
  def total: Double = {
    var s = 0.0; var i = 0
    while (i < n + tail) { s += weights(i); i += 1 }
    s
  }
}

case class TDigestQuantiles(
    child: Expression,
    probs: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // whitelist at ANALYSIS time: a non-numeric column fails the plan
  // with a clear message instead of a per-row NumberFormatException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tdigest_quantiles requires a numeric column, got ${other.catalogString}")
    }

  private val cap = 8 * compression // append budget before a compress

  override def createAggregationBuffer(): TDigestBuf =
    new TDigestBuf(new Array[Double](cap + 16), new Array[Double](cap + 16),
      0, 0, Double.PositiveInfinity, Double.NegativeInfinity)

  private def append(b: TDigestBuf, mean: Double, w: Double): Unit = {
    if (b.n + b.tail >= b.means.length) compress(b)
    if (b.n + b.tail >= b.means.length) { // still full: grow (merge burst)
      b.means = java.util.Arrays.copyOf(b.means, b.means.length * 2)
      b.weights = java.util.Arrays.copyOf(b.weights, b.weights.length * 2)
    }
    b.means(b.n + b.tail) = mean
    b.weights(b.n + b.tail) = w
    b.tail += 1
    if (mean < b.lo) b.lo = mean
    if (mean > b.hi) b.hi = mean
  }

  /** Sort everything, then one greedy pass merging neighbors while the
    * merged weight stays under the k1-ish bound 4·W·q(1−q)/δ. */
  private def compress(b: TDigestBuf): Unit = {
    val m = b.n + b.tail
    if (m == 0 || (b.tail == 0 && b.compacted)) return
    // sort (mean, weight) pairs by mean — index sort to keep pairs
    val idx = (0 until m).sortBy(b.means)
    val sm = idx.map(b.means).toArray
    val sw = idx.map(b.weights).toArray
    val w0 = sw.sum
    var out = 0
    var curM = sm(0); var curW = sw(0)
    var wSoFar = 0.0
    var i = 1
    while (i < m) {
      val proposed = curW + sw(i)
      val q = (wSoFar + proposed / 2) / w0
      val limit = 4.0 * w0 * q * (1.0 - q) / compression
      if (proposed <= limit || proposed <= 1.0) {
        curM = (curM * curW + sm(i) * sw(i)) / proposed // weighted mean
        curW = proposed
      } else {
        b.means(out) = curM; b.weights(out) = curW; out += 1
        wSoFar += curW
        curM = sm(i); curW = sw(i)
      }
      i += 1
    }
    b.means(out) = curM; b.weights(out) = curW; out += 1
    b.n = out
    b.tail = 0
    b.compacted = true
  }

  override def update(buf: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case FloatType => v.asInstanceOf[Float].toDouble
        case DoubleType => v.asInstanceOf[Double]
        case IntegerType => v.asInstanceOf[Int].toDouble
        case LongType => v.asInstanceOf[Long].toDouble
        case ShortType => v.asInstanceOf[Short].toDouble
        case ByteType => v.asInstanceOf[Byte].toDouble
        case _: DecimalType => v.asInstanceOf[Decimal].toDouble
        case other => throw new IllegalStateException(
          s"tdigest_quantiles: unsupported input type ${other.catalogString}" +
            " (checkInputDataTypes should have rejected this plan)")
      }
      append(buf, d, 1.0)
    }
    buf
  }

  override def merge(b1: TDigestBuf, b2: TDigestBuf): TDigestBuf = {
    var i = 0
    while (i < b2.n + b2.tail) { append(b1, b2.means(i), b2.weights(i)); i += 1 }
    if (b2.lo < b1.lo) b1.lo = b2.lo
    if (b2.hi > b1.hi) b1.hi = b2.hi
    b1
  }

  /** Midpoint-rule interpolation over the compressed centroids with
    * exact min/max clamping at the tails (the reference estimator). */
  private def quantile(b: TDigestBuf, q: Double): Double = {
    val m = b.n
    if (m == 0) return Double.NaN
    if (m == 1) return b.means(0)
    val w0 = {
      var s = 0.0; var i = 0
      while (i < m) { s += b.weights(i); i += 1 }; s
    }
    val target = q * w0
    if (target <= b.weights(0) / 2) { // below the first midpoint: min edge
      return b.lo + (target / (b.weights(0) / 2)) * (b.means(0) - b.lo)
    }
    var cum = 0.0
    var i = 0
    while (i < m - 1) {
      val mid = cum + b.weights(i) / 2
      val nextMid = cum + b.weights(i) + b.weights(i + 1) / 2
      if (target <= nextMid) {
        if (target <= mid) return b.means(i)
        val f = (target - mid) / (nextMid - mid)
        return b.means(i) + f * (b.means(i + 1) - b.means(i))
      }
      cum += b.weights(i)
      i += 1
    }
    // above the last midpoint: max edge
    val lastMid = cum + b.weights(m - 1) / 2
    val span = w0 - lastMid
    if (span <= 0) return b.hi
    val f = math.min(1.0, (target - lastMid) / span)
    b.means(m - 1) + f * (b.hi - b.means(m - 1))
  }

  override def eval(buf: TDigestBuf): Any =
    if (buf.n + buf.tail == 0) null
    else {
      compress(buf) // once — quantile() reads the compacted centroids
      new GenericArrayData(probs.map(quantile(buf, _)).toArray)
    }

  override def serialize(buf: TDigestBuf): Array[Byte] = {
    compress(buf)
    val bb = java.nio.ByteBuffer.allocate(4 + 16 + 16 * buf.n)
    bb.putInt(buf.n).putDouble(buf.lo).putDouble(buf.hi)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.means(i)).putDouble(buf.weights(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    b.lo = bb.getDouble; b.hi = bb.getDouble
    if (n > b.means.length) {
      b.means = new Array[Double](n + 16)
      b.weights = new Array[Double](n + 16)
    }
    var i = 0
    while (i < n) { b.means(i) = bb.getDouble; b.weights(i) = bb.getDouble; i += 1 }
    b.n = n
    b.compacted = true // serialize() always compresses first
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantiles =
    copy(child = newChildren.head)
  override def prettyName: String = "tdigest_quantiles"
}

object TDigestFunctions {
  import org.apache.spark.sql.{Column, GraftSql}

  /** `tdigestQuantiles(col, probs)` → array<double> of the estimated
    * quantiles, one bounded sketch buffer per group. */
  def tdigestQuantiles(c: Column, probs: Seq[Double],
      compression: Int = 100): Column =
    GraftSql.column(
      TDigestQuantiles(GraftSql.expression(c), probs, compression)
        .toAggregateExpression())
}
