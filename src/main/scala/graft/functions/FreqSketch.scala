package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a partial-mergeable aggregate:
  * `mg_topk(string_col, k) -> array<string>` — the candidate set of
  * heavy hitters, using k counters of bounded memory per partial.
  *
  * This is the single-pass scale path for "which tokens appear more
  * than N/t times" over a 100 TB corpus: a full `GROUP BY token` must
  * shuffle every distinct token (vocabulary-sized state); the sketch
  * carries a CONSTANT k-entry map per map task, merges like any
  * aggregate partial, and guarantees (Misra–Gries 1982; merge rule and
  * proof: Agarwal et al. 2012, "Mergeable Summaries") that every item
  * with true count > N/(k+1) survives. False positives are possible —
  * the standard second pass re-counts exactly ONLY the ≤k candidates
  * (a broadcast semi-join, no vocabulary shuffle) and applies the real
  * threshold, making the end-to-end result deterministic and exact.
  *
  * update: counter hit → +1; free slot → insert 1; full → decrement
  * all (amortized O(1)). merge: sum counts, then subtract the (k+1)-th
  * largest count and drop non-positives — the mergeable-summaries rule
  * that preserves the N/(k+1) guarantee under any merge tree.
  * eval: candidate items sorted lexicographically (deterministic
  * output order; estimated counts are merge-order dependent and
  * deliberately NOT exposed).
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k > 0, s"mg_topk needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
    else if (buf.size < k) buf.put(item, 1L)
    else decrementAll(buf, 1L)
    buf
  }

  override def merge(b1: java.util.HashMap[String, Long],
                     b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // stored counts are always >= 1, so get()==0 means absent
      b1.put(e.getKey, b1.get(e.getKey) + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(b1, counts(b1.size - k - 1))
    }
    b1
  }

  private def decrementAll(buf: java.util.HashMap[String, Long], d: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - d
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val items = new Array[AnyRef](buf.size)
    var i = 0
    val ks = buf.keySet().iterator()
    while (ks.hasNext) { items(i) = UTF8String.fromString(ks.next()); i += 1 }
    java.util.Arrays.sort(items, (a: AnyRef, b: AnyRef) =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
    new GenericArrayData(items)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      bytes += 4 + 8 + it0.next().getKey.getBytes(StandardCharsets.UTF_8).length
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, Long](math.max(n * 2, k * 2))
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      m.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_topk"
}

/** KMV (k-minimum-values) distinct-count sketch as a partial-mergeable
  * aggregate: `kmv_mins(hash_col, k) -> array<bigint>` — the k smallest
  * DISTINCT hash values seen (Bar-Yossef et al. 2002; mergeability:
  * Agarwal et al. 2012). With hashes uniform on [0, 2^60) the
  * estimator is NDV ≈ (k-1) / (m_k / 2^60) where m_k is the k-th
  * minimum — standard error ~ 1/√k.
  *
  * This is the scale path for join-key cardinality stats over 100 TB:
  * an exact COUNT(DISTINCT key) shuffles every distinct key; the
  * sketch carries a CONSTANT k-entry ordered set per partial and
  * merges like any aggregate (union + trim — the k smallest of a union
  * are among the k smallest of each side, so merging loses nothing).
  * Unlike HLL the result is a deterministic function of the input SET
  * — same hashes in, same mins out, regardless of partitioning or
  * merge order — so a SQL oracle replays it exactly with
  * ORDER BY hash LIMIT k. eval returns the retained mins ascending;
  * the caller applies the estimator (and keeps the max-as-threshold
  * for set-operation sketches: union = merge, intersection via the
  * ρ-section rule). */
case class KmvMins(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"kmv_mins needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = v.asInstanceOf[Long]
    // only admit values that can displace the current k-th minimum —
    // steady-state updates are one comparison, no tree mutation
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.remove(b1.last())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val mins = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending
    while (it.hasNext) { mins(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(mins)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMins =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMins =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMins =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_mins"
}

/** Deterministic hash-reservoir sample as a mergeable aggregate:
  * `hash_reservoir(hash_col, value_col, k) -> array<double>` — the
  * values attached to the k SMALLEST hashes, i.e. a uniform sample
  * whose membership is a pure function of the input SET (same rows in,
  * same sample out, regardless of partitioning, task order, or merge
  * tree — the property plain reservoir sampling lacks and the reason
  * an exact SQL oracle can replay this sketch verbatim).
  *
  * This is the mergeable-quantile path at 100 TB: exact per-group
  * percentiles buffer every row of the group; this carries a CONSTANT
  * k-entry map per partial (update is one comparison at steady state,
  * merge is union+trim, identical to [[KmvMins]]). Downstream quantile
  * interpolation over the k sampled values gives ±O(1/√k) rank error —
  * and because membership is deterministic, the SAMPLE quantiles
  * themselves are exactly reproducible. Hash collisions (p ≈ n²/2⁶¹)
  * keep the MINIMUM value for that hash — commutative, so merge order
  * still cannot change the result. */
case class HashReservoir(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]] {

  require(k > 0, s"hash_reservoir needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def admit(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                    h: Long, v: Double): Unit = {
    val prev = buf.get(h)
    if (prev != null) {
      if (v < prev) { buf.put(h, v); () } // collision: keep min (commutative)
    } else if (buf.size < k) { buf.put(h, v); () }
    else if (h < buf.lastKey()) {
      buf.put(h, v); buf.remove(buf.lastKey()); ()
    }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      admit(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
                     b2: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      admit(b1, e.getKey.longValue(), e.getValue.doubleValue())
    }
    b1
  }

  /** Values in ascending-hash order — deterministic, and order is
    * irrelevant to the quantile interpolation downstream. */
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.values().iterator()
    while (it.hasNext) { out(i) = it.next().doubleValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putDouble(e.getValue.doubleValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getDouble); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashReservoir =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashReservoir =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HashReservoir =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
  override def prettyName: String = "hash_reservoir"
}

object FreqSketchFunctions {
  import org.apache.spark.sql.{Column, GraftSql}

  /** KMV sketch aggregate as a Column — k smallest distinct longs. */
  def kmvMins(h: Column, k: Int): Column =
    GraftSql.column(KmvMins(GraftSql.expression(h), k).toAggregateExpression())

  /** Deterministic hash-reservoir sample — values at the k smallest
    * hashes, as a Column aggregate. */
  def hashReservoir(h: Column, v: Column, k: Int): Column =
    GraftSql.column(HashReservoir(GraftSql.expression(h),
      GraftSql.expression(v), k).toAggregateExpression())
}
