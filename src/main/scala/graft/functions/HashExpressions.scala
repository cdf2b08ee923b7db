package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native codegen sketch kernels over `array<bigint>` hash columns
  * (the element hashes come from the built-in, codegen'd `xxhash64`).
  *
  * Both replace per-signature-position interpreted array passes
  * (`array_min(transform(...))` x32 for MinHash, `size(filter(...))`
  * x64 for SimHash) with ONE pass over the hash array. Long arithmetic
  * wraps exactly like the Java operators the interpreted formulation
  * lowered to, so signatures are unchanged.
  */

/** MinHash signature: out[k] = min_i (h_i * a_k + b_k) for each of the
  * signature's affine rehash pairs. One pass over the hashes; the
  * coefficient arrays are codegen reference constants.
  *
  * Coefficients are `Seq[Long]` (value equality), NOT `Array[Long]`:
  * case-class equality on arrays is reference equality, which would
  * make two plans built from equal-but-distinct coefficient arrays
  * canonicalize UNEQUAL — silently defeating CacheManager reuse of any
  * persisted frame whose plan contains this expression (measured 4x on
  * the minhash-LSH pipeline, where the bucket cache was rebuilt on
  * every call). */
case class LongMinHashSig(child: Expression, coeffA: Seq[Long], coeffB: Seq[Long])
    extends UnaryExpression {
  require(coeffA.length == coeffB.length)

  private lazy val arrA: Array[Long] = coeffA.toArray
  private lazy val arrB: Array[Long] = coeffB.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"LongMinHashSig expects array<bigint>, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill(arrA.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < out.length) {
        val v = h * arrA(k) + arrB(k)
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val ca = ctx.addReferenceObj("minhashA", arrA, "long[]")
      val cb = ctx.addReferenceObj("minhashB", arrB, "long[]")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $hs.numElements();
         |final long[] $out = new long[$ca.length];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $hs.getLong($i);
         |  for (int $k = 0; $k < $ca.length; $k++) {
         |    final long $v = $h * $ca[$k] + $cb[$k];
         |    if ($v < $out[$k]) $out[$k] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): LongMinHashSig =
    copy(child = c)
}

/** SimHash: bit b of the output is set iff a strict majority of the
  * input hashes have bit b set. One pass, 64 counters. */
case class LongSimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"LongSimHash expects array<bigint>, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var sig = 0L; var b = 0
    while (b < 64) { if (counts(b) * 2 > n) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val counts = ctx.freshName("counts"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      s"""
         |final int $n = $hs.numElements();
         |final int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) { $counts[$b] += (int)(($h >>> $b) & 1L); }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($counts[$b] * 2 > $n) $sig |= (1L << $b); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): LongSimHash =
    copy(child = c)
}

/** Fused shingle-hash kernel: words -> k-word shingles -> xxhash64 ->
  * distinct -> sorted, in one pass with one reused byte buffer. The
  * composed formulation (`sort_array(transform(array_distinct(
  * transform(sequence(...), concat_ws(slice(...)))), xxhash64))`) runs
  * interpreted higher-order functions and allocates every shingle
  * string; this computes the same hashes (byte-identical input to the
  * same XXH64, seed 42 = builtin xxhash64) without materializing any
  * shingle string. Distinctness moves from shingle strings to hashes —
  * identical output modulo 64-bit hash collisions (~1e-11 corpus-wide),
  * the same equivalence hashShingled already accepts. */
object ShingleHashKernel {
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  /** words: array<string>; returns sorted distinct xxhash64 of each
    * k-word shingle joined by ' ' — [] when fewer than k words. */
  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val m = n - k + 1
    val out = new Array[Long](m)
    var buf = buffers.get()
    var i = 0
    while (i < m) {
      var len = k - 1 // separator spaces
      var j = 0
      while (j < k) { len += words.getUTF8String(i + j).numBytes; j += 1 }
      if (buf.length < len) {
        buf = new Array[Byte](java.lang.Integer.highestOneBit(len) * 2)
        buffers.set(buf)
      }
      var off = 0
      j = 0
      while (j < k) {
        val w = words.getUTF8String(i + j)
        w.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += w.numBytes
        if (j < k - 1) { buf(off) = ' '; off += 1 }
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, off, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedupe adjacent (sorted)
    var w = 1; var r = 1
    while (r < m) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** Expression wrapper for ShingleHashKernel — codegen emits a single
  * static call (via the Scala object's static forwarder), so the
  * kernel runs inside whole-stage codegen without interpreted HOFs. */
case class WordShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"WordShingleHashes expects array<string>, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ws =>
      s"${ev.value} = graft.functions.ShingleHashKernel.compute($ws, $k);")

  override protected def withNewChildInternal(c: Expression): WordShingleHashes =
    copy(child = c)
}

/** Exact Jaccard of two SORTED long arrays via a linear merge —
  * |A ∩ B| / |A ∪ B| in one O(|A|+|B|) pass, replacing the interpreted
  * array_intersect + array_union pair (each O(n) with hash-set
  * allocation per row). Inputs must be sorted ascending and distinct
  * (sort_array over distinct shingle hashes). */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"SortedLongJaccard expects two array<bigint> args, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $na = $a.numElements(); final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i); final long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = (double)$inter / (double)($na + $nb - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongJaccard =
    copy(left = l, right = r)
}
