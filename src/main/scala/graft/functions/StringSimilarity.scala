package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Edit-distance / fuzzy-match kernels Spark lacks natively
  * (`functions.levenshtein` exists; Jaro-Winkler and
  * Damerau-Levenshtein do not). Both are native Catalyst expressions
  * with codegen — the generated code calls the static DP kernels
  * below (the same shape as Spark's own Levenshtein, whose codegen
  * calls UTF8String.levenshteinDistance), so the whole-stage span is
  * never broken the way a Scala UDF would break it.
  *
  * Semantics are pinned to the de-facto standard the DuckDB oracle
  * also implements (verified on a 15-pair vector in
  * StringSimilaritySpec):
  *  - Jaro-Winkler: prefix boost p=0.1, prefix capped at 4, boost
  *    applied only when jaro > 0.7 (the Winkler boost threshold).
  *  - Damerau-Levenshtein: the FULL (unrestricted) variant with an
  *    alphabet last-occurrence table — dl("CA","ABC") = 2, where the
  *    restricted OSA variant would give 3.
  */
object StrSim {

  /** Jaro similarity, then the Winkler prefix boost. Char-level
    * (UTF-16 units) — identical to codepoint-level on the ASCII
    * identifiers this engine matches on. */
  def jaroWinkler(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString; val b = r.toString
    if (a == b) return 1.0
    val na = a.length; val nb = b.length
    if (na == 0 || nb == 0) return 0.0
    val window = math.max(0, math.max(na, nb) / 2 - 1)
    val fa = new Array[Boolean](na); val fb = new Array[Boolean](nb)
    var m = 0
    var i = 0
    while (i < na) {
      val lo = math.max(0, i - window)
      val hi = math.min(nb, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!fb(j) && b.charAt(j) == a.charAt(i)) {
          fa(i) = true; fb(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < na) {
      if (fa(i)) {
        while (!fb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val transpositions = t / 2
    val jaro = (m.toDouble / na + m.toDouble / nb +
      (m - transpositions).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(na, nb)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Full Damerau-Levenshtein (adjacent transposition counted once,
    * unrestricted — a transposed block may be edited again), via the
    * classic alphabet last-occurrence DP. */
  def damerauLevenshtein(l: UTF8String, r: UTF8String): Int = {
    val a = l.toString; val b = r.toString
    val na = a.length; val nb = b.length
    if (na == 0) return nb
    if (nb == 0) return na
    val inf = na + nb
    val d = Array.ofDim[Int](na + 2, nb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= na) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= nb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val last = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= na) {
      var db = 0
      j = 1
      while (j <= nb) {
        val k = { val v = last.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue() }
        val lpos = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1,
            d(k)(lpos) + (i - k - 1) + 1 + (j - lpos - 1)))
        j += 1
      }
      last.put(a.charAt(i - 1), i)
      i += 1
    }
    d(na + 1)(nb + 1)
  }
}

/** jaro_winkler_similarity(a, b) → double in [0,1]. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"JaroWinklerSim expects two strings, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    StrSim.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StrSim.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinklerSim = copy(left = l, right = r)
}

/** damerau_levenshtein(a, b) → int edit distance. */
case class DamerauLevenshteinDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"DamerauLevenshteinDist expects two strings, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    StrSim.damerauLevenshtein(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StrSim.damerauLevenshtein($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DamerauLevenshteinDist =
    copy(left = l, right = r)
}

/** Column-API entry points. */
object StringSimilarity {
  import org.apache.spark.sql.GraftSql

  def jaroWinkler(a: Column, b: Column): Column =
    GraftSql.column(JaroWinklerSim(
      GraftSql.catalystExpression(a), GraftSql.catalystExpression(b)))

  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftSql.column(DamerauLevenshteinDist(
      GraftSql.catalystExpression(a), GraftSql.catalystExpression(b)))
}
