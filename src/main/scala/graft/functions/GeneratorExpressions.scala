package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-valued (generator) expression — the row-producing
  * member of the engine's Catalyst extension matrix (scalar codegen
  * Expressions, TypedImperativeAggregate, LogicalPlan+Strategy+
  * SparkPlan, optimizer Rule, DataSourceV2, and this Generator).
  *
  * Emits one (pos, shingle) row per positional k-word shingle of the
  * input word array — the exploded inverted-index representation
  * (positional, NOT distinct: winnowing / positional indexes need
  * duplicates and order). The analyzer's ExtractGenerators rewrites a
  * select of this into a Generate node, so it composes with any
  * projection; per-row output size is (words - k + 1), and the
  * operator is map-side only.
  *
  * Generators run through GenerateExec's eval path (like most builtin
  * non-explode generators) — CodegenFallback keeps the surrounding
  * projection codegen'd.
  */
case class WordShingleGenerate(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"WordShingleGenerate expects array<string>, got ${dt.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Iterator.empty
    val words = arr.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < k) return Iterator.empty
    val sep = UTF8String.fromString(" ")
    // windows touching a null element are skipped (a shingle containing
    // null is meaningless, and emitting null would violate the declared
    // non-nullable element schema)
    (0 to n - k).iterator.flatMap { i =>
      val parts = new Array[UTF8String](2 * k - 1)
      var j = 0
      var hasNull = false
      while (j < k) {
        val w = words.getUTF8String(i + j)
        if (w == null) hasNull = true
        parts(2 * j) = w
        if (j < k - 1) parts(2 * j + 1) = sep
        j += 1
      }
      if (hasNull) Iterator.empty
      else Iterator.single(InternalRow(i, UTF8String.concat(parts: _*)))
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingleGenerate =
    copy(child = c)

  override def prettyName: String = "word_shingles"
}
