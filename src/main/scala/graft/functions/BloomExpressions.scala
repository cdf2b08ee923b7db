package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter — the scalar half
  * of the runtime-filter pattern (see graft.operators.Joins
  * .bloomSemiJoin). The filter is a reference object in generated code,
  * so the probe is one virtual call inside whole-stage codegen; false
  * positives are possible by construction (callers follow with an
  * exact join), false negatives are not.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"BloomMightContain expects an integral key, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long    => bloom.mightContainLong(l)
    case i: java.lang.Integer => bloom.mightContainLong(i.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)

  override def prettyName: String = "bloom_might_contain"
}
