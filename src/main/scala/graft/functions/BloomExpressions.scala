package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter — the scalar half
  * of the runtime-filter pattern (see graft.operators.Joins
  * .bloomSemiJoin). The filter travels as a TORRENT BROADCAST: the
  * expression (and so every task binary) carries only the broadcast
  * stub, and each executor fetches the ~1 MB bitmap once — embedding
  * the filter object directly was the r11 bench tail's 1.2 MB
  * task-binary warning (the bits re-shipped with every task). The
  * probe is one virtual call on a per-stage-cached reference inside
  * whole-stage codegen; false positives are possible by construction
  * (callers follow with an exact join), false negatives are not.
  */
case class BloomMightContain(child: Expression,
                             bloomBc: org.apache.spark.broadcast.Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"BloomMightContain expects an integral key, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long    => bloomBc.value.mightContainLong(l)
    case i: java.lang.Integer => bloomBc.value.mightContainLong(i.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = "org.apache.spark.broadcast.Broadcast"
    val ref = ctx.addReferenceObj("bloomBc", bloomBc, bcCls)
    // resolve the broadcast once per task, not once per row
    val filter = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) (($bcCls) $ref).value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $filter.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)

  override def prettyName: String = "bloom_might_contain"
}
