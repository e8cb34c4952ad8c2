package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd BPE application (see `functions.Bpe`): the learned merge
  * ranks ride as a BROADCAST `Bpe.Tokenizer` handle inside the
  * expression — tasks serialize only the handle and the (possibly
  * 100k-merge) rank table is fetched once per executor, the same
  * plan-weight discipline as `BloomMightContain`. Encoding is one
  * virtual call per row inside whole-stage codegen: tokenization runs
  * in the same pass that scans the parquet, zero shuffle.
  */
case class BpeTokenCount(child: Expression,
    tok: Broadcast[graft.functions.BpeTokenizer]) extends UnaryExpression {

  override def prettyName: String = "graft_bpe_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count expects string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    tok.value.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bpeTokBc", tok,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ((graft.functions.BpeTokenizer) $b.value()).countTokens($c);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Token ARRAY variant — the materializing form for pipelines that
  * need the tokens themselves (packing, vocabulary audits). */
case class BpeTokens(child: Expression,
    tok: Broadcast[graft.functions.BpeTokenizer]) extends UnaryExpression {

  override def prettyName: String = "graft_bpe_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tokens expects string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    tok.value.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bpeTokBc", tok,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ((graft.functions.BpeTokenizer) $b.value()).tokens($c);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
