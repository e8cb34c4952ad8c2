package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native probes over BROADCAST sketches — the codegen replacements
  * for the two Scala UDFs that were the repo's last interpreter
  * barriers in otherwise-native pipelines (Bloom prefilter in
  * `dedup/Dedup.incrementalKeepBloom`, Count-Min estimates in
  * `operators/FrequencySketch`). A ScalaUDF pays the
  * encoder/interpreted-call boundary per row and blocks whole-stage
  * codegen through the filter; these expressions compile to one
  * virtual call on the broadcast value inside the generated loop.
  *
  * The sketch rides as a `Broadcast` handle INSIDE the expression:
  * tasks serialize only the handle (the torrent-distributed value is
  * fetched once per executor), so a billion-entry Bloom filter never
  * ships per-task or per-plan — the property that matters at 100 TB.
  */
case class BloomMightContain(child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType
  // null hashes are "definitely absent": false, never null — matching
  // the `h != null && mightContain` UDF this replaces, so both filter
  // branches (might / !might) still partition all rows
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects string or bigint, got ${other.catalogString}")
  }

  // probe method must match the INSERT encoding: DataFrameStatFunctions
  // .bloomFilter on a bigint column putLongs, on a string column
  // putStrings — mixing them silently never matches
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && (child.dataType match {
      case LongType => bloom.value.mightContainLong(v.asInstanceOf[Long])
      case _ => bloom.value.mightContainString(v.toString)
    })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    val c = child.genCode(ctx)
    val probe = child.dataType match {
      case LongType => s"mightContainLong(${c.value})"
      case _ => s"mightContainString(${c.value}.toString())"
    }
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = false;
      if (!${c.isNull}) {
        ${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
          $b.value()).$probe;
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count-Min point estimate of a LONG key against a broadcast sketch
  * (`CountMinSketch.estimateCount`); null keys estimate null. */
case class CountMinEstimate(child: Expression,
    cms: Broadcast[CountMinSketch]) extends UnaryExpression {

  override def prettyName: String = "graft_cm_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cm_estimate expects bigint, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    cms.value.estimateCount(input.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("cmsBc", cms,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ((org.apache.spark.util.sketch.CountMinSketch)
        $b.value()).estimateCount((Object) java.lang.Long.valueOf($c));
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchProbes {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def bloomMightContain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    column(BloomMightContain(expression(c), bloom))

  def cmEstimate(c: Column, cms: Broadcast[CountMinSketch]): Column =
    column(CountMinEstimate(expression(c), cms))
}
