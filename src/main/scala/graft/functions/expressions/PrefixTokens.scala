package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.CountMinSketch

/** graft_prefix_tokens(shingles): the PPJoin prefix of a doc's shingle
  * set — the floor((1-minJ)*n)+1 rarest token hashes under the global
  * (estimated-df, hash) total order — in ONE compiled map-side pass.
  *
  * Hash-compatible by construction with the declarative form it
  * replaces (`transform(sh, t -> xxhash64(t))` + CM-probe struct +
  * `array_sort` + `slice`): per element
  * `XXH64.hashUTF8String(s, 42)` (Spark's `xxhash64` default seed),
  * df from the SAME broadcast Count-Min sketch, ascending (df, hash)
  * sort, first `n - ceil(n*minJ) + 1` entries. Output rows (and thus
  * the PPJoin candidate set) are bit-identical.
  *
  * Why an expression instead of the HOF chain: ArrayTransform /
  * ArraySort evaluate their lambdas INTERPRETED, per element — lambda
  * variable binding, boxed struct allocation and an interpreted
  * struct ordering per comparison. Measured at sf1 (50k docs, ~10^6
  * shingles) that interpretation cost exceeded the exchange the HOF
  * form had removed; this compiled loop keeps the no-shuffle shape
  * AND the per-token cost of a codegen'd operator. Empty arrays yield
  * an empty array (explode then drops the doc, as the declarative
  * form's slice-of-empty did); null elements hash to the bare seed,
  * as `xxhash64(null)` folds.
  */
case class PrefixTokens(child: Expression,
    cms: Broadcast[CountMinSketch], minJ: Double) extends UnaryExpression {

  require(minJ > 0 && minJ <= 1, s"graft_prefix_tokens needs 0 < minJ <= 1, got $minJ")

  override def prettyName: String = "graft_prefix_tokens"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_prefix_tokens expects array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PrefixTokens.compute(input.asInstanceOf[ArrayData], cms.value, minJ)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.addReferenceObj("cmsBc", cms,
        "org.apache.spark.broadcast.Broadcast")
      s"""
         |${ev.value} = graft.functions.expressions.PrefixTokens.compute(
         |  $c, (org.apache.spark.util.sketch.CountMinSketch) $b.value(),
         |  $minJ);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PrefixTokens {

  def of(c: Column, cms: Broadcast[CountMinSketch], minJ: Double): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(PrefixTokens(expression(c), cms, minJ))
  }

  def compute(arr: ArrayData, cms: CountMinSketch, minJ: Double): GenericArrayData = {
    val n = arr.numElements()
    // prefixLen mirrors the SQL form (n - ceil(n*minJ) + 1) exactly:
    // int n widens to double, one IEEE multiply, ceil, back to int
    val want = (n - math.ceil(n * minJ) + 1).toInt
    val len = math.min(n, math.max(want, 0))
    if (len <= 0) return new GenericArrayData(new Array[Any](0))
    val hs = new Array[Long](n)
    val dfs = new Array[Long](n)
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      hs(j) = h
      dfs(j) = cms.estimateCount(java.lang.Long.valueOf(h))
      j += 1
    }
    // ascending (df, hash) — the same total order array_sort imposed
    // on struct(df, s); an index sort keeps the loop primitive
    val idx = new Array[Integer](n)
    j = 0
    while (j < n) { idx(j) = j; j += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c1 = java.lang.Long.compare(dfs(a), dfs(b))
        if (c1 != 0) c1 else java.lang.Long.compare(hs(a), hs(b))
      }
    })
    val out = new Array[Any](len)
    j = 0
    while (j < len) { out(j) = hs(idx(j)); j += 1 }
    new GenericArrayData(out)
  }
}
