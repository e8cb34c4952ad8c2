package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft_char_entropy(text): per-document character entropy in one
  * codegen'd pass — output struct(n_chars: long, entropy_nats: double)
  * with H = Σ c·⌊ln(n/c)·10⁶+0.5⌋ / (n·10⁶), floor-rounded at 6 dp.
  *
  * Bit-identical to the explode(split(text,'')) → per-(doc,char)
  * count → doc-window → integer micro-nat sum formulation it replaces
  * (and to the DuckDB oracle's string_split CTE): the per-char ln uses
  * the same java.lang.Math.log Catalyst's Log generates, the micro-nat
  * quantization and final rounding replay the identical IEEE double
  * ops in the identical order. It exists because entropy is a PER-ROW
  * statistic: the exploded form materializes one row PER CHARACTER
  * into a corpus-wide (doc,char) aggregation + window (|chars| rows
  * through two exchanges) where one byte-bounded loop per document
  * needs none — the whole query becomes a map-only projection over
  * the at-rest-sorted corpus. Characters are Unicode code points,
  * matching regex-split("")'s zero-width boundary semantics; the
  * empty document mirrors split's [""] singleton (n_chars=1, H=0).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_char_entropy"

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("entropy_nats", DoubleType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {

  /** One pass: count code points into a small open map (ASCII fast
    * path: a 128-slot array), then fold the micro-nat entropy sum. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    if (s.isEmpty) return InternalRow(1L, 0.0) // split("") → [""]
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val slot = other.computeIfAbsent(cp, _ => new Array[Long](1))
        slot(0) += 1L
      }
      n += 1L
      i += Character.charCount(cp)
    }
    val nD = n.toDouble
    var sumT = 0L
    var c = 0
    while (c < 128) {
      val cnt = ascii(c)
      if (cnt > 0L)
        sumT += math.floor(math.log(nD / cnt.toDouble) * 1000000 + 0.5)
          .toLong * cnt
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val cnt = it.next()(0)
        sumT += math.floor(math.log(nD / cnt.toDouble) * 1000000 + 0.5)
          .toLong * cnt
      }
    }
    val ent = math.floor(
      sumT.toDouble / (n * 1000000L).toDouble * 1000000 + 0.5) / 1000000.0
    InternalRow(n, ent)
  }

  /** Column form over a string column. */
  def of(c: Column): Column =
    GraftColumnBridge.column(CharEntropy(GraftColumnBridge.expression(c)))
}
