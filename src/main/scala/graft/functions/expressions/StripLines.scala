package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_strip_lines(text): drop every line whose NORMALIZED form is
  * in the (plan-literal) boilerplate set; surviving lines re-join in
  * original order. Returns NULL when no line survives (C4 semantics:
  * a doc that is all boilerplate drops out of the corpus — callers
  * filter isNotNull).
  *
  * Normalization is definitionally identical to the DataFrame form
  * `lower(trim(line))` the statistic build uses: the same
  * `UTF8String.trim()` (0x20 only) + `UTF8String.toLowerCase()` that
  * Spark's StringTrim/Lower call, and the same `Pattern.quote(sep)`
  * split with limit -1 (trailing empties kept) as
  * `split(col, quoted)`. Empty lines are KEPT (the statistic excludes
  * them), exactly as the anti-join form keeps them.
  *
  * This is the C4 deployment shape: the >= minDocs statistic is a
  * bounded corpus artifact (the distinct nav/footer/banner lines),
  * shipped to every task as a set — the corpus is stripped in ONE
  * map-side pass with no explode, no line-key join, and no doc-key
  * reassembly shuffle. The DataFrame fallback
  * (Dedup.stripLineTable) remains for a boiler set too large to ship
  * as a literal.
  */
case class StripLines(child: Expression, sep: String,
    boiler: Set[String]) extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_strip_lines"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  private lazy val quoted = java.util.regex.Pattern.quote(sep)

  override protected def nullSafeEval(input: Any): Any = {
    val lines = input.asInstanceOf[UTF8String].toString.split(quoted, -1)
    val kept = new StringBuilder
    var n = 0
    var i = 0
    while (i < lines.length) {
      val norm = UTF8String.fromString(lines(i)).trim().toLowerCase.toString
      if (!boiler.contains(norm)) {
        if (n > 0) kept.append(sep)
        kept.append(lines(i))
        n += 1
      }
      i += 1
    }
    if (n == 0) null else UTF8String.fromString(kept.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripLines {
  def of(text: Column, sep: String, boiler: Set[String]): Column =
    GraftColumnBridge.column(
      StripLines(GraftColumnBridge.expression(text), sep, boiler))
}
