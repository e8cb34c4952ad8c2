package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.expressions.ShingleArray

/** Property test: the native byte-scan shingler must agree, byte for
  * byte, with the definitional formulation (regex split on a single
  * space keeping empties, k-window join by " ", first-occurrence
  * dedup, whole-text fallback) — the DuckDB parity oracle encodes
  * exactly those semantics, so any divergence is a correctness bug,
  * not a perf detail. Pure catalyst eval, seeded generator. */
class ShinglePropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(7)

  /** The definitional reference (what split+zip_with computed). */
  private def ref(text: String, k: Int): Seq[String] = {
    val ws = text.split(" ", -1).toSeq
    if (ws.length < k) Seq(text)
    else ws.sliding(k).map(_.mkString(" ")).toSeq.distinct
  }

  private def native(text: String, k: Int): Seq[String] = {
    val out = ShingleArray(Literal(UTF8String.fromString(text),
      org.apache.spark.sql.types.StringType), k)
      .eval(null).asInstanceOf[ArrayData]
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  private val vocab = Seq("the", "fox", "a", "", "naïve", "öl", "日本語",
    "x", "zz", "émigré")

  test("native == definitional on 2000 random docs (incl. empties and multibyte)") {
    (1 to 2000).foreach { _ =>
      val n = rng.nextInt(12) // 0..11 words
      val text = Seq.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" ")
      val k = 1 + rng.nextInt(4)
      assert(native(text, k) == ref(text, k), s"text='$text' k=$k")
    }
  }

  test("edge cases: empty string, lone spaces, all-empty tokens") {
    for (t <- Seq("", " ", "  ", "a", "a ", " a", "a  b", "   ");
         k <- 1 to 3)
      assert(native(t, k) == ref(t, k), s"text='$t' k=$k")
  }
}
