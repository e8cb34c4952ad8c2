package graft.functions

import org.apache.spark.sql.Column

/** Byte-pair-encoding tokenizer: the token-counting backbone of a
  * training-data pipeline (token budgets, packing, fertility — all
  * downstream of a REAL learned subword vocabulary, not the regex
  * stand-in `TextOps.bpeishTokenCount`).
  *
  * Training is the classic Sennrich et al. merge loop and is
  * inherently sequential in the merge rank, so it runs driver-side
  * over the corpus's WORD-COUNT table — vocabulary-sized, not
  * corpus-sized, and capped by the caller (the same bounded-driver
  * discipline as the ANN quantizer samples). Application is a
  * codegen'd native expression (`BpeTokenCount`/`BpeTokens`): the
  * learned merge ranks ride the plan as one reference object, so
  * encoding runs at scan speed inside whole-stage codegen with zero
  * shuffle — the 100 TB path tokenizes in the same pass that reads.
  *
  * No end-of-word marker: tokens of a word concatenate back to the
  * word exactly (the reconstruction invariant BpeSpec pins), which
  * also makes the per-word token count independent of context.
  */
object Bpe {

  /** Learn `numMerges` merges from (word, count) pairs. Deterministic:
    * the best pair each round is max total count, ties to the
    * lexicographically smallest (left, right). Stops early when no
    * adjacent pair occurs twice. */
  def trainMerges(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    // symbol sequences per word; merging rewrites these in place
    var words: Array[(Array[String], Long)] = wordCounts
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (w.map(_.toString).toArray, c) }
      .toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts.merge((syms(i), syms(i + 1)), c, java.lang.Long.sum(_, _))
          i += 1
        }
      }
      var best: (String, String) = null
      var bestC = 1L // require count >= 2: merging singletons is noise
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getKey; val c = e.getValue
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) return merges.toSeq
      merges += best
      val joined = best._1 + best._2
      words = words.map { case (syms, c) =>
        if (syms.length < 2) (syms, c)
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
      round += 1
    }
    merges.toSeq
  }

}

/** Compiled BPE application state: merge pair → rank. One instance per
  * expression, shipped to executors as a BROADCAST handle (top-level
  * class: generated Java references it by its source name). */
final class BpeTokenizer(merges: Seq[(String, String)]) extends Serializable {
  private val ranks = new java.util.HashMap[String, Integer](merges.length * 2)
  merges.zipWithIndex.foreach { case ((a, b), r) =>
    // NUL never occurs inside symbols (they come from split words)
    ranks.putIfAbsent(a + "\u0000" + b, r)
  }

  private def rankOf(a: String, b: String): Int = {
    val r = ranks.get(a + "\u0000" + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  /** Standard BPE apply: repeatedly merge the LOWEST-rank adjacent
    * pair, left-to-right within a rank, until none applies. */
  def encodeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = word.charAt(i).toString; i += 1 }
    while (syms.length > 1) {
      var bestR = Int.MaxValue
      var bestI = -1
      i = 0
      while (i < syms.length - 1) {
        val r = rankOf(syms(i), syms(i + 1))
        if (r < bestR) { bestR = r; bestI = i }
        i += 1
      }
      if (bestI < 0 || bestR == Int.MaxValue) return syms
      val out = new Array[String](syms.length - 1)
      System.arraycopy(syms, 0, out, 0, bestI)
      out(bestI) = syms(bestI) + syms(bestI + 1)
      System.arraycopy(syms, bestI + 2, out, bestI + 1, syms.length - bestI - 2)
      syms = out
    }
    syms
  }

  /** Token count of a whole space-separated text: sum of per-word
    * counts (empty words contribute 0). Used from generated code. */
  def countTokens(text: org.apache.spark.unsafe.types.UTF8String): Int = {
    var total = 0
    var i = 0
    val s = text.toString
    var start = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) total += encodeWord(s.substring(start, i)).length
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Token array of a whole space-separated text, word order kept.
    * Used from generated code. */
  def tokens(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val s = text.toString
    var i = 0
    var start = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) encodeWord(s.substring(start, i)).foreach(t =>
          out += org.apache.spark.unsafe.types.UTF8String.fromString(t))
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object BpeColumns {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column API: BPE token count of `text` under broadcast `tok`. */
  def tokenCount(text: Column,
      tok: org.apache.spark.broadcast.Broadcast[BpeTokenizer]): Column =
    column(graft.functions.expressions.BpeTokenCount(expression(text), tok))

  /** Column API: BPE token array of `text` under broadcast `tok`. */
  def tokens(text: Column,
      tok: org.apache.spark.broadcast.Broadcast[BpeTokenizer]): Column =
    column(graft.functions.expressions.BpeTokens(expression(text), tok))
}
