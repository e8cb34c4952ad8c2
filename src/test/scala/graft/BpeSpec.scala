package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeColumns, BpeTokenizer}

/** BPE tokenizer: trainer determinism + known merges, encode
  * reconstruction invariant, expression/driver agreement. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges learns the classic example's merges in order") {
    // Sennrich et al.'s worked example: {low:5, lower:2, newest:6,
    // widest:3}. Most frequent first pairs: (e,s)=9, then (es,t)=9...
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainMerges(wc, numMerges = 4)
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")))
    // all merges deterministic: retrain gives the identical list
    assert(Bpe.trainMerges(wc, numMerges = 4) == merges)
  }

  test("ties break to the lexicographically smallest pair") {
    // "ab" and "cd" both occur twice; (a,b) < (c,d)
    val merges = Bpe.trainMerges(Seq(("ab", 2L), ("cd", 2L)), numMerges = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("training stops when no pair repeats") {
    val merges = Bpe.trainMerges(Seq(("abc", 1L), ("def", 1L)), numMerges = 100)
    assert(merges.isEmpty)
  }

  test("encodeWord: tokens concatenate back to the word (reconstruction)") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val tok = new BpeTokenizer(Bpe.trainMerges(wc, numMerges = 10))
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "news", "x", "")) {
      assert(tok.encodeWord(w).mkString == w, s"reconstruction failed for '$w'")
    }
    // "newest" fully merges into one token with enough merges
    assert(tok.encodeWord("newest").length < "newest".length)
  }

  test("countTokens over text == sum of per-word encode lengths; empty words skip") {
    val wc = Seq(("aa", 3L), ("ab", 2L))
    val tok = new BpeTokenizer(Bpe.trainMerges(wc, numMerges = 5))
    val text = org.apache.spark.unsafe.types.UTF8String.fromString("aa ab  aa")
    val expect = tok.encodeWord("aa").length + tok.encodeWord("ab").length +
      tok.encodeWord("aa").length
    assert(tok.countTokens(text) == expect)
  }

  test("expression path agrees with the driver encoder at sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wc = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(65536)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val tokLocal = new BpeTokenizer(Bpe.trainMerges(wc, numMerges = 512))
    val tokBc = spark.sparkContext.broadcast(tokLocal)
    val rows = docs.select(col("doc_id"), col("text"),
        BpeColumns.tokenCount(col("text"), tokBc).as("n"),
        BpeColumns.tokens(col("text"), tokBc).as("toks"))
      .collect()
    rows.foreach { r =>
      val txt = r.getString(1)
      val expect = txt.split(" ", -1).filter(_.nonEmpty)
        .map(w => tokLocal.encodeWord(w).length).sum
      assert(r.getInt(2) == expect)
      // token array reconstructs the text's words in order
      assert(r.getSeq[String](3).mkString == txt.replace(" ", ""))
    }
    // merges actually compress: fewer tokens than characters
    assert(rows.forall(r => r.getInt(2) < r.getString(1).length))
  }

  test("bpe_tokens query executes and totals reconcile at sf0.001") {
    val out = CacheScope.withScope {
      SparkEntry.queries("bpe_tokens")(spark, sfDir).collect()
    }
    assert(out.nonEmpty)
    // BPE on this corpus compresses below the character count and
    // can't go below one token per word
    val chars = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // >= one token per word
      assert(r.getLong(2) < chars(r.getLong(0)))
    }
  }
}
