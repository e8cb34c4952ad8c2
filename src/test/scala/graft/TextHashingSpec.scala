package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hashing, TextOps}

class TextHashingSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: k-word windows, dedup, short-doc fallback") {
    val df = Seq("a b c d", "x y").toDF("text")
    val sh = df.select(Hashing.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0).toSet == Set("a b c", "b c d"))
    assert(sh(1) == Seq("x y"))
  }

  test("jaccard on shingle arrays") {
    val df = Seq(("a b c d", "b c d e")).toDF("t1", "t2")
    val j = df.select(Hashing.jaccard(
      Hashing.shingles(col("t1"), 2), Hashing.shingles(col("t2"), 2)))
      .as[Double].head()
    // shingles t1: {a b, b c, c d}, t2: {b c, c d, d e} → 2/4
    assert(j == 0.5)
  }

  test("minhash signature is deterministic and length k") {
    val df = Seq("a b c d e f", "a b c d e f").toDF("text")
    val sigs = df.select(Hashing.minhashSignature(
      Hashing.shingles(col("text"), 3), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0).length == 16 && sigs(0) == sigs(1))
  }

  test("minhash similarity estimates jaccard") {
    // two texts sharing most shingles → most signature slots agree
    val df = Seq(("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz")).toDF("t1", "t2")
    val (s1, s2) = df.select(
      Hashing.minhashSignature(Hashing.shingles(col("t1"), 3), 128).as("a"),
      Hashing.minhashSignature(Hashing.shingles(col("t2"), 3), 128).as("b"))
      .as[(Seq[Long], Seq[Long])].head()
    val agree = s1.zip(s2).count { case (a, b) => a == b } / 128.0
    val trueJ = 7.0 / 9.0 // 8 shingles each, 7 shared → union 9
    assert(math.abs(agree - trueJ) < 0.15)
  }

  test("simhash: identical texts collide, unrelated texts are far") {
    val df = Seq("spark catalyst plan optimizer engine",
      "spark catalyst plan optimizer engine",
      "completely different words entirely here").toDF("text")
    val sims = df.select(Hashing.simhash(split(col("text"), " ")))
      .as[Long].collect()
    assert(sims(0) == sims(1))
    assert(java.lang.Long.bitCount(sims(0) ^ sims(2)) > 10)
  }

  test("native graft_minhash is bit-identical to the seeded-xxhash64 column form") {
    val df = Seq(("d1", "the quick brown fox jumps over the lazy dog"),
      ("d2", "pack my box with five dozen liquor jugs"),
      ("d3", "a b")).toDF("doc_id", "text")
      .select(col("doc_id"), Hashing.shingles(col("text"), 3).as("sh"))
    val native = Hashing.minhashSignatures(df, "doc_id", "sh", 32)
      .as[(String, Seq[Long])].collect().toMap
    val columnForm = df.select(col("doc_id"),
        Hashing.minhashSignature(col("sh"), 32).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(native == columnForm)
  }

  test("native graft_minhash drops empty-shingle docs, as explode did") {
    val df = Seq(("d1", Seq("a b c")), ("d2", Seq.empty[String]))
      .toDF("doc_id", "sh")
    val ids = Hashing.minhashSignatures(df, "doc_id", "sh", 8)
      .select("doc_id").as[String].collect()
    assert(ids.toSeq == Seq("d1"))
  }

  test("native graft_simhash is bit-identical to the column form") {
    val df = Seq(("d1", "spark catalyst plan optimizer engine"),
      ("d2", "completely different words entirely here"),
      ("d3", "x")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val native = Hashing.simhashes(df, "doc_id", "w")
      .as[(String, Long)].collect().toMap
    val columnForm = df.select(col("doc_id"), Hashing.simhash(col("w")))
      .as[(String, Long)].collect().toMap
    assert(native == columnForm)
  }

  test("property: native signatures match the column forms on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "longword-with-punct!",
      "ünïcode", "词", "a", "")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"), Hashing.shingles(col("text"), 2).as("sh"),
        split(col("text"), " ").as("w"))
    val mhNative = Hashing.minhashSignatures(df, "doc_id", "sh", 16)
      .as[(Long, Seq[Long])].collect().toMap
    val mhColumn = df.select(col("doc_id"), Hashing.minhashSignature(col("sh"), 16))
      .as[(Long, Seq[Long])].collect().toMap
    assert(mhNative == mhColumn)
    val shNative = Hashing.simhashes(df, "doc_id", "w")
      .as[(Long, Long)].collect().toMap
    val shColumn = df.select(col("doc_id"), Hashing.simhash(col("w")))
      .as[(Long, Long)].collect().toMap
    assert(shNative == shColumn)
  }

  test("graft_pos_shingles: positional, ordered, duplicates kept, short docs empty") {
    val df = Seq("a b a b a", "x", "one two three").toDF("text")
      .select(call_function("graft_pos_shingles", col("text"), lit(2)).as("p"))
      .as[Seq[Long]].collect()
    assert(df(0).length == 4)          // 5 words -> 4 windows
    assert(df(0)(0) == df(0)(2))       // "a b" at 0 and 2: same hash
    assert(df(0)(1) == df(0)(3))       // "b a" at 1 and 3
    assert(df(0)(0) != df(0)(1))
    assert(df(1).isEmpty)              // 1 word < k
    assert(df(2).length == 2 && df(2)(0) != df(2)(1))
  }

  test("langid picks dictionary language") {
    val df = Seq("the cat and the dog", "der hund und die katze",
      "qqq www eee").toDF("text")
    val preds = df.select(TextOps.langId(col("text"))).as[String].collect()
    assert(preds.toSeq == Seq("en", "de", "und"))
  }

  test("bag fingerprint canonicalizes order and repetition") {
    val df = Seq("b a a b", "a b", "a c").toDF("text")
    val fps = df.select(TextOps.bagFingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("winnowing fingerprint: equal texts equal, shifted text overlaps") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "PREFIX the quick brown fox jumps over the lazy dog").toDF("text")
    val fps = df.select(TextOps.winnowingFingerprint(col("text")).as("f"))
      .as[Seq[Long]].collect()
    assert(fps(0) == fps(1))
    val overlap = fps(0).toSet.intersect(fps(2).toSet).size.toDouble / fps(0).length
    assert(overlap > 0.5) // winnowing is robust to prefix shift
  }

  test("token counts: ws and bpe-ish") {
    val df = Seq("ab cd12 e!").toDF("text")
    val r = df.select(TextOps.wsTokenCount(col("text")),
      TextOps.bpeishTokenCount(col("text"))).as[(Int, Int)].head()
    assert(r == ((3, 5))) // [ab] [cd][12] [e][!]
  }

  test("documents contract: doc_id unique (bm25 df = count over tf groups relies on it)") {
    // bm25Top derives df as count(1) over (doc_id, dl, term) groups —
    // equal to count(DISTINCT doc_id) ONLY while doc_id never repeats
    // (dl is then functionally determined by doc_id). A regenerated
    // fixture with duplicate doc_ids must fail HERE, loudly, not as a
    // silent parity drift in the retrieval family.
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val dups = docs.groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dups == 0L,
      s"documents.doc_id must be unique; found $dups duplicated ids — " +
        "bm25's count(1)-over-tf-groups df shortcut is unsound on this fixture")
  }
}
