package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shingling + MinHash + SimHash hash family for near-duplicate
  * detection at scale.
  *
  * Design (SURVEY.md §4): signatures are computed MAP-SIDE in one scan
  * with codegen'd hash expressions (`xxhash64` seeded by constant
  * column position — fully deterministic, no session seeds, so
  * signatures agree across cluster sizes and reruns). Candidate
  * generation shuffles only (band-key, doc-id) pairs — O(docs × bands),
  * independent of document length — and exact verification runs only
  * on candidate pairs.
  */
object Hashing {

  /** Word-level k-shingles: contiguous k-word windows joined by a
    * space, deduplicated. Docs shorter than k words yield their whole
    * text as the single shingle. */
  def shingles(text: Column, k: Int = 3): Column = {
    val ws = split(text, " ")
    val n = size(ws)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(1), n - (k - 1)),
          i => array_join(slice(ws, i, lit(k)), " ")))
        .otherwise(array(text)))
  }

  /** MinHash signature of a shingle-array column: element i is
    * min over shingles of xxhash64(i, shingle). One map-side pass,
    * k hash evaluations per shingle. */
  def minhashSignature(shingleArr: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingleArr, s => xxhash64(seed, s))))

  /** LSH band keys for a minhash signature: hash of each band of
    * `rowsPerBand` consecutive signature entries, tagged with the band
    * index so different bands never collide. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(b, array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ",")).as("key")))

  /** 64-bit SimHash of a word-array column: per-word xxhash64, sum
    * ±1 per bit position over words, sign → bit. Pure expression —
    * computed map-side. */
  def simhash(wordsArr: Column): Column = {
    val hashes = transform(wordsArr, w => xxhash64(w))
    val bitSums = transform(sequence(lit(0), lit(63)), b =>
      aggregate(hashes, lit(0),
        (acc, h) => acc + when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, b) => when(s > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two int64 columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash band keys: the 4 16-bit chunks, tagged by chunk index.
    * Any pair within Hamming distance 3 shares at least one exact
    * chunk (pigeonhole), so a join on chunk keys finds all such pairs
    * while shuffling only (chunk, doc) pairs. */
  def simhashBands(sim: Column): Column =
    transform(sequence(lit(0), lit(3)), b =>
      struct(b.as("band"),
        call_function("shiftright", sim, b * 16).bitwiseAND(0xFFFFL).as("key")))

  /** Exact Jaccard similarity between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Candidate-pair generation via LSH bands: explode band keys,
    * self-join on (band, key), keep ordered pairs once. `df` must have
    * columns (`idCol`, `sigCol` array). Shuffle is on band keys only.
    */
  def lshCandidates(df: DataFrame, idCol: String, bandsCol: String): DataFrame = {
    val e = df.select(col(idCol), explode(col(bandsCol)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = e.toDF(s"${idCol}_a", "band", "key")
    val r = e.toDF(s"${idCol}_b", "band", "key")
    l.join(r, Seq("band", "key"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"))
      .distinct()
  }
}
