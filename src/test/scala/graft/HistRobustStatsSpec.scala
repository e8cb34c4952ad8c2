package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.HistRobustStats

/** graft_hist_robust_stats vs a Scala brute-force replay of the
  * weighted-median/MAD/outlier rule (the window/fold forms it
  * replaced): smallest value with 2·cum >= n + n mod 2, MAD over the
  * folded deviation histogram, outliers where dev > 3·MAD. */
class HistRobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def brute(h: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val n = h.map(_._2).sum
    val thresh = n + n % 2
    def med(pairs: Seq[(Long, Long)]): Long = {
      var cum = 0L
      for ((v, c) <- pairs.sortBy(_._1)) {
        cum += c
        if (2 * cum >= thresh) return v
      }
      pairs.map(_._1).max
    }
    val m = med(h)
    val dev = h.map { case (v, c) => (math.abs(v - m), c) }
    val mad = med(dev)
    (n, m, mad, dev.collect { case (dv, c) if dv > 3 * mad => c }.sum)
  }

  private def viaExpr(h: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val df = h.toDF("v", "c")
      .agg(collect_list(struct(col("v"), col("c"))).as("h"))
      .select(HistRobustStats.of(col("h")).as("s"))
      .select("s.n", "s.med", "s.mad", "s.outliers")
    df.as[(Long, Long, Long, Long)].head()
  }

  test("matches brute force on hand cases: ties, even/odd n, outliers") {
    val cases = Seq(
      Seq(1L -> 2L, 5L -> 1L, 3L -> 1L),          // even n, duplicate-weight median
      Seq(7L -> 1L),                              // single bucket: mad 0, no outliers
      Seq(0L -> 3L, 100L -> 1L),                  // a far outlier
      Seq(-5L -> 2L, 0L -> 2L, 5L -> 2L),         // negatives, even n
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 1000L -> 2L))
    for (h <- cases) assert(viaExpr(h) == brute(h), s"case $h")
  }

  test("matches brute force on random weighted histograms") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val m = 1 + rnd.nextInt(40)
      val h = Seq.fill(m)((rnd.nextInt(200).toLong - 100L,
        1L + rnd.nextInt(5).toLong))
        .groupBy(_._1).map { case (v, xs) => (v, xs.map(_._2).sum) }.toSeq
      assert(viaExpr(h) == brute(h), s"case $h")
    }
  }
}
