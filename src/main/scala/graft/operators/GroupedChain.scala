package graft.operators

import org.apache.spark.sql.{Column, Dataset, Encoder}

/** Chained per-group operation DAG — the scida composable grouped
  * pipeline (reference: src/scida/customs/arepo/dataset.py:789
  * `ChainOps`, :826 `GroupAwareOperation` with
  * chain/apply/half/min/max/sum/evaluate): intermediate ops transform
  * each group's ordered value sequence, one final op reduces it, and
  * nothing executes until `evaluate`.
  *
  * Spark-first shape: the chain is driver-side function composition;
  * evaluation is ONE shuffle on the group key via
  * `groupByKey(...).flatMapSortedGroups` — rows stream through each
  * group's kernel in (group, order) sorted order, so order-sensitive
  * ops (`half` = every second particle, scida's x[::2]) are
  * deterministic regardless of input partitioning. Like
  * `map_group_operation`, single groups must fit an executor; the
  * corpus never does. For purely algebraic single-step chains prefer
  * groupBy+agg (codegen'd) — this is the composition escape hatch.
  *
  * @tparam K group key   @tparam V per-row value
  */
final class GroupedChain[K, V] private (
    rows: Dataset[(K, Long, V)],
    ops: Vector[Iterator[V] => Iterator[V]],
    finalOp: Option[Iterator[V] => V]) {

  private def chained(op: Iterator[V] => Iterator[V]): GroupedChain[K, V] = {
    require(finalOp.isEmpty, "Cannot chain any additional operation.") // dataset.py:875
    new GroupedChain(rows, ops :+ op, None)
  }

  private def withFinal(f: Iterator[V] => V): GroupedChain[K, V] = {
    require(finalOp.isEmpty, "Cannot chain any additional operation.")
    new GroupedChain(rows, ops, Some(f))
  }

  /** Arbitrary intermediate op over the group's ordered values —
    * GroupAwareOperation.apply/chain. */
  def apply(op: Iterator[V] => Iterator[V]): GroupedChain[K, V] = chained(op)

  /** Element-wise transform (a lazy per-element chain link). */
  def map(f: V => V): GroupedChain[K, V] = chained(_.map(f))

  /** Element predicate (membership-style chain link). */
  def filter(p: V => Boolean): GroupedChain[K, V] = chained(_.filter(p))

  /** Every second element of the ordered group — scida's test op
    * x[::2] (dataset.py:931 `half`). */
  def half: GroupedChain[K, V] =
    chained(_.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v })

  def sum(implicit num: Numeric[V]): GroupedChain[K, V] =
    withFinal(_.foldLeft(num.zero)(num.plus))

  def min(implicit ord: Ordering[V]): GroupedChain[K, V] = withFinal(_.min)

  def max(implicit ord: Ordering[V]): GroupedChain[K, V] = withFinal(_.max)

  /** Restrict evaluation to group keys `<= nmax` — scida's
    * `evaluate(nmax=…)` (docs/halocatalogs.md: halos are mass-ordered,
    * so bounding the id bounds the work). A Column predicate on the
    * key — NOT a typed closure, which Catalyst cannot convert to
    * data-source filters — so the comparison pushes to the scan and
    * cost scales with the kept groups, not the catalog. */
  def limitGroups(nmax: K): GroupedChain[K, V] = {
    import org.apache.spark.sql.functions.{col, lit}
    new GroupedChain(rows.filter(col("_1") <= lit(nmax)), ops, finalOp)
  }

  /** Restrict evaluation to an explicit group-id list — scida's
    * `evaluate(idxlist=…)`, as a pushed-down In predicate (fine for
    * the bounded id lists the reference accepts; unbounded selections
    * should pre-filter the frame). */
  def forGroups(ids: Set[K]): GroupedChain[K, V] = {
    import org.apache.spark.sql.functions.col
    new GroupedChain(rows.filter(col("_1").isInCollection(ids)), ops, finalOp)
  }

  /** Run the chain: one row per group. Requires a final op, like
    * GroupAwareOperation.evaluate. */
  def evaluate(implicit kEnc: Encoder[K], enc: Encoder[(K, V)]): Dataset[(K, V)] = {
    val fin = finalOp.getOrElse(
      throw new IllegalStateException("chain has no final operation; call sum/min/max"))
    evaluateWith(fin)
  }

  /** Run the chain with a custom final reduction (grouped().apply(f,
    * final=True).evaluate()). */
  def evaluateWith[R](fin: Iterator[V] => R)(
      implicit kEnc: Encoder[K], enc: Encoder[(K, R)]): Dataset[(K, R)] = {
    val chain = ops
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapSortedGroups($"_2") { (k: K, it: Iterator[(K, Long, V)]) =>
        val vs = chain.foldLeft(it.map(_._3))((acc, op) => op(acc))
        Iterator.single((k, fin(vs)))
      }
  }
}

object GroupedChain {
  /** Start a chain from (group, order, value) typed rows; `order`
    * fixes the within-group sequence the ops see. */
  def of[K, V](rows: Dataset[(K, Long, V)]): GroupedChain[K, V] =
    new GroupedChain(rows, Vector.empty, None)

  /** Start from a DataFrame by naming the key/order/value columns. */
  def of[K: Encoder, V: Encoder](df: org.apache.spark.sql.DataFrame,
      key: Column, order: Column, value: Column)(
      implicit enc: Encoder[(K, Long, V)]): GroupedChain[K, V] =
    // tuple-position names so the sorted-groups order column resolves
    of(df.select(key.as("_1"), order.cast("long").as("_2"), value.as("_3"))
      .as[(K, Long, V)])
}
