package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Arbitrary per-group kernel execution — the Spark analogue of
  * scida's `map_group_operation` (reference:
  * src/scida/customs/arepo/dataset.py:1448), which runs a custom
  * function over each halo's particle chunk.
  *
  * Spark-first shape: `groupByKey(...).mapGroups(kernel)` — ONE
  * shuffle on the group key, then the kernel streams each group's
  * rows as an iterator on the executor. The kernel never sees more
  * than one group and the engine never materializes the corpus, so a
  * group table of any cardinality works as long as single groups fit
  * an executor (scida makes the same assumption per-chunk). For
  * algebraic kernels prefer groupBy+agg (codegen'd); this is the
  * escape hatch for genuinely imperative per-group logic.
  */
object GroupKernel {

  def perGroup[T, K: Encoder, R: Encoder](ds: Dataset[T], key: T => K)(
      kernel: (K, Iterator[T]) => R): Dataset[R] =
    ds.groupByKey(key).mapGroups((k, it) => kernel(k, it))
}
