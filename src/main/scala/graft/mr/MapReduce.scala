package graft.mr

import org.apache.spark.sql.{Dataset, Encoder}

/** Generic typed map/reduce surface — capability parity with the
  * reference's entire query mechanism (yamr mapper.py:112-122 `run_map`,
  * reducer.py:131-139 `run_reduce`), compiled onto Spark Datasets.
  *
  * Semantics: ONE group per distinct key — the intended contract, not the
  * reference's concat-of-sorted-runs bug (SURVEY §2.4: `combine_data`
  * seeds the current group from the first *unsorted* element, producing
  * spurious empty/duplicate groups on multi-mapper input; word_count.py:44-48).
  *
  * Scale notes: `mapReduce` is the fully-general contract
  * (`groupByKey.flatMapGroups` — shuffles raw pairs, no partial
  * aggregation, faithfully matching the reference's no-combiner dataflow,
  * mapper.py:124-136). For algebraic reducers use `mapReduceByKey`, which
  * Spark plans with partial aggregation (map-side combine) — the 100 TB
  * path the reference lacks.
  */
object MapReduce {

  /** Fully-general contract: map emits (K,V) pairs, reduce sees each key
    * once with all its values.
    */
  def mapReduce[I, K, V, O](ds: Dataset[I])(
      mapFn: I => IterableOnce[(K, V)],
      reduceFn: (K, Iterator[V]) => IterableOnce[O])(
      implicit kvEnc: Encoder[(K, V)], kEnc: Encoder[K], oEnc: Encoder[O]): Dataset[O] =
    ds.flatMap(mapFn)(kvEnc)
      .groupByKey(_._1)(kEnc)
      .flatMapGroups((key: K, it: Iterator[(K, V)]) => reduceFn(key, it.map(_._2)))(oEnc)

  /** Algebraic fast path: commutative/associative combine, planned with
    * map-side partial aggregation.
    */
  def mapReduceByKey[I, K, V](ds: Dataset[I])(
      mapFn: I => IterableOnce[(K, V)],
      combine: (V, V) => V)(
      implicit kvEnc: Encoder[(K, V)], kEnc: Encoder[K], vEnc: Encoder[V]): Dataset[(K, V)] =
    ds.flatMap(mapFn)(kvEnc)
      .groupByKey(_._1)(kEnc)
      .mapValues(_._2)(vEnc)
      .reduceGroups(combine)
}
