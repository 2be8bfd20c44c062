package graft.mr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface — the algebraic fast path for
  * the reference's reduce contract (SURVEY §7.4): mergeable buffers give
  * Spark map-side partial aggregation + spillable hash agg, which the
  * generic `flatMapGroups` contract cannot.
  */
object Aggregators {

  /** Mean with an explicit mergeable buffer (sum, count). */
  final case class AvgBuf(var sum: Double, var n: Long)
  class AvgAggregator extends Aggregator[Double, AvgBuf, Double] {
    def zero: AvgBuf = AvgBuf(0.0, 0L)
    def reduce(b: AvgBuf, v: Double): AvgBuf = { b.sum += v; b.n += 1; b }
    def merge(a: AvgBuf, b: AvgBuf): AvgBuf = { a.sum += b.sum; a.n += b.n; a }
    def finish(b: AvgBuf): Double = if (b.n == 0) Double.NaN else b.sum / b.n
    def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k (largest values) with a mergeable buffer — the
    * constant-memory per-group alternative to collect_list + sort at
    * scale.
    */
  class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    def zero: Seq[Double] = Vector.empty
    def reduce(b: Seq[Double], v: Double): Seq[Double] = insert(b, v)
    def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = b.foldLeft(a)(insert)
    def finish(b: Seq[Double]): Seq[Double] = b
    // Buffer invariant: sorted descending, size ≤ k. A full buffer whose
    // minimum already beats v is untouched (the common case on skewed
    // streams); otherwise binary-search the insertion point — O(log k)
    // compares + one O(k) copy, vs the O(k log k) re-sort per row.
    private def insert(b: Seq[Double], v: Double): Seq[Double] = {
      if (b.size >= k && v <= b.last) b
      else {
        val vec = b.toVector
        var lo = 0
        var hi = vec.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (vec(mid) > v) lo = mid + 1 else hi = mid
        }
        val nb = (vec.take(lo) :+ v) ++ vec.drop(lo)
        if (nb.size > k) nb.take(k) else nb
      }
    }
    def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
  }

  /** HyperLogLog distinct-count sketch with EXPORTABLE, mergeable register
    * state — what `approx_count_distinct` (whose HLL++ state stays inside
    * the plan) cannot give: persist per-shard/per-day sketches and fold
    * them incrementally, the 100 TB pattern where re-scanning history for
    * every refresh is off the table. Register merge is element-wise max —
    * commutative, associative, idempotent — so shard sketches combine in
    * any order and re-merging a shard is harmless.
    *
    * Standard HLL (Flajolet et al. 2007): p-bit bucket index, rank =
    * leading zeros of the remaining bits + 1, harmonic-mean estimate with
    * the linear-counting small-range correction. Input is a pre-hashed
    * 64-bit value (e.g. `xxhash64(col)`), keeping the aggregator
    * type-agnostic.
    */
  object Hll {
    def zero(p: Int): Array[Int] = {
      // the bias constant in `estimate` is only valid for m >= 128 (p >= 7)
      // and p > 18 allocates multi-MB register arrays for no accuracy gain;
      // out-of-range precisions fail loudly (same philosophy as the merge
      // precision guard) instead of silently estimating wrong
      require(p >= 7 && p <= 18, s"HLL precision must be in [7, 18], got $p")
      new Array[Int](1 << p)
    }
    def reduce(p: Int, b: Array[Int], hash: Long): Array[Int] = {
      val idx = (hash >>> (64 - p)).toInt
      val w = hash << p
      val rank = if (w == 0) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > b(idx)) b(idx) = rank
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      // folding states of different precision would silently estimate
      // wrong (or throw an opaque AIOOBE) — fail loudly instead
      require(a.length == b.length,
        s"cannot merge HLL states of different precision: ${a.length} vs ${b.length} registers")
      var i = 0
      while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    def estimate(b: Array[Int]): Long = {
      val m = b.length
      val alpha = 0.7213 / (1.0 + 1.079 / m) // bias constant for m >= 128
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) { sum += math.pow(2.0, -b(i)); if (b(i) == 0) zeros += 1; i += 1 }
      val e = alpha * m * m / sum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
        else e
      math.round(corrected)
    }
    /** Register state ↔ bytes (one rank per byte; ranks ≤ 64-p+1 ≤ 127):
      * the persistence format for per-shard sketches. */
    def serialize(b: Array[Int]): Array[Byte] = b.map(_.toByte)
    def deserialize(bytes: Array[Byte]): Array[Int] = bytes.map(_.toInt)
  }

  class HllAggregator(p: Int = 12) extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = Hll.zero(p)
    def reduce(b: Array[Int], hash: Long): Array[Int] = Hll.reduce(p, b, hash)
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = Hll.merge(a, b)
    def finish(b: Array[Int]): Long = Hll.estimate(b)
    def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Same sketch, but the OUTPUT is the serialized register state — the
    * per-shard form a pipeline persists (e.g. one sketch row per
    * day/partition) and later folds with [[Hll.merge]] for an incremental
    * global estimate, without re-scanning history.
    */
  class HllStateAggregator(p: Int = 12) extends Aggregator[Long, Array[Int], Array[Byte]] {
    def zero: Array[Int] = Hll.zero(p)
    def reduce(b: Array[Int], hash: Long): Array[Int] = Hll.reduce(p, b, hash)
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = Hll.merge(a, b)
    def finish(b: Array[Int]): Array[Byte] = Hll.serialize(b)
    def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) with exportable,
    * mergeable counter state — the frequency-estimation sibling of the
    * HLL above: persist one d×w counter table per shard/day, fold with
    * element-wise SUM (exact, commutative, associative), query any item's
    * approximate count later without keeping per-item state. Guarantees
    * are one-sided: estimate ≥ true count always (counters only
    * overcount on collisions), and estimate ≤ true + (e/w)·N with
    * probability 1 − e^(−d).
    *
    * Rows use Kirsch–Mitzenmacher double hashing over a pre-hashed 64-bit
    * input: row i indexes at (h₁ + i·h₂) mod w with h₁/h₂ the high/low
    * 32 bits — two independent-enough functions from one hash, and (the
    * real point here) the SAME arithmetic is expressible as Spark column
    * expressions, so estimates read straight out of a state column with
    * `element_at`/`least` — no UDF, no driver lookup (see Sketches q90).
    */
  object Cms {
    def zero(d: Int, w: Int): Array[Long] = {
      require(d >= 1 && d <= 16 && w >= 16,
        s"CMS needs 1 <= d <= 16 and w >= 16, got d=$d w=$w")
      new Array[Long](d * w)
    }
    /** Row-i counter index of a pre-hashed item — h₁ + i·h₂ stays well
      * under Long overflow (h₁, h₂ < 2³², i < 16). */
    def index(hash: Long, i: Int, w: Int): Int = {
      val h1 = hash >>> 32
      val h2 = hash & 0xFFFFFFFFL
      ((h1 + i * h2) % w).toInt
    }
    def reduce(d: Int, w: Int, b: Array[Long], hash: Long): Array[Long] = {
      var i = 0
      while (i < d) { b(i * w + index(hash, i, w)) += 1L; i += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      require(a.length == b.length,
        s"cannot merge CMS states of different geometry: ${a.length} vs ${b.length} counters")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def estimate(d: Int, w: Int, b: Array[Long], hash: Long): Long = {
      var est = Long.MaxValue
      var i = 0
      while (i < d) {
        val c = b(i * w + index(hash, i, w))
        if (c < est) est = c
        i += 1
      }
      est
    }
  }

  /** Greenwald–Khanna quantile sketch aggregator — the third leg of the
    * exportable-sketch triad (HLL = distinct, CMS = frequency, GK =
    * quantiles). Wraps Spark's own `QuantileSummaries` (the engine's
    * `percentile_approx` machinery) as a typed `Aggregator`, so the
    * summary state is a first-class mergeable value: shard summaries
    * (java-Serializable, a few KB at ε = 0.01) persist per
    * partition/day and fold with `merge` for an incremental global
    * quantile — no history re-scan.
    *
    * Guarantee: the reported value's RANK is within ε·n of the exact
    * quantile's (Greenwald & Khanna 2001), so the value lies between the
    * exact (q−ε) and (q+ε) percentiles; merging shard summaries keeps a
    * bounded (≤ summed-ε) guarantee. Both laws are asserted in
    * AggregatorsSpec; the q92 oracle hash-pins the error law per group.
    */
  class GkQuantileAggregator(q: Double, relErr: Double = 0.01)
      extends Aggregator[Double, org.apache.spark.sql.catalyst.util.QuantileSummaries, Double] {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    def zero: QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relErr)
    def reduce(b: QuantileSummaries, v: Double): QuantileSummaries = b.insert(v)
    // GK merge requires both sides flushed; insert-after-merge re-buffers
    // safely into the head array, so the Aggregator contract holds
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    def finish(b: QuantileSummaries): Double =
      b.compress().query(Seq(q)).map(_.head).getOrElse(Double.NaN)
    // kryo: the summary is a plain Serializable class, not a product —
    // only sketch-sized state crosses the wire, never row data
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.kryo[QuantileSummaries]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** CMS aggregator over pre-hashed values (`xxhash64(col)`); the OUTPUT
    * is the full counter state as `array<long>` — broadcastable, storable,
    * and directly queryable with column expressions.
    */
  class CmsStateAggregator(d: Int = 7, w: Int = 2048)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Cms.zero(d, w)
    def reduce(b: Array[Long], hash: Long): Array[Long] = Cms.reduce(d, w, b, hash)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = Cms.merge(a, b)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Folds STORED HLL states (the serialized registers a
    * [[HllStateAggregator]] emitted, read back from parquet shards/days)
    * into one ESTIMATE without touching the underlying data — the
    * distinct-count leg of the stored-fold triad (GK/CMS already have
    * merge forms): N sketch rows in, one register-wise max, one
    * estimate out. An all-NULL input yields the empty state (estimate
    * 0). Geometry mismatches fail loudly via [[Hll.merge]].
    */
  class HllMergeAggregator(p: Int = 14) extends Aggregator[Array[Byte], Array[Int], Long] {
    def zero: Array[Int] = Hll.zero(p)
    def reduce(b: Array[Int], st: Array[Byte]): Array[Int] =
      if (st == null) b else Hll.merge(b, Hll.deserialize(st))
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = Hll.merge(a, b)
    def finish(b: Array[Int]): Long = Hll.estimate(b)
    def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Folds STORED CMS states (the `array<long>` a [[CmsStateAggregator]]
    * emitted, read back from parquet shards/days) into one state without
    * touching the underlying data — the incremental-refresh aggregation:
    * N sketch rows in, one sketch out, element-wise exact sum. Geometry
    * mismatches fail loudly via [[Cms.merge]]'s length check; an all-NULL
    * input yields the empty state (estimates 0 — no data, no counts).
    */
  class CmsMergeAggregator(d: Int = 7, w: Int = 2048)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Cms.zero(d, w)
    def reduce(b: Array[Long], st: Seq[Long]): Array[Long] =
      if (st == null) b else Cms.merge(b, st.toArray)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = Cms.merge(a, b)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** GK summary (de)serialization: the summary is a plain Serializable
    * class, so the exportable form is its java serialization of the
    * COMPRESSED summary — a few KB at ε = 0.01, independent of the data
    * size it summarizes.
    */
  object Gk {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    def serialize(s: QuantileSummaries): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      try { oos.writeObject(s.compress()); oos.flush() } finally oos.close()
      bos.toByteArray
    }
    def deserialize(bytes: Array[Byte]): QuantileSummaries = {
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try ois.readObject().asInstanceOf[QuantileSummaries] finally ois.close()
    }
  }

  /** GK aggregator whose OUTPUT is the serialized summary (`binary`) —
    * the storable per-shard/per-day form of [[GkQuantileAggregator]],
    * parquet-persistable like [[HllStateAggregator]]'s registers and
    * [[CmsStateAggregator]]'s counters. Complete the triad's stored
    * path with [[GkMergeAggregator]] to fold shards later.
    */
  class GkStateAggregator(relErr: Double = 0.01)
      extends Aggregator[Double, org.apache.spark.sql.catalyst.util.QuantileSummaries, Array[Byte]] {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    def zero: QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relErr)
    def reduce(b: QuantileSummaries, v: Double): QuantileSummaries = b.insert(v)
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    def finish(b: QuantileSummaries): Array[Byte] = Gk.serialize(b)
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.kryo[QuantileSummaries]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Folds STORED GK summaries (the `binary` a [[GkStateAggregator]]
    * emitted) into one and reports quantile `q` of the merged summary —
    * the incremental-refresh read path: N KB-sized summary rows in, one
    * quantile out, history never re-scanned. Merging keeps the bounded
    * (summed-ε) GK guarantee; NULL shard rows are skipped.
    */
  class GkMergeAggregator(q: Double, relErr: Double = 0.01)
      extends Aggregator[Array[Byte], org.apache.spark.sql.catalyst.util.QuantileSummaries, Double] {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    def zero: QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relErr)
    def reduce(b: QuantileSummaries, bytes: Array[Byte]): QuantileSummaries =
      if (bytes == null) b else b.compress().merge(Gk.deserialize(bytes))
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    def finish(b: QuantileSummaries): Double =
      b.compress().query(Seq(q)).map(_.head).getOrElse(Double.NaN)
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.kryo[QuantileSummaries]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; Beyer et
    * al. 2007 for the set-algebra use): keeps the k SMALLEST distinct
    * hash values of a set. Unlike HLL registers or MG summaries, the
    * state is a CANONICAL function of the underlying set — the k
    * smallest distinct values do not depend on insertion or merge
    * order — so the union/intersection/Jaccard ESTIMATES derived from
    * two states are deterministic and an external engine can replay
    * them value-for-value (`ORDER BY h LIMIT k` + the same arithmetic),
    * a strictly stronger oracle than an error-law boolean. Feed it
    * 60-bit md5 hashes ([[graft.functions.TextFunctions.hash60]]) for
    * cross-engine hash parity.
    *
    * Estimator: with h₍ₖ₎ the k-th smallest of N distinct hashes in
    * [0, 2⁶⁰), est = (k−1)·2⁶⁰/h₍ₖ₎ (unbiased, rsd ≈ 1/√(k−2)); when
    * the state holds fewer than k values it IS the whole set and the
    * estimate is exact. Buffer invariant: ascending, distinct, ≤ k.
    */
  class MinKAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2 && k <= 65536, s"KMV size must be in [2, 65536], got $k")
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = b.foldLeft(a)(insert)
    def finish(b: Seq[Long]): Seq[Long] = b
    private def insert(b: Seq[Long], v: Long): Seq[Long] = {
      if (b.size >= k && v >= b.last) b
      else {
        val vec = b.toVector
        var lo = 0
        var hi = vec.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (vec(mid) < v) lo = mid + 1 else hi = mid
        }
        if (lo < vec.size && vec(lo) == v) b // distinct: drop re-inserts
        else {
          val nb = (vec.take(lo) :+ v) ++ vec.drop(lo)
          if (nb.size > k) nb.take(k) else nb
        }
      }
    }
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  /** Misra–Gries frequent-items summary (Misra & Gries 1982) with the
    * mergeable-summaries merge (Agarwal, Cormode, Huang, Phillips, Wei &
    * Yi, PODS 2012) — the CANDIDATE-DISCOVERY leg of the sketch family.
    * CMS (q90) answers "how often does item x occur" but needs x up
    * front; at 100 TB the exact top-k that supplies those candidates is
    * itself a full token-keyed shuffle. An MG summary finds the heavy
    * hitters in ONE pass with k counters per partition and KB-sized
    * mergeable state, no candidate set required.
    *
    * Summary state: at most k (item, count) pairs plus the total stream
    * length n and the accumulated decrement total E. Worst-case (not
    * probabilistic) guarantees, preserved under ANY merge order:
    *   - count(x) <= true(x)                       (decrements only lose)
    *   - true(x) - count(x) <= E  (absent => count 0), i.e. every item
    *     with true(x) > E is present in the summary
    *   - E <= n / (k + 1)         (each decrement round absorbs k+1 items)
    * Because the laws are worst-case they hold regardless of Spark's
    * nondeterministic partial-merge order — which is what lets q125 pin
    * them in a hash-compared oracle even though the summary CONTENT is
    * merge-order-dependent (only exact values and law booleans are
    * output, never raw summary state).
    */
  object MisraGries {
    /** Mutable summary buffer. Plain Serializable (kryo encoder): only
      * O(k) state crosses the wire, never row data. */
    final class Summary(val k: Int) extends Serializable {
      require(k >= 1 && k <= 65536, s"MG summary size must be in [1, 65536], got $k")
      var n: Long = 0L
      var err: Long = 0L // total decrement applied to every true count
      val m = new java.util.HashMap[Long, Array[Long]](k * 2)

      def update(h: Long): this.type = {
        n += 1
        val c = m.get(h)
        if (c != null) c(0) += 1
        else if (m.size < k) m.put(h, Array(1L))
        else {
          // decrement round: the incoming item and every counter each
          // give up one — k+1 stream items absorbed per unit of err
          err += 1
          val it = m.values.iterator()
          while (it.hasNext) { val v = it.next(); v(0) -= 1 }
          m.values.removeIf(_(0) == 0L)
        }
        this
      }

      /** Mergeable-summaries merge: pointwise-sum the counters, then if
        * more than k survive subtract the (k+1)-th largest count from
        * all and drop the non-positive — error grows by exactly that
        * subtrahend, keeping true(x) - count(x) <= E_a + E_b + s <=
        * (n_a + n_b) / (k + 1) (Agarwal et al. 2012, Thm 2.1). */
      def absorb(o: Summary): this.type = {
        require(o.k == k, s"cannot merge MG summaries of different k: $k vs ${o.k}")
        n += o.n
        err += o.err
        val it = o.m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val mine = m.get(e.getKey)
          if (mine != null) mine(0) += e.getValue()(0)
          else m.put(e.getKey, Array(e.getValue()(0)))
        }
        if (m.size > k) {
          val counts = new Array[Long](m.size)
          var i = 0
          val vs = m.values.iterator()
          while (vs.hasNext) { counts(i) = vs.next()(0); i += 1 }
          java.util.Arrays.sort(counts)
          val s = counts(m.size - k - 1) // (k+1)-th largest
          err += s
          val es = m.values.iterator()
          while (es.hasNext) { val v = es.next(); v(0) -= s }
          m.values.removeIf(_(0) <= 0L)
        }
        this
      }

      /** Exportable flat form `[ n | err | size | h0 c0 h1 c1 … | k ]` —
        * the per-shard row a pipeline persists and later folds with
        * [[MgMergeAggregator]]; items sorted by (count desc, hash) so the
        * stored artifact is canonical for a GIVEN summary. The summary's
        * own k rides as the TRAILING element (after the items, so every
        * positional header/item parse — q125's and q137's column folds —
        * is unaffected): [[fromState]] requires it to equal the folding
        * k, making a cross-k fold fail loudly even when the state
        * happens to hold fewer than k items (ADVICE r10). */
      def toState: Seq[Long] = {
        val items = m.entrySet().toArray(Array.empty[java.util.Map.Entry[Long, Array[Long]]])
          .sortBy(e => (-e.getValue()(0), e.getKey))
        val out = new Array[Long](4 + 2 * items.length)
        out(0) = n; out(1) = err; out(2) = items.length.toLong
        var i = 0
        while (i < items.length) {
          out(3 + 2 * i) = items(i).getKey
          out(4 + 2 * i) = items(i).getValue()(0)
          i += 1
        }
        out(out.length - 1) = k.toLong
        out.toSeq
      }
    }

    def fromState(k: Int, st: Seq[Long]): Summary = {
      require(st.length >= 4 && st.length == 4 + 2 * st(2).toInt,
        s"malformed MG state: length ${st.length}, declared size ${if (st.length >= 3) st(2) else -1}")
      require(st.last == k.toLong,
        s"stored MG state was built with k=${st.last}, cannot fold at k=$k")
      val s = new Summary(k)
      s.n = st(0); s.err = st(1)
      var i = 0
      while (i < st(2).toInt) {
        s.m.put(st(3 + 2 * i), Array(st(4 + 2 * i)))
        i += 1
      }
      require(s.m.size <= k, s"stored MG state holds ${s.m.size} items > k=$k")
      s
    }
  }

  /** MG aggregator over pre-hashed values (`xxhash64(col)`); the OUTPUT
    * is the flat summary state — persistable per shard/day like the
    * HLL/CMS/GK state forms, foldable later by [[MgMergeAggregator]].
    */
  class MgStateAggregator(k: Int)
      extends Aggregator[Long, MisraGries.Summary, Seq[Long]] {
    def zero: MisraGries.Summary = new MisraGries.Summary(k)
    def reduce(b: MisraGries.Summary, h: Long): MisraGries.Summary = b.update(h)
    def merge(a: MisraGries.Summary, b: MisraGries.Summary): MisraGries.Summary = a.absorb(b)
    def finish(b: MisraGries.Summary): Seq[Long] = b.toState
    def bufferEncoder: Encoder[MisraGries.Summary] = Encoders.kryo[MisraGries.Summary]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Folds STORED MG states (the flat `array<long>` a [[MgStateAggregator]]
    * emitted, read back from parquet shards/days) into one summary without
    * re-touching rows — the incremental-refresh read path, with the same
    * worst-case laws as a single pass (error bounds SUM across folds and
    * stay <= n/(k+1) by the mergeable-summaries theorem). NULL shard rows
    * are skipped; k mismatches fail loudly via the trailing stored-k
    * header element, regardless of how many items the state holds.
    */
  class MgMergeAggregator(k: Int)
      extends Aggregator[Seq[Long], MisraGries.Summary, Seq[Long]] {
    def zero: MisraGries.Summary = new MisraGries.Summary(k)
    def reduce(b: MisraGries.Summary, st: Seq[Long]): MisraGries.Summary =
      if (st == null) b else b.absorb(MisraGries.fromState(k, st))
    def merge(a: MisraGries.Summary, b: MisraGries.Summary): MisraGries.Summary = a.absorb(b)
    def finish(b: MisraGries.Summary): Seq[Long] = b.toState
    def bufferEncoder: Encoder[MisraGries.Summary] = Encoders.kryo[MisraGries.Summary]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Exact-integer first/second moments of a dim-dimensional embedding
    * column — the input to a covariance matrix, as ONE mergeable buffer.
    *
    * Every accumulated term is `floor(value × 2^40)` as a BIGINT:
    * float-origin doubles multiply exactly (24-bit × 24-bit mantissas fit
    * a double), the 2^40 scale is a lossless exponent shift, and integer
    * sums are aggregation-order-independent — so the finished moments are
    * bit-identical at any parallelism AND replayable by an external
    * engine (the q53/q103 exactness scheme, extended to products).
    *
    * Buffer/output layout (flat LONG array, driver-side consumers index
    * it): `[ n | Sx(0..d-1) | upper-triangle ΣSxy row-major (d(d+1)/2) ]`.
    * The aggregator does d(d+1)/2 multiply-adds per row; state is
    * ~8·(1+d+d(d+1)/2) bytes (17 KB at d=64) per partition — partial
    * aggregation applies, the shuffle carries one buffer per task, and
    * per-shard states can be persisted and folded later by summing
    * element-wise (same merge the triad sketches use).
    */
  class MomentsAggregator(dim: Int)
      extends Aggregator[Seq[Double], Array[Long], Seq[Long]] {
    require(dim >= 1, s"dim must be positive, got $dim")
    private val nPairs = dim * (dim + 1) / 2
    private val scale = 1099511627776.0 // 2^40
    def zero: Array[Long] = new Array[Long](1 + dim + nPairs)
    def reduce(b: Array[Long], v: Seq[Double]): Array[Long] = {
      require(v.length == dim, s"expected $dim dims, got ${v.length}")
      val a = v.toArray
      b(0) += 1L
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        b(1 + i) += math.floor(a(i) * scale).toLong
        var j = i
        while (j < dim) {
          b(t) += math.floor(a(i) * a(j) * scale).toLong
          t += 1; j += 1
        }
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    /** Output expands the triangle to the FULL row-major d×d matrix:
      * `[ n | Sx(d) | Sxy(d*d) ]` — then a consumer derives (i, j) from a
      * flat position with pure integer arithmetic (p DIV d, p MOD d),
      * which an oracle can replay without inverting triangle indexing. */
    def finish(b: Array[Long]): Seq[Long] = {
      val out = new Array[Long](1 + dim + dim * dim)
      System.arraycopy(b, 0, out, 0, 1 + dim)
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        var j = i
        while (j < dim) {
          out(1 + dim + i * dim + j) = b(t)
          out(1 + dim + j * dim + i) = b(t)
          t += 1; j += 1
        }
        i += 1
      }
      out.toSeq
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Folds STORED moment states (the flat `array<long>` a
    * [[MomentsAggregator]] emitted, full-matrix layout
    * `[ n | Sx(d) | Sxy(d·d) ]`) into one by element-wise sum — the
    * incremental-refresh read path that completes the triad discipline
    * (HLL/CMS/GK) for covariance: N ~33 KB state rows in, one combined
    * state out, history never re-scanned. Element-wise BIGINT addition
    * is EXACTLY the partial-merge the live aggregator performs, so a
    * fold of persisted shards is bit-identical to a single pass over
    * the union of their rows (SimilaritySpec pins this; q109 pins it
    * against q104's oracle). NULL shard rows are skipped.
    */
  class MomentsMergeAggregator(dim: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(dim >= 1, s"dim must be positive, got $dim")
    private val len = 1 + dim + dim * dim
    def zero: Array[Long] = new Array[Long](len)
    def reduce(b: Array[Long], v: Seq[Long]): Array[Long] = {
      if (v == null) return b
      require(v.length == len,
        s"stored moments state must have ${len} entries (dim=$dim), got ${v.length}")
      val a = v.toArray
      var i = 0
      while (i < len) { b(i) += a(i); i += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
