package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregations (SURVEY §2.9: the reference has no UDAF
  * surface; this is the engine's public extension point for
  * aggregation logic the built-ins lack — `Aggregator[IN, BUF, OUT]`
  * gets partial aggregation (map-side combine) for free via
  * reduce/merge, exactly like a built-in).
  */
object Aggregators {

  /** Exact sum of squares: accumulates in decimal(scale 10) — the same
    * quantization as the `dsum` helper — so the result is
    * order-independent and bitwise-reproducible against the DuckDB
    * decimal-sum oracle. */
  object DecimalSumSq extends Aggregator[Double, JBigDecimal, Double] {
    private val Scale = 10
    override def zero: JBigDecimal =
      JBigDecimal.ZERO.setScale(Scale)
    override def reduce(buf: JBigDecimal, x: Double): JBigDecimal =
      // BigDecimal.valueOf mirrors Spark's double→decimal cast (via the
      // canonical string), keeping parity with `CAST(x AS DECIMAL)`
      buf.add(JBigDecimal.valueOf(x * x).setScale(Scale, RoundingMode.HALF_UP))
    override def merge(a: JBigDecimal, b: JBigDecimal): JBigDecimal = a.add(b)
    override def finish(buf: JBigDecimal): Double = buf.doubleValue
    override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Order-independent elementwise VECTOR mean with `davg` semantics,
    * one buffer per group instead of one decimal row per ELEMENT.
    *
    * The k-means / PQ training loops need per-cluster centroid means
    * that replay bit-exactly in the DuckDB oracle, which the davg
    * discipline provides — but the original plan shape (posexplode
    * the vector, hash-aggregate 64 × N rows into (cid, pos) groups
    * with DECIMAL(38,10) sum buffers) profiled as the training
    * bottleneck at 500k vectors: 32M exploded rows and a BigDecimal
    * object add per element per row. This aggregator keeps the SAME
    * numeric contract — each element quantizes through
    * `BigDecimal.valueOf` (Spark's own double→decimal cast path,
    * canonical-string based) at scale 10, sums exactly — but the sum
    * lives in a primitive Long TICK array (1 tick = 10⁻¹⁰), so the
    * hot loop is one quantization + one long add per element, the
    * groups are k instead of k×dim, and nothing explodes. finish()
    * reproduces `sum(decimal).cast(double) / count` exactly:
    * BigDecimal(ticks, 10).doubleValue is the identical correctly-
    * rounded conversion, divided by the count in double.
    *
    * Bounds: |Σ ticks| < 2⁶³ requires Σ|xᵢ| < 9.2 × 10⁸ per (group,
    * element) — embeddings are O(1)-scaled, so ~10⁸ members per
    * cluster before overflow; `longValueExact`/`Math.addExact` throw
    * rather than wrap if a corpus ever crosses it. Buffer slot 0 is
    * the member count; ragged input vectors are an error. */
  object VecDavg extends Aggregator[Seq[Double], Array[Long], Seq[Double]] {
    private val Scale = 10
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], v: Seq[Double]): Array[Long] = {
      val b = if (buf.length != 0) buf else new Array[Long](v.length + 1)
      require(b.length == v.length + 1,
        s"vec_davg: ragged input (${v.length} vs ${b.length - 1})")
      b(0) = Math.addExact(b(0), 1L)
      var i = 0
      while (i < v.length) {
        val t = JBigDecimal.valueOf(v(i))
          .setScale(Scale, RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        b(i + 1) = Math.addExact(b(i + 1), t)
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.length == 0) b
      else if (b.length == 0) a
      else {
        require(a.length == b.length, "vec_davg: ragged merge")
        var i = 0
        while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
        a
      }
    override def finish(b: Array[Long]): Seq[Double] =
      if (b.length == 0) Seq.empty
      else {
        val n = b(0).toDouble
        (1 until b.length).map { i =>
          new JBigDecimal(java.math.BigInteger.valueOf(b(i)), Scale)
            .doubleValue / n
        }
      }
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** One reported heavy hitter: Space-Saving guarantees
    * `n - err <= true count <= n`. */
  final case class HeavyHitter(term: String, n: Long, err: Long)

  /** Space-Saving heavy hitters (Metwally et al., "Efficient
    * computation of frequent and top-k elements in data streams",
    * ICDT 2005): SINGLE-PASS top-k term counting in `capacity`
    * counters of bounded memory — the 100 TB answer to "top terms"
    * when the vocabulary doesn't fit anywhere. As a typed
    * `Aggregator` it gets map-side partial aggregation for free:
    * each partition maintains its own counter set; merge unions them
    * with the standard absent-item-gets-the-other-side's-minimum
    * correction, preserving the `n - err <= true <= n` sandwich under
    * any merge order. When `capacity >= observed vocabulary` no
    * counter is ever evicted and the result is EXACT (err = 0) — the
    * regime the t20 oracle hash-checks; OpsSpec separately bound-tests
    * the small-capacity approximate regime. */
  class SpaceSaving(capacity: Int, k: Int)
      extends Aggregator[String, Map[String, (Long, Long)], Seq[HeavyHitter]] {

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(buf: Map[String, (Long, Long)], term: String)
        : Map[String, (Long, Long)] =
      buf.get(term) match {
        case Some((n, e)) => buf.updated(term, (n + 1, e))
        case None if buf.size < capacity => buf.updated(term, (1L, 0L))
        case None =>
          // evict the minimum counter (lowest count, then term order —
          // deterministic); the newcomer inherits its count as error
          val (mt, (mn, _)) = buf.minBy { case (t, (n, _)) => (n, t) }
          (buf - mt).updated(term, (mn + 1, mn))
      }

    override def merge(a: Map[String, (Long, Long)],
        b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      // an item absent from a full side may have been evicted there
      // with up to min-count occurrences — charge that many to both
      // the count and the error so the sandwich bound survives
      val minA = if (a.size < capacity) 0L else a.values.map(_._1).min
      val minB = if (b.size < capacity) 0L else b.values.map(_._1).min
      val combined = (a.keySet ++ b.keySet).iterator.map { t =>
        val (na, ea) = a.getOrElse(t, (minA, minA))
        val (nb, eb) = b.getOrElse(t, (minB, minB))
        t -> (na + nb, ea + eb)
      }.toMap
      if (combined.size <= capacity) combined
      else combined.toSeq.sortBy { case (t, (n, _)) => (-n, t) }
        .take(capacity).toMap
    }

    override def finish(buf: Map[String, (Long, Long)]): Seq[HeavyHitter] =
      buf.toSeq.sortBy { case (t, (n, _)) => (-n, t) }.take(k)
        .map { case (t, (n, e)) => HeavyHitter(t, n, e) }

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[HeavyHitter]] =
      ExpressionEncoder()
  }

  /** Count-Min sketch (Cormode & Muthukrishnan, "An improved data
    * stream summary: the count-min sketch and its applications",
    * J. Algorithms 2005): depth×width counters answering ad-hoc
    * frequency point queries with NO underestimates and overestimate
    * ≤ 2N/width w.h.p. — the bounded-memory complement of
    * [[SpaceSaving]] (top-k): Space-Saving answers "which terms are
    * big", CMS answers "how big is THIS term" for any term after the
    * fact. Merge is elementwise addition — commutative/associative, so
    * map-side partials and any shuffle order give the identical
    * sketch; the same property makes it a drop-in streaming state
    * (the t20→heavyHitterShards pattern applies verbatim). */
  final class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(depth <= CountMin.MaxDepth, s"depth ≤ ${CountMin.MaxDepth}")
    override def zero: Array[Long] = Array.ofDim[Long](depth * width)
    override def reduce(b: Array[Long], t: String): Array[Long] = {
      var d = 0
      while (d < depth) {
        b(d * width + CountMin.bucket(t, d, width)) += 1
        d += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  object CountMin {
    val MaxDepth = 16
    private val P = 2147483647L // Mersenne prime 2^31-1
    // fixed universal-hash family (a·h + b mod p), same construction
    // as the MinHash permutations — String.hashCode is stable across
    // JVMs, so executor-side reduce and driver-side estimate agree
    private val rnd = new scala.util.Random(13)
    private val A = Array.fill(MaxDepth)(1L + rnd.nextInt(Int.MaxValue - 1))
    private val B = Array.fill(MaxDepth)(rnd.nextInt(Int.MaxValue).toLong)
    def bucket(t: String, d: Int, width: Int): Int = {
      val h = t.hashCode.toLong & 0xffffffffL
      (((A(d) * h + B(d)) % P) % width).toInt
    }
    /** Point query: min over the term's counter in each row. */
    def estimate(sketch: Seq[Long], t: String, depth: Int,
        width: Int): Long =
      (0 until depth).map(d => sketch(d * width + bucket(t, d, width))).min
  }

  /** Deterministic bottom-k-by-hash sampler (the KMV / bottom-k
    * sketch selection rule, Bar-Yossef et al. 2002): keep the k
    * input records with the smallest (hashHex, id) — a pure function
    * of the input SET, so the "sample" is order-independent, merge-
    * associative (map-side partials for free), bounded at k entries
    * of state per group, and bit-reproducible across runs and
    * cluster sizes — none of which holds for classic RNG reservoir
    * sampling under Spark's nondeterministic merge order. Input is
    * (hashHex, id); output is the comma-joined ids of the k smallest
    * hashes (flat string so the driver comparator can sort it). */
  /** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
    * 2002; Beyer et al. 2007 unbiased estimator): the k smallest
    * 64-bit hash values of a set determine its cardinality — the kth
    * smallest of n uniform hashes sits near k/n of the hash space, so
    * n ≈ (k−1)/u_k with relative error ~1/√k. The buffer IS the
    * bottom-k hash set (sorted, unsigned order), which makes it
    * mergeable by sorted-union-truncate — commutative, associative,
    * idempotent on overlap — so map-side partials, shuffle order and
    * re-aggregation cannot change it. Unlike HLL (q23/e09) the sketch
    * supports SET ALGEBRA after the fact: union = merge; intersection
    * via the Jaccard of the union's bottom-k ([[Kmv.jaccard]]) — the
    * "distinct users in A∪B / A∩B without re-scanning" answer. Input
    * is pre-hashed longs (xxhash64 on the query side). */
  final class Kmv(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    // fast path first: once the buffer is full, a hash at or above
    // the current kth-smallest (or already present) can't change the
    // bottom-k — O(1)/O(k) per row instead of the full concat-dedup-
    // sort (O(k log k) per input row, the dominant reduce cost)
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
      val hu = h ^ Long.MinValue
      if (buf.size == k && hu >= (buf.last ^ Long.MinValue)) buf
      else if (buf.contains(h)) buf
      else Kmv.merge(buf, Vector(h), k)
    }
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      Kmv.merge(a, b, k)
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  object Kmv {
    private val ord = Ordering.fromLessThan[Long](
      (a, b) => (a ^ Long.MinValue) < (b ^ Long.MinValue)) // unsigned
    /** Sorted-union-truncate of two bottom-k sets. */
    def merge(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
      (a ++ b).distinct.sorted(ord).take(k)
    /** Hash value as a uniform in [0, 1). */
    private def u(h: Long): Double =
      ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble) /
        math.pow(2.0, 64)
    /** Unbiased distinct estimate: exact below k, (k−1)/u_k above. */
    def estimate(sk: Seq[Long], k: Int): Double =
      if (sk.size < k) sk.size.toDouble
      else (k - 1).toDouble / u(sk.last)
    /** Jaccard estimate of the two ORIGINAL sets from their sketches:
      * fraction of the union's bottom-k present in both. */
    def jaccard(a: Seq[Long], b: Seq[Long], k: Int): Double = {
      val un = merge(a, b, k)
      if (un.isEmpty) 0.0
      else {
        val sa = a.toSet; val sb = b.toSet
        un.count(h => sa.contains(h) && sb.contains(h)).toDouble / un.size
      }
    }
    /** Intersection cardinality via ρ·|A∪B|. */
    def intersectEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double =
      jaccard(a, b, k) * estimate(merge(a, b, k), k)
  }

  final class BottomKByHash(k: Int)
      extends Aggregator[(String, Long), Seq[(String, Long)], String] {
    private val ord = Ordering.Tuple2[String, Long]
    override def zero: Seq[(String, Long)] = Vector.empty
    override def reduce(buf: Seq[(String, Long)],
        x: (String, Long)): Seq[(String, Long)] =
      if (buf.length >= k && ord.gteq(x, buf.last)) buf
      else ((buf :+ x).sorted(ord)).take(k)
    override def merge(a: Seq[(String, Long)],
        b: Seq[(String, Long)]): Seq[(String, Long)] =
      (a ++ b).sorted(ord).take(k)
    override def finish(buf: Seq[(String, Long)]): String =
      buf.sorted(ord).map(_._2).mkString(",")
    override def bufferEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** One candidate entering MMR: id, query relevance, embedding. */
  final case class MmrCand(vec_id: Long, rel: Double, emb: Seq[Double])

  /** One MMR-selected result at its selection rank. */
  final case class MmrPick(rank: Int, vec_id: Long, mmr_score: Double)

  /** Greedy Maximal Marginal Relevance re-ranking (Carbonell &
    * Goldstein, SIGIR 1998) over a BOUNDED per-query candidate
    * shortlist: pick argmax of `λ·rel − (1−λ)·max_{s∈selected}
    * cos(c, s)` k times. The buffer is the shortlist itself (the
    * caller feeds only the top-C candidates, so state is ≤C rows);
    * merge is concatenation, and the greedy runs once in `finish` —
    * O(k·C²) on ≤C=20 elements. DETERMINISM: selection order cannot
    * depend on buffer arrival order — every argmax breaks score ties
    * by ascending vec_id, and all float math mirrors the oracle's
    * sequential folds exactly (dot/norm as left-to-right adds,
    * cos = dot/(‖a‖·‖b‖)). The penalty weight `mu` is an EXPLICIT
    * parameter, not `1.0 − lambda`: the oracle writes the literal
    * `0.3`, which DuckDB parses as DECIMAL and converts to the
    * nearest double — one ulp BELOW Scala's `1.0 - 0.7` — so both
    * engines must start from the same literal. */
  final class MmrSelect(k: Int, lambda: Double, mu: Double)
      extends Aggregator[MmrCand, Seq[MmrCand], Seq[MmrPick]] {
    override def zero: Seq[MmrCand] = Vector.empty
    override def reduce(buf: Seq[MmrCand], c: MmrCand): Seq[MmrCand] =
      buf :+ c
    override def merge(a: Seq[MmrCand], b: Seq[MmrCand]): Seq[MmrCand] =
      a ++ b
    override def finish(buf: Seq[MmrCand]): Seq[MmrPick] = {
      if (buf.isEmpty) return Seq.empty
      val cands = buf.toArray
      def dot(a: Seq[Double], b: Seq[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < a.length) { acc += a(i) * b(i); i += 1 }
        acc
      }
      val norms = cands.map(c => math.sqrt(dot(c.emb, c.emb)))
      def sim(i: Int, j: Int): Double =
        dot(cands(i).emb, cands(j).emb) / (norms(i) * norms(j))
      val selected = scala.collection.mutable.ArrayBuffer[Int]()
      val picks = Vector.newBuilder[MmrPick]
      var step = 1
      while (step <= k && selected.length < cands.length) {
        var best = -1; var bestScore = 0.0
        var i = 0
        while (i < cands.length) {
          if (!selected.contains(i)) {
            val pen =
              if (selected.isEmpty) 0.0
              else selected.iterator.map(j => sim(i, j)).max
            val score = lambda * cands(i).rel - mu * pen
            if (best < 0 || score > bestScore ||
                (score == bestScore &&
                  cands(i).vec_id < cands(best).vec_id)) {
              best = i; bestScore = score
            }
          }
          i += 1
        }
        picks += MmrPick(step, cands(best).vec_id, bestScore)
        selected += best
        step += 1
      }
      picks.result()
    }
    override def bufferEncoder: Encoder[Seq[MmrCand]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[MmrPick]] = ExpressionEncoder()
  }
}
