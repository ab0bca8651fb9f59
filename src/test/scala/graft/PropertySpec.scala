package graft

import graft.archive.Archive
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import java.time.Instant

/** Property-based checks (SURVEY §5.3) for the pure parity functions —
  * runs under ScalaCheck's own sbt test framework. */
object PropertySpec extends Properties("archive") {

  property("sanitize is idempotent, quote-free, length-preserving") =
    forAll { (s: String) =>
      val once = Archive.sanitize(s)
      !once.contains("'") &&
        Archive.sanitize(once) == once &&
        once.length == s.length
    }

  private val clocks: Gen[Instant] =
    Gen.choose(0L, 4102444800000L).map(Instant.ofEpochMilli)

  property("archiveName carries a 12-digit prefix and round-trips") =
    forAll(clocks, Gen.alphaNumStr) { (clock, name) =>
      val archived = Archive.archiveName(name, clock)
      val prefix = archived.takeWhile(_ != '_')
      prefix.length == 12 && prefix.forall(_.isDigit) &&
        archived == s"${prefix}_${Archive.sanitize(name)}"
    }

  property("flagIsTrue accepts exactly case-insensitive 'true'") =
    forAll { (s: String) =>
      Archive.flagIsTrue(s) == (s != null && s.equalsIgnoreCase("true"))
    }

  property("rolling fingerprint stays within [0, 1e9+7) and is stable") =
    forAll(Gen.asciiPrintableStr) { (s: String) =>
      val h = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
      val h2 = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
      h == h2 && h >= 0 && h < 1000000007L
    }

  // --- KMV sketch: the buffer must be a pure function of the input
  //     SET, however the stream is partitioned or ordered — that is
  //     the property that makes map-side partials and shuffle-order
  //     nondeterminism invisible. ---
  import graft.functions.Aggregators.Kmv

  private val hashSets: Gen[List[Long]] =
    Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))

  property("KMV sketch is partition- and order-invariant") =
    forAll(hashSets, Gen.choose(1, 16), Gen.choose(0, 1 << 30)) {
      (hs, k, seed) =>
        val direct = hs.foldLeft(Seq.empty[Long])(
          (b, h) => Kmv.merge(b, Vector(h), k))
        val shuffled = new scala.util.Random(seed).shuffle(hs)
        // arbitrary 3-way partition, each reduced independently, then
        // merged in a different order
        val parts = shuffled.zipWithIndex.groupBy(_._2 % 3)
          .values.map(_.map(_._1)).toList
        val merged = parts.reverse
          .map(_.foldLeft(Seq.empty[Long])(
            (b, h) => Kmv.merge(b, Vector(h), k)))
          .foldLeft(Seq.empty[Long])((a, b) => Kmv.merge(a, b, k))
        direct == merged
    }

  property("KMV reduce fast path ≡ merge-based reduce") =
    // the round-5 O(1) skip (buffer full, hash ≥ current kth, or
    // already present) must be semantically invisible: folding the
    // stream through Aggregator.reduce equals the naive merge fold
    forAll(hashSets, Gen.choose(1, 16)) { (hs, k) =>
      val agg = new Kmv(k)
      val viaReduce = hs.foldLeft(agg.zero)(agg.reduce)
      val viaMerge = hs.foldLeft(Seq.empty[Long])(
        (b, h) => Kmv.merge(b, Vector(h), k))
      viaReduce == viaMerge
    }

  property("KMV estimate is exact below capacity") =
    forAll(hashSets, Gen.choose(1, 64)) { (hs, extra) =>
      val distinct = hs.distinct
      val k = distinct.size + extra
      val sk = distinct.foldLeft(Seq.empty[Long])(
        (b, h) => Kmv.merge(b, Vector(h), k))
      Kmv.estimate(sk, k) == distinct.size.toDouble
    }

  property("bottom-k-by-hash sampler is partition-invariant") = {
    import graft.functions.Aggregators.BottomKByHash
    forAll(Gen.listOf(Gen.zip(Gen.alphaNumStr, Gen.long)),
      Gen.choose(1, 8), Gen.choose(0, 1 << 30)) { (xs, k, seed) =>
      val agg = new BottomKByHash(k)
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      val parts = new scala.util.Random(seed).shuffle(xs)
        .zipWithIndex.groupBy(_._2 % 4).values
        .map(_.map(_._1).foldLeft(agg.zero)(agg.reduce)).toList
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      agg.finish(direct) == agg.finish(merged)
    }
  }

  // --- fused text/vector kernels: the pure eval helpers against
  //     straight-line Scala references, on arbitrary inputs (the
  //     fixture-driven equivalence suite is ExprEquivSpec; this is
  //     the fuzz layer). ---
  import graft.functions.{TextExprs, VectorExprs}
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  property("charCounts == code-point multiset (empty text -> {\"\": 1})") =
    forAll { (s: String) =>
      val got = TextExprs.charCounts(UTF8String.fromString(s))
      val keys = got.keyArray.toArray[AnyRef](
        org.apache.spark.sql.types.StringType).map(_.toString)
      val vals = got.valueArray.toLongArray()
      val ref: Map[String, Long] =
        if (s.isEmpty) Map("" -> 1L)
        else s.codePoints().toArray.toSeq
          .map(cp => new String(Character.toChars(cp)))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
      keys.length == keys.distinct.length &&
        keys.zip(vals).toMap == ref
    }

  property("tokenCounts == list multiset, null tokens skipped") =
    forAll(Gen.listOf(Gen.option(Gen.alphaStr))) { toks =>
      val arr = new GenericArrayData(
        toks.map(_.map(UTF8String.fromString).orNull).toArray[Any])
      val got = TextExprs.tokenCounts(arr)
      val keys = got.keyArray.toArray[AnyRef](
        org.apache.spark.sql.types.StringType).map(_.toString)
      val vals = got.valueArray.toLongArray()
      val ref = toks.flatten.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      keys.zip(vals).toMap == ref
    }

  private val vecGen: Gen[Seq[Double]] =
    Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0, 10.0)).map(_.toSeq))

  property("nearestCellEval == brute argmin with first-min tie-break") =
    forAll(vecGen, Gen.choose(1, 6), Gen.long) { (v, k, seed) =>
      val rnd = new scala.util.Random(seed)
      // duplicate a centroid sometimes to force exact ties
      val base = Seq.fill(k)(Seq.fill(v.length)(
        (rnd.nextInt(7) - 3).toDouble))
      val cents = if (k > 1) base.updated(k - 1, base.head) else base
      val row = VectorExprs.nearestCellEval(
        new GenericArrayData(v.toArray[Any]),
        cents.flatten.toArray, cents.length, v.length,
        floatElems = false)
      val d2s = cents.map(c =>
        v.zip(c).foldLeft(0.0) { case (a, (x, y)) =>
          a + (x - y) * (x - y) })
      val best = d2s.zipWithIndex.minBy { case (d, i) => (d, i) }
      row.getDouble(0) == best._1 && row.getInt(1) == best._2
    }

  property("nearestCellEval: length mismatch yields (-1, MaxValue)") =
    forAll(vecGen, Gen.choose(1, 4)) { (v, k) =>
      val cents = Seq.fill(k)(Seq.fill(v.length + 1)(0.0))
      val row = VectorExprs.nearestCellEval(
        new GenericArrayData(v.toArray[Any]),
        cents.flatten.toArray, k, v.length + 1, floatElems = false)
      row.getInt(1) == -1 && row.getDouble(0) == Double.MaxValue
    }

  property("pqEncodeEval == per-subspace brute argmin on the unit vector") =
    forAll(Gen.choose(1, 4), Gen.choose(1, 4), Gen.choose(1, 4), Gen.long) {
      (m, k, sub, seed) =>
      val rnd = new scala.util.Random(seed)
      val v = Seq.fill(m * sub)(rnd.nextDouble() * 4 - 2)
      val books = Seq.fill(m, k, sub)(
        (rnd.nextInt(5) - 2).toDouble)
      val got = VectorExprs.pqEncodeEval(
        new GenericArrayData(v.toArray[Any]),
        books.flatten.flatten.toArray, m, k, sub, floatElems = false)
        .toIntArray().toSeq
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      val unit = v.map(x => if (nrm > 0) x / nrm else 0.0)
      val ref = (0 until m).map { mi =>
        val sv = unit.slice(mi * sub, (mi + 1) * sub)
        books(mi).zipWithIndex.map { case (c, i) =>
          (sv.zip(c).foldLeft(0.0) { case (a, (x, y)) =>
            a + (x - y) * (x - y) }, i)
        }.minBy { case (d, i) => (d, i) }._2
      }
      got == ref
    }

  // --- aHash codec round-trip: decode(encode(id, w, h)) must equal a
  //     straight-line recomputation from the pixel FORMULA (never the
  //     bytes) — certifying header parse, bottom-up scanline order,
  //     BGR unwind, block binning, and the cross-multiplied mean
  //     threshold in one property. ---
  import graft.ops.Multimodal

  property("decodeBmpAhash == formula-level reference on arbitrary dims") =
    forAll(Gen.choose(0L, 1L << 40), Gen.choose(8, 40), Gen.choose(8, 40)) {
      (id, w, h) =>
      val got = Multimodal.decodeBmpAhash(id, Multimodal.encodeBmp(id, w, h))
      val sums = Array.fill(64)(0L); val cnts = Array.fill(64)(0L)
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val gray = (id * 19 + x * 23 + y * 29) % 256 +
          (id * 11 + x * 13 + y * 17) % 256 + (id * 7 + x * 3 + y * 5) % 256
        val blk = (y * 8 / h) * 8 + (x * 8 / w)
        sums(blk) += gray; cnts(blk) += 1; total += gray
      }
      val bands = Array.fill(4)(0)
      for (i <- 0 until 64)
        if (sums(i) * w * h > total * cnts(i)) bands(i / 16) |= 1 << (i % 16)
      got.width == w && got.height == h &&
        got.b0 == bands(0) && got.b1 == bands(1) &&
        got.b2 == bands(2) && got.b3 == bands(3)
    }

  // --- NN resize: decode(encode) → resample must equal the formula-
  //     level reference for any source dims and target size — wrong
  //     floor/round, swapped axes, or bottom-up-as-top-down all
  //     diverge on some (w, h, tw, th). ---
  property("decodeBmpResize == formula-level NN resample on any dims") =
    forAll(Gen.choose(0L, 1L << 40), Gen.choose(1, 24), Gen.choose(1, 24),
      Gen.choose(1, 12), Gen.choose(1, 12)) { (id, w, h, tw, th) =>
      val got = Multimodal.decodeBmpResize(id,
        Multimodal.encodeBmp(id, w, h), tw, th)
      var rs = 0L; var gs = 0L; var bs = 0L
      for (ty <- 0 until th; tx <- 0 until tw) {
        val sx = tx * w / tw; val sy = ty * h / th
        rs += (id * 19 + sx * 23 + sy * 29) % 256
        gs += (id * 11 + sx * 13 + sy * 17) % 256
        bs += (id * 7 + sx * 3 + sy * 5) % 256
      }
      val n = tw.toDouble * th
      got.src_w == w && got.src_h == h &&
        got.width == tw && got.height == th &&
        got.mean_r == rs / n && got.mean_g == gs / n &&
        got.mean_b == bs / n &&
        got.r00 == (id * 19) % 256 && got.g00 == (id * 11) % 256 &&
        got.b00 == (id * 7) % 256
    }

  // --- NgramHashes kernel vs a straight-line reference: window
  //     enumeration, null-skip joining, seed-42 xxhash64, and the
  //     first-appearance distinct contract, on arbitrary token lists
  //     (nulls, unicode, empties) the fixtures never produce. ---
  import graft.functions.TextExprs
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  private val tokenLists: Gen[List[String]] =
    Gen.listOf(Gen.oneOf(Gen.const(null: String), Gen.const(""),
      Gen.alphaNumStr, Gen.const("日本語"), Gen.const("a b")))

  property("ngramHashes == straight-line window hashing on any tokens") =
    forAll(tokenLists, Gen.choose(1, 4)) { (tokens, n) =>
      val arr = new GenericArrayData(tokens.map(t =>
        if (t == null) null else UTF8String.fromString(t)).toArray[Any])
      val got = TextExprs.ngramHashes(arr, n, distinct = false)
        .toLongArray().toSeq
      val ref =
        if (tokens.size < n) Seq.empty
        else tokens.sliding(n).map { w =>
          val s = UTF8String.fromString(w.filter(_ != null).mkString(" "))
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, 42L)
        }.toSeq
      val gotD = TextExprs.ngramHashes(arr, n, distinct = true)
        .toLongArray().toSeq
      got == ref && gotD == got.distinct
    }

  // --- BPE kernel: the fused token walk must equal the literal
  //     chained-replace chain for ANY text and merge list — the
  //     semantics the t40 oracle was derived from. The replica below
  //     is the declarative chain verbatim in plain Java semantics
  //     (String.replace is the same left-to-right non-overlapping
  //     scan as UTF8String.replace). Alphabet includes the '|' guard
  //     itself, multi-char and astral merge symbols, and doubled
  //     spaces, so the consumed-trailing-space rule, guard
  //     collisions, and code-point splitting are all exercised. ---
  private def bpeReplica(text: String,
      merges: List[(String, String)]): Int = {
    val words = text.split(" ", -1).filter(_.nonEmpty)
    if (words.isEmpty) return 1
    val spaced = words.map { w =>
      val sb = new StringBuilder
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        if (sb.nonEmpty) sb += ' '
        sb.appendAll(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      sb.toString
    }
    val st0 = " " + spaced.mkString(" | ") + " "
    val applied = merges.foldLeft(st0) { case (st, (l, r)) =>
      st.replace(s" $l $r ", s" $l$r ")
    }
    applied.trim.split(" ", -1).count(_ != "|")
  }

  private val bpeChar = Gen.oneOf("a", "b", "c", "|", "é", "😀")
  private val bpeText: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, bpeChar).map(_.mkString)),
      Gen.const(""))).map(_.mkString(" "))
  private val bpeMergeTok =
    Gen.oneOf("a", "b", "c", "aa", "ab", "ba", "|", "é", "😀")
  private val bpeMerges: Gen[List[(String, String)]] =
    Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(bpeMergeTok, bpeMergeTok)))

  property("bpeTokenCount == the chained literal-replace replica") =
    forAll(bpeText, bpeMerges) { (text, merges) =>
      TextExprs.bpeTokenCount(UTF8String.fromString(text),
        merges.map(_._1).toArray, merges.map(_._2).toArray,
        merges.map(m => m._1 + m._2).toArray) ==
        bpeReplica(text, merges)
    }

  property("WAV frame analysis replays the sample formula on random layouts") =
    forAll(Gen.choose(1L, 1L << 40), Gen.oneOf(8000, 16000, 44100),
      Gen.choose(1, 2), Gen.choose(1, 300), Gen.oneOf(4, 6, 8),
      Gen.choose(1, 64)) { (id, rate, nch, nf, lsize, frameLen) =>
      import graft.ops.Multimodal
      val wav = Multimodal.encodeWav(id, rate, nch, nf, lsize)
      val frames = Multimodal.decodeWavFrames(id, wav, frameLen)
      def v(i: Int): Long = ((id * 31 + i * 7) % 65536) - 32768
      val (_, _, _, _, _, _, globalPeak) = Multimodal.decodeWav(wav)
      frames.size == nf / frameLen &&
        frames.zipWithIndex.forall { case (f, idx) =>
          val xs = (idx * frameLen until (idx + 1) * frameLen).map(v)
          f.frame_id == idx && f.start == idx * frameLen &&
            f.n_samples == frameLen &&
            f.energy == xs.map(x => x * x).sum &&
            f.max_abs == xs.map(math.abs).max &&
            f.max_abs <= globalPeak &&
            f.n_zero_cross == xs.sliding(2)
              .count(p => p.length == 2 && (p(0) < 0) != (p(1) < 0))
        }
    }
}
