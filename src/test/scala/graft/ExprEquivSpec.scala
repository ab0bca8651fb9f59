package graft

import graft.functions.{TextExprs, VectorExprs}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The fused custom expressions claim bitwise equivalence to the
  * declarative Spark forms they replace — this suite PROVES it on a
  * corpus of edge cases (empty strings, single tokens, doubled spaces,
  * multi-byte unicode, zero vectors), not just on the fixture data the
  * oracle already covers. Any drift between a fused expression and its
  * declarative twin is a correctness bug, not a perf detail: the
  * DuckDB oracles were derived from the declarative semantics.
  */
class ExprEquivSpec extends SparkSpec {

  private lazy val texts: Seq[String] = Seq(
    "", " ", "  ", "a", "a b", "a b c", "a b c d",
    "a  b", " leading", "trailing ", "dup dup dup dup",
    "naïve café über schön", "日本語 テスト 文字列 です",
    "mixed 日本 ascii ユニコード tokens here",
    "x" * 500, ("tok " * 100).trim
  ) ++ TestSpark.spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("text").collect().map(_.getString(0)).toSeq

  private lazy val textDf = {
    import TestSpark.spark.implicits._
    texts.toDF("text")
  }

  private def assertAllEqual(df: org.apache.spark.sql.DataFrame,
      fused: Column, declarative: Column): Unit = {
    val bad = df.select(col("*"), fused.as("f"), declarative.as("d"))
      .filter(not(col("f") <=> col("d")))
    assert(bad.isEmpty, s"fused != declarative:\n${bad.take(3).mkString("\n")}")
  }

  test("CharNGrams == array_distinct(transform(substr)) on any text") {
    val n = 3
    val idx = when(length(col("text")) - (n - 1) >= 1,
      sequence(lit(1), length(col("text")) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    assertAllEqual(textDf,
      TextExprs.charNGrams(col("text"), n),
      array_distinct(transform(idx, i => col("text").substr(i, lit(n)))))
  }

  test("ShingleHashes == sorted distinct xxhash64 of joined token slices") {
    val n = 3
    val toks = split(col("text"), " ")
    val nSh = size(toks) - (n - 1)
    val idx = when(nSh >= 1, sequence(lit(1), nSh))
      .otherwise(array().cast("array<int>"))
    assertAllEqual(textDf,
      TextExprs.shingleHashes(col("text"), n),
      array_sort(array_distinct(transform(idx,
        i => xxhash64(array_join(slice(toks, i, lit(n)), " "))))))
  }

  test("NgramPolyHashes == transform(poly_hash(array_join(slice))) per window") {
    val n = 3
    val toks = split(col("text"), " ")
    val nW = size(toks) - (n - 1)
    val idx = when(nW >= 1, sequence(lit(1), nW))
      .otherwise(array().cast("array<int>"))
    // window order, duplicates kept — the kernel's contract (its
    // consumers are min-reductions, where multiset ≡ set)
    assertAllEqual(textDf,
      TextExprs.ngramPolyHashes(col("text"), n),
      transform(idx,
        i => TextExprs.polyHash(array_join(slice(toks, i, lit(n)), " "))))
  }

  test("MinHashSig over NgramPolyHashes == the t60 declarative " +
      "string-shingle signature (distinct strings, then polyHash)") {
    // the consumer-level identity the rep-level t60 rewrite rests on:
    // min over the window MULTISET equals min over the DISTINCT set,
    // so the kernel (duplicates kept) feeds minHashSig bit-identically
    // to the array_distinct string form the oracle replays
    val P = 2147483647L
    val rnd = new scala.util.Random(29)
    val a = Seq.fill(8)(1L + rnd.nextInt(Int.MaxValue - 1))
    val b = Seq.fill(8)(rnd.nextInt(Int.MaxValue).toLong)
    val toks = split(col("text"), " ")
    val nT = size(toks)
    val shStrs = array_distinct(
      when(nT >= 3, transform(sequence(lit(1), nT - 2),
        i => array_join(slice(toks, i, lit(3)), " ")))
        .otherwise(array().cast("array<string>")))
    assertAllEqual(textDf,
      TextExprs.minHashSig(
        TextExprs.ngramPolyHashes(col("text"), 3), a, b, P),
      TextExprs.minHashSig(
        transform(shStrs, t => TextExprs.polyHash(t)), a, b, P))
  }

  test("MinHashSig == k x array_min over the universal hash family") {
    val P = 2147483647L
    val rnd = new scala.util.Random(13)
    val a = Seq.fill(8)(1L + rnd.nextInt(Int.MaxValue - 1))
    val b = Seq.fill(8)(rnd.nextInt(Int.MaxValue).toLong)
    val df = textDf.select(
      TextExprs.shingleHashes(col("text"), 2).as("sh"))
    val declarative = array((0 until 8).map { j =>
      coalesce(array_min(transform(col("sh"), h =>
        (lit(a(j)) * h.bitwiseAND(lit(0xffffffffL)) + lit(b(j))) % P)),
        lit(Long.MaxValue)) // fused yields MaxValue sentinels on empty
    }: _*)
    assertAllEqual(df,
      TextExprs.minHashSig(col("sh"), a, b, P), declarative)
  }

  test("HyperplaneSigs == per-bit sign-of-dot signatures") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(99)
    val vecs: Seq[Array[Float]] =
      Seq.fill(40)(Array.fill(16)((rnd.nextGaussian() * 2).toFloat)) ++
        Seq(Array.fill(16)(0f), Array.fill(16)(1f))
    val df = vecs.toDF("embedding")
    val nTables = 3
    val nBits = 4
    val planes: Seq[Seq[Double]] =
      Seq.fill(nTables * nBits)(Seq.fill(16)(rnd.nextGaussian()))
    def unfusedSig(t: Int): Column =
      (0 until nBits).map { bit =>
        val p = array(planes(t * nBits + bit).map(lit): _*)
        when(VectorExprs.vecDot(col("embedding"), p) >= 0, 1 << bit)
          .otherwise(0)
      }.reduce(_ + _)
    assertAllEqual(df,
      VectorExprs.hyperplaneSigs(col("embedding"), planes, nBits),
      array((0 until nTables).map(unfusedSig): _*))
  }

  test("PolyHash == character fold modulo M") {
    assertAllEqual(textDf,
      TextExprs.polyHash(col("text")),
      aggregate(
        transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L), (acc, cp) => (acc * 31L + cp) % 1000000007L))
  }

  test("AdcScore == aggregate(zip_with) left fold over the LUT") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(64)((
      Seq.fill(8)(rnd.nextInt(16)),
      Seq.fill(8)(Seq.fill(16)(rnd.nextGaussian())))) :+
      ((Seq.empty[Int], Seq.empty[Seq[Double]]))
    val df = rows.toDF("codes", "lut")
    assertAllEqual(df,
      VectorExprs.adcScore(col("codes"), col("lut")),
      aggregate(zip_with(col("codes"), col("lut"),
        (c, row) => get(row, c)), lit(0.0), (acc, x) => acc + x))
  }

  test("AdcScore: out-of-range / negative / null codes and null LUT rows " +
      "yield NULL, matching the declarative twin") {
    import TestSpark.spark.implicits._
    // adc_score is SQL-registered, so adversarial inputs are reachable;
    // the unchecked form read raw UnsafeArrayData bytes on these
    val rows: Seq[(Seq[Option[Int]], Seq[Option[Seq[Double]]])] = Seq(
      (Seq(Some(0), Some(99)), Seq(Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))),
      (Seq(Some(0), Some(-1)), Seq(Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))),
      (Seq(Some(0), None), Seq(Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))),
      (Seq(Some(0), Some(1)), Seq(Some(Seq(1.0, 2.0)), None)),
      (Seq(Some(1), Some(0)), Seq(Some(Seq(1.0, 2.0)), Some(Seq(3.0)))),
      // LENGTH MISMATCH both ways: zip_with null-pads the shorter
      // side, so the declarative fold is NULL — the fused kernel must
      // agree, not silently sum the min-length prefix
      (Seq(Some(0), Some(1), Some(0)),
        Seq(Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))),
      (Seq(Some(0)), Seq(Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))))
    val df = rows.toDF("codes", "lut")
    assertAllEqual(df,
      VectorExprs.adcScore(col("codes"), col("lut")),
      aggregate(zip_with(col("codes"), col("lut"),
        (c, row) => get(row, c)), lit(0.0), (acc, x) => acc + x))
    // literal args constant-fold at optimize time → interpreted eval
    VectorExprs.register(TestSpark.spark)
    assert(TestSpark.spark.sql(
      "SELECT adc_score(array(5), array(array(1.0D))) AS s").head().isNullAt(0))
    assert(TestSpark.spark.sql(
      "SELECT adc_score(array(-1), array(array(1.0D))) AS s").head().isNullAt(0))
  }

  test("TopTokenFreq ignores null tokens, matching the declarative twin") {
    import TestSpark.spark.implicits._
    val rows: Seq[Seq[Option[String]]] = Seq(
      Seq(Some("a"), None, Some("a"), Some("b")),
      Seq(None, None),
      Seq(None, Some("x")))
    val df = rows.toDF("toks")
    val toks = col("toks")
    assertAllEqual(df,
      TextExprs.topTokenFreq(toks),
      coalesce(array_max(transform(array_distinct(toks),
        t => size(filter(toks, x => x === t)))), lit(0)))
    // interpreted (constant-folded) path
    VectorExprs.register(TestSpark.spark)
    assert(TestSpark.spark.sql(
      "SELECT top_token_freq(array('a', NULL, 'a')) AS f")
      .head().getInt(0) == 2)
  }

  test("TopTokenFreq == array_max of per-distinct-token filter counts") {
    val toks = split(col("text"), " ")
    assertAllEqual(textDf,
      TextExprs.topTokenFreq(toks),
      // declarative O(distinct·n) twin (empty array -> null max; the
      // fused kernel returns 0 for an empty input, which split never
      // produces — guard with coalesce-on-empty for the comparison)
      coalesce(array_max(transform(array_distinct(toks),
        t => size(filter(toks, x => x === t)))), lit(0)))
  }

  // real fixture vectors + adversarial edges: a zero vector (normalizes
  // to all-0.0), an empty vector, a short vector (length mismatch →
  // the declarative zip_with null-pads → cid -1), and exact duplicates
  // of a centroid (tie-break must keep the lowest cid)
  private lazy val vecDf = {
    import TestSpark.spark.implicits._
    val real = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(64).select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val edges: Seq[Seq[Double]] = Seq(
      Seq.fill(64)(0.0), Seq.empty[Double], Seq(1.0, 2.0, 3.0),
      real.head)
    (real ++ edges).toDF("embedding")
  }

  test("NearestCell == aggregate-fold over a struct-literal codebook") {
    val rnd = new scala.util.Random(7)
    // duplicate centroid 0 as centroid 3: ties must keep the lowest cid
    val c0 = Seq.fill(64)(rnd.nextGaussian())
    val cents: Seq[(Int, Seq[Double])] = Seq(
      0 -> c0,
      1 -> Seq.fill(64)(rnd.nextGaussian()),
      2 -> Seq.fill(64)(rnd.nextGaussian()),
      3 -> c0)
    val v = col("embedding")
    assertAllEqual(vecDf,
      VectorExprs.nearestCell(v, cents.map(_._2)),
      graft.ops.Similarity.nearestIn(
        graft.ops.Similarity.centroidLit(cents), v))
  }

  test("CharCounts == explode(split)->count multiset, incl. empty-text quirk") {
    // declarative twin per text: count of each distinct split element
    val chars = split(col("text"), "")
    val twin = array_sort(transform(array_distinct(chars), ch =>
      struct(ch.as("key"),
        size(filter(chars, x => x === ch)).cast("long").as("value"))))
    assertAllEqual(textDf,
      array_sort(map_entries(TextExprs.charCounts(col("text")))), twin)
  }

  test("TokenCounts == explode->count multiset over the token array") {
    val toks = split(col("text"), " ")
    val twin = array_sort(transform(array_distinct(toks), t =>
      struct(t.as("key"),
        size(filter(toks, x => x === t)).cast("long").as("value"))))
    assertAllEqual(textDf,
      array_sort(map_entries(TextExprs.tokenCounts(toks))), twin)
  }

  test("ProfileArgmax == aggregate-fold of array_intersect scores") {
    // overlapping profiles (shared trigrams), a doc matching none, and
    // ties (doc intersects p1 and p2 equally → first profile wins)
    val profiles: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("ein", "der", "sch"),
      "en" -> Seq("the", "ing", "ion"),
      "fr" -> Seq("les", "ion", "der"))
    val tgs = TextExprs.charNGrams(col("text"), 3)
    val ps = typedlit(profiles.map { case (l, t) => (l, t) })
    val fold = aggregate(ps,
      struct(lit(-1).as("score"), lit("").as("pl")),
      (acc, p) => {
        val sc = size(array_intersect(tgs, p.getField("_2")))
        when(sc > acc.getField("score"),
          struct(sc.as("score"), p.getField("_1").as("pl")))
          .otherwise(acc)
      })
    assertAllEqual(textDf,
      TextExprs.profileArgmax(tgs, profiles), fold)
  }

  test("PqEncode == transform(subVec → nearestIn) composition") {
    val m = 8; val k = 4; val sub = 8
    val rnd = new scala.util.Random(11)
    val books: Seq[Seq[(Int, Seq[Double])]] = Seq.fill(m)(
      (0 until k).map(c => c -> Seq.fill(sub)(rnd.nextGaussian())))
    val allBooks = array(books.map(graft.ops.Similarity.centroidLit): _*)
    assertAllEqual(vecDf,
      VectorExprs.pqEncode(col("embedding"), books.map(_.map(_._2))),
      transform(sequence(lit(0), lit(m - 1)), mi =>
        graft.ops.Similarity.nearestIn(element_at(allBooks, mi + 1),
          graft.ops.Similarity.subVec(mi, sub)).getField("cid")))
  }

  test("NgramHashes(ordered) == transform(xxhash64(array_join(slice)))") {
    val n = 5
    val toks = split(col("text"), " ")
    val nWin = size(toks) - (n - 1)
    val idx = when(nWin >= 1, sequence(lit(0), nWin - 1))
      .otherwise(array().cast("array<int>"))
    assertAllEqual(textDf,
      TextExprs.ngramHashes(toks, n, distinct = false),
      transform(idx, i => xxhash64(array_join(slice(toks, i + 1, lit(n)), " "))))
  }

  test("NgramHashes(distinct) == first-appearance distinct of the ordered form") {
    val n = 3
    val toks = split(col("text"), " ")
    val nWin = size(toks) - (n - 1)
    val idx = when(nWin >= 1, sequence(lit(0), nWin - 1))
      .otherwise(array().cast("array<int>"))
    assertAllEqual(textDf,
      TextExprs.ngramHashes(toks, n, distinct = true),
      array_distinct(transform(idx,
        i => xxhash64(array_join(slice(toks, i + 1, lit(n)), " ")))))
  }

  test("BpeTokenCount == the chained-replace declarative count (t40)") {
    // the declarative twin is t40's original form verbatim: spaced
    // symbol state, one replace pass per merge in order, trim-split
    // count excluding the '|' guard. Merges are chosen to exercise
    // the deviant edges: repeated-symbol runs (a,a — the consumed-
    // trailing-space rule), a second round consuming a first-round
    // product (aa,a), multi-char on the right (b,aa), and a pair that
    // never occurs
    def declarativeCount(merges: Seq[(String, String)]): Column = {
      val st0 = concat(lit(" "), array_join(transform(
          filter(split(col("text"), " "), w => length(w) > 0),
          w => array_join(split(w, ""), " ")), " | "), lit(" "))
      val applied = merges.foldLeft(st0) { case (st, (l, r)) =>
        replace(st, lit(s" $l $r "), lit(s" $l$r "))
      }
      size(filter(split(trim(applied), " "), t => t =!= "|"))
    }
    val merges = Seq("a" -> "a", "aa" -> "a", "b" -> "aa", "d" -> "u",
      "q" -> "z")
    val runs = Seq("a a", "aaaa", "aaaaa b", "baaa ba", "dup dup",
      " aa  aaa ", "a|a |b", "ab" * 40)
    val df = {
      import TestSpark.spark.implicits._
      (texts ++ runs).toDF("text")
    }
    assertAllEqual(df,
      TextExprs.bpeTokenCount(col("text"), merges),
      declarativeCount(merges))
    // and under the REAL learned merges on the fixture corpus
    val learned = graft.ops.Text.learnedMergePairs(TestSpark.spark, sf0001)
    assertAllEqual(textDf,
      TextExprs.bpeTokenCount(col("text"), learned),
      declarativeCount(learned))
  }

  test("QualityStats == (size, array_distinct, stop-filter) over split") {
    // the fused kernel replaces split(text,' ') + four array walks;
    // every statistic must match the declarative forms exactly,
    // including empty tokens from doubled/leading/trailing spaces
    // (split keeps them at Spark's default limit -1) and multi-byte
    // text (0x20 never occurs inside a UTF-8 sequence)
    val toks = split(col("text"), " ")
    val stop = array(Seq("the", "a", "of", "and", "to", "in").map(lit): _*)
    val stopTexts = Seq("the a of and to in", "the the the",
      "a", " the ", "thee of andy in2 a", "of  of", "to")
    val df = textDf.unionByName {
      import TestSpark.spark.implicits._
      stopTexts.toDF("text")
    }
    assertAllEqual(df,
      TextExprs.qualityStats(col("text")),
      struct(size(toks).as("n_tok"),
        size(array_distinct(toks)).as("n_distinct"),
        size(filter(toks, t => array_contains(stop, t))).as("n_stop")))
  }

  test("fused qualityExpr is bitwise the declarative quality heuristic") {
    // same arithmetic tree, counts from the fused walk: the DOUBLE
    // must be bit-identical (the t04/t49 oracles hash it at 6 digits,
    // but the pin here is exact, not rounded)
    assertAllEqual(textDf.filter(length(col("text")) > 0),
      graft.ops.Text.qualityExpr,
      graft.ops.Text.qualityExprDeclarative)
  }

  test("SortedIntersectCount == size(array_intersect) on shingle arrays") {
    // contract inputs: sorted-distinct long arrays (the ShingleHashes
    // output shape). Pin on every corpus pair shape that matters:
    // empty × empty, empty × non-empty, disjoint, identical, partial
    // overlap at both ends — built from REAL shingle arrays crossed
    // against shifted/sliced variants of themselves.
    val sh = TextExprs.shingleHashes(col("text"), 3)
    val df = textDf.select(sh.as("a"),
      // a deliberately different sorted-distinct array: the doc's
      // 2-shingles (different hash stream, arbitrary overlap with a)
      TextExprs.shingleHashes(col("text"), 2).as("b"))
      .unionByName(textDf.select(sh.as("a"), sh.as("b"))) // identical
      .unionByName(textDf.select(sh.as("a"),
        slice(sh, lit(1), greatest(size(sh) / 2, lit(0))).as("b")))
    assertAllEqual(df,
      TextExprs.sortedIntersectCount(col("a"), col("b")),
      size(array_intersect(col("a"), col("b"))))
  }

  // ---- TICK decimal paths (TickExprs): the scalar davg/dsum contract ----

  /** Deterministic double corpus spanning the tick fast paths (integer,
    * 2-decimal money) and the canonical fallback (ratios, full-precision
    * products, negatives, tiny/huge magnitudes, values adversarial to a
    * naive x*1e10 rounding).
    */
  private lazy val tickDoubles: Seq[(Int, java.lang.Double)] = {
    val rnd = new scala.util.Random(1919)
    val base: Seq[Double] = Seq(
      0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 0.5, -0.5, 1.5e-11, -1.5e-11,
      0.05, 0.15, 0.25, 1e-10, 5e-11, -5e-11, 12345.67, -12345.67,
      1.0 / 3.0, 2.0 / 7.0, 0.30000000005, 0.1 + 0.2, 99999999.99,
      -99999999.99, 9.2e8 - 1, -(9.2e8 - 1), 123456789.123456789,
      math.Pi, -math.E) ++
      (1 to 200).map(_ => rnd.nextDouble()) ++ // ratios in [0,1)
      (1 to 200).map(_ => rnd.nextInt(100000) / 100.0) ++ // money
      (1 to 200).map(_ => rnd.nextInt(2000000).toDouble - 1e6) ++ // ints
      (1 to 200).map(_ => (rnd.nextDouble() - 0.5) * 2e6) ++ // wide
      (1 to 100).map(_ => rnd.nextInt(1000000).toDouble /
        (rnd.nextInt(999999) + 1).toDouble) // integer ratios (t19 p's)
    base.zipWithIndex.map { case (v, i) =>
      (i % 7, java.lang.Double.valueOf(v)) } :+
      ((3, null.asInstanceOf[java.lang.Double])) :+
      ((8, null.asInstanceOf[java.lang.Double])) // all-null group 8
  }

  test("ticks-davg (long sum) == decimal davg, bitwise, incl null groups") {
    // davgT's domain is the bounded-Σ|x| regime (probabilities/ratios
    // over length-bounded groups — the t19 shape); within it the long
    // tick sum must equal the decimal davg bit-for-bit. Outside it,
    // ANSI sum(long) THROWS (ARITHMETIC_OVERFLOW) rather than wrap —
    // a bound violation is loud, which the davg128 path exists to
    // avoid; see the next test.
    import TestSpark.spark.implicits._
    val bounded = tickDoubles.filter { case (_, v) =>
      v == null || math.abs(v.doubleValue) <= 1.0 }
    val df = bounded.toDF("g", "x")
    val bad = df.groupBy(col("g"))
      .agg(graft.ops.davg(col("x")).as("d"), graft.ops.davgT(col("x")).as("t"))
      .filter(not(col("d") <=> col("t")))
    assert(bad.isEmpty, s"davgT drifted:\n${bad.take(5).mkString("\n")}")
  }

  test("128-bit tick dsum == decimal dsum, bitwise, incl carry traffic") {
    import TestSpark.spark.implicits._
    // magnitudes near the single-long ceiling force steady lo-word
    // carries: each row's tick count is ~1e18, so the low word wraps
    // every handful of rows and the carry path is exercised both in
    // update and in partial-merge (the groupBy shuffles 32 partials)
    val rnd = new scala.util.Random(128128)
    val big = (1 to 4000).map(i =>
      (i % 5, (rnd.nextDouble() - 0.5) * 1.8e8))
    val df = big.toDF("g", "x").repartition(32)
    val bad = df.groupBy(col("g"))
      .agg(graft.ops.dsum(col("x")).as("d"), graft.ops.dsum128(col("x")).as("t"))
      .filter(not(col("d") <=> col("t")))
    assert(bad.isEmpty, s"dsum128 drifted:\n${bad.take(5).mkString("\n")}")
    // and on the mixed fast-path/fallback corpus with nulls
    val df2 = tickDoubles.toDF("g", "x")
    val bad2 = df2.groupBy(col("g"))
      .agg(graft.ops.davg(col("x")).as("d"), graft.ops.davg128(col("x")).as("t"))
      .filter(not(col("d") <=> col("t")))
    assert(bad2.isEmpty, s"davg128 drifted:\n${bad2.take(5).mkString("\n")}")
  }

  test("ticks fast paths == the canonical BigDecimal quantization, per value") {
    // the integer / 2-decimal fast paths carry a paper proof
    // (TickExprs.ticks scaladoc); this pins them against the canonical
    // valueOf+setScale path — which is itself Spark's own cast-to-
    // decimal value path — on every corpus value, at exact tick
    // granularity (an aggregate-level check could hide a ±1-tick
    // fast-path bug below double resolution at large magnitudes)
    import TestSpark.spark.implicits._
    val canonical = udf((x: Double) =>
      java.math.BigDecimal.valueOf(x)
        .setScale(10, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact())
    val df = tickDoubles.map(_._2).filter(_ != null).map(_.doubleValue).toDF("x")
    val bad = df.select(col("x"),
      graft.functions.TickExprs.decimalTicks(col("x")).as("t"),
      canonical(col("x")).as("ref"))
      .filter(not(col("t") <=> col("ref")))
    assert(bad.isEmpty, s"ticks != canonical:\n${bad.take(5).mkString("\n")}")
  }
}
