package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass polynomial rolling hash over a string's code points —
  * the fused form of `aggregate(split(text, ''), 0L,
  * (acc, c) => (acc*B + ascii(c)) % M)` (Text t06), which allocates a
  * one-char-string array element per character. Same value for any
  * BMP text (ascii(c) = code point of the character), one traversal,
  * no allocation.
  */
object TextExprs {

  /** Shared by interpreted eval and generated code. */
  def polyHash(s: UTF8String, base: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  case class PolyHash(child: Expression, base: Long, mod: Long)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects a string input, got ${child.dataType.sql}")
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash"

    override protected def nullSafeEval(a: Any): Any =
      polyHash(a.asInstanceOf[UTF8String], base, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.polyHash(
          $a, ${base}L, ${mod}L);
      """)

    override protected def withNewChildInternal(c: Expression): PolyHash =
      copy(child = c)
  }

  def polyHash(c: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    GraftSqlBridge.column(PolyHash(GraftSqlBridge.expression(c), base, mod))

  /** Shared by interpreted eval and generated code: all k permuted
    * minima of the universal hash family h_j = (a_j·h + b_j) mod p in
    * ONE traversal of the hashed-shingle array. The declarative form —
    * k × `array_min(transform(hs, h => pmod(a*h+b, p)))` — walks the
    * array k times and allocates k intermediate arrays per row; this
    * is the fused loop (k·n multiply-accumulates, zero allocation
    * beyond the output signature).
    *
    * Overflow contract (ANSI-safe): h is masked to 32 bits HERE (the
    * caller may pass full 64-bit hashes) and a < 2^31, so a·h + b <
    * 2^63 — no wraparound, and `%` on non-negative operands equals
    * `pmod`.
    */
  def minHashSig(hs: ArrayData, a: Array[Long], b: Array[Long],
      p: Long): ArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i) & 0xffffffffL
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Fused MinHash signature over an `array<long>` of shingle hashes:
    * returns `array<long>` of `a.length` permuted minima (empty input
    * yields Long.MaxValue sentinels — t09 filters empty shingle sets
    * upstream). `a`/`b` are Seq (not Array) so the expression keeps
    * value equality for `semanticEquals`/canonicalization.
    */
  case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long],
      mod: Long) extends UnaryExpression {
    require(a.length == b.length,
      s"minhash_sig: |a|=${a.length} must equal |b|=${b.length}")

    private lazy val aArr = a.toArray
    private lazy val bArr = b.toArray

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case dt => TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint> input, got ${dt.sql}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override protected def nullSafeEval(x: Any): Any =
      minHashSig(x.asInstanceOf[ArrayData], aArr, bArr, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      nullSafeCodeGen(ctx, ev, x => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.minHashSig(
          $x, $aRef, $bRef, ${mod}L);
      """)
    }

    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
  }

  def minHashSig(c: Column, a: Seq[Long], b: Seq[Long], mod: Long): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(c), a, b, mod))

  /** Distinct 64-bit hashes of a string's word n-gram shingles in ONE
    * pass over the UTF-8 bytes — the fused form of
    * `array_distinct(transform(seq, i => array_join(slice(split(text,
    * " "), i, n), " ")))`, which materializes a token array, n-token
    * slices, joined strings, and a distinct pass per row.
    *
    * Key identity: a shingle (tokens i..i+n-1 re-joined with " ") is
    * EXACTLY the original byte span from token i's first byte to token
    * i+n-1's last byte, because the split separator is the single
    * space that the join puts back (empty tokens from doubled spaces
    * round-trip too). So each shingle hashes in place — zero string is
    * ever built. ASCII 0x20 never occurs inside a multi-byte UTF-8
    * sequence, so byte scanning is char-correct. Downstream joins and
    * set intersections on the hashes equal those on the strings up to
    * 64-bit collisions (~1e-7 across millions of shingles).
    */
  def shingleHashes(s: UTF8String, n: Int, seed: Long): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20)
        spaces += 1
      i += 1
    }
    val nTokens = spaces + 1
    if (nTokens < n)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // starts(j) = first byte of token j; sentinel starts(nTokens) makes
    // "end of token j" uniformly starts(j+1) - 1
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        starts(t) = i + 1
        t += 1
      }
      i += 1
    }
    starts(nTokens) = len + 1
    val count = nTokens - n + 1
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      val b = starts(j)
      val e = starts(j + n) - 1
      out(j) = XXH64.hashUnsafeBytes(base, off + b, e - b, seed)
      j += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < count) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == count) out else java.util.Arrays.copyOf(out, w))
  }

  /** Column form of [[shingleHashes(s:*]]: string → sorted distinct
    * `array<long>` of word n-gram hashes. */
  case class ShingleHashes(child: Expression, n: Int, seed: Long)
      extends UnaryExpression {
    require(n >= 1, s"shingle_hashes: n must be >= 1, got $n")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects a string input, got ${child.dataType.sql}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override protected def nullSafeEval(a: Any): Any =
      shingleHashes(a.asInstanceOf[UTF8String], n, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.shingleHashes(
          $a, $n, ${seed}L);
      """)

    override protected def withNewChildInternal(c: Expression): ShingleHashes =
      copy(child = c)
  }

  def shingleHashes(c: Column, n: Int, seed: Long = 42L): Column =
    GraftSqlBridge.column(
      ShingleHashes(GraftSqlBridge.expression(c), n, seed))

  /** Word-bigram polyHash buckets in ONE pass — the fused form of
    * `transform(sequence(0, size(split(text,' ')) - 2), i ->
    * poly_hash(concat(ts[i], ' ', ts[i+1])) % mod)`, whose
    * higher-order-function form re-evaluates the split INSIDE the
    * lambda per element (interpreted HOFs do no common-subexpression
    * hoisting), making bigram extraction O(n²) per document. Same
    * identity as [[shingleHashes(s:*]]: the bigram string (tokens j,
    * j+1 re-joined with " ") IS the original char span from token j's
    * first char to token j+1's last, so each bigram polyHashes in
    * place — the emitted bucket is bit-identical to
    * `poly_hash("w1 w2") % mod` (the value the DuckDB oracle
    * replays), multiplicity preserved, order preserved. */
  def bigramBuckets(s: UTF8String, mod: Long): ArrayData = {
    val str = s.toString
    val len = str.length
    var spaces = 0
    var i = 0
    while (i < len) { if (str.charAt(i) == ' ') spaces += 1; i += 1 }
    val nTokens = spaces + 1
    if (nTokens < 2)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1
    val out = new Array[Long](nTokens - 1)
    var j = 0
    while (j < nTokens - 1) {
      val e = starts(j + 2) - 1 // exclusive end of the bigram span
      var acc = 0L
      var p = starts(j)
      while (p < e) {
        val cp = str.codePointAt(p)
        acc = (acc * 31 + cp) % 1000000007L
        p += Character.charCount(cp)
      }
      out(j) = acc % mod
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column form of [[bigramBuckets(s:*]]: string → `array<long>` of
    * per-bigram polyHash-mod-`mod` buckets (empty for <2 tokens). */
  case class BigramBuckets(child: Expression, mod: Long)
      extends UnaryExpression {
    require(mod > 0, s"bigram_buckets: mod must be positive, got $mod")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bigram_buckets expects a string input, got ${child.dataType.sql}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bigram_buckets"

    override protected def nullSafeEval(a: Any): Any =
      bigramBuckets(a.asInstanceOf[UTF8String], mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.bigramBuckets(
          $a, ${mod}L);
      """)

    override protected def withNewChildInternal(c: Expression): BigramBuckets =
      copy(child = c)
  }

  def bigramBuckets(c: Column, mod: Long): Column =
    GraftSqlBridge.column(
      BigramBuckets(GraftSqlBridge.expression(c), mod))

  /** Word n-gram polyHashes in ONE pass — [[bigramBuckets(s:*]]
    * generalized to n, without the bucket reduction: the fused form
    * of `transform(array_distinct(shingle strings), s ->
    * poly_hash(s))` that t60's calibration signature fed through
    * three materialized intermediates (token array, joined shingle
    * strings, distinct pass). Same span identity as the other shingle
    * kernels: the n-token shingle re-joined with " " IS the original
    * char span, so each window polyHashes in place. Emits one hash
    * per WINDOW (duplicates kept): every consumer is a MinHash-style
    * min-reduction, for which min over the window multiset equals min
    * over the distinct set — and the DuckDB twin (MIN over exploded
    * DISTINCT shingle strings) agrees for the same reason. */
  def ngramPolyHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    var spaces = 0
    var i = 0
    while (i < len) { if (str.charAt(i) == ' ') spaces += 1; i += 1 }
    val nTokens = spaces + 1
    if (nTokens < n)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1
    val count = nTokens - n + 1
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      val e = starts(j + n) - 1 // exclusive end of the shingle span
      var acc = 0L
      var p = starts(j)
      while (p < e) {
        val cp = str.codePointAt(p)
        acc = (acc * 31 + cp) % 1000000007L
        p += Character.charCount(cp)
      }
      out(j) = acc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column form of [[ngramPolyHashes(s:*]]: string → `array<long>`
    * of per-window polyHash values (window order, duplicates kept,
    * empty for <n tokens). */
  case class NgramPolyHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"ngram_poly_hashes: n must be >= 1, got $n")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"ngram_poly_hashes expects a string input, got ${child.dataType.sql}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "ngram_poly_hashes"

    override protected def nullSafeEval(a: Any): Any =
      ngramPolyHashes(a.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.ngramPolyHashes(
          $a, $n);
      """)

    override protected def withNewChildInternal(c: Expression): NgramPolyHashes =
      copy(child = c)
  }

  def ngramPolyHashes(c: Column, n: Int): Column =
    GraftSqlBridge.column(
      NgramPolyHashes(GraftSqlBridge.expression(c), n))

  /** Distinct character n-grams in one pass — the fused form of
    * `array_distinct(transform(sequence(1, length(text) - (n-1)),
    * i => substr(text, i, n)))`, which builds an index array, a
    * substring per position, and a distinct pass per row. The n-grams
    * stay STRINGS (unlike [[shingleHashes(s:*]]) because downstream
    * consumers tie-break on the n-gram's string order (t05's profile
    * rank), which a hash would scramble. Code-point aware, matching
    * `substr` semantics on any BMP+ text. */
  def charNGrams(s: UTF8String, n: Int): ArrayData = {
    val len = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // byte start offset of each code point (+ sentinel at the end)
    val starts = new Array[Int](len + 1)
    var nChars = 0
    var i = 0
    while (i < len) {
      starts(nChars) = i
      i += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      nChars += 1
    }
    starts(nChars) = len
    if (nChars < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    val count = nChars - n + 1
    while (j < count) {
      val b = starts(j)
      val e = starts(j + n)
      val bytes = new Array[Byte](e - b)
      org.apache.spark.unsafe.Platform.copyMemory(base, off + b, bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, e - b)
      seen.add(UTF8String.fromBytes(bytes))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column form of [[charNGrams(s:*]]: string → distinct
    * `array<string>` of character n-grams (first-occurrence order,
    * like `array_distinct`). */
  case class CharNGrams(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"char_ngrams: n must be >= 1, got $n")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects a string input, got ${child.dataType.sql}")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "char_ngrams"

    override protected def nullSafeEval(a: Any): Any =
      charNGrams(a.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.charNGrams($a, $n);
      """)

    override protected def withNewChildInternal(c: Expression): CharNGrams =
      copy(child = c)
  }

  def charNGrams(c: Column, n: Int): Column =
    GraftSqlBridge.column(CharNGrams(GraftSqlBridge.expression(c), n))

  /** Shared by interpreted eval and generated code: the multiplicity
    * of the most frequent element of a token array, in ONE hash-count
    * pass — the fused form of `array_max(transform(array_distinct(ts),
    * t => size(filter(ts, x => x = t))))` (Text t33's repetition
    * gate), which is O(distinct·n) per row with an intermediate array
    * per distinct token. This is O(n) with one map. */
  def topTokenFreq(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      // null elements are NOT counted (SQL-registered function, so
      // array('a', NULL) is reachable; a typed getter on a null slot
      // of UnsafeArrayData reads unspecified bytes)
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val prev = counts.get(t)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(t, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  case class TopTokenFreq(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"top_token_freq expects array<string>, got ${other.sql}")
      }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "top_token_freq"

    override protected def nullSafeEval(a: Any): Any =
      topTokenFreq(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.topTokenFreq($a);
      """)

    override protected def withNewChildInternal(c: Expression): TopTokenFreq =
      copy(child = c)
  }

  def topTokenFreq(c: Column): Column =
    GraftSqlBridge.column(TopTokenFreq(GraftSqlBridge.expression(c)))

  /** Shared by interpreted eval and generated code: best-overlap
    * profile pick. `map` sends a trigram to the BITMASK of profiles
    * containing it; counts accumulate per profile in one pass over the
    * (distinct) input trigrams, then the argmax scans profiles in
    * DECLARATION order with the fold contract it replaces: init score
    * −1, strict `>` (ties keep the FIRST profile; any profile beats
    * the init even at overlap 0). Null input elements are skipped. */
  def profileArgmax(arr: ArrayData,
      map: java.util.HashMap[UTF8String, java.lang.Long],
      langs: Array[UTF8String])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val counts = new Array[Int](langs.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = map.get(arr.getUTF8String(i))
        if (m != null) {
          var mask = m.longValue()
          while (mask != 0L) {
            counts(java.lang.Long.numberOfTrailingZeros(mask)) += 1
            mask &= mask - 1
          }
        }
      }
      i += 1
    }
    var best = -1
    var bestL = -1
    var l = 0
    while (l < langs.length) {
      if (counts(l) > best) { best = counts(l); bestL = l }
      l += 1
    }
    val pl = if (bestL < 0) UTF8String.EMPTY_UTF8 else langs(bestL)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, pl))
  }

  /** Classify-by-profile-overlap as ONE codegen'd expression:
    * `struct(score, pl)` = the profile with the largest
    * |input ∩ profile| (inputs distinct, as [[CharNGrams]] emits).
    * Replaces the `aggregate` fold over a struct-literal profile
    * array computing `size(array_intersect(...))` per profile —
    * interpreted lambdas plus an intersection allocation per profile
    * per row. One hash-map pass instead; bitmask per trigram, so at
    * most 64 profiles. */
  case class ProfileArgmax(child: Expression,
      profiles: Seq[(String, Seq[String])]) extends UnaryExpression {
    require(profiles.length <= 64,
      "profile_argmax: at most 64 profiles (bitmask per trigram)")
    @transient private lazy val langs: Array[UTF8String] =
      profiles.map(p => UTF8String.fromString(p._1)).toArray
    @transient private lazy val tgMap
        : java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long]()
      profiles.zipWithIndex.foreach { case ((_, tgs), i) =>
        tgs.foreach { tg =>
          val k = UTF8String.fromString(tg)
          val prev = m.get(k)
          m.put(k, java.lang.Long.valueOf(
            (if (prev == null) 0L else prev.longValue()) | (1L << i)))
        }
      }
      m
    }
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"profile_argmax expects array<string>, got ${other.sql}")
      }
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("score", IntegerType,
          nullable = false),
        org.apache.spark.sql.types.StructField("pl", StringType,
          nullable = false)))
    override def prettyName: String = "profile_argmax"

    override protected def nullSafeEval(a: Any): Any =
      profileArgmax(a.asInstanceOf[ArrayData], tgMap, langs)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mapRef = ctx.addReferenceObj("profileMap", tgMap,
        "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String," +
          "java.lang.Long>")
      val langsRef = ctx.addReferenceObj("profileLangs", langs,
        "org.apache.spark.unsafe.types.UTF8String[]")
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$
          .profileArgmax($a, $mapRef, $langsRef);
      """)
    }

    override protected def withNewChildInternal(c: Expression): ProfileArgmax =
      copy(child = c)
  }

  def profileArgmax(c: Column,
      profiles: Seq[(String, Seq[String])]): Column =
    GraftSqlBridge.column(ProfileArgmax(GraftSqlBridge.expression(c),
      profiles))

  /** Shared by interpreted eval and generated code: per-code-point
    * occurrence counts as a map, exactly the multiset `split(text,'')`
    * explodes to — including the Java regex quirk that an EMPTY string
    * splits to [""] (one empty-string element), which the fused form
    * must reproduce or empty docs vanish from the downstream explode.
    * First-appearance key order (deterministic; map order is
    * irrelevant to every consumer, but determinism keeps plans
    * replayable). */
  def charCounts(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val str = s.toString
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    if (str.isEmpty) m.put("", 1L)
    else {
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        val w = Character.charCount(cp)
        val ch = str.substring(i, i + w)
        val prev = m.get(ch)
        m.put(ch, if (prev == null) 1L else prev.longValue() + 1L)
        i += w
      }
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue.longValue()
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
  }

  /** `map<char, count>` of a text's code points in ONE pass — the
    * fused form of `explode(split(text, '')) → groupBy(ch) → count`:
    * the declarative form shuffles EVERY character of the corpus
    * (t37 moved 10M exploded single-char rows at sf0.1) where this
    * emits only the ≤|alphabet| distinct counts per row, shrinking
    * the exploded relation ~25× before any exchange. Counting is
    * row-local, so downstream arithmetic (log2 / decimal sums) stays
    * in Spark's built-in expressions — bitwise identity with the
    * unfused plan needs no numeric argument at all. */
  case class CharCounts(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"char_counts expects string, got ${other.sql}")
      }
    override def dataType: DataType = org.apache.spark.sql.types.MapType(
      StringType, LongType, valueContainsNull = false)
    override def prettyName: String = "char_counts"

    override protected def nullSafeEval(a: Any): Any =
      charCounts(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.charCounts($a);
      """)

    override protected def withNewChildInternal(c: Expression): CharCounts =
      copy(child = c)
  }

  def charCounts(c: Column): Column =
    GraftSqlBridge.column(CharCounts(GraftSqlBridge.expression(c)))

  /** Shared by interpreted eval and generated code: the token twin of
    * [[charCounts]] — per-row occurrence counts of an array's
    * elements, first-appearance order. Null elements are skipped
    * (the [[topTokenFreq]] contract; map keys cannot be null, and the
    * tokenizers feeding this never produce null tokens). */
  def tokenCounts(arr: ArrayData): org.apache.spark.sql.catalyst.util.MapData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val prev = m.get(t)
        m.put(t, if (prev == null) 1L else prev.longValue() + 1L)
      }
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue.longValue()
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
  }

  /** `map<token, count>` of an array's elements in ONE pass — the
    * fused form of `explode(tokens) → groupBy(token) → count` when the
    * grouping is per-row (term frequency): counting is row-local, so
    * the exploded relation shrinks to the DISTINCT tokens per row
    * before any exchange, and the (row, token) count shuffle
    * disappears entirely. */
  case class TokenCounts(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"token_counts expects array<string>, got ${other.sql}")
      }
    override def dataType: DataType = org.apache.spark.sql.types.MapType(
      StringType, LongType, valueContainsNull = false)
    override def prettyName: String = "token_counts"

    override protected def nullSafeEval(a: Any): Any =
      tokenCounts(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.tokenCounts($a);
      """)

    override protected def withNewChildInternal(c: Expression): TokenCounts =
      copy(child = c)
  }

  def tokenCounts(c: Column): Column =
    GraftSqlBridge.column(TokenCounts(GraftSqlBridge.expression(c)))

  /** Shared by interpreted eval and generated code: xxhash64 (seed 42,
    * bit-identical to SQL `xxhash64(array_join(slice(toks, i+1, n),
    * ' '))`) of every n-token sliding window, in window order — or the
    * first-appearance DISTINCT hash set when `distinct`. One reusable
    * byte buffer serves every window; null elements are skipped along
    * with their separator, mirroring array_join. The declarative twin
    * re-evaluates its lambda — and everything inside it, including a
    * `split` the optimizer cannot hoist — once PER WINDOW in the
    * interpreted HOF evaluator; this runs once per row inside
    * whole-stage codegen. */
  def ngramHashes(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val cnt = arr.numElements()
    val nw = cnt - n + 1
    if (nw <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val toks = new Array[Array[Byte]](cnt)
    var i = 0
    while (i < cnt) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    var buf = new Array[Byte](256)
    def hashWindow(start: Int): Long = {
      var len = 0
      var first = true
      var j = start
      while (j < start + n) {
        val t = toks(j)
        if (t != null) {
          val need = len + t.length + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!first) { buf(len) = ' '; len += 1 }
          System.arraycopy(t, 0, buf, len, t.length)
          len += t.length
          first = false
        }
        j += 1
      }
      XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
    }
    if (distinct) {
      val seen = new java.util.LinkedHashSet[java.lang.Long](nw * 2)
      var w = 0
      while (w < nw) { seen.add(hashWindow(w)); w += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val out = new Array[Any](nw)
      var w = 0
      while (w < nw) { out(w) = hashWindow(w); w += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** `array<long>` of sliding n-token window hashes in ONE pass — the
    * fused form of `transform(sequence(0, nWin-1), i =>
    * xxhash64(array_join(slice(toks, i+1, n), ' ')))` (+
    * `array_distinct` when `distinct`). The HOF chain is interpreted
    * and re-runs its whole lambda per window — measured 15.5 s for
    * the t43 window build at sf1 against 4.1 s with the split merely
    * hoisted and <1 s fused; this keeps window hashing inside
    * whole-stage codegen and allocation-free per window. */
  case class NgramHashes(child: Expression, n: Int, distinct: Boolean)
      extends UnaryExpression {
    require(n >= 1, s"ngram_hashes needs n >= 1, got $n")
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes expects array<string>, got ${other.sql}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "ngram_hashes"

    override protected def nullSafeEval(a: Any): Any =
      ngramHashes(a.asInstanceOf[ArrayData], n, distinct)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$
          .ngramHashes($a, $n, $distinct);
      """)

    override protected def withNewChildInternal(c: Expression): NgramHashes =
      copy(child = c)
  }

  def ngramHashes(c: Column, n: Int, distinct: Boolean): Column =
    GraftSqlBridge.column(
      NgramHashes(GraftSqlBridge.expression(c), n, distinct))

  /** Shared by interpreted eval and generated code: |a ∩ b| for two
    * SORTED-DISTINCT long arrays by two-pointer merge — one linear
    * walk, zero allocation. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { n += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    n
  }

  /** `size(array_intersect(a, b))` for SORTED-DISTINCT `array<long>`
    * inputs — the [[ShingleHashes]] output contract (it sorts).
    * NOTE: [[NgramHashes]] with distinct=true is NOT in contract: it
    * deliberately emits hashes in FIRST-APPEARANCE order; feeding it
    * here would silently undercount.
    * The builtin allocates and probes a hash set per row; on the
    * near-dup verify joins (t09/t57/t08's expansion, the streaming
    * gate) that per-candidate-pair set build IS the verify stage's
    * cost. This is the two-pointer merge instead: same count, pinned
    * by ExprEquivSpec, O(|a| + |b|) with no allocation. Inputs that
    * are NOT sorted-distinct are out of contract (the count would
    * drift from array_intersect) — every caller feeds shingle arrays.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count expects (array<long>, array<long>), got $other")
      }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sorted_intersect_count"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$
          .sortedIntersectCount($a, $b);
      """)

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): SortedIntersectCount =
      copy(left = l, right = r)
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Fused BPE tokenize-and-count (t40's hot path): the token count
    * after applying `merges` in order to a document's symbol state.
    * The declarative form materializes the spaced symbol STRING
    * (≈3× text bytes) and then 12 chained `replace` passes — 13
    * full-length string allocations per row; this walks a token array
    * once per merge with zero intermediate strings.
    *
    * EXACT-SEMANTICS contract with the declarative chain (pinned by
    * ExprEquivSpec):
    *  - words = regex-split on ' ' with empties dropped; initial
    *    tokens are per-CODE-POINT (Java regex `split("")` semantics),
    *    with a '|' guard token between words;
    *  - each merge pass mirrors `UTF8String.replace(" l r ", " lr ")`
    *    left-to-right non-overlapping INCLUDING its consumed-
    *    trailing-space rule: after a match at (i, i+1) the next match
    *    can start no earlier than token i+3, because the separator
    *    before token i+2 was consumed by the pattern — so " a a a a "
    *    merges to " aa a a ", not " aa aa ";
    *  - a wordless document counts 1 (the `split(trim(x), " ")` of an
    *    empty string is one empty token), and '|' guards are excluded
    *    from the final count exactly like the declarative filter.
    */
  def bpeTokenCount(s: UTF8String, ls: Array[String],
      rs: Array[String], merged: Array[String]): Int = {
    val text = s.toString
    val tokens = new java.util.ArrayList[String]()
    var wordCount = 0
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          if (wordCount > 0) tokens.add("|")
          var j = start
          while (j < i) {
            val cp = text.codePointAt(j)
            val cc = Character.charCount(cp)
            tokens.add(text.substring(j, j + cc))
            j += cc
          }
          wordCount += 1
        }
        start = i + 1
      }
      i += 1
    }
    if (wordCount == 0) return 1
    var cur = tokens
    var m = 0
    while (m < ls.length) {
      val l = ls(m)
      val r = rs(m)
      val next = new java.util.ArrayList[String](cur.size)
      var k = 0
      val sz = cur.size
      val lr = merged(m) // precomputed: no per-match concat allocation
      while (k < sz) {
        if (k + 1 < sz && cur.get(k) == l && cur.get(k + 1) == r) {
          next.add(lr)
          if (k + 2 < sz) next.add(cur.get(k + 2))
          k += 3
        } else {
          next.add(cur.get(k))
          k += 1
        }
      }
      cur = next
      m += 1
    }
    var cnt = 0
    var k = 0
    while (k < cur.size) {
      if (cur.get(k) != "|") cnt += 1
      k += 1
    }
    cnt
  }

  case class BpeTokenCount(child: Expression,
      merges: Seq[(String, String)]) extends UnaryExpression {
    private lazy val lArr = merges.map(_._1).toArray
    private lazy val rArr = merges.map(_._2).toArray
    private lazy val mArr = merges.map(m => m._1 + m._2).toArray

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count expects a string input, got ${child.dataType.sql}")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bpe_token_count"

    override protected def nullSafeEval(a: Any): Any =
      bpeTokenCount(a.asInstanceOf[UTF8String], lArr, rArr, mArr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lRef = ctx.addReferenceObj("bpeL", lArr, "java.lang.String[]")
      val rRef = ctx.addReferenceObj("bpeR", rArr, "java.lang.String[]")
      val mRef = ctx.addReferenceObj("bpeM", mArr, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.bpeTokenCount(
          $a, $lRef, $rRef, $mRef);
      """)
    }

    override protected def withNewChildInternal(c: Expression): BpeTokenCount =
      copy(child = c)
  }

  def bpeTokenCount(c: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(
      BpeTokenCount(GraftSqlBridge.expression(c), merges))

  /** The t04/t49 stop list, as binary UTF8 constants. */
  private val QualityStopWords: Array[UTF8String] =
    Array("the", "a", "of", "and", "to", "in").map(UTF8String.fromString)

  /** Shared by interpreted eval and generated code: tokenize on the
    * single space byte AND compute the three token statistics the
    * quality heuristic needs — total, distinct (binary string
    * equality, exactly `array_distinct`'s), and stop-list hits
    * (exactly `filter(toks, t => array_contains(stop, t))`'s count) —
    * in ONE walk of the string's bytes. The declarative form
    * materializes `split(text, ' ')` (a regex pass + an array per
    * row) and then walks the array four times, two of them through
    * interpreted higher-order functions outside whole-stage codegen.
    * Tokenization replicates `split(text, ' ')` with Spark's default
    * limit −1: boundaries at every 0x20 byte (a multi-byte UTF-8
    * character never contains one), empty tokens KEPT, including
    * leading/trailing ("" tokenizes to one empty token). Measured at
    * the sf10 rehearsal: the 500k-doc quality pass drops 8.7 → 1.5 s
    * (SCALE.md round 12). */
  def qualityStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val len = b.length
    val seen = new java.util.HashSet[UTF8String](64)
    var n = 0
    var nDistinct = 0
    var nStop = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || b(i) == ' ') {
        val tl = i - start
        n += 1
        val tok = UTF8String.fromBytes(b, start, tl)
        if (seen.add(tok)) nDistinct += 1
        if (tl >= 1 && tl <= 3) {
          var j = 0
          while (j < QualityStopWords.length) {
            if (QualityStopWords(j).equals(tok)) {
              nStop += 1
              j = QualityStopWords.length
            } else j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, nDistinct, nStop))
  }

  /** `struct<n_tok:int, n_distinct:int, n_stop:int>` of a text in one
    * pass — the fused form of `size(toks)`,
    * `size(array_distinct(toks))`, and
    * `size(filter(toks, t => array_contains(stop, t)))` over
    * `toks = split(text, ' ')`, with the split itself fused away. */
  case class QualityStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"quality_stats expects string, got ${other.sql}")
      }
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_tok", IntegerType,
        nullable = false),
      org.apache.spark.sql.types.StructField("n_distinct", IntegerType,
        nullable = false),
      org.apache.spark.sql.types.StructField("n_stop", IntegerType,
        nullable = false)))
    override def prettyName: String = "quality_stats"

    override protected def nullSafeEval(a: Any): Any =
      qualityStats(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.qualityStats($a);
      """)

    override protected def withNewChildInternal(c: Expression): QualityStats =
      copy(child = c)
  }

  def qualityStats(c: Column): Column =
    GraftSqlBridge.column(QualityStats(GraftSqlBridge.expression(c)))
}
