package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused vector arithmetic as native codegen'd Catalyst expressions.
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * is correct but allocates an intermediate array per pair and walks
  * three higher-order loops; on an all-pairs cosine join that is THE
  * hot path (s04 spent 31 s of a 77 s bench on it). These expressions
  * generate a single fused loop with no allocation, keeping the whole
  * stage inside codegen.
  *
  * Numeric contract: identical to the declarative form — elements are
  * widened float→double (exact), then multiplied/accumulated
  * SEQUENTIALLY in array order, so results are bitwise-equal to both
  * the HOF version and the DuckDB `list_reduce` oracle folds.
  */
object VectorExprs {

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  private def elemAsDouble(arr: String, dt: DataType, i: String): String =
    dt match {
      case ArrayType(FloatType, _) => s"(double)$arr.getFloat($i)"
      case _                       => s"$arr.getDouble($i)"
    }

  private def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case _                       => (a, i) => a.getDouble(i)
  }

  /** dot(a, b) = Σ aᵢ·bᵢ — sequential, fused, allocation-free. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(left.dataType) && isVec(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double> inputs, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (gx, gy) = (getter(left.dataType), getter(right.dataType))
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += gx(x, i) * gy(y, i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ${elemAsDouble(a, left.dataType, i)} *
              ${elemAsDouble(b, right.dataType, i)};
          }
          ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDot =
      copy(left = newLeft, right = newRight)
  }

  /** norm2(a) = √(Σ aᵢ²) — same fused-loop contract. */
  case class VecNorm(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_norm expects an array<float|double> input, got " +
          child.dataType.sql)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val gx = getter(child.dataType)
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { val v = gx(x, i); acc += v * v; i += 1 }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $v = ${elemAsDouble(a, child.dataType, i)};
            $acc += $v * $v;
          }
          ${ev.value} = java.lang.Math.sqrt($acc);
        """
      })

    override protected def withNewChildInternal(c: Expression): VecNorm =
      copy(child = c)
  }

  /** normsq(a) = Σ aᵢ² — the no-sqrt twin of [[VecNorm]]; target of the
    * [[FuseSelfDot]] optimizer rewrite (bitwise-identical to
    * `VecDot(a, a)`: same sequential multiply-accumulate). */
  case class VecNormSq(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_normsq expects an array<float|double> input, got " +
          child.dataType.sql)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_normsq"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val gx = getter(child.dataType)
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { val v = gx(x, i); acc += v * v; i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $v = ${elemAsDouble(a, child.dataType, i)};
            $acc += $v * $v;
          }
          ${ev.value} = $acc;
        """
      })

    override protected def withNewChildInternal(c: Expression): VecNormSq =
      copy(child = c)
  }

  /** All random-hyperplane LSH signatures of a vector in ONE pass:
    * `nTables` ints, bit `b` of table `t` = sign(x · plane[t·nBits+b]).
    * The declarative form — nTables × nBits separate dot expressions
    * union'd over as many scans — re-reads the vector 96 times; this
    * reads it once per plane with the planes in a flat static array
    * (JIT keeps them in cache), and the per-plane loop is the same
    * sequential float→double multiply-accumulate as [[VecDot]], so the
    * sign decisions are bitwise-identical to the unfused version. */
  def hyperplaneSigsEval(x: ArrayData, flat: Array[Double], nTables: Int,
      nBits: Int, floatElems: Boolean): ArrayData = {
    val dimP = flat.length / (nTables * nBits)
    val sigs = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0
      var b = 0
      while (b < nBits) {
        val base = (t * nBits + b) * dimP
        val n = math.min(x.numElements(), dimP)
        var acc = 0.0
        var i = 0
        if (floatElems)
          while (i < n) { acc += x.getFloat(i).toDouble * flat(base + i); i += 1 }
        else
          while (i < n) { acc += x.getDouble(i) * flat(base + i); i += 1 }
        if (acc >= 0) sig |= 1 << b
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  /** Flat-array plane field for the same O(1) tree-compare reason as
    * [[NearestCell]]. */
  case class HyperplaneSigs(child: Expression, flat: Array[Double],
      nTables: Int, nBits: Int) extends UnaryExpression {
    require(nTables > 0 && nBits > 0 && flat.length % (nTables * nBits) == 0,
      "hyperplane_sigs: flat planes must be nTables*nBits*dim")
    private def floatElems = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sigs expects array<float|double>, got " +
          child.dataType.sql)
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def prettyName: String = "hyperplane_sigs"

    override protected def nullSafeEval(a: Any): Any =
      hyperplaneSigsEval(a.asInstanceOf[ArrayData], flat, nTables, nBits,
        floatElems)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val flatRef = ctx.addReferenceObj("planesFlat", flat, "double[]")
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.VectorExprs$$.MODULE$$
          .hyperplaneSigsEval($a, $flatRef, $nTables, $nBits, $floatElems);
      """)
    }

    override protected def withNewChildInternal(c: Expression): HyperplaneSigs =
      copy(child = c)
  }

  /** Shared inner loop of [[NearestCell]]: argmin over `k` centroids
    * (flattened row-major into `flat`, cid = row index) of the
    * sequential Σ(vᵢ−cᵢ)² distance — element order and the strict-<
    * comparison (ties keep the LOWEST cid) exactly mirror the
    * `aggregate`-fold form this replaces, so results are bitwise
    * unchanged. */
  def nearestCellEval(a: ArrayData, flat: Array[Double], k: Int,
      dim: Int, floatElems: Boolean)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    var bestD = Double.MaxValue
    var bestC = -1
    // a length mismatch null-pads the declarative zip_with on either
    // side, making EVERY candidate's distance null — the fold keeps
    // its init (MaxValue, -1); mirror that exactly
    if (n == dim) {
      // hoist the vector out of ArrayData ONCE: the cell loop below
      // reads it k times, and per-element getFloat/getDouble virtual
      // dispatch × k × dim dominated the k = 1024 rehearsal profile —
      // a primitive local keeps the hot loop pure double[] arithmetic
      val v = new Array[Double](dim)
      var j = 0
      while (j < dim) {
        v(j) = if (floatElems) a.getFloat(j).toDouble else a.getDouble(j)
        j += 1
      }
      var c = 0
      while (c < k) {
        val base = c * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val diff = v(i) - flat(base + i)
          acc += diff * diff
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestC = c }
        c += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  /** Nearest-centroid argmin as ONE codegen'd expression —
    * `struct(d2, cid)` against a literal codebook. The declarative
    * twin (`aggregate` over an array-of-structs literal with a
    * `zip_with` distance per candidate) evaluates interpreted
    * higher-order lambdas per row — measured as the dominant cost of
    * the IVF/PQ encode path (s08–s11). cid is the centroid's index:
    * callers guarantee cids are 0..k-1 in order. */
  /** Model values live in the expression as a FLAT PRIMITIVE ARRAY,
    * not a Seq[Seq[Double]]: case-class equality/hashCode on an Array
    * is by reference, so Catalyst's per-rule tree compares stay O(1)
    * instead of walking k×dim boxed doubles — at k = 1024 the
    * Seq-valued field made the DRIVER the k-means training bottleneck
    * (every optimizer pass re-hashed a 65k-element structure; the
    * 500k rehearsal ran one core busy). Reference equality is
    * conservative: separately built identical models no longer
    * dedupe, which costs nothing here (models are built once per
    * session by the memoized trainers). */
  case class NearestCell(child: Expression, flat: Array[Double],
      k: Int, dim: Int)
      extends UnaryExpression {
    require(k > 0 && dim > 0 && flat.length == k * dim,
      s"nearest_cell: flat model must be k*dim (${flat.length} vs $k*$dim)")
    private def floatElems = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nearest_cell expects array<float|double>, got " +
          child.dataType.sql)
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("d2", DoubleType,
          nullable = false),
        org.apache.spark.sql.types.StructField("cid", IntegerType,
          nullable = false)))
    override def prettyName: String = "nearest_cell"

    override protected def nullSafeEval(a: Any): Any =
      nearestCellEval(a.asInstanceOf[ArrayData], flat, k, dim, floatElems)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.VectorExprs$$.MODULE$$
          .nearestCellEval($a, $flatRef, $k, $dim, $floatElems);
      """)
    }

    override protected def withNewChildInternal(c: Expression): NearestCell =
      copy(child = c)
  }

  /** Shared inner loop of [[PqEncode]]: L2-normalize the raw vector
    * (same sequential norm as [[VecNorm]]; zero vectors map to 0.0
    * elements), then per subspace mi pick the nearest of `k` codebook
    * rows (flattened m·k·sub row-major) with the [[nearestCellEval]]
    * comparison contract. A vector too short for a subspace yields
    * code -1 — the fold twin's null-distance behavior. */
  def pqEncodeEval(a: ArrayData, flat: Array[Double], m: Int, k: Int,
      sub: Int, floatElems: Boolean): ArrayData = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = if (floatElems) a.getFloat(i).toDouble else a.getDouble(i)
      acc += v * v
      i += 1
    }
    val nrm = math.sqrt(acc)
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      if ((mi + 1) * sub > n) codes(mi) = -1
      else {
        val off = mi * sub
        var bestD = Double.MaxValue
        var bestC = -1
        var c = 0
        while (c < k) {
          val base = (mi * k + c) * sub
          var d = 0.0
          var j = 0
          while (j < sub) {
            val e =
              if (floatElems) a.getFloat(off + j).toDouble
              else a.getDouble(off + j)
            val v = if (nrm > 0) e / nrm else 0.0
            val diff = v - flat(base + j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; bestC = c }
          c += 1
        }
        codes(mi) = bestC
      }
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** Full PQ encode — m nearest-subcentroid codes from ONE fused pass
    * over the embedding — as a single codegen'd expression. Replaces
    * `transform(sequence(0, m-1), mi => nearestIn(element_at(books,
    * mi+1), subVec(mi)))`: that form re-derives the norm and walks
    * interpreted lambdas per subspace per row. Normalization, element
    * order, and tie-breaks mirror the declarative twin bit for bit. */
  /** Flat-array model field for the same O(1) tree-compare reason as
    * [[NearestCell]]. */
  case class PqEncode(child: Expression, flat: Array[Double],
      m: Int, k: Int, sub: Int)
      extends UnaryExpression {
    require(m > 0 && k > 0 && sub > 0 && flat.length == m * k * sub,
      s"pq_encode: flat books must be m*k*sub (${flat.length})")
    private def floatElems = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<float|double>, got ${child.dataType.sql}")
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    override protected def nullSafeEval(a: Any): Any =
      pqEncodeEval(a.asInstanceOf[ArrayData], flat, m, k, sub, floatElems)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val flatRef = ctx.addReferenceObj("booksFlat", flat, "double[]")
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.VectorExprs$$.MODULE$$
          .pqEncodeEval($a, $flatRef, $m, $k, $sub, $floatElems);
      """)
    }

    override protected def withNewChildInternal(c: Expression): PqEncode =
      copy(child = c)
  }

  // ---- Column API ----

  def nearestCell(v: Column, centroids: Seq[Seq[Double]]): Column = {
    require(centroids.nonEmpty &&
      centroids.forall(_.length == centroids.head.length),
      "nearest_cell: centroids must be non-empty and rectangular")
    GraftSqlBridge.column(NearestCell(GraftSqlBridge.expression(v),
      centroids.flatten.toArray, centroids.length, centroids.head.length))
  }

  def pqEncode(emb: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    require(books.nonEmpty && books.forall(_.length == books.head.length) &&
      books.forall(_.forall(_.length == books.head.head.length)),
      "pq_encode: books must be non-empty and rectangular (m × k × sub)")
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(emb),
      books.flatten.flatten.toArray, books.length, books.head.length,
      books.head.head.length))
  }

  def hyperplaneSigs(a: Column, planes: Seq[Seq[Double]], nBits: Int)
      : Column = {
    require(planes.nonEmpty && planes.length % nBits == 0,
      "hyperplane_sigs: planes must be a multiple of nBits")
    GraftSqlBridge.column(HyperplaneSigs(GraftSqlBridge.expression(a),
      planes.flatten.toArray, planes.length / nBits, nBits))
  }

  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vecNorm(a: Column): Column =
    GraftSqlBridge.column(VecNorm(GraftSqlBridge.expression(a)))

  /** Asymmetric-distance (ADC) score: Σᵢ lut[i][codes[i]] — the PQ
    * scoring inner loop shared by s10/s11/s16, fused. The
    * declarative form — `aggregate(zip_with(codes, lut, (c, row) =>
    * get(row, c)), 0.0, _ + _)` — allocates a zipped
    * array-of-arrays per corpus row before folding; this is the
    * direct m-step loop (sequential adds in index order, so the
    * value is bitwise-identical to the left fold it replaces). */
  case class AdcScore(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _),
              ArrayType(ArrayType(DoubleType, _), _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"adc_score expects (array<int>, array<array<double>>), " +
            s"got ${l.sql} / ${r.sql}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "adc_score"
    // NULL even on non-null inputs: a null element, a null LUT row,
    // a code outside its LUT row, or a codes/LUT length mismatch
    // yields NULL (matching the declarative zip_with+get twin, which
    // null-pads the shorter side) — adc_score is SQL-registered, so
    // inputs are user-controlled and an unchecked UnsafeArrayData
    // read would be a raw memory access.
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      val lut = b.asInstanceOf[ArrayData]
      val m = codes.numElements()
      // length mismatch is NULL too: the declarative zip_with twin
      // pads the shorter array with nulls, and a null-padded fold is
      // NULL — min-length summation would silently drop subspaces
      if (lut.numElements() != m) return null
      var acc = 0.0
      var i = 0
      while (i < m) {
        if (codes.isNullAt(i) || lut.isNullAt(i)) return null
        val row = lut.getArray(i)
        val c = codes.getInt(i)
        if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
        acc += row.getDouble(c)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val m = ctx.freshName("m")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        val row = ctx.freshName("row")
        val acc = ctx.freshName("acc")
        s"""
          int $m = $a.numElements();
          double $acc = 0.0;
          if ($b.numElements() != $m) { ${ev.isNull} = true; }
          for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($i);
            int $c = $a.getInt($i);
            if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
              ${ev.isNull} = true; break;
            }
            $acc += $row.getDouble($c);
          }
          ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcScore =
      copy(left = newLeft, right = newRight)
  }

  def adcScore(codes: Column, lut: Column): Column =
    GraftSqlBridge.column(AdcScore(
      GraftSqlBridge.expression(codes), GraftSqlBridge.expression(lut)))

  /** Register `vec_dot` / `vec_norm` as SQL functions on a session
    * (the imperative twin of [[GraftExtensions]] for sessions built
    * without `spark.sql.extensions`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      (es: Seq[Expression]) => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      (es: Seq[Expression]) => VecNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("zvalue",
      (es: Seq[Expression]) => ZOrderExprs.ZValue(es(0), es(1)),
      "built-in")
    reg.createOrReplaceTempFunction("adc_score",
      (es: Seq[Expression]) => AdcScore(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("top_token_freq",
      (es: Seq[Expression]) => TextExprs.TopTokenFreq(es.head), "built-in")
    reg.createOrReplaceTempFunction("ngram_hashes", ngramHashesBuilder,
      "built-in")
  }

  /** `ngram_hashes(toks, n, distinct)` — n and distinct must be
    * foldable literals (they parameterize the kernel, not the data).
    * Wrong-typed or NULL parameters get a clean analysis-time error,
    * not a raw cast/NPE from the eval. */
  private[functions] val ngramHashesBuilder: Seq[Expression] => Expression =
    (es: Seq[Expression]) => {
      require(es.length == 3 && es(1).foldable && es(2).foldable,
        "ngram_hashes(tokens, n, distinct) needs literal n/distinct")
      val n = es(1).eval() match {
        case i: java.lang.Number => i.intValue
        case other => throw new IllegalArgumentException(
          s"ngram_hashes: n must be a non-null integer literal, got $other")
      }
      val distinct = es(2).eval() match {
        case b: java.lang.Boolean => b.booleanValue
        case other => throw new IllegalArgumentException(
          s"ngram_hashes: distinct must be a non-null boolean literal, " +
            s"got $other")
      }
      TextExprs.NgramHashes(es(0), n, distinct)
    }
}

/** Custom optimizer rule: `vec_dot(x, x)` ⇒ `vec_normsq(x)` — halves
  * the element reads of a self-dot-product (one array traversal
  * instead of zip-of-two). Safe: identical sequential
  * multiply-accumulate, so results are bitwise unchanged. */
object FuseSelfDot
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorExprs.VecDot(a, b) if a.semanticEquals(b) =>
        VectorExprs.VecNormSq(a)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` exposes the
  * vector expressions (and the self-dot fusion rule) to any session —
  * pure-SQL users included. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorExprs.VecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => VectorExprs.VecDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VectorExprs.VecNorm].getName, "vec_norm"),
      (es: Seq[Expression]) => VectorExprs.VecNorm(es.head)))
    ext.injectFunction((
      FunctionIdentifier("zvalue"),
      new ExpressionInfo(
        classOf[ZOrderExprs.ZValue].getName, "zvalue"),
      (es: Seq[Expression]) => ZOrderExprs.ZValue(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("adc_score"),
      new ExpressionInfo(classOf[VectorExprs.AdcScore].getName, "adc_score"),
      (es: Seq[Expression]) => VectorExprs.AdcScore(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("top_token_freq"),
      new ExpressionInfo(
        classOf[TextExprs.TopTokenFreq].getName, "top_token_freq"),
      (es: Seq[Expression]) => TextExprs.TopTokenFreq(es.head)))
    ext.injectFunction((
      FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(
        classOf[TextExprs.NgramHashes].getName, "ngram_hashes"),
      VectorExprs.ngramHashesBuilder))
    ext.injectOptimizerRule(_ => FuseSelfDot)
  }
}
