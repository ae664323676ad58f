package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Cosine similarity over two `array<float>` embedding columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * This is the one hot-loop scalar in the similarity/dedup surface (SURVEY §7):
  * the built-in HOF route (`aggregate(zip_with(a, b, …))`) allocates a lambda
  * frame per element and blocks codegen; this expression compiles to a tight
  * primitive `for` loop over the two `ArrayData` buffers — the difference
  * matters on a 100 TB pairwise scan.
  *
  * Lives under `org.apache.spark.sql` because the expression-authoring
  * surface (`AbstractDataType`, `ExpressionUtils`) is `private[sql]`; this is
  * the conventional extension-library bridge, kept to this one file.
  *
  * Semantics: `dot(a,b) / (||a||·||b||)` accumulated in double (float inputs
  * widened per element), `0.0` when either norm is zero, null if either array
  * is null. Mirrors DuckDB's `list_cosine_similarity(CAST(x AS DOUBLE[]), …)`
  * to within 1 ulp — oracle comparisons round to 6 decimals.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"cosine_similarity: array lengths differ (${a.numElements()} vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_similarity: array lengths differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `nTables` sign-LSH bucket ids of an embedding in ONE map-side pass:
  * `array<long>` where element `t` packs the sign bits of hyperplanes
  * `t·bitsPerTable … (t+1)·bitsPerTable−1` (bit `p` set ⟺ dot(embedding,
  * plane) > 0). The planes are [[graft.ops.Similarity.planeComponent]]'s
  * deterministic integer-hash hyperplanes, pre-materialized at plan time and
  * attached as a codegen reference object.
  *
  * Replaces the broadcast-join formulation (explode ×(nTables·bits) rows per
  * vector against a plane relation, then a packing hash aggregate): the
  * aggregate's shuffle was already fine, but the map-side expand re-touched
  * each 64-float embedding 128× with per-row allocation. Here each vector is
  * read once, every dot product runs in a primitive loop, and no aggregate is
  * needed at all — the op becomes a pure projection, which is the right
  * shape for a 100 TB corpus scan.
  *
  * Sign semantics match the join form exactly: `dot > 0` ⟺
  * `cosine > 0` (norms are positive; an all-zero vector yields cosine 0.0
  * there and dot 0.0 here — bit unset either way). Plane components are
  * float-quantized before the double multiply, like the float `plane`
  * column they replace.
  */
case class SignLshBuckets(child: Expression, nTables: Int, bitsPerTable: Int,
                          dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  @transient private lazy val planes: Array[Double] =
    SignLshUtil.planes(nTables * bitsPerTable, dim)

  override def nullSafeEval(input: Any): Any =
    SignLshUtil.buckets(input.asInstanceOf[ArrayData], planes, nTables, bitsPerTable, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SignLshUtil.buckets(" +
        s"$c, $ref, $nTables, $bitsPerTable, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Plane materialization + the per-vector bucket loop behind
  * [[SignLshBuckets]] (called from generated code).
  */
object SignLshUtil {

  /** Flattened `nPlanes × dim` plane matrix; component (j, i) at `j·dim + i`,
    * float-quantized to match the broadcast `array<float>` plane column of
    * the join formulation bit-for-bit.
    */
  def planes(nPlanes: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](nPlanes * dim)
    var j = 0
    while (j < nPlanes) {
      var i = 0
      while (i < dim) {
        out(j * dim + i) = graft.ops.Similarity.planeComponent(j, i).toFloat.toDouble
        i += 1
      }
      j += 1
    }
    out
  }

  def buckets(emb: ArrayData, planes: Array[Double], nTables: Int,
              bitsPerTable: Int, dim: Int): ArrayData = {
    val m = math.min(emb.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < bitsPerTable) {
        val base = (t * bitsPerTable + p) * dim
        var dot = 0.0
        var i = 0
        while (i < m) {
          dot += emb.getFloat(i).toDouble * planes(base + i)
          i += 1
        }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Runtime kernels for the PQ expressions — plain static methods so the
  * generated code is a single call (the [[SignLshUtil]] pattern).
  */
object PqUtil {

  /** Twin of Spark's `round(_, 6)` on DoubleType (BigDecimal.valueOf →
    * HALF_UP — the exact runtime semantics, pinned against DuckDB's `round`
    * by every rounded-cosine catalog row).
    */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-subspace rounded-cosine argmax against `books` (codewords of book
    * `s` at `books(s)`, their code ids at `ids(s)`, both sorted by id).
    * First maximum wins — the lowest code id, the same total order as the
    * `array_position(cosArr, array_max(cosArr))` expression form this
    * kernel replaced (and as the twin's `ORDER BY cos DESC, cluster_id`).
    */
  def encode(emb: ArrayData, books: Array[Array[Array[Float]]],
             ids: Array[Array[Long]]): ArrayData = {
    val m = books.length
    val subDim = books(0)(0).length
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      var best = 0
      var bestCos = Double.NegativeInfinity
      var k = 0
      while (k < book.length) {
        val c = book(k)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < subDim) {
          val x = emb.getFloat(s * subDim + i).toDouble
          val y = c(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val cos = round6(
          if (na == 0.0 || nb == 0.0) 0.0
          else dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)))
        if (cos > bestCos) { bestCos = cos; best = k }
        k += 1
      }
      out(s) = ids(s)(best)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC scores for every query from one corpus vector's codes: resolve each
    * code id to its book position, then per query
    * `round6(Σ_s dot[s] / (qnorm · sqrt(Σ_s n2[s])))` with both sums
    * accumulated in ascending subspace order — the left-fold association the
    * DuckDB twin parenthesizes explicitly.
    */
  def adcScores(codes: ArrayData, ids: Array[Array[Long]],
                dotTabs: Array[Array[Array[Double]]],
                n2Tab: Array[Array[Double]],
                qnorms: Array[Double]): ArrayData = {
    val m = ids.length
    val idx = new Array[Int](m)
    var s = 0
    while (s < m) {
      val id = codes.getLong(s); val arr = ids(s)
      var k = 0
      while (arr(k) != id) k += 1
      idx(s) = k
      s += 1
    }
    val out = new Array[Double](qnorms.length)
    var q = 0
    while (q < qnorms.length) {
      val dots = dotTabs(q)
      var dotSum = 0.0; var n2Sum = 0.0
      var s2 = 0
      while (s2 < m) {
        dotSum += dots(s2)(idx(s2)); n2Sum += n2Tab(s2)(idx(s2))
        s2 += 1
      }
      out(q) =
        if (n2Sum == 0.0) 0.0
        else round6(dotSum / (qnorms(q) * java.lang.Math.sqrt(n2Sum)))
      q += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `array<float>` embedding → `array<long>` of PQ code ids, one per
  * subspace. One expression node replacing an m·k-cosine literal-argmax
  * tree: the expression form was hash-correct but its 256-node plans cost
  * more in analysis + codegen than the whole sf0.1 corpus scan (measured
  * 3.2 s → sub-second for `pq_codes`). Codebooks ride along as a reference
  * object, exactly like [[SignLshBuckets]]' planes.
  */
case class PqEncodeCodes(child: Expression,
                         books: Array[Array[Array[Float]]],
                         ids: Array[Array[Long]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqUtil.encode(input.asInstanceOf[ArrayData], books, ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", books, "float[][][]")
    val i = ctx.addReferenceObj("ids", ids, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.PqUtil.encode($c, $b, $i);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long>` PQ codes → `array<double>` of per-query ADC scores (query
  * order = the `qnorms`/`dotTabs` order the caller fixed). The lookup
  * tables are reference objects; the per-row work is m array indexings per
  * query — no embedding arithmetic.
  */
case class PqAdcScores(child: Expression,
                       ids: Array[Array[Long]],
                       dotTabs: Array[Array[Array[Double]]],
                       n2Tab: Array[Array[Double]],
                       qnorms: Array[Double])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_scores"

  override def nullSafeEval(input: Any): Any =
    PqUtil.adcScores(input.asInstanceOf[ArrayData], ids, dotTabs, n2Tab, qnorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.addReferenceObj("ids", ids, "long[][]")
    val d = ctx.addReferenceObj("dotTabs", dotTabs, "double[][][]")
    val n = ctx.addReferenceObj("n2Tab", n2Tab, "double[][]")
    val q = ctx.addReferenceObj("qnorms", qnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.PqUtil.adcScores($c, $i, $d, $n, $q);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}


/** Nearest-centroid assignment against a plan-time centroid table as ONE
  * codegen'd primitive loop: returns struct(cluster_id, cos_sim) — the
  * max-ROUNDED-cosine centroid (6 decimals, the engine-portability grain),
  * ties → the lowest cluster id. Replaces the composed
  * array(cos₁…cos_k) / array_max / array_position argmax, whose three
  * array references re-evaluate k 64-lane cosines up to 3× per row and
  * allocate two arrays per row (measured: the IVF assignment stage at
  * sf0.1 ≈ 0.44 s composed vs ≈ 0.19 s here — and at 100 TB this is the
  * per-scan inner loop of every IVF/k-means pass). The centroid matrix
  * rides as a codegen reference object (the [[SignLshBuckets]] pattern);
  * ids map the argmax index back to surviving cluster ids.
  *
  * Value parity is EXACT: per-row ‖x‖² accumulates once in ascending-lane
  * order (identical to [[CosineSimilarity]]'s loop), per-centroid norms
  * are precomputed with the same loop (same doubles), and rounding uses
  * the same java.math.BigDecimal HALF_UP path as Catalyst's round(_, 6) —
  * [[graft.GraftExpressionsSpec]] pins equivalence against the composed
  * form on random vectors including ties and negatives.
  */
case class NearestCentroid(child: Expression, ids: Array[Long],
                           cents: Array[Array[Float]])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(ids.length == cents.length && ids.nonEmpty,
    s"NearestCentroid: ${ids.length} ids for ${cents.length} centroids")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("cluster_id", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val flat: Array[Double] =
    NearestCentroidUtil.flatten(cents)
  @transient private lazy val norms: Array[Double] =
    NearestCentroidUtil.norms(cents)

  override def nullSafeEval(input: Any): Any =
    NearestCentroidUtil.assign(input.asInstanceOf[ArrayData], ids, flat, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    val flatRef = ctx.addReferenceObj("cents", flat, "double[]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.NearestCentroidUtil.assign(" +
        s"$c, $idsRef, $flatRef, $normsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Flattening + the per-row assignment loop behind [[NearestCentroid]]
  * (called from generated code).
  */
object NearestCentroidUtil {

  def flatten(cents: Array[Array[Float]]): Array[Double] = {
    val dim = cents(0).length
    val out = new Array[Double](cents.length * dim)
    var j = 0
    while (j < cents.length) {
      var i = 0
      while (i < dim) { out(j * dim + i) = cents(j)(i).toDouble; i += 1 }
      j += 1
    }
    out
  }

  /** Per-centroid squared norms, ascending-lane accumulation (the
    * [[CosineSimilarity]] loop order, so sqrt sees the identical double).
    */
  def norms(cents: Array[Array[Float]]): Array[Double] =
    cents.map { c =>
      var nb = 0.0; var i = 0
      while (i < c.length) { val y = c(i).toDouble; nb += y * y; i += 1 }
      nb
    }

  /** Catalyst round(_, 6) twin: the BigDecimal.valueOf HALF_UP path. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def assign(a: ArrayData, ids: Array[Long], flat: Array[Double],
             norms: Array[Double]): InternalRow = {
    val dim = a.numElements()
    // flat is |ids| centroids × centroid-dim; a dim-mismatched input would
    // silently stride into the wrong lanes and return a garbage assignment
    if (dim * ids.length != flat.length)
      throw new IllegalArgumentException(
        s"nearest_centroid: input dimension $dim != centroid dimension " +
        s"${flat.length / ids.length}")
    var na = 0.0
    var i = 0
    while (i < dim) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    var best = 0
    var bestCos = java.lang.Double.NEGATIVE_INFINITY
    var j = 0
    while (j < ids.length) {
      var dot = 0.0
      var p = j * dim
      i = 0
      while (i < dim) {
        dot += a.getFloat(i).toDouble * flat(p); i += 1; p += 1
      }
      val nb = norms(j)
      val cos = if (na == 0.0 || nb == 0.0) 0.0
                else dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
      val r = round6(cos)
      if (r > bestCos) { bestCos = r; best = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](ids(best), bestCos))
  }
}


/** The whole SQ8 scoring pipeline — L2-normalize → micro-unit grid → 8-bit
  * code against the trained [min,max] ladder → decode ×255 → integer dot
  * against each pre-decoded query — as ONE codegen'd primitive loop
  * returning the per-query rounded approx-cosine array. The composed HOF
  * form (transform/aggregate/zip_with) is CodegenFallback in Spark: a
  * lambda frame per ELEMENT per row (measured ≈0.5 s interpreted on the
  * sf0.1 corpus stage vs ≈0.08 s here); at 100 TB this is the per-scan
  * inner loop of the quantized serving path. Ladder and query decodes ride
  * as codegen reference objects (the [[SignLshBuckets]] pattern).
  *
  * Value parity with the HOF form is EXACT and spec-pinned
  * ([[graft.GraftExpressionsSpec]]): norm accumulates in ascending-lane
  * order; micro-rounding goes through the same BigDecimal HALF_UP path as
  * Catalyst round(_, 0) (negative components round away from zero — a
  * Math.round replica would be wrong there); clamp/code/decode are pure
  * BIGINT with the one floor-of-double division the Scaladoc of
  * [[graft.ops.Similarity]]'s sq8Dec255 derives; the dot folds ascending
  * in long; the final double chain divides by 65025 then 10¹² then rounds
  * 6 — identical association everywhere.
  */
case class Sq8Scores(child: Expression, mins: Array[Long], maxs: Array[Long],
                     qdecs: Array[Array[Long]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_scores"

  override def nullSafeEval(input: Any): Any =
    Sq8Util.scores(input.asInstanceOf[ArrayData], mins, maxs, qdecs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("mins", mins, "long[]")
    val mx = ctx.addReferenceObj("maxs", maxs, "long[]")
    val qd = ctx.addReferenceObj("qdecs", qdecs, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.Sq8Util.scores($c, $mn, $mx, $qd);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decode-only variant: the SQ8 dec255 codes of one vector as
  * `array<long>` — the plan-build face (query-side decode collect) of the
  * same arithmetic [[Sq8Scores]] runs per corpus row.
  */
case class Sq8Decode(child: Expression, mins: Array[Long], maxs: Array[Long])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sq8_decode"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Sq8Util.decode(input.asInstanceOf[ArrayData], mins, maxs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("mins", mins, "long[]")
    val mx = ctx.addReferenceObj("maxs", maxs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(org.apache.spark.sql.graft.Sq8Util.decode($c, $mn, $mx));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The SQ8 loops behind [[Sq8Scores]]/[[Sq8Decode]] (called from generated
  * code).
  */
object Sq8Util {

  /** Catalyst round(_, 0) twin on doubles (HALF_UP away from zero). */
  private def round0(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def decode(a: ArrayData, mins: Array[Long], maxs: Array[Long]): Array[Long] = {
    val dim = a.numElements()
    // the ladder is per-dimension; a dim-mismatched input would index past
    // the ladder (AIOOBE) or silently mis-score against a truncated ladder
    if (dim != mins.length)
      throw new IllegalArgumentException(
        s"sq8: input dimension $dim != trained ladder dimension ${mins.length}")
    var na = 0.0
    var i = 0
    while (i < dim) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    val norm = java.lang.Math.sqrt(na)
    val out = new Array[Long](dim)
    i = 0
    while (i < dim) {
      val micro = if (norm == 0.0) 0L
                  else round0(a.getFloat(i).toDouble / norm * 1e6)
      val mn = mins(i); val mx = maxs(i)
      val xc = if (micro < mn) mn else if (micro > mx) mx else micro
      val code = if (mx == mn) 0L
                 else java.lang.Math.floor(((xc - mn) * 255L).toDouble
                                             / (mx - mn).toDouble).toLong
      out(i) = mn * 255L + code * (mx - mn)
      i += 1
    }
    out
  }

  def scores(a: ArrayData, mins: Array[Long], maxs: Array[Long],
             qdecs: Array[Array[Long]]): ArrayData = {
    val dec = decode(a, mins, maxs)
    val out = new Array[Double](qdecs.length)
    var q = 0
    while (q < qdecs.length) {
      val qd = qdecs(q)
      if (qd.length != dec.length)
        throw new IllegalArgumentException(
          s"sq8_scores: query $q decode dimension ${qd.length} != corpus " +
          s"dimension ${dec.length}")
      var dot = 0L
      var i = 0
      while (i < dec.length) { dot += qd(i) * dec(i); i += 1 }
      out(q) = NearestCentroidUtil.round6(dot.toDouble / 65025.0 / 1e12)
      q += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object VectorExpressions {
  /** Column API for [[CosineSimilarity]]. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[NearestCentroid]]. */
  def nearestCentroid(embedding: Column, ids: Array[Long],
                      cents: Array[Array[Float]]): Column =
    ExpressionUtils.column(
      NearestCentroid(ExpressionUtils.expression(embedding), ids, cents))

  /** Column API for [[Sq8Scores]]. */
  def sq8Scores(embedding: Column, mins: Array[Long], maxs: Array[Long],
                qdecs: Array[Array[Long]]): Column =
    ExpressionUtils.column(
      Sq8Scores(ExpressionUtils.expression(embedding), mins, maxs, qdecs))

  /** Column API for [[Sq8Decode]]. */
  def sq8Decode(embedding: Column, mins: Array[Long],
                maxs: Array[Long]): Column =
    ExpressionUtils.column(
      Sq8Decode(ExpressionUtils.expression(embedding), mins, maxs))

  /** Column API for [[SignLshBuckets]]. */
  def signLshBuckets(embedding: Column, nTables: Int, bitsPerTable: Int,
                     dim: Int): Column =
    ExpressionUtils.column(
      SignLshBuckets(ExpressionUtils.expression(embedding), nTables, bitsPerTable, dim))

  /** Column API for [[PqEncodeCodes]]. */
  def pqEncodeCodes(embedding: Column, books: Array[Array[Array[Float]]],
                    ids: Array[Array[Long]]): Column =
    ExpressionUtils.column(
      PqEncodeCodes(ExpressionUtils.expression(embedding), books, ids))

  /** Column API for [[PqAdcScores]]. */
  def pqAdcScores(codes: Column, ids: Array[Array[Long]],
                  dotTabs: Array[Array[Array[Double]]],
                  n2Tab: Array[Array[Double]], qnorms: Array[Double]): Column =
    ExpressionUtils.column(
      PqAdcScores(ExpressionUtils.expression(codes), ids, dotTabs, n2Tab, qnorms))

  /** Register `cosine_similarity(a, b)` as a SQL function on a live session
    * (for new sessions, prefer `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
}
