package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

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

object VectorExpressions {
  /** Column API for [[CosineSimilarity]]. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[SignLshBuckets]]. */
  def signLshBuckets(embedding: Column, nTables: Int, bitsPerTable: Int,
                     dim: Int): Column =
    ExpressionUtils.column(
      SignLshBuckets(ExpressionUtils.expression(embedding), nTables, bitsPerTable, dim))

  /** Register `cosine_similarity(a, b)` as a SQL function on a live session
    * (for new sessions, prefer `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
}
