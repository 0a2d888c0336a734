package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for dense-vector dot products over
  * `array<float>` / `array<double>` columns.
  *
  * Why not `zip_with` + `aggregate`: Spark's higher-order functions
  * allocate a lambda frame per element and fall out of tight codegen —
  * profiled 80 s for the 12.5M-pair near-dup scan at sf0.1. This
  * expression emits a primitive `for` loop over `ArrayData` (no
  * allocation, no boxing) via `doGenCode`, exactly the "custom Expression
  * with codegen beats UDF beats everything else" path from SURVEY §3.
  *
  * Element nulls are not expected in embedding columns (parquet float
  * lists); null top-level inputs propagate null via BinaryExpression's
  * null-safe wrapper.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { s += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { s += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, side: Expression, i: String): String =
        elemType(side) match {
          case FloatType  => s"(double) $arr.getFloat($i)"
          case DoubleType => s"$arr.getDouble($i)"
          case other => throw new IllegalStateException(s"unexpected $other")
        }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left, i)} * ${get(b, right, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** IVF coarse-quantizer primitives (SURVEY §2.G similarity search).
  *
  * The codebook rides as ONE reference object (a flat row-major
  * double[]) instead of k×dim literal nodes: the Column-composed
  * argmax-of-dots variant built ~1k-literal trees that cost more to
  * analyze and codegen than to execute. Assignment is a single fused
  * primitive loop per row, shared by interpreted eval and generated
  * code.
  */
object VectorImpl {

  private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** argmax over dot(v, centroid_c); first max wins ties (same
    * determinism as array_position(dots, array_max(dots))). */
  def nearestCentroid(v: ArrayData, cb: Array[Double], dim: Int,
                      isFloat: Boolean): Int = {
    val k = cb.length / dim
    val n = math.min(dim, v.numElements())
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += elem(v, i, isFloat) * cb(off + i); i += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    best
  }

  /** ADC table sum for a PQ code row; out-of-range codes contribute 0. */
  def pqAdcSum(code: ArrayData, table: Array[Double], ksub: Int): Double = {
    val m = math.min(code.numElements(), table.length / ksub)
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = code.getInt(j)
      if (c >= 0 && c < ksub) s += table(j * ksub + c)
      j += 1
    }
    s
  }

  /** Cell ids of the `nProbe` largest dots, descending; ties broken by
    * lower cell id (deterministic, unlike an unstable comparator sort). */
  def topCentroidsTyped(v: ArrayData, cb: Array[Double], dim: Int,
                        nProbe: Int, isFloat: Boolean): ArrayData = {
    val k = cb.length / dim
    val n = math.min(dim, v.numElements())
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += elem(v, i, isFloat) * cb(off + i); i += 1 }
      dots(c) = s
      c += 1
    }
    val m = math.min(nProbe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < m) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && dots(c) > bestDot) { bestDot = dots(c); best = c }
        c += 1
      }
      if (best < 0) {
        // NaN embedding makes every comparison false; fall back to the
        // first un-taken cell so one bad vector can't crash the query
        // (mirrors nearestCentroid's first-wins default of cell 0)
        c = 0
        while (best < 0 && c < k) { if (!taken(c)) best = c; c += 1 }
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

object LshImpl {

  private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** nTables hyperplane-sign bucket ids in one fused pass. Planes are
    * laid out row-major: table t, plane j, dim i at ((t*nPlanes+j)*dim+i).
    * Bit j of bucket t is set iff dot(v, plane_{t,j}) >= 0 — identical
    * to the composed when(dot >= 0, 1<<j) Column pipeline. */
  def hyperplaneBuckets(v: ArrayData, planes: Array[Double], dim: Int,
                        nPlanes: Int, nTables: Int, isFloat: Boolean): ArrayData = {
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < nPlanes) {
        val off = (t * nPlanes + j) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += elem(v, i, isFloat) * planes(off + i); i += 1 }
        if (s >= 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

trait NumericArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<float|double>, got ${other.simpleString}")
  }
  @transient protected lazy val isFloatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** PQ asymmetric-distance table sum: array<int> code → Σⱼ
  * table[j·ksub + code[j]] — the per-candidate scoring kernel of the
  * ADC probe, which runs once per CODE ROW per query over the whole
  * (billions-row at 100 TB) code lake. The HOF formulation
  * (transform + element_at + aggregate) allocates a lambda frame per
  * subspace per row and falls out of whole-stage codegen — this is a
  * primitive loop with the table as one reference object. Codes
  * outside [0, ksub) contribute 0 (defensive; the encoder can't emit
  * them). */
case class PqAdcSum(child: Expression, table: IndexedSeq[Double], ksub: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<int> PQ code, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_sum"

  @transient private lazy val tbl: Array[Double] = table.toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorImpl.pqAdcSum(input.asInstanceOf[ArrayData], tbl, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTable", tbl, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorImpl.pqAdcSum($c, $ref, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcSum =
    copy(child = newChild)
}

/** IVF cell assignment: array<float|double> → int (0-based codebook
  * index of the max-dot centroid; unit centroids make that cosine-argmax). */
case class NearestCentroid(child: Expression, centroids: IndexedSeq[Double],
                           dim: Int)
  extends UnaryExpression with NumericArrayInput {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val cb: Array[Double] = centroids.toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorImpl.nearestCentroid(input.asInstanceOf[ArrayData], cb, dim, isFloatInput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", cb, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorImpl.nearestCentroid($c, $ref, $dim, $isFloatInput);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Multi-table hyperplane-LSH bucketing: array<float|double> →
  * array<long> of nTables sign-bit bucket ids. The plane matrix rides
  * as one reference object — the composed per-table hyperplaneBucket
  * Columns built ~4k literal nodes for 16×4×64 planes. */
case class HyperplaneBuckets(child: Expression, planes: IndexedSeq[Double],
                             dim: Int, nPlanes: Int, nTables: Int)
  extends UnaryExpression with NumericArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val pl: Array[Double] = planes.toArray

  override protected def nullSafeEval(input: Any): Any =
    LshImpl.hyperplaneBuckets(input.asInstanceOf[ArrayData], pl, dim,
      nPlanes, nTables, isFloatInput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", pl, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LshImpl.hyperplaneBuckets($c, $ref, $dim, $nPlanes, $nTables, $isFloatInput);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** IVF probe cell ranking: array<float|double> → array<int> of the
  * nProbe max-dot cell ids, descending, ties to the lower id. */
case class TopCentroids(child: Expression, centroids: IndexedSeq[Double],
                        dim: Int, nProbe: Int)
  extends UnaryExpression with NumericArrayInput {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_centroids"

  @transient private lazy val cb: Array[Double] = centroids.toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorImpl.topCentroidsTyped(input.asInstanceOf[ArrayData], cb, dim,
      nProbe, isFloatInput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", cb, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorImpl.topCentroidsTyped($c, $ref, $dim, $nProbe, $isFloatInput);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}
