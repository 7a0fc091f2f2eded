package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused embedding-similarity kernel.
  *
  * The composed form — aggregate(zip_with(a,b,*)) for the dot product plus
  * two aggregate(transform(x,sq)) norms — is three higher-order expressions
  * that Spark evaluates INTERPRETED (CodegenFallback): per-element lambda
  * dispatch dominates any >100k-pair similarity stage. This kernel is one
  * tight loop per pair that stays inside whole-stage codegen, and it
  * accumulates each of (dot, |a|², |b|²) in index order — the SAME
  * left-fold the composed form uses — so results are bit-identical (the
  * oracle SQL mirrors that fold, see Pipeline.oracle).
  */
object VectorMath {

  /** Cosine similarity; aF/bF say whether the array's elements are float
    * (true) or double (false) — floats widen per element exactly like the
    * composed form's cast(DoubleType). Mismatched lengths yield NaN (the
    * composed zip_with form yields NULL there; a malformed embedding must
    * not get a plausible score). Null elements are not supported — the
    * embedding columns this serves carry containsNull=false arrays. */
  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dp += x * y; na += x * x; nb += y * y
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Max absolute element value (the int8 quantization scale basis). */
  def maxAbs(v: ArrayData, vF: Boolean): Double = {
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (vF) v.getFloat(i).toDouble else v.getDouble(i))
      if (x > mx) mx = x
      i += 1
    }
    mx
  }

  /** Symmetric int8 quantization: q_i = floor(x_i/scale + 0.5) per
    * element (explicit half-up — engines disagree on round()'s tie
    * rule), packed into signed bytes SATURATED at [-128, 127]: the SQL
    * function takes a caller-supplied scale, and an undersized one (or
    * a stale scale vs a regrown vector) must clip the largest
    * components, not wrap .toByte around to the OPPOSITE sign and
    * silently flip downstream cosines. scale <= 0 → all zeros. */
  def int8Quantize(v: ArrayData, vF: Boolean, scale: Double): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    if (scale > 0) {
      var i = 0
      while (i < n) {
        val x = if (vF) v.getFloat(i).toDouble else v.getDouble(i)
        val q = math.floor(x / scale + 0.5)
        out(i) = (if (q > 127d) 127d else if (q < -128d) -128d else q).toByte
        i += 1
      }
    }
    out
  }

  /** Cosine over two int8 code vectors (the [[int8Quantize]] output):
    * symmetric per-vector quantization scales cancel out of the cosine, so
    * the codes alone carry the angle (within quantization error ≤ ~1/127
    * per element). Pure integer accumulation — dot and norms fit a long
    * for any realistic dim (127² × dim) — with ONE double conversion at
    * the end: the scan reads 4× less data than float32 and the loop is
    * int-ALU only, which is the point of quantized storage at corpus
    * scale. Mismatched lengths → NaN like [[cosine]]; a zero vector → 0. */
  def int8Cosine(a: Array[Byte], b: Array[Byte]): Double = {
    val n = a.length
    if (n != b.length) return Double.NaN
    var dp = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a(i).toInt; val y = b(i).toInt
      dp += x * y; na += x.toLong * x; nb += y.toLong * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dp / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** A vector shorter than `dim` (a truncated/malformed embedding row)
    * must fail LOUDLY like pq_encode does: the unsafe getters read past
    * the array into adjacent row memory otherwise — no exception, just
    * a layout-dependent garbage cell/bucket for that row. The flat
    * block must also tile exactly into rows of `dim`. */
  private def checkDim(fn: String, v: ArrayData, flat: ArrayData,
      dim: Int): Unit = {
    require(v.numElements() == dim,
      s"$fn: vector has ${v.numElements()} elements, dim is $dim")
    require(dim > 0 && flat.numElements() % dim == 0,
      s"$fn: flat block of ${flat.numElements()} not a multiple of dim $dim")
  }

  /** IVF cell assignment: index of the L2-nearest centroid, centroids
    * flattened row-major (nlist = centroids.length / dim). Ties keep the
    * lowest index (strict <). */
  def ivfCell(v: ArrayData, vF: Boolean, cents: ArrayData, dim: Int): Int = {
    checkDim("ivf_cell", v, cents, dim)
    val nlist = cents.numElements() / dim
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < nlist) {
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = if (vF) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = x - cents.getDouble(c * dim + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The TWO nearest cells (soft assignment): multi-probe form of
    * [[ivfCell]] for operators that must not lose pairs straddling a
    * Voronoi boundary (semantic dedup). Same single pass, tracks the
    * runner-up; a 1-cell quantizer returns one element. */
  def ivfCell2(v: ArrayData, vF: Boolean, cents: ArrayData,
      dim: Int): ArrayData = {
    checkDim("ivf_cells", v, cents, dim)
    val nlist = cents.numElements() / dim
    var best = 0; var bestD = Double.MaxValue
    var second = -1; var secondD = Double.MaxValue
    var c = 0
    while (c < nlist) {
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = if (vF) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = x - cents.getDouble(c * dim + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) {
        secondD = bestD; second = best
        bestD = d; best = c
      } else if (d < secondD) { secondD = d; second = c }
      c += 1
    }
    if (second < 0)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(best))
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(best, second))
  }

  /** Sign-LSH bucket id: bit i = sign(v · planes[i]) with the planes
    * flattened row-major into one array (mBits = planes.length / dim).
    * One pass per plane, same dot-product fold order as [[cosine]]. */
  def lshBucket(v: ArrayData, vF: Boolean, planes: ArrayData,
      dim: Int): Long = {
    checkDim("lsh_bucket", v, planes, dim)
    val mBits = planes.numElements() / dim
    var bucket = 0L
    var p = 0
    while (p < mBits) {
      var dp = 0.0
      var i = 0
      while (i < dim) {
        val x = if (vF) v.getFloat(i).toDouble else v.getDouble(i)
        dp += x * planes.getDouble(p * dim + i)
        i += 1
      }
      if (dp >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** COSINE_SIM(array<float|double>, array<float|double>) → double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val lF = isFloat(left)
  @transient private lazy val rF = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosine(a.asInstanceOf[ArrayData], lF,
      b.asInstanceOf[ArrayData], rF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.cosine($a, ${isFloat(left)}, $b, ${isFloat(right)})")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** INT8_COSINE(binary, binary) → double: cosine over int8 code vectors. */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.int8Cosine(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.int8Cosine($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Int8Cosine = copy(left = l, right = r)
  override def prettyName: String = "int8_cosine"
}

/** VEC_MAXABS(vec) → double. */
case class VecMaxAbs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  private def vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(v: Any): Any =
    VectorMath.maxAbs(v.asInstanceOf[ArrayData], vecIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorMath.maxAbs($v, $vecIsFloat)")
  override protected def withNewChildInternal(c: Expression): VecMaxAbs =
    copy(child = c)
  override def prettyName: String = "vec_maxabs"
}

/** INT8_QUANTIZE(vec, scale) → binary (one signed byte per element). */
case class Int8Quantize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(v: Any, s: Any): Any =
    VectorMath.int8Quantize(v.asInstanceOf[ArrayData], vecIsFloat,
      s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s) =>
      s"graft.functions.VectorMath.int8Quantize($v, $vecIsFloat, $s)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Int8Quantize = copy(left = l, right = r)
  override def prettyName: String = "int8_quantize"
}

/** IVF_CELL(vec, flatCentroids, dim) → int (L2-nearest centroid index). */
case class IvfCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = IntegerType

  private def vecIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, c: Any, d: Any): Any =
    VectorMath.ivfCell(v.asInstanceOf[ArrayData], vecIsFloat,
      c.asInstanceOf[ArrayData], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, d) =>
      s"graft.functions.VectorMath.ivfCell($v, $vecIsFloat, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IvfCell =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "ivf_cell"
}

/** IVF_CELLS(vec, flatCentroids, dim) → array<int>, the two nearest
  * cells (soft assignment — see [[VectorMath.ivfCell2]]). */
case class IvfCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def vecIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, c: Any, d: Any): Any =
    VectorMath.ivfCell2(v.asInstanceOf[ArrayData], vecIsFloat,
      c.asInstanceOf[ArrayData], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, d) =>
      s"graft.functions.VectorMath.ivfCell2($v, $vecIsFloat, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IvfCells =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "ivf_cells"
}

/** LSH_BUCKET(vec, flatPlanes, dim) → long (sign-random-projection). */
case class LshBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType

  private def vecIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, p: Any, d: Any): Any =
    VectorMath.lshBucket(v.asInstanceOf[ArrayData], vecIsFloat,
      p.asInstanceOf[ArrayData], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p, d) =>
      s"graft.functions.VectorMath.lshBucket($v, $vecIsFloat, $p, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LshBucket =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "lsh_bucket"
}
