package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the embedding storage
  * path beyond int8: the vector splits into `m` subvectors, each
  * quantized to one of `ks` per-subspace centroids, so a d-dim float32
  * embedding stores as m bytes (d=64, m=8 → 32× smaller) and search
  * scans codes without ever reconstructing floats via a per-query
  * lookup table (ADC — asymmetric distance computation).
  *
  * Both kernels are single tight loops that stay inside whole-stage
  * codegen; vectors are L2-normalized INSIDE the encode kernel so the
  * inner-product ADC score approximates cosine (one fused pass — a
  * composed `transform` normalization would run interpreted).
  */
object PqMath {

  /** Encode one vector: per subspace j, the index of the L2-nearest of
    * the ks centroids in `book` (flattened [m][ks][dsub] row-major),
    * compared against the UNIT-normalized input. Ties keep the lowest
    * index (strict <); a zero vector encodes against its raw zeros
    * (deterministic). Mismatched dims throw — the codebook is built
    * from this column, so that is a caller bug, not data. */
  def pqEncode(v: ArrayData, vF: Boolean, book: ArrayData,
      m: Int, ks: Int): Array[Byte] = {
    val dim = v.numElements()
    val dsub = dim / m
    require(dsub * m == dim && book.numElements() == m * ks * dsub,
      s"pq_encode: dim $dim not m=$m subspaces of ${book.numElements()} book")
    // materialize the normalized vector ONCE: the centroid loop below
    // reads each element ks times, and re-fetching through the ArrayData
    // accessor (plus the re-multiply) per centroid would make the encode
    // scan — the dominant distributed work at corpus scale — do
    // m*ks*dsub accessor ops per row instead of dim
    val nv = new Array[Double](dim)
    var n2 = 0.0
    var i = 0
    while (i < dim) {
      val x = if (vF) v.getFloat(i).toDouble else v.getDouble(i)
      nv(i) = x
      n2 += x * x
      i += 1
    }
    val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
    i = 0
    while (i < dim) { nv(i) *= inv; i += 1 }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var d = 0.0
        var k = 0
        while (k < dsub) {
          val diff = nv(j * dsub + k) - book.getDouble((j * ks + c) * dsub + k)
          d += diff * diff
          k += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** IVF-PQ encode (FAISS IndexIVFPQ layout, Jégou et al. 2011 §IV):
    * unit-normalize the vector, assign its L2-nearest coarse centroid
    * (`cents` flattened [nlist][dim]), then PQ-encode the RESIDUAL
    * nv - centroid against `book` (flattened [m][ks][dsub]) WITHOUT
    * re-normalizing — residual geometry is what the fine codebook was
    * trained on. One fused pass per row: the encode scan is the
    * dominant distributed work, and composing assignment + residual +
    * encode from separate expressions would re-read the vector three
    * times. Returns (cell, m-byte code); ks = book.length / dim. */
  def ivfPqEncode(v: ArrayData, vF: Boolean, cents: ArrayData,
      book: ArrayData, m: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val dim = v.numElements()
    val dsub = dim / m
    require(dsub * m == dim, s"ivfpq_encode: dim $dim not $m subspaces")
    val nlist = cents.numElements() / dim
    require(nlist * dim == cents.numElements(),
      s"ivfpq_encode: centroid block ${cents.numElements()} not [nlist][$dim]")
    val ks = book.numElements() / dim
    require(ks * dim == book.numElements(),
      s"ivfpq_encode: book ${book.numElements()} not [m][ks][$dim/m]")
    val nv = new Array[Double](dim)
    var n2 = 0.0
    var i = 0
    while (i < dim) {
      val x = if (vF) v.getFloat(i).toDouble else v.getDouble(i)
      nv(i) = x; n2 += x * x; i += 1
    }
    val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
    i = 0
    while (i < dim) { nv(i) *= inv; i += 1 }
    // coarse assignment (strict < keeps the lowest index on ties)
    var cell = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < nlist) {
      var d = 0.0; i = 0
      while (i < dim) {
        val diff = nv(i) - cents.getDouble(c * dim + i); d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; cell = c }
      c += 1
    }
    // residual in place
    i = 0
    while (i < dim) { nv(i) -= cents.getDouble(cell * dim + i); i += 1 }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bd = Double.MaxValue
      c = 0
      while (c < ks) {
        var d = 0.0; var k = 0
        while (k < dsub) {
          val diff = nv(j * dsub + k) - book.getDouble((j * ks + c) * dsub + k)
          d += diff * diff; k += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cell, out))
  }

  /** ADC score of one code against a per-query lookup table `lut`
    * (flattened [m][ks]: lut[j*ks+c] = dot(q_subj, centroid_jc)):
    * sum of the table entries the code selects — approximates
    * dot(query, reconstruction), i.e. cosine when both sides are unit
    * vectors. ks is implied by the lengths. */
  def pqAdc(code: Array[Byte], lut: ArrayData): Double = {
    val m = code.length
    val ks = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getDouble(j * ks + (code(j) & 0xff))
      j += 1
    }
    s
  }
}

/** PQ_ENCODE(array<float|double> vec, array<double> flatBook, int m,
  * int ks) → binary (m bytes). See [[PqMath.pqEncode]]. */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BinaryType

  private def vecIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, b: Any, m: Any, ks: Any): Any =
    PqMath.pqEncode(v.asInstanceOf[ArrayData], vecIsFloat,
      b.asInstanceOf[ArrayData], m.asInstanceOf[Int], ks.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, m, ks) =>
      s"graft.functions.PqMath.pqEncode($v, $vecIsFloat, $b, $m, $ks)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): PqEncode =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "pq_encode"
}

/** IVFPQ_ENCODE(array<float|double> vec, array<double> flatCentroids,
  * array<double> flatBook, int m) → struct<cell:int, code:binary>.
  * See [[PqMath.ivfPqEncode]]. */
case class IvfPqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("code", BinaryType, nullable = false)))

  private def vecIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, c: Any, b: Any, m: Any): Any =
    PqMath.ivfPqEncode(v.asInstanceOf[ArrayData], vecIsFloat,
      c.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, b, m) =>
      s"graft.functions.PqMath.ivfPqEncode($v, $vecIsFloat, $c, $b, $m)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): IvfPqEncode =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "ivfpq_encode"
}

/** PQ_ADC(binary code, array<double> flatLut) → double.
  * See [[PqMath.pqAdc]]. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(c: Any, l: Any): Any =
    PqMath.pqAdc(c.asInstanceOf[Array[Byte]], l.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) =>
      s"graft.functions.PqMath.pqAdc($c, $l)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdc = copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}
