package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Byte/bit accessors over BINARY columns, reference-faithful to
  * phoenix-core-client .../expression/function/{GetByteFunction,
  * SetByteFunction, GetBitFunction, SetBitFunction}.java and
  * schema/types/PBinaryBase.java: offsets wrap modulo the length
  * ((off % len + len) % len — so -1 is the last byte/bit), bytes read
  * back SIGNED as INTEGER, and bits are LSB-first within each byte.
  * Empty binaries yield NULL (the reference returns the empty pointer).
  */
object BinaryBits {
  private def wrap(off: Int, len: Int): Int = ((off % len) + len) % len

  def getByte(bytes: Array[Byte], off: Int): Int =
    bytes(wrap(off, bytes.length)).toInt

  def setByte(bytes: Array[Byte], off: Int, v: Int): Array[Byte] = {
    val ret = bytes.clone()
    ret(wrap(off, bytes.length)) = v.toByte
    ret
  }

  def getBit(bytes: Array[Byte], off: Int): Int = {
    val o = wrap(off, bytes.length * 8)
    (bytes(o / 8) >> (o % 8)) & 1
  }

  def setBit(bytes: Array[Byte], off: Int, bit: Int): Array[Byte] = {
    val ret = bytes.clone()
    val o = wrap(off, bytes.length * 8)
    val mask = 1 << (o % 8)
    // reference SetBitFunction masks the new value with 0x1, so only the
    // low bit matters: SET_BIT(b, off, 2) clears the bit (2 & 1 == 0)
    ret(o / 8) =
      ((ret(o / 8) & ~mask) | (if ((bit & 1) != 0) mask else 0)).toByte
    ret
  }
}

/** GET_BYTE(binary, offset) → int (signed byte; offset wraps mod len). */
case class GetByteExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // empty binary → NULL
  override def nullSafeEval(b: Any, o: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else BinaryBits.getByte(bytes, o.asInstanceOf[Int])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o) =>
      s"""if ($b.length == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.BinaryBits.getByte($b, $o); }
         |""".stripMargin)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GetByteExpr = copy(left = l, right = r)
  override def prettyName: String = "get_byte"
}

/** GET_BIT(binary, offset) → 0|1 (offset wraps mod len*8, LSB-first). */
case class GetBitExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // empty binary → NULL
  override def nullSafeEval(b: Any, o: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else BinaryBits.getBit(bytes, o.asInstanceOf[Int])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o) =>
      s"""if ($b.length == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.BinaryBits.getBit($b, $o); }
         |""".stripMargin)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GetBitExpr = copy(left = l, right = r)
  override def prettyName: String = "get_bit"
}

/** SET_BYTE(binary, offset, value) → binary with the byte replaced. */
case class SetByteExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // empty binary → NULL
  override def nullSafeEval(b: Any, o: Any, v: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else BinaryBits.setByte(bytes, o.asInstanceOf[Int], v.asInstanceOf[Int])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o, v) =>
      s"""if ($b.length == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.BinaryBits.setByte($b, $o, $v); }
         |""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SetByteExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "set_byte"
}

/** SET_BIT(binary, offset, bit) → binary with the bit set/cleared. */
case class SetBitExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // empty binary → NULL
  override def nullSafeEval(b: Any, o: Any, v: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else BinaryBits.setBit(bytes, o.asInstanceOf[Int], v.asInstanceOf[Int])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o, v) =>
      s"""if ($b.length == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.BinaryBits.setBit($b, $o, $v); }
         |""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SetBitExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "set_bit"
}
