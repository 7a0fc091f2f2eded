package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ENCODE_BINARY / DECODE_BINARY — binary ↔ string codecs in the three
  * reference formats (phoenix-core-client
  * .../expression/function/EncodeBinaryFunction.java:79-87,
  * DecodeFunction.java:80-92, EncodeFormat.java):
  *
  *  - HEX:    lowercase hex (HBase Bytes.toHex)
  *  - BASE64: RFC 4648 standard alphabet, padded (java.util.Base64)
  *  - HBASE:  Bytes.toStringBinary escaping — printable ASCII except
  *            backslash kept literal, every other byte as \xHH (uppercase)
  */
object BinaryCodec {
  private val hexLower = "0123456789abcdef".toCharArray
  private val hexUpper = "0123456789ABCDEF".toCharArray

  def encode(bytes: Array[Byte], format: String): UTF8String = {
    val out = format.toUpperCase(java.util.Locale.ROOT) match {
      case "HEX" =>
        val sb = new java.lang.StringBuilder(bytes.length * 2)
        bytes.foreach { b =>
          sb.append(hexLower((b >> 4) & 0xf)); sb.append(hexLower(b & 0xf))
        }
        sb.toString
      case "BASE64" => java.util.Base64.getEncoder.encodeToString(bytes)
      case "HBASE" =>
        val sb = new java.lang.StringBuilder(bytes.length)
        bytes.foreach { b =>
          val ch = b & 0xff
          if (ch >= ' '.toInt && ch <= '~'.toInt && ch != '\\'.toInt)
            sb.append(ch.toChar)
          else {
            sb.append("\\x")
            sb.append(hexUpper(ch >> 4)); sb.append(hexUpper(ch & 0xf))
          }
        }
        sb.toString
      case other =>
        throw new IllegalArgumentException(s"Unsupported Encode Format : $other")
    }
    UTF8String.fromString(out)
  }

  def decode(s: String, format: String): Array[Byte] = format.toUpperCase(java.util.Locale.ROOT) match {
    case "HEX" =>
      require(s.length % 2 == 0, "odd-length hex string")
      val out = new Array[Byte](s.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((hexVal(s.charAt(2 * i)) << 4) |
          hexVal(s.charAt(2 * i + 1))).toByte
        i += 1
      }
      out
    case "BASE64" => java.util.Base64.getDecoder.decode(s)
    case "HBASE" =>
      val out = new java.io.ByteArrayOutputStream(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 3 < s.length && s.charAt(i + 1) == 'x') {
          out.write((hexVal(s.charAt(i + 2)) << 4) | hexVal(s.charAt(i + 3)))
          i += 4
        } else { out.write(c.toInt); i += 1 }
      }
      out.toByteArray
    case other =>
      throw new IllegalArgumentException(s"""Unsupported encoding "$other"""")
  }

  private def hexVal(c: Char): Int = {
    val d = Character.digit(c, 16)
    if (d < 0) throw new IllegalArgumentException(s"invalid hex char '$c'")
    d
  }
}

/** ENCODE_BINARY(varbinary, format) → varchar. */
case class EncodeBinary(bytes: Expression, format: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = bytes
  override def right: Expression = format
  override def dataType: DataType = StringType
  override def nullSafeEval(b: Any, f: Any): Any =
    BinaryCodec.encode(b.asInstanceOf[Array[Byte]],
      f.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): EncodeBinary = copy(bytes = l, format = r)
  override def prettyName: String = "encode_binary"
}

/** DECODE_BINARY(varchar, format) → varbinary. */
case class DecodeBinary(str: Expression, format: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = str
  override def right: Expression = format
  override def dataType: DataType = BinaryType
  override def nullSafeEval(s: Any, f: Any): Any =
    BinaryCodec.decode(s.asInstanceOf[UTF8String].toString,
      f.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DecodeBinary = copy(str = l, format = r)
  override def prettyName: String = "decode_binary"
}
