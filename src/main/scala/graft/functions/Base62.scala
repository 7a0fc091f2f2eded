package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Base-62 integer codec — Phoenix `ENCODE(n,'BASE62')` / `DECODE(s,'BASE62')`
  * (reference: phoenix-core-client .../expression/function/EncodeFunction.java,
  * util/Base62Encoder.java: alphabet 0-9A-Za-z, '-' prefix for negatives).
  */
object Base62 {
  private val alphabet =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  def encode(n: Long): UTF8String = {
    if (n == 0L) return UTF8String.fromString("0")
    val neg = n < 0
    // negate via unsigned-safe loop domain: math.abs(Long.MinValue) is
    // still negative, which would index the alphabet with v % 62 < 0.
    // Divide as unsigned instead so every Long round-trips.
    var v = if (neg) n else -n // work in negative domain (no overflow)
    val sb = new java.lang.StringBuilder
    while (v != 0) { sb.append(alphabet.charAt((-(v % 62)).toInt)); v /= 62 }
    if (neg) sb.append('-')
    UTF8String.fromString(sb.reverse.toString)
  }

  def decode(s: UTF8String): Long = {
    val str = s.toString
    // "" and "-" have no digits: returning 0 made them indistinguishable
    // from decode("0") — a corrupted key column of empty strings would
    // silently collide on id 0 instead of failing like every other
    // malformed input does
    if (str.isEmpty || str == "-") throw new IllegalArgumentException(
      s"invalid base62 input '$str': no digits")
    val neg = str.charAt(0) == '-'
    // accumulate in the negative domain (|Long.MinValue| > Long.MaxValue,
    // so "-AzL8n0Y58m8" must not pass through +9223372036854775808) with
    // exact arithmetic so past-Long inputs error instead of wrapping
    var v = 0L
    var i = if (neg) 1 else 0
    try {
      while (i < str.length) {
        val d = alphabet.indexOf(str.charAt(i))
        if (d < 0) throw new IllegalArgumentException(
          s"invalid base62 char '${str.charAt(i)}'")
        v = Math.subtractExact(Math.multiplyExact(v, 62L), d.toLong)
        i += 1
      }
      if (neg) v else Math.negateExact(v)
    } catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"base62 value out of Long range: $str")
    }
  }
}

/** ENCODE(bigint, 'BASE62') → varchar. Codegen calls the static codec so the
  * expression stays inside whole-stage codegen. */
case class Base62Encode(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = Base62.encode(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Base62.encode($c)")
  override protected def withNewChildInternal(c: Expression): Base62Encode =
    copy(child = c)
  override def prettyName: String = "base62_encode"
}

/** DECODE(varchar, 'BASE62') → bigint. */
case class Base62Decode(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Base62.decode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Base62.decode($c)")
  override protected def withNewChildInternal(c: Expression): Base62Decode =
    copy(child = c)
  override def prettyName: String = "base62_decode"
}
