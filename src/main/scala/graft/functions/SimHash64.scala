package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over an array<long> of token hashes as ONE fused pass:
  * maintains 64 bit-counters in a single loop over the tokens (the
  * composed-builtins form runs 64 separate aggregate() folds, each
  * re-traversing the array). Bit j of the result is set iff more than
  * half the token hashes have bit j set. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    var nonNull = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        nonNull += 1
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          counts(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 > nonNull) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
  override def prettyName: String = "simhash64"
}
