package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernel shared by interpreted eval and generated code (see
  * [[ShingleOps]] for the pattern). */
object SimHashOps {
  def simhash(arr: ArrayData): Long = {
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
    sig
  }
}

/** 64-bit SimHash over an array<long> of token hashes as ONE fused pass:
  * maintains 64 bit-counters in a single loop over the tokens (the
  * composed-builtins form runs 64 separate aggregate() folds, each
  * re-traversing the array). Bit j of the result is set iff more than
  * half the token hashes have bit j set. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(SimHashOps.simhash(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SimHashOps.simhash($c);""")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
  override def prettyName: String = "simhash64"
}
