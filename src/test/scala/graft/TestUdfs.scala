package graft

import graft.functions.GraftScalarUdf

/** Sample user functions for the CREATE FUNCTION surface (the role the
  * reference's UserDefinedFunctionsIT fixture classes play). */
class TestReverseUdf extends GraftScalarUdf {
  override def eval(args: Seq[Any]): Any =
    Option(args.head).map(_.asInstanceOf[String].reverse).orNull
}

class TestPadLenUdf extends GraftScalarUdf {
  override def eval(args: Seq[Any]): Any = {
    val s = args.head.asInstanceOf[String]
    val pad = args(1).asInstanceOf[Number].longValue()
    s.length + pad
  }
}
