package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** COLLATION_KEY(str, locale) → binary sort key for locale-aware ordering
  * (reference: .../expression/function/CollationKeyFunction.java — Phoenix
  * uses ICU; this uses the JDK Collator, same contract: keys compare
  * byte-wise in collation order). */
case class CollationKey(str: Expression, locale: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = str
  override def right: Expression = locale
  override def dataType: DataType = BinaryType

  @transient private var cached: (String, java.text.Collator) = _
  private def collator(tag: String): java.text.Collator = {
    if (cached == null || cached._1 != tag) {
      val c = java.text.Collator.getInstance(
        java.util.Locale.forLanguageTag(tag))
      c.setStrength(java.text.Collator.TERTIARY)
      cached = (tag, c)
    }
    cached._2
  }

  override def nullSafeEval(s: Any, l: Any): Any =
    collator(l.asInstanceOf[UTF8String].toString)
      .getCollationKey(s.asInstanceOf[UTF8String].toString).toByteArray

  override protected def withNewChildrenInternal(
      nl: Expression, nr: Expression): CollationKey =
    copy(str = nl, locale = nr)
  override def prettyName: String = "collation_key"
}

/** JSON_MODIFY(json, '$.key', newValueJson) → json with the top-level key
  * replaced/inserted (reference: .../expression/function/JsonModifyFunction
  * .java; this covers the single-level $.key path — the dominant usage in
  * the reference's tests). The new value is parsed as JSON (so '"str"',
  * '42', '[1,2]' all work). */
case class JsonModify(json: Expression, path: Expression, value: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = json
  override def second: Expression = path
  override def third: Expression = value
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def nullSafeEval(j: Any, p: Any, v: Any): Any = {
    val pathStr = p.asInstanceOf[UTF8String].toString
    if (!pathStr.startsWith("$.") || pathStr.drop(2).contains("."))
      throw new IllegalArgumentException(
        s"JSON_MODIFY supports single-level $$.key paths, got $pathStr")
    val key = pathStr.drop(2)
    try {
      val root = mapper.readTree(j.asInstanceOf[UTF8String].toString)
      root match {
        case obj: com.fasterxml.jackson.databind.node.ObjectNode =>
          obj.set(key, mapper.readTree(v.asInstanceOf[UTF8String].toString))
          UTF8String.fromString(mapper.writeValueAsString(obj))
        case _ => null
      }
    } catch {
      // malformed input JSON → NULL (Phoenix returns null, not an error)
      case _: com.fasterxml.jackson.core.JacksonException => null
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JsonModify =
    copy(json = f, path = s, value = t)
  override def prettyName: String = "json_modify"
}
