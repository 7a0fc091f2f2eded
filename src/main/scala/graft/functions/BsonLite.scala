package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal BSON codec for the reference's BSON function family (decision
  * recorded in COVERAGE.md: implement the core BSON_VALUE path rather than
  * declare the family out of scope). Wire format follows bsonspec.org
  * (the subset the reference's Bson ITs exercise): double 0x01, string
  * 0x02, document 0x03, array 0x04, binary 0x05 (generic subtype; the
  * extended-JSON {"$binary": {"base64": ...}} spelling encodes to it),
  * boolean 0x08, UTC datetime 0x09, null 0x0A, int32 0x10, int64 0x12.
  * Values decode into jackson nodes so the navigation/serialization
  * logic is shared with the JSON family.
  *
  * Reference: phoenix-core-client .../expression/function/
  * BsonValueFunction.java:57 (dot + [n] field-key navigation, typed
  * return), util/bson/CommonComparisonExpressionUtils.java.
  */
object BsonLite {
  private val F = JsonNodeFactory.instance

  def encode(node: JsonNode): Array[Byte] = {
    require(node.isObject, "BSON document root must be an object")
    encodeDoc(node)
  }

  private def encodeDoc(node: JsonNode): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val names: Iterator[String] =
      if (node.isArray) Iterator.range(0, node.size()).map(_.toString)
      else node.fieldNames().asScala
    names.foreach { name =>
      val v = if (node.isArray) node.get(name.toInt) else node.get(name)
      val cname = name.getBytes(StandardCharsets.UTF_8)
      def header(t: Int): Unit = {
        body.write(t); body.write(cname, 0, cname.length); body.write(0)
      }
      v match {
        case _ if v.isTextual =>
          header(0x02)
          val b = v.textValue().getBytes(StandardCharsets.UTF_8)
          body.write(le32(b.length + 1)); body.write(b, 0, b.length)
          body.write(0)
        case _ if v.isInt => header(0x10); body.write(le32(v.intValue()))
        case _ if v.isLong =>
          header(0x12); body.write(le64(v.longValue()))
        case _ if v.isBigInteger =>
          // beyond int64 range longValue() would silently wrap — widen to
          // double (lossy but ordered) instead of corrupting the value
          val bi = v.bigIntegerValue()
          if (bi.bitLength() < 64) { header(0x12); body.write(le64(bi.longValue())) }
          else { header(0x01)
            body.write(le64(java.lang.Double.doubleToLongBits(bi.doubleValue()))) }
        case _ if v.isNumber => header(0x01)
          body.write(le64(java.lang.Double.doubleToLongBits(v.doubleValue())))
        case _ if v.isBoolean =>
          header(0x08); body.write(if (v.booleanValue()) 1 else 0)
        case _ if v.isNull => header(0x0A)
        case _ if v.isBinary =>
          // binary 0x05, generic subtype 0x00 (subtypes beyond 0 are
          // not modeled — the reference's comparisons only operate
          // within one subtype anyway)
          header(0x05)
          val b = v.binaryValue()
          body.write(le32(b.length)); body.write(0x00)
          body.write(b, 0, b.length)
        case _ if v.isObject && v.size() == 1 && v.get("$binary") != null &&
            v.get("$binary").isObject &&
            v.get("$binary").get("base64") != null =>
          // MongoDB extended-JSON spelling from JSON text input:
          // {"$binary": {"base64": "...", "subType": "00"}} — the full
          // shape is required; a malformed {"$binary": "..."} falls
          // through to the plain document branch instead of NPE-ing
          val bin = v.get("$binary")
          val b = java.util.Base64.getDecoder
            .decode(bin.get("base64").asText())
          header(0x05)
          body.write(le32(b.length)); body.write(0x00)
          body.write(b, 0, b.length)
        case _ if v.isObject => header(0x03)
          val d = encodeDoc(v); body.write(d, 0, d.length)
        case _ if v.isArray => header(0x04)
          val d = encodeDoc(v); body.write(d, 0, d.length)
        case other =>
          throw new IllegalArgumentException(s"unsupported node $other")
      }
    }
    val inner = body.toByteArray
    val out = ByteBuffer.allocate(4 + inner.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(4 + inner.length + 1).put(inner).put(0.toByte)
    out.array()
  }

  def decode(bytes: Array[Byte]): ObjectNode = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    decodeDoc(buf, asArray = false).asInstanceOf[ObjectNode]
  }

  // A projection typically applies several BSON expressions to the SAME
  // row's document(s) (q_bson_value: ~6 per row over 2 docs); this small
  // per-thread memo collapses those to one decode each. Content equality,
  // not identity — UnsafeRow.getBinary returns a fresh copy per access.
  // Decoded trees are navigated read-only by all callers.
  private val lastDecode =
    new ThreadLocal[Array[(Array[Byte], ObjectNode)]] {
      override def initialValue() = new Array[(Array[Byte], ObjectNode)](2)
    }

  def decodeCached(bytes: Array[Byte]): ObjectNode = {
    val slots = lastDecode.get()
    var i = 0
    while (i < slots.length) {
      val s = slots(i)
      if (s != null && java.util.Arrays.equals(s._1, bytes)) return s._2
      i += 1
    }
    val node = decode(bytes)
    slots(1) = slots(0)
    slots(0) = (bytes, node)
    node
  }

  private def decodeDoc(buf: ByteBuffer, asArray: Boolean): JsonNode = {
    val total = buf.getInt
    val end = buf.position() + total - 5
    val obj = if (asArray) null else F.objectNode()
    val arr = if (asArray) F.arrayNode() else null
    while (buf.position() < end) {
      val t = buf.get() & 0xff
      val name = cstring(buf)
      val v: JsonNode = t match {
        case 0x01 => F.numberNode(java.lang.Double.longBitsToDouble(buf.getLong))
        case 0x02 =>
          val len = buf.getInt
          val b = new Array[Byte](len - 1); buf.get(b); buf.get()
          F.textNode(new String(b, StandardCharsets.UTF_8))
        case 0x03 => decodeDoc(buf, asArray = false)
        case 0x04 => decodeDoc(buf, asArray = true)
        case 0x05 =>
          val len = buf.getInt; buf.get() // subtype byte (not modeled)
          val b = new Array[Byte](len); buf.get(b)
          F.binaryNode(b)
        case 0x08 => F.booleanNode(buf.get() != 0)
        case 0x09 => // UTC datetime: keep the type distinguishable
          F.pojoNode(new java.util.Date(buf.getLong))
        case 0x0A => F.nullNode()
        case 0x10 => F.numberNode(buf.getInt)
        case 0x12 => F.numberNode(buf.getLong)
        case other =>
          throw new IllegalArgumentException(f"unsupported BSON type 0x$other%02x")
      }
      if (asArray) arr.add(v) else obj.set[JsonNode](name, v)
    }
    buf.get() // trailing 0x00
    if (asArray) arr else obj
  }

  private def cstring(buf: ByteBuffer): String = {
    val sb = new ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private implicit class IterAdapter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}

/** Static kernels shared by interpreted eval and generated code — same
  * role as [[JsonOps]] for the JSON family: whole-stage codegen emits
  * direct calls to these, so a BSON projection no longer splits the
  * surrounding codegen span the way the previous CodegenFallback forms
  * did. All state shipped to executors is either a [[JsonPathCache]]
  * reference object or the content-keyed per-thread decode memo inside
  * [[BsonLite]]. */
object BsonOps {
  // jackson ObjectMapper is thread-safe for read/write once configured
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def toBson(j: UTF8String): Array[Byte] =
    try BsonLite.encode(mapper.readTree(j.toString))
    catch {
      case _: com.fasterxml.jackson.core.JacksonException => null
      // valid JSON whose root is not an object ('42', '[1]', 'null') —
      // a BSON document must be an object; NULL per row, not a task crash
      case _: IllegalArgumentException => null
    }

  // malformed input → null node → NULL result per row, matching toBson
  // and the JsonOps family: a corrupt binary blob (BufferUnderflow on a
  // truncated document, unsupported type tag) or an unparsable field key
  // must not kill the task
  private def node(d: Array[Byte], p: UTF8String,
      pc: JsonPathCache): JsonNode =
    try {
      val root = BsonLite.decodeCached(d)
      JsonPathWalk.navigate(root, pc.get("$." + p.toString))
    } catch { case scala.util.control.NonFatal(_) => null }

  def valueType(d: Array[Byte], p: UTF8String,
      pc: JsonPathCache): UTF8String = {
    val n = node(d, p, pc)
    val name =
      if (n == null || n.isNull) "NULL"
      else if (n.isTextual) "VARCHAR"
      else if (n.isInt) "INTEGER"
      else if (n.isLong) "BIGINT"
      else if (n.isDouble || n.isBigDecimal) "DOUBLE"
      else if (n.isBoolean) "BOOLEAN"
      else if (n.isPojo) "DATE"
      else if (n.isObject || n.isArray) "BSON"
      else "VARCHAR"
    UTF8String.fromString(name)
  }

  def valueVarchar(d: Array[Byte], p: UTF8String,
      pc: JsonPathCache): UTF8String = {
    val n = node(d, p, pc)
    if (n == null || n.isNull) null
    else UTF8String.fromString(
      if (n.isTextual) n.textValue()
      // numeric → String.valueOf(doubleValue()) per the reference
      // ("42" serializes as "42.0", not as its JSON text)
      else if (n.isNumber) String.valueOf(n.doubleValue())
      else mapper.writeValueAsString(n))
  }

  def valueInt(d: Array[Byte], p: UTF8String,
      pc: JsonPathCache): java.lang.Integer = {
    val n = node(d, p, pc)
    if (n != null && n.isNumber) Int.box(n.intValue()) else null
  }

  def valueLong(d: Array[Byte], p: UTF8String,
      pc: JsonPathCache): java.lang.Long = {
    val n = node(d, p, pc)
    if (n != null && n.isNumber) Long.box(n.longValue()) else null
  }

  def valueDouble(d: Array[Byte], p: UTF8String,
      pc: JsonPathCache): java.lang.Double = {
    val n = node(d, p, pc)
    if (n != null && n.isNumber) Double.box(n.doubleValue()) else null
  }

  def valueBool(d: Array[Byte], p: UTF8String,
      pc: JsonPathCache): java.lang.Boolean = {
    val n = node(d, p, pc)
    if (n != null && n.isBoolean) Boolean.box(n.booleanValue()) else null
  }
}

/** TO_BSON(jsonString) → varbinary (BSON document). */
case class ToBson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    BsonOps.toBson(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, j => s"""
      ${ev.value} = graft.functions.BsonOps.toBson($j);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(c: Expression): ToBson =
    copy(child = c)
  override def prettyName: String = "to_bson"
}

/** BSON_VALUE_TYPE(bson, fieldKey) → the Phoenix SQL type name of the
  * field's BSON type (reference BsonValueTypeFunction.java:121-143:
  * string→VARCHAR, int32→INTEGER, int64→BIGINT, double→DOUBLE,
  * boolean→BOOLEAN, datetime→DATE, document/array→BSON, null or missing
  * field→'NULL'). */
case class BsonValueType(doc: Expression, path: Expression)
    extends BinaryExpression {
  override def left: Expression = doc
  override def right: Expression = path
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val pathCache = new JsonPathCache

  override def nullSafeEval(d: Any, p: Any): Any =
    BsonOps.valueType(d.asInstanceOf[Array[Byte]],
      p.asInstanceOf[UTF8String], pathCache)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pc = ctx.addReferenceObj("pathCache", pathCache,
      "graft.functions.JsonPathCache")
    nullSafeCodeGen(ctx, ev, (d, p) => s"""
      ${ev.value} = graft.functions.BsonOps.valueType($d, $p, $pc);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BsonValueType = copy(doc = l, path = r)
  override def prettyName: String = "bson_value_type"
}

/** BSON_VALUE(bson, fieldKey, sqlType) — fieldKey uses the reference's
  * dot + [n] notation WITHOUT a leading '$' (BsonValueFunction.java doc);
  * sqlType ∈ VARCHAR | INTEGER | BIGINT | DOUBLE | BOOLEAN. Missing field
  * → NULL (the reference's DEFAULT_VALUE). */
case class BsonValue(doc: Expression, path: Expression, sqlType: Expression)
    extends TernaryExpression {
  override def first: Expression = doc
  override def second: Expression = path
  override def third: Expression = sqlType

  @transient private lazy val returnType: String =
    sqlType.eval() match {
      case s: UTF8String => s.toString.toUpperCase(java.util.Locale.ROOT)
      case other => throw new IllegalArgumentException(
        s"sqlType must be a string literal, got $other")
    }

  override def dataType: DataType = returnType match {
    case "VARCHAR" | "CHAR" => StringType
    case "INTEGER" => IntegerType
    case "BIGINT" => LongType
    case "DOUBLE" => DoubleType
    case "BOOLEAN" => BooleanType
    case other => throw new IllegalArgumentException(
      s"unsupported BSON_VALUE type $other")
  }
  override def nullable: Boolean = true

  @transient private lazy val pathCache = new JsonPathCache

  // Typed returns are strict like the reference (BsonValueFunction.java
  // throws "function data type does not match" on a mismatched node;
  // here: NULL per row). jackson's intValue()/booleanValue() would
  // otherwise silently return 0/false for textual or document nodes —
  // the BsonOps kernels gate on the node's own type.
  override def nullSafeEval(d: Any, p: Any, t: Any): Any = {
    val doc = d.asInstanceOf[Array[Byte]]
    val path = p.asInstanceOf[UTF8String]
    returnType match {
      case "VARCHAR" | "CHAR" => BsonOps.valueVarchar(doc, path, pathCache)
      case "INTEGER" => BsonOps.valueInt(doc, path, pathCache)
      case "BIGINT" => BsonOps.valueLong(doc, path, pathCache)
      case "DOUBLE" => BsonOps.valueDouble(doc, path, pathCache)
      case "BOOLEAN" => BsonOps.valueBool(doc, path, pathCache)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pc = ctx.addReferenceObj("pathCache", pathCache,
      "graft.functions.JsonPathCache")
    // VARCHAR's UTF8String result assigns directly; the primitive arms
    // go through a boxed local so a type-mismatched node yields NULL
    // without a sentinel value
    val (helper, box) = returnType match {
      case "VARCHAR" | "CHAR" => ("valueVarchar", null)
      case "INTEGER" => ("valueInt", "java.lang.Integer")
      case "BIGINT" => ("valueLong", "java.lang.Long")
      case "DOUBLE" => ("valueDouble", "java.lang.Double")
      case "BOOLEAN" => ("valueBool", "java.lang.Boolean")
    }
    nullSafeCodeGen(ctx, ev, (d, p, _) =>
      if (box == null) s"""
        ${ev.value} = graft.functions.BsonOps.$helper($d, $p, $pc);
        ${ev.isNull} = ${ev.value} == null;"""
      else {
        val r = ctx.freshName("bsonVal")
        s"""
        $box $r = graft.functions.BsonOps.$helper($d, $p, $pc);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r; }"""
      })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BsonValue =
    copy(doc = f, path = s, sqlType = t)
  override def prettyName: String = "bson_value"
}
