package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
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
      // the reference passes JAVA-format locale strings ('en_US',
      // 'zh_TW_STROKE'); forLanguageTag is BCP-47 and silently maps an
      // underscore spelling to Locale.ROOT — wrong collation with no
      // error. Normalize separators so both spellings resolve.
      val c = java.text.Collator.getInstance(
        java.util.Locale.forLanguageTag(tag.replace('_', '-')))
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

/** Shared JSONPath-subset navigation for the JSON function family: paths
  * of the form `$`, `$.a.b`, `$.a[2].c`, `$[0]` (dot keys + bracket array
  * indices — the shapes the reference's Json*IT tests exercise). */
private[functions] object JsonPathWalk {
  import com.fasterxml.jackson.databind.JsonNode

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  // A query typically applies several JSON expressions to the SAME row's
  // document (each expression is an independent Catalyst node); this
  // single-entry per-thread memo collapses those to one parse. READ-ONLY:
  // callers that mutate the tree (JSON_MODIFY) must parse fresh.
  // SoftReference: executor task threads are pooled and long-lived, so
  // a hard ThreadLocal would pin the LAST multi-megabyte document (text
  // + parsed tree) per core for the executor's lifetime; a soft ref
  // keeps the memo hit rate and lets the GC reclaim it under pressure
  private val lastParse =
    new ThreadLocal[java.lang.ref.SoftReference[(String, JsonNode)]]

  /** Parse for read-only navigation, memoized per thread on the last
    * input. Throws JacksonException on malformed input like readTree. */
  def parseCached(json: String): JsonNode = {
    val ref = lastParse.get()
    val memo = if (ref == null) null else ref.get()
    if (memo != null && memo._1 == json) memo._2
    else {
      val node = mapper.readTree(json)
      lastParse.set(new java.lang.ref.SoftReference((json, node)))
      node
    }
  }

  sealed trait Seg
  case class Key(k: String) extends Seg
  case class Idx(i: Int) extends Seg

  def parse(path: String): Seq[Seg] = {
    require(path.startsWith("$"), s"JSON path must start with $$: $path")
    val segRe = "\\.([^.\\[\\]]+)|\\[(\\d+)\\]".r
    val rest = path.drop(1)
    val segs = segRe.findAllMatchIn(rest).map { m =>
      if (m.group(1) != null) Key(m.group(1)) else Idx(m.group(2).toInt)
    }.toSeq
    val consumed = segRe.findAllMatchIn(rest).map(_.matched.length).sum
    require(consumed == rest.length, s"cannot parse JSON path: $path")
    segs
  }

  /** Node at path, or null when any step is missing/mismatched. */
  def navigate(root: JsonNode, segs: Seq[Seg]): JsonNode =
    segs.foldLeft(root) { (n, s) =>
      if (n == null) null
      else s match {
        case Key(k) => if (n.isObject && n.has(k)) n.get(k) else null
        case Idx(i) => if (n.isArray && i < n.size()) n.get(i) else null
      }
    }
}

/** Per-expression JSON path memo — paths are almost always literals, so
  * this caches the parsed segment list across rows. Top-level class (no
  * `$` in the binary name) so generated Java code can type a reference
  * to it; Serializable because codegen ships it to executors in the
  * plan's references array (the memo itself is transient — rebuilt on
  * first use after deserialization). */
final class JsonPathCache extends Serializable {
  @transient private var last: (String, Seq[JsonPathWalk.Seg]) = _
  def get(path: String): Seq[JsonPathWalk.Seg] = {
    if (last == null || last._1 != path) last = (path, JsonPathWalk.parse(path))
    last._2
  }
}

/** Static kernels for the JSON function family — shared by interpreted
  * eval and generated code, so the expressions stay inside whole-stage
  * codegen (a CodegenFallback subtree forces per-row boxed eval of the
  * whole expression and breaks common-subexpression elimination with
  * its codegen'd siblings). */
object JsonOps {
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** JSON_VALUE: scalar at path as string; containers/JSON null/missing/
    * malformed → null. */
  def value(j: UTF8String, p: UTF8String, pc: JsonPathCache): UTF8String =
    try {
      val root = JsonPathWalk.parseCached(j.toString)
      val node = JsonPathWalk.navigate(root, pc.get(p.toString))
      if (node == null || node.isNull || node.isContainerNode) null
      else UTF8String.fromString(node.asText())
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => null
    }

  /** JSON_QUERY: fragment at path serialized; missing/malformed → null. */
  def query(j: UTF8String, p: UTF8String, pc: JsonPathCache): UTF8String =
    try {
      val root = JsonPathWalk.parseCached(j.toString)
      val node = JsonPathWalk.navigate(root, pc.get(p.toString))
      if (node == null) null
      else UTF8String.fromString(mapper.writeValueAsString(node))
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => null
    }

  /** JSON_EXISTS: path resolves (JSON null counts); malformed → null. */
  def exists(j: UTF8String, p: UTF8String, pc: JsonPathCache)
      : java.lang.Boolean =
    try {
      val root = JsonPathWalk.parseCached(j.toString)
      java.lang.Boolean.valueOf(
        JsonPathWalk.navigate(root, pc.get(p.toString)) != null)
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => null
    }

  /** JSON_MODIFY: node at path replaced/inserted; structural mismatch or
    * malformed input → null. Parses fresh (mutates the tree — must not
    * touch the read-only parse memo). */
  def modify(j: UTF8String, p: UTF8String, v: UTF8String,
      pc: JsonPathCache): UTF8String = {
    val segs = pc.get(p.toString)
    // a root path has no parent to modify — NULL per the structural-
    // mismatch contract (a require here would kill the task on one row)
    if (segs.isEmpty) return null
    try {
      val root = mapper.readTree(j.toString)
      val parent = JsonPathWalk.navigate(root, segs.init)
      val newNode = mapper.readTree(v.toString)
      (parent, segs.last) match {
        case (obj: ObjectNode, JsonPathWalk.Key(k)) =>
          obj.set(k, newNode)
          UTF8String.fromString(mapper.writeValueAsString(root))
        case (arr: ArrayNode, JsonPathWalk.Idx(i)) if i < arr.size() =>
          arr.set(i, newNode)
          UTF8String.fromString(mapper.writeValueAsString(root))
        case _ => null
      }
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => null
    }
  }
}

/** JSON_MODIFY(json, path, newValueJson) → json with the node at the path
  * replaced (or inserted, for a missing final object key) — reference:
  * .../expression/function/JsonModifyFunction.java:45. Supports nested
  * dot/array paths; the new value is parsed as JSON (so '"str"', '42',
  * '[1,2]' all work). Structural mismatch (missing intermediate, index
  * past end) → NULL, as is malformed input JSON. */
case class JsonModify(json: Expression, path: Expression, value: Expression)
    extends TernaryExpression {
  override def first: Expression = json
  override def second: Expression = path
  override def third: Expression = value
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val pathCache = new JsonPathCache

  override def nullSafeEval(j: Any, p: Any, v: Any): Any =
    JsonOps.modify(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      v.asInstanceOf[UTF8String], pathCache)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pc = ctx.addReferenceObj("pathCache", pathCache,
      "graft.functions.JsonPathCache")
    nullSafeCodeGen(ctx, ev, (j, p, v) => s"""
      ${ev.value} = graft.functions.JsonOps.modify($j, $p, $v, $pc);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JsonModify =
    copy(json = f, path = s, value = t)
  override def prettyName: String = "json_modify"
}

/** JSON_QUERY(json, path) → the JSON fragment at the path, serialized
  * (objects/arrays compact, scalars in JSON form — reference:
  * .../expression/function/JsonQueryFunction.java:44). Missing path or
  * malformed input → NULL. */
case class JsonQuery(json: Expression, path: Expression)
    extends BinaryExpression {
  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val pathCache = new JsonPathCache

  override def nullSafeEval(j: Any, p: Any): Any =
    JsonOps.query(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      pathCache)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pc = ctx.addReferenceObj("pathCache", pathCache,
      "graft.functions.JsonPathCache")
    nullSafeCodeGen(ctx, ev, (j, p) => s"""
      ${ev.value} = graft.functions.JsonOps.query($j, $p, $pc);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JsonQuery = copy(json = l, path = r)
  override def prettyName: String = "json_query"
}

/** JSON_VALUE(json, path) → the SCALAR at the path as a string —
  * "everything except object and array" (reference:
  * .../expression/function/JsonValueFunction.java:39-41; the optional
  * RETURNING typecast is a plain CAST around this). Objects, arrays,
  * JSON null, missing paths, malformed input → NULL. */
case class JsonValue(json: Expression, path: Expression)
    extends BinaryExpression {
  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val pathCache = new JsonPathCache

  override def nullSafeEval(j: Any, p: Any): Any =
    JsonOps.value(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      pathCache)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pc = ctx.addReferenceObj("pathCache", pathCache,
      "graft.functions.JsonPathCache")
    nullSafeCodeGen(ctx, ev, (j, p) => s"""
      ${ev.value} = graft.functions.JsonOps.value($j, $p, $pc);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JsonValue = copy(json = l, path = r)
  override def prettyName: String = "json_value"
}

/** JSON_EXISTS(json, path) → true iff the path resolves to a node (an
  * explicit JSON null counts as existing — reference:
  * .../expression/function/JsonExistsFunction.java:44). Malformed input
  * → NULL. */
case class JsonExists(json: Expression, path: Expression)
    extends BinaryExpression {
  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val pathCache = new JsonPathCache

  override def nullSafeEval(j: Any, p: Any): Any = {
    val r = JsonOps.exists(j.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], pathCache)
    if (r == null) null else r.booleanValue()
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pc = ctx.addReferenceObj("pathCache", pathCache,
      "graft.functions.JsonPathCache")
    nullSafeCodeGen(ctx, ev, (j, p) => {
      val r = ctx.freshName("jsonExists")
      s"""
      java.lang.Boolean $r = graft.functions.JsonOps.exists($j, $p, $pc);
      ${ev.isNull} = $r == null;
      ${ev.value} = ${ev.isNull} ? false : $r.booleanValue();"""
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JsonExists = copy(json = l, path = r)
  override def prettyName: String = "json_exists"
}
