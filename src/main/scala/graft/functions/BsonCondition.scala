package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BSON_CONDITION_EXPRESSION / BSON_UPDATE_EXPRESSION — the reference's
  * DynamoDB-compatible document condition and update surface
  * (phoenix-core-client .../expression/function/
  * BsonConditionExpressionFunction.java:46,
  * BsonUpdateExpressionFunction.java, util/bson/
  * SQLComparisonExpressionUtils.java:59,
  * DocumentComparisonExpressionUtils.java:40,
  * UpdateExpressionUtils.java:55, antlr3/PhoenixBsonExpression.g).
  *
  * Condition argument shapes, dispatched like the reference:
  *  - SQL-style: a JSON document `{"$EXPR": "<condition text>",
  *    "$VAL": {":ph": value, ...}, "$KEYS": {"#k": "real.name", ...}}` —
  *    the condition text grammar supports field_exists/attribute_exists,
  *    field_not_exists/attribute_not_exists, begins_with, contains,
  *    field_type/attribute_type, size(path) as a comparison operand,
  *    comparisons (= != <> < <= > >=) whose RHS is a `:placeholder`
  *    resolved from $VAL, [NOT] BETWEEN :a AND :b, [NOT] IN (:a, ...),
  *    and AND/OR/NOT with parentheses (keywords case-insensitive).
  *  - Document-style (no $EXPR key): `{field: {"$eq"/"$ne"/"$lt"/"$lte"/
  *    "$gt"/"$gte"/"$exists": value}, ...}` plus `{"$and"/"$or": [...]}`.
  *
  * Update argument: `{"$SET": {path: value-or-operator-doc, ...},
  * "$UNSET": {path: null, ...}, "$ADD": {path: number-or-set, ...},
  * "$DELETE_FROM_SET": {path: set, ...}}`; SET values may be
  * `{"$ADD"/"$SUBTRACT": [operand, operand]}` (numeric, operands are
  * literals, document paths, or `{"$IF_NOT_EXISTS": {path: fallback}}`),
  * `{"$LIST_APPEND": [list-operand, list-operand]}`, or
  * `{"$IF_NOT_EXISTS": {path: fallback}}`.
  *
  * Sets are `{"$set": [...]}`-wrapped arrays like the reference's
  * DynamoDB encoding. DIVERGENCE (documented): the reference unions and
  * deletes set elements through java.util.HashSet, so its element ORDER
  * after $ADD/$DELETE_FROM_SET is hash-iteration order; this
  * implementation preserves first-seen order — same set, deterministic
  * order (Spark-side determinism is worth more than byte-matching an
  * order the reference itself does not define). Binary (BSON 0x05) is
  * first-class: comparisons, begins_with (byte prefix), contains/IN
  * over binary sets, field_type B/BS, and size() all accept either a
  * decoded 0x05 value or the extended-JSON {"$binary": {"base64":...}}
  * spelling (subtypes beyond generic 0x00 are not modeled).
  *
  * Comparison type discipline matches CommonComparisonExpressionUtils.
  * compareValues: equality is value+type equality (int32 5 != int64 5,
  * matching BsonInt32 vs BsonInt64); ordered comparisons only within
  * string/string, number/number, binary/binary (unsigned lexicographic,
  * the reference's Bytes.compareTo), datetime/datetime — mixed types
  * are false. A missing LHS field fails the predicate (never throws); a
  * missing $VAL placeholder is false for =/begins_with/contains, true
  * for !=, and an error for ordered comparisons and field_type, all per
  * the reference.
  */
object BsonConditionEval {
  private val F = JsonNodeFactory.instance
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ===================== AST =====================
  sealed trait Cond
  final case class AndN(cs: List[Cond]) extends Cond
  final case class OrN(cs: List[Cond]) extends Cond
  final case class NotN(c: Cond) extends Cond
  final case class ExistsN(path: String, expectExists: Boolean) extends Cond
  final case class BeginsWithN(path: String, ref: String) extends Cond
  final case class ContainsN(path: String, ref: String) extends Cond
  final case class FieldTypeN(path: String, ref: String) extends Cond
  /** op ∈ EQ NE LT LE GT GE; rhs is a $VAL placeholder name. */
  final case class CmpN(op: String, lhs: Operand, ref: String) extends Cond
  final case class BetweenN(lhs: Operand, lo: String, hi: String,
      negate: Boolean) extends Cond
  final case class InN(lhs: Operand, refs: List[String],
      negate: Boolean) extends Cond

  sealed trait Operand
  final case class PathOp(path: String) extends Operand
  final case class SizeOp(path: String) extends Operand

  /** Pre-compiled condition: AST with $KEYS aliases already substituted
    * + the $VAL document. Immutable, shareable across rows/threads. */
  final case class Compiled(cond: Cond, values: JsonNode)

  // ===================== parser =====================
  private final class Parser(input: String) {
    private var pos = 0
    private def ws(): Unit =
      while (pos < input.length && input.charAt(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < input.length) input.charAt(pos) else '\u0000'
    private def err(msg: String): Nothing = throw new IllegalArgumentException(
      s"BSON condition expression parse error at $pos: $msg in: $input")

    // a word: path chars (letters, digits, _, ., [, ], #, :, -, $)
    private def isWordChar(c: Char): Boolean =
      c.isLetterOrDigit || "._[]#:$-".indexOf(c) >= 0
    private def word(): String = {
      ws()
      val start = pos
      while (pos < input.length && isWordChar(input.charAt(pos))) pos += 1
      if (pos == start) err("expected identifier")
      input.substring(start, pos)
    }
    private def expect(c: Char): Unit = {
      ws()
      if (peek != c) err(s"expected '$c'")
      pos += 1
    }
    private def tryConsume(c: Char): Boolean = {
      ws(); if (peek == c) { pos += 1; true } else false
    }
    private def peekWord(): String = {
      ws()
      val p0 = pos
      val w = if (pos < input.length && isWordChar(peek)) {
        var e = pos
        while (e < input.length && isWordChar(input.charAt(e))) e += 1
        input.substring(pos, e)
      } else ""
      pos = p0
      w
    }
    private def consumeKeyword(k: String): Boolean = {
      val w = peekWord()
      if (w.equalsIgnoreCase(k)) { word(); true } else false
    }

    def parse(): Cond = {
      val c = orExpr()
      ws()
      if (pos < input.length) err(s"trailing input '${input.substring(pos)}'")
      c
    }
    private def orExpr(): Cond = {
      val cs = scala.collection.mutable.ListBuffer(andExpr())
      while (consumeKeyword("OR")) cs += andExpr()
      if (cs.length == 1) cs.head else OrN(cs.toList)
    }
    private def andExpr(): Cond = {
      val cs = scala.collection.mutable.ListBuffer(notExpr())
      while (consumeKeyword("AND")) cs += notExpr()
      if (cs.length == 1) cs.head else AndN(cs.toList)
    }
    // recursion depth bound: the descent recurses per NOT / paren group,
    // so a degenerate '((((...' input would StackOverflow — an Error,
    // not an exception, killing the executor thread instead of failing
    // the row's expression with a typed message. The reference service
    // caps whole expressions at 4 KB; 400 nesting levels is far beyond
    // any real condition.
    private var depth = 0
    private def descend[A](body: => A): A = {
      // increment INSIDE the try: the >400 err must unwind the counter
      // too, or a caller that caught and resumed (or a reused Parser)
      // would reject valid input against a stale depth
      depth += 1
      try {
        if (depth > 400) err("expression nesting too deep (max 400)")
        body
      } finally depth -= 1
    }
    private def notExpr(): Cond =
      if (consumeKeyword("NOT")) descend(NotN(notExpr()))
      else if (tryConsume('(')) descend {
        val c = orExpr(); expect(')'); c
      }
      else booleanExpr()

    private def pathArg(): String = {
      expect('('); val p = word(); p
    }
    private def booleanExpr(): Cond = {
      val w = peekWord().toLowerCase(java.util.Locale.ROOT)
      w match {
        case "field_exists" | "attribute_exists" =>
          word(); val p = pathArg(); expect(')'); ExistsN(p, expectExists = true)
        case "field_not_exists" | "attribute_not_exists" =>
          word(); val p = pathArg(); expect(')'); ExistsN(p, expectExists = false)
        case "begins_with" =>
          word(); val p = pathArg(); expect(','); val r = word(); expect(')')
          BeginsWithN(p, r)
        case "contains" =>
          word(); val p = pathArg(); expect(','); val r = word(); expect(')')
          ContainsN(p, r)
        case "field_type" | "attribute_type" =>
          word(); val p = pathArg(); expect(','); val r = word(); expect(')')
          FieldTypeN(p, r)
        case _ =>
          val lhs = operand()
          val negate = consumeKeyword("NOT")
          if (consumeKeyword("BETWEEN")) {
            val lo = word()
            if (!consumeKeyword("AND")) err("expected AND in BETWEEN")
            BetweenN(lhs, lo, word(), negate)
          } else if (consumeKeyword("IN")) {
            expect('(')
            val refs = scala.collection.mutable.ListBuffer(word())
            while (tryConsume(',')) refs += word()
            expect(')')
            InN(lhs, refs.toList, negate)
          } else if (negate) err("expected BETWEEN or IN after NOT")
          else {
            val op = cmpOp()
            CmpN(op, lhs, word())
          }
      }
    }
    private def operand(): Operand = {
      val w = peekWord()
      if (w.equalsIgnoreCase("size")) {
        word()
        val p0 = pos
        if (tryConsume('(')) { val p = word(); expect(')'); SizeOp(p) }
        else { pos = p0; PathOp(w) } // a field literally named 'size'
      } else PathOp(word())
    }
    private def cmpOp(): String = {
      ws()
      peek match {
        case '=' => pos += 1; "EQ"
        case '!' =>
          pos += 1; if (peek == '=') { pos += 1; "NE" } else err("expected !=")
        case '<' =>
          pos += 1
          if (peek == '=') { pos += 1; "LE" }
          else if (peek == '>') { pos += 1; "NE" }
          else "LT"
        case '>' =>
          pos += 1; if (peek == '=') { pos += 1; "GE" } else "GT"
        case other => err(s"expected comparison operator, got '$other'")
      }
    }
  }

  /** Compile the condition document (JSON text): SQL-style when $EXPR is
    * present (aliases from $KEYS substituted into every path up front),
    * document-style otherwise (kept as the parsed node). Empty condition
    * → always-true, per the reference. */
  def compile(conditionJson: String): scala.util.Either[Compiled, JsonNode] = {
    // an empty condition is vacuously true, per the reference
    if (conditionJson.trim.isEmpty) return scala.util.Right(F.objectNode())
    val node = mapper.readTree(conditionJson)
    require(node != null && node.isObject,
      s"BSON condition/update expression must be a JSON object: $conditionJson")
    val expr = node.get("$EXPR")
    if (expr != null) {
      val values = node.get("$VAL")
      require(expr.isTextual && values != null && values.isObject,
        "Condition Expression should contain valid expression and values")
      val keys = node.get("$KEYS")
      var ast = new Parser(expr.textValue()).parse()
      if (keys != null && keys.isObject) {
        val aliases = iter(keys.fieldNames()).toList
          .sortBy(-_.length) // longest first, like the reference
        def sub(p: String): String = {
          var s = p
          aliases.foreach { a =>
            if (s.contains(a)) s = s.replace(a, keys.get(a).textValue())
          }
          s
        }
        def rewriteOp(o: Operand): Operand = o match {
          case PathOp(p) => PathOp(sub(p))
          case SizeOp(p) => SizeOp(sub(p))
        }
        def rewrite(c: Cond): Cond = c match {
          case AndN(cs) => AndN(cs.map(rewrite))
          case OrN(cs) => OrN(cs.map(rewrite))
          case NotN(x) => NotN(rewrite(x))
          case ExistsN(p, e) => ExistsN(sub(p), e)
          case BeginsWithN(p, r) => BeginsWithN(sub(p), r)
          case ContainsN(p, r) => ContainsN(sub(p), r)
          case FieldTypeN(p, r) => FieldTypeN(sub(p), r)
          case CmpN(op, l, r) => CmpN(op, rewriteOp(l), r)
          case BetweenN(l, a, b, n) => BetweenN(rewriteOp(l), a, b, n)
          case InN(l, rs, n) => InN(rewriteOp(l), rs, n)
        }
        ast = rewrite(ast)
      }
      scala.util.Left(Compiled(ast, values))
    } else scala.util.Right(node)
  }

  // ===================== navigation =====================
  /** Reference getFieldFromDocument: try the WHOLE key as a top-level
    * field first (a field literally named "a.b" wins), then walk the
    * dot/[n] notation. */
  def getField(doc: JsonNode, key: String): JsonNode = {
    val top = doc.get(key)
    if (top != null) return top
    if (key.indexOf('.') < 0 && key.indexOf('[') < 0) return null
    var cur: JsonNode = doc
    var i = 0
    val n = key.length
    val sb = new java.lang.StringBuilder()
    def descendField(): Boolean = {
      if (cur == null || !cur.isObject) return false
      cur = cur.get(sb.toString); sb.setLength(0)
      cur != null
    }
    while (i < n) {
      key.charAt(i) match {
        case '.' =>
          // after ']' the buffer is empty and the position is already
          // AT the element — a bare '.' only separates ("a[1].b"); an
          // unguarded descend would do cur.get("") and null the walk
          if (sb.length > 0 && !descendField()) return null
          i += 1
        case '[' =>
          if (sb.length > 0 && !descendField()) return null
          i += 1
          var idx = 0
          // malformed (non-digit / empty) indexes fail loudly like the
          // reference's Integer.parseInt, instead of walking garbage
          if (i >= n || key.charAt(i) == ']')
            throw new IllegalArgumentException(s"empty array index in '$key'")
          while (i < n && key.charAt(i) != ']') {
            val c = key.charAt(i)
            if (c < '0' || c > '9') throw new IllegalArgumentException(
              s"non-numeric array index in '$key'")
            idx = idx * 10 + (c - '0'); i += 1
          }
          i += 1 // ']'
          if (cur == null || !cur.isArray || idx >= cur.size()) return null
          cur = cur.get(idx)
        case c => sb.append(c); i += 1
      }
    }
    if (sb.length > 0) {
      if (cur == null || !cur.isObject) return null
      cur = cur.get(sb.toString)
    }
    cur
  }

  def isSet(n: JsonNode): Boolean =
    n != null && n.isObject && n.size() == 1 && n.get("$set") != null &&
      n.get("$set").isArray

  /** Binary values reach comparisons in two spellings: a decoded BSON
    * 0x05 element is a jackson BinaryNode, while a $VAL document parsed
    * from JSON text carries the extended-JSON
    * `{"$binary": {"base64": ...}}` form — normalize the latter so both
    * compare as bytes (reference: both sides are BsonBinary). */
  def normBin(n: JsonNode): JsonNode =
    if (n != null && n.isObject && n.size() == 1 &&
        n.get("$binary") != null && n.get("$binary").isObject &&
        n.get("$binary").get("base64") != null)
      F.binaryNode(java.util.Base64.getDecoder
        .decode(n.get("$binary").get("base64").asText()))
    else n

  // ===================== evaluation =====================
  def evaluate(c: Compiled, doc: JsonNode): Boolean = eval(c.cond, doc, c.values)

  private def eval(c: Cond, doc: JsonNode, values: JsonNode): Boolean = c match {
    case AndN(cs) => cs.forall(eval(_, doc, values))
    case OrN(cs) => cs.exists(eval(_, doc, values))
    case NotN(x) => !eval(x, doc, values)
    case ExistsN(p, e) => (getField(doc, p) != null) == e
    case BeginsWithN(p, r) =>
      val f = normBin(getField(doc, p))
      val pre = normBin(values.get(r))
      if (f == null || pre == null) false
      else if (pre.isBinary)
        // binary prefix: byte-wise startsWith (reference handles
        // BsonBinary in CommonComparisonExpressionUtils)
        f.isBinary && {
          val fb = f.binaryValue(); val pb = pre.binaryValue()
          fb.length >= pb.length &&
            java.util.Arrays.equals(fb, 0, pb.length, pb, 0, pb.length)
        }
      else if (!pre.isTextual) throw new IllegalArgumentException(
        "begins_with function only supports String and Binary data types.")
      else f.isTextual && f.textValue().startsWith(pre.textValue())
    case ContainsN(p, r) =>
      val f = getField(doc, p)
      val v = normBin(values.get(r))
      if (f == null || v == null) false
      else if (f.isTextual) v.isTextual && f.textValue().contains(v.textValue())
      else if (f.isArray) iter(f.elements()).exists(normBin(_) == v)
      else if (isSet(f)) iter(f.get("$set").elements()).exists(normBin(_) == v)
      else false
    case FieldTypeN(p, r) =>
      val f = getField(doc, p)
      if (f == null) false
      else {
        val t = values.get(r)
        if (t == null) throw new IllegalArgumentException(
          "Value for type was not found in the comparison values document.")
        t.textValue() match {
          case "S" => f.isTextual
          case "N" => f.isNumber
          case "B" => normBin(f).isBinary
          case "BOOL" => f.isBoolean
          case "NULL" => f.isNull
          case "L" => f.isArray
          // a set's {"$set": [...]} carrier and the $binary spelling
          // are OBJECTS in the internal representation but not
          // documents to the type system
          case "M" => f.isObject && !isSet(f) && !normBin(f).isBinary
          case "SS" => isSet(f) && f.get("$set").size() > 0 &&
            f.get("$set").get(0).isTextual
          case "NS" => isSet(f) && f.get("$set").size() > 0 &&
            f.get("$set").get(0).isNumber
          case "BS" => isSet(f) && f.get("$set").size() > 0 &&
            normBin(f.get("$set").get(0)).isBinary
          case other => throw new IllegalArgumentException(
            s"Unsupported type in field_type() for BsonConditionExpression: " +
              s"$other, valid types: {N,BS,L,B,NULL,M,S,SS,NS,BOOL}")
        }
      }
    case CmpN(op, lhs, r) => cmp(op, lhs, r, doc, values)
    // resolve the LHS path ONCE per row — BETWEEN would otherwise walk
    // it per bound and IN per list element
    case BetweenN(lhs, lo, hi, neg) =>
      val v = resolveOperand(lhs, doc)
      neg != (v != null && compareNodes(v, values.get(lo), "GE") &&
        compareNodes(v, values.get(hi), "LE"))
    case InN(lhs, refs, neg) =>
      val v = resolveOperand(lhs, doc)
      neg != (v != null && refs.exists(r => compareNodes(v, values.get(r), "EQ")))
  }

  private def resolveOperand(o: Operand, doc: JsonNode): JsonNode = o match {
    case PathOp(p) => getField(doc, p)
    case SizeOp(p) => F.numberNode(sizeOf(getField(doc, p)))
  }

  /** Reference getSizeOfBsonValue: missing field → 0; string length,
    * array/set element count, document field count; other types error. */
  def sizeOf(f0: JsonNode): Int = {
    val f = normBin(f0)
    if (f == null) 0
    else if (f.isTextual) f.textValue().length
    else if (f.isBinary) f.binaryValue().length
    else if (isSet(f)) f.get("$set").size()
    else if (f.isArray || f.isObject) f.size()
    else throw new IllegalArgumentException(
      s"Unsupported type for size() function: $f, supported types: " +
        "String, Binary, Set, Array, Document.")
  }

  private def cmp(op: String, lhs: Operand, ref: String, doc: JsonNode,
      values: JsonNode): Boolean = {
    val l = resolveOperand(lhs, doc)
    if (l == null) return false // missing field never satisfies a comparison
    val r = values.get(ref)
    compareNodes(l, r, op)
  }

  /** CommonComparisonExpressionUtils.compareValues. */
  def compareNodes(l0: JsonNode, r0: JsonNode, op: String): Boolean = {
    val l = normBin(l0); val r = normBin(r0)
    op match {
    case "EQ" => l == r
    case "NE" => l != r
    case _ =>
      if (r == null) throw new IllegalArgumentException(
        "RHS operand for the Comparison operation should not be null")
      val c: Option[Int] =
        if (l.isTextual && r.isTextual)
          Some(l.textValue().compareTo(r.textValue()))
        else if (l.isBinary && r.isBinary)
          // reference: HBase Bytes.compareTo — unsigned lexicographic
          Some(java.util.Arrays.compareUnsigned(
            l.binaryValue(), r.binaryValue()))
        else if (l.isNumber && r.isNumber)
          Some(java.lang.Double.compare(l.doubleValue(), r.doubleValue()))
        else if (l.isPojo && r.isPojo) (l.asInstanceOf[
          com.fasterxml.jackson.databind.node.POJONode].getPojo,
          r.asInstanceOf[com.fasterxml.jackson.databind.node.POJONode].getPojo) match {
          case (a: java.util.Date, b: java.util.Date) => Some(a.compareTo(b))
          case _ => None
        }
        else None // mixed types never satisfy an ordered comparison
      c.exists { v =>
        op match {
          case "LT" => v < 0
          case "LE" => v <= 0
          case "GT" => v > 0
          case "GE" => v >= 0
        }
      }
    }
  }

  /** DocumentComparisonExpressionUtils: `{field: {"$op": value}}` entries
    * (implicitly ANDed) + `{"$and"/"$or": [conditions]}`. */
  def evaluateDocStyle(cond: JsonNode, doc: JsonNode): Boolean = {
    val names = iter(cond.fieldNames()).toList
    names.forall { name =>
      if (!name.startsWith("$")) {
        val spec = cond.get(name)
        require(spec.isObject,
          s"document-style condition for '$name' must be an operator document")
        val f = getField(doc, name)
        if (spec.get("$exists") != null) {
          val want = spec.get("$exists")
          require(want.isBoolean, "Expected type for $exists value is boolean")
          want.booleanValue() == (f != null)
        } else {
          val (op, rhs) =
            if (spec.get("$eq") != null) ("EQ", spec.get("$eq"))
            else if (spec.get("$ne") != null) ("NE", spec.get("$ne"))
            else if (spec.get("$lt") != null) ("LT", spec.get("$lt"))
            else if (spec.get("$lte") != null) ("LE", spec.get("$lte"))
            else if (spec.get("$gt") != null) ("GT", spec.get("$gt"))
            else if (spec.get("$gte") != null) ("GE", spec.get("$gte"))
            else throw new IllegalArgumentException(
              s"unsupported document-style condition operators in $spec")
          // NOTE: when one spec document carries several operators, only
          // the FIRST in $eq/$ne/$lt/$lte/$gt/$gte order is evaluated —
          // exactly the reference's if/else-if dispatch
          // (DocumentComparisonExpressionUtils.java:72-86); a range needs
          // two $and-ed conditions there and here alike (pinned in spec).
          // a missing field never satisfies ANY doc-style comparison
          // (including $ne) — reference compare() null-guards first
          f != null && compareNodes(f, rhs, op)
        }
      } else name match {
        case "$and" =>
          val arr = cond.get(name)
          require(arr.isArray, "Expected type for Bson value is Array for $and operator")
          iter(arr.elements()).forall(evaluateDocStyle(_, doc))
        case "$or" =>
          val arr = cond.get(name)
          require(arr.isArray, "Expected type for Bson value is Array for $or operator")
          iter(arr.elements()).exists(evaluateDocStyle(_, doc))
        case other => throw new IllegalArgumentException(
          s"unsupported document-style condition operator $other")
      }
    }
  }

  private def iter[A](it: java.util.Iterator[A]): Iterator[A] =
    new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }

  // ===================== update =====================
  /** UpdateExpressionUtils.updateExpression: apply $SET, $UNSET, $ADD,
    * $DELETE_FROM_SET (in that order) to a deep copy of `doc`. */
  def applyUpdate(updateExpr: JsonNode, doc0: ObjectNode): ObjectNode = {
    val doc = doc0.deepCopy()
    val set = updateExpr.get("$SET")
    if (set != null) iter(set.fieldNames()).toList.foreach { k =>
      val newVal = resolveSetValue(set.get(k), doc)
      applyAtPath(doc, k, "SET", newVal)
    }
    val unset = updateExpr.get("$UNSET")
    if (unset != null) iter(unset.fieldNames()).toList.foreach { k =>
      applyAtPath(doc, k, "UNSET", null)
    }
    val add = updateExpr.get("$ADD")
    if (add != null) iter(add.fieldNames()).toList.foreach { k =>
      val v = add.get(k)
      if (!v.isNumber && !isSet(v)) throw new IllegalArgumentException(
        "Type of new value to be updated should be either number or sets only")
      applyAtPath(doc, k, "ADD", v)
    }
    val del = updateExpr.get("$DELETE_FROM_SET")
    if (del != null) iter(del.fieldNames()).toList.foreach { k =>
      val v = del.get(k)
      if (!isSet(v)) throw new IllegalArgumentException(
        "Type of new value to be removed should be sets only")
      applyAtPath(doc, k, "DELETE", v)
    }
    doc
  }

  /** SET value operators: $IF_NOT_EXISTS, numeric $ADD/$SUBTRACT,
    * $LIST_APPEND; any other value (including strings that look like
    * arithmetic) is a literal. */
  private def resolveSetValue(v: JsonNode, doc: JsonNode): JsonNode =
    if (!v.isObject) v
    else if (v.get("$IF_NOT_EXISTS") != null) resolveIfNotExists(v, doc)
    else if (v.get("$ADD") != null || v.get("$SUBTRACT") != null) {
      val subtract = v.get("$ADD") == null
      val ops = if (subtract) v.get("$SUBTRACT") else v.get("$ADD")
      require(ops.isArray && ops.size() == 2,
        s"expected two operands for ${if (subtract) "$SUBTRACT" else "$ADD"}")
      val a = numOperand(ops.get(0), doc)
      val b = numOperand(ops.get(1), doc)
      numNode(a, b, subtract)
    } else if (v.get("$LIST_APPEND") != null) {
      val ops = v.get("$LIST_APPEND")
      require(ops.isArray && ops.size() == 2,
        "Incorrect number of operands for operator or function: $LIST_APPEND")
      val out = F.arrayNode()
      out.addAll(listOperand(ops.get(0), doc))
      out.addAll(listOperand(ops.get(1), doc))
      out
    } else v

  private def resolveIfNotExists(spec: JsonNode, doc: JsonNode): JsonNode = {
    val inner = spec.get("$IF_NOT_EXISTS")
    require(inner != null && inner.isObject && inner.size() == 1,
      "$IF_NOT_EXISTS expects {path: fallback}")
    val path = inner.fieldNames().next()
    val existing = getField(doc, path)
    // deepCopy: returning the live node would alias the working document
    // — a later $SET/$UNSET in the SAME update mutating the source
    // subtree would silently corrupt the copied-to path as well
    if (existing != null) existing.deepCopy[JsonNode]()
    else inner.get(path)
  }

  private def numOperand(op: JsonNode, doc: JsonNode): JsonNode = {
    val resolved =
      if (op.isNumber) op
      else if (op.isObject && op.get("$IF_NOT_EXISTS") != null)
        resolveIfNotExists(op, doc)
      else if (op.isTextual) {
        val f = getField(doc, op.textValue())
        if (f == null || !f.isNumber) throw new IllegalArgumentException(
          s"Operand for $$SET not found in document: $op")
        f
      } else throw new IllegalArgumentException(s"Invalid operand for $$SET: $op")
    if (!resolved.isNumber) throw new IllegalArgumentException(
      s"Invalid numeric operand: $resolved")
    resolved
  }

  private def listOperand(op: JsonNode, doc: JsonNode): ArrayNode = {
    val resolved =
      if (op.isArray) op
      else if (op.isObject && op.get("$IF_NOT_EXISTS") != null)
        resolveIfNotExists(op, doc)
      else if (op.isTextual) {
        val f = getField(doc, op.textValue())
        if (f == null) throw new IllegalArgumentException(
          "The provided expression refers to an attribute that does not " +
            s"exist in the item: ${op.textValue()}")
        f
      } else throw new IllegalArgumentException(
        s"Invalid operand for $$LIST_APPEND: $op")
    if (!resolved.isArray) throw new IllegalArgumentException(
      "An operand in the update expression has an incorrect data type")
    resolved.asInstanceOf[ArrayNode].deepCopy()
  }

  /** addNum/subtractNum: double if either is floating, else long if
    * either is long-valued, else int — the reference's promotion. */
  private def numNode(a: JsonNode, b: JsonNode, subtract: Boolean): JsonNode =
    if (a.isFloatingPointNumber || b.isFloatingPointNumber)
      F.numberNode(if (subtract) a.doubleValue() - b.doubleValue()
        else a.doubleValue() + b.doubleValue())
    else if (a.isLong || b.isLong)
      F.numberNode(if (subtract) a.longValue() - b.longValue()
        else a.longValue() + b.longValue())
    else
      F.numberNode(if (subtract) a.intValue() - b.intValue()
        else a.intValue() + b.intValue())

  /** ADD on an existing value: numeric addition or order-preserving set
    * union; DELETE: order-preserving set difference (null = remove the
    * field entirely when the set empties). */
  private def mergeAdd(cur: JsonNode, v: JsonNode): JsonNode =
    if (cur.isNumber && v.isNumber) numNode(cur, v, subtract = false)
    else if (isSet(cur) && isSet(v) && sameSetType(cur, v)) {
      val out = F.arrayNode()
      val seen = scala.collection.mutable.LinkedHashSet.empty[JsonNode]
      iter(cur.get("$set").elements()).foreach(seen += _)
      iter(v.get("$set").elements()).foreach(seen += _)
      seen.foreach(out.add)
      F.objectNode().set[ObjectNode]("$set", out)
    } else throw new IllegalArgumentException(
      "The document path provided in the update expression is invalid for update")

  private def deleteFromSet(cur: JsonNode, v: JsonNode): JsonNode =
    if (isSet(cur) && isSet(v) && sameSetType(cur, v)) {
      val remove = iter(v.get("$set").elements()).toSet
      val out = F.arrayNode()
      iter(cur.get("$set").elements()).filterNot(remove).foreach(out.add)
      if (out.size() == 0) null
      else F.objectNode().set[ObjectNode]("$set", out)
    } else throw new IllegalArgumentException(
      "The document path provided in the update expression is invalid for update")

  private def sameSetType(a: JsonNode, b: JsonNode): Boolean = {
    val ae = a.get("$set"); val be = b.get("$set")
    ae.size() == 0 || be.size() == 0 ||
      (ae.get(0).isTextual && be.get(0).isTextual) ||
      (ae.get(0).isNumber && be.get(0).isNumber)
  }

  /** Walk the dot/[n] path to the parent of the leaf and apply the op —
    * UpdateExpressionUtils.updateNestedField. Top-level single-segment
    * keys behave like the reference's direct-put/remove fast path
    * (SET/UNSET/ADD create missing top-level fields; nested paths whose
    * intermediate nodes are missing are invalid-path errors). */
  private def applyAtPath(doc: ObjectNode, path: String, op: String,
      newVal: JsonNode): Unit = {
    val top = doc.get(path)
    val simple = path.indexOf('.') < 0 && path.indexOf('[') < 0
    if (top != null || simple) {
      op match {
        case "SET" => doc.set[ObjectNode](path, newVal)
        case "UNSET" => doc.remove(path)
        case "ADD" =>
          if (top == null) doc.set[ObjectNode](path, newVal)
          else doc.set[ObjectNode](path, mergeAdd(top, newVal))
        case "DELETE" =>
          if (top != null) {
            val m = deleteFromSet(top, newVal)
            if (m == null) doc.remove(path)
            else doc.set[ObjectNode](path, m)
          }
      }
      return
    }
    // split the path into segments: field names and [idx]
    val segs = scala.collection.mutable.ListBuffer.empty[scala.util.Either[String, Int]]
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          if (sb.length > 0) { segs += scala.util.Left(sb.toString); sb.setLength(0) }
          i += 1
        case '[' =>
          if (sb.length > 0) { segs += scala.util.Left(sb.toString); sb.setLength(0) }
          i += 1
          var idx = 0
          if (i >= path.length || path.charAt(i) == ']')
            throw new IllegalArgumentException(s"empty array index in '$path'")
          while (i < path.length && path.charAt(i) != ']') {
            val c = path.charAt(i)
            if (c < '0' || c > '9') throw new IllegalArgumentException(
              s"non-numeric array index in '$path'")
            idx = idx * 10 + (c - '0'); i += 1
          }
          i += 1
          segs += scala.util.Right(idx)
        case c => sb.append(c); i += 1
      }
    }
    if (sb.length > 0) segs += scala.util.Left(sb.toString)
    var cur: JsonNode = doc
    segs.init.foreach { seg =>
      val next = (seg, cur) match {
        case (scala.util.Left(name), o: ObjectNode) => o.get(name)
        case (scala.util.Right(idx), a: ArrayNode) if idx < a.size() => a.get(idx)
        case _ => null
      }
      if (next == null) throw new IllegalArgumentException(
        "The document path provided in the update expression is invalid for update")
      cur = next
    }
    (segs.last, cur) match {
      case (scala.util.Left(name), parent: ObjectNode) =>
        val existing = parent.get(name)
        op match {
          case "SET" => parent.set[ObjectNode](name, newVal)
          case "UNSET" => parent.remove(name)
          case "ADD" =>
            if (existing == null) parent.set[ObjectNode](name, newVal)
            else parent.set[ObjectNode](name, mergeAdd(existing, newVal))
          case "DELETE" =>
            if (existing != null) {
              val m = deleteFromSet(existing, newVal)
              if (m == null) parent.remove(name)
              else parent.set[ObjectNode](name, m)
            }
        }
      case (scala.util.Right(idx), parent: ArrayNode) =>
        op match {
          case "SET" =>
            if (idx >= parent.size()) parent.add(newVal)
            else parent.set(idx, newVal)
          case "UNSET" => if (idx < parent.size()) parent.remove(idx)
          case "ADD" =>
            if (idx >= parent.size()) parent.add(newVal)
            else parent.set(idx, mergeAdd(parent.get(idx), newVal))
          case "DELETE" =>
            if (idx < parent.size()) {
              val m = deleteFromSet(parent.get(idx), newVal)
              if (m == null) parent.remove(idx)
              else parent.set(idx, m)
            }
        }
      case _ => throw new IllegalArgumentException(
        "The document path provided in the update expression is invalid for update")
    }
  }

  // ===================== row kernels =====================
  /** Evaluate a pre-compiled condition against a BSON binary. */
  def evalCondition(docBytes: Array[Byte],
      compiled: AnyRef): java.lang.Boolean = {
    val doc = BsonLite.decodeCached(docBytes)
    compiled match {
      case scala.util.Left(c: Compiled) => Boolean.box(evaluate(c, doc))
      case scala.util.Right(n: JsonNode) =>
        if (n.isEmpty) Boolean.box(true)
        else Boolean.box(evaluateDocStyle(n, doc))
      case _ => null
    }
  }

  /** Apply a pre-parsed update expression to a BSON binary → new BSON. */
  def evalUpdate(docBytes: Array[Byte], updateExpr: AnyRef): Array[Byte] = {
    val doc = BsonLite.decodeCached(docBytes)
    BsonLite.encode(applyUpdate(updateExpr.asInstanceOf[JsonNode], doc))
  }

  def parseUpdateDoc(json: String): JsonNode = {
    val n = mapper.readTree(json)
    require(n != null && n.isObject,
      s"BSON update expression must be a JSON object: $json")
    n
  }
}

/** BSON_CONDITION_EXPRESSION(bsonDoc, conditionJson) → BOOLEAN. The
  * condition argument is constant per the reference's function signature
  * (FunctionParseNode isConstant = true) — compiled once per query, the
  * per-row work is document decode (memoized) + AST walk. */
case class BsonConditionExpr(doc: Expression, cond: Expression)
    extends BinaryExpression {
  override def left: Expression = doc
  override def right: Expression = cond
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val compiled: AnyRef = {
    require(cond.foldable,
      "BSON_CONDITION_EXPRESSION requires a constant condition expression")
    cond.eval() match {
      case null => null
      case s: UTF8String => BsonConditionEval.compile(s.toString)
    }
  }

  override def nullSafeEval(d: Any, c: Any): Any =
    BsonConditionEval.evalCondition(d.asInstanceOf[Array[Byte]], compiled)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bsonCond", compiled, "java.lang.Object")
    nullSafeCodeGen(ctx, ev, (d, _) => {
      val r = ctx.freshName("condRes")
      s"""
      java.lang.Boolean $r =
        graft.functions.BsonConditionEval.evalCondition($d, $ref);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.booleanValue(); }"""
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BsonConditionExpr =
    copy(doc = l, cond = r)
  override def prettyName: String = "bson_condition_expression"
}

/** BSON_UPDATE_EXPRESSION(bsonDoc, updateJson) → BINARY (the updated
  * BSON document). Update document constant per query, like the
  * reference. */
case class BsonUpdateExpr(doc: Expression, update: Expression)
    extends BinaryExpression {
  override def left: Expression = doc
  override def right: Expression = update
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  @transient private lazy val parsedUpdate: AnyRef = {
    require(update.foldable,
      "BSON_UPDATE_EXPRESSION requires a constant update expression")
    update.eval() match {
      case null => null
      case s: UTF8String => BsonConditionEval.parseUpdateDoc(s.toString)
    }
  }

  override def nullSafeEval(d: Any, u: Any): Any =
    BsonConditionEval.evalUpdate(d.asInstanceOf[Array[Byte]], parsedUpdate)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bsonUpdate", parsedUpdate,
      "java.lang.Object")
    nullSafeCodeGen(ctx, ev, (d, _) => s"""
      ${ev.value} = graft.functions.BsonConditionEval.evalUpdate($d, $ref);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BsonUpdateExpr =
    copy(doc = l, update = r)
  override def prettyName: String = "bson_update_expression"
}
