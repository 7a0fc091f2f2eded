package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** BSON_CONDITION_EXPRESSION / BSON_UPDATE_EXPRESSION semantics against
  * the reference's SQLComparisonExpressionUtils /
  * DocumentComparisonExpressionUtils / UpdateExpressionUtils behavior
  * (condition grammar, type-strict comparisons, set ops, nested paths). */
class BsonConditionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def condOn(docJson: String, cond: String): Option[Boolean] = {
    GraftFunctions.register(spark)
    val r = spark.sql(
      s"""SELECT bson_condition_expression(to_bson('$docJson'), '$cond')"""
    ).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getBoolean(0))
  }

  private def updThen(docJson: String, upd: String, path: String,
      tpe: String): String = {
    GraftFunctions.register(spark)
    val r = spark.sql(
      s"""SELECT bson_value(bson_update_expression(to_bson('$docJson'),
         |'$upd'), '$path', '$tpe')""".stripMargin).collect()(0)
    if (r.isNullAt(0)) null else r.get(0).toString
  }

  private val doc =
    """{"Id": 101, "Title": "Book 101 Title", "ISBN": "111-1111111111",
      | "InPublication": true, "NestedMap1": {"ISBN": "111-1111111111",
      | "InPublication": false, "NList1": ["NListVal01", -0.00234, 10]},
      | "NestedList1": [-485.34, "1234abcd",
      |   ["xyz0123", {"InPublication": false}]],
      | "Tags": {"$set": ["Book", "Movie"]},
      | "Pi": 3.14, "Big": 5000000000}""".stripMargin.replace("\n", " ")

  test("SQL-style conditions: grammar, placeholders, key aliases") {
    def c(expr: String, vals: String, keys: String = null): Boolean = {
      val k = if (keys == null) "" else s""", "$$KEYS": $keys"""
      condOn(doc,
        s"""{"$$EXPR": "$expr", "$$VAL": $vals$k}""").get
    }
    assert(c("field_exists(Id)", "{}"))
    assert(c("attribute_exists(NestedMap1.ISBN)", "{}"))
    // dot AFTER an array index: the '.' must not descend on an empty
    // buffer (regression: cur.get("") nulled the walk, so every
    // 'arr[n].field' path silently read as missing)
    assert(c("field_exists(NestedList1[2][1].InPublication)", "{}"))
    assert(c("NestedList1[2][1].InPublication = :f", """{":f": false}"""))
    assert(!c("field_exists(NestedList1[2][1].Missing)", "{}"))
    assert(!c("field_exists(Missing)", "{}"))
    assert(c("field_not_exists(Missing)", "{}"))
    assert(c("Id = :id", """{":id": 101}"""))
    // type-strict equality: int32 101 != double 101.0
    assert(!c("Id = :id", """{":id": 101.0}"""))
    assert(c("Id <> :other", """{":other": 5}"""))
    assert(c("Pi < :four AND Pi >= :three",
      """{":four": 4.0, ":three": 3.0}"""))
    // string ordering
    assert(c("Title > :t", """{":t": "Book"}"""))
    assert(c("Id BETWEEN :lo AND :hi", """{":lo": 100, ":hi": 102}"""))
    assert(c("Id NOT BETWEEN :lo AND :hi", """{":lo": 200, ":hi": 300}"""))
    assert(c("ISBN IN (:a, :b)",
      """{":a": "zzz", ":b": "111-1111111111"}"""))
    assert(c("Missing NOT IN (:a)", """{":a": 1}"""))
    assert(c("begins_with(Title, :p)", """{":p": "Book 101"}"""))
    assert(!c("begins_with(Title, :p)", """{":p": "101"}"""))
    assert(c("contains(Title, :s)", """{":s": "101 T"}"""))
    assert(c("contains(NestedMap1.NList1, :v)", """{":v": 10}"""))
    assert(c("contains(Tags, :v)", """{":v": "Movie"}"""))
    assert(!c("contains(Tags, :v)", """{":v": "Song"}"""))
    assert(c("size(Title) = :n", """{":n": 14}"""))
    assert(c("size(Tags) = :n", """{":n": 2}"""))
    assert(c("size(Missing) = :n", """{":n": 0}"""))
    assert(c("field_type(Id, :t)", """{":t": "N"}"""))
    assert(c("field_type(Tags, :t)", """{":t": "SS"}"""))
    assert(c("field_type(NestedMap1, :t)", """{":t": "M"}"""))
    assert(c("field_type(NestedList1, :t)", """{":t": "L"}"""))
    assert(!c("field_type(Id, :t)", """{":t": "S"}"""))
    // nested array navigation + boolean combinators + parens
    assert(c("NestedList1[0] < :z AND (Id > :h OR NOT InPublication = :f)",
      """{":z": 0, ":h": 1000, ":f": false}"""))
    // NOT InPublication = :t where InPublication IS true
    assert(!c("NOT InPublication = :t", """{":t": true}"""))
    // key aliases (#ref → real path), longest-first substitution
    assert(c("#m.#i = :v",
      """{":v": "111-1111111111"}""",
      """{"#m": "NestedMap1", "#i": "ISBN"}"""))
    // missing LHS field → false, not an error
    assert(!c("Missing > :v", """{":v": 1}"""))
    // empty condition → true
    assert(condOn(doc, "").get)
  }

  test("binary (BSON 0x05): comparisons, begins_with, sets, field_type " +
      "(ComparisonExpressionUtilsTest binary rows)") {
    // "White"=V2hpdGU=, "Whit"=V2hpdA==, "Whitee"=V2hpdGVl — the
    // reference test's Bytes.toBytes fixtures
    val bdoc =
      """{"BinId": {"$binary": {"base64": "V2hpdGU=", "subType": "00"}},
        | "HiBit": {"$binary": {"base64": "gA=="}},
        | "Bins": {"$set": [{"$binary": {"base64": "V2hpdGU="}}]},
        | "Title": "Book"}""".stripMargin.replace("\n", " ")
    def c(expr: String, vals: String): Boolean =
      condOn(bdoc, s"""{"$$EXPR": "$expr", "$$VAL": $vals}""").get
    def bin(b64: String) = s"""{"$$binary": {"base64": "$b64"}}"""
    // ordered comparisons: White vs Whit / Whitee, as in the reference
    assert(c("BinId > :w", s"""{":w": ${bin("V2hpdA==")}}"""))
    assert(c("BinId >= :w", s"""{":w": ${bin("V2hpdA==")}}"""))
    assert(c("BinId < :we", s"""{":we": ${bin("V2hpdGVl")}}"""))
    assert(c("BinId <= :we", s"""{":we": ${bin("V2hpdGVl")}}"""))
    assert(c("BinId <> :we", s"""{":we": ${bin("V2hpdGVl")}}"""))
    assert(c("BinId = :self", s"""{":self": ${bin("V2hpdGU=")}}"""))
    assert(!c("BinId = :w", s"""{":w": ${bin("V2hpdA==")}}"""))
    // UNSIGNED lexicographic (Bytes.compareTo): 0x80 > 0x7F — a signed
    // byte compare would invert this
    assert(c("HiBit > :low", s"""{":low": ${bin("fw==")}}"""))
    // binary prefix begins_with; non-prefix false
    assert(c("begins_with(BinId, :p)", s"""{":p": ${bin("V2hpdA==")}}"""))
    assert(!c("begins_with(BinId, :p)", s"""{":p": ${bin("aGl0")}}"""))
    // binary-set contains + BS field_type + B field_type + byte size
    assert(c("contains(Bins, :v)", s"""{":v": ${bin("V2hpdGU=")}}"""))
    assert(!c("contains(Bins, :v)", s"""{":v": ${bin("V2hpdA==")}}"""))
    assert(c("field_type(BinId, :t)", """{":t": "B"}"""))
    assert(!c("field_type(BinId, :t)", """{":t": "M"}"""))
    assert(c("field_type(Bins, :t)", """{":t": "BS"}"""))
    assert(c("size(BinId) = :n", """{":n": 5}"""))
    // mixed type never satisfies an ordered comparison
    assert(!c("Title > :w", s"""{":w": ${bin("V2hpdA==")}}"""))
    // document-style spelling too
    assert(condOn(bdoc,
      s"""{"BinId": {"$$gt": ${bin("V2hpdA==")}}}""").get)
    // a malformed {"$binary": "..."} (string, not the object shape)
    // encodes as a plain document instead of NPE-ing
    assert(condOn("""{"a": {"$binary": "AAAA"}}""",
      """{"$EXPR": "field_exists(a.$binary)", "$VAL": {}}""").get)
    // a set carrier is NOT a document to the type system
    assert(!c("field_type(Bins, :t)", """{":t": "M"}"""),
      "field_type M must be false for a {$set: [...]} value")
    assert(!c("field_type(BinId, :t2)", """{":t2": "L"}"""))
  }

  test("document-style conditions: $eq/$lt/$exists/$and/$or") {
    assert(condOn(doc, """{"Id": {"$eq": 101}}""").get)
    assert(!condOn(doc, """{"Id": {"$eq": 102}}""").get)
    assert(condOn(doc, """{"Id": {"$gte": 101}, "Pi": {"$lt": 4.0}}""").get)
    assert(condOn(doc, """{"Missing": {"$exists": false}}""").get)
    assert(condOn(doc,
      """{"NestedMap1.InPublication": {"$eq": false}}""").get)
    assert(condOn(doc,
      """{"$or": [{"Id": {"$eq": 0}}, {"Id": {"$eq": 101}}]}""").get)
    assert(!condOn(doc,
      """{"$and": [{"Id": {"$eq": 101}}, {"Id": {"$eq": 0}}]}""").get)
    // missing field fails every comparison, including $ne
    assert(!condOn(doc, """{"Missing": {"$ne": 1}}""").get)
  }

  test("update: SET literals, arithmetic, if_not_exists, list_append") {
    // plain SET overwrite + new field
    assert(updThen(doc, """{"$SET": {"Id": 202}}""", "Id", "INTEGER") == "202")
    assert(updThen(doc, """{"$SET": {"NewF": "x"}}""", "NewF", "VARCHAR") == "x")
    // nested SET
    assert(updThen(doc, """{"$SET": {"NestedMap1.ISBN": "999"}}""",
      "NestedMap1.ISBN", "VARCHAR") == "999")
    // arithmetic referencing document paths
    assert(updThen(doc, """{"$SET": {"Total": {"$ADD": ["Id", 10]}}}""",
      "Total", "INTEGER") == "111")
    assert(updThen(doc, """{"$SET": {"D": {"$SUBTRACT": ["Pi", 0.14]}}}""",
      "D", "DOUBLE") == "3.0")
    // long promotion
    assert(updThen(doc, """{"$SET": {"B2": {"$ADD": ["Big", 1]}}}""",
      "B2", "BIGINT") == "5000000001")
    // if_not_exists: existing path keeps its value, missing takes fallback
    assert(updThen(doc,
      """{"$SET": {"Id": {"$IF_NOT_EXISTS": {"Id": -1}}}}""",
      "Id", "INTEGER") == "101")
    assert(updThen(doc,
      """{"$SET": {"Q": {"$IF_NOT_EXISTS": {"Missing": 7}}}}""",
      "Q", "INTEGER") == "7")
    // list_append of a doc path and a literal list
    assert(updThen(doc,
      """{"$SET": {"L": {"$LIST_APPEND": ["NestedMap1.NList1", ["z"]]}}}""",
      "L[3]", "VARCHAR") == "z")
  }

  test("update: UNSET, numeric ADD, set ADD/DELETE, array index ops") {
    assert(updThen(doc, """{"$UNSET": {"Title": null}}""",
      "Title", "VARCHAR") == null)
    assert(updThen(doc, """{"$UNSET": {"NestedMap1.ISBN": null}}""",
      "NestedMap1.ISBN", "VARCHAR") == null)
    // UNSET of an array element removes it (list shrinks)
    assert(updThen(doc, """{"$UNSET": {"NestedList1[0]": null}}""",
      "NestedList1[0]", "VARCHAR") == "1234abcd")
    // top-level numeric ADD on existing + missing fields
    assert(updThen(doc, """{"$ADD": {"Id": 5}}""", "Id", "INTEGER") == "106")
    assert(updThen(doc, """{"$ADD": {"Cnt": 3}}""", "Cnt", "INTEGER") == "3")
    // set union preserves first-seen order and dedups
    assert(updThen(doc,
      """{"$ADD": {"Tags": {"$set": ["Movie", "Song"]}}}""",
      "Tags.$set[2]", "VARCHAR") == "Song")
    // delete from set; deleting every element removes the field
    assert(updThen(doc,
      """{"$DELETE_FROM_SET": {"Tags": {"$set": ["Book"]}}}""",
      "Tags.$set[0]", "VARCHAR") == "Movie")
    assert(updThen(doc,
      """{"$DELETE_FROM_SET": {"Tags": {"$set": ["Book", "Movie"]}}}""",
      "Tags", "VARCHAR") == null)
    // SET at an index beyond the array appends
    assert(updThen(doc, """{"$SET": {"NestedMap1.NList1[9]": "tail"}}""",
      "NestedMap1.NList1[3]", "VARCHAR") == "tail")
  }

  test("review pins: operator dispatch, operand aliasing, malformed paths") {
    // doc-style spec with several operators evaluates only the FIRST in
    // $eq/$ne/$lt/$lte/$gt/$gte order — the reference's if/else-if
    // dispatch (DocumentComparisonExpressionUtils.java:72-86): Id=101
    // against {$gt:200,$lt:500} picks $lt and is TRUE despite $gt failing
    assert(condOn(doc, """{"Id": {"$gt": 200, "$lt": 500}}""").get)
    // ...so a real range must be written as $and (and works)
    assert(!condOn(doc,
      """{"$and": [{"Id": {"$gt": 200}}, {"Id": {"$lt": 500}}]}""").get)
    // $IF_NOT_EXISTS copies the source subtree: a later op in the SAME
    // update mutating the source must not leak into the copy
    assert(updThen(doc,
      """{"$SET": {"Backup": {"$IF_NOT_EXISTS": {"NestedMap1": 0}}},
         "$UNSET": {"NestedMap1.ISBN": null}}""".replace("\n", " "),
      "Backup.ISBN", "VARCHAR") == "111-1111111111")
    // malformed array indexes fail loudly (reference: Integer.parseInt),
    // not silently navigate index 72
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql(s"""SELECT bson_condition_expression(to_bson('$doc'),
        |'{"$$EXPR": "NestedList1[x] = :v", "$$VAL": {":v": 1}}')"""
        .stripMargin).collect()
    }
    assert(e.getMessage.contains("non-numeric array index"))
    val e2 = intercept[Exception] {
      spark.sql(s"""SELECT bson_value(bson_update_expression(
        |to_bson('$doc'), '{"$$SET": {"NestedList1[1x].a": 5}}'),
        |'Id', 'INTEGER')""".stripMargin).collect()
    }
    assert(e2.getMessage.contains("non-numeric array index"))
  }

  test("bson condition/update queries stay scan-local in codegen") {
    import org.apache.spark.sql.execution.ExplainMode
    // per-row work is a projection over the scan: no exchange may appear,
    // and the expressions must not break the whole-stage codegen span
    // (they emit static-kernel calls, not CodegenFallback)
    Seq("q_bson_condition", "q_bson_update").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), s"$q shuffles:\n$plan")
      assert(plan.contains("[codegen id :"), s"$q fell out of codegen:\n$plan")
      assert(!plan.contains("CodegenFallback"), s"$q has fallback:\n$plan")
    }
  }

  test("update: invalid paths and operand types fail loudly") {
    GraftFunctions.register(spark)
    def fails(upd: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"""SELECT bson_value(bson_update_expression(
          |to_bson('$doc'), '$upd'), 'Id', 'INTEGER')""".stripMargin)
          .collect()
      }
      assert(e.getMessage != null)
    }
    fails("""{"$SET": {"Missing.Deep.Path": 1}}""") // missing intermediates
    fails("""{"$ADD": {"Title": 5}}""") // ADD on a string field
    fails("""{"$ADD": {"Id": "x"}}""") // ADD value neither number nor set
    fails("""{"$DELETE_FROM_SET": {"Id": {"$set": [1]}}}""") // not a set
  }

  test("condition parser robustness: garbage throws TYPED errors, deep " +
      "nesting is bounded (no StackOverflow), valid nesting still works") {
    import graft.functions.BsonConditionEval
    def exprJson(e: String): String = {
      val esc = e.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"$$EXPR": "$esc", "$$VAL": {":v": 1}}"""
    }
    // 2000 seeded-random token soups: every outcome is either a parse
    // or a typed IllegalArgumentException — never an NPE, ClassCast, or
    // StackOverflowError escaping to the caller
    val rng = new scala.util.Random(0xB50FF)
    val tokens = Seq("field_exists", "(", ")", "AND", "OR", "NOT", "a.b",
      ":v", "#k", "=", "<", ">=", "<>", "BETWEEN", "IN", ",", "size",
      "begins_with", "!", "", " ")
    for (_ <- 1 to 2000) {
      val e = (1 to (1 + rng.nextInt(12)))
        .map(_ => tokens(rng.nextInt(tokens.length))).mkString(" ")
      try BsonConditionEval.compile(exprJson(e))
      catch { case _: IllegalArgumentException => () }
    }
    // a degenerate '((((...' used to StackOverflow — an ERROR, killing
    // the executor thread; now a typed depth error
    val deep = "(" * 100000 + "field_exists(a)" + ")" * 100000
    val eDeep = intercept[IllegalArgumentException] {
      BsonConditionEval.compile(exprJson(deep))
    }
    assert(eDeep.getMessage.contains("nesting too deep"))
    // legitimate nesting well under the bound still parses and evaluates
    val ok = "(".*(50) + "field_exists(Id)" + ")".*(50)
    val r = spark.sql(
      s"""SELECT bson_condition_expression(to_bson('{"Id": 1}'),
         |'${exprJson(ok).replace("'", "''")}')""".stripMargin).collect()
    assert(r.head.getBoolean(0))
  }
}
