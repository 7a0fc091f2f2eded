package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BinaryCodec, DateRound, GraftFunctions}

/** Unit coverage for the round-2 expression additions: date ROUND/CEIL/
  * FLOOR units (reference RoundDateExpression + Joda-field variants),
  * ENCODE_BINARY/DECODE_BINARY formats, JSON_QUERY/EXISTS/MODIFY paths. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def ts1(expr: org.apache.spark.sql.Column, in: String): String = {
    import spark.implicits._
    Seq(Tuple1(java.sql.Timestamp.valueOf(in))).toDF("ts")
      .select(expr.cast("string")).collect()(0).getString(0)
  }

  test("date round/ceil/floor: fixed units are half-up in epoch space") {
    import spark.implicits._
    // RoundDateExpression.roundTime: (t + unit/2) / unit * unit
    assert(ts1(DateRound.roundDate($"ts", "HOUR"), "2024-03-15 10:29:59.999")
      == "2024-03-15 10:00:00")
    assert(ts1(DateRound.roundDate($"ts", "HOUR"), "2024-03-15 10:30:00")
      == "2024-03-15 11:00:00") // exact midpoint rounds UP
    assert(ts1(DateRound.ceilDate($"ts", "DAY"), "2024-03-15 00:00:00")
      == "2024-03-15 00:00:00") // exact boundary stays
    assert(ts1(DateRound.ceilDate($"ts", "DAY"), "2024-03-15 00:00:00.001")
      == "2024-03-16 00:00:00")
    assert(ts1(DateRound.floorDate($"ts", "MINUTE"), "2024-03-15 10:29:59")
      == "2024-03-15 10:29:00")
  }

  test("date round: calendar units pick nearer boundary, half-even ties") {
    import spark.implicits._
    // week starts Monday (2024-03-11 and 2024-03-18)
    assert(ts1(DateRound.floorDate($"ts", "WEEK"), "2024-03-15 10:00:00")
      == "2024-03-11 00:00:00")
    assert(ts1(DateRound.ceilDate($"ts", "WEEK"), "2024-03-15 10:00:00")
      == "2024-03-18 00:00:00")
    assert(ts1(DateRound.roundDate($"ts", "WEEK"), "2024-03-12 00:00:00")
      == "2024-03-11 00:00:00")
    assert(ts1(DateRound.roundDate($"ts", "WEEK"), "2024-03-17 00:00:00")
      == "2024-03-18 00:00:00")
    // exact week midpoint (Thursday 12:00) → even ISO week number wins:
    // weeks 11 (starts 03-11) vs 12; midpoint 2024-03-14 12:00 → week 12
    assert(ts1(DateRound.roundDate($"ts", "WEEK"), "2024-03-14 12:00:00")
      == "2024-03-18 00:00:00")
    // months: April (30 days) midpoint = 04-16 00:00; April (4) is even
    assert(ts1(DateRound.roundDate($"ts", "MONTH"), "2024-04-16 00:00:00")
      == "2024-04-01 00:00:00")
    assert(ts1(DateRound.roundDate($"ts", "MONTH"), "2024-04-16 00:00:00.001")
      == "2024-05-01 00:00:00")
    assert(ts1(DateRound.roundDate($"ts", "YEAR"), "2024-11-30 00:00:00")
      == "2025-01-01 00:00:00")
  }

  test("binary codec formats match the reference escaping") {
    val bytes = Array[Byte](0x00, 0x41, 0x5c, 0x7f.toByte, 0xff.toByte)
    // HEX is lowercase (HBase Bytes.toHex)
    assert(BinaryCodec.encode(bytes, "HEX").toString == "00415c7fff")
    // HBASE: printable ASCII except backslash literal, else \xHH uppercase
    assert(BinaryCodec.encode(bytes, "HBASE").toString ==
      "\\x00A\\x5C\\x7F\\xFF")
    for (fmt <- Seq("HEX", "BASE64", "HBASE"))
      assert(BinaryCodec.decode(
        BinaryCodec.encode(bytes, fmt).toString, fmt).sameElements(bytes),
        s"roundtrip failed for $fmt")
    intercept[IllegalArgumentException] { BinaryCodec.encode(bytes, "NOPE") }
  }

  test("phoenix decimal division derives reference precision/scale") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // DECIMAL(5,2) / DECIMAL(4,1): scale = max(38-5+2-1, 0)=34,
    // precision = min(38, 34+5-2+4)=38; quotient truncated to scale 34
    val df = Seq(("123.45", "2.5"), ("10.00", "3.0")).toDF("a", "b")
      .select($"a".cast("decimal(5,2)").as("a"),
        $"b".cast("decimal(4,1)").as("b"))
    val out = df.select(call_function("phoenix_decimal_div", $"a", $"b"))
    assert(out.schema.head.dataType == org.apache.spark.sql.types
      .DecimalType(38, 34))
    val vals = out.collect().map(_.getDecimal(0).toPlainString)
    assert(vals(0) == "49.3800000000000000000000000000000000")
    // 10/3 truncates (ROUND_DOWN) at the derived scale, Phoenix-style
    assert(vals(1) == "3.3333333333333333333333333333333333")
    // overflow of the derived width errors like DataExceedsCapacityException:
    // DECIMAL(38,0)/DECIMAL(12,12) derives (38,0); 38 nines / 1e-12 has 50
    // integer digits
    val wide = Seq(("9" * 38, "0.000000000001"))
      .toDF("a", "b")
      .select($"a".cast("decimal(38,0)").as("a"),
        $"b".cast("decimal(12,12)").as("b"))
    intercept[ArithmeticException] {
      wide.select(call_function("phoenix_decimal_div", $"a", $"b")).collect()
    }
  }

  test("bson codec roundtrips and navigates with typed returns") {
    import spark.implicits._
    import graft.functions.BsonLite
    GraftFunctions.register(spark)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val json = """{"s":"hi","i":42,"l":9999999999,"d":1.5,"b":true,
      "nul":null,"o":{"xs":[1,"two",{"deep":"v"}]}}""".replace("\n      ", "")
    // roundtrip through the wire format preserves the tree
    assert(BsonLite.decode(BsonLite.encode(mapper.readTree(json)))
      == mapper.readTree(json))
    val df = Seq(Tuple1(json)).toDF("j")
      .select(call_function("to_bson", col("j")).as("b"))
    def bv(path: String, t: String) =
      df.select(call_function("bson_value", col("b"), lit(path), lit(t)))
        .collect()(0)
    assert(bv("s", "VARCHAR").getString(0) == "hi")
    assert(bv("i", "INTEGER").getInt(0) == 42)
    assert(bv("l", "BIGINT").getLong(0) == 9999999999L)
    assert(bv("d", "DOUBLE").getDouble(0) == 1.5)
    assert(bv("b", "BOOLEAN").getBoolean(0))
    assert(bv("nul", "VARCHAR").isNullAt(0))
    assert(bv("o.xs[1]", "VARCHAR").getString(0) == "two")
    assert(bv("o.xs[2].deep", "VARCHAR").getString(0) == "v")
    assert(bv("o.xs", "VARCHAR").getString(0) == """[1,"two",{"deep":"v"}]""")
    assert(bv("nope.nope", "VARCHAR").isNullAt(0))
    // BSON_VALUE_TYPE → Phoenix SQL type names (BsonValueTypeFunction)
    def tp(path: String): String =
      df.select(call_function("bson_value_type", col("b"), lit(path)))
        .collect()(0).getString(0)
    assert(tp("s") == "VARCHAR" && tp("i") == "INTEGER" &&
      tp("l") == "BIGINT" && tp("d") == "DOUBLE" && tp("b") == "BOOLEAN" &&
      tp("o") == "BSON" && tp("o.xs") == "BSON" && tp("nul") == "NULL" &&
      tp("nope") == "NULL")
    // valid JSON with a non-object root → NULL, not a task crash
    for (bad <- Seq("42", "[1,2]", "null", "\"str\""))
      assert(Seq(Tuple1(bad)).toDF("j")
        .select(call_function("to_bson", col("j"))).collect()(0).isNullAt(0),
        s"to_bson('$bad') must be NULL")
  }

  test("word_shingles skips null words like concat_ws") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS w")
    val r = df.select(
      call_function("word_shingles", col("w"), lit(2)).as("f"),
      graft.operators.Dedup.shinglesFromWords(col("w"), 2).as("c"))
      .collect()(0)
    assert(r.getSeq[String](0) == r.getSeq[String](1),
      s"fused ${r.getSeq[String](0)} != composed ${r.getSeq[String](1)}")
  }

  test("json query/exists/modify navigate nested and array paths") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val j = """{"a":{"b":[1,2,{"c":"x"}]},"d":null}"""
    val df = Seq(Tuple1(j)).toDF("j")
    def f(name: String, args: org.apache.spark.sql.Column*) =
      df.select(call_function(name, args: _*)).collect()(0)
    assert(f("json_query", $"j", lit("$.a.b")).getString(0) ==
      """[1,2,{"c":"x"}]""")
    assert(f("json_query", $"j", lit("$.a.b[2].c")).getString(0) == "\"x\"")
    assert(f("json_query", $"j", lit("$.a.z")).isNullAt(0))
    assert(f("json_exists", $"j", lit("$.a.b[1]")).getBoolean(0))
    assert(!f("json_exists", $"j", lit("$.a.b[9]")).getBoolean(0))
    assert(f("json_exists", $"j", lit("$.d")).getBoolean(0)) // null exists
    assert(f("json_modify", $"j", lit("$.a.b[1]"), lit("42")).getString(0)
      == """{"a":{"b":[1,42,{"c":"x"}]},"d":null}""")
    assert(f("json_modify", $"j", lit("$.a.b[2].c"), lit("\"y\""))
      .getString(0) == """{"a":{"b":[1,2,{"c":"y"}]},"d":null}""")
    // structural mismatch → NULL
    assert(f("json_modify", $"j", lit("$.z.q"), lit("1")).isNullAt(0))
    // malformed input → NULL
    assert(Seq(Tuple1("{oops")).toDF("j")
      .select(call_function("json_query", $"j", lit("$.a")))
      .collect()(0).isNullAt(0))
  }

  test("round-5/6 review fixes: union widening, optional args, NaN, edges") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    GraftFunctions.register(spark)
    // decimal widening caps at 38 digits instead of crashing the
    // DecimalType constructor
    assert(graft.operators.SetOps.widen(DecimalType(38, 0),
      DecimalType(10, 10)) == DecimalType(38, 0))
    // BIGINT + DECIMAL reconciles to DECIMAL (exact), never DOUBLE —
    // 2^53+1 must survive the union bit-exactly
    val big = 9007199254740993L
    val u = graft.operators.SetOps.unionAllReconciled(Seq(
      Seq(Tuple1(big)).toDF("v"),
      Seq(Tuple1(java.math.BigDecimal.ONE)).toDF("v")))
    assert(u.schema("v").dataType.isInstanceOf[DecimalType])
    assert(u.collect().map(_.getDecimal(0).longValueExact()).toSet ===
      Set(big, 1L))
    // 2-arg REGEXP_SUBSTR defaults the offset like the reference
    assert(spark.sql("SELECT regexp_substr('na1-appsrv35', '[^-]+')")
      .head().getString(0) == "na1")
    // native Spark trunc(date,'MONTH') keeps its DateType contract;
    // the Phoenix timestamp arm still answers for timestamps
    val tr = spark.sql("SELECT trunc(DATE'2026-08-13', 'MONTH') AS d, " +
      "trunc(TIMESTAMP'2026-08-13 11:22:33', 'DAY') AS t").head()
    assert(tr.getDate(0).toString == "2026-08-01")
    assert(tr.getTimestamp(1).toString == "2026-08-13 00:00:00.0")
    // top_scored drops NaN scores (same rule as top_scored_id)
    val ts = Seq(("a", 1.0), ("b", Double.NaN), ("c", 2.0))
      .toDF("t", "s").repartition(3)
      .agg(call_function("top_scored", $"t", $"s", lit(2)).as("top"))
      .select(explode($"top").as("e")).select($"e.term")
      .collect().map(_.getString(0)).toSeq
    assert(ts == Seq("c", "a"))
    // bloom_build rejects non-BIGINT keys at analysis, like the probe
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1, 2).toDF("k")
        .agg(call_function("bloom_build", $"k", lit(1024), lit(3)))
        .collect()
    }
    assert(ex.getMessage.contains("BIGINT"))
    // json_modify of the root path is a structural mismatch → NULL
    assert(spark.sql("SELECT json_modify('{\"a\":1}', '$', '2')")
      .head().isNullAt(0))
    // string_to_array with '' splits by CODE POINT, not UTF-16 char
    val emo = spark.sql("SELECT string_to_array('😀x😁', '', NULL)")
      .head().getSeq[String](0)
    assert(emo == Seq("😀", "x", "😁"), s"got $emo")
  }

  test("json family survives codegen + task serialization (non-foldable)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // single-row literal frames constant-fold on the driver, so they never
    // exercise the generated code path or the serialization of the
    // expressions' reference objects (round 6: a non-serializable path
    // cache passed every literal test and failed only on real columns).
    // Build the document FROM a column, repartition to force task ship.
    val df = spark.range(200).select(
      concat(lit("{\"a\":{\"b\":"), $"id".cast("string"),
        lit(",\"c\":[\"t\",\"u\"]},\"d\":null}")).as("j"),
      $"id")
      .repartition(4)
    val r = df.select($"id",
        call_function("json_value", $"j", lit("$.a.b")).as("jv"),
        call_function("json_query", $"j", lit("$.a.c")).as("jq"),
        call_function("json_exists", $"j", lit("$.d")).as("je"),
        call_function("json_modify", $"j", lit("$.a.b"), lit("0")).as("jm"))
      .collect()
    assert(r.length == 200)
    r.foreach { row =>
      val id = row.getLong(0)
      assert(row.getString(1) == id.toString)
      assert(row.getString(2) == """["t","u"]""")
      assert(row.getBoolean(3))
      assert(row.getString(4) ==
        """{"a":{"b":0,"c":["t","u"]},"d":null}""")
    }
    // and the plan stays inside whole-stage codegen (no fallback split) —
    // AQE finalizes stages on execution, so inspect after the action
    val q = df.select(call_function("json_value", $"j", lit("$.a.b")))
    q.collect()
    // the `*(n)` prefix is the WholeStageCodegen marker in plan strings
    // (AQE query-stage wrappers hide the exec nodes from collect())
    val plan = q.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[json_value".r.findFirstIn(plan).nonEmpty,
      s"json_value must run inside WholeStageCodegen:\n$plan")
  }

  test("bson family survives codegen + task serialization (non-foldable)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // same shape as the json test above: build the document FROM a column
    // and repartition, so the generated code path and the executor-side
    // decode memo actually run (literal frames constant-fold on the
    // driver and prove nothing)
    val df = spark.range(200).select(
      call_function("to_bson",
        concat(lit("{\"a\":{\"b\":"), $"id".cast("string"),
          lit("},\"s\":\"x\",\"f\":true}"))).as("b"),
      $"id")
      .repartition(4)
    val r = df.select($"id",
        call_function("bson_value", $"b", lit("a.b"), lit("BIGINT")).as("v"),
        call_function("bson_value", $"b", lit("s"), lit("VARCHAR")).as("s"),
        call_function("bson_value", $"b", lit("f"), lit("BOOLEAN")).as("f"),
        // type-mismatched arm must NULL, not zero, through codegen too
        call_function("bson_value", $"b", lit("s"), lit("INTEGER")).as("m"),
        call_function("bson_value_type", $"b", lit("a.b")).as("t"))
      .collect()
    assert(r.length == 200)
    r.foreach { row =>
      val id = row.getLong(0)
      assert(row.getLong(1) == id)
      assert(row.getString(2) == "x")
      assert(row.getBoolean(3))
      assert(row.isNullAt(4))
      // int32 vs int64 depends on jackson's parse of the literal digits
      assert(row.getString(5) == "INTEGER" || row.getString(5) == "BIGINT")
    }
    val q = df.select(call_function("bson_value", $"b", lit("a.b"),
      lit("BIGINT")))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[bson_value".r.findFirstIn(plan).nonEmpty,
      s"bson_value must run inside WholeStageCodegen:\n$plan")
  }

  test("bson read kernels yield NULL per row on corrupt documents") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // a truncated document must NULL that row, not kill the task (same
    // contract as to_bson on malformed JSON and the JsonOps family)
    val df = spark.range(20).select($"id",
        call_function("to_bson",
          concat(lit("{\"a\":"), $"id".cast("string"), lit("}"))).as("b0"))
      .select($"id",
        when($"id" % 2 === 0, expr("substring(b0, 1, 4)")).otherwise($"b0")
          .as("b"))
      .repartition(2)
    val r = df.select($"id",
        call_function("bson_value", $"b", lit("a"), lit("BIGINT")).as("v"),
        call_function("bson_value_type", $"b", lit("a")).as("t"))
      .collect()
    assert(r.length == 20)
    r.foreach { row =>
      if (row.getLong(0) % 2 == 0) {
        assert(row.isNullAt(1))
        assert(row.getString(2) == "NULL")
      } else {
        assert(row.getLong(1) == row.getLong(0))
        assert(row.getString(2) == "INTEGER" || row.getString(2) == "BIGINT")
      }
    }
  }

  test("shingle/minhash/simhash kernels survive codegen + serialization") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import graft.functions.{MinHashSignature, SimHashOps}
    GraftFunctions.register(spark)
    // non-foldable column input through a repartition, like the json/bson
    // tests above — literal frames constant-fold and skip codegen entirely
    val df = spark.range(100).select($"id",
        split(concat(lit("a"), $"id".cast("string"), lit(" b c d e")), " ")
          .as("w"))
      .repartition(4)
    val r = df
      .select($"id", call_function("word_shingles", $"w", lit(2)).as("sh"))
      .select($"id", $"sh",
        call_function("minhash_signature", $"sh", lit(16)).as("sig"),
        expr("transform(sh, x -> xxhash64(x))").as("hs"),
        call_function("simhash64",
          expr("transform(sh, x -> xxhash64(x))")).as("sim"))
      .collect()
    assert(r.length == 100)
    r.foreach { row =>
      val id = row.getLong(0)
      assert(row.getSeq[String](1) == Seq(s"a$id b", "b c", "c d", "d e"))
      // interp-vs-codegen equivalence: the interpreted eval of the same
      // expression over the same shingles must produce the same signature
      val expSig = MinHashSignature(
          Literal.create(row.getSeq[String](1), ArrayType(StringType)), 16)
        .eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
      assert(row.getSeq[Long](2) == expSig)
      val expSim = SimHashOps.simhash(
        new GenericArrayData(row.getSeq[Long](3).toArray[Long]))
      assert(row.getLong(4) == expSim)
    }
    // word_shingles is a DELIBERATE CodegenFallback (fusion barrier — see
    // its scaladoc: codegen-ability let WSCG inline the kernel into fused
    // downstream stages, doubling invocations and the minhash pipelines'
    // time). Pin the barrier so a well-meaning conversion re-measures:
    assert(graft.functions.WordShingles(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 2)
      .isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback],
      "word_shingles must stay CodegenFallback — see its scaladoc before changing")
    // the codegen pin goes on minhash_signature over a materialized
    // shingle column (exchange keeps the projections apart)
    val q = df.select(call_function("word_shingles", $"w", lit(2)).as("sh"))
      .repartition(2)
      .select(call_function("minhash_signature", $"sh", lit(16)))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[minhash_signature".r.findFirstIn(plan).nonEmpty,
      s"minhash_signature must run inside WholeStageCodegen:\n$plan")
  }

  test("Spark `div` matches Phoenix integer `/` (truncation toward zero)") {
    // documented divergence (COVERAGE §2.8): Phoenix LongDivideExpression
    // is Java long division; Spark's `/` is true division but `div` is
    // the exact Phoenix equivalent, including negative operands
    val r = spark.sql(
      "SELECT 5 div 2, -5 div 2, 5 div -2, CAST(5 / 2 AS DOUBLE)").collect()(0)
    assert(r.getLong(0) == 5L / 2L)
    assert(r.getLong(1) == -5L / 2L) // -2: toward zero, like Java
    assert(r.getLong(2) == 5L / -2L)
    assert(r.getDouble(3) == 2.5)
  }

  test("GET/SET_BYTE and GET/SET_BIT follow PBinaryBase semantics") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 0x80 reads back signed (-128); offsets wrap modulo length
    val df = Seq(Tuple1(Array[Byte](1, -128, 7))).toDF("b")
    def f(name: String, args: org.apache.spark.sql.Column*) =
      df.select(call_function(name, args: _*)).collect()(0)
    assert(f("get_byte", $"b", lit(1)).getInt(0) == -128)
    assert(f("get_byte", $"b", lit(-1)).getInt(0) == 7)
    assert(f("get_byte", $"b", lit(4)).getInt(0) == -128) // 4 % 3
    // bits are LSB-first: byte 0 = 0x01 → bit 0 set, bit 1 clear;
    // offset 24 wraps to bit 0
    assert(f("get_bit", $"b", lit(0)).getInt(0) == 1)
    assert(f("get_bit", $"b", lit(1)).getInt(0) == 0)
    assert(f("get_bit", $"b", lit(15)).getInt(0) == 1) // sign bit of 0x80
    assert(f("get_bit", $"b", lit(24)).getInt(0) == 1)
    assert(f("set_byte", $"b", lit(1), lit(65)).getAs[Array[Byte]](0)
      .sameElements(Array[Byte](1, 65, 7)))
    assert(f("set_bit", $"b", lit(1), lit(1)).getAs[Array[Byte]](0)
      .sameElements(Array[Byte](3, -128, 7)))
    assert(f("set_bit", $"b", lit(0), lit(0)).getAs[Array[Byte]](0)
      .sameElements(Array[Byte](0, -128, 7)))
    // reference SetBitFunction masks the value with 0x1: SET_BIT(b,0,2)
    // CLEARS bit 0 (2 & 1 == 0), it does not set it
    assert(f("set_bit", $"b", lit(0), lit(2)).getAs[Array[Byte]](0)
      .sameElements(Array[Byte](0, -128, 7)))
    assert(f("set_bit", $"b", lit(1), lit(3)).getAs[Array[Byte]](0)
      .sameElements(Array[Byte](3, -128, 7)))
    // empty binary → NULL (reference returns the empty pointer)
    assert(Seq(Tuple1(Array.empty[Byte])).toDF("b")
      .select(call_function("get_byte", $"b", lit(0)))
      .collect()(0).isNullAt(0))
  }

  test("Phoenix function spellings run unmodified through spark.sql") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(Tuple1("a b c")).toDF("t").createOrReplaceTempView("fn_probe")
    val r = spark.sql("""
      SELECT ARRAY_ELEM(REGEXP_SPLIT(t, '\\s+'), 1) AS first_tok,
             ARRAY_LENGTH(REGEXP_SPLIT(t, '\\s+')) AS n,
             JSON_VALUE('{"a":{"b":7,"c":[1,2]},"d":null}', '$.a.b') AS jv,
             JSON_VALUE('{"a":{"b":7,"c":[1,2]},"d":null}', '$.a.c[0]')
               AS jv_idx,
             JSON_VALUE('{"a":{"b":7}}', '$.a') AS jv_obj,
             JSON_VALUE('{"d":null}', '$.d') AS jv_null
      FROM fn_probe""").collect()(0)
    assert(r.getString(0) == "a") // ARRAY_ELEM is 1-based
    assert(r.getInt(1) == 3)
    assert(r.getString(2) == "7")
    assert(r.getString(3) == "1")
    assert(r.isNullAt(4), "JSON_VALUE of an object is NULL (scalar-only)")
    assert(r.isNullAt(5), "JSON_VALUE of JSON null is NULL")
  }

  test("ROUND/CEIL/FLOOR/TRUNC unit dispatch vs numeric fallback") {
    GraftFunctions.register(spark)
    def one(sql: String): String =
      spark.sql(s"SELECT CAST(($sql) AS STRING) AS v").collect()(0)
        .getString(0)
    val t = "TIMESTAMP'2013-05-17 13:45:31'"
    // date forms (reference RoundDateExpression semantics)
    assert(one(s"ROUND($t, 'HOUR')") == "2013-05-17 14:00:00")
    assert(one(s"FLOOR($t, 'HOUR')") == "2013-05-17 13:00:00")
    assert(one(s"CEIL($t, 'HOUR')") == "2013-05-17 14:00:00")
    assert(one(s"TRUNC($t, 'DAY')") == "2013-05-17 00:00:00")
    // fixed-unit multiplier: ROUND(ts,'MINUTE',15) snaps to 13:45
    assert(one(s"ROUND($t, 'MINUTE', 15)") == "2013-05-17 13:45:00")
    assert(one(s"CEIL($t, 'MINUTE', 15)") == "2013-05-17 14:00:00")
    assert(one(s"FLOOR($t, 'MINUTE', 15)") == "2013-05-17 13:45:00")
    // numeric fallbacks keep Spark's behavior under the shadowed names
    assert(one("ROUND(2.5)") == "3")
    assert(one("ROUND(2.345, 2)") == "2.35")
    assert(one("CEIL(2.1)") == "3")
    assert(one("FLOOR(-2.1)") == "-3")
    assert(one("TRUNC(DATE'2013-05-17', 'MM')") == "2013-05-01")
    // calendar units reject a multiplier (reference: fixed-width only)
    intercept[Exception] { one(s"ROUND($t, 'MONTH', 2)") }
  }

  test("ENCODE/DECODE dispatch: Phoenix formats vs Spark charsets") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT ENCODE(123456789, 'BASE62') AS b62,
             DECODE('0a0b', 'HEX') AS hex_bytes,
             ENCODE('hi', 'UTF-8') AS spark_enc,
             DECODE(ENCODE('hi', 'UTF-8'), 'UTF-8') AS spark_rt
    """).collect()(0)
    assert(r.getString(0) == "8M0kX") // reference Base62EncodeFunctionIT value
    assert(r.getAs[Array[Byte]](1).sameElements(Array[Byte](0x0a, 0x0b)),
      "DECODE(...,'HEX') must produce bytes like the reference")
    assert(r.getString(3) == "hi", "Spark's charset decode must still work")
  }

  test("registerKernels touches no Spark-builtin name: trunc keeps " +
      "Spark semantics until the dialect is explicitly registered") {
    // newSession() shares the context but gets a FRESH function
    // registry — the isolation this test needs (the main test session
    // has the dialect registered by other suites)
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.registerKernels(s2)
    // kernels are available...
    assert(s2.sql("SELECT cosine_sim(array(1.0d, 0d), array(1.0d, 0d))")
      .collect()(0).getDouble(0) == 1.0)
    // ...but trunc is still SPARK's: DATE result, date-format 'MM'
    // (the Phoenix arm returns a TIMESTAMP at the month start — an
    // operator pulling in kernels must not flip SQL semantics for a
    // session that never opted into the dialect)
    val t = s2.sql("SELECT trunc(DATE '2024-03-15', 'MM')")
    assert(t.schema.head.dataType ==
      org.apache.spark.sql.types.DateType,
      s"trunc must keep Spark's DATE semantics: ${t.schema}")
    assert(t.collect()(0).getDate(0).toString == "2024-03-01")
    // the dialect registration adds the Phoenix arm (a TIMESTAMP input
    // truncs to the timestamp month start; DATE inputs deliberately
    // keep Spark's native form even under the dialect)
    graft.functions.GraftFunctions.register(s2)
    assert(s2.sql("SELECT trunc(TIMESTAMP '2024-03-15 10:30:00', 'MONTH')")
      .schema.head.dataType ==
      org.apache.spark.sql.types.TimestampType)
    // and a wrong-arity dialect call fails with the function name, not
    // an IndexOutOfBoundsException
    val ae = intercept[Exception](
      s2.sql("SELECT encode(1)").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ae).exists(m => m.contains("encode") &&
      m.contains("2 arguments")), s"got: ${msgs(ae)}")
  }

  test("round-9 kernel sweep pins: pre-epoch date rounding, locale " +
      "independence, int8 clamp, dim guards, url '#' edge, base62 " +
      "empties, null list elements, first_values NULL on empty") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // pre-1970: the reference's roundTime uses Java TRUNCATING division,
    // so negative-epoch inputs snap TOWARD zero (FLOOR of 18:00 on
    // New Year's Eve 1969 is 1970-01-01 — Phoenix's arithmetic, not a
    // mathematical floor). pmod's floor-mod diverged here.
    assert(ts1(DateRound.floorDate($"ts", "DAY"), "1969-12-31 18:00:00")
      == "1970-01-01 00:00:00")
    assert(ts1(DateRound.roundDate($"ts", "SECOND"), "1969-12-31 23:59:58.7")
      == "1970-01-01 00:00:00")
    // and post-1970 is unchanged by the % form
    assert(ts1(DateRound.floorDate($"ts", "DAY"), "2024-03-15 18:00:00")
      == "2024-03-15 00:00:00")
    // locale pinned: force a German default (',' decimal separator,
    // German month names) — to_number/to_char must be unaffected
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val row = spark.sql(
        "SELECT to_number('1,234.56', '#,##0.00'), " +
          "to_char(TIMESTAMP '2024-03-15 00:00:00', 'MMM yyyy')").collect()(0)
      assert(row.getDouble(0) == 1234.56,
        "to_number must parse '.' as the decimal separator on any JVM")
      assert(row.getString(1) == "Mar 2024",
        "to_char month names must be English on any JVM")
    } finally java.util.Locale.setDefault(saved)
    // int8_quantize saturates instead of wrapping .toByte
    val q = spark.sql(
      "SELECT int8_quantize(array(2.0d, -2.0d, 0.5d), 0.01d)").collect()(0)
      .getAs[Array[Byte]](0)
    assert(q.toSeq == Seq[Byte](127, -128, 50),
      s"out-of-range elements must clip, not wrap sign: ${q.toSeq}")
    // short vector vs dim fails loudly (was a silent unsafe read)
    val de = intercept[Exception](spark.sql(
      "SELECT ivf_cell(array(1.0d, 2.0d), array(0.0d, 0.0d, 0.0d), 3)")
      .collect())
    assert(de.getMessage.contains("ivf_cell") ||
      Option(de.getCause).exists(_.getMessage.contains("ivf_cell")))
    // '#' before '://' means the separator is inside a fragment of a
    // non-URL: returned unchanged, not truncated to a collision-prone
    // prefix
    assert(spark.sql("SELECT canonical_url('a#b://c')").collect()(0)
      .getString(0) == "a#b://c")
    // base62 inputs with no digits error like other malformed input
    // (returning 0 made '' and '-' collide with decode('0'))
    Seq("''", "'-'").foreach { in =>
      val be = intercept[Exception](
        spark.sql(s"SELECT base62_decode($in)").collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(be).exists(_.contains("base62")),
        s"decode($in) must raise a base62 error, got: ${msgs(be)}")
    }
    // NULL elements in a foldable phrase/merge list fail at ANALYSIS
    val ae = intercept[Exception](spark.sql(
      "SELECT phrase_matches('x', array('bad', NULL))").collect())
    assert(ae.getMessage.toLowerCase.contains("null"))
    // first_values over a group whose pairs are all NULL is NULL (the
    // reference returns no value), not []
    val fv = Seq((1L, Option.empty[Double], Option.empty[Long]),
        (1L, Option.empty[Double], Option.empty[Long]))
      .toDF("g", "v", "o")
      .groupBy($"g")
      .agg(call_function("first_values", $"v", $"o", lit(3)).as("fv"))
      .collect()(0)
    assert(fv.isNullAt(1),
      "an all-null group must yield NULL like the reference, not []")
  }
}
