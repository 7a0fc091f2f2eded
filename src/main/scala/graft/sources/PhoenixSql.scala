package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Phoenix-dialect SQL front-end over [[GraftCatalog]].
  *
  * Accepts the reference's statement surface (grammar:
  * phoenix-core-client/src/main/antlr3/PhoenixSQL.g) for the analytics
  * subset this engine supports and routes it onto Spark:
  *
  *  - CREATE TABLE [IF NOT EXISTS] name (cols..., CONSTRAINT pk PRIMARY
  *    KEY (c1 [ASC|DESC], ...)) [props] — column-family prefixes
  *    (`USAGE.CORE`) are flattened (families are an HBase storage detail),
  *    SALT_BUCKETS etc. accepted and ignored
  *  - CREATE VIEW name AS SELECT * FROM base WHERE pred
  *  - UPSERT INTO t [(cols)] VALUES (...)
  *  - DELETE FROM t WHERE pred
  *  - CREATE SEQUENCE / NEXT VALUE FOR seq (batch-monotonic semantics)
  *  - SELECT ... — resolved over the current PK-snapshots of every
  *    catalog table (+ views), executed by Spark SQL
  *
  * The type surface maps per SURVEY.md §1.2 (UNSIGNED_* → signed,
  * CHAR(n)/VARCHAR(n) → STRING, Phoenix DATE/TIME carry time → TIMESTAMP,
  * scalar ARRAY types → ArrayType). This is a deliberately small
  * hand-rolled parser for the DDL/DML shapes in the reference's fixtures
  * (FIXTURES.md) — SELECT text passes through to Spark SQL, whose ANSI
  * grammar is a superset of Phoenix's query grammar for this subset.
  */
class PhoenixSql(spark: SparkSession, val catalog: GraftCatalog) {

  private val sequences = scala.collection.mutable.Map[String, Long]()
  private val viewNames = scala.collection.mutable.Set[String]()
  private val tableNames = scala.collection.mutable.Set[String]()
  // tables whose registered snapshot temp view is stale (mutated since the
  // last SELECT); avoids O(tables) re-registration on every query
  private val dirty = scala.collection.mutable.Set[String]()
  private var viewsStale = true

  def execute(sql: String): DataFrame = {
    val s = sql.trim.stripSuffix(";").trim
    val up = s.toUpperCase
    if (up.startsWith("CREATE TABLE")) createTable(s)
    else if (up.startsWith("CREATE VIEW")) createView(s)
    else if (up.startsWith("CREATE SEQUENCE")) createSequence(s)
    else if (up.startsWith("UPSERT INTO")) upsert(s)
    else if (up.startsWith("DELETE FROM")) delete(s)
    else if (up.startsWith("DROP TABLE")) dropTable(s)
    else if (up.startsWith("ALTER VIEW")) alterView(s)
    else if (up.startsWith("ALTER TABLE")) alterTable(s)
    else if (up.startsWith("EXPLAIN")) explainPlan(s)
    // UPDATE STATISTICS collected HBase guideposts for scan chunking;
    // Spark's AQE runtime statistics replace them — accepted as a no-op
    // so reference clients run unmodified (like SALT_BUCKETS).
    else if (up.startsWith("UPDATE STATISTICS")) spark.emptyDataFrame
    else if (up.startsWith("CREATE INDEX") || up.startsWith("DROP INDEX") ||
        up.startsWith("CREATE LOCAL INDEX"))
      throw new IllegalArgumentException(
        "secondary indexes are out of scope (OLTP write-path maintenance); " +
          "model covered indexes as materialized sorted projections — " +
          "see graft.operators.Layout and graft.plans.IndexRewriteRule")
    else if (up.startsWith("CREATE FUNCTION") ||
        up.startsWith("CREATE TEMPORARY FUNCTION")) createFunction(s)
    else if (up.startsWith("DROP FUNCTION")) dropFunction(s)
    else if (up.startsWith("DECLARE")) declareCursor(s)
    else if (up.startsWith("OPEN")) openCursor(s)
    else if (up.startsWith("FETCH")) fetchCursor(s)
    else if (up.startsWith("CLOSE")) closeCursor(s)
    else select(s)
  }

  // ---- EXPLAIN (reference: PhoenixSQL.g explain_node → ExplainPlan rows;
  // here: the Spark physical plan, one line per row in a PLAN column —
  // the same single-column row shape Phoenix's EXPLAIN result set has).
  // EXPLAIN must NEVER execute the statement: DML is planned via its
  // read side only (the rows a DELETE would match / an UPSERT..SELECT
  // would write), with a header naming the mutation. ------------------
  private def explainPlan(s: String): DataFrame = {
    import spark.implicits._
    val inner = s.trim.replaceFirst("(?is)^EXPLAIN\\s+", "")
    val up = inner.toUpperCase
    def planLines(df: DataFrame): Seq[String] =
      df.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("simple"))
        .linesIterator.toSeq
    val lines: Seq[String] =
      if (up.startsWith("DELETE FROM")) {
        val m = "(?is)DELETE FROM ([\\w.\"]+)(?:\\s+WHERE\\s+(.*))?$".r
          .findFirstMatchIn(inner)
          .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
        val t = cleanIdent(m.group(1))
        val read = select(s"SELECT * FROM $t" +
          Option(m.group(2)).map(w => s" WHERE $w").getOrElse(""))
        s"DELETE (tombstone) FROM $t rows matching:" +: planLines(read)
      } else if (up.startsWith("UPSERT INTO")) {
        val sel = ("(?is)UPSERT INTO ([\\w.\"]+)\\s*(?:\\(([^)]*)\\))?\\s*" +
          "(SELECT\\s.*)$").r.findFirstMatchIn(inner)
        sel match {
          case Some(m) =>
            s"UPSERT INTO ${cleanIdent(m.group(1))} rows from:" +:
              planLines(select(m.group(3)))
          case None =>
            Seq(s"UPSERT VALUES batch append")
        }
      } else if (up.startsWith("SELECT") || up.startsWith("WITH")) {
        planLines(select(inner))
      } else {
        // reference grammar only accepts EXPLAIN of select/upsert/delete
        // (PhoenixSQL.g explain_node); anything else is a parse error —
        // never fall through to execute(), which would mutate the catalog
        throw new IllegalArgumentException(
          s"EXPLAIN supports SELECT/UPSERT/DELETE only: $inner")
      }
    lines.toDF("PLAN")
  }

  // ---- UDFs (reference: PhoenixSQL.g create_function_node /
  // drop_function_node; UDFExpression.java loads the named class —
  // optionally from a jar — and evaluates it like a builtin; registry in
  // SYSTEM.FUNCTION. Here: the class implements GraftScalarUdf and is
  // registered as a session temp function with the declared return type;
  // argument types are accepted for grammar fidelity, Spark's analyzer
  // handles coercion at call sites.) --------------------------------------

  private def createFunction(s: String): DataFrame = {
    val m = ("(?is)CREATE\\s+(?:TEMPORARY\\s+)?FUNCTION\\s+([\\w\"]+)\\s*" +
      "\\(([^)]*)\\)\\s+RETURNS\\s+(.+?)\\s+AS\\s+'([^']+)'" +
      "(?:\\s+USING\\s+JAR\\s+'([^']+)')?\\s*$").r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    val name = cleanIdent(m.group(1))
    val arity = splitTopLevel(m.group(2), ',').map(parseType).length
    val ret = parseType(m.group(3))
    val loader = Option(m.group(5))
      .map(p => new java.net.URLClassLoader(
        Array(new java.io.File(p).toURI.toURL),
        Thread.currentThread.getContextClassLoader))
      .getOrElse(Thread.currentThread.getContextClassLoader)
    val f = Class.forName(m.group(4), true, loader)
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[graft.functions.GraftScalarUdf]
    import org.apache.spark.sql.api.java._
    arity match {
      case 0 => spark.udf.register(name,
        new UDF0[Any] { def call(): Any = f.eval(Nil) }, ret)
      case 1 => spark.udf.register(name,
        new UDF1[Any, Any] { def call(a: Any): Any = f.eval(Seq(a)) }, ret)
      case 2 => spark.udf.register(name,
        new UDF2[Any, Any, Any] {
          def call(a: Any, b: Any): Any = f.eval(Seq(a, b))
        }, ret)
      case 3 => spark.udf.register(name,
        new UDF3[Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any): Any = f.eval(Seq(a, b, c))
        }, ret)
      case 4 => spark.udf.register(name,
        new UDF4[Any, Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any, d: Any): Any =
            f.eval(Seq(a, b, c, d))
        }, ret)
      case n => throw new IllegalArgumentException(
        s"UDF arity $n not supported (max 4)")
    }
    spark.emptyDataFrame
  }

  private def dropFunction(s: String): DataFrame = {
    val m = "(?is)DROP\\s+FUNCTION\\s+(IF\\s+EXISTS\\s+)?([\\w\"]+)\\s*$".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    val name = cleanIdent(m.group(2))
    val dropped = spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))
    if (!dropped && m.group(1) == null)
      throw new IllegalArgumentException(s"function $name not found")
    spark.emptyDataFrame
  }

  // ---- cursors (reference: PhoenixSQL.g declare_cursor_node /
  // cursor_open_node / cursor_fetch_node / cursor_close_node;
  // CursorFetchPlan pages via the driver — here toLocalIterator) --------

  private case class CursorState(query: String,
      var rows: Iterator[org.apache.spark.sql.Row] = null,
      var schema: StructType = null)
  private val cursors = scala.collection.mutable.Map[String, CursorState]()

  private def declareCursor(s: String): DataFrame = {
    val m = "(?is)DECLARE\\s+([\\w\"]+)\\s+CURSOR\\s+FOR\\s+(.*)$".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    cursors(cleanIdent(m.group(1))) = CursorState(m.group(2))
    spark.emptyDataFrame
  }

  private def cursorOf(name: String): CursorState =
    cursors.getOrElse(name,
      throw new IllegalArgumentException(s"cursor $name not declared"))

  private def openCursor(s: String): DataFrame = {
    val m = "(?is)OPEN\\s+([\\w\"]+)\\s*$".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    val c = cursorOf(cleanIdent(m.group(1)))
    val df = select(c.query)
    c.schema = df.schema
    c.rows = df.toLocalIterator().asScala
    spark.emptyDataFrame
  }

  private def fetchCursor(s: String): DataFrame = {
    val m = ("(?is)FETCH\\s+NEXT\\s+(?:(\\d+)\\s+)?(?:ROWS?\\s+)?FROM\\s+" +
      "([\\w\"]+)\\s*$").r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    val c = cursorOf(cleanIdent(m.group(2)))
    require(c.rows != null, s"cursor ${m.group(2)} is not open")
    val n = Option(m.group(1)).map(_.toInt).getOrElse(1)
    val batch = c.rows.take(n).toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(batch, math.max(1, batch.length)),
      c.schema)
  }

  private def closeCursor(s: String): DataFrame = {
    val m = "(?is)CLOSE\\s+([\\w\"]+)\\s*$".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    cursors.remove(cleanIdent(m.group(1)))
    spark.emptyDataFrame
  }

  // ---- types ------------------------------------------------------------

  /** Parse one column definition ("[FAM.]name TYPE [NOT NULL] [PRIMARY
    * KEY]") into a StructField — the ONE place column constraints become
    * field metadata, shared by CREATE TABLE, CREATE VIEW added columns,
    * and ALTER TABLE ADD so enforcement is uniform:
    *  - numeric UNSIGNED_* → signed Spark type + CHECK ≥ 0 on write
    *    (Phoenix IllegalDataException analog; date/time unsigned variants
    *    differ only in storage encoding);
    *  - CHAR(n)/VARCHAR(n) → StringType + max-length check on write
    *    (DataExceedsCapacityException analog). CHAR's byte-padding is a
    *    storage encoding detail — PChar.toObject strips it on read, so
    *    the user-visible value is unpadded and comparisons against
    *    unpadded literals must keep working;
    *  - ARRAY types skip the scalar constraints (element-level checks
    *    would need a different shape than a column comparison). */
  private def columnField(c: String): StructField = {
    val parts = c.trim.split("\\s+", 2)
    require(parts.length == 2, s"cannot parse column def: $c")
    // flatten column-family prefix (USAGE.CORE → CORE) BEFORE general
    // identifier cleaning (which would flatten the dot into the name)
    val colName = parts(0).split("\\.").last
      .replaceAll("\"", "").toLowerCase
    val typeAndCons = parts(1)
    val notNull = typeAndCons.toUpperCase.contains("NOT NULL")
    val t = typeAndCons.replaceAll("(?i)\\s+NOT\\s+NULL", "")
      .replaceAll("(?i)\\s+NULL$", "")
      .replaceAll("(?i)\\s+PRIMARY\\s+KEY.*", "")
    val tUp = t.trim.toUpperCase
    val isArray = tUp.matches(".*\\sARRAY(\\[\\])?$")
    val metaB = new org.apache.spark.sql.types.MetadataBuilder()
    if (!isArray) {
      if (tUp.startsWith("UNSIGNED") && !tUp.contains("DATE") &&
          !tUp.contains("TIME"))
        metaB.putBoolean(GraftCatalog.UnsignedKey, true)
      "^CHAR\\s*\\(\\s*(\\d+)\\s*\\)".r.findFirstMatchIn(tUp)
        .foreach(m => metaB.putLong(GraftCatalog.CharWidthKey,
          m.group(1).toLong))
      "^VARCHAR\\s*\\(\\s*(\\d+)\\s*\\)".r.findFirstMatchIn(tUp)
        .foreach(m => metaB.putLong(GraftCatalog.VarcharWidthKey,
          m.group(1).toLong))
    }
    StructField(colName, parseType(t), nullable = !notNull,
      metadata = metaB.build())
  }

  private[sources] def parseType(t: String): DataType = {
    val norm = t.trim.toUpperCase.replaceAll("\\s+", " ")
    val arr = norm.endsWith(" ARRAY") || norm.endsWith(" ARRAY[]")
    val base = norm.replaceAll(" ARRAY(\\[\\])?$", "")
    val elem = base.replaceAll("\\(.*\\)", "").trim match {
      case "INTEGER" | "UNSIGNED_INT" => IntegerType
      case "BIGINT" | "UNSIGNED_LONG" => LongType
      case "SMALLINT" | "UNSIGNED_SMALLINT" => ShortType
      case "TINYINT" | "UNSIGNED_TINYINT" => ByteType
      case "FLOAT" | "UNSIGNED_FLOAT" => FloatType
      case "DOUBLE" | "UNSIGNED_DOUBLE" => DoubleType
      case "DECIMAL" =>
        val m = "DECIMAL\\s*\\(\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)".r
          .findFirstMatchIn(base)
        m.map(g => DecimalType(g.group(1).toInt, g.group(2).toInt))
          .getOrElse(DecimalType(38, 18))
      case "BOOLEAN" => BooleanType
      case "CHAR" | "VARCHAR" => StringType
      case "BINARY" | "VARBINARY" | "VARBINARY_ENCODED" => BinaryType
      case "DATE" | "TIME" | "TIMESTAMP" | "UNSIGNED_DATE" | "UNSIGNED_TIME"
           | "UNSIGNED_TIMESTAMP" => TimestampType // Phoenix DATE carries ms
      case "JSON" => StringType
      case "BSON" => BinaryType
      case other => throw new IllegalArgumentException(s"unknown type $other")
    }
    if (arr) ArrayType(elem) else elem
  }

  // ---- DDL --------------------------------------------------------------

  /** Split on `sep` at paren/bracket depth 0 (brackets carry Phoenix's
    * ARRAY['a','b'] literal syntax), ignoring separators inside
    * single-quoted SQL string literals ('' is the escaped quote — it
    * toggles back immediately, which is equivalent to staying quoted). */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var inQuote = false; val cur = new StringBuilder
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case c @ ('(' | '[') if !inQuote => depth += 1; cur += c
      case c @ (')' | ']') if !inQuote => depth -= 1; cur += c
      case c if c == sep && depth == 0 && !inQuote =>
        out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Contents of the first balanced (...) group + the trailing text —
    * a greedy regex would swallow later parenthesized clauses like
    * SPLIT ON ('a','b') into the column body. */
  private def firstBalancedGroup(s: String): (String, String) = {
    val open = s.indexOf('(')
    require(open >= 0, s"expected ( in: $s")
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0)
            return (s.substring(open + 1, i), s.substring(i + 1))
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  private def createTable(s: String): DataFrame = {
    val m = "(?is)CREATE TABLE (?:IF NOT EXISTS )?([\\w.\"]+)\\s*(\\(.*)$".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    val name = cleanIdent(m.group(1))
    val (rawBody, tail) = firstBalancedGroup(m.group(2))
    // Phoenix's grammar allows the CONSTRAINT clause to follow the last
    // column without a comma (see examples/WEB_STAT.sql) — normalize.
    val body = rawBody.replaceAll("(?i)\\s+CONSTRAINT\\s+", ", CONSTRAINT ")
    val items = splitTopLevel(body, ',')
    val (pkItems, colItems) = items.partition(
      _.toUpperCase.matches("(?s)CONSTRAINT\\s+\\S+\\s+PRIMARY KEY.*"))
    val fields = colItems.map(columnField)
    // PK: either a CONSTRAINT clause or an inline "col type PRIMARY KEY"
    val pk: Seq[String] = pkItems.headOption match {
      case Some(c) =>
        val inner = "\\(([^)]*)\\)".r.findFirstMatchIn(c).get.group(1)
        splitTopLevel(inner, ',').map(f =>
          cleanIdent(f.trim.split("\\s+")(0)).toLowerCase)
      case None =>
        colItems.filter(_.toUpperCase.contains("PRIMARY KEY"))
          .map(c => cleanIdent(c.trim.split("\\s+")(0)).toLowerCase)
    }
    // trailing table options: k=v props kept (and ignored downstream);
    // physical clauses like SPLIT ON (...) are HBase details — dropped
    val props = tail.replaceAll("(?is)SPLIT\\s+ON\\s*\\([^)]*\\)", "")
      .split(",").map(_.trim).filter(_.contains("="))
      .map { p => val Array(k, v) = p.split("=", 2); k.trim -> v.trim }
      .toMap
    catalog.createTable(name, StructType(fields), pk, props)
    tableNames += name
    dirty += name
    spark.emptyDataFrame
  }

  /** view name → (equality defaults from the predicate, raw predicate).
    * Phoenix updatable views: UPSERT through a view writes the base row
    * with the view's WHERE-equality columns set to the compared values
    * (so the row is visible through the view). */
  private val viewDefaults =
    scala.collection.mutable.Map[String, Map[String, String]]()

  private def createView(s: String): DataFrame = {
    val m = ("(?is)CREATE VIEW (?:IF NOT EXISTS )?([\\w.\"]+)\\s*" +
      "(\\([^)]*\\))?\\s*AS\\s+" +
      "SELECT \\* FROM\\s+([\\w.\"]+)(?:\\s+WHERE\\s+(.*))?$").r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    val name = cleanIdent(m.group(1))
    val base = cleanIdent(m.group(3))
    // view-added columns extend the base table's physical storage
    Option(m.group(2)).foreach { colGroup =>
      val inner = colGroup.stripPrefix("(").stripSuffix(")")
      val fields = splitTopLevel(inner, ',').map(columnField)
      catalog.extendTable(catalog.viewBase(base), fields)
    }
    val predText = Option(m.group(4))
    val pred = predText.map(expr).getOrElse(lit(true))
    // equality conjuncts become write-through defaults
    val eqs = predText.toSeq.flatMap(_.split("(?i)\\s+AND\\s+").toSeq)
      .flatMap { c =>
        "^\\s*([\\w\"]+)\\s*=\\s*('[^']*'|[\\d.]+)\\s*$".r
          .findFirstMatchIn(c)
          .map(g => g.group(1).replaceAll("\"", "").toLowerCase -> g.group(2))
      }.toMap
    viewDefaults(name) = eqs
    catalog.createView(name, base, pred)
    viewNames += name
    viewsStale = true
    dirty += catalog.viewBase(base) // extension columns change the base read
    spark.emptyDataFrame
  }

  /** ALTER VIEW v DROP COLUMN c — diverged views (reference:
    * create_diverged_view.sql): the view stops projecting the column,
    * the base table keeps it. */
  private def alterView(s: String): DataFrame = {
    val m = "(?is)ALTER VIEW ([\\w.\"]+)\\s+DROP COLUMN\\s+([\\w\"]+)\\s*$".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    catalog.viewDropColumn(cleanIdent(m.group(1)),
      m.group(2).replaceAll("\"", "").toLowerCase)
    viewsStale = true
    spark.emptyDataFrame
  }

  /** ALTER TABLE t ADD [IF NOT EXISTS] col type [, ...]
    * ALTER TABLE t DROP COLUMN [IF EXISTS] col [, ...]
    * (reference: grammar alter_table, it/end2end/AlterTableIT.java). */
  private def alterTable(s: String): DataFrame = {
    val add = ("(?is)ALTER TABLE ([\\w.\"]+)\\s+ADD\\s+" +
      "(IF NOT EXISTS\\s+)?(.*)$").r.findFirstMatchIn(s)
    val drop = ("(?is)ALTER TABLE ([\\w.\"]+)\\s+DROP COLUMN\\s+" +
      "(IF EXISTS\\s+)?(.*)$").r.findFirstMatchIn(s)
    (add, drop) match {
      case (Some(m), _) =>
        val name = cleanIdent(m.group(1))
        val fields = splitTopLevel(m.group(3), ',').map(columnField)
        catalog.alterAddColumns(name, fields,
          ifNotExists = m.group(2) != null)
        dirty += name
      case (_, Some(m)) =>
        val name = cleanIdent(m.group(1))
        splitTopLevel(m.group(3), ',').foreach(c =>
          catalog.alterDropColumn(name,
            c.trim.replaceAll("\"", "").toLowerCase,
            ifExists = m.group(2) != null))
        dirty += name
      case _ =>
        throw new IllegalArgumentException(s"cannot parse: $s")
    }
    spark.emptyDataFrame
  }

  private def dropTable(s: String): DataFrame = {
    val m = "(?is)DROP TABLE (?:IF EXISTS )?([\\w.\"]+)\\s*$".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    val name = cleanIdent(m.group(1))
    if (catalog.hasTable(name)) {
      catalog.dropTable(name)
      tableNames -= name
      spark.catalog.dropTempView(name)
    } else if (!s.toUpperCase.contains("IF EXISTS"))
      throw new IllegalArgumentException(s"unknown table $name")
    spark.emptyDataFrame
  }

  private def createSequence(s: String): DataFrame = {
    val m = ("(?is)CREATE SEQUENCE (?:IF NOT EXISTS )?([\\w.\"]+)" +
      "(?:\\s+START\\s+WITH\\s+(\\d+))?.*").r.findFirstMatchIn(s).get
    sequences(cleanIdent(m.group(1))) =
      Option(m.group(2)).map(_.toLong).getOrElse(1L) - 1L
    spark.emptyDataFrame
  }

  def nextValueFor(seq: String): Long = {
    val v = sequences(seq) + 1L
    sequences(seq) = v
    v
  }

  // ---- DML --------------------------------------------------------------

  private def upsert(s: String): DataFrame = {
    // UPSERT INTO t [(cols)] SELECT ... (reference g: upsert_node SELECT
    // form) — the SELECT runs through the normal query path and the
    // result batch is upserted.
    val sel = ("(?is)UPSERT INTO ([\\w.\"]+)\\s*(?:\\(([^)]*)\\))?\\s*" +
      "(SELECT\\s.*)$").r.findFirstMatchIn(s)
    if (sel.isDefined) {
      val m = sel.get
      val target = cleanIdent(m.group(1))
      // same view write-through as the VALUES path: rows written through a
      // view carry the view's equality defaults for unset columns, so
      // they remain visible through the view
      val (table, defaults) =
        if (catalog.isView(target))
          (catalog.viewBase(target), viewDefaults.getOrElse(target, Map.empty))
        else (target, Map.empty[String, String])
      var df = select(m.group(3))
      Option(m.group(2)).foreach { colGroup =>
        val names = splitTopLevel(colGroup, ',').map(c =>
          cleanIdent(c).split("\\.").last.toLowerCase)
        require(names.length == df.columns.length,
          s"UPSERT SELECT arity mismatch: ${names.length} columns but " +
            s"${df.columns.length} select outputs for $target")
        df = df.toDF(names: _*)
      }
      defaults.filterNot { case (c, _) => df.columns.contains(c) }
        .foreach { case (c, v) => df = df.withColumn(c, expr(v)) }
      catalog.upsert(table, df)
      dirty += table
      return spark.emptyDataFrame
    }
    val m = ("(?is)UPSERT INTO ([\\w.\"]+)\\s*(?:\\(([^)]*)\\))?\\s*" +
      "VALUES\\s*\\((.*)\\)$").r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    val target = cleanIdent(m.group(1))
    // upsert through a view: write the base row with the view's equality
    // defaults for columns the statement doesn't set
    val (table, defaults) =
      if (catalog.isView(target))
        (catalog.viewBase(target), viewDefaults.getOrElse(target, Map.empty))
      else (target, Map.empty[String, String])
    val spec = catalog.spec(table)
    val cols = Option(m.group(2))
      .map(splitTopLevel(_, ',').map(c =>
        cleanIdent(c).split("\\.").last.toLowerCase))
      .getOrElse(spec.schema.fieldNames.toSeq)
    // NEXT VALUE FOR seq → driver-side sequence increment;
    // Phoenix ARRAY['a','b'] literal → Spark array('a','b')
    val values = splitTopLevel(m.group(3), ',').map { v =>
      val nv = "(?i)NEXT VALUE FOR ([\\w.\"]+)".r.findFirstMatchIn(v)
      nv.map(g => nextValueFor(cleanIdent(g.group(1))).toString)
        .getOrElse(
          "(?is)^ARRAY\\s*\\[(.*)\\]$".r.findFirstMatchIn(v.trim)
            .map(g => s"array(${g.group(1)})").getOrElse(v))
    }
    // Phoenix errors on arity mismatch ("Upsert has more values than
    // columns"); zip would silently truncate.
    require(values.length == cols.length,
      s"UPSERT arity mismatch: ${cols.length} columns but " +
        s"${values.length} values for $target")
    val withDefaults = values.zip(cols) ++
      defaults.filterNot { case (c, _) => cols.contains(c) }
        .map { case (c, v) => (v, c) }
    val row = spark.sql(s"SELECT ${withDefaults
      .map { case (v, c) => s"$v AS $c" }.mkString(", ")}")
    // catalog.upsert pads missing columns (incl. view extensions) with
    // NULL and casts everything to the declared types
    catalog.upsert(table, row)
    dirty += table
    spark.emptyDataFrame
  }

  private def delete(s: String): DataFrame = {
    val m = "(?is)DELETE FROM ([\\w.\"]+)(?:\\s+WHERE\\s+(.*))?$".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse: $s"))
    catalog.delete(cleanIdent(m.group(1)),
      Option(m.group(2)).map(expr).getOrElse(lit(true)))
    dirty += cleanIdent(m.group(1))
    spark.emptyDataFrame
  }

  // ---- queries ----------------------------------------------------------

  private def select(s: String): DataFrame = {
    // re-register only what changed since the last SELECT; any base-table
    // change invalidates views too (their plans pin the base's files)
    if (dirty.nonEmpty || viewsStale) {
      dirty.filter(tableNames.contains).foreach(t =>
        catalog.snapshot(t).createOrReplaceTempView(t))
      viewNames.foreach(v => catalog.view(v).createOrReplaceTempView(v))
      dirty.clear(); viewsStale = false
    }
    // rewrite schema-qualified spellings to the flattened view names
    val rewritten = dottedNames.foldLeft(s) { case (acc, (dotted, flat)) =>
      acc.replaceAll("(?i)" + java.util.regex.Pattern.quote(dotted), flat)
    }
    spark.sql(rewritten)
  }

  /** Identifiers: strip quotes, lowercase, flatten schema qualification
    * (Phoenix SCHEMA.TABLE → one flat name; Spark temp views can't be
    * schema-qualified). Original dotted spellings are remembered so
    * SELECT text can be rewritten. */
  private val dottedNames = scala.collection.mutable.Map[String, String]()

  private def cleanIdent(s: String): String = {
    val base = s.trim.replaceAll("\"", "").toLowerCase
    if (base.contains(".")) {
      val flat = base.replace(".", "_")
      dottedNames(base) = flat
      flat
    } else base
  }

  /** Execute a multi-statement script (block comments stripped,
    * ';'-separated). Returns the result of the last statement. */
  def executeScript(script: String): Seq[DataFrame] = {
    val clean = script.replaceAll("(?s)/\\*.*?\\*/", "")
    // quote-aware split: a ';' inside a string literal is not a separator
    splitTopLevel(clean, ';').map(execute)
  }
}
