package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine SCHEMA parity — the step a migration runs before any
  * row fingerprint ([[Reconcile]]): two engines can only reconcile
  * rows they agree on structurally, and type drift (an INT32 column
  * that became INT64, a naive timestamp that became an instant, a
  * dropped column) is both the most common migration defect and the
  * one a row-level diff reports most confusingly (every row differs).
  *
  * The contract is a CANONICAL TYPE VOCABULARY, one definition per
  * engine pair: Spark's `DataType` and DuckDB's type names both map
  * onto the same neutral spellings (int8/int16/int32/int64, float32/
  * float64, string, bool, binary, date, timestamp_instant vs
  * timestamp_ntz — the isAdjustedToUTC parquet distinction BOTH
  * engines preserve — decimal(p,s), array<...>). A type neither side
  * maps lands as `unmapped:<engine spelling>` — loud at the gate
  * (the two engines' raw spellings differ), never silently "equal".
  *
  * Scale note: a schema is driver-held metadata by definition — the
  * one legitimately driver-side "table" in the library (100 TB of
  * data still has ~10² columns of schema). [[schemaTable]] builds a
  * single-partition frame from `df.schema` without touching data.
  */
object SchemaParity {

  /** The neutral spelling of a Spark type (recursive for containers). */
  def canonicalType(dt: DataType): String = dt match {
    case ByteType         => "int8"
    case ShortType        => "int16"
    case IntegerType      => "int32"
    case LongType         => "int64"
    case FloatType        => "float32"
    case DoubleType       => "float64"
    case StringType       => "string"
    case BooleanType      => "bool"
    case BinaryType       => "binary"
    case DateType         => "date"
    case TimestampType    => "timestamp_instant"
    case TimestampNTZType => "timestamp_ntz"
    case d: DecimalType   => s"decimal(${d.precision},${d.scale})"
    case a: ArrayType     => s"array<${canonicalType(a.elementType)}>"
    case m: MapType =>
      s"map<${canonicalType(m.keyType)},${canonicalType(m.valueType)}>"
    case s: StructType =>
      s.fields.map(f => s"${f.name}:${canonicalType(f.dataType)}")
        .mkString("struct<", ",", ">")
    case other => s"unmapped:${other.sql.toLowerCase}"
  }

  /** The DuckDB twin of [[canonicalType]] over a SQL expression holding
    * a DuckDB type name (e.g. information_schema's `data_type`).
    * Coverage is the parquet SCALAR + ARRAY surface (arrays nest
    * `depth` levels — DuckDB spells them `T[]`); MAP/STRUCT spellings
    * (`MAP(K, V)`, `STRUCT(...)`) are not parsed by this CASE, so a
    * map/struct column — even one structurally identical on both
    * engines — lands as `unmapped:` + the engine spelling and reports
    * LOUD FALSE DRIFT at a cross-engine gate, never silent equality
    * (extend the CASE before pointing the oracle at such a schema; the
    * Spark-side [[schemaDiff]], where BOTH frames canonicalize through
    * [[canonicalType]], handles every type). Unmapped spellings can
    * never equal the other engine's unmapped spelling by accident. */
  def canonicalTypeSql(expr: String, depth: Int = 3): String = {
    val inner =
      if (depth > 0)
        "'array<' || " +
          canonicalTypeSql(s"substr($expr, 1, length($expr) - 2)",
            depth - 1) + " || '>'"
      else s"'unmapped:' || lower($expr)"
    s"""CASE
       | WHEN $expr LIKE '%[]' THEN $inner
       | WHEN upper($expr) LIKE 'DECIMAL(%' THEN lower($expr)
       | WHEN upper($expr) = 'TINYINT' THEN 'int8'
       | WHEN upper($expr) = 'SMALLINT' THEN 'int16'
       | WHEN upper($expr) = 'INTEGER' THEN 'int32'
       | WHEN upper($expr) = 'BIGINT' THEN 'int64'
       | WHEN upper($expr) IN ('FLOAT', 'REAL') THEN 'float32'
       | WHEN upper($expr) = 'DOUBLE' THEN 'float64'
       | WHEN upper($expr) = 'VARCHAR' THEN 'string'
       | WHEN upper($expr) = 'BOOLEAN' THEN 'bool'
       | WHEN upper($expr) = 'BLOB' THEN 'binary'
       | WHEN upper($expr) = 'DATE' THEN 'date'
       | WHEN upper($expr) = 'TIMESTAMP WITH TIME ZONE'
       |   THEN 'timestamp_instant'
       | WHEN upper($expr) = 'TIMESTAMP' THEN 'timestamp_ntz'
       | ELSE 'unmapped:' || lower($expr) END""".stripMargin
      .replace("\n", "")
  }

  /** A table's schema AS DATA: one row per column of (1-based ordinal,
    * name, canonical type) — the information_schema.columns shape, so
    * the DuckDB twin is a projection of information_schema through
    * [[canonicalTypeSql]]. */
  def schemaTable(df: DataFrame): DataFrame = {
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    df.schema.fields.zipWithIndex.foreach { case (f, i) =>
      rows.add(Row((i + 1).toLong, f.name, canonicalType(f.dataType)))
    }
    // createDataFrame over a java List lands as a LocalRelation —
    // Catalyst folds/broadcasts it and schemaDiff's join never
    // launches a shuffle for a driver-held metadata question (an
    // RDD-backed frame would plan a sort-merge full-outer).
    df.sparkSession.createDataFrame(rows,
      StructType(Seq(
        StructField("ordinal", LongType, nullable = false),
        StructField("col_name", StringType, nullable = false),
        StructField("canonical_type", StringType, nullable = false))))
  }

  /** Schema drift between a reference `a` and a divergent `b`, one row
    * per divergent column: `missing` (b dropped it), `extra` (b added
    * it), `retyped` (the canonical types differ — reported even when
    * the column also moved: the type break is the actionable defect),
    * or `moved` (same type, different ordinal — a SELECT-*-consumer
    * break). Identical columns are not emitted; equal schemas diff to
    * zero rows. Column names match exactly (Spark's analyzer is
    * case-insensitive by default, but a cross-engine parity check must
    * flag a case change — DuckDB quotes preserve it). */
  def schemaDiff(a: DataFrame, b: DataFrame): DataFrame = {
    // Duplicate column NAMES (legal in a Spark schema after a raw
    // select) would cross-product the name pairing below into a wrong
    // changelog — including a non-empty self-diff. Same discipline as
    // rowDiffByKey's primary-key guard: fail fast, never misclassify.
    // The schema is driver-held, so the guard is a plain require.
    for ((df, side) <- Seq((a, "a"), (b, "b"))) {
      val dup = df.schema.fieldNames.groupBy(identity)
        .collect { case (n, occ) if occ.length > 1 => n }
      require(dup.isEmpty,
        s"SchemaParity.schemaDiff: side $side has duplicate column " +
          s"name(s) ${dup.mkString(", ")} — name-keyed drift " +
          "classification is ambiguous; alias them first")
    }
    val sa = schemaTable(a).select(col("col_name"),
      col("canonical_type").as("a_type"), col("ordinal").as("a_ordinal"))
    val sb = schemaTable(b).select(col("col_name"),
      col("canonical_type").as("b_type"), col("ordinal").as("b_ordinal"))
    sa.join(sb, Seq("col_name"), "full_outer")
      .withColumn("verdict",
        when(col("b_type").isNull, lit("missing"))
          .when(col("a_type").isNull, lit("extra"))
          .when(col("a_type") =!= col("b_type"), lit("retyped"))
          .when(col("a_ordinal") =!= col("b_ordinal"), lit("moved")))
      .filter(col("verdict").isNotNull)
      .select(col("col_name"), col("verdict"), col("a_type"), col("b_type"),
        col("a_ordinal"), col("b_ordinal"))
      .orderBy(coalesce(col("a_ordinal"), col("b_ordinal")), col("col_name"))
  }

  /** The DuckDB twin of [[schemaTable]] for a REGISTERED table (the
    * information_schema path — deterministic ordinals). */
  def schemaOracleSql(table: String): String =
    s"""SELECT CAST(ordinal_position AS BIGINT) AS ordinal,
       |       column_name AS col_name,
       |       ${canonicalTypeSql("data_type")} AS canonical_type
       |FROM information_schema.columns
       |WHERE table_name = '$table' AND table_schema = current_schema()
       |ORDER BY 1""".stripMargin

  /** The [[schemaTable]] CTE body for an arbitrary SELECT (the
    * divergent side of a drift check is usually a projection, not a
    * registered table): DESCRIBE preserves column order, row_number
    * supplies the ordinal. */
  private def describeCteSql(select: String): String =
    s"""SELECT row_number() OVER () AS ordinal,
       |       column_name AS col_name,
       |       ${canonicalTypeSql("column_type")} AS t
       |FROM (DESCRIBE $select)""".stripMargin

  /** The DuckDB twin of [[schemaDiff]] between a registered reference
    * table and a divergent SELECT. */
  def schemaDiffOracleSql(refTable: String, divergentSelect: String): String =
    s"""WITH sa AS (
       |  SELECT CAST(ordinal_position AS BIGINT) AS ordinal,
       |         column_name AS col_name,
       |         ${canonicalTypeSql("data_type")} AS t
       |  FROM information_schema.columns
       |  WHERE table_name = '$refTable' AND table_schema = current_schema()
       |), sb AS (
       |  ${describeCteSql(divergentSelect)}
       |)
       |SELECT * FROM (
       |  SELECT COALESCE(a.col_name, b.col_name) AS col_name,
       |         CASE WHEN b.col_name IS NULL THEN 'missing'
       |              WHEN a.col_name IS NULL THEN 'extra'
       |              WHEN a.t <> b.t THEN 'retyped'
       |              WHEN a.ordinal <> b.ordinal THEN 'moved' END AS verdict,
       |         a.t AS a_type, b.t AS b_type,
       |         a.ordinal AS a_ordinal, b.ordinal AS b_ordinal
       |  FROM sa a FULL OUTER JOIN sb b ON b.col_name = a.col_name
       |)
       |WHERE verdict IS NOT NULL
       |ORDER BY COALESCE(a_ordinal, b_ordinal), col_name""".stripMargin
}
