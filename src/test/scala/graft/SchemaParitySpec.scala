package graft

import graft.ops.SchemaParity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Laws for the cross-engine schema-parity operator (x249/x250): the
  * canonical vocabulary covers the engine pair's shared surface (with
  * loud `unmapped:` landings outside it), and the drift classification
  * behaves like a changelog at column grain.
  */
class SchemaParitySpec extends SparkSuite {
  import spark.implicits._

  test("canonical vocabulary: every shared scalar + container maps to " +
    "the neutral spelling; types outside the vocabulary land unmapped " +
    "and engine-tagged (never silently equal)") {
    val cases = Seq[(DataType, String)](
      ByteType -> "int8", ShortType -> "int16", IntegerType -> "int32",
      LongType -> "int64", FloatType -> "float32", DoubleType -> "float64",
      StringType -> "string", BooleanType -> "bool", BinaryType -> "binary",
      DateType -> "date", TimestampType -> "timestamp_instant",
      TimestampNTZType -> "timestamp_ntz",
      DecimalType(18, 4) -> "decimal(18,4)",
      ArrayType(FloatType) -> "array<float32>",
      ArrayType(ArrayType(LongType)) -> "array<array<int64>>",
      MapType(StringType, DoubleType) -> "map<string,float64>",
      StructType(Seq(StructField("a", LongType),
        StructField("b", StringType))) -> "struct<a:int64,b:string>")
    for ((dt, want) <- cases)
      assert(SchemaParity.canonicalType(dt) === want, dt.toString)
    // Outside the vocabulary: loud, engine-tagged.
    assert(SchemaParity.canonicalType(CalendarIntervalType)
      .startsWith("unmapped:"))
  }

  test("schemaTable is the information_schema shape: 1-based ordinals " +
    "in declaration order, canonical types") {
    val df = Seq((1L, "a", 0.5)).toDF("id", "name", "score")
    val got = SchemaParity.schemaTable(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, "id", "int64"), (2L, "name", "string"),
      (3L, "score", "float64")))
  }

  test("schemaDiff laws: self-diff is empty; drop/add/retype/reorder " +
    "classify as missing/extra/retyped/moved; retyped outranks moved; " +
    "a case change flags as missing + extra (cross-engine parity is " +
    "case-exact even where Spark's analyzer is not)") {
    val a = Seq((1L, "s", 2L, "t", 0.5)).toDF("id", "src", "n", "txt", "w")
    assert(SchemaParity.schemaDiff(a, a).count() === 0L)
    // b: drops src, retypes n (int64->int32) AND moves it, adds flag,
    // moves txt; id stays put; w keeps type+ordinal 5.
    val b = a.select(col("id"), col("n").cast("int").as("n"), col("txt"),
      col("w"), lit(true).as("flag"))
    val got = SchemaParity.schemaDiff(a, b).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("src" -> "missing", "n" -> "retyped",
      "txt" -> "moved", "w" -> "moved", "flag" -> "extra"))
    // Case change: exact-name pairing (DuckDB quotes preserve case, so
    // a renamed-case column IS a different column cross-engine).
    val c = a.withColumnRenamed("src", "SRC")
    val caseGot = SchemaParity.schemaDiff(a, c).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(caseGot === Map("src" -> "missing", "SRC" -> "extra"))
    // Duplicate column names (legal after a raw select) would
    // cross-product the name pairing into a wrong changelog — even a
    // non-empty SELF-diff — so the guard refuses, naming the column.
    val dup = a.select(col("id"), col("id"))
    val e = intercept[IllegalArgumentException](
      SchemaParity.schemaDiff(dup, dup))
    assert(e.getMessage.contains("id") && e.getMessage.contains("alias"))
  }
}
