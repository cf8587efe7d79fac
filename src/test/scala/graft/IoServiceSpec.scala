package graft

import graft.io.Csv
import graft.sakila.{Sakila, SakilaTables}
import graft.service.{QueryService, SqlCatalog}
import org.apache.spark.sql.functions._

/** CSV conventions, the parameterized app-service API, and the SQL-file
  * catalog parser.
  */
class IoServiceSpec extends SparkSuite {
  import spark.implicits._

  test("golden-style CSV export is field-identical to data/*.csv for every query and dw") {
    val fixtures = getClass.getResource("/sakila").getPath
    val t = SakilaTables(spark, fixtures)
    val dw = Sakila.revenueView(t).cache()
    val q = Sakila.queries(dw)
    // The reference's exporter quotes any field containing a space; Spark
    // quotes minimally (only comma/quote). Compare parsed fields — the
    // values (incl. 12.50-style decimal rendering, yyyy-MM-dd HH:mm:ss
    // timestamps, and UTF-8) must be identical; the quoting style is tool
    // cosmetics. ""-escape-aware split.
    def fields(line: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      val sb = new StringBuilder
      var inQ = false
      var i = 0
      while (i < line.length) {
        val c = line(i)
        if (inQ) {
          if (c == '"' && i + 1 < line.length && line(i + 1) == '"') { sb.append('"'); i += 1 }
          else if (c == '"') inQ = false
          else sb.append(c)
        } else if (c == '"') inQ = true
        else if (c == ',') { out += sb.result(); sb.clear() }
        else sb.append(c)
        i += 1
      }
      (out += sb.result()).toList
    }
    def exported(df: org.apache.spark.sql.DataFrame): List[List[String]] = {
      val out = java.nio.file.Files.createTempDirectory("csv-golden").toString
      Csv.writeGolden(df, out)
      val written = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".csv")).head
      scala.io.Source.fromFile(written)("UTF-8").getLines().map(fields).toList
    }
    def goldenOf(name: String): List[List[String]] =
      scala.io.Source.fromFile(s"/root/reference/data/$name.csv")("UTF-8")
        .getLines().map(fields).toList
    def assertParity(ours: List[List[String]], gold: List[List[String]], what: String): Unit = {
      assert(ours.head === gold.head, s"$what: header differs")
      assert(ours.tail.map(_.mkString("\u0001")).sorted ===
        gold.tail.map(_.mkString("\u0001")).sorted, s"$what: row fields differ")
    }
    // q6 and dw's Most_Frequent_Category depend on MySQL's arbitrary mode
    // tie pick (233/599 customers tie) — their VALUE semantics are pinned
    // tie-tolerantly in SakilaGoldenSpec; the presentational loop here
    // covers every tie-free surface.
    for (n <- Seq("q1", "q2", "q3", "q4", "q5", "q7", "q8", "q9", "q10", "q11"))
      assertParity(exported(q(n)), goldenOf(n), n)
    def dropMode(rows: List[List[String]]) = rows.map(r => r.patch(6, Nil, 1))
    assertParity(dropMode(exported(dw)), dropMode(goldenOf("dw")), "dw")
  }

  test("CSV read round-trips types (header + inferSchema)") {
    val df = Seq((1L, "a,b", 2.5), (2L, "plain", 3.0)).toDF("id", "s", "v")
    val out = java.nio.file.Files.createTempDirectory("csv-rt").toString
    Csv.writeGolden(df, out)
    val back = Csv.readInferred(spark, out).orderBy("id")
    assert(back.as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a,b", 2.5), (2L, "plain", 3.0)))
  }

  test("JSONL round-trips the documents table with pinned schema and shard count") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-").toString
    graft.io.Jsonl.write(docs, dir, shards = 3)
    val shardFiles = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
    assert(shardFiles.length === 3)
    // Spark disallows corrupt-record-only queries on a raw file scan
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    // parsed frame first, as the quarantine workflow would.
    val back = graft.io.Jsonl.read(spark, dir, docs.schema).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() === 0)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.drop("_corrupt_record").select(docs.columns.map(col): _*)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("JSONL round-trips microsecond timestamps losslessly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-ts-").toString
    // Sub-millisecond digits would be silently truncated by a .SSS format.
    val src = Seq((1L, "2024-03-01 12:34:56.123456"), (2L, "2024-03-01 00:00:00.000001"))
      .toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    graft.io.Jsonl.write(src, dir)
    val back = graft.io.Jsonl.read(spark, dir, src.schema)
      .drop("_corrupt_record").orderBy("id")
    assert(back.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect().toSeq ===
      Seq("2024-03-01 12:34:56.123456", "2024-03-01 00:00:00.000001"))
  }

  test("JSONL quarantines malformed lines in _corrupt_record instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad-").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"doc_id": 1, "text": "ok"}
        |not json at all
        |{"doc_id": 2, "text": "fine"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val back = graft.io.Jsonl.read(spark, dir, schema).cache()
    assert(back.count() === 3)
    assert(back.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(back.filter(col("_corrupt_record").isNull).count() === 2)
  }

  test("search matches any column, case-insensitively; empty term is identity") {
    val df = Seq((1, "Alpha", "x"), (2, "beta", "ALPHA"), (3, "gamma", "z"))
      .toDF("id", "a", "b")
    assert(QueryService.search(df, "alpha").select("id").as[Int].collect().sorted
      === Array(1, 2))
    assert(QueryService.search(df, "  ").count() === 3)
    // Per-COLUMN semantics (the reference's row-wise any()): a term that
    // only exists across a column boundary must NOT match — row 1's
    // haystack would be "1|Alpha|x", where "a|a" spans the id/a seam.
    assert(QueryService.search(df, "a|a").count() === 0)
    // The reference strip()s the term before matching.
    assert(QueryService.search(df, "  beta  ").select("id").as[Int].collect()
      === Array(2))
  }

  test("rangeFilter coerces errors to NULL and drops them (pandas semantics)") {
    val df = Seq(("1", "10"), ("2", "oops"), ("3", "30")).toDF("id", "v")
    assert(QueryService.rangeFilter(df, "v", 5, 35).select("id").as[String].collect().sorted
      === Array("1", "3"))
  }

  test("topNCategories keeps only rows in the n most frequent categories") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    assert(QueryService.topNCategories(df, "k", 2).count() === 5)
    // NULLs don't burn a slot (pandas value_counts drops NaN BEFORE
    // nlargest): with 4 NULL rows outranking everything, n=2 must still
    // return the top 2 REAL categories, not {NULL-slot-wasted, "a"}.
    val withNulls = (Seq.fill(4)(null: String) ++
      Seq("a", "a", "a", "b", "b", "c")).toDF("k")
    assert(QueryService.topNCategories(withNulls, "k", 2).count() === 5)
  }

  test("chartData aggregates like the app's chart builder") {
    val df = Seq(("x", 1.0), ("x", 3.0), ("y", 10.0)).toDF("k", "v")
    val sums = QueryService.chartData(df, "k", "v", "sum").as[(String, Double)].collect().toMap
    assert(sums === Map("x" -> 4.0, "y" -> 10.0))
    intercept[IllegalArgumentException] {
      QueryService.chartData(df, "k", "v", "median")
    }
  }

  test("SqlCatalog parses titled query blocks; malformed headers ignored") {
    val sql =
      """-- preamble
        |CREATE VIEW v AS SELECT 1;
        |-- Query 1: First Query
        |SELECT * FROM v;
        |-- Query Two: not numbered
        |SELECT 2;
        |-- Query 2: Second Query
        |SELECT 3;
        |""".stripMargin
    val metas = SqlCatalog.parse(sql)
    assert(metas.map(m => (m.number, m.title)) === Seq((1, "First Query"), (2, "Second Query")))
    assert(metas.head.sql.contains("SELECT * FROM v"))
    assert(metas(1).sql === "SELECT 3")
  }

  test("the reference's own queries_shan.sql parses into the 11 published queries") {
    val metas = SqlCatalog.parseFile("/root/reference/queries_shan.sql")
    assert(metas.map(_.number) === (1 to 11))
    assert(metas.head.title === "Top 10 Revenue-Generating Customers")
  }
}
