package graft.queries

import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-17 batch: the changelog → repair symmetry closed (round-16
  * verdict residual #4), and the reconciliation family extended DOWN
  * to the schema layer. x246 classified the divergence; x248 makes the
  * classification EXECUTABLE: `Reconcile.changelog` carries the
  * reference side's new row images alongside each verdict, and
  * `Reconcile.applyChangelog` drives the Upsert MERGE shape from them
  * (deletes drop their key's row, updates replace the payload, inserts
  * add theirs — broadcast anti-join + union, one corpus scan, no
  * window). The gate replays the x239/x240/x246 corrupted-copy
  * scenario end-to-end: classify, apply, re-fingerprint — every bucket
  * must verdict green against the reference, so a wrong verdict, a
  * missing image, or a mangled apply all fail the single output row.
  * x249/x250 add the check a migration runs BEFORE any row
  * fingerprint: both engines project the same parquet metadata onto
  * one canonical type vocabulary (`SchemaParity`), and schema drift
  * classifies as a column-grain changelog (missing/extra/retyped/
  * moved) — pure metadata operators whose plans contain zero data
  * scans (PlanSpec-pinned).
  */
object Batch17 {

  def defs: Seq[QueryDef] = Seq(

    // Changelog roundtrip (Reconcile.changelog + applyChangelog): the
    // keyed twin of x244's multiset repair. The corrupted copy's
    // every-97th documents classify as updates carrying the original
    // text as the new image; applying the changelog to the corrupted
    // side must reproduce the reference exactly — re-fingerprinting
    // proves it bucket-by-bucket, cross-engine (the DuckDB twin
    // classifies, applies, and re-fingerprints the same way from the
    // same parquet). A user holding the x246 verdicts now has the
    // matching write path without recomputing the multiset diff.
    QueryDef(
      "x248_changelog_roundtrip",
      (s, dir) => {
        val keys = Seq("doc_id")
        val payload = Seq("source", "lang", "n_chars", "text")
        val all = keys ++ payload
        val d = Tables(s, dir).documents.select(all.map(col): _*)
        val corr = Batch15.corrupted(Tables(s, dir).documents)
          .select(all.map(col): _*)
        val cl = graft.ops.Reconcile.changelog(d, corr, keys, payload)
        val applied = graft.ops.Reconcile.applyChangelog(
          corr, cl, keys, payload)
        val verdict = graft.ops.Reconcile.checksumDiff(
          graft.ops.Reconcile.tableChecksum(d, all),
          graft.ops.Reconcile.tableChecksum(applied, all))
        val acts = cl.agg(
          coalesce(sum(when(col("verdict") === "insert", 1L)), lit(0L))
            .as("n_inserts"),
          coalesce(sum(when(col("verdict") === "delete", 1L)), lit(0L))
            .as("n_deletes"),
          coalesce(sum(when(col("verdict") === "update", 1L)), lit(0L))
            .as("n_updates"))
        val agg = verdict.agg(count(lit(1)).as("n_buckets"),
          coalesce(sum(when(col("bucket_match"), lit(1L)).otherwise(lit(0L))),
            lit(0L)).as("n_matched"))
        acts.crossJoin(broadcast(agg))
          .select(col("n_inserts"), col("n_deletes"), col("n_updates"),
            col("n_buckets"), col("n_matched"),
            (col("n_buckets") === col("n_matched")).as("applied_ok"))
      },
      Some(graft.ops.Reconcile.changelogRoundtripOracleSql(
        "documents", Batch15.CorruptedSql,
        Seq("doc_id"), Seq("source", "lang", "n_chars", "text")))),

    // Schema parity (SchemaParity.schemaTable): the check a migration
    // runs BEFORE any row fingerprint — both engines project the same
    // parquet metadata onto ONE canonical type vocabulary (int64 /
    // float64 / timestamp_ntz / array<float32> / ...), so agreement
    // here proves the engines structurally agree on what they are
    // about to fingerprint. Gate covers lineitem (DOUBLE + naive
    // TIMESTAMP — the two types with engine-specific renderings the
    // Reconcile canonicalizers exist for) and embeddings (a nested
    // ARRAY<FLOAT>, exercising the container recursion in both twins).
    QueryDef(
      "x249_schema_parity",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.SchemaParity.schemaTable(t.lineitem)
          .withColumn("tbl", lit("lineitem"))
          .unionByName(graft.ops.SchemaParity.schemaTable(t.embeddings)
            .withColumn("tbl", lit("embeddings")))
          .select(col("tbl"), col("ordinal"), col("col_name"),
            col("canonical_type"))
          .orderBy("tbl", "ordinal")
      },
      Some(
        s"""SELECT tbl, ordinal, col_name,
           |       ${graft.ops.SchemaParity.canonicalTypeSql("dt")}
           |         AS canonical_type
           |FROM (
           |  SELECT 'lineitem' AS tbl,
           |         CAST(ordinal_position AS BIGINT) AS ordinal,
           |         column_name AS col_name, data_type AS dt
           |  FROM information_schema.columns WHERE table_name = 'lineitem'
           |  UNION ALL
           |  SELECT 'embeddings', CAST(ordinal_position AS BIGINT),
           |         column_name, data_type
           |  FROM information_schema.columns WHERE table_name = 'embeddings'
           |)
           |ORDER BY 1, 2""".stripMargin)),

    // Schema drift classification (SchemaParity.schemaDiff): the
    // structural changelog — a replica that dropped a column, retyped
    // another (int64 -> int32), added one, and reordered the rest
    // classifies as missing/retyped/extra/moved, one actionable row
    // per divergent column (a raw row diff would report EVERY row).
    // The retyped verdict outranks moved: the type break is the
    // defect; the reorder is a symptom.
    QueryDef(
      "x250_schema_drift",
      (s, dir) => {
        val d = Tables(s, dir).documents
        val divergent = d.select(col("doc_id"), col("source"),
          col("n_chars").cast("int").as("n_chars"), col("text"),
          lit(true).as("extra_flag"))
        graft.ops.SchemaParity.schemaDiff(d, divergent)
      },
      Some(graft.ops.SchemaParity.schemaDiffOracleSql("documents",
        """SELECT doc_id, source, CAST(n_chars AS INTEGER) AS n_chars,
          |       text, true AS extra_flag FROM documents""".stripMargin)))
  )
}
