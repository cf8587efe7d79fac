package graft.queries

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Round-15 batch: completing the cross-engine reconciliation family
  * opened in round 14 (x234 fingerprint, x237 per-source fingerprint,
  * x239 bucket diff) with the two drill-down steps a user actually
  * takes after a mismatch verdict — x240 row-level drill-down
  * (Reconcile.rowDiff: the mismatched bucket set broadcasts back over
  * both tables and ONLY those buckets' rows are re-grouped, so the
  * expensive step touches ~1/nBuckets of the data) and x241 the
  * feed-grain diff (Reconcile.checksumDiffByGroup: verdicts keyed by
  * (source, bucket), localizing divergence to WHICH feed before any
  * row is touched). Both gates replay x239's deterministically
  * corrupted copy (every 97th document's text suffixed) so the three
  * operators' verdicts corroborate one another on the same scenario.
  */
object Batch15 {

  /** The reconciliation family's shared corruption scenario — x239's
    * every-97th-document text suffix, one definition for every gate
    * that replays it. */
  private def corrupted(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(pmod(col("doc_id"), lit(97L)) === 0L,
        concat(col("text"), lit(" CORRUPTED"))).otherwise(col("text")))

  private val CorruptedSql =
    """(SELECT doc_id, source, lang, n_chars,
      |        CASE WHEN doc_id % 97 = 0 THEN text || ' CORRUPTED'
      |             ELSE text END AS text
      |      FROM documents)""".stripMargin

  private val DiffCols = Seq("doc_id", "source", "lang", "n_chars", "text")

  def defs: Seq[QueryDef] = Seq(

    // Row-level reconciliation drill-down (Reconcile.rowDiff): the step
    // after x239's bucket_match=false — semi-join both sides on the
    // broadcast mismatched-bucket set, re-group only those buckets'
    // rows by canonical hash, and emit every row whose multiplicity
    // differs. At the gate the output is exactly the every-97th
    // documents, twice each: side 'a' holding the original text, side
    // 'b' the corrupted text.
    QueryDef(
      "x240_row_diff",
      (s, dir) => {
        val d = Tables(s, dir).documents
        graft.ops.Reconcile.rowDiff(d, corrupted(d), DiffCols)
      },
      Some(graft.ops.Reconcile.rowDiffOracleSql(
        "documents", CorruptedSql, DiffCols))),

    // Feed-grain checksum diff (Reconcile.checksumDiffByGroup): x237's
    // per-source fingerprints compared side-by-side — one 3VL-safe
    // verdict per (source, bucket), so divergence localizes to WHICH
    // feed before any row-level work. Same corrupted-copy scenario as
    // x239/x240: the three verdicts corroborate.
    QueryDef(
      "x241_checksum_diff_by_group",
      (s, dir) => {
        val d = Tables(s, dir).documents
        val cols = Seq("doc_id", "lang", "n_chars", "text")
        graft.ops.Reconcile.checksumDiffByGroup(
          graft.ops.Reconcile.tableChecksumByGroup(d, "source", cols),
          graft.ops.Reconcile.tableChecksumByGroup(corrupted(d), "source", cols),
          "source")
      },
      Some(graft.ops.Reconcile.groupedDiffOracleSql(
        "documents",
        """(SELECT doc_id, source, lang, n_chars,
          |        CASE WHEN doc_id % 97 = 0 THEN text || ' CORRUPTED'
          |             ELSE text END AS text
          |      FROM documents)""".stripMargin,
        "source", Seq("doc_id", "lang", "n_chars", "text"))))
  )
}
