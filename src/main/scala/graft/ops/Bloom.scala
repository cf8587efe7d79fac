package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter ingest screen — the membership sketch that lets a 100 TB
  * corpus answer "have we already ingested this document?" without joining
  * every incoming batch against the full corpus. Build: each existing
  * document sets k bit positions derived from one md5 (Kirsch-Mitzenmacher
  * double hashing, pos_j = (h1 + j·h2) mod m — the same h1/h2 split the
  * MinHash family uses, so the DuckDB oracle replays it verbatim). Probe:
  * an incoming document is a MAYBE (bloom_hit) iff all k of its positions
  * are set; a miss is a GUARANTEED first sight — the screen has false
  * positives, never false negatives, which is the direction ingest dedup
  * needs (a miss skips the expensive exact check entirely).
  *
  * Spark shape: the build is one shuffle of k·N (doc, position) rows into
  * m/64 packed words (`bit_or` of single-bit masks — order-free, so the
  * distributed aggregation is deterministic); the packed filter collects to
  * the driver as a BOUNDED model (m/64 longs — the same contract as PQ
  * codebooks and k-means centroids) and rides into the probe as a literal
  * array column, making the probe side a pure codegen'd projection: zero
  * joins, zero shuffles, prunes before any exact-dedup machinery runs.
  * At production scale m grows with the corpus (~10 bits/doc); past the
  * point where m/64 longs comfortably broadcast (~2^30 bits), shard the
  * filter by ingest partition (per-date/per-source filters) — the build
  * and probe shapes are unchanged per shard.
  *
  * The returned frame carries the exact-membership audit column
  * (`exact_dup`, via an md5 anti-join against the existing corpus) so the
  * false-positive rate is measurable — that audit join is the cost the
  * screen EXISTS to avoid and is included here because this operator's
  * gate is an evaluation, not the production path.
  */
object Bloom {

  private def h1(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
  private def h2(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 9, 8), 16, 10).cast("long")

  /** Screen `incoming` against a Bloom filter built over `existing`.
    * Output: one row per incoming document — (id, bloom_hit, exact_dup),
    * with bloom_hit ⊇ exact_dup (no false negatives, by construction).
    */
  def screen(existing: DataFrame, incoming: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      mBits: Int = 65536, k: Int = 4): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    val nWords = mBits / 64

    // Build: k positions per existing doc -> packed 64-bit words.
    val posCols = (0 until k).map(j =>
      (h1(col(textCol)) + lit(j.toLong) * h2(col(textCol))) % mBits)
    val words = existing
      .select(explode(array(posCols: _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("widx"),
        expr("shiftleft(1L, cast(pos % 64 as int))").as("mask"))
      .groupBy("widx").agg(expr("bit_or(mask)").as("word"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val filterModel = array((0 until nWords)
      .map(i => lit(words.getOrElse(i, 0L))): _*)

    // Probe: pure projection against the literal filter — every hash,
    // index, and bit test inlines into one codegen'd expression per doc
    // (k is a small pinned constant, so the k-term AND is bounded, unlike
    // a model-sized fold).
    val withPos = incoming.select(
      (col(idCol) +: col(textCol) +: (0 until k).map(j =>
        ((h1(col(textCol)) + lit(j.toLong) * h2(col(textCol))) % mBits)
          .as(s"pos_$j"))): _*)
    val hitSql = (0 until k)
      .map(j => s"(element_at(fm, cast(pos_$j div 64 as int) + 1) & " +
        s"shiftleft(1L, cast(pos_$j % 64 as int))) != 0")
      .mkString(" AND ")
    val screened = withPos.withColumn("fm", filterModel)
      .selectExpr(idCol, textCol, s"cast($hitSql as int) as bloom_hit")

    // Exact audit: anti-join direction a production screen would skip on
    // bloom misses; kept unconditional here so the gate measures fp rate.
    val exHash = existing.select(md5(col(textCol).cast("binary")).as("eh")).distinct()
    screened
      .join(exHash, md5(col(textCol).cast("binary")) === col("eh"), "left")
      .select(col(idCol), col("bloom_hit"),
        when(col("eh").isNotNull, 1).otherwise(0).as("exact_dup"))
  }
}
