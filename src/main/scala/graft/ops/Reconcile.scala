package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-free table fingerprints for data reconciliation — "did the
  * migration/replica/backfill preserve every row?" answered with one
  * bounded exchange instead of a row-by-row diff. This is the operator a
  * team adopting this library against an existing warehouse runs FIRST:
  * the same fingerprint computed by any engine (the DuckDB twin is the
  * gate) matches iff the tables match, and a mismatch localizes to a
  * hash bucket so the expensive row-level diff runs on 1/nBuckets of the
  * data.
  *
  * Per row: a canonical string (columns joined on an unprintable
  * delimiter, NULL carried as an explicit sentinel — `concat_ws` SKIPS
  * nulls, which would make ("a", NULL) collide with ("a")) is md5-hashed
  * twice under different salts; 60-bit prefixes keep every value
  * positive in a signed BIGINT in both engines. Per bucket (pmod of the
  * row hash): the row count, two independent XOR accumulators
  * (order-free, overflow-free), and a modular SUM accumulator
  * (multiset-sensitive where XOR alone would cancel duplicate row
  * PAIRS; terms < 2³⁰ keep the BIGINT sum exact to ~8.5e9 rows per
  * bucket). Any single-row change flips all three of its bucket's
  * accumulators with overwhelming probability.
  *
  * Column discipline (ENFORCED since round 16): callers pass
  * STRING/INTEGER columns only — float→string rendering differs across
  * engines, so a raw FLOAT/DOUBLE column is rejected at every entry
  * point; canonicalize doubles with [[fixedPoint]] (the x221 grid
  * convention, with a DuckDB twin in [[fixedPointSql]]) first.
  *
  * Scale shape: one codegen'd projection + one map-side-combinable
  * aggregation into nBuckets groups — bounded state, shard-mergeable
  * (XOR and modular SUM both fold associatively), no joins, no windows.
  */
object Reconcile {

  private val Delim = "\u0001"
  private val NullSentinel = "\u0002NULL\u0002"
  private val SumMod = 1073741789L // largest prime < 2^30

  /** Names the family uses internally alongside the caller's payload
    * columns (rowDiff / applyRepair carry `cols` through their plans):
    * a payload column with one of these names would collide into an
    * ambiguous-reference analysis error deep inside the plan, so fail
    * fast with a real message instead. */
  private val Reserved = Set("bucket", "rh", "n", "n_a", "n_b", "side",
    "rn", "keep_n", "h1", "h2", "_i", "bucket_match",
    "present", "dup", "verdict", "changed_columns")

  private def requireUnreserved(cols: Seq[String]): Unit = {
    // Case-INSENSITIVE: Spark's default analyzer is, so a payload
    // column "Bucket" collides with the internal "bucket" just the same.
    val bad = cols.filter(c => Reserved.contains(c.toLowerCase))
    require(bad.isEmpty,
      s"column name(s) ${bad.mkString(", ")} collide with the " +
        "reconciliation family's internal names (bucket/rh/n/n_a/n_b/" +
        "side/rn/keep_n/h1/h2/_i/bucket_match/present/dup/verdict/" +
        "changed_columns); alias them first")
  }

  /** The column discipline, ENFORCED instead of documented: a raw
    * FLOAT/DOUBLE column must never enter a cross-engine fingerprint —
    * float→string rendering differs between engines (shortest-roundtrip
    * vs %g, negative zero, exponent thresholds), so the same bytes
    * would fingerprint differently and every verdict downstream would
    * be noise. Fail fast at the entry points with the fix in the
    * message rather than let the user discover it as a permanently
    * red bucket. */
  private def requireFingerprintable(df: DataFrame, cols: Seq[String],
      op: String): Unit = {
    import org.apache.spark.sql.types._
    // Recursive: an ARRAY<DOUBLE> or a struct with a float field casts
    // to string through the same engine-dependent float rendering as a
    // top-level double — the container must not smuggle it past the
    // guard.
    def hasFloat(dt: DataType): Boolean = dt match {
      case DoubleType | FloatType => true
      case a: ArrayType           => hasFloat(a.elementType)
      case m: MapType             => hasFloat(m.keyType) || hasFloat(m.valueType)
      case s: StructType          => s.fields.exists(f => hasFloat(f.dataType))
      case _                      => false
    }
    val floaty = cols.filter(c =>
      df.schema.fields.find(_.name.equalsIgnoreCase(c))
        .exists(f => hasFloat(f.dataType)))
    require(floaty.isEmpty,
      s"Reconcile.$op: column(s) ${floaty.mkString(", ")} contain " +
        "FLOAT/DOUBLE — float-to-string rendering differs across " +
        "engines, so a raw floating-point fingerprint is not a " +
        "cross-engine contract; canonicalize with " +
        "Reconcile.fixedPoint(col, scale) first (the x221 grid " +
        "convention)")
  }

  /** Canonicalize a floating-point column for fingerprinting: snap to
    * the 10^-scale fixed-point grid (floor(x·10^scale + 0.5) — the x221
    * grid convention, round-half-up) and land as BIGINT, which every
    * engine renders identically. Both engines evaluate the SAME IEEE
    * double product before the floor, so the snap is deterministic
    * cross-engine; [[fixedPointSql]] is the DuckDB spelling of this
    * expression, one definition for every oracle.
    *
    * Loud contract, not silent drift: NaN/±Inf raise (no grid point
    * exists — pre-filter or encode them explicitly), and |x|·10^scale
    * beyond the BIGINT envelope raises (Spark's double→long cast would
    * saturate silently while DuckDB errors — a cross-engine fork).
    * Above 2^53 the double grid is coarser than 1 so the snap loses
    * resolution, but it stays deterministic — both engines floor the
    * same double. */
  def fixedPoint(c: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0,9], got $scale")
    val d = c.cast("double")
    val scaled = d * lit(math.pow(10.0, scale)) // exact binary for scale <= 9
    when(isnan(d) || d === lit(Double.PositiveInfinity) ||
        d === lit(Double.NegativeInfinity),
      raise_error(lit("Reconcile.fixedPoint: non-finite value (NaN/Inf) " +
        "has no fixed-point grid cell; filter or encode non-finite " +
        "values before fingerprinting")).cast("long"))
      .when(abs(scaled) >= lit(9.0e18),
        raise_error(lit("Reconcile.fixedPoint: |x|*10^scale exceeds the " +
          "BIGINT envelope; lower the scale")).cast("long"))
      .otherwise(floor(scaled + lit(0.5)).cast("long"))
  }

  /** The DuckDB twin of [[fixedPoint]] over SQL expression `expr` —
    * the same IEEE product, floor, BIGINT landing, AND the same
    * conservative 9.0e18 envelope raise: DuckDB's own cast only errors
    * past 2^63 ≈ 9.223e18, so without the explicit guard the two
    * engines would fork on the band [9.0e18, 2^63) — Spark raising
    * while DuckDB computes. One raise predicate, both engines. */
  def fixedPointSql(expr: String, scale: Int): String = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0,9], got $scale")
    val d = s"CAST($expr AS DOUBLE)"
    val scaled = s"$d * 1e$scale"
    // The non-finite branch is EXPLICIT, not an accident of NaN
    // ordering: without it the envelope's ABS(x) >= 9.0e18 catches NaN
    // only because DuckDB sorts NaN above all values — parity with the
    // Spark twin's dedicated raise would be incidental and the error
    // message would diverge. One branch per failure mode, both engines.
    s"""CASE WHEN isnan($d) OR isinf($d)
       | THEN CAST(error('Reconcile.fixedPoint: non-finite value (NaN/Inf) ' ||
       |   'has no fixed-point grid cell') AS BIGINT)
       | WHEN ABS($scaled) >= 9.0e18
       | THEN CAST(error('Reconcile.fixedPoint: BIGINT envelope') AS BIGINT)
       | ELSE CAST(FLOOR($scaled + 0.5) AS BIGINT) END""".stripMargin
      .replace("\n", "")
  }

  /** Canonicalize a TIMESTAMP column for fingerprinting: the instant as
    * BIGINT microseconds since the epoch. Timestamp→string rendering
    * USUALLY agrees between engines, but it is exposure-prone in ways a
    * parity check must not be: fractional-second trimming rules differ
    * across engine versions, Spark renders instants in the SESSION
    * timezone (a fingerprint computed under another session TZ would
    * silently diverge), and naive-vs-instant parquet semantics
    * (isAdjustedToUTC) shift the rendered wall-clock. The epoch integer
    * is immune to all three — both engines hash the same BIGINT no
    * matter the session. [[epochMicrosSql]] is the DuckDB spelling
    * (epoch_us — naive timestamps treated as UTC, matching a UTC
    * session on the Spark side, the library-wide convention). Accepts
    * both TIMESTAMP and TIMESTAMP_NTZ (the type Spark gives
    * non-UTC-adjusted parquet): the cast is a no-op for instants and
    * interprets NTZ wall-clocks in the session timezone — under the
    * library's UTC-session convention, exactly epoch_us's reading of
    * the same naive parquet value. */
  def epochMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** The DuckDB twin of [[epochMicros]] over SQL expression `expr`. */
  def epochMicrosSql(expr: String): String = s"epoch_us($expr)"

  private def canonical(cols: Seq[String]): Column =
    concat_ws(Delim, cols.map(c =>
      coalesce(col(c).cast("string"), lit(NullSentinel))): _*)

  /** 60-bit salted row hash: positive in a signed 64-bit integer in
    * every engine (16 hex would need unsigned). */
  private def rowHash(canon: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), canon).cast("binary")), 1, 15),
      16, 10).cast("long")

  /** Fingerprint `df` over `cols` into `nBuckets` rows of
    * (bucket, n_rows, xor1, xor2, sum1). Buckets with no rows are
    * absent — a count mismatch, not a silent equality. */
  def tableChecksum(df: DataFrame, cols: Seq[String],
      nBuckets: Int = 64): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    requireFingerprintable(df, cols, "tableChecksum")
    require(nBuckets >= 1 && nBuckets <= 65536,
      s"unreasonable bucket count $nBuckets")
    val canon = canonical(cols)
    val h1 = rowHash(canon, "rc1|")
    val h2 = rowHash(canon, "rc2|")
    df.select(pmod(h1, lit(nBuckets.toLong)).as("bucket"),
        h1.as("h1"), h2.as("h2"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h1)").as("xor1"),
        expr("bit_xor(h2)").as("xor2"),
        sum(pmod(col("h1"), lit(SumMod))).as("sum1"))
  }

  /** [[tableChecksum]] per group — the feed-level reconciliation shape:
    * one fingerprint row per (group, bucket), so a mismatch localizes
    * to WHICH SOURCE diverged before any bucket drill-down. State is
    * |groups|·nBuckets rows; the scan and fold shapes are unchanged. */
  def tableChecksumByGroup(df: DataFrame, groupCol: String,
      cols: Seq[String], nBuckets: Int = 16): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    // The group key is not hashed, but it IS emitted as an output value
    // the comparison layer renders per engine — a FLOAT/DOUBLE group
    // key would make the grouped fingerprints unjoinable cross-engine
    // through the same rendering divergence the hashed columns are
    // guarded against.
    requireFingerprintable(df, cols :+ groupCol, "tableChecksumByGroup")
    require(!cols.contains(groupCol),
      "the group column partitions the fingerprint; include it in `cols` " +
        "only if it should ALSO be fingerprinted content")
    require(nBuckets >= 1 && nBuckets <= 65536,
      s"unreasonable bucket count $nBuckets")
    val canon = canonical(cols)
    val h1 = rowHash(canon, "rc1|")
    val h2 = rowHash(canon, "rc2|")
    df.select(col(groupCol), pmod(h1, lit(nBuckets.toLong)).as("bucket"),
        h1.as("h1"), h2.as("h2"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h1)").as("xor1"),
        expr("bit_xor(h2)").as("xor2"),
        sum(pmod(col("h1"), lit(SumMod))).as("sum1"))
  }

  /** The DuckDB spellings of the canonicalization, the salted 60-bit
    * row hash, and the bucket-fingerprint aggregation — ONE definition
    * each, used by EVERY oracle builder in the family. The hash and
    * sentinel conventions are the cross-engine contract the whole
    * family hangs on; they must never fork between oracles. */
  private def canonSql(cols: Seq[String]): String =
    cols.map(c =>
      s"COALESCE(CAST($c AS VARCHAR), chr(2) || 'NULL' || chr(2))")
      .mkString(s" || chr(1) || ")

  private def hashSql(salt: String, canon: String): String =
    s"CAST(('0x' || substring(md5('$salt' || ($canon)), 1, 15)) AS BIGINT)"

  private def fpSelectSql(rows: String, nBuckets: Int): String =
    s"""SELECT h1 % $nBuckets AS bucket,
       |       CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(bit_xor(h1) AS BIGINT) AS xor1,
       |       CAST(bit_xor(h2) AS BIGINT) AS xor2,
       |       CAST(SUM(h1 % $SumMod) AS BIGINT) AS sum1
       |  FROM $rows GROUP BY 1""".stripMargin

  /** The 3VL-safe bucket-match predicate between two fingerprint
    * aliases — the SQL spelling of [[fpDiff]]'s verdict, one
    * definition for every oracle builder. */
  private def matchPredSql(a: String, b: String): String =
    s"""$a.n_rows IS NOT NULL AND $b.n_rows IS NOT NULL
       |        AND $a.n_rows = $b.n_rows AND $a.xor1 = $b.xor1
       |        AND $a.xor2 = $b.xor2 AND $a.sum1 = $b.sum1""".stripMargin

  /** The mismatched-bucket CTE body shared by the drill-down oracles:
    * every bucket present on either side whose verdict is NOT a match
    * (an absent side fails the IS NOT NULL terms, so it is bad). */
  private def badCteSql(fpA: String, fpB: String): String =
    s"""SELECT COALESCE(a.bucket, b.bucket) AS bucket
       |  FROM $fpA a FULL OUTER JOIN $fpB b ON b.bucket = a.bucket
       |  WHERE NOT (${matchPredSql("a", "b")})""".stripMargin

  /** The DuckDB twin of [[tableChecksumByGroup]]. */
  def groupedOracleSql(from: String, groupCol: String, cols: Seq[String],
      nBuckets: Int = 16): String = {
    val canon = canonSql(cols)
    def h(salt: String) = hashSql(salt, canon)
    s"""WITH rows_ AS (
       |  SELECT $groupCol AS g, ${h("rc1|")} AS h1, ${h("rc2|")} AS h2
       |  FROM $from
       |)
       |SELECT g AS $groupCol, h1 % $nBuckets AS bucket,
       |       CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(bit_xor(h1) AS BIGINT) AS xor1,
       |       CAST(bit_xor(h2) AS BIGINT) AS xor2,
       |       CAST(SUM(h1 % $SumMod) AS BIGINT) AS sum1
       |FROM rows_ GROUP BY 1, 2""".stripMargin
  }

  /** The 3VL-safe per-bucket verdict and the prefixed full-outer diff —
    * ONE definition for the grouped and ungrouped diffs: a change to
    * the accumulator set (the verdict's terms) must never fork between
    * them. `keyCols` are the join keys beyond `bucket` (null-safe). */
  private def fpDiff(a: DataFrame, b: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val an = a.columns.map(c => col(c).as(s"a_$c")).toIndexedSeq
    val bn = b.columns.map(c => col(c).as(s"b_$c")).toIndexedSeq
    val cond = (keyCols.map(k => col(s"a_$k") <=> col(s"b_$k")) :+
      (col("a_bucket") === col("b_bucket"))).reduce(_ && _)
    a.select(an: _*).join(b.select(bn: _*), cond, "full_outer")
      .select((keyCols.map(k =>
          coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) :+
        coalesce(col("a_bucket"), col("b_bucket")).as("bucket") :+
        col("a_n_rows") :+ col("b_n_rows") :+
        (col("a_n_rows").isNotNull && col("b_n_rows").isNotNull &&
          col("a_n_rows") === col("b_n_rows") &&
          col("a_xor1") === col("b_xor1") &&
          col("a_xor2") === col("b_xor2") &&
          col("a_sum1") === col("b_sum1")).as("bucket_match")): _*)
  }

  /** Compare two fingerprints (same cols/nBuckets): one row per bucket
    * present on either side, with a match verdict — the localization
    * step of a reconciliation. */
  def checksumDiff(a: DataFrame, b: DataFrame): DataFrame =
    fpDiff(a, b, Nil).orderBy("bucket")

  /** The fingerprint accumulators' own merge algebra — ONE definition,
    * shared by [[checksumIncremental]] and the streaming
    * [[graft.streaming.Streams.checksumSink]]: counts and modular-sum
    * terms ADD, the two XOR accumulators XOR. All three operations are
    * associative and commutative, so any shard/batch order converges to
    * the same fingerprint. (The batch `sum1` is a plain BIGINT sum of
    * pre-reduced terms < 2³⁰, NOT re-reduced mod p — adding raw keeps
    * the identical overflow envelope, ~8.5e9 rows per bucket.) */
  private[graft] def mergeChecksums(parts: DataFrame): DataFrame =
    parts.groupBy("bucket")
      .agg(sum(col("n_rows")).as("n_rows"),
        expr("bit_xor(xor1)").as("xor1"),
        expr("bit_xor(xor2)").as("xor2"),
        sum(col("sum1")).as("sum1"))

  /** Incremental fingerprint maintenance — the x132/x139/x229
    * convention applied to the reconciliation family: the fingerprint
    * of (base ∪ delta) computed by FOLDING the two tables' own
    * fingerprints ([[mergeChecksums]]) rather than re-scanning base.
    * The gate hash-matches the full-recompute oracle VERBATIM, proving
    * the fold exact cross-engine — which is what lets a 100 TB
    * warehouse maintain its parity fingerprint by pricing only the
    * day's delta partition, and is the batch proof of the streaming
    * sink's convergence claim. */
  def checksumIncremental(base: DataFrame, delta: DataFrame,
      cols: Seq[String], nBuckets: Int = 64): DataFrame =
    mergeChecksums(
      tableChecksum(base, cols, nBuckets)
        .unionByName(tableChecksum(delta, cols, nBuckets)))
      .orderBy("bucket")

  /** Compare two grouped fingerprints ([[tableChecksumByGroup]] outputs
    * keyed on the same groupCol/cols/nBuckets): one verdict row per
    * (group, bucket) present on either side — the feed-grain
    * localization that completes the fingerprint/localize/drill triad
    * at source level. NULL group keys match each other (null-safe
    * equality), so a NULL-sourced feed reconciles like any other. */
  def checksumDiffByGroup(a: DataFrame, b: DataFrame,
      groupCol: String): DataFrame = {
    // Same group-key discipline as tableChecksumByGroup: the verdict
    // table carries the group value as an emitted key, so a float here
    // would fork the comparison layer even though nothing hashes it.
    requireFingerprintable(a, Seq(groupCol), "checksumDiffByGroup")
    requireFingerprintable(b, Seq(groupCol), "checksumDiffByGroup")
    fpDiff(a, b, Seq(groupCol)).orderBy(groupCol, "bucket")
  }

  /** Row-level drill-down — the step a user takes immediately after a
    * `bucket_match = false` verdict: re-fingerprint both sides, take the
    * MISMATCHED bucket set (tiny — it broadcasts), and scan each side
    * once more keeping only rows that hash into a mismatched bucket (a
    * broadcast left-semi join, so the expensive per-row grouping touches
    * ~|bad|/nBuckets of each table — the bucketing's entire purpose).
    * Surviving rows are grouped by their canonical hash per side and
    * full-outer matched: any hash whose multiplicities differ is a
    * genuinely differing row, emitted as (side, bucket, row, n_a, n_b)
    * where `side` names the side holding the surplus. Equal tables
    * return zero rows without any row-level work at all (empty bucket
    * set ⇒ empty semi-join).
    *
    * Scale shape: two fingerprint aggregations (nBuckets rows each), one
    * broadcast of the mismatched bucket ids, two filtered scans, and a
    * hash-grouped full-outer join whose input is only the rows of the
    * mismatched buckets. Nothing row-sized ever reaches the driver. */
  def rowDiff(a: DataFrame, b: DataFrame, cols: Seq[String],
      nBuckets: Int = 64): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    requireUnreserved(cols)
    requireFingerprintable(a, cols, "rowDiff")
    requireFingerprintable(b, cols, "rowDiff")
    require(nBuckets >= 1 && nBuckets <= 65536,
      s"unreasonable bucket count $nBuckets")
    // The mismatched-bucket set is referenced by BOTH sides' semi-joins,
    // and Spark does not dedupe identical plan subtrees across branches
    // (no ReusedExchange in this shape, verified round 16) — without
    // pinning, the two fingerprint aggregations (two full corpus scans)
    // would run once PER SIDE. A lazy localCheckpoint makes the ≤
    // nBuckets-row set compute-once by construction: the first branch
    // materializes it, the second reads the persisted blocks. Laziness
    // is preserved (eager = false); the blocks are a one-shot
    // operator's bounded state (≤ 64 rows), released by GC.
    val bad = checksumDiff(tableChecksum(a, cols, nBuckets),
        tableChecksum(b, cols, nBuckets))
      .filter(!col("bucket_match")).select("bucket")
      .localCheckpoint(false)
    def grouped(df: DataFrame, p: String): DataFrame = {
      val canon = canonical(cols)
      val h1 = rowHash(canon, "rc1|")
      df.select(pmod(h1, lit(nBuckets.toLong)).as("bucket") +:
          h1.as("rh") +: cols.map(col): _*)
        .join(broadcast(bad), Seq("bucket"), "left_semi")
        .groupBy(col("bucket") +: col("rh") +: cols.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .select(col("bucket").as(s"${p}_bucket") +: col("rh").as(s"${p}_rh") +:
          col("n").as(s"${p}_n") +: cols.map(c => col(c).as(s"${p}_$c")): _*)
    }
    val ga = grouped(a, "a")
    val gb = grouped(b, "b")
    // Match on the hash AND the carried content (null-safe): at the
    // 100 TB regime a 60-bit hash has even odds of a collision by
    // ~2^30 rows, and two DISTINCT rows sharing rh must not
    // cross-match into a wrong diff. rh stays first as the cheap
    // equi-join prefix; the content conjuncts make the match exact.
    val matchCond = (col("a_rh") === col("b_rh")) && cols
      .map(c => col(s"a_$c") <=> col(s"b_$c")).reduce(_ && _)
    ga.join(gb, matchCond, "full_outer")
      .withColumn("n_a", coalesce(col("a_n"), lit(0L)))
      .withColumn("n_b", coalesce(col("b_n"), lit(0L)))
      .filter(col("n_a") =!= col("n_b"))
      .select((when(col("n_a") > col("n_b"), lit("a")).otherwise(lit("b"))
          .as("side") +:
        coalesce(col("a_bucket"), col("b_bucket")).as("bucket") +:
        cols.map(c => coalesce(col(s"a_$c"), col(s"b_$c")).as(c))) ++
        Seq(col("n_a"), col("n_b")): _*)
      .orderBy(col("bucket") +: cols.map(col) :+ col("side"): _*)
  }

  /** Keyed update classification of the drill-down — [[rowDiff]]'s
    * multiset surplus turned into the changelog a warehouse team
    * actually applies. With `keyCols` a primary key on both sides, an
    * a-surplus row and a b-surplus row sharing a key are the two
    * versions of ONE updated row; pairing them on the key yields, per
    * divergent key: `insert` (a-only — the divergent side b is missing
    * the row), `delete` (b-only — b holds a row the reference lacks),
    * or `update` with `changed_columns` naming exactly the payload
    * columns whose values differ (comma-joined in `cols` order,
    * null-safe comparison so NULL↔value counts as a change).
    *
    * Keys must be UNIQUE per side — classification is only meaningful
    * against a primary key. The guard catches every violation the DIFF
    * CAN SEE: a key holding more than one surplus row on either side
    * (the window), or a surplus row with multiplicity beyond the clean
    * (1,0)/(0,1), e.g. the same bytes once in a and twice in b (the
    * n_a+n_b ≠ 1 check) — those raise in-plan, lazily, at the cost of
    * one window over the divergence-bounded surplus. It is necessarily
    * PARTIAL: a duplicate key whose second copy is byte-identical on
    * BOTH sides never enters the diff, so its surviving surplus row
    * classifies as a clean insert/delete — diff-invisible violations
    * are the caller's contract, not the guard's. The DuckDB twin
    * ([[rowDiffByKeyOracleSql]]) has NO guard at all and classifies
    * PK-violating data where Spark raises — on violating inputs the
    * two engines intentionally diverge (loud vs permissive), so gates
    * must feed key-unique data. Un-keyed multisets stay [[rowDiff]]'s
    * domain. NULL key components pair null-safely, so a NULL-keyed row
    * classifies like any other.
    *
    * Scale shape: [[rowDiff]]'s cost (the bucket-localized drill-down)
    * plus one window and one key-equality full-outer join, both over
    * ONLY the surplus rows — divergence-bounded, never corpus-sized. */
  def rowDiffByKey(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      cols: Seq[String], nBuckets: Int = 64): DataFrame =
    classified(a, b, keyCols, cols, nBuckets)
      .select(keyCols.map(col) ++
        Seq(col("verdict"), col("changed_columns")): _*)
      .orderBy(keyCols.map(col) :+ col("verdict"): _*)

  /** [[rowDiffByKey]] WITH the new row content — the changelog a
    * downstream MERGE can actually execute: alongside each divergent
    * key's verdict and changed-column list, the payload columns carry
    * the REFERENCE side's values (the row to insert, the update's new
    * image; NULL for deletes, which need only the key). This is the
    * bridge from classification to action: [[applyChangelog]] consumes
    * it verbatim, a `verdict`→`action` rename feeds it straight into
    * the streaming CDC apply sink
    * ([[graft.streaming.Streams.changelogSink]] — pinned in
    * StreamingSpec), and a warehouse team holding the x246 verdicts no
    * longer recomputes the multiset diff to act on them. Same primary-
    * key contract, guard, and scale shape as [[rowDiffByKey]] — the
    * classification join is shared code, so the two can never fork. */
  def changelog(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      cols: Seq[String], nBuckets: Int = 64): DataFrame =
    classified(a, b, keyCols, cols, nBuckets)
      .orderBy(keyCols.map(col) :+ col("verdict"): _*)

  /** The shared classification join of [[rowDiffByKey]] and
    * [[changelog]]: (keys, verdict, changed_columns, reference-side
    * payload). ONE definition — a guard or verdict change must never
    * fork between the verdict-only and payload-carrying spellings. */
  private def classified(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      cols: Seq[String], nBuckets: Int): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(cols.nonEmpty, "at least one payload column")
    require(keyCols.intersect(cols).isEmpty,
      "key and payload columns must be disjoint")
    val all = keyCols ++ cols
    // dd is consumed by BOTH sides of the key-pairing join below; the
    // lazy checkpoint pins the divergence-bounded drill-down (two
    // bucket-filtered corpus scans + row join + window) compute-once.
    // Probe-gated (round 16): neutral at sf0.1 (0.94 vs 0.95 s
    // isolated median) — kept because it halves the drill-down's
    // corpus scans at warehouse scale, where the saved work dominates
    // the bounded materialization.
    val dd = keyGuardedDiff(a, b, keyCols, cols, nBuckets)
      .localCheckpoint(false)
    def sideRows(tag: String): DataFrame = dd.filter(col("side") === tag)
      .select(all.map(c => col(c).as(s"${tag}_$c")) ++
        Seq(lit(1).as(s"${tag}_present"), col("dup").as(s"${tag}_dup")): _*)
    val aS = sideRows("a") // rows only the reference holds -> INSERT into b
    val bS = sideRows("b") // rows only the divergent side holds -> DELETE
    val cond = keyCols.map(k => col(s"a_$k") <=> col(s"b_$k")).reduce(_ && _)
    val verdict =
      when(coalesce(col("a_dup"), lit(false)) ||
          coalesce(col("b_dup"), lit(false)),
        raise_error(lit("Reconcile.rowDiffByKey: a key holds more than " +
          "one differing row, or a differing row with multiplicity > 1, " +
          "on one side — keyCols are not a primary key here, so insert/" +
          "delete/update classification would be wrong; use rowDiff " +
          "for multiset semantics")).cast("string"))
        .when(col("b_present").isNull, lit("insert"))
        .when(col("a_present").isNull, lit("delete"))
        .otherwise(lit("update"))
    // concat_ws skips NULLs in both engines, so unchanged columns
    // (their `when` yields NULL) simply drop out of the list.
    val changed = when(
      col("a_present").isNotNull && col("b_present").isNotNull,
      concat_ws(",", cols.map(c =>
        when(!(col(s"a_$c") <=> col(s"b_$c")), lit(c))): _*))
    aS.join(bS, cond, "full_outer")
      .select(keyCols.map(k => coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) ++
        Seq(verdict.as("verdict"), changed.as("changed_columns")) ++
        // The reference side's payload: the new row image for inserts
        // and updates; deletes carry NULLs (a-side absent).
        cols.map(c => col(s"a_$c").as(c)): _*)
  }

  /** Execute a [[changelog]] against the divergent side — the keyed twin
    * of [[applyRepair]], and the closing arc of the CDC symmetry:
    * fingerprint → localize → drill → CLASSIFY → APPLY → re-verify.
    * Deletes drop their key's row, updates replace the row's payload
    * with the carried new image, inserts add theirs — exactly the
    * [[Upsert.upsert]] MERGE shape (changed rows UNION the anti-joined
    * pass-through), driven by the changelog's verdicts instead of a
    * raw update batch.
    *
    * Contract: `changelog` came from [[changelog]] over the same
    * keyCols/cols (so keys are unique and the new images are the
    * reference side's); `b` is keyed by keyCols. Applying the changelog
    * makes b row-equal to the reference side a.
    *
    * Scale shape: the changelog is divergence-bounded, so it BROADCASTS
    * onto b's single scan (a null-safe anti join — NULL keys must
    * replace their row, not duplicate it, the [[Upsert.upsert]]
    * lesson); the inserted/updated rows are a projection of the
    * changelog itself. No window, no shuffle of b, one corpus scan. */
  def applyChangelog(b: DataFrame, changelog: DataFrame,
      keyCols: Seq[String], cols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(cols.nonEmpty, "at least one payload column")
    requireUnreserved(keyCols ++ cols)
    // The changelog feeds BOTH the anti-join (all verdicts mask their
    // key's existing row — an update must not keep the old image) and
    // the new-image union; the lazy checkpoint pins the bounded rows
    // compute-once, same as applyRepair's diff argument.
    val planned = changelog.localCheckpoint(false)
    val keys = broadcast(
      planned.select(keyCols.map(k => col(k).as(s"_cl_$k")): _*))
    // FRAME references, not bare names (the applyRepair convention): a
    // payload column that happens to be named _cl_<key> would make the
    // bare-name join condition ambiguous; resolving each side through
    // its own frame keeps the condition exact for any column names.
    val bsel = b.select((keyCols ++ cols).map(col): _*)
    val cond = keyCols.map(k => bsel(k) <=> keys(s"_cl_$k")).reduce(_ && _)
    val untouched = bsel.join(keys, cond, "left_anti")
    val newImages = planned.filter(col("verdict") =!= "delete")
      .select((keyCols ++ cols).map(col): _*)
    untouched.unionByName(newImages)
  }

  /** [[rowDiffByKey]]'s drill-down + primary-key-guard subtree, BEFORE
    * the compute-once checkpoint hides it behind an RDD scan — split
    * out so PlanSpec can pin its shape (the guard window partitions by
    * (side, key) over ONLY the surplus rows; the corpus appears only
    * under the x240 bucket-localized scans). A primary key on both
    * sides means every diff row is a clean (1,0) or (0,1): more than
    * one differing row per (side, key) is a two-versions-on-one-side
    * violation (the window), and n_a+n_b != 1 is a MULTIPLICITY
    * violation the window alone cannot see — e.g. the same bytes once
    * in a and twice in b emit a single side-b row with (n_a, n_b) =
    * (1, 2), which would otherwise masquerade as a clean delete. */
  private[graft] def keyGuardedDiff(a: DataFrame, b: DataFrame,
      keyCols: Seq[String], cols: Seq[String], nBuckets: Int): DataFrame = {
    val d = rowDiff(a, b, keyCols ++ cols, nBuckets)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("side") +: keyCols.map(col): _*)
    d.withColumn("dup",
      (count(lit(1)).over(w) > 1L) || (col("n_a") + col("n_b") =!= 1L))
  }

  /** Executable repair — the final step of the reconciliation loop
    * (fingerprint → localize → drill → REPAIR → re-verify): apply a
    * [[rowDiff]] plan to the divergent side so it becomes multiset-equal
    * to the reference side. Per planned row hash the target multiplicity
    * is `n_a`: surplus copies are dropped (any copies — they are
    * byte-identical by construction, so which ones is immaterial) and
    * missing copies are replicated from the diff's own carried row.
    *
    * Scale shape: the plan is bounded by the divergence size, so it
    * BROADCASTS; untouched rows pass through an anti-join with no
    * window; only the planned row-hash groups are renumbered (a window
    * over plan-bounded rows). Equal tables repair to themselves with
    * zero row-level work. */
  def applyRepair(b: DataFrame, diff: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    requireUnreserved(cols)
    requireFingerprintable(b, cols, "applyRepair")
    val canon = canonical(cols)
    val h = rowHash(canon, "rc1|")
    // The diff is consumed TWICE here (the broadcast repair plan and
    // the insert replication) and its upstream is typically the full
    // rowDiff plan — two corpus fingerprint passes per evaluation. A
    // lazy localCheckpoint pins the divergence-bounded rows so both
    // consumers read the same materialized blocks instead of
    // re-deriving the diff from the corpus (the same justification as
    // broadcasting it: the repair plan is bounded by the divergence).
    val planned = diff.localCheckpoint(false)
    // The plan carries the CONTENT, not just the hash: a 60-bit hash
    // collision between a planned row and an innocent identical-on-both-
    // sides row of b must not pull the innocent row into the renumber
    // (where keep_n could silently delete it). Plan columns are
    // _p-prefixed and matched null-safely alongside rh.
    val plan = planned.select(h.as("rh") +: col("n_a").as("keep_n") +:
      col("n_b").as("plan_n_b") +: cols.map(c => col(c).as(s"_p_$c")): _*)
    val bk = b.select(cols.map(col) :+ h.as("rh"): _*)
    val bplan = broadcast(plan)
    val cond = (bk("rh") === bplan("rh")) && cols
      .map(c => bk(c) <=> bplan(s"_p_$c")).reduce(_ && _)
    val untouched = bk.join(bplan, cond, "left_anti")
      .select(cols.map(col): _*)
    val touchedKept = bk.join(bplan, cond)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(bk("rh") +: cols.map(bk(_)): _*)
          .orderBy(bk("rh"))))
      .filter(col("rn") <= col("keep_n"))
      .select(cols.map(bk(_)): _*)
    val inserts = planned.filter(col("n_a") > col("n_b"))
      .withColumn("_i", explode(sequence(lit(1L), col("n_a") - col("n_b"))))
      .select(cols.map(col): _*)
    untouched.unionByName(touchedKept).unionByName(inserts)
  }

  /** The shared fingerprint CTE pair for the oracle builders: a hashed
    * rows CTE and its bucket-grouped fingerprint, with suffixed names so
    * two sides can coexist in one WITH clause. */
  private def oracleCtes(from: String, cols: Seq[String], nBuckets: Int,
      suffix: String): String = {
    val canon = canonSql(cols)
    def h(salt: String) = hashSql(salt, canon)
    s"""rows_$suffix AS (
       |  SELECT ${h("rc1|")} AS h1, ${h("rc2|")} AS h2 FROM $from
       |), fp_$suffix AS (
       |  ${fpSelectSql(s"rows_$suffix", nBuckets)}
       |)""".stripMargin
  }

  /** The DuckDB twin of [[tableChecksum]] over relation `from`. */
  def oracleSql(from: String, cols: Seq[String], nBuckets: Int = 64): String =
    s"""WITH ${oracleCtes(from, cols, nBuckets, "a")}
       |SELECT bucket, n_rows, xor1, xor2, sum1 FROM fp_a""".stripMargin

  /** The DuckDB twin of [[checksumDiff]] over two relations fingerprinted
    * with the same cols/nBuckets. */
  def diffOracleSql(fromA: String, fromB: String, cols: Seq[String],
      nBuckets: Int = 64): String =
    s"""WITH ${oracleCtes(fromA, cols, nBuckets, "a")},
       |${oracleCtes(fromB, cols, nBuckets, "b")}
       |SELECT COALESCE(a.bucket, b.bucket) AS bucket,
       |       a.n_rows AS a_n_rows, b.n_rows AS b_n_rows,
       |       (${matchPredSql("a", "b")}) AS bucket_match
       |FROM fp_a a FULL OUTER JOIN fp_b b ON b.bucket = a.bucket
       |ORDER BY 1""".stripMargin

  /** The DuckDB twin of [[checksumDiffByGroup]] — the two grouped
    * fingerprints are the [[groupedOracleSql]] text VERBATIM as
    * subqueries, so the grouped-diff oracle can never drift from the
    * grouped-fingerprint oracle. */
  def groupedDiffOracleSql(fromA: String, fromB: String, groupCol: String,
      cols: Seq[String], nBuckets: Int = 16): String =
    s"""SELECT COALESCE(a.$groupCol, b.$groupCol) AS $groupCol,
       |       COALESCE(a.bucket, b.bucket) AS bucket,
       |       a.n_rows AS a_n_rows, b.n_rows AS b_n_rows,
       |       (${matchPredSql("a", "b")}) AS bucket_match
       |FROM (${groupedOracleSql(fromA, groupCol, cols, nBuckets)}) a
       |FULL OUTER JOIN (${groupedOracleSql(fromB, groupCol, cols, nBuckets)}) b
       |  ON (b.$groupCol IS NOT DISTINCT FROM a.$groupCol)
       |     AND b.bucket = a.bucket
       |ORDER BY 1, 2""".stripMargin

  /** The [[rowDiff]] oracle's CTE chain (hashed rows → fingerprints →
    * mismatched buckets → bucket-filtered per-row multiplicities) and
    * its diff SELECT — split so [[rowDiffOracleSql]] and
    * [[rowDiffByKeyOracleSql]] are built from the SAME text: the keyed
    * classification must classify exactly the diff the row drill-down
    * emits, never a fork of it. */
  private def rowDiffCtesSql(fromA: String, fromB: String,
      cols: Seq[String], nBuckets: Int): String = {
    val canon = canonSql(cols)
    def h(salt: String) = hashSql(salt, canon)
    val colList = cols.mkString(", ")
    val rowGroup = (1 to cols.length + 2).mkString(", ")
    def fpCte(rows: String) = fpSelectSql(rows, nBuckets)
    def rowCte(rows: String) =
      s"""SELECT h1 % $nBuckets AS bucket, h1, $colList,
         |       CAST(COUNT(*) AS BIGINT) AS n
         |  FROM $rows WHERE h1 % $nBuckets IN (SELECT bucket FROM bad)
         |  GROUP BY $rowGroup""".stripMargin
    s"""ra AS (
       |  SELECT $colList, ${h("rc1|")} AS h1, ${h("rc2|")} AS h2
       |  FROM $fromA
       |), rb AS (
       |  SELECT $colList, ${h("rc1|")} AS h1, ${h("rc2|")} AS h2
       |  FROM $fromB
       |), fa AS (
       |  ${fpCte("ra")}
       |), fb AS (
       |  ${fpCte("rb")}
       |), bad AS (
       |  ${badCteSql("fa", "fb")}
       |), ga AS (
       |  ${rowCte("ra")}
       |), gb AS (
       |  ${rowCte("rb")}
       |)""".stripMargin
  }

  private def rowDiffSelectSql(cols: Seq[String]): String =
    s"""SELECT CASE WHEN COALESCE(ga.n, 0) > COALESCE(gb.n, 0)
       |            THEN 'a' ELSE 'b' END AS side,
       |       COALESCE(ga.bucket, gb.bucket) AS bucket,
       |       ${cols.map(c => s"COALESCE(ga.$c, gb.$c) AS $c").mkString(", ")},
       |       CAST(COALESCE(ga.n, 0) AS BIGINT) AS n_a,
       |       CAST(COALESCE(gb.n, 0) AS BIGINT) AS n_b
       |FROM ga FULL OUTER JOIN gb ON gb.h1 = ga.h1
       |  ${cols.map(c => s"AND gb.$c IS NOT DISTINCT FROM ga.$c").mkString(" ")}
       |WHERE COALESCE(ga.n, 0) <> COALESCE(gb.n, 0)""".stripMargin

  /** The DuckDB twin of [[rowDiff]]: same fingerprint → mismatched
    * bucket set → bucket-filtered per-row multiplicity compare. */
  def rowDiffOracleSql(fromA: String, fromB: String, cols: Seq[String],
      nBuckets: Int = 64): String =
    s"""WITH ${rowDiffCtesSql(fromA, fromB, cols, nBuckets)}
       |${rowDiffSelectSql(cols)}
       |ORDER BY 2, ${(3 to cols.length + 2).mkString(", ")}, 1""".stripMargin

  /** The keyed-classification text shared — ONE definition each — by
    * [[rowDiffByKeyOracleSql]] and [[changelogRoundtripOracleSql]]: the
    * side-split CTEs over the drill-down `d`, the null-safe key
    * pairing, and the verdict CASE. A verdict or pairing change must
    * never fork between the verdict-only and roundtrip oracles (the
    * same discipline as the Spark side's shared `classified` join). */
  private def classifySideCtesSql(all: Seq[String]): String = {
    val allList = all.mkString(", ")
    s"""s_a AS (
       |  SELECT $allList, 1 AS present FROM d WHERE side = 'a'
       |), s_b AS (
       |  SELECT $allList, 1 AS present FROM d WHERE side = 'b'
       |)""".stripMargin
  }

  private def classifyKeyJoinSql(keyCols: Seq[String]): String =
    keyCols.map(k => s"b.$k IS NOT DISTINCT FROM a.$k").mkString(" AND ")

  private val VerdictCaseSql =
    """CASE WHEN b.present IS NULL THEN 'insert'
      |            WHEN a.present IS NULL THEN 'delete'
      |            ELSE 'update' END""".stripMargin

  /** The DuckDB twin of [[rowDiffByKey]]: the [[rowDiffOracleSql]] text
    * VERBATIM as a `d` CTE (the classification must never fork from the
    * drill-down it classifies), split by side and paired on the key. */
  def rowDiffByKeyOracleSql(fromA: String, fromB: String,
      keyCols: Seq[String], cols: Seq[String],
      nBuckets: Int = 64): String = {
    val all = keyCols ++ cols
    val changed = cols.map(c =>
      s"CASE WHEN a.$c IS DISTINCT FROM b.$c THEN '$c' END").mkString(", ")
    s"""WITH ${rowDiffCtesSql(fromA, fromB, all, nBuckets)}, d AS (
       |${rowDiffSelectSql(all)}
       |), ${classifySideCtesSql(all)}
       |SELECT ${keyCols.map(k => s"COALESCE(a.$k, b.$k) AS $k").mkString(", ")},
       |       $VerdictCaseSql AS verdict,
       |       CASE WHEN a.present IS NOT NULL AND b.present IS NOT NULL
       |            THEN concat_ws(',', $changed) END AS changed_columns
       |FROM s_a a FULL OUTER JOIN s_b b ON ${classifyKeyJoinSql(keyCols)}
       |ORDER BY ${(1 to keyCols.length + 1).mkString(", ")}""".stripMargin
  }

  /** The DuckDB twin of the full CHANGELOG roundtrip (x248's gate):
    * keyed changelog → apply → re-fingerprint → verdicts. The changelog
    * CTE is the [[rowDiffByKeyOracleSql]] classification VERBATIM plus
    * the reference side's payload (the new row images); the apply is
    * the MERGE shape (anti-joined pass-through UNION non-delete
    * images); the re-fingerprint re-hashes the applied rows from their
    * columns and compares bucket-by-bucket against the reference
    * fingerprint. Output: one row of (n_inserts, n_deletes, n_updates,
    * n_buckets, n_matched, applied_ok). */
  def changelogRoundtripOracleSql(fromA: String, fromB: String,
      keyCols: Seq[String], cols: Seq[String],
      nBuckets: Int = 64): String = {
    val all = keyCols ++ cols
    val allList = all.mkString(", ")
    val canon = canonSql(all)
    def h(salt: String) = hashSql(salt, canon)
    val clKeyJoin = keyCols
      .map(k => s"cl.$k IS NOT DISTINCT FROM rb.$k").mkString(" AND ")
    s"""WITH ${rowDiffCtesSql(fromA, fromB, all, nBuckets)}, d AS (
       |${rowDiffSelectSql(all)}
       |), ${classifySideCtesSql(all)}, cl AS (
       |  SELECT ${keyCols.map(k => s"COALESCE(a.$k, b.$k) AS $k").mkString(", ")},
       |         $VerdictCaseSql AS verdict,
       |         ${cols.map(c => s"a.$c AS $c").mkString(", ")}
       |  FROM s_a a FULL OUTER JOIN s_b b ON ${classifyKeyJoinSql(keyCols)}
       |), applied AS (
       |  SELECT $allList FROM rb
       |   WHERE NOT EXISTS (SELECT 1 FROM cl WHERE $clKeyJoin)
       |  UNION ALL
       |  SELECT $allList FROM cl WHERE verdict <> 'delete'
       |), rap AS (
       |  SELECT ${h("rc1|")} AS h1, ${h("rc2|")} AS h2 FROM applied
       |), fap AS (
       |  ${fpSelectSql("rap", nBuckets)}
       |), cmp AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |         CAST(COALESCE(SUM(CASE WHEN ${matchPredSql("a", "r")}
       |                THEN 1 ELSE 0 END), 0)
       |              AS BIGINT) AS n_matched
       |  FROM fa a FULL OUTER JOIN fap r ON r.bucket = a.bucket
       |), acts AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN verdict = 'insert'
       |                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_inserts,
       |         CAST(COALESCE(SUM(CASE WHEN verdict = 'delete'
       |                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_deletes,
       |         CAST(COALESCE(SUM(CASE WHEN verdict = 'update'
       |                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_updates
       |  FROM cl
       |)
       |SELECT acts.n_inserts, acts.n_deletes, acts.n_updates,
       |       cmp.n_buckets, cmp.n_matched,
       |       (cmp.n_buckets = cmp.n_matched) AS applied_ok
       |FROM acts CROSS JOIN cmp""".stripMargin
  }

  /** The DuckDB twin of the full repair roundtrip (x244's gate): diff →
    * repair → re-fingerprint → verdicts. Like the Spark side, the diff
    * and the repair match on the hash AND the carried content
    * (IS NOT DISTINCT FROM per column), so a 60-bit hash collision can
    * never cross-match distinct rows; the re-fingerprint then needs
    * only the (h1, h2) pairs. Output: one row of (n_inserts, n_deletes,
    * n_buckets, n_matched, repaired_ok). */
  def repairRoundtripOracleSql(fromA: String, fromB: String,
      cols: Seq[String], nBuckets: Int = 64): String = {
    val canon = canonSql(cols)
    def h(salt: String) = hashSql(salt, canon)
    def fpCte(rows: String) = fpSelectSql(rows, nBuckets)
    val colList = cols.mkString(", ")
    val rowGroup = (1 to cols.length + 1).mkString(", ")
    def hashCte(rows: String) =
      s"""SELECT h1, $colList, MAX(h2) AS h2, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM $rows WHERE h1 % $nBuckets IN (SELECT bucket FROM bad)
         |  GROUP BY $rowGroup""".stripMargin
    def contentEq(l: String, r: String) =
      cols.map(c => s"$r.$c IS NOT DISTINCT FROM $l.$c").mkString(" AND ")
    s"""WITH ra AS (
       |  SELECT $colList, ${h("rc1|")} AS h1, ${h("rc2|")} AS h2
       |  FROM $fromA
       |), rb AS (
       |  SELECT $colList, ${h("rc1|")} AS h1, ${h("rc2|")} AS h2
       |  FROM $fromB
       |), fa AS (
       |  ${fpCte("ra")}
       |), fb AS (
       |  ${fpCte("rb")}
       |), bad AS (
       |  ${badCteSql("fa", "fb")}
       |), ga AS (
       |  ${hashCte("ra")}
       |), gb AS (
       |  ${hashCte("rb")}
       |), d AS (
       |  SELECT COALESCE(ga.h1, gb.h1) AS h1,
       |         COALESCE(ga.h2, gb.h2) AS h2,
       |         ${cols.map(c => s"COALESCE(ga.$c, gb.$c) AS $c").mkString(", ")},
       |         CAST(COALESCE(ga.n, 0) AS BIGINT) AS n_a,
       |         CAST(COALESCE(gb.n, 0) AS BIGINT) AS n_b
       |  FROM ga FULL OUTER JOIN gb ON gb.h1 = ga.h1
       |    AND ${contentEq("ga", "gb")}
       |  WHERE COALESCE(ga.n, 0) <> COALESCE(gb.n, 0)
       |), bnum AS (
       |  SELECT h1, h2, $colList,
       |         row_number() OVER (PARTITION BY h1, $colList) AS rn
       |  FROM rb
       |), kept AS (
       |  SELECT b.h1, b.h2 FROM bnum b LEFT JOIN d ON d.h1 = b.h1
       |    AND ${contentEq("b", "d")}
       |  WHERE d.h1 IS NULL OR b.rn <= d.n_a
       |), ins AS (
       |  SELECT d.h1, d.h2
       |  FROM d, UNNEST(generate_series(1, CAST(d.n_a - d.n_b AS BIGINT)))
       |  WHERE d.n_a > d.n_b
       |), rep AS (
       |  SELECT h1, h2 FROM kept UNION ALL SELECT h1, h2 FROM ins
       |), fr AS (
       |  ${fpCte("rep")}
       |), cmp AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |         CAST(COALESCE(SUM(CASE WHEN ${matchPredSql("a", "r")}
       |                THEN 1 ELSE 0 END), 0)
       |              AS BIGINT) AS n_matched
       |  FROM fa a FULL OUTER JOIN fr r ON r.bucket = a.bucket
       |), acts AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN n_a > n_b THEN n_a - n_b
       |                ELSE 0 END), 0) AS BIGINT) AS n_inserts,
       |         CAST(COALESCE(SUM(CASE WHEN n_b > n_a THEN n_b - n_a
       |                ELSE 0 END), 0) AS BIGINT) AS n_deletes
       |  FROM d
       |)
       |SELECT acts.n_inserts, acts.n_deletes, cmp.n_buckets, cmp.n_matched,
       |       (cmp.n_buckets = cmp.n_matched) AS repaired_ok
       |FROM acts CROSS JOIN cmp""".stripMargin
  }
}
