package graft

import graft.ext.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality CONTRACTS for the measurement-only evaluators (round-9
  * directive, mirroring the x89 ANN-recall contract at ExtSpec): x156
  * language-ID precision/recall, x152 ranker agreement (Kendall τ), and
  * x114 MinHash calibration. The gates MEASURE these metrics; these
  * tests pin FLOORS, so a silently-regressed classifier/ranker/sketch
  * fails a named test instead of just shifting numbers in an artifact.
  *
  * Corpus reality check (drives the contract design): the synthetic
  * documents table's `lang` label is random metadata — the text is the
  * same English-ish token soup for every label (verified by inspection:
  * de/es/fr/zh-labeled docs contain zero marker words of their label).
  * Per-class floors against THOSE labels are therefore impossible for
  * any classifier; the honest contracts are (a) floors on a marker-true
  * fixture where ground truth is real, with a deliberately-broken
  * variant proving the contract has teeth, and (b) on the real corpus,
  * floors only for what the corpus genuinely supports (the en class,
  * plus anti-correlation alarms).
  */
class QualityContractSpec extends SparkSuite {
  import spark.implicits._

  // ---- x156: language-ID per-class precision/recall ----------------------

  /** Per-class (precision, recall) from languageId's output — the x156
    * confusion-matrix arithmetic, exact integer counts. */
  private def prfByClass(pred: DataFrame): Map[String, (Double, Double)] = {
    val rows = pred.groupBy("labeled_lang", "predicted_lang").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byLabel = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byPred = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    byLabel.keys.map { c =>
      val correct = rows.collectFirst {
        case (l, p, n) if l == c && p == c => n }.getOrElse(0L)
      val prec = if (byPred.getOrElse(c, 0L) == 0) 0.0
        else correct.toDouble / byPred(c)
      val rec = correct.toDouble / byLabel(c)
      c -> (prec, rec)
    }.toMap
  }

  private def markerDocs(rotateLabels: Boolean): DataFrame = {
    // Three docs per language, each carrying that language's genuine
    // marker words (TextAnalysis.LangMarkers; zh = CJK charset).
    val texts = Map(
      "en" -> Seq("the cat is on the mat and a dog",
        "a tree and the house of the king is tall",
        "the rain is soft and a bird of dawn"),
      "fr" -> Seq("le chat et la maison un est le jardin",
        "la mer et le ciel un est la nuit",
        "un livre et le pont la est le matin"),
      "es" -> Seq("el gato y los perros una es el rio",
        "los montes y el valle una es el sol",
        "una casa y el techo los es el mar"),
      "de" -> Seq("der hund und die katze ist ein der wald",
        "die sonne und der mond ist ein die nacht",
        "ein berg und die wiese der ist die luft"),
      "zh" -> Seq("你好世界这是一个测试", "今天天气很好我们出去", "数据处理是很重要的工作"))
    val langs = texts.keys.toSeq.sorted
    val rot = langs.zip(langs.tail :+ langs.head).toMap
    texts.toSeq.flatMap { case (lang, ts) =>
      ts.map(t => (if (rotateLabels) rot(lang) else lang, t))
    }.zipWithIndex.map { case ((lang, t), i) => (i.toLong, t, lang) }
      .toDF("doc_id", "text", "lang")
  }

  test("x156 contract: per-class precision/recall = 1.0 on a marker-true fixture; broken labels fail") {
    val good = prfByClass(TextAnalysis.languageId(markerDocs(rotateLabels = false)))
    assert(good.keySet === Set("en", "fr", "es", "de", "zh"))
    good.foreach { case (c, (p, r)) =>
      assert(p >= 0.99 && r >= 0.99,
        f"class $c precision $p%.2f / recall $r%.2f below the 0.99 fixture floor")
    }
    // Teeth: rotating the labels (classifier output unchanged, ground
    // truth scrambled) must violate the same floors for EVERY class.
    val broken = prfByClass(TextAnalysis.languageId(markerDocs(rotateLabels = true)))
    assert(broken.forall { case (_, (p, r)) => p < 0.99 || r < 0.99 },
      s"rotated-label fixture should fail the contract, got $broken")
  }

  test("x156 contract: real-corpus floors — en recall holds, prediction never goes dark") {
    val pred = TextAnalysis.languageId(
      spark.read.parquet(s"$Sf/documents.parquet"))
    val prf = prfByClass(pred)
    // The only label the synthetic corpus genuinely supports: English-ish
    // text labeled en must keep being recalled (measured 0.92/0.91 at
    // sf0.001/sf0.01; floor leaves noise margin).
    assert(prf("en")._2 >= 0.85,
      f"en recall ${prf("en")._2}%.2f fell below the 0.85 floor")
    // Anti-degeneration: the classifier must still produce a decision for
    // every doc and must not collapse to all-und (a broken tokenizer or
    // marker list shows up here).
    val n = pred.count()
    val und = pred.filter(col("predicted_lang") === "und").count()
    assert(und.toDouble / n <= 0.25,
      f"und fraction ${und.toDouble / n}%.2f — classifier went dark")
  }

  // ---- x152: ranker agreement (Kendall tau) ------------------------------

  /** Fixture where lexical ground truth is strictly ordered: doc i shares
    * 8−i of the query's 8 tokens. `aligned` embeddings give the dense
    * ranker the same order; `broken` reverses it (a sign-flip-style
    * silent regression). */
  private def rankerFixture(aligned: Boolean): (DataFrame, DataFrame) = {
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g x1"),
      (2L, "a b c d e f x1 x2"),
      (3L, "a b c d e x1 x2 x3"),
      (4L, "a b c d x1 x2 x3 x4"),
      (5L, "a b c x1 x2 x3 x4 x5")).toDF("doc_id", "text")
    val cosines = Seq(0.9f, 0.8f, 0.7f, 0.6f, 0.5f)
    val ordered = if (aligned) cosines else cosines.reverse
    val emb = ((0L, Array(1.0f, 0.0f)) +: ordered.zipWithIndex.map {
      case (c, i) =>
        ((i + 1).toLong, Array(c, math.sqrt(1.0 - c * c).toFloat))
    }).toDF("vec_id", "embedding")
    (docs, emb)
  }

  test("x152 contract: tau = 1 when rankers agree; a reversed dense ranker fails the floor") {
    val (docs, goodEmb) = rankerFixture(aligned = true)
    val tauGood = Similarity.rankerAgreement(docs, goodEmb, Seq(0L), 5)
      .select("kendall_tau").as[Double].head()
    assert(tauGood >= 0.99, f"aligned rankers should give tau=1, got $tauGood%.2f")
    val (_, badEmb) = rankerFixture(aligned = false)
    val tauBad = Similarity.rankerAgreement(docs, badEmb, Seq(0L), 5)
      .select("kendall_tau").as[Double].head()
    assert(tauBad <= -0.99, f"reversed dense ranker should give tau=-1, got $tauBad%.2f")
  }

  test("x152 contract: real-corpus mean tau never signals anti-correlation") {
    // The x152 gate's pinned query set. On this corpus lexical and dense
    // signals are near-independent (mean tau ≈ 0 ± noise); the contract
    // is the ALARM floor: a silently sign-flipped or inverted ranker
    // drives mean tau hard negative (the fixture above shows -1), which
    // must fail here long before it distorts downstream fusion.
    val taus = Similarity.rankerAgreement(
        spark.read.parquet(s"$Sf/documents.parquet"),
        spark.read.parquet(s"$Sf/embeddings.parquet"), 0L to 4L, 50)
      .select("kendall_tau").as[Double].collect()
    assert(taus.nonEmpty)
    val mean = taus.sum / taus.length
    assert(mean >= -0.5, f"mean tau $mean%.2f below the -0.5 anti-correlation alarm")
  }

  // ---- x114: MinHash calibration curve -----------------------------------

  /** Contract violations of a calibration curve (est_matches, n_pairs,
    * mean_jaccard): supported buckets must (a) rise monotonically up to
    * `dipTol` and (b) separate the tails — low estimates mean low exact
    * Jaccard, high estimates high. Deliberately NOT contracted: the naive
    * est/k estimator's absolute error, because banded candidates are
    * selected precisely when a band collides, biasing low-est buckets up
    * by construction (est=5/16 pairs measure exact Jaccard ≈ 0.06 on the
    * real corpus) — the curve itself is the calibration that replaces
    * that estimator. Violations return as strings so the assertion names
    * every one. */
  private def calibrationViolations(curve: Seq[(Long, Long, Double)],
      minSupport: Long = 5, dipTol: Double = 0.05,
      k: Int = Dedup.MinHashK): Seq[String] = {
    val sup = curve.filter(_._2 >= minSupport).sortBy(_._1)
    val dips = sup.sliding(2).collect {
      case Seq((e1, _, m1), (e2, _, m2)) if m2 < m1 - dipTol =>
        f"non-monotone: est=$e1 mean=$m1%.3f -> est=$e2 mean=$m2%.3f"
    }.toSeq
    val lowBad = sup.collect { case (e, _, m) if e <= k / 4 && m > 0.3 =>
      f"low-est bucket est=$e has high exact Jaccard $m%.3f" }
    val highBad = sup.collect { case (e, _, m) if e >= k - 2 && m < 0.8 =>
      f"high-est bucket est=$e has low exact Jaccard $m%.3f" }
    dips ++ lowBad ++ highBad
  }

  test("x114 contract: real calibration curve is monotone, bounded-error, tail-separated") {
    val curve = Dedup.minhashCalibration(
        spark.read.parquet(s"$Sf/documents.parquet"))
      .select("est_matches", "n_pairs", "mean_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(curve.nonEmpty)
    val v = calibrationViolations(curve)
    assert(v.isEmpty, s"calibration contract violated:\n${v.mkString("\n")}")
  }

  test("x114 contract: a broken sketch's curve fails the same checks") {
    // A sketch whose signatures stopped correlating with content yields a
    // flat or inverted curve — every separation/monotonicity check must
    // name it.
    val flat = Seq((2L, 50L, 0.5), (8L, 50L, 0.5), (16L, 50L, 0.5))
    assert(calibrationViolations(flat).nonEmpty, "flat curve must violate")
    val inverted = Seq((2L, 50L, 0.95), (8L, 50L, 0.5), (16L, 50L, 0.05))
    assert(calibrationViolations(inverted).nonEmpty, "inverted curve must violate")
  }
}
