package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-engine invariants for the EVAL model-evaluation family
  * (`queries/Eval.scala`). The oracle gate certifies cross-engine value
  * equality; these tests pin the STATISTICS themselves: AUC must equal a
  * naive pairwise P(score₊ > score₋) replay, ECE must equal a driver-side
  * binning replay, the confusion matrix must partition the corpus, and
  * crafted corpora must hit the closed-form answers (perfect separation
  * → AUC 1, perfectly calibrated bins → ECE 0).
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scoredDocs(dir: String): Array[(Double, Int)] = {
    graft.core.Tables.load(spark, dir, "documents")
      .select(col("text"), col("lang")).collect().map { r =>
        val words = r.getString(0).split(" ", -1)
        val stop = words.count(w => w == "a" || w == "the")
        (stop.toDouble / words.length.toDouble,
          if (r.getString(1) == "en") 1 else 0)
      }
  }

  test("auc_roc: equals the naive pairwise P(pos>neg)+tie/2 replay") {
    val Array(r) = SparkEntry.queries("auc_roc")(spark, TestSpark.sfDir).collect()
    val sc = scoredDocs(TestSpark.sfDir)
    val pos = sc.filter(_._2 == 1).map(_._1)
    val neg = sc.filter(_._2 == 0).map(_._1)
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.getAs[Long]("n_neg") == neg.length.toLong)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val aucRef = wins / (pos.length.toDouble * neg.length.toDouble)
    val got = r.getAs[String]("auc").toDouble
    assert(math.abs(got - aucRef) < 6e-5, s"auc $got vs naive $aucRef")
    // U statistic consistency: AUC = U / (n_pos * n_neg)
    val u = r.getAs[String]("u_stat").toDouble
    assert(math.abs(u - aucRef * pos.length * neg.length) < 0.51)
    // gini_rank = 2*AUC - 1
    assert(math.abs(r.getAs[String]("gini_rank").toDouble - (2 * got - 1)) < 2e-4)
    // range law (discrimination STRENGTH is a data property, not an
    // operator law — the synthetic corpus's langs share a word model, so
    // AUC sits near 0.5 here; the crafted-corpus test below pins the
    // extremes)
    assert(got >= 0.0 && got <= 1.0)
  }

  test("auc_roc: perfect separation gives AUC exactly 1, reversal exactly 0") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("auc_sep").toString
    // en docs saturated with stopwords, others with none -> every pos
    // score (0.5) beats every neg score (0.0): AUC = 1 by construction.
    val docs = Seq(
      (1L, "the x the y", "en"), (2L, "a b the c", "en"),
      (3L, "w x y z", "de"), (4L, "u v w q", "fr"))
      .map { case (id, t, l) => (id, t, l, "t", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val Array(r) = SparkEntry.queries("auc_roc")(spark, d).collect()
    assert(r.getAs[String]("auc") == "1.0000")
    assert(r.getAs[String]("gini_rank") == "1.0000")
    // reversed labels: the same scores now rank every positive LAST
    val rev = docs.map { case (id, t, l, s0, n) =>
      (id, t, if (l == "en") "de" else "en", s0, n) }
    rev.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val Array(r2) = SparkEntry.queries("auc_roc")(spark, d).collect()
    assert(r2.getAs[String]("auc") == "0.0000")
    assert(r2.getAs[String]("gini_rank") == "-1.0000")
  }

  test("calibration_bins: full spine, count conservation, ECE equals driver replay") {
    val rows = SparkEntry.queries("calibration_bins")(spark, TestSpark.sfDir).collect()
    assert(rows.length == 10, "all 10 bins surface, empty ones included")
    assert(rows.map(_.getAs[Int]("bin")).sorted.toSeq == (0 until 10))
    val sc = scoredDocs(TestSpark.sfDir)
    assert(rows.map(_.getAs[Long]("n")).sum == sc.length.toLong)
    assert(rows.map(_.getAs[Long]("n_pos")).sum == sc.count(_._2 == 1).toLong)
    // driver-side replay with the query's own quantization discipline
    def dec4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val byBin = sc.groupBy { case (s, _) => math.min(math.floor(s * 10).toInt, 9) }
    var we = BigDecimal(0)
    byBin.foreach { case (b, xs) =>
      val conf = xs.map(x => BigDecimal(dec4(x._1))).sum.toDouble / xs.length
      val acc = xs.count(_._2 == 1).toDouble / xs.length
      we += BigDecimal(dec4(math.abs(acc - conf))) * xs.length
      val row = rows.find(_.getAs[Int]("bin") == b).get
      assert(row.getAs[Long]("n") == xs.length.toLong, s"bin $b n")
      assert(math.abs(row.getAs[String]("acc").toDouble - acc) < 6e-5, s"bin $b acc")
      assert(math.abs(row.getAs[String]("conf").toDouble - conf) < 6e-5, s"bin $b conf")
    }
    val eceRef = (we / sc.length).toDouble
    val eces = rows.map(_.getAs[String]("ece")).distinct
    assert(eces.length == 1, "ECE is one corpus-level constant")
    assert(math.abs(eces.head.toDouble - eceRef) < 6e-5)
    // empty bins render as zero-count null-rate rows
    rows.filter(_.getAs[Long]("n") == 0L).foreach { r =>
      assert(r.getAs[String]("conf") == null && r.getAs[String]("acc") == null)
    }
  }

  test("avg_precision: equals the driver-side trapezoid replay; AP bounds") {
    val Array(r) = SparkEntry.queries("avg_precision")(spark, TestSpark.sfDir).collect()
    val sc = scoredDocs(TestSpark.sfDir)
    val npos = sc.count(_._2 == 1)
    assert(r.getAs[Long]("n_pos") == npos.toLong)
    assert(r.getAs[Long]("n_neg") == (sc.length - npos).toLong)
    // replay: distinct-score blocks descending, lower trapezoid with P0=1
    val blocks = sc.groupBy(_._1).toSeq.sortBy(-_._1)
      .map { case (s0, xs) => (s0, xs.length.toLong, xs.count(_._2 == 1).toLong) }
    var (nPrev, tpPrev) = (0L, 0L)
    var apRef = BigDecimal(0)
    var bestF1 = Double.MinValue
    def dec8(x: Double) = math.floor(x * 1e8 + 0.5) / 1e8
    blocks.foreach { case (_, ct, cpos) =>
      val (nk, tpk) = (nPrev + ct, tpPrev + cpos)
      val pPrev = if (nPrev == 0) 1.0 else tpPrev.toDouble / nPrev
      val pk = tpk.toDouble / nk
      apRef += BigDecimal(dec8(cpos.toDouble / npos * (pk + pPrev) / 2.0))
      bestF1 = math.max(bestF1, 2.0 * tpk / (nk + npos).toDouble)
      nPrev = nk; tpPrev = tpk
    }
    val ap = BigDecimal(r.getAs[String]("ap"))
    assert((ap - apRef).abs < BigDecimal("1e-7"), s"ap $ap vs replay $apRef")
    assert(ap > 0 && ap <= 1)
    // a random ranker's AP is the prevalence; the trapezoid can't go below
    // the final block's contribution floor — just pin the best-F1 replay
    assert(math.abs(r.getAs[String]("best_f1").toDouble - bestF1) < 6e-5)
  }

  test("avg_precision: perfect separation gives AP exactly 1") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ap_sep").toString
    Seq((1L, "the x the y", "en"), (2L, "a b the c a", "en"),
      (3L, "w x y z", "de"), (4L, "u v w q", "fr"))
      .map { case (id, t, l) => (id, t, l, "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val Array(r) = SparkEntry.queries("avg_precision")(spark, d).collect()
    assert(r.getAs[String]("ap") == "1.00000000")
    assert(r.getAs[String]("best_f1") == "1.0000")
  }

  test("cohen_kappa: equals the driver replay built from the two gated raters") {
    val Array(r) = SparkEntry.queries("cohen_kappa")(spark, TestSpark.sfDir).collect()
    // rater A replayed from raw text; rater B read from the GATED
    // txt_langid_ngram result (itself oracle-hashed), so the replay pins
    // exactly the reuse the query claims.
    val a = graft.core.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).collect().map { row =>
        val words = row.getString(1).split(" ", -1)
        row.getLong(0) ->
          (words.count(w => w == "a" || w == "the").toDouble / words.length > 0.05)
      }.toMap
    val b = SparkEntry.queries("txt_langid_ngram")(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("pred_lang")).collect()
      .map(row => row.getLong(0) -> (row.getString(1) == "en")).toMap
    assert(a.keySet == b.keySet)
    val cells = a.toSeq.map { case (id, ae) => (ae, b(id)) }
    val n11 = cells.count { case (x, y) => x && y }.toLong
    val n10 = cells.count { case (x, y) => x && !y }.toLong
    val n01 = cells.count { case (x, y) => !x && y }.toLong
    val n00 = cells.count { case (x, y) => !x && !y }.toLong
    assert((r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00")) == ((n11, n10, n01, n00)))
    val nn = (n11 + n10 + n01 + n00).toDouble
    val po = (n11 + n00) / nn
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (nn * nn)
    assert(math.abs(r.getAs[String]("p_o").toDouble - po) < 6e-5)
    assert(math.abs(r.getAs[String]("p_e").toDouble - pe) < 6e-5)
    val k = r.getAs[String]("kappa").toDouble
    assert(math.abs(k - (po - pe) / (1 - pe)) < 2e-4)
    assert(k >= -1.0 - 1e-9 && k <= 1.0 + 1e-9)
  }

  test("brier_decomp: Murphy's additive identity holds; components match a driver replay") {
    val Array(r) = SparkEntry.queries("brier_decomp")(spark, TestSpark.sfDir).collect()
    val sc = scoredDocs(TestSpark.sfDir)
    val n = sc.length
    assert(r.getAs[Long]("n") == n.toLong)
    val brier = r.getAs[String]("brier").toDouble
    val rel = r.getAs[String]("reliability").toDouble
    val res = r.getAs[String]("resolution").toDouble
    val unc = r.getAs[String]("uncertainty").toDouble
    val wbv = r.getAs[String]("wbv").toDouble
    val wcov = r.getAs[String]("wcov").toDouble
    // Driver replay of all five pieces on the same 10-bin design.
    def bin(s: Double) = math.min((s * 10.0).toInt, 9)
    val byBin = sc.groupBy(t => bin(t._1))
    val base = sc.map(_._2).sum.toDouble / n
    val brierRef = sc.map { case (s, p) => (s - p) * (s - p) }.sum / n
    val relRef = byBin.values.map { g =>
      val conf = g.map(_._1).sum / g.length; val acc = g.map(_._2).sum.toDouble / g.length
      g.length * (conf - acc) * (conf - acc) }.sum / n
    val resRef = byBin.values.map { g =>
      val acc = g.map(_._2).sum.toDouble / g.length
      g.length * (acc - base) * (acc - base) }.sum / n
    val wbvRef = byBin.values.map { g =>
      val conf = g.map(_._1).sum / g.length
      g.map { case (s, _) => (s - conf) * (s - conf) }.sum }.sum / n
    val wcovRef = byBin.values.map { g =>
      val conf = g.map(_._1).sum / g.length
      g.map { case (s, y) => (s - conf) * y }.sum }.sum / n
    // dec4 rendering + per-row dec4/dec8 quantization slack
    assert(math.abs(brier - brierRef) < 1e-3, s"brier $brier vs $brierRef")
    assert(math.abs(rel - relRef) < 1e-3, s"rel $rel vs $relRef")
    assert(math.abs(res - resRef) < 1e-3, s"res $res vs $resRef")
    assert(math.abs(unc - base * (1 - base)) < 1e-4)
    assert(math.abs(wbv - wbvRef) < 1e-3, s"wbv $wbv vs $wbvRef")
    assert(math.abs(wcov - wcovRef) < 1e-3, s"wcov $wcov vs $wcovRef")
    // The anatomy: BRIER = REL − RES + UNC + WBV − 2·WCOV (exact in real
    // arithmetic — the textbook 3-term identity assumes constant
    // within-bin forecasts, which raw scores violate; dec4-rendered
    // pieces leave ≤ 6·dec4 slack).
    assert(math.abs(brier - (rel - res + unc + wbv - 2 * wcov)) < 6e-4,
      s"Murphy identity violated: $brier vs ${rel - res + unc + wbv - 2 * wcov}")
    // Component sanity: variance terms nonnegative, resolution bounded by
    // uncertainty.
    assert(rel >= -1e-9 && res >= -1e-9 && wbv >= -1e-9)
    assert(res <= unc + 1e-9, "resolution cannot exceed uncertainty")
  }

  test("cls_eval: confusion partitions the corpus; F1/MCC identities hold") {
    val Array(r) = SparkEntry.queries("cls_eval")(spark, TestSpark.sfDir).collect()
    val sc = scoredDocs(TestSpark.sfDir)
    val (tp, fp, fn, tn) = sc.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, b, c, e), (s, pos)) =>
        val pred = if (s > 0.05) 1 else 0
        (a + (if (pred == 1 && pos == 1) 1 else 0),
         b + (if (pred == 1 && pos == 0) 1 else 0),
         c + (if (pred == 0 && pos == 1) 1 else 0),
         e + (if (pred == 0 && pos == 0) 1 else 0))
    }
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((tp, fp, fn, tn)))
    assert(tp + fp + fn + tn == sc.length.toLong)
    val p = r.getAs[String]("precision").toDouble
    val rc = r.getAs[String]("recall").toDouble
    val f1 = r.getAs[String]("f1").toDouble
    // harmonic identity within the dec4 rendering slack of p and rc
    assert(math.abs(f1 - 2 * p * rc / (p + rc)) < 2e-4)
    val acc = r.getAs[String]("accuracy").toDouble
    assert(math.abs(acc - (tp + tn).toDouble / sc.length) < 6e-5)
    val mcc = r.getAs[String]("mcc").toDouble
    assert(mcc >= -1.0 - 1e-9 && mcc <= 1.0 + 1e-9)
    // MCC replay in the query's own double discipline
    val mccRef = (tp.toDouble * tn - fp.toDouble * fn) /
      math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn))
    assert(math.abs(mcc - mccRef) < 6e-5)
  }
}
