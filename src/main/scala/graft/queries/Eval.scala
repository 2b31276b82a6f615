package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Model-evaluation operators (SURVEY §2.2 EVAL family) — the metrics a
  * training-data pipeline runs AGAINST ITS OWN FILTERS: every heuristic
  * classifier in the corpus path (language ID, quality gates, dedup
  * verdicts) needs its discrimination (AUC), its calibration (reliability
  * bins + ECE), and its operating point (confusion matrix / P-R-F1)
  * measured at corpus scale before its threshold ships to a 100 TB run.
  *
  * The evaluated model is deliberately one the engine already gates:
  * TXT-3's English stopword-ratio score (`txt_langid`) against the gold
  * `lang` label — so the eval family audits a REAL in-repo classifier,
  * not a synthetic score column.
  *
  * Exactness discipline (SURVEY §5.3): ranks/counts are exact integers
  * (tie-average ranks via the doubled-rank trick shared with STAT-6),
  * every ratio is one correctly-rounded double division, per-bin float
  * terms are dec4-quantized before any order-free decimal sum.
  */
object Eval {
  type Q = (SparkSession, String) => DataFrame

  /** TXT-3's stopword-ratio score + binary gold label, the shared eval
    * input: score = |{w : w ∈ {a, the}}| / |words| (one correctly-rounded
    * double division of exact ints), label = (lang = 'en'). */
  private def scored(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    load(s, d, "documents").select(
      (size(filter(words, w => w.isin("a", "the"))).cast("double") /
        size(words).cast("double")).as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
  }

  val all: Map[String, Q] = Map(
    // ---- EVAL-1: exact ROC AUC (`auc_roc`) — threshold-free
    //      discrimination of the stopword score for English: AUC =
    //      P(score_pos > score_neg) + ½P(tie), computed by the rank-sum
    //      identity AUC = (ΣR₊ − n₊(n₊+1)/2) / (n₊n₋) with tie-AVERAGE
    //      ranks. Exact-integer discipline: doubled ranks keep ties
    //      integral (2·avg_rank = 2·prefix + ct + 1 per distinct-score
    //      group — STAT-6's identity), so 2U = ΣC₊·(2p+ct+1) − n₊(n₊+1)
    //      is exact int64 and AUC is ONE double division. Degenerate
    //      single-class input → NULL by guard. Scale: the scan collapses
    //      to one row per DISTINCT score (map-side combined); the rank
    //      over that runs as GlobalRank's two-pass distributed prefix
    //      (no single-task sort at any width — gini/mann_whitney/
    //      drift_ks's machinery, fourth consumer); rollup is 1 row. ----
    "auc_roc" -> ((s, d) => {
      val perS = scored(s, d).groupBy(col("score")).agg(
        count(lit(1)).as("ct"), sum(col("pos")).as("cpos"))
      val withP = graft.operators.GlobalRank.attach(perS,
        Seq(col("score").asc), None, Seq("ct" -> "cbefore"))
      val one = withP.agg(
        sum(col("cpos")).as("n_pos"),
        sum(col("ct") - col("cpos")).as("n_neg"),
        sum(col("cpos") * (lit(2L) * col("cbefore") + col("ct") + lit(1L)))
          .as("r2pos"))
      val u2 = col("r2pos") - col("n_pos") * (col("n_pos") + 1L) // = 2U, exact
      val den = lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")
      val auc = u2.cast("double") / when(den === 0.0, lit(null)).otherwise(den)
      ordered(one.select(col("n_pos"), col("n_neg"),
        dec4S(u2.cast("double") / lit(2.0)).as("u_stat"),
        dec4S(auc).as("auc"),
        dec4S(lit(2.0) * auc - lit(1.0)).as("gini_rank")))
    }),

    // ---- EVAL-2: calibration reliability bins + ECE
    //      (`calibration_bins`) — does a score of 0.7 mean 70%? The
    //      10-bin reliability diagram (bin = ⌊10·score⌋ clamped to 9,
    //      pure IEEE double arithmetic so both engines bin identically)
    //      with per-bin n / positives / mean confidence / observed
    //      accuracy, plus the Expected Calibration Error
    //      ECE = Σ_b (n_b/N)·|acc_b − conf_b| attached to every row.
    //      Float discipline: conf_b finishes from a dec4-per-row decimal
    //      score sum (order-free), each bin's |acc−conf| is dec4-
    //      quantized BEFORE the ×n_b decimal product and the cross-bin
    //      decimal sum — no order-sensitive double accumulation
    //      anywhere. The full 10-bin spine is surfaced (empty bins show
    //      n=0 — DQ-3's absent-digit convention). Scale: ONE map-side-
    //      combined 10-group aggregate over the scan; everything after
    //      lives on ≤10 rows. ----
    "calibration_bins" -> ((s, d) => {
      val binned = scored(s, d).withColumn("bin",
        least(floor(col("score") * lit(10.0)).cast("int"), lit(9)))
      val agg = binned.groupBy(col("bin")).agg(
        count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(dec4(col("score"))).cast(dt).as("ssc"))
      val withRates = agg
        .withColumn("conf", col("ssc").cast("double") / col("n").cast("double"))
        .withColumn("acc", col("n_pos").cast("double") / col("n").cast("double"))
      val tot = withRates.agg(
        sum(col("n")).as("nn"),
        sum((dec4(abs(col("acc") - col("conf"))) * col("n")).cast(dt))
          .cast(dt).as("we"))
      val ece = tot.select(
        dec4S(col("we").cast("double") / col("nn").cast("double")).as("ece"))
      val spine = s.range(0, 10).select(col("id").cast("int").as("bin"))
      ordered(spine.join(withRates, Seq("bin"), "left")
        .crossJoin(broadcast(ece))
        .select(col("bin"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("n_pos"), lit(0L)).as("n_pos"),
          dec4S(col("conf")).as("conf"),
          dec4S(col("acc")).as("acc"),
          col("ece")))
    }),

    // ---- EVAL-3: confusion-matrix operating point (`cls_eval`) — the
    //      threshold-ed readout of the same classifier (TXT-3's shipped
    //      rule: predict English iff score > 0.05): TP/FP/FN/TN in ONE
    //      map-side-combined aggregate, then accuracy, precision,
    //      recall, F1 and Matthews correlation. Exact-integer
    //      discipline: accuracy/precision/recall are single divisions of
    //      exact counts; F1 via the harmonic identity 2TP/(2TP+FP+FN)
    //      (ONE exact-int ratio — never the P·R double composition);
    //      MCC's count products computed in DOUBLE (int64 products
    //      overflow at 10¹²-row corpora; doubles are correctly rounded
    //      and spelled identically both sides), zero-denominator → NULL.
    //      Scale: one scan to a 4-number vector — the cheapest possible
    //      full-corpus model audit, composes incrementally per batch. ----
    "cls_eval" -> ((s, d) => {
      val p = scored(s, d)
        .select(col("pos"), when(col("score") > 0.05, 1L).otherwise(0L).as("pred"))
      val one = p.agg(
        sum(when(col("pred") === 1L && col("pos") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") === 1L && col("pos") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(col("pred") === 0L && col("pos") === 1L, 1L).otherwise(0L)).as("fn"),
        sum(when(col("pred") === 0L && col("pos") === 0L, 1L).otherwise(0L)).as("tn"))
      def dz(num: Column, den: Column): Column =
        num / when(den === 0.0, lit(null)).otherwise(den)
      val Seq(tp, fp, fn, tn) = Seq("tp", "fp", "fn", "tn").map(c => col(c).cast("double"))
      val mccDen = sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
      ordered(one.select(col("tp"), col("fp"), col("fn"), col("tn"),
        dec4S(dz(tp + tn, tp + fp + fn + tn)).as("accuracy"),
        dec4S(dz(tp, tp + fp)).as("precision"),
        dec4S(dz(tp, tp + fn)).as("recall"),
        dec4S(dz(lit(2.0) * tp, lit(2.0) * tp + fp + fn)).as("f1"),
        dec4S(dz(tp * tn - fp * fn, mccDen)).as("mcc")))
    }))

  val oracle: Map[String, String] = Map(
    "auc_roc" ->
      """WITH sc AS (
        |  SELECT CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('a', 'the'))) AS DOUBLE) /
        |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |rk AS (
        |  SELECT pos, RANK() OVER (ORDER BY score) AS r,
        |    COUNT(1) OVER (PARTITION BY score) AS ct
        |  FROM sc),
        |one AS (
        |  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
        |    CAST(SUM(CASE WHEN pos = 1 THEN 2 * r + ct - 1 ELSE 0 END) AS BIGINT) AS r2pos
        |  FROM rk),
        |f AS (
        |  SELECT n_pos, n_neg,
        |    CAST(r2pos - n_pos * (n_pos + 1) AS DOUBLE) AS u2,
        |    2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) AS den
        |  FROM one)
        |SELECT n_pos, n_neg,
        |  CAST(CAST(floor((u2 / 2.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS u_stat,
        |  CAST(CAST(floor((u2 / NULLIF(den, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS auc,
        |  CAST(CAST(floor((2.0 * (u2 / NULLIF(den, 0.0)) - 1.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS gini_rank
        |FROM f
        |ORDER BY n_pos NULLS FIRST, n_neg NULLS FIRST, u_stat NULLS FIRST, auc NULLS FIRST, gini_rank NULLS FIRST""".stripMargin,

    "calibration_bins" ->
      """WITH sc AS (
        |  SELECT CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('a', 'the'))) AS DOUBLE) /
        |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |b AS (
        |  SELECT LEAST(CAST(floor(score * 10.0) AS INT), 9) AS bin, score, pos
        |  FROM sc),
        |agg AS (
        |  SELECT bin, COUNT(1) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(CAST(floor((score)*10000+0.5)/10000 AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ssc
        |  FROM b GROUP BY bin),
        |r AS (
        |  SELECT bin, n, n_pos,
        |    CAST(ssc AS DOUBLE) / CAST(n AS DOUBLE) AS conf,
        |    CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc
        |  FROM agg),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(CAST(CAST(floor((abs(acc - conf))*10000+0.5)/10000 AS DECIMAL(38,4)) * n AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS we
        |  FROM r),
        |e AS (
        |  SELECT CAST(CAST(floor((CAST(we AS DOUBLE) / CAST(nn AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS ece
        |  FROM tot),
        |spine AS (SELECT unnest(range(0, 10)) AS bin)
        |SELECT CAST(spine.bin AS INT) AS bin,
        |  COALESCE(r.n, 0) AS n, COALESCE(r.n_pos, 0) AS n_pos,
        |  CAST(CAST(floor((r.conf)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS conf,
        |  CAST(CAST(floor((r.acc)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS acc,
        |  e.ece AS ece
        |FROM spine LEFT JOIN r ON spine.bin = r.bin CROSS JOIN e
        |ORDER BY bin NULLS FIRST, n NULLS FIRST, n_pos NULLS FIRST, conf NULLS FIRST, acc NULLS FIRST, ece NULLS FIRST""".stripMargin,

    "cls_eval" ->
      """WITH sc AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |    CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        |        w -> w IN ('a', 'the'))) AS DOUBLE) /
        |        CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.05
        |      THEN 1 ELSE 0 END AS pred
        |  FROM documents),
        |one AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN pred = 1 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN pred = 1 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN pred = 0 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN pred = 0 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM sc),
        |d AS (
        |  SELECT tp, fp, fn, tn,
        |    CAST(tp AS DOUBLE) AS tpd, CAST(fp AS DOUBLE) AS fpd,
        |    CAST(fn AS DOUBLE) AS fnd, CAST(tn AS DOUBLE) AS tnd
        |  FROM one)
        |SELECT tp, fp, fn, tn,
        |  CAST(CAST(floor(((tpd + tnd) / NULLIF(tpd + fpd + fnd + tnd, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS accuracy,
        |  CAST(CAST(floor((tpd / NULLIF(tpd + fpd, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS precision,
        |  CAST(CAST(floor((tpd / NULLIF(tpd + fnd, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall,
        |  CAST(CAST(floor((2.0 * tpd / NULLIF(2.0 * tpd + fpd + fnd, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS f1,
        |  CAST(CAST(floor(((tpd * tnd - fpd * fnd) / NULLIF(sqrt((tpd + fpd) * (tpd + fnd) * (tnd + fpd) * (tnd + fnd)), 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS mcc
        |FROM d
        |ORDER BY tp NULLS FIRST, fp NULLS FIRST, fn NULLS FIRST, tn NULLS FIRST, accuracy NULLS FIRST, precision NULLS FIRST, recall NULLS FIRST, f1 NULLS FIRST, mcc NULLS FIRST""".stripMargin)
}
