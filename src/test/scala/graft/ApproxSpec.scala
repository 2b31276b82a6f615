package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AGG-11 `agg_approx` tolerance gate (SURVEY §2.2 / §2.7).
  *
  * Approximate aggregates cannot be oracle-hashed — Spark's HLL++ and
  * DuckDB's HLL are different sketches that agree only within their error
  * bounds — so correctness is asserted here against the EXACT values
  * computed by the engine itself, with the declared bounds:
  *
  *  - `approx_count_distinct(rsd = 0.01)`: HLL++ standard error 1% of the
  *    true cardinality. We allow 5σ (5%) so the test cannot flake while
  *    still catching a broken sketch (which is off by orders of magnitude).
  *  - `approx_percentile(accuracy = 10000)`: the Greenwald-Khanna style
  *    summary guarantees RANK error ≤ n/accuracy, i.e. the returned value
  *    sits at a rank within n/10000 of the requested one. We assert that
  *    rank window rather than a value delta, because a value tolerance
  *    depends on the data's local density and would be either vacuous or
  *    flaky.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("agg_approx: HLL distinct within 5 sigma and percentile within rank bound of exact") {
    val approx = graft.queries.Relational.all("agg_approx")(spark, TestSpark.sfDir)
      .select(col("l_returnflag"), col("nd_orders"),
        col("p50").cast("double"), col("p99").cast("double"), col("n"))
      .collect().map(r => r.getString(0) -> r).toMap

    val li = graft.core.Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
      .cache()
    try {
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("nd"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

      assert(approx.keySet == exact.keySet, "group sets differ")
      for ((flag, (nd, n)) <- exact) {
        val row = approx(flag)
        val approxNd = row.getLong(1)
        // rsd=0.01 → σ = 1% of true count; 5σ keeps the test deterministic
        // in practice (HLL++ is itself deterministic for a fixed input set,
        // but the bound is what the API contracts, so assert that).
        assert(math.abs(approxNd - nd) <= math.max(1L, (0.05 * nd).round),
          s"$flag: approx_count_distinct $approxNd vs exact $nd exceeds 5% bound")
        assert(row.getLong(4) == n, s"$flag: exact count passthrough mismatch")

        // Percentile rank-error bound: rank(approx value) must be within
        // n/accuracy of the target rank (plus 1 for interpolation slack).
        val values = li.filter(col("l_returnflag") === flag)
          .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
        val slack = math.max(1L, n / 10000L) + 1
        for ((p, v) <- Seq(0.5 -> row.getDouble(2), 0.99 -> row.getDouble(3))) {
          val targetRank = (p * (n - 1)).round
          // number of values strictly below / at-or-below the returned value
          val lo = values.count(_ < v - 1e-9)
          val hi = values.count(_ <= v + 1e-9)
          assert(targetRank >= lo - slack && targetRank <= hi + slack,
            s"$flag p$p: value $v has rank window [$lo,$hi], target $targetRank ± $slack")
        }
      }
    } finally li.unpersist()
  }

  test("agg_hll_merge: union of monthly sketches matches exact distinct and the direct sketch") {
    val merged = graft.queries.Relational.all("agg_hll_merge")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val o = graft.core.Tables.load(spark, TestSpark.sfDir, "orders")
    val exact = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("nd"),
        countDistinct(date_trunc("month", col("o_orderdate"))).as("nm"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Direct single-pass sketch over the same rows: union-of-partials must
    // agree with sketch-of-everything, or the re-aggregation path would
    // give rollups a different answer than a flat query.
    val direct = o.groupBy(col("o_orderpriority"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(merged.keySet == exact.keySet, "group sets differ")
    for ((prio, (nd, nm)) <- exact) {
      val (est, nMonths) = merged(prio)
      // Default lgConfigK=12 → RSE ≈ 1.04/√2^12 ≈ 1.6%; 5σ ≈ 8% can't flake
      // while still catching a broken sketch or a lossy merge.
      assert(math.abs(est - nd) <= math.max(1L, (0.08 * nd).round),
        s"$prio: HLL union estimate $est vs exact $nd exceeds 8% bound")
      assert(nMonths == nm, s"$prio: month partial count mismatch")
      assert(est == direct(prio),
        s"$prio: union-of-partials $est != direct sketch ${direct(prio)} — merge is lossy")
    }
  }

  test("agg_qsketch: mergeable quantile estimates within the rank bound of exact per group") {
    // AGG-19's ε-rank-bound gate (the agg_approx percentile discipline
    // applied to the engine's own Munro–Paterson summary): the sketch
    // runs distributed (ObjectHashAggregate partial → shuffle merge), so
    // a pass certifies the whole monoid path, not just the driver math.
    // ε ≈ log₂(n/K)/K ≈ 2.5% at K=256 over these group sizes; the 6%
    // window is the can't-flake cushion and still orders of magnitude
    // under a broken sketch.
    val est = graft.queries.Relational.all("agg_qsketch")(spark, TestSpark.sfDir)
      .select(col("l_returnflag"), col("p50").cast("double"),
        col("p99").cast("double"), col("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    val li = graft.core.Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).cache()
    try {
      val groups = li.select(col("l_returnflag")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(est.keySet == groups, "group sets differ")
      for (flag <- groups) {
        val values = li.filter(col("l_returnflag") === flag)
          .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
        val n = values.length.toLong
        val row = est(flag)
        assert(row.getLong(3) == n, s"$flag: exact count passthrough mismatch")
        val slack = math.max(3L, (0.06 * n).round)
        for ((p, v) <- Seq(0.5 -> row.getDouble(1), 0.99 -> row.getDouble(2))) {
          val target = math.max(1L, math.ceil(p * n).toLong)
          val lo = values.count(_ < v - 1e-6)
          val hi = values.count(_ <= v + 1e-6)
          assert(target >= lo - slack && target <= hi + slack,
            s"$flag p$p: value $v has rank window [$lo,$hi], target $target ± $slack")
        }
      }
    } finally li.unpersist()
  }

  test("freq_mg: Misra–Gries estimates within n/(k+1) of exact; coverage and the SKT-3 premise hold") {
    // SKT-2's ε gate: the sketch ran distributed (partial per partition →
    // shuffle merge), so a pass certifies the mergeable-summaries path,
    // not just the driver math. Bounds are DETERMINISTIC (not
    // probabilistic): true − n/(k+1) ≤ est ≤ true for every retained
    // item, and every item above n/(k+1) is retained — under any merge
    // tree (GraftLaws pins the tree-shape invariance on crafted streams).
    val est = graft.queries.LlmOps.all("freq_mg")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val doc = graft.core.Tables.load(spark, TestSpark.sfDir, "documents")
    val toks = doc.select(explode(split(col("text"), " ")).as("tok")).cache()
    try {
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = exact.values.sum
      val eps = n / 1025L // k = 1024
      assert(est.length == 10, s"expected top-10 rows, got ${est.length}")
      for ((tok, e, nToks) <- est) {
        assert(nToks == n, "token-count passthrough mismatch")
        val t = exact(tok)
        assert(e <= t && e >= t - eps,
          s"$tok: MG estimate $e outside [${t - eps}, $t] (n=$n, eps=$eps)")
      }
      // Coverage (the guarantee SKT-3's hash gate rests on): every item
      // above n/(k+1) must be retained in the candidate set...
      val cands = toks
        .agg(graft.functions.HeavyHitters.heavy_hitters_items(col("tok"), 1024)
          .as("c"))
        .head().getSeq[String](0).toSet
      val heavy = exact.filter(_._2 > eps).keySet
      assert(heavy.subsetOf(cands),
        s"coverage violated: ${(heavy -- cands).take(5)} above eps but not retained")
      // ...and the corpus-side premise: the 20th-most-frequent token
      // clears the threshold (with slack), so the candidate set is a
      // superset of the true top-20 and pass 2 reproduces the oracle.
      val top20min = exact.values.toSeq.sorted(Ordering[Long].reverse)
        .take(20).min
      assert(top20min > eps,
        s"top-20 boundary $top20min does not clear eps=$eps — SKT-3 premise broken")
    } finally toks.unpersist()
  }

  test("MG under capacity pressure: distributed bounds hold when the summary actually decrements") {
    // The freq_mg gate above runs in the sub-capacity regime (the corpus
    // vocabulary fits k=1024, so estimates are exact and the decrement/
    // merge-cut machinery never fires end-to-end). This test forces the
    // pressure path THROUGH the real distributed aggregate — partial
    // buffers, serialization offsets, shuffle merge — on a synthetic
    // Zipf-ish stream: 500 distinct tokens vs k=64, repartitioned so
    // multiple partials must merge-cut, with eps small enough that both
    // the underestimate window and the coverage clause bind.
    import spark.implicits._
    val rows = (1 to 500).flatMap(i => Seq.fill(2000 / i + 1)(s"w$i"))
    val n = rows.length.toLong
    val k = 64
    val eps = n / (k + 1)
    val exact = rows.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    assert(exact.size > k, "corpus must exceed capacity for this test to bite")
    val heavy = exact.filter(_._2 > eps).keySet
    assert(heavy.nonEmpty, "corpus must have items above eps (non-vacuous coverage)")
    val toks = rows.toDF("tok").repartition(13).cache()
    try {
      val res = toks
        .agg(graft.functions.HeavyHitters.heavy_hitters(col("tok"), k, k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(res.nonEmpty && res.length <= k, s"summary must hold <= $k pairs")
      for ((w, est) <- res) {
        val t = exact(w)
        assert(est <= t && est >= t - eps,
          s"$w: pressured MG estimate $est outside [${t - eps}, $t] (n=$n, eps=$eps)")
      }
      val cands = toks
        .agg(graft.functions.HeavyHitters.heavy_hitters_items(col("tok"), k).as("c"))
        .head().getSeq[String](0).toSet
      assert(heavy.subsetOf(cands),
        s"coverage under pressure violated: ${(heavy -- cands).take(5)}")
    } finally toks.unpersist()
  }

  test("win_rolling_qsketch: every month's rolling p50/p99 within the rank bound of the exact 3-month set") {
    // WIN-10's gate: the rolling estimates come from MERGING three
    // stored monthly summaries (quantile_sketch_bin → collect_list over
    // the window → quantile_sketch_eval), so a pass certifies the
    // serialize/merge/rank-query read path end to end — against exact
    // percentiles recomputed from the raw 3-month value sets.
    val est = graft.queries.Relational.all("win_rolling_qsketch")(
        spark, TestSpark.sfDir)
      .select(col("month").cast("string"), col("p50").cast("double"),
        col("p99").cast("double"), col("n3"))
      .collect().map(r => r.getString(0) -> r).toMap
    val li = graft.core.Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select(date_trunc("month", col("l_shipdate")).cast("date")
          .cast("string").as("m"),
        col("l_extendedprice")).cache()
    try {
      val months = li.select(col("m")).distinct()
        .collect().map(_.getString(0)).sorted
      assert(est.keySet == months.toSet, "month sets differ")
      for (idx <- months.indices) {
        val windowMonths = months.slice(math.max(0, idx - 2), idx + 1).toSet
        val values = li.filter(col("m").isin(windowMonths.toSeq: _*))
          .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
        val n = values.length.toLong
        val row = est(months(idx))
        assert(row.getLong(3) == n,
          s"${months(idx)}: exact rolling count passthrough mismatch")
        val slack = math.max(3L, (0.06 * n).round)
        for ((p, v) <- Seq(0.5 -> row.getDouble(1), 0.99 -> row.getDouble(2))) {
          val target = math.max(1L, math.ceil(p * n).toLong)
          val lo = values.count(_ < v - 1e-6)
          val hi = values.count(_ <= v + 1e-6)
          assert(target >= lo - slack && target <= hi + slack,
            s"${months(idx)} p$p: value $v rank window [$lo,$hi], target $target ± $slack")
        }
      }
    } finally li.unpersist()
  }
}
