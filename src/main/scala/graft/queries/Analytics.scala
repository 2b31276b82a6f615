package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Graph-statistics and order-dominance analytics (SURVEY.md §2.2 GRPH/SKY
  * families) — operators whose NAIVE formulation is quadratic and whose
  * engine formulation is the known scalable rewrite, oracle-certified
  * against the naive form run by DuckDB at test SF.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    // ---- GRPH-2: triangle census of the part co-purchase graph (nodes =
    //      parts, edge when two parts share an order) — the local-density
    //      statistic behind community detection, recommendation quality,
    //      and bot-ring detection. The scalable shape is the DEGREE-
    //      ORIENTATION wedge join [Schank-Wagner / Cohen's MapReduce
    //      triangle counting]: orient every edge from its (degree, id)-
    //      smaller endpoint to the larger, enumerate wedges as pairs of
    //      out-edges of a common source, and close each wedge against the
    //      oriented edge list. Every triangle is counted EXACTLY once (its
    //      rank-minimal vertex owns it), and out-degree is bounded by
    //      O(√E) on any graph — so the wedge relation is Σd_out² ≲ E^1.5
    //      instead of the Σd² ≈ hub-degree² blowup of the unoriented join
    //      (a celebrity node with d=10⁶ contributes 10¹² unoriented wedges
    //      but only its √E out-wedges here). Shuffles: edge distinct, the
    //      two equi-joins; degree table is node-sized → broadcast. Output
    //      = the 1-row census (nodes, edges, Σ C(d,2) wedges, triangles);
    //      n_wedges·3/n_triangles is the global clustering coefficient. ----
    "graph_triangles" -> ((s, d) => {
      val li = load(s, d, "lineitem")
      // Edge build WITHOUT a self-join: collect each order's sorted
      // distinct part set (one map-side-combined shuffle, group size
      // bounded by basket size — 13 here, never a hub) and explode the
      // a<b pairs from the array. Measured 2.6 s vs 6.4 s for the
      // op⋈op-on-orderkey + distinct formulation at sf0.1 — the join
      // pays two extra 600k-row exchanges and an SMJ sort for pairs the
      // array already has adjacent. `pinned`: e feeds deg, the orient
      // join, and the n_edges census.
      val e = li.groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
        .select(posexplode(col("ps")).as(Seq("i", "a")), col("ps"))
        .select(col("a"),
          explode(slice(col("ps"), col("i") + 2, size(col("ps")))).as("b"))
        .distinct()
        .pinned
      val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .pinned // node-sized; read by both orient broadcasts + 2 census aggs
      // (degree, id) rank packed into ONE long (deg·2³² + id): the wedge
      // filter below evaluates this comparison ~2·Σ C(d_out,2) times (80M+
      // at sf0.1), and a primitive long compare beats a struct comparator
      // in that hot loop. Valid while ids and degrees stay below 2³¹ —
      // i.e. any graph under ~2 B nodes; beyond that, fall back to a
      // (deg, id) struct rank (same algebra, same plan shape).
      def rk(dg: Column, v: Column): Column = dg * lit(4294967296L) + v
      val or = e.join(broadcast(deg).as("da"), col("a") === col("da.v"))
        .join(broadcast(deg).as("db"), col("b") === col("db.v"))
        .select(
          when(rk(col("da.deg"), col("a")) < rk(col("db.deg"), col("b")),
            struct(col("a").as("src"), col("b").as("dst"),
              rk(col("db.deg"), col("b")).as("rdst")))
          .otherwise(
            struct(col("b").as("src"), col("a").as("dst"),
              rk(col("da.deg"), col("a")).as("rdst"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.rdst").as("rdst"))
        // Explicit-width repartition BY SRC before pinning, for the fzj1
        // lesson (SURVEY §4.4.7): the edge list is tiny in BYTES (~30 MB)
        // but the wedge join FANS OUT 34× — left to AQE, the self-join's
        // exchange coalesces to a few input-byte-sized partitions and the
        // 41M-row wedge generation runs near-serial. Hash-partitioning
        // both (identical) sides by the join key here also makes the
        // wedge self-join exchange-free at full width.
        .repartition(s.sparkContext.defaultParallelism * 2, col("src"))
        .pinned // feeds both wedge sides + the closure broadcast
      val wedges = or.as("e1").join(or.as("e2"),
          col("e1.src") === col("e2.src") && col("e1.rdst") < col("e2.rdst"))
        .select((col("e1.dst") * lit(4294967296L) + col("e2.dst")).as("vw"))
      // Closing edge is oriented v→w because rank(v) < rank(w). The wedge
      // stream is the BIG relation (Σ C(d_out,2): 41M rows at sf0.1 on
      // 1.2M edges) — broadcasting the EDGE LIST turns the closure into a
      // map-side hash probe, so wedges pipeline from their own join
      // straight into the count without ever shuffling; the (v,w) pair is
      // packed into one long so the 41M probes hit a single-long hash key
      // (measured 4.0→1.5 s vs the two-column key). When the edge list
      // outgrows broadcast (≫10⁷ edges), drop the hint: the closure
      // degrades to a shuffle on vw — still key-proportional — or the
      // edge set ships as DCN-2's bloom probe with an exact residual join.
      val tri = wedges.join(
          broadcast(or.select((col("src") * lit(4294967296L) + col("dst")).as("vw"))),
          "vw")
        .agg(count(lit(1)).as("n_triangles"))
      val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
      val nEdges = e.agg(count(lit(1)).as("n_edges"))
      val nWedges = deg.agg(sum(call_function("div",
        col("deg") * (col("deg") - 1), lit(2L))).as("n_wedges"))
      ordered(nNodes.crossJoin(nEdges).crossJoin(nWedges).crossJoin(tri))
    }),

    // ---- SKY-1: Pareto frontier (skyline) of part on (minimize
    //      p_retailprice, maximize p_size) — multi-objective shortlist
    //      queries (cheapest-but-biggest) that SQL has no native operator
    //      for. Naive is the O(n²) NOT-EXISTS anti-join (the oracle, and
    //      exactly what CartesianGuard exists to keep out of the engine).
    //      Scalable rewrite for 2-D: a dominator always sorts before its
    //      victim under (price asc, size desc), so collapse to PRICE
    //      GROUPS (groupBy price → max size: the only full-data shuffle,
    //      map-side combined), take a prefix-max of group max-size over
    //      strictly-lower prices on that |distinct prices|-sized relation,
    //      and keep a row iff no lower-priced group reaches its size AND
    //      nothing in its own price group strictly exceeds it (equal
    //      price+size duplicates all survive — no strict dominator).
    //      The single-partition window runs over DISTINCT PRICES, not
    //      rows; if even that outgrows one task, PACK-2's sharded
    //      running-max decomposition (per-shard prefix + broadcast shard
    //      offsets) applies verbatim. Frontier is tiny by nature →
    //      broadcast joined back to the fact. ----
    "skyline" -> ((s, d) => {
      val p = load(s, d, "part")
      val g = p.groupBy(col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("gmax"))
      val w = Window.orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val g2 = g.withColumn("prevmax", max(col("gmax")).over(w))
      ordered(p.join(broadcast(g2), p("p_retailprice") === g2("price"))
        .filter((col("prevmax").isNull || col("prevmax") < col("p_size")) &&
          col("gmax") === col("p_size"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size")))
    })
  )

  val oracle: Map[String, String] = Map(
    "graph_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT x.p AS a, y.p AS b
        |      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
        |deg AS (SELECT v, COUNT(*) AS deg FROM (
        |          SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |        GROUP BY v),
        |t AS (SELECT COUNT(*) AS n_triangles
        |      FROM e e1 JOIN e e2 ON e1.b = e2.a
        |           JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
        |       (SELECT COUNT(*) FROM e) AS n_edges,
        |       (SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges,
        |       CAST(n_triangles AS BIGINT) AS n_triangles
        |FROM t
        |ORDER BY n_nodes NULLS FIRST, n_edges NULLS FIRST, n_wedges NULLS FIRST, n_triangles NULLS FIRST""".stripMargin,

    "skyline" ->
      """SELECT p_partkey, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_partkey NULLS FIRST, p_retailprice NULLS FIRST, p_size NULLS FIRST""".stripMargin
  )
}
