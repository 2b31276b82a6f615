package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-engine recounts for the GRPH-2 / SKY-1 analytics family
  * (`queries/Analytics.scala`): each scalable rewrite is re-derived here
  * from the naive quadratic definition on the small SF, independent of the
  * DuckDB oracle (which certifies the same equality cross-engine).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graph_triangles: oriented wedge count equals the naive 3-way join; census is consistent") {
    val r = graft.queries.Analytics.all("graph_triangles")(spark, TestSpark.sfDir).head
    val (nodes, edges, wedges, tris) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // naive recount: canonical a<b<c triangle join over the same edge set
    val li = graft.core.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = op.as("x").join(op.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
    val naive = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    assert(tris == naive, s"oriented $tris vs naive $naive")
    assert(edges == e.count())
    assert(nodes <= 2 * edges && nodes > 0)
    // every triangle closes 3 wedges, so 3T never exceeds the wedge census
    assert(3 * tris <= wedges, s"3*$tris > $wedges")
  }

  test("skyline: frontier is mutually non-dominated and dominates every non-member") {
    val p = graft.core.Tables.load(spark, TestSpark.sfDir, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dom(q: (Long, Double, Int), x: (Long, Double, Int)): Boolean =
      q._2 <= x._2 && q._3 >= x._3 && (q._2 < x._2 || q._3 > x._3)
    val got = graft.queries.Analytics.all("skyline")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val gotKeys = got.map(_._1).toSet
    assert(got.nonEmpty)
    // no frontier member dominated by ANY point (naive O(n·f) recount)
    got.foreach { f =>
      assert(!p.exists(q => dom(q, f)), s"frontier $f is dominated")
    }
    // every non-member is dominated by someone (so the frontier is complete)
    p.filterNot(x => gotKeys.contains(x._1)).foreach { x =>
      assert(p.exists(q => dom(q, x)), s"non-member $x undominated")
    }
  }
}
