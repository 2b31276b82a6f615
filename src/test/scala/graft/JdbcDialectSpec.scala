package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.queries.Ingestion
import graft.sources.Ingest

/** Second-dialect portability certification for the JDBC edge (SURVEY
  * §2.1 warehouse/OLTP rows; [REF] `Untitled Diagram.drawio:79-98` shows
  * Redshift load + bidirectional PostgreSQL, i.e. TWO dialect families on
  * one pipeline). The gated queries prove the writer/reader/staged-upsert
  * classes end-to-end against embedded Derby (SQL-standard family); this
  * suite re-runs the SAME production classes — zero dialect branches in
  * `Ingest.scala` — against embedded DuckDB, a PostgreSQL-family engine:
  *
  *   - identifier folding: Derby folds unquoted identifiers to UPPERCASE
  *     (SQL standard), PostgreSQL folds to lowercase, DuckDB stores them
  *     AS TYPED and resolves case-insensitively — three engines, three
  *     rules, the classic cross-warehouse migration trap, pinned here by
  *     metadata probes on both embedded engines;
  *   - type mapping: Spark has a built-in DerbyDialect (StringType→CLOB,
  *     because Derby rejects TEXT) but NO DuckDB dialect, so the default
  *     JdbcDialect's PostgreSQL-ish DDL (TEXT, DOUBLE PRECISION) must be
  *     accepted verbatim — exactly what a real PostgreSQL/Redshift target
  *     sees from stock Spark;
  *   - upsert SQL: `JdbcUpsertWriter`'s staged DELETE-WHERE-EXISTS +
  *     INSERT-SELECT transaction claims ANSI portability
  *     (`Ingest.scala`'s "works on any ANSI target" note names
  *     Derby/PostgreSQL/Redshift). PostgreSQL's `INSERT .. ON CONFLICT`
  *     is deliberately NOT the portable path: it requires a declared
  *     unique constraint, which Spark's JDBC writer never creates — the
  *     staged pattern is the lowest common denominator, and this suite is
  *     the second data point behind that claim.
  *
  * Embedded DuckDB is single-process, so bulk loads here run 1 writer
  * partition; against server PostgreSQL the same writer fans out one
  * connection per partition (the Derby gated query runs 4). The jar is
  * attached test-scope from the image's local cache (see build.sbt); if
  * absent every test cancels via `assume` instead of failing.
  */
class JdbcDialectSpec extends AnyFunSuite {
  import TestSpark._

  private val driverPresent =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: Throwable => false }

  /** The one adapter an unknown dialect genuinely needs on Spark 4:
    * `tableExists` probes with `SELECT 1 FROM t WHERE 1=0` and only
    * treats the failure as "absent" when the dialect RECOGNIZES the
    * engine's object-not-found error (unrecognized errors rethrow, by
    * design — a connectivity failure must not masquerade as a missing
    * table and trigger CREATE). Spark ships that knowledge for
    * Derby/Postgres/etc. but not DuckDB; everything else (type DDL,
    * quoting, batching) runs on the stock default dialect — which is
    * the point of this suite. */
  private object DuckDbDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:duckdb:")
    override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
      e.getMessage != null && e.getMessage.contains("does not exist")
  }
  if (driverPresent)
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDbDialect)

  private def target(dbDir: String, table: String): Ingest.JdbcTarget =
    Ingest.JdbcTarget(url = s"jdbc:duckdb:$dbDir/duck.db", table = table,
      driver = "org.duckdb.DuckDBDriver")

  private def srcOrders = Tables.load(spark, sfDir, "orders")
    .filter(col("o_orderkey") % 97 === 0)

  private def alignTs(df: org.apache.spark.sql.DataFrame) =
    df.select(srcOrders.columns.map(col).toIndexedSeq: _*)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))

  test("DuckDB (PostgreSQL dialect): production writer round-trips every row exactly") {
    assume(driverPresent, "duckdb_jdbc jar not in the local cache")
    val t = target(tempDir("duck_rt").toString, "orders_rt")
    new Ingest.JdbcWarehouseWriter(t).write(srcOrders.coalesce(1), SaveMode.Overwrite)
    val back = alignTs(Ingest.jdbcRead(spark, t).load())
    assert(back.count() == srcOrders.count() && srcOrders.count() > 0)
    assertSameRows(srcOrders, back, "duckdb round-trip")
  }

  test("DuckDB: staged upsert merges updates+inserts, replay is idempotent") {
    assume(driverPresent, "duckdb_jdbc jar not in the local cache")
    val t = target(tempDir("duck_ups").toString, "orders_ups")
    new Ingest.JdbcWarehouseWriter(t).write(srcOrders.coalesce(1), SaveMode.Overwrite)
    val delta = Ingestion.upsertDelta(spark, sfDir)
    val up = new Ingest.JdbcUpsertWriter(t, Seq("o_orderkey"))
    up.upsert(delta.coalesce(1))
    val expected = srcOrders
      .join(delta.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .unionByName(delta)
    def back() = alignTs(Ingest.jdbcRead(spark, t).load())
    assert(back().count() == expected.count() && expected.count() > srcOrders.count())
    assertSameRows(expected, back(), "duckdb staged upsert")
    up.upsert(delta.coalesce(1))
    assertSameRows(expected, back(), "duckdb staged upsert replay")
  }

  test("DuckDB: failed merge rolls back the applied DELETE, target unchanged") {
    assume(driverPresent, "duckdb_jdbc jar not in the local cache")
    // Same half-applied-merge shape as the Derby rollback test: the
    // DELETE matches and removes rows, the INSERT then fails on a renamed
    // column — only a real transaction rollback restores the deleted rows.
    val t = target(tempDir("duck_rb").toString, "orders_rb")
    new Ingest.JdbcWarehouseWriter(t).write(srcOrders.coalesce(1), SaveMode.Overwrite)
    def snapshot() = Ingest.jdbcRead(spark, t).load().collect()
      .map(_.toString).sorted.toSeq
    val before = snapshot()
    intercept[Exception] {
      new Ingest.JdbcUpsertWriter(t, Seq("o_orderkey"))
        .upsert(Ingestion.upsertDelta(spark, sfDir)
          .withColumnRenamed("o_orderpriority", "o_mislabeled").coalesce(1))
    }
    assert(snapshot() == before,
      "rolled-back duckdb transaction must restore the deleted rows")
  }

  test("dialect skew pinned: identifier folding and string type mapping differ") {
    assume(driverPresent, "duckdb_jdbc jar not in the local cache")
    // Derby side: gated query's database already exists — reuse it. The
    // probe table name is run-unique so a crashed prior run can't collide.
    val probe = s"Fold_Probe_${System.nanoTime() % 1000000}"
    val derbyT = Ingestion.jdbcOrders(spark, sfDir)
    Class.forName(derbyT.driver)
    val dc = java.sql.DriverManager.getConnection(derbyT.url)
    val (derbyFold, derbyStringType) =
      try {
        val st = dc.createStatement()
        try {
          st.executeUpdate(s"CREATE TABLE $probe (MixedCase INT)")
          val rs = dc.getMetaData.getColumns(null, null, probe.toUpperCase, null)
          assert(rs.next(), "derby: uppercase-folded lookup must find the table")
          val fold = rs.getString("COLUMN_NAME")
          // Spark's built-in DerbyDialect wrote the orders slice: StringType→CLOB
          // (Derby has no TEXT). Read the declared type straight from metadata.
          val cr = dc.getMetaData.getColumns(null, null,
            derbyT.table.toUpperCase, "o_orderstatus")
          assert(cr.next(), "derby: quoted lowercase column must be preserved")
          (fold, cr.getString("TYPE_NAME"))
        } finally { try st.executeUpdate(s"DROP TABLE $probe") catch { case _: Throwable => () }; st.close() }
      } finally dc.close()
    assert(derbyFold == "MIXEDCASE", s"derby folds up, saw $derbyFold")
    assert(derbyStringType.toUpperCase.contains("CLOB"),
      s"DerbyDialect maps StringType to CLOB, saw $derbyStringType")

    // DuckDB side: same probes — opposite folding, default dialect's TEXT
    // accepted and surfaced as VARCHAR.
    val t = target(tempDir("duck_meta").toString, "orders_meta")
    new Ingest.JdbcWarehouseWriter(t).write(srcOrders.limit(5).coalesce(1),
      SaveMode.Overwrite)
    Class.forName(t.driver)
    val qc = java.sql.DriverManager.getConnection(t.url)
    try {
      val st = qc.createStatement()
      try {
        st.executeUpdate(s"CREATE TABLE $probe (MixedCase INT)")
        // DuckDB goes further than PostgreSQL's lowercase fold: unquoted
        // identifiers are stored AS TYPED and resolved case-insensitively
        // — so metadata (a case-sensitive LIKE pattern) finds the exact
        // name, not a folded one. Three engines, three folding rules: the
        // migration trap this test pins.
        assert(!qc.getMetaData.getColumns(null, null, probe.toUpperCase, null).next(),
          "duckdb must NOT store the derby-style uppercase fold")
        val rs = qc.getMetaData.getColumns(null, null, probe, null)
        assert(rs.next(), "duckdb: exact-case lookup must find the unquoted table")
        val duckFold = rs.getString("COLUMN_NAME")
        assert(duckFold == "MixedCase",
          s"duckdb preserves identifier case as typed, saw $duckFold")
        val cr = qc.getMetaData.getColumns(null, null, t.table, "o_orderstatus")
        assert(cr.next(), "duckdb: exact-case column lookup")
        val duckStringType = cr.getString("TYPE_NAME")
        assert(duckStringType.toUpperCase.contains("VARCHAR"),
          s"default JdbcDialect's TEXT lands as VARCHAR on duckdb, saw $duckStringType")
      } finally st.close()
    } finally qc.close()
  }
}
