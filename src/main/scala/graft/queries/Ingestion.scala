package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}
import graft.core.Tables._
import graft.sources.Ingest

/** Oracle-checked connector queries (SURVEY.md §2.1): the [REF] CSV scan
  * and the JSON scan, each reading a deterministic fixture file that the
  * query writes before reading, so the DuckDB twin (`read_csv`/`read_json`
  * on the same absolute path) sees identical bytes.
  *
  * The fixtures exercise the parsing surface that matters for partner
  * files: RFC-4180 quoting (embedded comma, doubled quote), NULL-as-empty
  * numeric fields, dates, nested objects, empty and multi-element arrays.
  * Bad-record *policies* (PERMISSIVE quarantine / DROPMALFORMED / FAILFAST)
  * can't be oracle-compared — DuckDB's malformed-row handling differs by
  * design — so they are asserted engine-side in IngestSpec instead.
  */
object Ingestion {
  type Q = (SparkSession, String) => DataFrame

  val fixtureDir = "/tmp/graft_fixtures"

  val csvPath = s"$fixtureDir/partner_feed.csv"
  private val csvBytes =
    """id,name,qty,price,ship_date
      |1,Widget,5,19.99,2024-01-15
      |2,"Gadget, large",3,249.5,2024-02-01
      |3,"Bolt ""M8"" steel",100,0.25,2024-02-10
      |4,Nut,,1.5,2024-03-05
      |5,Washer,250,0.05,2024-03-06
      |""".stripMargin

  val csvSchema: StructType = StructType.fromDDL(
    "id BIGINT, name STRING, qty INT, price DOUBLE, ship_date DATE")

  val jsonPath = s"$fixtureDir/partner_feed.jsonl"
  private val jsonBytes =
    """{"id":1,"s":"alpha","d":3.5,"obj":{"x":10},"tags":["a","b"]}
      |{"id":2,"s":"beta","d":0.25,"obj":{"x":-2},"tags":[]}
      |{"id":3,"s":"gamma, \"quoted\"","d":100.0,"obj":{"x":0},"tags":["z"]}
      |{"id":4,"s":"delta","d":-7.75,"obj":null,"tags":["q","r","s"]}
      |""".stripMargin

  val jsonSchema: StructType = StructType.fromDDL(
    "id BIGINT, s STRING, d DOUBLE, obj STRUCT<x: INT>, tags ARRAY<STRING>")

  /** Write both fixtures (idempotent, deterministic bytes). */
  def writeFixtures(): Unit = {
    Files.createDirectories(Paths.get(fixtureDir))
    Files.writeString(Paths.get(csvPath), csvBytes)
    Files.writeString(Paths.get(jsonPath), jsonBytes)
  }

  val all: Map[String, Q] = Map(
    // ---- CSV scan ([REF] partner feed): schema'd, FAILFAST (the fixture
    //      is well-formed; policy variants live in IngestSpec) ----
    "ingest_csv" -> ((s, _) => {
      writeFixtures()
      val df = Ingest.readCsv(s, csvPath, csvSchema, Ingest.FailFast)
      ordered(df.select(col("id"), col("name"), col("qty"),
        decS(col("price")).as("price"), col("ship_date")))
    }),

    // ---- JSON scan: nested struct + array columns ----
    "jsn_scan" -> ((s, _) => {
      writeFixtures()
      val df = Ingest.readJson(s, jsonPath, jsonSchema, Ingest.FailFast)
      ordered(df.select(col("id"), col("s"), decS(col("d")).as("d"),
        col("obj.x").as("obj_x"), arrS(col("tags")).as("tags")))
    }),

    // ---- ORC sink + scan: the second columnar warehouse format Spark
    //      ships natively (predicate pushdown, column pruning and
    //      vectorized read work the same as parquet). The query writes
    //      orders to ORC once per (JVM, sfDir) and aggregates the
    //      read-back; the oracle computes the identical aggregate from the
    //      original parquet, certifying the roundtrip loses nothing
    //      (values, timestamps under the UTC session, row count). ----
    "ingest_orc" -> ((s, d) => {
      val dir = orcOrders(s, d)
      ordered(s.read.orc(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsumS(col("o_totalprice")).as("sum_price"),
          max(col("o_orderdate")).as("last_order")))
    }),

    // ---- Avro sink + scan: the row-oriented interchange format of the
    //      Kafka ecosystem (Spark 4 ships the avro source in spark-sql).
    //      Same roundtrip certification as ORC: write orders once per
    //      (JVM, sfDir), aggregate the read-back, oracle aggregates the
    //      original parquet. Avro stores timestamps as micros-since-epoch
    //      (UTC instants) and doubles/longs natively, so the roundtrip is
    //      exact under the pinned UTC session. This deployment ships the
    //      avro classes inside spark-sql but without the DataSourceRegister
    //      service entry, so the format is addressed by its implementation
    //      class instead of the "avro" short name. ----
    "ingest_avro" -> ((s, d) => {
      val dir = avroOrders(s, d)
      ordered(s.read.format(avroFormat).load(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsumS(col("o_totalprice")).as("sum_price"),
          max(col("o_orderdate")).as("last_order")))
    }),

    // ---- XML sink + scan: the document-structured partner-feed format
    //      (Spark 4 ships the former spark-xml as a native source). Same
    //      roundtrip certification as ORC/Avro: write orders as
    //      <order> rows once per (JVM, sfDir), read back with the PINNED
    //      original schema (inference on a 100 TB feed is a full extra
    //      pass — production ingests declare their schema), aggregate,
    //      and compare to the oracle's aggregate of the original parquet.
    //      XML serializes every value as text; equality across the
    //      long/double/string/timestamp columns certifies the
    //      format-and-parse cycle is value-lossless under the pinned UTC
    //      session. ----
    "ingest_xml" -> ((s, d) => {
      val dir = xmlOrders(s, d)
      ordered(s.read.format("xml").option("rowTag", "order")
        .schema(load(s, d, "orders").schema)
        .load(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsumS(col("o_totalprice")).as("sum_price"),
          max(col("o_orderdate")).as("last_order")))
    }),

    // ---- JDBC sink + read-back ([REF] dual relational sinks, Redshift
    //      `:79-87` / PostgreSQL `:88-98`): the SAME JdbcWarehouseWriter /
    //      jdbcRead code paths production would point at a network
    //      database, proven end-to-end against embedded Derby (in
    //      Spark's own classpath — no network needed). A deterministic
    //      ~1% keyslice of orders goes out over parallel JDBC INSERTs and
    //      comes back through the JDBC reader; the oracle computes the
    //      identical aggregate from the original parquet, so equality
    //      certifies the round-trip preserved longs, doubles, strings and
    //      timestamps exactly. Bounded slice: a gated query should not
    //      spend its budget on single-node INSERT throughput — the bulk
    //      path at scale is the warehouse's native loader (COPY), JDBC is
    //      the control-plane edge. ----
    "ingest_jdbc" -> ((s, d) => {
      val t = jdbcOrders(s, d)
      ordered(Ingest.jdbcRead(s, t).load()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsumS(col("o_totalprice")).as("sum_price"),
          max(col("o_orderdate")).as("last_order")))
    }),

    // ---- JDBC staged UPSERT ([REF] incremental warehouse load): base
    //      keyslice bulk-loaded, then a delta batch (repriced updates for
    //      half the base keys + brand-new keys) merged through
    //      [[Ingest.JdbcUpsertWriter]]'s staging-table DELETE+INSERT
    //      transaction — the Redshift no-native-upsert pattern, executed
    //      for real against embedded Derby. The read-back aggregate must
    //      equal the oracle's from-first-principles merge over the
    //      original parquet (anti-join of base against delta keys UNION
    //      the delta), certifying updated rows were replaced exactly once,
    //      new rows landed, and untouched rows survived. ----
    "ingest_upsert" -> ((s, d) => {
      val t = upsertOrders(s, d)
      ordered(Ingest.jdbcRead(s, t).load()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsumS(col("o_totalprice")).as("sum_price"),
          max(col("o_orderdate")).as("last_order")))
    }),

    // ---- Schema-evolution scan: a table whose schema GREW between
    //      generations — v1 files written before a column existed, v2
    //      files after — read back as ONE relation via mergeSchema, v1
    //      rows surfacing the new column as NULL (additive evolution,
    //      the only kind parquet supports without rewrite; renames/type
    //      changes need a table format's mapping metadata). The scan
    //      stays columnar and pushdown-capable on the union schema.
    //      100 TB note: option("mergeSchema") reconciles EVERY file's
    //      footer per scan — O(files) driver work each query; production
    //      pins the merged schema once in the catalog/table format and
    //      scans with the declared schema (one footer read per FILE per
    //      scan is unavoidable; per-QUERY reconciliation is not). The
    //      oracle recomputes the union from the original table: the
    //      layout split must be invisible to results. ----
    "ingest_evolve" -> ((s, d) => {
      val dir = evolveOrders(s, d)
      ordered(s.read.option("mergeSchema", "true")
        .parquet(s"$dir/v1", s"$dir/v2")
        .select(col("o_orderkey"), decS(col("o_totalprice")).as("price"),
          col("o_orderstatus").as("status")))
    }),

    // ---- SNAP-1: atomic-publish read ([REF] `:147-149` load-then-signal).
    //      The store holds v1 (base), v2 (repriced, published current) AND
    //      a half-published v3 — data files on disk, pointer never swapped
    //      (a simulated writer crash). The current read must surface
    //      EXACTLY v2: matching the oracle's repriced base certifies both
    //      that the publish was complete (no missing rows) and that the
    //      crashed v3's orphan files are invisible (no extra/short rows).
    //      The pointer-swap atomicity itself (no torn intermediate) is
    //      SnapshotSpec's job; this gated row proves the reader protocol
    //      over real files. ----
    "snap_read" -> ((s, d) => {
      val dir = snapshotOrders(s, d)
      ordered(graft.core.Snapshot.read(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          dec4S(col("o_totalprice")).as("price")))
    }),

    // ---- SNAP-2: time-travel read — version directories are immutable,
    //      so pinning v1 reproduces the pre-reprice table bit-for-bit
    //      AFTER v2 was published over it (the audit/reproducibility read;
    //      rollback is the same mechanism pointed at `_CURRENT`,
    //      exercised in SnapshotSpec). ----
    "snap_travel" -> ((s, d) => {
      val dir = snapshotOrders(s, d)
      ordered(graft.core.Snapshot.read(s, dir, Some(1L))
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          dec4S(col("o_totalprice")).as("price")))
    }),

    // ---- SNAP-3: version diff (`snap_diff`) — the incremental read the
    //      snapshot store's immutability buys (the Delta-CDF / Iceberg
    //      incremental-scan shape): diff two PUBLISHED versions row-wise
    //      into added / removed / changed / unchanged — what a downstream
    //      consumer pulls instead of re-reading the whole table, and the
    //      inverse of STR-CDC (that APPLIES a changelog; this DERIVES one
    //      from two table states). The diff store's v2 exercises every
    //      kind: keys %3=0 dropped, %3=1 repriced, %3=2 untouched, plus a
    //      disjoint added slice. Shape: ONE key-equi full-outer join of
    //      two version scans (both immutable parquet dirs — at 100 TB
    //      both sides bucket by key and the join is exchange-free;
    //      unchanged-row suppression is a filter, kept here as evidence
    //      of exactness). ----
    // ---- SNAP-PROF: column-profile drift between published versions
    //      (`snap_profile_diff`) — the DATA-CONTRACT audit a consumer
    //      runs before trusting a new version: per column, row count,
    //      null count, exact distinct count, and min/max for v1 vs v2 of
    //      the snapshot store, with changed-distinct / changed-range
    //      flags — catches silent contract breaks (a column going
    //      nullable, a domain growing, a range shift) that row-level
    //      diffing (snap_diff) reports one key at a time and a schema
    //      check misses entirely. Shape: ONE aggregate per version over
    //      the immutable version dir (multi-distinct plans via Expand —
    //      the standard exact form; at 100 TB the sketch trade is AGG-11's
    //      HLL per column), stacked to a schema-bounded per-column
    //      relation, joined on column name (≤|schema| rows). ----
    "snap_profile_diff" -> ((s, d) => {
      val dir = diffOrders(s, d)
      def prof(v: Long): DataFrame = {
        val t = graft.core.Snapshot.read(s, dir, Some(v))
        val one = t.agg(
          count(lit(1)).as("n"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("nu_k"),
          count_distinct(col("o_orderkey")).as("nd_k"),
          cstr(min(col("o_orderkey"))).as("mn_k"),
          cstr(max(col("o_orderkey"))).as("mx_k"),
          sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("nu_s"),
          count_distinct(col("o_orderstatus")).as("nd_s"),
          min(col("o_orderstatus")).as("mn_s"),
          max(col("o_orderstatus")).as("mx_s"),
          sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("nu_p"),
          count_distinct(col("o_totalprice")).as("nd_p"),
          dec4S(min(col("o_totalprice"))).as("mn_p"),
          dec4S(max(col("o_totalprice"))).as("mx_p"))
        one.select(explode(array(
          struct(lit("o_orderkey").as("colname"), col("n"),
            col("nu_k").as("n_null"), col("nd_k").as("n_distinct"),
            col("mn_k").as("min_s"), col("mx_k").as("max_s")),
          struct(lit("o_orderstatus").as("colname"), col("n"),
            col("nu_s").as("n_null"), col("nd_s").as("n_distinct"),
            col("mn_s").as("min_s"), col("mx_s").as("max_s")),
          struct(lit("o_totalprice").as("colname"), col("n"),
            col("nu_p").as("n_null"), col("nd_p").as("n_distinct"),
            col("mn_p").as("min_s"), col("mx_p").as("max_s")))).as("p"))
          .select(col("p.*"))
      }
      val (a, b) = (prof(1L).as("a"), prof(2L).as("b"))
      ordered(a.join(b, Seq("colname"))
        .select(col("colname"),
          col("a.n").as("n_v1"), col("b.n").as("n_v2"),
          col("a.n_null").as("null_v1"), col("b.n_null").as("null_v2"),
          col("a.n_distinct").as("distinct_v1"), col("b.n_distinct").as("distinct_v2"),
          col("a.min_s").as("min_v1"), col("a.max_s").as("max_v1"),
          col("b.min_s").as("min_v2"), col("b.max_s").as("max_v2"),
          (col("a.n_distinct") =!= col("b.n_distinct")).as("distinct_changed"),
          (col("a.min_s") =!= col("b.min_s") ||
            col("a.max_s") =!= col("b.max_s")).as("range_changed")))
    }),

    "snap_diff" -> ((s, d) => {
      val dir = diffOrders(s, d)
      val v1 = graft.core.Snapshot.read(s, dir, Some(1L))
        .select(col("o_orderkey").as("k1"), col("o_orderstatus").as("s1"),
          col("o_totalprice").as("p1"))
      val v2 = graft.core.Snapshot.read(s, dir, Some(2L))
        .select(col("o_orderkey").as("k2"), col("o_orderstatus").as("s2"),
          col("o_totalprice").as("p2"))
      val change = when(col("k1").isNull, lit("added"))
        .when(col("k2").isNull, lit("removed"))
        .when(col("p1") =!= col("p2") || col("s1") =!= col("s2"), lit("changed"))
        .otherwise(lit("unchanged"))
      ordered(v1.join(v2, col("k1") === col("k2"), "full_outer")
        .select(coalesce(col("k1"), col("k2")).as("o_orderkey"),
          change.as("change"),
          dec4S(col("p1")).as("price_before"),
          dec4S(col("p2")).as("price_after")))
    })
  )

  /** Two-generation orders layout for the schema-evolution scan, built
    * once per (process, sfDir): v1 = even keys WITHOUT o_orderstatus
    * (the column does not exist yet), v2 = odd keys with it. */
  private def evolveOrders(s: SparkSession, d: String): String =
    graft.core.Warehouse.once(d, "orders_evolve") { out =>
      val o = load(s, d, "orders")
      o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$out/v1")
      o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$out/v2")
    }

  /** Versioned snapshot store over an orders keyslice (o_orderkey % 7 = 0),
    * built once per (process, sfDir): v1 = base slice, v2 = repriced
    * (+50.00) and published current, then a HALF-PUBLISHED v3 — data
    * written, pointer never swapped — simulating a writer that crashed
    * after its data write but before its commit. */
  def snapshotOrders(s: SparkSession, d: String): String =
    graft.core.Warehouse.once(d, "orders_snap") { out =>
      val base = load(s, d, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      graft.core.Snapshot.publish(base, out)
      graft.core.Snapshot.publish(
        base.withColumn("o_totalprice", col("o_totalprice") + lit(50.0)), out)
      // Crashed publish: files land under v=3 but _CURRENT still says 2.
      base.limit(10).write.mode("overwrite").parquet(s"$out/v=3")
    }

  /** Snapshot store for the version diff: v1 = orders keyslice
    * (o_orderkey % 7 = 0), v2 = the same slice with keys %3=0 REMOVED,
    * %3=1 repriced (+50.00), %3=2 untouched, plus the DISJOINT %7=1
    * slice ADDED — every diff kind populated by construction. */
  def diffOrders(s: SparkSession, d: String): String =
    graft.core.Warehouse.once(d, "orders_diff") { out =>
      val o = load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val base = o.filter(col("o_orderkey") % 7 === 0)
      graft.core.Snapshot.publish(base, out)
      val v2 = base.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 1, col("o_totalprice") + lit(50.0))
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("o_orderkey") % 7 === 1))
      graft.core.Snapshot.publish(v2, out)
    }

  /** ORC copy of orders, built once per (process, sfDir) via
    * [[graft.core.Warehouse.once]]. */
  def orcOrders(s: SparkSession, d: String): String =
    graft.core.Warehouse.once(d, "orders_orc") { out =>
      load(s, d, "orders").write.mode("overwrite").orc(out)
    }

  /** The avro FileFormat addressed by class (no service-registry entry in
    * this deployment; `format("avro")` resolves via DataSourceRegister,
    * which Spark also satisfies with a fully-qualified class name). */
  val avroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Avro copy of orders, built once per (process, sfDir). */
  def avroOrders(s: SparkSession, d: String): String =
    graft.core.Warehouse.once(d, "orders_avro") { out =>
      load(s, d, "orders").write.mode("overwrite").format(avroFormat).save(out)
    }

  /** XML copy of orders (<order> row tags), built once per (process, sfDir).
    * A ~10% keyslice: XML is a verbose row-tag-per-field text format — the
    * roundtrip certification doesn't need the full table's serialization
    * throughput, just every column type crossing the format. */
  def xmlOrders(s: SparkSession, d: String): String =
    graft.core.Warehouse.once(d, "orders_xml") { out =>
      load(s, d, "orders").filter(col("o_orderkey") % 10 === 0)
        .write.mode("overwrite").format("xml")
        .option("rootTag", "orders").option("rowTag", "order").save(out)
    }

  /** Embedded-Derby copy of a deterministic orders keyslice
    * (o_orderkey % 97 = 0), loaded once per (process, sfDir) through the
    * production [[Ingest.JdbcWarehouseWriter]]. Returns the target the
    * JDBC reader should point at. */
  def jdbcOrders(s: SparkSession, d: String): Ingest.JdbcTarget = {
    val dbDir = graft.core.Warehouse.once(d, "orders_derby") { out =>
      // derby.log goes inside the cleaned-up warehouse dir, not the cwd.
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      sys.props.getOrElseUpdate("derby.stream.error.file", s"$out/derby.log")
      new Ingest.JdbcWarehouseWriter(derbyTarget(out)).write(
        load(s, d, "orders").filter(col("o_orderkey") % 97 === 0)
          // a handful of partitions = parallel INSERT batches without
          // hammering the embedded engine's lock table
          .repartition(4),
        org.apache.spark.sql.SaveMode.Overwrite)
    }
    derbyTarget(dbDir)
  }

  private def derbyTarget(dbDir: String): Ingest.JdbcTarget =
    Ingest.JdbcTarget(
      url = s"jdbc:derby:$dbDir/ordersdb;create=true",
      table = "orders_rt",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")

  /** Deterministic delta batch for the upsert flow: repriced (+100.00)
    * versions of half the base keys (o_orderkey % 194 = 0 ⊂ % 97 = 0) plus
    * an equal-sized slice of NEW keys (% 97 = 1). Shared by the query and
    * the idempotency spec. */
  def upsertDelta(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .filter(col("o_orderkey") % 194 === 0 || col("o_orderkey") % 97 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))

  /** Embedded-Derby upsert warehouse: base keyslice (o_orderkey % 97 = 0)
    * bulk-loaded, then [[upsertDelta]] merged via the staging-table
    * transaction. Built once per (process, sfDir); returns the JDBC target
    * of the merged table. */
  def upsertOrders(s: SparkSession, d: String): Ingest.JdbcTarget = {
    val dbDir = graft.core.Warehouse.once(d, "orders_upsert_derby") { out =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      sys.props.getOrElseUpdate("derby.stream.error.file", s"$out/derby.log")
      val t = upsertTarget(out)
      new Ingest.JdbcWarehouseWriter(t).write(
        load(s, d, "orders").filter(col("o_orderkey") % 97 === 0)
          .repartition(4),
        org.apache.spark.sql.SaveMode.Overwrite)
      new Ingest.JdbcUpsertWriter(t, Seq("o_orderkey"))
        .upsert(upsertDelta(s, d).repartition(4))
    }
    upsertTarget(dbDir)
  }

  def upsertTarget(dbDir: String): Ingest.JdbcTarget =
    Ingest.JdbcTarget(
      url = s"jdbc:derby:$dbDir/upsertdb;create=true",
      table = "orders_ups",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")

  val oracle: Map[String, String] = Map(
    // The union the merged scan must reconstruct: even keys never had a
    // status (NULL), odd keys carry it.
    "ingest_evolve" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(38,4)) AS VARCHAR) AS price,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status
        |FROM orders
        |ORDER BY o_orderkey NULLS FIRST, price NULLS FIRST, status NULLS FIRST""".stripMargin,

    "ingest_csv" ->
      s"""SELECT id, name, qty, CAST(CAST(price AS DECIMAL(38,4)) AS VARCHAR) AS price, ship_date
        |FROM read_csv('$csvPath', header=true,
        |  columns={'id':'BIGINT','name':'VARCHAR','qty':'INTEGER','price':'DOUBLE','ship_date':'DATE'})
        |ORDER BY id NULLS FIRST, name NULLS FIRST, qty NULLS FIRST, price NULLS FIRST, ship_date NULLS FIRST""".stripMargin,

    "jsn_scan" ->
      s"""SELECT id, s, CAST(CAST(d AS DECIMAL(38,4)) AS VARCHAR) AS d,
        |  obj.x AS obj_x,
        |  CASE WHEN tags IS NULL THEN NULL
        |       ELSE COALESCE(array_to_string(tags, ','), '') END AS tags
        |FROM read_json('$jsonPath', format='newline_delimited',
        |  columns={'id':'BIGINT','s':'VARCHAR','d':'DOUBLE','obj':'STRUCT(x INTEGER)','tags':'VARCHAR[]'})
        |ORDER BY id NULLS FIRST, s NULLS FIRST, d NULLS FIRST, obj_x NULLS FIRST, tags NULLS FIRST""".stripMargin,

    // DuckDB can't read Spark's ORC, so the twin aggregates the ORIGINAL
    // parquet orders — equality certifies the ORC roundtrip is lossless.
    "ingest_orc" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_price,
        |  max(o_orderdate) AS last_order
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST, n_orders NULLS FIRST, sum_price NULLS FIRST, last_order NULLS FIRST""".stripMargin,

    // DuckDB can't read Spark's Avro either; same original-parquet twin
    // pattern as ORC — equality certifies the Avro roundtrip is lossless.
    "ingest_avro" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_price,
        |  max(o_orderdate) AS last_order
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST, n_orders NULLS FIRST, sum_price NULLS FIRST, last_order NULLS FIRST""".stripMargin,

    // DuckDB can't read Spark's row-tag XML; same original-parquet twin
    // pattern, restricted to the written keyslice — equality certifies the
    // XML text-serialize-and-parse cycle is value-lossless.
    "ingest_xml" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_price,
        |  max(o_orderdate) AS last_order
        |FROM orders
        |WHERE o_orderkey % 10 = 0
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST, n_orders NULLS FIRST, sum_price NULLS FIRST, last_order NULLS FIRST""".stripMargin,

    // DuckDB can't open Derby, so the twin aggregates the same keyslice of
    // the ORIGINAL parquet orders — equality certifies the Spark→Derby→
    // Spark JDBC round-trip is lossless.
    "ingest_jdbc" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_price,
        |  max(o_orderdate) AS last_order
        |FROM orders
        |WHERE o_orderkey % 97 = 0
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST, n_orders NULLS FIRST, sum_price NULLS FIRST, last_order NULLS FIRST""".stripMargin,

    // From-first-principles merge over the original parquet: base rows
    // whose key the delta does NOT touch, UNION ALL the delta (updates +
    // inserts). Equality with the Derby read-back certifies the staged
    // DELETE+INSERT replaced each updated key exactly once.
    "ingest_upsert" ->
      """WITH base AS (
        |  SELECT * FROM orders WHERE o_orderkey % 97 = 0
        |), delta AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice + 100.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 194 = 0 OR o_orderkey % 97 = 1
        |), merged AS (
        |  SELECT * FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM delta x WHERE x.o_orderkey = b.o_orderkey)
        |  UNION ALL SELECT * FROM delta
        |)
        |SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_price,
        |  max(o_orderdate) AS last_order
        |FROM merged
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST, n_orders NULLS FIRST, sum_price NULLS FIRST, last_order NULLS FIRST""".stripMargin,

    // The store's CURRENT version is v2 = the repriced base slice; the twin
    // recomputes it from the original parquet. Equality certifies the
    // publish was complete AND the crashed v3's orphan files are invisible
    // (any v3 leak-through would change the row multiset).
    "snap_read" ->
      """SELECT o_orderkey, o_orderstatus AS status,
        |  CAST(CAST(floor((o_totalprice + 50.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS price
        |FROM orders WHERE o_orderkey % 7 = 0
        |ORDER BY o_orderkey NULLS FIRST, status NULLS FIRST, price NULLS FIRST""".stripMargin,

    // Time travel pins v1 = the pre-reprice base slice, read AFTER v2 was
    // published over it — immutable version directories make the old table
    // exactly reproducible.
    "snap_travel" ->
      """SELECT o_orderkey, o_orderstatus AS status,
        |  CAST(CAST(floor((o_totalprice)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS price
        |FROM orders WHERE o_orderkey % 7 = 0
        |ORDER BY o_orderkey NULLS FIRST, status NULLS FIRST, price NULLS FIRST""".stripMargin,

    // Both versions recomputed from the parquet original, then the same
    // key-equi full-outer diff classification.
    "snap_profile_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |v1 AS (SELECT * FROM o WHERE o_orderkey % 7 = 0),
        |v2 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 3 = 1 THEN o_totalprice + 50.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM v1 WHERE o_orderkey % 3 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM o WHERE o_orderkey % 7 = 1),
        |p1 AS (
        |  SELECT 'o_orderkey' AS colname, CAST(COUNT(1) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_s, CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
        |  FROM v1
        |  UNION ALL
        |  SELECT 'o_orderstatus', CAST(COUNT(1) AS BIGINT),
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        |    MIN(o_orderstatus), MAX(o_orderstatus)
        |  FROM v1
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(COUNT(1) AS BIGINT),
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
        |    CAST(CAST(floor((MIN(o_totalprice))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR),
        |    CAST(CAST(floor((MAX(o_totalprice))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR)
        |  FROM v1),
        |p2 AS (
        |  SELECT 'o_orderkey' AS colname, CAST(COUNT(1) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_s, CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
        |  FROM v2
        |  UNION ALL
        |  SELECT 'o_orderstatus', CAST(COUNT(1) AS BIGINT),
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        |    MIN(o_orderstatus), MAX(o_orderstatus)
        |  FROM v2
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(COUNT(1) AS BIGINT),
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
        |    CAST(CAST(floor((MIN(o_totalprice))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR),
        |    CAST(CAST(floor((MAX(o_totalprice))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR)
        |  FROM v2)
        |SELECT p1.colname, p1.n AS n_v1, p2.n AS n_v2,
        |  p1.n_null AS null_v1, p2.n_null AS null_v2,
        |  p1.n_distinct AS distinct_v1, p2.n_distinct AS distinct_v2,
        |  p1.min_s AS min_v1, p1.max_s AS max_v1,
        |  p2.min_s AS min_v2, p2.max_s AS max_v2,
        |  p1.n_distinct <> p2.n_distinct AS distinct_changed,
        |  (p1.min_s <> p2.min_s OR p1.max_s <> p2.max_s) AS range_changed
        |FROM p1 JOIN p2 USING (colname)
        |ORDER BY colname NULLS FIRST, n_v1 NULLS FIRST, n_v2 NULLS FIRST, null_v1 NULLS FIRST, null_v2 NULLS FIRST, distinct_v1 NULLS FIRST, distinct_v2 NULLS FIRST, min_v1 NULLS FIRST, max_v1 NULLS FIRST, min_v2 NULLS FIRST, max_v2 NULLS FIRST, distinct_changed NULLS FIRST, range_changed NULLS FIRST""".stripMargin,

    "snap_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |v1 AS (SELECT * FROM o WHERE o_orderkey % 7 = 0),
        |v2 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 3 = 1 THEN o_totalprice + 50.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM v1 WHERE o_orderkey % 3 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM o WHERE o_orderkey % 7 = 1),
        |j AS (
        |  SELECT v1.o_orderkey AS k1, v1.o_orderstatus AS s1, v1.o_totalprice AS p1,
        |         v2.o_orderkey AS k2, v2.o_orderstatus AS s2, v2.o_totalprice AS p2
        |  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
        |SELECT COALESCE(k1, k2) AS o_orderkey,
        |  CASE WHEN k1 IS NULL THEN 'added' WHEN k2 IS NULL THEN 'removed'
        |       WHEN p1 <> p2 OR s1 <> s2 THEN 'changed' ELSE 'unchanged' END AS change,
        |  CAST(CAST(floor((p1)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS price_before,
        |  CAST(CAST(floor((p2)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS price_after
        |FROM j
        |ORDER BY o_orderkey NULLS FIRST, change NULLS FIRST, price_before NULLS FIRST, price_after NULLS FIRST""".stripMargin
  )

  /** Every [[graft.core.Warehouse.once]] dataset this module owns, as
    * (name, forcing thunk) — see [[LlmOps.prebuilds]]. */
  val prebuilds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "orders_evolve" -> ((s, d) => { evolveOrders(s, d); () }),
    "orders_snap" -> ((s, d) => { snapshotOrders(s, d); () }),
    "orders_diff" -> ((s, d) => { diffOrders(s, d); () }),
    "orders_orc" -> ((s, d) => { orcOrders(s, d); () }),
    "orders_avro" -> ((s, d) => { avroOrders(s, d); () }),
    "orders_xml" -> ((s, d) => { xmlOrders(s, d); () }),
    "orders_derby" -> ((s, d) => { jdbcOrders(s, d); () }),
    "orders_upsert_derby" -> ((s, d) => { upsertOrders(s, d); () }))
}
