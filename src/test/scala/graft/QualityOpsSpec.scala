package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic laws for the round-6 quality/compaction operators. The DuckDB
  * oracle certifies values; these certify the DECLARED properties hold on
  * the sf0.001 slice (totality, conservation, and the redaction actually
  * removing what it counted). */
class QualityOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("cdc_latest: exactly one row per key, carrying that key's max (ts, event_id)") {
    val out = SparkEntry.queries("cdc_latest")(spark, sfDir)
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val nUsers = events.select(col("user_id")).distinct().count()
    assert(out.count() == nUsers, "compaction must emit one snapshot row per key")
    // The kept (ts, event_id) is the per-user lexicographic max.
    val expect = events.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.ts").as("last_ts"), col("m.event_id").as("last_event_id"))
    assertSameRows(out.select(col("user_id"), col("last_ts"), col("last_event_id")),
      expect, "cdc_latest keeper")
  }

  test("dq_audit: constraint tallies agree with direct recomputation") {
    val r = SparkEntry.queries("dq_audit")(spark, sfDir).collect().head
    val o = graft.core.Tables.load(spark, sfDir, "orders")
    assert(r.getAs[Long]("n_rows") == o.count())
    assert(r.getAs[Long]("n_dup_orderkey") ==
      o.count() - o.select(col("o_orderkey")).distinct().count())
    assert(r.getAs[Long]("n_nonpos_price") ==
      o.filter(col("o_totalprice") <= 0.0).count())
  }

  test("agg_hist: buckets partition the table — counts and sums conserve") {
    val h = SparkEntry.queries("agg_hist")(spark, sfDir)
    val o = graft.core.Tables.load(spark, sfDir, "orders")
    val rows = h.collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == o.count(),
      "every order must land in exactly one bucket")
    assert(rows.forall { r =>
      val b = r.getAs[Int]("bucket"); b >= 0 && b <= 19 &&
        r.getAs[Long]("bucket_lo") == b * 30000L
    })
  }

  test("smp_rate: per-stratum retention bounds and conservation") {
    val r = SparkEntry.queries("smp_rate")(spark, sfDir).collect()
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    assert(r.map(_.getAs[Long]("n_total")).sum == doc.count())
    r.foreach { row =>
      val (tot, kept) = (row.getAs[Long]("n_total"), row.getAs[Long]("n_kept"))
      assert(kept >= 0 && kept <= tot)
      // The keep decision is a pure function of doc_id, so the md5-prefix
      // rate concentrates: allow a wide band (binomial at sf0.001 strata).
      val target = if (row.getAs[String]("lang") == "en") 26.0 / 256 else 128.0 / 256
      if (tot >= 50)
        assert(math.abs(kept.toDouble / tot - target) < 0.2,
          s"lang=${row.getAs[String]("lang")} kept=$kept/$tot vs target=$target")
    }
  }

  test("txt_pii: the synthesized PII is counted, and redaction removes every match") {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phonePat = "\\d{3}-\\d{3}-\\d{4}"
    val out = SparkEntry.queries("txt_pii")(spark, sfDir)
    assert(out.filter(col("n_email") < 1 || col("n_phone") < 1).count() == 0,
      "the appended doc_id-derived PII must fire the patterns on every row")
    // Rebuild the augmented text and redact it with the same patterns: the
    // result must contain zero residual matches (the count columns prove
    // the patterns matched; this proves the replacement consumed them).
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com ph "),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-555-"),
      lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"))
    val red = regexp_replace(regexp_replace(aug, emailPat, "<EMAIL>"), phonePat, "<PHONE>")
    val residual = doc.select(
      (regexp_count(red, lit(emailPat)) + regexp_count(red, lit(phonePat))).as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(residual == 0, s"$residual unredacted PII matches remain")
  }

  test("running_reset: every signup opens its segment with its own value; prefix sums replay") {
    val rows = SparkEntry.queries("running_reset")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3),
        BigDecimal(r.getString(4))))
    val evs = graft.core.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val got = rows.map(r => (r._2, r._1) -> ((r._3, r._4))).toMap
    evs.groupBy(_._1).foreach { case (u, es) =>
      var seg = 0
      var bal = BigDecimal(0)
      es.sortBy(e => (e._3, e._2)).foreach { case (_, eid, _, typ, v) =>
        if (typ == "signup") { seg += 1; bal = 0 }
        bal += BigDecimal(v).setScale(4)
        assert(got((u, eid)) == ((seg, bal)),
          s"user $u event $eid: ${got((u, eid))} vs ($seg, $bal)")
      }
    }
  }

  test("txt_mask: pseudonymization is stable (same value, same token) and total") {
    val out = SparkEntry.queries("txt_mask")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getString(4)))
    out.foreach { case (id, nMasked, nDistinct, md5) =>
      // 2 injected email copies + 1 phone = at least 3 masked tokens
      assert(nMasked >= 3, s"doc $id masked only $nMasked")
      // the repeated email collapses to ONE pseudonym: distinct < masked —
      // the stability law that keeps joins working on the masked corpus
      assert(nDistinct == nMasked - 1, s"doc $id: $nDistinct distinct of $nMasked")
      assert(md5.length == 32)
    }
    // masking changed the text: the masked md5 never equals the raw-aug md5
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com and again user"), col("doc_id").cast("string"),
      lit("@example.com ph "),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-555-"),
      lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"))
    val rawMd5 = doc.select(col("doc_id"), md5(aug).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, _, _, m) =>
      assert(m != rawMd5(id), s"doc $id: mask was a no-op")
    }
  }

  test("funnel: window formulation equals a driver-side state-machine replay") {
    val out = SparkEntry.queries("funnel")(spark, sfDir)
      .collect().map { r =>
        r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getInt(4)))
      }.toMap
    val ev = graft.core.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .sortBy { case (u, ts, id, _) => (u, ts.getTime, id) }
    val expect = ev.groupBy(_._1).map { case (u, rows) =>
      var fv: Option[java.sql.Timestamp] = None
      var fc: Option[java.sql.Timestamp] = None
      var fp: Option[java.sql.Timestamp] = None
      for ((_, ts, _, tpe) <- rows) tpe match {
        case "view" if fv.isEmpty => fv = Some(ts)
        case "click" if fv.isDefined && fc.isEmpty => fc = Some(ts)
        case "purchase" if fc.isDefined && fp.isEmpty => fp = Some(ts)
        case _ => ()
      }
      u -> ((fv, fc, fp, fv.size + fc.size + fp.size))
    }
    assert(out.keySet == expect.keySet)
    expect.foreach { case (u, e) =>
      assert(out(u) == ((e._1, e._2, e._3, e._4)), s"user $u: ${out(u)} vs $e")
    }
  }

  test("join14_nearest: window pick equals a naive nearest-click scan per purchase") {
    val out = SparkEntry.queries("join14_nearest")(spark, sfDir)
      .collect().map { r =>
        r.getLong(0) -> ((r.getTimestamp(3), r.getString(4), r.getLong(5)))
      }.toMap
    val ev = graft.core.Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val usOf = (ts: java.sql.Timestamp) => ts.getTime * 1000L + ts.getNanos / 1000 % 1000
    val byUser = ev.groupBy(_._2)
    val expect = byUser.toSeq.flatMap { case (_, rows) =>
      val clicks = rows.filter(_._4 == "click").map(r => usOf(r._3)).sorted
      rows.filter(_._4 == "purchase").flatMap { case (pid, _, pts, _) =>
        if (clicks.isEmpty) None
        else {
          val p = usOf(pts)
          val prev = clicks.filter(_ <= p).lastOption
          val next = clicks.filter(_ > p).headOption
          val (cus, dir) = (prev, next) match {
            case (Some(b), Some(f)) =>
              if (p - b <= f - p) (b, "before") else (f, "after")
            case (Some(b), None) => (b, "before")
            case (None, Some(f)) => (f, "after")
            case _ => sys.error("unreachable")
          }
          Some(pid -> ((cus, dir, math.abs(cus - p))))
        }
      }
    }.toMap
    assert(out.keySet == expect.keySet)
    expect.foreach { case (pid, (cus, dir, gap)) =>
      val (ots, odir, ogap) = out(pid)
      assert(usOf(ots) == cus && odir == dir && ogap == gap,
        s"purchase $pid: got ($ots, $odir, $ogap) want ($cus, $dir, $gap)")
    }
  }

  test("cohort: offset-0 row of each cohort counts the cohort's full population") {
    val rows = SparkEntry.queries("cohort")(spark, sfDir).collect()
    val e = graft.core.Tables.load(spark, sfDir, "events")
    val nUsers = e.select(col("user_id")).distinct().count()
    // Every user is active on their own cohort day, so the day_offset=0
    // rows across cohorts partition the user population.
    val day0 = rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(_.getAs[Long]("n_active")).sum
    assert(day0 == nUsers, s"offset-0 total $day0 != $nUsers users")
    // And no cohort's later-day count can exceed its own population.
    val pop = rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(r => r.getAs[java.sql.Date]("cohort_day") -> r.getAs[Long]("n_active")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= pop(r.getAs[java.sql.Date]("cohort_day")),
        s"retention above cohort population at $r")
    }
  }

  test("smp_weighted: kept rows skew toward higher weights") {
    val rows = SparkEntry.queries("smp_weighted")(spark, sfDir).collect()
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_total")).sum == doc.count())
    // Importance sampling's defining property: the mean weight of the kept
    // set exceeds the stratum mean (longer docs are kept more often).
    // Strict inequality needs enough rows for the effect to dominate hash
    // noise — assert on strata with >= 100 docs.
    rows.filter(_.getAs[Long]("n_total") >= 100).foreach { r =>
      val all = BigDecimal(r.getAs[String]("avg_w_all"))
      val kept = BigDecimal(r.getAs[String]("avg_w_kept"))
      assert(kept > all, s"lang=${r.getAs[String]("lang")}: kept mean $kept !> all mean $all")
    }
  }

  test("smp_priority: selection matches an independent driver-side recount") {
    // Independent reimplementation of the whole priority pipeline (md5
    // prefix -> uniform -> w/u -> per-stratum top-5 with the declared
    // tie-break) over the collected documents table — certifies the
    // engine-side conv/md5/division arithmetic, not just engine-vs-oracle
    // agreement on it.
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def prio(docId: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      val u = (java.lang.Long.parseLong(md, 16) + 1.0) / 16777217.0
      w.toDouble / u
    }
    val expected = doc.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.toSeq.map { case (id, _, w) => (id, prio(id, w)) }
        .sortBy { case (id, p) => (-p, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (lang, i + 1, id) }
    }.toSet
    val got = SparkEntry.queries("smp_priority")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rk"), r.getAs[Long]("doc_id"))).toSet
    assert(got == expected, s"diff: ${(got diff expected) ++ (expected diff got)}")
  }

  test("scd2: per-user intervals are contiguous, non-overlapping, single-current") {
    val rows = SparkEntry.queries("scd2")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (u, hist0) =>
      val hist = hist0.sortBy(_._3.getTime)
      // Exactly one open (current) interval, and it is the last one.
      assert(hist.count(_._5) == 1, s"user $u: ${hist.count(_._5)} current rows")
      assert(hist.last._5 && hist.last._4.isEmpty, s"user $u: current not last")
      hist.sliding(2).foreach {
        case Array(a, b) =>
          // Each interval closes exactly where the next opens...
          assert(a._4.contains(b._3), s"user $u: gap/overlap at ${a._4} -> ${b._3}")
          // ...and a change row really changes the state.
          assert(a._2 != b._2, s"user $u: consecutive intervals share state ${a._2}")
        case _ => ()
      }
    }
  }

  test("freq_cms: sketch estimates dominate exact counts over the whole vocabulary") {
    // The count-min property (est >= exact, always — collisions only add)
    // must hold for EVERY token, not just the 10 the gated query emits.
    // Recompute the sketch for the full vocabulary with the query's own
    // hash streams and assert domination plus the standard error bound
    // est - exact <= N/w per row (loose Markov bound; with d=2 rows the
    // min is far tighter in practice).
    import graft.functions.GraftFunctions.poly_hash
    val W = 1024L
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    val cnt = doc.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val b1 = poly_hash(col("tok")) % W
    val b2 = poly_hash(concat(lit("#"), col("tok"))) % W
    val r1 = cnt.groupBy(b1.as("b")).agg(sum(col("n")).as("c1"))
    val r2 = cnt.groupBy(b2.as("b")).agg(sum(col("n")).as("c2"))
    val est = cnt.withColumn("b1", b1).withColumn("b2", b2)
      .join(r1, col("b1") === r1("b")).join(r2, col("b2") === r2("b"))
      .select(col("tok"), col("n"), least(col("c1"), col("c2")).as("est"))
    val total = cnt.agg(sum(col("n"))).collect().head.getLong(0)
    val rows = est.collect()
    rows.foreach { r =>
      val (n, e) = (r.getAs[Long]("n"), r.getAs[Long]("est"))
      assert(e >= n, s"CMS underestimated ${r.getAs[String]("tok")}: $e < $n")
      assert(e - n <= total / W * 8,
        s"error beyond bound for ${r.getAs[String]("tok")}: est=$e exact=$n N=$total")
    }
  }

  test("vec_quant: codes stay in int8 range and reconstruction error is small") {
    val rows = SparkEntry.queries("vec_quant")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_max") <= 127 && r.getAs[Long]("q_min") >= -127,
        s"code out of int8 range: $r")
      // Max-abs scaling over 64 dims keeps relative L2 error ~0.5%; 5% is
      // a loose ceiling that still catches a broken scale or rounding.
      assert(BigDecimal(r.getAs[String]("rel_err")) < BigDecimal("0.05"),
        s"reconstruction error too high: $r")
    }
  }

  test("resample: hourly grid interpolates linearly between bracketing events") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("resample_edge").toString
    // Two events one value-decade apart: the 01:00 and 02:00 grid points
    // sit 25% and 75% of the way through the 00:30→02:30 segment.
    Seq((1L, "2024-01-01 00:30:00", 7L, "view", 10.0, "{}"),
        (2L, "2024-01-01 02:30:00", 7L, "view", 20.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = SparkEntry.queries("resample")(spark, d)
      .collect().map(r => r.getTimestamp(1).toString -> r.getString(2))
    assert(rows.toSeq.sorted == Seq(
      "2024-01-01 01:00:00.0" -> "12.5000",
      "2024-01-01 02:00:00.0" -> "17.5000"), s"got ${rows.toSeq}")
  }

  test("resample: grid point on an event instant takes that event's value exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("resample_tie").toString
    // The 02:00 grid point coincides with the 02:00 event: tie order must
    // make it the PREV (ratio 0 → exact value), never the NEXT — the
    // property the reversed-sort backward fill has to preserve. A second
    // user entirely inside one hour must produce no grid rows at all.
    Seq((1L, "2024-01-01 00:30:00", 7L, "view", 10.0, "{}"),
        (2L, "2024-01-01 02:00:00", 7L, "view", 14.0, "{}"),
        (3L, "2024-01-01 03:30:00", 7L, "view", 20.0, "{}"),
        (4L, "2024-01-01 05:10:00", 8L, "view", 1.0, "{}"),
        (5L, "2024-01-01 05:50:00", 8L, "view", 2.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = SparkEntry.queries("resample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getString(2)))
    assert(rows.toSeq.sorted == Seq(
      // 01:00 interpolates 00:30(10)→02:00(14) at 30/90 of the way;
      // 02:00 is the event instant (exactly 14, no interpolation);
      // 03:00 interpolates 02:00(14)→03:30(20) at 60/90 of the way.
      (7L, "2024-01-01 01:00:00.0", "11.3333"),
      (7L, "2024-01-01 02:00:00.0", "14.0000"),
      (7L, "2024-01-01 03:00:00.0", "18.0000")), s"got ${rows.toSeq.sorted}")
  }

  test("ivl1: bucketed interval join equals the naive O(n^2) overlap count") {
    // The time-bucket decomposition (explode -> equi-join -> count-once at
    // the later start's bucket) must reproduce the declared theta-join
    // semantics EXACTLY — certified here against an independent driver-side
    // quadratic recount over the collected session list (fine at sf0.001,
    // which is the whole point of not shipping the quadratic form).
    // Bounds compared at MICROSECOND precision (getTime is ms-truncated;
    // the query's overlap predicate is µs-exact and 999/1000 test rows
    // carry sub-ms timestamps, so an oppositely-µs-ordered pair inside one
    // millisecond would otherwise make this recount disagree spuriously).
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    val rows = SparkEntry.queries("ivl1")(spark, sfDir).collect()
    val out = rows
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[Int]("session_id")),
        r.getAs[Long]("n_concurrent"))).toMap
    val bounds = rows
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("session_id"),
        micros(r.getAs[java.sql.Timestamp]("session_start")),
        micros(r.getAs[java.sql.Timestamp]("session_end"))))
    assert(out.size == bounds.length, "session identity must be unique")
    for ((u, sid, st, en) <- bounds) {
      val naive = bounds.count { case (u2, _, st2, en2) =>
        u2 != u && st <= en2 && st2 <= en
      }
      assert(out((u, sid)) == naive.toLong,
        s"session ($u,$sid): bucketed=${out((u, sid))} naive=$naive")
    }
  }

  test("quota_alloc: quotas sum exactly to the budget and respect floor/ceiling") {
    // The whole point of largest-remainder apportionment: Σ quota == B
    // exactly (naive rounding misses in either direction), and every
    // stratum gets floor(B·n/N) or floor+1 — nothing else.
    val rows = SparkEntry.queries("quota_alloc")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totalDocs = rows.map(_._2).sum
    assert(rows.map(_._3).sum == 1000L,
      s"quotas must sum to the budget: ${rows.toSeq}")
    rows.foreach { case (lang, n, q) =>
      val base = 1000L * n / totalDocs
      assert(q == base || q == base + 1,
        s"$lang: quota $q outside {floor, floor+1} of ${1000.0 * n / totalDocs}")
    }
  }

  test("cdc_compact: applying the compacted log equals cdc_apply; crafted I->D windows cancel") {
    import graft.queries.Events
    // Apply-equivalence: base ⊕ compacted == base ⊕ full log (= cdc_apply).
    val (baseDf, _, _) = Events.cdcGenerations(
      graft.core.Tables.load(spark, sfDir, "orders"))
    val base = baseDf.select(col("k"), graft.core.Tables.cstr(col("price")),
      col("status")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val net = SparkEntry.queries("cdc_compact")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(4),
        Option(r.getString(5)), Option(r.getString(6))))
    val applied = net.foldLeft(base) {
      case (m, (k, "D", _, _)) => m - k
      case (m, (k, _, Some(p), Some(st))) => m + (k -> ((p, st)))
      case (m, _) => m
    }
    val expect = SparkEntry.queries("cdc_apply")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(applied == expect, "compacted apply must reach cdc_apply's final state")
    // Cancellation + net rules on a crafted log the fixture never produces.
    import spark.implicits._
    val crafted = Seq(
      (1L, 1, "I", "10.0000", "A"), (1L, 2, "D", null, "A"),       // I→D cancels
      (2L, 1, "I", "1.0000", "B"), (2L, 2, "U", "2.0000", "B"),
      (2L, 3, "D", null, "B"),                                     // I→U→D cancels
      (3L, 1, "U", "5.0000", "C"), (3L, 2, "U", "6.0000", "C"),
      (3L, 3, "D", null, "C"))                                     // U→U→D nets D
      .toDF("k", "seq", "op", "price", "status")
    val out = Events.compactChangelog(crafted).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out == Map(3L -> "D"), s"cancellation rules: $out")
  }

  test("mix_temp: budget conservation, temperature interpolation, order preservation") {
    val rows = SparkEntry.queries("mix_temp")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3).toDouble,
        r.getString(4).toDouble, r.getLong(5), r.getString(6).toDouble))
    val B = 1000000L
    assert(rows.map(_._5).sum == B, s"quotas must sum to the budget: ${rows.toSeq}")
    // floor/floor+1 apportionment against the exact sqrt weights
    val wsum = rows.map(x => math.sqrt(x._2.toDouble)).sorted.sum
    rows.foreach { case (lang, n, _, _, quota, _) =>
      val base = math.floor(B * math.sqrt(n.toDouble) / wsum).toLong
      assert(quota == base || quota == base + 1,
        s"$lang: quota $quota outside {floor, floor+1} of ${B * math.sqrt(n.toDouble) / wsum}")
    }
    // Temperature INTERPOLATES toward uniform: a below-uniform language is
    // upsampled (raw < temp, factor > 1), an above-uniform one damped —
    // and the power map preserves the resource ordering.
    val u = 1.0 / rows.length
    rows.foreach { case (lang, _, raw, temp, _, factor) =>
      if (raw < u - 1e-3) assert(temp > raw && factor > 1.0, s"$lang not upsampled")
      if (raw > u + 1e-3) assert(temp < raw && factor < 1.0, s"$lang not damped")
    }
    assert(rows.sortBy(_._3).map(_._1).toSeq == rows.sortBy(_._4).map(_._1).toSeq,
      "sqrt temperature must preserve the language resource ordering")
  }

  test("cusum_change: located day equals the naive argmax of |n*prefix - t*total|") {
    import spark.implicits._
    val daily = graft.core.Tables.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("x"))
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(0), BigDecimal(r.getDecimal(1))))
    val n = daily.length
    val total = daily.map(_._2).sum
    var prefix = BigDecimal(0); var best = BigDecimal(-1); var bestDay: java.sql.Date = null
    daily.zipWithIndex.foreach { case ((day, x), i) =>
      prefix += x
      val s = (n * prefix - (i + 1) * total).abs
      if (s > best) { best = s; bestDay = day } // strict > keeps earliest tie
    }
    val got = SparkEntry.queries("cusum_change")(spark, sfDir).collect().head
    assert(got.getDate(0).toString == bestDay.toString,
      s"windowed ${got.getDate(0)} vs naive $bestDay")
    assert(BigDecimal(got.getString(3)) == best,
      s"stat ${got.getString(3)} vs naive $best")
  }

  test("bpe_train: greedy left-to-right merges; best-pair count never increases") {
    import spark.implicits._
    // "aaaa" is the canonical greedy-application probe: round 1 must count
    // the pair (a,a) at all 3 adjacent positions but merge left-to-right
    // non-overlapping into exactly "aa aa" (NOT "a aa a" or a rescan into
    // "aaa a"), so round 2 sees exactly one (aa,aa) pair; round 3 has no
    // pairs and emits nothing. Any off-by-one in the |-delimited encoding
    // or a regex-style rescan after replacement breaks one of the rows.
    val d = java.nio.file.Files.createTempDirectory("bpe_edge").toString
    Seq((1L, "aaaa", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val edge = SparkEntry.queries("bpe_train")(spark, d)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(edge.toSeq == Seq((1, "a", "a", "aa", 3L), (2, "aa", "aa", "aaaa", 1L)),
      s"got ${edge.toSeq}")
    // Law on the real corpus: the argmax count is non-increasing across
    // rounds — any pair existing at round r is bounded by round r's best,
    // and pairs created by a merge occur at most once per occurrence of
    // the merged pair, so no later round can beat an earlier one.
    val ns = SparkEntry.queries("bpe_train")(spark, sfDir)
      .orderBy(col("round")).collect().map(_.getLong(4))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"merge counts increased across rounds: ${ns.toSeq}")
  }

  test("bpe_train batched: non-conflicting batches reproduce the sequential merge table; rounds track batches") {
    // BPE-1's declared at-scale switch, EXECUTED (r12 verdict task 3):
    // merges whose symbols are pairwise disjoint (and strictly above the
    // first touched candidate's count) apply in ONE corpus pass. The law
    // is exact merge-table equivalence with the sequential trainer.
    import spark.implicits._
    import graft.queries.LlmOps
    def seqTable(doc: org.apache.spark.sql.DataFrame, k: Int) =
      LlmOps.bpeMerges(doc, k).flatMap(_.collect().headOption)
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    // (a) the gated corpus at the gated budget
    val (b6, r6) = LlmOps.bpeMergesBatched(docs, 6)
    assert(b6 == seqTable(docs, 6),
      s"batched(6) diverged from sequential on the corpus: $b6")
    assert(r6 <= 6, s"batched rounds $r6 exceed merges")
    // (b) crafted CONFLICT: (a,b) outranks (a,a) but shares 'a' — the
    // guard must degrade round 1 to the sequential single step, and the
    // table must still equal sequential exactly.
    val conflict = (1 to 10).map(i => (i.toLong, "aab", "en", "t", 3L))
      .++((11 to 15).map(i => (i.toLong, "ab", "en", "t", 2L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (bc, rc) = LlmOps.bpeMergesBatched(conflict, 2)
    assert(bc == seqTable(conflict, 2),
      s"batched diverged from sequential on the conflict corpus: $bc")
    assert(rc == 2, s"conflicting pairs must not batch (rounds $rc)")
    assert(bc.map(_._1) == Seq("|a||b|", "|a||ab|"), s"priority order: $bc")
    // (c) crafted DISJOINT pairs batch into one round.
    val disjoint = (1 to 10).map(i => (i.toLong, "ab", "en", "t", 2L))
      .++((11 to 17).map(i => (i.toLong, "cd", "en", "t", 2L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (bd, rd) = LlmOps.bpeMergesBatched(disjoint, 2)
    assert(bd == seqTable(disjoint, 2),
      s"batched diverged from sequential on the disjoint corpus: $bd")
    assert(rd == 1, s"disjoint top pairs must batch into one round (got $rd)")
    // (d) the enlarged-budget probe: at 64 merges the corpus-pass count
    // must track BATCHES, not merges — the at-scale claim itself — while
    // the table stays exactly sequential.
    val (b64, r64) = LlmOps.bpeMergesBatched(docs, 64)
    val s64 = seqTable(docs, 64)
    assert(b64 == s64.take(b64.length),
      "batched(64) diverged from sequential")
    assert(b64.length == s64.length,
      s"batched trained ${b64.length} merges vs sequential ${s64.length}")
    info(s"64-merge budget: ${b64.length} merges in $r64 corpus passes " +
      f"(${b64.length.toDouble / r64}%.1f merges/pass)")
    assert(r64 < b64.length || b64.length <= 1,
      s"no batching happened at the 64-merge budget ($r64 rounds)")
  }

  test("bounded_balance: reflection identity equals the direct clamped recurrence") {
    // b_t = prefix_t - min(0, min_{i<=t} prefix_i) must equal the literal
    // b_t = max(0, b_{t-1} + x_t) fold — recomputed driver-side per user in
    // exact BigDecimal at sf0.001 (the identity is the whole operator; a
    // wrong frame or a missed tie-order would diverge on the first user
    // whose balance bottoms out).
    val rows = SparkEntry.queries("bounded_balance")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("event_id"),
         BigDecimal(r.getAs[String]("flow")), BigDecimal(r.getAs[String]("balance")))))
    var clampedSeen = 0
    rows.groupBy(_._1).foreach { case (u, evs) =>
      var b = BigDecimal(0)
      evs.map(_._2).sortBy(e => (e._1.getTime, e._1.getNanos, e._2)).foreach {
        case (_, eid, flow, bal) =>
          b = (b + flow).max(BigDecimal(0))
          assert(b == bal, s"user $u event $eid: direct $b != windowed $bal")
          if (b == BigDecimal(0) && flow < 0) clampedSeen += 1
      }
    }
    assert(clampedSeen > 0, "corpus never hit the floor — clamp untested")
  }

  test("txt_norm: normalized text is idempotent under re-normalization") {
    // norm(norm(x)) == norm(x): certifies the three rewrites commute into a
    // fixpoint (lowercase/strip/collapse applied to normalized text is a
    // no-op), so chaining the pass in a pipeline cannot change content keys.
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    def norm(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
    val n = doc.filter(norm(col("text")) =!= norm(norm(col("text")))).count()
    assert(n == 0, s"$n documents not at fixpoint after one pass")
  }

  test("cdc_apply: per-generation op semantics land in the final snapshot") {
    val out = SparkEntry.queries("cdc_apply")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("o_orderkey"),
        (BigDecimal(r.getAs[String]("price")), r.getAs[String]("last_op")))).toMap
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    def dec4(x: Double) = BigDecimal(math.floor(x * 10000 + 0.5) / 10000)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    orders.foreach { case (k, p) =>
      (k % 10, out.get(k)) match {
        case (3, v) => assert(v.isEmpty, s"key $k: update-then-delete must vanish")
        case (4, Some((price, op))) => // delete-then-reinsert at 2x
          assert(op == "I" && price == dec4(p * 2.0), s"key $k reinsert: $price")
        case (8, Some((price, op))) => // insert-then-update
          assert(op == "U" && price == dec4(p * 1.10), s"key $k upd-insert: $price")
        case (2, Some((price, op))) =>
          assert(op == "U" && price == dec4(p * 1.05), s"key $k update: $price")
        case (9, Some((_, op))) => assert(op == "I")
        case (m, Some((price, op))) if m <= 7 =>
          assert(op == "unchanged" && price == BigDecimal(p).setScale(4))
        case (m, v) => fail(s"key $k (m=$m): unexpected $v")
      }
    }
    assert(out.size == orders.count { case (k, _) => k % 10 != 3 })
  }

  test("evt_markov: transition matrix is row-stochastic and count-conserving") {
    val rows = SparkEntry.queries("evt_markov")(spark, sfDir).collect()
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val nTrans = events.count() -
      events.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == nTrans,
      "every consecutive pair contributes exactly one transition")
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (prev, grp) =>
      val psum = grp.map(r => BigDecimal(r.getAs[String]("p"))).sum
      // each of ≤5 cells dec4-rounded half-up: |Σp − 1| ≤ 5 · 5e-5
      assert((psum - 1).abs <= BigDecimal("0.00025"),
        s"row $prev: Σp = $psum")
    }
  }

  test("anomaly_mad: tallies are consistent and the threshold actually separates") {
    val rows = SparkEntry.queries("anomaly_mad")(spark, sfDir).collect()
    val o = graft.core.Tables.load(spark, sfDir, "orders")
    assert(rows.map(_.getAs[Long]("n")).sum == o.count())
    rows.foreach { r =>
      val (nOut, nLow, nHigh) = (r.getAs[Long]("n_out"),
        r.getAs[Long]("n_low"), r.getAs[Long]("n_high"))
      // strict > on |x−med| means no flagged row can sit AT the median,
      // so the low/high split partitions the outliers exactly
      assert(nOut == nLow + nHigh, s"${r.getAs[String]("prio")}: $nOut != $nLow+$nHigh")
      assert(nOut < r.getAs[Long]("n") / 4,
        "a robust gate must not flag a quarter of the data")
      val med = BigDecimal(r.getAs[String]("med"))
      val mad = BigDecimal(r.getAs[String]("mad"))
      assert(med > 0 && mad > 0)
    }
  }

  test("txt_langid_ngram: profile-bounded overlap, closed prediction domain") {
    val rows = SparkEntry.queries("txt_langid_ngram")(spark, sfDir).collect()
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    assert(rows.length == doc.count(), "one prediction per document")
    val langs = doc.select(col("lang")).distinct().collect()
      .map(_.getString(0)).toSet + "und"
    rows.foreach { r =>
      val ov = r.getAs[Long]("overlap")
      assert(ov >= 0 && ov <= 20, s"overlap $ov exceeds the 20-trigram profile")
      assert(langs.contains(r.getAs[String]("pred_lang")))
      assert((r.getAs[Int]("hit") == 1) ==
        (r.getAs[String]("pred_lang") == r.getAs[String]("lang")))
    }
  }

  test("jsn2_variant: typed extraction returns what was packed; missing path is NULL, not an error") {
    val out = SparkEntry.queries("jsn2_variant")(spark, sfDir)
    assert(out.filter(col("missing").isNotNull).count() == 0)
    val events = graft.core.Tables.load(spark, sfDir, "events")
    assert(out.filter(col("etype").isNull || col("arr1").isNull).count() == 0)
    // Array index extraction: arr[1] was packed as user_id * 2.
    val bad = out.join(events, Seq("event_id"))
      .filter(col("arr1") =!= col("user_id") * 2).count()
    assert(bad == 0, s"$bad rows where variant arr[1] != packed value")
  }

  test("inc_agg_del: signed-partial merge equals full recompute; both repair paths exercised") {
    val out = SparkEntry.queries("inc_agg_del")(spark, sfDir).collect()
    val o = graft.core.Tables.load(spark, sfDir, "orders")
    val newSnap = o.filter(!(col("o_orderkey") % 20 === 5 &&
      col("o_orderpriority").isin("1-URGENT", "2-HIGH")))
    val direct = newSnap.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val paths = out.map(_.getAs[String]("repair_path")).toSet
    assert(paths == Set("repair", "incremental"),
      s"both maintenance paths must be exercised, got $paths")
    out.foreach { r =>
      val prio = r.getAs[String]("prio")
      assert(r.getAs[Long]("n") == direct(prio)._1, s"$prio count")
      assert(BigDecimal(r.getAs[String]("max_price")) ==
        BigDecimal(direct(prio)._2).setScale(4), s"$prio max")
    }
  }

  test("forget_user: audit arithmetic matches direct scrub counts") {
    val rows = SparkEntry.queries("forget_user")(spark, sfDir)
      .collect().map(r => r.getAs[String]("table_name") -> r).toMap
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val or = graft.core.Tables.load(spark, sfDir, "orders")
    def check(name: String, df: org.apache.spark.sql.DataFrame, key: String): Unit = {
      val r = rows(name)
      assert(r.getAs[Long]("n_before") == df.count())
      assert(r.getAs[Long]("n_after") == df.filter(col(key) % 17 =!= 3).count())
      assert(r.getAs[Long]("n_removed") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_after"))
      assert(r.getAs[Long]("n_removed") > 0,
        s"$name: the deletion list must actually remove rows at this SF")
    }
    check("events", ev, "user_id")
    check("orders", or, "o_custkey")
  }

  test("dq_refs: a healthy warehouse audits clean, and injected orphans fire the audit") {
    val healthy = SparkEntry.queries("dq_refs")(spark, sfDir).collect()
    assert(healthy.length == 7)
    assert(healthy.forall(_.getAs[Long]("n_orphan") == 0L),
      "the synthetic warehouse has declared integrity — zero orphans expected")
    // Corrupt a copy: drop half the orders (odd keys) so lineitem rows
    // orphan on l_orderkey and the audit must FIRE on exactly that edge.
    val d = TestSpark.tempDir("refs_corrupt").toString
    // Only the 7 tables dq_refs actually probes — copying events/documents/
    // embeddings would be pure test I/O.
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
      "part").foreach { t =>
      val df = graft.core.Tables.load(spark, sfDir, t)
      val out = if (t == "orders") df.filter(col("o_orderkey") % 2 === 0) else df
      out.write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    val rows = SparkEntry.queries("dq_refs")(spark, d)
      .collect().map(r => r.getAs[String]("relationship") -> r.getAs[Long]("n_orphan")).toMap
    val li = graft.core.Tables.load(spark, d, "lineitem")
    val expect = li.filter(col("l_orderkey") % 2 =!= 0).count()
    assert(rows("lineitem.l_orderkey->orders") == expect && expect > 0,
      s"orphan count ${rows("lineitem.l_orderkey->orders")} != injected $expect")
    assert(rows("orders.o_custkey->customer") == 0,
      "uncorrupted edges must stay clean")
  }

  test("cooc_lift: support/lift arithmetic consistent and pair counts bounded by marginals") {
    val rows = SparkEntry.queries("cooc_lift")(spark, sfDir).collect()
    // 456 pairs clear the support threshold at this SF (DuckDB-verified),
    // so a correct run returns exactly the 30-row top-k — `<= 30` would
    // pass vacuously on an empty result.
    assert(rows.length == 30)
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    // N is the ENGINE'S corpus size: docs with >= 1 non-empty token (an
    // empty/whitespace-only doc drops out of dw), not raw doc.count().
    val n = doc.filter(length(trim(col("text"))) > 0).count().toDouble
    rows.foreach { r =>
      val (cab, ca, cb) = (r.getAs[Long]("cab"), r.getAs[Long]("ca"), r.getAs[Long]("cb"))
      assert(cab >= 20 && cab <= math.min(ca, cb),
        s"support must sit under both marginals: $r")
      val expect = math.floor(n * cab / (ca.toDouble * cb) * 10000 + 0.5) / 10000
      assert(BigDecimal(r.getAs[String]("lift")) ==
        BigDecimal(expect).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        s"lift mismatch on $r (expect $expect)")
    }
  }

  test("ddp_keeper_src: one keeper per cluster, elected by (source, doc_id), components unchanged") {
    val rows = SparkEntry.queries("ddp_keeper_src")(spark, sfDir).collect()
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    assert(rows.length == doc.count(), "one assignment row per document")
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      val keepers = members.filter(_.getAs[Boolean]("is_keeper"))
      assert(keepers.length == 1, s"cluster $cid: ${keepers.length} keepers")
      val k = keepers.head
      // The elected keeper carries the cluster-min (source, doc_id).
      val best = members.map(m =>
        (m.getAs[String]("source"), m.getAs[Long]("doc_id"))).min
      assert((k.getAs[String]("source"), k.getAs[Long]("doc_id")) == best,
        s"cluster $cid: keeper ${k} is not the (source, doc_id) minimum $best")
      assert(members.forall(_.getAs[Long]("keeper_doc") == k.getAs[Long]("doc_id")))
    }
    // The components must be DDP-CLUSTER's own — the policy changes the
    // keeper, never the clustering.
    val base = SparkEntry.queries("ddp_cluster")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    rows.foreach(r => assert(
      base(r.getAs[Long]("doc_id")) == r.getAs[Long]("cluster_id")))
  }

  test("split_leakage: combination counts partition the near-dup pair set; exact dups cannot straddle") {
    val rows = SparkEntry.queries("split_leakage")(spark, sfDir).collect()
    val allPairs = SparkEntry.queries("ddp_minhash")(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == allPairs,
      "every verified near-dup pair lands in exactly one split combination")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= 2 * r.getAs[Long]("n_pairs"))
      assert(r.getAs[String]("split_a") <= r.getAs[String]("split_b"), "canonical order")
    }
    // The content-hash split co-locates BYTE-IDENTICAL duplicates by
    // construction: no straddling pair may have identical text.
    val doc = graft.core.Tables.load(spark, sfDir, "documents")
    val bucket = graft.functions.GraftFunctions.poly_hash(col("text")) % lit(100L)
    val split_ = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    val s = doc.select(col("doc_id"), col("text"), split_.as("split"))
    val straddlingIdentical = SparkEntry.queries("ddp_minhash")(spark, sfDir)
      .join(s.select(col("doc_id").as("d1"), col("text").as("t1"), col("split").as("s1")), Seq("d1"))
      .join(s.select(col("doc_id").as("d2"), col("text").as("t2"), col("split").as("s2")), Seq("d2"))
      .filter(col("s1") =!= col("s2") && col("t1") === col("t2")).count()
    assert(straddlingIdentical == 0,
      "byte-identical duplicates must co-split under the content-hash rule")
  }

  test("ddp_eval: hits are exactly the verified pair set; metrics bounded") {
    val r = SparkEntry.queries("ddp_eval")(spark, sfDir).collect().head
    val (nTrue, nCand, nHit) = (r.getAs[Long]("n_true"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"))
    assert(nHit <= math.min(nTrue, nCand))
    assert(BigDecimal(r.getAs[String]("recall")) <= 1 &&
      BigDecimal(r.getAs[String]("precision")) <= 1)
    // verified = candidates ∩ truth by definition, and per-doc sketches
    // don't depend on the rest of the corpus — so the audit's sampled
    // hits must be exactly the shipped ddp_minhash pairs with BOTH
    // endpoints inside the 1/3 sample.
    val verifiedInSample = SparkEntry.queries("ddp_minhash")(spark, sfDir)
      .filter(col("d1") % 3 === 0 && col("d2") % 3 === 0).count()
    assert(verifiedInSample == nHit,
      s"verify-stage pairs in sample ($verifiedInSample) != audited hits ($nHit)")
  }

  test("ivf_eval: hits recount from the shipped sim1/sim1_ivf results; recall law holds") {
    val rows = SparkEntry.queries("ivf_eval")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), BigDecimal(r.getString(2))))
    assert(rows.length == 10 && rows.map(_._1).toSet == (0L until 10L).toSet)
    rows.foreach { case (q, h, rec) =>
      assert(h >= 0 && h <= 3, s"query $q n_hit $h")
      assert((rec - BigDecimal(h) / 3).abs < BigDecimal("0.0001"))
    }
    // the audit must agree with the two SHIPPED queries it grades:
    // truth = sim1's top-3 (its rn <= 3 rows), cand = sim1_ivf's pairs
    val truth = SparkEntry.queries("sim1")(spark, sfDir)
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val cand = SparkEntry.queries("sim1_ivf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recounted = truth.intersect(cand).groupBy(_._1).view.mapValues(_.size).toMap
    rows.foreach { case (q, h, _) =>
      assert(recounted.getOrElse(q, 0) == h, s"query $q: audit $h vs recount ${recounted.getOrElse(q, 0)}")
    }
  }

  test("vec_pq: 8 nibble codes per vector, errors nonneg and beating the zero-codebook") {
    val rows = SparkEntry.queries("vec_pq")(spark, sfDir).collect()
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    assert(rows.length == emb.count(), "one code row per vector")
    rows.foreach { r =>
      val parts = r.getAs[String]("code").split("-")
      assert(parts.length == 8, s"code must have 8 subspace entries: ${r.getAs[String]("code")}")
      assert(parts.forall(p => p.toInt >= 0 && p.toInt <= 15), "nibble range")
      val errSq = BigDecimal(r.getAs[String]("err_sq"))
      val errRel = BigDecimal(r.getAs[String]("err_rel"))
      assert(errSq >= 0 && errRel >= 0)
      // A codebook whose centroids are per-cell means must beat quantizing
      // everything to zero: relative reconstruction error strictly < 1.
      assert(errRel < 1, s"vec ${r.getAs[Long]("vec_id")}: err_rel=$errRel")
    }
    // Corpus-level sanity: mean-centroid codebooks on clustered data
    // should reconstruct most of the mass.
    val meanRel = rows.map(r => BigDecimal(r.getAs[String]("err_rel"))).sum / rows.length
    assert(meanRel < BigDecimal("0.9"), s"mean relative error $meanRel")
  }

  test("graph_pagerank: fixed-point mass conservation and floor bounds") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, sfDir).collect()
    assert(rows.length == 25, "one rank row per nation")
    val total = rows.map(_.getAs[Long]("rank_units")).sum
    // Base (teleport) mass alone is 25 · 6e9 = 0.15e12; full mass is 1e12.
    // Floor truncation and dangling nodes only ever LOSE mass.
    assert(total <= 1000000000000L, s"mass created: $total")
    assert(total >= 150000000000L, s"even the teleport floor lost: $total")
    assert(rows.forall(_.getAs[Long]("rank_units") >= 6000000000L),
      "every node keeps at least the teleport term")
  }

  test("txt_zipf: exact power-law corpus recovers slope -2 with r2 = 1") {
    // Crafted frequencies f_i = 3600 / i^2 for i = 1..6 (3600, 900, 400,
    // 225, 144, 100 — all exact integers), so ln(freq) is EXACTLY linear
    // in ln(rank): OLS must return slope -2, r2 1, intercept ln(3600).
    // Distinct frequencies make the rank order unambiguous (no ties).
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("zipf_corpus").toString
    val freqs = Seq(3600, 900, 400, 225, 144, 100)
    val text = freqs.zipWithIndex
      .flatMap { case (f, i) => Seq.fill(f)(s"w$i") }.mkString(" ")
    Seq((1L, text, "en", "t", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = SparkEntry.queries("txt_zipf")(spark, d).collect().head
    assert(r.getAs[Long]("vocab") == 6L)
    assert(r.getAs[Long]("total") == freqs.sum.toLong)
    assert(r.getAs[Long]("k") == 6L, "top-k covers the whole 6-word vocab")
    assert(r.getAs[String]("slope") == "-2.0000")
    assert(r.getAs[String]("r2") == "1.0000")
    // intercept = ln(3600) = 8.18868... -> dec4 8.1887
    assert(r.getAs[String]("intercept") == "8.1887")
  }

  test("txt_zipf on the corpus: sane fit domain and top-k cap") {
    val r = SparkEntry.queries("txt_zipf")(spark, sfDir).collect().head
    assert(r.getAs[Long]("k") <= 500L)
    assert(r.getAs[Long]("k") <= r.getAs[Long]("vocab"))
    assert(r.getAs[Long]("total") >= r.getAs[Long]("vocab"))
    assert(r.getAs[String]("slope").toDouble < 0.0,
      "frequency must decrease in rank")
    val r2 = r.getAs[String]("r2").toDouble
    assert(r2 >= 0.0 && r2 <= 1.0001)
  }
}
