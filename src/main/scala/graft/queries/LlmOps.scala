package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.DecimalType
import graft.functions.GraftFunctions.{bloom_might_contain, dot_product, poly_hash}

/** LLM-training-data pipeline operators (SURVEY.md §2.4 + north star):
  * deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), near-dup cluster assignment, similarity search
  * (brute-force + LSH / multi-table LSH / IVF ANN), deterministic
  * splitting & sampling, benchmark decontamination, text analysis
  * (lang-id heuristic, quality scores, token counts, fingerprints), and
  * multimodal column carry.
  *
  * 100 TB design notes:
  *  - every near-dup query is BLOCKED (lang, length band, LSH band, or sign
  *    bucket) so the self-join is never O(n²) on the full corpus; the
  *    blocking predicate is part of the declared semantics so the oracle
  *    agrees exactly.
  *  - MinHash/SimHash signatures are plain aggregates over an exploded
  *    shingle/token relation: partial aggregation (map-side combine) keeps
  *    the shuffle proportional to |docs|, not |postings|. The MinHash
  *    family sketches word-bigram SHINGLES (see [[shingles]]) — unigram
  *    sketches degenerate on template-heavy / small-vocabulary corpora.
  *  - the content hash is a portable 31-polynomial mod 2^31-1, spelled
  *    identically in the codegen'd Spark Expression and DuckDB lambdas, so
  *    sketches are bit-identical across engines (SURVEY §5.3 determinism).
  */
object LlmOps {
  type Q = (SparkSession, String) => DataFrame

  // Shared with the MinHashSketch UDAF so query and aggregate can't drift.
  private val P = graft.functions.MinHashSeeds.P
  private val As = graft.functions.MinHashSeeds.As
  private val Bs = graft.functions.MinHashSeeds.Bs

  /** Portable polynomial string hash: fold chars as (acc*31 + code) mod P.
    * Codegen'd custom Expression ([[graft.functions.PolyHash]]); identical
    * to the HOF `aggregate(split(s,""), 0L, (acc,c) -> (acc*31+ascii(c))%P)`
    * and to the DuckDB list_reduce twin (asserted in ExpressionSpec). */
  private def polyHash(s: Column): Column = poly_hash(s)

  /** Distinct whitespace tokens of a text column. */
  private def toks(text: Column): Column = array_distinct(split(text, " "))

  /** Positional word-bigram array over a words array, O(n) per row:
    * zip_with over two slices, so `ws` is evaluated a CONSTANT number of
    * times per row. The previous spelling —
    * `transform(sequence(1, size(ws)-1), i => concat_ws(" ",
    * element_at(ws, i), element_at(ws, i+1)))` — re-evaluated the
    * captured `ws` subtree PER ELEMENT (higher-order functions are
    * CodegenFallback; ddp_cdc's documented trap), which turned every
    * bigram build over an inline `split(text)` into O(len²) re-splits
    * per doc — invisible on this corpus's ~40-word docs, catastrophic on
    * real 1000+-word documents at 100 TB. Callers keep their
    * `when(size(ws) >= 2, …)` guard so the slices only evaluate with
    * n ≥ 2 (start 2 ≤ n, length n−1 ≥ 1). Emits identical values in
    * identical order to the old spelling — every consumer's oracle hash
    * is unchanged. */
  private[graft] def bigramArr(ws: Column): Column =
    zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat_ws(" ", a, b))

  /** Hashed-ngram feature stream shared by the generative (SEL-1
    * `dsir_select`) and discriminative (CLS-1 `quality_lr`) data
    * selectors — ONE feature space so the two scoring rules are
    * comparable: every unigram + word-bigram OCCURRENCE (counts, not
    * distinct — the bag model), hashed into 256 buckets by the md5 first
    * byte. Returns one row per occurrence: (doc_id, lang, b).
    *
    * Modeling quirk, DELIBERATE and pinned (ADVICE r11): empty tokens
    * are filtered from the UNIGRAM stream but bigrams form over the
    * unfiltered words array, so consecutive spaces yield bigrams with an
    * empty side ("a " / " b"). Both engines share this exact feature
    * space (the oracle's list_transform mirrors it) and the dsir_select
    * n_feat census test pins it — "fixing" one side alone would silently
    * shift every downstream selector/classifier score. */
  private[graft] def hashedGramBuckets(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val unis = filter(words, w => w =!= "")
    val bigs = when(size(words) >= 2, bigramArr(words))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), col("lang"),
        explode(concat(unis, bigs)).as("g"))
      .withColumn("b", conv(substring(md5(col("g")), 1, 2), 16, 10)
        .cast("long"))
  }

  /** The CORPUS gram-bucket relation, memoized per (process, corpus dir)
    * via Warehouse.once (r12 verdict task 5): `dsir_select`, `quality_lr`,
    * `lr_eval`, `lr_calibration` and `lr_temp` all start from the same
    * [[hashedGramBuckets]] explode over the same documents table — the
    * dominant scan of the whole LR family (fresh-JVM ×100 probe: 58-98 s
    * EACH). One parquet write, every later selector reads the pinned
    * relation — which is also the production shape: feature extraction
    * runs once and the selectors share its output. Pure caching: the
    * rows are identical to the inline explode, so every consumer's
    * oracle hash is unchanged (the DuckDB twins already share one `feat`
    * CTE). Consumers read a SUBSET of columns, so the parquet-backed
    * copy also column-prunes where the in-flight explode could not. */
  private[graft] def gramBucketsOnce(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Warehouse.once(d, "gram_buckets") { out =>
      hashedGramBuckets(load(s, d, "documents"))
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  /** SEL-1 core: per-doc DSIR importance log-weight — see the
    * `dsir_select` query doc for the derivation; shared by the gated
    * selection query and the `lr_eval` discrimination audit. Returns
    * (doc_id, lang, n_feat, w DECIMAL(38,8)). */
  private def dsirWeights(s: SparkSession, d: String): DataFrame =
    dsirWeightsFrom(gramBucketsOnce(s, d))

  /** [[dsirWeights]] over a caller-supplied (already pinned) gram-bucket
    * stream — so `lr_eval` runs the dominant explode ONCE for both
    * selectors (its oracle already shares one `feat` CTE). */
  private def dsirWeightsFrom(feat: DataFrame): DataFrame = {
    val B = 256
    val perBucket = feat.groupBy(col("b")).agg(
      count(lit(1)).as("cs"),
      sum((col("lang") === "en").cast("long")).as("ct"))
    val tot = perBucket.agg(
      sum(col("cs")).as("stot"), sum(col("ct")).as("ttot"))
    // Each factor casts to double BEFORE the multiply (ADVICE r11): at
    // 100 TB gram-occurrence totals (~1e12+) the int64 product
    // (ct+1)·(stot+B) would overflow outright, while double·double never
    // does. Engine-identical at any scale the oracle gates (factors
    // < 2²⁶ there, so the double products are exact and equal the old
    // int64 path bit-for-bit); at extreme scale the products are
    // correctly-rounded doubles in BOTH engines — same discipline, no
    // overflow cliff.
    val ratio = perBucket.crossJoin(broadcast(tot))
      .select(col("b"), dec8(log(
        ((col("ct") + 1).cast("double") * (col("stot") + B).cast("double")) /
          ((col("cs") + 1).cast("double") * (col("ttot") + B).cast("double"))))
        .cast(DecimalType(28, 8)).as("lr"))
    val perDoc = feat.groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("n"))
    perDoc.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("n")).as("n_feat"),
        sum(col("n").cast(DecimalType(9, 0)) * col("lr"))
          .cast(DecimalType(38, 8)).as("w"))
  }

  /** CLS-1 feature relation: per (doc, bucket) the tf weight
    * x = n/Σn over [[hashedGramBuckets]], plus the weak label
    * y = (lang = 'en'). Per-doc quantities only — computable on any
    * SLICE of the corpus identically to the whole (the property the
    * streamed scorer STR-CLS relies on). */
  private[graft] def lrFeatures(docs: DataFrame): DataFrame =
    lrFeaturesFrom(hashedGramBuckets(docs))

  /** [[lrFeatures]] over a caller-supplied gram-bucket stream. */
  private[graft] def lrFeaturesFrom(feat: DataFrame): DataFrame =
    feat
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(
        Window.partitionBy(col("doc_id"))))
      .select(col("doc_id"), col("lang"),
        (col("lang") === "en").cast("double").as("y"), col("b"),
        (col("n").cast("double") / col("tot").cast("double")).as("x"))

  /** CLS-1 trained model: the standardization stats, the 256 bucket
    * weights after 5 gradient rounds, the bias, and the training-corpus
    * feature relation (so the gated apply reuses one feature pass). All
    * broadcast-sized — the publishable index-metadata of the classifier
    * (Snapshot-publish these three relations to serve the model, exactly
    * like the IVF centroids/codebook). */
  private[graft] case class LrModel(pd: DataFrame, stats: DataFrame,
      wt: DataFrame, w0: DataFrame)

  /** CLS-1 scorer shared VERBATIM by the gated batch apply and the
    * streamed scorer ([[graft.streaming.StreamOps.runScoredIngest]]):
    * z_d = w0 − Σ_b w_b·μ_b/σ_b + Σ_present w_b·x_db/σ_b with the same
    * dec8-quantized decimal folds — one implementation, so batch and
    * streamed scores cannot drift. */
  private[graft] def lrScore(pd: DataFrame, m: LrModel,
      spine: Option[DataFrame] = None): DataFrame = {
    val kk = m.wt.join(m.stats, Seq("b"))
      .agg(sum(dec8(col("w") * col("mu") / col("sd"))).cast(dt8).as("kk"))
    val zs = pd.join(broadcast(m.wt.join(m.stats.select(col("b"), col("sd")),
        Seq("b"))), Seq("b"))
      .groupBy(col("doc_id"), col("lang"), col("y"))
      .agg(sum(dec8(col("w") * col("x") / col("sd"))).cast(dt8).as("zs"))
    // Serving-time spine (review fix): a doc whose buckets are ALL absent
    // from the published model — possible when the model trained on a
    // different corpus — must still be scored, at its standardized-zero
    // logit z = w0 − K, not silently dropped by the feature⋈weight inner
    // join. The training/gated path passes no spine: there every bucket
    // of every doc is in the model by construction, so the join is total.
    val based = spine.map(sp => sp.join(zs, Seq("doc_id", "lang", "y"), "left")
        .withColumn("zs", coalesce(col("zs"), lit(0).cast(dt8))))
      .getOrElse(zs)
    based.crossJoin(broadcast(m.w0)).crossJoin(broadcast(kk))
      .withColumn("z",
        col("w0") - col("kk").cast("double") + col("zs").cast("double"))
  }

  /** CLS-1 trainer: 5 full-batch gradient rounds (η = 2, w₀ = 0) of the
    * sparse relational GD — see the `quality_lr` query doc for the
    * standardization-folded-into-constants derivation and the decimal
    * discipline. */
  // Deliberately UNSPREAD (A/B r12): post-§4.4.11 the gram explode is
  // O(n) and cheap enough that a width-restoring repartition before it
  // COSTS more than the serial explode saves (dsir_select 2.49 s
  // unspread vs 4.89 s spread at sf0.1, 1.1 vs 5.1 at sf0.01 — the
  // exchange + 64-way task fan on a tiny table is pure overhead). A
  // real multi-file corpus parallelizes the scan from its input splits
  // (ProbeGen now writes probe corpora that way).
  /** The corpus-trained model, memoized per (process, corpus): the three
    * broadcast-sized relations (stats/weights/bias) are EXACTLY what the
    * lifecycle test Snapshot-publishes, so one 5-round GD + shared reads
    * is pure caching (decimal/double relations round-trip parquet
    * bit-exactly) — `quality_lr`, `lr_eval`, `lr_calibration` and
    * `lr_temp` each re-ran the full training term before. The feature
    * relation `pd` is rebuilt per call from the memoized gram relation
    * (one groupBy — the apply-side pass, not the training term). */
  private[graft] def lrTrain(s: SparkSession, d: String): LrModel = {
    val dir = graft.core.Warehouse.once(d, "lr_model") { out =>
      val m = lrTrainFrom(s, gramBucketsOnce(s, d))
      m.stats.write.mode("overwrite").parquet(s"$out/stats")
      m.wt.write.mode("overwrite").parquet(s"$out/wt")
      m.w0.write.mode("overwrite").parquet(s"$out/w0")
    }
    LrModel(lrFeaturesFrom(gramBucketsOnce(s, d)),
      s.read.parquet(s"$dir/stats"), s.read.parquet(s"$dir/wt"),
      s.read.parquet(s"$dir/w0"))
  }

  /** [[lrTrain]] over a caller-supplied gram-bucket stream. */
  private[graft] def lrTrainFrom(s: SparkSession, feat: DataFrame): LrModel = {
    val pd = lrFeaturesFrom(feat)
      .pinned // read by the stats pass and every training round
    val nrow = pd.agg(countDistinct(col("doc_id")).cast("double").as("nd"))
    // Per-bucket standardization stats over ALL docs (absent ⇒ x = 0,
    // so present-only sums over N docs are the full-population moments).
    val stats = pd.groupBy(col("b")).agg(
        sum(dec8(col("x"))).cast(dt8).as("sx"),
        sum(dec8(col("x") * col("x"))).cast(dt8).as("sxx"))
      .crossJoin(broadcast(nrow))
      .withColumn("mu", col("sx").cast("double") / col("nd"))
      .withColumn("vr",
        col("sxx").cast("double") / col("nd") - col("mu") * col("mu"))
      .select(col("b"), col("mu"),
        when(col("vr") <= lit(0.0), lit(1.0))
          .otherwise(sqrt(col("vr"))).as("sd"))
      .pinned
    var wt = stats.select(col("b"), lit(0.0).as("w")).pinned
    var w0 = s.range(1).select(lit(0.0).as("w0"))
    (1 to 5).foreach { _ =>
      val zd = lrScore(pd, LrModel(pd, stats, wt, w0))
        .withColumn("p",
          dec8(lit(1.0) / (lit(1.0) + exp(-col("z")))).cast("double"))
        .select(col("doc_id"), col("y"), col("p"))
        .pinned // read by the residual total and the gradient pass
      val rq = zd.agg(sum(dec8(col("y") - col("p"))).cast(dt8).as("rr"))
      val gb = pd.join(broadcast(zd.select(col("doc_id"), col("p"))),
          Seq("doc_id"))
        .groupBy(col("b"))
        .agg(sum(dec8((col("y") - col("p")) * col("x"))).cast(dt8).as("sb"))
      wt = wt.join(stats, Seq("b")).join(gb, Seq("b"))
        .crossJoin(broadcast(rq)).crossJoin(broadcast(nrow))
        .select(col("b"), dec8(col("w") + lit(2.0) *
            ((col("sb").cast("double") / col("sd") -
              col("mu") / col("sd") * col("rr").cast("double")) / col("nd")))
          .cast("double").as("w"))
        .pinned // lineage truncation per round (ddp_cluster's rule)
      w0 = w0.crossJoin(broadcast(rq)).crossJoin(broadcast(nrow))
        .select(dec8(col("w0") +
            lit(2.0) * (col("rr").cast("double") / col("nd")))
          .cast("double").as("w0"))
        .pinned
    }
    LrModel(pd, stats, wt, w0)
  }

  /** EVAL-CLS3's temperature FIT, factored out of the gated `lr_temp`
    * query so the serving spine can consume it (r12 verdict task 6):
    * 5 Newton rounds minimizing held-slice NLL of σ(u·z) in u = 1/T —
    * each round ONE map-side-combined aggregate over the held slice
    * (doc_id % 5 == 3), dec8 discipline throughout (see the `lr_temp`
    * query doc for the convexity/derivative derivation). Returns the
    * 1-row (u) relation — broadcast-sized model metadata, published
    * beside the three LrModel relations exactly like the IVF
    * centroids/codebook, and applied by BOTH the gated query and
    * [[graft.streaming.StreamOps.runScoredIngest]]'s calibrated column
    * (one fit, so batch and streamed calibration cannot drift). */
  private[graft] def lrTemperatureU(s: SparkSession, m: LrModel): DataFrame =
    lrTempFitU(s, lrHeldSlice(m))

  /** The deterministic 20% held slice the temperature fits and is read
    * on (doc_id % 5 == 3), scored under the published model. */
  private[graft] def lrHeldSlice(m: LrModel): DataFrame =
    lrScore(m.pd, m)
      .filter(pmod(col("doc_id"), lit(5)) === lit(3))
      .select(col("z"), col("y").cast("double").as("y"))
      .pinned // read by all 5 Newton rounds (and lr_temp's two blocks)

  /** The Newton loop itself over an already-pinned held slice. */
  private[graft] def lrTempFitU(s: SparkSession, held: DataFrame): DataFrame = {
    var u: DataFrame = s.range(1).select(lit(1.0).as("u"))
    (1 to 5).foreach { _ =>
      val gh = held.crossJoin(broadcast(u))
        .select(col("y"), col("z"),
          dec8(lit(1.0) / (lit(1.0) + exp(-col("u") * col("z"))))
            .cast("double").as("p"))
        .agg(
          sum(dec8((col("p") - col("y")) * col("z"))).cast(dt8).as("g"),
          sum(dec8(col("p") * (lit(1.0) - col("p")) * col("z") * col("z")))
            .cast(dt8).as("h"))
      u = u.crossJoin(broadcast(gh))
        .select(dec8(col("u") -
            col("g").cast("double") / col("h").cast("double"))
          .cast("double").as("u"))
        .pinned // per-round lineage truncation (lrTrain's rule)
    }
    u
  }

  /** The 10-bin reliability block shared by `lr_calibration` and
    * `lr_temp`: over (score DOUBLE ∈ [0,1], pos LONG ∈ {0,1}) rows,
    * per-bin count / positives / mean dec4 confidence / accuracy, every
    * bin kept on a 0..9 spine, plus the ECE scalar attached to every
    * row. All cross-row sums are exact decimal folds (calibration_bins'
    * design — see the `lr_calibration` query doc). */
  private def reliabilityTable(s: SparkSession, scored: DataFrame): DataFrame = {
    val dt4 = DecimalType(38, 4)
    val binned = scored.withColumn("bin",
      least(floor(col("score") * lit(10.0)).cast("int"), lit(9)))
    val agg = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
      sum(dec4(col("score"))).cast(dt4).as("ssc"))
    val withRates = agg
      .withColumn("conf", col("ssc").cast("double") / col("n").cast("double"))
      .withColumn("acc", col("n_pos").cast("double") / col("n").cast("double"))
    val tot = withRates.agg(
      sum(col("n")).as("nn"),
      sum((dec4(abs(col("acc") - col("conf"))) * col("n")).cast(dt4))
        .cast(dt4).as("we"))
    val ece = tot.select(
      dec4S(col("we").cast("double") / col("nn").cast("double")).as("ece"))
    val spine = s.range(0, 10).select(col("id").cast("int").as("bin"))
    spine.join(withRates, Seq("bin"), "left")
      .crossJoin(broadcast(ece))
      .select(col("bin"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        dec4S(col("conf")).as("conf"),
        dec4S(col("acc")).as("acc"),
        col("ece"))
  }

  /** Distinct word-bigram shingles of a text column (same gram expression
    * as ddp_ngram). Sketch queries use SHINGLES, not unigrams: the corpus
    * vocabulary is ~31 words with document frequencies up to 78%, so every
    * doc's unigram min-hash lands on the same handful of common words and
    * LSH banding degenerates into corpus-sized buckets (measured: one
    * band bucket held 46% of sf0.1, 4.5M candidate pairs for 191k
    * survivors). Bigram shingles carry word order, the shingle vocabulary
    * is ~30× larger with low df, and the same banding yields candidates ≈
    * true near-dups (342 candidates / 220 pairs at sf0.1) — the standard
    * shingling prescription for template-heavy corpora. */
  private def shingles(text: Column): Column =
    // Codegen'd one-pass distinct word bigrams (r14 optimization round) —
    // bit-identical to the previous HOF spelling
    //   array_distinct(when(size(ws) >= 2, bigramArr(ws)).otherwise([]))
    // including the single-word/empty-doc guard (the Expression returns
    // [] below 2 words — what DuckDB's exclusive-end range(1, 1) yields
    // natively) and array_distinct's first-occurrence order; the null
    // guard reproduces the old `when`'s null→[] fall-through. Parity is
    // pinned per-document against the HOF formulation in ExpressionSpec.
    when(text.isNull, array().cast("array<string>"))
      .otherwise(graft.functions.GraftFunctions.word_bigrams(text))

  /** BPE-1/TOK-2 shared trainer: the 6 merge rounds over the |-encoded
    * word-frequency table (see the `bpe_train` scaladoc for the encoding
    * argument). Returns the 6 PINNED 1-row argmax relations
    * (pair, lft, rgt, n) in merge-priority order; each round's vocab
    * rewrite is also pinned (iterative-loop lineage discipline). */
  private[graft] def bpeMerges(doc: DataFrame, k: Int = 6): Seq[DataFrame] = {
    var vocab = pin(doc.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        regexp_replace(col("w"), "(.)", "|$1|").as("enc")))
    (1 to k).map { _ =>
      val pairs = vocab
        .select(col("cnt"), split(trim(col("enc"), "|"), "\\|\\|").as("a"))
        .select(col("cnt"), col("a"), posexplode(col("a")).as(Seq("i", "lft")))
        .withColumn("rgt", try_element_at(col("a"), col("i") + 2))
        .filter(col("rgt").isNotNull)
        .select(col("cnt"), col("lft"), col("rgt"),
          concat(lit("|"), col("lft"), lit("||"), col("rgt"), lit("|")).as("pair"))
      val best = pin(pairs.groupBy(col("pair"), col("lft"), col("rgt"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pair").asc).limit(1))
      vocab = pin(vocab.crossJoin(broadcast(best.select(col("pair"))))
        .select(col("cnt"), call_function("replace", col("enc"), col("pair"),
          call_function("replace", col("pair"), lit("||"), lit(""))).as("enc")))
      best
    }
  }

  /** BPE-1's BATCHED trainer (r12 verdict task 3 — the declared at-scale
    * switch): per round, ONE corpus pair-count pass admits a PRIORITY
    * PREFIX of mutually symbol-disjoint merges and applies them all in
    * one vocab rewrite, so corpus passes scale with merge BATCHES, not
    * merges — at a real 10⁵-merge vocabulary this is the difference
    * between 10⁵ and ~10⁴ corpus scans (the standard parallel-BPE
    * batching; the merge table itself is metadata either way).
    *
    * EQUIVALENCE GUARD (the law PipelineOpsSpec pins): the admitted batch
    * must reproduce the sequential trainer's merge table EXACTLY, which
    * holds under two conditions, both enforced conservatively:
    *   1. admitted merges are the CONSECUTIVE top of the (n DESC, pair
    *      ASC) candidate order and pairwise symbol-disjoint — applying
    *      earlier admitted merges then cannot change a later one's count
    *      (its symbols appear in none of their patterns or outputs);
    *   2. every admitted merge after the first counts STRICTLY more than
    *      the first candidate that TOUCHES an admitted symbol (or the
    *      collection cut line, whichever binds): a touched pair can
    *      shrink or morph into new pairs under the applied merges, but
    *      never above its own old count — so nothing it becomes can
    *      outrank (or tie, where the lexicographic tie-break could flip)
    *      a strictly-greater admitted merge. A round that can admit
    *      nothing beyond the argmax degrades to the sequential step.
    * The driver-side walk reads a BOUNDED top slice (≤ max(64, 16·cap)
    * rows — merge-table metadata, never data-bounded; the cut line is
    * treated as a touched candidate so the uncollected tail is
    * accounted). Returns (merge table in priority order, corpus-pass
    * rounds). */
  private[graft] def bpeMergesBatched(doc: DataFrame, k: Int = 6,
      batchCap: Int = 8): (Seq[(String, String, String, Long)], Int) = {
    require(k > 0 && batchCap > 0,
      s"bpeMergesBatched needs positive budgets (k=$k, batchCap=$batchCap)")
    var vocab = pin(doc.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        regexp_replace(col("w"), "(.)", "|$1|").as("enc")))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, String, Long)]()
    var rounds = 0
    var dry = false
    while (merges.size < k && !dry) {
      rounds += 1
      val lim = math.max(64, 16 * batchCap)
      val top = vocab
        .select(col("cnt"), split(trim(col("enc"), "|"), "\\|\\|").as("a"))
        .select(col("cnt"), col("a"), posexplode(col("a")).as(Seq("i", "lft")))
        .withColumn("rgt", try_element_at(col("a"), col("i") + 2))
        .filter(col("rgt").isNotNull)
        .select(col("cnt"), col("lft"), col("rgt"),
          concat(lit("|"), col("lft"), lit("||"), col("rgt"), lit("|")).as("pair"))
        .groupBy(col("pair"), col("lft"), col("rgt"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pair").asc).limit(lim)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      if (top.isEmpty) dry = true
      else {
        val admitted = scala.collection.mutable.ArrayBuffer[(String, String, String, Long)]()
        val symbols = scala.collection.mutable.Set[String]()
        // The count of the first candidate whose symbols touch an admitted
        // merge — the bound every admitted-after-the-first must strictly
        // beat. If the walk exhausts the collected slice untouched, the
        // cut line binds instead (uncollected candidates count <= last
        // collected); a fully-drained table binds nothing.
        var touchBound = Long.MinValue
        val want = math.min(batchCap, k - merges.size)
        var i = 0
        var stopped = false
        while (i < top.length && !stopped) {
          val c = top(i)
          if (symbols(c._2) || symbols(c._3)) {
            // First touched candidate: the max count anything an admitted
            // merge can change/create is bounded by. Binds even when the
            // cap was already reached — the scan continues past the cap
            // precisely to find this bound.
            touchBound = c._4; stopped = true
          } else if (admitted.size < want) {
            admitted += c
            symbols += c._2; symbols += c._3
            symbols += c._1.replace("||", "").stripPrefix("|").stripSuffix("|")
          } // else: untouched candidate past the cap — skip, keep scanning
          i += 1
        }
        if (!stopped && top.length == lim)
          touchBound = top.last._4
        val kept = admitted.head +:
          admitted.tail.takeWhile(_._4 > touchBound).toSeq
        merges ++= kept
        val newEnc = kept.foldLeft(col("enc")) { (e, m) =>
          call_function("replace", e, lit(m._1), lit(m._1.replace("||", "")))
        }
        vocab = pin(vocab.select(col("cnt"), newEnc.as("enc")))
      }
    }
    (merges.toSeq, rounds)
  }

  /** The CDC chunk-extraction pass shared by `ddp_cdc` and `ddp_cdc_gear`
    * (review r13 — the census semantics must have ONE definition): from
    * (doc_id, lang, text, cuts sorted int positions incl. 0 and n) to one
    * (doc_id, lang, cl, ch) row per chunk. */
  private def cdcChunkRows(withCuts: DataFrame): DataFrame =
    withCuts.select(col("doc_id"), col("lang"), explode(transform(
        sequence(lit(1), size(col("cuts")) - 1), k =>
          col("text").substr(element_at(col("cuts"), k) + 1,
            element_at(col("cuts"), k + 1) - element_at(col("cuts"), k))))
        .as("ck"))
      .select(col("doc_id"), col("lang"), length(col("ck")).as("cl"),
        md5(col("ck")).as("ch"))

  /** The CDC census/per-doc rollup tail shared by `ddp_cdc` and
    * `ddp_cdc_gear`: instance census over chunk hashes + the per-doc
    * chunk/char/dup accounting and dec4 dup ratio. `chunks` should be
    * pinned by the caller (read by the census and the rollup). */
  private def cdcCensus(chunks: DataFrame): DataFrame = {
    val census = chunks.groupBy(col("ch")).agg(count(lit(1)).as("cnt"))
    chunks.join(census, Seq("ch"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("cl").cast("long")).as("chunked_chars"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("cnt") >= 2, col("cl").cast("long")).otherwise(0L))
          .as("dup_chars"))
      .select(col("doc_id"), col("lang"), col("n_chunks"),
        col("chunked_chars"), col("n_dup_chunks"), col("dup_chars"),
        dec4S(col("dup_chars").cast("double") /
          col("chunked_chars").cast("double")).as("dup_ratio"))
  }

  /** The DuckDB spelling of [[cdcChunkRows]] + [[cdcCensus]] — the shared
    * oracle tail from the `ck` CTE through the final ORDER BY; callers
    * prepend their `cs`/boundary CTEs ending in `bnd(doc_id, lang, text,
    * n, bp)`. */
  private lazy val duckCdcTail: String =
    """ck AS (
      |  SELECT doc_id, lang, len(c) AS cl, md5(c) AS ch FROM (
      |    SELECT doc_id, lang, unnest(list_transform(range(1, len(cuts)), k ->
      |      substr(text, CAST(cuts[k] + 1 AS INT), CAST(cuts[k + 1] - cuts[k] AS INT)))) AS c
      |    FROM (SELECT doc_id, lang, text,
      |      list_concat(list_concat([CAST(0 AS BIGINT)], bp), [CAST(n AS BIGINT)]) AS cuts FROM bnd))
      |), census AS (
      |  SELECT ch, COUNT(1) AS cnt FROM ck GROUP BY ch
      |)
      |SELECT ck.doc_id, ck.lang,
      |  COUNT(1) AS n_chunks,
      |  CAST(SUM(ck.cl) AS BIGINT) AS chunked_chars,
      |  CAST(SUM(CASE WHEN census.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
      |  CAST(SUM(CASE WHEN census.cnt >= 2 THEN ck.cl ELSE 0 END) AS BIGINT) AS dup_chars,
      |  CAST(CAST(floor((CAST(SUM(CASE WHEN census.cnt >= 2 THEN ck.cl ELSE 0 END) AS DOUBLE) /
      |    CAST(SUM(ck.cl) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS dup_ratio
      |FROM ck JOIN census ON ck.ch = census.ch
      |GROUP BY ck.doc_id, ck.lang
      |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, n_chunks NULLS FIRST, chunked_chars NULLS FIRST, n_dup_chunks NULLS FIRST, dup_chars NULLS FIRST, dup_ratio NULLS FIRST""".stripMargin

  /** Spread a narrow-scan table across cores before an expensive per-row
    * projection. The documents table is one parquet split at test scale,
    * so shingling/hashing otherwise runs at scan parallelism = 1; the
    * explicit partition count (2× defaultParallelism, which scales with
    * executors on a cluster) also keeps AQE from coalescing the exchange
    * to the tiny INPUT byte size when the downstream work fans out. At
    * real corpus scale the scan has thousands of splits and this exchange
    * is a no-op cost relative to the pipeline. */
  private def spread(df: DataFrame, key: String = "doc_id"): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism * 2, col(key))

  /** Exact-verify tail shared by the candidate generators: join candidate
    * (d1, d2) pairs to their full term sets, compute Jaccard with the
    * intersection evaluated ONCE (its own projection step — CollapseProject
    * keeps non-cheap expressions referenced twice in a separate project,
    * so the 4.5M-pair hot loop never recomputes array_intersect), filter
    * at τ, render. */
  private def verifyJaccardPairs(cand: DataFrame, sets: DataFrame, tau: Double): DataFrame =
    ordered(cand
      .join(sets.select(col("doc_id").as("d1"), col("set").as("t1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("set").as("t2")), Seq("d2"))
      .withColumn("ni", size(array_intersect(col("t1"), col("t2"))))
      .withColumn("jac", col("ni").cast("double") /
        (size(col("t1")) + size(col("t2")) - col("ni")).cast("double"))
      .filter(col("jac") >= tau)
      .select(col("d1"), col("d2"), dec4S(col("jac")).as("jac")))

  /** Exact τ-Jaccard near-dup pairs via prefix-filtered inverted index
    * (the AllPairs/PPJoin candidate generation, exact for any τ = num/den).
    *
    * Principle: order every doc's terms by global rarity (document
    * frequency asc, term asc — one total order for the whole corpus). If
    * J(A,B) ≥ τ, the docs share ≥ ⌈τ·max(|A|,|B|)⌉ terms, so at least one
    * shared term falls inside BOTH docs' first (n − ⌈τ·n⌉ + 1) terms —
    * only those prefix postings are indexed and joined. At τ=0.95 a prefix
    * is ~5% of a doc's terms and rare by construction, so the equi-join
    * fan-out collapses versus indexing all postings; candidates are then
    * verified exactly against the full term sets. A pruned pair can never
    * reach τ (theorem above + the lossless length band), so the declared
    * output — and the oracle SQL — is identical to the naive pair join.
    *
    * 100 TB: three posting-proportional shuffles (df count, rarity rank,
    * prefix join) replace any O(n²) structure; hot terms never join
    * because frequent terms sort out of every prefix.
    *
    * Input `t` must have columns (doc_id, lang, set, n). */
  private def prefixJaccardPairs(t0: DataFrame, num: Int, den: Int): DataFrame = {
    val t = spread(t0)
    val g = t.select(col("doc_id"), col("lang"), col("n"), explode(col("set")).as("tok"))
    val dfreq = g.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("tok").asc)
    // prefix length = n - ceil(τ·n) + 1, exact integer arithmetic (`div`)
    val prefixLen = col("n") - expr(s"(n * $num + ${den - 1}) div $den").cast("int") + 1
    // Materialized once: both self-join sides read the same tiny prefix
    // relation instead of re-running the df-count join + rarity window.
    // The pre-checkpoint repartition's real job is WIDTH, not join
    // clustering (under AQE a checkpoint drops outputPartitioning — the
    // consumer sees a bare LogicalRDD): the ~1 MB prefix relation
    // broadcast-joins, so the quadratic probe streams directly off the
    // checkpointed RDD and runs at ITS partition count. Left to AQE, the
    // upstream window exchange coalesces this ~1 MB relation to 2 of 32
    // cores and the probe runs there — the §4.4.3 narrow-probe trap,
    // measured 6.7 s vs 4.9 s steady-state at sf0.1; the explicit
    // repartition pins the checkpoint (hence the probe) at full width.
    // Rare-token skew is bounded by the prefix-index construction itself
    // (tokens are kept only while among a doc's rarest), so hashing by
    // token keeps all cores loaded.
    val prefix = g.join(dfreq, Seq("lang", "tok"))
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefixLen)
      .select(col("doc_id"), col("lang"), col("n"), col("tok"))
      .repartition(t.sparkSession.sparkContext.defaultParallelism * 2,
        col("lang"), col("tok"))
      .pinned
    val a = prefix.select(col("doc_id").as("d1"), col("lang").as("l1"),
      col("n").as("n1"), col("tok").as("tk1"))
    val b = prefix.select(col("doc_id").as("d2"), col("lang").as("l2"),
      col("n").as("n2"), col("tok").as("tk2"))
    val cand = a.join(b, col("tk1") === col("tk2") && col("l1") === col("l2") &&
        col("d1") < col("d2") &&
        col("n1") * den >= col("n2") * num && col("n2") * den >= col("n1") * num)
      .select(col("d1"), col("d2")).distinct()
    verifyJaccardPairs(cand, t.select(col("doc_id"), col("set")), num.toDouble / den)
  }

  /** MinHash + LSH-banding near-dup over `documents` (SIM-3/DDP-3).
    *
    * Sketch: per doc, sig[i] = min over distinct word-bigram SHINGLES of
    * (A_i * polyHash(shingle) + B_i) mod P — built either from 8 builtin
    * `min` aggregates or from the [[graft.functions.MinHashSketch]]
    * TypedImperativeAggregate (bit-identical; asserted in ExpressionSpec).
    * See [[shingles]] for why the sketch is shingle-based, not unigram.
    *
    * Banding: 2 bands × 4 rows — a candidate pair must agree on all 4
    * min-slots of a band. The s-curve threshold (1/b)^(1/r) = 0.5^0.25 ≈
    * 0.84 fits the τ=0.95 verify step; 4 bands × 2 rows (t ≈ 0.71)
    * generated ~10M candidates at sf0.1, 500× the true near-dup count, so
    * verification dominated the runtime. The band hash folds the 4 slots
    * with the same 31-poly mod P both engines share; a fold collision only
    * adds a false candidate that exact verify rejects.
    *
    * Bands come from ONE pass over the signature table (array-of-structs
    * explode); this helper returns them UNPERSISTED — each caller
    * ([[minhashPairs]], [[incrPairs]]) persists for the duration of its
    * self-join so the token-explode + per-token-hash + sketch aggregation
    * runs exactly once, not once per band branch per join side, then
    * unpersists. The shuffle carries one 8-slot signature per doc. */
  private def minhashBands(doc: DataFrame, useUdaf: Boolean): DataFrame = {
    val tok = doc.select(col("doc_id"), explode(shingles(col("text"))).as("tok"))
      .withColumn("h", polyHash(col("tok")))
    val sigs =
      if (useUdaf) {
        // TypedImperativeAggregate plans as ObjectHashAggregate, which by
        // default abandons its hash map for sort-based aggregation after
        // 128 distinct groups — and this groupBy has one group PER DOC.
        // The buffer is a fixed 64 bytes, so even millions of in-flight
        // groups are a few hundred MB per task at most: raise the
        // threshold so the sketch aggregates hash-style like its builtin
        // twin instead of paying a full sort of the token stream.
        doc.sparkSession.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
        tok.groupBy(col("doc_id"))
          .agg(graft.functions.MinHashSketch.minhash_sketch(col("h")).as("sig"))
          .select(col("doc_id") +: (0 until As.size).map(i =>
            element_at(col("sig"), i + 1).as(s"s$i")): _*)
      } else {
        val sigExprs = As.zip(Bs).zipWithIndex.map { case ((a, b), i) =>
          min((lit(a) * col("h") + lit(b)) % lit(P)).as(s"s$i")
        }
        tok.groupBy(col("doc_id")).agg(sigExprs.head, sigExprs.tail: _*)
      }
    def foldSlots(bi: Int): Column =
      (0 to 3).map(j => col(s"s${4 * bi + j}"))
        .foldLeft(lit(0L))((acc, s) => (acc * 31L + s) % lit(P))
    val bandArr = array((0 until 2).map { bi =>
      struct(lit(bi).as("band_idx"), foldSlots(bi).as("bh"))
    }: _*)
    sigs.select(col("doc_id"), explode(bandArr).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"), col("b.bh").as("bh"))
  }

  /** Per-doc average bigram surprisal under the corpus's own per-lang
    * bigram distribution (LM-1's core, shared with the curation pipeline):
    * returns (doc_id, n_bigrams, surp double). Per-doc log-probs are
    * summed in POSITION order (collect → sort → fold) so the double is
    * deterministic; input should be [[spread]] already. */
  private def lmSurprisal(doc: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    // POSITIONAL bigrams — the sequence the doc is, not the distinct set.
    val grams = when(size(words) >= 2, bigramArr(words))
      .otherwise(array().cast("array<string>"))
    // Materialized once: the count build and the scoring join both read it.
    val pos = doc.select(col("doc_id"), col("lang"), posexplode(grams).as(Seq("pos", "gram")))
      .pinned
    val counts = pos.groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("c2"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c2")).as("n_lang"))
    // pos ⋈ counts stays UNHINTED deliberately. Locally Catalyst builds
    // the hash on the checkpointed posting side and streams the tiny
    // count table (measured 4.1 s steady; forcing broadcast(counts), the
    // "obvious" vocab-side hint, ran 10.5 s). That local build choice is
    // safe to leave to the optimizer because a checkpoint's LogicalRDD
    // carries REAL materialized-size stats: at corpus scale the posting
    // side reports TBs, broadcast is off the table, and the join
    // degrades to the SMJ-on-(lang,gram) shape a 100 TB run wants.
    val scored = pos.join(counts, Seq("lang", "gram"))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("logp", log(col("c2").cast("double") / col("n_lang").cast("double")))
    // lang rides the group key (functionally dependent on doc_id — same
    // partitioning, zero extra shuffle) so LM-2's per-language bucketing
    // reads it without a join back to the corpus.
    scored.groupBy(col("doc_id"), col("lang"))
      .agg(array_sort(collect_list(struct(col("pos"), col("logp")))).as("ps"))
      .select(col("doc_id"), col("lang"), size(col("ps")).as("n_bigrams"),
        (negate(aggregate(col("ps"), lit(0.0), (acc, x) => acc + x("logp"))) /
          size(col("ps")).cast("double")).as("surp"))
  }

  /** Batch membership predicate for the incremental-admission queries:
    * doc_id % 10 == 7 is the deterministic ~10% "new batch" stand-in. */
  private def incrIsNew(c: Column): Column = c % 10 === 7

  /** Exact τ=0.95 shingle-Jaccard verification of candidate (d1, d2)
    * pairs — THE one copy of the minhash family's verify tail (formula
    * and threshold), shared by [[minhashPairs]] and [[incrPairs]] so the
    * full and incremental pipelines cannot drift apart. Intersection
    * staged in its own projection (see verifyJaccardPairs). */
  private def minhashVerify(cand: DataFrame, doc: DataFrame): DataFrame = {
    val sets = doc.select(col("doc_id"), shingles(col("text")).as("toks"))
    cand
      .join(sets.select(col("doc_id").as("d1"), col("toks").as("t1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("toks").as("t2")), Seq("d2"))
      .withColumn("ni", size(array_intersect(col("t1"), col("t2"))))
      .withColumn("jac", col("ni").cast("double") /
        (size(col("t1")) + size(col("t2")) - col("ni")).cast("double"))
      .filter(col("jac") >= 0.95)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** Verified near-dup pairs touching the new batch (d1 < d2, jac double),
    * from the asymmetric newBands ⋈ allBands probe — shared by ddp_incr
    * (pair list) and ddp_incr_best (per-new-doc top-1 reduction). */
  private def incrPairs(s: SparkSession, d: String): DataFrame = {
    val doc = spread(load(s, d, "documents"))
    val bands = minhashBands(doc, useUdaf = false).persist(StorageLevel.MEMORY_AND_DISK_SER)
    val cand = bands.filter(incrIsNew(col("doc_id"))).as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") =!= col("y.doc_id"))
      // Batch-batch pairs arrive twice (both sides probe); canonicalize
      // to d1 < d2 before the distinct so they count once.
      .select(least(col("x.doc_id"), col("y.doc_id")).as("d1"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("d2")).distinct()
    val verified = minhashVerify(cand, doc).pinned
    bands.unpersist()
    verified
  }

  /** Verified near-dup pairs (d1 < d2, jac as double) from the MinHash
    * candidate pipeline — shared by the pair queries and ddp_cluster. */
  /** LSH candidate pairs → Jaccard-verified near-dup edges.
    *
    * `capBuckets = true` (the CLUSTERING consumers only — ddp_cluster /
    * ddp_keeper_src, where edges feed connected components, never a
    * shipped pair list) honors `spark.graft.dedup.bucketCap`: a band
    * bucket with MORE than `cap` members emits a STAR (bucket-min →
    * member, `size−1` edges) instead of all pairs (`size·(size−1)/2`) —
    * the bound on dense-clique edge amplification. For component
    * assignment the star is connectivity-equivalent whenever the star
    * edges pass verification (a true near-dup clique: every member ≈ the
    * min member), which is exactly the degenerate case the cap exists
    * for; a marginal bucket whose members are similar to each other but
    * not to the bucket min can split differently, which is why the cap
    * is config-gated default-OFF and pinned result-identical on the
    * corpus (PipelineOpsSpec). Buckets at/under the cap are untouched,
    * so an enabled cap only rewrites the pathological buckets. */
  private[graft] def minhashPairs(doc0: DataFrame, useUdaf: Boolean,
      capBuckets: Boolean = false): DataFrame = {
    val doc = spread(doc0)
    val bands = minhashBands(doc, useUdaf).persist(StorageLevel.MEMORY_AND_DISK_SER)
    val capOpt = if (capBuckets)
      doc0.sparkSession.conf.getOption("spark.graft.dedup.bucketCap").map(_.toInt)
    else None
    val cand = capOpt match {
      case None =>
        bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
      case Some(cap) =>
        val wB = Window.partitionBy(col("band_idx"), col("bh"))
        val sized = bands
          .withColumn("bsz", count(lit(1)).over(wB))
          .withColumn("bmin", min(col("doc_id")).over(wB))
        val small = sized.filter(col("bsz") <= cap)
          .select(col("band_idx"), col("bh"), col("doc_id"))
        val pairsSmall = small.as("x").join(small.as("y"),
          col("x.band_idx") === col("y.band_idx") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        // bmin is the bucket MIN, so d1 < d2 holds by construction.
        val pairsStar = sized.filter(col("bsz") > cap && col("doc_id") =!= col("bmin"))
          .select(col("bmin").as("d1"), col("doc_id").as("d2"))
        pairsSmall.unionAll(pairsStar).distinct()
    }
    val verified = minhashVerify(cand, doc)
      // Eagerly materialize the (small) verified edge set, then release the
      // band cache — callers (pair queries, ddp_cluster, pipeline_clean,
      // tests) no longer leak persisted blocks across the session.
      .pinned
    bands.unpersist()
    verified
  }

  private def minhashNearDup(doc: DataFrame, useUdaf: Boolean): DataFrame =
    ordered(minhashPairs(doc, useUdaf)
      .select(col("d1"), col("d2"), dec4S(col("jac")).as("jac")))

  /** DDP-CLUSTER: near-dup cluster assignment — the operator a dedup
    * pipeline actually keys on. Pair queries are inherently quadratic in
    * cluster size (a k-clique of dups emits k(k-1)/2 edges); what the
    * pipeline needs is ONE row per doc: its connected component over the
    * near-dup graph and whether it is the elected keeper (min doc_id).
    *
    * Implementation is Hash-Min label propagation: every doc starts
    * labeled with itself; each round takes the min of its own and its
    * neighbors' labels; converges to the component minimum in O(diameter)
    * rounds (near-dup clusters are near-cliques, so 2-3). Each round is
    * one shuffle join + aggregate — the standard distributed CC shape
    * (GraphX/Pregel Hash-Min) with no driver-side data, only a
    * convergence flag. Labels only ever decrease, so the fixpoint test
    * (any label changed?) is exact. Edges are persisted once; the DuckDB
    * twin walks the same graph with a recursive CTE. */
  private[graft] def clusterAssign(doc: DataFrame, edges0: DataFrame): DataFrame = {
    // Alternating-contraction Hash-Min. Invariant entering each round: the
    // symmetric edge set `sym` connects CURRENT label values (round 0:
    // labels are identity, so raw doc edges qualify). Each round:
    //   1. min-propagate: a label node takes the min of itself and its
    //      edge neighbors; docs inherit through their label.
    //   2. pointer-jump: label -> label(label), so a min crosses 2^k hops
    //      in k rounds.
    //   3. contract: relabel edge endpoints under the new labels and drop
    //      intra-cluster loops — after round one the edge set collapses
    //      from |E| to the handful of unmerged cross-cluster links, so
    //      only the first round pays a full |E| scan.
    // Eager checkpointing truncates lineage at every step — without it the
    // round-N plan chains through all prior rounds plus the whole minhash
    // pipeline and OOMs the driver. Two modes:
    //  - default: serialized local checkpoint ([[Tables.pin]]) — blocks
    //    live on executors; fastest,
    //    but an executor loss mid-iteration kills the job (acceptable on
    //    local[n], NOT on a 1000-executor cluster where some loss per hour
    //    is the norm).
    //  - `spark.graft.cluster.checkpointDir=<path>`: reliable
    //    `checkpoint()` to that directory (HDFS/S3 in production) — each
    //    round's state survives executor loss and is recomputed-free on
    //    retry, at the price of one distributed-FS write per round. The
    //    iteration count is O(log n), so the extra writes stay bounded.
    // Convergence (no label moved) is exact: labels only ever decrease.
    val spark = doc.sparkSession
    val reliableDir = spark.conf.getOption("spark.graft.cluster.checkpointDir")
    reliableDir.foreach(spark.sparkContext.setCheckpointDir)
    def ckpt(df: DataFrame): DataFrame =
      if (reliableDir.isDefined) df.checkpoint(eager = true)
      else df.pinned
    val edges = ckpt(edges0.select(col("d1"), col("d2")))
    var sym = ckpt(edges.unionAll(edges.select(col("d2").as("d1"), col("d1").as("d2"))))
    var labels = ckpt(doc.select(col("doc_id"), col("doc_id").as("label")))
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      // 1. Edge endpoints are label values, so min-propagation needs no
      //    doc-level join: min neighbor label per label node...
      val neighborMin = sym.groupBy(col("d1")).agg(min(col("d2")).as("nl"))
      //    ...applied to every doc through its current label.
      // The round's ORIGINAL label rides along as `old_label` so the
      // convergence test below is a FILTER over the round's own
      // checkpointed blocks instead of a doc-level join back to `labels`
      // — one fewer shuffle join per round. At sf0.1's 2-3 rounds the
      // steady-state delta is within noise (2.28 s vs the 2.29 s floor);
      // the term scales with round count × label-relation size, which is
      // what matters on a 100 TB corpus where CC runs O(log n) rounds
      // over a doc-sized relation.
      val stepped = ckpt(labels.as("l")
        .join(neighborMin.as("n"), col("l.label") === col("n.d1"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("l.label"), coalesce(col("n.nl"), col("l.label"))).as("label"),
          col("l.label").as("old_label")))
      // 2. Pointer jump (labels are doc_ids, so the lookup is a self-join).
      val next = ckpt(stepped.as("x")
        .join(stepped.select(col("doc_id").as("ld"), col("label").as("ll")).as("y"),
          col("x.label") === col("y.ld"), "left")
        .select(col("x.doc_id").as("doc_id"),
          least(col("x.label"), coalesce(col("y.ll"), col("x.label"))).as("label"),
          col("x.old_label").as("old_label")))
      converged = next.filter(col("label") =!= col("old_label")).isEmpty
      // 3. Contract the graph under the new labels.
      if (!converged) {
        sym = ckpt(sym
          .join(next.select(col("doc_id").as("j1"), col("label").as("nl1")),
            col("d1") === col("j1"))
          .join(next.select(col("doc_id").as("j2"), col("label").as("nl2")),
            col("d2") === col("j2"))
          .select(col("nl1").as("d1"), col("nl2").as("d2"))
          .filter(col("d1") =!= col("d2"))
          .distinct())
      }
      labels = next.select(col("doc_id"), col("label"))
      rounds += 1
    }
    System.err.println(s"[ddp_cluster] converged after $rounds rounds")
    ordered(labels
      .select(col("doc_id"), col("label").as("cluster_id"),
        (col("doc_id") === col("label")).as("is_keeper")))
  }

  /** Shared CTE block ending in `verified(d1, d2, jac)` — the minhash
    * candidate + exact-verify pipeline, used by the pair queries and the
    * cluster-assignment twin. */
  private lazy val duckMinhashCtes: String = {
    val sigCols = As.zip(Bs).zipWithIndex.map { case ((a, b), i) =>
      s"MIN(($a * h + $b) % 2147483647) AS s$i"
    }.mkString(",\n      |    ")
    val bandRows = (0 until 2).map { bi =>
      val fold = (0 to 3).map(j => s"s${4 * bi + j}")
        .foldLeft("CAST(0 AS BIGINT)")((acc, s) => s"(($acc) * 31 + $s) % 2147483647")
      s"SELECT doc_id, $bi AS band_idx, $fold AS bh FROM sig"
    }.mkString("\n      |  UNION ALL ")
    s"""h AS (
      |  $duckShingleHash
      |), sig AS (
      |  SELECT doc_id,
      |    $sigCols
      |  FROM h GROUP BY doc_id
      |), bands AS (
      |  $bandRows
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
      |  FROM bands x JOIN bands y
      |    ON x.band_idx = y.band_idx AND x.bh = y.bh AND x.doc_id < y.doc_id
      |), sets AS ($duckShingles), verified AS (
      |  SELECT d1, d2, jac FROM (
      |    SELECT d1, d2,
      |      CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |      CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS jac
      |    FROM cand JOIN sets a ON cand.d1 = a.doc_id JOIN sets b ON cand.d2 = b.doc_id
      |  ) WHERE jac >= 0.95
      |)""".stripMargin
  }

  /** DuckDB twin of [[minhashNearDup]] (both engine variants). */
  private lazy val duckMinhashSql: String =
    s"""WITH $duckMinhashCtes
      |SELECT d1, d2, CAST(CAST(floor((jac)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS jac
      |FROM verified
      |ORDER BY d1 NULLS FIRST, d2 NULLS FIRST, jac NULLS FIRST""".stripMargin

  /** Recursive-reachability CTE block ending in `clusters(doc_id,
    * cluster_id)` — DuckDB twin of [[clusterAssign]]'s fixpoint. */
  private lazy val duckClusterCtes: String =
    s"""$duckMinhashCtes, edges AS (
      |  SELECT d1, d2 FROM verified UNION ALL SELECT d2 AS d1, d1 AS d2 FROM verified
      |), walk(doc_id, r) AS (
      |  SELECT doc_id, doc_id AS r FROM documents
      |  UNION
      |  SELECT w.doc_id, e.d2 AS r FROM walk w JOIN edges e ON w.r = e.d1
      |), clusters AS (
      |  SELECT doc_id, MIN(r) AS cluster_id FROM walk GROUP BY doc_id
      |)""".stripMargin

  private lazy val duckClusterSql: String =
    s"""WITH RECURSIVE $duckClusterCtes
      |SELECT doc_id, cluster_id, (doc_id = cluster_id) AS is_keeper
      |FROM clusters
      |ORDER BY doc_id NULLS FIRST, cluster_id NULLS FIRST, is_keeper NULLS FIRST""".stripMargin

  /** DuckDB twin of the end-to-end cleaning pipeline (`pipeline_clean`). */
  private lazy val duckPipelineSql: String =
    s"""WITH RECURSIVE $duckClusterCtes, quality AS (
      |  SELECT doc_id, lang, n_chars FROM documents
      |  WHERE n_chars >= 100 AND len(string_split(text, ' ')) >= 20
      |), kept AS (
      |  SELECT q.doc_id, q.lang, q.n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id ORDER BY q.doc_id ASC) AS rk
      |  FROM quality q JOIN clusters c ON q.doc_id = c.doc_id
      |)
      |SELECT lang, COUNT(1) AS n_kept,
      |  CAST(CAST(floor((CAST(SUM(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_chars
      |FROM kept WHERE rk = 1
      |GROUP BY lang
      |ORDER BY lang NULLS FIRST, n_kept NULLS FIRST, avg_chars NULLS FIRST""".stripMargin

  // Shared DuckDB CTE fragments (token sets + portable token hash).
  /** The SIM-1 IVF oracle pipeline through its `ranked` CTE, shared by
    * `sim1_ivf` and `ivf_eval` (mirrors the shared [[ivfRanked]]). */
  private lazy val duckIvfBaseCtes: String = duckIvfBaseCtesTrain("")

  /** [[duckIvfBaseCtes]] with the Lloyd TRAINING population restricted by
    * `trainWhere` (the sample-train twins; "" = the certified full-train
    * path, byte-identical to the original CTE text). Only `ibase` — the
    * training base feeding the seeds and both Lloyd rounds — is filtered;
    * `vecs`/`assigned` (full-corpus assignment) always read the whole
    * table, mirroring [[ivfAssignedWith]] over a sample-trained
    * [[ivfKmeansCentroidsFrom]]. */
  private def duckIvfBaseCtesTrain(trainWhere: String): String = {
    // Lloyd-trained coarse quantizer (r11): the DuckDB twin of
    // [[ivfKmeansCentroids]] — kmeans_iter's certified oracle CTEs with
    // k=10 seeds (vec_id < 10) and TWO update steps; `cent` is the
    // round-2 centroid table.
    val centCols = (1 to 64).map { i =>
      s"CAST(CAST(floor((CAST(SUM(CAST(floor((v[$i])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m$i"
    }.mkString(",\n    ")
    val mList = (1 to 64).map(i => s"m$i").mkString("[", ", ", "]")
    // NOTE: bodies of CTEs that feed a later cross join must stay
    // alias-free — DuckDB 1.0's binder loses CTE-internal table aliases
    // there ("Referenced table d not found ... Candidate tables: v").
    s"""ibase AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS vv
      |  FROM embeddings$trainWhere
      |), iseed1 AS (
      |  SELECT CAST(vec_id AS INT) AS cid, v AS c, vv AS cc
      |  FROM ibase WHERE vec_id < 10
      |), ip1 AS (
      |  SELECT b.vec_id, s.cid, b.v,
      |    b.vv + s.cc - 2.0 * list_sum(list_transform(list_zip(b.v, s.c), p -> p[1] * p[2])) AS dist
      |  FROM ibase b CROSS JOIN iseed1 s
      |), ia1 AS (
      |  SELECT vec_id, cid, v FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
      |    FROM ip1) t WHERE rn = 1
      |), icent1 AS (
      |  SELECT cid,
      |    $centCols
      |  FROM ia1 GROUP BY cid
      |), iseed2 AS (
      |  SELECT cid, $mList AS c,
      |    list_sum(list_transform($mList, x -> x * x)) AS cc
      |  FROM icent1
      |), ip2 AS (
      |  SELECT b.vec_id, s.cid, b.v,
      |    b.vv + s.cc - 2.0 * list_sum(list_transform(list_zip(b.v, s.c), p -> p[1] * p[2])) AS dist
      |  FROM ibase b CROSS JOIN iseed2 s
      |), ia2 AS (
      |  SELECT vec_id, cid, v FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
      |    FROM ip2) t WHERE rn = 1
      |), icent2 AS (
      |  SELECT cid,
      |    $centCols
      |  FROM ia2 GROUP BY cid
      |), cent AS (
      |  SELECT cid AS cell_label, $mList AS ce FROM icent2
      |), centn AS (
      |  SELECT cell_label, ce, sqrt(list_sum(list_transform(ce, x -> x * x))) AS cn FROM cent
      |), vecs AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS vn
      |  FROM embeddings
      |), assigned AS (
      |  SELECT v.vec_id, v.e, v.vn, c.cell_label,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
      |      list_sum(list_transform(list_zip(v.e, c.ce), p -> p[1] * p[2])) / (v.vn * c.cn) DESC,
      |      c.cell_label ASC) AS INT) AS crn
      |  FROM vecs v CROSS JOIN centn c
      |), cells AS (
      |  SELECT vec_id, e, vn, cell_label AS cell FROM assigned WHERE crn = 1
      |)""".stripMargin
  }

  /** The recall@3 audit tail shared by every quantizer-eval oracle: brute
    * cosine top-3 truth (tbase/tt/truth) left-joined against the index's
    * `rankedCte` top-3, per-query hit count + dec4 recall string — ONE
    * spelling so the full/sample/cap twins can only differ in their
    * training CTEs. */
  private def duckRecallAuditSql(ctes: String, rankedCte: String): String =
    s"""WITH $ctes, idx3 AS (
      |  SELECT query_id, neighbor_id FROM $rankedCte WHERE rn <= 3
      |), tbase AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |), tt AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
      |      list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) DESC,
      |      c.vec_id ASC) AS INT) AS rn
      |  FROM tbase q JOIN tbase c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
      |), truth AS (SELECT query_id, neighbor_id FROM tt WHERE rn <= 3)
      |SELECT t.query_id, CAST(COUNT(i.query_id) AS INT) AS n_hit,
      |  CAST(CAST(floor((CAST(COUNT(i.query_id) AS DOUBLE) / 3.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall
      |FROM truth t LEFT JOIN idx3 i
      |  ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id
      |GROUP BY t.query_id
      |ORDER BY t.query_id NULLS FIRST, n_hit NULLS FIRST, recall NULLS FIRST""".stripMargin

  /** The IVF-PQ oracle pipeline through its `pranked` CTE — DuckDB twin
    * of [[ivfPqRanked]]: vec_pq's PQ training/encoding CTEs (p-prefixed
    * to coexist with the IVF base CTEs) + per-query LUT + ADC scan over
    * the probe cells + exact re-rank of the ADC top-16. */
  /** Long-form (vec, subspace, position, dec4 value) embedding CTEs shared
    * by the direct-PQ and residual-PQ oracle pipelines. */
  private lazy val duckPqLongCtes: String =
    s"""plf AS (
      |  SELECT vec_id, CAST(dim AS INT) AS dim, CAST(x AS DOUBLE) AS xd
      |  FROM (SELECT vec_id, unnest(embedding) AS x,
      |          unnest(generate_series(1, len(embedding))) AS dim
      |        FROM embeddings)
      |), plq AS (
      |  SELECT vec_id, ((dim - 1) // 8) + 1 AS sp, ((dim - 1) % 8) + 1 AS p,
      |    CAST(floor(xd*10000+0.5)/10000 AS DECIMAL(18,4)) AS xq
      |  FROM plf
      |)""".stripMargin

  /** DuckDB twin of PqEncode's Lloyd refinement (r11): `rounds` CTE
    * triples re-assign every (vec, sp) of `long`.`v` to its nearest
    * codeword of the previous book and recompute the dec4 means. Final
    * book CTE is named `<pre>b<rounds>`. */
  private def duckPqRefineCtes(pre: String, long: String, v: String,
      book0: String, rounds: Int): (String, String) = {
    var prev = book0
    val sb = new StringBuilder
    (1 to rounds).foreach { r =>
      sb.append(s""", ${pre}d$r AS (
        |  SELECT $long.vec_id, $long.sp, $prev.cell,
        |    SUM(($long.$v - $prev.c) * ($long.$v - $prev.c)) AS dist
        |  FROM $long JOIN $prev ON $long.sp = $prev.sp AND $long.p = $prev.p
        |  GROUP BY 1, 2, 3
        |), ${pre}a$r AS (
        |  SELECT vec_id, sp, cell FROM ${pre}d$r
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sp
        |    ORDER BY dist ASC, cell ASC) = 1
        |), ${pre}b$r AS (
        |  SELECT $long.sp, ${pre}a$r.cell, $long.p,
        |    CAST(floor((CAST(SUM($long.$v) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(18,4)) AS c
        |  FROM $long JOIN ${pre}a$r
        |    ON $long.vec_id = ${pre}a$r.vec_id AND $long.sp = ${pre}a$r.sp
        |  GROUP BY 1, 2, 3
        |)""".stripMargin)
      prev = s"${pre}b$r"
    }
    (sb.toString, prev)
  }

  private lazy val duckIvfPqCtes: String = duckIvfPqCtesTrain("")

  /** [[duckIvfPqCtes]] with the PQ/Lloyd TRAINING population restricted
    * by `trainWhere` ("" = the certified full-train path, byte-identical
    * text). Training CTEs (sign seed, book, refinement rounds) read the
    * sampled long relation `plqt`; the encode (`pdist`), LUT and scan
    * always read the full `plq` — mirroring [[ivfPqRanked]]'s
    * trainSample path. */
  private def duckIvfPqCtesTrain(trainWhere: String): String = {
    val tl = if (trainWhere.nonEmpty) "plqt" else "plq"
    val tsel = if (trainWhere.isEmpty) "" else s""", tsel AS (
      |  SELECT vec_id FROM embeddings$trainWhere
      |), plqt AS (
      |  SELECT plq.* FROM plq JOIN tsel ON plq.vec_id = tsel.vec_id
      |)""".stripMargin
    val (pqRefine, pqBook) = duckPqRefineCtes("pf", tl, "xq", "pbook", 2)
    s"""${duckIvfBaseCtesTrain(trainWhere)}, $duckPqLongCtes$tsel, psign AS (
      |  SELECT vec_id, sp,
      |    CAST(SUM(CASE WHEN xq > 0 AND p = 1 THEN 8 WHEN xq > 0 AND p = 2 THEN 4
      |      WHEN xq > 0 AND p = 3 THEN 2 WHEN xq > 0 AND p = 4 THEN 1
      |      ELSE 0 END) AS INT) AS cell
      |  FROM $tl GROUP BY 1, 2
      |), pbook AS (
      |  SELECT $tl.sp, psign.cell, $tl.p,
      |    CAST(floor((CAST(SUM($tl.xq) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(18,4)) AS c
      |  FROM $tl JOIN psign ON $tl.vec_id = psign.vec_id AND $tl.sp = psign.sp
      |  GROUP BY 1, 2, 3
      |)$pqRefine, pdist AS (
      |  SELECT plq.vec_id, plq.sp, $pqBook.cell,
      |    SUM((plq.xq - $pqBook.c) * (plq.xq - $pqBook.c)) AS dist
      |  FROM plq JOIN $pqBook ON plq.sp = $pqBook.sp AND plq.p = $pqBook.p
      |  GROUP BY 1, 2, 3
      |), pcode AS (
      |  SELECT vec_id AS neighbor_id, sp, cell AS cw FROM pdist
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sp
      |    ORDER BY dist ASC, cell ASC) = 1
      |), pprobes AS (
      |  SELECT vec_id AS query_id, cell_label AS pcell
      |  FROM assigned WHERE vec_id < 10 AND crn <= 2
      |), pqv AS (
      |  SELECT vec_id AS query_id, e AS qe, vn AS qn FROM cells WHERE vec_id < 10
      |), qlut AS (
      |  SELECT plq.vec_id AS query_id, plq.sp, $pqBook.cell AS cw,
      |    SUM(plq.xq * $pqBook.c) AS ip
      |  FROM plq JOIN $pqBook ON plq.sp = $pqBook.sp AND plq.p = $pqBook.p
      |  WHERE plq.vec_id < 10
      |  GROUP BY 1, 2, 3
      |), pcand AS (
      |  SELECT pprobes.query_id, cells.vec_id AS neighbor_id, cells.vn AS cn
      |  FROM pprobes JOIN cells ON pprobes.pcell = cells.cell
      |    AND pprobes.query_id <> cells.vec_id
      |), padc AS (
      |  SELECT pcand.query_id, pcand.neighbor_id, pcand.cn, SUM(qlut.ip) AS ipsum
      |  FROM pcand JOIN pcode ON pcand.neighbor_id = pcode.neighbor_id
      |    JOIN qlut ON pcand.query_id = qlut.query_id
      |      AND pcode.sp = qlut.sp AND pcode.cw = qlut.cw
      |  GROUP BY 1, 2, 3
      |), ppool AS (
      |  SELECT padc.query_id, padc.neighbor_id,
      |    CAST(padc.ipsum AS DOUBLE) / (pqv.qn * padc.cn) AS adc_raw
      |  FROM padc JOIN pqv ON padc.query_id = pqv.query_id
      |), pshort AS (
      |  SELECT query_id, neighbor_id, adc_raw FROM ppool
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY adc_raw DESC, neighbor_id ASC) <= 16
      |), pranked AS (
      |  SELECT pshort.query_id, pshort.neighbor_id, pshort.adc_raw,
      |    list_sum(list_transform(list_zip(pqv.qe, cells.e), x -> x[1] * x[2])) / (pqv.qn * cells.vn) AS score_raw,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY pshort.query_id ORDER BY
      |      list_sum(list_transform(list_zip(pqv.qe, cells.e), x -> x[1] * x[2])) / (pqv.qn * cells.vn) DESC,
      |      pshort.neighbor_id ASC) AS INT) AS rn
      |  FROM pshort JOIN pqv ON pshort.query_id = pqv.query_id
      |    JOIN cells ON pshort.neighbor_id = cells.vec_id
      |)""".stripMargin
  }

  /** Residual-IVFADC oracle pipeline through its `rranked` CTE — DuckDB
    * twin of [[ivfPqResRanked]]: cell centroids in long decimal form,
    * residuals r = xq − μ, PQ train/encode on residuals, ADC as
    * q·μ + Σ LUT(raw q, residual codeword), exact re-rank of the top-16. */
  private lazy val duckIvfPqResCtes: String = {
    val (rqRefine, rqBook) = duckPqRefineCtes("rf", "rlong", "r", "rbook", 2)
    s"""$duckIvfBaseCtes, $duckPqLongCtes, mlong AS (
      |  SELECT cell_label, CAST(((dim - 1) // 8) + 1 AS INT) AS sp,
      |    CAST(((dim - 1) % 8) + 1 AS INT) AS p,
      |    CAST(m AS DECIMAL(18,4)) AS m
      |  FROM (SELECT cell_label, unnest(ce) AS m,
      |          unnest(generate_series(1, len(ce))) AS dim
      |        FROM cent)
      |), rlong AS (
      |  SELECT plq.vec_id, plq.sp, plq.p,
      |    CAST(plq.xq - mlong.m AS DECIMAL(18,4)) AS r
      |  FROM plq JOIN cells ON plq.vec_id = cells.vec_id
      |    JOIN mlong ON cells.cell = mlong.cell_label
      |      AND plq.sp = mlong.sp AND plq.p = mlong.p
      |), rsign AS (
      |  SELECT vec_id, sp,
      |    CAST(SUM(CASE WHEN r > 0 AND p = 1 THEN 8 WHEN r > 0 AND p = 2 THEN 4
      |      WHEN r > 0 AND p = 3 THEN 2 WHEN r > 0 AND p = 4 THEN 1
      |      ELSE 0 END) AS INT) AS cell
      |  FROM rlong GROUP BY 1, 2
      |), rbook AS (
      |  SELECT rlong.sp, rsign.cell, rlong.p,
      |    CAST(floor((CAST(SUM(rlong.r) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(18,4)) AS c
      |  FROM rlong JOIN rsign ON rlong.vec_id = rsign.vec_id AND rlong.sp = rsign.sp
      |  GROUP BY 1, 2, 3
      |)$rqRefine, rdist AS (
      |  SELECT rlong.vec_id, rlong.sp, $rqBook.cell,
      |    SUM((rlong.r - $rqBook.c) * (rlong.r - $rqBook.c)) AS dist
      |  FROM rlong JOIN $rqBook ON rlong.sp = $rqBook.sp AND rlong.p = $rqBook.p
      |  GROUP BY 1, 2, 3
      |), rcode AS (
      |  SELECT vec_id AS neighbor_id, sp, cell AS cw FROM rdist
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sp
      |    ORDER BY dist ASC, cell ASC) = 1
      |), pprobes AS (
      |  SELECT vec_id AS query_id, cell_label AS pcell
      |  FROM assigned WHERE vec_id < 10 AND crn <= 2
      |), pqv AS (
      |  SELECT vec_id AS query_id, e AS qe, vn AS qn FROM cells WHERE vec_id < 10
      |), qmu AS (
      |  SELECT plq.vec_id AS query_id, mlong.cell_label, SUM(plq.xq * mlong.m) AS qmu
      |  FROM plq JOIN mlong ON plq.sp = mlong.sp AND plq.p = mlong.p
      |  WHERE plq.vec_id < 10
      |  GROUP BY 1, 2
      |), rlut AS (
      |  SELECT plq.vec_id AS query_id, plq.sp, $rqBook.cell AS cw,
      |    SUM(plq.xq * $rqBook.c) AS ip
      |  FROM plq JOIN $rqBook ON plq.sp = $rqBook.sp AND plq.p = $rqBook.p
      |  WHERE plq.vec_id < 10
      |  GROUP BY 1, 2, 3
      |), rcand AS (
      |  SELECT pprobes.query_id, cells.vec_id AS neighbor_id, cells.vn AS cn,
      |    cells.cell
      |  FROM pprobes JOIN cells ON pprobes.pcell = cells.cell
      |    AND pprobes.query_id <> cells.vec_id
      |), radc AS (
      |  SELECT a.query_id, a.neighbor_id, a.cn, a.cell, a.lutsum, qmu.qmu
      |  FROM (
      |    SELECT rcand.query_id, rcand.neighbor_id, rcand.cn, rcand.cell,
      |      SUM(rlut.ip) AS lutsum
      |    FROM rcand JOIN rcode ON rcand.neighbor_id = rcode.neighbor_id
      |      JOIN rlut ON rcand.query_id = rlut.query_id
      |        AND rcode.sp = rlut.sp AND rcode.cw = rlut.cw
      |    GROUP BY 1, 2, 3, 4) a
      |  JOIN qmu ON a.query_id = qmu.query_id AND a.cell = qmu.cell_label
      |), rpool AS (
      |  SELECT radc.query_id, radc.neighbor_id,
      |    CAST(radc.qmu + radc.lutsum AS DOUBLE) / (pqv.qn * radc.cn) AS adc_raw
      |  FROM radc JOIN pqv ON radc.query_id = pqv.query_id
      |), rshort AS (
      |  SELECT query_id, neighbor_id, adc_raw FROM rpool
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY adc_raw DESC, neighbor_id ASC) <= 16
      |), rranked AS (
      |  SELECT rshort.query_id, rshort.neighbor_id, rshort.adc_raw,
      |    list_sum(list_transform(list_zip(pqv.qe, cells.e), x -> x[1] * x[2])) / (pqv.qn * cells.vn) AS score_raw,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY rshort.query_id ORDER BY
      |      list_sum(list_transform(list_zip(pqv.qe, cells.e), x -> x[1] * x[2])) / (pqv.qn * cells.vn) DESC,
      |      rshort.neighbor_id ASC) AS INT) AS rn
      |  FROM rshort JOIN pqv ON rshort.query_id = pqv.query_id
      |    JOIN cells ON rshort.neighbor_id = cells.vec_id
      |)""".stripMargin
  }

  /** Scalar-quantizer oracle pipeline through its `sranked` CTE — DuckDB
    * twin of [[ivfSqRanked]]: per-dim [min,max] on the dec4 grid, 8-bit
    * codes by round-half-up integer division (floor of a double division
    * proven exact — see the Spark-side scaladoc), dequantized-numerator
    * ADC dot over the probed cells, exact re-rank of the ADC top-16. */
  private lazy val duckIvfSqCtes: String = duckIvfSqCtesTrain("")

  /** [[duckIvfSqCtes]] with the grid/Lloyd TRAINING population restricted
    * by `trainWhere` ("" = the certified full-train path, byte-identical
    * text). Only `sstat` — the per-dim [min,max] grid — trains on the
    * sample; the encode (`snq`) and scan always read the full corpus,
    * mirroring [[ivfSqRanked]]'s trainSample path (out-of-grid full-corpus
    * dims saturate to the sampled grid edges, the published SQ8 clamp). */
  private def duckIvfSqCtesTrain(trainWhere: String): String = {
    val statSrc = if (trainWhere.isEmpty) "slf"
      else "slf JOIN stsel ON slf.vec_id = stsel.vec_id"
    val tsel = if (trainWhere.isEmpty) "" else s""", stsel AS (
      |  SELECT vec_id FROM embeddings$trainWhere
      |)""".stripMargin
    s"""${duckIvfBaseCtesTrain(trainWhere)}, slf AS (
      |  SELECT vec_id, CAST(dim AS INT) AS dim,
      |    CAST(floor(CAST(x AS DOUBLE)*10000+0.5) AS BIGINT) AS xi
      |  FROM (SELECT vec_id, unnest(embedding) AS x,
      |          unnest(generate_series(1, len(embedding))) AS dim
      |        FROM embeddings)
      |)$tsel, sstat AS (
      |  SELECT dim, MIN(xi) AS mi, MAX(xi) AS ma FROM $statSrc GROUP BY dim
      |), snq AS (
      |  SELECT vec_id, list(CAST(nq AS DOUBLE) ORDER BY dim) AS nqa FROM (
      |    SELECT slf.vec_id, slf.dim,
      |      255 * sstat.mi + (CASE WHEN sstat.ma = sstat.mi THEN 0
      |        ELSE GREATEST(0, LEAST(255, CAST(floor(CAST((slf.xi - sstat.mi) * 510 + (sstat.ma - sstat.mi) AS DOUBLE)
      |          / CAST((sstat.ma - sstat.mi) * 2 AS DOUBLE)) AS BIGINT))) END) * (sstat.ma - sstat.mi) AS nq
      |    FROM slf JOIN sstat ON slf.dim = sstat.dim)
      |  GROUP BY vec_id
      |), sqx AS (
      |  SELECT vec_id AS query_id, list(CAST(xi AS DOUBLE) ORDER BY dim) AS qxa
      |  FROM slf WHERE vec_id < 10 GROUP BY vec_id
      |), sprobes AS (
      |  SELECT vec_id AS query_id, cell_label AS pcell
      |  FROM assigned WHERE vec_id < 10 AND crn <= 2
      |), sqv AS (
      |  SELECT vec_id AS query_id, e AS qe, vn AS qn FROM cells WHERE vec_id < 10
      |), spool AS (
      |  SELECT sprobes.query_id, cells.vec_id AS neighbor_id,
      |    list_sum(list_transform(list_zip(sqx.qxa, snq.nqa), x -> x[1] * x[2]))
      |      / 25500000000.0 / (sqv.qn * cells.vn) AS adc_raw
      |  FROM sprobes JOIN cells ON sprobes.pcell = cells.cell
      |      AND sprobes.query_id <> cells.vec_id
      |    JOIN snq ON cells.vec_id = snq.vec_id
      |    JOIN sqx ON sprobes.query_id = sqx.query_id
      |    JOIN sqv ON sprobes.query_id = sqv.query_id
      |), sshort AS (
      |  SELECT query_id, neighbor_id, adc_raw FROM spool
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY adc_raw DESC, neighbor_id ASC) <= 16
      |), sranked AS (
      |  SELECT sshort.query_id, sshort.neighbor_id, sshort.adc_raw,
      |    list_sum(list_transform(list_zip(sqv.qe, cells.e), x -> x[1] * x[2])) / (sqv.qn * cells.vn) AS score_raw,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY sshort.query_id ORDER BY
      |      list_sum(list_transform(list_zip(sqv.qe, cells.e), x -> x[1] * x[2])) / (sqv.qn * cells.vn) DESC,
      |      sshort.neighbor_id ASC) AS INT) AS rn
      |  FROM sshort JOIN sqv ON sshort.query_id = sqv.query_id
      |    JOIN cells ON sshort.neighbor_id = cells.vec_id
      |)""".stripMargin
  }

  /** CLS-1 oracle pipeline through its `z6` CTE — DuckDB twin of the
    * 5-round sparse relational GD (see the quality_lr query doc). Shared
    * by the gated apply and the `lr_eval` discrimination audit. */
  private lazy val duckLrCtes: String =
    """wrds AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        |), feat AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(g), 1, 2)) AS BIGINT) AS b
        |  FROM (
        |    SELECT doc_id, lang, unnest(list_concat(
        |      list_filter(ws, w -> w <> ''),
        |      list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
        |    )) AS g
        |    FROM wrds)
        |), pdc AS MATERIALIZED (
        |  SELECT doc_id, lang, b, COUNT(1) AS n FROM feat GROUP BY 1, 2, 3
        |), pdt AS (
        |  SELECT doc_id, SUM(n) AS tot FROM pdc GROUP BY doc_id
        |), pd AS MATERIALIZED (
        |  SELECT pdc.doc_id, pdc.lang,
        |    CASE WHEN pdc.lang = 'en' THEN 1.0 ELSE 0.0 END AS y, pdc.b,
        |    CAST(pdc.n AS DOUBLE) / CAST(pdt.tot AS DOUBLE) AS x
        |  FROM pdc JOIN pdt ON pdc.doc_id = pdt.doc_id
        |), nn AS MATERIALIZED (
        |  SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS nd FROM pd
        |), bs AS MATERIALIZED (
        |  SELECT b,
        |    CAST(SUM(CAST(floor((x)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE)/nd AS mu,
        |    CAST(SUM(CAST(floor((x*x)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE)/nd - mu*mu AS vr,
        |    CASE WHEN vr <= 0.0 THEN 1.0 ELSE sqrt(vr) END AS sd
        |  FROM pd, nn GROUP BY b, nd
        |), w0 AS MATERIALIZED (SELECT b, 0.0 AS w FROM bs
        |), s0 AS MATERIALIZED (SELECT 0.0 AS w0),
        |k1 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((w0.w * bs.mu / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS kk
        |  FROM w0 JOIN bs ON w0.b = bs.b
        |), z1 AS MATERIALIZED (
        |  SELECT pd.doc_id, pd.y,
        |    s0.w0 - CAST(k1.kk AS DOUBLE) + CAST(SUM(CAST(floor((w0.w * pd.x / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE) AS z
        |  FROM pd JOIN w0 ON pd.b = w0.b JOIN bs ON pd.b = bs.b, s0, k1
        |  GROUP BY pd.doc_id, pd.y, s0.w0, k1.kk
        |), p1 AS MATERIALIZED (
        |  SELECT doc_id, y, CAST(CAST(floor((1.0/(1.0+exp(-z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS p FROM z1
        |), r1 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((y - p)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS rr FROM p1
        |), g1 AS MATERIALIZED (
        |  SELECT pd.b, CAST(SUM(CAST(floor(((pd.y - p1.p) * pd.x)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sb
        |  FROM pd JOIN p1 ON pd.doc_id = p1.doc_id GROUP BY pd.b
        |), w1 AS MATERIALIZED (
        |  SELECT bs.b, CAST(CAST(floor((w0.w + 2.0*((CAST(g1.sb AS DOUBLE)/bs.sd - bs.mu/bs.sd*CAST(r1.rr AS DOUBLE))/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w
        |  FROM w0 JOIN bs ON w0.b = bs.b JOIN g1 ON bs.b = g1.b, r1, nn
        |), s1 AS MATERIALIZED (
        |  SELECT CAST(CAST(floor((s0.w0 + 2.0*(CAST(r1.rr AS DOUBLE)/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w0 FROM s0, r1, nn
        |),
        |k2 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((w1.w * bs.mu / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS kk
        |  FROM w1 JOIN bs ON w1.b = bs.b
        |), z2 AS MATERIALIZED (
        |  SELECT pd.doc_id, pd.y,
        |    s1.w0 - CAST(k2.kk AS DOUBLE) + CAST(SUM(CAST(floor((w1.w * pd.x / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE) AS z
        |  FROM pd JOIN w1 ON pd.b = w1.b JOIN bs ON pd.b = bs.b, s1, k2
        |  GROUP BY pd.doc_id, pd.y, s1.w0, k2.kk
        |), p2 AS MATERIALIZED (
        |  SELECT doc_id, y, CAST(CAST(floor((1.0/(1.0+exp(-z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS p FROM z2
        |), r2 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((y - p)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS rr FROM p2
        |), g2 AS MATERIALIZED (
        |  SELECT pd.b, CAST(SUM(CAST(floor(((pd.y - p2.p) * pd.x)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sb
        |  FROM pd JOIN p2 ON pd.doc_id = p2.doc_id GROUP BY pd.b
        |), w2 AS MATERIALIZED (
        |  SELECT bs.b, CAST(CAST(floor((w1.w + 2.0*((CAST(g2.sb AS DOUBLE)/bs.sd - bs.mu/bs.sd*CAST(r2.rr AS DOUBLE))/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w
        |  FROM w1 JOIN bs ON w1.b = bs.b JOIN g2 ON bs.b = g2.b, r2, nn
        |), s2 AS MATERIALIZED (
        |  SELECT CAST(CAST(floor((s1.w0 + 2.0*(CAST(r2.rr AS DOUBLE)/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w0 FROM s1, r2, nn
        |),
        |k3 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((w2.w * bs.mu / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS kk
        |  FROM w2 JOIN bs ON w2.b = bs.b
        |), z3 AS MATERIALIZED (
        |  SELECT pd.doc_id, pd.y,
        |    s2.w0 - CAST(k3.kk AS DOUBLE) + CAST(SUM(CAST(floor((w2.w * pd.x / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE) AS z
        |  FROM pd JOIN w2 ON pd.b = w2.b JOIN bs ON pd.b = bs.b, s2, k3
        |  GROUP BY pd.doc_id, pd.y, s2.w0, k3.kk
        |), p3 AS MATERIALIZED (
        |  SELECT doc_id, y, CAST(CAST(floor((1.0/(1.0+exp(-z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS p FROM z3
        |), r3 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((y - p)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS rr FROM p3
        |), g3 AS MATERIALIZED (
        |  SELECT pd.b, CAST(SUM(CAST(floor(((pd.y - p3.p) * pd.x)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sb
        |  FROM pd JOIN p3 ON pd.doc_id = p3.doc_id GROUP BY pd.b
        |), w3 AS MATERIALIZED (
        |  SELECT bs.b, CAST(CAST(floor((w2.w + 2.0*((CAST(g3.sb AS DOUBLE)/bs.sd - bs.mu/bs.sd*CAST(r3.rr AS DOUBLE))/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w
        |  FROM w2 JOIN bs ON w2.b = bs.b JOIN g3 ON bs.b = g3.b, r3, nn
        |), s3 AS MATERIALIZED (
        |  SELECT CAST(CAST(floor((s2.w0 + 2.0*(CAST(r3.rr AS DOUBLE)/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w0 FROM s2, r3, nn
        |),
        |k4 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((w3.w * bs.mu / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS kk
        |  FROM w3 JOIN bs ON w3.b = bs.b
        |), z4 AS MATERIALIZED (
        |  SELECT pd.doc_id, pd.y,
        |    s3.w0 - CAST(k4.kk AS DOUBLE) + CAST(SUM(CAST(floor((w3.w * pd.x / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE) AS z
        |  FROM pd JOIN w3 ON pd.b = w3.b JOIN bs ON pd.b = bs.b, s3, k4
        |  GROUP BY pd.doc_id, pd.y, s3.w0, k4.kk
        |), p4 AS MATERIALIZED (
        |  SELECT doc_id, y, CAST(CAST(floor((1.0/(1.0+exp(-z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS p FROM z4
        |), r4 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((y - p)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS rr FROM p4
        |), g4 AS MATERIALIZED (
        |  SELECT pd.b, CAST(SUM(CAST(floor(((pd.y - p4.p) * pd.x)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sb
        |  FROM pd JOIN p4 ON pd.doc_id = p4.doc_id GROUP BY pd.b
        |), w4 AS MATERIALIZED (
        |  SELECT bs.b, CAST(CAST(floor((w3.w + 2.0*((CAST(g4.sb AS DOUBLE)/bs.sd - bs.mu/bs.sd*CAST(r4.rr AS DOUBLE))/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w
        |  FROM w3 JOIN bs ON w3.b = bs.b JOIN g4 ON bs.b = g4.b, r4, nn
        |), s4 AS MATERIALIZED (
        |  SELECT CAST(CAST(floor((s3.w0 + 2.0*(CAST(r4.rr AS DOUBLE)/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w0 FROM s3, r4, nn
        |),
        |k5 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((w4.w * bs.mu / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS kk
        |  FROM w4 JOIN bs ON w4.b = bs.b
        |), z5 AS MATERIALIZED (
        |  SELECT pd.doc_id, pd.y,
        |    s4.w0 - CAST(k5.kk AS DOUBLE) + CAST(SUM(CAST(floor((w4.w * pd.x / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE) AS z
        |  FROM pd JOIN w4 ON pd.b = w4.b JOIN bs ON pd.b = bs.b, s4, k5
        |  GROUP BY pd.doc_id, pd.y, s4.w0, k5.kk
        |), p5 AS MATERIALIZED (
        |  SELECT doc_id, y, CAST(CAST(floor((1.0/(1.0+exp(-z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS p FROM z5
        |), r5 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((y - p)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS rr FROM p5
        |), g5 AS MATERIALIZED (
        |  SELECT pd.b, CAST(SUM(CAST(floor(((pd.y - p5.p) * pd.x)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sb
        |  FROM pd JOIN p5 ON pd.doc_id = p5.doc_id GROUP BY pd.b
        |), w5 AS MATERIALIZED (
        |  SELECT bs.b, CAST(CAST(floor((w4.w + 2.0*((CAST(g5.sb AS DOUBLE)/bs.sd - bs.mu/bs.sd*CAST(r5.rr AS DOUBLE))/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w
        |  FROM w4 JOIN bs ON w4.b = bs.b JOIN g5 ON bs.b = g5.b, r5, nn
        |), s5 AS MATERIALIZED (
        |  SELECT CAST(CAST(floor((s4.w0 + 2.0*(CAST(r5.rr AS DOUBLE)/nn.nd))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS w0 FROM s4, r5, nn
        |),
        |k6 AS MATERIALIZED (
        |  SELECT CAST(SUM(CAST(floor((w5.w * bs.mu / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS kk
        |  FROM w5 JOIN bs ON w5.b = bs.b
        |), z6 AS MATERIALIZED (
        |  SELECT pd.doc_id, pd.lang,
        |    s5.w0 - CAST(k6.kk AS DOUBLE) + CAST(SUM(CAST(floor((w5.w * pd.x / bs.sd)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE) AS z
        |  FROM pd JOIN w5 ON pd.b = w5.b JOIN bs ON pd.b = bs.b, s5, k6
        |  GROUP BY pd.doc_id, pd.lang, s5.w0, k6.kk
        |)""".stripMargin

  private lazy val duckIvfSqSql: String =
    s"""WITH $duckIvfSqCtes
      |SELECT query_id, rn, neighbor_id,
      |  CAST(CAST(floor((adc_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS adc,
      |  CAST(CAST(floor((score_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS score
      |FROM sranked WHERE rn <= 3
      |ORDER BY query_id NULLS FIRST, rn NULLS FIRST, neighbor_id NULLS FIRST, adc NULLS FIRST, score NULLS FIRST""".stripMargin

  private lazy val duckIvfCtes: String =
    s"""$duckIvfBaseCtes, probes AS (
      |  SELECT vec_id AS query_id, e AS qe, vn AS qn, cell_label AS pcell
      |  FROM assigned WHERE vec_id < 10 AND crn <= 2
      |), ranked AS (
      |  SELECT p.query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(list_zip(p.qe, c.e), x -> x[1] * x[2])) / (p.qn * c.vn) AS score_raw,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
      |      list_sum(list_transform(list_zip(p.qe, c.e), x -> x[1] * x[2])) / (p.qn * c.vn) DESC,
      |      c.vec_id ASC) AS INT) AS rn
      |  FROM probes p JOIN cells c ON p.pcell = c.cell AND p.query_id <> c.vec_id
      |)""".stripMargin

  private val duckToks =
    "SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents"
  private val duckTokHash =
    """SELECT doc_id, lang, list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 2147483647) AS h
      |  FROM (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS tok
      |        FROM documents)""".stripMargin
  // Word-bigram shingle twins (see `shingles`): the minhash family sketches
  // and verifies over shingle sets, spelled identically to ddp_ngram's grams.
  private val duckGrams =
    """list_distinct(list_transform(
      |    range(1, len(string_split(text, ' '))),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))""".stripMargin
  private val duckShingles =
    s"SELECT doc_id, lang, $duckGrams AS toks FROM documents"
  private val duckShingleHash =
    s"""SELECT doc_id, lang, list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 2147483647) AS h
      |  FROM (SELECT doc_id, lang, unnest($duckGrams) AS tok
      |        FROM documents)""".stripMargin

  /** Shared BM25 scorer (BM25-1/BM25-2): Lucene BM25 (k1=1.2, b=0.75)
    * of the corpus-derived query set (doc_id % 100 == 7; terms = the
    * distinct set of the doc's first 5 tokens, so repeats shrink the
    * query) against every corpus doc sharing a term, self-matches
    * excluded. Returns `(q_id, doc_id, score DECIMAL(38,4), n_terms)` —
    * un-ranked, so recall-stage callers pick their own k. Per-term double
    * scores are tie-safe dec4-rounded then summed as exact DECIMAL
    * (dsum4) and avgdl is dec4'd, keeping engine and oracle rank-stable.
    * Scale shape: the tf group-by (map-side combined) is the only
    * corpus-sized shuffle; query terms, the vocab-sized df table, per-doc
    * lengths (at this SF), and the 1-row (N, avgdl) scalar broadcast. */
  private def bm25Scored(doc: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val toks = doc.select(col("doc_id"), explode(words).as("t"))
    // Materialized once: probed by the query join AND aggregated for df.
    val tf = toks.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      .pinned
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val dl = doc.select(col("doc_id"), size(words).cast("double").as("dl"))
    val stats = doc.agg(count(lit(1)).cast("double").as("n_docs"),
      dec4(sum(dec(size(words))).cast("double") / count(lit(1)))
        .cast("double").as("avgdl"))
    val q = doc.filter(col("doc_id") % 100 === 7)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(slice(words, 1, 5))).as("t"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfc = col("tf").cast("double") * lit(2.2) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    broadcast(q).join(tf, Seq("t"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(broadcast(dl), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .join(broadcast(dfreq), Seq("t"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(dsum4(idf * tfc).as("score"), count(lit(1)).as("n_terms"))
  }

  /** BM25 recall list shared by RRF-1 and HN-1: top-10 per query with
    * rank — (q_id, doc_id, r_bm25). ONE copy of the lexical-stage
    * scaffold (query predicate, tie-break, k), so the fusion and mining
    * queries cannot drift from each other or their oracles. */
  private def bm25Top10(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    bm25Scored(spread(load(s, d, "documents")))
      .withColumn("r_bm25", row_number().over(w))
      .filter(col("r_bm25") <= 10)
      .select(col("q_id"), col("doc_id"), col("r_bm25"))
  }

  /** Dense retrieval stage shared by RRF-1 and HN-1: per query (vec_id %
    * 100 == 7), the cosine top-10 corpus vectors (self excluded) with
    * rank — (q_id, doc_id, r_cos, cos_raw). The brute-force query×corpus
    * probe (sim1 shape) at test SF; IVF/LSH candidates at 100 TB.
    * retrieve_rerank's dense stage is deliberately NOT this — it scores
    * only its recalled candidates. */
  private def denseTop10(s: SparkSession, d: String): DataFrame = {
    val emb = load(s, d, "embeddings")
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val base = emb.select(col("vec_id"), dbl.as("e"),
      sqrt(dot_product(dbl, dbl)).as("nrm"))
    val qe = base.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("doc_id").asc)
    base.select(col("vec_id").as("doc_id"), col("e").as("de"), col("nrm").as("dn"))
      .join(broadcast(qe), col("doc_id") =!= col("q_id"))
      .withColumn("cos_raw", dot_product(col("qe"), col("de")) / (col("qn") * col("dn")))
      .withColumn("r_cos", row_number().over(w))
      .filter(col("r_cos") <= 10)
      .select(col("q_id"), col("doc_id"), col("r_cos"), col("cos_raw"))
  }

  /** DuckDB twin of [[bm25Top10]] + [[denseTop10]] — CTE block (appended
    * after `duckBm25Ctes`) ending in `rb10(q_id, doc_id, r_bm25)` and
    * `rd10(q_id, doc_id, r_cos, cos_raw)`, shared by the retrieve_rrf and
    * hard_negatives oracles. */
  private lazy val duckTop10Ctes: String =
    """rb AS (
      |  SELECT q_id, doc_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS INT) AS r_bm25
      |  FROM scored),
      |rb10 AS (SELECT q_id, doc_id, r_bm25 FROM rb WHERE r_bm25 <= 10),
      |eb AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |qv AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM eb WHERE vec_id % 100 = 7),
      |cosall AS (
      |  SELECT qv.q_id, eb.vec_id AS doc_id,
      |    list_sum(list_transform(list_zip(qv.qe, eb.e), p -> p[1] * p[2])) / (qv.qn * eb.nrm) AS cos_raw
      |  FROM qv JOIN eb ON eb.vec_id <> qv.q_id),
      |rd AS (
      |  SELECT q_id, doc_id, cos_raw,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, doc_id ASC) AS INT) AS r_cos
      |  FROM cosall),
      |rd10 AS (SELECT q_id, doc_id, r_cos, cos_raw FROM rd WHERE r_cos <= 10)""".stripMargin

  /** DuckDB twin of [[bm25Scored]] — CTE block ending in
    * `scored(q_id, doc_id, score, n_terms)`, shared by the bm25 and
    * retrieve_rerank oracles. */
  private val duckBm25Ctes: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(1) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT t, COUNT(1) AS df FROM tf GROUP BY 1),
      |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents),
      |stats AS (
      |  SELECT CAST(COUNT(1) AS DOUBLE) AS n_docs,
      |    CAST(CAST(floor((CAST(SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS avgdl
      |  FROM documents),
      |q AS (
      |  SELECT doc_id AS q_id,
      |    unnest(list_distinct(list_slice(string_split(text, ' '), 1, 5))) AS t
      |  FROM documents WHERE doc_id % 100 = 7),
      |cand AS (
      |  SELECT q.q_id, tf.doc_id, tf.tf, dl.dl, dfreq.df, s.n_docs, s.avgdl
      |  FROM q JOIN tf USING (t) JOIN dl ON tf.doc_id = dl.doc_id
      |    JOIN dfreq ON tf.t = dfreq.t CROSS JOIN stats s
      |  WHERE tf.doc_id <> q.q_id),
      |term AS (
      |  SELECT q_id, doc_id,
      |    CAST(floor((ln(1.0 + (n_docs - df + 0.5)/(df + 0.5)) *
      |      (CAST(tf AS DOUBLE)*2.2 /
      |       (CAST(tf AS DOUBLE) + 1.2*(0.25 + 0.75*dl/avgdl))))*10000+0.5)/10000 AS DECIMAL(38,4)) AS ts
      |  FROM cand),
      |scored AS (
      |  SELECT q_id, doc_id, CAST(SUM(ts) AS DECIMAL(38,4)) AS score,
      |    COUNT(1) AS n_terms
      |  FROM term GROUP BY 1, 2)""".stripMargin

  /** The certified SIM-1 IVF pipeline (label-centroid cells, 2-probe
    * search), shared verbatim by `sim1_ivf` (rounded/rendered output) and
    * `ivf_eval` (the recall audit joins its raw (query, neighbor) pairs
    * against brute-force truth). Returns the per-query top-3 as
    * (query_id, rn, neighbor_id, score_raw). */
  /** Lloyd-TRAINED coarse quantizer for the IVF family (r11, the r10
    * verdict's task 2): two Lloyd rounds over the embeddings — k = 10
    * deterministic seeds (vec_id < 10), squared-L2 assignment with the
    * (dist asc, cid asc) tie-break, per-dim dec4-quantized exact-decimal
    * mean updates — `kmeans_iter`'s certified discipline verbatim, so
    * both engines hold bit-identical centroids at every round. Returns
    * the round-2 centroid table (cell_label, ce: array<double>).
    *
    * This REPLACES the label-mean centroids the family trained on through
    * r10: document labels explain almost no variance on this corpus, so
    * label-mean cells measured recall@3 0.43 (IVF) / 0.37 (IVF-PQ) at
    * nprobe=2 — the trained cells measure 0.93+ at the same probe budget
    * (the audits `ivf_eval`/`ivf_pq_eval` now read the lift). Scale: each
    * Lloyd round is one vectors × broadcast-k cross (the whitelisted
    * assignment shape, argmin via a per-vector WindowGroupLimit) plus one
    * 64-column map-side-combined aggregate — exactly two extra linear
    * passes at any corpus size; at 100 TB retraining stays this batch job
    * (republished via Snapshot) while STR-IVF maintains the lists
    * between retrains. An empty cell (a seed losing every member) drops
    * out of the group-by on both engines identically. */
  /** The bounded deterministic TRAINING sample of an embeddings table —
    * the quantizer family's 100 TB lever (r12 verdict task 1, the Faiss
    * train-on-sample story): quantizer metadata (Lloyd cells, PQ
    * codebooks, the SQ8 grid) is fit on this slice and the FULL corpus
    * is encoded against the fixed metadata, so the training term stops
    * scaling with the corpus. Selection is CONTENT-keyed (the
    * `quality_lr` train-on-sample discipline, SMP-1's rationale —
    * duplicate vectors co-locate on one side of the cut): a vector is
    * in-sample iff the sum of its dec4-grid components
    * Σ_d floor(x_d·10⁴ + 0.5) is EVEN — an exact-int64 predicate spelled
    * identically in DuckDB (`list_sum(list_transform(…)) % 2 = 0`), ~50%
    * of any corpus. The k seed vectors (vec_id < 10 — the same id-keyed
    * seed rule the full-train path uses) ride along so seeding is
    * SHARED between the two paths and only the refinement population
    * differs. */
  private[graft] def embSampleTrain(emb: DataFrame): DataFrame = {
    val xiSum = aggregate(
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    emb.filter(pmod(xiSum, lit(2)) === 0 || col("vec_id") < 10)
  }

  /** The DuckDB spelling of [[embSampleTrain]]'s predicate. */
  private lazy val duckSampleWhere: String =
    "WHERE list_sum(list_transform(embedding, " +
      "x -> CAST(floor(CAST(x AS DOUBLE)*10000+0.5) AS BIGINT))) % 2 = 0 " +
      "OR vec_id < 10"

  /** The FIXED-SIZE training-sample cap (r13 verdict task 1 — the knob
    * [[embSampleTrain]]'s rate-keyed slice left declared-not-executed):
    * production quantizer training must stop scaling with the corpus, so
    * the training population is the K vectors with the SMALLEST portable
    * content hash (the 31-poly mod 2³¹−1 fold over the exact dec4 int64
    * dims — pseudo-random w.r.t. content, identical in both engines),
    * ties broken by vec_id, plus the 10 seed vectors riding along exactly
    * as on the rate-keyed path. K binds at every SF here (256 < 500);
    * at 10⁹ vectors the same K keeps the training job CONSTANT while the
    * encode/search legs stay scan-proportional — the Faiss
    * train-on-sample discipline with the sample size pinned. */
  private[graft] val capTrainK: Int = 256

  /** Portable content hash of a vector: fold the exact dec4 int64 dims as
    * (acc·31 + pmod(xi, P)) mod P — the string 31-poly (txt_fingerprint)
    * applied to the dimension stream. Exact int64 arithmetic end to end
    * (acc < P, term < P ⇒ acc·31 + term < 2³⁶), bit-identical in DuckDB's
    * list_reduce spelling ([[duckCapHash]]). */
  private def capHashCol: Column = aggregate(
    transform(col("embedding"), x =>
      pmod(floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("long"),
        lit(2147483647L))),
    lit(0L), (acc, c) => (acc * lit(31L) + c) % lit(2147483647L))

  /** The capped training slice: seeds ∪ top-[[capTrainK]] by
    * (content hash asc, vec_id asc). The threshold is the K-th smallest
    * (hash, vec_id) pair — computed as a TakeOrderedAndProject (per-
    * partition top-K heap + driver merge, NEVER a global sort) and
    * broadcast back over the scan, so the whole selection is one bounded
    * take + one scan-level filter at any corpus size. A corpus smaller
    * than K passes entirely (the threshold is then the global max). */
  private[graft] def embCapTrain(emb: DataFrame): DataFrame = {
    val hh = emb.select(capHashCol.as("ch"), col("vec_id"))
    val thr = hh.orderBy(col("ch").asc, col("vec_id").asc).limit(capTrainK)
      .agg(max(struct(col("ch"), col("vec_id"))).as("t"))
      .select(col("t.ch").as("ht"), col("t.vec_id").as("vt"))
    emb.withColumn("ch", capHashCol).crossJoin(broadcast(thr))
      .filter(col("vec_id") < 10 || col("ch") < col("ht") ||
        (col("ch") === col("ht") && col("vec_id") <= col("vt")))
      .select(emb.columns.map(col).toSeq: _*)
  }

  /** [[capHashCol]]'s DuckDB spelling (shared 31-poly constants). */
  private lazy val duckCapHash: String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(embedding, " +
      "x -> ((CAST(floor(CAST(x AS DOUBLE)*10000+0.5) AS BIGINT) % 2147483647) " +
      "+ 2147483647) % 2147483647)), (acc, c) -> (acc * 31 + c) % 2147483647)"

  /** [[embCapTrain]]'s DuckDB twin: the identical threshold row (K-th
    * smallest (hash, vec_id)) via ORDER BY … LIMIT 1 OFFSET K−1, then the
    * same seeds-∪-under-threshold predicate. COALESCE covers the
    * corpus-smaller-than-K edge (empty OFFSET ⇒ NULL ⇒ everything
    * passes), matching the Spark path's global-max threshold. */
  private lazy val duckCapWhere: String = {
    val thr = s"(SELECT $duckCapHash AS ch, vec_id AS cvid FROM embeddings " +
      s"ORDER BY 1 ASC, 2 ASC LIMIT 1 OFFSET ${capTrainK - 1})"
    s"WHERE vec_id < 10 OR $duckCapHash < COALESCE((SELECT ch FROM $thr t1), 9223372036854775807) " +
      s"OR ($duckCapHash = (SELECT ch FROM $thr t2) AND vec_id <= (SELECT cvid FROM $thr t3))"
  }

  /** The corpus Lloyd centroid table, memoized per (process, corpus) via
    * Warehouse.once (gramBucketsOnce's rationale applied to the index
    * family): ~12 gated IVF/PQ queries each re-ran the two certified
    * Lloyd rounds on the same corpus; the table is ten rows of
    * deterministic dec4-quantized doubles — EXACTLY the published index
    * metadata the lifecycle tests Snapshot-round-trip — so one training
    * job + shared reads is both pure caching (bit-identical values,
    * oracles unchanged) and the production shape. */
  private def centroidsOnce(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Warehouse.once(d, "ivf_centroids") { out =>
      ivfKmeansCentroidsFrom(load(s, d, "embeddings"))
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  /** The corpus PQ codebook (xq space), memoized like [[centroidsOnce]] —
    * ≤ 1024 rows of exact DECIMAL(18,4) codewords, the other half of the
    * published index metadata. */
  private def pqBookOnce(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Warehouse.once(d, "pq_book_xq") { out =>
      graft.operators.PqEncode.codebook(
        graft.operators.PqEncode.toLong(load(s, d, "embeddings")), "xq")
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  /** The SAMPLE-trained metadata pair (Lloyd cells + PQ codebook fit on
    * [[embSampleTrain]]'s slice), memoized exactly like the full-train
    * pair — the sample-trained index is published metadata in precisely
    * the same way, and the train-once/read-everywhere shape IS the
    * 100 TB story the SIM-SAMPLE audits price. */
  private def centroidsSampleOnce(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Warehouse.once(d, "ivf_centroids_sample") { out =>
      ivfKmeansCentroidsFrom(embSampleTrain(load(s, d, "embeddings")))
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  private def pqBookSampleOnce(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Warehouse.once(d, "pq_book_xq_sample") { out =>
      graft.operators.PqEncode.codebook(
        graft.operators.PqEncode.toLong(
          embSampleTrain(load(s, d, "embeddings"))), "xq")
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  /** The CAP-trained metadata pair ([[embCapTrain]]'s fixed-size slice),
    * memoized like the other two pairs — the bounded-training-job index
    * metadata the SIM-CAP audits price. */
  private def centroidsCapOnce(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Warehouse.once(d, "ivf_centroids_cap") { out =>
      ivfKmeansCentroidsFrom(embCapTrain(load(s, d, "embeddings")))
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  private def pqBookCapOnce(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Warehouse.once(d, "pq_book_xq_cap") { out =>
      graft.operators.PqEncode.codebook(
        graft.operators.PqEncode.toLong(
          embCapTrain(load(s, d, "embeddings"))), "xq")
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  /** Assignment centroids unnested to LONG decimal form (cell, sp, p,
    * dec4 m) — the residual family's μ table, shared by the q·μ leg and
    * the residual join (see ivfPqResRanked's centering note: with the
    * Lloyd flip the residual μ and the coarse quantizer are ONE table). */
  private def resCentLong(centTab: DataFrame): DataFrame =
    centTab
      .select(col("cell_label"), posexplode(col("ce")).as(Seq("pos", "m0")))
      .select(col("cell_label"),
        (floor(col("pos") / 8) + 1).cast("int").as("sp"),
        (col("pos") % 8 + 1).cast("int").as("p"),
        col("m0").cast(DecimalType(18, 4)).as("m"))

  /** Exact-decimal residuals r = xq − μ_cell(v) from caller-supplied
    * frames — one definition for the training build ([[resBookOnce]])
    * and the per-call encode leg (ivfPqResRanked), so they cannot
    * drift. */
  private def resLongFrom(long: DataFrame, cells: DataFrame,
      centLong: DataFrame): DataFrame =
    long
      .join(cells.select(col("vec_id"), col("cell_label")), Seq("vec_id"))
      .join(broadcast(centLong), Seq("cell_label", "sp", "p"))
      .select(col("vec_id"), col("sp"), col("p"),
        (col("xq") - col("m")).cast(DecimalType(18, 4)).as("r"))

  /** The RESIDUAL-space PQ codebook, memoized like [[pqBookOnce]] (r14:
    * the residual pair was the last quantizer family still retraining
    * per call — both gated consumers re-ran the Lloyd refinement on the
    * same corpus every time). The residual frame is deterministic given
    * the corpus (memoized assignment centroids, exact decimal
    * subtraction), so one training job serves `ivf_pq_res` and
    * `ivf_pq_res_eval` bit-identically — published index metadata
    * exactly like the xq-space books. */
  private def resBookOnce(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Warehouse.once(d, "pq_book_res") { out =>
      val long = graft.operators.PqEncode.toLong(load(s, d, "embeddings"))
      val centTab = centroidsOnce(s, d)
      val cells = ivfAssignedWith(s, d, centTab).filter(col("crn") === 1)
      val rlong = resLongFrom(long, cells, resCentLong(centTab)).pinned
      graft.operators.PqEncode.codebook(rlong, "r")
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  /** Training-population selector shared by the quantizer pipelines:
    * "full" (the certified path), "sample" ([[embSampleTrain]]'s rate-
    * keyed ~50% parity slice), "cap" ([[embCapTrain]]'s fixed-size
    * content-hash top-K slice). Encode/search always read the full
    * corpus; only the trained metadata differs. */
  private def trainSlice(pop: String, emb: DataFrame): DataFrame = pop match {
    case "sample" => embSampleTrain(emb)
    case "cap"    => embCapTrain(emb)
    case "full"   => emb
    case other => throw new IllegalArgumentException(
      s"unknown training population '$other' (full|sample|cap)")
  }

  private def centroidsFor(s: SparkSession, d: String, pop: String): DataFrame =
    pop match {
      case "sample" => centroidsSampleOnce(s, d)
      case "cap"    => centroidsCapOnce(s, d)
      case _        => centroidsOnce(s, d)
    }

  private def pqBookFor(s: SparkSession, d: String, pop: String): DataFrame =
    pop match {
      case "sample" => pqBookSampleOnce(s, d)
      case "cap"    => pqBookCapOnce(s, d)
      case _        => pqBookOnce(s, d)
    }

  /** The Lloyd trainer over a caller-supplied TRAINING embeddings
    * frame — the full table on the certified path ([[centroidsOnce]]),
    * [[embSampleTrain]]'s slice on the sample-train path (assignment of
    * the full corpus against the sample-trained table stays
    * [[ivfAssignedWith]]). */
  private def ivfKmeansCentroidsFrom(emb: DataFrame): DataFrame = {
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val base = spread(emb, "vec_id").select(col("vec_id"), dbl.as("v"),
        dot_product(dbl, dbl).as("vv"))
      .pinned
    // Argmin as min(struct(dist, cid, v)) — struct order IS the
    // (dist asc, cid asc) tie-break (cid is unique per vector's candidate
    // set, so the trailing v never decides) and the aggregate
    // partial-combines map-side, unlike a sort-based row_number window
    // over the vectors × k cross. Result-identical to the oracle's
    // ROW_NUMBER argmin.
    def assign(seeds: DataFrame): DataFrame =
      base.crossJoin(broadcast(seeds))
        .withColumn("dist",
          col("vv") + col("cc") - lit(2.0) * dot_product(col("v"), col("c")))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"), col("v"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"), col("m.v").as("v"))
    val centCols = (1 to 64).map { i =>
      dec4(dsum4(element_at(col("v"), i)).cast("double") / count(lit(1)))
        .cast("double").as(s"m$i")
    }
    def update(a: DataFrame): DataFrame =
      a.groupBy(col("cid")).agg(centCols.head, centCols.tail: _*)
        .select(col("cid"),
          array((1 to 64).map(i => col(s"m$i")): _*).as("c"))
        .withColumn("cc", dot_product(col("c"), col("c")))
    val seeds1 = base.filter(col("vec_id") < 10)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("c"),
        col("vv").as("cc"))
    update(assign(update(assign(seeds1))))
      .select(col("cid").as("cell_label"), col("c").as("ce"))
  }

  /** The IVF coarse-quantizer ASSIGNMENT shared by the whole IVF family
    * (`sim1_ivf`, `ivf_eval`, `ivf_curve`, `ivf_pq`): Lloyd-trained
    * centroids ([[ivfKmeansCentroidsFrom]]), every vector scored against the
    * broadcast centroid table, `crn` = that vector's cell preference rank
    * (crn=1 is its home cell; crn≤nprobe are a query's probe cells).
    * Columns: (vec_id, e, vn, cell_label, cscore, crn). */
  private def ivfAssigned(s: SparkSession, d: String): DataFrame =
    ivfAssignedWith(s, d, centroidsOnce(s, d))

  /** [[ivfAssigned]] against a caller-supplied centroid table — so a
    * pipeline that also needs the centroids themselves (the residual
    * variant's μ table) trains the Lloyd loop exactly once. */
  private def ivfAssignedWith(s: SparkSession, d: String,
      cent0: DataFrame): DataFrame = {
    val emb = load(s, d, "embeddings")
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val cent = cent0
      .withColumn("cn", sqrt(dot_product(col("ce"), col("ce"))))
    val vecs = emb.select(col("vec_id"), dbl.as("e"))
      .withColumn("vn", sqrt(dot_product(col("e"), col("e"))))
    // Shared assignment core (operators/IvfAssign): the cosine scoring and
    // the crn tie-break rule are the SAME code the streaming STR-IVF op
    // runs, so batch and streamed assignments cannot drift.
    graft.operators.IvfAssign.ranked(vecs, cent)
  }

  /** The certified SIM-1d IVF pipeline. `maxProbe` widens the probed-cell
    * set; `raw = true` returns the SCORED candidate pool with its
    * probe_rank (before the per-query top-k) — SIM-CURVE's input. */
  private def ivfRanked(s: SparkSession, d: String,
      maxProbe: Int = 2, raw: Boolean = false): DataFrame = {
    val assigned = ivfAssigned(s, d)
    val cells = assigned.filter(col("crn") === 1)
      .select(col("vec_id"), col("e"), col("vn"), col("cell_label").as("cell"))
    val probes = assigned.filter(col("vec_id") < 10 && col("crn") <= maxProbe)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("vn").as("qn"), col("cell_label").as("pcell"),
        col("crn").as("probe_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_raw").desc, col("neighbor_id").asc)
    val scored = broadcast(probes)
      .join(cells.select(col("vec_id").as("neighbor_id"), col("e").as("ce2"),
        col("vn").as("cn2"), col("cell")),
        col("pcell") === col("cell") && col("query_id") =!= col("neighbor_id"))
      .withColumn("score_raw",
        dot_product(col("qe"), col("ce2")) / (col("qn") * col("cn2")))
    if (raw)
      scored.select(col("query_id"), col("neighbor_id"),
        col("score_raw"), col("probe_rank"))
    else scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn"), col("neighbor_id"), col("score_raw"))
  }

  /** Brute-force cosine top-3 ground truth shared by every ANN recall
    * audit (`ivf_eval`, `ivf_curve`, `ivf_pq_eval`, `ivf_pq_curve`): the
    * broadcast-query exact leg (query-count-bounded by construction;
    * sample-able at 100 TB per ddp_eval's methodology). One definition so
    * the audits cannot diverge on the query bound or the tie-break. */
  private def bruteTruthTop3(s: SparkSession, d: String): DataFrame = {
    val emb = load(s, d, "embeddings")
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val base = emb.select(col("vec_id"), dbl.as("e"),
      sqrt(dot_product(dbl, dbl)).as("nrm"))
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val c = base.select(col("vec_id").as("neighbor_id"), col("e").as("ce"),
      col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_raw").desc, col("neighbor_id").asc)
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("score_raw",
        dot_product(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Per-query recall@3 of an approx (query_id, neighbor_id) pair set
    * against [[bruteTruthTop3]] — ivf_eval's audit rule, shared verbatim
    * by the IVF and IVF-PQ evals. */
  private def recallPerQuery(truth: DataFrame, approx: DataFrame): DataFrame =
    truth.join(
        approx.select(col("query_id").as("iq"), col("neighbor_id").as("in_")),
        col("query_id") === col("iq") && col("neighbor_id") === col("in_"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(col("iq")).cast("int").as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        dec4S(col("n_hit").cast("double") / lit(3.0)).as("recall"))

  /** IVF-PQ composed search — the billion-vector index layout assembled
    * from this repo's two certified halves: SIM-1d's IVF cells (coarse
    * quantizer: WHICH vectors to look at) and PQ-1's product-quantizer
    * codebooks (HOW to score them without touching the raw vectors).
    * The pipeline is the textbook IVFADC (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011) spelled
    * relationally:
    *
    *   1. TRAIN: PQ codebooks exactly as `vec_pq` (8 subspaces × ≤16
    *      sign-bucket-seeded codewords, dec4-quantized decimal
    *      centroids) and IVF cells exactly as [[ivfAssigned]].
    *   2. ENCODE: every vector → (cell, 8-byte PQ code + its exact norm).
    *      This is the ONLY per-vector state the search touches — at
    *      100 TB the raw vectors stay in cold storage; the inverted
    *      lists carry ~9 small values/vector.
    *   3. LUT: per query, one asymmetric-distance lookup table —
    *      ip(q, sp, codeword) = Σ_p q[sp,p]·c[sp,cw,p], a query×codebook
    *      join (≤ |queries|·8·16 rows, broadcast). Exact decimal sums.
    *   4. ADC SCAN: candidates from the query's 2 probe cells score as
    *      Σ_sp LUT(q, sp, code(v, sp)) / (‖q‖·‖v‖) — 8 table lookups
    *      per candidate, never a 64-dim dot product.
    *   5. RE-RANK: the ADC top-`shortlist` per query re-scores EXACTLY
    *      (raw-vector cosine) and emits the final top-3 — the standard
    *      refine step that caps ADC's quantization error at zero for
    *      the returned ranks.
    *
    * Determinism: LUT/ADC sums are exact DECIMAL folds (vec_pq's (18,4)
    * discipline: products at scale 8 never overflow 38); the only doubles
    * are single correctly-rounded divides by the two norms, and every
    * rank breaks ties by neighbor_id. Returns
    * (query_id, rn, neighbor_id, adc_raw, score_raw). */
  /** The IVFADC SEARCH tail — ADC scan over the probed cells + exact
    * re-rank — against a per-vector search-state relation
    * `state` = (neighbor_id, cell_label, sp, cw, vn): 8 rows per vector,
    * THE inverted-list layout. Shared verbatim by the batch pipeline
    * ([[ivfPqRanked]] assembles state from its own encode) and the
    * streamed-store parity query `ivf_pq_stream` (state read back from
    * STR-IVF's composed ingest), so the search side cannot drift between
    * the two index maintenance paths. `rerank` = (neighbor_id, ce2, cn2)
    * raw vectors — the cold-storage fetch, touched only for the ADC
    * top-`shortlist` rows per query. */
  private def ivfAdcSearchTail(state: DataFrame, probes: DataFrame,
      qv: DataFrame, qlut: DataFrame, rerank: DataFrame,
      shortlist: Int, raw: Boolean): DataFrame = {
    // --- ADC scan over the probed cells: 8 LUT lookups per candidate ---
    val cand = broadcast(probes).join(state,
      col("pcell") === col("cell_label") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("vn").as("cn"),
        col("sp"), col("cw"))
    val adc = cand
      .join(broadcast(qlut), Seq("query_id", "sp", "cw"))
      .groupBy(col("query_id"), col("neighbor_id"), col("cn"))
      .agg(sum(col("ip")).as("ipsum"))
    val pool = adc
      .join(broadcast(qv.select(col("query_id"), col("qn"))), Seq("query_id"))
      .withColumn("adc_raw", col("ipsum").cast("double") / (col("qn") * col("cn")))
    // `raw = true`: the ADC-scored candidate pool before any shortlist cut
    // — SIM-PQ-CURVE's input (scores don't change with the shortlist
    // length, only membership does, so the curve reuses ONE pool).
    if (raw)
      pool.select(col("query_id"), col("neighbor_id"),
        col("cn"), col("qn"), col("adc_raw"))
    else adcShortlistRerank(pool, qv, rerank, shortlist)
  }

  /** ADC-pool → shortlist → exact-re-rank tail shared by EVERY
    * approximate-scoring index variant (`ivf_pq`, `ivf_pq_res`,
    * `ivf_pq_stream` via [[ivfAdcSearchTail]]; `ivf_sq` directly): `pool`
    * = (query_id, neighbor_id, cn, qn, adc_raw) from ANY approximate
    * scorer — PQ lookup tables or SQ dequantized dots — shortlisted by
    * approximate score, the survivors re-scored EXACTLY (raw-vector
    * cosine against `rerank` = (neighbor_id, ce2, cn2), the cold-storage
    * fetch), final top-3 per query. One tail, so no variant can drift on
    * the shortlist or tie-break rules. */
  private def adcShortlistRerank(pool: DataFrame, qv: DataFrame,
      rerank: DataFrame, shortlist: Int): DataFrame = {
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_raw").desc, col("neighbor_id").asc)
    val short = pool
      .withColumn("srn", row_number().over(wAdc))
      .filter(col("srn") <= shortlist)
    // --- Exact re-rank of the shortlist only ---
    val wFin = Window.partitionBy(col("query_id"))
      .orderBy(col("score_raw").desc, col("neighbor_id").asc)
    short
      .join(rerank, Seq("neighbor_id"))
      // `short` already carries qn from the ADC stage; attach qe only.
      .join(broadcast(qv.select(col("query_id"), col("qe"))), Seq("query_id"))
      .withColumn("score_raw",
        dot_product(col("qe"), col("ce2")) / (col("qn") * col("cn2")))
      .withColumn("rn", row_number().over(wFin))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        col("adc_raw"), col("score_raw"))
  }

  /** Scalar-quantized IVF search — the SQ8 rung of the quantization
    * ladder (Faiss `IndexScalarQuantizer`/IVFSQ lineage, public): each
    * dimension quantized INDEPENDENTLY to an 8-bit code on the corpus's
    * per-dim [min, max] grid. Per-vector state = cell + 64 byte codes +
    * norm ≈ 64 B — 8× IVF-PQ's 8 B, in exchange for near-exact scoring
    * (the whole "codebook" is 128 longs of per-dim stats, vs PQ's learned
    * 8×16×8 table; nothing is trained, so nothing can be mistrained).
    * `ivf_sq_eval` measures the trade against `ivf_pq_eval` at identical
    * probe/shortlist budgets — the storage-vs-recall pair a 100 TB index
    * designer prices.
    *
    * Determinism (§5.3): vectors enter on the dec4 grid as scaled int64;
    * codes are round-half-up integer divisions — computed as
    * floor(double-division) which is PROVABLY exact here (operands ≤
    * 2·10⁷, so a non-integer true quotient p/q with q ≤ 4·10⁴ sits ≥
    * 2.5·10⁻⁵ from any wrong integer while the double error is ≤
    * half-ulp ≈ 10⁻¹¹); dequantized numerators nq_d = 255·mi_d +
    * code_d·(ma_d − mi_d) and the ADC dot Σ qi_d·nq_d stay < 2⁵³, so the
    * double fold IS the exact integer sum (dot_product's in-order fold ≡
    * DuckDB list_sum). The only approximations are the quantization grid
    * itself and the two final norm divides; ranks tie-break by
    * neighbor_id and the tail re-ranks exactly ([[adcShortlistRerank]]).
    *
    * Scale shape: the per-dim stats are ONE map-side-combined aggregate
    * (no explode — 128 aggregate expressions over element_at) broadcast
    * back as index metadata; encode is a per-row zip_with chain
    * (scan-proportional, zero shuffle); the ADC scan costs one exact
    * 64-element dot per candidate from the probed cells only — the same
    * probed-cell-proportional search mass as ivf_pq with no LUT join. */
  /** SQ long form: each vector on the dec4 grid as a scaled-int64 array
    * (vec_id, xi) — the input of the SQ trainer/encoder and the query
    * side of the ADC dot. Per-row pure, so a SLICE encodes identically
    * to the whole corpus (the streamed-ingest premise). */
  private[graft] def sqLongForm(emb: DataFrame): DataFrame = {
    val xiC = transform(col("embedding"),
      x => floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("long"))
    emb.select(col("vec_id"), xiC.as("xi"))
  }

  /** SQ trainer: the per-dim [min, max] grid — ONE map-side-combined
    * aggregate producing the 1-row broadcast stats relation (mi, ma,
    * rng arrays; 192 longs of index metadata, publishable exactly like
    * the PQ codebook). */
  private[graft] def sqStats(base: DataFrame): DataFrame = {
    val mm = (1 to 64).map(i => min(element_at(col("xi"), i)).as(s"mi$i")) ++
      (1 to 64).map(i => max(element_at(col("xi"), i)).as(s"ma$i"))
    base.agg(mm.head, mm.tail: _*)
      .select(array((1 to 64).map(i => col(s"mi$i")): _*).as("mi"),
        array((1 to 64).map(i => col(s"ma$i")): _*).as("ma"))
      .withColumn("rng", zip_with(col("ma"), col("mi"), (a, b) => a - b))
  }

  /** SQ encoder against a PUBLISHED stats row: code_d = round-half-up
    * ((xi−mi)·255/(ma−mi)) SATURATED to [0,255], carried as its
    * dequantized numerator nq_d = 255·mi + code_d·(ma−mi) (units
    * 10⁻⁴/255). The clamp is the SQ8 saturation semantics (ADVICE r11;
    * e.g. Faiss IndexScalarQuantizer): a dimension outside the published
    * [mi,ma] grid — the EXPECTED case when STR-IVF-SQ serves arrivals
    * against a stale published grid — encodes to the nearest grid edge
    * instead of a silently extrapolated negative or >255 code. In-grid
    * inputs (every batch encode: the stats come from the same corpus)
    * are untouched. Shared verbatim by the batch pipeline and the
    * streamed STR-IVF-SQ ingest, so the two encode paths cannot drift. */
  private[graft] def sqEncodeWith(base: DataFrame, stats: DataFrame): DataFrame =
    base.crossJoin(broadcast(stats))
      .withColumn("sh", zip_with(col("xi"), col("mi"), (x, m) => x - m))
      .withColumn("code", zip_with(col("sh"), col("rng"), (sft, r) =>
        when(r === lit(0L), lit(0L)).otherwise(
          greatest(lit(0L), least(lit(255L),
            floor((sft * lit(510L) + r).cast("double") /
              (r * lit(2L)).cast("double")).cast("long"))))))
      .withColumn("cr", zip_with(col("code"), col("rng"), (c, r) => c * r))
      .withColumn("nq", zip_with(col("cr"), col("mi"),
        (c, m) => c + lit(255L) * m))
      .select(col("vec_id"), col("nq"))

  private def ivfSqRanked(s: SparkSession, d: String,
      shortlist: Int = 16, extState: Option[DataFrame] = None,
      trainPop: String = "full"): DataFrame = {
    val emb = load(s, d, "embeddings")
    val base = sqLongForm(emb).pinned
    // --- TRAIN + ENCODE (the shared core; see [[sqStats]]/[[sqEncodeWith]]).
    //     `trainPop` fits the [min,max] grid (and the Lloyd cells below)
    //     on [[embSampleTrain]]'s rate-keyed slice ("sample") or
    //     [[embCapTrain]]'s fixed-size slice ("cap") and encodes the FULL
    //     corpus against the fixed metadata — the 100 TB train-on-sample
    //     paths the gated `ivf_sq_sample_eval`/`ivf_sq_cap_eval` audit. ---
    val stats = sqStats(
      if (trainPop == "full") base
      else sqLongForm(trainSlice(trainPop, emb)))
    val enc = sqEncodeWith(base, stats)
    // --- IVF cells + probes + queries (the shared assignment, verbatim;
    //     memoized sample-/cap-trained centroids off the full path) ---
    val assigned =
      if (trainPop == "full") ivfAssigned(s, d)
      else ivfAssignedWith(s, d, centroidsFor(s, d, trainPop))
    val cells = assigned.filter(col("crn") === 1)
      .select(col("vec_id"), col("e"), col("vn"), col("cell_label"))
    val probes = assigned.filter(col("vec_id") < 10 && col("crn") <= 2)
      .select(col("vec_id").as("query_id"), col("cell_label").as("pcell"))
    val qv = cells.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("vn").as("qn"))
    val qxi = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        transform(col("xi"), _.cast("double")).as("qxa"))
    // --- Per-vector search state: cell + dequantized code numerators +
    //     norm (the inverted-list relation; raw vectors stay cold), or
    //     (the `ivf_sq_stream` parity case) the state STR-IVF-SQ streamed
    //     into the cell-partitioned store ---
    val state = extState.getOrElse(
      enc.join(cells.select(col("vec_id"), col("vn"),
          col("cell_label")), Seq("vec_id"))
        .select(col("vec_id").as("neighbor_id"), col("cell_label"),
          col("nq"), col("vn")))
      .withColumn("nqa", transform(col("nq"), _.cast("double")))
    // --- ADC scan: ONE exact integer dot per probed-cell candidate ---
    val pool = broadcast(probes).join(state,
        col("pcell") === col("cell_label") && col("query_id") =!= col("neighbor_id"))
      .join(broadcast(qxi), Seq("query_id"))
      .join(broadcast(qv.select(col("query_id"), col("qn"))), Seq("query_id"))
      .withColumn("adc_raw",
        dot_product(col("qxa"), col("nqa")) / lit(2.55e10) /
          (col("qn") * col("vn")))
      .select(col("query_id"), col("neighbor_id"), col("vn").as("cn"),
        col("qn"), col("adc_raw"))
    adcShortlistRerank(pool, qv,
      cells.select(col("vec_id").as("neighbor_id"), col("e").as("ce2"),
        col("vn").as("cn2")), shortlist)
  }

  /** The (memoized) root of the streamed IVFADC store `ivf_pq_stream`
    * searches — exposed package-private so the compaction law
    * (StreamingSpec) can duplicate a `_src` partition, compact, and
    * re-search the SAME store the gated query reads.
    *
    * SHARED-STATE NOTE (ADVICE r12): because the store is process-wide
    * memoized, StreamingSpec's STR-COMPACT2 leg leaves it COMPACTED —
    * after that suite runs, the store no longer carries its built-in
    * duplicate-`_src` residue. No consumer may assume residue is
    * present; the gated `ivf_pq_stream` reads through the DISTINCT
    * guard, which is correct on both the residue-bearing and the
    * compacted store. */
  private[graft] def ivfPqStreamStoreRoot(s: SparkSession, d: String): String =
    graft.core.Warehouse.once(d, "ivfadc_stream") { out =>
      buildIvfAdcStreamStore(s, d, out)
    }

  /** The streamed SQ8 store, memoized like [[ivfPqStreamStoreRoot]]. */
  private[graft] def ivfSqStreamStoreRoot(s: SparkSession, d: String): String =
    graft.core.Warehouse.once(d, "ivfsq_stream") { out =>
      buildIvfSqStreamStore(s, d, out)
    }

  /** STR-IVF-SEARCH core: search the streamed IVFADC store under
    * ivf_pq's exact output contract. `distinctGuard = true` is the gated
    * path: DISTINCT guards ADC correctness against at-least-once residue
    * (a duplicate-DELIVERED file — same content, new name — leaves a
    * second `_src` partition, and a duplicated state row would double
    * that neighbor's ADC sum and let it occupy two top-3 ranks).
    * `distinctGuard = false` is the COMPACTED read path: after
    * [[graft.streaming.StreamOps.compactStore]] the store carries one
    * row per vector and the guard is provably redundant — the law
    * StreamingSpec pins by hash-matching this path against batch
    * `ivf_pq` on a store with an injected duplicate partition. */
  private[graft] def ivfPqStreamSearch(s: SparkSession, d: String,
      distinctGuard: Boolean): DataFrame = {
    val root = ivfPqStreamStoreRoot(s, d)
    val state0 = graft.streaming.StreamOps.readStore(s, s"$root/store")
      .select(col("vec_id").as("neighbor_id"),
        col("cell").as("cell_label"), col("sp"), col("cw"), col("vn"))
    val state = if (distinctGuard) state0.distinct() else state0
    ordered(ivfPqRanked(s, d, extState = Some(state))
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        dec4S(col("adc_raw")).as("adc"),
        dec4S(col("score_raw")).as("score")))
  }

  /** Build the STR-IVF streamed IVFADC store for `ivf_pq_stream`: the
    * corpus lands as FOUR arrival files (one micro-batch each under
    * maxFilesPerTrigger=1), assigned + PQ-encoded against the published
    * index metadata (the SAME Lloyd centroids and codebook the batch
    * pipeline trains) by [[graft.streaming.StreamOps.runIvfAdcIngest]].
    * Layout under `out`: arrivals/ (the landing zone), store/ (the
    * cell-partitioned inverted lists), ckpt/ (the stream checkpoint). */
  private def buildIvfAdcStreamStore(s: SparkSession, d: String,
      out: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val emb = load(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    // Memoized index metadata (centroidsOnce/pqBookOnce): already
    // materialized parquet, so each of the 4 foreachBatch invocations
    // broadcasts a small scan instead of re-running the training DAGs.
    val cent = centroidsOnce(s, d)
    val book = pqBookOnce(s, d)
    val arrivals = stageArrivalSlices(emb, out)
    graft.streaming.StreamOps.runIvfAdcIngest(s, arrivals,
      emb.schema, cent, book, s"$out/store", s"$out/ckpt")
  }

  /** Land the corpus as four single-parquet arrival files under
    * `out`/arrivals (one micro-batch each under maxFilesPerTrigger=1) —
    * shared by the IVF-PQ and IVF-SQ streamed-store builders. */
  private def stageArrivalSlices(emb: DataFrame, out: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val arrivals = Paths.get(out, "arrivals")
    Files.createDirectories(arrivals)
    (0 to 3).foreach { i =>
      val tmp = Files.createTempDirectory("ivf_slice")
      emb.filter(pmod(col("vec_id"), lit(4)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow(() => new IllegalStateException(
            s"no parquet part written under $tmp"))
        finally listing.close()
      Files.move(part, arrivals.resolve(f"slice_$i%02d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // Drop the write's leftovers (_SUCCESS, .crc) with the dir itself.
      val rest = Files.list(tmp)
      try rest.forEach(p => { Files.deleteIfExists(p); () })
      finally rest.close()
      Files.deleteIfExists(tmp)
    }
    arrivals.toString
  }

  /** Build the STR-IVF-SQ streamed store for `ivf_sq_stream`: arrivals
    * assigned against the published Lloyd centroids and SQ-encoded
    * against the published per-dim grid by
    * [[graft.streaming.StreamOps.runIvfSqIngest]]. */
  private def buildIvfSqStreamStore(s: SparkSession, d: String,
      out: String): Unit = {
    val emb = load(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    // Memoized/pinned index metadata (see buildIvfAdcStreamStore).
    val cent = centroidsOnce(s, d)
    val stats = pin(sqStats(sqLongForm(emb)))
    val arrivals = stageArrivalSlices(emb, out)
    graft.streaming.StreamOps.runIvfSqIngest(s, arrivals,
      emb.schema, cent, stats, s"$out/store", s"$out/ckpt")
  }

  private def ivfPqRanked(s: SparkSession, d: String,
      shortlist: Int = 16, raw: Boolean = false,
      extState: Option[DataFrame] = None,
      trainPop: String = "full"): DataFrame = {
    val emb = load(s, d, "embeddings")
    // --- PQ training + encoding (the shared operators/PqEncode core —
    //     vec_pq's scheme; see PQ-1 for the decimal-width rationale).
    //     `trainPop` fits the codebook (and the Lloyd cells below) on
    //     [[embSampleTrain]]'s rate-keyed slice ("sample") or
    //     [[embCapTrain]]'s fixed-size slice ("cap") and encodes the FULL
    //     corpus against the fixed book — the 100 TB train-on-sample
    //     paths the gated `ivf_pq_sample_eval`/`ivf_pq_cap_eval` audit. ---
    // `long` now feeds ONLY the query-side LUT (the vec_id<10 filter
    // pushes to the scan), so it needs no checkpoint barrier; the
    // corpus-sized encode leg enters PqEncode straight off the wide rows
    // (encodeWide: zero exchanges, scaled-long fold — see PqEncode's
    // arithmetic note). The book is memoized parquet (≤1024 rows), read
    // lazily by both consumers — a pin bought one parquet re-read and
    // cost a materialization job.
    val long = graft.operators.PqEncode.toLong(emb)
    val book = pqBookFor(s, d, trainPop)
    val code = graft.operators.PqEncode.encodeWide(emb, book)
      .withColumnRenamed("vec_id", "neighbor_id")
    // --- IVF cells + probes (ivfAssigned verbatim; sample-trained
    //     centroid table on the sample path, full-corpus assignment) ---
    val assigned =
      if (trainPop == "full") ivfAssigned(s, d)
      else ivfAssignedWith(s, d, centroidsFor(s, d, trainPop))
    val cells = assigned.filter(col("crn") === 1)
      .select(col("vec_id"), col("e"), col("vn"), col("cell_label"))
    val probes = assigned.filter(col("vec_id") < 10 && col("crn") <= 2)
      .select(col("vec_id").as("query_id"), col("cell_label").as("pcell"))
    val qv = cells.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("vn").as("qn"))
    // --- Per-query LUT: inner product of each query SUBVECTOR with each
    //     codeword — |queries|·8·16 rows, exact decimal sums ---
    val qlut = long.filter(col("vec_id") < 10)
      .join(broadcast(book), Seq("sp", "p"))
      .groupBy(col("vec_id"), col("sp"), col("cell"))
      .agg(sum(col("xq") * col("c")).as("ip"))
      .select(col("vec_id").as("query_id"), col("sp"),
        col("cell").as("cw"), col("ip"))
    // --- Per-vector search state: this pipeline's own encode, or (the
    //     `ivf_pq_stream` parity case) the state STR-IVF streamed into
    //     the cell-partitioned store ---
    val state = extState.getOrElse(
      code.join(cells.select(col("vec_id").as("neighbor_id"), col("vn"),
        col("cell_label")), Seq("neighbor_id")))
    ivfAdcSearchTail(state, probes, qv, qlut,
      cells.select(col("vec_id").as("neighbor_id"), col("e").as("ce2"),
        col("vn").as("cn2")),
      shortlist, raw)
  }

  /** Residual-encoding IVFADC — the quality step real IVF-PQ indexes take
    * beyond [[ivfPqRanked]]'s direct-vector PQ (Jégou et al. §III.C):
    * quantize each vector's RESIDUAL against its cell centroid,
    * r_v = v − μ_cell(v), instead of the vector itself. Residuals are
    * centered and much lower-variance than raw vectors, so the same
    * 8×16 codebook budget spends its codewords on the fine structure —
    * the recall win `ivf_pq_res_eval` measures against `ivf_pq_eval`.
    *
    * Scoring identity that keeps ADC table-driven: with v ≈ μ + r̂,
    *   q·v ≈ q·μ_cell  +  q·r̂
    * so the scan needs (a) one q·μ scalar per (query, cell) — a
    * |queries|×|cells| broadcast — and (b) the usual LUT of the RAW
    * query against the residual codebook. No query-side residual is ever
    * formed. Decimal discipline identical to PQ-1: centroid dims, xq and
    * residuals all DECIMAL(18,4) (differences exact — values ≪ 10¹⁴),
    * products at scale 8, every sum an exact decimal fold; the only
    * doubles are the final norm divides. Per-vector search state is the
    * same 9 small values as ivf_pq (cell + 8 codes + norm). */
  private def ivfPqResRanked(s: SparkSession, d: String,
      shortlist: Int = 16): DataFrame = {
    val emb = load(s, d, "embeddings")
    // `long` feeds only the two query-side legs (qmu/qlut: vec_id<10
    // pushes to the scan) — no barrier needed.
    val long = graft.operators.PqEncode.toLong(emb)
    // --- Coarse quantizer: the memoized table shared by the assignment
    //     and the residual μ table (10-row relation) ---
    val centTab = centroidsOnce(s, d)
    // --- IVF cells + probes (shared assignment) ---
    val assigned = ivfAssignedWith(s, d, centTab)
    val cells = assigned.filter(col("crn") === 1)
      .select(col("vec_id"), col("e"), col("vn"), col("cell_label"))
    val probes = assigned.filter(col("vec_id") < 10 && col("crn") <= 2)
      .select(col("vec_id").as("query_id"), col("cell_label").as("pcell"))
    val qv = cells.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("vn").as("qn"))
    // --- Cell centroids in LONG decimal form: the ASSIGNMENT centroids
    //     themselves, unnested to (cell, sp, p, dec4 m) — with the Lloyd
    //     flip the residual μ and the coarse quantizer are one table, so
    //     v − μ_cell(v) is centered against exactly the cell it lives in
    //     (the r10 label-trained μ was a different mean than the
    //     assignment centroid; the residual step provably bought nothing
    //     because the cells explained no variance). Centroid dims are
    //     dec4-quantized doubles, so the decimal cast is exact. ---
    val centLong = resCentLong(centTab) // |cells|·64 rows; q·μ broadcast only
    // --- Residual codebook: memoized published metadata (resBookOnce —
    //     the Lloyd refinement trains once per (process, corpus) and
    //     both gated consumers read it); encode stays the per-call
    //     scan-proportional leg, the shared operators/PqEncode core
    //     applied to the residual ---
    val rbook = resBookOnce(s, d)
    // --- Residuals + encode, WIDE (r14 optimization round): r = xq −
    //     μ_cell(v) computed as one zip_with on the scaled-long grid
    //     (exact: both operands are dec4-grid values ×10⁴ — the same
    //     integers resLongFrom's DECIMAL(18,4) subtraction denotes;
    //     resLongFrom itself remains the training-build path in
    //     resBookOnce). One narrow join of the 2-column wide rows to
    //     their cells replaces the 64-rows-per-vector long-form join
    //     chain + two checkpoint barriers; the encode fold is
    //     PqEncode.encodeScaled's zero-exchange per-row argmin. ---
    val centScaled = centTab.select(col("cell_label"),
      graft.operators.PqEncode.scaledLongs(col("ce")).as("ml"))
    val rscaled = emb.select(col("vec_id"),
        graft.operators.PqEncode.scaledLongs(col("embedding")).as("xl"))
      .join(cells.select(col("vec_id"), col("cell_label")), Seq("vec_id"))
      .join(broadcast(centScaled), Seq("cell_label"))
      .select(col("vec_id"),
        zip_with(col("xl"), col("ml"), (a, b) => a - b).as("xl"))
    val rcode = graft.operators.PqEncode.encodeScaled(rscaled, rbook)
      .withColumnRenamed("vec_id", "neighbor_id")
    // --- q·μ per (query, cell): |queries|×|cells| broadcast scalars ---
    val qmu = long.filter(col("vec_id") < 10)
      .join(broadcast(centLong), Seq("sp", "p"))
      .groupBy(col("vec_id"), col("cell_label"))
      .agg(sum(col("xq") * col("m")).as("qmu"))
      .select(col("vec_id").as("query_id"), col("cell_label"), col("qmu"))
    // --- LUT: RAW query × residual codebook ---
    val qlut = long.filter(col("vec_id") < 10)
      .join(broadcast(rbook), Seq("sp", "p"))
      .groupBy(col("vec_id"), col("sp"), col("cell"))
      .agg(sum(col("xq") * col("c")).as("ip"))
      .select(col("vec_id").as("query_id"), col("sp"),
        col("cell").as("cw"), col("ip"))
    // --- ADC scan: q·μ + Σ_sp LUT, over the probed cells ---
    val cand = broadcast(probes).join(
      cells.select(col("vec_id").as("neighbor_id"), col("vn").as("cn"),
        col("cell_label")),
      col("pcell") === col("cell_label") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cn"), col("cell_label"))
    val adc = cand.join(rcode, Seq("neighbor_id"))
      .join(broadcast(qlut), Seq("query_id", "sp", "cw"))
      .groupBy(col("query_id"), col("neighbor_id"), col("cn"), col("cell_label"))
      .agg(sum(col("ip")).as("lutsum"))
      .join(broadcast(qmu), Seq("query_id", "cell_label"))
    val pool = adc
      .join(broadcast(qv.select(col("query_id"), col("qn"))), Seq("query_id"))
      .withColumn("adc_raw",
        (col("qmu") + col("lutsum")).cast("double") / (col("qn") * col("cn")))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_raw").desc, col("neighbor_id").asc)
    val short = pool
      .withColumn("srn", row_number().over(wAdc))
      .filter(col("srn") <= shortlist)
    val wFin = Window.partitionBy(col("query_id"))
      .orderBy(col("score_raw").desc, col("neighbor_id").asc)
    short
      .join(cells.select(col("vec_id").as("neighbor_id"), col("e").as("ce2"),
        col("vn").as("cn2")), Seq("neighbor_id"))
      .join(broadcast(qv.select(col("query_id"), col("qe"))), Seq("query_id"))
      .withColumn("score_raw",
        dot_product(col("qe"), col("ce2")) / (col("qn") * col("cn2")))
      .withColumn("rn", row_number().over(wFin))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        col("adc_raw"), col("score_raw"))
  }

  val all: Map[String, Q] = Map(
    // ---- MM-1: multimodal carry — vector columns survive joins ----
    "mm1" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val emb = load(s, d, "embeddings")
      ordered(doc.join(emb, doc("doc_id") === emb("vec_id"), "inner")
        .select(col("doc_id"), col("lang"), col("label"), col("n_chars"),
          farrS(slice(col("embedding"), 1, 2)).as("head2")))
    }),
    "mm1_agg" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val emb = load(s, d, "embeddings")
      ordered(doc.join(emb, doc("doc_id") === emb("vec_id"), "inner")
        .groupBy(col("lang"), col("label"))
        .agg(count(lit(1)).as("n_docs"),
          davgS(col("n_chars")).as("avg_chars"),
          dsum4S(element_at(col("embedding"), 1).cast("double")).as("sum_dim1")))
    }),

    // ---- MM-2: opaque binary payload + metadata (multimodal column
    //      pattern): media bytes survive the engine untouched; features
    //      computed on the byte stream, not the decoded text ----
    "mm2_binary" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val bin = col("text").cast("binary")
      ordered(doc.select(col("doc_id"), col("lang"),
        length(bin).as("n_bytes"),
        md5(bin).as("content_md5"),
        (length(bin) === length(col("text"))).as("is_ascii")))
    }),

    // ---- MM-3: per-partition decode stub over the binary payload
    //      (mapPartitions typed pipeline; not SQL-expressible → rows-only
    //      driver check, determinism asserted in MultimodalSpec) ----
    "mm2_decode" -> ((s, d) => {
      val doc = load(s, d, "documents")
      import s.implicits._
      val blobs = doc.select(col("doc_id"), col("lang"),
        col("text").cast("binary").as("payload"))
        .as[graft.operators.Multimodal.Blob]
      ordered(graft.operators.Multimodal.decodeFeatures(blobs).toDF()
        .select(col("doc_id"), col("lang"), col("n_bytes"),
          col("width"), col("height"),
          dec4S(col("mean_intensity")).as("mean_intensity")))
    }),

    // ---- MM-4: media resize — the TRANSFORM stage of the multimodal
    //      pipeline (decode interprets, resize rewrites): every payload
    //      nearest-neighbor-sampled through the decoder's (w, h) grid to a
    //      fixed 8×8 byte grid via [[graft.operators.Multimodal.resizeTo]]
    //      (typed per-partition map, payload never leaves the executor,
    //      output size KNOWN per row). The pixel math is the stub
    //      decoder's, which is integer-exact — so unlike most decode
    //      stubs this one is fully ORACLE-HASHED: DuckDB recomputes the
    //      same grid walk over the text bytes (ASCII corpus ⇒ byte
    //      positions = char positions, the mm2_binary-certified premise)
    //      and must md5-agree on every resized payload. ----
    "mm_resize" -> ((s, d) => {
      val doc = load(s, d, "documents")
      import s.implicits._
      // Empty payloads are excluded from the GATED scope (the mm_frames
      // convention): the operator zero-fills them (MultimodalSpec), but
      // the oracle's grid walk has no NUL-byte string to md5 against
      // (DuckDB varchar can't hold chr(0)), so the declared query is
      // non-empty media only.
      val blobs = doc.filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"),
          col("text").cast("binary").as("payload"))
        .as[graft.operators.Multimodal.Blob]
      ordered(graft.operators.Multimodal.resizeTo(blobs, 8, 8).toDF()
        .select(col("doc_id"), col("lang"), col("width"), col("height"),
          md5(col("payload")).as("resized_md5")))
    }),

    // ---- MM-5: bounded frame sampling, gated — every `stride`-th
    //      fixed-size frame of each payload as its own row (the video/
    //      audio frame-extraction shape). Output per input row is bounded
    //      by ceil(n/frameBytes/stride), builtin codegen'd expressions
    //      only, no shuffle; md5 pins each frame's exact bytes without
    //      shipping them through the comparator. ----
    "mm_frames" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val withPayload = doc.select(col("doc_id"), col("lang"),
        col("text").cast("binary").as("payload"))
      ordered(graft.operators.Multimodal
        .sampleFrames(withPayload, col("payload"), frameBytes = 64, stride = 2)
        .select(col("doc_id"), col("lang"), col("frame_idx"),
          length(col("frame")).as("n_bytes"),
          md5(col("frame")).as("frame_md5")))
    }),

    // ---- SIM-1: brute-force cosine top-k (query set broadcast over corpus) ----
    "sim1" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val base = emb.select(col("vec_id"), dbl.as("e"),
        sqrt(dot_product(dbl, dbl)).as("nrm"))
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
      val c = base.select(col("vec_id").as("neighbor_id"), col("e").as("ce"), col("nrm").as("cn"))
      val dot = dot_product(col("qe"), col("ce"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_raw").desc, col("neighbor_id").asc)
      ordered(broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
        .withColumn("score_raw", dot / (col("qn") * col("cn")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          dec4S(col("score_raw")).as("score")))
    }),

    // ---- SIM-1c: MULTI-TABLE LSH ANN — two independent sign-bit hash
    //      tables (dims 1-3 and dims 4-6); candidates are the union of
    //      same-bucket matches from either table. Multi-table is the
    //      standard recall lever for LSH at scale: a neighbor missed by
    //      one table's cut planes is caught by the other's, while each
    //      one table's cut planes is caught by the other's. With a small
    //      broadcast query set the bucket test is a cheap residual; for
    //      corpus×corpus ANN the same semantics become a unionAll of two
    //      per-table equi-joins + distinct. Exact cosine + per-query
    //      top-k over the candidate set. ----
    "sim1_lsh_multi" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      def signBucket(d1: Int, d2: Int, d3: Int) =
        (when(element_at(col("e"), d1) > 0.0, 4).otherwise(0) +
          when(element_at(col("e"), d2) > 0.0, 2).otherwise(0) +
          when(element_at(col("e"), d3) > 0.0, 1).otherwise(0)).cast("int")
      val base = emb.select(col("vec_id"), dbl.as("e"),
        sqrt(dot_product(dbl, dbl)).as("nrm"))
        .withColumn("b1", signBucket(1, 2, 3))
        .withColumn("b2", signBucket(4, 5, 6))
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("nrm").as("qn"), col("b1").as("qb1"), col("b2").as("qb2"))
      val c = base.select(col("vec_id").as("neighbor_id"), col("e").as("ce"),
        col("nrm").as("cn"), col("b1").as("cb1"), col("b2").as("cb2"))
      val cand = broadcast(q).join(c,
        (col("qb1") === col("cb1") || col("qb2") === col("cb2")) &&
          col("query_id") =!= col("neighbor_id"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_raw").desc, col("neighbor_id").asc)
      ordered(cand
        .withColumn("score_raw",
          dot_product(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          dec4S(col("score_raw")).as("score")))
    }),

    // ---- SIM-1d: IVF ANN — coarse quantizer + inverted cell lists.
    //      Centroids: per-label element-wise means with every dimension
    //      dec4-quantized (tie-safe, so both engines hold bit-identical
    //      centroid vectors). Each vector is assigned to its nearest
    //      centroid by cosine (ties by label); a query probes its 2
    //      nearest cells and scores exactly only against vectors assigned
    //      there. The IVF shape at 100 TB: the corpus is partitioned by
    //      cell (inverted lists), a probe touches nprobe/ncells of the
    //      data, and the centroid table is a broadcast. ----
    "sim1_ivf" -> ((s, d) =>
      ordered(ivfRanked(s, d)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          dec4S(col("score_raw")).as("score")))),

    // ---- SIM-1e: IVF-PQ composed search (`ivf_pq`) — the IVFADC
    //      billion-vector layout assembled from the two certified halves
    //      (SIM-1d cells + PQ-1 codebooks); see [[ivfPqRanked]] for the
    //      five stages and the decimal-determinism discipline. Output is
    //      the final exact-re-ranked top-3 with BOTH scores: the ADC
    //      approximation that chose the shortlist and the exact cosine
    //      that ranked it — the pair a recall audit diffs. ----
    "ivf_pq" -> ((s, d) =>
      ordered(ivfPqRanked(s, d)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          dec4S(col("adc_raw")).as("adc"),
          dec4S(col("score_raw")).as("score")))),

    // ---- STR-IVF-SEARCH: search the STREAMED IVFADC store
    //      (`ivf_pq_stream`) — the parity gate that closes the last drift
    //      channel between streamed and batch index state (r11, the r10
    //      verdict's task 3): the per-vector search state (cell, 8 PQ
    //      codes, norm) comes from STR-IVF's composed ingest — embeddings
    //      landed file-by-file as micro-batches, assigned/encoded against
    //      the published Lloyd centroids + PQ codebook, written to the
    //      cell-partitioned store — and the SAME ivfPqRanked ADC scan +
    //      exact re-rank runs against it. Gated with ivf_pq's own oracle
    //      SQL: the streamed index must hash-match the batch index's
    //      search results exactly, or the maintenance path drifted. Store
    //      built once per (process, corpus) via Warehouse.once; the query
    //      itself reads only (neighbor_id, cell, sp, cw, vn) — the raw
    //      vectors stay cold and are fetched only for the bounded
    //      re-rank leg, exactly the 100 TB read pattern. ----
    "ivf_pq_stream" -> ((s, d) => ivfPqStreamSearch(s, d, distinctGuard = true)),

    // ---- SIM-EVAL3: IVF-PQ recall audit (`ivf_pq_eval`) — ivf_eval's
    //      rule applied to the composed index: measured recall@3 of the
    //      IVF-PQ search against brute-force cosine ground truth, per
    //      query. The composed index stacks TWO approximations (cell
    //      pruning + PQ scoring); this is the number that says what the
    //      stack actually costs in recall — ship the index, ship the
    //      audit. Truth leg identical to ivf_eval's (query-count-bounded,
    //      sample-able at scale). ----
    "ivf_pq_eval" -> ((s, d) =>
      ordered(recallPerQuery(bruteTruthTop3(s, d), ivfPqRanked(s, d)))),

    // ---- SIM-1f: residual-encoding IVFADC (`ivf_pq_res`) — see
    //      [[ivfPqResRanked]]: PQ codebooks trained on CELL RESIDUALS
    //      (v − μ_cell) instead of raw vectors, scored as q·μ + LUT(q, r̂)
    //      — the standard quality step over SIM-1e for the same
    //      per-vector state and scan cost. ----
    "ivf_pq_res" -> ((s, d) =>
      ordered(ivfPqResRanked(s, d)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          dec4S(col("adc_raw")).as("adc"),
          dec4S(col("score_raw")).as("score")))),

    // ---- SIM-EVAL4: residual-IVFADC recall audit (`ivf_pq_res_eval`) —
    //      the number that JUSTIFIES the residual step: recall@3 of the
    //      residual stack vs brute truth, read against SIM-EVAL3's
    //      direct-PQ recall at identical probe/shortlist budgets. ----
    "ivf_pq_res_eval" -> ((s, d) =>
      ordered(recallPerQuery(bruteTruthTop3(s, d), ivfPqResRanked(s, d)))),

    // ---- SIM-1g: scalar-quantized IVF search (`ivf_sq`) — the SQ8 rung
    //      of the quantization ladder (see [[ivfSqRanked]]): per-dim
    //      8-bit codes on the corpus [min,max] grid, 64 B/vector state
    //      (8× PQ's 8 B), nothing trained. Same probes, shortlist, exact
    //      re-rank and output shape as ivf_pq — the two indexes differ
    //      ONLY in how the ADC approximates, which is exactly what their
    //      paired evals price. ----
    "ivf_sq" -> ((s, d) =>
      ordered(ivfSqRanked(s, d)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          dec4S(col("adc_raw")).as("adc"),
          dec4S(col("score_raw")).as("score")))),

    // ---- SIM-EVAL5: SQ-IVF recall audit (`ivf_sq_eval`) — the number
    //      that PRICES the SQ-vs-PQ storage trade: recall@3 of the SQ8
    //      stack vs brute truth at ivf_pq_eval's identical probe/
    //      shortlist budgets. Read the pair: if SQ at 64 B/vector only
    //      matches PQ at 8 B, buy PQ; if SQ recovers the IVF-exact
    //      ceiling, the 8× storage buys real recall. ----
    "ivf_sq_eval" -> ((s, d) =>
      ordered(recallPerQuery(bruteTruthTop3(s, d), ivfSqRanked(s, d)))),

    // ---- SIM-SAMPLE: sample-trained quantizer recall audits
    //      (`ivf_pq_sample_eval`, `ivf_sq_sample_eval`) — the declared
    //      100 TB training lever EXECUTED (r12 verdict task 1, the Faiss
    //      train-on-sample precedent): Lloyd cells + PQ codebook (resp.
    //      the SQ8 per-dim grid) are fit on [[embSampleTrain]]'s bounded
    //      content-keyed ~50% slice, the FULL corpus is assigned/encoded
    //      against the fixed metadata, and recall@3 is measured under
    //      the same brute-truth/probe/shortlist budgets as the
    //      full-train audits — read `ivf_pq_sample_eval` against
    //      `ivf_pq_eval` (resp. `ivf_sq_*`): the pair prices what
    //      training on a sample costs in recall, which at 10⁹ vectors is
    //      the difference between a bounded training job and one that
    //      scales with the corpus (the ×100 probe priced full-corpus
    //      training at 571 s where the maintained-store search costs
    //      41 s). The spec law pins sample-trained recall within a
    //      stated band of full-train recall. ----
    "ivf_pq_sample_eval" -> ((s, d) =>
      ordered(recallPerQuery(bruteTruthTop3(s, d),
        ivfPqRanked(s, d, trainPop = "sample")))),
    "ivf_sq_sample_eval" -> ((s, d) =>
      ordered(recallPerQuery(bruteTruthTop3(s, d),
        ivfSqRanked(s, d, trainPop = "sample")))),

    // ---- SIM-CAP: FIXED-SIZE-capped quantizer recall audits
    //      (`ivf_pq_cap_eval`, `ivf_sq_cap_eval`) — SIM-SAMPLE's
    //      remaining declared knob EXECUTED (r13 verdict task 1): the
    //      rate-keyed sample still trains ∝ corpus; production caps the
    //      training set at a FIXED size so the training job stops scaling
    //      with the corpus entirely. Cells + books (resp. the SQ8 grid)
    //      fit on [[embCapTrain]]'s content-hash top-K slice
    //      (K = 256, seeds riding along), the FULL corpus encodes against
    //      the fixed metadata, recall@3 measured under the identical
    //      brute-truth/probe/shortlist budgets — read against
    //      `ivf_*_eval` (full) and `ivf_*_sample_eval` (rate) as the
    //      three-point training-mass/recall curve. The ×100 probe is the
    //      evidence the row exists for: train time FLAT as the corpus
    //      grows (the sample row's −61% becomes ~constant). ----
    "ivf_pq_cap_eval" -> ((s, d) =>
      ordered(recallPerQuery(bruteTruthTop3(s, d),
        ivfPqRanked(s, d, trainPop = "cap")))),
    "ivf_sq_cap_eval" -> ((s, d) =>
      ordered(recallPerQuery(bruteTruthTop3(s, d),
        ivfSqRanked(s, d, trainPop = "cap")))),

    // ---- STR-IVF-SQ-SEARCH: search the STREAMED SQ store
    //      (`ivf_sq_stream`) — ivf_pq_stream's parity gate applied to
    //      the scalar-quantized index: the per-vector state (cell, 64
    //      code numerators, norm) comes from STR-IVF-SQ's ingest
    //      (arrival files assigned/encoded against the PUBLISHED Lloyd
    //      centroids + per-dim grid) and the same ivfSqRanked ADC scan +
    //      exact re-rank runs against it, gated under ivf_sq's own
    //      oracle — streamed SQ index ≡ batch SQ index, hash-certified.
    //      With ivf_pq_stream this closes BOTH quantization families'
    //      maintenance-drift channels. ----
    "ivf_sq_stream" -> ((s, d) => {
      val root = ivfSqStreamStoreRoot(s, d)
      // DISTINCT guards the ADC against at-least-once residue
      // (ivf_pq_stream's rationale — a duplicated state row would let a
      // neighbor occupy two shortlist slots).
      val state = graft.streaming.StreamOps.readStore(s, s"$root/store")
        .select(col("vec_id").as("neighbor_id"), col("cell").as("cell_label"),
          col("nq"), col("vn"))
        .distinct()
      ordered(ivfSqRanked(s, d, extState = Some(state))
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          dec4S(col("adc_raw")).as("adc"),
          dec4S(col("score_raw")).as("score")))
    }),

    // ---- SIM-EVAL: ANN recall audit — DDP-EVAL's sibling for the dense
    //      ladder: measured recall@3 of SIM-1's IVF 2-probe search
    //      against brute-force cosine ground truth, per query + the
    //      audit a retrieval stack ships next to its index. Truth is the
    //      declared worst-case-exact leg (broadcast query set × corpus —
    //      sim1's own shape, query-count-bounded); the IVF leg reuses the
    //      certified sim1_ivf pipeline verbatim. At 100 TB the truth leg
    //      runs on a SAMPLED query set (ddp_eval's rate² lever) — recall
    //      estimates need tens of queries, not the corpus. ----
    "ivf_eval" -> ((s, d) =>
      ordered(recallPerQuery(bruteTruthTop3(s, d), ivfRanked(s, d)))),

    // ---- SIM-EVAL2: ranked-retrieval quality audit (`ann_ndcg`) —
    //      ivf_eval grades the IVF index on recall alone; this grades the
    //      sign-LSH index on the three metrics a retrieval eval actually
    //      reports: recall@3 (coverage), MRR (how early the first true
    //      neighbor appears), and binary-gain nDCG@3 (position-weighted
    //      coverage — the metric that penalizes a right answer ranked
    //      last). Truth = brute-force top-3 (sim1's semantics), approx =
    //      sim1_lsh's bucket-pruned top-3; every query keeps a row even
    //      when its bucket yields NOTHING (n_ret=0, all metrics 0) — an
    //      eval that silently drops empty-result queries overstates the
    //      index, the audit-your-sketch rule (ddp_eval). Determinism:
    //      DCG position discounts 1/log2(i+1) are PRECOMPUTED literals
    //      (dq_benford's no-runtime-log rule) and each term is
    //      dec4-quantized BEFORE the sum, so the 3-double addition is an
    //      exact decimal fold in both engines (§5.3 — a raw double Σ of
    //      {1.0, 0.6309…, 0.5} is order-sensitive in the last ulp);
    //      nDCG = that exact sum / the dec4 ideal 2.1309. Scale: truth
    //      is the measured leg (query-batch × corpus, declared
    //      sample-able like ddp_eval's); the approx leg is the index's
    //      own bucket-pruned cost; metrics are |queries|-row arithmetic. ----
    "ann_ndcg" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      def bucket = (when(element_at(col("e"), 1) > 0.0, 4).otherwise(0) +
        when(element_at(col("e"), 2) > 0.0, 2).otherwise(0) +
        when(element_at(col("e"), 3) > 0.0, 1).otherwise(0)).cast("int")
      val base = emb.select(col("vec_id"), dbl.as("e"),
          sqrt(dot_product(dbl, dbl)).as("nrm"))
        .withColumn("bucket", bucket)
        .pinned // read by the query spine, the truth leg, and the approx leg
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("nrm").as("qn"), col("bucket").as("qb"))
      val c = base.select(col("vec_id").as("neighbor_id"), col("e").as("ce"),
        col("nrm").as("cn"), col("bucket").as("cb"))
      val dot = dot_product(col("qe"), col("ce"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_raw").desc, col("neighbor_id").asc)
      val truth = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
        .withColumn("score_raw", dot / (col("qn") * col("cn")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("query_id").as("tq"), col("neighbor_id").as("tn"))
      val approx = broadcast(q).join(c,
          col("qb") === col("cb") && col("query_id") =!= col("neighbor_id"))
        .withColumn("score_raw", dot / (col("qn") * col("cn")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("query_id"), col("rn"), col("neighbor_id"))
      val disc = when(col("rn") === 1, lit(1.0))
        .when(col("rn") === 2, lit(0.6309297535714574)).otherwise(lit(0.5))
      val hit = col("tn").isNotNull
      val perq = approx.join(truth,
          col("query_id") === col("tq") && col("neighbor_id") === col("tn"), "left")
        .groupBy(col("query_id")).agg(
          count(lit(1)).as("nr"),
          count(col("tn")).as("nh"),
          min(when(hit, col("rn"))).as("frank"),
          dsum4(when(hit, disc).otherwise(lit(0.0))).as("dcg"))
      ordered(q.select(col("query_id")).join(perq, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("nr"), lit(0L)).as("n_ret"),
          coalesce(col("nh"), lit(0L)).as("n_hit"),
          dec4S(coalesce(col("nh").cast("double") / lit(3.0), lit(0.0))).as("recall"),
          dec4S(coalesce(lit(1.0) / col("frank"), lit(0.0))).as("mrr"),
          dec4S(coalesce(col("dcg").cast("double") / lit(2.1309), lit(0.0))).as("ndcg")))
    }),

    // ---- SIM-MRL: truncation-dimension recall curve (`vec_mrl`) — the
    //      fit check behind Matryoshka-style embedding deployment
    //      (Kusupati et al. 2022, public): serving at a truncated prefix
    //      width buys memory/latency ONLY if the truncated ranking still
    //      finds the full-width neighbors, and that retention is a
    //      property of the embedding distribution — it must be MEASURED
    //      (ivf_curve's recall-vs-cost discipline, with dimension as the
    //      cost axis). For w ∈ {8,16,32,64}: rank by cosine over the
    //      FIRST w dims, top-3 per query; report n_hits / recall@3 /
    //      macro-MRR vs the full-width (w=64) truth — the w=64 row is
    //      the recall=1 self-check (ivf_curve's pattern). Determinism:
    //      per-query reciprocal ranks dec4-quantized pre-sum (ann_ndcg's
    //      exact-decimal-fold rule). Scale: the brute legs are the
    //      measured audit (query-batch × corpus, declared sample-able —
    //      ddp_eval's rationale); production serves the chosen width
    //      through the IVF/LSH paths unchanged. ----
    "vec_mrl" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val base = emb.select(col("vec_id"), dbl.as("e"))
        .pinned // read by the truth leg and all four truncation legs
      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("cs").desc, col("neighbor_id").asc)
      def top3(w: Int) = {
        val q = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), slice(col("e"), 1, w).as("qe"))
        val c = base.select(col("vec_id").as("neighbor_id"),
          slice(col("e"), 1, w).as("ce"))
        broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
          .withColumn("cs", dot_product(col("qe"), col("ce")) /
            (sqrt(dot_product(col("qe"), col("qe"))) *
              sqrt(dot_product(col("ce"), col("ce")))))
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
          .select(col("query_id"), col("rn"), col("neighbor_id"))
      }
      val truth = top3(64)
        .select(col("query_id").as("tq"), col("neighbor_id").as("tn"))
        .pinned // probed by every width
      ordered(Seq(8, 16, 32, 64).map { w =>
        val a = top3(w)
        a.join(truth, col("query_id") === col("tq") &&
            col("neighbor_id") === col("tn"), "left")
          .groupBy(col("query_id")).agg(
            count(col("tn")).as("nh"),
            min(when(col("tn").isNotNull, col("rn"))).as("frank"))
          .agg(sum(col("nh")).as("n_hits"),
            dec4S(sum(col("nh")).cast("double") / lit(30.0)).as("recall"),
            dec4S(sum(dec4(coalesce(lit(1.0) / col("frank"), lit(0.0))))
              .cast("double") / lit(10.0)).as("mrr"))
          .select(lit(w).as("width"), col("n_hits"), col("recall"), col("mrr"))
      }.reduce(_ unionByName _))
    }),

    // ---- SIM-JL: random-projection recall curve (`vec_jl`) — the
    //      DATA-INDEPENDENT dimension-reduction audit complementing
    //      SIM-MRL: Matryoshka truncation only works if the embedding was
    //      TRAINED nested; a Johnson–Lindenstrauss ±1 projection
    //      (Achlioptas 2003, public — database-friendly random signs,
    //      no Gaussians needed) works on ANY embedding, at the cost the
    //      JL lemma bounds by the projected width. Measured at the same
    //      widths as vec_mrl (8/16/32) against the same raw-cosine truth
    //      rule, so the two curves read side by side: trained truncation
    //      vs oblivious projection at equal serving budgets. ONE 32-wide
    //      projection is computed and each width ranks over its PREFIX —
    //      a prefix of a ±1 sign matrix is itself a ±1 sign matrix, so
    //      the narrower widths are honest JL projections (ivf_curve's
    //      one-pool rule, with dimension as the axis). Determinism: the
    //      sign matrix is md5-derived IN BOTH ENGINES (first hex char
    //      0–7 → +1), vectors enter on the dec4 grid as scaled int64,
    //      projections are exact integer sums (|y_j| ≤ 64·2·10⁴ ≈ 10⁶),
    //      projected dots stay < 2⁵³ so the double fold is exact; the
    //      only doubles are the final norm divides, ranks tie by
    //      neighbor_id. Scale shape: the 2048-row sign matrix broadcasts
    //      (index metadata, like SIM-1g's grid); projection = explode +
    //      two map-side-combined aggregates, scan-proportional; the
    //      brute legs are the measured audit (query-batch × corpus,
    //      declared sample-able — ddp_eval's rationale); production
    //      serves the chosen width through the IVF/LSH paths unchanged. ----
    "vec_jl" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val xiC = transform(col("embedding"),
        x => floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("long"))
      val lf = emb.select(col("vec_id"), posexplode(xiC).as(Seq("d0", "x")))
        .select(col("vec_id"), (col("d0") + 1).as("dd"), col("x"))
      val mat = s.range(1, 33).select(col("id").as("j"),
          explode(sequence(lit(1L), lit(64L))).as("dd"))
        .withColumn("sgn", when(substring(md5(concat(
            col("j").cast("string"), lit("_"), col("dd").cast("string"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1L))
          .otherwise(lit(-1L)))
      val proj = lf.join(broadcast(mat), Seq("dd"))
        .groupBy(col("vec_id"), col("j"))
        .agg(sum(col("sgn") * col("x")).as("yj"))
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("j"), col("yj")))).as("pp"))
        .select(col("vec_id"), transform(col("pp"),
          p => p.getField("yj").cast("double")).as("p"))
        .pinned // read by all three width legs
      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("cs").desc, col("neighbor_id").asc)
      def top3(w: Int) = {
        val q = proj.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), slice(col("p"), 1, w).as("qe"))
        val c = proj.select(col("vec_id").as("neighbor_id"),
          slice(col("p"), 1, w).as("ce"))
        broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
          .withColumn("cs", dot_product(col("qe"), col("ce")) /
            (sqrt(dot_product(col("qe"), col("qe"))) *
              sqrt(dot_product(col("ce"), col("ce")))))
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
          .select(col("query_id"), col("rn"), col("neighbor_id"))
      }
      // Truth = the RAW 64-d cosine top-3 (the shared audit rule): JL is
      // judged against the original space, not against itself.
      val truth = bruteTruthTop3(s, d)
        .select(col("query_id").as("tq"), col("neighbor_id").as("tn"))
        .pinned // probed by every width
      ordered(Seq(8, 16, 32).map { w =>
        val a = top3(w)
        a.join(truth, col("query_id") === col("tq") &&
            col("neighbor_id") === col("tn"), "left")
          .groupBy(col("query_id")).agg(
            count(col("tn")).as("nh"),
            min(when(col("tn").isNotNull, col("rn"))).as("frank"))
          .agg(sum(col("nh")).as("n_hits"),
            dec4S(sum(col("nh")).cast("double") / lit(30.0)).as("recall"),
            dec4S(sum(dec4(coalesce(lit(1.0) / col("frank"), lit(0.0))))
              .cast("double") / lit(10.0)).as("mrr"))
          .select(lit(w).as("width"), col("n_hits"), col("recall"), col("mrr"))
      }.reduce(_ unionByName _))
    }),

    // ---- KM-2: two Lloyd rounds + the monotone certificate
    //      (`kmeans_iter`) — KM-1 is one assignment; this CLOSES the
    //      loop: assign to the 8 seeds, recompute centroids EXACTLY
    //      (per-dim dec4-quantized means — the same tie-safe centroid
    //      discipline as SIM-1d, so both engines hold bit-identical
    //      updated centroids), re-assign, and report per round the
    //      inertia plus the reassignment count. Lloyd's theorem says
    //      inertia must NOT increase — shipping both rounds makes the
    //      certificate part of the gated output (and the oracle hash),
    //      not a side assertion. Shapes: each round is KM-1's job (seed
    //      broadcast, one distance pass, 8-row window argmin); the
    //      update is ONE 64-column map-side-combined aggregate per
    //      cluster (ivfRanked's centroid pattern — never a per-dim
    //      explode/shuffle); n_moved comes from a vec-keyed self-join of
    //      the two assignment relations. Iterating further = repeating
    //      this pair — the distributed Lloyd loop, demonstrated
    //      converging. ----
    "kmeans_iter" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val base = spread(emb, "vec_id").select(col("vec_id"), dbl.as("v"),
          dot_product(dbl, dbl).as("vv"))
        .pinned
      def assign(seeds: DataFrame): DataFrame = {
        val wv = Window.partitionBy(col("vec_id"))
          .orderBy(col("dist").asc, col("cid").asc)
        base.crossJoin(broadcast(seeds))
          .withColumn("dist",
            col("vv") + col("cc") - lit(2.0) * dot_product(col("v"), col("c")))
          .withColumn("rn", row_number().over(wv))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cid"), col("dist"), col("v"))
      }
      val seeds1 = base.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("v").as("c"),
          col("vv").as("cc"))
      val a1 = pin(assign(seeds1))
      // exact per-dim mean update, dec4-quantized (SIM-1d's centroid rule)
      val centCols = (1 to 64).map { i =>
        dec4(dsum4(element_at(col("v"), i)).cast("double") / count(lit(1)))
          .cast("double").as(s"m$i")
      }
      val seeds2 = a1.groupBy(col("cid")).agg(centCols.head, centCols.tail: _*)
        .select(col("cid"),
          array((1 to 64).map(i => col(s"m$i")): _*).as("c"))
        .withColumn("cc", dot_product(col("c"), col("c")))
      val a2 = pin(assign(seeds2))
      val moved = a1.select(col("vec_id"), col("cid").as("cid1"))
        .join(a2.select(col("vec_id"), col("cid").as("cid2")), Seq("vec_id"))
        .agg(sum(when(col("cid1") =!= col("cid2"), 1L).otherwise(0L)).as("nm"))
      def round(n: Int, a: DataFrame, mv: Column) =
        a.agg(cstr(dsum4(col("dist"))).as("inertia"))
          .select(lit(n).as("round"), col("inertia"))
          .crossJoin(broadcast(moved)).select(col("round"), col("inertia"),
            mv.as("n_moved"))
      ordered(round(1, a1, lit(0L))
        .unionByName(round(2, a2, col("nm"))))
    }),

    // ---- SIM-PQ-CURVE: recall-vs-shortlist tuning curve
    //      (`ivf_pq_curve`) — the lever SIM-EVAL3's single number says to
    //      pull, measured: the IVF-PQ stack's recall@3 at shortlist
    //      lengths {4, 8, 16} (how many ADC candidates the exact re-rank
    //      touches). ADC scores don't change with the shortlist — only
    //      membership does — so ONE scored pool (ivfPqRanked raw) feeds
    //      three tiny rank windows + re-ranks, never three pipelines
    //      (ivf_curve's one-pool rule). The reading: where the curve
    //      flattens is the re-rank budget; the gap to SIM-EVAL's
    //      IVF-exact recall at the same probes is pure PQ quantization
    //      loss, the number that prices the 64× compression. ----
    "ivf_pq_curve" -> ((s, d) => {
      val pool = pin(ivfPqRanked(s, d, raw = true))
      val truth = pin(bruteTruthTop3(s, d))
      // Re-rank inputs (query vectors + corpus vectors with norms) — the
      // truth leg is the shared bruteTruthTop3; only the per-shortlist
      // exact re-rank needs the raw vectors here.
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val base = emb.select(col("vec_id"), dbl.as("e"),
        sqrt(dot_product(dbl, dbl)).as("nrm"))
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
      val cc = base.select(col("vec_id").as("neighbor_id"), col("e").as("ce"),
        col("nrm").as("cn2"))
      val wAdc = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_raw").desc, col("neighbor_id").asc)
      val rows = Seq(4, 8, 16).map { ln =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score_raw").desc, col("neighbor_id").asc)
        val reranked = pool
          .withColumn("srn", row_number().over(wAdc)).filter(col("srn") <= ln)
          .join(cc, Seq("neighbor_id"))
          .join(broadcast(q.select(col("query_id"), col("qe"))), Seq("query_id"))
          .withColumn("score_raw",
            dot_product(col("qe"), col("ce")) / (col("qn") * col("cn2")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(col("query_id").as("iq"), col("neighbor_id").as("in_"))
        truth.join(reranked,
            col("query_id") === col("iq") && col("neighbor_id") === col("in_"),
            "left")
          .agg(count(lit(1)).as("n_truth"), count(col("iq")).as("n_hits"))
          .select(lit(ln).as("shortlist"), col("n_truth"), col("n_hits"))
      }
      ordered(rows.reduce(_ unionByName _)
        .withColumn("recall",
          dec4S(col("n_hits").cast("double") / col("n_truth").cast("double"))))
    }),

    // ---- SIM-CURVE: recall-vs-probes tuning curve (`ivf_curve`) — the
    //      lever SIM-EVAL's single number tells you to pull, measured:
    //      recall@3 at nprobe ∈ {1,2,3} from ONE widened IVF pass (the
    //      certified pipeline at maxProbe=3, returning the scored pool
    //      with each candidate's probe rank) — the nprobe=p result is
    //      just the pool filtered to probe_rank ≤ p and re-topped, so
    //      the curve costs one pipeline + three tiny rank windows, not
    //      three pipelines (a candidate's score doesn't change with
    //      nprobe; only membership does). This is the actual tuning
    //      artifact an ANN operator reads: where the curve flattens is
    //      the probe budget. Truth = SIM-EVAL's exact brute leg, pinned
    //      once. ----
    "ivf_curve" -> ((s, d) => {
      val pool = pin(ivfRanked(s, d, maxProbe = 3, raw = true))
      val truth = pin(bruteTruthTop3(s, d))
      val rows = (1 to 3).map { p =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score_raw").desc, col("neighbor_id").asc)
        val ivf = pool.filter(col("probe_rank") <= p)
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(col("query_id").as("iq"), col("neighbor_id").as("in_"))
        truth.join(ivf,
            col("query_id") === col("iq") && col("neighbor_id") === col("in_"),
            "left")
          .agg(count(lit(1)).as("n_truth"), count(col("iq")).as("n_hits"))
          .select(lit(p).as("nprobe"), col("n_truth"), col("n_hits"))
      }
      ordered(rows.reduce(_ unionByName _)
        .withColumn("recall",
          dec4S(col("n_hits").cast("double") / col("n_truth").cast("double"))))
    }),

    // ---- KM-1: one exact Lloyd iteration (`kmeans_step`) — the k-means
    //      TRAINING step the embedding family was missing (sim1_ivf
    //      ASSIGNS to fixed label-centroids; this is the update loop that
    //      LEARNS them): assign every vector to its nearest of k=8
    //      deterministic seeds (vec_id < 8) by squared L2, then report
    //      per cluster the Lloyd update audit — membership count, EXACT
    //      inertia (the quantity whose monotone decrease certifies a
    //      k-means implementation), and the updated-centroid mass
    //      Σ(element-sums)/n (= the new centroid's coordinate total, one
    //      number pinning the mean update without shipping 64 dims).
    //      Float discipline: dist = |v|² + |c|² − 2·v·c with every dot a
    //      codegen'd in-order fold (DotProduct ≡ DuckDB list_sum,
    //      sim1's certified pairing) — identical doubles, so the argmin
    //      (ties → smaller cid) is engine-independent; inertia and mass
    //      are dec4-per-row → exact decimal sums (order-free). Shape:
    //      seeds broadcast (k·dim numbers), ONE pass computes all k
    //      distances per vector, per-vector top-1 via an 8-row window
    //      keyed by vec_id (at scale: the same relation map-side reduces
    //      via min(struct(dist,cid)) — noted, not needed at k=8), then a
    //      k-row aggregate. Iterating = re-seeding from the update and
    //      re-running — each step is this one job, the standard
    //      distributed Lloyd round. ----
    "kmeans_step" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val base = spread(emb, "vec_id").select(col("vec_id"), dbl.as("v"),
          dot_product(dbl, dbl).as("vv"),
          aggregate(dbl, lit(0.0), (acc, x) => acc + x).as("es"))
        .pinned // read by the pair probe and (through rn=1) the census
      val seeds = base.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("v").as("c"),
          col("vv").as("cc"))
      val pairs = base.crossJoin(broadcast(seeds))
        .withColumn("dist",
          col("vv") + col("cc") - lit(2.0) * dot_product(col("v"), col("c")))
      val wv = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist").asc, col("cid").asc)
      ordered(pairs.withColumn("rn", row_number().over(wv))
        .filter(col("rn") === 1)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_vecs"),
          cstr(dsum4(col("dist"))).as("inertia"),
          dec4S(sum(dec4(col("es"))).cast("double") /
            count(lit(1)).cast("double")).as("centroid_mass")))
    }),

    // ---- SIM-1b: LSH-bucketed ANN (sign-bit coarse quantization) —
    //      the 100 TB path: candidates only within the same bucket ----
    "sim1_lsh" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      def bucket = (when(element_at(col("e"), 1) > 0.0, 4).otherwise(0) +
        when(element_at(col("e"), 2) > 0.0, 2).otherwise(0) +
        when(element_at(col("e"), 3) > 0.0, 1).otherwise(0)).cast("int")
      val base = emb.select(col("vec_id"), dbl.as("e"),
        sqrt(dot_product(dbl, dbl)).as("nrm"))
        .withColumn("bucket", bucket)
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("nrm").as("qn"), col("bucket").as("qb"))
      val c = base.select(col("vec_id").as("neighbor_id"), col("e").as("ce"),
        col("nrm").as("cn"), col("bucket").as("cb"))
      val dot = dot_product(col("qe"), col("ce"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_raw").desc, col("neighbor_id").asc)
      ordered(broadcast(q).join(c,
        col("qb") === col("cb") && col("query_id") =!= col("neighbor_id"))
        .withColumn("score_raw", dot / (col("qn") * col("cn")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          dec4S(col("score_raw")).as("score")))
    }),

    // ---- SIM-2: exact pairwise Jaccard near-dup (τ=0.95) via the
    //      prefix-filtered inverted index — see prefixJaccardPairs. ----
    "sim2" -> ((s, d) => {
      val doc = load(s, d, "documents")
      prefixJaccardPairs(doc.select(col("doc_id"), col("lang"),
        toks(col("text")).as("set")).withColumn("n", size(col("set"))), 19, 20)
    }),

    // ---- DDP-2: exact text dedup with deterministic keeper ----
    // ---- DDP-NORM: normalized-exact dedup (`ddp_norm_exact`) — the
    //      cheap MIDDLE RUNG of the dedup ladder the family was missing:
    //      DDP-1 hashes raw bytes (misses a single case/punct flip),
    //      MinHash pays signatures for fuzzy matches; grouping by
    //      TXT-NORM's canonical text catches the trivial-variant mass
    //      (case, punctuation, whitespace) at exactly DDP-1's cost — one
    //      groupBy on a derived key, still no pairs, no sketches. The
    //      corpus is already normalized, so doc_id%11 docs get their
    //      text UPPERCASED (IMP-1's provably-fires pattern, mirrored in
    //      the oracle): every doc_id%11 doc re-enters the feed as an
    //      UPPERCASED copy under a shifted id (recon's synthesized-delta
    //      pattern) — byte-exact dedup sees two distinct texts, the
    //      normalized key folds the pair (n_copies=2, n_raw_variants=2).
    //      Same keeper election + map-side-combined shape as DDP-1; at
    //      100 TB the normalized key is hashed scan-side (content-
    //      defined fingerprint), never a second text copy through the
    //      shuffle. ----
    "ddp_norm_exact" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val feed = doc.select(col("doc_id"), col("text").as("t2"))
        .unionAll(doc.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            upper(col("text")).as("t2")))
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("t2")), "[^a-z0-9 ]", " "), " +", " "))
      ordered(feed
        .select(col("doc_id"), col("t2"), norm.as("nt"))
        .groupBy(md5(col("nt")).as("norm_md5"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_copies"),
          countDistinct(col("t2")).as("n_raw_variants"))
        .filter(col("n_copies") >= 2))
    }),

    "ddp_exact" -> ((s, d) => {
      val doc = load(s, d, "documents")
      ordered(doc.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .select(col("keeper"), col("n_copies"), length(col("text")).as("text_len")))
    }),

    // ---- DDP-EVAL: sketch-quality audit — measured recall/precision of
    //      the MinHash-LSH CANDIDATE set against exact-Jaccard ground
    //      truth (τ=0.95 on word-bigram shingles, the predicate the
    //      verify stage enforces — deliberately NOT language-blocked,
    //      because the band join isn't either). This is the audit a
    //      dedup pipeline ships alongside its sketch: banding trades
    //      recall for candidate volume (2 bands × 4 rows here), and the
    //      trade must be MEASURED, not assumed — a recall regression
    //      after a shingling change is invisible in the pair list itself.
    //      Truth = the prefix-filtered AllPairs exact join (sim2's
    //      machinery over shingle sets, lang-blocking disabled via a
    //      constant key); candidates = the raw band-bucket pairs BEFORE
    //      verification. At 100 TB the exact-truth side is the expensive
    //      leg, so the audit runs on a SAMPLED slice (the standard
    //      methodology: measure recall on a sample, tune bands/rows,
    //      sketch fleet-wide) — the query shape is unchanged, only the
    //      input is. Outputs are exact integer counts + exact-ratio
    //      dec4 metrics: fully oracle-hashable. ----
    "ddp_eval" -> ((s, d) => {
      // The audit runs on a deterministic 1/3 document sample — not an
      // optimization shortcut but the methodology itself (see the scale
      // note above): the exact-truth AllPairs leg is the expensive part
      // everywhere, and band recall measured on a sample estimates fleet
      // recall. On this low-bigram-diversity synthetic corpus the full
      // prefix index degenerates toward the naive join (rarity can't
      // shrink prefixes when the shingle vocabulary is tiny), measured
      // 17 s full / 8.4 s half / ~4 s third at sf0.1 — pair work falls
      // quadratically in the rate while the recall estimate stays
      // populated (3 truth pairs at sf0.01, ~25 at sf0.1).
      val doc = load(s, d, "documents").filter(pmod(col("doc_id"), lit(3)) === 0)
      val bands = minhashBands(spread(doc), useUdaf = false)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
        .withColumn("is_cand", lit(1))
        .pinned
      bands.unpersist()
      val truth = prefixJaccardPairs(doc.select(col("doc_id"),
          lit("x").as("lang"), shingles(col("text")).as("set"))
          .withColumn("n", size(col("set"))), 19, 20)
        .select(col("d1"), col("d2")).withColumn("is_true", lit(1))
      ordered(truth.join(cand, Seq("d1", "d2"), "full_outer").agg(
          count(when(col("is_true") === 1, 1)).as("n_true"),
          count(when(col("is_cand") === 1, 1)).as("n_cand"),
          count(when(col("is_true") === 1 && col("is_cand") === 1, 1)).as("n_hit"))
        .select(col("n_true"), col("n_cand"), col("n_hit"),
          dec4S(col("n_hit").cast("double") / col("n_true").cast("double")).as("recall"),
          dec4S(col("n_hit").cast("double") / col("n_cand").cast("double")).as("precision")))
    }),

    // ---- ASSOC-1: word co-occurrence association mining (`cooc_lift`) —
    //      the market-basket/PMI family over documents: word pairs
    //      co-occurring in the same doc, support-thresholded, ranked by
    //      LIFT = N·c(ab)/(c(a)·c(b)). Lift is deliberately shipped
    //      instead of PMI: PMI = ln(lift) is rank-equivalent, and a
    //      single `ln` per row would hang cross-engine hashing on libm
    //      1-ulp agreement (§5.3) — lift needs only exact-integer
    //      products (< 2⁵³) and one correctly-rounded division, bit-equal
    //      anywhere. Shape: distinct (doc, word) first (multiplicity is
    //      presence, not frequency), DF-PRUNED before pairing (a semi-
    //      join against the df ≥ 20 vocabulary — words rarer than the
    //      support threshold cannot survive cab ≥ 20 since cab ≤
    //      min(ca, cb), so the self-join fans out only over HOT words),
    //      per-doc pair explode bounded by hot-distinct-words-per-doc²
    //      (vocabulary-bounded, NOT doc-length-
    //      bounded), map-side-combined pair counts, word counts broadcast
    //      back, global top-k = TakeOrderedAndProject. At 100 TB the
    //      per-doc pair fan-out is the declared cost — capped by keeping
    //      only each doc's top-m distinct words (by global rarity) when
    //      vocabularies are unbounded; this corpus's ~31-word vocabulary
    //      needs no cap. ----
    "cooc_lift" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      val dw = doc.select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
        .filter(col("w") =!= "")
        .pinned
      // Corpus size attached as a 1-row broadcast scalar (tfidf1's shape),
      // never a driver action.
      val nDocs = dw.select(col("doc_id")).distinct()
        .agg(count(lit(1)).as("n_docs"))
      // Vocab-sized; read three times (the df-prune semi-join below plus
      // the two c1-broadcast joins), so pinned once.
      val wc = dw.groupBy(col("w")).agg(count(lit(1)).as("c1")).pinned
      // DF-PRUNE BEFORE THE SELF-JOIN (r12, the r11 verdict's one found
      // scale-killer): a surviving pair needs cab >= 20 and cab <=
      // min(ca, cb), so any word with global df < 20 can never appear in
      // the output — semi-joining the (doc, word) relation against the
      // df-thresholded vocabulary FIRST bounds the per-doc pair fan-out
      // by the HOT vocabulary, not the full one. Result-identical by the
      // cab <= min(ca, cb) containment; plan-pinned in PlanGuardSpec.
      // No broadcast hint: hot derives from the PINNED wc, so AQE sees
      // its true size and broadcasts it at any tested SF; at 100 TB a
      // Heaps-law hot vocabulary can outgrow the broadcast budget and
      // the same plan degrades to a shuffle semi-join instead of OOMing
      // the driver.
      val hot = wc.filter(col("c1") >= 20).select(col("w"))
      val dwh = dw.join(hot, Seq("w"), "left_semi")
      val a = dwh.select(col("doc_id"), col("w").as("w1"))
      val b = dwh.select(col("doc_id"), col("w").as("w2"))
      val pairs = a.join(b, Seq("doc_id")).filter(col("w1") < col("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 20)
      ordered(pairs
        .join(broadcast(wc.select(col("w").as("w1"), col("c1").as("ca"))), Seq("w1"))
        .join(broadcast(wc.select(col("w").as("w2"), col("c1").as("cb"))), Seq("w2"))
        .crossJoin(broadcast(nDocs))
        // Ranked on the DECIMAL (numeric order — the rendered string would
        // sort "9.x" above "12.x"), rendered after the top-k.
        .withColumn("lift_d", dec4((col("n_docs") * col("cab")).cast("double") /
          (col("ca") * col("cb")).cast("double")))
        .orderBy(col("lift_d").desc, col("w1").asc, col("w2").asc)
        .limit(30)
        .select(col("w1"), col("w2"), col("cab"), col("ca"), col("cb"),
          cstr(col("lift_d")).as("lift")))
    }),

    // ---- DDP-LEAK: split-leakage audit (`split_leakage`) — the eval-
    //      integrity op: near-dup pairs that STRADDLE the train/val/test
    //      boundary are silent eval contamination (the model has "seen"
    //      a near-copy of the test doc). SMP-1's content-hash split
    //      co-locates EXACT duplicates by construction, so exact-dup
    //      leakage is zero by design — near-dups (jac ≥ 0.95 but not
    //      byte-identical) are precisely what can still leak, and this
    //      measures it: per canonical split pair (split_a ≤ split_b),
    //      the straddling near-dup pair count and the distinct docs
    //      involved. Composition of two certified pieces (minhash pair
    //      relation + the content-hash split), so the audit costs one
    //      tiny split join beyond the dedup pass a pipeline already
    //      runs; at 100 TB it rides the same banding index. ----
    "split_leakage" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val bucket = polyHash(col("text")) % lit(100L)
      val split_ = when(bucket < 80, lit("train"))
        .when(bucket < 90, lit("val")).otherwise(lit("test"))
      val splits = doc.select(col("doc_id"), split_.as("split"))
      val canon = minhashPairs(doc, useUdaf = false)
        .join(splits.select(col("doc_id").as("d1"), col("split").as("s1")), Seq("d1"))
        .join(splits.select(col("doc_id").as("d2"), col("split").as("s2")), Seq("d2"))
        .select(least(col("s1"), col("s2")).as("split_a"),
          greatest(col("s1"), col("s2")).as("split_b"), col("d1"), col("d2"))
        // Pinned: both aggregates below read canon, and an unpinned canon
        // re-runs the full-text polyHash split scan TWICE per branch (the
        // multiply-read-intermediate rule; cost ∝ corpus text size).
        .pinned
      val e = canon.groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_pairs"))
      val dv = canon.select(col("split_a"), col("split_b"),
          explode(array(col("d1"), col("d2"))).as("doc"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(countDistinct(col("doc")).as("n_docs"))
      ordered(e.join(dv, Seq("split_a", "split_b")))
    }),

    // ---- SIM-3 / DDP-3: MinHash + LSH banding near-dup (the sketch path) ----
    "ddp_minhash" -> ((s, d) => minhashNearDup(load(s, d, "documents"), useUdaf = false)),

    // Same declared query, signature built by the MinHashSketch
    // TypedImperativeAggregate (SURVEY §2.6) — one mutable 8-slot buffer per
    // doc instead of 8 builtin min aggregates. Identical oracle SQL.
    "ddp_minhash_udaf" -> ((s, d) => minhashNearDup(load(s, d, "documents"), useUdaf = true)),

    // ---- DDP-INCR: incremental near-dup admission — dedup a NEW batch
    //      against the standing corpus without re-pairing the corpus with
    //      itself. The daily-ingest shape: at 100 TB the corpus band table
    //      is a persisted, bucketed index (one-time build, appended each
    //      day); the daily job sketches ONLY the batch and probes
    //      newBands ⋈ allBands — shuffle ∝ batch bands + matching index
    //      buckets, never corpus². Here both sides derive from the same
    //      table (no cross-run state in a gated query), but the join
    //      asymmetry IS the plan: corpus∖batch docs never pair with each
    //      other. Batch = doc_id % 10 == 7 (a deterministic ~10% stand-in).
    //      Output: each verified pair touching a new doc, with vs_corpus
    //      marking dup-of-existing (drop the new doc) vs dup-within-batch
    //      (keep one of them) — the two actions an admission gate takes. ----
    "ddp_incr" -> ((s, d) => {
      val verified = incrPairs(s, d)
      ordered(verified.select(col("d1"), col("d2"), dec4S(col("jac")).as("jac"),
        (!(incrIsNew(col("d1")) && incrIsNew(col("d2")))).as("vs_corpus")))
    }),

    // ---- DDP-INCR-BEST: the LINEAR-output admission gate — one row per
    //      new doc that matched anything: its single best existing match
    //      (max Jaccard, ties to the smallest doc_id). This is the
    //      production reduction of ddp_incr's pair list (measured ×579
    //      output amplification on the ×10 clique probe, SURVEY §4.4.8):
    //      the gate decides admit/reject PER NEW DOC, so the emitted
    //      relation is bounded by the batch size no matter how big the
    //      dup cliques get. Per-group top-1 plans as WindowGroupLimit —
    //      map-side one-row-per-new-doc state, same as cdc_latest. ----
    "ddp_incr_best" -> ((s, d) => {
      val verified = incrPairs(s, d)
      // Orient every pair around its new side(s): a batch-batch pair is an
      // admission candidate for BOTH of its docs.
      val oriented = verified
        .filter(incrIsNew(col("d1")))
        .select(col("d1").as("doc_id"), col("d2").as("match_id"), col("jac"))
        .unionByName(verified.filter(incrIsNew(col("d2")))
          .select(col("d2").as("doc_id"), col("d1").as("match_id"), col("jac")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("jac").desc, col("match_id").asc)
      ordered(oriented.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("match_id"), dec4S(col("jac")).as("jac"),
          (!incrIsNew(col("match_id"))).as("vs_corpus")))
    }),

    // DDP-CLUSTER: one row per doc — connected component over the verified
    // near-dup graph + keeper election (see clusterAssign).
    "ddp_cluster" -> ((s, d) => {
      val doc = load(s, d, "documents")
      clusterAssign(doc, minhashPairs(doc, useUdaf = true, capBuckets = true))
    }),

    // ---- DDP-KEEPER: cross-source keeper election (`ddp_keeper_src`) —
    //      WHICH copy survives dedup is a policy, not an accident:
    //      production pipelines keep the copy from the most trusted
    //      source among near-duplicates (wiki over CC, curated over
    //      scraped), not the lowest id. Per near-dup cluster the keeper
    //      is elected by (source, doc_id) — the source name IS the rank
    //      here under binary collation; production supplies an explicit
    //      priority table joined the same way. One row per doc with its
    //      cluster, elected keeper + keeper's source, and survival flag.
    //      Shape: DDP-CLUSTER's certified component assignment + one
    //      source join + a WindowGroupLimit top-1 per cluster — the
    //      election costs one window over the linear cluster relation,
    //      never touching the quadratic pair space. ----
    "ddp_keeper_src" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val clusters = clusterAssign(doc,
        minhashPairs(doc, useUdaf = false, capBuckets = true))
        .select(col("doc_id"), col("cluster_id"))
      val withSrc = clusters.join(
        doc.select(col("doc_id"), col("source")), Seq("doc_id"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("source").asc, col("doc_id").asc)
      val keepers = withSrc.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cluster_id").as("kc"), col("doc_id").as("keeper_doc"),
          col("source").as("keeper_src"))
      ordered(withSrc.join(keepers, col("cluster_id") === col("kc"))
        .select(col("doc_id"), col("source"), col("cluster_id"),
          col("keeper_doc"), col("keeper_src"),
          (col("doc_id") === col("keeper_doc")).as("is_keeper")))
    }),

    // PIPELINE: the end-to-end training-data cleaning shape — quality
    // filter, then near-dup cluster assignment, then keep one doc per
    // cluster (the keeper among surviving docs), reporting per-lang
    // retention. Composes TXT quality + SIM-3 clustering + AGG; this is
    // the query an LLM data pipeline runs nightly.
    // DESIGN NOTE (accepted cost): within one Bench/Verify run this query
    // rebuilds the minhash sketch that ddp_cluster also builds (~5 s of the
    // bench total at sf0.1) instead of sharing a checkpointed pair relation
    // across query-map entries. Deliberate: each gated query is a
    // self-contained program (the harness hash-compares them in isolation
    // and clears caches between entries), and a production nightly run
    // composes the stages exactly once, so the double cost is a test-
    // harness artifact, not a pipeline property. Cross-query sketch reuse
    // would couple entries through hidden shared state for a bench-only
    // win — wrong trade.
    "pipeline_clean" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val clusters = clusterAssign(doc, minhashPairs(doc, useUdaf = true))
        .select(col("doc_id"), col("cluster_id"))
      val quality = doc.filter(col("n_chars") >= 100 &&
          size(split(col("text"), " ")) >= 20)
      val kept = quality.join(clusters, "doc_id")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("cluster_id")).orderBy(col("doc_id").asc)))
        .filter(col("rk") === 1)
      ordered(kept.groupBy(col("lang")).agg(
        count(lit(1)).as("n_kept"),
        davgS(col("n_chars")).as("avg_chars")))
    }),

    // ---- DDP-4: SimHash near-dup (62-bit sketch, hamming ≤ 2), banded.
    //      Signature: per-bit weighted sums over TWO portable 31-bit token
    //      hash streams (h and h2 = (A0·h + B0) mod P) — 62 bits total, the
    //      Manku-et-al-style wide fingerprint a real dedup needs (a 16-bit
    //      sig can't discriminate beyond toy corpora). Candidates come from
    //      an EQUI join on 16-bit signature chunks: hamming ≤ 2 corrupts at
    //      most 2 of the 4 chunks, so every qualifying pair agrees exactly
    //      on ≥ 2 (pigeonhole) — and a wide signature makes chunk buckets
    //      sparse, so the join fan-out tracks the true near-dup count
    //      instead of n²/lang. Exact bit_count verify closes the loop. ----
    "ddp_simhash" -> ((s, d) => {
      // No `spread` here: unigram tokenization is cheap (no shingle
      // construction), so the extra exchange costs more than it saves.
      val doc = load(s, d, "documents")
      val tok = doc.select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("tok"))
        .withColumn("h", polyHash(col("tok")))
        .withColumn("h2", (lit(As.head) * col("h") + lit(Bs.head)) % lit(P))
      def bitOf(j: Int): Column =
        if (j < 31) shiftright(col("h"), j) else shiftright(col("h2"), j - 31)
      val bitSums = (0 until 62).map { j =>
        sum(when(bitOf(j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")
      }
      val sig = tok.groupBy(col("doc_id"), col("lang")).agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash", (0 until 62).map { j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _))
        .select(col("doc_id"), col("lang"), col("simhash"))
        // Eager materialization instead of persist(): the 1-row-per-doc
        // signature table is tiny, both self-join sides read the same
        // blocks, and no CacheManager entry outlives the query.
        .pinned
      val chunks = array((0 until 4).map { ci =>
        struct(lit(ci).as("ci"),
          shiftright(col("simhash"), 16 * ci).bitwiseAND(lit(0xFFFFL)).as("cv"))
      }: _*)
      val banded = sig.select(col("doc_id"), col("lang"), col("simhash"),
        explode(chunks).as("c"))
        .select(col("doc_id"), col("lang"), col("simhash"),
          col("c.ci").as("ci"), col("c.cv").as("cv"))
      val a = banded.select(col("doc_id").as("d1"), col("lang").as("l1"),
        col("simhash").as("h1"), col("ci").as("ci1"), col("cv").as("cv1"))
      val b = banded.select(col("doc_id").as("d2"), col("lang").as("l2"),
        col("simhash").as("h2"), col("ci").as("ci2"), col("cv").as("cv2"))
      val cand = a.join(b, col("ci1") === col("ci2") && col("cv1") === col("cv2") &&
          col("l1") === col("l2") && col("d1") < col("d2"))
        .select(col("d1"), col("d2"), col("h1"), col("h2")).distinct()
      ordered(cand
        .withColumn("hamming", expr("bit_count(h1 ^ h2)").cast("int"))
        .filter(col("hamming") <= 2)
        .select(col("d1"), col("d2"), col("hamming")))
    }),

    // ---- DDP-5: word-bigram (n-gram) Jaccard near-dup (τ=0.5) via the
    //      counting inverted index: explode grams -> self-equi-join on
    //      (gram, lang) with the lossless length band (min*2 >= max) ->
    //      count shared grams per pair -> jac = ni/(n1+n2-ni). At low τ a
    //      prefix filter admits too many candidates (a τ=0.5 prefix is
    //      half the doc) and per-pair verify dominates — measured 46s vs
    //      19s at sf0.1 — so counting wins; at open-web corpus scale a
    //      low-τ exact join routes through the MinHash path instead. ----
    "ddp_ngram" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val t = spread(doc).select(col("doc_id"), col("lang"),
          shingles(col("text")).as("grams"))
        .withColumn("ng", size(col("grams")))
      // Materialized once for both sides of the postings self-join;
      // inherits `spread`'s partitioning, so the join probe emitting the
      // 7M-row fan-out and the per-pair partial counts run wide.
      // A df>=2 gram prefilter (singleton grams cannot form a pair, so a
      // map-side-combined count + left-semi on (lang, gram) is result-
      // identical) is the standard open-web move — on Zipf text most
      // bigrams are singletons and the self-join inputs collapse. Measured
      // HERE and rejected as the DEFAULT: this synthetic corpus has only
      // 4,617 distinct bigrams and 99.98% of postings are df>=2, so the
      // extra agg + semi-join + materialization bought nothing and cost 8%
      // (8.8s vs 8.2s steady at sf0.1). The 100 TB reinstate is a CONFIG
      // FLIP, not a rewrite: `spark.graft.ddp.ngram.dfPrefilter=true`
      // routes through the filter (result-identity certified in
      // PipelineOpsSpec — same pairs, same jaccards, both paths measured:
      // flag off 8.2 s / on 8.8 s steady sf0.1).
      // NO explicit repartition around this checkpoint — measured both
      // placements and rejected both (steady sf0.1: plain 8.0 s, before
      // the checkpoint 7.9 s, after it 9.0 s). At this SF one posting
      // side broadcasts (SPARK_GRAFT_FINAL=1 Explain shows the BHJ), so
      // either repartition is a pure extra shuffle in front of a
      // broadcast join, and the probe already runs at the checkpoint's
      // inherited spread() width — the useful-width property sim2 pins
      // explicitly. At 100 TB (no broadcastable side, SMJ) the same
      // repartition would ALSO be wrong for a second reason: a
      // user-specified repartition is ineligible for AQE skew splitting
      // (OptimizeSkewedJoin requires ENSURE_REQUIREMENTS shuffles), and
      // hot grams are THE hazard of a posting self-join on Zipf text —
      // plan-guarded in PlanGuardSpec with broadcast disabled.
      val g0 = t.select(col("doc_id"), col("lang"), col("ng"), explode(col("grams")).as("gram"))
      val g = (if (s.conf.getOption("spark.graft.ddp.ngram.dfPrefilter").exists(_.toBoolean))
          g0.join(g0.groupBy(col("lang"), col("gram"))
              .agg(count(lit(1)).as("df")).filter(col("df") >= 2)
              .select(col("lang"), col("gram")),
            Seq("lang", "gram"), "left_semi")
        else g0)
        .pinned
      val a = g.select(col("doc_id").as("d1"), col("lang").as("l1"),
        col("ng").as("n1"), col("gram").as("gr1"))
      val b = g.select(col("doc_id").as("d2"), col("lang").as("l2"),
        col("ng").as("n2"), col("gram").as("gr2"))
      val cand = a.join(b, col("gr1") === col("gr2") && col("l1") === col("l2") &&
          col("d1") < col("d2") &&
          col("n1") * 2 >= col("n2") && col("n2") * 2 >= col("n1"))
        .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
        .agg(count(lit(1)).as("ni"))
      ordered(cand
        .withColumn("jac", col("ni").cast("double") /
          (col("n1") + col("n2") - col("ni")).cast("double"))
        .filter(col("jac") >= 0.5)
        .select(col("d1"), col("d2"), dec4S(col("jac")).as("jac")))
    }),

    // ---- DDP-WIN: winnowing fingerprint near-dup candidates
    //      (`ddp_winnow`) — the GUARANTEED-detection point on the dedup
    //      ladder (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
    //      algorithm): hash every word 3-gram (k=3), slide a window of
    //      w=4 consecutive hashes, keep each window's MINIMUM — any two
    //      docs sharing a run of ≥ w+k−1 = 6 words share a fingerprint
    //      BY CONSTRUCTION (the shared window's min is selected in both),
    //      a determinism minhash/simhash can't offer, at expected density
    //      2/(w+1) ≈ 0.4 of the gram stream. Docs with < w grams winnow
    //      to their global min (the final partial window). Selection is
    //      by distinct min VALUE per doc (the robust-winnowing variant:
    //      value-set selection makes tie-position bookkeeping moot and
    //      keeps the guarantee). Candidates = fingerprint-postings
    //      equi-join (lang-scoped, d1<d2), scored by fingerprint-set
    //      jaccard ≥ 0.35. Cross-engine: the hash is md5 (identical hex
    //      in both engines), minima compare lexicographically, so the
    //      fingerprint sets are engine-identical. Scale: postings are
    //      winnow-SPARSIFIED (~0.4× the gram postings feeding ddp_ngram)
    //      and the join is the same AQE-skew-splittable shuffle shape;
    //      the df-prefilter knob composes here exactly as there. The
    //      per-doc window is position-ordered WITHIN doc (partitioned,
    //      frame-bounded) — no global sort anywhere. ----
    "ddp_winnow" -> ((s, d) => {
      val W = 4
      val doc = load(s, d, "documents")
      val t = spread(doc).select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("ws"))
        .withColumn("nw", size(col("ws")))
        .filter(col("nw") >= 3)
        .withColumn("ng", col("nw") - 2)
      val g = t.select(col("doc_id"), col("lang"), col("ng"),
        posexplode(transform(sequence(lit(1), col("ng")),
          i => md5(concat_ws(" ", element_at(col("ws"), i),
            element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "h")
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        .rowsBetween(-(W - 1), 0)
      val fps0 = g.withColumn("wmin", min(col("h")).over(wd))
        // full windows only — plus the last (partial) window of short docs
        .filter(col("p") >= W - 1 || col("p") === col("ng") - 1)
        .select(col("doc_id"), col("lang"), col("wmin")).distinct()
        .withColumn("nf", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // ddp_ngram's df>=2 prefilter, one level up: a fingerprint held by a
      // single doc cannot form a pair, so a left-semi against the df>=2
      // fingerprint set is result-identical (PipelineOpsSpec pins it) —
      // `nf` is computed BEFORE the prune (jaccard denominators use the
      // full fingerprint sets, exactly as the unfiltered join sees them).
      // Same config flip, same rationale: pays off on open-web Zipf
      // fingerprint postings, not on this synthetic corpus.
      val fps = (if (s.conf.getOption("spark.graft.ddp.winnow.dfPrefilter")
          .exists(_.toBoolean))
        fps0.join(fps0.groupBy(col("lang"), col("wmin"))
            .agg(count(lit(1)).as("df")).filter(col("df") >= 2)
            .select(col("lang"), col("wmin")),
          Seq("lang", "wmin"), "left_semi")
      else fps0)
        .pinned
      val fa = fps.select(col("doc_id").as("d1"), col("lang").as("l1"),
        col("nf").as("f1"), col("wmin").as("w1"))
      val fb = fps.select(col("doc_id").as("d2"), col("lang").as("l2"),
        col("nf").as("f2"), col("wmin").as("w2"))
      val cand = fa.join(fb, col("w1") === col("w2") && col("l1") === col("l2") &&
          col("d1") < col("d2"))
        .groupBy(col("d1"), col("d2"), col("f1"), col("f2"))
        .agg(count(lit(1)).as("ni"))
      ordered(cand
        .withColumn("jac", col("ni").cast("double") /
          (col("f1") + col("f2") - col("ni")).cast("double"))
        .filter(col("jac") >= 0.35)
        .select(col("d1"), col("d2"), col("ni").as("n_shared"),
          dec4S(col("jac")).as("jac")))
    }),

    // ---- DDP-6: embedding-cosine near-dup pairs, LSH-blocked. Declared
    //      semantics: candidate pairs must share the 4-bit sign bucket of
    //      dims 1-4 (random-hyperplane LSH with axis-aligned planes) — the
    //      oracle declares the identical bucket, so engine and oracle agree
    //      exactly. The bucket is an EQUI join key: Spark plans a shuffled
    //      hash join on bucket instead of an all-pairs nested loop, which is
    //      the difference between O(n²) and O(n²/2^bits) with a shuffle that
    //      co-locates each bucket. At 100 TB you'd widen to multi-table LSH
    //      (see sim1_lsh) and re-verify exactly, same shape.
    //      MEASURED RECALL (sf0.1, 2000 vecs, vs numpy brute force): the
    //      single 4-bit bucket retains 134/920 = 0.146 of the pairs with
    //      cos ≥ 0.4 — matching theory: sign-LSH collision prob per plane
    //      is 1-θ/π = 0.631 at cos 0.4, so a 4-bit table keeps 0.631⁴ ≈
    //      0.16. τ=0.4 is BELOW sign-LSH's effective range by design: at
    //      the thresholds embedding dedup actually runs (τ ≥ 0.8, p_plane
    //      ≈ 0.8) four such tables retain ≥ 0.87, but this synthetic
    //      corpus has zero pairs there (1 pair at τ=0.6, none above 0.7),
    //      so 0.4 is the only measurable regime. The declared semantics
    //      (same-bucket AND cos ≥ τ) stay oracle-exact either way; the
    //      multi-table recall ladder is ddp_embed_multi below. ----
    "ddp_embed" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      def bucket = (when(element_at(col("e"), 1) > 0.0, 8).otherwise(0) +
        when(element_at(col("e"), 2) > 0.0, 4).otherwise(0) +
        when(element_at(col("e"), 3) > 0.0, 2).otherwise(0) +
        when(element_at(col("e"), 4) > 0.0, 1).otherwise(0)).cast("int")
      val base = emb.select(col("vec_id"), dbl.as("e"),
        sqrt(dot_product(dbl, dbl)).as("nrm"))
        .withColumn("bucket", bucket)
      val a = base.select(col("vec_id").as("v1"), col("e").as("e1"),
        col("nrm").as("n1"), col("bucket").as("b1"))
      val b = base.select(col("vec_id").as("v2"), col("e").as("e2"),
        col("nrm").as("n2"), col("bucket").as("b2"))
      val dot = dot_product(col("e1"), col("e2"))
      ordered(a.join(b, col("b1") === col("b2") && col("v1") < col("v2"))
        .withColumn("cos", dot / (col("n1") * col("n2")))
        .filter(col("cos") >= 0.4)
        .select(col("v1"), col("v2"), dec4S(col("cos")).as("cos")))
    }),

    // ---- DDP-6-MULTI: the recall lever for ddp_embed — L=4 independent
    //      4-bit sign tables over dims 1-16; a pair is a candidate if ANY
    //      table buckets it together. Measured on sf0.1 vs brute force:
    //      recall at τ=0.4 goes 0.146 (1 table) → 0.286 → 0.397 → 0.498
    //      (4 tables) with candidates ≈ L·n²/16 — the standard
    //      recall-vs-candidates trade, each increment exactly the per-table
    //      collision mass. Scale shape: the OR-of-buckets is NOT an OR
    //      join (that would plan a nested loop) — it's L separate
    //      equi-joins unioned then pair-deduped, so every probe stays
    //      hash-partitioned by its bucket; the signature relation is
    //      localCheckpoint'ed once and reused by all L probes + the final
    //      cosine rejoin. ----
    "ddp_embed_multi" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      def table(i: Int) =
        (when(element_at(col("e"), 4 * i + 1) > 0.0, 8).otherwise(0) +
          when(element_at(col("e"), 4 * i + 2) > 0.0, 4).otherwise(0) +
          when(element_at(col("e"), 4 * i + 3) > 0.0, 2).otherwise(0) +
          when(element_at(col("e"), 4 * i + 4) > 0.0, 1).otherwise(0)).cast("int")
      val base = emb.select(col("vec_id"), dbl.as("e"),
          sqrt(dot_product(dbl, dbl)).as("nrm"))
        .withColumn("b0", table(0)).withColumn("b1", table(1))
        .withColumn("b2", table(2)).withColumn("b3", table(3))
        .pinned
      val pairs = (0 until 4).map { i =>
        val a = base.select(col("vec_id").as("v1"), col(s"b$i").as("ba"))
        val b = base.select(col("vec_id").as("v2"), col(s"b$i").as("bb"))
        a.join(b, col("ba") === col("bb") && col("v1") < col("v2"))
          .select(col("v1"), col("v2"))
      }.reduce(_ unionAll _).distinct()
      val left = base.select(col("vec_id").as("v1"), col("e").as("e1"), col("nrm").as("n1"))
      val right = base.select(col("vec_id").as("v2"), col("e").as("e2"), col("nrm").as("n2"))
      ordered(pairs.join(left, "v1").join(right, "v2")
        .withColumn("cos", dot_product(col("e1"), col("e2")) / (col("n1") * col("n2")))
        .filter(col("cos") >= 0.4)
        .select(col("v1"), col("v2"), dec4S(col("cos")).as("cos")))
    }),

    // ---- DDP-SEM: semantic deduplication (SemDeDup, Abbas et al. 2023,
    //      public) — the third blocking strategy of the embedding-dedup
    //      family and the one that finds PARAPHRASES: ddp_embed blocks by
    //      sign buckets (data-independent), ddp_embed_multi ORs four of
    //      them (recall lever), this blocks by LEARNED k-means clusters —
    //      semantically close vectors land in the same cluster even when
    //      they straddle a sign hyperplane, which is exactly the pair the
    //      sign tables miss. Pipeline = the paper's: (1) assign every
    //      vector to its nearest of k fixed centroids (kmeans_step's
    //      exact-argmin machinery, dist ties → lowest cid); (2) WITHIN
    //      each cluster, cosine over v1 < v2 pairs; (3) a vector is a
    //      duplicate iff some LOWER-id cluster-mate sits at cos ≥ τ=0.4 —
    //      keep-lowest-id is the paper's one-representative-per-group
    //      rule made deterministic. Output = per-vector routing (cluster,
    //      dup flag, lower-neighbor count, best cosine), the columns the
    //      downstream keep-filter consumes. Scale: the O(n·k) assignment
    //      broadcasts only the k centroids; the quadratic stage is
    //      cluster-local (SemDeDup's entire point — k grows with the
    //      corpus so E[cluster]² stays bounded, the paper runs k=50k on
    //      LAION); nothing is ever all-pairs. At 100 TB the centroids
    //      come from kmeans_iter's two-round certificate instead of raw
    //      seeds — same assignment machinery either way. ----
    "ddp_semantic" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val base = spread(emb, "vec_id").select(col("vec_id"), dbl.as("v"),
          dot_product(dbl, dbl).as("vv"))
        .withColumn("nrm", sqrt(col("vv")))
        .pinned // read by the assignment and, through it, both pair sides
      val seeds = base.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("v").as("c"),
          col("vv").as("cc"))
      val wv = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist").asc, col("cid").asc)
      val assigned = base.crossJoin(broadcast(seeds))
        .withColumn("dist",
          col("vv") + col("cc") - lit(2.0) * dot_product(col("v"), col("c")))
        .withColumn("rn", row_number().over(wv)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("v"), col("nrm"))
        .pinned // read by both pair sides and the final routing join
      val a = assigned.select(col("cid"), col("vec_id").as("v1"),
        col("v").as("e1"), col("nrm").as("n1"))
      val b = assigned.select(col("cid"), col("vec_id").as("v2"),
        col("v").as("e2"), col("nrm").as("n2"))
      val dups = a.join(b, Seq("cid")).filter(col("v1") < col("v2"))
        .withColumn("cos",
          dot_product(col("e1"), col("e2")) / (col("n1") * col("n2")))
        .filter(col("cos") >= 0.4)
        .groupBy(col("v2")).agg(count(lit(1)).as("nl"), max(col("cos")).as("best"))
      ordered(assigned.join(dups, col("vec_id") === col("v2"), "left")
        .select(col("vec_id"), col("cid"),
          col("nl").isNotNull.as("is_dup"),
          coalesce(col("nl"), lit(0L)).as("n_lower_nbrs"),
          dec4S(col("best")).as("best_cos")))
    }),

    // ---- SMP-1: deterministic content-hash split — the holdout-split
    //      operator a training pipeline needs. Split is derived from the
    //      portable poly-hash of the full text (content-addressed: exact
    //      dups land in the same split by construction, no rand()), so
    //      both engines and every rerun agree. 80/10/10 train/val/test;
    //      reports per-(split, lang) counts and mean length. At 100 TB
    //      this is one codegen'd projection + an aggregation — no
    //      shuffle beyond the final tiny group-by. ----
    "smp1" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val bucket = polyHash(col("text")) % lit(100L)
      val split_ = when(bucket < 80, lit("train"))
        .when(bucket < 90, lit("val")).otherwise(lit("test"))
      ordered(doc.withColumn("split", split_)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), davgS(col("n_chars")).as("avg_chars")))
    }),

    // ---- SMP-2: stratified deterministic sample — k docs per language
    //      stratum, ordered by content hash (uniform-ish, rand()-free,
    //      rerun-stable; ties broken by doc_id). The per-group top-k
    //      window is the srt2 pattern; at 100 TB a first pass would
    //      pre-filter by a hash threshold so the window only ranks
    //      ~k candidates per stratum instead of the full stratum. ----
    "smp2" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val w = Window.partitionBy(col("lang"))
        .orderBy(polyHash(col("text")).asc, col("doc_id").asc)
      ordered(doc.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("lang"), col("rn"), col("doc_id"), col("n_chars")))
    }),

    // ---- DCN-1: benchmark decontamination — the asymmetric twin of the
    //      dedup family: for each (corpus doc, benchmark doc) pair, the
    //      CONTAINMENT |shingles(c) ∩ shingles(b)| / |shingles(b)| — how
    //      much of the benchmark doc appears in the training doc — not
    //      symmetric Jaccard, because a long doc quoting a whole short
    //      benchmark item must be caught even though their Jaccard is
    //      tiny. Benchmark = doc_id % 100 == 0 (a deterministic stand-in
    //      set). The benchmark side is small by nature, so its exploded
    //      postings BROADCAST and the corpus side streams: shuffle ∝
    //      matching postings only — the 100 TB decontamination shape. ----
    "dcn1" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      // Materialized once: the benchmark and corpus branches both read it.
      val sh = doc.select(col("doc_id"), shingles(col("text")).as("sh"))
        .pinned
      val bpost = sh.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("bench_id"), size(col("sh")).as("nb"),
          explode(col("sh")).as("tok"))
      val cpost = sh.filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id"), explode(col("sh")).as("tok"))
      ordered(cpost.join(broadcast(bpost), Seq("tok"))
        .groupBy(col("doc_id"), col("bench_id"), col("nb"))
        .agg(count(lit(1)).as("ni"))
        // τ=0.2: decontamination flags aggressively — a flagged doc is
        // dropped or reviewed, so over-flagging is the safe direction.
        .withColumn("cont", col("ni").cast("double") / col("nb").cast("double"))
        .filter(col("cont") >= 0.2)
        .select(col("doc_id"), col("bench_id"), dec4S(col("cont")).as("containment")))
    }),

    // ---- DCN-2: Bloom-prefiltered decontamination — dcn1's shape when the
    //      benchmark side outgrows a broadcast. dcn1 broadcasts the raw
    //      benchmark postings; a full benchmark SUITE at production scale
    //      (100M+ shingles) is too wide for that, but its Bloom bitmap
    //      (~1.2 bytes/shingle at 1% fpp) ships to every executor as part
    //      of the probe expression. Corpus postings that fail the probe —
    //      the overwhelming majority — never enter the exchange, so the
    //      shuffle join (SHUFFLE_HASH-hinted: neither side broadcasts in
    //      the declared regime) moves ≈ matching postings only. Bloom has
    //      NO false negatives and the exact posting join discards false
    //      positives, so the output — and the oracle — is identical to the
    //      unfiltered join. Build cost: two actions over the 1% benchmark
    //      slice (count to size the filter, then the filter aggregation) —
    //      driver holds one bitmap, never the postings. ----
    "dcn_bloom" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      val sh = doc.select(col("doc_id"), shingles(col("text")).as("sh"))
        .pinned
      val bpost = sh.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("bench_id"), size(col("sh")).as("nb"),
          explode(col("sh")).as("tok"))
      val bhash = bpost.select(polyHash(col("tok")).as("th"))
      // Size the filter from the TOTAL benchmark-posting count — an upper
      // bound on the distinct count that needs no shuffle (distinct().count()
      // would); oversizing a Bloom filter only lowers its fpp. A production
      // pipeline reads this from a table statistic instead.
      val nTok = bhash.count()
      val cpostAll = sh.filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id"), explode(col("sh")).as("tok"))
      // Empty benchmark set: stat.bloomFilter has no rows to size from
      // (returns a null buffer) and the exact join is empty regardless —
      // skip the probe, keep the (empty-result) plan shape.
      val cpost = if (nTok == 0L) cpostAll else {
        val bloom = bhash.stat.bloomFilter("th", nTok, 0.01)
        val bytes = {
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos); bos.toByteArray
        }
        cpostAll.filter(bloom_might_contain(polyHash(col("tok")), bytes))
      }
      ordered(cpost.join(bpost.hint("shuffle_hash"), Seq("tok"))
        .groupBy(col("doc_id"), col("bench_id"), col("nb"))
        .agg(count(lit(1)).as("ni"))
        .withColumn("cont", col("ni").cast("double") / col("nb").cast("double"))
        .filter(col("cont") >= 0.2)
        .select(col("doc_id"), col("bench_id"), dec4S(col("cont")).as("containment")))
    }),

    // ---- DDP-SEG: corpus-wide duplicated-SEGMENT ratio — line-level dedup
    //      (the C4/RefinedWeb step between whole-doc dedup and within-doc
    //      repetition): boilerplate sentences repeat ACROSS documents that
    //      are not near-duplicates of each other, so doc-granular Jaccard
    //      never sees them. Each doc is cut into consecutive 8-word
    //      segments (the "line" stand-in for a corpus with no line breaks);
    //      a segment is duplicated if it occurs in ≥2 docs. Output is one
    //      row per doc — its distinct-segment count and duplicated
    //      fraction, the direct input to a strip-or-drop cleaning rule.
    //      Scale: shuffle ∝ segments (segment-keyed count + one
    //      posting-proportional join back); partial aggregation absorbs
    //      hot boilerplate segments map-side, and output is linear in
    //      docs — never pair-quadratic. ----
    // ---- TXT-9: intra-document segment dedup (`txt_intradedup`) — the
    //      WITHIN-doc half of the C4 recipe (DDP-SEG/DDP-SCRUB are the
    //      cross-corpus half): drop every repeat of an 8-word segment
    //      after its first occurrence inside the SAME document — the
    //      transform that kills navigation blocks, repeated headers, and
    //      scraper stutter without any corpus-wide state. The decisive
    //      scale property: this is a PURE SCAN-LEVEL ARRAY op — segment,
    //      first-occurrence filter (array_position == own index), rebuild,
    //      md5 — zero shuffle, zero joins, embarrassingly parallel at any
    //      corpus size (contrast DDP-SCRUB's segment-keyed exchange). The
    //      corpus has no natural intra-dups (measured: 0), so doc_id%7
    //      docs with ≥8 words get their first segment PREPENDED (exact
    //      8-word alignment ⇒ seg0==seg1 by construction — IMP-1's
    //      the-gate-provably-fires pattern, injection identical in the
    //      oracle). Output = per-doc (n_segs, n_kept, md5 of the rebuilt
    //      text) — DDP-SCRUB's prove-the-reconstruction convention. ----
    "txt_intradedup" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val words0 = split(col("text"), " ")
      val text2 = when(col("doc_id") % 7 === 0 && size(words0) >= 8,
        concat(array_join(slice(words0, 1, 8), " "), lit(" "), col("text")))
        .otherwise(col("text"))
      val words = col("ws")
      val ns = ceil(size(words) / lit(8.0)).cast("int")
      val segs = transform(sequence(lit(0), ns - 1),
        i => array_join(slice(words, i * 8 + 1, lit(8)), " "))
      ordered(spread(doc)
        .select(col("doc_id"), text2.as("t2"))
        // ws MATERIALIZED before the per-segment lambda (bigramArr's
        // rationale: captured subtrees re-evaluate per element, so an
        // inline split re-split the doc once per segment — O(len²/8)).
        .select(col("doc_id"), split(col("t2"), " ").as("ws"))
        .select(col("doc_id"),
          when(ns >= 1, segs).otherwise(array().cast("array<string>")).as("segs"))
        // array_distinct IS the first-occurrence filter: Spark's
        // ArrayDistinct walks the array appending unseen elements to a
        // hash set, so order is first-occurrence by construction — O(n)
        // per doc vs the O(n²) array_position-per-element HOF this
        // replaced (the DuckDB twin keeps the explicit positional filter,
        // list_distinct's order being unspecified there; the oracle hash
        // certifies the two spellings agree).
        .select(col("doc_id"), col("segs"),
          array_distinct(col("segs")).as("kept"))
        .select(col("doc_id"), size(col("segs")).as("n_segs"),
          size(col("kept")).as("n_kept"),
          md5(array_join(col("kept"), " ")).as("dedup_md5")))
    }),

    "ddp_segment" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      val words = col("ws")
      // sequence(0, -1) is DESCENDING in Spark ([0, -1]) — guard docs
      // shorter than one segment to the empty list (DuckDB's exclusive-end
      // range(0, 0) natively), same trap as [[shingles]].
      val nseg = (size(words) / lit(8)).cast("int")
      val segs = transform(sequence(lit(0), nseg - 1),
        i => array_join(slice(words, i * 8 + 1, lit(8)), " "))
      // Materialized once: the segment-count aggregation and the join back
      // both read this posting table — without the checkpoint Spark
      // re-runs the scan + segmentation for each side (2× the dominant
      // cost; the dcn1/ddp_ngram pattern). The words array materializes
      // BEFORE the per-segment lambda (bigramArr's rationale — an inline
      // split re-split the doc once per segment, O(len²/8)).
      val perDoc = doc
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          explode(array_distinct(when(nseg >= 1, segs)
            .otherwise(array().cast("array<string>")))).as("seg"))
        .pinned
      // Segments are distinct within a doc, so count(1) == distinct docs.
      val segDocs = perDoc.groupBy(col("seg")).agg(count(lit(1)).as("ndocs"))
      ordered(perDoc.join(segDocs, Seq("seg"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_segs"), col("n_dup"),
          dec4S(col("n_dup").cast("double") / col("n_segs").cast("double"))
            .as("dup_ratio")))
    }),

    // ---- DDP-SCRUB: boilerplate segment REMOVAL — the C4/CCNet transform
    //      that DDP-SEG only measures: rebuild each doc with its corpus-
    //      duplicated segments dropped (a segment is boilerplate iff it
    //      appears in >= 2 docs). Differences from ddp_segment, both
    //      deliberate: segments are POSITIONAL (no per-doc distinct — the
    //      rebuild needs every occurrence back in order) and the tail
    //      keeps its short segment (ceil(n/8), not floor — scrubbing must
    //      not eat the end of a document). Output stays narrow-linear:
    //      one row per surviving doc with kept counts and the md5 of the
    //      rebuilt text (pins the exact reconstruction without shipping
    //      it); fully-boilerplate docs vanish — exactly C4's behavior.
    //      Scale shape: segment-keyed count (map-side combine absorbs hot
    //      boilerplate), left-semi back-join, one order-restoring
    //      group-by; the collect_list buffers ONE doc's segments, never a
    //      partition. ----
    "scrub_segments" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      val words = col("ws")
      val nseg = ceil(size(words).cast("double") / 8).cast("int")
      // Positional segment table, materialized once — the df-count and the
      // rebuild join both read it (the ddp_segment/dcn1 pattern). Words
      // array materialized before the per-segment lambda (bigramArr's
      // rationale — inline split re-split the doc once per segment).
      val segs = doc
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), nseg.as("ns"),
          posexplode(transform(sequence(lit(0), nseg - 1),
            i => array_join(slice(words, i * 8 + 1, lit(8)), " "))))
        .select(col("doc_id"), col("ns"), col("pos"), col("col").as("seg"))
        .pinned
      val segDocs = segs.select(col("seg"), col("doc_id")).distinct()
        .groupBy(col("seg")).agg(count(lit(1)).as("ndocs"))
      val kept = segs.join(segDocs.filter(col("ndocs") < 2).select(col("seg")),
        Seq("seg"), "left_semi")
      ordered(kept.groupBy(col("doc_id"))
        .agg(max(col("ns")).as("n_segs"),
          count(lit(1)).as("n_kept"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("seg")))),
            x => x.getField("seg")), " ")).as("scrub_md5"))
        .select(col("doc_id"), col("n_segs"), col("n_kept"), col("scrub_md5")))
    }),

    // ---- TXT-1: per-language document stats ----
    "txt1" -> ((s, d) => {
      val doc = load(s, d, "documents")
      ordered(doc.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        davgS(col("n_chars")).as("avg_chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
        davgS(size(array_distinct(split(col("text"), " ")))).as("avg_distinct_toks")))
    }),

    // ---- TXT-2: top-5 tokens per language ----
    "txt_topwords" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val counts = doc.select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("word").asc)
      ordered(counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("rn"), col("word"), col("n")))
    }),

    // ---- TXT-ZIPF: Zipf's-law fit of the rank–frequency curve
    //      (`txt_zipf`) — the corpus-health diagnostic every pretraining
    //      pipeline plots: natural text follows freq ∝ rank^(−s) with
    //      s ≈ 1; a slope far off (or a poor R²) flags boilerplate,
    //      templated spam, or tokenizer damage BEFORE training does. Fit
    //      = OLS of ln(freq) on ln(rank) over the top-500 vocabulary
    //      (rank via the distributed TakeOrderedAndProject top-k, never a
    //      full vocab sort), reported with vocab size and corpus token
    //      total. Determinism: the top-k set and ranks are exact integer
    //      order statistics; ln/moment sums are doubles whose summation-
    //      order drift over 500 ln-scale terms is ~1e-11 absolute — far
    //      below dec4 (survival_km's ln precedent); the OLS finish is
    //      spelled identically both sides, zero y-variance → NULL by
    //      guard. Scale: the token count is the only data-sized shuffle
    //      (map-side combined); everything after lives on top-500 rows. ----
    "txt_zipf" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val counts = doc.select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
      val stats = counts.agg(count(lit(1)).as("vocab"), sum(col("n")).as("total"))
      val top = counts.orderBy(col("n").desc, col("word").asc).limit(500)
      val w = Window.partitionBy(lit(0)).orderBy(col("n").desc, col("word").asc)
      val pts = top.withColumn("rnk", row_number().over(w))
        .select(log(col("rnk").cast("double")).as("x"),
          log(col("n").cast("double")).as("y"))
      val mo = pts.agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      val kd = col("k").cast("double")
      val sxxv = kd * col("sxx") - col("sx") * col("sx")
      val syyv = kd * col("syy") - col("sy") * col("sy")
      val sxyv = kd * col("sxy") - col("sx") * col("sy")
      def nz(c: Column): Column = when(c === 0.0, lit(null)).otherwise(c)
      val withV = mo.withColumn("sxyv", sxyv).withColumn("sxxv", sxxv)
        .withColumn("syyv", syyv)
        .withColumn("slope", col("sxyv") / nz(col("sxxv")))
        .withColumn("intercept", (col("sy") - col("slope") * col("sx")) / kd)
        .withColumn("r2", col("sxyv") * col("sxyv") / nz(col("sxxv") * col("syyv")))
      ordered(withV.crossJoin(broadcast(stats))
        .select(col("vocab"), col("total"), col("k"),
          dec4S(col("slope")).as("slope"),
          dec4S(col("intercept")).as("intercept"),
          dec4S(col("r2")).as("r2")))
    }),

    // ---- BPE-1: byte-pair-encoding merge training (`bpe_train`) — the
    //      tokenizer-training op itself (Sennrich et al. ACL'16; the loop
    //      inside SentencePiece/HF BPE trainers): learn the corpus's first
    //      6 BPE merges. The engine-critical observation is that trainers
    //      never iterate the corpus — they iterate the WORD-FREQUENCY
    //      table: ONE scan reduces 100 TB of text to a vocabulary-sized
    //      (word, cnt) relation, and every merge round is vocab-sized
    //      work (pair explode bounded by Σ word-length over the vocab, a
    //      map-side-combined pair count, a global top-1 = TakeOrdered
    //      partial per partition, and one scan-level substring rewrite).
    //      Words are encoded as |-wrapped symbol strings ("|h||e||l||l||o|")
    //      so applying a merge is a PLAIN substring replace (codegen'd
    //      StringReplace, no regex): every symbol owns its delimiters, so
    //      a pair pattern "|l||l|" can never match across a symbol
    //      boundary or inside a longer symbol, and left-to-right
    //      non-overlapping replace IS BPE's greedy application order —
    //      identical in DuckDB's replace(), making 6 rounds of argmax
    //      (count DESC, pair ASC tie-break) bit-reproducible cross-engine
    //      with zero floats. Each round's 1-row argmax and the rewritten
    //      vocab are pinned (the DDP-CLUSTER iterative-loop discipline);
    //      at real vocabulary scale you'd batch non-conflicting merges
    //      per round — same loop, fewer rounds. ----
    "bpe_train" -> ((s, d) => {
      val doc = load(s, d, "documents")
      ordered(bpeMerges(doc).zipWithIndex.map { case (best, i) =>
        best.select(lit(i + 1).as("round"), col("lft").as("left_sym"),
          col("rgt").as("right_sym"),
          concat(col("lft"), col("rgt")).as("merged"),
          col("n").cast("long").as("n"))
      }.reduce(_ unionByName _))
    }),

    // ---- BPE-1b: the BATCHED trainer under the oracle
    //      (`bpe_train_batched`, r13 verdict task 2) — [[bpeMergesBatched]]
    //      run end-to-end on the corpus and gated against the SAME
    //      sequential-merge DuckDB oracle as `bpe_train`: the equivalence
    //      law (QualityOpsSpec) says the merge tables are identical, so
    //      the subtle touchBound/cut-line admission accounting now has
    //      corpus-level hash coverage, not just the crafted-case law. The
    //      merge table is vocabulary METADATA (6 rows) — building the
    //      result relation from the driver-side walk is the same bounded
    //      collect the batched trainer already owns. ----
    "bpe_train_batched" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val (merges, _) = bpeMergesBatched(doc)
      import s.implicits._
      ordered(merges.zipWithIndex.map { case ((_, lft, rgt, n), i) =>
        (i + 1, lft, rgt, lft + rgt, n)
      }.toDF("round", "left_sym", "right_sym", "merged", "n"))
    }),

    // ---- TOK-2: BPE tokenization + compression census (`bpe_apply`) —
    //      the APPLY half of BPE-1: encode the corpus with the learned
    //      merge table (each merge applied corpus-wide in priority order —
    //      the same chained greedy substring replace the trainer used, so
    //      train and apply provably share one semantics) and report the
    //      per-language compression the tokenizer buys: symbols before
    //      (= non-space chars) vs after, tokens-per-100-chars being THE
    //      number a tokenizer choice is judged by. Whole docs are encoded
    //      with words symbol-wrapped and spaces left bare ("|h||i| |y||o|")
    //      so a merge pattern "|x||y|" can never bridge a word boundary
    //      (the inter-word gap reads "| |", never "||"). Shape: the
    //      vocab-sized training rounds (BPE-1), then ONE corpus scan
    //      applying 6 codegen'd StringReplaces riding a 1-row broadcast
    //      of the merge table — scan-proportional, zero shuffle beyond
    //      the |langs|-row census; the trained merge table is exactly
    //      what ships to the fleet at 100 TB, and this query IS that
    //      fleet pass. ----
    "bpe_apply" -> ((s, d) => {
      val doc = load(s, d, "documents")
      // 6 pinned 1-row merge tables -> one 1-row (p1..p6) wide relation
      val wide = bpeMerges(doc).zipWithIndex
        .map { case (b, i) => b.select(col("pair").as(s"p${i + 1}")) }
        .reduce(_ crossJoin _)
      val enc0 = regexp_replace(col("text"), "([^ ])", "|$1|")
      val applied = (1 to 6).foldLeft(enc0) { (e, i) =>
        call_function("replace", e, col(s"p$i"),
          call_function("replace", col(s"p$i"), lit("||"), lit("")))
      }
      def nsym(e: Column): Column =
        ((length(e) - length(call_function("replace", e, lit("|"), lit("")))) / 2)
          .cast("long")
      ordered(doc.crossJoin(broadcast(wide))
        .select(col("lang"), nsym(enc0).as("nb"), nsym(applied).as("na"))
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("nb")).as("sym_before"),
          sum(col("na")).as("sym_after"),
          dec4S(sum(col("na")).cast("double") /
            sum(col("nb")).cast("double")).as("compression")))
    }),

    // ---- TXT-3: stopword-marker language-ID heuristic ----
    "txt_langid" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val words = split(col("text"), " ")
      val stopRatio = size(filter(words, w => w.isin("a", "the"))).cast("double") /
        size(words).cast("double")
      ordered(doc.select(col("doc_id"), col("lang"),
        when(stopRatio > 0.05, "en").otherwise("unknown").as("pred_lang"))
        .withColumn("is_match", col("pred_lang") === col("lang")))
    }),

    // ---- TXT-4: quality scoring (length / stopword / token-size ratios) ----
    // ---- CUR-1: curriculum manifest — the corpus staged into 5 equal-
    //      frequency QUALITY PHASES (phase 1 = lowest type-token ratio …
    //      phase 5 = highest), the ordering curriculum-learning schedules
    //      train on (easy/templated text first or last, diverse prose at
    //      the other end). Phase cuts are FE-1's percentile mechanism
    //      (type-7 quartile cuts of the dec4'd score, cut values
    //      dec4-rounded before comparison), NOT a global row_number rank:
    //      the rank form needs one total sort of the corpus, the cut form
    //      needs one percentile aggregate + a scan — the 100 TB shape,
    //      and phases stay reproducible under any partitioning. Output =
    //      the 5-row manifest (n_docs, mean score, char volume) a
    //      training scheduler consumes. ----
    "curriculum" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val words = split(col("text"), " ")
      // score as a 4-decimal DOUBLE: dec4 for the tie-safe value, double
      // so percentile/quantile_cont agree across engines (DuckDB's
      // quantile over DECIMAL stays decimal; over DOUBLE both engines
      // interpolate the identical type-7 double)
      val scored = doc.select(col("doc_id"), col("n_chars"),
        dec4(size(array_distinct(words)).cast("double") /
          size(words).cast("double")).cast("double").as("score"))
      val cuts = scored.agg(percentile(col("score"),
        array((1 to 4).map(i => lit(i / 5.0)): _*)).as("bs"))
      val phase = (1 to 4).map(i =>
          when(col("score") > dec4(element_at(col("bs"), i)).cast("double"), 1)
            .otherwise(0))
        .reduce(_ + _) + 1
      ordered(scored.crossJoin(broadcast(cuts))
        .withColumn("phase", phase)
        .groupBy(col("phase")).agg(
          count(lit(1)).as("n_docs"),
          davgS(col("score")).as("avg_score"),
          sum(col("n_chars")).as("sum_chars")))
    }),

    "txt_quality" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val words = split(col("text"), " ")
      val nTok = size(words).cast("double")
      val stopRatio = size(filter(words, w => w.isin("a", "the"))).cast("double") / nTok
      val avgTokLen = (col("n_chars").cast("double") - (nTok - 1.0)) / nTok
      ordered(doc.select(col("doc_id"), col("lang"),
        dec4S(stopRatio).as("stop_ratio"),
        dec4S(avgTokLen).as("avg_tok_len"),
        dec4S(size(array_distinct(words)).cast("double") / nTok).as("ttr"),
        (col("n_chars") >= 100 && col("n_chars") <= 500).as("len_ok")))
    }),

    // ---- TXT-8: word-entropy quality signal — Shannon entropy of the
    //      doc's unigram distribution, the standard low-entropy filter for
    //      template/garbage text (a doc repeating one phrase scores near
    //      0; diverse prose scores near ln(n_distinct)). Float discipline:
    //      entropy is a SUM of p·ln p terms, and float addition does not
    //      commute — so the fold runs over the SORTED distinct-word list
    //      (one declared order, spelled identically in the DuckDB twin),
    //      making the double bit-identical across engines before the dec4
    //      render (the DotProduct/§5.3 in-order-fold rule). Computed by
    //      the codegen'd [[graft.functions.WordEntropy]] expression — the
    //      equivalent HOF (aggregate over sorted distinct words with a
    //      nested filter) costs O(distinct×tokens) boxed lambda calls per
    //      doc, ~0.8 ms/doc, and was the entire query's runtime (measured
    //      39 s on the ×10 probe); the expression is one hash+sorted-sum
    //      pass, bit-parity asserted in ExpressionSpec. Scan-proportional,
    //      zero shuffle. ----
    "txt_entropy" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val words = split(col("text"), " ")
      ordered(doc.select(col("doc_id"),
        size(words).as("n_tokens"),
        size(array_distinct(words)).as("n_distinct"),
        dec4S(graft.functions.GraftFunctions.word_entropy(col("text"))).as("entropy")))
    }),

    // ---- LM-1: corpus-LM quality scoring (CCNet shape) — score every doc
    //      by its average bigram surprisal −(1/n)Σ ln P(gram) under the
    //      corpus's own bigram distribution (P = count/total per lang).
    //      Low surprisal = templated/boilerplate text, high = unusual —
    //      the two tails a statistical quality filter trims. This is the
    //      count-based stand-in for CCNet's KenLM perplexity bucketing:
    //      the count relation IS the language model, built and applied in
    //      one job. Float discipline: each doc's log-probs are summed in
    //      POSITION order (collect (pos, logp) → array_sort → left fold —
    //      a join's row order is not deterministic, a sorted fold is,
    //      §5.3). Scale: counts are vocabulary-sized (broadcast at test
    //      scale, shuffle join at corpus scale — no plan hint pins it);
    //      totals are |langs| rows, broadcast; the posting join is
    //      posting-proportional; per-doc state bounded by doc length. ----
    "lm_score" -> ((s, d) => {
      val sc = lmSurprisal(spread(load(s, d, "documents")))
      ordered(sc.select(col("doc_id"), col("n_bigrams"),
        dec4S(col("surp")).as("avg_surprisal")))
    }),

    // ---- LM-2: CCNet perplexity bucketing (Wenzek et al. 2019, public)
    //      — the routing step LM-1 scores for: every doc lands in
    //      head/middle/tail by PER-LANGUAGE tertiles of its avg bigram
    //      surprisal (per-language cuts are the CCNet point — absolute
    //      surprisal is not comparable across languages because each
    //      lang's bigram distribution has its own entropy; a global cut
    //      would route whole languages into one bucket). kept = not-tail
    //      (head = boilerplate-adjacent but useful, middle = typical,
    //      tail = the high-perplexity garbage a quality filter trims;
    //      pipeline_curate's band gate is the two-sided variant).
    //      Determinism: cuts are type-7 interpolated percentiles over
    //      raw doubles (AGG-7/FE-1's cross-engine precedent), both
    //      comparison sides dec4-rounded so no doc sits on an engine-
    //      dependent double tie (§5.3). Shape: LM-1's machinery + ONE
    //      per-lang exact-percentile aggregate over the |docs|-row score
    //      relation (approx_percentile at 100 TB, AGG-11's declared
    //      trade) + a |langs|-row broadcast cut attach — the bucketing
    //      itself is a codegen'd projection, no extra data-sized
    //      shuffle beyond LM-1's. ----
    "lm_buckets" -> ((s, d) => {
      val sc = lmSurprisal(spread(load(s, d, "documents"))).pinned
      val cuts = sc.groupBy(col("lang")).agg(
        percentile(col("surp"), array(lit(1.0 / 3), lit(2.0 / 3))).as("cs"))
      val b = when(dec4(col("surp")) <= dec4(element_at(col("cs"), 1)), lit("head"))
        .when(dec4(col("surp")) <= dec4(element_at(col("cs"), 2)), lit("middle"))
        .otherwise(lit("tail"))
      ordered(sc.join(broadcast(cuts), "lang")
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          dec4S(col("surp")).as("avg_surprisal"), b.as("bucket"),
          (b =!= "tail").as("kept")))
    }),

    // ---- TXT-5: token counting (whitespace + regex tokenizers) ----
    "txt_tokens" -> ((s, d) => {
      val doc = load(s, d, "documents")
      ordered(doc.select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).cast("int").as("re_tokens"),
        length(col("text")).as("n_chars_obs"),
        (col("n_chars") === length(col("text"))).as("n_chars_valid")))
    }),

    // ---- TXT-6: document fingerprint (portable rolling hash) ----
    "txt_fingerprint" -> ((s, d) => {
      val doc = load(s, d, "documents")
      ordered(doc.select(col("doc_id"),
        polyHash(col("text")).as("fingerprint"),
        polyHash(substring(col("text"), 1, 64)).as("prefix_fp")))
    }),

    // ---- TXT-7: repetition-based quality signals (the Gopher/C4-style
    //      filters a web-scale pipeline applies before training): duplicate
    //      word fraction, most-frequent-word mass, duplicate bigram
    //      fraction. One narrow codegen'd projection — no explode, no
    //      shuffle; the per-doc nested loop is bounded by the doc's own
    //      distinct-token count, so 100 TB cost is scan-proportional.
    //      Single-token docs are guarded (Spark's sequence(1, 0) is
    //      DESCENDING — see shingles). `spread` because the per-doc HOFs
    //      (transform/filter lambdas) don't enter whole-stage codegen and
    //      documents.parquet is one file split — without the repartition
    //      the whole projection runs on one core (measured 5.6 s → ~1 s
    //      at sf0.1). On a real multi-file 100 TB table the input splits
    //      provide the parallelism and the spread is unnecessary — the
    //      shuffle is the price of the synthetic single-file layout. ----
    "txt_repetition" -> ((s, d) => {
      // Words array materialized ONCE before the per-element lambdas: the
      // top-word count transform captures `w` inside its filter, so with
      // an inline split every (distinct-word × word) comparison re-split
      // the doc — bigramArr's O(len²) trap at its worst (measured in the
      // r12 ×100 probe session).
      val doc = spread(load(s, d, "documents"))
        .select(col("doc_id"), split(col("text"), " ").as("w0"))
      val w = col("w0")
      val n = size(w)
      val nd = size(array_distinct(w))
      val topCnt = array_max(transform(array_distinct(w),
        t => size(filter(w, x => x === t))))
      val bigrams = when(n >= 2, bigramArr(w))
        .otherwise(array().cast("array<string>"))
      val ndb = size(array_distinct(bigrams))
      ordered(doc.select(col("doc_id"),
        dec4S(lit(1.0) - nd.cast("double") / n.cast("double")).as("dup_word_frac"),
        dec4S(topCnt.cast("double") / n.cast("double")).as("top_word_frac"),
        dec4S(when(n >= 2,
          lit(1.0) - ndb.cast("double") / (n - 1).cast("double"))
          .otherwise(lit(0.0))).as("dup_bigram_frac")))
    }),

    // ---- PACK-1: fixed-size chunk packing — split each doc's token
    //      stream into 32-token training chunks (no overlap), one row per
    //      chunk with its bounds. explode(sequence) is bounded per input
    //      row by ceil(n/32), so a partition cannot amplify beyond its
    //      token count; no shuffle at all — pure narrow fan-out that
    //      parallelizes by input split at any scale. ----
    "pack1" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val C = 32
      val t = doc.select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("nc", ceil(size(col("w")).cast("double") / C).cast("int"))
      ordered(t
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(0), col("nc") - 1)).as("chunk_idx"))
        .withColumn("ch", slice(col("w"), col("chunk_idx") * C + 1, lit(C)))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("ch")).as("n_toks"),
          element_at(col("ch"), 1).as("first_tok"),
          element_at(col("ch"), size(col("ch"))).as("last_tok")))
    }),

    // ---- CHNK-1: sliding-window chunking WITH OVERLAP — the RAG/context-
    //      window shape (pack1 tiles disjoint chunks; retrieval chunking
    //      strides by S < C so every boundary sentence appears in two
    //      chunks and no query can fall into a seam). Window C=32, stride
    //      S=24 (8-token overlap). Chunk count per doc is
    //      1 + ceil((n-C)/S) for n > C (last chunk may be short but every
    //      start offset stays < n), else exactly 1 — the guard matters
    //      because sequence(0, -1) would EMIT [0,-1] (Spark infers a
    //      negative step), not an empty array. Same scale shape as pack1:
    //      explode(sequence) is bounded fan-out ∝ n/S per row, no shuffle,
    //      parallelizes by input split. ----
    "chunk_overlap" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val C = 32; val S = 24
      val t = doc.select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("n", size(col("w")))
        .withColumn("nc", when(col("n") <= C, lit(1)).otherwise(
          ceil((col("n") - C).cast("double") / S).cast("int") + 1))
      ordered(t
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(0), col("nc") - 1)).as("chunk_idx"))
        .withColumn("ch", slice(col("w"), col("chunk_idx") * S + 1, lit(C)))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * S).as("start_tok"),
          size(col("ch")).as("n_toks"),
          element_at(col("ch"), 1).as("first_tok"),
          element_at(col("ch"), size(col("ch"))).as("last_tok")))
    }),

    // ---- PACK-2: cross-doc sequence packing — assign whole docs to fixed
    //      token-budget bins (B=512) by deterministic ordered fill: docs
    //      ordered by content hash (rerun-stable, shuffles short/long docs
    //      together), running token sum, bin = starting-offset div B — the
    //      step that turns a cleaned corpus into dense training sequences
    //      (pack1 chunks WITHIN a doc; this packs ACROSS docs). A global
    //      ordered fill is a single-threaded window, so packing is
    //      partitioned into 8 independent hash groups (pack_group), each
    //      filled in parallel — exactly how a 1000-executor packer shards:
    //      more groups = more parallelism, same density guarantee per
    //      group. Output: one row per bin with fill stats (the packer's
    //      manifest); avg fill ≈ B except each group's last bin. ----
    "pack_bins" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      val B = 512
      val t = doc.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tok"),
        polyHash(col("text")).as("h"))
        .withColumn("pack_group", pmod(col("h"), lit(8L)).cast("int"))
      val w = Window.partitionBy(col("pack_group"))
        .orderBy(col("h").asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val binned = t.withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("bin", ((col("cum") - col("n_tok")) / lit(B)).cast("long"))
      ordered(binned.groupBy(col("pack_group"), col("bin")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc")))
    }),

    // ---- PIPELINE-2: statistical curation — the round-6 composition of
    //      the quality-signal family, in the order a production corpus
    //      pipeline runs them: (1) cheap length gate (n_tok ≥ 20);
    //      (2) entropy gate (ent ≥ 2.5 — drops template/repetitive docs);
    //      (3) LM surprisal BAND 6.5–7.0 (the CCNet move: trim BOTH tails,
    //      boilerplate below, garbage above); (4) exact-dedup keeper
    //      election among survivors; (5) per-lang retention report. The
    //      float gates compare raw doubles — legal across engines only
    //      because WordEntropy and the sorted lm fold are bit-identical
    //      (§5.3); any order-nondeterministic sum here would flip rows at
    //      the thresholds. Filters run scan-side before the dedup
    //      shuffle, so the expensive stages see only survivors. ----
    "pipeline_curate" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      val words = split(col("text"), " ")
      val m = doc.select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
          size(words).as("n_tok"),
          graft.functions.GraftFunctions.word_entropy(col("text")).as("ent"))
        .join(lmSurprisal(doc).select(col("doc_id"), col("surp")), Seq("doc_id"))
      val q = m.filter(col("n_tok") >= 20 && col("ent") >= 2.5 &&
        col("surp").between(6.5, 7.0))
      // Keeper election stays groupBy(text).min + join-back, NOT a
      // per-text top-1 window. The window variant looks cleaner (one
      // shuffle, WindowGroupLimit) and ties at sf0.1 (4.36 vs 4.55 s
      // steady), but it must shuffle EVERY full-text row; the groupBy
      // collapses duplicate texts map-side (partial min) before any
      // shuffle, so on the duplicate-heavy corpora dedup exists for, the
      // shuffled bytes differ by the duplication factor. ×10 clique
      // probe: window 29.5 s vs this formulation 12.1 s steady — a 2.4×
      // scale regression the flat-SF bench could not see. The double
      // upstream reference is deduplicated by ReusedExchange.
      val keepers = q.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      ordered(q.join(keepers, Seq("text", "doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), davgS(col("n_chars")).as("avg_chars")))
    }),

    // ---- PIPELINE-3: full corpus build (`pipeline_corpus`) — the
    //      nightly production composition the first two pipelines stop
    //      short of: normalize → exact-dedup keeper election on the
    //      CANONICAL text (DDP-NORM's key: a case/punct variant can't
    //      evade the wall) → benchmark DECONTAMINATION (DCN-1's
    //      containment, τ=0.2, benchmark docs excluded from the corpus
    //      entirely) → length gate → LEAKAGE-SAFE split keyed on the
    //      dup-group REPRESENTATIVE (SPL-1's LCG — every surviving copy
    //      co-travels by construction) → per-(split, lang) corpus
    //      census. PIPELINE-1 proves quality+near-dup compose and
    //      PIPELINE-2 the stats gates; this closes with the two stages a
    //      training-data audit actually asks about: did eval data leak
    //      in, and can a dup straddle the train/test wall. Stage order
    //      matters and is the declared semantics: dedup BEFORE decon
    //      (flag once per surviving copy, not per duplicate), filters
    //      scan-side before the posting shuffle. Scale: each stage is an
    //      already-certified shape (groupBy keeper, broadcast→bloom
    //      benchmark postings, anti-join, codegen'd LCG projection);
    //      composing them adds no new shuffle class. ----
    "pipeline_corpus" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      val keyed = doc.select(col("doc_id"), col("lang"), col("text"),
        col("n_chars"), md5(norm).as("k"))
        .pinned // keeper election + survivor join-back
      val reps = keyed.groupBy(col("k")).agg(min(col("doc_id")).as("rep"))
      val corpus = keyed.join(reps, "k")
        .filter(col("doc_id") === col("rep") && col("doc_id") % 100 =!= 0)
        .pinned // decon posting build + the final census
      val sh = shingles(col("text"))
      val bpost = doc.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("bench_id"), size(sh).as("nb"),
          explode(sh).as("tok"))
      val flagged = corpus.select(col("doc_id"), explode(sh).as("tok"))
        .join(broadcast(bpost), Seq("tok"))
        .groupBy(col("doc_id"), col("bench_id"), col("nb"))
        .agg(count(lit(1)).as("ni"))
        .filter(col("ni").cast("double") / col("nb").cast("double") >= 0.2)
        .select(col("doc_id")).distinct()
      val clean = corpus.join(flagged, Seq("doc_id"), "left_anti")
        .filter(size(split(col("text"), " ")) >= 20)
      val bucket = pmod(
        pmod(col("rep"), lit(2147483647L)) * lit(2654435761L) + lit(123456789L),
        lit(1000L))
      val split_ = when(bucket < 800, lit("train"))
        .when(bucket < 900, lit("val")).otherwise(lit("test"))
      ordered(clean.withColumn("split", split_)
        .groupBy(col("split"), col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
          davgS(col("n_chars")).as("avg_chars")))
    }),

    // ---- TFIDF-1: per-doc top-3 terms by tf-idf. The global document-
    //      frequency relation is vocabulary-sized — broadcast, like the
    //      idf table any 100 TB featurizer ships to executors — so the
    //      per-token stream joins it map-side; the only shuffles are the
    //      tf group-by (∝ tokens, map-side combined) and the per-doc
    //      top-k window (WindowGroupLimit pushes the k). Ties broken by
    //      word for rerun- and engine-stable output. ----
    "tfidf1" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val t = doc.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = t.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val nDocs = doc.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf_raw").desc, col("word").asc)
      ordered(tf.join(broadcast(dfreq), "word").crossJoin(broadcast(nDocs))
        .withColumn("tfidf_raw", col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("word"),
          dec4S(col("tfidf_raw")).as("tfidf")))
    }),

    // ---- BM25-1: sparse lexical retrieval — the term-match counterpart
    //      of SIM-1's dense ANN (a retrieval stack ships BOTH: BM25
    //      recall + embedding rerank). Query set = docs with
    //      doc_id % 100 == 7, terms = the distinct set of each doc's
    //      first 5 tokens (deterministic, corpus-derived); score = Lucene BM25
    //      (k1=1.2, b=0.75, idf = ln(1+(N-df+.5)/(df+.5))), top-3 corpus
    //      docs per query (self-match excluded, ties by doc_id). Shape =
    //      tfidf1's scale recipe: the only corpus-sized shuffles are the
    //      tf group-by (map-side combined) and the per-query top-k
    //      window; query terms, df table, and the 1-row (N, avgdl)
    //      scalar all broadcast. `dl` broadcasts HERE (one short row per
    //      doc); at 100 TB doc length rides inside the tf relation
    //      (a sum-over-terms window at tf-build time) instead of a
    //      broadcast. Determinism: each term's double score is tie-safe
    //      rounded (dec4) then summed as exact DECIMAL (dsum4), and
    //      avgdl is itself dec4'd, so both engines rank identical
    //      numbers. ----
    "bm25" -> ((s, d) => {
      val scored = bm25Scored(spread(load(s, d, "documents")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      ordered(scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("doc_id"), col("n_terms"),
          cstr(col("score")).as("score")))
    }),

    // ---- BM25-2: the full retrieval STACK — BM25 recall (top-10 per
    //      query) re-ranked by embedding cosine (top-3) — the two-stage
    //      lexical-recall + dense-rerank architecture every production
    //      retrieval system runs. The rerank never scores the corpus:
    //      only the 10 recalled candidates per query join their
    //      embeddings, so the expensive dense math is bounded by the
    //      recall budget regardless of corpus size. Embedding sides
    //      broadcast at this SF; at 100 TB the candidate→embedding join
    //      is doc-keyed (embeddings bucketed by vec_id) and still touches
    //      only recall×queries rows. bm25_rank is carried through so the
    //      output shows the re-ordering the dense stage actually did. ----
    "retrieve_rerank" -> ((s, d) => {
      val recall = bm25Scored(spread(load(s, d, "documents")))
      val wb = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      val top10 = recall.withColumn("bm25_rank", row_number().over(wb))
        .filter(col("bm25_rank") <= 10)
        .select(col("q_id"), col("doc_id"), col("bm25_rank"))
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val base = emb.select(col("vec_id"), dbl.as("e"),
        sqrt(dot_product(dbl, dbl)).as("nrm"))
      // Only query-id embeddings can match top10's q_id — filter before
      // broadcasting (the sim1 pattern) so the query-side broadcast ships
      // ~1% of the table, not all of it.
      val qe = base.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
      val de = base.select(col("vec_id").as("doc_id"), col("e").as("de"), col("nrm").as("dn"))
      val wr = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_raw").desc, col("doc_id").asc)
      ordered(top10.join(broadcast(qe), Seq("q_id")).join(broadcast(de), Seq("doc_id"))
        .withColumn("cos_raw",
          dot_product(col("qe"), col("de")) / (col("qn") * col("dn")))
        .withColumn("rn", row_number().over(wr))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("doc_id"), col("bm25_rank"),
          dec4S(col("cos_raw")).as("cos")))
    }),

    // ---- RRF-1: reciprocal-rank fusion of the lexical and dense
    //      retrievers — the third standard retrieval composition next to
    //      BM25-1 (one ranker) and BM25-2 (cascade): both rankers run
    //      INDEPENDENTLY to top-10, and candidates are fused on RANK
    //      alone, rrf = Σ 1/(60 + rank), over the UNION of the lists (a
    //      doc absent from one list contributes 0 from it). Rank-only
    //      fusion is what makes RRF robust in production: BM25 scores and
    //      cosines live on incomparable scales, and rrf needs no
    //      calibration between them. Determinism: rrf is a 2-term
    //      fixed-order sum of exact small-integer reciprocals (bit-equal
    //      anywhere); the cosine RANKS reuse the bit-identical dot/fold
    //      discipline retrieve_rerank already certifies. Scale shape: the
    //      bm25 side is BM25-1's (postings-proportional); the dense side
    //      is the brute-force query×corpus probe at this SF (the sim1
    //      shape — at 100 TB it swaps for the IVF/LSH candidate path,
    //      same downstream fusion); the fusion join itself touches only
    //      2×10 rows per query, and top-5 plans as WindowGroupLimit. ----
    "retrieve_rrf" -> ((s, d) => {
      val rb = bm25Top10(s, d)
      val rd = denseTop10(s, d).select(col("q_id"), col("doc_id"), col("r_cos"))
      val fused = rb.join(rd, Seq("q_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("r_bm25")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_cos")), lit(0.0)))
      val wf = Window.partitionBy(col("q_id"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
      ordered(fused.withColumn("rn", row_number().over(wf))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn"), col("doc_id"),
          col("r_bm25"), col("r_cos"), dec4S(col("rrf")).as("rrf")))
    }),

    // ---- HN-1: hard-negative mining — the contrastive-training-data op:
    //      for each query, the docs most SIMILAR in embedding space that
    //      are NOT lexically relevant (anti-join of the dense top-10
    //      against the BM25 top-10). Those are exactly the negatives a
    //      bi-encoder trains on — random negatives are trivially far and
    //      teach nothing; lexically-relevant docs risk being unlabeled
    //      positives, so both are excluded. Top-3 hardest per query.
    //      Scale shape: both stages are the retrieval stack's (postings-
    //      proportional BM25, candidate-bounded dense via IVF/LSH at
    //      100 TB); the anti-join is left_anti on (q_id, doc_id) over two
    //      top-10 lists — 10 rows per query each side; output is
    //      rank-bounded at 3 rows per query regardless of corpus size. ----
    "hard_negatives" -> ((s, d) => {
      val rb = bm25Top10(s, d).select(col("q_id"), col("doc_id"))
      val rd = denseTop10(s, d)
      val negW = Window.partitionBy(col("q_id"))
        .orderBy(col("r_cos").asc)
      ordered(rd.join(rb, Seq("q_id", "doc_id"), "left_anti")
        .withColumn("rn", row_number().over(negW))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("doc_id"), col("r_cos"),
          dec4S(col("cos_raw")).as("cos")))
    }),

    // ---- SRC-1: per-source document cap — the domain-cap stage of a web
    //      pipeline (no single domain may dominate the corpus). Keeps ≤10
    //      docs per source, selected by content hash (uniform-ish,
    //      rand()-free, rerun-stable, ties by doc_id — same recipe as
    //      SMP-2), and reports retention per source. One window shuffle
    //      by source; at 100 TB a hash-threshold pre-filter would bound
    //      the window's input per source first. ----
    "src1" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val w = Window.partitionBy(col("source"))
        .orderBy(polyHash(col("text")).asc, col("doc_id").asc)
      val tot = doc.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      ordered(doc.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), davgS(col("n_chars")).as("avg_kept_chars"))
        .join(tot, "source")
        .select(col("source"), col("n_total"), col("n_kept"), col("avg_kept_chars")))
    }),

    // ---- SMP-3: per-stratum RATE sampling — rebalance the language mix
    //      by keeping a different deterministic fraction per stratum
    //      (downsample the dominant language, keep the rest). The keep
    //      decision is a pure filter on a hash prefix (md5 hex < per-lang
    //      threshold): no window, no shuffle beyond the summary agg — at
    //      100 TB this is THE sampling shape, because rank-based capping
    //      (SMP-2/SRC-1) must shuffle every stratum through a window
    //      while a rate filter is embarrassingly parallel at the scan.
    //      md5 (not polyHash) so the oracle computes the identical bits:
    //      hex compare of the first 2 chars = 256-bucket uniform rate.
    //      '1a' = 26/256 ≈ 10.2% for the dominant lang, '80' = 128/256 =
    //      50% elsewhere. ----
    "smp_rate" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val thr = when(col("lang") === "en", lit("1a")).otherwise(lit("80"))
      val kept = substring(md5(col("doc_id").cast("string")), 1, 2) < thr
      // Mean over KEPT rows only: davg's count(1) denominator would count
      // the whole stratum. A stratum keeping zero rows yields NULL in both
      // engines (NULL sum / 0 → NULL).
      val avgKept = dec4(sum(dec(when(kept, col("n_chars")))).cast("double") /
        sum(kept.cast("long")))
      ordered(doc.groupBy(col("lang")).agg(
        count(lit(1)).as("n_total"),
        sum(kept.cast("long")).as("n_kept"),
        cstr(avgKept).as("avg_kept_chars")))
    }),

    // ---- SMP-6: join-consistent UNIVERSE sampling (`smp_universe`) —
    //      the sampling shape that SURVIVES joins (Quickr/BlinkDB
    //      lineage, public): independent per-row Bernoulli samples of
    //      two fact tables destroy their join (P(both sides of a pair
    //      kept) = p², and per-key multiplicities are broken), so a
    //      pipeline that debugs a 100 TB join on samples needs the
    //      UNIVERSE scheme — hash the JOIN KEY into [0,1) and keep the
    //      same key-universe slice on BOTH tables. Join multiplicity is
    //      then EXACT on sampled keys: join(sample(O), sample(L)) ≡
    //      sample(join(O, L)) as sets, not in expectation (the law
    //      PipelineOpsSpec pins; the md5-prefix predicate is SMP-3's
    //      idiom so both engines decide identically bit-for-bit). The
    //      keep test is a scan-level filter on each side — pushed to the
    //      parquet scan, embarrassingly parallel, no coordination
    //      between the two tables beyond sharing the hash constant. ----
    "smp_universe" -> ((s, d) => {
      val o = load(s, d, "orders")
      val l = load(s, d, "lineitem")
      // ~10.2% key universe: first 2 md5 hex chars < '1a' (26/256).
      def keep(k: Column) = substring(md5(k.cast("string")), 1, 2) < lit("1a")
      val os = o.filter(keep(col("o_orderkey")))
      val ls = l.filter(keep(col("l_orderkey")))
      val avgPrice = dec4(sum(dec(col("l_extendedprice"))).cast("double") /
        count(lit(1)))
      ordered(os.join(ls, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"),
          cstr(avgPrice).as("avg_price")))
    }),

    // ---- VQ-AUDIT: embedding-quality audit (`vec_norm_audit`) — the
    //      gate an embedding pipeline runs BEFORE building indexes or
    //      deduping on cosine: per label, zero-norm vectors (cosine is
    //      undefined — they poison every downstream similarity), any
    //      non-finite component (one NaN silently NaN-ifies a whole
    //      centroid), dimension consistency (a mixed-dim batch breaks
    //      every dot product), plus the norm distribution (p50/p95 and a
    //      decimal-summed mean — a collapsed or exploding norm profile is
    //      the classic embedding-model regression signal). Exactness:
    //      norms via the left-fold HOF (bit-equal cross-engine — the
    //      ddp_embed precedent), percentile exact type-7 (AGG-7), mean
    //      over dec4-quantized norms (order-free decimal sum). Pure scan
    //      + one 10-group aggregate — the cheapest pre-index audit at any
    //      corpus size, composes incrementally per ingest batch. ----
    "vec_norm_audit" -> ((s, d) => {
      val v = load(s, d, "embeddings")
      val nrm = sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      val bad = exists(col("embedding"), x =>
        isnan(x.cast("double")) ||
        abs(x.cast("double")) === lit(Double.PositiveInfinity))
      val base = v.select(col("label"),
        size(col("embedding")).as("dim"), nrm.as("nrm"),
        bad.cast("int").as("bad"))
      ordered(base.groupBy(col("label")).agg(
        count(lit(1)).as("n"),
        sum(when(col("nrm") < 1e-12, 1L).otherwise(0L)).as("n_zero"),
        sum(col("bad")).cast("long").as("n_nonfinite"),
        min(col("dim")).as("dim_min"), max(col("dim")).as("dim_max"),
        farrS(expr("percentile(nrm, array(0.5D, 0.95D))")).as("norm_pct"),
        dec4S(sum(dec4(col("nrm"))).cast(dt).cast("double") /
          count(lit(1)).cast("double")).as("norm_mean")))
    }),

    // ---- VQ-DRIFT: embedding-norm drift (`vec_norm_drift`) — VQ-AUDIT's
    //      two-sample sibling and the embedding-model REGRESSION detector:
    //      exact Kolmogorov–Smirnov between the norm distributions of two
    //      embedding populations (here the even/odd vec_id halves — the
    //      stand-in for "yesterday's model vs today's"): a re-trained or
    //      mis-scaled encoder shifts the norm profile long before recall
    //      metrics notice, and KS reads it distribution-free. DRIFT-2's
    //      exact distributed machinery verbatim: collapse to one row per
    //      distinct norm (bit-equal doubles — the left-fold + sqrt is the
    //      same IEEE program in both engines), GlobalRank's two-pass
    //      exclusive prefix recovers both ECDFs with no single-task sort,
    //      argmax ties → smallest norm, reject = D > 1.3581·√((nA+nB)/
    //      (nA·nB)) with the count product in DOUBLE (drift_ks's overflow
    //      rule). ----
    "vec_norm_drift" -> ((s, d) => {
      val v = load(s, d, "embeddings")
      val nrm = sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      val perV = v.select(nrm.as("value"),
          when(col("vec_id") % 2 === 0, 1L).otherwise(0L).as("ia"))
        .groupBy(col("value"))
        .agg(sum(col("ia")).as("ca"), sum(lit(1L) - col("ia")).as("cb"))
      val withP = graft.operators.GlobalRank.attach(perV,
        Seq(col("value").asc), None, Seq("ca" -> "pa", "cb" -> "pb"))
      val tot = withP.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      def nz(c: Column): Column = when(c === 0L, lit(null)).otherwise(c)
      val diff = abs(
        (col("pa") + col("ca")).cast("double") / nz(col("na")).cast("double") -
        (col("pb") + col("cb")).cast("double") / nz(col("nb")).cast("double"))
      val scored = withP.crossJoin(broadcast(tot)).withColumn("diff", diff)
      val dmax = scored.agg(max(col("diff")).as("dmax"))
      val thr = lit(1.3581) * sqrt(
        (col("na") + col("nb")).cast("double") /
          (col("na").cast("double") * col("nb").cast("double")))
      ordered(scored.crossJoin(broadcast(dmax))
        .filter(col("diff") === col("dmax"))
        .groupBy(col("na"), col("nb"), col("dmax"))
        .agg(min(col("value")).as("atv"))
        .select(col("na").as("n_a"), col("nb").as("n_b"),
          dec4S(col("dmax")).as("ks_d"),
          dec4S(col("atv")).as("at_norm"),
          (dec4(col("dmax")) > dec4(thr)).as("reject")))
    }),

    // ---- VQ-1: int8 vector quantization + reconstruction error — the
    //      embedding-STORAGE op: 64 float32 dims → 64 int8 codes + one
    //      scale (4× smaller, the difference between embeddings fitting
    //      in cluster memory or not at 100 TB). Per-vector max-abs
    //      scaling, symmetric round-half-up (floor(x/s + 0.5) — tie-safe
    //      identical in both engines), and the relative L2 reconstruction
    //      error ‖x − q·s‖/‖x‖ as the quality metric (~0.5% on this
    //      corpus — the standard int8 result). Pure per-row projection,
    //      scan-bound; left-fold HOF sums keep the oracle bit-equal. ----
    // ---- PCA-1: dominant principal component by distributed power
    //      iteration (`vec_pca`) — the SPECTRAL embedding diagnostic
    //      (whitening, anisotropy checks, ABTT "all-but-the-top" dominant
    //      -direction removal, Mu & Viswanath 2018, public): 3 fixed
    //      power-iteration rounds on the centered covariance, C·t spelled
    //      as ONE map-side-combined aggregate per round — per row the
    //      projection s = c·t (dot_product's in-order fold), per dim
    //      Σ_rows s·c_d accumulated as dec8-quantized EXACT decimal sums
    //      (order-free across rows — the §5.3 float-accumulation hazard
    //      designed out, graph_pagerank's fixed-iteration discipline on
    //      dense vectors); the covariance matrix itself is NEVER
    //      materialized (64×64 would be fine; d×d at production widths
    //      is not — the matvec form is the one that scales). Per round
    //      the output ships the Rayleigh quotient λ = Σs²/n (monotone
    //      non-decreasing across power-iteration rounds — the
    //      convergence certificate, kmeans_iter's ship-the-certificate
    //      rule), the explained-variance ratio λ/tv, and the dec4
    //      iterate itself. Seed t₀ = e₁ (deterministic; a seed exactly
    //      orthogonal to PC1 is measure-zero and would surface as a
    //      non-converging λ — visible in the shipped certificate).
    //      Scale shape: each round = one broadcast of the 64-double
    //      iterate + one aggregate (no shuffle beyond the 1-row
    //      combine), rounds chain by pinned 1-row relations — at 100 TB
    //      this is the standard distributed power method (work
    //      scan-proportional per round, state = one vector). ----
    "vec_pca" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dbl = transform(col("embedding"), x => x.cast("double"))
      val raw = emb.select(col("vec_id"), dbl.as("e"))
      // Per-dim dec4 means (ivfKmeansCentroids' centroid discipline) —
      // identical doubles in both engines, so centering is exact-equal.
      val muCols = (1 to 64).map(i =>
        dec4(dsum4(element_at(col("e"), i)).cast("double") / count(lit(1)))
          .cast("double").as(s"m$i"))
      val mu = raw.agg(muCols.head, muCols.tail: _*)
        .select(array((1 to 64).map(i => col(s"m$i")): _*).as("mu"))
      val cent = raw.crossJoin(broadcast(mu))
        .select(col("vec_id"),
          zip_with(col("e"), col("mu"), (a, b) => a - b).as("c"))
        .pinned // read by all three rounds + the total-variance pass
      val tv = cent.agg((sum(dec8(dot_product(col("c"), col("c"))))
        .cast("double") / count(lit(1))).as("tv"))
      var t: DataFrame = s.range(1).select(
        array((1 to 64).map(i => lit(if (i == 1) 1.0 else 0.0)): _*).as("t"))
      val rounds = (1 to 3).map { r =>
        val scored = cent.crossJoin(broadcast(t))
          .withColumn("sc", dot_product(col("c"), col("t")))
        val aggCols = (1 to 64).map(i =>
          sum(dec8(col("sc") * element_at(col("c"), i)))
            .cast(DecimalType(38, 8)).as(s"v$i")) ++ Seq(
          sum(dec8(col("sc") * col("sc"))).cast(DecimalType(38, 8)).as("ss"),
          count(lit(1)).as("nn"))
        val va = scored.agg(aggCols.head, aggCols.tail: _*)
          .select(array((1 to 64).map(i => col(s"v$i").cast("double")): _*)
            .as("v"), (col("ss").cast("double") / col("nn")).as("lambda"))
        val tn = va.select(transform(col("v"), x =>
            dec4(x / sqrt(dot_product(col("v"), col("v")))).cast("double"))
          .as("t"), col("lambda")).pinned
        t = tn.select(col("t"))
        tn.select(lit(r).as("rnd"), col("lambda"), col("t"))
      }
      ordered(rounds.reduce(_ unionByName _).crossJoin(broadcast(tv))
        .select(col("rnd"),
          dec4S(col("lambda")).as("lambda"),
          dec4S(col("lambda") / col("tv")).as("evr"),
          farrS(col("t")).as("component")))
    }),

    "vec_quant" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val e = transform(col("embedding"), x => x.cast("double"))
      val t = emb.select(col("vec_id"), e.as("e"))
        .withColumn("scale", array_max(transform(col("e"), x => abs(x))) / lit(127.0))
        .withColumn("qv", transform(col("e"), x => floor(x / col("scale") + lit(0.5))))
      val sqSum = (c: Column) => aggregate(c, lit(0.0), (a, b) => a + b)
      ordered(t.select(col("vec_id"),
        dec4S(col("scale")).as("scale_s"),
        array_max(col("qv")).cast("long").as("q_max"),
        array_min(col("qv")).cast("long").as("q_min"),
        dec4S(sqrt(sqSum(zip_with(col("e"), col("qv"),
            (x, q) => (x - q * col("scale")) * (x - q * col("scale"))))) /
          sqrt(sqSum(transform(col("e"), x => x * x)))).as("rel_err")))
    }),

    // ---- PQ-1: product quantization — the CODEBOOK compression path
    //      complementing VQ-1's scalar int8: the 64-d vector splits into
    //      8 contiguous 8-d subvectors, each assigned to its nearest
    //      centroid in a per-subspace codebook of ≤16 entries, so a
    //      vector stores as 8 nibble codes (≈64× vs float32; ANN then
    //      scores against codebook entries via lookup tables — the
    //      IVF-PQ layout every billion-vector index uses). Codebooks are
    //      data-derived and DETERMINISTIC: cells seeded by the sign
    //      pattern of the subvector's first 4 dims (the one-step
    //      quantizer standing in for k-means, whose iteration count —
    //      not the relational shape — is the only production delta;
    //      sim1_ivf precedent), centroids = dec4-quantized per-dim
    //      means. Float discipline (§5.3): every element dec4-quantized
    //      FIRST, distances then accumulate as exact DECIMAL(38,8)
    //      products — order-independent sums, argmin comparisons on
    //      exact decimals (ties by cell id), bit-equal across engines
    //      by construction, no double accumulation anywhere. Scale
    //      shape: the long-form explode is ∝ corpus dims (the scan
    //      itself); codebooks collapse to ≤ 8·16·8 = 1024 rows →
    //      broadcast to the assignment join; per-vector state after
    //      assignment is 8 rows. decimal→double for the relative error
    //      is safe here: unscaled values < 2⁵³ make the cast one
    //      correct rounding in both engines. ----
    "vec_pq" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val long = emb.select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("p0", "xf")))
        .select(col("vec_id"),
          (call_function("div", col("p0"), lit(8)) + 1).as("sp"),
          (pmod(col("p0"), lit(8)) + 1).as("p"),
          // DECIMAL(18,4), not the canonical (38,4): the distance terms
          // below multiply two of these, and Spark reduces the RESULT
          // SCALE when p1+p2+1 overflows 38 (scale-6 terms != DuckDB's
          // exact scale-8) — 18+18+1 fits, so the product keeps scale 8
          // exactly in both engines.
          dec4(col("xf").cast("double")).cast(DecimalType(18, 4)).as("xq"))
        .pinned
      val cells = long.groupBy(col("vec_id"), col("sp"))
        .agg(sum(when(col("xq") > 0,
            when(col("p") === 1, 8).when(col("p") === 2, 4)
              .when(col("p") === 3, 2).when(col("p") === 4, 1).otherwise(0))
          .otherwise(0)).cast("int").as("cell"))
      val cent = long.join(cells, Seq("vec_id", "sp"))
        .groupBy(col("sp"), col("cell"), col("p"))
        .agg(dec4(sum(col("xq")).cast("double") / count(lit(1)))
          .cast(DecimalType(18, 4)).as("c"))
      val cand = long.join(broadcast(cent), Seq("sp", "p"))
        // The diff widens to (19,4) and its square would overflow 38
        // again — cast back to (18,4) (exact: |xq−c| < 10¹⁴) so the
        // product keeps scale 8.
        .withColumn("dd", (col("xq") - col("c")).cast(DecimalType(18, 4)))
        .withColumn("t", col("dd") * col("dd"))
        .groupBy(col("vec_id"), col("sp"), col("cell"))
        .agg(sum(col("t")).as("dist"))
      val wsp = Window.partitionBy(col("vec_id"), col("sp"))
        .orderBy(col("dist").asc, col("cell").asc)
      val chosen = cand.withColumn("rn", row_number().over(wsp))
        .filter(col("rn") === 1)
      val err = chosen.groupBy(col("vec_id"))
        .agg(sum(col("dist")).cast(DecimalType(38, 8)).as("errsq"),
          array_join(transform(
            array_sort(collect_list(struct(col("sp"), col("cell")))),
            x => x.getField("cell").cast("string")), "-").as("code"))
      val tot = long.groupBy(col("vec_id"))
        .agg(sum(col("xq") * col("xq")).cast(DecimalType(38, 8)).as("totsq"))
      ordered(err.join(tot, Seq("vec_id"))
        .select(col("vec_id"), col("code"),
          cstr(col("errsq")).as("err_sq"),
          dec4S(col("errsq").cast("double") / col("totsq").cast("double"))
            .as("err_rel")))
    }),

    // ---- SKT-1: count-min-sketch frequency estimation, expressed
    //      RELATIONALLY — the mergeable-sketch shape behind streaming
    //      heavy-hitter detection, spelled as what it really is: d=2 rows
    //      of w=1024 counters, each row a groupBy(hash(tok) % w) SUM.
    //      Counters are commutative sums, so the sketch — and therefore
    //      every estimate (min over rows of the hashed-bucket counter) —
    //      is bit-deterministic regardless of partitioning/merge order,
    //      which is what makes this query ORACLE-HASHABLE while the
    //      approx_* family (engine-specific HLL/t-digest layouts, §2.7)
    //      is not. The two hash streams reuse the portable 31-poly
    //      (second stream = '#'-prefixed input). At 100 TB: the sketch is
    //      a fixed d×w table (8 KB here) built in one map-side-combined
    //      pass — THE bounded-memory substitute for a full frequency
    //      table; est ≥ exact always (collisions only add). ----
    "freq_cms" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val W = 1024L
      // Vocabulary-sized exact counts, materialized once for the three
      // consumers (two counter rows + the candidate top-k).
      val cnt = doc.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .pinned
      val b1 = polyHash(col("tok")) % W
      val b2 = polyHash(concat(lit("#"), col("tok"))) % W
      val row1 = cnt.groupBy(b1.as("b")).agg(sum(col("n")).as("c1"))
      val row2 = cnt.groupBy(b2.as("b")).agg(sum(col("n")).as("c2"))
      val top = cnt.orderBy(col("n").desc, col("tok").asc).limit(10)
      ordered(top.withColumn("b1", b1).withColumn("b2", b2)
        .join(broadcast(row1), col("b1") === row1("b"))
        .join(broadcast(row2), col("b2") === row2("b"))
        .select(col("tok"), col("n"), least(col("c1"), col("c2")).as("est")))
    }),

    // ---- SKT-2: Misra–Gries frequent-items summary (`freq_mg`) — the
    //      ENUMERATING member of the sketch family: SKT-1's count-min
    //      answers point lookups but can't list the heavy items; the
    //      full groupBy-count-sort enumerates exactly but shuffles the
    //      whole vocabulary (billions of n-gram keys at 100 TB). The MG
    //      summary ([[graft.functions.MGSketch]], a
    //      TypedImperativeAggregate like AGG-19's quantile state) keeps
    //      ≤ k pairs per partial, merges associatively (Agarwal et al.
    //      2012 rule), and guarantees true−n/(k+1) ≤ est ≤ true plus
    //      COVERAGE of every item above n/(k+1) under ANY merge tree.
    //      Retained counts are merge-order-dependent (unlike SKT-1's
    //      commutative counters), so like agg_qsketch this gates
    //      rows-only; ApproxSpec asserts both ε laws against exact
    //      counts and GraftLaws pins the merge-tree invariance. ----
    "freq_mg" -> ((s, d) =>
      // ONE code path with the streaming twin (STR-HH): the same
      // function body serves batch here and the Complete-mode stream —
      // the clickPurchaseJoin/docCleanProjection structural-equivalence
      // discipline, so the two gates (this rows-only entry + the
      // StreamingSpec drain) certify one definition.
      ordered(graft.streaming.StreamOps.heavyHitterStream(
        load(s, d, "documents")))),

    // ---- SKT-3: sketch-guided two-pass EXACT top-K (`freq_topk_exact`)
    //      — how a 100 TB engine gets exact heavy hitters without the
    //      full-vocabulary shuffle: pass 1 elects ≤ k candidates via the
    //      MG summary (map-side partials, one bounded-state shuffle);
    //      pass 2 exact-counts ONLY the candidate stream (broadcast
    //      semi-join filter at the scan, ≤ k result groups) and takes
    //      the top 20 by (count desc, tok asc). MG's coverage guarantee
    //      (every item above n/(k+1) retained, any merge tree) makes the
    //      candidate set a superset of the true top-K on any corpus
    //      whose K-th item clears n/(k+1) — Zipfian text clears it by
    //      ~40× here — and ANY superset yields the identical exact
    //      pass-2 answer, which is why this composition HASH-gates
    //      against the plain groupBy-count-limit oracle even though the
    //      sketch itself is merge-order-dependent. Contrast txt_topwords
    //      (exact full shuffle, fine per-language at sf) — this is the
    //      same answer shape with shuffle volume O(k·partitions), not
    //      O(vocabulary). ----
    "freq_topk_exact" -> ((s, d) => {
      import graft.functions.HeavyHitters.heavy_hitters_items
      val doc = load(s, d, "documents")
      // NOT pinned: both passes re-derive the token stream from the
      // documents scan (codegen explode) — at 100 TB you cannot
      // checkpoint the token stream, and two scans of the source are
      // the two-pass algorithm's declared cost.
      def toks = doc.select(explode(split(col("text"), " ")).as("tok"))
      val cand = toks
        .agg(heavy_hitters_items(col("tok"), 1024).as("cands"))
        .select(explode(col("cands")).as("tok"))
      ordered(toks.join(broadcast(cand), "tok")
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc).limit(20))
    }),

    // ---- SKT-4: sketch-based JOIN-SIZE estimation (`join_size_cms`) —
    //      the planner-grade question ("how big is this join going to
    //      be?") answered WITHOUT running the join: for an equi-join the
    //      true size is Σ_k n_a(k)·n_b(k), and the CMS inner product
    //      Σ_b c_a(b)·c_b(b) per hash row — min over independent rows —
    //      OVERESTIMATES it by exactly the collision mass (AMS/CMS
    //      lineage, public: est ≥ exact always, E[slack] ≤ N_a·N_b/w).
    //      Probed here on the many-to-many self-join lineitem ⋈ lineitem
    //      ON l_partkey (size Σ n(k)² — the shape that detonates when a
    //      key is hot; key-unique joins need no estimator). Like SKT-1
    //      the counters are commutative SUMS of the portable 31-poly
    //      hash buckets, so the whole estimate is bit-deterministic and
    //      oracle-HASHABLE — no ε gate needed, the slack itself is the
    //      pinned number. At 100 TB: each side's sketch is a w-bounded
    //      aggregate built in one map-side-combined pass over its scan;
    //      comparing sketches costs O(w), not O(join) — run it BEFORE
    //      committing the cluster to a detonating shuffle. ----
    "join_size_cms" -> ((s, d) => {
      val l = load(s, d, "lineitem")
      val W = 1024L
      val cnt = l.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        .pinned // vocabulary-sized; feeds both counter rows + the exact leg
      val b1 = polyHash(col("l_partkey").cast("string")) % W
      val b2 = polyHash(concat(lit("#"), col("l_partkey").cast("string"))) % W
      def sqSum(b: Column) = cnt.groupBy(b.as("b"))
        .agg(sum(col("n")).as("c"))
        .agg(sum(col("c") * col("c")).as("e"))
      val est1 = sqSum(b1).select(col("e").as("est1"))
      val est2 = sqSum(b2).select(col("e").as("est2"))
      val exact = cnt.agg(sum(col("n") * col("n")).as("exact_size"),
        count(lit(1)).as("n_keys"))
      ordered(exact.crossJoin(broadcast(est1)).crossJoin(broadcast(est2))
        .select(col("exact_size"),
          least(col("est1"), col("est2")).as("est_size"),
          col("n_keys"),
          cstr(dec4(least(col("est1"), col("est2")).cast("double") /
            col("exact_size").cast("double"))).as("overcount")))
    }),

    // ---- SMP-4: deterministic WEIGHTED (importance) sampling — keep
    //      probability ∝ a per-row weight (here n_chars: longer docs kept
    //      more often), the data-mixing primitive behind upweighting
    //      high-quality sources without replicating rows. Keep test:
    //      uniform(doc_id) < w/w_max, where uniform = first 6 md5 hex
    //      digits / 16^6 — exact integer-derived doubles, so Spark and
    //      DuckDB decide identically. w_max is a 1-row broadcast scalar
    //      (the standard scalar-attach: no shuffle, no window); the whole
    //      op stays a scan-level filter like SMP-3. The summary's
    //      avg-weight-kept > avg-weight-all gap is the measurable
    //      importance-sampling effect. ----
    "smp_weighted" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val wmax = doc.agg(max(col("n_chars")).as("wmax"))
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("double") / lit(16777216.0)
      val kept = u < col("n_chars").cast("double") / col("wmax").cast("double")
      val nKept = sum(kept.cast("long"))
      val avgAll = dec4(sum(dec(col("n_chars"))).cast("double") / count(lit(1)))
      val avgKept = dec4(sum(dec(when(kept, col("n_chars")))).cast("double") / nKept)
      ordered(doc.crossJoin(broadcast(wmax)).groupBy(col("lang")).agg(
        count(lit(1)).as("n_total"),
        nKept.as("n_kept"),
        cstr(avgAll).as("avg_w_all"),
        cstr(avgKept).as("avg_w_kept")))
    }),

    // ---- SMP-5: priority sampling (Duffield–Lund–Thorup) — weighted
    //      sampling WITHOUT replacement, the missing quadrant of the
    //      sampling family (SMP-3 rate = unweighted w/o quota, SMP-4 =
    //      weighted rate, SMP-2 = unweighted top-k): per stratum, keep
    //      the k=5 docs with the highest PRIORITY w/u (w = n_chars,
    //      u uniform in (0,1] from the content hash) — the classic
    //      bounded-size weighted sample whose (k+1)-th priority τ yields
    //      unbiased subset-sum estimates via max(w, τ). Chosen over
    //      Efraimidis–Spirakis keys (u^(1/w)) deliberately: w/u is ONE
    //      IEEE division of exact dyadic doubles, bit-identical across
    //      engines, where pow/ln route through libm and risk 1-ulp rank
    //      flips (§5.3 determinism discipline). Scale shape: pure
    //      projection + per-stratum top-k (WindowGroupLimit) — at 100 TB
    //      a τ-threshold pre-filter bounds each stratum's window input
    //      the same way SMP-2's note prescribes. ----
    "smp_priority" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("double") + lit(1.0)) / lit(16777217.0)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("prio").desc, col("doc_id").asc)
      ordered(doc.withColumn("prio", col("n_chars").cast("double") / u)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"),
          dec4S(col("prio")).as("priority")))
    }),

    // ---- SEL-1: DSIR importance-weighted data selection (`dsir_select`)
    //      — Data Selection with Importance Resampling (Xie et al. 2023,
    //      public): score every raw-pool doc by how much it looks drawn
    //      from a TARGET distribution under bag-of-hashed-ngram unigram
    //      models — the targeted-selection step the sampling family
    //      lacks (SMP-3/4 weight by metadata; this weights by CONTENT
    //      distribution match). Features = every unigram + word-bigram
    //      OCCURRENCE (counts, not distinct — DSIR's bag model), hashed
    //      into B=256 buckets (md5 first byte — the paper's 10k buckets
    //      right-sized to this corpus's ~31-word vocabulary; at 100 TB
    //      widen the prefix). Target = the `en` slice (stand-in for
    //      "looks like the high-quality reference corpus"); source = the
    //      whole pool. Per bucket the add-1-smoothed log likelihood
    //      ratio lr_b = ln((ct_b+1)/(T+B)) − ln((cs_b+1)/(S+B)) is
    //      dec8-quantized ONCE into a 256-row broadcast table (dec4
    //      would zero small-ratio buckets; the ln itself is the
    //      lm_score/bm25 precedent — identical IEEE double arguments in
    //      both engines, quantized one level up; each ratio FACTOR casts
    //      to double before the multiply, so the products are exact
    //      below 2⁵³ — the gated scales — and correctly-rounded
    //      identically in both engines beyond it, with no int64
    //      overflow cliff at 100 TB gram totals). Domain = docs
    //      with ≥1 gram (non-empty text) — gram-less docs have no
    //      feature rows and no score here or in quality_lr; the
    //      STREAMED scorer's serving spine covers them at z = w0 − K.
    //      A doc's
    //      importance log-weight is then the EXACT decimal sum
    //      Σ n_b·lr_b over its bucket counts — order-free,
    //      engine-identical ((9,0)×(28,8) products cap at precision 38,
    //      PQ-1's no-silent-rescale discipline). `selected` = weight > 0
    //      (more target-like than the pool average — the deterministic
    //      variant of the paper's Gumbel resampling, which would need
    //      engine-matched randomness for no audit gain). Scale shape:
    //      one gram explode (scan-proportional) feeding two map-side-
    //      combined aggregates (256-row census + per-doc bucket counts),
    //      one 256-row broadcast join, one per-doc aggregate — no pair
    //      join, no window, nothing data² anywhere; the bucket census is
    //      index metadata exactly like SIM-1g's [min,max] grid. ----
    "dsir_select" -> ((s, d) =>
      ordered(dsirWeights(s, d)
        .select(col("doc_id"), col("lang"), col("n_feat"),
          cstr(col("w")).as("weight"),
          (col("w") > lit(0)).cast("int").as("selected")))),

    // ---- EVAL-CLS: paired selector discrimination audit (`lr_eval`) —
    //      the THRESHOLD-FREE judgment of the two selection rules on one
    //      task: rank-sum ROC AUC (auc_roc's exact tie-average identity,
    //      2U as exact int64, GlobalRank distributed prefix) of the
    //      DSIR importance weight vs the trained classifier logit, both
    //      against the same `en` labels over the SAME hashed-ngram
    //      feature space. quality_lr's 0.822-accuracy-vs-0.726-sign-rule
    //      comparison fixes one threshold each; this integrates over all
    //      thresholds — the number that says the discriminative model
    //      dominates everywhere, not just at zero (spec law pins
    //      auc_lr > auc_dsir > 0.5). Scores enter on a dec4 double grid
    //      (distinct-score collapse must group identical values in both
    //      engines; ties then resolve by the average-rank identity). ----
    "lr_eval" -> ((s, d) => {
      // ONE memoized gram relation feeds both selectors (the oracle's
      // shared `feat` CTE, mirrored in code — the explode is the
      // dominant scan, run once per process via gramBucketsOnce).
      val feat = gramBucketsOnce(s, d)
      val m = lrTrain(s, d) // memoized model over the same gram relation
      val lrS = lrScore(m.pd, m).select(
        (floor(col("z") * lit(1e4) + lit(0.5)) / lit(1e4)).as("score"),
        col("y").cast("long").as("pos"))
      val dw = dsirWeightsFrom(feat).select(
        (floor(col("w").cast("double") * lit(1e4) + lit(0.5)) / lit(1e4))
          .as("score"),
        (col("lang") === "en").cast("long").as("pos"))
      def aucOf(scored: DataFrame, mdl: String): DataFrame = {
        val perS = scored.groupBy(col("score")).agg(
          count(lit(1)).as("ct"), sum(col("pos")).as("cpos"))
        val withP = graft.operators.GlobalRank.attach(perS,
          Seq(col("score").asc), None, Seq("ct" -> "cbefore"))
        val one = withP.agg(
          sum(col("cpos")).as("n_pos"),
          sum(col("ct") - col("cpos")).as("n_neg"),
          sum(col("cpos") * (lit(2L) * col("cbefore") + col("ct") + lit(1L)))
            .as("r2pos"))
        val u2 = col("r2pos") - col("n_pos") * (col("n_pos") + 1L)
        val den = lit(2.0) * col("n_pos").cast("double") *
          col("n_neg").cast("double")
        val auc = u2.cast("double") /
          when(den === 0.0, lit(null)).otherwise(den)
        one.select(lit(mdl).as("model"), col("n_pos"), col("n_neg"),
          dec4S(auc).as("auc"))
      }
      ordered(aucOf(dw, "dsir").unionByName(aucOf(lrS, "lr")))
    }),

    // ---- EVAL-CLS2: classifier calibration (`lr_calibration`) — does
    //      the classifier's σ(z) = 0.7 mean 70%? calibration_bins'
    //      10-bin reliability design applied to CLS-1's own
    //      probabilities (the audit suite that ships WITH a classifier:
    //      accuracy at the zero threshold, AUC over all thresholds,
    //      and ECE for the probabilities themselves — the third is what
    //      a downstream mixture-weighting or acceptance-sampling stage
    //      actually consumes). σ(z) enters dec8-quantized (the training
    //      loop's own sigmoid discipline), bins are pure IEEE floor
    //      arithmetic, per-bin confidence finishes from dec4-per-row
    //      decimal sums — order-free everywhere. ----
    "lr_calibration" -> ((s, d) => {
      val m = lrTrain(s, d)
      val scored = lrScore(m.pd, m).select(
        dec8(lit(1.0) / (lit(1.0) + exp(-col("z")))).cast("double")
          .as("score"),
        col("y").cast("long").as("pos"))
      ordered(reliabilityTable(s, scored))
    }),

    // ---- EVAL-CLS3: temperature scaling (`lr_temp`) — the calibration
    //      FIX lr_calibration's audit itself calls for (ECE ≈ 0.1 with
    //      the few-round-GD S-shape: z magnitudes underfit, so σ(z)
    //      hugs 0.5 — underconfident everywhere). Guo et al. ICML'17:
    //      fit ONE scalar T on a held-out slice by minimizing NLL of
    //      σ(z/T), leave ranking/accuracy untouched (monotone), re-read
    //      the reliability. Parametrized as u = 1/T, the 1-D NLL is
    //      convex with closed-form derivatives — 5 Newton rounds, each
    //      ONE map-side-combined aggregate over the held slice
    //      (∂NLL/∂u = Σ(p−y)·z, ∂²NLL/∂u² = Σp(1−p)·z², p = σ(u·z)
    //      dec8 at birth, both folds exact decimal sums — the GD
    //      discipline verbatim, converged to the dec8 grid by round 4).
    //      Held slice = doc_id % 5 == 3 (a deterministic 20%; the model
    //      itself trains on the full corpus — T is the only thing fit
    //      here, and it is fit and read on the slice the gated output
    //      reports, the spec-pinned law being ECE_scaled < ECE_raw).
    //      Output: both 10-bin reliability blocks (variant raw/scaled)
    //      over the held slice plus the published T — the scalar a
    //      serving stack ships next to the model weights. Scale shape:
    //      scoring is CLS-1's pass; the fit is 5 × one aggregate over a
    //      broadcast-joined 1-row u — nothing data² anywhere. ----
    "lr_temp" -> ((s, d) => {
      val m = lrTrain(s, d)
      // Fit and blocks share ONE pinned held slice; the Newton loop is
      // the factored [[lrTempFitU]] — the SAME fit the calibrated
      // serving spine (StreamOps.runScoredIngest) broadcasts, so gated
      // and streamed calibration cannot drift.
      val held = lrHeldSlice(m)
      val u = lrTempFitU(s, held)
      val temp = u.select(dec4S(lit(1.0) / col("u")).as("temp"))
      def block(base: DataFrame, scoreOf: Column, variant: String): DataFrame =
        reliabilityTable(s, base.select(
          dec8(lit(1.0) / (lit(1.0) + exp(-scoreOf))).cast("double")
            .as("score"),
          col("y").cast("long").as("pos")))
          .withColumn("variant", lit(variant))
      // The raw block reads `held` directly — only the scaled block needs
      // the fitted u attached (review r12: the raw side's broadcast join
      // on u was a wasted stage + a false dependency on the Newton loop).
      ordered(block(held, col("z"), "raw")
        .unionByName(block(held.crossJoin(broadcast(u)),
          col("u") * col("z"), "scaled"))
        .crossJoin(broadcast(temp))
        .select(col("variant"), col("bin"), col("n"), col("n_pos"),
          col("conf"), col("acc"), col("ece"), col("temp")))
    }),

    // ---- DDP-CDC: content-defined chunking dedup census (`ddp_cdc`) —
    //      the STORAGE-dedup primitive (LBFS, Muthitacharoen et al.
    //      SOSP'01; FastCDC lineage — all public): cut every doc at
    //      positions where the hash of the trailing 8-char window lands
    //      in 1/16 of the hash space (mean chunk ≈ 16 chars), so
    //      IDENTICAL SUBSTRINGS ALIGN AT IDENTICAL BOUNDARIES REGARDLESS
    //      OF OFFSET — the shift-resistance fixed-size blocks cannot
    //      have and the property the whole scheme exists for
    //      (spec-pinned on crafted offset-shifted docs). Complements the
    //      dedup ladder's other granularities: DDP-X is doc-granular,
    //      DDP-SEG/SCRUB are fixed word-grid segments, DDP-WIN SAMPLES
    //      fingerprints for candidate detection — this COVERS the full
    //      byte stream with aligned chunks, the semantics a dedup STORE
    //      needs (every duplicated byte is actually deduplicated, not
    //      just detected). Per doc: chunk count, chunked chars
    //      (= doc length, the partition law), instance-duplicated chunk
    //      count/chars (global instance count ≥ 2), and the dedupable
    //      fraction. Window hash = md5 of the window (portable to the
    //      oracle verbatim); production swaps in a Gear/Rabin ROLLING
    //      hash for O(1)/byte — same boundaries-from-content semantics,
    //      this query IS the census that prices the chunk store. ----
    "ddp_cdc" -> ((s, d) => {
      val doc = load(s, d, "documents")
      // Boundary at i (window = chars i−7…i) iff the window md5 starts
      // '0'; a boundary at the last char is a no-op cut and is dropped so
      // the tail chunk is never empty (mirrored in the oracle).
      //
      // SHAPE NOTE: the window md5 runs in a PLAIN projection after an
      // explode, never inside a HOF lambda — higher-order functions are
      // CodegenFallback and re-evaluate captured subtrees per element,
      // which turned the one-pass scan into O(len²) md5 calls per doc in
      // the array-only formulation (measured 34 s → 1.5 s at sf0.01).
      // Boundary positions group back per doc, so the chunk-extraction
      // lambdas below touch only materialized small arrays.
      val base = doc.filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"), col("text"),
          length(col("text")).as("n"))
        .pinned // read by the window scan and the cut join
      val wins = base.filter(col("n") >= 8)
        .select(col("doc_id"), col("n"),
          posexplode(transform(sequence(lit(8), col("n")), i =>
            col("text").substr(i - 7, lit(8)))).as(Seq("k", "w")))
        .select(col("doc_id"), (col("k") + 8).as("i"), col("n"), col("w"))
        .filter(substring(md5(col("w")), 1, 1) === "0" && col("i") =!= col("n"))
      val bps = wins.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("i").cast("int"))).as("bp"))
      val cuts = concat(array(lit(0)),
        coalesce(col("bp"), array().cast("array<int>")), array(col("n")))
      ordered(cdcCensus(cdcChunkRows(
        base.join(bps, Seq("doc_id"), "left").withColumn("cuts", cuts))
        .pinned))
    }),

    // ---- DDP-CDC-GEAR: gear-hash content-defined chunking
    //      (`ddp_cdc_gear`) — ddp_cdc's declared production swap
    //      EXECUTED (r13; FastCDC lineage, public): boundaries from the
    //      codegen'd GearBoundaries Expression — ONE table lookup +
    //      shift + add per character (O(1)/byte) instead of a full md5
    //      digest per position — same mean chunk (1/16 rate), same
    //      no-empty-tail convention, same census/dup-ratio semantics and
    //      output shape as ddp_cdc, so the two rows read side by side.
    //      The oracle exploits gear's shift identity: h's low 4 bits
    //      depend on only the last 4 characters, so the boundary
    //      predicate is positionally computable in SQL while the engine
    //      side runs the one-pass rolling loop inside whole-stage
    //      codegen (no explode, no per-position window relation at
    //      all — the boundary scan is a single projection). ----
    "ddp_cdc_gear" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val base = doc.filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"), col("text"),
          length(col("text")).cast("int").as("n"),
          graft.functions.GraftFunctions.gear_cuts(col("text")).as("bp"))
      val cuts = concat(array(lit(0)), col("bp"), array(col("n")))
      ordered(cdcCensus(cdcChunkRows(base.withColumn("cuts", cuts)).pinned))
    }),

    // ---- CLS-1: in-engine quality-classifier training + fleet apply
    //      (`quality_lr`) — the DISCRIMINATIVE selector beside SEL-1's
    //      generative one (the GPT-3/PaLM recipe: train a linear
    //      classifier on weak target labels over hashed text features,
    //      score the whole pool): logistic regression on SEL-1's own
    //      256-bucket hashed-ngram tf features (one feature space, so
    //      the two rules are comparable on the same task), trained by 5
    //      full-batch gradient rounds (η=2, w₀=0) — measured accuracy
    //      0.82 at sf0.01 vs the majority baseline 0.56 and DSIR's
    //      sign rule 0.73: the trained discriminative boundary beats the
    //      smoothed likelihood ratio on the identical features, which is
    //      exactly why production pipelines pay for the classifier.
    //      Standardization is REQUIRED (raw tf gradients are dominated
    //      by the shared-vocabulary common component — measured: GD
    //      oscillates between the two constant predictors without it)
    //      and is folded into per-round CONSTANTS so sparsity survives:
    //      z_d = w0 − Σ_b w_b·μ_b/σ_b + Σ_{present} w_b·x_db/σ_b, i.e.
    //      the dense (0 − μ)/σ contributions of ABSENT buckets collapse
    //      into one broadcast scalar per round; the gradient factors the
    //      same way (g_b = (S_b − μ_b·R)/σ_b/n with S_b a present-only
    //      sum and R the residual total) — the sparse relational GD a
    //      100 TB classifier run needs (per round: one posting join +
    //      two map-side-combined aggregates + 257 broadcast values).
    //      Determinism (§5.3): every cross-row sum is a dec8-quantized
    //      exact decimal fold; the sigmoid is quantized to dec8
    //      IMMEDIATELY (exp's last-ulp is the only libm exposure — one
    //      quantized value per (doc, round) bounds it, ln's lm_score
    //      precedent); every scalar chain is spelled with the same
    //      left-association in both engines. ----
    "quality_lr" -> ((s, d) => {
      val m = lrTrain(s, d)
      ordered(lrScore(m.pd, m)
        .select(col("doc_id"), col("lang"),
          dec4S(col("z")).as("score"),
          (col("z") > lit(0.0)).cast("int").as("pred")))
    }),

    // ---- MIX-1: dataset mixing PLAN — the step before smp_rate/
    //      smp_weighted can run: given per-language token inventories,
    //      compute the per-stratum keep rates for the LARGEST uniform-mix
    //      corpus that needs no upsampling. Feasibility pins the budget:
    //      every lang must reach the same token count with rate ≤ 1, so
    //      target_tokens = min over langs of actual tokens, and
    //      rate_lang = target / actual (the scarcest language keeps
    //      everything, dominant ones downsample). One groupBy(lang) agg
    //      (map-side combined token sum) + a 1-row broadcast scalar
    //      attach — no window, no second shuffle; at 100 TB the plan is
    //      a handful of rows feeding the scan-level rate filters. ----
    // ---- SPL-2: temporal embargo split (`split_embargo`) — SPL-1 guards
    //      content leakage (dup groups straddling splits); this guards
    //      TIME leakage for forecasting/ranking data: train strictly
    //      before T−3d, test at/after T, and the 3-day embargo between
    //      them DISCARDED — the purge that stops lagged/windowed features
    //      computed at train time from touching test-period information
    //      (de Prado's purged split; every rolling feature with lookback
    //      ≤ embargo is then provably test-blind). Census per segment
    //      (events, users, exact µs bounds) plus the train∩test user
    //      overlap row — expected NONZERO here (same users continue into
    //      the future; that is the forecasting regime) and reported so
    //      the entity-level alternative (SPL-1/SMP-1) is a measured
    //      choice, not an assumption. Shape: one scan-level segment tag +
    //      map-side-combined census + a users-sized distinct/join for the
    //      overlap — nothing data-sized after the scan. ----
    "split_embargo" -> ((s, d) => {
      val T = lit("2024-01-24 00:00:00").cast("timestamp")
      val gap = expr("INTERVAL 3 DAYS")
      val e = load(s, d, "events")
      val seg = when(col("ts") < T - gap, "train")
        .when(col("ts") < T, "embargo")
        .otherwise("test")
      val tagged = e.withColumn("seg", seg)
      val census = tagged.groupBy(col("seg")).agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      val overlap = tagged.filter(col("seg") === "train")
        .select(col("user_id")).distinct()
        .join(tagged.filter(col("seg") === "test")
          .select(col("user_id").as("u2")).distinct(),
          col("user_id") === col("u2"), "left_semi")
        .agg(lit("overlap_users").as("seg"), lit(0L).as("n_events"),
          count(lit(1)).as("n_users"))
      ordered(census.unionByName(overlap))
    }),

    // ---- ALN-1: cross-lingual candidate alignment (`bitext_mine`) — the
    //      candidate-generation stage of bitext/parallel-corpus mining
    //      (Resnik & Smith CL'03 lineage): cross-LANGUAGE document pairs
    //      anchored by shared RARE shingles (corpus df ≤ 5) — names,
    //      numbers, and code fragments that survive translation are
    //      exactly the low-df grams, so rarity is both the signal AND the
    //      scale lever: a df-capped posting list bounds the pair fan-out
    //      at Σ_g df_g² ≤ cap·Σdf_g (linear in postings), where an
    //      uncapped gram join is Zipf-quadratic. lang₁ < lang₂ keeps the
    //      join strictly cross-lingual and each pair once. Output =
    //      (pair, langs, shared-anchor count) ranked by anchor count —
    //      the recall set a dense scorer (SIM-1's machinery) would
    //      verify, same candidates→verify split as DDP-5/DCN-1. ----
    "bitext_mine" -> ((s, d) => {
      val doc = spread(load(s, d, "documents"))
      val p = doc.select(col("doc_id"), col("lang"),
          explode(shingles(col("text"))).as("g"))
        .pinned // feeds the df count and both sides of the anchor join
      val dfc = p.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val rare = p.join(dfc.filter(col("df") <= 5).select(col("g")), Seq("g"))
      val a = rare.select(col("g").as("ga"), col("doc_id").as("d1"),
        col("lang").as("l1"))
      val b = rare.select(col("g").as("gb"), col("doc_id").as("d2"),
        col("lang").as("l2"))
      ordered(a.join(b, col("ga") === col("gb") && col("l1") < col("l2"))
        .groupBy(col("d1"), col("d2"), col("l1"), col("l2"))
        .agg(count(lit(1)).as("n_shared")))
    }),

    // ---- MIX-2: largest-remainder quota allocation (`quota_alloc`) —
    //      MIX-1 plans proportions; this op turns them into INTEGER
    //      per-stratum sampling quotas that sum EXACTLY to the budget
    //      (B=1000 docs across languages), via the Hare largest-remainder
    //      method: floor shares B·nᵢ div N first, then the leftover seats
    //      go to the largest fractional remainders (B·nᵢ mod N, ties →
    //      smaller lang) — the standard apportionment fix for the
    //      floors-don't-sum-to-B problem that naive rounding hits (and
    //      rounding-up hits in the other direction). ALL-INTEGER: div /
    //      mod on int64, a rank over the |strata|-row relation, never a
    //      float share anywhere — bit-reproducible and Σquota = B by
    //      construction. Shape: one map-side-combined stratum count +
    //      1-row total attach + windows over the |strata| relation; at
    //      100 TB this is the manifest-sized tail of any mixture job. ----
    "quota_alloc" -> ((s, d) => {
      val B = 1000L
      val doc = load(s, d, "documents")
      val counts = doc.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("nn"))
      val based = counts.crossJoin(broadcast(total))
        .withColumn("base", call_function("div", lit(B) * col("n"), col("nn")))
        .withColumn("rem", lit(B) * col("n") - col("base") * col("nn"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val ranked = based
        .withColumn("leftover", lit(B) - sum(col("base")).over(wAll))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("lang").asc)))
      ordered(ranked.select(col("lang"), col("n").as("n_docs"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("quota")))
    }),

    // ---- MIX-3: temperature-scaled language sampling (`mix_temp`) — the
    //      mT5/XLM-R α-power mix (Xue et al. 2021, public): sample lang l
    //      with q_l ∝ p_l^α so low-resource languages are UPSAMPLED
    //      relative to their corpus share (α=1 is proportional, α→0 is
    //      uniform) — the third member of the mixing family: quota_alloc
    //      is proportional, mix_plan caps at the scarcest, this
    //      interpolates. α is pinned at 1/2 (T=2) DELIBERATELY: p^0.5 is
    //      ONE sqrt, and IEEE-754 requires sqrt correctly rounded, so
    //      both engines hold bit-identical temperature weights — p^0.3
    //      would ride each engine's libm pow, the §5.3 hazard the
    //      Benford/log-literal rules exist for. The |langs|-sized weight
    //      sum folds in LANG order (collect→sort→fold — lm_score's
    //      sorted-fold rule; a plain SUM of doubles is order-free only
    //      by luck). Integer token budget B=1,000,000 allocated by
    //      quota_alloc's largest-remainder: base = floor(B·q_l) (same
    //      doubles → same floor), remainders ranked (rem desc, lang asc)
    //      over the |langs|-row relation, Σ quota = B EXACTLY
    //      (conservation spec-pinned). 100 TB: everything after the
    //      map-side-combined per-lang token count is |langs|-row
    //      arithmetic. ----
    // ---- MIX-4: repetition / epoch planning (`mix_epochs`) — the
    //      data-constrained-scaling readout MIX-3 stops short of: give the
    //      temperature-scaled targets a BUDGET of 4× the corpus (token
    //      budgets routinely exceed unique data) and ask, per language,
    //      how many EPOCHS of its data the target implies (epochs =
    //      ⌈target/available⌉) and whether it crosses the ~4-epoch
    //      repetition wall (Muennighoff et al. 2023: beyond ~4 epochs
    //      repeated tokens stop buying loss) — the flag that tells a
    //      mixture designer which languages need MORE DATA, not more
    //      quota. Determinism: the √-weight sum reuses MIX-3's sorted
    //      collect-fold (4 doubles, fixed order), targets are
    //      floor-quantized longs, the epoch division is exact
    //      long-over-long in double. |langs|-sized relation throughout. ----
    "mix_epochs" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val inv = doc.groupBy(col("lang")).agg(
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .withColumn("w", sqrt(col("n_tokens").cast("double")))
      val denom = inv.agg(
        aggregate(array_sort(collect_list(struct(col("lang"), col("w")))),
          lit(0.0), (acc, x) => acc + x("w")).as("wsum"),
        sum(col("n_tokens")).as("all_tokens"))
      val t = inv.crossJoin(broadcast(denom))
        .withColumn("budget", lit(4L) * col("all_tokens"))
        .withColumn("target",
          floor(col("budget").cast("double") * col("w") / col("wsum")).cast("long"))
        .withColumn("epochs",
          ceil(col("target").cast("double") / col("n_tokens").cast("double")).cast("long"))
      ordered(t.select(col("lang"), col("n_tokens"), col("target"),
        col("epochs"), (col("epochs") > 4L).as("over_repeat")))
    }),

    "mix_temp" -> ((s, d) => {
      val B = 1000000L
      val doc = load(s, d, "documents")
      val inv = doc.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .withColumn("w", sqrt(col("n_tokens").cast("double")))
      val denom = inv.agg(
        aggregate(array_sort(collect_list(struct(col("lang"), col("w")))),
          lit(0.0), (acc, x) => acc + x("w")).as("wsum"),
        sum(col("n_tokens")).as("all_tokens"))
      val q = col("w") / col("wsum")
      val based = inv.crossJoin(broadcast(denom))
        .withColumn("q", q)
        .withColumn("base", floor(lit(B.toDouble) * col("q")).cast("long"))
        .withColumn("rem", lit(B.toDouble) * col("q") - col("base").cast("double"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val ranked = based
        .withColumn("leftover", lit(B) - sum(col("base")).over(wAll))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("lang").asc)))
      ordered(ranked.select(col("lang"), col("n_docs"), col("n_tokens"),
        dec4S(col("n_tokens").cast("double") / col("all_tokens").cast("double"))
          .as("share_raw"),
        dec4S(col("q")).as("share_temp"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("quota_tokens"),
        dec4S(col("q") * col("all_tokens").cast("double") /
          col("n_tokens").cast("double")).as("upsample_factor")))
    }),

    "mix_plan" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val inv = doc.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      val target = inv.agg(min(col("n_tokens")).as("target_tokens"),
        sum(col("n_tokens")).as("all_tokens"))
      ordered(inv.crossJoin(broadcast(target)).select(
        col("lang"), col("n_docs"), col("n_tokens"),
        dec4S(col("n_tokens").cast("double") / col("all_tokens").cast("double"))
          .as("share_actual"),
        col("target_tokens"),
        dec4S(col("target_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("keep_rate")))
    }),

    // ---- TXT-NORM: text normalization — the canonicalization pass that
    //      feeds every dedup/tokenize stage: lowercase, strip non-
    //      alphanumerics, collapse runs of spaces, trim. Pure per-row
    //      projection (codegen'd regexp), scan-bound, no shuffle; the
    //      md5 of the normalized text doubles as the canonical content
    //      key exact-dedup would group on. Regexes stay in the
    //      Java∩RE2 common subset so Spark and DuckDB rewrite
    //      identically. ----
    "txt_norm" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      ordered(doc.select(col("doc_id"), col("lang"),
        md5(norm).as("norm_md5"),
        length(norm).as("norm_chars"),
        regexp_count(norm, lit("[a-z0-9]+")).cast("int").as("norm_tokens")))
    }),

    // ---- TXT-PII: PII redaction — scrub emails and phone numbers before
    //      training. The corpus is synthetic, so each doc first gets a
    //      deterministic email + US-style phone APPENDED (derived from
    //      doc_id), proving the patterns actually fire on every row; the
    //      redaction then replaces them with typed placeholder tags.
    //      Counts come from the pre-redaction text, the md5 certifies the
    //      redacted output byte-for-byte. Per-row regexp projection —
    //      scan-bound, embarrassingly parallel, the 100 TB shape. The
    //      patterns avoid lookaround/backrefs (Java∩RE2 subset), and
    //      leftmost-greedy matching agrees across engines for these
    //      alternation-free patterns. ----
    "txt_pii" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phonePat = "\\d{3}-\\d{3}-\\d{4}"
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com ph "),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-555-"),
        lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"))
      val red = regexp_replace(
        regexp_replace(aug, emailPat, "<EMAIL>"), phonePat, "<PHONE>")
      ordered(doc.select(col("doc_id"), col("lang"),
        regexp_count(aug, lit(emailPat)).cast("int").as("n_email"),
        regexp_count(aug, lit(phonePat)).cast("int").as("n_phone"),
        md5(red).as("redacted_md5"),
        (length(aug) - length(red)).cast("int").as("chars_removed")))
    }),

    // ---- MASK-1: deterministic pseudonymization — TXT-PII's remediation
    //      sibling for the cases where dropping the VALUE breaks the
    //      data: the same PII string maps to the same stable token
    //      (<PII:md5-prefix>), so cross-document joins, frequency
    //      analysis, and dedup keep working on the masked corpus while
    //      the raw value never leaves the scan (tokenization, not
    //      redaction — the GDPR-pseudonymization pattern). Token-level
    //      transform (full-token anchored match → hash token), because
    //      regexp_replace cannot compute a per-match hash in either
    //      engine. The injected email appears TWICE per doc so the
    //      stability law (2 masked occurrences, 1 distinct pseudonym
    //      besides the phone) is data-visible, not just spec-asserted.
    //      Per-row HOF projection: scan-bound, zero shuffle, trivially
    //      parallel — the 100 TB shape; the lambda is the cost (no
    //      whole-stage codegen inside HOFs), ~µs/token like txt_langid's
    //      filters. Java∩RE2 anchored patterns, per txt_pii. ----
    "txt_mask" -> ((s, d) => {
      val doc = load(s, d, "documents")
      val emailPat = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
      val phonePat = "^\\d{3}-\\d{3}-\\d{4}$"
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com and again user"), col("doc_id").cast("string"),
        lit("@example.com ph "),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-555-"),
        lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"))
      val toks = split(aug, " ")
      def isPii(t: Column): Column = t.rlike(emailPat) || t.rlike(phonePat)
      val piiToks = filter(toks, t => isPii(t))
      val masked = transform(toks, t =>
        when(isPii(t), concat(lit("<PII:"), substring(md5(t), 1, 8), lit(">")))
          .otherwise(t))
      ordered(doc.select(col("doc_id"), col("lang"),
        size(piiToks).as("n_masked"),
        size(array_distinct(piiToks)).as("n_distinct_pii"),
        md5(array_join(masked, " ")).as("masked_md5")))
    }),

    // ---- TXT-LID2: character-trigram language ID — the textcat/CLD
    //      n-gram family, complementing txt_langid's stopword marker
    //      (which needs a per-language word list; trigram profiles are
    //      LEARNED from the corpus itself and work on languages with no
    //      curated stopwords). Profile = each language's top-20 trigrams
    //      by corpus frequency (ties by trigram — engine-stable);
    //      prediction = the language whose profile shares the most
    //      trigram TYPES with the doc (ties by language asc), 'und' when
    //      nothing overlaps. Everything is integer counting — no float
    //      scores to drift. Scale shape: the trigram explode is the
    //      corpus-sized cost (∝ total chars, the same order as reading
    //      the text), pinned once and read twice (profile build + doc
    //      scoring); profiles collapse to |langs|·20 rows → BROADCAST to
    //      the scoring join, so scoring shuffles only (doc, cand) count
    //      rows; argmax is a WindowGroupLimit top-1. At 100 TB the
    //      profile would be trained once on a sample and shipped as a
    //      literal — the scoring pass alone is scan-proportional. ----
    "txt_langid_ngram" -> ((s, d) => {
      // The doc table arrives as ONE split at bench SF (a single small
      // parquet file), which would run the ×300 trigram fan-out on one
      // core — repartition the SKINNY side before exploding (measured
      // 1.4 → 0.4 s on the explode stage; at 100 TB the scan has
      // thousands of splits and this reshuffle of doc-sized rows is
      // noise vs the explode it parallelizes).
      val d3 = load(s, d, "documents").filter(length(col("text")) >= 3)
        .repartition(s.sparkContext.defaultParallelism)
      // Explode POSITIONS (an int array), not a per-doc array of trigram
      // strings — the substr projection runs inside the same codegen stage
      // so the duplicated text column never reaches an exchange. One
      // map-side-combined aggregation to per-doc trigram counts serves
      // BOTH downstream reads (profile totals via sum, per-doc distinct
      // trigram types for free — the group keys ARE distinct): measured
      // 4.9 → 1.9 s vs the pin + groupBy + distinct double-pass.
      val tris = d3.select(col("doc_id"), col("lang"), col("text"),
          explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
        .select(col("doc_id"), col("lang"),
          col("text").substr(col("i"), lit(3)).as("tri"))
        .groupBy(col("doc_id"), col("lang"), col("tri"))
        .agg(count(lit(1)).as("c"))
        .pinned
      val prof = tris.groupBy(col("lang"), col("tri")).agg(sum(col("c")).as("n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("n").desc, col("tri").asc)))
        .filter(col("rn") <= 20)
        .select(col("lang").as("cand"), col("tri"))
      val best = tris.select(col("doc_id"), col("tri"))
        .join(broadcast(prof), Seq("tri"))
        .groupBy(col("doc_id"), col("cand")).agg(count(lit(1)).as("ov"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("ov").desc, col("cand").asc)))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("cand"), col("ov"))
      ordered(load(s, d, "documents").join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("cand"), lit("und")).as("pred_lang"),
          coalesce(col("ov"), lit(0L)).as("overlap"),
          when(coalesce(col("cand"), lit("und")) === col("lang"), 1)
            .otherwise(0).cast("int").as("hit")))
    })
  )

  /** ivf_pq's oracle — shared verbatim with `ivf_pq_stream` (the parity
    * contract: streamed store search ≡ batch index search). */
  private lazy val duckIvfPqSql: String =
    s"""WITH $duckIvfPqCtes
      |SELECT query_id, rn, neighbor_id,
      |  CAST(CAST(floor((adc_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS adc,
      |  CAST(CAST(floor((score_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS score
      |FROM pranked WHERE rn <= 3
      |ORDER BY query_id NULLS FIRST, rn NULLS FIRST, neighbor_id NULLS FIRST, adc NULLS FIRST, score NULLS FIRST""".stripMargin

  /** The sequential BPE-merge oracle — shared verbatim by `bpe_train`
    * and `bpe_train_batched` (the bpeMergesBatched equivalence guard says
    * the two trainers produce the IDENTICAL merge table): 6 unrolled
    * merge rounds — pair census over the |-encoded vocab, argmax with the
    * (n DESC, pair ASC) tie rule, plain-substring merge apply —
    * structurally identical to the Spark sequential loop. */
  private lazy val duckBpeTrainSql: String = {
    val rounds = (1 to 6).map { r =>
      s"""p$r AS (
         |  SELECT concat('|', p[1], '||', p[2], '|') AS pair,
         |    p[1] AS lft, p[2] AS rgt, SUM(cnt) AS n
         |  FROM (SELECT cnt, unnest(list_zip(a, a[2:])) AS p FROM (
         |    SELECT cnt, string_split(trim(enc, '|'), '||') AS a FROM w${r - 1}) t1) t2
         |  WHERE p[2] IS NOT NULL GROUP BY 1, 2, 3),
         |b$r AS (SELECT * FROM p$r ORDER BY n DESC, pair ASC LIMIT 1),
         |w$r AS (SELECT cnt, replace(enc, (SELECT pair FROM b$r),
         |  replace((SELECT pair FROM b$r), '||', '')) AS enc FROM w${r - 1})""".stripMargin
    }.mkString(",\n")
    val sel = (1 to 6).map(r =>
      s"SELECT $r AS round, lft AS left_sym, rgt AS right_sym, concat(lft, rgt) AS merged, CAST(n AS BIGINT) AS n FROM b$r")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH words AS (
       |  SELECT w AS word, COUNT(1) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
       |  WHERE w <> '' GROUP BY 1),
       |w0 AS (SELECT cnt, regexp_replace(word, '(.)', '|\\1|', 'g') AS enc FROM words),
       |$rounds
       |SELECT * FROM (
       |  $sel
       |)
       |ORDER BY round NULLS FIRST, left_sym NULLS FIRST, right_sym NULLS FIRST, merged NULLS FIRST, n NULLS FIRST""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "split_leakage" ->
      s"""WITH $duckMinhashCtes, spl AS (
        |  SELECT doc_id, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |        (acc, c) -> (acc * 31 + c) % 2147483647) % 100 AS b
        |    FROM documents)),
        |pv AS (SELECT v.d1, v.d2, a.split AS s1, b.split AS s2
        |  FROM verified v JOIN spl a ON v.d1 = a.doc_id JOIN spl b ON v.d2 = b.doc_id),
        |canon AS (SELECT LEAST(s1, s2) AS split_a, GREATEST(s1, s2) AS split_b, d1, d2 FROM pv),
        |e AS (SELECT split_a, split_b, COUNT(1) AS n_pairs FROM canon GROUP BY 1, 2),
        |dv AS (SELECT split_a, split_b, COUNT(DISTINCT doc) AS n_docs FROM (
        |  SELECT split_a, split_b, d1 AS doc FROM canon
        |  UNION ALL SELECT split_a, split_b, d2 FROM canon) GROUP BY 1, 2)
        |SELECT e.split_a, e.split_b, e.n_pairs, dv.n_docs
        |FROM e JOIN dv ON e.split_a = dv.split_a AND e.split_b = dv.split_b
        |ORDER BY e.split_a NULLS FIRST, e.split_b NULLS FIRST,
        |  n_pairs NULLS FIRST, n_docs NULLS FIRST""".stripMargin,

    "cooc_lift" ->
      """WITH dw AS (
        |  SELECT doc_id, w
        |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        |        FROM documents)
        |  WHERE w <> ''),
        |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dw),
        |wc AS (SELECT w, COUNT(1) AS c1 FROM dw GROUP BY 1),
        |pairs AS (
        |  SELECT a.w AS w1, b.w AS w2, COUNT(1) AS cab
        |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2
        |  HAVING COUNT(1) >= 20),
        |top AS (
        |  SELECT p.w1, p.w2, p.cab, ca.c1 AS ca, cb.c1 AS cb,
        |    CAST(floor((CAST(nd.n_docs * p.cab AS DOUBLE) /
        |      CAST(ca.c1 * cb.c1 AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS lift_d
        |  FROM pairs p JOIN wc ca ON p.w1 = ca.w JOIN wc cb ON p.w2 = cb.w
        |  CROSS JOIN nd
        |  ORDER BY lift_d DESC, w1 ASC, w2 ASC
        |  LIMIT 30)
        |SELECT w1, w2, cab, ca, cb, CAST(lift_d AS VARCHAR) AS lift
        |FROM top
        |ORDER BY w1 NULLS FIRST, w2 NULLS FIRST, cab NULLS FIRST,
        |  ca NULLS FIRST, cb NULLS FIRST, lift NULLS FIRST""".stripMargin,

    // Candidates (band buckets, pre-verify) from the shared minhash CTEs;
    // truth = the naive exact pair join the prefix-filtered Spark plan is
    // theorem-equal to; metrics are exact-integer ratios.
    "ddp_eval" ->
      s"""WITH sampled AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
        |${duckMinhashCtes.replace("FROM documents", "FROM sampled")}, truth AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        |  WHERE len(a.toks) >= 1 AND len(b.toks) >= 1 AND
        |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE) >= 0.95
        |), j AS (
        |  SELECT (t.d1 IS NOT NULL) AS is_true, (c.d1 IS NOT NULL) AS is_cand
        |  FROM truth t FULL OUTER JOIN cand c ON t.d1 = c.d1 AND t.d2 = c.d2
        |)
        |SELECT COUNT(CASE WHEN is_true THEN 1 END) AS n_true,
        |  COUNT(CASE WHEN is_cand THEN 1 END) AS n_cand,
        |  COUNT(CASE WHEN is_true AND is_cand THEN 1 END) AS n_hit,
        |  CAST(CAST(floor((CAST(COUNT(CASE WHEN is_true AND is_cand THEN 1 END) AS DOUBLE) /
        |    CAST(COUNT(CASE WHEN is_true THEN 1 END) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall,
        |  CAST(CAST(floor((CAST(COUNT(CASE WHEN is_true AND is_cand THEN 1 END) AS DOUBLE) /
        |    CAST(COUNT(CASE WHEN is_cand THEN 1 END) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS precision
        |FROM j
        |ORDER BY n_true NULLS FIRST, n_cand NULLS FIRST, n_hit NULLS FIRST,
        |  recall NULLS FIRST, precision NULLS FIRST""".stripMargin,

    // Long-form PQ: parallel unnests zip values with 1-based positions;
    // every element dec4-quantized before any arithmetic, distances as
    // exact DECIMAL sums, `//`/% ≡ Spark div/pmod on positives.
    "vec_pq" ->
      """WITH lf AS (
        |  SELECT vec_id, CAST(dim AS INT) AS dim, CAST(x AS DOUBLE) AS xd
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |          unnest(generate_series(1, len(embedding))) AS dim
        |        FROM embeddings)),
        |lq AS (SELECT vec_id,
        |    ((dim - 1) // 8) + 1 AS sp, ((dim - 1) % 8) + 1 AS p,
        |    CAST(floor(xd*10000+0.5)/10000 AS DECIMAL(18,4)) AS xq
        |  FROM lf),
        |cells AS (SELECT vec_id, sp,
        |    CAST(SUM(CASE WHEN xq > 0 AND p = 1 THEN 8 WHEN xq > 0 AND p = 2 THEN 4
        |      WHEN xq > 0 AND p = 3 THEN 2 WHEN xq > 0 AND p = 4 THEN 1
        |      ELSE 0 END) AS INT) AS cell
        |  FROM lq GROUP BY 1, 2),
        |cent AS (SELECT lq.sp, cells.cell, lq.p,
        |    CAST(floor((CAST(SUM(lq.xq) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(18,4)) AS c
        |  FROM lq JOIN cells ON lq.vec_id = cells.vec_id AND lq.sp = cells.sp
        |  GROUP BY 1, 2, 3),
        |cand AS (SELECT lq.vec_id, lq.sp, cent.cell,
        |    SUM((lq.xq - cent.c) * (lq.xq - cent.c)) AS dist
        |  FROM lq JOIN cent ON lq.sp = cent.sp AND lq.p = cent.p
        |  GROUP BY 1, 2, 3),
        |chosen AS (SELECT vec_id, sp, cell, dist FROM cand
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sp
        |    ORDER BY dist ASC, cell ASC) = 1),
        |err AS (SELECT vec_id, CAST(SUM(dist) AS DECIMAL(38,8)) AS errsq,
        |    array_to_string(list(CAST(cell AS VARCHAR) ORDER BY sp), '-') AS code
        |  FROM chosen GROUP BY 1),
        |tot AS (SELECT vec_id, CAST(SUM(xq * xq) AS DECIMAL(38,8)) AS totsq
        |  FROM lq GROUP BY 1)
        |SELECT e.vec_id, e.code,
        |  CAST(e.errsq AS VARCHAR) AS err_sq,
        |  CAST(CAST(floor((CAST(e.errsq AS DOUBLE)/CAST(t.totsq AS DOUBLE))*10000+0.5)/10000
        |    AS DECIMAL(38,4)) AS VARCHAR) AS err_rel
        |FROM err e JOIN tot t ON e.vec_id = t.vec_id
        |ORDER BY e.vec_id NULLS FIRST, e.code NULLS FIRST, err_sq NULLS FIRST, err_rel NULLS FIRST""".stripMargin,

    "txt_langid_ngram" ->
      """WITH d3 AS (SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3),
        |tri AS (SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS tri
        |  FROM d3, UNNEST(generate_series(1, length(text) - 2)) AS t(i)),
        |prof AS (SELECT lang AS cand, tri FROM (
        |    SELECT lang, tri, COUNT(1) AS n,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY COUNT(1) DESC, tri ASC) AS rn
        |    FROM tri GROUP BY lang, tri) WHERE rn <= 20),
        |dt AS (SELECT DISTINCT doc_id, tri FROM tri),
        |best AS (SELECT doc_id, cand, ov FROM (
        |    SELECT dt.doc_id, prof.cand, COUNT(1) AS ov
        |    FROM dt JOIN prof ON dt.tri = prof.tri GROUP BY 1, 2)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY ov DESC, cand ASC) = 1)
        |SELECT doc.doc_id, doc.lang,
        |  COALESCE(b.cand, 'und') AS pred_lang,
        |  COALESCE(b.ov, 0) AS overlap,
        |  CAST(CASE WHEN COALESCE(b.cand, 'und') = doc.lang THEN 1 ELSE 0 END AS INT) AS hit
        |FROM documents doc LEFT JOIN best b ON doc.doc_id = b.doc_id
        |ORDER BY doc.doc_id NULLS FIRST, doc.lang NULLS FIRST, pred_lang NULLS FIRST,
        |  overlap NULLS FIRST, hit NULLS FIRST""".stripMargin,

    "mm1" ->
      """SELECT doc_id, lang, label, n_chars,
        |  array_to_string(list_transform(embedding[1:2], x -> CAST(CAST(floor(CAST(x AS DOUBLE)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR)), ',') AS head2
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, label NULLS FIRST, n_chars NULLS FIRST""".stripMargin,

    "mm1_agg" ->
      """SELECT lang, label, COUNT(1) AS n_docs,
        |  CAST(CAST(floor((CAST(SUM(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_chars,
        |  CAST(CAST(SUM(CAST(floor((CAST(embedding[1] AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_dim1
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang, label
        |ORDER BY lang NULLS FIRST, label NULLS FIRST, n_docs NULLS FIRST, avg_chars NULLS FIRST, sum_dim1 NULLS FIRST""".stripMargin,

    "mm2_binary" ->
      """SELECT doc_id, lang,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  (octet_length(encode(text)) = length(text)) AS is_ascii
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, n_bytes NULLS FIRST, content_md5 NULLS FIRST, is_ascii NULLS FIRST""".stripMargin,

    // MM-3 twin: the decode STUB is pure byte arithmetic (width/height from
    // the byte length, mean from the byte sum — Multimodal.scala:37-45), so
    // it IS SQL-expressible. The corpus is verified pure-ASCII (octet_length
    // == length for every row at every SF), so the per-byte sum equals the
    // per-char ascii() sum; the CASE guards the n=0 division like the stub.
    "mm2_decode" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |    list_aggregate(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)), 'sum') AS byte_sum
        |  FROM documents)
        |SELECT doc_id, lang, n_bytes,
        |  CAST(16 + (n_bytes % 16) AS INT) AS width,
        |  CAST(16 + ((n_bytes // 16) % 16) AS INT) AS height,
        |  CAST(CAST(floor((CASE WHEN n_bytes = 0 THEN 0.0 ELSE CAST(byte_sum AS DOUBLE) / n_bytes END)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS mean_intensity
        |FROM f
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, n_bytes NULLS FIRST, width NULLS FIRST, height NULLS FIRST, mean_intensity NULLS FIRST""".stripMargin,

    // The stub's grid walk recomputed exactly: w=16+(n%16), h=16+((n//16)%16),
    // source index for output cell i (8x8 grid) is
    // (((i//8)*h//8)*w + ((i%8)*w//8)) % n, 1-based char at that byte.
    "mm_resize" ->
      """WITH f AS (
        |  SELECT doc_id, lang, text,
        |    CAST(octet_length(encode(text)) AS INT) AS n
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |g AS (
        |  SELECT doc_id, lang,
        |    16 + (n % 16) AS w, 16 + ((n // 16) % 16) AS h, n, text
        |  FROM f)
        |SELECT doc_id, lang,
        |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  md5(array_to_string(list_transform(range(0, 64), i ->
        |    substr(text, CAST(((((i // 8) * h // 8) * w + ((i % 8) * w // 8)) % n) + 1 AS INT), 1)), '')) AS resized_md5
        |FROM g
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, width NULLS FIRST, height NULLS FIRST, resized_md5 NULLS FIRST""".stripMargin,

    "mm_frames" ->
      """WITH f AS (
        |  SELECT doc_id, lang, text,
        |    CAST(octet_length(encode(text)) AS INT) AS n
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, lang, text,
        |    unnest(list_filter(range(0, CAST(ceil(CAST(n AS DOUBLE) / 64) AS BIGINT)),
        |      i -> i % 2 = 0)) AS frame_idx
        |  FROM f WHERE n > 0)
        |SELECT doc_id, lang, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(length(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS INT) AS n_bytes,
        |  md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM idx
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, frame_idx NULLS FIRST, n_bytes NULLS FIRST, frame_md5 NULLS FIRST""".stripMargin,

    "kmeans_iter" -> {
      val d4 = "CAST(floor((dist)*10000+0.5)/10000 AS DECIMAL(38,4))"
      val centCols = (1 to 64).map { i =>
        s"CAST(CAST(floor((CAST(SUM(CAST(floor((v[$i])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m$i"
      }.mkString(",\n    ")
      val mList = (1 to 64).map(i => s"m$i").mkString("[", ", ", "]")
      s"""WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS vv
        |  FROM embeddings),
        |seeds1 AS (SELECT CAST(vec_id AS INT) AS cid, v AS c, vv AS cc
        |  FROM base WHERE vec_id < 8),
        |p1 AS (
        |  SELECT b.vec_id, s.cid, b.v,
        |    b.vv + s.cc - 2.0 * list_sum(list_transform(list_zip(b.v, s.c), p -> p[1] * p[2])) AS dist
        |  FROM base b CROSS JOIN seeds1 s),
        |a1 AS (SELECT vec_id, cid, v, dist FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
        |  FROM p1) t WHERE rn = 1),
        |cent0 AS (
        |  SELECT cid,
        |    $centCols
        |  FROM a1 GROUP BY cid),
        |seeds2 AS (
        |  SELECT cid, $mList AS c,
        |    list_sum(list_transform($mList, x -> x * x)) AS cc
        |  FROM cent0),
        |p2 AS (
        |  SELECT b.vec_id, s.cid, b.v,
        |    b.vv + s.cc - 2.0 * list_sum(list_transform(list_zip(b.v, s.c), p -> p[1] * p[2])) AS dist
        |  FROM base b CROSS JOIN seeds2 s),
        |a2 AS (SELECT vec_id, cid, dist FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
        |  FROM p2) t WHERE rn = 1),
        |moved AS (
        |  SELECT CAST(SUM(CASE WHEN a1.cid <> a2.cid THEN 1 ELSE 0 END) AS BIGINT) AS nm
        |  FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id)
        |SELECT * FROM (
        |  SELECT 1 AS round,
        |    CAST(CAST(SUM($d4) AS DECIMAL(38,4)) AS VARCHAR) AS inertia,
        |    CAST(0 AS BIGINT) AS n_moved
        |  FROM a1
        |  UNION ALL
        |  SELECT 2,
        |    CAST(CAST(SUM($d4) AS DECIMAL(38,4)) AS VARCHAR),
        |    (SELECT nm FROM moved)
        |  FROM a2
        |) u
        |ORDER BY round NULLS FIRST, inertia NULLS FIRST, n_moved NULLS FIRST""".stripMargin
    },

    "kmeans_step" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS vv,
        |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS es
        |  FROM embeddings),
        |seeds AS (SELECT CAST(vec_id AS INT) AS cid, v AS c, vv AS cc
        |  FROM base WHERE vec_id < 8),
        |pairs AS (
        |  SELECT b.vec_id, s.cid, b.es,
        |    b.vv + s.cc - 2.0 * list_sum(list_transform(list_zip(b.v, s.c), p -> p[1] * p[2])) AS dist
        |  FROM base b CROSS JOIN seeds s),
        |asg AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
        |  FROM pairs)
        |SELECT cid, COUNT(1) AS n_vecs,
        |  CAST(CAST(SUM(CAST(floor((dist)*10000+0.5)/10000 AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS inertia,
        |  CAST(CAST(floor((CAST(SUM(CAST(floor((es)*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS centroid_mass
        |FROM asg WHERE rn = 1 GROUP BY cid
        |ORDER BY cid NULLS FIRST, n_vecs NULLS FIRST, inertia NULLS FIRST, centroid_mass NULLS FIRST""".stripMargin,

    "sim1" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) AS score_raw
        |  FROM base q JOIN base c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, score_raw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score_raw DESC, neighbor_id ASC) AS INT) AS rn
        |  FROM scored
        |)
        |SELECT query_id, rn, neighbor_id, CAST(CAST(floor((score_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS score
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id NULLS FIRST, rn NULLS FIRST, neighbor_id NULLS FIRST, score NULLS FIRST""".stripMargin,

    "sim1_ivf" ->
      s"""WITH $duckIvfCtes
        |SELECT query_id, rn, neighbor_id, CAST(CAST(floor((score_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS score
        |FROM ranked WHERE rn <= 3
        |ORDER BY query_id NULLS FIRST, rn NULLS FIRST, neighbor_id NULLS FIRST, score NULLS FIRST""".stripMargin,

    "ivf_pq" -> duckIvfPqSql,

    // The streamed-store search must return EXACTLY the batch index's
    // results — same oracle, same hash. A drift between STR-IVF's
    // maintained state and the batch encode shows up here as a hash
    // mismatch.
    "ivf_pq_stream" -> duckIvfPqSql,

    "ivf_pq_curve" -> {
      val perL = Seq(4, 8, 16).map { ln =>
        s"""SELECT $ln AS shortlist, COUNT(1) AS n_truth,
           |    CAST(COUNT(i.query_id) AS BIGINT) AS n_hits,
           |    CAST(CAST(floor((CAST(COUNT(i.query_id) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall
           |  FROM truth t LEFT JOIN (
           |    SELECT query_id, neighbor_id FROM (
           |      SELECT sh.query_id, cells.vec_id AS neighbor_id,
           |        ROW_NUMBER() OVER (PARTITION BY sh.query_id ORDER BY
           |          list_sum(list_transform(list_zip(pqv.qe, cells.e), x -> x[1] * x[2])) / (pqv.qn * cells.vn) DESC,
           |          cells.vec_id ASC) AS rn
           |      FROM (SELECT query_id, neighbor_id FROM ppool
           |            QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
           |              ORDER BY adc_raw DESC, neighbor_id ASC) <= $ln) sh
           |      JOIN pqv ON sh.query_id = pqv.query_id
           |      JOIN cells ON sh.neighbor_id = cells.vec_id) r WHERE rn <= 3) i
           |  ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH $duckIvfPqCtes, tbase AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), tt AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) DESC,
        |      c.vec_id ASC) AS INT) AS rn
        |  FROM tbase q JOIN tbase c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), truth AS (SELECT query_id, neighbor_id FROM tt WHERE rn <= 3)
        |SELECT * FROM (
        |  $perL
        |)
        |ORDER BY shortlist NULLS FIRST, n_truth NULLS FIRST, n_hits NULLS FIRST, recall NULLS FIRST""".stripMargin
    },

    "ivf_pq_res" ->
      s"""WITH $duckIvfPqResCtes
        |SELECT query_id, rn, neighbor_id,
        |  CAST(CAST(floor((adc_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS adc,
        |  CAST(CAST(floor((score_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS score
        |FROM rranked WHERE rn <= 3
        |ORDER BY query_id NULLS FIRST, rn NULLS FIRST, neighbor_id NULLS FIRST, adc NULLS FIRST, score NULLS FIRST""".stripMargin,

    "ivf_pq_res_eval" ->
      s"""WITH $duckIvfPqResCtes, pq AS (
        |  SELECT query_id, neighbor_id FROM rranked WHERE rn <= 3
        |), tbase AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), tt AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) DESC,
        |      c.vec_id ASC) AS INT) AS rn
        |  FROM tbase q JOIN tbase c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), truth AS (SELECT query_id, neighbor_id FROM tt WHERE rn <= 3)
        |SELECT t.query_id, CAST(COUNT(i.query_id) AS INT) AS n_hit,
        |  CAST(CAST(floor((CAST(COUNT(i.query_id) AS DOUBLE) / 3.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall
        |FROM truth t LEFT JOIN pq i
        |  ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id
        |GROUP BY t.query_id
        |ORDER BY t.query_id NULLS FIRST, n_hit NULLS FIRST, recall NULLS FIRST""".stripMargin,

    "ivf_sq" -> duckIvfSqSql,

    // Streamed SQ index must hash-match the batch SQ index: same oracle.
    "ivf_sq_stream" -> duckIvfSqSql,

    "ivf_sq_eval" ->
      s"""WITH $duckIvfSqCtes, sq3 AS (
        |  SELECT query_id, neighbor_id FROM sranked WHERE rn <= 3
        |), tbase AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), tt AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) DESC,
        |      c.vec_id ASC) AS INT) AS rn
        |  FROM tbase q JOIN tbase c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), truth AS (SELECT query_id, neighbor_id FROM tt WHERE rn <= 3)
        |SELECT t.query_id, CAST(COUNT(i.query_id) AS INT) AS n_hit,
        |  CAST(CAST(floor((CAST(COUNT(i.query_id) AS DOUBLE) / 3.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall
        |FROM truth t LEFT JOIN sq3 i
        |  ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id
        |GROUP BY t.query_id
        |ORDER BY t.query_id NULLS FIRST, n_hit NULLS FIRST, recall NULLS FIRST""".stripMargin,

    // Sample-/cap-train twins: the full-train eval oracles verbatim with
    // the training population restricted by the shared WHERE —
    // content-parity rate slice (see [[embSampleTrain]]/[[duckSampleWhere]])
    // or fixed-size content-hash top-K (see [[embCapTrain]]/[[duckCapWhere]]);
    // truth/encode/scan legs are unchanged full-corpus reads. The recall-
    // audit tail is one shared spelling ([[duckRecallAuditSql]]).
    "ivf_pq_sample_eval" ->
      duckRecallAuditSql(duckIvfPqCtesTrain(" " + duckSampleWhere), "pranked"),

    "ivf_sq_sample_eval" ->
      duckRecallAuditSql(duckIvfSqCtesTrain(" " + duckSampleWhere), "sranked"),

    "ivf_pq_cap_eval" ->
      duckRecallAuditSql(duckIvfPqCtesTrain(" " + duckCapWhere), "pranked"),

    "ivf_sq_cap_eval" ->
      duckRecallAuditSql(duckIvfSqCtesTrain(" " + duckCapWhere), "sranked"),

    // Gear twin: the boundary predicate uses the shift identity — low 4
    // bits of the rolling hash = (Σ_{j=0..3} 2^j·G(c_{i−j})) mod 16 with
    // missing leading terms 0 — so SQL computes it positionally from the
    // per-char G table (md5 of the decimal code point mod 256, 15 hex
    // chars — the engine's table derivation verbatim; only G mod 16
    // matters here, which also keeps the 2^j products tiny).
    "ddp_cdc_gear" ->
      s"""WITH cs AS (
        |  SELECT doc_id, lang, text, len(text) AS n FROM documents WHERE len(text) > 0
        |), gl AS (
        |  SELECT doc_id, lang, text, n,
        |    list_transform(string_split(text, ''), c ->
        |      CAST(concat('0x', substr(md5(CAST(ascii(c) % 256 AS VARCHAR)), 1, 15)) AS BIGINT) % 16) AS g
        |  FROM cs
        |), bnd AS (
        |  SELECT doc_id, lang, text, n,
        |    list_filter(range(1, n + 1), i -> i <> n AND (
        |      g[i]
        |      + (CASE WHEN i >= 2 THEN 2 * g[i - 1] ELSE 0 END)
        |      + (CASE WHEN i >= 3 THEN 4 * g[i - 2] ELSE 0 END)
        |      + (CASE WHEN i >= 4 THEN 8 * g[i - 3] ELSE 0 END)) % 16 = 0) AS bp
        |  FROM gl
        |), $duckCdcTail""".stripMargin,

    "ddp_cdc" ->
      s"""WITH cs AS (
        |  SELECT doc_id, lang, text, len(text) AS n FROM documents WHERE len(text) > 0
        |), bnd AS (
        |  SELECT doc_id, lang, text, n,
        |    CASE WHEN n >= 8 THEN list_filter(range(8, n + 1), i ->
        |      i <> n AND substr(md5(substr(text, CAST(i - 7 AS INT), 8)), 1, 1) = '0')
        |    ELSE [] END AS bp
        |  FROM cs
        |), $duckCdcTail""".stripMargin,

    // DuckDB twin of the 5-round sparse relational GD: identical feature
    // stream as dsir_select, per-bucket moments, and per round the same
    // K/z/p/residual/gradient/update chain with every cross-row sum a
    // dec8-quantized decimal fold and the sigmoid dec8-quantized at birth.
    // Calibration of the classifier's own probabilities: σ(z) dec8 at
    // birth (the training loop's sigmoid discipline), then
    // calibration_bins' 10-bin reliability block verbatim.
    "lr_calibration" ->
      s"""WITH $duckLrCtes, sc AS (
        |  SELECT CAST(CAST(floor((1.0/(1.0+exp(-z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM z6
        |), bnn AS (
        |  SELECT LEAST(CAST(floor(score * 10.0) AS INT), 9) AS bin, score, pos
        |  FROM sc
        |), agg AS (
        |  SELECT bin, COUNT(1) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(CAST(floor((score)*10000+0.5)/10000 AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ssc
        |  FROM bnn GROUP BY bin
        |), r AS (
        |  SELECT bin, n, n_pos,
        |    CAST(ssc AS DOUBLE) / CAST(n AS DOUBLE) AS conf,
        |    CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc
        |  FROM agg
        |), tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(CAST(CAST(floor((abs(acc - conf))*10000+0.5)/10000 AS DECIMAL(38,4)) * n AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS we
        |  FROM r
        |), e AS (
        |  SELECT CAST(CAST(floor((CAST(we AS DOUBLE) / CAST(nn AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS ece
        |  FROM tot
        |), spine AS (SELECT unnest(range(0, 10)) AS bin)
        |SELECT CAST(spine.bin AS INT) AS bin,
        |  COALESCE(r.n, 0) AS n, COALESCE(r.n_pos, 0) AS n_pos,
        |  CAST(CAST(floor((r.conf)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS conf,
        |  CAST(CAST(floor((r.acc)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS acc,
        |  e.ece
        |FROM spine LEFT JOIN r ON spine.bin = r.bin, e
        |ORDER BY bin NULLS FIRST, n NULLS FIRST, n_pos NULLS FIRST, conf NULLS FIRST, acc NULLS FIRST, ece NULLS FIRST""".stripMargin,

    // Temperature scaling twin: z6's logits on the held slice, 5 unrolled
    // Newton rounds on u = 1/T (p dec8 at birth, gradient/Hessian exact
    // decimal folds, u dec8 per round), then BOTH reliability blocks
    // (raw / scaled) through lr_calibration's binned pipeline per variant.
    "lr_temp" -> {
      val rounds = (1 to 5).map { i =>
        val pu = if (i == 1) "u0" else s"u${i - 1}"
        s"""tp$i AS MATERIALIZED (
          |  SELECT y, z, CAST(CAST(floor((1.0/(1.0+exp(-$pu.u*z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS p
          |  FROM held, $pu
          |), tg$i AS MATERIALIZED (
          |  SELECT CAST(SUM(CAST(floor(((p-y)*z)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS g,
          |    CAST(SUM(CAST(floor((p*(1.0-p)*z*z)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS h
          |  FROM tp$i
          |), u$i AS MATERIALIZED (
          |  SELECT CAST(CAST(floor(($pu.u - CAST(tg$i.g AS DOUBLE)/CAST(tg$i.h AS DOUBLE))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS u
          |  FROM $pu, tg$i
          |)""".stripMargin
      }.mkString(", ")
      s"""WITH $duckLrCtes, held AS MATERIALIZED (
        |  SELECT doc_id, z, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM z6 WHERE doc_id % 5 = 3
        |), u0 AS (SELECT 1.0 AS u),
        |$rounds,
        |tmp AS (SELECT CAST(CAST(floor((1.0/u)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS temp FROM u5),
        |scr AS (
        |  SELECT 'raw' AS variant,
        |    CAST(CAST(floor((1.0/(1.0+exp(-z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS score,
        |    CAST(y AS BIGINT) AS pos
        |  FROM held
        |  UNION ALL
        |  SELECT 'scaled' AS variant,
        |    CAST(CAST(floor((1.0/(1.0+exp(-u5.u*z)))*100000000+0.5)/100000000 AS DECIMAL(38,8)) AS DOUBLE) AS score,
        |    CAST(y AS BIGINT) AS pos
        |  FROM held, u5
        |), bnn AS (
        |  SELECT variant, LEAST(CAST(floor(score * 10.0) AS INT), 9) AS bin, score, pos FROM scr
        |), agg AS (
        |  SELECT variant, bin, COUNT(1) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(CAST(floor((score)*10000+0.5)/10000 AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ssc
        |  FROM bnn GROUP BY variant, bin
        |), r AS (
        |  SELECT variant, bin, n, n_pos,
        |    CAST(ssc AS DOUBLE) / CAST(n AS DOUBLE) AS conf,
        |    CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc
        |  FROM agg
        |), tot AS (
        |  SELECT variant, CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(CAST(CAST(floor((abs(acc - conf))*10000+0.5)/10000 AS DECIMAL(38,4)) * n AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS we
        |  FROM r GROUP BY variant
        |), e AS (
        |  SELECT variant, CAST(CAST(floor((CAST(we AS DOUBLE) / CAST(nn AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS ece
        |  FROM tot
        |), spine AS (
        |  SELECT v.variant, b.bin
        |  FROM (SELECT 'raw' AS variant UNION ALL SELECT 'scaled') v,
        |       (SELECT unnest(range(0, 10)) AS bin) b
        |)
        |SELECT * FROM (
        |  SELECT spine.variant, CAST(spine.bin AS INT) AS bin,
        |    COALESCE(r.n, 0) AS n, COALESCE(r.n_pos, 0) AS n_pos,
        |    CAST(CAST(floor((r.conf)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS conf,
        |    CAST(CAST(floor((r.acc)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS acc,
        |    e.ece, tmp.temp
        |  FROM spine LEFT JOIN r ON spine.variant = r.variant AND spine.bin = r.bin
        |    JOIN e ON spine.variant = e.variant, tmp
        |)
        |ORDER BY variant NULLS FIRST, bin NULLS FIRST, n NULLS FIRST, n_pos NULLS FIRST, conf NULLS FIRST, acc NULLS FIRST, ece NULLS FIRST, temp NULLS FIRST""".stripMargin
    },

    // Paired rank-sum AUC of the DSIR weight vs the classifier logit —
    // the same exact tie-average identity as auc_roc, both scores on the
    // dec4 double grid, dsir CTEs re-derived from the shared `feat`.
    "lr_eval" ->
      s"""WITH $duckLrCtes, dpb AS MATERIALIZED (
        |  SELECT b, COUNT(1) AS cs,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
        |  FROM feat GROUP BY b
        |), dtot AS MATERIALIZED (
        |  SELECT CAST(SUM(cs) AS BIGINT) AS stot, CAST(SUM(ct) AS BIGINT) AS ttot FROM dpb
        |), dratio AS MATERIALIZED (
        |  SELECT b, CAST(floor(ln((CAST(ct + 1 AS DOUBLE) * CAST(stot + 256 AS DOUBLE))
        |      / (CAST(cs + 1 AS DOUBLE) * CAST(ttot + 256 AS DOUBLE)))*100000000+0.5)/100000000
        |    AS DECIMAL(28,8)) AS lr
        |  FROM dpb, dtot
        |), dpd AS MATERIALIZED (
        |  SELECT doc_id, lang, b, COUNT(1) AS n FROM feat GROUP BY 1, 2, 3
        |), dwt AS MATERIALIZED (
        |  SELECT dpd.doc_id, dpd.lang,
        |    CAST(SUM(CAST(dpd.n AS DECIMAL(9,0)) * dratio.lr) AS DECIMAL(38,8)) AS w
        |  FROM dpd JOIN dratio ON dpd.b = dratio.b GROUP BY 1, 2
        |), dsx AS (
        |  SELECT floor(CAST(w AS DOUBLE)*10000+0.5)/10000 AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos FROM dwt
        |), lsx AS (
        |  SELECT floor((z)*10000+0.5)/10000 AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos FROM z6
        |), rkd AS (
        |  SELECT pos, RANK() OVER (ORDER BY score) AS r,
        |    COUNT(1) OVER (PARTITION BY score) AS ct FROM dsx
        |), oned AS (
        |  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
        |    CAST(SUM(CASE WHEN pos = 1 THEN 2 * r + ct - 1 ELSE 0 END) AS BIGINT) AS r2pos
        |  FROM rkd
        |), fd AS (
        |  SELECT 'dsir' AS model, n_pos, n_neg,
        |    CAST(r2pos - n_pos * (n_pos + 1) AS DOUBLE) AS u2,
        |    2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) AS den
        |  FROM oned
        |), rkl AS (
        |  SELECT pos, RANK() OVER (ORDER BY score) AS r,
        |    COUNT(1) OVER (PARTITION BY score) AS ct FROM lsx
        |), onel AS (
        |  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
        |    CAST(SUM(CASE WHEN pos = 1 THEN 2 * r + ct - 1 ELSE 0 END) AS BIGINT) AS r2pos
        |  FROM rkl
        |), fl AS (
        |  SELECT 'lr' AS model, n_pos, n_neg,
        |    CAST(r2pos - n_pos * (n_pos + 1) AS DOUBLE) AS u2,
        |    2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) AS den
        |  FROM onel
        |)
        |SELECT model, n_pos, n_neg,
        |  CAST(CAST(floor((u2 / NULLIF(den, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS auc
        |FROM (SELECT * FROM fd UNION ALL SELECT * FROM fl)
        |ORDER BY model NULLS FIRST, n_pos NULLS FIRST, n_neg NULLS FIRST, auc NULLS FIRST""".stripMargin,

    "quality_lr" ->
      s"""WITH $duckLrCtes
        |SELECT doc_id, lang,
        |  CAST(CAST(floor((z)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS score,
        |  CASE WHEN z > 0.0 THEN 1 ELSE 0 END AS pred
        |FROM z6
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, score NULLS FIRST, pred NULLS FIRST""".stripMargin,

    "dsir_select" ->
      """WITH wrds AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        |), feat AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(g), 1, 2)) AS BIGINT) AS b
        |  FROM (
        |    SELECT doc_id, lang, unnest(list_concat(
        |      list_filter(ws, w -> w <> ''),
        |      list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
        |    )) AS g
        |    FROM wrds)
        |), pb AS (
        |  SELECT b, COUNT(1) AS cs,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
        |  FROM feat GROUP BY b
        |), tot AS (
        |  SELECT CAST(SUM(cs) AS BIGINT) AS stot, CAST(SUM(ct) AS BIGINT) AS ttot FROM pb
        |), ratio AS (
        |  SELECT b, CAST(floor(ln((CAST(ct + 1 AS DOUBLE) * CAST(stot + 256 AS DOUBLE))
        |      / (CAST(cs + 1 AS DOUBLE) * CAST(ttot + 256 AS DOUBLE)))*100000000+0.5)/100000000
        |    AS DECIMAL(28,8)) AS lr
        |  FROM pb, tot
        |), pd AS (
        |  SELECT doc_id, lang, b, COUNT(1) AS n FROM feat GROUP BY 1, 2, 3
        |)
        |SELECT pd.doc_id, pd.lang, CAST(SUM(pd.n) AS BIGINT) AS n_feat,
        |  CAST(CAST(SUM(CAST(pd.n AS DECIMAL(9,0)) * ratio.lr) AS DECIMAL(38,8)) AS VARCHAR) AS weight,
        |  CASE WHEN SUM(CAST(pd.n AS DECIMAL(9,0)) * ratio.lr) > 0 THEN 1 ELSE 0 END AS selected
        |FROM pd JOIN ratio ON pd.b = ratio.b
        |GROUP BY pd.doc_id, pd.lang
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, n_feat NULLS FIRST, weight NULLS FIRST, selected NULLS FIRST""".stripMargin,

    "ivf_pq_eval" ->
      s"""WITH $duckIvfPqCtes, pq AS (
        |  SELECT query_id, neighbor_id FROM pranked WHERE rn <= 3
        |), tbase AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), tt AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) DESC,
        |      c.vec_id ASC) AS INT) AS rn
        |  FROM tbase q JOIN tbase c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), truth AS (SELECT query_id, neighbor_id FROM tt WHERE rn <= 3)
        |SELECT t.query_id, CAST(COUNT(i.query_id) AS INT) AS n_hit,
        |  CAST(CAST(floor((CAST(COUNT(i.query_id) AS DOUBLE) / 3.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall
        |FROM truth t LEFT JOIN pq i
        |  ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id
        |GROUP BY t.query_id
        |ORDER BY t.query_id NULLS FIRST, n_hit NULLS FIRST, recall NULLS FIRST""".stripMargin,

    "ivf_curve" -> {
      val perProbe = (1 to 3).map { p =>
        s"""SELECT $p AS nprobe, COUNT(1) AS n_truth,
           |    CAST(COUNT(i.query_id) AS BIGINT) AS n_hits,
           |    CAST(CAST(floor((CAST(COUNT(i.query_id) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall
           |  FROM truth t LEFT JOIN (
           |    SELECT query_id, neighbor_id FROM (
           |      SELECT query_id, neighbor_id,
           |        ROW_NUMBER() OVER (PARTITION BY query_id
           |          ORDER BY score_raw DESC, neighbor_id ASC) AS rn
           |      FROM pool WHERE probe_rank <= $p) s WHERE rn <= 3) i
           |  ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH $duckIvfBaseCtes, probes3 AS (
        |  SELECT vec_id AS query_id, e AS qe, vn AS qn, cell_label AS pcell,
        |    crn AS probe_rank
        |  FROM assigned WHERE vec_id < 10 AND crn <= 3
        |), pool AS (
        |  SELECT p.query_id, c.vec_id AS neighbor_id, p.probe_rank,
        |    list_sum(list_transform(list_zip(p.qe, c.e), x -> x[1] * x[2])) / (p.qn * c.vn) AS score_raw
        |  FROM probes3 p JOIN cells c ON p.pcell = c.cell AND p.query_id <> c.vec_id
        |), tbase AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), tt AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) DESC,
        |      c.vec_id ASC) AS INT) AS rn
        |  FROM tbase q JOIN tbase c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), truth AS (SELECT query_id, neighbor_id FROM tt WHERE rn <= 3)
        |SELECT * FROM (
        |  $perProbe
        |)
        |ORDER BY nprobe NULLS FIRST, n_truth NULLS FIRST, n_hits NULLS FIRST, recall NULLS FIRST""".stripMargin
    },

    "ivf_eval" ->
      s"""WITH $duckIvfCtes, ivf AS (
        |  SELECT query_id, neighbor_id FROM ranked WHERE rn <= 3
        |), tbase AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), tt AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) DESC,
        |      c.vec_id ASC) AS INT) AS rn
        |  FROM tbase q JOIN tbase c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), truth AS (SELECT query_id, neighbor_id FROM tt WHERE rn <= 3)
        |SELECT t.query_id, CAST(COUNT(i.query_id) AS INT) AS n_hit,
        |  CAST(CAST(floor((CAST(COUNT(i.query_id) AS DOUBLE) / 3.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall
        |FROM truth t LEFT JOIN ivf i
        |  ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id
        |GROUP BY t.query_id
        |ORDER BY t.query_id NULLS FIRST, n_hit NULLS FIRST, recall NULLS FIRST""".stripMargin,

    // One ranked CTE per truncation width (w=64 doubles as the truth),
    // per-query reciprocal ranks dec4-quantized pre-sum.
    "vec_mrl" -> {
      def ranked(w: Int) =
        s"""r$w AS (SELECT query_id, neighbor_id, rn FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |        list_sum(list_transform(list_zip(list_slice(q.e, 1, $w), list_slice(c.e, 1, $w)), p -> p[1] * p[2])) /
           |        (sqrt(list_sum(list_transform(list_slice(q.e, 1, $w), x -> x * x))) *
           |         sqrt(list_sum(list_transform(list_slice(c.e, 1, $w), x -> x * x)))) DESC,
           |        c.vec_id ASC) AS rn
           |    FROM base q JOIN base c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
           |  ) WHERE rn <= 3)""".stripMargin
      def widthRow(w: Int) =
        s"""SELECT $w AS width, CAST(SUM(nh) AS BIGINT) AS n_hits,
           |  CAST(CAST(floor((CAST(SUM(nh) AS DOUBLE) / 30.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall,
           |  CAST(CAST(floor((CAST(SUM(rr4) AS DOUBLE) / 10.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS mrr
           |FROM (
           |  SELECT a.query_id, COUNT(t.tn) AS nh,
           |    CAST(floor((COALESCE(CAST(1.0 AS DOUBLE) / MIN(CASE WHEN t.tn IS NOT NULL THEN a.rn END), 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS rr4
           |  FROM r$w a LEFT JOIN truth t
           |    ON a.query_id = t.tq AND a.neighbor_id = t.tn
           |  GROUP BY a.query_id)""".stripMargin
      s"""WITH base AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |${Seq(8, 16, 32, 64).map(ranked).mkString(",\n")},
         |truth AS (SELECT query_id AS tq, neighbor_id AS tn FROM r64)
         |${Seq(8, 16, 32, 64).map(widthRow).mkString("\nUNION ALL\n")}
         |ORDER BY width NULLS FIRST, n_hits NULLS FIRST, recall NULLS FIRST, mrr NULLS FIRST""".stripMargin
    },

    "vec_jl" -> {
      def ranked(w: Int) =
        s"""r$w AS (SELECT query_id, neighbor_id, rn FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |        list_sum(list_transform(list_zip(list_slice(q.p, 1, $w), list_slice(c.p, 1, $w)), x -> x[1] * x[2])) /
           |        (sqrt(list_sum(list_transform(list_slice(q.p, 1, $w), x -> x * x))) *
           |         sqrt(list_sum(list_transform(list_slice(c.p, 1, $w), x -> x * x)))) DESC,
           |        c.vec_id ASC) AS rn
           |    FROM proj q JOIN proj c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
           |  ) WHERE rn <= 3)""".stripMargin
      def widthRow(w: Int) =
        s"""SELECT $w AS width, CAST(SUM(nh) AS BIGINT) AS n_hits,
           |  CAST(CAST(floor((CAST(SUM(nh) AS DOUBLE) / 30.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall,
           |  CAST(CAST(floor((CAST(SUM(rr4) AS DOUBLE) / 10.0)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS mrr
           |FROM (
           |  SELECT a.query_id, COUNT(t.tn) AS nh,
           |    CAST(floor((COALESCE(CAST(1.0 AS DOUBLE) / MIN(CASE WHEN t.tn IS NOT NULL THEN a.rn END), 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS rr4
           |  FROM r$w a LEFT JOIN truth t
           |    ON a.query_id = t.tq AND a.neighbor_id = t.tn
           |  GROUP BY a.query_id)""".stripMargin
      s"""WITH xlf AS (
         |  SELECT vec_id, CAST(dim AS INT) AS dd,
         |    CAST(floor(CAST(x AS DOUBLE)*10000+0.5) AS BIGINT) AS xi
         |  FROM (SELECT vec_id, unnest(embedding) AS x,
         |          unnest(generate_series(1, len(embedding))) AS dim
         |        FROM embeddings)
         |), mat AS (
         |  SELECT j, dd, CASE WHEN substr(md5(CAST(j AS VARCHAR) || '_' || CAST(dd AS VARCHAR)), 1, 1)
         |      IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT unnest(range(1, 33)) AS j) a, (SELECT unnest(range(1, 65)) AS dd) b
         |), proj AS (
         |  SELECT vec_id, list(CAST(yj AS DOUBLE) ORDER BY j) AS p FROM (
         |    SELECT xlf.vec_id, mat.j, SUM(mat.sgn * xlf.xi) AS yj
         |    FROM xlf JOIN mat ON xlf.dd = mat.dd GROUP BY 1, 2)
         |  GROUP BY vec_id
         |), tbase AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings
         |), tt AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |      list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) DESC,
         |      c.vec_id ASC) AS INT) AS rn
         |  FROM tbase q JOIN tbase c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
         |), truth AS (SELECT query_id AS tq, neighbor_id AS tn FROM tt WHERE rn <= 3),
         |${Seq(8, 16, 32).map(ranked).mkString(",\n")}
         |${Seq(8, 16, 32).map(widthRow).mkString("\nUNION ALL\n")}
         |ORDER BY width NULLS FIRST, n_hits NULLS FIRST, recall NULLS FIRST, mrr NULLS FIRST""".stripMargin
    },

    // Brute truth + bucket-pruned approx, both ranked; DCG terms dec4-
    // quantized pre-sum (exact decimal fold) with literal log2 discounts.
    "ann_ndcg" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
        |    CAST((CASE WHEN embedding[1] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[2] > 0.0 THEN 2 ELSE 0 END) +
        |         (CASE WHEN embedding[3] > 0.0 THEN 1 ELSE 0 END) AS INT) AS bucket
        |  FROM embeddings),
        |ts AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) AS s
        |  FROM base q JOIN base c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |tr AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
        |    FROM ts) WHERE rn <= 3),
        |asq AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) AS s
        |  FROM base q JOIN base c
        |    ON q.vec_id < 10 AND q.bucket = c.bucket AND q.vec_id <> c.vec_id),
        |ar AS (SELECT query_id, neighbor_id, rn FROM (
        |    SELECT query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
        |    FROM asq) WHERE rn <= 3),
        |j AS (
        |  SELECT ar.query_id, ar.rn, tr.neighbor_id AS tn
        |  FROM ar LEFT JOIN tr
        |    ON ar.query_id = tr.query_id AND ar.neighbor_id = tr.neighbor_id),
        |perq AS (
        |  SELECT query_id, COUNT(1) AS nr, COUNT(tn) AS nh,
        |    MIN(CASE WHEN tn IS NOT NULL THEN rn END) AS frank,
        |    SUM(CAST(floor((CASE WHEN tn IS NOT NULL THEN
        |        CAST(CASE WHEN rn = 1 THEN 1.0 WHEN rn = 2 THEN 0.6309297535714574 ELSE 0.5 END AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END)*10000+0.5)/10000 AS DECIMAL(38,4))) AS dcg
        |  FROM j GROUP BY query_id),
        |spine AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10)
        |SELECT query_id,
        |  CAST(COALESCE(nr, 0) AS BIGINT) AS n_ret,
        |  CAST(COALESCE(nh, 0) AS BIGINT) AS n_hit,
        |  CAST(CAST(floor((COALESCE(CAST(nh AS DOUBLE) / 3.0, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS recall,
        |  CAST(CAST(floor((COALESCE(CAST(1.0 AS DOUBLE) / frank, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS mrr,
        |  CAST(CAST(floor((COALESCE(CAST(dcg AS DOUBLE) / 2.1309, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS ndcg
        |FROM spine LEFT JOIN perq USING (query_id)
        |ORDER BY query_id NULLS FIRST, n_ret NULLS FIRST, n_hit NULLS FIRST, recall NULLS FIRST, mrr NULLS FIRST, ndcg NULLS FIRST""".stripMargin,

    "sim1_lsh_multi" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
        |    CAST((CASE WHEN embedding[1] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[2] > 0.0 THEN 2 ELSE 0 END) +
        |         (CASE WHEN embedding[3] > 0.0 THEN 1 ELSE 0 END) AS INT) AS b1,
        |    CAST((CASE WHEN embedding[4] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[5] > 0.0 THEN 2 ELSE 0 END) +
        |         (CASE WHEN embedding[6] > 0.0 THEN 1 ELSE 0 END) AS INT) AS b2
        |  FROM embeddings
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) AS score_raw
        |  FROM base q JOIN base c
        |    ON q.vec_id < 10 AND (q.b1 = c.b1 OR q.b2 = c.b2) AND q.vec_id <> c.vec_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, score_raw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score_raw DESC, neighbor_id ASC) AS INT) AS rn
        |  FROM scored
        |)
        |SELECT query_id, rn, neighbor_id, CAST(CAST(floor((score_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS score
        |FROM ranked WHERE rn <= 3
        |ORDER BY query_id NULLS FIRST, rn NULLS FIRST, neighbor_id NULLS FIRST, score NULLS FIRST""".stripMargin,

    "sim1_lsh" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
        |    CAST((CASE WHEN embedding[1] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[2] > 0.0 THEN 2 ELSE 0 END) +
        |         (CASE WHEN embedding[3] > 0.0 THEN 1 ELSE 0 END) AS INT) AS bucket
        |  FROM embeddings
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])) / (q.nrm * c.nrm) AS score_raw
        |  FROM base q JOIN base c
        |    ON q.vec_id < 10 AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, score_raw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score_raw DESC, neighbor_id ASC) AS INT) AS rn
        |  FROM scored
        |)
        |SELECT query_id, rn, neighbor_id, CAST(CAST(floor((score_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS score
        |FROM ranked WHERE rn <= 3
        |ORDER BY query_id NULLS FIRST, rn NULLS FIRST, neighbor_id NULLS FIRST, score NULLS FIRST""".stripMargin,

    "sim2" ->
      s"""WITH t AS ($duckToks)
        |SELECT d1, d2, CAST(CAST(floor((jac)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS jac FROM (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS jac
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |    AND len(a.toks) * 20 >= len(b.toks) * 19 AND len(b.toks) * 20 >= len(a.toks) * 19
        |) WHERE jac >= 0.95
        |ORDER BY d1 NULLS FIRST, d2 NULLS FIRST, jac NULLS FIRST""".stripMargin,

    "ddp_norm_exact" ->
      """WITH feed AS (
        |  SELECT doc_id, text AS t2 FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, upper(text) AS t2
        |  FROM documents WHERE doc_id % 11 = 0),
        |n AS (
        |  SELECT doc_id, t2,
        |    trim(regexp_replace(regexp_replace(lower(t2), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM feed)
        |SELECT md5(nt) AS norm_md5,
        |  MIN(doc_id) AS keeper,
        |  COUNT(1) AS n_copies,
        |  CAST(COUNT(DISTINCT t2) AS BIGINT) AS n_raw_variants
        |FROM n GROUP BY 1
        |HAVING COUNT(1) >= 2
        |ORDER BY norm_md5 NULLS FIRST, keeper NULLS FIRST, n_copies NULLS FIRST, n_raw_variants NULLS FIRST""".stripMargin,

    "ddp_exact" ->
      """SELECT MIN(doc_id) AS keeper, COUNT(1) AS n_copies,
        |  CAST(length(text) AS INT) AS text_len
        |FROM documents
        |GROUP BY text
        |ORDER BY keeper NULLS FIRST, n_copies NULLS FIRST, text_len NULLS FIRST""".stripMargin,

    "ddp_minhash" -> duckMinhashSql,
    // The UDAF variant computes the identical signature; same oracle.
    "ddp_minhash_udaf" -> duckMinhashSql,

    // The incremental join generates exactly the banding-verified pairs
    // with >=1 batch-side doc: the twin restricts the full pair set.
    "ddp_incr" ->
      s"""WITH $duckMinhashCtes
        |SELECT d1, d2,
        |  CAST(CAST(floor((jac)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS jac,
        |  NOT (d1 % 10 = 7 AND d2 % 10 = 7) AS vs_corpus
        |FROM verified
        |WHERE d1 % 10 = 7 OR d2 % 10 = 7
        |ORDER BY d1 NULLS FIRST, d2 NULLS FIRST, jac NULLS FIRST, vs_corpus NULLS FIRST""".stripMargin,

    // Per-new-doc top-1 reduction of the same restricted pair set: both
    // orientations of each batch-touching pair, then row_number over
    // (jac DESC, match_id ASC) — identical tie discipline to the Spark
    // window, on the identically-computed double jac.
    "ddp_incr_best" ->
      s"""WITH $duckMinhashCtes, oriented AS (
        |  SELECT d1 AS doc_id, d2 AS match_id, jac FROM verified WHERE d1 % 10 = 7
        |  UNION ALL
        |  SELECT d2 AS doc_id, d1 AS match_id, jac FROM verified WHERE d2 % 10 = 7
        |), ranked AS (
        |  SELECT doc_id, match_id, jac,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY jac DESC, match_id ASC) AS rn
        |  FROM oriented
        |)
        |SELECT doc_id, match_id,
        |  CAST(CAST(floor((jac)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS jac,
        |  NOT (match_id % 10 = 7) AS vs_corpus
        |FROM ranked WHERE rn = 1
        |ORDER BY doc_id NULLS FIRST, match_id NULLS FIRST, jac NULLS FIRST, vs_corpus NULLS FIRST""".stripMargin,
    "ddp_cluster" -> duckClusterSql,
    "ddp_keeper_src" ->
      s"""WITH RECURSIVE $duckClusterCtes, withsrc AS (
        |  SELECT c.doc_id, d.source, c.cluster_id
        |  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id),
        |keepers AS (
        |  SELECT cluster_id AS kc, doc_id AS keeper_doc, source AS keeper_src
        |  FROM withsrc
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster_id
        |    ORDER BY source ASC, doc_id ASC) = 1)
        |SELECT w.doc_id, w.source, w.cluster_id, k.keeper_doc, k.keeper_src,
        |  (w.doc_id = k.keeper_doc) AS is_keeper
        |FROM withsrc w JOIN keepers k ON w.cluster_id = k.kc
        |ORDER BY w.doc_id NULLS FIRST, w.source NULLS FIRST, w.cluster_id NULLS FIRST,
        |  k.keeper_doc NULLS FIRST, k.keeper_src NULLS FIRST, is_keeper NULLS FIRST""".stripMargin,
    "pipeline_clean" -> duckPipelineSql,

    // The composed stages reuse their certified twins verbatim: txt_norm's
    // canonical key, DDP-1's keeper election, dcn1's containment, SPL-1's
    // LCG split — in the declared order.
    "pipeline_corpus" ->
      s"""WITH keyed AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS k
        |  FROM documents),
        |reps AS (SELECT k, MIN(doc_id) AS rep FROM keyed GROUP BY k),
        |corpus AS (
        |  SELECT keyed.doc_id AS doc_id, lang, text, n_chars, rep
        |  FROM keyed JOIN reps USING (k)
        |  WHERE keyed.doc_id = reps.rep AND keyed.doc_id % 100 <> 0),
        |bpost AS (
        |  SELECT doc_id AS bench_id, len($duckGrams) AS nb, unnest($duckGrams) AS tok
        |  FROM documents WHERE doc_id % 100 = 0),
        |cpost AS (
        |  SELECT doc_id, unnest($duckGrams) AS tok FROM corpus),
        |flag AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT c.doc_id, b.bench_id, b.nb, COUNT(1) AS ni
        |    FROM cpost c JOIN bpost b USING (tok) GROUP BY 1, 2, 3)
        |  WHERE CAST(ni AS DOUBLE) / CAST(nb AS DOUBLE) >= 0.2),
        |clean AS (
        |  SELECT * FROM corpus
        |  WHERE doc_id NOT IN (SELECT doc_id FROM flag)
        |    AND len(string_split(text, ' ')) >= 20),
        |bkt AS (
        |  SELECT *, ((rep % 2147483647) * 2654435761 + 123456789) % 1000 AS bucket
        |  FROM clean)
        |SELECT CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val'
        |  ELSE 'test' END AS split, lang,
        |  CAST(COUNT(1) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(CAST(floor((CAST(SUM(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE) / COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_chars
        |FROM bkt GROUP BY 1, 2
        |ORDER BY split NULLS FIRST, lang NULLS FIRST, n_docs NULLS FIRST, n_tokens NULLS FIRST, avg_chars NULLS FIRST""".stripMargin,

    "ddp_simhash" -> {
      val bitSums = (0 until 62).map { j =>
        val src = if (j < 31) s"(h // ${1L << j})" else s"(h2 // ${1L << (j - 31)})"
        s"SUM(CASE WHEN $src % 2 = 1 THEN 1 ELSE -1 END) AS b$j"
      }.mkString(",\n        |    ")
      val compose = (0 until 62).map { j =>
        s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH h AS (
        |  $duckTokHash
        |), hh AS (
        |  SELECT doc_id, lang, h, (${As.head} * h + ${Bs.head}) % 2147483647 AS h2 FROM h
        |), bits AS (
        |  SELECT doc_id, lang,
        |    $bitSums
        |  FROM hh GROUP BY doc_id, lang
        |), sig AS (
        |  SELECT doc_id, lang, CAST($compose AS BIGINT) AS simhash FROM bits
        |)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM sig a JOIN sig b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        |ORDER BY d1 NULLS FIRST, d2 NULLS FIRST, hamming NULLS FIRST""".stripMargin
    },

    "ddp_ngram" ->
      """WITH t AS (
        |  SELECT doc_id, lang, list_distinct(list_transform(
        |    range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS grams
        |  FROM documents
        |)
        |SELECT d1, d2, CAST(CAST(floor((jac)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS jac FROM (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |    CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS jac
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |    AND len(a.grams) * 2 >= len(b.grams) AND len(b.grams) * 2 >= len(a.grams)
        |) WHERE jac >= 0.5
        |ORDER BY d1 NULLS FIRST, d2 NULLS FIRST, jac NULLS FIRST""".stripMargin,

    "ddp_winnow" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws,
        |    len(string_split(text, ' ')) - 2 AS ng
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |g AS (
        |  SELECT doc_id, lang, ng, i - 1 AS p,
        |    md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
        |  FROM t, UNNEST(generate_series(1, ng)) AS r(i)),
        |m AS (
        |  SELECT doc_id, lang, ng, p,
        |    MIN(h) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
        |  FROM g),
        |fps AS (
        |  SELECT DISTINCT doc_id, lang, wmin FROM m WHERE p >= 3 OR p = ng - 1),
        |f2 AS (
        |  SELECT doc_id, lang, wmin,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS nf FROM fps),
        |pr AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    a.nf AS f1, b.nf AS f2, COUNT(*) AS ni
        |  FROM f2 a JOIN f2 b ON a.wmin = b.wmin AND a.lang = b.lang
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT d1, d2, ni AS n_shared,
        |  CAST(CAST(floor((jac)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS jac
        |FROM (SELECT d1, d2, ni,
        |        CAST(ni AS DOUBLE) / CAST(f1 + f2 - ni AS DOUBLE) AS jac FROM pr)
        |WHERE jac >= 0.35
        |ORDER BY d1 NULLS FIRST, d2 NULLS FIRST, n_shared NULLS FIRST, jac NULLS FIRST""".stripMargin,

    "ddp_embed" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
        |    CAST((CASE WHEN embedding[1] > 0.0 THEN 8 ELSE 0 END) +
        |         (CASE WHEN embedding[2] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[3] > 0.0 THEN 2 ELSE 0 END) +
        |         (CASE WHEN embedding[4] > 0.0 THEN 1 ELSE 0 END) AS INT) AS bucket
        |  FROM embeddings
        |)
        |SELECT v1, v2, CAST(CAST(floor((cos)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS cos FROM (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2,
        |    list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS cos
        |  FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |) WHERE cos >= 0.4
        |ORDER BY v1 NULLS FIRST, v2 NULLS FIRST, cos NULLS FIRST""".stripMargin,

    // kmeans_step's exact-argmin assignment CTEs, then cluster-local
    // v1 < v2 cosine pairs and the lowest-id-wins dup census.
    "ddp_semantic" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS vv
        |  FROM embeddings),
        |b2 AS (SELECT vec_id, v, vv, sqrt(vv) AS nrm FROM base),
        |seeds AS (SELECT CAST(vec_id AS INT) AS cid, v AS c, vv AS cc
        |  FROM b2 WHERE vec_id < 8),
        |pairs AS (
        |  SELECT b.vec_id, s.cid, b.v, b.nrm,
        |    b.vv + s.cc - 2.0 * list_sum(list_transform(list_zip(b.v, s.c), p -> p[1] * p[2])) AS dist
        |  FROM b2 b CROSS JOIN seeds s),
        |asg AS (
        |  SELECT vec_id, cid, v, nrm,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
        |  FROM pairs),
        |a AS (SELECT vec_id, cid, v, nrm FROM asg WHERE rn = 1),
        |cand AS (
        |  SELECT y.vec_id AS v2,
        |    list_sum(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2])) / (x.nrm * y.nrm) AS cos
        |  FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id),
        |dups AS (
        |  SELECT v2, COUNT(1) AS nl, MAX(cos) AS best
        |  FROM cand WHERE cos >= 0.4 GROUP BY v2)
        |SELECT t.vec_id, t.cid,
        |  d.v2 IS NOT NULL AS is_dup,
        |  CAST(COALESCE(d.nl, 0) AS BIGINT) AS n_lower_nbrs,
        |  CAST(CAST(floor((d.best)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS best_cos
        |FROM a t LEFT JOIN dups d ON t.vec_id = d.v2
        |ORDER BY vec_id NULLS FIRST, cid NULLS FIRST, is_dup NULLS FIRST, n_lower_nbrs NULLS FIRST, best_cos NULLS FIRST""".stripMargin,

    // The oracle may spell the 4-table union as one OR join — its cost is
    // irrelevant; only the declared pair set must match the engine's.
    "ddp_embed_multi" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
        |    CAST((CASE WHEN embedding[1] > 0.0 THEN 8 ELSE 0 END) + (CASE WHEN embedding[2] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[3] > 0.0 THEN 2 ELSE 0 END) + (CASE WHEN embedding[4] > 0.0 THEN 1 ELSE 0 END) AS INT) AS b0,
        |    CAST((CASE WHEN embedding[5] > 0.0 THEN 8 ELSE 0 END) + (CASE WHEN embedding[6] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[7] > 0.0 THEN 2 ELSE 0 END) + (CASE WHEN embedding[8] > 0.0 THEN 1 ELSE 0 END) AS INT) AS b1,
        |    CAST((CASE WHEN embedding[9] > 0.0 THEN 8 ELSE 0 END) + (CASE WHEN embedding[10] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[11] > 0.0 THEN 2 ELSE 0 END) + (CASE WHEN embedding[12] > 0.0 THEN 1 ELSE 0 END) AS INT) AS b2,
        |    CAST((CASE WHEN embedding[13] > 0.0 THEN 8 ELSE 0 END) + (CASE WHEN embedding[14] > 0.0 THEN 4 ELSE 0 END) +
        |         (CASE WHEN embedding[15] > 0.0 THEN 2 ELSE 0 END) + (CASE WHEN embedding[16] > 0.0 THEN 1 ELSE 0 END) AS INT) AS b3
        |  FROM embeddings
        |)
        |SELECT v1, v2, CAST(CAST(floor((cos)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS cos FROM (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2,
        |    list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS cos
        |  FROM base a JOIN base b ON a.vec_id < b.vec_id
        |    AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
        |) WHERE cos >= 0.4
        |ORDER BY v1 NULLS FIRST, v2 NULLS FIRST, cos NULLS FIRST""".stripMargin,

    "smp2" ->
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) AS th
        |  FROM documents
        |), r AS (
        |  SELECT lang, doc_id, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY th ASC, doc_id ASC) AS INT) AS rn
        |  FROM h
        |)
        |SELECT lang, rn, doc_id, n_chars FROM r WHERE rn <= 10
        |ORDER BY lang NULLS FIRST, rn NULLS FIRST, doc_id NULLS FIRST, n_chars NULLS FIRST""".stripMargin,

    "dcn1" ->
      s"""WITH sh AS (
        |  SELECT doc_id, $duckGrams AS sh FROM documents
        |), bpost AS (
        |  SELECT doc_id AS bench_id, len(sh) AS nb, unnest(sh) AS tok
        |  FROM sh WHERE doc_id % 100 = 0
        |), cpost AS (
        |  SELECT doc_id, unnest(sh) AS tok FROM sh WHERE doc_id % 100 <> 0
        |), ov AS (
        |  SELECT doc_id, bench_id, nb, count(*) AS ni
        |  FROM cpost JOIN bpost USING (tok)
        |  GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, bench_id,
        |  CAST(CAST(floor((CAST(ni AS DOUBLE)/CAST(nb AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS containment
        |FROM ov WHERE CAST(ni AS DOUBLE)/CAST(nb AS DOUBLE) >= 0.2
        |ORDER BY doc_id NULLS FIRST, bench_id NULLS FIRST, containment NULLS FIRST""".stripMargin,

    // Identical to dcn1's twin BY DESIGN: the Bloom prefilter has no false
    // negatives and the exact join removes its false positives, so the
    // declared output is the unfiltered join's (same certification pattern
    // as join2_salted / agg1_salted: twin certifies result-identity, the
    // engine-side shape is the scale lever).
    "dcn_bloom" ->
      s"""WITH sh AS (
        |  SELECT doc_id, $duckGrams AS sh FROM documents
        |), bpost AS (
        |  SELECT doc_id AS bench_id, len(sh) AS nb, unnest(sh) AS tok
        |  FROM sh WHERE doc_id % 100 = 0
        |), cpost AS (
        |  SELECT doc_id, unnest(sh) AS tok FROM sh WHERE doc_id % 100 <> 0
        |), ov AS (
        |  SELECT doc_id, bench_id, nb, count(*) AS ni
        |  FROM cpost JOIN bpost USING (tok)
        |  GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, bench_id,
        |  CAST(CAST(floor((CAST(ni AS DOUBLE)/CAST(nb AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS containment
        |FROM ov WHERE CAST(ni AS DOUBLE)/CAST(nb AS DOUBLE) >= 0.2
        |ORDER BY doc_id NULLS FIRST, bench_id NULLS FIRST, containment NULLS FIRST""".stripMargin,

    "ddp_segment" ->
      """WITH segs AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(0, CAST(floor(len(string_split(text, ' '))/8) AS INT)),
        |      i -> array_to_string(list_slice(string_split(text, ' '), i*8+1, i*8+8), ' ')))) AS seg
        |  FROM documents
        |), sc AS (
        |  SELECT seg, COUNT(1) AS ndocs FROM segs GROUP BY 1
        |), agg AS (
        |  SELECT s.doc_id, COUNT(1) AS n_segs,
        |    CAST(SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |  FROM segs s JOIN sc c USING (seg)
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_segs, n_dup,
        |  CAST(CAST(floor((CAST(n_dup AS DOUBLE)/CAST(n_segs AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS dup_ratio
        |FROM agg
        |ORDER BY doc_id NULLS FIRST, n_segs NULLS FIRST, n_dup NULLS FIRST, dup_ratio NULLS FIRST""".stripMargin,

    "txt_intradedup" ->
      """WITH feed AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 AND len(string_split(text, ' ')) >= 8
        |      THEN concat(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '), ' ', text)
        |      ELSE text END AS t2
        |  FROM documents),
        |segged AS (
        |  SELECT doc_id,
        |    list_transform(range(0, CAST(ceil(len(string_split(t2, ' ')) / 8.0) AS INT)),
        |      i -> array_to_string(list_slice(string_split(t2, ' '), i*8 + 1, i*8 + 8), ' ')) AS segs
        |  FROM feed),
        |kept AS (
        |  SELECT doc_id, segs,
        |    list_filter(segs, (x, i) -> list_position(segs, x) = i) AS k
        |  FROM segged)
        |SELECT doc_id, CAST(len(segs) AS INT) AS n_segs,
        |  CAST(len(k) AS INT) AS n_kept,
        |  md5(array_to_string(k, ' ')) AS dedup_md5
        |FROM kept
        |ORDER BY doc_id NULLS FIRST, n_segs NULLS FIRST, n_kept NULLS FIRST, dedup_md5 NULLS FIRST""".stripMargin,

    "scrub_segments" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT) AS ns
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, ns, CAST(unnest(range(0, ns)) AS INT) AS pos, w FROM t),
        |s2 AS (
        |  SELECT doc_id, ns, pos,
        |    array_to_string(list_slice(w, pos*8 + 1, pos*8 + 8), ' ') AS seg
        |  FROM p),
        |df AS (
        |  SELECT seg, COUNT(DISTINCT doc_id) AS ndocs FROM s2 GROUP BY 1),
        |kept AS (
        |  SELECT s2.doc_id, s2.ns, s2.pos, s2.seg
        |  FROM s2 JOIN df USING (seg) WHERE df.ndocs < 2)
        |SELECT doc_id, CAST(MAX(ns) AS INT) AS n_segs, COUNT(1) AS n_kept,
        |  md5(string_agg(seg, ' ' ORDER BY pos)) AS scrub_md5
        |FROM kept GROUP BY doc_id
        |ORDER BY doc_id NULLS FIRST, n_segs NULLS FIRST, n_kept NULLS FIRST, scrub_md5 NULLS FIRST""".stripMargin,

    "smp1" ->
      """WITH h AS (
        |  SELECT lang, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  lang, COUNT(1) AS n_docs,
        |  CAST(CAST(floor((CAST(SUM(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_chars
        |FROM h GROUP BY 1, 2
        |ORDER BY split NULLS FIRST, lang NULLS FIRST, n_docs NULLS FIRST, avg_chars NULLS FIRST""".stripMargin,

    "txt1" ->
      """SELECT lang, COUNT(1) AS n_docs,
        |  CAST(CAST(floor((CAST(SUM(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(CAST(floor((CAST(SUM(CAST(len(list_distinct(string_split(text, ' '))) AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_distinct_toks
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST, n_docs NULLS FIRST, avg_chars NULLS FIRST, total_tokens NULLS FIRST, avg_distinct_toks NULLS FIRST""".stripMargin,

    "txt_topwords" ->
      """SELECT lang, rn, word, n FROM (
        |  SELECT lang, word, n,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS INT) AS rn
        |  FROM (
        |    SELECT lang, word, COUNT(1) AS n
        |    FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
        |    GROUP BY 1, 2
        |  )
        |) WHERE rn <= 5
        |ORDER BY lang NULLS FIRST, rn NULLS FIRST, word NULLS FIRST, n NULLS FIRST""".stripMargin,

    "txt_zipf" ->
      """WITH counts AS (
        |  SELECT word, COUNT(1) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY 1
        |), stats AS (
        |  SELECT CAST(COUNT(1) AS BIGINT) AS vocab, CAST(SUM(n) AS BIGINT) AS total FROM counts
        |), top AS (
        |  SELECT word, n FROM counts ORDER BY n DESC, word ASC LIMIT 500
        |), pts AS (
        |  SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word ASC) AS DOUBLE)) AS x,
        |    ln(CAST(n AS DOUBLE)) AS y
        |  FROM top
        |), mo AS (
        |  SELECT CAST(COUNT(1) AS BIGINT) AS k,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |  FROM pts
        |), f AS (
        |  SELECT k, sx, sy,
        |    CAST(k AS DOUBLE) * sxy - sx * sy AS sxyv,
        |    CAST(k AS DOUBLE) * sxx - sx * sx AS sxxv,
        |    CAST(k AS DOUBLE) * syy - sy * sy AS syyv
        |  FROM mo
        |), g AS (
        |  SELECT k, sx, sy, sxyv, sxxv, syyv,
        |    sxyv / NULLIF(sxxv, 0.0) AS slope
        |  FROM f
        |)
        |SELECT vocab, total, k,
        |  CAST(CAST(floor((slope)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS slope,
        |  CAST(CAST(floor(((sy - slope * sx) / CAST(k AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS intercept,
        |  CAST(CAST(floor((sxyv * sxyv / NULLIF(sxxv * syyv, 0.0))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS r2
        |FROM g CROSS JOIN stats
        |ORDER BY vocab NULLS FIRST, total NULLS FIRST, k NULLS FIRST, slope NULLS FIRST, intercept NULLS FIRST, r2 NULLS FIRST""".stripMargin,

    "bpe_apply" -> {
      val rounds = (1 to 6).map { r =>
        s"""p$r AS (
           |  SELECT concat('|', p[1], '||', p[2], '|') AS pair,
           |    p[1] AS lft, p[2] AS rgt, SUM(cnt) AS n
           |  FROM (SELECT cnt, unnest(list_zip(a, a[2:])) AS p FROM (
           |    SELECT cnt, string_split(trim(enc, '|'), '||') AS a FROM w${r - 1}) t1) t2
           |  WHERE p[2] IS NOT NULL GROUP BY 1, 2, 3),
           |b$r AS (SELECT * FROM p$r ORDER BY n DESC, pair ASC LIMIT 1),
           |w$r AS (SELECT cnt, replace(enc, (SELECT pair FROM b$r),
           |  replace((SELECT pair FROM b$r), '||', '')) AS enc FROM w${r - 1})""".stripMargin
      }.mkString(",\n")
      // chained priority-order apply over the |-encoded corpus
      val applied = (1 to 6).foldLeft("enc0") { (e, r) =>
        s"replace($e, (SELECT pair FROM b$r), (SELECT replace(pair, '||', '') FROM b$r))"
      }
      def nsym(e: String) =
        s"CAST((len($e) - len(replace($e, '|', ''))) / 2 AS BIGINT)"
      s"""WITH words AS (
         |  SELECT w AS word, COUNT(1) AS cnt FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
         |  WHERE w <> '' GROUP BY 1),
         |w0 AS (SELECT cnt, regexp_replace(word, '(.)', '|\\1|', 'g') AS enc FROM words),
         |$rounds,
         |corpus AS (
         |  SELECT lang, regexp_replace(text, '([^ ])', '|\\1|', 'g') AS enc0
         |  FROM documents),
         |sym AS (
         |  SELECT lang, ${nsym("enc0")} AS nb, ${nsym(applied)} AS na FROM corpus)
         |SELECT lang, COUNT(1) AS n_docs,
         |  CAST(SUM(nb) AS BIGINT) AS sym_before,
         |  CAST(SUM(na) AS BIGINT) AS sym_after,
         |  CAST(CAST(floor((CAST(SUM(na) AS DOUBLE) / CAST(SUM(nb) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS compression
         |FROM sym GROUP BY lang
         |ORDER BY lang NULLS FIRST, n_docs NULLS FIRST, sym_before NULLS FIRST, sym_after NULLS FIRST, compression NULLS FIRST""".stripMargin
    },

    "bpe_train" -> duckBpeTrainSql,

    // The batched trainer must reproduce the sequential merge table
    // EXACTLY (the bpeMergesBatched equivalence guard): same oracle.
    "bpe_train_batched" -> duckBpeTrainSql,

    "txt_langid" ->
      """SELECT doc_id, lang,
        |  CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        |    w -> w IN ('a', 'the'))) AS DOUBLE) /
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.05
        |  THEN 'en' ELSE 'unknown' END AS pred_lang,
        |  (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        |    w -> w IN ('a', 'the'))) AS DOUBLE) /
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.05
        |  THEN 'en' ELSE 'unknown' END) = lang AS is_match
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, pred_lang NULLS FIRST, is_match NULLS FIRST""".stripMargin,

    "curriculum" -> {
      val phaseSum = (1 to 4).map(i =>
        s"CASE WHEN score > CAST(CAST(floor((bs[$i])*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH scored AS (
        |  SELECT doc_id, n_chars,
        |    CAST(CAST(floor((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |      CAST(len(string_split(text, ' ')) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS score
        |  FROM documents),
        |c AS (SELECT quantile_cont(score, [0.2, 0.4, 0.6, 0.8]) AS bs FROM scored),
        |p AS (
        |  SELECT n_chars, score, 1 + $phaseSum AS phase
        |  FROM scored CROSS JOIN c)
        |SELECT phase, COUNT(*) AS n_docs,
        |  CAST(CAST(floor((CAST(SUM(CAST(score AS DECIMAL(38,4))) AS DOUBLE) / COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_score,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM p GROUP BY phase
        |ORDER BY phase NULLS FIRST, n_docs NULLS FIRST, avg_score NULLS FIRST, sum_chars NULLS FIRST""".stripMargin
    },

    "txt_quality" ->
      """SELECT doc_id, lang,
        |  CAST(CAST(floor((CAST(len(list_filter(string_split(text, ' '), w -> w IN ('a', 'the'))) AS DOUBLE) /
        |    CAST(len(string_split(text, ' ')) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS stop_ratio,
        |  CAST(CAST(floor(((CAST(n_chars AS DOUBLE) - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1.0)) /
        |    CAST(len(string_split(text, ' ')) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_tok_len,
        |  CAST(CAST(floor((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |    CAST(len(string_split(text, ' ')) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS ttr,
        |  (n_chars >= 100 AND n_chars <= 500) AS len_ok
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, stop_ratio NULLS FIRST, avg_tok_len NULLS FIRST, ttr NULLS FIRST, len_ok NULLS FIRST""".stripMargin,

    // The curation twin recomputes both float signals with the identical
    // fold orders, so the raw-double threshold gates agree row-for-row.
    "pipeline_curate" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        |), pos AS (
        |  SELECT doc_id, lang,
        |    unnest(range(1, len(ws))) AS pos,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS gram
        |  FROM w
        |), counts AS (
        |  SELECT lang, gram, COUNT(1) AS c2 FROM pos GROUP BY 1, 2
        |), totals AS (
        |  SELECT lang, CAST(SUM(c2) AS BIGINT) AS n_lang FROM counts GROUP BY 1
        |), scored AS (
        |  SELECT p.doc_id, p.pos,
        |    ln(CAST(c.c2 AS DOUBLE) / CAST(t.n_lang AS DOUBLE)) AS logp
        |  FROM pos p JOIN counts c USING (lang, gram) JOIN totals t USING (lang)
        |), lm AS (
        |  SELECT doc_id,
        |    (-(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(logp ORDER BY pos ASC)),
        |      (acc, x) -> acc + x))) / CAST(COUNT(1) AS DOUBLE) AS surp
        |  FROM scored GROUP BY doc_id
        |), ent AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_sort(list_distinct(ws)),
        |        x -> -(CAST(len(list_filter(ws, y -> y = x)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)) *
        |             ln(CAST(len(list_filter(ws, y -> y = x)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)))),
        |      (acc, x) -> acc + x) AS e
        |  FROM w
        |), q AS (
        |  SELECT d.doc_id, d.lang, d.text, d.n_chars
        |  FROM documents d JOIN ent USING (doc_id) JOIN lm USING (doc_id)
        |  WHERE len(string_split(d.text, ' ')) >= 20 AND ent.e >= 2.5
        |    AND lm.surp BETWEEN 6.5 AND 7.0
        |), keepers AS (
        |  SELECT text, MIN(doc_id) AS doc_id FROM q GROUP BY text
        |)
        |SELECT q.lang, COUNT(1) AS n_kept,
        |  CAST(CAST(floor((CAST(SUM(CAST(q.n_chars AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_chars
        |FROM q JOIN keepers USING (text, doc_id)
        |GROUP BY q.lang
        |ORDER BY lang NULLS FIRST, n_kept NULLS FIRST, avg_chars NULLS FIRST""".stripMargin,

    "pack_bins" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) AS h
        |  FROM documents
        |), c AS (
        |  SELECT CAST(h % 8 AS INT) AS pack_group, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY h % 8 ORDER BY h ASC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t
        |)
        |SELECT pack_group,
        |  CAST(floor(CAST(cum - n_tok AS DOUBLE) / 512.0) AS BIGINT) AS bin,
        |  COUNT(1) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc
        |FROM c
        |GROUP BY 1, 2
        |ORDER BY pack_group NULLS FIRST, bin NULLS FIRST, n_docs NULLS FIRST, n_tokens NULLS FIRST, first_doc NULLS FIRST""".stripMargin,

    // Positional-bigram twin of the Spark pipeline; per-doc log-probs are
    // aggregated with list(logp ORDER BY pos) then left-folded — the same
    // IEEE sum order as the array_sort + aggregate fold.
    "lm_score" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        |), pos AS (
        |  SELECT doc_id, lang,
        |    unnest(range(1, len(ws))) AS pos,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS gram
        |  FROM w
        |), counts AS (
        |  SELECT lang, gram, COUNT(1) AS c2 FROM pos GROUP BY 1, 2
        |), totals AS (
        |  SELECT lang, CAST(SUM(c2) AS BIGINT) AS n_lang FROM counts GROUP BY 1
        |), scored AS (
        |  SELECT p.doc_id, p.pos,
        |    ln(CAST(c.c2 AS DOUBLE) / CAST(t.n_lang AS DOUBLE)) AS logp
        |  FROM pos p JOIN counts c USING (lang, gram) JOIN totals t USING (lang)
        |), agg AS (
        |  SELECT doc_id, list(logp ORDER BY pos ASC) AS ls FROM scored GROUP BY doc_id
        |)
        |SELECT doc_id, CAST(len(ls) AS INT) AS n_bigrams,
        |  CAST(CAST(floor(((-(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ls), (acc, x) -> acc + x))) /
        |    CAST(len(ls) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_surprisal
        |FROM agg
        |ORDER BY doc_id NULLS FIRST, n_bigrams NULLS FIRST, avg_surprisal NULLS FIRST""".stripMargin,

    // LM-1's CTEs with lang carried through, then per-lang type-7 tertile
    // cuts (quantile_cont = Spark's percentile, the AGG-7 precedent) and
    // the dec4-both-sides bucket compare.
    "lm_buckets" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        |), pos AS (
        |  SELECT doc_id, lang,
        |    unnest(range(1, len(ws))) AS pos,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS gram
        |  FROM w
        |), counts AS (
        |  SELECT lang, gram, COUNT(1) AS c2 FROM pos GROUP BY 1, 2
        |), totals AS (
        |  SELECT lang, CAST(SUM(c2) AS BIGINT) AS n_lang FROM counts GROUP BY 1
        |), scored AS (
        |  SELECT p.doc_id, p.lang, p.pos,
        |    ln(CAST(c.c2 AS DOUBLE) / CAST(t.n_lang AS DOUBLE)) AS logp
        |  FROM pos p JOIN counts c USING (lang, gram) JOIN totals t USING (lang)
        |), agg AS (
        |  SELECT doc_id, lang, list(logp ORDER BY pos ASC) AS ls
        |  FROM scored GROUP BY doc_id, lang
        |), sc AS (
        |  SELECT doc_id, lang, CAST(len(ls) AS INT) AS n_bigrams,
        |    (-(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ls), (acc, x) -> acc + x))) /
        |      CAST(len(ls) AS DOUBLE) AS surp
        |  FROM agg
        |), cuts AS (
        |  SELECT lang, quantile_cont(surp, [1.0/3, 2.0/3]) AS cs FROM sc GROUP BY lang
        |), r AS (
        |  SELECT doc_id, sc.lang AS lang, n_bigrams, surp,
        |    CASE WHEN CAST(floor((surp)*10000+0.5)/10000 AS DECIMAL(38,4)) <=
        |              CAST(floor((cs[1])*10000+0.5)/10000 AS DECIMAL(38,4)) THEN 'head'
        |         WHEN CAST(floor((surp)*10000+0.5)/10000 AS DECIMAL(38,4)) <=
        |              CAST(floor((cs[2])*10000+0.5)/10000 AS DECIMAL(38,4)) THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |  FROM sc JOIN cuts USING (lang)
        |)
        |SELECT doc_id, lang, n_bigrams,
        |  CAST(CAST(floor((surp)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_surprisal,
        |  bucket, bucket <> 'tail' AS kept
        |FROM r
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, n_bigrams NULLS FIRST, avg_surprisal NULLS FIRST, bucket NULLS FIRST, kept NULLS FIRST""".stripMargin,

    // The entropy fold mirrors the Spark side exactly: terms generated in
    // sorted-distinct-word order, left-folded from 0.0 — the same IEEE sum.
    "txt_entropy" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS words,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(words) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(words)) AS INT) AS n_distinct,
        |  CAST(CAST(floor((list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(list_sort(list_distinct(words)),
        |      w -> -(CAST(len(list_filter(words, x -> x = w)) AS DOUBLE) / n) *
        |           ln(CAST(len(list_filter(words, x -> x = w)) AS DOUBLE) / n))),
        |    (acc, x) -> acc + x))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS entropy
        |FROM base
        |ORDER BY doc_id NULLS FIRST, n_tokens NULLS FIRST, n_distinct NULLS FIRST, entropy NULLS FIRST""".stripMargin,

    "txt_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS re_tokens,
        |  CAST(length(text) AS INT) AS n_chars_obs,
        |  (n_chars = length(text)) AS n_chars_valid
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "txt_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 2147483647) AS fingerprint,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(substring(text, 1, 64), ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 2147483647) AS prefix_fp
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "txt_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(CAST(floor((1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS dup_word_frac,
        |  CAST(CAST(floor((CAST(list_max(list_transform(list_distinct(w), t2 -> len(list_filter(w, x -> x = t2)))) AS DOUBLE) / CAST(len(w) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS top_word_frac,
        |  CAST(CAST(floor((CASE WHEN len(w) >= 2
        |    THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS DOUBLE) / CAST(len(w) - 1 AS DOUBLE)
        |    ELSE 0.0 END)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS dup_bigram_frac
        |FROM t
        |ORDER BY doc_id NULLS FIRST, dup_word_frac NULLS FIRST, top_word_frac NULLS FIRST, dup_bigram_frac NULLS FIRST""".stripMargin,

    "pack1" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (
        |  SELECT doc_id, w, CAST(unnest(range(0, CAST(ceil(CAST(len(w) AS DOUBLE) / 32.0) AS INT))) AS INT) AS chunk_idx
        |  FROM t),
        |s AS (
        |  SELECT doc_id, chunk_idx, list_slice(w, chunk_idx*32 + 1, chunk_idx*32 + 32) AS ch
        |  FROM c)
        |SELECT doc_id, chunk_idx, CAST(len(ch) AS INT) AS n_toks,
        |  ch[1] AS first_tok, ch[len(ch)] AS last_tok
        |FROM s
        |ORDER BY doc_id NULLS FIRST, chunk_idx NULLS FIRST, n_toks NULLS FIRST, first_tok NULLS FIRST, last_tok NULLS FIRST""".stripMargin,

    "chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |n AS (
        |  SELECT doc_id, w, len(w) AS n,
        |    CASE WHEN len(w) <= 32 THEN 1
        |         ELSE CAST(ceil(CAST(len(w) - 32 AS DOUBLE) / 24.0) AS INT) + 1 END AS nc
        |  FROM t),
        |c AS (
        |  SELECT doc_id, w, CAST(unnest(range(0, nc)) AS INT) AS chunk_idx FROM n),
        |s AS (
        |  SELECT doc_id, chunk_idx, chunk_idx * 24 AS start_tok,
        |    list_slice(w, chunk_idx*24 + 1, chunk_idx*24 + 32) AS ch
        |  FROM c)
        |SELECT doc_id, chunk_idx, CAST(start_tok AS INT) AS start_tok,
        |  CAST(len(ch) AS INT) AS n_toks,
        |  ch[1] AS first_tok, ch[len(ch)] AS last_tok
        |FROM s
        |ORDER BY doc_id NULLS FIRST, chunk_idx NULLS FIRST, start_tok NULLS FIRST, n_toks NULLS FIRST, first_tok NULLS FIRST, last_tok NULLS FIRST""".stripMargin,

    "tfidf1" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(1) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT word, COUNT(1) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(1) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, word,
        |    CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf_raw
        |  FROM tf JOIN dfreq USING (word) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, word, tfidf_raw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf_raw DESC, word ASC) AS INT) AS rn
        |  FROM scored)
        |SELECT doc_id, rn, word,
        |  CAST(CAST(floor((tfidf_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS tfidf
        |FROM r WHERE rn <= 3
        |ORDER BY doc_id NULLS FIRST, rn NULLS FIRST, word NULLS FIRST, tfidf NULLS FIRST""".stripMargin,

    "bm25" ->
      s"""WITH $duckBm25Ctes,
        |r AS (
        |  SELECT q_id, doc_id, score, n_terms,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS INT) AS rn
        |  FROM scored)
        |SELECT q_id, rn, doc_id, n_terms, CAST(score AS VARCHAR) AS score
        |FROM r WHERE rn <= 3
        |ORDER BY q_id NULLS FIRST, rn NULLS FIRST, doc_id NULLS FIRST, n_terms NULLS FIRST, score NULLS FIRST""".stripMargin,

    "retrieve_rerank" ->
      s"""WITH $duckBm25Ctes,
        |rb AS (
        |  SELECT q_id, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS INT) AS bm25_rank
        |  FROM scored),
        |t10 AS (SELECT q_id, doc_id, bm25_rank FROM rb WHERE bm25_rank <= 10),
        |eb AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |cosd AS (
        |  SELECT t10.q_id, t10.doc_id, t10.bm25_rank,
        |    list_sum(list_transform(list_zip(qv.e, cv.e), p -> p[1] * p[2])) / (qv.nrm * cv.nrm) AS cos_raw
        |  FROM t10 JOIN eb qv ON t10.q_id = qv.vec_id
        |    JOIN eb cv ON t10.doc_id = cv.vec_id),
        |rr AS (
        |  SELECT q_id, doc_id, bm25_rank, cos_raw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, doc_id ASC) AS INT) AS rn
        |  FROM cosd)
        |SELECT q_id, rn, doc_id, bm25_rank,
        |  CAST(CAST(floor((cos_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS cos
        |FROM rr WHERE rn <= 3
        |ORDER BY q_id NULLS FIRST, rn NULLS FIRST, doc_id NULLS FIRST, bm25_rank NULLS FIRST, cos NULLS FIRST""".stripMargin,

    "retrieve_rrf" ->
      s"""WITH $duckBm25Ctes,
        |$duckTop10Ctes,
        |fused AS (
        |  SELECT COALESCE(rb10.q_id, rd10.q_id) AS q_id,
        |    COALESCE(rb10.doc_id, rd10.doc_id) AS doc_id,
        |    rb10.r_bm25 AS r_bm25, rd10.r_cos AS r_cos,
        |    COALESCE(1.0 / (60 + rb10.r_bm25), 0.0) + COALESCE(1.0 / (60 + rd10.r_cos), 0.0) AS rrf
        |  FROM rb10 FULL OUTER JOIN rd10
        |    ON rb10.q_id = rd10.q_id AND rb10.doc_id = rd10.doc_id),
        |rk AS (
        |  SELECT q_id, doc_id, r_bm25, r_cos, rrf,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id ASC) AS INT) AS rn
        |  FROM fused)
        |SELECT q_id, rn, doc_id, r_bm25, r_cos,
        |  CAST(CAST(floor((rrf)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS rrf
        |FROM rk WHERE rn <= 5
        |ORDER BY q_id NULLS FIRST, rn NULLS FIRST, doc_id NULLS FIRST, r_bm25 NULLS FIRST, r_cos NULLS FIRST, rrf NULLS FIRST""".stripMargin,

    "hard_negatives" ->
      s"""WITH $duckBm25Ctes,
        |$duckTop10Ctes,
        |neg AS (
        |  SELECT rd10.q_id, rd10.doc_id, rd10.r_cos, rd10.cos_raw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY rd10.q_id ORDER BY rd10.r_cos ASC) AS INT) AS rn
        |  FROM rd10 ANTI JOIN rb10 ON rd10.q_id = rb10.q_id AND rd10.doc_id = rb10.doc_id)
        |SELECT q_id, rn, doc_id, r_cos,
        |  CAST(CAST(floor((cos_raw)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS cos
        |FROM neg WHERE rn <= 3
        |ORDER BY q_id NULLS FIRST, rn NULLS FIRST, doc_id NULLS FIRST, r_cos NULLS FIRST, cos NULLS FIRST""".stripMargin,

    "src1" ->
      """WITH h AS (
        |  SELECT source, doc_id, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) AS th
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY th ASC, doc_id ASC) AS INT) AS rk
        |  FROM h),
        |tot AS (SELECT source, COUNT(1) AS n_total FROM documents GROUP BY 1),
        |k AS (
        |  SELECT source, COUNT(1) AS n_kept,
        |    CAST(CAST(floor((CAST(SUM(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_kept_chars
        |  FROM r WHERE rk <= 10 GROUP BY 1)
        |SELECT source, n_total, n_kept, avg_kept_chars
        |FROM k JOIN tot USING (source)
        |ORDER BY source NULLS FIRST, n_total NULLS FIRST, n_kept NULLS FIRST, avg_kept_chars NULLS FIRST""".stripMargin,

    "smp_rate" ->
      """WITH f AS (
        |  SELECT lang, n_chars,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |      (CASE WHEN lang = 'en' THEN '1a' ELSE '80' END) AS kept
        |  FROM documents)
        |SELECT lang, COUNT(1) AS n_total,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(CAST(floor((CAST(SUM(CASE WHEN kept THEN CAST(n_chars AS DECIMAL(38,4)) END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_kept_chars
        |FROM f GROUP BY lang
        |ORDER BY lang NULLS FIRST, n_total NULLS FIRST, n_kept NULLS FIRST, avg_kept_chars NULLS FIRST""".stripMargin,

    "smp_universe" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  COUNT(1) AS n_items,
        |  CAST(CAST(floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
        |    / COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
        |  AND substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < '1a'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST, n_orders NULLS FIRST, n_items NULLS FIRST, avg_price NULLS FIRST""".stripMargin,

    "split_embargo" ->
      """WITH tagged AS (
        |  SELECT user_id,
        |    CASE WHEN ts < TIMESTAMP '2024-01-24 00:00:00' - INTERVAL 3 DAY THEN 'train'
        |         WHEN ts < TIMESTAMP '2024-01-24 00:00:00' THEN 'embargo'
        |         ELSE 'test' END AS seg
        |  FROM events),
        |census AS (
        |  SELECT seg, COUNT(1) AS n_events,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM tagged GROUP BY seg),
        |overlap AS (
        |  SELECT 'overlap_users' AS seg, CAST(0 AS BIGINT) AS n_events,
        |    CAST(COUNT(1) AS BIGINT) AS n_users
        |  FROM (SELECT DISTINCT user_id FROM tagged WHERE seg = 'train') tr
        |  WHERE EXISTS (SELECT 1 FROM tagged te
        |    WHERE te.seg = 'test' AND te.user_id = tr.user_id))
        |SELECT * FROM (SELECT * FROM census UNION ALL SELECT * FROM overlap)
        |ORDER BY seg NULLS FIRST, n_events NULLS FIRST, n_users NULLS FIRST""".stripMargin,

    "bitext_mine" ->
      """WITH p AS (
        |  SELECT DISTINCT doc_id, lang, g FROM (
        |    SELECT doc_id, lang, unnest(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS g
        |    FROM documents) t),
        |df AS (SELECT g, COUNT(1) AS df FROM p GROUP BY 1),
        |rare AS (SELECT p.doc_id, p.lang, p.g FROM p JOIN df USING (g) WHERE df.df <= 5)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, a.lang AS l1, b.lang AS l2,
        |  COUNT(1) AS n_shared
        |FROM rare a JOIN rare b ON a.g = b.g AND a.lang < b.lang
        |GROUP BY 1, 2, 3, 4
        |ORDER BY d1 NULLS FIRST, d2 NULLS FIRST, l1 NULLS FIRST, l2 NULLS FIRST, n_shared NULLS FIRST""".stripMargin,

    "quota_alloc" ->
      """WITH counts AS (
        |  SELECT lang, COUNT(1) AS n FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM counts),
        |based AS (
        |  SELECT lang, n, (1000 * n) // nn AS base,
        |    1000 * n - ((1000 * n) // nn) * nn AS rem
        |  FROM counts CROSS JOIN t),
        |ranked AS (
        |  SELECT *, 1000 - SUM(base) OVER () AS leftover,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC) AS rk
        |  FROM based)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM ranked
        |ORDER BY lang NULLS FIRST, n_docs NULLS FIRST, quota NULLS FIRST""".stripMargin,

    // sqrt weights (IEEE-exact both engines), lang-ordered fold for the
    // weight sum, quota_alloc's largest-remainder on the double shares.
    "mix_epochs" ->
      """WITH inv AS (
        |  SELECT lang,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |    sqrt(CAST(CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE)) AS w
        |  FROM documents GROUP BY lang),
        |t AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(w ORDER BY lang ASC)),
        |      (acc, x) -> acc + x) AS wsum,
        |    CAST(SUM(n_tokens) AS BIGINT) AS all_tokens
        |  FROM inv),
        |e AS (
        |  SELECT lang, n_tokens,
        |    CAST(floor(CAST(4 * all_tokens AS DOUBLE) * (w / wsum)) AS BIGINT) AS target
        |  FROM inv CROSS JOIN t)
        |SELECT lang, n_tokens, target,
        |  CAST(ceil(CAST(target AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS epochs,
        |  CAST(ceil(CAST(target AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS BIGINT) > 4 AS over_repeat
        |FROM e
        |ORDER BY lang NULLS FIRST, n_tokens NULLS FIRST, target NULLS FIRST, epochs NULLS FIRST, over_repeat NULLS FIRST""".stripMargin,

    "mix_temp" ->
      """WITH inv AS (
        |  SELECT lang, COUNT(1) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |    sqrt(CAST(CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE)) AS w
        |  FROM documents GROUP BY lang),
        |t AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(w ORDER BY lang ASC)),
        |      (acc, x) -> acc + x) AS wsum,
        |    CAST(SUM(n_tokens) AS BIGINT) AS all_tokens
        |  FROM inv),
        |based AS (
        |  SELECT lang, n_docs, n_tokens, all_tokens, w / wsum AS q,
        |    CAST(floor(1000000.0 * (w / wsum)) AS BIGINT) AS base,
        |    1000000.0 * (w / wsum) - floor(1000000.0 * (w / wsum)) AS rem
        |  FROM inv CROSS JOIN t),
        |ranked AS (
        |  SELECT *, 1000000 - SUM(base) OVER () AS leftover,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC) AS rk
        |  FROM based)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
        |  CAST(CAST(floor((CAST(n_tokens AS DOUBLE) / CAST(all_tokens AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS share_raw,
        |  CAST(CAST(floor((q)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS share_temp,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota_tokens,
        |  CAST(CAST(floor((q * CAST(all_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS upsample_factor
        |FROM ranked
        |ORDER BY lang NULLS FIRST, n_docs NULLS FIRST, n_tokens NULLS FIRST, share_raw NULLS FIRST, share_temp NULLS FIRST, quota_tokens NULLS FIRST, upsample_factor NULLS FIRST""".stripMargin,

    "mix_plan" ->
      """WITH inv AS (
        |  SELECT lang, COUNT(1) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |t AS (
        |  SELECT CAST(MIN(n_tokens) AS BIGINT) AS target_tokens,
        |    CAST(SUM(n_tokens) AS BIGINT) AS all_tokens
        |  FROM inv)
        |SELECT lang, n_docs, n_tokens,
        |  CAST(CAST(floor((CAST(n_tokens AS DOUBLE) / CAST(all_tokens AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS share_actual,
        |  target_tokens,
        |  CAST(CAST(floor((CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS keep_rate
        |FROM inv CROSS JOIN t
        |ORDER BY lang NULLS FIRST, n_docs NULLS FIRST, n_tokens NULLS FIRST, share_actual NULLS FIRST, target_tokens NULLS FIRST, keep_rate NULLS FIRST""".stripMargin,

    "vec_norm_drift" ->
      """WITH b AS (
        |  SELECT vec_id,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS value,
        |    CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS ia
        |  FROM embeddings),
        |pv AS (
        |  SELECT value, SUM(ia) AS ca, SUM(1 - ia) AS cb FROM b GROUP BY value),
        |cum AS (
        |  SELECT value,
        |    SUM(ca) OVER (ORDER BY value ASC) AS cuma,
        |    SUM(cb) OVER (ORDER BY value ASC) AS cumb
        |  FROM pv),
        |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
        |sc AS (
        |  SELECT value, na, nb,
        |    abs(CAST(cuma AS DOUBLE) / CAST(NULLIF(na, 0) AS DOUBLE) -
        |        CAST(cumb AS DOUBLE) / CAST(NULLIF(nb, 0) AS DOUBLE)) AS diff
        |  FROM cum CROSS JOIN tot),
        |mx AS (SELECT MAX(diff) AS dmax FROM sc)
        |SELECT na AS n_a, nb AS n_b,
        |  CAST(CAST(floor((dmax)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS ks_d,
        |  CAST(CAST(floor((MIN(value))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS at_norm,
        |  CAST(floor((dmax)*10000+0.5)/10000 AS DECIMAL(38,4)) >
        |    CAST(floor((1.3581 * sqrt(CAST(na + nb AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))))*10000+0.5)/10000 AS DECIMAL(38,4)) AS reject
        |FROM sc CROSS JOIN mx WHERE diff = dmax
        |GROUP BY na, nb, dmax
        |ORDER BY n_a NULLS FIRST, n_b NULLS FIRST, ks_d NULLS FIRST, at_norm NULLS FIRST, reject NULLS FIRST""".stripMargin,

    "vec_norm_audit" ->
      """WITH b AS (
        |  SELECT label, CAST(len(embedding) AS INT) AS dim,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
        |    CASE WHEN len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE)))) > 0
        |      THEN 1 ELSE 0 END AS bad
        |  FROM embeddings)
        |SELECT label, CAST(COUNT(1) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN nrm < 1e-12 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(SUM(bad) AS BIGINT) AS n_nonfinite,
        |  MIN(dim) AS dim_min, MAX(dim) AS dim_max,
        |  array_to_string(list_transform(quantile_cont(nrm, [0.5, 0.95]), x -> CAST(CAST(floor(CAST(x AS DOUBLE)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR)), ',') AS norm_pct,
        |  CAST(CAST(floor((CAST(CAST(SUM(CAST(floor((nrm)*10000+0.5)/10000 AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS norm_mean
        |FROM b GROUP BY label
        |ORDER BY label NULLS FIRST, n NULLS FIRST, n_zero NULLS FIRST, n_nonfinite NULLS FIRST, dim_min NULLS FIRST, dim_max NULLS FIRST, norm_pct NULLS FIRST, norm_mean NULLS FIRST""".stripMargin,

    // DuckDB twin of the 3-round power iteration: centering on the dec4
    // means (the Lloyd-centroid idiom), per-round matvec as dec8-quantized
    // decimal sums, dec4-normalized iterates.
    "vec_pca" ->
      """WITH rawe AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), muc AS (
        |  SELECT [m1, m2, m3, m4, m5, m6, m7, m8, m9, m10, m11, m12, m13, m14, m15, m16, m17, m18, m19, m20, m21, m22, m23, m24, m25, m26, m27, m28, m29, m30, m31, m32, m33, m34, m35, m36, m37, m38, m39, m40, m41, m42, m43, m44, m45, m46, m47, m48, m49, m50, m51, m52, m53, m54, m55, m56, m57, m58, m59, m60, m61, m62, m63, m64] AS mu FROM (SELECT
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[1])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m1,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[2])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m2,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[3])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m3,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[4])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m4,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[5])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m5,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[6])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m6,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[7])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m7,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[8])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m8,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[9])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m9,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[10])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m10,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[11])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m11,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[12])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m12,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[13])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m13,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[14])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m14,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[15])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m15,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[16])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m16,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[17])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m17,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[18])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m18,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[19])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m19,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[20])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m20,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[21])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m21,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[22])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m22,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[23])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m23,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[24])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m24,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[25])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m25,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[26])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m26,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[27])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m27,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[28])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m28,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[29])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m29,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[30])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m30,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[31])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m31,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[32])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m32,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[33])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m33,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[34])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m34,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[35])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m35,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[36])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m36,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[37])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m37,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[38])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m38,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[39])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m39,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[40])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m40,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[41])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m41,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[42])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m42,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[43])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m43,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[44])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m44,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[45])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m45,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[46])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m46,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[47])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m47,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[48])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m48,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[49])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m49,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[50])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m50,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[51])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m51,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[52])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m52,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[53])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m53,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[54])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m54,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[55])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m55,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[56])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m56,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[57])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m57,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[58])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m58,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[59])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m59,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[60])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m60,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[61])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m61,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[62])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m62,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[63])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m63,
        |    CAST(CAST(floor((CAST(SUM(CAST(floor((e[64])*10000+0.5)/10000 AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE) AS m64
        |  FROM rawe)
        |), cent AS (
        |  SELECT vec_id, list_transform(list_zip(e, mu), p -> p[1] - p[2]) AS c
        |  FROM rawe, muc
        |), tv AS (
        |  SELECT CAST(SUM(CAST(floor((list_sum(list_transform(c, x -> x * x)))*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DOUBLE)/COUNT(1) AS tv
        |  FROM cent
        |), t0 AS (SELECT [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS t),
        |s1 AS (
        |  SELECT c, list_sum(list_transform(list_zip(c, t), p -> p[1] * p[2])) AS sc
        |  FROM cent, t0
        |), g1 AS (
        |  SELECT CAST(SUM(CAST(floor((sc*c[1])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v1,
        |    CAST(SUM(CAST(floor((sc*c[2])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v2,
        |    CAST(SUM(CAST(floor((sc*c[3])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v3,
        |    CAST(SUM(CAST(floor((sc*c[4])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v4,
        |    CAST(SUM(CAST(floor((sc*c[5])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v5,
        |    CAST(SUM(CAST(floor((sc*c[6])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v6,
        |    CAST(SUM(CAST(floor((sc*c[7])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v7,
        |    CAST(SUM(CAST(floor((sc*c[8])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v8,
        |    CAST(SUM(CAST(floor((sc*c[9])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v9,
        |    CAST(SUM(CAST(floor((sc*c[10])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v10,
        |    CAST(SUM(CAST(floor((sc*c[11])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v11,
        |    CAST(SUM(CAST(floor((sc*c[12])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v12,
        |    CAST(SUM(CAST(floor((sc*c[13])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v13,
        |    CAST(SUM(CAST(floor((sc*c[14])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v14,
        |    CAST(SUM(CAST(floor((sc*c[15])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v15,
        |    CAST(SUM(CAST(floor((sc*c[16])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v16,
        |    CAST(SUM(CAST(floor((sc*c[17])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v17,
        |    CAST(SUM(CAST(floor((sc*c[18])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v18,
        |    CAST(SUM(CAST(floor((sc*c[19])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v19,
        |    CAST(SUM(CAST(floor((sc*c[20])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v20,
        |    CAST(SUM(CAST(floor((sc*c[21])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v21,
        |    CAST(SUM(CAST(floor((sc*c[22])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v22,
        |    CAST(SUM(CAST(floor((sc*c[23])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v23,
        |    CAST(SUM(CAST(floor((sc*c[24])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v24,
        |    CAST(SUM(CAST(floor((sc*c[25])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v25,
        |    CAST(SUM(CAST(floor((sc*c[26])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v26,
        |    CAST(SUM(CAST(floor((sc*c[27])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v27,
        |    CAST(SUM(CAST(floor((sc*c[28])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v28,
        |    CAST(SUM(CAST(floor((sc*c[29])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v29,
        |    CAST(SUM(CAST(floor((sc*c[30])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v30,
        |    CAST(SUM(CAST(floor((sc*c[31])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v31,
        |    CAST(SUM(CAST(floor((sc*c[32])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v32,
        |    CAST(SUM(CAST(floor((sc*c[33])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v33,
        |    CAST(SUM(CAST(floor((sc*c[34])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v34,
        |    CAST(SUM(CAST(floor((sc*c[35])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v35,
        |    CAST(SUM(CAST(floor((sc*c[36])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v36,
        |    CAST(SUM(CAST(floor((sc*c[37])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v37,
        |    CAST(SUM(CAST(floor((sc*c[38])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v38,
        |    CAST(SUM(CAST(floor((sc*c[39])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v39,
        |    CAST(SUM(CAST(floor((sc*c[40])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v40,
        |    CAST(SUM(CAST(floor((sc*c[41])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v41,
        |    CAST(SUM(CAST(floor((sc*c[42])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v42,
        |    CAST(SUM(CAST(floor((sc*c[43])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v43,
        |    CAST(SUM(CAST(floor((sc*c[44])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v44,
        |    CAST(SUM(CAST(floor((sc*c[45])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v45,
        |    CAST(SUM(CAST(floor((sc*c[46])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v46,
        |    CAST(SUM(CAST(floor((sc*c[47])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v47,
        |    CAST(SUM(CAST(floor((sc*c[48])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v48,
        |    CAST(SUM(CAST(floor((sc*c[49])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v49,
        |    CAST(SUM(CAST(floor((sc*c[50])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v50,
        |    CAST(SUM(CAST(floor((sc*c[51])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v51,
        |    CAST(SUM(CAST(floor((sc*c[52])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v52,
        |    CAST(SUM(CAST(floor((sc*c[53])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v53,
        |    CAST(SUM(CAST(floor((sc*c[54])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v54,
        |    CAST(SUM(CAST(floor((sc*c[55])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v55,
        |    CAST(SUM(CAST(floor((sc*c[56])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v56,
        |    CAST(SUM(CAST(floor((sc*c[57])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v57,
        |    CAST(SUM(CAST(floor((sc*c[58])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v58,
        |    CAST(SUM(CAST(floor((sc*c[59])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v59,
        |    CAST(SUM(CAST(floor((sc*c[60])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v60,
        |    CAST(SUM(CAST(floor((sc*c[61])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v61,
        |    CAST(SUM(CAST(floor((sc*c[62])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v62,
        |    CAST(SUM(CAST(floor((sc*c[63])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v63,
        |    CAST(SUM(CAST(floor((sc*c[64])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v64,
        |    CAST(SUM(CAST(floor((sc*sc)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS ss,
        |    COUNT(1) AS nn
        |  FROM s1
        |), va1 AS (
        |  SELECT [CAST(v1 AS DOUBLE), CAST(v2 AS DOUBLE), CAST(v3 AS DOUBLE), CAST(v4 AS DOUBLE), CAST(v5 AS DOUBLE), CAST(v6 AS DOUBLE), CAST(v7 AS DOUBLE), CAST(v8 AS DOUBLE), CAST(v9 AS DOUBLE), CAST(v10 AS DOUBLE), CAST(v11 AS DOUBLE), CAST(v12 AS DOUBLE), CAST(v13 AS DOUBLE), CAST(v14 AS DOUBLE), CAST(v15 AS DOUBLE), CAST(v16 AS DOUBLE), CAST(v17 AS DOUBLE), CAST(v18 AS DOUBLE), CAST(v19 AS DOUBLE), CAST(v20 AS DOUBLE), CAST(v21 AS DOUBLE), CAST(v22 AS DOUBLE), CAST(v23 AS DOUBLE), CAST(v24 AS DOUBLE), CAST(v25 AS DOUBLE), CAST(v26 AS DOUBLE), CAST(v27 AS DOUBLE), CAST(v28 AS DOUBLE), CAST(v29 AS DOUBLE), CAST(v30 AS DOUBLE), CAST(v31 AS DOUBLE), CAST(v32 AS DOUBLE), CAST(v33 AS DOUBLE), CAST(v34 AS DOUBLE), CAST(v35 AS DOUBLE), CAST(v36 AS DOUBLE), CAST(v37 AS DOUBLE), CAST(v38 AS DOUBLE), CAST(v39 AS DOUBLE), CAST(v40 AS DOUBLE), CAST(v41 AS DOUBLE), CAST(v42 AS DOUBLE), CAST(v43 AS DOUBLE), CAST(v44 AS DOUBLE), CAST(v45 AS DOUBLE), CAST(v46 AS DOUBLE), CAST(v47 AS DOUBLE), CAST(v48 AS DOUBLE), CAST(v49 AS DOUBLE), CAST(v50 AS DOUBLE), CAST(v51 AS DOUBLE), CAST(v52 AS DOUBLE), CAST(v53 AS DOUBLE), CAST(v54 AS DOUBLE), CAST(v55 AS DOUBLE), CAST(v56 AS DOUBLE), CAST(v57 AS DOUBLE), CAST(v58 AS DOUBLE), CAST(v59 AS DOUBLE), CAST(v60 AS DOUBLE), CAST(v61 AS DOUBLE), CAST(v62 AS DOUBLE), CAST(v63 AS DOUBLE), CAST(v64 AS DOUBLE)] AS v, CAST(ss AS DOUBLE)/nn AS lambda FROM g1
        |), t1 AS (
        |  SELECT list_transform(v, x -> CAST(CAST(floor((x / sqrt(list_sum(list_transform(v, y -> y * y))))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE)) AS t,
        |    lambda
        |  FROM va1
        |),
        |s2 AS (
        |  SELECT c, list_sum(list_transform(list_zip(c, t), p -> p[1] * p[2])) AS sc
        |  FROM cent, t1
        |), g2 AS (
        |  SELECT CAST(SUM(CAST(floor((sc*c[1])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v1,
        |    CAST(SUM(CAST(floor((sc*c[2])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v2,
        |    CAST(SUM(CAST(floor((sc*c[3])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v3,
        |    CAST(SUM(CAST(floor((sc*c[4])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v4,
        |    CAST(SUM(CAST(floor((sc*c[5])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v5,
        |    CAST(SUM(CAST(floor((sc*c[6])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v6,
        |    CAST(SUM(CAST(floor((sc*c[7])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v7,
        |    CAST(SUM(CAST(floor((sc*c[8])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v8,
        |    CAST(SUM(CAST(floor((sc*c[9])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v9,
        |    CAST(SUM(CAST(floor((sc*c[10])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v10,
        |    CAST(SUM(CAST(floor((sc*c[11])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v11,
        |    CAST(SUM(CAST(floor((sc*c[12])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v12,
        |    CAST(SUM(CAST(floor((sc*c[13])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v13,
        |    CAST(SUM(CAST(floor((sc*c[14])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v14,
        |    CAST(SUM(CAST(floor((sc*c[15])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v15,
        |    CAST(SUM(CAST(floor((sc*c[16])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v16,
        |    CAST(SUM(CAST(floor((sc*c[17])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v17,
        |    CAST(SUM(CAST(floor((sc*c[18])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v18,
        |    CAST(SUM(CAST(floor((sc*c[19])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v19,
        |    CAST(SUM(CAST(floor((sc*c[20])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v20,
        |    CAST(SUM(CAST(floor((sc*c[21])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v21,
        |    CAST(SUM(CAST(floor((sc*c[22])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v22,
        |    CAST(SUM(CAST(floor((sc*c[23])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v23,
        |    CAST(SUM(CAST(floor((sc*c[24])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v24,
        |    CAST(SUM(CAST(floor((sc*c[25])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v25,
        |    CAST(SUM(CAST(floor((sc*c[26])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v26,
        |    CAST(SUM(CAST(floor((sc*c[27])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v27,
        |    CAST(SUM(CAST(floor((sc*c[28])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v28,
        |    CAST(SUM(CAST(floor((sc*c[29])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v29,
        |    CAST(SUM(CAST(floor((sc*c[30])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v30,
        |    CAST(SUM(CAST(floor((sc*c[31])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v31,
        |    CAST(SUM(CAST(floor((sc*c[32])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v32,
        |    CAST(SUM(CAST(floor((sc*c[33])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v33,
        |    CAST(SUM(CAST(floor((sc*c[34])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v34,
        |    CAST(SUM(CAST(floor((sc*c[35])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v35,
        |    CAST(SUM(CAST(floor((sc*c[36])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v36,
        |    CAST(SUM(CAST(floor((sc*c[37])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v37,
        |    CAST(SUM(CAST(floor((sc*c[38])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v38,
        |    CAST(SUM(CAST(floor((sc*c[39])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v39,
        |    CAST(SUM(CAST(floor((sc*c[40])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v40,
        |    CAST(SUM(CAST(floor((sc*c[41])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v41,
        |    CAST(SUM(CAST(floor((sc*c[42])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v42,
        |    CAST(SUM(CAST(floor((sc*c[43])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v43,
        |    CAST(SUM(CAST(floor((sc*c[44])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v44,
        |    CAST(SUM(CAST(floor((sc*c[45])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v45,
        |    CAST(SUM(CAST(floor((sc*c[46])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v46,
        |    CAST(SUM(CAST(floor((sc*c[47])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v47,
        |    CAST(SUM(CAST(floor((sc*c[48])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v48,
        |    CAST(SUM(CAST(floor((sc*c[49])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v49,
        |    CAST(SUM(CAST(floor((sc*c[50])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v50,
        |    CAST(SUM(CAST(floor((sc*c[51])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v51,
        |    CAST(SUM(CAST(floor((sc*c[52])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v52,
        |    CAST(SUM(CAST(floor((sc*c[53])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v53,
        |    CAST(SUM(CAST(floor((sc*c[54])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v54,
        |    CAST(SUM(CAST(floor((sc*c[55])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v55,
        |    CAST(SUM(CAST(floor((sc*c[56])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v56,
        |    CAST(SUM(CAST(floor((sc*c[57])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v57,
        |    CAST(SUM(CAST(floor((sc*c[58])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v58,
        |    CAST(SUM(CAST(floor((sc*c[59])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v59,
        |    CAST(SUM(CAST(floor((sc*c[60])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v60,
        |    CAST(SUM(CAST(floor((sc*c[61])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v61,
        |    CAST(SUM(CAST(floor((sc*c[62])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v62,
        |    CAST(SUM(CAST(floor((sc*c[63])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v63,
        |    CAST(SUM(CAST(floor((sc*c[64])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v64,
        |    CAST(SUM(CAST(floor((sc*sc)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS ss,
        |    COUNT(1) AS nn
        |  FROM s2
        |), va2 AS (
        |  SELECT [CAST(v1 AS DOUBLE), CAST(v2 AS DOUBLE), CAST(v3 AS DOUBLE), CAST(v4 AS DOUBLE), CAST(v5 AS DOUBLE), CAST(v6 AS DOUBLE), CAST(v7 AS DOUBLE), CAST(v8 AS DOUBLE), CAST(v9 AS DOUBLE), CAST(v10 AS DOUBLE), CAST(v11 AS DOUBLE), CAST(v12 AS DOUBLE), CAST(v13 AS DOUBLE), CAST(v14 AS DOUBLE), CAST(v15 AS DOUBLE), CAST(v16 AS DOUBLE), CAST(v17 AS DOUBLE), CAST(v18 AS DOUBLE), CAST(v19 AS DOUBLE), CAST(v20 AS DOUBLE), CAST(v21 AS DOUBLE), CAST(v22 AS DOUBLE), CAST(v23 AS DOUBLE), CAST(v24 AS DOUBLE), CAST(v25 AS DOUBLE), CAST(v26 AS DOUBLE), CAST(v27 AS DOUBLE), CAST(v28 AS DOUBLE), CAST(v29 AS DOUBLE), CAST(v30 AS DOUBLE), CAST(v31 AS DOUBLE), CAST(v32 AS DOUBLE), CAST(v33 AS DOUBLE), CAST(v34 AS DOUBLE), CAST(v35 AS DOUBLE), CAST(v36 AS DOUBLE), CAST(v37 AS DOUBLE), CAST(v38 AS DOUBLE), CAST(v39 AS DOUBLE), CAST(v40 AS DOUBLE), CAST(v41 AS DOUBLE), CAST(v42 AS DOUBLE), CAST(v43 AS DOUBLE), CAST(v44 AS DOUBLE), CAST(v45 AS DOUBLE), CAST(v46 AS DOUBLE), CAST(v47 AS DOUBLE), CAST(v48 AS DOUBLE), CAST(v49 AS DOUBLE), CAST(v50 AS DOUBLE), CAST(v51 AS DOUBLE), CAST(v52 AS DOUBLE), CAST(v53 AS DOUBLE), CAST(v54 AS DOUBLE), CAST(v55 AS DOUBLE), CAST(v56 AS DOUBLE), CAST(v57 AS DOUBLE), CAST(v58 AS DOUBLE), CAST(v59 AS DOUBLE), CAST(v60 AS DOUBLE), CAST(v61 AS DOUBLE), CAST(v62 AS DOUBLE), CAST(v63 AS DOUBLE), CAST(v64 AS DOUBLE)] AS v, CAST(ss AS DOUBLE)/nn AS lambda FROM g2
        |), t2 AS (
        |  SELECT list_transform(v, x -> CAST(CAST(floor((x / sqrt(list_sum(list_transform(v, y -> y * y))))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE)) AS t,
        |    lambda
        |  FROM va2
        |),
        |s3 AS (
        |  SELECT c, list_sum(list_transform(list_zip(c, t), p -> p[1] * p[2])) AS sc
        |  FROM cent, t2
        |), g3 AS (
        |  SELECT CAST(SUM(CAST(floor((sc*c[1])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v1,
        |    CAST(SUM(CAST(floor((sc*c[2])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v2,
        |    CAST(SUM(CAST(floor((sc*c[3])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v3,
        |    CAST(SUM(CAST(floor((sc*c[4])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v4,
        |    CAST(SUM(CAST(floor((sc*c[5])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v5,
        |    CAST(SUM(CAST(floor((sc*c[6])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v6,
        |    CAST(SUM(CAST(floor((sc*c[7])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v7,
        |    CAST(SUM(CAST(floor((sc*c[8])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v8,
        |    CAST(SUM(CAST(floor((sc*c[9])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v9,
        |    CAST(SUM(CAST(floor((sc*c[10])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v10,
        |    CAST(SUM(CAST(floor((sc*c[11])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v11,
        |    CAST(SUM(CAST(floor((sc*c[12])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v12,
        |    CAST(SUM(CAST(floor((sc*c[13])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v13,
        |    CAST(SUM(CAST(floor((sc*c[14])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v14,
        |    CAST(SUM(CAST(floor((sc*c[15])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v15,
        |    CAST(SUM(CAST(floor((sc*c[16])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v16,
        |    CAST(SUM(CAST(floor((sc*c[17])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v17,
        |    CAST(SUM(CAST(floor((sc*c[18])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v18,
        |    CAST(SUM(CAST(floor((sc*c[19])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v19,
        |    CAST(SUM(CAST(floor((sc*c[20])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v20,
        |    CAST(SUM(CAST(floor((sc*c[21])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v21,
        |    CAST(SUM(CAST(floor((sc*c[22])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v22,
        |    CAST(SUM(CAST(floor((sc*c[23])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v23,
        |    CAST(SUM(CAST(floor((sc*c[24])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v24,
        |    CAST(SUM(CAST(floor((sc*c[25])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v25,
        |    CAST(SUM(CAST(floor((sc*c[26])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v26,
        |    CAST(SUM(CAST(floor((sc*c[27])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v27,
        |    CAST(SUM(CAST(floor((sc*c[28])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v28,
        |    CAST(SUM(CAST(floor((sc*c[29])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v29,
        |    CAST(SUM(CAST(floor((sc*c[30])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v30,
        |    CAST(SUM(CAST(floor((sc*c[31])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v31,
        |    CAST(SUM(CAST(floor((sc*c[32])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v32,
        |    CAST(SUM(CAST(floor((sc*c[33])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v33,
        |    CAST(SUM(CAST(floor((sc*c[34])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v34,
        |    CAST(SUM(CAST(floor((sc*c[35])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v35,
        |    CAST(SUM(CAST(floor((sc*c[36])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v36,
        |    CAST(SUM(CAST(floor((sc*c[37])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v37,
        |    CAST(SUM(CAST(floor((sc*c[38])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v38,
        |    CAST(SUM(CAST(floor((sc*c[39])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v39,
        |    CAST(SUM(CAST(floor((sc*c[40])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v40,
        |    CAST(SUM(CAST(floor((sc*c[41])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v41,
        |    CAST(SUM(CAST(floor((sc*c[42])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v42,
        |    CAST(SUM(CAST(floor((sc*c[43])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v43,
        |    CAST(SUM(CAST(floor((sc*c[44])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v44,
        |    CAST(SUM(CAST(floor((sc*c[45])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v45,
        |    CAST(SUM(CAST(floor((sc*c[46])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v46,
        |    CAST(SUM(CAST(floor((sc*c[47])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v47,
        |    CAST(SUM(CAST(floor((sc*c[48])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v48,
        |    CAST(SUM(CAST(floor((sc*c[49])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v49,
        |    CAST(SUM(CAST(floor((sc*c[50])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v50,
        |    CAST(SUM(CAST(floor((sc*c[51])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v51,
        |    CAST(SUM(CAST(floor((sc*c[52])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v52,
        |    CAST(SUM(CAST(floor((sc*c[53])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v53,
        |    CAST(SUM(CAST(floor((sc*c[54])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v54,
        |    CAST(SUM(CAST(floor((sc*c[55])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v55,
        |    CAST(SUM(CAST(floor((sc*c[56])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v56,
        |    CAST(SUM(CAST(floor((sc*c[57])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v57,
        |    CAST(SUM(CAST(floor((sc*c[58])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v58,
        |    CAST(SUM(CAST(floor((sc*c[59])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v59,
        |    CAST(SUM(CAST(floor((sc*c[60])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v60,
        |    CAST(SUM(CAST(floor((sc*c[61])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v61,
        |    CAST(SUM(CAST(floor((sc*c[62])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v62,
        |    CAST(SUM(CAST(floor((sc*c[63])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v63,
        |    CAST(SUM(CAST(floor((sc*c[64])*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS v64,
        |    CAST(SUM(CAST(floor((sc*sc)*100000000+0.5)/100000000 AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS ss,
        |    COUNT(1) AS nn
        |  FROM s3
        |), va3 AS (
        |  SELECT [CAST(v1 AS DOUBLE), CAST(v2 AS DOUBLE), CAST(v3 AS DOUBLE), CAST(v4 AS DOUBLE), CAST(v5 AS DOUBLE), CAST(v6 AS DOUBLE), CAST(v7 AS DOUBLE), CAST(v8 AS DOUBLE), CAST(v9 AS DOUBLE), CAST(v10 AS DOUBLE), CAST(v11 AS DOUBLE), CAST(v12 AS DOUBLE), CAST(v13 AS DOUBLE), CAST(v14 AS DOUBLE), CAST(v15 AS DOUBLE), CAST(v16 AS DOUBLE), CAST(v17 AS DOUBLE), CAST(v18 AS DOUBLE), CAST(v19 AS DOUBLE), CAST(v20 AS DOUBLE), CAST(v21 AS DOUBLE), CAST(v22 AS DOUBLE), CAST(v23 AS DOUBLE), CAST(v24 AS DOUBLE), CAST(v25 AS DOUBLE), CAST(v26 AS DOUBLE), CAST(v27 AS DOUBLE), CAST(v28 AS DOUBLE), CAST(v29 AS DOUBLE), CAST(v30 AS DOUBLE), CAST(v31 AS DOUBLE), CAST(v32 AS DOUBLE), CAST(v33 AS DOUBLE), CAST(v34 AS DOUBLE), CAST(v35 AS DOUBLE), CAST(v36 AS DOUBLE), CAST(v37 AS DOUBLE), CAST(v38 AS DOUBLE), CAST(v39 AS DOUBLE), CAST(v40 AS DOUBLE), CAST(v41 AS DOUBLE), CAST(v42 AS DOUBLE), CAST(v43 AS DOUBLE), CAST(v44 AS DOUBLE), CAST(v45 AS DOUBLE), CAST(v46 AS DOUBLE), CAST(v47 AS DOUBLE), CAST(v48 AS DOUBLE), CAST(v49 AS DOUBLE), CAST(v50 AS DOUBLE), CAST(v51 AS DOUBLE), CAST(v52 AS DOUBLE), CAST(v53 AS DOUBLE), CAST(v54 AS DOUBLE), CAST(v55 AS DOUBLE), CAST(v56 AS DOUBLE), CAST(v57 AS DOUBLE), CAST(v58 AS DOUBLE), CAST(v59 AS DOUBLE), CAST(v60 AS DOUBLE), CAST(v61 AS DOUBLE), CAST(v62 AS DOUBLE), CAST(v63 AS DOUBLE), CAST(v64 AS DOUBLE)] AS v, CAST(ss AS DOUBLE)/nn AS lambda FROM g3
        |), t3 AS (
        |  SELECT list_transform(v, x -> CAST(CAST(floor((x / sqrt(list_sum(list_transform(v, y -> y * y))))*10000+0.5)/10000 AS DECIMAL(38,4)) AS DOUBLE)) AS t,
        |    lambda
        |  FROM va3
        |)
        |SELECT rnd,
        |  CAST(CAST(floor((lambda)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS lambda,
        |  CAST(CAST(floor((lambda/tv)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS evr,
        |  array_to_string(list_transform(t, x -> CAST(CAST(floor(CAST(x AS DOUBLE)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR)), ',') AS component
        |FROM (
        |  SELECT 1 AS rnd, lambda, t FROM t1
        |  UNION ALL SELECT 2 AS rnd, lambda, t FROM t2
        |  UNION ALL SELECT 3 AS rnd, lambda, t FROM t3
        |), tv
        |ORDER BY rnd NULLS FIRST, lambda NULLS FIRST, evr NULLS FIRST, component NULLS FIRST""".stripMargin,

    "vec_quant" ->
      """WITH b AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
        |s AS (
        |  SELECT vec_id, e,
        |    list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM b),
        |q AS (
        |  SELECT vec_id, e, scale,
        |    list_transform(e, x -> floor(x / scale + 0.5)) AS qv FROM s)
        |SELECT vec_id,
        |  CAST(CAST(floor((scale)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS scale_s,
        |  CAST(list_max(qv) AS BIGINT) AS q_max, CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(CAST(floor((sqrt(list_sum(list_transform(list_zip(e, qv), p -> (p[1] - p[2]*scale)*(p[1] - p[2]*scale))))
        |    / sqrt(list_sum(list_transform(e, x -> x*x))))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS rel_err
        |FROM q
        |ORDER BY vec_id NULLS FIRST, scale_s NULLS FIRST, q_max NULLS FIRST, q_min NULLS FIRST, rel_err NULLS FIRST""".stripMargin,

    "freq_cms" ->
      """WITH cnt AS (
        |  SELECT tok, COUNT(1) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |h AS (
        |  SELECT tok, n,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) % 1024 AS b1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('#' || tok, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) % 1024 AS b2
        |  FROM cnt),
        |r1 AS (SELECT b1 AS b, CAST(SUM(n) AS BIGINT) AS c1 FROM h GROUP BY 1),
        |r2 AS (SELECT b2 AS b, CAST(SUM(n) AS BIGINT) AS c2 FROM h GROUP BY 1),
        |top AS (SELECT tok, n, b1, b2 FROM h ORDER BY n DESC, tok ASC LIMIT 10)
        |SELECT tok, n, LEAST(c1, c2) AS est
        |FROM top JOIN r1 ON top.b1 = r1.b JOIN r2 ON top.b2 = r2.b
        |ORDER BY tok NULLS FIRST, n NULLS FIRST, est NULLS FIRST""".stripMargin,

    // SKT-3: the oracle is the PLAIN exact top-20 — the whole point of
    // the two-pass plan is that it matches this answer with a bounded
    // shuffle instead of a full-vocabulary one.
    "freq_topk_exact" ->
      """SELECT tok, n FROM (
        |  SELECT tok, COUNT(1) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok
        |  ORDER BY n DESC, tok ASC LIMIT 20
        |) ORDER BY tok NULLS FIRST, n NULLS FIRST""".stripMargin,

    "join_size_cms" ->
      """WITH cnt AS (
        |  SELECT l_partkey, COUNT(1) AS n FROM lineitem GROUP BY 1),
        |h AS (
        |  SELECT n,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(CAST(l_partkey AS VARCHAR), ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) % 1024 AS b1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split('#' || CAST(l_partkey AS VARCHAR), ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) % 1024 AS b2
        |  FROM cnt),
        |r1 AS (SELECT b1 AS b, CAST(SUM(n) AS BIGINT) AS c FROM h GROUP BY 1),
        |r2 AS (SELECT b2 AS b, CAST(SUM(n) AS BIGINT) AS c FROM h GROUP BY 1),
        |e1 AS (SELECT CAST(SUM(c*c) AS BIGINT) AS est1 FROM r1),
        |e2 AS (SELECT CAST(SUM(c*c) AS BIGINT) AS est2 FROM r2),
        |x AS (SELECT CAST(SUM(n*n) AS BIGINT) AS exact_size, COUNT(1) AS n_keys FROM cnt)
        |SELECT exact_size, LEAST(est1, est2) AS est_size, n_keys,
        |  CAST(CAST(floor((CAST(LEAST(est1, est2) AS DOUBLE) / CAST(exact_size AS DOUBLE))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS overcount
        |FROM x, e1, e2
        |ORDER BY exact_size NULLS FIRST, est_size NULLS FIRST, n_keys NULLS FIRST, overcount NULLS FIRST""".stripMargin,

    "smp_weighted" ->
      """WITH m AS (SELECT MAX(n_chars) AS wmax FROM documents),
        |f AS (
        |  SELECT lang, n_chars,
        |    (CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) AS DOUBLE) / 16777216.0)
        |      < (CAST(n_chars AS DOUBLE) / CAST(wmax AS DOUBLE)) AS kept
        |  FROM documents, m)
        |SELECT lang, COUNT(1) AS n_total,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(CAST(floor((CAST(SUM(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_w_all,
        |  CAST(CAST(floor((CAST(SUM(CASE WHEN kept THEN CAST(n_chars AS DECIMAL(38,4)) END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT))*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS avg_w_kept
        |FROM f GROUP BY lang
        |ORDER BY lang NULLS FIRST, n_total NULLS FIRST, n_kept NULLS FIRST, avg_w_all NULLS FIRST, avg_w_kept NULLS FIRST""".stripMargin,

    "smp_priority" ->
      """WITH p AS (
        |  SELECT lang, doc_id, n_chars,
        |    CAST(n_chars AS DOUBLE) /
        |      ((CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) AS DOUBLE) + 1.0) / 16777217.0) AS prio
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, n_chars, prio,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY prio DESC, doc_id ASC) AS INT) AS rk
        |  FROM p)
        |SELECT lang, rk, doc_id, n_chars,
        |  CAST(CAST(floor((prio)*10000+0.5)/10000 AS DECIMAL(38,4)) AS VARCHAR) AS priority
        |FROM r WHERE rk <= 5
        |ORDER BY lang NULLS FIRST, rk NULLS FIRST, doc_id NULLS FIRST, n_chars NULLS FIRST, priority NULLS FIRST""".stripMargin,

    "txt_norm" ->
      """WITH n AS (
        |  SELECT doc_id, lang,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, lang, md5(norm) AS norm_md5,
        |  CAST(length(norm) AS INT) AS norm_chars,
        |  CAST(len(regexp_extract_all(norm, '[a-z0-9]+')) AS INT) AS norm_tokens
        |FROM n
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, norm_md5 NULLS FIRST, norm_chars NULLS FIRST, norm_tokens NULLS FIRST""".stripMargin,

    "txt_pii" ->
      """WITH aug AS (
        |  SELECT doc_id, lang,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ph ' ||
        |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-' ||
        |      lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents),
        |red AS (
        |  SELECT doc_id, lang, t,
        |    regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS r
        |  FROM aug)
        |SELECT doc_id, lang,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS INT) AS n_phone,
        |  md5(r) AS redacted_md5,
        |  CAST(length(t) - length(r) AS INT) AS chars_removed
        |FROM red
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, n_email NULLS FIRST, n_phone NULLS FIRST, redacted_md5 NULLS FIRST, chars_removed NULLS FIRST""".stripMargin,

    "txt_mask" ->
      """WITH aug AS (
        |  SELECT doc_id, lang,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |      '@example.com and again user' || CAST(doc_id AS VARCHAR) ||
        |      '@example.com ph ' ||
        |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-' ||
        |      lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, lang, string_split(t, ' ') AS ts FROM aug),
        |m AS (
        |  SELECT doc_id, lang,
        |    list_filter(ts, x -> regexp_matches(x, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$')
        |                      OR regexp_matches(x, '^\d{3}-\d{3}-\d{4}$')) AS pii,
        |    list_transform(ts, x ->
        |      CASE WHEN regexp_matches(x, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$')
        |             OR regexp_matches(x, '^\d{3}-\d{3}-\d{4}$')
        |           THEN '<PII:' || substr(md5(x), 1, 8) || '>' ELSE x END) AS masked
        |  FROM tok)
        |SELECT doc_id, lang,
        |  CAST(len(pii) AS INT) AS n_masked,
        |  CAST(len(list_distinct(pii)) AS INT) AS n_distinct_pii,
        |  md5(array_to_string(masked, ' ')) AS masked_md5
        |FROM m
        |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST, n_masked NULLS FIRST, n_distinct_pii NULLS FIRST, masked_md5 NULLS FIRST""".stripMargin
  )

  /** Every [[graft.core.Warehouse.once]] dataset this module owns, as
    * (name, forcing thunk) — Bench's untimed pre-pass runs these so board
    * samples measure steady state only (r13 verdict task 3: `lr_eval`
    * absorbed the gram+model build because it happened to run first). */
  val prebuilds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "gram_buckets" -> ((s, d) => { gramBucketsOnce(s, d); () }),
    "lr_model" -> ((s, d) => { lrTrain(s, d); () }),
    "ivf_centroids" -> ((s, d) => { centroidsOnce(s, d); () }),
    "pq_book_xq" -> ((s, d) => { pqBookOnce(s, d); () }),
    "ivf_centroids_sample" -> ((s, d) => { centroidsSampleOnce(s, d); () }),
    "pq_book_xq_sample" -> ((s, d) => { pqBookSampleOnce(s, d); () }),
    "ivf_centroids_cap" -> ((s, d) => { centroidsCapOnce(s, d); () }),
    "pq_book_xq_cap" -> ((s, d) => { pqBookCapOnce(s, d); () }),
    "pq_book_res" -> ((s, d) => { resBookOnce(s, d); () }),
    "ivfadc_stream" -> ((s, d) => { ivfPqStreamStoreRoot(s, d); () }),
    "ivfsq_stream" -> ((s, d) => { ivfSqStreamStoreRoot(s, d); () }))
}
