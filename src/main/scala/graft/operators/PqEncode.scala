package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The ONE product-quantizer train/encode core behind every PQ surface —
  * `vec_pq`'s sign-seeded scheme plus per-subspace Lloyd refinement
  * (r11), shared by the direct (`ivf_pq`) and residual (`ivf_pq_res`)
  * IVFADC pipelines and by the streaming encode (`StreamOps.encodePq`),
  * so a codebook trained by the batch job and the codes assigned to
  * streamed arrivals cannot drift. (`vec_pq` itself stays the gated
  * audit of the deterministic SEED step.)
  *
  * Input is the LONG decimal form: (vec_id, sp ∈ 1..8, p ∈ 1..8,
  * <v> DECIMAL(18,4)) — one row per vector × dimension, subspace-split.
  * Decimal discipline per PQ-1: (18,4) operands keep the squared-diff /
  * product terms at exact scale 8 under Spark's 38-digit cap.
  *
  * ENCODE ARITHMETIC (r14 optimization round): the nearest-codeword
  * argmin runs on SCALED INT64 (the dec4 grid ×10⁴ — sqLongForm's
  * representation), not on DECIMAL objects. The two are provably
  * identical here: operands sit on the dec4 grid with |x| < 10¹⁴, so
  * dd = x−c is exact in both; dd² ≤ (2·10⁸)² = 4·10¹⁶ and the 8-term
  * sum ≤ 3.2·10¹⁷ < 2⁶³ never overflows a long, and an exact integer
  * comparison is an exact integer comparison in either representation.
  * What the swap buys is SHAPE, not just constant factor: the argmin is
  * one whole-stage-codegen'd per-row fold over the broadcast book
  * (aggregate/zip_with HOFs on primitive longs) instead of the previous
  * 16×-fanout join + two hash-aggregate exchanges over a
  * rows×8×16-candidate DECIMAL relation — the encode leg of every PQ
  * query now shuffles ZERO bytes (guide §2.3/§2.4: remove the exchange,
  * and never ship 128 scored candidate rows per vector when 8 code
  * bytes is the answer). Measured at sf0.1 (this round's board machine):
  * ivf_pq 3.3→1.9 s, ivf_pq_eval steady 3.0→2.1 s; plan Exchanges
  * 48→40 on ivf_pq (the encode pair + its AQE reads).
  */
object PqEncode {
  /** Sign-bucket-seeded, Lloyd-REFINED codebook: each (vec, sp) pairs
    * into the sign cell of its first four positions, the seed codeword is
    * the per-(sp, cell, p) dec4 mean (`vec_pq`'s deterministic one-step
    * scheme, which PQ-1 gates as the seeding audit), then `refineRounds`
    * per-subspace Lloyd rounds re-assign every (vec, sp) to its nearest
    * codeword and recompute the dec4 means — kmeans_iter's certified
    * update discipline applied inside each subspace. r11 measurement
    * (sf0.01, the prototype the flip shipped on): IVF-PQ recall@3 0.467
    * with the raw seed book → 0.667 after two refinements at identical
    * probe/shortlist budgets. Codeword ids are inherited from the seeds
    * (a codeword that loses every member drops out — identical group-by
    * semantics on both engines); each round is one broadcast-book encode
    * + one map-side-combined aggregate over the long relation, linear at
    * any corpus size. ≤ 8·16·8 = 1024 rows throughout. */
  def codebook(long: DataFrame, v: String, refineRounds: Int = 2): DataFrame = {
    val sign = long.groupBy(col("vec_id"), col("sp"))
      .agg(sum(when(col(v) > 0,
          when(col("p") === 1, 8).when(col("p") === 2, 4)
            .when(col("p") === 3, 2).when(col("p") === 4, 1).otherwise(0))
        .otherwise(0)).cast("int").as("cell"))
    val seed = long.join(sign, Seq("vec_id", "sp"))
      .groupBy(col("sp"), col("cell"), col("p"))
      .agg(graft.core.Tables.dec4(
          sum(col(v)).cast("double") / count(lit(1)))
        .cast(DecimalType(18, 4)).as("c"))
    (1 to refineRounds).foldLeft(seed) { (book, _) =>
      long.join(encode(long, book, v).withColumnRenamed("cw", "cell"),
          Seq("vec_id", "sp"))
        .groupBy(col("sp"), col("cell"), col("p"))
        .agg(graft.core.Tables.dec4(
            sum(col(v)).cast("double") / count(lit(1)))
          .cast(DecimalType(18, 4)).as("c"))
    }
  }

  /** The dec4-grid scaled-int64 image of an embedding array — identical
    * by construction to `Tables.dec4(x)`'s unscaled value (and to
    * `sqLongForm`'s xi): floor(x·10⁴ + 0.5). */
  def scaledLongs(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("long"))

  /** The codebook pivoted to ONE broadcastable row:
    * sps = array<struct<sp:int, cells: array<struct<cell:int,
    * cl: array<long>[8]>>>>, cells sorted by cell id ascending (the
    * argmin tie-break order), cl aligned by p ascending, codewords on
    * the same ×10⁴ scaled-long grid as [[scaledLongs]] (exact: c is
    * DECIMAL(18,4), so c·10⁴ is integral). ≤ 8·16·8 values total —
    * strictly index metadata. */
  private def bookRow(book: DataFrame): DataFrame =
    book
      .groupBy(col("sp"), col("cell"))
      .agg(array_sort(collect_list(struct(col("p"),
        (col("c") * 10000).cast("long").as("cl")))).as("pcs"))
      .select(col("sp"), col("cell"),
        transform(col("pcs"), q => q.getField("cl")).as("cl"))
      .groupBy(col("sp"))
      .agg(array_sort(collect_list(
        struct(col("cell").cast("int").as("cell"), col("cl")))).as("cells"))
      .groupBy()
      .agg(array_sort(collect_list(
        struct(col("sp").cast("int").as("sp"), col("cells")))).as("sps"))

  /** Nearest-codeword argmin over a subspace-array relation
    * `sub` = (vec_id, sp, varr: array<long>[8] on the scaled grid):
    * one per-row fold over the broadcast book — dist strictly-less keeps
    * the FIRST (smallest cell id) codeword on ties, which is exactly
    * min(struct(dist, cell)). Zero exchanges; every arithmetic op is an
    * exact primitive-long op inside whole-stage codegen.
    *
    * Alignment contract (holds by construction for every caller): varr
    * and each codeword's cl both carry ALL 8 positions of their
    * subspace in p-ascending order. */
  private def encodeSub(sub: DataFrame, book: DataFrame): DataFrame = {
    val init = struct(lit(Long.MaxValue).as("d"), lit(Int.MaxValue).as("cw"))
    sub.crossJoin(broadcast(bookRow(book)))
      .select(col("vec_id"), col("sp"),
        aggregate(
          element_at(filter(col("sps"),
            e => e.getField("sp") === col("sp").cast("int")), 1)
            .getField("cells"),
          init,
          (acc, b) => {
            val dist = aggregate(zip_with(col("varr"), b.getField("cl"),
              (x, c) => (x - c) * (x - c)), lit(0L), (s, t) => s + t)
            when(dist < acc.getField("d"),
              struct(dist.as("d"), b.getField("cell").as("cw")))
              .otherwise(acc)
          },
          acc => acc.getField("cw")).as("cw"))
  }

  /** Nearest-codeword assignment from the LONG decimal form (the
    * codebook-refinement and residual-training entry point): per
    * (vec_id, sp) the cell minimizing the exact squared distance to the
    * codeword (ties → smaller cell). Returns (vec_id, sp, cw).
    * One map-side-combined collect_list reshapes the 8 p-rows of each
    * (vec, sp) into the subspace array, then [[encodeSub]]'s
    * exchange-free fold replaces the previous 16×-fanout candidate
    * join + double hash aggregate. Result-identical (see the arithmetic
    * note in the object scaladoc). */
  def encode(long: DataFrame, book: DataFrame, v: String): DataFrame = {
    val sub = long
      .groupBy(col("vec_id"), col("sp"))
      .agg(array_sort(collect_list(struct(col("p"),
        (col(v) * 10000).cast("long").as("xl")))).as("ps"))
      .select(col("vec_id"), col("sp"),
        transform(col("ps"), q => q.getField("xl")).as("varr"))
    encodeSub(sub, book)
  }

  /** Nearest-codeword assignment straight off the WIDE embedding row —
    * the per-call encode leg of the query pipelines: vecs =
    * (vec_id, embedding). No long-form explode, no reshape aggregate,
    * no exchange at all: slice the scaled-long array into its 8
    * subspaces per row and fold each against the broadcast book.
    * Bit-identical to `encode(toLong(vecs), book, "xq")` — the dec4
    * grid is applied by [[scaledLongs]] exactly as toLong applies it. */
  def encodeWide(vecs: DataFrame, book: DataFrame): DataFrame =
    encodeScaled(vecs.select(col("vec_id"),
      scaledLongs(col("embedding")).as("xl")), book)

  /** [[encodeWide]] against pre-scaled longs (vec_id, xl: array<long>
    * [64]) — the residual pipeline enters here with xl already centered
    * (xq − μ on the scaled grid, an exact long subtraction). */
  def encodeScaled(scaled: DataFrame, book: DataFrame): DataFrame = {
    val sub = scaled
      .select(col("vec_id"), posexplode(transform(sequence(lit(1), lit(8)),
        i => slice(col("xl"), (i - 1) * lit(8) + 1, lit(8)))).as(Seq("i", "varr")))
      .select(col("vec_id"), (col("i") + 1).cast("long").as("sp"), col("varr"))
    encodeSub(sub, book)
  }

  /** Wide embedding rows → the long decimal form the core operates on. */
  def toLong(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("p0", "xf")))
      .select(col("vec_id"),
        (call_function("div", col("p0"), lit(8)) + 1).as("sp"),
        (pmod(col("p0"), lit(8)) + 1).as("p"),
        graft.core.Tables.dec4(col("xf").cast("double"))
          .cast(DecimalType(18, 4)).as("xq"))
}
