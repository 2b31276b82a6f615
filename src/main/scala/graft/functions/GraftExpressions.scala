package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §2.6/§4.3) — the codegen'd
  * replacements for the interpreted higher-order-function hot loops in the
  * LLM-pipeline queries.
  *
  * Spark's lambda HOFs (`aggregate`/`transform`/`zip_with`) are evaluated
  * interpreted, one boxed lambda call per element, and they break the
  * surrounding whole-stage-codegen span. A per-token string hash or a
  * per-pair 64-d dot product sits in the innermost loop of the dedup /
  * similarity operators, so at 100 TB the interpreter overhead dominates the
  * scan. These expressions keep identical semantics (bit-identical doubles,
  * same long hashes — asserted in ExpressionSpec) but compile to a single
  * static Java call inside the generated code.
  */
object GraftHashImpl {
  final val P: Long = 2147483647L // 2^31-1, Mersenne prime

  /** Portable 31-polynomial string hash: fold code points as
    * (acc*31 + cp) mod P. Exactly `aggregate(split(s,""), 0L,
    * (acc,c) -> (acc*31 + ascii(c)) % P)` (the round-2 HOF) and DuckDB's
    * `list_reduce(list_prepend(0, list_transform(string_split(s,''),
    * c -> ascii(c))), (acc,c) -> (acc*31+c) % 2147483647)`. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

object GraftVecImpl {
  /** In-order dot product — IEEE-identical to the HOF formulation
    * `aggregate(zip_with(a,b,(x,y)->x*y), 0.0, (s,x)->s+x)` (left fold,
    * ascending index). Arrays must be equal length (embeddings are fixed-d);
    * the shorter length wins defensively. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** cosine(a,b) = dot/(|a|·|b|), all three sums in ascending index order so
    * the result is bit-identical to the composed HOF/oracle formulation. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `graft_poly_hash(str)` → long: codegen'd portable polynomial hash. */
case class PolyHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    GraftHashImpl.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHashImpl.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** `graft_dot(array<double>, array<double>)` → double: codegen'd dot product. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVecImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVecImpl.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `graft_cosine(array<double>, array<double>)` → double (SURVEY §4.3). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVecImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVecImpl.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object GraftMortonImpl {
  /** 32-bit Morton (Z-order) code: interleave the low 16 bits of x and y
    * (x in even positions). The standard bit-spreading magic constants
    * (each step doubles the gaps) — branch-free, codegen-friendly. */
  def morton(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xffffL
      v = (v | (v << 8)) & 0x00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0fL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }
}

/** `graft_morton(x, y)` → long: Z-order curve key over two 16-bit dims.
  *
  * The multi-dimensional clustering key (SURVEY §4.4.9): sorting a write by
  * `morton(bucket(dimA), bucket(dimB))` gives every output file a NARROW
  * range in BOTH dimensions simultaneously — one sort order that serves
  * min/max (row-group / file) skipping for filters on either dimension,
  * where a lexicographic sort serves only its leading column. */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_morton"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftMortonImpl.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftMortonImpl.morton($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}

object GraftEntropyImpl {
  /** Shannon entropy of the whitespace-unigram distribution of `s`,
    * bit-identical to the HOF formulation
    * `aggregate(array_sort(array_distinct(split(s,' '))), 0.0,
    *   (acc,w) -> acc - p(w)*ln(p(w)))` and to the DuckDB sorted
    * list_reduce twin: terms are summed in SORTED distinct-word order
    * (float addition doesn't commute — one declared order, §5.3), each
    * term computed as the same (double)count/(double)n and Math.log.
    * TreeMap's String order equals UTF8String binary order on ASCII
    * corpora (they diverge only at supplementary code points); the
    * oracle corpus is ASCII and ExpressionSpec asserts the parity on
    * every document. */
  def entropy(s: UTF8String): Double = {
    val words = s.toString.split(" ", -1)
    val n = words.length.toDouble
    val counts = new java.util.TreeMap[String, Integer]()
    var i = 0
    while (i < words.length) {
      val c = counts.get(words(i))
      counts.put(words(i), if (c == null) 1 else c + 1)
      i += 1
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      // StrictMath, not Math: Spark's `log` expression evaluates via
      // StrictMath (platform-stable fdlibm), and the HotSpot Math.log
      // intrinsic differs from it by 1 ulp on ~5% of these inputs —
      // enough to break bit-parity with the HOF/oracle formulation.
      acc -= p * StrictMath.log(p)
    }
    acc
  }
}

/** `graft_word_entropy(str)` → double: codegen'd unigram Shannon entropy
  * (TXT-8). One hash+sort pass per row replaces the interpreted
  * aggregate-with-nested-filter HOF (O(distinct×tokens) boxed lambda calls
  * per doc — measured 0.8 ms/doc at 30 words, the whole query's cost). */
case class WordEntropy(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_word_entropy"
  override protected def nullSafeEval(input: Any): Any =
    GraftEntropyImpl.entropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftEntropyImpl.entropy($c)")
  override protected def withNewChildInternal(newChild: Expression): WordEntropy =
    copy(child = newChild)
}

/** One-pass distinct word-bigram shingles (r14 optimization round).
  * Bit-identical to the HOF spelling every dedup-ladder query previously
  * inlined —
  *   array_distinct(zip_with(slice(ws,1,n−1), slice(ws,2,n−1),
  *     concat_ws(" ", a, b)))   with ws = split(text, " ")
  * — including Spark split's keep-empty-strings semantics (limit −1; the
  * single-space pattern has no regex metacharacters, so a byte scan for
  * 0x20 is the same split — a space byte cannot occur inside a UTF-8
  * multibyte sequence) and array_distinct's first-occurrence order
  * (LinkedHashSet), which positional consumers (winnowing) depend on.
  * Why an Expression: the HOF chain evaluates interpreted per element
  * with two array slices + a lambda invocation per bigram and re-splits
  * the text for each subexpression; this is one allocation-lean pass
  * that whole-stage codegen calls directly — the WordEntropy/
  * GearBoundaries precedent (measured: the full-corpus shingle pass at
  * sf0.1 drops ~1.1 s → ~0.3 s; every minhash/ngram/winnow/segment
  * query pays this leg 1-2×). */
object GraftShinglesImpl {
  private val Space = UTF8String.fromString(" ")
  def bigrams(s: UTF8String): ArrayData = {
    // Same array as StringSplit(text, " ", -1): split on every single
    // space, empties (consecutive/leading/trailing spaces) kept.
    val words = s.split(Space, -1)
    if (words.length < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < words.length - 1) {
      seen.add(UTF8String.concatWs(Space, words(i), words(i + 1)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }
}

/** `graft_word_bigrams(str)` → array<string>: codegen'd distinct
  * word-bigram shingles (see [[GraftShinglesImpl.bigrams]]). */
case class WordBigrams(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_word_bigrams"
  override protected def nullSafeEval(input: Any): Any =
    GraftShinglesImpl.bigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftShinglesImpl.bigrams($c)")
  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

/** `graft_bloom_contains(long)` → boolean: membership probe against a
  * pre-built Bloom filter shipped with the expression.
  *
  * The scale lever for filter-by-set when the set is too big to broadcast
  * as a relation but its bitmap fits anywhere (~1.2 bytes/item at 1% fpp —
  * a 100M-shingle benchmark suite is ~120 MB of postings but a ~115 MB
  * bitmap COMPRESSES the join: the probe side never shuffles non-members).
  * No false negatives, so an exact verify step downstream restores exact
  * semantics; false positives only cost wasted verify work.
  *
  * The filter is held as its serialized form (`bytes`) so the expression
  * tree stays serializable regardless of sketch implementation details;
  * each JVM deserializes once (transient lazy). Codegen pins the
  * deserialized filter in the references array — one virtual call per row,
  * no per-row allocation (probes are `mightContainLong`). Not registered
  * for SQL: the filter bytes are runtime state, not a literal a SQL text
  * could carry. */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_contains"
  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object GraftDigitImpl {
  /** First significant digit of a non-negative ≤2-decimal measure.
    *
    * Works on CENTS: `round(v·100)` is exact for 2-decimal doubles (the
    * product lands within 1 ulp of an integer), then a pure integer-
    * division walk — no float division chain whose repeated /10 rounding
    * can misclassify values adjacent to a power of ten, and no
    * decimal→string→regexp round trip (what the interpreted dq_benford
    * path paid per row). 0 for non-positive input (no significant digit —
    * the caller's spine join drops it).
    *
    * Domain = the CENTS-GRAIN DECIMAL(18,2) measure domain the DuckDB twin
    * itself is bound to, both edges deliberate:
    *  - |v| < 10¹⁶: beyond it the twin's DECIMAL(18,2) cast overflows and
    *    this side's cents would saturate `Math.round` (first divergence at
    *    ~9.2·10¹⁶); inside it v·100 < 10¹⁸ is round-exact in a long.
    *  - 0 < v < 0.005 yields 0 ("no significant digit at cent grain") —
    *    identical to the twin's '0.00' rendering, NOT the sub-cent digit.
    * Inputs with >2 decimals likewise truncate at the cent; the §5.3
    * measure discipline already restricts hashed measures to ≤2 decimals. */
  def firstSigDigit(v: Double): Int = {
    var c = Math.round(v * 100.0)
    if (c <= 0) return 0
    while (c >= 10) c /= 10
    c.toInt
  }
}

/** `graft_first_digit(double)` → int: codegen'd Benford digit extraction
  * (see [[GraftDigitImpl.firstSigDigit]]). */
case class FirstSigDigit(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_first_digit"
  override protected def nullSafeEval(input: Any): Any =
    GraftDigitImpl.firstSigDigit(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftDigitImpl.firstSigDigit($c)")
  override protected def withNewChildInternal(newChild: Expression): FirstSigDigit =
    copy(child = newChild)
}

object GraftJaroImpl {
  /** Jaro–Winkler similarity, semantics pinned to DuckDB's native
    * `jaro_winkler_similarity` (the oracle twin) and verified against it
    * on 6000 randomized + realistic-name cases to <1e-12:
    *  - either side empty → 0.0 (DuckDB returns 0 even for ''==''),
    *  - Jaro = (m/|a| + m/|b| + (m−t)/m)/3 with the standard
    *    ⌊max/2⌋−1 match window and greedy left-to-right matching,
    *    transpositions t = half the out-of-order matched positions,
    *  - Winkler boost only above 0.7: j + ℓ·0.1·(1−j), ℓ = common
    *    prefix capped at 4.
    * Operates on UTF-16 code units; parity with DuckDB holds on ASCII
    * (the §5.3 hashed-string domain — same caveat as WordEntropy). The
    * scratch arrays are per-call but length-bounded by the operand; for
    * the entity-name domains this targets (≤ ~64 chars) they live and
    * die in the TLAB. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (j <= 0.7) return j
    var pre = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (pre < pmax && s1.charAt(pre) == s2.charAt(pre)) pre += 1
    j + pre * 0.1 * (1.0 - j)
  }
}

/** `graft_jaro_winkler(str, str)` → double: codegen'd Jaro–Winkler
  * similarity (see [[GraftJaroImpl.jaroWinkler]]) — the measure for the
  * entity-resolution rung between exact match and edit distance: tolerant
  * of transpositions and suffix noise, prefix-weighted the way human
  * naming errors are distributed. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftJaroImpl.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftJaroImpl.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object GraftGearImpl {
  final val Mask60: Long = (1L << 60) - 1
  /** The 256-entry gear table: G(b) = the first 15 hex chars of
    * md5(decimal string of b) as a 60-bit long — exactly what DuckDB's
    * `CAST(concat('0x', substr(md5(CAST(b AS VARCHAR)), 1, 15)) AS
    * BIGINT)` parses, so both engines draw from the same deterministic
    * table (the portable-hash discipline of [[GraftHashImpl.polyHash]]).
    * Derived once at class load; no RNG anywhere. */
  final val G: Array[Long] = Array.tabulate(256) { b =>
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(String.valueOf(b).getBytes("UTF-8"))
    (BigInt(1, md.take(8)) >> 4).toLong
  }

  /** Content-defined chunk boundaries by GEAR rolling hash (FastCDC
    * lineage, public): one O(1) table-lookup + shift + add per character
    * — h := ((h << 1) + G(cp mod 256)) mod 2^60, boundary after
    * position i iff (h AND 15) = 0 (mean chunk 16 chars, DDP-CDC's
    * rate) and i is not the last character (no empty tail chunk,
    * ddp_cdc's convention). Positions are 1-based code-point indexes.
    *
    * Shift-resistance identity the oracle exploits: because the update
    * is a left shift, h's LOW 4 BITS depend on only the LAST 4
    * characters — (Σ_{j=0..3} 2^j·G(c_{i−j})) mod 16 — so the boundary
    * predicate is POSITIONALLY computable (the DuckDB twin's per-index
    * lambda) while this one-pass loop pays O(1)/byte, vs the md5-window
    * formulation's full digest per position (the ddp_cdc row's declared
    * production swap). Identical substrings therefore align at
    * identical relative boundaries once 4 characters deep — the CDC
    * property itself. */
  def boundaries(s: UTF8String): ArrayData = {
    val str = s.toString
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var i = 0
    var pos = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      pos += 1
      h = ((h << 1) + G(cp & 0xff)) & Mask60
      i += Character.charCount(cp)
      // i is already past this code point, so i < length ⟺ not the last
      // position — no codePointCount pre-pass (review r13: the pre-pass
      // decoded every code point a second time in the loop whose whole
      // point is the per-byte constant).
      if ((h & 15L) == 0L && i < str.length) cuts += pos
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(cuts.toArray)
  }
}

/** `graft_gear_cuts(str)` → array<int>: codegen'd gear-hash
  * content-defined chunk boundaries (see [[GraftGearImpl.boundaries]]). */
case class GearBoundaries(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_gear_cuts"
  override protected def nullSafeEval(input: Any): Any =
    GraftGearImpl.boundaries(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftGearImpl.boundaries($c)")
  override protected def withNewChildInternal(newChild: Expression): GearBoundaries =
    copy(child = newChild)
}

/** Column-level API for the custom expressions. */
object GraftFunctions {
  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  def poly_hash(s: Column): Column = c(PolyHash(e(s)))
  def dot_product(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def cosine_similarity(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def morton_code(x: Column, y: Column): Column = c(MortonCode(e(x), e(y)))
  def bloom_might_contain(x: Column, filterBytes: Array[Byte]): Column =
    c(BloomMightContain(e(x), filterBytes))
  def word_entropy(s: Column): Column = c(WordEntropy(e(s)))
  def first_sig_digit(v: Column): Column = c(FirstSigDigit(e(v)))
  def jaro_winkler(a: Column, b: Column): Column = c(JaroWinkler(e(a), e(b)))
  def gear_cuts(s: Column): Column = c(GearBoundaries(e(s)))
  def word_bigrams(s: Column): Column = c(WordBigrams(e(s)))
}

/** SQL registration via SparkSessionExtensions (the declared extension
  * mechanism): `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)` makes
  * `graft_poly_hash` / `graft_dot` / `graft_cosine` available to SQL text. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator chain (graft.plans): custom logical leaf + pushdown
    // rule + planner strategy + physical exec.
    ext.injectOptimizerRule(_ => new graft.plans.PushFilterIntoGraftSequence)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => PolyHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_morton"),
      new ExpressionInfo(classOf[MortonCode].getName, "graft_morton"),
      (args: Seq[Expression]) => MortonCode(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_word_entropy"),
      new ExpressionInfo(classOf[WordEntropy].getName, "graft_word_entropy"),
      (args: Seq[Expression]) => WordEntropy(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_first_digit"),
      new ExpressionInfo(classOf[FirstSigDigit].getName, "graft_first_digit"),
      (args: Seq[Expression]) => FirstSigDigit(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (args: Seq[Expression]) => JaroWinkler(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_gear_cuts"),
      new ExpressionInfo(classOf[GearBoundaries].getName, "graft_gear_cuts"),
      (args: Seq[Expression]) => GearBoundaries(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_word_bigrams"),
      new ExpressionInfo(classOf[WordBigrams].getName, "graft_word_bigrams"),
      (args: Seq[Expression]) => WordBigrams(args.head)))
  }
}
