package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local sketch computation (SURVEY §2.G dedup scale path).
  *
  * Both sketches are computed per document INSIDE the scan — no explode,
  * no shuffle of shingle rows. At 100 TB that is the difference between
  * shuffling ~100 shingle rows per document and shuffling b band keys
  * (MinHash) or one i64 (SimHash) per document. Hashing is xxhash64 over
  * the raw UTF8String bytes (no copies), through a static helper that
  * both interpreted eval and generated code call.
  */
object SketchImpl {

  def hashToken(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Universal-hash parameters for k permutations, fixed seed. */
  def minhashParams(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rng = new java.util.Random(seed)
    val a = Array.fill(k)(rng.nextLong() | 1L) // odd multipliers
    val b = Array.fill(k)(rng.nextLong())
    (a, b)
  }

  /** k-permutation MinHash signature of a token set. Empty/null-element
    * arrays yield Long.MaxValue slots (no shingles → degenerate sig). */
  def minhash(tokens: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val base = hashToken(tokens.getUTF8String(i), 0x9747b28cL)
        var j = 0
        while (j < k) {
          val h = a(j) * base + b(j)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct word n-gram shingle hashes, straight off the text bytes.
    *
    * `split(text, " ")` tokens are byte ranges of the original string
    * separated by single spaces, and `concat_ws(" ", slice(...))` joins
    * them back with single spaces — so every shingle IS a contiguous
    * byte range of the input (runs of spaces round-trip too: split
    * yields empty tokens, concat_ws re-emits the spaces). Hashing those
    * ranges in place (xxhash64, no string materialization, no per-
    * shingle allocation) replaces the interpreted HOF pipeline that
    * dominated dedup CPU (~2.6 ms/doc interpreted vs ~µs here). The
    * result is sorted-distinct; an in-doc hash collision (~|doc|²/2⁶⁴)
    * would merge two shingles, the same risk the hash-keyed join
    * downstream already accepts. */
  def shingleHashes(text: UTF8String, n: Int, seed: Long): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    // starts(t) = byte index where token t begins; sentinel at nTok is
    // len+1 so "start of next token minus one" is uniformly the end.
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(nTok) = len + 1
    val m = nTok - n + 1
    val hs = new Array[Long](m)
    t = 0
    while (t < m) {
      val s = starts(t)
      val e = starts(t + n) - 1
      hs(t) = XXH64.hashUnsafeBytes(base, off + s, e - s, seed)
      t += 1
    }
    java.util.Arrays.sort(hs)
    var out = 0
    i = 0
    while (i < m) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** Word n-gram shingle hashes in POSITION order (no sort, no dedup):
    * slot t is the hash of tokens [t, t+n-1], so `posexplode` yields
    * (token position, gram hash) pairs directly — the input the
    * duplicated-span dedup needs. Same zero-copy byte-range hashing as
    * [[shingleHashes]]. */
  def shingleHashesPositional(text: UTF8String, n: Int, seed: Long): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(nTok) = len + 1
    val m = nTok - n + 1
    val hs = new Array[Long](m)
    t = 0
    while (t < m) {
      val s = starts(t)
      val e = starts(t + n) - 1
      hs(t) = XXH64.hashUnsafeBytes(base, off + s, e - s, seed)
      t += 1
    }
    new GenericArrayData(hs)
  }

  private val PolyP1 = 1000000007L
  private val PolyP2 = 998244353L

  /** Rabin-style polynomial fingerprint of a byte range: fold of
    * (acc·31 + byte) mod 1e9+7 seeded 7 — the tx_fingerprint_roll
    * family, chosen because a SQL engine can replay it verbatim with
    * `list_reduce(list_prepend(7, chars), (acc,c) -> (acc*31+c) %
    * 1000000007)`. ~2-3× the cost of XXH64 per byte (one mod per
    * byte), still branch-free and allocation-free. */
  private def polyHash31(base: AnyRef, off: Long, len: Int): Long = {
    var h = 7L
    var i = 0
    while (i < len) {
      h = (h * 31 + (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xff)) % PolyP1
      i += 1
    }
    h
  }

  /** Both fingerprints in ONE byte walk (r14: the r13 shape called
    * polyHash31 then a base-131 sibling on the same bytes — two memory
    * passes, two loop overheads per shingle; fused, the bytes are read
    * once and both accumulators advance together, bit-identical to the
    * split form since the folds are independent). Returns the 60-bit
    * combined value h₁·2³⁰ | h₂ (base 131, mod 998244353 for h₂; both
    * moduli < 2³⁰). */
  private def polyHash60(base: AnyRef, off: Long, len: Int): Long = {
    var h1 = 7L
    var h2 = 7L
    var i = 0
    while (i < len) {
      val b = (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xff).toLong
      h1 = (h1 * 31 + b) % PolyP1
      h2 = (h2 * 131 + b) % PolyP2
      i += 1
    }
    (h1 << 30) | h2
  }

  /** Positional word n-gram POLYNOMIAL fingerprints — the
    * SQL-replayable sibling of [[shingleHashesPositional]] (mod-1e9+7
    * Rabin fold per span instead of XXH64), so a content-defined-
    * chunking surface built on it can be hash-checked against a DuckDB
    * CTE end to end (the dd_cdc_chunks r12 flip). Same zero-copy
    * tokenization; classic Rabin-fingerprint CDC rather than a
    * seeded-hash variant, so the boundary rule is itself textbook. */
  def shingleHashesPositionalPoly(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(nTok) = len + 1
    val m = nTok - n + 1
    val hs = new Array[Long](m)
    t = 0
    while (t < m) {
      val s = starts(t)
      val e = starts(t + n) - 1
      hs(t) = polyHash31(base, off + s, e - s)
      t += 1
    }
    new GenericArrayData(hs)
  }

  /** Distinct word n-gram 60-bit two-poly fingerprints (h₁·2³⁰ | h₂) —
    * the SQL-replayable sibling of [[shingleHashes]], feeding
    * [[simhash60FromHashes]] so a SimHash-sketched surface can be
    * hash-checked against a DuckDB CTE (the mm_phash / mm_scenecut r12
    * flips). Distinct by the COMBINED fingerprint value, exactly as the
    * XXH64 variant dedupes by hash — the SQL twin must dedupe the same
    * way (list_distinct over the computed values, not over shingle
    * strings) for collision behavior to replay. */
  def shingleHashesPoly(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(nTok) = len + 1
    val m = nTok - n + 1
    val hs = new Array[Long](m)
    t = 0
    while (t < m) {
      val s = starts(t)
      val e = starts(t + n) - 1
      hs(t) = polyHash60(base, off + s, e - s)
      t += 1
    }
    java.util.Arrays.sort(hs)
    var out = 0
    i = 0
    while (i < m) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** 60-bit SimHash over precomputed fingerprints: bit b of the sketch
    * is set iff a STRICT majority of fingerprints have bit b set
    * (2·ones > n — ties clear the bit; the SQL twin spells the same
    * predicate). Bits 60-63 are always clear. */
  def simhash60FromHashes(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val ones = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (2 * ones(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }

  /** 64-bit SimHash over a token array: per-token xxhash64, ±1 vote per
    * bit, sign of the vote sum. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i), 0x9747b28cL)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

trait TokenArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string>, got ${other.simpleString}")
  }
}

/** MinHash signature expression: array<string> → array<long> of length k. */
case class MinHashSignature(child: Expression, k: Int, seed: Long = 42L)
  extends UnaryExpression with TokenArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val (pa, pb) = SketchImpl.minhashParams(k, seed)

  override protected def nullSafeEval(input: Any): Any =
    SketchImpl.minhash(input.asInstanceOf[ArrayData], pa, pb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val params = ctx.addReferenceObj("mhparams", (pa, pb),
      "scala.Tuple2<long[], long[]>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchImpl.minhash($c, " +
      s"(long[]) $params._1(), (long[]) $params._2());")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Shingle-hash expression: string → sorted-distinct array<long> of
  * word n-gram hashes, computed zero-copy off the text bytes. */
case class ShingleHashes(child: Expression, n: Int, seed: Long = 42L)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    SketchImpl.shingleHashes(input.asInstanceOf[UTF8String], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchImpl.shingleHashes($c, $n, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Positional shingle-hash expression: string → array<long> of word
  * n-gram hashes in position order (slot t = hash of tokens
  * [t, t+n-1]), for span-level dedup. */
case class PositionalShingleHashes(child: Expression, n: Int, seed: Long = 42L)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes_pos"

  override protected def nullSafeEval(input: Any): Any =
    SketchImpl.shingleHashesPositional(input.asInstanceOf[UTF8String], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchImpl.shingleHashesPositional($c, $n, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression)
      : PositionalShingleHashes = copy(child = newChild)
}

/** Positional word n-gram POLY fingerprints (SQL-replayable Rabin
  * family): string → array<long>, slot t = mod-1e9+7 fold of tokens
  * [t, t+n-1]. */
case class PositionalShinglePolyHashes(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_poly_pos"

  override protected def nullSafeEval(input: Any): Any =
    SketchImpl.shingleHashesPositionalPoly(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchImpl.shingleHashesPositionalPoly($c, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : PositionalShinglePolyHashes = copy(child = newChild)
}

/** Distinct word n-gram 60-bit two-poly fingerprints (SQL-replayable):
  * string → sorted-distinct array<long>. */
case class ShinglePolyHashes(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_poly"

  override protected def nullSafeEval(input: Any): Any =
    SketchImpl.shingleHashesPoly(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchImpl.shingleHashesPoly($c, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : ShinglePolyHashes = copy(child = newChild)
}

trait HashArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint>, got ${other.simpleString}")
  }
}

/** 60-bit SimHash from precomputed two-poly fingerprints (strict-
  * majority bit rule; SQL-replayable): array<long> → long. */
case class SimHash60FromHashes(child: Expression)
  extends UnaryExpression with HashArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SketchImpl.simhash60FromHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchImpl.simhash60FromHashes($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash60FromHashes = copy(child = newChild)
}

/** Carter–Wegman MinHash permutation family over two-poly 60-bit
  * fingerprints — the SQL-replayable MinHash (the r13 flip of the
  * dd_minhash_lsh / dd_cluster_lsh / dd_lsh_eval / dd_incremental_lsh /
  * tx_source_jaccard / pipe_pairs family; st_cms's CW recipe applied to
  * signatures): slot j of a signature is min over shingle fingerprints
  * x of (A_j·x₀ + B_j·x₁ + C_j) mod p with p = 1e9+7 and x = x₁·2³⁰|x₀
  * — affine in the limb vector, so 2-universal by the textbook
  * argument, and every intermediate fits a signed 64-bit long
  * (A·x₀ < 2⁶⁰, three terms < 2⁶²). Empty fingerprint sets (docs under
  * n tokens) yield sentinel-p slots, mirroring the Long.MaxValue
  * degenerate signature of the xxhash64 family. The coefficients are
  * drawn once from a fixed seed, and the DuckDB oracle SQL is RENDERED
  * FROM THESE ARRAYS ([[sqlList]]) rather than hand-copied, so the two
  * sides cannot drift. */
object CwMinHash {
  val P = 1000000007L
  val MaxK = 64
  private val M30 = (1L << 30) - 1
  val (cwA, cwB, cwC) = {
    val rng = new java.util.Random(0x13c0ffeeL)
    // uniform on [1, p-1] via rejection sampling (r14 ADVICE fix: the
    // r13 range [1, 2^30-1] exceeded [1, p-1], so draws in (p, 2^30-1]
    // aliased mod p and a draw equal to p zeroed its slot's term —
    // a 2-universality weakening; engine and oracle stayed consistent
    // since the SQL lists render from these arrays, and they move
    // together under this fix too)
    def drawOne(): Long = {
      var v = 1L + rng.nextInt((1 << 30) - 1).toLong
      while (v >= P) v = 1L + rng.nextInt((1 << 30) - 1).toLong
      v
    }
    def draw() = Array.fill(MaxK)(drawOne())
    (draw(), draw(), draw())
  }

  /** First k coefficients as a DuckDB list literal (oracle SQL side). */
  def sqlList(xs: Array[Long], k: Int): String =
    xs.take(k).mkString("[", ", ", "]")

  def minhashCw(hashes: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(P)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val x = hashes.getLong(i)
      val x0 = x & M30
      val x1 = (x >>> 30) & M30
      var j = 0
      while (j < k) {
        val h = (cwA(j) * x0 + cwB(j) * x1 + cwC(j)) % P
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** CW MinHash signature from precomputed two-poly fingerprints
  * (SQL-replayable): array<long> → array<long> of length k, slots in
  * [0, p), sentinel p for empty inputs. */
case class MinHashCwFromHashes(child: Expression, k: Int)
  extends UnaryExpression with HashArrayInput {
  require(k >= 1 && k <= CwMinHash.MaxK,
    s"k must be in [1, ${CwMinHash.MaxK}]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_cw"

  override protected def nullSafeEval(input: Any): Any =
    CwMinHash.minhashCw(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CwMinHash.minhashCw($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashCwFromHashes =
    copy(child = newChild)
}

/** SimHash64 expression: array<string> → long. */
case class SimHash64(child: Expression)
  extends UnaryExpression with TokenArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SketchImpl.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchImpl.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
