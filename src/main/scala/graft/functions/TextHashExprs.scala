package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native signature kernels for the near-duplicate operators.
  *
  * The higher-order-function formulations (`transform`/`aggregate` lambdas)
  * are interpreted row-at-a-time by Catalyst — and because `CollapseProject`
  * inlines cheap aliases, a 128-permutation MinHash written as
  * `transform(sequence(0,127), i -> aggregate(hashes, ...))` re-evaluates
  * the shingle-hash array once per permutation: O(perms × shingles)
  * interpreted evals per row. These expressions do the same math in one
  * tight JVM loop per row — O(shingles) string hashes + O(perms × shingles)
  * long ops — and stay inside whole-stage codegen via `doGenCode`.
  *
  * String hashing is engine-portable ([[PortableHash]]): a per-codepoint
  * polynomial fold plus (for 64-bit needs) the splitmix64 finalizer — both
  * exactly reproducible in plain SQL integer arithmetic. That is what lets
  * the driver's DuckDB oracles mirror the LSH algorithms bit-for-bit
  * (signatures, buckets, band collisions) instead of settling for
  * rows-only checks: no xxhash64 on any signature path.
  */

/** Engine-portable string hashing shared by the signature kernels.
  *
  * Two primitives, both pure integer arithmetic reproducible in any SQL
  * engine (the DuckDB formulations live in `SparkEntry.oracleSql`):
  *
  *  - [[poly31Mod]]: Rabin–Karp fold `acc·31 + codepoint (mod m)` with
  *    `m < 2^31` — safe for universal-hash composition `(a·h + b) mod p`
  *    in 64-bit arithmetic.
  *  - [[mix64]]: the same fold in wrapping 64-bit arithmetic, then the
  *    splitmix64 finalizer (Steele et al., public domain) so short
  *    strings still populate all 64 bits — SimHash needs uniform bits.
  */
object PortableHash {
  def poly31Mod(s: org.apache.spark.unsafe.types.UTF8String, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = java.lang.Math.floorMod(h * 31L + cp, mod)
      i += Character.charCount(cp)
    }
    h
  }

  def mix64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var z = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      z = z * 31L + cp // wrapping = mod 2^64
      i += Character.charCount(cp)
    }
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
private[functions] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
}

/** `minhash_sig(shingles)` — `numHashes` universal-hash permutations
  * `(a·h + b) mod p` (p = 2^31−1, Mersenne) over portable
  * [[PortableHash.poly31Mod]] shingle hashes; element k of the result is
  * the minimum of permutation k over all shingles. Empty input ⇒
  * all-`Long.MaxValue` signature (matches the HOF `aggregate` seed).
  * The permutation coefficients are pure functions of `(numHashes, seed)`
  * ([[MinHashSig.coeffs]]) so an oracle can interpolate them as literals
  * and recompute the signature exactly in SQL. */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val P = MinHashSig.P
  private val (as, bs) = MinHashSig.coeffs(numHashes, seed)

  def compute(arr: ArrayData): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = PortableHash.poly31Mod(arr.getUTF8String(i), MinHashSig.HashMod)
      var j = 0
      while (j < numHashes) {
        val v = java.lang.Math.floorMod(as(j) * h + bs(j), P)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  /** Permutation modulus: 2^31−1 (Mersenne) keeps `a·h + b` within Long
    * range (`a, h < 2^31 ⇒ a·h < 2^62`). */
  val P: Long = (1L << 31) - 1

  /** Shingle-hash modulus for [[PortableHash.poly31Mod]] (< 2^31 so the
    * universal-hash products stay in Long range). */
  val HashMod: Long = 1000000007L

  /** The `(a, b)` universal-hash coefficient arrays for a given
    * `(numHashes, seed)` — deterministic, shared with SQL oracles. */
  def coeffs(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    (Array.fill(numHashes)(1 + rnd.nextLong().abs % (P - 1)),
      Array.fill(numHashes)(rnd.nextLong().abs % P))
  }
}

/** `word_shingles(words, n)` — distinct word n-gram shingles (space-joined,
  * first-occurrence order) of an array<string> column. Fewer than n words ⇒
  * empty array. The HOF equivalent
  * (`array_distinct(transform(sequence(...), i -> concat_ws(slice(...))))`)
  * allocates a sliced array + interpreted concat per shingle and an O(k²)
  * interpreted distinct; this is one pass with a hash set. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  def compute(arr: ArrayData): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val w = arr.numElements()
    if (w < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]((w - n + 1) * 2)
    var i = 0
    while (i <= w - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** `count_in_set(words, set)` — how many elements of an array<string>
  * column are members of a small compile-time vocabulary (stopword
  * counting, language-marker scoring). One hash-set probe per element in a
  * tight loop; the interpreted-HOF equivalent
  * `size(filter(ws, w -> w.isin(...)))` evaluates a lambda per element per
  * use site. Null elements don't count. */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.size * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  def compute(arr: ArrayData): Long = {
    var c = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInSet", this, classOf[CountInSet].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): CountInSet =
    copy(child = c)
}

/** `minhash_bands(sig, bands)` — LSH band hashes of a MinHash signature:
  * the signature is cut into `bands` equal slices and each slice is hashed
  * (xxhash64-chained over its elements, seeded by the band index, so equal
  * hashes imply equal band content up to hash collision). Kept as a
  * separate expression from [[MinHashSig]] so the signature is computed
  * once per row — an HOF `transform` lambda over the sig column would let
  * `CollapseProject` inline the signature into the lambda body and
  * re-evaluate it once per band. */
case class MinHashBands(child: Expression, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  def compute(sig: ArrayData): ArrayData = {
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var i = b * rows
      val end = i + rows
      while (i < end) { acc = XXH64.hashLong(sig.getLong(i), acc); i += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashBands", this, classOf[MinHashBands].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): MinHashBands =
    copy(child = c)
}

/** `poly_fingerprint(words)` — word-order-sensitive polynomial rolling
  * hash: `wordVal = fold(codepoints: acc·wordMul + cp) mod m`, then
  * `doc = fold(words: acc·docMul + wordVal) mod m`. Pure integer
  * arithmetic, bit-identical to the SQL formulation
  * (`ascii()` = leading codepoint; iteration is per character), but one
  * tight loop per row instead of an interpreted aggregate-in-aggregate
  * (which re-evaluated `substring`+`ascii` per character per row). */
case class PolyFingerprint(child: Expression, wordMul: Long, docMul: Long,
    mod: Long) extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  def compute(arr: ArrayData): Long = {
    var doc = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var w = 0L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        w = java.lang.Math.floorMod(w * wordMul + cp, mod)
        j += Character.charCount(cp)
      }
      doc = java.lang.Math.floorMod(doc * docMul + w, mod)
      i += 1
    }
    doc
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("polyFingerprint", this, classOf[PolyFingerprint].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): PolyFingerprint =
    copy(child = c)
}

/** `simhash64(words)` — 64-bit SimHash: per bit j, sum +1/−1 weighted by
  * bit j of each word's [[PortableHash.mix64]] hash; the sign of the sum
  * becomes signature bit j (set iff the sum is > 0). Empty input ⇒ 0 (all
  * sums non-positive, matching the HOF formulation's `when(c > 0, ...)`
  * bit rule). The portable word hash makes the whole signature — and so
  * the Hamming-distance pair set — recomputable in plain SQL. */
case class SimHash64(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = PortableHash.mix64(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** `mix64(str)` — the engine-portable [[PortableHash.mix64]] as a scalar
  * column: codepoint polynomial fold (wrapping 64-bit) + splitmix64
  * finalizer. Lets group-by / join keys over long derived strings (e.g.
  * the passage census's w-token windows) exchange 8 bytes instead of the
  * text while staying exactly recomputable in oracle SQL (same
  * HUGEINT/UBIGINT chain as the SimHash word hash). */
case class Mix64Str(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override def nullSafeEval(v: Any): Any =
    PortableHash.mix64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${PortableHash.getClass.getName.stripSuffix("$")}$$.MODULE$$.mix64($c)")

  override protected def withNewChildInternal(c: Expression): Mix64Str =
    copy(child = c)
}


/** Exact integer arithmetic for score formulas that must stay exact past
  * the 38-digit DECIMAL ceiling at corpus scale. */
object ExactArith {
  /** `floor(c_ab * 1000 * n^2 / (m * c_a * c_b))` in arbitrary-precision
    * integers. The DECIMAL(38,0) formulation overflows once
    * `c_ab * n^2 * 1000` passes 10^38 (n ≈ 4.6e11 tokens in the worst
    * case) — a 100 TB text corpus is ~2.5e13 tokens, so the collocation
    * lift must not ride 128-bit decimals. The RESULT always fits a long:
    * lift ≤ 1000·n (worst case c_ab = c_a = c_b = 1, m = n). Division is
    * only reached with a positive denominator (callers guard m = 0), and
    * truncation = floor since every term is non-negative. */
  def liftPermille(cab: Long, ca: Long, cb: Long, n: Long, m: Long): Long = {
    val num = BigInt(cab) * 1000 * BigInt(n) * BigInt(n)
    val den = BigInt(m) * BigInt(ca) * BigInt(cb)
    (num / den).toLong
  }
}

/** Collocation lift in permille over exact big-integer arithmetic (see
  * [[ExactArith.liftPermille]]). `n` (total tokens) and `m` (total
  * bigrams) are per-query scalars, so they ride as literal constructor
  * params; the three children are the per-row counts. Codegen'd — but the
  * row count here is the surviving (>= minCount) collocation table, which
  * is vocabulary-bounded, never corpus-sized. */
case class LiftPermille(cab: Expression, ca: Expression, cb: Expression,
    n: Long, m: Long) extends TernaryExpression {
  override def first: Expression = cab
  override def second: Expression = ca
  override def third: Expression = cb

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(cab, ca, cb).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three bigint counts, got " +
        Seq(cab, ca, cb).map(_.dataType.catalogString).mkString(", "))

  override def dataType: DataType = LongType
  override def prettyName: String = "lift_permille"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ExactArith.liftPermille(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], n, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ExactArith.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"$helper.liftPermille($a, $b, $c, ${n}L, ${m}L)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LiftPermille =
    copy(cab = f, ca = s, cb = t)
}
