package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable text/vector hashing kernels.
  *
  * Unlike the XXH64 kernels in [[TextHashExprs]], every function here is
  * defined purely in terms of MD5 and 64-bit integer arithmetic, so an
  * independent engine (the driver's DuckDB oracle, a remote federated
  * engine) can recompute identical values in plain SQL:
  *
  *   base_hash(s)  = CAST('0x' || substr(md5(s), 1, 14) AS BIGINT) % P
  *   hash32(s)     = CAST('0x' || substr(md5(s), 1, 8)  AS BIGINT)
  *   P             = 2147483647 (2^31 - 1)
  *   A(i)          = ((1103515245*(i+7) + 12345) % 1073741823) | 1
  *   B(i)          = (2027382749*(i+13) + 577) % P
  *   minhash_i     = min over shingles sh of (A(i)*base_hash(sh) + B(i)) % P
  *
  * All intermediates stay below 2^61, so the arithmetic neither overflows a
  * signed 64-bit integer nor needs modular tricks on either engine. The
  * single MD5 per shingle is the "one-hash MinHash" construction; the
  * A/B affine family supplies the k permutations.
  *
  * These are still native single-pass kernels (one compiled eval per row,
  * one MD5 per shingle/token) — the portability changes the hash function,
  * not the execution model, so MinHash/SimHash dedup stays viable at
  * 100 TB while every result is independently checkable.
  */
object PortableHashExprs {

  val P: Long = 2147483647L // 2^31 - 1
  private val HEX = "0123456789abcdef".toCharArray

  def affineA(i: Int): Long = ((1103515245L * (i + 7) + 12345L) % 1073741823L) | 1L
  def affineB(i: Int): Long = (2027382749L * (i + 13) + 577L) % P

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 7 digest bytes as an unsigned 56-bit int, mod P — equals DuckDB's
    * `CAST('0x' || substr(md5(s),1,14) AS BIGINT) % 2147483647`. */
  def baseHash(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
    h % P
  }

  /** First 4 digest bytes as an unsigned 32-bit int — equals DuckDB's
    * `CAST('0x' || substr(md5(s),1,8) AS BIGINT)`. */
  def hash32(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** Tokenization shared with the SQL oracles:
    * `[t FOR t IN string_split_regex(lower(text), '\s+') IF t <> '']` —
    * empty tokens are filtered instead of trimming, because Java `trim`
    * (strips all chars ≤ 0x20) and SQL `trim` (strips ' ' only) disagree on
    * leading tabs/newlines. */
  private[graft] def tokenize(text: UTF8String): Array[String] =
    text.toString.toLowerCase(Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** Word shingles of width min(w, n_tokens) — fewer tokens than w
    * degrade to one whole-text shingle (possibly "" for empty input),
    * never zero shingles. */
  private[functions] def shingles(toks: Array[String], width: Int): Array[String] = {
    val w = math.min(width, toks.length)
    val n = toks.length - w + 1
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  // ------------------------------------------------------- Winnowing
  // Schleimer, Wilkerson & Aiken 2003 ("Winnowing: Local Algorithms for
  // Document Fingerprinting" — the MOSS scheme): hash every char k-gram
  // of the whitespace-stripped lowercased text, slide a w-window over
  // the hash sequence, record each window's minimum (rightmost on ties).
  // The guarantee: any shared substring of length ≥ k+w-1 between two
  // docs yields at least one SHARED fingerprint, with expected density
  // 2/(w+1) — per-row work, so at 100 TB it is one scan projection and
  // the cross-doc match is an equi-join on (fp), never a text join.
  // The rightmost-argmin is non-decreasing as the window slides, so
  // "record when the selection changes" equals DISTINCT (pos, fp) —
  // which is what the SQL oracle computes from the window join.

  def winnowKernel(text: UTF8String, k: Int, w: Int): ArrayData = {
    val norm = text.toString.toLowerCase(Locale.ROOT).replaceAll("\\s+", "")
    val n = norm.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hash32(norm.substring(i, i + k)); i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val lastWindow = math.max(n - w, 0)
    var lastPos = -1
    var j = 0
    while (j <= lastWindow) {
      var best = j
      var t = j + 1
      val end = math.min(j + w, n)
      while (t < end) { if (hs(t) <= hs(best)) best = t; t += 1 }
      if (best != lastPos) {
        out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](best + 1, hs(best)))
        lastPos = best
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Winnowing fingerprint set of a text column:
    * array<struct<pos, fp>> (1-based k-gram position). */
  case class WinnowFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "winnow_fingerprints"

    override def nullSafeEval(input: Any): Any =
      winnowKernel(input.asInstanceOf[UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs.winnowKernel(" +
          s"$c, $k, $w);")
    override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
      copy(child = c)
  }

  // ----------------------------------------------------------- Bloom
  // Build- and probe-side Bloom hashing share THIS one static function,
  // so the two sides can never disagree on bit positions — that is the
  // no-false-negative guarantee that lets a Bloom screen act as an EXACT
  // prefilter (false positives are re-checked; misses are provably
  // clean). Positions are k double-hashed probes from the two md5
  // halves of the shingle string (the same portable digest the rest of
  // the dedup family uses).

  def bloomPositionsKernel(s: String, mBits: Int, k: Int): Array[Long] = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 8) { h1 = (h1 << 8) | (b(i) & 0xffL); i += 1 }
    while (i < 16) { h2 = (h2 << 8) | (b(i) & 0xffL); i += 1 }
    h2 |= 1L // odd step so the probe sequence walks all residues
    val out = new Array[Long](k)
    i = 0
    while (i < k) {
      out(i) = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2,
        mBits.toLong)
      i += 1
    }
    out
  }

  def bloomPositionsExprKernel(s: UTF8String, mBits: Int, k: Int): ArrayData =
    new GenericArrayData(
      bloomPositionsKernel(s.toString, mBits, k).asInstanceOf[Array[Long]])

  /** Per-row Bloom screen: distinct shingles of the text, count how many
    * hit the filter. Returns struct(n_shingles, n_candidates). */
  def bloomScreenKernel(text: UTF8String, bloom: Array[Byte], mBits: Int,
      k: Int, shingleWidth: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val sh = shingles(tokenize(text), shingleWidth)
    val seen = new java.util.HashSet[String](sh.length * 2)
    var cand = 0L
    var i = 0
    while (i < sh.length) {
      if (seen.add(sh(i))) {
        val pos = bloomPositionsKernel(sh(i), mBits, k)
        var hit = true
        var j = 0
        while (hit && j < k) {
          val p = pos(j)
          if ((bloom((p >>> 3).toInt) & (1 << (p & 7L).toInt)) == 0) hit = false
          j += 1
        }
        if (hit) cand += 1L
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](seen.size.toLong, cand))
  }

  /** Static kernel shared by the interpreted and generated paths. */
  def minhashKernel(text: UTF8String, as: Array[Long], bs: Array[Long],
      shingleWidth: Int): ArrayData = {
    val numHashes = as.length
    val sh = shingles(tokenize(text), shingleWidth)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < sh.length) {
      val h = baseHash(sh(s))
      var i = 0
      while (i < numHashes) {
        val v = (as(i) * h + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  /** Engine-portable MinHash signature (array<long> of `numHashes`).
    * Generates a static-kernel call instead of falling back to interpreted
    * eval, so the expression stays inside whole-stage codegen (no per-row
    * InternalRow boxing on the hot dedup path). */
  case class PortableMinHash(child: Expression, numHashes: Int, shingleWidth: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "portable_minhash"

    private lazy val as: Array[Long] = Array.tabulate(numHashes)(affineA)
    private lazy val bs: Array[Long] = Array.tabulate(numHashes)(affineB)

    override def nullSafeEval(input: Any): Any =
      minhashKernel(input.asInstanceOf[UTF8String], as, bs, shingleWidth)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs.minhashKernel(" +
          s"$c, $asRef, $bsRef, $shingleWidth);")
    }
    override protected def withNewChildInternal(c: Expression): PortableMinHash =
      copy(child = c)
  }

  def simhash32Kernel(text: UTF8String): Long = {
    val toks = tokenize(text)
    val counts = new Array[Int](32)
    var t = 0
    while (t < toks.length) {
      val h = hash32(toks(t))
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  /** Engine-portable 32-bit SimHash of the token multiset: bit j is set iff
    * strictly more tokens have bit j of hash32(token) set than clear. */
  case class PortableSimHash32(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "portable_simhash32"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(simhash32Kernel(input.asInstanceOf[UTF8String]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs.simhash32Kernel($c);")
    override protected def withNewChildInternal(c: Expression): PortableSimHash32 =
      copy(child = c)
  }

  /** Word shingles as a native single-pass kernel (array<string>) — the
    * exact shingle construction [[PortableMinHash]] hashes, exposed for the
    * verify stage's exact-Jaccard joins. The higher-order-function
    * formulation (transform over slices with concat_ws) evaluates an
    * interpreted lambda per (row × shingle); this is one compiled pass. */
  /** Bit positions a shingle string sets in an m-bit Bloom filter — the
    * BUILD side of the screen (explode + distinct + a driver collect
    * bounded by the benchmark's set-bit count, the same bounded-build
    * contract as a broadcast). */
  case class BloomPositions(child: Expression, mBits: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bloom_positions"

    override def nullSafeEval(input: Any): Any =
      bloomPositionsExprKernel(input.asInstanceOf[UTF8String], mBits, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs." +
          s"bloomPositionsExprKernel($c, $mBits, $k);")
    override protected def withNewChildInternal(c: Expression): BloomPositions =
      copy(child = c)
  }

  /** In-row Bloom screen of a text's distinct shingle set — the PROBE
    * side: struct(n_shingles, n_candidates). Shares
    * [[bloomPositionsKernel]] with the build, so a shingle present at
    * build time can never miss (zero false negatives). */
  case class BloomShingleScreen(child: Expression, bloom: Array[Byte],
      mBits: Int, k: Int, shingleWidth: Int)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_shingles", LongType, nullable = false),
      StructField("n_candidates", LongType, nullable = false)))
    override def prettyName: String = "bloom_screen"

    override def nullSafeEval(input: Any): Any =
      bloomScreenKernel(input.asInstanceOf[UTF8String], bloom, mBits, k,
        shingleWidth)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomBits", bloom, "byte[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs.bloomScreenKernel(" +
          s"$c, $ref, $mBits, $k, $shingleWidth);")
    }
    override protected def withNewChildInternal(c: Expression): BloomShingleScreen =
      copy(child = c)
  }

  case class PortableShingles(child: Expression, shingleWidth: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "portable_shingles"

    override def nullSafeEval(input: Any): Any =
      shinglesKernel(input.asInstanceOf[UTF8String], shingleWidth)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs.shinglesKernel(" +
          s"$c, $shingleWidth);")
    override protected def withNewChildInternal(c: Expression): PortableShingles =
      copy(child = c)
  }

  def shinglesKernel(text: UTF8String, shingleWidth: Int): ArrayData = {
    val sh = shingles(tokenize(text), shingleWidth)
    new GenericArrayData(sh.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  /** First 7 md5 digest bytes as an unsigned 56-bit long — equals both
    * DuckDB's `CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)` and Spark's
    * `conv(substring(md5(s), 1, 14), 16, 10) :: long` (no mod, unlike
    * [[baseHash]]). */
  def hash56(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
    h
  }

  /** DISTINCT 56-bit shingle hashes of a text, computed in-row — the
    * fused form of `explode(portable_shingles(text, w))` → filter
    * non-empty → `conv(substring(md5(shg),1,14),16,10)::long` →
    * `distinct()`: a (doc_id, h) distinct is entirely WITHIN the doc, so
    * deduplicating in the kernel makes the global distinct exchange
    * redundant, and the explode emits 8-byte longs instead of 30-50-byte
    * shingle strings (r15 measured the containment staging spending most
    * of its time in exactly that exchange + string explode). */
  def distinctShingleHash56Kernel(text: UTF8String,
      shingleWidth: Int): ArrayData = {
    val sh = shingles(tokenize(text), shingleWidth)
    val seen = new java.util.HashSet[java.lang.Long](sh.length * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](sh.length)
    var i = 0
    while (i < sh.length) {
      val s = sh(i)
      if (s.nonEmpty) {
        val h = hash56(s)
        if (seen.add(h)) out += h
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct 56-bit shingle hashes — see [[distinctShingleHash56Kernel]]. */
  case class DistinctShingleHash56(child: Expression, shingleWidth: Int)
      extends UnaryExpression {
    // deterministic in fact; declared nondeterministic so the optimizer
    // cannot clone the kernel into the generator's inferred size(...)>0
    // pre-filter (one evaluation per row, not two — guide §4.4, same as
    // SpanWindowHashes)
    override lazy val deterministic: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "distinct_shingle_hash56"

    override def nullSafeEval(input: Any): Any =
      distinctShingleHash56Kernel(input.asInstanceOf[UTF8String], shingleWidth)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs.distinctShingleHash56Kernel(" +
          s"$c, $shingleWidth);")
    override protected def withNewChildInternal(c: Expression): DistinctShingleHash56 =
      copy(child = c)
  }

  /** Count of positions where two equal-length long arrays agree — the
    * MinHash signature-agreement kernel (estimated Jaccard = agreement /
    * numHashes). Replaces an interpreted zip_with+filter+size chain with
    * one compiled pass per candidate pair. */
  case class SigAgreement(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sig_agreement"

    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Integer.valueOf(sigAgreementKernel(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.PortableHashExprs.sigAgreementKernel($a, $b);")
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): SigAgreement = copy(left = l, right = r)
  }

  def sigAgreementKernel(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Deterministic ±1 hyperplane component for bit `i`, dimension `d` —
    * a two-round LCG on (i, d), identical in SQL:
    * r1 = (1103515245*(i*8191 + d + 1) + 12345) % P
    * r2 = (1103515245*r1 + 12345) % P
    * sign = +1 if (r2 >> 7) & 1 = 1 else -1
    * (bit 7, not bit 0: an LCG's low bit alternates.) */
  def planeSign(i: Int, d: Int): Double = {
    val r1 = (1103515245L * (i * 8191L + d + 1L) + 12345L) % P
    val r2 = (1103515245L * r1 + 12345L) % P
    if (((r2 >> 7) & 1L) == 1L) 1.0 else -1.0
  }

  /** Shared element accessor for float/double vectors: validates the child
    * is array<float|double> and dispatches the per-element read accordingly
    * (a silent getFloat over doubles would read garbage bytes). */
  private[functions] trait VectorInput { self: UnaryExpression =>
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> input, got ${other.sql}")
    }

    protected lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
  }

  /** In-order dot of the vector with portable ±1 plane `plane`, sign test.
    * Left-to-right accumulation — same IEEE sequence as the SQL oracle's
    * list_reduce fold. */
  def projNonNeg(arr: ArrayData, n: Int, plane: Int, isFloat: Boolean): Boolean = {
    var proj = 0.0
    var d = 0
    while (d < n) {
      val e = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      proj += e * planeSign(plane, d)
      d += 1
    }
    proj >= 0
  }

  def signSketchKernel(arr: ArrayData, bits: Int, isFloat: Boolean): Long = {
    val n = arr.numElements()
    var sketch = 0L
    var i = 0
    while (i < bits) {
      if (projNonNeg(arr, n, i, isFloat)) sketch |= (1L << i)
      i += 1
    }
    sketch
  }

  def signBandsKernel(arr: ArrayData, bands: Int, rBits: Int, extraBits: Int,
      isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](2 * bands)
    var t = 0
    while (t < bands) {
      var key = 0L
      var j = 0
      while (j < rBits) {
        if (projNonNeg(arr, n, t * PlaneStride + j, isFloat)) key |= (1L << j)
        j += 1
      }
      out(t) = key
      var xkey = 0L
      j = 0
      while (j < extraBits) {
        if (projNonNeg(arr, n, t * PlaneStride + ExtraPlaneOffset + j, isFloat))
          xkey |= (1L << j)
        j += 1
      }
      out(bands + t) = xkey
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane sign sketch of a float vector: bit i of the result =
    * [in-order dot of the vector with portable ±1 plane i] >= 0. Replaces a
    * stored projection-matrix model with a formula any engine can evaluate. */
  case class PortableSignSketch(child: Expression, bits: Int)
      extends UnaryExpression with VectorInput {
    override def dataType: DataType = LongType
    override def prettyName: String = "portable_sign_sketch"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        signSketchKernel(input.asInstanceOf[ArrayData], bits, isFloat))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs.signSketchKernel(" +
          s"$c, $bits, $isFloat);")
    override protected def withNewChildInternal(c: Expression): PortableSignSketch =
      copy(child = c)
  }

  /** Plane-index stride between LSH bands: band t draws its main sign bits
    * from planes [t*64, t*64+rBits) and its overflow-refinement bits from
    * planes [t*64+32, t*64+32+extraBits) — disjoint families per band, and
    * stable plane identities however many bits a corpus size calls for. */
  val PlaneStride = 64
  val ExtraPlaneOffset = 32

  /** Banded multi-table hyperplane LSH keys, one pass over the vector:
    * returns array<long> of length 2*bands — elements [0, bands) are the
    * per-band main keys (rBits sign bits each), elements [bands, 2*bands)
    * the per-band refinement keys (extraBits sign bits each, used only to
    * subdivide buckets that exceed the size cap). rBits is chosen by the
    * caller from the corpus size, so the 2^rBits-per-band bucket space
    * grows with N — the property that keeps the per-bucket self-join
    * sub-quadratic at 100 TB (a fixed bucket count is Θ(N²) asymptotically).
    */
  case class PortableSignBands(child: Expression, bands: Int, rBits: Int,
      extraBits: Int)
      extends UnaryExpression with VectorInput {
    require(rBits <= ExtraPlaneOffset && extraBits <= PlaneStride - ExtraPlaneOffset,
      s"band bit widths exceed the plane budget: r=$rBits extra=$extraBits")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "portable_sign_bands"

    override def nullSafeEval(input: Any): Any =
      signBandsKernel(input.asInstanceOf[ArrayData], bands, rBits, extraBits,
        isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PortableHashExprs.signBandsKernel(" +
          s"$c, $bands, $rBits, $extraBits, $isFloat);")
    override protected def withNewChildInternal(c: Expression): PortableSignBands =
      copy(child = c)
  }

  // ------------------------------------------------------------ Column API

  import org.apache.spark.sql.GraftShims.{column, expression}

  def portable_minhash(c: Column, numHashes: Int = 64,
      shingleWidth: Int = 3): Column =
    column(PortableMinHash(expression(c), numHashes, shingleWidth))

  def portable_simhash32(c: Column): Column =
    column(PortableSimHash32(expression(c)))

  def portable_shingles(c: Column, shingleWidth: Int = 3): Column =
    column(PortableShingles(expression(c), shingleWidth))

  def distinct_shingle_hash56(c: Column, shingleWidth: Int = 3): Column =
    column(DistinctShingleHash56(expression(c), shingleWidth))

  def winnow_fingerprints(c: Column, k: Int = 5, w: Int = 4): Column =
    column(WinnowFingerprints(expression(c), k, w))

  def bloom_positions(c: Column, mBits: Int, k: Int): Column =
    column(BloomPositions(expression(c), mBits, k))

  def bloom_screen(c: Column, bloom: Array[Byte], mBits: Int, k: Int,
      shingleWidth: Int = 3): Column =
    column(BloomShingleScreen(expression(c), bloom, mBits, k, shingleWidth))

  def sig_agreement(a: Column, b: Column): Column =
    column(SigAgreement(expression(a), expression(b)))

  def portable_sign_sketch(c: Column, bits: Int = 8): Column =
    column(PortableSignSketch(expression(c), bits))

  def portable_sign_bands(c: Column, bands: Int, rBits: Int,
      extraBits: Int): Column =
    column(PortableSignBands(expression(c), bands, rBits, extraBits))

  /** The DuckDB SQL fragments mirroring the kernels — kept next to the Scala
    * so the two definitions can't drift apart. `%s` is the input column. */
  object OracleSql {
    val baseHash = "(CAST('0x' || substr(md5(%s), 1, 14) AS BIGINT) %% 2147483647)"
    val hash32 = "CAST('0x' || substr(md5(%s), 1, 8) AS BIGINT)"
    val affineA = "(((1103515245*(%s+7) + 12345) %% 1073741823) | 1)"
    val affineB = "((2027382749*(%s+13) + 577) %% 2147483647)"
  }
}
