package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PortableHashExprs

/** Golden-value tests for the engine-portable hash kernels. Every expected
  * value was independently computed twice — in Python (hashlib md5 +
  * integer arithmetic) and in DuckDB SQL using the exact oracle fragments
  * ([[PortableHashExprs.OracleSql]]) — so a pass here means Spark, Python,
  * and DuckDB agree on the definition. */
class PortableHashSpec extends AnyFunSuite {

  private val text = "The quick  Brown fox jumps over the lazy dog"

  private def minhashK(t: String, k: Int): Seq[Long] = {
    val e = PortableHashExprs.PortableMinHash(
      org.apache.spark.sql.catalyst.expressions.Literal(t), k, 3)
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
  }

  private def simhash(t: String): Long = {
    val e = PortableHashExprs.PortableSimHash32(
      org.apache.spark.sql.catalyst.expressions.Literal(t))
    e.eval(null).asInstanceOf[Long]
  }

  test("baseHash matches DuckDB CAST('0x'||substr(md5,1,14)) % P") {
    assert(PortableHashExprs.baseHash("hello world") == 1016957797L)
  }

  test("hash32 matches DuckDB CAST('0x'||substr(md5,1,8))") {
    assert(PortableHashExprs.hash32("hello") == 1564557354L)
  }

  test("hash56 matches DuckDB CAST('0x'||substr(md5,1,14)) (no mod)") {
    assert(PortableHashExprs.hash56("hello world") == 26659015482154734L)
  }

  test("distinct shingle hash56 kernel: dedup in-row, empty filtered, " +
      "short-text degenerate shingle — Python/DuckDB goldens") {
    def k(t: String): Seq[Long] =
      PortableHashExprs.distinctShingleHash56Kernel(
        UTF8String.fromString(t), 3).toLongArray().toSeq
    // goldens from python hashlib over the oracle construction
    assert(k(text) == Seq(52914156111112028L, 40188373019688373L,
      11037667111580380L, 38472492068882772L, 39385049515381711L,
      35391222496737456L, 22849134202579917L))
    // repeated shingles deduplicate inside the row
    assert(k("a b A b a B a b") ==
      Seq(71225330023062827L, 56597491375258805L))
    // fewer tokens than the width degrade to one whole-text shingle
    assert(k("one two") == Seq(48100074161461971L))
    // empty / all-whitespace texts produce the empty set (the "" shingle
    // is filtered, matching the gate's shg <> '' filter)
    assert(k("") == Seq.empty && k("   ") == Seq.empty)
  }

  test("affine constants match the SQL formulas") {
    assert(Seq(0, 1, 2, 3).map(PortableHashExprs.affineA) ==
      Seq(208426299L, 238199721L, 267973143L, 297746565L))
    assert(Seq(0, 1, 2, 3).map(PortableHashExprs.affineB) ==
      Seq(586172550L, 466071652L, 345970754L, 225869856L))
  }

  test("minhash signature matches Python/DuckDB goldens") {
    assert(minhashK(text, 8) == Seq(264711929L, 156696338L, 289337183L,
      301649810L, 34965097L, 110572897L, 338587691L, 179334472L))
    // fewer tokens than the shingle width → one whole-text shingle
    assert(minhashK("one two", 8) == Seq(327623370L, 247751046L, 167878722L,
      88006398L, 8134074L, 2075745397L, 1995873073L, 1916000749L))
  }

  test("simhash32 matches Python/DuckDB goldens") {
    assert(simhash(text) == 265567480L)
    assert(simhash("") == 0L)
  }

  test("tokenize drops empty tokens and lowercases") {
    assert(PortableHashExprs.tokenize(
      UTF8String.fromString("  Hello \t World\nFoo ")).toSeq ==
      Seq("hello", "world", "foo"))
    assert(PortableHashExprs.tokenize(UTF8String.fromString("")).isEmpty)
  }

  test("planeSign is ±1 and balanced-ish over dims") {
    val signs = (0 until 8).flatMap(i => (0 until 64).map(d =>
      PortableHashExprs.planeSign(i, d)))
    assert(signs.forall(s => s == 1.0 || s == -1.0))
    val pos = signs.count(_ == 1.0)
    assert(pos > signs.size / 4 && pos < 3 * signs.size / 4)
  }

  private def signBands(vec: Array[Float], bands: Int, r: Int,
      extra: Int): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val lit = Literal.create(vec, ArrayType(FloatType, containsNull = false))
    PortableHashExprs.PortableSignBands(lit, bands, r, extra)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
  }

  test("sign-band key 0 equals the plain sign sketch (plane family 0)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val vec = Array.tabulate(64)(d => math.sin(d * 1.7).toFloat)
    val lit = Literal.create(vec, ArrayType(FloatType, containsNull = false))
    val sketch = PortableHashExprs.PortableSignSketch(lit, 8)
      .eval(null).asInstanceOf[Long]
    // band 0 draws planes [0, r) — identical to the flat sketch's bits
    assert(signBands(vec, bands = 1, r = 8, extra = 4).head == sketch)
  }

  test("sign bands use disjoint plane families per band") {
    val vec = Array.tabulate(64)(d => math.cos(d * 0.9).toFloat)
    val keys = signBands(vec, bands = 4, r = 12, extra = 4)
    assert(keys.length == 8)
    // 4 independent 12-bit families colliding on all pairs is ~2^-36
    assert(keys.take(4).distinct.length > 1)
  }

  test("sign kernels accept array<double> and reject non-numeric arrays") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val f = Array.tabulate(16)(d => (d * 0.37 - 2.5).toFloat)
    val asF = Literal.create(f, ArrayType(FloatType, containsNull = false))
    val asD = Literal.create(f.map(_.toDouble),
      ArrayType(DoubleType, containsNull = false))
    // float-exact values → identical sketch through either element reader
    assert(PortableHashExprs.PortableSignSketch(asF, 8).eval(null) ==
      PortableHashExprs.PortableSignSketch(asD, 8).eval(null))
    val bad = Literal.create(Array("x"), ArrayType(StringType, containsNull = false))
    assert(PortableHashExprs.PortableSignSketch(bad, 8)
      .checkInputDataTypes().isFailure)
    assert(PortableHashExprs.PortableSignBands(bad, 2, 8, 4)
      .checkInputDataTypes().isFailure)
  }

  test("LSH key width scales with corpus size (the 100 TB property)") {
    import graft.operators.Similarity._
    assert(rBitsFor(0) == RMin)
    assert(rBitsFor(500) == 5)     // sf0.01: 16·2^5 = 512 ≥ 500
    assert(rBitsFor(2000) == 7)    // sf0.1
    assert(rBitsFor(1000000) == 16)
    assert(rBitsFor(4L << 30) == RMax) // clamp: 4.3B vectors
    // bucket space tracks N: mean occupancy stays within [target/2, target]
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val space = 1L << rBitsFor(n)
      val mean = n.toDouble / space
      assert(mean <= TargetBucket, s"n=$n mean=$mean")
      assert(mean >= TargetBucket / 2.0, s"n=$n mean=$mean")
    }
  }
}
