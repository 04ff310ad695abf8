package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.federation.sql.{AnsiDialect, RemoteTableRef}
import graft.functions.{CountMinSketch, PortableHashExprs}

/** Property-based tests (SURVEY §5 port strategy — an improvement over the
  * reference's example-only tests): parser round-trips and hash-kernel
  * invariants over generated inputs. Uses raw ScalaCheck generators with
  * fixed seeds (no scalatest bridge on the classpath), so failures are
  * reproducible. */
class PropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(6, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
  } yield (h :: t).mkString

  private val weirdIdent: Gen[String] = for {
    base <- ident
    decoration <- Gen.oneOf("", ".", " ", "UP", "\"")
  } yield base + decoration

  test("plain multi-part references round-trip through parse + sql") {
    for (parts <- samples(Gen.choose(1, 3).flatMap(Gen.listOfN(_, ident)))) {
      val ref = RemoteTableRef.parse(parts.mkString("."))
      assert(ref.parts == parts)
      assert(RemoteTableRef.parse(ref.sql(AnsiDialect)).parts == parts)
    }
  }

  test("quoted references preserve embedded dots, spaces, and case") {
    for (parts <- samples(Gen.listOfN(2, weirdIdent))
         if parts.forall(_.nonEmpty)) {
      val quoted = parts.map(p => "\"" + p.replace("\"", "\"\"") + "\"")
      val ref = RemoteTableRef.parse(quoted.mkString("."))
      assert(ref.parts == parts, s"parse of $quoted")
      assert(RemoteTableRef.parse(ref.sql(AnsiDialect)).parts == parts,
        s"round-trip of ${ref.sql(AnsiDialect)}")
    }
  }

  test("baseHash stays in [0, P) and is stable across calls") {
    for (s <- samples(Gen.asciiPrintableStr)) {
      val h = PortableHashExprs.baseHash(s)
      assert(h >= 0 && h < PortableHashExprs.P)
      assert(h == PortableHashExprs.baseHash(s))
    }
  }

  private def minhash16(text: String): Seq[Long] = {
    val e = PortableHashExprs.PortableMinHash(
      org.apache.spark.sql.catalyst.expressions.Literal(text), 16, 3)
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
  }

  test("minhash is deterministic; disjoint token sets get disjoint sigs") {
    for (toks <- samples(Gen.nonEmptyListOf(ident), 100)) {
      val text = toks.mkString(" ")
      assert(minhash16(text) == minhash16(text))
      // a single appended token legitimately may not move any minimum;
      // fully disjoint shingle sets must (collision odds ~ n²/2³¹)
      val disjoint = toks.map(_ + "zz").mkString(" ")
      assert(minhash16(text) != minhash16(disjoint))
    }
  }

  test("count-min estimates never under-count; merge equals one pass") {
    val keyGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dd", "ee", "fff"))
    for (keys <- samples(keyGen, 100)) {
      val agg = new CountMinSketch.CountMinAgg(4, 32)
      val sketch = keys.foldLeft(agg.zero)(agg.reduce)
      keys.groupBy(identity).foreach { case (k, ks) =>
        assert(CountMinSketch.estimate(sketch, k, 4, 32) >= ks.size.toLong,
          s"under-count for $k")
      }
      val (l, r) = keys.splitAt(keys.size / 2)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq == sketch.toSeq)
    }
  }

  test("tokenize never yields empty tokens and lowercases ASCII") {
    for (s <- samples(Gen.asciiPrintableStr)) {
      val toks = PortableHashExprs.tokenize(UTF8String.fromString(s))
      assert(toks.forall(t => t.nonEmpty && t == t.toLowerCase))
    }
  }
}
