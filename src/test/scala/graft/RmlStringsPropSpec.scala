package graft

import graft.functions.RmlStrings
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the term-construction string kernels (SURVEY §5d):
  * percent-encoding round-trips, N-Triples escaping reversibility, null
  * lattice, and expression-vs-Scala agreement for the custom Catalyst
  * expressions.
  */
class RmlStringsPropSpec extends AnyFunSuite {

  /** Deterministic scalacheck sampling (the scalatest-scalacheck bridge is
    * not in the offline cache): 300 seeded samples per property.
    */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 300).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 300).foreach { i =>
      for {
        a <- g1.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- g2.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } f(a, b)
    }

  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    (1 to 300).foreach { i =>
      for {
        a <- g1.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- g2.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
        c <- g3.apply(Gen.Parameters.default, Seed(i.toLong + 2000))
      } f(a, b, c)
    }

  private val texts: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '/', ':', '#', '?', '&', '=', '%', 'é', 'ü', '中',
      '"', '\\', '\n', '\t', '{', '}'))).map(_.mkString)

  test("percent-encoding round-trips through URLDecoder for %-free strings") {
    forAll(texts) { s0 =>
      // '%' is IN the reference's safe set (quote(safe="_-.~:@=+%"),
      // functions.py:580-582) so it passes through verbatim and cannot
      // round-trip; assert that quirk separately below
      val s = s0.replace("%", "")
      val enc = RmlStrings.encode(s)
      // '+' is also safe (not a space encoding) — protect it before decode
      assert(java.net.URLDecoder.decode(enc.replace("+", "%2B"), "UTF-8") == s)
      // the safe set never includes characters that break IRI syntax
      assert(!enc.exists(c => c == ' ' || c == '"' || c == '<' || c == '>'))
    }
    assert(RmlStrings.encode("100%") == "100%") // the reference-faithful quirk
  }

  test("percent-encoding is idempotent on already-safe strings") {
    forAll(Gen.alphaNumStr) { s =>
      assert(RmlStrings.encode(s) == s)
    }
  }

  test("nt escaping: unescape(escape(s)) == s and output has no raw control chars") {
    def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
            case 't' => sb.append('\t'); case c => sb.append('\\').append(c)
          }
          i += 2
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
    forAll(texts) { s =>
      val esc = RmlStrings.ntEscape(s)
      assert(unescape(esc) == s)
      assert(!esc.contains('\n'))
      // every quote is escaped: the literal can be wrapped in quotes safely
      assert(!esc.replace("\\\\", "").replace("\\\"", "").contains('"'))
    }
  }

  test("null lattice: whitespace-only is null; keyword nulls are exact matches") {
    forAll(Gen.choose(0, 5)) { n =>
      assert(RmlStrings.isRmlNull(" " * n))
    }
    // keywords match exactly (the reference compares ==, no strip:
    // functions.py:1882-1918) — padded keywords are NOT null
    Seq("nan", "N/A", "NULL").foreach { k =>
      assert(RmlStrings.isRmlNull(k))
      assert(!RmlStrings.isRmlNull(s" $k"))
    }
    Seq("NaN", "null", "n/a", "0", "false").foreach(v => assert(!RmlStrings.isRmlNull(v)))
  }

  test("slugify output is url-safe lowercase") {
    forAll(texts) { s =>
      val slug = RmlStrings.slugify(s)
      assert(slug.matches("[a-z0-9-]*"))
      assert(!slug.startsWith("-") && !slug.endsWith("-"))
    }
  }

  test("fnv1a64 is deterministic and spreads") {
    forAll(texts, texts) { (a, b) =>
      assert(RmlStrings.fnv1a64(a) == RmlStrings.fnv1a64(a))
      if (a != b) assert(RmlStrings.fnv1a64(a) != RmlStrings.fnv1a64(b) || a == b)
    }
  }

  test("VecDot/VecCosine/VecSqDist bit-match the composed higher-order forms") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs: Gen[List[Double]] =
      Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0).suchThat(d => !d.isNaN))
    val rows = (1 to 60).flatMap { i =>
      for {
        a <- vecs(Gen.Parameters.default, Seed(i.toLong))
        b <- vecs(Gen.Parameters.default, Seed(i.toLong + 5000))
      } yield (a, b)
    }
    val df = rows.toDF("a", "b")
    val composedDot = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val composedSq = aggregate(
      zip_with(slice($"a", 5, 8), slice($"b", 5, 8), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)
    val out = df.select(
      graft.functions.vec.dot($"a", $"b").as("d1"), composedDot.as("d2"),
      graft.functions.vec.cosine($"a", $"b").as("c1"),
      (composedDot / (sqrt(aggregate($"a", lit(0.0d), (s, x) => s + x * x)) *
        sqrt(aggregate($"b", lit(0.0d), (s, x) => s + x * x)))).as("c2"),
      graft.functions.vec.sqDist($"a", $"b", lit(4), lit(8)).as("s1"),
      composedSq.as("s2")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // bitwise equality: identical summation order must give identical doubles
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(5)))
    }
  }
}
