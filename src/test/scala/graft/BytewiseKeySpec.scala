package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BytewiseKey

/** The one property the encoding exists for: unsigned byte order of the
  * encodings equals the semantic cross-type key order (null < false <
  * true < numbers < strings < arrays; values compared within class,
  * arrays element-wise with shorter-prefix-first) — checked exhaustively
  * over every pair of a fixture set that covers sign flips, empty
  * strings/arrays, prefix relationships, control-byte escaping, nesting,
  * and non-ASCII. Pure JVM: no Spark session needed. */
class BytewiseKeySpec extends AnyFunSuite {

  // fixtures listed in EXPECTED semantic order; the test cross-checks
  // every ordered pair, so a single misplacement fails loudly
  private val ordered: Seq[String] = Seq(
    "null",
    "false",
    "true",
    "-1e9", "-500", "-1.5", "0", "0.5", "42", "1000000000",
    "\"\"", "\"a\"", "\"a\\u0000\"", "\"a\\u0000b\"", "\"a\\u0001\"",
    "\"ab\"", "\"b\"", "\"caf\\u00e9\"", "\"null\"",
    "[]", "[null]", "[false]", "[0]", "[0,0]", "[\"a\"]", "[\"a\",-1]",
    "[\"a\",0]", "[\"a\",[]]", "[\"ab\"]", "[[]]", "[[0]]", "[[\"a\"]]")

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  test("byte order of encodings equals semantic cross-type order, all pairs") {
    val enc = ordered.map(j => j -> BytewiseKey.encode(j))
    for (i <- ordered.indices; j <- ordered.indices) {
      val c = cmpBytes(enc(i)._2, enc(j)._2)
      val expect = Integer.compare(i, j)
      assert(Integer.signum(c) === expect,
        s"'${ordered(i)}' vs '${ordered(j)}': byte compare ${Integer.signum(c)}, " +
          s"semantic $expect")
    }
  }

  test("encoding is injective over the fixtures and whitespace-insensitive") {
    val encs = ordered.map(BytewiseKey.encode(_).toSeq)
    assert(encs.distinct.size === encs.size, "distinct keys must encode distinctly")
    assert(BytewiseKey.encode(" [ \"a\" , 0 ] ").toSeq ===
      BytewiseKey.encode("[\"a\",0]").toSeq)
    assert(BytewiseKey.encode("42").toSeq === BytewiseKey.encode("42.0").toSeq,
      "equal numbers must encode identically regardless of spelling")
  }

  test("malformed, object, and trailing input fail loudly") {
    for (bad <- Seq("{\"a\":1}", "nul", "[1,", "\"open", "1 2", "", "NaN"))
      assertThrows[IllegalArgumentException](BytewiseKey.encode(bad))
  }
}
