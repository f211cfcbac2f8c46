package graft.functions

import java.nio.charset.StandardCharsets

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator properties for the kernels (SURVEY.md §5.2):
  * strict-base64 round trip, passthrough soundness, SimHash locality.
  * Sampling is seeded → deterministic across runs.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def decode(s: String): String =
    StrictBase64.decodeOrPassthrough(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  private val asciiStr = Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)

  test("property: base64(utf8 text) always decodes back to the text") {
    samples(asciiStr, 300).foreach { s =>
      val encoded = java.util.Base64.getEncoder.encodeToString(
        s.getBytes(StandardCharsets.UTF_8))
      assert(decode(encoded) == s, s"input=$s")
    }
  }

  test("property: strings outside the canonical-b64 ambiguity class pass through") {
    val canonical =
      "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})$"
    samples(asciiStr, 500).foreach { s =>
      val ambiguous = s.nonEmpty && s.length % 4 == 0 && s.matches(canonical)
      if (!ambiguous) assert(decode(s) == s, s"input=$s")
    }
  }

  test("property: single-token edits move SimHash by a bounded Hamming distance") {
    val tokGen = Gen.listOfN(30, Gen.identifier.map(_.take(8)))
    samples(tokGen, 100).filter(_.nonEmpty).foreach { tokens =>
      val a = simhash(tokens)
      val b = simhash(tokens.updated(0, tokens.head + "_x"))
      // one of 30 tokens changed — far fewer than half the bits may flip
      assert(java.lang.Long.bitCount(a ^ b) <= 32, tokens.take(3).toString)
    }
  }

  private def simhash(tokens: Seq[String]): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val lit = Literal.create(tokens.toArray, ArrayType(StringType))
    SimHash64(lit).eval(null).asInstanceOf[Long]
  }
}
