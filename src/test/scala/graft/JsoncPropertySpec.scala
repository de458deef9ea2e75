package graft

import graft.codecs.JsoncTape
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the tape codec — the upgrade SURVEY §5 flags as
  * missing from the reference: decode(encode(x)) must be semantically
  * equal to x for arbitrary JSON, including escapes, unicode, deep
  * nesting, and duplicate-free key order preservation.
  */
class JsoncPropertySpec extends AnyFunSuite {

  /** Deterministic sampler (no scalatest-scalacheck bridge in the
    * offline cache): N samples from a fixed seed. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // JSON value generator (depth-bounded)
  private def genValue(depth: Int): Gen[Any] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      3 -> genScalar,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(_.toList),
      1 -> Gen.mapOfN(3, Gen.zip(genKey, genValue(depth - 1))).map(_.toMap))

  private val genKey: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)),
      Gen.const("ключ"), Gen.const("键\"q\""), Gen.const("a\nb"), Gen.const(""))

  private val genScalar: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.oneOf(true, false),
    Gen.chooseNum(-1e6.toLong, 1e6.toLong),
    Gen.chooseNum(-1e9, 1e9).map(_ / 1e3),
    Gen.oneOf("", "plain", "with \"quotes\"", "line\nbreak\ttab",
      "emoji 😀", "backslash \\ slash /", "control"))

  private def toJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString
    case d: Double => if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case s: String => mapper.writeValueAsString(s)
    case xs: List[_] => xs.map(toJson).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => mapper.writeValueAsString(k.toString) + ":" + toJson(x) }
        .mkString("{", ",", "}")
  }

  private def canon(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (n.isNumber) n.asDouble()
    else if (n.isObject) n.properties().asScala.map(e => e.getKey -> canon(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(canon).toVector
    else n.toString
  }

  test("decode(encode(x)) is semantically x for arbitrary JSON") {
    samples(genValue(3), 200).foreach { v =>
      val json = toJson(v)
      val t = JsoncTape.encode(json)
      val back = JsoncTape.decode(t.nodes, t.strings, t.numbers)
      assert(canon(mapper.readTree(back)) == canon(mapper.readTree(json)),
        s"round trip diverged:\n in: $json\nout: $back")
    }
  }

  test("get returns the exact token for every top-level key") {
    samples(Gen.mapOfN(5, Gen.zip(Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty), genScalar)),
      100).foreach { m =>
      val json = toJson(m)
      val t = JsoncTape.encode(json)
      m.foreach { case (k, v) =>
        val got = JsoncTape.get(t.nodes, t.strings, t.numbers, Seq(k))
        val want = v match {
          case s: String => mapper.writeValueAsString(s)
          case other => toJson(other)
        }
        assert(got == want, s"key $k of $json: got $got want $want")
      }
    }
  }

  test("reference corpora survive the tape round trip (deep nesting, unicode)") {
    for (f <- Seq("canada.json", "citm_catalog.json", "twitter.json")) {
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/json/$f")), "UTF-8")
      val t = JsoncTape.encode(json)
      val back = JsoncTape.decode(t.nodes, t.strings, t.numbers)
      assert(canon(mapper.readTree(back)) == canon(mapper.readTree(json)), f)
    }
  }
}
