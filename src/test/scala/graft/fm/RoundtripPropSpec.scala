package graft.fm

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Property-based robustness: random frontmatter documents round-trip
  * through dump → parse, and the Python-comparison semantics hold their
  * algebraic laws — the foundations every mutation operator and the
  * serializer sit on.
  */
class RoundtripPropSpec extends AnyFunSuite {

  /** Seeded deterministic sampling (no scalatest-scalacheck bridge in the
    * offline cache; explicit seeds also make failures reproducible).
    */
  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty).map(identity[Any]),
    Gen.chooseNum(-1000000, 1000000).map(i => Integer.valueOf(i): Any),
    Gen.chooseNum(-1000.0, 1000.0).map(d =>
      java.lang.Double.valueOf(math.rint(d * 100) / 100.0): Any),
    Gen.oneOf(java.lang.Boolean.TRUE: Any, java.lang.Boolean.FALSE: Any))

  private val valueGen: Gen[Any] = Gen.oneOf(
    scalarGen,
    Gen.listOfN(3, scalarGen).map(l => new java.util.ArrayList[Any](l.asJava): Any))

  private val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(12))

  private val metadataGen: Gen[java.util.LinkedHashMap[String, Any]] =
    Gen.mapOfN(5, Gen.zip(keyGen, valueGen)).map { m =>
      val lm = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, v) => lm.put(k, v) }
      lm
    }

  private val bodyGen: Gen[String] =
    Gen.listOfN(8, Gen.alphaNumStr).map(_.filter(_.nonEmpty).mkString(" "))

  test("dump -> parse round-trips arbitrary frontmatter (serialized form equal)") {
    samples(Gen.zip(metadataGen, bodyGen)).foreach { case (meta, body) =>
      val dumped = Frontmatter.dumps(Post(meta, body.strip()))
      val back = Frontmatter.parse(dumped)
      val origSer = meta.asScala.map { case (k, v) => k -> PyValue.serialize(v) }.toMap
      val backSer = back.metadata.asScala.map { case (k, v) => k -> PyValue.serialize(v) }.toMap
      assert(backSer == origSer)
      assert(back.content == body.strip())
    }
  }

  test("pyCompare is antisymmetric and consistent with pyEquals on comparables") {
    samples(Gen.zip(scalarGen, scalarGen)).foreach { case (a, b) =>
      val comparable =
        try { PyOps.pyCompare(a, b); true }
        catch { case _: PyTypeError => false }
      if (comparable) {
        val ab = PyOps.pyCompare(a, b)
        val ba = PyOps.pyCompare(b, a)
        assert(math.signum(ab) == -math.signum(ba))
        assert((ab == 0) == PyOps.pyEquals(a, b))
      } else {
        // incomparable both ways, like Python
        intercept[PyTypeError](PyOps.pyCompare(b, a))
      }
    }
  }

  test("serialize never loses a value: null iff input null") {
    samples(valueGen).foreach { v =>
      assert(PyValue.serialize(v) != null)
    }
  }
}
