package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants of the winnowing kernels, checked directly
  * against a plain-Scala reference implementation (seeded deterministic
  * sampling — no scalatest-scalacheck bridge in the offline cache).
  *
  * Laws: the set kernel equals the reference sliding-min-of-k-gram-hash
  * definition on arbitrary strings; the summary kernel is exactly
  * (size, xor) of the set; the winnowing guarantee holds — any two
  * strings sharing a substring of length >= k + w - 1 share at least
  * one fingerprint; short inputs yield the empty set / (0, 0).
  */
class WinnowPropSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // lowercase-ish text with spaces, the shape the queries feed the kernel
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '))).map(_.mkString))

  private def ref(text: String, k: Int, w: Int): Set[Long] = {
    if (text.length < k + w - 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 to text.length - k).map { i =>
      val hex = md.digest(text.substring(i, i + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    hs.sliding(w).map(_.min).toSet
  }

  test("set kernel equals the reference on random strings, summary equals the set") {
    val (k, w) = (8, 4)
    samples(textGen, 200).foreach { t =>
      val expected = ref(t, k, w)
      val set = WinnowOps.fingerprintSet(UTF8String.fromString(t), k, w)
        .toLongArray().toSeq
      assert(set.toSet == expected, s"set mismatch for ${t.take(40)}")
      assert(set == set.sorted, "sorted ascending")
      val row = WinnowOps.fingerprints(UTF8String.fromString(t), k, w)
      assert(row.getLong(0) == expected.size)
      assert(row.getLong(1) == expected.foldLeft(0L)(_ ^ _))
    }
  }

  test("winnowing guarantee: shared >= k+w-1 substring implies shared fingerprint") {
    val (k, w) = (8, 4)
    val need = k + w - 1
    val padGen = Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString)
    val sharedGen = Gen.listOfN(need + 3, Gen.alphaLowerChar).map(_.mkString)
    val cases = samples(Gen.zip(sharedGen, padGen, padGen), 100)
    cases.foreach { case (shared, p1, p2) =>
      val a = ref(p1 + shared + p1.reverse, k, w)
      val b = ref(p2 + shared + p2.reverse, k, w)
      assert((a & b).nonEmpty, s"no common fingerprint for planted '$shared'")
    }
  }

  test("inputs shorter than one window yield empty results at several k/w") {
    for ((k, w) <- Seq((8, 4), (16, 8), (4, 2))) {
      val s = UTF8String.fromString("x" * (k + w - 2))
      assert(WinnowOps.fingerprintSet(s, k, w).numElements() == 0)
      val row = WinnowOps.fingerprints(s, k, w)
      assert(row.getLong(0) == 0L && row.getLong(1) == 0L)
    }
  }
}
