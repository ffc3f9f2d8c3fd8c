package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based invariants of the int8 quantization tier, checked
  * through the SAME Spark expressions the queries use (seeded
  * deterministic sampling — no scalatest-scalacheck bridge in the
  * offline cache).
  *
  * Laws: every quantized value is in [-127, 127]; per-element
  * reconstruction error is bounded by scale/2 (round-half-up of
  * x/scale); the max-|x| element always quantizes to ±127; all-zero
  * vectors quantize to zeros with scale 0.
  */
class QuantizePropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0).map(_.toFloat)).map(_.toSeq)

  test("quantization laws hold over random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = samples(vecGen, 150) :+ Seq.fill(16)(0.0f)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .withColumn("scale",
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) / 127"))
      .withColumn("qv",
        expr("CASE WHEN scale = 0 THEN transform(embedding, x -> 0) " +
          "ELSE transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5d) AS INT)) END"))
    val rows = df.select("vec_id", "embedding", "scale", "qv").collect()
    assert(rows.length == vecs.length)
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val qv = r.getSeq[Int](3)
      if (emb.forall(_ == 0.0f)) {
        assert(scale == 0.0 && qv.forall(_ == 0))
      } else {
        assert(qv.forall(q => q >= -127 && q <= 127), s"range: $qv")
        // the max-|x| element hits the rails
        assert(qv.exists(q => math.abs(q) == 127), s"rails: $qv scale=$scale")
        // reconstruction error bounded by scale/2 (+ float->double noise)
        qv.zip(emb).foreach { case (q, x) =>
          assert(math.abs(q * scale - x.toDouble) <= scale / 2 + 1e-9,
            s"err bound: q=$q x=$x scale=$scale")
        }
      }
    }
  }
}
