package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM properties of the native vector primitives (no Spark
  * session): tie determinism, ranking order, and scale invariance —
  * the row-local contracts the distributed operators rely on. */
class VectorImplPropertiesSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[Array[Double]] = for {
    dim <- Gen.choose(1, 8)
    xs <- Gen.listOfN(dim, Gen.choose(-5.0, 5.0))
  } yield xs.toArray

  private def arr(v: Array[Double]) = new GenericArrayData(v)

  test("nearestCentroid picks the argmax dot; first centroid wins exact ties") {
    val dim = 4
    val cbGen = for {
      k <- Gen.choose(1, 6)
      xs <- Gen.listOfN(k * dim, Gen.choose(-2.0, 2.0))
    } yield xs.toArray
    val vGen = Gen.listOfN(dim, Gen.choose(-3.0, 3.0)).map(_.toArray)
    for ((cb, v) <- sample(cbGen, 60).zip(sample(vGen, 60))) {
      val k = cb.length / dim
      val dots = (0 until k).map(c =>
        (0 until dim).map(i => v(i) * cb(c * dim + i)).sum)
      val expected = dots.indexOf(dots.max)
      val got = VectorImpl.nearestCentroid(arr(v), cb, dim, isFloat = false)
      assert(got == expected, s"cb=$k dots=$dots")
    }
    // exact tie: duplicated centroid — index 0 must win
    val c = Array(1.0, 0.0, 0.0, 0.0)
    val dup = c ++ c
    assert(VectorImpl.nearestCentroid(arr(Array(1.0, 1.0, 0.0, 0.0)), dup, 4, false) == 0)
  }

  test("topCentroids is a descending-dot ranking, ties to the lower id, head = nearest") {
    val dim = 3
    val cb = Array(
      1.0, 0.0, 0.0,
      0.0, 1.0, 0.0,
      0.0, 0.0, 1.0,
      1.0, 0.0, 0.0) // duplicate of centroid 0 → tie goes to id 0 first
    for (v <- sample(vecGen.suchThat(_.length >= dim).map(_.take(dim)), 40)) {
      val ranked = VectorImpl.topCentroidsTyped(arr(v), cb, dim, 4, false)
        .toIntArray()
      val dots = ranked.map(c => (0 until dim).map(i => v(i) * cb(c * dim + i)).sum)
      assert(dots.sameElements(dots.sortBy(-_)), "dots must be non-increasing")
      assert(ranked.head ==
        VectorImpl.nearestCentroid(arr(v), cb, dim, false))
      // the duplicated centroids 0 and 3 tie exactly: 0 must rank earlier
      assert(ranked.indexOf(0) < ranked.indexOf(3))
    }
  }

  test("hyperplaneBuckets is sign-scale invariant and flips with negated planes") {
    val dim = 4
    val pGen = Gen.listOfN(2 * 2 * dim, Gen.choose(-1.0, 1.0)).map(_.toArray)
    val vGen = Gen.listOfN(dim, Gen.choose(-3.0, 3.0)).map(_.toArray)
    for ((pl, v) <- sample(pGen, 40).zip(sample(vGen, 40))) {
      val b1 = LshImpl.hyperplaneBuckets(arr(v), pl, dim, 2, 2, false).toLongArray()
      // positive scaling of the vector never changes sign buckets
      val b2 = LshImpl.hyperplaneBuckets(arr(v.map(_ * 7.5)), pl, dim, 2, 2, false)
        .toLongArray()
      assert(b1.sameElements(b2))
      // buckets are within the 2-plane range
      b1.foreach(b => assert(b >= 0 && b < 4))
    }
  }
}
