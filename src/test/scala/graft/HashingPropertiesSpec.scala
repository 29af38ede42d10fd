package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Hashing

/** Property-based checks of the hashing kernels the dedup/similarity
  * operators are built on (raw ScalaCheck generators, seeded sampling).
  */
class HashingPropertiesSpec extends AnyFunSuite {
  private val params = Gen.Parameters.default

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(params, Seed(42L + i)))

  private val word = Gen.oneOf("the", "fast", "key", "order", "sort", "table",
    "scan", "merge", "part", "window", "small", "hash", "join", "spark",
    "group", "query", "row", "data", "slow", "filter")
  private val doc = Gen.chooseNum(8, 60).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))

  test("permute stays in [0, 2^61-1) for random inputs and all functions") {
    for (x <- samples(Gen.long, 200); i <- Seq(0, 1, 7, 31, 63)) {
      val v = Hashing.permute(x, Hashing.coefA(i), Hashing.coefB(i))
      assert(v >= 0 && v < Hashing.MersennePrime, s"x=$x i=$i -> $v")
    }
  }

  test("hash64 deterministic and sensitive to any suffix change") {
    for (t <- samples(doc, 100)) {
      assert(Hashing.hash64(t) == Hashing.hash64(t))
      assert(Hashing.hash64(t) != Hashing.hash64(t + "x"))
    }
  }

  test("minhash estimate within 0.25 of true jaccard on random doc pairs") {
    val docs = samples(doc, 80)
    docs.zip(docs.reverse).foreach { case (a, b) =>
      val sa = Hashing.shingleHashes(a, 3).toSet
      val sb = Hashing.shingleHashes(b, 3).toSet
      if (sa.nonEmpty && sb.nonEmpty) {
        val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
        val est = Hashing.minhash(a, 128, 3).zip(Hashing.minhash(b, 128, 3))
          .count { case (x, y) => x == y }.toDouble / 128
        assert(math.abs(est - trueJ) <= 0.25, s"est $est true $trueJ")
      }
    }
  }

  test("TopKItems merge order does not change the result") {
    import scala.collection.mutable
    def cloneMap(m: mutable.Map[String, Long]) = mutable.Map(m.toSeq: _*)
    val wordLists = samples(Gen.listOfN(60, word), 40)
    wordLists.grouped(2).foreach {
      case Seq(xs, ys) =>
        val agg = new functions.TopKItems(5, 100)
        val left = xs.foldLeft(agg.zero)(agg.reduce)
        val right = ys.foldLeft(agg.zero)(agg.reduce)
        val ab = agg.finish(agg.merge(cloneMap(left), cloneMap(right)))
        val ba = agg.finish(agg.merge(cloneMap(right), cloneMap(left)))
        assert(ab == ba)
      case _ =>
    }
  }

  test("lsh keys: identical vectors collide in every table") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-5.0f, 5.0f))
    for (v <- samples(vecGen, 50)) {
      val arr = new GenericArrayData(v.toArray)
      val k1 = Hashing.lshKeysData(arr, 16, 4)
      val k2 = Hashing.lshKeysData(arr, 16, 4)
      assert((0 until 16).forall(i => k1.getInt(i) == k2.getInt(i)))
      // keys from different tables live in disjoint ranges
      assert((0 until 16).forall(i => k1.getInt(i) >> 4 == i))
    }
  }
}
