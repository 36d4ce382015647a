package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks for the round-6 pure-JVM kernels: Jaro–Winkler
  * and the StepLookup binary search. */
object KernelProps extends Properties("Round6Kernels") {

  private val word = Gen.choose(0, 12)
    .flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))

  property("jaroWinkler within [0,1]") = forAll(word, word) { (a, b) =>
    val r = JaroWinklerImpl.jaroWinkler(a, b)
    r >= 0.0 && r <= 1.0
  }

  property("jaroWinkler symmetric") = forAll(word, word) { (a, b) =>
    JaroWinklerImpl.jaroWinkler(a, b) == JaroWinklerImpl.jaroWinkler(b, a)
  }

  property("identical strings score 1") = forAll(word) { a =>
    JaroWinklerImpl.jaroWinkler(a, a) == 1.0
  }

  property("winkler boost never decreases jaro") = forAll(word, word) { (a, b) =>
    JaroWinklerImpl.jaroWinkler(a, b) >= JaroWinklerImpl.jaro(a, b) - 1e-15
  }

  private val table = for {
    n <- Gen.choose(1, 20)
    starts <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
  } yield {
    val s = starts.distinct.sorted.toArray
    (s, s.map(_ + 7L)) // ids derived, parallel
  }

  property("stepLookup equals the linear scan") =
    forAll(table, Gen.choose(-1100L, 1100L)) { case ((starts, ids), x) =>
      val got = StepLookupImpl.lookup(x, starts, ids)
      val want = {
        val i = starts.lastIndexWhere(_ <= x)
        if (i < 0) Long.MinValue else ids(i)
      }
      got == want
    }
}
