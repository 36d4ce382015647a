package graft.enrich

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks (SURVEY §5) for the pure-JVM kernels. */
object SequenceMatcherProps extends Properties("SequenceMatcher") {

  private val shortStr = Gen.stringOfN(8, Gen.alphaNumChar)
    .flatMap(s => Gen.choose(0, 8).map(s.take))

  property("ratio within [0,1]") = forAll(shortStr, shortStr) { (a, b) =>
    val r = SequenceMatcher.ratio(a, b)
    r >= 0.0 && r <= 1.0
  }

  property("identical strings score 1") = forAll(shortStr) { a =>
    SequenceMatcher.ratio(a, a) == 1.0
  }

  property("bounded by the length prune bound") = forAll(shortStr, shortStr) { (a, b) =>
    SequenceMatcher.ratio(a, b) <=
      SequenceMatcher.maxPossibleRatio(a.length, b.length) + 1e-15
  }

  property("disjoint alphabets score 0") =
    forAll(Gen.stringOfN(6, Gen.oneOf('a', 'b', 'c')),
      Gen.stringOfN(6, Gen.oneOf('x', 'y', 'z'))) { (a, b) =>
      SequenceMatcher.ratio(a, b) == 0.0
    }

  property("single shared char contributes 2/(la+lb)") = forAll(
    Gen.choose(1, 6), Gen.choose(1, 6)) { (i, j) =>
    val a = "q" + ("a" * i)
    val b = ("z" * j) + "q"
    SequenceMatcher.ratio(a, b) == 2.0 / (a.length + b.length)
  }

  property("Latin-1 fast path equals the general path bit-for-bit") =
    forAll(Gen.choose(0, 14).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)),
      Gen.choose(0, 14).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))) { (a, b) =>
      SequenceMatcher.ratio(a, b) == SequenceMatcher.ratioGeneral(a, b)
    }

  property("quick bound is sound: bound >= exact ratio") =
    forAll(shortStr, shortStr) { (a, b) =>
      SequenceMatcher.quickRatioBound(a, b) >= SequenceMatcher.ratio(a, b) - 1e-15
    }

  property("ratioIfAtLeast returns the exact ratio whenever it crosses the cutoff") =
    forAll(shortStr, shortStr, Gen.choose(0.0, 1.0)) { (a, b, cut) =>
      val exact = SequenceMatcher.ratio(a, b)
      val bounded = SequenceMatcher.ratioIfAtLeast(a, b, cut)
      if (exact >= cut) bounded == exact else bounded < cut
    }
}
