package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the arithmetic kernels behind the round-6
  * continuation operators, exercised as pure JVM mirrors of the column
  * expressions (same formulas, same integer/IEEE ops):
  * quantile-bin assignment, the padded-string BPE merge trick, the
  * fixed-point PageRank step, and RRF monotonicity. */
object Round6bKernelProps extends Properties("Round6bKernels") {

  // -------------------------------------------------- quantile bins
  // bin = ((rank - 1) * k) div n  (Ranking.quantileBins)

  private val binCase = for {
    n <- Gen.choose(1, 500)
    k <- Gen.choose(1, 20)
  } yield (n, k)

  property("quantile bins cover [0,k), are monotone, balanced within 1") =
    forAll(binCase) { case (n, k) =>
      val bins = (1 to n).map(r => ((r - 1).toLong * k) / n)
      val sizes = bins.groupBy(identity).values.map(_.size)
      bins.head == 0L &&
        bins.forall(b => b >= 0 && b < k) &&
        bins.sliding(2).forall(p => p.size < 2 || p(0) <= p(1)) &&
        (sizes.max - sizes.min) <= 1 &&
        (n < k || bins.distinct.size == k) // every bin non-empty when n >= k
    }

  // -------------------------------------------------- BPE padded-string merge
  // Vocab.bpeEncode applies a merge as replace(padded, " l  r ", " lr ") on
  // the double-space padded symbol string. Property: that string rewrite IS
  // the greedy left-to-right list merge.

  private def pad(syms: Seq[String]): String = " " + syms.mkString("  ") + " "

  private def listMerge(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: listMerge(rest, l, r)
      case a :: rest => a :: listMerge(rest, l, r)
      case Nil => Nil
    }

  private val symGen = Gen.oneOf("a", "b", "c", "ab", "bc")
  private val wordGen = Gen.choose(0, 10).flatMap(Gen.listOfN(_, symGen))

  property("padded-string replace equals greedy left-to-right list merge") =
    forAll(wordGen, symGen, symGen) { (syms, l, r) =>
      val viaString = pad(syms).replace(s" $l  $r ", s" ${l + r} ")
      viaString == pad(listMerge(syms, l, r))
    }

  // -------------------------------------------------- fixed-point PageRank step
  // contrib = ((r * 850) div (1000 * outw)) * w  (Graph.pagerankScaled);
  // per-node outflow never exceeds the damped rank, and no step overflows.

  // The REAL production constant — a resolution change must flow into
  // this property, not leave it auditing a stale envelope.
  private val Scale = graft.ops.Graph.Scale

  private val prCase = for {
    r <- Gen.choose(0L, Scale)
    nEdges <- Gen.choose(1, 8)
    ws <- Gen.listOfN(nEdges, Gen.choose(1L, 1000000L))
  } yield (r, ws)

  property("pagerank step: outflow <= damped rank, intermediates in range") =
    forAll(prCase) { case (r, ws) =>
      val outw = ws.sum
      val contribs = ws.map { w =>
        val q = (r * 850L) / (1000L * outw)
        // overflow audit on the exact intermediate products
        assert(r <= Scale && r * 850L > 0 || r == 0L)
        q * w
      }
      contribs.forall(_ >= 0L) && contribs.sum <= (r * 850L) / 1000L
    }

  // -------------------------------------------------- RRF monotonicity

  property("rrf score strictly decreases as either rank worsens") =
    forAll(Gen.choose(1L, 10000L), Gen.choose(1L, 10000L)) { (r1, r2) =>
      def rrf(a: Long, b: Long) = 1.0 / (60.0 + a) + 1.0 / (60.0 + b)
      rrf(r1, r2) > rrf(r1 + 1, r2) && rrf(r1, r2) > rrf(r1, r2 + 1)
    }
}
