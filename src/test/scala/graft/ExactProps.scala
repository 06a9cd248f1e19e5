package graft

import graft.exact.{ExactNum, Rational}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based laws for the exact-arithmetic layer — the foundation
  * every stability/privacy computation rests on (reference
  * `utils/exact_number.py`, which leaned on sympy for these laws for
  * free). ScalaCheck drives the cases; sbt runs `Properties` natively.
  */
object ExactProps extends Properties("exact") {

  private val smallBig: Gen[BigInt] =
    Gen.chooseNum(-1000000L, 1000000L).map(BigInt(_))
  private val nonZeroBig: Gen[BigInt] = smallBig.suchThat(_ != 0)
  private val rat: Gen[Rational] = for {
    n <- smallBig
    d <- nonZeroBig
  } yield Rational(n, d)
  private val nonZeroRat: Gen[Rational] = rat.suchThat(!_.isZero)

  property("rational addition commutes and associates") =
    forAll(rat, rat, rat) { (a, b, c) =>
      a + b == b + a && (a + b) + c == a + (b + c)
    }

  property("rational multiplication distributes over addition") =
    forAll(rat, rat, rat) { (a, b, c) =>
      a * (b + c) == a * b + a * c
    }

  property("rational division inverts multiplication") =
    forAll(rat, nonZeroRat) { (a, b) => a * b / b == a }

  property("rational normalization: equal values are equal objects") =
    forAll(rat, Gen.chooseNum(1L, 999L)) { (a, k) =>
      Rational(a.num * k, a.den * k) == a
    }

  property("rational order is total and compatible with subtraction") =
    forAll(rat, rat) { (a, b) =>
      (a.compare(b).signum == (a - b).signum) &&
        (a <= b || b <= a)
    }

  property("directed rounding brackets the rational") =
    forAll(rat) { a =>
      val lo = a.toDouble(roundUp = false)
      val hi = a.toDouble(roundUp = true)
      val bd = new java.math.BigDecimal(a.num.bigInteger)
        .divide(new java.math.BigDecimal(a.den.bigInteger),
          java.math.MathContext.DECIMAL128)
      // NB: new BigDecimal(double) is the EXACT binary value;
      // BigDecimal.valueOf(double) would re-round via the decimal
      // string and falsify the bracket spuriously
      lo <= hi &&
        new java.math.BigDecimal(lo).compareTo(bd) <= 0 &&
        new java.math.BigDecimal(hi).compareTo(bd) >= 0
    }

  property("fromDouble round-trips exactly") =
    forAll(Gen.chooseNum(-1e12, 1e12)) { x =>
      Rational.fromDouble(x).toDouble == x
    }

  property("exact sqrt squares back") =
    forAll(rat.map(_.abs)) { a =>
      val e = ExactNum(a)
      e.sqrt.pow2 == e
    }

  property("exact field laws hold through the sqrt closure") =
    forAll(rat.map(_.abs), rat.map(_.abs)) { (a, b) =>
      val (ea, eb) = (ExactNum(a), ExactNum(b))
      val s = ea.sqrt + eb.sqrt
      // (√a + √b)² = a + b + 2√(ab), decided symbolically
      s * s == ea + eb + ExactNum(Rational(2)) * (ea * eb).sqrt
    }

  // exponents kept small so interval evaluation stays fast and e^q is
  // comfortably inside double range
  private val expRat: Gen[Rational] = for {
    n <- Gen.chooseNum(-40L, 40L)
    d <- Gen.chooseNum(1L, 12L)
  } yield Rational(n, d)

  property("exp homomorphism: exp(a)·exp(b) == exp(a+b), decided symbolically") =
    forAll(expRat, expRat) { (a, b) =>
      ExactNum.expOf(a) * ExactNum.expOf(b) == ExactNum.expOf(a + b)
    }

  property("exp(0) is one; reciprocal negates the exponent") =
    forAll(expRat) { q =>
      ExactNum.expOf(Rational.zero) == ExactNum.one &&
        ExactNum.one / ExactNum.expOf(q) == ExactNum.expOf(-q)
    }

  property("exp is strictly monotone under the exact order (log-bound compare)") =
    forAll(expRat, expRat) { (a, b) =>
      ExactNum.expOf(a).compare(ExactNum.expOf(b)).signum ==
        a.compare(b).signum
    }

  property("sqrt of an exponential halves the exponent") =
    forAll(expRat) { q =>
      ExactNum.expOf(q).sqrt == ExactNum.expOf(q / Rational(2))
    }

  property("radical and exponential factors combine through products") =
    forAll(expRat) { q =>
      val x = ExactNum(Rational(2)).sqrt * ExactNum.expOf(q)
      x * x == ExactNum(Rational(2)) * ExactNum.expOf(q * Rational(2))
    }

  property("e^q is never a dyadic rational (q ≠ 0): compare is decisive") =
    forAll(expRat.suchThat(!_.isZero)) { q =>
      val e = ExactNum.expOf(q)
      val nearest = ExactNum.fromDouble(math.exp(q.toDouble))
      (e - nearest).signum != 0
    }

  property("exp directed toDouble brackets tightly") =
    forAll(expRat) { q =>
      val e = ExactNum.expOf(q)
      val lo = e.toDouble(roundUp = false)
      val hi = e.toDouble(roundUp = true)
      lo <= hi && hi / lo - 1.0 < 1e-12
    }

  property("infinities absorb finite addition and dominate order") =
    forAll(rat) { a =>
      val e = ExactNum(a)
      (ExactNum.PosInf + e) == ExactNum.PosInf &&
        (ExactNum.NegInf + e) == ExactNum.NegInf &&
        e < ExactNum.PosInf && ExactNum.NegInf < e
    }

  property("exact compare agrees with double compare away from ties") =
    forAll(rat, rat) { (a, b) =>
      val (da, db) = (a.toDouble, b.toDouble)
      da == db || (a.compare(b).signum == da.compare(db).signum) ||
        math.abs(da - db) < 1e-9 // double rounding may flip near-ties
    }

  property("dp_bounds rank is the exact clamped ceil(log2(|x|))") = {
    // BigDecimal replay: smallest k in [-100, 100] with 2^k >= mag
    def exact(mag: Double): Int = {
      if (mag == 0.0) -100
      else {
        val m = new java.math.BigDecimal(mag) // exact binary value
        def pow2(k: Int): java.math.BigDecimal =
          if (k >= 0) new java.math.BigDecimal(2).pow(k)
          else java.math.BigDecimal.ONE.divide(new java.math.BigDecimal(2).pow(-k))
        var k = -100
        while (k < 100 && pow2(k).compareTo(m) < 0) k += 1
        k
      }
    }
    val interesting: Gen[Double] = Gen.oneOf(
      Gen.chooseNum(-60, 60).map(e => math.pow(2.0, e)), // exact powers
      Gen.chooseNum(-60, 60).map(e => Math.nextUp(math.pow(2.0, e))),
      Gen.chooseNum(-60, 60).map(e => Math.nextDown(math.pow(2.0, e))),
      Gen.chooseNum(1e-35, 1e35),
      Gen.chooseNum(0.0, 1.0))
    forAll(interesting) { x =>
      graft.plans.DpBoundsAgg.rankOf(math.abs(x)) == exact(math.abs(x))
    }
  }

  property("ndcg weights are positive, monotone, and start at 1e6") =
    forAll(Gen.chooseNum(1, 64)) { k =>
      val w = graft.ops.Stats.ndcgWeights(k)
      w.head == 1000000L && w.forall(_ > 0) &&
        w.zip(w.drop(1)).forall { case (x, y) => x >= y }
    }

  property("prop: gini rank-sum formula is permutation-safe on ties") =
    forAll(Gen.listOfN(20, Gen.chooseNum(0L, 5L))) { xs0 =>
      Prop(xs0.nonEmpty && xs0.sum > 0L) ==> {
        // the per-tie-block invariance argument: any sorted order gives
        // the same sum of i*x because tied x share a value
        def rankSum(xs: Seq[Long]): Long =
          xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
        val s1 = rankSum(xs0.sorted)
        val s2 = rankSum(
          xs0.groupBy(identity).toSeq.sortBy(_._1).flatMap(_._2.reverse))
        Prop(s1 == s2)
      }
    }
}
