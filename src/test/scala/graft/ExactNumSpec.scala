package graft

import graft.exact.{ExactNum, Rational}
import org.scalatest.funsuite.AnyFunSuite

class ExactNumSpec extends AnyFunSuite {
  import ExactNum.{PosInf, NegInf}

  test("rational arithmetic is exact") {
    val a = Rational(1, 3)
    val b = Rational(1, 6)
    assert(a + b == Rational(1, 2))
    assert(a - b == Rational(1, 6))
    assert(a * b == Rational(1, 18))
    assert(a / b == Rational(2))
    assert(Rational(2, 4) == Rational(1, 2)) // normalization
  }

  test("double conversion rounds directionally") {
    val third = Rational(1, 3)
    assert(third.toDouble(roundUp = true) > third.toDouble(roundUp = false))
    assert(Rational(1, 2).toDouble(roundUp = true) == 0.5)
    assert(Rational(1, 2).toDouble(roundUp = false) == 0.5)
  }

  test("fromDouble is the exact dyadic value") {
    assert(Rational.fromDouble(0.5) == Rational(1, 2))
    assert(Rational.fromDouble(0.1) != Rational(1, 10)) // 0.1 is not exact
    assert(Rational.fromDouble(3.0) == Rational(3))
  }

  test("ExactNum directed toDouble stays tight on integers") {
    // regression: BigDecimal.ulp of a scale-0 value is 1, which once made
    // ExactNum(1).toDouble(roundUp=false) return 0.0
    assert(ExactNum(1).toDouble(roundUp = false) > 0.999999)
    assert(ExactNum(1).toDouble(roundUp = false) <= 1.0)
    assert(ExactNum(1).toDouble(roundUp = true) >= 1.0)
    assert(ExactNum(1).toDouble(roundUp = true) < 1.000001)
    assert(ExactNum(1000000).toDouble(roundUp = false) > 999999.0)
  }

  test("sqrt produces exact radicals: sqrt(8) = 2*sqrt(2)") {
    val s8 = ExactNum(8).sqrt
    val s2 = ExactNum(2).sqrt
    assert(s8 == s2 * ExactNum(2))
    assert((s8 * s8) == ExactNum(8))
  }

  test("sqrt of perfect squares is rational") {
    assert(ExactNum(9).sqrt == ExactNum(3))
    assert(ExactNum(Rational(9, 4)).sqrt == ExactNum(Rational(3, 2)))
  }

  test("comparison of radical sums is exact") {
    // sqrt(2) + sqrt(3) vs sqrt(10): 3.146... vs 3.162... — close but distinct
    val lhs = ExactNum(2).sqrt + ExactNum(3).sqrt
    val rhs = ExactNum(10).sqrt
    assert(lhs < rhs)
    // (sqrt(2)+sqrt(3))^2 = 5 + 2*sqrt(6)
    val sq = lhs * lhs
    assert(sq == ExactNum(5) + ExactNum(2) * ExactNum(6).sqrt)
  }

  test("infinities order and combine") {
    assert(PosInf > ExactNum(1000000))
    assert(NegInf < ExactNum(-1000000))
    assert(ExactNum(1) / PosInf == ExactNum.zero)
    assert(PosInf + ExactNum(5) == PosInf)
    assertThrows[ArithmeticException](PosInf + NegInf)
  }

  test("division and inverse of radicals") {
    val x = ExactNum(2).sqrt
    assert((ExactNum.one / x) * x == ExactNum.one)
    val twoTerm = ExactNum.one + ExactNum(2).sqrt
    assert((ExactNum.one / twoTerm) * twoTerm == ExactNum.one)
  }

  test("zero detection through cancellation") {
    val x = ExactNum(2).sqrt * ExactNum(3).sqrt - ExactNum(6).sqrt
    assert(x.isZero)
    assert(x.signum == 0)
  }

  test("exp closure: identities, conversion, and the amplification form") {
    val e1 = ExactNum.expOf(Rational(1))
    assert(e1.toDouble == Math.E)
    assert((ExactNum.expOf(Rational(-1)) * e1) == ExactNum.one)
    assert(ExactNum(0L).exp == ExactNum.one)
    assert(ExactNum.PosInf.exp == ExactNum.PosInf)
    assert(ExactNum.NegInf.exp == ExactNum.zero)
    // the reference's ApproxDP amplification factor d·e^{d·ε} stays exact
    // through budget algebra: 3·e^1 − 3·e^1 cancels symbolically
    val amp = ExactNum(3L) * e1
    assert((amp - amp).isZero)
    // and compares exactly against a near-tie dyadic: 3e vs its nearest
    // double are distinguishable symbolically
    assert((amp - ExactNum.fromDouble(3.0 * Math.E)).signum != 0)
    // exp distributes over the radical part of the closure
    val mixed = ExactNum(2L).sqrt * ExactNum.expOf(Rational(1, 2))
    assert(mixed.pow2 == ExactNum(2L) * e1)
    assert(mixed == (ExactNum(2L) * e1).sqrt)
  }

  test("exp closure: cross-exponent sums stay independent (no false zeros)") {
    // e^{1/2} + e^{1/3} − e^{1/2} leaves exactly e^{1/3}
    val x = ExactNum.expOf(Rational(1, 2)) + ExactNum.expOf(Rational(1, 3)) -
      ExactNum.expOf(Rational(1, 2))
    assert(x == ExactNum.expOf(Rational(1, 3)))
    // a sum of distinct exponentials is not rational and sign-evaluates
    val s = ExactNum.expOf(Rational(1, 2)) - ExactNum.expOf(Rational(1, 3))
    assert(s.signum == 1 && !s.isRational)
  }
}
