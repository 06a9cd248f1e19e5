package graft.exact

/** Exact rational number (normalized: den > 0, gcd(num, den) = 1).
  *
  * All privacy-budget and stability arithmetic in the engine is exact
  * (cf. reference `src/tmlt/core/utils/exact_number.py:251`, which uses
  * sympy); floats appear only at execution time.
  */
final class Rational private (val num: BigInt, val den: BigInt)
    extends Ordered[Rational]
    with Serializable {

  def +(that: Rational): Rational =
    Rational(num * that.den + that.num * den, den * that.den)
  def -(that: Rational): Rational =
    Rational(num * that.den - that.num * den, den * that.den)
  def *(that: Rational): Rational = Rational(num * that.num, den * that.den)
  def /(that: Rational): Rational = {
    require(that.num != 0, "division by zero")
    Rational(num * that.den, den * that.num)
  }
  def unary_- : Rational = new Rational(-num, den)
  def reciprocal: Rational = Rational(den, num)
  def abs: Rational = if (num < 0) new Rational(-num, den) else this
  def isZero: Boolean = num == 0
  def signum: Int = num.signum
  def isWhole: Boolean = den == 1
  def pow(k: Int): Rational =
    if (k >= 0) Rational(num.pow(k), den.pow(k))
    else Rational(den.pow(-k), num.pow(-k))

  override def compare(that: Rational): Int =
    (num * that.den).compare(that.num * den)

  def min(that: Rational): Rational = if (this <= that) this else that
  def max(that: Rational): Rational = if (this >= that) this else that

  def toBigDecimal(mc: java.math.MathContext): java.math.BigDecimal =
    new java.math.BigDecimal(num.bigInteger)
      .divide(new java.math.BigDecimal(den.bigInteger), mc)

  /** Conservative double conversion: when roundUp, result >= true value;
    * otherwise result <= true value (mirrors exact_number.py:282-306).
    */
  def toDouble(roundUp: Boolean): Double = {
    val mc = new java.math.MathContext(
      40,
      if (roundUp) java.math.RoundingMode.CEILING
      else java.math.RoundingMode.FLOOR
    )
    val bd = toBigDecimal(mc)
    val d = bd.doubleValue()
    // doubleValue rounds to nearest; nudge one ulp outward to stay conservative.
    val exact = new java.math.BigDecimal(d)
    if (roundUp && exact.compareTo(bd) < 0) Math.nextUp(d)
    else if (!roundUp && exact.compareTo(bd) > 0) Math.nextDown(d)
    else d
  }
  def toDouble: Double = {
    val bd = toBigDecimal(new java.math.MathContext(40))
    bd.doubleValue()
  }

  override def equals(o: Any): Boolean = o match {
    case r: Rational => num == r.num && den == r.den
    case _           => false
  }
  override def hashCode: Int = (num, den).hashCode
  override def toString: String = if (den == 1) num.toString else s"$num/$den"
}

object Rational {
  val zero: Rational = new Rational(0, 1)
  val one: Rational = new Rational(1, 1)
  val two: Rational = new Rational(2, 1)
  val half: Rational = new Rational(1, 2)

  def apply(n: BigInt, d: BigInt): Rational = {
    require(d != 0, "zero denominator")
    val s = d.signum
    val g = n.gcd(d)
    if (g == 0) zero
    else new Rational(n / g * s, d / g * s)
  }
  def apply(n: BigInt): Rational = new Rational(n, 1)
  def apply(n: Long): Rational = new Rational(n, 1)
  def apply(n: Long, d: Long): Rational = apply(BigInt(n), BigInt(d))

  /** Exact value of an IEEE double (every finite double is a dyadic rational). */
  def fromDouble(x: Double): Rational = {
    require(!x.isNaN && !x.isInfinite, s"not finite: $x")
    if (x == 0.0) zero
    else {
      val bits = java.lang.Double.doubleToLongBits(x)
      val sign = if (bits < 0) -1 else 1
      val exp = ((bits >> 52) & 0x7ff).toInt
      val mantissa =
        if (exp == 0) (bits & 0xfffffffffffffL) << 1
        else (bits & 0xfffffffffffffL) | 0x10000000000000L
      val e = exp - 1075 // unbiased minus 52
      val m = BigInt(mantissa) * sign
      if (e >= 0) Rational(m << e) else Rational(m, BigInt(1) << -e)
    }
  }
}
