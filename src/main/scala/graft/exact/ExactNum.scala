package graft.exact

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** Exact extended-real arithmetic over the closure the engine actually
  * needs: finite sums of `c · √s` (c rational, s square-free positive
  * integer) plus ±∞.
  *
  * The reference uses sympy for this (`utils/exact_number.py`); the forms it
  * produces in practice are rationals, `sqrt(rational)` (from
  * `RootSumOfSquared` stability and zCDP conversions, `metrics.py:752-760`,
  * `utils/parameters.py:118-124`) and their products/sums — all representable
  * here. Equality/zero tests are symbolic (√ of distinct square-free integers
  * are linearly independent over Q); sign tests of non-zero values use
  * interval evaluation at increasing precision.
  */
sealed trait ExactNum extends Ordered[ExactNum] with Serializable {
  import ExactNum._

  def +(that: ExactNum): ExactNum = (this, that) match {
    case (PosInf, NegInf) | (NegInf, PosInf) =>
      throw new ArithmeticException("∞ + -∞ undefined")
    case (PosInf, _) | (_, PosInf) => PosInf
    case (NegInf, _) | (_, NegInf) => NegInf
    case (Finite(a), Finite(b)) =>
      finite((a.keySet ++ b.keySet).iterator.map { s =>
        s -> (a.getOrElse(s, Rational.zero) + b.getOrElse(s, Rational.zero))
      }.toMap)
  }

  def unary_- : ExactNum = this match {
    case PosInf    => NegInf
    case NegInf    => PosInf
    case Finite(t) => finite(t.view.mapValues(c => -c).toMap)
  }

  def -(that: ExactNum): ExactNum = this + (-that)

  def *(that: ExactNum): ExactNum = (this, that) match {
    case (Finite(a), Finite(b)) =>
      var acc = Map.empty[BigInt, Rational]
      for ((s1, c1) <- a; (s2, c2) <- b) {
        val g = s1.gcd(s2)
        val rad = (s1 / g) * (s2 / g)
        val coeff = c1 * c2 * Rational(g)
        acc = acc.updated(rad, acc.getOrElse(rad, Rational.zero) + coeff)
      }
      finite(acc)
    case _ =>
      val sa = this.signum
      val sb = that.signum
      if (sa == 0 || sb == 0)
        throw new ArithmeticException("0 · ∞ undefined")
      if (sa * sb > 0) PosInf else NegInf
  }

  def /(that: ExactNum): ExactNum = (this, that) match {
    case (_, PosInf) | (_, NegInf) =>
      if (this.isInfinite) throw new ArithmeticException("∞ / ∞ undefined")
      else zero
    case (PosInf, f: Finite) =>
      f.signum match {
        case 0 => throw new ArithmeticException("division by zero")
        case s => if (s > 0) PosInf else NegInf
      }
    case (NegInf, f: Finite) =>
      f.signum match {
        case 0 => throw new ArithmeticException("division by zero")
        case s => if (s > 0) NegInf else PosInf
      }
    case (Finite(_), b @ Finite(bt)) =>
      if (b.signum == 0) throw new ArithmeticException("division by zero")
      else this * b.inverse
  }

  def signum: Int = this match {
    case PosInf => 1
    case NegInf => -1
    case f: Finite =>
      val nz = f.terms.filter(!_._2.isZero)
      if (nz.isEmpty) 0
      else if (nz.size == 1) nz.head._2.signum
      else if (nz.valuesIterator.forall(_.signum > 0)) 1
      else if (nz.valuesIterator.forall(_.signum < 0)) -1
      else numericSignum(nz)
  }

  override def compare(that: ExactNum): Int = (this, that) match {
    case (PosInf, PosInf) | (NegInf, NegInf) => 0
    case (PosInf, _)                         => 1
    case (_, PosInf)                         => -1
    case (NegInf, _)                         => -1
    case (_, NegInf)                         => 1
    case _                                   => (this - that).signum
  }

  def min(that: ExactNum): ExactNum = if (this <= that) this else that
  def max(that: ExactNum): ExactNum = if (this >= that) this else that
  def abs: ExactNum = if (signum < 0) -this else this

  def isInfinite: Boolean = this == PosInf || this == NegInf
  def isFinite: Boolean = !isInfinite
  def isZero: Boolean = this match {
    case f: Finite => f.terms.valuesIterator.forall(_.isZero)
    case _         => false
  }
  def isRational: Boolean = this match {
    case f: Finite => f.terms.forall { case (s, c) => s == 1 || c.isZero }
    case _         => false
  }
  def isInteger: Boolean = isRational && toRational.isWhole

  def toRational: Rational = this match {
    case f: Finite if isRational => f.terms.getOrElse(1, Rational.zero)
    case _ => throw new ArithmeticException(s"not rational: $this")
  }

  /** √ of a non-negative rational value (the only sqrt the engine needs). */
  def sqrt: ExactNum = this match {
    case PosInf => PosInf
    case NegInf => throw new ArithmeticException("sqrt of -∞")
    case f: Finite =>
      require(isRational, s"sqrt of irrational form unsupported: $this")
      val r = toRational
      require(r.signum >= 0, s"sqrt of negative: $r")
      if (r.isZero) zero
      else {
        // √(n/d) = √(n·d)/d
        val (sq, rad) = squareFree(r.num * r.den)
        finite(Map(rad -> Rational(sq, r.den)))
      }
  }

  def pow2: ExactNum = this * this

  def toDouble(roundUp: Boolean): Double = this match {
    case PosInf => Double.PositiveInfinity
    case NegInf => Double.NegativeInfinity
    case f: Finite =>
      val mode = if (roundUp) RoundingMode.CEILING else RoundingMode.FLOOR
      val bd = evalDirected(f.terms, 40, mode)
      val d = bd.doubleValue()
      val exact = new JBigDecimal(d)
      if (roundUp && exact.compareTo(bd) < 0) Math.nextUp(d)
      else if (!roundUp && exact.compareTo(bd) > 0) Math.nextDown(d)
      else d
  }
  def toDouble: Double = this match {
    case PosInf    => Double.PositiveInfinity
    case NegInf    => Double.NegativeInfinity
    case f: Finite => evalDirected(f.terms, 40, RoundingMode.HALF_EVEN).doubleValue()
  }

  override def toString: String = this match {
    case PosInf => "∞"
    case NegInf => "-∞"
    case f: Finite =>
      val nz = f.terms.filter(!_._2.isZero).toSeq.sortBy(_._1)
      if (nz.isEmpty) "0"
      else
        nz.map {
          case (s, c) if s == 1 => c.toString
          case (s, c) if c == Rational.one => s"√$s"
          case (s, c) => s"${c}·√$s"
        }.mkString(" + ")
  }
}

object ExactNum {
  case object PosInf extends ExactNum
  case object NegInf extends ExactNum

  /** Invariant: keys are square-free positive integers (1 = rational part). */
  final case class Finite private[exact] (terms: Map[BigInt, Rational])
      extends ExactNum {
    /** Multiplicative inverse; supported for 1- and 2-term forms (all the
      * engine produces).
      */
    def inverse: ExactNum = {
      val nz = terms.filter(!_._2.isZero)
      nz.size match {
        case 0 => throw new ArithmeticException("division by zero")
        case 1 =>
          val (s, c) = nz.head
          // 1/(c√s) = √s / (c·s)
          finite(Map(s -> (Rational.one / (c * Rational(s)))))
        case 2 =>
          // 1/(x+y) = (x-y)/(x²-y²); x²-y² is rational for single terms
          val Seq((s1, c1), (s2, c2)) = nz.toSeq
          val x2 = c1 * c1 * Rational(s1)
          val y2 = c2 * c2 * Rational(s2)
          val denom = x2 - y2
          require(!denom.isZero, "inverse of zero")
          finite(Map(s1 -> c1 / denom, s2 -> (-c2 / denom)))
        case n =>
          throw new UnsupportedOperationException(
            s"inverse of $n-term radical sum"
          )
      }
    }
  }

  val zero: ExactNum = Finite(Map.empty)
  val one: ExactNum = Finite(Map(BigInt(1) -> Rational.one))

  def apply(n: Long): ExactNum = finite(Map(BigInt(1) -> Rational(n)))
  def apply(r: Rational): ExactNum =
    if (r.isZero) zero else Finite(Map(BigInt(1) -> r))
  def ratio(n: Long, d: Long): ExactNum = apply(Rational(n, d))
  def fromDouble(x: Double): ExactNum =
    if (x.isPosInfinity) PosInf
    else if (x.isNegInfinity) NegInf
    else apply(Rational.fromDouble(x))

  private[exact] def finite(terms: Map[BigInt, Rational]): ExactNum = {
    val nz = terms.filter(!_._2.isZero)
    Finite(nz)
  }

  /** n = sq² · rad with rad square-free (trial division to 10^6; remaining
    * part checked for perfect-squareness — radicands in stability math are
    * tiny in practice).
    */
  private[exact] def squareFree(n0: BigInt): (BigInt, BigInt) = {
    require(n0 > 0)
    var n = n0
    var sq = BigInt(1)
    var rad = BigInt(1)
    var p = BigInt(2)
    val bound = BigInt(1000000)
    while (p * p <= n && p <= bound) {
      if (n % p == 0) {
        var e = 0
        while (n % p == 0) { n /= p; e += 1 }
        sq *= p.pow(e / 2)
        if (e % 2 == 1) rad *= p
      }
      p += (if (p == 2) 1 else 2)
    }
    if (n > 1) {
      val s = BigInt(n.bigInteger.sqrt())
      if (s * s == n) sq *= s else rad *= n
    }
    (sq, rad)
  }

  private def evalDirected(
      terms: Map[BigInt, Rational],
      precision: Int,
      mode: RoundingMode
  ): JBigDecimal = {
    // Directed rounding per term: for CEILING/FLOOR keep direction w.r.t.
    // the sign of the coefficient.
    val mc = new MathContext(precision, RoundingMode.HALF_EVEN)
    var acc = JBigDecimal.ZERO
    var maxTerm = JBigDecimal.ONE
    for ((s, c) <- terms if !c.isZero) {
      val sqrtS =
        if (s == 1) JBigDecimal.ONE
        else new JBigDecimal(s.bigInteger).sqrt(mc)
      val term = c.toBigDecimal(mc).multiply(sqrtS, mc)
      maxTerm = maxTerm.max(term.abs)
      acc = acc.add(term, mc)
    }
    // widen by an epsilon relative to the LARGEST term magnitude (not the
    // possibly-cancelled sum): each term carries rounding error proportional
    // to its own size, so a tiny sum of huge terms still gets a wide-enough
    // interval. (NOT acc.ulp — that is 1 for scale-0 BigDecimals.)
    val eps = acc.abs
      .max(maxTerm)
      .movePointLeft(precision - 2)
    mode match {
      case RoundingMode.CEILING => acc.add(eps)
      case RoundingMode.FLOOR   => acc.subtract(eps)
      case _                    => acc
    }
  }

  /** Sign of a symbolically-nonzero multi-term radical sum via interval
    * arithmetic at increasing precision.
    */
  private[exact] def numericSignum(terms: Map[BigInt, Rational]): Int = {
    var prec = 40
    while (prec <= 5000) {
      val lo = evalDirected(terms, prec, RoundingMode.FLOOR)
      val hi = evalDirected(terms, prec, RoundingMode.CEILING)
      if (lo.signum() > 0) return 1
      if (hi.signum() < 0) return -1
      if (lo.signum() <= 0 && hi.signum() >= 0 && lo.signum() == hi.signum())
        return 0
      prec *= 4
    }
    0 // indistinguishable from zero at 5000 digits: treat as equal
  }
}
