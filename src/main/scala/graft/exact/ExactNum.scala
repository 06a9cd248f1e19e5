package graft.exact

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** Exact extended-real arithmetic over the closure the engine actually
  * needs: finite sums of `c · √s · e^q` (c, q rational; s square-free
  * positive integer) plus ±∞.
  *
  * The reference uses sympy for this (`utils/exact_number.py`); the forms it
  * produces in practice are rationals, `sqrt(rational)` (from
  * `RootSumOfSquared` stability and zCDP conversions, `metrics.py:752-760`,
  * `utils/parameters.py:118-124`), `e^q` factors (ApproxDP amplification and
  * the geometric-CMF threshold inversion, `spark_measurements.py:564-570`,
  * `distributions.py:184-203`) and their products/sums — all representable
  * here. Equality/zero tests are symbolic: √ of distinct square-free
  * integers are linearly independent over Q, and by Lindemann–Weierstrass
  * the e^q for distinct rational q are linearly independent over the
  * algebraics, so a term sum is zero iff every coefficient is zero. Sign
  * tests of non-zero values use interval evaluation at increasing
  * precision.
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
      var acc = Map.empty[Form, Rational]
      for ((f1, c1) <- a; (f2, c2) <- b) {
        val g = f1.rad.gcd(f2.rad)
        val form = Form((f1.rad / g) * (f2.rad / g), f1.q + f2.q)
        val coeff = c1 * c2 * Rational(g)
        acc = acc.updated(form, acc.getOrElse(form, Rational.zero) + coeff)
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
      else if (nz.size == 1) nz.head._2.signum // √s·e^q > 0 always
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
    case f: Finite => f.terms.forall { case (s, c) => s == Form.unit || c.isZero }
    case _         => false
  }
  def isInteger: Boolean = isRational && toRational.isWhole

  def toRational: Rational = this match {
    case f: Finite if isRational => f.terms.getOrElse(Form.unit, Rational.zero)
    case _ => throw new ArithmeticException(s"not rational: $this")
  }

  /** √ of a non-negative single `c·e^q` form (rationals included — the
    * only sqrts the engine needs): √(c·e^q) = √c · e^{q/2}.
    */
  def sqrt: ExactNum = this match {
    case PosInf => PosInf
    case NegInf => throw new ArithmeticException("sqrt of -∞")
    case f: Finite =>
      val nz = f.terms.filter(!_._2.isZero)
      if (nz.isEmpty) zero
      else {
        require(nz.size == 1 && nz.head._1.rad == 1,
          s"sqrt of irrational form unsupported: $this")
        val (form, c) = nz.head
        require(c.signum >= 0, s"sqrt of negative: $c")
        // √(n/d) = √(n·d)/d
        val (sq, rad) = squareFree(c.num * c.den)
        finite(Map(Form(rad, form.q / Rational(2)) -> Rational(sq, c.den)))
      }
  }

  /** e^this for a rational value (∞ → ∞, −∞ → 0) — the exact
    * exponential the ApproxDP amplification and geometric-CMF threshold
    * algebra need (reference carries these as sympy `exp` expressions).
    */
  def exp: ExactNum = this match {
    case PosInf => PosInf
    case NegInf => zero
    case _: Finite =>
      require(isRational, s"exp of non-rational form unsupported: $this")
      finite(Map(Form(BigInt(1), toRational) -> Rational.one))
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
      val nz = f.terms.filter(!_._2.isZero).toSeq.sortBy(_._1)(Form.ordering)
      if (nz.isEmpty) "0"
      else
        nz.map { case (form, c) =>
          val parts = Seq(
            if (c == Rational.one && (form.rad != 1 || !form.q.isZero)) ""
            else c.toString,
            if (form.rad == 1) "" else s"√${form.rad}",
            if (form.q.isZero) "" else s"e^(${form.q})"
          ).filter(_.nonEmpty)
          if (parts.isEmpty) "1" else parts.mkString("·")
        }.mkString(" + ")
  }
}

object ExactNum {
  case object PosInf extends ExactNum
  case object NegInf extends ExactNum

  /** One multiplicative basis element √rad·e^q: rad a square-free
    * positive integer, q rational. `Form(1, 0)` is the rational unit.
    */
  final case class Form private[exact] (rad: BigInt, q: Rational)
      extends Serializable
  object Form {
    val unit: Form = Form(BigInt(1), Rational.zero)
    implicit val ordering: Ordering[Form] = Ordering.by(f => (f.rad, f.q))
  }

  /** Invariant: keys are √(square-free positive)·e^rational forms. */
  final case class Finite private[exact] (terms: Map[Form, Rational])
      extends ExactNum {
    /** Multiplicative inverse; supported for 1-term forms and 2-term
      * forms sharing one exponential factor (all the engine produces).
      */
    def inverse: ExactNum = {
      val nz = terms.filter(!_._2.isZero)
      nz.size match {
        case 0 => throw new ArithmeticException("division by zero")
        case 1 =>
          val (form, c) = nz.head
          // 1/(c·√s·e^q) = √s·e^{−q} / (c·s)
          finite(Map(Form(form.rad, -form.q) ->
            (Rational.one / (c * Rational(form.rad)))))
        case 2 =>
          // 1/((x+y)·e^q) = (x−y)·e^{−q}/(x²−y²); x²−y² is rational for
          // single radical terms sharing the exponent q
          val Seq((f1, c1), (f2, c2)) = nz.toSeq
          if (f1.q != f2.q)
            throw new UnsupportedOperationException(
              "inverse of a sum with distinct exponential factors")
          val x2 = c1 * c1 * Rational(f1.rad)
          val y2 = c2 * c2 * Rational(f2.rad)
          val denom = x2 - y2
          require(!denom.isZero, "inverse of zero")
          finite(Map(
            Form(f1.rad, -f1.q) -> c1 / denom,
            Form(f2.rad, -f2.q) -> (-c2 / denom)))
        case n =>
          throw new UnsupportedOperationException(
            s"inverse of $n-term radical sum"
          )
      }
    }
  }

  val zero: ExactNum = Finite(Map.empty)
  val one: ExactNum = Finite(Map(Form.unit -> Rational.one))

  def apply(n: Long): ExactNum = finite(Map(Form.unit -> Rational(n)))
  def apply(r: Rational): ExactNum =
    if (r.isZero) zero else Finite(Map(Form.unit -> r))
  def ratio(n: Long, d: Long): ExactNum = apply(Rational(n, d))
  def fromDouble(x: Double): ExactNum =
    if (x.isPosInfinity) PosInf
    else if (x.isNegInfinity) NegInf
    else apply(Rational.fromDouble(x))
  /** e^q for rational q, as an exact closure element. */
  def expOf(q: Rational): ExactNum = apply(q).exp

  private[exact] def finite(terms: Map[Form, Rational]): ExactNum = {
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
      terms: Map[Form, Rational],
      precision: Int,
      mode: RoundingMode
  ): JBigDecimal = {
    // Directed rounding per term: for CEILING/FLOOR keep direction w.r.t.
    // the sign of the coefficient.
    val mc = new MathContext(precision, RoundingMode.HALF_EVEN)
    var acc = JBigDecimal.ZERO
    var maxTerm = JBigDecimal.ONE
    for ((form, c) <- terms if !c.isZero) {
      val sqrtS =
        if (form.rad == 1) JBigDecimal.ONE
        else new JBigDecimal(form.rad.bigInteger).sqrt(mc)
      val expQ =
        if (form.q.isZero) JBigDecimal.ONE
        else graft.random.IvMath.expPoint(form.q.toBigDecimal(mc), precision)
      val term = c.toBigDecimal(mc).multiply(sqrtS, mc).multiply(expQ, mc)
      maxTerm = maxTerm.max(term.abs)
      acc = acc.add(term, mc)
    }
    // widen by an epsilon relative to the LARGEST term magnitude (not the
    // possibly-cancelled sum): each term carries rounding error proportional
    // to its own size (the √ and e^ factors are evaluated at the same
    // working precision), so a tiny sum of huge terms still gets a
    // wide-enough interval. (NOT acc.ulp — that is 1 for scale-0
    // BigDecimals.)
    val eps = acc.abs
      .max(maxTerm)
      .movePointLeft(precision - 4)
    mode match {
      case RoundingMode.CEILING => acc.add(eps)
      case RoundingMode.FLOOR   => acc.subtract(eps)
      case _                    => acc
    }
  }

  /** Sign of a symbolically-nonzero multi-term sum via interval
    * arithmetic at increasing precision.
    */
  private[exact] def numericSignum(terms: Map[Form, Rational]): Int = {
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
