package graft.measures

import graft.exact.ExactNum

/** Privacy measures and budgets (reference `src/tmlt/core/measures.py`). */
sealed trait Measure extends Serializable {
  def validate(budget: PrivacyBudget): Unit
}

case object PureDP extends Measure {
  def validate(b: PrivacyBudget): Unit =
    require(b.isInstanceOf[PureDPBudget], s"expected ε-budget, got $b")
}
case object ApproxDP extends Measure {
  def validate(b: PrivacyBudget): Unit =
    require(b.isInstanceOf[ApproxDPBudget], s"expected (ε,δ)-budget, got $b")
}
case object RhoZCDP extends Measure {
  def validate(b: PrivacyBudget): Unit =
    require(b.isInstanceOf[RhoZCDPBudget], s"expected ρ-budget, got $b")
}

/** A privacy-loss bound under one of the three measures; supports the
  * ordering/arithmetic the accountant needs (`measures.py:231-503`).
  */
sealed trait PrivacyBudget extends Serializable {
  def measure: Measure
  def isFinite: Boolean

  def +(that: PrivacyBudget): PrivacyBudget = (this, that) match {
    case (PureDPBudget(a), PureDPBudget(b))     => PureDPBudget(a + b)
    case (RhoZCDPBudget(a), RhoZCDPBudget(b))   => RhoZCDPBudget(a + b)
    case (ApproxDPBudget(e1, d1), ApproxDPBudget(e2, d2)) =>
      ApproxDPBudget(e1 + e2, (d1 + d2).min(ExactNum.one))
    case _ =>
      throw new IllegalArgumentException(s"measure mismatch: $this vs $that")
  }

  /** this − that, or None when that exceeds this. */
  def minus(that: PrivacyBudget): Option[PrivacyBudget] = (this, that) match {
    case (PureDPBudget(a), PureDPBudget(b)) =>
      if (b <= a) Some(PureDPBudget(if (a.isInfinite) a else a - b)) else None
    case (RhoZCDPBudget(a), RhoZCDPBudget(b)) =>
      if (b <= a) Some(RhoZCDPBudget(if (a.isInfinite) a else a - b)) else None
    case (ApproxDPBudget(e1, d1), ApproxDPBudget(e2, d2)) =>
      if (e2 <= e1 && d2 <= d1)
        Some(
          ApproxDPBudget(
            if (e1.isInfinite) e1 else e1 - e2,
            if (d1 == ExactNum.one) d1 else (d1 - d2).max(ExactNum.zero)
          )
        )
      else None
    case _ =>
      throw new IllegalArgumentException(s"measure mismatch: $this vs $that")
  }

  def covers(that: PrivacyBudget): Boolean = minus(that).isDefined
}

final case class PureDPBudget(epsilon: ExactNum) extends PrivacyBudget {
  require(epsilon >= ExactNum.zero, s"ε < 0: $epsilon")
  def measure: Measure = PureDP
  def isFinite: Boolean = epsilon.isFinite
}

final case class ApproxDPBudget(epsilon: ExactNum, delta: ExactNum)
    extends PrivacyBudget {
  require(epsilon >= ExactNum.zero, s"ε < 0: $epsilon")
  require(
    delta >= ExactNum.zero && delta <= ExactNum.one,
    s"δ ∉ [0,1]: $delta"
  )
  def measure: Measure = ApproxDP
  def isFinite: Boolean = epsilon.isFinite
}

final case class RhoZCDPBudget(rho: ExactNum) extends PrivacyBudget {
  require(rho >= ExactNum.zero, s"ρ < 0: $rho")
  def measure: Measure = RhoZCDP
  def isFinite: Boolean = rho.isFinite
}

object PrivacyBudget {
  def infinite(m: Measure): PrivacyBudget = m match {
    case PureDP   => PureDPBudget(ExactNum.PosInf)
    case ApproxDP => ApproxDPBudget(ExactNum.PosInf, ExactNum.one)
    case RhoZCDP  => RhoZCDPBudget(ExactNum.PosInf)
  }
}
