package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness over ScalaCheck generators
  * (scalatestplus bridge is not on the classpath; this is all we need).
  * Fixed seed → reproducible runs. */
trait PropCheck {
  def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      val a = gen.pureApply(Gen.Parameters.default, seed)
      f(a)
      seed = seed.next
    }
  }
}
