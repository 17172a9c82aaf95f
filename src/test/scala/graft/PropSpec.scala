package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-driver over scalacheck Gens (the scalatest–scalacheck
  * bridge artifact isn't in the offline cache, so samples are drawn
  * directly — deterministic seed, fixed case count).
  */
trait PropSpec {
  def forSamples[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(24)
    var seed = Seed(0xC0FFEE)
    (0 until n).foreach { _ =>
      f(gen.pureApply(params, seed))
      seed = seed.next
    }
  }
}
