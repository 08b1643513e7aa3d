package graft.codec

import org.scalacheck.Gen

/** Deterministic property-check driver shared by the codec suites (no
  * scalatestplus bridge in the offline cache): samples `gen` at seeds
  * 42..42+n with a rotating size sweep.
  */
object PropCheck {
  def forAll[A](gen: Gen[A], n: Int = 150)(f: A => Unit): Unit = {
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default.withSize(1 + (i * 7) % 200),
        org.scalacheck.rng.Seed(42L + i)).foreach(f)
      i += 1
    }
  }
}
