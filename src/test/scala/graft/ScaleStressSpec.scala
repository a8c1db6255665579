package graft

import org.scalatest.funsuite.AnyFunSuite

/** The replica-construction invariants SCALING.md rests on (the r10
  * ADVICE finding): copy tags must be fixed-width and letters-only, so
  * no copy's token transform can collide with another's at ANY factor —
  * `q10` + 'foo' and `q1` + '0foo' both produced 'q10foo' under the old
  * variable-width digit scheme. */
class ScaleStressSpec extends AnyFunSuite {

  test("copy tags: fixed width, letters-only, unique across the full factor range") {
    val tags = (1 until 26 * 26).map(ScaleStress.copyTag)
    assert(tags.forall(_.length == 2), "tag width must be fixed")
    assert(tags.forall(_.forall(c => c >= 'a' && c <= 'z')), "tags must be letters-only")
    assert(tags.distinct.size == tags.size, "tags must be unique per copy")
    // the collision that motivated the fix cannot be reconstructed: a
    // tag followed by any token text can never equal a DIFFERENT tag
    // followed by other text, because equal-width distinct prefixes
    // differ within the first two characters
    assert(ScaleStress.copyTag(1) != ScaleStress.copyTag(10).take(2))
    intercept[IllegalArgumentException](ScaleStress.copyTag(0))
    intercept[IllegalArgumentException](ScaleStress.copyTag(26 * 26))
  }
}
