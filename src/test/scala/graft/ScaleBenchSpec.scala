package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the replica-independence claim behind the ScaleBench 100x tier:
  * the per-replica affine alphabet maps are 312 DISTINCT bijections, and
  * any two distinct maps agree on at most one letter — so no word of two
  * or more distinct letters (hence no shingle/gram) can collide across
  * replicas. If this breaks, a high replica tier silently degenerates
  * into a clone pathology and the scaling ratios measure dedup of
  * verbatim copies instead of a scale-up of the same workload. */
class ScaleBenchSpec extends AnyFunSuite {

  private val perms = (0 until 312).map(ScaleBench.affinePerm)

  test("all 312 replica maps are bijections of a-z") {
    perms.foreach { p =>
      assert(p.length == 26 && p.toSet.size == 26 &&
        p.toSet == ScaleBench.abc.toSet, s"not a bijection: $p")
    }
  }

  test("all 312 replica maps are pairwise distinct") {
    assert(perms.toSet.size == 312)
  }

  test("two distinct replica maps agree on at most two letters") {
    // f(i)=a1*i+b1 and g(i)=a2*i+b2 (mod 26) agree where (a1-a2)*i ==
    // b2-b1: both slopes are odd, so gcd(a1-a2, 26) is 2 (or 26 iff the
    // maps are equal) — 0 or exactly 2 solutions. A word collides across
    // replicas only if EVERY letter is an agreement point, so no word of
    // >= 3 distinct letters — hence no real-text shingle/gram — collides.
    for (i <- perms.indices; j <- (i + 1) until perms.length) {
      val agree = (0 until 26).count(k => perms(i)(k) == perms(j)(k))
      assert(agree <= 2,
        s"maps $i and $j agree on $agree letters — cross-replica " +
          "shingle collisions possible")
    }
  }

  test("replica 0 is the identity (1x tier is the untouched corpus)") {
    assert(perms(0) == ScaleBench.abc)
  }
}
