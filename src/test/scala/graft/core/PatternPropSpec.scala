package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based guards for the routing core: fmt/match round-trips
  * over generated values, typed-specifier rejection, and the
  * exact-beats-pattern precedence — the invariants every workflow
  * resolution relies on. (Raw ScalaCheck generators driven with a
  * fixed seed — the scalatest bridge artifact isn't on the offline
  * classpath.)
  */
class PatternPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val identGen: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.frequency(8 -> Gen.alphaLowerChar, 3 -> Gen.numChar, 1 -> Gen.const('_')))
  } yield (h :: t).mkString

  test("fmt then route-match round-trips the parameter value (identifier)") {
    samples(identGen).foreach { v =>
      val router = new Router[String]
      router.add("node.{name:identifier}", "X")
      val key = Pattern.fromString("node.{name:identifier}").fmt(Map("name" -> v))
      val m = router.matchKey(key)
      assert(m.nonEmpty && m.get.kw("name") == v, s"round-trip failed for '$v'")
    }
  }

  test("fmt then route-match round-trips int params, including negatives") {
    samples(Gen.chooseNum(Int.MinValue, Int.MaxValue)).foreach { n =>
      val router = new Router[String]
      router.add("run.{n:int}", "X")
      val key = Pattern.fromString("run.{n:int}").fmt(Map("n" -> n))
      val m = router.matchKey(key)
      assert(m.nonEmpty && m.get.kw("n").toLong == n.toLong, s"round-trip failed for $n")
    }
  }

  test("int specifier rejects any non-integer string") {
    val notInt = Gen.alphaStr.suchThat(s => s.nonEmpty && !s.forall(_.isDigit))
    samples(notInt).foreach { s =>
      intercept[InvalidValue] {
        Pattern.fromString("run.{n:int}").fmt(Map("n" -> s))
      }
    }
  }

  test("exact routes always win over pattern routes, whatever the registration order") {
    samples(Gen.zip(identGen, Gen.oneOf(true, false))).foreach { case (v, exactFirst) =>
      val router = new Router[String]
      val exactKey = s"node.$v"
      if (exactFirst) { router.add(exactKey, "EXACT"); router.add("node.{name}", "PAT") }
      else { router.add("node.{name}", "PAT"); router.add(exactKey, "EXACT") }
      assert(router.matchKey(exactKey).get.value == "EXACT")
      // a sibling key still reaches the pattern
      assert(router.matchKey(s"node.${v}x").get.value == "PAT")
    }
  }
}
