package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/tests/test_route.py behavior. */
class RouterSpec extends AnyFunSuite {

  test("simple routes: exact match, no false positives") {
    val router = new Router[Int]
    val routes = Map("one" -> 1, "one.two" -> 2, "one.two.three" -> 3)
    routes.foreach { case (k, v) => router.add(k, v) }
    routes.foreach { case (k, v) =>
      assert(router.matchKey(k).get.value == v)
    }
    for (bad <- Seq("spam", "one.spam.three"))
      assert(router.matchKey(bad).isEmpty)
  }

  test("parameterized routes capture params") {
    val router = new Router[String]
    router.add("{one:identifier}", "r1")
    router.add("one.{two:identifier}", "r2")
    router.add("one.{two:identifier}.{three:identifier}", "r3")

    val m1 = router.matchKey("a").get
    assert(m1.value == "r1" && m1.kw == Map("one" -> "a"))

    val m2 = router.matchKey("one.b").get
    assert(m2.value == "r2" && m2.kw == Map("two" -> "b"))

    val m3 = router.matchKey("one.b.c").get
    assert(m3.value == "r3" && m3.kw == Map("two" -> "b", "three" -> "c"))

    for (bad <- Seq("spam.b.c", "one.b.c.d"))
      assert(router.matchKey(bad).isEmpty)
  }

  test("typed params: int, str, path, uuid, datetime, ambiguity") {
    val router = new Router[String]
    router.add("one/{one:int}", "int")
    router.add("two/{two:str}", "str")
    router.add("/three/{parents:path}/{name}.{ext}", "path")
    router.add("four/{four:uuid}", "uuid")
    router.add("five_{ham}_{spam}", "amb")
    router.add("six_{ham}-{spam:uuid}", "amb2")
    router.add("seven_{dt:datetime}", "dt")

    assert(router.matchKey("one/10").get.kw == Map("one" -> "10"))
    assert(router.matchKey("one/ten").isEmpty)
    assert(router.matchKey("two/two").get.kw == Map("two" -> "two"))

    val p = router.matchKey("/three/some/path/file.txt").get
    assert(p.kw == Map("parents" -> "some/path", "name" -> "file", "ext" -> "txt"))

    for (
      uuid <- Seq(
        "40B4550B-F1DD-4846-BC70-D8F5F235E72B",
        "40b4550b-f1dd-4846-bc70-d8f5f235e72b"
      )
    ) assert(router.matchKey("four/" + uuid).get.kw == Map("four" -> uuid))

    // greedy ambiguity on '_' — same as python re greediness
    assert(
      router.matchKey("five_one_two_three").get.kw ==
        Map("ham" -> "one_two", "spam" -> "three")
    )
    assert(
      router.matchKey("six_one-40b4550b-f1dd-4846-bc70-d8f5f235e72b").get.kw ==
        Map("ham" -> "one", "spam" -> "40b4550b-f1dd-4846-bc70-d8f5f235e72b")
    )

    assert(
      router.matchKey("seven_2021-01-01T12:00:00+02:00").get.kw ==
        Map("dt" -> "2021-01-01T12:00:00+02:00")
    )
    assert(
      router.matchKey("seven_2021-01-01T12:00:00").get.kw ==
        Map("dt" -> "2021-01-01T12:00:00")
    )
  }

  test("anonymous pattern is rejected") {
    val router = new Router[Int]
    intercept[InvalidValue](router.add("bad.{}", 1))
  }

  test("get with default and contains") {
    // NB: param names need >= 2 chars (reference ID_PATTERN
    // router.py:15 requires [a-z][a-z0-9:_]+) — `{b}` would be literal.
    val router = new Router[Int]("a.{bb}" -> 7)
    assert(router.get("a.x", -1) == 7)
    assert(router.get("zzz", -1) == -1)
    assert(router.contains("a.{bb}"))
    assert(!router.contains("a.x"))
  }

  test("clone is independent for new routes") {
    val router = new Router[Int]("a" -> 1)
    val c = router.copyRouter()
    c.add("b", 2)
    assert(c.matchKey("b").nonEmpty)
    assert(router.matchKey("b").isEmpty)
  }
}

/** Mirrors /root/reference/tests/test_format_dict.py (rformat). */
class ConfigSpec extends AnyFunSuite {
  test("rformat formats nested keys, values, and lists") {
    val cfg = Map(
      "key-{name}" -> Map("nested" -> "value-{name}"),
      "plain" -> Seq("a-{name}", "b")
    )
    val out = Config.rformat(cfg, Map("name" -> "x")).asInstanceOf[Map[String, Any]]
    assert(out("key-x").asInstanceOf[Map[String, Any]]("nested") == "value-x")
    assert(out("plain").asInstanceOf[Seq[Any]] == Seq("a-x", "b"))
  }

  test("pattern specifier validation raises InvalidValue") {
    val p = Pattern.fromString("run.{n:int}")
    assert(p.fmt(Map("n" -> "42")) == "run.42")
    intercept[InvalidValue](p.fmt(Map("n" -> "notanint")))
  }
}
