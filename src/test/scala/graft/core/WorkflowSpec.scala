package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Mirrors /root/reference/tests/test_workflow.py, test_loop.py,
  * test_validation.py, test_mutate.py, test_config.py behavior.
  */
class WorkflowSpec extends AnyFunSuite {

  private def freshWkf(name: String): Workflow = {
    Workflow.unregister(name)
    new Workflow(name)
  }

  private def echoWkf(name: String): Workflow = {
    val wkf = freshWkf(name)
    wkf.provideEach("echo", "echo.{name}") { ctx => ctx.str("name", "default") }
    wkf
      .provide("many_echo") { ctx =>
        val v = ctx.str("value")
        Seq.fill(ctx.int("repeat", 2))(v).mkString(" ")
      }
      .depend("value" -> "echo.test")
    wkf
  }

  test("run without depends: default, matched param, explicit param") {
    val wkf = echoWkf("spec-echo")
    assert(wkf.run("echo") == "default")
    assert(wkf.run("echo.test") == "test")
    assert(wkf.run("echo.{name}", "name" -> "explicit") == "explicit")
    intercept[RouteNotFound](wkf.byName("spam"))
  }

  test("run with depends + derived kw workflow") {
    val wkf = echoWkf("spec-echo2")
    assert(wkf.run("many_echo") == "test test")
    val bis = wkf.kw("repeat" -> 3, "name" -> "test")
    assert(bis.run("many_echo") == "test test test")
  }

  test("per-run cache: shared deps run once within a run") {
    val logs = mutable.Map[String, Int]().withDefaultValue(0)
    val wkf = freshWkf("spec-cache")
    wkf.provide("logged.{name}") { ctx =>
      val n = ctx.str("name"); logs(n) += 1; n
    }
    wkf
      .provide("logged-repeater.{name}") { ctx =>
        ctx.str("first") + ctx.str("second")
      }
      .depend("first" -> "logged.{name}", "second" -> "logged.{name}")

    wkf.run("logged.ham"); wkf.run("logged.ham"); wkf.run("logged.spam")
    assert(logs == Map("ham" -> 2, "spam" -> 1))
    assert(wkf.run("logged-repeater.foo") == "foofoo")
    assert(logs("foo") == 1)
  }

  test("multi-provide: one execution feeds all patterns") {
    val logs = mutable.Map[String, Int]().withDefaultValue(0)
    val wkf = freshWkf("spec-multi")
    wkf.provide("upper.{name}", "lower.{name}") { ctx =>
      logs("multi") += 1
      val n = ctx.str("name")
      (n.toUpperCase, n.toLowerCase)
    }
    wkf
      .provide("upper-and-lower.{name}") { ctx =>
        ctx.str("upper") + ctx.str("lower")
      }
      .depend("upper" -> "upper.{name}", "lower" -> "lower.{name}")

    assert(wkf.run("upper-and-lower.spam") == "SPAMspam")
    assert(logs("multi") == 1)
    assert(wkf.run("upper-and-lower.FOO") == "FOOfoo")
    assert(logs("multi") == 2)
  }

  test("typed route params on provide (uuid)") {
    val wkf = freshWkf("spec-uuid")
    wkf.provide("lower.{name:uuid}", "upper.{name:uuid}") { ctx =>
      val n = ctx.str("name")
      (n.toLowerCase, n.toUpperCase)
    }
    val u = "40b4550b-f1dd-4846-bc70-d8f5f235e72b"
    assert(wkf.run(s"lower.$u") == u)
    assert(wkf.run(s"upper.$u") == u.toUpperCase)
  }

  test("provide duplicate guard + override") {
    val wkf = freshWkf("spec-override")
    wkf.provide("echo") { _ => "default" }
    intercept[DuplicateRoute](wkf.provide("echo") { _ => "boom" })
    wkf.provideOverride("echo") { _ => "override" }
    assert(wkf.run("echo") == "override")
  }

  test("mutate post-processes kwargs (test_mutate.py)") {
    val wkf = freshWkf("spec-mutate")
    wkf.provide("value") { _ => 10 }
    wkf
      .provide("doubled") { ctx => ctx.as[Int]("value") }
      .depend("value" -> "value")
      .mutate("value" -> (ctx => ctx.as[Int]("value") * 2))
    assert(wkf.run("doubled") == 20)
  }

  test("validate: loop detection (test_loop.py)") {
    val loopy = freshWkf("spec-loopy")
    loopy.provide("first") { _ => 1 }.depend("value" -> "third", "other" -> "zero")
    loopy.provide("zero") { _ => 0 }
    loopy.provide("second") { _ => 2 }.depend("value" -> "first")
    loopy.provide("third") { _ => 3 }.depend("value" -> "second")
    intercept[LoopException](loopy.validate())
  }

  test("validate: ok graph passes, unknown dependency raises") {
    val base = freshWkf("spec-base")
    base.provide("first") { _ => 1 }
    base.provide("second") { _ => 2 }.depend("value" -> "first")
    base.validate()

    val bad = freshWkf("spec-bad")
    bad.provide("a") { _ => 1 }.depend("value" -> "nope")
    intercept[UnknownDependency](bad.deps())
  }

  test("validate: no roots raises (self-cycle graph)") {
    val wkf = freshWkf("spec-noroot")
    wkf.provide("a") { _ => 1 }.depend("value" -> "b")
    wkf.provide("b") { _ => 1 }.depend("value" -> "a")
    intercept[NoRootException](wkf.validate())
  }

  test("config entries injected by route with formatting (test_config.py)") {
    val cfg = Map(
      "hello.{world}" -> Map("param" -> " from conf"),
      "hello.ham" -> Map("param" -> " FROM CONF")
    )
    val wkf = freshWkf("spec-config")
    wkf.setConfig(cfg)
    wkf.provideEach("hello", "hello.{world}") { ctx =>
      s"hello ${ctx.str("world")}${ctx.str("param", "")}"
    }
    assert(wkf.run("hello.spam") == "hello spam from conf")
    assert(wkf.run("hello.ham") == "hello ham FROM CONF")
  }

  test("config formatting uses matched route params in values") {
    val wkf = freshWkf("spec-config-fmt")
    wkf.setConfig(Map("greet.{who}" -> Map("path" -> "/data/{who}.parquet")))
    wkf.provide("greet.{who}") { ctx => ctx.str("path") }
    assert(wkf.run("greet.spam") == "/data/spam.parquet")
  }

  test("config wins over extra kw (reference precedence)") {
    val wkf = freshWkf("spec-prec")
    wkf.setConfig(Map("x" -> Map("p" -> "config")))
    wkf.provide("x") { ctx => ctx.str("p") }
    assert(wkf.run("x", "p" -> "extra") == "config")
  }

  test("clone keeps cells; new routes don't leak back") {
    val wkf = freshWkf("spec-clone")
    wkf.provide("a") { _ => "a" }
    val c = wkf.cloneWorkflow(name = "spec-clone2")
    c.provide("b") { _ => "b" }
    assert(c.run("a") == "a")
    assert(c.run("b") == "b")
    intercept[RouteNotFound](wkf.byName("b"))
  }

  test("registry: duplicate names rejected, lookup works") {
    val w = freshWkf("spec-registry")
    assert(Workflow.get("spec-registry").contains(w))
    intercept[DuplicateRoute](new Workflow("spec-registry"))
  }

  test("custom resolver rebinds dependency resolution (README example)") {
    // reference README: wkf.resolve = lambda target: wkf.run(target).upper()
    val wkf = echoWkf("spec-resolver")
    wkf.resolver = Some((resolve, name) => String.valueOf(resolve(name)).toUpperCase)
    assert(wkf.run("many_echo") == "TEST TEST")
    // clone inherits the rebound resolver
    assert(wkf.cloneWorkflow(name = "spec-resolver2").run("many_echo") == "TEST TEST")
  }

  test("runAll shares one cache across targets") {
    val logs = mutable.Map[String, Int]().withDefaultValue(0)
    val wkf = freshWkf("spec-runall")
    wkf.provide("src") { _ => logs("src") += 1; 1 }
    wkf.provide("a").apply { ctx => ctx.as[Int]("v") + 1 }.depend("v" -> "src")
    wkf.provide("b").apply { ctx => ctx.as[Int]("v") + 2 }.depend("v" -> "src")
    assert(wkf.runAll(Seq("a", "b")) == Seq(2, 3))
    assert(logs("src") == 1)
  }

  test("default shortcut surface: ready workflow with bare helpers (workflow.py:274-279)") {
    val cell = default.provide("shortcut.echo") { ctx => ctx.str("who", "nobody") }
    default.depend(cell) // no-op chain, same Cell
    assert(default.workflow.name == "default_workflow")
    assert(default.run("shortcut.echo") == "nobody")
    assert(default.run("shortcut.echo", "who" -> "me") == "me")
    default.setConfig(Map("shortcut.echo" -> Map("who" -> "conf")))
    assert(default.run("shortcut.echo") == "conf")
    default.setConfig(Map.empty) // leave no config for other suites
  }

  test("multi-provide via literal pattern route formats cache keys from extra kwargs") {
    val wkf = freshWkf("spec-multifmt")
    wkf.provide("pair.{n}.left", "pair.{n}.right") { ctx =>
      (s"L${ctx.str("n")}", s"R${ctx.str("n")}")
    }
    // resolving the literal pattern string: params arrive as extra
    // kwargs, not matched route params — used to die with a bare
    // NoSuchElementException when caching the sibling pattern
    assert(wkf.run("pair.{n}.left", "n" -> "7") == "L7")
  }
}
