package graft.examples

import graft.core._

/** The reference README quickstart (/root/reference/README.md)
  * re-expressed against graft's public API, plus the error surface.
  * Run: sbt "runMain graft.examples.Quickstart"
  */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val wkf = new Workflow("quickstart")
    wkf.provideEach("echo", "echo.{name}") { ctx => ctx.str("name", "default") }
    wkf
      .provide("many_echo") { ctx =>
        Seq.fill(ctx.int("repeat", 2))(ctx.str("value")).mkString(" ")
      }
      .depend("value" -> "echo.test")

    println("run(echo.spam)      = " + wkf.run("echo.spam"))
    println("run(many_echo, r=4) = " + wkf.run("many_echo", "repeat" -> 4))

    // Config injection with route-param formatting
    wkf.setConfig(Map("hello.{world}" -> Map("param" -> " from conf")))
    wkf.provideEach("hello.{world}") { ctx =>
      s"hello ${ctx.str("world")}${ctx.str("param", "")}"
    }
    println("run(hello.spam)     = " + wkf.run("hello.spam"))

    wkf.validate()
    println("validate: ok")
    println("deps: " + wkf.deps().map { case (k, v) => s"$k->[${v.mkString(",")}]" }.mkString(" "))

    // Error surface
    try wkf.run("nope")
    catch { case e: RouteNotFound => println("RouteNotFound: " + e.getMessage) }

    val loopy = new Workflow("quickstart-loopy")
    loopy.provide("a") { _ => 1 }.depend("v" -> "b")
    loopy.provide("b") { _ => 1 }.depend("v" -> "a")
    try loopy.validate()
    catch { case e: GraftException => println(e.getClass.getSimpleName + ": " + e.getMessage) }

    try Pattern.fromString("run.{n:int}").fmt(Map("n" -> "xx"))
    catch { case e: InvalidValue => println("InvalidValue: " + e.getMessage) }

    try new Workflow("quickstart")
    catch { case e: DuplicateRoute => println("DuplicateRoute: " + e.getMessage) }

    // Module-level shortcut surface: the ready default workflow
    // (reference interlinked/__init__.py — `from interlinked import
    // provide, run`)
    default.provide("qs.greet") { ctx => "hi " + ctx.str("who", "there") }
    println("default.run(qs.greet) = " + default.run("qs.greet", "who" -> "graft"))
  }
}
