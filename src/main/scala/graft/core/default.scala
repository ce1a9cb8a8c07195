package graft.core

/** Module-level shortcut surface — the analogue of the reference's
  * ready-made default workflow and bare helpers
  * (interlinked/workflow.py:274-279, re-exported by
  * interlinked/__init__.py): users following the reference docs can
  * start with `default.provide(...)` / `default.run(...)` without
  * constructing a Workflow first.
  *
  * The reference's `depend`/`mutate` are fn-keyed decorators stacked
  * on `@provide`; the Scala analogue is chaining on the Cell that
  * `provide` returns, so `default.depend(cell, ...)` takes the cell
  * explicitly (same cells, same semantics, no function-identity
  * lookup).
  */
object default {

  /** The ready workflow, registered as "default_workflow" like the
    * reference's.
    */
  lazy val workflow: Workflow =
    Workflow.get("default_workflow").getOrElse(new Workflow("default_workflow"))

  def run(target: String, extraKw: (String, Any)*): Any =
    workflow.run(target, extraKw: _*)

  def provide(patterns: String*): Cell = workflow.provide(patterns: _*)

  def provideEach(patterns: String*): CellGroup = workflow.provideEach(patterns: _*)

  def depend(cell: Cell, deps: (String, String)*): Cell = cell.depend(deps: _*)

  def mutate(cell: Cell, muts: (String, Ctx => Any)*): Cell = cell.mutate(muts: _*)

  def setConfig(config: Map[String, Any]): Unit = workflow.setConfig(config)
}
