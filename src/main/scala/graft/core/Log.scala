package graft.core

/** Minimal verbosity-controlled logging for the core engine — the
  * analogue of the reference's module logger whose level the CLI's
  * -v/-vv flags raise (interlinked/cli.py:108-110,136-138). Level 0
  * is silent (warnings only), 1 = INFO, 2+ = DEBUG. Sink is
  * replaceable for tests.
  */
object Log {
  @volatile var level: Int = 0
  @volatile var sink: String => Unit = System.err.println(_)

  def info(msg: => String): Unit = if (level >= 1) sink(s"INFO $msg")
  def debug(msg: => String): Unit = if (level >= 2) sink(s"DEBUG $msg")
}
