package graft.core

import scala.collection.immutable.ListMap
import scala.collection.mutable

/** Keyword context handed to every node function.
  *
  * The reference binds Python kwargs by inspecting function signatures
  * (/root/reference/interlinked/workflow.py:282-315 `bind`); Scala has
  * no runtime kwargs, so graft passes one immutable map with typed
  * accessors and the node picks what it needs — same filtering
  * semantics, statically visible.
  */
final case class Ctx(kw: Map[String, Any]) {
  def apply(name: String): Any =
    kw.getOrElse(name, throw new NoSuchElementException(s"key not found: $name"))
  def get(name: String): Option[Any] = kw.get(name)
  def getOrElse(name: String, default: => Any): Any = kw.getOrElse(name, default)
  def str(name: String): String = String.valueOf(apply(name))
  def str(name: String, default: => String): String =
    kw.get(name).map(String.valueOf(_)).getOrElse(default)
  def int(name: String, default: => Int): Int = kw.get(name) match {
    case Some(i: Int)    => i
    case Some(l: Long)   => l.toInt
    case Some(s: String) => s.toInt
    case Some(other)     => String.valueOf(other).toInt
    case None            => default
  }
  def double(name: String, default: => Double): Double = kw.get(name) match {
    case Some(d: Double) => d
    case Some(i: Int)    => i.toDouble
    case Some(s: String) => s.toDouble
    case Some(other)     => String.valueOf(other).toDouble
    case None            => default
  }
  /** Typed fetch for resolved dependencies (e.g. DataFrames). */
  def as[T](name: String): T = apply(name).asInstanceOf[T]
}

/** A node: one or more route patterns bound to a function, plus its
  * dependencies and kwarg mutators.
  * Reference: Cell (/root/reference/interlinked/workflow.py:23-46).
  */
final class Cell private[core] (
    val workflow: Workflow,
    val patterns: Seq[Pattern],
    val baseKw: Map[String, Any]
) {
  private[core] var fn: Ctx => Any = _
  private[core] var dependencies: ListMap[String, Pattern] = ListMap.empty
  private[core] var mutators: ListMap[String, Ctx => Any] = ListMap.empty
  /** Materialization policy for this cell's result — see
    * Workflow.materializer (Spark-first addition: reference caches per
    * run in a dict; on Spark the result is a lazy plan and the policy
    * decides cache/checkpoint).
    */
  private[core] var materialize: Option[String] = None

  def apply(f: Ctx => Any): Cell = { fn = f; this }

  /** Declare dependencies: alias -> resource pattern. Later `depend`
    * calls do NOT override earlier aliases (workflow.py:44-46).
    */
  def depend(deps: (String, String)*): Cell = {
    val converted = deps.map { case (k, v) => k -> Pattern.fromString(v) }
    dependencies = ListMap(converted: _*) ++ dependencies
    this
  }

  /** Declare kwarg mutators: alias -> fn(ctx). Later `mutate` calls do
    * NOT override earlier aliases (workflow.py:180-186).
    */
  def mutate(muts: (String, Ctx => Any)*): Cell = {
    mutators = ListMap(muts: _*) ++ mutators
    this
  }

  def cached(): Cell = { materialize = Some("cache"); this }
  def checkpointed(): Cell = { materialize = Some("checkpoint"); this }

  /** The declared materialization policy (read by materializers). */
  def materializePolicy: Option[String] = materialize
}

/** Several cells sharing one function (stacked-decorator equivalent);
  * forwards the function and depend/mutate declarations to every cell.
  */
final class CellGroup private[core] (val cells: Seq[Cell]) {
  def apply(f: Ctx => Any): CellGroup = { cells.foreach(_.apply(f)); this }
  def depend(deps: (String, String)*): CellGroup = {
    cells.foreach(_.depend(deps: _*)); this
  }
  def mutate(muts: (String, Ctx => Any)*): CellGroup = {
    cells.foreach(_.mutate(muts: _*)); this
  }
  def cached(): CellGroup = { cells.foreach(_.cached()); this }
}

/** Pattern-routed workflow/DAG engine — the Spark-native re-expression
  * of the reference Workflow (/root/reference/interlinked/workflow.py:49-210).
  *
  * Node functions typically return lazy Spark DataFrames, so resolving
  * a target composes ONE Catalyst plan across all upstream cells:
  * cross-node filter pushdown / column pruning / join reordering are
  * free, unlike the reference's eager per-node Python execution.
  */
final class Workflow private (
    val name: String,
    private[core] val router: Router[Cell],
    private[core] var baseKw: Map[String, Any],
    private[core] var configRouter: Router[Any]
) {
  private var validated = false
  /** Hook applied to every cell result after execution; Spark binding
    * installs cache/checkpoint behavior here (see graft.Materializers).
    */
  var materializer: (Cell, Any) => Any = (_, res) => res

  /** Custom dependency resolution — the reference's rebindable
    * `wkf.resolve` (README "custom dependency resolution",
    * workflow.py:242): when set, every dependency is reified through
    * this hook instead of the default run-and-return. Receives the
    * default resolver so it can delegate.
    * `wkf.resolver = Some((resolve, name) => post(resolve(name)))`
    */
  var resolver: Option[(String => Any, String) => Any] = None

  def this(name: String) = {
    this(name, new Router[Cell], Map.empty, new Router[Any])
    Workflow.register(this)
  }

  def setConfig(config: Map[String, Any]): Unit = {
    configRouter = new Router[Any]
    config.foreach { case (k, v) => configRouter.add(k, v) }
  }

  /** Register `patterns` for a node; returns the Cell to attach the
    * function and its depend/mutate declarations.
    * `wkf.provide("echo", "echo.{name}") { ctx => ... }`
    */
  def provide(patterns: String*): Cell = provideImpl(patterns, overrideExisting = false, Map.empty)

  def provide(patterns: Seq[String], kw: Map[String, Any]): Cell =
    provideImpl(patterns, overrideExisting = false, kw)

  def provideOverride(patterns: String*): Cell =
    provideImpl(patterns, overrideExisting = true, Map.empty)

  /** One cell per pattern, all sharing the same function — the Scala
    * equivalent of the reference's stacked `@provide` decorators
    * (each decorator call makes its own Cell; `depend`/`mutate` then
    * apply to every cell of that function via `by_fn`,
    * workflow.py:40,173-177). Contrast with multi-pattern `provide`,
    * where ONE cell returns a tuple (one element per pattern).
    */
  def provideEach(patterns: String*): CellGroup =
    new CellGroup(patterns.map(p => provideImpl(Seq(p), overrideExisting = false, Map.empty)))

  private def provideImpl(
      patterns: Seq[String],
      overrideExisting: Boolean,
      kw: Map[String, Any]
  ): Cell = {
    validated = false
    if (!overrideExisting)
      patterns.foreach { p =>
        if (router.contains(p))
          throw new DuplicateRoute(s"$p already defined in Workflow '$name'")
      }
    val cell = new Cell(this, patterns.map(Pattern.fromString), kw)
    patterns.foreach(p => router.add(p, cell))
    cell
  }

  /** Find the cell matching `name` (exact or via pattern). */
  def byName(resource: String): RouteMatch[Cell] =
    router.matchKey(resource).getOrElse(
      throw new RouteNotFound(s"No resource found in workflow for '$resource'")
    )

  /** Build the {parent -> children} dependency graph
    * (workflow.py:107-130).
    */
  def deps(): Map[String, Seq[String]] = {
    val p2c = mutable.LinkedHashMap[String, mutable.ListBuffer[String]]()
    router.keys.foreach(p => p2c(p) = mutable.ListBuffer.empty)
    for (pattern <- router.keys) {
      val cell = router.matchKey(pattern).get.value
      for (dep <- cell.dependencies.values) {
        val parent = dep.pattern
        val resolved =
          if (p2c.contains(parent)) parent
          else
            router.matchKey(parent) match {
              case Some(m) => m.route
              case None =>
                throw new UnknownDependency(
                  s"Dependency '$parent' is not known in workflow '$name'"
                )
            }
        p2c(resolved) += pattern
      }
    }
    p2c.map { case (k, v) => k -> v.toSeq }.toMap
  }

  /** Validate the graph: roots exist, no cycles (workflow.py:83-105). */
  def validate(): Unit = {
    if (validated) return
    val d = deps()
    val children = d.values.flatten.toSet
    val roots = d.keySet -- children
    if (roots.isEmpty)
      throw new NoRootException(s"No roots for workflow '$name'")
    def walk(parent: String, ancestors: List[String]): Unit =
      for (child <- d(parent)) {
        if (ancestors.contains(child))
          throw new LoopException(
            s"""Loop detected in workflow "$name" (validation failed when evaluating "$child")"""
          )
        walk(child, child :: ancestors)
      }
    roots.foreach(walk(_, Nil))
    validated = true
  }

  /** Derived workflow sharing cells, with overlaid kw/config
    * (workflow.py:132-153).
    */
  def cloneWorkflow(
      name: String = null,
      config: Option[Map[String, Any]] = None,
      kw: Map[String, Any] = Map.empty
  ): Workflow = {
    val newName = Option(name).getOrElse(this.name + "_clone")
    val w = new Workflow(
      newName,
      router.copyRouter(),
      baseKw ++ kw,
      config.fold(configRouter.copyRouter()) { cfg =>
        val r = new Router[Any]; cfg.foreach { case (k, v) => r.add(k, v) }; r
      }
    )
    w.materializer = materializer
    w.resolver = resolver
    Workflow.register(w)
    w
  }

  /** Derived workflow with extra base kwargs (workflow.py:149-150). */
  def kw(extra: (String, Any)*): Workflow =
    cloneWorkflow(kw = extra.toMap)

  /** Derived workflow with replacement config (workflow.py:152-153). */
  def config(cfg: Map[String, Any]): Workflow =
    cloneWorkflow(config = Some(cfg))

  /** Resolve and execute a single target. */
  def run(target: String, extraKw: (String, Any)*): Any =
    new Run(this, extraKw.toMap).resolve(target)

  /** Resolve several targets within one run (shared cache). */
  def runAll(targets: Seq[String], extraKw: (String, Any)*): Seq[Any] = {
    val r = new Run(this, extraKw.toMap)
    targets.map(r.resolve)
  }
}

object Workflow {
  private val registry = mutable.Map[String, Workflow]()

  private def register(w: Workflow): Unit =
    if (w.name != null && w.name.nonEmpty) synchronized {
      if (registry.contains(w.name))
        throw new DuplicateRoute(s"Workflow ${w.name} already defined!")
      registry(w.name) = w
    }

  def get(name: String): Option[Workflow] = synchronized(registry.get(name))

  /** Test hook: drop a name so suites can re-register. */
  private[graft] def unregister(name: String): Unit =
    synchronized(registry.remove(name))
}

/** One resolution pass with its own cache
  * (/root/reference/interlinked/workflow.py:213-270). Node results are
  * cached per resource name; a multi-pattern cell caches every pattern
  * it provides, formatted with the matched params.
  */
final class Run(wkf: Workflow, extraKw: Map[String, Any]) {
  private val cache = mutable.Map[String, Any]()

  def resolve(resourceName: String): Any = {
    cache.get(resourceName) match {
      case Some(res) => return res
      case None      =>
    }
    val m = wkf.byName(resourceName)
    val cell = m.value
    Log.debug(s"resolve '$resourceName' (workflow ${wkf.name})")

    // Config entry for this resource, recursively formatted with the
    // matched route params (workflow.py:227-229).
    val configEntry: Map[String, Any] =
      wkf.configRouter.getOption(resourceName) match {
        case Some(cfg: Map[_, _]) =>
          Config
            .rformat(cfg, m.kw.map { case (k, v) => k -> (v: Any) })
            .asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      }

    // Precedence: base < cell kw < matched params < extra < config
    // (workflow.py:231 — config wins last).
    var kw: Map[String, Any] =
      wkf.baseKw ++ cell.baseKw ++ m.kw ++ extraKw ++ configEntry

    // Resolve dependencies depth-first through this run's cache.
    for ((alias, depPattern) <- cell.dependencies) {
      val resource =
        try depPattern.fmt(kw)
        catch {
          case e: NoSuchElementException =>
            throw new RouteNotFound(
              s"Missing dependency ${depPattern.pattern} for $resourceName in workflow ${wkf.name}: ${e.getMessage}"
            )
        }
      val resolved = wkf.resolver match {
        case Some(custom) => custom(resolve, resource)
        case None         => resolve(resource)
      }
      kw = kw + (alias -> resolved)
    }

    // Apply mutators over the assembled kwargs (workflow.py:246-247).
    for ((alias, mfn) <- cell.mutators)
      kw = kw + (alias -> mfn(Ctx(kw)))

    val res = wkf.materializer(cell, cell.fn(Ctx(kw)))

    if (cell.patterns.size == 1) {
      cache(resourceName) = res
      res
    } else {
      // Multi-provide: function returns one element per pattern
      // (workflow.py:264-270).
      val parts: Seq[Any] = res match {
        case s: Seq[_]    => s
        case p: Product   => p.productIterator.toSeq
        case other        =>
          throw new InvalidValue(
            s"Multi-provide cell for $resourceName must return a Seq/Tuple, got $other"
          )
      }
      require(
        parts.size == cell.patterns.size,
        s"Multi-provide arity mismatch for $resourceName"
      )
      cell.patterns.zip(parts).foreach { case (p, r) =>
        // Cache keys format each sibling pattern with the matched
        // params, falling back to run-level extra kwargs (a
        // parameterized route resolved by its literal pattern string
        // carries its params there, not in m.kw). Anything still
        // missing gets a descriptive error naming route + param
        // instead of a bare NoSuchElementException (the reference has
        // the same latent KeyError, workflow.py:264-270).
        val fmtKw = extraKw ++ m.kw.map { case (k, v) => k -> (v: Any) }
        val key =
          try p.fmt(fmtKw)
          catch {
            case e: NoSuchElementException =>
              throw new InvalidValue(
                s"Cannot cache multi-provide route '${p.pattern}' for $resourceName: " +
                  s"missing param ${e.getMessage}"
              )
          }
        cache(key) = r
      }
      parts(cell.patterns.map(_.pattern).indexOf(m.route))
    }
  }
}

/** Recursive `{param}` formatting over nested config structures
  * (reference `rformat`, workflow.py:318-339): map keys and values,
  * sequence elements, and plain strings are all formatted.
  */
object Config {
  def rformat(cfg: Any, kw: Map[String, Any]): Any = cfg match {
    case m: Map[_, _] =>
      m.map { case (k, v) => rformat(k, kw) -> rformat(v, kw) }
    case s: Seq[_]  => s.map(rformat(_, kw))
    case s: String  => Pattern.fromString(s).fmt(kw)
    case other      => other
  }
}
