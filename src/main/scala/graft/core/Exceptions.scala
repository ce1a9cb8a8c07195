package graft.core

/** Engine exception hierarchy.
  *
  * Mirrors the reference's error surface
  * (/root/reference/interlinked/exceptions.py:1-17): a common base so
  * callers can catch every engine error in one handler.
  */
abstract class GraftException(msg: String) extends RuntimeException(msg)

/** Workflow graph has no root resources (exceptions.py:5). */
class NoRootException(msg: String) extends GraftException(msg)

/** Dependency cycle detected during validation (exceptions.py:9). */
class LoopException(msg: String) extends GraftException(msg)

/** A `depend` references a pattern no route provides (exceptions.py:13). */
class UnknownDependency(msg: String) extends GraftException(msg)

/** A pattern parameter value violates its typed specifier (exceptions.py:16). */
class InvalidValue(msg: String) extends GraftException(msg)

/** No route matches the requested resource name (workflow.py:197 KeyError). */
class RouteNotFound(msg: String) extends GraftException(msg)

/** Route/workflow registration conflicts (workflow.py:63,161 ValueError). */
class DuplicateRoute(msg: String) extends GraftException(msg)
