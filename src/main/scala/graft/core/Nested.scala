package graft.core

/** Nested-map helpers for the dict-shaped results (reference
  * petk/tools.py:120-129 `key_exists`). */
object Nested {

  /** Probe a chain of keys through arbitrarily nested Maps. */
  @annotation.tailrec
  def keyExists(content: Any, keys: Any*): Boolean =
    if (keys.isEmpty) true
    else content match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[Any, Any]]
        mm.get(keys.head) match {
          case Some(next) => keyExists(next, keys.tail: _*)
          case None => false
        }
      case _ => false
    }
}
