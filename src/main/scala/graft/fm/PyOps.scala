package graft.fm

import java.{util => ju}
import scala.jdk.CollectionConverters._

/** Python's TypeError for unorderable comparisons — mutation operators
  * surface it as a per-file warning (reference `server.py:585-586`).
  */
final class PyTypeError(msg: String) extends RuntimeException(msg)

/** Python `==` / `<` semantics over YAML-derived values, needed by the
  * array mutation operators: `value in list` membership uses `__eq__`
  * (numbers compare cross-type, `True == 1`), and `sorted()` raises
  * TypeError on mixed incomparable types (reference `server.py:365-367,
  * 434-437, 501-505, 568-583, 645-650`).
  */
object PyOps {

  private def asNum(v: Any): Option[java.math.BigDecimal] = v match {
    case b: java.lang.Boolean   => Some(java.math.BigDecimal.valueOf(if (b) 1L else 0L))
    case i: java.lang.Integer   => Some(java.math.BigDecimal.valueOf(i.longValue()))
    case l: java.lang.Long      => Some(java.math.BigDecimal.valueOf(l.longValue()))
    case b: java.math.BigInteger => Some(new java.math.BigDecimal(b))
    case d: java.lang.Double    => Some(java.math.BigDecimal.valueOf(d.doubleValue()))
    case _                      => None
  }

  def pyEquals(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case _ =>
      (asNum(a), asNum(b)) match {
        case (Some(x), Some(y)) => x.compareTo(y) == 0
        case _ =>
          (a, b) match {
            case (x: String, y: String) => x == y
            case (x: ju.List[_], y: ju.List[_]) =>
              x.size == y.size &&
                x.asScala.zip(y.asScala).forall { case (u, v) => pyEquals(u, v) }
            case (x: ju.Map[_, _], y: ju.Map[_, _]) =>
              x.size == y.size && x.asScala.forall { case (k, v) =>
                y.asInstanceOf[ju.Map[Any, Any]].containsKey(k) &&
                  pyEquals(v, y.asInstanceOf[ju.Map[Any, Any]].get(k))
              }
            case (x: FmTemporal, y: FmTemporal) => x.epochMillis == y.epochMillis
            case _ => false
          }
      }
  }

  def contains(list: ju.List[_], value: Any): Boolean =
    list.asScala.exists(pyEquals(_, value))

  def indexOf(list: ju.List[_], value: Any): Int =
    list.asScala.indexWhere(pyEquals(_, value))

  /** Python `<` comparison; throws [[PyTypeError]] like CPython. */
  def pyCompare(a: Any, b: Any): Int = {
    (asNum(a), asNum(b)) match {
      case (Some(x), Some(y)) => x.compareTo(y)
      case _ =>
        (a, b) match {
          case (x: String, y: String) => x.compareTo(y)
          case (x: ju.List[_], y: ju.List[_]) =>
            x.asScala.zip(y.asScala).iterator
              .map { case (u, v) => pyCompare(u, v) }
              .find(_ != 0)
              .getOrElse(Integer.compare(x.size, y.size))
          case (x: FmTemporal, y: FmTemporal) => x.compareTo(y)
          case _ =>
            throw new PyTypeError(
              s"'<' not supported between instances of '${typeName(b)}' and '${typeName(a)}'")
        }
    }
  }

  val ordering: Ordering[Any] = (a: Any, b: Any) => pyCompare(a, b)

  private def typeName(v: Any): String = v match {
    case null                 => "NoneType"
    case _: String            => "str"
    case _: java.lang.Boolean => "bool"
    case _: java.lang.Double  => "float"
    case _: ju.List[_]        => "list"
    case _: ju.Map[_, _]      => "dict"
    case _                    => "int"
  }
}
