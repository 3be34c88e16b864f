package graft.sources

import org.apache.spark.sql.sources._

/** Exact executor-side evaluation of pushed-down V2 filters for the
  * all-string, never-null rows the graft XML/XLSX sources produce
  * (missing cells read as "" — the reference's `String(v ?? '')`
  * coercion, `compare/page.tsx:63`-adjacent contract).
  *
  * Only filters this object can evaluate with EXACTLY Spark's
  * semantics are accepted — everything else stays residual and Spark
  * applies it after the scan, so pushdown can never change results:
  *  - string equality / IN / startsWith / endsWith / contains are
  *    plain binary comparisons on both sides (Spark's UTF8_BINARY
  *    default collation degenerates to bytewise equality, and equal
  *    content is equal in either representation);
  *  - IsNull / IsNotNull are constant (these sources never emit null);
  *  - And / Or / Not over accepted children (no nulls → two-valued
  *    logic, so the composition is plain boolean algebra);
  *  - ordering comparisons (>, >=, <, <=) evaluate through
  *    `UTF8String.binaryCompare` — Spark's OWN string order under the
  *    default UTF8_BINARY collation — never Java's `String.compareTo`
  *    (UTF-16 code-unit order, which disagrees with UTF-8 byte order
  *    above the BMP). StringFiltersSpec property-tests the
  *    equivalence, supplementary code points included.
  *
  * Scale intent: a selective predicate over a directory of big XML
  * extracts now drops rows inside the StAX/zip parse loop instead of
  * materializing every row into Spark and filtering after — the
  * server-side selection the reference's browser app cannot do
  * (reference scan loop: components/FileUploader.tsx:65-93).
  */
object StringFilters {

  /** Can `f` be evaluated here with exactly Spark's semantics, over
    * columns limited to `names`? */
  def supported(f: Filter, names: Set[String]): Boolean = {
    def ok(f: Filter): Boolean = f match {
      case EqualTo(_, v) => v.isInstanceOf[String]
      case EqualNullSafe(_, v) => v.isInstanceOf[String]
      case GreaterThan(_, v) => v.isInstanceOf[String]
      case GreaterThanOrEqual(_, v) => v.isInstanceOf[String]
      case LessThan(_, v) => v.isInstanceOf[String]
      case LessThanOrEqual(_, v) => v.isInstanceOf[String]
      case In(_, vs) => vs.forall(_.isInstanceOf[String])
      case _: StringStartsWith | _: StringEndsWith | _: StringContains => true
      case _: IsNull | _: IsNotNull => true
      case And(l, r) => ok(l) && ok(r)
      case Or(l, r) => ok(l) && ok(r)
      case Not(c) => ok(c)
      case _ => false
    }
    // The reference check also rejects dotted attribute paths that
    // don't name a real column (flatten-mode columns CONTAIN dots, so
    // an exact schema-name match is the only unambiguous reading).
    ok(f) && f.references.forall(names.contains)
  }

  /** Spark's string order: UTF-8 byte comparison (UTF8_BINARY), NOT
    * Java's UTF-16 code-unit order. */
  private def cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .binaryCompare(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Evaluate an accepted filter against one row; `get` returns the
    * cell for a column name ("" when absent). Call only with filters
    * [[supported]] accepted. */
  def eval(f: Filter, get: String => String): Boolean = f match {
    case EqualTo(a, v) => get(a) == v
    case EqualNullSafe(a, v) => get(a) == v
    case GreaterThan(a, v) => cmp(get(a), v.toString) > 0
    case GreaterThanOrEqual(a, v) => cmp(get(a), v.toString) >= 0
    case LessThan(a, v) => cmp(get(a), v.toString) < 0
    case LessThanOrEqual(a, v) => cmp(get(a), v.toString) <= 0
    case In(a, vs) => val c = get(a); vs.exists(_ == c)
    case StringStartsWith(a, v) => get(a).startsWith(v)
    case StringEndsWith(a, v) => get(a).endsWith(v)
    case StringContains(a, v) => get(a).contains(v)
    case IsNull(_) => false
    case IsNotNull(_) => true
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r) => eval(l, get) || eval(r, get)
    case Not(c) => !eval(c, get)
    case other => throw new IllegalArgumentException(s"unsupported pushed filter $other")
  }
}
