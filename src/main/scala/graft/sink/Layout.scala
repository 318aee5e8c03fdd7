package graft.sink

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partition TRANSFORM specs (the Iceberg partition-transform recipe:
  * a layout entry is either a plain column name — identity, the classic
  * hive `col=value` directory — or a transform over a source column).
  * A transform's value lands in a SYNTHETIC `_p_…` directory key while
  * the source column itself STAYS in the data file, so parquet footer
  * stats keep range pruning exact and no query ever has to know the
  * layout: the directories only decide which rows share a file.
  *
  * Grammar: `col` | `years(col)` | `months(col)` | `days(col)` |
  * `hours(col)` | `bucket(n, col)` | `truncate(n, col)`.
  *
  * Why transforms matter at 100 TB: identity-partitioning a timestamp
  * creates one directory per distinct microsecond — useless — while
  * `days(ts)` clusters a year of events into 365 prunable buckets, and
  * `bucket(n, id)` bounds the directory count for a high-cardinality
  * key while making point lookups open 1/n of the files. Cf. the Spark
  * built-ins `functions.days`/`bucket` (usable only through DSv2
  * catalogs) — here the transform is engine-owned metadata so pruning
  * and layout evolution both see it. */
object Layout {

  sealed trait Xform {
    /** the SCHEMA column the transform reads */
    def source: String
    /** hive directory key; identity uses the column name itself,
      * transforms a synthetic `_p_` name no user DDL can collide with */
    def dirKey: String
  }
  final case class Identity(source: String) extends Xform {
    def dirKey: String = source
    override def toString: String = source
  }
  /** unit ∈ year | month | day | hour; dir values render sortable
    * ("2024", "2024-03", "2024-03-07", "2024-03-07-13") so a human can
    * read the layout and lexicographic order = time order. */
  final case class Temporal(source: String, unit: String) extends Xform {
    def dirKey: String = s"_p_${source}_$unit"
    override def toString: String = s"${unit}s($source)"
  }
  final case class Bucket(n: Int, source: String) extends Xform {
    def dirKey: String = s"_p_${source}_bucket$n"
    override def toString: String = s"bucket($n, $source)"
  }
  final case class Truncate(n: Int, source: String) extends Xform {
    def dirKey: String = s"_p_${source}_trunc$n"
    override def toString: String = s"truncate($n, $source)"
  }

  private val Fn = """([A-Za-z]+)\s*\(\s*([^)]*?)\s*\)""".r

  /** Parse one layout entry. Plain identifiers are identity; anything
    * with parentheses must match the transform grammar exactly. */
  def parse(entry: String): Xform = entry.trim match {
    case Fn(fn, args) =>
      val as = args.split(",").map(_.trim).filter(_.nonEmpty)
      (fn.toLowerCase, as.toSeq) match {
        case ("years", Seq(c))   => Temporal(c, "year")
        case ("months", Seq(c))  => Temporal(c, "month")
        case ("days", Seq(c))    => Temporal(c, "day")
        case ("hours", Seq(c))   => Temporal(c, "hour")
        case ("bucket", Seq(n, c)) if n.forall(_.isDigit) =>
          Bucket(n.toInt, c)
        case ("truncate", Seq(n, c)) if n.forall(_.isDigit) =>
          Truncate(n.toInt, c)
        case _ => throw new IllegalArgumentException(
          s"unparseable partition transform '$entry' (grammar: col | " +
            "years(col) | months(col) | days(col) | hours(col) | " +
            "bucket(n, col) | truncate(n, col))")
      }
    case id if id.nonEmpty && !id.contains("(") => Identity(id)
    case other => throw new IllegalArgumentException(
      s"unparseable partition layout entry '$other'")
  }

  /** Split a comma-separated layout string WITHOUT splitting inside a
    * transform's parentheses — `"days(ts), bucket(8, id)"` is two
    * entries, not three. */
  def split(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  /** Source-type admission: refuse at DDL time, not at first write.
    * Temporal needs DATE/TIMESTAMP (hours needs the time component);
    * bucket hashes integral/string/date/timestamp keys; truncate takes
    * string prefixes or integral floor-to-multiple. */
  def validate(x: Xform, schema: StructType): Unit = {
    val f = schema.find(_.name == x.source).getOrElse(
      throw new IllegalArgumentException(
        s"layout entry $x: no column ${x.source} in schema"))
    def refuse(want: String): Nothing = throw new IllegalArgumentException(
      s"layout entry $x: ${x.source} is ${f.dataType.simpleString}, needs $want")
    x match {
      case Identity(_) => ()
      case Temporal(_, "hour") => f.dataType match {
        case TimestampType | TimestampNTZType => ()
        case _ => refuse("timestamp")
      }
      case Temporal(_, _) => f.dataType match {
        case DateType | TimestampType | TimestampNTZType => ()
        case _ => refuse("date or timestamp")
      }
      case Bucket(n, _) =>
        require(n > 0, s"layout entry $x: bucket count must be positive")
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType | StringType |
               DateType | TimestampType | TimestampNTZType => ()
          case _ => refuse("integral, string, date or timestamp")
        }
      case Truncate(n, _) =>
        require(n > 0, s"layout entry $x: truncate width must be positive")
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType | StringType => ()
          case _ => refuse("integral or string")
        }
    }
  }

  /** The write-side directory-value expression. MUST stay in lockstep
    * with [[bucketOf]]: the executor hashes with `xxhash64` (seed 42)
    * and the prune side evaluates the identical catalyst expression on
    * the driver — any divergence silently mis-prunes. */
  def writeExpr(x: Xform, schema: StructType): Column = x match {
    case Identity(c) => col(c)
    case Temporal(c, "year")  => date_format(col(c), "yyyy")
    case Temporal(c, "month") => date_format(col(c), "yyyy-MM")
    case Temporal(c, "day")   => date_format(col(c), "yyyy-MM-dd")
    case Temporal(c, "hour")  => date_format(col(c), "yyyy-MM-dd-HH")
    case Temporal(c, u) => throw new IllegalStateException(s"unit $u")
    case Bucket(n, c) => pmod(xxhash64(col(c)), lit(n.toLong))
    case Truncate(n, c) => schema(c).dataType match {
      case StringType => substring(col(c), 1, n)
      // Iceberg truncate semantics: v - (v mod W), pmod so negatives
      // floor toward -inf and each directory is a half-open [k*W, (k+1)*W)
      case _ => (col(c) - pmod(col(c), lit(n.toLong))).cast(schema(c).dataType)
    }
  }

  /** Driver-side bucket of one probe value — the SAME xxhash64 (same
    * seed) the write expression used, evaluated through the catalyst
    * expression itself so the two can never drift. The probe is coerced
    * to the column's schema type first: xxhash64(int 7) != xxhash64(long
    * 7), so an un-coerced literal would prune the wrong files. */
  def bucketOf(value: Any, dt: DataType, n: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val coerced: Any = (value, dt) match {
      case (v: Int, LongType) => v.toLong
      case (v: Long, IntegerType) => v.toInt
      case (v: Int, ShortType) => v.toShort
      case (v: Int, ByteType) => v.toByte
      case (v, _) => v
    }
    // seed 42 = functions.xxhash64's seed; keep in lockstep with writeExpr
    val h = XxHash64(Seq(Literal.create(coerced, dt)), 42L)
      .eval(null).asInstanceOf[Long]
    val m = (h % n).toInt
    if (m < 0) m + n else m
  }
}
