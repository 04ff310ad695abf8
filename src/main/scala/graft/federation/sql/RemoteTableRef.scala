package graft.federation.sql

/** Reference to a table on a remote engine: an up-to-3-part identifier plus
  * optional table-function arguments (`schema.view(1, 2)`,
  * `view(name => 'obj')`), mirroring the reference's `RemoteTableRef`
  * (src/sql/table_reference.rs:29-152).
  */
final case class RemoteTableRef(parts: Seq[String],
    args: Option[Seq[TableArg]] = None) {
  require(parts.nonEmpty && parts.size <= 3,
    s"table reference must have 1-3 parts, got $parts")

  def table: String = parts.last

  def sql(dialect: SqlDialect): String = {
    val base = parts.map(dialect.quoteIfNeeded).mkString(".")
    args match {
      // table-function form gets an alias so projections stay resolvable
      // (reference TableArgReplace, src/sql/ast_analyzer.rs:81-109)
      case Some(as) =>
        s"$base(${as.map(_.sql).mkString(", ")}) AS ${dialect.quoteIfNeeded(table)}"
      case None => base
    }
  }

  override def toString: String =
    parts.mkString(".") + args.map(a => a.map(_.sql).mkString("(", ", ", ")"))
      .getOrElse("")
}

sealed trait TableArg { def sql: String }
object TableArg {
  final case class Positional(value: String) extends TableArg {
    override def sql: String = value
  }
  final case class Named(name: String, value: String) extends TableArg {
    override def sql: String = s"$name => $value"
  }
}

object RemoteTableRef {

  /** Parse `catalog.schema.table`, quoted parts (`"x.y".t`), and optional
    * trailing args `t(1, 2)` / `t(user_id => 1)`. */
  def parse(s: String): RemoteTableRef = {
    val trimmed = s.trim
    val (namePart, argPart) = splitArgs(trimmed)
    val parts = splitParts(namePart)
    val args = argPart.map(parseArgs)
    RemoteTableRef(parts, args)
  }

  private def splitArgs(s: String): (String, Option[String]) = {
    val open = indexOfTopLevel(s, '(')
    if (open < 0) (s, None)
    else {
      require(s.endsWith(")"), s"unbalanced table args in '$s'")
      (s.substring(0, open).trim, Some(s.substring(open + 1, s.length - 1)))
    }
  }

  /** index of the first unquoted occurrence of `ch`. */
  private def indexOfTopLevel(s: String, ch: Char): Int = {
    var i = 0
    var inQuote = false
    var quoteCh = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == quoteCh) inQuote = false }
      else if (c == '"' || c == '`' || c == '\'') { inQuote = true; quoteCh = c }
      else if (c == ch) return i
      i += 1
    }
    -1
  }

  private def splitParts(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val cur = new StringBuilder
    var i = 0
    var inQuote = false
    var wasQuoted = false
    var quoteCh = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == quoteCh) {
          // doubled quote char = escaped literal quote
          if (i + 1 < s.length && s.charAt(i + 1) == quoteCh) {
            cur.append(quoteCh); i += 1
          } else inQuote = false
        } else cur.append(c)
      } else c match {
        case '"' | '`' => inQuote = true; wasQuoted = true; quoteCh = c
        case '.' => out += ((cur.result(), wasQuoted)); cur.clear(); wasQuoted = false
        case other => cur.append(other)
      }
      i += 1
    }
    out += ((cur.result(), wasQuoted))
    // whitespace around separators is noise, but inside quotes it is part
    // of the identifier — trim unquoted segments only
    out.map { case (p, quoted) => if (quoted) p else p.trim }
      .filter(_.nonEmpty).toSeq
  }

  private def parseArgs(s: String): Seq[TableArg] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { a =>
      a.split("=>") match {
        case Array(n, v) => TableArg.Named(n.trim, v.trim)
        case _ => TableArg.Positional(a)
      }
    }
}
