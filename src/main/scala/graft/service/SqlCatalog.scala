package graft.service

import scala.util.matching.Regex

/** SQL-file metadata source (SURVEY.md §2.1 S7): the reference's app
  * regex-parses `-- Query N: Title` comment blocks out of its .sql file
  * (data-mgmt-streamlit.py:24-43) to build its query picker. Same
  * contract here: split a SQL script into titled blocks.
  */
object SqlCatalog {

  final case class QueryMeta(number: Int, title: String, sql: String)

  private val Header: Regex = """(?m)^--\s*Query\s+(\d+)\s*:\s*(.+)$""".r

  /** Parse every `-- Query N: title` block; a block's SQL runs until the
    * next header (or EOF). Malformed headers are ignored (the reference
    * falls back to generic titles; we surface only well-formed blocks).
    */
  def parse(sqlText: String): Seq[QueryMeta] = {
    val headers = Header.findAllMatchIn(sqlText).toList
    headers.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < headers.length) headers(i + 1).start else sqlText.length
      QueryMeta(m.group(1).toInt, m.group(2).trim,
        sqlText.substring(m.end, end).trim.stripSuffix(";"))
    }
  }

  def parseFile(path: String): Seq[QueryMeta] = {
    val src = scala.io.Source.fromFile(path)("UTF-8")
    try parse(src.mkString) finally src.close()
  }
}
