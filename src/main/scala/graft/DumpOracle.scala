package graft
import java.nio.file.{Files, Paths}
/** Dev utility: write oracle_sql.json alone (no Spark session, no query
  * runs) — for iterating on oracle SQL against an existing Verify dump.
  * Usage: runMain graft.DumpOracle <outDir>
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"${args(0)}/oracle_sql.json"), json)
  }
}
