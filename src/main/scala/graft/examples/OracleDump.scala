package graft.examples

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as oracle_sql.json WITHOUT running any
  * query — the oracle strings are pure functions of code + env knobs,
  * so a long Verify's completed rows can be swept (oracle_sweep.py
  * `only` filter) while the Verify is still writing the rest. Uses the
  * same JSON escaping and sidecar-namespace rewrite as graft.Verify.
  *
  * Run: tools/jrun.sh graft.examples.OracleDump <sfDir> <outDir>
  * (set the SAME env knobs as the Verify being shadowed). */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val ns = graft.queries.SimilarityQueries.sidecarNs(sfDir)
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.queries.SimilarityQueries.SidecarNsToken, ns))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[oracle-dump] ${graft.SparkEntry.oracleSql.size} entries -> $outDir/oracle_sql.json")
  }
}
