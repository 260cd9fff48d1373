package graft.tools

import graft.queries._

/** Dev-only generator for docs/QUERIES.md — the navigable index of every
  * registered QueryDef (232 queries across six registries is hard to scan
  * from the source files). The table is derived FROM the registry, and
  * QueryIndexSpec asserts the checked-in file matches, so the doc can
  * never drift from the code. Regenerate with:
  *   sbt "Test/runMain graft.tools.QueryIndex"
  */
object QueryIndex {

  private val registries: Seq[(String, Seq[QueryDef])] = Seq(
    "relational" -> RelationalQueries.all,
    "profiling" -> ProfilingQueries.all,
    "llm-pipeline" -> LlmQueries.all,
    "streaming-shape" -> StreamShapeQueries.all,
    "geospatial" -> GeoQueries.all,
    "sketch" -> SketchQueries.all)

  def render: String = {
    val rows = registries.flatMap { case (group, qs) =>
      qs.map(q => (q.name, group, q.oracle.isDefined))
    }.sortBy(_._1)
    val total = rows.size
    val withOracle = rows.count(_._3)
    val byGroup = registries.map { case (g, qs) => s"$g ${qs.size}" }.mkString(", ")
    val sb = new StringBuilder
    sb ++= "# Query index\n\n"
    sb ++= "GENERATED — do not edit by hand. Regenerate with\n"
    sb ++= "`sbt \"Test/runMain graft.tools.QueryIndex\"`; QueryIndexSpec\n"
    sb ++= "fails when this file is out of sync with the registry.\n\n"
    sb ++= s"$total queries ($byGroup); $withOracle carry a DuckDB oracle, " +
      s"${total - withOracle} are rows-only by documented contract (each " +
      "with an oracle-checked twin).\n\n"
    sb ++= "Every query runs via `SparkEntry.queries(name)(spark, sfDir)` " +
      "over the driver parquet corpus; the driver hash-compares oracle " +
      "queries against DuckDB at sf0.01 (CORRECTNESS gate), and the dev " +
      "sweep replays them at sf0.001/0.01/0.1 (see the repo verify workflow).\n\n"
    sb ++= "| query | registry | correctness check |\n"
    sb ++= "|---|---|---|\n"
    rows.foreach { case (name, group, hasOracle) =>
      val check = if (hasOracle) "DuckDB SQL oracle" else "rows-only (contract)"
      sb ++= s"| $name | $group | $check |\n"
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get("docs/QUERIES.md")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, render)
    println(s"wrote ${path.toAbsolutePath}")
  }
}
