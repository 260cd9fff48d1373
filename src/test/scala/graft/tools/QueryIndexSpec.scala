package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** docs/QUERIES.md is generated from the QueryDef registries; this spec
  * pins the checked-in file to the current registry so the index can
  * never silently drift when queries are added or promoted. */
class QueryIndexSpec extends AnyFunSuite {
  test("docs/QUERIES.md is in sync with the query registry") {
    val path = java.nio.file.Paths.get("docs/QUERIES.md")
    assert(java.nio.file.Files.exists(path),
      "docs/QUERIES.md missing — run: sbt \"Test/runMain graft.tools.QueryIndex\"")
    val onDisk = java.nio.file.Files.readString(path)
    assert(onDisk === QueryIndex.render,
      "docs/QUERIES.md is stale — regenerate with: " +
        "sbt \"Test/runMain graft.tools.QueryIndex\"")
  }
}
