package graft

import org.scalatest.funsuite.AnyFunSuite

/** ARCHITECTURE.md's "## Registry index" table is the one-page map of
  * every registry query (name → defining file → oracle type → bench
  * flag). This spec derives the SAME table from `Queries.all` plus a
  * source scan and fails on any drift — the failure message prints the
  * regenerated table so fixing the doc is copy-paste. */
class RegistryIndexSpec extends AnyFunSuite {

  private val queryFiles = Seq("Relational", "GlmQueries", "TextQueries",
    "SimilarityQueries", "PipelineQueries")

  /** name → defining file, from the literal `Q("...")` occurrences. */
  private def definingFiles: Map[String, String] = {
    val pairs = queryFiles.flatMap { f =>
      val path = java.nio.file.Paths.get(
        s"src/main/scala/graft/queries/$f.scala")
      val src = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      """Q\("(q[0-9]+[a-z]?_[a-z0-9_]+)"""".r
        .findAllMatchIn(src).map(m => m.group(1) -> s"$f.scala")
    }
    val dup = pairs.groupBy(_._1).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"query defined in more than one file: $dup")
    pairs.toMap
  }

  private def expectedRows: Seq[String] = {
    val files = definingFiles
    graft.queries.Queries.all.map { q =>
      val file = files.getOrElse(q.name,
        fail(s"registry query ${q.name} not found in any queries file"))
      val oracle = if (q.oracle.isDefined) "sql" else "rows-only"
      val bench = if (q.bench) "bench" else ""
      s"| ${q.name} | $file | $oracle | $bench |"
    }
  }

  test("ARCHITECTURE.md registry index matches Queries.all exactly") {
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("ARCHITECTURE.md")), "UTF-8")
    val section = doc.split("## Registry index", 2) match {
      case Array(_, rest) => rest.split("\n## ", 2)(0)
      case _ => fail("ARCHITECTURE.md has no '## Registry index' section")
    }
    val docRows = section.linesIterator
      .map(_.trim).filter(_.matches("\\| q[0-9].*")).toSeq
    val expected = expectedRows
    if (docRows != expected) {
      val missing = expected.toSet -- docRows.toSet
      val stale = docRows.toSet -- expected.toSet
      fail(
        s"registry index drifted (${docRows.size} doc rows vs " +
          s"${expected.size} registry queries).\n" +
          (if (missing.nonEmpty) s"MISSING:\n${missing.toSeq.sorted.mkString("\n")}\n" else "") +
          (if (stale.nonEmpty) s"STALE:\n${stale.toSeq.sorted.mkString("\n")}\n" else "") +
          s"Regenerated table (paste under '## Registry index'):\n" +
          expected.mkString("\n"))
    }
    // the registry itself must stay duplicate-free for byName lookups
    val names = graft.queries.Queries.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate registry names")
  }
}
