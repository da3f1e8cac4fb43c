package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source files must stay grep-text: a single raw control byte (the
  * r6 NUL-sentinel incident in Sampling.scala) makes grep/diff treat
  * the whole file as binary, hiding it from every text search a
  * reviewer or tool runs. Escapes like backslash-u0000 express the same
  * value without poisoning the file. */
class SourceHygieneSpec extends AnyFunSuite {

  test("all .scala sources are control-byte-free (grep-text)") {
    val roots = Seq(new java.io.File("src/main/scala"),
      new java.io.File("src/test/scala"))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val files = roots.flatMap(walk)
    assert(files.nonEmpty, "no sources found — wrong working directory?")
    val offenders = files.flatMap { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      // anything below 0x20 except \t \n \r is a control byte grep
      // treats as binary (NUL being the usual culprit)
      val bad = bytes.indexWhere(b =>
        b >= 0 && b < 0x20 && b != '\t' && b != '\n' && b != '\r')
      if (bad >= 0) Some(f"${f.getPath}: byte 0x${bytes(bad)}%02x at offset $bad")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
