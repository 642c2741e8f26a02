package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Source-tree hygiene lint: no raw control bytes in .scala sources.
 *
 * A literal NUL (or other C0 control byte outside tab/newline/CR)
 * inside a char/string literal makes git treat the whole file as
 * binary — `git diff` prints `Bin N -> M bytes` for a product source
 * file, grep answers "binary file matches", and review dies. The
 * behavior-identical spelling is the backslash-u escape, which
 * diffs as text. This lint enforces that spelling repo-wide (r14
 * verdict "what's wrong" #1; the repo workflow notes flag literal
 * control bytes as a recurring Write-tool hazard).
 */
class SourceHygieneSpec extends AnyFunSuite {

  private val allowed: Set[Byte] = Set('\t'.toByte, '\n'.toByte, '\r'.toByte)

  private def scalaSources(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(root)) Seq.empty
    else java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
  }

  test("no .scala source under src/ contains raw C0 control bytes") {
    val roots = Seq("src/main", "src/test").map(java.nio.file.Paths.get(_))
    val offenders = roots.flatMap(scalaSources).flatMap { p =>
      val bytes = java.nio.file.Files.readAllBytes(p)
      val bad = bytes.zipWithIndex.collect {
        case (b, i) if b >= 0 && b < 0x20 && !allowed.contains(b) => (b, i)
      }
      if (bad.isEmpty) None
      else Some(s"$p: ${bad.take(3).map { case (b, i) => f"0x$b%02x@byte$i" }.mkString(", ")}" +
        (if (bad.length > 3) s" (+${bad.length - 3} more)" else ""))
    }
    assert(offenders.isEmpty,
      s"raw control bytes in source (use \\u escapes):\n${offenders.mkString("\n")}")
  }
}
