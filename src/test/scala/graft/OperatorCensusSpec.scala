package graft

import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-operator census (round-16 lesson, promoted to a lint):
  * before the fleet of operator objects grew past 400 public defs,
  * two operators (brownForsythe, benford) were re-implemented under
  * an existing name in the same object and were only caught as
  * ambiguous-overload COMPILE errors — and a re-implementation in a
  * DIFFERENT object would not be caught at all, silently splitting
  * callers across two divergent definitions. This spec fails the
  * build on any public operator name defined in two operator files,
  * and on any same-file redefinition outside the documented-overload
  * allowlist. Pure source scan — no Spark session. */
class OperatorCensusSpec extends AnyFunSuite {

  private val opsDir = new java.io.File("src/main/scala/graft/operators")

  // Documented intentional overloads: "File.scala:name".
  // diffInDiff: the grouped 5-arg variant (per-group DID table) and
  // the global 4-arg variant (one-row four-cell contrast) share the
  // name on purpose — both are gated (q396 global, grouped spec).
  private val allowedSameFile = Set("Profile.scala:diffInDiff")

  private val defPat =
    """^  (?:final )?def ([a-zA-Z_]\w*)""".r

  private def publicDefs(f: java.io.File): Seq[String] = {
    val src = new String(
      java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    src.linesIterator.flatMap(l =>
      defPat.findFirstMatchIn(l).map(_.group(1))).toSeq
  }

  test("operator census: source dir resolves from the test cwd") {
    assert(opsDir.isDirectory,
      s"expected ${opsDir.getAbsolutePath} — did the fork cwd move?")
  }

  test("no public operator name is defined in two operator files") {
    val files = opsDir.listFiles.filter(_.getName.endsWith(".scala"))
    val byName = files.flatMap(f =>
        publicDefs(f).distinct.map(_ -> f.getName))
      .groupBy(_._1).map { case (n, fs) => n -> fs.map(_._2).toSet }
    val dups = byName.filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"operator name(s) defined in multiple files — consolidate or " +
        s"rename: ${dups.map { case (n, fs) =>
          s"$n in ${fs.mkString(", ")}" }.mkString("; ")}")
  }

  test("no same-file redefinition outside the overload allowlist") {
    val files = opsDir.listFiles.filter(_.getName.endsWith(".scala"))
    val dups = files.flatMap { f =>
      publicDefs(f).groupBy(identity).collect {
        case (n, occ) if occ.size > 1 &&
            !allowedSameFile(s"${f.getName}:$n") =>
          s"${f.getName}:$n ×${occ.size}"
      }
    }
    assert(dups.isEmpty,
      s"same-file duplicate def(s) — if an intentional overload, add " +
        s"to the allowlist WITH a doc note: ${dups.mkString("; ")}")
  }
}
