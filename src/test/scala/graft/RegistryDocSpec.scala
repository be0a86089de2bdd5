package graft

import org.scalatest.funsuite.AnyFunSuite

/** Docs-drift gate: README.md's Layout section lists every query family
  * as ranges ("dd01-dd13") or singletons ("bk01"). Rounds 6 and 7 both
  * shipped operators whose doc update was forgotten; this spec makes
  * that drift a TEST FAILURE in both directions — a registered query
  * README doesn't cover, and a README token no registered query backs.
  *
  * Token grammar: only tokens whose alphabetic family prefix actually
  * occurs in SparkEntry.queries are considered (so prose like
  * "local[32]" or "sf0.01" can never false-positive), ranges must
  * repeat the family ("q01-q29"), and suffixed variants ("q08b") count
  * as members of their numeric base.
  */
class RegistryDocSpec extends AnyFunSuite {

  private val readme = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("README.md")), "UTF-8")

  // the Layout block is the docs' registry mirror — scope the scan to it
  private val layout = {
    val start = readme.indexOf("## Layout")
    assert(start >= 0, "README.md lost its ## Layout section")
    val rest = readme.substring(start + 2)
    val end = rest.indexOf("\n## ")
    if (end >= 0) rest.substring(0, end) else rest
  }

  private val keys = SparkEntry.queries.keySet
  private val families = keys.map(_.takeWhile(_ != '_').takeWhile(!_.isDigit))

  /** All query ids the README Layout claims, ranges expanded. */
  private val documented: Set[String] = {
    val range = """([a-z]{1,4})(\d{2})-([a-z]{1,4})(\d{2})""".r
    val single = """\b([a-z]{1,4})(\d{2}[a-z]?)\b""".r
    val fromRanges = range.findAllMatchIn(layout).flatMap { m =>
      if (m.group(1) == m.group(3) && families(m.group(1)))
        (m.group(2).toInt to m.group(4).toInt)
          .map(i => f"${m.group(1)}$i%02d")
      else Seq.empty
    }.toSet
    val fromSingles = single.findAllMatchIn(layout)
      .filter(m => families(m.group(1)))
      .map(m => m.group(1) + m.group(2)).toSet
    fromRanges ++ fromSingles
  }

  test("every registered query id appears in README's Layout section") {
    val ids = keys.map(_.takeWhile(_ != '_'))
    val missing = ids.filterNot(documented)
    assert(missing.isEmpty,
      s"queries registered but absent from README Layout: " +
        s"${missing.toSeq.sorted.mkString(", ")} — update the Layout lists")
  }

  test("every query id README documents is actually registered") {
    val ids = keys.map(_.takeWhile(_ != '_'))
    // range expansion can claim ids inside a documented span only if the
    // registry really has them — a stale or fat-fingered range fails here
    val stale = documented.filterNot(ids)
    assert(stale.isEmpty,
      s"README Layout documents ids no registered query backs: " +
        s"${stale.toSeq.sorted.mkString(", ")} — fix the Layout lists")
  }

  test("every oracleSql key has a queries entry (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- keys
    assert(orphans.isEmpty,
      s"oracleSql entries without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
