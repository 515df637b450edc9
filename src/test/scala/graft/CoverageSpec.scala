package graft

import org.scalatest.funsuite.AnyFunSuite

/** The coverage manifest is the machine-checkable form of the SURVEY
  * §2 contract (round-15 verdict task 4): every capability row cites
  * an existing gate, every gate maps to a row, and the COMMITTED
  * COVERAGE.json matches what SURVEY.md + the gate registry derive
  * today. Any drift — a row citing a renamed gate, a new gate with no
  * row, an edited SURVEY not followed by a regenerate — fails here
  * instead of surfacing in an audit.
  */
class CoverageSpec extends AnyFunSuite {

  private def survey = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
  private lazy val gates = SparkEntry.gateQueries.map(_.name).toSet
  private lazy val rows = Coverage.parseRows(survey)

  test("§2 parses to the full unique row inventory") {
    assert(rows.size >= 316, s"only ${rows.size} §2 rows parsed — parser or prose drift")
    assert(rows.map(_._1).distinct.size === rows.size, "duplicate §2 row ids")
    val bySection = rows.groupBy(_._1.head).view.mapValues(_.size).toMap
    assert(Set('A', 'B', 'C', 'D', 'E').subsetOf(bySection.keySet), bySection.toString)
  }

  test("coverage contract holds: rows cite existing gates, gates map to rows") {
    val probs = Coverage.problems(rows, gates)
    assert(probs.isEmpty, probs.mkString("\n"))
  }

  test("committed COVERAGE.json matches the regenerated manifest (no drift)") {
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.json")), "UTF-8").trim
    val regenerated = Coverage.manifestJson(rows, gates).trim
    assert(committed === regenerated,
      "COVERAGE.json is stale — regenerate with `sbt \"runMain graft.Coverage\"` and commit")
  }

  test("manifest JSON round-trips through the parser with consistent maps") {
    val m = Json.parse(Coverage.manifestJson(rows, gates))
      .asInstanceOf[Map[String, Any]]
    val rowMap = m("rows").asInstanceOf[Map[String, Any]]
    val gateMap = m("gates").asInstanceOf[Map[String, Any]]
    assert(rowMap.size === rows.size)
    // reverse-map consistency: gate g lists row r  <=>  row r lists g
    gateMap.foreach { case (g, ids) =>
      ids.asInstanceOf[Vector[Any]].foreach { id =>
        assert(rowMap(id.toString).asInstanceOf[Vector[Any]].contains(g),
          s"gate $g lists row $id but row $id does not cite $g")
      }
    }
    rowMap.foreach { case (id, gs) =>
      gs.asInstanceOf[Vector[Any]].foreach { g =>
        assert(gateMap(g.toString).asInstanceOf[Vector[Any]].contains(id),
          s"row $id cites $g but the gate map misses the back-edge")
      }
    }
    // every registered gate appears in exactly one of: gate map, infra list
    val infra = m("infra_gates").asInstanceOf[Vector[Any]].map(_.toString).toSet
    assert(gateMap.keySet ++ infra === gates)
  }
}
