package graft

import graft.model.GraftDataset
import org.apache.spark.sql.functions._

/** GraftDataset.walk — scida walk_container (reference:
  * src/scida/fields.py:777), mirroring
  * tests/unit/test_walk_container.py case-for-case plus the
  * graft-specific surfaces (derived fields as recipes, attached
  * catalogs as groups).
  */
class WalkContainerSpec extends SparkSpec {
  import spark.implicits._

  private def ds(cols: (String, Int)*): GraftDataset =
    GraftDataset(Seq((1, 2)).toDF("a", "b").select(
      cols.map { case (n, i) => col(if (i == 0) "a" else "b").as(n) }: _*))

  test("walk visits every flat field (test_walk_fields)") {
    val fc = ds("field1" -> 0, "field2" -> 1)
    val visited = scala.collection.mutable.ArrayBuffer.empty[String]
    fc.walk(onField = (p, _) => visited += p)
    assert(visited.size == 2)
    assert(visited.contains("/field1") && visited.contains("/field2"))
  }

  test("walk recurses into groups with both handlers (test_walk_nested)") {
    val fc = ds("group1__inner" -> 0, "top" -> 1)
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val groups = scala.collection.mutable.ArrayBuffer.empty[String]
    fc.walk(onField = (p, _) => fields += p, onGroup = (p, _) => groups += p)
    assert(fields.contains("/top"))
    assert(fields.contains("/group1/inner"))
    assert(groups == Seq("/group1"))
  }

  test("walk with no handlers is a no-op, not an error (test_walk_no_handlers)") {
    ds("field1" -> 0).walk()
  }

  test("withDerived includes recipe entries WITHOUT forcing them (withrecipes)") {
    var forced = false
    val fc = ds("x" -> 0).withDerived("twice") { g => forced = true; g.field("x") * 2 }
    val without = scala.collection.mutable.ArrayBuffer.empty[String]
    fc.walk(onField = (p, _) => without += p)
    assert(without == Seq("/x")) // default mirrors withrecipes=False
    val withR = scala.collection.mutable.ArrayBuffer.empty[String]
    fc.walk(onField = (p, _) => withR += p, withDerived = true)
    assert(withR.toSet == Set("/x", "/twice"))
    assert(!forced, "visiting a recipe key must not evaluate its closure")
  }

  test("attached catalogs walk as groups (scida data['Group'] containers)") {
    val cat = ds("GroupMass" -> 0)
    val fc = ds("Coordinates" -> 0).withCatalog("Group", cat)
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val groups = scala.collection.mutable.ArrayBuffer.empty[String]
    fc.walk(onField = (p, _) => fields += p, onGroup = (p, _) => groups += p)
    assert(groups == Seq("/Group"))
    assert(fields.toSet == Set("/Coordinates", "/Group/GroupMass"))
  }

  test("parent handle passed to onField resolves the visited field") {
    val fc = ds("ns__v" -> 0)
    var seen: Option[(String, GraftDataset)] = None
    fc.walk(onField = (p, parent) => seen = Some((p, parent)))
    val (p, parent) = seen.get
    assert(p == "/ns/v")
    // the parent is the CONTAINER holding the leaf — local name resolves
    assert(parent.select("v").as[Int].head() == 1)
  }
}
