package graft

import graft.functions.Json
import org.scalatest.funsuite.AnyFunSuite

/** JSON shape census: the fixture against its closed form, nested-skip
 * semantics, duplicate keys, and the strict one-object contract. */
class JsonSpec extends AnyFunSuite {

  test("fixture shapes match the closed form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val shape = Json.topLevelShape(Json.syntheticJson(id))
      if (id % 11 == 5) assert(shape.isEmpty, s"id=$id truncated doc")
      else {
        val ks = shape.getOrElse(fail(s"id=$id did not parse"))
        var expect = Seq(("id", "int"), ("name", "string"))
        if (id % 3 != 1) expect :+= (("score", "float"))
        if (id % 4 == 0) expect :+= (("tags", "array"))
        if (id % 5 == 2) expect :+= (("meta", "object"))
        expect :+= (("flag", "bool"))
        if (id % 7 == 3) expect :+= (("opt", "null"))
        assert(ks === expect.toIndexedSeq, s"id=$id")
        // nested meta keys must never leak
        assert(!ks.exists(_._1 == "lang"), s"id=$id")
      }
    }
  }

  test("shape corners: duplicates, nesting, scalar types") {
    assert(Json.topLevelShape("""{"a": 1, "a": "x"}""") ===
      Some(IndexedSeq(("a", "int"), ("a", "string"))))
    assert(Json.topLevelShape(
      """{"deep": {"a": [1, {"b": 2}]}, "after": 1.5e3}""") ===
      Some(IndexedSeq(("deep", "object"), ("after", "float"))))
    assert(Json.topLevelShape("""{"neg": -7, "exp": 2e10}""") ===
      Some(IndexedSeq(("neg", "int"), ("exp", "float"))))
    assert(Json.topLevelShape("{}") === Some(IndexedSeq()))
  }

  test("strict one-object contract") {
    assert(Json.topLevelShape("""[1, 2]""").isEmpty, "top-level array")
    assert(Json.topLevelShape(""""scalar"""").isEmpty, "top-level scalar")
    assert(Json.topLevelShape("""{"a": 1} extra""").isEmpty, "trailing")
    assert(Json.topLevelShape("""{"a": }""").isEmpty, "malformed")
    assert(Json.topLevelShape("""{"a": 1""").isEmpty, "truncated")
    assert(Json.topLevelShape("").isEmpty)
    assert(Json.topLevelShape(null).isEmpty)
  }
}
