package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Golden coverage of the Mongo watch-session setup: pipeline JSON
  * shape (per-db $or grouping, op exclusion, the six-field $project)
  * and the resume-token KeyString timestamp decode that seeds the
  * StartAtOperationTime fallback. */
class MongoStreamSpec extends AnyFunSuite {

  test("pipeline groups collections per db under one $or") {
    val p = MongoStream.pipeline(
      Seq("shop.orders", "shop.items", "crm.leads"))
    assert(p ==
      """[{"$match":{"$or":[""" +
        """{"$and":[{"ns.db":"crm"},{"ns.coll":{"$in":["leads"]}}]},""" +
        """{"$and":[{"ns.db":"shop"},""" +
        """{"ns.coll":{"$in":["orders","items"]}}]}]}},""" +
        """{"$project":{"operationType":1,"clusterTime":1,"wallTime":1,""" +
        """"documentKey":1,"fullDocument":1,"ns":1}}]""")
  }

  test("excluded operation types add a $nin match") {
    val p = MongoStream.pipeline(Seq("db.c"), Seq("delete", "drop"))
    assert(p.contains(
      """{"$match":{"operationType":{"$nin":["delete","drop"]}}}"""))
  }

  test("parseExcludedOps: case-folds, dedups, drops invalid entries " +
    "(the reference's warn-and-ignore, mongo/cdc.go:661-685)") {
    assert(MongoStream.parseExcludedOps("") == ((Nil, Nil)))
    assert(MongoStream.parseExcludedOps("delete, Update,delete") ==
      ((Seq("delete", "update"), Nil)))
    assert(MongoStream.parseExcludedOps("insert,drop,  ,REPLACE") ==
      ((Seq("insert", "replace"), Seq("drop"))))
  }

  test("unqualified table names are rejected") {
    intercept[IllegalArgumentException] {
      MongoStream.pipeline(Seq("noqualifier"))
    }
  }

  test("resume-token timestamp decode (type byte + 64-bit BE split)") {
    // 0x82 tag, seconds = 0x65AB4F20, increment = 7
    val hex = "82" + "65ab4f20" + "00000007" + "ffbeef" // trailing junk ok
    val (secs, inc) = MongoStream.timestampFromResumeToken(hex)
    assert(secs == 0x65AB4F20L && inc == 7L)
  }

  test("token decode rejects short and mistyped data") {
    intercept[IllegalArgumentException] {
      MongoStream.timestampFromResumeToken("82aabb")
    }
    intercept[IllegalArgumentException] {
      MongoStream.timestampFromResumeToken("00" + "0" * 16)
    }
    intercept[IllegalArgumentException] {
      MongoStream.timestampFromResumeToken("zz" + "0" * 16)
    }
  }

  test("resume decision: token when pipeline unchanged, fallback after " +
      "a reshape") {
    val hex = "82" + "00000064" + "00000001"
    assert(MongoStream.resumeOption(Some(hex), pipelineChanged = false)
      .contains(("resumeAfter", hex)))
    assert(MongoStream.resumeOption(Some(hex), pipelineChanged = true)
      .contains(("startAtOperationTime", "Timestamp(100, 1)")))
    assert(MongoStream.resumeOption(None, pipelineChanged = true).isEmpty)
  }
}
