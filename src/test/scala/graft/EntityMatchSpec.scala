package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityMatch

class EntityMatchSpec extends SparkSpec {

  test("fuzzyPairs verifies within-block candidates by edit distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "navy blue large"),
      (2L, "navy blue larga"),   // dist 1 from id 1, same block
      (3L, "navy blue larXY"),   // dist 2 from id 1
      (4L, "navy blue exact"),   // dist 4 from id 1 — filtered out
      (5L, "teal blue large"))   // different first token → different block
      .toDF("id", "name")
    val got = EntityMatch.fuzzyPairs(df, "id", "name",
        EntityMatch.tokenLengthBlock("name"), maxDist = 2)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 2)))
  }

  test("fuzzyPairs blocking excludes cross-length candidates entirely") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "alpha betaX")).toDF("id", "name")
    // dist would be 1, but lengths differ → different blocks → no pair
    assert(EntityMatch.fuzzyPairs(df, "id", "name",
      EntityMatch.tokenLengthBlock("name"), maxDist = 2).count() == 0)
  }

  test("fuzzyPairs maxBlockSize drops oversized blocks before pairing") {
    import spark.implicits._
    val big = (1 to 20).map(i => (i.toLong, "alpha name" + ('a' + i % 3).toChar))
    val small = Seq((100L, "beta xx"), (101L, "beta xy"))
    val df = (big ++ small).toDF("id", "name")
    val capped = EntityMatch.fuzzyPairs(df, "id", "name",
      EntityMatch.tokenLengthBlock("name"), maxDist = 2, maxBlockSize = 5)
    val got = capped.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)), s"oversized block leaked pairs: $got")
  }

  test("kAnonymity flags small equivalence classes") {
    import spark.implicits._
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq.fill(1)(("DE", "A"))).toDF("country", "seg")
    val got = EntityMatch.kAnonymity(df, k = 3, "country", "seg")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      ("US", "A") -> ((5L, true)),
      ("US", "B") -> ((2L, false)),
      ("DE", "A") -> ((1L, false))))
  }

  test("lDiversity flags classes whose sensitive values collapse") {
    import spark.implicits._
    val df = Seq(
      // class (US): 3 rows but only 1 sensitive value → not diverse
      ("US", "flu"), ("US", "flu"), ("US", "flu"),
      // class (DE): 2 rows, 2 sensitive values → diverse at l=2
      ("DE", "flu"), ("DE", "cold"))
      .toDF("country", "dx")
    val got = EntityMatch.lDiversity(df, l = 2, "dx", "country")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      "US" -> ((3L, 1L, false)),
      "DE" -> ((2L, 2L, true))))
  }
}
