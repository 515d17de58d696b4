package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FuzzyJoin: dictionary construction, in-block Levenshtein pairing,
  * and the blocking contract (cross-block pairs are never compared). */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "blue bolt"), (2L, "blue rod"), (3L, "blue bolt"), (4L, "red rod"))
    .toDF("id", "name")

  test("dictionary: one row per distinct value, min-id rep, member count") {
    val d = FuzzyJoin.dictionary(rows, "id", "name")
      .orderBy(col("name")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(d == Seq(("blue bolt", 1L, 2L), ("blue rod", 2L, 1L), ("red rod", 4L, 1L)))
  }

  test("in-block pair within maxDist is emitted with the exact distance") {
    val p = FuzzyJoin.dictionaryFuzzyPairs(rows, "id", "name", maxDist = 3).collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getAs[String]("name_a") == "blue bolt" &&
      r.getAs[String]("name_b") == "blue rod" &&
      r.getAs[Long]("dist") == 3L &&          // levenshtein("bolt","rod") = 3
      r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L &&
      r.getAs[Long]("members_a") == 2L && r.getAs[Long]("members_b") == 1L)
  }

  test("blocking: cross-block near-matches are never compared") {
    // "red rod" vs "blue rod" is dist 4 from the name but the blocking
    // key (first token) differs — no pair regardless of maxDist
    val p = FuzzyJoin.dictionaryFuzzyPairs(rows, "id", "name", maxDist = 100)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!p.exists { case (a, b) => a.startsWith("red") != b.startsWith("red") })
  }

  test("maxDist gate: tighter threshold drops the dist-3 pair") {
    assert(FuzzyJoin.dictionaryFuzzyPairs(rows, "id", "name", maxDist = 2).isEmpty)
  }
}
