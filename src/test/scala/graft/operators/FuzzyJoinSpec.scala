package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  private def brute(df: DataFrame, d: Int): Set[(Long, Long, Int)] = {
    val a = df.select(col("id").as("id_a"), col("s").as("sa"))
    val b = df.select(col("id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= d)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def blocked(df: DataFrame, d: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.fuzzyPairs(df, "id", "s", d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("fuzzyPairs equals brute force: substitutions, indels, short strings") {
    val rows = Seq(
      1L -> "martha",  2L -> "marhta",   // transposition = 2 edits
      3L -> "marta",   4L -> "martya",   // indel / substitution mix
      5L -> "jonathan", 6L -> "jonathon", 7L -> "jon",
      8L -> "a", 9L -> "b", 10L -> "ab", // shorter than d+1 segments
      11L -> "xylophone", 12L -> "martha"  // exact dup of 1
    ).toDF("id", "s")
    assert(blocked(rows, 1) == brute(rows, 1))
    assert(blocked(rows, 2) == brute(rows, 2))
    // sanity: the d=1 set really contains the planted neighbors
    val got1 = blocked(rows, 1)
    assert(got1.contains((1L, 12L, 0)) && got1.contains((3L, 4L, 1)))
    assert(got1.contains((8L, 9L, 1)) && got1.contains((8L, 10L, 1)))
  }

  test("fuzzyPairs on an empty corpus returns an empty frame, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val out = FuzzyJoin.fuzzyPairs(empty, "id", "s")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "dist"))
  }

  test("fuzzyPairs equals brute force on a structured id-like corpus") {
    // name#### ids: distance-1 pairs are single-digit substitutions
    val rows = (0L until 200L).map(i => i -> f"name#$i%04d").toDF("id", "s")
    val d1 = blocked(rows, 1)
    assert(d1 == brute(rows, 1))
    assert(d1.nonEmpty)
    // never a false positive by construction (verify step), and the
    // pigeonhole blocking never drops a true pair (checked above)
  }
}
