package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends GraftSpec {
  import spark.implicits._

  private val B = 100L

  test("greedy invariants: bins fit the budget, ids are contiguous, order is preserved") {
    // weights chosen to force mid-group splits: 40+50 fits, +30 overflows, …
    val df = Seq(
      ("a", 1L, 40L), ("a", 2L, 50L), ("a", 3L, 30L), ("a", 4L, 80L),
      ("b", 1L, 10L), ("b", 2L, 10L), ("b", 3L, 10L))
      .toDF("g", "ord", "w")
    val out = Packing.packGreedy(df, "g", "ord", "w", B)
      .orderBy("g", "ord").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      ("a", 1L, 40L, 0L), ("a", 2L, 50L, 0L), ("a", 3L, 30L, 1L), ("a", 4L, 80L, 2L),
      ("b", 1L, 10L, 0L), ("b", 2L, 10L, 0L), ("b", 3L, 10L, 0L)))
    // every (group, bin) total fits the budget
    val sums = out.groupBy(r => (r._1, r._4)).values.map(_.map(_._3).sum)
    assert(sums.forall(_ <= B))
  }

  test("an oversized row gets a bin of its own and does not poison neighbors") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 500L), ("g", 3L, 10L), ("g", 4L, 10L))
      .toDF("g", "ord", "w")
    val out = Packing.packGreedy(df, "g", "ord", "w", B)
      .orderBy("ord").select("ord", "bin_id").as[(Long, Long)].collect()
    assert(out === Array((1L, 0L), (2L, 1L), (3L, 2L), (4L, 2L)),
      "the 500-weight row must sit alone; the rows after it share a fresh bin")
  }

  test("groups pack independently regardless of partition interleaving") {
    // 60 groups of 8 rows each across 4 partitions — state must reset on
    // every group boundary inside each sorted partition
    val df = spark.range(480)
      .select((col("id") % 60).as("g"), col("id").as("ord"), lit(30L).as("w"))
    val out = Packing.packGreedy(df, "g", "ord", "w", B)
    val perBin = out.groupBy("g", "bin_id").agg(sum("w").as("s"), count(lit(1)).as("n"))
    assert(perBin.filter(col("s") > B).count() === 0)
    // 8 rows of 30 at budget 100 → bins of 3,3,2 per group
    assert(out.groupBy("g").agg(max("bin_id").as("m")).filter(col("m") =!= 2).count() === 0)
  }

  test("zero-weight rows never open a new bin") {
    val df = Seq(("g", 1L, 0L), ("g", 2L, 100L), ("g", 3L, 0L))
      .toDF("g", "ord", "w")
    val out = Packing.packGreedy(df, "g", "ord", "w", B)
      .orderBy("ord").select("bin_id").as[Long].collect()
    assert(out === Array(0L, 0L, 0L))
  }
}
