package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends GraftSpec {
  import spark.implicits._

  test("known Morton values: even bits carry x, odd bits carry y") {
    val out = Seq((15L, 0L), (0L, 15L), (65535L, 65535L), (0L, 0L))
      .toDF("x", "y")
      .select(ZOrder.interleave16($"x", $"y").as("z")).as[Long].collect()
    assert(out === Array(85L, 170L, 4294967295L, 0L))
  }

  test("roundtrip: deinterleave(interleave(x, y)) == (x, y) over random 16-bit pairs") {
    val pairs = (0 until 2000).map { i =>
      // SplitMix64-ish deterministic scramble, masked to 16 bits
      val x = ((i * 0x9E3779B97F4A7C15L) >>> 13) & 0xFFFFL
      val y = ((i * 0xBF58476D1CE4E5B9L) >>> 17) & 0xFFFFL
      (x, y)
    }
    val z = pairs.toDF("x", "y").select($"x", $"y",
      ZOrder.interleave16($"x", $"y").as("z"))
    val (xb, yb) = ZOrder.deinterleave16($"z")
    val bad = z.select($"x", $"y", xb.as("x2"), yb.as("y2"))
      .filter($"x" =!= $"x2" || $"y" =!= $"y2").count()
    assert(bad === 0L)
  }

  test("layout: zkey buckets are narrow in BOTH dimensions (a linear sort is not)") {
    // full 256×256 grid; 256 zkey-contiguous buckets of 256 cells each
    // are exact 16×16 squares — every bucket spans ≤15 in x AND y. The
    // x-major sort's buckets span the full 255 in y. This is the
    // row-group min/max skipping win, measured.
    val grid = spark.range(65536L)
      .select(($"id" / 256).cast("long").as("x"), ($"id" % 256).cast("long").as("y"))
    val z = grid.select($"x", $"y", ZOrder.interleave16($"x", $"y").as("z"))
    val zBuckets = z.groupBy((($"z" / 256)).cast("long").as("b"))
      .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"))
    val worst = zBuckets.agg(max($"xr"), max($"yr")).as[(Long, Long)].head()
    assert(worst === ((15L, 15L)),
      "every 256-cell z-run must be a 16x16 square: both dims prunable")
    val xBuckets = grid.groupBy((($"x" * 256 + $"y") / 256).cast("long").as("b"))
      .agg((max($"y") - min($"y")).as("yr"))
    val xWorstY = xBuckets.agg(max($"yr")).as[Long].head()
    assert(xWorstY === 255L, "the x-major layout cannot prune on y")
  }
}
