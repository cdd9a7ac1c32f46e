package graft.vlm

import org.apache.spark.sql.functions._

/** A5 depth statistics + A13 cache stats. */
class DepthStatsSpec extends SparkSpec {
  import spark.implicits._

  test("depthStatsCol: valid-pixel mask, exact median (odd and even), mean (utils.py:93-127)") {
    val df = Seq(
      (1, Seq(1.0, 2.0, 3.0, 0.0, 150.0, Double.NaN), 6L), // valid = [1,2,3]
      (2, Seq(4.0, 1.0, 3.0, 2.0), 4L), // valid = [1,2,3,4], even median 2.5
      (3, Seq(0.0, -5.0), 2L) // none valid
    ).toDF("id", "depths", "total")
      .select(col("id"), GeoFunctions.depthStatsCol(col("depths"), col("total")).as("ds"))
      .orderBy("id")
      .select("id", "ds.present", "ds.valid_pixels", "ds.total_pixels", "ds.min", "ds.max", "ds.median", "ds.mean")
      .collect()

    val r1 = df(0)
    assert(r1.getBoolean(1) && r1.getLong(2) == 3 && r1.getLong(3) == 6)
    assert(r1.getDouble(4) == 1.0 && r1.getDouble(5) == 3.0 && r1.getDouble(6) == 2.0 && r1.getDouble(7) == 2.0)
    val r2 = df(1)
    assert(r2.getLong(2) == 4 && r2.getDouble(6) == 2.5 && r2.getDouble(7) == 2.5)
    val r3 = df(2)
    assert(!r3.getBoolean(1) && r3.getLong(2) == 0 && r3.isNullAt(6))
  }

  test("cacheStats aggregates location counts (build_enhanced_codebook.py:76-84)") {
    val cache = Seq((1L, 3L), (2L, 1L), (3L, 2L)).toDF("instance_id", "n_locations")
    val r = Codebook.cacheStats(cache).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 6 && r.getLong(2) == 1 && r.getLong(3) == 3)
    assert(r.getDouble(4) == 2.0)
  }
}
