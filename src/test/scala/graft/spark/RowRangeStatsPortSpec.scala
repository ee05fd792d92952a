package graft.spark

import org.apache.spark.sql.functions._

/**
 * RowRangeDataStaticticsTest port (core/store/src/test/.../statistics/
 * RowRangeDataStaticticsTest.java): the min/max row-id statistic under
 * unsigned byte order — exactly the per-bucket min_cell/max_cell lineage
 * aggregate our ingest observes — including the cross-batch merge.
 */
class RowRangeStatsPortSpec extends SparkTestBase {
  import spark.implicits._

  private def binDf(ids: Seq[String]) =
    ids.toDF("s").select(col("s").cast("binary").as("row_id"))

  test("testIngest: min 0123 / max 5064 over the reference id set; merge extends max to 8062") {
    val batch1 = Seq("20030", "014", "0124", "0123", "5064", "50632")
    val r = binDf(batch1).agg(min("row_id"), max("row_id")).collect()(0)
    assert(new String(r.getAs[Array[Byte]](0)) == "0123")
    assert(new String(r.getAs[Array[Byte]](1)) == "5064") // "5064" > "50632" bytewise
    // merge with a second batch (the mergeable-monoid contract): the
    // combined stat == the stat of the union
    val batch2 = Seq("20030", "014", "8062")
    val m = binDf(batch1 ++ batch2).agg(min("row_id"), max("row_id")).collect()(0)
    assert(new String(m.getAs[Array[Byte]](0)) == "0123")
    assert(new String(m.getAs[Array[Byte]](1)) == "8062")
  }

  test("testEmpty: the statistic of nothing is unset (no rows -> null aggregates)") {
    val r = binDf(Seq.empty[String]).agg(min("row_id"), max("row_id")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
