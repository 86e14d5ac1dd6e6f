package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q32's streaming bracketing pass edge cases the sf oracle can't pin:
  * n = 1 (both bracket ranks collapse to 1 and the interpolation
  * fraction is 0), n = 2 with a fractional 0.95 position, and duplicate
  * values whose count-span covers both bracket ranks in ONE row. All
  * values chosen so quantile_cont arithmetic is exact in doubles.
  */
class PercentileEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q32 exact percentiles: single-row, two-row, and duplicate-value groups") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q32edge").toString
    Seq(
      // group X: n = 1 -> every quantile is the value itself
      ("X", 10.0, 5.0),
      // group Y: n = 2 -> p50 midpoint, p95 = lo + 0.95*(hi-lo)
      ("Y", 10.0, 1.0), ("Y", 20.0, 3.0),
      // group Z: duplicates -> p50 ranks (2,3) land inside the count-3
      // span of value 5 (one bracketing row carries both ranks)
      ("Z", 5.0, 2.0), ("Z", 5.0, 2.0), ("Z", 5.0, 4.0), ("Z", 7.0, 4.0)
    ).toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val got = Relational.q32Percentiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toList
    val want = List(
      ("X", 10.0, 10.0, 5.0),
      ("Y", 15.0, 19.5, 1.5),
      // Z prices [5,5,5,7]: p50 pos=1.5 -> both ranks in the 5-run;
      // p95 pos=2.85 -> 5 + 0.85*2 = 6.7; qty [2,2,4,4]: p25 pos=0.75
      // -> ranks (1,2) both value 2
      ("Z", 5.0, 6.7, 2.0))
    assert(got == want, s"got $got")
  }
}
