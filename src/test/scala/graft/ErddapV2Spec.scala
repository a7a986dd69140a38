package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ErddapV2Spec extends AnyFunSuite with SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("erddapv2").toFile
    Files.writeString(new java.io.File(d, "ru29_obs.csv").toPath,
      """time,latitude,longitude,Profile ID
        |UTC,degrees_north,degrees_east,1
        |2021-06-01T03:12:00Z,39.102,-73.514,1
        |2021-06-01T07:44:00Z,39.141,-73.488,2
        |2021-06-02T01:02:00Z,none,None,3
        |""".stripMargin)
    Files.writeString(new java.io.File(d, "sp10_obs.csv").toPath,
      """time,latitude,longitude,Profile ID
        |UTC,degrees_north,degrees_east,1
        |2021-07-01T00:00:00Z,10.5,20.5,1
        |""".stripMargin)
    d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("time", TimestampType), StructField("latitude", DoubleType),
    StructField("longitude", DoubleType), StructField("profile_id", LongType)))

  private def read =
    spark.read.format("graft.sources.v2.ErddapTableProvider")
      .schema(schema).option("path", s"$dir/*_obs.csv").load()

  test("reads multi-file glob, skips units rows, honors NA tokens") {
    val df = read
    assert(df.count() == 4)
    assert(df.where(col("latitude").isNull).count() == 1)
    assert(df.rdd.getNumPartitions == 2) // one partition per file
  }

  test("unitsRow modes: always skips, never keeps, auto detects by parse") {
    val d2 = Files.createTempDirectory("erddapv2units").toFile
    // classic ERDDAP shape: units row has UNPARSEABLE typed cells
    Files.writeString(new java.io.File(d2, "a.csv").toPath,
      "time,latitude\nUTC,degrees_north\n2021-06-01T00:00:00Z,1.5\n")
    // plain CSV: the first data row is real data (parses fine)
    Files.writeString(new java.io.File(d2, "b.csv").toPath,
      "time,latitude\n2021-06-01T00:00:00Z,1.5\n2021-06-02T00:00:00Z,2.5\n")
    val s2 = StructType(Seq(StructField("time", TimestampType),
      StructField("latitude", DoubleType)))
    def readWith(file: String, mode: String) =
      spark.read.format("graft.sources.v2.ErddapTableProvider")
        .schema(s2).option("path", s"${d2.getAbsolutePath}/$file")
        .option("unitsRow", mode).load()
    assert(readWith("a.csv", "always").count() == 1)
    assert(readWith("a.csv", "auto").count() == 1) // 'degrees_north' fails parse → skipped
    assert(readWith("a.csv", "never").count() == 2) // units row coerces to (ts=null, lat=null)
    assert(readWith("b.csv", "always").count() == 1) // blind skip eats a REAL row
    assert(readWith("b.csv", "auto").count() == 2)   // parseable first row kept
    assert(readWith("b.csv", "never").count() == 2)
  }

  test("filter pushdown reaches the DSv2 scan and filters rows") {
    val df = read.where(col("time") >= lit("2021-06-01 05:00:00"))
      .where(col("latitude").isNotNull)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=") && plan.contains("GreaterThanOrEqual(time"),
      plan)
    assert(df.count() == 2)
  }

  test("limit pushdown reaches the DSv2 scan and stops the reader early") {
    val df = read.limit(2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("limit=2"), plan)
    assert(df.count() == 2)
    // limit composes with pushed filters: the per-file cap counts
    // POST-filter rows (items_per_page semantics), so a filtered limit
    // still returns `limit` matching rows when available
    val filtered = read.where(col("profile_id") >= 2L).limit(1)
    assert(filtered.queryExecution.executedPlan.toString.contains("limit=1"))
    assert(filtered.count() == 1)
    assert(filtered.collect()(0).getAs[Long]("profile_id") >= 2L)
    // unlimited scans still read everything
    assert(read.count() == 4)
  }

  test("column pruning reaches readSchema") {
    val df = read.select("profile_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 1L, 2L, 3L))
  }

  test("schema inference yields normalized string columns") {
    val df = spark.read.format("graft.sources.v2.ErddapTableProvider")
      .option("path", s"$dir/ru29_obs.csv").load()
    assert(df.columns.toSeq == Seq("time", "latitude", "longitude", "profile_id"))
  }
}
