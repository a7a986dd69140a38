package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom

class BloomSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0 until 100).map(i => s"key_$i").toDF("k")
  private lazy val bloom = Bloom.build(corpus, "k", numBits = 4096, numHashes = 5)

  test("build matches a local brute-force bitset; nulls skipped") {
    val expected = new Array[Long](4096 / 64)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (0 until 100).map(i => s"key_$i").foreach { k =>
      val h1 = java.lang.Long.parseLong(md5hex(k).take(15), 16)
      val h2 = java.lang.Long.parseLong(md5hex(k + "|b2").take(14), 16)
      (0 until 5).foreach { d =>
        val b = ((h1 + d * h2) % 4096).toInt
        expected(b >> 6) |= (1L << (b & 63))
      }
    }
    assert(bloom.words.toSeq == expected.toSeq)
    assert(bloom.numHashes == 5)
    val withNull = corpus.union(Seq(null.asInstanceOf[String]).toDF("k"))
    assert(Bloom.build(withNull, "k", 4096, 5).words.toSeq == expected.toSeq)
  }

  test("no false negatives; novel keys mostly rejected; map-side plan") {
    val members = corpus
      .select(Bloom.mightContain(col("k"), bloom).as("m"))
    assert(members.where(!col("m")).count() == 0, "false negative!")
    val novel = (0 until 1000).map(i => s"novel_$i").toDF("k")
      .select(Bloom.mightContain(col("k"), bloom).as("m"))
    val fp = novel.where(col("m")).count()
    // 500 set bits of 4096 → fpp ≈ (500/4096)^5 ~ 3e-5; allow slack
    assert(fp <= 10, s"implausible false-positive count $fp/1000")
    assert(!novel.queryExecution.executedPlan.toString.contains("Exchange"),
      "membership test must be map-side")
    // a null key was never inserted: must be false, not null
    val nullRow = Seq(null.asInstanceOf[String]).toDF("k")
      .select(Bloom.mightContain(col("k"), bloom).as("m")).head()
    assert(!nullRow.isNullAt(0) && !nullRow.getBoolean(0))
  }

  test("guards: word multiple, hash count bounds") {
    intercept[IllegalArgumentException](new Bloom.BloomAgg(100, 5))
    intercept[IllegalArgumentException](new Bloom.BloomAgg(4096, 0))
    intercept[IllegalArgumentException](new Bloom.BloomAgg(4096, 65))
  }
}
