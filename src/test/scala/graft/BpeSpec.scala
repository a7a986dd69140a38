package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("train: hand-worked merge trajectory on the aaab corpus " +
    "(pair counts, argmax, greedy leftmost overlap handling)") {
    // histogram: aaab x2, ab x1
    // step 1: pairs (a,a)=2*2=4, (a,b)=2+1=3 -> merge (a,a) c=4
    //   aaab -> [aa, a, b] (greedy leftmost: the SECOND (a,a) overlap
    //   must NOT merge), ab -> [a, b]
    // step 2: (aa,a)=2, (a,b)=2+1=3 -> merge (a,b) c=3
    //   aaab -> [aa, a, b]? no: [aa, a, b] has (a,b) -> [aa, ab]; ab -> [ab]
    // step 3: (aa,ab)=2 -> merge c=2; aaab -> [aaab]
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", k = 3)
    assert(m.map(x => (x.l, x.r, x.count)) ==
      Seq(("a", "a", 4L), ("a", "b", 3L), ("aa", "ab", 2L)), s"$m")
    // encodeWord replays the exact training-state tokenization
    val enc = Seq("aaab", "ab", "aab", "a", "ba")
      .toDF("w").select(col("w"), Bpe.encodeWord(col("w"), m).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(enc("aaab") == Seq("aaab"))
    assert(enc("ab") == Seq("ab"))
    // 'aab': (a,a) merges first -> [aa, b]; no (a,b) adjacency remains,
    // and (aa,ab) never forms - order of learned merges matters
    assert(enc("aab") == Seq("aa", "b"), s"${enc("aab")}")
    assert(enc("a") == Seq("a"))
    assert(enc("ba") == Seq("b", "a"))
  }

  test("train: count ties break on (left, right) ascending; " +
    "single-char words are safe") {
    // "xy" x2 and "uv" x2 tie at 2 -> (u,v) wins lexicographically;
    // the lone "z" word must not break the pair scan
    val df = Seq((1L, "xy xy uv uv z")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", k = 2)
    assert(m.map(x => (x.l, x.r, x.count)) ==
      Seq(("u", "v", 2L), ("x", "y", 2L)), s"$m")
  }

  test("encodeWord serves a STREAM with a frozen vocab == batch " +
    "(stateless chained-replace expression)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val m = Bpe.train(Seq((1L, "aaab aaab ab")).toDF("doc_id", "text"),
      "text", k = 3)
    val live = Seq((10L, "aaab"), (11L, "aab"), (12L, "ba"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val batch = rows(live.toDF("id", "w")
      .select(col("id"), Bpe.encodeWord(col("w"), m).as("t")))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "w")
      .select(col("id"), Bpe.encodeWord(col("w"), m).as("t"))
      .writeStream.outputMode("append")
      .format("memory").queryName("bpe_out").start()
    try {
      mem.addData(live: _*)
      q.processAllAvailable()
      val streamed = rows(spark.table("bpe_out"))
      assert(streamed == batch, s"$streamed vs $batch")
      assert(streamed(10L) == Seq("aaab") && streamed(11L) == Seq("aa", "b"))
    } finally q.stop()
  }

  test("train stops early when no pairs remain") {
    val df = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // one merge exhausts every multi-token word; k=5 must return 1
    val m = Bpe.train(df, "text", k = 5)
    assert(m.map(x => (x.l, x.r)) == Seq(("a", "b")), s"$m")
  }
}
