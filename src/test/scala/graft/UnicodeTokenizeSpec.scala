package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextStats}

/** The multilingual tokenization contract: [[Dedup.words]] and the
  * TextStats count family must produce real tokens for non-Latin
  * scripts (the old ASCII classes silently emitted empty arrays for
  * CJK/Cyrillic/Arabic/Devanagari text — the whole text family no-oped
  * on the majority of web-scale training data). */
class UnicodeTokenizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(filter(Dedup.words(col("t")), w => w =!= lit("")).as("w"))
      .head().getSeq[String](0).toList

  test("words: per-codepoint CJK, word-split for other scripts, ASCII " +
    "behavior unchanged") {
    assert(toks("中文文本") == Seq("中", "文", "文", "本"))
    assert(toks("ひらがな と カタカナ") ==
      Seq("ひ", "ら", "が", "な", "と", "カ", "タ", "カ", "ナ").map(_.toLowerCase))
    assert(toks("한국어 텍스트") ==
      Seq("한", "국", "어", "텍", "스", "트"))
    assert(toks("Привет, мир!") == Seq("привет", "мир"))
    assert(toks("جودة البيانات") == Seq("جودة", "البيانات"))
    // Devanagari matras are combining marks — they must NOT split a word
    assert(toks("प्रशिक्षण डेटा") == Seq("प्रशिक्षण", "डेटा"))
    assert(toks("día el año straße") == Seq("día", "el", "año", "straße"))
    // mixed Latin+CJK+digits
    assert(toks("GPU集群 scale-up 100TB") ==
      Seq("gpu", "集", "群", "scale", "up", "100tb"))
    // the old ASCII behavior is unchanged where it applied
    assert(toks("Hello,  world! 42") == Seq("hello", "world", "42"))
    assert(toks("!!!") == Seq.empty)
    assert(toks("") == Seq.empty)
  }

  test("counts, fingerprint, shingles, and jaccard dedup are " +
    "Unicode-aware end-to-end") {
    val zh = "深度学习模型的训练数据质量"  // 13 distinct CJK codepoints
    val df = Seq(
      (1L, zh),
      (2L, "Качество данных важно"),
      (3L, zh),
      (4L, zh + "很重要"))  // near-dup of 1/3: 3 extra codepoints
      .toDF("doc_id", "text")
    val c = df.select(col("doc_id"),
        TextStats.wordCount(col("text")).as("w"),
        TextStats.tokenCount(col("text")).as("t"),
        TextStats.fingerprint(col("text")).as("fp"),
        size(Dedup.shingleStrings(col("text"), 3)).as("sh"))
      .orderBy("doc_id").collect()
    assert(c(0).getAs[Long]("w") == 13L, s"zh word count ${c(0)}")
    assert(c(0).getAs[Long]("t") == 13L)
    assert(c(0).getAs[Int]("sh") == 11)  // 13 − 3 + 1, all distinct
    assert(c(1).getAs[Long]("w") == 3L)
    assert(c(1).getAs[Int]("sh") == 1)
    // identical CJK docs share a fingerprint; distinct text must NOT
    // (the ASCII tokenizer collapsed ALL non-Latin docs onto md5(''))
    assert(c(0).getAs[String]("fp") == c(2).getAs[String]("fp"))
    assert(c(0).getAs[String]("fp") != c(1).getAs[String]("fp"))
    assert(c(0).getAs[String]("fp") != c(3).getAs[String]("fp"))
    // the inverted-index jaccard join pairs the CJK near-dups
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", n = 3,
        minJaccard = 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard")))
    assert(pairs.map(p => (p._1, p._2)).toSeq ==
      Seq((1L, 3L), (1L, 4L), (3L, 4L)), pairs.mkString(","))
    assert(pairs.find(p => (p._1, p._2) == ((1L, 3L))).get._3 == 1.0)
  }

  test("langGuess: script short-circuits — kana beats Han (ja), Hangul " +
    "is ko, Han alone zh; unmarked scripts abstain to 'und'") {
    val rows = Seq(
      (1L, "深度学习の訓練データは重要です"),  // Han + kana -> ja
      (2L, "深度学习模型的训练数据"),          // Han only -> zh
      (3L, "한국어 텍스트 데이터"),            // Hangul -> ko
      (4L, "Качество данных важно"),           // Cyrillic, no markers -> und
      (5L, "the data and the model of it"))    // stopword path intact -> en
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.langGuess(col("text")).as("g"))
      .orderBy("doc_id").collect().map(_.getAs[String]("g")).toSeq
    assert(rows == Seq("ja", "zh", "ko", "und", "en"), s"$rows")
  }

  test("quality metrics produce non-degenerate scores on non-Latin text") {
    val rows = Seq(
      (1L, "深度学习模型的训练数据质量很重要，数据决定模型上限。"),
      (2L, "Качество обучающих данных важно для модели машинного обучения."),
      (3L, "प्रशिक्षण डेटा की गुणवत्ता मॉडल के लिए महत्वपूर्ण है।"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextStats.wordCount(col("text")).as("w"),
        TextStats.alphaChars(col("text")).as("alpha"),
        TextStats.punctChars(col("text")).as("punct"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("w") > 0, s"word count zero: $r")
      assert(r.getAs[Long]("alpha") > 0, s"alpha count zero: $r")
      assert(r.getAs[Long]("punct") > 0, s"punct count zero: $r")
    }
  }
}
