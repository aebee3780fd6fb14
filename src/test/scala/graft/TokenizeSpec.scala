package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, TokenizeWords}

/** TokenizeWords ≡ regexp_extract_all(lower(c), '[a-z]+') — the contract
  * every text operator's DuckDB oracle depends on. Random ASCII, boundary
  * shapes, and the non-ASCII fallback cases (including the two Unicode
  * points whose lowercase maps INTO [a-z]). */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[String]): (Seq[Seq[String]], Seq[Seq[String]]) = {
    val df = rows.zipWithIndex.map(_.swap).toDF("i", "t")
    val fast = df.select(col("i"), TokenizeWords(col("t")))
      .as[(Int, Seq[String])].collect().sortBy(_._1).map(_._2).toSeq
    val regex = df.select(col("i"), Text.tokensRegex(col("t")))
      .as[(Int, Seq[String])].collect().sortBy(_._1).map(_._2).toSeq
    (fast, regex)
  }

  test("matches the regex form on random ASCII text") {
    val rnd = new scala.util.Random(3)
    val alphabet = "abcXYZ 0189._-,;!\n\t" * 2
    val rows = Seq.fill(500)(
      Seq.fill(rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val (fast, regex) = both(rows)
    assert(fast == regex)
  }

  test("boundary shapes: empty, no letters, all letters, leading/trailing seps") {
    val rows = Seq("", "123 456 --", "abc", "ABC", "  hello  ", "a", "Z",
      "one-two_three", "MiXeD CaSe WoRdS")
    val (fast, regex) = both(rows)
    assert(fast == regex)
    assert(fast(7) == Seq("one", "two", "three"))
    assert(fast(8) == Seq("mixed", "case", "words"))
  }

  test("non-ASCII falls back to the literal lower+regex composition") {
    val rows = Seq(
      "café au lait",          // é — multibyte separator-ish content
      "İstanbul Iı",      // U+0130 lowercases to i + combining dot
      "temperature 300K here", // U+212A (Kelvin) lowercases to k
      "Москва moscow", // Cyrillic + ascii
      "naïve APPROACH")
    val (fast, regex) = both(rows)
    assert(fast == regex)
  }

  test("null propagates") {
    val r = Seq[Option[String]](None, Some("a b")).toDF("t")
      .select(TokenizeWords(col("t")).as("x")).collect()
    assert(r(0).isNullAt(0) ^ r(1).isNullAt(0))
  }
}
