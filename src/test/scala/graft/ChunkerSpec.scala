package graft

import graft.ingest.Chunker

/** Smart-chunker contract (reference api/app/lib/chunker.py:13-230):
  * bounded chunk sizes, overlap, boundary priority, exact offsets. */
class ChunkerSpec extends SparkSpec {

  val para1 = (1 to 30).map(i => s"alpha$i").mkString(" ")
  val para2 = (1 to 30).map(i => s"beta$i").mkString(" ")
  val doc = s"$para1.\n\n$para2."

  test("chunks respect min/max word bounds and cover the document") {
    val chunks = Chunker.chunk(doc, minWords = 10, maxWords = 25, overlapWords = 3)
    assert(chunks.nonEmpty)
    chunks.dropRight(1).foreach(c => assert(c.wordCount >= 10 && c.wordCount <= 25))
    assert(chunks.head.startChar == 0)
    assert(chunks.last.endChar == doc.length)
  }

  test("offsets slice the original text exactly") {
    val chunks = Chunker.chunk(doc, minWords = 10, maxWords = 25, overlapWords = 3)
    chunks.foreach { c =>
      assert(doc.substring(c.startChar, c.endChar) == c.text)
    }
  }

  test("paragraph boundary preferred over hard cut") {
    // 30-word paragraphs, window 20..35 words: the paragraph break at word
    // 30 is inside the search window and must win.
    val chunks = Chunker.chunk(doc, minWords = 20, maxWords = 35, overlapWords = 0)
    assert(chunks.head.boundaryType == "paragraph")
    assert(chunks.head.wordCount == 30)
  }

  test("overlap repeats trailing words in the next chunk") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val chunks = Chunker.chunk(words, minWords = 20, maxWords = 20, overlapWords = 5)
    val first = chunks(0).text.split(" ")
    val second = chunks(1).text.split(" ")
    assert(first.takeRight(5).toSeq == second.take(5).toSeq)
  }

  test("empty and single-word inputs") {
    assert(Chunker.chunk("").isEmpty)
    val one = Chunker.chunk("hello")
    assert(one.size == 1 && one.head.wordCount == 1)
  }

  test("sentence chunker packs sentences up to maxChars with exact offsets") {
    val text = "One sentence here. Another sentence there. Third one now. Fourth closes it."
    val chunks = Chunker.sentenceChunks(text, maxChars = 45)
    assert(chunks.size >= 2)
    chunks.foreach(c => assert(text.substring(c.startChar, c.endChar) == c.text))
    assert(chunks.map(_.chunkNumber) == chunks.indices.toSeq)
  }
}
