package graft.ingest

/** Smart document chunker (reference S2, api/app/lib/chunker.py:13-230):
  * splits a document into target-sized word chunks with overlap, preferring
  * boundaries paragraph > sentence > pause > hard-cut.
  *
  * Pure Scala — invoked via `Dataset.flatMap` so one document fans out to N
  * chunks inside the executors (the Generator-equivalent, no UDF/driver
  * loop; SURVEY.md §2.13). Word sizes are scaled down vs the reference's
  * 800-1500/200 defaults because the testdata documents are ~100 words.
  */
object Chunker {

  final case class Chunk(
      text: String,
      startChar: Int,
      endChar: Int,
      chunkNumber: Int,
      wordCount: Int,
      boundaryType: String)

  /** Split positions after `pos` words, bounded to [minWords, maxWords],
    * choosing the best boundary in the tail window of the candidate chunk. */
  def chunk(
      text: String,
      minWords: Int = 40,
      maxWords: Int = 80,
      overlapWords: Int = 10): Seq[Chunk] = {
    if (text.isEmpty) return Seq.empty
    // Word spans: (startChar, endCharExclusive)
    val words = "\\S+".r.findAllMatchIn(text).map(m => (m.start, m.end)).toVector
    if (words.isEmpty) return Seq.empty

    def boundaryAt(wordIdx: Int): String = {
      // boundary quality of a cut AFTER word wordIdx
      val end = words(wordIdx)._2
      val tail = text.substring(words(wordIdx)._1, end)
      val gap =
        if (wordIdx + 1 < words.size) text.substring(end, words(wordIdx + 1)._1) else "\n\n"
      if (gap.contains("\n\n")) "paragraph"
      else if (tail.endsWith(".") || tail.endsWith("!") || tail.endsWith("?")) "sentence"
      else if (tail.endsWith(",") || tail.endsWith(";") || tail.endsWith(":")) "pause"
      else "hard"
    }
    val rank = Map("paragraph" -> 3, "sentence" -> 2, "pause" -> 1, "hard" -> 0)

    val out = Vector.newBuilder[Chunk]
    var start = 0
    var n = 0
    while (start < words.size) {
      val hardEnd = math.min(start + maxWords, words.size) - 1
      val searchFrom = math.min(start + minWords, words.size) - 1
      // best boundary in [searchFrom, hardEnd]; ties → latest position
      var best = hardEnd
      var bestRank = -1
      var i = searchFrom
      while (i <= hardEnd) {
        val r = rank(boundaryAt(i))
        if (r >= bestRank) { bestRank = r; best = i }
        i += 1
      }
      val (s0, _) = words(start)
      val (_, e1) = words(best)
      out += Chunk(text.substring(s0, e1), s0, e1, n, best - start + 1, boundaryAt(best))
      n += 1
      start = if (best + 1 >= words.size) words.size else math.max(best + 1 - overlapWords, start + 1)
    }
    out.result()
  }

  /** Deterministic ~fixed-size sentence-boundary chunker with exact offsets
    * (reference S3, api/app/lib/source_chunker.py): split on sentence ends,
    * pack greedily up to `maxChars`. */
  def sentenceChunks(text: String, maxChars: Int = 200): Seq[Chunk] = {
    if (text.trim.isEmpty) return Seq.empty
    val sentences = "[^.!?]*[.!?]+\\s*|[^.!?]+$".r.findAllMatchIn(text)
      .map(m => (m.start, m.end)).filter { case (a, b) => b > a }.toVector
    val out = Vector.newBuilder[Chunk]
    var curStart = -1
    var curEnd = -1
    var n = 0
    def flush(): Unit = if (curStart >= 0) {
      val t = text.substring(curStart, curEnd)
      out += Chunk(t, curStart, curEnd, n, "\\S+".r.findAllIn(t).size, "sentence")
      n += 1; curStart = -1
    }
    for ((s, e) <- sentences) {
      if (curStart < 0) { curStart = s; curEnd = e }
      else if (e - curStart <= maxChars) curEnd = e
      else { flush(); curStart = s; curEnd = e }
    }
    flush()
    out.result()
  }
}
