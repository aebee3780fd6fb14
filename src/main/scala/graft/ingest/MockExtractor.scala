package graft.ingest

import java.security.MessageDigest

/** Deterministic mock concept extractor (reference S4 —
  * api/app/lib/llm_extractor.py:173-263 with the mock provider
  * api/app/lib/mock_ai_provider.py; pytest runs with AI_PROVIDER=mock).
  *
  * From a chunk of text it derives concepts (distinct salient tokens),
  * instances (quotes = the token in context) and relationships (co-occurring
  * concept pairs), plus a deterministic pseudo-embedding per concept — all
  * pure functions of the input so differential tests are reproducible.
  * Invoked via `mapPartitions`/`flatMap`; a real LLM provider would be a
  * drop-in trait replacement.
  */
object MockExtractor {

  final case class Concept(conceptId: String, label: String, embedding: Array[Float])
  final case class Instance(conceptId: String, quote: String)
  final case class Relationship(from: String, to: String, relType: String, confidence: Double)
  final case class Extraction(concepts: Seq[Concept], instances: Seq[Instance],
      relationships: Seq[Relationship])

  private val relTypes = Vector("SUPPORTS", "IMPLIES", "CAUSES", "ENABLES", "RELATES_TO")

  private def sha(s: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))

  /** Deterministic unit-norm pseudo-embedding from the label hash. */
  def pseudoEmbedding(label: String, dim: Int = 8): Array[Float] = {
    val h = sha(label)
    val raw = Array.tabulate(dim)(i => ((h(i % h.length) & 0xff) - 127.5))
    val norm = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / norm).toFloat)
  }

  def conceptId(docId: String, label: String): String =
    s"${docId}_${sha(label).take(4).map("%02x".format(_)).mkString}"

  /** Extract from one chunk: concepts = tokens of length ≥5 (dedup, first
    * occurrence order, cap 10); instances = one quote per concept;
    * relationships = adjacent concept pairs with hash-derived type and
    * confidence. */
  def extract(docId: String, text: String): Extraction = {
    val toks = "[a-z]{5,}".r.findAllIn(text.toLowerCase).toVector
    val labels = toks.distinct.take(10)
    val concepts = labels.map(l => Concept(conceptId(docId, l), l, pseudoEmbedding(l)))
    val instances = labels.map { l =>
      val i = text.toLowerCase.indexOf(l)
      val from = math.max(0, i - 10)
      val to = math.min(text.length, i + l.length + 10)
      Instance(conceptId(docId, l), text.substring(from, to))
    }
    val relationships = labels.sliding(2).collect { case Seq(a, b) =>
      val h = sha(a + "|" + b)
      Relationship(
        conceptId(docId, a), conceptId(docId, b),
        relTypes((h(0) & 0xff) % relTypes.size),
        math.rint(((h(1) & 0xff) / 255.0) * 100) / 100.0)
    }.toVector
    Extraction(concepts, instances, relationships)
  }
}
