package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dedup ladder invariants: exact groups, jaccard bounds, MinHash-LSH
  * recall vs the exact kernel, SimHash locality. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumped over the lazy dog"), // near dup
    (4L, "completely different content about spark engines"),
    (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG  ") // case/trim dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val groups = Dedup.exactDedup(docs, "doc_id", "text")
      .select("rep_id", "group_size").as[(Long, Long)].collect().toMap
    assert(groups(1L) == 3) // 1, 2, 5
    assert(groups(3L) == 1)
    assert(groups(4L) == 1)
  }

  test("jaccard is 1 for identical sets, 0 for disjoint, symmetric bounds") {
    val d = docs.select($"doc_id", Dedup.charShingles($"text", 4).as("sh"))
    val a = d.toDF("a_id", "a_sh")
    val b = d.toDF("b_id", "b_sh")
    val j = a.join(b, $"a_id" < $"b_id")
      .select($"a_id", $"b_id", Dedup.jaccard($"a_sh", $"b_sh").as("j"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.6 && j((1L, 3L)) < 1.0)
    assert(j((1L, 4L)) < 0.1)
  }

  test("minhash LSH finds the exact near-dup pairs (high-jaccard recall)") {
    val found = Dedup.minhashNearDups(docs.where($"doc_id" <= 4), "doc_id", "text",
        shingleK = 4, numHashes = 32, bands = 16, minJaccard = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L))) // identical: always hashes together
    assert(found.contains((1L, 3L)) || found.contains((2L, 3L))) // near dup
    assert(!found.exists(p => p._1 == 4L || p._2 == 4L)) // verified filter
  }

  test("simhash: identical docs share fingerprints; near dups are close") {
    val fp = Dedup.simhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) == fp(5L)) // tokenization lowercases
    assert(Dedup.hamming(fp(1L), fp(3L)) <= 16)
    assert(Dedup.hamming(fp(1L), fp(4L)) > 16)
  }

  test("portable hash family: same recall/locality as the xxhash64 path") {
    val found = Dedup.minhashNearDups(docs.where($"doc_id" <= 4), "doc_id", "text",
        shingleK = 4, numHashes = 32, bands = 16, minJaccard = 0.5, portable = true)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)))
    assert(found.contains((1L, 3L)) || found.contains((2L, 3L)))
    assert(!found.exists(p => p._1 == 4L || p._2 == 4L))

    val fp = Dedup.simhash64(docs, "doc_id", "text", portable = true)
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L) && fp(1L) == fp(5L))
    assert(fp.values.forall(v => v >= 0L && v < (1L << 60))) // 60-bit range
    assert(Dedup.hamming(fp(1L), fp(3L)) < Dedup.hamming(fp(1L), fp(4L)))
  }

  test("portable minhash signature agreement estimates jaccard") {
    // Seeded synthetic docs with controlled shingle overlap: signature
    // agreement (fraction of equal minhashes) is an unbiased estimator of
    // jaccard, so high/low-overlap pairs must separate cleanly even at 32
    // hashes (σ ≈ 0.09).
    val rnd = new scala.util.Random(42)
    def randWords(n: Int) = Seq.fill(n)(rnd.alphanumeric.take(6).mkString).mkString(" ")
    val base = randWords(120)
    val nearDup = base + " " + randWords(6)      // high overlap
    val unrelated = randWords(120)               // low overlap
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("id", "text")
    val withSh = docs.select($"id", Dedup.charShingles($"text", 4).as("sh"))
    val sig = Dedup.portableMinhashSignatures(withSh, numHashes = 32)
      .as[(Long, Seq[Long])].collect().toMap
    def agreement(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(agreement(sig(1L), sig(2L)) > 0.6)
    assert(agreement(sig(1L), sig(3L)) < 0.3)
  }

  test("containment flags a near-superset pair that Jaccard misses") {
    val rnd = new scala.util.Random(11)
    def randWords(n: Int) =
      Seq.fill(n)(Seq.fill(5)(('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
    val small = randWords(15)
    val big = small + " " + randWords(150) // small is wholly contained
    val docs = Seq((1L, small), (2L, big)).toDF("id", "text")
    val cont = Dedup.containmentPairs(docs, "id", "text",
        shingleK = 4, minContainment = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(cont.length == 1 && cont.head._3 > 0.9) // near-superset caught
    val jac = Dedup.exactJaccardPairs(docs, "id", "text",
        shingleK = 4, minJaccard = 0.5)
      .collect()
    assert(jac.isEmpty) // symmetric similarity misses it entirely
  }

  test("banded hamming join finds exactly the all-pairs result") {
    val rnd = new scala.util.Random(23)
    // random 64-bit fingerprints plus planted near-dups (flip ≤ maxH bits)
    val base = Seq.fill(40)(rnd.nextLong())
    def flip(x: Long, k: Int): Long =
      (1 to k).foldLeft(x)((v, _) => v ^ (1L << rnd.nextInt(64)))
    val fps = base.zipWithIndex.map { case (f, i) => (i.toLong, f) } ++
      base.take(8).zipWithIndex.map { case (f, i) => (100L + i, flip(f, 1 + rnd.nextInt(4))) }
    val df = fps.toDF("id", "fp")
    for (maxH <- Seq(0, 3, 12)) {
      val banded = Dedup.hammingNearPairs(df, "id", "fp", maxH)
        .as[(Long, Long, Long)].collect().toSet
      val allPairs = df.toDF("a_id", "a_fp")
        .join(df.toDF("b_id", "b_fp"), $"a_id" < $"b_id")
        .withColumn("hamming", Dedup.hamming64($"a_fp", $"b_fp").cast("long"))
        .where($"hamming" <= maxH)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(t => (t._1, t._3, t._5)).toSet
      assert(banded == allPairs, s"maxH=$maxH")
    }
  }

  test("containment dominates jaccard pairwise on a random corpus") {
    // min(|A|,|B|) <= |A∪B| for every pair, so containment >= jaccard —
    // and at threshold 0 both kernels must emit exactly the pairs that
    // share at least one shingle (the inverted index is lossless).
    val rnd = new scala.util.Random(31)
    val docs = (1 to 25).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(25))(
        Seq.fill(4)(('a' + rnd.nextInt(6)).toChar).mkString).mkString(" "))
    }.toDF("id", "text")
    val jac = Dedup.exactJaccardPairs(docs, "id", "text", 4, minJaccard = 0.0)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val con = Dedup.containmentPairs(docs, "id", "text", 4, minContainment = 0.0)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(jac.keySet == con.keySet) // same candidate pairs, both kernels
    assert(jac.nonEmpty)
    jac.foreach { case (pair, j) =>
      assert(con(pair) >= j - 1e-9, s"pair $pair: containment ${con(pair)} < jaccard $j")
    }
  }

  test("dedupClusters closes pairs transitively with a numeric-min canonical") {
    // A≈B, B≈C (A and C never paired) plus an independent {10, 2} pair —
    // the second cluster is the lexicographic trap: min("10","2") = "10"
    // as strings, but the canonical must be numeric min = 2.
    val pairs = Seq((1L, 5L), (5L, 3L), (10L, 2L)).toDF("a_id", "b_id")
    val out = Dedup.dedupClusters(pairs)
      .as[(Long, Long, Long, Int)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out.keySet == Set(1L, 5L, 3L, 10L, 2L))
    Seq(1L, 5L, 3L).foreach { id =>
      assert(out(id)._1 == 1L && out(id)._2 == 3L, s"doc $id")
    }
    Seq(10L, 2L).foreach { id =>
      assert(out(id)._1 == 2L && out(id)._2 == 2L, s"doc $id")
    }
    // exactly one canonical per cluster, and it is its own representative
    assert(out.count(_._2._3 == 1) == 2)
    assert(out(1L)._3 == 1 && out(2L)._3 == 1)
  }

  test("dedupClusters agrees with a driver union-find on random pair sets") {
    val rnd = new scala.util.Random(41)
    val pairs = Seq.fill(120)(
        (1L + rnd.nextInt(60), 1L + rnd.nextInt(60)))
      .filter(p => p._1 != p._2).distinct
    val out = Dedup.dedupClusters(pairs.toDF("a_id", "b_id"))
      .as[(Long, Long, Long, Int)].collect()
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val expect = parent.keys.toSeq.groupBy(find)
    val expectCanon = expect.view.mapValues(_.min).toMap
    assert(out.length == parent.keys.size) // one row per clustered doc
    out.foreach { case (doc, canon, size, isCanon) =>
      val root = find(doc)
      assert(canon == expectCanon(root), s"doc $doc")
      assert(size == expect(root).size.toLong, s"doc $doc size")
      assert((isCanon == 1) == (doc == canon))
    }
  }

  test("decontaminationHits counts distinct shared n-grams vs the eval set") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),  // eval
      (40L, "pack my box with five dozen liquor jugs"),     // eval
      (1L, "the quick brown fox ran away"),                 // shares 2 4-grams w/ 0
      (2L, "my box with five dozen eggs inside"),           // shares 2 w/ 40
      (3L, "completely unrelated text about spark engines"), // clean
      (4L, "tiny doc")                                      // < n tokens
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminationHits(docs, "doc_id", "text",
        isEval = $"doc_id" % 40 === 0, n = 4)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // doc 1: "the quick brown fox" + "quick brown fox jumps"? no — doc 1 has
    // "quick brown fox ran", so only "the quick brown fox" is shared.
    assert(out(1L) == (1L, 0L))
    // doc 2: "my box with five" + "box with five dozen" shared with 40
    assert(out(2L) == (2L, 40L))
    assert(!out.contains(3L) && !out.contains(4L))
    assert(!out.contains(0L) && !out.contains(40L)) // eval rows never flagged
  }

  test("LSH bucket cap drops oversized buckets, leaves sane ones intact") {
    // docs 1/2 share identical raw text: every one of their band buckets
    // has ≥2 members. cap = 1 keeps only singleton buckets → no pairs can
    // form at all; a roomy cap reproduces the uncapped result exactly.
    val uncapped = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)))
    val roomy = Dedup.minhashNearDups(docs, "doc_id", "text",
      maxBucketSize = Some(100))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(roomy == uncapped)
    val tight = Dedup.minhashNearDups(docs, "doc_id", "text",
      maxBucketSize = Some(1))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(tight.isEmpty) // only singleton buckets survive a cap of 1
  }

  test("incremental dedup admits only unseen fingerprints across epochs") {
    val root = java.nio.file.Files.createTempDirectory("dedup-ix").toString
    val store = new graft.core.SnapshotStore(spark, root)

    // epoch 1: batch-internal dup (1≡2 after normalization) collapses to
    // the min-id representative; no index yet so both fingerprints admit
    val e1 = Seq((1L, "alpha beta"), (2L, "ALPHA BETA "), (3L, "gamma delta"))
      .toDF("doc_id", "text")
    val (fresh1, delta1) = Dedup.dedupAgainstIndex(e1, "doc_id", "text")
    assert(fresh1.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    store.commit("fp_index", delta1)

    // epoch 2: 4 duplicates epoch 1's "alpha beta" (cross-epoch drop via
    // the index anti-join), 5≡6 collapse in-batch, 5 is genuinely new
    val e2 = Seq((4L, "alpha beta"), (5L, "epsilon zeta"), (6L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val ix = store.read("fp_index") // pins an immutable version
    val (fresh2, delta2) = Dedup.dedupAgainstIndex(e2, "doc_id", "text", Some(ix))
    assert(fresh2.select("doc_id").as[Long].collect().toSet == Set(5L))
    store.append("fp_index", delta2)

    // the index grew by exactly the admitted delta, and a re-delivered
    // epoch 2 admits nothing (idempotent re-ingest, the S6 MERGE contract)
    assert(store.read("fp_index").count() == 3L)
    val (replay, _) = Dedup.dedupAgainstIndex(e2, "doc_id", "text",
      Some(store.read("fp_index")))
    assert(replay.isEmpty)
  }

  test("incremental dedup over random epochs matches the one-shot model") {
    // Seeded multi-epoch simulation vs a driver-side model: after N
    // epochs, the union of admitted rows must hold each distinct
    // normalized text EXACTLY once, represented by the min id of its
    // EARLIEST epoch of appearance — i.e. incremental admission ≡ running
    // exactDedup over everything seen so far, epoch order respected.
    val rnd = new scala.util.Random(7L)
    val texts = Vector("aa bb", "cc dd", "ee ff", "gg hh", "ii jj")
    var ix: Option[org.apache.spark.sql.DataFrame] = None
    val model = scala.collection.mutable.Map[String, Long]() // norm text -> rep id
    val admitted = scala.collection.mutable.Set[Long]()
    var nextId = 0L
    (1 to 4).foreach { _ =>
      val batch = (1 to (2 + rnd.nextInt(4))).map { _ =>
        val t = texts(rnd.nextInt(texts.size))
        val decorated = if (rnd.nextBoolean()) t.toUpperCase + "  " else t
        nextId += 1; (nextId, decorated)
      }
      val df = batch.toDF("doc_id", "text")
      val (fresh, delta) = Dedup.dedupAgainstIndex(df, "doc_id", "text", ix)
      val got = fresh.select("doc_id").as[Long].collect().toSet
      // model: first-appearance epoch wins; min id within that epoch
      val expect = batch.groupBy(_._2.toLowerCase.trim)
        .collect { case (norm, rows) if !model.contains(norm) =>
          val rep = rows.map(_._1).min
          model(norm) = rep; rep
        }.toSet
      assert(got == expect, s"epoch admitted $got, model says $expect")
      admitted ++= got
      ix = Some(ix.map(_.unionByName(delta)).getOrElse(delta)
        .localCheckpoint(true))
    }
    assert(admitted == model.values.toSet)
    assert(admitted.size == model.size) // one representative per distinct text
  }

  test("portableHash60 matches the DuckDB hex-decode formula") {
    // ('0x' || substr(md5('hello'),1,15))::BIGINT in DuckDB = 419982666956583591
    val h = spark.range(1)
      .select(Dedup.portableHash60(lit("hello")).as("h"))
      .as[Long].head()
    assert(h == 419982666956583591L)
  }
}
