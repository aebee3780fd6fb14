package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.{Curves, DecodeFloatArray}
import graft.ingest.Chunker
import graft.algebra.ProgramValidator

/** ScalaCheck properties over the pure kernels — random-input invariants
  * the example-based specs can't sweep (SURVEY §5: the reference lacks
  * property tests; scalacheck-style laws are this engine's addition). */
object PropertySuite extends Properties("graft") {

  private val asciiText: Gen[String] = for {
    n <- Gen.choose(0, 400)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('.'),
      1 -> Gen.const(','), 1 -> Gen.const('\n')))
  } yield cs.mkString

  property("chunker offsets always slice the source text exactly") =
    Prop.forAll(asciiText) { text =>
      Chunker.chunk(text, minWords = 5, maxWords = 12, overlapWords = 2)
        .forall(c => text.substring(c.startChar, c.endChar) == c.text)
    }

  property("chunker covers every word: last chunk ends at last word") =
    Prop.forAll(asciiText) { text =>
      val words = "\\S+".r.findAllMatchIn(text).toVector
      val chunks = Chunker.chunk(text, minWords = 5, maxWords = 12, overlapWords = 2)
      words.isEmpty == chunks.isEmpty &&
        (chunks.isEmpty || chunks.last.endChar == words.last.end)
    }

  property("chunker word counts within [1, maxWords]") =
    Prop.forAll(asciiText) { text =>
      Chunker.chunk(text, minWords = 5, maxWords = 12, overlapWords = 2)
        .forall(c => c.wordCount >= 1 && c.wordCount <= 12)
    }

  property("sentence chunker offsets slice exactly and numbers are dense") =
    Prop.forAll(asciiText) { text =>
      val cs = Chunker.sentenceChunks(text, maxChars = 40)
      cs.forall(c => text.substring(c.startChar, c.endChar) == c.text) &&
        cs.map(_.chunkNumber) == cs.indices
    }

  property("M-M saturation maps [0,inf) into [0,1) monotonically") =
    Prop.forAll(Gen.choose(0.0, 1e6), Gen.choose(0.0, 1e6)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val (fLo, fHi) = (Curves.mm(lo, 2.0), Curves.mm(hi, 2.0))
      fLo >= 0.0 && fHi < 1.0 && fLo <= fHi
    }

  property("bezier stays in [0,1] and hits both endpoints") =
    Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0),
      Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) {
      (x, x1, y1, x2, y2) =>
        val y = Curves.bezierYForX(x, x1, y1, x2, y2)
        y >= -1e-6 && y <= 1.0 + 1e-6 &&
          math.abs(Curves.bezierYForX(0, x1, y1, x2, y2)) < 1e-6 &&
          math.abs(Curves.bezierYForX(1, x1, y1, x2, y2) - 1) < 1e-4
    }

  property("halfToFloat is total and finite for normal half range") =
    Prop.forAll(Gen.choose(0, 0xffff)) { h =>
      val f = DecodeFloatArray.halfToFloat(h)
      val exp = (h >>> 10) & 0x1f
      if (exp == 0x1f) f.isNaN || f.isInfinite
      else !f.isNaN && !f.isInfinite && math.abs(f) <= 65504.0f
    }

  property("halfToFloat sign symmetry") =
    Prop.forAll(Gen.choose(0, 0x7fff)) { h =>
      val pos = DecodeFloatArray.halfToFloat(h)
      val neg = DecodeFloatArray.halfToFloat(h | 0x8000)
      (pos.isNaN && neg.isNaN) || neg == -pos
    }

  property("validator is total (never throws) on arbitrary statement text") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      ProgramValidator.validateStatement(s)
      true
    }

  property("validator accepts canonical rel types it generates") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaUpperChar).map(_.mkString)) { t =>
      ProgramValidator.isValidRelType(t)
    }

  // --- bounded top-k aggregate (functions.TopK): any partitioning of the
  // input through reduce+merge must equal the brute-force sort-take ---

  private val scoredGen: Gen[List[graft.functions.Scored]] = Gen.listOf(
    for {
      s <- Gen.choose(0, 9).map(_.toDouble) // coarse scores force ties
      k <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    } yield graft.functions.Scored(s, k))

  property("topk reduce+merge equals brute-force sort-take for any split") =
    Prop.forAll(scoredGen, Gen.choose(1, 5), Gen.choose(0, 100)) { (xs, k, cut) =>
      val agg = new graft.functions.TopKAggregator(k)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.size + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val brute = xs.sortBy(a => (-a.score, a.key)).take(k)
      merged == brute
    }

  property("topk buffer never exceeds k") =
    Prop.forAll(scoredGen, Gen.choose(1, 4)) { (xs, k) =>
      val agg = new graft.functions.TopKAggregator(k)
      xs.foldLeft(agg.zero) { (b, a) =>
        val nb = agg.reduce(b, a)
        if (nb.size > k) throw new AssertionError(s"buffer ${nb.size} > $k")
        nb
      }
      true
    }

  // --- Misra-Gries sketch (operators.HeavyHitters): the mergeable-summary
  // guarantee — any item above n/(capacity+1) survives any split/merge ---

  private val streamGen: Gen[List[String]] = for {
    hot <- Gen.choose(5, 30)
    tailN <- Gen.choose(0, 60)
    tail <- Gen.listOfN(tailN, Gen.oneOf((0 until 25).map(i => s"t$i")))
    // shuffle with a Gen-drawn seed so a ScalaCheck replay seed
    // reproduces the exact permutation that failed
    shuffleSeed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield new scala.util.Random(shuffleSeed)
    .shuffle(List.fill(hot)("HOT") ++ tail)

  property("misra-gries keeps every item above n/(capacity+1) across any split") =
    Prop.forAll(streamGen, Gen.choose(2, 8), Gen.choose(0, 1000)) { (xs, cap, cut) =>
      val agg = new graft.operators.MisraGriesAggregator(cap)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val sketch = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val freq = xs.groupBy(identity).map { case (k, v) => k -> v.size }
      val n = xs.size
      sketch.size <= cap &&
        freq.forall { case (item, f) =>
          f * (cap + 1) <= n || sketch.contains(item)
        }
    }

  // --- annealing pressure curve (analysis.Annealing.ecologicalPressure) ---

  property("ecological pressure is bounded, zero in comfort, one past emergency") =
    Prop.forAll(Gen.choose(0.0, 300.0)) { avg =>
      val (s, zone) = graft.analysis.Annealing.ecologicalPressure(avg)
      val inComfort = avg <= 0 ||
        (avg >= graft.analysis.Annealing.PressureComfortMin &&
          avg <= graft.analysis.Annealing.PressureComfortMax)
      s >= 0.0 && s <= 1.0 &&
        (!inComfort || (s == 0.0 && zone == "comfort")) &&
        (avg < graft.analysis.Annealing.PressureEmergency ||
          (s == 1.0 && zone == "emergency"))
    }

  property("ecological pressure is monotone on the over-pressure flank") =
    Prop.forAll(Gen.choose(80.0, 150.0), Gen.choose(80.0, 150.0)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      graft.analysis.Annealing.ecologicalPressure(lo)._1 <=
        graft.analysis.Annealing.ecologicalPressure(hi)._1 + 1e-9
    }

  property("ecological pressure rises as fragmentation deepens below comfort") =
    Prop.forAll(Gen.choose(0.001, 10.0), Gen.choose(0.001, 10.0)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      // smaller avg = more fragmented = at least as much pressure
      graft.analysis.Annealing.ecologicalPressure(hi)._1 <=
        graft.analysis.Annealing.ecologicalPressure(lo)._1 + 1e-9
    }

  // --- UMAP low-dimensional curve fit (analysis.UmapKernel.fitCurve) ---

  property("UMAP curve fit yields a positive decreasing membership curve") =
    Prop.forAll(Gen.choose(0.01, 0.8), Gen.choose(0.5, 2.0)) { (minDist, spread) =>
      val (a, b) = graft.analysis.UmapKernel.fitCurve(minDist, spread)
      def f(d: Double) = 1.0 / (1.0 + a * math.pow(d, 2.0 * b))
      a > 0 && b > 0 && a.isFinite && b.isFinite &&
        // decreasing in d, ≈1 at 0, small far beyond the spread
        f(0.001) > f(spread) && f(spread) > f(3 * spread) &&
        f(0.001) > 0.9 && f(6 * spread) < 0.35
    }

  // --- Composite bucket layout (graftbridge.BucketLayout + routing) ---

  private val dimsGen: Gen[Seq[Int]] =
    Gen.choose(1, 3).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1, 9)).map(_.toSeq))

  property("mixed-radix decode inverts the writer's encode for every index") =
    Prop.forAll(dimsGen) { dims =>
      val layout = org.apache.spark.sql.graftbridge
        .BucketLayout(dims.indices.map(i => s"c$i"), dims)
      (0 until layout.total).forall { idx =>
        val parts = layout.decode(idx)
        // row-major re-encode (the writer's fold) round-trips
        val enc = parts.zip(dims).foldLeft(0) {
          case (acc, (b, n)) => acc * n + b
        }
        enc == idx && parts.zip(dims).forall { case (b, n) => b >= 0 && b < n }
      }
    }

  property("routing tokens hash to exactly their index for any total") =
    Prop.forAll(Gen.choose(1, 200)) { total =>
      val tokens = org.apache.spark.sql.graftbridge.GraftBucketRouting
        .tokens(total)
      tokens.length == total && tokens.indices.forall { r =>
        org.apache.spark.sql.graftbridge.GraftBucketFunction.bucketId(
          tokens(r), org.apache.spark.sql.types.IntegerType, total) == r
      }
    }
}
