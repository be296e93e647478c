package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  val base = "spark is a unified analytics engine for large scale data processing " +
    "with high level apis in scala java python and r plus an optimized engine"
  val nearDup = base.replace("optimized", "optimised") // 1-char different
  val docs = Seq(
    (1L, base, "en"),
    (2L, nearDup, "en"),
    (3L, base.toUpperCase, "en"), // exact dup after normalization
    (4L, "totally unrelated text about cooking pasta with tomatoes and basil leaves for dinner tonight yum", "en"))
    .toDF("doc_id", "text", "lang")

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val out = Dedup.exact(docs, "doc_id", "text")
    val dupGroup = out.filter(col("n_dups") === 2).collect()
    assert(dupGroup.length == 1)
    assert(dupGroup(0).getAs[Long]("keeper") == 1L)
    assert(out.count() == 3) // 4 docs, one merged pair
  }

  test("minhash LSH finds the near-duplicate pair") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
    assert(!pairs.contains((1L, 4L)), "unrelated docs must not collide in all bands")
  }

  test("simhash near-dups finds the near pair at low hamming") {
    val nd = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((1L, 2L)) || nd.contains((1L, 3L)), s"got $nd")
  }

  test("simhash near-dups: empty docs excluded, hot buckets capped") {
    import spark.implicits._
    // r14 review: every empty/whitespace doc hashes to ONE signature —
    // without the filter they form a quadratic bucket (and meaningless
    // pairs); without a cap a corpus-hot chunk does the same
    val d = Seq((1L, "hello world foo bar baz"),
      (2L, "hello world foo bar baz"),
      (3L, "completely different text here now"),
      (4L, "   "), (5L, "")).toDF("doc_id", "text")
    val nd = Dedup.simhashNearDups(d, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd == Set((1L, 2L)), nd)
    // cap 1: the (1,2) bucket has 2 docs > 1 → capped-recall contract
    val capped = Dedup.simhashNearDups(d, "doc_id", "text",
        maxHamming = 0, maxBucket = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(capped.isEmpty, capped.toSeq)
  }

  test("ngram jaccard high for near-dups, low for unrelated") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 3)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 2L)) > 0.8)
    assert(j((1L, 4L)) < 0.4)
  }

  test("brute-force cosine top-k: query vector ranks itself first with sim 1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 2)
      .as[(Long, Double)].collect()
    assert(top(0)._1 == 0L && math.abs(top(0)._2 - 1.0) < 1e-12)
    assert(top(1)._1 == 1L)
  }

  test("IVF top-k: high recall vs brute force with partial probing") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (model, indexed) = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 8)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).as[Seq[Float]].head().map(_.toDouble)
    val ivf = Similarity.ivfTopK(model, indexed, "vec_id", "embedding", qv,
      k = 10, nProbe = 4).select("vec_id").as[Long].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") === 0).select(col("embedding").as("qe")), 10)
      .select("vec_id").as[Long].collect().toSet
    // query itself always found (its own cell is the nearest centroid)
    assert(ivf.contains(0L))
    // probing half the lists should recover most of the true top-10
    assert((ivf intersect brute).size >= 5, s"recall too low: $ivf vs $brute")
  }

  test("LSH near pairs: identical vectors share a bucket with sim 1") {
    val vecs = Seq(
      (0L, Array.tabulate(16)(i => i.toFloat / 16)),
      (1L, Array.tabulate(16)(i => i.toFloat / 16)),
      (2L, Array.tabulate(16)(i => -i.toFloat / 16)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.lshNearPairs(vecs, "vec_id", "embedding",
      bits = 8, minSim = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("LSH hot-bucket cap: hotness reads the collapse, autoCap keeps genuine clusters") {
    // 40 identical "template" vectors (signature collapse — their bucket's
    // pair set is a disguised cross join), a 3-member genuine cluster in a
    // different direction, and 5 alternating-sign singletons
    val template = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => (j + 1).toFloat)))
    val cluster = (100L until 103L).map(i =>
      (i, Array.tabulate(8)(j => if (j % 2 == 0) -2f else 1f)))
    val singles = (200L until 205L).map(i =>
      (i, Array.tabulate(8)(j =>
        if ((j + i) % 3 == 0) -(j + 7).toFloat else (i % 5 + j).toFloat)))
    val vecs = (template ++ cluster ++ singles).toDF("vec_id", "embedding")

    // the diagnostic's hottest row IS the collapsed bucket
    val hot = Similarity.bucketHotness(vecs, "vec_id", "embedding", bits = 8)
      .as[(Long, Long)].collect()
    assert(hot.head._1 == 40L, s"hottest m: ${hot.head}")
    assert(hot.exists(_._1 == 3L), s"cluster bucket missing: ${hot.toSeq}")

    val clusterPairs = (for {
      a <- 100L until 103L; b <- (a + 1) until 103L
    } yield (a, b)).toSet

    // explicit cap below the template size: the collapsed bucket produces
    // no pairs, the genuine cluster's pairs all survive
    val capped = Similarity.lshNearPairs(vecs, "vec_id", "embedding",
        bits = 8, minSim = 0.99, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == clusterPairs, s"capped: $capped")

    // autoCap (maxBucket = 0): templateShare 0.5 × 48 vectors refuses the
    // 40-bucket, keeps everything below — same pairs, no hand-chosen cap
    val auto = Similarity.lshNearPairs(vecs, "vec_id", "embedding",
        bits = 8, minSim = 0.99, maxBucket = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto == clusterPairs, s"auto: $auto")

    // cap off (default): superset — the template bucket's quadratic pair
    // set is back, identical vectors at sim 1
    val off = Similarity.lshNearPairs(vecs, "vec_id", "embedding",
        bits = 8, minSim = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(off.size == clusterPairs.size + 40 * 39 / 2, s"off size: ${off.size}")
  }

  test("multi-table LSH: table 0 reproduces the single table, OR lifts " +
    "recall, pairs deduped, cap per table") {
    // a genuinely-near pair (cos ≈ 0.995) plus unrelated fillers: with
    // FEW bits per table some near pairs land in different buckets in
    // one table but collide in another — L tables can only ADD pairs
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(16)(j => rnd.nextGaussian().toFloat)
    val vecs = ((0L until 30L).map { i =>
      val v =
        if (i < 10L) base.zipWithIndex.map { case (x, j) =>
          x + (0.05 * ((i * 7 + j) % 5 - 2)).toFloat } // near-cluster of 10
        else Array.tabulate(16)(_ => rnd.nextGaussian().toFloat)
      (i, v)
    }).toDF("vec_id", "embedding")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val one = pairsOf(Similarity.lshNearPairsTables(vecs, "vec_id",
      "embedding", bits = 6, minSim = 0.9, tables = 1))
    val single = pairsOf(Similarity.lshNearPairs(vecs, "vec_id",
      "embedding", bits = 6, minSim = 0.9))
    assert(one.toSet == single.toSet, "tables=1 must equal lshNearPairs")
    val two = pairsOf(Similarity.lshNearPairsTables(vecs, "vec_id",
      "embedding", bits = 6, minSim = 0.9, tables = 2))
    val four = pairsOf(Similarity.lshNearPairsTables(vecs, "vec_id",
      "embedding", bits = 6, minSim = 0.9, tables = 4))
    // monotone recall: every single-table pair survives, more may appear
    assert(single.toSet.subsetOf(two.toSet), s"2-table lost pairs")
    assert(two.toSet.subsetOf(four.toSet), s"4-table lost pairs")
    // OR-dedup: no (id_a, id_b) appears twice even when both tables agree
    assert(four.distinct.size == four.size, "pairs must be deduped")
    // at 4 tables × 6 bits the 10-member cluster is essentially complete
    val clusterPairs = (for { a <- 0L until 10L; b <- (a + 1) until 10L }
      yield (a, b)).toSet
    assert((clusterPairs -- four.toSet).size <= 3,
      s"4-table recall too low: missing ${clusterPairs -- four.toSet}")
    // the lattice family keeps table 0 == hyperplaneSignatureLattice too
    val latticeOne = pairsOf(Similarity.lshNearPairsTables(vecs, "vec_id",
      "embedding", bits = 4, minSim = 0.9, tables = 1,
      signatureAt = Similarity.hyperplaneSignatureLatticeAt))
    val latticeSingle = pairsOf(Similarity.lshNearPairs(vecs, "vec_id",
      "embedding", bits = 4, minSim = 0.9,
      signature = Similarity.hyperplaneSignatureLattice))
    assert(latticeOne.toSet == latticeSingle.toSet)
    // per-table cap: 25 identical vectors collapse EVERY table's bucket;
    // cap 10 refuses them in each table independently, near pair survives
    val collapse = ((0L until 25L).map(i =>
      (i, Array.tabulate(8)(j => (j + 1).toFloat))) ++ Seq(
      (100L, Array.tabulate(8)(j => if (j % 2 == 0) -2f else 1f)),
      (101L, Array.tabulate(8)(j => if (j % 2 == 0) -2f else 1f))))
      .toDF("vec_id", "embedding")
    val capped = pairsOf(Similarity.lshNearPairsTables(collapse, "vec_id",
      "embedding", bits = 8, minSim = 0.99, tables = 2, maxBucket = 10))
    assert(capped.toSet == Set((100L, 101L)), s"capped: $capped")
    // embeddingNearDup routes tables > 1 through the same chain
    val nd = Similarity.embeddingNearDup(collapse, "vec_id", "embedding",
        bits = 8, minSim = 0.99, maxBucket = 10, tables = 2)
      .as[(Long, Boolean, Long)].collect()
      .map { case (id, d, of) => id -> ((d, of)) }.toMap
    assert(nd(101L) == ((true, 100L)) && nd(100L) == ((false, -1L)))
  }

  test("multi-probe LSH: equals the declarative Hamming<=1 predicate, " +
    "probes=0 degenerates to the single table, no duplicates, cap drops " +
    "collapsed-bucket members entirely") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = Array.tabulate(16)(_ => rnd.nextGaussian().toFloat)
    val vecs = ((0L until 40L).map { i =>
      val v =
        if (i < 12L) base.zipWithIndex.map { case (x, j) =>
          x + (0.05 * ((i * 7 + j) % 5 - 2)).toFloat } // near-cluster of 12
        else Array.tabulate(16)(_ => rnd.nextGaussian().toFloat)
      (i, v)
    }).toDF("vec_id", "embedding")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSeq

    // driver-side reference: signatures from the SAME expression, pairs
    // at Hamming <= 1, verified by exact cosine — the declarative form
    val sigs = vecs.select(col("vec_id"),
      Similarity.hyperplaneSignature(col("embedding"), 6).as("sig"))
      .as[(Long, Long)].collect().toMap
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { j =>
        dp += a(j).toDouble * b(j); na += a(j).toDouble * a(j)
        nb += b(j).toDouble * b(j)
      }
      dp / math.sqrt(na * nb)
    }
    val want = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 1
      if cosine(raw(a), raw(b)) >= 0.9
    } yield (a, b)).toSet

    val got = pairsOf(Similarity.lshNearPairsMultiProbe(vecs, "vec_id",
      "embedding", bits = 6, minSim = 0.9))
    assert(got.distinct.size == got.size,
      "each qualifying pair must be emitted exactly once")
    assert(got.toSet == want, s"multiprobe != Hamming<=1 reference: " +
      s"extra=${got.toSet -- want} missing=${want -- got.toSet}")

    // probes = 0 is exactly the single-table pair set
    val zero = pairsOf(Similarity.lshNearPairsMultiProbe(vecs, "vec_id",
      "embedding", bits = 6, minSim = 0.9, probes = 0))
    val single = pairsOf(Similarity.lshNearPairs(vecs, "vec_id",
      "embedding", bits = 6, minSim = 0.9))
    assert(zero.toSet == single.toSet, "probes=0 must equal lshNearPairs")
    // and the full probe set can only ADD pairs over the single table
    assert(single.toSet.subsetOf(got.toSet), "probing lost home pairs")

    // cap contract: members of a refused home bucket produce no pairs AT
    // ALL — not even through a Hamming-1 neighbor's bucket. minSim = -1
    // disables the verify so any leaked candidate would surface.
    val collapse = ((0L until 25L).map(i =>
      (i, Array.tabulate(8)(j => (j + 1).toFloat))) ++ Seq(
      (100L, Array.tabulate(8)(j => if (j % 2 == 0) -2f else 1f)),
      (101L, Array.tabulate(8)(j => if (j % 2 == 0) -2f else 1f))))
      .toDF("vec_id", "embedding")
    val capped = pairsOf(Similarity.lshNearPairsMultiProbe(collapse,
      "vec_id", "embedding", bits = 8, minSim = -1.0, maxBucket = 10))
    assert(capped.toSet == Set((100L, 101L)), s"capped: $capped")

    // embeddingNearDup routes probes > 0 through the same chain (and
    // refuses the two knobs together — they are alternatives)
    val nd = Similarity.embeddingNearDup(collapse, "vec_id", "embedding",
        bits = 8, minSim = 0.99, maxBucket = 10, probes = 8)
      .as[(Long, Boolean, Long)].collect()
      .map { case (id, d, of) => id -> ((d, of)) }.toMap
    assert(nd(101L) == ((true, 100L)) && nd(100L) == ((false, -1L)))
    intercept[IllegalArgumentException] {
      Similarity.embeddingNearDup(collapse, "vec_id", "embedding",
        tables = 2, probes = 8)
    }

    // lattice family: the board query's exact configuration agrees with
    // the declarative predicate too (4-bit lattice signature)
    val latSigs = vecs.select(col("vec_id"),
      Similarity.hyperplaneSignatureLattice(col("embedding"), 4).as("sig"))
      .as[(Long, Long)].collect().toMap
    val latWant = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L
      if java.lang.Long.bitCount(latSigs(a) ^ latSigs(b)) <= 1
      if cosine(raw(a), raw(b)) >= 0.1
    } yield (a, b)).toSet
    val latGot = pairsOf(Similarity.lshNearPairsMultiProbe(vecs, "vec_id",
      "embedding", bits = 4, minSim = 0.1,
      signature = Similarity.hyperplaneSignatureLattice))
    assert(latGot.toSet == latWant,
      s"lattice multiprobe != reference: extra=${latGot.toSet -- latWant} " +
        s"missing=${latWant -- latGot.toSet}")

    // scale shape: the candidate join is an equi-join on the bucket —
    // never a cartesian/nested-loop (the Hamming predicate must be
    // reached through probe-bucket expansion, not pair enumeration)
    val plan = Similarity.lshNearPairsMultiProbe(vecs, "vec_id",
      "embedding", bits = 16, minSim = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"multiprobe plan degenerated to pair enumeration:\n$plan")
  }

  test("prefixJaccardPairs maxCandidates budget binds the auto cap") {
    import spark.implicits._
    // two clusters of identical docs: size 4 (6 pairs) and size 10 (45
    // pairs). Every prefix token of a cluster member has nd = cluster
    // size, so a budget that affords the nd=4 cumulative forecast but
    // not the nd=10 one must cap at 4 and keep ONLY the small cluster's
    // pairs — the documented recall trade, chosen by budget.
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "nova pulsar quasar nebula comet meteor aurora eclipse orbit"
    val docs = ((0L until 4L).map(i => (i, textA)) ++
      (10L until 20L).map(i => (i, textB))).toDF("doc_id", "text")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val aPairs = (for { a <- 0L until 4L; b <- (a + 1) until 4L }
      yield (a, b)).toSet
    val bPairs = (for { a <- 10L until 20L; b <- (a + 1) until 20L }
      yield (a, b)).toSet

    // budget off: autocap (templateShare 1.0 keeps both clusters; the
    // default 0.5 floor at 14 docs would refuse the 10-cluster anyway)
    val off = pairsOf(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      maxDocsPerTok = 0, templateShare = 1.0))
    assert(off == aPairs ++ bPairs, s"budget-off pairs: $off")

    // a budget strictly between the nd=4 cumulative forecast and the
    // full (nd=10) one must choose cap 4. Derive it from the corpus's
    // OWN nd distribution via prefixHotness (r17 ADVICE: the previous
    // hard-coded 1000 sat ~6% below the nd=10 sum, so an unrelated
    // shingle-normalization change could flip the cap choice without
    // any budget-logic regression) — the midpoint is maximally robust.
    val ndDist = Dedup.prefixHotness(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def cumPairs(cap: Long): Double = ndDist.iterator
      .filter(_._1 <= cap)
      .map { case (nd, nToks) => nToks.toDouble * nd * (nd - 1) / 2 }.sum
    val cum4 = cumPairs(4L); val cum10 = cumPairs(10L)
    assert(cum4 > 0 && cum10 > cum4, s"fixture lost its two bands: $ndDist")
    val budget = ((cum4 + cum10) / 2).toLong
    val budgeted = pairsOf(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      maxDocsPerTok = 0, templateShare = 1.0, maxCandidates = budget))
    assert(budgeted == aPairs, s"budgeted pairs: $budgeted")
    // and the budget-chosen cap is exactly the explicit-cap semantics
    val explicit = pairsOf(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      maxDocsPerTok = 4))
    assert(budgeted == explicit)

    // a budget larger than the full forecast changes nothing
    val loose = pairsOf(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      maxDocsPerTok = 0, templateShare = 1.0, maxCandidates = 100000000L))
    assert(loose == off)
    // refused alongside an explicit cap — the caller already chose
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        maxDocsPerTok = 4, maxCandidates = 10L)
    }

    // degenerate budget (r17 ADVICE): a corpus of identical-doc PAIRS —
    // every prefix token at nd = 2, so the nd=2 band ALONE exceeds a
    // budget of 5 and no viable cap satisfies it. The documented
    // contract is PROCEED at the floor cap with a loud not-satisfiable
    // warn, never a silent empty result: all pairs still emit.
    val pairTexts = (0 until 12).map(k =>
      (0 until 10).map(j => f"pp$k%02dw$j%02d").mkString(" "))
    val pairDocs = pairTexts.zipWithIndex.flatMap { case (t, k) =>
      Seq((100L + 2 * k, t), (101L + 2 * k, t)) }.toDF("doc_id", "text")
    val wantPairs = (0 until 12).map(k => (100L + 2 * k, 101L + 2 * k)).toSet
    val overBudget = pairsOf(Dedup.prefixJaccardPairs(pairDocs, "doc_id",
      "text", maxDocsPerTok = 0, templateShare = 1.0, maxCandidates = 5L))
    assert(overBudget == wantPairs, s"over-budget floor run: $overBudget")
  }

  test("autoRoute: forecast blowout switches prefixJaccardPairs and " +
      "containmentPairs to banded-minhash candidates (r17 VERDICT 4)") {
    import spark.implicits._
    // rehearsal corpus shape in miniature: two large near-identical
    // families — the finite-vocabulary regime where every family
    // member's prefix tokens sit at nd ≈ family size, just BELOW the
    // share floor, so the share-derived autocap admits a ~quadratic
    // candidate volume — plus per-doc-unique lone docs that pair nothing.
    val wordsA = (0 until 120).map(i => f"alpha$i%03d").mkString(" ")
    val wordsB = (0 until 120).map(i => f"bravo$i%03d").mkString(" ")
    val clusterA = (0L until 120L).map(i => (i, s"$wordsA tl$i"))
    val clusterB = (1000L until 1120L).map(i => (i, s"$wordsB tl$i"))
    val lone = (2000L until 2010L).map(i =>
      (i, (0 until 12).map(j => f"solo${i}x$j%02d").mkString(" ")))
    val all = clusterA ++ clusterB ++ lone
    val d = all.toDF("doc_id", "text")

    // ground truth by brute force over the same normalize+shingle
    // semantics, within the families only (lone docs share no 8-gram
    // with anything; cross-family vocab is disjoint)
    def sh(s: String): Set[String] =
      s.trim.toLowerCase.replaceAll("\\s+", " ").sliding(8).toSet
    val sets = all.map { case (id, t) => id -> sh(t) }.toMap
    def familyTruth(ids: Seq[Long]): Set[(Long, Long)] =
      (for {
        i <- ids.indices.iterator
        j <- (i + 1) until ids.size
        inter = (sets(ids(i)) & sets(ids(j))).size
        union = sets(ids(i)).size + sets(ids(j)).size - inter
        if 5 * inter >= 3 * union
      } yield (ids(i), ids(j))).toSet
    val truth = familyTruth(clusterA.map(_._1)) ++
      familyTruth(clusterB.map(_._1))
    assert(truth.size == 2 * (119 * 120 / 2), s"fixture drift: ${truth.size}")

    // the forecast must clear the warn threshold (route trigger): ~336
    // shared prefix tokens per family at nd ≈ 120 → ~4.8e6 admitted
    // candidates > WarnCandidatesPerDoc × 250 docs. Routed run = banded-minhash
    // candidates + the SAME exact verify: full recall here (a 0.94
    // word-shingle near-dup misses all 8 bands w.p. ~3e-8), zero false
    // positives by construction.
    val routed = Dedup.prefixJaccardPairs(d, "doc_id", "text",
      maxDocsPerTok = 0, autoRoute = true)
    val routedPlan = routed.queryExecution.optimizedPlan.toString
    // engagement proof: the candidate join runs on the banded (band, bh)
    // bucket columns; the un-routed exact path joins on prefix tok rows
    // and never materializes band hashes
    assert(routedPlan.contains("bh#"),
      s"autoRoute did not engage (no banded chain in plan):\n$routedPlan")
    val routedPairs = routed.select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(routedPairs == truth,
      s"routed pairs: extra=${routedPairs -- truth} " +
        s"missing=${truth -- routedPairs}")
    // same corpus, same autocap, autoRoute off: the exact join is kept
    // (no lanes in the plan) and — the families being admitted by the
    // share floor — finds the same truth, proving the route changed the
    // CANDIDATE GENERATOR, not the semantics
    val exact = Dedup.prefixJaccardPairs(d, "doc_id", "text",
      maxDocsPerTok = 0)
    assert(!exact.queryExecution.optimizedPlan.toString.contains("bh#"))
    val exactPairs = exact.select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(exactPairs == truth)

    // containment: the r20 UNION route — banded candidates for the
    // families PLUS one-sided rarest-k candidates for asymmetric pairs,
    // verified once against the exact C(sub→sup) = I/n_sub ≥ 3/4
    // threshold. A planted quote-in-doc pair (J ≈ 0.04 — invisible to
    // the bands, trivially visible to the rarest-k probe) proves the
    // one-sided leg is live BEHAVIORALLY: the volume-mode probe is
    // checkpointed (its cap rollup is an action), so its rarest_min_k
    // marker is hidden behind a LogicalRDD and a plan grep cannot see
    // it — finding this pair can only happen through that leg.
    val quote = (1 to 12).map(j => s"uq${j}y${j * 7 % 31}").mkString(" ")
    val qFiller = (1 to 288).map(j => s"uf${j}m").mkString(" ")
    val dc = (all ++ Seq((3000L, quote), (3001L, quote + " " + qFiller)))
      .toDF("doc_id", "text")
    def famContain(ids: Seq[Long]): Set[(Long, Long)] =
      (for {
        i <- ids.indices.iterator
        j <- ids.indices.iterator
        if i != j
        inter = (sets(ids(i)) & sets(ids(j))).size
        if 4 * inter >= 3 * sets(ids(i)).size
      } yield (ids(i), ids(j))).toSet
    val cTruth = famContain(clusterA.map(_._1)) ++
      famContain(clusterB.map(_._1)) + ((3000L, 3001L))
    val cRouted = Dedup.containmentPairs(dc, "doc_id", "text",
      maxDocsPerTok = 0, autoRoute = true)
    // engagement proof: the routed chain never runs the prefix_min_k
    // probe the exact prefix × index join is built on
    val cPlan = cRouted.queryExecution.optimizedPlan.toString
    assert(!cPlan.contains("prefix_min_k"),
      s"containment autoRoute did not engage:\n$cPlan")
    assert(Dedup.containmentPairs(dc, "doc_id", "text", maxDocsPerTok = 0)
      .queryExecution.optimizedPlan.toString.contains("prefix_min_k"),
      "exact containment path lost its prefix_min_k probe marker")
    val cPairs = cRouted.select("id_sub", "id_sup")
      .as[(Long, Long)].collect().toSet
    assert(cPairs == cTruth,
      s"routed containment: extra=${cPairs -- cTruth} " +
        s"missing=${cTruth -- cPairs}")
    // refused alongside an explicit cap — the caller already chose
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(d, "doc_id", "text", maxDocsPerTok = 20,
        autoRoute = true)
    }
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(d, "doc_id", "text", maxDocsPerTok = 20,
        autoRoute = true)
    }
    // autoRoute and maxCandidates are mutually exclusive (review r18: the
    // routed chain is bucket-bounded; a stated hard budget must never be
    // silently ignored)
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(d, "doc_id", "text", maxDocsPerTok = 0,
        autoRoute = true, maxCandidates = 100L)
    }
  }

  test("autoRoute bucket cap: a family larger than the 1000-bucket " +
      "default survives when the share floor admits it (r18 review)") {
    import spark.implicits._
    // 1050 identical docs + 1100 per-doc-unique lone docs: the share
    // floor (ceil(0.5 × 2150) = 1075) admits the family (nd = 1050),
    // the forecast (~28 prefix toks × C(1050,2) ≈ 1.5e7 ≈ 7k/doc) trips
    // the threshold, and the routed chain's bucket cap is the SAME share
    // floor — minhashCandidates' fixed 1000 default would have dropped
    // the family's single 1050-member band buckets and zeroed its recall
    // in exactly the regime the route exists for.
    val fam = "orbit comet nebula pulsar quasar nova aurora eclipse " +
      "meteor corona"
    val docs = ((0L until 1050L).map(i => (i, fam)) ++
      (10000L until 11100L).map(i =>
        (i, (0 until 10).map(j => f"lone${i}w$j%02d").mkString(" "))))
      .toDF("doc_id", "text")
    val routed = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      maxDocsPerTok = 0, autoRoute = true)
    assert(routed.queryExecution.optimizedPlan.toString.contains("bh#"),
      "route did not engage")
    val n = routed.count()
    assert(n == 1050L * 1049 / 2, s"family pairs through the route: $n")
  }

  test("volume-capped route bucket cap: families within budget admitted, " +
      "corpus-share accident classes refused, floors respected (r19)") {
    // the measured 500k rollup shape (CrouteCapProbe): smooth Zipf dfreq
    // made the family estimate corpus-scale (498488); the accident
    // classes 51828/15677 must be refused by the volume budget while the
    // genuine-family classes stay admitted
    val measured = Array[(Long, Long)]((1L, 3000000L), (2L, 400000L),
      (50L, 2000L), (263L, 1L), (265L, 1L), (281L, 1L), (316L, 1L),
      (337L, 1L), (576L, 1L), (3402L, 1L), (6909L, 1L), (15677L, 1L),
      (51828L, 1L))
    val eff = graft.operators.Dedup.volCappedBucketCap(measured, bands = 8,
      familyCap = 498488, label = "spec")
    assert(eff >= 3402 && eff < 15677,
      s"accident classes must be refused, mid classes admitted: $eff")
    // the 1050-member family in a small corpus (the r18 spec regime):
    // 8·C(1050,2) ≈ 4.4e6 sits under the ABSOLUTE floor
    // (Dedup.MinRouteCandidates = 5e6 — only ~12% headroom, so this
    // scenario is a real guard on the floor's value), so the per-doc
    // budget must not refuse it even though 200/doc would
    val family = Array[(Long, Long)]((1L, 8800L), (1050L, 8L))
    val eff2 = graft.operators.Dedup.volCappedBucketCap(family, bands = 8,
      familyCap = 2100, label = "spec")
    assert(eff2 == 1050, s"in-budget family must be admitted: $eff2")
    // familyCap binds when it is TIGHTER than the volume cap (q121's
    // measured shape: prefix-derived cap 1308 vs volume cap ~6909)
    val eff3 = graft.operators.Dedup.volCappedBucketCap(measured, bands = 8,
      familyCap = 1308, label = "spec")
    assert(eff3 == 1308, s"tighter family cap must bind: $eff3")
    // degenerate: budget exhausted below the 1000 recall floor -> the
    // floor wins (loudly), never a sub-1000 cap
    val hot = Array[(Long, Long)]((900L, 4000L))
    val eff4 = graft.operators.Dedup.volCappedBucketCap(hot, bands = 8,
      familyCap = 5000, label = "spec")
    assert(eff4 == 1000, s"recall floor must hold: $eff4")
  }

  test("connectedComponents matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val nodes = (1L to n.toLong).toDF("id")
      val pairEdges = (1 to n).map { _ =>
        val a = rnd.nextInt(n).toLong + 1; val b = rnd.nextInt(n).toLong + 1
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val pairs = pairEdges.toDF("id_a", "id_b")
      // both dispatch arms must agree with union-find: the driver-side
      // fast path (default limit) and the iterative label propagation
      // (limit 0 forces it)
      val got = graft.operators.Dedup.connectedComponents(nodes, "id", pairs)
        .as[(Long, Long)].collect().toMap
      val gotIter = graft.operators.Dedup.connectedComponents(nodes, "id",
          pairs, broadcastEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      // reference union-find
      val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairEdges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val expect = (1L to n.toLong).map(i => i -> find(i)).toMap
      // normalize: cluster label must be the min member either way
      assert(got == expect, s"trial $trial")
      assert(gotIter == expect, s"trial $trial (iterative)")
    }
  }

  test("embeddingNearDup flags later near-neighbors, earliest wins") {
    import spark.implicits._
    // 0, 1, 2 nearly collinear (same LSH bucket, cos ≈ 1); 3 orthogonal
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.1f)),
      (1L, Array(0.99f, 0.0f, 0.1f)),
      (2L, Array(1.01f, 0.0f, 0.1f)),
      (3L, Array(0.0f, 1.0f, -0.5f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.embeddingNearDup(vecs, "vec_id", "embedding",
      bits = 8, minSim = 0.99)
      .as[(Long, Boolean, Long)].collect().toSet
    assert(got == Set((0L, false, -1L), (1L, true, 0L), (2L, true, 0L),
      (3L, false, -1L)))
  }

  test("boilerplateSpans counts corpus-repeated spans per doc") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon" // one shared 5-gram
    val docs = Seq(
      (0L, s"$shared zeta"),   // spans: shared+1 more, 1 boiler
      (1L, s"eta $shared"),    // spans: shared+1 more, 1 boiler
      (2L, "one two three four five six"), // 2 spans, 0 boiler
      (3L, "   ")              // filtered out
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateSpans(docs, "doc_id", "text",
      shingleN = 5, minDocs = 2)
      .select("doc_id", "n_distinct", "n_boiler")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 2L, 1L), (1L, 2L, 1L), (2L, 2L, 0L)))
    // both orders of the shared span's neighbors stay distinct spans; the
    // ratio column mirrors n_boiler / n_distinct
    val ratios = Dedup.boilerplateSpans(docs, "doc_id", "text", 5, 2)
      .select("doc_id", "boiler_ratio").as[(Long, Double)].collect().toMap
    assert(ratios(0L) == 0.5 && ratios(2L) == 0.0)
  }

  test("meanPool computes exact per-position means, any partitioning") {
    import spark.implicits._
    val vs = Seq((0, Seq(1.0f, -2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(0.5f, 0.25f)))
      .toDF("label", "embedding").repartition(5)
    val got = Similarity.meanPool(vs, "label", "embedding")
      .select("grp", "pos", "n", "sum_u", "mean_v")
      .as[(Int, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (0, 0L, 2L, 4000000L, 2.0), (0, 1L, 2L, 2000000L, 1.0),
      (1, 0L, 1L, 500000L, 0.5), (1, 1L, 1L, 250000L, 0.25)))
  }

  test("prefixJaccardPairs equals the unfiltered shingle join") {
    import spark.implicits._
    val d = (0L until 40L).map { i =>
      val body = (1 to 25).map(j => s"tk${(i * 31 + j * 7) % 211}").mkString(" ")
      // make docs 2k/2k+1 near-identical, others unrelated
      (i, if (i % 2 == 1) {
        val prev = (1 to 25).map(j => s"tk${((i - 1) * 31 + j * 7) % 211}").mkString(" ")
        prev + " tail"
      } else body)
    }.toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(d, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force: all-pairs distinct-shingle jaccard at the same threshold
    val toks = d.select(col("doc_id"),
        explode(graft.functions.TextFunctions.charShingles(
          graft.functions.TextFunctions.normalize(col("text")), 8)).as("s"))
      .distinct()
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val expected = toks.as("x").join(toks.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("ni"))
      .join(sizes.as("sx"), col("a") === col("sx.doc_id"))
      .join(sizes.as("sy"), col("b") === col("sy.doc_id"))
      .filter(col("ni") * 5 >= (col("sx.n") + col("sy.n") - col("ni")) * 3)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
    assert(got.forall { case (a, b) => b == a + 1 && a % 2 == 0 })
  }

  test("prefix cap recall bound: clusters larger than the cap are missed, raising the cap recovers them") {
    import spark.implicits._
    // a 27-member exact-dup cluster: every shingle of every member is in
    // all 27 documents' prefixes, i.e. prefix-hot beyond the default cap
    // of 20 — the documented recall bound, not a bug. Unrelated docs with
    // their own vocabulary are unaffected either way.
    val template = (1 to 40).map(j => s"base${j * 13 % 101}").mkString(" ")
    val cluster = (0L until 27L).map(i => (i, template))
    val others = (100L until 110L).map(i =>
      (i, (1 to 40).map(j => s"solo${i}w$j").mkString(" ")))
    val d = (cluster ++ others).toDF("doc_id", "text")
    val capped = Dedup.prefixJaccardPairs(d, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.isEmpty) // all 351 qualifying pairs lost to the cap
    // cap above the cluster size -> exact recall (27 choose 2 pairs)
    val raised = Dedup.prefixJaccardPairs(d, "doc_id", "text",
      maxDocsPerTok = 30)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(raised.size == 351 &&
      raised == (for (a <- 0L until 27L; b <- a + 1 until 27L)
        yield (a, b)).toSet)
  }

  test("skew injection: 200-member near-dup mega-cluster + corpus-hot " +
      "boilerplate — recall at cap {5,20,diagnostic}, chain recovery") {
    import spark.implicits._
    // the r12 judge's rehearsal shape in unit form: one near-dup cluster
    // LARGER than any cap a sane default would pick (200 members, each
    // one word off the template), a boilerplate phrase in EVERY document
    // (corpus-hot shingles), 60 unrelated docs, and a 12-member
    // pure-boilerplate exact-dup cluster (the docs that are ONLY the
    // boilerplate — the realistic cookie-banner page)
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 3000).map(i => f"w$i%04dx${(i * 11) % 89}")
    val boiler = "accept all cookies terms of service privacy policy"
    val template = Vector.tabulate(24)(_ => vocab(rnd.nextInt(vocab.length)))
    val mega = (0L until 200L).map { m =>
      val words =
        if (m == 0) template
        else template.updated((m % 24).toInt, s"uniq${m}z${m * 3}")
      (m, words.mkString(" ") + " " + boiler)
    }
    val unrelated = (1000L until 1060L).map(i =>
      (i, (0 until 24).map(j => s"solo${i}q$j").mkString(" ") + " " + boiler))
    val pureBoiler = (2000L until 2012L).map(i => (i, boiler))
    val all = mega ++ unrelated ++ pureBoiler
    val d = all.toDF("doc_id", "text")

    // ground truth by brute force over the SAME normalize+shingle
    // semantics (lower/trim/ws-collapse; distinct char 8-grams; the
    // integer 5·I >= 3·U threshold)
    def sh(s: String): Set[String] =
      s.trim.toLowerCase.replaceAll("\\s+", " ").sliding(8).toSet
    val sets = all.map { case (id, t) => id -> sh(t) }.toMap
    val ids = all.map(_._1).toVector
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      inter = (sets(ids(i)) & sets(ids(j))).size
      union = sets(ids(i)).size + sets(ids(j)).size - inter
      if 5 * inter >= 3 * union
    } yield (ids(i), ids(j))).toSet
    val megaTruth = truth.filter { case (a, b) => a < 1000L && b < 1000L }
    val boilerTruth = truth.filter { case (a, b) => a >= 2000L && b >= 2000L }
    assert(megaTruth.size == 199 * 100) // C(200,2): all members mutual dups
    assert(boilerTruth.size == 66) // C(12,2) exact dups
    assert(truth == megaTruth ++ boilerTruth) // unrelated docs pair nothing

    def found(cap: Int): Set[(Long, Long)] =
      Dedup.prefixJaccardPairs(d, "doc_id", "text", maxDocsPerTok = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // cap 5 / default 20: the mega cluster exceeds both — recall
    // COLLAPSES but is not exactly zero (tokens at each member's prefix
    // CUT boundary land in only a few members' prefixes, so their
    // prefix-nd is small even though their corpus dfreq is ~200; pairs
    // found through them are verified-true — the cap costs recall, never
    // precision). The 12-way boilerplate cluster fits under 20 only.
    val at5 = found(5)
    assert(at5.subsetOf(truth)) // exact verification: no false positives
    val recall5 = at5.intersect(megaTruth).size.toDouble / megaTruth.size
    assert(recall5 < 0.10, s"cap5 mega recall $recall5")
    assert(at5.intersect(boilerTruth).isEmpty) // boiler prefix-nd = 12 > 5
    val at20 = found(20)
    assert(at20.subsetOf(truth))
    assert(at20.intersect(boilerTruth) == boilerTruth)
    val recall20 = at20.intersect(megaTruth).size.toDouble / megaTruth.size
    assert(recall20 < 0.10, s"cap20 mega recall $recall20")

    // recovery arm 1 — chain union at LOW cap: the exact-dup chain
    // (hash-groupBy, no cap anywhere) returns every EXACT-dup cluster's
    // pairs, so union(exact, capped-prefix) recovers the boilerplate
    // cluster without touching the cap; it cannot recover the near-dup
    // mega pairs (members differ), which need arm 2
    val fp = d.select(col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("h"))
    val exactPairs = fp.as("a")
      .join(fp.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    assert((at5 ++ exactPairs).intersect(boilerTruth) == boilerTruth)
    assert(exactPairs.intersect(megaTruth).isEmpty) // near-dups: arm 2's job

    // recovery arm 2 — cluster-size-aware cap raise, with the cap read
    // off the prefixHotness diagnostic instead of guessed: the hottest
    // prefix-nd is the mega cluster (~200), NOT the corpus-hot
    // boilerplate (272 docs) — prefixes exclude boilerplate shingles in
    // every doc that has any content of its own, so the diagnostic is
    // not inflated by template noise
    val hot = Dedup.prefixHotness(d, "doc_id", "text")
      .as[(Long, Long)].collect()
    val maxNd = hot.map(_._1).max
    // the hottest prefix token sits in MOST of the mega cluster's 200
    // prefixes (not all — the per-member prefix cut shifts slightly with
    // each member's unique word), and far below the 272-doc corpus: the
    // diagnostic reads the cluster, not the boilerplate
    assert(maxNd >= 150L && maxNd <= 200L, s"maxNd=$maxNd")
    // cap = maxNd drops NOTHING (every prefix token has nd <= maxNd by
    // definition), and the prefix filter alone is lossless — full
    // recall, exact verification untouched
    val raised = found(maxNd.toInt)
    assert(raised == truth)
  }

  test("autoCap (maxDocsPerTok = 0): skewed corpus reaches full recall " +
      "with no hand-chosen cap, plan stays window-free") {
    import spark.implicits._
    // r13 judge item 5: the manual recovery loop (run prefixHotness,
    // read maxNd, re-call with a bigger cap) wired into the operator. A
    // 30-member near-dup cluster sits ABOVE the default cap of 20 but
    // far BELOW templateShare x corpus (ceil(0.5 x 130) = 65), so the
    // derived cap admits the whole cluster and caps nothing it needs.
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 2000).map(i => f"v$i%04dk${(i * 7) % 83}")
    val template = Vector.tabulate(24)(_ => vocab(rnd.nextInt(vocab.length)))
    val cluster = (0L until 30L).map { m =>
      val words =
        if (m == 0) template
        else template.updated((m % 24).toInt, s"uq${m}y${m * 5}")
      (m, words.mkString(" "))
    }
    val solo = (500L until 600L).map(i =>
      (i, (0 until 24).map(j => s"lone${i}p$j").mkString(" ")))
    val all = cluster ++ solo
    val d = all.toDF("doc_id", "text")
    // brute-force truth over the operator's own normalize+shingle space
    def sh(s: String): Set[String] =
      s.trim.toLowerCase.replaceAll("\\s+", " ").sliding(8).toSet
    val sets = all.map { case (id, t) => id -> sh(t) }.toMap
    val ids = all.map(_._1).toVector
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      inter = (sets(ids(i)) & sets(ids(j))).size
      union = sets(ids(i)).size + sets(ids(j)).size - inter
      if 5 * inter >= 3 * union
    } yield (ids(i), ids(j))).toSet
    assert(truth.size >= 300 && // near-complete C(30,2) = 435 clique
      truth.forall { case (a, b) => a < 30L && b < 30L })
    // the default hand cap (20) collapses recall on this cluster
    val capped = Dedup.prefixJaccardPairs(d, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(truth) && capped.size < truth.size / 2)
    // autoCap: full recall, zero hand tuning, still no Window operator
    val auto = Dedup.prefixJaccardPairs(d, "doc_id", "text",
      maxDocsPerTok = 0)
    val got = auto.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == truth)
    assert(!auto.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("containmentPairs: quote-in-article found directed, Jaccard misses it, cap binds") {
    import spark.implicits._
    val quote = "the quick brown fox jumps over the lazy dog again and again"
    val tail = (1 to 60).map(j => s"unique${j}filler").mkString(" ")
    val d = Seq(
      (1L, quote),              // sub: every shingle appears in doc 2
      (2L, quote + " " + tail), // sup: long article embedding the quote
      (3L, (1 to 40).map(j => s"other${j}stuff").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text")
      .select(col("id_sub").as[Long], col("id_sup").as[Long],
        col("cont_r").as[Double]).collect()
    // directed: 1 ⊂ 2 at containment 1.0; the reverse direction fails
    // (2's shingles are mostly outside 1) and doc 3 pairs with nobody
    assert(got.toSeq == Seq((1L, 2L, 1.0)), got.toSeq)
    // Jaccard at the same 3/4 threshold can't see the pair — the union is
    // dominated by the long doc
    val jacc = Dedup.prefixJaccardPairs(d, "doc_id", "text",
      numT = 3, denT = 4).select("id_a", "id_b").as[(Long, Long)]
      .collect()
    assert(jacc.isEmpty, jacc.toSeq)
    // cap 1: the sub-sup witness shingles have dfreq 2 > 1 — documented
    // recall bound, same contract as the Jaccard prefix cap
    val capped = Dedup.containmentPairs(d, "doc_id", "text",
      maxDocsPerTok = 1)
      .select("id_sub", "id_sup").as[(Long, Long)].collect()
    assert(capped.isEmpty, capped.toSeq)
  }

  test("containmentPairs autoCap: syndicated quote above the default cap " +
      "recovered with no hand-chosen cap") {
    import spark.implicits._
    // one quote syndicated into 29 articles: every quote shingle has
    // dfreq 30 > the default cap of 20, so the default loses ALL 29
    // directed pairs; autoCap reads the dfreq tail (30 ≪ 0.5 × 100
    // docs) and recovers them — the directed-join form of the r14
    // auto-cap contract
    val quote = (1 to 12).map(j => s"qq${j}zz${j * 5 % 41}").mkString(" ")
    val articles = (10L until 39L).map(i =>
      (i, quote + " " + (1 to 60).map(j => s"art${i}w$j").mkString(" ")))
    val solo = (100L until 170L).map(i =>
      (i, (1 to 40).map(j => s"solo${i}v$j").mkString(" ")))
    val d = ((1L, quote) +: articles) ++ solo
    val df = d.toDF("doc_id", "text")
    val expected = articles.map(a => (1L, a._1)).toSet
    val byDefault = Dedup.containmentPairs(df, "doc_id", "text")
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    assert(byDefault.intersect(expected).isEmpty, byDefault)
    val auto = Dedup.containmentPairs(df, "doc_id", "text",
      maxDocsPerTok = 0)
    val got = auto.select("id_sub", "id_sup").as[(Long, Long)]
      .collect().toSet
    assert(expected.subsetOf(got), (expected -- got).toSeq.sorted.take(5))
    // exactness untouched: every emitted pair is a true containment
    val rs = auto.select(col("cont_r").as[Double]).collect()
    assert(rs.forall(r => r >= 0.75 && r <= 1.0))
    assert(!auto.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("containmentPairsOneSided: quote-in-doc pairs via the rarest-k " +
      "probe, exact verify, both cap modes (r20)") {
    import spark.implicits._
    // the casym shape in miniature: 30 tiny quotes (subs), each embedded
    // verbatim in one long article (sups) whose filler dominates the
    // union — word-shingle Jaccard ≈ 0.04, containment 1.0. The quote
    // shingles sit at dfreq 2 (quote + its article), so the one-sided
    // probe finds every pair from the SUB side's own rarest shingles.
    val plants = (0 until 30).map { i =>
      val quote = (1 to 12).map(j => s"qt${i}w${j}x${(i * j) % 37}")
        .mkString(" ")
      val filler = (1 to 280).map(j => s"fl${i}v$j").mkString(" ")
      (100L + i, quote, 1000L + i, quote + " " + filler)
    }
    val lone = (5000L until 5040L).map(i =>
      (i, (1 to 50).map(j => s"ln${i}u$j").mkString(" ")))
    val d = (plants.map(p => (p._1, p._2)) ++
      plants.map(p => (p._3, p._4)) ++ lone).toDF("doc_id", "text")
    val want = plants.map(p => (p._1, p._3)).toSet

    val auto = Dedup.containmentPairsOneSided(d, "doc_id", "text")
    // volume mode checkpoints the probe (the cap rollup IS an action, so
    // the candidate join reuses its pass) — the aggregate is hidden
    // behind the LogicalRDD there; the marker is asserted on the
    // explicit-cap plan below, which keeps full lineage
    assert(!auto.queryExecution.optimizedPlan.toString
      .contains("prefix_min_k"))
    val got = auto.select("id_sub", "id_sup").as[(Long, Long)]
      .collect().toSet
    assert(want.subsetOf(got), s"missing=${(want -- got).toSeq.sorted}")
    // precision is the shared exact verify's: every emitted pair is a
    // true ≥3/4 containment — here only the planted pairs exist
    assert(got == want, s"extra=${(got -- want).toSeq.sorted}")
    // explicit-cap mode (the oracle-mirrorable shape) agrees
    val cappedDf = Dedup.containmentPairsOneSided(d, "doc_id", "text",
      maxDocsPerTok = 20)
    val cappedPlan = cappedDf.queryExecution.optimizedPlan.toString
    assert(cappedPlan.contains("rarest_min_k") &&
      !cappedPlan.contains("prefix_min_k"),
      s"one-sided probe marker missing:\n$cappedPlan")
    val capped = cappedDf
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    assert(capped == want, s"explicit-cap drift: $capped")
    // cap 1 starves the dfreq-2 witnesses — the documented capped-recall
    // contract, same as the exact join's
    val starved = Dedup.containmentPairsOneSided(d, "doc_id", "text",
      maxDocsPerTok = 1)
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    assert(starved.isEmpty, starved)
  }

  test("route complementarity: rarest-k is adversarially blind to " +
      "near-identical families, bands to asymmetric quotes — the union " +
      "route covers both (r20)") {
    import spark.implicits._
    // ONE corpus carrying both failure shapes. Family: 40 docs sharing
    // a 120-word core, each with a TEN-word unique tail — the tail
    // spans ≥ 60 unique char-8 shingles (dfreq 1), so every member's
    // rarest-8 probe is entirely its own tail, which is exactly the
    // shingle set MISSING from every other member: the one-sided probe
    // generates no within-family candidates at all. (A one-WORD tail is
    // NOT adversarial — it spans < 8 unique shingles and the probe
    // spills into dfreq-40 core shingles, which is also worth knowing:
    // blindness needs the unique region to outspan the probe.) The
    // tails stay ≤ 8% of the doc so containment holds at 3/4. Quote: a
    // 12-word sub inside a 288-word sup — word-3-shingle J ≈ 0.034,
    // below the banded chain's resolution (per-band collision ≈ J²;
    // this fixed corpus measurably misses all 8 bands — the minhash
    // lanes are deterministic xxhash64, so the outcome is pinned by the
    // fixture, matching the 0.2% recall measured at 300k).
    val core = (0 until 120).map(i => f"fam$i%03d").mkString(" ")
    val family = (0L until 40L).map(i =>
      (i, core + " " + (0 until 10).map(k => s"tl${i}q$k").mkString(" ")))
    val quote = (1 to 12).map(j => s"aq${j}z${j * 11 % 29}").mkString(" ")
    val filler = (1 to 288).map(j => s"af${j}k").mkString(" ")
    val d = (family ++ Seq((900L, quote), (901L, quote + " " + filler)))
      .toDF("doc_id", "text")

    def sh(s: String): Set[String] =
      s.trim.toLowerCase.replaceAll("\\s+", " ").sliding(8).toSet
    val sets = (family ++ Seq((900L, quote), (901L, quote + " " + filler)))
      .map { case (id, t) => id -> sh(t) }.toMap
    val famTruth = (for {
      a <- family.map(_._1).iterator
      b <- family.map(_._1)
      if a != b
      if 4 * (sets(a) & sets(b)).size >= 3 * sets(a).size
    } yield (a, b)).toSet
    assert(famTruth.size == 40 * 39, s"fixture drift: ${famTruth.size}")
    val truth = famTruth + ((900L, 901L))

    val oneSided = Dedup.containmentPairsOneSided(d, "doc_id", "text")
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    assert(oneSided.contains((900L, 901L)),
      "one-sided route lost its own headline class (the quote)")
    assert(oneSided.intersect(famTruth).isEmpty,
      s"fixture no longer adversarial for rarest-k: " +
        s"${oneSided.intersect(famTruth).take(5)}")

    val banded = Dedup.containmentRouted(d, "doc_id", "text", shingleK = 8,
      numT = 3, denT = 4, maxBucket = 1000, inputSmall = true)
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    assert(famTruth.subsetOf(banded),
      s"banded route lost family pairs: ${(famTruth -- banded).take(5)}")
    assert(!banded.contains((900L, 901L)),
      "fixture no longer adversarial for the bands (quote collided); " +
        "change the filler vocabulary to restore the pinned miss")

    val union = Dedup.containmentRoutedUnionStandalone(d, "doc_id",
      "text", shingleK = 8, numT = 3, denT = 4, maxBucket = 1000)
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(union),
      s"union route lost pairs: ${(truth -- union).take(5)}")
    // exactness: the union verifies once against the same threshold —
    // nothing beyond the truth set can survive
    assert(union == truth, s"extra=${(union -- truth).take(5)}")

    // the oracle-portable twin (q261: md5 lanes + explicit one-sided
    // cap) carries the same dual-shape truth — the union ASSEMBLY is
    // family-independent
    val portable = Dedup.containmentUnionPortable(d, "doc_id", "text")
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    assert(portable == truth,
      s"portable union drift: extra=${(portable -- truth).take(5)} " +
        s"missing=${(truth -- portable).take(5)}")
  }

  test("oneSidedProbeCap: cumulative exact-count budget binds, floor " +
      "overrides loudly (r20)") {
    // rollup rows are (dfreq, n_probe_rows); admitted volume is EXACTLY
    // Σ n_rows·dfreq ascending. Budget 10_000: dfreq 1 (3000 rows =
    // 3000) + dfreq 2 (2000 rows = 4000, cum 7000) + dfreq 30 (50 rows
    // = 1500, cum 8500) fit; dfreq 400 (10 rows = 4000) would cross —
    // stop-at-first-over, so the cap is 30 even though dfreq 500 would
    // also "fit" whatever headroom remained.
    val rollup = Array[(Long, Long)]((1L, 3000L), (2L, 2000L),
      (30L, 50L), (400L, 10L), (500L, 1L))
    assert(graft.operators.Dedup.oneSidedProbeCap(rollup, 10000.0,
      "spec") == 30)
    // floor: a budget too tight even for dfreq-1 probes is overridden
    // at the dfreq-2 unique-quote floor (loud warn) — VOLUME-SAFE by
    // construction (≤ 2 candidates/probe row), unlike the dfreq-20
    // posture floor this replaced after the 500k rehearsal blew a
    // 40 GB budget riding it (BASELINE r20)
    assert(graft.operators.Dedup.OneSidedCapFloor == 2)
    assert(graft.operators.Dedup.oneSidedProbeCap(rollup, 100.0,
      "spec") == graft.operators.Dedup.OneSidedCapFloor)
    // everything fits -> the largest class wins
    assert(graft.operators.Dedup.oneSidedProbeCap(rollup, 1e9,
      "spec") == 500)
    // posture stretch (r20, the 500k lesson's COUNTED replacement for
    // the uncounted dfreq-20 floor): classes at dfreq ≤ 20 admit while
    // cumulative ≤ 2× budget — recall-parity with the default exact
    // join — but classes ABOVE the posture stay strictly within 1×.
    // Budget 8000: d2 (cum 8000) and d10 (cum 13000) ride the ≤16000
    // stretch; d25 (cum would be 15500 ≤ 16000, but it is past the
    // posture where the bound is 8000) is refused.
    val stretch = Array[(Long, Long)]((2L, 4000L), (10L, 500L),
      (25L, 100L))
    assert(graft.operators.Dedup.oneSidedProbeCap(stretch, 8000.0,
      "spec") == 10)
    assert(graft.operators.Dedup.OneSidedDefaultPosture == 20)
  }

  test("routeCandidateBudget: conf-overridable, scratch-derived, floored " +
      "(r20 portability)") {
    val s = spark
    def cleanup(): Unit = {
      s.conf.unset("spark.graft.route.candidatesPerDoc")
      s.conf.unset("spark.graft.route.scratchBytes")
    }
    cleanup()
    try {
      // default: 20/doc, floored at MinRouteCandidates = 5e6
      assert(graft.operators.Dedup.routeCandidateBudget(s, 1000000L)
        == 2e7)
      assert(graft.operators.Dedup.routeCandidateBudget(s, 1000L) == 5e6)
      // scratchBytes ALONE is the budget outright — including RAISING it
      // past the calibration default (r20 ADVICE: the portability knob
      // must work in both directions; min() only when both are stated)
      s.conf.set("spark.graft.route.scratchBytes",
        (90L << 30).toString) // 90 GiB -> ~1.07e8 > the 2e7 default
      val scratchOnly = graft.operators.Dedup.routeCandidateBudget(s, 1000000L)
      assert(math.abs(scratchOnly - (90L << 30) / 900.0) < 1.0,
        scratchOnly.toString)
      s.conf.unset("spark.graft.route.scratchBytes")
      // per-doc override moves the budget as stated
      s.conf.set("spark.graft.route.candidatesPerDoc", "60")
      assert(graft.operators.Dedup.routeCandidateBudget(s, 1000000L)
        == 6e7)
      // scratch capacity derives a budget through the calibrated
      // 900 B/candidate verify cost; the TIGHTER of the two binds
      s.conf.set("spark.graft.route.scratchBytes",
        (9L << 30).toString) // 9 GiB -> ~1.07e7 candidates
      val both = graft.operators.Dedup.routeCandidateBudget(s, 1000000L)
      assert(math.abs(both - (9L << 30) / 900.0) < 1.0, both.toString)
      // a huge disk does not override the per-doc bound
      s.conf.set("spark.graft.route.scratchBytes",
        (900L << 30).toString)
      assert(graft.operators.Dedup.routeCandidateBudget(s, 1000000L)
        == 6e7)
      // and the floor survives any override
      s.conf.set("spark.graft.route.candidatesPerDoc", "1")
      s.conf.set("spark.graft.route.scratchBytes", "900")
      assert(graft.operators.Dedup.routeCandidateBudget(s, 1000L) == 5e6)
      // invalid values fail loudly, never a silent default
      s.conf.set("spark.graft.route.candidatesPerDoc", "0")
      intercept[IllegalArgumentException] {
        graft.operators.Dedup.routeCandidateBudget(s, 1000L)
      }
    } finally cleanup()
  }

  test("capBelowTemplateFloor: a derived cap beyond Int.MaxValue saturates " +
      "instead of wrapping negative") {
    import spark.implicits._
    // r14 review: at billions of docs a genuine family can have nd above
    // 2^31; .toInt would wrap negative and filter(nd <= cap) would then
    // silently keep NOTHING. The clamp must saturate at Int.MaxValue.
    val counts = Seq(2200000000L, 5L, 3L).toDF("nd")
    val cap = Dedup.capBelowTemplateFloor(counts, "nd",
      nDocs = 5000000000L, templateShare = 0.5, label = "test")
    assert(cap == Int.MaxValue)
    // and the ordinary path is untouched: max nd below the floor wins
    val small = Seq(30L, 20L, 9000L).toDF("nd")
    assert(Dedup.capBelowTemplateFloor(small, "nd",
      nDocs = 130L, templateShare = 0.5, label = "test") == 30)
  }

  test("sharedPassagePairs finds the copied span, not unrelated docs") {
    import spark.implicits._
    // a ~250-char distinctive passage shared by docs 1 and 2 with
    // different surroundings; docs 3 and 4 share nothing
    val passage = (1 to 30).map(i => s"wq${i}xv${i * 7 % 97}").mkString(" ")
    val d = Seq(
      (1L, s"$passage unique closing words for the first document here"),
      (2L, s"a completely different opening sentence then $passage"),
      (3L, "standalone text about nothing shared with anything else at all"),
      (4L, "another independent document with its own private vocabulary")
    ).toDF("doc_id", "text")
    val got = Dedup.sharedPassagePairs(d, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("lineDedup: corpus-hot lines dropped, order kept, within-doc repeats survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared header\nbody one\nbody one\ntail one"),
      (2L, "shared header\nbody two"),
      (3L, "shared header")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", minDocs = 2)
      .select(col("doc_id").as[Long], col("text_clean").as[String],
        col("n_lines").as[Long], col("n_dropped").as[Long])
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a line repeated WITHIN one doc is not corpus-hot (distinct-doc count
    // 1) and survives with its multiplicity and order intact
    assert(got(1L) == (("body one\nbody one\ntail one", 4L, 1L)))
    assert(got(2L) == (("body two", 2L, 1L)))
    // all-boilerplate doc stays present, empty
    assert(got(3L) == (("", 1L, 1L)))
  }

  test("duplicatedSpanRemoval: shared passage excised, overlap merged, unique text kept in order") {
    import spark.implicits._
    // Docs 1 and 2 share the 7-word passage "the quick brown fox jumps over
    // fences" (three overlapping hot 5-grams merge into ONE covered span);
    // their unique prefix/suffix tokens survive in order. Doc 3 is unique
    // and untouched; doc 4 is entirely the shared passage → fully dropped;
    // doc 5 is shorter than one gram → no grams, untouched.
    val p = "The quick brown fox jumps over fences"
    val docs = Seq(
      (1L, s"alpha beta $p gamma"),
      (2L, s"$p delta epsilon zeta"),
      (3L, "a wholly unique document with original words"),
      (4L, p),
      (5L, "tiny doc")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanRemoval(docs, "doc_id", "text",
        gramN = 5, minDocs = 2)
      .select(col("doc_id").as[Long], col("n_tokens").as[Long],
        col("n_dropped").as[Long], col("text_clean").as[String])
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((10L, 7L, "alpha beta gamma")))
    assert(got(2L) == ((10L, 7L, "delta epsilon zeta")))
    assert(got(3L) == ((7L, 0L, "a wholly unique document with original words")))
    assert(got(4L) == ((7L, 7L, "")))
    assert(got(5L) == ((2L, 0L, "tiny doc")))
  }

  test("editDistanceJoin equals brute-force levenshtein<=1 on random-ish strings") {
    import spark.implicits._
    val strs = Seq("alpha", "alphb", "alpha1", "lpha", "beta", "betas",
      "gamma", "gamm", "gamme", "delta", "dleta", "x", "", "xy")
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val got = Dedup.editDistanceJoin(df, "id", "s")
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Long)]
      .collect().toSet
    val brute = (for {
      (a, i) <- strs.zipWithIndex; (b, j) <- strs.zipWithIndex
      if i < j
      d = {
        // classic DP levenshtein
        val m = Array.tabulate(a.length + 1, b.length + 1) { (x, y) =>
          if (x == 0) y else if (y == 0) x else 0 }
        for (x <- 1 to a.length; y <- 1 to b.length)
          m(x)(y) = math.min(math.min(m(x - 1)(y) + 1, m(x)(y - 1) + 1),
            m(x - 1)(y - 1) + (if (a(x - 1) == b(y - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      if d <= 1
    } yield (i.toLong, j.toLong, d.toLong)).toSet
    assert(got == brute)
  }

  test("lineDedup treats the delimiter literally, not as a regex") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared|unique one"),
      (2L, "shared|unique two")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", minDocs = 2, delim = "|")
      .select(col("doc_id").as[Long], col("text_clean").as[String],
        col("n_dropped").as[Long]).collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // '|' as a regex would split every character; literally it yields two
    // segments, of which 'shared' is corpus-hot
    assert(got(1L) == (("unique one", 1L)))
    assert(got(2L) == (("unique two", 1L)))
  }

  test("hardNegatives: similar-but-not-duplicate wins; near-dup and self excluded") {
    import spark.implicits._
    // anchor 0; vec 1 is a near-identical copy (near-dup → excluded);
    // vec 2 points the same general direction (the hard negative);
    // vec 3 is orthogonal (easy negative); vec 4 is opposite.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f, 0.0f)),
      (2L, Array(0.8f, 0.6f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(vecs, "vec_id", "embedding",
        anchorIds = Seq(0L), k = 3, bits = 2, minSim = 0.9,
        signature = Similarity.hyperplaneSignatureLattice)
      .select(col("negative").as[Long], col("rnk").as[Long]).collect()
      .map(r => r._2 -> r._1).toMap
    // rank 1 = the hard negative (sim 0.8), never the near-dup or self
    assert(got(1L) == 2L)
    assert(!got.values.toSet.contains(0L) && !got.values.toSet.contains(1L))
    // remaining ranks follow cosine order: orthogonal, then opposite
    assert(got(2L) == 3L && got(3L) == 4L)
  }

  test("leakageSafeSplit: cluster members share a split; buckets ~uniform") {
    import spark.implicits._
    // 3000 nodes, every pair (2k, 2k+1) a near-dup edge → 1500 clusters
    val nodes = (0L until 3000L).toDF("doc_id")
    val pairs = (0L until 3000L by 2).map(a => (a, a + 1)).toDF("id_a", "id_b")
    val clusters = Dedup.connectedComponents(nodes, "doc_id", pairs)
    val split = Dedup.leakageSafeSplit(clusters)
    // leakage-safety: both members of every pair landed in the same split
    val byDoc = split.select(col("doc_id").as[Long], col("split").as[String])
      .collect().toMap
    (0L until 3000L by 2).foreach(a => assert(byDoc(a) == byDoc(a + 1)))
    // determinism: a re-run assigns identical splits
    val again = Dedup.leakageSafeSplit(clusters)
      .select(col("doc_id").as[Long], col("split").as[String]).collect().toMap
    assert(again == byDoc)
    // ~uniform at the CLUSTER level: 1500 clusters at 204/26/26 in 256ths
    val perSplit = split.groupBy("split").agg(
      countDistinct(col("cluster")).as[Long]).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSplit("train") > 1000 && perSplit("val") > 50 && perSplit("test") > 50)
    assert(perSplit.values.sum == 1500)
  }

  test("randomProjection: exact integer reference, determinism, no shuffle") {
    import graft.operators.Similarity
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(-1.5f, 2.0f, 0.125f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(vecs, "vec_id", "embedding",
        outDim = 4)
      .orderBy("vec_id").collect()
    // driver-side reference: same quantization, same coefficient lattice
    def ref(v: Array[Float], i: Int): Long =
      v.zipWithIndex.map { case (x, j) =>
        math.floor(x.toDouble * 1e6 + 0.5).toLong *
          ((31L * i + 17L * j + 13L * i * j) % 67 % 7 - 3)
      }.sum
    Seq((1L, Array(0.5f, -0.25f, 1.0f)), (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(-1.5f, 2.0f, 0.125f))).zip(out).foreach {
      case ((id, v), row) =>
        assert(row.getLong(0) == id)
        (0 until 4).foreach { i =>
          assert(row.getLong(1 + i) == ref(v, i), s"vec $id dim $i")
        }
    }
    // zero vector projects to exactly zero in every dim
    assert((1 to 4).forall(i => out(1).getLong(i) == 0L))
    // non-degeneracy: a purely additive lattice ((31i+17j) mod 7) is a
    // function of (i+j) mod 7 — unit vectors 7 apart collide and row p7
    // repeats p0; the bilinear term must prevent both
    val units = Seq(
      (0L, Array.tabulate(16)(j => if (j == 0) 1.0f else 0.0f)),
      (7L, Array.tabulate(16)(j => if (j == 7) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val us = Similarity.randomProjection(units, "vec_id", "embedding",
        outDim = 8)
      .orderBy("vec_id").collect()
    assert((1 to 8).exists(i => us(0).getLong(i) != us(1).getLong(i)),
      "e0 and e7 must project differently")
    val ramp = Seq((0L, Array.tabulate(16)(j => (j + 1) * 0.1f)))
      .toDF("vec_id", "embedding")
    val rp = Similarity.randomProjection(ramp, "vec_id", "embedding",
      outDim = 8).collect()(0)
    assert(rp.getLong(8) != rp.getLong(1), "p7 must not repeat p0")
    // map-only: no Exchange at any corpus size
    val plan = Similarity.randomProjection(vecs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("crossGroupPairMatrix: unordered labels, shares, is_cross flag") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
      .toDF("id_a", "id_b")
    val docs = Seq((1L, "web"), (2L, "web"), (3L, "books"), (4L, "news"),
      (5L, "books")).toDF("doc_id", "source")
    val got = Dedup.crossGroupPairMatrix(pairs, docs, "doc_id", "source")
      .collect().map(r => (r.getAs[String]("src_a"),
        r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("share_r"),
          r.getAs[Boolean]("is_cross"))).toMap
    // (1,3) and (2,3) normalize to books-web via least/greatest,
    // (4,5) is books-news, (1,2) stays within-web
    assert(got == Map(
      ("books", "web") -> ((2L, 0.5, true)),
      ("books", "news") -> ((1L, 0.25, true)),
      ("web", "web") -> ((1L, 0.25, false))))
  }

  test("LSH candidate size dispatch: recompute path (huge stats) == checkpoint path") {
    // A DataFrame rebuilt from a raw RDD gets the planner's default size
    // estimate (Long.MaxValue-ish), which flips candidatesFromBanded's
    // 512 MB input bound to the recompute branch — the 100 TB shape. The
    // candidate set must be identical to the checkpointing branch the
    // small LocalRelation input takes.
    val hugeStats = spark.createDataFrame(docs.rdd, docs.schema)
    assert(hugeStats.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(512L << 20), "RDD-backed input must exceed the dispatch bound")
    assert(docs.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(512L << 20), "LocalRelation input must stay under the bound")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashCandidatesPortable(d, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8)
        .as[(Long, Long)].collect().toSet
    assert(run(hugeStats) == run(docs))
  }
}
