package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY north star). The reference's only "similarity" logic is the
  * generated top-3-nearest-POS SQL (`HTIPNEXSITE/__init__.py:106-122`); this
  * generalizes it to dense vectors.
  *
  * Scale design:
  *  - brute-force top-k against ONE query vector is a map-side scan +
  *    a single top-k reduction — O(n·d) work, no shuffle of vectors;
  *  - all-pairs near-dup at 100 TB must never cross-join: random-hyperplane
  *    LSH buckets vectors by a 16-bit sign signature map-side, then only
  *    within-bucket pairs are scored. Hyperplane components are derived
  *    deterministically from (lane, dimension) hashes, so no model state and
  *    every executor computes identical planes.
  */
object Similarity {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Checkpoint a bucket-size table when the caller is in autocap mode
    * (r19, overturning the r18 same-JVM A/B): autocap collects a driver
    * rollup from this table — a SEPARATE action — and exchange reuse
    * never spans query executions, so without the pin the keep join
    * recomputes the full corpus signature pass a second time. The
    * fresh-JVM-per-arm A/B (LshPinAB, 400k vectors, 3 samples/arm)
    * reads pin 15.4/16.8/18.4 s vs no-pin 76.8/31.2/33.2 s on the
    * single-table chain; the pinned table is at most 2^bits (per-table)
    * rows, so the materialization itself is free. Explicit-cap mode has
    * no rollup action — sizes has ONE consumer inside the main job —
    * so pinning there would only add a pass.
    * `-Dgraft.lsh.pinSizes=true/false` forces either shape (the A/B
    * harness's knob). */
  private def maybePinSizes(sizes: DataFrame, autoCap: Boolean): DataFrame =
    if (sys.props.get("graft.lsh.pinSizes").map(_.toBoolean)
      .getOrElse(autoCap)) sizes.localCheckpoint()
    else sizes

  /** Element-wise dot product — native compiled loop
    * ([[graft.functions.VectorOps]]), sequential left fold so results are
    * bit-identical to the HOF spelling and the oracle's ordered sum. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dotCol(a, b)

  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))

  /** Cosine similarity between two float/double array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Element-wise mean pooling per group — label prototypes / cluster
    * centroids. Elements are quantized to exact integer micro-units
    * (`floor(v·1e6 + 0.5)`, identical IEEE ops in any engine) BEFORE
    * summing, so the aggregation is associative-exact under Spark's
    * arbitrary partial-sum order — no float-order drift, hash-stable vs
    * any oracle. One shuffle of groups×dims rows (posexplode is map-side);
    * the output mean is the bit-deterministic quotient of two exact
    * integers. Returns (grp, pos, n, sum_u, mean_v). */
  def meanPool(vectors: DataFrame, groupCol: String, vecCol: String): DataFrame =
    vectors
      .select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("grp"), col("pos").cast("long").as("pos"),
        floor(col("v").cast("double") * lit(1000000d) + lit(0.5d))
          .cast("long").as("u"))
      .groupBy(col("grp"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("u")).as("sum_u"))
      .select(col("grp"), col("pos"), col("n").cast("long").as("n"),
        col("sum_u").cast("long").as("sum_u"),
        (col("sum_u").cast("double") /
          (col("n") * lit(1000000L)).cast("double")).as("mean_v"))

  /** Deterministic integer random projection — the cheap dimensionality
    * reduction in front of ANN indexing, in the spirit of sparse integer
    * JL projections (small bounded ± coefficients, zero-ish mean).
    * Coefficient c(i,j) = (((31·i + 17·j + 13·i·j) mod 67) mod 7) − 3 ∈
    * {−3..3} is derived from the output/input index pair alone —
    * stateless, reproducible on any engine, no stored matrix. The
    * bilinear i·j term is what makes the lattice non-degenerate: a purely
    * additive form like (31i + 17j) mod 7 collapses to a function of
    * (i+j) mod 7 (31 ≡ 17 ≡ 3), i.e. rank ≤ 7 with repeating rows AND
    * columns; with the mixing term, two coefficient columns can only
    * coincide when j ≡ j' (mod 67) — distinct for any input dim ≤ 67 —
    * and rows likewise for outDim ≤ 67. Inputs are quantized to exact
    * integer micro-units first (`floor(v·1e6 + 0.5)`, the [[meanPool]]
    * contract), so every projected coordinate is an exact integer sum —
    * no float associativity anywhere. Map-only, zero shuffle; one fused
    * pass per row inside codegen. Output columns `p0..p{outDim-1}` are
    * micro-units (divide by 1e6 for the real-valued projection). */
  def randomProjection(vectors: DataFrame, idCol: String, vecCol: String,
      outDim: Int = 8): DataFrame = {
    require(outDim <= 67, "coefficient rows repeat past outDim 67")
    val proj = (0 until outDim).map(i => intProjection(col(vecCol), i).as(s"p$i"))
    vectors.select((col(idCol) +: proj): _*)
  }

  /** The i-th coordinate of [[randomProjection]] as a standalone column —
    * the same micro-unit quantization and ±3 coefficient stream, exposed
    * for consumers that need ONE deterministic integer score per vector
    * (e.g. the AUC evaluation's ranking score). */
  def intProjection(vec: Column, i: Int): Column = {
    val q = transform(vec,
      x => floor(x.cast("double") * lit(1000000d) + lit(0.5d)).cast("long"))
    aggregate(
      zip_with(q, sequence(lit(0L), size(vec).cast("long") - 1L),
        (x, j) => x * (pmod(pmod(lit(31L * i) + j * 17L + j * lit(13L * i),
          lit(67L)), lit(7L)) - lit(3L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Brute-force cosine top-k of `vectors` against the single row of
    * `queryVec` (a 1-row DataFrame with column `qe`). The query side is
    * broadcast; ranking uses a unique tiebreak on id. */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queryVec: DataFrame, k: Int): DataFrame = {
    val scored = vectors.crossJoin(broadcast(queryVec))
      .select(col(idCol), cosine(col(vecCol), col("qe")).as("sim"))
    // orderBy+limit → TakeOrderedAndProject (distributed per-partition
    // heaps), never a single-partition window.
    scored.orderBy(col("sim").desc, col(idCol)).limit(k)
  }

  /** 16-bit random-hyperplane signature: bit i = sign(v · h_i) where
    * h_i[j] is a pseudo-random coefficient in [-1, 1] derived from
    * xxhash64(i, j). Deterministic, stateless, computed entirely
    * map-side. */
  def hyperplaneSignature(vec: Column, bits: Int): Column = {
    val vd = toDoubleArray(vec)
    val sigBits = (0 until bits).map { i =>
      // h_ij in [-1, 1]: two-sided hash-derived coefficient (2000001
      // residues, so +1.0 is attainable; harmless for sign bucketing)
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1),
          (x, j) => x * (pmod(xxhash64(lit(i), j), lit(2000001L)).cast("double") / lit(1000000.0) - lit(1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _)
  }

  /** The hyperplane stream for OR-table `table`: plane index
    * `table·bits + i` into the same xxhash64-derived coefficient family,
    * so table 0 IS [[hyperplaneSignature]] bit-for-bit and every further
    * table draws fresh independent planes. Used by [[lshNearPairsTables]];
    * exposed so callers can bucket one table at a time. */
  def hyperplaneSignatureAt(vec: Column, bits: Int, table: Int): Column = {
    val vd = toDoubleArray(vec)
    val sigBits = (0 until bits).map { i =>
      val plane = table * bits + i
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1),
          (x, j) => x * (pmod(xxhash64(lit(plane), j), lit(2000001L))
            .cast("double") / lit(1000000.0) - lit(1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _)
  }

  /** [[hyperplaneSignatureLattice]]'s OR-table sibling: plane index
    * `table·bits + i` into the same integer lattice, table 0 identical to
    * the single-table lattice signature — portable SQL, so the multi-table
    * candidate chain is oracle-checkable end-to-end (q254). */
  def hyperplaneSignatureLatticeAt(vec: Column, bits: Int, table: Int): Column = {
    val vd = toDoubleArray(vec)
    val sigBits = (0 until bits).map { i =>
      val plane = table * bits + i
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1),
          (x, j) => x * (pmod(lit(plane) * 31 + j * 17, lit(7)) - lit(3))
            .cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN index: partition vectors into `nLists` KMeans
    * cells; a query probes only the `nProbe` nearest cells. The 100 TB
    * shape: the corpus is clustered ONCE (sampled fit, map-side assignment),
    * stored partitioned by cell id — a probe then touches nProbe/nLists of
    * the data (partition pruning on the cell column), with recall tunable
    * via nProbe. Approximate by construction; pair with
    * [[bruteForceTopK]] when exactness is required. */
  def ivfIndex(vectors: DataFrame, idCol: String, vecCol: String,
      nLists: Int, seed: Long = 42L, maxIter: Int = 20,
      fitSample: Double = 1.0): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    val withFeat = vectors.withColumn("_feat",
      array_to_vector(toDoubleArray(col(vecCol))))
    // the 100 TB shape: centers come from a SAMPLE (clustering quality
    // needs only a sketch of the distribution); the full corpus is then
    // assigned map-side by model.transform. Probe results stay exact for
    // nProbe = nLists no matter what the sample produced.
    val fitOn = {
      if (fitSample >= 1.0) withFeat
      else {
        val s = withFeat.sample(withReplacement = false, fitSample, seed)
        // a Bernoulli sample of a small corpus can come back with fewer
        // rows than centers (or none) — fall back to the full set; the
        // probe (bounded limit+count) costs one tiny job at index build
        if (s.limit(nLists).count() < nLists) withFeat else s
      }
    }
    // random seeded init, not kmeans||: the parallel init runs several
    // extra distributed passes for center quality IVF cells don't need —
    // probe exactness never depends on where the centers landed
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
      .setFeaturesCol("_feat").setPredictionCol("_cell").fit(fitOn)
    val indexed = model.transform(withFeat)
      .select(col(idCol), col(vecCol), col("_cell").as("cell"))
    (model, indexed)
  }

  /** Top-k cosine against `queryVec` probing only the nProbe nearest IVF
    * cells of `indexed` (output of [[ivfIndex]]). */
  def ivfTopK(model: org.apache.spark.ml.clustering.KMeansModel,
      indexed: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val centers = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val dot = c.toArray.zip(queryVec).map { case (a, b) => a * b }.sum
        val sim = dot / (math.sqrt(c.toArray.map(x => x * x).sum) *
          math.sqrt(queryVec.map(x => x * x).sum))
        (i, sim)
      }
    val probed = centers.sortBy(-_._2).take(nProbe).map(_._1).toSeq
    val q = Seq(Tuple1(queryVec)).toDF("qe")
    val scored = indexed
      .filter(col("cell").isin(probed: _*)) // partition pruning at scale
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("qe")).as("sim"))
    scored.orderBy(col("sim").desc, col(idCol)).limit(k)
  }

  /** Hyperplane signature over a small integer lattice: bit i =
    * sign(v · h_i) with h_i[j] = ((i·31 + j·17) mod 7) − 3 ∈ [−3, 3].
    * Same bucketing quality as the hash-derived planes for low bit counts,
    * but expressible in portable SQL — the DuckDB oracle reproduces it
    * exactly, making the LSH path correctness-checkable end-to-end. */
  def hyperplaneSignatureLattice(vec: Column, bits: Int): Column = {
    val vd = toDoubleArray(vec)
    val sigBits = (0 until bits).map { i =>
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1),
          (x, j) => x * (pmod(lit(i) * 31 + j * 17, lit(7)) - lit(3)).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _)
  }

  /** Bucket-size hotness diagnostic for [[lshNearPairs]]'s `maxBucket`
    * cap — the embedding-side mirror of [[Dedup.prefixHotness]]: the
    * distribution of m = how many vectors share each signature bucket, as
    * (m, n_buckets) rows sorted hot-first. The within-bucket self-join is
    * quadratic in m, so the tail of this distribution IS the join's cost
    * model: the largest m well below the corpus size is the biggest
    * genuine semantic cluster — cap above it; an m approaching the corpus
    * size means the signature has collapsed (near-constant embeddings, a
    * dominant direction, or bits too few) and enumerating that bucket's
    * pairs is a cross join in disguise. Aggregates only (shuffle by
    * bucket then by m, both with map-side partial aggregation) — linear
    * in the corpus, safe to run, or to run on a sample, before committing
    * to the candidate join. */
  def bucketHotness(vectors: DataFrame, idCol: String, vecCol: String,
      bits: Int = 16,
      signature: (Column, Int) => Column = hyperplaneSignature): DataFrame =
    vectors
      .select(signature(col(vecCol), bits).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("n_buckets"))
      .orderBy(col("m").desc)

  /** LSH-bucketed near-neighbor pairs: bucket by hyperplane signature,
    * score cosine only within buckets, keep pairs ≥ minSim.
    *
    * `maxBucket` is the hot-bucket guard every text-side candidate
    * generator already carries: buckets holding more than `maxBucket`
    * vectors are excluded from pair generation (aggregate + semi-join —
    * splittable, never a count window). Unlike [[Dedup.prefixJaccardPairs]]'s
    * per-token cap, a vector lives in exactly ONE bucket, so an excluded
    * bucket's members produce no pairs at all — the cap is for signature
    * COLLAPSE (an m ≈ corpus bucket whose pair set is a disguised cross
    * join), not for shaving genuine clusters; read [[bucketHotness]] first.
    * Defaults to `Int.MaxValue` (off — every bucket scored, the exact
    * within-bucket semantics the oracle checks); `0` derives the cap from
    * the bucket-size distribution itself: the largest m strictly below
    * `templateShare` × the vector count, so genuine clusters (m ≪ corpus)
    * survive whole and only collapse-scale buckets are refused. */
  def lshNearPairs(vectors: DataFrame, idCol: String, vecCol: String,
      bits: Int = 16, minSim: Double = 0.9,
      signature: (Column, Int) => Column = hyperplaneSignature,
      maxBucket: Int = Int.MaxValue, templateShare: Double = 0.5): DataFrame = {
    // Only the documented 0 sentinel selects autoCap — a negative cap is a
    // caller arithmetic bug (e.g. an Int-wrapped value) and must fail loudly
    // rather than silently derive a cap from the data (r14 ADVICE).
    require(maxBucket >= 0,
      s"maxBucket must be >= 0 (0 = derive from the bucket-size " +
        s"distribution): $maxBucket")
    require(maxBucket > 0 || (templateShare > 0 && templateShare <= 1),
      s"autoCap mode needs templateShare in (0,1]: $templateShare")
    // Carry a per-row norm column through the join (computed once per
    // vector; the join shuffle materializes it) so each candidate pair
    // costs one native dot product + a multiply. Normalizing the array
    // itself in a lambda re-evaluates the norm per element — higher-order
    // lambdas don't hoist loop-invariant subexpressions.
    val sig0 = vectors.select(col(idCol).as("vid"), col(vecCol).as("v"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nrm"),
      signature(col(vecCol), bits).as("bucket"))
    val sig =
      if (maxBucket == Int.MaxValue) sig0
      else {
        // The bucket-size table IS checkpointed in autocap mode (r19,
        // overturning the r18 same-JVM reading): the autocap rollup
        // collect is a SEPARATE ACTION, and exchange reuse never spans
        // query executions — so the no-pin shape pays one full
        // signature pass for the rollup and ANOTHER for the keep
        // semi-join's sizes recompute inside the main job. The
        // fresh-JVM-per-arm A/B (LshPinAB, 400k vectors, 3 samples per
        // arm) reads pin 15.4/16.8/18.4 s vs no-pin 76.8/31.2/33.2 s —
        // ~2× at the no-pin arm's BEST, with the checkpointed table at
        // most 2^bits rows (65k at 16 bits: pinning it is free). The
        // r18 1M same-JVM A/B that rejected the pin was confounded by a
        // preceding 45 GB spill arm + ContextCleaner lag (BASELINE r18);
        // the clean number wins. Explicit-cap mode keeps the no-pin
        // shape: no rollup action exists there, sizes has exactly one
        // consumer inside the main job, and an eager checkpoint would
        // only ADD a pass. -Dgraft.lsh.pinSizes=true/false overrides
        // either way (the A/B harness's knob).
        val sizes = maybePinSizes(
          sig0.groupBy(col("bucket")).agg(count(lit(1)).as("m")),
          autoCap = maxBucket == 0)
        val effCap =
          if (maxBucket > 0) maxBucket.toLong
          else {
            val nVecs = vectors.count()
            // ONE driver-side rollup serves the template-floor cap AND
            // the forecast — at most one row per distinct bucket size
            val rollup = Dedup.countRollup(sizes, "m")
            val cap = Dedup.capBelowTemplateFloorLocal(rollup, nVecs,
              templateShare, "lshNearPairs").toLong
            // candidate forecast (r17, the embedding mirror of the text
            // side's): the within-bucket self-join emits C(m, 2) pairs
            // per kept bucket — the rollup prices the join before it
            // runs. Same warn routing as prefixJaccardPairs: a forecast
            // that dwarfs the corpus says the signature has collapsed or
            // the corpus needs more bits / an absolute cap.
            val pred = rollup.iterator.takeWhile(_._1 <= cap)
              .map { case (m, nb) => nb.toDouble * m.toDouble * (m - 1).toDouble / 2.0 }
              .sum
            if (pred > Dedup.WarnCandidatesPerDoc * nVecs)
              log.warn(f"lshNearPairs autoCap=$cap admits $pred%.3e " +
                f"candidate pairs (${pred / math.max(nVecs, 1)}%.0f per " +
                "vector) — raise bits or set an absolute maxBucket at the " +
                "largest genuine cluster size")
            else
              log.info(f"lshNearPairs autoCap=$cap predicted candidate " +
                f"pairs = $pred%.3e")
            cap
          }
        // semi-join against the kept-bucket set: the partial aggregate
        // collapses a collapsed-signature bucket map-side and AQE
        // broadcasts the (≤ 2^bits row) bucket list
        sig0.join(sizes.filter(col("m") <= effCap).select(col("bucket")),
          "bucket")
      }
    val a = sig.as("a"); val b = sig.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Multi-table (OR-construction) LSH near pairs — the recall knob
    * [[lshNearPairs]] does not have (r16 VERDICT item 2): `tables`
    * independent hyperplane families bucket the corpus `tables` times,
    * and a pair is a candidate when it collides in ANY table. Per-pair
    * candidate recall lifts from r = (1−θ/π)^bits to 1 − (1−r)^L at ~L×
    * bucketing + candidate-join cost; precision is untouched because the
    * verify filter is still the exact cosine. At 16 bits / θ ≈ 0.04 rad
    * that is 0.80 → 0.96 (L=2) → 0.9985 (L=4) — the measured VECREHEARSAL
    * curve prices it.
    *
    * Scale shape: signatures are exploded MAP-SIDE into (vid, tbl,
    * bucket) rows — the bucket shuffle carries ids and two longs, never
    * vectors. Candidate pairs are DEDUPED ACROSS TABLES (one hash
    * aggregate on the id pair) BEFORE the exact verify, so a pair
    * colliding in all L tables is scored once; the verify then joins the
    * two endpoints' vectors back by id. That is one more shuffle than the
    * single-table shape (which carries vectors through its one bucket
    * join) — the right trade whenever d ≫ the id width, i.e. always at
    * embedding scale. `maxBucket`/`templateShare` cap per (table, bucket)
    * exactly as in [[lshNearPairs]] (a collapsed bucket in ONE table does
    * not poison the others). */
  def lshNearPairsTables(vectors: DataFrame, idCol: String, vecCol: String,
      bits: Int = 16, minSim: Double = 0.9, tables: Int = 2,
      signatureAt: (Column, Int, Int) => Column = hyperplaneSignatureAt,
      maxBucket: Int = Int.MaxValue, templateShare: Double = 0.5): DataFrame = {
    require(tables >= 1, s"tables must be >= 1: $tables")
    require(maxBucket >= 0,
      s"maxBucket must be >= 0 (0 = derive from the bucket-size " +
        s"distribution): $maxBucket")
    require(maxBucket > 0 || (templateShare > 0 && templateShare <= 1),
      s"autoCap mode needs templateShare in (0,1]: $templateShare")
    val base = vectors.select(col(idCol).as("vid"), col(vecCol).as("v"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nrm"))
    val sigs = vectors.select(col(idCol).as("vid"),
      explode(array((0 until tables).map(l =>
        struct(lit(l).as("tbl"),
          signatureAt(col(vecCol), bits, l).as("bucket"))): _*)).as("s"))
      .select(col("vid"), col("s.tbl").as("tbl"), col("s.bucket").as("bucket"))
    val kept =
      if (maxBucket == Int.MaxValue) sigs
      else {
        // pinned in autocap mode — same two-action mechanism as
        // [[lshNearPairs]] (r19): the rollup collect below is a separate
        // action, so the keep join otherwise recomputes every table's
        // signature explode
        val sizes = maybePinSizes(sigs.groupBy(col("tbl"), col("bucket"))
          .agg(count(lit(1)).as("m")), autoCap = maxBucket == 0)
        val effCap =
          if (maxBucket > 0) maxBucket.toLong
          else {
            val nVecs = vectors.count()
            Dedup.capBelowTemplateFloorLocal(Dedup.countRollup(sizes, "m"),
              nVecs, templateShare, "lshNearPairsTables").toLong
          }
        sigs.join(sizes.filter(col("m") <= effCap)
          .select(col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      }
    val a = kept.as("a"); val b = kept.as("b")
    val cand = a.join(b, col("a.tbl") === col("b.tbl") &&
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"))
      .distinct() // OR-construction dedup BEFORE the exact verify
    cand
      .join(base.select(col("vid").as("id_a"), col("v").as("_va"),
        col("nrm").as("_na")), Seq("id_a"))
      .join(base.select(col("vid").as("id_b"), col("v").as("_vb"),
        col("nrm").as("_nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("_va"), col("_vb")) / (col("_na") * col("_nb"))).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Multi-probe LSH near pairs — the MEMORY-CHEAP recall knob, the
    * complement of [[lshNearPairsTables]]: instead of building L
    * independent tables (L× bucketing shuffle, L× signature state), ONE
    * table is probed at the home bucket plus its `probes` Hamming-1
    * neighbors (flip bit i of the signature, i < probes). A pair is a
    * candidate when its signatures differ in at most one probed bit, so
    * per-pair candidate recall lifts from r = p^bits to
    * p^bits + probes · p^(bits−1) · (1−p), where p = 1 − θ/π — at 16
    * bits / θ ≈ 0.045 rad that is 0.80 → ~0.98 with probes = 16, between
    * L = 2 (0.96) and L = 4 (0.998) from a SINGLE table build (the
    * VECREHEARSAL curve prices all three side by side).
    *
    * Scale shape: the home side carries (vid, vector, norm, bucket) once
    * — the only side that ships payload. The probe side is (probes + 1)
    * narrow (vid, bucket) rows per vector, exploded map-side from an
    * inline-expression array (no attribute generator input — the r16
    * InferFiltersFromGenerate lesson). Each qualifying pair is emitted
    * EXACTLY ONCE by construction, no dedup aggregate needed: for a pair
    * x < y, the home×probe join on (home.bucket = probe.bucket,
    * home.vid < probe.vid) matches only x's home row against the single
    * y-probe entry at XOR(sig_x, sig_y) — probe entries of one vector are
    * pairwise-distinct buckets, and the vid order kills the mirrored
    * match. The probe-side vector is joined back by id after candidate
    * generation, exactly like the multi-table chain.
    *
    * `maxBucket`/`templateShare` keep [[lshNearPairs]]'s contract:
    * members of a refused (collapsed) HOME bucket produce no pairs at all
    * — they are dropped from both the home side and the probe side, so a
    * collapse-scale bucket cannot leak its quadratic pair set through a
    * neighboring bucket's join. `probes` defaults to `bits` (all
    * signature bits probed); `probes = 0` degenerates to exactly
    * [[lshNearPairs]]'s pair set. */
  def lshNearPairsMultiProbe(vectors: DataFrame, idCol: String,
      vecCol: String, bits: Int = 16, minSim: Double = 0.9,
      probes: Int = -1,
      signature: (Column, Int) => Column = hyperplaneSignature,
      maxBucket: Int = Int.MaxValue, templateShare: Double = 0.5)
      : DataFrame = {
    val nProbes = if (probes < 0) bits else probes
    require(nProbes <= bits,
      s"probes must be <= bits (one flip per signature bit): $probes")
    require(maxBucket >= 0,
      s"maxBucket must be >= 0 (0 = derive from the bucket-size " +
        s"distribution): $maxBucket")
    require(maxBucket > 0 || (templateShare > 0 && templateShare <= 1),
      s"autoCap mode needs templateShare in (0,1]: $templateShare")
    val home0 = vectors.select(col(idCol).as("vid"), col(vecCol).as("v"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nrm"),
      signature(col(vecCol), bits).as("bucket"))
    val home =
      if (maxBucket == Int.MaxValue) home0
      else {
        // pinned in autocap mode — same two-action mechanism as
        // [[lshNearPairs]] (r19; the multiprobe A/B numbers are in
        // BASELINE r19 alongside the single-table ones)
        val sizes = maybePinSizes(
          home0.groupBy(col("bucket")).agg(count(lit(1)).as("m")),
          autoCap = maxBucket == 0)
        val effCap =
          if (maxBucket > 0) maxBucket.toLong
          else {
            val nVecs = vectors.count()
            Dedup.capBelowTemplateFloorLocal(Dedup.countRollup(sizes, "m"),
              nVecs, templateShare, "lshNearPairsMultiProbe").toLong
          }
        home0.join(sizes.filter(col("m") <= effCap).select(col("bucket")),
          "bucket")
      }
    // probe side: home bucket + one flip per probed bit. The signature is
    // projected ONCE as an attribute below the explode and the probe
    // array is (probes + 1) one-instruction xor flips of that attribute
    // (r17 VERDICT item 5 — the previous inline-expression array repeated
    // the full signature expression nProbes+1 times and leaned on
    // whole-stage codegen's subexpression elimination; an interpreted
    // fallback would have evaluated 17 16-plane projections per row).
    // InferFiltersFromGenerate stays inert: the generator input is the
    // `array(...)` expression, not a bare attribute, and any filter it
    // COULD infer would reference the already-projected `sig` attribute,
    // never re-derive the signature (ScaleSpec-locked).
    val sigExpr = signature(col(vecCol), bits)
    val probe0 = vectors
      .select(col(idCol).as("pvid"), sigExpr.as("sig"))
      .select(col("pvid"),
        explode(array(col("sig") +: (0 until nProbes).map(i =>
          col("sig").bitwiseXOR(lit(1L << i))): _*)).as("pbucket"))
    val probe =
      if (maxBucket == Int.MaxValue) probe0
      else probe0.join(home.select(col("vid").as("pvid")), Seq("pvid"))
    val base = home.select(col("vid").as("id_b"), col("v").as("_vb"),
      col("nrm").as("_nb"))
    home.as("a")
      .join(probe.as("b"), col("a.bucket") === col("b.pbucket") &&
        col("a.vid") < col("b.pvid"))
      .select(col("a.vid").as("id_a"), col("b.pvid").as("id_b"),
        col("a.v").as("_va"), col("a.nrm").as("_na"))
      .join(base, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("_va"), col("_vb")) / (col("_na") * col("_nb"))).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Embedding-cosine near-duplicate verdicts — the semantic-dedup step of
    * a training-data pipeline: a document is a duplicate when some EARLIER
    * document's embedding sits within `minSim` cosine of its own, and the
    * earliest such neighbor is recorded as its `dup_of`. Candidates come
    * from [[lshNearPairs]] (within-bucket scoring only — never all-pairs),
    * so at 100 TB the shuffles carry (id, signature) and candidate id
    * pairs, not the vectors of non-candidates. Keepers (including docs in
    * singleton buckets) report is_dup = false, dup_of = -1. */
  def embeddingNearDup(vectors: DataFrame, idCol: String, vecCol: String,
      bits: Int = 16, minSim: Double = 0.9,
      signature: (Column, Int) => Column = hyperplaneSignature,
      maxBucket: Int = Int.MaxValue, templateShare: Double = 0.5,
      tables: Int = 1,
      signatureAt: (Column, Int, Int) => Column = hyperplaneSignatureAt,
      probes: Int = 0)
      : DataFrame = {
    // tables = 1, probes = 0 keeps the measured single-table plan
    // (signature applies); tables > 1 routes through the OR-construction
    // chain, whose plane families come from signatureAt (the single-table
    // `signature` lambda cannot say what its table-2 planes would be);
    // probes > 0 routes through the Hamming-probe chain on the ONE
    // `signature` table — the two recall knobs are alternatives, not
    // composable (pick bucketing-cost OR probe-fanout)
    require(tables <= 1 || probes <= 0,
      s"tables and probes are alternative recall knobs — set one: " +
        s"tables=$tables probes=$probes")
    val pairs =
      if (probes > 0)
        lshNearPairsMultiProbe(vectors, idCol, vecCol, bits, minSim,
          probes, signature, maxBucket, templateShare)
      else if (tables <= 1)
        lshNearPairs(vectors, idCol, vecCol, bits, minSim, signature,
          maxBucket, templateShare)
      else
        lshNearPairsTables(vectors, idCol, vecCol, bits, minSim, tables,
          signatureAt, maxBucket, templateShare)
    // earliest-wins: min over the (already sparse) near-pair edges keyed
    // by the later endpoint — one hash aggregate over candidate ids
    val dupOf = pairs.groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("_dup_of"))
    vectors.select(col(idCol))
      .join(dupOf, Seq(idCol), "left")
      .select(col(idCol), col("_dup_of").isNotNull.as("is_dup"),
        coalesce(col("_dup_of"), lit(-1L)).as("dup_of"))
  }

  /** Contrastive hard-negative mining: for each anchor, the k candidates
    * MOST similar to it that are NOT its near-duplicates — exactly the
    * negatives that teach an embedding model the most (easy negatives are
    * already far; near-dups would be false negatives). Positives to
    * exclude come from [[lshNearPairs]] at `minSim`, applied
    * symmetrically; the anchor itself is excluded too.
    *
    * Scale shape: anchors are a query workload (small by contract) and
    * broadcast; scoring is map-side over the candidate corpus. The
    * per-anchor top-k is TWO-PHASE — a first window over (anchor, salt)
    * keeps k per salt group, the second ranks the s·k survivors per
    * anchor — because a single window partitioned by anchor would drag
    * the WHOLE corpus × anchors into #anchors tasks. The salt is a hash
    * of the candidate id: deterministic, and salt-invariant in the
    * result (every global top-k row survives its salt group's local
    * top-k). Returns (anchor, negative, sim_r, rnk).
    *
    * Deliberately NO `maxBucket` knob here: the [[lshNearPairs]] call
    * computes EXCLUSIONS, and capping it would silently drop an
    * anchor's near-duplicates from the exclusion set — returning them
    * as "hard negatives", the exact false-negative poisoning the
    * operator exists to prevent. On a collapse-prone corpus run
    * [[bucketHotness]] first and dedup before mining. */
  def hardNegatives(vectors: DataFrame, idCol: String, vecCol: String,
      anchorIds: Seq[Long], k: Int,
      bits: Int = 16, minSim: Double = 0.9,
      signature: (Column, Int) => Column = hyperplaneSignature): DataFrame = {
    val pairs = lshNearPairs(vectors, idCol, vecCol, bits, minSim, signature)
      .select(col("id_a"), col("id_b"))
    // only exclusions INVOLVING an anchor matter — filter the symmetric
    // edge list down to the anchor set before the anti-join, so the
    // corpus-sized scored table anti-joins against a broadcastable side
    // (anchors × their near-dups) instead of shuffling by pair key
    val sym = pairs.unionByName(
        pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .filter(col("id_a").isin(anchorIds: _*))
    val anchors = vectors
      .filter(col(idCol).isin(anchorIds: _*))
      .select(col(idCol).as("anchor"), col(vecCol).as("_avec"))
    val scored = vectors.crossJoin(broadcast(anchors))
      .filter(col(idCol) =!= col("anchor"))
      .join(broadcast(sym),
        col("anchor") === col("id_a") && col(idCol) === col("id_b"),
        "left_anti")
      .select(col("anchor"), col(idCol).as("negative"),
        cosine(col(vecCol), col("_avec")).as("sim"))
    val nSalt = vectors.sparkSession.sparkContext.defaultParallelism
    val local = Transforms.topKPerGroup(
        scored.withColumn("_salt", pmod(xxhash64(col("negative")), lit(nSalt))),
        Seq(col("anchor"), col("_salt")),
        Seq(col("sim").desc, col("negative")), k)
      .drop("rnk", "_salt")
    Transforms.topKPerGroup(local, Seq(col("anchor")),
        Seq(col("sim").desc, col("negative")), k)
      .select(col("anchor"), col("negative"),
        round(col("sim"), 6).as("sim_r"), col("rnk"))
  }
}
