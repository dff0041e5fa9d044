package graft

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew validation at a scale where skew actually BITES — the data
  * point the per-round sf0.1 corpus can't provide (its hot key is big
  * relatively but every partition still fits in one fast task; the
  * round-9 verdict re-raised this every round since 2).
  *
  * Generates a deterministic documents-shaped corpus in /tmp with a
  * BRUTAL key distribution — `en` holds ~60% of all rows, and text
  * bytes skew WITH rows — then measures each mechanism against its
  * naive twin ON THE SAME DATA, same JVM, interleaved. Correctness
  * first: each route pair must return IDENTICAL rows before its
  * timing is reported (a fast wrong answer is not a result).
  * Generation is fully deterministic (hash-of-id mixing, no RNG).
  *
  * Three measurements, one control:
  *  - CONTROL `skew_agg_algebraic`: op01's salted two-phase
  *    aggregation vs a plain GROUP BY with algebraic (sum/count)
  *    aggregates. EXPECTED ~1x or a salted LOSS: map-side partial
  *    aggregation already collapses the hot key to one row per
  *    partition before the shuffle — algebraic aggs are structurally
  *    skew-immune, and the salted route pays an extra shuffle. This
  *    is the honest boundary of op01's mechanism: salting earns its
  *    keep on NON-collapsible aggregation state and on joins, not on
  *    sums.
  *  - `skew_join`: op02's salted fact⋈dim join vs the plain shuffled
  *    join, with the text payload riding the fact side — the hot
  *    reducer must sort+stream ~60% of corpus BYTES in one task while
  *    the salted twin spreads it over 32.
  *  - `skew_aqe`: AQE `OptimizeSkewedJoin` (op05's automation) ON vs
  *    OFF on a lang-keyed fact⋈fact pair workload (both sides raw
  *    scans, ×8 pair fan-out) — the hot partition is hundreds of MB
  *    against an 8 MB advisory, so the rule must split it into ~dozens
  *    of parallel reads.
  *
  * `sbt "runMain graft.SkewBench [nRows]"` → JSON lines, recorded in
  * BASELINE.md round-10 notes.
  */
object SkewBench {

  /** Deterministic skewed corpus: ~60% `en`, the rest spread over 40
    * uniform tails; ~40-80 words of text per row so bytes skew with
    * rows (hot sources are also wordy — the realistic shape). */
  def generate(s: SparkSession, dir: String, n: Long): Unit = {
    val out = new File(dir)
    if (new File(out, "_SUCCESS").isFile) return
    s.range(n).select(
        col("id").as("doc_id"),
        when(pmod(hash(col("id")), lit(100)) < 60, lit("en"))
          .otherwise(concat(lit("l"),
            pmod(hash(col("id"), lit(7)), lit(40)))).as("lang"),
        concat(lit("src"), pmod(hash(col("id"), lit(13)), lit(8)))
          .as("source"))
      .withColumn("text",
        concat_ws(" ", transform(
          sequence(lit(1), lit(40) + pmod(hash(col("doc_id")), lit(40))),
          i => concat(lit("w"), pmod(hash(col("doc_id"), i), lit(5000))))))
      // cast: the real documents table carries n_chars as int64
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(dir)
  }

  /** Documents-shaped corpus with a genuine BOILERPLATE mega-cluster:
    * 1% of docs share ONE identical template text (the replicated-
    * content shape — cookie banners, legal footers, scraped mirrors —
    * that produces banded-LSH mega-buckets in production), the rest
    * unique word salad. Deterministic, no RNG. */
  def generateLsh(s: SparkSession, dir: String, n: Long): Unit = {
    val out = new File(s"$dir/documents.parquet")
    if (new File(out, "_SUCCESS").isFile) return
    val boiler = "template " +
      (1 to 50).map(i => s"tok$i").mkString(" ")
    s.range(n).select(
        col("id").as("doc_id"),
        when(col("id") % 100 === 0, lit(boiler))
          .otherwise(concat_ws(" ", transform(
            sequence(lit(1), lit(30) + pmod(hash(col("id")), lit(20))),
            i => concat(lit("w"), pmod(hash(col("id"), i), lit(500000))))))
          .as("text"),
        lit("en").as("lang"))
      .write.mode("overwrite").parquet(out.toString)
  }

  /** Deterministic CLUSTERED dense-vector corpus (embeddings shape,
    * 64 dims): each vector = its cluster centroid (~n/10 clusters,
    * components uniform-ish in [-1, 1] from hash mixing) + 0.3-scale
    * per-vector noise — the anisotropic, locally-dense shape real
    * embedding corpora have (uniform random vectors concentrate all
    * pairwise angles near 90° and are the degenerate worst case for
    * ANY angular sketch). No RNG anywhere. */
  def generateVecs(s: SparkSession, dir: String, n: Long): Unit = {
    val out = new File(dir)
    if (new File(out, "_SUCCESS").isFile) return
    s.range(n)
      .select(col("id").as("vec_id"), (col("id") % (n / 10)).as("cid"))
      .select(
        col("vec_id"),
        expr("""transform(sequence(0, 63), i -> cast(
            (pmod(hash(cid, i), 2001) - 1000) / 1000.0
            + 0.3 * (pmod(hash(vec_id, i, 77), 2001) - 1000) / 1000.0
          as float))""").as("embedding"))
      .write.mode("overwrite").parquet(dir)
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** min-of-2 wall seconds, result rows returned for the equality
    * assertion (result sets here are ≤ #langs rows). */
  private def run(df: => DataFrame): (Seq[String], Double) = {
    val secs = (1 to 2).map { _ =>
      timed(df.collect().map(_.toString).sorted.toSeq)
    }
    (secs.head._1, secs.map(_._2).min)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    // optional family filter after n:
    // agg / join / aqe / lsh / binq / knn / knn20 / asof / select / pqgeom / curate / drift
    val fams = args.drop(1).toSet
    def want(f: String): Boolean = fams.isEmpty || fams.contains(f)
    val dir = s"/tmp/graft-skew-$n"
    val spark = GraftSession.local()
    if (want("agg") || want("join") || want("aqe"))
      generate(spark, dir, n)
    if (want("agg") || want("join") || want("aqe")) {
    val docs = spark.read.parquet(dir)
    val total = docs.count()
    val hot = docs.where(col("lang") === "en").count()
    System.err.println(s"[skew] corpus $total rows, hot key $hot " +
      f"(${hot * 100.0 / total}%.1f%%)")

    // --- CONTROL: algebraic aggs are skew-immune via map-side partials
    if (want("agg")) {
    val tokens = docs.select(col("lang"), col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    val (saltedRows, saltedSec) = run(
      operators.Salting.saltedAgg(tokens, col("lang"), col("doc_id"), 32,
        Seq(count(lit(1)).as("pn"), sum(col("n_tok")).as("pt")),
        Seq(sum(col("pn")).cast("long").as("n_docs"),
          sum(col("pt")).cast("long").as("n_tokens"))))
    val (plainRows, plainSec) = run(
      tokens.groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens")))
    require(saltedRows == plainRows,
      "salted aggregation diverged from the plain GROUP BY")
    println(f"""{"metric":"skew_agg_algebraic","rows":$total,"hot_frac":${hot.toDouble / total}%.2f,"salted_sec":$saltedSec%.2f,"plain_sec":$plainSec%.2f,"note":"control: partials make algebraic aggs skew-immune"}""")
    }

    // --- op02 mechanism: salted fact⋈dim join, PAYLOAD-BEARING fact
    // side (the hot reducer must sort+stream ~60% of corpus bytes) ---
    if (want("join")) {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact = s2.read.parquet(dir)
      .select(col("lang"), col("doc_id"), col("text"))
    val dim2 = s2.read.parquet(dir)
      .groupBy(col("lang")).agg(min(col("doc_id")).as("lang_min_id"))
    def post(j: DataFrame) = j.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("text"))).cast("long").as("bytes"),
        max(col("lang_min_id")).as("min_id"))
    val (sjRows, sjSec) = run(post(
      operators.Salting.saltedJoin(fact, dim2, "lang", col("doc_id"), 32)))
    val (pjRows, pjSec) = run(post(fact.join(dim2, Seq("lang"))))
    require(sjRows == pjRows, "salted join diverged from the plain join")
    println(f"""{"metric":"skew_join","rows":$total,"salted_sec":$sjSec%.2f,"plain_sec":$pjSec%.2f,"speedup":${pjSec / sjSec}%.2f}""")
    }

    // --- op05 mechanism: AQE OptimizeSkewedJoin ON vs OFF on a
    // lang-keyed fact⋈fact pair aggregate (both sides raw scans, x8
    // fan-out; hot partition >> advisory, so the rule must split) ---
    if (want("aqe")) {
    def pairWork(sess: SparkSession): DataFrame = {
      val a = sess.read.parquet(dir)
        .select(col("lang"), col("source"), col("n_chars"))
      val b = sess.read.parquet(dir)
        .select(col("lang"), col("source").as("src_b"))
        .distinct()
      a.join(b, Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("n_chars") *
            (pmod(hash(col("src_b")), lit(7)) + lit(1)))
            .cast("long").as("weighted"))
    }
    def aqeSession(skew: Boolean): SparkSession = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ss.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
      // the post-join agg rides the join's hash distribution; splitting
      // the hot partition breaks that guarantee, so by default the rule
      // REFUSES rather than add the (cheap, lang-keyed, pre-aggregated)
      // exchange back — force it, as op05 does, and let AQE weigh the
      // split against a partial-agg-sized reshuffle
      ss.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin",
        skew.toString)
      ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      ss.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      // keep the post-join agg from hiding the split: partial agg still
      // runs per split task, which is the parallelism under test
      ss
    }
    val (onRows, onSec) = run(pairWork(aqeSession(skew = true)))
    val (offRows, offSec) = run(pairWork(aqeSession(skew = false)))
    require(onRows == offRows, "AQE skew split changed the result")
    println(f"""{"metric":"skew_aqe","rows":$total,"skew_on_sec":$onSec%.2f,"skew_off_sec":$offSec%.2f,"speedup":${offSec / onSec}%.2f}""")
    }
    }

    // --- banded-LSH mega-bucket (the one skew family the other three
    // mechanisms can't touch): a replicated-content cluster of m docs
    // makes a band bucket whose candidate-pair OUTPUT is m²/2 —
    // quadratic output from kilobytes of input, so AQE's
    // size-triggered skew split never fires and salting can't help a
    // self-join key that IS the content. (This corpus grows one
    // 1,500-doc boilerplate bucket by construction AND a ~10k-doc
    // bucket organically, from shared word-salad shingle structure —
    // the naive route owes ~60M verifications to that one bucket.)
    // The production answer is dd19's bucket-cap quarantine: pairwise
    // below the cap, O(c) sig-sorted CHAIN edges above it, identical
    // prefilter+verification either way — so capped edges ⊆ all-pairs
    // edges: capping can only SPLIT components, never merge or invent.
    // Contract asserted: the boilerplate cluster itself is IDENTICAL,
    // doc coverage is a subset, and the loss is reported exactly. ---
    // Two corpus sizes: naive cost is Σ c² over bucket populations
    // (the organic mega-bucket grows ~linearly with the corpus, so the
    // naive route grows ~QUADRATICALLY while the capped route stays
    // ~linear) — the trend, not one ratio, is the 100 TB argument.
    for (nLsh <- Seq(150000L, 400000L) if want("lsh")) {
      val lshDir = s"/tmp/graft-skew-lsh-$nLsh"
      generateLsh(spark, lshDir, nLsh)
      val sig = dedup.Dedup.minhashSig(spark, lshDir).localCheckpoint()
      val nSig = sig.count() // materialize the shared signature input
      def clustersOf(cand: DataFrame): Map[Long, (Long, Long)] =
        dedup.Dedup.connectedComponentsStar(
            dedup.Dedup.attachVerify(sig, cand)
              .select(col("id_a").as("src"), col("id_b").as("dst")))
          .groupBy(col("label").as("cluster_id"))
          .agg(count(lit(1)).as("n_docs"), max(col("id")).as("max_id"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
      // single timed pass each (the naive route's mega-bucket grind is
      // the measurement; min-of-2 would double a multi-minute run).
      // The chain-window sweep measures dd19's recall knob (two sort
      // passes since round 12): w=1 is the round-11 single-pass
      // design's window, w=3 is the production default (0 docs lost
      // at both scales), w=8 the headroom point — cost must stay
      // O(w·c) across the sweep.
      val (naive, naiveSec) = timed(
        clustersOf(dedup.Dedup.bandedCandidatesOn(sig)))
      val naiveDocs = naive.values.map(_._1).sum
      for (w <- Seq(1, 2, 3, 8)) {
        val (capped, cappedSec) = timed(
          clustersOf(dedup.Dedup.cappedCandidatesOn(sig, 64, w)))
        // doc_id 0 is boilerplate, so the template cluster's id is 0
        // in both routes; a chain over an all-identical bucket spans
        // it whole at any w
        require(capped(0L) == naive(0L),
          s"boilerplate cluster diverged at w=$w: " +
            s"capped=${capped(0L)} naive=${naive(0L)}")
        val cappedDocs = capped.values.map(_._1).sum
        require(cappedDocs <= naiveDocs,
          s"capped route (w=$w) clustered MORE docs than all-pairs — " +
            "edge subset violated")
        val lostDocs = naiveDocs - cappedDocs
        require(lostDocs.toDouble / naiveDocs <= 0.01,
          s"cap (w=$w) lost $lostDocs of $naiveDocs clustered docs (>1%)")
        println(f"""{"metric":"skew_lsh","rows":$nSig,"chain_window":$w,"capped_sec":$cappedSec%.2f,"naive_sec":$naiveSec%.2f,"speedup":${naiveSec / cappedSec}%.2f,"clusters_capped":${capped.size},"clusters_naive":${naive.size},"docs_lost":$lostDocs,"docs_clustered":$naiveDocs,"note":"dd19 bucket-cap chain vs all-pairs; boilerplate cluster identical, capped edges a strict subset"}""")
      }
    }

    // --- sim23's scale claim, measured: the binary sign-bit scan vs
    // the fp32 brute-force scan at a corpus size where the scan
    // dominates (n/8 64-dim vectors; 8 probe queries; both routes end
    // in the same bounded-heap top-k aggregate, so the delta is pure
    // per-candidate kernel + bytes-read cost — 8 B/vec vs 512 B/vec).
    // The binary route is APPROXIMATE by design, so the dd19-style
    // identical-rows contract doesn't apply; instead the final top-3
    // (after exact fp64 re-rank of the 32-candidate shortlist) is
    // compared against the exact top-3 and recall is asserted ≥ 0.5
    // and REPORTED — a fast shortlist that stops finding neighbors is
    // not a result. Sign-bit sketching preserves angles (SimHash:
    // P[bit differs] = θ/π), so random-vector recall is the floor;
    // clustered production embeddings do better. sig_build_sec is the
    // one-time index cost, amortized over every query thereafter. ---
    if (want("binq")) {
      // n/2 vectors × 32 probes: the scan term (probes × corpus ×
      // dims) must dominate the ~0.3 s/stage job overhead, or the
      // single-stage fp32 route wins on fixed costs alone (measured:
      // at 500k×8 the 3-stage binary route lost 0.66x on overhead)
      val nB = math.max(500000L, n / 2)
      val vDir = s"/tmp/graft-skew-binq-c-$nB"
      generateVecs(spark, vDir, nB)
      graft.functions.GraftFunctions.register(spark)
      val vecs = spark.read.parquet(vDir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("e"))
      val qv = vecs.where(col("vec_id") < 32)
        .select(col("vec_id").as("query_id"), col("e").as("eq"))
      def heapTop(scored: DataFrame, k: Int, score: org.apache.spark.sql.Column)
          : DataFrame =
        scored.groupBy(col("query_id"))
          .agg(call_function("graft_topk", score.cast("double"),
            col("neighbor_id"), struct(col("neighbor_id")), lit(k))
            .as("topk"))
          // (query_id, neighbor_id) only — no rank column, so the
          // recall compare can't be poisoned by rank shifts when the
          // two routes disagree on one neighbor
          .select(col("query_id"), explode(col("topk")))
          .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"))
      // exact fp32 route: full-precision dot against every candidate
      def exactTop3: DataFrame = heapTop(
        broadcast(qv).join(
          vecs.select(col("vec_id").as("neighbor_id"), col("e").as("ec")),
          col("neighbor_id") =!= col("query_id")),
        3, call_function("graft_vec_dot", col("eq"), col("ec")))
      val (exRows, exSec) = run(exactTop3)
      // binary route: one-time sign-bit index, Hamming scan, fp64
      // re-rank of the 32-candidate shortlist only
      val (sigs, sigBuildSec) = timed {
        val p = vecs.select(col("vec_id"),
          call_function("graft_sign_pack", col("e")).as("sig"))
          .localCheckpoint()
        p.count(); p
      }
      def binaryTop3: DataFrame = {
        val qs = sigs.where(col("vec_id") < 32)
          .select(col("vec_id").as("query_id"), col("sig").as("sig_q"))
        val shortlist = heapTop(
          broadcast(qs).join(
            sigs.select(col("vec_id").as("neighbor_id"), col("sig").as("sig_c")),
            col("neighbor_id") =!= col("query_id")),
          32, -expr("cast(bit_count(sig_q ^ sig_c) as int)"))
        heapTop(
          broadcast(shortlist.select(col("query_id"), col("neighbor_id")))
            .join(vecs.select(col("vec_id").as("neighbor_id"),
              col("e").as("ec")), "neighbor_id")
            .join(broadcast(qv), "query_id"),
          3, call_function("graft_vec_dot", col("eq"), col("ec")))
      }
      val (binRows, binSec) = run(binaryTop3)
      val exact = exRows.toSet
      val hits = binRows.count(exact.contains)
      val recall = hits.toDouble / exRows.size
      require(recall >= 0.5,
        f"binary route recall $recall%.2f < 0.5 — shortlist too narrow")
      println(f"""{"metric":"binq_scan","vectors":$nB,"fp32_sec":$exSec%.2f,"binary_sec":$binSec%.2f,"speedup":${exSec / binSec}%.2f,"sig_build_sec":$sigBuildSec%.2f,"recall_top3":$recall%.3f,"note":"sim23 mechanism: Hamming scan + fp64 re-rank vs fp32 brute force, same bounded-heap ranking"}""")
    }

    // --- sim08's O(n^1.5) claim, measured: the cell-blocked kNN graph
    // vs the brute-force all-pairs graph on the SAME clustered corpus.
    // Both routes end in the identical bounded-heap graft_topk ranking;
    // the delta is the candidate-generation term — cells·(n/cells)²
    // + n·cells assignment = 2·n^1.5 dots at cells=√n, vs n² dots.
    // The asymptotic ratio is √n/2, so the measurement runs a small
    // size (where fixed job overhead lets brute compete) and a mid
    // size (where the separation must show), then the 1M-scale point
    // cell-only with the brute cost PROJECTED from the measured small
    // quadratic (10¹² dots is not a benchmark, it's a heat lamp — the
    // projection is disclosed as such in the JSON). Cell blocking is
    // APPROXIMATE (a neighbor in a different cell is unseen), so the
    // routes are compared by RECALL against the brute graph, asserted
    // ≥ 0.5 and reported — the dd19-style identical-rows contract
    // can't apply to an ANN mechanism. ---
    // `knn` (which includes the ~20-minute 60k brute arm) is EXPLICIT
    // opt-in only — an unfiltered run gets the cheap knn20 point, never
    // a 20-minute brute pass it didn't ask for.
    val knnFull = fams.contains("knn")
    if (knnFull || want("knn20")) {
      graft.functions.GraftFunctions.register(spark)
      // knn20: the 20k crossover point alone, preceded by a throwaway
      // warm pass — the family's first-ever query otherwise absorbs
      // session codegen/IO warmup into its min-of-2 (measured 18.4 s
      // cold vs the true steady-state cost; BASELINE round-14 note)
      def bruteGraph(vecs: DataFrame): DataFrame = {
        val nn = vecs.select(col("vec_id"),
            expr("transform(embedding, x -> cast(x as double))").as("e"))
          .withColumn("nrm",
            sqrt(call_function("graft_vec_dot", col("e"), col("e"))))
          .where(col("nrm") > 0)
        val cand = nn.select(col("vec_id").as("neighbor_id"),
          col("e").as("ec"), col("nrm").as("nrm_c"))
        nn.select(col("vec_id").as("query_id"), col("e").as("eq"),
            col("nrm").as("nrm_q"))
          .crossJoin(broadcast(cand))
          .where(col("neighbor_id") =!= col("query_id"))
          .groupBy(col("query_id"))
          .agg(call_function("graft_topk",
            (call_function("graft_vec_dot", col("eq"), col("ec"))
              / (col("nrm_q") * col("nrm_c"))).cast("double"),
            col("neighbor_id"), struct(col("neighbor_id")), lit(2))
            .as("topk"))
          .select(col("query_id"), explode(col("topk")))
          .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"))
      }
      def cellPairs(vecs: DataFrame, nprobe: Int,
          trainRounds: Int = 0): DataFrame =
        graft.similarity.Similarity.knnGraphOn(spark, vecs,
            nprobe = nprobe, trainRounds = trainRounds)
          .select(col("query_id"), col("neighbor_id"))
      val knnSizes = if (knnFull) Seq(20000L, 60000L) else Seq(20000L)
      if (!knnFull) { // warm codegen/IO so the 20k point is clean
        val wDir = "/tmp/graft-skew-knn-20000"
        generateVecs(spark, wDir, 20000L)
        cellPairs(spark.read.parquet(wDir), 1).write
          .format("noop").mode("overwrite").save()
      }
      for (m <- knnSizes) {
        val vDir = s"/tmp/graft-skew-knn-$m"
        generateVecs(spark, vDir, m)
        val vecs = spark.read.parquet(vDir)
        val (brRows, brSec) = run(bruteGraph(vecs))
        val exact = brRows.toSet
        // the recall/cost dial: nprobe=1 (sim08), nprobe=2 (sim29), and
        // nprobe=2 over a Lloyd-trained coarse quantizer (sim30) — the
        // round-14 verdict's open quality item was recall@2 ≈ 0.53 at
        // nprobe=1; this publishes the full curve alongside the speedup
        for ((nprobe, trained) <- Seq((1, 0), (2, 0), (2, 1))) {
          val (cellRows, cellSec) = run(cellPairs(vecs, nprobe, trained))
          val recall = cellRows.count(exact.contains).toDouble / brRows.size
          require(recall >= 0.5,
            f"cell-blocked kNN recall $recall%.2f < 0.5 at n=$m nprobe=$nprobe")
          println(f"""{"metric":"knn_crossover","vectors":$m,"nprobe":$nprobe,"train_rounds":$trained,"cell_sec":$cellSec%.2f,"brute_sec":$brSec%.2f,"speedup":${brSec / cellSec}%.2f,"recall_top2":$recall%.3f,"note":"sim08/sim29/sim30 cell-blocked O(n^1.5 * nprobe) vs brute O(n^2), same graft_topk ranking"}""")
        }
      }
    }

    // 1M-vector cell-only point (its own family: needs a bigger driver
    // heap — SPARK_DRIVER_MEM=64g — and must not force a re-run of the
    // 20-minute 60k brute arm above; the brute cost at this size is a
    // PROJECTION from the measured crossover, stated in BASELINE.md,
    // not a run). EXPLICIT opt-in only — `want` is true for every
    // family on an unfiltered run, and a default invocation must never
    // demand a 64g driver.
    if (fams.contains("knnbig") || fams.contains("knnbigt")) {
      graft.functions.GraftFunctions.register(spark)
      // knnbig = sim08's nprobe=1 graph (the round-14 point);
      // knnbigt = sim30's trained + nprobe=2 config — the quality
      // upgrade exercised at the scale where round 14 found the
      // hash-fallback defect (1M vectors, ~1000 cells: the training
      // argmin alone is a 10⁹-dot pass per round)
      val (npB, trB) = if (fams.contains("knnbigt")) (2, 1) else (1, 0)
      def cellPairsB(vecs: DataFrame): DataFrame =
        graft.similarity.Similarity.knnGraphOn(spark, vecs,
            nprobe = npB, trainRounds = trB)
          .select(col("query_id"), col("neighbor_id"))
      val big = math.max(1000000L, n / 4)
      val bDir = s"/tmp/graft-skew-knn-$big"
      generateVecs(spark, bDir, big)
      val bigVecs = spark.read.parquet(bDir)
      val (bigRows, bigSec) = run(
        cellPairsB(bigVecs).groupBy()
          .agg(count(lit(1)).as("n_edges"),
            sum(col("neighbor_id")).cast("long").as("edge_sum")))
      println(f"""{"metric":"knn_scale","vectors":$big,"nprobe":$npB,"train_rounds":$trB,"cell_sec":$bigSec%.2f,"edges":"${bigRows.head}","note":"sim08/sim30 cell-blocked kNN graph at the 1M-vector scale point; brute at this n is projected in BASELINE.md from the measured 60k crossover"}""")
    }

    // nprobe PRICING at the 1M point (r16 verdict #8): the consumed
    // recall policy (trained + nprobe=8; curve says 16 → 0.725 on the
    // shipped corpus) was priced from sf0.1 cost points only — these
    // arms put a 1M-scale cost receipt behind the next recall bump or
    // its refusal. SINGLE pass each (disclosed: a pricing receipt,
    // not a min-of-2 regression gate — the nprobe=16 candidate join
    // alone is ~8x the knnbigt arm's). Same 64 g-driver opt-in.
    for (np <- Seq(8, 16) if fams.contains(s"knnbig$np")) {
      graft.functions.GraftFunctions.register(spark)
      val big = math.max(1000000L, n / 4)
      val bDir = s"/tmp/graft-skew-knn-$big"
      generateVecs(spark, bDir, big)
      val bigVecs = spark.read.parquet(bDir)
      val (rows, sec) = timed(
        graft.similarity.Similarity.knnGraphOn(spark, bigVecs,
            nprobe = np, trainRounds = 1)
          .groupBy()
          .agg(count(lit(1)).as("n_edges"),
            sum(col("neighbor_id")).cast("long").as("edge_sum"))
          .collect().map(_.toString).sorted.toSeq)
      println(f"""{"metric":"knn_nprobe_price","vectors":$big,"nprobe":$np,"train_rounds":1,"cell_sec":$sec%.2f,"passes":1,"edges":"${rows.head}","note":"1M-scale cost receipt for the recall dial (consumed policy nprobe=8; curve 16 -> 0.725 at sf0.1)"}""")
    }

    // --- kNN recall/cost curve on the SHIPPED corpus (explicit opt-in:
    // `knnship`). The SkewBench knn20/knn arms measure recall on
    // SYNTHETIC clustered corpora; the r15 verdict's open question was
    // what the trained+multi-probe dial buys on the shipped,
    // near-isotropic embeddings table (sim26 measures its top
    // eigenvalue at ~the 1/64 isotropic floor, so there is no
    // anisotropy to whiten away and nprobe is the only recall lever).
    // Exact truth runs at the 1-in-20 sim31/sim32 audit sample; the
    // approx side is the FULL consumer-shaped graph build, so cell_sec
    // is the real per-corpus cost a consumer pays at each setting.
    if (fams.contains("knnship")) {
      graft.functions.GraftFunctions.register(spark)
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1")
      val vecs = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val nn = vecs.select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("e"))
        .withColumn("nrm",
          sqrt(call_function("graft_vec_dot", col("e"), col("e"))))
        .where(col("nrm") > 0)
      val qv = nn.where(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("query_id"), col("e").as("eq"),
          col("nrm").as("nrm_q"))
      val cand = nn.select(col("vec_id").as("neighbor_id"),
        col("e").as("ec"), col("nrm").as("nrm_c"))
      val exact = broadcast(qv)
        .join(cand, col("neighbor_id") =!= col("query_id"))
        .groupBy(col("query_id"))
        .agg(call_function("graft_topk",
          (call_function("graft_vec_dot", col("eq"), col("ec"))
            / (col("nrm_q") * col("nrm_c"))).cast("double"),
          col("neighbor_id"), struct(col("neighbor_id")), lit(2))
          .as("tk"))
        .select(col("query_id"), explode(col("tk")))
        .select(col("query_id"), col("col.neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((nprobe, trained) <- Seq((1, 0), (2, 0), (2, 1), (4, 1),
          (8, 1), (16, 1))) {
        val df = graft.similarity.Similarity
          .knnGraphOn(spark, vecs, nprobe = nprobe, trainRounds = trained)
          .select(col("query_id"), col("neighbor_id"))
        def once(): (Array[(Long, Long)], Double) = {
          val t0 = System.nanoTime()
          val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
          (rows, (System.nanoTime() - t0) / 1e9)
        }
        val (rows, s1) = once()
        val (_, s2) = once()
        val sampled = rows.filter(_._1 % 20 == 0)
        val recall = sampled.count(exact.contains).toDouble / exact.size
        println(f"""{"metric":"knn_shipped_recall","sf":"$sfDir","nprobe":$nprobe,"train_rounds":$trained,"cell_sec":${math.min(s1, s2)}%.2f,"recall_top2":$recall%.3f,"note":"full consumer-shaped graph build on the shipped corpus; truth = exact top-2 at the 1-in-20 audit sample"}""")
      }
    }

    // --- sim18's raw-vs-residual PQ dial across corpus GEOMETRIES
    // (r17 verdict #2): every residual-encoding number so far was
    // measured on the shipped near-isotropic corpus, where residual
    // LOSES (‖r‖ = 1.17‖v‖, recall@3 0.533 raw → 0.267 res). This
    // family re-runs the sim18 two-arm reconstruction-error audit and
    // the sim21/sim33 end-to-end recall@3 probes — the same registry
    // functions, unmodified — on generateVecs's CLUSTERED corpus
    // (~n/10 genuine centroids + 0.3-scale noise, the locally-dense
    // shape real embedding corpora have, where the coarse quantizer
    // captures variance and the faiss contract predicts residual
    // wins) at the shipped size and at 10×. One row per geometry in
    // BASELINE.md makes the deploy-time encoding dial two-column:
    // measure sim18 on YOUR corpus, read the arm that wins there.
    if (want("pqgeom")) {
      graft.functions.GraftFunctions.register(spark)
      val sim = graft.similarity.Similarity
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1")
      def clustered(nv: Long): String = {
        val base = s"/tmp/graft-skew-pqgeom-$nv"
        val eDir = s"$base/embeddings.parquet"
        if (!new File(s"$eDir/_SUCCESS").isFile) {
          generateVecs(spark, s"$base/raw", nv)
          spark.read.parquet(s"$base/raw")
            .select(col("vec_id"), col("embedding"), lit(0).as("label"))
            .write.mode("overwrite").parquet(eDir)
        }
        base
      }
      val geomStats =
        scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double, Double)]
      for ((geom, base) <- Seq(("shipped", sfDir),
          ("clustered2k", clustered(2000L)),
          ("clustered20k", clustered(20000L)))) {
        val (err, errSec) = timed(sim.pqError(spark, base).collect())
        val armMean = err.groupBy(_.getString(0)).map { case (t, rs) =>
          t -> rs.map(_.getAs[Double]("mean_err_vec")).sum / rs.length
        }
        val exact = sim.cosineTopK(spark, base)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        def recall3(df: DataFrame): (Double, Double) = {
          val (rows, sec) = timed(df
            .select(col("query_id"), col("neighbor_id"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
          (rows.count(exact.contains).toDouble / exact.size, sec)
        }
        val (rRaw, sRaw) = recall3(sim.ivfPq(spark, base))
        val (rRes, sRes) = recall3(sim.ivfPqResidual(spark, base))
        // sim38's label-free resolution dial on the same geometry:
        // median per-cell nn_d2/within (median, not mean — a single
        // near-empty cell's huge ratio must not carry the summary)
        val resVals = sim.cellResolution(spark, base)
          .where(col("resolution").isNotNull)
          .select(col("resolution")).collect().map(_.getDouble(0)).sorted
        val medRes = resVals(resVals.length / 2)
        geomStats += ((geom, rRaw, rRes, medRes))
        println(f"""{"metric":"pq_geometry","geometry":"$geom","mean_err_vec_raw":${armMean("raw")}%.4f,"mean_err_vec_res":${armMean("res")}%.4f,"recall3_raw":$rRaw%.3f,"recall3_res":$rRes%.3f,"median_resolution":$medRes%.3f,"err_sec":$errSec%.2f,"raw_sec":$sRaw%.2f,"res_sec":$sRes%.2f,"note":"sim18 two-arm audit + sim21/sim33 end-to-end recall@3 vs exact (truth = 5-query exact top-3) + sim38 median cell resolution"}""")
        GraftSession.resetCaches(spark)
      }
      // the audit must PREDICT the measured winner: the geometry where
      // residual beats raw is the one whose resolution dial reads
      // highest (the r18 table: residual wins only on clustered2k)
      val resWinners = geomStats.filter { case (_, raw, res, _) => res > raw }
      if (resWinners.nonEmpty) {
        val maxByRes = geomStats.maxBy(_._4)
        require(resWinners.exists(_._1 == maxByRes._1),
          s"sim38 resolution dial failed to predict the residual " +
            s"winner: winners=${resWinners.map(_._1)} " +
            s"maxResolution=${maxByRes._1}")
      }
    }

    // --- native as-of merge loop: whole-stage codegen ON vs OFF at a
    // scale where the MERGE dominates. The sf0.1 registry gates are the
    // wrong instrument for this A/B: their inputs are ~10^5 rows, so
    // the janino compile + region setup cost outweighs the loop and
    // codegen OFF measures 10-25% FASTER there (round-12 measurement,
    // BASELINE.md). Here the merge walks millions of rows per
    // partition, which is where the fused loop earns its keep. Result
    // parity asserted; the ON plan is asserted to actually contain a
    // codegen'd AsOfJoin region (the conf could silently fall back).
    if (want("asof")) {
      def asofWork(sess: SparkSession): DataFrame = {
        val quotes = sess.range(n).select(
          concat(lit("T"), pmod(col("id"), lit(64))).as("q_ticker"),
          col("id").as("q_ts"),
          pmod(col("id"), lit(9973)).as("price"))
        val anchors = sess.range(n / 10).select(
          concat(lit("T"), pmod(col("id"), lit(64))).as("ticker"),
          (col("id") * 7 + 3).as("ts"))
        plans.AsOf.join(anchors, quotes, "ticker", "q_ticker", "ts", "q_ts")
          .groupBy(col("ticker"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("price")).cast("long").as("sum_price"),
            max(col("q_ts")).as("max_qts"))
      }
      def cgSession(on: Boolean): SparkSession = {
        val ss = spark.newSession()
        ss.conf.set("spark.sql.codegen.wholeStage", on.toString)
        ss.conf.set("spark.sql.codegen.fallback", "false")
        ss
      }
      val onSess = cgSession(on = true)
      val onDf = asofWork(onSess)
      val (cgRows, cgSec) = run(onDf)
      // pin that the ON run really took the codegen path — inspected
      // on the SAME queryExecution the collect ran (AQE finalizes the
      // executed plan only then; a fresh df would show the pre-AQE one)
      val plan = onDf.queryExecution.executedPlan.toString
      require("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined,
        s"as-of codegen did not engage:\n$plan")
      val (interpRows, interpSec) = run(asofWork(cgSession(on = false)))
      require(cgRows == interpRows,
        "codegen'd as-of diverged from the interpreted path")
      println(f"""{"metric":"asof_codegen","quotes":$n,"anchors":${n / 10},"codegen_sec":$cgSec%.2f,"interpreted_sec":$interpSec%.2f,"speedup":${interpSec / cgSec}%.2f}""")
    }

    // --- txt39/op17 at corpus scale: the DSIR two-pass selection and
    // the bucketed skyline, sized where the 5k-doc gate corpus can't
    // show a trend (the gate proves VALUES; this measures the claimed
    // plan shapes under ~10M-word inputs, two sizes so the trend — not
    // one number — is the 100 TB argument). Contracts: DSIR returns
    // exactly k rows and the SAME k rows on a re-run (the draw is a
    // pure function of the corpus; a partition-dependent RNG would
    // flip it at this parallelism); the skyline's distributed
    // two-level prefix-max must equal an INDEPENDENT driver-side sweep
    // over the collected (distinct score, max length) table — which is
    // collectable precisely because its cardinality is score-domain-
    // bounded, not corpus-bounded — and the frontier must be an
    // anti-chain. ---
    if (want("select")) {
      for (nSel <- Seq(150000L, 400000L)) {
        val selDir = s"/tmp/graft-skew-select-$nSel"
        generate(spark, s"$selDir/documents.parquet", nSel)
        def dsirOnce: Seq[String] =
          text.TextAnalysis.dsirSelect(spark, selDir)
            .collect().map(_.toString).toSeq
        val (d1, ds1) = timed(dsirOnce)
        val (d2, ds2) = timed(dsirOnce)
        require(d1 == d2, "DSIR draw not reproducible across re-runs")
        require(d1.size == text.TextAnalysis.DsirK,
          s"DSIR returned ${d1.size} rows, want ${text.TextAnalysis.DsirK}")
        val dsirSec = math.min(ds1, ds2)
        def skyOnce: Seq[(Long, Long, Long)] =
          operators.Skyline.skylineSelect(spark, selDir).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        val (k1, ks1) = timed(skyOnce)
        val (k2, ks2) = timed(skyOnce)
        require(k1 == k2, "skyline not deterministic across re-runs")
        val skySec = math.min(ks1, ks2)
        val pairs = k1.map(t => (t._2, t._3)).toSet
        // independent sweep: same score spelling (the algebra under
        // test is the bucketed prefix-max, not the feature formula)
        val msc = Tables.documents(spark, selDir).selectExpr(
            "4 * cast(size(array_distinct(split(text, ' '))) as bigint)" +
              " + 8 * cast(size(filter(split(text, ' ')," +
              " t -> t IN ('the','a','of'))) as bigint)" +
              s" - (case when size(split(text, ' ')) >= " +
              s"${text.TextAnalysis.MinTokens} then 2 else 5 end)" +
              " * cast(size(split(text, ' ')) as bigint) as s",
            "n_chars as c")
          .groupBy(col("s")).agg(max(col("c")).as("mc"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        var best = Long.MinValue
        val expect = msc.sortBy(-_._1).flatMap { case (sc, mc) =>
          val keep = mc > best
          best = math.max(best, mc)
          if (keep) Some((sc, mc)) else None
        }.toSet
        require(pairs == expect,
          s"skyline diverged from the independent sweep: " +
            s"extra=${pairs -- expect} missing=${expect -- pairs}")
        for (a <- pairs; b <- pairs if a != b)
          require(!(a._1 >= b._1 && a._2 >= b._2),
            s"frontier not an anti-chain: $a dominates $b")
        println(f"""{"metric":"select_ops","docs":$nSel,"dsir_sec":$dsirSec%.2f,"skyline_sec":$skySec%.2f,"frontier_pairs":${pairs.size},"distinct_scores":${msc.length},"note":"txt39 two-pass DSIR (fixed-k, reproducible) + op17 bucketed skyline (= independent prefix-max sweep, anti-chain)"}""")
      }
    }

    // --- sim34's staleness audit must actually FIRE (family `drift`):
    // on the shipped corpus the increment is same-distribution and
    // drift reads ~1.03 (correctly: no retrain needed). This arm
    // builds the failure case the audit exists for — history from one
    // clustered geometry, increment from a DIFFERENT cluster structure
    // (shifted hash seed ⇒ new centroid locations) — and requires the
    // drift ratio to separate cleanly from the null case. Both
    // corpora share size and marginal scale; only the cluster
    // ASSIGNMENT shifts, which is exactly the drift a frozen
    // quantizer cannot see without this audit.
    if (want("drift")) {
      graft.functions.GraftFunctions.register(spark)
      def vecExpr(seed: Int) =
        s"""transform(sequence(0, 63), i -> cast(
           |  (pmod(hash(cid, i, $seed), 2001) - 1000) / 1000.0
           |  + 0.3 * (pmod(hash(vec_id, i, 77), 2001) - 1000) / 1000.0
           |as float))""".stripMargin
      def corpus(dir: String, incSeed: Int): Unit = {
        if (new File(s"$dir/embeddings.parquet/_SUCCESS").isFile) return
        // 100 clusters vs ~141 centroids: the frozen quantizer can
        // RESOLVE the cluster structure (the pqgeom precondition), so
        // a same-distribution increment lands near its cluster's
        // centroid and a shifted one measurably does not — at the
        // 2000-cluster default the 141 centroids resolve nothing and
        // both arms read identically (measured before this fix)
        // cid must NOT alias the %5 hist/inc split (id % 100 does:
        // 100 ≡ 0 mod 5, so the "null" increment would own 20
        // clusters history never saw and read as shifted) — a hash
        // mix decouples cluster identity from the split
        spark.range(20000L)
          .select(col("id").as("vec_id"),
            pmod(hash(col("id"), lit(11)), lit(100)).as("cid"))
          .select(col("vec_id"),
            when(col("vec_id") % 5 =!= 0, expr(vecExpr(0)))
              .otherwise(expr(vecExpr(incSeed))).as("embedding"),
            lit(0).as("label"))
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      def meanDrift(dir: String): (Double, Double) = {
        val rows = graft.similarity.Similarity.ivfAppend(spark, dir)
          .where(col("drift").isNotNull)
          .agg(avg(col("drift")), max(col("drift"))).head
        (rows.getDouble(0), rows.getDouble(1))
      }
      val nullDir = "/tmp/graft-skew-drift-null"
      val shiftDir = "/tmp/graft-skew-drift-shift"
      corpus(nullDir, incSeed = 0)
      corpus(shiftDir, incSeed = 991)
      val (nullAvg, nullMax) = meanDrift(nullDir)
      val (shiftAvg, shiftMax) = meanDrift(shiftDir)
      require(shiftAvg > nullAvg,
        f"staleness audit failed to separate: shifted $shiftAvg%.3f " +
          f"vs null $nullAvg%.3f")
      println(f"""{"metric":"append_drift","vectors":20000,"null_avg_drift":$nullAvg%.3f,"null_max_drift":$nullMax%.3f,"shifted_avg_drift":$shiftAvg%.3f,"shifted_max_drift":$shiftMax%.3f,"note":"sim34 staleness audit on same-distribution vs cluster-shifted increments; separation asserted in-run"}""")
      // sim37's churn audit on the same two fixtures. First finding
      // (kept, it reshaped the audit): TOTAL churn does NOT separate
      // here — on an unconverged prefix-centroid quantizer one M-step
      // relocates centroids substantially on ANY corpus (measured
      // 82.6% shifted vs 89.2% null). What separates drift-driven
      // retrain from mere re-centering is WHO the moved centroid
      // absorbs: on the shifted append it chases the increment's new
      // geometry, so the increment's share of n_in rises far above
      // the increment's corpus share (20%); on the null append it
      // stays at it. The firing signal asserted here is that share.
      def churn(dir: String): (Long, Long, Long) = {
        val r = graft.similarity.Similarity
          .ivfRetrainReassign(spark, dir)
          .agg(sum(col("n_out") + col("n_in")).cast("long"),
            sum(col("n_before")).cast("long"),
            sum(col("n_in_inc")).cast("long"),
            sum(col("n_in")).cast("long")).head
        (r.getLong(0), r.getLong(1),
          if (r.getLong(3) == 0) 0L
          else r.getLong(2) * 1000L / r.getLong(3))
      }
      val (churnNull, baseNull, incShareNull) = churn(nullDir)
      val (churnShift, baseShift, incShareShift) = churn(shiftDir)
      require(incShareShift > incShareNull,
        s"post-retrain inc-share failed to separate: shifted " +
          s"${incShareShift}‰ vs null ${incShareNull}‰")
      println(s"""{"metric":"retrain_churn","vectors":20000,"null_churn":$churnNull,"null_members":$baseNull,"null_inc_share_permille":$incShareNull,"shifted_churn":$churnShift,"shifted_members":$baseShift,"shifted_inc_share_permille":$incShareShift,"note":"sim37 reassignment audit after the top-8 partial retrain: total churn saturates on the unconverged prefix quantizer in BOTH arms; the increment share of absorbed vectors (n_in_inc/n_in) is the drift signal, asserted to separate shifted vs null"}""")
      GraftSession.resetCaches(spark)
    }

    // --- dd24/dd25 curation pipelines at corpus scale (r17 verdict
    // #5): the end-to-end composition had sf0.1 cost only (~8 s); this
    // prices it on the select arms' 150k/400k-doc corpora and asserts
    // the manifest contracts IN-RUN: the draw is bit-reproducible
    // across re-runs, and ZERO verified near-dup pairs survive with
    // both ends selected (two emitted near-dups = dedup failure — the
    // "no straddling pairs" contract at the only place it can be
    // violated, the emission). dd25 decomposes into yesterday's store
    // build (the amortized artifact) vs the daily incremental update —
    // the ratio IS the argument for running incremental at 100 TB.
    if (want("curate")) {
      import graft.dedup.Dedup
      for (nSel <- Seq(150000L, 400000L)) {
        val selDir = s"/tmp/graft-skew-select-$nSel"
        generate(spark, s"$selDir/documents.parquet", nSel)
        def manOnce: Seq[String] = Dedup.curationManifest(spark, selDir)
          .collect().map(_.toString).toSeq
        val (m1, ms1) = timed(manOnce)
        val (m2, ms2) = timed(manOnce)
        require(m1 == m2,
          "curation manifest not reproducible across re-runs")
        val manSec = math.min(ms1, ms2)
        val nDocs = m1.size
        // straddle contract: reuses the same cached pair seam the
        // manifest consumed, so this prices one join, not a rebuild
        val sel = Dedup.curationSelected(spark, selDir)
          .select(col("doc_id"))
        val straddle = Dedup.minhashLsh(spark, selDir)
          .select(col("id_a"), col("id_b"))
          .join(sel.withColumnRenamed("doc_id", "id_a"), "id_a")
          .join(sel.withColumnRenamed("doc_id", "id_b"), "id_b")
          .count()
        require(straddle == 0L,
          s"$straddle verified near-dup pairs emitted on BOTH ends")
        val (_, storeSec) = timed {
          val (sg, kp) = Dedup.dd25Stores(spark, selDir)
          (sg.count(), kp.count())
        }
        def incOnce: Seq[String] =
          Dedup.incrementalCurationManifest(spark, selDir)
            .collect().map(_.toString).toSeq
        val (i1, is1) = timed(incOnce)
        val (i2, is2) = timed(incOnce)
        require(i1 == i2,
          "incremental manifest not reproducible across re-runs")
        val incSec = math.min(is1, is2)
        val changed = Dedup.incrementalCurationManifest(spark, selDir)
          .where(col("changed") === 1).count()
        println(f"""{"metric":"curate_scale","docs":$nSel,"dd24_manifest_sec":$manSec%.2f,"manifest_cells":$nDocs,"straddling_pairs":$straddle,"dd25_store_build_sec":$storeSec%.2f,"dd25_incremental_sec":$incSec%.2f,"changed_cells":$changed,"note":"dd24 batch curation + dd25 incremental (store build amortized vs daily update) at select-arm scale; re-draw equality and zero-straddle asserted in-run"}""")
        GraftSession.resetCaches(spark)
      }
    }

    spark.stop()
  }
}
