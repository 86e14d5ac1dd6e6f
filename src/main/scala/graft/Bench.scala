package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Contents:
  *  - operator queries timed at local[cpus] over SPARK_GRAFT_SF_DIR
  *    (forced through a noop write so lazy plans fully execute);
  *  - the quality-filter pipeline's docs/sec over a distributed-generated
  *    pages corpus at TWO parallelism levels (local[N] vs local[4N]) on the
  *    SAME input → scaling efficiency (BASELINE.md: the sandbox substitute
  *    for N vs 4N executors). Also refreshes BENCH.md.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Force full execution without result materialization on the driver. */
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lowCpus = math.max(1, cpus / 4)
    // sized so the low-parallelism timed run is O(60 s): short runs are
    // dominated by fixed per-job overhead and understate scaling (the
    // 100 TB regime this metric stands in for has no 8-second stages).
    // Round-5 fit on fresh probes: t = f + v/k with f ≈ 0.5 s →
    // quiet-host efficiency ≈ 0.97 at 1.8M pages and ≈ 0.98 at 2.4M.
    // The raise to 2.4M buys driver-window robustness more than
    // asymptote: longer runs stretch the sampling phase, so a single
    // multi-minute interference wave (which inflated ALL 24 high-level
    // samples in the round-4 driver window → 0.800 with zero margin)
    // can no longer cover every sample of a level.
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "2400000").toLong

    // ---- operator queries at local[cpus] --------------------------------
    // (SPARK_GRAFT_SKIP_QUERIES=1 skips them for local scaling iteration)
    val skipQueries = sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1")
    val spark = session(cpus)
    val queryTimes = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // (q17 rejoined the bench in round 2: 5-char shingles + calibrated
    // banding bound its candidate set — see TextOps.MinHashPerms)
    // JIT warmup on the smallest sf
    if (!skipQueries) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try exec(fn(spark, "/root/testdata/sf0.001"))
        catch { case _: Throwable => () }
      }
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t = try time(exec(fn(spark, sfDir))) catch { case _: Throwable => -1.0 }
        queryTimes(name) = math.round(t * 1000.0) / 1000.0
      }
    }

    // ---- pipeline scaling: same input, local[lowCpus] vs local[cpus] ----
    val pagesPath = "/tmp/graft_bench_pages"
    import graft.pipeline._
    PagesGen.pagesDfDistributed(spark, benchPages)
      .write.mode("overwrite").parquet(pagesPath)
    spark.stop()

    /** One measurement = one FRESH JVM (the sandbox analog of one
      * spark-submit at that cluster size): no GC/JIT state shared between
      * parallelism levels, which otherwise dominates the comparison.
      */
    def pipelineRun(k: Int, reps: Int = 2): Seq[Double] = {
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")
      val shuffleDir = "/dev/shm/graft-shuffle"
      new java.io.File(shuffleDir).mkdirs()
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        s"-Xmx$mem", "-Dspark.ui.enabled=false",
        // shuffle on tmpfs: the sandbox's virtual disk has erratic
        // writeback latency that otherwise dominates measurements
        s"-Dspark.local.dir=$shuffleDir",
        "-cp", System.getProperty("java.class.path"),
        "graft.BenchPipelineRun", k.toString, pagesPath, reps.toString
      )
      val out = new StringBuilder
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = reader.readLine()
      while (line != null) {
        if (line.startsWith("RESULT ")) out.append(line)
        line = reader.readLine()
      }
      proc.waitFor()
      require(out.nonEmpty, s"no RESULT from subprocess at k=$k")
      out.toString.split(" ").drop(2).map(_.toDouble).toSeq
    }

    // criterion-shaped detector micro-bench (single-threaded, F6 groups).
    // Three passes spread over the scaling phase, min per group: a single
    // pass landing in a shared-host interference wave once reported 2.7×
    // the quiet-host figure.
    var microRuns = Seq(BenchSentences.run())

    // Scaling pair N vs 4N with N=2 → 4N=8: the pair leaves 24 of the 32
    // cores idle, so shared-host interference waves (which run at tens of
    // percent CPU) land on the IDLE cores instead of distorting the
    // measured levels — at N=4→16/32 the same waves produced 3× sample
    // spread and lottery efficiency numbers. Headline docs/sec is still
    // measured at full width. Six fine-grained interleaved rounds, min per
    // level (min estimates the quiet-host time; medians reported too).
    val scaleLow = sys.env.getOrElse("SPARK_GRAFT_SCALE_LOW", "2").toInt
    val scaleHigh = scaleLow * 4
    // Estimator rationale (the measurement wandered both sides of the 0.8
    // gate before this settled): shared-host interference is ONE-SIDED —
    // it only ever ADDS time — so the per-level MINIMUM over enough
    // samples converges to the quiet-host time and their ratio is the
    // principled efficiency estimate. Two timed reps per fresh JVM (after
    // a 50k-doc warmup) absorb cross-JVM JIT variance; interleaved rounds
    // give each level shots at quiet windows. Per-round paired
    // efficiencies are reported as dispersion, not the headline (a wave
    // can straddle one side of a pair).
    //
    // Round-2 lesson: the driver's window measured 0.711 with ZERO quiet
    // high-level samples (all 8 ≥ 9.15 s vs a quiet-host 7.95 s) — the
    // high level is the interference-sensitive one (short runs, more
    // cores exposed), so it now gets 8 JVMs (16 samples) spread over the
    // whole phase while the expensive low level gets 5 JVMs (10 samples).
    var lowSamples = Seq.empty[Double]
    var highSamples = Seq.empty[Double]
    var fullSamples = Seq.empty[Double]
    var pairEffs = Seq.empty[Double]
    (1 to 8).foreach { r =>
      // 3 timed reps at the cheap levels: each extra rep costs seconds and
      // gives the min another shot inside the same scheduling slot
      val highs = pipelineRun(scaleHigh, reps = 3)
      highSamples = highSamples ++ highs
      if (r == 1 || r == 3 || r == 6 || r == 8) {
        val lows = pipelineRun(scaleLow, reps = 2)
        lowSamples = lowSamples ++ lows
        pairEffs :+= lows.min / (highs.min * (scaleHigh.toDouble / scaleLow))
      }
      // full width every even round (8 samples): with only 2 JVMs the
      // min-of-4 headline was a wave lottery — a single interference wave
      // spanning both JVMs inflated the round-3 docs/sec 2×
      if (r % 2 == 0) fullSamples = fullSamples ++ pipelineRun(cpus, reps = 3)
      if (r == 4 || r == 8) microRuns :+= BenchSentences.run()
    }

    // ---- adaptive top-up until the per-level minima CONVERGE -----------
    // The min estimator is only credible once a level holds TWO nearly
    // equal fastest samples (min vs 2nd-min gap < 10%): round 3 shipped a
    // passing headline whose high-level gap was 41% — a single lucky
    // quiet sample. Keep adding interleaved fresh-JVM samples at the
    // worst-gap level until every level converges or the time budget
    // (default 9 min) runs out; the budget is reported honestly either
    // way. One-sided interference ⇒ extra samples can only sharpen mins.
    def gapOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size < 2) Double.MaxValue else s(1) / s(0) - 1.0
    }
    val gapTarget = 0.10
    val topupDeadline = System.nanoTime() +
      sys.env.getOrElse("SPARK_GRAFT_TOPUP_SEC", "660").toLong * 1000000000L
    var topups = 0
    while ({
      val worstGap = math.max(gapOf(lowSamples), math.max(gapOf(highSamples), gapOf(fullSamples)))
      worstGap > gapTarget && System.nanoTime() < topupDeadline && topups < 12
    }) {
      val gaps = Seq(
        ("low", gapOf(lowSamples)), ("high", gapOf(highSamples)), ("full", gapOf(fullSamples)))
      gaps.maxBy(_._2)._1 match {
        case "low"  => lowSamples = lowSamples ++ pipelineRun(scaleLow, reps = 2)
        case "high" => highSamples = highSamples ++ pipelineRun(scaleHigh, reps = 3)
        case "full" => fullSamples = fullSamples ++ pipelineRun(cpus, reps = 3)
      }
      topups += 1
    }
    // ---- second top-up phase: suspicious-ratio resampling --------------
    // Run 3 of round 5 measured min-ratio 0.787 with every level's gap
    // CONVERGED: the high level's entire phase sat under one long wave
    // (all 24 samples ≥ 17.0 s vs 14.3 s quiet) while the low level
    // caught one super-quiet sample. Convergence (two nearly-equal
    // fastest samples) proves stability WITHIN the observed window, not
    // that the window contained a quiet moment — so a suspicious ratio
    // triggers more sampling. The r5 verdict closed an asymmetry here:
    // the old phase resampled ONLY the high level, which can only RAISE
    // the measured ratio — honest just when the low min already sits at
    // its quiet-host truth, previously guarded by nothing tighter than
    // the generic 10 % gap target. Now (a) every second-phase round
    // interleaves LOW-level JVMs alongside the high ones, so the
    // estimator stays two-sided (a sharper low min can only LOWER the
    // ratio), (b) the phase stops on MIN STABILITY ALONE — a full
    // interleaved round improving neither level's min by > 0.5 % —
    // never on the ratio crossing the gate constant (ADVICE r6: the
    // old loop ALSO required the low-gap precondition in its stop
    // condition, so a stubbornly noisy low level kept resampling to
    // the deadline after both mins had stabilized), and (c) the ratio
    // is HEADLINE only once the low level's min-gap ends < 3 % — now
    // enforced by the artifact itself: `scaling_efficiency_headline`
    // in the JSON is false when the precondition misses, and BENCH.md's
    // efficiency line is keyed off the same flag.
    def effNow(): Double =
      lowSamples.min / (highSamples.min * (scaleHigh.toDouble / scaleLow))
    val secondPhase = effNow() < 0.90
    var secondStable = false
    while (secondPhase && !secondStable &&
           System.nanoTime() < topupDeadline && topups < 24) {
      val befLow = lowSamples.min
      val befHigh = highSamples.min
      highSamples = highSamples ++ pipelineRun(scaleHigh, reps = 3)
      lowSamples = lowSamples ++ pipelineRun(scaleLow, reps = 2)
      topups += 2
      secondStable =
        lowSamples.min >= befLow * 0.995 && highSamples.min >= befHigh * 0.995
    }

    val micro: Map[String, Double] =
      microRuns.flatMap(_.keys).distinct.map { k =>
        k -> microRuns.flatMap(_.get(k)).min
      }.toMap
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val tLow = lowSamples.min
    val tHigh = highSamples.min
    val tFull = fullSamples.min
    // the self-demoting headline contract (VERDICT r6): a second-phase
    // ratio is quotable only when the low level's min converged tightly
    val effHeadline = !secondPhase || gapOf(lowSamples) < 0.03
    val tpLow = benchPages / tLow
    val tpHigh = benchPages / tHigh
    val tpFull = benchPages / tFull
    val eff = tpHigh / (tpLow * (scaleHigh.toDouble / scaleLow))
    val effPairedMedian = median(pairEffs)

    queryTimes(s"pipeline_${benchPages}_docs_local$scaleLow") = math.round(tLow * 1000.0) / 1000.0
    queryTimes(s"pipeline_${benchPages}_docs_local$scaleHigh") = math.round(tHigh * 1000.0) / 1000.0
    queryTimes(s"pipeline_${benchPages}_docs_local$cpus") = math.round(tFull * 1000.0) / 1000.0

    val total = queryTimes.values.filter(_ >= 0).sum
    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val microJson = micro.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + math.round(v * 10.0) / 10.0 }
      .mkString("{", ",", "}")
    val extras =
      s""""docs_per_sec":${math.round(tpFull)},"docs_per_sec_low":${math.round(tpLow)},""" +
      s""""docs_per_sec_high":${math.round(tpHigh)},""" +
      s""""scaling_efficiency":${math.round(eff * 1000.0) / 1000.0},""" +
      s""""scaling_efficiency_paired_median":${math.round(effPairedMedian * 1000.0) / 1000.0},""" +
      s""""pair_efficiencies":[${pairEffs.map(e => f"$e%.3f").mkString(",")}],""" +
      s""""samples_low":[${lowSamples.map(s => f"$s%.2f").mkString(",")}],""" +
      s""""samples_high":[${highSamples.map(s => f"$s%.2f").mkString(",")}],""" +
      s""""samples_full":[${fullSamples.map(s => f"$s%.2f").mkString(",")}],""" +
      s""""parallelism":[$scaleLow,$scaleHigh],"full_width":$cpus,"bench_pages":$benchPages,""" +
      s""""min_gap_low":${math.round(gapOf(lowSamples) * 1000.0) / 1000.0},""" +
      s""""min_gap_high":${math.round(gapOf(highSamples) * 1000.0) / 1000.0},""" +
      s""""min_gap_full":${math.round(gapOf(fullSamples) * 1000.0) / 1000.0},""" +
      s""""topup_jvms":$topups,""" +
      s""""second_phase_used":$secondPhase,""" +
      s""""second_phase_low_gap_ok":${gapOf(lowSamples) < 0.03},""" +
      s""""scaling_efficiency_headline":$effHeadline,""" +
      s""""detector_micro":$microJson"""
    println(
      s"""{"metric":"total","value":${math.round(total * 1000.0) / 1000.0},"unit":"sec",""" +
      s""""queries":$qs,$extras,"sf":"$sfDir"}""")

    // refresh BENCH.md with the scaling table
    def second(xs: Seq[Double]): Double = xs.sorted.lift(1).getOrElse(xs.max)
    // cross-window context (VERDICT r4 #8): the preceding driver window's
    // full-width min, read from the newest committed BENCH_r{N}.json, so a
    // reader sees the wave-noise envelope without diffing JSON
    val crossWindow: String = {
      val dir = new java.io.File("/root/repo")
      val rs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.matches("BENCH_r\\d+\\.json")).sortBy(_.getName)
      rs.lastOption.flatMap { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
        val m = java.util.regex.Pattern
          .compile("pipeline_(\\d+)_docs_local" + cpus + "\\\\?\":\\s*([0-9.]+)")
          .matcher(txt)
        if (m.find()) {
          val prevPages = m.group(1).toLong
          val note =
            if (prevPages == benchPages)
              "the cross-window spread IS the shared-host wave-noise envelope on identical code."
            else
              s"NOT directly comparable — that window ran $prevPages pages vs $benchPages here; read the ratio qualitatively."
          Some(f"this run's full-width min ${tFull}%.2f s vs ${m.group(2)} s in the " +
            s"${f.getName.stripSuffix(".json")} driver window ($note)")
        } else None
      }.getOrElse("no prior driver-window BENCH_r{N}.json found to compare against.")
    }
    val md =
      s"""# BENCH — measured throughput & scaling
         |
         |This file is REGENERATED BY EVERY `graft.Bench` RUN — the numbers
         |below are from the latest run on this machine, the same estimator
         |and sample schedule the per-round driver executes (no
         |cherry-picked windows; compare BENCH_r{N}.json).
         |
         |Pipeline: quality filter (language-ID + quality rules + scrub +
         |host-dedup window) over a distributed-generated pages corpus of
         |$benchPages docs; identical input at both parallelism levels
         |(sandbox substitute for N vs 4N executors, see BASELINE.md).
         |
         |Cross-window context: $crossWindow
         |
         |Each measurement is a fresh JVM (the sandbox analog of one
         |spark-submit per cluster size); headline = min over interleaved
         |samples (the quiet-host estimate — shared-host interference comes
         |in multi-minute waves and is one-sided), with medians alongside
         |for dispersion. The high level gets the most samples: round 2
         |showed the short high-level runs are the interference-sensitive
         |side. After the fixed schedule, ADAPTIVE TOP-UP rounds keep
         |sampling whichever level's min-vs-2nd-min gap exceeds 10% until
         |every level's min is corroborated by a second nearly-equal
         |sample; then, if the ratio of minima still sits below 0.90, a
         |SECOND top-up phase runs within the same time budget (~11 min
         |total) — convergence proves stability within the observed
         |window, not that the window contained a quiet moment. The
         |second phase interleaves LOW-level JVMs alongside the
         |high-level ones (so it stays two-sided: a sharper low min can
         |only LOWER the ratio) and stops on MIN STABILITY alone — a full
         |interleaved round improving neither level's min — never on the
         |ratio crossing the gate constant; its ratio is headline only
         |once the low level's min-gap ends < 3%, and the JSON enforces
         |that contract itself (`scaling_efficiency_headline`). This run
         |used $topups top-up JVMs. A >10% residual gap below means that
         |level's min is still a single uncorroborated sample.
         |Raw samples (s):
         |local[$scaleLow] = ${lowSamples.map(s => f"$s%.2f").mkString(", ")};
         |local[$scaleHigh] = ${highSamples.map(s => f"$s%.2f").mkString(", ")};
         |local[$cpus] = ${fullSamples.map(s => f"$s%.2f").mkString(", ")}.
         |
         || parallelism | min s | 2nd-min s | median s | docs/sec (min) |
         || --- | --- | --- | --- | --- |
         || local[$scaleLow] (N) | ${f"$tLow%.2f"} | ${f"${second(lowSamples)}%.2f"} | ${f"${median(lowSamples)}%.2f"} | ${math.round(tpLow)} |
         || local[$scaleHigh] (4N) | ${f"$tHigh%.2f"} | ${f"${second(highSamples)}%.2f"} | ${f"${median(highSamples)}%.2f"} | ${math.round(tpHigh)} |
         || local[$cpus] (full width) | ${f"$tFull%.2f"} | ${f"${second(fullSamples)}%.2f"} | ${f"${median(fullSamples)}%.2f"} | ${math.round(tpFull)} |
         |
         |**Scaling efficiency (N=$scaleLow → 4N=$scaleHigh): ${f"$eff%.3f"}${
           if (effHeadline) ""
           else " — NOT HEADLINE-QUOTABLE (second-phase low-level min-gap ≥ 3%; read as a lower-confidence figure)"}**
         |= ratio of per-level minima — interference on this shared host is
         |one-sided (only adds time), so the min over interleaved samples
         |converges to the quiet-host time per level. Convergence check:
         |min vs 2nd-min gap ${f"${(second(lowSamples) / tLow - 1) * 100}%.1f"}% (low) /
         |${f"${(second(highSamples) / tHigh - 1) * 100}%.1f"}% (high) /
         |${f"${(second(fullSamples) / tFull - 1) * 100}%.1f"}% (full width)
         |after $topups adaptive top-up JVMs (target < 10% each) — a
         |large gap means that level's min has NOT converged and the
         |efficiency figure should be read with suspicion. Second top-up
         |phase ${if (secondPhase) "USED" else "not needed (ratio ≥ 0.90 after phase 1)"};
         |low-level min-gap precondition for a headline second-phase ratio
         |(< 3%): ${f"${gapOf(lowSamples) * 100}%.1f"}% — ${
           if (!secondPhase) "n/a (phase skipped)"
           else if (gapOf(lowSamples) < 0.03) "MET"
           else "NOT met; read the efficiency as a lower-confidence figure"}.
         |Per-round paired
         |efficiencies: ${pairEffs.map(e => f"$e%.3f").mkString(", ")}
         |(median ${f"$effPairedMedian%.3f"} — dispersion indicator, waves
         |can straddle one side of a pair). Target ≥ 0.8; efficiency =
         |tp_4N / (tp_N × 4). Full-width monotonicity: local[$cpus]
         |${if (tFull <= tHigh) "≥" else "<"} local[$scaleHigh] throughput.
         |
         |Plan decomposition (graft.BenchDecompose, quiet host, local[16]):
         |the fused detection kernel alone scales ~0.90 N→4N; the round-1
         |regression (local[32] slower than local[16]) was AQE partition
         |coalescing folding the kernel stage to ~19 tasks — coalescing is
         |now disabled in the pipeline sessions and the kernel stage runs at
         |k×4 tasks. Dedup variants (row_number window vs min-aggregate +
         |shuffled-hash join) measured equal at ~1 s / 1.2M docs; the window
         |won on single-scan + exact semantics (FilterPipeline.run scaladoc).
         |
         |Detector micro-bench (reference criterion structure: µs per
         |12-sentence batch, single thread, median of 200):
         |
         || group | µs/batch |
         || --- | --- |
         |${micro.toSeq.sortBy(_._1).map { case (k, v) => s"| $k | ${math.round(v * 10.0) / 10.0} |" }.mkString("\n|")}
         |
         |Operator query times at `$sfDir`, local[$cpus], noop sink:
         |
         || query | sec |
         || --- | --- |
         |${queryTimes.map { case (k, v) => s"| $k | $v |" }.mkString("\n|")}
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/BENCH.md"), md)
  }
}
