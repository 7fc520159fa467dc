package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // TIMESTAMP_NTZ-normalized events are session-TZ-dependent; pin UTC so
      // unix_micros/hour/window math matches the oracle on any host (every
      // other entrypoint — Verify/ReportMain/HealthMain/tests — already pins).
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Executor TASK time per query (r14 verdict #8): at sf0.1 the walls
    // are dominated by per-query constants (plan/codegen/scheduling), so
    // 8- vs 32-core walls cannot separate compute-bound queries. Sum of
    // task run times CAN — it scales with actual executor work, not with
    // the driver's fixed costs. Snapshot around each timed query; written
    // to target/bench.json only (stdout line format unchanged).
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) taskTimeMs.addAndGet(m.executorRunTime)
      }
    })
    // Untimed warmups so the first timed queries don't pay JIT/codegen/
    // shuffle-service startup (r1 showed 10x inflation on the first few;
    // one warmup was not enough — whichever queries ran 2nd-4th still
    // absorbed the compiler lottery). Three shapes: broadcast join,
    // shuffle agg+window, scan projection.
    Seq("j01_broadcast_star", "w01_topn_per_group", "t01_token_stats")
      .foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, sfDir).queryExecution.toRdd.count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
          }
        }
      }
    // per-query sum-of-task-time (ms), accumulated across first pass AND
    // any rerun — the scaling probe reads it as "executor work done"
    val taskTimes = scala.collection.mutable.Map.empty[String, Long]
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val k0 = taskTimeMs.get
      val t0 = System.nanoTime()
      val ok =
        // toRdd materializes the query AS PLANNED — df.count() would let
        // the optimizer prune the very projections/sorts being measured
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val w = (System.nanoTime() - t0) / 1e9
      taskTimes(name) = taskTimes.getOrElse(name, 0L) + (taskTimeMs.get - k0)
      // failed query → -1 so a failure is visible, never a fast time
      if (ok) w else -1.0
    }
    val firstPass = SparkEntry.queries.map { case (name, fn) =>
      name -> timeOne(name, fn)
    }
    // REPEAT PROTOCOL folded into the official artifact (r7/r8 lesson:
    // single-run walls on this box spike 5-25x on byte-identical plans —
    // a12 read 33.9 s in BENCH_r08 and 1.4 s on repeat). Any query whose
    // first-pass wall exceeds the outlier bar is re-run once in the same
    // warm JVM and reported as the min of the two: box-noise spikes
    // collapse back to the plan's real cost, while a genuinely slow
    // query measures slow twice and stays slow in the artifact.
    val okTimes = firstPass.values.filter(_ >= 0).toSeq.sorted
    val median = if (okTimes.isEmpty) 0.0 else okTimes(okTimes.size / 2)
    val bar = math.max(2.5, 3.0 * median)
    // rerun ledger (r14 verdict #7): a memoized stored-index query whose
    // FIRST pass pays the one-time build can re-run warm and report the
    // min — the build cost would silently vanish from the artifact. Keep
    // both walls for every re-run query in target/bench.json so
    // build-vs-probe is always reconstructible (first ≈ build+probe,
    // rerun ≈ probe). Additions-only: stdout line and `queries` values
    // are unchanged.
    val rerunLedger = scala.collection.mutable.Map.empty[String, (Double, Double)]
    val results = firstPass.map { case (name, t) =>
      if (t <= bar) name -> t
      else {
        val t2 = timeOne(name, SparkEntry.queries(name))
        val best = if (t2 < 0) t else math.min(t, t2)
        System.err.println(f"[bench] $name rerun: $t%.2f s -> $t2%.2f s (report ${best}%.2f)")
        rerunLedger(name) = (t, t2)
        name -> best
      }
    }
    def r3(v: Double): String = "%.3f".format(v)
    val total = if (results.nonEmpty) results.values.sum else 0.0
    def mkLine(entries: Seq[(String, Double)], extra: String): String = {
      val qs = entries.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs$extra,"sf":"$sfDir"}"""
    }
    val full = mkLine(results.toSeq, "")
    // The driver captures only the LAST 2000 chars of stdout (measured from
    // BENCH_r03: tail len 2000, head of the full 76-query line clipped →
    // parsed:null). The full map goes to target/bench.json; stdout gets a
    // line guaranteed to fit the tail buffer: if the full line is short
    // enough print it, otherwise print the slowest queries that fit in
    // ~1500 chars (sbt's [success] trailer eats ~80 more) plus counts so
    // the truncation is explicit.
    val budget = 1500
    val line =
      if (full.length <= budget) full
      else {
        val bySlow = results.toSeq.sortBy(-_._2)
        var kept = Vector.empty[(String, Double)]
        var len = mkLine(kept, s""","n_queries":${results.size},"truncated":true""").length
        bySlow.foreach { e =>
          val cost = e._1.length + r3(e._2).length + 4
          if (len + cost <= budget) { kept :+= e; len += cost }
        }
        mkLine(kept, s""","n_queries":${results.size},"truncated":true""")
      }
    // The file always holds the FULL per-query map, one JSON line — plus
    // two additions-only diagnostic maps (r14 verdict #7/#8): `rerun`
    // records both walls of every min-of-two re-run (so a stored-index
    // build cost never silently vanishes), `task_time_ms` the per-query
    // sum of executor task run times (the core-scaling signal sf0.1
    // walls cannot carry). `queries` itself is byte-compatible with
    // every earlier round.
    val rerunJson = rerunLedger.toSeq.sortBy(_._1).map { case (k, (a, b)) =>
      s"\"$k\":{\"first\":${r3(a)},\"rerun\":${r3(b)}}"
    }.mkString("{", ",", "}")
    val taskJson = taskTimes.toSeq.sortBy(_._1).map { case (k, v) =>
      s"\"$k\":$v"
    }.mkString("{", ",", "}")
    val fileLine = full.stripSuffix("}") +
      s""","rerun":$rerunJson,"task_time_ms":$taskJson}"""
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench.json"),
        (fileLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
