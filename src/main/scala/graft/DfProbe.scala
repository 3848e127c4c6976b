package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (r8): time the full q26 df-capped n-gram Jaccard at a
  * scaled dir, min-of-N. `runMain graft.DfProbe <dir> [reps]`.
  * Session knobs mirror Bench (SPARK_GRAFT_CPUS / _BROADCAST_THRESHOLD)
  * so probe timings stay comparable to bench numbers on any host. */
object DfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    if (args.contains("stages")) {
      // Stage-cost decomposition for the q26 pipeline: where do the
      // seconds actually go at scale — the tokenize+explode scan, the
      // fixed-width df count (string vs hashed-long key), or the wide
      // posting-list aggregate?
      import graft.functions.TextFunctions._
      def sh = docs.select(col("doc_id").as("id"), tokens(col("text")).as("__tk"))
        .select(col("id"), explode(shinglesOfTokens(col("__tk"), 3)).as("s"))
      def leg(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          mk.write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"STAGE $name%-14s min ${ts.min}%8.2f s")
      }
      if (args.contains("dfdist")) {
        val agg = sh.select(xxhash64(col("s")).as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
        val r = agg.agg(
          count(lit(1)).as("groups"),
          sum(col("df")).as("rows"),
          sum(when(col("df") >= 2, 1)).as("g_ge2"),
          sum(when(col("df").between(2, 100), 1)).as("g_keep"),
          sum(when(col("df") > 100, 1)).as("g_over"),
          sum(when(col("df").between(2, 100), col("df"))).as("rows_keep"),
          sum(when(col("df") > 100, col("df"))).as("rows_over")).head()
        println(s"DFDIST $r")
        spark.stop(); return
      }
      if (args.contains("nsh")) {
        def hsFrame = docs.select(col("doc_id").as("id"),
            tokens(col("text")).as("__tk"))
          .select(col("id"), shinglesOfTokens(col("__tk"), 3).as("hs"))
        val a = hsFrame.select(col("id"), size(col("hs")).as("n_sh"),
          explode(col("hs")).as("s"))
        val b = hsFrame.select(col("id"),
            explode(transform(col("hs"),
              x => struct(x.as("s"), size(col("hs")).as("n_sh")))).as("e"))
          .select(col("id"), col("e.s").as("s"), col("e.n_sh").as("n_sh"))
        println("== PLAN A =="); a.explain()
        println("== PLAN B =="); b.explain()
        leg("nsh_a_sizecol")(a)
        leg("nsh_b_struct")(b)
        spark.stop(); return
      }
      // r10 native legs: one-pass ngram_shingles scan, primitive-buffer
      // posting aggregate, codegen'd pair Generator — each against its
      // r9 declarative counterpart below.
      graft.plans.GraftExtensions.register(spark)
      def shN = docs.select(col("doc_id").as("id"),
        explode(call_function("ngram_shingles", col("text"), lit(3))).as("s"))
      def postingNat = shN.groupBy(col("s"))
        .agg(call_function("sorted_longs_agg", col("id")).as("ids"))
      leg("explode_nat")(shN)
      leg("posting_nat")(postingNat)
      leg("iuc_gen_nat")(postingNat
        .where(size(col("ids")).between(2, 100))
        .select(call_function("pairs_of_sorted", col("ids")).as(Seq("d1", "d2")))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("i_uc")))
      leg("explode")(sh)
      leg("dfcount_str")(sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .where(col("df") >= 2))
      leg("dfcount_hash")(sh.select(xxhash64(col("s")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("df")).where(col("df") >= 2))
      leg("posting_all")(sh.groupBy(col("s"))
        .agg(array_sort(collect_list(col("id"))).as("ids")))
      def postingUc = sh.groupBy(col("s"))
        .agg(array_sort(collect_list(col("id"))).as("ids"))
        .where(size(col("ids")).between(2, 100))
      leg("iuc_pairs")(postingUc.select(explode(flatten(
          transform(col("ids"), (x, i) =>
            transform(slice(col("ids"), i + lit(2), size(col("ids"))),
              y => struct(x.as("d1"), y.as("d2")))))).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("i_uc")))
      // Same pair stage via two codegen'd Generates (posexplode +
      // explode-of-slice) instead of the interpreted HOF chain
      // (transform/flatten are CodegenFallback).
      leg("iuc_gen2")(postingUc
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "d1")))
        .select(col("d1"), explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")))).as("d2"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("i_uc")))
      leg("explode_cached") {
        val sets = docs.select(col("doc_id").as("id"),
            tokens(col("text")).as("__tk"))
          .select(col("id"), shinglesOfTokens(col("__tk"), 3).as("hs"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sets.count()
        val out = sets.select(col("id"), explode(col("hs")).as("s"))
        out.write.mode("overwrite").format("noop").save()
        sets.unpersist(false)
        out.limit(0)
      }
      spark.stop(); return
    }
    if (args.contains("ab")) {
      // r14 size-cut A/B: interleaved cut/uncut legs in ONE JVM (the
      // only comparison this host's tide allows), full q26 pipeline,
      // min-of-reps per form, identical pair counts asserted.
      var (cCut, cUncut) = (-1L, -1L)
      def leg(cut: Boolean): Double = {
        val t0 = System.nanoTime()
        val c = operators.Dedup.ngramJaccardPairs(
          docs, col("doc_id"), col("text"), 3, 0.5,
          maxShingleDf = Some(100), sizeCut = cut).count()
        if (cut) cCut = c else cUncut = c
        (System.nanoTime() - t0) / 1e9
      }
      val ts = (1 to reps).map { i =>
        val a = leg(cut = true); val b = leg(cut = false)
        println(f"AB round $i: cut $a%8.2f s  uncut $b%8.2f s")
        (a, b)
      }
      require(cCut == cUncut, s"pair counts diverge: $cCut vs $cUncut")
      println(f"AB MIN cut ${ts.map(_._1).min}%8.2f s  " +
        f"uncut ${ts.map(_._2).min}%8.2f s  pairs $cCut")
      spark.stop(); return
    }
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val c = operators.Dedup.ngramJaccardPairs(
        docs, col("doc_id"), col("text"), 3, 0.5, maxShingleDf = Some(100)).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"RUN $s%8.2f s  -> $c pairs")
      s
    }
    println(f"MIN ${times.min}%8.2f s")
    spark.stop()
  }
}
