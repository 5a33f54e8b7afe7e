package graft

import graft.operators.SamplingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame): Set[(String, Long, Int)] =
    df.select($"source", $"doc_id", $"rnk").as[(String, Long, Int)].collect().toSet

  test("p1: two-stage top-k equals the one-window formulation") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val naive = SamplingOps.topkPerKey(docs, 5)
    // one-window reference: global rank per source directly
    val rk = conv(substring(md5(concat(lit("p1:"), $"doc_id".cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val ref = docs.select($"doc_id", $"source", rk.as("rk"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"source").orderBy($"rk", $"doc_id")).cast("int"))
      .where($"rnk" <= 5)
      .select($"source", $"doc_id", $"rnk")
    assert(canon(naive) === canon(ref))
    assert(canon(naive).nonEmpty)
  }

  test("p1: result is invariant under adversarial physical partitioning") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val base = canon(SamplingOps.topkPerKey(docs, 7))
    // skew-hostile layouts: everything in 1 partition, scattered over 13,
    // and range-clustered by source (whole key groups in one partition)
    assert(canon(SamplingOps.topkPerKey(docs.repartition(1), 7)) === base)
    assert(canon(SamplingOps.topkPerKey(docs.repartition(13), 7)) === base)
    assert(canon(SamplingOps.topkPerKey(docs.repartition($"source"), 7)) === base)
  }

  test("p1: per-source size = min(k, source size); ranks are 1..n") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val sizes = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val got = SamplingOps.p1SampleTopk(spark, sf)
      .groupBy($"source").agg(count(lit(1)).as("n"), max($"rnk").as("mx"),
        min($"rnk").as("mn"))
      .as[(String, Long, Int, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, n, mx, mn) =>
      assert(n === math.min(SamplingOps.TopK.toLong, sizes(src)))
      assert(mn === 1 && mx.toLong === n) // dense 1..n ranks
    }
  }

  test("p1: scan reads only the id/routing columns (text pruned away)") {
    val plan = SamplingOps.p1SampleTopk(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("text"), "p1 must never read the text column")
  }

  test("p2: sampled set is exactly the bucket-threshold filter (no misses, no extras)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val bucket = pmod(
      conv(substring(md5(concat(lit("p2:"), $"doc_id".cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(1000))
    val rate = when($"lang" === "en", 100).when($"lang" === "zh", 500).otherwise(300)
    val want = docs.select($"doc_id", $"lang", bucket.as("b"), rate.as("r"))
      .where($"b" < $"r").select($"doc_id").as[Long].collect().toSet
    val got = SamplingOps.p2StratifiedSample(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("p3: mix plan — binding language at max epochs, shares hit targets, feasibility") {
    val rows = SamplingOps.p3DatasetMix(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSet === Set("en", "de", "es", "fr", "zh"))
    val total = rows.map(_._4).sum
    rows.foreach { case (lang, tokens, w, need, factor) =>
      // need_l / S = w_l: the mix hits its target share exactly
      assert(math.abs(need / total - w) < 1e-12, s"$lang share")
      // no language exceeds the repeat budget; the plan stays feasible
      assert(factor <= SamplingOps.MaxEpochs + 1e-12, s"$lang factor=$factor")
      assert(factor === need / tokens)
    }
    // exactly the binding language(s) sit AT the budget
    assert(rows.exists(r => math.abs(r._5 - SamplingOps.MaxEpochs) < 1e-9),
      s"some language must bind the total: ${rows.toSeq}")
  }

  test("p3: the plan arithmetic holds under the BPE token counter (tokenizer-accurate supplies)") {
    import graft.operators.TextOps
    val bpe = graft.functions.bpeTokenCount(
      org.apache.spark.sql.functions.col("text"), TextOps.BpeVocab)
    val rows = SamplingOps.p3MixPlan(spark, sf, bpe)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSet === Set("en", "de", "es", "fr", "zh"))
    val total = rows.map(_._4).sum
    rows.foreach { case (lang, tokens, w, need, factor) =>
      assert(math.abs(need / total - w) < 1e-12, s"$lang share")
      assert(factor <= SamplingOps.MaxEpochs + 1e-12, s"$lang factor=$factor")
      assert(factor === need / tokens)
    }
    assert(rows.exists(r => math.abs(r._5 - SamplingOps.MaxEpochs) < 1e-9),
      s"some language must bind the total: ${rows.toSeq}")
    // supplies are the REAL greedy-subword counts: strictly above the
    // whitespace proxy's on every language (merge-only vocab splits)
    val ws = SamplingOps.p3DatasetMix(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    rows.foreach { case (lang, tokens, _, _, _) =>
      assert(tokens > ws(lang), s"$lang: bpe=$tokens <= ws=${ws(lang)}")
    }
  }

  test("p3: every corpus language carries a mix weight (the explicit filter drops nothing)") {
    val corpusLangs = graft.sources.Tables.documents(spark, sf)
      .select($"lang").distinct().as[String].collect().toSet
    val weighted = SamplingOps.MixWeights.map(_._1).toSet
    assert(corpusLangs.subsetOf(weighted),
      s"unweighted corpus languages would be excluded from the mix plan: " +
        s"${corpusLangs -- weighted}")
  }

  test("p4: pack assignment equals a sequential Scala re-pack per shard") {
    val rows = SamplingOps.p4PackSequences(spark, sf)
      .select($"doc_id", $"shard", $"n_tokens", $"pack_id")
      .as[(Long, Int, Int, Int)].collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    // the engine's packing must equal concatenate-then-chunk replayed
    // sequentially: within a shard, walk docs in doc_id order keeping a
    // running token offset; a doc's pack is floor(startOffset / budget)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var offset = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, pack) =>
        assert(pack === (offset / SamplingOps.PackBudget).toInt,
          s"doc $id: got pack $pack at offset $offset")
        offset += n
      }
    }
    // shards actually spread (salted hash, not one hot shard)
    val shards = rows.map(_._2).toSet
    assert(shards.size > SamplingOps.PackShards / 2)
    assert(shards.forall(s => s >= 0 && s < SamplingOps.PackShards))
  }

  test("p5: copies realize p3's plan — floor/ceil of the repeat factor, expected tokens on target") {
    val plan = SamplingOps.p3DatasetMix(spark, sf)
      .select($"lang", $"tokens", $"need_tokens", $"repeat_factor")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val rows = SamplingOps.p5MixMaterialize(spark, sf)
      .select($"doc_id", $"lang", $"n_copies")
      .as[(Long, String, Long)].collect()
    assert(rows.nonEmpty)
    // every weighted-language doc present exactly once
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
      .filter(r => plan.contains(r._2))
    assert(rows.map(_._1).sorted.toSeq === corpus.map(_._1).sorted.toSeq)
    rows.foreach { case (id, lang, copies) =>
      val rf = plan(lang)._3
      assert(copies == rf.toLong || copies == rf.toLong + 1,
        s"doc $id: $copies copies for rf $rf")
    }
    // realized tokens per language track the plan's need_tokens: the draw
    // is Bernoulli per doc, so allow a generous sampling tolerance
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("t"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val realized = docs.map(d => toks(d._1) * d._3).sum.toDouble
      val need = plan(lang)._2
      assert(math.abs(realized - need) / need < 0.25,
        s"$lang: realized $realized vs need $need")
    }
  }

  test("p4/p5 plan audits: packing shuffles once on shard; materialization never shuffles") {
    // p4: the ONLY exchange is the per-shard window — one hashpartitioning
    // on shard; text must not reach it (pruned at the scan)
    val p4Plan = SamplingOps.p4PackSequences(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p4Plan).length === 1,
      s"expected exactly one shard exchange in:\n$p4Plan")
    // the plan prints top-down: everything ABOVE the Exchange token is a
    // parent consuming its output — none of it may reference text, which
    // proves the shuffled row is (doc_id, n_tokens, shard) only
    assert(!p4Plan.split("Exchange")(0).contains("text#"),
      "text column must not cross the shard exchange")
    // p5: plan join broadcasts; the doc-side map is exchange-free (the
    // only exchanges allowed are inside the tiny plan-side aggregate)
    val p5 = SamplingOps.p5MixMaterialize(spark, sf)
    p5.write.format("noop").mode("overwrite").save()
    val p5Plan = p5.queryExecution.executedPlan.toString
    assert(p5Plan.contains("BroadcastHashJoin") || p5Plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast plan join in:\n$p5Plan")
  }

  test("p2: independent of the t6 split and of p1 (different salt channels)") {
    // distinct salts => the p2 sample is not a subset/superset artifact of
    // the p1 ranks: check the two draws disagree on some docs both ways
    val p1Ids = SamplingOps.p1SampleTopk(spark, sf).select($"doc_id").as[Long].collect().toSet
    val p2Ids = SamplingOps.p2StratifiedSample(spark, sf).select($"doc_id").as[Long].collect().toSet
    assert((p1Ids -- p2Ids).nonEmpty)
    assert((p2Ids -- p1Ids).nonEmpty)
  }

  test("p6: importance up-weights reference-like docs on a planted separable corpus") {
    // reference slice (doc_id % 20 == 0) speaks reference vocabulary,
    // pool slice (% 20 == 1) speaks pool vocabulary; unlabeled docs made
    // of pure reference vocab must carry weight > neutral > pure pool
    // vocab (DSIR's defining ranking: importance ∝ p_ref / p_pool).
    val refV = Seq("crisp", "clean", "prose", "cited")
    val poolV = Seq("spam", "junk", "noise", "clickbait")
    val docs = (0 until 120).map { i =>
      val id = i.toLong
      val t =
        if (id % 20 == 0) Seq.tabulate(12)(j => refV(j % 4)).mkString(" ")
        else if (id % 20 == 1) Seq.tabulate(12)(j => poolV(j % 4)).mkString(" ")
        else if (id % 2 == 0) refV.mkString(" ")
        else poolV.mkString(" ")
      (id, t, "en", "s", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val rrows = SamplingOps.dsirRatiosOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dense = Array.tabulate(graft.operators.TextOps.ClfBuckets)(b =>
      rrows.getOrElse(b.toLong, SamplingOps.DsirMicro))
    val w = docs
      .select($"doc_id", size(split($"text", " ")).as("n"),
        SamplingOps.dsirSumExpr($"text", dense).as("rs"))
      .select($"doc_id", expr("rs div n").as("w"))
      .as[(Long, Long)].collect().toMap
    (0 until 120).map(_.toLong).filter(_ % 20 >= 2).foreach { id =>
      if (id % 2 == 0)
        assert(w(id) > SamplingOps.DsirMicro, s"doc $id: ref-vocab weight must exceed neutral")
      else
        assert(w(id) < SamplingOps.DsirMicro, s"doc $id: pool-vocab weight must undercut neutral")
    }
  }

  test("p6: ratios and scores replay in independent Scala; accept is the salted-hash rule; unseen vocab is neutral") {
    def h60(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val D = graft.operators.TextOps.ClfBuckets
    val M = SamplingOps.DsirMicro
    val refV = Seq("alpha", "beta", "gamma")
    val poolV = Seq("delta", "epsilon", "zeta")
    val raw = (0 until 60).map { i =>
      val id = i.toLong
      val t =
        if (id % 20 == 0) (refV ++ refV).mkString(" ")
        else if (id % 20 == 1) (poolV ++ poolV).mkString(" ")
        else if (id % 3 == 2) "omicron sigma tau" // fully unseen vocab
        else (refV ++ poolV ++ Seq("theta")).mkString(" ")
      (id, t)
    }
    val docs = raw.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // --- independent replay of the trainer ---
    val cp = collection.mutable.Map.empty[Long, Long]
    val cn = collection.mutable.Map.empty[Long, Long]
    raw.foreach { case (id, t) =>
      if (id % 20 == 0) t.split(" ", -1).foreach(tok =>
        cp(h60(tok) % D) = cp.getOrElse(h60(tok) % D, 0L) + 1)
      if (id % 20 == 1) t.split(" ", -1).foreach(tok =>
        cn(h60(tok) % D) = cn.getOrElse(h60(tok) % D, 0L) + 1)
    }
    val (tp, tn) = (cp.values.sum, cn.values.sum)
    val wantR = (cp.keySet ++ cn.keySet).map { b =>
      val fr = cp.getOrElse(b, 0L) * M / tp + 1
      val fq = cn.getOrElse(b, 0L) * M / tn + 1
      b -> fr * M / fq
    }.toMap
    val gotR = SamplingOps.dsirRatiosOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotR === wantR)
    // --- independent replay of the scorer + the neutral default ---
    val dense = Array.tabulate(D)(b => wantR.getOrElse(b.toLong, M))
    val gotW = docs
      .select($"doc_id", size(split($"text", " ")).as("n"),
        SamplingOps.dsirSumExpr($"text", dense).as("rs"))
      .select($"doc_id", expr("rs div n").as("w"))
      .as[(Long, Long)].collect().toMap
    raw.foreach { case (id, t) =>
      val toks = t.split(" ", -1)
      val want = toks.map(tok => dense((h60(tok) % D).toInt)).sum / toks.length
      assert(gotW(id) === want, s"doc $id weight")
      if (id % 20 >= 2 && id % 3 == 2)
        assert(gotW(id) === M, s"doc $id: fully-unseen vocab must be exactly neutral")
    }
    // --- registered fixture query: accept rule + warm stability ---
    val a = SamplingOps.p6DsirResample(spark, sf).collect()
    assert(a.length > 0)
    a.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val wMicro = r.getAs[Long]("dsir_weight_micro")
      val draw = h60("p6:" + id) % M
      assert(r.getAs[Boolean]("accept") === (draw < math.min(wMicro, M)),
        s"doc $id accept")
      assert(r.getAs[Int]("n_toks") > 0)
    }
    // second call loads the persisted model (no retrain) — identical rows
    val b = SamplingOps.p6DsirResample(spark, sf).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
  }

  test("p7: planted saturation — over-demanded source caps at 4 epochs with an explicit deficit") {
    import org.apache.spark.sql.Row
    val dir = java.nio.file.Files.createTempDirectory("graft_p7").toString
    // src3 (raw weight 1+3%4=4): tiny supply, big demand → saturates.
    // src0 (raw 1): large supply → under-demanded, never capped.
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, mk(10), "en", "src3", 0L),   // src3 supply: 10 tokens
      (2L, mk(100), "en", "src0", 0L),  // src0 supply: 200 tokens
      (3L, mk(100), "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // T=210, B=420, W=1+4=5. src3: want=420*4/5=336 > 4*10=40 → grant 40,
    // deficit 296, epochs=4.0. src0: want=420*1/5=84 <= 800 → grant 84.
    val got = SamplingOps.p7EpochPlan(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s3 = got("src3")
    assert(s3.getAs[Long]("tokens") === 10L)
    assert(s3.getAs[Long]("want_tokens") === 336L)
    assert(s3.getAs[Boolean]("capped") === true)
    assert(s3.getAs[Long]("grant_tokens") === 40L)
    assert(s3.getAs[Long]("deficit_tokens") === 296L)
    assert(s3.getAs[Long]("epochs_micro") === 4000000L)
    val s0 = got("src0")
    assert(s0.getAs[Long]("want_tokens") === 84L)
    assert(s0.getAs[Boolean]("capped") === false)
    assert(s0.getAs[Long]("deficit_tokens") === 0L)
    assert(s0.getAs[Long]("epochs_micro") === 420000L) // 84/200 epochs
  }

  test("p7: fixture plan equals an independent Scala replay; invariants hold") {
    val sup = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2.split(" ").length.toLong).sum).toMap
    val raw = sup.keys.map(s =>
      s -> (1L + "\\d+".r.findFirstIn(s).get.toLong % 4L)).toMap
    val tt = sup.values.sum
    val ww = raw.values.sum
    val rows = SamplingOps.p7EpochPlan(spark, sf).collect()
    assert(rows.map(_.getAs[String]("source")).toSet === sup.keySet)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val tokens = sup(src)
      val want = 2L * tt * raw(src) / ww
      val grant = math.min(want, 4L * tokens)
      assert(r.getAs[Long]("tokens") === tokens, src)
      assert(r.getAs[Long]("weight_micro") === raw(src) * 1000000L / ww, src)
      assert(r.getAs[Long]("want_tokens") === want, src)
      assert(r.getAs[Long]("grant_tokens") === grant, src)
      assert(r.getAs[Boolean]("capped") === (want > 4L * tokens), src)
      assert(r.getAs[Long]("deficit_tokens") === want - grant, src)
      assert(r.getAs[Long]("epochs_micro") === grant * 1000000L / tokens, src)
      assert(r.getAs[Long]("epochs_micro") <= 4000000L, src)
    }
    // the grant never over-spends the budget
    assert(rows.map(_.getAs[Long]("grant_tokens")).sum <= 2L * tt)
  }

  test("p8: the curriculum coordinate replays independently; stages follow tiers; seqs are dense per shard") {
    def h60(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val tier = graft.operators.TextOps.t17PplBuckets(spark, sf)
      .select($"doc_id", $"ppl_bucket").as[(Long, String)].collect().toMap
    val want = tier.toSeq.map { case (id, b) =>
      val stage = b match { case "tail" => 0; case "middle" => 1; case _ => 2 }
      val hk = h60(s"p8:$id")
      (id, stage, (hk % SamplingOps.PackShards).toInt, hk)
    }.groupBy(t => (t._2, t._3)).flatMap { case (_, xs) =>
      xs.sortBy(t => (t._4, t._1)).zipWithIndex.map { case (t, i) =>
        t._1 -> ((t._2, t._3, i + 1L))
      }
    }
    val got = SamplingOps.p8CurriculumOrder(spark, sf)
      .as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === tier.keySet, "every scored doc gets a coordinate")
    assert(got === want)
    // seq is dense 1..n within each (stage, shard) — a trainer can walk it
    got.toSeq.groupBy(t => (t._2._1, t._2._2)).values.foreach { xs =>
      assert(xs.map(_._2._3).sorted === (1L to xs.length).toSeq)
    }
    // the curriculum realizes all three stages on this corpus
    assert(got.values.map(_._1).toSet === Set(0, 1, 2))
    // hash shuffle, not ingest order: within some shard, doc_ids are
    // NOT monotone in seq
    assert(got.toSeq.groupBy(t => (t._2._1, t._2._2)).values.exists { xs =>
      val inSeq = xs.sortBy(_._2._3).map(_._1)
      inSeq != inSeq.sorted
    })
  }

  test("p9: α-weights equal an independent replay; temperature compresses the mix") {
    val sup = graft.sources.Tables.documents(spark, sf)
      .select($"lang", $"text").as[(String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2.split(" ").length.toLong).sum).toMap
    val want = SamplingOps.alphaWeightsMicro(sup.toSeq).toMap
    // the trainer itself replays: independent pow over sorted langs
    val total = sup.values.sum.toDouble
    val pw = sup.toSeq.sortBy(_._1)
      .map { case (l, t) => l -> StrictMath.pow(t / total, 0.3) }
    val z = pw.map(_._2).sum
    pw.foreach { case (l, w) =>
      assert(want(l) === math.max(1L, math.round(w / z * 1000000.0)), l)
    }
    val rows = SamplingOps.p9TemperatureMix(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(rows.keySet === sup.keySet)
    rows.foreach { case (l, r) =>
      assert(r.getAs[Long]("tokens") === sup(l), l)
      assert(r.getAs[Long]("weight_micro") === want(l), l)
      assert(r.getAs[Long]("share_micro") === sup(l) * 1000000L / sup.values.sum, l)
    }
    // normalization: micro weights sum to 10⁶ within one rounding per lang
    val wsum = rows.values.map(_.getAs[Long]("weight_micro")).sum
    assert(math.abs(wsum - 1000000L) <= sup.size.toLong)
    // α < 1 compresses: the weight spread is strictly tighter than the
    // share spread (q-ratio = (p-ratio)^α), and ranking is preserved
    val byTok = rows.values.toSeq.sortBy(_.getAs[Long]("tokens"))
    val wts = byTok.map(_.getAs[Long]("weight_micro"))
    assert(wts === wts.sorted, "order preservation")
    val shr = byTok.map(_.getAs[Long]("share_micro"))
    if (shr.last > shr.head)
      assert(wts.last.toDouble / wts.head < shr.last.toDouble / shr.head)
    // the binding language trains at ~MaxEpochs; nothing exceeds it
    val reps = rows.values.map(_.getAs[Double]("repeat_factor"))
    assert(reps.forall(_ <= 4.0 + 1e-9))
    assert(reps.exists(r => math.abs(r - 4.0) < 1e-9))
  }

  test("p9: α-weight trainer properties over 200 seeded random supplies") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val k = 2 + rnd.nextInt(8)
      val counts = (0 until k).map(i =>
        s"l$i" -> (1L + rnd.nextInt(1000000)))
      val w = SamplingOps.alphaWeightsMicro(counts).toMap
      // normalization within one rounding per language
      assert(math.abs(w.values.sum - 1000000L) <= k.toLong)
      // order preservation: more tokens never means less weight
      counts.sortBy(_._2).map(c => w(c._1)).sliding(2).foreach {
        case Seq(a, b) => assert(a <= b); case _ => ()
      }
      // temperature compresses: max/min weight ratio never exceeds the
      // share ratio (q-ratio = p-ratio^0.3 < p-ratio for ratio > 1)
      val (mn, mx) = (counts.map(_._2).min, counts.map(_._2).max)
      if (mx > mn) {
        val (wn, wx) = (w.values.min, w.values.max)
        assert(wx.toDouble / wn <= mx.toDouble / mn + 1e-6)
      }
      // scale invariance: shares unchanged ⇒ identical micro weights
      assert(SamplingOps.alphaWeightsMicro(
        counts.map { case (l, t) => l -> t * 7 }).toMap === w)
      // permutation invariance: input order never matters
      assert(SamplingOps.alphaWeightsMicro(rnd.shuffle(counts)).toMap === w)
    }
  }

  test("p9: planted skewed corpus — the rare language is up-weighted, the dominant one down") {
    val dir = java.nio.file.Files.createTempDirectory("graft_p9").toString
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    // en: 900 tokens, zh: 100 → shares (0.9, 0.1); p^0.3 = (0.969, 0.501),
    // Z = 1.470 → weights ≈ (0.659, 0.341) — zh's 10% of tokens earns
    // ~34% of the mix (weight_micro ≈ 340,914)
    ((1L to 9L).map(i => (i, mk(100), "en", "src0", 0L)) :+
      ((10L, mk(100), "zh", "src1", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SamplingOps.p9TemperatureMix(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = got("en"); val zh = got("zh")
    assert(en.getAs[Long]("share_micro") === 900000L)
    assert(zh.getAs[Long]("share_micro") === 100000L)
    // up/down in the right directions, strictly between share and uniform
    assert(zh.getAs[Long]("weight_micro") > 100000L)
    assert(zh.getAs[Long]("weight_micro") < 500000L)
    assert(en.getAs[Long]("weight_micro") < 900000L)
    assert(en.getAs[Long]("weight_micro") > 500000L)
    // exact replay of the spliced constants
    val want = SamplingOps.alphaWeightsMicro(Seq("en" -> 900L, "zh" -> 100L)).toMap
    assert(en.getAs[Long]("weight_micro") === want("en"))
    assert(zh.getAs[Long]("weight_micro") === want("zh"))
    // zh is the binding language (its weight demands the most repeats):
    // rf_zh = 4.0, and en is drawn well under its supply cap
    assert(math.abs(zh.getAs[Double]("repeat_factor") - 4.0) < 1e-9)
    assert(en.getAs[Double]("repeat_factor") < 4.0)
  }

  test("p10: BFD kernel — TIGHTEST fitting bin wins (not the first), ties to the lowest index, oversized docs open lone bins") {
    // hand-sized: budget 512
    val got = SamplingOps.bfdAssign(Iterator(
      (1L, 600), // oversized: own bin 0 (rem −88, never fits another)
      (2L, 500), // bin 1 (rem 12)
      (3L, 300), // fits nothing (−88, 12) → bin 2 (rem 212)
      (4L, 205), // only bin 2 fits → bin 2 (rem 7)
      (5L, 7),   // fits bin 1 (12) AND bin 2 (7): BEST fit takes the
                 // tighter bin 2 (a first-fit fold would take bin 1 —
                 // the step that distinguishes the two policies)
      (6L, 6))   // bin 2 now full (rem 0) → bin 1 (rem 12 → 6)
      .map(identity)).toSeq
    assert(got === Seq((1L, 600, 0), (2L, 500, 1), (3L, 300, 2),
      (4L, 205, 2), (5L, 7, 2), (6L, 6, 1)))
    // equal minimal remainders: the FIRST-opened bin wins (determinism)
    val tie = SamplingOps.bfdAssign(Iterator(
      (1L, 505), (2L, 505), (3L, 7))).toSeq
    assert(tie === Seq((1L, 505, 0), (2L, 505, 1), (3L, 7, 0)))
  }

  test("p10: fixture packing — bins never exceed budget, output equals a driver BFD replay, truncations strictly fewer than p4 geometry") {
    val rows = SamplingOps.p10BestFitPack(spark, sf)
      .as[(Long, Int, Int, Int)].collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs)

    // 1. no bin over budget (no fixture doc exceeds it)
    val fills = rows.groupBy(r => (r._2, r._4)).view.mapValues(_.map(_._3).sum)
    assert(fills.values.forall(_ <= SamplingOps.PackBudget),
      s"overfull bin: ${fills.maxBy(_._2)}")

    // 2. deterministic replay: per shard, sort (n desc, id) and re-fold
    val byShard = rows.groupBy(_._2)
    byShard.foreach { case (shard, rs) =>
      val sorted = rs.sortBy(r => (-r._3, r._1)).map(r => (r._1, r._3))
      val replay = SamplingOps.bfdAssign(sorted.iterator).toSeq
      val want = replay.map { case (id, n, bin) => (id, shard, n, bin) }
      assert(rs.sortBy(r => (-r._3, r._1)).toSeq === want, s"shard $shard")
    }

    // 3. Ding et al.'s claim on this corpus: p4's concatenate-then-chunk
    // geometry over the SAME sharding truncates docs at pack
    // boundaries; p10 truncates only docs larger than the budget (none
    // here)
    val b = SamplingOps.PackBudget
    val p4Truncated = byShard.values.map { rs =>
      var cum = 0L
      rs.sortBy(_._1).count { r =>
        val start = cum; cum += r._3
        (start / b) != ((cum - 1) / b) // first and last token in
                                       // different chunks → cut
      }
    }.sum
    val p10Truncated = rows.count(_._3 > b)
    assert(p10Truncated === 0)
    assert(p4Truncated > 0, "fixture must exercise the p4 truncation mode")
    assert(p10Truncated < p4Truncated,
      s"p10 must truncate fewer docs: p4=$p4Truncated p10=$p10Truncated")
  }

  test("p10: exactly one exchange (the per-shard group) — text never shuffles") {
    val plan = SamplingOps.p10BestFitPack(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1,
      s"p10 should shuffle only the shard group:\n$plan")
    // the plan prints parents above children: everything ABOVE the
    // Exchange (the post-shuffle side) must be id-width — `text` may
    // appear only in the narrow pre-shuffle projection below it
    assert(!plan.split("Exchange")(0).contains("text#"),
      s"the text column must be pruned before the exchange:\n$plan")
  }
}
