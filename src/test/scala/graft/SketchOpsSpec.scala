package graft

import graft.operators.SketchOps
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("k1: HLL distinct lands within its 5% bound on every group") {
    val rows = SketchOps.k1HllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_5pct"),
        s"${r.getAs[String]("event_type")}: HLL outside bound")
      assert(r.getAs[Long]("exact_users") > 0)
    }
  }

  test("k2: quantile sketch within 2% of exact; p50 <= p95") {
    val rows = SketchOps.k2QuantileSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sketch_within_2pct"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95"))
    }
  }

  test("k3: exactly 5 heavy hitters, descending, CMS inside its bound") {
    val rows = SketchOps.k3CmsTopk(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length === 5)
    assert(rows.forall(_._3), "CMS estimate escaped its guarantee")
    val counts = rows.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // cross-check the top entry against a direct filter
    val top = rows.head
    val direct = graft.sources.Tables.events(spark, sf)
      .where($"user_id" === top._1).count()
    assert(direct === top._2)
  }

  test("k4: merged shard sketches estimate the global distinct within bound") {
    val rows = SketchOps.k4SketchUnion(spark, sf)
      .as[(Long, Boolean, Long)].collect()
    assert(rows.length === 1)
    val (exact, ok, nSketches) = rows.head
    assert(nSketches === 4L)
    assert(ok, "merged HLL estimate escaped the 5% bound")
    val direct = graft.sources.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(exact === direct)
    // mergeability: the union of the 4 shard sketches must agree with a
    // single sketch over the undivided column to within sketch error.
    // NOT exact equality: the one-shot path can retain the HIP estimator
    // while a union is always composite-estimator — whether they coincide
    // depends on partition count, so a === here would flake across
    // machines. Both must sit within the 5% band around exact.
    val ev = graft.sources.Tables.events(spark, sf)
    val one = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))"))
      .as[Long].collect()(0)
    val merged = ev.withColumn("shard", pmod($"user_id", lit(4)))
      .groupBy($"shard").agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .as[Long].collect()(0)
    assert(math.abs(merged - exact) <= exact * 0.05 + 1, s"merged=$merged exact=$exact")
    assert(math.abs(one - exact) <= exact * 0.05 + 1, s"one=$one exact=$exact")
  }

  test("k5: full pair matrix, estimates inside the bound, exact counts match a Scala set reference") {
    val rows = SketchOps.k5SourceOverlap(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val nSrc = docs.map(_._1).distinct.length
    assert(rows.length === nSrc * (nSrc - 1) / 2)
    // exact counts against plain Scala string trigram sets (collision-free
    // at fixture scale), the shingles semantics: whole text below 3 tokens
    val sets: Map[String, Set[String]] = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, t) =>
        val w = t.split(" ", -1)
        if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSeq else Seq(t)
      }.toSet
    }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b, "pair matrix must be upper-triangular")
      val (sa, sb) = (sets(a), sets(b))
      assert(r.getAs[Long]("n_a") === sa.size.toLong, s"$a size")
      assert(r.getAs[Long]("n_b") === sb.size.toLong, s"$b size")
      assert(r.getAs[Long]("inter_cnt") === (sa intersect sb).size.toLong, s"$a∩$b")
      assert(r.getAs[Long]("union_cnt") === (sa union sb).size.toLong, s"$a∪$b")
      val m = r.getAs[Long]("matches")
      assert(m >= 0 && m <= SketchOps.K5Channels)
      assert(r.getAs[Boolean]("minhash_within_bound"),
        s"($a,$b): matches=$m inter=${r.getAs[Long]("inter_cnt")} union=${r.getAs[Long]("union_cnt")}")
    }
  }

  test("k5: planted corpus — hand-computed intersections; identical sources agree on every channel") {
    val docs = Seq(
      ("A", "a b c d"),  // trigrams {a b c, b c d}
      ("B", "b c d e"),  // {b c d, c d e}
      ("C", "a b c d"),  // identical to A
      ("D", "x y")       // short-doc fallback: {x y}
    ).toDF("source", "text")
    val got = SketchOps.sourceOverlap(spark, docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size === 6)
    def chk(a: String, b: String, inter: Long, union: Long): Unit = {
      val r = got((a, b))
      assert(r.getAs[Long]("inter_cnt") === inter, s"($a,$b) inter")
      assert(r.getAs[Long]("union_cnt") === union, s"($a,$b) union")
    }
    chk("A", "B", 1, 3); chk("A", "C", 2, 2); chk("B", "C", 1, 3)
    chk("A", "D", 0, 3); chk("B", "D", 0, 3); chk("C", "D", 0, 3)
    // identical gram sets ⇒ identical signatures ⇒ all channels agree
    assert(got(("A", "C")).getAs[Long]("matches") === SketchOps.K5Channels.toLong)
    // disjoint sets can only match on hash ties — the bound must still hold
    assert(got.values.forall(_.getAs[Boolean]("minhash_within_bound")))
  }

  test("k5b: signature-only overlap agrees with k5's matches on every pair; estimate is the exact rational") {
    val docs = Seq(
      ("A", "a b c d"), ("B", "b c d e"), ("C", "a b c d"), ("D", "x y")
    ).toDF("source", "text")
    val audit = SketchOps.sourceOverlap(spark, docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val prod = SketchOps.signatureOverlap(spark, docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(prod.keySet === audit.keySet)
    prod.foreach { case (k, r) =>
      // the deployable half must carry EXACTLY the audit tool's signature
      // agreement — dropping the intersection join may not perturb it
      assert(r.getAs[Long]("matches") === audit(k).getAs[Long]("matches"), s"$k matches")
      assert(r.getAs[Long]("n_a") === audit(k).getAs[Long]("n_a"), s"$k n_a")
      assert(r.getAs[Long]("n_b") === audit(k).getAs[Long]("n_b"), s"$k n_b")
      assert(r.getAs[Long]("jaccard_est_micro") ===
        r.getAs[Long]("matches") * 1000000L / SketchOps.K5Channels, s"$k estimate")
    }
    // identical sources: estimate pegs at exactly 10^6 (J = 1)
    assert(prod(("A", "C")).getAs[Long]("jaccard_est_micro") === 1000000L)
  }

  test("k6: Zipf histogram equals an independent Scala token-frequency recount") {
    val got = SketchOps.k6ZipfHistogram(spark, sf).collect()
      .map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("n_occ"))).toMap
    val freq = collection.mutable.Map.empty[String, Long]
    graft.sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .foreach(_.split(" ", -1).foreach(t => freq(t) = freq.getOrElse(t, 0L) + 1))
    val want = freq.values.groupBy(_.toString.length)
      .map { case (b, fs) => b -> (fs.size.toLong, fs.sum) }
    assert(got === want)
    // mass conservation: Σ n_occ over buckets = total token occurrences
    assert(got.values.map(_._2).sum === freq.values.sum)
    // type conservation: Σ n_types over buckets = vocabulary size
    assert(got.values.map(_._1).sum === freq.size.toLong)
  }

  test("k7: planted curve — repeats add nothing; fixture equals a Scala first-seen replay") {
    import org.apache.spark.sql.functions._
    // 10 docs (deciles are singletons): doc 0 brings 3 new trigrams,
    // doc 1 repeats doc 0 verbatim (0 new), docs 2-9 one new short-doc
    // fallback gram each
    val dir = java.nio.file.Files.createTempDirectory("graft_k7").toString
    val five = "a b c d e" // trigrams: "a b c","b c d","c d e"
    val rows = Seq((0L, five), (1L, five)) ++
      (2L to 9L).map(i => (i, s"uniq$i")) // < 3 words → fallback gram
    rows.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"), lit("s").as("source"),
        length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SketchOps.k7NoveltyCurve(spark, dir).collect()
      .map(r => r.getAs[Int]("decile") ->
        ((r.getAs[Long]("new_grams"), r.getAs[Long]("cum_grams")))).toMap
    assert(got(0) === ((3L, 3L)))
    assert(!got.contains(1), "a verbatim repeat decile adds no gram types")
    (2 to 9).foreach(d => assert(got(d)._1 === 1L, s"decile $d"))
    assert(got(9)._2 === 11L)

    // fixture: equals a Scala first-seen replay; cum is monotone and
    // conserves the vocabulary
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val nd = docs.map(_._1).max + 1
    val firstSeen = collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, t) =>
      val w = t.split(" ")
      val grams =
        if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSeq else Seq(t)
      grams.foreach(g => if (!firstSeen.contains(g)) firstSeen(g) = id)
    }
    val want = firstSeen.values.groupBy(id => ((id * 10) / nd).toInt)
      .view.mapValues(_.size.toLong).toMap
    val fx = SketchOps.k7NoveltyCurve(spark, sf).collect()
      .map(r => r.getAs[Int]("decile") ->
        ((r.getAs[Long]("new_grams"), r.getAs[Long]("cum_grams")))).toMap
    assert(fx.view.mapValues(_._1).toMap === want)
    val cums = fx.toSeq.sortBy(_._1).map(_._2._2)
    assert(cums === cums.sorted)
    assert(cums.last === firstSeen.size.toLong)
  }

  test("k8: planted drift — appeared/vanished languages flagged, signed deltas and means exact") {
    val standing = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L),
      (4L, "de", 40L)).toDF("doc_id", "lang", "n_chars")
    val ingest = Seq((5L, "en", 12L), (6L, "fr", 7L), (7L, "fr", 9L))
      .toDF("doc_id", "lang", "n_chars")
    val got = SketchOps.ingestDriftOf(standing, ingest).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(got.keySet === Set("en", "de", "fr"))
    val en = got("en")
    assert(en.getAs[Long]("standing_share_micro") === 750000L)
    assert(en.getAs[Long]("ingest_share_micro") === 333333L)
    assert(en.getAs[Long]("share_delta_micro") === 333333L - 750000L)
    assert(en.getAs[Long]("standing_mean_len") === 20L)
    assert(en.getAs[Long]("ingest_mean_len") === 12L)
    assert(!en.getAs[Boolean]("only_in_ingest") && !en.getAs[Boolean]("only_in_standing"))
    val de = got("de")
    assert(de.getAs[Boolean]("only_in_standing") && !de.getAs[Boolean]("only_in_ingest"))
    assert(de.getAs[Long]("ingest_docs") === 0L &&
      de.getAs[Long]("ingest_share_micro") === 0L &&
      de.getAs[Long]("ingest_mean_len") === 0L)
    val fr = got("fr")
    assert(fr.getAs[Boolean]("only_in_ingest") && !fr.getAs[Boolean]("only_in_standing"))
    assert(fr.getAs[Long]("ingest_share_micro") === 666666L)
    assert(fr.getAs[Long]("ingest_mean_len") === 8L)
  }

  test("k2b: in exact mode (n <= k) the shard union IS the one-shot sketch IS the exact quantile") {
    // 120 values across 4 shards — far under KllK = 200, so every sketch
    // retains every value and no randomized compaction ever runs:
    // equality is exact, not statistical
    val vals = (0 until 120).map(i => ((i * 37 + 11) % 120).toDouble)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "value")
      .withColumn("shard", pmod($"id", lit(4)))
    import graft.{functions => gf}
    val oneShot = df.agg(gf.kllSketchAgg($"value", SketchOps.KllK).as("sk"))
    val union = df.groupBy($"shard")
      .agg(gf.kllSketchAgg($"value", SketchOps.KllK).as("sk"))
      .agg(gf.kllUnionAgg($"sk", SketchOps.KllK).as("sk"))
    val ranks = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.95)
    def qs(sk: org.apache.spark.sql.DataFrame): Seq[Double] =
      sk.select(ranks.map(r => gf.kllQuantile($"sk", r)): _*)
        .collect().head.toSeq.map(_.asInstanceOf[Double])
    val a = qs(oneShot)
    val b = qs(union)
    assert(a === b, "union must equal the one-shot sketch in exact mode")
    // INCLUSIVE rule at retained-everything: value whose rank ceiling
    // covers r — replay against the sorted data
    val sorted = vals.sorted
    val want = ranks.map(r => sorted(math.ceil(r * vals.size).toInt - 1))
    assert(a === want, "exact-mode quantiles are the true order statistics")
  }

  test("k2b: at compaction sizes the union estimate stays inside the rank bracket; fixture booleans hold") {
    // 40k values per shard — deep into compaction, the randomized
    // regime: the contract is the published rank bound, at 3x margin
    val n = 160000
    val df = (0 until n).map { i =>
      (i.toLong, ((i.toLong * 48271) % 99991).toDouble)
    }.toDF("id", "value").withColumn("shard", pmod($"id", lit(4)))
    import graft.{functions => gf}
    val sk = df.groupBy($"shard")
      .agg(gf.kllSketchAgg($"value", SketchOps.KllK).as("sk"))
      .agg(gf.kllUnionAgg($"sk", SketchOps.KllK).as("sk"))
    val Seq(sp50, sp95) = sk
      .select(gf.kllQuantile($"sk", 0.5), gf.kllQuantile($"sk", 0.95))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toSeq
    val sorted = (0 until n).map(i => ((i.toLong * 48271) % 99991).toDouble).sorted
    def rankOf(v: Double): Double =
      sorted.count(_ <= v).toDouble / n
    assert(math.abs(rankOf(sp50) - 0.5) <= SketchOps.KllRankEps,
      s"p50 estimate $sp50 at rank ${rankOf(sp50)}")
    assert(math.abs(rankOf(sp95) - 0.95) <= SketchOps.KllRankEps,
      s"p95 estimate $sp95 at rank ${rankOf(sp95)}")
    // the registered panel's booleans must hold on the fixture
    val got = SketchOps.k2bQuantileUnion(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("kll_p50_within_rank_eps"), r.toString)
      assert(r.getAs[Boolean]("kll_p95_within_rank_eps"), r.toString)
      assert(r.getAs[Long]("n_sketches") >= 1L)
    }
  }

  test("k8: the registered panel equals an independent replay over the d8 slices") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"n_chars")
      .as[(Long, String, Long)].collect()
    val (ing, st) = docs.partition(_._1 % 10 == 7)
    def agg(xs: Array[(Long, String, Long)]) =
      xs.groupBy(_._2).map { case (l, ys) =>
        l -> (ys.length.toLong, ys.map(_._3).sum) }
    val sa = agg(st); val ia = agg(ing)
    val stt = sa.values.map(_._1).sum; val itt = ia.values.map(_._1).sum
    val want = (sa.keySet ++ ia.keySet).map { l =>
      val (sd, sc) = sa.getOrElse(l, (0L, 0L))
      val (id, ic) = ia.getOrElse(l, (0L, 0L))
      val ss = if (stt == 0) 0L else sd * 1000000L / stt
      val is = if (itt == 0) 0L else id * 1000000L / itt
      l -> ((sd, id, ss, is, is - ss,
        if (sd == 0) 0L else sc / sd, if (id == 0) 0L else ic / id,
        sd == 0L, id == 0L))
    }.toMap
    val got = SketchOps.k8IngestDrift(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("standing_docs"), r.getAs[Long]("ingest_docs"),
          r.getAs[Long]("standing_share_micro"),
          r.getAs[Long]("ingest_share_micro"),
          r.getAs[Long]("share_delta_micro"),
          r.getAs[Long]("standing_mean_len"), r.getAs[Long]("ingest_mean_len"),
          r.getAs[Boolean]("only_in_ingest"),
          r.getAs[Boolean]("only_in_standing")))).toMap
    assert(got === want)
    // both slices are populated on this corpus, so shares are real
    assert(got.values.exists(v => v._3 > 0 && v._4 > 0))
  }
}
