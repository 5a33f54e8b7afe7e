package graft

import graft.streaming.{StatefulOps, StreamingOps}
import graft.streaming.StatefulOps.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("st8: batch-by-batch upsert fold equals the one-shot merge") {
    val store = StreamingOps.st8UpsertSink(spark, sf)
      .as[(Long, Long, String, Double, String)].collect().toSet
    val oneShot = graft.operators.RelationalQueries.q23MergeLatest(spark, sf)
      .as[(Long, Long, String, Double, String)].collect().toSet
    assert(store === oneShot)
    assert(store.nonEmpty)
  }

  test("st8: re-delivered batch reproduces the identical store (idempotence)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_st8_replay").toString + "/store"
    val batches = graft.operators.RelationalQueries.cdcBatches(spark, sf)
    batches.foreach(b => StreamingOps.upsertBatch(spark, path, b))
    val before = spark.read.parquet(path)
      .as[(Long, Long, String, Double, String, Long, Long)].collect().toSet
    // at-least-once delivery: the LAST batch arrives again
    StreamingOps.upsertBatch(spark, path, batches.last)
    val after = spark.read.parquet(path)
      .as[(Long, Long, String, Double, String, Long, Long)].collect().toSet
    assert(after === before)
  }

  test("st8: the same upsert body through a MemoryStream foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files
      .createTempDirectory("graft_st8_stream").toString + "/store"
    // a miniature CDC stream: snapshot, then an update, then a delete
    val stream = MemoryStream[(Long, Long, String, Double, String, Long, String)]
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority", "version", "op")
    val q = stream.toDF.toDF(cols: _*)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.upsertBatch(spark, path, batch)
      }
      .start()
    try {
      stream.addData(Seq(
        (1L, 10L, "O", 100.0, "1-URGENT", 1L, "i"),
        (2L, 20L, "O", 200.0, "2-HIGH", 1L, "i"),
        (3L, 30L, "O", 300.0, "3-MEDIUM", 1L, "i")))
      q.processAllAvailable()
      stream.addData(Seq((2L, 20L, "U", 400.0, "2-HIGH", 2L, "u")))
      q.processAllAvailable()
      stream.addData(Seq((3L, 30L, "X", 0.0, "x", 3L, "d")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(path)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(got === Set((1L, 10L, "O", 100.0), (2L, 20L, "U", 400.0)))
  }

  test("st7: streaming and batch modes of the ingest screen agree") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "standing corpus doc one"), (2L, "another corpus doc"))
    val incoming = Seq(
      (7L, "standing corpus doc one"),  // exact dup of corpus doc 1
      (17L, "a brand new document"),    // clean
      (27L, "another corpus doc"))      // exact dup of corpus doc 2
    val digests = corpus.toDF("doc_id", "text")
      .select(sha2($"text", 256).as("h")).distinct()

    val want = StreamingOps.ingestScreen(
        incoming.toDF("doc_id", "text"), digests)
      .as[(Long, Boolean)].collect().toMap
    assert(want === Map(7L -> true, 17L -> false, 27L -> true))

    val stream = MemoryStream[(Long, String)]
    stream.addData(incoming)
    val q = StreamingOps.ingestScreen(
        stream.toDF.toDF("doc_id", "text"), digests)
      .writeStream.format("memory").queryName("st7_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st7_test")
      .as[(Long, Boolean)].collect().toMap
    assert(got === want)
  }

  test("st7b: bloom prescreen never changes st7's verdict; no false negatives on planted dups; stream parity") {
    implicit val sqlCtx = spark.sqlContext
    // corpus equality: identical output relation on the real slices
    val sf = "/root/testdata/sf0.001"
    val viaJoin = StreamingOps.st7StreamIngestScreen(spark, sf)
      .as[(Long, Boolean)].collect().toMap
    val viaBloom = StreamingOps.st7bBloomIngestScreen(spark, sf)
      .as[(Long, Boolean)].collect().toMap
    assert(viaBloom === viaJoin, "bloom variant must equal st7 bit-for-bit")

    // planted contract: every standing key probes positive (no FN), the
    // resolving join kills FPs, clean docs pass
    val corpus = Seq((1L, "standing corpus doc one"), (2L, "another corpus doc"))
    val incoming = Seq(
      (7L, "standing corpus doc one"),  // dup — MUST be caught
      (17L, "a brand new document"),    // clean
      (27L, "another corpus doc"))      // dup — MUST be caught
    val standing = corpus.toDF("doc_id", "text")
    val bf = StreamingOps.ingestBloomOf(standing)
    standing.select(xxhash64($"text")).as[Long].collect()
      .foreach(k => assert(bf.mightContain(k), "bloom false negative"))
    val digests = standing.select(sha2($"text", 256).as("h")).distinct()
    val want = StreamingOps.bloomScreen(
        incoming.toDF("doc_id", "text"), bf, digests)
      .as[(Long, Boolean)].collect().toMap
    assert(want === Map(7L -> true, 17L -> false, 27L -> true))

    // the IDENTICAL core over a MemoryStream: the filter is standing
    // state built once; each micro-batch probes it statelessly
    val stream = MemoryStream[(Long, String)]
    stream.addData(incoming)
    val q = StreamingOps.bloomScreen(
        stream.toDF.toDF("doc_id", "text"), bf, digests)
      .writeStream.format("memory").queryName("st7b_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st7b_test").as[(Long, Boolean)].collect().toMap
    assert(got === want)
  }

  test("st9: streaming and batch modes of the near-dup screen agree") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    val base = ("w" + (1 to 60).mkString(" w"))
    val nearOfBase = base.split(" ").drop(2).mkString(" ")
    val docs = Seq(
      (1L, base),                              // corpus
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"), // corpus, unrelated
      (7L, base),                              // batch: exact dup of doc 1
      (17L, nearOfBase),                       // batch: near dup of doc 1
      (27L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")) // batch: unique
    val dir = java.nio.file.Files.createTempDirectory("graft_st9").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = StreamingOps.st9StreamNearDupScreen(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(want.map(t => (t._1, t._2)) === Set((7L, 1L), (17L, 1L)),
      s"batch screen hits: $want")
    assert(want.forall(_._3 >= 0.8))

    // the IDENTICAL core over a MemoryStream: stateless stream-static
    // probe — band-collision copies may repeat rows, so compare SETS
    val indexKeys = spark.read.parquet(DedupOps.dedupIndexKeys(spark, dir))
    val shingles = spark.read.parquet(DedupOps.dedupIndexShingles(spark, dir))
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.filter(_._1 % 10 == 7))
    val q = DedupOps.nearDupHits(
        stream.toDF.toDF("doc_id", "text"), indexKeys, shingles, 0.8)
      .writeStream.format("memory").queryName("st9_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st9_test")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === want)
    // and the stream plan kept no state: a stateless screen must not
    // allocate a state store
    assert(q.lastProgress.stateOperators.isEmpty,
      s"unexpected state operators: ${q.lastProgress.stateOperators}")
  }

  test("st10: streaming and batch modes of the quality gate agree; a natural doc admits statelessly") {
    implicit val sqlCtx = spark.sqlContext
    // a natural-shaped doc passing every battery: 60 words, 4 Gopher
    // stopwords, marker ratio > 0.05, all bigrams distinct
    val natural = (Seq("the", "of", "and", "that", "a") ++
      (1 to 55).map(i => s"word$i")).mkString(" ")
    val repetitive = ("loop " * 60).trim          // rep2 ≈ 1 ⇒ rejected
    val short = "the of and tiny"                 // fails both word bands
    val incoming = Seq((7L, natural), (17L, repetitive), (27L, short))

    val want = StreamingOps.qualityGate(incoming.toDF("doc_id", "text"))
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(want(7L) === ((7L, true, true, false, true)), s"natural: ${want(7L)}")
    assert(!want(17L)._5 && want(17L)._4, s"repetitive: ${want(17L)}")
    assert(!want(27L)._5 && !want(27L)._2, s"short: ${want(27L)}")

    val stream = MemoryStream[(Long, String)]
    stream.addData(incoming)
    val q = StreamingOps.qualityGate(stream.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("st10_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st10_test")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got === want)
    // corpus-free gate ⇒ stateless plan: no state store allocated
    assert(q.lastProgress.stateOperators.isEmpty,
      s"unexpected state operators: ${q.lastProgress.stateOperators}")
  }

  test("st11: attribute sheet — planted truth in batch; foreachBatch stream equality; zero state") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    val base = ("w" + (1 to 60).mkString(" w"))        // corpus doc
    val nearOfBase = base.split(" ").drop(2).mkString(" ")
    val natural = (Seq("the", "of", "and", "that", "a") ++
      (1 to 55).map(i => s"word$i")).mkString(" ")     // passes every battery
    val repetitive = ("loop " * 60).trim               // rep2 ≈ 1
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, unrelated),                     // standing corpus
      (7L, base),                                      // batch: exact dup
      (17L, nearOfBase),                               // batch: near dup
      (27L, natural),                                  // batch: clean admit
      (37L, repetitive))                               // batch: quality reject
    val dir = java.nio.file.Files.createTempDirectory("graft_st11").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = StreamingOps.st11StreamAttributeSheet(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("gopher_keep"), r.getAs[Boolean]("q_keep"),
          r.getAs[Boolean]("repetitive"), r.getAs[Boolean]("dup_exact"),
          r.getAs[Boolean]("dup_near"), r.getAs[Boolean]("admit"))).toMap
    assert(want.keySet === Set(7L, 17L, 27L, 37L))
    assert(want(7L)._4 && want(7L)._5 && !want(7L)._6,
      s"exact dup: ${want(7L)}") // an exact dup is also a j=1 near dup
    assert(!want(17L)._4 && want(17L)._5 && !want(17L)._6, s"near: ${want(17L)}")
    assert(want(27L) === ((true, true, false, false, false, true)),
      s"clean: ${want(27L)}")
    assert(want(37L)._3 && !want(37L)._6, s"repetitive: ${want(37L)}")

    // the IDENTICAL kernel per micro-batch through foreachBatch — two
    // separate batches prove per-batch independence (no cross-batch state)
    val corpus = docs.filter(_._1 % 10 != 7)
    val digests = corpus.map(_._2).distinct.toDF("text")
      .select(sha2($"text", 256).as("h"))
    val indexKeys = spark.read.parquet(DedupOps.dedupIndexKeys(spark, dir))
    val shingles = spark.read.parquet(DedupOps.dedupIndexShingles(spark, dir))
    val got = collection.mutable.ArrayBuffer.empty[(Long, (Boolean, Boolean, Boolean, Boolean, Boolean, Boolean))]
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.filter(d => d._1 == 7L || d._1 == 17L))
    stream.addData(docs.filter(d => d._1 == 27L || d._1 == 37L))
    val q = stream.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= StreamingOps.ingestAttributeSheet(b, digests, indexKeys, shingles)
          .collect().map(r => r.getAs[Long]("doc_id") ->
            (r.getAs[Boolean]("gopher_keep"), r.getAs[Boolean]("q_keep"),
              r.getAs[Boolean]("repetitive"), r.getAs[Boolean]("dup_exact"),
              r.getAs[Boolean]("dup_near"), r.getAs[Boolean]("admit")))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.toMap === want)
    // foreachBatch runs the sheet as a batch plan: no state store exists
    assert(q.lastProgress.stateOperators.isEmpty,
      s"unexpected state operators: ${q.lastProgress.stateOperators}")
  }

  test("st12: decont screen — planted hits counted per window; foreachBatch equality; zero state") {
    implicit val sqlCtx = spark.sqlContext
    val ev = (1 to 10).map(i => s"e$i").mkString(" ")   // eval doc, 10 toks
    val gram8 = (1 to 8).map(i => s"e$i").mkString(" ")
    val docs = Seq(
      (0L, ev),                                         // eval slice
      (1L, "standing corpus doc with its own words"),   // corpus, not eval
      (7L, s"x1 x2 $gram8 y1"),                         // ingest: 1 hit
      (17L, (1 to 20).map(i => s"c$i").mkString(" ")),  // ingest: clean
      (27L, s"$gram8 z $gram8"),                        // ingest: 2 hits
      (37L, "tiny"))                                    // ingest: short, clean
    val dir = java.nio.file.Files.createTempDirectory("graft_st12").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = StreamingOps.st12StreamDecontScreen(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_eval_hits"), r.getAs[Boolean]("contaminated"))))
      .toMap
    assert(want.keySet === Set(7L, 17L, 27L, 37L))
    assert(want(7L) === ((1L, true)))
    assert(want(17L) === ((0L, false)))
    assert(want(27L) === ((2L, true)))
    assert(want(37L) === ((0L, false)))

    // identical kernel per micro-batch through foreachBatch; two batches
    // prove per-batch independence (no cross-batch state)
    val evGrams = Seq(ev).toDF("text")
      .select(explode(graft.operators.DedupOps.shingles(
        $"text", graft.operators.TextOps.DecontGram)).as("g"))
      .select(xxhash64($"g").as("gh")).distinct()
    val got = collection.mutable.ArrayBuffer.empty[(Long, (Long, Boolean))]
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.filter(d => d._1 == 7L || d._1 == 17L))
    stream.addData(docs.filter(d => d._1 == 27L || d._1 == 37L))
    val q = stream.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= StreamingOps.decontScreen(b, evGrams).collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Long]("n_eval_hits"),
              r.getAs[Boolean]("contaminated"))))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.toMap === want)
    assert(q.lastProgress.stateOperators.isEmpty,
      s"unexpected state operators: ${q.lastProgress.stateOperators}")
  }

  test("st13: lang gate — confident docs admit under their language, gibberish rejects; foreachBatch equality; zero state") {
    implicit val sqlCtx = spark.sqlContext
    // reference slice (doc_id % 20 == 0) trains the profile: en from
    // doc 0, zh from doc 20. Ingest slice (% 10 == 7): 7 is clean en
    // (same trigram stock as doc 0 → conf ≈ 173k micro), 17 clean zh,
    // 27 out-of-model gibberish (q/v/k trigrams appear in no reference
    // doc → score 0, conf 0, all-zero tie → 'en' by ascending code)
    val docs = Seq(
      (0L, "the then they them", "en"),
      (20L, "zhong zhou zhu zhang", "zh"),
      (7L, "the they them then", "xx"),
      (17L, "zhong zhu zhou zhang", "xx"),
      (27L, "qq vv kk qqq vvv", "xx"))
    val dir = java.nio.file.Files.createTempDirectory("graft_st13").toString
    docs.map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = StreamingOps.st13StreamLangGate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("pred_lang"), r.getAs[Long]("score_micro"),
          r.getAs[Long]("n_tri"), r.getAs[Long]("conf_micro"),
          r.getAs[Boolean]("lang_admit"))))
      .toMap
    assert(want.keySet === Set(7L, 17L, 27L), "ingest slice only")
    assert(want(7L)._1 === "en" && want(7L)._5, s"clean en admits: ${want(7L)}")
    assert(want(17L)._1 === "zh" && want(17L)._5, s"clean zh admits: ${want(17L)}")
    assert(want(27L) === (("en", 0L, 12L, 0L, false)),
      "gibberish scores zero, ties to the ascending code, rejects")
    // conf is exactly the integer average of the emitted columns
    want.values.foreach { case (_, s, n, c, a) =>
      assert(c === s / math.max(n, 1L))
      assert(a === (c >= StreamingOps.LangGateTauMicro))
    }

    // identical kernel per micro-batch through foreachBatch; two batches
    // prove per-batch independence (no cross-batch state)
    val profile = graft.operators.TextOps.langProfileRows(spark, dir)
    val got = collection.mutable.ArrayBuffer
      .empty[(Long, (String, Long, Long, Long, Boolean))]
    val stream = MemoryStream[(Long, String)]
    stream.addData(Seq((7L, "the they them then")))
    stream.addData(Seq((17L, "zhong zhu zhou zhang"), (27L, "qq vv kk qqq vvv")))
    val q = stream.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= StreamingOps.langGate(b, profile).collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[String]("pred_lang"), r.getAs[Long]("score_micro"),
              r.getAs[Long]("n_tri"), r.getAs[Long]("conf_micro"),
              r.getAs[Boolean]("lang_admit"))))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.toMap === want)
    assert(q.lastProgress.stateOperators.isEmpty,
      s"unexpected state operators: ${q.lastProgress.stateOperators}")
  }

  test("st14: drift gate — appeared/vanished/shifted languages alarm, same-distribution batch stays quiet; foreachBatch equality; zero state") {
    implicit val sqlCtx = spark.sqlContext
    // standing (doc_id % 10 != 7): en 50%, zh 40%, fr 10%.
    // batch (% 10 == 7): en 40% (−10 pts — under the 15-pt alarm),
    // zh 40% (0), xx 20% (appeared), fr absent (vanished).
    val standing = Seq(
      (0L, "en", 10L), (1L, "en", 10L), (2L, "en", 10L), (3L, "en", 10L),
      (4L, "en", 10L), (5L, "zh", 20L), (6L, "zh", 20L), (8L, "zh", 20L),
      (9L, "zh", 20L), (10L, "fr", 30L))
    val batch = Seq(
      (7L, "en", 12L), (17L, "en", 12L), (27L, "zh", 24L),
      (37L, "zh", 24L), (47L, "xx", 50L))
    val dir = java.nio.file.Files.createTempDirectory("graft_st14").toString
    (standing ++ batch)
      .map { case (id, l, n) => (id, "t", l, "s", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = StreamingOps.st14StreamDriftGate(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("standing_docs"), r.getAs[Long]("ingest_docs"),
          r.getAs[Long]("share_delta_micro"), r.getAs[Boolean]("only_in_ingest"),
          r.getAs[Boolean]("only_in_standing"), r.getAs[Boolean]("drift_alarm"))))
      .toMap
    assert(want.keySet === Set("en", "zh", "fr", "xx"))
    assert(want("en") === ((5L, 2L, -100000L, false, false, false)),
      "a 10-pt swing is batch noise, no alarm")
    assert(want("zh") === ((4L, 2L, 0L, false, false, false)))
    assert(want("xx") === ((0L, 1L, 200000L, true, false, true)),
      "an appeared language alarms")
    assert(want("fr") === ((1L, 0L, -100000L, false, true, true)),
      "a vanished language alarms")

    // identical kernel per micro-batch through foreachBatch; two
    // batches prove per-batch independence (each panel is computed
    // against the standing corpus from that batch alone)
    val standingDf = standing.toDF("doc_id", "lang", "n_chars")
    val b1 = batch.take(2)
    val b2 = batch.drop(2)
    val panels = collection.mutable.ArrayBuffer
      .empty[Map[String, (Long, Long, Boolean)]]
    val stream = MemoryStream[(Long, String, Long)]
    stream.addData(b1)
    val q = stream.toDF.toDF("doc_id", "lang", "n_chars").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) panels += StreamingOps.driftGate(b, standingDf)
          .collect().map(r => r.getAs[String]("lang") ->
            ((r.getAs[Long]("ingest_docs"), r.getAs[Long]("share_delta_micro"),
              r.getAs[Boolean]("drift_alarm")))).toMap
        ()
      }.start()
    try {
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    def wantFor(b: Seq[(Long, String, Long)]) =
      StreamingOps.driftGate(b.toDF("doc_id", "lang", "n_chars"), standingDf)
        .collect().map(r => r.getAs[String]("lang") ->
          ((r.getAs[Long]("ingest_docs"), r.getAs[Long]("share_delta_micro"),
            r.getAs[Boolean]("drift_alarm")))).toMap
    assert(panels.toSeq === Seq(wantFor(b1), wantFor(b2)))
    assert(q.lastProgress.stateOperators.isEmpty,
      s"unexpected state operators: ${q.lastProgress.stateOperators}")
  }

  test("st14: fixture batch stays under the alarm — the threshold clears the measured noise floor") {
    val rows = StreamingOps.st14StreamDriftGate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the fixture's ingest slice IS drawn from the standing
      // distribution: measured max |delta| 71,111 micro vs τ = 150,000
      assert(math.abs(r.getAs[Long]("share_delta_micro")) <
        StreamingOps.DriftAlarmMicro,
        s"lang ${r.getAs[String]("lang")} delta inside the noise band")
      assert(!r.getAs[Boolean]("drift_alarm"))
    }
  }

  test("st13: fixture gate — every clean doc clears τ with headroom; output is the ingest slice") {
    val rows = StreamingOps.st13StreamLangGate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 === 7)
      assert(r.getAs[Long]("conf_micro") ===
        r.getAs[Long]("score_micro") / math.max(r.getAs[Long]("n_tri"), 1L))
      // the fixture corpus is clean text — measured floor 8048 micro,
      // 2× the gate; a τ drifting into the clean band would trip here
      assert(r.getAs[Long]("conf_micro") >= 2 * StreamingOps.LangGateTauMicro,
        s"clean doc ${r.getAs[Long]("doc_id")} too close to the gate")
      assert(r.getAs[Boolean]("lang_admit"))
    }
  }

  test("st1: streaming and batch modes of hourlyTypeCounts agree") {
    implicit val sqlCtx = spark.sqlContext
    val fixture = Seq(
      // (ts, event_type, user_id, value, event_id)
      (ts(5), "click", 1L, 1.5, 1L),
      (ts(10), "click", 2L, 2.5, 2L),
      (ts(20), "view", 1L, 0.5, 3L),
      (ts(65), "click", 3L, 9.0, 4L),
      (ts(70), "view", 3L, 4.0, 5L))
    val batchDf = fixture.toDF("ts", "event_type", "user_id", "value", "event_id")
    val want = StreamingOps.hourlyTypeCounts(batchDf)
      .select($"hour_start", $"event_type", $"n_events", $"min_value", $"max_value")
      .collect().map(_.toSeq).toSet

    val stream = MemoryStream[(Timestamp, String, Long, Double, Long)]
    stream.addData(fixture.map(f => (f._1, f._2, f._3, f._4, f._5)))
    val q = StreamingOps.hourlyTypeCounts(
        stream.toDF.toDF("ts", "event_type", "user_id", "value", "event_id"))
      .writeStream.format("memory").queryName("st1_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st1_test")
      .select($"hour_start", $"event_type", $"n_events", $"min_value", $"max_value")
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("st2 batch sessionization splits on >30min gaps") {
    val events = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(20), 3L), // session 0
      (1L, ts(60), 4L), (1L, ts(70), 5L), //                  session 1 (40m gap)
      (2L, ts(0), 6L) //                                      user 2, session 0
    ).toDF("user_id", "ts", "event_id")
      .withColumn("event_type", lit("x")).withColumn("value", lit(0.0))
    // the production transform itself, against the fixture
    val out = StreamingOps.sessionize(events)
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(out === Set(
      (1L, 0L, 3L, ts(0), ts(20)),
      (1L, 1L, 2L, ts(60), ts(70)),
      (2L, 0L, 1L, ts(0), ts(0))))
  }

  test("stateful streaming sessionization emits the same closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StatefulOps.sessionizeStream(stream.toDS())
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    // offset from epoch 0: the initial watermark is 0 and an event AT the
    // watermark is late-dropped
    val b = 100L
    try {
      stream.addData(Ev(1L, ts(b), 1L), Ev(1L, ts(b + 10), 2L), Ev(1L, ts(b + 20), 3L))
      q.processAllAvailable()
      // 40-minute gap closes session 0
      stream.addData(Ev(1L, ts(b + 60), 4L), Ev(1L, ts(b + 70), 5L))
      q.processAllAvailable()
      val closed = spark.table("sess_test")
        .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
      assert(closed === Set((1L, 0L, 3L, ts(b), ts(b + 20))))
    } finally q.stop()
  }

  test("stateful sessionization: shuffled within-batch order matches batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val b = 500L
    // two sessions' worth of events, delivered in scrambled order in ONE batch
    val evs = Seq(Ev(1L, ts(b + 70), 5L), Ev(1L, ts(b), 1L), Ev(1L, ts(b + 20), 3L),
      Ev(1L, ts(b + 60), 4L), Ev(1L, ts(b + 10), 2L))
    val stream = MemoryStream[Ev]
    val q = StatefulOps.sessionizeStream(stream.toDS())
      .writeStream.format("memory").queryName("sess_shuffled")
      .outputMode("append").start()
    try {
      stream.addData(evs: _*)
      q.processAllAvailable()
      val closed = spark.table("sess_shuffled")
        .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
      // batch twin on the same events: session 0 = {b, b+10, b+20}, closed
      // by the 40-minute gap; session 1 stays open (not emitted)
      val batchClosed = StreamingOps.sessionize(
          evs.map(e => (e.user_id, e.ts, e.event_id))
            .toDF("user_id", "ts", "event_id"))
        .as[(Long, Long, Long, Timestamp, Timestamp)].collect()
        .filter(_._2 == 0L).toSet
      assert(closed === batchClosed)
      assert(closed === Set((1L, 0L, 3L, ts(b), ts(b + 20))))
    } finally q.stop()
  }

  test("stateful sessionization: late within-watermark events widen, never corrupt") {
    implicit val sqlCtx = spark.sqlContext
    val b = 1000L
    val stream = MemoryStream[Ev]
    val q = StatefulOps.sessionizeStream(stream.toDS())
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      stream.addData(Ev(1L, ts(b), 1L), Ev(1L, ts(b + 10), 2L))
      q.processAllAvailable()
      // watermark is now b+10-30 = b-20; both of these are LATE (older
      // than max seen) but above the watermark: one inside the session
      // span, one BEFORE the session start
      stream.addData(Ev(1L, ts(b + 5), 3L), Ev(1L, ts(b - 15), 4L))
      q.processAllAvailable()
      // 50-minute gap closes the (widened) session
      stream.addData(Ev(1L, ts(b + 60), 5L))
      q.processAllAvailable()
      val closed = spark.table("sess_late")
        .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
      // all four early events belong to ONE session spanning [b-15, b+10];
      // the batch twin on the full event set agrees
      val batchClosed = StreamingOps.sessionize(
          Seq((1L, ts(b), 1L), (1L, ts(b + 10), 2L), (1L, ts(b + 5), 3L),
            (1L, ts(b - 15), 4L), (1L, ts(b + 60), 5L))
            .toDF("user_id", "ts", "event_id"))
        .as[(Long, Long, Long, Timestamp, Timestamp)].collect()
        .filter(_._2 == 0L).toSet
      assert(closed === batchClosed)
      assert(closed === Set((1L, 0L, 4L, ts(b - 15), ts(b + 10))))
    } finally q.stop()
  }

  test("st3: streaming and batch dedup emit the same distinct key set") {
    implicit val sqlCtx = spark.sqlContext
    val fixture = Seq(
      (ts(5), "click", 1L, 1.0, 1L),
      (ts(6), "click", 1L, 2.0, 2L), // dup key (1, click)
      (ts(7), "view", 1L, 3.0, 3L),
      (ts(8), "click", 2L, 4.0, 4L),
      (ts(9), "click", 2L, 5.0, 5L)) // dup key (2, click)
    val cols = Seq("ts", "event_type", "user_id", "value", "event_id")
    val want = StreamingOps.dedupKeys(fixture.toDF(cols: _*))
      .as[(Long, String)].collect().toSet
    assert(want === Set((1L, "click"), (1L, "view"), (2L, "click")))

    val stream = MemoryStream[(Timestamp, String, Long, Double, Long)]
    stream.addData(fixture)
    val q = StreamingOps.dedupKeys(stream.toDF.toDF(cols: _*))
      .writeStream.format("memory").queryName("st3_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st3_test").as[(Long, String)].collect().toSet
    assert(got === want)
  }

  test("st4: watermarked stream-stream interval join agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    val b = 200L
    // (ts, event_type, user_id, event_id): user 1 has one in-window
    // purchase (25m after click), one out-of-window (40m); user 2's
    // purchase PRECEDES the click (must not match); user 3 click-only
    val fixture = Seq(
      (ts(b), "click", 1L, 1L), (ts(b + 25), "purchase", 1L, 2L),
      (ts(b + 65), "purchase", 1L, 3L), // 65m after click 1: out of window
      (ts(b + 10), "purchase", 2L, 4L), (ts(b + 20), "click", 2L, 5L),
      (ts(b + 30), "click", 3L, 6L))
    val cols = Seq("ts", "event_type", "user_id", "event_id")
    val batch = fixture.toDF(cols: _*)
    val want = StreamingOps.intervalJoin(
        batch.where($"event_type" === "click"),
        batch.where($"event_type" === "purchase"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want === Set((1L, 1L, 2L, 1500L))) // exactly the one attribution

    val stream = MemoryStream[(Timestamp, String, Long, Long)]
    stream.addData(fixture)
    val src = stream.toDF.toDF(cols: _*)
    val q = StreamingOps.intervalJoin(
        src.where($"event_type" === "click").withWatermark("ts", "30 minutes"),
        src.where($"event_type" === "purchase").withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("st4_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st4_test")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("bounded-state dedup: a key returning after watermark eviction re-emits") {
    // Proves the documented trade behind st3's no-watermark choice: the
    // bounded-state alternative (dropDuplicatesWithinWatermark) evicts key
    // state once the watermark passes, so a late re-occurrence of the SAME
    // key is emitted again — batch/stream agreement is lost, state is O(live
    // window) instead of O(distinct keys). st3 keeps exact semantics; this
    // spec keeps the alternative's price visible.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val deduped = stream.toDF.toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select($"user_id", $"event_type")
    val q = deduped.writeStream.format("memory").queryName("st_bounded")
      .outputMode("append").start()
    try {
      val b = 100L
      stream.addData((ts(b), 1L, "click"), (ts(b), 1L, "click")) // dup in-window
      q.processAllAvailable()
      // push the watermark far past b + 10min, evicting the key's state
      stream.addData((ts(b + 120), 2L, "view"))
      q.processAllAvailable()
      // same key again, long after eviction -> emitted a second time
      stream.addData((ts(b + 125), 1L, "click"))
      q.processAllAvailable()
      val got = spark.table("st_bounded").as[(Long, String)].collect().toSeq
      assert(got.count(_ == (1L, "click")) === 2,
        s"expected the evicted key to re-emit, got $got")
      assert(got.count(_ == (2L, "view")) === 1)
    } finally q.stop()
  }

  test("st5: stream-static enrichment agrees between modes and is stateless") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((12L, "NATION_12"), (13L, "NATION_13"))
      .toDF("n_nationkey", "n_name")
    val fixture = Seq( // (event_id, user_id, event_type)
      (1L, 12L, "click"), (2L, 13L, "view"), (3L, 37L, "click"), // 37 % 25 = 12
      (4L, 99L, "view")) // 99 % 25 = 24: no dim row -> dropped (inner join)
    val want = StreamingOps.enrichStatic(
        fixture.toDF("event_id", "user_id", "event_type"), dim)
      .as[(Long, Long, String, String)].collect().toSet
    assert(want.map(_._1) === Set(1L, 2L, 3L))
    assert(want.find(_._1 == 3L).get._4 === "NATION_12")

    val stream = MemoryStream[(Long, Long, String)]
    stream.addData(fixture)
    val q = StreamingOps.enrichStatic(
        stream.toDF.toDF("event_id", "user_id", "event_type"), dim)
      .writeStream.format("memory").queryName("st5_test")
      .outputMode("append").start() // append with NO watermark: stateless
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st5_test")
      .as[(Long, Long, String, String)].collect().toSet
    assert(got === want)
  }

  test("st6: foreachBatch complete-mode sink converges to the batch table") {
    implicit val sqlCtx = spark.sqlContext
    val fixture = Seq(
      (ts(5), "click", 1L, 1.5, 1L),
      (ts(10), "view", 2L, 2.5, 2L),
      (ts(65), "click", 3L, 9.0, 3L))
    val want = StreamingOps.hourlyTypeCounts(
        fixture.toDF("ts", "event_type", "user_id", "value", "event_id"))
      .collect().map(_.toSeq).toSet

    val sink = java.nio.file.Files.createTempDirectory("graft_st6").toString
    val stream = MemoryStream[(Timestamp, String, Long, Double, Long)]
    val q = StreamingOps.hourlyTypeCounts(
        stream.toDF.toDF("ts", "event_type", "user_id", "value", "event_id"))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // complete mode + overwrite: every micro-batch idempotently
        // rewrites the whole (tiny) aggregate table — a replayed batch
        // after failure produces the identical files
        batch.write.mode("overwrite").partitionBy("event_type").parquet(sink)
      }
      .start()
    try {
      // two deliveries: the second batch must OVERWRITE, not append
      stream.addData(fixture.take(2))
      q.processAllAvailable()
      stream.addData(fixture.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(sink)
      .select($"hour_start", $"event_type", $"n_events", $"min_value", $"max_value")
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("sys: serverSpec reports the local executor with cores > 0") {
    val rows = ClusterInfo.serverSpec(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("total_cores") > 0))
    assert(rows.forall(_.getAs[String]("spark_version").nonEmpty))
  }
}
