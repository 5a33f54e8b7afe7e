package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.FakeCodec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("FakeCodec: deterministic meta, normalized features, strided frames") {
    val bytes = "hello world, this is a fake image payload".getBytes("UTF-8")
    val (w, h, c) = FakeCodec.meta(bytes)
    assert((w, h, c) === FakeCodec.meta(bytes))
    assert(w >= 1 && w <= 64 && h >= 1 && h <= 64 && c === 3)
    val f = FakeCodec.features(bytes)
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0) < 1e-9)
    val frames = FakeCodec.frameSample(bytes, 32)
    assert(frames.length === (bytes.length + 31) / 32)
    assert(frames(0) === ('h'.toInt))
  }

  test("m1: n_bytes equals utf-8 length; digest matches text md5") {
    val rows = MultimodalOps.m1BinaryMeta(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf), "doc_id")
      .select($"n_bytes", length($"text").as("len"),
        ($"content_md5" === md5($"text")).as("same"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_bytes") === r.getAs[Int]("len"))
      assert(r.getAs[Boolean]("same"))
    }
  }

  test("m2: scalar feature columns f0..f15, L1-normalized, valid meta ranges") {
    val df = MultimodalOps.m2ImageFeatures(spark, sf)
    assert(df.columns.toSeq ===
      Seq("doc_id", "width", "height", "channels") ++ (0 until 16).map(i => s"f$i"))
    // every column scalar — an array column crashes the driver's sorter
    assert(df.schema.fields.forall(f =>
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
    val rows = df.collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 64)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 64)
      val l1 = (0 until 16).map(i => r.getAs[Double](s"f$i")).sum
      assert(math.abs(l1 - 1.0) < 16 * 5e-7, s"L1 after rounding = $l1")
    }
  }

  test("m4: resize clamps to 64 bytes; short payloads pass through intact") {
    val rows = MultimodalOps.m4Resize(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf), "doc_id")
      .select($"in_bytes", $"out_bytes", $"resized_md5",
        length($"text").as("len"), md5($"text").as("text_md5"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("in_bytes") === r.getAs[Int]("len"))
      assert(r.getAs[Int]("out_bytes") === math.min(64, r.getAs[Int]("len")))
      if (r.getAs[Int]("len") <= 64)
        assert(r.getAs[String]("resized_md5") === r.getAs[String]("text_md5"))
    }
    // FakeCodec resize is nearest-neighbor on a known payload
    val out = FakeCodec.resize("abcdefgh".getBytes("UTF-8"), 4)
    assert(new String(out, "UTF-8") === "aceg")
  }

  test("m3: frame count per doc is ceil(bytes/32)") {
    val got = MultimodalOps.m3FrameSample(spark, sf)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val want = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", ceil(length($"text") / lit(32.0)).as("n"))
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }
}
