package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M3 multimodal tier — image/audio/video as opaque `binary` columns with
  * typed metadata, per the driver brief. The Spark-side plumbing (schema,
  * batch shape, partitioning) is real; the codec itself is a
  * clearly-marked deterministic STUB because no image/audio library ships
  * in this container. Swapping `FakeCodec` for a JNI/javacv decoder changes
  * none of the plan shapes.
  *
  * The binary payloads are synthesized once, deterministically, from
  * `documents.text` (UTF-8 bytes) so every operator is reproducible and
  * m1's metadata is DuckDB-oracle-checkable. All three operators are
  * narrow per-row/per-partition maps — no shuffle anywhere, so they scale
  * with the scan: the 100 TB profile is "read blob column, emit small
  * typed columns", exactly what a decode/feature/sample pass should be.
  */
object MultimodalOps {

  /** ======= STUB CODEC =======
    * Deterministic fake decoder standing in for libjpeg/ffmpeg. Derives
    * "image" metadata and "frames" purely from the first bytes of the
    * payload, so results are stable across runs and engines. A real
    * implementation would return the same shapes from actual headers. */
  private[graft] object FakeCodec {
    /** (width, height, channels) pretend-parsed from the payload header. */
    def meta(bytes: Array[Byte]): (Int, Int, Int) = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      (1 + (b0 % 64), 1 + (b1 % 64), 3)
    }

    /** 16-bin byte-value histogram, L1-normalized — the stand-in for a
      * pooled CNN feature vector. Fixed output width = real UDF contract. */
    def features(bytes: Array[Byte]): Array[Double] = {
      val h = new Array[Double](16)
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1.0; i += 1 }
      val n = math.max(1, bytes.length)
      h.map(_ / n)
    }

    /** Every `stride`-th byte as an int — the stand-in for frame sampling
      * a video payload. */
    def frameSample(bytes: Array[Byte], stride: Int): Array[Int] =
      bytes.indices.by(stride).map(i => bytes(i) & 0xff).toArray

    /** Nearest-neighbor "resize" to a fixed output length — the stand-in
      * for image downscaling: output byte j = input byte at
      * floor(j * len / outLen). Payloads shorter than `outLen` stay as-is
      * (no upsampling), mirroring a real thumbnailer's no-op path. */
    def resize(bytes: Array[Byte], outLen: Int): Array[Byte] =
      if (bytes.length <= outLen) bytes
      else Array.tabulate(outLen)(j => bytes((j.toLong * bytes.length / outLen).toInt))
  }

  private def withBlob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", encode($"text", "UTF-8").as("blob"))
  }

  /** m1: blob metadata — byte length and content digest, computed natively
    * on the binary column (no decode). This is the "register the raw
    * corpus" pass: at 100 TB it reads the blob column once and emits two
    * tiny columns. */
  def m1BinaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withBlob(s, dir).select(
      $"doc_id",
      octet_length($"blob").as("n_bytes"),
      md5($"blob").as("content_md5"))
  }

  // DuckDB's md5 takes VARCHAR; hashing the text hashes the identical
  // UTF-8 bytes the Spark side digests (corpus is ASCII — verified
  // octet_length(encode(text)) == length(text) corpus-wide).
  private val m1Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents""".stripMargin

  /** m2: decode + feature-extract over the blob column through the typed
    * Dataset batch path — the Scala analog of `mapInPandas`: one function
    * invocation per PARTITION (not per row), iterator-in/iterator-out, so
    * a real codec could amortize model/codec init per batch. Emits typed
    * metadata plus the fixed-width feature vector flattened to 16 rounded
    * scalar columns `f0..f15` — every output column scalar/hashable (an
    * array column crashes the driver's pandas sorter, r2 `err` row) and
    * the whole row DuckDB-oracle-checkable. */
  def m2ImageFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = withBlob(s, dir).select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would live here (codec handles, model weights)
        it.map { case (id, bytes) =>
          val (w, h, c) = FakeCodec.meta(bytes)
          (id, w, h, c, FakeCodec.features(bytes))
        }
      }
      .toDF("doc_id", "width", "height", "channels", "features")
    val bins = (0 until 16).map(i => round($"features".getItem(i), 6).as(s"f$i"))
    decoded.select(Seq($"doc_id", $"width", $"height", $"channels") ++ bins: _*)
  }

  // m2's stub semantics over the ASCII payload: width/height from the first
  // two bytes (= codepoints), and the 16-bin high-nibble byte histogram as
  // SUM(CASE)s over the per-character unnest — same technique as m3's
  // oracle. LEFT JOIN keeps zero-length payloads (hist would drop them).
  private val m2Sql = {
    val bins = (0 until 16).map(i =>
      s"round(COALESCE(h.c$i, 0) / greatest(1, length(d.text)), 6) AS f$i")
      .mkString(",\n  ")
    val counts = (0 until 16).map(i =>
      s"CAST(SUM(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS DOUBLE) AS c$i")
      .mkString(",\n    ")
    s"""WITH hist AS (
       |  SELECT doc_id,
       |    $counts
       |  FROM (SELECT doc_id, ascii(substr(text, i, 1)) // 16 AS bin
       |        FROM documents, UNNEST(generate_series(1, length(text))) AS t(i))
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(1 + (CASE WHEN length(d.text) >= 1
       |            THEN ascii(substr(d.text, 1, 1)) ELSE 0 END) % 64 AS INT) AS width,
       |  CAST(1 + (CASE WHEN length(d.text) >= 2
       |            THEN ascii(substr(d.text, 2, 1)) ELSE 0 END) % 64 AS INT) AS height,
       |  CAST(3 AS INT) AS channels,
       |  $bins
       |FROM documents d LEFT JOIN hist h USING (doc_id)""".stripMargin
  }

  /** m3: frame sampling — every 32nd byte of the payload as a "frame",
    * exploded to (doc_id, frame_no, frame_val) rows. The explode multiplies
    * rows but stays a narrow map; downstream ops see a normal long table. */
  def m3FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sample = udf((bytes: Array[Byte]) => FakeCodec.frameSample(bytes, 32))
    withBlob(s, dir)
      .select($"doc_id", posexplode(sample($"blob")).as(Seq("frame_no", "frame_val")))
  }

  // m3's stub semantics (every 32nd byte as int) is expressible in DuckDB
  // over the same ASCII payload (byte k == codepoint of char k), keeping
  // the whole pack oracle-checked.
  private val m3Sql =
    """SELECT doc_id,
      |  CAST(i - 1 AS INT) AS frame_no,
      |  ascii(substr(text, 32 * (i - 1) + 1, 1)) AS frame_val
      |FROM documents,
      |  UNNEST(generate_series(1, (length(text) + 31) // 32)) AS t(i)""".stripMargin

  /** Output length for the m4 stub resize. */
  private val ResizeLen = 64

  /** m4: resize/downsample over the blob column — completes the
    * decode / feature-extract / resize / frame-sample quartet. Same
    * iterator-per-partition batch path as m2 (a real thumbnailer
    * amortizes codec init identically); emits the sizes plus a digest of
    * the resized payload so the transform's exact bytes are
    * hash-checkable without an array column. */
  def m4Resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withBlob(s, dir).select($"doc_id", $"blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (the point of the batch path): one digest
        // instance reused across the partition — digest() resets it
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val out = FakeCodec.resize(bytes, ResizeLen)
          (id, bytes.length, out.length,
            md.digest(out).map(b => f"$b%02x").mkString)
        }
      }
      .toDF("doc_id", "in_bytes", "out_bytes", "resized_md5")
  }

  // The resized payload over the ASCII corpus is the string of chars at
  // positions floor(j*len/64) — reconstructed with a generate_series
  // transform and md5'd, so the oracle pins the exact resized bytes.
  private val m4Sql =
    s"""SELECT doc_id,
       |  CAST(length(text) AS INT) AS in_bytes,
       |  CAST(least(length(text), $ResizeLen) AS INT) AS out_bytes,
       |  md5(CASE WHEN length(text) <= $ResizeLen THEN text
       |      ELSE array_to_string(list_transform(generate_series(0, ${ResizeLen - 1}),
       |             j -> substr(text, CAST((j * length(text)) // $ResizeLen AS INT) + 1, 1)), '')
       |      END) AS resized_md5
       |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> m1BinaryMeta _,
    "m2_image_features" -> m2ImageFeatures _,
    "m3_frame_sample" -> m3FrameSample _,
    "m4_resize" -> m4Resize _)

  val oracleSql: Map[String, String] = Map(
    "m1_binary_meta" -> m1Sql,
    "m2_image_features" -> m2Sql,
    "m3_frame_sample" -> m3Sql,
    "m4_resize" -> m4Sql)
}
