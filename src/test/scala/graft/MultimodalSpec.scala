package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The multimodal family decodes REAL image files: these specs pin that the
  * payloads are genuine BMP/PNG containers (magic bytes), that the real
  * `javax.imageio` decode recovers exactly the packed text bytes (both
  * codecs are lossless), and that the derived stats match an independent
  * in-test model of the construction. Correctness of the registered entries
  * is additionally hash-gated against the DuckDB oracle.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("blobs are real BMP/PNG containers and ImageIO-decode back to the text bytes") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .where(length(col("text")) > 0)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1).take(6).toMap
    val blobs = Multimodal.imageBlobs(spark, dir)
      .filter(b => docs.contains(b.doc_id)).collect()
    assert(blobs.length == docs.size)
    blobs.foreach { b =>
      val magicOk =
        if (b.doc_id % 2 == 0) b.mime == "image/bmp" &&
          b.payload(0) == 'B'.toByte && b.payload(1) == 'M'.toByte
        else b.mime == "image/png" &&
          (b.payload(0) & 0xff) == 0x89 && b.payload(1) == 'P'.toByte
      assert(magicOk, s"doc ${b.doc_id}: wrong container for ${b.mime}")
      // the REAL decode: javax.imageio, format sniffed from the container
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.payload))
      assert(img != null, s"doc ${b.doc_id}: ImageIO could not decode")
      val bytes = docs(b.doc_id).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(img.getWidth == 16)
      assert(img.getHeight == (bytes.length + 47) / 48)
      // lossless roundtrip: every packed byte comes back exactly
      var i = 0
      while (i < bytes.length) {
        val rgb = img.getRGB((i / 3) % 16, i / 48)
        val got = (i % 3) match {
          case 0 => (rgb >> 16) & 0xff
          case 1 => (rgb >> 8) & 0xff
          case 2 => rgb & 0xff
        }
        assert(got == (bytes(i) & 0xff), s"doc ${b.doc_id} byte $i")
        i += 1
      }
    }
  }

  test("features/frames/resize agree with an independent model of the raster") {
    val text = "The quick brown fox jumps over the lazy dog; " * 3 // 135 bytes
    val bytes = text.getBytes("UTF-8")
    val h = (bytes.length + 47) / 48 // 3 rows
    val padded = bytes.map(_ & 0xff).map(_.toLong) ++
      Array.fill(h * 48 - bytes.length)(0L)
    val one = Seq((0L, text)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_mm").toString
    one.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val f = Multimodal.extractFeatures(spark, tmp).collect().head
    assert((f.width, f.height, f.n_channel_bytes) == (16L, h.toLong, h * 48L))
    assert(f.channel_checksum == padded.sum % 2147483647L)

    val fr = Multimodal.sampleFrames(spark, tmp).collect().sortBy(_.frame_idx)
    assert(fr.length == h)
    fr.foreach { row =>
      val expect = padded.slice(row.frame_idx.toInt * 48, row.frame_idx.toInt * 48 + 48).sum
      assert(row.frame_checksum == expect % 2147483647L, s"frame ${row.frame_idx}")
    }

    val rz = Multimodal.resizeBlobs(spark, tmp).collect().head
    assert((rz.out_w, rz.out_h) == (8L, (h + 1) / 2L))
    val expectRz = (for {
      y <- 0 until (h + 1) / 2
      x <- 0 until 8
      c <- 0 until 3
    } yield padded((2 * y * 16 + 2 * x) * 3 + c)).sum
    assert(rz.resized_checksum == expectRz % 2147483647L)
  }

  test("a corrupt payload fails loudly instead of producing fake stats") {
    val junk = Multimodal.BlobRow(1L, Array[Byte](1, 2, 3, 4, 5), "image/bmp")
    val ds = spark.createDataset(Seq(junk))(
      org.apache.spark.sql.Encoders.product[Multimodal.BlobRow])
    val ex = intercept[org.apache.spark.SparkException] {
      // decode path only — reuse the frames kernel over a handcrafted blob
      import spark.implicits._
      ds.mapPartitions { rows =>
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          require(img != null, "payload is not a decodable image")
          r.doc_id
        }
      }.collect()
    }
    assert(ex.getMessage != null)
  }

  test("audio: WAV containers round-trip through the chunk walker to the text samples") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
      .where(org.apache.spark.sql.functions.length($"text") > 0)
      .select($"doc_id".as[Long], $"text".as[String]).collect().toMap
    val feats = Multimodal.audioFeatures(spark, dir)
      .select("doc_id", "sample_rate", "n_samples", "duration_ms", "peak", "sum_abs")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(feats.length == docs.size)
    feats.foreach { case (id, rate, n, durMs, peak, sumAbs) =>
      val text = docs(id)
      assert(rate == 8000L && n == text.length.toLong)
      assert(durMs == n * 1000 / 8000)
      val abses = text.map(c => math.abs((c - 64) * 256).toLong)
      assert(peak == abses.max, s"doc $id peak")
      assert(sumAbs == abses.sum, s"doc $id sum_abs")
    }
  }

  test("audio: the decoder walks chunks (LIST skipped) and rejects malformed containers") {
    // even doc_ids carry a LIST chunk between fmt and data — a fixed-offset
    // reader would misparse them; the round-trip test above covers that.
    // Here: header corruptions must fail loudly, never produce stats.
    val good = {
      val rows = Multimodal.audioBlobs(spark, dir).collect()
      rows.find(_.doc_id % 2 == 0).get.payload
    }
    // sanity: the good payload decodes
    Multimodal.decodeWav(good)
    def corrupt(mutate: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mutate(b); b
    }
    // wrong magic
    intercept[IllegalArgumentException] { Multimodal.decodeWav(corrupt(_(0) = 'X')) }
    // truncated container (RIFF size no longer matches)
    intercept[IllegalArgumentException] { Multimodal.decodeWav(good.dropRight(2)) }
    // stereo claim in fmt: chunk walker must reject non-mono
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(corrupt { b =>
        val fmtAt = good.indexOfSlice("fmt ".getBytes("US-ASCII"))
        b(fmtAt + 10) = 2 // channels field, LE low byte
      })
    }
  }

  test("video: AVI containers demux to one frame per character, JUNK walked") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir).select($"doc_id".as[Long],
      length($"text").cast("long").as[Long]).collect().toMap
    val rows = Multimodal.videoFeatures(spark, dir)
      .select($"doc_id".as[Long], $"n_frames".as[Long], $"width".as[Long],
        $"height".as[Long], $"fps_e3".as[Long]).collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, w, h, fps) =>
      assert(n == docs(id), s"doc $id: $n frames != ${docs(id)} chars")
      assert(w == 4 && h == 4 && fps == 25000)
    }
    // even ids carry the JUNK chunk, odd don't — both demuxed above; now
    // verify the walker really saw different layouts
    val blobs = Multimodal.videoBlobs(spark, dir).collect()
    val junkTag = "JUNK".getBytes("US-ASCII")
    blobs.foreach { r =>
      val hasJunk = r.payload.indexOfSlice(junkTag) >= 0
      assert(hasJunk == (r.doc_id % 2 == 0), s"doc ${r.doc_id} junk=$hasJunk")
    }
  }

  test("video: the demuxer rejects malformed containers loudly") {
    val good = Multimodal.videoBlobs(spark, dir).head(4)
      .find(_.doc_id % 2 == 0).get.payload
    val (usec, w, h, frames) = Multimodal.decodeAvi(good)
    assert(usec == 40000 && w == 4 && h == 4 && frames.nonEmpty)
    def corrupt(mutate: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mutate(b); b
    }
    // wrong magic
    intercept[IllegalArgumentException] { Multimodal.decodeAvi(corrupt(_(0) = 'X')) }
    // truncated container
    intercept[IllegalArgumentException] { Multimodal.decodeAvi(good.dropRight(3)) }
    // declared frame count != frames present (totalFrames field, LE low byte)
    intercept[IllegalArgumentException] {
      Multimodal.decodeAvi(corrupt { b =>
        val avihAt = good.indexOfSlice("avih".getBytes("US-ASCII"))
        b(avihAt + 8 + 16) = (b(avihAt + 8 + 16) + 1).toByte
      })
    }
  }

  test("image phash: 48-bit, deterministic; chunk index lossless for Hamming <= 3") {
    val ph = Multimodal.imagePHashes(spark, dir).collect()
      .map(r => r.doc_id -> r.phash).toMap
    assert(ph.nonEmpty)
    assert(ph.values.forall(p => p >= 0L && p < (1L << 48)), "phash must be 48-bit")
    val rerun = Multimodal.imagePHashes(spark, dir).collect()
      .map(r => r.doc_id -> r.phash).toMap
    assert(rerun == ph, "phash not deterministic")
    // the pigeonhole chunk index must recover EXACTLY the naive all-pairs
    // Hamming <= 3 set
    val ids = ph.keys.toSeq.sorted
    val naive = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      d = java.lang.Long.bitCount(ph(a) ^ ph(b))
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.phashNearDupPairs(spark, dir)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("incremental image dedup: persisted index serve == bare batch x corpus Hamming join") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val split = docs.count() * 4 / 5
    val idx = java.nio.file.Files.createTempDirectory("phashidx").toString
    Multimodal.buildPhashIndex(
      Multimodal.imagePHashesOf(docs.where(col("doc_id") < split)), idx)
    assert(Multimodal.phashIndexExists(idx))
    val batch = Multimodal.imagePHashesOf(docs.where(col("doc_id") >= split))
    val got = Multimodal.phashDedupAgainst(idx, batch)
      .select("doc_id", "dup_of", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    // naive oracle: every (batch, corpus) pair within Hamming 3
    val ph = Multimodal.imagePHashes(spark, dir).collect()
      .map(r => r.doc_id -> r.phash).toMap
    val naive = (for {
      b <- ph.keys if b >= split
      c <- ph.keys if c < split
      d = java.lang.Long.bitCount(ph(b) ^ ph(c))
      if d <= 3
    } yield (b, c, d.toLong)).toSet
    assert(got == naive)
    assert(got.nonEmpty, "test corpus should plant at least one cross-split dup family")
    // a half-built index (no _DONE) must refuse to serve
    val broken = java.nio.file.Files.createTempDirectory("phashidx_broken").toString
    intercept[IllegalArgumentException] {
      Multimodal.phashDedupAgainst(broken, batch)
    }
  }

  test("extendPhashIndex serves identically to rebuilding over corpus+batch") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val n = docs.count()
    val aEnd = n * 3 / 5
    val bEnd = n * 4 / 5
    val extended = java.nio.file.Files.createTempDirectory("phashidx_ext").toString
    Multimodal.buildPhashIndex(
      Multimodal.imagePHashesOf(docs.where(col("doc_id") < aEnd)), extended)
    Multimodal.extendPhashIndex(extended,
      Multimodal.imagePHashesOf(docs.where(col("doc_id") >= aEnd && col("doc_id") < bEnd)))
    val rebuilt = java.nio.file.Files.createTempDirectory("phashidx_full").toString
    Multimodal.buildPhashIndex(
      Multimodal.imagePHashesOf(docs.where(col("doc_id") < bEnd)), rebuilt)
    val batch = Multimodal.imagePHashesOf(docs.where(col("doc_id") >= bEnd))
    val servedExt = Multimodal.phashDedupAgainst(extended, batch)
      .as[(Long, Long, Long)].collect().toSet
    val servedFull = Multimodal.phashDedupAgainst(rebuilt, batch)
      .as[(Long, Long, Long)].collect().toSet
    assert(servedExt == servedFull)
    assert(servedExt.nonEmpty, "corpus should plant dup families across the splits")
    // extending a never-built (or crashed-build) index is a loud error
    val empty = java.nio.file.Files.createTempDirectory("phashidx_none").toString
    intercept[IllegalArgumentException] {
      Multimodal.extendPhashIndex(empty, batch)
    }
  }

  test("audio fingerprint: matches an independent sample model; sharded index recovers the naive pair set") {
    val fps = Multimodal.audioFingerprints(spark, dir).collect()
      .map(r => r.doc_id -> r.afp).toMap
    assert(fps.nonEmpty)
    assert(fps.values.forall(p => p >= 0L && p < (1L << 48)), "afp must be 48-bit")
    // independent model: PCM samples replayed from the text codes, then the
    // shared dhash48 chunk-comparison rule — a WAV walker bug (endianness,
    // chunk offsets) would break this before it broke the oracle
    val docs = graft.sources.Tables.documents(spark, dir)
      .where(length(col("text")) > 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def model(text: String): Long = {
      val n = text.length
      val h = (n + 47) / 48
      val cs = Array.tabulate(48) { j =>
        (j * h until math.min(j * h + h, n))
          .foldLeft(0L)((s, p) => s + (text.charAt(p) - 64).toLong * 256L)
      }
      (0 until 48).foldLeft(0L)((acc, j) =>
        if (cs(j) > cs((j + 1) % 48)) acc | (1L << j) else acc)
    }
    docs.foreach { case (id, text) => assert(fps(id) == model(text), s"doc $id") }
    // the sharded pigeonhole index must recover EXACTLY the naive
    // all-pairs Hamming <= 3 set
    val ids = fps.keys.toSeq.sorted
    val naive = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      d = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.audioNearDupPairs(spark, dir)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("incremental audio dedup: persisted index serve == bare batch x corpus Hamming join") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val split = docs.count() * 4 / 5
    val idx = java.nio.file.Files.createTempDirectory("afpidx").toString
    Multimodal.buildAudioFpIndex(
      Multimodal.audioFingerprintsOf(
        Multimodal.audioBlobsOf(docs.where(col("doc_id") < split))), idx)
    assert(Multimodal.audioFpIndexExists(idx))
    val batch = Multimodal.audioFingerprintsOf(
      Multimodal.audioBlobsOf(docs.where(col("doc_id") >= split)))
    val got = Multimodal.audioDedupAgainst(idx, batch)
      .select("doc_id", "dup_of", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val fps = Multimodal.audioFingerprints(spark, dir).collect()
      .map(r => r.doc_id -> r.afp).toMap
    val naive = (for {
      b <- fps.keys if b >= split
      c <- fps.keys if c < split
      d = java.lang.Long.bitCount(fps(b) ^ fps(c))
      if d <= 3
    } yield (b, c, d.toLong)).toSet
    assert(got == naive)
    // a half-built index (no _DONE) must refuse to serve
    val broken = java.nio.file.Files.createTempDirectory("afpidx_broken").toString
    intercept[IllegalArgumentException] {
      Multimodal.audioDedupAgainst(broken, batch)
    }
  }

  test("video fingerprint: matches an independent frame-sum model; pairs == naive set") {
    val fps = Multimodal.videoFingerprints(spark, dir).collect()
      .map(r => r.doc_id -> r.vfp).toMap
    assert(fps.nonEmpty)
    assert(fps.values.forall(p => p >= 0L && p < (1L << 48)), "vfp must be 48-bit")
    // independent model: per-frame energy replayed from the text codes
    // (frame k pixel j = (code·7 + j·13) mod 256), then dhash48 over the
    // ORDERED frame-sum sequence — a demuxer that reorders or drops frames
    // moves energy across chunk boundaries and breaks this
    val docs = graft.sources.Tables.documents(spark, dir)
      .where(length(col("text")) > 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def model(text: String): Long = {
      val fsums = text.map(c => (0 until 16).foldLeft(0L)((s, j) => s + (c.toInt * 7 + j * 13) % 256))
      val n = fsums.length
      val h = (n + 47) / 48
      val cs = Array.tabulate(48) { j =>
        (j * h until math.min(j * h + h, n)).foldLeft(0L)((s, p) => s + fsums(p))
      }
      (0 until 48).foldLeft(0L)((acc, j) =>
        if (cs(j) > cs((j + 1) % 48)) acc | (1L << j) else acc)
    }
    docs.foreach { case (id, text) => assert(fps(id) == model(text), s"doc $id") }
    val ids = fps.keys.toSeq.sorted
    val naive = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      d = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.videoNearDupPairs(spark, dir)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("extendVideoFpIndex serves identically to rebuilding over corpus+batch") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val n = docs.count()
    val aEnd = n * 3 / 5
    val bEnd = n * 4 / 5
    def fpsOf(pred: org.apache.spark.sql.Column) =
      Multimodal.videoFingerprintsOf(Multimodal.videoBlobsOf(docs.where(pred)))
    val extended = java.nio.file.Files.createTempDirectory("vfpidx_ext").toString
    Multimodal.buildVideoFpIndex(fpsOf(col("doc_id") < aEnd), extended)
    Multimodal.extendVideoFpIndex(extended,
      fpsOf(col("doc_id") >= aEnd && col("doc_id") < bEnd))
    val rebuilt = java.nio.file.Files.createTempDirectory("vfpidx_full").toString
    Multimodal.buildVideoFpIndex(fpsOf(col("doc_id") < bEnd), rebuilt)
    val batch = fpsOf(col("doc_id") >= bEnd)
    val servedExt = Multimodal.videoDedupAgainst(extended, batch)
      .as[(Long, Long, Long)].collect().toSet
    val servedFull = Multimodal.videoDedupAgainst(rebuilt, batch)
      .as[(Long, Long, Long)].collect().toSet
    assert(servedExt == servedFull)
    // extending a never-built index is a loud error
    val empty = java.nio.file.Files.createTempDirectory("vfpidx_none").toString
    intercept[IllegalArgumentException] {
      Multimodal.extendVideoFpIndex(empty, batch)
    }
  }

  test("audio/video fp-index forget: serve equals an index rebuilt on the filtered corpus") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val split = docs.count() * 4 / 5
    val corpus = docs.where(col("doc_id") < split)
    val filtered = corpus.where(col("doc_id") % 7 =!= 0)
    val forgetIds = corpus.where(col("doc_id") % 7 === 0).select(col("doc_id"))
    val rest = docs.where(col("doc_id") >= split)
    val root = java.nio.file.Files.createTempDirectory("graft_avfgt").toString
    // audio
    Multimodal.buildAudioFpIndex(
      Multimodal.audioFingerprintsOf(Multimodal.audioBlobsOf(corpus)), s"$root/aa")
    Multimodal.forgetFromAudioFpIndex(spark, s"$root/aa", forgetIds)
    Multimodal.buildAudioFpIndex(
      Multimodal.audioFingerprintsOf(Multimodal.audioBlobsOf(filtered)), s"$root/ab")
    val aBatch = Multimodal.audioFingerprintsOf(Multimodal.audioBlobsOf(rest))
    def aServe(idx: String) = Multimodal.audioDedupAgainst(idx, aBatch)
      .select("doc_id", "dup_of", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(aServe(s"$root/aa") == aServe(s"$root/ab"),
      "audio fp forget diverged from rebuilding on the filtered corpus")
    // video
    Multimodal.buildVideoFpIndex(
      Multimodal.videoFingerprintsOf(Multimodal.videoBlobsOf(corpus)), s"$root/va")
    Multimodal.forgetFromVideoFpIndex(spark, s"$root/va", forgetIds)
    Multimodal.buildVideoFpIndex(
      Multimodal.videoFingerprintsOf(Multimodal.videoBlobsOf(filtered)), s"$root/vb")
    val vBatch = Multimodal.videoFingerprintsOf(Multimodal.videoBlobsOf(rest))
    def vServe(idx: String) = Multimodal.videoDedupAgainst(idx, vBatch)
      .select("doc_id", "dup_of", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(vServe(s"$root/va") == vServe(s"$root/vb"),
      "video fp forget diverged from rebuilding on the filtered corpus")
  }

  test("phash-index forget: serve equals an index rebuilt on the filtered corpus") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val split = docs.count() * 4 / 5
    val corpus = docs.where(col("doc_id") < split)
    val batch = Multimodal.imagePHashesOf(docs.where(col("doc_id") >= split))
    val forgetIds = corpus.where(col("doc_id") % 7 === 0).select(col("doc_id"))
    val root = java.nio.file.Files.createTempDirectory("graft_phfgt").toString
    Multimodal.buildPhashIndex(Multimodal.imagePHashesOf(corpus), s"$root/a")
    Multimodal.forgetFromPhashIndex(spark, s"$root/a", forgetIds)
    Multimodal.buildPhashIndex(
      Multimodal.imagePHashesOf(corpus.where(col("doc_id") % 7 =!= 0)), s"$root/b")
    def serve(idx: String) = Multimodal.phashDedupAgainst(idx, batch)
      .select("doc_id", "dup_of", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(serve(s"$root/a") == serve(s"$root/b"),
      "forgetting from the phash index diverged from rebuilding on the filtered corpus")
  }
}
