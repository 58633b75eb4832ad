package graft

import graft.llm.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The image path of multimodal_pipeline must be a GENUINE codec
  * round-trip: payloads are well-formed PNGs, reported dimensions come
  * from the decoded raster, and the resize respects the 32-pixel cap.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"

  test("encodePng emits bytes ImageIO parses back at the synthesized dims") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val png = Multimodal.encodePng(payload)
    // PNG magic: 0x89 'P' 'N' 'G'
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth >= 32 && img.getWidth <= 80)
    assert(img.getHeight == math.max(1, (img.getWidth * 9) / 16))
  }

  test("encodeWav emits bytes AudioSystem parses back at 8kHz mono 16-bit") {
    val payload = "jackdaws love my big sphinx of quartz".getBytes("UTF-8")
    val wav = Multimodal.encodeWav(payload)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate == 8000f)
    assert(ais.getFormat.getChannels == 1)
    assert(ais.getFormat.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == payload.length.toLong)
  }

  test("pipeline audio rows carry parsed WAV format and measured RMS") {
    val out = Multimodal.multimodalPipeline(spark, dir)
      .filter(col("media_type") === "audio")
    val rows = out.limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("width") == 8000L)   // sample rate
      assert(r.getAs[Long]("height") == 1L)     // channels
      assert(r.getAs[Long]("n_frames") > 0)
      val rms = r.getAs[Double]("feat_mean")
      assert(rms >= 0.0 && rms <= 32768.0)
    }
  }

  test("encodeGif emits a multi-frame GIF ImageIO reads frame-by-frame") {
    val payload = Array.fill(5000)(42.toByte)  // 5000/2048 -> 3 frames
    val gif = Multimodal.encodeGif(payload)
    assert(new String(gif.slice(0, 6), "US-ASCII").startsWith("GIF8"))
    val reader = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 3)
    val f0 = reader.read(0)
    assert(f0.getWidth == 32 && f0.getHeight == 18)
    reader.dispose()
  }

  test("pipeline video rows carry real GIF frame counts and 1/4 sampling") {
    val out = Multimodal.multimodalPipeline(spark, dir)
      .filter(col("media_type") === "video")
    val rows = out.limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("width") == 32L && r.getAs[Long]("height") == 18L)
      val n = r.getAs[Long]("n_frames"); val s = r.getAs[Long]("sampled_frames")
      assert(n >= 1 && s == (n + 3) / 4, s"frames=$n sampled=$s")
      val mean = r.getAs[Double]("feat_mean")
      assert(mean >= 0.0 && mean <= 255.0)
    }
  }

  test("media_phash: deterministic aHash groups contain all exact dups") {
    val ph = Multimodal.mediaPhash(spark, dir)
    // image subset only, one row per image doc
    val images = graft.Tables.t(spark, dir, "documents")
      .filter(col("text").isNotNull && pmod(col("doc_id"), lit(3L)) === 0L)
    assert(ph.count() == images.count())
    // group accounting: n_same counts the group, keeper is its min doc_id
    val g = ph.groupBy("phash").agg(
      count(lit(1)).as("n"), min("doc_id").as("mn"),
      countDistinct("n_same").as("k1"), countDistinct("keep_id").as("k2"))
    assert(g.filter(col("k1") =!= 1L || col("k2") =!= 1L).count() == 0)
    assert(ph.join(g, "phash")
      .filter(col("n_same") =!= col("n") || col("keep_id") =!= col("mn"))
      .count() == 0)
    // lossy-superset law: byte-identical payloads MUST share a phash
    val byText = images.groupBy(md5(col("text")).as("h"))
      .agg(countDistinct("doc_id").as("n_ids"))
      .filter(col("n_ids") >= 2)
    val textDupPhashes = images.withColumn("h", md5(col("text")))
      .join(byText, "h").join(ph, "doc_id")
      .groupBy("h").agg(countDistinct("phash").as("n_hashes"))
    assert(textDupPhashes.filter(col("n_hashes") =!= 1L).count() == 0)
    // determinism: a FRESH uncached decode pass reproduces the cached
    // signatures bit-for-bit
    val again = Multimodal.buildPhashFrame(spark, dir)
      .select(col("doc_id"), col("phash").as("phash2"))
    assert(ph.join(again, "doc_id")
      .filter(col("phash") =!= col("phash2")).count() == 0)
  }

  test("phash banding finds exactly the radius-3 pairs (pigeonhole)") {
    val pairs = Multimodal.phashHammingPairs(spark, dir)
    assert(pairs.filter(col("hamming") > 3L || col("hamming") < 1L ||
      col("p1") >= col("p2")).count() == 0)
    // 4 bands of 16 bits: a pair within distance 3 must share a band, so
    // the banded result equals the brute-force radius-3 pair set — exact
    // equality holds when every band fits one PairSubCap sub-bucket (the
    // sub-bucket split only sheds recall past the cap). Pin that
    // precondition explicitly so a data change that overflows a band
    // fails here with the reason, not in the equality below.
    val sig = Multimodal.mediaPhash(spark, dir).select("phash").distinct()
    val maxBand = sig.select(explode(expr(Multimodal.BandExpr)).as("e"))
      .groupBy("e.band", "e.bv").count().agg(max("count")).head().getLong(0)
    assert(maxBand <= graft.llm.Similarity.PairSubCap,
      s"band population $maxBand exceeds PairSubCap; exact pigeonhole " +
        "equality no longer applies — scope this test to subset-only")
    val brute = sig.as("a").crossJoin(sig.as("b"))
      .filter(col("a.phash") < col("b.phash"))
      .withColumn("hamming", expr("bit_count(a.phash ^ b.phash)").cast("long"))
      .filter(col("hamming") <= 3L)
      .select(col("a.phash").as("p1"), col("b.phash").as("p2"), col("hamming"))
    assert(pairs.exceptAll(brute).count() == 0 &&
      brute.exceptAll(pairs).count() == 0)
  }

  test("pipeline image rows carry decoded-raster dims and capped resize") {
    val out = Multimodal.multimodalPipeline(spark, dir)
      .filter(col("media_type") === "image")
    val rows = out.limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("width"); val h = r.getAs[Long]("height")
      val rw = r.getAs[Long]("resized_w"); val rh = r.getAs[Long]("resized_h")
      assert(w >= 32 && w <= 80 && h == math.max(1, (w * 9) / 16))
      assert(math.max(rw, rh) <= 32, s"resize cap violated: ${rw}x$rh")
      // aspect preserved within integer truncation
      assert(rw == w || rw == math.max(1L, (w * 32) / math.max(w, h)))
      val mean = r.getAs[Double]("feat_mean")
      assert(mean >= 0.0 && mean <= 255.0)
      // payload_bytes is the PNG size, which is never the raw text length
      assert(r.getAs[Long]("payload_bytes") > 8)
    }
  }
}
