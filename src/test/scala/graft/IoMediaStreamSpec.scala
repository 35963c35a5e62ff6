package graft

import graft.io.{Csv2, Vc}
import graft.multimodal.Media
import graft.streaming.Events
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

class IoMediaStreamSpec extends SparkSuite {
  import spark.implicits._

  test("Vc write/read roundtrip preserves data, schema and verifies hash") {
    val dir = Files.createTempDirectory("vc").toString
    val df = Seq((2, "b", Some(2.5)), (1, "a", None)).toDF("id", "name", "x")
    Vc.write(df, s"$dir/tbl", sortKeys = Seq("id"))
    val back = Vc.read(spark, s"$dir/tbl")
    val nullable = StructType(df.schema.fields.map(_.copy(nullable = true)))
    assert(back.schema === nullable)
    assert(back.orderBy("id").as[(Int, String, Option[Double])].collect().toSeq ===
      Seq((1, "a", None), (2, "b", Some(2.5))))
    // tamper -> hash check must fail
    val tsv = java.nio.file.Paths.get(s"$dir/tbl.tsv")
    Files.writeString(tsv, Files.readString(tsv) + "9\tz\t1.0\n")
    intercept[IllegalStateException] { Vc.read(spark, s"$dir/tbl") }
  }

  test("Vc.write is byte-stable across input partitioning (golden-hash contract)") {
    val dir = Files.createTempDirectory("vc2").toString
    val data = (1 to 500).map(i => (i % 97, s"n$i", i * 0.5))
    def hashOf(parts: Int): String = {
      Vc.write(data.toDF("k", "name", "v").repartition(parts),
        s"$dir/t$parts", Seq("k", "name"))
      Vc.dataHash(s"$dir/t$parts")
    }
    assert(hashOf(1) === hashOf(11))
  }

  test("Vc sidecar mirrors the git2rdata .yml contract (golden shape)") {
    val dir = Files.createTempDirectory("vcy").toString
    val df = Seq(
      (1, "Londo", Some("hoog"), Some(2.5), Some(java.sql.Date.valueOf("2022-05-01")), true),
      (2, "Tansley", Some("matig"), None, None, false),
      (3, "Londo", None, Some(0.5), Some(java.sql.Date.valueOf("2023-06-02")), true))
      .toDF("plot_id", "coverscale_name", "reliability", "cover_mean",
        "date_assessment", "measured")
    val reliability = graft.core.FactorDomain("reliability", Seq("hoog", "matig", "laag"))
    Vc.write(df, s"$dir/cover", Seq("plot_id"), factors = Seq(reliability))
    val yml = Files.readString(java.nio.file.Paths.get(s"$dir/cover.yml"))
    // ..generic block: format fields + split hash/data_hash, as in
    // processed/fieldmap_mhq/cover_species.yml
    assert(yml.startsWith("..generic:\n"))
    for (line <- Seq("  optimize: no", "  NA string: NA", "  sorting:", "  - plot_id"))
      assert(yml.contains(line + "\n"), s"missing '$line' in:\n$yml")
    val hashes = "(?m)^  (hash|data_hash): ([0-9a-f]{64})$".r.findAllMatchIn(yml)
      .map(m => m.group(1) -> m.group(2)).toMap
    assert(hashes.keySet === Set("hash", "data_hash"))
    assert(hashes("hash") !== hashes("data_hash"))
    // column classes in git2rdata vocabulary; the factor carries its dictionary
    assert(yml.contains("plot_id:\n  class: integer\n"))
    assert(yml.contains("cover_mean:\n  class: numeric\n"))
    assert(yml.contains("date_assessment:\n  class: Date\n  origin: '1970-01-01'\n"))
    assert(yml.contains("measured:\n  class: logical\n"))
    assert(yml.contains(
      "reliability:\n  class: factor\n  labels:\n  - hoog\n  - matig\n  - laag\n" +
      "  index:\n  - 1\n  - 2\n  - 3\n  ordered: no\n"))
    // round trip preserves classes and values
    val back = Vc.read(spark, s"$dir/cover")
    assert(back.schema("plot_id").dataType === IntegerType)
    assert(back.schema("date_assessment").dataType === DateType)
    assert(back.orderBy("plot_id")
      .select("plot_id", "reliability", "cover_mean", "measured")
      .as[(Int, Option[String], Option[Double], Boolean)].collect().toSeq === Seq(
        (1, Some("hoog"), Some(2.5), true),
        (2, Some("matig"), None, false),
        (3, None, Some(0.5), true)))
    // same data written twice -> byte-identical sidecar (diff-friendly contract)
    Vc.write(df.repartition(7), s"$dir/cover2", Seq("plot_id"), factors = Seq(reliability))
    val yml2 = Files.readString(java.nio.file.Paths.get(s"$dir/cover2.yml"))
    assert(yml === yml2)
  }

  test("Vc factor domains are enforced on write and on read") {
    val dir = Files.createTempDirectory("vcf").toString
    val df = Seq((1, "hoog"), (2, "zeer hoog")).toDF("id", "reliability")
    val dom = graft.core.FactorDomain("reliability", Seq("hoog", "matig", "laag"))
    // write_vc-style: a value outside the declared levels never lands on disk
    val werr = intercept[Exception] {
      Vc.write(df, s"$dir/bad", Seq("id"), factors = Seq(dom))
    }
    assert(werr.getMessage.contains("reliability"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/bad.tsv")))
    // read_vc-style: a sidecar whose dictionary no longer covers the data fails
    Vc.write(df, s"$dir/ok", Seq("id"),
      factors = Seq(graft.core.FactorDomain("reliability", Seq("hoog", "zeer hoog"))))
    val yml = java.nio.file.Paths.get(s"$dir/ok.yml")
    Files.writeString(yml, Files.readString(yml).replace("  - zeer hoog\n", ""))
    val rerr = intercept[Exception] { Vc.read(spark, s"$dir/ok") }
    assert(rerr.getMessage.contains("reliability"))
  }

  test("Csv2 reads semicolon-separated decimal-comma files with schema") {
    val dir = Files.createTempDirectory("csv2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/f.csv"),
      "name;klasse;bedekking\nLondo;1;2,5\nLondo;2;\n")
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("klasse", IntegerType),
      StructField("bedekking", DoubleType)))
    val got = Csv2.read(spark, s"$dir/f.csv", schema)
      .as[(String, Int, Option[Double])].collect().toSet
    assert(got === Set(("Londo", 1, Some(2.5)), ("Londo", 2, None)))
  }

  test("Media.extractFeatures: batched decode plumbing with stable hash") {
    val docs = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val feats = Media.extractFeatures(spark, Media.fromText(docs, "doc_id", "text", "blob"))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).byte_len === 5L)
    assert(feats(1L).content_hash === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(feats(1L).feature.length === 8)
    assert(feats(2L).byte_len === 0L)
  }

  test("Media.decodeImageMeta: real ImageIO decode recovers dims and pixel mean") {
    val rows = Seq(
      (1L, "image/png", Media.grayPng(5, 3, 200)),
      (2L, "image/png", Media.grayPng(8, 8, 0)),
      (3L, "image/png", Array[Byte](1, 2, 3))) // not a decodable image
      .toDF("media_id", "kind", "media")
    val got = Media.decodeImageMeta(spark, rows).collect().map(m => m.media_id -> m).toMap
    assert(got(1L).width === 5 && got(1L).height === 3 && got(1L).n_bands === 1)
    assert(got(1L).mean_px === 200.0)
    assert(got(2L).width === 8 && got(2L).mean_px === 0.0)
    assert(got(3L).width === -1 && got(3L).mean_px.isNaN)
  }

  test("native image_meta/gray_png expressions match the mapPartitions batch path") {
    // the codegen'd kernels (q104's path) and the typed-Dataset batch
    // decode must stay row-identical, including the corrupt-row marker
    val rows = Seq(
      (1L, "image/png", Media.grayPng(5, 3, 200)),
      (2L, "image/png", Media.grayPng(8, 8, 0)),
      (3L, "image/png", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "media")
    val viaExpr = rows.select(col("media_id"),
        graft.functions.MediaFunctions.imageMeta(col("media")).as("m"))
      .select(col("media_id"), col("m.width"), col("m.height"),
        col("m.n_bands"), col("m.mean_px"))
      .orderBy("media_id").collect().toSeq
    val viaBatch = Media.decodeImageMeta(spark, rows).toDF()
      .select("media_id", "width", "height", "n_bands", "mean_px")
      .orderBy("media_id").collect().toSeq
    assert(viaExpr.map(_.toString) === viaBatch.map(_.toString)) // NaN-safe
    // and the native PNG encoder round-trips through the native decoder
    val rt = spark.range(1, 4).select(col("id").cast("long").as("media_id"),
        graft.functions.MediaFunctions.grayPng(
          (col("id") + 2).cast("int"), (col("id") + 1).cast("int"),
          lit(77)).as("png"))
      .select(col("media_id"),
        graft.functions.MediaFunctions.imageMeta(col("png")).as("m"))
      .select(col("media_id"), col("m.width"), col("m.height"), col("m.mean_px"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(rt(1L) === ((3, 2, 77.0)) && rt(3L) === ((5, 4, 77.0)))
  }

  test("Media.extractFeatures: image kinds get real decoded features, others the stub") {
    val rows = Seq(
      (1L, "image/png", Media.grayPng(6, 4, 100), 0, 0, 0),
      (2L, "audio/wav", Array[Byte](10, 20, 30), 0, 0, 0))
      .toDF("media_id", "kind", "media", "width", "height", "sample_rate")
    val feats = Media.extractFeatures(spark, rows).collect().map(f => f.media_id -> f).toMap
    // decoded image features: [w, h, bands, mean, min, max, std, aspect]
    assert(feats(1L).feature.toSeq === Seq[Float](6f, 4f, 1f, 100f, 100f, 100f, 0f, 1.5f))
    assert(feats(2L).feature.length === 8) // stub path still produces the 8-dim shape
  }

  test("Media.resizeRaster: exact nearest-neighbor on rasters, pass-through otherwise") {
    // 4x4 grayscale gradient: pixel(x, y) = 16*y + x
    val raster = Array.tabulate(16)(i => i.toByte)
    val rows = Seq(
      (1L, "image", raster, 4, 4, 0),
      (2L, "image", Array[Byte](9, 9, 9), 0, 0, 0)) // undecoded blob
      .toDF("media_id", "kind", "media", "width", "height", "sample_rate")
    val out = Media.resizeRaster(spark, rows, 2, 2).collect()
      .map(r => r.media_id -> r).toMap
    // nearest-neighbor picks source pixels (0,0) (2,0) (0,2) (2,2)
    assert(out(1L).media.toSeq === Seq[Byte](0, 2, 8, 10))
    assert(out(1L).width === 2 && out(1L).height === 2)
    assert(out(2L).media.toSeq === Seq[Byte](9, 9, 9)) // codec decode stubbed
    assert(out(2L).width === 0)
  }

  test("gif container: native frame kernels match the batch path and feed resizeRaster") {
    import graft.functions.MediaFunctions
    // 3 docs x (1..3) constant-fill frames through the REAL JDK
    // sequence codec — q214's generate→decode chain in miniature
    // heights ride >= 5: the probed JDK small-frame GIF quirk zeroes
    // trailing rows below that (grayGif loud-fails on it)
    val gifs = spark.range(1, 4).select(col("id").cast("long").as("media_id"),
      MediaFunctions.grayGif((col("id") + 3).cast("int"),
        (col("id") + 5).cast("int"),
        transform(sequence(lit(0L), col("id") % 3),
          f => ((col("id") * 50 + f * 30) % 251).cast("int"))).as("media"))
    val viaExpr = gifs.select(col("media_id"),
        explode(MediaFunctions.gifFrames(col("media"))).as("fr"))
      .select(col("media_id"), col("fr.frame"), col("fr.width"),
        col("fr.height"), col("fr.mean_px"))
      .orderBy("media_id", "frame").collect().toSeq
    // frame counts and the closed-form round trip
    assert(viaExpr.map(r => (r.getLong(0), r.getInt(1))) ===
      Seq((1L, 0), (1L, 1), (2L, 0), (2L, 1), (2L, 2), (3L, 0)))
    viaExpr.foreach { r =>
      val (id, f) = (r.getLong(0), r.getInt(1))
      assert(r.getInt(2) === id + 3 && r.getInt(3) === id + 5)
      assert(r.getDouble(4) === ((id * 50 + f * 30) % 251).toDouble)
    }
    // the mapPartitions batch variant is row-identical to the kernel
    val viaBatch = Media.decodeGifFrames(spark, gifs).toDF()
      .select("media_id", "frame", "width", "height", "mean_px")
      .orderBy("media_id", "frame").collect().toSeq
    assert(viaExpr.map(_.toString) === viaBatch.map(_.toString))
    // corrupt payloads degrade per-row: no frames, no task death
    val corrupt = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "media")
    assert(Media.decodeGifFrames(spark, corrupt).isEmpty)
    assert(corrupt.select(explode(MediaFunctions.gifFrames(col("media"))))
      .isEmpty)
  }

  test("gif_frame_raster bridges a container frame into resizeRaster's real branch") {
    import graft.functions.MediaFunctions
    // one 6x6 two-frame container; frame 1 (fill 200) extracts as a
    // raw gray raster, which resizeRaster REALLY resamples — the
    // container pass-through branch is no longer the only route for
    // codec blobs
    val rows = spark.range(1, 2).select(lit(1L).as("media_id"),
        lit("image/gif").as("kind"),
        MediaFunctions.grayGif(lit(6), lit(6),
          array(lit(10), lit(200))).as("gif"))
      .select(col("media_id"), col("kind"),
        MediaFunctions.gifFrameRaster(col("gif"), lit(1)).as("media"),
        lit(6).as("width"), lit(6).as("height"), lit(0).as("sample_rate"))
    val raster = rows.select("media").head().getAs[Array[Byte]](0)
    assert(raster.length === 36 && raster.forall(b => (b & 0xFF) === 200))
    val resized = Media.resizeRaster(spark, rows, 3, 2).collect()
    assert(resized.length === 1)
    assert(resized.head.width === 3 && resized.head.height === 2)
    assert(resized.head.media.toSeq === Seq.fill(6)(200.toByte))
    // out-of-range frame and undecodable payload yield NULL, not death
    val nulls = spark.range(1, 2).select(
      MediaFunctions.gifFrameRaster(
        MediaFunctions.grayGif(lit(5), lit(5), array(lit(1))), lit(5))
        .as("missing"),
      MediaFunctions.gifFrameRaster(lit(Array[Byte](1, 2, 3)), lit(0))
        .as("corrupt")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("gif_frame_rasters (fused one-pass sampler) is byte-identical to per-frame decode") {
    import graft.functions.MediaFunctions
    // a 5-frame container: stride 2 must emit frames 0, 2, 4 with the
    // exact bytes the per-frame kernel extracts
    val gif = spark.range(1, 2).select(
        MediaFunctions.grayGif(lit(7), lit(5),
          array(lit(10), lit(40), lit(90), lit(160), lit(250))).as("g"))
    val fused = gif.select(explode(
        MediaFunctions.gifFrameRasters(col("g"), 2)).as("fr"))
      .select(col("fr.frame"), col("fr.raster"))
      .as[(Int, Array[Byte])].collect().sortBy(_._1)
    assert(fused.map(_._1).toSeq === Seq(0, 2, 4))
    fused.foreach { case (f, raster) =>
      val single = gif.select(
        MediaFunctions.gifFrameRaster(col("g"), lit(f))).head()
        .getAs[Array[Byte]](0)
      assert(raster.toSeq === single.toSeq, s"frame $f")
    }
    // stride 1 emits every frame; corrupt payload degrades to empty
    assert(gif.select(size(MediaFunctions.gifFrameRasters(col("g"), 1)))
      .head().getInt(0) === 5)
    assert(spark.range(1, 2).select(size(
        MediaFunctions.gifFrameRasters(lit(Array[Byte](9, 9)), 2)))
      .head().getInt(0) === 0)
  }

  test("Media.sampleSegments produces stride-aligned byte windows") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val segs = Media.sampleSegments(Media.fromText(docs, "doc_id", "text", "blob"), 4, 4)
      .orderBy("segment_idx")
      .select(col("segment_idx"), decode(col("segment"), "UTF-8"))
      .as[(Long, String)].collect().toSeq
    assert(segs === Seq((0L, "abcd"), (1L, "efgh"), (2L, "ij")))
  }

  test("sftTranscripts assembles role-alternating, tail-truncated sessions (q230)") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    // user 1: one session of 10 turns (truncates to the LAST 8);
    // user 2: two sessions split by the 30-min gap
    val evs = ((1 to 10).map(i => (i.toLong, ts(i), 1L, s"e$i", 0.0, "{}")) ++
      Seq((20L, ts(100), 2L, "a", 0.0, "{}"), (21L, ts(101), 2L, "b", 0.0, "{}"),
          (22L, ts(200), 2L, "c", 0.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.sftTranscripts(evs, gapMinutes = 30, maxTurns = 8)
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // user 1: turns 3..10 kept; kept index 0 (e3) is 'user', alternating
    val want1 = (3 to 10).zipWithIndex.map { case (i, idx) =>
      s"${if (idx % 2 == 0) "user" else "assistant"}: e$i"
    }.mkString("\n")
    assert(got((1L, 1L)) === (8L, want1))
    assert(got((2L, 1L)) === (2L, "user: a\nassistant: b"))
    assert(got((2L, 2L)) === (1L, "user: c"))
  }

  test("sessionize splits on gap and streaming twin matches batch counts") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val evs = Seq(
      (1L, 100L, ts(0)), (2L, 100L, ts(10)), (3L, 100L, ts(50)),
      (4L, 200L, ts(5))).toDF("event_id", "user_id", "ts")
    val batch = Events.sessionCounts(evs, gapMinutes = 30)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(batch === Map(100L -> 2L, 200L -> 1L))

    val dir = Files.createTempDirectory("events").toString
    evs.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val streamed = Events.sessionCountsStream(spark, stream, 30)
    val q = streamed.writeStream.format("memory").queryName("sess")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess").as[Events.UserSessions].collect()
      .map(u => u.user_id -> u.n_sessions).toMap
    assert(got === Map(100L -> 2L, 200L -> 1L))
  }

  test("hourlyStats streaming twin matches batch on bounded input") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val evs = Seq(
      (1L, ts(0), "click", 1.25), (2L, ts(30), "click", 2.25), (3L, ts(70), "view", 4.0))
      .toDF("event_id", "ts", "event_type", "value")
    val dir = Files.createTempDirectory("events2").toString
    evs.write.mode("overwrite").parquet(dir)
    val batch = Events.hourlyStats(evs)
      .select(col("event_type"), col("n_events"), col("sum_value"))
      .as[(String, Long, Double)].collect().toSet

    val schema = spark.read.parquet(dir).schema
    val got = Events.runAvailableNow(spark, dir, schema,
        df => Events.hourlyStatsStream(df), "hourly",
        org.apache.spark.sql.streaming.OutputMode.Append())
    // watermark append-mode emits only closed windows; compare on complete
    val q2 = Events.hourlyStatsStream(spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("hourly_c").outputMode("complete").start()
    q2.processAllAvailable(); q2.stop()
    val streamed = spark.table("hourly_c")
      .select(col("event_type"), col("n_events"), col("sum_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(streamed === batch)
  }

  test("flatMapGroupsWithState emits closed session windows across micro-batches") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val dir = Files.createTempDirectory("sessw").toString
    // batch 1: user 100 has one closed session (0-10) once minute 50 arrives
    Seq((1L, 100L, ts(0)), (2L, 100L, ts(10)), (3L, 100L, ts(50)))
      .toDF("event_id", "user_id", "ts").write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = Events.sessionWindowsStream(spark, stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessw").outputMode("append").start()
    q.processAllAvailable()
    val afterB1 = spark.table("sessw").as[Events.SessionWindow].collect()
    assert(afterB1.map(w => (w.user_id, w.session_seq, w.n_events)).toSet ===
      Set((100L, 1L, 2L))) // minutes 0+10 closed by minute 50

    // batch 2: minute 55 continues the open session; minute 120 closes it
    Seq((4L, 100L, ts(55)), (5L, 100L, ts(120)))
      .toDF("event_id", "user_id", "ts").write.parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sessw").as[Events.SessionWindow].collect()
    assert(all.map(w => (w.user_id, w.session_seq, w.n_events)).toSet ===
      Set((100L, 1L, 2L), (100L, 2L, 2L))) // 50+55 closed by 120; 120 still open
  }

  test("distinctKeysStream suppresses cross-micro-batch duplicates within the horizon") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val dir = Files.createTempDirectory("dedupst").toString
    Seq((100L, "click", ts(0)), (100L, "click", ts(1)), (200L, "view", ts(2)))
      .toDF("user_id", "event_type", "ts").write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = Events.distinctKeysStream(stream, Seq("user_id", "event_type"),
        delay = "1 hour")
      .writeStream.format("memory").queryName("dedupst").outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("dedupst").as[(Long, String)].collect().toSet ===
      Set((100L, "click"), (200L, "view")))

    // batch 2: duplicate within the horizon suppressed, new key emitted;
    // batch twin agrees on the final distinct set
    Seq((100L, "click", ts(10)), (300L, "click", ts(12)))
      .toDF("user_id", "event_type", "ts").write.parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dedupst").as[(Long, String)].collect().toSet
    assert(streamed === Set((100L, "click"), (200L, "view"), (300L, "click")))
    val batch = Events.distinctKeys(spark.read.parquet(s"$dir/b*/"),
      Seq("user_id", "event_type")).as[(Long, String)].collect().toSet
    assert(batch === streamed)
  }

  test("PcmWindowFeatures: exact features on a hand-computed square wave") {
    import graft.functions.MediaFunctions
    // 600 samples of a +1000/-1000 square wave flipping every sample:
    // RMS is exactly 1000 in every window, every step is a zero
    // crossing (255 within a full 256 window, 87 within the 88-sample
    // tail), peak 1000; plus a short ramp payload and an odd trailing
    // byte that must be ignored
    def le16(s: Int): Array[Byte] =
      Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)
    val square = (0 until 600).flatMap(i =>
      le16(if (i % 2 == 0) 1000 else -1000)).toArray
    val ramp = (0 until 10).flatMap(i => le16(i * 100)).toArray :+ 0x7F.toByte
    val df = Seq((1L, square), (2L, ramp)).toDF("media_id", "media")
    val got = df.select(col("media_id"),
        explode(MediaFunctions.pcmWindowFeatures(col("media"), 256)).as("w"))
      .select(col("media_id").cast("long"), col("w.win").cast("int"),
        col("w.rms_micros").cast("long"), col("w.zero_crossings").cast("int"),
        col("w.peak").cast("int"))
      .as[(Long, Int, Long, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(got.filter(_._1 == 1L) === Seq(
      (1L, 0, 1000000000L, 255, 1000),
      (1L, 1, 1000000000L, 255, 1000),
      (1L, 2, 1000000000L, 87, 1000)))
    // ramp: 10 samples 0,100,...,900 — rms = sqrt(285000/10)*1e6,
    // no sign change, peak 900; the odd 0x7F byte contributes nothing
    val rampRow = got.filter(_._1 == 2L)
    assert(rampRow === Seq((2L, 0,
      math.floor(math.sqrt(285000.0) * 1e6 + 0.5).toLong, 0, 900)))
  }
}
