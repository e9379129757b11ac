package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** S1-S4 driven through MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-streaming-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // base offset: an event at exactly epoch 0 is dropped by the initial
  // watermark (ts <= watermark=0), so tests start one day in
  private val Base = 24L * 60
  private def ts(minute: Int) = new Timestamp((Base + minute) * 60000L)

  test("S1: tumbling window agg with watermark emits closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("s1").outputMode("append").start()
    in.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0))
    q.processAllAvailable()
    // watermark = 70min - 60min = 10min: first hour window not yet closed
    in.addData(Event(4, ts(200), 2, "view", 4.0)) // advance watermark past 1st+2nd windows
    q.processAllAvailable()
    val rows = spark.table("s1").collect()
    q.stop()
    val byWindow = rows.map(r => (r.getTimestamp(0).getTime / 60000 - Base, r.getString(1),
      r.getLong(2), r.getDouble(3))).toSet
    assert(byWindow.contains((0L, "click", 2L, 3.0)))
    assert(byWindow.contains((60L, "view", 1L, 3.0)))
  }

  test("S2: streaming sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("s2").outputMode("append").start()
    // user 1: two events 5min apart (one session), then 40min gap → new session
    in.addData(Event(1, ts(0), 1, "c", 0), Event(2, ts(5), 1, "c", 0))
    q.processAllAvailable()
    in.addData(Event(3, ts(45), 1, "c", 0))
    q.processAllAvailable()
    // push watermark far ahead so the timeout fires and closes everything
    in.addData(Event(9, ts(600), 2, "c", 0))
    q.processAllAvailable()
    in.addData(Event(10, ts(1200), 2, "c", 0))
    q.processAllAvailable()
    val got = spark.table("s2").as[Session].collect().filter(_.user_id == 1)
      .map(s => (s.start_ms / 60000 - Base, s.end_ms / 60000 - Base, s.n_events)).toSet
    q.stop()
    assert(got.contains((0L, 5L, 2L)))   // first session: events at 0,5
    assert(got.contains((45L, 45L, 1L))) // second session after the gap
  }

  test("S3: stream-static broadcast enrich") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val in = MemoryStream[Event]
    val q = EventStreams.enrich(in.toDF(), dim, "user_id", "cust_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("s3").outputMode("append").start()
    in.addData(Event(1, ts(0), 1, "c", 0), Event(2, ts(1), 9, "c", 0))
    q.processAllAvailable()
    val got = spark.table("s3").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    q.stop()
    assert(got == Set((1L, Some("gold")), (2L, None)))
  }

  test("S4: streaming dedup drops the duplicate event_id within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedup(in.toDF())
      .select("event_id")
      .writeStream.format("memory").queryName("s4").outputMode("append").start()
    in.addData(Event(1, ts(0), 1, "c", 0), Event(1, ts(2), 1, "c", 0),
      Event(2, ts(3), 1, "c", 0))
    q.processAllAvailable()
    val got = spark.table("s4").collect().map(_.getLong(0)).toList.sorted
    q.stop()
    assert(got == List(1L, 2L))
  }

  test("S2: late within-watermark events extend sessions backwards, never end < start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("s2b").outputMode("append").start()
    in.addData(Event(1, ts(100), 9, "c", 0))
    q.processAllAvailable()
    // late event (t=95 < state.last=100) arriving in a later micro-batch,
    // still above the watermark (100min - 60min = 40min): must merge into
    // the session as its new START, not overwrite `last` backwards
    in.addData(Event(2, ts(95), 9, "c", 0))
    q.processAllAvailable()
    in.addData(Event(3, ts(200), 8, "c", 0)) // advance watermark → timeout closes user 9
    q.processAllAvailable()
    val u9 = spark.table("s2b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == 9L)
    q.stop()
    assert(u9.nonEmpty, "user 9's session must close on watermark advance")
    assert(u9.forall { case (_, s, e, _) => s <= e }, s"end before start: ${u9.toSeq}")
    assert(u9.head == ((9L, (Base + 95) * 60000L, (Base + 100) * 60000L, 2L)))
  }

  test("S5: streaming near-dup flags docs against the static fingerprint index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "an entirely different document about spark query planning and shuffles"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.withSimhash(corpus)
      .select(col("doc_id"), col("simhash"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.nearDupFlag(
        in.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("s5").outputMode("append").start()
    in.addData(
      // reordered duplicate of doc 100 (same distinct word set → same
      // fingerprint, hamming 0) → must flag
      (1L, "again and again the lazy dog jumps today over the quick brown fox"),
      // unrelated content → must not flag
      (2L, "completely unrelated text with nothing matching whatsoever nearby"))
    q.processAllAvailable()
    val got = spark.table("s5").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got.contains((1L, 100L)))
    assert(!got.exists(_._1 == 2L))
  }

  test("S5b: pre-bucketed band index — broadcast-free plan, identical matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "an entirely different document about spark query planning and shuffles"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.withSimhash(corpus)
      .select(col("doc_id"), col("simhash"))
    val table = "s5b_band_index"
    val path = s"/tmp/${graft.Reset.ScratchPrefix}s5b_index"
    graft.streaming.DocStreams.writeBandIndex(index, table, buckets = 8,
      path = Some(path))
    try {
      val docs = Seq(
        (1L, "again and again the lazy dog jumps today over the quick brown fox"),
        (2L, "completely unrelated text with nothing matching whatsoever nearby"))
      // plan shape (the batch form of the identical join): the bucketed
      // index side must read in place — the ONLY exchange is the probe
      // side shuffling to the index's bucketing, and nothing broadcasts
      val batch = graft.streaming.DocStreams.nearDupFlagBucketed(
        docs.toDF("doc_id", "text"), spark, table)
      // string match, not TreeNode.collect: under AQE the executedPlan is
      // an AdaptiveSparkPlanExec wrapper whose inner tree collect() does
      // not traverse
      val p = batch.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(p).size == 1,
        s"expected exactly one (probe-side) exchange, got:\n$p")
      assert(!p.contains("BroadcastExchange"),
        "the index must never broadcast in the bucketed variant\n" + p)
      assert(p.contains("Bucketed: true"),
        "the index side must read its buckets in place\n" + p)
      assert(p.contains("ShuffledHashJoin") && p.contains("BuildLeft"),
        "the tiny banded batch must be the build side\n" + p)
      // match parity with the broadcast probe (S5), batch AND stream
      val expected = graft.streaming.DocStreams.nearDupFlag(
          docs.toDF("doc_id", "text"), index)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet == expected, "bucketed batch probe must match the broadcast probe")
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.DocStreams.nearDupFlagBucketed(
          in.toDF().toDF("doc_id", "text"), spark, table)
        .writeStream.format("memory").queryName("s5b").outputMode("append").start()
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("s5b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      q.stop()
      assert(got == expected, "stream and broadcast probes must agree")
      assert(got.exists(m => m._1 == 1L && m._2 == 100L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
    }
  }

  test("S6: streaming ingest gate admits exactly what the batch gate admits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stops = "the a and of to in is that for on" // pure en stopwords
    val docs = Seq(
      (1L, (stops + " ") * 3 + stops, "zh"),   // 40 stopwords → passes gate; zh keeps all
      (2L, (stops + " ") * 2 + stops, "en"),   // 30 stopwords → passes gate; en sampled at 500/1000
      (3L, "!!! ??? ###", "zh"),               // punctuation junk → fails gate
      (4L, "short text", "zh"))                // too few words → fails gate
    val staticDf = docs.toDF("doc_id", "text", "lang")
    val expected = graft.streaming.DocStreams.ingestGate(staticDf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(expected.exists(_._1 == 1L), "doc 1 must survive the batch gate")
    assert(!expected.exists(e => e._1 == 3L || e._1 == 4L))
    val in = MemoryStream[(Long, String, String)]
    val q = graft.streaming.DocStreams.ingestGate(
        in.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("s6").outputMode("append").start()
    in.addData(docs: _*)
    q.processAllAvailable()
    val got = spark.table("s6").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    q.stop()
    assert(got == expected, "stream and batch admission must be bit-identical")
  }

  test("S8: streaming heavy hitters keep bounded MG state; heavies survive cross-batch churn") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 8
    // two batches per language: a long churn tail of singletons (far
    // over capacity, so trims run in both batches) around planted
    // heavies split ACROSS the batches — only cumulative state finds
    // them. N per lang = 300 tail + 120 heavy ≈ 420; bound N/(m+1) ≈ 47,
    // each heavy totals 60.
    // letters-only distinct tail tokens (digits would split under the
    // [a-z]+ tokenizer and collapse the whole tail onto one token)
    def alpha(i0: Int): String = {
      var n = i0; val sb = new StringBuilder
      do { sb.insert(0, ('a' + n % 26).toChar); n /= 26 } while (n > 0)
      "t" + sb.result()
    }
    def tail(lo: Int, hi: Int) = (lo until hi).map(alpha)
    def batchDocs(lang: String, batch: Int): Seq[(Long, String, String)] = {
      val heavyText = (s"hot${lang}a " * 30) + (s"hot${lang}b " * 30)
      val tailDocs = tail(batch * 150, batch * 150 + 150).mkString(" ")
      Seq((batch.toLong * 10 + (if (lang == "en") 0 else 1),
        heavyText + tailDocs, lang))
    }
    val in = MemoryStream[(Long, String, String)]
    val q = graft.streaming.DocStreams.streamingHeavyHitters(
        in.toDF().toDF("doc_id", "text", "lang"), m)
      .writeStream.format("memory").queryName("s8").outputMode("update").start()
    in.addData(batchDocs("en", 0) ++ batchDocs("de", 0): _*)
    q.processAllAvailable()
    in.addData(batchDocs("en", 1) ++ batchDocs("de", 1): _*)
    q.processAllAvailable()
    // last update per language = the cumulative state
    val rows = spark.table("s8").collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
    val last = rows.zipWithIndex.groupBy(_._1._1)
      .map { case (lang, rs) => lang -> rs.maxBy(_._2)._1._2 }
    q.stop()
    for (lang <- Seq("en", "de")) {
      val cands = last(lang)
      assert(cands.length <= m, s"$lang state over capacity: ${cands.length}")
      for (h <- Seq(s"hot${lang}a", s"hot${lang}b"))
        assert(cands.contains(h),
          s"$lang heavy '$h' (60 > bound ~47) missing from $cands")
    }
  }

  test("S7: per-op insert bench commits one op per micro-batch; admissions match the batch gate") {
    import graft.streaming.{DocStreams, InsertBench}
    val nOps = 12
    val got = InsertBench.insertStream(spark, nOps)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    // every admitted op is one of the first nOps singleton batches
    assert(got.forall(_._1 < nOps), s"op ids past the requested count: $got")
    // parity: the streaming gate must admit exactly the docs the batch
    // gate admits for the same deterministic per-op documents (the
    // lambda-architecture consistency claim, per-op edition)
    val want = DocStreams.ingestGate(
        spark.range(nOps).toDF("value").select(InsertBench.docExpr: _*))
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(got == want, s"stream admitted $got, batch admits $want")
    assert(want.nonEmpty, "gate admitted nothing — bench would time an empty path")
  }

  test("S7c: insert bench row sets are identical across independent runs") {
    // The rows-only correctness gate for the insert family leans on the
    // admitted set being a pure function of the op id — nothing from the
    // rate source's wall-clock timestamps may leak into the gate or the
    // output. Two fully independent runs (separate queries, separate
    // checkpoints) must produce the same rows.
    import graft.streaming.InsertBench
    val a = InsertBench.insertStream(spark, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    val b = InsertBench.insertStream(spark, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(a == b, s"insertStream not run-deterministic: $a vs $b")
    val ea = InsertBench.insertEdges(spark, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val eb = InsertBench.insertEdges(spark, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ea == eb, s"insertEdges not run-deterministic: $ea vs $eb")
  }

  test("S7b: edge insert bench appends exactly one deterministic edge per op") {
    import graft.streaming.InsertBench
    val nOps = 10
    val got = InsertBench.insertEdges(spark, nOps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val k = InsertBench.EdgeNodeSpace
    val want = (0L until nOps).map(i => (i, i % k, (31 * i + 7) % k)).toSet
    // no gate on the edge path: every op lands, exactly once
    assert(got == want, s"edge set mismatch: got $got")
  }

  test("M: mediaMeta decodes real container headers to the planted dims") {
    import graft.operators.{MediaCodec, Multimodal}
    val dir = "/root/testdata/sf0.001"
    val bodyLens = graft.sources.Tables.documents(spark, dir)
      .selectExpr("doc_id", "CAST(length(text) AS INT) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val meta = Multimodal.mediaMeta(spark, dir).collect()
    assert(meta.length == bodyLens.size)
    meta.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (r.getInt(4), r.getInt(5))
      r.getString(1) match {
        case "audio" =>
          assert(w == 8 * (1 + (id % 5)).toInt, s"doc $id: wav kHz $w")
          assert(h == 1 + (id % 2).toInt, s"doc $id: wav channels $h")
          assert(r.getInt(2) == bodyLens(id) + MediaCodec.WavHeaderLen)
        case fmt => // image (PNG) and video (JPEG keyframe) share the forms
          assert(w == 16 + bodyLens(id) % 240, s"doc $id ($fmt): width $w")
          assert(h == 16 + ((id * 7) % 240).toInt, s"doc $id ($fmt): height $h")
          val hdr = if (fmt == "image") MediaCodec.PngHeaderLen else MediaCodec.JpegHeaderLen
          assert(r.getInt(2) == bodyLens(id) + hdr)
      }
    }
  }

  test("M: persisted mediaEncoded table prunes on metadata before any decode") {
    // the 100 TB ingest shape: the encoded table is persisted with
    // n_bytes/magic as real columns, so a format filter reaches the
    // parquet scan (PushedFilters) and the payload column is never read
    val dir = java.nio.file.Files.createTempDirectory("graft_media_enc").toString
    graft.operators.Multimodal.mediaEncoded(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
      .filter(col("magic") === "89504e47").select("doc_id", "n_bytes")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("magic"),
      s"magic filter not pushed to the scan:\n$plan")
    assert(!plan.contains("payload"), s"payload column read for a metadata query:\n$plan")
    val pngs = scan.count()
    assert(pngs > 0, "no PNG rows — the magic column or filter is wrong")
  }

  test("M: MediaCodec.decode rejects malformed and mislabeled containers") {
    import graft.operators.MediaCodec
    val body = "the compressed stream stand-in".getBytes("US-ASCII")
    val png = MediaCodec.encode(5L, "image", body)
    val wav = MediaCodec.encode(5L, "audio", body)
    val jpg = MediaCodec.encode(5L, "video", body)
    // round-trip sanity on the planted forms
    assert(MediaCodec.decode("image", png) == (16 + body.length % 240, 16 + (5 * 7) % 240))
    assert(MediaCodec.decode("audio", wav) == (8, 2))
    assert(MediaCodec.decode("video", jpg) == (16 + body.length % 240, 16 + (5 * 7) % 240))
    def throws(f: => Any): Boolean =
      try { f; false } catch { case _: IllegalArgumentException => true }
    // mislabeled: tag says one container, bytes are another
    assert(throws(MediaCodec.decode("image", wav)), "PNG parser accepted a WAV")
    assert(throws(MediaCodec.decode("audio", png)), "WAV parser accepted a PNG")
    assert(throws(MediaCodec.decode("video", wav)), "JPEG parser accepted a WAV")
    // corrupt: flip one IHDR data byte -> CRC must catch it
    val crcBroken = png.clone(); crcBroken(17) = (crcBroken(17) ^ 0x01).toByte
    assert(throws(MediaCodec.decode("image", crcBroken)), "PNG CRC not checked")
    // corrupt: truncate the WAV fmt chunk tag
    val noFmt = wav.clone(); noFmt(12) = 'X'.toByte
    assert(throws(MediaCodec.decode("audio", noFmt)), "missing fmt chunk not caught")
    // corrupt: JPEG with the SOF segment marker overwritten (walks to body)
    val noSof = jpg.clone(); noSof(21) = 0xfe.toByte
    assert(throws(MediaCodec.decode("video", noSof)), "SOF-less JPEG not caught")
    assert(throws(MediaCodec.decode("pdf", png)), "unknown tag not rejected")
  }
}
