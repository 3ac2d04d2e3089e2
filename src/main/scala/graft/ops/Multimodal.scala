package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `BINARY`
  * columns with typed metadata alongside, flowing through the relational
  * operators unchanged. No image/audio codecs exist in this environment,
  * so the decode kernel is a clearly-marked deterministic STUB — the
  * Spark-side shape (binary column, batched mapPartitions, feature
  * schema, partition-preserving narrow exec) is the real, tested part.
  */
object Multimodal {

  /** Input row shape for the feature extractor. */
  case class MediaIn(doc_id: Long, media: Array[Byte])

  /** Extracted feature row (widths/heights are STUB-derived). */
  case class MediaFeat(doc_id: Long, n_bytes: Long, mean_byte: Double,
      width: Int, height: Int, n_frames: Int)

  /** STUB decode, batch-at-a-time: a real build would hand the whole
    * batch to an image codec (the reason m02 groups rows — the batch
    * boundary is the kernel's amortization unit, mirroring mapInPandas'
    * Arrow batches); this derives deterministic fake dimensions/stats
    * from each payload so the pipeline is testable end-to-end. */
  private def decodeBatch(batch: Seq[MediaIn]): Seq[MediaFeat] =
    batch.map { m =>
      val n = m.media.length.toLong
      var s = 0.0
      var i = 0
      while (i < m.media.length) { s += (m.media(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else s / n
      MediaFeat(m.doc_id, n, mean,
        width = 64 + (n % 576).toInt,
        height = 64 + ((n * 7) % 416).toInt,
        n_frames = 1 + (n % 30).toInt)
    }

  // ---------------------------------------------------------------------
  // m01: metadata projection over the binary column — portable SQL, so
  // oracle-checked: proves binary columns survive the relational layer.
  // ---------------------------------------------------------------------
  def m01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("media"), $"n_chars")
      .select(
        $"doc_id",
        octet_length($"media").cast("long").as("n_bytes"),
        (lit(64L) + $"n_chars" % 576).as("width"),
        (lit(64L) + ($"n_chars" * 7) % 416).as("height"),
        (lit(1L) + $"n_chars" % 30).as("n_frames"))
      .orderBy($"doc_id")
  }

  private val m01Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  64 + n_chars % 576 AS width,
      |  64 + (n_chars * 7) % 416 AS height,
      |  1 + n_chars % 30 AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // m02: batched feature extraction over the binary column via typed
  // mapPartitions (the Scala analogue of mapInPandas: iterator-of-batches
  // keeps peak memory bounded to one batch per task at any scale).
  // ---------------------------------------------------------------------
  def m02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
      .as[MediaIn]
      .mapPartitions(it => it.grouped(256).flatMap(decodeBatch))
      .toDF()
      .orderBy($"doc_id")
  }

  // mean_byte is a sum of integer byte values accumulated in a double —
  // exact below 2^53, so engine-portable; the testdata text is ASCII, so
  // UTF-8 byte values = codepoints (checked: octet_length = length).
  private val m02Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
      |    ELSE CAST(list_sum(list_transform(string_split_regex(text, ''), c -> unicode(c))) AS DOUBLE)
      |      / octet_length(encode(text)) END AS mean_byte,
      |  CAST(64 + octet_length(encode(text)) % 576 AS INTEGER) AS width,
      |  CAST(64 + (octet_length(encode(text)) * 7) % 416 AS INTEGER) AS height,
      |  CAST(1 + octet_length(encode(text)) % 30 AS INTEGER) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // m03: frame sampling — every 5th frame index of each media payload
  // (n_frames from the m01 stub metadata), with the byte offset each
  // frame would start at (integer division). The explode is the
  // video-pipeline shape: one row per sampled frame, bounded fan-out
  // (≤ ceil(30/5) rows per doc), pure narrow compute.
  // ---------------------------------------------------------------------
  def m03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("media"), $"n_chars")
      .withColumn("n_bytes", octet_length($"media").cast("long"))
      .withColumn("n_frames", lit(1L) + $"n_chars" % 30)
      .select($"doc_id", $"n_frames",
        explode(sequence(lit(0L), $"n_frames" - 1, lit(5L))).as("frame_idx"))
      .withColumn("frame_offset", $"frame_idx" * lit(991L))
      .orderBy($"doc_id", $"frame_idx")
  }

  private val m03Sql =
    """SELECT doc_id, 1 + n_chars % 30 AS n_frames,
      |  unnest(range(0, 1 + n_chars % 30, 5)) AS frame_idx,
      |  unnest(range(0, 1 + n_chars % 30, 5)) * 991 AS frame_offset
      |FROM documents
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  // m04: perceptual-hash near-dup over media payloads — the image-dedup
  // pattern: aHash (block-mean bits) signatures, banded candidates,
  // Hamming verify. The codegen'd AHashSig kernel builds each 60-bit
  // signature in a narrow no-shuffle map; candidates and verification
  // reuse d04's 4×15-bit banding + bit_count(XOR) back end
  // (Dedup.d04Pairs) — generate-by-key then verify, no all-pairs.
  //
  // The payloads: no image codec exists in this env (the m01-m03 stub
  // convention), so each doc carries a DETERMINISTIC synthesized
  // "decoded image" — 60 intensity blocks whose level is a modular
  // sawtooth of the doc's visual group (doc_id % 120) plus per-byte
  // noise, at a per-doc LENGTH (600..960 bytes). Same-group docs are
  // the planted near-dups: their payloads differ in length and noise
  // but share the block-level structure, which is exactly the
  // invariance aHash exists to catch (a resized/re-encoded image
  // matches). The signature is exact integer arithmetic
  // (cross-multiplied block means), so the DuckDB oracle rebuilds the
  // same bytes and bits and the whole pipeline is hash-verified.
  // ---------------------------------------------------------------------
  // payload byte j of doc d: 32 + h60(group ":" blockIdx) % 90 + noise.
  // Block levels come from the repo's portable md5-derived h60 (truly
  // independent across groups — arithmetic mixing mod 90 stays locally
  // linear and left cross-group Hamming collisions), so the planted
  // same-group pairs separate cleanly: Hamming ≤ 2 within a group,
  // ≥ 15 across groups (measured). ASCII-range bytes so `encode`
  // yields one byte per char on both engines.
  //
  // Synthesis runs in the codegen M04Payload kernel (block levels are
  // (group, blockIdx)-pure → cached 120×60 table, primitive loop per
  // row); the equivalent SQL HOF below documents the semantics and is
  // the spec's cross-route pin (MediaKernelSpec asserts kernel == HOF).
  // The HOF route costs an interpreted md5 PER BYTE — 22s vs <1s at
  // sf0.1 — which is why the kernel exists.
  private[graft] val m04PayloadSpark =
    "encode(array_join(transform(sequence(0, 599 + (doc_id % 7) * 60)," +
      " j -> char(32 + cast(conv(substring(md5(concat(" +
      "cast(doc_id % 120 as string), ':'," +
      " cast((j * 60) div (600 + (doc_id % 7) * 60) as string)" +
      ")), 1, 15), 16, 10) as bigint) % 90" +
      " + (doc_id * 7 + j) % 3)), ''), 'UTF-8')"

  def m04(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.d04Pairs(Tables.load(spark, dir, "documents")
      .select($"doc_id",
        graft.functions.AHash.sigCol(spark,
          graft.functions.M04Synth.payloadCol(spark, $"doc_id"))
          .as("simhash"))
      .filter($"simhash".isNotNull))
  }

  private def m04Sql: String = {
    val B = graft.functions.AHash.Bits
    // bit b: block = bytes[(b·n)/B, ((b+1)·n)/B) (0-based half-open →
    // 1-based inclusive slice), set when blockSum·n ≥ total·blockLen
    val terms = (0 until B).map { b =>
      val lo = s"((${b} * n) // $B)"
      val hi = s"((${b + 1} * n) // $B)"
      s"(CASE WHEN $hi > $lo AND COALESCE(list_sum(bytes[$lo + 1 : $hi]), 0) * n >= total * ($hi - $lo) THEN ${1L << b} ELSE 0 END)"
    }.mkString("\n      + ")
    s"""WITH bl AS (
       |  SELECT doc_id, 600 + (doc_id % 7) * 60 AS n,
       |    list_transform(range(0, 600 + (doc_id % 7) * 60),
       |      j -> 32 + CAST('0x' || substring(md5(
       |          CAST(doc_id % 120 AS VARCHAR) || ':' ||
       |          CAST((j * 60) // (600 + (doc_id % 7) * 60) AS VARCHAR)),
       |        1, 15) AS BIGINT) % 90
       |        + (doc_id * 7 + j) % 3) AS bytes
       |  FROM documents),
       |tot AS (SELECT doc_id, bytes, n, list_sum(bytes) AS total FROM bl),
       |sigs AS (SELECT doc_id, CAST($terms AS BIGINT) AS sig FROM tot),
       |chunks AS (
       |  SELECT doc_id, sig, k, (sig >> (k * 15)) & ${(1L << 15) - 1} AS v
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS k)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    x.sig AS sa, y.sig AS sb
       |  FROM chunks x JOIN chunks y
       |    ON x.k = y.k AND x.v = y.v AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sa, sb)) <= 6
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // m05: VIDEO-level near-dup via frame-fingerprint overlap — the
  // Content-ID shape: each video contributes its per-frame perceptual
  // fingerprints to an inverted index (fp → videos), candidate pairs
  // come from sharing a frame fp (NO all-pairs), and a pair is a
  // near-dup when shared distinct fps ≥ half the shorter video's frame
  // count — which catches clipped/re-cut copies (a phase-shifted or
  // truncated re-upload shares most frames; an unrelated video shares
  // none). Hot fps (> DfCap videos — intro/outro cards, test patterns)
  // are dropped from the index before the join, the same stop-key cap
  // as d02/d07, so no fp fans out quadratically.
  //
  // Frames: no video codec in this env (the m01–m04 stub convention),
  // so frame fingerprints are synthesized deterministically — video
  // family g = doc_id div 7 (contiguous families of a FIXED size, so
  // the planted structure and per-fp df are scale-invariant — a
  // %-based family would grow with the corpus and trip the cap),
  // phase = doc_id % 3, frame f of a video has
  // fp = md5(g ":" (f + phase)). Same-family videos at different
  // phases are the planted clipped copies; same-phase members are
  // exact re-uploads (overlap 1.0); across families the md5 keyspace
  // is disjoint. Portable: both engines compute identical md5 hex.
  //
  // Scale: linear in total frames; the pair-agg shuffles only
  // same-fp collisions (df-capped); production frame rates just raise
  // the per-video fan-out constant.
  // ---------------------------------------------------------------------
  private val M05DfCap = 64L

  def m05(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = Tables.load(spark, dir, "documents")
      .select($"doc_id", (lit(8L) + $"doc_id" % 5).as("n_frames"),
        explode(sequence(lit(0L), lit(7L) + $"doc_id" % 5)).as("f"))
      .select($"doc_id", $"n_frames",
        md5(concat(expr("doc_id div 7").cast("string"), lit(":"),
          ($"f" + $"doc_id" % 3).cast("string"))).as("fp"))
    val hot = frames.groupBy($"fp")
      .agg(countDistinct($"doc_id").as("df"))
      .filter($"df" > M05DfCap).select($"fp")
    val idx = frames.join(hot, Seq("fp"), "left_anti")
    val shared = idx.as("a").join(idx.as("b"), Seq("fp"))
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("vid_a"), $"b.doc_id".as("vid_b"),
        $"a.n_frames".as("na"), $"b.n_frames".as("nb"))
      .agg(countDistinct($"fp").as("n_shared"))
    shared
      .filter($"n_shared" * 2 >= least($"na", $"nb"))
      .select($"vid_a", $"vid_b", $"n_shared",
        ($"n_shared".cast("double") /
          least($"na", $"nb").cast("double")).as("overlap"))
      .orderBy($"vid_a", $"vid_b")
  }

  private val m05Sql =
    s"""WITH frames AS (
       |  SELECT doc_id, 8 + doc_id % 5 AS n_frames,
       |    md5(CAST(doc_id // 7 AS VARCHAR) || ':' ||
       |        CAST(f + doc_id % 3 AS VARCHAR)) AS fp
       |  FROM documents, unnest(range(0, 8 + doc_id % 5)) AS t(f)),
       |hot AS (
       |  SELECT fp FROM frames GROUP BY fp
       |  HAVING COUNT(DISTINCT doc_id) > $M05DfCap),
       |idx AS (SELECT doc_id, n_frames, fp FROM frames ANTI JOIN hot USING (fp)),
       |shared AS (
       |  SELECT a.doc_id AS vid_a, b.doc_id AS vid_b,
       |    a.n_frames AS na, b.n_frames AS nb,
       |    COUNT(DISTINCT a.fp) AS n_shared
       |  FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT vid_a, vid_b, CAST(n_shared AS BIGINT) AS n_shared,
       |  CAST(n_shared AS DOUBLE) / least(na, nb) AS overlap
       |FROM shared
       |WHERE n_shared * 2 >= least(na, nb)
       |ORDER BY vid_a, vid_b""".stripMargin

  // ---------------------------------------------------------------------
  // m06: AUDIO fingerprint matching — the constellation/landmark shape
  // (Wang 2003, the Shazam paper): each track's spectrogram peaks become
  // LANDMARKS (consecutive peak-frequency pairs packed into one key), an
  // inverted index maps landmark → (track, time-step), and a query
  // snippet is identified by OFFSET-HISTOGRAM voting — every landmark
  // the snippet shares with a track votes for the time offset
  // (track_step − snippet_step), and a true match concentrates its votes
  // on ONE offset while chance collisions scatter. The vote threshold
  // (≥ 5) is what makes the scheme robust to dropouts: the snippets
  // here lose every 4th time step and still match on the 6 surviving
  // consecutive-pair landmarks.
  //
  // Peaks: no audio codec in this env (the m01–m05 stub convention), so
  // the per-(track, step) peak frequency bin is synthesized
  // deterministically as md5(doc ":" step) % 1024 — a 10-bit bin like a
  // real constellation map; landmark key = bin(f) · 1024 + bin(f+1)
  // (2^20 keyspace). Tracks have 19 + doc_id % 5 steps; every 10th doc
  // also issues a QUERY: its own steps [s, s+12) with s = doc_id % 7
  // and every 4th step dropped. The matcher never sees s — it
  // re-derives it as the winning offset (spec-pinned: every query
  // matches its source track at offset = query_id % 7 with exactly 6
  // votes).
  //
  // Scale: the index is linear in total audio length; the probe join is
  // keyed by landmark (shuffle only on collisions); hot landmarks
  // (df > 64 — the claps/silence/test-tone keys every corpus has) are
  // dropped from the index before the join, m05's stop-key cap, so no
  // landmark fans out quadratically. Both engines compute identical
  // md5-derived bins, so the whole pipeline is hash-verified.
  // ---------------------------------------------------------------------
  private val M06DfCap = 64L

  def m06(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id")
    // 10-bit peak-frequency bin of (track, step): md5-derived, portable
    def bin(d: String, f: String) =
      expr(s"cast(conv(substring(md5(concat(cast($d as string), ':', " +
        s"cast($f as string))), 1, 8), 16, 10) as bigint) % 1024")
    // inverted index: landmark key at step f pairs bins of f and f+1
    val idx = docs
      .select($"doc_id", explode(sequence(lit(0L), lit(18L) + $"doc_id" % 5))
        .as("f"))
      .select($"doc_id", $"f",
        (bin("doc_id", "f") * 1024L + bin("doc_id", "f + 1")).as("lm"))
    val hot = idx.groupBy($"lm").agg(countDistinct($"doc_id").as("df"))
      .filter($"df" > M06DfCap).select($"lm")
    val index = idx.join(hot, Seq("lm"), "left_anti")
    // query snippets: every 10th doc, steps [s, s+12), every 4th dropped;
    // a landmark needs BOTH r and r+1 to survive the dropout
    val snippets = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"), ($"doc_id" % 7).as("s"),
        explode(sequence(lit(0L), lit(10L))).as("r"))
      .filter($"r" % 4 =!= 3 && ($"r" + 1) % 4 =!= 3)
      .select($"query_id", $"r",
        (bin("query_id", "s + r") * 1024L +
          bin("query_id", "s + r + 1")).as("lm"))
    snippets.join(index, Seq("lm"))
      .groupBy($"query_id", $"doc_id".as("track_id"),
        ($"f" - $"r").as("t_offset"))
      .agg(count(lit(1)).as("votes"))
      .filter($"votes" >= 5L)
      .orderBy($"query_id", $"track_id", $"t_offset")
  }

  private val m06Sql =
    s"""WITH docs AS (SELECT doc_id FROM documents),
       |idx AS (
       |  SELECT doc_id, f,
       |    (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
       |        CAST(f AS VARCHAR)), 1, 8) AS BIGINT) % 1024) * 1024 +
       |    (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
       |        CAST(f + 1 AS VARCHAR)), 1, 8) AS BIGINT) % 1024) AS lm
       |  FROM docs, unnest(range(0, 19 + doc_id % 5)) AS t(f)),
       |hot AS (
       |  SELECT lm FROM idx GROUP BY lm
       |  HAVING COUNT(DISTINCT doc_id) > $M06DfCap),
       |index_kept AS (SELECT doc_id, f, lm FROM idx ANTI JOIN hot USING (lm)),
       |snip AS (
       |  SELECT doc_id AS query_id, r,
       |    (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
       |        CAST(doc_id % 7 + r AS VARCHAR)), 1, 8) AS BIGINT) % 1024) * 1024 +
       |    (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
       |        CAST(doc_id % 7 + r + 1 AS VARCHAR)), 1, 8) AS BIGINT) % 1024) AS lm
       |  FROM docs, unnest(range(0, 11)) AS t(r)
       |  WHERE doc_id % 10 = 0 AND r % 4 <> 3 AND (r + 1) % 4 <> 3)
       |SELECT s.query_id, i.doc_id AS track_id, i.f - s.r AS t_offset,
       |  COUNT(*) AS votes
       |FROM snip s JOIN index_kept i USING (lm)
       |GROUP BY s.query_id, i.doc_id, i.f - s.r
       |HAVING COUNT(*) >= 5
       |ORDER BY query_id, track_id, t_offset""".stripMargin

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "m01_media_meta" -> (m01 _),
    "m02_media_features" -> (m02 _),
    "m03_frame_sample" -> (m03 _),
    "m04_phash_neardup" -> (m04 _),
    "m05_video_neardup" -> (m05 _),
    "m06_audio_fingerprint" -> (m06 _))

  val oracle: ListMap[String, String] = ListMap(
    "m01_media_meta" -> m01Sql,
    "m02_media_features" -> m02Sql,
    "m03_frame_sample" -> m03Sql,
    "m04_phash_neardup" -> m04Sql,
    "m05_video_neardup" -> m05Sql,
    "m06_audio_fingerprint" -> m06Sql)
}
