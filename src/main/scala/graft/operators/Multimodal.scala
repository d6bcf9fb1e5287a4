package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ImageFunctions.imageDims

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` payload column plus a typed metadata struct. Image
  * decoding is REAL at the container level: format + pixel dimensions
  * are parsed natively from the payload's leading bytes (PNG IHDR, JPEG
  * SOFn marker walk, GIF, BMP — [[graft.functions.ImageHeaders]]), with
  * no codec dependency; corrupt or truncated headers yield null rather
  * than failing the scan. Full pixel decode (which DOES need a codec)
  * would slot in as a further `mapInPandas`/`mapPartitions` stage over
  * the same payload column without changing any plan shape.
  *
  * Scale notes: payloads stay columnar (parquet binary) end-to-end; the
  * header parse is a per-row native expression (no shuffle, no UDF
  * boxing); derived features are plain columns so Catalyst prunes
  * untouched payload bytes out of scans that don't need them.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("byte_len", LongType),
    StructField("header_hex", StringType)))

  /** Wrap a source column as a media payload: binary bytes + metadata
    * struct (content kind, byte length, first-8-bytes hex header).
    */
  def pack(df: DataFrame, idCol: String, srcCol: String, kind: String): DataFrame = {
    val payload = col(srcCol).cast(BinaryType)
    df.select(
      col(idCol),
      payload.as("payload"),
      struct(
        lit(kind).as("kind"),
        octet_length(payload).cast(LongType).as("byte_len"),
        lower(hex(substring(payload, 1, 8))).as("header_hex")).as("meta"))
  }

  /** Audio metadata decode: (format, channels, sample_rate, bits,
    * n_frames, duration_ms) parsed from a WAV/FLAC payload's header
    * ([[graft.functions.AudioHeaders]]); same null-on-garbage contract
    * and plan shape as [[decodeImage]].
    */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val i = graft.functions.AudioFunctions.audioInfo(
      col(payloadCol).cast(BinaryType))
    df.select(
      col(idCol),
      octet_length(col(payloadCol).cast(BinaryType)).cast(LongType).as("byte_len"),
      i.getField("format").as("format"),
      i.getField("channels").as("channels"),
      i.getField("sample_rate").as("sample_rate"),
      i.getField("bits").as("bits"),
      i.getField("n_frames").as("n_frames"),
      i.getField("duration_ms").as("duration_ms"))
  }

  /** Video metadata decode: (format, timescale, duration) parsed from
    * an MP4's moov/mvhd box walk ([[graft.functions.VideoHeaders]]);
    * same null-on-garbage contract and plan shape as [[decodeImage]].
    */
  def decodeVideo(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val i = graft.functions.VideoFunctions.videoInfo(
      col(payloadCol).cast(BinaryType))
    df.select(
      col(idCol),
      octet_length(col(payloadCol).cast(BinaryType)).cast(LongType).as("byte_len"),
      i.getField("format").as("format"),
      i.getField("timescale").as("timescale"),
      i.getField("duration_units").as("duration_units"),
      i.getField("duration_ms").as("duration_ms"),
      i.getField("width").as("width"),
      i.getField("height").as("height"))
  }

  /** WebM/Matroska metadata decode: (format, timescale_ns,
    * duration_units, duration_ms, width, height) parsed from the
    * payload's EBML element walk ([[graft.functions.EbmlHeaders]]);
    * same null-on-garbage contract and plan shape as [[decodeVideo]].
    */
  def decodeWebm(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val i = graft.functions.VideoFunctions.webmInfo(
      col(payloadCol).cast(BinaryType))
    df.select(
      col(idCol),
      octet_length(col(payloadCol).cast(BinaryType)).cast(LongType).as("byte_len"),
      i.getField("format").as("format"),
      i.getField("timescale_ns").as("timescale_ns"),
      i.getField("duration_units").as("duration_units"),
      i.getField("duration_ms").as("duration_ms"),
      i.getField("width").as("width"),
      i.getField("height").as("height"))
  }

  /** Image metadata decode: (format, width, height) parsed from the
    * payload's container header, plus payload size. Unrecognized or
    * corrupt payloads keep their row with null format/dims (a crawl
    * always contains garbage; dropping or throwing is the caller's
    * policy, not the decoder's).
    */
  def decodeImage(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val d = imageDims(col(payloadCol).cast(BinaryType))
    df.select(
      col(idCol),
      octet_length(col(payloadCol).cast(BinaryType)).cast(LongType).as("byte_len"),
      d.getField("format").as("format"),
      d.getField("width").as("width"),
      d.getField("height").as("height"))
  }

  /** Near-duplicate payload candidate pairs by byte-shingle MinHash-LSH
    * — payload-level near-dup detection for media columns: a crawl
    * corpus is full of re-encoded/re-hosted copies of the same
    * image/audio bytes (appended EXIF/ID3 metadata, trimmed trailers,
    * container prefixes), which exact content-hash dedup misses but
    * which share most n-byte windows. The payload's distinct byte
    * shingles ([[graft.functions.ByteShinglesExpr]] — alignment-free:
    * a prefix shifts positions, not window contents) feed the SAME
    * native minhash signature + (band, bucket) equi-join as the text
    * dedup family ([[Dedup.minhashLshPairs]]): shuffle is
    * payloads × bands band rows, never payloads². Output: (id_a, id_b)
    * with id_a < id_b, distinct. Verification against raw similarity
    * (byte-level Jaccard over the shingle sets) composes downstream
    * exactly as for text ([[Dedup.minhashLshPairsVerified]]'s shape).
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String = "payload",
      byteN: Int = 8,
      numHashes: Int = 16,
      bands: Int = 8,
      maxBucketSize: Int = 1000): DataFrame =
    Dedup.lshPairsFromText(df, idCol, payloadCol,
      p => graft.functions.TextFunctions.byteShingleHashes(
        p.cast(BinaryType), byteN),
      numHashes, bands, maxBucketSize)

  /** [[nearDupPairs]] candidates post-verified by EXACT byte-shingle
    * Jaccard — the same two-stage shape as
    * [[Dedup.minhashLshPairsVerified]]: banding proposes (linear, but a
    * band collision can be a false positive), the exact set overlap
    * disposes. Output: (id_a, id_b, jaccard) with jaccard >=
    * `threshold`. Two extra equi-joins re-attach the shingle sets to
    * the (near-linear) pair endpoints; the per-pair intersection is a
    * native array op.
    *
    * The overlap is computed on the 60-BIT SHINGLE HASHES
    * ([[graft.functions.ByteShingleHashesExpr]]), not the hex shingle
    * strings: 8 bytes per distinct window instead of 2n hex chars +
    * object overhead (~10× less heap and shuffle on the re-attach
    * joins — the r9-flagged OOM risk for multi-MB payloads), and the
    * Jaccard over hash sets equals the string-set value exactly unless
    * two distinct windows collide in 60 bits (p ≈ 2^-60 per pair —
    * below any threshold's resolution).
    */
  def nearDupPairsVerified(
      df: DataFrame,
      idCol: String,
      payloadCol: String = "payload",
      byteN: Int = 8,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame = {
    import graft.functions.TextFunctions.{byteShingleHashes, jaccard}
    val pairs = nearDupPairs(df, idCol, payloadCol, byteN, numHashes, bands,
      maxBucketSize)
    val sh = Spread.ifNarrow(
        df.select(col(idCol), col(payloadCol)), col(idCol))
      .select(col(idCol),
        byteShingleHashes(col(payloadCol).cast(BinaryType), byteN).as("__sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sha")),
        Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__shb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("__sha"), col("__shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Perceptual near-dup candidate pairs over decodable payloads: the
    * 64-bit dHash ([[graft.functions.DHash]] — gradient signs of the
    * 9×8 grid-sampled grayscale) cut into `bands` equal bit-bands and
    * equi-joined on (band, band_bits) — the pigeonhole argument of the
    * SimHash band join: any pair within hamming distance `bands - 1`
    * shares at least one intact band, exactly. Complements
    * [[nearDupPairs]]: byte shingles pair copies of the same BYTES,
    * dHash pairs copies of the same PICTURE (brightness shifts,
    * re-encodes). Undecodable payloads drop out before the join; output
    * is (id_a, id_b, hamming), distinct, id_a < id_b — filter on
    * `hamming` for the wanted strictness. Shuffle is payloads × bands
    * band rows, never payloads².
    */
  def perceptualDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String = "payload",
      bands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame =
    hash64BandPairs(
      df.select(col(idCol), col(payloadCol)), idCol,
      p => graft.functions.ImageFunctions.dhash(p), payloadCol, bands,
      maxBucketSize)

  /** Canonical visual frame of a media payload: the first SYNC
    * keyframe for an MP4 with a JPEG video track (real ISO 14496-12
    * sample-table walk — [[graft.functions.Mp4Codec.keyframes]]), the
    * payload itself for a bare image — the column that lets stills and
    * videos ride ONE perceptual near-dup pass. Non-MP4 payloads fall
    * through untouched (the keyframe walk yields null there), so the
    * projection is safe over a mixed crawl column.
    */
  def canonicalFrame(payload: Column): Column =
    coalesce(
      element_at(graft.functions.VideoFunctions.mp4Keyframes(payload, 1),
        1),
      payload)

  /** [[perceptualDupPairs]] with video payloads participating at
    * CONTENT level: every payload projects to its canonical frame
    * first, so two MP4s of the same footage (different container
    * metadata, chunking, decoy non-sync frames) pair through their
    * keyframe pictures — and pair with bare stills of the same
    * picture. Same banding machinery, hot-bucket cap, and pigeonhole
    * guarantee; the frame projection is one more map stage, no new
    * shuffle.
    */
  def videoDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String = "payload",
      bands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame =
    perceptualDupPairs(
      df.select(col(idCol),
        canonicalFrame(col(payloadCol)).as(payloadCol)),
      idCol, payloadCol, bands, maxBucketSize)

  /** [[perceptualDupPairs]] over the integer-DCT pHash
    * ([[graft.functions.PHash]]) instead of dHash: the global
    * frequency envelope rather than local gradients — robust where a
    * re-encode shifts local gradient signs but keeps the picture's
    * low-frequency structure (resizes especially: the 32×32 resample
    * normalizes resolution before the transform). Same banding
    * machinery, hot-bucket cap, and pigeonhole guarantee.
    */
  def perceptualDupPairsPhash(
      df: DataFrame,
      idCol: String,
      payloadCol: String = "payload",
      bands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame =
    hash64BandPairs(
      df.select(col(idCol), col(payloadCol)), idCol,
      p => graft.functions.ImageFunctions.phash(p), payloadCol, bands,
      maxBucketSize)

  /** [[perceptualDupPairs]]' AUDIO sibling: candidate pairs whose
    * energy-envelope hashes ([[graft.functions.AudioFunctions
    * .audioEnvelopeHash]]) share any 16-bit band — copies of the same
    * RECORDING across volume changes, mono/stereo repackaging, or
    * container rewraps, which byte-level shingling can never pair.
    * Same banding machinery, same hot-bucket cap, same pigeonhole
    * guarantee (hamming < bands always pairs).
    */
  def audioDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String = "payload",
      bands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame =
    hash64BandPairs(
      df.select(col(idCol), col(payloadCol)), idCol,
      p => graft.functions.AudioFunctions.audioEnvelopeHash(p),
      payloadCol, bands, maxBucketSize)

  /** The shared 64-bit-fingerprint band join: decodable payloads hash
    * to one long, split into `bands` bit-bands, pair on any shared
    * band, emit exact hamming.
    */
  private def hash64BandPairs(
      df: DataFrame,
      idCol: String,
      hashFn: Column => Column,
      payloadCol: String,
      bands: Int,
      maxBucketSize: Int): DataFrame = {
    require(bands > 0 && 64 % bands == 0, "bands must divide 64")
    val bw = 64 / bands
    // bands = 1 means bw = 64, where `1L << 64` wraps to 1 (JVM shift
    // mod 64) and a (1L << bw) - 1 mask would be 0 — every payload in
    // one bucket, a payloads² join; -1L is the correct all-bits mask
    val mask = if (bw == 64) -1L else (1L << bw) - 1
    // materialize the fingerprint table ONCE, via a SHUFFLE BARRIER
    // (repartition of the 16-byte (id, fp) rows), not a checkpoint: it
    // is 16 bytes/row while hashFn is a full media decode, and without
    // a barrier Catalyst pushes isnotnull(hash) into the scan condition
    // and replicates the decode across the self-join's branches and the
    // hot-bucket count — measured 4 subtrees × filter+project = up to
    // 8 decodes/row (the MP3 pairs gate dropped 9.5 → ~2 s when the
    // barrier landed in r18). The exchange puts the decode in the map
    // stage of ONE shuffle whose output every consumer stage re-reads
    // (ReuseExchange unifies the identical subtrees), so the decode
    // runs exactly once per action. Chosen over localCheckpoint
    // (r18's form) because (a) an eager checkpoint runs a Spark job at
    // plan-BUILD time — a side effect for a public lazy operator — and
    // a lazy one (eager=false, r19 interim) lets the DAG scheduler
    // launch the independent consumer stages concurrently, racing
    // tasks through the not-yet-cached decode (measured ~2× decode on
    // the pairs gates); and (b) shuffle output keeps lineage — an
    // executor loss recomputes the lost map partitions instead of
    // failing the job the way lost checkpoint blocks do. At corpus
    // scale the trade is the same: shuffling billions of 16-byte rows
    // once beats re-decoding media payloads per consumer.
    // NO isnotnull(__fp) filter here: a filter on the hash column gets
    // pushed below the exchange and — the hash expressions are
    // CodegenFallback, so no common-subexpression elimination — the
    // decode would run TWICE per row in the map stage (once in the
    // Filter, once in the Project; measured +40% on the MP3 pairs
    // gates). Null hashes die anyway: they explode to null band_bits,
    // which the self-join's equi-keys never match (and a null-bucket
    // row is never paired, so capping the null bucket or not cannot
    // change the output).
    //
    // The isnotnull(id) filter IS explicit: the self-join infers it
    // for its two sides and pushes it below their exchanges; stating
    // it on the shared frame keeps all four consumer subtrees (join
    // side a, join side b, hot-bucket count, its anti-join probe)
    // canonically IDENTICAL, so exchange reuse folds them into one
    // map stage — one decode per row per action. (A null-id payload
    // could never pair regardless — `a.id < b.id` is never true on
    // null.)
    val fpWidth = df.sparkSession.sparkContext.defaultParallelism
    val hashed = Spread.ifNarrow(df, col(idCol))
      .filter(col(idCol).isNotNull)
      .select(col(idCol),
        hashFn(col(payloadCol).cast(BinaryType)).as("__fp"))
      // explicit count: a bare repartition(col) is AQE-coalescible and
      // these rows are tiny by bytes precisely because the expensive
      // compute sits BELOW the exchange
      .repartition(fpWidth, col(idCol))
    val bandRows = Dedup.capHotBuckets(
      hashed.select(col(idCol), col("__fp"),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("__fp"), b * bw).bitwiseAND(lit(mask))): _*)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_bits"),
      Seq("band", "band_bits"), maxBucketSize)
    val a = bandRows.as("a")
    val b = bandRows.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_bits") === col("b.band_bits") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.__fp").bitwiseXOR(col("b.__fp")))
          .cast("int").as("hamming"))
      .distinct()
  }

  /** Unified media dispatch over a MIXED payload column — what a crawl
    * actually contains: per row, the container is identified from its
    * leading bytes and decoded by the matching header walk
    * ([[graft.functions.ImageHeaders]] /
    * [[graft.functions.AudioHeaders]] /
    * [[graft.functions.VideoHeaders]] /
    * [[graft.functions.EbmlHeaders]]), emitting ONE normalized
    * metadata row: kind (image/audio/video, null = undecodable),
    * format, and the union of useful fields with nulls where a kind
    * has no such property. Each decoder rejects foreign magic in its
    * first bytes, so the four probes per row cost one header read plus
    * three fast prefix mismatches — still a stateless per-row
    * expression chain: no shuffle, no UDF boxing, columnar-prunable
    * like every other decode here.
    */
  def describe(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    import graft.functions.{AudioFunctions, ImageFunctions, VideoFunctions}
    val p = col(payloadCol).cast(BinaryType)
    // each decode aliased once in its own projection: the consuming
    // select references every struct several times, and CollapseProject
    // only inlines CHEAP aliases — so each header walk runs once per row
    val probed = df.select(
      col(idCol),
      octet_length(p).cast(LongType).as("byte_len"),
      ImageFunctions.imageDims(p).as("__img"),
      AudioFunctions.audioInfo(p).as("__aud"),
      VideoFunctions.videoInfo(p).as("__vid"),
      VideoFunctions.webmInfo(p).as("__web"))
    val (img, aud, vid, web) =
      (col("__img"), col("__aud"), col("__vid"), col("__web"))
    probed.select(
      col(idCol),
      col("byte_len"),
      when(img.isNotNull, lit("image"))
        .when(aud.isNotNull, lit("audio"))
        .when(vid.isNotNull || web.isNotNull, lit("video"))
        .as("kind"),
      coalesce(img.getField("format"), aud.getField("format"),
        vid.getField("format"), web.getField("format")).as("format"),
      coalesce(img.getField("width"), vid.getField("width"),
        web.getField("width")).as("width"),
      coalesce(img.getField("height"), vid.getField("height"),
        web.getField("height")).as("height"),
      aud.getField("channels").as("channels"),
      aud.getField("sample_rate").as("sample_rate"),
      coalesce(aud.getField("duration_ms"), vid.getField("duration_ms"),
        web.getField("duration_ms")).as("duration_ms"))
  }

  /** Deterministic frame sampling for a video payload: emit every
    * `stride`-th frame index below `nFrames` — the plumbing for
    * frame-level fan-out (posexplode), independent of any real codec.
    */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int, stride: Int): DataFrame =
    df.select(col(idCol),
      posexplode(sequence(lit(0), lit(nFrames - 1), lit(stride))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")

  /** [[sampleFrames]] with a PER-ROW frame count — the composition a
    * real pipeline runs: the count comes from the DECODED container
    * duration (e.g. `decodeVideo().duration_ms * fps / 1000`), not a
    * constant. Rows with null or non-positive counts fan out to
    * nothing (undecodable payloads drop here, consistent with the
    * null-on-garbage decoders upstream). Still one pipelined Generate —
    * no shuffle, no UDF.
    */
  def sampleFramesByCount(
      df: DataFrame,
      idCol: String,
      nFramesCol: Column,
      stride: Int): DataFrame =
    df.select(col(idCol), nFramesCol.cast("long").as("__nf"))
      .filter(col("__nf").isNotNull && col("__nf") > 0)
      .select(col(idCol),
        posexplode(sequence(lit(0L), col("__nf") - 1, lit(stride.toLong))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")
}
