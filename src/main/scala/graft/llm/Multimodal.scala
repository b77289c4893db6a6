package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.11 L6 + north-star): media as opaque
  * `binary` columns with typed metadata, decoded/featurized by a
  * partition-batched stub.
  *
  * Design: media bytes travel as a `binary` column next to typed metadata
  * (struct) — the lakehouse pattern for image/audio/video. Decode and
  * feature-extraction run per partition over an iterator
  * ([[decodeFeaturesStub]]) so a real codec would amortize model/codec init
  * per batch, exactly like `mapInPandas` batches in the PySpark world.
  *
  * The decode itself is a STUB — the container ships no image/audio codecs —
  * producing a deterministic fake feature vector from the raw bytes. The
  * Spark-side plumbing (schema, binary transport, partition batching,
  * feature shape) is real and tested (LlmSpec).
  *
  * Scale notes (100 TB): binary payloads dominate row size, so the scan
  * stays columnar (payload column pruned unless needed) and the decode is a
  * no-shuffle map stage; feature vectors (small) flow to downstream joins
  * while the payload column is dropped as early as possible.
  */
object Multimodal extends QueryModule {

  val FeatureDim = 4

  /** Deterministic stand-in for a media decoder: 4 features derived from
    * payload length, first/last bytes, and a byte-sum checksum. A real
    * deployment swaps ONLY this function for a codec call. */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(FeatureDim)(0f)
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    Array(
      bytes.length.toFloat,
      (bytes(0) & 0xff).toFloat,
      (bytes(bytes.length - 1) & 0xff).toFloat,
      (sum % 256).toFloat)
  }

  /** Attach the media payload as a binary column (here: UTF-8 text bytes —
    * the transport is identical for real image/audio bytes). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))

  /** Partition-batched decode: (id, binary) → (id, float[FeatureDim]).
    * Iterator-per-partition so codec/model init amortizes per batch. */
  def decodeFeaturesStub(spark: SparkSession, df: DataFrame,
                         idCol: String, binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: init codec/feature model HERE, once per partition
        it.map { case (id, bytes) => (id, stubDecode(bytes)) }
      }
      .toDF(idCol, "features")
  }

  /** L6 — multimodal struct projection: media payload + typed metadata
    * struct carried through a join, nested field re-projected (Catalyst
    * prunes unaccessed struct fields automatically). */
  private def structProj(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir), $"doc_id" === $"vec_id")
      .select(
        $"doc_id",
        struct($"lang", $"source").as("meta"),
        $"label")
      // re-project nested fields to scalars: demonstrates nested-field
      // pruning AND keeps the hashed output hasher-friendly (no struct cells)
      .select($"doc_id", $"meta.lang".as("meta_lang"),
        $"meta.source".as("meta_src"), $"label")
      .orderBy($"doc_id")
  }

  /** North-star — binary column plumbing with scalar evidence the oracle
    * can check: byte length, base64 round-trip, first byte. */
  private def binaryMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bin = $"text".cast("binary")
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        length(bin).cast("long").as("n_bytes"),
        // first 48 bytes only: Spark's base64 MIME-wraps at 76 output chars
        base64(substring($"text", 1, 48).cast("binary")).as("b64"),
        ascii(substring($"text", 1, 1)).cast("long").as("head_byte"))
      .orderBy($"doc_id")
  }

  /** North-star — the full stubbed decode pipeline as a declared query:
    * binary attach → partition-batched feature extraction → metadata join.
    * No oracle (the stub is Spark-side); LlmSpec pins the values.
    * Features are flattened to scalar columns — the driver's rows-only
    * check sorts the dumped parquet with pandas, which cannot order an
    * array column (round-1 `unhashable type: numpy.ndarray` failure). */
  private def decodeStub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val feats = decodeFeaturesStub(spark, attachBinary(docs), "doc_id", "media")
    docs.select($"doc_id", $"lang")
      .join(feats, "doc_id")
      .select($"doc_id", $"lang",
        $"features"(0).cast("double").as("f_len"),
        $"features"(1).cast("double").as("f_head"),
        $"features"(2).cast("double").as("f_tail"),
        $"features"(3).cast("double").as("f_checksum"))
      .orderBy($"doc_id")
  }

  /** Frames per sampling stride (bytes) and bytes per frame. */
  val FrameStride = 64
  val FrameBytes = 16

  /** North-star — video frame-sampling shape: treat the payload as a frame
    * sequence and keep every stride-th fixed-width byte range, emitting
    * (doc, frame index, frame digest, frame size) — the exact dataflow of
    * every-nth-frame extraction (explode of a generated frame index, byte-
    * range slice, per-frame fingerprint), with the byte slice standing in
    * for a codec's frame decode. Fully map-side: `sequence` + `explode` are
    * codegen'd generators, no lambda, no shuffle before the final sort.
    * The digest arithmetic is byte-portable, so unlike the feature stub
    * this one IS oracle-checked. */
  private def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"text".cast("binary").as("media"))
      // empty payload ⇒ zero frames: `(length - 1) div stride` truncates
      // toward zero (-1 div 64 = 0), which would emit one empty frame here
      // while the oracle's floor semantics emit none — guard explicitly.
      .filter(length($"media") > 0)
      .withColumn("fi", explode(sequence(
        lit(0L), expr(s"(length(media) - 1) div $FrameStride").cast("long"))))
      .withColumn("frame",
        expr(s"substring(media, fi * $FrameStride + 1, $FrameBytes)"))
      .select(
        $"doc_id", $"fi",
        md5($"frame").as("fh"),
        length($"frame").cast("long").as("fb"))
      .orderBy($"doc_id", $"fi")
  }

  /** Target "resolution" of the resize stub (bytes). */
  val ResizeTarget = 128

  /** North-star — RESIZE stub: nearest-neighbor downsampling over the
    * 1-D byte stream (keep every k-th byte, k = ⌊n/target⌋, min 1) —
    * the exact dataflow of image nearest-neighbor resize with the byte
    * stride standing in for the pixel stride (no codecs ship in this
    * container). Emits the resized payload's length, digest, and head so
    * the oracle replays it byte for byte. The per-byte gather is a
    * transform lambda — acceptable here because decode-family stubs are
    * not hot paths (the real implementation is a native codec call via
    * partition-batched mapping, [[decodeFeaturesStub]]). */
  private def resizeStub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", length($"text").as("n"))
      .withColumn("k", greatest(lit(1), expr(s"n div $ResizeTarget")))
      .withColumn("resized",
        expr("array_join(transform(sequence(1, n, k), p -> substring(text, p, 1)), '')"))
      .select($"doc_id",
        $"k".cast("long").as("stride"),
        length($"resized").cast("long").as("n_resized"),
        md5($"resized").as("digest"),
        substring($"resized", 1, 24).as("head"))
      .orderBy($"doc_id")
  }

  /** The byte values the perceptual hash tracks: the payload's LIVE
    * alphabet (a–z, space, dot). Tracking dead byte values is worse than
    * useless: their counts are 0 corpus-wide, the code bits they feed are
    * constant, and any band containing mostly-constant bits degenerates
    * into one bucket holding the whole corpus — the first cut tracked 64
    * values (36 dead) and its two dead-bit bands saturated to all-pairs
    * (measured 73 s at sf0.1 vs 3.5 s now). */
  private val PhashBytes: Seq[Int] = (97 to 122) ++ Seq(32, 46)

  /** Bits per tracked byte value: count mod 2 and count div 2 mod 2 —
    * the two low bits of the occurrence count. One edited occurrence
    * flips bit 0 and (on carry) bit 1, so edit distance still maps to
    * small Hamming distance while every bit carries real entropy. */
  private val PhashBitsPerVal = 2

  /** 7 blocks of 8 bits over the 56-bit code pigeonhole-guarantee every
    * pair within radius 6 shares at least one intact block. */
  private val PhashBlocks = 7
  private val PhashRadius = 6

  /** North-star — perceptual-hash near-duplicate detection over the OPAQUE
    * media payload: the image/audio near-dedup stage of a multimodal
    * corpus, with a byte-histogram signature standing in for a
    * codec-backed pHash/chromaprint (no codec jars in this container —
    * same stand-in contract as the decode/resize stubs). Each payload maps
    * to a 56-bit code (two low count-bits per tracked byte value), so
    * near-identical payloads — a few bytes edited — flip few bits,
    * exactly the content-histogram hashing family (a color-histogram hash
    * for images). Unlike `dedup_simhash` this never tokenizes: it reads
    * raw bytes, the contract a binary column requires.
    *
    * Scale shape (100 TB): identical to the simhash family —
    * CANDIDATE-GENERATION-BY-BUCKETING, never all-pairs. The code is one
    * map-side projection (56 codegen'd replace/length terms, no shuffle);
    * candidates come from 7 per-block equi-joins (explode into 7×8-bit
    * block keys, join carries IDS ONLY); the exact `bit_count(xor)`
    * verify runs on candidates alone (1.2M candidates / 5000 docs at
    * sf0.1 — band-bucket sizes, not n²). The pigeonhole bound makes
    * banded+verify EXACTLY equal to all-pairs-within-radius — the oracle
    * exploits that by replaying the direct quadratic form, proving the
    * blocked plan loses nothing. */
  private def phashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // CAST each bit to BIGINT BEFORE shifting: shiftleft on INT wraps the
    // shift distance mod 32 (bits ≥ 32 silently fold onto low bits)
    val codeExpr = PhashBytes.zipWithIndex.flatMap { case (v, k) =>
      val cnt = s"(length(text) - length(replace(text, chr($v), '')))"
      Seq(s"shiftleft(CAST($cnt % 2 AS BIGINT), ${2 * k})",
        s"shiftleft(CAST(($cnt div 2) % 2 AS BIGINT), ${2 * k + 1})")
    }.mkString("(", " + ", ")")
    val codes = graft.rel.Materialize.once(
      Tables.documentsSpread(spark, sfDir)
        .select($"doc_id", expr(codeExpr).as("code")))
    // EXACT-FIRST collapse (the minhash-family stage order, SCALE.md):
    // byte-identical payloads share a code, and a duplicate-heavy corpus
    // makes every band bucket quadratic in group size (measured 235 s at
    // the 10×-duplicate probe). Banding runs over DISTINCT codes only;
    // identical-code pairs re-enter as the group-local hamming-0 set and
    // cross-code pairs expand through two code joins — output-sized work,
    // provably the same pair set.
    val distinctCodes = graft.rel.Materialize.once(
      codes.select($"code").distinct())
    val bands = distinctCodes.select($"code",
        explode(expr(
          s"transform(sequence(0, ${PhashBlocks - 1}), " +
            "i -> struct(i AS bi, shiftright(code, 8 * i) & 255 AS bv))"))
          .as("b"))
      .select($"code", $"b.bi".as("bi"), $"b.bv".as("bv"))
    val codePairs = bands.as("x").join(bands.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.code") < col("y.code"))
      .select(col("x.code").as("ca"), col("y.code").as("cb"))
      .distinct()
      .withColumn("hamming", bit_count($"ca".bitwiseXOR($"cb")).cast("long"))
      .filter($"hamming" <= PhashRadius)
    val cross = codePairs
      .join(codes.select($"doc_id".as("ia"), $"code".as("ca")), "ca")
      .join(codes.select($"doc_id".as("ib"), $"code".as("cb")), "cb")
      .select(least($"ia", $"ib").as("a_id"),
        greatest($"ia", $"ib").as("b_id"), $"hamming")
    val intra = codes.as("x").join(codes.as("y"),
        col("x.code") === col("y.code") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        lit(0L).as("hamming"))
    cross.unionByName(intra)
      .orderBy($"a_id", $"b_id")
  }

  override def queries: Map[String, QueryFn] = Map(
    "multimodal_struct_proj" -> structProj,
    "multimodal_binary_meta" -> binaryMeta,
    "multimodal_decode_stub" -> decodeStub,
    "multimodal_resize_stub" -> resizeStub,
    "multimodal_frame_sample" -> frameSample,
    "multimodal_phash_dedup" -> phashDedup
  )

  override def oracles: Map[String, String] = Map(
    "multimodal_phash_dedup" -> {
      val terms = PhashBytes.zipWithIndex.flatMap { case (v, k) =>
        val cnt = s"(length(text) - length(replace(text, chr($v), '')))"
        Seq(s"(CAST($cnt % 2 AS BIGINT) << ${2 * k})",
          s"(CAST(($cnt // 2) % 2 AS BIGINT) << ${2 * k + 1})")
      }.mkString(" + ")
      s"""WITH codes AS (
         |  SELECT doc_id, CAST($terms AS BIGINT) AS code FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.code, b.code)) AS BIGINT) AS hamming
         |FROM codes a JOIN codes b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.code, b.code)) <= $PhashRadius
         |ORDER BY a_id, b_id""".stripMargin
    },
    "multimodal_resize_stub" ->
      s"""WITH r AS (
        |  SELECT doc_id,
        |    greatest(1, len(text) // $ResizeTarget) AS k,
        |    array_to_string(
        |      list_transform(range(1, len(text) + 1, greatest(1, len(text) // $ResizeTarget)),
        |                     p -> substr(text, p, 1)), '') AS resized
        |  FROM documents)
        |SELECT doc_id, CAST(k AS BIGINT) AS stride,
        |  CAST(len(resized) AS BIGINT) AS n_resized,
        |  md5(resized) AS digest,
        |  substr(resized, 1, 24) AS head
        |FROM r ORDER BY doc_id""".stripMargin,
    "multimodal_struct_proj" ->
      """SELECT doc_id, meta['lang'] AS meta_lang, meta['source'] AS meta_src, label
        |FROM (SELECT doc_id, {'lang': lang, 'source': source} AS meta, label
        |      FROM documents JOIN embeddings ON doc_id = vec_id)
        |ORDER BY doc_id""".stripMargin,
    "multimodal_binary_meta" ->
      """SELECT doc_id,
        |       octet_length(encode(text)) AS n_bytes,
        |       base64(encode(substr(text, 1, 48))) AS b64,
        |       CAST(ascii(text) AS BIGINT) AS head_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The decode STUB's features are pure byte arithmetic (length, first /
    // last byte, byte-sum checksum), so the oracle recomputes them from the
    // same bytes — proving the mapPartitions plumbing (binary cast,
    // partition-batched map, join back) delivers exactly the specified
    // values. ASCII corpus ⇒ ascii(char) == byte.
    "multimodal_decode_stub" ->
      """WITH chk AS (
        |  SELECT doc_id, sum(ascii(substr(text, i + 1, 1))) % 256 AS checksum
        |  FROM (SELECT doc_id, text, unnest(range(length(text))) AS i
        |        FROM documents)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.lang,
        |       CAST(length(d.text) AS DOUBLE) AS f_len,
        |       CAST(ascii(substr(d.text, 1, 1)) AS DOUBLE) AS f_head,
        |       CAST(ascii(substr(d.text, length(d.text), 1)) AS DOUBLE) AS f_tail,
        |       CAST(chk.checksum AS DOUBLE) AS f_checksum
        |FROM documents d JOIN chk USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id, fi,
        |       md5(substr(text, fi * 64 + 1, 16)) AS fh,
        |       length(substr(text, fi * 64 + 1, 16)) AS fb
        |FROM (SELECT doc_id, text,
        |             unnest(range((length(text) - 1) // 64 + 1)) AS fi
        |      FROM documents)
        |ORDER BY doc_id, fi""".stripMargin
  )
}
