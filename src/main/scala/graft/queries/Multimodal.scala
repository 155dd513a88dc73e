package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables}

/** Multimodal columns — opaque binary payloads with typed metadata,
  * plus the decode / feature-extract / frame-sample plumbing a
  * training-data pipeline needs (north star [D BASELINE.json]).
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * stub behind [[Codec]] (clearly marked); everything Spark-side —
  * schema, typed Dataset plumbing, per-partition batch shape,
  * partition-parallel feature extraction — is real and tested
  * (MultimodalSpec). Payloads are derived deterministically from the
  * driver's documents table so every run sees identical bytes.
  */
object Multimodal extends QueryGroup {

  /** One media object: opaque bytes + typed metadata. The 100 TB layout
    * keeps payloads in their own column chunk (parquet splits column
    * pages) so metadata-only queries never touch bytes. */
  case class Media(media_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  case class MediaFeatures(media_id: Long, format: String, n_bytes: Int,
      mean_byte: Double, hist4: Array[Long])

  /** STUB boundary: the real implementation decodes an image/audio
    * payload with a native codec. Not available in this container —
    * the stub is the identity over the raw bytes, which keeps the
    * pipeline deterministic and the plumbing real. */
  object Codec {
    /** Real impl: e.g. javax.imageio / ffmpeg binding → pixel array. */
    def decode(format: String, payload: Array[Byte]): Array[Byte] =
      payload // STUB — identity; swap for a codec in production

    /** Real impl: resample decoded pixels to (w, h). Stub: truncate/pad
      * to the target byte count so output shape is honored. */
    def resize(decoded: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, w * h / 64)
      java.util.Arrays.copyOf(decoded, target)
    }
  }

  /** Portable 32-bit SimHash family for binary payloads (r12): the
    * b-th fingerprint bit is the majority sign of
    * ((A_b·(k mod P) + B_b) mod P) mod 2 over the asset's exact
    * integer byte-4-gram encodes k — dedup_simhash_accuracy's
    * gate-portable affine construction, so the fingerprint (and the
    * whole pair table) replays identically in DuckDB. Stated literal
    * coefficients. The gram reduces mod P BEFORE the multiply —
    * ((A·(k mod P) + B) mod P) ≡ ((A·k + B) mod P) by modular
    * identity, and it keeps A·k' < 2^62 for ANY code-point width:
    * ascii()/substr are code-point based in both engines, so
    * multibyte text (real zh content) yields grams up to ~1.8e13,
    * which unreduced would wrap silently in Spark while DuckDB
    * raises a BIGINT overflow (r12 ADVICE). On the all-ASCII
    * fixtures max k ≈ 2.139e9 < P, so the reduction is the
    * identity there and the shipped hashes are unchanged. */
  val SimBits = 32
  val SimP = 2147483647L
  val SimA: Seq[Long] = (1 to SimBits).map(b => (2654435761L * b) % SimP)
  val SimB: Seq[Long] = (1 to SimBits).map(b => (40503L * (b + 7)) % SimP)

  /** Hamming radius of the declared pair table — 3 of 32 bits, the
    * pigeonhole-guaranteed regime of the 4×8 banding. */
  val MaxAssetHamming = 3

  /** Deterministic media table derived from documents: payload = UTF-8
    * bytes of the text (stands in for encoded pixels), metadata from
    * doc fields. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        // deterministic fake format/dimensions from the id
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"))
      .as[Media]
  }

  /** Decode + feature-extract, partition-parallel. mapPartitions is the
    * deliberate mechanism here (not a UDF-per-row): a real codec wants
    * to amortize native-library init per partition, exactly like a
    * Pandas-UDF batch would. Features: byte count, mean byte value,
    * 4-bucket byte histogram. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would happen here
      it.map { m =>
        val px = Codec.decode(m.format, m.payload)
        val hist = new Array[Long](4)
        var sum = 0L
        var i = 0
        while (i < px.length) {
          val b = px(i) & 0xff
          hist(b >> 6) += 1
          sum += b
          i += 1
        }
        MediaFeatures(m.media_id, m.format, px.length,
          if (px.length == 0) 0.0 else sum.toDouble / px.length, hist)
      }
    }
  }

  /** Frame sampling for a "video" payload: every strideth byte-block —
    * the per-row slice shape of real frame extraction. */
  def frameSample(media: Dataset[Media], blockSize: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(blockSize).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (block, idx) => (m.media_id, idx, block) }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  def defs: Seq[QueryDef] = Seq(
    // Feature extraction as a declared operator. Oracled: the stub
    // decode is the identity over UTF-8 bytes and the driver corpus is
    // pure ASCII (strlen == length measured at every SF), so DuckDB
    // can mirror the whole featurization with ord() per character —
    // byte histogram, integer byte sum, one double division. With a
    // real codec this oracle is replaced by MultimodalSpec's
    // determinism assertions (the decode becomes engine-specific).
    QueryDef(
      "multimodal_features",
      (spark, sf) => {
        import spark.implicits._
        extractFeatures(mediaTable(spark, sf)).toDF()
          .select(col("media_id"), col("format"), col("n_bytes"),
            round(col("mean_byte"), 4).as("mean_byte"),
            // scalar-only final schema (driver-hash rule): unpack the
            // 4-bucket histogram into named scalar columns
            element_at(col("hist4"), 1).as("h0"),
            element_at(col("hist4"), 2).as("h1"),
            element_at(col("hist4"), 3).as("h2"),
            element_at(col("hist4"), 4).as("h3"))
          .orderBy("media_id")
      },
      Some("WITH b AS (SELECT doc_id AS media_id, ord(substr(text, CAST(i AS INTEGER), 1)) AS byte FROM (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i FROM documents)) SELECT d.doc_id AS media_id, CASE WHEN d.doc_id%3=0 THEN 'png' WHEN d.doc_id%3=1 THEN 'jpeg' ELSE 'webp' END AS format, CAST(length(d.text) AS INTEGER) AS n_bytes, round(CAST(sum(b.byte) AS DOUBLE)/count(*), 4) AS mean_byte, count(*) FILTER (WHERE b.byte < 64) AS h0, count(*) FILTER (WHERE b.byte >= 64 AND b.byte < 128) AS h1, count(*) FILTER (WHERE b.byte >= 128 AND b.byte < 192) AS h2, count(*) FILTER (WHERE b.byte >= 192) AS h3 FROM documents d JOIN b ON d.doc_id = b.media_id GROUP BY d.doc_id, d.text ORDER BY media_id"),
      scaleNote = "Payload bytes never shuffle: decode + featurize run inside the scan partition (mapPartitions amortizes codec init, the Pandas-UDF batch analog), and only the small feature rows move. At 100 TB keep payloads in a separate parquet column (or object-store refs) so metadata/feature queries prune the byte column entirely."),

    // Frame sampling as a declared operator: every 4th 16-byte block
    // of the binary payload (the per-row slice shape of real video
    // frame extraction — stride sampling over an opaque byte stream),
    // each sampled frame fingerprinted. Oracled the multimodal_features
    // way: the payload is the UTF-8 bytes of a pure-ASCII corpus, so
    // DuckDB mirrors byte slicing with character substr and the md5s
    // agree byte-for-byte. With a real container format the slicer
    // becomes the codec's keyframe index; the Spark-side shape
    // (flatMap over typed Dataset, frame rows with ordinal + bytes +
    // fingerprint) is exactly what a GOP sampler emits.
    QueryDef(
      "multimodal_frames",
      (spark, sf) => {
        import spark.implicits._
        frameSample(mediaTable(spark, sf), 16, 4)
          .select(col("media_id"), col("frame_idx"),
            length(col("frame_bytes")).as("n_bytes"),
            md5(col("frame_bytes")).as("frame_md5"))
          .orderBy("media_id", "frame_idx")
      },
      Some("WITH f AS (SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx, " +
        "substr(text, CAST(i*16+1 AS INTEGER), 16) AS fr " +
        "FROM (SELECT doc_id, text, unnest(range(0, (length(text)+15)//16)) AS i FROM documents) " +
        "WHERE i % 4 = 0) " +
        "SELECT media_id, frame_idx, CAST(length(fr) AS INTEGER) AS n_bytes, md5(fr) AS frame_md5 " +
        "FROM f ORDER BY media_id, frame_idx"),
      scaleNote = "Slicing happens inside the scan partition on the " +
        "typed Dataset — payload bytes never shuffle; only the " +
        "(id, ordinal, 16-byte frame, md5) rows move, and with " +
        "stride-4 sampling that is 1/4 of 1 block-width of the " +
        "payload column. At 100 TB the frame table is written " +
        "bucketed by media_id so every downstream per-video op " +
        "(dedup by frame fingerprint, ANN over frame embeddings) " +
        "joins co-partitioned; the stride/block dials trade recall " +
        "for byte traffic exactly like PQ's M/nbits trade storage " +
        "for recall. The md5 fingerprint doubles as the exact-dup " +
        "key for frame-level dedup (dedup_url's shape on binary)."),

    // Asset-level duplicate detection over the BINARY payload column —
    // the media-side sibling of the text dedup family: fingerprint =
    // md5 of the leading 64 payload bytes (the container-header
    // window; in production the perceptual hash of the decoded
    // thumbnail — Codec.decode is the stub boundary), groups with >1
    // copy are duplicate assets, min media_id is the canonical keeper.
    // The oracle restates the same fingerprint from the documents
    // table the payloads derive from; byte-slice ≡ char-slice because
    // the corpus is pure ASCII (asserted in MultimodalSpec's sibling
    // checks — octet_length = length at every SF).
    QueryDef(
      "multimodal_dedup",
      (spark, sf) =>
        mediaTable(spark, sf).toDF()
          .groupBy(md5(expr("substring(payload, 1, 64)")).as("fingerprint"))
          .agg(count(lit(1)).as("n_copies"),
            min(col("media_id")).as("keeper_id"))
          .filter(col("n_copies") > 1)
          .orderBy("fingerprint"),
      Some("SELECT md5(substr(text, 1, 64)) AS fingerprint, " +
        "count(*) AS n_copies, min(doc_id) AS keeper_id " +
        "FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1"),
      scaleNote = "The fingerprint is computed INSIDE the scan from a " +
        "64-byte slice — full payloads never shuffle; the wire " +
        "carries (16-byte hash, count, id) partials that combine " +
        "map-side, so a 100 TB asset lake dedups with |distinct " +
        "fingerprints|-bounded exchange. Collisions are resolved the " +
        "usual two-tier way: fingerprint groups are candidate " +
        "buckets, a full-payload hash (or byte compare) inside each " +
        "bucket confirms — dedup_near's band→verify shape on binary. " +
        "Keeper = min(id) is associative, so the canonical choice is " +
        "partition-order-free."),

    // NEAR-duplicate asset detection (r12) — multimodal_dedup's
    // fuzzy sibling, the pHash-shaped member the media family was
    // missing: exact-fingerprint dedup misses re-encodes, crops and
    // metadata-stripped copies; production asset lakes run a
    // PERCEPTUAL hash (locality-sensitive over decoded content) and
    // pair assets within a small Hamming distance. Shape here: a
    // 32-bit SimHash over payload byte 4-grams (with a real codec
    // the grams come from decoded-pixel blocks — Codec.decode is the
    // stub boundary; the identity stub makes grams byte-grams, which
    // keeps every stage real and oracled), banded 4×8 bits so
    // candidates come from equi joins (distance ≤ 3 is pigeonhole-
    // guaranteed a shared band), df-capped buckets, Hamming verify.
    // Unlike simhash_near (xxhash64 → invariant verdicts), the bit
    // family here is the GATE-PORTABLE affine one
    // (dedup_simhash_accuracy's construction): sign_b(gram) =
    // ((A_b·k + B_b) mod P) mod 2 over the exact integer 4-gram
    // encode — so the raw pair table itself is hash-gated, the
    // strongest oracle form the fingerprint family supports.
    QueryDef(
      "multimodal_near_dup",
      (spark, sf) => {
        // r16 (guide §1.2 "per-task work"): the gram integer is
        // extracted from the BINARY payload by O(1) byte slicing —
        // the r12 form chained four ascii(substr(s, i+j, 1)) calls
        // per gram over a STRING, and UTF8String.substring walks
        // from the start of the string to find the char offset, so
        // each doc paid O(len²) char steps (A/B in
        // OPTIMIZATION_r16.md). The big-endian
        // 4-byte value is IDENTICAL on pure-ASCII payloads (asserted
        // by MultimodalSpec's octet_length = length check):
        // conv(hex(b[i..i+3]), 16, 10) = b[i]·2²⁴+b[i+1]·2¹⁶+
        // b[i+2]·2⁸+b[i+3], and hex() of a byte slice is
        // position-exact on BINARY.
        // ...and the per-gram work itself is the codegen'd
        // ByteGrams4 primitive loop rather than a transform() HOF
        // (interpreted per element — the measured HOF trap);
        // ByteGrams4Spec pins bit-equality to the SQL formulation.
        val grams = mediaTable(spark, sf).toDF()
          .filter(length(col("payload")) >= 4)
          .select(col("media_id"),
            explode(graft.plans.ByteGrams4.grams4(col("payload"))).as("k"))
        val votes = (0 until SimBits).map { b =>
          sum(when(((lit(SimA(b)) * (col("k") % SimP) + lit(SimB(b))) % SimP) % 2
            === 1, 1L).otherwise(-1L)).as(s"v$b")
        }
        val fp = (0 until SimBits)
          .map(b => (col(s"v$b") > 0).cast("long") * lit(1L << b))
          .reduce(_ + _)
        val sig = grams.groupBy("media_id")
          .agg(votes.head, votes.tail: _*)
          .select(col("media_id"), fp.as("fp"))
        val banded = sig.select(col("media_id"), col("fp"),
            explode(array((0 until 4).map(j => struct(lit(j).as("band"),
              shiftright(col("fp"), j * 8).bitwiseAND(lit(255L))
                .as("bv"))): _*)).as("bk"))
          .select(col("media_id"), col("fp"),
            col("bk.band").as("band"), col("bk.bv").as("bv"))
        val bc = banded.groupBy("band", "bv").agg(count(lit(1)).as("c"))
        val ok = banded
          .join(bc.filter(col("c") <= NearDup.MaxBucketDocs),
            Seq("band", "bv"))
        val l = ok.select(col("band"), col("bv"),
          col("media_id").as("id1"), col("fp").as("f1"))
        val r = ok.select(col("band"), col("bv"),
          col("media_id").as("id2"), col("fp").as("f2"))
        l.join(r, Seq("band", "bv")).filter(col("id1") < col("id2"))
          .select(col("id1"), col("id2"),
            expr("CAST(bit_count(f1 ^ f2) AS INT)").as("hamming"))
          .distinct()
          .filter(col("hamming") <= MaxAssetHamming)
          .orderBy("id1", "id2")
      },
      Some {
        val votes = (0 until SimBits).map(b =>
          s"CAST(sum(CASE WHEN ((${SimA(b)} * (k % $SimP) + ${SimB(b)}) % $SimP) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v$b")
          .mkString(", ")
        val fp = (0 until SimBits)
          .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
          .mkString(" + ")
        "WITH g AS (SELECT doc_id AS media_id, " +
          "CAST(ascii(substr(text, i, 1)) AS BIGINT)*16777216 + " +
          "CAST(ascii(substr(text, i+1, 1)) AS BIGINT)*65536 + " +
          "CAST(ascii(substr(text, i+2, 1)) AS BIGINT)*256 + " +
          "CAST(ascii(substr(text, i+3, 1)) AS BIGINT) AS k " +
          "FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 3)) AS i " +
          "FROM documents WHERE length(text) >= 4)), " +
          s"v AS (SELECT media_id, $votes FROM g GROUP BY 1), " +
          s"f AS (SELECT media_id, CAST($fp AS BIGINT) AS fp FROM v), " +
          "banded AS (SELECT media_id, fp, j AS band, (fp >> (8*j)) & 255 AS bv " +
          "FROM f CROSS JOIN (VALUES (0),(1),(2),(3)) AS bands(j)), " +
          "bc AS (SELECT band, bv, count(*) AS c FROM banded GROUP BY 1, 2), " +
          s"ok AS (SELECT banded.media_id, banded.fp, banded.band, banded.bv FROM banded " +
          s"JOIN bc ON banded.band = bc.band AND banded.bv = bc.bv WHERE bc.c <= ${NearDup.MaxBucketDocs}), " +
          "pr AS (SELECT DISTINCT a.media_id AS id1, b.media_id AS id2, " +
          "CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming " +
          "FROM ok a JOIN ok b ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id) " +
          s"SELECT id1, id2, hamming FROM pr WHERE hamming <= $MaxAssetHamming ORDER BY id1, id2"
      },
      scaleNote = "dedup_near's candidate economics on binary: the " +
        "fingerprint is one 32-sum map-side-combined aggregate per " +
        "asset (grams stream out of the scan, payloads never shuffle " +
        "— only 8-byte fingerprints do), candidates are equi joins " +
        "on (band, value) with the df cap bounding every bucket's " +
        "quadratic expansion (a common byte pattern — headers, " +
        "padding — lands thousands of assets in one bucket; true " +
        "near-dups still collide in their discriminative bands), and " +
        "the Hamming verify touches only collided fingerprint " +
        "pairs. With a real codec the SAME plan fingerprints " +
        "decoded-pixel blocks (pHash proper): Codec.decode swaps in " +
        "at the gram stage and the banding/verify/cap machinery is " +
        "untouched — which is the point of keeping the fingerprint " +
        "family portable rather than engine-hashed. Band count vs " +
        "bits is the recall/cost dial exactly as simhash_near " +
        "documents; the affine sign family keeps the whole pair " +
        "table under the cross-engine hash gate."),

    // Binary-column DATA-QUALITY gate (r11) — dq_expectations' shape
    // applied to the payload column, the checks an asset lake runs
    // before any decode job: per declared format, payload-size
    // profile (min/max/avg/total bytes — the skew report that sizes
    // decode batches), empty-payload count (the rows a codec would
    // crash on), and the metadata-consistency count (declared size ≠
    // actual byte length — the corrupted-upload / wrong-column
    // signal; with a real codec this becomes declared-dims ≠
    // decoded-dims, same column). Everything computes INSIDE the
    // scan from length(payload) — the bytes themselves never move,
    // the point of keeping payloads in their own column chunk.
    QueryDef(
      "multimodal_quality",
      (spark, sf) => {
        val m = Tables.documents(spark, sf)
          .select(col("doc_id").as("media_id"),
            encode(col("text"), "UTF-8").as("payload"),
            when(col("doc_id") % 3 === 0, "png")
              .when(col("doc_id") % 3 === 1, "jpeg")
              .otherwise("webp").as("format"),
            col("n_chars").as("declared_bytes"))
          .withColumn("n_bytes", length(col("payload")).cast("long"))
        m.groupBy("format")
          .agg(count(lit(1)).as("n_media"),
            sum(when(col("n_bytes") === 0, 1L).otherwise(0L))
              .as("n_empty"),
            sum(when(col("n_bytes") =!= col("declared_bytes"), 1L)
              .otherwise(0L)).as("n_meta_mismatch"),
            min(col("n_bytes")).as("min_bytes"),
            max(col("n_bytes")).as("max_bytes"),
            sum(col("n_bytes")).as("total_bytes"))
          .select(col("format"), col("n_media"), col("n_empty"),
            col("n_meta_mismatch"), col("min_bytes"), col("max_bytes"),
            col("total_bytes"),
            round(col("total_bytes").cast("double") / col("n_media"), 4)
              .as("avg_bytes"))
          .orderBy("format")
      },
      Some("WITH m AS (SELECT CASE WHEN doc_id%3=0 THEN 'png' WHEN doc_id%3=1 THEN 'jpeg' ELSE 'webp' END AS format, " +
        "CAST(length(text) AS BIGINT) AS n_bytes, n_chars AS declared_bytes FROM documents) " +
        "SELECT format, count(*) AS n_media, " +
        "CAST(sum(CASE WHEN n_bytes = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty, " +
        "CAST(sum(CASE WHEN n_bytes <> declared_bytes THEN 1 ELSE 0 END) AS BIGINT) AS n_meta_mismatch, " +
        "min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes, " +
        "CAST(sum(n_bytes) AS BIGINT) AS total_bytes, " +
        "round(CAST(sum(n_bytes) AS DOUBLE)/count(*), 4) AS avg_bytes " +
        "FROM m GROUP BY 1 ORDER BY 1"),
      scaleNote = "ONE map-side-combined aggregate whose every input " +
        "is length(payload) — a column-chunk metadata read away " +
        "from never touching the bytes at all (parquet stores byte-" +
        "array lengths in the page; a statistics-aware reader " +
        "answers the size profile from footers) — and the report " +
        "is |formats| rows. This is the gate that SCHEDULES decode " +
        "jobs at 100 TB: total_bytes per format sizes the executor " +
        "fleet, max_bytes flags the 4 GB row that would OOM a " +
        "codec, n_empty and n_meta_mismatch quarantine upstream " +
        "corruption before a single decode cycle is spent " +
        "(multimodal_features' mapPartitions then runs on clean " +
        "rows only — source_quarantine's decide-then-process " +
        "discipline on binary)."))
}
