package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier D (multimodal) — oracle-checked queries over the media table
  * (`Multimodal`): metadata-only scans, stub decode, resize planning, frame
  * sampling, and histogram features. The decode kernels are deterministic
  * byte arithmetic (see Multimodal scaladoc) so DuckDB can replay them; the
  * Spark side still runs the real typed-Dataset `mapPartitions` plumbing.
  */
object MultimodalQueries {

  private val modalitySql =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
  private val mimeSql =
    "CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata-only scan: content column is never touched → columnar pruning
    // makes this free at 100 TB (ReadSchema excludes the payload).
    "mm_metadata" -> { (s, dir) =>
      Multimodal.mediaTable(s, dir).toDF()
        .select(
          col("media_id"), col("modality"), col("mime"), col("n_bytes"),
          sha2(col("content"), 256).as("sha"))
        .orderBy("media_id")
    },

    // Stub decode through the typed mapPartitions boundary.
    "mm_decode" -> { (s, dir) =>
      Multimodal.decode(Multimodal.mediaTable(s, dir)).toDF()
        .orderBy("media_id")
    },

    // Resize planning over decoded metadata (pure column arithmetic).
    "mm_resize" -> { (s, dir) =>
      Multimodal.resizePlan(
          Multimodal.decode(Multimodal.mediaTable(s, dir)).toDF())
        .select(col("media_id"), col("width"), col("height"), col("out_w"), col("out_h"))
        .orderBy("media_id")
    },

    // Frame sampling (video modality only), every 7th byte.
    "mm_frames" -> { (s, dir) =>
      Multimodal.frameSample(Multimodal.mediaTable(s, dir), 7)
        .orderBy("media_id")
    },

    // MEDIA DEDUP (r13): duplicate detection over the OPAQUE payloads —
    // the media face of dedup_exact, bucketed the way a real pipeline
    // does it: content-prefix digest first (a 16-byte slice is the cheap
    // discriminator that avoids hashing petabytes of full payloads per
    // candidate; collisions are verified downstream), scoped per
    // modality. Emits clusters of ≥ 2 members with the representative
    // (min media_id) and total byte mass. Scale shape: the digest is
    // computed map-side from a bounded slice, the shuffle keys on
    // (modality, 32-byte digest) — fixed width, never the payload — and
    // the payload column itself never crosses an exchange.
    "mm_dedup" -> { (s, dir) =>
      Multimodal.mediaTable(s, dir).toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"),
          sha2(expr("substring(content, 1, 16)"), 256).as("prefix_sha"))
        .groupBy("modality", "prefix_sha")
        .agg(count(lit(1)).as("n_members"),
          min(col("media_id")).as("rep_id"),
          sum(col("n_bytes")).as("total_bytes"))
        .filter(col("n_members") >= 2)
        .orderBy("modality", "rep_id")
    },

    // PERCEPTUAL-HASH NEAR-DUP (r19, verdict ask #5): the media face of
    // near-duplicate detection — mm_dedup catches byte-exact copies via
    // content digests; this catches NEAR-copies via a 60-bit SimHash
    // fingerprint (`Multimodal.phashStub` — the stub stands in for a
    // real DCT pHash; the banding structure below is the real operator).
    // Candidate generation is the minhash-banding pattern on the
    // fingerprint: 4 bands × 15 bits, equi-join on (modality, band,
    // band_value). By pigeonhole this is EXHAUSTIVE for the hamming ≤ 3
    // ball — ≤ 3 differing bits can touch at most 3 of the 4 bands, so
    // every qualifying pair shares at least one exact band — the banded
    // join is a lossless index, not an approximation, and the DuckDB
    // oracle can state the ground truth as a plain all-pairs hamming
    // predicate. Scale shape: fingerprints are computed map-side behind
    // the typed mapPartitions boundary (payloads never shuffle), the
    // join keys are fixed-width (modality, band, 15-bit value) buckets,
    // multi-band hits dedup AFTER the ≤ 3 filter on the tiny survivor
    // set, and the two join sides reuse one exchange. No cartesian
    // anywhere (PlanSpec-pinned).
    "mm_phash_neardup" -> { (s, dir) =>
      val ph = Multimodal.phashes(Multimodal.mediaTable(s, dir)).toDF()
      val banded = ph.select(col("media_id"), col("modality"),
          col("h1"), col("h2"),
          explode(expr("array(" +
            "struct(0 AS band, h1 & 32767 AS bv), " +
            "struct(1 AS band, shiftright(h1, 15) & 32767 AS bv), " +
            "struct(2 AS band, h2 & 32767 AS bv), " +
            "struct(3 AS band, shiftright(h2, 15) & 32767 AS bv))")).as("b"))
        .select(col("media_id"), col("modality"),
          col("h1"), col("h2"), col("b.band"), col("b.bv"))
      val lhs = banded.select(col("modality"), col("band"), col("bv"),
        col("media_id").as("id_a"), col("h1").as("h1a"), col("h2").as("h2a"))
      val rhs = banded.select(col("modality"), col("band"), col("bv"),
        col("media_id").as("id_b"), col("h1").as("h1b"), col("h2").as("h2b"))
      lhs.join(rhs, Seq("modality", "band", "bv"))
        .filter(col("id_a") < col("id_b"))
        .select(col("modality"), col("id_a"), col("id_b"),
          expr("CAST(bit_count(h1a ^ h1b) + bit_count(h2a ^ h2b) AS BIGINT)")
            .as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy("modality", "id_a", "id_b")
    },

    // Histogram features: raw bin counts (ints — exactly comparable; the
    // L1-normalized float vector is `featureStub`, property-tested).
    "mm_features" -> { (s, dir) =>
      Multimodal.features(Multimodal.mediaTable(s, dir)).toDF()
        .select(
          col("media_id"),
          element_at(col("feature"), 1).cast("int").as("b0"),
          element_at(col("feature"), 2).cast("int").as("b1"),
          element_at(col("feature"), 3).cast("int").as("b2"),
          element_at(col("feature"), 4).cast("int").as("b3"))
        .orderBy("media_id")
    })

  val oracles: Map[String, String] = Map(
    "mm_metadata" ->
      s"""SELECT doc_id AS media_id, $modalitySql AS modality, $mimeSql AS mime,
         |       CAST(length(text) AS BIGINT) AS n_bytes, sha256(text) AS sha
         |FROM documents ORDER BY media_id""".stripMargin,

    "mm_decode" ->
      s"""SELECT doc_id AS media_id, $modalitySql AS modality,
         |       CAST(ascii(text[1]) % 64 + 1 AS INT) AS width,
         |       CAST(ascii(text[2]) % 64 + 1 AS INT) AS height,
         |       3 AS channels,
         |       CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE length(text) * 10 END AS BIGINT) AS duration_ms
         |FROM documents ORDER BY media_id""".stripMargin,

    "mm_resize" ->
      s"""SELECT doc_id AS media_id,
         |       CAST(ascii(text[1]) % 64 + 1 AS INT) AS width,
         |       CAST(ascii(text[2]) % 64 + 1 AS INT) AS height,
         |       CAST(greatest(1, (ascii(text[1]) % 64 + 1) // 2) AS INT) AS out_w,
         |       CAST(greatest(1, (ascii(text[2]) % 64 + 1) // 2) AS INT) AS out_h
         |FROM documents ORDER BY media_id""".stripMargin,

    "mm_frames" ->
      """SELECT doc_id AS media_id,
        |       CAST((length(text) + 6) // 7 AS INT) AS n_frames,
        |       CAST(ascii(text[1]) AS INT) AS first_frame,
        |       CAST(ascii(text[CAST((length(text) - 1) // 7 * 7 + 1 AS INT)]) AS INT) AS last_frame
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,

    "mm_dedup" ->
      s"""SELECT $modalitySql AS modality,
         |       sha256(substr(text, 1, 16)) AS prefix_sha,
         |       CAST(count(*) AS BIGINT) AS n_members,
         |       min(doc_id) AS rep_id,
         |       CAST(sum(length(text)) AS BIGINT) AS total_bytes
         |FROM documents
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY modality, rep_id""".stripMargin,

    // Ground truth for the banded near-dup join: ALL pairs at hamming ≤ 3
    // (the banding is exhaustive for that ball — see the query comment),
    // with the identical exact-integer polynomial gram hash and sign-of-
    // sum bit derivation. The 60 per-bit sums / 2×30-bit packs are
    // generated programmatically below.
    "mm_phash_neardup" -> {
      val bitsums = (0 until 60).map(k =>
        s"sum(CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS s$k")
        .mkString(", ")
      val pack1 = (0 until 30).map(k =>
        s"(CASE WHEN s$k > 0 THEN (1::BIGINT << $k) ELSE 0 END)").mkString(" + ")
      val pack2 = (0 until 30).map(k =>
        s"(CASE WHEN s${k + 30} > 0 THEN (1::BIGINT << $k) ELSE 0 END)").mkString(" + ")
      // 131^j stays exact in Double up to j = 7 (131^7 ≈ 6.6e14 < 2^53)
      val poly = (0 until 8).map(j =>
        s"CAST(ascii(text[CAST(i + $j AS INT)]) AS BIGINT) * ${math.pow(131, j).toLong}")
        .mkString(" + ")
      s"""WITH pos AS (
         |  SELECT doc_id, $modalitySql AS modality, text,
         |         unnest(range(1, length(text) - 6)) AS i
         |  FROM documents WHERE length(text) >= 8),
         |g AS (SELECT doc_id, modality, ($poly) AS h FROM pos),
         |b AS (SELECT doc_id, modality, $bitsums FROM g GROUP BY 1, 2),
         |h AS (SELECT doc_id, modality, $pack1 AS h1, $pack2 AS h2 FROM b)
         |SELECT a.modality, a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) AS BIGINT) AS hamming
         |FROM h a JOIN h b ON a.modality = b.modality AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= 3
         |ORDER BY a.modality, id_a, id_b""".stripMargin
    },

    "mm_features" ->
      """SELECT doc_id AS media_id,
        |       CAST(len(list_filter(hist, x -> x = 0)) AS INT) AS b0,
        |       CAST(len(list_filter(hist, x -> x = 1)) AS INT) AS b1,
        |       CAST(len(list_filter(hist, x -> x = 2)) AS INT) AS b2,
        |       CAST(len(list_filter(hist, x -> x = 3)) AS INT) AS b3
        |FROM (SELECT doc_id,
        |             list_transform(range(1, length(text) + 1), i -> ascii(text[i]) % 4) AS hist
        |      FROM documents)
        |ORDER BY media_id""".stripMargin)
}
