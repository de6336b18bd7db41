package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline tier: media
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs partition-batched. The container has no image or
  * audio codecs, so the decode step is a clearly-marked deterministic stub
  * ([[FakeDecoder]]) — the Spark-side plumbing (schema, binary encoding,
  * partition batching, feature shape) is real and tested.
  *
  * Scale design (100 TB): payload bytes never enter a shuffle — metadata
  * extraction and feature extraction are map-only over the scan, and any
  * downstream join/dedup runs on the extracted (narrow) features.
  * `documents.text` stands in for the media payload via UTF-8 encoding.
  */
object Multimodal {

  /** (doc_id, chunk_idx, n_units, chunk_hash) — the 64-unit payload
    * chunking, memoized + persisted: the chunk layout dump and the
    * chunk-hash dedup both start from this identical map-only explode +
    * per-chunk hash, which is the substring-heavy half of each.
    */
  private def chunkHashes(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextHash
    graft.Caches.getOrElseUpdate(
      s"mm-chunks:$d:${graft.Caches.fingerprint(s, d)}",
      Tables.documents(s, d)
        .where(length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(expr(
            "sequence(1, cast(ceil(char_length(text) / 64.0) AS bigint))"))
            .as("chunk_idx"))
        .withColumn("chunk", expr(
          "substring(text, cast((chunk_idx - 1) * 64 + 1 AS int), 64)"))
        .select(col("doc_id"), col("chunk_idx"),
          length(col("chunk")).cast("long").as("n_units"),
          expr(TextHash.polySpark("chunk")).as("chunk_hash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Deterministic stand-in for a media decoder (no codecs in-container).
    * Real deployments swap `decode` for an image/audio library call; the
    * signature (bytes -> fixed-length feature vector) and the partition-
    * batched call shape are what the pipeline depends on.
    */
  object FakeDecoder {
    val featureDim = 4

    /** "Decode" a payload into features: [byteLen, mean, max, checksum]. */
    def decode(payload: Array[Byte]): Array[Double] = {
      if (payload.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
      else {
        val unsigned = payload.map(b => (b & 0xff).toDouble)
        Array(
          payload.length.toDouble,
          unsigned.sum / payload.length,
          unsigned.max,
          unsigned.sum % 256.0)
      }
    }
  }

  val entries: Seq[Q] = Seq(

    // Binary payload + typed metadata: the bronze layout for media columns.
    Q("q_mm_meta",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  length(text) AS n_chars_meta,
        |  octet_length(encode(text))::DOUBLE / length(text) AS bytes_per_char
        |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .where(length(col("text")) > 0)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          length(col("text")).cast("long").as("n_chars_meta"),
          (length(col("payload")).cast("double") / length(col("text")))
            .as("bytes_per_char"))
        .orderBy("doc_id")
    },

    // Frame sampling: every 50th unit of the payload -> thumbnail. The
    // sequence/transform shape is exactly how frame indices map over a
    // video byte stream; here units are characters.
    Q("q_mm_framesample",
      """SELECT doc_id,
        |  CASE WHEN length(text) = 0 THEN ''
        |       ELSE array_to_string(list_transform(
        |         generate_series(1, length(text), 50), i -> substr(text, i, 1)), '')
        |  END AS thumb,
        |  CASE WHEN length(text) = 0 THEN 0
        |       ELSE len(generate_series(1, length(text), 50)) END AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(length(col("text")) === 0, "")
            .otherwise(expr(
              "array_join(transform(sequence(1, char_length(text), 50), i -> substring(text, i, 1)), '')"))
            .as("thumb"),
          when(length(col("text")) === 0, 0L)
            .otherwise(expr("size(sequence(1, char_length(text), 50))").cast("long"))
            .as("n_frames"))
        .orderBy("doc_id")
    },

    // Fixed-size payload chunking: one row per 64-unit chunk with its
    // length and content hash — the layout for chunked decode/transcode/
    // upload of media too large to process whole (each chunk is an
    // independent unit of work, so a 4 GB video fans out over the
    // cluster instead of pinning one task). Map-only explode; chunk
    // hashes via the dual-dialect polyHash so dedup can run chunk-level.
    Q("q_mm_chunks", {
      import graft.functions.TextHash
      s"""SELECT doc_id, chunk_idx,
         |  length(chunk) AS n_units,
         |  ${TextHash.polyDuck("chunk")} AS chunk_hash
         |FROM (
         |  SELECT doc_id, i AS chunk_idx, substr(text, (i - 1) * 64 + 1, 64) AS chunk
         |  FROM documents, unnest(generate_series(1,
         |    CAST(ceil(length(text) / 64.0) AS BIGINT))) AS u(i)
         |  WHERE length(text) > 0)
         |ORDER BY doc_id, chunk_idx""".stripMargin
    }) { (s, d) =>
      chunkHashes(s, d).orderBy("doc_id", "chunk_idx")
    },

    // Chunk-hash payload dedup: binary blobs sharing >= 3 distinct
    // content-chunk hashes are near-dup media — the content-addressed
    // dedup a 100 TB multimodal corpus runs BEFORE any decode (byte-level,
    // codec-agnostic, catches re-uploads, trims, and container re-wraps
    // that whole-file hashing misses). Same inverted-index shape as the
    // n-gram text dedup: explode to (doc, chunk_hash) postings, equi-join
    // on the hash, count per pair — never a payload×payload comparison,
    // and payload bytes never enter the shuffle (hashes only). At corpus
    // scale a boilerplate chunk (shared container header) would need the
    // same df-cap q_dedup_ngram_capped applies to hot shingles.
    Q("q_mm_dedup", {
      import graft.functions.TextHash
      s"""WITH ch AS (
         |  SELECT DISTINCT doc_id, ${TextHash.polyDuck("chunk")} AS h
         |  FROM (
         |    SELECT doc_id, substr(text, (i - 1) * 64 + 1, 64) AS chunk
         |    FROM documents, unnest(generate_series(1,
         |      CAST(ceil(length(text) / 64.0) AS BIGINT))) AS u(i)
         |    WHERE length(text) > 0))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM ch a JOIN ch b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY a_id, b_id""".stripMargin
    }) { (s, d) =>
      val ch = chunkHashes(s, d)
        .select(col("doc_id"), col("chunk_hash").as("h"))
        .distinct()
      ch.select(col("doc_id").as("a_id"), col("h"))
        .join(ch.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
        .where(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 3)
        .orderBy("a_id", "b_id")
    },

    // Partition-batched decode -> feature columns. mapPartitions is the
    // Scala analog of mapInPandas: one decoder instance per partition,
    // payloads streamed through it without collecting to the driver.
    // The FakeDecoder features are deterministic byte math over the UTF-8
    // payload, so the oracle CAN recompute them: DuckDB lacks blob
    // indexing, but hex(blob) exposes every byte as two hex digits and
    // strpos('0123456789ABCDEF', ·) turns a digit back into its value —
    // exact integer arithmetic, no float-parity risk (sums of bytes stay
    // under 2^53, where double accumulation is exact too).
    Q("q_mm_features",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, n,
        |    list_transform(range(1, n + 1), i ->
        |      16 * (strpos('0123456789ABCDEF', substr(h, 2*i::INT - 1, 1)) - 1)
        |         + strpos('0123456789ABCDEF', substr(h, 2*i::INT, 1)) - 1) AS bs
        |  FROM b)
        |SELECT doc_id, CAST(n AS DOUBLE) AS f_len,
        |  CASE WHEN n = 0 THEN 0.0
        |       ELSE CAST(list_aggregate(bs, 'sum') AS DOUBLE) / n END AS f_mean,
        |  CASE WHEN n = 0 THEN 0.0
        |       ELSE CAST(list_aggregate(bs, 'max') AS DOUBLE) END AS f_max,
        |  CASE WHEN n = 0 THEN 0.0
        |       ELSE CAST(list_aggregate(bs, 'sum') % 256 AS DOUBLE) END AS f_checksum
        |FROM v ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val payloads = Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
      payloads.mapPartitions { it =>
        // per-partition decoder init would go here (codec handles, models)
        it.map { case (id, bytes) =>
          val f = FakeDecoder.decode(bytes)
          (id, f(0), f(1), f(2), f(3))
        }
      }.toDF("doc_id", "f_len", "f_mean", "f_max", "f_checksum")
        .orderBy("doc_id")
    }
  )
}
