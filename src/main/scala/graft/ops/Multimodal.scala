package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column handling (SURVEY.md §2.3 E9 + training-data mandate):
  * media payloads modeled as opaque binary columns with typed metadata;
  * decode/feature-extraction runs per-partition over batches with a
  * clearly-marked deterministic STUB decoder (the real image/audio codecs
  * are not in this environment — the Spark-side plumbing is the deliverable:
  * schema, batching, partition parallelism).
  */
object Multimodal {

  /** STUB "decoder": a stand-in for image/audio decoding. Deterministic
    * fake features derived from the decoded payload; the real implementation
    * would decode the media frame here, one partition-batch at a time.
    * Features are codepoint-stream statistics so the DuckDB oracle can
    * recompute them exactly from the source text column.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Double] = {
    // ??? real codec goes here; deterministic fake keeps tests honest
    val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val cps = text.codePoints().toArray
    val h = cps.foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L)
    Array(
      cps.length.toDouble,
      if (cps.nonEmpty) cps.head.toDouble else 0.0,
      if (cps.nonEmpty) cps.last.toDouble else 0.0,
      h.toDouble)
  }

  val queries: Seq[Q] = Seq(
    // E9: binary payload + typed metadata, all relational: byte length,
    // content digest, and a deterministic fake feature vector (first-4-
    // codepoint intensities) standing in for decoded features.
    Q(
      "q60_multimodal_meta",
      """WITH f AS (
        |  SELECT doc_id,
        |    octet_length(encode(text)) AS n_bytes,
        |    md5(text) AS digest,
        |    list_transform(range(4), i ->
        |      ROUND(CAST(unicode(substr(text, i + 1, 1)) AS DOUBLE) / 255.0, 6))
        |      AS ff
        |  FROM documents
        |  WHERE doc_id < 100)
        |SELECT doc_id, n_bytes, digest,
        |  ff[1] AS f0, ff[2] AS f1, ff[3] AS f2, ff[4] AS f3
        |FROM f
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // the feature vector is computed as an array; the gate projection
      // indexes it to scalars (the driver's pandas compare can't sort
      // raw array cells)
      val feats = expr("transform(sequence(0, 3), i -> " +
        "ROUND(CAST(ascii(substr(text, i + 1, 1)) AS DOUBLE) / 255.0, 6))")
      Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          octet_length(col("text")).cast("bigint").as("n_bytes"),
          md5(col("text")).as("digest"),
          feats.as("ff"))
        .select(col("doc_id"), col("n_bytes"), col("digest"),
          element_at(col("ff"), 1).as("f0"), element_at(col("ff"), 2).as("f1"),
          element_at(col("ff"), 3).as("f2"), element_at(col("ff"), 4).as("f3"))
        .orderBy(col("doc_id"))
    },

    // E9: the mapPartitions decode path — binary column in, typed
    // (id, meta, features) batch out, one decoder instance per partition.
    // This is the plumbing a real image/audio pipeline reuses; only
    // decodeStub changes. The stub's codepoint-stream features are
    // recomputed exactly by the DuckDB oracle from the text column.
    Q(
      "q61_multimodal_decode",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(length(text) AS DOUBLE) AS n_cp,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE CAST(unicode(substr(text, 1, 1)) AS DOUBLE) END AS cp_first,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE CAST(unicode(substr(text, length(text), 1)) AS DOUBLE)
        |    END AS cp_last,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''),
        |      c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS DOUBLE) AS cp_hash
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      docs.mapPartitions { batch =>
        // per-partition decoder init would happen here (codec handles,
        // GPU context, ...) — then stream the batch through it
        batch.map { case (id, payload) =>
          val f = decodeStub(payload)
          (id, payload.length.toLong, f(0), f(1), f(2), f(3))
        }
      }.toDF("doc_id", "n_bytes", "n_cp", "cp_first", "cp_last", "cp_hash")
        .orderBy(col("doc_id"))
    })
}
