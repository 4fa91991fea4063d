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
    * fake features derived from the payload bytes; the real implementation
    * would decode the media frame here, one partition-batch at a time.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Double] = {
    // ??? real codec goes here; deterministic fake keeps tests honest
    val n = payload.length
    Array(
      n.toDouble,
      if (n > 0) payload(0).toDouble else 0.0,
      if (n > 0) payload(n - 1).toDouble else 0.0,
      payload.foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007).toDouble)
  }

  val queries: Seq[Q] = Seq(
    // E9: binary payload + typed metadata, all relational: byte length,
    // content digest, and a deterministic fake feature vector (first-4-
    // codepoint intensities) standing in for decoded features.
    Q(
      "q60_multimodal_meta",
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS digest,
        |  list_transform(range(4), i ->
        |    ROUND(CAST(unicode(substr(text, i + 1, 1)) AS DOUBLE) / 255.0, 6))
        |    AS fake_features
        |FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          octet_length(col("text")).as("n_bytes"),
          md5(col("text")).as("digest"),
          expr("transform(sequence(0, 3), i -> " +
            "ROUND(CAST(ascii(substr(text, i + 1, 1)) AS DOUBLE) / 255.0, 6))")
            .as("fake_features"))
        .orderBy(col("doc_id"))
    },

    // E9 rows-only: the mapPartitions decode path — binary column in, typed
    // (id, meta, features) batch out, one decoder instance per partition.
    // This is the plumbing a real image/audio pipeline reuses; only
    // decodeStub changes.
    Q.rowsOnly("q61_multimodal_decode") { (s, dir) =>
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      docs.mapPartitions { batch =>
        // per-partition decoder init would happen here (codec handles,
        // GPU context, ...) — then stream the batch through it
        batch.map { case (id, payload) =>
          val feats = decodeStub(payload)
          (id, payload.length, feats)
        }
      }.toDF("doc_id", "n_bytes", "features")
        .orderBy(col("doc_id"))
    })
}
