package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column handling (SURVEY.md §2.3 E9 + training-data mandate):
  * media payloads modeled as opaque binary columns with typed metadata;
  * decode/feature-extraction runs per-partition over batches through a REAL
  * image codec (javax.imageio PNG — public JDK API), so the full pipeline a
  * production image corpus runs — binary column in, decoder init per
  * partition, typed feature batch out — is exercised end-to-end on real
  * bytes, not a stand-in.
  */
object Multimodal {

  /** Deterministic RGB test pattern for `doc_id`: pixel (x, y) has
    * channels ((id*31 + x*7 + y*13) % 256, (id*17 + x*3 + y*5) % 256,
    * (id*11 + x*13 + y*7) % 256). Closed-form, so the DuckDB oracle can
    * recompute every decoded statistic without running a codec.
    */
  private[ops] val W = 12
  private[ops] val H = 8

  /** ENCODE: real PNG bytes via javax.imageio. Runs inside mapPartitions —
    * this is the writer-side twin of the decode path below.
    */
  private[ops] def encodePng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
        val b = ((id * 11 + x * 13 + y * 7) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** DECODE: real PNG decode via javax.imageio + per-channel pixel stats —
    * the feature-extraction kernel of the decode stage. Pure function of
    * the payload bytes; constant memory per image.
    */
  private[ops] def decodePng(payload: Array[Byte])
      : (Long, Long, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb)
  }

  val queries: Seq[Q] = Seq(
    // E9: binary payload + typed metadata, all relational: byte length,
    // content digest, and a deterministic feature vector (first-4-
    // codepoint intensities) — the metadata sidecar of a media column.
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

    // E9: the REAL-CODEC decode path. An opaque binary image column (PNG
    // bytes, produced by the javax.imageio encoder from a closed-form
    // test pattern) is decoded back through javax.imageio inside
    // mapPartitions — one decoder scope per partition, streaming batch
    // through it — and reduced to typed features (dimensions + per-channel
    // pixel sums). The oracle recomputes the features from the pattern's
    // closed form, so a green row proves the ENTIRE encode→bytes→decode→
    // features loop is bit-exact through a real codec. At 100 TB both
    // stages are pure map work: no shuffle, constant memory per image,
    // decoder init amortized per partition (the place a GPU/native codec
    // handle would be created).
    Q(
      "q61_multimodal_decode",
      """SELECT doc_id,
        |  CAST(12 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(list_sum(flatten(list_transform(range(8), y ->
        |    list_transform(range(12), x -> (doc_id*31 + x*7 + y*13) % 256))))
        |    AS BIGINT) AS sum_r,
        |  CAST(list_sum(flatten(list_transform(range(8), y ->
        |    list_transform(range(12), x -> (doc_id*17 + x*3 + y*5) % 256))))
        |    AS BIGINT) AS sum_g,
        |  CAST(list_sum(flatten(list_transform(range(8), y ->
        |    list_transform(range(12), x -> (doc_id*11 + x*13 + y*7) % 256))))
        |    AS BIGINT) AS sum_b
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ids = Tables.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
      // encode stage: id -> real PNG bytes (binary media column).
      // NOTE ON COST ATTRIBUTION: this stage is the gate's FIXTURE
      // GENERATOR — a production corpus reads PNG bytes from a parquet
      // binary column; ImageIO.write-per-row here is ~85% of q61's bench
      // time and is NOT the decode-path cost. Don't "optimize" the decode
      // stage below to chase this query's bench number.
      val media = ids.mapPartitions { batch =>
        batch.map(id => (id, encodePng(id)))
      }.toDF("doc_id", "payload")
      // decode stage: binary column -> typed features through the codec
      media.as[(Long, Array[Byte])].mapPartitions { batch =>
        // per-partition decoder init would happen here (native codec
        // handles, GPU context, ...) — then stream the batch through it
        batch.map { case (id, payload) =>
          val (w, h, sr, sg, sb) = decodePng(payload)
          (id, w, h, sr, sg, sb)
        }
      }.toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
        .orderBy(col("doc_id"))
    })
}
