package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Product quantization — the compression half of an IVF-PQ vector
  * index (SURVEY.md §2.3 E7; completes the codebook story q196 opened:
  * q74 trains the COARSE quotient codebook, this gate trains the M
  * per-subspace RESIDUAL-style codebooks and scores by asymmetric
  * distance computation).
  *
  * Design, and why it scales to 100 TB of vectors:
  *  - The 64-d embedding splits into M=4 contiguous 16-d subspaces;
  *    each gets its own K=8-codeword codebook trained with the SAME
  *    fixed-point Lloyd machinery as q196 (`KMeans.codebook` over the
  *    sliced vector) — deterministic to the last fixed-point digit, so
  *    the DuckDB oracle replays all M chains as side-by-side CTEs via
  *    `KMeans.oracleCtesSlice`.
  *  - Encoding is a pure MAP stage: the M×K codebook collapses to ONE
  *    broadcast row of (sub, cid, cs) structs; each vector's M codes
  *    are per-row argmax folds (ties to lowest cid), no explode and no
  *    shuffle. A 10^10-vector corpus encodes embarrassingly parallel,
  *    and the stored code is M bytes instead of 64 floats (64× smaller
  *    — the reason PQ exists).
  *  - ADC scoring is exact INTEGER arithmetic end to end: both the
  *    query and the codewords are 1e6-fixed-point BIGINTs, so the
  *    per-subspace dot products and their sum are order-independent —
  *    no float drift between engines, no partial-agg sensitivity.
  *  - Top-10 by ADC and top-10 exact are both orderBy+limit →
  *    TakeOrderedAndProject (per-partition heaps + driver merge of 10,
  *    never a global sort); the recall flag joins the two 10-row sides
  *    with an explicit broadcast.
  *
  * Reference scope: the reference has no vector index at all — this is
  * part of the training-data-pipeline mandate (ANN over an embedding
  * column, baseline brute force q50, scale path IVF q74 + PQ here).
  */
object Pq {

  private val M = 4 // subspaces
  private val SUB = 16 // dims per subspace (embeddings are 64-d)
  private val K = 8 // codewords per subspace
  private val ITERS = 2 // Lloyd iterations per subspace

  /** Exact integer dot over two fixed-point BIGINT arrays (ascending
    * fold; order-free because integer addition is associative).
    */
  private def intDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), " +
      "(acc, v) -> acc + v)"

  private def duckIntDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(len($a)), i -> $a[i+1] * $b[i+1])), " +
      "(x, y) -> x + y)"

  private def duckScaled(a: String): String =
    s"list_transform($a, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000 " +
      "+ 0.5) AS BIGINT))"

  val queries: Seq[Q] = Seq(
    Q(
      "q202_pq_adc",
      {
        val chains = (0 until M)
          .map(m => KMeans.oracleCtesSlice(K.toString, ITERS, m * SUB, SUB,
            s"_s$m"))
          .mkString(",\n")
        val encs = (0 until M).map { m =>
          val sliced = duckScaled(
            s"list_slice(e.embedding, ${m * SUB + 1}, ${(m + 1) * SUB})")
          s"""enc$m AS (
             |  SELECT vec_id, cs FROM (
             |    SELECT e.vec_id, c.cs,
             |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |        ORDER BY ${duckIntDot(sliced, "c.cs")} DESC, c.cid ASC)
             |        AS rn
             |    FROM embeddings e, cl${ITERS}_s$m c) WHERE rn = 1)"""
            .stripMargin
        }.mkString(",\n")
        val adcSum = (0 until M).map { m =>
          duckIntDot(s"list_slice(q.qs, ${m * SUB + 1}, ${(m + 1) * SUB})",
            s"e$m.cs")
        }.mkString("(", ") + (", ")")
        val encJoins = (0 until M)
          .map(m => s"JOIN enc$m e$m ON v.vec_id = e$m.vec_id")
          .mkString("\n  ")
        s"""WITH $chains,
           |$encs,
           |qv AS (SELECT ${duckScaled("embedding")} AS qs
           |  FROM embeddings WHERE vec_id = 0),
           |scored AS (
           |  SELECT v.vec_id, $adcSum AS adc,
           |    ${duckIntDot(duckScaled("v.embedding"), "q.qs")} AS exact
           |  FROM embeddings v, qv q
           |  $encJoins
           |  WHERE v.vec_id <> 0),
           |tope AS (SELECT vec_id FROM scored
           |  ORDER BY exact DESC, vec_id ASC LIMIT 10)
           |SELECT s.vec_id, s.adc, s.exact,
           |  CAST(CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END AS INT)
           |    AS in_exact
           |FROM (SELECT * FROM scored ORDER BY adc DESC, vec_id ASC
           |  LIMIT 10) s
           |LEFT JOIN tope t ON s.vec_id = t.vec_id
           |ORDER BY s.adc DESC, s.vec_id ASC""".stripMargin
      }) { (s, dir) =>
      val e = Tables.table(s, dir, "embeddings")
      // train one codebook per subspace on the sliced vectors
      val cbs = (0 until M).map { m =>
        val sub = e.select(col("vec_id"),
          expr(s"slice(embedding, ${m * SUB + 1}, $SUB)").as("embedding"))
        KMeans.codebook(s, sub, K, ITERS)
          .select(lit(m).as("sub"), col("cid"), col("cs"))
      }.reduce(_.unionByName(_))
      val cbRow =
        cbs.agg(expr("array_sort(collect_list(struct(sub, cid, cs)))")
          .as("cbs"))
      val q0 = e.filter(col("vec_id") === 0)
        .select(expr(KMeans.scaleExpr("embedding")).as("qs"))
      // encode + ADC score: one broadcast-joined map stage
      val base = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(cbRow))
        .crossJoin(broadcast(q0))
        .withColumn("sv", expr(KMeans.scaleExpr("embedding")))
      val coded = (0 until M).foldLeft(base) { (df, m) =>
        df.withColumn(s"c$m", expr(
          s"-array_max(transform(filter(cbs, c -> c.sub = $m), " +
            s"c -> struct(${intDot(s"slice(sv, ${m * SUB + 1}, $SUB)",
              "c.cs")} AS d, -c.cid AS nc))).nc"))
      }
      val adcSum = (0 until M).map { m =>
        intDot(s"slice(qs, ${m * SUB + 1}, $SUB)",
          s"element_at(filter(cbs, c -> c.sub = $m AND c.cid = c$m), 1).cs")
      }.mkString("(", ") + (", ")")
      val scored = coded
        .withColumn("adc", expr(adcSum))
        .withColumn("exact", expr(intDot("sv", "qs")))
        .select(col("vec_id"), col("adc"), col("exact"))
      val exactTop = scored
        .orderBy(col("exact").desc, col("vec_id").asc).limit(10)
        .select(col("vec_id"), lit(1).as("hit"))
      scored.orderBy(col("adc").desc, col("vec_id").asc).limit(10)
        .join(broadcast(exactTop), Seq("vec_id"), "left")
        .select(col("vec_id"), col("adc"), col("exact"),
          coalesce(col("hit"), lit(0)).as("in_exact"))
        .orderBy(col("adc").desc, col("vec_id").asc)
    })
}
