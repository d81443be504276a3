package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Distances, PqAdc}

/**
 * Product quantization (PQ) for embedding columns — the memory-scale ANN
 * path (Jégou et al., TPAMI 2011). Splits each `dim`-d vector into `m`
 * subspaces of `dim/m` dims, k-means-quantizes each subspace to `k` codes,
 * and stores each vector as `m` small ints. At dim=64/float that is
 * 256 B → 16 B per row (16×), which is the difference between "the ANN
 * working set fits in cluster memory at 10⁹–10¹¹ vectors" and not.
 *
 * Search is asymmetric-distance computation (ADC): the query precomputes a
 * (m × k) lookup table of sub-distances once, then the corpus scan is
 * `sum_m lut[m][codes[m]]` per row — a native codegen expression
 * (graft/functions/PqAdc.scala) over the *codes only*; original vectors are
 * touched only to rerank the ADC shortlist, i.e. O(queries × shortlist)
 * rows instead of O(corpus).
 *
 * Scale shape: the codebook is m×k rows (broadcast everywhere), training
 * is one corpus scan per Lloyd iteration with map-side partial aggregation,
 * encoding is one scan, and ADC search is one codes-only scan with a
 * bounded per-query window. Nothing materializes an all-pairs space.
 *
 * No analog in the reference SDK (its vector search is exact server-side
 * top-k, vastdb/_adbc.py:133-159); this extends the same surface to
 * corpus sizes where exact scan is not affordable.
 */
object Quantization {

  /** (id, m, sub_vec) — one row per subspace slice of each input vector. */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         m: Int, sub: Int): DataFrame =
    df.select(col(idCol), posexplode(array((0 until m).map(i =>
        slice(col(vecCol), i * sub + 1, sub)): _*)))
      .toDF(idCol, "m", "sub_vec")

  private def requireDivisible(dim: Int, m: Int): Int = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    dim / m
  }

  /** Nearest code per (id, subspace): broadcast-codebook distance scan +
    * packed-key HashAggregate winner election — `Distances.packDistId` is
    * order-isomorphic to lexicographic (d, code) for the non-negative
    * squared distances, where the old `min(struct(d, code))` buffered a
    * struct and planned as SortAggregate (every task sorted its rows×k
    * candidates before the partial agg). Codes outside [0, 2³¹) in a
    * caller-supplied codebook fail loudly (packDistId's guard).
    * Returns (idCol, m, code). */
  private def assignCodes(rows: DataFrame, idCol: String,
                          codebook: DataFrame): DataFrame =
    rows.join(broadcast(codebook), Seq("m"))
      .withColumn("_d", Distances.l2sq(col("sub_vec"), col("c_vec")))
      .groupBy(col(idCol), col("m"))
      .agg(min(Distances.packDistId(col("_d"), col("code"))).as("_bpk"))
      .select(col(idCol), col("m"),
        Distances.unpackPackedId(col("_bpk")).cast("int").as("code"))

  /**
   * Train per-subspace codebooks: returns (m, code, c_vec) with
   * `m ∈ [0, m)`, `code ∈ [0, k)`. Seeds are a deterministic hash-ordered
   * sample per subspace (no RNG state — reruns and resumed jobs agree),
   * refined by `iters` Lloyd iterations. Codes that lose every member keep
   * their previous centroid, so the codebook stays exactly m×k.
   */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int, k: Int, iters: Int = 2): DataFrame = {
    val sub = requireDivisible(dim, m)
    val rows = subvectors(corpus, idCol, vecCol, m, sub)

    // seed: per-subspace hash-ordered sample, code = dense 0..k-1
    val byM = Window.partitionBy("m")
      .orderBy(xxhash64(col(idCol), col("m")), col(idCol))
    var codebook = rows
      .withColumn("_rn", row_number().over(byM))
      .filter(col("_rn") <= k)
      .select(col("m"), (col("_rn") - 1).cast("int").as("code"),
        col("sub_vec").as("c_vec"))

    for (_ <- 0 until iters) {
      // assign: broadcast codebook + packed-key winner aggregate (map-side
      // combine collapses the rows×k join output before the shuffle, and
      // the bits(d)·2³¹+code DECIMAL key keeps it a HashAggregate — the
      // min(struct(d, code, sub_vec)) spelling buffered a struct and
      // planned as SortAggregate, sorting every task's rows×k candidates);
      // the winner's sub_vec re-attaches by (id, m), which is unique by
      // construction of `subvectors`
      val best = assignCodes(rows, idCol, codebook)
      val assigned = rows.join(best, Seq(idCol, "m"))
        .select(col("m"), col("code"), col("sub_vec"))
      // new centroid = per-(m, code) dimension-wise mean
      val means = assigned
        .select(col("m"), col("code"), posexplode(col("sub_vec")))
        .groupBy("m", "code", "pos")
        .agg(avg(col("col")).as("_mean"))
        .groupBy("m", "code")
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("_mean")))),
          x => x.getField("_mean").cast("float")).as("c_vec_new"))
      codebook = codebook.join(means, Seq("m", "code"), "left")
        .select(col("m"), col("code"),
          coalesce(col("c_vec_new"), col("c_vec")).as("c_vec"))
        .localCheckpoint(true) // cut the per-iteration lineage growth
    }
    codebook
  }

  /** Encode every corpus row as its PQ codes: (idCol, pq_codes array<int>,
    * ordered by subspace). One scan; the broadcast-join + min-struct shape
    * never shuffles more than one row per (id, subspace). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, dim: Int, m: Int): DataFrame = {
    val sub = requireDivisible(dim, m)
    assignCodes(subvectors(corpus, idCol, vecCol, m, sub), idCol, codebook)
      .groupBy(col(idCol))
      .agg(transform(
        sort_array(collect_list(struct(col("m"), col("code")))),
        x => x.getField("code")).as("pq_codes"))
  }

  /** Per-query ADC lookup tables: (q_id, q_vec, lut array<array<double>>),
    * lut[m][code] = ||q_m − centroid(m, code)||². Output is
    * O(queries) rows; the m×k table rides inside each row. */
  def pqLut(queries: DataFrame, idCol: String, vecCol: String,
            codebook: DataFrame, dim: Int, m: Int): DataFrame = {
    val sub = requireDivisible(dim, m)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    subvectors(q, "q_id", "q_vec", m, sub)
      .join(broadcast(codebook), Seq("m"))
      .withColumn("_d", Distances.l2sq(col("sub_vec"), col("c_vec")))
      .groupBy("q_id", "m")
      .agg(transform(
        sort_array(collect_list(struct(col("code"), col("_d")))),
        x => x.getField("_d")).as("_row"))
      .groupBy("q_id")
      .agg(transform(
        sort_array(collect_list(struct(col("m"), col("_row").as("r")))),
        x => x.getField("r")).as("lut"))
      .join(q, Seq("q_id"))
  }

  /**
   * IVF-PQ search (the FAISS IVFPQ composition): probe the `nprobe`
   * nearest coarse cells per query, ADC-score ONLY the probed cells' code
   * rows, exact-rerank the bounded shortlist. Combines both scale levers —
   * IVF cuts the scanned fraction to nprobe/C, PQ cuts the per-row bytes
   * 16× — so a query touches (nprobe/C × corpus) 16-byte rows plus
   * `shortlist` real vectors. The cell join is an equi-join on
   * `centroid_id` (probed cells broadcast), never a cross join against the
   * full code table.
   *
   * `assigned` = (idCol, centroid_id) from `Similarity.ivfIndex`;
   * `encoded` = (idCol, pq_codes) from [[pqEncode]].
   */
  def ivfPqSearch(assigned: DataFrame, encoded: DataFrame,
                  centroids: DataFrame, corpus: DataFrame,
                  queries: DataFrame, codebook: DataFrame,
                  idCol: String, vecCol: String, dim: Int, m: Int,
                  k: Int, nprobe: Int, shortlist: Int = 64): DataFrame = {
    val luts = pqLut(queries, idCol, vecCol, codebook, dim, m)
    val byCell = Window.partitionBy("q_id")
      .orderBy(col("_cd").asc, col("centroid_id").asc)
    val probed = luts.crossJoin(broadcast(centroids))
      .withColumn("_cd", Distances.l2sq(col("q_vec"), col("c_vec")))
      .withColumn("_crn", row_number().over(byCell))
      .filter(col("_crn") <= nprobe)
      .select("q_id", "q_vec", "lut", "centroid_id")
    val cellCodes = encoded.join(
      assigned.select(col(idCol), col("centroid_id")), Seq(idCol))
    val byAdc = Window.partitionBy("q_id")
      .orderBy(col("_adc").asc, col("n_id").asc)
    val cand = cellCodes.join(broadcast(probed), Seq("centroid_id"))
      .withColumnRenamed(idCol, "n_id")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("_adc", PqAdc.pqAdc(col("pq_codes"), col("lut")))
      .withColumn("_arn", row_number().over(byAdc))
      .filter(col("_arn") <= shortlist)
      .select(col("q_id"), col("q_vec"), col("n_id"))
    val byD = Window.partitionBy("q_id").orderBy(col("_d").asc, col("n_id").asc)
    broadcast(cand)
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")),
        Seq("n_id"))
      .withColumn("_d", Distances.l2sq(col("q_vec"), col("n_vec")))
      .withColumn("knn_rank", row_number().over(byD))
      .filter(col("knn_rank") <= k)
      .select(col("q_id"), col("knn_rank"), col("n_id"))
  }

  /**
   * PQ search: ADC shortlist over the codes, exact rerank of the shortlist.
   * Returns (q_id, knn_rank, n_id), rank 1..k nearest-first.
   *
   * An identical planted vector always survives: its codes are the
   * per-subspace argmins of the query's own LUT rows, so its ADC distance
   * is the global minimum — it cannot be cut by the shortlist, and the
   * exact rerank puts it at distance 0.
   */
  def pqSearch(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
               codebook: DataFrame, idCol: String, vecCol: String,
               dim: Int, m: Int, k: Int, shortlist: Int = 50): DataFrame = {
    val luts = pqLut(queries, idCol, vecCol, codebook, dim, m)
    val byAdc = Window.partitionBy("q_id")
      .orderBy(col("_adc").asc, col("n_id").asc)
    val cand = encoded.select(col(idCol).as("n_id"), col("pq_codes"))
      .crossJoin(broadcast(luts))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("_adc", PqAdc.pqAdc(col("pq_codes"), col("lut")))
      .withColumn("_arn", row_number().over(byAdc))
      .filter(col("_arn") <= shortlist)
      .select("q_id", "q_vec", "n_id")
    // rerank: only queries×shortlist exact distances — broadcast the
    // bounded candidate set against the (large) corpus vector table
    val byD = Window.partitionBy("q_id").orderBy(col("_d").asc, col("n_id").asc)
    broadcast(cand)
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")),
        Seq("n_id"))
      .withColumn("_d", Distances.l2sq(col("q_vec"), col("n_vec")))
      .withColumn("knn_rank", row_number().over(byD))
      .filter(col("knn_rank") <= k)
      .select(col("q_id"), col("knn_rank"), col("n_id"))
  }
}
