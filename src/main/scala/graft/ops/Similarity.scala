package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths:
  *  - [[knnExactQuantized]] — brute-force cosine top-k in an exact integer
  *    space (scale 1e4 fixed-point): dot products and norms are BIGINTs, so
  *    results are bit-identical across engines (oracle-able) and the kernel
  *    is a codegen'd `aggregate(zip_with(...))` — no UDFs.
  *  - [[annHyperplane]] — random-hyperplane LSH bucketing: queries only meet
  *    candidates sharing a signature bucket. At 100 TB this is the scale
  *    path: bucket join replaces the full cross product; plane count tunes
  *    recall/cost.
  */
object Similarity {

  /** Quantize float embedding → exact fixed-point BIGINT vector (native
    * kernel; semantics identical to `round(x*scale)::long` per element).
    */
  def quantize(emb: Column, scale: Int = 10000): Column =
    graft.functions.VectorFunctions.quantize_vec(emb, scale)

  /** Exact integer dot product — native codegen'd kernel (tight long loop,
    * no per-element lambda frames; see [[graft.functions.DotProductQ]]).
    */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_q(a, b)

  /** Exact cosine from quantized vectors — every FP op is on exact ints. */
  def cosineQ(dot: Column, n1: Column, n2: Column): Column =
    dot.cast("double") / (sqrt(n1.cast("double")) * sqrt(n2.cast("double")))

  /** Brute-force top-k cosine neighbors for each query row.
    * `queryPred` selects the query subset (broadcast to every partition).
    */
  def knnExactQuantized(emb: DataFrame, idCol: String, embCol: String,
      queryPred: Column, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.select(col(idCol), quantize(col(embCol)).as("qv"))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
    val queries = q.filter(queryPred)
      .select(col(idCol).as("qid"), col("qv").as("qq"), col("nrm").as("qn"))
    val pairs = q.join(broadcast(queries), col(idCol) =!= col("qid"))
      .withColumn("dot", dotQ(col("qq"), col("qv")))
      .withColumn("cos_r", cosineQ(col("dot"), col("qn"), col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col(idCol))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col(idCol).as("nbr"), col("rnk"), col("cos_r"))
  }

  /** Deterministic ±1 hyperplane weights, precomputed driver-side (they are
    * pure constants — deriving them with per-row hash expressions would
    * re-hash (plane, dim) for every row) and shipped as array literals.
    */
  private def planeWeights(plane: Int, dims: Int): Column =
    typedlit((0 until dims).map { d =>
      if ((graft.functions.VectorKernels.mix64(d.toLong, plane.toLong * 0x9e37L) & 1L) == 0L)
        1.0 else -1.0
    })

  /** Sign-bit signature for `planes` hyperplanes → integer bucket id. */
  def hyperplaneBucket(emb: Column, planes: Int, offset: Int = 0, dims: Int = 64): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, planeWeights(p + offset, dims), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via two independent 8-plane LSH tables (union of candidates —
    * two tables double recall at ~2× bucket cost). Output: top-k per query
    * among candidates, exact cosine re-ranking.
    */
  def annHyperplane(emb: DataFrame, idCol: String, embCol: String,
      queryPred: Column, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col(idCol), col(embCol).as("e"),
      hyperplaneBucket(col(embCol), 8, 0).as("b0"),
      hyperplaneBucket(col(embCol), 8, 8).as("b1"))
      .withColumn("qv", quantize(col("e")))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
      .drop("e")
    val queries = base.filter(queryPred)
      .select(col(idCol).as("qid"), col("b0").as("qb0"), col("b1").as("qb1"),
        col("qv").as("qq"), col("nrm").as("qn"))
    val c0 = base.join(broadcast(queries),
      col("b0") === col("qb0") && col(idCol) =!= col("qid"))
    val c1 = base.join(broadcast(queries),
      col("b1") === col("qb1") && col(idCol) =!= col("qid"))
    val cands = c0.select(col("qid"), col(idCol).as("nbr"), col("qq"), col("qn"),
        col("qv"), col("nrm"))
      .unionByName(c1.select(col("qid"), col(idCol).as("nbr"), col("qq"), col("qn"),
        col("qv"), col("nrm")))
      .distinct()
    val scored = cands
      .withColumn("dot", dotQ(col("qq"), col("qv")))
      .withColumn("cos_r", cosineQ(col("dot"), col("qn"), col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("nbr"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "nbr", "rnk", "cos_r")
  }

  /** IVF (inverted-file) ANN: deterministic coarse centroids (every
    * `n/nlist`-th vector by id — a hash-free, reproducible sampling), each
    * vector assigned to its nearest centroid, queries probe the `nprobe`
    * nearest centroid lists and re-rank exactly.
    *
    * Scale shape: the assignment pass is a broadcast join against `nlist`
    * centroids (map-side only); search touches ~`nprobe/nlist` of the data —
    * the standard IVF cost model, expressed as two broadcast joins + a
    * window instead of a handwritten index.
    */
  def annIvf(emb: DataFrame, idCol: String, embCol: String,
      queryPred: Column, nlist: Int = 16, nprobe: Int = 2, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col(idCol), quantize(col(embCol)).as("qv"))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
      .cache() // consumed by centroids, assignment and queries
    val n = emb.count() // plain scan — quantization not needed for a count
    val stride = math.max(1L, n / nlist)
    // deterministic centroid sample: fixed id positions, no unordered limit
    val centroids = base
      .filter(col(idCol) % stride === 0 && col(idCol) < stride * nlist)
      .select(col(idCol).as("cid"), col("qv").as("cv"), col("nrm").as("cn"))
    // assign every vector to its nearest centroid — argmax as a partial
    // aggregate (map-side combined: shuffle carries ~n rows, not n×nlist;
    // ties break toward the higher cid via struct ordering)
    val assigned = base.join(broadcast(centroids), lit(true))
      .withColumn("ccos", cosineQ(dotQ(col("qv"), col("cv")), col("nrm"), col("cn")))
      .groupBy(col(idCol))
      .agg(max(struct(col("ccos"), col("cid"))).as("best"),
        first(col("qv")).as("qv"), first(col("nrm")).as("nrm"))
      .select(col(idCol), col("qv"), col("nrm"), col("best.cid").as("cid"))
    // queries probe their nprobe nearest centroid lists (query set is tiny)
    val queries = base.filter(queryPred)
      .select(col(idCol).as("qid"), col("qv").as("qq"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("cid"))
    val probes = queries.join(broadcast(centroids), lit(true))
      .withColumn("qcos", cosineQ(dotQ(col("qq"), col("cv")), col("qn"), col("cn")))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nprobe)
      .select(col("qid"), col("qq"), col("qn"), col("cid"))
    // each vector lives in exactly one list, so (qid, nbr) pairs are unique
    val wRank = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("nbr"))
    probes.join(assigned, Seq("cid"))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cos_r", cosineQ(dotQ(col("qq"), col("qv")),
        col("qn"), col("nrm")))
      .select(col("qid"), col(idCol).as("nbr"), col("cos_r"))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= k)
      .select("qid", "nbr", "rnk", "cos_r")
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold —
    * dedup by semantic similarity, exact integer space, all-pairs.
    *
    * Scale note: all-pairs is O(n²) on purpose here — it is the *oracle*
    * formulation (bit-exact, verifiable). The corpus's planted duplicates
    * sit at cosine ≥ 0.9 where the [[annHyperplane]] LSH path has real
    * recall; at 100 TB you run that first and this kernel only on candidate
    * buckets. Broadcast of the smaller side keeps this shuffle-free.
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    val base = emb.select(col(idCol), quantize(col(embCol)).as("qv"))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
    val x = base.select(col(idCol).as("d1"), col("qv").as("v1"), col("nrm").as("n1"))
    val y = base.select(col(idCol).as("d2"), col("qv").as("v2"), col("nrm").as("n2"))
    x.join(broadcast(y), col("d1") < col("d2"))
      .withColumn("cos_r",
        cosineQ(dotQ(col("v1"), col("v2")), col("n1"), col("n2")))
      .filter(col("cos_r") >= threshold)
      .select("d1", "d2", "cos_r")
  }
}
