package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns (builder
  * brief): brute-force cosine top-k as the exactness baseline, and an
  * LSH-bucketed variant as the scale path (candidates restricted to the
  * query's hyperplane-sign bucket — the 100 TB posture: the bucket key is
  * a shuffle/partition key, turning all-pairs into per-bucket pairs).
  *
  * Ranking determinism: cosines come from [[VectorOps]]' fixed-point dot
  * products (bit-identical across engines), ties break on vec_id.
  */
object Similarity {

  /** Brute-force top-k: queries × corpus, rank by cosine desc. The query
    * set is broadcast — the corpus is never shuffled.
    */
  def bruteTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val t = emb.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val q = queries.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val scored = t.as("t").join(broadcast(q.as("q")),
        col("q.vec_id") =!= col("t.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("t.vec_id").as("vec_id"),
        (VectorOps.dot(col("q.embedding"), col("t.embedding")) /
          (col("q.nrm") * col("t.nrm"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  def bruteTopKSql(dim: Int, k: Int, querySel: String): String =
    s"""WITH q AS ($querySel),
       |scored AS (
       |  SELECT q.vec_id AS query_id, t.vec_id AS vec_id,
       |         ${VectorOps.cosineSql("q.embedding", "t.embedding", dim)} AS cos
       |  FROM embeddings t JOIN q ON q.vec_id <> t.vec_id),
       |ranked AS (SELECT *, ROW_NUMBER() OVER
       |             (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |           FROM scored)
       |SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed top-k: score only candidates in the query's bucket. */
  def lshTopK(emb: DataFrame, queries: DataFrame, bits: Int, dim: Int,
              k: Int): DataFrame = {
    def prep(df: DataFrame) = df.select(col("vec_id"), col("embedding"),
      VectorOps.lshBucket(col("embedding"), bits, dim).as("bkt"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val bucketed = prep(emb)
    val qb = prep(queries)
    val scored = bucketed.as("t").join(broadcast(qb.as("q")),
        col("q.bkt") === col("t.bkt") && col("q.vec_id") =!= col("t.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("t.vec_id").as("vec_id"),
        (VectorOps.dot(col("q.embedding"), col("t.embedding")) /
          (col("q.nrm") * col("t.nrm"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF-flavored top-k: a coarse quantizer of `nCells` centroids (here
    * the first nCells vectors by id — a deterministic stand-in for trained
    * k-means centroids), every vector assigned to its nearest centroid
    * cell, search restricted to the query's cell. The cell id is a
    * partition key at scale — the inverted-file layout. Ties in the
    * nearest-centroid argmin break on centroid id, so the index is
    * deterministic and engine-comparable.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, nCells: Int, dim: Int,
              k: Int): DataFrame = {
    val cents = emb.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
        VectorOps.norm(col("embedding")).as("cnrm"))
    def assign(df: DataFrame): DataFrame = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("ccos",
          VectorOps.dot(col("embedding"), col("cvec")) /
            (col("nrm") * col("cnrm")))
      val w = Window.partitionBy("vec_id")
        .orderBy(col("ccos").desc, col("cid").asc)
      scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(df.columns.map(col) :+ col("cid").as("cell"): _*)
    }
    val prepped = emb.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val cells = assign(prepped)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qcells = cells.join(
      broadcast(queries.select(col("vec_id").as("qid"))),
      col("vec_id") === col("qid"))
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"),
        col("nrm").as("qnrm"), col("cell").as("qcell"))
    val scored = cells.as("t").join(broadcast(qcells),
        col("qcell") === col("t.cell") && col("q_id") =!= col("t.vec_id"))
      .select(col("q_id").as("query_id"), col("t.vec_id").as("vec_id"),
        (VectorOps.dot(col("qvec"), col("t.embedding")) /
          (col("qnrm") * col("t.nrm"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  def ivfTopKSql(nCells: Int, dim: Int, k: Int, queryIds: String): String = {
    val cos = VectorOps.cosineSql("e.embedding", "c.embedding", dim)
    s"""WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings
       |               WHERE vec_id < $nCells),
       |assigned AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY $cos DESC, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cents c)
       |  WHERE rn = 1),
       |q AS (SELECT * FROM assigned WHERE vec_id IN ($queryIds)),
       |scored AS (
       |  SELECT q.vec_id AS query_id, t.vec_id AS vec_id,
       |         ${VectorOps.cosineSql("q.embedding", "t.embedding", dim)} AS cos
       |  FROM assigned t JOIN q ON q.cell = t.cell AND q.vec_id <> t.vec_id),
       |ranked AS (SELECT *, ROW_NUMBER() OVER
       |             (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |           FROM scored)
       |SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  def lshTopKSql(bits: Int, dim: Int, k: Int, querySel: String): String =
    s"""WITH b AS (SELECT vec_id, embedding,
       |           ${VectorOps.lshBucketSql("embedding", bits, dim)} AS bkt
       |           FROM embeddings),
       |q AS (SELECT * FROM b WHERE vec_id IN ($querySel)),
       |scored AS (
       |  SELECT q.vec_id AS query_id, t.vec_id AS vec_id,
       |         ${VectorOps.cosineSql("q.embedding", "t.embedding", dim)} AS cos
       |  FROM b t JOIN q ON q.bkt = t.bkt AND q.vec_id <> t.vec_id),
       |ranked AS (SELECT *, ROW_NUMBER() OVER
       |             (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |           FROM scored)
       |SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
}
