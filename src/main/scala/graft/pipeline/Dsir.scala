package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): pick
  * raw-corpus documents that LOOK LIKE a target corpus by importance
  * weighting in a hashed n-gram feature space, then resampling without
  * replacement via Gumbel-top-k.
  *
  *   1. hash every token into `dim` buckets (the [[TextOps.hashFeatures]]
  *      md5 convention, so the oracle reproduces the features exactly);
  *   2. estimate add-one-smoothed bucket distributions p̂ (target docs)
  *      and q̂ (whole corpus) — ONE token pass, partial-aggregated to
  *      `dim` rows;
  *   3. per-doc log importance weight `logw = Σ_b n_b·(ln p̂_b − ln q̂_b)`
  *      — ROW-LOCAL: the doc's bucket counts are in-row sorted runs and
  *      the dim-length log-ratio table rides a one-row broadcast, so the
  *      corpus scan shuffles nothing (the [[TextOps.entropy]] shape, with
  *      the same 9dp-round-then-exact-decimal-fold convention making the
  *      transcendental terms engine-identical);
  *   4. Gumbel-top-k: key = logw + g where `g = −ln(−ln(u))` and `u` is
  *      the deterministic md5(doc_id) uniform (the engine's shared
  *      sampling hash) — sampling ∝ softmax(logw) without replacement,
  *      reproducible in both engines.
  *
  * Scale shape: the ratio table is `dim` rows regardless of corpus size;
  * scoring is a zero-shuffle scan; selection caps through
  * TakeOrderedAndProject. Nothing grows with the corpus except the scan.
  */
object Dsir {
  private val Dec = DecimalType(28, 10)

  /** md5-uniform in (0,1): (first 32 md5 bits + 0.5) / 2^32 — the +0.5
    * keeps u strictly inside (0,1) so the double Gumbel log never sees 0.
    */
  private def uniform01(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
      .cast("double") + 0.5) / 4294967296.0

  /** One row per bucket 0..dim−1: smoothed log-ratio
    * `r = round(ln((ct+1)/(Tt+dim)) − ln((cs+1)/(Ts+dim)), 9)` where
    * ct/cs are target/corpus token counts in the bucket. Buckets no
    * token hashed into still get rows (the smoothing floor) via the
    * sequence spine. The global totals ride a window over the dim-row
    * frame — a single-partition window over `dim` rows, not data.
    */
  def logRatios(docs: DataFrame, dim: Int, targetPred: Column): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val spark = docs.sparkSession
    val counts = Dedup.withWords(docs)
      .withColumn("w", filter(col("w"), x => x =!= ""))
      .where(size(col("w")) > 0)
      .withColumn("isT", targetPred)
      .select(col("isT"), explode(col("w")).as("word"))
      .select(col("isT"),
        (conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long")
          % dim).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("isT"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cs"))
    val spine = spark.range(1).select(
      explode(sequence(lit(0L), lit(dim - 1L))).as("bucket"))
    def lnp(c: Column, t: Column): Column =
      log((c.cast("double") + 1.0) / (t.cast("double") + dim))
    val filled = spine.join(counts, Seq("bucket"), "left_outer")
      .select(col("bucket"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cs"), lit(0L)).as("cs"))
    // global token totals: a one-row aggregate broadcast back over the
    // dim-row frame (never a single-partition window over data)
    val tot = filled.agg(sum(col("ct")).as("tt"), sum(col("cs")).as("ts"))
    filled.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(lnp(col("ct"), col("tt")) - lnp(col("cs"), col("ts")), 9)
          .as("r"))
  }

  /** The dim-length ratio array as ONE broadcastable row (`rs`), ordered
    * by bucket.
    */
  def ratioRow(ratios: DataFrame): DataFrame =
    ratios.agg(transform(sort_array(collect_list(
      struct(col("bucket"), col("r")))), x => x.getField("r")).as("rs"))

  /** Per-doc log importance weight + Gumbel key against a (broadcast)
    * one-row ratio frame — row-local, stateless, stream-safe. Docs with
    * no tokens are excluded (they have no features to weigh).
    *
    * Output: (doc_id, logw, key) with
    * `key = round(logw + round(−ln(−ln(u)), 9), 9)`.
    */
  def score(docs: DataFrame, rsRow: DataFrame): DataFrame = {
    val bs = array_sort(transform(col("w"), word =>
      conv(substring(md5(word), 1, 8), 16, 10).cast("long")
        % size(col("rs"))))
    val ends = filter(sequence(lit(1), size(col("bs"))), p =>
      coalesce(get(col("bs"), p) =!= element_at(col("bs"), p), lit(true)))
    val starts = concat(array(lit(0)),
      slice(col("ends"), lit(1), size(col("ends")) - 1))
    val pairs = zip_with(col("ends"), starts, (e, s) =>
      struct(element_at(col("bs"), e).as("bucket"),
        (e - s).cast("double").as("n")))
    val logw = aggregate(col("pairs"), lit(0).cast(Dec),
      (acc, p) => (acc + round(p.getField("n") *
        element_at(col("rs"), (p.getField("bucket") + 1).cast("int")), 9)
        .cast(Dec)).cast(Dec)).cast("double")
    val g = round(-log(-log(uniform01(col("doc_id")))), 9)
    Dedup.withWords(docs)
      .withColumn("w", filter(col("w"), x => x =!= ""))
      .where(size(col("w")) > 0)
      .crossJoin(broadcast(rsRow))
      .withColumn("bs", bs)
      .withColumn("ends", ends)
      .withColumn("pairs", pairs)
      .withColumn("logw", logw)
      // generator barrier: a downstream predicate on key/logw (the
      // admission threshold) must NOT sink into the broadcast
      // nested-loop join's condition — there it evaluates this entire
      // md5-heavy fold INTERPRETED per row, then the projection pays it
      // again (measured ~30× the scan cost at sf0.1; the ivfAssign
      // guard documents the same trap). Filters cannot push through a
      // generator's output, so the fold below evaluates exactly once.
      .select(col("doc_id"), explode(array(struct(col("logw"),
        round(col("logw") + g, 9).as("key")))).as("s"))
      .select(col("doc_id"), col("s.logw").as("logw"),
        col("s.key").as("key"))
  }

  /** Gumbel-top-k selection: the `k` docs most resembling the target
    * under importance resampling. TakeOrderedAndProject caps the result;
    * ties break on doc_id.
    *
    * Output: (doc_id, logw, key), key descending.
    */
  def select(docs: DataFrame, dim: Int, targetPred: Column,
             k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rs = ratioRow(logRatios(docs, dim, targetPred))
    score(docs, rs).orderBy(col("key").desc, col("doc_id").asc).limit(k)
  }

  /** DuckDB mirror of the whole ladder over `documents`: same md5
    * buckets, same smoothing, same 9dp-rounded ln terms folded through
    * an exact DECIMAL(28,10) sum, same Gumbel key.
    *
    * @param targetSql SQL predicate marking target docs (e.g.
    *                  `lang = 'en'`)
    */
  def selectSql(dim: Int, targetSql: String, k: Int): String =
    s"""WITH ${ladderSql(dim, targetSql)}
       |SELECT doc_id, logw, key FROM ky
       |ORDER BY key DESC, doc_id ASC LIMIT $k""".stripMargin

  /** The shared CTE ladder (through `ky`, the Gumbel-keyed weights) both
    * oracle readouts compose — never string surgery on a finished query.
    */
  private def ladderSql(dim: Int, targetSql: String): String =
    s"""ws AS (SELECT doc_id, ($targetSql) AS is_t,
       |              list_filter(string_split(trim(text), ' '),
       |                          x -> x <> '') AS w
       |            FROM documents),
       |d AS (SELECT * FROM ws WHERE len(w) > 0),
       |tok AS (SELECT doc_id, is_t, s AS word FROM d, unnest(w) AS t(s)),
       |tb AS (SELECT doc_id, is_t,
       |         CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) % $dim
       |           AS bucket
       |       FROM tok),
       |bc AS (SELECT bucket,
       |         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
       |         COUNT(*) AS cs
       |       FROM tb GROUP BY 1),
       |sp AS (SELECT r.i AS bucket FROM unnest(range(0, $dim)) AS r(i)),
       |fc AS (SELECT sp.bucket, COALESCE(ct, 0) AS ct, COALESCE(cs, 0) AS cs
       |       FROM sp LEFT JOIN bc ON sp.bucket = bc.bucket),
       |rt AS (SELECT bucket,
       |         ROUND(ln((CAST(ct AS DOUBLE) + 1.0)
       |                  / (CAST(SUM(ct) OVER () AS DOUBLE) + $dim))
       |             - ln((CAST(cs AS DOUBLE) + 1.0)
       |                  / (CAST(SUM(cs) OVER () AS DOUBLE) + $dim)), 9)
       |           AS r
       |       FROM fc),
       |db AS (SELECT doc_id,
       |         CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) % $dim
       |           AS bucket
       |       FROM tok),
       |dc AS (SELECT doc_id, bucket, COUNT(*) AS n FROM db GROUP BY 1, 2),
       |tm AS (SELECT doc_id,
       |         ROUND(CAST(n AS DOUBLE) * r, 9) AS term
       |       FROM dc JOIN rt USING (bucket)),
       |lw AS (SELECT doc_id,
       |         CAST(CAST(SUM(CAST(term AS DECIMAL(28,10))) AS VARCHAR)
       |           AS DOUBLE) AS logw
       |       FROM tm GROUP BY 1),
       |ky AS (SELECT doc_id, logw,
       |         ROUND(logw + ROUND(-ln(-ln(
       |           (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
       |                 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
       |             / 4294967296.0)), 9), 9) AS key
       |       FROM lw)""".stripMargin

  /** Threshold-admission mirror (the ONLINE posture: an arriving doc is
    * admitted when its Gumbel-perturbed importance key clears `tau` —
    * a fixed bar needing no global state, where top-k would). Same
    * [[ladderSql]] as [[selectSql]], different readout.
    */
  def admitSql(dim: Int, targetSql: String, tau: Double): String =
    s"""WITH ${ladderSql(dim, targetSql)}
       |SELECT doc_id, logw, key FROM ky
       |WHERE key > $tau ORDER BY doc_id""".stripMargin
}
