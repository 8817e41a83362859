package graft.dql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.Similarity

/** IVF artifact refresh policy (r16 verdict #6): a delta of NEW ids
  * appends against the frozen quantizer and equals the full rebuild
  * (same centroid regime); a delta overlapping the index forces the
  * rebuild path (update-in-place is not algebraically mergeable); the
  * refresh is memoized per deltaId. The gate
  * `dql_pipeline_simtopk_refresh` pins the append path against the
  * full-corpus brute oracle at the fixture.
  */
class DqlIvfRefreshSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val NC = 4

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def vecs(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private final class EmbStore(key: String, df: DataFrame)
      extends SeriesStore {
    override def corpusKey: String = key
    def resolutionMs(bucket: String): Long = 1000L
    def series(s: SparkSession, bucket: String): DataFrame =
      throw new UnsupportedOperationException
    def tagCol(ns: String, k: String): Option[String] = None
    val tagCols: Seq[String] = Seq.empty
    def events(s: SparkSession, bucket: String): DataFrame =
      throw new UnsupportedOperationException
    override def table(s: SparkSession, name: String): DataFrame = {
      require(name == "embeddings", name); df
    }
  }

  private def cellsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val rnd = new scala.util.Random(5)
  private def v(): Seq[Float] = Seq.fill(4)(rnd.nextFloat() - 0.5f)

  test("new-id delta takes the append path and equals the full rebuild") {
    val base = (0L until 15L).map(id => id -> v())
    val delta = (15L until 20L).map(id => id -> v())
    val store = new EmbStore("ivf-refresh-append", vecs(base))
    val (cells, cents) = DqlArtifacts.ivfRefresh(
      spark, store, "d1", vecs(delta), nCellsOverride = NC)
    val rebuilt = Similarity.ivfCells(vecs(base ++ delta), NC)
    assert(cellsOf(cells) === cellsOf(rebuilt))
    // the quantizer was frozen: same centroid rows as the base build
    assert(cents.select("cid").collect().map(_.getLong(0)).sorted
      === (0L until NC.toLong).toArray)
    // memoized per deltaId: the same refresh batch returns the same
    // artifact (no second append)
    val (cells2, _) = DqlArtifacts.ivfRefresh(
      spark, store, "d1", vecs(delta), nCellsOverride = NC)
    assert(cells2 eq cells)
  }

  test("overlapping delta forces the rebuild path: updated vector " +
    "re-assigned, stale row gone") {
    val base = (0L until 15L).map(id => id -> v())
    val updated = Seq(10L -> v(), 20L -> v())
    val store = new EmbStore("ivf-refresh-overlap", vecs(base))
    val (cells, _) = DqlArtifacts.ivfRefresh(
      spark, store, "d2", vecs(updated), nCellsOverride = NC)
    val expected = Similarity.ivfCells(
      vecs(base.filterNot(_._1 == 10L) ++ updated), NC)
    assert(cellsOf(cells) === cellsOf(expected))
    // exactly one row for the updated id
    assert(cells.where(org.apache.spark.sql.functions
      .col("vec_id") === 10L).count() === 1L)
  }
}
