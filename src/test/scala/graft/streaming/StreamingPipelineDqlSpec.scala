package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.dql.TestdataStore
import graft.streaming.StreamingDql.Unstreamable

/** Streaming pipeline registry contract: the streamable subset
  * (row-local operators + frozen-artifact probes) compiles onto a
  * document stream; everything needing corpus-wide state is a TYPED
  * reject naming the batch registry — never a silent semantics change.
  */
class StreamingPipelineDqlSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** unbounded stand-in with the documents schema: isStreaming plans
    * without running anything
    */
  private def docStream(): DataFrame = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)].toDF().toDF("doc_id", "text")
      // event-time column like the harness's replay (the near-dup
      // probe's stream-static join watermarks on it)
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_millis(org.apache.spark.sql.functions
          .col("doc_id") * 1000L))
  }

  private def compile(dql: String): DataFrame =
    StreamingPipelineDql.compile(docStream(), dql, new TestdataStore(dir))

  test("row-local spellings compile to streaming frames") {
    for (dql <- Seq("SELECT quality() LAST 30 d",
                    "SELECT langid() LAST 30 d",
                    "SELECT tokens() LAST 30 d",
                    "SELECT fingerprint() LAST 30 d",
                    "SELECT gopher() LAST 30 d"))
      assert(compile(dql).isStreaming, dql)
  }

  test("the FULL batch registry is total on the streaming mirror: every " +
    "spelling either compiles (the streamable subset) or raises the " +
    "typed batch-registry reject (r18 verdict #4 extended to streaming)") {
    import graft.dql.{DqlGen, Resolver, Unparse}
    import graft.dql.Ast._
    // fixed args for the streamable subset so memoized artifacts from the
    // neighbor tests are reused (a RANDOM quality_trained/scrub arg-set
    // would re-train/re-aggregate per sample — provisioning, not what
    // this totality check is about)
    val streamableFixed = Map(
      "quality" -> "SELECT quality() LAST 30 d",
      "langid" -> "SELECT langid() LAST 30 d",
      "tokens" -> "SELECT tokens() LAST 30 d",
      "fingerprint" -> "SELECT fingerprint() LAST 30 d",
      "gopher" -> "SELECT gopher() LAST 30 d",
      "quality_trained" -> "SELECT quality_trained(8, 2, 0.05, 10, 0.2) LAST 30 d",
      "dedup_minhash" -> "SELECT dedup_minhash(0.5) LAST 30 d",
      "scrub" -> "SELECT scrub(8) LAST 30 d",
      "scrub_keepfirst" -> "SELECT scrub_keepfirst(8) LAST 30 d")
    // standalone coverage pin (also in ParseUnparseSpec): a registry
    // spelling without a generator arm fails HERE too, so this suite's
    // totality claim can't silently narrow
    assert(DqlGen.pipelineValidArgs.keySet == Resolver.pipelineFns.keySet)
    for (n <- Resolver.pipelineFns.keys.toSeq.sorted)
      streamableFixed.get(n) match {
        case Some(dql) => assert(compile(dql).isStreaming, n)
        case None =>
          val as = DqlGen.pipelineValidArgs(n)(
            org.scalacheck.Gen.Parameters.default,
            org.scalacheck.rng.Seed(7L)).get
          val dql = Unparse(Query(Seq(Selector(FCall(n, as))), Map.empty,
            Last(TimeLit(30, "d")), None))
          val e = intercept[Unstreamable](compile(dql))
          assert(e.getMessage.contains("batch registry"),
            s"$n -> ${e.getMessage}")
      }
  }

  test("frozen-artifact probes compile (weights and band index come " +
    "from the batch corpus, arrivals score row-locally)") {
    assert(compile(
      "SELECT quality_trained(8, 2, 0.05, 10, 0.2) LAST 30 d").isStreaming)
    assert(compile("SELECT dedup_minhash(0.5) LAST 30 d").isStreaming)
    // span scrubs against the frozen (session, corpus, n) gram
    // artifacts — the stream_scrub operators from the language
    assert(compile("SELECT scrub(8) LAST 30 d").isStreaming)
    assert(compile("SELECT scrub_keepfirst(8) LAST 30 d").isStreaming)
  }

  test("scrub rewrites arrivals across micro-batches exactly like the " +
    "batch scrub of the same corpus (frozen gram artifact, doc-keyed " +
    "re-group)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    // the corpus-backed store the frozen artifact derives from: the
    // probe docs ARE corpus docs, so batch scrub(4) over the corpus is
    // the exact oracle for the replayed subset
    val boiler = "one two three four"  // a 4-gram duplicated corpus-wide
    val corpus = (0L until 12L).map(i =>
      i -> (s"$boiler unique$i tail$i words$i here$i " + boiler))
    val store = new graft.dql.SeriesStore {
      override def corpusKey: String = dir + "#spdql-scrub"
      def resolutionMs(bucket: String): Long = 1000L
      def series(ss: SparkSession, bucket: String): DataFrame =
        throw new UnsupportedOperationException
      def tagCol(ns: String, k: String): Option[String] = None
      val tagCols: Seq[String] = Seq.empty
      def events(ss: SparkSession, bucket: String): DataFrame =
        throw new UnsupportedOperationException
      override def table(ss: SparkSession, name: String): DataFrame = {
        require(name == "documents", name)
        corpus.toDF("doc_id", "text")
      }
    }
    val out = StreamingPipelineDql.compile(stream,
      "SELECT scrub(4) LAST 30 d", store)
    val q = out.writeStream.format("memory").queryName("spdql_scrub")
      .outputMode("update").start()
    try {
      in.addData(corpus.take(6): _*); q.processAllAvailable()
      in.addData(corpus.drop(6): _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tokens", "n_dropped", "clean_text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    // update mode re-emits a doc only if its group changes; each doc
    // rides one trigger here, so take the LAST emission per doc_id
    val gotAll = s.table("spdql_scrub")
    val got = rows(gotAll)
    val expected = rows(graft.pipeline.Dedup.substringScrub(
      corpus.toDF("doc_id", "text"), 4))
    assert(got === expected)
    assert(got.exists(_._3 > 0L), "nothing scrubbed — vacuous fixture")
    assert(got.exists(_._1 < 6) && got.exists(_._1 >= 6),
      "a whole micro-batch is missing from the scrubbed output")
  }

  test("corpus-wide functions are typed rejects naming the batch path") {
    for (dql <- Seq("SELECT dedup_exact() LAST 30 d",
                    "SELECT dedup_ngram(0.3) LAST 30 d",
                    "SELECT sim_topk(5, 10) LAST 30 d",
                    "SELECT sim_topk_sq8(5, 10, 3) LAST 30 d",
                    "SELECT sim_topk_pq(5, 10, 3) LAST 30 d",
                    "SELECT dedup_hot_bands(100) LAST 30 d",
                    "SELECT threshold_scan(8, 2, 0.05, 10, 0.2, 10) LAST 30 d")) {
      val e = intercept[Unstreamable](compile(dql))
      assert(e.getMessage.contains("batch"), s"$dql → ${e.getMessage}")
    }
  }

  test("quality_trained scores arrivals across micro-batches exactly " +
    "like the batch frozen-weights scan (stateless append)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val out = StreamingPipelineDql.compile(stream,
      "SELECT quality_trained(8, 2, 0.05, 10, 0.2) LAST 30 d",
      new TestdataStore(dir))
    val q = out.writeStream.format("memory").queryName("spdql_qt")
      .outputMode("append").start()
    // synthetic arrivals split across two triggers: the scoring is
    // row-local against frozen weights, so batch boundaries must not
    // matter and no arrival may drop
    val docs = (0L until 40L).map(i =>
      i -> (s"doc $i " + Seq.fill(12)("alpha beta gamma").mkString(" ")))
    try {
      in.addData(docs.take(20): _*); q.processAllAvailable()
      in.addData(docs.drop(20): _*); q.processAllAvailable()
    } finally q.stop()
    val got = s.table("spdql_qt")
      .select("doc_id", "label", "score", "keep").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    val w = graft.dql.DqlArtifacts.heldOutWeights(s,
      new TestdataStore(dir), 8, 2, 0.05, 10, 0.2)
    val expected = graft.pipeline.Classifier.scoreWith(
      graft.pipeline.Curation.onSplit(docs.toDF("doc_id", "text"), 0.2,
        "val"), 8, 10, w)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "val split empty — vacuous replay")
    // arrivals from BOTH micro-batches made it through
    assert(got.exists(_._1 < 20) && got.exists(_._1 >= 20),
      "a whole micro-batch is missing from the scored output")
  }

  test("replay ≡ batch for every stateless row-local spelling over " +
    "RANDOM corpora and random micro-batch splits (r19 verdict #7: the " +
    "batch/stream spelling parity is property-checked, not just " +
    "example-gated — same DQL text through Compiler.run vs the stream " +
    "registry, same synthetic corpus)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.scalacheck.{Gen => G}
    // corpus generator: unicode, punctuation, empties, stopwords, digit
    // runs — the shapes the text operators branch on
    val word: G[String] = G.frequency(
      5 -> G.oneOf("alpha", "beta", "the", "and", "of", "données",
        "числа", "west", "quality"),
      3 -> G.choose(1, 6).flatMap(n =>
        G.listOfN(n, G.alphaNumChar).map(_.mkString)),
      1 -> G.oneOf("...", "!!", "a.b", "42", "§", "--"),
      1 -> G.const(""))
    val doc: G[String] = G.choose(0, 30).flatMap(n =>
      G.listOfN(n, word).map(_.mkString(" ")))
    val corpusGen: G[List[String]] = G.choose(4, 14).flatMap(n =>
      G.listOfN(n, doc))
    val spellings =
      Seq("quality()", "langid()", "tokens()", "fingerprint()", "gopher()")
    var qi = 0
    for (sample <- 0 until 3) {
      val params = G.Parameters.default.withSize(10 + sample * 10)
      val corpus = corpusGen(params,
        org.scalacheck.rng.Seed(4242L + sample)).get
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val store = new graft.dql.SeriesStore {
        override def corpusKey: String = dir + s"#spdql-prop-$sample"
        def resolutionMs(bucket: String): Long = 1000L
        def series(ss: SparkSession, bucket: String): DataFrame =
          throw new UnsupportedOperationException
        def tagCol(ns: String, k: String): Option[String] = None
        val tagCols: Seq[String] = Seq.empty
        def events(ss: SparkSession, bucket: String): DataFrame =
          throw new UnsupportedOperationException
        override def table(ss: SparkSession, name: String): DataFrame = {
          require(name == "documents", name)
          docs.toDF("doc_id", "text")
        }
      }
      // split point varies with the sample so batch boundaries move
      val split = 1 + (sample * 5 + 3) % (docs.length - 1)
      for (call <- spellings) {
        val dql = s"SELECT $call LAST 30 d"
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val out = StreamingPipelineDql.compile(
          in.toDF().toDF("doc_id", "text"), dql, store)
        qi += 1
        val qn = s"spdql_prop_$qi"
        val q = out.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try {
          in.addData(docs.take(split): _*); q.processAllAvailable()
          in.addData(docs.drop(split): _*); q.processAllAvailable()
        } finally q.stop()
        val got = s.table(qn).toJSON.collect().toSet
        val expected = graft.dql.Compiler.run(s, store,
          System.currentTimeMillis(), dql).toJSON.collect().toSet
        assert(got === expected, s"$dql sample=$sample split=$split")
        assert(expected.size == docs.length,
          s"$dql oracle is not one row per doc — vacuous fixture")
      }
    }
  }

  test("selector decorations and series selectors are typed rejects") {
    intercept[Unstreamable](compile(
      "SELECT quality() AS 'q' LAST 30 d"))
    intercept[Unstreamable](compile(
      "SELECT quality(), langid() LAST 30 d"))
    intercept[Unstreamable](compile(
      "SELECT avg('a'.'b' BUCKET 'testdata', 1 h) LAST 30 d"))
  }
}
