package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.dql.{DqlArtifacts, Parser, Resolver, SeriesStore}
import graft.dql.Resolver.RPipeline
import graft.streaming.StreamingDql.Unstreamable

/** The DQL pipeline-function registry compiled onto an arriving
  * DOCUMENT stream (r16 verdict #5: batch DQL gained 16 pipeline
  * functions over two rounds; streaming DQL compiled only the series
  * surface). The streamable subset is exactly the memoized-artifact
  * posture: FROZEN model state (held-out classifier weights, the
  * corpus band index — (session, corpus)-keyed [[DqlArtifacts]]
  * entries, refreshed on the batch cadence) probed ROW-LOCALLY per
  * arrival, plus the stateless row-local text operators. Every
  * function dispatches to the SAME Scala operator its batch gate
  * oracle-tests; everything that would need corpus-wide state on the
  * stream (pair joins, training, corpus aggregation) is a typed
  * [[StreamingDql.Unstreamable]] reject, never a silent semantics
  * change — the same contract as the series compiler's rejects.
  *
  * Mirrors the reference's one-registry posture (`src/dqe.erl:62-122`)
  * on the streaming side: a function is "registered" here when its
  * stream execution is an existing proven operator, so registry growth
  * never adds a second implementation.
  */
object StreamingPipelineDql {

  /** Compile a pipeline-function DQL text onto `docStream` (the
    * arriving documents frame: doc_id, text, … — the physical schema
    * the row-local operators read). `store` binds the FROZEN corpus
    * artifacts the probes read (band index, held-out weights);
    * `watermark` applies only to the stateful probe forms
    * (near-dup's stream-static join inherits it).
    */
  def compile(docStream: DataFrame, dql: String, store: SeriesStore,
              watermark: String = "1 minute"): DataFrame = {
    val spark = docStream.sparkSession
    val q = Parser.parse(dql)
    if (q.selectors.length != 1)
      throw Unstreamable("a pipeline selector must be the only selector")
    val sel = q.selectors.head
    if (sel.shift.nonEmpty || sel.name.nonEmpty || sel.metadata.nonEmpty)
      throw Unstreamable(
        "SHIFT/AS/METADATA do not apply to pipeline table functions")
    if (q.limit.nonEmpty)
      throw Unstreamable(
        "TOP/BOTTOM scores series — not pipeline table functions")
    val plan = Resolver.resolve(sel.expr, q.aliases, _ => 1000L)
    val (name, args) = plan match {
      case RPipeline(n, as) => (n, as)
      case other => throw Unstreamable(
        s"not a pipeline table function: $other — series selectors " +
          "compile through StreamingDql.compile")
    }
    name match {
      // stateless row-local text operators — the batch operator
      // unchanged on the stream (the stream_quality/stream_gopher
      // precedent)
      case "quality" => graft.pipeline.TextOps.quality(docStream)
      case "langid" => graft.pipeline.TextOps.langid(docStream)
      case "tokens" => graft.pipeline.TextOps.tokens(docStream)
      case "fingerprint" => graft.pipeline.TextOps.fingerprint(docStream)
      case "gopher" => graft.pipeline.TextOps.gopherRules(docStream,
        stops = graft.pipeline.TextOps.Stopwords)
      // FROZEN-weights scoring: the deployed-filter posture — weights
      // memoized per (session, corpus, hyperparams) on the refresh
      // cadence, each arrival scored row-locally (stateless append;
      // the stream_classifier precedent)
      case "quality_trained" =>
        val w = DqlArtifacts.heldOutWeights(spark, store, args(0).toInt,
          args(1).toInt, args(2), args(3).toInt, args(4))
        graft.pipeline.Classifier.scoreWith(
          graft.pipeline.Curation.onSplit(docStream, args(4), "val"),
          args(0).toInt, args(3).toInt, w)
      // near-dup PROBE: arrivals against the frozen corpus band index
      // — one stream-static equi-join + row-local exact-Jaccard verify
      // (the stream_neardup precedent)
      case "dedup_minhash" =>
        DocStream.nearDupAgainstIndex(docStream,
          DqlArtifacts.bandIndex(spark, store), args.head, watermark)
          .select("doc_id", "match_id", "jaccard")
      // span SCRUB against the frozen duplicated-gram artifact: window
      // hashes derive row-locally, one stream-static left join marks
      // hits, one doc-keyed re-group + row-local island fold rewrites
      // the text (the stream_scrub / stream_scrub_keepfirst precedent;
      // sinks run update mode — a doc's windows ride one input row)
      case "scrub" =>
        val n = args.head.toInt
        DocStream.scrubAgainstGrams(docStream,
          DqlArtifacts.dupGrams(spark, store, n), n)
      case "scrub_keepfirst" =>
        val n = args.head.toInt
        DocStream.scrubKeepFirstAgainstGrams(docStream,
          DqlArtifacts.dupGramsCanon(spark, store, n), n)
      case other if Resolver.pipelineFns.contains(other) =>
        throw Unstreamable(
          s"pipeline function '$other' needs corpus-wide state " +
            "(pair joins / training / corpus aggregation) — run it on " +
            "the batch registry; the stream registry covers row-local " +
            "operators and frozen-artifact probes")
      case other =>
        throw Unstreamable(s"unregistered pipeline function '$other'")
    }
  }
}
