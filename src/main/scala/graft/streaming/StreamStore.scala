package graft.streaming

/** Stream-side storage seam, mirroring the batch [[graft.dql.SeriesStore]]
  * (the reference's `ddb_connection` + `dqe_idx` seams, SURVEY §1.5): binds
  * the streaming DQL compiler to an event stream's physical schema instead
  * of hardcoding the driver-testdata shape. The compiler normalizes any
  * bound stream to its internal (ts, value, metric, <tag cols>) frame, so
  * every operator — tag WHERE, GROUP BY $tag USING, dvar naming, the slot
  * collapse — works unchanged against an alternate event schema.
  */
trait StreamStore {
  /** event-time column (timestamp type) — watermark + window source */
  def tsCol: String

  /** numeric value column (cast to double on normalization) */
  def valueCol: String

  /** Ordered physical columns whose string renderings, dot-joined, form
    * the series key (`metric`) — segment i+1 of the metric path is
    * `keyCols(i)`, the stream analog of the batch series-key layout
    * (reference `src/dqe_idx.erl` glob paths address these segments).
    */
  def keyCols: Seq[String]

  /** DQL `ns:key` tag → physical stream column. Tags ARE event columns on
    * the stream (no index needed); an unmapped tag reproduces the batch
    * missing-tag semantics (`=` never matches, `!=` always, dvar names
    * empty). Every returned column must be functionally determined by the
    * series key — tag predicates and GROUP BY read it at slot level, where
    * it rides through the slot collapse as a group key.
    */
  def tagCol(ns: String, key: String): Option[String]

  /** Physical columns tag predicates / GROUP BY may read — carried through
    * the leaf normalization and the slot collapse. Defaults to the key
    * columns; override when [[tagCol]] maps tags to non-key columns (which
    * must still be functionally determined by the series key).
    */
  def tagColumns: Seq[String] = keyCols
}

/** The driver-testdata binding (the default): events shaped
  * (ts, event_type, user_id, value), series key `event_type.user_id`,
  * tags `type`/`user` — the same mapping as the batch TestdataStore.
  */
object TestdataStreamStore extends StreamStore {
  val tsCol = "ts"
  val valueCol = "value"
  val keyCols: Seq[String] = Seq("event_type", "user_id")
  def tagCol(ns: String, key: String): Option[String] = key match {
    case "type" => Some("event_type")
    case "user" => Some("user_id")
    case _      => None
  }
}
