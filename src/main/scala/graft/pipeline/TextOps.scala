package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (builder brief):
  * token counting, quality scoring, n-gram-heuristic language ID, and
  * rolling-hash document fingerprinting. All pure `Column` expressions —
  * narrow, shuffle-free, codegen'd; integer counts with final double
  * divisions keep results bit-identical to the DuckDB mirrors.
  */
object TextOps {

  // ------------------------------------------------------------- tokens

  /** whitespace token count (the BPE-ish regex variant counts word pieces:
    * runs of letters, runs of digits, or single punctuation marks).
    */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(trim(col("text")), " ")).as("n_tokens"),
      size(expr("regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])', 1)"))
        .as("n_pieces"),
      length(col("text")).as("n_chars_obs"))

  val tokensSql: String =
    """SELECT doc_id,
      |       len(string_split(trim(text), ' ')) AS n_tokens,
      |       len(regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])', 1)) AS n_pieces,
      |       length(text) AS n_chars_obs
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ quality

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for")

  /** Quality signals: punctuation ratio, stopword ratio, mean word length,
    * and a composite score in [0,1]. Ratios are integer-count divisions —
    * deterministic across engines.
    */
  def quality(docs: DataFrame): DataFrame =
    withQuality(docs).select("doc_id", "punct_ratio", "stop_ratio",
      "avg_word_len", "quality")

  /** column-preserving form (streams compose with it without a join) */
  def withQuality(docs: DataFrame): DataFrame = {
    val w = split(trim(col("text")), " ")
    val nW = size(w).cast("double")
    val punct = length(regexp_replace(col("text"), "[^.,!?;:]", ""))
      .cast("double") / length(col("text"))
    val stops = Stopwords.map(s =>
      size(filter(w, x => x === s)).cast("double")).reduce(_ + _) / nW
    val wlen = (length(col("text")).cast("double") - (nW - 1)) / nW
    val score = lit(0.4) * stops + lit(0.3) * (lit(1.0) - punct) +
      lit(0.3) * least(wlen / 10.0, lit(1.0))
    docs.withColumn("punct_ratio", punct)
      .withColumn("stop_ratio", stops)
      .withColumn("avg_word_len", wlen)
      .withColumn("quality", score)
  }

  val qualitySql: String = {
    val stops = Stopwords.map(s =>
      s"CAST(len(list_filter(w, x -> x = '$s')) AS DOUBLE)").mkString(" + ")
    s"""SELECT doc_id,
       |  CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)/length(text) AS punct_ratio,
       |  ($stops)/nw AS stop_ratio,
       |  (CAST(length(text) AS DOUBLE) - (nw - 1))/nw AS avg_word_len,
       |  0.4*(($stops)/nw) +
       |  0.3*(1.0 - CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)/length(text)) +
       |  0.3*LEAST(((CAST(length(text) AS DOUBLE) - (nw - 1))/nw)/10.0, 1.0) AS quality
       |FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS w,
       |             CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS nw
       |      FROM documents) ORDER BY doc_id""".stripMargin
  }

  /** Per-source quality scoreboard — the corpus-health table a curation
    * pipeline publishes per ingest source: doc count, mean quality, and
    * how many clear the admission threshold. Quality values are rounded
    * to 9 decimals BEFORE the decimal-exact mean (the raw composite is
    * an arbitrary double; full-precision double→decimal casts round
    * shortest-decimal vs binary across engines — the `dimStats`
    * lesson), while the threshold compares the RAW score (a single
    * comparison of identical doubles needs no rounding). One partial-
    * aggregated shuffle on the source key.
    */
  def sourceQuality(docs: DataFrame, threshold: Double): DataFrame =
    withQuality(docs)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        graft.core.Exact.davg(round(col("quality"), 9)).as("avg_quality"),
        count(when(col("quality") > threshold, 1)).as("n_above"))

  /** DuckDB mirror of [[sourceQuality]]. */
  def sourceQualitySql(threshold: Double): String =
    s"""WITH q AS ($qualityScoreSubquerySql),
       |j AS (SELECT d.source, q.quality
       |      FROM documents d JOIN q ON d.doc_id = q.doc_id)
       |SELECT source, COUNT(*) AS n_docs,
       |       ${graft.core.Exact.davgSql("ROUND(quality, 9)")} AS avg_quality,
       |       COUNT(CASE WHEN quality > $threshold THEN 1 END) AS n_above
       |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** The (doc_id, quality) scoring subquery shared by every SQL oracle
    * that thresholds quality ([[graft.pipeline.Corpus]]'s batch and
    * streaming decisions) — single-sourced so the DuckDB mirror of
    * [[withQuality]]'s formula cannot drift per-consumer.
    */
  val qualityScoreSubquerySql: String = {
    val stops = Stopwords.map(s =>
      s"CAST(len(list_filter(w, x -> x = '$s')) AS DOUBLE)").mkString(" + ")
    s"""SELECT doc_id,
       |    0.4*(($stops)/nw) +
       |    0.3*(1.0 - CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)/length(text)) +
       |    0.3*LEAST(((CAST(length(text) AS DOUBLE) - (nw - 1))/nw)/10.0, 1.0) AS quality
       |  FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS w,
       |               CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS nw
       |        FROM documents)""".stripMargin
  }

  // ------------------------------------------------------------- langid

  /** stopword-profile language ID (n-gram heuristic): score each language
    * by its marker-word hits; argmax with a fixed preference order for
    * ties. (The synthetic corpus is English-jargon regardless of its lang
    * label — the gate checks determinism/parity, not linguistics.)
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "und", "die", "das"),
    "fr" -> Seq("le", "et", "les", "des"))

  def langid(docs: DataFrame): DataFrame = {
    val w = split(trim(col("text")), " ")
    val scores = LangProfiles.map { case (lang, ms) =>
      lang -> ms.map(m => size(filter(w, x => x === m))).reduce(_ + _)
    }
    val Seq(en, es, de, fr) = scores.map(_._2)
    val pred = when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
    docs.select(col("doc_id"), pred.as("pred_lang"),
      en.as("s_en"), es.as("s_es"), de.as("s_de"), fr.as("s_fr"))
  }

  val langidSql: String = {
    def score(ms: Seq[String]) = ms.map(m =>
      s"len(list_filter(w, x -> x = '$m'))").mkString(" + ")
    val Seq(en, es, de, fr) = LangProfiles.map(p => score(p._2))
    s"""SELECT doc_id,
       |  CASE WHEN ($en) >= ($es) AND ($en) >= ($de) AND ($en) >= ($fr) THEN 'en'
       |       WHEN ($es) >= ($de) AND ($es) >= ($fr) THEN 'es'
       |       WHEN ($de) >= ($fr) THEN 'de' ELSE 'fr' END AS pred_lang,
       |  ($en) AS s_en, ($es) AS s_es, ($de) AS s_de, ($fr) AS s_fr
       |FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------- fingerprint

  /** Rolling-hash document fingerprint: minimum md5 over all character
    * 8-grams (1-min-sketch of the winnowing family). Runs as the native
    * [[graft.expr.MinShingleMd5]] kernel — one tight loop per row, no
    * per-position string/array materialization (the composed
    * `array_min(transform(sequence...))` form computes the same value ~5×
    * slower). Texts shorter than 8 chars yield NULL, matching the
    * oracle's empty-range NULL.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.expr.MinShingleMd5(col("text"), 8).as("fp"))

  val fingerprintSql: String =
    """SELECT doc_id,
      |       list_min([md5(substr(text, i, 8)) for i in range(1, length(text)-6)]) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- repetition

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, re-expressed
    * over word n-grams): the fraction of 2-grams (and 3-grams) claimed by
    * the single most frequent one, the fraction of 5-grams that are
    * repeats, and a `repetitive` flag over fixed thresholds. All
    * row-local Column expressions — zero shuffle, the same narrow
    * one-pass shape as [[quality]], so the filter runs at corpus-scan
    * cost at any corpus size. Counts are exact integers on both engines
    * (the Spark side counts via a sorted-run fold, the DuckDB oracle via
    * per-distinct-gram filters — same integers either way), and the only
    * doubles are final int/int divisions, so results are bit-identical.
    */
  def repetition(docs: DataFrame): DataFrame = {
    def grams(w: Column, n: Int): Column =
      when(size(w) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(w) - n), i =>
          concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
    // longest run of equal grams in sort order == max occurrence count
    def topCount(g: Column): Column = aggregate(
      array_sort(g),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    def frac(num: Column, den: Column): Column =
      when(den === 0, lit(0.0)).otherwise(num.cast("double") / den)
    val out = docs
      .withColumn("w", filter(split(trim(col("text")), " "), x => x =!= ""))
      .withColumn("g2", grams(col("w"), 2))
      .withColumn("g3", grams(col("w"), 3))
      .withColumn("g5", grams(col("w"), 5))
      .withColumn("top2_frac", frac(topCount(col("g2")), size(col("g2"))))
      .withColumn("top3_frac", frac(topCount(col("g3")), size(col("g3"))))
      .withColumn("dup5_frac",
        frac(size(col("g5")) - size(array_distinct(col("g5"))),
          size(col("g5"))))
    out.select(col("doc_id"), col("top2_frac"), col("top3_frac"),
      col("dup5_frac"),
      (col("top2_frac") > Top2Threshold || col("top3_frac") > Top3Threshold
        || col("dup5_frac") > Dup5Threshold).as("repetitive"))
  }

  /** thresholds sit near the corpus p90s so the flag splits real data */
  val Top2Threshold = 0.06
  val Top3Threshold = 0.05
  val Dup5Threshold = 0.20

  // ------------------------------------------------------------- redact

  /** PII-redaction regexes — the intersection of Java-regex and RE2
    * syntax (no backrefs, no lookaround) so the Spark expressions and the
    * DuckDB oracle compile the SAME pattern text. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Append a deterministic synthetic contact tail (email, phone, IPv4
    * derived from doc_id) — the synthetic corpus carries no PII, so the
    * gate manufactures some identically on both engines and then proves
    * the scrubber strips it. Production pipelines run [[redactPii]]
    * directly on the raw text. */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (col("doc_id") % 256).cast("string"),
      lit(".0.7")))

  /** single-sourced SQL mirror of [[withSyntheticPii]]'s injected text */
  val syntheticPiiSql: String =
    """SELECT doc_id,
      |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |  '@mail.example.com or +1-555-' ||
      |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |  ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7' AS text
      |FROM documents""".stripMargin

  /** PII scrubbing (emails, E.164-ish phone numbers, IPv4 addresses →
    * typed placeholders) with per-category match counts — the compliance
    * pass a training corpus runs before release. Emails are replaced
    * first (their dotted hosts would otherwise feed the IP pattern),
    * then IPs, then phones; counts are taken on the RAW text so they
    * record what was found, not what survived earlier replacements.
    *
    * Pure per-row regex `Column`s — narrow, shuffle-free, codegen'd; at
    * 100 TB this runs at corpus-scan cost like [[quality]].
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(col("doc_id"),
      regexp_count(t, lit(EmailRe)).as("n_email"),
      regexp_count(t, lit(PhoneRe)).as("n_phone"),
      regexp_count(t, lit(Ipv4Re)).as("n_ip"),
      regexp_replace(regexp_replace(regexp_replace(t,
        EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")
        .as("redacted"))
  }

  /** oracle over the synthetic-PII injected text (the gate's input) */
  val redactPiiSql: String =
    s"""WITH raw AS ($syntheticPiiSql)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailRe')) AS n_email,
       |  len(regexp_extract_all(text, '$PhoneRe')) AS n_phone,
       |  len(regexp_extract_all(text, '$Ipv4Re')) AS n_ip,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g') AS redacted
       |FROM raw ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- vocab

  /** Corpus vocabulary statistics: the `k` most frequent words with
    * occurrence and document frequencies — the first pass of BPE/vocab
    * training and of stopword discovery. Deterministic cutoff: ties at
    * the boundary break on the word itself.
    *
    * Scale shape: explode → ONE shuffle with map-side partial aggregation
    * (the word-count combine is the canonical Spark partial-agg) → a
    * TakeOrderedAndProject top-k (per-partition heads, k rows to the
    * driver-side merge — never a global sort materialization).
    */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    Dedup.withWords(docs)
      .select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n_occ"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("word").asc)
      .limit(k)

  def vocabTopKSql(k: Int): String =
    s"""WITH ws AS (SELECT doc_id, string_split(trim(text), ' ') AS w
       |            FROM documents),
       |tok AS (SELECT doc_id, s AS word FROM ws, unnest(w) AS t(s))
       |SELECT word, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
       |FROM tok GROUP BY 1
       |ORDER BY n_occ DESC, word ASC LIMIT $k""".stripMargin

  /** Word-bigram frequency top-k — same plan shape as [[vocabTopK]] over
    * [[Dedup.shingles2]]'s raw (not per-doc-distinct) occurrences; the
    * n-gram LM / collocation statistic beside the unigram vocabulary. */
  def bigramTopK(docs: DataFrame, k: Int): DataFrame =
    Dedup.shingles2(docs)
      .select(col("doc_id"), col("shingle").as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n_occ"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("bigram").asc)
      .limit(k)

  def bigramTopKSql(k: Int): String =
    s"""WITH ws AS (SELECT doc_id, string_split(trim(text), ' ') AS w
       |            FROM documents),
       |bg AS (SELECT doc_id, s AS bigram
       |       FROM ws, unnest([w[i] || ' ' || w[i+1]
       |                        for i in range(1, len(w))]) AS t(s)
       |       WHERE len(w) >= 2)
       |SELECT bigram, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
       |FROM bg GROUP BY 1
       |ORDER BY n_occ DESC, bigram ASC LIMIT $k""".stripMargin

  // ------------------------------------------------------------- TF-IDF

  /** Per-document top-`k` terms by TF-IDF — the distinctive-term view
    * (keyword extraction, topic drift monitoring) over the same
    * whitespace tokenizer as [[vocabTopK]]. `tf` is the raw in-doc count,
    * `idf = log10(N / df)` with `df` the term's document frequency;
    * the score is rounded to 9 decimals (log10 is not correctly rounded
    * in either engine — same convention as the `log10_scale` transform),
    * ties broken on the term.
    *
    * Scale shape: tf is one partial-aggregated shuffle on (doc, term);
    * df reduces tf's output by term (second shuffle, input already one
    * row per doc-term); the corpus size N broadcasts as a one-row frame;
    * the df table joins back on the term key and Catalyst picks
    * broadcast vs shuffle by its measured size (vocabulary, not corpus,
    * cardinality). The top-k filter is the window-group-limit shape, so
    * each task truncates to k per doc before the final exchange.
    */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    val tf = Dedup.withWords(docs)
      .select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    tf.join(dfreq, "word").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log10(col("n_docs").cast("double") / col("df")), 9))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("word"), col("tf"),
        col("score"))
  }

  /** SQL mirror of [[tfidfTopK]] over `documents`. */
  def tfidfTopKSql(k: Int): String =
    s"""WITH ws AS (SELECT doc_id, string_split(trim(text), ' ') AS w
       |            FROM documents),
       |tok AS (SELECT doc_id, s AS word FROM ws, unnest(w) AS t(s)),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |dfq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (SELECT doc_id, word, tf,
       |    ROUND(tf * LOG10(CAST(n_docs AS DOUBLE) / df), 9) AS score
       |  FROM tf JOIN dfq USING (word) CROSS JOIN n)
       |SELECT doc_id, rank, word, tf, score FROM (
       |  SELECT doc_id, word, tf, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY score DESC, word ASC) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin

  // ------------------------------------------------- unigram log-prob

  /** Corpus unigram statistics: (word, n_word) plus the corpus token
    * total on every row — the frozen "language model" [[unigramLogProb]]
    * scores against. Materialized once per corpus in production (a
    * CCNet-style deployment trains the LM on a reference corpus and
    * scores candidates against it, exactly the stream gate's shape).
    */
  def unigramModel(docs: DataFrame): DataFrame = {
    val tok = Dedup.withWords(docs)
      .select(explode(col("w")).as("word"))
    val freq = tok.groupBy("word").agg(count(lit(1)).as("n_word"))
    freq.crossJoin(broadcast(tok.agg(count(lit(1)).as("n_total"))))
  }

  /** Per-document mean unigram log-probability — the cheap stand-in for
    * LM-perplexity quality filtering (CCNet scores documents by LM
    * perplexity and keeps the head/middle; a unigram model is the
    * degenerate-but-useful first rung). Per-token
    * `log10(n_word / n_total)` is rounded to 9 decimals (the
    * transcendental convention), then averaged through the decimal-exact
    * fold so the mean is order-independent across engines. Tokens absent
    * from the model (impossible in the self-scored gate, routine in the
    * stream-vs-frozen-model form) fall back to `log10(1 / n_total)` —
    * an add-one-ish floor.
    *
    * Scale shape: tokens join the model on the word key (vocabulary
    * cardinality, Catalyst picks broadcast vs shuffle), then one
    * partial-agg shuffle on doc_id. Nothing is quadratic; the corpus
    * text itself never shuffles — only (doc_id, word) pairs do.
    */
  def unigramLogProb(docs: DataFrame, model: DataFrame): DataFrame = {
    val tok = Dedup.withWords(docs)
      .select(col("doc_id"), explode(col("w")).as("word"))
    // the scalar total rides in on a broadcast one-row frame (not a
    // window backfill — that would serialize the token stream), so
    // unseen-word rows still see it after the left join misses
    val total = model.select(col("n_total")).limit(1)
    tok.crossJoin(broadcast(total))
      .join(model.select(col("word"), col("n_word")), Seq("word"), "left")
      .withColumn("lp", round(log10(
        coalesce(col("n_word"), lit(1L)).cast("double") / col("n_total")),
        9))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (graft.core.Exact.dsum(col("lp")) / count(lit(1)))
          .as("avg_logprob"))
  }

  /** SQL mirror of the self-scored gate ([[unigramLogProb]] with the
    * model from the same corpus — every token is in-vocabulary).
    */
  val unigramLogProbSql: String =
    s"""WITH ws AS (SELECT doc_id, string_split(trim(text), ' ') AS w
       |            FROM documents),
       |tok AS (SELECT doc_id, s AS word FROM ws, unnest(w) AS t(s)),
       |freq AS (SELECT word, COUNT(*) AS n_word FROM tok GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n_total FROM tok),
       |lp AS (SELECT doc_id,
       |           ROUND(LOG10(CAST(n_word AS DOUBLE) / n_total), 9) AS lp
       |       FROM tok JOIN freq USING (word) CROSS JOIN tot)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |       ${graft.core.Exact.dsumSql("lp")} / COUNT(*) AS avg_logprob
       |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val repetitionSql: String =
    s"""WITH w AS (SELECT doc_id,
       |             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
       |           FROM documents),
       |g AS (SELECT doc_id,
       |        list_transform(range(1, greatest(len(w), 1)),
       |          i -> w[i] || ' ' || w[i+1]) AS g2,
       |        list_transform(range(1, greatest(len(w)-1, 1)),
       |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g3,
       |        list_transform(range(1, greatest(len(w)-3, 1)),
       |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) AS g5
       |      FROM w),
       |m AS (SELECT doc_id,
       |        CASE WHEN len(g2)=0 THEN 0.0 ELSE
       |          CAST(COALESCE(list_max(list_transform(list_distinct(g2),
       |            x -> len(list_filter(g2, y -> y = x)))), 0) AS DOUBLE)/len(g2) END AS top2_frac,
       |        CASE WHEN len(g3)=0 THEN 0.0 ELSE
       |          CAST(COALESCE(list_max(list_transform(list_distinct(g3),
       |            x -> len(list_filter(g3, y -> y = x)))), 0) AS DOUBLE)/len(g3) END AS top3_frac,
       |        CASE WHEN len(g5)=0 THEN 0.0 ELSE
       |          CAST(len(g5) - len(list_distinct(g5)) AS DOUBLE)/len(g5) END AS dup5_frac
       |      FROM g)
       |SELECT doc_id, top2_frac, top3_frac, dup5_frac,
       |       (top2_frac > $Top2Threshold OR top3_frac > $Top3Threshold
       |        OR dup5_frac > $Dup5Threshold) AS repetitive
       |FROM m ORDER BY doc_id""".stripMargin

  /** Per-document unigram entropy — the lexical-diversity quality
    * signal (low entropy = few distinct words dominating, the keyword-
    * stuffing / template smell the repetition fractions can miss when
    * repeats are scattered): `H = −Σ p·log2(p)` over the document's own
    * word distribution. Each transcendental term is rounded to 9
    * decimals (the [[unigramLogProb]] convention) and summed through an
    * exact decimal fold, so both engines agree bit-for-bit.
    *
    * Entirely ROW-LOCAL, like [[repetition]] — zero shuffle, corpus-scan
    * cost at any size (the explode + (doc, word) shuffle alternative
    * would move every token of a 100 TB corpus through an exchange for a
    * per-row statistic). Word counts come from run boundaries of the
    * sorted word array (O(n log n) per row, no quadratic
    * distinct×filter), and the term sum folds decimal(28,10) values —
    * exact, order-independent, identical to [[graft.core.Exact.dsum]]'s
    * arithmetic. Docs with no words produce no row (the oracle's
    * unnest-of-empty drops them too).
    */
  def entropy(docs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    val n = size(col("ws"))
    // 1-based positions p where a run of equal words ends: the next
    // element (0-based `get` at p = 1-based p+1; null past the end —
    // ANSI-safe) is absent or different
    val ends = filter(sequence(lit(1), n), p =>
      coalesce(get(col("ws"), p) =!= element_at(col("ws"), p), lit(true)))
    // run lengths = consecutive differences of the end positions
    val starts = concat(array(lit(0)),
      slice(col("ends"), lit(1), size(col("ends")) - 1))
    val runs = zip_with(col("ends"), starts, (e, s) => e - s)
    val term = (r: Column) => {
      val p = r.cast("double") / n.cast("double")
      round(p * log(2.0, p), 9).cast(dec)
    }
    val h = -aggregate(col("runs"), lit(0).cast(dec),
      (acc, r) => (acc + term(r)).cast(dec)).cast("double")
    Dedup.withWords(docs)
      .withColumn("w", filter(col("w"), x => x =!= ""))
      .where(size(col("w")) > 0)
      .withColumn("ws", array_sort(col("w")))
      .withColumn("ends", ends)
      .withColumn("runs", runs)
      .select(col("doc_id"),
        size(col("ends")).cast("long").as("n_distinct"),
        h.as("entropy"))
  }

  /** DuckDB mirror of [[entropy]]. */
  val entropySql: String =
    s"""WITH ws AS (SELECT doc_id,
       |              list_filter(string_split(trim(text), ' '),
       |                          x -> x <> '') AS w
       |            FROM documents),
       |tok AS (SELECT doc_id, s AS word FROM ws, unnest(w) AS t(s)),
       |wc AS (SELECT doc_id, word, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       |wn AS (SELECT doc_id, word, c,
       |           SUM(c) OVER (PARTITION BY doc_id) AS n FROM wc),
       |tm AS (SELECT doc_id,
       |           -- ln(p)/ln(2), matching Spark's log(2, p) evaluation
       |           -- path (Spark has no direct log2)
       |           ROUND((CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) *
       |             (ln(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) / ln(2)), 9)
       |             AS t
       |       FROM wn)
       |SELECT doc_id, COUNT(*) AS n_distinct,
       |       -${graft.core.Exact.dsumSql("t")} AS entropy
       |FROM tm GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Overlapping word-window chunking — the pretraining/RAG splitter:
    * each document becomes chunks of `n` words at `stride`-word starts
    * (stride < n overlaps; the tail chunk is shorter). Start positions
    * are every multiple of `stride` below the word count, so chunk
    * boundaries are a pure function of the text — deterministic across
    * engines and replays. Row-local explode (the only row growth is the
    * intended chunk fan-out ≤ ⌈len/stride⌉); no shuffle, stream-safe.
    * Wordless docs produce no chunks.
    */
  def chunks(docs: DataFrame, n: Int, stride: Int): DataFrame = {
    require(n > 0 && stride > 0, "chunk size and stride must be positive")
    val nw = size(col("w"))
    Dedup.withWords(docs)
      .withColumn("w", filter(col("w"), x => x =!= ""))
      .where(nw > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0), floor((nw - 1) / lit(stride)).cast("int"))))
      .withColumn("st", col("chunk_id") * stride)
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("w"), col("st") + 1, lit(n)), " ").as("chunk"),
        least(nw - col("st"), lit(n)).cast("long").as("n_words"))
  }

  /** DuckDB mirror of [[chunks]]. */
  def chunksSql(n: Int, stride: Int): String =
    s"""WITH ws AS (SELECT doc_id,
       |              list_filter(string_split(trim(text), ' '),
       |                          x -> x <> '') AS w
       |            FROM documents),
       |d AS (SELECT doc_id, w, len(w) AS nw FROM ws WHERE len(w) > 0),
       |-- scalar range() (a LIST) + unnest: the table-function form
       |-- cannot take lateral column bounds
       |c AS (SELECT doc_id, w, nw, CAST(r.i AS BIGINT) AS chunk_id,
       |             r.i * $stride AS st
       |      FROM d, unnest(range(0, ((nw - 1) // $stride) + 1)) AS r(i))
       |SELECT doc_id, chunk_id,
       |       array_to_string(list_slice(w, st + 1, st + $n), ' ') AS chunk,
       |       CAST(LEAST(nw - st, $n) AS BIGINT) AS n_words
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** Feature hashing (the hashing trick): each document's words hash
    * into `dim` buckets, emitted as sparse (doc_id, bucket, n) rows —
    * the classic fixed-width text featurizer (Weinberger et al. 2009)
    * that needs no vocabulary pass. The hash is the engine's md5
    * convention (first 32 md5 bits mod dim — the sampling-hash parity
    * trick), so the oracle reproduces it exactly.
    *
    * ROW-LOCAL like [[entropy]]: bucket ids sort in-row and run
    * boundaries give the counts — zero shuffle, stateless on a stream;
    * only the sparse output rows exist (never a dense dim-length
    * vector per doc).
    */
  def hashFeatures(docs: DataFrame, dim: Int): DataFrame =
    hashFeaturePairs(docs, dim)
      .select(col("doc_id"), explode(col("fs")).as("c"))
      .select(col("doc_id"), col("c.bucket").as("bucket"),
        col("c.n").as("n"))

  /** [[hashFeatures]] kept as a per-doc sparse ARRAY — (doc_id, w, fs:
    * array<struct<bucket, n>>), fs sorted by bucket. The row-local form
    * the trainable classifier folds over (a sparse dot against literal
    * weights needs the whole vector in the row); `w` (the filtered token
    * array) rides along for label/feature derivations.
    */
  private[pipeline] def hashFeaturePairs(docs: DataFrame,
                                         dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    pairsFromBuckets(docs, array_sort(transform(col("w"), word =>
      conv(substring(md5(word), 1, 8), 16, 10).cast("long") % dim)))
  }

  /** [[hashFeaturePairs]] with fastText's hashed word-BIGRAM channel
    * appended (Joulin et al. 2016 §2.1): each adjacent word pair, joined
    * with a single space (tokens are space-split, so a pair string never
    * collides with a single token's hash input), hashes into `dimBi`
    * buckets OFFSET BY `dimUni` — both channels share one sorted bucket
    * array, so the same run-length pass counts them and the classifier's
    * sparse fold needs no second vector. Still row-local: no shuffle,
    * no join.
    */
  private[pipeline] def hashFeaturePairsBi(docs: DataFrame, dimUni: Int,
                                           dimBi: Int): DataFrame = {
    require(dimUni > 0, s"dimUni must be positive, got $dimUni")
    require(dimBi > 0, s"dimBi must be positive, got $dimBi")
    val uni = transform(col("w"), word =>
      conv(substring(md5(word), 1, 8), 16, 10).cast("long") % dimUni)
    val bi = when(size(col("w")) >= 2,
      transform(sequence(lit(1), size(col("w")) - 1), i =>
        lit(dimUni.toLong) + conv(substring(md5(concat_ws(" ",
          element_at(col("w"), i), element_at(col("w"), i + 1))),
          1, 8), 16, 10).cast("long") % dimBi))
      .otherwise(array().cast("array<long>"))
    pairsFromBuckets(docs, array_sort(concat(uni, bi)))
  }

  /** shared run-length core: the per-doc sparse (bucket, n) array from a
    * sorted bucket-array derivation `bs` over the filtered word array
    */
  private def pairsFromBuckets(docs: DataFrame, bs: Column): DataFrame = {
    val ends = filter(sequence(lit(1), size(col("bs"))), p =>
      coalesce(get(col("bs"), p) =!= element_at(col("bs"), p), lit(true)))
    val starts = concat(array(lit(0)),
      slice(col("ends"), lit(1), size(col("ends")) - 1))
    val pairs = zip_with(col("ends"), starts, (e, s) =>
      struct(element_at(col("bs"), e).as("bucket"),
        (e - s).cast("long").as("n")))
    Dedup.withWords(docs)
      .withColumn("w", filter(col("w"), x => x =!= ""))
      .where(size(col("w")) > 0)
      .withColumn("bs", bs)
      .withColumn("ends", ends)
      // generator barrier (the Dsir.score lesson): `pairs` references
      // `ends` three times and `bs` inside per-element lambdas —
      // CollapseProject inlining those into every downstream consumer
      // turned the r14 first cut O(n²)-per-row (text_hash_features 0.45 s
      // → 13.8 s at sf0.01); the explode(array(struct)) seal evaluates
      // the run-length derivation exactly once per row
      .select(col("doc_id"), col("w"),
        explode(array(struct(pairs.as("fs")))).as("s"))
      .select(col("doc_id"), col("w"), col("s.fs").as("fs"))
  }

  /** DuckDB mirror of [[hashFeatures]] — per-(doc, bucket) group counts
    * equal the row-local run lengths by construction.
    */
  def hashFeaturesSql(dim: Int): String =
    s"""WITH ws AS (SELECT doc_id,
       |              list_filter(string_split(trim(text), ' '),
       |                          x -> x <> '') AS w
       |            FROM documents),
       |tok AS (SELECT doc_id, s AS word FROM ws, unnest(w) AS t(s)),
       |b AS (SELECT doc_id,
       |        CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) % $dim
       |          AS bucket
       |      FROM tok)
       |SELECT doc_id, bucket, COUNT(*) AS n
       |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The Gopher document-level quality rules (Rae et al. 2021, §A.1.1 —
    * the filter battery most LLM corpus pipelines start from), restated
    * over this corpus's structure (no line breaks → the line-based rules
    * don't apply; the repetition rules live in [[repetition]]):
    *
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10]
    *   - symbol-to-word ratio ('#' or '…' as '...') ≤ 0.1
    *   - ≥ 80 % of words contain an alphabetic character
    *   - at least 2 of the 8 Gopher stop words present
    *
    * All row-local column arithmetic (one scan, no shuffle, stream-safe);
    * every ratio is a double computed in the same op order as the SQL
    * mirror. Output: per-rule fields + the conjunction `keep`.
    */
  def gopherRules(docs: DataFrame, minWords: Int = 30,
                  maxWords: Int = 100000,
                  stops: Seq[String] = GopherStops): DataFrame = {
    val w = split(trim(col("text")), " ")
    val nW = size(w).cast("double")
    val wlen = (length(col("text")).cast("double") - (nW - 1)) / nW
    val alphaFrac = size(filter(w, x => x.rlike("[a-zA-Z]")))
      .cast("double") / nW
    val hashN = (length(col("text")) -
      length(translate(col("text"), "#", ""))).cast("double")
    val ellN = ((length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
      .cast("double")
    val symRatio = (hashN + ellN) / nW
    val stopCount = stops.map(sw =>
      when(array_contains(w, sw), 1).otherwise(0)).reduce(_ + _)
    docs
      .withColumn("n_words", size(w).cast("long"))
      .withColumn("mean_word_len", wlen)
      .withColumn("symbol_ratio", symRatio)
      .withColumn("alpha_frac", alphaFrac)
      .withColumn("stop_count", stopCount.cast("long"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 && col("alpha_frac") >= 0.8 &&
          col("stop_count") >= 2)
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_frac", "stop_count", "keep")
  }

  /** the 8 Gopher stop words */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** DuckDB mirror of [[gopherRules]]. */
  def gopherRulesSql(minWords: Int = 30, maxWords: Int = 100000,
                     stopList: Seq[String] = GopherStops): String = {
    val stops = stopList.map(sw =>
      s"(CASE WHEN list_contains(w, '$sw') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ws AS (SELECT doc_id, text,
       |              string_split(trim(text), ' ') AS w FROM documents),
       |m AS (SELECT doc_id,
       |        CAST(len(w) AS BIGINT) AS n_words,
       |        (CAST(length(text) AS DOUBLE) - (CAST(len(w) AS DOUBLE) - 1))
       |          / CAST(len(w) AS DOUBLE) AS mean_word_len,
       |        (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
       |         + CAST((length(text) -
       |             length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) // 3
       |             AS DOUBLE))
       |          / CAST(len(w) AS DOUBLE) AS symbol_ratio,
       |        CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
       |             AS DOUBLE) / CAST(len(w) AS DOUBLE) AS alpha_frac,
       |        CAST($stops AS BIGINT) AS stop_count
       |      FROM ws)
       |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
       |       stop_count,
       |       (n_words >= $minWords AND n_words <= $maxWords
       |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |        AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
       |        AND stop_count >= 2) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }
}
