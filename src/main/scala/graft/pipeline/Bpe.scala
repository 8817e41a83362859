package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016 — the byte-pair
  * encoding loop every subword tokenizer starts from): k rounds of
  * "count adjacent symbol pairs, merge the most frequent everywhere".
  *
  * The working set is the DISTINCT-WORD symbol table (word, cnt, pos,
  * sym) — corpus frequency folds into `cnt` once, so round cost scales
  * with vocabulary size, not corpus size, exactly like the reference
  * implementations. Each round is: one lead() window for pair rows, a
  * partial-aggregated pair count (map-side combined to |pairs| rows),
  * a 1-row argmax broadcast back, and the merge application.
  *
  * Merge application is the subtle part: BPE applies a merge GREEDILY
  * LEFT-TO-RIGHT over non-overlapping occurrences ('aaaa' + (a,a) →
  * (aa)(aa), not (aa)a(aa)). That fold is equivalent to a WINDOW rule —
  * among each maximal run of consecutive matching positions, merge the
  * even offsets (overlapping runs only arise for self-pairs, where
  * greedy takes every other occurrence; fuzz-verified against the
  * reference fold over 20k cases in BpeSpec) — so the whole round stays
  * declarative: no UDF, no recursion, one window partitioning reused
  * across rounds (the word key).
  *
  * Determinism: pair-count ties break on (left, right) binary ordering;
  * counts are exact longs. Both engines run the identical rule chain.
  */
object Bpe {

  /** initial symbol table: one row per (distinct word, char position),
    * PRE-PARTITIONED on the word key so every round's window chain runs
    * inside this one exchange (rounds add zero shuffles on the symbol
    * table; only the tiny per-round pair aggregates move)
    */
  def symbols(docs: DataFrame): DataFrame = {
    val words = Dedup.withWords(docs)
      .select(explode(filter(col("w"), x => x =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    words.select(col("word"), col("cnt"),
        posexplode(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))))
      .select(col("word"), col("cnt"), (col("pos") + 1).as("pos"),
        col("col").as("sym"))
      .repartition(8, col("word"))
  }

  /** (bestPairRow(a, b, pair_count), nextSymbolTable).
    *
    * The merge application is ONE window chain over the existing word
    * partitioning — no self-join, no per-round selection broadcast:
    * mrank (running match count), run starts (a match not preceded by
    * one), the carried run-start mrank, and even run offsets select;
    * the successor of a selected position drops via lag.
    */
  private def round(t: DataFrame): (DataFrame, DataFrame) = {
    val w = Window.partitionBy("word").orderBy("pos")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withNext = t.withColumn("nsym", lead(col("sym"), 1).over(w))
    val best = withNext.where(col("nsym").isNotNull)
      .groupBy(col("sym"), col("nsym"))
      .agg(sum(col("cnt")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("sym").asc, col("nsym").asc)
      .limit(1)
      .select(col("sym").as("a"), col("nsym").as("b"), col("pair_count"))
    val merged = withNext.crossJoin(broadcast(best))
      .withColumn("m", col("nsym").isNotNull &&
        col("sym") === col("a") && col("nsym") === col("b"))
      .withColumn("mrank", sum(col("m").cast("long")).over(wAll))
      .withColumn("runStart",
        col("m") && !coalesce(lag(col("m"), 1).over(w), lit(false)))
      .withColumn("startRank",
        max(when(col("runStart"), col("mrank"))).over(wAll))
      .withColumn("sel",
        col("m") && (col("mrank") - col("startRank")) % 2 === 0)
      .withColumn("gone",
        coalesce(lag(col("sel"), 1).over(w), lit(false)))
      .where(!col("gone"))
      .select(col("word"), col("cnt"),
        row_number().over(w).as("pos"),
        when(col("sel"), concat(col("a"), col("b")))
          .otherwise(col("sym")).as("sym"))
    (best, merged)
  }

  /** The first `k` merge rules: (round, left, right, merged, pair_count). */
  def merges(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // each round's symbol table is a TRANSIENT pin: round r's argmax and
    // merge both re-read round r-1's table, and the unpinned lineage
    // re-executes every prior round per reuse (2^k blowup — measured
    // 71 s at sf0.001 for k=4 vs ~3 s pinned)
    var t = graft.core.Caches.deferRelease(symbols(docs).persist())
    var out: DataFrame = null
    for (r <- 1 to k) {
      val (best, next) = round(t)
      val row = best.select(lit(r).as("round"), col("a").as("lhs"),
        col("b").as("rhs"), concat(col("a"), col("b")).as("merged"),
        col("pair_count"))
      out = if (out == null) row else out.union(row)
      t = graft.core.Caches.deferRelease(next.persist())
    }
    out.orderBy("round")
  }

  /** Vocabulary after `k` merge rounds: the `top` most frequent words
    * with their subword segmentation — (word, cnt, n_tokens, tokens).
    */
  def tokenized(docs: DataFrame, k: Int, top: Int): DataFrame = {
    require(k >= 1 && top >= 1)
    var t = graft.core.Caches.deferRelease(symbols(docs).persist())
    for (_ <- 1 to k)
      t = graft.core.Caches.deferRelease(round(t)._2.persist())
    t.groupBy(col("word"), col("cnt"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(sort_array(collect_list(
          struct(col("pos"), col("sym")))), x => x.getField("sym")), " ")
          .as("tokens"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(top)
  }

  // ----------------------------------------------------------- oracle

  private def roundSql(i: Int, prev: String): String = {
    val w = "OVER (PARTITION BY word ORDER BY pos)"
    val wa = "OVER (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING)"
    s"""pr$i AS (SELECT word, cnt, pos, sym,
       |         lead(sym) $w AS nsym
       |       FROM $prev),
       |bt$i AS (SELECT sym AS a, nsym AS b,
       |         CAST(SUM(cnt) AS BIGINT) AS pair_count
       |       FROM pr$i WHERE nsym IS NOT NULL
       |       GROUP BY 1, 2
       |       ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1),
       |mk$i AS (SELECT p.*, b.a, b.b,
       |         (p.nsym IS NOT NULL AND p.sym = b.a AND p.nsym = b.b)
       |           AS m
       |       FROM pr$i p CROSS JOIN bt$i b),
       |r1$i AS (SELECT *,
       |         SUM(CASE WHEN m THEN 1 ELSE 0 END) $wa AS mrank,
       |         (m AND NOT COALESCE(lag(m) $w, FALSE)) AS run_start
       |       FROM mk$i),
       |r2$i AS (SELECT *,
       |         MAX(CASE WHEN run_start THEN mrank END) $wa AS start_rank
       |       FROM r1$i),
       |r3$i AS (SELECT *,
       |         (m AND (mrank - start_rank) % 2 = 0) AS sel
       |       FROM r2$i),
       |r4$i AS (SELECT *, COALESCE(lag(sel) $w, FALSE) AS gone
       |       FROM r3$i),
       |t$i AS (SELECT word, cnt, ROW_NUMBER() $w AS pos,
       |         CASE WHEN sel THEN a || b ELSE sym END AS sym
       |       FROM r4$i WHERE NOT gone)""".stripMargin
  }

  private def baseSql: String =
    s"""ws AS (SELECT list_filter(string_split(trim(text), ' '),
       |              x -> x <> '') AS w
       |       FROM documents),
       |wd AS (SELECT s AS word, COUNT(*) AS cnt
       |       FROM ws, unnest(w) AS t(s) GROUP BY 1),
       |-- scalar range() (a LIST) + unnest: the table-function form
       |-- cannot take lateral column bounds
       |t0 AS (SELECT word, cnt, CAST(r.i AS BIGINT) AS pos,
       |         substr(word, CAST(r.i AS INTEGER), 1) AS sym
       |       FROM wd, unnest(range(1, length(word) + 1)) AS r(i))"""
      .stripMargin

  /** DuckDB mirror of [[merges]] over `documents`. */
  def mergesSql(k: Int): String = {
    val rounds = (1 to k).map(i =>
      roundSql(i, if (i == 1) "t0" else s"t${i - 1}")).mkString(",\n")
    val sel = (1 to k).map(i =>
      s"SELECT $i AS round, a AS lhs, b AS rhs, a || b AS merged, " +
        s"pair_count FROM bt$i").mkString("\nUNION ALL\n")
    s"""WITH $baseSql,
       |$rounds
       |$sel
       |ORDER BY round""".stripMargin
  }

  /** DuckDB mirror of [[tokenized]]. */
  def tokenizedSql(k: Int, top: Int): String = {
    val rounds = (1 to k).map(i =>
      roundSql(i, if (i == 1) "t0" else s"t${i - 1}")).mkString(",\n")
    s"""WITH $baseSql,
       |$rounds
       |SELECT word, cnt, COUNT(*) AS n_tokens,
       |       string_agg(sym, ' ' ORDER BY pos) AS tokens
       |FROM t$k GROUP BY 1, 2
       |ORDER BY cnt DESC, word ASC LIMIT $top""".stripMargin
  }
}
