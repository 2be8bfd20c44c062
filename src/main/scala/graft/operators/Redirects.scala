package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Redirect-chain resolution — following 301/308 `Location` hops
  * ([[Http.httpParse]] emits them) to each URL's final target, the
  * crawl-side prerequisite for URL-keyed dedup (a corpus that stores
  * `/old` and `/new` as distinct documents because it never resolved
  * the hop double-counts every moved page).
  *
  * Algorithm: synchronous POINTER DOUBLING (the q178 min-plus-doubling
  * discipline applied to functional graphs): state is one
  * `(url, cur, hops, done)` frame; each round joins the frame with
  * ITSELF on `cur = url`, composing the partial walk with itself —
  * after r rounds every chain of ≤ 2^r hops is resolved. No sequential
  * walk, no driver loop over rows: `rounds` relational self-joins,
  * each an equi-join both sides keyed on the URL (SortMergeJoin at
  * 10^11 URLs; per-round state is urls-sized and lineage-cut by an
  * eager localCheckpoint, the [[Graph.pageRank]] loop discipline).
  *
  * Semantics (declared): a URL with no outgoing hop is terminal
  * (`resolved`, `final_url` = itself, `hops` = 0); a hop whose target
  * is OUTSIDE the edge set resolves to that off-corpus target (the
  * redirect leaves the snapshot — still a definite answer); a chain
  * still unfinished after `rounds` doublings — a cycle, or deeper than
  * 2^rounds — is `resolved = false` with NULL final/hops
  * (refuse-visibly, the engine convention). Self-redirects are
  * 1-cycles and come out unresolved.
  */
object Redirects {

  /** Resolve every URL in `urls` (column `url`) through `edges`
    * (`url → next`, at most one hop per url — callers dedupe upstream;
    * duplicate sources would fan the walk out) with `rounds` doublings
    * (chains ≤ 2^rounds). Emits `(url, final_url, n_hops, resolved)`. */
  def resolveRedirects(urls: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"rounds must be in [1, 20], got $rounds")
    var res = urls.select(col("url"))
      .join(edges.select(col("url"), col("next")), Seq("url"), "left")
      .select(col("url"),
        coalesce(col("next"), col("url")).as("cur"),
        when(col("next").isNull, lit(0L)).otherwise(lit(1L)).as("hops"),
        col("next").isNull.as("done"))
      .localCheckpoint()
    for (_ <- 0 until rounds) {
      val b = res.select(col("url").as("__u2"), col("cur").as("__c2"),
        col("hops").as("__h2"), col("done").as("__d2"))
      res = res.join(b, res("cur") === b("__u2"), "left")
        .select(col("url"),
          when(col("done"), col("cur"))
            .otherwise(coalesce(col("__c2"), col("cur"))).as("cur"),
          when(col("done"), col("hops"))
            .otherwise(col("hops") + coalesce(col("__h2"), lit(0L)))
            .as("hops"),
          (col("done") || coalesce(col("__d2"), lit(true))).as("done"))
        .localCheckpoint()
    }
    // Final terminal check: `done` propagation lags the composed walk
    // by one round (a row is flagged only when its JOIN PARTNER was
    // already done), so a chain of exactly 2^rounds hops would end
    // with cur AT the terminal but unflagged. Resolution is therefore
    // decided by the walk's position — cur has no outgoing hop — with
    // `done` kept as the intra-loop freeze. hops stays exact either
    // way (the composition invariant: hops(url) = steps from url to
    // cur, frozen once done).
    val term = edges.select(col("url").as("__t"))
    res.join(term, res("cur") === term("__t"), "left")
      .select(col("url"),
        when(col("done") || col("__t").isNull, col("cur")).as("final_url"),
        when(col("done") || col("__t").isNull, col("hops")).as("n_hops"),
        (col("done") || col("__t").isNull).as("resolved"))
  }

  // ---------------------------------------------------------------- q192
  // Fixture functional graph over the documents ids (the construction⊗
  // resolve convention): url k hops to k+1 except every k%4==3 is
  // terminal — UNLESS k%12==11, which hops BACK to k−2, making
  // {k−2, k−1, k} a 3-cycle (and k%12==8 a chain INTO the cycle, which
  // must come out unresolved too); the largest k with k%4!=3 hops off
  // the end of the corpus and resolves off-snapshot. Chains are ≤ 3
  // hops; 3 doubling rounds cover 8 — headroom is the point (the
  // declared bound, not the fixture, sizes the rounds). The oracle
  // unrolls the same 3 self-joins.
  private def fixtureUrl(k: org.apache.spark.sql.Column) =
    concat(lit("https://r.example.org/r/"), k.cast("string"))

  private val q192 = GraftQuery(
    "q192_redirect_resolve",
    (s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id").as("k"))
      val urls = ids.select(fixtureUrl(col("k")).as("url"))
      val edges = ids
        .filter(pmod(col("k"), lit(4)) =!= 3 ||
          pmod(col("k"), lit(12)) === 11)
        .select(fixtureUrl(col("k")).as("url"),
          fixtureUrl(when(pmod(col("k"), lit(12)) === 11, col("k") - 2)
            .otherwise(col("k") + 1)).as("next"))
      resolveRedirects(urls, edges, rounds = 3)
        .orderBy(col("url"))
    },
    Some {
      def round(prev: String, out: String) = s"""
      $out AS (SELECT a.url,
                 CASE WHEN a.done THEN a.cur ELSE COALESCE(b.cur, a.cur) END AS cur,
                 CASE WHEN a.done THEN a.hops ELSE a.hops + COALESCE(b.hops, 0) END AS hops,
                 (a.done OR COALESCE(b.done, TRUE)) AS done
               FROM $prev a LEFT JOIN $prev b ON a.cur = b.url)"""
      s"""
      WITH ids AS (SELECT doc_id AS k,
                     'https://r.example.org/r/' || CAST(doc_id AS VARCHAR) AS url
                   FROM documents),
      edges AS (SELECT url,
                  'https://r.example.org/r/' || CAST(CASE WHEN k % 12 = 11 THEN k - 2 ELSE k + 1 END AS VARCHAR) AS next
                FROM ids WHERE k % 4 <> 3 OR k % 12 = 11),
      r0 AS (SELECT u.url,
               COALESCE(e.next, u.url) AS cur,
               CAST(CASE WHEN e.next IS NULL THEN 0 ELSE 1 END AS BIGINT) AS hops,
               (e.next IS NULL) AS done
             FROM ids u LEFT JOIN edges e ON u.url = e.url),
      ${round("r0", "r1")},
      ${round("r1", "r2")},
      ${round("r2", "r3")}
      SELECT r.url,
             CASE WHEN r.done OR e.url IS NULL THEN r.cur END AS final_url,
             CASE WHEN r.done OR e.url IS NULL THEN r.hops END AS n_hops,
             (r.done OR e.url IS NULL) AS resolved
      FROM r3 r LEFT JOIN edges e ON r.cur = e.url
      ORDER BY r.url"""
    })

  val all: Seq[GraftQuery] = Seq(q192)
}
