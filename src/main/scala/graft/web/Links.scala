package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hyperlink extraction from raw HTML — the op that turns a page corpus
  * into the link graph ([[graft.graph.PageRank]]'s input) and the anchor
  * texts entity linkers treat as high-precision mention evidence.
  *
  * Same portability contract as [[Urls]]: Java-regex/RE2 common subset,
  * codegen-only (regexp_extract_all + arrays_zip + explode), scan-side.
  * The pattern is the standard crawl-pipeline compromise, not a parser:
  * double-quoted hrefs, non-nested anchor bodies ([^<]*). Single-quoted /
  * unquoted attributes and markup inside the anchor body are skipped —
  * at web scale those are a recall tail the link graph tolerates; a full
  * tokenizer (FastHtml's job for TEXT) is not needed for edges.
  */
object Links {

  /** group 1 = href, group 2 = anchor text */
  val AnchorRe = """<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>"""

  /** Array of {href, anchor} structs, document order. */
  def anchors(html: Column): Column =
    arrays_zip(
      regexp_extract_all(html, lit(AnchorRe), lit(1)).as("href"),
      regexp_extract_all(html, lit(AnchorRe), lit(2)).as("anchor"))

  /** Exploded link records: one row per anchor tag — (…idCols, href,
    * anchor, plus the canonical target URL and its registered domain via
    * [[Urls]]), ready to aggregate into a (src, dst) edge list. */
  def linkRecords(df: org.apache.spark.sql.DataFrame, htmlCol: Column,
      idCols: Column*): org.apache.spark.sql.DataFrame =
    df.select(idCols :+ explode(anchors(htmlCol)).as("_a"): _*)
      .select(idCols ++ Seq(
        col("_a.href").as("href"),
        col("_a.anchor").as("anchor"),
        Urls.normalize(col("_a.href")).as("target_url"),
        Urls.registeredDomain(col("_a.href")).as("target_domain")): _*)
}
