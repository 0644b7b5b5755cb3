package graft.model

import java.sql.Timestamp

/** Core data model of the KG-construction engine.
  *
  * Mirrors the reference's graph contract (reference:
  * src/kg_ae/graph/store.py:10-41, schemas/graph.schema.json:8-48) recast as
  * typed Spark Datasets over the north-rule input shape
  * `pages(url, warc_ts, html, text, lang)`.
  */

/** One Common-Crawl-style web page (north-rule input_hint shape). */
case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** A detected entity mention inside a page's extracted text. */
case class Mention(
    url: String,
    surface: String,
    norm: String, // lowercase-trimmed surface, the linking key (store.py:179-192 semantics)
    begin: Int,
    end: Int)

/** An extracted (subj, pred, obj) triple with provenance.
  * Subject/object are *surface-normalized* labels pre-canonicalization.
  */
case class RawTriple(
    subj: String,
    pred: String,
    obj: String,
    url: String,
    sentence: String)

/** Graph vertex (reference ALLOWED_NODE_TYPES, validate.py:20). */
case class Vertex(
    node_type: String,
    key: Long,
    label: String,
    props: Map[String, String])

/** Provenance evidence payload (reference build.py:121-167). */
case class Evidence(
    evidence_type: String,
    source_record_id: String,
    source_url: String,
    dataset: String,
    payload: Map[String, String])

/** Graph edge = claim + provenance (reference graph.schema.json:12-48). */
case class Edge(
    src_type: String,
    src_key: Long,
    dst_type: String,
    dst_key: Long,
    edge: String,
    claim_key: Long,
    claim_type: String,
    strength_score: Double,
    frequency: Double,
    relation: String,
    dataset: String,
    meta: Map[String, String],
    evidence: Seq[Evidence])
