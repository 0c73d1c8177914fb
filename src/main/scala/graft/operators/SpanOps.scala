package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interleaved text+media span-document operators — the `input_hint` table
  * shape (doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)
  * exercised as oracle-checked queries over the driver's `documents` table.
  *
  * The spans construction is deterministic from `documents(text, source,
  * doc_id)` and mirrored term-for-term in the DuckDB oracle; the Spark side
  * then operates on the ARRAY form with higher-order functions (the
  * reference's per-page line scans, scrapers/gpcrmd.py:161-271, are exactly
  * such span scans), exploding to flat columns only for the comparable
  * output. All expressions are codegen'd Catalyst built-ins — no UDFs.
  */
object SpanOps {
  import Tables.t

  /** Build the interleaved span array for each document: title text, lead
    * text, thumbnail media, body text, file-link media — a miniature of the
    * crawled record page (SURVEY.md §1.3 input-hint mapping).
    */
  def spanArray: Column = {
    val words = split(col("text"), " ")
    def span(kind: String, text: Column, media: Column, off: Int) =
      struct(lit(kind).as("kind"), text.as("text"), media.as("media_ref"),
        lit(off).as("offset"))
    array(
      span("text", concat(lit("title: doc "), col("doc_id")), lit(""), 0),
      span("text", concat_ws(" ", slice(words, 1, 8)), lit(""), 1),
      span("media", lit(""),
        concat(lit("thumb://"), col("source"), lit("/"), col("doc_id"),
          lit(".png")), 2),
      span("text", concat_ws(" ", slice(words, 9, 8)), lit(""), 3),
      span("media", lit(""),
        concat(lit("dl://"), col("source"), lit("/"), col("doc_id"),
          lit("/data.gro")), 4),
    )
  }

  /** documents → Dataset of interleaved span docs (the input_hint shape). */
  def spanDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("string").as("doc_id"),
      col("source"), col("text"), spanArray.as("spans"))

  private def sqlLead(n1: Int, n2: Int) =
    s"array_to_string(string_split(text, ' ')[$n1:$n2], ' ')"

  def entries: Seq[QueryEntry] = Seq(
    // ---- the spans table itself, exploded to comparable flat rows --------
    QueryEntry(
      "q_spans_interleave",
      (s, dir) => {
        spanDocs(t(s, dir, "documents"))
          .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "s")))
          .select(col("doc_id"), col("s.kind").as("kind"),
            col("s.text").as("text"), col("s.media_ref").as("media_ref"),
            col("s.offset").as("soff"))
          .orderBy(col("doc_id").cast("long"), col("soff"))
      },
      Some(s"""SELECT CAST(doc_id AS VARCHAR) AS doc_id, kind, text, media_ref, soff FROM (
          SELECT doc_id, 'text' AS kind, 'title: doc ' || doc_id AS text,
                 '' AS media_ref, 0 AS soff FROM documents
          UNION ALL
          SELECT doc_id, 'text', ${sqlLead(1, 8)}, '', 1 FROM documents
          UNION ALL
          SELECT doc_id, 'media', '',
                 'thumb://' || source || '/' || doc_id || '.png', 2 FROM documents
          UNION ALL
          SELECT doc_id, 'text', ${sqlLead(9, 16)}, '', 3 FROM documents
          UNION ALL
          SELECT doc_id, 'media', '',
                 'dl://' || source || '/' || doc_id || '/data.gro', 4 FROM documents)
        ORDER BY CAST(doc_id AS BIGINT), soff"""),
    ),
    // ---- C18: field-from-spans scan (higher-order filter over the array) --
    QueryEntry(
      "q_span_field_scan",
      (s, dir) => {
        val sp = spanDocs(t(s, dir, "documents"))
        val texts = filter(col("spans"), x => x.getField("kind") === "text")
        val titleSpan = filter(col("spans"),
          x => x.getField("text").startsWith("title: "))
        sp.select(
            col("doc_id"),
            substring(element_at(titleSpan, 1).getField("text"), 8, 1 << 20)
              .as("title"),
            size(filter(col("spans"), x => x.getField("kind") === "media"))
              .as("n_media"),
            size(texts).as("n_text"),
            aggregate(texts, lit(0),
              (acc, x) => acc + length(x.getField("text"))).as("text_chars"),
          )
          .orderBy(col("doc_id").cast("long"))
      },
      Some("""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
          'doc ' || doc_id AS title,
          2 AS n_media, 3 AS n_text,
          CAST(length('title: doc ' || doc_id)
            + length(array_to_string(string_split(text,' ')[1:8], ' '))
            + length(array_to_string(string_split(text,' ')[9:16], ' '))
            AS INT) AS text_chars
        FROM documents ORDER BY CAST(doc_id AS BIGINT)"""),
    ),
    // ---- ordered media-ref sequence per doc (span-order preservation) -----
    QueryEntry(
      "q_span_media_seq",
      (s, dir) => {
        val sp = spanDocs(t(s, dir, "documents"))
        val medias = filter(col("spans"), x => x.getField("kind") === "media")
        sp.select(col("doc_id"),
            array_join(transform(medias, x => x.getField("media_ref")), ",")
              .as("media_seq"))
          .orderBy(col("doc_id").cast("long"))
      },
      Some("""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
          'thumb://' || source || '/' || doc_id || '.png,dl://' || source
            || '/' || doc_id || '/data.gro' AS media_seq
        FROM documents ORDER BY CAST(doc_id AS BIGINT)"""),
    ),
    // ---- per-row span-sequence fingerprint (the parity invariant as a
    //      query: md5 over the canonical (kind,text,media_ref,offset) fold) -
    QueryEntry(
      "q_span_fingerprint",
      (s, dir) => {
        val sp = spanDocs(t(s, dir, "documents"))
        sp.select(col("doc_id"),
            md5(aggregate(col("spans"), lit("").cast("string"),
              (acc, x) => concat(acc, x.getField("kind"), lit("|"),
                x.getField("text"), lit("|"), x.getField("media_ref"),
                lit("|"), x.getField("offset").cast("string"), lit(";"))))
              .as("span_sig"))
          .orderBy(col("doc_id").cast("long"))
      },
      Some("""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
          md5('text|title: doc ' || doc_id || '||0;'
            || 'text|' || array_to_string(string_split(text,' ')[1:8], ' ') || '||1;'
            || 'media||thumb://' || source || '/' || doc_id || '.png|2;'
            || 'text|' || array_to_string(string_split(text,' ')[9:16], ' ') || '||3;'
            || 'media||dl://' || source || '/' || doc_id || '/data.gro|4;')
          AS span_sig
        FROM documents ORDER BY CAST(doc_id AS BIGINT)"""),
    ),
  )
}
