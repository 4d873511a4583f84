"""Line-level corpus deduplication (the C4/CCNet cleaning rule).

Removes every line that occurs in at least ``min_docs`` distinct documents
— boilerplate navigation, license banners, cookie notices.  This is the
line-granular sibling of ``repeated_spans`` (passage-granular) and
``exact_dedup`` (document-granular).

Scale shape (100 TB):
* lines explode map-side off the document scan (``posexplode``);
* the global frequency table groups on the line's md5 digest, NOT the
  line text — the shuffle carries (32-hex, doc_id) pairs with full
  map-side combine, never megabyte lines;
* removal is a LEFT join marking lines whose digest is in the frequent
  set (HAVING >= min_docs keeps that side tiny relative to the corpus —
  boilerplate vocabulary, not corpus volume — so it broadcasts);
* reassembly and BOTH counters come from one groupBy(doc_id) over the
  marked rows — the same single shuffle a per-document ``collect_list``
  always costs, and the only corpus-wide shuffle after the frequency
  table.

Short lines (< ``min_chars`` after trim) are never candidates for removal
(the C4 rule's guard against killing every blank/bullet line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, line) — one row per physical line, 0-based position."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def repeated_line_digests(
    lines: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = 3,
    min_chars: int = 10,
) -> DataFrame:
    """Digests of lines occurring in >= min_docs distinct documents."""
    return (
        lines.filter(F.length(F.trim("line")) >= min_chars)
        .select(
            F.md5(F.trim("line")).alias("line_digest"),
            F.col(id_col),
        )
        .groupBy("line_digest")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_repeated_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    min_chars: int = 10,
) -> DataFrame:
    """(id, clean_text, n_lines, n_removed) with boilerplate lines dropped.

    Line order is preserved; a document whose every line is boilerplate
    survives with clean_text = ''.
    """
    from ton_indexer_spark.operators.spread import spread_small

    # the line explode + trim/md5 is CPU-heavy map work off the document
    # scan, and BOTH passes below (frequency, marking) read it: spread a
    # small single-split input across cores — identity at scale
    lines = split_lines(spread_small(docs), id_col, text_col)
    frequent = repeated_line_digests(lines, id_col, min_docs, min_chars)
    # ONE pass over the line rows: a (broadcast-sized) left join against
    # the frequent digests marks removals, and a single per-doc
    # aggregation rebuilds the text and produces both counters.  The old
    # shape ran the line explode three times (frequency, anti-join,
    # totals) and joined two per-doc aggregates back together — two
    # corpus-wide shuffles and an outer join more than this plan.
    marked = lines.join(
        frequent.select("line_digest").withColumn("_rm", F.lit(True)),
        F.md5(F.trim(lines["line"])) == frequent["line_digest"],
        "left",
    )
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        # collect_list drops nulls: removed lines stay out
                        F.when(F.col("_rm").isNull(),
                               F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines"),
        F.count("_rm").alias("n_removed"),
    ).select(id_col, "clean_text", "n_lines", "n_removed")
