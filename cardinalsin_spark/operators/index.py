"""Inverted text index as a columnar posting table, plus index-served
term search.

The reference's adaptive-index subsystem RECOMMENDS inverted indexes for
low-cardinality columns but never builds or consults one — indexes never
alter execution (`query/engine.rs:259-300`, SURVEY §2.13). Here the index
is real: a (term, doc_id, tf) posting table — the columnar form of a
posting list, one row per posting, which is the shape that scales (a
100 TB corpus's postings shard by term; array-typed posting lists would
hot-spot on stopwords). Written ``bucketBy(term)``, term-lookup joins are
exchange-free (same mechanism `sources/ingest.py` bucketed tables pin in
tests/test_plan_quality.py).

Search consults ONLY the posting table — cost scales with the matched
postings, not the corpus — which is exactly the execution-altering use
the reference's recommender imagines but never ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cardinalsin_spark.operators.text import exploded_terms


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, doc_id, tf) posting rows: tokenize → explode → one hash
    aggregation. Map-side combinable; no other shuffle."""
    toks = exploded_terms(df, text_col, id_col)
    return toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))


def search_all_terms(
    postings: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive (AND) term search served from the posting table: docs
    containing EVERY query term, ranked by summed term frequency
    (deterministic tiebreak on the id).

    Plan shape: one IN-filter on the term column (pushable to the posting
    scan / prunable to the term buckets), one aggregation keyed on the
    doc, a HAVING on the distinct-term count, and a distributed
    TakeOrdered for the top-k — never touches the corpus itself."""
    sel = postings.filter(F.col("term").isin(*terms))
    return (
        sel.groupBy(id_col)
        .agg(
            F.count_distinct("term").alias("n_terms_hit"),
            F.sum("tf").alias("total_tf"),
        )
        .filter(F.col("n_terms_hit") == len(terms))
        .orderBy(F.desc("total_tf"), F.asc(id_col))
        .limit(k)
    )
