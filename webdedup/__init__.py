"""webdedup — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the query semantics of ogierpaul/suricate
(entity-resolution: pair scoring -> classification -> cluster assignment)
as an idiomatic Spark pipeline over Common-Crawl-style web-page tables:

    normalize -> shingle -> MinHash/SimHash signatures -> LSH blocking
    (band buckets + simhash prefix blocks + substring anchors) ->
    candidate pairs -> similarity features -> triage -> classifier ->
    connected components -> duplicate groups + golden records.

Nothing is ported from the reference; see SURVEY.md for the semantic map
(reference file:line citations live in each module's docstrings).
"""

from webdedup.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
