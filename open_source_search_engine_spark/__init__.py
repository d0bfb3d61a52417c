"""open_source_search_engine_spark — a PySpark-native full-text indexing
and BM25 query engine with the capabilities of the Gigablast reference
(``cmilan/open-source-search-engine``), rebuilt Spark-first.

Reference semantics are documented in ``SURVEY.md`` (operator inventory §2);
this package re-expresses them as DataFrame programs:

- ``sources``   — corpus synthesizer, driver-testdata loaders, and an
                  Iceberg-style snapshot/manifest table layer (Rdb analog).
- ``functions`` — vectorized Arrow/pandas UDFs + column expressions:
                  code tokenizer, varint/delta postings codec, hashing,
                  text-quality analytics.
- ``operators`` — index build, segment merge/compaction, stats aggregates,
                  block-max-WAND top-k, dedup family, similarity search.
- ``plans``     — query string → QueryPlan → DataFrame program (BM25).
- ``streaming`` — incremental index maintenance via Structured Streaming.
"""

__version__ = "0.2.0"

# primary user surface, importable from the package root
from .operators.build import Index, build_index  # noqa: E402,F401
from .operators.merge import compact_postings, delete_docs  # noqa: E402,F401
from .operators.packing import pack_sequences, packing_stats  # noqa: E402,F401
from .operators.scrub import pii_count, scrub_pii  # noqa: E402,F401
from .operators.topk import search_wand  # noqa: E402,F401
from .plans.boolean import search_boolean  # noqa: E402,F401
from .plans.exec import search  # noqa: E402,F401
from .plans.reindex import (  # noqa: E402,F401
    delete_by_query,
    match_docs,
    reindex_by_query,
)
from .session import get_spark  # noqa: E402,F401
from .streaming.incremental import add_documents, stream_documents  # noqa: E402,F401

__all__ = [
    "Index",
    "build_index",
    "search",
    "search_wand",
    "search_boolean",
    "compact_postings",
    "delete_docs",
    "match_docs",
    "delete_by_query",
    "reindex_by_query",
    "add_documents",
    "stream_documents",
    "get_spark",
    "pack_sequences",
    "packing_stats",
    "scrub_pii",
    "pii_count",
]
