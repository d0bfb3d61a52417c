"""Shared helpers for the bench/scaling tools.

One copy of the fixture-corpus protocol: a completion marker gates
reuse, so a killed first synth (partial parquet dir) or a differently
parameterized corpus can never be silently served to a benchmark —
path-existence checks alone inflated docs/sec whenever a prior run died
mid-write.
"""

from __future__ import annotations

import os
import shutil


def ensure_corpus(spark, n_docs: int, path: str):
    """Synthesize the n_docs fixture corpus at ``path`` unless a COMPLETE
    one is already there (marker-gated); returns the DataFrame."""
    from open_source_search_engine_spark.sources.corpus import synth_documents

    marker = os.path.join(path, "_SYNTH_OK")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        synth_documents(spark, n_docs).write.mode("overwrite").parquet(path)
        open(marker, "w").close()
    return spark.read.parquet(path)
