#!/usr/bin/env python
"""spark-submit entry point (north rule: "runs end-to-end through
spark-submit --py-files on multi-executor clusters").

    zip -r engine.zip open_source_search_engine_spark
    spark-submit --py-files engine.zip run_engine.py build --src <parquet> --index <dir>
    spark-submit --py-files engine.zip run_engine.py search --index <dir> -q "binary search"

Under spark-submit the session/config come from the submit command;
``session.get_spark`` adopts the existing session via ``getOrCreate``
and only overlays this engine's required settings (Arrow batching, ICU
workaround, AQE).  The same file runs standalone with a local session
(``python run_engine.py ... --cores 8``).
"""

from open_source_search_engine_spark.__main__ import main

if __name__ == "__main__":
    main()
