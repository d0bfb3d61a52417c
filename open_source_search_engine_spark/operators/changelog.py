"""Snapshot changelog — CDC between two index versions (Iceberg
``incremental read`` / ``changes`` analog; the audit dual of
operators/timetravel.py's AS-OF reads).

The reference engine has no historical diff (Rdb keeps only the live
file set, SURVEY §1.3); this is the Iceberg-native extension a
training-data pipeline needs: "which documents entered or left the
index between snapshot A and snapshot B?" drives incremental
re-training feeds, eval-set freshness audits, and delete-compliance
reports without ever re-scanning the corpus.

Semantics (exact, mode-independent): with ``live(v)`` = docstats rows
at pin v minus doc_ids tombstoned at pin v,

    added   = live(to) - live(from)
    removed = live(from) - live(to)

one row per changed doc with its docstats metadata plus a ``change``
column ('added' | 'removed').  Updates surface as the reference's own
delete-then-re-add diff (doc_id = hash(repo,path,commit), so a new
commit IS a new doc).  Compaction between the pins changes no live doc
and therefore yields an EMPTY changelog — physical rewrites are
invisible, exactly Iceberg's contract.

Plan shape at 100 TB — two modes, chosen per call from the snapshot
log alone (no Spark job):

- **incremental** (every segment live at ``from`` is still live at
  ``to``, for both docstats and deletes — i.e. the window is
  append-only): the added side scans ONLY the segments committed in
  the window (segment-list set difference, the Iceberg incremental
  read), and the removed side semi-joins the window's new tombstone
  ids (small by construction) against the pinned docstats — AQE
  broadcasts the tombstone side, so the 10^12-row docstats is never
  shuffled.
- **diff** (a compaction/rewrite intervened): honest live-set
  anti-joins between the two pins over column-pruned docstats scans —
  the fallback Iceberg itself requires when a rewrite breaks
  append-only lineage.

``changelog_mode`` exposes which mode a (from, to) pair resolves to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import SnapshotTable

# docstats columns carried on every changelog row (schemas.DOCSTATS)
_META_COLS = (
    "doc_id",
    "repo",
    "path",
    "commit",
    "lang",
    "content_sha256",
    "doclen",
)


def _deletes(index) -> SnapshotTable:
    from .merge import deletes_table

    return deletes_table(index)


def _pin_segments(table, pin: int | None) -> list[str]:
    """Live segment paths at ``pin`` (absolute); [] when the table had
    no commits at the pinned time (pin None)."""
    if pin is None:
        return []
    return list(table.at(pin).segments)


def _read_segments(spark: SparkSession, paths: list[str]) -> DataFrame | None:
    if not paths:
        return None
    return spark.read.parquet(*sorted(paths))


def _dead_ids(
    spark: SparkSession, index, pin: int | None
) -> DataFrame | None:
    """Distinct tombstoned doc_ids at ``pin`` (None = no deletes yet)."""
    if pin is None:
        return None
    df = _deletes(index).read(spark, version=pin)
    if df is None:
        return None
    return df.select("doc_id").distinct()


def changelog_mode(index, versions_from: dict, versions_to: dict) -> str:
    """'incremental' when the (from, to] window is append-only for both
    docstats and deletes (every from-segment still live at to), else
    'diff'.  Resolved from the snapshot JSON alone — no Spark job."""
    for table, key in ((index.docstats, "docstats"), (_deletes(index), "deletes")):
        segs_from = set(_pin_segments(table, versions_from.get(key)))
        segs_to = set(_pin_segments(table, versions_to.get(key)))
        if not segs_from <= segs_to:
            return "diff"
    return "incremental"


def _empty(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content_sha256 string, doclen int, change string",
    )


def _with_change(df: DataFrame, change: str) -> DataFrame:
    return df.select(*_META_COLS).withColumn("change", F.lit(change))


def index_changes(
    spark: SparkSession,
    index,
    versions_from: dict,
    versions_to: dict | None = None,
) -> DataFrame:
    """(docstats metadata…, change) for every doc whose LIVE-set
    membership differs between the two pins.

    ``versions_from`` / ``versions_to`` are per-table version dicts as
    produced by :func:`operators.timetravel.index_versions` (only the
    ``docstats`` and ``deletes`` keys matter; an absent key means the
    table had no commits at that time).  ``versions_to`` defaults to
    HEAD.  Pass the LIVE index (not an as-of view) — pins are explicit.
    """
    from .timetravel import index_versions

    if versions_to is None:
        versions_to = index_versions(index)
    pf, pt = versions_from.get("docstats"), versions_to.get("docstats")
    ds_from = (
        index.docstats.read(spark, version=pf) if pf is not None else None
    )
    ds_to = index.docstats.read(spark, version=pt) if pt is not None else None
    dead_from = _dead_ids(spark, index, versions_from.get("deletes"))
    dead_to = _dead_ids(spark, index, versions_to.get("deletes"))

    if ds_to is None and ds_from is None:
        return _empty(spark)

    if changelog_mode(index, versions_from, versions_to) == "incremental":
        # Iceberg incremental read: adds live ONLY in the window's new
        # docstats segments; removals ONLY in its new tombstone segments.
        new_ds = sorted(
            set(_pin_segments(index.docstats, pt))
            - set(_pin_segments(index.docstats, pf))
        )
        added = _read_segments(spark, new_ds)
        if added is not None:
            if dead_to is not None:
                added = added.join(dead_to, "doc_id", "left_anti")
            if ds_from is not None:
                # guard against a doc_id re-added while already present
                # (one column-pruned probe of the old pin; a clean
                # append window makes this a no-op join)
                added = added.join(
                    ds_from.select("doc_id"), "doc_id", "left_anti"
                )
        dt = _deletes(index)
        new_del = sorted(
            set(_pin_segments(dt, versions_to.get("deletes")))
            - set(_pin_segments(dt, versions_from.get("deletes")))
        )
        removed = None
        new_dead = _read_segments(spark, new_del)
        if new_dead is not None and ds_from is not None:
            new_dead = new_dead.select("doc_id").distinct()
            if dead_from is not None:
                # a doc already dead at `from` can reappear in a later
                # tombstone segment (delete_docs never dedups history)
                new_dead = new_dead.join(dead_from, "doc_id", "left_anti")
            removed = ds_from.join(new_dead, "doc_id", "left_semi")
    else:
        # a rewrite (compaction) broke append-only lineage: honest
        # live-set diff between the pins
        def live(ds, dead):
            if ds is None:
                return None
            return (
                ds.join(dead, "doc_id", "left_anti") if dead is not None else ds
            )

        live_from, live_to = live(ds_from, dead_from), live(ds_to, dead_to)
        added = removed = None
        if live_to is not None:
            added = (
                live_to.join(live_from.select("doc_id"), "doc_id", "left_anti")
                if live_from is not None
                else live_to
            )
        if live_from is not None:
            removed = (
                live_from.join(live_to.select("doc_id"), "doc_id", "left_anti")
                if live_to is not None
                else live_from
            )

    out = _empty(spark)
    if added is not None:
        out = out.unionByName(_with_change(added, "added"))
    if removed is not None:
        out = out.unionByName(_with_change(removed, "removed"))
    return out
