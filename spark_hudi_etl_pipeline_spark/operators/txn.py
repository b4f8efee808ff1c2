"""Atomic MULTI-TABLE transactions: a catalog manifest (a
manifest-of-manifests) above the per-table manifest protocol of
``operators/merge.py``.

The reference's pipelines write one Hudi table per run
(pipeline_architecture.py:179-194); real deployments keep FAMILIES of
tables consistent — a base table and its downstream aggregate, a fact
and its index table — and Hudi offers nothing cross-table (its OCC is
per-table). The lakehouse answer (Iceberg REST catalog / Project
Nessie / Delta commit coordinators) is a CATALOG whose single CAS'd
version maps each table name to a pinned per-table manifest version:

    stage data files per table               (invisible)
      → publish each table's manifest vN+1   (invisible to CATALOG readers)
      → CAS-publish catalog vM+1             ← THE one atomic commit point

Readers resolve every table through the catalog, so a crash anywhere
before the catalog CAS leaves them on version M — a consistent snapshot
of ALL tables; they can never observe table A post-transaction and
table B pre-transaction. The same ``os.link`` CREATE-IF-ABSENT CAS as
the per-table protocol arbitrates concurrent transactions (one winner
per catalog version; losers get :class:`ConcurrentCommitError` and
retry against the new catalog state).

Per-table writes under a catalog run with ``clean=False``: files
referenced by an older, still-cataloged manifest version must survive a
newer per-table publish (space is reclaimed by the retention-aware
orphan vacuum in ``operators/maintenance.py``, which honors manifests).

Scale (100 TB): everything here is metadata — a catalog version is one
tiny JSON object regardless of table sizes; the data path is the
unchanged O(affected files) indexed COW upsert. This is exactly why
production catalogs (Nessie, Iceberg REST) make multi-table commits a
catalog concern, not a data-file concern.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from .merge import (
    ConcurrentCommitError,
    _manifest_latest,
    upsert_parquet_indexed,
)

_CATALOG_DIR = "_catalog"
_MANIFEST_DIR = "_manifest"


def catalog_latest(root: str) -> tuple[int, dict[str, int]]:
    """Latest committed (catalog version, table → pinned manifest
    version), or ``(0, {})`` for a fresh catalog. Metadata-scale."""
    cdir = os.path.join(root, _CATALOG_DIR)
    if not os.path.isdir(cdir):
        return 0, {}
    versions = sorted(
        int(f[1:-5])
        for f in os.listdir(cdir)
        if f.startswith("v") and f.endswith(".json")
    )
    if not versions:
        return 0, {}
    v = versions[-1]
    with open(os.path.join(cdir, f"v{v}.json")) as fh:
        return v, {k: int(x) for k, x in json.load(fh)["tables"].items()}


def _catalog_publish(root: str, tables: dict[str, int], version: int) -> None:
    """CAS-publish catalog ``version`` — the transaction's single atomic
    commit point (same CREATE-IF-ABSENT protocol as the per-table
    manifest publish; conditional PUT on an object store)."""
    cdir = os.path.join(root, _CATALOG_DIR)
    os.makedirs(cdir, exist_ok=True)
    tmp = os.path.join(cdir, f".v{version}-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "tables": tables}, fh)
    try:
        os.link(tmp, os.path.join(cdir, f"v{version}.json"))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"catalog v{version} at {root!r} was published by a "
            "concurrent transaction; re-read the catalog and retry"
        ) from None
    finally:
        os.unlink(tmp)


def _read_manifest_version(path: str, version: int) -> list[str]:
    """Live data files of a SPECIFIC per-table manifest version (the
    catalog pins versions, not latest)."""
    mf = os.path.join(path, _MANIFEST_DIR, f"v{version}.json")
    with open(mf) as fh:
        return json.load(fh)["files"]


def read_table_at_catalog(
    spark, root: str, name: str, path: str
) -> DataFrame:
    """Snapshot-consistent read of table ``name`` THROUGH the catalog:
    scans exactly the files of the manifest version the latest committed
    catalog pins — newer per-table publishes that no catalog transaction
    has committed (torn/in-flight transactions) are invisible."""
    _, tables = catalog_latest(root)
    if name not in tables:
        raise KeyError(f"table {name!r} is not in the catalog at {root!r}")
    files = _read_manifest_version(path, tables[name])
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def txn_commit(
    spark,
    root: str,
    writes: list[tuple[str, str, DataFrame, str, str]],
    *,
    expected_catalog_version: int | None = None,
) -> int:
    """Apply every ``(name, path, batch, key, precombine)`` write as one
    atomic cross-table transaction; returns the committed catalog
    version.

    Each table's indexed COW upsert stages + publishes its OWN next
    manifest version (invisible to catalog readers), then ONE catalog
    CAS pins them all. ``expected_catalog_version`` is the optimistic
    read-set check: pass the version the batch was computed against and
    the commit fails fast if another transaction committed in between
    (serializable against lost updates, Hudi-OCC style); None skips the
    check (blind writes).

    A crash after any per-table publish but before the catalog CAS
    leaves orphan manifest versions that no catalog pins — harmless
    (catalog readers never resolve them) and reclaimed by the vacuum;
    re-running the transaction claims fresh versions.
    """
    cv, tables = catalog_latest(root)
    if (
        expected_catalog_version is not None
        and cv != expected_catalog_version
    ):
        raise ConcurrentCommitError(
            f"catalog at {root!r} moved from v{expected_catalog_version} "
            f"to v{cv} since this transaction's reads; retry against the "
            "new snapshot"
        )
    new_tables = dict(tables)
    for name, path, batch, key, precombine in writes:
        upsert_parquet_indexed(
            spark, batch, path, key, precombine, clean=False
        )
        m = _manifest_latest(path)
        assert m is not None  # the upsert above always publishes one
        new_tables[name] = m[0]
    _catalog_publish(root, new_tables, cv + 1)  # ← commit point
    return cv + 1
