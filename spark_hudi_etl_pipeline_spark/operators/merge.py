"""Keyed upsert with precombine — the reference's one non-built-in
semantic (SURVEY.md §1.4; pipeline_architecture.py:179-194, :241-256,
DDL :92-96).

Semantics reproduced exactly:

1. **Record key** identifies a row (single or composite).
2. **Upsert**: incoming batch merges into the table by key — insert if
   absent, overwrite if present.
3. **Precombine**: on key collision (within the batch or batch-vs-table)
   the row with the larger precombine value wins ("latest wins").
   The reference relies on Hudi's ``preCombineField``; here it is a
   window dedup + anti-join merge, pure Catalyst.
4. **Non-partitioned keys**: keys are global (reference :57, :186).

Hudi passthrough: when the Hudi spark bundle is on the classpath the
table can be written with ``format("hudi")`` and these exact options
(:func:`hudi_writer_options`); the pure-Spark path below is the primary
correctness path in this environment (SURVEY.md §7 risk register).

Scale design (100 TB table, small incremental batch):
- The batch-side window dedup shuffles only the batch (small).
- The merge join is an outer join table⋈batch on the key. With the table
  bucketed/clustered by key (how you'd lay out a 100 TB keyed table),
  Catalyst plans a broadcast join of the batch against bucketed scans —
  no table-side shuffle. COW file rewrite then touches only the files
  whose key ranges intersect the batch (what Hudi's index does); the
  parquet fallback here rewrites the table, which is correct-but-O(table)
  — exactly why production deployments flip on the Hudi connector, and
  why `merge_upsert` is also exposed as a pure DataFrame transform so the
  sink choice is orthogonal.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

PRECOMBINE_TIEBREAK = "__precombine_rn"


def precombine_batch(
    batch: DataFrame, keys: list[str], precombine: str,
    *, salt_buckets: int | None = None,
) -> DataFrame:
    """Collapse the batch to one row per key, keeping the row with the
    largest ``precombine`` value (Hudi preCombineField semantics,
    reference :95/:115). Deterministic under ties: arbitrary-but-stable
    via a monotonic tiebreak on all columns is avoided on purpose —
    Hudi's own tie behavior is unspecified; we keep the first by file
    order like Hudi's default payload.

    ``salt_buckets=N`` opts into a salted two-phase max-by for hot-key
    batches (r5 verdict ask #5): phase 1 reduces within ``(keys,
    salt)``, phase 2 reduces the ≤N survivors per key. Ties on the
    precombine value break by a row-content hash (a total order, needed
    so the two-phase result is well-defined); identical to the flat
    path whenever the precombine value is unique per key.

    MEASURED GUIDANCE (SCALE.md §hot-key upsert probe): leave this OFF
    on Spark 4 — the engine plans the ``rank<=1`` filter as
    ``WindowGroupLimit`` Partial/Final, a map-side top-1-per-key
    reduction BEFORE the shuffle, so a hot key arrives at its reducer
    already collapsed to ~one row per upstream task and the flat path
    beat salt_buckets=16 at every probed skew (the salted path pays a
    second shuffle for protection the engine already provides). The
    option exists for engines/paths without that rewrite, and because
    guessing was not acceptable: the probe is how we know.
    """
    if salt_buckets and salt_buckets > 1:
        tie = F.xxhash64(*[F.col(c) for c in batch.columns])
        salt = F.pmod(tie, F.lit(salt_buckets))
        w1 = Window.partitionBy(*keys, "__salt").orderBy(
            F.desc(precombine), F.asc("__tie")
        )
        w2 = Window.partitionBy(*keys).orderBy(
            F.desc(precombine), F.asc("__tie")
        )
        return (
            batch.withColumn("__tie", tie)
            .withColumn("__salt", salt)
            .withColumn(PRECOMBINE_TIEBREAK, F.row_number().over(w1))
            .filter(F.col(PRECOMBINE_TIEBREAK) == 1)
            .withColumn(PRECOMBINE_TIEBREAK, F.row_number().over(w2))
            .filter(F.col(PRECOMBINE_TIEBREAK) == 1)
            .drop(PRECOMBINE_TIEBREAK, "__salt", "__tie")
        )
    w = Window.partitionBy(*keys).orderBy(F.desc(precombine))
    return (
        batch.withColumn(PRECOMBINE_TIEBREAK, F.row_number().over(w))
        .filter(F.col(PRECOMBINE_TIEBREAK) == 1)
        .drop(PRECOMBINE_TIEBREAK)
    )


def align_schemas(
    existing: DataFrame, batch: DataFrame, *, skip: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """Schema evolution for the upsert path (the reference enables Hudi's
    ``hoodie.schema.on.read.enable`` at pipeline_architecture.py:54;
    README claims schema-evolution support at README.md:308).

    Returns both frames projected onto the UNION schema: columns the
    batch adds are appended (existing rows read them as NULL), columns
    the batch omits become NULL in the batch rows (whole-row upsert
    replace semantics), and a column present on both sides is cast to
    the table's type (no surprise type flips). Map-only — no shuffle.
    ``skip`` columns (the delete flag) stay batch-only."""
    etypes = {f.name: f.dataType for f in existing.schema.fields}
    btypes = {f.name: f.dataType for f in batch.schema.fields}
    new_cols = [c for c in batch.columns if c not in etypes and c not in skip]
    union_cols = existing.columns + new_cols
    existing2 = existing.select(
        *existing.columns,
        *[F.lit(None).cast(btypes[c]).alias(c) for c in new_cols],
    )
    batch2 = batch.select(
        *[
            (
                F.col(c).cast(etypes.get(c, btypes.get(c)))
                if c in btypes
                else F.lit(None).cast(etypes[c])
            ).alias(c)
            for c in union_cols
        ],
        *[F.col(c) for c in skip if c in batch.columns],
    )
    return existing2, batch2


def _write_parquet_counted(merged: DataFrame, path: str) -> int:
    """Overwrite-write ``merged`` to ``path`` and return its row count,
    counted by an Observation ON THE WRITE JOB itself — a trailing
    ``merged.count()`` on a lazy merge replays the whole precombine/
    merge pipeline a second time (r13 optimization round)."""
    obs = Observation()
    merged.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(path)
    return int(obs.get["n"])


def merge_upsert(
    existing: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    precombine: str,
    *,
    delete_col: str | None = None,
    evolve_schema: bool = False,
    partial_update: bool = False,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Pure-DataFrame upsert: returns the post-merge table contents.

    ``salt_buckets=N`` salts the in-batch precombine window for hot-key
    batches (see :func:`precombine_batch`); every other stage of the
    merge is key-unique on both sides, so the window is the only skew
    surface. The merge result is identical whenever the precombine
    value is unique per key (ties instead break by row-content hash).

    ``existing=None`` models first write. Batch rows always beat existing
    rows with equal precombine values (Hudi upsert overwrite semantics —
    an update with the same precombine still wins).

    ``delete_col`` names a boolean batch column with Hudi's
    ``_hoodie_is_deleted`` semantics: a batch row whose flag is true is a
    *delete record* — it competes by precombine like any other row, and if
    it wins the key is removed from the table (a stale delete loses to a
    newer existing row and is ignored). The flag column never lands in
    the output.

    ``evolve_schema=True`` reproduces Hudi's schema-on-read evolution
    (:func:`align_schemas`): batches may add or omit non-key columns;
    without it, a batch must match the table schema exactly.

    ``partial_update=True`` is Hudi's ``PartialUpdateAvroPayload``
    (partial-column upsert): a WINNING batch row's NULL non-key fields
    keep the existing row's values instead of nulling them — the
    sparse-update pattern where each source system owns a column subset.
    The fill is one extra join of the (small) winning-batch rows against
    the table slice holding their keys — semi-join pruned, the table is
    never shuffled. Within a batch, precombine still picks ONE row per
    key first (field-level in-batch combining is not Hudi's default
    either). A NULL written on purpose is indistinguishable from
    "absent" — the payload's documented semantic; use a sentinel or
    schema evolution to genuinely null a field.
    """
    # Key/precombine columns are the record identity — a batch without
    # them cannot be upserted. Hudi rejects key-less records loudly;
    # silently letting align_schemas NULL-fill them would collapse every
    # batch row into one NULL-key group (data corruption), so fail first.
    required = [c for c in [*keys, precombine] if c not in batch.columns]
    if required:
        raise ValueError(
            f"batch is missing key/precombine column(s) {required}; "
            "schema evolution applies only to non-identity columns"
        )
    if delete_col is not None and delete_col in (existing.columns if existing is not None else []):
        raise ValueError(f"delete flag {delete_col!r} must not exist in the table")
    if evolve_schema and existing is not None:
        existing, batch = align_schemas(
            existing, batch, skip=(delete_col,) if delete_col else ()
        )
    deduped = precombine_batch(
        batch, keys, precombine, salt_buckets=salt_buckets
    )
    if existing is None:
        if delete_col is not None:
            deduped = deduped.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        return deduped
    batch_cols = existing.columns + ([delete_col] if delete_col is not None else [])
    deduped = deduped.select(*batch_cols)  # align column order
    # deduped feeds four consumers (b_prec, existing_keep's broadcast,
    # beaten_keys, batch_keep) — lazily that replays the window-dedup
    # subtree per consumer (observed: 18 Window nodes in the plan).
    # The batch is the small side by contract, so materialize it once.
    deduped = deduped.localCheckpoint(eager=True)
    # Both sides are unique per key here (batch via precombine_batch,
    # table by upsert invariant), so one left join per side annotates each
    # row with the other side's precombine value. The batch side is the
    # small one → Catalyst broadcasts it against the (bucketed, at scale)
    # table scan; no table-side shuffle.
    b_prec = deduped.select(*keys, F.col(precombine).alias("__b_prec"))
    existing_keep = (
        existing.join(F.broadcast(b_prec), on=keys, how="left")
        .filter(F.col("__b_prec").isNull() | (F.col(precombine) > F.col("__b_prec")))
        .drop("__b_prec")
    )
    # Batch rows lose only to a strictly-newer existing row. beaten_keys
    # is computed table-side with the same broadcast (so the big table is
    # never shuffled) and is itself ⊆ batch keys → small → broadcast back.
    beaten_keys = (
        existing.join(F.broadcast(b_prec), on=keys, how="inner")
        .filter(F.col(precombine) > F.col("__b_prec"))
        .select(*keys)
    )
    batch_keep = deduped.join(F.broadcast(beaten_keys), on=keys, how="left_anti")
    if partial_update:
        non_keys = [
            c for c in existing.columns if c not in keys and c != precombine
        ]
        # Old values for exactly the winning batch keys: the semi join
        # prunes the table scan to those keys (broadcast batch side — the
        # table is never shuffled); the fill join then runs small × small.
        old_vals = existing.join(
            F.broadcast(batch_keep.select(*keys)), on=keys, how="left_semi"
        ).select(*keys, *[F.col(c).alias(f"__old_{c}") for c in non_keys])
        batch_keep = (
            batch_keep.join(F.broadcast(old_vals), on=keys, how="left")
            .select(
                *keys,
                F.col(precombine),
                *[
                    F.coalesce(F.col(c), F.col(f"__old_{c}")).alias(c)
                    for c in non_keys
                ],
                *([F.col(delete_col)] if delete_col is not None else []),
            )
            .select(*batch_cols)  # restore the table's column order
        )
    if delete_col is not None:
        # Winning delete records remove their key: the existing row is
        # already excluded above (batch won), and the delete record itself
        # must not land in the table.
        batch_keep = batch_keep.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return existing_keep.unionByName(batch_keep)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert: dict[str, str] | bool = True,
    when_not_matched_by_source_update: dict[str, str] | None = None,
    when_not_matched_by_source_delete: str | None = None,
) -> DataFrame:
    """ANSI ``MERGE INTO`` semantics as a pure DataFrame transform (the
    SQL surface Hudi/Delta expose over their upsert machinery; Hudi
    supports it from Spark SQL — reference users writing MERGE INTO on
    their tables get this exact behavior):

    - matched + ``when_matched_delete`` condition true → row removed;
    - matched otherwise → ``when_matched_update`` SET expressions applied
      (each value is a SQL expression over aliases ``t`` (target row)
      and ``s`` (source row)); None keeps the target row unchanged;
    - source rows matching no target → inserted; ``True`` inserts the
      source's values for the target's columns, a dict gives per-column
      expressions over ``s``, ``False`` drops them;
    - target rows matching no source (Spark 3.4+ / Delta ``WHEN NOT
      MATCHED BY SOURCE``, the full-sync form): with
      ``when_not_matched_by_source_delete`` (a condition over ``t``;
      ``'true'`` = unconditional) they are removed — the dimension-sync
      delete — and with ``when_not_matched_by_source_update`` their SET
      expressions apply (delete wins when both are given and the delete
      condition holds); with neither, they pass through unchanged.

    Cardinality rule enforced like Delta/Hudi: a target row matched by
    MORE THAN ONE source row is a runtime error (``raise_error`` inside
    the plan — fails on execution, not silently nondeterministic).

    One full-outer join on the merge keys — with the source small (the
    normal MERGE shape) Catalyst broadcasts it and the target never
    shuffles; both-sides-big degrades to one SMJ shuffle each, the same
    cost Hudi pays. Delete/update conditions are plain expressions, so
    pushdown/codegen apply.
    """
    from pyspark.sql import Window

    t_cols = target.columns
    dup_w = Window.partitionBy(*on)
    src = (
        source.withColumn("__src_n", F.count(F.lit(1)).over(dup_w))
        .withColumn("__src", F.lit(True))
    )
    joined = (
        target.alias("t")
        .withColumn("__tgt", F.lit(True))
        .join(src.alias("s"), on=on, how="full_outer")
    )
    matched = F.col("__tgt").isNotNull() & F.col("__src").isNotNull()
    # Cardinality violation: raises at execution time (the MERGE
    # contract: nondeterministic multi-match must fail loudly, not pick
    # a winner). assert_true yields NULL when the predicate holds;
    # folded into the row filter so it is evaluated for every row.
    no_multi = F.coalesce(
        F.assert_true(
            ~(matched & (F.col("__src_n") > 1)),
            F.lit("MERGE INTO: a target row is matched by multiple source rows"),
        ).cast("boolean"),
        F.lit(True),
    )

    def tcol(c: str) -> Column:
        return F.col(c) if c in on else F.col(f"t.{c}")

    nmbs_del_cond = (
        F.expr(when_not_matched_by_source_delete)
        if when_not_matched_by_source_delete is not None
        else F.lit(False)
    )
    nmbs_update_exprs = {
        c: F.expr(e) for c, e in (when_not_matched_by_source_update or {}).items()
    }

    delete_cond = (
        F.expr(when_matched_delete) if when_matched_delete is not None else F.lit(False)
    )
    update_exprs = {
        c: F.expr(e) for c, e in (when_matched_update or {}).items()
    }
    out_cols = []
    for c in t_cols:
        upd = update_exprs.get(c, tcol(c))
        if c in on:
            # Key columns always come from the (coalesced) join key —
            # an insert row's identity IS its source key.
            ins = F.col(c)
        elif when_not_matched_insert is False:
            ins = F.lit(None)
        elif when_not_matched_insert is True:
            ins = F.col(f"s.{c}")
        else:
            ins = (
                F.expr(when_not_matched_insert[c])
                if c in when_not_matched_insert
                else F.lit(None)
            )
        out_cols.append(
            F.when(matched, upd)
            .when(F.col("__tgt").isNotNull(), nmbs_update_exprs.get(c, tcol(c)))
            .otherwise(ins)
            .alias(c)
        )
    # ANSI MERGE / Delta semantics: a NULL delete condition is
    # NOT-satisfied (the update arm applies), so coalesce to False —
    # a bare ~NULL filter would silently drop the row instead.
    keep = (
        F.when(matched, ~F.coalesce(delete_cond, F.lit(False)))
        # unmatched target: NOT MATCHED BY SOURCE delete (NULL condition
        # = not satisfied, same rule as the matched delete arm)
        .when(
            F.col("__tgt").isNotNull(),
            ~F.coalesce(nmbs_del_cond, F.lit(False)),
        )
        .otherwise(F.lit(when_not_matched_insert is not False))
    )
    return joined.filter(keep & no_multi).select(*out_cols)


def upsert_parquet(
    spark,
    batch: DataFrame,
    path: str,
    keys: list[str],
    precombine: str,
    *,
    delete_col: str | None = None,
    evolve_schema: bool = False,
    partial_update: bool = False,
) -> int:
    """Materializing upsert sink (reference R7 write_hudi_table,
    :238-260, re-expressed): merge ``batch`` into the parquet table at
    ``path``; returns rows written. Read-modify-write with an overwrite
    commit; single atomic directory swap via a staging write because
    parquet has no transaction log (Hudi/Delta would make this a real
    ACID commit — connector passthrough point).

    ``evolve_schema=True`` = Hudi ``hoodie.schema.on.read.enable``
    passthrough semantics: the table schema widens to the batch's new
    columns (see :func:`align_schemas`).
    """
    try:
        existing = spark.read.parquet(path)
    except Exception:  # first write: path absent
        existing = None
    merged = merge_upsert(
        existing, batch, keys, precombine,
        delete_col=delete_col, evolve_schema=evolve_schema,
        partial_update=partial_update,
    )
    if existing is not None:
        # Materialize the merge before overwriting the files we read.
        merged = merged.localCheckpoint(eager=True)
    return _write_parquet_counted(merged, path)


def upsert_parquet_partitioned(
    spark,
    batch: DataFrame,
    path: str,
    keys: list[str],
    precombine: str,
    partition_col: str,
    *,
    delete_col: str | None = None,
) -> int:
    """Partition-pruned upsert sink: merge ``batch`` into a hive-layout
    parquet table partitioned by ``partition_col``, touching ONLY the
    partitions the batch lands in. This is the scale path the reference
    delegates to Hudi's partitioned COW writer + index
    (pipeline_architecture.py:183-192 — ``hoodie.datasource.write``
    upsert on a keyed table): a 100 TB table with a 1 GB incremental
    batch reads and rewrites O(batch partitions), never O(table).

    Semantics follow Hudi's default **non-global** index
    (``hoodie.index.type=SIMPLE/BLOOM``): record keys are unique *within*
    a partition, so the merge key is ``keys + [partition_col]`` and a
    batch row whose key exists in a different partition inserts rather
    than moves (a global-index variant would first resolve key →
    partition with one extra join against the key index).

    Execution shape, in order:

    1. *Index lookup*: the batch's distinct partition values — a
       driver-side list bounded by the number of touched partitions
       (what Hudi reads from its index), not by batch rows.
    2. *Pruned read*: the existing table filtered with
       ``partition_col IN (touched)`` — Catalyst turns this into
       ``PartitionFilters``, so untouched partitions are never scanned.
    3. :func:`merge_upsert` of the pruned slice against the batch.
    4. *Pruned commit*: ``partitionOverwriteMode=dynamic`` overwrite —
       only partitions present in the merge output are replaced; a
       touched partition emptied by delete records is dropped explicitly
       (dynamic overwrite leaves absent partitions alone — that is the
       point — so the empty case is the one manual commit step).

    Returns rows written into the touched partitions.
    """
    first_write = False
    try:
        spark.read.parquet(path)
    except Exception:  # first write: path absent
        first_write = True
    if first_write:
        merged = merge_upsert(
            None, batch, keys + [partition_col], precombine, delete_col=delete_col
        )
        obs = Observation()
        merged.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).partitionBy(partition_col).parquet(path)
        return int(obs.get["n"])

    touched = [
        r[0] for r in batch.select(partition_col).distinct().collect()
    ]
    if any(v is None for v in touched):
        raise ValueError(
            f"null partition value in batch column {partition_col!r} — "
            "Hudi-style partition paths require a non-null partition key"
        )
    existing_sub = spark.read.parquet(path).filter(
        F.col(partition_col).isin(touched)
    )
    merged = merge_upsert(
        existing_sub,
        batch,
        keys + [partition_col],
        precombine,
        delete_col=delete_col,
    )
    # We overwrite the very files the merge reads — materialize first.
    merged = merged.localCheckpoint(eager=True)

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    if delete_col is not None:
        # A partition whose every row was deleted produces no output rows,
        # so dynamic overwrite never visits it — drop its directory as the
        # commit step (Hudi records this tombstone in the timeline).
        import shutil

        remaining = {
            r[0] for r in merged.select(partition_col).distinct().collect()
        }
        for value in set(touched) - remaining:
            shutil.rmtree(f"{path}/{partition_col}={value}", ignore_errors=True)
    return merged.count()


# ---------------------------------------------------------------------------
# Manifest commit protocol (shared by the file-indexed and bloom-indexed
# COW writers): the commit point is publishing manifest version N+1 — a
# single new immutable object — never a directory mutation.
#
#   write new data files (unique names; invisible until referenced)
#     → publish _manifest/vN+1.json        ← THE atomic commit point
#     → best-effort clean of replaced files (post-commit, a cleaner's job)
#
# Readers resolve the live file set from the LATEST manifest, so a crash
# at any point leaves them on version N (old complete state) or N+1 (new
# complete state) — never a torn mix. On POSIX the publish is an atomic
# rename; on an object store each manifest version is a fresh single-PUT
# key (rename-free), which is exactly Hudi's .hoodie instant-file commit
# and Delta's _delta_log JSON protocol. Pre-manifest tables (plain
# directories) fall back to the directory listing and are migrated on
# their first manifest commit.
# ---------------------------------------------------------------------------

_MANIFEST_DIR = "_manifest"  # underscore prefix: invisible to table scans


class ConcurrentCommitError(RuntimeError):
    """Another writer published the manifest version this commit was
    about to claim (optimistic concurrency, Hudi
    ``hoodie.write.concurrency.mode=optimistic_concurrency_control``):
    the caller must re-read the latest manifest and retry the whole
    merge against it — its file-affectedness decisions were computed
    from a stale table version."""


def _manifest_latest(path: str) -> tuple[int, list[str]] | None:
    """Latest committed (version, live data files) at ``path``, or None
    for pre-manifest tables. Metadata-scale: one small JSON read."""
    import json
    import os

    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    versions = sorted(
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    )
    if not versions:
        return None
    v = versions[-1]
    with open(os.path.join(mdir, f"v{v}.json")) as fh:
        return v, json.load(fh)["files"]


def _manifest_publish(path: str, files: list[str], version: int) -> None:
    """Atomically publish manifest ``version`` referencing ``files`` —
    the commit point: everything before it is invisible to readers,
    everything after it is cleanup.

    The publish is a CREATE-IF-ABSENT, not a blind rename: ``os.link``
    fails with EEXIST when another writer already claimed this version,
    which is exactly optimistic concurrency control — each manifest
    version can be won by ONE writer, the loser gets
    :class:`ConcurrentCommitError` and must retry its merge from the new
    latest manifest (its affected-file analysis is stale). On an object
    store the same CAS is a conditional PUT (`If-None-Match: *`); Hudi's
    OCC takes a lock around its instant-file creation for stores without
    one."""
    import json
    import os
    import uuid

    mdir = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".v{version}-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": sorted(files)}, fh)
    try:
        os.link(tmp, os.path.join(mdir, f"v{version}.json"))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"manifest v{version} at {path!r} was published by a "
            "concurrent writer; re-read the latest manifest and retry "
            "the merge"
        ) from None
    finally:
        os.unlink(tmp)


def manifest_files_at(path: str, version: int) -> list[str]:
    """Live data files of a SPECIFIC committed manifest version — the
    read side of version pinning (catalog pins in ``operators/txn.py``,
    branch heads, time travel over manifests). Metadata-scale."""
    import json
    import os

    mf = os.path.join(path, _MANIFEST_DIR, f"v{version}.json")
    with open(mf) as fh:
        return json.load(fh)["files"]


def table_live_files(path: str) -> tuple[int, list[str]]:
    """(manifest version, live data files) — latest manifest when one
    exists, else (0, directory listing) for pre-manifest tables."""
    import glob
    import os

    m = _manifest_latest(path)
    if m is not None:
        return m
    return 0, sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )


def read_indexed_table(spark, path: str) -> DataFrame:
    """Manifest-consistent read of an indexed COW table: only files the
    latest committed manifest references are scanned, so readers never
    observe a torn commit (orphaned pre-crash files are invisible)."""
    import os

    _, files = table_live_files(path)
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def _commit_staged(
    spark, path: str, staging: str, version: int, kept: list[str],
    *, clean: bool = True,
) -> tuple[list[str], int]:
    """Shared commit tail: move staged part files in under unique names
    (pre-commit — invisible until referenced), publish manifest
    ``version`` over ``kept`` + the new files (THE commit point), then
    best-effort-clean files the new manifest no longer references.
    Returns (new file basenames, rows written)."""
    import glob
    import os
    import shutil
    import uuid

    moved = []
    try:
        for i, f in enumerate(sorted(glob.glob(f"{staging}/*.parquet"))):
            dest = os.path.join(
                path, f"part-upsert-{uuid.uuid4().hex}-{i:05d}.parquet"
            )
            shutil.move(f, dest)
            moved.append(os.path.basename(dest))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    live = sorted(set(kept) | set(moved))
    _manifest_publish(path, live, version)  # ← commit point
    # Post-commit cleaner (Hudi's hoodie.clean.automatic): replaced files
    # are unreferenced by the new manifest; removing them is best-effort
    # hygiene, not correctness — a crash here leaves orphans that every
    # manifest-based read ignores. clean=False preserves files referenced
    # by OLDER manifest versions — required when a catalog pins an earlier
    # version (operators/txn.py); those tables are reclaimed by the
    # retention-aware orphan vacuum instead.
    if clean:
        for f in glob.glob(os.path.join(path, "*.parquet")):
            if os.path.basename(f) not in live:
                try:
                    os.remove(f)
                except OSError:
                    pass
    n_written = (
        spark.read.parquet(*[os.path.join(path, m) for m in moved]).count()
        if moved
        else 0
    )
    return moved, n_written


class IndexedUpsertResult(NamedTuple):
    """What an indexed upsert committed: row count plus THE manifest
    version this write published. Callers that pin versions (the
    multi-table catalog in ``operators/txn.py``) must use ``version``
    rather than re-reading the latest manifest — a concurrent publish
    landing between the upsert's commit and a re-read would be silently
    adopted otherwise."""

    rows_written: int
    version: int


def upsert_parquet_indexed(
    spark,
    batch: DataFrame,
    path: str,
    key: str,
    precombine: str,
    *,
    delete_col: str | None = None,
    clean: bool = True,
    base_version: int | None = None,
) -> IndexedUpsertResult:
    """File-level indexed upsert: merge ``batch`` into a flat (non-hive)
    parquet directory rewriting ONLY the files whose footer key range
    intersects a batch key — Hudi's indexed COW write
    (``hoodie.index.type=SIMPLE``: key-range pruning from file
    statistics; pipeline_architecture.py:183-192 relies on exactly this
    to make upserts O(affected files) on a non-partitioned keyed table,
    DDL :92-96).

    The index IS the parquet footers (min/max of ``key`` per file,
    footer-only reads); file affectedness is decided with a broadcast
    range join of the file-bounds relation (tiny) against the batch's
    distinct keys — the batch itself never reaches the driver. Files the
    batch cannot touch keep their bytes and mtimes. Inserts whose keys
    fall outside every file's range rewrite nothing — they land as one
    new file.

    Effectiveness tracks layout tightness: on a
    :func:`~..operators.clustering.cluster_linear`-by-key layout
    (disjoint ranges — how a keyed table should be clustered, and what
    Hudi clustering maintains) the rewrite is O(batch key span); on an
    unclustered layout every file may overlap and the write degrades to
    the full rewrite of :func:`upsert_parquet`, correctly.

    Commit protocol: the manifest publish is the atomic commit point
    (see the manifest-protocol block above) — object-store-safe by
    construction; readers via :func:`read_indexed_table` can never see a
    torn mix of old and new files.

    Single-column key (the range index is one-dimensional); returns
    :class:`IndexedUpsertResult` — (rows written, THE manifest version
    this call published). Version-pinning callers must use that version,
    never a post-hoc re-read of the latest manifest.

    ``base_version`` merges against THAT committed manifest version's
    file set instead of the latest (still publishing at latest+1 — the
    version sequence is pure allocation; lineage lives in whoever pins
    the result, e.g. a catalog branch head in ``operators/txn.py``).
    This is what lets two branches write the same table without seeing
    each other: each merges from its own pinned snapshot.
    """
    import os
    import uuid

    from .clustering import file_column_bounds

    if not os.path.isdir(path):
        merged = merge_upsert(None, batch, [key], precombine, delete_col=delete_col)
        n = _write_parquet_counted(merged, path)
        version, live = table_live_files(path)
        _manifest_publish(path, live, version + 1)
        return IndexedUpsertResult(n, version + 1)

    version, live_files = table_live_files(path)
    if base_version is not None and base_version != version:
        live_files = manifest_files_at(path, base_version)
        # The post-commit cleaner keys off the NEW manifest alone; with a
        # non-latest base it would delete files other versions (other
        # branch heads) still reference. Never clean on a branched write.
        clean = False
    bounds = [
        b
        for b in file_column_bounds(path, [key], files=live_files)
        if b[key][0] is not None
    ]
    files_df = spark.createDataFrame(
        [(b["file"], b[key][0], b[key][1]) for b in bounds],
        f"file string, lo {batch.schema[key].dataType.simpleString()}, "
        f"hi {batch.schema[key].dataType.simpleString()}",
    )
    affected = [
        r["file"]
        for r in (
            batch.select(F.col(key).alias("__bk"))
            .distinct()
            .join(
                F.broadcast(files_df),
                (F.col("__bk") >= F.col("lo")) & (F.col("__bk") <= F.col("hi")),
            )
            .select("file")
            .distinct()
            .collect()
        )
    ]
    if affected:
        existing_sub = spark.read.parquet(
            *[os.path.join(path, f) for f in affected]
        )
        merged = merge_upsert(
            existing_sub, batch, [key], precombine, delete_col=delete_col
        )
    else:
        merged = merge_upsert(
            None, batch, [key], precombine, delete_col=delete_col
        )
    # Stage (the merge reads the files it replaces, so the staging write
    # doubles as materialization) → manifest commit → clean.
    staging = f"{path}/.staging-{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(staging)
    kept = [f for f in live_files if f not in set(affected)]
    _, n_written = _commit_staged(
        spark, path, staging, version + 1, kept, clean=clean
    )
    return IndexedUpsertResult(n_written, version + 1)


#: Bloom-index sizing: 65536 bits (8 KiB) / 5 hashes per file ⇒ <0.5%
#: false-positive rate at ~5000 distinct keys per file (Hudi's dynamic
#: bloom targets the same regime). A false positive only costs an extra
#: file rewrite; false negatives are impossible (bloom property).
BLOOM_BITS = 65536
BLOOM_HASHES = 5
_BLOOM_DIR = "_bloom"  # underscore prefix: invisible to parquet scans


def _bloom_positions(key_col):
    """Array of BLOOM_HASHES bit positions for one key (xxhash64 seeded
    by hashing the seed literal alongside the key)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key_col, F.lit(s)), F.lit(BLOOM_BITS))
            for s in range(BLOOM_HASHES)
        ]
    )


def _bloom_words(file_keys: DataFrame, key: str) -> DataFrame:
    """Fold a (file, key) relation into per-file bloom bitsets stored as
    a sparse (file, word_idx, word) relation — ≤ BLOOM_BITS/64 rows per
    file regardless of row count (the aggregate is the index build)."""
    p = file_keys.select("file", F.explode(_bloom_positions(F.col(key))).alias("pos"))
    return (
        p.select(
            "file",
            F.expr("pos div 64").cast("int").alias("word_idx"),
            # shiftleft's bit-count argument must be a column here, which
            # the Python F.shiftleft API doesn't accept — SQL form.
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("file", "word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def _table_bloom_words(spark, path: str, key: str, files: list[str] | None = None) -> DataFrame:
    """Bloom words for ``files`` of the table (all files when None),
    reading only the key column (column-pruned scan).

    Every file additionally gets one marker row (word_idx = -1, word = 0)
    so that EMPTY data files — a commit's writer can emit zero-row part
    files — still appear in the sidecar: the sidecar-vs-listing
    validation on load compares file sets, and a perpetually-absent
    empty file would force a cold rebuild on every upsert. Markers can
    never match a probe (probe word_idx ≥ 0)."""
    import glob
    import os

    if files is None:
        files = sorted(
            os.path.basename(f)
            for f in glob.glob(os.path.join(path, "*.parquet"))
        )
    src = spark.read.parquet(*[os.path.join(path, f) for f in files])
    keyed = src.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"),
        F.col(key),
    )
    markers = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).select(
        "file",
        F.lit(-1).cast("int").alias("word_idx"),
        F.lit(0).cast("long").alias("word"),
    )
    return _bloom_words(keyed, key).unionByName(markers)


def _bloom_probe_files(words: DataFrame, probe_keys: DataFrame, key: str) -> list[str]:
    """Files whose bloom bitset MIGHT contain a probe key: broadcast the
    tiny word relation against the distinct keys, a file matches a key
    when all BLOOM_HASHES bits are set. Returns file basenames (the only
    thing that reaches the driver — Hudi's index lookup contract)."""
    probe = (
        probe_keys.select(F.col(key).alias("__bk"))
        .distinct()
        .select(
            "__bk", F.posexplode(_bloom_positions(F.col("__bk"))).alias("seed", "pos")
        )
        .select(
            "__bk",
            "seed",
            F.expr("pos div 64").cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
    )
    return [
        r["file"]
        for r in (
            probe.join(F.broadcast(words), on="word_idx")
            .filter(F.col("word").bitwiseAND(F.col("mask")) != 0)
            .groupBy("file", "__bk")
            .agg(F.countDistinct("seed").alias("nbits"))
            .filter(F.col("nbits") == BLOOM_HASHES)
            .select("file")
            .distinct()
            .collect()
        )
    ]


def _valid_sidecar_words(
    spark, path: str, live_files: list[str], *, sidecar_dir: str = _BLOOM_DIR
) -> DataFrame | None:
    """The bloom sidecar relation if present AND consistent with the
    manifest's live file set (see the crash-recovery rationale in
    :func:`upsert_parquet_bloom_indexed`), else None."""
    import os

    sidecar = os.path.join(path, sidecar_dir)
    if not os.path.isdir(sidecar):
        return None
    candidate = spark.read.parquet(sidecar)
    sidecar_files = {
        r["file"] for r in candidate.select("file").distinct().collect()
    }
    return candidate if sidecar_files == set(live_files) else None


def build_secondary_index(spark, path: str, col: str) -> int:
    """Secondary bloom index on a NON-key column (Hudi 1.0's secondary
    index): per-file bloom bitsets over ``col``'s values, stored in a
    ``_bloom_<col>`` sidecar with the same sparse word layout as the
    record-key index. Point lookups on ``col`` then prune files through
    :func:`read_point_lookup` even though the table is laid out (and
    range/bloom-indexed) by its record key — the query pattern a keyed
    layout can't serve ("orders of customer X" on a table clustered by
    order id).

    Built with one column-pruned scan of the manifest-live files
    (O(table · 1 column)); like Hudi's async indexer this is a table
    service, re-run (or validated-and-rebuilt on manifest mismatch —
    the same self-heal as the primary index) after commits. Returns the
    number of files indexed."""
    import os

    _, live_files = table_live_files(path)
    if not live_files:
        raise FileNotFoundError(f"no data files at {path!r}")
    words = _table_bloom_words(spark, path, col, live_files)
    words.write.mode("overwrite").parquet(
        os.path.join(path, f"{_BLOOM_DIR}_{col}")
    )
    return len(live_files)


def read_point_lookup(
    spark, path: str, key: str, values: list, *, primary: bool = True
) -> DataFrame:
    """Index-accelerated point read of a keyed COW table: scan ONLY the
    files that can contain the requested key values — the read-path twin
    of the write-side index pruning (Hudi serves point lookups through
    the same bloom/column-stats metadata). Pruning source, best first:

    1. the ``_bloom`` sidecar (when present and manifest-consistent) —
       per-key membership, survives hash-scattered layouts;
    2. parquet footer min/max ranges — effective on a
       ``cluster_linear``-by-key layout;
    3. no index ⇒ the full manifest-consistent file set (correct,
       unpruned).

    The residual ``key IN (values)`` filter always applies (bloom false
    positives, range overlap), so results are exact regardless of which
    index pruned. Returns an empty-but-typed frame when pruning
    eliminates every file.

    ``key`` may also be a NON-key column carrying a secondary index
    (:func:`build_secondary_index`): pass ``primary=False`` — the
    column-specific ``_bloom_<col>`` sidecar is used (else footer
    ranges), and the bare ``_bloom`` sidecar is deliberately NOT
    consulted: it holds record-key bits, and probing it with another
    column's values would yield bloom false NEGATIVES — silently missing
    rows, not just weaker pruning."""
    import os

    from .clustering import file_column_bounds

    _, live_files = table_live_files(path)
    if not live_files:
        raise FileNotFoundError(f"no data files at {path!r}")
    probe_df = spark.createDataFrame(
        [(v,) for v in values],
        spark.read.parquet(os.path.join(path, live_files[0])).select(key).schema,
    )
    # Exact record-level index first (primary lookups only — the RLI
    # maps the RECORD key): no false positives, minimal file set.
    if primary:
        rli = _valid_rli(spark, path, live_files)
        if rli is not None:
            candidates = [
                r["file"]
                for r in (
                    rli.join(F.broadcast(probe_df), on=key, how="left_semi")
                    .select("file")
                    .distinct()
                    .collect()
                )
            ]
            reader = spark.read.parquet(
                *[os.path.join(path, f) for f in (candidates or [live_files[0]])]
            )
            out = reader.filter(F.col(key).isin(values))
            return out.limit(0) if not candidates else out
    words = _valid_sidecar_words(
        spark, path, live_files, sidecar_dir=f"{_BLOOM_DIR}_{key}"
    )
    if words is None and primary:
        words = _valid_sidecar_words(spark, path, live_files)
    if words is not None:
        candidates = _bloom_probe_files(words, probe_df, key)
    else:
        bounds = [
            b
            for b in file_column_bounds(path, [key], files=live_files)
            if b[key][0] is not None
        ]
        if bounds:
            candidates = [
                b["file"]
                for b in bounds
                if any(b[key][0] <= v <= b[key][1] for v in values)
            ]
        else:
            candidates = list(live_files)
    reader = spark.read.parquet(
        *[os.path.join(path, f) for f in (candidates or [live_files[0]])]
    )
    out = reader.filter(F.col(key).isin(values))
    # Empty candidate set: the filter on one real file yields the right
    # (empty) result with the table's schema.
    return out.limit(0) if not candidates else out


def upsert_parquet_bloom_indexed(
    spark,
    batch: DataFrame,
    path: str,
    key: str,
    precombine: str,
    *,
    delete_col: str | None = None,
) -> int:
    """Bloom-indexed COW upsert — Hudi's DEFAULT index type
    (``hoodie.index.type=BLOOM``; pipeline_architecture.py:183-192 runs
    its upserts against exactly this index): each data file carries an
    8 KiB bloom bitset over its record keys, a batch rewrites only the
    files whose bloom *might* contain a batch key, and — unlike the
    key-range SIMPLE index of :func:`upsert_parquet_indexed` — pruning
    survives an UNCLUSTERED layout: membership is per-key, not per-range,
    so scattered keys still skip every file they can't be in.

    The index lives in a ``_bloom`` sidecar relation (underscore-prefixed
    ⇒ invisible to table scans; Hudi stores the same bits in file footers
    / its metadata table), maintained incrementally: only files written
    by this commit get their blooms (re)computed, O(batch), never
    O(table). Probing is a broadcast join of the tiny word relation
    against the batch's distinct keys — a file is affected when all
    BLOOM_HASHES bits of some batch key are set — so neither the batch
    nor the table ever reaches the driver (only the affected-file NAME
    list does, as with Hudi's index lookup).

    Commit protocol: the manifest publish is the atomic commit point
    (see the manifest-protocol block above); the sidecar is updated
    post-commit and validated against the manifest on load, so a crash
    anywhere leaves readers consistent and at worst costs one cold
    index rebuild.
    """
    import os
    import uuid

    sidecar = os.path.join(path, _BLOOM_DIR)

    if not os.path.isdir(path):
        merged = merge_upsert(None, batch, [key], precombine, delete_col=delete_col)
        n = _write_parquet_counted(merged, path)
        version, live = table_live_files(path)
        _manifest_publish(path, live, version + 1)
        _table_bloom_words(spark, path, key, live).write.mode(
            "overwrite"
        ).parquet(sidecar)
        return n

    version, live_files = table_live_files(path)
    # Load the sidecar only if its file set matches the manifest's live
    # set (metadata-scale check): a crash between the manifest publish
    # and the sidecar rewrite leaves a stale sidecar whose missing
    # entries for new files yield bloom FALSE NEGATIVES — a later upsert
    # would skip those files and write duplicate keys. On any mismatch,
    # fall back to the cold rebuild (one column-pruned key scan over the
    # manifest-listed files; orphaned pre-crash files are ignored).
    words = _valid_sidecar_words(spark, path, live_files)
    if words is None:
        words = _table_bloom_words(spark, path, key, live_files)  # cold (re)build
    # Materialize now (metadata-scale): the commit below deletes data
    # files and overwrites the sidecar this lazy plan reads from.
    words = words.localCheckpoint(eager=True)
    affected = _bloom_probe_files(words, batch, key)
    if affected:
        existing_sub = spark.read.parquet(*[os.path.join(path, f) for f in affected])
        merged = merge_upsert(existing_sub, batch, [key], precombine, delete_col=delete_col)
    else:
        merged = merge_upsert(None, batch, [key], precombine, delete_col=delete_col)

    # Same stage → manifest-commit → clean protocol as the SIMPLE index.
    staging = f"{path}/.staging-{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(staging)
    kept_files = [f for f in live_files if f not in set(affected)]
    moved, n_written = _commit_staged(
        spark, path, staging, version + 1, kept_files
    )
    # Post-commit incremental index maintenance: drop replaced files'
    # words, add the new files' words — O(commit), the sidecar rewrite
    # itself is metadata-scale. (words was materialized above; a crash
    # before this line is healed by the manifest-mismatch cold rebuild.)
    kept_words = words.filter(~F.col("file").isin(affected))
    new_words = (
        _table_bloom_words(spark, path, key, moved) if moved else None
    )
    out_words = (
        kept_words.unionByName(new_words) if new_words is not None else kept_words
    )
    out_words.write.mode("overwrite").parquet(sidecar)
    return n_written


_RLI_DIR = "_rli"  # record-level index sidecar: (key, file) rows


def _valid_rli(spark, path: str, live_files: list[str]) -> DataFrame | None:
    """The record-level index relation if present AND consistent with
    the manifest's live file set (same self-heal contract as the bloom
    sidecar), else None."""
    import os

    d = os.path.join(path, _RLI_DIR)
    if not os.path.isdir(d):
        return None
    candidate = spark.read.parquet(d)
    rli_files = {r["file"] for r in candidate.select("file").distinct().collect()}
    return candidate if rli_files == set(live_files) else None


def _table_rli(spark, path: str, key: str, files: list[str]) -> DataFrame:
    """(key, file) rows for ``files`` — one column-pruned scan. Every
    file additionally gets one NULL-key marker row so EMPTY data files
    still appear in the sidecar (same rationale as the bloom marker:
    the consistency check compares file sets); NULL keys can never match
    a probe."""
    import os

    src = spark.read.parquet(*[os.path.join(path, f) for f in files])
    rows = src.select(
        F.col(key),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"),
    )
    markers = spark.createDataFrame([(f,) for f in files], "file string").select(
        F.lit(None).cast(src.schema[key].dataType).alias(key), "file"
    )
    return rows.unionByName(markers)


def upsert_parquet_record_indexed(
    spark,
    batch: DataFrame,
    path: str,
    key: str,
    precombine: str,
    *,
    delete_col: str | None = None,
) -> int:
    """Record-level-indexed COW upsert — Hudi 1.0's RECORD_INDEX
    (``hoodie.index.type=RECORD_INDEX``): an EXACT key→file mapping in a
    ``_rli`` sidecar decides file affectedness — no false positives
    (bloom) and no layout dependence (range), at the cost of an index
    whose size is O(table keys) rather than O(files). That is exactly
    Hudi's trade: the RLI lives in its metadata table, hash-bucketed by
    key; here it is a parquet relation joined column-pruned.

    Probe shape: batch keys (small side, broadcast) semi-join the index
    — the index scan reads two thin columns, the table reads nothing;
    only affected file NAMES reach the driver. Inserts (keys absent from
    the index) rewrite nothing and land as new files. Maintenance is
    incremental per commit: replaced files' rows drop, new files' rows
    append — O(commit), never O(table).

    Same manifest-CAS commit protocol as the other indexed writers;
    the sidecar self-heals by manifest-mismatch cold rebuild.
    Returns rows written.
    """
    import os
    import uuid

    if not os.path.isdir(path):
        merged = merge_upsert(None, batch, [key], precombine, delete_col=delete_col)
        n = _write_parquet_counted(merged, path)
        version, live = table_live_files(path)
        _manifest_publish(path, live, version + 1)
        _table_rli(spark, path, key, live).write.mode("overwrite").parquet(
            os.path.join(path, _RLI_DIR)
        )
        return n

    version, live_files = table_live_files(path)
    rli = _valid_rli(spark, path, live_files)
    if rli is None:
        rli = _table_rli(spark, path, key, live_files)  # cold rebuild
    # Materialize: the commit below deletes files this lazy plan reads.
    rli = rli.localCheckpoint(eager=True)
    batch_keys = batch.select(F.col(key)).distinct()
    affected = [
        r["file"]
        for r in (
            rli.join(F.broadcast(batch_keys), on=key, how="left_semi")
            .select("file")
            .distinct()
            .collect()
        )
    ]
    if affected:
        existing_sub = spark.read.parquet(*[os.path.join(path, f) for f in affected])
        merged = merge_upsert(existing_sub, batch, [key], precombine, delete_col=delete_col)
    else:
        merged = merge_upsert(None, batch, [key], precombine, delete_col=delete_col)

    staging = f"{path}/.staging-{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(staging)
    kept_files = [f for f in live_files if f not in set(affected)]
    moved, n_written = _commit_staged(spark, path, staging, version + 1, kept_files)
    # Incremental index maintenance: O(commit).
    kept_rows = rli.filter(~F.col("file").isin(affected))
    out_rows = (
        kept_rows.unionByName(_table_rli(spark, path, key, moved))
        if moved
        else kept_rows
    )
    out_rows.write.mode("overwrite").parquet(os.path.join(path, _RLI_DIR))
    return n_written


def recluster_indexed_table(
    spark, path: str, key: str, *, n_files: int = 16, zorder_with: str | None = None
) -> int:
    """Clustering table service on a manifest-committed table (Hudi's
    clustering / ``replacecommit``): rewrite the live file set into
    ``n_files`` key-sorted files with DISJOINT footer key ranges, so the
    SIMPLE range index prunes tightly again after a run of scattered
    upserts degraded the layout. Data is untouched — only arrangement.

    Runs through the same stage → manifest-CAS-commit → clean protocol
    as the indexed writers: readers see the old arrangement or the new
    one, never a mix, and a concurrent upsert racing this service loses
    (or wins) the manifest version atomically
    (:class:`ConcurrentCommitError`). One shuffle (range partition by
    key) over the table — the service is scheduled, not per-commit, so
    that cost amortizes over the upserts it re-accelerates. Returns rows
    rewritten.

    ``zorder_with`` switches to 2-D z-order clustering on
    (``key``, ``zorder_with``) — Hudi's ``hoodie.clustering.plan.
    strategy.sort.columns`` with z-ordering: both columns' footer
    ranges tighten simultaneously, so skipping works for predicates on
    EITHER column, at the cost of looser single-column ranges than the
    linear layout."""
    import uuid

    from .clustering import cluster_linear, cluster_zorder

    version, live_files = table_live_files(path)
    if not live_files:
        raise FileNotFoundError(f"no data files at {path!r}")
    current = read_indexed_table(spark, path)
    staging = f"{path}/.staging-{uuid.uuid4().hex}"
    clustered = (
        cluster_zorder(current, key, zorder_with, n_files)
        if zorder_with is not None
        else cluster_linear(current, [key], n_files)
    )
    clustered.write.mode("overwrite").parquet(staging)
    _, n_written = _commit_staged(spark, path, staging, version + 1, kept=[])
    return n_written


def hudi_writer_options(
    table_name: str,
    keys: list[str],
    precombine: str,
    *,
    automatic_clean: bool = True,
) -> dict[str, str]:
    """The reference's Hudi writer options (:183-192, :245-254) for
    connector passthrough when the Hudi bundle is present; the engine
    itself does not require them."""
    return {
        "hoodie.table.name": table_name,
        "hoodie.datasource.write.recordkey.field": ",".join(keys),
        "hoodie.datasource.write.precombine.field": precombine,
        "hoodie.datasource.write.operation": "upsert",
        "hoodie.datasource.write.table.type": "COPY_ON_WRITE",
        "hoodie.datasource.write.keygenerator.class": (
            "org.apache.hudi.keygen.NonpartitionedKeyGenerator"
        ),
        "hoodie.clean.automatic": "true" if automatic_clean else "false",
        "hoodie.metadata.enable": "false",
    }


def vacuum_orphans(
    path: str, *, min_age_seconds: float = 24 * 3600.0
) -> list[str]:
    """Reclaim ORPHAN data files under a manifest-committed table — the
    Delta-VACUUM / Hudi orphan-file-clean operation the post-commit
    cleaner cannot cover: a crash between staging-move and manifest
    publish leaves files no manifest references (invisible to every
    reader, but paying storage forever).

    Deletes ``*.parquet`` files that are (a) NOT referenced by ANY
    committed manifest version still on disk and (b) older than
    ``min_age_seconds``. The live set is the UNION across every
    ``_manifest/v*.json`` — not just the latest — because older
    versions stay addressable: catalogs and branches pin specific
    versions (``operators/txn.py::read_table_at_catalog`` resolves
    through ``manifest_files_at``), and time travel reads them
    directly. A file referenced only by an old version is HISTORY, not
    an orphan; reclaiming history is the cleaner's job (it retires the
    old manifests first, at which point their exclusively-referenced
    files genuinely become orphans for this vacuum).

    The age guard is the same safety rule as Delta's retention check:
    a CONCURRENT in-flight commit has already moved its staged files in
    (pre-commit, unreferenced until its manifest publishes), and only
    age separates those from true orphans — so the floor must exceed
    the longest plausible commit duration. Manifest-referenced files
    are never touched, so a racing read can never lose a live file.

    Returns the removed basenames. A table without a manifest is left
    alone entirely (nothing can be proven orphaned).
    """
    import glob
    import json
    import os
    import time

    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    live_set: set[str] = set()
    any_manifest = False
    for mf in os.listdir(mdir):
        if mf.startswith("v") and mf.endswith(".json"):
            any_manifest = True
            with open(os.path.join(mdir, mf)) as fh:
                live_set.update(json.load(fh)["files"])
    if not any_manifest:
        return []
    now = time.time()
    removed = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        base = os.path.basename(f)
        if base in live_set:
            continue
        try:
            if now - os.path.getmtime(f) < min_age_seconds:
                continue
            os.remove(f)
            removed.append(base)
        except OSError:
            pass
    return removed


def retire_manifests(
    path: str, *, pinned: set[int], keep_latest: int = 1
) -> list[int]:
    """The history CLEANER for manifest-committed tables — the step
    between "older version" and "vacuumable orphan": delete manifest
    versions that (a) are not in ``pinned`` (versions any catalog
    version or branch still references — compute with
    ``operators/txn.py::catalog_pinned_versions``; pass every
    savepoint/time-travel target you want readable too) and (b) are not
    among the newest ``keep_latest`` versions.

    Only AFTER a manifest version is retired do the files it exclusively
    referenced stop appearing in :func:`vacuum_orphans`'s live-set union
    and become reclaimable. Retiring only metadata keeps the two steps
    independently safe: a crash between them merely delays reclamation.

    Returns the retired version numbers. The latest version is always
    kept regardless of ``pinned``.
    """
    import os

    if keep_latest < 1:
        raise ValueError("keep_latest must be >= 1 (the table head)")
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    versions = sorted(
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    )
    keep = set(versions[-keep_latest:]) | set(pinned)
    retired = []
    for v in versions:
        if v in keep:
            continue
        try:
            os.remove(os.path.join(mdir, f"v{v}.json"))
            retired.append(v)
        except OSError:
            pass
    return retired
