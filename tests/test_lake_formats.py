"""Iceberg snapshot replay (sources/iceberg.py) + Delta vacuum
planner (sources/delta_log.py): fold semantics, re-add liveness,
retention flags."""

from __future__ import annotations

from cs_pipeline_spark.sources.delta_log import (
    _N_COMMITS,
    _READD_PATH,
    _VACUUM_RETENTION_H,
    lake_vacuum_plan,
)
from cs_pipeline_spark.sources.iceberg import (
    _FILES_PER_MANIFEST,
    _N_SNAPSHOTS,
    _ST_ADDED,
    _ST_DELETED,
    _file_info,
    _manifest_rows,
    _snap_id,
    decode_avro_flat,
    encode_ocf_generic,
    _MANIFEST_FIELDS,
    scan_iceberg_manifest,
)


def _expected_live(s: int) -> tuple[int, int, int]:
    live = {}
    for k in range(s + 1):
        for row in _manifest_rows(k):
            status, _seq, path, sz, recs = row
            if status == _ST_ADDED:
                live[path] = (sz, recs)
            elif status == _ST_DELETED:
                live.pop(path, None)
    return (
        len(live),
        sum(v[0] for v in live.values()),
        sum(v[1] for v in live.values()),
    )


def test_iceberg_snapshot_census(spark, sf_dir):
    rows = {
        r.snapshot_id: r
        for r in scan_iceberg_manifest(spark, sf_dir).collect()
    }
    assert set(rows) == {_snap_id(s) for s in range(_N_SNAPSHOTS)}
    for s in range(_N_SNAPSHOTS):
        n, b, rec = _expected_live(s)
        r = rows[_snap_id(s)]
        assert (r.n_live_files, r.live_bytes, r.live_records) == (
            n, b, rec,
        )


def test_iceberg_deletes_shrink_later_snapshots():
    # manifest 2 deletes a manifest-0 file: snapshot 2 grows by only
    # FILES_PER_MANIFEST - 1 over snapshot 1
    n1 = _expected_live(1)[0]
    n2 = _expected_live(2)[0]
    assert n2 == n1 + _FILES_PER_MANIFEST - 1


def test_iceberg_manifest_ocf_roundtrip():
    rows = _manifest_rows(3)
    payload = encode_ocf_generic(_MANIFEST_FIELDS, rows, 7)
    names, decoded = decode_avro_flat(payload)
    assert names == [n for n, _ in _MANIFEST_FIELDS]
    assert decoded == rows
    # the DELETED entry carries the original file's stats
    deleted = [r for r in decoded if r[0] == _ST_DELETED]
    assert len(deleted) == 1
    assert deleted[0][2:] == _file_info(1, 0)


def test_vacuum_plan_flags_and_excludes_readds(spark, sf_dir):
    rows = {r.path: r for r in lake_vacuum_plan(spark, sf_dir).collect()}
    # the re-added path is LIVE at head: vacuuming it would delete a
    # live file — it must not appear in the tombstone census at all
    assert _READD_PATH not in rows
    # tombstones: removed at commits 3..N-1 minus the re-added one
    assert len(rows) == _N_COMMITS - 3
    for r in rows.values():
        # removable iff older than the retention horizon
        assert r.removable == (
            1 if r.age_hours >= _VACUUM_RETENTION_H else 0
        )
    # the newest tombstone (removed at the head commit) is inside the
    # horizon and must be protected
    newest = max(rows.values(), key=lambda r: r.removed_version)
    assert newest.removable == 0
    assert any(r.removable == 1 for r in rows.values())


def test_checkpoint_replay_equals_full_replay(spark, sf_dir):
    """The two replay paths must agree exactly on shared versions."""
    from cs_pipeline_spark.sources.delta_log import (
        _CKPT_VERSION,
        scan_delta_checkpoint,
        scan_delta_log,
    )

    full = {
        r.version: r
        for r in scan_delta_log(spark, sf_dir).collect()
        if r.version >= _CKPT_VERSION
    }
    ck = {
        r.version: r
        for r in scan_delta_checkpoint(spark, sf_dir).collect()
    }
    assert set(full) == set(ck) == set(
        range(_CKPT_VERSION, _N_COMMITS)
    )
    for v, r in full.items():
        c = ck[v]
        assert (r.n_live_files, r.live_bytes, r.live_records) == (
            c.n_live_files, c.live_bytes, c.live_records,
        )


def test_orphans_exclude_referenced_and_deleted(spark, sf_dir):
    from cs_pipeline_spark.sources.iceberg import (
        _N_ORPHANS,
        _orphan_info,
        lake_orphan_files,
    )

    rows = {r.path: r.size_bytes for r in
            lake_orphan_files(spark, sf_dir).collect()}
    assert rows == {
        _orphan_info(m)[0]: _orphan_info(m)[1]
        for m in range(_N_ORPHANS)
    }
    # a DELETED-status file (referenced by a manifest) is NOT orphaned
    assert "data/f-0-2.parquet" not in rows
