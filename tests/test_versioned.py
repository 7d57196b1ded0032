"""Snapshot-versioned parquet store: commit protocol, time travel,
crash safety (manifest rename is the commit point), vacuum retention."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from crawler_service_ray.pipelines.versioned import (
    list_versions,
    read_version,
    snapshot_write,
    vacuum,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _df(lo, hi):
    return pd.DataFrame({"k": np.arange(lo, hi, dtype="int64"),
                         "v": np.arange(lo, hi, dtype="int64") * 10})


def _rows(ds) -> set:
    d = ds.to_pandas()
    return set(zip(d["k"].astype(int), d["v"].astype(int)))


def test_append_and_overwrite_history(ray_session, root):
    v1 = snapshot_write(rd.from_pandas(_df(0, 5)), root)
    v2 = snapshot_write(rd.from_pandas(_df(5, 8)), root, mode="append")
    v3 = snapshot_write(rd.from_pandas(_df(100, 102)), root,
                        mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert _rows(read_version(root, 1)) == _rows(rd.from_pandas(_df(0, 5)))
    assert _rows(read_version(root, 2)) == _rows(rd.from_pandas(_df(0, 8)))
    assert _rows(read_version(root, 3)) == _rows(
        rd.from_pandas(_df(100, 102)))
    # default read = latest
    assert _rows(read_version(root)) == _rows(read_version(root, 3))


def test_append_shares_parent_files(ray_session, root):
    snapshot_write(rd.from_pandas(_df(0, 5)), root)
    snapshot_write(rd.from_pandas(_df(5, 8)), root, mode="append")
    m1 = json.load(open(os.path.join(root, "_versions", "v000001.json")))
    m2 = json.load(open(os.path.join(root, "_versions", "v000002.json")))
    assert set(m1["files"]) < set(m2["files"])   # no rewrite of v1 data


def test_crash_before_manifest_is_invisible(ray_session, root):
    snapshot_write(rd.from_pandas(_df(0, 5)), root)
    # simulate a writer that crashed after data files, before manifest
    orphan_dir = os.path.join(root, "data", "s000099")
    os.makedirs(orphan_dir)
    pd.DataFrame({"k": [999], "v": [999]}).to_parquet(
        os.path.join(orphan_dir, "part.parquet"))
    assert list_versions(root) == [1]
    assert (999, 999) not in _rows(read_version(root))
    # a stranded .tmp manifest is equally invisible
    with open(os.path.join(root, "_versions", "v000099.json.tmp"),
              "w") as fh:
        fh.write("{}")
    assert list_versions(root) == [1]


def test_vacuum_retention(ray_session, root):
    snapshot_write(rd.from_pandas(_df(0, 5)), root)
    snapshot_write(rd.from_pandas(_df(5, 8)), root, mode="append")
    snapshot_write(rd.from_pandas(_df(100, 102)), root, mode="overwrite")
    res = vacuum(root, keep_latest=1)
    assert res["kept_versions"] == [3]
    assert list_versions(root) == [3]
    # v3 must still read intact; v1/v2 data files are gone
    assert _rows(read_version(root, 3)) == _rows(
        rd.from_pandas(_df(100, 102)))
    with pytest.raises(FileNotFoundError):
        read_version(root, 1)
    leftover = []
    for dp, _, fns in os.walk(os.path.join(root, "data")):
        leftover += [f for f in fns if f.endswith(".parquet")]
    m3 = json.load(open(os.path.join(root, "_versions", "v000003.json")))
    assert len(leftover) == len(m3["files"])


def test_vacuum_keeps_shared_files(ray_session, root):
    """An appended version's manifest references the parent's data
    files — vacuum(keep_latest=1) after an APPEND must keep them."""
    snapshot_write(rd.from_pandas(_df(0, 5)), root)
    snapshot_write(rd.from_pandas(_df(5, 8)), root, mode="append")
    vacuum(root, keep_latest=1)
    assert _rows(read_version(root)) == _rows(rd.from_pandas(_df(0, 8)))


def test_bad_inputs(ray_session, root):
    with pytest.raises(FileNotFoundError):
        read_version(root)
    snapshot_write(rd.from_pandas(_df(0, 2)), root)
    with pytest.raises(ValueError):
        snapshot_write(rd.from_pandas(_df(0, 2)), root, mode="merge")
    with pytest.raises(ValueError):
        vacuum(root, keep_latest=0)
    with pytest.raises(FileNotFoundError):
        read_version(root, 7)
    shutil.rmtree(root)


def test_snapshot_compact(ray_session, root):
    """Compaction commits a new version with fewer files and the
    identical multiset; prior versions stay readable."""
    from crawler_service_ray.pipelines.versioned import snapshot_compact

    snapshot_write(rd.from_pandas(_df(0, 40)).repartition(8), root)
    snapshot_write(rd.from_pandas(_df(40, 60)).repartition(8), root,
                   mode="append")
    before = _rows(read_version(root))
    m2 = json.load(open(os.path.join(root, "_versions", "v000002.json")))
    v3 = snapshot_compact(root, target_files=2)
    assert v3 == 3
    m3 = json.load(open(os.path.join(root, "_versions", "v000003.json")))
    assert len(m3["files"]) < len(m2["files"])
    assert _rows(read_version(root, 3)) == before
    assert _rows(read_version(root, 2)) == before   # history intact
    vacuum(root, keep_latest=1)
    assert _rows(read_version(root)) == before
