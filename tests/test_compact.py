"""Small-files compaction: per-leaf rewrite preserves data and hive
layout, skips already-compact leaves, and recovers interrupted swaps."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq


def _make_tree(root):
    rows = []
    for split in ("train", "val"):
        leaf = os.path.join(root, f"split={split}")
        os.makedirs(leaf)
        for i in range(12):
            df = pd.DataFrame({
                "id": np.arange(i * 10, i * 10 + 10, dtype="int64"),
                "v": np.full(10, ord(split[0]), dtype="int64"),
            })
            pq.write_table(pa.Table.from_pandas(df),
                           os.path.join(leaf, f"f{i}.parquet"))
            rows.append(df.assign(split=split))
    return pd.concat(rows, ignore_index=True)


def test_compact_merges_small_files(ray_session, tmp_path):
    from crawler_service_ray.pipelines.compact import compact_dir

    root = str(tmp_path / "t")
    before = _make_tree(root)
    rep = compact_dir(root, target_mb=64.0)
    assert rep["leaves"] == 2 and rep["compacted"] == 2
    assert rep["files_before"] == 24 and rep["files_after"] == 2
    after = (pads.dataset(root, partitioning="hive").to_table()
             .to_pandas())
    a = after.sort_values(["split", "id"]).reset_index(drop=True)
    b = before.sort_values(["split", "id"]).reset_index(drop=True)
    a["split"] = a["split"].astype(str)
    pd.testing.assert_frame_equal(a[["id", "v", "split"]],
                                  b[["id", "v", "split"]])
    # a second pass is a no-op (already compact)
    rep2 = compact_dir(root, target_mb=64.0)
    assert rep2["compacted"] == 0


def test_compact_recovers_interrupted_swap(ray_session, tmp_path):
    from crawler_service_ray.pipelines.compact import compact_dir

    root = str(tmp_path / "t")
    before = _make_tree(root)
    # simulate a crash between the two renames: original leaf moved
    # aside, new leaf never landed
    leaf = os.path.join(root, "split=train")
    os.rename(leaf, leaf + ".compact_old")
    rep = compact_dir(root, target_mb=64.0)
    assert rep["leaves"] == 2
    after = (pads.dataset(root, partitioning="hive").to_table()
             .to_pandas())
    assert len(after) == len(before)
