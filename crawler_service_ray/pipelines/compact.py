"""Small-files compaction for partitioned parquet output.

A long-running pipeline (daily crawls, per-shard exports, epoch
partitions) accretes many small parquet files per hive leaf; small
files tax every subsequent read (file-open latency, tiny row groups,
scheduler overhead at 100 TB). ``compact_dir`` rewrites each leaf
directory's files into ~``target_mb`` files IN PLACE, one leaf at a
time, preserving the hive layout (partition values live in directory
names, which are never touched) — the maintenance pass engines like
Delta/Iceberg call OPTIMIZE, here over plain hive-partitioned parquet.

Atomicity is per leaf: the new files land in a dot-prefixed sibling
temp dir (invisible to pyarrow dataset discovery), then two renames
swap it in. A crash can strand a ``*.compact_old`` sibling; the next
run's recovery sweep restores any leaf whose swap did not complete.
Per-leaf atomicity is also the scale-out seam: at 100 TB, run one
``compact`` invocation per top-level partition range (the same
shard-the-work pattern as the export CLI) — concurrent invocations
never touch the same leaf, and a failed invocation's leaves are
either old-complete or new-complete, never mixed.
Row order within a leaf may change (parquet tables are unordered);
row COUNT and values are preserved — the pytest checks multiset
equality.
"""

from __future__ import annotations

import math
import os
import shutil


def _recover(root: str) -> None:
    """Finish or roll back interrupted swaps from a previous run."""
    for dirpath, dirnames, _ in os.walk(root):
        for d in list(dirnames):
            if d.endswith(".compact_old"):
                orig = os.path.join(dirpath, d[: -len(".compact_old")])
                old = os.path.join(dirpath, d)
                if not os.path.exists(orig):
                    # crashed between the two renames: restore the
                    # original data
                    os.rename(old, orig)
                else:
                    # new leaf committed; the old copy is debris
                    shutil.rmtree(old)
                dirnames.remove(d)


def compact_dir(
    root: str,
    target_mb: float = 64.0,
) -> dict:
    """Compact every parquet leaf under ``root`` whose file count
    exceeds what ``target_mb`` calls for. Returns a report dict:
    leaves seen/compacted, files before/after, total bytes."""
    import ray.data as rd

    _recover(root)
    leaves = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        pq = [f for f in filenames
              if f.endswith(".parquet") and not f.startswith(".")]
        if pq:
            leaves.append((dirpath, pq))

    target_bytes = max(1, int(target_mb * (1 << 20)))
    report = {"leaves": len(leaves), "compacted": 0,
              "files_before": 0, "files_after": 0, "bytes": 0}
    for dirpath, files in leaves:
        total = sum(os.path.getsize(os.path.join(dirpath, f))
                    for f in files)
        want = max(1, math.ceil(total / target_bytes))
        report["files_before"] += len(files)
        report["bytes"] += total
        if len(files) <= want:
            report["files_after"] += len(files)
            continue
        parent, leaf = os.path.split(dirpath)
        tmp = os.path.join(parent, f".compact_tmp-{leaf}")
        shutil.rmtree(tmp, ignore_errors=True)
        # coalesce, no shuffle: repartition(n) merges neighbors
        rd.read_parquet(dirpath).repartition(want).write_parquet(tmp)
        old = dirpath + ".compact_old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(dirpath, old)
        os.rename(tmp, dirpath)
        shutil.rmtree(old)
        report["compacted"] += 1
        report["files_after"] += len(
            [f for f in os.listdir(dirpath) if f.endswith(".parquet")])
    return report
