"""Cloud-drive connector (the Box / Google-Drive source shape): the SAME
crawl engine over an object-ID-addressed, PAGINATED folder-listing API
(SURVEY.md §2 rows S4/S5).

The reference's Box crawler walks folders by opaque id with paginated
``item_collection`` listings carrying a ``total_count``
(`/root/reference/crawlers/box.py:23-38`); its GDrive prototype pages a
file listing with name+mimeType metadata per entry
(`/root/reference/tests/drive_tester.py:14-17`). Both are OAuth stubs in
the reference — no network crawl loop exists there. Here the API
*semantics* are made real and network-free: a deterministic local JSON
fixture stands in for the remote account (this sandbox has no network,
and the engine must stay runnable anywhere), and the listing protocol —
id-addressed folders, fixed page size, explicit next-page continuation,
total counts, per-file name/size/mime metadata — is crawled by the
unchanged frontier engine through the Source seam: the epoch driver
cannot tell ``DriveFetcher`` from ``CorpusFetcher``/``PosixFetcher``.

URL mapping (path-only, so canonicalization/seen/politeness apply
verbatim; one "drive" = one host = one politeness bucket, the way one
Box enterprise account or one GDrive shared drive is one quota pool):

- ``drive://<drive>.drv/f/<folder_id>``            folder listing, page 0
- ``drive://<drive>.drv/f/<folder_id>/p/<k>``      folder listing, page k
- ``drive://<drive>.drv/x/<file_id>``              file metadata record

A folder page emits one text span (``folder <name> id <id> page <k> of
<npages> total <n>`` — the Box ``total_count``), one link span per item
on the page, and a ``next`` link span when more pages remain (GDrive's
``nextPageToken`` made visible as a crawlable URL, so pagination rides
the frontier instead of an in-fetcher loop). A file record emits one
text span of its metadata and a media span when the mime is non-text —
the same interleaved text+media document shape every other source emits.

At 100-TB scale the fixture JSON is the per-worker-cached small side
(one account tree's metadata is MBs, not TBs — the payload bytes stay
remote); a real deployment swaps ``_load_fixture`` for an HTTP client in
``__init__`` and nothing else changes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .fetch import FETCHED_SCHEMA

_MIMES = (
    ("report", "pdf", "application/pdf"),
    ("notes", "txt", "text/plain"),
    ("data", "csv", "text/csv"),
    ("scan", "png", "image/png"),
    ("talk", "mp4", "video/mp4"),
    ("readme", "md", "text/markdown"),
    ("audio", "wav", "audio/wav"),
)


def fixture_path(root: str) -> str:
    return os.path.join(os.path.abspath(root), "drive.json")


def generate_drive_fixture(
    root: str,
    num_drives: int = 2,
    folders_per_drive: int = 7,
    files_per_folder: int = 6,
    fanout: int = 2,
    page_size: int = 4,
) -> str:
    """Write a deterministic drive-account fixture under ``root`` (pure
    arithmetic, no RNG — the same params always produce byte-identical
    JSON, so tests and the seen-set equivalence oracle are stable).

    Folder ``j``'s parent is folder ``(j-1)//fanout`` (0 = root), i.e. a
    complete ``fanout``-ary tree; every folder holds ``files_per_folder``
    files with cycling extensions/mimes and arithmetic sizes.
    """
    folders: dict[str, dict] = {}
    files: dict[str, dict] = {}
    drives: dict[str, str] = {}
    for d in range(num_drives):
        dname = f"d{d}"
        root_id = f"{dname}f0"
        drives[dname] = root_id
        for j in range(folders_per_drive):
            folders[f"{dname}f{j}"] = {
                "name": f"folder-{d}-{j}", "items": []}
        for j in range(1, folders_per_drive):
            parent = f"{dname}f{(j - 1) // fanout}"
            folders[parent]["items"].append(
                {"type": "folder", "id": f"{dname}f{j}",
                 "name": folders[f"{dname}f{j}"]["name"]})
        for j in range(folders_per_drive):
            for i in range(files_per_folder):
                stem, ext, mime = _MIMES[(d + 3 * j + i) % len(_MIMES)]
                fid = f"{dname}x{j}_{i}"
                files[fid] = {
                    "name": f"{stem}-{d}-{j}-{i}.{ext}",
                    "size": 100 + 37 * i + 11 * j + 5 * d,
                    "mime": mime,
                }
                folders[f"{dname}f{j}"]["items"].append(
                    {"type": "file", "id": fid, "name": files[fid]["name"]})
    doc = {
        "meta": {
            "num_drives": num_drives,
            "folders_per_drive": folders_per_drive,
            "files_per_folder": files_per_folder,
            "fanout": fanout,
            "page_size": page_size,
        },
        "drives": drives,
        "folders": folders,
        "files": files,
    }
    os.makedirs(os.path.abspath(root), exist_ok=True)
    path = fixture_path(root)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, sort_keys=True)
    os.replace(tmp, path)
    return path


def default_drive_seeds(root: str) -> list[str]:
    """One seed per drive: the root folder's page-0 listing URL."""
    with open(fixture_path(root)) as f:
        doc = json.load(f)
    return [f"drive://{d}.drv/f/{rid}"
            for d, rid in sorted(doc["drives"].items())]


class DriveFetcher:
    """Fetcher-seam implementation over a drive-account fixture. Same
    ``__call__(frontier batch) -> FETCHED_SCHEMA`` + ``set_epoch``
    contract as ``CorpusFetcher``/``PosixFetcher``. The fixture loads
    ONCE per worker process (`__init__`; cached through the crawl's
    ``_PROC_CACHE`` fetcher seam) — per-batch work is dict lookups."""

    def __init__(self, root: str, epoch: int = 0):
        with open(fixture_path(root)) as f:
            doc = json.load(f)
        self.folders: dict[str, dict] = doc["folders"]
        self.files: dict[str, dict] = doc["files"]
        self.drives: dict[str, str] = doc["drives"]
        self.page_size: int = int(doc["meta"]["page_size"])
        self.epoch = epoch

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    # -- API surface ------------------------------------------------------
    def _doc_spans(self, url: str) -> list[dict] | None:
        """Spans of one drive entity; None = 404 (unknown id / bad page /
        entity not in that drive — an id never leaks across accounts)."""
        if not url.startswith("drive://"):
            return None
        rest = url[len("drive://"):]
        host, _, path = rest.partition("/")
        if not host.endswith(".drv"):
            return None
        drive = host[:-len(".drv")]
        if drive not in self.drives:
            return None
        parts = path.split("/")
        if len(parts) == 2 and parts[0] == "x":
            meta = self.files.get(parts[1])
            if meta is None or not parts[1].startswith(drive + "x"):
                return None
            spans = [{
                "kind": "text",
                "text": (f"file {meta['name']} id {parts[1]} "
                         f"size {meta['size']} mime {meta['mime']}"),
                "media_ref": "", "offset": 0,
            }]
            if not meta["mime"].startswith("text/"):
                spans.append({"kind": "media", "text": "",
                              "media_ref": url, "offset": 1})
            return spans
        if parts and parts[0] == "f":
            if len(parts) == 2:
                fid, page = parts[1], 0
            elif len(parts) == 4 and parts[2] == "p":
                fid = parts[1]
                try:
                    page = int(parts[3])
                except ValueError:
                    return None
            else:
                return None
            folder = self.folders.get(fid)
            if folder is None or not fid.startswith(drive + "f"):
                return None
            items = folder["items"]
            ps = self.page_size
            npages = max(1, -(-len(items) // ps))
            if page < 0 or page >= npages:
                return None
            spans = [{
                "kind": "text",
                "text": (f"folder {folder['name']} id {fid} page {page} "
                         f"of {npages} total {len(items)}"),
                "media_ref": "", "offset": 0,
            }]
            for it in items[page * ps:(page + 1) * ps]:
                target = (f"drive://{host}/f/{it['id']}"
                          if it["type"] == "folder"
                          else f"drive://{host}/x/{it['id']}")
                spans.append({"kind": "link", "text": it["name"],
                              "media_ref": target, "offset": len(spans)})
            if page + 1 < npages:
                spans.append({"kind": "link", "text": "next",
                              "media_ref": f"drive://{host}/f/{fid}"
                                           f"/p/{page + 1}",
                              "offset": len(spans)})
            return spans
        return None

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.Table.from_pylist([], schema=FETCHED_SCHEMA)
        urls = t["url"].to_numpy(zero_copy_only=False)
        hosts = t["host"].to_numpy(zero_copy_only=False)
        prios = t["priority"].to_numpy(zero_copy_only=False)
        depths = t["depth"].to_numpy(zero_copy_only=False)
        ranks = t["host_rank"].to_numpy(zero_copy_only=False)
        ts = t["virtual_ts_ms"].to_numpy(zero_copy_only=False)
        retries = (
            t["retries"].to_numpy(zero_copy_only=False)
            if "retries" in t.schema.names
            else np.zeros(n, dtype=np.int16)
        )
        rows = []
        for i in range(n):
            spans = self._doc_spans(str(urls[i]))
            status = 200 if spans is not None else 404
            spans = spans or []
            n_text = sum(1 for s in spans if s["kind"] == "text")
            n_media = sum(1 for s in spans if s["kind"] == "media")
            n_links = sum(1 for s in spans if s["kind"] == "link")
            nbytes = sum(len(s["text"]) + len(s["media_ref"]) for s in spans)
            rows.append({
                "doc_id": str(urls[i]), "url": str(urls[i]),
                "host": str(hosts[i]), "priority": float(prios[i]),
                "depth": int(depths[i]), "fetch_epoch": self.epoch,
                "host_rank": int(ranks[i]),
                "virtual_ts_ms": int(ts[i]),
                "retries": int(retries[i]), "status": status,
                "src": "fetch", "spans": spans,
                "n_text_spans": n_text, "n_media_spans": n_media,
                "n_links": n_links, "bytes": nbytes,
            })
        return pa.Table.from_pylist(rows, schema=FETCHED_SCHEMA)


def drive_expected(root: str) -> set[str]:
    """Ground-truth reachable URL set (test oracle): every folder page of
    every folder plus every file, per drive — a direct enumeration of the
    fixture, independent of the fetcher's link emission."""
    with open(fixture_path(root)) as f:
        doc = json.load(f)
    ps = int(doc["meta"]["page_size"])
    out: set[str] = set()
    for dname in doc["drives"]:
        host = f"{dname}.drv"
        for fid, folder in doc["folders"].items():
            if not fid.startswith(dname + "f"):
                continue
            npages = max(1, -(-len(folder["items"]) // ps))
            out.add(f"drive://{host}/f/{fid}")
            for k in range(1, npages):
                out.add(f"drive://{host}/f/{fid}/p/{k}")
        for xid in doc["files"]:
            if xid.startswith(dname + "x"):
                out.add(f"drive://{host}/x/{xid}")
    return out
