"""Per-partition lineage manifests + atomic file writes (checkpoint/resume).

Generalizes the reference's crash-coarse durability protocol — immutable
segment files written whole, then atomically renamed
(``InvertedIndexManager.java:1062-1131`` ``deleteAndRename``) — into
explicit lineage: every artifact directory carries a JSON manifest recording
its input fingerprint, row counts and output files.  A resumed build skips
any partition whose manifest validates against the same inputs.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

MANIFEST_NAME = "manifest.json"


def atomic_write_bytes(path: str, data: bytes | bytearray | memoryview) -> None:
    """Write-to-temp + fsync + rename, so readers never see partial files."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def atomic_write_json(path: str, obj: Any) -> None:
    atomic_write_bytes(path, json.dumps(obj, indent=1, sort_keys=True).encode())


def read_json(path: str) -> Any | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def manifest_valid(manifest_path: str, expected_fingerprint: dict) -> bool:
    """True iff the manifest exists, matches the fingerprint, and every
    output file it lists exists with the recorded size."""
    m = read_json(manifest_path)
    if not m:
        return False
    if m.get("fingerprint") != expected_fingerprint:
        return False
    base = os.path.dirname(manifest_path)
    for fname, size in m.get("outputs", {}).items():
        p = os.path.join(base, fname)
        if not os.path.exists(p) or os.path.getsize(p) != size:
            return False
    return True


def write_manifest(manifest_path: str, fingerprint: dict,
                   outputs: list[str], extra: dict | None = None) -> dict:
    base = os.path.dirname(manifest_path)
    m = {
        "fingerprint": fingerprint,
        "outputs": {os.path.basename(p): os.path.getsize(os.path.join(base, p))
                    for p in outputs},
    }
    if extra:
        m.update(extra)
    atomic_write_json(manifest_path, m)
    return m


def input_fingerprint(paths: list[str]) -> dict:
    """Cheap input identity: per-file (size, mtime_ns) — enough to invalidate
    a checkpoint when inputs change, without hashing terabytes."""
    out = {}
    for p in sorted(paths):
        st = os.stat(p)
        out[p] = [st.st_size, st.st_mtime_ns]
    return out


# -- forward-store fragment liveness (crash-safe compaction) -------------

def live_fragments(rdir: str) -> list[str]:
    """Fragment basenames of one forward range dir with SUPERSEDED
    sources excluded: auto_compact publishes ``cmp-X.parquet`` together
    with a ``cmp-X.srcs.json`` sidecar naming the fragments it replaced;
    until the sources are unlinked, every reader that goes through this
    helper sees each doc exactly once regardless of where a crash landed
    (sidecar-without-cmp → sources live; cmp+sidecar+sources → sources
    excluded).  ALL forward-store listings must use this."""
    try:
        names = sorted(os.listdir(rdir))
    except FileNotFoundError:
        return []
    files = [f for f in names if f.endswith(".parquet")]
    dead: set[str] = set()
    for f in files:
        if f.startswith("cmp-"):
            srcs = read_json(os.path.join(rdir, f[:-8] + ".srcs.json"))
            if srcs:
                dead.update(srcs)
    return [f for f in files if f not in dead]


def live_forward_files(fwd_dir: str) -> list[str]:
    """Every live fragment path under a forward store (all ``r=`` range
    partitions), for whole-store reads (resume, doc stats): the
    directory-wide ``read_parquet(fwd_dir)`` would double-read docs
    whose range crashed mid-compaction."""
    out: list[str] = []
    if not os.path.isdir(fwd_dir):
        return out
    for rname in sorted(os.listdir(fwd_dir)):
        d = os.path.join(fwd_dir, rname)
        if rname.startswith("r=") and os.path.isdir(d):
            out.extend(os.path.join(d, f) for f in live_fragments(d))
    return out


# -- index aliases (blue/green reindex switch) ---------------------------

def set_alias(alias_path: str, index_dir: str) -> None:
    """Atomically point an alias file at an index directory — the
    blue/green reindex switch: build the new index beside the old one,
    validate it, flip the alias, readers opened afterwards serve the new
    index while in-flight readers keep their mmap'd segments.  Refuses a
    target without a valid index manifest (never alias a half-built
    dir).  The flip is a single ``os.replace`` (atomic on POSIX); on a
    shared filesystem every node sees either the old or the new target,
    never a torn pointer."""
    target = os.path.abspath(index_dir)
    if read_json(os.path.join(target, MANIFEST_NAME)) is None:
        raise ValueError(
            f"refusing to alias {target}: no valid index manifest")
    atomic_write_json(alias_path, {"index_dir": target})


def resolve_alias(path: str) -> str:
    """Resolve ``path`` to an index dir: an alias file returns its
    target; a directory passes through unchanged (so every CLI/API entry
    accepts either)."""
    if os.path.isdir(path):
        return path
    if not os.path.exists(path):
        raise FileNotFoundError(f"no index dir or alias file at {path}")
    a = read_json(path)
    if not a or "index_dir" not in a:
        raise ValueError(f"{path} is neither an index dir nor an alias file")
    return a["index_dir"]
