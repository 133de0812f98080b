"""Rename-free commit pointer (r9; VERDICT r8 item 1).

The r8 maintenance plane committed its generation pointers and catalog
manifest by tmp-write + atomic rename. Atomic on HDFS and POSIX —
**copy+delete on S3/object stores**, exactly the substrate a 100 TB
deployment is most likely to run on, so a concurrent reader could
observe a torn or missing pointer mid-copy. This module replaces the
rename with a protocol that never renames on ANY backend:

- each commit writes a NEW file ``<stem>.v<N>.json`` with CREATE-ONLY
  semantics (:func:`andl_spark.fsio.write_text_create` — ``open("x")``
  locally, ``FileSystem.create(overwrite=False)`` through Hadoop, a
  conditional PUT where the store supports it), ``N`` strictly above
  every existing pointer file's number;
- resolve = the highest-numbered file that PARSES: a half-written max
  (crashed writer, or an object store surfacing a partial PUT) falls
  back to the previous committed file, which is always intact because
  commits never rewrite an existing file;
- old pointer files are garbage-collected by later commits, keeping
  :data:`KEEP` behind the newest so an in-flight reader that listed
  just before a commit still finds its file.

The pointer file's own sequence number is decoupled from the payload
(the generation number lives INSIDE the JSON): a torn ``v7`` from a
crashed flip is simply superseded by a ``v8`` carrying the same
``current`` — no delete-then-recreate window, no overwrite anywhere.

Writers follow the same single-committer discipline the generation
protocol already demands (one compactor; Catalog documents single
writer per relvar) — create-only makes a violated discipline fail
loudly (the loser's create returns False and it re-reads) instead of
silently interleaving.

Legacy trees: a ``<stem>.json`` written by the r8 rename-based flip is
read (as sequence 0) only when no versioned file exists, and deleted
by the first versioned commit.

Reference parity: the reference commits catalog state through SQLite/
Postgres transactions (Andl.Sqlite, CatalogPersist.cs); this is the
same commit boundary re-expressed for object storage.
"""

from __future__ import annotations

import json

from . import fsio

__all__ = ["read", "commit", "KEEP"]

#: committed pointer files retained BEHIND the newest (readers that
#: listed just before a commit + the torn-max fallback both need ≥1)
KEEP = 2


def _versions(dir_path: str, stem: str) -> list[int]:
    pre = stem + ".v"
    out = []
    for name in fsio.listdir(dir_path):
        if name.startswith(pre) and name.endswith(".json"):
            try:
                out.append(int(name[len(pre):-5]))
            except ValueError:
                pass
    return sorted(out)


def _vpath(dir_path: str, stem: str, n: int) -> str:
    return fsio.join(dir_path, f"{stem}.v{n}.json")


def read(dir_path: str, stem: str) -> tuple[int, dict] | None:
    """(sequence, doc) of the newest committed pointer, or None when
    the directory holds no readable pointer at all. Tries candidates
    in descending sequence order — an unparseable or unreadable max is
    a crashed/in-flight commit, superseded state lives one file down
    (committed files are immutable, so anything below a torn max is
    intact by construction).

    When a NON-EMPTY candidate list fully fails, the reader raced a
    fast committer whose GC reclaimed every file it listed (possible
    whenever > KEEP commits land between the reader's listing and its
    reads) — re-list and retry: newer committed files now exist, so
    the retry terminates with a strictly fresher pointer. Bounded only
    as a corruption backstop; the race itself converges in one pass."""
    for _ in range(8):
        versions = _versions(dir_path, stem)
        for n in reversed(versions):
            try:
                return n, json.loads(
                    fsio.read_text(_vpath(dir_path, stem, n)))
            except Exception:
                # torn/half-written (crashed commit, or an in-flight
                # create we listed mid-write), or GC'd under us — fall
                # back to the previous committed sequence
                continue
        if not versions:
            break  # nothing versioned at all: legacy or fresh tree
    legacy = fsio.join(dir_path, stem + ".json")
    if fsio.exists(legacy):
        try:
            return 0, json.loads(fsio.read_text(legacy))
        except Exception:
            return None
    return None


def commit(dir_path: str, stem: str, doc: dict) -> int:
    """Commit ``doc`` as the new current pointer; returns its sequence
    number. Never renames, never overwrites: picks a sequence above
    every existing file (parseable or torn) and creates it exclusively,
    bumping on collision. GCs pointer files more than :data:`KEEP`
    behind the new one, plus the legacy rename-era file."""
    existing = _versions(dir_path, stem)
    n = (existing[-1] if existing else 0) + 1
    text = json.dumps(doc)
    while not fsio.write_text_create(_vpath(dir_path, stem, n), text):
        n += 1  # collision: another (protocol-violating) writer — skip
    for old in existing:
        if old <= n - KEEP - 1:
            fsio.delete(_vpath(dir_path, stem, old))
    legacy = fsio.join(dir_path, stem + ".json")
    if fsio.exists(legacy):
        fsio.delete(legacy)
    return n
