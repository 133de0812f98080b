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

STORE REQUIREMENTS (r10; VERDICT r9 item 6 — rehearsed against an
S3-semantics fake store in tests/test_pointer.py):

- **required**: strongly consistent GET/HEAD after PUT (S3 since
  2020-12, GCS, ABFS, HDFS, POSIX all provide this);
- **required for multi-committer safety**: an atomic create-exclusive
  primitive (conditional PUT / ``If-None-Match``, GCS preconditions,
  ABFS create, HDFS create, POSIX ``O_EXCL``). On an S3A build
  WITHOUT conditional writes, ``create(overwrite=False)`` is
  HEAD-then-PUT and exclusivity is ADVISORY — the protocol then rests
  entirely on the single-committer discipline it already documents
  (a violated discipline loses one commit, last PUT wins; readers
  still never see a torn pointer because payloads are never
  overwritten after the race settles);
- **tolerated, not required**: lagging LIST-after-PUT/DELETE. Version
  numbers are consecutive, so reads probe ASCENDING direct GETs above
  the listed max while files keep existing (r11, ADVICE r10: one
  wasted GET on the happy path instead of a fixed probe window, and
  lag coverage bounded only by GC — any lag is hidden while the
  version after the listed max still exists, i.e. up to KEEP+1
  commits once GC prunes, unbounded before); beyond that, readers
  serve an older committed pointer (never torn, never None on a
  non-fresh tree).

Legacy trees: a ``<stem>.json`` written by the r8 rename-based flip is
read (as sequence 0) only when no versioned file exists, and deleted
by the first versioned commit.

Reference parity: the reference commits catalog state through SQLite/
Postgres transactions (Andl.Sqlite, CatalogPersist.cs); this is the
same commit boundary re-expressed for object storage.
"""

from __future__ import annotations

import json
import logging

from . import fsio

__all__ = ["read", "commit", "KEEP"]

_log = logging.getLogger(__name__)

#: committed pointer files retained BEHIND the newest (readers that
#: listed just before a commit + the torn-max fallback both need ≥1)
KEEP = 2

#: consecutive MISSING probes tolerated when the listing is EMPTY
#: (fresh-or-outage): a committed tree whose listing never surfaced
#: anything may have had v1..v(N-KEEP-1) GC'd, so the ascent bridges
#: up to this many GC'd versions before concluding the tree is fresh —
#: the same small window the r10 fixed probe covered. On a NON-empty
#: listing the ascent stops at the first miss (1 wasted GET — the
#: happy path; ADVICE r10).
FRESH_PROBE_WINDOW = KEEP + 1


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


def _classify(e: Exception) -> str:
    """'missing' | 'torn' | 'io' for a failed pointer-file read.
    Missing and torn mean FALL BACK one version (GC race / crashed
    commit); 'io' (permissions, network) must NOT fall back — a stale
    superseded generation would be served with no signal, and a
    Catalog would initialize EMPTY and commit over the real manifest
    (ADVICE r9)."""
    if isinstance(e, FileNotFoundError):
        return "missing"
    if isinstance(e, (json.JSONDecodeError, UnicodeDecodeError)):
        return "torn"
    # py4j-wrapped Hadoop exceptions: classify by java class name
    # (the shared fsio helper), message substring as the fallback
    s = fsio.java_exception_class(e) or str(e)
    if "FileNotFoundException" in s or "FileNotFoundException" in str(e):
        return "missing"
    if "EOFException" in s:  # listed mid-create: shorter than expected
        return "torn"
    return "io"


def _read_candidate(path: str) -> tuple[str, str | None]:
    """("ok", text) for a readable candidate; ("missing"|"torn", None)
    → fall back one version (read() distinguishes the two: a LISTED
    file going missing proves newer commits exist). Persistent I/O
    errors RAISE after two retries — see _classify for why falling
    back on those would be silently wrong."""
    import time as _time

    last: Exception | None = None
    for attempt in range(3):
        if attempt:
            _time.sleep(0.05 * attempt)
        try:
            return "ok", fsio.read_text(path)
        except Exception as e:
            kind = _classify(e)
            if kind != "io":
                return kind, None
            last = e
    raise last  # type: ignore[misc]


def _probe_above(dir_path: str, stem: str, top: int,
                 miss_window: int) -> tuple[int, dict] | None:
    """Newest parseable (n, doc) STRICTLY ABOVE the listed max ``top``,
    or None. Versions are consecutive, so the ascent ends after
    ``miss_window`` consecutive MISSING versions: 1 on a non-empty
    listing (the happy path costs one wasted GET — ADVICE r10), or
    :data:`FRESH_PROBE_WINDOW` on an empty listing, where a total LIST
    outage over a committed tree may have had its earliest versions
    GC'd and the ascent must bridge that gap before concluding the
    tree is fresh.

    Probe candidates may have NEVER EXISTED, and some stores raise
    something other than FileNotFound for a read of a missing key
    (S3A surfacing AccessDenied for HEAD-on-missing without
    s3:ListBucket — ADVICE r10), so ANY unreadable probe other than a
    torn EXISTING file counts as a miss, never as a raising I/O error:
    the listed candidates below keep the strict ADVICE-r9
    classification; up here a false 'io' would turn readable trees
    into hard failures. A TORN probe (exists, content unreadable — a
    crashed commit) resets the miss window and the ascent continues: a
    later commit sequenced above it."""
    best = None
    misses = 0
    n = top
    for _ in range(10_000):  # corruption backstop, never the bound
        n += 1
        try:
            text = fsio.read_text(_vpath(dir_path, stem, n))
        except Exception as e:
            if _classify(e) == "torn":
                misses = 0  # exists: the consecutive run continues
                continue
            misses += 1
            if misses >= miss_window:
                return best
            continue
        misses = 0
        try:
            best = (n, json.loads(text))
        except ValueError:
            pass  # torn content: keep ascending past it
    return best


def read(dir_path: str, stem: str) -> tuple[int, dict] | None:
    """(sequence, doc) of the newest committed pointer, or None when
    the directory holds no readable pointer at all. Tries candidates
    in descending sequence order — a MISSING (GC'd under the reader)
    or UNPARSEABLE (crashed/in-flight commit) max falls back to the
    previous committed file, which is always intact because commits
    never rewrite an existing file; every fallback below the max is
    LOGGED. A transient I/O failure retries and then RAISES instead of
    falling back (ADVICE r9: a permissions or network error on the
    newest pointer must not silently resolve one generation back).

    When a NON-EMPTY candidate list fully fails, the reader raced a
    fast committer whose GC reclaimed every file it listed (possible
    whenever > KEEP commits land between the reader's listing and its
    reads) — re-list and retry: newer committed files now exist, so
    the retry terminates with a strictly fresher pointer. Bounded only
    as a corruption backstop; the race itself converges in one pass."""
    saw_listed_missing = False
    for _ in range(8):
        versions = _versions(dir_path, stem)
        top = versions[-1] if versions else 0
        # ascending direct GETs above the listed max counter LIST lag
        # (r11, ADVICE r10): versions are consecutive, so probing up
        # from top+1 while files exist finds every unlisted commit at
        # one wasted GET on the happy path — and anything strictly
        # above the listing is by construction newer than every
        # listed candidate, so a hit returns immediately
        probed = _probe_above(dir_path, stem, top,
                              FRESH_PROBE_WINDOW if not versions else 1)
        if probed is not None:
            return probed
        for n in reversed(versions):
            kind, text = _read_candidate(_vpath(dir_path, stem, n))
            if text is None:
                # a LISTED file that is MISSING was GC'd under us —
                # proof that newer commits exist somewhere (review
                # r10: this tree must never read as fresh/legacy)
                if kind == "missing":
                    saw_listed_missing = True
                continue  # missing/torn: previous commit is intact
            try:
                doc = json.loads(text)
            except ValueError:
                continue  # torn commit content
            if versions and n < versions[-1]:
                _log.warning(
                    "pointer %s/%s: resolved v%d, falling back below "
                    "listed max v%d (torn or GC'd newer file)",
                    dir_path, stem, n, versions[-1])
            return n, doc
        if not versions:
            break  # nothing resolvable at all: legacy or fresh tree
    if saw_listed_missing:
        # every retry lost the GC race AND files the listing promised
        # are gone: commits exist that this reader cannot see (a LIST
        # lagging so far that even the ascending probe's next version
        # was GC'd). Returning None would make resolve fall back to a
        # legacy/fresh tree and a Catalog initialize EMPTY over real
        # state — refuse instead.
        raise RuntimeError(
            f"pointer {dir_path}/{stem}: listed pointer files vanished "
            f"across 8 retries (listing lags commits beyond what the "
            f"ascending probe can bridge); refusing to treat a "
            "committed tree as empty")
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
