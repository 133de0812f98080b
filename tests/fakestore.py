"""In-memory object store with S3-like semantics (VERDICT r9 item 6).

The rename-free pointer protocol (andl_spark.pointer) was proven on
POSIX and file:// URIs; this shim rehearses it against the semantics
object stores actually provide, so the protocol's store requirements
are TESTED statements instead of docstring hopes:

- flat key space — "directories" are synthetic prefixes, mkdirs is a
  no-op, deleting a prefix deletes its objects;
- strong read-after-write for GET/HEAD (S3 since 2020-12; GCS/ABFS);
- LIST optionally LAGGED: a PUT or DELETE becomes visible to listdir
  only after ``lag_ops`` further store operations — the listing-cache /
  eventual-consistency regime the protocol must tolerate (readers fall
  back or retry; committers collision-bump on create);
- ``write_text_create`` is a true conditional PUT (atomic
  create-exclusive — S3 ``If-None-Match``, GCS precondition, ABFS
  create) when ``conditional_put=True``; with ``conditional_put=False``
  it degrades to HEAD-then-PUT with an injectable interleaving hook —
  the S3A-without-conditional-write regime where exclusivity is
  ADVISORY (two racers can both "succeed", last PUT wins);
- no rename exists at all (write_text_atomic raises).

``install(monkeypatch, store, prefix)`` routes every andl_spark.fsio
primitive for paths under ``prefix`` into the store, leaving other
paths on the real backend.
"""

from __future__ import annotations

import posixpath
import threading


class FakeStore:
    def __init__(self, lag_ops: int = 0, conditional_put: bool = True):
        self.lock = threading.RLock()
        self.objects: dict[str, tuple[str, float]] = {}  # path -> (text, mtime)
        self.listed: set[str] = set()      # paths visible to LIST
        self.pending: list[tuple[int, str, str]] = []  # (at_op, op, path)
        self.opcount = 0
        self.clock = 0.0
        self.lag_ops = lag_ops
        self.conditional_put = conditional_put
        #: called between the HEAD and the PUT of a non-conditional
        #: create — the race-injection seam
        self.between_head_and_put = None

    # -- internals ------------------------------------------------------
    def _tick(self) -> float:
        self.opcount += 1
        self.clock += 1.0
        still = []
        for at, op, path in self.pending:
            if self.opcount >= at:
                if op == "add":
                    self.listed.add(path)
                else:
                    self.listed.discard(path)
            else:
                still.append((at, op, path))
        self.pending = still
        return self.clock

    def _list_later(self, op: str, path: str) -> None:
        if self.lag_ops <= 0:
            (self.listed.add if op == "add" else self.listed.discard)(path)
        else:
            self.pending.append((self.opcount + self.lag_ops, op, path))

    def _put(self, path: str, text: str) -> None:
        self.objects[path] = (text, self.clock)
        self._list_later("add", path)

    # -- fsio surface -----------------------------------------------------
    def exists(self, path: str) -> bool:
        with self.lock:
            self._tick()
            return (path in self.objects
                    or any(k.startswith(path + "/") for k in self.objects))

    def read_text(self, path: str) -> str:
        with self.lock:
            self._tick()
            if path not in self.objects:
                raise FileNotFoundError(path)
            return self.objects[path][0]

    def write_text(self, path: str, text: str) -> None:
        with self.lock:
            self._tick()
            self._put(path, text)

    def write_text_atomic(self, path: str, text: str) -> None:
        raise AssertionError(
            f"rename-based write on an object store: {path}")

    def write_text_create(self, path: str, text: str) -> bool:
        with self.lock:
            self._tick()
            if self.conditional_put:
                if path in self.objects:  # atomic If-None-Match
                    return False
                self._put(path, text)
                return True
            # HEAD-then-PUT: the non-atomic regime
            if path in self.objects:
                return False
        hook = self.between_head_and_put
        if hook is not None:
            hook(path)  # a racer may PUT here
        with self.lock:
            self._tick()
            self._put(path, text)  # last PUT wins, unconditionally
            return True

    def listdir(self, path: str) -> list[str]:
        with self.lock:
            self._tick()
            pre = path.rstrip("/") + "/"
            names = set()
            for k in self.listed:
                if k.startswith(pre):
                    names.add(k[len(pre):].split("/", 1)[0])
            return sorted(names)

    def delete(self, path: str) -> None:
        with self.lock:
            self._tick()
            doomed = [k for k in self.objects
                      if k == path or k.startswith(path + "/")]
            for k in doomed:
                del self.objects[k]
                self._list_later("del", k)

    def stat(self, path: str) -> tuple[float, int]:
        with self.lock:
            self._tick()
            if path not in self.objects:
                raise OSError(f"fakestore stat: {path} missing")
            text, mt = self.objects[path]
            return mt, len(text.encode())

    def mkdirs(self, path: str) -> None:
        with self.lock:
            self._tick()  # flat key space: nothing to create


class HybridLaggedStore(FakeStore):
    """Object-store semantics for the PROTOCOL's small files, the real
    filesystem for everything else under the same prefix (r11; VERDICT
    r10 item 8): fsio-written objects — in-flight markers, pointer
    files, meta sidecars, clock probes — live in the fake store with
    its lagged LIST / conditional-PUT / no-rename regime, while
    Spark's parquet generations land on the real local directory and
    surface through the merged listing. This routes the FULL index
    lifecycle (build/seed → ingest → delete → compact → query) through
    the store semantics its maintenance plane must tolerate, as close
    as a single box gets to 'index tree on S3'.

    Documented store requirement surfaced by this shim: the MARKER
    quiesce signal needs LIST-after-PUT visibility within the quiesce
    poll window (S3 LIST is strongly consistent since 2020-12; the lag
    knob models older stores/caching proxies). A marker invisible to
    LIST degrades to the quiesce timeout + post-flip audit path —
    bounded delay, not lost data — and a DELETED marker still listed
    merely delays the flip by one timeout."""

    def exists(self, path: str) -> bool:
        import os

        return super().exists(path) or os.path.exists(path)

    def read_text(self, path: str) -> str:
        with self.lock:
            self._tick()
            if path in self.objects:
                return self.objects[path][0]
        import os

        if os.path.isfile(path):
            with open(path) as f:
                return f.read()
        raise FileNotFoundError(path)

    def listdir(self, path: str) -> list[str]:
        import os

        fake = super().listdir(path)
        real = os.listdir(path) if os.path.isdir(path) else []
        return sorted(set(fake) | set(real))

    def delete(self, path: str) -> None:
        import os
        import shutil

        super().delete(path)
        if os.path.isdir(path) and not os.path.islink(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path) or os.path.islink(path):
            try:
                os.remove(path)
            except OSError:
                pass

    def stat(self, path: str) -> tuple[float, int]:
        with self.lock:
            self._tick()
            if path in self.objects:
                text, mt = self.objects[path]
                return mt, len(text.encode())
        import os

        st = os.stat(path)  # raises OSError when missing (contract)
        return st.st_mtime, st.st_size


_ROUTED = ["exists", "read_text", "write_text", "write_text_atomic",
           "write_text_create", "listdir", "delete", "stat", "mkdirs"]


def install(monkeypatch, store: FakeStore, prefix: str) -> None:
    from andl_spark import fsio

    orig = {name: getattr(fsio, name) for name in _ROUTED}

    def route(name):
        def fn(path, *a, **k):
            if str(path).startswith(prefix):
                return getattr(store, name)(str(path), *a, **k)
            return orig[name](path, *a, **k)
        fn.__name__ = name
        return fn

    for name in _ROUTED:
        monkeypatch.setattr(fsio, name, route(name))


def fake_join(base: str, *parts: str) -> str:
    return posixpath.join(base, *parts)
