"""Build the cluster deploy artifact: a zipimport-able zip of the
``andl_spark`` package for ``spark-submit --py-files`` (the standard
way pure-Python code ships to a 1000-executor cluster — every executor
prepends the zip to sys.path, so UDF closures resolve their imports
without any per-node install).

    python tools/make_artifact.py            # -> dist/andl_spark-<ver>.zip
    spark-submit --py-files dist/andl_spark-0.1.0.zip your_job.py

Deterministic by construction: fixed file order, zeroed timestamps —
the same tree always produces byte-identical artifacts, so a cluster
cache / content-addressed store never sees spurious new versions.
Source-only (.py); tests, caches, and compiled files are excluded.
A wheel built from pyproject.toml works too where build tooling exists;
this zip needs only the stdlib and is what --py-files consumes natively.
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "andl_spark"

# zeroed DOS timestamp (1980-01-01 — zip's epoch): determinism beats
# mtime fidelity for a deploy artifact
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out_dir: pathlib.Path | str | None = None) -> pathlib.Path:
    sys.path.insert(0, str(REPO))
    from andl_spark import __version__

    out_dir = pathlib.Path(out_dir) if out_dir else REPO / "dist"
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"andl_spark-{__version__}.zip"
    files = sorted(p for p in PKG.rglob("*.py")
                   if "__pycache__" not in p.parts)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)), date_time=_EPOCH)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
