"""Deploy artifact (r8): the --py-files zip must be complete and
importable via zipimport in a CLEAN interpreter — exactly how a Spark
executor resolves UDF-closure imports on a cluster where the package
was never pip-installed."""

import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
import make_artifact  # noqa: E402


def test_artifact_zipimports_clean(tmp_path):
    out = make_artifact.build(tmp_path)
    assert out.exists() and out.stat().st_size > 10_000
    # byte-determinism: the same tree produces the identical artifact
    again = make_artifact.build(tmp_path / "again")
    assert out.read_bytes() == again.read_bytes()

    # a clean subprocess with ONLY the zip on sys.path (plus site-pkgs
    # for pyspark/numpy) must import the package and reach code in
    # every subpackage — no repo checkout, like an executor
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import andl_spark; "
        "from andl_spark.pipeline.simsearch import cosine_sql; "
        "from andl_spark.lang.parser import parse; "
        "from andl_spark.streaming import events; "
        "from andl_spark.operators import runfold; "
        "from andl_spark.sources import catalog; "
        "from andl_spark import fsio; "
        "assert 'list_dot' in cosine_sql('a','b'); "
        "print(andl_spark.__version__)"
    )
    r = subprocess.run(
        [sys.executable, "-c", probe, str(out)],
        capture_output=True, text=True, timeout=120,
        cwd=str(tmp_path),  # NOT the repo root — the zip must suffice
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == andl_version()


def andl_version():
    import andl_spark
    return andl_spark.__version__
