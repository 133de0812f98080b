"""Served API over Spark Connect (Andl.Server / Andl.Thrift parity).

Runs demos/connect_server_demo.py in a subprocess (the Connect plugin
must load at JVM start, so it cannot attach to the shared test
session): starts a Connect gRPC server around an andl_spark
AndlSession and proves the endpoint is live. The Python *client* is
gated on grpcio/protobuf, which this environment does not ship — the
demo's docstring carries the exact client snippet for an environment
that has them.
"""

import subprocess
import sys
from pathlib import Path

DEMO = Path(__file__).resolve().parent.parent / "demos" / "connect_server_demo.py"


def test_connect_server_binds():
    proc = subprocess.run(
        [sys.executable, str(DEMO)],
        capture_output=True, text=True, timeout=180,
    )
    assert "CONNECT_SERVER_OK" in proc.stdout, proc.stdout + proc.stderr
    assert proc.returncode == 0
