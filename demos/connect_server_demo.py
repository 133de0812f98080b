"""Served-API demo: andl_spark over Spark Connect.

The reference serves its catalog to remote clients through
Andl.Thrift / Andl.Server (REST) / Andl.Host. The Spark-first
equivalent needs zero server code: `AndlSession` (andl_spark/api.py) is
a thin layer over SparkSession, and Spark Connect serves any
SparkSession over gRPC — a remote client gets the same DataFrame API
against this process.

This demo starts the Connect SERVER inside a local SparkSession (the
spark-connect jar ships with pyspark; its gRPC stack is shaded into the
jar, so the server runs with no extra dependencies) and proves it is
listening. It then registers an andl_spark catalog view so a client
would see it.

Client side — gated in this environment: the PyPI packages `grpcio` +
`protobuf` (pyspark[connect] extras) are not installed here and the
build rules forbid installing them. With them present, the client is:

    from pyspark.sql import SparkSession
    remote = SparkSession.builder.remote(f"sc://localhost:{PORT}").getOrCreate()
    remote.sql("SELECT * FROM suppliers").show()   # served by THIS process

Run: python demos/connect_server_demo.py  → prints CONNECT_SERVER_OK.
"""

import socket
import sys
import time
from pathlib import Path

from pyspark.sql import SparkSession


def _free_port() -> int:
    """Ephemeral port: a hard-coded one fails the run for environmental
    reasons when busy (ADVICE r2)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


PORT = _free_port()
REPO = str(Path(__file__).resolve().parent.parent)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("andl-connect-server")
        .config("spark.plugins", "org.apache.spark.sql.connect.SparkConnectPlugin")
        .config("spark.connect.grpc.binding.port", str(PORT))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the served surface: an andl_spark session with a registered relvar
    sys.path.insert(0, REPO)
    from andl_spark.api import AndlSession

    sess = AndlSession(spark)
    sess.register("suppliers", spark.createDataFrame(
        [("S1", "Smith", 20.0), ("S2", "Jones", 10.0)], "sno string, sname string, status double"
    ))
    assert sess.sql("SELECT count(*) AS n FROM suppliers").df.first()["n"] == 2

    # prove the gRPC endpoint is live
    deadline = time.time() + 30
    last_err = None
    while time.time() < deadline:
        try:
            with socket.create_connection(("localhost", PORT), timeout=2):
                print("CONNECT_SERVER_OK port", PORT)
                spark.stop()
                return 0
        except OSError as e:
            last_err = e
            time.sleep(1)
    print("CONNECT_SERVER_FAIL", last_err)
    spark.stop()
    return 1


if __name__ == "__main__":
    sys.exit(main())
