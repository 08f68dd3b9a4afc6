"""Driver-local reads for tiny artifact sidecars.

Every persisted artifact in this package carries an underscore-hidden
sidecar (a content witness, a completion marker, the quantizer's
centroid table) that is read back on every open.  These are one-row to
nlist-row parquet files — launching a distributed Spark job to fetch
them costs a full scheduling round-trip (~0.1 s each, and the
incremental cluster entry opens three stores per call) for data the
driver could read in microseconds.  ``sidecar_rows`` reads them with
pyarrow directly on the driver when the path is driver-visible, and
falls back to a Spark read for remote URIs (hdfs://, s3a://, ...)
where the driver has no filesystem client.

Failure contract matches ``spark.read.parquet(loc).collect()``: an
absent or unreadable sidecar RAISES (FileNotFoundError / pyarrow
errors) — the compute-if-missing callers treat any exception as
"rebuild", so the two paths are interchangeable.
"""

from __future__ import annotations

import glob
import os
import re

#: Anything with a URI scheme other than file: is not guaranteed
#: driver-visible; read it through Spark.
_REMOTE_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def sidecar_rows(spark, loc: str) -> list[dict]:
    """Rows of the tiny parquet at ``loc`` as dicts, without a Spark
    job when the path is driver-local.  Raises when absent/unreadable
    (the same contract as a Spark read + collect)."""
    path = loc
    if path.startswith("file:"):
        path = re.sub(r"^file:(//)?", "", path)
    elif _REMOTE_SCHEME.match(path):
        return [r.asDict() for r in spark.read.parquet(loc).collect()]
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(
            f"no parquet files under {path} (absent or torn sidecar)"
        )
    import pyarrow.parquet as pq

    out: list[dict] = []
    for f in files:
        out.extend(pq.read_table(f).to_pylist())
    return out
