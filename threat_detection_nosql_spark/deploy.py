"""Ship this package to Spark Python workers.

Pandas-UDF closures (mapInPandas / applyInPandas scoring kernels)
reference package helpers; cloudpickle serializes those by module
reference, so every Python worker must be able to
``import threat_detection_nosql_spark``. Under a session launched from
the repo root that works by cwd accident — under the round driver's
vanilla session (arbitrary cwd) it does not, and on a real
1000-executor cluster it never would.

The cluster-correct answer is the same in both cases: distribute the
package with ``SparkContext.addPyFile`` (executors prepend shipped
archives to the worker ``sys.path``). We zip the installed package
directory once per SparkContext and register it lazily from
``sources.readers.load_table`` — the choke point every query passes
through — so any session, however constructed, is covered.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()  # applicationIds already covered
_ZIP_PATH: str | None = None  # one zip per process, removed at exit


def _build_zip() -> str:
    """Zip the package source tree (importable at archive root).
    Built once per process; the temp file is cleaned up at exit so
    repeated sessions (test runs) don't leak zips in the temp dir."""
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, zip_path = tempfile.mkstemp(suffix=".zip",
                                    prefix=f"{pkg_name}_")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    _ZIP_PATH = zip_path
    atexit.register(lambda p=zip_path: os.path.exists(p) and os.remove(p))
    return zip_path


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Idempotently addPyFile the package zip for this SparkContext."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    sc.addPyFile(_build_zip())
    _SHIPPED.add(app_id)
