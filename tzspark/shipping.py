"""Ship the tzspark package to executors at runtime.

The production launch is ``spark-submit --py-files tzspark.zip`` (north_rule);
this is the in-process equivalent for sessions the harness created before
importing us: zip the package once and ``addPyFile`` it, so executor Python
workers can import tzspark regardless of the driver's cwd or env.
Idempotent and cheap (~100 KB zip, cached)."""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED = set()


def package_zip_path() -> str:
    """Build (once) a --py-files-shaped zip of the tzspark package."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "tzspark_pyfiles.zip")
    src_mtime = max(
        os.path.getmtime(os.path.join(pkg_dir, f))
        for f in os.listdir(pkg_dir)
        if f.endswith(".py")
    )
    if not os.path.exists(out) or os.path.getmtime(out) < src_mtime:
        tmp = out + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for f in sorted(os.listdir(pkg_dir)):
                if f.endswith(".py"):
                    zf.write(os.path.join(pkg_dir, f), f"tzspark/{f}")
        os.replace(tmp, out)
    return out


def ensure_shipped(spark) -> None:
    """addPyFile the package zip to this session (once per session)."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    try:
        sc.addPyFile(package_zip_path())
    except Exception:
        pass  # e.g. file already registered under the same name
    _SHIPPED.add(key)
