"""Driver-contract registry.

Central table of (name → query builder, name → DuckDB oracle SQL). Each
engine module registers its demonstration queries here; `__spark_entry__.py`
re-exports. Keeping it in one module makes the SURVEY §2 coverage auditable
in one place.

Contract rules (see /root/repo/__spark_entry__.py docstring):
- every callable takes (spark, sf_dir) and returns a DataFrame;
- column names must match the oracle exactly (driver sorts columns by name
  and hashes values);
- float outputs are computed via exact DECIMAL where aggregation order could
  change double bits, or rounded where the computation is per-row
  deterministic;
- oracle omitted ⇒ driver records a weaker rows-only check (reserved for
  genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query registration: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: _cwd_independent(fn) for name, fn in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


def registry_fingerprints() -> dict[str, str]:
    """name → md5(fn source ‖ oracle SQL), in registration order — the
    change-detection basis for the ORDERING CONTRACT (new/changed queries
    must sit inside the driver's first-50 sample window; enforced by
    tests/test_registry_order.py against tests/registry_manifest.json).

    Limitation, by design: the hash covers the registered plan function's
    own source and its oracle string. A behavior change buried in a
    library helper (ext/, operators/) does not move it — rotating those
    callers remains a review judgment (note it in the rotation commit)."""
    import hashlib
    import inspect

    _ensure_loaded()
    out: dict[str, str] = {}
    for name, fn in _QUERIES.items():
        src = inspect.getsource(fn)
        sql = _ORACLES.get(name, "")
        out[name] = hashlib.md5((src + "\x00" + sql).encode()).hexdigest()
    return out


# Keyed on sc.applicationId, not id(sc): after a stopped context is
# garbage-collected a new one can reuse the same id() and would silently
# skip the addPyFile (advisor r11).
_SHIPPED: set[str] = set()
_PKG_ZIP: str | None = None


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Make `scripts_toolkit_spark` importable on Python workers no matter
    where the launching process's cwd is: zip the package once per process
    and `addPyFile` it once per SparkContext. When the driver runs from the
    repo root (the normal case) workers already resolve the package via
    cwd and this is a no-op cost-wise; any other launcher (a notebook, a
    service, `spark-submit` from elsewhere) gets the mapInPandas decoder
    imports for free — the standard Spark mechanism for shipping Python
    deps, and exactly what a real cluster (non-shared filesystem) needs."""
    global _PKG_ZIP
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    if _PKG_ZIP is None or not os.path.exists(_PKG_ZIP):
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zpath = os.path.join(
            tempfile.gettempdir(), f"scripts_toolkit_spark_{os.getpid()}.zip"
        )
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "scripts_toolkit_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
        _PKG_ZIP = zpath
    sc.addPyFile(_PKG_ZIP)
    _SHIPPED.add(sc.applicationId)


def _cwd_independent(fn: QueryFn) -> QueryFn:
    """Wrap a registered query so its first invocation on a session ships
    the package to workers (see ensure_workers_can_import). Purely a
    session-setup side effect — the returned plan is fn's, untouched."""
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return wrapped


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from scripts_toolkit_spark import registry  # noqa: F401

    _LOADED = True
