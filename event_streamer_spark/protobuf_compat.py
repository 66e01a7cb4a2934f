"""Locate a usable ``google.protobuf`` runtime for the Spark-4 stateful-v2 leg.

``transformWithStateInPandas`` (the arbitrary-stateful v2 API, SURVEY
§2.C C8) talks to the JVM state server over a protobuf protocol
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``).  The container
has no ``protobuf`` pip package and no network, but the Google Cloud
SDK installed at ``/usr/lib/google-cloud-sdk`` bundles a complete
pure-Python protobuf runtime (6.32.0) under its App Engine platform
tree.  :func:`ensure_protobuf` makes that runtime importable as
``google.protobuf`` — appended to ``sys.path`` (never prepended, so a
real pip install always wins) — and relaxes protobuf's strict
gencode/runtime version gate for the one skew this introduces:
pyspark 4.1.2's generated code says 6.33.0, the bundled runtime is
6.32.0.  Nothing in the StateMessage schema uses a 6.33-only feature
(the full C8 execution test pins v2 == v1 == batch), so a same-major,
minor-older runtime is safe; the patch still rejects major skew.

Two traps this module exists to handle:

1. **The spark-core jar shadows the package as an empty namespace.**
   Spark puts ``.../jars/spark-core_*.jar`` on every Python worker's
   ``sys.path``, and that jar carries ``google/protobuf/*.proto``
   resource files — so ``import google.protobuf`` SUCCEEDS as a
   namespace package with no modules in it, and the real failure only
   surfaces later as ``cannot import name 'descriptor'``.  A bare
   try/except-ImportError availability probe is therefore wrong; the
   probe must check the import produced a real package
   (``__file__ is not None``) and purge the namespace ghost from
   ``sys.modules`` before retrying against the vendored runtime.

2. **Three distinct processes touch the protocol.**  The driver
   (plan + first pb2 import via the driver-side pre-init worker), the
   pre-init worker itself (a separate Python process the JVM launches
   from ``TransformWithStateInPySparkExec``), and every executor-side
   Python worker.  The operator calls :func:`ensure_protobuf` before
   building the plan (driver), and the StatefulProcessor subclass
   calls it from ``__setstate__``/``init`` so the two worker kinds
   resolve the runtime at UNPICKLE time — before pyspark's
   ``set_handle_state`` performs the first pb2 import.  (The
   processor must pickle with non-empty state or CPython skips
   ``__setstate__`` entirely.)

Set ``SPARK_GRAFT_PROTOBUF_PATH`` to point somewhere else, or
``SPARK_GRAFT_NO_VENDOR_PROTOBUF=1`` to disable the fallback entirely
(the C8 operator then downgrades to its tested applyInPandasWithState
v1 path).
"""

from __future__ import annotations

import os
import sys

# Directories whose ``google/protobuf`` subtree is a complete protobuf
# runtime.  Only same-major-as-gencode runtimes belong here; the gcloud
# SDK's App Engine platform tree ships 6.32.0 (pure Python).
_VENDOR_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_checked: bool | None = None


def _relax_runtime_version_gate() -> None:
    """Allow a runtime one or more MINOR versions older than gencode.

    protobuf >= 5.27 hard-fails when the runtime is older than the
    version that generated a ``_pb2.py`` file, even within the same
    major version (``runtime_version.ValidateProtobufRuntimeVersion``).
    The cross-version guarantee protobuf documents is per-MAJOR; the
    StateMessage schema round-trips on 6.32 (execution-tested), so we
    downgrade the same-major "runtime older than gencode" case from an
    error to silence while keeping the real cross-major error.
    """
    try:
        from google.protobuf import runtime_version as _rv
    except ImportError:  # pre-5.27 runtimes have no gate at all
        return
    if getattr(_rv.ValidateProtobufRuntimeVersion, "_es_relaxed", False):
        return
    _orig = _rv.ValidateProtobufRuntimeVersion

    def _validate(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):  # noqa: ANN001
        if gen_major == _rv.MAJOR:
            return  # same major: accept any minor/patch skew
        _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)

    _validate._es_relaxed = True  # type: ignore[attr-defined]
    _rv.ValidateProtobufRuntimeVersion = _validate


def _import_real_protobuf() -> bool:
    """Import ``google.protobuf`` and require it be a real package.

    A namespace-package hit (``__file__ is None`` — e.g. the proto
    RESOURCE files inside Spark's spark-core jar) is treated as absent
    and purged from ``sys.modules`` so a later attempt can resolve the
    regular package instead.
    """
    try:
        import google.protobuf as _pb
    except ImportError:
        return False
    if getattr(_pb, "__file__", None) is not None:
        return True
    for mod in [
        m for m in sys.modules
        if m == "google.protobuf" or m.startswith("google.protobuf.")
    ]:
        del sys.modules[mod]
    return False


def ensure_protobuf() -> bool:
    """Make a REAL ``google.protobuf`` importable; return True on success.

    Idempotent and cheap after the first call.  Tries the already-
    installed package first, then the vendor candidates (appended to
    ``sys.path``).  On success the gencode/runtime minor-skew gate is
    relaxed (see :func:`_relax_runtime_version_gate`).
    """
    global _checked
    if _checked is not None:
        return _checked

    if _import_real_protobuf():
        _relax_runtime_version_gate()
        _checked = True
        return True

    if os.environ.get("SPARK_GRAFT_NO_VENDOR_PROTOBUF"):
        _checked = False
        return False

    override = os.environ.get("SPARK_GRAFT_PROTOBUF_PATH")
    candidates = ((override,) if override else ()) + _VENDOR_CANDIDATES
    for cand in candidates:
        if not cand or not os.path.isdir(os.path.join(cand, "google", "protobuf")):
            continue
        # The bundled runtime is pure Python; pin the implementation so
        # protobuf never probes for the absent C/upb extension.
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        sys.path.append(cand)
        if _import_real_protobuf():
            _relax_runtime_version_gate()
            _checked = True
            return True
        sys.path.remove(cand)

    _checked = False
    return False
