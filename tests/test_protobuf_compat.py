"""Unit tests for the vendored-protobuf resolver (C8 v2 enabler).

The resolver's job: give every process that touches the
transformWithStateInPandas protocol a REAL ``google.protobuf`` —
including processes where Spark's spark-core jar shadows the name as
an empty namespace package (see module docstring of
``event_streamer_spark.protobuf_compat``).
"""

import subprocess
import sys

import pytest

from event_streamer_spark import protobuf_compat


def test_ensure_protobuf_resolves_real_runtime():
    """In this container the resolver must find a runtime (pip or the
    gcloud-vendored 6.x) and the full descriptor machinery must load —
    the exact import the spark-core namespace ghost breaks."""
    assert protobuf_compat.ensure_protobuf()
    import google.protobuf as pb

    assert pb.__file__ is not None  # real package, not a namespace
    from google.protobuf import descriptor, json_format  # noqa: F401

    major = int(pb.__version__.split(".")[0])
    assert major >= 5  # pyspark 4.x gencode needs a >=5.x-era runtime


def test_ensure_protobuf_idempotent():
    before = list(sys.path)
    assert protobuf_compat.ensure_protobuf() == protobuf_compat.ensure_protobuf()
    # second call must not keep appending path entries
    assert sys.path.count(protobuf_compat._VENDOR_CANDIDATES[0]) <= 1
    assert len(sys.path) == len(before)


def test_statemessage_pb2_loads_and_roundtrips():
    """pyspark's generated StateMessage module must import under the
    resolved runtime (the relaxed minor-skew gate) and round-trip a
    message bit-exactly."""
    assert protobuf_compat.ensure_protobuf()
    from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

    req = sm.StateRequest(version=2)
    blob = req.SerializeToString()
    assert sm.StateRequest.FromString(blob) == req


def test_namespace_ghost_is_purged_in_subprocess():
    """Reproduce the worker failure mode: a sys.path entry that offers
    ``google/protobuf/`` with no __init__ (like the spark-core jar)
    makes the bare import succeed as an empty namespace. The resolver
    must detect it, purge it, and land on the real runtime."""
    code = """
import os, sys, tempfile
ghost = tempfile.mkdtemp()
os.makedirs(os.path.join(ghost, "google", "protobuf"))
sys.path.insert(0, ghost)

import google.protobuf as pb
assert getattr(pb, "__file__", None) is None, "precondition: ghost namespace"

sys.path.insert(0, {repo!r})
from event_streamer_spark import protobuf_compat
assert protobuf_compat.ensure_protobuf(), "resolver failed"
import google.protobuf as pb2
assert pb2.__file__ is not None, "still a namespace after resolve"
from google.protobuf import descriptor
print("OK")
""".format(repo="/root/repo")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_kill_switch_disables_vendoring():
    """SPARK_GRAFT_NO_VENDOR_PROTOBUF must force the unavailable path
    when no pip protobuf exists (subprocess: clean module state)."""
    code = """
import os, sys
os.environ["SPARK_GRAFT_NO_VENDOR_PROTOBUF"] = "1"
sys.path.insert(0, "/root/repo")
from event_streamer_spark import protobuf_compat
try:
    import google.protobuf  # noqa: F401
    has_pip = google.protobuf.__file__ is not None
except ImportError:
    has_pip = False
got = protobuf_compat.ensure_protobuf()
assert got == has_pip, (got, has_pip)
print("OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
