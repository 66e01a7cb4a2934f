"""Property-based tests (hypothesis) for the pure-Python kernel."""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from event_streamer_spark.debug import Debug, debug
from event_streamer_spark.helpers import (
    get_parsed_json,
    to_array,
    to_upper_camel_case,
)

ident = st.text(alphabet=string.ascii_letters + "-_ ", max_size=40)


@given(ident)
@settings(max_examples=200)
def test_camel_case_idempotent_without_separator_runs(s):
    # reference-exact normalization is idempotent only when no
    # consecutive/leading/trailing separators survive the first pass
    once = to_upper_camel_case(s)
    if not set(once) & set("-_ "):
        assert to_upper_camel_case(once) == once


@given(ident)
@settings(max_examples=200)
def test_camel_case_drops_isolated_separators(s):
    # single separators between word chars are always consumed
    import re
    if not re.search(r"[-_ ][-_ ]|^[-_ ]|[-_ ]$", s):
        assert not set(to_upper_camel_case(s)) & set("-_ ")


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_get_parsed_json_never_raises(s):
    # reference returns whatever JSON.parse yields (any JSON type);
    # the only contract is: never raise, unparseable -> None
    import json as _json
    out = get_parsed_json(s)
    if out is not None:
        _json.dumps(out)  # any parsed value is JSON-serializable


@given(st.dictionaries(st.text(max_size=10), st.integers(), max_size=5))
@settings(max_examples=100)
def test_get_parsed_json_roundtrip(d):
    assert get_parsed_json(json.dumps(d)) == d


@given(st.one_of(st.integers(), st.lists(st.integers(), max_size=5)))
def test_to_array_always_list(v):
    out = to_array(v)
    assert isinstance(out, list)
    assert to_array(out) == out  # idempotent on lists


def test_debug_gating_never_raises():
    for level in Debug:
        debug(level, "msg")  # unconfigured → silent, no raise


@given(
    st.floats(
        min_value=1e-9, max_value=1e12, allow_nan=False, allow_infinity=False
    )
)
@settings(max_examples=500, deadline=None)  # first call pays module import
def test_ddsketch_bucket_midpoint_within_alpha(x):
    """The DDSketch mapping used in operators/sketches.py: for ANY
    positive value, the midpoint of its bucket is within alpha relative
    error (the paper's core invariant — quantile accuracy follows)."""
    import math

    from event_streamer_spark.operators.sketches import _DD_ALPHA, _DD_GAMMA

    b = math.ceil(math.log(x) / math.log(_DD_GAMMA))
    est = 2.0 * _DD_GAMMA**b / (_DD_GAMMA + 1)
    # tiny slack for the float log/pow round-trip at bucket boundaries
    assert abs(est - x) <= _DD_ALPHA * x * (1 + 1e-9), (x, b, est)
