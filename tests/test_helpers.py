"""Unit tests mirroring the reference helper suite
(``src/helpers/__tests__/index.test.ts``; SURVEY §5 unit layer)."""

from event_streamer_spark.helpers import (
    get_parsed_json,
    to_array,
    to_upper_camel_case,
)


class TestUpperCamelCase:
    def test_kebab(self):
        assert to_upper_camel_case("event-code-c") == "EventCodeC"

    def test_snake(self):
        assert to_upper_camel_case("my_event_name") == "MyEventName"

    def test_space(self):
        assert to_upper_camel_case("my event") == "MyEvent"

    def test_lower_camel(self):
        assert to_upper_camel_case("myEventName") == "MyEventName"

    def test_already_upper(self):
        assert to_upper_camel_case("EventName") == "EventName"

    def test_single_word(self):
        assert to_upper_camel_case("topic") == "Topic"

    def test_consecutive_separators(self):
        # reference regex /[-_ ]./ consumes sep+next-char pairs
        # non-overlappingly: the second separator of a run IS the
        # "uppercased" char, so runs survive by one
        assert to_upper_camel_case("a--b__c  d") == "A-b_c d"

    def test_leading_separator_kept(self):
        # charAt(0) is the separator itself; slice(1) has no sep pair
        assert to_upper_camel_case("-abc") == "-abc"

    def test_trailing_separator_kept(self):
        # a trailing separator has no following char to match
        assert to_upper_camel_case("abc-") == "Abc-"

    def test_mixed_separators(self):
        assert to_upper_camel_case("foo-bar_baz qux") == "FooBarBazQux"

    def test_empty(self):
        assert to_upper_camel_case("") == ""


class TestToArray:
    def test_scalar(self):
        assert to_array(1) == [1]

    def test_list_passthrough(self):
        assert to_array([1, 2]) == [1, 2]

    def test_dict_wraps(self):
        assert to_array({"a": 1}) == [{"a": 1}]


class TestGetParsedJson:
    def test_valid_object(self):
        assert get_parsed_json('{"a": 1}') == {"a": 1}

    def test_bytes(self):
        assert get_parsed_json(b'{"a": 1}') == {"a": 1}

    def test_invalid_json(self):
        assert get_parsed_json("{nope") is None

    def test_none(self):
        assert get_parsed_json(None) is None

    def test_non_object_json_returned_like_reference(self):
        # reference returns whatever JSON.parse yields; dispatch then
        # matches such content only against catch-all routes
        assert get_parsed_json("[1,2]") == [1, 2]
        assert get_parsed_json('"str"') == "str"
        assert get_parsed_json("5") == 5
        assert get_parsed_json("null") is None  # dropped like corrupt

    def test_null_wraps_to_empty_array(self):
        assert to_array(None) == []

    def test_bad_bytes(self):
        assert get_parsed_json(b"\xff\xfe") is None

    def test_dict_passthrough(self):
        assert get_parsed_json({"a": 1}) == {"a": 1}
