"""$ref URI-join parity: the 14-case table at src/keywords/ref_.rs:74-95."""

import pytest

from jsonschema_validator_ray.jsonvalidate.urijoin import full_uri


@pytest.mark.parametrize(
    "base,ref,expected",
    [
        # Fragment update only
        ("memory://d0", "#", "memory://d0#"),
        ("memory://d1#", "#", "memory://d1#"),
        ("memory://d2#/old/fragment", "#", "memory://d2#"),
        ("memory://d3#", "#/new/fragment", "memory://d3#/new/fragment"),
        ("memory://d4#/old/fragment", "#/new/fragment", "memory://d4#/new/fragment"),
        ("memory://d5/file#", "#/new/fragment", "memory://d5/file#/new/fragment"),
        ("memory://d6/file#/old/fragment", "#/new/fragment", "memory://d6/file#/new/fragment"),
        # Relative within the same "folder"
        ("memory:///file", "new_file_on_empty_domain", "memory:///new_file_on_empty_domain"),
        ("memory://d7/file", "new_file", "memory://d7/new_file"),
        ("memory://d8/file", "new_file#/fragment", "memory://d8/new_file#/fragment"),
        ("memory://d9/file#/old/fragment", "new_file#/new/fragment", "memory://d9/new_file#/new/fragment"),
        # Relative and absolute paths
        ("memory://d10/p0/p1/p2", "./new_path", "memory://d10/p0/p1/new_path"),
        ("memory://d11/p0/p1/p2", "../new_path", "memory://d11/p0/new_path"),
        ("memory://d12/p0/p1/p2", "/new_path", "memory://d12/new_path"),
        # Full url substitution
        ("memory://d13/file", "memory://new_path", "memory://new_path"),
    ],
)
def test_full_uri(base, ref, expected):
    assert full_uri(base, ref) == expected


class TestResolvePointerDecodeOrder:
    """RFC 6901 §6 decode ORDER (VERDICT r4 item 4): the whole fragment is
    percent-decoded FIRST, then split on '/', then each token ~-unescaped.
    An encoded ``%2F`` therefore SEPARATES tokens; a member name containing
    a literal '/' must be addressed via ``~1`` instead."""

    def _resolve(self, doc, frag):
        from jsonschema_validator_ray.jsonvalidate.schema import \
            _resolve_pointer
        return _resolve_pointer(doc, frag)

    def test_percent_2f_separates_tokens(self):
        doc = {"a": {"b": 42}, "a/b": "wrong"}
        assert self._resolve(doc, "/a%2Fb") == 42

    def test_tilde_1_addresses_literal_slash_member(self):
        doc = {"a": {"b": 42}, "a/b": "right"}
        assert self._resolve(doc, "/a~1b") == "right"

    def test_percent_7e_decodes_before_tilde_unescape(self):
        # %7E0 decodes to '~0' which THEN unescapes to '~'
        doc = {"~": "tilde"}
        assert self._resolve(doc, "/%7E0") == "tilde"

    def test_official_escaped_pointer_cases(self):
        # the draft4 suite's "escaped pointer ref" member names
        doc = {"tilde~field": 1, "slash/field": 2, "percent%field": 3}
        assert self._resolve(doc, "/tilde~0field") == 1
        assert self._resolve(doc, "/slash~1field") == 2
        assert self._resolve(doc, "/percent%25field") == 3
