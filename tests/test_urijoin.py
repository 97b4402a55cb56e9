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
