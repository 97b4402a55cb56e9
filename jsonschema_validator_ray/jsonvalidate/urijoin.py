"""RFC-3986 URI join matching ``url::Url::join`` semantics for ``memory://`` URLs.

The reference resolves ``$ref`` strings against the schema's base URL with
``Url::join`` (src/keywords/ref_.rs:19-21); its behavior is pinned by the
14-case table at src/keywords/ref_.rs:74-95 (fragment replacement, relative,
``./`` / ``../``, absolute path, full-URL substitution). Python's
``urllib.parse.urljoin`` implements the same RFC; we only need to register the
``memory`` scheme so it participates in relative resolution.
"""

from __future__ import annotations

from urllib import parse as _parse

for _registry in (_parse.uses_relative, _parse.uses_netloc, _parse.uses_fragment):
    if "memory" not in _registry:
        _registry.append("memory")


def full_uri(base_path: str, json_reference: str) -> str:
    """Join ``json_reference`` against ``base_path`` per RFC 3986.

    One divergence of ``urljoin`` from ``Url::join``: joining the bare fragment
    ``"#"`` yields ``"...#"`` in Rust (empty fragment kept) while urljoin drops
    a lone ``"#"`` when the base has no fragment separator. Url::join always
    keeps the ``#`` separator, so we restore it.
    """
    joined = _parse.urljoin(base_path, json_reference)
    if json_reference.startswith("#") and "#" not in joined:
        joined += "#"
    return joined


def split_fragment(uri: str) -> tuple[str, str]:
    """Split a URI into (document URI, fragment)."""
    if "#" in uri:
        doc, frag = uri.split("#", 1)
        return doc, frag
    return uri, ""
