"""HTTP schema loader with a per-instance cache.

The reference fetches remote ``$ref`` targets through a caching loader
(``/root/reference/src/keywords/ref_.rs:136-146`` exercises it against an
HTTP mock and asserts call counts). This is the engine's analog: a callable
suitable for ``ScopeBuilder(loader=...)`` that GETs ``http(s)://`` URIs,
parses JSON, and caches by URI so a schema referenced N times is fetched
once. Driver-side only — schema compilation happens before the Ray job
launches (SURVEY.md §3.5 step 1), so workers never perform network IO.
"""

from __future__ import annotations

import json
import urllib.request

from .types import SchemaError


class HttpSchemaLoader:
    """Caching ``uri -> parsed JSON document`` loader.

    ``calls`` counts actual network fetches (cache misses) — the analog of
    the reference mock's expected-request assertions."""

    def __init__(self, timeout: float = 10.0):
        self.timeout = timeout
        self.calls = 0
        self._cache: dict[str, object] = {}

    def __call__(self, uri: str):
        if uri in self._cache:
            return self._cache[uri]
        if not uri.startswith(("http://", "https://")):
            raise SchemaError(f"Loader Error: unsupported scheme for {uri}")
        self.calls += 1
        try:
            with urllib.request.urlopen(uri, timeout=self.timeout) as resp:
                doc = json.loads(resp.read().decode("utf-8"))
        except Exception as exc:
            # compile-time failure, reference-style (ref_.rs:42-44)
            raise SchemaError(f"Loader Error: {uri}: {exc}") from exc
        self._cache[uri] = doc
        return doc
