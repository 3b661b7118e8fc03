"""Column-name normalization (reference parity: P2).

The reference passes every output column name through lodash's
``snakeCase`` (reference: src/clickhouse-batch-client.class.ts:222-267),
e.g. ``someTest`` -> ``some_test``, ``"ba cest un"`` -> ``ba_cest_un``.
This mirrors lodash word-splitting semantics: camelCase boundaries,
acronym boundaries, letter/digit boundaries, and any run of
non-alphanumerics as a separator.
"""

from __future__ import annotations

import re

_BOUNDARIES = (
    re.compile(r"([a-z0-9])([A-Z])"),  # fooBar -> foo_Bar
    re.compile(r"([A-Z]+)([A-Z][a-z])"),  # HTTPServer -> HTTP_Server
    re.compile(r"([A-Za-z])([0-9])"),  # foo2 -> foo_2
    re.compile(r"([0-9])([A-Za-z])"),  # 2bar -> 2_bar
)
_NON_ALNUM = re.compile(r"[^0-9a-zA-Z]+")


def snake_case(name: str) -> str:
    s = name
    for pat in _BOUNDARIES:
        s = pat.sub(r"\1_\2", s)
    s = _NON_ALNUM.sub("_", s)
    return s.strip("_").lower()
