"""PromQL-style label-selector parsing.

Accepts ``{namespace="qa",pod="app-abc",container="app"}`` — the
reference CLI's query syntax (reference ``y-logcli:83-102``: strip
braces, split on commas, split ``k="v"`` pairs, trim whitespace).
"""

from __future__ import annotations

SELECTOR_KEYS = ("namespace", "pod", "container", "cluster", "node", "stream")


def parse_selector(query: str) -> dict[str, str]:
    """Parse a selector expression into an ordered dict of equalities.

    Unknown keys raise (the reference silently ignores them when building
    the glob, which hides typos — being strict is safer and still accepts
    every query the reference accepts).
    """
    s = query.strip()
    if s.startswith("{"):
        if not s.endswith("}"):
            raise ValueError(f"unbalanced braces in selector {query!r}")
        s = s[1:-1]
    out: dict[str, str] = {}
    if not s.strip():
        return out
    for pair in s.split(","):
        pair = pair.strip()
        if "=" not in pair:
            raise ValueError(f"bad selector pair {pair!r} (expected key=\"value\")")
        key, val = pair.split("=", 1)
        key = key.strip()
        val = val.strip()
        if len(val) >= 2 and val[0] == '"' and val[-1] == '"':
            val = val[1:-1]
        if key not in SELECTOR_KEYS:
            raise ValueError(f"unknown selector key {key!r} (known: {SELECTOR_KEYS})")
        out[key] = val
    return out
