"""Canonical JSON writer.

The reference emits JSON via Gson with insertion-ordered keys and compact
separators (golden: ``{"Output":[{"foo":2}]}`` —
src/test/java/com/google/cloud/healthcare/etl/pipeline/MappingFnTest.java:105-150).
Spark's ``to_json`` produces the same compact form, so the engine's two
backends (Catalyst VARIANT expressions and pandas UDFs) must agree with each
other AND with the goldens. This module is the single definition of "what a
JSON output byte-for-byte looks like" for the Python side; it is unit-tested
against Spark's ``to_json`` output.

Rules:
* insertion-ordered object keys (Python dicts already preserve this)
* compact separators ``,`` ``:``
* no ASCII-escaping of non-ASCII (UTF-8 passthrough, like Gson/Spark)
* ints print as ints, floats as shortest repr (json module default)
"""

from __future__ import annotations

import json
from typing import Any

_MISSING = object()  # sentinel: field absent (Whistle nil-propagation)


def dumps(value: Any) -> str:
    s = json.dumps(_strip_missing(value), ensure_ascii=False, separators=(",", ":"))
    return _uppercase_control_escapes(s)


def _uppercase_control_escapes(s: str) -> str:
    """Jackson (Spark's to_json) writes control-character escapes with
    UPPERCASE hex (``\\u000F``); Python's json module writes lowercase.
    With ensure_ascii=False the ONLY ``\\uXXXX`` escapes the json module
    emits are control chars (``\\u00xx``), so an escape-aware scan that
    uppercases their hex digits makes the two writers byte-identical."""
    if "\\u" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u" and i + 6 <= n:
                out.append("\\u")
                out.append(s[i + 2 : i + 6].upper())
                i += 6
            else:
                out.append(s[i : i + 2])  # \\, \", \n, ... — skip as a pair
                i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _load_float(raw: str):
    """Float literals mimic Spark VARIANT's number handling so both engine
    backends render identically: a PLAIN-notation literal parses as decimal
    and strips trailing zeros ("3.0" -> 3 -> renders "3"), while an
    exponent-notation literal takes the double path (python repr, which
    matches Java's rendering inside the portable envelope — see
    mapping_compile._num_out). Precision beyond IEEE double (VARIANT keeps
    38 decimal digits) is outside the envelope and may diverge."""
    f = float(raw)
    if "e" not in raw and "E" not in raw and f.is_integer():
        return int(f)
    return f


def loads(s: str) -> Any:
    return json.loads(s, parse_float=_load_float)


def _strip_missing(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _strip_missing(v) for k, v in value.items() if v is not _MISSING}
    if isinstance(value, list):
        return [_strip_missing(v) for v in value if v is not _MISSING]
    return value


def canon_sort(value: Any) -> Any:
    """Recursively sort object keys — the engine's canonical form for
    DATA-DERIVED objects. Spark's VARIANT binary format stores object fields
    key-sorted, so anything passed through the column backend comes out
    sorted; the pandas backend applies this to extracted values so the two
    backends agree byte-for-byte. (Config-built structure keeps config
    order in both backends — named_struct / dict insertion order.)"""
    if isinstance(value, dict):
        return {k: canon_sort(value[k]) for k in sorted(value)}
    if isinstance(value, list):
        return [canon_sort(v) for v in value]
    return value
