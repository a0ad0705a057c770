"""Mapping-config compiler: two backends for the reference's Whistle engine.

The reference runs one heavyweight Whistle ``Engine`` per JVM and calls
``engine.transform(json)`` per record (MappingFn.java:212-225). We compile the
config ONCE at the driver into either:

1. **Catalyst VARIANT expressions** (`backend="columns"`, the default when the
   config is projective): every path access becomes
   ``try_variant_get(try_parse_json(data), '$.path', 'variant')`` and the
   output object is assembled with ``named_struct``/``array`` + ``to_json``.
   This keeps the entire per-record transform inside whole-stage codegen —
   zero Python in the hot path, which is how a 100 TB scan stays fast. Type
   fidelity (``{"foo":2}`` vs ``{"foo":"2"}``) is preserved because VARIANT
   carries the source JSON type end-to-end. Missing paths yield variant NULL,
   which ``to_json`` omits (Whistle nil-propagation for free).

2. **pandas/Arrow UDF** (`backend="pandas"`): the compiled closure is applied
   per element of an Arrow batch — never per-row Python over the wire. This is
   the fallback for configs outside the projective subset and the bit-exactness
   oracle for the column backend (tests assert both agree).

Compile-time validation is fail-fast (MappingFnTest.java:66-75: a garbage
config must fail before the pipeline starts).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model.errors import RecoverableMappingError
from . import json_canon
from .json_canon import _MISSING
from .mapping_lang import (
    Call,
    Lit,
    MappingConfig,
    MappingConfigError,
    Path,
    parse_mapping_config,
)


class CompiledMapping:
    """A mapping config compiled for both execution backends."""

    def __init__(self, config_text: str):
        self.config_text = config_text
        self.config: MappingConfig = parse_mapping_config(config_text)
        self._py = _compile_python(self.config)

    # ---------------------------------------------------------- column backend
    def supports_columns(self) -> bool:
        try:
            self.output_column(F.lit("{}"))
            return True
        except MappingConfigError:
            return False

    def output_column(self, data_col: Column | str) -> Column:
        """Compile to a single Column: data JSON string -> output JSON string.

        Raises MappingConfigError if the config is outside the projective
        subset (caller falls back to the pandas backend).
        """
        data_col = F.col(data_col) if isinstance(data_col, str) else data_col
        return self.output_column_from_variant(F.try_parse_json(data_col))

    def output_column_from_variant(self, root: Column) -> Column:
        """Same, over an already-parsed VARIANT root — callers that also need
        the parse result for error detection parse ONCE and share it (JSON
        parsing is the dominant per-row cost; see operators/mapping_op.py)."""
        targets: dict[str, list[Column]] = {}
        for tgt, expr in self.config.outs:
            targets.setdefault(tgt, []).append(_render(_compile_expr(self.config, expr, {"root": root})))
        fields = []
        for tgt, items in targets.items():
            fields.extend([F.lit(tgt), F.array(*items)])
        return F.to_json(F.named_struct(*fields))

    # ---------------------------------------------------------- python backend
    def transform(self, data: str) -> str:
        """Per-record JSON->JSON (the ``engine.transform`` analogue).

        Raises :class:`RecoverableMappingError` on malformed input JSON — a
        data problem the caller (mapping operator) converts into an
        ErrorEntry, mirroring MappingFnTest.java:77-103 (bad input -> no
        output + one error). Any OTHER exception is an engine problem and
        propagates, per the reference's fatal-vs-recoverable classification
        (ErrorEnabledDoFn.java:75-77).
        """
        try:
            obj = json_canon.loads(data)
        except ValueError as e:
            raise RecoverableMappingError(f"invalid input JSON: {data}") from e
        return json_canon.dumps(self._py(obj))


# ------------------------------------------------------------------ internals
# column backend: expr -> JValue (either a variant Column or a struct tree)


class _StructVal:
    def __init__(self, fields: list[tuple[str, Any]]):
        self.fields = fields


def _compile_expr(cfg: MappingConfig, expr, env: dict[str, Column]):
    if isinstance(expr, Lit):
        return F.parse_json(F.lit(json_canon.dumps(expr.value)))
    if isinstance(expr, Path):
        base = env[expr.var]
        if not expr.parts:
            return base
        path = "$" + "".join(
            f"[{p}]" if isinstance(p, int) else f".{p}" for p in expr.parts
        )
        return F.try_variant_get(base, path, "variant")
    if isinstance(expr, Call):
        proj = cfg.projectors[expr.name]
        args = [_compile_expr(cfg, a, env) for a in expr.args]
        for a in args:
            if isinstance(a, _StructVal):
                raise MappingConfigError(
                    "column backend: projector result passed as argument is not projective"
                )
        penv = dict(zip(proj.params, args))
        return _StructVal([(fname, _compile_expr(cfg, fexpr, penv)) for fname, fexpr in proj.fields])
    raise MappingConfigError(f"column backend cannot compile {expr!r}")


def _render(jv) -> Column:
    if isinstance(jv, _StructVal):
        if not jv.fields:
            raise MappingConfigError("column backend: empty projector not supported")
        cols = []
        for name, sub in jv.fields:
            cols.extend([F.lit(name), _render(sub)])
        return F.named_struct(*cols)
    return jv  # variant Column


# python backend: AST -> closure


def _compile_python(cfg: MappingConfig) -> Callable[[Any], dict]:
    def eval_expr(expr, env):
        if isinstance(expr, Lit):
            return expr.value
        if isinstance(expr, Path):
            v = env[expr.var]
            for p in expr.parts:
                if isinstance(p, int):
                    if isinstance(v, list) and 0 <= p < len(v):
                        v = v[p]
                    else:
                        return _MISSING
                elif isinstance(v, dict) and p in v:
                    v = v[p]
                else:
                    return _MISSING
            # canonical form for data-derived values: sorted object keys
            # (matches the column backend's VARIANT behavior; see json_canon)
            return json_canon.canon_sort(v)
        if isinstance(expr, Call):
            proj = cfg.projectors[expr.name]
            args = [eval_expr(a, env) for a in expr.args]
            penv = dict(zip(proj.params, args))
            return {
                fname: val
                for fname, fexpr in proj.fields
                if (val := eval_expr(fexpr, penv)) is not _MISSING
            }
        raise MappingConfigError(f"cannot evaluate {expr!r}")

    def run(root_obj) -> dict:
        out: dict[str, list] = {}
        for tgt, expr in cfg.outs:
            v = eval_expr(expr, {"root": root_obj})
            out.setdefault(tgt, [])
            if v is not _MISSING:
                out[tgt].append(v)
        return out

    return run


def compile_mapping(config_text: str) -> CompiledMapping:
    return CompiledMapping(config_text)
