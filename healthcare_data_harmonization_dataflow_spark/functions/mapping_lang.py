"""Parser for the Whistle-subset mapping-config language.

The reference executes mapping configs with an embedded Whistle ``Engine``
(MappingFn.java:156-192 loads the config once per JVM and fails fast on an
invalid config; MappingFnTest.java:52-56 uses the config
``out Output: Test(root); def Test(input) { foo: input.bar; }``).

We implement the subset those tests + the e2e corpus exercise, from scratch:

* ``out <Target>: <expr>;``            — append expr value to output[Target]
* ``def <Name>(<params>) { field: expr; ... }``   — projector definition
* nested target fields inside projectors (``meta.cat: expr;``) — built as
  nested objects, insertion-ordered, conflicts rejected at compile time
* array-append target fields (``items[]: expr;``) — produced values
  accumulate in declaration order (missing appends nothing)
* expressions: dotted paths (``input.bar.baz``), array element access
  (``input.items[0].name``), string/number/bool/null literals, projector
  calls (``Test(root)``, whose results may themselves be arguments to other
  projectors), array construction (``[a, b, c]`` — a missing element
  renders as JSON null, preserving positions), builtin calls
  (``$ToUpper/$ToLower/$StrCat/$Hash``), conditionals (``$Eq``/``$If``,
  strict-boolean, canonical-JSON equality), ``root`` = whole input
* textproto root mappings (e2e corpus,
  src/test/resources/streaming/e2e/identical.mapping_config.textproto):
  ``root_mapping { value_source { from_source: "." } target_object: "t" }``
  meaning output[t] = [ value at from_source ] ('.' = entire input).

Parsing/validation errors raise :class:`MappingConfigError` at compile time —
the fail-fast contract of MappingFnTest.java:66-75.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class MappingConfigError(ValueError):
    """Invalid mapping config — raised at compile time, before any data."""


# ---------------------------------------------------------------- AST nodes
@dataclass(frozen=True)
class Lit:
    value: object  # str | int | float | bool | None


@dataclass(frozen=True)
class Path:
    var: str  # bound variable: 'root' or a projector param
    parts: tuple[str, ...]  # empty = the variable itself


@dataclass(frozen=True)
class Call:
    name: str
    args: tuple


@dataclass(frozen=True)
class Builtin:
    name: str  # '$ToUpper' | '$ToLower' | '$StrCat' | '$Hash'
    args: tuple


@dataclass(frozen=True)
class Arr:
    items: tuple


# builtin name -> (min_arity, max_arity or None = unbounded)
BUILTINS: dict[str, tuple[int, int | None]] = {
    "$ToUpper": (1, 1),
    "$ToLower": (1, 1),
    "$StrCat": (1, None),
    "$Hash": (1, 1),
    # conditionals: $Eq compares canonical JSON renderings; $If(cond, then[,
    # else]) takes the then-branch iff cond is JSON true (a missing else
    # omits the field)
    "$Eq": (2, 2),
    "$If": (2, 3),
}


@dataclass(frozen=True)
class Projector:
    name: str
    params: tuple[str, ...]
    # (target_path, expr, append): append=True for ``path[]: expr`` fields,
    # which accumulate into an array in declaration order
    fields: tuple[tuple[tuple[str, ...], object, bool], ...]


def nest_fields(fields) -> dict:
    """Fold a projector's (target_path, expr, append) list into an
    insertion-ordered nested tree: name -> ('leaf', expr) | ('node',
    subtree) | ('arr', [expr, ...]) for ``path[]`` append targets. Raises
    MappingConfigError on duplicate or leaf-vs-prefix conflicts."""
    root: dict = {}
    for entry in fields:
        path, expr, append = entry if len(entry) == 3 else (*entry, False)
        cur = root
        for seg in path[:-1]:
            node = cur.get(seg)
            if node is None:
                node = ("node", {})
                cur[seg] = node
            elif node[0] != "node":
                raise MappingConfigError(
                    f"target '{'.'.join(path)}' conflicts with earlier leaf '{seg}'"
                )
            cur = node[1]
        last = path[-1]
        prev = cur.get(last)
        if append:
            if prev is None:
                cur[last] = ("arr", [expr])
            elif prev[0] == "arr":
                prev[1].append(expr)
            else:
                raise MappingConfigError(
                    f"append target '{'.'.join(path)}[]' conflicts with an "
                    "earlier non-append field"
                )
        else:
            if prev is not None:
                raise MappingConfigError(
                    f"duplicate target field '{'.'.join(path)}'"
                )
            cur[last] = ("leaf", expr)
    return root


@dataclass
class MappingConfig:
    outs: list[tuple[str, object]] = field(default_factory=list)  # (target, expr)
    projectors: dict[str, Projector] = field(default_factory=dict)

    def validate(self) -> "MappingConfig":
        if not self.outs:
            raise MappingConfigError("config defines no output (no 'out' or root_mapping)")
        for tgt, expr in self.outs:
            self._check(expr, bound=("root",))
        return self

    def _check(self, expr, bound: tuple[str, ...]) -> None:
        if isinstance(expr, Lit):
            return
        if isinstance(expr, Path):
            if expr.var not in bound:
                raise MappingConfigError(f"unbound variable '{expr.var}'")
            return
        if isinstance(expr, Call):
            proj = self.projectors.get(expr.name)
            if proj is None:
                raise MappingConfigError(f"unknown projector '{expr.name}'")
            if len(proj.params) != len(expr.args):
                raise MappingConfigError(
                    f"projector '{expr.name}' takes {len(proj.params)} args, got {len(expr.args)}"
                )
            for a in expr.args:
                self._check(a, bound)
            nest_fields(proj.fields)  # nested-target conflicts fail at compile
            for _, fexpr, _append in proj.fields:
                self._check(fexpr, bound=proj.params)
            return
        if isinstance(expr, Builtin):
            spec = BUILTINS.get(expr.name)
            if spec is None:
                raise MappingConfigError(f"unknown builtin '{expr.name}'")
            lo, hi = spec
            if len(expr.args) < lo or (hi is not None and len(expr.args) > hi):
                raise MappingConfigError(
                    f"builtin '{expr.name}' arity mismatch: got {len(expr.args)}"
                )
            for a in expr.args:
                self._check(a, bound)
            return
        if isinstance(expr, Arr):
            for it in expr.items:
                self._check(it, bound)
            return
        raise MappingConfigError(f"unsupported expression node: {expr!r}")


# ---------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<ident>[$]?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>[{}();:,.\[\]])
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise MappingConfigError(f"unexpected character {text[pos]!r} at offset {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            toks.append((kind, m.group()))
    return toks


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind=None, value=None):
        k, v = self.next()
        if (kind and k != kind) or (value and v != value):
            raise MappingConfigError(f"expected {value or kind}, got {v!r}")
        return v

    # config := (out | def | root_mapping)*
    def parse_config(self) -> MappingConfig:
        cfg = MappingConfig()
        while self.peek()[0] != "eof":
            k, v = self.peek()
            if k == "ident" and v == "out":
                self.next()
                target = self.expect("ident")
                self.expect(value=":")
                expr = self.parse_expr()
                self.expect(value=";")
                cfg.outs.append((target, expr))
            elif k == "ident" and v == "def":
                self.next()
                name = self.expect("ident")
                self.expect(value="(")
                params = [self.expect("ident")]
                while self.peek()[1] == ",":
                    self.next()
                    params.append(self.expect("ident"))
                self.expect(value=")")
                self.expect(value="{")
                fields = []
                while self.peek()[1] != "}":
                    fpath = [self.expect("ident")]
                    while self.peek()[1] == ".":
                        self.next()
                        fpath.append(self.expect("ident"))
                    append = False
                    if self.peek()[1] == "[":  # `path[]:` array-append target
                        self.next()
                        self.expect(value="]")
                        append = True
                    self.expect(value=":")
                    fexpr = self.parse_expr()
                    self.expect(value=";")
                    fields.append((tuple(fpath), fexpr, append))
                self.expect(value="}")
                cfg.projectors[name] = Projector(name, tuple(params), tuple(fields))
            elif k == "ident" and v == "root_mapping":
                self.next()
                target, src = self._parse_root_mapping_block()
                cfg.outs.append((target, _path_from_source(src)))
            else:
                raise MappingConfigError(f"unexpected token {v!r} (expected out/def/root_mapping)")
        return cfg.validate()

    def _parse_root_mapping_block(self) -> tuple[str, str]:
        """textproto: root_mapping { value_source { from_source: "." } target_object: "x" }"""
        self.expect(value="{")
        target = src = None
        while self.peek()[1] != "}":
            key = self.expect("ident")
            if key == "value_source":
                self.expect(value="{")
                while self.peek()[1] != "}":
                    k2 = self.expect("ident")
                    self.expect(value=":")
                    v2 = self.expect("string")
                    if k2 == "from_source":
                        src = v2[1:-1]
                self.expect(value="}")
            elif key == "target_object":
                self.expect(value=":")
                target = self.expect("string")[1:-1]
            else:
                raise MappingConfigError(f"unknown root_mapping key {key!r}")
        self.expect(value="}")
        if target is None or src is None:
            raise MappingConfigError("root_mapping needs value_source.from_source and target_object")
        return target, src

    # expr := literal | array | builtin | call | path
    def parse_expr(self):
        k, v = self.peek()
        if k == "string":
            self.next()
            return Lit(_unescape(v[1:-1]))
        if k == "number":
            self.next()
            return Lit(float(v) if "." in v else int(v))
        if k == "punct" and v == "[":  # array construction
            self.next()
            items = []
            if self.peek()[1] != "]":
                items.append(self.parse_expr())
                while self.peek()[1] == ",":
                    self.next()
                    items.append(self.parse_expr())
            self.expect(value="]")
            return Arr(tuple(items))
        if k == "ident":
            if v in ("true", "false"):
                self.next()
                return Lit(v == "true")
            if v == "null":
                self.next()
                return Lit(None)
            self.next()
            if v.startswith("$"):  # builtin call
                self.expect(value="(")
                args = []
                if self.peek()[1] != ")":
                    args.append(self.parse_expr())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.parse_expr())
                self.expect(value=")")
                return Builtin(v, tuple(args))
            if self.peek()[1] == "(":  # projector call
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.parse_expr())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.parse_expr())
                self.expect(value=")")
                return Call(v, tuple(args))
            parts = []
            while self.peek()[1] in (".", "["):
                if self.peek()[1] == ".":
                    self.next()
                    parts.append(self.expect("ident"))
                else:  # [n] — array element access
                    self.next()
                    num = self.expect("number")
                    if "." in num or num.startswith("-"):
                        raise MappingConfigError(
                            f"array index must be a non-negative integer, got {num!r}"
                        )
                    parts.append(int(num))
                    self.expect(value="]")
            return Path(v, tuple(parts))
        raise MappingConfigError(f"unexpected token {v!r} in expression")


def _path_from_source(src: str) -> Path:
    if src == ".":
        return Path("root", ())
    parts: list = []
    for seg in src.split("."):
        if not seg:
            continue
        m = re.fullmatch(r"([A-Za-z_][A-Za-z0-9_]*)((?:\[\d+\])*)", seg)
        if not m:
            raise MappingConfigError(f"bad from_source segment {seg!r}")
        parts.append(m.group(1))
        for idx in re.findall(r"\[(\d+)\]", m.group(2)):
            parts.append(int(idx))
    return Path("root", tuple(parts))


def _unescape(s: str) -> str:
    return s.encode().decode("unicode_escape")


def parse_mapping_config(text: str) -> MappingConfig:
    """Parse + validate a mapping config; raises MappingConfigError (fail-fast,
    mirroring MappingFn.java:156-192 / MappingFnTest.java:66-75)."""
    if not text or not text.strip():
        raise MappingConfigError("empty mapping config")
    return _Parser(_tokenize(text)).parse_config()
