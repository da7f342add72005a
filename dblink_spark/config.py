"""Minimal HOCON-subset parser for project config files.

Covers the subset the reference's example configs exercise
(ref: examples/RLdata500.conf, examples/RLdata10000.conf; parsed by Typesafe
ConfigFactory at Run.scala:35): ``//`` and ``#`` comments, unquoted keys and
string values, ``:`` / ``=`` separators, nested objects, arrays of objects,
optional commas, numbers/booleans/null, and ``${path.to.value}``
substitutions. A reference user's ``.conf`` runs unmodified; plain JSON is
also accepted (JSON is a HOCON subset).

Not supported (not used by the reference configs): includes, multi-line
strings, value concatenation, ``+=``, unquoted durations/sizes.
"""

from __future__ import annotations

from typing import Any


class ConfigError(ValueError):
    pass


class _Sub:
    """Unresolved ``${path}`` substitution marker."""

    __slots__ = ("path",)

    def __init__(self, path: str):
        self.path = path


def load_config(path: str) -> dict:
    with open(path) as f:
        return parse_config(f.read())


def parse_config(text: str) -> dict:
    tokens = _tokenize(text)
    parser = _Parser(tokens)
    root = parser.parse_root()
    _resolve(root, root)
    return root


# -- tokenizer ---------------------------------------------------------------

_PUNCT = set("{}[],:=")


def _tokenize(text: str) -> list:
    out: list = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
        elif c == "#" or text.startswith("//", i):
            while i < n and text[i] != "\n":
                i += 1
        elif text.startswith("/*", i):
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
        elif c in _PUNCT:
            out.append(c)
            i += 1
        elif c == '"':
            j = i + 1
            buf = []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    buf.append(
                        {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}.get(
                            esc, esc
                        )
                    )
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise ConfigError("unterminated string")
            out.append(("str", "".join(buf)))
            i = j + 1
        elif text.startswith("${", i):
            j = text.find("}", i)
            if j < 0:
                raise ConfigError("unterminated substitution")
            out.append(("sub", text[i + 2 : j].strip()))
            i = j + 1
        else:
            # unquoted token: up to punctuation/whitespace/comment
            j = i
            while j < n and text[j] not in " \t\r\n" and text[j] not in _PUNCT:
                if text[j] == "#" or text.startswith("//", j) or text.startswith("${", j):
                    break
                j += 1
            out.append(("bare", text[i:j]))
            i = j
    return out


# -- parser ------------------------------------------------------------------


class _Parser:
    def __init__(self, tokens: list):
        self.toks = tokens
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ConfigError("unexpected end of config")
        self.pos += 1
        return t

    def parse_root(self) -> dict:
        if self.peek() == "{":
            self.next()
            return self._object_body(closing=True)
        return self._object_body(closing=False)

    def _object_body(self, closing: bool) -> dict:
        obj: dict = {}
        while True:
            t = self.peek()
            if t is None:
                if closing:
                    raise ConfigError("missing closing brace")
                return obj
            if t == "}":
                self.next()
                return obj
            if t == ",":
                self.next()
                continue
            key = self._key()
            t = self.peek()
            if t in (":", "="):
                self.next()
                val = self._value()
            elif t == "{":  # `key { ... }` shorthand
                self.next()
                val = self._object_body(closing=True)
            else:
                raise ConfigError(f"expected ':' after key {key!r}")
            # duplicate object keys merge (HOCON semantics); others override
            if key in obj and isinstance(obj[key], dict) and isinstance(val, dict):
                obj[key].update(val)
            else:
                obj[key] = val
        return obj

    def _key(self) -> str:
        t = self.next()
        if isinstance(t, tuple) and t[0] in ("str", "bare"):
            return t[1]
        raise ConfigError(f"bad key token {t!r}")

    def _value(self) -> Any:
        t = self.next()
        if t == "{":
            return self._object_body(closing=True)
        if t == "[":
            arr = []
            while True:
                p = self.peek()
                if p is None:
                    raise ConfigError("unterminated array")
                if p == "]":
                    self.next()
                    return arr
                if p == ",":
                    self.next()
                    continue
                arr.append(self._value())
        if isinstance(t, tuple):
            kind, v = t
            if kind == "str":
                return v
            if kind == "sub":
                return _Sub(v)
            if kind == "bare":
                return _scalar(v)
        raise ConfigError(f"unexpected token {t!r}")


def _scalar(v: str) -> Any:
    low = v.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


# -- substitution resolution -------------------------------------------------


def _lookup(root: dict, path: str) -> Any:
    cur: Any = root
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            raise ConfigError(f"unresolved substitution ${{{path}}}")
        cur = cur[part]
    return cur


def _resolve(node: Any, root: dict, depth: int = 0) -> Any:
    if depth > 50:
        raise ConfigError("substitution cycle")
    if isinstance(node, _Sub):
        return _resolve(_lookup(root, node.path), root, depth + 1)
    if isinstance(node, dict):
        for k in list(node):
            node[k] = _resolve(node[k], root, depth + 1)
        return node
    if isinstance(node, list):
        return [_resolve(x, root, depth + 1) for x in node]
    return node
