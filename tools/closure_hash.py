"""Transitive helper-closure hashing for stale-cert detection (r7 verdict
item 2).

``stale_certs.py`` originally diffed only a query's OWN function source and
oracle SQL against its certifying round's tree — drift in a shared helper
(``operators/``, ``functions/``, ``io.py``) did not mark its callers stale.
Round 7's one live bug (``stats_propensity_match_att``) was exactly a
stale-cert class; this module closes the granularity gap:

- ``closure_members(fn)`` walks the function's referenced globals
  (``inspect.getclosurevars``) transitively: package-defined functions and
  classes contribute their source; package modules referenced via an alias
  (``from ..operators import dedup as D`` → ``D.minhash_lsh_pairs``)
  contribute the attributes the code object actually names
  (``co_names``, including nested comprehension/lambda code objects);
  simple module-level constants contribute their ``repr``.
- ``closure_sha(fn)`` reduces that member map to one hex digest. Two trees
  agree on the digest iff every helper the query can reach is byte-identical.

This module is imported BOTH by the HEAD dump and by the subprocess that
materializes a certifying round's tree in a git worktree — the worktree run
adds THIS repo's tools dir to ``sys.path`` so old trees are hashed with the
same (current) logic, keeping the comparison apples-to-apples.

Only cobalt_duckdb_spark members are hashed: pyspark / stdlib drift is not
a certification concern (the driver re-runs on the same pinned pyspark).
"""

from __future__ import annotations

import hashlib
import inspect
import types

PKG = "cobalt_duckdb_spark"

_SIMPLE_CONSTS = (str, int, float, bool, bytes, tuple, frozenset)


def _code_names(code: types.CodeType) -> set[str]:
    """All names a code object (and its nested code objects — lambdas,
    comprehensions) loads: globals AND attribute accesses."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


def _is_pkg_member(obj: object) -> bool:
    mod = getattr(obj, "__module__", None)
    return isinstance(mod, str) and mod.split(".")[0] == PKG


def _source_token(obj: object) -> str:
    """A deterministic text token for a closure member: source when
    available, the wrapped callable's source for UDF-style wrappers, repr
    for simple constants, a type tag otherwise (never bare repr of an
    arbitrary object — that embeds memory addresses)."""
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        pass
    wrapped = getattr(obj, "func", None)  # pandas_udf / partial wrappers
    if wrapped is not None and callable(wrapped):
        try:
            return inspect.getsource(wrapped)
        except (OSError, TypeError):
            pass
    if isinstance(obj, frozenset):
        # Set iteration order follows (randomized) hashing — sort for a
        # process-independent token. Falls back for unorderable members.
        try:
            return f"frozenset({sorted(obj)!r})"
        except TypeError:
            return f"frozenset({sorted(obj, key=repr)!r})"
    if isinstance(obj, _SIMPLE_CONSTS) or obj is None:
        return repr(obj)
    return f"<{type(obj).__module__}.{type(obj).__qualname__}>"


def _referenced_globals(fn: object) -> dict[str, object]:
    """{identifier: object} of globals/nonlocals ``fn`` references,
    expanding package-module aliases into the attributes the code names."""
    try:
        cv = inspect.getclosurevars(fn)
    except (TypeError, ValueError):
        return {}
    refs: dict[str, object] = dict(cv.nonlocals)
    refs.update(cv.globals)
    code = getattr(fn, "__code__", None)
    names = _code_names(code) if isinstance(code, types.CodeType) else set()
    out: dict[str, object] = {}
    for name, obj in refs.items():
        if isinstance(obj, types.ModuleType):
            if obj.__name__.split(".")[0] != PKG:
                continue
            for attr in names:
                if hasattr(obj, attr):
                    out[f"{obj.__name__}.{attr}"] = getattr(obj, attr)
        else:
            out[name] = obj
    return out


def closure_members(fn: object, max_depth: int = 12) -> dict[str, str]:
    """{stable identifier: source token} for the transitive package-helper
    closure of ``fn`` (``fn`` itself excluded — its own source is already
    the src_sha surface).

    ``max_depth`` bounds the helper-chain walk as a cycle/blowup backstop
    only: the deepest real chain in the package is 4 hops (query →
    operators wrapper → shared kernel → exact-decimal publish), so 12 is
    unreachable in practice — it exists so a pathological future
    self-referential structure terminates rather than to truncate real
    chains (ADVICE r8: the old value of 5 was close enough to real depths
    to silently drop members if one more wrapper layer appeared)."""
    members: dict[str, str] = {}
    seen: set[str] = set()
    stack: list[tuple[object, int]] = [(fn, 0)]
    while stack:
        cur, depth = stack.pop()
        if depth >= max_depth:
            continue
        for ident, obj in sorted(
            _referenced_globals(cur).items(), key=lambda kv: kv[0]
        ):
            if callable(obj) or isinstance(obj, type):
                if not _is_pkg_member(obj):
                    continue
                key = (
                    f"{getattr(obj, '__module__', '?')}."
                    f"{getattr(obj, '__qualname__', ident)}"
                )
                if key in seen:
                    continue
                seen.add(key)
                members[key] = _source_token(obj)
                if not isinstance(obj, type):
                    inner = getattr(obj, "func", None)
                    stack.append(
                        (inner if callable(inner) else obj, depth + 1)
                    )
            elif isinstance(obj, _SIMPLE_CONSTS):
                # Qualify bare identifiers (direct globals of ``cur``) by
                # the REFERENCING function's module — the namespace the
                # lookup resolves in: two helpers
                # in different modules can reference same-named constants
                # (e.g. two module-local BANDS tuples), and an unqualified
                # 'const:BANDS' key would let the first one seen mask drift
                # in the second — a false-fresh, the exact failure class
                # this tool exists to prevent (ADVICE r8). Alias-expanded
                # idents ('pkg.module.attr') are already qualified.
                if "." in ident:
                    key = f"const:{ident}"
                else:
                    mod = getattr(cur, "__module__", None) or "?"
                    key = f"const:{mod}.{ident}"
                members.setdefault(key, repr(obj))
    return members


def closure_sha(fn: object) -> str:
    members = closure_members(fn)
    blob = "\n".join(
        f"{k}={hashlib.sha256(v.encode()).hexdigest()}"
        for k, v in sorted(members.items())
    )
    return hashlib.sha256(blob.encode()).hexdigest()
