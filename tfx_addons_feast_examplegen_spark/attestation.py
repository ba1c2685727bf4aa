"""Static per-entry fingerprints backing the ATTESTATION.json ledger.

Round 7 showed that hand-maintained window comments go stale silently:
an entry's implementation changed but its driver attestation was never
refreshed, and nothing mechanical noticed. This module makes staleness
computable: each registry entry gets a FINGERPRINT hashing

- its oracle SQL string, and
- the AST-normalized (``ast.unparse``) sources of every package
  function / module-level constant statically reachable from its
  callable (for ``_sql_query`` closures, the executed SQL text itself).

AST normalization means comments, formatting, import shuffling and file
moves (e.g. the queries.py -> queries/ split) do NOT change a
fingerprint; any semantic edit to reachable code does. The ledger
(``ATTESTATION.json``, written by ``scripts/gen_attestation.py``)
records the fingerprint current when the driver last proved the entry
green; ``tests/test_attestation.py`` fails the build if an entry's
fingerprint drifted from its attested one without the entry being
scheduled in the driver window's first 50 slots.

Static resolution follows bare names, ``alias.attr`` accesses on
imported package modules, and function-local imports. Dynamic dispatch
(getattr, dict-of-functions) is not followed — a fingerprint is a
staleness DETECTOR, deliberately erring toward over-inclusion of
reachable code rather than completeness proofs.
"""

from __future__ import annotations

import ast
import hashlib
from pathlib import Path

_PKG = "tfx_addons_feast_examplegen_spark"
_ROOT = Path(__file__).resolve().parent


class _Module:
    def __init__(self, dotted: str, path: Path, *, is_pkg: bool = False):
        self.dotted = dotted
        self.is_pkg = is_pkg
        self.tree = ast.parse(path.read_text())
        self.defs: dict[str, ast.stmt] = {}
        self.imports: dict[str, tuple[str, str, str]] = {}
        self.modaliases: dict[str, str] = {}
        for s in self.tree.body:
            _bind_top(self, s)
            _bind_import(self.dotted, s, self.imports, self.modaliases,
                         is_pkg=is_pkg)


def _bind_top(mod: _Module, s: ast.stmt) -> None:
    if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        mod.defs[s.name] = s
    elif isinstance(s, ast.Assign):
        for t in s.targets:
            if isinstance(t, ast.Name):
                mod.defs[t.id] = s
    elif isinstance(s, ast.AnnAssign) and isinstance(s.target, ast.Name):
        mod.defs[s.target.id] = s


def _resolve_from(
    dotted: str, s: ast.ImportFrom, *, is_pkg: bool = False
) -> str | None:
    if s.level == 0:
        return s.module if (s.module or "").startswith(_PKG) else None
    parts = dotted.split(".")
    # For a plain module, level 1 strips the module itself; for a
    # package __init__, level 1 IS the package (Python resolves relative
    # imports against __package__, which for an __init__ equals its own
    # dotted name).
    strip = s.level - 1 if is_pkg else s.level
    base = parts[: len(parts) - strip] if strip else parts
    if not base:
        return None
    if s.module:
        base = base + s.module.split(".")
    return ".".join(base)


def _bind_import(
    dotted: str,
    s: ast.stmt,
    imports: dict[str, tuple[str, str, str]],
    modaliases: dict[str, str],
    *,
    is_pkg: bool = False,
) -> None:
    if isinstance(s, ast.Import):
        for a in s.names:
            if a.name.startswith(_PKG):
                modaliases[a.asname or a.name.split(".")[0]] = a.name
    elif isinstance(s, ast.ImportFrom):
        base = _resolve_from(dotted, s, is_pkg=is_pkg)
        if base is None:
            return
        for a in s.names:
            bound = a.asname or a.name
            imports[bound] = (base, a.name, f"{base}.{a.name}")


def _normalized_src(dotted: str, node: ast.stmt, *, is_pkg: bool = False) -> str:
    """``ast.unparse`` with relative imports rewritten absolute, so a
    module move (changing import depth, e.g. ``.sources`` ->
    ``..sources``) does not change the fingerprint of otherwise
    identical code. ``is_pkg`` must reflect the defining module (a
    package ``__init__`` resolves level-1 imports against itself), else
    the rewrite lands on the wrong absolute module."""
    import copy

    node = copy.deepcopy(node)
    for n in ast.walk(node):
        if isinstance(n, ast.ImportFrom) and n.level:
            base = _resolve_from(dotted, n, is_pkg=is_pkg)
            if base is not None:
                n.module = base
                n.level = 0
    return ast.unparse(node)


_TABLE: dict[str, _Module] | None = None


def _module_table() -> dict[str, _Module]:
    global _TABLE
    if _TABLE is None:
        table = {}
        for p in _ROOT.rglob("*.py"):
            rel = p.relative_to(_ROOT).with_suffix("")
            parts = [_PKG] + list(rel.parts)
            is_pkg = parts[-1] == "__init__"
            if is_pkg:
                parts = parts[:-1]
            table[".".join(parts)] = _Module(
                ".".join(parts), p, is_pkg=is_pkg
            )
        _TABLE = table
    return _TABLE


def _closure(
    dotted: str,
    name: str,
    table: dict[str, _Module],
    seen: set[tuple[str, str]],
    out: set[tuple[str, str]],
) -> None:
    key = (dotted, name)
    if key in seen:
        return
    seen.add(key)
    mod = table.get(dotted)
    if mod is None:
        return
    node = mod.defs.get(name)
    if node is None:
        # re-export: follow ``from X import name`` chains
        imp = mod.imports.get(name)
        if imp is not None and imp[2] not in table:
            _closure(imp[0], imp[1], table, seen, out)
        return
    out.add(
        (
            name,
            hashlib.sha256(
                _normalized_src(dotted, node, is_pkg=mod.is_pkg).encode()
            ).hexdigest(),
        )
    )
    local_imports: dict[str, tuple[str, str, str]] = {}
    local_aliases: dict[str, str] = {}
    for n in ast.walk(node):
        if isinstance(n, (ast.Import, ast.ImportFrom)):
            _bind_import(dotted, n, local_imports, local_aliases, is_pkg=mod.is_pkg)
    for n in ast.walk(node):
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            alias = n.value.id
            target = local_aliases.get(alias) or mod.modaliases.get(alias)
            if target is None:
                imp = local_imports.get(alias) or mod.imports.get(alias)
                if imp is not None and imp[2] in table:
                    target = imp[2]
            if target is not None:
                _closure(target, n.attr, table, seen, out)
        elif isinstance(n, ast.Name):
            nid = n.id
            if nid in local_imports:
                base, orig, full = local_imports[nid]
                if full not in table:
                    _closure(base, orig, table, seen, out)
            elif nid in mod.imports:
                base, orig, full = mod.imports[nid]
                if full not in table:
                    _closure(base, orig, table, seen, out)
            elif nid in mod.defs and nid != name:
                _closure(dotted, nid, table, seen, out)


def entry_fingerprint(entry: str, registry=None) -> str:
    """Fingerprint one registry entry (see module docstring)."""
    if registry is None:
        from . import queries as _q

        registry = _q._REGISTRY
    fn, oracle = registry[entry]
    h = hashlib.sha256()
    h.update((oracle or "").encode())
    if "_sql_query.<locals>" in fn.__qualname__:
        sql = fn.__closure__[0].cell_contents
        h.update(b"SQL:")
        h.update(sql.encode())
        return h.hexdigest()
    seen: set[tuple[str, str]] = set()
    out: set[tuple[str, str]] = set()
    _closure(fn.__module__, fn.__name__, _module_table(), seen, out)
    for n, hsh in sorted(out):
        h.update(f"{n}:{hsh};".encode())
    return h.hexdigest()


def all_fingerprints() -> dict[str, str]:
    from . import queries as _q

    return {name: entry_fingerprint(name, _q._REGISTRY) for name in _q._REGISTRY}
