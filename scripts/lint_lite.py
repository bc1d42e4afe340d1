#!/usr/bin/env python3
"""Minimal vendored style checker (pyflakes-lite).

The reference gated commits on flake8+pylint+mypy (scripts/check-code.sh);
none of those are installed in this environment, and a gate that silently
degrades to ``compileall`` cannot fail.  This AST walk enforces the core
always-on checks so ``scripts/check-code.sh`` has teeth without external
dependencies:

  * F401 unused imports (respects ``# noqa``, ``__all__`` re-exports and
    conventional ``as _``-style aliases)
  * E501 line length > MAX_LINE (respects ``# noqa``)
  * W291/W293 trailing whitespace
  * W191 tab indentation
  * B006 mutable default arguments (list/dict/set literals)
  * E722 bare ``except:``
  * F541 f-strings without placeholders

Exit status 1 when anything is found.
"""

import ast
import re
import sys
from pathlib import Path

MAX_LINE = 100


def _noqa_lines(source: str) -> set:
    return {
        i
        for i, line in enumerate(source.splitlines(), start=1)
        if "# noqa" in line or "#noqa" in line
    }


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # dotted use: walk to the root name ("os" in os.path.join)
            root = node
            while isinstance(root, ast.Attribute):
                root = root.value
            if isinstance(root, ast.Name):
                used.add(root.id)
    # names referenced inside string annotations / __all__ entries ONLY
    # (counting EVERY string constant would let any message or dict key
    # that happens to spell an import name defeat F401)
    def _string_names(sub: ast.AST) -> None:
        for c in ast.walk(sub):
            if isinstance(c, ast.Constant) and isinstance(c.value, str):
                # forward refs may be dotted ("np.ndarray"): every
                # identifier token counts as a use of its root
                for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", c.value):
                    used.add(tok)

    for node in ast.walk(tree):
        if isinstance(node, (ast.Assign, ast.AugAssign)):
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            if any(
                isinstance(t, ast.Name) and t.id == "__all__" for t in targets
            ):
                _string_names(node)
        ann = getattr(node, "annotation", None)
        if ann is not None:
            _string_names(ann)
        ret = getattr(node, "returns", None)
        if ret is not None:
            _string_names(ret)
    return used


def check_file(path: Path) -> list:
    source = path.read_text(encoding="utf-8")
    problems = []
    noqa = _noqa_lines(source)

    for i, line in enumerate(source.splitlines(), start=1):
        if i in noqa:
            continue
        if len(line) > MAX_LINE:
            problems.append((i, f"E501 line too long ({len(line)} > {MAX_LINE})"))
        if line != line.rstrip():
            problems.append((i, "W291 trailing whitespace"))
        if line.startswith("\t"):
            problems.append((i, "W191 tab indentation"))

    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as exc:
        problems.append((exc.lineno or 0, f"E999 syntax error: {exc.msg}"))
        return problems

    used = _used_names(tree)

    # format specs ("{x:#x}") parse as nested JoinedStrs with only
    # Constant parts — they are not user f-strings
    format_specs = {
        id(node.format_spec)
        for node in ast.walk(tree)
        if isinstance(node, ast.FormattedValue) and node.format_spec
    }

    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if node.lineno in noqa:
                continue
            # conditional imports (inside try/if) are availability probes
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound = alias.asname or alias.name.split(".")[0]
                if bound.startswith("_"):
                    continue
                if bound not in used:
                    problems.append(
                        (node.lineno, f"F401 unused import '{bound}'")
                    )
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + node.args.kw_defaults:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        (
                            node.lineno,
                            f"B006 mutable default argument in '{node.name}'",
                        )
                    )
        elif isinstance(node, ast.ExceptHandler):
            if node.type is None and node.lineno not in noqa:
                problems.append((node.lineno, "E722 bare 'except:'"))
        elif isinstance(node, ast.JoinedStr):
            if node.lineno in noqa or id(node) in format_specs:
                continue
            if not any(
                isinstance(v, ast.FormattedValue) for v in node.values
            ):
                problems.append(
                    (node.lineno, "F541 f-string without placeholders")
                )
    return problems


def main() -> int:
    roots = [Path(a) for a in sys.argv[1:]] or [Path("larynx_tpu")]
    files = []
    for root in roots:
        if root.is_file():
            files.append(root)
        else:
            files.extend(sorted(root.rglob("*.py")))
    n = 0
    for f in files:
        for lineno, msg in check_file(f):
            print(f"{f}:{lineno}: {msg}")
            n += 1
    if n:
        print(f"lint_lite: {n} problem(s)", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
