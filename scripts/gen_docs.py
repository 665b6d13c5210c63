"""Generate the browsable API reference from docstrings.

The reference publishes a Sphinx/RTD site whose API pages are pure
autodoc over module docstrings (reference docs/conf.py:47-50,
docs/ann.rst:2, docs/feature.rst:2). This environment has no sphinx or
mkdocs, so this script IS the autodoc: it imports every module of
``molann_tpu``, walks its public surface with :mod:`inspect`, and
emits one markdown page per module into ``docs/api/`` plus an index.
The docstrings themselves are the executable guarantee — their
examples run under ``tests/test_docs.py`` — so the generated pages
cannot drift from behavior without a test failing; ``tests/
test_docs.py::test_api_reference_current`` additionally regenerates
the pages and fails if the committed ones are stale.

Usage:  python scripts/gen_docs.py [--check]

``--check`` regenerates into a temp dir and exits non-zero if the
committed pages differ (the docs-current guard).
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SKIP_MODULES = {
    "molann_tpu.__main__",  # argv-driven entry point, no API surface
}

# modules whose import needs a device backend decision first
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _signature(obj) -> str:
    import re

    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default-value reprs of functions/objects embed id()s — strip for
    # deterministic output (the --check mode diffs bytes)
    sig = re.sub(r" at 0x[0-9a-f]+", "", sig)
    sig = re.sub(r"<PjitFunction of <function ([\w.]+)>>", r"\1", sig)
    sig = re.sub(r"<function ([\w.]+)>", r"\1", sig)
    return sig


def _clean_doc(obj) -> str:
    doc = inspect.getdoc(obj)
    return doc.strip() if doc else ""


def _anchor(name: str) -> str:
    return name.lower().replace(".", "").replace("_", "")


def _public_members(mod):
    """Respect __all__ when present; otherwise public, defined-here
    members in source order."""
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
        names = [
            n for n in names
            if getattr(getattr(mod, n), "__module__", None) == mod.__name__
        ]

    def lineno(n):
        try:
            return inspect.getsourcelines(getattr(mod, n))[1]
        except (OSError, TypeError):
            return 1 << 30

    return sorted(names, key=lineno)


def _render_function(name, fn, *, heading="###") -> list[str]:
    out = [f"{heading} `{name}{_signature(fn)}`", ""]
    doc = _clean_doc(fn)
    if doc:
        out += [doc, ""]
    return out


def _render_class(name, cls) -> list[str]:
    out = [f"### class `{name}{_signature(cls)}`", ""]
    doc = _clean_doc(cls)
    if doc:
        out += [doc, ""]
    members = []
    for mname, m in vars(cls).items():
        if mname.startswith("_") and mname != "__init__":
            continue
        if isinstance(m, (staticmethod, classmethod)):
            members.append((mname, m.__func__, "method"))
        elif inspect.isfunction(m):
            if mname != "__init__":  # signature already on the class line
                members.append((mname, m, "method"))
        elif isinstance(m, property):
            members.append((mname, m, "property"))

    def lineno(entry):
        try:
            obj = entry[1].fget if entry[2] == "property" else entry[1]
            return inspect.getsourcelines(obj)[1]
        except (OSError, TypeError):
            return 1 << 30

    for mname, m, kind in sorted(members, key=lineno):
        if kind == "property":
            out += [f"#### property `{name}.{mname}`", ""]
            doc = _clean_doc(m.fget) if m.fget else ""
            if doc:
                out += [doc, ""]
        else:
            mdoc = _clean_doc(m)
            if not mdoc and mname in ("__init__",):
                continue
            out += [f"#### `{name}.{mname}{_signature(m)}`", ""]
            if mdoc:
                out += [mdoc, ""]
    return out


def render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    mdoc = _clean_doc(mod)
    if mdoc:
        lines += [mdoc, ""]
    members = _public_members(mod)
    # split re-exports (defined elsewhere) from own definitions
    own, reexport = [], []
    for n in members:
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        home = getattr(obj, "__module__", modname)
        (own if home == modname else reexport).append((n, obj, home))
    if reexport and not own:
        lines += ["Public surface (re-exported; follow the links for "
                  "the full documentation):", ""]
        for n, obj, home in reexport:
            page = home.replace(".", "_") + ".md"
            lines.append(f"- [`{n}`]({page}#{_anchor('class ' + n)}) — "
                         f"from `{home}`")
        lines.append("")
    elif reexport:
        lines += ["Re-exported: " + ", ".join(
            f"[`{n}`]({home.replace('.', '_')}.md)"
            for n, _, home in reexport), ""]
    for n, obj, _ in own:
        if inspect.isclass(obj):
            lines += _render_class(n, obj)
        elif callable(obj):
            lines += _render_function(n, obj)
        else:  # module-level constant
            import re

            r = re.sub(r" at 0x[0-9a-f]+", "", repr(obj))
            if len(r) > 300:
                r = r[:297] + "..."
            lines += [f"### `{n}`", "", f"`{n} = {r}`", ""]
    return "\n".join(lines).rstrip() + "\n"


def generate(out_dir: Path) -> dict[str, str]:
    import molann_tpu

    pages: dict[str, str] = {}
    modnames = ["molann_tpu"] + sorted(
        m.name for m in pkgutil.walk_packages(
            molann_tpu.__path__, "molann_tpu.")
        if m.name not in SKIP_MODULES
    )
    for modname in modnames:
        pages[modname.replace(".", "_") + ".md"] = render_module(modname)

    # index: one line per module, grouped by subpackage
    idx = [
        "# molann_tpu API reference",
        "",
        "Generated from docstrings by `python scripts/gen_docs.py` "
        "(the in-repo autodoc; regenerate after changing any public "
        "docstring — `tests/test_docs.py` fails when these pages go "
        "stale). Docstring examples are executed by the test suite.",
        "",
    ]
    for modname in modnames:
        mod = importlib.import_module(modname)
        doc = _clean_doc(mod)
        first = textwrap.shorten(doc.split("\n")[0], 86) if doc else ""
        depth = modname.count(".")
        idx.append(f"{'  ' * depth}- [`{modname}`]"
                   f"({modname.replace('.', '_')}.md) — {first}")
    pages["index.md"] = "\n".join(idx) + "\n"

    out_dir.mkdir(parents=True, exist_ok=True)
    for fname, text in pages.items():
        (out_dir / fname).write_text(text)
    return pages


def main() -> int:
    target = REPO / "docs" / "api"
    if "--check" in sys.argv:
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            fresh = generate(Path(d))
        stale = []
        for fname, text in fresh.items():
            p = target / fname
            if not p.exists() or p.read_text() != text:
                stale.append(fname)
        extra = {p.name for p in target.glob("*.md")} - set(fresh)
        if stale or extra:
            print("stale API docs:", ", ".join(sorted(stale + list(extra))))
            print("run: python scripts/gen_docs.py")
            return 1
        print(f"API docs current ({len(fresh)} pages)")
        return 0
    pages = generate(target)
    print(f"wrote {len(pages)} pages to {target}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
