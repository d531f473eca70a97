"""Regenerate docs/API.md from the live package.

Usage:  JAX_PLATFORMS=cpu python docs/gen_api.py        (rewrites API.md)
        JAX_PLATFORMS=cpu python docs/gen_api.py --check (diff only, rc=1 on drift)

Format (enforced by tests/test_api_doc.py):
  - one ``## `module``` section per module, in MODULE_ORDER;
  - packages get a ``Re-exports:`` pointer line (symbols documented at
    their home module);
  - every public top-level def/class defined in a module gets a
    ``### [class ]`name + str(inspect.signature)``` entry, in source order,
    summarized by the first docstring paragraph;
  - classes list their public methods (alphabetical) as
    ``- `.name(sig)` — summary`` bullets.
"""

import importlib
import inspect
import sys
from pathlib import Path

# Runnable as `python docs/gen_api.py` from the repo root: sys.path[0] is
# docs/, so put the package's parent (the repo root) on the path.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADER = """\
# mcmc_tpu API reference

Public API of the TPU-native geostatistical MCMC framework, by module.
Parity map to the reference gstatsMCMC symbols: see `MIGRATION.md`.
Architecture and design rationale: `SURVEY.md` §7, `PARITY.md`.

Generated from the package's signatures and docstring summaries
(equivalent of the reference's pdoc HTML, `gstatsMCMC.MCMC.html`).
Regenerate after API changes: `JAX_PLATFORMS=cpu python docs/gen_api.py`
(drift is caught by `tests/test_api_doc.py`).
"""

FOOTER = """\
---

*Regeneration*: `JAX_PLATFORMS=cpu python docs/gen_api.py` — introspects
the package and rewrites this file: signatures via `inspect.signature`,
summaries = first docstring paragraph, package-level re-exports collapsed
to pointers at their home-module entries.
"""

MODULE_ORDER = [
    "mcmc_tpu",
    "mcmc_tpu.models",
    "mcmc_tpu.models.chain_crf",
    "mcmc_tpu.models.chain_sgs",
    "mcmc_tpu.models.randfield",
    "mcmc_tpu.parallel",
    "mcmc_tpu.parallel.sampler",
    "mcmc_tpu.parallel.grid_sharded",
    "mcmc_tpu.parallel.distributed",
    "mcmc_tpu.parallel.diagnostics",
    "mcmc_tpu.parallel.mesh",
    "mcmc_tpu.io.checkpoint",
    "mcmc_tpu.geostats",
    "mcmc_tpu.geostats.sgs",
    "mcmc_tpu.geostats.variogram",
    "mcmc_tpu.ops",
    "mcmc_tpu.ops.covariance",
    "mcmc_tpu.ops.kriging",
    "mcmc_tpu.ops.neighbors",
    "mcmc_tpu.ops.transforms",
    "mcmc_tpu.ops.spectral",
    "mcmc_tpu.ops.srf",
    "mcmc_tpu.ops.physics",
    "mcmc_tpu.ops.logistic",
    "mcmc_tpu.ops.distance",
    "mcmc_tpu.data",
    "mcmc_tpu.data.topography",
    "mcmc_tpu.data.interpolate",
    "mcmc_tpu.utils.config",
    "mcmc_tpu.utils.domain",
    "mcmc_tpu.utils.rng",
    "mcmc_tpu.utils.progress",
    "mcmc_tpu.utils.plotting",
    "mcmc_tpu.drivers",
    "mcmc_tpu.cli",
]


def _summary(obj) -> str:
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    para = doc.split("\n\n", 1)[0]
    return " ".join(line.strip() for line in para.splitlines())


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _source_line(obj) -> int:
    try:
        return inspect.getsourcelines(inspect.unwrap(obj))[1]
    except (OSError, TypeError):
        return 10**9


def _is_api_object(obj) -> bool:
    """Classes and callables (incl. jit-wrapped functions, which are not
    ``inspect.isfunction``) that carry a home module."""
    return (inspect.isclass(obj)
            or (callable(obj) and not inspect.ismodule(obj)
                and hasattr(obj, "__name__")))


def _public_defs(mod):
    """Public top-level defs/classes DEFINED in ``mod``, in source order."""
    out = [
        (name, obj)
        for name, obj in vars(mod).items()
        if not name.startswith("_")
        and _is_api_object(obj)
        and getattr(obj, "__module__", None) == mod.__name__
    ]
    out.sort(key=lambda kv: _source_line(kv[1]))
    return out


def _reexports(mod):
    """Package-level re-exports (documented at their home module).

    Only packages re-export; symbols a plain module imports from siblings
    are implementation detail, not API.
    """
    if not hasattr(mod, "__path__"):
        return []
    return [
        (name, obj.__module__)
        for name, obj in vars(mod).items()
        if not name.startswith("_")
        and _is_api_object(obj)
        and getattr(obj, "__module__", "").startswith("mcmc_tpu")
        and obj.__module__ != mod.__name__
    ]


def _methods(cls):
    """Public methods defined on ``cls`` itself, alphabetical."""
    out = []
    for name, raw in sorted(vars(cls).items()):
        if name.startswith("_"):
            continue
        if isinstance(raw, (classmethod, staticmethod)) or inspect.isfunction(raw):
            out.append((name, getattr(cls, name)))
    return out


def _class_entry(name, cls, lines):
    lines.append(f"### class `{name}{_sig(cls)}`")
    lines.append("")
    summary = _summary(cls)
    if summary:
        lines.append(summary)
        lines.append("")
    methods = _methods(cls)
    for mname, meth in methods:
        lines.append(f"- `.{mname}{_sig(meth)}` — {_summary(meth)}".rstrip())
    if methods:
        lines.append("")
    lines.append("")


def _fn_entry(name, fn, lines):
    lines.append(f"### `{name}{_sig(fn)}`")
    lines.append("")
    summary = _summary(fn)
    if summary:
        lines.append(summary)
        lines.append("")


def generate() -> str:
    lines = [HEADER]
    for modname in MODULE_ORDER:
        mod = importlib.import_module(modname)
        lines.append(f"## `{modname}`")
        lines.append("")
        msum = _summary(mod)
        if msum:
            lines.append(msum)
            lines.append("")
        rex = _reexports(mod)
        if rex:
            lines.append("Re-exports: " + ", ".join(
                f"`{n}` (from `{home}`)" for n, home in rex))
            lines.append("")
        lines.append("")
        for name, obj in _public_defs(mod):
            if inspect.isclass(obj):
                _class_entry(name, obj, lines)
            else:
                _fn_entry(name, obj, lines)
    lines.append(FOOTER)
    return "\n".join(lines)


def main(argv):
    out_path = Path(__file__).resolve().parent / "API.md"
    text = generate()
    if "--check" in argv:
        current = out_path.read_text()
        if current != text:
            sys.stderr.write("docs/API.md is stale — rerun docs/gen_api.py\n")
            return 1
        print("docs/API.md is up to date")
        return 0
    out_path.write_text(text)
    print(f"wrote {out_path} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
