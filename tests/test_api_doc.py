"""docs/API.md drift guard.

The API reference (the analog of the reference's pdoc HTML,
``gstatsMCMC.MCMC.html``) documents every public symbol as
``name + str(inspect.signature(obj))``.  This test re-derives that from the
live package and fails on any drift, in either direction:

  * a documented symbol that no longer exists / whose signature changed,
  * a public symbol (top-level def/class defined in a documented module)
    that the doc is missing,
  * a ``Re-exports`` name that is no longer importable from the package or
    from the stated home module.

When it fails: update ``docs/API.md`` (the regeneration note at the bottom
of that file describes the format this test enforces).
"""

import importlib
import inspect
import re
from pathlib import Path

import pytest

DOC_PATH = Path(__file__).resolve().parent.parent / "docs" / "API.md"

_MODULE_RE = re.compile(r"^## `([\w.]+)`\s*$")
_ENTRY_RE = re.compile(r"^### (class )?`(\w+)(\(.*)`\s*$")
_METHOD_RE = re.compile(r"^- `\.(\w+)(\(.*?)` —")
_REEXPORT_RE = re.compile(r"`(\w+)` \(from `([\w.]+)`\)")

# Public symbols that are deliberately NOT in the API reference: in-package
# plumbing consumed by other mcmc_tpu modules or by the opt-in surgery /
# kernel layers, not by users.  Anything new must be documented or listed
# here with a reason.
_UNDOCUMENTED_OK: dict = {}

# Modules deliberately absent from the API reference (internal performance
# layers, auto-selected or opt-in via surgery gates — described in PARITY.md
# "Beyond-reference performance modules" — plus packaging shims).
_UNDOCUMENTED_MODULES = {
    "mcmc_tpu.__main__",        # `python -m mcmc_tpu` shim over cli.main
    "mcmc_tpu.io",              # bare package; io.checkpoint is the API
    "mcmc_tpu.utils",           # bare package; submodules are the API
    "mcmc_tpu.ops.window_kernel",  # fused Pallas kernel, auto-selected
    "mcmc_tpu.ops.lut_kernel",     # Pallas LUT kernel, auto-selected
    "mcmc_tpu.ops.sgs_window_kernel",  # Pallas window DMA kernels, auto-selected
    "mcmc_tpu.ops.cg_kernel",      # opt-in surgery kernel (measured off)
    "mcmc_tpu.ops.noise_kernel",   # opt-in surgery kernel (measured off)
}


def _norm(sig: str) -> str:
    return " ".join(sig.split())


def _parse_doc():
    """Parse API.md into {module: {"entries": [...], "reexports": [...]}}."""
    modules = {}
    current = None
    current_class = None
    for line in DOC_PATH.read_text().splitlines():
        m = _MODULE_RE.match(line)
        if m:
            current = m.group(1)
            modules[current] = {"entries": [], "reexports": []}
            current_class = None
            continue
        if current is None:
            continue
        if line.startswith("Re-exports:"):
            modules[current]["reexports"].extend(_REEXPORT_RE.findall(line))
            continue
        m = _ENTRY_RE.match(line)
        if m:
            is_class, name, sig = bool(m.group(1)), m.group(2), m.group(3)
            entry = {"name": name, "sig": sig, "class": is_class,
                     "methods": []}
            modules[current]["entries"].append(entry)
            current_class = entry if is_class else None
            continue
        m = _METHOD_RE.match(line)
        if m and current_class is not None:
            current_class["methods"].append((m.group(1), m.group(2)))
    return modules


DOC = _parse_doc()


def test_doc_parsed_nontrivially():
    assert len(DOC) > 20, "API.md parse produced too few module sections"
    n_entries = sum(len(v["entries"]) for v in DOC.values())
    assert n_entries > 80, f"API.md parse produced too few entries: {n_entries}"


@pytest.mark.parametrize("modname", sorted(DOC))
def test_documented_module_imports(modname):
    importlib.import_module(modname)


def _live_signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return None


@pytest.mark.parametrize("modname", sorted(DOC))
def test_documented_symbols_match_live_signatures(modname):
    mod = importlib.import_module(modname)
    problems = []
    for entry in DOC[modname]["entries"]:
        obj = getattr(mod, entry["name"], None)
        if obj is None:
            problems.append(f"{entry['name']}: documented but missing")
            continue
        live = _live_signature(obj)
        if live is not None and _norm(live) != _norm(entry["sig"]):
            problems.append(
                f"{entry['name']}: doc {entry['sig']!r} != live {live!r}")
        for mname, msig in entry["methods"]:
            meth = getattr(obj, mname, None)
            if meth is None:
                problems.append(
                    f"{entry['name']}.{mname}: documented but missing")
                continue
            mlive = _live_signature(meth)
            if mlive is not None and _norm(mlive) != _norm(msig):
                problems.append(
                    f"{entry['name']}.{mname}: doc {msig!r} != live {mlive!r}")
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("modname", sorted(DOC))
def test_no_undocumented_public_symbols(modname):
    """Every public def/class DEFINED in a documented module is documented."""
    mod = importlib.import_module(modname)
    documented = {e["name"] for e in DOC[modname]["entries"]}
    documented |= {n for n, _ in DOC[modname]["reexports"]}
    allowed = _UNDOCUMENTED_OK.get(modname, set())
    missing = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue  # re-exports are documented at their home module
        if name in documented or name in allowed:
            continue
        missing.append(name)
    assert not missing, (
        f"public symbols in {modname} missing from docs/API.md: {missing} "
        f"(document them or add to _UNDOCUMENTED_OK with a reason)")


def test_every_package_module_is_documented_or_listed_internal():
    """A new module can't silently escape the API reference."""
    import mcmc_tpu

    pkg_dir = Path(mcmc_tpu.__file__).resolve().parent
    missing = []
    for py in pkg_dir.rglob("*.py"):
        rel = py.relative_to(pkg_dir.parent)
        modname = ".".join(rel.with_suffix("").parts)
        if modname.endswith(".__init__"):
            modname = modname[: -len(".__init__")]
        if modname not in DOC and modname not in _UNDOCUMENTED_MODULES:
            missing.append(modname)
    assert not missing, (
        f"modules missing from docs/API.md (document in docs/gen_api.py "
        f"MODULE_ORDER or list in _UNDOCUMENTED_MODULES): {missing}")


def test_reexports_resolve():
    problems = []
    for modname, info in DOC.items():
        if not info["reexports"]:
            continue
        pkg = importlib.import_module(modname)
        for name, home in info["reexports"]:
            if not hasattr(pkg, name):
                problems.append(f"{modname}: re-export {name} missing")
                continue
            home_mod = importlib.import_module(home)
            if not hasattr(home_mod, name):
                problems.append(
                    f"{modname}: {name} not found in stated home {home}")
    assert not problems, "\n".join(problems)
