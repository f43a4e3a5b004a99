"""Packaging metadata sanity: every console entry point in pyproject.toml
resolves to an importable callable, and the declared packages exist."""

import importlib
import pathlib
import tomllib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _pyproject():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def _project():
    return _pyproject()["project"]


def _repo_module_name(mod_name: str) -> str:
    """Translate an installed module path to its in-repo import path via
    [tool.setuptools.package-dir] (e.g. tokenreduction_analysis.x ->
    analysis.x: the analysis suite installs under a namespaced package
    name but lives at repo-root analysis/)."""
    pkg_dir = _pyproject().get("tool", {}).get("setuptools", {}).get(
        "package-dir", {})
    top, _, rest = mod_name.partition(".")
    if top in pkg_dir:
        top = pkg_dir[top].replace("/", ".")
    return f"{top}.{rest}" if rest else top


def test_entry_points_resolve():
    scripts = _project()["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(_repo_module_name(mod_name))
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_declared_packages_exist():
    cfg = _pyproject()["tool"]["setuptools"]
    pkg_dir = cfg.get("package-dir", {})
    for pkg in cfg["packages"]:
        rel = pkg_dir.get(pkg, pkg.replace(".", "/"))
        assert (REPO / rel / "__init__.py").is_file(), pkg


def test_base_deps_cover_console_script_imports():
    """The eval batch drivers import pandas at module top-level; a plain
    install (no extras) must be able to run every console script, so
    pandas belongs in the base dependencies."""
    deps = " ".join(_project()["dependencies"])
    assert "pandas" in deps


def test_no_generic_top_level_package_installed():
    """The wheel must not claim the bare name `analysis` (or any other
    collision-prone generic top-level name)."""
    cfg = _pyproject()["tool"]["setuptools"]
    for pkg in cfg["packages"]:
        assert pkg.split(".")[0].startswith("tokenreduction"), pkg


def test_analysis_modules_use_relative_imports():
    """The analysis suite installs under the namespaced package name
    tokenreduction_analysis; an absolute `from analysis import` (which
    resolves in the repo layout but not in a wheel) would crash the
    installed console scripts with ModuleNotFoundError."""
    import re

    bad = re.compile(r"^\s*(from\s+analysis[\s.]|import\s+analysis\b)",
                     re.MULTILINE)
    for path in sorted((REPO / "analysis").glob("*.py")):
        hits = bad.findall(path.read_text())
        assert not hits, f"{path.name} has absolute analysis imports: {hits}"


def test_all_existing_packages_are_declared():
    """Reverse of test_declared_packages_exist: with an explicit packages
    list, any new subpackage not added to pyproject is silently dropped
    from wheels — so every __init__.py directory must be declared."""
    cfg = _pyproject()["tool"]["setuptools"]
    declared = set(cfg["packages"])
    pkg_dir = cfg.get("package-dir", {})
    rel_to_pkg = {v: k for k, v in pkg_dir.items()}

    found = set()
    for root in ("tokenreduction_tpu", "analysis"):
        for init in (REPO / root).rglob("__init__.py"):
            rel = init.parent.relative_to(REPO).as_posix()
            top, _, rest = rel.partition("/")
            top = rel_to_pkg.get(top, top)
            found.add(f"{top}.{rest.replace('/', '.')}" if rest else top)
    missing = found - declared
    assert not missing, f"packages on disk but not in pyproject: {missing}"


def test_version_matches_package():
    import tokenreduction_tpu

    assert _project()["version"] == tokenreduction_tpu.__version__
